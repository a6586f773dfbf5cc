package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Typed UDAF surface (a category the reference lacks entirely —
  * SURVEY.md §2 absent-categories row): bounded-memory top-k of a
  * long-valued column per group.
  *
  * This is the aggregator shape that matters at 100 TB: the buffer is
  * at most k elements, `reduce` runs map-side (partial aggregation),
  * and only k-element buffers cross the shuffle — a global
  * `orderBy.limit` per group would sort whole partitions instead.
  * Output is the descending CSV of the top k values so the result is
  * hash-comparable across engines.
  */
final case class TopKAgg(k: Int) extends Aggregator[Long, Seq[Long], String] {
  require(k > 0)

  def zero: Seq[Long] = Seq.empty

  def reduce(buf: Seq[Long], v: Long): Seq[Long] = insert(buf, v)

  def merge(a: Seq[Long], b: Seq[Long]): Seq[Long] =
    b.foldLeft(a)(insert)

  def finish(r: Seq[Long]): String = r.mkString(",")

  /** Keep the buffer sorted descending and capped at k — O(k) per
    * element, no full sort anywhere.
    */
  private def insert(buf: Seq[Long], v: Long): Seq[Long] = {
    if (buf.size >= k && v <= buf.last) buf
    else {
      val (hi, lo) = buf.span(_ >= v)
      (hi ++ (v +: lo)).take(k)
    }
  }

  def bufferEncoder: Encoder[Seq[Long]] = ExpressionEncoder[Seq[Long]]()
  def outputEncoder: Encoder[String] = Encoders.STRING
}

/** Pair-valued bottom-k: the ≤k smallest DISTINCT `(a, b)` tuples per
  * group in tuple order, returned as rows to re-explode. Exactly the
  * `SELECT DISTINCT … row_number() OVER (PARTITION BY g ORDER BY a, b)
  * ≤ k` shape — as ONE bounded-buffer aggregation that partial-
  * aggregates map-side, so a group with 10⁸ candidate rows ships k
  * tuples per partition instead of sorting the whole frame through a
  * window exchange. The NN-Descent build's per-round top-K rides this
  * (its candidate frame is the engine's largest recurring window
  * input); the window form stays the oracle's spelling.
  */
final case class BottomKPairsAgg(k: Int)
    extends Aggregator[(Long, Long), Seq[(Long, Long)], Seq[(Long, Long)]] {
  require(k > 0)
  private val ord = implicitly[Ordering[(Long, Long)]]

  def zero: Seq[(Long, Long)] = Seq.empty

  def reduce(buf: Seq[(Long, Long)], v: (Long, Long)): Seq[(Long, Long)] =
    insert(buf, v)

  def merge(a: Seq[(Long, Long)],
      b: Seq[(Long, Long)]): Seq[(Long, Long)] = b.foldLeft(a)(insert)

  def finish(r: Seq[(Long, Long)]): Seq[(Long, Long)] = r

  /** Sorted-ascending, DEDUPED, ≤k buffer — the distinct of the
    * window spelling is the set semantics here (duplicate tuples
    * must not occupy two of the k slots).
    */
  private def insert(buf: Seq[(Long, Long)],
      v: (Long, Long)): Seq[(Long, Long)] = {
    if (buf.size >= k && ord.gteq(v, buf.last)) buf
    else if (buf.contains(v)) buf
    else {
      val (lo, hi) = buf.span(x => ord.lt(x, v))
      (lo ++ (v +: hi)).take(k)
    }
  }

  def bufferEncoder: Encoder[Seq[(Long, Long)]] =
    ExpressionEncoder[Seq[(Long, Long)]]()
  def outputEncoder: Encoder[Seq[(Long, Long)]] =
    ExpressionEncoder[Seq[(Long, Long)]]()
}

/** [[BottomKPairsAgg]] with a tag that rides each tuple: the ≤k
  * smallest DISTINCT `(a, b)` tuples per group in tuple order, where
  * duplicate tuples collapse to the MAX of their tags. Selection is
  * identical to [[BottomKPairsAgg]] (the tag never participates in
  * ordering or distinctness), so swapping the untagged form for this
  * one cannot move a single selected tuple.
  *
  * This is what lets NN-Descent's new/old edge flags ride the top-K
  * aggregation itself: candidates enter tagged 0, the previous
  * round's edges enter tagged 1, and a surviving tuple's max-tag says
  * whether it existed last round — the same fact the previous
  * formulation paid a left-outer join (flag attach) plus a left-anti
  * join (new-edge diff) per round to compute. Order-independence: the
  * final k smallest distinct tuples are order-independent, and a
  * tuple that survives to the final buffer can never have had a copy
  * rejected by the capacity bound (rejection requires k strictly
  * smaller tuples, which would also survive and evict it), so every
  * copy's tag is folded in.
  */
final case class BottomKPairsTagAgg(k: Int)
    extends Aggregator[(Long, Long, Long), Seq[(Long, Long, Long)],
      Seq[(Long, Long, Long)]] {
  require(k > 0)
  private val ord = implicitly[Ordering[(Long, Long)]]

  def zero: Seq[(Long, Long, Long)] = Seq.empty

  def reduce(buf: Seq[(Long, Long, Long)],
      v: (Long, Long, Long)): Seq[(Long, Long, Long)] = insert(buf, v)

  def merge(a: Seq[(Long, Long, Long)],
      b: Seq[(Long, Long, Long)]): Seq[(Long, Long, Long)] =
    b.foldLeft(a)(insert)

  def finish(r: Seq[(Long, Long, Long)]): Seq[(Long, Long, Long)] = r

  private def insert(buf: Seq[(Long, Long, Long)],
      v: (Long, Long, Long)): Seq[(Long, Long, Long)] = {
    val vk = (v._1, v._2)
    val idx = buf.indexWhere(x => x._1 == v._1 && x._2 == v._2)
    if (idx >= 0) {
      if (buf(idx)._3 >= v._3) buf
      else buf.updated(idx, v)
    } else if (buf.size >= k &&
        ord.gteq(vk, (buf.last._1, buf.last._2))) buf
    else {
      val (lo, hi) = buf.span(x => ord.lt((x._1, x._2), vk))
      (lo ++ (v +: hi)).take(k)
    }
  }

  def bufferEncoder: Encoder[Seq[(Long, Long, Long)]] =
    ExpressionEncoder[Seq[(Long, Long, Long)]]()
  def outputEncoder: Encoder[Seq[(Long, Long, Long)]] =
    ExpressionEncoder[Seq[(Long, Long, Long)]]()
}

/** Ascending twin of [[TopKAgg]]: bounded-memory bottom-k of a
  * long-valued column per group, emitted as the ascending CSV. Same
  * scale contract — a ≤k buffer that partial-aggregates map-side, so
  * a group with 10⁹ members still only ships k longs per partition
  * across the shuffle. Used for posting-list heads in the inverted
  * index, where `collect_list` would buffer the full list per token.
  */
final case class BottomKAgg(k: Int) extends Aggregator[Long, Seq[Long], String] {
  require(k > 0)

  def zero: Seq[Long] = Seq.empty

  def reduce(buf: Seq[Long], v: Long): Seq[Long] = insert(buf, v)

  def merge(a: Seq[Long], b: Seq[Long]): Seq[Long] =
    b.foldLeft(a)(insert)

  def finish(r: Seq[Long]): String = r.mkString(",")

  /** Keep the buffer sorted ascending and capped at k — O(k) per
    * element, no full sort anywhere.
    */
  private def insert(buf: Seq[Long], v: Long): Seq[Long] = {
    if (buf.size >= k && v >= buf.last) buf
    else {
      val (lo, hi) = buf.span(_ <= v)
      (lo ++ (v +: hi)).take(k)
    }
  }

  def bufferEncoder: Encoder[Seq[Long]] = ExpressionEncoder[Seq[Long]]()
  def outputEncoder: Encoder[String] = Encoders.STRING
}
