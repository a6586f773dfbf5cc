package graft.streaming

import org.apache.spark.sql.{Dataset, Encoder, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming heavy hitters: a Misra–Gries summary per hash bucket,
  * maintained across micro-batches with `flatMapGroupsWithState` —
  * the streaming twin of the batch `text_heavy_hitters` query, for
  * the case where the corpus is a live token stream (vocabulary
  * drift monitoring, stop-list maintenance) and exact global counts
  * would need unbounded state.
  *
  * State per bucket is AT MOST `k` counters whatever the stream
  * length — the Misra–Gries bound: when a new token arrives at a
  * full summary, every counter decrements instead (evicting zeros),
  * which charges the miss against k existing counters. The classic
  * guarantees follow, and the spec asserts both:
  *
  *  - any token with true bucket-count > N_bucket/(k+1) IS in the
  *    summary (no false negatives among true heavy hitters);
  *  - every estimate undercounts by at most N_bucket/(k+1).
  *
  * Buckets shard the stream so summaries merge work across cores and
  * state per key stays k counters; at cluster scale the bucket count
  * scales with executors, not vocabulary. Each batch emits the
  * bucket's refreshed summary stamped with a monotone `ver`, so a
  * consumer (or the spec) takes the max-`ver` row set per bucket —
  * update-mode semantics over an append-friendly schema.
  */
object StreamHeavyHitters {

  final case class HHRow(bucket: Int, ver: Long, token: String, n: Long)

  final case class HHState(ver: Long, total: Long, counts: Map[String, Long])

  def apply(tokens: Dataset[String], buckets: Int = 16, k: Int = 32)
      : Dataset[HHRow] = {
    implicit val stateEnc: Encoder[HHState] = Encoders.product[HHState]
    implicit val outEnc: Encoder[HHRow] = Encoders.product[HHRow]
    implicit val keyEnc: Encoder[Int] = Encoders.scalaInt
    tokens
      .groupByKey(t => math.floorMod(t.hashCode, buckets))
      .flatMapGroupsWithState[HHState, HHRow](
        OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        (bucket: Int, toks: Iterator[String], state: GroupState[HHState]) =>
          val st = state.getOption.getOrElse(HHState(0L, 0L, Map.empty))
          var counts = st.counts
          var total = st.total
          toks.foreach { t =>
            total += 1
            counts.get(t) match {
              case Some(c) => counts = counts.updated(t, c + 1)
              case None if counts.size < k => counts = counts.updated(t, 1L)
              case None =>
                // full summary: decrement everything, evict zeros —
                // the miss is charged against k live counters
                counts = counts.iterator
                  .collect { case (tok, c) if c > 1 => tok -> (c - 1) }
                  .toMap
            }
          }
          val next = HHState(st.ver + 1, total, counts)
          state.update(next)
          counts.iterator
            .map { case (tok, c) => HHRow(bucket, next.ver, tok, c) }
      }
  }
}
