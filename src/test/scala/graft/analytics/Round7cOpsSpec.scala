package graft.analytics

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** Semantic invariants for the round-7 third-context operators. The
  * oracle hash-compare proves engine agreement; these pin the
  * properties the numbers must have to MEAN what they claim — in
  * particular the two BPE merge subtleties a shared-bug oracle compare
  * could never catch on natural text alone.
  */
class Round7cOpsSpec extends SparkSuite {

  /** Independent plain-Scala BPE trainer: the classic token-list
    * algorithm (count adjacent pairs including overlaps, argmax by
    * (count DESC, pair ASC), greedy left-to-right merge), sharing NO
    * code with the relational formulation under test.
    */
  private def refBpe(words: Map[String, Long], rounds: Int)
      : Seq[(Long, String, Long, Long, Long)] = {
    var segs: Map[String, (Vector[String], Long)] =
      words.map { case (w, wc) => w -> (w.map(_.toString).toVector, wc) }
    (1 to rounds).map { r =>
      val counts = scala.collection.mutable.Map[(String, String), Long]()
      segs.values.foreach { case (ts, wc) =>
        ts.indices.dropRight(1).foreach { i =>
          val k = (ts(i), ts(i + 1))
          counts(k) = counts.getOrElse(k, 0L) + wc
        }
      }
      val ((pa, pb), pc) = counts.toSeq
        .minBy { case ((a, b), c) => (-c, a + " " + b) }
      var applied = 0L
      var tokensAfter = 0L
      segs = segs.map { case (w, (ts, wc)) =>
        val out = Vector.newBuilder[String]
        var i = 0
        while (i < ts.length) {
          if (i + 1 < ts.length && ts(i) == pa && ts(i + 1) == pb) {
            out += (pa + pb); applied += wc; i += 2
          } else { out += ts(i); i += 1 }
        }
        val v = out.result()
        tokensAfter += wc * v.length
        w -> (v, wc)
      }
      (r.toLong, pa + " " + pb, pc, applied, tokensAfter)
    }
  }

  private def trainRows(dir: String): Seq[(Long, String, Long, Long, Long)] =
    TextQueries.textBpeTrain(spark, dir)
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
      .toSeq

  test("BPE trainer: overlap chains and token boundaries on a fixture") {
    import spark.implicits._
    // crafted so round 1 merges (a,b), round 2 (a,a), round 3 (b,c),
    // round 4 (ab,c) — exercising BOTH traps:
    //  - 'aaaa' has THREE (a,a) pair positions but admits TWO merges
    //    (greedy left-to-right: aa|aa, never aa|a|a)
    //  - by round 3, 'abc' is segmented [ab, c]; the (b,c) merge must
    //    NOT fire inside it (a string replace would corrupt: 'ab c'
    //    contains the substring 'b c')
    val words = Seq.fill(10)("ab") ++ Seq.fill(5)("abc") ++
      Seq.fill(7)("bc") ++ Seq.fill(3)("aaaa")
    val dir = java.nio.file.Files.createTempDirectory("bpefix").toString
    words.grouped(5).map(_.mkString(" ")).toSeq.toDF("text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = trainRows(dir)
    val want = refBpe(
      words.groupBy(identity).map { case (w, g) => w -> g.size.toLong },
      TextQueries.BpeRounds)
    assert(got == want, s"got $got\nwant $want")
    // the hand-traced trajectory, asserted literally so a shared bug
    // in refBpe and the query cannot hide
    assert(got(0) == ((1L, "a b", 15L, 15L, 46L)))
    assert(got(1) == ((2L, "a a", 9L, 6L, 40L)), "overlap chain: " +
      "9 pair positions, 6 merges (2 per 'aaaa'), aa|aa not aa|a|a")
    assert(got(2) == ((3L, "b c", 7L, 7L, 33L)), "boundary trap: " +
      "(b,c) applies only in 'bc' — [ab, c] has no (b,c) token pair")
    assert(got(3) == ((4L, "ab c", 5L, 5L, 28L)))
  }

  test("BPE trainer matches the independent reference on the corpus") {
    val words = QueryUtil.table(spark, sf0001, "documents")
      .select(explode(split(col("text"), " ")).as("w"))
      .where(length(col("w")) >= 2)
      .groupBy("w").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val want = refBpe(words, TextQueries.BpeRounds)
    val got = trainRows(sf0001)
    assert(got == want)
    // the trajectory must be internally consistent: each round's
    // tokens_after drops by exactly its applied count
    val tokens0 = words.map { case (w, wc) => wc * w.length }.sum
    got.foldLeft(tokens0) { case (prev, (_, _, pc, applied, after)) =>
      assert(applied <= pc, "cannot apply more merges than pair positions")
      assert(after == prev - applied, "token count must shrink by applied")
      after
    }
  }
}
