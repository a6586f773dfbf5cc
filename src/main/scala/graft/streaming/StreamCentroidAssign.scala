package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Frozen-quantizer assignment for STREAMS: score arriving embedding
  * rows against a trained centroid table and emit each row's argmax
  * cell — the serving half of the train-once/score-forever split that
  * `knn_ivf_delta` proves in batch (the delta never retrains the
  * quantizer; reference point: the batch trainer is
  * `EmbeddingQueries.embKmeansTrain`).
  *
  * The centroids ship to executors as a LITERAL array — the index-
  * distribution move every ANN server makes. That keeps the streaming
  * plan STATELESS and SHUFFLE-FREE: the per-row argmax is one
  * `aggregate` over a ≤CentKMax-element constant inside whole-stage
  * codegen (the dot product is the native [[graft.functions.DotLong]]),
  * so the query runs in append mode with no state store, no
  * watermark, and no exchange — per-row cost O(k·d), exactly the batch
  * assignment's, with none of its broadcast-join machinery.
  *
  * Determinism matches the batch side bit for bit: exact integer dot
  * and norms, one IEEE floor-divide to ppm, ties broken by the lower
  * cell id — the same `(cscore DESC, cell ASC)` order the batch
  * argmax and every oracle window use.
  */
object StreamCentroidAssign {

  /** A trained centroid: cell id + quantized components. The norm is
    * derived here so callers can't hand in an inconsistent one.
    */
  final case class Centroid(cell: Long, tq: Seq[Long])

  /** `stream` needs `vec_id: long` and `q: array<long>` columns (any
    * fixed dimension, matching the centroids'). Output: one row per
    * input row — `(vec_id, cell, cscore)`. Centroid count is bounded
    * by the trainer (≤ CentKMax): metadata-sized, safe as a literal.
    */
  def apply(stream: DataFrame, cents: Seq[Centroid]): DataFrame = {
    require(cents.nonEmpty, "no centroids: nothing to assign to")
    // a zero-norm centroid scores 0/0 = NaN -> floor/cast 0, which
    // would silently beat negative-similarity cells and win ties; the
    // batch trainer filters tnorm2 > 0, enforce the same contract here
    require(cents.forall(_.tq.exists(_ != 0L)),
      "zero-norm centroid: cosine undefined (trainer filters tnorm2 > 0)")
    val centArr = array(cents.map { c =>
      val tnorm2 = c.tq.map(x => x * x).sum
      struct(lit(c.cell).as("cell"), typedlit(c.tq).as("tq"),
        lit(tnorm2).as("tnorm2"))
    }: _*)
    val q = col("q")
    val norm2 = graft.functions.DotLong(q, q)
    def score(c: Column): Column =
      floor((lit(1e6) * graft.functions.DotLong(q, c("tq")).cast("double")) /
        sqrt((norm2 * c("tnorm2")).cast("double"))).cast("long")
    // fold to the (score DESC, cell ASC) argmax; the seed scores below
    // any real ppm score so the first centroid always wins it
    val best = aggregate(centArr,
      struct(lit(-1L).as("cell"), lit(Long.MinValue).as("score")),
      (acc, c) => {
        val s = score(c)
        when(s > acc("score") ||
            (s === acc("score") && c("cell") < acc("cell")),
          struct(c("cell").as("cell"), s.as("score"))).otherwise(acc)
      })
    stream.select(col("vec_id"), best("cell").as("cell"),
      best("score").as("cscore"))
  }
}
