package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.CrossHash

/** Benchmark-contamination GATE for streams: score arriving documents
  * against a frozen eval-benchmark n-gram set and emit each document's
  * shared-gram count and keep/drop verdict — the live twin of the
  * batch `PipelineQueries.textContamination` scan, on the same
  * train-once/score-forever seam as [[StreamCentroidAssign]] (the
  * batch side derives the eval grams; the stream never rebuilds them).
  * This is the shape an ingestion pipeline actually needs: documents
  * must be vetted as they ARRIVE, before they land in the training
  * corpus, not in a nightly sweep after they've contaminated it.
  *
  * The eval-gram hashes ship as a LITERAL sorted array — eval
  * benchmarks are fixed-size by construction (the batch scan's
  * broadcast-side argument), so the constant is bounded no matter how
  * large the corpus ever gets. That keeps the plan STATELESS and
  * SHUFFLE-FREE: per row, one pass builds the doc's distinct gram
  * hashes (the same word-4-gram → md5-56-bit derivation as batch) and
  * counts membership in the constant — append mode, no state store,
  * no watermark, no exchange. Per-row cost O(tokens · log |eval|)
  * conceptually; here membership is an `array_contains` scan of the
  * literal, fine at benchmark sizes and trivially swappable for a
  * bloom stage if an eval set ever grew unbounded.
  *
  * Determinism matches batch bit for bit: same tokenizer split, same
  * gram join, same [[CrossHash.md5Long]] hash — a document scores the
  * same n_shared here as textContamination reports for it at rest
  * (spec-diffed).
  */
object StreamContamGate {

  /** `stream` needs `(doc_id: long, text: string)`. `evalGrams`:
    * DISTINCT 56-bit gram hashes of the benchmark slice (from the
    * batch derivation). Output: one row per document —
    * `(doc_id, n_grams, n_shared_grams, keep)`.
    */
  def apply(stream: DataFrame, evalGrams: Seq[Long],
      gram: Int = 4): DataFrame = {
    require(evalGrams.nonEmpty, "empty eval set: nothing to gate against")
    val evalLit = typedlit(evalGrams.distinct.sorted)
    val toks = split(col("text"), " ")
    // guard BEFORE sequence(): Spark's sequence(0, n) with n < 0
    // generates a DESCENDING range, which would hash phantom grams
    // for short documents instead of skipping them
    val grams = when(size(toks) >= gram,
      array_distinct(transform(sequence(lit(0), size(toks) - gram),
        i => CrossHash.md5Long(array_join(slice(toks, i + 1, lit(gram)),
          " ")))))
      .otherwise(array().cast("array<bigint>"))
    stream
      .withColumn("ghs", grams)
      .select(col("doc_id"),
        size(col("ghs")).cast("long").as("n_grams"),
        size(filter(col("ghs"), g => array_contains(evalLit, g)))
          .cast("long").as("n_shared_grams"))
      .withColumn("keep", col("n_shared_grams") === 0L)
  }
}
