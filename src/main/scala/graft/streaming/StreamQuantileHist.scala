package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming maintenance of the per-source quality histogram behind
  * the batch `pipeline_quantile_norm` query: documents arrive as a
  * stream and the 256-fixed-width-bucket histogram per source stays
  * continuously up to date — so per-source percentile thresholds can
  * be served live while the corpus grows.
  *
  * The whole point is the STATE BOUND: the aggregation state is one
  * count per (source, bucket) — ≤ 256·|sources| rows forever, however
  * many documents stream through. That is the same reason the batch
  * query scales (the CDF never sorts the corpus); here it is what
  * makes the streaming query run indefinitely without a watermark.
  * Bucketing must match the batch side exactly (width 16, cap 255) —
  * the parity spec recomputes the batch histogram and compares.
  */
object StreamQuantileHist {

  /** `docs` needs `source: string` and `n_chars: long`. Output (per
    * trigger, update/complete mode): `(source, bkt, n)`.
    */
  def apply(docs: DataFrame): DataFrame =
    docs.select(col("source"),
      least(floor(col("n_chars").cast("double") / 16).cast("long"),
        lit(255L)).as("bkt"))
      .groupBy(col("source"), col("bkt"))
      .agg(count(lit(1)).as("n"))
}
