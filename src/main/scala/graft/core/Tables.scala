package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver-provided TPC-H-ish parquet tables
  * (see /root/repo/TESTDATA.md). One parquet file per table under
  * `$dir/$name.parquet`.
  */
object Tables {

  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Sessions created by [[GraftSession]], `Verify`, `Bench`, and
    * `Explain` set `spark.sql.legacy.parquet.nanosAsLong` at build
    * time: events.ts is TIMESTAMP(NANOS) parquet, which Spark 4
    * rejects by default. The long nanos are truncated to microsecond
    * timestamps here (same truncation DuckDB applies casting
    * TIMESTAMP_NS → TIMESTAMP). Kept out of this loader: mutating
    * session conf per table load would silently change how a library
    * user's OWN nanos parquet reads.
    */
  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    val raw = spark.read.parquet(s"$dir/$name.parquet")
    val df =
      if (name == "events" && raw.schema("ts").dataType ==
          org.apache.spark.sql.types.LongType)
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      else raw
    if (computeHeavy(name)) densify(spark, df) else df
  }

  /** Tables whose queries are dominated by per-row expression work
    * (md5 shingling, minhash families, vector quantization) rather
    * than scan/shuffle volume. Only these repay a densifying exchange
    * when the scan is under-split; for wide fact tables the exchange
    * costs more than the lost scan parallelism.
    */
  private val computeHeavy = Set("documents", "embeddings")

  /** Redistribute a scan whose split count is far below the session's
    * parallelism.
    *
    * Parquet parallelism is bounded by row groups: a table written as
    * one row group (all the local testdata) is ONE task no matter what
    * `maxPartitionBytes` says, so every downstream per-row expression
    * (md5 shingling, vector quantization) runs on a single core. One
    * round-robin exchange of the (pruned, filtered — Catalyst pushes
    * predicates and projections through Repartition) rows fixes that.
    * At production scale the scan has at least as many splits as the
    * cluster has slots and this is a no-op — no exchange is added.
    * Opt out per-session with `spark.graft.densify=false` (e.g. to
    * audit raw scan plans).
    *
    * Probe limitation: `getNumPartitions` counts BYTE-RANGE splits,
    * which upper-bounds (never equals-from-below) the real row-group
    * parallelism — a single >128 MB row group would show many splits
    * yet still decode in one task, and this guard would skip. That
    * window only opens for files written with a row-group size above
    * `maxPartitionBytes`; standard writers (including this repo's
    * sinks) cap row groups at 128 MB, where splits ≈ row groups.
    */
  private def densify(spark: SparkSession, df: DataFrame): DataFrame = {
    val want = spark.sparkContext.defaultParallelism
    val enabled =
      spark.conf.getOption("spark.graft.densify").forall(_.toBoolean)
    if (enabled && df.rdd.getNumPartitions < math.max(want / 2, 1))
      df.repartition(want)
    else df
  }

  /** Register every table as a temp view so spark.sql can reference
    * them by the same names the DuckDB oracle uses.
    */
  def registerAll(spark: SparkSession, dir: String): Unit =
    all.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))
}
