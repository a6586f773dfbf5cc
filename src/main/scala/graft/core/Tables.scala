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
    val df = spark.read.parquet(s"$dir/$name.parquet")
    if (name == "events" && df.schema("ts").dataType ==
        org.apache.spark.sql.types.LongType)
      df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
    else df
  }

  /** Register every table as a temp view so spark.sql can reference
    * them by the same names the DuckDB oracle uses.
    */
  def registerAll(spark: SparkSession, dir: String): Unit =
    all.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))
}
