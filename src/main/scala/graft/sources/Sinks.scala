package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Source/sink utilities for the lake layout a 100 TB deployment
  * needs. The driver's test tables are plain parquet; these writers
  * produce the layouts that make the REST of the engine fast:
  *
  *  - hive-style partitioning → partition pruning (a day-filtered
  *    query reads one directory, not the table);
  *  - bucketing → co-located joins (two tables bucketed on the join
  *    key join with ZERO shuffle — the 100 TB fact-to-fact answer
  *    when broadcast is impossible);
  *  - csv/json ingest with explicit schemas (never infer on a
  *    production path — inference is an extra full scan).
  */
object Sinks {

  /** Hive-style partitioned parquet. `partitionCols` choose the prune
    * dimension; callers should repartition by them first when writing
    * many partitions so each output dir gets few, large files instead
    * of one file per task per partition (small-file explosion).
    */
  def writePartitioned(df: DataFrame, path: String,
      partitionCols: Seq[String]): Unit =
    df.repartition(partitionCols.map(df(_)): _*)
      .write.mode("overwrite")
      .partitionBy(partitionCols: _*)
      .parquet(path)

  /** Bucketed managed table (bucketing metadata lives in the catalog,
    * so this goes through saveAsTable). Joins between tables bucketed
    * on the same key with the same count are shuffle-free.
    */
  def writeBucketed(df: DataFrame, tableName: String, bucketCol: String,
      buckets: Int): Unit = {
    val spark = df.sparkSession
    spark.sql(s"DROP TABLE IF EXISTS `$tableName`")
    // an orphaned location (e.g. from a previous JVM with a fresh
    // in-memory catalog) blocks CREATE — clear it
    val warehouse = spark.conf.get("spark.sql.warehouse.dir")
    val loc = new java.io.File(new java.net.URI(
      if (warehouse.contains(":/")) s"$warehouse/$tableName"
      else s"file:$warehouse/$tableName"))
    if (loc.exists()) {
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles().foreach(rm)
        f.delete(); ()
      }
      rm(loc)
    }
    df.write.mode("overwrite")
      .bucketBy(buckets, bucketCol)
      .sortBy(bucketCol)
      .format("parquet")
      .saveAsTable(tableName)
  }

  /** ORC sink — same columnar guarantees as parquet (predicate
    * pushdown, column pruning, splittable stripes); the interchange
    * format is configuration, not architecture.
    */
  def writeOrc(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").orc(path)

  def readOrc(spark: SparkSession, path: String): DataFrame =
    spark.read.orc(path)

  /** Schema-explicit CSV read (header, typed). */
  def readCsv(spark: SparkSession, path: String, ddl: String): DataFrame =
    spark.read.schema(ddl).option("header", "true").csv(path)

  /** Schema-explicit JSON-lines read. */
  def readJson(spark: SparkSession, path: String, ddl: String): DataFrame =
    spark.read.schema(ddl).json(path)
}
