package graft.core

import org.apache.spark.sql.SparkSession

/** Session factory with scale-appropriate defaults.
  *
  * Local testing runs `local[32]`; the same settings are what we'd set
  * cluster-side (AQE on, skew-join handling on, sensible shuffle
  * partitioning). Nothing here is local-mode-specific except the master.
  */
object GraftSession {

  def local(cores: Int = 32, appName: String = "graft"): SparkSession =
    builder(appName)
      .master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", cores.toString)
      .getOrCreate()

  /** Shared config: applied whether master is local or a real cluster. */
  def builder(appName: String): SparkSession.Builder =
    SparkSession
      .builder()
      .appName(appName)
      // native expressions available to spark.sql (md5long56, dot_long)
      .withExtensions(new graft.functions.GraftExtensions)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.parquet.filterPushdown", "true")
      // honor DSv2 key-grouped partitioning (storage-partitioned
      // scans satisfy clustered distributions without an exchange)
      .config("spark.sql.sources.v2.bucketing.enabled", "true")
      // let sources that implement SupportsPushDownJoin fold joins
      // (off by default in Spark 4.1; only graft-synth implements it
      // here, so no other plan changes)
      .config("spark.sql.optimizer.datasourceV2JoinPushdown", "true")
      // driver testdata ships nanos timestamps (see Tables.load)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.warehouse.dir",
        s"${sys.props("java.io.tmpdir")}/graft-warehouse")
      // SQL-surface catalog for graft-manifest tables:
      // CREATE/INSERT/SELECT/ALTER/DROP on `graft.<table>`
      .config("spark.sql.catalog.graft", "graft.sources.ManifestCatalog")
      .config("spark.sql.catalog.graft.root",
        s"${sys.props("java.io.tmpdir")}/graft-warehouse/graft-catalog")
}
