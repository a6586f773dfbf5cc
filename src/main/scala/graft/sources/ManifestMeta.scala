package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** DISTRIBUTED MANIFEST METADATA — the seam that keeps the metadata
  * path itself scalable: at 100 TB / millions of files the manifest is
  * a DATASET, and pruning/stats decisions over it should run as Spark
  * jobs (Iceberg reads manifests as distributed avro for the same
  * reason). Every surface here plans a Spark read of the manifest
  * file: the DRIVER touches only the head-pointer path string — entry
  * parsing, stat folding, and file-skipping filters all execute on
  * executors, and only the decision-sized result (surviving file
  * names, one bounds row per column) ever returns to the driver.
  *
  * Parity with the driver-side miniatures ([[ManifestV2Sink
  * .prunedDataFiles]], [[ManifestV2Sink.statsMinMax]]) is spec-pinned
  * (ManifestMetaSpec); the driver versions stay for metadata-tiny
  * tables where a Spark job per decision is overhead, exactly the
  * local-planning/distributed-planning split real formats expose.
  *
  * Conservatism under parse doubt: any bound that fails its numeric
  * cast keeps the file (a skipped file must be PROVABLY disjoint);
  * integral bounds compare in DECIMAL(38,0) (exact for any long),
  * double bounds in double (exact round-trip of the writer's
  * rendering).
  */
object ManifestMeta {

  /** Committed entries of the CURRENT head as a DataFrame: one row
    * per manifest entry with the blob fields split out —
    * (entry, file, is_delete, key_col, stats_blob, bloom_blob,
    * part_blob). The schema line is excluded by shape (entries start
    * with `data/` or `delete\t`; the schema line is a JSON object).
    */
  def entriesDF(spark: SparkSession, path: String): DataFrame = {
    val mf = java.nio.file.Paths.get(path, "_MANIFEST")
    require(java.nio.file.Files.exists(mf), s"no manifest at $path")
    // Spark's file index hides `_`-prefixed files, so snapshot the
    // head under a readable name: ONE hard link (O(1) metadata op,
    // and an immutable view even if a commit re-points the head
    // mid-job) — the driver never reads a byte of entry content
    val snap = java.nio.file.Paths.get(
      sys.props("java.io.tmpdir"),
      s"graft-meta-${java.util.UUID.randomUUID().toString.take(12)}.txt")
    try java.nio.file.Files.createLink(snap, mf)
    catch { case _: Exception => java.nio.file.Files.copy(mf, snap) }
    snap.toFile.deleteOnExit()
    val fields = split(col("entry"), "\t")
    val isDel = col("entry").startsWith("delete\t")
    def blob(prefix: String) = try_element_at(
      filter(fields, f => f.startsWith(prefix)), lit(1))
    spark.read.textFile(snap.toString).toDF("entry")
      .where(col("entry").startsWith("data/") ||
        col("entry").startsWith("delete\t"))
      .select(col("entry"),
        when(isDel, element_at(fields, 3))
          .otherwise(element_at(fields, 1)).as("file"),
        isDel.as("is_delete"),
        when(isDel, element_at(fields, 2)).as("key_col"),
        blob("S|").as("stats_blob"),
        blob("B|").as("bloom_blob"),
        blob("P|").as("part_blob"))
  }

  /** Per-(file, column) stats rows of the head's DATA entries:
    * (file, col_name, kind, min_s, max_s) — the exploded form the
    * metadata aggregates fold. Files with no stats blob contribute no
    * rows (that absence is what the soundness rule counts).
    */
  def statsDF(spark: SparkSession, path: String): DataFrame =
    entriesDF(spark, path)
      .where(!col("is_delete") && col("stats_blob").isNotNull)
      .select(col("file"), explode(
        split(expr("substring(stats_blob, 3)"), "\\|")).as("s"))
      .select(col("file"),
        element_at(split(col("s"), ":", 4), 1).as("col_name"),
        element_at(split(col("s"), ":", 4), 2).as("kind"),
        element_at(split(col("s"), ":", 4), 3).as("min_s"),
        element_at(split(col("s"), ":", 4), 4).as("max_s"))

  /** Per-(file, column) partition-value rows (canonical rendered
    * form, still escaped — identity comparisons only need equality
    * of renderings).
    */
  def partitionsDF(spark: SparkSession, path: String): DataFrame =
    entriesDF(spark, path)
      .where(!col("is_delete") && col("part_blob").isNotNull)
      .select(col("file"), explode(
        split(expr("substring(part_blob, 3)"), "\\|")).as("p"))
      .select(col("file"),
        element_at(split(col("p"), ":", 2), 1).as("col_name"),
        element_at(split(col("p"), ":", 2), 2).as("value"))

  /** [[ManifestV2Sink.prunedDataFiles]] re-expressed over the seam:
    * the skipping decision runs as a Spark filter over the manifest
    * scan; only surviving file names come back. Same contract —
    * statless/unpartitioned files are never skipped, a skipped file is
    * provably disjoint from [lower, upper].
    */
  def prunedDataFilesDF(spark: SparkSession, path: String, column: String,
      lower: Long, upper: Long): DataFrame = {
    val stats = statsDF(spark, path).where(col("col_name") === column)
      // exact comparisons per kind; a failed cast keeps the file
      .select(col("file"),
        when(col("kind") === "L",
          col("min_s").cast("decimal(38,0)") <= lit(upper) &&
            col("max_s").cast("decimal(38,0)") >= lit(lower))
          .otherwise(
            col("min_s").cast("double") <= lit(upper).cast("double") &&
              col("max_s").cast("double") >= lit(lower).cast("double"))
          .as("stat_keep"))
    val parts = partitionsDF(spark, path)
      .where(col("col_name") === column)
      .select(col("file"),
        (col("value").cast("decimal(38,0)") >= lit(lower) &&
          col("value").cast("decimal(38,0)") <= lit(upper)).as("part_keep"))
    entriesDF(spark, path).where(!col("is_delete")).select(col("file"))
      .join(stats, Seq("file"), "left")
      .join(parts, Seq("file"), "left")
      .where(coalesce(col("stat_keep"), lit(true)) &&
        coalesce(col("part_keep"), lit(true)))
      .select(col("file"))
  }

  /** [[ManifestV2Sink.statsMinMax]] re-expressed over the seam: fold
    * every data file's recorded bounds for `column` in ONE Spark agg,
    * with the identical soundness rule — ANY data file lacking stats
    * for the column (or an empty table) makes the metadata answer
    * unsound ⇒ None. The driver receives one row.
    */
  def statsMinMax(spark: SparkSession, path: String,
      column: String): Option[(BigDecimal, BigDecimal)] =
    statsMinMaxMany(spark, path, Seq(column))(column)

  /** Many-column twin: ONE metadata pass (one Spark agg, grouped by
    * column) answers every requested column's bounds — the shape a
    * planner actually wants (`SELECT min(a), max(a), min(b) …` is one
    * stats question, not |columns| manifest scans). Same per-column
    * soundness rule as [[statsMinMax]].
    */
  def statsMinMaxMany(spark: SparkSession, path: String,
      columns: Seq[String]): Map[String, Option[(BigDecimal, BigDecimal)]] = {
    require(columns.nonEmpty)
    val dataFiles = entriesDF(spark, path).where(!col("is_delete"))
      .select(col("file"))
    val nFiles = dataFiles.count()
    val rows = dataFiles
      .join(statsDF(spark, path)
        .where(col("col_name").isin(columns: _*)), Seq("file"))
      .groupBy(col("col_name"))
      .agg(count(lit(1)).as("n_stats"),
        max(col("kind")).as("kind"),
        min(col("min_s").cast("decimal(38,0)")).as("min_l"),
        max(col("max_s").cast("decimal(38,0)")).as("max_l"),
        min(col("min_s").cast("double")).as("min_d"),
        max(col("max_s").cast("double")).as("max_d"))
      .collect() // |columns| rows — decision-sized
      .map { r =>
        val sound = nFiles > 0 && r.getLong(1) == nFiles
        r.getString(0) -> (
          if (!sound) None
          else if (r.getString(2) == "L")
            Some((BigDecimal(r.getDecimal(3)), BigDecimal(r.getDecimal(4))))
          else
            Some((BigDecimal(r.getDouble(5)), BigDecimal(r.getDouble(6)))))
      }.toMap
    // a column with no stats rows at all simply isn't in the fold —
    // unsound by the same rule (None), including the empty table
    columns.map(c => c -> rows.getOrElse(c, None)).toMap
  }
}
