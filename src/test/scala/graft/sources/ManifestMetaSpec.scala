package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** The distributed manifest-metadata seam ([[ManifestMeta]]): entry
  * parsing, stat folding, and pruning decisions run as Spark plans
  * over the manifest file — the driver touches only the head-pointer
  * path — and every answer matches the driver-side miniature exactly.
  */
class ManifestMetaSpec extends SparkSuite {

  private def tmpTable(): String =
    Files.createTempDirectory("graft-meta").toString

  /** A table exercising every entry shape: multi-commit stats files,
    * a string-partitioned commit, a bloom commit, and tombstones.
    */
  private def build(): String = {
    import spark.implicits._
    val dir = tmpTable()
    (0 until 3).foreach { g =>
      (0 until 20).map(i => (g * 100L + i, (g * 100 + i) * 1.5, s"s$i"))
        .toDF("id", "d", "s").coalesce(2)
        .write.format("graft-manifest").mode("append").save(dir)
    }
    Seq((900L, 9.0, "en"), (901L, 9.1, "de")).toDF("id", "d", "s")
      .coalesce(1)
      .write.format("graft-manifest").option("partitionBy", "s")
      .option("bloomColumns", "id")
      .mode("append").save(dir)
    ManifestV2Sink.delete(spark, dir, "id", Seq(5L, 105L).toDF("id"))
    dir
  }

  test("entriesDF reproduces the manifest exactly; parsing is a Spark " +
    "plan over the manifest file, not a driver loop") {
    val dir = build()
    val df = ManifestMeta.entriesDF(spark, dir)
    val driver = ManifestV2Sink.readManifest(dir).get._2
    assert(df.select("entry").collect().map(_.getString(0)).sorted.toSeq ==
      driver.sorted)
    assert(df.where(col("is_delete")).count() ==
      ManifestV2Sink.committedDeleteFileCount(dir).toLong)
    assert(df.where(!col("is_delete")).count() ==
      ManifestV2Sink.committedFileCount(dir).toLong)
    // the plan READS the manifest as a file scan — the metadata work
    // is distributed by construction (driver holds only the path)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("graft-meta-"),
      s"expected a file scan of the manifest snapshot in the plan:\n$plan")
  }

  test("distributed pruning matches the driver-side decision on every " +
    "shape: stats files, partitioned files, statless files") {
    import spark.implicits._
    val dir = build()
    // add a STATLESS shape: a string-only commit (no numeric columns
    // beyond what partition/bloom track) cannot be pruned by id
    Seq((9999L, null.asInstanceOf[java.lang.Double], "tail"))
      .toDF("id", "d", "s").coalesce(1)
      .write.format("graft-manifest").mode("append").save(dir)
    for ((lo, hi) <- Seq((0L, 50L), (100L, 250L), (901L, 5000L),
        (-10L, -1L), (Long.MinValue, Long.MaxValue))) {
      val driver = ManifestV2Sink.prunedDataFiles(dir, "id", lo, hi)
      val dist = ManifestMeta.prunedDataFilesDF(spark, dir, "id", lo, hi)
        .collect().map(_.getString(0)).toSeq
      assert(dist.sorted == driver.sorted,
        s"prune mismatch for [$lo,$hi]: driver=$driver dist=$dist")
    }
    // double-column pruning parity too
    val dD = ManifestV2Sink.prunedDataFiles(dir, "d", 0L, 30L)
    val xD = ManifestMeta.prunedDataFilesDF(spark, dir, "d", 0L, 30L)
      .collect().map(_.getString(0)).toSeq
    assert(xD.sorted == dD.sorted)
  }

  test("distributed statsMinMax folds to the exact driver answer and " +
    "keeps the soundness rule (any statless data file => None)") {
    import spark.implicits._
    val dir = build()
    for (c <- Seq("id", "d")) {
      assert(ManifestMeta.statsMinMax(spark, dir, c) ==
        ManifestV2Sink.statsMinMax(dir, c), s"bounds mismatch for $c")
    }
    assert(ManifestMeta.statsMinMax(spark, dir, "id")
      .exists { case (lo, hi) => lo == BigDecimal(0) && hi == BigDecimal(901) })
    // no stats anywhere for a string column
    assert(ManifestMeta.statsMinMax(spark, dir, "s").isEmpty)
    // soundness: one all-null commit makes the d-bounds unsound
    Seq((1000L, null.asInstanceOf[java.lang.Double], "x"))
      .toDF("id", "d", "s").coalesce(1)
      .write.format("graft-manifest").mode("append").save(dir)
    assert(ManifestMeta.statsMinMax(spark, dir, "d").isEmpty)
    assert(ManifestV2Sink.statsMinMax(dir, "d").isEmpty)
    // id stays sound (the new file has id stats)
    assert(ManifestMeta.statsMinMax(spark, dir, "id")
      .exists { case (_, hi) => hi == BigDecimal(1000) })
  }
}
