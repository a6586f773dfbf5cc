package graft.sources

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** Many-cell z-order fixture: the single-shuffle rewrite handles a
  * 256-cell layout in one job wave (the per-cell-job shape this
  * replaced scanned the table once PER CELL — O(cells) scans). Pins
  * one file per populated cell, single-cell stats spans, and exact
  * content preservation at a cell count where the old loop's
  * overhead dominated.
  */
class ManifestZOrderScaleSpec extends SparkSuite {

  test("256-cell zorder: one shuffle, one file per cell, " +
    "single-cell stats") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft-zscale").toString
    // 64×64 grid, every 4-bit×2 Morton cell populated
    val df = spark.range(4096).select(
      col("id"), (col("id") % 64).as("x"),
      (col("id") / 64).cast("long").as("y"))
    df.repartition(8).write.format("graft-manifest").mode("append")
      .save(dir)
    val t0 = System.nanoTime()
    val cells = ManifestV2Sink.compactZOrder(spark, dir, Seq("x", "y"), 4)
    val secs = (System.nanoTime() - t0) / 1e9
    info(f"256-cell zorder rewrite: $secs%.1f s")
    assert(cells == 256)
    assert(ManifestV2Sink.committedFileCount(dir) == 256)
    // every file's x/y stats span exactly one cell (span ≤ range/16)
    val entries = ManifestV2Sink.readManifest(dir).get._2
    entries.foreach { e =>
      val st = ManifestV2Sink.entryStats(e)
      Seq("x", "y").foreach { c =>
        val (mn, mx) = st(c)
        assert(mx - mn <= BigDecimal(3),
          s"${ManifestV2Sink.entryFile(e)} $c spans [$mn,$mx]")
      }
    }
    // content preserved exactly
    assert(ManifestV2Sink.readCommitted(spark, dir).count() == 4096L)
    assert(ManifestV2Sink.readCommitted(spark, dir)
      .agg(sum(col("id"))).head.getLong(0) == (0L until 4096L).sum)
    // a 1/256 box reads ONE file
    assert(ManifestV2Sink.prunedDataFilesMulti(dir,
      Seq(("x", 4L, 7L), ("y", 8L, 11L))).size == 1)
  }
}
