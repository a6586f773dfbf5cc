package graft.analytics

import java.nio.file.{Files, Path, Paths, StandardCopyOption}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.functions._

import graft.SparkSuite
import graft.sources.ManifestV2Sink

/** Content-addressed artifact reuse across sessions — the production
  * nightly-artifact semantics: a RESTARTED session (simulated by
  * clearing the in-JVM slots; the on-disk manifests are what survive a
  * real restart) must REUSE a previously published artifact iff the
  * dataset and code are unchanged, and must REBUILD the moment any
  * data file changes. Reuse is observable through the manifest log:
  * reading an already-published artifact adds no snapshot version;
  * building adds one.
  */
class ArtifactReuseSpec extends SparkSuite {

  /** Copy the sf0.001 dataset to a private dir so mutating a file
    * cannot disturb other suites (testdata itself is read-only).
    */
  private def copyDataset(): String = {
    val src = Paths.get(sf0001)
    val dst = Files.createTempDirectory("graft-artreuse")
    val s = Files.walk(src)
    try s.iterator().asScala.foreach { p =>
      val t = dst.resolve(src.relativize(p).toString)
      if (Files.isDirectory(p)) Files.createDirectories(t)
      else Files.copy(p, t, StandardCopyOption.REPLACE_EXISTING)
    } finally s.close()
    dst.toString
  }

  private def firstParquet(dir: String): Path = {
    val s = Files.walk(Paths.get(dir))
    try s.iterator().asScala
      .find(p => p.toString.endsWith(".parquet") && Files.isRegularFile(p))
      .get
    finally s.close()
  }

  test("unchanged data + fresh session reuses the published artifact") {
    val dir = copyDataset()
    var builds = 0
    def build() = { builds += 1
      spark.range(5).select(col("id"), (col("id") * 2).as("v")) }
    val a = SessionArtifact.table(spark, dir, "reuse_probe")(build())
    assert(builds == 1 && a.count() == 5)
    // same session, second read: slot hit, no build
    SessionArtifact.table(spark, dir, "reuse_probe")(build()).count()
    assert(builds == 1)
    // "restart": forget the slots; the on-disk manifest must be found
    // at the same content-addressed root and reused without building
    SessionArtifact.resetSlotsForTest()
    val b = SessionArtifact.table(spark, dir, "reuse_probe")(build())
    assert(builds == 1, "fresh session rebuilt despite unchanged data")
    assert(b.count() == 5)
  }

  test("any data change moves the root and forces a rebuild") {
    val dir = copyDataset()
    val fp0 = graft.core.DatasetFingerprint.of(dir)
    var builds = 0
    def build() = { builds += 1
      spark.range(3).select(col("id"), (col("id") + 7).as("v")) }
    SessionArtifact.table(spark, dir, "change_probe")(build()).count()
    assert(builds == 1)
    // touch one parquet file (mtime bump = the cheapest "data changed"
    // signal a lake catalog would also see as a new snapshot)
    val f = firstParquet(dir)
    Files.setLastModifiedTime(f, java.nio.file.attribute.FileTime
      .fromMillis(Files.getLastModifiedTime(f).toMillis + 60000))
    assert(graft.core.DatasetFingerprint.of(dir) != fp0,
      "fingerprint ignored an mtime change")
    SessionArtifact.resetSlotsForTest()
    SessionArtifact.table(spark, dir, "change_probe")(build()).count()
    assert(builds == 2, "changed data did not force a rebuild")
  }

  test("fingerprint: stable across calls, moved by rename/resize/add") {
    val dir = copyDataset()
    import graft.core.DatasetFingerprint
    val fp0 = DatasetFingerprint.of(dir)
    // deterministic: same tree ⇒ same tag (walk order must not leak)
    assert(DatasetFingerprint.of(dir) == fp0)
    // a RENAME with identical bytes/size/mtime must still move the tag
    // (the relative path is part of the identity)
    val f = firstParquet(dir)
    val renamed = f.resolveSibling(f.getFileName.toString + ".moved")
    Files.move(f, renamed)
    val fpRenamed = DatasetFingerprint.of(dir)
    assert(fpRenamed != fp0, "rename was invisible to the fingerprint")
    Files.move(renamed, f)
    assert(DatasetFingerprint.of(dir) == fp0, "rename-back did not restore")
    // an ADDED file moves it too
    Files.write(Paths.get(dir, "extra.bin"), Array[Byte](1, 2, 3))
    assert(DatasetFingerprint.of(dir) != fp0)
    // codeTag is stable within the process (lazy, content-addressed)
    assert(DatasetFingerprint.codeTag == DatasetFingerprint.codeTag)
    assert(DatasetFingerprint.codeTag.length == 8)
  }

  test("withCache memoizes: one walk per dir per scope, recompute outside") {
    import graft.core.DatasetFingerprint
    val dir = copyDataset()
    val w0 = DatasetFingerprint.walkCount.get()
    val fp = DatasetFingerprint.withCache {
      val a = DatasetFingerprint.of(dir)
      // repeat resolves inside the scope hit the cache — this is the
      // bench-pass contract: hundreds of artifact resolves, ONE walk
      assert(DatasetFingerprint.of(dir) == a)
      assert(DatasetFingerprint.of(dir) == a)
      a
    }
    assert(DatasetFingerprint.walkCount.get() == w0 + 1,
      "cached scope walked more than once for one dir")
    // scope closed: the per-call staleness guarantee is back
    assert(DatasetFingerprint.of(dir) == fp)
    assert(DatasetFingerprint.walkCount.get() == w0 + 2)
    // an edit after the scope is seen by the very next resolve
    val f = firstParquet(dir)
    Files.setLastModifiedTime(f, java.nio.file.attribute.FileTime
      .fromMillis(Files.getLastModifiedTime(f).toMillis + 60000))
    assert(DatasetFingerprint.of(dir) != fp)
  }

  test("content rewrite preserving size AND mtime still moves the tag") {
    // the coarse-mtime / mtime-preserving-restore hole the head/tail
    // probe closes: same path, same size, same millisecond mtime,
    // different bytes — metadata-only fingerprinting reuses stale
    import graft.core.DatasetFingerprint
    val dir = copyDataset()
    val f = firstParquet(dir)
    val fp0 = DatasetFingerprint.of(dir)
    val mtime = Files.getLastModifiedTime(f)
    val bytes = Files.readAllBytes(f)
    bytes(4) = (bytes(4) ^ 0x01).toByte // head probe window
    Files.write(f, bytes)
    Files.setLastModifiedTime(f, mtime)
    assert(DatasetFingerprint.of(dir) != fp0,
      "size+mtime-preserving rewrite was invisible to the fingerprint")
    // and a TAIL-window rewrite is caught too
    val fp1 = DatasetFingerprint.of(dir)
    val b2 = Files.readAllBytes(f)
    b2(b2.length - 5) = (b2(b2.length - 5) ^ 0x01).toByte
    Files.write(f, b2)
    Files.setLastModifiedTime(f, mtime)
    assert(DatasetFingerprint.of(dir) != fp1)
  }

  test("near-dup artifact: fresh session reuses, hashes unchanged") {
    val dir = copyDataset()
    val first = NearDupArtifact.labels(spark, dir)
      .orderBy("doc_id").collect().toSeq
    // count snapshots per table now, "restart", read again, recount —
    // reuse must add NO snapshot version to any of the three tables
    def snapCounts(): Seq[Int] = {
      val wh = spark.conf.get("spark.sql.warehouse.dir")
      val whPath = Paths.get(new org.apache.hadoop.fs.Path(wh).toUri.getPath)
      val tag = graft.core.DatasetFingerprint.codeTag
      val fp = graft.core.DatasetFingerprint.of(dir)
      val root = whPath.resolve(s"graft_neardup_${tag}_$fp")
      Seq("pairs", "labels", "base_labels")
        .map(t => ManifestV2Sink.versions(root.resolve(t).toString).size)
    }
    val before = snapCounts()
    assert(before.forall(_ >= 1), s"artifact not published: $before")
    NearDupArtifact.resetSlotsForTest()
    val second = NearDupArtifact.labels(spark, dir)
      .orderBy("doc_id").collect().toSeq
    assert(second == first)
    assert(snapCounts() == before,
      "fresh session republished instead of reusing")
  }
}
