package graft.sources

import java.nio.file.{Files, Paths}
import java.nio.charset.StandardCharsets

import scala.jdk.CollectionConverters._

import graft.SparkSuite

/** Two-level (segmented) manifest metadata: commits write O(changed
  * entries), not O(table files) — the head carries `seg` references
  * to immutable `_MANIFEST.seg.*` files, reused verbatim while their
  * entries survive. This spec pins the O() contract itself (which
  * segment files each commit writes), plus legacy-format reads,
  * fold, time travel across segment eras, and reclamation.
  */
class ManifestSegmentSpec extends SparkSuite {

  private def fresh(): String =
    s"t_${java.util.UUID.randomUUID().toString.take(8)}"

  private def root: String = spark.conf.get("spark.sql.catalog.graft.root")

  /** (name → size) of every segment file in the table dir. */
  private def segFiles(dir: String): Map[String, Long] = {
    val s = Files.list(Paths.get(dir))
    try s.iterator().asScala.map(_.getFileName.toString)
      .filter(_.startsWith("_MANIFEST.seg."))
      .map(n => n -> Files.size(Paths.get(dir, n))).toMap
    finally s.close()
  }

  private def headSize(dir: String): Long =
    Files.size(Paths.get(dir, "_MANIFEST"))

  test("append commits reuse old segments: O(changed) write, bounded " +
    "head, exact reads") {
    val t = fresh(); val dir = s"$root/$t"
    try {
      spark.sql(s"CREATE TABLE graft.$t (k BIGINT, v BIGINT)")
      // 40 single-file commits: residual inlines until it exceeds
      // SegInlineMax (16), then spills — segments of ~17 entries
      for (i <- 0 until 40)
        spark.sql(s"INSERT INTO graft.$t SELECT /*+ COALESCE(1) */ id, " +
          s"id * 2 FROM range(${i * 10}, ${i * 10 + 10})")
      val segs0 = segFiles(dir)
      assert(segs0.nonEmpty, "40 commits must have spilled segments")
      // every read stays exact through the two-level metadata
      assert(spark.sql(s"SELECT count(*), sum(v) FROM graft.$t")
        .head.toSeq == Seq(400L, 400L * 399L))
      // ONE more append: previously-published segments are not
      // rewritten (same name→size map), at most one new segment
      // appears, and the head stays small — the O(changed) pin
      spark.sql(s"INSERT INTO graft.$t SELECT /*+ COALESCE(1) */ id, " +
        "id * 2 FROM range(400, 410)")
      val segs1 = segFiles(dir)
      segs0.foreach { case (n, sz) =>
        assert(segs1.get(n).contains(sz), s"segment $n was rewritten") }
      assert(segs1.size - segs0.size <= 1, "append wrote >1 new segment")
      assert(headSize(dir) < 8192,
        s"head is ${headSize(dir)} bytes — entries are leaking inline")
      assert(spark.sql(s"SELECT count(*) FROM graft.$t")
        .head.getLong(0) == 410L)
      // stats-bearing entries survive the segment round-trip: a
      // selective filter still prunes files
      spark.sql(s"SELECT count(*) FROM graft.$t WHERE k < 10").collect()
      val (planned, total) = ManifestV2Sink.lastPlannedFiles(dir).get
      assert(planned < total, s"prune through segments: $planned/$total")
    } finally spark.sql(s"DROP TABLE IF EXISTS graft.$t")
  }

  test("delete rewrites only affected segments; untouched ones keep " +
    "their identity") {
    val t = fresh(); val dir = s"$root/$t"
    try {
      spark.sql(s"CREATE TABLE graft.$t (k BIGINT, v BIGINT)")
      for (i <- 0 until 40)
        spark.sql(s"INSERT INTO graft.$t SELECT /*+ COALESCE(1) */ id, " +
          s"id FROM range(${i * 10}, ${i * 10 + 10})")
      val segs0 = segFiles(dir)
      assert(segs0.size >= 2, s"need >=2 segments, got ${segs0.size}")
      // whole-file delete of one commit's range: drops ONE entry
      spark.sql(s"DELETE FROM graft.$t WHERE k >= 0 AND k < 10")
      assert(spark.sql(s"SELECT count(*) FROM graft.$t")
        .head.getLong(0) == 390L)
      val segs1 = segFiles(dir)
      // every segment NOT containing the dropped entry is reused
      val reused = segs0.keySet.intersect(segs1.keySet)
      assert(reused.size >= segs0.size - 1,
        s"delete rewrote ${segs0.size - reused.size} segments")
    } finally spark.sql(s"DROP TABLE IF EXISTS graft.$t")
  }

  test("legacy flat manifests read unchanged and upgrade on the next " +
    "commit") {
    val t = fresh(); val dir = s"$root/$t"
    try {
      spark.sql(s"CREATE TABLE graft.$t (k BIGINT)")
      spark.sql(s"INSERT INTO graft.$t VALUES (1), (2)")
      // rewrite the head to the PRE-SEGMENTATION flat format (inline
      // entries), as an old table on disk would have it
      val (schema, entries) = ManifestV2Sink.readManifest(dir).get
      Files.write(Paths.get(dir, "_MANIFEST"),
        ((schema.json +: entries).mkString("\n") + "\n")
          .getBytes(StandardCharsets.UTF_8))
      assert(spark.sql(s"SELECT sum(k) FROM graft.$t").head.getLong(0) == 3L)
      spark.sql(s"INSERT INTO graft.$t VALUES (4)")
      assert(spark.sql(s"SELECT sum(k) FROM graft.$t").head.getLong(0) == 7L)
    } finally spark.sql(s"DROP TABLE IF EXISTS graft.$t")
  }

  test("fold: segment fan-out is rebounded once refs exceed the fold " +
    "threshold") {
    val t = fresh(); val dir = s"$root/$t"
    sys.props("graft.manifest.seg.inlineMax") = "0"
    sys.props("graft.manifest.seg.foldAt") = "5"
    try {
      spark.sql(s"CREATE TABLE graft.$t (k BIGINT)")
      // inlineMax=0 → every commit spills a segment; foldAt=5 → the
      // commit arriving with 5 kept refs folds all entries into one
      for (i <- 0 until 8)
        spark.sql(s"INSERT INTO graft.$t SELECT /*+ COALESCE(1) */ id " +
          s"FROM range($i, ${i + 1})")
      val head = Files.readAllLines(Paths.get(dir, "_MANIFEST"),
        StandardCharsets.UTF_8).asScala.count(_.startsWith("seg\t"))
      assert(head <= 5, s"head carries $head refs — fold never fired")
      assert(spark.sql(s"SELECT count(*) FROM graft.$t")
        .head.getLong(0) == 8L)
    } finally {
      sys.props -= "graft.manifest.seg.inlineMax"
      sys.props -= "graft.manifest.seg.foldAt"
      spark.sql(s"DROP TABLE IF EXISTS graft.$t")
    }
  }

  test("graft.t.manifests reports the segmentation layout and " +
    "rewrite_manifests folds it in a metadata-only commit") {
    val t = fresh(); val dir = s"$root/$t"
    sys.props("graft.manifest.seg.inlineMax") = "0"
    try {
      spark.sql(s"CREATE TABLE graft.$t (k BIGINT)")
      for (i <- 0 until 6)
        spark.sql(s"INSERT INTO graft.$t SELECT /*+ COALESCE(1) */ id " +
          s"FROM range($i, ${i + 1})")
      val rows = spark.sql(s"SELECT segment, entries, " +
        s"shared_by_snapshots FROM graft.$t.manifests").collect()
      assert(rows.length == 6 &&
        rows.forall(_.getString(0).startsWith("_MANIFEST.seg.")),
        rows.mkString(", "))
      assert(rows.map(_.getLong(1)).sum == 6L)
      // structural sharing: early segments ride many snapshots
      assert(rows.map(_.getLong(2)).max >= 2L)
      val vBefore = ManifestV2Sink.versions(dir).max
      val r = spark.sql(
        s"CALL graft.system.rewrite_manifests('$t')").collect()(0)
      assert(r.getInt(0) == 6 && r.getInt(1) == 1 && r.getInt(2) == 6, r)
      assert(spark.sql(s"SELECT count(*) FROM graft.$t")
        .head.getLong(0) == 6L)
      // metadata-only rewrite commit: silent in the change feed
      assert(ManifestCdf.readChanges(spark, dir, vBefore,
        ManifestV2Sink.versions(dir).max).count() == 0L)
      assert(spark.sql(s"SELECT count(*) FROM graft.$t.manifests")
        .head.getLong(0) == 1L)
    } finally {
      sys.props -= "graft.manifest.seg.inlineMax"
      spark.sql(s"DROP TABLE IF EXISTS graft.$t")
    }
  }

  test("time travel, branches and vacuum stay exact across segment " +
    "eras; orphaned segments are reclaimed, shared ones kept") {
    val t = fresh(); val dir = s"$root/$t"
    sys.props("graft.manifest.seg.inlineMax") = "0"
    try {
      spark.sql(s"CREATE TABLE graft.$t (k BIGINT)")
      for (i <- 0 until 6)
        spark.sql(s"INSERT INTO graft.$t SELECT /*+ COALESCE(1) */ id " +
          s"FROM range(${i * 5}, ${i * 5 + 5})")
      val vMid = ManifestV2Sink.versions(dir).max
      spark.sql(s"INSERT INTO graft.$t SELECT /*+ COALESCE(1) */ id " +
        "FROM range(30, 35)")
      // snapshot reads expand the SAME shared segments
      assert(spark.sql(
        s"SELECT count(*) FROM graft.$t VERSION AS OF $vMid")
        .head.getLong(0) == 30L)
      ManifestV2Sink.createBranch(dir, "b1")
      // vacuum with everything referenced: no segment vanishes
      val liveSegs = segFiles(dir).keySet
      ManifestV2Sink.vacuum(dir)
      assert(segFiles(dir).keySet == liveSegs,
        "vacuum deleted a referenced segment")
      // overwrite main → expire history → only segments still
      // referenced by the branch (or head) survive vacuum
      spark.sql(s"INSERT OVERWRITE graft.$t SELECT id FROM range(3)")
      ManifestV2Sink.expireSnapshots(dir, keepLast = 1)
      ManifestV2Sink.vacuum(dir)
      val kept = segFiles(dir).keySet
      val branchRefs = ManifestV2Sink.segRefsOf(
        Paths.get(dir, "_MANIFEST.branch-b1")).toSet
      val headRefs = ManifestV2Sink.segRefsOf(
        Paths.get(dir, "_MANIFEST")).toSet
      assert(kept == branchRefs ++ headRefs,
        s"kept=$kept vs referenced=${branchRefs ++ headRefs}")
      // the branch still reads its full pre-overwrite state
      assert(spark.read.format("graft-manifest")
        .option("branch", "b1").load(dir).count() == 35L)
      assert(spark.sql(s"SELECT count(*) FROM graft.$t")
        .head.getLong(0) == 3L)
    } finally {
      sys.props -= "graft.manifest.seg.inlineMax"
      spark.sql(s"DROP TABLE IF EXISTS graft.$t")
    }
  }
}
