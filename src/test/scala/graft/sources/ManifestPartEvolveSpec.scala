package graft.sources

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** Partition evolution (`CALL graft.system.set_partition_spec`):
  * changing the spec moves no data — old files keep their write-time
  * layout tags, new writes cluster under the new spec, mixed-era
  * reads stay exact with conservative pruning, SPJ/agg-pushdown
  * decline until a rewrite migrates every file, and one compaction
  * completes the migration.
  */
class ManifestPartEvolveSpec extends SparkSuite {

  private def fresh(): String =
    s"t_${java.util.UUID.randomUUID().toString.take(8)}"

  private def root: String = spark.conf.get("spark.sql.catalog.graft.root")

  test("evolve unpartitioned -> partitioned: mixed eras exact, " +
    "pruning conservative, compaction completes the migration") {
    val t = fresh()
    val dir = s"$root/$t"
    try {
      spark.sql(s"CREATE TABLE graft.$t (k BIGINT, p BIGINT)")
      // era A: two unpartitioned files
      spark.sql(s"INSERT INTO graft.$t SELECT /*+ COALESCE(1) */ id, " +
        "id % 3 FROM range(0, 30)")
      spark.sql(s"INSERT INTO graft.$t SELECT /*+ COALESCE(1) */ id, " +
        "id % 3 FROM range(30, 60)")
      val r = spark.sql(
        s"CALL graft.system.set_partition_spec('$t', 'p')").collect()
      assert(r(0).getString(0) == "p")
      assert(ManifestV2Sink.tablePartitionColumns(dir) == Seq("p"))
      // era B: clustered write -> one file per p value, P| tagged
      spark.sql(s"INSERT INTO graft.$t SELECT id, id % 3 " +
        "FROM range(60, 90)")
      assert(ManifestV2Sink.committedFileCount(dir) == 5)
      // mixed-era read exact
      assert(spark.sql(s"SELECT count(*) FROM graft.$t")
        .head.getLong(0) == 90L)
      // partition filter: era-B files prune (2 of 3 skipped), era-A
      // files conservatively read — 2 + 1 = 3 planned of 5
      assert(spark.sql(s"SELECT count(*) FROM graft.$t WHERE p = 1")
        .head.getLong(0) == 30L)
      assert(ManifestV2Sink.lastPlannedFiles(dir).contains((3, 5)),
        s"mixed-era prune: ${ManifestV2Sink.lastPlannedFiles(dir)}")
      // partition-grouped aggregate pushdown DECLINES on mixed eras
      // (era-A files carry no p value) — and still answers right
      val gq = spark.sql(
        s"SELECT p, count(*) AS n FROM graft.$t GROUP BY p")
      assert(gq.queryExecution.executedPlan.toString()
        .contains("BatchScan"), "mixed-era group-by must not fold")
      assert(gq.collect().map(r2 => (r2.getLong(0), r2.getLong(1)))
        .sortBy(_._1).toSeq == Seq((0L, 30L), (1L, 30L), (2L, 30L)))
      // one compaction migrates everything to the new spec …
      ManifestV2Sink.compact(spark, dir, 2)
      val entries = ManifestV2Sink.readManifest(dir).get._2
      assert(entries.forall(e =>
        ManifestV2Sink.entryPartition(e).contains("p")),
        "post-compaction files must all carry the new spec")
      // … after which pruning is exact and the grouped fold returns
      spark.sql(s"SELECT count(*) FROM graft.$t WHERE p = 1").collect()
      val (planned, total) = ManifestV2Sink.lastPlannedFiles(dir).get
      assert(planned < total, s"post-migrate prune: $planned/$total")
      assert(spark.sql(s"SELECT p, count(*) AS n FROM graft.$t " +
        "GROUP BY p").queryExecution.executedPlan.toString()
        .contains("LocalTableScan"),
        "post-migrate group-by must fold from metadata")
      // metadata table reports per-file spec eras
      val parts = spark.sql(s"SELECT partition FROM graft.$t.files")
        .collect().map(r2 =>
          Option(r2.getString(0)).getOrElse("null")).toSeq
      assert(parts.forall(_.startsWith("p=")), s"file specs: $parts")
      // evolve BACK to unpartitioned: new writes land untagged
      spark.sql(
        s"CALL graft.system.set_partition_spec('$t', '')").collect()
      assert(ManifestV2Sink.tablePartitionColumns(dir).isEmpty)
      spark.sql(s"INSERT INTO graft.$t VALUES (1000, 7)")
      val last = ManifestV2Sink.readManifest(dir).get._2
      assert(last.exists(e => ManifestV2Sink.entryPartition(e).isEmpty))
    } finally spark.sql(s"DROP TABLE IF EXISTS graft.$t")
  }

  test("spec validation: unknown and duplicate columns, bad types " +
    "are refused; the change is a silent rewrite commit in the feed") {
    val t = fresh()
    val dir = s"$root/$t"
    try {
      spark.sql(s"CREATE TABLE graft.$t (k BIGINT, d DOUBLE)")
      spark.sql(s"INSERT INTO graft.$t VALUES (1, 1.5)")
      val v1 = ManifestV2Sink.versions(dir).max
      def refuse(cols: String, frag: String): Unit = {
        val e = intercept[Exception] {
          spark.sql(
            s"CALL graft.system.set_partition_spec('$t', '$cols')")
        }
        assert(e.getMessage.contains(frag),
          s"wrong error for '$cols': ${e.getMessage}")
      }
      refuse("nope", "not in schema")
      refuse("k,k", "duplicate")
      refuse("d", "must be")
      spark.sql(s"CALL graft.system.set_partition_spec('$t', 'k')")
      val v2 = ManifestV2Sink.versions(dir).max
      assert(v2 == v1 + 1, "spec change must mint a snapshot")
      // silent in the change feed (kind=rewrite, no row changes)
      assert(ManifestCdf.readChanges(spark, dir, v1, v2).count() == 0L)
    } finally spark.sql(s"DROP TABLE IF EXISTS graft.$t")
  }
}
