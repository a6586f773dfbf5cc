package graft.sources

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** The file-narrowed predicate DELETE / stats-narrowed UPDATE
  * contract: provable all-match files DROP as pure metadata, provable
  * no-match files CARRY OVER untouched, boundary files rewrite
  * exactly; null rows block whole-file drops (the recorded null
  * counts are what make drops provable); tombstoned heads refuse; and
  * the SQL surface routes each shape to the cheapest sound tier.
  */
class ManifestPredicateDeleteSpec extends SparkSuite {

  private def fresh(): String =
    s"t_${java.util.UUID.randomUUID().toString.take(8)}"

  private def mkRangeTable(t: String): String = {
    // three single-file commits with disjoint key ranges
    spark.sql(s"CREATE TABLE graft.$t (k BIGINT, v STRING)")
    Seq((0L, 100L), (100L, 200L), (200L, 300L)).foreach { case (lo, hi) =>
      spark.sql(s"INSERT INTO graft.$t " +
        s"SELECT /*+ COALESCE(1) */ id AS k, CAST(id AS STRING) AS v " +
        s"FROM range($lo, $hi)")
    }
    spark.conf.get("spark.sql.catalog.graft.root") + s"/$t"
  }

  test("deleteWhere tiers: drop whole / rewrite boundary / keep rest") {
    import spark.implicits._
    val t = fresh()
    val dir = mkRangeTable(t)
    try {
      val before = ManifestV2Sink.committedDataFiles(dir).toSet
      // k < 150: file [0,100) drops whole (max 99 < 150, zero nulls
      // recorded), file [100,200) rewrites (boundary), [200,300) keeps
      val (dropped, dvd, rewritten, kept) = ManifestV2Sink.deleteWhere(
        spark, dir, Seq(org.apache.spark.sql.sources.LessThan("k", 150L)))
      assert((dropped, dvd, rewritten, kept) == ((1, 0, 1, 1)),
        s"tiers: dropped=$dropped dv=$dvd rewritten=$rewritten kept=$kept")
      val after = ManifestV2Sink.committedDataFiles(dir).toSet
      assert((before & after).size == 1, "exactly the disjoint file kept")
      assert((after -- before).size == 1, "exactly one rewritten file")
      // surviving rows exact
      assert(spark.sql(s"SELECT count(*) FROM graft.$t").as[Long].head()
        == 150L)
      assert(spark.sql(s"SELECT min(k) FROM graft.$t").as[Long].head()
        == 150L)
      // zero tombstones: this is COW, not MOR
      assert(ManifestV2Sink.committedDeleteFileCount(dir) == 0)
    } finally spark.sql(s"DROP TABLE IF EXISTS graft.$t")
  }

  test("null rows block whole-file drops but never leak: a file with " +
    "nulls in the predicate column rewrites instead") {
    import spark.implicits._
    val t = fresh()
    try {
      spark.sql(s"CREATE TABLE graft.$t (k BIGINT, v STRING)")
      spark.sql(s"INSERT INTO graft.$t SELECT /*+ COALESCE(1) */ " +
        "CASE WHEN id = 5 THEN NULL ELSE id END AS k, " +
        "CAST(id AS STRING) AS v FROM range(0, 10)")
      val dir = spark.conf.get("spark.sql.catalog.graft.root") + s"/$t"
      // every non-null k < 100, but the null row must SURVIVE a
      // `k < 100` delete (null never matches) — so the file cannot
      // drop whole; it rewrites down to exactly the null row
      val (dropped, _, rewritten, _) = ManifestV2Sink.deleteWhere(
        spark, dir, Seq(org.apache.spark.sql.sources.LessThan("k", 100L)))
      assert(dropped == 0 && rewritten == 1,
        s"null row must force a rewrite: dropped=$dropped")
      val rows = spark.sql(s"SELECT k, v FROM graft.$t").collect()
      assert(rows.length == 1 && rows(0).isNullAt(0) &&
        rows(0).getString(1) == "5")
    } finally spark.sql(s"DROP TABLE IF EXISTS graft.$t")
  }

  test("predicate DELETE over tombstones is refused; SQL routes each " +
    "shape to its tier") {
    import spark.implicits._
    val t = fresh()
    val dir = mkRangeTable(t)
    try {
      // SQL range delete → predicate COW (no tombstones)
      spark.sql(s"DELETE FROM graft.$t WHERE k >= 250")
      assert(ManifestV2Sink.committedDeleteFileCount(dir) == 0)
      assert(spark.sql(s"SELECT count(*) FROM graft.$t").as[Long].head()
        == 250L)
      // SQL key IN delete → MOR tombstone (zero files rewritten)
      val filesBefore = ManifestV2Sink.committedDataFiles(dir).toSet
      spark.sql(s"DELETE FROM graft.$t WHERE k IN (7, 8)")
      assert(ManifestV2Sink.committedDeleteFileCount(dir) == 1)
      assert(ManifestV2Sink.committedDataFiles(dir).toSet == filesBefore)
      // predicate delete over the tombstoned head is refused loudly
      val e = intercept[Exception] {
        spark.sql(s"DELETE FROM graft.$t WHERE k < 50")
      }
      def msgs(x: Throwable): Seq[String] =
        if (x == null) Seq.empty
        else Option(x.getMessage).toSeq ++ msgs(x.getCause)
      assert(msgs(e).exists(m => m.contains("compact first") ||
        m.contains("Cannot delete")), e.toString)
      // compact materializes the reconcile; the predicate path opens
      ManifestV2Sink.compact(spark, dir, 2)
      spark.sql(s"DELETE FROM graft.$t WHERE k < 50")
      assert(spark.sql(s"SELECT count(*) FROM graft.$t").as[Long].head()
        == 200L) // 250 - 2 tombstoned (7,8) - 48 more below 50
    } finally spark.sql(s"DROP TABLE IF EXISTS graft.$t")
  }

  test("stats-narrowed UPDATE carries disjoint files over untouched") {
    import spark.implicits._
    val t = fresh()
    val dir = mkRangeTable(t)
    try {
      val before = ManifestV2Sink.committedDataFiles(dir).toSet
      spark.sql(s"UPDATE graft.$t SET v = concat(v, '!') WHERE k >= 200")
      val after = ManifestV2Sink.committedDataFiles(dir).toSet
      assert((before & after).size == 2,
        s"two disjoint files must carry over: ${before & after}")
      assert((after -- before).nonEmpty, "the touched file was rewritten")
      // values exact: only k >= 200 got the suffix
      assert(spark.sql(s"SELECT count(*) FROM graft.$t " +
        "WHERE v LIKE '%!'").as[Long].head() == 100L)
      assert(spark.sql(s"SELECT count(*) FROM graft.$t " +
        "WHERE v NOT LIKE '%!'").as[Long].head() == 200L)
      // untranslatable predicate degrades to the honest full COW and
      // still answers exactly
      spark.sql(s"UPDATE graft.$t SET v = 'm' WHERE k % 100 = 3")
      assert(spark.sql(s"SELECT count(*) FROM graft.$t WHERE v = 'm'")
        .as[Long].head() == 3L)
    } finally spark.sql(s"DROP TABLE IF EXISTS graft.$t")
  }

  test("rewrite paths keep partition and Bloom metadata: a DELETE/" +
    "UPDATE on a DDL-partitioned bloom-indexed table must not degrade " +
    "future pruning") {
    import spark.implicits._
    val t = fresh()
    val dir = spark.conf.get("spark.sql.catalog.graft.root") + s"/$t"
    try {
      spark.sql(s"CREATE TABLE graft.$t (k BIGINT, p BIGINT, v STRING) " +
        "PARTITIONED BY (p)")
      // bloom-indexed append through the DataFrame surface (bloom is a
      // write option; the DDL sidecar governs the partition fan-out)
      spark.range(0, 100)
        .selectExpr("id AS k", "id % 2 AS p", "CAST(id AS STRING) AS v")
        .coalesce(1)
        .write.format("graft-manifest").option("bloomColumns", "k")
        .mode("append").save(dir)
      def dataEntries() = ManifestV2Sink.readManifest(dir).get._2
        .filterNot(ManifestV2Sink.isDeleteEntry)
      def allCarryLayout(tag: String): Unit = dataEntries().foreach { e =>
        val part = ManifestV2Sink.entryPartition(e)
        assert(part.get("p").exists(_ != "%00"),
          s"$tag: entry lost its partition blob: $e")
        assert(ManifestV2Sink.entryBloom(e, "k").isDefined,
          s"$tag: entry lost its Bloom blob: $e")
      }
      allCarryLayout("pre")
      // boundary rewrite: a BULK delete (30% of each partition file —
      // above the DV fraction, so the rewrite tier fires)
      val (_, _, rewritten, _) = ManifestV2Sink.deleteWhere(spark, dir,
        Seq(org.apache.spark.sql.sources.LessThan("k", 30L)))
      assert(rewritten > 0, "fixture degenerate: nothing rewritten")
      allCarryLayout("post-delete")
      assert(spark.sql(s"SELECT count(*) FROM graft.$t").as[Long].head()
        == 70L)
      // narrowed UPDATE path (GraftUpdateCommand scratch write)
      spark.sql(s"UPDATE graft.$t SET v = concat(v, '!') WHERE k >= 50")
      allCarryLayout("post-update")
      assert(spark.sql(s"SELECT count(*) FROM graft.$t WHERE v LIKE '%!'")
        .as[Long].head() == 50L)
      // pruning still works end-to-end: a one-partition read plans
      // only that partition's files
      val q = spark.sql(s"SELECT v FROM graft.$t WHERE p = 1")
      val planned = q.rdd.getNumPartitions
      val oneSide = dataEntries().count(e =>
        ManifestV2Sink.entryPartition(e).get("p").contains("1"))
      assert(planned == oneSide,
        s"partition pruning degraded: planned $planned of " +
          s"${dataEntries().size}, partition-1 files $oneSide")
      assert(q.count() == 35)
    } finally spark.sql(s"DROP TABLE IF EXISTS graft.$t")
  }
}
