package graft.sources

import org.apache.spark.sql.functions._
import org.apache.spark.sql.sources.{And => SAnd, GreaterThanOrEqual, LessThan}

import graft.SparkSuite

/** MERGE-ON-READ deletion vectors: a point-ish predicate DELETE on a
  * wide file writes a KB-sized positional sidecar instead of
  * rewriting the file; every read surface applies it; a second delete
  * unions positions; rewrites (compaction, narrowed UPDATE) merge the
  * DV away and never resurrect deleted rows; bulk deletes still take
  * the rewrite tier; time travel and vacuum stay exact.
  */
class ManifestDvSpec extends SparkSuite {

  private def fresh(): String =
    s"t_${java.util.UUID.randomUUID().toString.take(8)}"

  private def root: String = spark.conf.get("spark.sql.catalog.graft.root")

  private def dvEntries(dir: String): Seq[(String, Long)] =
    ManifestV2Sink.readManifest(dir).get._2
      .flatMap(ManifestV2Sink.entryDv)

  test("point-ish DELETE takes the DV tier: data file unchanged, " +
    "sidecar written, all read surfaces reconcile") {
    import spark.implicits._
    val t = fresh()
    val dir = s"$root/$t"
    try {
      spark.sql(s"CREATE TABLE graft.$t (k BIGINT, v STRING)")
      spark.sql(s"INSERT INTO graft.$t SELECT /*+ COALESCE(1) */ id, " +
        "CAST(id AS STRING) FROM range(0, 1000)")
      val before = ManifestV2Sink.committedDataFiles(dir).toSet
      val vBefore = ManifestV2Sink.versions(dir).max
      // 10 of 1000 rows (1%) — the DV tier
      val (dropped, dvd, rewritten, kept) = ManifestV2Sink.deleteWhere(
        spark, dir, Seq(SAnd(GreaterThanOrEqual("k", 100L),
          LessThan("k", 110L))))
      assert((dropped, dvd, rewritten, kept) == ((0, 1, 0, 0)),
        s"tiers: $dropped/$dvd/$rewritten/$kept")
      // ZERO data files moved — the whole point
      assert(ManifestV2Sink.committedDataFiles(dir).toSet == before,
        "DV tier must not rewrite data files")
      val Seq((dvRel, dvCount)) = dvEntries(dir)
      assert(dvCount == 10L && dvRel.contains(".parquet.dv-"),
        s"dv blob: $dvRel:$dvCount")
      // every read surface reconciles
      assert(spark.sql(s"SELECT count(*) FROM graft.$t").as[Long].head()
        == 990L)
      assert(spark.sql(s"SELECT count(*) FROM graft.$t " +
        "WHERE k BETWEEN 95 AND 114").as[Long].head() == 10L)
      assert(ManifestV2Sink.readCommitted(spark, dir).count() == 990L)
      assert(ManifestV2Sink.readPruned(spark, dir, "k", 0L, 200L)
        .where(col("k").between(0, 200)).count() == 191L)
      // DV'd scans take the row path (positions need sequential decode)
      val q = spark.table(s"graft.$t")
      assert(q.count() == 990L)
      assert(!q.queryExecution.executedPlan.toString()
        .contains("ColumnarToRow"), "DV'd scan must be row-based")
      // reported statistics subtract the DV
      assert(spark.table(s"graft.$t").queryExecution.optimizedPlan
        .stats.rowCount.contains(BigInt(990)))
      // pre-delete snapshot still serves the deleted rows
      assert(ManifestV2Sink.readVersion(spark, dir, vBefore).count()
        == 1000L)
      // the sidecar is referenced — vacuum must not release it
      assert(!ManifestV2Sink.unreferencedFiles(dir).contains(dvRel))
    } finally spark.sql(s"DROP TABLE IF EXISTS graft.$t")
  }

  test("a second point delete UNIONS positions into a fresh sidecar; " +
    "SQL DELETE routes point-ish ranges to the DV tier") {
    import spark.implicits._
    val t = fresh()
    val dir = s"$root/$t"
    try {
      spark.sql(s"CREATE TABLE graft.$t (k BIGINT, v STRING)")
      spark.sql(s"INSERT INTO graft.$t SELECT /*+ COALESCE(1) */ id, " +
        "CAST(id AS STRING) FROM range(0, 1000)")
      spark.sql(s"DELETE FROM graft.$t WHERE k >= 100 AND k < 110")
      val Seq((rel1, n1)) = dvEntries(dir)
      assert(n1 == 10L, s"first DV: $rel1:$n1")
      // second delete overlaps the first (105..115) — union, not sum
      spark.sql(s"DELETE FROM graft.$t WHERE k >= 105 AND k < 115")
      val Seq((rel2, n2)) = dvEntries(dir)
      assert(n2 == 15L && rel2 != rel1, s"union DV: $rel2:$n2")
      assert(spark.sql(s"SELECT count(*) FROM graft.$t").as[Long].head()
        == 985L)
      assert(spark.sql(s"SELECT min(k) FROM graft.$t " +
        "WHERE k >= 100").as[Long].head() == 115L)
    } finally spark.sql(s"DROP TABLE IF EXISTS graft.$t")
  }

  test("rewrites merge DVs away and never resurrect: compaction " +
    "clears the sidecar refs; narrowed UPDATE reads DV-aware") {
    import spark.implicits._
    val t = fresh()
    val dir = s"$root/$t"
    try {
      spark.sql(s"CREATE TABLE graft.$t (k BIGINT, v STRING)")
      // two single-file commits: [0,1000) and [1000,2000)
      Seq((0L, 1000L), (1000L, 2000L)).foreach { case (lo, hi) =>
        spark.sql(s"INSERT INTO graft.$t SELECT /*+ COALESCE(1) */ id, " +
          s"CAST(id AS STRING) FROM range($lo, $hi)")
      }
      spark.sql(s"DELETE FROM graft.$t WHERE k >= 500 AND k < 510")
      assert(dvEntries(dir).size == 1)
      // narrowed UPDATE touching the DV'd file must not resurrect
      spark.sql(s"UPDATE graft.$t SET v = 'u' WHERE k < 600")
      assert(spark.sql(s"SELECT count(*) FROM graft.$t").as[Long].head()
        == 1990L, "UPDATE resurrected DV-deleted rows")
      assert(spark.sql(s"SELECT count(*) FROM graft.$t WHERE v = 'u'")
        .as[Long].head() == 590L)
      // the touched file was rewritten → its DV merged away
      assert(dvEntries(dir).isEmpty,
        "rewrite must merge the deletion vector away")
      // fresh DV, then compaction also merges it away
      spark.sql(s"DELETE FROM graft.$t WHERE k >= 1500 AND k < 1503")
      assert(dvEntries(dir).size == 1)
      ManifestV2Sink.compact(spark, dir, 2)
      assert(dvEntries(dir).isEmpty, "compaction must merge DVs away")
      assert(spark.sql(s"SELECT count(*) FROM graft.$t").as[Long].head()
        == 1987L)
      // columnar path restored after the DVs are gone
      val q = spark.table(s"graft.$t")
      assert(q.count() == 1987L)
      assert(q.queryExecution.executedPlan.toString()
        .contains("ColumnarToRow"), "post-compaction scan not columnar")
    } finally spark.sql(s"DROP TABLE IF EXISTS graft.$t")
  }

  test("bulk deletes still take the rewrite tier; probe-proved " +
    "no-match boundary files carry over untouched") {
    val t = fresh()
    val dir = s"$root/$t"
    try {
      spark.sql(s"CREATE TABLE graft.$t (k BIGINT, v STRING)")
      spark.sql(s"INSERT INTO graft.$t SELECT /*+ COALESCE(1) */ id, " +
        "CAST(id AS STRING) FROM range(0, 1000)")
      // 50% match — far above the DV fraction → rewrite
      val (_, dvd, rewritten, _) = ManifestV2Sink.deleteWhere(
        spark, dir, Seq(LessThan("k", 500L)))
      assert(dvd == 0 && rewritten == 1, s"bulk: dv=$dvd rw=$rewritten")
      // a STRING predicate has no stats → boundary by metadata; the
      // probe proves zero rows match → the file carries over untouched
      val before = ManifestV2Sink.committedDataFiles(dir).toSet
      val (d2, dv2, rw2, k2) = ManifestV2Sink.deleteWhere(spark, dir,
        Seq(org.apache.spark.sql.sources.EqualTo("v", "nope")))
      assert((d2, dv2, rw2, k2) == ((0, 0, 0, 1)),
        s"no-match probe: $d2/$dv2/$rw2/$k2")
      assert(ManifestV2Sink.committedDataFiles(dir).toSet == before)
    } finally spark.sql(s"DROP TABLE IF EXISTS graft.$t")
  }

  test("three-valued logic in the DV probe: NOT over a NULL " +
    "comparison never deletes (parity with the rewrite tier)") {
    import org.apache.spark.sql.sources.{EqualTo => SEq, In => SIn,
      Not => SNot, Or => SOr}
    val t = fresh()
    val dir = s"$root/$t"
    try {
      spark.sql(s"CREATE TABLE graft.$t (k BIGINT, x BIGINT)")
      // x = 5 everywhere except: 7 for k<5, NULL for 5<=k<10
      spark.sql(s"INSERT INTO graft.$t SELECT /*+ COALESCE(1) */ id, " +
        "CASE WHEN id < 5 THEN 7 WHEN id < 10 THEN NULL ELSE 5 END " +
        "FROM range(0, 1000)")
      // `x <> 5`: TRUE only for x=7 (5 rows); NULL for the NULL rows
      // — ANSI deletes nothing whose predicate is NULL. Point-ish
      // match count → the DV tier (the tier that had the bug).
      val (dropped, dvd, rewritten, kept) = ManifestV2Sink.deleteWhere(
        spark, dir, Seq(SNot(SEq("x", 5L))))
      assert(dvd == 1 && dropped == 0 && rewritten == 0,
        s"tiers: $dropped/$dvd/$rewritten/$kept")
      assert(spark.sql(s"SELECT count(*) FROM graft.$t").head.getLong(0)
        == 995L, "only the 5 x=7 rows may be deleted")
      assert(spark.sql(
        s"SELECT count(*) FROM graft.$t WHERE x IS NULL")
        .head.getLong(0) == 5L, "NULL rows must survive NOT(x=5)")
      // Kleene OR: NULL OR TRUE = TRUE — a disjunct that IS true on
      // the NULL-x rows still deletes them
      val (_, dvd2, _, _) = ManifestV2Sink.deleteWhere(spark, dir,
        Seq(SOr(SNot(SEq("x", 5L)), SIn("k", Array(5L, 6L)))))
      assert(dvd2 == 1, "second DV delete expected")
      assert(spark.sql(
        s"SELECT count(*) FROM graft.$t WHERE x IS NULL")
        .head.getLong(0) == 3L, "k=5,6 deleted via the TRUE disjunct")
      assert(spark.sql(s"SELECT count(*) FROM graft.$t").head.getLong(0)
        == 993L)
    } finally spark.sql(s"DROP TABLE IF EXISTS graft.$t")
  }

  test("evalFilters is Kleene-correct on NULLs: Not/And/Or/In") {
    import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
    import org.apache.spark.sql.sources._
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(StructField("x", LongType),
      StructField("s", StringType)))
    def row(x: java.lang.Long, s: String): GenericInternalRow =
      new GenericInternalRow(Array[Any](
        if (x == null) null else x.longValue(),
        if (s == null) null
        else org.apache.spark.unsafe.types.UTF8String.fromString(s)))
    def ev(f: Filter, r: GenericInternalRow): Boolean =
      ManifestSkipping.evalFilters(schema, Seq(f), r)
    val nullRow = row(null, null)
    // NOT(x=5) over NULL x is NULL → not a match
    assert(!ev(Not(EqualTo("x", 5L)), nullRow))
    assert(ev(Not(EqualTo("x", 5L)), row(7L, "a")))
    assert(!ev(Not(EqualTo("x", 5L)), row(5L, "a")))
    // NOT(IS NULL) stays two-valued
    assert(!ev(Not(IsNull("x")), nullRow))
    assert(ev(Not(IsNull("x")), row(1L, null)))
    // FALSE AND NULL = FALSE → NOT of it = TRUE
    assert(ev(Not(And(EqualTo("x", 5L), EqualTo("s", "z"))),
      row(4L, null)))
    // TRUE AND NULL = NULL → NOT of it = NULL (no match)
    assert(!ev(Not(And(EqualTo("x", 4L), EqualTo("s", "z"))),
      row(4L, null)))
    assert(!ev(And(EqualTo("x", 4L), EqualTo("s", "z")), row(4L, null)))
    // TRUE OR NULL = TRUE even with the NULL side first
    assert(ev(Or(EqualTo("s", "z"), EqualTo("x", 4L)), row(4L, null)))
    // NOT(FALSE OR NULL) = NOT(NULL) = NULL → no match
    assert(!ev(Not(Or(EqualTo("x", 9L), EqualTo("s", "z"))),
      row(4L, null)))
    // ANSI IN: x IN (4, NULL) = TRUE on match; 9 IN (4, NULL) = NULL
    // → NOT IN over it must NOT match
    assert(ev(In("x", Array[Any](4L, null)), row(4L, "a")))
    assert(!ev(Not(In("x", Array[Any](4L, null))), row(9L, "a")))
    assert(ev(Not(In("x", Array[Any](4L, 5L))), row(9L, "a")))
    // EqualNullSafe is two-valued through NOT
    assert(!ev(Not(EqualNullSafe("x", null)), nullRow))
    assert(ev(Not(EqualNullSafe("x", 5L)), nullRow))
    // string predicates over NULL are NULL through NOT
    assert(!ev(Not(StringStartsWith("s", "a")), nullRow))
    assert(ev(Not(StringStartsWith("s", "a")), row(1L, "bc")))
  }
}
