package graft.sources

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** DDL/DML contract of the `graft` TableCatalog: SQL create/insert/
  * select/alter/rename/drop drive the same transactional manifest
  * tables the DataFrame API writes, and the two surfaces see each
  * other's commits.
  */
class ManifestCatalogSpec extends SparkSuite {

  private def fresh(): String =
    s"t_${java.util.UUID.randomUUID().toString.take(8)}"

  test("create + insert + select round-trips through pure SQL") {
    val t = fresh()
    try {
      spark.sql(s"CREATE TABLE graft.$t (id BIGINT, s STRING)")
      spark.sql(s"INSERT INTO graft.$t VALUES (1, 'a'), (2, 'b')")
      spark.sql(s"INSERT INTO graft.$t VALUES (3, 'c')")
      val got = spark.sql(s"SELECT id, s FROM graft.$t ORDER BY id")
        .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
      assert(got == Seq((1L, "a"), (2L, "b"), (3L, "c")))
      // each INSERT was one manifest commit: create=v1 + 2 inserts
      val dir = spark.conf.get("spark.sql.catalog.graft.root") + s"/$t"
      assert(ManifestV2Sink.versions(dir).size == 3)
    } finally spark.sql(s"DROP TABLE IF EXISTS graft.$t")
  }

  test("SQL and DataFrame surfaces share the table") {
    import spark.implicits._
    val t = fresh()
    val dir = spark.conf.get("spark.sql.catalog.graft.root") + s"/$t"
    try {
      spark.sql(s"CREATE TABLE graft.$t (id BIGINT)")
      // DataFrame write into the catalog-created table directory
      Seq(10L, 20L).toDF("id")
        .write.format("graft-manifest").mode("append").save(dir)
      assert(spark.sql(s"SELECT id FROM graft.$t ORDER BY id")
        .as[Long].collect().toSeq == Seq(10L, 20L))
      // SQL write read back through the API surface
      spark.sql(s"INSERT INTO graft.$t VALUES (30)")
      assert(ManifestV2Sink.readCommitted(spark, dir)
        .orderBy("id").as[Long].collect().toSeq == Seq(10L, 20L, 30L))
    } finally spark.sql(s"DROP TABLE IF EXISTS graft.$t")
  }

  test("ALTER TABLE ADD COLUMN is a metadata-only commit; old rows " +
    "null-fill; other changes are rejected") {
    val t = fresh()
    val dir = spark.conf.get("spark.sql.catalog.graft.root") + s"/$t"
    try {
      spark.sql(s"CREATE TABLE graft.$t (id BIGINT)")
      spark.sql(s"INSERT INTO graft.$t VALUES (1)")
      val filesBefore = ManifestV2Sink.committedFileCount(dir)
      spark.sql(s"ALTER TABLE graft.$t ADD COLUMN v BIGINT")
      assert(ManifestV2Sink.committedFileCount(dir) == filesBefore,
        "evolution must not rewrite any data file")
      spark.sql(s"INSERT INTO graft.$t VALUES (2, 20)")
      val got = spark.sql(s"SELECT id, v FROM graft.$t ORDER BY id")
        .collect().map(r =>
          (r.getLong(0), if (r.isNullAt(1)) None else Some(r.getLong(1))))
      assert(got.toSeq == Seq((1L, None), (2L, Some(20L))))
      val e = intercept[Exception] {
        spark.sql(s"ALTER TABLE graft.$t ALTER COLUMN v TYPE STRING")
      }
      assert(e.getMessage != null)
    } finally spark.sql(s"DROP TABLE IF EXISTS graft.$t")
  }

  test("duplicate create fails; rename moves; drop removes") {
    val t = fresh(); val t2 = fresh()
    try {
      spark.sql(s"CREATE TABLE graft.$t (id BIGINT)")
      intercept[Exception] {
        spark.sql(s"CREATE TABLE graft.$t (id BIGINT)")
      }
      spark.sql(s"INSERT INTO graft.$t VALUES (7)")
      spark.sql(s"ALTER TABLE graft.$t RENAME TO $t2")
      assert(spark.sql(s"SELECT id FROM graft.$t2").collect()
        .map(_.getLong(0)).toSeq == Seq(7L))
      intercept[Exception] { spark.sql(s"SELECT id FROM graft.$t") }
      spark.sql(s"DROP TABLE graft.$t2")
      intercept[Exception] { spark.sql(s"SELECT id FROM graft.$t2") }
    } finally {
      spark.sql(s"DROP TABLE IF EXISTS graft.$t")
      spark.sql(s"DROP TABLE IF EXISTS graft.$t2")
    }
  }

  test("CTAS creates and populates a table in one SQL statement") {
    val t = fresh()
    val dir = spark.conf.get("spark.sql.catalog.graft.root") + s"/$t"
    try {
      spark.sql(s"CREATE TABLE graft.$t AS " +
        "SELECT CAST(id AS BIGINT) AS id, CAST(id * 7 AS BIGINT) AS v " +
        "FROM range(5)")
      val got = spark.sql(s"SELECT id, v FROM graft.$t ORDER BY id")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
      assert(got == (0L until 5L).map(i => (i, i * 7)))
      // CTAS went through the normal commit protocol: a real manifest
      assert(ManifestV2Sink.hasCommitted(dir))
    } finally spark.sql(s"DROP TABLE IF EXISTS graft.$t")
  }

  test("SQL DELETE routes to merge-on-read tombstones: zero data " +
    "files rewritten; bare DELETE truncates") {
    import spark.implicits._
    val t = fresh()
    val dir = spark.conf.get("spark.sql.catalog.graft.root") + s"/$t"
    try {
      spark.sql(s"CREATE TABLE graft.$t (id BIGINT, s STRING)")
      spark.sql(s"INSERT INTO graft.$t VALUES " +
        "(1, 'a'), (2, 'b'), (3, 'c'), (4, 'd')")
      val filesBefore = ManifestV2Sink.committedFileCount(dir)
      spark.sql(s"DELETE FROM graft.$t WHERE id IN (2, 4)")
      assert(ManifestV2Sink.committedFileCount(dir) == filesBefore,
        "SQL DELETE must not rewrite data files (merge-on-read)")
      assert(ManifestV2Sink.committedDeleteFileCount(dir) > 0,
        "SQL DELETE must land tombstones")
      assert(spark.sql(s"SELECT id FROM graft.$t ORDER BY id")
        .as[Long].collect().toSeq == Seq(1L, 3L))
      spark.sql(s"DELETE FROM graft.$t WHERE id = 3")
      assert(spark.sql(s"SELECT id FROM graft.$t").as[Long]
        .collect().toSeq == Seq(1L))
      // unsupported predicate shapes are refused, not mis-deleted
      intercept[Exception] {
        spark.sql(s"DELETE FROM graft.$t WHERE id > 0 AND s = 'a'")
      }
      assert(spark.sql(s"SELECT id FROM graft.$t").count() == 1)
      // bare DELETE = truncate, one metadata commit
      spark.sql(s"DELETE FROM graft.$t")
      assert(spark.sql(s"SELECT id FROM graft.$t").count() == 0)
      // pre-truncate state stays time-travelable
      val vs = ManifestV2Sink.versions(dir)
      assert(ManifestV2Sink.readVersion(spark, dir, vs.dropRight(1).last)
        .count() > 0)
    } finally spark.sql(s"DROP TABLE IF EXISTS graft.$t")
  }

  test("SQL reads reconcile merge-on-read tombstones") {
    import spark.implicits._
    val t = fresh()
    val dir = spark.conf.get("spark.sql.catalog.graft.root") + s"/$t"
    try {
      spark.sql(s"CREATE TABLE graft.$t (id BIGINT, s STRING)")
      spark.sql(
        s"INSERT INTO graft.$t VALUES (1, 'a'), (2, 'b'), (3, 'c')")
      ManifestV2Sink.delete(spark, dir, "id", Seq(2L).toDF("id"))
      assert(spark.sql(s"SELECT id FROM graft.$t ORDER BY id")
        .as[Long].collect().toSeq == Seq(1L, 3L),
        "the DSv2 batch scan must apply tombstones")
    } finally spark.sql(s"DROP TABLE IF EXISTS graft.$t")
  }

  test("VERSION AS OF serves each snapshot's rows AND schema; " +
    "frozen snapshots reject writes; holes fail loudly") {
    import spark.implicits._
    val t = fresh()
    val dir = spark.conf.get("spark.sql.catalog.graft.root") + s"/$t"
    try {
      spark.sql(s"CREATE TABLE graft.$t (id BIGINT)")
      spark.sql(s"INSERT INTO graft.$t VALUES (1), (2)")
      val vBefore = ManifestV2Sink.versions(dir).max
      // evolve: add a column, then write rows that use it
      spark.sql(s"ALTER TABLE graft.$t ADD COLUMN v BIGINT")
      spark.sql(s"INSERT INTO graft.$t VALUES (3, 30)")
      // the old snapshot serves the PRE-EVOLUTION schema and rows
      val old = spark.sql(s"SELECT * FROM graft.$t VERSION AS OF $vBefore")
      assert(old.schema.fieldNames.toSeq == Seq("id"),
        s"time travel must serve the snapshot's schema, got ${old.schema}")
      assert(old.as[Long].collect().sorted.toSeq == Seq(1L, 2L))
      assert(spark.sql(s"SELECT id FROM graft.$t").count() == 3)
      // a delete after the snapshot stays invisible to it
      ManifestV2Sink.delete(spark, dir, "id", Seq(1L).toDF("id"))
      assert(spark.sql(
        s"SELECT id FROM graft.$t VERSION AS OF $vBefore ORDER BY id")
        .as[Long].collect().toSeq == Seq(1L, 2L))
      // TIMESTAMP AS OF now resolves to the head
      val nowMs = System.currentTimeMillis() + 1000
      val ts = new java.sql.Timestamp(nowMs)
      assert(spark.sql(
        s"SELECT id FROM graft.$t TIMESTAMP AS OF '$ts'").count() == 2)
      // writes to a frozen snapshot are rejected at analysis
      val e = intercept[Exception] {
        spark.sql(s"INSERT INTO graft.$t VERSION AS OF $vBefore VALUES (9)")
      }
      assert(e.getMessage != null)
      // a retention hole fails the read instead of serving "empty"
      val missing = intercept[Exception] {
        spark.sql(s"SELECT * FROM graft.$t VERSION AS OF 9999").collect()
      }
      assert(missing.getMessage.contains("9999"), missing.getMessage)
    } finally spark.sql(s"DROP TABLE IF EXISTS graft.$t")
  }

  test("TIMESTAMP AS OF resolves via the recorded commit log, immune " +
    "to snapshot-file mtime skew") {
    val t = fresh()
    val dir = spark.conf.get("spark.sql.catalog.graft.root") + s"/$t"
    try {
      spark.sql(s"CREATE TABLE graft.$t (id BIGINT)")
      spark.sql(s"INSERT INTO graft.$t VALUES (1)")
      val tsBetween = new java.sql.Timestamp(System.currentTimeMillis())
      Thread.sleep(20)
      spark.sql(s"INSERT INTO graft.$t VALUES (2)")
      // simulate a directory copy / backup restore: every snapshot
      // file's mtime jumps to "now" — mtime-based resolution would
      // now find NO snapshot at tsBetween; the recorded publish
      // times in _MANIFEST.commits must carry the answer
      ManifestV2Sink.versions(dir).foreach { v =>
        java.nio.file.Files.setLastModifiedTime(
          ManifestV2Sink.versionFile(dir, v),
          java.nio.file.attribute.FileTime.fromMillis(
            System.currentTimeMillis() + 3600 * 1000))
      }
      assert(spark.sql(
        s"SELECT id FROM graft.$t TIMESTAMP AS OF '$tsBetween'")
        .count() == 1, "commit-log resolution failed under mtime skew")
    } finally spark.sql(s"DROP TABLE IF EXISTS graft.$t")
  }

  test("MERGE INTO routes the canonical upsert to one atomic COW " +
    "commit; other shapes fail at analysis") {
    val t = fresh()
    val dir = spark.conf.get("spark.sql.catalog.graft.root") + s"/$t"
    try {
      spark.sql(s"CREATE TABLE graft.$t (id BIGINT, v BIGINT)")
      spark.sql(s"INSERT INTO graft.$t VALUES (1, 10), (2, 20), (3, 30)")
      val vBefore = ManifestV2Sink.versions(dir).max
      spark.sql(s"""MERGE INTO graft.$t tgt
        |USING (SELECT * FROM VALUES (2, 200), (4, 400) AS u(id, v)) src
        |ON tgt.id = src.id
        |WHEN MATCHED THEN UPDATE SET *
        |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
      val got = spark.sql(s"SELECT id, v FROM graft.$t ORDER BY id")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
      assert(got == Seq((1L, 10L), (2L, 200L), (3L, 30L), (4L, 400L)),
        s"merge result wrong: $got")
      // exactly ONE commit, and the pre-merge state stays travelable
      assert(ManifestV2Sink.versions(dir).max == vBefore + 1,
        "MERGE must publish exactly one commit")
      assert(spark.sql(
        s"SELECT SUM(v) FROM graft.$t VERSION AS OF $vBefore")
        .head.getLong(0) == 60L)
      // explicit full SET lists are the same canonical shape
      spark.sql(s"""MERGE INTO graft.$t tgt
        |USING (SELECT * FROM VALUES (4, 444) AS u(id, v)) src
        |ON tgt.id = src.id
        |WHEN MATCHED THEN UPDATE SET id = src.id, v = src.v
        |WHEN NOT MATCHED THEN INSERT (id, v) VALUES (src.id, src.v)"""
        .stripMargin)
      assert(spark.sql(s"SELECT v FROM graft.$t WHERE id = 4")
        .head.getLong(0) == 444L)
      // NOT MATCHED BY SOURCE routes to the general rewrite (it can
      // never take the canonical upsert fast path) and works: update
      // the matched row, retire everything else
      spark.sql(s"""MERGE INTO graft.$t tgt
        |USING (SELECT * FROM VALUES (1, 0) AS u(id, v)) src
        |ON tgt.id = src.id
        |WHEN MATCHED THEN UPDATE SET v = src.v
        |WHEN NOT MATCHED BY SOURCE THEN DELETE""".stripMargin)
      val fin = spark.sql(s"SELECT id, v FROM graft.$t").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSeq
      assert(fin == Seq((1L, 0L)), s"sync wrong: $fin")
    } finally spark.sql(s"DROP TABLE IF EXISTS graft.$t")
  }

  test("general MERGE: conditional matched actions, DELETE actions, " +
    "partial SET lists — the CDC-apply shape as one SQL statement") {
    val t = fresh()
    val dir = spark.conf.get("spark.sql.catalog.graft.root") + s"/$t"
    try {
      spark.sql(s"CREATE TABLE graft.$t (id BIGINT, v BIGINT, s STRING)")
      spark.sql(
        s"INSERT INTO graft.$t VALUES (1, 10, 'a'), (2, 20, 'b'), " +
          "(3, 30, 'c'), (4, 40, 'd')")
      val vBefore = ManifestV2Sink.versions(dir).max
      // one CDC batch: delete id=2, update id=3 (partial SET — only
      // v, s untouched), upsert id=5; id=4's op matches no action and
      // must pass through unchanged; the op='X' insert row must DROP
      spark.sql(s"""MERGE INTO graft.$t tgt
        |USING (SELECT * FROM VALUES
        |  (2, 0,   'D'), (3, 333, 'U'), (5, 555, 'I'), (6, 0, 'X'),
        |  (4, 999, 'Z')
        |  AS u(id, nv, op)) src
        |ON tgt.id = src.id
        |WHEN MATCHED AND src.op = 'D' THEN DELETE
        |WHEN MATCHED AND src.op = 'U' THEN UPDATE SET v = src.nv
        |WHEN NOT MATCHED AND src.op = 'I'
        |  THEN INSERT (id, v, s) VALUES (src.id, src.nv, 'ins')"""
        .stripMargin)
      val got = spark.sql(s"SELECT id, v, s FROM graft.$t ORDER BY id")
        .collect().map(r =>
          (r.getLong(0), r.getLong(1), r.getString(2))).toSeq
      assert(got == Seq((1L, 10L, "a"), (3L, 333L, "c"),
        (4L, 40L, "d"), (5L, 555L, "ins")), s"cdc-apply wrong: $got")
      // exactly ONE commit; pre-merge state stays travelable
      assert(ManifestV2Sink.versions(dir).max == vBefore + 1,
        "general MERGE must publish exactly one commit")
      assert(spark.sql(
        s"SELECT SUM(v) FROM graft.$t VERSION AS OF $vBefore")
        .head.getLong(0) == 100L)
      // ordered actions: the FIRST matching action wins (ANSI) — an
      // unconditional UPDATE after a conditional DELETE never fires
      // for 'D' rows
      spark.sql(s"""MERGE INTO graft.$t tgt
        |USING (SELECT * FROM VALUES (3, 'D'), (4, 'U')
        |  AS u(id, op)) src
        |ON tgt.id = src.id
        |WHEN MATCHED AND src.op = 'D' THEN DELETE
        |WHEN MATCHED THEN UPDATE SET v = tgt.v + 1""".stripMargin)
      val got2 = spark.sql(s"SELECT id, v FROM graft.$t ORDER BY id")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
      assert(got2 == Seq((1L, 10L), (4L, 41L), (5L, 555L)),
        s"ordered actions wrong: $got2")
    } finally spark.sql(s"DROP TABLE IF EXISTS graft.$t")
  }

  test("general MERGE raises on cardinality violation: >1 source row " +
    "matching one target row must not silently duplicate it") {
    val t = fresh()
    val dir = spark.conf.get("spark.sql.catalog.graft.root") + s"/$t"
    try {
      spark.sql(s"CREATE TABLE graft.$t (id BIGINT, v BIGINT)")
      spark.sql(s"INSERT INTO graft.$t VALUES (1, 10), (2, 20)")
      val vBefore = ManifestV2Sink.versions(dir).max
      // two source rows match target id=1 → ANSI cardinality error
      val e = intercept[Exception] {
        spark.sql(s"""MERGE INTO graft.$t tgt
          |USING (SELECT * FROM VALUES (1, 111), (1, 222), (3, 333)
          |  AS u(id, nv)) src
          |ON tgt.id = src.id
          |WHEN MATCHED AND src.nv > 200 THEN UPDATE SET v = src.nv
          |WHEN NOT MATCHED THEN INSERT (id, v) VALUES (src.id, src.nv)
          |""".stripMargin)
      }
      def rootMsg(x: Throwable): String = {
        var c: Throwable = x
        val sb = new StringBuilder
        while (c != null) { sb.append(c.getMessage).append(' '); c = c.getCause }
        sb.toString
      }
      assert(rootMsg(e).contains("cardinality"), rootMsg(e))
      // nothing published, table unchanged
      assert(ManifestV2Sink.versions(dir).max == vBefore,
        "failed MERGE must not commit")
      assert(spark.sql(s"SELECT SUM(v) FROM graft.$t").head.getLong(0)
        == 30L)
      // duplicate source rows that match NO target row are legal:
      // each unmatched source row inserts (ANSI)
      spark.sql(s"""MERGE INTO graft.$t tgt
        |USING (SELECT * FROM VALUES (7, 70), (8, 80), (8, 81)
        |  AS u(id, nv)) src
        |ON tgt.id = src.id
        |WHEN MATCHED THEN UPDATE SET v = src.nv
        |WHEN NOT MATCHED THEN INSERT (id, v) VALUES (src.id, src.nv)
        |""".stripMargin)
      assert(spark.sql(s"SELECT COUNT(*) FROM graft.$t WHERE id = 8")
        .head.getLong(0) == 2L)
    } finally spark.sql(s"DROP TABLE IF EXISTS graft.$t")
  }

  test("NOT MATCHED BY SOURCE completes ANSI MERGE: the table-sync " +
    "idiom in one statement") {
    val t = fresh()
    val dir = spark.conf.get("spark.sql.catalog.graft.root") + s"/$t"
    try {
      spark.sql(s"CREATE TABLE graft.$t (id BIGINT, v BIGINT, " +
        "state STRING)")
      spark.sql(s"INSERT INTO graft.$t VALUES (1, 10, 'live'), " +
        "(2, 20, 'live'), (3, 30, 'live'), (4, 40, 'live')")
      val vBefore = ManifestV2Sink.versions(dir).max
      // full sync against a source holding {2 (changed), 3 (same),
      // 5 (new)}: 1 retires (conditional UPDATE), 4 deletes
      // (unconditional BY SOURCE after the conditional one), 2
      // updates, 5 inserts — ONE atomic statement
      spark.sql(s"""MERGE INTO graft.$t tgt
        |USING (SELECT * FROM VALUES (2, 222), (3, 30), (5, 555)
        |  AS u(id, nv)) src
        |ON tgt.id = src.id
        |WHEN MATCHED THEN UPDATE SET v = src.nv
        |WHEN NOT MATCHED THEN INSERT (id, v, state)
        |  VALUES (src.id, src.nv, 'live')
        |WHEN NOT MATCHED BY SOURCE AND tgt.id = 1
        |  THEN UPDATE SET state = 'retired'
        |WHEN NOT MATCHED BY SOURCE THEN DELETE""".stripMargin)
      val got = spark.sql(s"SELECT id, v, state FROM graft.$t " +
        "ORDER BY id").collect().map(r =>
        (r.getLong(0), r.getLong(1), r.getString(2))).toSeq
      assert(got == Seq((1L, 10L, "retired"), (2L, 222L, "live"),
        (3L, 30L, "live"), (5L, 555L, "live")), s"sync wrong: $got")
      // one commit, pre-merge travelable
      assert(ManifestV2Sink.versions(dir).max == vBefore + 1)
      assert(spark.sql(
        s"SELECT count(*) FROM graft.$t VERSION AS OF $vBefore")
        .head.getLong(0) == 4L)
      // BY-SOURCE-only merge (no matched/insert actions): pure purge
      spark.sql(s"""MERGE INTO graft.$t tgt
        |USING (SELECT * FROM VALUES (2), (3), (5) AS u(id)) src
        |ON tgt.id = src.id
        |WHEN NOT MATCHED BY SOURCE THEN DELETE""".stripMargin)
      assert(spark.sql(s"SELECT count(*) FROM graft.$t")
        .head.getLong(0) == 3L)
      // ANSI: multiple source matches per target row are LEGAL when
      // only BY SOURCE actions exist (matched rows pass through once,
      // untouched) — the semi∪anti decomposition must neither raise
      // the cardinality error nor duplicate the matched rows
      spark.sql(s"""MERGE INTO graft.$t tgt
        |USING (SELECT * FROM VALUES (2), (2), (2), (3) AS u(id)) src
        |ON tgt.id = src.id
        |WHEN NOT MATCHED BY SOURCE THEN UPDATE SET state = 'stale'
        |""".stripMargin)
      val after = spark.sql(s"SELECT id, state FROM graft.$t " +
        "ORDER BY id").collect().map(r =>
        (r.getLong(0), r.getString(1))).toSeq
      assert(after == Seq((2L, "live"), (3L, "live"), (5L, "stale")),
        s"by-source-only multi-match wrong: $after")
    } finally spark.sql(s"DROP TABLE IF EXISTS graft.$t")
  }

  test("the cardinality guard is skipped for provably key-unique " +
    "sources and stays sound for multi-key grouping") {
    import org.apache.spark.sql.catalyst.dsl.expressions._
    import org.apache.spark.sql.catalyst.dsl.plans._
    import org.apache.spark.sql.catalyst.expressions.EqualTo
    import org.apache.spark.sql.catalyst.plans.logical.Deduplicate
    val k = Symbol("k").long
    val v = Symbol("v").long
    val tk = Symbol("tk").long
    val rel = org.apache.spark.sql.catalyst.plans.logical
      .LocalRelation(k, v)
    val trel = org.apache.spark.sql.catalyst.plans.logical
      .LocalRelation(tk)
    def unique(src: org.apache.spark.sql.catalyst.plans.logical
        .LogicalPlan): Boolean =
      ManifestMergeRule.sourceUniqueOnKey(EqualTo(tk, k), src, trel)
    // grouped ONLY on the key → unique → guard skipped
    assert(unique(rel.groupBy(k)(k, org.apache.spark.sql.catalyst
      .expressions.aggregate.Max(v).toAggregateExpression().as("mv"))))
    // dropDuplicates on exactly the key → unique
    assert(unique(Deduplicate(Seq(k), rel)))
    // raw relation, whole-row distinct, and (k, other) grouping are
    // NOT provably key-unique → guard stays
    assert(!unique(rel))
    assert(!unique(org.apache.spark.sql.catalyst.plans.logical
      .Distinct(rel)))
    assert(!unique(rel.groupBy(k, v)(k, v)))
    assert(!unique(Deduplicate(Seq(k, v), rel)))
    // filters and key-preserving projects walk through
    assert(unique(Deduplicate(Seq(k), rel).where(v > 1L).select(k, v)))
    // a condition touching only SOURCE columns (ON s.k = s.v) proves
    // nothing about matches-per-target-row → guard stays even when
    // the source is deduped on k
    assert(!ManifestMergeRule.sourceUniqueOnKey(EqualTo(k, v),
      Deduplicate(Seq(k), rel), trel))
    // the end-to-end duplicate-source error still fires (cross-check
    // with the cardinality test above: raw VALUES sources keep the
    // guard), and a GROUPED duplicate source merges cleanly
    val t = fresh()
    try {
      spark.sql(s"CREATE TABLE graft.$t (id BIGINT, v BIGINT)")
      spark.sql(s"INSERT INTO graft.$t VALUES (1, 10), (2, 20)")
      spark.sql(s"""MERGE INTO graft.$t tgt
        |USING (SELECT id, MAX(nv) AS nv FROM VALUES (1, 111), (1, 222)
        |  AS u(id, nv) GROUP BY id) src
        |ON tgt.id = src.id
        |WHEN MATCHED AND src.nv > 200 THEN UPDATE SET v = src.nv
        |""".stripMargin)
      assert(spark.sql(s"SELECT v FROM graft.$t WHERE id = 1")
        .head.getLong(0) == 222L)
    } finally spark.sql(s"DROP TABLE IF EXISTS graft.$t")
  }

  test("SQL UPDATE is one COW commit; pre-update stays travelable; " +
    "subqueries refused") {
    val t = fresh()
    val dir = spark.conf.get("spark.sql.catalog.graft.root") + s"/$t"
    try {
      spark.sql(s"CREATE TABLE graft.$t (id BIGINT, v BIGINT)")
      spark.sql(s"INSERT INTO graft.$t VALUES (1, 10), (2, 20), (3, 30)")
      val vBefore = ManifestV2Sink.versions(dir).max
      spark.sql(s"UPDATE graft.$t SET v = v + 1 WHERE id >= 2")
      val got = spark.sql(s"SELECT id, v FROM graft.$t ORDER BY id")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
      assert(got == Seq((1L, 10L), (2L, 21L), (3L, 31L)), s"got $got")
      assert(ManifestV2Sink.versions(dir).max == vBefore + 1,
        "UPDATE must publish exactly one commit")
      assert(spark.sql(
        s"SELECT SUM(v) FROM graft.$t VERSION AS OF $vBefore")
        .head.getLong(0) == 60L)
      // WHERE-less updates every row
      spark.sql(s"UPDATE graft.$t SET v = 0")
      assert(spark.sql(s"SELECT SUM(v) FROM graft.$t").head.getLong(0) == 0L)
      // a MOR tombstone reconciles into the rewrite (deleted rows
      // must not resurrect through the COW)
      import spark.implicits._
      ManifestV2Sink.delete(spark, dir, "id", Seq(2L).toDF("id"))
      spark.sql(s"UPDATE graft.$t SET v = 7")
      val ids = spark.sql(s"SELECT id FROM graft.$t ORDER BY id")
        .as[Long].collect().toSeq
      assert(ids == Seq(1L, 3L), s"deleted row resurrected: $ids")
      // subqueries are not row-local — refused at analysis
      val e = intercept[Exception] {
        spark.sql(s"UPDATE graft.$t SET v = " +
          s"(SELECT MAX(id) FROM graft.$t)")
      }
      assert(e.getMessage.contains("row-local"), e.getMessage)
    } finally spark.sql(s"DROP TABLE IF EXISTS graft.$t")
  }
}
