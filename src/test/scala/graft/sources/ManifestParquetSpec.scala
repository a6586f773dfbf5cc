package graft.sources

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSuite

/** The PARQUET payload contract of the manifest sink: typed columns
  * (DATE/TIMESTAMP/DECIMAL) round-trip through both read surfaces,
  * legacy JSONL files stay readable in mixed tables, pushed SQL
  * filters prune whole files at planning via manifest metadata and
  * columns prune into the parquet decode, tombstones reconcile on the
  * parquet reader, and schema evolution null-fills across formats.
  */
class ManifestParquetSpec extends SparkSuite {

  private def tmpTable(): String =
    Files.createTempDirectory("graft-parquet").toString

  private def fresh(): String =
    s"t_${java.util.UUID.randomUUID().toString.take(8)}"

  test("typed columns round-trip: DATE, TIMESTAMP, DECIMAL through " +
    "both read surfaces") {
    val t = fresh()
    val dir = spark.conf.get("spark.sql.catalog.graft.root") + s"/$t"
    try {
      spark.sql(s"CREATE TABLE graft.$t (id BIGINT, d DATE, " +
        "ts TIMESTAMP, price DECIMAL(12,2), big DECIMAL(25,4), s STRING)")
      spark.sql(s"INSERT INTO graft.$t VALUES " +
        "(1, DATE'2024-03-01', TIMESTAMP'2024-03-01 12:34:56.789', " +
        "  1234.56, 123456789012345678901.2345, 'a')," +
        "(2, DATE'1969-07-20', TIMESTAMP'1969-07-20 20:17:00', " +
        "  -0.01, -9.0001, 'b')," +
        "(3, NULL, NULL, NULL, NULL, NULL)")
      // catalog scan (the custom per-file parquet reader)
      val viaSql = spark.sql(
        s"SELECT id, CAST(d AS STRING) AS d, CAST(ts AS STRING) AS ts, " +
          s"CAST(price AS STRING) AS p, CAST(big AS STRING) AS b, s " +
          s"FROM graft.$t ORDER BY id").collect()
        .map(r => (0 until 6).map(i =>
          if (r.isNullAt(i)) "null" else r.get(i).toString).mkString("|"))
      assert(viaSql.toSeq == Seq(
        "1|2024-03-01|2024-03-01 12:34:56.789|1234.56|" +
          "123456789012345678901.2345|a",
        "2|1969-07-20|1969-07-20 20:17:00|-0.01|-9.0001|b",
        "3|null|null|null|null|null"))
      // API read (Spark's own vectorized parquet source)
      val viaApi = ManifestV2Sink.readCommitted(spark, dir)
        .orderBy("id")
        .selectExpr("id", "CAST(d AS STRING)", "CAST(ts AS STRING)",
          "CAST(price AS STRING)", "CAST(big AS STRING)", "s")
        .collect().map(r => (0 until 6).map(i =>
          if (r.isNullAt(i)) "null" else r.get(i).toString).mkString("|"))
      assert(viaApi.toSeq == viaSql.toSeq)
      // typed stats recorded: date (days), timestamp (micros) and
      // decimal (exact) bounds fold over the entries that carry them
      // (the all-NULL row's file legitimately records none)
      val ents = ManifestV2Sink.readManifest(dir).get._2
        .filterNot(ManifestV2Sink.isDeleteEntry)
      val pb = ents.flatMap(e => ManifestV2Sink.entryStats(e).get("price"))
      assert(pb.nonEmpty &&
        pb.map(_._1).min == BigDecimal("-0.01") &&
        pb.map(_._2).max == BigDecimal("1234.56"), s"price stats: $pb")
      assert(ents.exists(e =>
        ManifestV2Sink.entryStats(e).contains("d")), "no date stats")
      assert(ents.exists(e =>
        ManifestV2Sink.entryStats(e).contains("ts")), "no ts stats")
    } finally spark.sql(s"DROP TABLE IF EXISTS graft.$t")
  }

  test("mixed-format table: legacy JSONL appends read beside parquet") {
    import spark.implicits._
    val dir = tmpTable()
    Seq((1L, "pq"), (2L, "pq")).toDF("id", "s")
      .coalesce(1)
      .write.format("graft-manifest").mode("append").save(dir)
    // the external-committer seam still writes JSONL — the manifest
    // protocol is format-agnostic and readers dispatch on extension
    ManifestV2Sink.appendExternal(dir,
      Seq("""{"id":3,"s":"jl"}""", """{"id":4,"s":"jl"}"""), "mixed")
    val entries = ManifestV2Sink.readManifest(dir).get._2
    assert(entries.exists(_.contains(".parquet")) &&
      entries.exists(_.contains(".jsonl")), s"not mixed: $entries")
    // API surface
    assert(ManifestV2Sink.readCommitted(spark, dir).orderBy("id")
      .as[(Long, String)].collect().toSeq ==
      Seq((1L, "pq"), (2L, "pq"), (3L, "jl"), (4L, "jl")))
    // DSv2 scan surface (both per-file readers in one plan)
    assert(spark.read.format("graft-manifest").load(dir).orderBy("id")
      .as[(Long, String)].collect().toSeq ==
      Seq((1L, "pq"), (2L, "pq"), (3L, "jl"), (4L, "jl")))
  }

  test("pushed filters prune whole files at planning and show in the " +
    "plan; pruned columns reach the parquet decode") {
    val t = fresh()
    try {
      spark.sql(s"CREATE TABLE graft.$t (k BIGINT, v STRING, w DOUBLE)")
      // two single-file commits with disjoint key ranges
      spark.sql(s"INSERT INTO graft.$t " +
        "SELECT id AS k, CAST(id AS STRING) AS v, id * 0.5 AS w " +
        "FROM range(0, 100)")
      spark.sql(s"INSERT INTO graft.$t " +
        "SELECT id AS k, CAST(id AS STRING) AS v, id * 0.5 AS w " +
        "FROM range(1000, 1100)")
      val q = spark.sql(s"SELECT v FROM graft.$t WHERE k < 100")
      // manifest-level skip: exactly the first commit's files plan
      // (each INSERT fans out one file per shuffle partition)
      val total = ManifestV2Sink.committedFileCount(
        spark.conf.get("spark.sql.catalog.graft.root") + s"/$t")
      val expected = ManifestV2Sink.readManifest(
        spark.conf.get("spark.sql.catalog.graft.root") + s"/$t").get._2
        .count(e => ManifestV2Sink.entryStats(e).get("k")
          .exists(_._1 < BigDecimal(100)))
      assert(expected < total, "fixture degenerate: nothing to prune")
      assert(q.rdd.getNumPartitions == expected,
        s"stats-disjoint files not pruned at planning " +
          s"(${q.rdd.getNumPartitions} of $total planned, " +
          s"want $expected)")
      assert(q.count() == 100)
      val plan = q.queryExecution.executedPlan.toString()
      assert(plan.contains("PushedFilters: [") &&
        plan.contains("LessThan(k,100)"), s"no pushed filter in:\n$plan")
      assert(plan.contains("ReadSchema: struct<v:string") ||
        plan.contains("ReadSchema: struct<k:bigint,v:string"),
        s"w not pruned from the read schema in:\n$plan")
      assert(!plan.contains("w:double"),
        s"unprojected column w still read in:\n$plan")
    } finally spark.sql(s"DROP TABLE IF EXISTS graft.$t")
  }

  test("tombstones reconcile on the parquet scan; typed delete keys " +
    "are rejected") {
    import spark.implicits._
    val t = fresh()
    val dir = spark.conf.get("spark.sql.catalog.graft.root") + s"/$t"
    try {
      spark.sql(s"CREATE TABLE graft.$t (id BIGINT, d DATE)")
      spark.sql(s"INSERT INTO graft.$t " +
        "SELECT id, DATE'2024-01-01' FROM range(0, 10)")
      ManifestV2Sink.delete(spark, dir, "id", Seq(3L, 7L).toDF("id"))
      assert(spark.sql(s"SELECT id FROM graft.$t ORDER BY id")
        .as[Long].collect().toSeq == Seq(0L, 1L, 2L, 4L, 5L, 6L, 8L, 9L))
      // tombstone key column pruned OUT of the projection still
      // reconciles (the reader reads it internally)
      assert(spark.sql(s"SELECT count(d) AS n FROM graft.$t").as[Long]
        .head() == 8L)
      val e = intercept[IllegalArgumentException] {
        ManifestV2Sink.delete(spark, dir, "d",
          Seq(java.sql.Date.valueOf("2024-01-01")).toDF("d"))
      }
      assert(e.getMessage.contains("predicate DELETE"), e.getMessage)
    } finally spark.sql(s"DROP TABLE IF EXISTS graft.$t")
  }

  test("schema evolution null-fills parquet files written before the " +
    "column; filters on the new column stay sound over old files") {
    val t = fresh()
    try {
      spark.sql(s"CREATE TABLE graft.$t (id BIGINT)")
      spark.sql(s"INSERT INTO graft.$t VALUES (1), (2)")
      spark.sql(s"ALTER TABLE graft.$t ADD COLUMN p DECIMAL(10,2)")
      spark.sql(s"INSERT INTO graft.$t VALUES (3, 9.99)")
      val got = spark.sql(
        s"SELECT id, CAST(p AS STRING) AS p FROM graft.$t ORDER BY id")
        .collect().map(r => s"${r.getLong(0)}|${
          if (r.isNullAt(1)) "null" else r.getString(1)}")
      assert(got.toSeq == Seq("1|null", "2|null", "3|9.99"))
      // predicate on the evolved column: old files lack it entirely —
      // row-group stats treat it as all-null (sound), residual filters
      assert(spark.sql(
        s"SELECT id FROM graft.$t WHERE p > 5").collect()
        .map(_.getLong(0)).toSeq == Seq(3L))
    } finally spark.sql(s"DROP TABLE IF EXISTS graft.$t")
  }

  test("ManifestSkipping three-valued decisions are conservative") {
    import org.apache.spark.sql.sources._
    val withStats = "data/f1.parquet\tS|k:L:10:20|p:B:1.50:2.50"
    val statless = "data/f0.parquet"
    def keep(e: String, f: Filter): Boolean =
      ManifestSkipping.keepEntry(e, Seq(f))
    // provable misses skip
    assert(!keep(withStats, EqualTo("k", 5L)))
    assert(!keep(withStats, GreaterThan("k", 20L)))
    assert(!keep(withStats, LessThan("k", 10L)))
    assert(!keep(withStats,
      EqualTo("p", new java.math.BigDecimal("3.00"))))
    // possible hits read
    assert(keep(withStats, EqualTo("k", 15L)))
    assert(keep(withStats, GreaterThanOrEqual("k", 20L)))
    assert(keep(withStats,
      In("k", Array(5L, 15L).map(_.asInstanceOf[Any]))))
    // Or needs both sides provably disjoint to skip
    assert(keep(withStats, Or(EqualTo("k", 5L), EqualTo("k", 15L))))
    assert(!keep(withStats, Or(EqualTo("k", 5L), EqualTo("k", 25L))))
    // unknown constructs and statless entries always read
    assert(keep(withStats, IsNull("k")))
    assert(keep(statless, EqualTo("k", 5L)))
    assert(keep(withStats, EqualTo("unknown_col", 5L)))
  }

  test("Not over a partially-convertible And never weakens-then-negates " +
    "(polarity guard)") {
    import org.apache.spark.sql.sources._
    import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
    import org.apache.spark.unsafe.types.UTF8String
    val schema = StructType(Seq(StructField("k", LongType),
      StructField("v", StringType)))
    // StringStartsWith is parquet-unconvertible here; under NOT an And
    // must convert both sides or drop out — keeping one conjunct would
    // negate a WEAKER predicate into a STRONGER one and skip row
    // groups that contain matching rows
    val partialAnd = And(EqualTo("k", 5L), StringStartsWith("v", "a"))
    assert(ParquetPayload.toParquetFilter(Seq(Not(partialAnd)), schema)
      .isEmpty, "negated partial And must drop out entirely")
    // positive polarity still keeps the convertible conjunct (sound)
    assert(ParquetPayload.toParquetFilter(Seq(partialAnd), schema)
      .isDefined)
    // fully-convertible Not(And) still converts
    assert(ParquetPayload.toParquetFilter(
      Seq(Not(And(EqualTo("k", 5L), EqualTo("k", 6L)))), schema).isDefined)
    // the guard propagates through nesting: Or under Not over the
    // partial And also drops
    assert(ParquetPayload.toParquetFilter(
      Seq(Not(Or(partialAnd, EqualTo("k", 7L)))), schema).isEmpty)
    // end-to-end at the row-group seam: a file whose single row group
    // has k uniformly 5 holds rows matching NOT(k=5 AND v LIKE 'a%')
    // (e.g. (5,'bob')) — the old weaken-then-negate skipped it
    val dir = Files.createTempDirectory("graft-polarity")
    val f = dir.resolve("f.parquet")
    val w = ParquetPayload.writer(f, schema)
    w.write(new GenericInternalRow(
      Array[Any](5L, UTF8String.fromString("alice"))))
    w.write(new GenericInternalRow(
      Array[Any](5L, UTF8String.fromString("bob"))))
    w.close()
    val r = ParquetPayload.reader(f.toString, schema,
      ParquetPayload.toParquetFilter(Seq(Not(partialAnd)), schema))
    var n = 0
    while (r.read() != null) n += 1
    r.close()
    assert(n == 2, "row group wrongly skipped under negated partial And")
  }

  test("time travel across the format boundary: pre-parquet JSONL " +
    "snapshots read unchanged") {
    import spark.implicits._
    val dir = tmpTable()
    // hand-publish a v1 whose data file is legacy JSONL (what a
    // pre-parquet table's retained snapshots look like)
    val dataDir = Paths.get(dir, "data")
    Files.createDirectories(dataDir)
    Files.write(dataDir.resolve("part-legacy.jsonl"),
      "{\"id\":1,\"s\":\"old\"}\n{\"id\":2,\"s\":\"old\"}\n"
        .getBytes("UTF-8"))
    val schema = StructType(Seq(StructField("id", LongType),
      StructField("s", StringType)))
    ManifestV2Sink.withHeadLock(dir) {
      ManifestV2Sink.publish(dir, schema,
        Seq("data/part-legacy.jsonl"), "legacy")
    }
    // a parquet-era append lands on top
    Seq((3L, "new")).toDF("id", "s").coalesce(1)
      .write.format("graft-manifest").mode("append").save(dir)
    assert(ManifestV2Sink.readCommitted(spark, dir).orderBy("id")
      .as[(Long, String)].collect().toSeq ==
      Seq((1L, "old"), (2L, "old"), (3L, "new")))
    // v1 time-travels to the pure-JSONL state
    assert(ManifestV2Sink.readVersion(spark, dir, 1).orderBy("id")
      .as[(Long, String)].collect().toSeq ==
      Seq((1L, "old"), (2L, "old")))
  }
}
