package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** Partitioned layout of the manifest sink: `.option("partitionBy",
  * cols)` fans each task out to one file per partition-value tuple,
  * entries record the value, and partition pruning skips whole
  * partitions BEFORE (and without) per-file stats — including for
  * string columns, which never carry min/max stats at all.
  */
class ManifestPartitionSpec extends SparkSuite {

  private def tmpTable(): String =
    Files.createTempDirectory("graft-manifest-part").toString

  test("a one-partition predicate reads only that partition's files " +
    "even when file stats are absent (string partition column)") {
    import spark.implicits._
    val dir = tmpTable()
    val rows = Seq(
      (1L, "en", "alpha"), (2L, "en", "beta"), (3L, "de", "gamma"),
      (4L, "fr", "delta"), (5L, "de", "epsilon"), (6L, "en", "zeta"))
    rows.toDF("id", "lang", "s")
      .repartition(2, col("id"))
      .write.format("graft-manifest").option("partitionBy", "lang")
      .mode("append").save(dir)
    // every committed file holds exactly one lang and records it
    val entries = ManifestV2Sink.readManifest(dir).get._2
    assert(entries.nonEmpty)
    entries.foreach { e =>
      val p = ManifestV2Sink.entryPartition(e)
      assert(p.contains("lang"), s"entry lacks partition value: $e")
    }
    // string column ⇒ no min/max stats recorded for it anywhere
    assert(entries.forall(e =>
      !ManifestV2Sink.entryStats(e).contains("lang")))
    // partition pruning alone narrows the read set to 'de' files only
    val deFiles = ManifestV2Sink.prunedPartitionFiles(dir, "lang", "de")
    val allFiles = ManifestV2Sink.committedFileCount(dir)
    assert(deFiles.nonEmpty && deFiles.size < allFiles,
      s"expected a strict subset, got ${deFiles.size}/$allFiles")
    deFiles.foreach { f =>
      val e = entries.find(x => ManifestV2Sink.entryFile(x) == f).get
      assert(ManifestV2Sink.entryPartition(e)("lang") == "de")
    }
    // the partition read returns exactly the partition's rows
    val got = ManifestV2Sink.readPartition(spark, dir, "lang", "de")
      .select("id").as[Long].collect().sorted.toSeq
    assert(got == Seq(3L, 5L))
  }

  test("long partition values prune range and point reads; escaped " +
    "string values and nulls round-trip") {
    import spark.implicits._
    val dir = tmpTable()
    Seq((1L, 1995L, "a:b|c%d\te"), (2L, 1996L, null),
      (3L, 1997L, "plain"), (4L, 1996L, "x"))
      .toDF("id", "yr", "s")
      .coalesce(1)
      .write.format("graft-manifest").option("partitionBy", "yr,s")
      .mode("append").save(dir)
    // numeric partition values participate in RANGE pruning
    val in96 = ManifestV2Sink.prunedDataFiles(dir, "yr", 1996L, 1996L)
    assert(in96.size == 2, s"expected the two yr=1996 files, got $in96")
    // ...and in point-lookup pruning
    assert(ManifestV2Sink.prunedDataFilesEq(dir, "yr", 1995L).size == 1)
    // reserved characters and null in a string partition value
    // round-trip through the blob without corrupting the entry
    val withSpecial =
      ManifestV2Sink.prunedPartitionFiles(dir, "s", "a:b|c%d\te")
    assert(withSpecial.size == 1)
    val back = ManifestV2Sink.readPartition(spark, dir, "s", "a:b|c%d\te")
      .select("id").as[Long].collect().toSeq
    assert(back == Seq(1L))
    // the full table still reads complete (nulls included)
    assert(ManifestV2Sink.readCommitted(spark, dir).count() == 4)
  }

  test("unpartitioned legacy files are never skipped by a partition " +
    "predicate; tombstones still reconcile partition reads") {
    import spark.implicits._
    val dir = tmpTable()
    // legacy unpartitioned commit
    Seq((1L, "en"), (2L, "de")).toDF("id", "lang").coalesce(1)
      .write.format("graft-manifest").mode("append").save(dir)
    // partitioned commit
    Seq((3L, "en"), (4L, "de")).toDF("id", "lang").coalesce(1)
      .write.format("graft-manifest").option("partitionBy", "lang")
      .mode("append").save(dir)
    val enFiles = ManifestV2Sink.prunedPartitionFiles(dir, "lang", "en")
    // 1 legacy (unprunable) + 1 en partition file; the de file skipped
    assert(enFiles.size == 2,
      s"legacy files must be conservatively read, got $enFiles")
    ManifestV2Sink.delete(spark, dir, "id", Seq(3L).toDF("id"))
    val got = ManifestV2Sink.readPartition(spark, dir, "lang", "en")
      .where(col("lang") === "en") // residual atop the file skip
      .select("id").as[Long].collect().sorted.toSeq
    assert(got == Seq(1L), "tombstone must reconcile the partition read")
  }

  test("partitionBy validates the spec at plan time") {
    import spark.implicits._
    val dir = tmpTable()
    val df = Seq((1L, 0.5)).toDF("id", "d")
    intercept[Exception] {
      df.write.format("graft-manifest").option("partitionBy", "nope")
        .mode("append").save(dir)
    }
    intercept[Exception] {
      // double partition values are rejected (partition identity)
      df.write.format("graft-manifest").option("partitionBy", "d")
        .mode("append").save(dir)
    }
  }

  test("SQL PARTITIONED BY: the DDL sidecar governs every write, " +
    "date partitions render as days, conflicting options are refused") {
    import spark.implicits._
    val t = s"pt_${java.util.UUID.randomUUID().toString.take(8)}"
    val dir = spark.conf.get("spark.sql.catalog.graft.root") + s"/$t"
    try {
      spark.sql(s"CREATE TABLE graft.$t (id BIGINT, d DATE) " +
        "PARTITIONED BY (d)")
      // plain INSERTs fan out per partition value without any option
      spark.sql(s"INSERT INTO graft.$t VALUES " +
        "(1, DATE'2024-01-01'), (2, DATE'2024-01-01'), " +
        "(3, DATE'2024-01-02')")
      val entries = ManifestV2Sink.committedDataFiles(dir)
      assert(entries.size >= 2, s"no fan-out: $entries")
      // each file's entry records the DATE value in epoch DAYS — the
      // unit the numeric partition pruning consults
      val days = java.time.LocalDate.parse("2024-01-01").toEpochDay
      assert(ManifestV2Sink
        .prunedPartitionFiles(dir, "d", days.toString).nonEmpty)
      // a date-equality SQL read plans only that partition's files
      val q = spark.sql(
        s"SELECT id FROM graft.$t WHERE d = DATE'2024-01-02'")
      assert(q.rdd.getNumPartitions == 1,
        "date partition not pruned at planning")
      assert(q.as[Long].collect().toSeq == Seq(3L))
      // table reports its partitioning
      assert(spark.sql(s"DESCRIBE TABLE EXTENDED graft.$t").collect()
        .exists(_.toString.contains("d")), "partitioning not reported")
      // a conflicting per-write option is refused, never a silent fork
      val e = intercept[Exception] {
        Seq((9L, java.sql.Date.valueOf("2024-01-03"))).toDF("id", "d")
          .write.format("graft-manifest").option("partitionBy", "id")
          .mode("append").save(dir)
      }
      def msgs(x: Throwable): Seq[String] =
        if (x == null) Seq.empty
        else Option(x.getMessage).toSeq ++ msgs(x.getCause)
      assert(msgs(e).exists(_.contains("conflicts")), e.toString)
    } finally spark.sql(s"DROP TABLE IF EXISTS graft.$t")
  }

  test("PARTITIONED BY rejects non-identity transforms and double " +
    "columns at the statement") {
    val t = s"pt_${java.util.UUID.randomUUID().toString.take(8)}"
    try {
      val e1 = intercept[Exception] {
        spark.sql(s"CREATE TABLE graft.$t (id BIGINT, ts TIMESTAMP) " +
          "PARTITIONED BY (days(ts))")
      }
      def msgs(x: Throwable): Seq[String] =
        if (x == null) Seq.empty
        else Option(x.getMessage).toSeq ++ msgs(x.getCause)
      assert(msgs(e1).exists(_.contains("identity")), e1.toString)
      val e2 = intercept[Exception] {
        spark.sql(s"CREATE TABLE graft.$t (id BIGINT, w DOUBLE) " +
          "PARTITIONED BY (w)")
      }
      assert(msgs(e2).exists(_.contains("footgun")), e2.toString)
    } finally spark.sql(s"DROP TABLE IF EXISTS graft.$t")
  }
}
