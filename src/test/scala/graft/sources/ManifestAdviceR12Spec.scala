package graft.sources

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

import graft.SparkSuite

/** Fail-loud seams hardened in round 12 (the round-11 advisory list):
  * branch option honored by the DSv2 scan, snapshot-retention holes
  * failing a checkpointed stream instead of silently replaying,
  * tombstones never dropped for a frozen read schema, DDL-time type
  * validation, and the head-version hint that makes `latestOffset`
  * O(1) per poll instead of O(history × manifest bytes).
  */
class ManifestAdviceR12Spec extends SparkSuite {

  private def tmp(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  private def append(dir: String, rows: Seq[(Long, String)]): Unit = {
    import spark.implicits._
    rows.toDF("id", "s").coalesce(1)
      .write.format("graft-manifest").mode("append").save(dir)
  }

  private def drain(dir: String, ckpt: String, out: String): Unit = {
    val q = spark.readStream.format("graft-manifest").load(dir)
      .writeStream.format("parquet")
      .option("path", out).option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }

  test("DSv2 read with a branch option serves the BRANCH head — " +
    "data and schema — never silently main's") {
    import spark.implicits._
    val dir = tmp("graft-adv-br")
    append(dir, Seq((1L, "a")))
    ManifestV2Sink.createBranch(dir, "dev")
    // branch evolves independently: extra row AND an extra column
    Seq((2L, "b", 20L)).toDF("id", "s", "v")
      .write.format("graft-manifest").option("branch", "dev")
      .mode("append").save(dir)
    val got = spark.read.format("graft-manifest")
      .option("branch", "dev").load(dir)
    assert(got.columns.toSeq == Seq("id", "s", "v"),
      "schema must come from the branch head, not main")
    val rows = got.orderBy("id")
      .collect().map(r => (r.getLong(0),
        if (r.isNullAt(2)) None else Some(r.getLong(2)))).toSeq
    assert(rows == Seq((1L, None), (2L, Some(20L))))
    // main is untouched by the branch read
    assert(spark.read.format("graft-manifest").load(dir).count() == 1)
    // unknown branch fails loudly, listing what exists
    val e = intercept[Exception] {
      spark.read.format("graft-manifest")
        .option("branch", "nope").load(dir).collect()
    }
    assert(e.getMessage.contains("no") || e.getMessage.contains("branch"))
  }

  test("streaming a branch is rejected loudly (streams follow main)") {
    val dir = tmp("graft-adv-brstream")
    append(dir, Seq((1L, "a")))
    ManifestV2Sink.createBranch(dir, "dev")
    val thrown = intercept[Exception] {
      val q = spark.readStream.format("graft-manifest")
        .option("branch", "dev").load(dir)
        .writeStream.format("noop")
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    def causes(t: Throwable): Seq[Throwable] =
      if (t == null) Seq.empty else t +: causes(t.getCause)
    assert(causes(thrown).exists(_.getMessage != null) &&
      causes(thrown).exists(c => Option(c.getMessage)
        .exists(_.contains("follow MAIN"))),
      s"expected the branch-stream rejection, got: $thrown")
  }

  test("a checkpointed stream whose base snapshot was expired FAILS " +
    "instead of silently replaying the whole table") {
    val dir = tmp("graft-adv-expire")
    val ckpt = tmp("graft-adv-expire-ckpt")
    val out = tmp("graft-adv-expire-out")
    append(dir, Seq((1L, "a")))            // v1
    drain(dir, ckpt, out)                  // checkpoint ends at v1
    append(dir, Seq((2L, "b")))            // v2
    val expired = ManifestV2Sink.expireSnapshots(dir, keepLast = 1)
    assert(expired == Seq(1), "v1 must be gone for the test to bite")
    val thrown = intercept[Exception] { drain(dir, ckpt, out) }
    def causes(t: Throwable): Seq[Throwable] =
      if (t == null) Seq.empty else t +: causes(t.getCause)
    assert(causes(thrown).exists(c => Option(c.getMessage)
      .exists(_.contains("expired"))),
      s"expected the expired-snapshot failure, got: $thrown")
    // and nothing was emitted by the failed attempt beyond v1's rows
    val ids = spark.read.parquet(out).select("id")
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(ids == Seq(1L), "the failed batch must not have replayed rows")
  }

  test("latestOffset fails loudly when retention expired the head's " +
    "own snapshot (never resets a stream to offset 0)") {
    val dir = tmp("graft-adv-headgone")
    append(dir, Seq((1L, "a")))
    // simulate hostile retention: delete every snapshot AND the hint,
    // keeping only the head pointer
    ManifestV2Sink.versions(dir).foreach(v =>
      Files.delete(ManifestV2Sink.versionFile(dir, v)))
    Files.deleteIfExists(Paths.get(dir, "_MANIFEST.headv"))
    val thrown = intercept[Exception] {
      val q = spark.readStream.format("graft-manifest").load(dir)
        .writeStream.format("noop")
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    def causes(t: Throwable): Seq[Throwable] =
      if (t == null) Seq.empty else t +: causes(t.getCause)
    assert(causes(thrown).exists(c => Option(c.getMessage)
      .exists(_.contains("retention"))),
      s"expected the no-matching-snapshot failure, got: $thrown")
  }

  test("every main commit maintains the head-version hint; a stale " +
    "or missing hint degrades to the verified scan, never to a wrong " +
    "offset") {
    import spark.implicits._
    val dir = tmp("graft-adv-hint")
    append(dir, Seq((1L, "a")))
    append(dir, Seq((2L, "b")))
    val hint = Paths.get(dir, "_MANIFEST.headv")
    assert(Files.exists(hint), "publish must drop the hint")
    assert(new String(Files.readAllBytes(hint), StandardCharsets.UTF_8)
      .trim.toInt == ManifestV2Sink.versions(dir).max)
    // branch commits must NOT move the main hint
    ManifestV2Sink.createBranch(dir, "dev")
    Seq((9L, "z")).toDF("id", "s")
      .write.format("graft-manifest").option("branch", "dev")
      .mode("append").save(dir)
    assert(new String(Files.readAllBytes(hint), StandardCharsets.UTF_8)
      .trim.toInt == 2, "a branch commit must not repoint main's hint")
    // poison the hint with a WRONG version: the stream must detect the
    // mismatch (hinted bytes != head) and still land on the true head
    Files.write(hint, "1".getBytes(StandardCharsets.UTF_8))
    val out = tmp("graft-adv-hint-out")
    drain(dir, tmp("graft-adv-hint-ckpt"), out)
    val ids = spark.read.parquet(out).select("id")
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(ids == Seq(1L, 2L),
      "a stale hint must fall back to the verified head, not truncate")
  }

  test("a tombstone keyed on a column absent from the planned read " +
    "schema fails the read — deleted rows are never emitted") {
    import spark.implicits._
    val dir = tmp("graft-adv-delcol")
    append(dir, Seq((1L, "a")))
    // evolution adds k, then a delete keyed on k
    Seq((2L, "b", 7L)).toDF("id", "s", "k")
      .write.format("graft-manifest").mode("append").save(dir)
    ManifestV2Sink.delete(spark, dir, "k", Seq(7L).toDF("k"))
    // a reader with the PRE-evolution schema cannot apply the
    // tombstone — it must refuse, not emit id=2
    val frozen = StructType(Seq(StructField("id", LongType),
      StructField("s", StringType)))
    val e = intercept[Exception] {
      spark.read.format("graft-manifest").schema(frozen).load(dir).collect()
    }
    def causes(t: Throwable): Seq[Throwable] =
      if (t == null) Seq.empty else t +: causes(t.getCause)
    assert(causes(e).exists(c => Option(c.getMessage)
      .exists(_.contains("tombstones"))),
      s"expected the missing-delete-key failure, got: $e")
    // the full schema still reads correctly (1 row survives)
    assert(spark.read.format("graft-manifest").load(dir).count() == 1)
  }

  test("DDL rejects unsupported column types AT the statement") {
    val t = s"t_${java.util.UUID.randomUUID().toString.take(8)}"
    try {
      // DATE/TIMESTAMP/DECIMAL are first-class since the parquet
      // payload; genuinely unholdable types (MAP/ARRAY/STRUCT) still
      // fail at the statement
      val e = intercept[Exception] {
        spark.sql(s"CREATE TABLE graft.$t (id BIGINT, m MAP<STRING,INT>)")
      }
      def causes(x: Throwable): Seq[Throwable] =
        if (x == null) Seq.empty else x +: causes(x.getCause)
      assert(causes(e).exists(c => Option(c.getMessage)
        .exists(_.contains("unsupported type"))))
      // the failed CREATE left nothing behind
      intercept[Exception] { spark.sql(s"SELECT * FROM graft.$t") }
      spark.sql(s"CREATE TABLE graft.$t (id BIGINT, d DATE)")
      spark.sql(s"ALTER TABLE graft.$t ADD COLUMN p DECIMAL(10,2)")
      val e2 = intercept[Exception] {
        spark.sql(s"ALTER TABLE graft.$t ADD COLUMN a ARRAY<BIGINT>")
      }
      assert(causes(e2).exists(c => Option(c.getMessage)
        .exists(_.contains("unsupported type"))))
    } finally spark.sql(s"DROP TABLE IF EXISTS graft.$t")
  }
}
