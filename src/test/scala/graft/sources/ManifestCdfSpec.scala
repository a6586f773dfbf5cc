package graft.sources

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** Change feed (`graft_table_changes` / ManifestCdf.readChanges):
  * per-commit insert/delete rows derived from the commit log's kind
  * field + file deltas — rewrites emit nothing, DV growth emits
  * exactly the newly-dead positions, tombstones emit the masked
  * rows, retention holes fail loudly. Version numbers are read back
  * from the manifest (CREATE TABLE itself mints a version).
  */
class ManifestCdfSpec extends SparkSuite {

  private def fresh(): String =
    s"t_${java.util.UUID.randomUUID().toString.take(8)}"

  private def root: String = spark.conf.get("spark.sql.catalog.graft.root")

  private def head(dir: String): Int = ManifestV2Sink.versions(dir).max

  private def changes(t: String, from: Int, to: Int)
      : Seq[(Long, String, Long)] =
    spark.sql(s"SELECT * FROM graft_table_changes('$t', $from, $to)")
      .select(col("k"), col("_change_type"), col("_commit_version"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      .sortBy(x => (x._3, x._2, x._1)).toSeq

  test("append → inserts; compact → nothing; overwrite → " +
    "delete+insert pairs; SQL TVF surface") {
    val t = fresh()
    val dir = s"$root/$t"
    try {
      spark.sql(s"CREATE TABLE graft.$t (k BIGINT, v STRING)")
      val v0 = head(dir)
      spark.sql(s"INSERT INTO graft.$t SELECT /*+ COALESCE(1) */ id, " +
        "CAST(id AS STRING) FROM range(0, 5)")
      val v1 = head(dir)
      spark.sql(s"INSERT INTO graft.$t SELECT /*+ COALESCE(1) */ id, " +
        "CAST(id AS STRING) FROM range(5, 8)")
      val v2 = head(dir)
      assert(changes(t, v0, v2) ==
        (0L until 5L).map((_, "insert", v1.toLong)) ++
          (5L until 8L).map((_, "insert", v2.toLong)))
      // compaction (kind=rewrite) emits NO change rows
      ManifestV2Sink.compact(spark, dir, 1)
      val v3 = head(dir)
      assert(changes(t, v2, v3).isEmpty,
        "a rewrite commit must not appear in the change feed")
      // overwrite: every old row deleted, new rows inserted
      spark.sql(s"INSERT OVERWRITE graft.$t SELECT /*+ COALESCE(1) */ " +
        "id, CAST(id AS STRING) FROM range(100, 102)")
      val v4 = head(dir)
      assert(changes(t, v3, v4) ==
        (0L until 8L).map((_, "delete", v4.toLong)) ++
          Seq((100L, "insert", v4.toLong), (101L, "insert", v4.toLong)))
      // the full range composes all of it
      assert(changes(t, v0, v4).count(_._2 == "insert") == 10)
    } finally spark.sql(s"DROP TABLE IF EXISTS graft.$t")
  }

  test("DV growth emits exactly the newly-dead rows; a second DV " +
    "delete emits only its delta") {
    val t = fresh()
    val dir = s"$root/$t"
    try {
      spark.sql(s"CREATE TABLE graft.$t (k BIGINT, v STRING)")
      spark.sql(s"INSERT INTO graft.$t SELECT /*+ COALESCE(1) */ id, " +
        "CAST(id AS STRING) FROM range(0, 1000)")
      val v1 = head(dir)
      spark.sql(s"DELETE FROM graft.$t WHERE k >= 10 AND k < 13")
      val v2 = head(dir)
      spark.sql(s"DELETE FROM graft.$t WHERE k >= 12 AND k < 15")
      val v3 = head(dir)
      assert(ManifestV2Sink.dvFileCount(dir) == 1)
      assert(changes(t, v1, v2) ==
        Seq((10L, "delete", v2.toLong), (11L, "delete", v2.toLong),
          (12L, "delete", v2.toLong)))
      // overlap (k=12) already dead at v2 — only 13, 14 are new
      assert(changes(t, v2, v3) ==
        Seq((13L, "delete", v3.toLong), (14L, "delete", v3.toLong)))
    } finally spark.sql(s"DROP TABLE IF EXISTS graft.$t")
  }

  test("tombstone (key) deletes emit the masked rows; predicate " +
    "rewrite deletes emit removed-minus-readded") {
    val t = fresh()
    val dir = s"$root/$t"
    try {
      spark.sql(s"CREATE TABLE graft.$t (k BIGINT, v STRING)")
      spark.sql(s"INSERT INTO graft.$t SELECT /*+ COALESCE(1) */ id, " +
        "CAST(id AS STRING) FROM range(0, 100)")
      val v1 = head(dir)
      import spark.implicits._
      ManifestV2Sink.delete(spark, dir, "k", Seq(7L, 9L).toDF("k"))
      val v2 = head(dir)
      assert(changes(t, v1, v2) ==
        Seq((7L, "delete", v2.toLong), (9L, "delete", v2.toLong)))
      // a tombstoned key deleted AGAIN must not re-emit
      ManifestV2Sink.delete(spark, dir, "k", Seq(9L, 11L).toDF("k"))
      val v3 = head(dir)
      assert(changes(t, v2, v3) == Seq((11L, "delete", v3.toLong)))
      // bulk predicate delete (rewrite tier): the rewritten file's
      // rows emit as delete+insert; the NET change must still be
      // exactly the predicate's rows. Compact first to clear
      // tombstones (kind=rewrite → silent).
      ManifestV2Sink.compact(spark, dir, 1)
      val v4 = head(dir)
      spark.sql(s"DELETE FROM graft.$t WHERE k < 50")
      val v5 = head(dir)
      val d5 = changes(t, v4, v5)
      val net = d5.groupBy(_._1).map { case (k, rs) =>
        k -> (rs.count(_._2 == "delete") - rs.count(_._2 == "insert"))
      }
      val expectDead = (0L until 50L).filterNot(Seq(7L, 9L, 11L).contains)
      assert(net.filter(_._2 > 0).keys.toSeq.sorted == expectDead,
        s"net deletes wrong: $net")
      assert(net.values.forall(d => d == 0 || d == 1),
        "no row may net-delete twice or net-insert")
    } finally spark.sql(s"DROP TABLE IF EXISTS graft.$t")
  }

  test("streaming CDF: per-version insert rows with metadata " +
    "columns; rewrites silent; a delete commit fails loudly") {
    import org.apache.spark.sql.streaming.Trigger
    import scala.collection.mutable
    val dir = java.nio.file.Files.createTempDirectory("graft-cdf").toString
    import spark.implicits._
    def append(rows: Seq[(Long, String)]): Unit =
      rows.toDF("k", "v").coalesce(1)
        .write.format("graft-manifest").mode("append").save(dir)
    append(Seq((1L, "a"), (2L, "b"))) // v1
    append(Seq((3L, "c")))            // v2
    ManifestV2Sink.compact(spark, dir, 1) // v3: rewrite, silent
    append(Seq((4L, "d")))            // v4
    val seen = mutable.ArrayBuffer.empty[(Long, String, Long)]
    val q = spark.readStream.format("graft-manifest")
      .option("readChangeFeed", "true").load(dir)
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        val rows = batch
          .select(col("k"), col("_change_type"), col("_commit_version"))
          .collect().map(r =>
            (r.getLong(0), r.getString(1), r.getLong(2)))
        seen.synchronized { seen ++= rows }
        ()
      }
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    assert(seen.synchronized(seen.toVector).sortBy(_._1) == Vector(
      (1L, "insert", 1L), (2L, "insert", 1L), (3L, "insert", 2L),
      (4L, "insert", 4L)),
      s"cdf stream rows wrong: ${seen.sortBy(_._1)}")
    // a visibility-removing commit (overwrite) fails the CDF stream
    // loudly instead of emitting a wrong append-only view
    Seq((9L, "z")).toDF("k", "v").coalesce(1)
      .write.format("graft-manifest").mode("overwrite").save(dir)
    append(Seq((10L, "w")))
    val seen2 = mutable.ArrayBuffer.empty[Long]
    val q2 = spark.readStream.format("graft-manifest")
      .option("readChangeFeed", "true").load(dir)
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        seen2.synchronized {
          seen2 ++= batch.select("k").as[Long].collect() }
        ()
      }
      .trigger(Trigger.AvailableNow())
      .start()
    val err = intercept[org.apache.spark.sql.streaming
      .StreamingQueryException] { q2.awaitTermination() }
    assert(err.getMessage.contains("graft_table_changes") ||
      Option(err.getCause).exists(
        _.getMessage.contains("graft_table_changes")),
      s"wrong failure: ${err.getMessage}")
    // batch CDF via the option is rejected toward the TVF
    val eb = intercept[Exception] {
      spark.read.format("graft-manifest")
        .option("readChangeFeed", "true").load(dir).collect()
    }
    assert(eb.getMessage.contains("graft_table_changes"))
  }

  test("retention holes fail loudly; bad ranges rejected") {
    val t = fresh()
    val dir = s"$root/$t"
    try {
      spark.sql(s"CREATE TABLE graft.$t (k BIGINT, v STRING)")
      (0 until 3).foreach { i =>
        spark.sql(s"INSERT INTO graft.$t VALUES ($i, 'x')")
      }
      ManifestV2Sink.expireSnapshots(dir, 1)
      val e = intercept[IllegalArgumentException] {
        ManifestCdf.readChanges(spark, dir, 0, head(dir)).collect()
      }
      assert(e.getMessage.contains("retention expired"),
        s"wrong error: ${e.getMessage}")
      intercept[IllegalArgumentException] {
        ManifestCdf.readChanges(spark, dir, 0, 99)
      }
    } finally spark.sql(s"DROP TABLE IF EXISTS graft.$t")
  }
}
