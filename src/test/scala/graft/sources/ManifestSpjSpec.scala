package graft.sources

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** Storage-partitioned joins over DDL-partitioned manifest tables:
  * two tables PARTITIONED BY the same column report key-grouped
  * layouts from their P| sidecar blobs, so an equi-join on the
  * partition key runs with ZERO exchanges; pruning a partition column
  * out, legacy unkeyed files, or joining on a non-partition column
  * all fall back to a normal shuffle — never a wrong layout claim.
  */
class ManifestSpjSpec extends SparkSuite {

  private def fresh(): String =
    s"t_${java.util.UUID.randomUUID().toString.take(8)}"

  private def exchanges(df: org.apache.spark.sql.DataFrame): Int = {
    df.collect()
    "(?i)\\bExchange\\b".r
      .findAllIn(df.queryExecution.executedPlan.toString()).length
  }

  test("equi-join on the partition key between two partitioned " +
    "manifest tables drops both exchanges; results exact") {
    val a = fresh()
    val b = fresh()
    val bcastBefore =
      spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      Seq(a, b).foreach { t =>
        spark.sql(s"CREATE TABLE graft.$t (k BIGINT, p BIGINT, " +
          "v STRING) PARTITIONED BY (p)")
        // TWO commits → two files per partition value: the key-grouped
        // machinery must group same-key files, not assume one each
        spark.sql(s"INSERT INTO graft.$t SELECT id, id % 4, " +
          s"CAST(id AS STRING) FROM range(0, 100)")
        spark.sql(s"INSERT INTO graft.$t SELECT id, id % 4, " +
          s"CAST(id AS STRING) FROM range(100, 200)")
      }
      val j = spark.table(s"graft.$a").groupBy("p")
        .agg(count(lit(1)).as("na"))
        .join(spark.table(s"graft.$b").groupBy("p")
          .agg(count(lit(1)).as("nb")), "p")
      // both groupBys and the join all ride the reported layout
      val n = exchanges(j)
      assert(n == 0, s"expected zero exchanges, got $n:\n" +
        j.queryExecution.executedPlan.toString())
      val rows = j.collect().map(r =>
        (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
      assert(rows.toSeq == (0 until 4).map(p => (p.toLong, 50L, 50L)),
        rows.mkString(","))
      // a join on a NON-partition column still shuffles (no false
      // layout claims)
      val j2 = spark.table(s"graft.$a").select(col("k"), col("v"))
        .join(spark.table(s"graft.$b").select(col("k")), "k")
      assert(exchanges(j2) > 0, "non-partition join must shuffle")
      assert(j2.count() == 200L)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", bcastBefore)
      Seq(a, b).foreach(t => spark.sql(s"DROP TABLE IF EXISTS graft.$t"))
    }
  }

  test("partitioned writes require a clustered distribution: an " +
    "unclustered many-task insert still lands ONE file per partition " +
    "value") {
    val t = fresh()
    val dir = spark.conf.get("spark.sql.catalog.graft.root") + s"/$t"
    try {
      spark.sql(s"CREATE TABLE graft.$t (k BIGINT, p BIGINT) " +
        "PARTITIONED BY (p)")
      // 16 input tasks, every task holding every partition value —
      // without the write's required distribution this would commit
      // up to 16 files PER value
      spark.range(0, 1600, 1, 16)
        .selectExpr("id AS k", "id % 4 AS p")
        .write.format("graft-manifest").mode("append").save(dir)
      val entries = ManifestV2Sink.committedDataFiles(dir)
      assert(entries.size == 4,
        s"want one file per partition value, got ${entries.size}")
      assert(spark.sql(s"SELECT count(*) FROM graft.$t").head.getLong(0)
        == 1600L)
      // every file carries a single partition value
      ManifestV2Sink.readManifest(dir).get._2
        .filterNot(ManifestV2Sink.isDeleteEntry).foreach { e =>
          assert(ManifestV2Sink.entryPartition(e).contains("p"),
            s"unkeyed file: $e")
        }
    } finally spark.sql(s"DROP TABLE IF EXISTS graft.$t")
  }

  test("mixed keyed/legacy files fall back to UnknownPartitioning " +
    "and stay correct") {
    import spark.implicits._
    val t = fresh()
    val dir = spark.conf.get("spark.sql.catalog.graft.root") + s"/$t"
    val bcastBefore =
      spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.sql(s"CREATE TABLE graft.$t (k BIGINT, p BIGINT, v STRING)" +
        " PARTITIONED BY (p)")
      spark.sql(s"INSERT INTO graft.$t SELECT id, id % 4, " +
        "CAST(id AS STRING) FROM range(0, 100)")
      // an external JSONL append carries NO partition blob — the scan
      // must stop claiming the keyed layout
      ManifestV2Sink.appendExternal(dir,
        Seq("""{"k":1000,"p":1,"v":"x"}"""), "legacy")
      val grouped = spark.table(s"graft.$t").groupBy("p")
        .agg(count(lit(1)).as("n"))
      assert(exchanges(grouped) > 0,
        "legacy unkeyed file must void the layout claim")
      val got = grouped.collect().map(r =>
        (r.getLong(0), r.getLong(1))).sortBy(_._1).toSeq
      assert(got == Seq((0L, 25L), (1L, 26L), (2L, 25L), (3L, 25L)), got)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", bcastBefore)
      spark.sql(s"DROP TABLE IF EXISTS graft.$t")
    }
  }
}
