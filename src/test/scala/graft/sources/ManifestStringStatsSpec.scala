package graft.sources

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** Truncated STRING bounds (`T|` blobs): per-file min/max prefixes
  * prune string range and equality predicates at planning — the
  * skip a date=string or category-clustered layout needs where
  * numeric stats never apply — with Iceberg's truncate-down/
  * truncate-up soundness under 16-byte prefixes.
  */
class ManifestStringStatsSpec extends SparkSuite {

  private def fresh(): String =
    s"t_${java.util.UUID.randomUUID().toString.take(8)}"

  private def root: String = spark.conf.get("spark.sql.catalog.graft.root")

  test("string range/equality predicates prune whole files; residuals " +
    "stay exact") {
    val t = fresh()
    val dir = s"$root/$t"
    try {
      spark.sql(s"CREATE TABLE graft.$t (k BIGINT, cat STRING)")
      Seq("alpha", "mid", "zulu").foreach { c =>
        spark.sql(s"INSERT INTO graft.$t SELECT /*+ COALESCE(1) */ id, " +
          s"concat('$c', '_', id) FROM range(0, 50)")
      }
      val entries = ManifestV2Sink.readManifest(dir).get._2
      assert(entries.forall(e =>
        ManifestV2Sink.entryStringStats(e).contains("cat")),
        s"missing T| blobs: $entries")
      def planned(pred: String): Int =
        spark.sql(s"SELECT k FROM graft.$t WHERE $pred")
          .rdd.getNumPartitions
      // range: only the zulu file can hold cat >= 'z'
      assert(planned("cat >= 'z'") == 1, "range prune failed")
      // equality: only the mid file can hold 'mid_7'
      assert(planned("cat = 'mid_7'") == 1, "equality prune failed")
      // upper-bound: nothing above 'zz' — zero files
      assert(planned("cat > 'zz'") == 0, "upper prune failed")
      // results exact through the residual
      assert(spark.sql(s"SELECT count(*) FROM graft.$t " +
        "WHERE cat >= 'z'").head.getLong(0) == 50L)
      assert(spark.sql(s"SELECT count(*) FROM graft.$t " +
        "WHERE cat = 'mid_7'").head.getLong(0) == 1L)
    } finally spark.sql(s"DROP TABLE IF EXISTS graft.$t")
  }

  test("truncation soundness: values sharing a 16-byte prefix never " +
    "over-prune; all-0xFF-adjacent prefixes omit the upper bound") {
    val t = fresh()
    val dir = s"$root/$t"
    try {
      spark.sql(s"CREATE TABLE graft.$t (k BIGINT, s STRING)")
      // 20-char values, identical first 16 bytes, differing tails —
      // the truncated bounds cannot distinguish them
      spark.sql(s"INSERT INTO graft.$t SELECT /*+ COALESCE(1) */ * " +
        "FROM VALUES (1, 'aaaaaaaaaaaaaaaa_AAA'), " +
        "(2, 'aaaaaaaaaaaaaaaa_ZZZ') AS v(k, s)")
      // equality INSIDE the truncated range must read the file
      assert(spark.sql(s"SELECT count(*) FROM graft.$t " +
        "WHERE s = 'aaaaaaaaaaaaaaaa_MMM'").head.getLong(0) == 0L)
      assert(spark.sql(s"SELECT count(*) FROM graft.$t " +
        "WHERE s = 'aaaaaaaaaaaaaaaa_ZZZ'").head.getLong(0) == 1L)
      // range straddling the truncated upper bound stays exact
      assert(spark.sql(s"SELECT count(*) FROM graft.$t " +
        "WHERE s > 'aaaaaaaaaaaaaaaa_B'").head.getLong(0) == 1L)
      // bounds recorded: lower = 16-byte prefix, upper = incremented
      val dataEntries = ManifestV2Sink.readManifest(dir).get._2
        .filterNot(ManifestV2Sink.isDeleteEntry)
      assert(dataEntries.length == 1, dataEntries)
      val (lo, up) = ManifestV2Sink.entryStringStats(dataEntries.head)("s")
      assert(new String(lo, "UTF-8") == "aaaaaaaaaaaaaaaa")
      assert(up.exists(u => new String(u, "UTF-8") == "aaaaaaaaaaaaaaab"),
        up.map(new String(_, "UTF-8")).toString)
    } finally spark.sql(s"DROP TABLE IF EXISTS graft.$t")
  }
}
