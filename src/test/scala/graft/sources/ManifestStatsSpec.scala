package graft.sources

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** The manifest scan's reported statistics and runtime filtering —
  * the two metadata seams that size joins and prune files at 100 TB:
  *  - `SupportsReportStatistics`: per-file (rows, bytes) recorded at
  *    publish sum into exact post-pushdown scan statistics, so a
  *    small manifest dimension AUTO-broadcasts (and a big one does
  *    NOT) purely from reported stats — no hints;
  *  - `SupportsRuntimeFiltering`: a fact-dim join keyed on a
  *    stats-covered column plants a dynamic-pruning subquery; after
  *    the dim executes, the fact scan re-plans to only the files
  *    whose recorded ranges can hold the surviving keys.
  */
class ManifestStatsSpec extends SparkSuite {

  private def fresh(): String =
    s"t_${java.util.UUID.randomUUID().toString.take(8)}"

  private def root: String = spark.conf.get("spark.sql.catalog.graft.root")

  test("entries record R| rows:bytes; reported statistics are exact " +
    "and narrow under pushdown") {
    val t = fresh()
    val dir = s"$root/$t"
    try {
      spark.sql(s"CREATE TABLE graft.$t (k BIGINT, v STRING)")
      spark.sql(s"INSERT INTO graft.$t SELECT /*+ COALESCE(1) */ id, " +
        "CAST(id AS STRING) FROM range(0, 100)")
      spark.sql(s"INSERT INTO graft.$t SELECT /*+ COALESCE(1) */ id, " +
        "CAST(id AS STRING) FROM range(1000, 1100)")
      val entries = ManifestV2Sink.readManifest(dir).get._2
      val rb = entries.map(ManifestV2Sink.entryRowsBytes)
      assert(rb.forall(_.isDefined), s"missing R| blob: $entries")
      assert(rb.flatten.map(_._1).sum == 200L,
        s"recorded rows wrong: $rb")
      assert(rb.flatten.forall(_._2 > 0L), s"recorded bytes wrong: $rb")
      // optimizer-visible stats: full scan counts both files...
      val full = spark.table(s"graft.$t")
        .queryExecution.optimizedPlan.stats
      assert(full.sizeInBytes == BigInt(rb.flatten.map(_._2).sum),
        s"full-scan sizeInBytes ${full.sizeInBytes} != recorded")
      assert(full.rowCount.contains(BigInt(200)),
        s"full-scan rowCount ${full.rowCount}")
      // ...and a pushed filter narrows them to the one matching file
      val pruned = spark.table(s"graft.$t").where(col("k") < 100)
        .queryExecution.optimizedPlan.stats
      assert(pruned.sizeInBytes < full.sizeInBytes,
        s"pushdown did not narrow stats: $pruned vs $full")
    } finally spark.sql(s"DROP TABLE IF EXISTS graft.$t")
  }

  test("a small manifest dimension auto-broadcasts from reported " +
    "stats; a big one does not — no hints either way") {
    val small = fresh()
    val big = fresh()
    val factT = fresh()
    val thresholdBefore =
      spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.sql(s"CREATE TABLE graft.$small (k BIGINT, name STRING)")
      spark.sql(s"INSERT INTO graft.$small SELECT id, " +
        "CAST(id AS STRING) FROM range(0, 50)")
      spark.sql(s"CREATE TABLE graft.$big (k BIGINT, pad STRING)")
      spark.sql(s"INSERT INTO graft.$big SELECT id, " +
        "repeat(uuid(), 4) FROM range(0, 30000)")
      spark.sql(s"CREATE TABLE graft.$factT (k BIGINT, m BIGINT, " +
        "pad STRING)")
      spark.sql(s"INSERT INTO graft.$factT SELECT id % 100, id, " +
        "repeat(uuid(), 4) FROM range(0, 30000)")
      // threshold above the small dim, below the big dim AND the fact
      // (so the only auto-broadcastable relation is the small dim)
      def tableBytes(t: String): Long =
        ManifestV2Sink.readManifest(s"$root/$t").get._2
          .flatMap(ManifestV2Sink.entryRowsBytes).map(_._2).sum
      val smallBytes = tableBytes(small)
      val bigBytes = tableBytes(big)
      val factBytes = tableBytes(factT)
      assert(smallBytes * 2 < math.min(bigBytes, factBytes),
        s"fixture degenerate: $smallBytes/$bigBytes/$factBytes")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold",
        (smallBytes * 2).toString)
      def joinPlan(dim: String): String = {
        val df = spark.table(s"graft.$factT")
          .join(spark.table(s"graft.$dim"), "k")
        df.collect() // AQE finalizes the physical plan on execution
        df.queryExecution.executedPlan.toString()
      }
      val smallPlan = joinPlan(small)
      assert(smallPlan.contains("BroadcastHashJoin"),
        s"small dim not auto-broadcast:\n$smallPlan")
      val bigPlan = joinPlan(big)
      assert(!bigPlan.contains("BroadcastHashJoin"),
        s"big dim wrongly broadcast:\n$bigPlan")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold",
        thresholdBefore)
      Seq(small, big, factT).foreach(t =>
        spark.sql(s"DROP TABLE IF EXISTS graft.$t"))
    }
  }

  test("runtime filtering prunes fact files by the dim's surviving " +
    "join keys; results exact") {
    val factT = fresh()
    val dimT = fresh()
    val factDir = s"$root/$factT"
    try {
      spark.sql(s"CREATE TABLE graft.$factT (k BIGINT, m BIGINT)")
      // seven single-file commits with disjoint key ranges: the
      // time/key-clustered layout a nightly ingest produces
      (0 until 7).foreach { i =>
        spark.sql(s"INSERT INTO graft.$factT " +
          s"SELECT /*+ COALESCE(1) */ id, id * 2 " +
          s"FROM range(${i * 100}, ${i * 100 + 100})")
      }
      spark.sql(s"CREATE TABLE graft.$dimT (k BIGINT, tag STRING)")
      spark.sql(s"INSERT INTO graft.$dimT SELECT id, " +
        "CASE WHEN id IN (50, 250) THEN 'hot' ELSE 'cold' END " +
        "FROM range(0, 700)")
      val df = spark.table(s"graft.$factT")
        .join(spark.table(s"graft.$dimT").where(col("tag") === "hot"),
          "k")
        .agg(sum(col("m")).as("s"), count(lit(1)).as("n"))
      val row = df.collect()(0)
      assert(row.getLong(1) == 2L && row.getLong(0) == (50L + 250L) * 2,
        s"join result wrong: $row")
      // the dynamic-pruning subquery is in the final plan...
      val plan = df.queryExecution.executedPlan.toString()
      assert(plan.toLowerCase.contains("dynamicpruning"),
        s"no runtime filter planted:\n$plan")
      // ...and the fact scan re-planned to ONLY the two files whose
      // recorded ranges hold the surviving keys {50, 250}
      val (files, total) = ManifestScanPlanner.lastPlanned(factDir).get
      assert(total == 7, s"fixture: expected 7 files, got $total")
      assert(files == 2,
        s"runtime prune read $files of $total files, want 2")
    } finally Seq(factT, dimT).foreach(t =>
      spark.sql(s"DROP TABLE IF EXISTS graft.$t"))
  }
}
