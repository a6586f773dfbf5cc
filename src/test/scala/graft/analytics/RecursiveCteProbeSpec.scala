package graft.analytics

import org.apache.spark.sql.AnalysisException

import graft.SparkSuite

/** Pins Spark 4.1's recursive-CTE envelope, which shapes two design
  * decisions in this repo:
  *  - UNION-distinct inside the recursion is NOT supported
  *    (UNION_NOT_SUPPORTED_IN_RECURSIVE_CTE), so cyclic transitive
  *    closure (connected components) cannot terminate as a recursive
  *    CTE — UNION ALL re-walks cycles forever. That is WHY
  *    dedup_clusters stays an iterative min-label/star contraction
  *    job rather than one spark.sql statement.
  *  - Acyclic recursions with strictly-advancing keys DO work and
  *    terminate at the fixpoint — the basis of events_ewma's ORACLE
  *    day-recurrence (the Spark side now folds the metadata-sized
  *    daily series on the driver; this envelope is what made the
  *    earlier WITH RECURSIVE formulation possible at all).
  */
class RecursiveCteProbeSpec extends SparkSuite {

  test("UNION-distinct recursion is rejected (clusters must stay iterative)") {
    import spark.implicits._
    Seq((1L, 2L)).toDF("s", "d").createOrReplaceTempView("probe_edges")
    val e = intercept[AnalysisException] {
      spark.sql(
        """WITH RECURSIVE walk(v) AS (
          |  SELECT s AS v FROM probe_edges
          |  UNION
          |  SELECT e.d FROM walk w JOIN probe_edges e ON w.v = e.s)
          |SELECT * FROM walk""".stripMargin).collect()
    }
    assert(e.getCondition == "UNION_NOT_SUPPORTED_IN_RECURSIVE_CTE")
  }

  test("acyclic UNION ALL recursion reaches its fixpoint") {
    val df = spark.sql(
      """WITH RECURSIVE seq(n, acc) AS (
        |  SELECT 1 AS n, 1L AS acc
        |  UNION ALL
        |  SELECT n + 1, acc * 2 FROM seq WHERE n < 10)
        |SELECT MAX(n) AS n, MAX(acc) AS acc FROM seq""".stripMargin)
    val r = df.head
    assert(r.getInt(0) == 10 && r.getLong(1) == 512L)
  }
}
