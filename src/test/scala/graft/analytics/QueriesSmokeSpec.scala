package graft.analytics

import graft.{SparkEntry, SparkSuite}

/** Every registered query must return rows at the smallest scale
  * factor. The DuckDB oracle compare alone can't catch a query
  * regressing to empty — an empty result matches an empty oracle —
  * so this pins non-emptiness (verified true for all current queries)
  * and doubles as a does-it-even-run smoke over the whole inventory.
  */
class QueriesSmokeSpec extends SparkSuite {

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).limit(1).count() == 1)
  }

  SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
    test(s"$name returns rows at sf0.001") {
      assert(fn(spark, sf0001).limit(1).count() == 1, s"$name came back empty")
    }
  }

  test("every oracle key has a query") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracles without queries: $missing")
  }
}
