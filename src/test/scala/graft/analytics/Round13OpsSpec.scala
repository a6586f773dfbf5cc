package graft.analytics

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** Round-13 operator pins: the layer-routed graph-search entry beats
  * the retired quartile entry on BOTH axes the change claims —
  * fewer exact-scored candidates AND no recall loss — on the same
  * published index, same beam, same hop count (the `quartileEntry`
  * twin exists only for this measured comparison).
  */
class Round13OpsSpec extends SparkSuite {

  test("layer-routed entry scans fewer candidates at no recall loss " +
    "vs quartile entry (same graph, beam, hops; both test SFs)") {
    // summed over BOTH test scale factors: per-SF recall on this
    // deliberately unstructured corpus swings by single ground-truth
    // pairs (distance-concentration regime), but the aggregate must
    // dominate on both axes or the entry change is not a win
    def run(dir: String, quartile: Boolean): (Long, Long) = {
      val g = EmbeddingQueries.nndIndex(spark, dir)
      val r = EmbeddingQueries.searchOver(spark, dir, g,
        quartileEntry = quartile)
        .agg(sum(col("recall_ppm")).as("r"), sum(col("n_scanned")).as("s"))
        .head
      (r.getLong(0), r.getLong(1))
    }
    val dirs = Seq(sf0001, sf001)
    val (recallRouted, scannedRouted) = dirs.map(run(_, quartile = false))
      .reduce((a, b) => (a._1 + b._1, a._2 + b._2))
    val (recallQuartile, scannedQuartile) = dirs.map(run(_, quartile = true))
      .reduce((a, b) => (a._1 + b._1, a._2 + b._2))
    assert(scannedRouted < scannedQuartile,
      s"routed entry must scan fewer: $scannedRouted vs $scannedQuartile")
    assert(recallRouted >= recallQuartile,
      s"routed entry lost recall: $recallRouted vs $recallQuartile")
    assert(recallRouted > 0, "vacuous: zero recall")
  }

  test("CEP journey cap: a pathological power user keeps only the " +
    "newest CepJourneyCap events, ordinals stay absolute") {
    import spark.implicits._
    val cap = EventQueries.CepJourneyCap
    val total = cap + 10L
    // one user, `total` events: an early 'vcp' (ordinals 2..4, inside
    // the truncated-away head) and a late 'vcp' (the last 3 events);
    // filler is 'b' (browse) which no pattern completes on
    val ev = spark.range(1, total + 1).select(
      lit(7L).as("user_id"),
      timestamp_millis(lit(1700000000000L) + col("id") * 1000).as("ts"),
      col("id").as("event_id"),
      when(col("id") === 2 || col("id") === total - 2, "view")
        .when(col("id") === 3 || col("id") === total - 1, "click")
        .when(col("id") === 4 || col("id") === total, "purchase")
        .otherwise("browse").as("event_type"))
    val j = EventQueries.journeysOf(ev).head()
    assert(j.getString(1).length == cap.toInt,
      s"journey not capped: ${j.getString(1).length}")
    assert(j.getLong(2) == total - cap, s"ord_base wrong: ${j.getLong(2)}")
    val spans = EventQueries.spansOf(ev)
      .where(col("pattern_name") === "view_to_purchase")
      .select(col("match_ord"), col("start_ord"), col("end_ord"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // the early match fell out of the window; the late one reports
    // its ABSOLUTE event ordinals (total-2 .. total)
    assert(spans.toSeq == Seq((1L, total - 2, total)),
      s"capped spans wrong: ${spans.toSeq}")
  }
}
