package graft.sources

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** The DSv2 source's contract: correct values, REAL filter pushdown
  * (consumed predicates narrow the generated interval — visible in the
  * scan description and absent from any post-scan Filter), and column
  * pruning reaching the readers.
  */
class SyntheticV2SourceSpec extends SparkSuite {

  private def synth(rows: Long, parts: Int = 4) =
    spark.read.format("graft-synth")
      .option("rows", rows.toString).option("parts", parts.toString).load()

  test("generates the deterministic table") {
    val df = synth(1000)
    assert(df.count() == 1000)
    val row = df.where(col("id") === 42)
      .select("bucket", "hv", "tag").head
    assert(row.getLong(0) == 42 % 97)
    assert(row.getLong(1) == SyntheticV2Source.hv(42))
    assert(row.getString(2) == "t0")
  }

  test("plain slices read COLUMNAR; keyed slices keep the row path") {
    // the factory claims columnar for interval slices — the scan exec
    // must actually plan the vectorized path (ColumnarToRow above the
    // scan), and the batches must agree with the row semantics on
    // every column type including the pushed-sample skip walk
    val plain = synth(100000).where(col("id") >= 500)
    assert(plain.queryExecution.executedPlan.toString
      .contains("ColumnarToRow"), "plain scan must be columnar")
    assert(plain.count() == 99500)
    val r = plain.where(col("id") === 4242)
      .select("id", "bucket", "hv", "tag").head
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)) ==
      ((4242L, 4242L % 97, SyntheticV2Source.hv(4242), "t" + 4242 % 7)))
    // batch boundaries: a slice larger than one 4096-row batch must
    // stream every batch, not just the first
    assert(synth(10000, parts = 1).agg(sum(col("id"))).head.getLong(0)
      == (0L until 10000L).sum)
    // sampled scan through the columnar fill
    val spec = SyntheticV2Source.sampleSpec(0.0, 0.03, 11L)
    assert(synth(50000).sample(0.03, 11L).count() ==
      (0L until 50000L).count(SyntheticV2Source.inSample(_, spec)))
    // the keyed layout stays row-based (its partition-key grouping is
    // the SPJ surface; both paths stay exercised)
    val keyed = spark.read.format("graft-synth")
      .option("rows", "10000").option("keyed", "true").load()
    assert(!keyed.queryExecution.executedPlan.toString
      .contains("ColumnarToRow"), "keyed scan must stay row-based")
  }

  test("reported statistics drive an UNHINTED broadcast; keyed stays mum") {
    // SupportsReportStatistics: the scan reports its exact
    // post-pushdown cardinality, so Catalyst broadcasts the small
    // synthetic side of a join with no broadcast() hint anywhere —
    // the default-costed DSv2 relation would shuffle instead
    val big = spark.range(10L * 1000 * 1000).select(col("id"))
    val dim = synth(100).select(col("id"), col("hv"))
    val j = big.join(dim, "id")
    val plan = j.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"stats did not drive a broadcast:\n${plan.take(1200)}")
    assert(j.count() == 100)
    // pushed filters narrow the reported stats too: a filtered slice
    // of a huge table is still broadcast-eligible
    val dimF = synth(100000000L).where(col("id") < 50)
      .select(col("id"), col("hv"))
    assert(big.join(dimF, "id").queryExecution.executedPlan.toString
      .contains("BroadcastHashJoin"), "post-pushdown stats ignored")
    // the KEYED layout must NOT report small stats: its purpose is
    // the exchange-free storage-partitioned join, which a broadcast
    // would erase (see the SPJ specs for the positive pin)
    val k1 = keyedSynth(5000).select(col("bucket"), col("id"))
    val k2 = keyedSynth(3000).select(col("bucket"),
      col("id").as("id2"))
    assert(!k1.join(k2, "bucket").queryExecution.executedPlan.toString
      .contains("BroadcastHashJoin"),
      "keyed scan must not cost as broadcast-eligible")
  }

  test("range predicates are consumed by the scan, not re-filtered") {
    val df = synth(100000).where(col("id") >= 90000 && col("id") < 90010)
    assert(df.count() == 10)
    val plan = df.queryExecution.executedPlan.toString
    // the narrowed interval is IN the scan's description...
    assert(plan.contains("lo=90000") && plan.contains("hi=90010"),
      s"pushdown did not reach the scan:\n$plan")
    // ...and no Filter node survives above it (IsNotNull + both range
    // predicates were all consumed). A Filter NODE renders as
    // "Filter (cond)" — plain "Filter" would also match the scan's
    // always-present "RuntimeFilters: []" tag.
    assert(!plan.contains("Filter ("), s"residual filter remained:\n$plan")
  }

  test("unsupported predicates stay residual and still evaluate") {
    val df = synth(1000).where(col("tag") === "t3")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("Filter ("), "tag predicate should be residual")
    // ids ≡ 3 (mod 7) in [0, 1000): ⌈(1000-3)/7⌉ = 143
    assert(df.count() == 143)
  }

  test("column pruning reaches the readers") {
    val df = synth(1000).select(sum(col("hv")).as("s"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("cols=hv"), s"pruning did not reach scan:\n$plan")
    val expect = (0L until 1000L).map(SyntheticV2Source.hv).sum
    assert(df.head.getLong(0) == expect)
  }

  test("boundary predicates at Long.MaxValue narrow without wrapping") {
    // these are consumed (not residual), so a wrapped `n + 1` would
    // return silently wrong results rather than fail
    assert(synth(1000).where(col("id") > Long.MaxValue).count() == 0)
    assert(synth(1000).where(col("id") <= Long.MaxValue).count() == 1000)
    assert(synth(1000).where(col("id") === Long.MaxValue).count() == 0)
  }

  private def keyedSynth(rows: Long) =
    spark.read.format("graft-synth")
      .option("rows", rows.toString).option("keyed", "true").load()

  test("keyed layout returns the identical table, one partition per bucket") {
    val m = SyntheticV2Source.Buckets
    val flat = synth(5000).collect().map(_.toSeq).toSet
    val keyed = keyedSynth(5000)
    assert(keyed.rdd.getNumPartitions == m)
    assert(keyed.collect().map(_.toSeq).toSet == flat)
    // each physical partition holds exactly its residue class
    val perPart = keyed.select(col("id"), col("bucket"))
      .rdd.mapPartitionsWithIndex { (_, it) =>
        Iterator.single(it.map(r => r.getLong(1)).toSet.size)
      }.collect()
    assert(perPart.forall(_ <= 1), perPart.mkString(","))
  }

  test("keyed layout still honors pushdown narrowing") {
    val df = keyedSynth(10000).where(col("id") >= 2000 && col("id") < 7000)
    assert(df.count() == 5000)
    assert(df.agg(min("id"), max("id")).head.toSeq == Seq(2000L, 6999L))
  }

  test("keyed reader saturates at Long.MaxValue instead of wrapping") {
    // without saturation `id += 97` wraps negative past MaxValue, the
    // bound check stays true, and the reader streams garbage forever
    val df = spark.read.format("graft-synth")
      .option("rows", Long.MaxValue.toString).option("keyed", "true")
      .load()
      .where(col("id") >= Long.MaxValue - 1000)
    assert(df.count() == 1000)
    assert(df.agg(min("id")).head.getLong(0) == Long.MaxValue - 1000)
  }

  test("bucketless projection falls back to unkeyed slicing") {
    // pruning away `bucket` makes the key-grouped report impossible;
    // the scan must degrade to contiguous slices, not lie about layout
    val df = keyedSynth(1000).select(sum(col("hv")).as("s"))
    val expect = (0L until 1000L).map(SyntheticV2Source.hv).sum
    assert(df.head.getLong(0) == expect)
  }

  test("pushed aggregates fold to the closed form, nulls on empty") {
    // complete pushdown answers COUNT/MIN/MAX arithmetically; the
    // empty range must produce SQL empty-aggregate semantics (0,
    // null, null), not a crash or a fabricated min
    val df = synth(100000)
      .where(col("id") >= 250 && col("id") < 750)
      .agg(count(lit(1)).as("n"), min(col("id")).as("mn"),
        max(col("id")).as("mx"))
    val r = df.head
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) == ((500L, 250L, 749L)))
    val empty = synth(1000).where(col("id") >= 5000)
      .agg(count(lit(1)).as("n"), min(col("id")).as("mn"),
        max(col("id")).as("mx")).head
    assert(empty.getLong(0) == 0L)
    assert(empty.isNullAt(1) && empty.isNullAt(2),
      "empty-range min/max must be SQL null")
    // an unpushable shape (sum, computed grouping) must fall back to
    // a row scan with identical results, never a wrong closed form
    val grouped = synth(1000)
      .groupBy((col("id") % 10).as("g")).agg(sum(col("id")).as("s"))
    assert(grouped.count() == 10)
    assert(grouped.agg(sum(col("s"))).head.getLong(0) ==
      (0L until 1000L).sum)
  }

  test("bucket-grouped pushdown equals the row-scan fold at odd bounds") {
    // residue-class arithmetic vs brute force on an interval that is
    // aligned to nothing: first/last/count per class must agree with
    // folding the actual rows (sum(hv) blocks pushdown on the
    // reference side, forcing the real scan)
    val (lo, hi) = (137L, 4243L)
    val pushed = synth(100000)
      .where(col("id") >= lo && col("id") < hi)
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n"), min(col("id")).as("mn"),
        max(col("id")).as("mx"))
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    val scanned = synth(100000)
      .where(col("id") >= lo && col("id") < hi)
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n"), min(col("id")).as("mn"),
        max(col("id")).as("mx"), sum(col("hv")).as("block_pushdown"))
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(pushed == scanned)
    // narrower than the modulus: some classes must be absent entirely
    val narrow = synth(100000)
      .where(col("id") >= 10 && col("id") < 20)
      .groupBy(col("bucket")).agg(count(lit(1)).as("n"))
    assert(narrow.count() == 10)
  }

  test("partition slicing covers the interval exactly") {
    val df = synth(1003, parts = 7)
    assert(df.rdd.getNumPartitions == 7)
    assert(df.select(countDistinct("id")).head.getLong(0) == 1003)
    // empty-slice filtering: more parts than rows still reads every row
    val tiny = synth(3, parts = 8)
    assert(tiny.count() == 3)
  }

  test("runtime filtering prunes keyed partitions under dynamic pruning") {
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
    // a selective dimension joined on the declared filter attribute:
    // Spark's PartitionPruning rule must plant a DynamicPruningSubquery
    // on the v2 scan, and after the broadcast side executes, filter()
    // must re-plan the keyed layout to ONLY the surviving residue
    // classes — observable as the scan's numOutputRows metric reading
    // the 6 matching buckets' rows, not the whole table
    val rows = 97000L
    val fact = keyedSynth(rows)
    val dim = spark.range(0, 97)
      .select(col("id").as("bucket"), (col("id") % 19).as("cls"))
      .where(col("cls") === 0) // buckets {0,19,38,57,76,95}
    val df = fact.join(dim, "bucket")
      .agg(count(lit(1)).as("n"), sum(col("hv")).as("s"))
    val keep = (0L until 97L).filter(_ % 19 == 0).toSet
    val expRows = (0L until rows).count(id => keep(id % 97)).toLong
    val expSum = (0L until rows).filter(id => keep(id % 97))
      .map(SyntheticV2Source.hv).sum
    val r = df.collect()(0)
    assert((r.getLong(0), r.getLong(1)) == ((expRows, expSum)))
    val qe = df.queryExecution
    assert(qe.executedPlan.toString.toLowerCase.contains("dynamicpruning"),
      "no runtime filter planted on the v2 scan:\n" +
        qe.executedPlan.toString.take(800))
    // descend through AQE wrappers: QueryStageExec holds its subtree
    // as a field, not a child, so a plain collect() never reaches the
    // materialized scan
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.QueryStageExec
    def findScans(p: SparkPlan): Seq[BatchScanExec] = p match {
      case a: AdaptiveSparkPlanExec => findScans(a.executedPlan)
      case q: QueryStageExec => findScans(q.plan)
      case b: BatchScanExec => Seq(b)
      case other => other.children.flatMap(findScans)
    }
    val scans = findScans(qe.executedPlan)
      .filter(_.toString.contains("GraftSynth"))
    assert(scans.nonEmpty, qe.executedPlan.toString.take(800))
    val scanned = scans.map(_.metrics("numOutputRows").value).sum
    assert(scanned == expRows,
      s"scan emitted $scanned rows; runtime pruning should cap at $expRows")
  }

  test("ORDER BY id LIMIT k folds to a k-row read in both directions") {
    // full top-N pushdown: Spark must drop its Sort AND Limit — no
    // TakeOrderedAndProject, no global Sort — and the scan reads k
    // rows from the matching end of the (filter-narrowed) interval
    val big = 100000000L
    val asc = synth(big).where(col("id") >= 777)
      .orderBy(col("id").asc).limit(5)
    val ascPlan = asc.queryExecution.executedPlan.toString
    assert(!ascPlan.contains("TakeOrderedAndProject") &&
      !ascPlan.contains("Sort "), s"top-N not fully pushed:\n$ascPlan")
    assert(ascPlan.contains("lo=777") && ascPlan.contains("hi=782") &&
      ascPlan.contains("order=asc"), ascPlan)
    assert(asc.collect().map(_.getLong(0)).toSeq ==
      (777L to 781L).toSeq, "ascending top-5 wrong or unordered")

    val desc = synth(big).orderBy(col("id").desc).limit(4)
    val descPlan = desc.queryExecution.executedPlan.toString
    assert(!descPlan.contains("TakeOrderedAndProject") &&
      !descPlan.contains("Sort "), s"top-N not fully pushed:\n$descPlan")
    assert(descPlan.contains(s"lo=${big - 4}") &&
      descPlan.contains("order=desc"), descPlan)
    assert(desc.collect().map(_.getLong(0)).toSeq ==
      Seq(big - 1, big - 2, big - 3, big - 4),
      "descending top-4 wrong or unordered")

    // a sort the source cannot fold (hv) must stay Spark-side and
    // still be right — never a wrong closed form
    val byHv = synth(2000).orderBy(col("hv").asc).limit(3)
    assert(byHv.queryExecution.executedPlan.toString
      .contains("TakeOrderedAndProject"), "hv sort must not be claimed")
    val expect = (0L until 2000L).sortBy(SyntheticV2Source.hv).take(3)
    assert(byHv.collect().map(_.getLong(0)).toSeq == expect.toSeq)
  }

  test("bare LIMIT k is fully pushed and truncates the interval") {
    val df = synth(100000000L).where(col("id") >= 5000).limit(7)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("lo=5000") && plan.contains("hi=5007"),
      s"limit did not truncate the scan:\n$plan")
    assert(df.count() == 7)
    // limit larger than the table: every row, exactly once
    assert(synth(9).limit(100).count() == 9)
  }

  test("OFFSET folds with limit/top-N in every composition order") {
    // ground truth: the identical pipeline over spark.range (no
    // pushdown) — whatever protocol order Spark pushes limit/top-N/
    // offset in, the folded scan must return the same rows
    val n = 100000L
    def ref = spark.range(n).select(col("id"))
    def s = synth(n).select(col("id"))
    def ids(df: org.apache.spark.sql.DataFrame): Seq[Long] =
      df.collect().map(_.getLong(0)).toSeq
    // offset alone
    assert(ids(s.offset(99995)) == ids(ref.offset(99995)))
    // offset then limit (LIMIT k OFFSET o): rows [o, o+k)
    assert(ids(s.offset(70000).limit(5)) == ids(ref.offset(70000).limit(5)))
    // limit then offset: rows [o, k)
    assert(ids(s.limit(10).offset(4)) == ids(ref.limit(10).offset(4)))
    // ordered pagination, both directions — and the plan must stay
    // sort-free (full pushdown) with a k-row scan
    val ascPage = s.orderBy(col("id").asc).offset(500).limit(3)
    assert(ids(ascPage) == ids(ref.orderBy(col("id").asc)
      .offset(500).limit(3)))
    val ascPlan = ascPage.queryExecution.executedPlan.toString
    assert(!ascPlan.contains("TakeOrderedAndProject") &&
      !ascPlan.contains("Sort "), ascPlan)
    assert(ascPlan.contains("lo=500") && ascPlan.contains("hi=503"),
      ascPlan)
    val descPage = s.orderBy(col("id").desc).offset(2).limit(3)
    assert(ids(descPage) == ids(ref.orderBy(col("id").desc)
      .offset(2).limit(3)))
    val descPlan = descPage.queryExecution.executedPlan.toString
    assert(descPlan.contains(s"lo=${n - 5}") &&
      descPlan.contains(s"hi=${n - 2}"), descPlan)
    // offset past the end: empty, not wrapped
    assert(ids(s.where(col("id") >= n - 3).offset(10)) == Seq.empty)
  }

  test("TABLESAMPLE is pushed, deterministic, and composes with filters") {
    val n = 200000L
    val df = synth(n).sample(0.02, 7L)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("sample=["), s"sample not pushed:\n$plan")
    assert(!plan.contains("Sample "), s"Spark kept its Sample node:\n$plan")
    // exact membership: the reader must emit precisely the hash-
    // predicate rows, reproducibly
    val spec = SyntheticV2Source.sampleSpec(0.0, 0.02, 7L)
    val want = (0L until n)
      .filter(SyntheticV2Source.inSample(_, spec)).toSet
    val got = df.select(col("id")).collect().map(_.getLong(0)).toSet
    assert(got == want, s"sample drifted: ${got.size} vs ${want.size}")
    assert(got == synth(n).sample(0.02, 7L)
      .select(col("id")).collect().map(_.getLong(0)).toSet,
      "same seed must reproduce the same sample")
    // a different seed yields a different (but same-law) sample
    assert(got != synth(n).sample(0.02, 8L)
      .select(col("id")).collect().map(_.getLong(0)).toSet)
    // composes with range filters when the Sample sits on the scan
    // (sample first, then filter — both land in the one ScanBuilder)
    val filtered = synth(n).sample(0.02, 7L)
      .where(col("id") >= 1000 && col("id") < 50000)
      .select(col("id")).collect().map(_.getLong(0)).toSet
    assert(filtered == want.filter(id => id >= 1000 && id < 50000))
    // the other order — filter below Sample — is OUTSIDE the pushdown
    // contract (the rule only folds a Sample directly on the
    // relation): Spark must keep its own Sample node, not fold wrong
    val unfoldable = synth(n)
      .where(col("id") >= 1000 && col("id") < 50000).sample(0.02, 7L)
    assert(unfoldable.queryExecution.executedPlan.toString
      .contains("Sample "), "filter-below-sample must stay Spark-side")
    // a with-replacement sample must NOT be claimed (duplicates)
    val wr = synth(1000).sample(withReplacement = true, 2.0, 7L)
    assert(wr.queryExecution.executedPlan.toString.contains("Sample "),
      "with-replacement sample must stay Spark-side")
    // keyed layout samples identically (readers share the predicate)
    val keyedGot = keyedSynth(n).sample(0.02, 7L)
      .select(col("id")).collect().map(_.getLong(0)).toSet
    assert(keyedGot == want)
    // sample + limit: the limit must not be folded into the interval
    // (the scan is no longer dense) yet results stay correct
    assert(synth(n).sample(0.02, 7L).limit(25).count() == 25)
  }

  test("inner equi-join on id folds to one interval-intersected scan") {
    // SupportsPushDownJoin: both sides collapse into a single scan
    // over [max(lo), min(hi)) emitting both (aliased) projections —
    // no join exec anywhere in the plan
    val a = synth(100000).where(col("id") < 80000)
      .select(col("id"), col("hv"))
    val b = synth(200000).where(col("id") >= 30000)
      .select(col("id"), col("bucket"))
    val j = a.join(b, "id")
    val plan = j.queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), s"join not folded:\n$plan")
    assert(plan.contains("lo=30000") && plan.contains("hi=80000"),
      s"interval not intersected:\n$plan")
    val rows = j.collect()
    assert(rows.length == 50000)
    val r = j.where(col("id") === 31337).head
    assert(r.getLong(1) == SyntheticV2Source.hv(31337))
    assert(r.getLong(2) == 31337 % 97)
    // ground truth vs the identical pipeline over spark.range
    def ref(n: Long) = spark.range(n).select(col("id"),
      (col("id") % 97).as("bucket"))
    val want = spark.range(100000).where(col("id") < 80000)
      .select(col("id")).join(ref(200000).where(col("id") >= 30000), "id")
      .agg(sum(col("bucket"))).head.getLong(0)
    assert(j.agg(sum(col("bucket"))).head.getLong(0) == want)
  }

  test("join pushdown declines what it cannot fold — results still right") {
    // non-id keys, outer joins, and sampled sides keep Spark's join
    val byBucket = synth(2000).select(col("bucket"), col("id"))
      .join(synth(1000).select(col("bucket"), col("hv")), "bucket")
    assert(byBucket.queryExecution.executedPlan.toString.contains("Join"),
      "bucket-key join must not be claimed")
    // bucket join is a 97-key cross: each left row matches ~1000/97
    val expect = (0L until 2000L).map(i =>
      (0L until 1000L).count(_ % 97 == i % 97).toLong).sum
    assert(byBucket.count() == expect)

    val outer = synth(2000).select(col("id"), col("hv"))
      .join(synth(1000).select(col("id"), col("bucket")), Seq("id"),
        "left_outer")
    assert(outer.queryExecution.executedPlan.toString.contains("Join"),
      "outer join must not be claimed")
    assert(outer.count() == 2000)
    assert(outer.where(col("bucket").isNull).count() == 1000)

    val sampled = synth(20000).sample(0.1, 3L).select(col("id"), col("hv"))
      .join(synth(20000).select(col("id"), col("bucket")), "id")
    assert(sampled.queryExecution.executedPlan.toString.contains("Join"),
      "a sampled side must not be claimed")
    val spec = SyntheticV2Source.sampleSpec(0.0, 0.1, 3L)
    assert(sampled.count() ==
      (0L until 20000L).count(SyntheticV2Source.inSample(_, spec)))
  }

  test("predicates arrive through the V2 Predicate path") {
    // the builder implements SupportsPushDownV2Filters ONLY — if the
    // translation to connector Predicates failed, the range predicate
    // would stay residual and the scan description would keep lo=0
    val df = synth(100000).where(col("id") >= 90000 && col("id") < 90010)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("lo=90000") && plan.contains("hi=90010"), plan)
    // literal-first comparisons narrow identically (mirrored trees)
    val flipped = synth(100000)
      .where(lit(90000) <= col("id") && lit(90010) > col("id"))
    val fPlan = flipped.queryExecution.executedPlan.toString
    assert(fPlan.contains("lo=90000") && fPlan.contains("hi=90010"), fPlan)
    assert(flipped.count() == 10)
  }

  test("runtime filtering never drops rows the join still needs") {
    // correctness guard for the pruning path itself: pruned vs
    // pruning-disabled results must be identical
    val fact = keyedSynth(10000)
    val dim = spark.range(0, 5).select(col("id").as("bucket"))
    val pruned = fact.join(dim, "bucket")
      .agg(sum(col("id")).as("s")).head.getLong(0)
    val expect = (0L until 10000L).filter(_ % 97 < 5).sum
    assert(pruned == expect)
  }
}
