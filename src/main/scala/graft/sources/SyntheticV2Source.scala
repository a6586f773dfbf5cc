package graft.sources

import java.util

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.{Expression => VExpression, Expressions, Literal, NamedReference, SortDirection, SortOrder, Transform}
import org.apache.spark.sql.connector.expressions.aggregate.{AggregateFunc, Aggregation, Count, CountStar, Max, Min}
import org.apache.spark.sql.connector.expressions.filter.{Predicate => VPredicate}
import org.apache.spark.sql.connector.join.{JoinType => VJoinType}
import org.apache.spark.sql.connector.read.{Batch, HasPartitionKey, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, Statistics, SupportsPushDownAggregates, SupportsPushDownJoin, SupportsPushDownLimit, SupportsPushDownOffset, SupportsPushDownRequiredColumns, SupportsPushDownTableSample, SupportsPushDownTopN, SupportsPushDownV2Filters, SupportsReportPartitioning, SupportsReportStatistics, SupportsRuntimeFiltering}
import org.apache.spark.sql.connector.read.partitioning.{KeyGroupedPartitioning, Partitioning, UnknownPartitioning}
import org.apache.spark.sql.execution.vectorized.OnHeapColumnVector
import org.apache.spark.sql.sources.{DataSourceRegister, EqualTo, Filter, In}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.sql.vectorized.{ColumnVector, ColumnarBatch}
import org.apache.spark.unsafe.types.UTF8String

import graft.functions.CrossHash

/** DataSource V2 synthetic table — the custom-source integration path
  * of the engine, exercising the full connector read surface: a
  * `TableProvider` returning a batch-readable `Table`, a `ScanBuilder`
  * that REALLY honors `SupportsPushDownV2Filters` (range predicates
  * on `id` narrow the generated interval — pushed predicates never
  * reach a post-scan Filter), `SupportsPushDownRequiredColumns`
  * (readers materialize only the pruned columns), and
  * `SupportsPushDownTopN`/`SupportsPushDownLimit` (ORDER BY id
  * LIMIT k folds to a k-row read), and a partition-parallel reader
  * with zero driver-side materialization.
  *
  * The table is deterministic — row `id` ∈ [0, rows) with
  * `bucket = id % 97`, `hv` = the [[CrossHash]] affine family's
  * h₀(id), `tag = 't' || (id % 7)` — so a DuckDB `range()` twin
  * reproduces it exactly and the source sits behind the same oracle
  * gate as every file-based query (`source_dsv2`).
  *
  * Scale: `parts` contiguous slices of the (narrowed) interval; each
  * reader streams its slice with O(1) state. A 10^12-row table costs
  * the cluster only generation arithmetic — the pushdown-narrowed
  * interval is what executors actually iterate.
  */
class SyntheticV2Source extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-synth"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    SyntheticV2Source.schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table = {
    // DataFrameReader options are case-insensitive by convention;
    // `properties` is a plain map, so normalize before lookup or
    // .option("Rows", …) silently falls through to the default
    val opts = new CaseInsensitiveStringMap(properties)
    new SynthTable(
      rows = Option(opts.get("rows")).map(_.toLong).getOrElse(100000L),
      parts = Option(opts.get("parts")).map(_.toInt).getOrElse(8),
      keyed = Option(opts.get("keyed")).exists(_.toBoolean),
      rowsPerBatch = Option(opts.get("rowsPerBatch")).map(_.toLong)
        .getOrElse(0L))
  }
}

object SyntheticV2Source {
  /** Bucket modulus — also the partition count of the keyed layout. */
  val Buckets = 97

  /** Deterministic TABLESAMPLE membership: row `id` is in the sample
    * for `(lower, upper, seed)` iff the seed-indexed hash of id lands
    * in [⌊lower·P⌋, ⌊upper·P⌋) — an expected (upper−lower) fraction
    * of rows, but REPRODUCIBLE: the same seed yields the same sample
    * on any engine, any run, any partitioning (`df.sample(f, seed)`
    * against this source is oracle-checkable, which RNG sampling
    * never is). The hash composes the seed-indexed CrossHash affine
    * with a QUADRATIC mix (m² + 3m + 5 mod P): a plain affine strides
    * sequential ids around the field in runs (the classic lattice
    * artifact), while the quadratic step breaks the arithmetic
    * progression — and every intermediate stays < 2⁶² so both engines
    * compute it exactly in signed int64. Exposed so specs and the
    * DuckDB twin share the exact predicate.
    */
  def sampleSpec(lower: Double, upper: Double,
      seed: Long): (Long, Long, Int) =
    ((lower * CrossHash.P).toLong, (upper * CrossHash.P).toLong,
      java.lang.Math.floorMod(seed, 997L).toInt)

  def inSample(id: Long, spec: (Long, Long, Int)): Boolean = {
    val (loT, hiT, s) = spec
    val m = (CrossHash.coefA(s) * (id % CrossHash.P) + CrossHash.coefB(s)) %
      CrossHash.P
    val h = (m * m + 3L * m + 5L) % CrossHash.P // m < P ⇒ m² < 2⁶²
    h >= loT && h < hiT
  }

  val schema: StructType = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("bucket", LongType, nullable = false),
    StructField("hv", LongType, nullable = false),
    StructField("tag", StringType, nullable = false)))

  /** h₀(id) in the 31-bit prime field — (a·(id mod P) + b) mod P with
    * [[CrossHash]]'s coefficients: every product < 2^62, overflow-free
    * at any id. The DuckDB twin is `CrossHash.sqlAffine("id", 0)`.
    */
  def hv(id: Long): Long =
    (CrossHash.coefA(0) * (id % CrossHash.P) + CrossHash.coefB(0)) %
      CrossHash.P
}

private class SynthTable(rows: Long, parts: Int, keyed: Boolean,
    rowsPerBatch: Long = 0L)
    extends Table with SupportsRead {
  override def name(): String = s"graft_synth($rows)"
  override def schema(): StructType = SyntheticV2Source.schema
  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ, TableCapability.MICRO_BATCH_READ).asJava
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new SynthScanBuilder(rows, parts, keyed, rowsPerBatch)
}

/** Filter pushdown narrows [lo, hi); column pruning shrinks what the
  * readers compute. Only exact-narrowing `id` range predicates are
  * consumed (id IS the row index, so interval narrowing is lossless);
  * anything else is returned as residual for Spark to evaluate.
  * Filters speak the current DSv2 contract end-to-end —
  * `SupportsPushDownV2Filters` (connector `Predicate` trees), not the
  * legacy v1 `sources.Filter` translation.
  *
  * `ORDER BY id [ASC|DESC] LIMIT k` and bare `LIMIT k` are COMPLETELY
  * pushed ([[SupportsPushDownTopN]]/[[SupportsPushDownLimit]],
  * `isPartiallyPushed = false`): the source is ordered by `id` per
  * construction, so top-k folds to the closed-form k-row interval at
  * the matching end of [lo, hi) — Spark drops its Sort AND Limit
  * nodes entirely and the cluster reads k rows, not the table. This
  * is the contract that turns `ORDER BY id LIMIT 10` over 10^12 rows
  * into a 10-row read.
  */
private class SynthScanBuilder(rows: Long, parts: Int, keyed: Boolean,
    rowsPerBatch: Long = 0L)
    extends ScanBuilder
    with SupportsPushDownV2Filters with SupportsPushDownRequiredColumns
    with SupportsPushDownAggregates
    with SupportsPushDownLimit with SupportsPushDownTopN
    with SupportsPushDownOffset with SupportsPushDownTableSample
    with SupportsPushDownJoin {

  private var lo = 0L
  private var hi = rows
  private var pushed: Array[VPredicate] = Array.empty
  private var required: StructType = SyntheticV2Source.schema
  private var aggSpec: Option[(Boolean, Seq[String])] = None
  // Some(asc) once a top-N (ordered) truncation was pushed; a bare
  // limit truncates ascending but imposes no emission order
  private var topnAsc: Option[Boolean] = None
  private var limited = false
  private var offsetApplied = false
  private var sample: Option[(Long, Long, Int)] = None
  // after a pushed join: the output columns as (alias, base-column)
  // pairs, in order; None until a join is pushed
  private var joined: Option[Seq[(String, String)]] = None

  /** Current output columns as alias → base-generator-column pairs —
    * the identity mapping until a join aliases them.
    */
  private def curCols: Seq[(String, String)] =
    joined.getOrElse(
      SyntheticV2Source.schema.fieldNames.toSeq.map(n => n -> n))

  // saturating successor: `n + 1` on Long.MaxValue would wrap negative
  // and silently corrupt the consumed-filter narrowing (id >
  // Long.MaxValue must yield an EMPTY scan, id <= Long.MaxValue a
  // full one — both fall out of saturation since hi ≤ rows)
  private def succ(n: Long): Long =
    if (n == Long.MaxValue) Long.MaxValue else n + 1

  // resolves through the post-join alias map (identity before a join:
  // curCols starts as name → name), so ORDER BY on an aliased id
  // column still folds — both sides generate the identical id value
  private def isId(e: VExpression): Boolean = e match {
    case f: NamedReference => f.fieldNames.length == 1 &&
      curCols.exists { case (a, b) => a == f.fieldNames.head && b == "id" }
    case _ => false
  }

  // integral literals only: a fractional comparison reaches us as a
  // cast-wrapped tree that fails the NamedReference match anyway, but
  // be explicit — consuming a lossy literal would narrow wrongly
  private def litLong(e: VExpression): Option[Long] = e match {
    case l: Literal[_] => l.dataType() match {
      case ByteType | ShortType | IntegerType | LongType =>
        l.value() match {
          case n: Number => Some(n.longValue())
          case _ => None
        }
      case _ => None
    }
    case _ => None
  }

  /** Try to consume one predicate as an exact [lo, hi) narrowing.
    * Both operand orders are handled (`id > 5` and `5 < id` arrive as
    * mirrored trees with the operator NOT flipped by Spark).
    */
  private def consume(p: VPredicate): Boolean = {
    def binary(refLit: Long => Unit, litRef: Long => Unit): Boolean =
      p.children() match {
        case Array(a, b) if isId(a) =>
          litLong(b).exists { n => refLit(n); true }
        case Array(a, b) if isId(b) =>
          litLong(a).exists { n => litRef(n); true }
        case _ => false
      }
    p.name() match {
      case "=" => binary(
        n => { lo = math.max(lo, n); hi = math.min(hi, succ(n)) },
        n => { lo = math.max(lo, n); hi = math.min(hi, succ(n)) })
      case ">" => binary(
        n => lo = math.max(lo, succ(n)), // id > n
        n => hi = math.min(hi, n))       // n > id  ⇔  id < n
      case ">=" => binary(
        n => lo = math.max(lo, n),       // id >= n
        n => hi = math.min(hi, succ(n))) // n >= id ⇔  id <= n
      case "<" => binary(
        n => hi = math.min(hi, n),       // id < n
        n => lo = math.max(lo, succ(n))) // n < id  ⇔  id > n
      case "<=" => binary(
        n => hi = math.min(hi, succ(n)), // id <= n
        n => lo = math.max(lo, n))       // n <= id ⇔  id >= n
      // no column is nullable — vacuously true for every column
      case "IS_NOT_NULL" => true
      case _ => false
    }
  }

  override def pushPredicates(
      predicates: Array[VPredicate]): Array[VPredicate] = {
    val (accepted, residual) = predicates.partition(consume)
    pushed = accepted
    residual
  }

  override def pushedPredicates(): Array[VPredicate] = pushed

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  // --- limit / top-N pushdown: complete, closed-form. A bare LIMIT k
  // may return ANY k rows — truncate ascending. ORDER BY id LIMIT k
  // must return THE k extreme rows in order — truncate at the sorted
  // end and have the scan emit them in the sort direction (one k-row
  // partition; at k ≤ Int.MaxValue a single reader is the right
  // plan — parallelism over ≤2^31 generated rows is all overhead).
  private def truncate(k: Int, fromTop: Boolean): Unit = {
    if (hi <= lo) return // already empty; nothing to truncate
    val n = hi - lo // no overflow: 0 ≤ lo < hi ≤ rows
    if (n > k) { if (fromTop) lo = hi - k else hi = lo + k }
  }

  override def pushLimit(k: Int): Boolean =
    // under a pushed sample the surviving rows are no longer a dense
    // id interval, so truncation would under-return — decline and let
    // Spark keep its own limit (still correct, just not folded)
    if (sample.isDefined) false
    else {
      truncate(k, fromTop = false)
      limited = true
      true
    }

  override def pushTopN(orders: Array[SortOrder], k: Int): Boolean =
    orders.toSeq match {
      case Seq(o) if isId(o.expression()) && sample.isEmpty =>
        // null ordering is irrelevant: no column is nullable
        val asc = o.direction() == SortDirection.ASCENDING
        truncate(k, fromTop = !asc)
        topnAsc = Some(asc)
        true
      case _ => false
    }

  // --- join pushdown: the closed-form case a generated table really
  // has. An INNER equi-join of two synthetic scans on `id` is the
  // INTERVAL INTERSECTION [max(lo_l, lo_r), min(hi_l, hi_r)) — both
  // sides generate the identical row at a given id, so the joined row
  // is just the union of the two sides' (aliased) projections over
  // one id walk. Spark collapses the Join and both relations into ONE
  // scan: at 10^12 rows the "join" costs the same as the narrower of
  // the two scans, which is the whole promise of
  // SupportsPushDownJoin. Only claimed while both sides are plain
  // interval scans (no sample/top-N/limit/aggregate folded yet — each
  // of those breaks the dense-interval premise or the row identity).
  private def plainInterval: Boolean =
    aggSpec.isEmpty && sample.isEmpty && topnAsc.isEmpty && !limited

  override def isOtherSideCompatibleForJoin(
      other: SupportsPushDownJoin): Boolean = other match {
    case o: SynthScanBuilder => plainInterval && o.plainInterval
    case _ => false
  }

  override def pushDownJoin(other0: SupportsPushDownJoin,
      joinType: VJoinType,
      leftReq: Array[SupportsPushDownJoin.ColumnWithAlias],
      rightReq: Array[SupportsPushDownJoin.ColumnWithAlias],
      cond: VPredicate): Boolean = other0 match {
    case other: SynthScanBuilder
        if joinType == VJoinType.INNER_JOIN &&
          plainInterval && other.plainInterval =>
      val lmap = curCols.toMap
      val rmap = other.curCols.toMap
      // the ON condition must be exactly left-id = right-id (either
      // operand order). Its refs use the POST-alias output names
      // (Spark aliases duplicated names before translating the
      // condition — observed `id = id_1`), so resolve each ref
      // through the side's required-columns array back to that
      // side's base generator column, falling back to a direct
      // (pre-alias) name for the un-aliased side.
      def refName(e: VExpression): Option[String] = e match {
        case f: NamedReference if f.fieldNames.length == 1 =>
          Some(f.fieldNames.head)
        case _ => None
      }
      def baseOf(n: String,
          cs: Array[SupportsPushDownJoin.ColumnWithAlias],
          m: Map[String, String]): Option[String] =
        cs.find(c => Option(c.alias()).getOrElse(c.colName()) == n)
          .flatMap(c => m.get(c.colName()))
          .orElse(m.get(n))
      def idOf(n: String,
          cs: Array[SupportsPushDownJoin.ColumnWithAlias],
          m: Map[String, String]): Boolean =
        baseOf(n, cs, m).contains("id")
      val condOk = cond.name() == "=" && (cond.children() match {
        case Array(a, b) =>
          (refName(a), refName(b)) match {
            case (Some(x), Some(y)) =>
              (idOf(x, leftReq, lmap) && idOf(y, rightReq, rmap)) ||
                (idOf(y, leftReq, lmap) && idOf(x, rightReq, rmap))
            case _ => false
          }
        case _ => false
      })
      def out(cs: Array[SupportsPushDownJoin.ColumnWithAlias],
          m: Map[String, String]): Option[Seq[(String, String)]] = {
        val mapped = cs.toSeq.map { c =>
          m.get(c.colName()).map(base =>
            (Option(c.alias()).getOrElse(c.colName()), base))
        }
        if (mapped.forall(_.isDefined)) Some(mapped.flatten) else None
      }
      val outs =
        if (condOk) out(leftReq, lmap).zip(out(rightReq, rmap)) else None
      outs match {
          case Some((l, r)) =>
            lo = math.max(lo, other.lo)
            hi = math.min(hi, other.hi)
            joined = Some(l ++ r)
            val baseType = SyntheticV2Source.schema.fields
              .map(f => f.name -> f.dataType).toMap
            required = StructType((l ++ r).map { case (a, b) =>
              StructField(a, baseType(b), nullable = false)
            })
            true
          case None => false
        }
    case _ => false
  }

  // deterministic TABLESAMPLE (see [[SyntheticV2Source.sampleSpec]]):
  // readers skip non-members, Spark drops its Sample node entirely.
  // Only Bernoulli (without-replacement) sampling folds — a
  // with-replacement sample can emit a row twice, which a streaming
  // generator cannot
  override def pushTableSample(lower: Double, upper: Double,
      withReplacement: Boolean, seed: Long): Boolean =
    // declined after a pushed top-N/limit/offset: those folded their
    // k/o arithmetic on the DENSE interval premise, and correctness
    // must not depend on V2ScanRelationPushDown happening to push
    // Sample first (today's rule order — not a contract)
    if (withReplacement || topnAsc.isDefined || limited || offsetApplied)
      false
    else {
      sample = Some(SyntheticV2Source.sampleSpec(lower, upper, seed))
      true
    }

  // both pushdowns are exact — Spark must drop its Sort/Limit nodes
  override def isPartiallyPushed(): Boolean = false

  // OFFSET folds the same way: Spark's rule pushes the limit/top-N
  // FIRST (for `LIMIT k OFFSET o` it pushes limit k+o), then the
  // offset — so skipping the first o rows of the CURRENT result in
  // its emission order is always a further interval truncation:
  // ascending (or unordered) drops from the low end, a descending
  // top-N drops from the high end. Completes the pagination contract:
  // `ORDER BY id LIMIT k OFFSET o` over 10^12 rows reads k rows.
  override def pushOffset(o: Int): Boolean = {
    if (sample.isDefined) return false // same premise break as limit
    if (hi > lo) {
      val n = hi - lo // ≥ 1; no overflow (0 ≤ lo < hi)
      if (n <= o) hi = lo // offset swallowed the whole result
      else if (topnAsc.contains(false)) hi -= o
      else lo += o
    }
    offsetApplied = true
    true
  }

  // --- aggregate pushdown: COUNT / MIN(id) / MAX(id), no grouping.
  // The row domain is the CLOSED FORM [lo, hi) after filter pushdown
  // (Spark pushes filters before aggregates in V2ScanRelationPushDown),
  // so these fold to arithmetic — the scan emits ONE row and reads
  // nothing, the strongest pushdown a source can offer. Only complete
  // pushdown is claimed (partial would return per-partition rows for
  // Spark to re-merge — pointless when the closed form is exact).
  private def classify(agg: Aggregation): Option[(Boolean, Seq[String])] = {
    def isField(e: org.apache.spark.sql.connector.expressions.Expression,
        name: String) = e match {
      case f: NamedReference => f.fieldNames.sameElements(Array(name))
      case _ => false
    }
    // a pushed sample breaks the dense-interval premise of the
    // closed forms; after a pushed join the aggregate refs are
    // post-alias names whose closed forms we decline to re-derive —
    // fall back to the row scan either way (readers generate, Spark
    // aggregates)
    if (sample.isDefined || joined.isDefined) return None
    // grouping is supported exactly on `bucket` — residue classes of
    // [lo, hi) are as closed-form as the global fold
    val grouped = agg.groupByExpressions().toSeq match {
      case Seq() => Some(false)
      case Seq(g) if isField(g, "bucket") => Some(true)
      case _ => None
    }
    grouped.flatMap { g =>
      val ts: Seq[Option[String]] = agg.aggregateExpressions().toSeq.map {
        case _: CountStar => Some("count")
        // every column is non-nullable and count(lit) counts rows, so
        // any non-distinct COUNT over a column or literal is COUNT(*)
        case c: Count if !c.isDistinct && (c.column() match {
          case _: NamedReference | _: Literal[_] => true
          case _ => false
        }) => Some("count")
        case m: Min if isField(m.column(), "id") => Some("min")
        case m: Max if isField(m.column(), "id") => Some("max")
        case _ => None
      }
      if (ts.forall(_.isDefined)) Some((g, ts.flatten)) else None
    }
  }

  override def supportCompletePushDown(agg: Aggregation): Boolean =
    classify(agg).isDefined

  override def pushAggregation(agg: Aggregation): Boolean =
    classify(agg) match {
      case Some(spec) => aggSpec = Some(spec); true
      case None => false
    }

  override def build(): Scan = aggSpec match {
    case Some((grouped, ts)) => new SynthAggScan(lo, hi, ts, grouped)
    case None =>
      // post-join the output names are aliases; readers generate from
      // the BASE column each alias stands for (identity pre-join)
      val aliasToBase = curCols.toMap
      val baseFields = required.fieldNames.map(n =>
        aliasToBase.getOrElse(n, n))
      new SynthScan(lo, hi, parts, required, baseFields,
        // key-grouped layout is only reportable while the key survives
        // column pruning — a bucketless projection falls back to plain
        // contiguous slices. An ordered (top-N) scan emits one sorted
        // slice instead, so it never claims the keyed layout; a pushed
        // join drops it too (the output is alias-renamed). A bare
        // limit keeps the layout: the truncated interval's residue
        // classes are still exactly the scan's rows.
        keyed && required.fieldNames.contains("bucket") &&
          topnAsc.isEmpty && joined.isEmpty,
        topnAsc, sample, rowsPerBatch)
  }
}

private class SynthScan(lo: Long, hi: Long, parts: Int,
    required: StructType, baseFields: Array[String], keyed: Boolean,
    order: Option[Boolean] = None,
    sample: Option[(Long, Long, Int)] = None,
    rowsPerBatch: Long = 0L)
    extends Scan with Batch with SupportsReportPartitioning
    with SupportsRuntimeFiltering with SupportsReportStatistics {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this

  /** MICRO_BATCH_READ: the same generated interval as an exactly-once
    * stream — see [[SynthMicroBatchStream]]. The streaming persona
    * always plans plain contiguous slices (keyed/top-N are batch
    * personas; neither layout claim survives micro-batch replanning).
    */
  override def toMicroBatchStream(checkpointLocation: String)
      : org.apache.spark.sql.connector.read.streaming.MicroBatchStream =
    new SynthMicroBatchStream(lo, hi, parts, baseFields, sample,
      rowsPerBatch)

  /** EXACT post-pushdown statistics (a generated interval knows its
    * own cardinality; a pushed sample scales it by the claimed
    * fraction). This is what lets Catalyst pick a broadcast join for
    * a small synthetic side WITHOUT a hint — a DSv2 relation with no
    * reported stats is costed at the conservative default and never
    * auto-broadcasts, which at 100 TB turns every dimension join into
    * a shuffle.
    *
    * The KEYED layout deliberately reports NOTHING: it is the
    * fact-table persona whose whole point is exchange-free
    * storage-partitioned joins — letting a test-sized keyed scan cost
    * as "small" would flip those plans to broadcast and erase the SPJ
    * surface the layout exists to exercise (at production scale the
    * keyed side is never broadcast-eligible anyway).
    */
  override def estimateStatistics(): Statistics = new Statistics {
    private val known = !keyed
    private val rows: Long = {
      val n = math.max(0L, hi - lo)
      sample match {
        case Some((loT, hiT, _)) =>
          // expected fraction of the hash range; exact enough for
          // costing (the true count needs the walk)
          (n.toDouble * math.max(0L, hiT - loT) / CrossHash.P.toDouble)
            .toLong
        case None => n
      }
    }
    // 8 bytes per long column; tag is 2-3 chars (+ offset bookkeeping)
    private val rowBytes: Long = required.fields.map(f =>
      if (f.dataType == StringType) 12L else 8L).sum.max(1L)
    override def numRows(): util.OptionalLong =
      if (known) util.OptionalLong.of(rows) else util.OptionalLong.empty()
    override def sizeInBytes(): util.OptionalLong =
      if (known) util.OptionalLong.of(rows * rowBytes)
      else util.OptionalLong.empty()
  }
  override def description(): String =
    s"GraftSynth(lo=$lo, hi=$hi, parts=$parts, keyed=$keyed, " +
      order.map(a => s"order=${if (a) "asc" else "desc"}, ").getOrElse("") +
      sample.map(s => s"sample=[${s._1},${s._2})@${s._3}, ").getOrElse("") +
      s"cols=${required.fieldNames.mkString(",")}" +
      (if (baseFields.sameElements(required.fieldNames)) ""
       else s" <- ${baseFields.mkString(",")}") + ")"

  // --- runtime filtering: the DSv2 dynamic-partition-pruning contract.
  // Declaring `bucket` filterable makes Spark's PartitionPruning rule
  // plant a DynamicPruningSubquery on joins keyed by it; after the
  // build side executes, `filter()` receives the surviving key set and
  // the keyed layout re-plans to ONLY those residue-class partitions —
  // the v2 equivalent of a partitioned table skipping directories. At
  // a 10^12-row table joined to a selective dimension this is the
  // difference between reading 97 partitions and reading the 3 the
  // probe actually needs. Only the keyed layout declares the
  // attribute: contiguous id-slices each contain every residue class,
  // so bucket pruning cannot drop any of them (an In(id) filter could,
  // but Spark only plants runtime filters on join keys, and id-keyed
  // joins against this source are equi-range already).
  private var allowedBuckets: Option[Set[Long]] = None

  override def filterAttributes(): Array[NamedReference] =
    if (keyed) Array(Expressions.column("bucket")) else Array.empty

  override def filter(filters: Array[Filter]): Unit = filters.foreach {
    case In("bucket", vs) =>
      val keep = vs.iterator.collect { case n: Number => n.longValue() }.toSet
      allowedBuckets = Some(allowedBuckets.fold(keep)(_ intersect keep))
    case EqualTo("bucket", v: Number) =>
      val keep = Set(v.longValue())
      allowedBuckets = Some(allowedBuckets.fold(keep)(_ intersect keep))
    case _ => () // best-effort contract: unrecognized filters are
    // ignored; Spark still applies the join predicate itself
  }

  override def planInputPartitions(): Array[InputPartition] = {
    // compare BEFORE subtracting: contradictory pushed bounds at
    // extreme magnitudes (id > 9e18 AND id < -9e18) make `hi - lo`
    // underflow Long and wrap positive — the scan must be empty
    if (hi <= lo) return Array.empty
    order match {
      // fully-pushed top-N: ONE slice of ≤k rows emitted in the sort
      // direction — Spark already dropped its Sort and Limit, so the
      // emission order IS the result order
      case Some(asc) =>
        // carry `sample` through (today always None here — pushTopN
        // declines under a sample and pushTableSample declines after a
        // top-N — but the slice must not silently un-sample if either
        // guard ever loosens)
        return Array(
          SynthSlice(lo, hi, baseFields, desc = !asc, sample = sample))
      case None => ()
    }
    if (keyed) {
      // one partition per bucket residue class: the physical layout a
      // bucket-keyed storage source would have. Every partition knows
      // its key (HasPartitionKey), so Spark's key-grouped machinery
      // can satisfy a clustered distribution on `bucket` without any
      // exchange — the DSv2 equivalent of a bucketed table.
      return (0 until SyntheticV2Source.Buckets)
        .filter(b => allowedBuckets.forall(_.contains(b.toLong)))
        .map { b =>
          KeyedSynthSlice(b, lo, hi, baseFields, sample): InputPartition
        }.toArray
    }
    val n = hi - lo
    val k = math.max(1, parts)
    // contiguous slices, remainder spread over the first (n % k)
    // partitions; `n / k * i` never overflows (≤ n ≤ Long.MaxValue),
    // unlike the naive `i * n / k`
    (0 until k).map { i =>
      val start = lo + n / k * i + math.min(i.toLong, n % k)
      val end = lo + n / k * (i + 1) + math.min(i + 1L, n % k)
      SynthSlice(start, end, baseFields, sample = sample): InputPartition
    }.filter { case s: SynthSlice => s.end > s.start }.toArray
  }

  override def outputPartitioning(): Partitioning =
    if (order.isDefined) new UnknownPartitioning(1)
    else if (keyed)
      new KeyGroupedPartitioning(
        Array(Expressions.identity("bucket")), SyntheticV2Source.Buckets)
    else new UnknownPartitioning(math.max(1, parts))

  override def createReaderFactory(): PartitionReaderFactory =
    new PartitionReaderFactory {
      override def createReader(p: InputPartition): PartitionReader[InternalRow] =
        p match {
          case s: SynthSlice => new SynthReader(s)
          case k: KeyedSynthSlice => new KeyedSynthReader(k)
        }
      // plain interval slices generate COLUMNAR batches: values land
      // directly in column vectors, and the scan exec's vectorized
      // ColumnarToRow loop replaces one virtual next()/get() call
      // pair per row — the same reason Parquet reads are vectorized.
      // The keyed layout keeps the row path (its per-bucket readers
      // are the SPJ/DPP test surface, exercised both ways).
      override def supportColumnarReads(p: InputPartition): Boolean =
        p.isInstanceOf[SynthSlice]
      override def createColumnarReader(
          p: InputPartition): PartitionReader[ColumnarBatch] = p match {
        case s: SynthSlice => new SynthColumnarReader(s)
        case other => throw new UnsupportedOperationException(
          s"no columnar reader for $other")
      }
    }
}

private case class SynthSlice(start: Long, end: Long,
    fields: Array[String], desc: Boolean = false,
    sample: Option[(Long, Long, Int)] = None) extends InputPartition

/** All ids ≡ `bucket` (mod Buckets) within [lo, hi) — one residue
  * class, the unit of the key-grouped layout.
  */
private case class KeyedSynthSlice(bucket: Int, lo: Long, hi: Long,
    fields: Array[String],
    sample: Option[(Long, Long, Int)] = None)
    extends InputPartition with HasPartitionKey {
  override def partitionKey(): InternalRow =
    InternalRow(bucket.toLong)
}

private object SynthRow {
  /** Materialize one row of the pruned schema at `id`. */
  def at(id: Long, fields: Array[String]): InternalRow = {
    val vals: Array[Any] = fields.map {
      case "id" => id
      case "bucket" => id % SyntheticV2Source.Buckets
      case "hv" => SyntheticV2Source.hv(id)
      case "tag" => UTF8String.fromString("t" + (id % 7))
    }
    InternalRow.fromSeq(vals.toSeq)
  }
}

/** Streams one slice — ascending, or descending when the slice came
  * from a fully-pushed descending top-N; O(1) state, computes only
  * the pruned columns. The descending walk starts at end (not
  * end − 1) so the pre-increment style stays symmetric, and start >
  * Long.MinValue is guaranteed (start ≥ 0 always).
  */
private class SynthReader(slice: SynthSlice)
    extends PartitionReader[InternalRow] {
  private var id = if (slice.desc) slice.end else slice.start - 1

  private def step(): Boolean =
    if (slice.desc) { id -= 1; id >= slice.start }
    else { id += 1; id < slice.end }

  override def next(): Boolean = {
    // pushed TABLESAMPLE: stream past non-members; still O(1) state
    while (step()) {
      if (slice.sample.forall(SyntheticV2Source.inSample(id, _)))
        return true
    }
    false
  }
  override def get(): InternalRow = SynthRow.at(id, slice.fields)
  override def close(): Unit = ()
}

/** Columnar twin of [[SynthReader]]: fills 4096-row on-heap column
  * vectors (reused across batches) honoring the same pushed sample /
  * descending order. Per-column filler closures hoist the field
  * dispatch out of the per-cell loop. A fully-pruned projection
  * (zero columns, e.g. an unpushable COUNT over a sampled scan)
  * yields batches that carry only a row count — the contract allows
  * it and the scan exec counts them without touching data.
  */
private class SynthColumnarReader(slice: SynthSlice)
    extends PartitionReader[ColumnarBatch] {
  private val BatchRows = 4096
  private val cols = OnHeapColumnVector.allocateColumns(BatchRows,
    StructType(slice.fields.map(n => StructField(n,
      if (n == "tag") StringType else LongType, nullable = false))))
  private val batch = new ColumnarBatch(cols.asInstanceOf[Array[ColumnVector]])
  private val fillers: Array[(Int, Long) => Unit] =
    slice.fields.zipWithIndex.map { case (f, c) =>
      f match {
        case "id" => (n: Int, id: Long) => cols(c).putLong(n, id)
        case "bucket" => (n: Int, id: Long) =>
          cols(c).putLong(n, id % SyntheticV2Source.Buckets)
        case "hv" => (n: Int, id: Long) =>
          cols(c).putLong(n, SyntheticV2Source.hv(id))
        case "tag" => (n: Int, id: Long) => {
          val b = ("t" + (id % 7)).getBytes("UTF-8")
          cols(c).putByteArray(n, b, 0, b.length)
          ()
        }
      }
    }
  private var id = if (slice.desc) slice.end else slice.start - 1

  private def step(): Boolean =
    if (slice.desc) { id -= 1; id >= slice.start }
    else { id += 1; id < slice.end }

  override def next(): Boolean = {
    var i = 0
    while (i < cols.length) { cols(i).reset(); i += 1 }
    var n = 0
    while (n < BatchRows && step()) {
      if (slice.sample.forall(SyntheticV2Source.inSample(id, _))) {
        var c = 0
        while (c < fillers.length) { fillers(c)(n, id); c += 1 }
        n += 1
      }
    }
    batch.setNumRows(n)
    n > 0
  }
  override def get(): ColumnarBatch = batch
  override def close(): Unit = batch.close()
}

/** The completely-pushed aggregate scan: one partition, zero data
  * read — COUNT/MIN/MAX over [lo, hi), global or per bucket residue
  * class, are closed-form. The global fold emits ONE row (MIN/MAX
  * null when the pushed filters emptied the range — SQL empty-
  * aggregate semantics); the grouped fold emits one row per NONEMPTY
  * class (SQL group-by emits no row for an empty group), group key
  * leading, in bucket order.
  */
private class SynthAggScan(lo: Long, hi: Long, aggs: Seq[String],
    grouped: Boolean) extends Scan with Batch {

  override def readSchema(): StructType = {
    val aggFields = aggs.zipWithIndex.map { case (t, i) =>
      StructField(s"agg_$i", LongType,
        nullable = t != "count" && !grouped)
    }
    StructType(
      if (grouped) StructField("bucket", LongType, nullable = false) +:
        aggFields
      else aggFields)
  }
  override def toBatch: Batch = this
  override def planInputPartitions(): Array[InputPartition] =
    Array(AggResultPartition(lo, hi, aggs, grouped))
  override def createReaderFactory(): PartitionReaderFactory =
    AggReaderFactory
}

private case class AggResultPartition(lo: Long, hi: Long,
    aggs: Seq[String], grouped: Boolean) extends InputPartition

private object AggReaderFactory extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] =
    new PartitionReader[InternalRow] {
      private val part = p.asInstanceOf[AggResultPartition]
      private val m = SyntheticV2Source.Buckets.toLong

      // (bucket, first, last, count) per nonempty residue class — or
      // one global row with bucket = -1. All arithmetic overflow-safe:
      // rem <= 96 is only added to lo after the emptiness guard
      // bounds it by hi - 1 - lo
      private val rows: Seq[Array[Any]] = {
        val n = math.max(0L, part.hi - part.lo)
        def fold(first: Long, last: Long, count: Long): Seq[Any] =
          part.aggs.map {
            case "count" => count
            case "min" => if (count > 0) first else null
            case "max" => if (count > 0) last else null
          }
        if (!part.grouped)
          Seq((fold(part.lo, part.hi - 1, n)).toArray)
        else if (n == 0) Seq.empty
        else (0L until m).flatMap { b =>
          val rem = ((b - part.lo % m) % m + m) % m
          if (rem > part.hi - 1 - part.lo) None
          else {
            val first = part.lo + rem
            val count = (part.hi - 1 - first) / m + 1
            val last = first + (count - 1) * m
            Some((b +: fold(first, last, count)).toArray)
          }
        }
      }
      private var i = -1
      override def next(): Boolean = { i += 1; i < rows.size }
      override def get(): InternalRow = InternalRow.fromSeq(rows(i).toSeq)
      override def close(): Unit = ()
    }
}

/** Streams one residue class, striding by the bucket modulus; O(1)
  * state like the contiguous reader.
  */
private class KeyedSynthReader(slice: KeyedSynthSlice)
    extends PartitionReader[InternalRow] {
  private val m = SyntheticV2Source.Buckets
  // first id >= lo with id % m == bucket (Scala % is signed — the
  // double-mod form stays correct for negative lo)
  private var id = slice.lo +
    (((slice.bucket - slice.lo % m) % m + m) % m) - m

  override def next(): Boolean = {
    while (true) {
      // saturate like the contiguous path's succ(): near Long.MaxValue
      // `id + m` would wrap negative, keep `id < hi` true forever, and
      // stream out-of-range ids — stop instead (id + m > MaxValue >= hi
      // implies past-the-end anyway)
      if (id > Long.MaxValue - m) return false
      id += m
      if (id >= slice.hi) return false
      if (slice.sample.forall(SyntheticV2Source.inSample(id, _)))
        return true
    }
    false // unreachable
  }
  override def get(): InternalRow = SynthRow.at(id, slice.fields)
  override def close(): Unit = ()
}

/** Offset = position in the generated id interval: the committed log
  * position IS the next id to emit. JSON round-trips a bare long.
  */
private case class SynthStreamOffset(pos: Long)
    extends org.apache.spark.sql.connector.read.streaming.Offset {
  override def json(): String = pos.toString
}

/** The generated interval [lo, hi) as an exactly-once micro-batch
  * stream — the streaming half of the connector contract
  * (`MICRO_BATCH_READ`), with ADMISSION CONTROL and
  * `Trigger.AvailableNow` support:
  *
  *  - offsets are interval positions ([[SynthStreamOffset]]), so a
  *    batch is the id slice [start, end) — deterministic, replayable,
  *    and trivially resumable: restart from a checkpoint continues at
  *    the committed position with no duplicates and no gaps (the
  *    exactly-once property a file/Kafka source gets from its log,
  *    here from the closed-form generator);
  *  - `rowsPerBatch` (option) bounds each micro-batch via
  *    [[ReadLimit.maxRows]] — the source-side rate limiting contract
  *    ([[SupportsAdmissionControl]]), honored by the engine for every
  *    trigger including AvailableNow. 0 = unthrottled (one batch
  *    drains the interval). Under a pushed sample the cap bounds the
  *    id RANGE walked per batch, not the rows emitted — admission
  *    control caps work per trigger, which is the point;
  *  - [[SupportsTriggerAvailableNow]] is trivially safe here: the
  *    interval end is static, so the bound captured at query start
  *    (`hi`) never moves — `prepareForTriggerAvailableNow` has
  *    nothing to snapshot.
  *
  * Batches plan the same contiguous `parts`-way slices as the batch
  * scan, read by the same O(1)-state row readers — pruned columns and
  * pushed id-range filters narrow the streamed interval exactly like
  * the batch path.
  */
private class SynthMicroBatchStream(lo: Long, hi: Long, parts: Int,
    baseFields: Array[String], sample: Option[(Long, Long, Int)],
    rowsPerBatch: Long)
    extends org.apache.spark.sql.connector.read.streaming.MicroBatchStream
    with org.apache.spark.sql.connector.read.streaming.SupportsTriggerAvailableNow {
  import org.apache.spark.sql.connector.read.streaming.{Offset => SOffset, ReadLimit, ReadMaxRows}

  private def pos(o: SOffset): Long = o match {
    case SynthStreamOffset(p) => p
    case other => other.json().toLong // engine-deserialized twin
  }

  override def initialOffset(): SOffset = SynthStreamOffset(lo)

  override def deserializeOffset(json: String): SOffset =
    SynthStreamOffset(json.toLong)

  override def getDefaultReadLimit: ReadLimit =
    if (rowsPerBatch > 0L) ReadLimit.maxRows(rowsPerBatch)
    else ReadLimit.allAvailable()

  // admission-controlled planning: the engine always calls the 2-arg
  // form on a SupportsAdmissionControl source
  override def latestOffset(): SOffset =
    throw new UnsupportedOperationException(
      "latestOffset(start, limit) is used (SupportsAdmissionControl)")

  override def latestOffset(start: SOffset, limit: ReadLimit): SOffset = {
    val s = pos(start)
    val cap = limit match {
      case mr: ReadMaxRows =>
        // saturating: lo near Long.MaxValue must not wrap
        if (s > Long.MaxValue - mr.maxRows()) Long.MaxValue
        else s + mr.maxRows()
      case _ => hi
    }
    SynthStreamOffset(math.max(s, math.min(hi, cap)))
  }

  override def reportLatestOffset(): SOffset = SynthStreamOffset(hi)

  override def prepareForTriggerAvailableNow(): Unit = () // hi is static

  override def planInputPartitions(start: SOffset,
      end: SOffset): Array[InputPartition] = {
    val s = math.max(lo, pos(start))
    val e = math.min(hi, pos(end))
    if (e <= s) return Array.empty
    val n = e - s
    val k = math.max(1, parts)
    (0 until k).map { i =>
      val a = s + n / k * i + math.min(i.toLong, n % k)
      val b = s + n / k * (i + 1) + math.min(i + 1L, n % k)
      SynthSlice(a, b, baseFields, sample = sample): InputPartition
    }.filter { case sl: SynthSlice => sl.end > sl.start }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new PartitionReaderFactory {
      override def createReader(
          p: InputPartition): PartitionReader[InternalRow] = p match {
        case s: SynthSlice => new SynthReader(s)
        case other => throw new UnsupportedOperationException(
          s"unexpected streaming partition: $other")
      }
    }

  override def commit(end: SOffset): Unit = () // nothing to release

  override def stop(): Unit = ()
}
