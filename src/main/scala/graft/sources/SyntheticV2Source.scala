package graft.sources

import java.util

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, SupportsPushDownFilters, SupportsPushDownRequiredColumns}
import org.apache.spark.sql.sources.{DataSourceRegister, EqualTo, Filter, GreaterThan, GreaterThanOrEqual, IsNotNull, LessThan, LessThanOrEqual}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

import graft.functions.CrossHash

/** DataSource V2 synthetic table — the custom-source integration path
  * of the engine, exercising the full connector read surface: a
  * `TableProvider` returning a batch-readable `Table`, a `ScanBuilder`
  * that REALLY honors `SupportsPushDownFilters` (range predicates on
  * `id` narrow the generated interval — pushed filters never reach a
  * post-scan Filter) and `SupportsPushDownRequiredColumns` (readers
  * materialize only the pruned columns), and a partition-parallel
  * reader with zero driver-side materialization.
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
      parts = Option(opts.get("parts")).map(_.toInt).getOrElse(8))
  }
}

object SyntheticV2Source {
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

private class SynthTable(rows: Long, parts: Int)
    extends Table with SupportsRead {
  override def name(): String = s"graft_synth($rows)"
  override def schema(): StructType = SyntheticV2Source.schema
  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ).asJava
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new SynthScanBuilder(rows, parts)
}

/** Filter pushdown narrows [lo, hi); column pruning shrinks what the
  * readers compute. Only exact-narrowing `id` range predicates are
  * consumed (id IS the row index, so interval narrowing is lossless);
  * anything else is returned as residual for Spark to evaluate.
  */
private class SynthScanBuilder(rows: Long, parts: Int)
    extends ScanBuilder
    with SupportsPushDownFilters with SupportsPushDownRequiredColumns {

  private var lo = 0L
  private var hi = rows
  private var pushed: Array[Filter] = Array.empty
  private var required: StructType = SyntheticV2Source.schema

  private def num(v: Any): Option[Long] = v match {
    case n: Number => Some(n.longValue())
    case _ => None
  }

  // saturating successor: `n + 1` on Long.MaxValue would wrap negative
  // and silently corrupt the consumed-filter narrowing (id >
  // Long.MaxValue must yield an EMPTY scan, id <= Long.MaxValue a
  // full one — both fall out of saturation since hi ≤ rows)
  private def succ(n: Long): Long =
    if (n == Long.MaxValue) Long.MaxValue else n + 1

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (accepted, residual) = filters.partition {
      case EqualTo("id", v) => num(v).exists { n => lo = math.max(lo, n); hi = math.min(hi, succ(n)); true }
      case GreaterThan("id", v) => num(v).exists { n => lo = math.max(lo, succ(n)); true }
      case GreaterThanOrEqual("id", v) => num(v).exists { n => lo = math.max(lo, n); true }
      case LessThan("id", v) => num(v).exists { n => hi = math.min(hi, n); true }
      case LessThanOrEqual("id", v) => num(v).exists { n => hi = math.min(hi, succ(n)); true }
      case IsNotNull(_) => true // no column is nullable — vacuously true
      case _ => false
    }
    pushed = accepted
    residual
  }

  override def pushedFilters(): Array[Filter] = pushed

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def build(): Scan = new SynthScan(lo, hi, parts, required)
}

private class SynthScan(lo: Long, hi: Long, parts: Int,
    required: StructType) extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"GraftSynth(lo=$lo, hi=$hi, parts=$parts, " +
      s"cols=${required.fieldNames.mkString(",")})"

  override def planInputPartitions(): Array[InputPartition] = {
    // compare BEFORE subtracting: contradictory pushed bounds at
    // extreme magnitudes (id > 9e18 AND id < -9e18) make `hi - lo`
    // underflow Long and wrap positive — the scan must be empty
    if (hi <= lo) return Array.empty
    val n = hi - lo
    val k = math.max(1, parts)
    // contiguous slices, remainder spread over the first (n % k)
    // partitions; `n / k * i` never overflows (≤ n ≤ Long.MaxValue),
    // unlike the naive `i * n / k`
    (0 until k).map { i =>
      val start = lo + n / k * i + math.min(i.toLong, n % k)
      val end = lo + n / k * (i + 1) + math.min(i + 1L, n % k)
      SynthSlice(start, end, required.fieldNames): InputPartition
    }.filter { case s: SynthSlice => s.end > s.start }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new PartitionReaderFactory {
      override def createReader(p: InputPartition): PartitionReader[InternalRow] =
        new SynthReader(p.asInstanceOf[SynthSlice])
    }
}

private case class SynthSlice(start: Long, end: Long,
    fields: Array[String]) extends InputPartition

/** Streams one slice; O(1) state, computes only the pruned columns. */
private class SynthReader(slice: SynthSlice)
    extends PartitionReader[InternalRow] {
  private var id = slice.start - 1

  override def next(): Boolean = { id += 1; id < slice.end }

  override def get(): InternalRow = {
    val vals: Array[Any] = slice.fields.map {
      case "id" => id
      case "bucket" => id % 97
      case "hv" => SyntheticV2Source.hv(id)
      case "tag" => UTF8String.fromString("t" + (id % 7))
    }
    InternalRow.fromSeq(vals.toSeq)
  }

  override def close(): Unit = ()
}
