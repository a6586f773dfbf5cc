package graft.sources

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.expressions.{Expression => VExpression, NamedReference}
import org.apache.spark.sql.connector.expressions.aggregate.{AggregateFunc, Aggregation, Count, CountStar, Max, Min}
import org.apache.spark.sql.connector.read.{LocalScan, Scan}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** AGGREGATE PUSHDOWN for manifest tables: COUNT(*) / COUNT(col) /
  * MIN(col) / MAX(col), optionally grouped by partition columns, are
  * answered from the manifest's per-file metadata ALONE — the `R|`
  * row counts, `S|` min/max stats, `N|` null counts, `P|` partition
  * values and `V|` deletion-vector counts recorded at publish — so
  * `SELECT count(*) FROM t` over a 100 TB table reads ZERO data
  * files and the Aggregate node is erased from the plan (complete
  * DSv2 pushdown, the Iceberg/Delta metadata-aggregate shape).
  *
  * EXACTNESS RULES — pushdown is claimed only when metadata proves
  * the answer, and declines to the row scan otherwise:
  *  - any pushed filter, or any tombstone (key-delete) entry →
  *    decline everything (masked rows are not countable from file
  *    metadata);
  *  - COUNT(*): every entry needs a recorded row count; deletion
  *    vectors subtract exactly (their position counts are exact);
  *  - COUNT(col): per entry, either the column is a recorded
  *    partition value (NULL partition ⇒ 0, else all live rows), or
  *    the entry is DV-free with a recorded null count (a DV's
  *    deleted rows have unknown nullness). Double columns
  *    additionally require a ZERO null count: the writer counts NaN
  *    as null for stats purposes, but SQL COUNT counts NaN;
  *  - MIN/MAX(col): per entry, either the column is a recorded
  *    partition value with ≥1 live row, or the entry is DV-free
  *    (a DV may have deleted the extreme row) with exact `S|`
  *    bounds — or provably all-NULL (contributes nothing). String
  *    bounds are TRUNCATED (`T|`) and never used. Doubles require
  *    the zero-null proof (NaN is MAX in Spark's ordering but is
  *    excluded from written stats);
  *  - GROUP BY: every grouping expression must be a column whose
  *    partition value is recorded on EVERY entry (each file belongs
  *    wholly to one group).
  *
  * Matches SyntheticV2Source's aggregate fold (SyntheticV2Source
  * .scala:418+) one layer up: there the closed form is arithmetic on
  * a generated interval; here it is a fold over write-time file
  * statistics. Reference scope: the reference's status endpoint
  * (src/app.js:170-186) serves table-level counts; this serves them
  * without scanning.
  */
private[sources] object ManifestAggPushdown {

  private sealed trait AggOp
  private case object CountStarOp extends AggOp
  private final case class CountColOp(col: String) extends AggOp
  private final case class MinOp(col: String) extends AggOp
  private final case class MaxOp(col: String) extends AggOp

  private def fieldName(e: VExpression): Option[String] = e match {
    case f: NamedReference if f.fieldNames.length == 1 =>
      Some(f.fieldNames.head)
    case _ => None
  }

  /** Try to answer `agg` from manifest metadata. Some((schema, rows))
    * = complete pushdown with the scan's output; None = decline (the
    * row scan + Spark's own Aggregate stay, always correct).
    */
  def tryPlan(path: String, schema: StructType, branch: Option[String],
      asOfVersion: Option[Int], hasFilters: Boolean,
      agg: Aggregation): Option[(StructType, Array[InternalRow])] = {
    if (hasFilters) return None
    val entries =
      try ManifestV2Sink.entriesFor(path, branch, asOfVersion)
      catch { case _: IllegalArgumentException => return None }
    if (entries.exists(ManifestV2Sink.isDeleteEntry)) return None

    // ---- classify the aggregate shape first (cheap, no entry math)
    val groupCols: Seq[String] = agg.groupByExpressions().toSeq.map {
      g => fieldName(g).getOrElse(return None)
    }
    val ops: Seq[AggOp] = agg.aggregateExpressions().toSeq.map {
      case _: CountStar => CountStarOp
      case c: Count if !c.isDistinct =>
        fieldName(c.column()).map(CountColOp).getOrElse(return None)
      case m: Min =>
        fieldName(m.column()).map(MinOp).getOrElse(return None)
      case m: Max =>
        fieldName(m.column()).map(MaxOp).getOrElse(return None)
      case _ => return None
    }
    val fieldOf: Map[String, StructField] =
      schema.fields.map(f => f.name -> f).toMap
    (groupCols ++ ops.collect {
      case CountColOp(c) => c; case MinOp(c) => c; case MaxOp(c) => c
    }).foreach(c => if (!fieldOf.contains(c)) return None)
    // group columns must be of a partition-renderable type
    groupCols.foreach(c => fieldOf(c).dataType match {
      case LongType | IntegerType | DateType | BooleanType |
           StringType =>
      case _ => return None
    })

    // ---- per-entry metadata (every entry must be fully described)
    val meta = entries.map { e =>
      val rows = ManifestV2Sink.entryRowsBytes(e)
        .map(_._1).getOrElse(return None)
      val dv = ManifestV2Sink.entryDv(e).map(_._2).getOrElse(0L)
      (e, rows, math.max(0L, rows - dv), dv,
        ManifestV2Sink.entryPartition(e))
    }
    if (!groupCols.forall(c => meta.forall(_._5.contains(c))))
      return None

    def parsePart(raw: String, dt: DataType): Any =
      if (raw == "%00") null
      else dt match {
        case LongType => raw.toLong
        case IntegerType | DateType => raw.toInt
        case BooleanType => raw.toBoolean
        case StringType =>
          UTF8String.fromString(ManifestV2Sink.unescapePart(raw))
        case _ => return null // unreachable: types gated above
      }

    // the min/max comparison domain: BigDecimal for every numeric
    // (exact, mirrors ManifestSkipping), UTF8String binary order for
    // strings, Booleans as false < true
    def cmpLess(a: Any, b: Any): Boolean = (a, b) match {
      case (x: BigDecimal, y: BigDecimal) => x < y
      case (x: UTF8String, y: UTF8String) => x.compareTo(y) < 0
      case (x: Boolean, y: Boolean) => !x && y
      case _ => false
    }
    def partToCmp(raw: String, dt: DataType): Option[Any] =
      if (raw == "%00") None
      else dt match {
        case LongType | IntegerType | DateType =>
          scala.util.Try(BigDecimal(raw.toLong)).toOption
        case BooleanType => Some(raw.toBoolean)
        case StringType =>
          Some(UTF8String.fromString(ManifestV2Sink.unescapePart(raw)))
        case _ => None
      }
    def cmpToCatalyst(v: Any, dt: DataType): Any = (v, dt) match {
      case (null, _) => null
      case (bd: BigDecimal, LongType | TimestampType) => bd.toLong
      case (bd: BigDecimal, IntegerType | DateType) => bd.toInt
      case (bd: BigDecimal, DoubleType) => bd.toDouble
      case (bd: BigDecimal, d: DecimalType) =>
        Decimal(bd, d.precision, d.scale)
      case (b: Boolean, BooleanType) => b
      case (u: UTF8String, StringType) => u
      case _ => return null // unreachable: sources gated below
    }

    // per-entry fold contributions; ANY None → decline the pushdown
    def entryCount(c: String,
        m: (String, Long, Long, Long, Map[String, String]))
        : Option[Long] = {
      val (e, rows, live, dvN, pv) = m
      val dt = fieldOf(c).dataType
      pv.get(c) match {
        case Some("%00") => Some(0L)
        case Some(_) => Some(live)
        case None if dvN == 0L =>
          ManifestV2Sink.entryNullCount(e, c).flatMap { n =>
            // NaN counts as null in N| but not in SQL COUNT — only a
            // zero proof is exact for doubles
            if (dt == DoubleType && n != 0L) None
            else Some(rows - n)
          }
        case None => None
      }
    }
    // Some(None) = provably contributes no value (all-null / no live
    // rows); Some(Some((mn, mx))) = exact bounds; None = unprovable
    def entryBounds(c: String,
        m: (String, Long, Long, Long, Map[String, String]))
        : Option[Option[(Any, Any)]] = {
      val (e, rows, live, dvN, pv) = m
      val dt = fieldOf(c).dataType
      pv.get(c) match {
        case Some(raw) =>
          if (live <= 0L) Some(None)
          else partToCmp(raw, dt) match {
            case Some(v) => Some(Some((v, v)))
            case None if raw == "%00" => Some(None)
            case None => None
          }
        case None =>
          if (dvN != 0L) None
          else {
            val nulls = ManifestV2Sink.entryNullCount(e, c)
            if (nulls.contains(rows)) Some(None) // all-null file
            else if (dt == DoubleType && !nulls.contains(0L))
              None // possible NaN hidden in the null count
            else dt match {
              case LongType | IntegerType | DateType | TimestampType |
                   DoubleType | _: DecimalType =>
                ManifestV2Sink.entryStats(e).get(c) match {
                  case Some((mn, mx)) => Some(Some((mn, mx)))
                  case None => None
                }
              case _ => None // strings: T| bounds are truncated
            }
          }
      }
    }

    // ---- group and fold
    val grouped: Seq[(Seq[String],
        Seq[(String, Long, Long, Long, Map[String, String])])] =
      if (groupCols.isEmpty) Seq(Seq.empty -> meta)
      else meta.groupBy(m => groupCols.map(m._5)).toSeq.sortBy(_._1
        .mkString(" "))

    val outRows = grouped.flatMap { case (key, ms) =>
      val vals = ops.map {
        case CountStarOp => (java.lang.Long.valueOf(ms.map(_._3).sum)
          : Any)
        case CountColOp(c) =>
          val per = ms.map(entryCount(c, _))
          if (per.exists(_.isEmpty)) return None
          (java.lang.Long.valueOf(per.flatten.sum): Any)
        case MinOp(c) =>
          val per = ms.map(entryBounds(c, _))
          if (per.exists(_.isEmpty)) return None
          val lows = per.flatten.flatten.map(_._1)
          cmpToCatalyst(
            if (lows.isEmpty) null
            else lows.reduce((a, b) => if (cmpLess(a, b)) a else b),
            fieldOf(c).dataType)
        case MaxOp(c) =>
          val per = ms.map(entryBounds(c, _))
          if (per.exists(_.isEmpty)) return None
          val highs = per.flatten.flatten.map(_._2)
          cmpToCatalyst(
            if (highs.isEmpty) null
            else highs.reduce((a, b) => if (cmpLess(a, b)) b else a),
            fieldOf(c).dataType)
      }
      val keyVals = groupCols.zip(key).map { case (c, raw) =>
        parsePart(raw, fieldOf(c).dataType)
      }
      Seq(new GenericInternalRow(
        (keyVals ++ vals).toArray[Any]): InternalRow)
    }
    // an empty ungrouped table still yields ONE row: count 0, null
    // extremes (ANSI global aggregate semantics)
    val finalRows =
      if (outRows.isEmpty && groupCols.isEmpty)
        Array[InternalRow](new GenericInternalRow(
          ops.map {
            case CountStarOp | _: CountColOp =>
              (java.lang.Long.valueOf(0L): Any)
            case _ => (null: Any)
          }.toArray[Any]))
      else outRows.toArray

    val outSchema = StructType(
      groupCols.map(c => fieldOf(c).copy(nullable = true)) ++
        ops.map {
          case CountStarOp => StructField("count_star", LongType,
            nullable = false)
          case CountColOp(c) => StructField(s"count_$c", LongType,
            nullable = false)
          case MinOp(c) => StructField(s"min_$c",
            fieldOf(c).dataType, nullable = true)
          case MaxOp(c) => StructField(s"max_$c",
            fieldOf(c).dataType, nullable = true)
        })
    Some((outSchema, finalRows))
  }
}

/** The scan a completely-pushed aggregate builds: the pre-computed
  * per-group rows served as a driver-local scan — Spark plans a
  * LocalTableScanExec, the Aggregate node is erased, and NO data
  * files are read (the rows came from manifest metadata at plan
  * time).
  */
private[sources] class ManifestAggScan(val path: String,
    outSchema: StructType, outRows: Array[InternalRow])
    extends Scan with LocalScan {
  override def readSchema(): StructType = outSchema
  override def rows(): Array[InternalRow] = outRows
  override def description(): String =
    s"graft-manifest-agg($path) PushedAggregates -> " +
      s"${outSchema.fieldNames.mkString(", ")} (metadata-only)"
  override def equals(other: Any): Boolean = other match {
    case o: ManifestAggScan => o.path == path &&
      o.readSchema() == outSchema && o.rows().sameElements(outRows)
    case _ => false
  }
  override def hashCode(): Int = (path, outSchema).hashCode()
}
