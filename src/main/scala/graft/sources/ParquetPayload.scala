package graft.sources

import scala.jdk.CollectionConverters._

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{Path => HadoopPath}
import org.apache.parquet.filter2.compat.FilterCompat
import org.apache.parquet.filter2.predicate.{FilterApi, FilterPredicate}
import org.apache.parquet.hadoop.{ParquetFileWriter, ParquetInputFormat, ParquetReader, ParquetWriter}
import org.apache.parquet.hadoop.api.{InitContext, ReadSupport, WriteSupport}
import org.apache.parquet.hadoop.metadata.CompressionCodecName
import org.apache.parquet.hadoop.util.HadoopOutputFile
import org.apache.parquet.io.api.{Binary, Converter, GroupConverter, PrimitiveConverter, RecordConsumer, RecordMaterializer}
import org.apache.parquet.schema.{LogicalTypeAnnotation, MessageType, Type, Types}
import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.DateTimeUtils
import org.apache.spark.sql.sources
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** PARQUET payload for the manifest sink — the columnar half the
  * commit protocol is format-agnostic about: executors write data
  * files as parquet (this module's `WriteSupport[InternalRow]`), so a
  * committed manifest table gets column pruning, dictionary/RLE
  * encodings, compression locality, and row-group statistics skipping
  * at READ time — the difference between re-parsing JSON text and
  * decoding only the projected columns of the row groups a predicate
  * can touch, which at 100 TB is the single largest cost of the whole
  * lakehouse surface. Legacy JSONL data files (and the metadata-sized
  * tombstone key files, which stay JSONL deliberately) remain fully
  * readable — readers dispatch on the file extension, so old
  * snapshots, branches, and mixed tables time-travel unchanged.
  *
  * Types carried natively (the widened manifest column set): BIGINT/
  * INT/DOUBLE/BOOLEAN/STRING plus DATE (int32 days), TIMESTAMP (int64
  * micros, UTC-adjusted) and DECIMAL(p,s) (int64 unscaled for p ≤ 18,
  * fixed-len binary above) — the standard parquet logical-type
  * physical mappings, so Spark's own vectorized reader consumes these
  * files with zero custom code on the `spark.read.parquet` paths.
  *
  * The DSv2 per-file reader here supports PROJECTION (only requested
  * columns decode; absent-in-file columns null-fill — the
  * schema-evolution contract) and ROW-GROUP predicate skipping from
  * pushed Spark filters. Record-level filtering is deliberately off:
  * parquet's schema validator rejects predicates naming columns a
  * pre-evolution file lacks, while its row-group statistics filter
  * treats a missing column as all-null (sound), and Spark re-applies
  * every pushed filter as residual anyway — so row-group skipping
  * keeps the IO win with none of the mixed-schema hazard.
  */
private[sources] object ParquetPayload {

  /** The manifest sink's column-type set. */
  def supportedType(dt: DataType): Boolean = dt match {
    case LongType | IntegerType | DoubleType | BooleanType | StringType |
         DateType | TimestampType => true
    case d: DecimalType => d.precision >= 1 && d.precision <= 38
    case _ => false
  }

  /** Minimal FIXED_LEN_BYTE_ARRAY width holding a signed decimal of
    * `precision` digits (the standard parquet sizing).
    */
  def minBytesForPrecision(precision: Int): Int = {
    var n = 1
    while (BigInt(10).pow(precision) - 1 > (BigInt(2).pow(8 * n - 1) - 1))
      n += 1
    n
  }

  def messageType(schema: StructType): MessageType = {
    val b = Types.buildMessage()
    schema.fields.foreach { f =>
      val t: Type = f.dataType match {
        case LongType =>
          Types.optional(PrimitiveTypeName.INT64).named(f.name)
        case IntegerType =>
          Types.optional(PrimitiveTypeName.INT32).named(f.name)
        case DoubleType =>
          Types.optional(PrimitiveTypeName.DOUBLE).named(f.name)
        case BooleanType =>
          Types.optional(PrimitiveTypeName.BOOLEAN).named(f.name)
        case StringType =>
          Types.optional(PrimitiveTypeName.BINARY)
            .as(LogicalTypeAnnotation.stringType()).named(f.name)
        case DateType =>
          Types.optional(PrimitiveTypeName.INT32)
            .as(LogicalTypeAnnotation.dateType()).named(f.name)
        case TimestampType =>
          Types.optional(PrimitiveTypeName.INT64)
            .as(LogicalTypeAnnotation.timestampType(true,
              LogicalTypeAnnotation.TimeUnit.MICROS)).named(f.name)
        case d: DecimalType if d.precision <= 18 =>
          Types.optional(PrimitiveTypeName.INT64)
            .as(LogicalTypeAnnotation.decimalType(d.scale, d.precision))
            .named(f.name)
        case d: DecimalType =>
          Types.optional(PrimitiveTypeName.FIXED_LEN_BYTE_ARRAY)
            .length(minBytesForPrecision(d.precision))
            .as(LogicalTypeAnnotation.decimalType(d.scale, d.precision))
            .named(f.name)
        case other => throw new IllegalArgumentException(
          s"graft-manifest parquet payload: unsupported type " +
            s"${other.simpleString} for column ${f.name}")
      }
      b.addField(t)
    }
    b.named("graft")
  }

  private final class RowWriteSupport(schema: StructType)
      extends WriteSupport[InternalRow] {
    private var consumer: RecordConsumer = _

    override def init(conf: Configuration): WriteSupport.WriteContext =
      new WriteSupport.WriteContext(messageType(schema),
        java.util.Collections.emptyMap[String, String])

    override def prepareForWrite(rc: RecordConsumer): Unit = consumer = rc

    override def write(row: InternalRow): Unit = {
      consumer.startMessage()
      var i = 0
      while (i < schema.length) {
        if (!row.isNullAt(i)) {
          val f = schema.fields(i)
          consumer.startField(f.name, i)
          f.dataType match {
            case LongType | TimestampType => consumer.addLong(row.getLong(i))
            case IntegerType | DateType => consumer.addInteger(row.getInt(i))
            case DoubleType => consumer.addDouble(row.getDouble(i))
            case BooleanType => consumer.addBoolean(row.getBoolean(i))
            case StringType => consumer.addBinary(
              Binary.fromConstantByteArray(row.getUTF8String(i).getBytes))
            case d: DecimalType if d.precision <= 18 =>
              consumer.addLong(
                row.getDecimal(i, d.precision, d.scale).toUnscaledLong)
            case d: DecimalType =>
              val unscaled = row.getDecimal(i, d.precision, d.scale)
                .toJavaBigDecimal.unscaledValue().toByteArray
              val n = minBytesForPrecision(d.precision)
              val padded =
                if (unscaled.length == n) unscaled
                else {
                  // sign-extend to the fixed width
                  val out = Array.fill[Byte](n)(
                    if (unscaled(0) < 0) -1 else 0)
                  System.arraycopy(unscaled, 0, out,
                    n - unscaled.length, unscaled.length)
                  out
                }
              consumer.addBinary(Binary.fromConstantByteArray(padded))
            case other => throw new IllegalStateException(
              s"unreachable (validated at plan time): $other")
          }
          consumer.endField(f.name, i)
        }
        i += 1
      }
      consumer.endMessage()
    }
  }

  private final class WriterBuilder(
      file: org.apache.parquet.io.OutputFile, schema: StructType)
      extends ParquetWriter.Builder[InternalRow, WriterBuilder](file) {
    override def self(): WriterBuilder = this
    override def getWriteSupport(
        conf: Configuration): WriteSupport[InternalRow] =
      new RowWriteSupport(schema)
  }

  /** A streaming parquet writer for one staged data file. Rows are
    * consumed immediately (safe under Spark's InternalRow reuse);
    * row groups buffer columnar in task memory and flush at the
    * standard 128 MB target — the same shape every production
    * format's fan-out writer has.
    */
  def writer(staged: java.nio.file.Path,
      schema: StructType): ParquetWriter[InternalRow] = {
    val conf = new Configuration()
    new WriterBuilder(HadoopOutputFile.fromPath(
        new HadoopPath(staged.toUri.toString), conf), schema)
      .withConf(conf)
      .withCompressionCodec(CompressionCodecName.SNAPPY)
      .withWriteMode(ParquetFileWriter.Mode.OVERWRITE)
      .build()
  }

  // ------------------------------------------------------- read side
  /** Projection-aware read support: requests from the file only the
    * `out` columns it actually has (others null-fill — the
    * schema-evolution contract), materializing [[InternalRow]]s in
    * `out` field order.
    */
  private final class RowReadSupport(out: StructType,
      aliases: Map[String, Seq[String]])
      extends ReadSupport[InternalRow] {
    override def init(ctx: InitContext): ReadSupport.ReadContext = {
      val file = ctx.getFileSchema
      // per-field resolution against THIS file: current name first,
      // then the column-identity ledger's past names (a renamed
      // column's pre-rename files carry the old name forever)
      val kept: Seq[Type] = out.fields.toSeq
        .flatMap { f =>
          (f.name +: aliases.getOrElse(f.name, Seq.empty))
            .find(file.containsField)
            .map(n => file.getType(Array(n): _*))
        }
      new ReadSupport.ReadContext(
        new MessageType("graft", kept: _*))
    }
    override def prepareForRead(conf: Configuration,
        kv: java.util.Map[String, String], fileSchema: MessageType,
        rc: ReadSupport.ReadContext): RecordMaterializer[InternalRow] =
      new RowMaterializer(out, rc.getRequestedSchema, aliases)
  }

  private final class RowMaterializer(out: StructType,
      requested: MessageType,
      aliases: Map[String, Seq[String]])
      extends RecordMaterializer[InternalRow] {
    // file column name → out index (identity for unrenamed columns)
    private val outIndexOf: Map[String, Int] =
      out.fields.zipWithIndex.flatMap { case (f, i) =>
        (f.name +: aliases.getOrElse(f.name, Seq.empty)).map(_ -> i)
      }.toMap
    private val values = new Array[Any](out.length)
    private val root: GroupConverter = new GroupConverter {
      private val converters: Array[Converter] =
        requested.getFields.asScala.map { pt =>
          fieldConverter(out(outIndexOf(pt.getName)).dataType,
            outIndexOf(pt.getName))
        }.toArray
      override def getConverter(fieldIndex: Int): Converter =
        converters(fieldIndex)
      override def start(): Unit = {
        var i = 0
        while (i < values.length) { values(i) = null; i += 1 }
      }
      override def end(): Unit = ()
    }

    private def fieldConverter(dt: DataType, i: Int): PrimitiveConverter =
      dt match {
        // addInt/addFloat overrides are TYPE-WIDENING promotion: a
        // pre-widen file's int32/float column decodes straight into
        // the widened long/double slot (ALTER COLUMN TYPE evolution)
        case LongType | TimestampType => new PrimitiveConverter {
          override def addLong(v: Long): Unit = values(i) = v
          override def addInt(v: Int): Unit = values(i) = v.toLong
        }
        case IntegerType | DateType => new PrimitiveConverter {
          override def addInt(v: Int): Unit = values(i) = v
        }
        case DoubleType => new PrimitiveConverter {
          override def addDouble(v: Double): Unit = values(i) = v
          override def addFloat(v: Float): Unit = values(i) = v.toDouble
        }
        case BooleanType => new PrimitiveConverter {
          override def addBoolean(v: Boolean): Unit = values(i) = v
        }
        case StringType => new PrimitiveConverter {
          override def addBinary(v: Binary): Unit =
            values(i) = UTF8String.fromBytes(v.getBytes)
        }
        case d: DecimalType if d.precision <= 18 =>
          new PrimitiveConverter {
            override def addLong(v: Long): Unit =
              values(i) = Decimal.createUnsafe(v, d.precision, d.scale)
            // pre-widen files of a then-smaller precision may use
            // int32 physical encoding
            override def addInt(v: Int): Unit =
              values(i) = Decimal.createUnsafe(v.toLong,
                d.precision, d.scale)
          }
        case d: DecimalType => new PrimitiveConverter {
          override def addBinary(v: Binary): Unit =
            values(i) = Decimal(new java.math.BigDecimal(
              new java.math.BigInteger(v.getBytes), d.scale),
              d.precision, d.scale)
          // precision-widened across the INT64/binary encoding
          // boundary: pre-widen files stay INT64
          override def addLong(v: Long): Unit =
            values(i) = Decimal(
              java.math.BigDecimal.valueOf(v, d.scale),
              d.precision, d.scale)
          override def addInt(v: Int): Unit =
            values(i) = Decimal(
              java.math.BigDecimal.valueOf(v.toLong, d.scale),
              d.precision, d.scale)
        }
        case other => throw new IllegalStateException(
          s"unreachable (validated at plan time): $other")
      }

    override def getRootConverter: GroupConverter = root
    override def getCurrentRecord: InternalRow =
      new GenericInternalRow(values.clone())
  }

  /** Per-file reader emitting rows in `out` schema order. `filter`
    * skips whole row groups via their statistics (record-level
    * filtering stays off — see the module scaladoc); Spark re-applies
    * every pushed filter as residual, so skipping is pure IO savings.
    */
  def reader(absPath: String, out: StructType,
      filter: Option[FilterPredicate],
      aliases: Map[String, Seq[String]] = Map.empty)
      : ParquetReader[InternalRow] = {
    val conf = new Configuration()
    conf.setBoolean(ParquetInputFormat.RECORD_FILTERING_ENABLED, false)
    val b = ParquetReader.builder(new RowReadSupport(out, aliases),
        new HadoopPath(new java.io.File(absPath).toURI.toString))
      .withConf(conf)
    filter.fold(b)(f => b.withFilter(FilterCompat.get(f)))
      .build()
  }

  // ------------------------------- Spark filters → parquet predicate
  /** Convert pushed Spark source filters to ONE conjunctive parquet
    * [[FilterPredicate]] for row-group skipping. Unconvertible parts
    * drop out (never a correctness issue — Spark re-applies all
    * filters as residual); decimal columns are excluded (their
    * physical encoding varies by precision).
    */
  def toParquetFilter(filters: Seq[sources.Filter],
      schema: StructType): Option[FilterPredicate] =
    filters.flatMap(convert(_, schema, canPartial = true))
      .reduceOption(FilterApi.and)

  /** `canPartial` is the POLARITY guard (Spark's
    * canPartialPushDownConjuncts pattern): in a positive context one
    * convertible conjunct of an And still skips soundly on its own,
    * but under a Not the weakened conjunction would NEGATE into a
    * predicate STRONGER than the original — not(eq(k,5)) skips row
    * groups that DO contain rows matching NOT(k=5 AND unconvertible) —
    * so inside any Not an And must convert both sides or drop out
    * entirely. Spark delivers exactly this shape: its translateFilter
    * only requires Not-children be expressible as source Filters, not
    * parquet-convertible.
    */
  private def convert(f: sources.Filter, schema: StructType,
      canPartial: Boolean): Option[FilterPredicate] = f match {
    case sources.And(a, b) =>
      (convert(a, schema, canPartial), convert(b, schema, canPartial)) match {
        case (Some(x), Some(y)) => Some(FilterApi.and(x, y))
        case (x, y) if canPartial => x.orElse(y)
        case _ => None
      }
    case sources.Or(a, b) => for {
      x <- convert(a, schema, canPartial)
      y <- convert(b, schema, canPartial)
    } yield FilterApi.or(x, y)
    case sources.Not(c) =>
      convert(c, schema, canPartial = false).map(FilterApi.not)
    case sources.EqualTo(c, v) if v != null => leaf(c, v, schema, "eq")
    case sources.EqualNullSafe(c, v) if v != null =>
      leaf(c, v, schema, "eq")
    case sources.GreaterThan(c, v) if v != null => leaf(c, v, schema, "gt")
    case sources.GreaterThanOrEqual(c, v) if v != null =>
      leaf(c, v, schema, "gtEq")
    case sources.LessThan(c, v) if v != null => leaf(c, v, schema, "lt")
    case sources.LessThanOrEqual(c, v) if v != null =>
      leaf(c, v, schema, "ltEq")
    case sources.In(c, vs) if vs.nonEmpty && vs.length <= 32 &&
        vs.forall(_ != null) =>
      val parts = vs.toSeq.map(v => leaf(c, v, schema, "eq"))
      if (parts.forall(_.isDefined)) parts.flatten.reduceOption(FilterApi.or)
      else None
    case sources.IsNull(c) => nullLeaf(c, schema, isNull = true)
    case sources.IsNotNull(c) => nullLeaf(c, schema, isNull = false)
    case _ => None
  }

  private def leaf(c: String, v: Any, schema: StructType,
      op: String): Option[FilterPredicate] = {
    if (!schema.fieldNames.contains(c) || !c.matches("[A-Za-z0-9_]+"))
      return None
    def cmp[T <: Comparable[T],
        C <: org.apache.parquet.filter2.predicate.Operators.Column[T]
          with org.apache.parquet.filter2.predicate.Operators.SupportsLtGt
          with org.apache.parquet.filter2.predicate.Operators
            .SupportsEqNotEq](col: C, value: T): Option[FilterPredicate] =
      op match {
        case "eq" => Some(FilterApi.eq(col, value))
        case "gt" => Some(FilterApi.gt(col, value))
        case "gtEq" => Some(FilterApi.gtEq(col, value))
        case "lt" => Some(FilterApi.lt(col, value))
        case "ltEq" => Some(FilterApi.ltEq(col, value))
        case _ => None
      }
    (schema(c).dataType, v) match {
      case (LongType, n: java.lang.Number) =>
        cmp(FilterApi.longColumn(c), java.lang.Long.valueOf(n.longValue))
      case (IntegerType, n: java.lang.Number) =>
        cmp(FilterApi.intColumn(c), java.lang.Integer.valueOf(n.intValue))
      case (DoubleType, n: java.lang.Number) =>
        cmp(FilterApi.doubleColumn(c),
          java.lang.Double.valueOf(n.doubleValue))
      case (DateType, _) => dateDays(v).flatMap(d =>
        cmp(FilterApi.intColumn(c), java.lang.Integer.valueOf(d)))
      case (TimestampType, _) => tsMicros(v).flatMap(m =>
        cmp(FilterApi.longColumn(c), java.lang.Long.valueOf(m)))
      case (StringType, s: String) =>
        cmp(FilterApi.binaryColumn(c), Binary.fromString(s))
      case (BooleanType, b: java.lang.Boolean) if op == "eq" =>
        Some(FilterApi.eq(FilterApi.booleanColumn(c), b))
      case _ => None
    }
  }

  private def nullLeaf(c: String, schema: StructType,
      isNull: Boolean): Option[FilterPredicate] = {
    if (!schema.fieldNames.contains(c) || !c.matches("[A-Za-z0-9_]+"))
      return None
    val p: Option[FilterPredicate] = schema(c).dataType match {
      case LongType | TimestampType =>
        Some(FilterApi.eq(FilterApi.longColumn(c),
          null.asInstanceOf[java.lang.Long]))
      case IntegerType | DateType =>
        Some(FilterApi.eq(FilterApi.intColumn(c),
          null.asInstanceOf[java.lang.Integer]))
      case DoubleType =>
        Some(FilterApi.eq(FilterApi.doubleColumn(c),
          null.asInstanceOf[java.lang.Double]))
      case StringType =>
        Some(FilterApi.eq(FilterApi.binaryColumn(c),
          null.asInstanceOf[Binary]))
      case BooleanType =>
        Some(FilterApi.eq(FilterApi.booleanColumn(c),
          null.asInstanceOf[java.lang.Boolean]))
      case _ => None
    }
    if (isNull) p else p.map(FilterApi.not)
  }

  // -------------------------- filter values in stats/partition units
  /** A filter value as an exact BigDecimal in the UNIT the manifest
    * stats record for its column type: dates as epoch days,
    * timestamps as epoch micros, decimals as their exact value,
    * numbers as themselves. None for types stats can't order.
    */
  def statsValue(v: Any): Option[BigDecimal] = v match {
    case n: java.lang.Long => Some(BigDecimal(n.longValue))
    case n: java.lang.Integer => Some(BigDecimal(n.intValue))
    case n: java.lang.Short => Some(BigDecimal(n.intValue))
    case n: java.lang.Byte => Some(BigDecimal(n.intValue))
    case n: java.lang.Double => Some(BigDecimal(n.doubleValue))
    case n: java.lang.Float => Some(BigDecimal(n.floatValue.toDouble))
    case b: java.math.BigDecimal => Some(BigDecimal(b))
    case b: scala.math.BigDecimal => Some(b)
    case _ => dateDays(v).map(BigDecimal(_))
      .orElse(tsMicros(v).map(BigDecimal(_)))
  }

  /** An integral filter value for Bloom probing (the filters hash
    * int64) — None for anything non-integral.
    */
  def bloomValue(v: Any): Option[Long] = v match {
    case n: java.lang.Long => Some(n.longValue)
    case n: java.lang.Integer => Some(n.longValue)
    case n: java.lang.Short => Some(n.longValue)
    case n: java.lang.Byte => Some(n.longValue)
    case _ => None
  }

  private def dateDays(v: Any): Option[Int] = v match {
    case d: java.sql.Date => Some(DateTimeUtils.fromJavaDate(d))
    case ld: java.time.LocalDate => Some(DateTimeUtils.localDateToDays(ld))
    case _ => None
  }

  private def tsMicros(v: Any): Option[Long] = v match {
    case t: java.sql.Timestamp => Some(DateTimeUtils.fromJavaTimestamp(t))
    case i: java.time.Instant => Some(DateTimeUtils.instantToMicros(i))
    case _ => None
  }
}

/** MANIFEST-LEVEL data skipping for pushed SQL filters — the planner
  * consults the per-file min/max stats, partition values, and Bloom
  * filters ALREADY recorded in the manifest before a single data file
  * opens, so `SELECT ... FROM graft.t WHERE k = 5` on a 100-TB table
  * plans the files that can hold k=5 instead of every file (the same
  * metadata [[ManifestV2Sink.prunedDataFiles]]/[[ManifestV2Sink
  * .prunedDataFilesEq]] expose to the API surface, now automatic on
  * the SQL read path). Decisions are conservative three-valued: a
  * file is skipped only when the recorded metadata PROVES no row can
  * match; statless/legacy entries always read.
  */
private[sources] object ManifestSkipping {

  def keepEntry(entry: String,
      filters: Seq[sources.Filter]): Boolean =
    filters.forall(mightMatch(entry, _))

  private def statsRange(entry: String,
      c: String): Option[(BigDecimal, BigDecimal)] =
    ManifestV2Sink.entryStats(entry).get(c)

  /** Truncated string bounds of `c`: (lower ≤ all, Some(upper ≥ all)
    * or None when no finite upper prefix exists).
    */
  private def strRange(entry: String,
      c: String): Option[(Array[Byte], Option[Array[Byte]])] =
    ManifestV2Sink.entryStringStats(entry).get(c)

  private def utf8(s: String): Array[Byte] =
    s.getBytes(java.nio.charset.StandardCharsets.UTF_8)

  private def cmpB(a: Array[Byte], b: Array[Byte]): Int =
    ManifestV2Sink.compareBytes(a, b)

  /** The entry's partition value for `c` as an exact number (None =
    * unpartitioned there or non-numeric).
    */
  private def partNum(entry: String, c: String): Option[BigDecimal] =
    ManifestV2Sink.entryPartition(entry).get(c).filter(_ != "%00")
      .flatMap(v => scala.util.Try(BigDecimal(v)).toOption)

  private def mightMatch(e: String, f: sources.Filter): Boolean = f match {
    case sources.And(a, b) => mightMatch(e, a) && mightMatch(e, b)
    case sources.Or(a, b) => mightMatch(e, a) || mightMatch(e, b)
    case sources.EqualTo(c, v) if v != null => eqMight(e, c, v)
    case sources.EqualNullSafe(c, v) if v != null => eqMight(e, c, v)
    case sources.In(c, vs) if vs.nonEmpty =>
      vs.exists(v => v != null && eqMight(e, c, v))
    case sources.GreaterThan(c, v) if v != null =>
      ParquetPayload.statsValue(v) match {
        case Some(x) =>
          partNum(e, c).forall(_ > x) &&
            statsRange(e, c).forall { case (_, mx) => mx > x }
        case None => v match {
          // rows > s exist only if max > s; upper ≥ max, so
          // upper ≤ s proves none (truncated bounds stay sound)
          case str: String => strRange(e, c).forall {
            case (_, up) => up.forall(u => cmpB(u, utf8(str)) > 0) }
          case _ => true
        }
      }
    case sources.GreaterThanOrEqual(c, v) if v != null =>
      ParquetPayload.statsValue(v) match {
        case Some(x) =>
          partNum(e, c).forall(_ >= x) &&
            statsRange(e, c).forall { case (_, mx) => mx >= x }
        case None => v match {
          case str: String => strRange(e, c).forall {
            case (_, up) => up.forall(u => cmpB(u, utf8(str)) >= 0) }
          case _ => true
        }
      }
    case sources.LessThan(c, v) if v != null =>
      ParquetPayload.statsValue(v) match {
        case Some(x) =>
          partNum(e, c).forall(_ < x) &&
            statsRange(e, c).forall { case (mn, _) => mn < x }
        case None => v match {
          // rows < s exist only if min < s; lower ≤ min, but a
          // truncated lower could be < s while min ≥ s — only the
          // sound direction skips: lower ≥ s proves min ≥ s
          case str: String => strRange(e, c).forall {
            case (lo, _) => cmpB(lo, utf8(str)) < 0 }
          case _ => true
        }
      }
    case sources.LessThanOrEqual(c, v) if v != null =>
      ParquetPayload.statsValue(v) match {
        case Some(x) =>
          partNum(e, c).forall(_ <= x) &&
            statsRange(e, c).forall { case (mn, _) => mn <= x }
        case None => v match {
          case str: String => strRange(e, c).forall {
            case (lo, _) => cmpB(lo, utf8(str)) <= 0 }
          case _ => true
        }
      }
    case _ => true // IsNull etc: null counts aren't recorded — read
  }

  /** TRUE only when the recorded metadata PROVES every row of the
    * entry's file satisfies every filter — the whole-file-DROP
    * decision of predicate DELETE (the file leaves the manifest
    * without being read). Dual of [[keepEntry]] and strictly harder:
    * range containment alone is not enough, because a NULL row never
    * satisfies a comparison — so each leaf also needs the recorded
    * null count ([[ManifestV2Sink.entryNullCount]]) to be zero.
    * Anything unprovable returns false (the file is rewritten
    * instead, always sound).
    */
  def allMatch(entry: String, filters: Seq[sources.Filter]): Boolean =
    filters.forall(am(entry, _))

  private def noNulls(e: String, c: String): Boolean =
    ManifestV2Sink.entryNullCount(e, c).contains(0L)

  private def am(e: String, f: sources.Filter): Boolean = f match {
    case sources.And(a, b) => am(e, a) && am(e, b)
    case sources.Or(a, b) => am(e, a) || am(e, b)
    case sources.IsNotNull(c) => noNulls(e, c)
    case sources.EqualTo(c, v) if v != null =>
      ParquetPayload.statsValue(v).exists { x =>
        noNulls(e, c) && statsRange(e, c).exists { case (mn, mx) =>
          mn == x && mx == x }
      }
    case sources.GreaterThan(c, v) if v != null =>
      ParquetPayload.statsValue(v).exists { x =>
        noNulls(e, c) &&
          statsRange(e, c).exists { case (mn, _) => mn > x }
      }
    case sources.GreaterThanOrEqual(c, v) if v != null =>
      ParquetPayload.statsValue(v).exists { x =>
        noNulls(e, c) &&
          statsRange(e, c).exists { case (mn, _) => mn >= x }
      }
    case sources.LessThan(c, v) if v != null =>
      ParquetPayload.statsValue(v).exists { x =>
        noNulls(e, c) &&
          statsRange(e, c).exists { case (_, mx) => mx < x }
      }
    case sources.LessThanOrEqual(c, v) if v != null =>
      ParquetPayload.statsValue(v).exists { x =>
        noNulls(e, c) &&
          statsRange(e, c).exists { case (_, mx) => mx <= x }
      }
    case sources.In(c, vs) if vs.nonEmpty =>
      vs.exists(v => v != null && am(e, sources.EqualTo(c, v)))
    case _ => false
  }

  /** The supported filters as ONE conjunctive [[org.apache.spark.sql
    * .Column]] — the exact row predicate a file-narrowed rewrite
    * applies. None when ANY filter is outside the supported shape
    * (the caller must then refuse, never silently under-delete).
    */
  def filtersToColumn(
      filters: Seq[sources.Filter]): Option[org.apache.spark.sql.Column] = {
    val parts = filters.map(filterToColumn)
    if (parts.exists(_.isEmpty)) None
    else parts.flatten.reduceOption(_ && _)
  }

  private def filterToColumn(
      f: sources.Filter): Option[org.apache.spark.sql.Column] = {
    import org.apache.spark.sql.functions.{col, lit, not}
    f match {
      case sources.EqualTo(c, v) => Some(col(c) === lit(v))
      case sources.EqualNullSafe(c, v) => Some(col(c) <=> lit(v))
      case sources.GreaterThan(c, v) => Some(col(c) > lit(v))
      case sources.GreaterThanOrEqual(c, v) => Some(col(c) >= lit(v))
      case sources.LessThan(c, v) => Some(col(c) < lit(v))
      case sources.LessThanOrEqual(c, v) => Some(col(c) <= lit(v))
      case sources.In(c, vs) => Some(col(c).isInCollection(vs.toSeq))
      case sources.IsNull(c) => Some(col(c).isNull)
      case sources.IsNotNull(c) => Some(col(c).isNotNull)
      case sources.StringStartsWith(c, s) => Some(col(c).startsWith(s))
      case sources.StringEndsWith(c, s) => Some(col(c).endsWith(s))
      case sources.StringContains(c, s) => Some(col(c).contains(s))
      case sources.And(a, b) => for {
        x <- filterToColumn(a); y <- filterToColumn(b)
      } yield x && y
      case sources.Or(a, b) => for {
        x <- filterToColumn(a); y <- filterToColumn(b)
      } yield x || y
      case sources.Not(x) => filterToColumn(x).map(not)
      case _: sources.AlwaysTrue => Some(lit(true))
      case _: sources.AlwaysFalse => Some(lit(false))
      case _ => None
    }
  }

  /** ROW-LEVEL evaluation of the supported filter shapes against an
    * [[InternalRow]] in `schema` order — the deletion-vector probe's
    * predicate engine: positions are computed by streaming a file
    * through the SAME per-file reader the scan uses and evaluating
    * the DELETE predicate here, so DV row indexes and read-time row
    * indexes can never disagree. FULL SQL three-valued logic: each
    * node evaluates to Some(true)/Some(false)/None(=NULL) with Kleene
    * And/Or and Not(NULL)=NULL, so `NOT (x = 5)` over a NULL x is
    * NULL — never a delete — matching ANSI and the copy-on-write
    * rewrite tier (`!p || p.isNull` keeps the row). A row is deleted
    * only when every filter is definitively TRUE. Throws on
    * unsupported shapes — callers gate on [[filtersToColumn]] first.
    */
  def evalFilters(schema: org.apache.spark.sql.types.StructType,
      filters: Seq[sources.Filter],
      row: org.apache.spark.sql.catalyst.InternalRow): Boolean =
    filters.forall(evalOne(schema, _, row).contains(true))

  private def fieldValue(schema: org.apache.spark.sql.types.StructType,
      c: String, row: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val i = schema.fieldIndex(c)
    if (row.isNullAt(i)) null
    else schema(i).dataType match {
      case org.apache.spark.sql.types.LongType |
           org.apache.spark.sql.types.TimestampType => row.getLong(i)
      case org.apache.spark.sql.types.IntegerType |
           org.apache.spark.sql.types.DateType => row.getInt(i)
      case org.apache.spark.sql.types.DoubleType => row.getDouble(i)
      case org.apache.spark.sql.types.BooleanType => row.getBoolean(i)
      case org.apache.spark.sql.types.StringType =>
        row.getUTF8String(i).toString
      case d: org.apache.spark.sql.types.DecimalType =>
        row.getDecimal(i, d.precision, d.scale).toBigDecimal
      case other => throw new IllegalStateException(
        s"unreachable (validated at plan time): $other")
    }
  }

  /** Normalize a row value and a filter constant into one comparable
    * domain: numerics/dates/timestamps/decimals via [[ParquetPayload
    * .statsValue]]-style exact BigDecimal, strings as strings,
    * booleans as booleans. None = incomparable (never matches).
    */
  private def cmpPair(rv: Any, fv: Any): Option[Int] = (rv, fv) match {
    case (null, _) | (_, null) => None
    case (a: String, b: String) => Some(a.compareTo(b))
    case (a: Boolean, b: java.lang.Boolean) =>
      Some(java.lang.Boolean.compare(a, b))
    case _ =>
      val ra = rv match {
        case n: Long => Some(BigDecimal(n))
        case n: Int => Some(BigDecimal(n))
        case n: Double => Some(BigDecimal(n))
        case b: scala.math.BigDecimal => Some(b)
        case _ => None
      }
      for (a <- ra; b <- ParquetPayload.statsValue(fv)) yield a.compare(b)
  }

  /** Three-valued (Kleene) evaluation: Some(true)/Some(false)/None
    * where None is SQL NULL. `FALSE AND NULL = FALSE`, `TRUE OR NULL
    * = TRUE`, `NOT NULL = NULL`; a comparison with a NULL operand is
    * NULL (not false), so Not over it stays NULL instead of flipping
    * to a spurious delete (ADVICE r14 HIGH).
    */
  private def evalOne(schema: org.apache.spark.sql.types.StructType,
      f: sources.Filter,
      row: org.apache.spark.sql.catalyst.InternalRow): Option[Boolean] =
    f match {
    case sources.And(a, b) =>
      (evalOne(schema, a, row), evalOne(schema, b, row)) match {
        case (Some(false), _) | (_, Some(false)) => Some(false)
        case (Some(true), Some(true)) => Some(true)
        case _ => None
      }
    case sources.Or(a, b) =>
      (evalOne(schema, a, row), evalOne(schema, b, row)) match {
        case (Some(true), _) | (_, Some(true)) => Some(true)
        case (Some(false), Some(false)) => Some(false)
        case _ => None
      }
    case sources.Not(c) => evalOne(schema, c, row).map(!_)
    case sources.IsNull(c) => Some(fieldValue(schema, c, row) == null)
    case sources.IsNotNull(c) => Some(fieldValue(schema, c, row) != null)
    case sources.EqualTo(c, v) =>
      cmp3(fieldValue(schema, c, row), v).map(_ == 0)
    case sources.EqualNullSafe(c, v) =>
      val rv = fieldValue(schema, c, row)
      if (rv == null || v == null) Some(rv == null && v == null)
      else Some(cmpPair(rv, v).contains(0))
    case sources.GreaterThan(c, v) =>
      cmp3(fieldValue(schema, c, row), v).map(_ > 0)
    case sources.GreaterThanOrEqual(c, v) =>
      cmp3(fieldValue(schema, c, row), v).map(_ >= 0)
    case sources.LessThan(c, v) =>
      cmp3(fieldValue(schema, c, row), v).map(_ < 0)
    case sources.LessThanOrEqual(c, v) =>
      cmp3(fieldValue(schema, c, row), v).map(_ <= 0)
    case sources.In(c, vs) =>
      // ANSI IN: TRUE on a match; NULL when the probe is NULL or the
      // list holds a NULL and nothing matched; FALSE otherwise.
      val rv = fieldValue(schema, c, row)
      if (rv == null) None
      else if (vs.exists(v => v != null && cmpPair(rv, v).contains(0)))
        Some(true)
      else if (vs.contains(null)) None
      else Some(false)
    case sources.StringStartsWith(c, s) =>
      fieldValue(schema, c, row) match {
        case x: String => Some(x.startsWith(s)); case _ => None }
    case sources.StringEndsWith(c, s) =>
      fieldValue(schema, c, row) match {
        case x: String => Some(x.endsWith(s)); case _ => None }
    case sources.StringContains(c, s) =>
      fieldValue(schema, c, row) match {
        case x: String => Some(x.contains(s)); case _ => None }
    case _: sources.AlwaysTrue => Some(true)
    case _: sources.AlwaysFalse => Some(false)
    case other => throw new UnsupportedOperationException(
      s"DV probe: unsupported filter $other (gate on filtersToColumn)")
  }

  /** Comparison with NULL propagation: None when either side is NULL
    * (SQL NULL result). Non-null incomparable pairs are unreachable —
    * shapes are validated at plan time — but conservatively map to
    * None (no delete) rather than a definite boolean.
    */
  private def cmp3(rv: Any, fv: Any): Option[Int] =
    if (rv == null || fv == null) None else cmpPair(rv, fv)

  private def eqMight(e: String, c: String, v: Any): Boolean =
    ParquetPayload.statsValue(v) match {
      case Some(x) =>
        partNum(e, c).forall(_ == x) &&
          statsRange(e, c).forall { case (mn, mx) => mn <= x && x <= mx } &&
          ParquetPayload.bloomValue(v).forall(l =>
            ManifestV2Sink.entryBloom(e, c)
              .forall(ManifestV2Sink.bloomMightContain(_, l)))
      case None => v match {
        // string equality prunes by recorded partition value AND the
        // truncated T| bounds (lower ≤ s ≤ upper or no match)
        case s: String =>
          ManifestV2Sink.entryPartition(e).get(c)
            .forall(_ == ManifestV2Sink.escapePart(s)) &&
            strRange(e, c).forall { case (lo, up) =>
              cmpB(lo, utf8(s)) <= 0 &&
                up.forall(u => cmpB(utf8(s), u) <= 0)
            }
        case _ => true
      }
    }
}
