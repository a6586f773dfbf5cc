package graft.sources

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.procedures.{BoundProcedure, ProcedureParameter, UnboundProcedure}
import org.apache.spark.sql.connector.read.{LocalScan, Scan}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** SQL MAINTENANCE PROCEDURES for manifest tables — the OPTIMIZE/
  * retention/reclamation lifecycle as `CALL` statements (Spark 4's
  * DSv2 ProcedureCatalog; Iceberg's system procedures in miniature),
  * so a table owner needs no Scala API for day-two operations:
  *
  * {{{
  *   CALL graft.system.compact(table => 't', parts => 4)
  *   CALL graft.system.zorder(table => 't', cols => 'x,y', bits => 4)
  *   CALL graft.system.expire_snapshots(table => 't', keep => 10)
  *   CALL graft.system.vacuum(table => 't')
  * }}}
  *
  * Each returns ONE summary row (what changed) through a LocalScan.
  * `vacuum` is the reclamation half the Scala surface deliberately
  * left to the caller ([[ManifestV2Sink.unreferencedFiles]] returns,
  * never deletes): the PROCEDURE deletes, because a CALL is an
  * explicit operator action with the policy in its name. Safety is
  * inherited: unreferenced = referenced by NO retained snapshot,
  * branch, or head, including deletion-vector sidecars.
  */
private[sources] object ManifestProcedures {

  private def param(name: String, dt: DataType): ProcedureParameter =
    ProcedureParameter.in(name, dt).build()

  private def oneRow(schema: StructType,
      row: InternalRow): java.util.Iterator[Scan] = {
    val scan: Scan = new LocalScan {
      override def rows(): Array[InternalRow] = Array(row)
      override def readSchema(): StructType = schema
    }
    java.util.List.of(scan).iterator()
  }

  private def proc(procName: String, params: Array[ProcedureParameter],
      exec: InternalRow => (StructType, InternalRow)): UnboundProcedure =
    new UnboundProcedure {
      override def name(): String = procName
      override def description(): String =
        s"graft maintenance procedure $procName"
      override def bind(inputType: StructType): BoundProcedure =
        new BoundProcedure {
          override def name(): String = procName
          override def description(): String =
            s"graft maintenance procedure $procName"
          override def parameters(): Array[ProcedureParameter] = params
          override def isDeterministic: Boolean = false
          override def call(input: InternalRow)
              : java.util.Iterator[Scan] = {
            val (schema, row) = exec(input)
            oneRow(schema, row)
          }
        }
    }

  def compact(dirOf: String => String): UnboundProcedure =
    proc("compact",
      Array(param("table", StringType), param("parts", IntegerType)),
      { input =>
        val dir = dirOf(input.getUTF8String(0).toString)
        val parts = input.getInt(1)
        val before = ManifestV2Sink.committedFileCount(dir)
        ManifestV2Sink.compact(SparkSession.active, dir, parts)
        val after = ManifestV2Sink.committedFileCount(dir)
        (StructType(Seq(StructField("files_before", IntegerType),
          StructField("files_after", IntegerType))),
          InternalRow(before, after))
      })

  def binpack(dirOf: String => String): UnboundProcedure =
    proc("binpack",
      Array(param("table", StringType),
        param("target_bytes", LongType), param("min_bytes", LongType)),
      { input =>
        val dir = dirOf(input.getUTF8String(0).toString)
        val (compacted, bins, carried) = ManifestV2Sink.compactBinPack(
          SparkSession.active, dir, input.getLong(1), input.getLong(2))
        (StructType(Seq(StructField("files_compacted", IntegerType),
          StructField("bins_written", IntegerType),
          StructField("files_carried", IntegerType))),
          InternalRow(compacted, bins, carried))
      })

  def zorder(dirOf: String => String): UnboundProcedure =
    proc("zorder",
      Array(param("table", StringType), param("cols", StringType),
        param("bits", IntegerType)),
      { input =>
        val dir = dirOf(input.getUTF8String(0).toString)
        val cols = input.getUTF8String(1).toString.split(",")
          .map(_.trim).filter(_.nonEmpty).toSeq
        val cells = ManifestV2Sink.compactZOrder(
          SparkSession.active, dir, cols, input.getInt(2))
        (StructType(Seq(StructField("cells", IntegerType))),
          InternalRow(cells))
      })

  def expireSnapshots(dirOf: String => String): UnboundProcedure =
    proc("expire_snapshots",
      Array(param("table", StringType), param("keep", IntegerType)),
      { input =>
        val dir = dirOf(input.getUTF8String(0).toString)
        val expired =
          ManifestV2Sink.expireSnapshots(dir, input.getInt(1))
        (StructType(Seq(StructField("expired", IntegerType),
          StructField("retained", IntegerType))),
          InternalRow(expired.length,
            ManifestV2Sink.versions(dir).length))
      })

  def tag(dirOf: String => String): UnboundProcedure =
    proc("tag",
      Array(param("table", StringType), param("name", StringType),
        ProcedureParameter.in("version", IntegerType)
          .defaultValue("CAST(NULL AS INT)").build()),
      { input =>
        val dir = dirOf(input.getUTF8String(0).toString)
        val name = input.getUTF8String(1).toString
        val version = if (input.numFields > 2 && !input.isNullAt(2))
          Some(input.getInt(2)) else None
        val v = ManifestV2Sink.createTag(dir, name, version)
        (StructType(Seq(StructField("tag", StringType),
          StructField("version", IntegerType))),
          InternalRow(UTF8String.fromString(name), v))
      })

  def dropTag(dirOf: String => String): UnboundProcedure =
    proc("drop_tag",
      Array(param("table", StringType), param("name", StringType)),
      { input =>
        val dir = dirOf(input.getUTF8String(0).toString)
        val name = input.getUTF8String(1).toString
        val existed = ManifestV2Sink.dropTag(dir, name)
        (StructType(Seq(StructField("dropped", BooleanType))),
          InternalRow(existed))
      })

  def rewriteManifests(dirOf: String => String): UnboundProcedure =
    proc("rewrite_manifests",
      Array(param("table", StringType)),
      { input =>
        val dir = dirOf(input.getUTF8String(0).toString)
        val (before, after, entries) = ManifestV2Sink.rewriteManifests(dir)
        (StructType(Seq(
          StructField("segments_before", IntegerType),
          StructField("segments_after", IntegerType),
          StructField("entries", IntegerType))),
          InternalRow(before, after, entries))
      })

  def setPartitionSpec(dirOf: String => String): UnboundProcedure =
    proc("set_partition_spec",
      Array(param("table", StringType), param("cols", StringType)),
      { input =>
        val dir = dirOf(input.getUTF8String(0).toString)
        val cols = input.getUTF8String(1).toString.split(",")
          .map(_.trim).filter(_.nonEmpty).toSeq
        ManifestV2Sink.setPartitionSpec(dir, cols)
        (StructType(Seq(StructField("partition_spec", StringType))),
          InternalRow(UTF8String.fromString(
            if (cols.isEmpty) "(unpartitioned)"
            else cols.mkString(","))))
      })

  def vacuum(dirOf: String => String): UnboundProcedure =
    proc("vacuum", Array(param("table", StringType),
      ProcedureParameter.in("min_age_ms", LongType)
        .defaultValue("0").build()),
      { input =>
        val dir = dirOf(input.getUTF8String(0).toString)
        val minAge = if (input.numFields > 1 && !input.isNullAt(1))
          input.getLong(1) else 0L
        // delete under commitLock+headLock (see ManifestV2Sink.vacuum):
        // an unlocked sweep races the move-then-publish commit window
        val orphans = ManifestV2Sink.vacuum(dir, minAge)
        (StructType(Seq(StructField("files_removed", IntegerType),
          StructField("example", StringType))),
          InternalRow(orphans.length,
            UTF8String.fromString(orphans.headOption.getOrElse(""))))
      })
}
