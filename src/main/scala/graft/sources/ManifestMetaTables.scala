package graft.sources

import java.nio.file.{Files, Paths}
import java.util

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability}
import org.apache.spark.sql.connector.read.{LocalScan, Scan, ScanBuilder}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** METADATA TABLES — `SELECT * FROM graft.<t>.files / .snapshots /
  * .txns` (Iceberg's metadata-table idea in miniature): the manifest's
  * own bookkeeping served as SQL tables, so a table owner can audit
  * layout health (file sizes, rows, partition values, deletion
  * vectors), retention (snapshot log + publish times) and streaming
  * ingest state (the txn ledger) without any Scala API. Driver-
  * materialized through a LocalScan — the content IS the metadata, so
  * its size is O(files + versions), never O(data).
  */
private[sources] object ManifestMetaTables {

  val FilesSchema: StructType = StructType(Seq(
    StructField("file", StringType),
    StructField("format", StringType),
    StructField("row_count", LongType),
    StructField("size_bytes", LongType),
    StructField("partition", StringType),
    StructField("dv_positions", LongType)))

  val SnapshotsSchema: StructType = StructType(Seq(
    StructField("version", IntegerType),
    StructField("published_at", TimestampType),
    StructField("n_files", LongType),
    StructField("is_current", BooleanType)))

  val TxnsSchema: StructType = StructType(Seq(
    StructField("writer_id", StringType),
    StructField("epoch", LongType)))

  val RefsSchema: StructType = StructType(Seq(
    StructField("name", StringType),
    StructField("type", StringType),   // "branch" | "tag"
    StructField("version", IntegerType), // tags: pinned; branches: null
    StructField("n_files", LongType)))

  val ManifestsSchema: StructType = StructType(Seq(
    StructField("segment", StringType), // "(inline)" for head-resident
    StructField("entries", LongType),
    StructField("size_bytes", LongType),
    StructField("shared_by_snapshots", LongType)))

  def filesRows(path: String): Array[InternalRow] =
    ManifestV2Sink.readManifest(path).map(_._2).getOrElse(Seq.empty)
      .filterNot(ManifestV2Sink.isDeleteEntry)
      .map { e =>
        val f = ManifestV2Sink.entryFile(e)
        val rb = ManifestV2Sink.entryRowsBytes(e)
        val part = ManifestV2Sink.entryPartition(e)
        val dv = ManifestV2Sink.entryDv(e)
        InternalRow(
          UTF8String.fromString(f),
          UTF8String.fromString(
            if (f.endsWith(".parquet")) "parquet" else "jsonl"),
          rb.map(_._1).map(Long.box).orNull,
          rb.map(_._2).map(Long.box)
            .orElse(scala.util.Try(
              Long.box(Files.size(Paths.get(path, f)))).toOption)
            .orNull,
          if (part.isEmpty) null
          else UTF8String.fromString(part.toSeq.sortBy(_._1)
            .map { case (c, v) => s"$c=$v" }.mkString("/")),
          dv.map(_._2).map(Long.box).orNull)
      }.toArray

  def snapshotsRows(path: String): Array[InternalRow] = {
    val times = ManifestV2Sink.commitTimes(path)
    val current = ManifestV2Sink.readHeadVersionHint(path)
    ManifestV2Sink.versions(path).map { v =>
      val nFiles = ManifestV2Sink
        .parseManifest(ManifestV2Sink.versionFile(path, v))
        .map(_._2.count(!ManifestV2Sink.isDeleteEntry(_))).getOrElse(0)
      InternalRow(v,
        ManifestV2Sink.publishTimeMillis(path, v, times) * 1000L,
        nFiles.toLong, current.contains(v))
    }.toArray
  }

  def txnsRows(path: String): Array[InternalRow] =
    ManifestV2Sink.streamTxns(path).toSeq.sortBy(_._1).map {
      case (q, e) => InternalRow(UTF8String.fromString(q), e)
    }.toArray

  /** `graft.<t>.refs` — every named head into the snapshot space:
    * branches (independent mutable heads) and tags (immutable pinned
    * versions, retention-exempt). The one view that answers "what is
    * still keeping data alive on this table".
    */
  def refsRows(path: String): Array[InternalRow] = {
    val branchRows = ManifestV2Sink.branches(path).map { b =>
      val n = ManifestV2Sink
        .parseManifest(ManifestV2Sink.branchFile(path, b))
        .map(_._2.count(!ManifestV2Sink.isDeleteEntry(_)).toLong)
        .getOrElse(0L)
      InternalRow(UTF8String.fromString(b),
        UTF8String.fromString("branch"), null, n)
    }
    val tagRows = ManifestV2Sink.tags(path).map { case (n, v) =>
      val files = ManifestV2Sink
        .parseManifest(ManifestV2Sink.versionFile(path, v))
        .map(_._2.count(!ManifestV2Sink.isDeleteEntry(_)).toLong)
        .getOrElse(0L)
      InternalRow(UTF8String.fromString(n),
        UTF8String.fromString("tag"), v, files)
    }
    (branchRows ++ tagRows).toArray
  }

  /** `graft.<t>.manifests` — the segmentation layout of the CURRENT
    * head: one row per referenced `_MANIFEST.seg.*` file (entry
    * count, on-disk size, and how many retained version snapshots
    * share it — structural sharing made visible), plus one
    * `(inline)` row when the head carries flat entries. The
    * compaction-health view for the metadata itself: many small
    * segments → time to `CALL graft.system.rewrite_manifests`.
    */
  def manifestsRows(path: String): Array[InternalRow] = {
    val head = Paths.get(path, "_MANIFEST")
    val headRefs = ManifestV2Sink.segRefsOf(head)
    val snapRefs = ManifestV2Sink.versions(path).map(v =>
      ManifestV2Sink.segRefsOf(ManifestV2Sink.versionFile(path, v)).toSet)
    val segRows = headRefs.map { n =>
      val count = scala.util.Try(
        ManifestV2Sink.loadSegment(Paths.get(path), n).length.toLong)
        .getOrElse(-1L)
      InternalRow(
        UTF8String.fromString(n), count,
        scala.util.Try(Files.size(Paths.get(path, n))).getOrElse(-1L),
        snapRefs.count(_(n)).toLong)
    }
    val inline = ManifestV2Sink.readManifest(path).map(_._2.length)
      .getOrElse(0) - segRows.map(_.getLong(1)).sum
    val inlineRow =
      if (inline > 0)
        Seq(InternalRow(UTF8String.fromString("(inline)"),
          inline, null, null))
      else Seq.empty
    (segRows ++ inlineRow).toArray
  }
}

/** One metadata table (schema + row builder evaluated at SCAN time,
  * so a long-lived table handle always serves the current state).
  */
private[sources] class ManifestMetaTable(tableName: String,
    schema0: StructType, build: () => Array[InternalRow])
    extends Table with SupportsRead {
  override def name(): String = tableName
  override def schema(): StructType = schema0
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(
      options: CaseInsensitiveStringMap): ScanBuilder = new ScanBuilder {
    override def build(): Scan = new LocalScan {
      override def rows(): Array[InternalRow] = build0()
      override def readSchema(): StructType = schema0
    }
  }
  private def build0(): Array[InternalRow] = build()
}
