package graft.sources

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}
import java.util

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.read.{HasPartitionKey, InputPartition, PartitionReader, PartitionReaderFactory}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** TABLE-AS-STREAM: the manifest sink readable as a Structured
  * Streaming source — `spark.readStream.format("graft-manifest")
  * .load(path)` — the Delta/Iceberg "streaming off a table" shape
  * that turns every committed batch write into a micro-batch for
  * downstream consumers, with exactly-once delivery through the
  * engine's checkpointed offset log.
  *
  * Offsets are SNAPSHOT VERSIONS (the committed log position is the
  * manifest version, the same identification the SyntheticV2Source
  * stream uses for interval positions): a micro-batch (s, e] reads
  * exactly the data files snapshot `e` lists that snapshot `s` did
  * not — work ∝ what arrived, never table size, the streaming twin of
  * [[ManifestV2Sink.readAppendedSince]]. Restart replays from the
  * checkpoint's last committed version; files inside a version never
  * change (immutable once promoted), so replans are deterministic.
  *
  * Semantics and limits (documented, spec-pinned):
  *  - APPEND-ONLY surface: merge-on-read tombstones visible at the
  *    batch's END snapshot reconcile rows arriving IN that batch
  *    (never emitted); rows emitted by an earlier batch are not
  *    retracted by a later delete — retraction is a changelog
  *    concern (`sink_manifest_changelog`), not an append stream's.
  *  - REWRITE commits (compact/zorder/upsert/truncate) re-list
  *    surviving rows under new files, which a file-level diff reports
  *    as arrivals — same replace-snapshot rule as Iceberg's
  *    incremental scan; don't run OPTIMIZE mid-stream or consume the
  *    changelog instead.
  *  - Streams follow MAIN: `latestOffset` is the newest snapshot
  *    whose content IS the current main head (every main commit
  *    writes its snapshot then the pointer with identical bytes, so
  *    the match always exists); branch snapshots never become
  *    offsets.
  *
  * Tombstone key sets ride the plan (driver-loaded, serialized into
  * partitions) — right-sized for GDPR-scale deletes; table-scale
  * deletes belong on the batch surface's anti-join reconcile.
  */
private[sources] class ManifestMicroBatchStream(path: String,
    schema: StructType, required: StructType,
    filters: Seq[org.apache.spark.sql.sources.Filter] = Seq.empty,
    maxFilesPerTrigger: Option[Int] = None,
    cdf: Boolean = false)
    extends MicroBatchStream
    with org.apache.spark.sql.connector.read.streaming
      .SupportsTriggerAvailableNow {

  // CHANGE-FEED mode (`.option("readChangeFeed", "true")`): `schema`/
  // `required` carry the two metadata columns; partitions read the
  // DATA columns and the reader factory appends the constants. Data
  // deltas stream per VERSION (each commit's arrivals tagged with its
  // version); `rewrite` commits are silent; commits that REMOVE
  // visibility (overwrite, deletes) are rejected loudly — their
  // retractions belong to the batch surface (graft_table_changes),
  // not an append stream.
  private val metaCols =
    Set(ManifestCdf.ChangeTypeCol, ManifestCdf.CommitVersionCol)
  private val dataSchema: StructType =
    if (!cdf) schema
    else StructType(schema.fields.filterNot(f => metaCols(f.name)))
  private val dataRequired: StructType =
    if (!cdf) required
    else StructType(required.fields.filterNot(f => metaCols(f.name)))
  /** Output projection: ≥0 = index into the data row, -1 =
    * _change_type, -2 = _commit_version.
    */
  private val cdfProj: Array[Int] = required.fields.map(_.name match {
    case ManifestCdf.ChangeTypeCol => -1
    case ManifestCdf.CommitVersionCol => -2
    case n => dataRequired.fieldIndex(n)
  })

  override def initialOffset(): Offset = ManifestOffset(0)

  // Trigger.AvailableNow: freeze the head ONCE at query start so the
  // run drains exactly what existed, in rate-limited batches, then
  // stops (without this Spark wraps the stream and bypasses the read
  // limit). Admission control still paces every batch below.
  private var availableNowTarget: Option[Long] = None
  override def prepareForTriggerAvailableNow(): Unit =
    availableNowTarget =
      Some(latestOffset().asInstanceOf[ManifestOffset].v)

  /** ADMISSION CONTROL (`.option("maxFilesPerTrigger", n)`): a
    * micro-batch consumes at most `n` newly-committed data FILES —
    * the Delta-style rate limit that turns a 100-TB backfill from one
    * impossible giant batch into a bounded stream of them. The end
    * offset advances version-by-version from `start`, accumulating
    * each snapshot's file-level arrivals, and stops before the budget
    * overflows — but always admits at least ONE version when anything
    * is pending (a single commit larger than the budget must still
    * make progress; versions are the atomic replay unit). Without the
    * option the default read limit is all-available.
    */
  override def getDefaultReadLimit
      : org.apache.spark.sql.connector.read.streaming.ReadLimit =
    maxFilesPerTrigger
      .map(n => org.apache.spark.sql.connector.read.streaming
        .ReadLimit.maxFiles(n))
      .getOrElse(org.apache.spark.sql.connector.read.streaming
        .ReadLimit.allAvailable())

  override def latestOffset(start: Offset,
      limit: org.apache.spark.sql.connector.read.streaming.ReadLimit)
      : Offset = {
    val resolved = latestOffset().asInstanceOf[ManifestOffset].v
    val head = ManifestOffset(
      availableNowTarget.fold(resolved)(math.min(resolved, _)))
    val headV = Math.toIntExact(head.v)
    val s = Math.toIntExact(start.asInstanceOf[ManifestOffset].v)
    limit match {
      case mf: org.apache.spark.sql.connector.read.streaming.ReadMaxFiles
          if headV > s =>
        var prev: Set[String] = if (s == 0) Set.empty
          else ManifestV2Sink
            .parseManifest(ManifestV2Sink.versionFile(path, s))
            .map(_._2.filterNot(ManifestV2Sink.isDeleteEntry).toSet)
            .getOrElse(throw new IllegalStateException(
              s"graft-manifest stream: snapshot v$s at $path was " +
                "expired — cannot plan the batch exactly-once"))
        var budget = mf.maxFiles()
        var v = s
        var stop = false
        while (!stop && v < headV) {
          val next = ManifestV2Sink
            .parseManifest(ManifestV2Sink.versionFile(path, v + 1))
            .map(_._2.filterNot(ManifestV2Sink.isDeleteEntry).toSet)
          next match {
            case Some(entries) =>
              val arrivals = (entries -- prev).size
              if (arrivals <= budget || v == s) {
                budget -= arrivals
                prev = entries
                v += 1
                // a version that exactly drains (or overflows via the
                // always-admit-one rule) ends the batch
                if (budget <= 0) stop = true
              } else stop = true
            case None =>
              // an expired INTERMEDIATE version: the diff basis is
              // gone; fall through to the head (the full planner
              // handles/fails exactly-once as before)
              v = headV
          }
        }
        ManifestOffset(v.toLong)
      case _ => head
    }
  }

  override def latestOffset(): Offset = {
    val mf = Paths.get(path, "_MANIFEST")
    val headBody =
      if (Files.exists(mf)) Files.readAllBytes(mf) else Array.empty[Byte]
    if (headBody.isEmpty) ManifestOffset(0)
    else {
      // fast path: every main publish drops a head-version HINT next
      // to the pointer; a hint is only trusted after verifying its
      // snapshot's bytes ARE the head (a crash between pointer move
      // and hint write leaves a stale hint — detected, never believed)
      val hinted = ManifestV2Sink.readHeadVersionHint(path).filter { v =>
        val vf = ManifestV2Sink.versionFile(path, v)
        Files.exists(vf) &&
          util.Arrays.equals(Files.readAllBytes(vf), headBody)
      }
      val v = hinted.getOrElse {
        // slow path (pre-hint tables): newest snapshot that IS the
        // main head; compare sizes before bytes so one poll reads at
        // most a handful of full snapshots, not the whole history
        ManifestV2Sink.versions(path).reverse.find { v =>
          val vf = ManifestV2Sink.versionFile(path, v)
          Files.size(vf) == headBody.length.toLong &&
            util.Arrays.equals(Files.readAllBytes(vf), headBody)
        }.getOrElse(throw new IllegalStateException(
          s"graft-manifest stream: no retained snapshot matches the " +
            s"main head at $path — snapshot retention expired the head's " +
            "version; silently restarting from 0 would replay the table"))
      }
      ManifestOffset(v)
    }
  }

  override def deserializeOffset(json: String): Offset =
    ManifestOffset(json.trim.toLong)

  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()

  override def planInputPartitions(start: Offset,
      end: Offset): Array[InputPartition] = {
    val s = Math.toIntExact(start.asInstanceOf[ManifestOffset].v)
    val e = Math.toIntExact(end.asInstanceOf[ManifestOffset].v)
    if (e <= s) return Array.empty
    // a checkpointed offset whose snapshot retention has expired must
    // FAIL, not silently fall back — an empty base for s>0 would
    // replay the entire table as arrivals (mirrors readAppendedSince)
    def snapshot(v: Int): Seq[String] = ManifestV2Sink
      .parseManifest(ManifestV2Sink.versionFile(path, v))
      .map(_._2).getOrElse(throw new IllegalStateException(
        s"graft-manifest stream: snapshot v$v at $path was expired — " +
          "cannot plan the batch exactly-once; re-seed the stream"))
    if (!cdf) {
      val base: Set[String] =
        if (s == 0) Set.empty else snapshot(s).toSet
      return ManifestScanPlanner.partitions(path, schema, required,
        filters, snapshot(e), base)
    }
    // CDF: one partition group per VERSION so each row carries its
    // commit version
    val kinds = ManifestV2Sink.commitKinds(path)
    ((s + 1) to e).flatMap { v =>
      if (kinds.get(v).contains("rewrite")) Array.empty[InputPartition]
      else {
        val prev = if (v - 1 == 0) Seq.empty else snapshot(v - 1)
        val cur = snapshot(v)
        val prevData =
          prev.filterNot(ManifestV2Sink.isDeleteEntry)
        val prevFiles = prevData.map(ManifestV2Sink.entryFile).toSet
        val curData = cur.filterNot(ManifestV2Sink.isDeleteEntry)
        val curFiles = curData.map(ManifestV2Sink.entryFile).toSet
        val prevTombs = prev.filter(ManifestV2Sink.isDeleteEntry).toSet
        val removed = prevFiles -- curFiles
        val newTombs =
          cur.filter(ManifestV2Sink.isDeleteEntry).filterNot(prevTombs)
        val dvDelta = curData.exists { en =>
          prevFiles(ManifestV2Sink.entryFile(en)) &&
            !prevData.exists(pe =>
              ManifestV2Sink.entryFile(pe) ==
                ManifestV2Sink.entryFile(en) &&
                ManifestV2Sink.entryDv(pe) == ManifestV2Sink.entryDv(en))
        }
        if (removed.nonEmpty || newTombs.nonEmpty || dvDelta)
          throw new UnsupportedOperationException(
            s"graft-manifest CDF stream: commit v$v at $path removes " +
              "row visibility (overwrite/delete) — an append stream " +
              "cannot retract; replay the range in batch via " +
              s"graft_table_changes('<table>', ${v - 1}, $v)")
        // base is the ENTRY-string set: carried-over files have
        // byte-identical entries (no DV/tombstone delta — checked)
        ManifestScanPlanner.partitions(path, dataSchema, dataRequired,
          filters, cur, prevData.toSet)
          .map(p => CdfInputPartition(
            p.asInstanceOf[ManifestFilePartition], "insert", v.toLong,
            cdfProj): InputPartition)
      }
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    if (cdf)
      new CdfReaderFactory(ManifestScanPlanner.readerFactory)
    else ManifestScanPlanner.readerFactory
}

/** Shared partition planning for the DSv2 read paths (batch scan +
  * micro-batch stream): data entries become one file partition each,
  * tombstones visible in the planned entry set become plan-riding
  * key sets every reader filters by (normalized per key type so "3"
  * matches however JSON spelled it). Pushed filters prune WHOLE
  * FILES here at planning via the manifest's recorded per-file
  * stats/partitions/Blooms ([[ManifestSkipping]]) — a selective SQL
  * read of a 100-TB manifest table plans the files that can match,
  * not the table — then ride into the parquet readers for row-group
  * skipping. `required` is the pruned read schema every partition
  * emits (tombstone key columns are read internally when pruned out,
  * never emitted).
  */
private[sources] object ManifestScanPlanner {

  /** Last batch-planned (files planned, files total) per table path —
    * read back by the runtime-prune evidence queries and specs after
    * an execution (a runtime-filtered re-plan overwrites the entry,
    * so the recorded value reflects what was actually read).
    */
  private val planned =
    new java.util.concurrent.ConcurrentHashMap[String, (Int, Int)]()

  private[sources] def recordPlanned(path: String, files: Int,
      total: Int): Unit = { planned.put(path, (files, total)); () }

  def lastPlanned(path: String): Option[(Int, Int)] =
    Option(planned.get(path))

  /** `pruneOnly` filters (runtime/DPP join-key sets) participate in
    * file-level skipping but do NOT ride into the per-file readers as
    * residual predicates — they are join artifacts, not query
    * predicates; the join re-applies its own condition.
    */
  def partitions(path: String, schema: StructType, required: StructType,
      filters: Seq[org.apache.spark.sql.sources.Filter],
      entries: Seq[String], base: Set[String],
      pruneOnly: Seq[org.apache.spark.sql.sources.Filter] = Seq.empty,
      limit: Option[Int] = None,
      topn: Option[(String, Boolean, Int)] = None)
      : Array[InputPartition] = {
    val aliasMap = ManifestV2Sink.columnAliases(path)
    val aliasesEnc = aliasMap.toArray.sortBy(_._1).map { case (c, past) =>
      s"$c=${past.mkString(",")}" }
    val widenedArr = ManifestV2Sink.widenedColumns(path).toArray.sorted
    val dels: Array[DeleteSet] = entries
      .filter(ManifestV2Sink.isDeleteEntry)
      .map { entry =>
        val p = entry.split("\t")
        (p(1), ManifestV2Sink.entryFile(entry))
      }
      .groupBy(_._1).toArray.sortBy(_._1)
      .map { case (keyCol, files) =>
        // a tombstone keyed on a column the planned schema lacks must
        // FAIL: silently dropping the group would emit deleted rows
        // (e.g. a schema frozen at stream start + a later add-column
        // evolution + a delete keyed on the new column). A RENAAMED
        // key column resolves through the column-identity ledger.
        val curName =
          if (schema.fieldNames.contains(keyCol)) keyCol
          else aliasMap.collectFirst {
            case (cur, past) if past.contains(keyCol) => cur
          }.getOrElse(keyCol)
        val f = schema.fields.find(_.name == curName).getOrElse(
          throw new IllegalStateException(
            s"graft-manifest: delete entries keyed on '$keyCol' but the " +
              s"planned read schema has no such column — refusing to " +
              "ignore tombstones"))
        locally {
          val mapper = new ObjectMapper()
          val keys = files.flatMap { case (_, rel) =>
            Files.readAllLines(Paths.get(path, rel),
              StandardCharsets.UTF_8).asScala
              .filter(_.nonEmpty)
              .flatMap { line =>
                Option(mapper.readTree(line).get(keyCol))
                  .filterNot(_.isNull)
                  .map(ManifestJsonlReader.renderKey(_, f.dataType))
              }
          }.distinct.toArray
          DeleteSet(curName, keys)
        }
      }
    val planned0 = entries
      .filterNot(x => ManifestV2Sink.isDeleteEntry(x) || base.contains(x))
      .filter(ManifestSkipping.keepEntry(_, filters ++ pruneOnly))
    // limit/top-N file bounding: only sound with no tombstones (a
    // key-delete could reconcile away counted rows) — bounding is
    // pure IO savings, Spark's own Limit/TakeOrdered stays on top
    val planned =
      if (dels.isEmpty && (limit.isDefined || topn.isDefined))
        boundEntries(planned0, limit, topn)
      else planned0
    // vectorized decode needs a scan-uniform answer: every planned
    // file parquet, no tombstones, no deletion vectors (row-level
    // reconcile and positional skips need the row readers; compaction
    // clears both and restores the columnar path)
    val columnarOk = dels.isEmpty &&
      planned.forall(e =>
        ManifestV2Sink.entryFile(e).endsWith(".parquet") &&
          ManifestV2Sink.entryDv(e).isEmpty)
    val partCols = ManifestV2Sink.tablePartitionColumns(path)
    planned.map { entry =>
      val pv = ManifestV2Sink.entryPartition(entry)
      val keyed = partCols.nonEmpty && partCols.forall(pv.contains)
      ManifestFilePartition(
        Paths.get(path, ManifestV2Sink.entryFile(entry)).toString,
        schema.json, required.json, dels, filters.toArray,
        columnarOk,
        ManifestV2Sink.entryDv(entry).map { case (rel, _) =>
          Paths.get(path, rel).toString },
        if (keyed) partCols.toArray else Array.empty,
        if (keyed) partCols.map(pv).toArray else Array.empty,
        aliasesEnc, widenedArr): InputPartition
    }.toArray
  }

  /** LIMIT/TOP-N FILE BOUNDING — the scan-side half of
    * `SupportsPushDownLimit`/`SupportsPushDownTopN` (partial push):
    * keep only as many files as the k requested rows can live in,
    * decided from manifest metadata. Bare LIMIT k: walk the planned
    * entries summing recorded live rows (R| minus V| DV counts) and
    * stop once ≥ k — any suffix of files is unreachable by a limit
    * that may return ANY k rows. ORDER BY col LIMIT k: every entry
    * needs exact `S|` bounds, a ZERO `N|` null count (no null-ordering
    * cases, and no hidden NaN for doubles) and a recorded live count;
    * entries sort by the bound at the sorted end, accumulate until
    * ≥ k live rows → threshold τ; a file whose whole range lies
    * strictly beyond τ cannot hold any of the k extreme rows
    * (standard min/max zone-map top-k pruning). ANY missing metadata
    * → no-op (all files planned; Spark's Limit is still exact).
    */
  private[sources] def boundEntries(planned: Seq[String],
      limit: Option[Int],
      topn: Option[(String, Boolean, Int)]): Seq[String] = {
    def live(e: String): Option[Long] =
      ManifestV2Sink.entryRowsBytes(e).map { case (r, _) =>
        math.max(0L, r - ManifestV2Sink.entryDv(e).map(_._2)
          .getOrElse(0L))
      }
    topn match {
      case Some((c, asc, k)) =>
        val meta = planned.map { e =>
          for {
            l <- live(e)
            b <- ManifestV2Sink.entryStats(e).get(c)
            n <- ManifestV2Sink.entryNullCount(e, c) if n == 0L
          } yield (e, l, b._1, b._2)
        }
        if (meta.exists(_.isEmpty)) planned
        else {
          val ms = meta.flatten
          val sorted =
            if (asc) ms.sortBy(_._4)
            else ms.sortBy(_._3)(Ordering[BigDecimal].reverse)
          var cum = 0L
          var tau: Option[BigDecimal] = None
          val it = sorted.iterator
          while (cum < k && it.hasNext) {
            val m = it.next()
            cum += m._2
            tau = Some(if (asc) m._4 else m._3)
          }
          tau match {
            case Some(t) if cum >= k =>
              ms.filter(m => if (asc) m._3 <= t else m._4 >= t)
                .map(_._1)
            case _ => planned // fewer than k rows in total
          }
        }
      case None => limit match {
        case Some(k) =>
          val ls = planned.map(live)
          if (ls.exists(_.isEmpty)) planned
          else {
            var cum = 0L
            val keep = Seq.newBuilder[String]
            val it = planned.iterator.zip(ls.iterator.map(_.get))
            while (cum < k && it.hasNext) {
              val (e, l) = it.next()
              keep += e
              cum += l
            }
            keep.result()
          }
        case None => planned
      }
    }
  }

  def readerFactory: PartitionReaderFactory = new PartitionReaderFactory {
    override def createReader(
        p: InputPartition): PartitionReader[InternalRow] = {
      val fp = p.asInstanceOf[ManifestFilePartition]
      if (fp.absPath.endsWith(".parquet")) new ManifestParquetReader(fp)
      else new ManifestJsonlReader(fp)
    }
    override def supportColumnarReads(p: InputPartition): Boolean =
      p.asInstanceOf[ManifestFilePartition].columnarOk
    override def createColumnarReader(p: InputPartition)
        : PartitionReader[org.apache.spark.sql.vectorized.ColumnarBatch] =
      new ManifestParquetColumnarReader(
        p.asInstanceOf[ManifestFilePartition])
  }
}

/** VECTORIZED per-file decode — the columnar half of the read path:
  * one committed parquet file → [[ColumnarBatch]]es through Spark's
  * own `VectorizedParquetRecordReader` (the identical machinery the
  * built-in parquet source runs), so the scan exec's codegen'd
  * ColumnarToRow loop replaces one virtual `next()`/`get()` call pair
  * per row and column decoding happens straight into column vectors.
  * Row-group skipping from pushed filters still applies (set on the
  * Configuration before init); record-level filtering stays off, same
  * contract as the row reader. Schema evolution null-fills: Spark's
  * read support clips the file schema against the requested catalyst
  * schema and serves absent columns as constant-null vectors. Only
  * planned for tombstone-free all-parquet scans (see
  * [[ManifestFilePartition.columnarOk]]).
  */
private[sources] class ManifestParquetColumnarReader(
    p: ManifestFilePartition)
    extends PartitionReader[org.apache.spark.sql.vectorized.ColumnarBatch] {
  private val full =
    DataType.fromJson(p.schemaJson).asInstanceOf[StructType]
  private val required =
    DataType.fromJson(p.requiredJson).asInstanceOf[StructType]
  // renamed columns: translate the requested names to whatever THIS
  // file calls them (one footer read, only on alias-carrying tables);
  // ColumnarBatch columns are positional, so downstream binding is
  // untouched
  private val fileRequired: StructType = {
    val aliasMap = p.aliasMap
    if (!required.fieldNames.exists(aliasMap.contains)) required
    else {
      val inFile = org.apache.parquet.hadoop.ParquetFileReader.open(
        org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
          new org.apache.hadoop.fs.Path(
            new java.io.File(p.absPath).toURI),
          new org.apache.hadoop.conf.Configuration()))
      val fileSchema =
        try inFile.getFooter.getFileMetaData.getSchema
        finally inFile.close()
      StructType(required.fields.map { f =>
        val name = (f.name +: aliasMap.getOrElse(f.name, Seq.empty))
          .find(fileSchema.containsField).getOrElse(f.name)
        f.copy(name = name)
      })
    }
  }
  private val conf = {
    val c = new org.apache.hadoop.conf.Configuration()
    c.set(org.apache.parquet.hadoop.ParquetInputFormat.READ_SUPPORT_CLASS,
      classOf[org.apache.spark.sql.execution.datasources.parquet
        .ParquetReadSupport].getName)
    c.set(org.apache.spark.sql.execution.datasources.parquet
      .ParquetReadSupport.SPARK_ROW_REQUESTED_SCHEMA, fileRequired.json)
    c.setBoolean("spark.sql.caseSensitive", false)
    c.setBoolean("spark.sql.parquet.binaryAsString", false)
    c.setBoolean("spark.sql.parquet.int96AsTimestamp", true)
    c.setBoolean("spark.sql.parquet.inferTimestampNTZ.enabled", false)
    c.setBoolean("spark.sql.legacy.parquet.nanosAsLong", false)
    c.setBoolean(org.apache.parquet.hadoop.ParquetInputFormat
      .RECORD_FILTERING_ENABLED, false)
    // renamed-column filters drop out (missing-column row-group stats
    // would skip pre-rename files), and so do WIDENED-column filters
    // (wide-typed predicates physically mismatch pre-widen files) —
    // same rule as the row reader
    if (!p.filters.flatMap(_.references).exists(r =>
        p.aliasMap.contains(r) || p.widened.contains(r)))
      ParquetPayload.toParquetFilter(p.filters.toSeq, full).foreach(f =>
        org.apache.parquet.hadoop.ParquetInputFormat
          .setFilterPredicate(c, f))
    c
  }
  private val reader = {
    val r = new org.apache.spark.sql.execution.datasources.parquet
      .VectorizedParquetRecordReader(
        null, "CORRECTED", "UTC", "CORRECTED", "UTC",
        /* useOffHeap = */ false, /* capacity = */ 4096)
    val file = new java.io.File(p.absPath)
    // the OLD-API FileSplit (it extends the new-API one): Spark's
    // reader base casts the split to mapred.FileSplit internally
    val split = new org.apache.hadoop.mapred.FileSplit(
      new org.apache.hadoop.fs.Path(file.toURI), 0, file.length(),
      Array.empty[String])
    val attempt = new org.apache.hadoop.mapreduce.task
      .TaskAttemptContextImpl(conf,
        new org.apache.hadoop.mapreduce.TaskAttemptID())
    try {
      r.initialize(split, attempt)
      r.initBatch(new StructType(), InternalRow.empty)
      r.enableReturningBatches()
      r
    } catch { case t: Throwable => r.close(); throw t }
  }
  override def next(): Boolean = reader.nextKeyValue()
  override def get(): org.apache.spark.sql.vectorized.ColumnarBatch =
    reader.getCurrentValue
      .asInstanceOf[org.apache.spark.sql.vectorized.ColumnarBatch]
  override def close(): Unit = reader.close()
}

/** BATCH read of the committed state through the DSv2 scan — what
  * serves `SELECT * FROM graft.<table>` via [[ManifestCatalog]]. Same
  * reader and tombstone reconcile as the stream; the committed view is
  * the head manifest's entries. ([[ManifestV2Sink.readCommitted]]
  * remains the API-level batch surface; its anti-join reconcile
  * handles table-scale tombstones, while this plan-riding set is
  * right-sized for GDPR-scale deletes.)
  */
private[sources] class ManifestBatchScan(val path: String,
    val schema: StructType, val required: StructType,
    val filters: Seq[org.apache.spark.sql.sources.Filter] = Seq.empty,
    val branch: Option[String] = None,
    val asOfVersion: Option[Int] = None,
    // BY-NAME view of the owning scan's runtime filters: BatchScanExec
    // caches `scan.toBatch` BEFORE calling filter(), then re-plans on
    // the SAME batch object — a by-value capture would always see the
    // pre-filter empty seq
    runtimePrune: () => Seq[org.apache.spark.sql.sources.Filter] =
      () => Seq.empty,
    val limit: Option[Int] = None,
    val topn: Option[(String, Boolean, Int)] = None)
    extends org.apache.spark.sql.connector.read.Batch {
  /** VALUE equality (everything but the mutable runtime-filter view):
    * `BatchScanExec.equals` compares `scan.toBatch`, so exchange
    * reuse and AQE's dynamic-pruning reuse check need two batches of
    * the same (table, projection, filters, version) to BE equal —
    * reference equality silently disables both. Runtime-filter state
    * is compared by BatchScanExec itself via its own field.
    */
  override def equals(other: Any): Boolean = other match {
    case o: ManifestBatchScan => o.path == path && o.schema == schema &&
      o.required == required && o.filters == filters &&
      o.branch == branch && o.asOfVersion == asOfVersion &&
      o.limit == limit && o.topn == topn
    case _ => false
  }
  override def hashCode(): Int =
    (path, schema, required, filters, branch, asOfVersion, limit, topn)
      .hashCode()

  override def planInputPartitions(): Array[InputPartition] = {
    // loud on a retention hole / missing branch — a silently-empty
    // snapshot read would look like "the table was empty at v"
    val entries = ManifestV2Sink.entriesFor(path, branch, asOfVersion)
    val parts = ManifestScanPlanner.partitions(path, schema, required,
      filters, entries, Set.empty, runtimePrune(), limit, topn)
    // observability: the per-path planned/total file counts the
    // runtime-prune evidence queries read back after execution
    ManifestScanPlanner.recordPlanned(path, parts.length,
      entries.count(!ManifestV2Sink.isDeleteEntry(_)))
    parts
  }
  override def createReaderFactory(): PartitionReaderFactory =
    ManifestScanPlanner.readerFactory
}

/** One change-feed file partition: the wrapped data partition plus
  * the constant change metadata its rows carry. `proj` maps each
  * output column to a data-row index (≥0) or a constant (-1 =
  * _change_type, -2 = _commit_version) — projection order follows
  * the stream's pruned schema, so SELECTing any column subset works.
  */
private[sources] case class CdfInputPartition(
    inner: ManifestFilePartition, changeType: String, version: Long,
    proj: Array[Int]) extends InputPartition

private[sources] class CdfReaderFactory(base: PartitionReaderFactory)
    extends PartitionReaderFactory {
  override def createReader(
      p: InputPartition): PartitionReader[InternalRow] = {
    val cp = p.asInstanceOf[CdfInputPartition]
    val ir = base.createReader(cp.inner)
    val dataTypes = DataType.fromJson(cp.inner.requiredJson)
      .asInstanceOf[StructType].fields.map(_.dataType)
    val ct = UTF8String.fromString(cp.changeType)
    new PartitionReader[InternalRow] {
      override def next(): Boolean = ir.next()
      override def get(): InternalRow = {
        val row = ir.get()
        val vals = new Array[Any](cp.proj.length)
        var i = 0
        while (i < cp.proj.length) {
          vals(i) = cp.proj(i) match {
            case -1 => ct
            case -2 => cp.version
            case j => row.get(j, dataTypes(j))
          }
          i += 1
        }
        new GenericInternalRow(vals)
      }
      override def close(): Unit = ir.close()
    }
  }
}

private[sources] case class ManifestOffset(v: Long) extends Offset {
  override def json(): String = v.toString
}

private[sources] case class DeleteSet(col: String, keys: Array[String])

/** `columnarOk` is a SCAN-UNIFORM flag (computed once over the whole
  * planned set): Spark's DSv2 scan exec refuses mixed row/columnar
  * partitions, so either EVERY planned file decodes vectorized
  * (all-parquet, tombstone-free) or all go through the row readers.
  */
private[sources] case class ManifestFilePartition(absPath: String,
    schemaJson: String, requiredJson: String, deletes: Array[DeleteSet],
    filters: Array[org.apache.spark.sql.sources.Filter],
    columnarOk: Boolean = false,
    // absolute path of the file's deletion-vector sidecar, if any:
    // the reader skips these row positions (and disables row-group
    // skipping so positions stay in full-file coordinates)
    dvPath: Option[String] = None,
    // the file's recorded partition key (DDL partition columns, in
    // sidecar order; rendered values) — what HasPartitionKey exposes
    // so Spark's key-grouped machinery can storage-partition joins
    partKeyCols: Array[String] = Array.empty,
    partKeyVals: Array[String] = Array.empty,
    // column-identity aliases ("current=past1,past2" per renamed
    // column): readers resolve file columns current-name-first, then
    // past names — pre-rename files keep serving their data
    aliases: Array[String] = Array.empty,
    // columns whose type was ever WIDENED: parquet-level filters on
    // them are dropped (physical-type mismatch vs pre-widen files);
    // decode-time promotion serves the values
    widened: Array[String] = Array.empty)
    extends InputPartition with HasPartitionKey {

  /** Decoded alias map (current → past names, newest first). */
  def aliasMap: Map[String, Seq[String]] =
    aliases.iterator.map { a =>
      val Array(cur, past) = a.split("=", 2)
      cur -> past.split(",").toSeq
    }.toMap

  /** Typed key row for Spark's partition grouping (driver-side;
    * called only when the scan reports a KeyGroupedPartitioning,
    * which itself requires every planned entry be keyed).
    */
  override def partitionKey(): InternalRow = {
    val schema = DataType.fromJson(schemaJson).asInstanceOf[StructType]
    InternalRow.fromSeq(partKeyCols.zip(partKeyVals).toSeq.map {
      case (_, "%00") => null
      case (c, v) => schema(c).dataType match {
        case LongType => v.toLong
        case IntegerType | DateType => v.toInt
        case BooleanType => v.toBoolean
        case StringType =>
          UTF8String.fromString(ManifestV2Sink.unescapePart(v))
        case other => throw new IllegalStateException(
          s"partition key of unsupported type $other") // writer rejects
      }
    })
  }
}

/** One PARQUET data file → InternalRows through [[ParquetPayload]]'s
  * projection-aware reader: only the required (pruned) columns plus
  * any tombstone key columns decode; pushed filters skip row groups
  * via their statistics. Tombstoned rows are filtered here, and
  * internally-read key columns never leave the reader.
  */
private[sources] class ManifestParquetReader(p: ManifestFilePartition)
    extends PartitionReader[InternalRow] {
  private val full =
    DataType.fromJson(p.schemaJson).asInstanceOf[StructType]
  private val required =
    DataType.fromJson(p.requiredJson).asInstanceOf[StructType]
  // tombstone key columns ride the read schema (appended after the
  // required columns) when pruning removed them
  private val readSchema = StructType(required.fields ++
    p.deletes.map(_.col).distinct
      .filterNot(required.fieldNames.contains).map(full(_)))
  private val deleted: Array[(Int, DataType, Set[String])] =
    p.deletes.map { d =>
      (readSchema.fieldIndex(d.col), readSchema(d.col).dataType,
        d.keys.toSet)
    }
  // a deletion vector pins row positions to FULL-file decode order:
  // row-group skipping must stay off for DV'd files. Filters touching
  // RENAMED columns also drop out: parquet's stats filter treats a
  // missing column as all-null and would skip pre-rename files that
  // DO hold matching rows under the old name (Spark re-applies every
  // pushed filter as residual, so this costs IO only).
  private val reader = ParquetPayload.reader(p.absPath, readSchema,
    if (p.dvPath.isDefined ||
        p.filters.flatMap(_.references).exists(r =>
          p.aliasMap.contains(r) || p.widened.contains(r))) None
    else ParquetPayload.toParquetFilter(p.filters.toSeq, full),
    p.aliasMap)
  private val dv: java.util.HashSet[java.lang.Long] = {
    val set = new java.util.HashSet[java.lang.Long]()
    p.dvPath.foreach { f =>
      java.nio.file.Files.readAllLines(java.nio.file.Paths.get(f),
        StandardCharsets.UTF_8).asScala.iterator
        .map(_.trim).filter(_.nonEmpty).foreach(l => set.add(l.toLong))
    }
    set
  }
  private var pos = -1L
  private var current: InternalRow = _

  private def render(row: InternalRow, i: Int, dt: DataType): String =
    dt match {
      case LongType => row.getLong(i).toString
      case IntegerType => row.getInt(i).toString
      case DoubleType => row.getDouble(i).toString
      case BooleanType => row.getBoolean(i).toString
      case StringType => row.getUTF8String(i).toString
      case other => throw new IllegalStateException(
        s"tombstone key of unsupported type $other — delete() rejects")
    }

  override def next(): Boolean = {
    var row = reader.read()
    while (row != null) {
      pos += 1
      val isDeleted = (!dv.isEmpty && dv.contains(pos)) ||
        deleted.exists { case (i, dt, keys) =>
          !row.isNullAt(i) && keys.contains(render(row, i, dt))
        }
      if (!isDeleted) {
        current =
          if (readSchema.length == required.length) row
          else {
            // required fields are the readSchema prefix — truncate
            val vals = new Array[Any](required.length)
            var i = 0
            while (i < required.length) {
              vals(i) = row.get(i, required.fields(i).dataType)
              i += 1
            }
            new GenericInternalRow(vals)
          }
        return true
      }
      row = reader.read()
    }
    false
  }

  override def get(): InternalRow = current
  override def close(): Unit = reader.close()
}

/** One LEGACY JSONL data file → InternalRows, mirroring the retired
  * JSON writer's rendering exactly: absent/null fields → null (the
  * schema-evolution null-fill), NaN/Infinity as their quoted
  * spellings, emitting only the required (pruned) columns. Kept so
  * pre-parquet snapshots, branches, and external-committer appends
  * read unchanged.
  */
private[sources] class ManifestJsonlReader(p: ManifestFilePartition)
    extends PartitionReader[InternalRow] {
  private val schema =
    DataType.fromJson(p.schemaJson).asInstanceOf[StructType]
  private val required =
    DataType.fromJson(p.requiredJson).asInstanceOf[StructType]
  private val mapper = new ObjectMapper()
  private val deleted: Map[String, (DataType, Set[String])] =
    p.deletes.map { d =>
      d.col -> ((schema(d.col).dataType, d.keys.toSet))
    }.toMap
  private val lines = Files.readAllLines(
    Paths.get(p.absPath), StandardCharsets.UTF_8)
    .asScala.iterator.filter(_.nonEmpty)
  private val dv: java.util.HashSet[java.lang.Long] = {
    val set = new java.util.HashSet[java.lang.Long]()
    p.dvPath.foreach { f =>
      Files.readAllLines(Paths.get(f), StandardCharsets.UTF_8)
        .asScala.iterator.map(_.trim).filter(_.nonEmpty)
        .foreach(l => set.add(l.toLong))
    }
    set
  }
  private var pos = -1L
  private var current: InternalRow = _

  private val aliasMap = p.aliasMap
  private def lookup(node: JsonNode, name: String): JsonNode = {
    val direct = node.get(name)
    if (direct != null) direct
    else aliasMap.getOrElse(name, Seq.empty).iterator
      .map(node.get).find(_ != null).orNull
  }

  override def next(): Boolean = {
    while (lines.hasNext) {
      val node = mapper.readTree(lines.next())
      pos += 1
      val isDeleted = (!dv.isEmpty && dv.contains(pos)) ||
        deleted.exists { case (c, (dt, keys)) =>
        Option(lookup(node, c)).filterNot(_.isNull)
          .exists(n => keys.contains(ManifestJsonlReader.renderKey(n, dt)))
      }
      if (!isDeleted) {
        val row = new GenericInternalRow(required.length)
        required.fields.zipWithIndex.foreach { case (f, i) =>
          val n = lookup(node, f.name)
          if (n == null || n.isNull) row.setNullAt(i)
          else f.dataType match {
            case LongType => row.setLong(i, n.asLong())
            case IntegerType => row.setInt(i, n.asInt())
            case DoubleType => row.setDouble(i,
              if (n.isTextual) java.lang.Double.parseDouble(n.asText())
              else n.asDouble())
            case BooleanType => row.setBoolean(i, n.asBoolean())
            case StringType =>
              row.update(i, UTF8String.fromString(n.asText()))
            case other =>
              // legacy JSONL files never carried the typed columns;
              // an evolved schema's typed column is simply absent in
              // them (null above) — a non-null value here means an
              // external append wrote a type it shouldn't have
              throw new IllegalStateException(
                s"JSONL data file with non-null ${other.simpleString} " +
                  s"column '${f.name}' — external appends carry " +
                  "primitive columns only")
          }
        }
        current = row
        return true
      }
    }
    false
  }

  override def get(): InternalRow = current
  override def close(): Unit = ()
}

private[sources] object ManifestJsonlReader {
  /** Canonical text form of a key value for tombstone matching —
    * normalized THROUGH the column's type so every JSON spelling of
    * the same value matches (3 vs 3.0 vs "NaN").
    */
  def renderKey(n: JsonNode, dt: DataType): String = dt match {
    case LongType => n.asLong().toString
    case IntegerType => n.asInt().toString
    case DoubleType =>
      (if (n.isTextual) java.lang.Double.parseDouble(n.asText())
       else n.asDouble()).toString
    case BooleanType => n.asBoolean().toString
    case _ => n.asText()
  }
}
