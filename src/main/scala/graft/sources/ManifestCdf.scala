package graft.sources

import java.nio.file.Paths

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.functions.{col, lit}
import org.apache.spark.sql.types._

/** CHANGE FEED over a manifest table's commit history — the CDC
  * consumer surface (Delta's `table_changes` / Iceberg's changelog
  * scan in miniature): every row that became visible or stopped
  * being visible between two snapshots, tagged with
  * `_change_type` (`insert` / `delete`) and `_commit_version`.
  *
  * Derived ENTIRELY from the commit log + per-version file deltas —
  * scan cost ∝ what changed, never table size:
  *  - a `rewrite` commit (compact / zorder / binpack — recorded in
  *    the commit log's kind field) preserves row content and emits
  *    NOTHING, where a naive file diff would report the whole table
  *    churned;
  *  - files ADDED by a commit contribute their rows (that commit's
  *    deletion vectors and tombstones applied) as `insert`s;
  *  - files REMOVED contribute their previously-visible rows as
  *    `delete`s (an overwrite/upsert rewrite therefore emits
  *    delete+insert pairs — the CDC encoding of an update);
  *  - a GROWN deletion vector contributes exactly the newly-deleted
  *    positions, read back from the (immutable) data file by
  *    position — KB-sized reads for point deletes;
  *  - a NEW tombstone (key-delete) contributes the v-1-visible rows
  *    whose keys it masks.
  *
  * Schema evolution across the range null-fills: output columns are
  * the END snapshot's schema plus the two metadata columns. A
  * version expired by retention fails LOUDLY — a silent gap would
  * replay as data loss downstream.
  *
  * SQL surface: `SELECT * FROM graft_table_changes('t', v1, v2)`
  * ([[graft.functions.GraftExtensions]] table function); Scala
  * surface: [[readChanges]]; streaming surface: `readStream
  * .option("readChangeFeed", "true")` (append/rewrite commits —
  * see [[ManifestMicroBatchStream]]).
  */
object ManifestCdf {
  import ManifestV2Sink._

  val ChangeTypeCol = "_change_type"
  val CommitVersionCol = "_commit_version"

  def cdfSchema(base: StructType): StructType =
    StructType(base.fields ++ Seq(
      StructField(ChangeTypeCol, StringType, nullable = false),
      StructField(CommitVersionCol, LongType, nullable = false)))

  /** All change rows in the half-open version range (fromV, toV]. */
  def readChanges(spark: SparkSession, path: String, fromV: Int,
      toV: Int): DataFrame = {
    require(fromV >= 0 && toV >= fromV,
      s"bad change range ($fromV, $toV]")
    val have = versions(path)
    require(have.nonEmpty, s"no snapshots at $path")
    require(toV <= have.max, s"no snapshot v$toV at $path " +
      s"(head is v${have.max})")
    val endSchema = snapshotAt(path, toV)._1
    val kinds = commitKinds(path)
    val frames = ((fromV + 1) to toV).flatMap { v =>
      if (kinds.get(v).contains("rewrite")) Seq.empty
      else versionChanges(spark, path, v)
    }
    val out = cdfSchema(endSchema)
    if (frames.isEmpty)
      spark.createDataFrame(
        new java.util.ArrayList[org.apache.spark.sql.Row](), out)
    else
      frames.reduce(_.unionByName(_, allowMissingColumns = true))
        .select(out.fieldNames.map(col).toSeq: _*)
  }

  private def snapshotAt(path: String,
      v: Int): (StructType, Seq[String]) =
    if (v == 0)
      // v0 = before the first commit: empty table, schema irrelevant
      // (callers only diff against it)
      (StructType(Seq.empty), Seq.empty)
    else parseManifest(versionFile(path, v)).getOrElse(
      throw new IllegalArgumentException(
        s"no snapshot v$v at $path (have: " +
          s"${versions(path).mkString(",")}) — retention expired it; " +
          "change feeds cannot skip versions"))

  /** The change frames of ONE commit v (diff against v-1). */
  private def versionChanges(spark: SparkSession, path: String,
      v: Int): Seq[DataFrame] = {
    val (prevSchema0, prevEntries) = snapshotAt(path, v - 1)
    val (curSchema, curEntries) = snapshotAt(path, v)
    val prevSchema =
      if (prevSchema0.isEmpty) curSchema else prevSchema0
    def tag(df: DataFrame, t: String): DataFrame =
      df.withColumn(ChangeTypeCol, lit(t))
        .withColumn(CommitVersionCol, lit(v.toLong))

    val prevData = prevEntries.filterNot(isDeleteEntry)
    val curData = curEntries.filterNot(isDeleteEntry)
    val prevByFile = prevData.map(e => entryFile(e) -> e).toMap
    val curByFile = curData.map(e => entryFile(e) -> e).toMap
    val prevTombs = prevEntries.filter(isDeleteEntry)
    val curTombs = curEntries.filter(isDeleteEntry)

    val added = curData.filterNot(e => prevByFile.contains(entryFile(e)))
    val removed =
      prevData.filterNot(e => curByFile.contains(entryFile(e)))

    val inserts =
      if (added.isEmpty) Seq.empty
      else Seq(tag(
        readEntries(spark, path, curSchema, added ++ curTombs),
        "insert"))
    val deletes =
      if (removed.isEmpty) Seq.empty
      else Seq(tag(
        readEntries(spark, path, prevSchema, removed ++ prevTombs),
        "delete"))

    // grown deletion vectors: the newly-dead positions, read back by
    // position from the unchanged data file (deleteWhere refuses to
    // run over tombstones, so DV deltas never need tombstone masking)
    val dvDeletes = curData.flatMap { e =>
      val f = entryFile(e)
      prevByFile.get(f).toSeq.flatMap { pe =>
        if (entryDv(e) == entryDv(pe)) Seq.empty
        else {
          val curPos = entryDv(e).map(d => readDv(path, d._1).toSet)
            .getOrElse(Set.empty[Long])
          val prevPos = entryDv(pe).map(d => readDv(path, d._1).toSet)
            .getOrElse(Set.empty[Long])
          val fresh = (curPos -- prevPos).toArray.sorted
          if (fresh.isEmpty) Seq.empty
          else Seq(tag(readFilePositions(spark, path, prevSchema, pe,
            fresh), "delete"))
        }
      }
    }

    // new tombstones: v-1-visible rows their keys mask. Single key
    // column (the committed shape) → multiset-exact left-semi join;
    // a multi-column tombstone commit falls back to exceptAll (a row
    // matching two key sets must still delete ONCE).
    val newTombs = curTombs.filterNot(prevTombs.toSet)
    val tombDeletes =
      if (newTombs.isEmpty) Seq.empty
      else {
        val stateAtPrev = readEntries(spark, path, prevSchema,
          prevEntries)
        val groups = newTombs.map { e =>
          val p = e.split("\t"); (p(1), p(2))
        }.groupBy(_._1).toSeq.sortBy(_._1)
        def keysDf(keyCol: String,
            files: Seq[(String, String)]): DataFrame = {
          val cur =
            if (prevSchema.fieldNames.contains(keyCol)) keyCol
            else columnAliases(path).collectFirst {
              case (c, past) if past.contains(keyCol) => c
            }.getOrElse(keyCol)
          val kt = StructType(
            Seq(prevSchema(cur).copy(name = keyCol)))
          spark.read.schema(kt).json(
            files.map(f => Paths.get(path, f._2).toString): _*)
            .toDF(cur).distinct()
        }
        if (groups.length == 1) {
          val (keyCol, files) = groups.head
          val ks = keysDf(keyCol, files)
          Seq(tag(stateAtPrev.join(ks, ks.columns.toSeq, "left_semi"),
            "delete"))
        } else {
          val survivors = groups.foldLeft(stateAtPrev) {
            case (df, (keyCol, files)) =>
              val ks = keysDf(keyCol, files)
              df.join(ks, ks.columns.toSeq, "left_anti")
          }
          Seq(tag(stateAtPrev.exceptAll(survivors), "delete"))
        }
      }

    inserts ++ deletes ++ dvDeletes ++ tombDeletes
  }

  /** Rows of one committed file at exact DECODE positions (the DV
    * coordinate system) — one bounded task, no row-group skipping,
    * no DV applied, matching the probe that wrote the positions.
    */
  private[sources] def readFilePositions(spark: SparkSession,
      path: String, schema: StructType, entry: String,
      positions: Array[Long]): DataFrame = {
    val schemaJson = schema.json
    val aliasesEnc = columnAliases(path).toArray.sortBy(_._1)
      .map { case (c, past) => s"$c=${past.mkString(",")}" }
    val ap = Paths.get(path, entryFile(entry)).toString
    val rdd = spark.sparkContext.parallelize(Seq(ap), 1)
      .flatMap { absPath =>
        val part = ManifestFilePartition(absPath, schemaJson,
          schemaJson, Array.empty, Array.empty, columnarOk = false,
          dvPath = None, aliases = aliasesEnc)
        val reader: org.apache.spark.sql.connector.read.PartitionReader[
          InternalRow] =
          if (absPath.endsWith(".parquet"))
            new ManifestParquetReader(part)
          else new ManifestJsonlReader(part)
        val want = new java.util.HashSet[java.lang.Long]()
        positions.foreach(want.add(_))
        new Iterator[InternalRow] {
          private var pos = -1L
          private var done = false
          private var pending: InternalRow = _
          private def advance(): Unit =
            while (pending == null && !done) {
              if (reader.next()) {
                pos += 1
                if (want.contains(pos)) pending = reader.get()
              } else { reader.close(); done = true }
            }
          override def hasNext: Boolean = { advance(); pending != null }
          override def next(): InternalRow = {
            advance(); val r = pending; pending = null; r
          }
        }
      }
    org.apache.spark.sql.graftbridge.bridge
      .ofInternalRows(spark, rdd, schema)
  }
}
