package graft.sources

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import java.util

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Scan, ScanBuilder}
import org.apache.spark.sql.connector.read.streaming.MicroBatchStream
import org.apache.spark.sql.connector.write.{BatchWrite, DataWriter, DataWriterFactory, LogicalWriteInfo, PhysicalWriteInfo, SupportsTruncate, Write, WriteBuilder, WriterCommitMessage}
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** DataSource V2 WRITE path — the transactional half of the connector
  * surface ([[SyntheticV2Source]] is the read half): a
  * manifest-committed batch sink with the Iceberg/Delta core idea in
  * miniature.
  *
  * Protocol (the part that matters at any scale):
  *  - every task writes its rows to a STAGED file keyed by
  *    (queryId, partitionId, taskId) — concurrent attempts of the same
  *    partition (retries, speculation) write DIFFERENT files and never
  *    interfere;
  *  - a task's `commit()` hands the driver just the staged file name;
  *    Spark's commit coordinator guarantees at most one attempt per
  *    partition commits, and losing attempts get `abort()` → their
  *    staged files are deleted;
  *  - the job-level `commit()` promotes the committed attempts' files
  *    into the data directory and then publishes ONE manifest file by
  *    atomic rename. Readers resolve the manifest first and read only
  *    the files it lists — a crash at ANY earlier point leaves the
  *    previous manifest (and therefore the previous table state)
  *    fully intact; promoted-but-unreferenced files are garbage, not
  *    corruption (a vacuum sweep reclaims them);
  *  - `mode("append")` merges the old manifest's file list;
  *    `mode("overwrite")` arrives as [[SupportsTruncate]] and replaces
  *    it. The manifest also carries the schema, so reads need no
  *    inference pass;
  *  - every publish ALSO lands an immutable `_MANIFEST.vNNNNN`
  *    snapshot (before the pointer moves — the pointer rename stays
  *    the commit point). Data files are never rewritten in place, so
  *    [[ManifestV2Sink.readVersion]] is exact TIME TRAVEL until the
  *    caller expires version files, and [[ManifestV2Sink
  *    .unreferencedFiles]] releases a file only when NO retained
  *    manifest — current or snapshot — references it.
  *
  * Data files are PARQUET ([[ParquetPayload]]): columnar, compressed,
  * dictionary/RLE-encoded, with row-group statistics — so a committed
  * table read prunes columns and skips row groups like any production
  * lake table, which at 100 TB is most of the read cost. Columns
  * carry BIGINT/INT/DOUBLE/BOOLEAN/STRING plus DATE/TIMESTAMP/
  * DECIMAL(p,s) natively. The manifest PROTOCOL is format-agnostic:
  * legacy JSONL data files stay fully readable (readers dispatch on
  * extension — old snapshots and branches time-travel unchanged), and
  * the metadata-sized tombstone key files remain JSONL deliberately.
  * Files here move through `java.nio` against a shared filesystem
  * (the local[32] rig); a cluster port swaps in the Hadoop
  * `FileSystem` calls one-for-one (same rename-commit contract HDFS
  * and object-store committers provide).
  *
  * Concurrency note: the manifest commit is read-merge-publish, so
  * concurrent APPENDs to the same head must serialize or the last
  * pointer rename silently drops the other writer's files from the
  * committed view. Two layers make that hold for ANY mix of writers:
  *  - IN-PROCESS writers (many threads, one JVM) serialize through a
  *    per-path striped monitor ([[ManifestV2Sink.commitLock]]) — the
  *    cheap fast path that also keeps one JVM's threads from spinning
  *    on the OS lock below;
  *  - CROSS-PROCESS writers serialize through the table's CATALOG CAS
  *    section ([[ManifestV2Sink.withHeadLock]]): an OS advisory file
  *    lock (`_MANIFEST.lock`) held across read→merge→publish. A
  *    writer that arrives while another process is committing blocks,
  *    then RE-READS the (now advanced) head and merges its files onto
  *    it — the Iceberg validate-base/re-merge/retry loop with the
  *    retry bound enforced by the lock instead of by spinning. On a
  *    POSIX shared FS the advisory lock IS the atomic primitive a
  *    catalog provides; an object-store port swaps this seam for the
  *    catalog's conditional-put and turns the blocking re-read into
  *    the bounded optimistic retry (same section, same contract —
  *    pure rename-based CAS without such a primitive has an
  *    unfixable pointer-inversion race, which is why HadoopCatalog-
  *    style version-hint schemes are deprecated upstream).
  * The snapshot MINT is additionally safe against writers that bypass
  * both layers (hard-link create-if-absent: two committers can never
  * publish the same vNNNNN), so a rogue writer can at worst lose its
  * own files from the head — never corrupt or overwrite a published
  * snapshot.
  */
class ManifestV2Sink extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-manifest"

  // write-side schema comes from the DataFrame being written
  override def supportsExternalMetadata(): Boolean = true

  override def inferSchema(options: CaseInsensitiveStringMap): StructType = {
    val path = ManifestV2Sink.pathOf(options)
    // a branch read must infer the BRANCH head's schema — it may have
    // evolved independently of main's; a time-travel read must infer
    // the SNAPSHOT's schema — it may predate an add-column evolution
    val head = (Option(options.get("branch")),
        Option(options.get("asOfVersion"))) match {
      case (Some(_), Some(_)) => throw new IllegalArgumentException(
        "graft-manifest: branch and asOfVersion are mutually exclusive")
      case (Some(b), None) => ManifestV2Sink.parseManifest(
        ManifestV2Sink.branchFile(path, b))
      case (None, Some(v)) => ManifestV2Sink.parseManifest(
        ManifestV2Sink.versionFile(path, ManifestV2Sink.parseVersion(v)))
      case (None, None) => ManifestV2Sink.readManifest(path)
    }
    val base = head.map(_._1).getOrElse(
      throw new IllegalArgumentException(
      s"graft-manifest: no manifest at $path" +
        Option(options.get("branch")).map(b => s" (branch $b)").getOrElse("") +
        Option(options.get("asOfVersion")).map(v => s" (v$v)").getOrElse("") +
        " — write first, or read via ManifestV2Sink.readCommitted"))
    // a change-feed read serves the table schema PLUS the two change
    // metadata columns (Delta's readChangeFeed shape)
    if (options.getBoolean("readChangeFeed", false))
      ManifestCdf.cdfSchema(base)
    else base
  }

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table = {
    val opts = new CaseInsensitiveStringMap(properties)
    new ManifestTable(schema, ManifestV2Sink.pathOf(opts),
      Option(opts.get("branch")),
      Option(opts.get("asOfVersion")).map(ManifestV2Sink.parseVersion),
      cdf = opts.getBoolean("readChangeFeed", false))
  }
}

object ManifestV2Sink {
  private[sources] def pathOf(opts: CaseInsensitiveStringMap): String =
    Option(opts.get("path")).getOrElse(
      throw new IllegalArgumentException("graft-manifest requires a path"))

  private def manifestFile(path: String): Path = Paths.get(path, "_MANIFEST")

  /** Parse a caller-supplied snapshot-number option with the same
    * descriptive error on every entry path (catalog `VERSION AS OF`
    * and the DataFrame reader's `asOfVersion` option) — a malformed
    * value must never surface as a bare NumberFormatException.
    */
  private[sources] def parseVersion(v: String): Int =
    try v.trim.toInt catch {
      case _: NumberFormatException => throw new IllegalArgumentException(
        s"graft asOfVersion takes a snapshot number, got '$v'")
    }

  /** Per-table commit lock for IN-PROCESS writers: held across the
    * read-merge-publish of a head pointer so two concurrent appends
    * can never both read the same `previous` and drop each other's
    * files. STRIPED by the normalized absolute path's hash (two
    * spellings of one table must share a lock) — a hash collision
    * merely over-serializes two unrelated tables' commits, while a
    * per-path map would grow one permanent entry for every ephemeral
    * scratch table ever written. Monitor locks are reentrant, so
    * composite operations ([[upsert]], [[compact]]) that commit
    * through the normal write path can hold it around their own
    * read-modify-write.
    */
  private val commitLockStripes = Array.fill(256)(new Object)
  private[sources] def commitLock(path: String): Object = {
    val canonical = Paths.get(path).toAbsolutePath.normalize.toString
    commitLockStripes(math.floorMod(canonical.hashCode, 256))
  }

  private[sources] def versionFile(path: String, v: Int): Path =
    Paths.get(path, f"_MANIFEST.v$v%05d")

  /** The table's cross-process commit section — the catalog CAS seam:
    * an OS advisory lock (`FileChannel.lock` on `_MANIFEST.lock`)
    * held across a head's read→merge→publish, so concurrent
    * committers FROM DIFFERENT PROCESSES serialize and each one
    * merges onto the head its predecessor actually published (see the
    * class scaladoc for why a lockless rename-only CAS cannot work on
    * a plain filesystem). One lock per table dir covers all heads
    * (main + branches): they share the snapshot version space, so
    * cross-head commits serialize too.
    *
    * Intra-JVM, overlapping `FileChannel` locks THROW rather than
    * block; in-process writers normally never overlap (the striped
    * monitor serializes them first), but a same-JVM caller that
    * bypasses the stripe — or two tables colliding onto one stripe
    * released between sections — degrades to a short sleep-retry
    * loop, not a failure.
    */
  private final class HeldHeadLock(
      val ch: java.nio.channels.FileChannel,
      val lock: java.nio.channels.FileLock,
      var depth: Int)

  // per-thread re-entrancy table: OS file locks are held per-JVM, not
  // per-thread, so a composite operation (upsert → inner DSv2 commit)
  // re-taking the section on the same thread must not spin on itself —
  // it bumps the depth instead, and the lock releases when the
  // OUTERMOST scope exits (monitor-lock semantics, hand-rolled)
  private val heldHeadLocks =
    new ThreadLocal[scala.collection.mutable.Map[String, HeldHeadLock]] {
      override def initialValue() =
        scala.collection.mutable.Map.empty[String, HeldHeadLock]
    }

  private[sources] def withHeadLock[A](path: String)(body: => A): A = {
    val key = Paths.get(path).toAbsolutePath.normalize.toString
    val held = heldHeadLocks.get()
    held.get(key) match {
      case Some(h) =>
        h.depth += 1
        try body finally h.depth -= 1
      case None =>
        Files.createDirectories(Paths.get(path))
        val ch = java.nio.channels.FileChannel.open(
          Paths.get(path, "_MANIFEST.lock"),
          java.nio.file.StandardOpenOption.CREATE,
          java.nio.file.StandardOpenOption.WRITE)
        try {
          var lock: java.nio.channels.FileLock = null
          while (lock == null) {
            // another PROCESS holding the lock blocks us inside
            // ch.lock(); another THREAD of this JVM (possible only for
            // callers bypassing the striped monitor) surfaces as
            // OverlappingFileLockException — degrade to sleep-retry
            try lock = ch.lock()
            catch {
              case _: java.nio.channels.OverlappingFileLockException =>
                Thread.sleep(5)
            }
          }
          held(key) = new HeldHeadLock(ch, lock, 1)
          try body
          finally { held.remove(key); lock.release() }
        } finally ch.close()
    }
  }

  /** Commit pre-serialized JSONL rows as ONE data file from outside a
    * Spark write — the external-committer path (a compaction daemon,
    * a sidecar ingester, the cross-process commit spec's forked
    * helper). Same protocol as a sink commit: land the file in
    * `data/` (unreferenced until published — crash debris at worst,
    * exactly like an unpromoted staged file), then read→merge→publish
    * the head under both commit layers. The schema is the committed
    * manifest's (an external append cannot invent columns); `tag`
    * must be caller-unique — it names the data file.
    */
  def appendExternal(path: String, jsonl: Seq[String], tag: String): Unit = {
    require(tag.matches("[A-Za-z0-9_-]+"), s"bad external-commit tag: $tag")
    val dataDir = Paths.get(path, "data")
    Files.createDirectories(dataDir)
    val name = s"part-ext-$tag.jsonl"
    Files.write(dataDir.resolve(name),
      (jsonl.mkString("\n") + "\n").getBytes(StandardCharsets.UTF_8))
    commitLock(path).synchronized {
      withHeadLock(path) {
        val (schema, previous) = readManifest(path).getOrElse(
          throw new IllegalArgumentException(
            s"appendExternal: no committed manifest at $path"))
        publish(path, schema, previous :+ s"data/$name", tag,
          kind = "append")
      }
    }
  }

  /** Published snapshot versions, ascending. Retention is the
    * caller's policy: deleting old version files bounds history (and
    * releases their files to [[unreferencedFiles]]) exactly like
    * expiring snapshots in a production table format.
    */
  def versions(path: String): Seq[Int] = {
    val dir = Paths.get(path)
    if (!Files.exists(dir)) Seq.empty
    else {
      val snap = "_MANIFEST\\.v(\\d+)".r
      val s = Files.list(dir)
      try s.iterator().asScala
        .map(_.getFileName.toString)
        .collect { case snap(v) => v.toInt } // never the .vtmp staging
        .toSeq.sorted
      finally s.close()
    }
  }

  private[sources] def parseManifest(mf: Path): Option[(StructType, Seq[String])] =
    if (!Files.exists(mf)) None
    else {
      val lines = Files.readAllLines(mf, StandardCharsets.UTF_8).asScala.toSeq
      val schema = DataType.fromJson(lines.head).asInstanceOf[StructType]
      // txn ledger lines (see [[parseTxns]]) are commit metadata, not
      // entries — filtered here so every entry consumer stays blind
      // to them; `seg` lines expand to the referenced SEGMENT file's
      // entries (see [[publish]] — two-level metadata), so every
      // entry consumer stays blind to the sharding too
      val entries = lines.tail.iterator
        .filter(l => l.nonEmpty && !l.startsWith("txn\t"))
        .flatMap { l =>
          if (l.startsWith("seg\t")) loadSegment(mf.getParent, l.split("\t")(1))
          else Iterator.single(l)
        }.toSeq
      Some((schema, entries))
    }

  // ------------------------------------------ manifest segmentation
  /** TWO-LEVEL manifest metadata (Iceberg's manifest-list shape, in
    * miniature): a head (or branch head, or `.vNNNNN` snapshot) body
    * may carry, in place of inline entry lines,
    * `seg<TAB><name><TAB><count>` references to IMMUTABLE segment
    * files (`_MANIFEST.seg.*` in the table dir, entry lines only).
    * [[publish]] reuses every referenced segment whose entries all
    * survive into the new commit verbatim, so the bytes a commit
    * writes are O(changed entries + segment count), NOT O(table
    * files) — the difference between a streaming trigger costing a
    * few KB and re-serializing the whole file inventory (at 100 TB:
    * hundreds of MB) on every micro-batch. Version snapshots
    * hard-link the same small body, so time travel and branches get
    * the savings for free; segments are shared structurally across
    * heads and history, and reclaimed by [[vacuum]] only when NO
    * retained head/branch/snapshot references them. Segments are
    * immutable once published, so [[loadSegment]] caches by absolute
    * path process-wide — repeated query planning re-reads only
    * segments it has never seen.
    */
  private val segCache =
    new java.util.concurrent.ConcurrentHashMap[String, Seq[String]]()

  /** Entry count at or below which a commit's residual (entries not
    * covered by a reused segment) stays INLINE in the head — small
    * tables keep the flat single-file format (and its fixture cost)
    * exactly as before segmentation existed. Tunable for tests/ops
    * via `-Dgraft.manifest.seg.inlineMax`.
    */
  private def SegInlineMax: Int =
    sys.props.get("graft.manifest.seg.inlineMax").map(_.toInt).getOrElse(16)

  /** Referenced-segment count that triggers a FOLD: the commit
    * ignores reuse and rewrites all entries into one segment —
    * amortized O(table) every ~SegFoldAt commits, bounding both head
    * size and planning fan-out (Iceberg's rewrite-manifests, inlined
    * into the commit path). Tunable via `-Dgraft.manifest.seg.foldAt`.
    */
  private def SegFoldAt: Int =
    sys.props.get("graft.manifest.seg.foldAt").map(_.toInt).getOrElse(64)

  private[sources] def loadSegment(dir: Path, name: String): Seq[String] = {
    val key = dir.resolve(name).toAbsolutePath.normalize.toString
    val hit = segCache.get(key)
    if (hit != null) hit
    else {
      val es = Files.readAllLines(Paths.get(key), StandardCharsets.UTF_8)
        .asScala.toSeq.filter(_.nonEmpty)
      if (segCache.size > 8192) segCache.clear() // unbounded-growth guard
      segCache.putIfAbsent(key, es)
      es
    }
  }

  /** Raw `seg` reference names of a manifest body (no expansion) —
    * the reclamation scan ([[unreferencedSegments]]) and the O(new)
    * reuse pass in [[publish]] read refs without loading entries.
    * Public as the segmentation observability surface (which
    * segments a head references — the evidence the commit-cost
    * lifecycle query pins).
    */
  def segRefsOf(mf: Path): Seq[String] =
    if (!Files.exists(mf)) Seq.empty
    else Files.readAllLines(mf, StandardCharsets.UTF_8).asScala
      .iterator.filter(_.startsWith("seg\t")).map(_.split("\t")(1)).toSeq

  /** Write one immutable segment file holding `entries`; returns its
    * `seg` reference line. Unique name → CREATE_NEW can never clash;
    * a crash before the head publish leaves an unreferenced segment —
    * garbage, not corruption ([[vacuum]] reclaims it).
    */
  private def writeSegment(path: String, tag: String,
      entries: Seq[String]): String = {
    val safe = tag.replaceAll("[^A-Za-z0-9_-]", "_").take(24)
    val name = s"_MANIFEST.seg.$safe." +
      java.util.UUID.randomUUID().toString.take(12)
    Files.write(Paths.get(path, name),
      (entries.mkString("\n") + "\n").getBytes(StandardCharsets.UTF_8),
      java.nio.file.StandardOpenOption.CREATE_NEW)
    s"seg\t$name\t${entries.length}"
  }

  /** The STREAMING-COMMIT ledger carried INSIDE the manifest body
    * (`txn<TAB>writerId<TAB>epoch` lines after the schema, before the
    * entries — Delta's SetTransaction action in miniature): the
    * highest epoch each streaming writer has committed to this
    * pointer. Because the ledger rides the same atomic pointer rename
    * as the entry list, "did epoch N commit?" and the commit itself
    * can never disagree — the crash window a sidecar ledger file
    * would have between publish and ledger update does not exist.
    * [[publish]] carries the previous ledger forward on every commit
    * (one line per writer id, latest epoch wins), so the ledger
    * survives unrelated commits, overwrites, and compactions.
    */
  private[sources] def parseTxns(mf: Path): Map[String, Long] =
    if (!Files.exists(mf)) Map.empty
    else Files.readAllLines(mf, StandardCharsets.UTF_8).asScala
      .iterator.filter(_.startsWith("txn\t"))
      .flatMap { l =>
        l.split("\t", 3) match {
          case Array(_, q, e) => scala.util.Try(q -> e.toLong).toOption
          case _ => None
        }
      }.toMap

  /** Highest committed streaming epoch of `writerId` on main, or -1. */
  def streamEpochCommitted(path: String, writerId: String): Long =
    parseTxns(manifestFile(path)).getOrElse(writerId, -1L)

  /** The full streaming-commit ledger of main (writerId → highest
    * committed epoch) — the evidence surface of the streamed-ingest
    * lifecycle queries.
    */
  def streamTxns(path: String): Map[String, Long] =
    parseTxns(manifestFile(path))

  /** Parse the current manifest: (schema, committed ENTRIES). Line 1
    * is the schema json; each further line is one entry:
    *  - DATA entry: `relpath` (legacy, statless) or
    *    `relpath<TAB>S|col:K:min:max|...` — per-file min/max column
    *    stats recorded at write time (K = L for integral/date/
    *    timestamp, D for double, B for exact decimal), the metadata
    *    DATA SKIPPING reads ([[readPruned]]);
    *  - DELETE entry (merge-on-read, [[delete]]):
    *    `delete<TAB>keyCol<TAB>relpath` — the file holds keys whose
    *    rows are anti-joined out of every read of this manifest.
    * File names never contain tabs and data relpaths always start
    * with `data/`, so the literal first token `delete` is
    * unambiguous. Entries flow through merge/branch bookkeeping as
    * raw strings — stats are deterministic per immutable file, so
    * string equality remains file identity.
    */
  private[sources] def readManifest(path: String): Option[(StructType, Seq[String])] =
    parseManifest(manifestFile(path))

  /** The relative file name inside an entry (data or delete). */
  private[sources] def entryFile(entry: String): String = {
    val parts = entry.split("\t")
    if (parts(0) == "delete") parts(2) else parts(0)
  }

  private[sources] def isDeleteEntry(entry: String): Boolean =
    entry.startsWith("delete\t")

  /** Per-column (min, max) stats of a data entry, exact: integral
    * bounds parse through BigDecimal(Long), double bounds through
    * BigDecimal(double) — both lossless, so pruning comparisons never
    * round. Statless (legacy) entries return empty — treated as
    * unprunable, never skipped.
    */
  private[sources] def entryStats(
      entry: String): Map[String, (BigDecimal, BigDecimal)] = {
    val parts = entry.split("\t")
    if (parts(0) == "delete" || parts.length < 2 ||
      !parts(1).startsWith("S|")) Map.empty
    else parts(1).drop(2).split('|').iterator.map { c =>
      val Array(name, kind, mn, mx) = c.split(":", 4)
      val (lo, hi) = kind match {
        case "L" => (BigDecimal(mn.toLong), BigDecimal(mx.toLong))
        case "B" => (BigDecimal(mn), BigDecimal(mx)) // exact decimal
        case _ => (BigDecimal(mn.toDouble), BigDecimal(mx.toDouble))
      }
      name -> ((lo, hi))
    }.toMap
  }

  /** True iff a committed manifest exists at `path` — the probe the
    * content-addressed artifact seam uses to reuse a previous
    * session's publish without rebuilding.
    */
  def hasCommitted(path: String): Boolean = readManifest(path).isDefined

  // --------------------------------------------- partitioned layout
  /** Escape a STRING partition value for the `P|col:value|...` blob:
    * percent-encodes the blob's reserved characters. Null renders as
    * `%00` — unreachable as an escaped real value (real escaping only
    * emits the codes below), so null never collides with content.
    */
  private[sources] def escapePart(s: String): String = {
    val sb = new StringBuilder(s.length + 4)
    s.foreach {
      case '%' => sb ++= "%25"
      case ':' => sb ++= "%3A"
      case '|' => sb ++= "%7C"
      case '\t' => sb ++= "%09"
      case '\n' => sb ++= "%0A"
      case '\r' => sb ++= "%0D"
      case c => sb += c
    }
    sb.result()
  }

  // ------------------------------------------ column-identity ledger
  /** The COLUMN-IDENTITY ledger (`_MANIFEST.colids` sidecar): one line
    * per column id ever assigned — `id<TAB>live|dropped<TAB>
    * name1,name2,...` with the name history chronological (last =
    * current). This is Iceberg's field-id idea in name-mapping form:
    * data files keep their WRITE-TIME column names forever (immutable
    * files), so a rename must not re-resolve them by the new name —
    * readers search the current name first, then the id's past names
    * ([[columnAliases]]), and a DROP tombstones the id so its names
    * can never be silently re-bound to old data (re-ADD of any past
    * name is refused loudly). Absent sidecar (legacy tables) lazily
    * initializes from the current schema. Ids are never reused.
    */
  private[sources] def colIdsFile(path: String): Path =
    Paths.get(path, "_MANIFEST.colids")

  private[sources] def loadColIds(
      path: String): Seq[(Int, Boolean, Seq[String])] = {
    val f = colIdsFile(path)
    if (Files.exists(f))
      Files.readAllLines(f, StandardCharsets.UTF_8).asScala.toSeq
        .filter(_.nonEmpty).map { line =>
          val Array(id, status, names) = line.split("\t", 3)
          (id.toInt, status == "live", names.split(",").toSeq)
        }
    else readManifest(path).map(_._1).map { schema =>
      schema.fields.zipWithIndex.map { case (fd, i) =>
        (i, true, Seq(fd.name))
      }.toSeq
    }.getOrElse(Seq.empty)
  }

  private[sources] def saveColIds(path: String,
      ids: Seq[(Int, Boolean, Seq[String])]): Unit = {
    val body = ids.map { case (id, live, names) =>
      s"$id\t${if (live) "live" else "dropped"}\t${names.mkString(",")}"
    }.mkString("\n") + "\n"
    val tmp = Paths.get(path, "_MANIFEST.colids.tmp")
    Files.write(tmp, body.getBytes(StandardCharsets.UTF_8))
    Files.move(tmp, colIdsFile(path), StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
    ()
  }

  // ------------------------------------------ type-widening sidecar
  /** Columns whose type was ever WIDENED (`_MANIFEST.widened`, one
    * name per line): pre-widen files keep their narrower physical
    * encoding forever (immutable files), and both read tiers promote
    * at decode time (Spark's parquet readers natively, the row
    * materializer via its promotion converters). The sidecar's one
    * load-bearing job is FILTER hygiene: a parquet row-group
    * predicate built with the WIDE type against a narrow file column
    * is a physical-type mismatch, so readers drop parquet-level
    * filters referencing these columns (manifest-level stats
    * skipping still applies — `L`-kind bounds are width-agnostic —
    * and Spark re-applies every filter as residual).
    */
  private[sources] def widenedColumns(path: String): Set[String] = {
    val f = Paths.get(path, "_MANIFEST.widened")
    if (!Files.exists(f)) Set.empty
    else Files.readAllLines(f, StandardCharsets.UTF_8).asScala
      .map(_.trim).filter(_.nonEmpty).toSet
  }

  private[sources] def recordWidened(path: String, col: String): Unit = {
    Files.write(Paths.get(path, "_MANIFEST.widened"),
      s"$col\n".getBytes(StandardCharsets.UTF_8),
      java.nio.file.StandardOpenOption.CREATE,
      java.nio.file.StandardOpenOption.APPEND)
    ()
  }

  /** current name → past names (newest-first), for live renamed
    * columns only; empty for never-renamed tables.
    */
  def columnAliases(path: String): Map[String, Seq[String]] =
    loadColIds(path).collect {
      case (_, true, names) if names.length > 1 =>
        names.last -> names.init.reverse
    }.toMap

  /** Every name ever used by any column id (live or dropped) EXCEPT
    * the live current names — the set ADD/RENAME must not collide
    * with (binding a new column to a name old files still carry would
    * silently resurrect their data under it).
    */
  private[sources] def retiredColumnNames(path: String): Set[String] = {
    val ids = loadColIds(path)
    val current = ids.collect { case (_, true, names) => names.last }
    ids.flatMap { case (_, live, names) =>
      if (live) names.init else names
    }.toSet -- current
  }

  /** Inverse of [[escapePart]] — the actual string value of a
    * recorded partition blob (callers handle `%00` null sentinels
    * before calling).
    */
  private[sources] def unescapePart(s: String): String = {
    val sb = new StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      if (s.charAt(i) == '%' && i + 2 < s.length + 1 && i + 3 <= s.length) {
        s.substring(i + 1, i + 3) match {
          case "25" => sb += '%'; i += 3
          case "3A" => sb += ':'; i += 3
          case "7C" => sb += '|'; i += 3
          case "09" => sb += '\t'; i += 3
          case "0A" => sb += '\n'; i += 3
          case "0D" => sb += '\r'; i += 3
          case _ => sb += s.charAt(i); i += 1
        }
      } else { sb += s.charAt(i); i += 1 }
    }
    sb.result()
  }

  /** The recorded partition values of a data entry (`P|col:value|...`,
    * an optional tab field) — empty for files written without a
    * partition spec: those are unprunable by partition, never skipped.
    * Values are the writer's canonical renderings (escaped strings,
    * plain integral/boolean text, `%00` for null).
    */
  private[sources] def entryPartition(entry: String): Map[String, String] = {
    val parts = entry.split("\t")
    parts.iterator.drop(1).find(_.startsWith("P|")).map { blob =>
      blob.drop(2).split('|').iterator.map(_.split(":", 2))
        .collect { case Array(c, v) => c -> v }.toMap
    }.getOrElse(Map.empty)
  }

  /** PARTITION PRUNING — the skip a lake consults BEFORE per-file
    * stats: data entries whose recorded partition value for `column`
    * equals `value` (canonically rendered), plus every entry carrying
    * no partition value for the column (unpartitioned/legacy:
    * unprunable, never skipped). Works for string columns, where
    * min/max stats are never recorded — the date/source/lang
    * partition layouts every 100-TB ingest writes first.
    */
  def prunedPartitionFiles(path: String, column: String,
      value: String): Seq[String] = {
    val want = escapePart(value)
    readManifest(path).map(_._2).getOrElse(Seq.empty)
      .filterNot(isDeleteEntry)
      .filter(e => entryPartition(e).get(column).forall(_ == want))
      .map(entryFile)
  }

  /** Single-partition read through [[prunedPartitionFiles]] — same
    * residual-predicate contract as [[readPruned]] (unpartitioned
    * files may contribute rows with other values; apply the equality
    * on top), tombstones still reconciled.
    */
  def readPartition(spark: SparkSession, path: String, column: String,
      value: String): DataFrame = {
    val (schema, entries) = readManifest(path).getOrElse(
      throw new IllegalArgumentException(s"no manifest at $path"))
    val keep = prunedPartitionFiles(path, column, value).toSet
    readEntries(spark, path, schema, entries.filter(e =>
      isDeleteEntry(e) || keep(entryFile(e))))
  }

  /** An entry's partition value for `column` parsed as an exact
    * number — None when the entry has no partition value there or the
    * value isn't numeric (string partitions prune by equality only).
    */
  private def partValueNum(entry: String,
      column: String): Option[BigDecimal] =
    entryPartition(entry).get(column).filter(_ != "%00")
      .flatMap(v => scala.util.Try(BigDecimal(v)).toOption)

  /** SCHEMA EVOLUTION merge, applied at every append commit: the
    * published schema is the union of the table's current columns and
    * the incoming write's, prior columns first (stable reader order),
    * new columns appended. Rules (the Iceberg add-column subset):
    *  - ADD: a column the table has never seen joins the schema; rows
    *    in files written before it existed read back NULL (the JSONL
    *    data format null-fills absent fields natively, so no file is
    *    rewritten — evolution is a metadata-only commit).
    *  - OMIT: a writer missing a table column is fine — its rows read
    *    back NULL there; the column is never dropped from the schema,
    *    so older files stay fully readable.
    *  - TYPE CHANGE: rejected at commit time. Silently re-typing a
    *    column would make old files parse as NULL (JSON schema
    *    mismatch) — data loss disguised as evolution. Widening
    *    (int→long) is also rejected: the stats blobs and Bloom probes
    *    key on the written type, and a reader mixing widths would
    *    prune incorrectly.
    * Every column in the merged schema is nullable by construction —
    * any file may predate (or omit) any column.
    * Time travel is unaffected: each snapshot records the schema it
    * was committed with, so [[readVersion]] before the evolution
    * reads the narrow schema.
    */
  private[sources] def mergeSchemas(prev: StructType,
      next: StructType): StructType = {
    next.fields.foreach { f =>
      prev.fields.find(_.name == f.name).foreach { p =>
        require(p.dataType == f.dataType,
          s"schema evolution cannot change column '${f.name}': " +
            s"${p.dataType.simpleString} -> ${f.dataType.simpleString} " +
            "(add new columns; never re-type existing ones)")
      }
    }
    StructType(prev.fields.map(_.copy(nullable = true)) ++
      next.fields.filterNot(f => prev.fieldNames.contains(f.name))
        .map(_.copy(nullable = true)))
  }

  /** Read a manifest state: data entries minus merge-on-read
    * tombstones. Delete files group by key column; each group is one
    * key-distinct anti join — the reconcile a MOR reader pays instead
    * of the copy-on-write rewrite the writer skipped.
    */
  /** Read a set of committed data files with the table schema,
    * dispatching on extension: parquet payloads through Spark's
    * native (vectorized, pruning, pushdown-capable) parquet source,
    * legacy JSONL through the JSON source — absent columns null-fill
    * in both (the schema-evolution contract), so mixed-format tables
    * read as one frame.
    */
  private[sources] def readDataFiles(spark: SparkSession, path: String,
      schema: StructType, files: Seq[String]): DataFrame =
    if (files.isEmpty)
      spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    else {
      val (pq, jl) = files.partition(_.endsWith(".parquet"))
      Seq(
        Option.when(pq.nonEmpty)(spark.read.schema(schema).parquet(
          pq.map(f => Paths.get(path, f).toString): _*)),
        Option.when(jl.nonEmpty)(spark.read.schema(schema).json(
          jl.map(f => Paths.get(path, f).toString): _*))
      ).flatten.reduce(_.unionByName(_))
    }

  /** DV-APPLIED read of specific data entries through the per-file
    * readers (one task per file — positions are only defined by the
    * sequential per-file decode, which Spark's splitting raw readers
    * destroy). Serves the rewrite paths and the API reads for entries
    * carrying deletion vectors; clean entries keep the fast raw path.
    */
  private[sources] def readEntriesLive(spark: SparkSession, path: String,
      schema: StructType, entries: Seq[String]): DataFrame = {
    val schemaJson = schema.json
    val aliasesEnc = columnAliases(path).toArray.sortBy(_._1)
      .map { case (c, past) => s"$c=${past.mkString(",")}" }
    val parts: Seq[(String, Option[String])] = entries.map(e =>
      (Paths.get(path, entryFile(e)).toString,
        entryDv(e).map { case (rel, _) =>
          Paths.get(path, rel).toString }))
    val rdd = spark.sparkContext
      .parallelize(parts, math.max(parts.length, 1))
      .flatMap { case (ap, dv) =>
        val part = ManifestFilePartition(ap, schemaJson, schemaJson,
          Array.empty, Array.empty, columnarOk = false, dvPath = dv,
          aliases = aliasesEnc)
        val reader: org.apache.spark.sql.connector.read.PartitionReader[
          InternalRow] =
          if (ap.endsWith(".parquet")) new ManifestParquetReader(part)
          else new ManifestJsonlReader(part)
        new Iterator[InternalRow] {
          private var done = false
          override def hasNext: Boolean =
            if (done) false
            else if (reader.next()) true
            else { reader.close(); done = true; false }
          override def next(): InternalRow = reader.get()
        }
      }
    org.apache.spark.sql.graftbridge.bridge
      .ofInternalRows(spark, rdd, schema)
  }

  /** Rows of specific DATA entries with their deletion vectors
    * applied (mixed fast raw path for clean entries + per-file live
    * path for DV'd ones) — what every rewrite reads, so a rewrite
    * never resurrects DV-deleted rows.
    */
  private[sources] def readDataEntries(spark: SparkSession, path: String,
      schema: StructType, entries: Seq[String]): DataFrame = {
    // renamed tables read per-file (the raw spark.read path resolves
    // columns by current name only — pre-rename files would null out)
    if (columnAliases(path).nonEmpty)
      return readEntriesLive(spark, path, schema, entries)
    val (dvd, clean) = entries.partition(e => entryDv(e).isDefined)
    val raw = readDataFiles(spark, path, schema, clean.map(entryFile))
    if (dvd.isEmpty) raw
    else raw.unionByName(readEntriesLive(spark, path, schema, dvd))
  }

  private[sources] def readEntries(spark: SparkSession, path: String,
      schema: StructType, entries: Seq[String]): DataFrame = {
    val base = readDataEntries(spark, path, schema,
      entries.filterNot(isDeleteEntry))
    val dels = entries.filter(isDeleteEntry)
      .map { e => val p = e.split("\t"); (p(1), p(2)) }
    val aliasMap = columnAliases(path)
    dels.groupBy(_._1).toSeq.sortBy(_._1)
      .foldLeft(base) { case (df, (keyCol, files)) =>
        // tombstone key files keep their WRITE-TIME column name; a
        // since-renamed key column resolves through the ledger
        val cur =
          if (schema.fieldNames.contains(keyCol)) keyCol
          else aliasMap.collectFirst {
            case (c, past) if past.contains(keyCol) => c
          }.getOrElse(keyCol)
        val kt = StructType(Seq(schema(cur).copy(name = keyCol)))
        val keys = spark.read.schema(kt).json(
          files.map(f => Paths.get(path, f._2).toString): _*)
          .toDF(cur)
        df.join(keys.distinct(), Seq(cur), "left_anti")
      }
  }

  /** The committed view of the table: only manifest-listed files are
    * read, with the manifest's schema — never an inference pass, never
    * a stray (crashed/unreferenced) file — and merge-on-read
    * tombstones ([[delete]]) applied.
    */
  def readCommitted(spark: SparkSession, path: String): DataFrame = {
    val (schema, entries) = readManifest(path).getOrElse(
      throw new IllegalArgumentException(s"no manifest at $path"))
    readEntries(spark, path, schema, entries)
  }

  /** Data entries whose recorded [min, max] for `column` intersects
    * [lower, upper] — plus every entry carrying no stats for the
    * column (legacy or non-numeric: unprunable, never skipped). The
    * file-skipping decision itself, exposed for plan pins and
    * in-band file-count columns.
    */
  def prunedDataFiles(path: String, column: String, lower: Long,
      upper: Long): Seq[String] = {
    val entries = readManifest(path).map(_._2).getOrElse(Seq.empty)
    val lo = BigDecimal(lower)
    val hi = BigDecimal(upper)
    entries.filterNot(isDeleteEntry).filter { e =>
      val partOk = partValueNum(e, column).forall(v => v >= lo && v <= hi)
      partOk && (entryStats(e).get(column) match {
        case Some((mn, mx)) => !(mx < lo || mn > hi)
        case None => true
      })
    }.map(entryFile)
  }

  /** DATA-SKIPPING read: the committed view restricted to the data
    * files whose per-file column stats can contain `column` ∈
    * [lower, upper] ([[prunedDataFiles]]) — the manifest-level
    * min/max pruning that makes a selective read of a 100-TB table a
    * 10-file scan instead of a 100,000-file scan. CONTRACT: every row
    * satisfying the range predicate is present (skipped files are
    * PROVABLY disjoint from the range; statless files are always
    * read); rows OUTSIDE the range may also be present — apply the
    * exact predicate on top, exactly as a reader applies its residual
    * after Iceberg/Delta file skipping. NaN never blocks pruning: a
    * range predicate is false for NaN rows, and NaN is excluded from
    * written stats. Tombstones still apply — reconcile correctness
    * does not depend on pruning.
    */
  def readPruned(spark: SparkSession, path: String, column: String,
      lower: Long, upper: Long): DataFrame = {
    val (schema, entries) = readManifest(path).getOrElse(
      throw new IllegalArgumentException(s"no manifest at $path"))
    val keep = prunedDataFiles(path, column, lower, upper).toSet
    readEntries(spark, path, schema, entries.filter(e =>
      isDeleteEntry(e) || keep(entryFile(e))))
  }

  /** MERGE-ON-READ DELETE: commit a tombstone-key file instead of
    * rewriting data — the 100-TB answer to "delete 0.1% of rows"
    * where copy-on-write ([[upsert]]) would rewrite whole partitions.
    * Keys are written WHERE THEY LIVE (one jsonl per partition,
    * straight into `data/`; unreferenced until published = crash
    * debris at worst) and committed as delete entries under the full
    * two-layer commit section. Every subsequent read reconciles by
    * anti join ([[readEntries]]); [[compact]] materializes the
    * reconcile and drops the tombstones (OPTIMIZE), which is also how
    * a deleted key becomes re-insertable — tombstones here apply to
    * the WHOLE committed view, the miniature of Iceberg's
    * sequence-number scoping (named, not implemented).
    */
  def delete(spark: SparkSession, path: String, keyCol: String,
      keys: DataFrame): Unit = {
    val tag = java.util.UUID.randomUUID().toString.take(12)
    val dataDir = Paths.get(path, "data")
    Files.createDirectories(dataDir)
    val written: Seq[String] = keys.select(keyCol).distinct().toJSON.rdd
      .mapPartitionsWithIndex { (pid, it) =>
        if (it.isEmpty) Iterator.empty
        else {
          val name = s"delete-$tag-$pid.jsonl"
          val w = Files.newBufferedWriter(
            Paths.get(path, "data", name), StandardCharsets.UTF_8)
          try it.foreach { line => w.write(line); w.write("\n") }
          finally w.close()
          Iterator(name)
        }
      }.collect().toSeq.sorted
    if (written.nonEmpty) commitLock(path).synchronized {
      withHeadLock(path) {
        val (schema, previous) = readManifest(path).getOrElse(
          throw new IllegalArgumentException(s"no manifest at $path"))
        require(schema.fieldNames.contains(keyCol),
          s"delete key $keyCol not in committed schema")
        // tombstone matching normalizes keys through a canonical text
        // render shared by the JSONL key files and both data readers;
        // date/timestamp/decimal keys have no such shared spelling —
        // predicate DELETE (file-narrowed COW) covers those instead
        require(schema(keyCol).dataType match {
          case LongType | IntegerType | DoubleType | BooleanType |
               StringType => true
          case _ => false
        }, s"MOR delete keys must be long/int/double/boolean/string; " +
          s"use a predicate DELETE for ${schema(keyCol).dataType.simpleString}")
        publish(path, schema,
          previous ++ written.map(n => s"delete\t$keyCol\tdata/$n"),
          s"delete-$tag", kind = "delete")
      }
    }
  }

  /** PREDICATE DELETE — the file-narrowed copy-on-write the r12
    * lifecycle queries were missing: `DELETE FROM t WHERE pred` plans
    * against the manifest's per-file stats and touches each file the
    * cheapest sound way:
    *  - provably ALL rows match ([[ManifestSkipping.allMatch]]: range
    *    containment + recorded zero null count) → the file is DROPPED
    *    from the manifest, zero bytes read;
    *  - provably NO row matches ([[ManifestSkipping.keepEntry]]
    *    false) → the file carries over as a raw entry, zero bytes
    *    read;
    *  - otherwise → the file is REWRITTEN without its matching rows
    *    (the residual predicate applied exactly), via the usual
    *    scratch-write → adopt → publish shape.
    * On a time-clustered table a `ts < retention_cutoff` delete drops
    * old files and rewrites only the boundary file — O(boundary), not
    * O(table). ONE atomic commit either way; the pre-delete snapshot
    * stays time-travelable. Tombstoned tables must [[compact]] first
    * (same sequencing rule as [[upsertNarrow]]).
    *
    * Returns (filesDropped, filesRewritten, filesKept).
    */
  /** Positions-per-DV knob: above this, a deletion vector stops being
    * the cheap tier and the file rewrites instead.
    */
  private[sources] val DvMaxPositions = 10000

  /** Matched-fraction knob: a DV is only taken when the matching rows
    * are ≤ this fraction of the file (point-ish deletes); bulk deletes
    * rewrite — the sidecar would otherwise grow toward the file.
    */
  private[sources] val DvMaxFraction = 0.10

  def deleteWhere(spark: SparkSession, path: String,
      filters: Seq[org.apache.spark.sql.sources.Filter])
      : (Int, Int, Int, Int) =
    commitLock(path).synchronized {
      withHeadLock(path) {
        val (schema, entries) = readManifest(path).getOrElse(
          throw new IllegalArgumentException(s"no manifest at $path"))
        require(!entries.exists(isDeleteEntry),
          "predicate DELETE over tombstones unsupported — compact first")
        val predicate = ManifestSkipping.filtersToColumn(filters)
          .getOrElse(throw new UnsupportedOperationException(
            s"unsupported DELETE predicate: ${filters.mkString(", ")}"))
        val (candidates, keep) =
          entries.partition(e => ManifestSkipping.keepEntry(e, filters))
        val (dropWhole, boundary) =
          candidates.partition(e => ManifestSkipping.allMatch(e, filters))
        // DELETION-VECTOR tier for boundary files: probe the exact
        // matching positions (one bounded task per file); a point-ish
        // match set becomes a KB-sized sidecar instead of a rewrite.
        // The probe runs in FULL-file coordinates (no DV applied), so
        // a second delete over an already-DV'd file UNIONS positions.
        var dvd = Vector.empty[String] // replaced entries (new blob)
        var probedDrop = Vector.empty[String] // probe proved all-match
        var probedKeep = Vector.empty[String] // probe proved no-match
        var rewrite = Vector.empty[String]
        boundary.foreach { e =>
          val fileRows = entryRowsBytes(e).map(_._1)
          val cap = fileRows
            .map(r => math.min((r * DvMaxFraction).toLong,
              DvMaxPositions.toLong).toInt)
            .getOrElse(DvMaxPositions)
          dvProbe(spark, path, schema, entryFile(e), filters,
            math.max(cap, 1)) match {
            case Some(pos) if pos.isEmpty && entryDv(e).isEmpty =>
              probedKeep :+= e // stats couldn't prove it; the data did
            case Some(pos) =>
              val existing = entryDv(e).map { case (rel, _) =>
                readDv(path, rel) }.getOrElse(Array.empty[Long])
              val union = (existing.toSet ++ pos).toArray.sorted
              if (fileRows.exists(_ <= union.length)) probedDrop :+= e
              else if (union.length > math.max(cap, 1)) rewrite :+= e
              else if (union.sameElements(existing)) probedKeep :+= e
              else {
                val rel = s"${entryFile(e)}.dv-" +
                  java.util.UUID.randomUUID().toString.take(8)
                Files.write(Paths.get(path, rel),
                  (union.mkString("\n") + "\n")
                    .getBytes(StandardCharsets.UTF_8))
                dvd :+= withDvBlob(e, rel, union.length)
              }
            case None => rewrite :+= e
          }
        }
        val carried = keep ++ probedKeep
        if (rewrite.isEmpty) {
          if (dropWhole.nonEmpty || probedDrop.nonEmpty || dvd.nonEmpty)
            publish(path, schema, carried ++ dvd, "delete-pred",
            kind = "delete")
        } else {
          val scratch = Paths.get(path, s"_rewrite-delete-" +
            java.util.UUID.randomUUID().toString.take(8))
          try {
            val layout = layoutOptions(path)
            // DV-aware read: a rewrite must never resurrect rows an
            // earlier deletion vector already removed
            val survivors =
              readDataEntries(spark, path, schema, rewrite)
                .where(!predicate || predicate.isNull)
            // partitioned tables: co-locate partition values per task
            // so the fan-out writer emits one file per partition, not
            // one per (task, partition) sliver
            val partCols = tablePartitionColumns(path)
            (if (partCols.nonEmpty)
               survivors.repartition(math.max(rewrite.length, 1),
                 partCols.map(org.apache.spark.sql.functions.col): _*)
             else survivors.repartition(math.max(rewrite.length, 1)))
              .write.format("graft-manifest").options(layout)
              .mode("append").save(scratch.toString)
            val adopted = adoptScratchFiles(path, scratch.toString)
            publish(path, schema, carried ++ dvd ++ adopted, "delete-pred",
              kind = "delete")
          } finally deleteRecursively(scratch)
        }
        (dropWhole.length + probedDrop.length, dvd.length,
          rewrite.length, carried.length)
      }
    }

  /** Committed delete-file (tombstone) count — zero again after a
    * [[compact]] materializes the reconcile.
    */
  def committedDeleteFileCount(path: String): Int =
    readManifest(path).map(_._2.count(isDeleteEntry)).getOrElse(0)

  /** TIME TRAVEL: the table exactly as published at snapshot `v`.
    * Valid because data files are immutable once promoted — append
    * adds files and overwrite publishes a new list, but nothing is
    * rewritten in place, so an old manifest's file list stays
    * readable until retention deletes the version file (and only
    * then does [[unreferencedFiles]] release its files).
    */
  def readVersion(spark: SparkSession, path: String, v: Int): DataFrame = {
    val (schema, entries) = parseManifest(versionFile(path, v)).getOrElse(
      throw new IllegalArgumentException(s"no snapshot v$v at $path " +
        s"(have: ${versions(path).mkString(",")})"))
    readEntries(spark, path, schema, entries)
  }

  /** INCREMENTAL READ: rows landed AFTER snapshot `sinceV` — the
    * nightly-backfill/stream-catchup path. File-level, not a diff
    * join: the new rows are exactly the head's data entries absent
    * from the base snapshot's entry list, so the scan cost is
    * proportional to WHAT ARRIVED, never the table (a 100-TB table
    * that grew 100 GB overnight reads 100 GB). Head tombstones still
    * reconcile (a consumer must never emit rows the table has since
    * deleted); a file REMOVED since the base (compaction/truncate
    * rewrite) never reappears — removal is not arrival. Row-level
    * change classification between two snapshots is the separate
    * [[readVersion]]-diff surface (`sink_manifest_changelog`); this
    * is the append-consumption half a streaming source would poll.
    * CAVEAT (file-level diff): a REWRITE commit ([[compact]]/
    * [[compactZOrder]]/[[upsert]]) re-lists surviving rows under new
    * file names, which this surface reports as arrivals — consume
    * across rewrites with the changelog diff, or poll between them
    * (Iceberg's incremental scan has the same replace-snapshot rule).
    */
  def readAppendedSince(spark: SparkSession, path: String,
      sinceV: Int): DataFrame = {
    val (schema, headEntries) = readManifest(path).getOrElse(
      throw new IllegalArgumentException(s"no manifest at $path"))
    val base = parseManifest(versionFile(path, sinceV)).getOrElse(
      throw new IllegalArgumentException(s"no snapshot v$sinceV at $path"))
      ._2.toSet
    val fresh = headEntries.filter(e =>
      isDeleteEntry(e) || !base.contains(e))
    readEntries(spark, path, schema, fresh)
  }

  /** Data entries added to the head since snapshot `sinceV` — the
    * file count [[readAppendedSince]] scans, exposed for in-band
    * work-proportionality pins.
    */
  def appendedFileCount(path: String, sinceV: Int): Int = {
    val head = readManifest(path).map(_._2).getOrElse(Seq.empty)
    val base = parseManifest(versionFile(path, sinceV))
      .map(_._2.toSet).getOrElse(Set.empty)
    head.count(e => !isDeleteEntry(e) && !base.contains(e))
  }

  /** METADATA-ONLY column bounds: fold the per-file min/max stats the
    * writers recorded at commit time — the planner's zero-I/O answer
    * to `SELECT min(c), max(c)`. Returns None when ANY data entry
    * lacks stats for the column (legacy/statless files make the
    * metadata answer unsound — exactly Iceberg's rule) or the table
    * has no data entries. Cost is the manifest read: O(files)
    * metadata, zero data bytes at any table size.
    */
  def statsMinMax(path: String,
      column: String): Option[(BigDecimal, BigDecimal)] = {
    val entries = readManifest(path).map(_._2).getOrElse(Seq.empty)
      .filterNot(isDeleteEntry)
    if (entries.isEmpty) None
    else {
      val bounds = entries.map(e => entryStats(e).get(column))
      if (bounds.exists(_.isEmpty)) None
      else Some(bounds.flatten
        .reduce((a, b) => (a._1.min(b._1), a._2.max(b._2))))
    }
  }

  /** Copy-on-write MERGE (upsert): rows of `updates` win on `key`,
    * everything else carries over, published as ONE transactional
    * overwrite commit through the normal DSv2 write path — readers see
    * the pre-merge or post-merge table, never a mix, and the previous
    * state stays time-travelable. The carry-over is a key-partitioned
    * anti join (shuffle on the 8-byte key, never on payload width). At
    * scale a real format narrows the rewrite to the files that CONTAIN
    * matched keys via file-level key ranges — the manifest's
    * file-list granularity is exactly the metadata that narrowing
    * reads; rewriting everything here keeps the miniature honest
    * about being copy-on-write (the merge-on-read alternative is
    * [[graft.streaming.TableStateStore]]'s latest-seq-wins read).
    */
  def upsert(spark: SparkSession, path: String, updates: DataFrame,
      key: String): Unit = commitLock(path).synchronized {
    // same read-modify-write class as an append commit: the lock spans
    // read→rewrite→publish so a concurrent writer cannot slip between
    // the read and the overwrite (the inner commit re-enters the same
    // monitor on this thread — reentrant by construction). NOTE the
    // head lock is REENTRANT per thread, so holding it here keeps a
    // cross-process writer from landing between this read and the
    // overwrite while the inner commit re-enters the same section
    withHeadLock(path) {
      val current = readCommitted(spark, path)
      val kept = current.join(updates.select(key), Seq(key), "left_anti")
      withCommitKind("upsert") {
        kept.unionByName(updates)
          .write.format("graft-manifest").mode("overwrite").save(path)
      }
    }
  }

  /** COPY-ON-WRITE COMPACTION — the executed half of the OPTIMIZE
    * story (`layout_compaction` is the planner): rewrite the table's
    * committed content into `parts` output files through the normal
    * transactional write path, published as ONE overwrite commit.
    * Readers see the pre- or post-compaction state, never a mix; the
    * small input files stay time-travel-reachable through their
    * snapshots until retention expires them (then [[unreferencedFiles]]
    * releases them — the standard OPTIMIZE + VACUUM lifecycle). Holds
    * the per-path commit lock across read→rewrite→publish so a
    * concurrent append cannot be dropped by the rewrite (it either
    * lands before the read or retries after the commit).
    *
    * `parts` is the file-count knob a real OPTIMIZE derives from its
    * target file size; every partition writer emits its file, so the
    * post-compaction data file count is exactly `parts`.
    */
  def compact(spark: SparkSession, path: String, parts: Int): Unit =
    commitLock(path).synchronized {
      withHeadLock(path) {
        // the overwrite below preserves row content exactly — mark
        // the commit `rewrite` so the change feed emits nothing
        withCommitKind("rewrite") {
          readCommitted(spark, path)
            .repartition(parts)
            .write.format("graft-manifest").mode("overwrite").save(path)
        }
      }
    }

  /** Override the commit KIND the write path records for commits
    * made inside `body` on THIS thread — how composite operations
    * whose inner commit is a plain DataFrame write (e.g. [[compact]]:
    * an overwrite that preserves row content, or [[upsert]]: an
    * overwrite that is semantically an upsert) tell the change feed
    * what the commit MEANS. Sound because V2 write commands execute
    * eagerly on the calling thread ([[promoteAndPublish]] runs inside
    * `DataFrameWriter.save`); a missing override just records the
    * literal write mode — conservative, never wrong-er than before.
    */
  private val commitKindOverride = new ThreadLocal[String]()
  private[sources] def withCommitKind[A](kind: String)(body: => A): A = {
    val prev = commitKindOverride.get()
    commitKindOverride.set(kind)
    try body finally commitKindOverride.set(prev)
  }
  private[sources] def currentKindOr(default: String): String =
    Option(commitKindOverride.get()).getOrElse(default)

  /** BIN-PACKED OPTIMIZE — the compaction a 100-TB table actually
    * runs: only files SMALLER than `minBytes` rewrite, packed into
    * bins of ~`targetBytes` (by their recorded R| sizes), while
    * right-sized files CARRY OVER as raw manifest entries — zero
    * bytes moved for them, so the cost is O(small files), never
    * O(table), unlike [[compact]]'s whole-table rewrite. Small files'
    * deletion vectors merge away in the rewrite; big files keep
    * theirs. Tombstoned heads refuse (same sequencing rule as every
    * narrowed rewrite — compact first). ONE atomic commit.
    *
    * Returns (filesCompacted, binsWritten, filesCarried).
    */
  def compactBinPack(spark: SparkSession, path: String,
      targetBytes: Long, minBytes: Long): (Int, Int, Int) =
    commitLock(path).synchronized {
      withHeadLock(path) {
        val (schema, entries) = readManifest(path).getOrElse(
          throw new IllegalArgumentException(s"no manifest at $path"))
        require(!entries.exists(isDeleteEntry),
          "binpack over tombstones unsupported — compact first")
        require(targetBytes > 0 && minBytes > 0, "positive sizes")
        def sizeOf(e: String): Long = entryRowsBytes(e).map(_._2)
          .getOrElse(scala.util.Try(
            Files.size(Paths.get(path, entryFile(e)))).getOrElse(0L))
        val (small, big) = entries.partition(e => sizeOf(e) < minBytes)
        if (small.length <= 1) return (0, 0, entries.length)
        val bins = math.max(1,
          math.ceil(small.map(sizeOf).sum.toDouble / targetBytes).toInt)
        val scratch = Paths.get(path, s"_rewrite-binpack-" +
          java.util.UUID.randomUUID().toString.take(8))
        try {
          val rows = readDataEntries(spark, path, schema, small)
          val partCols = tablePartitionColumns(path)
          (if (partCols.nonEmpty)
             rows.repartition(bins,
               partCols.map(org.apache.spark.sql.functions.col): _*)
           else rows.repartition(bins))
            .write.format("graft-manifest").options(layoutOptions(path))
            .mode("append").save(scratch.toString)
          val adopted = adoptScratchFiles(path, scratch.toString)
          publish(path, schema, big ++ adopted, "binpack",
            kind = "rewrite")
          (small.length, adopted.length, big.length)
        } finally deleteRecursively(scratch)
      }
    }

  /** Declared identity-partition columns of a catalog table (the
    * `PARTITIONED BY` DDL sidecar `_MANIFEST.partcols`) — empty for
    * unpartitioned tables and option-driven DataFrame writes.
    */
  private[sources] def tablePartitionColumns(path: String): Seq[String] = {
    val f = Paths.get(path, "_MANIFEST.partcols")
    if (!Files.exists(f)) Seq.empty
    else Files.readAllLines(f, StandardCharsets.UTF_8).asScala
      .toSeq.map(_.trim).filter(_.nonEmpty)
  }

  /** Explicit metadata compaction (Iceberg's rewrite_manifests): fold
    * the head's segment fan-out back to one segment (or flat inline
    * for small tables) in a metadata-only `rewrite` commit — row
    * content untouched, silent in the change feed. The on-demand
    * twin of the automatic fold the commit path performs past
    * `SegFoldAt` refs. Returns (segments before, segments after,
    * live entries).
    */
  def rewriteManifests(path: String): (Int, Int, Int) =
    commitLock(path).synchronized {
      withHeadLock(path) {
        val (schema, entries) = readManifest(path).getOrElse(
          throw new IllegalArgumentException(s"no manifest at $path"))
        val before = segRefsOf(manifestFile(path)).length
        publish(path, schema, entries,
          s"rewrite-manifests-${java.util.UUID.randomUUID().toString.take(8)}",
          kind = "rewrite", foldSegments = true)
        (before, segRefsOf(manifestFile(path)).length, entries.length)
      }
    }

  /** PARTITION EVOLUTION — change an existing table's partition spec
    * (Iceberg's evolve-spec in miniature): only the DDL sidecar
    * changes; NO data moves. Files are forever tagged with the spec
    * they were WRITTEN under (their `P|` blobs), so a mixed-era table
    * stays exactly readable: partition pruning skips only files that
    * recorded a conflicting value (old-era files are conservatively
    * unprunable for new columns), storage-partitioned joins and
    * partition-grouped aggregate pushdown claim nothing until every
    * live file carries the current spec, and `graft.t.files` reports
    * each file's own values. New writes — including every rewrite
    * (compact/binpack/OPTIMIZE read the sidecar at write time) —
    * cluster under the NEW spec, so one compaction migrates the
    * whole table to the new layout. A metadata-only `rewrite`-kind
    * commit records the change in the snapshot history (silent in
    * the change feed: row content is untouched).
    */
  def setPartitionSpec(path: String, cols: Seq[String]): Unit =
    commitLock(path).synchronized {
      withHeadLock(path) {
        val (schema, entries) = readManifest(path).getOrElse(
          throw new IllegalArgumentException(s"no manifest at $path"))
        require(cols.distinct.length == cols.length,
          s"duplicate partition columns: $cols")
        cols.foreach { c =>
          require(schema.fieldNames.contains(c),
            s"partition column $c not in schema " +
              s"(${schema.fieldNames.mkString(", ")})")
          require(schema(c).dataType match {
            case LongType | IntegerType | StringType | BooleanType |
                 DateType => true
            case _ => false
          }, s"partition column $c must be " +
            "long/int/string/boolean/date")
        }
        savePartitionColumns(path, cols)
        publish(path, schema, entries,
          s"set-part-${java.util.UUID.randomUUID().toString.take(8)}",
          kind = "rewrite")
      }
    }

  /** Rewrite the `PARTITIONED BY` sidecar (atomic) — RENAME COLUMN of
    * a partition column keeps the DDL spec naming the live column.
    */
  private[sources] def savePartitionColumns(path: String,
      cols: Seq[String]): Unit = {
    val tmp = Paths.get(path, "_MANIFEST.partcols.tmp")
    Files.write(tmp,
      (cols.mkString("\n") + "\n").getBytes(StandardCharsets.UTF_8))
    Files.move(tmp, Paths.get(path, "_MANIFEST.partcols"),
      StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
    ()
  }

  /** Layout options a rewrite's SCRATCH write must carry so rewritten
    * boundary files keep the table's partition/Bloom metadata: the
    * DDL partition columns (`_MANIFEST.partcols` sidecar) and the
    * Bloom columns observed on the head's data entries. Without
    * these, a predicate DELETE / narrowed UPDATE on a DDL-partitioned
    * or bloom-indexed table would write rewritten files with no P|/B|
    * blobs (and mixed partition values in one file) — reads stay
    * correct but partition/Bloom pruning silently degrades while
    * `Table.partitioning()` still reports identity partitioning.
    */
  private[sources] def layoutOptions(path: String): Map[String, String] = {
    val part = tablePartitionColumns(path)
    val blooms = readManifest(path).map(_._2).getOrElse(Seq.empty)
      .filterNot(isDeleteEntry)
      .flatMap(e => e.split("\t").iterator.drop(1)
        .find(_.startsWith("B|")).toSeq
        .flatMap(_.drop(2).split('|').toSeq
          .map(_.split(":", 2)(0)).filter(_.nonEmpty)))
      .distinct
    (if (part.nonEmpty) Map("partitionBy" -> part.mkString(","))
     else Map.empty[String, String]) ++
      (if (blooms.nonEmpty) Map("bloomColumns" -> blooms.mkString(","))
       else Map.empty[String, String])
  }

  /** Last batch-planned (files planned, files total) for a table —
    * the runtime-prune evidence surface: after executing a fact-dim
    * join with dynamic pruning, this reports how many files the fact
    * scan actually planned vs the committed total.
    */
  def lastPlannedFiles(path: String): Option[(Int, Int)] =
    ManifestScanPlanner.lastPlanned(path)

  /** Relative data-file names of the committed head — the file-set
    * identity external gates diff across a commit to observe
    * carried-over vs dropped vs newly-written files (data files are
    * immutable once promoted, so name equality IS content identity).
    */
  def committedDataFiles(path: String): Seq[String] =
    readManifest(path).map(_._2.filterNot(isDeleteEntry).map(entryFile))
      .getOrElse(Seq.empty)

  /** Committed data-file count — the observable compaction changes.
    * Tombstones are counted separately ([[committedDeleteFileCount]]).
    */
  def committedFileCount(path: String): Int =
    readManifest(path).map(_._2.count(!isDeleteEntry(_))).getOrElse(0)

  // ------------------------------------------ per-file Bloom filters
  /** Split-mix finalizer — the stateless 64-bit mixer the Bloom
    * probes derive from (public-domain splitmix64 constants). Two
    * independent hashes via double-mixing give the standard
    * Kirsch–Mitzenmacher probe sequence h1 + i·h2.
    */
  private def mix64(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  private[sources] val BloomK = 4

  /** True iff the serialized Bloom bit set may contain `v` — false is
    * definitive (no false negatives by construction: every written
    * value set all K probe bits).
    */
  private[sources] def bloomMightContain(bits: Array[Byte], v: Long): Boolean = {
    val m = bits.length.toLong * 8
    val h1 = mix64(v)
    val h2 = mix64(h1) | 1L
    (0 until BloomK).forall { i =>
      val bit = java.lang.Long.remainderUnsigned(h1 + i * h2, m)
      (bits((bit >>> 3).toInt) & (1 << (bit & 7))) != 0
    }
  }

  private[sources] def bloomSet(bits: Array[Byte], v: Long): Unit = {
    val m = bits.length.toLong * 8
    val h1 = mix64(v)
    val h2 = mix64(h1) | 1L
    var i = 0
    while (i < BloomK) {
      val bit = java.lang.Long.remainderUnsigned(h1 + i * h2, m)
      bits((bit >>> 3).toInt) = (bits((bit >>> 3).toInt) |
        (1 << (bit & 7))).toByte
      i += 1
    }
  }

  /** Byte-wise unsigned comparison — Spark's own UTF8String order. */
  private[sources] def compareBytes(a: Array[Byte],
      b: Array[Byte]): Int = {
    val n = math.min(a.length, b.length)
    var i = 0
    while (i < n) {
      val c = (a(i) & 0xff) - (b(i) & 0xff)
      if (c != 0) return c
      i += 1
    }
    a.length - b.length
  }

  /** An INCLUSIVE upper bound (≥ `b`) of at most `len` bytes: `b`
    * itself when it fits untruncated (exact), else the `len`-byte
    * prefix with its last non-0xFF byte incremented and the tail
    * dropped (Iceberg's truncate-up — strictly above every extension
    * of the prefix). None when the truncated prefix is all 0xFF — no
    * finite prefix bound exists.
    */
  private[sources] def upperBoundPrefix(b: Array[Byte],
      len: Int): Option[Array[Byte]] = {
    if (b.length <= len) return Some(b)
    val p = b.take(len)
    var i = p.length - 1
    while (i >= 0 && p(i) == -1) i -= 1
    if (i < 0) None
    else {
      val out = p.take(i + 1)
      out(i) = (out(i) + 1).toByte
      Some(out)
    }
  }

  /** Truncated string bounds of a data entry (`T|col:b64:b64|...`):
    * (lowerBound, Some(inclusiveUpperBound) | None). The lower bound
    * is ≤ every value; the upper bound (when present) is ≥ every
    * value — both possibly truncated, so they prune soundly but never
    * prove equality.
    */
  private[sources] def entryStringStats(entry: String)
      : Map[String, (Array[Byte], Option[Array[Byte]])] = {
    val parts = entry.split("\t")
    parts.iterator.drop(1).find(_.startsWith("T|")).map { blob =>
      val dec = java.util.Base64.getDecoder
      blob.drop(2).split('|').iterator.map(_.split(":", 3))
        .collect { case Array(c, lo, hi) =>
          c -> ((dec.decode(lo),
            if (hi.isEmpty) None else Some(dec.decode(hi))))
        }.toMap
    }.getOrElse(Map.empty)
  }

  /** Recorded NULL count of `column` in a data entry (`N|col:n|...`,
    * an optional tab field written alongside the stats blob since the
    * predicate-DELETE work): `Some(0)` PROVES the file has no nulls in
    * the column, which is what lets [[ManifestSkipping.allMatch]]
    * prove a range predicate holds for EVERY row (a null row never
    * matches a comparison, so min/max containment alone cannot prove
    * all-match). For double columns the recorded value counts NaN as
    * null — an over-count, so `Some(0)` stays a sound no-nulls proof.
    * Absent (legacy entries, stat-less columns) → None → nothing
    * provable.
    */
  private[sources] def entryNullCount(entry: String,
      column: String): Option[Long] = {
    val parts = entry.split("\t")
    parts.iterator.drop(1).find(_.startsWith("N|")).flatMap { blob =>
      blob.drop(2).split('|').iterator.map(_.split(":", 2))
        .collectFirst { case Array(c, n) if c == column => n.toLong }
    }
  }

  /** Recorded (rowCount, fileBytes) of a data entry (`R|rows:bytes`,
    * an optional tab field written at promote time) — the per-file
    * cardinality/size the scan's reported statistics sum. Absent on
    * legacy/external entries → None; statistics fall back to the
    * file's on-disk size and report no row count.
    */
  private[sources] def entryRowsBytes(entry: String): Option[(Long, Long)] = {
    val parts = entry.split("\t")
    parts.iterator.drop(1).find(_.startsWith("R|")).flatMap { blob =>
      blob.drop(2).split(":", 2) match {
        case Array(r, b) =>
          scala.util.Try((r.toLong, b.toLong)).toOption
        case _ => None
      }
    }
  }

  /** The entry list a scan of (`branch`, `asOfVersion`) reads — the
    * shared resolution of [[ManifestBatchScan.planInputPartitions]]
    * and the scan's reported statistics (they MUST agree, or costing
    * would describe a different table than the one read). Loud on a
    * missing branch/snapshot, same contract as the batch scan.
    */
  private[sources] def entriesFor(path: String, branch: Option[String],
      asOfVersion: Option[Int]): Seq[String] = (branch, asOfVersion) match {
    case (Some(b), _) => parseManifest(branchFile(path, b))
      .map(_._2).getOrElse(throw new IllegalArgumentException(
        s"no branch $b at $path " +
          s"(have: ${branches(path).mkString(",")})"))
    case (None, Some(v)) => parseManifest(versionFile(path, v))
      .map(_._2).getOrElse(throw new IllegalArgumentException(
        s"no snapshot v$v at $path " +
          s"(have: ${versions(path).mkString(",")}) — " +
          "retention expired it"))
    case (None, None) => readManifest(path).map(_._2).getOrElse(Seq.empty)
  }

  /** The per-column Bloom blob of a data entry (`B|col:base64|...`,
    * the entry's optional third tab field). Absent column → None →
    * the file is unprunable by equality, never skipped.
    */
  private[sources] def entryBloom(entry: String,
      column: String): Option[Array[Byte]] = {
    val parts = entry.split("\t")
    parts.iterator.drop(1).find(_.startsWith("B|")).flatMap { blob =>
      blob.drop(2).split('|').iterator.map(_.split(":", 2))
        .collectFirst { case Array(c, b64) if c == column =>
          java.util.Base64.getDecoder.decode(b64) }
    }
  }

  // -------------------------------------------- deletion vectors (MOR)
  /** The DELETION-VECTOR blob of a data entry (`V|relpath:count`, an
    * optional tab field): a sidecar file of newline-separated ROW
    * INDEXES (positions in the data file's sequential decode order,
    * ascending) whose rows are deleted — merge-on-read for point-ish
    * predicate deletes, so removing 0.01% of a wide file's rows
    * writes a KB-sized sidecar instead of rewriting gigabytes
    * (Delta/Iceberg deletion vectors in miniature). Applied by every
    * read surface; merged away by any rewrite of the file
    * (compaction, COW update). Positions are in the file's FULL
    * decode order, so readers with a DV disable row-group skipping
    * for that file (stable coordinates beat a partial IO win).
    */
  private[sources] def entryDv(entry: String): Option[(String, Long)] = {
    val parts = entry.split("\t")
    parts.iterator.drop(1).find(_.startsWith("V|")).flatMap { blob =>
      val i = blob.lastIndexOf(':')
      if (i <= 2) None
      else scala.util.Try(
        (blob.substring(2, i), blob.substring(i + 1).toLong)).toOption
    }
  }

  /** `entry` with its DV blob replaced (or appended). */
  private[sources] def withDvBlob(entry: String, rel: String,
      count: Long): String = {
    val kept = entry.split("\t").filterNot(_.startsWith("V|"))
    (kept :+ s"V|$rel:$count").mkString("\t")
  }

  /** Read a DV sidecar into a sorted position array. */
  private[sources] def readDv(path: String, rel: String): Array[Long] = {
    val f = Paths.get(path, rel)
    Files.readAllLines(f, StandardCharsets.UTF_8).asScala
      .iterator.map(_.trim).filter(_.nonEmpty).map(_.toLong)
      .toArray.sorted
  }

  /** MATCHING ROW POSITIONS of `filters` in one committed file — the
    * DV probe. One executor task streams the file through the SAME
    * per-file reader the scan uses (no row-group skipping, no DV
    * applied → positions in full-file coordinates) and evaluates the
    * predicate row-locally ([[ManifestSkipping.evalFilters]]).
    * Returns None when more than `cap` rows match (the caller falls
    * back to a rewrite — a DV bigger than that stops being the cheap
    * tier). Distributed (never a driver-side file scan), bounded
    * collect (≤ cap positions).
    */
  private[sources] def dvProbe(spark: SparkSession, path: String,
      schema: StructType, relFile: String,
      filters: Seq[org.apache.spark.sql.sources.Filter],
      cap: Int): Option[Array[Long]] = {
    val absPath = Paths.get(path, relFile).toString
    val schemaJson = schema.json
    val aliasesEnc = columnAliases(path).toArray.sortBy(_._1)
      .map { case (c, past) => s"$c=${past.mkString(",")}" }
    val filterArr = filters.toArray
    val res = spark.sparkContext.parallelize(Seq(absPath), 1)
      .map { ap =>
        val sch = DataType.fromJson(schemaJson).asInstanceOf[StructType]
        val part = ManifestFilePartition(ap, schemaJson, schemaJson,
          Array.empty, Array.empty, aliases = aliasesEnc)
        val reader: org.apache.spark.sql.connector.read
            .PartitionReader[org.apache.spark.sql.catalyst.InternalRow] =
          if (ap.endsWith(".parquet")) new ManifestParquetReader(part)
          else new ManifestJsonlReader(part)
        val buf = scala.collection.mutable.ArrayBuffer.empty[Long]
        var pos = 0L
        var overflow = false
        try {
          while (!overflow && reader.next()) {
            if (ManifestSkipping.evalFilters(sch, filterArr.toSeq,
                reader.get())) {
              buf += pos
              if (buf.length > cap) overflow = true
            }
            pos += 1
          }
        } finally reader.close()
        if (overflow) null else buf.toArray
      }.collect()
    Option(res.head)
  }

  /** Committed data entries carrying a deletion vector — the
    * merge-on-read evidence surface (0 again after a rewrite/OPTIMIZE
    * merges them away).
    */
  def dvFileCount(path: String): Int =
    readManifest(path).map(_._2.count(e => entryDv(e).isDefined))
      .getOrElse(0)

  /** POINT-LOOKUP data skipping: data entries whose per-file Bloom
    * filter (written under `.option("bloomColumns", "k1,k2")`) may
    * contain `value` — the equality-predicate complement of min/max
    * range skipping. On a key-hash-distributed layout every file's
    * [min, max] spans the whole key range and range stats prune
    * NOTHING; the Bloom answers "is this key possibly in this file"
    * per file, so a point lookup on a 100-TB table reads the one file
    * holding the key plus a false-positive tail (~1% at the sized
    * bits-per-key), instead of every file. No false negatives ever:
    * a file lacking a Bloom for the column is always read, and the
    * recorded min/max (when present) is AND-ed in for free.
    */
  def prunedDataFilesEq(path: String, column: String,
      value: Long): Seq[String] = {
    val entries = readManifest(path).map(_._2).getOrElse(Seq.empty)
    entries.filterNot(isDeleteEntry).filter { e =>
      val partOk = partValueNum(e, column).forall(_ == BigDecimal(value))
      val rangeOk = entryStats(e).get(column) match {
        case Some((mn, mx)) =>
          mn <= BigDecimal(value) && BigDecimal(value) <= mx
        case None => true
      }
      partOk && rangeOk &&
        entryBloom(e, column).forall(bloomMightContain(_, value))
    }.map(entryFile)
  }

  /** Point-lookup read through [[prunedDataFilesEq]] — same
    * residual-predicate contract as [[readPruned]] (rows with other
    * keys may appear; apply the equality on top), tombstones still
    * reconciled.
    */
  def readPrunedEq(spark: SparkSession, path: String, column: String,
      value: Long): DataFrame = {
    val (schema, entries) = readManifest(path).getOrElse(
      throw new IllegalArgumentException(s"no manifest at $path"))
    val keep = prunedDataFilesEq(path, column, value).toSet
    readEntries(spark, path, schema, entries.filter(e =>
      isDeleteEntry(e) || keep(entryFile(e))))
  }

  /** Multi-column data skipping: data entries whose recorded ranges
    * intersect EVERY `(column, lower, upper)` box side — the
    * conjunctive file-pruning decision a Z-ordered layout exists to
    * sharpen (per-dimension pruning composes by intersection; on a
    * Z-clustered table each file covers a small cell of the key space,
    * so the intersection collapses to the files whose cells the query
    * box overlaps). Statless entries are never skipped, same contract
    * as [[prunedDataFiles]].
    */
  def prunedDataFilesMulti(path: String,
      boxes: Seq[(String, Long, Long)]): Seq[String] = {
    val entries = readManifest(path).map(_._2).getOrElse(Seq.empty)
    entries.filterNot(isDeleteEntry).filter { e =>
      val stats = entryStats(e)
      boxes.forall { case (c, lower, upper) =>
        val partOk = partValueNum(e, c).forall(v =>
          v >= BigDecimal(lower) && v <= BigDecimal(upper))
        partOk && (stats.get(c) match {
          case Some((mn, mx)) =>
            !(mx < BigDecimal(lower) || mn > BigDecimal(upper))
          case None => true
        })
      }
    }.map(entryFile)
  }

  /** DATA-SKIPPING read over a conjunction of range predicates
    * ([[prunedDataFilesMulti]]) — same residual-predicate contract as
    * [[readPruned]], tombstones still reconciled.
    */
  def readPrunedMulti(spark: SparkSession, path: String,
      boxes: Seq[(String, Long, Long)]): DataFrame = {
    val (schema, entries) = readManifest(path).getOrElse(
      throw new IllegalArgumentException(s"no manifest at $path"))
    val keep = prunedDataFilesMulti(path, boxes).toSet
    readEntries(spark, path, schema, entries.filter(e =>
      isDeleteEntry(e) || keep(entryFile(e))))
  }

  /** Splice helper for rewrite commits ([[compactZOrder]],
    * [[upsertNarrow]]): the rewritten rows were written through the
    * normal DSv2 path into a SCRATCH manifest table under `path` (so
    * a crash strands debris inside the table dir, never a torn main
    * state); this promotes the scratch table's data files into the
    * main data dir and returns their manifest entries (stats blobs
    * intact, paths re-rooted). Staged names carry the scratch write's
    * queryId, so they can never collide with committed files.
    */
  private[sources] def adoptScratchFiles(path: String, scratch: String): Seq[String] = {
    val (_, entries) = readManifest(scratch).getOrElse(
      throw new IllegalStateException(s"scratch write left no manifest"))
    Files.createDirectories(Paths.get(path, "data"))
    entries.filterNot(isDeleteEntry).map { e =>
      val f = entryFile(e)
      Files.move(Paths.get(scratch, f), Paths.get(path, f),
        StandardCopyOption.REPLACE_EXISTING)
      e
    }
  }

  private[sources] def deleteRecursively(dir: Path): Unit =
    if (Files.exists(dir)) {
      val s = Files.walk(dir)
      try s.iterator().asScala.toSeq.reverse.foreach(Files.deleteIfExists(_))
      finally s.close()
      ()
    }

  /** OPTIMIZE ZORDER BY in miniature: rewrite the committed content
    * CLUSTERED BY the Morton (Z-curve) cell of `zCols`, one data file
    * per populated cell, published as ONE atomic overwrite commit.
    *
    * Each column is normalized to `bits` bits against its exact
    * committed min/max — read from the manifest's own per-file stats,
    * no data pass — and the per-row cell id interleaves the columns'
    * bits. Because every output file holds exactly one cell, its
    * recorded min/max per z-column spans at most 1/2^bits of that
    * column's range: a conjunctive box query ([[readPrunedMulti]])
    * then reads only the files whose cells the box overlaps — the
    * multi-dimensional data skipping that linear clustering cannot
    * give (sorting by A makes B's per-file ranges full-width). This is
    * the difference between reading 1 file and reading a full stripe
    * of a 100-TB table for every 2-D slice query.
    *
    * Crash-safe like every commit here: cell files are written through
    * the normal DSv2 path into a scratch table under `path`, adopted
    * into the data dir, and the head moves in ONE pointer rename —
    * readers see the pre- or post-optimize table, never a mix, and a
    * crash at any point strands unreferenced files (vacuumable), never
    * a partial rewrite. Tombstones are materialized by the rewrite
    * (same as [[compact]]). Z-columns must be integral and
    * stats-covered on every committed file.
    *
    * Returns the number of populated cells (= post-optimize file
    * count). `bits * zCols.size` is capped at 16 — the cell count is
    * a driver-side loop and a real OPTIMIZE targets file sizes, not
    * thousands of micro-files.
    */
  def compactZOrder(spark: SparkSession, path: String, zCols: Seq[String],
      bits: Int): Int = commitLock(path).synchronized {
    withHeadLock(path) {
      require(zCols.nonEmpty && bits >= 1 && bits * zCols.size <= 16,
        s"compactZOrder: need 1..16 total cell bits, got $zCols x $bits")
      val (schema, entries) = readManifest(path).getOrElse(
        throw new IllegalArgumentException(s"no manifest at $path"))
      val dataEntries = entries.filterNot(isDeleteEntry)
      // exact global bounds per z-column, straight from file stats
      val bounds: Map[String, (Long, Long)] = zCols.map { c =>
        val ss = dataEntries.map(e => entryStats(e).get(c).getOrElse(
          throw new IllegalArgumentException(
            s"compactZOrder: no recorded stats for $c on ${entryFile(e)}")))
        require(ss.forall { case (mn, mx) => mn.isValidLong && mx.isValidLong },
          s"compactZOrder: $c must be an integral column")
        c -> ((ss.map(_._1.toLongExact).min, ss.map(_._2.toLongExact).max))
      }.toMap
      val k = zCols.size
      // per-row Morton cell: exact integer quantization, bit interleave
      val cellExpr = zCols.zipWithIndex.map { case (c, i) =>
        val (lo, hi) = bounds(c)
        val span = hi - lo + 1
        val q = s"(((`$c` - ${lo}L) * ${1L << bits}L) div ${span}L)"
        (0 until bits).map { b =>
          s"(shiftleft(shiftright($q, $b) & 1, ${b * k + (k - 1 - i)}))"
        }.mkString(" + ")
      }.mkString(" + ")
      val scratch = Paths.get(path, s"_rewrite-zorder-" +
        java.util.UUID.randomUUID().toString.take(8))
      try {
        val cur = readCommitted(spark, path)
          .withColumn("_zcell", org.apache.spark.sql.functions.expr(cellExpr))
        val zIdx = cur.schema.fieldIndex("_zcell")
        val present = cur.select("_zcell").distinct()
          .collect().map(_.getLong(0)).sorted // ≤ 2^16, metadata-sized
        val idxOf = present.zipWithIndex.toMap
        val bc = spark.sparkContext.broadcast(idxOf)
        val n = schema.length
        val fieldTypes = schema.fields.map(_.dataType)
        // ONE table-wide shuffle: an EXACT partitioner (cell → dense
        // partition index) sends every row of a cell to its own
        // partition, each task writes ONE file, and each file's
        // recorded stats span exactly one cell. repartitionByRange
        // would SAMPLE boundaries (cells could split or merge); hash
        // partitioning would collide cells into shared files. The old
        // shape — one write job per cell — scanned the table per cell;
        // this is one scan + one shuffle at any cell count.
        val shuffled = cur.queryExecution.toRdd
          .map(r => (r.getLong(zIdx), r.copy()))
          .partitionBy(new org.apache.spark.Partitioner {
            override def numPartitions: Int = math.max(bc.value.size, 1)
            override def getPartition(key: Any): Int =
              bc.value(key.asInstanceOf[Long])
          })
          .map { case (_, r) =>
            // project the transient _zcell column away (it is LAST)
            val vals = new Array[Any](n)
            var i = 0
            while (i < n) { vals(i) = r.get(i, fieldTypes(i)); i += 1 }
            new org.apache.spark.sql.catalyst.expressions
              .GenericInternalRow(vals)
              : org.apache.spark.sql.catalyst.InternalRow
          }
        org.apache.spark.sql.graftbridge.bridge
          .ofInternalRows(spark, shuffled, schema)
          .write.format("graft-manifest").mode("append")
          .save(scratch.toString)
        val adopted = adoptScratchFiles(path, scratch.toString)
        publish(path, schema, adopted, "zorder",
          kind = "rewrite") // the ONE commit point
        present.length
      } finally deleteRecursively(scratch)
    }
  }

  /** STATS-NARROWED copy-on-write MERGE — the production answer the
    * [[upsert]] scaladoc names but deliberately doesn't do: instead of
    * rewriting the whole table, plan the rewrite against the
    * manifest's per-file key stats and rewrite ONLY the files whose
    * [min, max] key range can contain an updated key (statless files
    * are conservatively rewritten). Untouched files carry over as raw
    * manifest entries — pure metadata, no rows move — so a targeted
    * update of one partition's keys in a 100-TB table rewrites one
    * file, not the table. Rows of `updates` win on `key`; unmatched
    * update keys are inserts (they land in the rewritten files).
    *
    * The rewrite is planned on the updates' key ENVELOPE (one small
    * agg job), the same first-cut Iceberg/Delta planning uses; keys
    * scattered across the full range degrade gracefully to [[upsert]]
    * (every file touched). Publication is ONE atomic commit: scratch
    * write → adopt → pointer rename, crash-safe as always. Tombstoned
    * tables must [[compact]] first — narrowing under merge-on-read
    * deletes would need sequence-number scoping this miniature
    * deliberately leaves named-not-implemented.
    *
    * Returns the number of files rewritten.
    */
  def upsertNarrow(spark: SparkSession, path: String, updates: DataFrame,
      key: String): Int = commitLock(path).synchronized {
    withHeadLock(path) {
      val (schema, entries) = readManifest(path).getOrElse(
        throw new IllegalArgumentException(s"no manifest at $path"))
      require(schema.fieldNames.contains(key),
        s"upsert key $key not in committed schema")
      require(!entries.exists(isDeleteEntry),
        "upsertNarrow over tombstones unsupported — compact first")
      val mm = updates.agg(
        org.apache.spark.sql.functions.min(
          org.apache.spark.sql.functions.col(key)),
        org.apache.spark.sql.functions.max(
          org.apache.spark.sql.functions.col(key))).head
      if (mm.isNullAt(0)) 0 // no update keys → no-op commit skipped
      else {
        val kLo = mm.getAs[Number](0).longValue
        val kHi = mm.getAs[Number](1).longValue
        val (touched, untouched) = entries.partition { e =>
          entryStats(e).get(key) match {
            case Some((mn, mx)) =>
              !(mx < BigDecimal(kLo) || mn > BigDecimal(kHi))
            case None => true // statless: must assume it holds keys
          }
        }
        val scratch = Paths.get(path, s"_rewrite-upsert-" +
          java.util.UUID.randomUUID().toString.take(8))
        try {
          val touchedRows = // DV-aware: never resurrect deleted rows
            readDataEntries(spark, path, schema, touched)
          val merged = touchedRows
            .join(updates.select(key).distinct(), Seq(key), "left_anti")
            .unionByName(updates.select(schema.fieldNames.map(
              org.apache.spark.sql.functions.col): _*))
          val partCols = tablePartitionColumns(path)
          // file count tracks the touched set, not shuffle width;
          // partitioned tables co-locate partition values per task so
          // rewritten files keep single-partition P| blobs
          (if (partCols.nonEmpty)
             merged.repartition(math.max(touched.length, 1),
               partCols.map(org.apache.spark.sql.functions.col): _*)
           else merged.repartition(math.max(touched.length, 1)))
            .write.format("graft-manifest").options(layoutOptions(path))
            .mode("append").save(scratch.toString)
          val adopted = adoptScratchFiles(path, scratch.toString)
          publish(path, schema, untouched ++ adopted, "upsert-narrow",
            kind = "upsert")
          touched.length
        } finally deleteRecursively(scratch)
      }
    }
  }

  /** SNAPSHOT EXPIRY — the retention half of the maintenance triad
    * (compact → expire → vacuum): delete all but the newest
    * `keepLast` version files, returning the expired version numbers.
    * Time travel to expired versions is gone by definition; data
    * files whose ONLY references were expired snapshots become
    * [[unreferencedFiles]] — released to the vacuum sweep, never
    * deleted here (retention and reclamation stay separate decisions,
    * as in any production table format). The current head pointer is
    * untouched: expiry can never change the committed view.
    */
  def expireSnapshots(path: String, keepLast: Int): Seq[Int] =
    commitLock(path).synchronized {
      withHeadLock(path) {
        require(keepLast >= 1, "must retain at least the newest snapshot")
        // TAGGED versions are pinned: a tag is a retention promise
        // (Iceberg's tag semantics) — expiry walks around them, and
        // vacuum keeps their files alive because the version file
        // itself survives
        val pinned = tags(path).map(_._2).toSet
        val expire = versions(path).dropRight(keepLast)
          .filterNot(pinned)
        expire.foreach(v => Files.deleteIfExists(versionFile(path, v)))
        expire
      }
    }

  // ------------------------------------------------------------ tags
  /** TAGS — immutable named refs into the snapshot log (`audit-2026q3`
    * → v17): the reproducibility primitive a training-data table
    * needs ("the exact corpus the model saw") made first-class.
    * A tag is a tiny sidecar pinning one version; it cannot be
    * re-pointed (create-if-absent — drop and re-create is the only
    * mutation, and that is visibly two operations), [[expireSnapshots]]
    * walks around tagged versions, and [[vacuum]] therefore keeps
    * every file the tagged snapshot references. Read back via SQL
    * `VERSION AS OF 'name'` (the catalog resolves non-numeric
    * versions through the tag), or [[tags]] / `graft.t.refs`.
    */
  private[sources] def tagFile(path: String, name: String): Path = {
    require(name.matches("[A-Za-z0-9_.-]+"), s"bad tag name: $name")
    Paths.get(path, s"_MANIFEST.tag-$name")
  }

  /** All tags of a table: (name, pinned version), name-sorted. */
  def tags(path: String): Seq[(String, Int)] = {
    val dir = Paths.get(path)
    if (!Files.exists(dir)) Seq.empty
    else {
      val t = "_MANIFEST\\.tag-([A-Za-z0-9_.-]+)".r
      val s = Files.list(dir)
      try s.iterator().asScala.map(_.getFileName.toString)
        .collect { case t(n) => n }.toSeq.sorted.flatMap { n =>
          scala.util.Try(new String(Files.readAllBytes(tagFile(path, n)),
            StandardCharsets.UTF_8).trim.toInt).toOption.map(n -> _)
        }
      finally s.close()
    }
  }

  /** Pin `version` (default: the current main head's version) under
    * `name`. Fails if the tag exists (immutability) or the snapshot
    * is not retained. Returns the pinned version.
    */
  def createTag(path: String, name: String,
      version: Option[Int] = None): Int =
    commitLock(path).synchronized {
      withHeadLock(path) {
        val v = version.getOrElse(currentVersion(path).getOrElse(
          throw new IllegalArgumentException(
            s"no committed manifest at $path — nothing to tag")))
        require(Files.exists(versionFile(path, v)),
          s"no retained snapshot v$v at $path " +
            s"(have: ${versions(path).mkString(",")})")
        try Files.write(tagFile(path, name),
          s"$v\n".getBytes(StandardCharsets.UTF_8),
          java.nio.file.StandardOpenOption.CREATE_NEW)
        catch { case _: java.nio.file.FileAlreadyExistsException =>
          throw new IllegalArgumentException(
            s"tag $name already exists at $path (tags are immutable — " +
              "drop_tag first to re-point)")
        }
        v
      }
    }

  /** Remove a tag (the pinned version becomes expirable again). */
  def dropTag(path: String, name: String): Boolean =
    commitLock(path).synchronized {
      withHeadLock(path) { Files.deleteIfExists(tagFile(path, name)) }
    }

  /** The main head's snapshot VERSION, verified: the hint is trusted
    * only after byte-comparing its snapshot to the head; otherwise
    * the newest byte-identical snapshot (size-gated scan). None for
    * an uncommitted table.
    */
  def currentVersion(path: String): Option[Int] = {
    val mf = manifestFile(path)
    if (!Files.exists(mf)) None
    else {
      val headBody = Files.readAllBytes(mf)
      readHeadVersionHint(path).filter { v =>
        val vf = versionFile(path, v)
        Files.exists(vf) &&
          java.util.Arrays.equals(Files.readAllBytes(vf), headBody)
      }.orElse {
        versions(path).reverse.find { v =>
          val vf = versionFile(path, v)
          Files.size(vf) == headBody.length.toLong &&
            java.util.Arrays.equals(Files.readAllBytes(vf), headBody)
        }
      }
    }
  }

  // ------------------------------------------------------- branching
  /** Nessie/Iceberg-style BRANCHES on the manifest log, in miniature:
    * a branch is just another head pointer (`_MANIFEST.branch-<name>`)
    * into the same immutable data-file and snapshot space, plus a
    * sidecar recording the MAIN version it forked from. Branch commits
    * ride the identical staged-write/atomic-rename protocol and land
    * the same `.vNNNNN` snapshots (one linear commit log, many heads —
    * the Nessie model), so time travel and crash-safety arguments
    * carry over verbatim. Main and branch evolve independently;
    * [[mergeBranch]] folds an append-only branch back in.
    */
  private[sources] def branchFile(path: String, name: String): Path = {
    require(name.matches("[A-Za-z0-9_-]+"), s"bad branch name: $name")
    Paths.get(path, s"_MANIFEST.branch-$name")
  }

  /** Fork-point sidecar: the FILE LIST main held when the branch was
    * created (one name per line; empty for a fork-from-empty branch).
    * Recording the list itself — not a version number into the shared
    * snapshot log — keeps the merge base correct when other heads
    * have committed snapshots since (the latest `.vNNNNN` need not be
    * main's state) and immune to snapshot retention expiring the
    * fork-point version.
    */
  private[sources] def branchBaseFile(path: String, name: String): Path =
    Paths.get(path, s"_MANIFEST.branch-$name.base")

  private def readBranchBase(path: String, name: String): Seq[String] =
    Files.readAllLines(branchBaseFile(path, name), StandardCharsets.UTF_8)
      .asScala.toSeq.filter(_.nonEmpty)

  /** Branch names with a live head pointer. */
  def branches(path: String): Seq[String] = {
    val dir = Paths.get(path)
    if (!Files.exists(dir)) Seq.empty
    else {
      val b = "_MANIFEST\\.branch-([A-Za-z0-9_-]+)".r
      val s = Files.list(dir)
      try s.iterator().asScala.map(_.getFileName.toString)
        .collect { case b(n) => n }.toSeq.sorted
      finally s.close()
    }
  }

  /** Fork `name` at the CURRENT main state: the branch head starts as
    * a copy of main's manifest, and the fork-point version is recorded
    * so [[mergeBranch]] knows what the branch added.
    */
  def createBranch(path: String, name: String): Unit = {
    val mf = manifestFile(path)
    require(Files.exists(mf), s"no manifest at $path — nothing to branch")
    require(!Files.exists(branchFile(path, name)),
      s"branch $name already exists at $path")
    val baseFiles = readManifest(path).map(_._2).getOrElse(Seq.empty)
    Files.write(branchBaseFile(path, name),
      (baseFiles.mkString("\n") + "\n").getBytes(StandardCharsets.UTF_8))
    // copy-then-rename: the head appears atomically, like every commit
    val tmp = Paths.get(path, s"_MANIFEST.branchtmp-$name")
    Files.copy(mf, tmp, StandardCopyOption.REPLACE_EXISTING)
    Files.move(tmp, branchFile(path, name), StandardCopyOption.ATOMIC_MOVE)
    ()
  }

  /** The branch's committed view — same resolution as
    * [[readCommitted]], through the branch head.
    */
  def readBranch(spark: SparkSession, path: String,
      name: String): DataFrame = {
    val (schema, entries) = parseManifest(branchFile(path, name)).getOrElse(
      throw new IllegalArgumentException(
        s"no branch $name at $path (have: ${branches(path).mkString(",")})"))
    readEntries(spark, path, schema, entries)
  }

  /** Merge an APPEND-ONLY branch back into main: main's current list
    * plus everything the branch added since its fork point, published
    * as a normal main commit (snapshot + atomic pointer move), then
    * the branch head is deleted. Data files are immutable and shared,
    * so the merge is PURE METADATA — no rows move at any table size.
    *
    * Rejects (IllegalStateException) a branch that dropped fork-point
    * files (an overwrite/rewrite branch): its intent cannot be merged
    * by union — replay it against main instead, exactly like a
    * non-fast-forwardable git branch. Main having advanced since the
    * fork is fine (that is the point of the fork-base bookkeeping).
    */
  def mergeBranch(path: String, name: String): Unit =
      commitLock(path).synchronized { withHeadLock(path) {
    val (bSchema, bFiles) = parseManifest(branchFile(path, name)).getOrElse(
      throw new IllegalArgumentException(s"no branch $name at $path"))
    val baseFiles = readBranchBase(path, name)
    if (!baseFiles.forall(bFiles.contains))
      throw new IllegalStateException(
        s"branch $name rewrote fork-point files — not merge-by-union-able")
    val (mSchema, mFiles) = readManifest(path).getOrElse(
      throw new IllegalArgumentException(s"no manifest at $path"))
    // schema evolution merges like files do: main ∪ branch columns,
    // type conflicts rejected (mergeSchemas throws) — a branch that
    // added a column fast-forwards it onto main with the data
    val merged0 = mergeSchemas(mSchema, bSchema)
    val added = bFiles.filterNot(baseFiles.toSet)
    val merged = mFiles ++ added.filterNot(mFiles.toSet)
    publish(path, merged0, merged, s"merge-$name", kind = "append")
    deleteBranch(path, name)
  } }

  /** Drop the branch head + fork-point sidecar. The branch's data
    * files stay reachable through their `.vNNNNN` snapshots until
    * those expire — after which [[unreferencedFiles]] releases them,
    * the same lifecycle as any abandoned commit.
    */
  def deleteBranch(path: String, name: String): Unit = {
    Files.deleteIfExists(branchFile(path, name))
    Files.deleteIfExists(branchBaseFile(path, name))
    ()
  }

  /** Delete a write's staging directory (committed batch, aborted
    * job, or replayed streaming epoch): nothing in it was promoted or
    * referenced, so this restores the exact pre-job state.
    */
  private[sources] def cleanupStaged(path: String, queryId: String): Unit = {
    val staged = Paths.get(path, "_staged", queryId)
    if (Files.exists(staged)) {
      val s = Files.list(staged)
      val leftovers = try s.iterator().asScala.toList finally s.close()
      leftovers.foreach(Files.deleteIfExists(_))
      Files.deleteIfExists(staged)
    }
    ()
  }

  /** The shared promote→read-previous→publish commit section of the
    * batch AND streaming writes — driver-side metadata work (file
    * moves + two small reads + one rename). The per-path monitor
    * serializes concurrent IN-PROCESS committers; the head lock
    * inside extends the guarantee to CROSS-PROCESS ones (promotion
    * itself needs no lock, staged names are globally unique, but the
    * read-merge-publish does). `txn` (streaming epochs) makes the
    * commit IDEMPOTENT: inside the head lock, an epoch at or below
    * the pointer's recorded ledger entry SKIPS the publish — its
    * staged files stay unpromoted garbage for the vacuum sweep, the
    * exactly-once contract of a replayed micro-batch.
    */
  private[sources] def promoteAndPublish(path: String, schema: StructType,
      queryId: String, replace: Boolean, branch: Option[String],
      messages: Array[WriterCommitMessage],
      txn: Option[(String, Long)] = None): Unit =
    ManifestV2Sink.commitLock(path).synchronized {
    // epoch replay fast-path: skip promotion entirely (re-checked
    // authoritatively under the head lock below)
    val pointer = branch.map(ManifestV2Sink.branchFile(path, _))
      .getOrElse(Paths.get(path, "_MANIFEST"))
    def isReplay: Boolean = txn.exists { case (q, e) =>
      ManifestV2Sink.parseTxns(pointer).getOrElse(q, -1L) >= e }
    if (isReplay) return
    // fail-fast schema validation BEFORE promoting staged files, so a
    // rejected evolution (type change) leaves zero data-dir garbage;
    // the authoritative merge re-runs under the head lock below
    if (!replace) {
      val pre = branch match {
        case Some(b) => ManifestV2Sink
          .parseManifest(ManifestV2Sink.branchFile(path, b))
        case None => ManifestV2Sink.readManifest(path)
      }
      pre.foreach { case (prevSchema, _) =>
        ManifestV2Sink.mergeSchemas(prevSchema, schema)
      }
    }
    val dataDir = Paths.get(path, "data")
    Files.createDirectories(dataDir)
    // promote committed attempts' staged files into the data dir;
    // names carry (queryId, partition, task) so runs never collide.
    // ZERO-ROW files are not promoted (cleanupStaged sweeps them):
    // an empty shuffle partition would otherwise commit a statless
    // file that every pruned read must conservatively scan forever
    val promoted = messages.iterator.flatMap {
      case s: StagedFile => Iterator.single(s)
      case StagedFiles(fs) => fs.iterator
    }.collect {
      case StagedFile(name, rows, stats, blooms, part, nulls, strs)
          if rows > 0 =>
        val from = Paths.get(path, "_staged", queryId, name)
        // size BEFORE the move: the R| blob records (rows, bytes) per
        // file — what SupportsReportStatistics sums at plan time so
        // Catalyst can cost manifest-table joins from metadata alone
        val bytes = Files.size(from)
        Files.move(from, dataDir.resolve(name),
          StandardCopyOption.REPLACE_EXISTING)
        s"data/$name" +
          (if (stats.isEmpty) "" else s"\t$stats") +
          (if (blooms.isEmpty) "" else s"\t$blooms") +
          (if (part.isEmpty) "" else s"\t$part") +
          (if (nulls.isEmpty) "" else s"\t$nulls") +
          (if (strs.isEmpty) "" else s"\t$strs") +
          s"\tR|$rows:$bytes"
    }.toArray.sorted
    ManifestV2Sink.withHeadLock(path) {
    // a branch commit appends to the BRANCH head; an un-created
    // branch starts empty, forked at the current latest version
    val prior: Option[(StructType, Seq[String])] =
      if (replace) None
      else branch match {
        case Some(b) => ManifestV2Sink
          .parseManifest(ManifestV2Sink.branchFile(path, b))
        case None => ManifestV2Sink.readManifest(path)
      }
    val previous = prior.map(_._2).getOrElse(Seq.empty)
    // schema evolution: the published schema is prior ∪ incoming
    // (add-column only; type changes rejected) — see [[mergeSchemas]]
    val published = prior match {
      case Some((prevSchema, _)) =>
        ManifestV2Sink.mergeSchemas(prevSchema, schema)
      case None => schema
    }
    branch.foreach { b =>
      val baseF = ManifestV2Sink.branchBaseFile(path, b)
      // a write to a branch that was never createBranch'd starts the
      // branch EMPTY — its fork point is the empty file list, so
      // merge-by-union later adds exactly what the branch wrote.
      // OVERWRITE (not skip) when the head doesn't exist: a crashed
      // createBranch (sidecar written, head rename never happened)
      // leaves a stale .base that would otherwise poison mergeBranch
      val headMissing =
        !Files.exists(ManifestV2Sink.branchFile(path, b))
      if (headMissing || !Files.exists(baseF))
        Files.write(baseF, "\n".getBytes(StandardCharsets.UTF_8))
    }
    // publish: write-then-atomic-rename; readers see old or new state,
    // never a torn manifest. The SNAPSHOT (versioned) copy lands
    // first, the target pointer (main or branch head) last — the
    // pointer move is the commit point; a crash in between leaves a
    // version file whose content never became current, which is the
    // same garbage-not-corruption class as an unpromoted staged file
    // (it references only promoted files and reads consistently)
    // zero-row append epochs publish nothing: an idle trigger must
    // not mint a version, and replaying an empty epoch is vacuously
    // exactly-once (complete-mode epochs always publish — an empty
    // epoch legitimately truncates)
    if (!isReplay && (promoted.nonEmpty || replace || txn.isEmpty))
      ManifestV2Sink.publish(path, published, previous ++ promoted,
        queryId, branch, txn,
        kind = currentKindOr(if (replace) "overwrite" else "append"))
    } // end head lock (cross-process commit section)
    }


  /** Publish `files` as the new state of `pointer` (main when
    * `branch` is None): versioned snapshot first, pointer rename as
    * the commit point — the single protocol every commit path shares.
    */
  private[sources] def publish(path: String, schema: StructType,
      files: Seq[String], tag: String, branch: Option[String] = None,
      txn: Option[(String, Long)] = None,
      kind: String = "write", foldSegments: Boolean = false): Unit = {
    // carry the streaming-commit ledger forward (and fold in this
    // commit's txn record, if any): the ledger must survive unrelated
    // commits/overwrites or a replayed epoch after an intervening
    // commit would re-apply — see [[parseTxns]]
    val pointer0 = branch.map(branchFile(path, _))
      .getOrElse(manifestFile(path))
    val txns = (parseTxns(pointer0) ++ txn.toMap).toSeq.sortBy(_._1)
      .map { case (q, e) => s"txn\t$q\t$e" }
    // SEGMENT REUSE (see the segmentation Scaladoc above
    // [[loadSegment]]): keep every previously-referenced segment
    // whose entries ALL survive into `files` (multiplicity-exact),
    // then write only the residual — commit bytes are O(changed),
    // not O(table). Entry ORDER is preserved within each kept
    // segment and within the residual; the expanded sequence is
    // kept-segments-then-residual, which is exactly `previous ++
    // new` for every append-shaped caller.
    val remaining = new java.util.HashMap[String, Integer]()
    files.foreach(f => remaining.merge(f, 1, (a, b) => a + b))
    val keptRefs = segRefsOf(pointer0).filter { name =>
      scala.util.Try {
        val es = loadSegment(Paths.get(path), name)
        val need = new java.util.HashMap[String, Integer]()
        es.foreach(e => need.merge(e, 1, (a, b) => a + b))
        val covered = need.entrySet.asScala.forall { en =>
          val have = remaining.get(en.getKey)
          have != null && have >= en.getValue
        }
        if (covered)
          es.foreach(e => remaining.merge(e, -1, (a, b) => a + b))
        covered
      }.getOrElse(false) // unreadable segment → rewrite its entries
    }
    val residual = files.filter { f =>
      val c = remaining.get(f)
      if (c != null && c > 0) { remaining.put(f, c - 1); true }
      else false
    }
    val items: Seq[String] =
      if (files.isEmpty) Seq.empty
      else if (foldSegments && files.length <= SegInlineMax)
        files // explicit fold of a small table: back to flat inline
      else if (foldSegments || keptRefs.length >= SegFoldAt)
        Seq(writeSegment(path, tag, files)) // fold: rebound head size
      else {
        val refs = keptRefs.map(n => {
          val es = loadSegment(Paths.get(path), n)
          s"seg\t$n\t${es.length}"
        })
        if (residual.isEmpty) refs
        else if (residual.length <= SegInlineMax)
          refs ++ residual // no refs → the pre-segmentation flat format
        else refs :+ writeSegment(path, tag, residual)
      }
    val body = ((schema.json +: (txns ++ items)).mkString("\n") + "\n")
      .getBytes(StandardCharsets.UTF_8)
    val vTmp = Paths.get(path, s"_MANIFEST.vtmp.$tag")
    Files.write(vTmp, body)
    // optimistic snapshot mint: hard-link is atomic create-IF-ABSENT
    // on POSIX (rename would silently replace an existing target), so
    // two concurrent committers — e.g. a main writer and a branch
    // writer — can never publish the same vNNNNN; the loser observes
    // FileAlreadyExists and retries the next number, Iceberg-style
    var nextV = versions(path).lastOption.getOrElse(0) + 1
    var minted = false
    while (!minted) {
      try { Files.createLink(versionFile(path, nextV), vTmp); minted = true }
      catch { case _: java.nio.file.FileAlreadyExistsException => nextV += 1 }
    }
    Files.deleteIfExists(vTmp)
    // commit wall-clock LOG: snapshot mtimes are not preserved by
    // directory copies/restores and are coarse on some filesystems, so
    // TIMESTAMP AS OF resolves against the publish time RECORDED at
    // publish. Append-only, written before the pointer move — a crash
    // in between leaves a logged version that never became current,
    // same garbage-not-corruption class as the snapshot file itself.
    // Every publish path already holds the head lock, so appends never
    // interleave.
    // the third field is the COMMIT KIND (append/overwrite/rewrite/
    // delete/...): what the change-feed reader classifies on — a
    // `rewrite` commit (compact/zorder/binpack) preserves row content
    // and emits NO change rows; pre-kind log lines parse as `unknown`
    // (conservative file-diff semantics)
    Files.write(Paths.get(path, "_MANIFEST.commits"),
      s"$nextV ${System.currentTimeMillis()} $kind\n"
        .getBytes(StandardCharsets.UTF_8),
      java.nio.file.StandardOpenOption.CREATE,
      java.nio.file.StandardOpenOption.APPEND)
    val pointer = branch.map(branchFile(path, _))
      .getOrElse(Paths.get(path, "_MANIFEST"))
    val tmp = Paths.get(path, s"_MANIFEST.tmp.$tag")
    Files.write(tmp, body)
    Files.move(tmp, pointer,
      StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
    if (branch.isEmpty) {
      // head-version HINT for the streaming source's latestOffset —
      // written AFTER the pointer move (the commit point) so it is
      // pure acceleration: a crash in between leaves a stale hint,
      // which readers detect by comparing the hinted snapshot's bytes
      // to the head and fall back to the descending scan
      val hTmp = Paths.get(path, s"_MANIFEST.headvtmp.$tag")
      Files.write(hTmp, nextV.toString.getBytes(StandardCharsets.UTF_8))
      Files.move(hTmp, Paths.get(path, "_MANIFEST.headv"),
        StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
    }
    ()
  }

  /** The head-version hint [[publish]] maintains for main commits —
    * UNVERIFIED (callers must check the hinted snapshot's bytes are
    * the head before trusting it); absent or unparseable → None.
    */
  private[sources] def readHeadVersionHint(path: String): Option[Int] = {
    val h = Paths.get(path, "_MANIFEST.headv")
    if (!Files.exists(h)) None
    else scala.util.Try(
      new String(Files.readAllBytes(h), StandardCharsets.UTF_8)
        .trim.toInt).toOption
  }

  /** Recorded publish wall-clock (epoch millis) per snapshot version,
    * from the append-only `_MANIFEST.commits` log [[publish]] writes.
    * Duplicate lines for a version (a crashed publish retried) keep
    * the FIRST record — the one whose pointer move could have
    * succeeded. Versions published before the log existed are absent;
    * resolvers fall back to the snapshot file's mtime for those.
    */
  private[sources] def commitTimes(path: String): Map[Int, Long] = {
    val f = Paths.get(path, "_MANIFEST.commits")
    if (!Files.exists(f)) Map.empty
    else Files.readAllLines(f, StandardCharsets.UTF_8).asScala
      .iterator.map(_.trim).filter(_.nonEmpty)
      .flatMap { line =>
        // "v time [kind]" — the kind field arrived with the change
        // feed; older two-field lines parse identically
        line.split(" ") match {
          case a if a.length >= 2 =>
            scala.util.Try((a(0).toInt, a(1).toLong)).toOption
          case _ => None
        }
      }.toSeq.groupBy(_._1).map { case (v, ts) => v -> ts.head._2 }
  }

  /** Recorded COMMIT KIND per snapshot version (the commit log's
    * third field): `append`/`overwrite`/`rewrite`/`delete`/`upsert`.
    * Pre-kind log lines and pre-log versions are absent — the change
    * feed treats them as `unknown` (conservative file-diff
    * semantics, never a silent skip).
    */
  private[sources] def commitKinds(path: String): Map[Int, String] = {
    val f = Paths.get(path, "_MANIFEST.commits")
    if (!Files.exists(f)) Map.empty
    else Files.readAllLines(f, StandardCharsets.UTF_8).asScala
      .iterator.map(_.trim).filter(_.nonEmpty)
      .flatMap { line =>
        line.split(" ") match {
          case a if a.length >= 3 =>
            scala.util.Try((a(0).toInt, a(2))).toOption
          case _ => None
        }
      }.toSeq.groupBy(_._1).map { case (v, ks) => v -> ks.head._2 }
  }

  /** Publish wall-clock of snapshot `v`: the commit log's record when
    * present, else the snapshot file's mtime (pre-log tables). The
    * `times` overload lets a resolver scanning MANY versions load the
    * append-only commit log ONCE ([[commitTimes]]) instead of
    * re-reading and re-parsing it per version — TIMESTAMP AS OF over
    * a long-lived table was O(versions²) file reads without it.
    */
  private[sources] def publishTimeMillis(path: String, v: Int,
      times: Map[Int, Long]): Long =
    times.getOrElse(v,
      Files.getLastModifiedTime(versionFile(path, v)).toMillis)

  private[sources] def publishTimeMillis(path: String, v: Int): Long =
    publishTimeMillis(path, v, commitTimes(path))

  /** Data files present on disk but referenced by NO retained
    * manifest — current, versioned, or any live branch head: crash
    * debris, or files whose last referencing snapshot was expired.
    * Safe to delete any time (the vacuum sweep); returned instead of
    * deleted so the policy stays with the caller. Time-travel- or
    * branch-reachable files are NOT listed — vacuum after retention,
    * not before.
    */
  def unreferencedFiles(path: String): Seq[String] = {
    val committed = (readManifest(path).map(_._2).getOrElse(Seq.empty) ++
      versions(path).flatMap(v =>
        parseManifest(versionFile(path, v)).map(_._2).getOrElse(Seq.empty)) ++
      branches(path).flatMap(b =>
        parseManifest(branchFile(path, b)).map(_._2).getOrElse(Seq.empty)))
      // stats/tombstone markup is not part of identity, but a
      // deletion-vector sidecar IS a referenced file
      .flatMap(e => entryFile(e) +: entryDv(e).map(_._1).toList)
      .toSet
    val dataDir = Paths.get(path, "data")
    if (!Files.exists(dataDir)) Seq.empty
    else {
      val s = Files.list(dataDir)
      try s.iterator().asScala
        .map(p => s"data/${p.getFileName}")
        .filterNot(committed)
        .toSeq.sorted
      finally s.close()
    }
  }

  /** Delete unreferenced data files — the reclamation sweep, taken
    * UNDER the table's commit locks. Commit paths move data files
    * into `data/` BEFORE the pointer rename that references them
    * ([[promoteAndPublish]], scratch adoption), so an unlocked sweep
    * racing that window would delete a file the about-to-publish
    * manifest references — permanent loss. Holding
    * [[commitLock]]+[[withHeadLock]] serializes against every
    * in-process and cross-process committer on this host.
    * `minAgeMillis` additionally skips files younger than the
    * threshold (Delta-style retention) as defense in depth for
    * committers not covered by the advisory file lock (e.g. a remote
    * writer on a shared filesystem). Returns the deleted paths.
    */
  /** Segment files (`_MANIFEST.seg.*`) referenced by NO retained
    * head, branch head, or version snapshot — orphans from expired
    * snapshots or crashed publishes. Raw ref scan (no expansion):
    * O(retained manifests), never O(entries).
    */
  private[sources] def unreferencedSegments(path: String): Seq[String] = {
    val live = (segRefsOf(manifestFile(path)) ++
      versions(path).flatMap(v => segRefsOf(versionFile(path, v))) ++
      branches(path).flatMap(b => segRefsOf(branchFile(path, b)))).toSet
    val dir = Paths.get(path)
    if (!Files.exists(dir)) Seq.empty
    else {
      val s = Files.list(dir)
      try s.iterator().asScala.map(_.getFileName.toString)
        .filter(n => n.startsWith("_MANIFEST.seg.") && !live(n))
        .toSeq.sorted
      finally s.close()
    }
  }

  def vacuum(path: String, minAgeMillis: Long = 0L): Seq[String] =
    commitLock(path).synchronized {
      withHeadLock(path) {
        val cutoff = System.currentTimeMillis() - math.max(0L, minAgeMillis)
        val victims = (unreferencedFiles(path) ++
          unreferencedSegments(path)).filter { rel =>
          val p = Paths.get(path, rel)
          Files.exists(p) && Files.getLastModifiedTime(p).toMillis <= cutoff
        }
        victims.foreach(rel => Files.deleteIfExists(Paths.get(path, rel)))
        victims
      }
    }
}

private[sources] class ManifestTable(schema0: StructType, path: String,
    branch: Option[String] = None, asOfVersion: Option[Int] = None,
    cdf: Boolean = false)
    extends Table with SupportsWrite with SupportsRead
    with org.apache.spark.sql.connector.catalog.SupportsDelete {
  require(branch.isEmpty || asOfVersion.isEmpty,
    "branch and asOfVersion are mutually exclusive")
  require(!cdf || (branch.isEmpty && asOfVersion.isEmpty),
    "readChangeFeed composes with neither branch nor asOfVersion")
  /** Table directory — the MERGE rule needs the commit target. */
  private[sources] def dir: String = path

  /** VALUE equality: `BatchScanExec` is a case class whose equality
    * includes its `table` field, and every catalog `loadTable` builds
    * a fresh instance — without this, two scans of the same table
    * never canonicalize equal, which silently disables exchange reuse
    * AND makes AQE drop planted dynamic-pruning filters (its reuse
    * check is `sameResult` against the join's build side).
    */
  override def equals(other: Any): Boolean = other match {
    case o: ManifestTable => o.dir == path && o.schema() == schema0 &&
      o.branchOpt == branch && o.asOfVersionOpt == asOfVersion &&
      o.cdfOpt == cdf
    case _ => false
  }
  override def hashCode(): Int =
    (path, schema0, branch, asOfVersion, cdf).hashCode()
  private[sources] def cdfOpt: Boolean = cdf
  private[sources] def branchOpt: Option[String] = branch
  private[sources] def asOfVersionOpt: Option[Int] = asOfVersion
  override def name(): String =
    s"graft-manifest($path${branch.map("@" + _).getOrElse("")}" +
      s"${asOfVersion.map("@v" + _).getOrElse("")})"
  override def schema(): StructType = schema0
  override def partitioning(): Array[Transform] =
    ManifestV2Sink.tablePartitionColumns(path).map(c =>
      org.apache.spark.sql.connector.expressions.Expressions
        .identity(c): Transform).toArray
  // a time-travel relation is a frozen snapshot: read-only by
  // construction (writes/deletes target the head, never history)
  override def capabilities(): util.Set[TableCapability] =
    if (asOfVersion.isDefined)
      util.EnumSet.of(TableCapability.BATCH_READ)
    else
      util.EnumSet.of(TableCapability.BATCH_WRITE, TableCapability.TRUNCATE,
        TableCapability.BATCH_READ, TableCapability.MICRO_BATCH_READ,
        TableCapability.STREAMING_WRITE)

  // ------------------------------------------------ SQL DELETE FROM
  // Three tiers, cheapest sound plan first:
  //  - bare `DELETE FROM graft.t` → TRUNCATE (one empty-list commit);
  //  - `key = v` / `key IN (...)` on a primitive column → the
  //    MERGE-ON-READ tombstone path ([[ManifestV2Sink.delete]]): a
  //    metadata-sized commit, zero data files rewritten — the
  //    GDPR-scale point delete;
  //  - any other supported predicate (ranges, conjunctions, typed
  //    columns — `WHERE ts < X` included) → the FILE-NARROWED
  //    copy-on-write ([[ManifestV2Sink.deleteWhere]]): stats-proven
  //    all-match files drop as pure metadata, disjoint files carry
  //    over untouched, only boundary files rewrite. Needs a
  //    tombstone-free head (compact first), else refused at analysis.
  // Unsupported shapes are refused at analysis so Spark reports the
  // table un-deletable instead of silently over- or under-deleting.
  private def deletableKeys(filters: Array[
      org.apache.spark.sql.sources.Filter]): Option[(String, Seq[Any])] = {
    def tombstonable(c: String): Boolean =
      schema0.fieldNames.contains(c) && (schema0(c).dataType match {
        case LongType | IntegerType | DoubleType | BooleanType |
             StringType => true
        case _ => false // typed keys route to the predicate path
      })
    filters match {
      case Array(org.apache.spark.sql.sources.EqualTo(c, v))
        if tombstonable(c) => Some((c, Seq(v)))
      case Array(org.apache.spark.sql.sources.In(c, vs))
        if tombstonable(c) => Some((c, vs.toSeq))
      case _ => None
    }
  }

  private def truncating(filters: Array[
      org.apache.spark.sql.sources.Filter]): Boolean =
    filters.isEmpty ||
      filters.sameElements(Array(org.apache.spark.sql.sources.AlwaysTrue))

  override def canDeleteWhere(filters: Array[
      org.apache.spark.sql.sources.Filter]): Boolean =
    branch.isEmpty && asOfVersion.isEmpty && (truncating(filters) ||
      deletableKeys(filters).isDefined ||
      (ManifestSkipping.filtersToColumn(filters.toSeq).isDefined &&
        ManifestV2Sink.committedDeleteFileCount(path) == 0))

  override def deleteWhere(filters: Array[
      org.apache.spark.sql.sources.Filter]): Unit = {
    require(branch.isEmpty, "SQL DELETE targets main only")
    val spark = org.apache.spark.sql.SparkSession.active
    if (truncating(filters)) {
      // unconditional delete = truncate: ONE empty-list commit, old
      // snapshots stay time-travelable until retention expires them
      ManifestV2Sink.commitLock(path).synchronized {
        ManifestV2Sink.withHeadLock(path) {
          val (schema, _) = ManifestV2Sink.readManifest(path).getOrElse(
            throw new IllegalArgumentException(s"no manifest at $path"))
          ManifestV2Sink.publish(path, schema, Seq.empty, "sql-truncate",
            kind = "delete")
        }
      }
    } else deletableKeys(filters) match {
      case Some((keyCol, values)) =>
        val f = schema0(keyCol)
        val rows = values.map(v =>
          org.apache.spark.sql.Row(v)).asJava
        val keys = spark.createDataFrame(rows,
          StructType(Seq(f.copy(nullable = true))))
        ManifestV2Sink.delete(spark, path, keyCol, keys)
      case None =>
        ManifestV2Sink.deleteWhere(spark, path, filters.toSeq)
        ()
    }
  }

  // DSv2 read paths: BATCH (serves SQL SELECT via [[ManifestCatalog]])
  // and TABLE-AS-STREAM (see [[ManifestMicroBatchStream]]);
  // [[ManifestV2Sink.readCommitted]] stays the API-level batch surface.
  // A `branch` option threads into the batch scan (the branch head's
  // entries), so `.option("branch", b).load(dir)` reads the BRANCH —
  // never silently main's data; streams follow main by contract
  // (branch snapshots never become offsets), so a branch stream read
  // is rejected loudly instead.
  //
  // PUSHDOWN: column pruning reaches the parquet payload (only
  // requested columns decode) and pushed filters do double duty —
  // whole-FILE skipping at planning via the manifest's per-file
  // stats/partitions/Blooms ([[ManifestSkipping]]) and row-GROUP
  // skipping inside each parquet file. Every filter is also returned
  // as residual, so Spark re-applies it — skipping is IO savings,
  // never a semantics change (the same contract Spark's own file
  // sources use).
  override def newScanBuilder(
      options: CaseInsensitiveStringMap): ScanBuilder = new ScanBuilder
      with org.apache.spark.sql.connector.read.SupportsPushDownRequiredColumns
      with org.apache.spark.sql.connector.read.SupportsPushDownFilters
      with org.apache.spark.sql.connector.read.SupportsPushDownAggregates
      with org.apache.spark.sql.connector.read.SupportsPushDownLimit
      with org.apache.spark.sql.connector.read.SupportsPushDownTopN {
    // admission control for the table-as-stream read: cap the number
    // of newly-committed data FILES consumed per micro-batch
    private val maxFilesPerTrigger: Option[Int] =
      Option(options.get("maxFilesPerTrigger")).map { v =>
        val n = v.toInt
        require(n >= 1, s"maxFilesPerTrigger must be >= 1, got $n")
        n
      }
    private var required: StructType = schema0
    private var pushed: Array[org.apache.spark.sql.sources.Filter] =
      Array.empty

    override def pruneColumns(r: StructType): Unit =
      // intersect defensively: Spark only asks for subsets, and the
      // readers index the table schema by the required names
      required = StructType(
        r.fields.filter(f => schema0.fieldNames.contains(f.name)))

    override def pushFilters(
        filters: Array[org.apache.spark.sql.sources.Filter])
        : Array[org.apache.spark.sql.sources.Filter] = {
      pushed = filters
      filters // all residual — Spark re-evaluates on top of skipping
    }

    override def pushedFilters(): Array[org.apache.spark.sql.sources.Filter] =
      pushed

    // ---- aggregate pushdown: COUNT/MIN/MAX (± partition grouping)
    // answered from manifest metadata alone when exact — zero data
    // files read, Aggregate erased ([[ManifestAggPushdown]]); any
    // inexactness (filters, tombstones, DVs on extremes, missing
    // stats) declines to the row scan.
    private var aggPlan: Option[(StructType,
      Array[org.apache.spark.sql.catalyst.InternalRow])] = None

    override def supportCompletePushDown(
        agg: org.apache.spark.sql.connector.expressions.aggregate
          .Aggregation): Boolean =
      !cdf && ManifestAggPushdown.tryPlan(path, schema0, branch,
        asOfVersion, pushed.nonEmpty, agg).isDefined

    override def pushAggregation(
        agg: org.apache.spark.sql.connector.expressions.aggregate
          .Aggregation): Boolean = {
      if (cdf) return false
      aggPlan = ManifestAggPushdown.tryPlan(path, schema0, branch,
        asOfVersion, pushed.nonEmpty, agg)
      aggPlan.isDefined
    }

    // ---- limit/top-N pushdown: PARTIAL (Spark keeps its Limit /
    // TakeOrdered — these only bound how many FILES the scan plans).
    // A bare LIMIT k stops planning files once the recorded live-row
    // counts reach k; an ORDER BY col LIMIT k keeps only files whose
    // stats bounds can intersect the k extreme rows
    // ([[ManifestScanPlanner.boundEntries]]). Declined under pushed
    // filters (residual filters make per-file row counts meaningless
    // for the bound).
    private var limitK: Option[Int] = None
    private var topn: Option[(String, Boolean, Int)] = None

    override def isPartiallyPushed(): Boolean = true

    override def pushLimit(k: Int): Boolean =
      if (cdf || pushed.nonEmpty || k <= 0) false
      else { limitK = Some(k); true }

    override def pushTopN(
        orders: Array[org.apache.spark.sql.connector.expressions
          .SortOrder], k: Int): Boolean =
      if (cdf || pushed.nonEmpty || k <= 0 || orders.isEmpty) false
      else orders.head.expression() match {
        // bounding by the PRIMARY sort key is sound for a multi-key
        // order: lexicographic top-k rows carry exactly the k
        // smallest (largest) primary-key values as a multiset
        case f: org.apache.spark.sql.connector.expressions
            .NamedReference if f.fieldNames.length == 1 &&
          schema0.fieldNames.contains(f.fieldNames.head) =>
          val asc = orders.head.direction() ==
            org.apache.spark.sql.connector.expressions.SortDirection
              .ASCENDING
          topn = Some((f.fieldNames.head, asc, k))
          true
        case _ => false
      }

    override def build(): Scan = aggPlan match {
      case Some((outSchema, rows)) =>
        new ManifestAggScan(path, outSchema, rows)
      case None =>
        new ManifestScan(path, schema0, required, pushed.toSeq, branch,
          asOfVersion, maxFilesPerTrigger, limitK, topn, cdf)
    }
  }

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder = {
    asOfVersion.foreach(v => throw new UnsupportedOperationException(
      s"cannot write to the frozen snapshot v$v — writes target the head"))
    new WriteBuilder with SupportsTruncate {
      private var replace = false
      override def truncate(): WriteBuilder = { replace = true; this }
      private def layout(): (Seq[String], Seq[String]) = {
        val optPart = Option(info.options.get("partitionBy")).toSeq
          .flatMap(_.split(",")).map(_.trim).filter(_.nonEmpty)
        // the table's DDL partition spec (PARTITIONED BY sidecar)
        // governs every write; a conflicting per-write option is an
        // error, never a silent layout fork
        val ddlPart = ManifestV2Sink.tablePartitionColumns(path)
        require(optPart.isEmpty || ddlPart.isEmpty || optPart == ddlPart,
          s"partitionBy option $optPart conflicts with the table's " +
            s"PARTITIONED BY spec $ddlPart")
        val bloom = Option(info.options.get("bloomColumns")).toSeq
          .flatMap(_.split(",")).map(_.trim).filter(_.nonEmpty)
        ((if (optPart.nonEmpty) optPart else ddlPart), bloom)
      }
      override def build(): Write = new Write
          with org.apache.spark.sql.connector.write
            .RequiresDistributionAndOrdering {
        /** Partitioned writes require a CLUSTERED distribution on the
          * partition columns: Spark inserts the shuffle itself, so
          * every partition value lands in exactly ONE task and the
          * fan-out writer emits ONE file per value — without it, an
          * unclustered 1000-task insert writes up to 1000 slivers PER
          * partition (the classic small-files problem; Iceberg's
          * write distribution does the same). Unpartitioned writes
          * are unconstrained.
          */
        override def requiredDistribution()
            : org.apache.spark.sql.connector.distributions.Distribution = {
          val (part, _) = layout()
          if (part.isEmpty)
            org.apache.spark.sql.connector.distributions.Distributions
              .unspecified()
          else
            org.apache.spark.sql.connector.distributions.Distributions
              .clustered(part.map(c =>
                org.apache.spark.sql.connector.expressions.Expressions
                  .identity(c): org.apache.spark.sql.connector
                  .expressions.Expression).toArray)
        }
        override def requiredOrdering()
            : Array[org.apache.spark.sql.connector.expressions.SortOrder] =
          Array.empty
        override def toBatch: BatchWrite = {
          val (part, bloom) = layout()
          new ManifestBatchWrite(path, info.schema(), info.queryId(),
            replace, branch, bloom, part)
        }
        override def toStreaming: org.apache.spark.sql.connector.write
            .streaming.StreamingWrite = {
          branch.foreach(b => throw new UnsupportedOperationException(
            s"graft-manifest streaming writes target MAIN; cannot " +
              s"stream into branch '$b'"))
          val (part, bloom) = layout()
          new ManifestStreamingWrite(path, info.schema(), info.queryId(),
            replace, bloom, part)
        }
      }
    }
  }
}

/** `stats` is the pre-serialized per-file column-stats blob
  * (`S|col:K:min:max|...`, empty when nothing numeric was written),
  * `blooms` the per-file Bloom blob (`B|col:base64|...`, empty unless
  * the write opted in via `bloomColumns`), `partition` the per-file
  * partition-value blob (`P|col:value|...`, empty unless the write
  * declared `partitionBy`), `nulls` the per-file null-count blob
  * (`N|col:n|...`, for stats-covered columns — the no-nulls proof
  * predicate DELETE's whole-file drops need) — each becomes one tab
  * field of the data entry at publish.
  */
private[sources] case class StagedFile(name: String, rows: Long,
    stats: String = "", blooms: String = "",
    partition: String = "", nulls: String = "",
    strs: String = "") extends WriterCommitMessage

/** A partitioned write's task commit: one staged file PER partition
  * value the task saw (the Hive/Iceberg fan-out writer shape).
  */
private[sources] case class StagedFiles(
    files: Seq[StagedFile]) extends WriterCommitMessage

private[sources] class ManifestBatchWrite(path: String, schema: StructType,
    queryId: String, replace: Boolean,
    branch: Option[String] = None,
    bloomColumns: Seq[String] = Seq.empty,
    partitionBy: Seq[String] = Seq.empty) extends BatchWrite {

  override def createBatchWriterFactory(
      info: PhysicalWriteInfo): DataWriterFactory =
    new ManifestWriterFactory(path, schema, queryId, bloomColumns,
      partitionBy)

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    ManifestV2Sink.promoteAndPublish(path, schema, queryId, replace,
      branch, messages)
    cleanupStaged()
  }
  override def abort(messages: Array[WriterCommitMessage]): Unit =
    // job failed after some tasks committed: none of their files were
    // promoted or referenced, so deleting the staging dir restores the
    // exact pre-job state
    cleanupStaged()

  private def cleanupStaged(): Unit =
    ManifestV2Sink.cleanupStaged(path, queryId)
}

/** STREAMING_WRITE into a manifest table — the production shape of
  * the reference's ingestion path: `writeStream.format("graft-
  * manifest")` lands each micro-batch as ONE committed, snapshotted,
  * time-travelable table version, EXACTLY-ONCE. Exactly-once comes
  * from the txn ledger carried inside the manifest body
  * ([[ManifestV2Sink.parseTxns]]): Structured Streaming delivers
  * `commit(epochId, ...)` at-least-once with deterministic replayed
  * contents, and the ledger (keyed by the STABLE streaming query id,
  * which survives restarts with the checkpoint) rides the same atomic
  * pointer rename as the entry list — so a replayed epoch is
  * recognized under the head lock and skipped, with its staged files
  * left as vacuumable garbage. Zero-row append epochs publish nothing
  * (idle triggers mint no versions). Complete mode (`truncate`)
  * replaces the table every epoch. Partition fan-out and Bloom
  * options ride unchanged from the batch writer — the data-file and
  * manifest formats are IDENTICAL, so streamed commits time-travel,
  * prune, and compact exactly like batch ones.
  */
private[sources] class ManifestStreamingWrite(path: String,
    schema: StructType, queryId: String, replaceEachEpoch: Boolean,
    bloomColumns: Seq[String], partitionBy: Seq[String])
    extends org.apache.spark.sql.connector.write.streaming.StreamingWrite
    with Serializable { // the writer factory ships to executors

  private def epochQueryId(epochId: Long): String = s"$queryId-e$epochId"

  override def createStreamingWriterFactory(
      info: PhysicalWriteInfo): org.apache.spark.sql.connector.write
        .streaming.StreamingDataWriterFactory =
    new org.apache.spark.sql.connector.write.streaming
        .StreamingDataWriterFactory {
      override def createWriter(partitionId: Int, taskId: Long,
          epochId: Long): DataWriter[InternalRow] =
        new ManifestWriterFactory(path, schema, epochQueryId(epochId),
          bloomColumns, partitionBy).createWriter(partitionId, taskId)
    }

  override def commit(epochId: Long,
      messages: Array[WriterCommitMessage]): Unit = {
    ManifestV2Sink.promoteAndPublish(path, schema, epochQueryId(epochId),
      replaceEachEpoch, None, messages, Some((queryId, epochId)))
    ManifestV2Sink.cleanupStaged(path, epochQueryId(epochId))
  }

  override def abort(epochId: Long,
      messages: Array[WriterCommitMessage]): Unit =
    ManifestV2Sink.cleanupStaged(path, epochQueryId(epochId))
}

private[sources] class ManifestWriterFactory(path: String,
    schema: StructType, queryId: String,
    bloomColumns: Seq[String] = Seq.empty,
    partitionBy: Seq[String] = Seq.empty) extends DataWriterFactory {
  // fail fast on types the parquet payload doesn't cover — at plan
  // time, not per row on an executor
  require(schema.fields.forall(f => ParquetPayload.supportedType(f.dataType)),
    "graft-manifest columns are BIGINT/INT/DOUBLE/BOOLEAN/STRING/DATE/" +
      s"TIMESTAMP/DECIMAL(p,s), got: $schema")
  // Bloom columns must exist, be integral (the probe hashes int64),
  // and have blob-safe names — also checked at plan time
  bloomColumns.foreach { c =>
    require(schema.fieldNames.contains(c) && c.matches("[A-Za-z0-9_]+") &&
      (schema(c).dataType == LongType || schema(c).dataType == IntegerType),
      s"bloomColumns: $c must be an existing integral column")
  }
  // partition columns must exist, be blob-safe names, and be types a
  // partition VALUE can identify (never double: binary float rendering
  // is a partition-identity footgun every real format also rejects)
  partitionBy.foreach { c =>
    require(schema.fieldNames.contains(c) && c.matches("[A-Za-z0-9_]+") &&
      (schema(c).dataType match {
        case LongType | IntegerType | StringType | BooleanType |
             DateType => true
        case _ => false
      }),
      s"partitionBy: $c must be an existing long/int/string/boolean/" +
        "date column")
  }

  override def createWriter(partitionId: Int,
      taskId: Long): DataWriter[InternalRow] =
    new ManifestDataWriter(path, schema, queryId, partitionId, taskId,
      bloomColumns, partitionBy)
}

/** FAN-OUT writer: with no `partitionBy` a task streams to ONE staged
  * file; with a partition spec it keeps one open [[FileSink]] per
  * distinct partition-value tuple it sees (the Hive/Iceberg fan-out
  * writer), so every data file holds exactly one partition value and
  * its manifest entry records it — the metadata partition pruning
  * reads ([[ManifestV2Sink.prunedPartitionFiles]]). Callers SHOULD
  * repartition by the partition columns first (then each task fans
  * out to ~1 sink); the writer stays correct either way.
  */
private[sources] class ManifestDataWriter(path: String, schema: StructType,
    queryId: String, partitionId: Int, taskId: Long,
    bloomColumns: Seq[String] = Seq.empty,
    partitionBy: Seq[String] = Seq.empty)
    extends DataWriter[InternalRow] {

  private val stagedDir = {
    val dir = Paths.get(path, "_staged", queryId)
    Files.createDirectories(dir)
    dir
  }
  private val partIdx: Array[Int] =
    partitionBy.map(schema.fieldIndex).toArray
  private val sinks =
    scala.collection.mutable.LinkedHashMap.empty[Seq[String], FileSink]

  private def sinkFor(row: InternalRow): FileSink = {
    if (partIdx.isEmpty)
      sinks.getOrElseUpdate(Seq.empty, new FileSink("", ""))
    else {
      val vals: Seq[String] = partIdx.toSeq.map { i =>
        if (row.isNullAt(i)) "%00" // impossible as an escaped real value
        else schema.fields(i).dataType match {
          case LongType => row.getLong(i).toString
          // DATE renders as epoch DAYS — the same unit the L-kind
          // stats record, so numeric partition pruning composes
          case IntegerType | DateType => row.getInt(i).toString
          case BooleanType => row.getBoolean(i).toString
          case _ => ManifestV2Sink.escapePart(row.getUTF8String(i).toString)
        }
      }
      sinks.getOrElseUpdate(vals, {
        val blob = partitionBy.zip(vals)
          .map { case (c, v) => s"$c:$v" }.mkString("P|", "|", "")
        new FileSink(s"-p${sinks.size}", blob)
      })
    }
  }

  /** One staged file's streaming state: writer, row count, per-column
    * min/max stats, opt-in Bloom value buffers.
    */
  private final class FileSink(suffix: String, val partBlob: String) {
    val name = s"part-$queryId-$partitionId-$taskId$suffix.parquet"
    val staged: Path = stagedDir.resolve(name)
    private val out = ParquetPayload.writer(staged, schema)
    var rows = 0L

  // per-file min/max for ORDERABLE columns, tracked as rows stream
  // through (Iceberg's write-time file stats in miniature): integral/
  // date/timestamp bounds exact in Long (days/micros), decimal bounds
  // exact as decimal text, double bounds skip NaN (a range predicate
  // is false for NaN, so skipping a file can never lose NaN matches —
  // there are none). Only [A-Za-z0-9_]+ names are recorded: the stats
  // blob's serialization reserves ':' and '|'.
  private val statIdx: Array[Int] = schema.fields.zipWithIndex.collect {
    case (f, i) if (f.dataType match {
      case LongType | IntegerType | DoubleType | DateType |
           TimestampType => true
      case _: DecimalType => true
      case _ => false
    }) && f.name.matches("[A-Za-z0-9_]+") => i
  }.toArray
  // STRING bounds (Iceberg-style truncated): byte-wise unsigned
  // min/max tracked as copies (the writer's rows are consumed
  // immediately, buffers may be reused); serialized as a 16-byte
  // lower-bound prefix and an INCREMENTED upper-bound prefix — the
  // truncation direction that keeps range/equality skipping sound
  private val strIdx: Array[Int] = schema.fields.zipWithIndex.collect {
    case (f, i) if f.dataType == StringType &&
      f.name.matches("[A-Za-z0-9_]+") => i
  }.toArray
  private val strMin = new Array[Array[Byte]](schema.length)
  private val strMax = new Array[Array[Byte]](schema.length)
  private val statN = new Array[Long](schema.length)
  private val statMinL = Array.fill(schema.length)(Long.MaxValue)
  private val statMaxL = Array.fill(schema.length)(Long.MinValue)
  private val statMinD = Array.fill(schema.length)(Double.PositiveInfinity)
  private val statMaxD = Array.fill(schema.length)(Double.NegativeInfinity)
  private val statMinB = new Array[java.math.BigDecimal](schema.length)
  private val statMaxB = new Array[java.math.BigDecimal](schema.length)

  private def trackStats(row: InternalRow): Unit = {
    var s = 0
    while (s < statIdx.length) {
      val i = statIdx(s)
      if (!row.isNullAt(i)) schema.fields(i).dataType match {
        case LongType | IntegerType | DateType | TimestampType =>
          val v = schema.fields(i).dataType match {
            case LongType | TimestampType => row.getLong(i)
            case _ => row.getInt(i).toLong
          }
          if (v < statMinL(i)) statMinL(i) = v
          if (v > statMaxL(i)) statMaxL(i) = v
          statN(i) += 1
        case DoubleType =>
          val v = row.getDouble(i)
          if (!v.isNaN) {
            if (v < statMinD(i)) statMinD(i) = v
            if (v > statMaxD(i)) statMaxD(i) = v
            statN(i) += 1
          }
        case d: DecimalType =>
          val v = row.getDecimal(i, d.precision, d.scale).toJavaBigDecimal
          if (statMinB(i) == null || v.compareTo(statMinB(i)) < 0)
            statMinB(i) = v
          if (statMaxB(i) == null || v.compareTo(statMaxB(i)) > 0)
            statMaxB(i) = v
          statN(i) += 1
        case _ =>
      }
      s += 1
    }
    var t = 0
    while (t < strIdx.length) {
      val i = strIdx(t)
      if (!row.isNullAt(i)) {
        // getBytes returns the BACKING array (no copy) when the
        // string exactly spans it — compare against the retained
        // bounds first, and copy ONLY when we retain, so a reused
        // upstream buffer can never mutate published T| bounds
        val u = row.getUTF8String(i)
        val b = u.getBytes
        if (strMin(i) == null ||
            ManifestV2Sink.compareBytes(b, strMin(i)) < 0)
          strMin(i) = java.util.Arrays.copyOf(b, b.length)
        if (strMax(i) == null ||
            ManifestV2Sink.compareBytes(b, strMax(i)) > 0)
          strMax(i) = java.util.Arrays.copyOf(b, b.length)
        statN(i) += 1
      }
      t += 1
    }
  }

  // opt-in per-file Bloom filters: values buffer during the write
  // (8 bytes/row/column on the task — a 1M-row file costs 8 MB
  // transient heap) so the bit array can be SIZED to the file at
  // commit: 12 bits/key ⇒ ~1% false positives with the 4-probe
  // Kirsch–Mitzenmacher scheme, power-of-two clamped to [1 Kbit,
  // 16 Mbit]. Nulls don't enter the filter (an equality predicate is
  // false for null).
  private val bloomIdx: Array[Int] =
    bloomColumns.map(c => schema.fieldIndex(c)).toArray
  private val bloomVals: Array[scala.collection.mutable.ArrayBuffer[Long]] =
    Array.fill(bloomIdx.length)(scala.collection.mutable.ArrayBuffer.empty)

  private def trackBloom(row: InternalRow): Unit = {
    var i = 0
    while (i < bloomIdx.length) {
      val f = bloomIdx(i)
      if (!row.isNullAt(f)) {
        val v = schema.fields(f).dataType match {
          case LongType => row.getLong(f)
          case _ => row.getInt(f).toLong
        }
        bloomVals(i) += v
      }
      i += 1
    }
  }

  private def bloomBlob(): String = {
    val cols = bloomIdx.indices.iterator.filter(bloomVals(_).nonEmpty)
      .map { i =>
        val vs = bloomVals(i)
        val mBits = math.min(1L << 24,
          java.lang.Long.highestOneBit(
            math.max(1024L, 12L * vs.length) * 2 - 1))
        val bits = new Array[Byte]((mBits / 8).toInt)
        vs.foreach(ManifestV2Sink.bloomSet(bits, _))
        s"${schema.fields(bloomIdx(i)).name}:" +
          java.util.Base64.getEncoder.encodeToString(bits)
      }.toSeq
    if (cols.isEmpty) "" else cols.mkString("B|", "|", "")
  }

  private def statsBlob(): String = {
    val cols = statIdx.iterator.filter(statN(_) > 0).map { i =>
      schema.fields(i).dataType match {
        case DoubleType =>
          s"${schema.fields(i).name}:D:${statMinD(i)}:${statMaxD(i)}"
        case _: DecimalType =>
          s"${schema.fields(i).name}:B:${statMinB(i).toPlainString}:" +
            statMaxB(i).toPlainString
        case _ =>
          s"${schema.fields(i).name}:L:${statMinL(i)}:${statMaxL(i)}"
      }
    }.toSeq
    if (cols.isEmpty) "" else cols.mkString("S|", "|", "")
  }

  /** Null counts for the stats-covered columns (rows minus non-null
    * tracked values; NaN counts as null for doubles — a sound
    * over-count, see [[ManifestV2Sink.entryNullCount]]).
    */
  private def nullsBlob(): String = {
    // emitted even when statN == 0: `N|col:rows` PROVES an all-null
    // file, which lets aggregate pushdown fold MIN/MAX over it (the
    // file contributes no value) instead of declining
    val cols = (statIdx.iterator ++ strIdx.iterator).map { i =>
      s"${schema.fields(i).name}:${rows - statN(i)}"
    }.toSeq
    if (cols.isEmpty) "" else cols.mkString("N|", "|", "")
  }

  /** `T|col:b64(min16):b64(maxUpper16)|...` — truncated string
    * bounds. The min prefix is a valid LOWER bound as-is (a prefix
    * byte-compares ≤ its extension); the max prefix is INCREMENTED at
    * its last non-0xFF byte to a strict UPPER bound, or omitted
    * (empty b64) when no finite prefix bound exists.
    */
  private def stringStatsBlob(): String = {
    val enc = java.util.Base64.getEncoder
    val cols = strIdx.iterator.filter(statN(_) > 0).map { i =>
      val lo = strMin(i).take(16)
      val hi = ManifestV2Sink.upperBoundPrefix(strMax(i), 16)
      s"${schema.fields(i).name}:${enc.encodeToString(lo)}:" +
        hi.map(enc.encodeToString).getOrElse("")
    }.toSeq
    if (cols.isEmpty) "" else cols.mkString("T|", "|", "")
  }

    def writeRow(row: InternalRow): Unit = {
      out.write(row) // values consumed immediately — row reuse safe
      trackStats(row)
      trackBloom(row)
      rows += 1
    }

    def finish(): StagedFile = {
      out.close()
      StagedFile(name, rows, statsBlob(), bloomBlob(), partBlob,
        nullsBlob(), stringStatsBlob())
    }

    def abortSink(): Unit = {
      out.close()
      Files.deleteIfExists(staged)
      ()
    }
  } // end FileSink

  override def write(row: InternalRow): Unit = sinkFor(row).writeRow(row)

  override def commit(): WriterCommitMessage =
    // empty tasks commit zero files (nothing staged, nothing promoted);
    // a statless zero-row file would poison pruned reads forever
    StagedFiles(sinks.values.map(_.finish()).toSeq)

  override def abort(): Unit =
    // losing attempt (failure, retry loser, speculation loser): remove
    // the staged files so only committed attempts can ever be promoted
    sinks.values.foreach(_.abortSink())

  override def close(): Unit = ()
}


/** The DSv2 scan over a manifest table head/branch/snapshot. A NAMED
  * class with VALUE equality (path + projection + pushed filters +
  * branch/version): Spark's exchange-reuse and AQE dynamic-pruning
  * machinery compare physical plans by canonicalized equality, and
  * `BatchScanExec` delegates to `Scan.equals` — an anonymous scan
  * compares by reference, so the dim side of a DPP join never looks
  * like "the same exchange" and AQE silently replaces the planted
  * runtime filter with TRUE. `runtimePrune` (mutable per-execution
  * DPP state) stays OUTSIDE the equality: BatchScanExec carries the
  * runtime-filter expressions itself and canonicalizes them.
  */
private[sources] class ManifestScan(val path: String,
    schema0: StructType, val req: StructType,
    val flt: Seq[org.apache.spark.sql.sources.Filter],
    val branch: Option[String], val asOfVersion: Option[Int],
    val maxFilesPerTrigger: Option[Int] = None,
    val limit: Option[Int] = None,
    val topn: Option[(String, Boolean, Int)] = None,
    val cdf: Boolean = false)
    extends Scan
    with org.apache.spark.sql.connector.read.SupportsReportStatistics
    with org.apache.spark.sql.connector.read.SupportsRuntimeFiltering
    with org.apache.spark.sql.connector.read.SupportsReportPartitioning {

  /** STORAGE-PARTITIONED JOIN surface: when the table is
    * DDL-partitioned, every planned file carries its partition values
    * (the fan-out writer's P| blobs), and the partition columns
    * survive column pruning, the scan reports a
    * KeyGroupedPartitioning over them — each file partition exposes
    * its key ([[ManifestFilePartition.partitionKey]]), Spark's
    * key-grouped machinery groups same-key files, and an equi-join on
    * the partition keys between two such tables drops BOTH exchanges
    * (the DSv2 bucketed-table shape; at 100 TB the join's only data
    * movement is the scan). Legacy/unkeyed entries, pruned-away
    * partition columns, or an unpartitioned table fall back to
    * UnknownPartitioning — never a wrong layout claim.
    */
  override def outputPartitioning()
      : org.apache.spark.sql.connector.read.partitioning.Partitioning = {
    val partCols = ManifestV2Sink.tablePartitionColumns(path)
    def unknown =
      new org.apache.spark.sql.connector.read.partitioning
        .UnknownPartitioning(0)
    if (partCols.isEmpty || !partCols.forall(req.fieldNames.contains))
      return unknown
    val entries = ManifestV2Sink.entriesFor(path, branch, asOfVersion)
      .filterNot(ManifestV2Sink.isDeleteEntry)
      .filter(ManifestSkipping.keepEntry(_, flt))
    if (entries.isEmpty) return unknown
    val keys = entries.map(e => ManifestV2Sink.entryPartition(e))
    if (!keys.forall(pv => partCols.forall(pv.contains))) return unknown
    val distinct = keys.map(pv => partCols.map(pv)).distinct.size
    new org.apache.spark.sql.connector.read.partitioning
      .KeyGroupedPartitioning(
        partCols.map(c => org.apache.spark.sql.connector.expressions
          .Expressions.identity(c)
          : org.apache.spark.sql.connector.expressions.Transform).toArray,
        distinct)
  }

  override def equals(other: Any): Boolean = other match {
    case o: ManifestScan => o.path == path && o.req == req &&
      o.flt == flt && o.branch == branch &&
      o.asOfVersion == asOfVersion && o.limit == limit &&
      o.topn == topn && o.cdf == cdf
    case _ => false
  }
  override def hashCode(): Int =
    (path, req, flt, branch, asOfVersion, limit, topn, cdf).hashCode()
  // runtime (DPP) join filters arrive per execution via filter();
  // they prune FILES only — never rows (the join re-applies its
  // own predicate), the same contract file-source DPP has with
  // partitions. Oversized In-sets are ignored (best-effort): an
  // O(files × values) driver loop must stay metadata-sized.
  private var runtimePrune: Seq[org.apache.spark.sql.sources.Filter] =
    Seq.empty
  override def readSchema(): StructType = req
  override def description(): String =
    s"graft-manifest($path${branch.map("@" + _).getOrElse("")}" +
      s"${asOfVersion.map("@v" + _).getOrElse("")}) " +
      s"PushedFilters: [${flt.mkString(", ")}], " +
      limit.map(k => s"PushedLimit: $k, ").getOrElse("") +
      topn.map { case (c, asc, k) =>
        s"PushedTopN: $c ${if (asc) "ASC" else "DESC"} LIMIT $k, "
      }.getOrElse("") +
      s"ReadSchema: ${req.catalogString}"
  override def toBatch: org.apache.spark.sql.connector.read.Batch = {
    if (cdf) throw new UnsupportedOperationException(
      "graft-manifest: batch change-feed reads go through SQL " +
        "graft_table_changes('t', v1, v2) or ManifestCdf.readChanges " +
        "— the readChangeFeed option is the STREAMING surface")
    new ManifestBatchScan(path, schema0, req, flt, branch,
      asOfVersion, () => runtimePrune, limit, topn)
  }

  /** EXACT post-pushdown statistics from the manifest alone: the
    * per-file (rows, bytes) recorded at publish (`R|` blobs),
    * summed over the entries a pushed-filter scan would actually
    * plan ([[ManifestSkipping.keepEntry]]). This is what lets
    * Catalyst auto-broadcast a small manifest dimension with no
    * hint — a DSv2 relation with no reported stats costs at the
    * conservative default and never broadcasts, which at 100 TB
    * turns every dimension join into a shuffle. Legacy entries
    * without an R| blob fall back to on-disk file size and leave
    * the row count unreported (size alone still drives the
    * broadcast decision). Tombstoned rows are not subtracted —
    * the numbers are upper bounds, conservative for costing.
    */
  override def estimateStatistics()
      : org.apache.spark.sql.connector.read.Statistics = {
    val entries = ManifestV2Sink.entriesFor(path, branch, asOfVersion)
      .filterNot(ManifestV2Sink.isDeleteEntry)
      .filter(ManifestSkipping.keepEntry(_, flt))
    val rb = entries.map(ManifestV2Sink.entryRowsBytes)
    val rowsKnown = rb.forall(_.isDefined)
    // deletion vectors subtract from the live row count
    val totalRows = entries.zip(rb).map {
      case (e, Some((r, _))) =>
        math.max(0L,
          r - ManifestV2Sink.entryDv(e).map(_._2).getOrElse(0L))
      case _ => 0L
    }.sum
    val totalBytes = entries.zip(rb).map {
      case (_, Some((_, b))) => b
      case (e, None) => scala.util.Try(Files.size(
        Paths.get(path, ManifestV2Sink.entryFile(e)))).getOrElse(0L)
    }.sum
    new org.apache.spark.sql.connector.read.Statistics {
      override def sizeInBytes(): util.OptionalLong =
        util.OptionalLong.of(totalBytes)
      override def numRows(): util.OptionalLong =
        if (rowsKnown) util.OptionalLong.of(totalRows)
        else util.OptionalLong.empty()
    }
  }

  /** Join-key columns eligible for runtime file pruning: those
    * with ANY skipping metadata (min/max stats or partition
    * values; Bloom-indexed columns are integral and always
    * stats-covered) on the scanned entry set. Declaring them
    * makes Spark's PartitionPruning rule plant a dynamic-pruning
    * subquery on fact-dim joins keyed by them — after the build
    * side runs, [[filter]] receives the surviving key set and the
    * re-plan reads only the files that can hold those keys (the
    * DSv2 analog of partition-directory DPP, the single biggest
    * read saver in a 100 TB star join).
    */
  override def filterAttributes(): Array[
      org.apache.spark.sql.connector.expressions.NamedReference] = {
    val entries = ManifestV2Sink.entriesFor(path, branch, asOfVersion)
      .filterNot(ManifestV2Sink.isDeleteEntry)
    val metaCols = entries.iterator.flatMap(e =>
      ManifestV2Sink.entryStats(e).keysIterator ++
        ManifestV2Sink.entryPartition(e).keysIterator).toSet
    req.fieldNames.filter(metaCols.contains).map(c =>
      org.apache.spark.sql.connector.expressions.Expressions.column(c))
  }

  override def filter(
      fs: Array[org.apache.spark.sql.sources.Filter]): Unit =
    runtimePrune = fs.toSeq.filter {
      case org.apache.spark.sql.sources.In(_, vs) => vs.length <= 10000
      case _ => true
    }
  override def toMicroBatchStream(
      checkpointLocation: String): MicroBatchStream = {
    branch.foreach { b =>
      throw new UnsupportedOperationException(
        s"graft-manifest streams follow MAIN; cannot stream branch " +
          s"'$b' — read it as a batch instead")
    }
    asOfVersion.foreach { v =>
      throw new UnsupportedOperationException(
        s"graft-manifest streams follow the LIVE head; cannot " +
          s"stream the frozen snapshot v$v")
    }
    new ManifestMicroBatchStream(path, schema0, req, flt,
      maxFilesPerTrigger, cdf)
  }
}
