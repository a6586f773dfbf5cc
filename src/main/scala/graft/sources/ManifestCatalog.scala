package graft.sources

import java.nio.file.{Files, Path, Paths}
import java.util

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.analysis.{NoSuchTableException, TableAlreadyExistsException}
import org.apache.spark.sql.connector.catalog.{Column, Identifier, Table, TableCatalog, TableChange}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.types.{StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** SQL-surface integration for the manifest sink: a Spark
  * `TableCatalog` so graft-manifest tables are first-class SQL
  * citizens — `CREATE TABLE graft.t (...)`, `INSERT INTO graft.t
  * SELECT ...`, `SELECT ... FROM graft.t`, `ALTER TABLE graft.t ADD
  * COLUMN ...`, `DROP TABLE graft.t` — no DataFrame API required.
  * Registered in [[graft.core.GraftSession]] as catalog `graft`
  * (`spark.sql.catalog.graft`); the Iceberg/Delta catalog-plugin
  * shape in miniature.
  *
  * Layout: each identifier maps to `<root>/<namespace...>/<name>`, a
  * plain manifest-sink table directory — every transactional property
  * (atomic commits, snapshots, time travel, branches, MOR deletes,
  * schema evolution) applies unchanged, because the catalog is ONLY a
  * name→directory resolver plus DDL:
  *  - CREATE TABLE publishes an empty v1 manifest carrying the schema
  *    (a metadata-only commit);
  *  - ALTER TABLE ADD COLUMN republishes the head with the merged
  *    schema under the commit lock — the add-column evolution path,
  *    now reachable from SQL; every other change is rejected;
  *  - DROP TABLE removes the directory (no trash — retention beyond
  *    the snapshot store is the caller's policy, documented).
  * Reads serve through the DSv2 batch scan ([[ManifestBatchScan]]),
  * writes through the normal manifest commit protocol, so SQL and
  * DataFrame users see the same table.
  */
class ManifestCatalog extends TableCatalog
    with org.apache.spark.sql.connector.catalog.ProcedureCatalog {

  private var catalogName: String = _
  private var root: String = _

  override def initialize(name: String,
      options: CaseInsensitiveStringMap): Unit = {
    catalogName = name
    root = Option(options.get("root")).getOrElse(
      s"${sys.props("java.io.tmpdir")}/graft-catalog")
    ()
  }

  override def name(): String = catalogName

  /** Fail a DDL statement AT THE STATEMENT when it names a type the
    * parquet payload cannot hold — otherwise `CREATE TABLE t (m
    * MAP<...>)` succeeds and the failure surfaces later as a writer
    * require on INSERT, far from the DDL that caused it. The
    * supported set is [[ParquetPayload.supportedType]]: BIGINT/INT/
    * DOUBLE/BOOLEAN/STRING plus DATE/TIMESTAMP/DECIMAL(p,s) — the
    * columns TPC-H `orders` needs land natively.
    */
  private def requirePrimitive(col: String,
      dt: org.apache.spark.sql.types.DataType): Unit =
    if (!ParquetPayload.supportedType(dt))
      throw new UnsupportedOperationException(
        s"graft catalog column '$col': unsupported type " +
          s"${dt.simpleString} — tables hold BIGINT/INT/DOUBLE/" +
          "BOOLEAN/STRING/DATE/TIMESTAMP/DECIMAL(p,s) only")

  private def dirOf(ident: Identifier): Path = {
    val parts = (ident.namespace() :+ ident.name()).toSeq
    require(parts.forall(_.matches("[A-Za-z0-9_]+")),
      s"graft catalog identifiers are [A-Za-z0-9_]+ parts, got $ident")
    Paths.get(root, parts: _*)
  }

  private def exists(ident: Identifier): Boolean =
    ManifestV2Sink.hasCommitted(dirOf(ident).toString)

  override def tableExists(ident: Identifier): Boolean = exists(ident)

  override def listTables(namespace: Array[String]): Array[Identifier] = {
    val dir = Paths.get(root, namespace.toSeq: _*)
    if (!Files.isDirectory(dir)) Array.empty
    else {
      val s = Files.list(dir)
      try s.iterator().asScala
        .filter(p => Files.exists(p.resolve("_MANIFEST")))
        .map(p => Identifier.of(namespace, p.getFileName.toString))
        .toArray
      finally s.close()
    }
  }

  override def loadTable(ident: Identifier): Table = {
    val dir = dirOf(ident).toString
    ManifestV2Sink.readManifest(dir).map(_._1) match {
      case Some(schema) => new ManifestTable(schema, dir)
      case None => metadataTable(ident).getOrElse(
        throw new NoSuchTableException(
          (ident.namespace() :+ ident.name()).toSeq))
    }
  }

  /** `graft.<t>.files` / `.snapshots` / `.txns` — the manifest's own
    * bookkeeping as SQL tables ([[ManifestMetaTables]]); resolved
    * only when `<t>` is a real table and the name is a known
    * metadata suffix, so plain missing tables still fail loudly.
    */
  private def metadataTable(ident: Identifier): Option[Table] = {
    if (ident.namespace().isEmpty) return None
    val base = Identifier.of(ident.namespace().init,
      ident.namespace().last)
    if (!exists(base)) return None
    val dir = dirOf(base).toString
    val label = s"graft.${base.name()}.${ident.name()}"
    ident.name() match {
      case "files" => Some(new ManifestMetaTable(label,
        ManifestMetaTables.FilesSchema,
        () => ManifestMetaTables.filesRows(dir)))
      case "snapshots" => Some(new ManifestMetaTable(label,
        ManifestMetaTables.SnapshotsSchema,
        () => ManifestMetaTables.snapshotsRows(dir)))
      case "txns" => Some(new ManifestMetaTable(label,
        ManifestMetaTables.TxnsSchema,
        () => ManifestMetaTables.txnsRows(dir)))
      case "manifests" => Some(new ManifestMetaTable(label,
        ManifestMetaTables.ManifestsSchema,
        () => ManifestMetaTables.manifestsRows(dir)))
      case "refs" => Some(new ManifestMetaTable(label,
        ManifestMetaTables.RefsSchema,
        () => ManifestMetaTables.refsRows(dir)))
      case _ => None
    }
  }

  /** SQL time travel — `SELECT ... FROM graft.t VERSION AS OF 3`:
    * a read-only table pinned at snapshot `v`, serving the SNAPSHOT's
    * schema (it may predate an add-column evolution) and its entry
    * list (tombstones as of `v` reconcile, later deletes don't).
    * Retention holes fail the query, never read as "empty at v".
    */
  override def loadTable(ident: Identifier, version: String): Table = {
    val dir = dirOf(ident).toString
    if (!exists(ident))
      throw new NoSuchTableException(
        (ident.namespace() :+ ident.name()).toSeq)
    // a non-numeric version resolves as a TAG name (immutable ref)
    val v = scala.util.Try(version.trim.toInt).getOrElse {
      ManifestV2Sink.tags(dir).toMap.getOrElse(version.trim,
        throw new IllegalArgumentException(
          s"graft VERSION AS OF takes a snapshot number or tag name, " +
            s"got '$version' (tags: ${ManifestV2Sink.tags(dir)
              .map(_._1).mkString(",")})"))
    }
    val schema = ManifestV2Sink
      .parseManifest(ManifestV2Sink.versionFile(dir, v)).map(_._1)
      .getOrElse(throw new IllegalArgumentException(
        s"no snapshot v$v of graft table $ident " +
          s"(have: ${ManifestV2Sink.versions(dir).mkString(",")})"))
    new ManifestTable(schema, dir, None, Some(v))
  }

  /** `TIMESTAMP AS OF t` (Spark hands micros): the NEWEST retained
    * snapshot published at-or-before `t`. Resolution reads the commit
    * wall-clock RECORDED inside the table's append-only commit log at
    * publish time ([[ManifestV2Sink.publishTimeMillis]]) — snapshot
    * mtimes shift under directory copies/backup restores and are
    * coarse-grained on some filesystems, so they are only the
    * fallback for versions published before the log existed.
    */
  override def loadTable(ident: Identifier, timestamp: Long): Table = {
    val dir = dirOf(ident).toString
    if (!exists(ident))
      throw new NoSuchTableException(
        (ident.namespace() :+ ident.name()).toSeq)
    val tsMillis = timestamp / 1000L
    // load the append-only commit log ONCE for the whole version scan
    val times = ManifestV2Sink.commitTimes(dir)
    val v = ManifestV2Sink.versions(dir).reverse.find { v =>
      ManifestV2Sink.publishTimeMillis(dir, v, times) <= tsMillis
    }.getOrElse(throw new IllegalArgumentException(
      s"no snapshot of graft table $ident at or before " +
        s"timestamp $tsMillis ms — the oldest retained snapshot is newer"))
    loadTable(ident, v.toString)
  }

  override def createTable(ident: Identifier, schema: StructType,
      partitions: Array[Transform],
      properties: util.Map[String, String]): Table = {
    // PARTITIONED BY (col, ...): identity transforms only — the
    // Hive/Iceberg identity-partition subset. The spec persists in a
    // sidecar next to the manifest, every write fans out one file per
    // partition tuple, and each file's manifest entry records its
    // values (the metadata the partition-pruned reads consult).
    val partCols = partitions.toSeq.map { t =>
      if (t.name == "identity" && t.references.length == 1 &&
        t.references.head.fieldNames.length == 1)
        t.references.head.fieldNames.head
      else throw new UnsupportedOperationException(
        s"graft catalog supports PARTITIONED BY identity columns only, " +
          s"got $t")
    }
    partCols.foreach { c =>
      require(schema.fieldNames.contains(c) && c.matches("[A-Za-z0-9_]+"),
        s"partition column $c must be a declared column")
      require(schema(c).dataType match {
        case org.apache.spark.sql.types.LongType |
             org.apache.spark.sql.types.IntegerType |
             org.apache.spark.sql.types.StringType |
             org.apache.spark.sql.types.BooleanType |
             org.apache.spark.sql.types.DateType => true
        case _ => false
      }, s"partition column $c must be long/int/string/boolean/date " +
        "(never double: binary float rendering is a partition-identity " +
        "footgun every real format also rejects)")
    }
    schema.fields.foreach(f => requirePrimitive(f.name, f.dataType))
    if (exists(ident))
      throw new TableAlreadyExistsException(
        (ident.namespace() :+ ident.name()).toSeq)
    val dir = dirOf(ident)
    Files.createDirectories(dir)
    if (partCols.nonEmpty)
      Files.write(dir.resolve("_MANIFEST.partcols"),
        (partCols.mkString("\n") + "\n").getBytes("UTF-8"))
    // an empty v1 manifest carrying the schema — the same publish
    // protocol every commit uses, so CREATE is itself a snapshot
    ManifestV2Sink.withHeadLock(dir.toString) {
      ManifestV2Sink.publish(dir.toString, schema, Seq.empty,
        s"create-${java.util.UUID.randomUUID().toString.take(8)}")
    }
    new ManifestTable(schema, dir.toString)
  }

  // version-proof bridge: build the StructType ourselves instead of
  // relying on the deprecated-default delegation
  override def createTable(ident: Identifier, columns: Array[Column],
      partitions: Array[Transform],
      properties: util.Map[String, String]): Table =
    createTable(ident,
      StructType(columns.map(c =>
        StructField(c.name(), c.dataType(), c.nullable()))),
      partitions, properties)

  override def alterTable(ident: Identifier,
      changes: TableChange*): Table = {
    val dir = dirOf(ident).toString
    ManifestV2Sink.commitLock(dir).synchronized {
      ManifestV2Sink.withHeadLock(dir) {
        val (cur, entries) = ManifestV2Sink.readManifest(dir)
          .getOrElse(throw new NoSuchTableException(
            (ident.namespace() :+ ident.name()).toSeq))
        // ALTER TABLE semantics ride the COLUMN-IDENTITY ledger
        // ([[ManifestV2Sink.loadColIds]]): data files keep write-time
        // names forever, so RENAME appends a name to the column's id
        // history (readers resolve old files through the past names)
        // and DROP tombstones the id. Names that EVER belonged to a
        // column (renamed-away or dropped) are retired — re-binding
        // them would silently resurrect old files' data under a new
        // column, so ADD/RENAME onto a retired name is refused loudly
        // (Iceberg avoids this with in-file field ids; the miniature
        // refuses instead of mapping).
        val next = changes.foldLeft(cur) { (s, ch) =>
          ch match {
            case add: TableChange.AddColumn =>
              require(add.fieldNames().length == 1,
                "graft catalog supports top-level ADD COLUMN only")
              val n = add.fieldNames()(0)
              require(!s.fieldNames.contains(n), s"column $n exists")
              require(!ManifestV2Sink.retiredColumnNames(dir).contains(n),
                s"column name $n was renamed away or dropped — old " +
                  "files still carry it; re-binding it would resurrect " +
                  "their data (pick a fresh name)")
              requirePrimitive(n, add.dataType())
              val ids = ManifestV2Sink.loadColIds(dir)
              val nextId = ids.map(_._1).maxOption.getOrElse(-1) + 1
              ManifestV2Sink.saveColIds(dir,
                ids :+ ((nextId, true, Seq(n))))
              StructType(s.fields :+
                StructField(n, add.dataType(), nullable = true))
            case rn: TableChange.RenameColumn =>
              require(rn.fieldNames().length == 1,
                "graft catalog supports top-level RENAME COLUMN only")
              val from = rn.fieldNames()(0)
              val to = rn.newName()
              require(s.fieldNames.contains(from), s"no column $from")
              require(!s.fieldNames.contains(to), s"column $to exists")
              require(
                !ManifestV2Sink.retiredColumnNames(dir).contains(to),
                s"column name $to was renamed away or dropped — old " +
                  "files still carry it; re-binding it would resurrect " +
                  "their data (pick a fresh name)")
              // ledger first (crash-safe direction: an alias for a
              // rename that never committed is an unused fallback)
              val ids = ManifestV2Sink.loadColIds(dir)
              ManifestV2Sink.saveColIds(dir, ids.map {
                case (id, true, names) if names.last == from =>
                  (id, true, names :+ to)
                case other => other
              })
              // a renamed partition column renames its DDL sidecar too
              val parts = ManifestV2Sink.tablePartitionColumns(dir)
              if (parts.contains(from))
                ManifestV2Sink.savePartitionColumns(dir,
                  parts.map(c => if (c == from) to else c))
              StructType(s.fields.map(f =>
                if (f.name == from) f.copy(name = to) else f))
            case del: TableChange.DeleteColumn =>
              require(del.fieldNames().length == 1,
                "graft catalog supports top-level DROP COLUMN only")
              val n = del.fieldNames()(0)
              require(s.fieldNames.contains(n), s"no column $n")
              require(s.fields.length > 1,
                "cannot drop the table's last column")
              require(
                !ManifestV2Sink.tablePartitionColumns(dir).contains(n),
                s"cannot drop partition column $n")
              require(!entries.exists(ManifestV2Sink.isDeleteEntry),
                "DROP COLUMN over merge-on-read tombstones " +
                  "unsupported — compact first")
              val ids = ManifestV2Sink.loadColIds(dir)
              ManifestV2Sink.saveColIds(dir, ids.map {
                case (id, true, names) if names.last == n =>
                  (id, false, names)
                case other => other
              })
              StructType(s.fields.filterNot(_.name == n))
            case up: TableChange.UpdateColumnType =>
              require(up.fieldNames().length == 1,
                "graft catalog supports top-level ALTER COLUMN only")
              val n = up.fieldNames()(0)
              require(s.fieldNames.contains(n), s"no column $n")
              val from = s(n).dataType
              val to = up.newDataType()
              requirePrimitive(n, to)
              require(
                !ManifestV2Sink.tablePartitionColumns(dir).contains(n),
                s"cannot change the type of partition column $n — " +
                  "partition values are rendered identity")
              import org.apache.spark.sql.types._
              // WIDENING only: every old value must be exactly
              // representable in the new type (Delta/Iceberg's type
              // evolution rule). Anything else — narrowing, cross-
              // family — is refused loudly, never a silent null-out.
              val widens = (from, to) match {
                case (IntegerType, LongType) => true
                case (FloatType, DoubleType) => true
                case (a: DecimalType, b: DecimalType) =>
                  b.scale == a.scale && b.precision > a.precision
                case _ => false
              }
              require(widens,
                s"ALTER COLUMN $n TYPE: ${from.simpleString} -> " +
                  s"${to.simpleString} is not a widening " +
                  "(supported: int->bigint, float->double, " +
                  "decimal(p,s)->decimal(p2>p,s))")
              // sidecar first (crash-safe direction: a recorded widen
              // whose schema commit never landed only over-suppresses
              // parquet filters — IO, not correctness)
              ManifestV2Sink.recordWidened(dir, n)
              StructType(s.fields.map(f =>
                if (f.name == n) f.copy(dataType = to) else f))
            case other => throw new UnsupportedOperationException(
              s"graft catalog supports ADD/RENAME/DROP COLUMN and " +
                s"widening ALTER COLUMN TYPE, got $other")
          }
        }
        // metadata-only commit: same entries, widened schema
        ManifestV2Sink.publish(dir, next, entries,
          s"alter-${java.util.UUID.randomUUID().toString.take(8)}")
        new ManifestTable(next, dir)
      }
    }
  }

  override def dropTable(ident: Identifier): Boolean = {
    val dir = dirOf(ident)
    if (!Files.exists(dir)) false
    else {
      def rm(p: Path): Unit = {
        if (Files.isDirectory(p)) {
          val s = Files.list(p)
          try s.iterator().asScala.toList.foreach(rm) finally s.close()
        }
        Files.deleteIfExists(p)
        ()
      }
      rm(dir)
      true
    }
  }

  // ------------------------------------- maintenance procedures
  /** `CALL graft.system.<proc>(...)` — see [[ManifestProcedures]]. */
  override def loadProcedure(ident: Identifier)
      : org.apache.spark.sql.connector.catalog.procedures
        .UnboundProcedure = {
    require(ident.namespace().sameElements(Array("system")),
      s"graft procedures live in the `system` namespace, got $ident")
    val dirOfName: String => String = { n =>
      val id = Identifier.of(Array.empty[String], n)
      if (!exists(id)) throw new NoSuchTableException(Seq(n))
      dirOf(id).toString
    }
    ident.name() match {
      case "compact" => ManifestProcedures.compact(dirOfName)
      case "binpack" => ManifestProcedures.binpack(dirOfName)
      case "zorder" => ManifestProcedures.zorder(dirOfName)
      case "expire_snapshots" =>
        ManifestProcedures.expireSnapshots(dirOfName)
      case "vacuum" => ManifestProcedures.vacuum(dirOfName)
      case "set_partition_spec" =>
        ManifestProcedures.setPartitionSpec(dirOfName)
      case "rewrite_manifests" =>
        ManifestProcedures.rewriteManifests(dirOfName)
      case "tag" => ManifestProcedures.tag(dirOfName)
      case "drop_tag" => ManifestProcedures.dropTag(dirOfName)
      case other => throw new UnsupportedOperationException(
        s"no graft procedure $other (have: compact, binpack, " +
          "zorder, expire_snapshots, vacuum, set_partition_spec, " +
          "rewrite_manifests, tag, drop_tag)")
    }
  }

  override def listProcedures(
      namespace: Array[String]): Array[Identifier] =
    if (namespace.isEmpty || namespace.sameElements(Array("system")))
      Array("compact", "binpack", "zorder", "expire_snapshots",
        "vacuum", "set_partition_spec", "rewrite_manifests",
        "tag", "drop_tag")
        .map(Identifier.of(Array("system"), _))
    else Array.empty

  override def renameTable(oldIdent: Identifier,
      newIdent: Identifier): Unit = {
    if (!exists(oldIdent))
      throw new NoSuchTableException(
        (oldIdent.namespace() :+ oldIdent.name()).toSeq)
    if (exists(newIdent))
      throw new TableAlreadyExistsException(
        (newIdent.namespace() :+ newIdent.name()).toSeq)
    Files.createDirectories(dirOf(newIdent).getParent)
    Files.move(dirOf(oldIdent), dirOf(newIdent))
    ()
  }
}
