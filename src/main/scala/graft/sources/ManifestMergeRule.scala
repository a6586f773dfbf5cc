package graft.sources

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Alias, AttributeReference, EqualTo, Expression, If, Literal, NamedExpression}
import org.apache.spark.sql.catalyst.plans.QueryPlan
import org.apache.spark.sql.catalyst.plans.logical.{Assignment, InsertAction, LogicalPlan, MergeIntoTable, Project, UpdateAction, UpdateTable}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation
import org.apache.spark.sql.types.BooleanType

/** SQL `MERGE INTO` for manifest tables — the upsert the Scala API
  * already has ([[ManifestV2Sink.upsert]]/[[ManifestV2Sink.upsertNarrow]]),
  * now reachable from the SQL front door:
  *
  * {{{
  *   MERGE INTO graft.t USING updates u ON t.k = u.k
  *   WHEN MATCHED THEN UPDATE SET *
  *   WHEN NOT MATCHED THEN INSERT *
  * }}}
  *
  * Spark's own MERGE path needs `SupportsRowLevelOperations` — a
  * group-based rewrite framework whose generic copy-on-write plan
  * rewrites every affected group. The manifest sink already has the
  * BETTER primitive (the stats-narrowed COW upsert plans the rewrite
  * against per-file key ranges, so a targeted merge rewrites one file
  * of a 100-TB table, not the table), so this resolution rule routes
  * the canonical upsert MERGE shape straight to it instead of
  * implementing the generic framework beneath it:
  *  - ON is a single equality between a target and a source column of
  *    the same name (the upsert key);
  *  - exactly one unconditional `WHEN MATCHED THEN UPDATE SET *` and
  *    one unconditional `WHEN NOT MATCHED THEN INSERT *` (the analyzer
  *    has already expanded the stars into per-column assignments —
  *    hand-written full-column SET lists match too);
  *  - rows-to-merge = the source projected to the target's columns.
  * Any OTHER shape on a graft table fails loudly AT ANALYSIS with the
  * supported grammar (conditional actions, DELETE actions, partial
  * SET lists, and NOT MATCHED BY SOURCE are not silently mis-merged).
  *
  * Execution picks [[ManifestV2Sink.upsertNarrow]] when its
  * preconditions hold (integral key, no merge-on-read tombstones in
  * the head — the narrowing needs trustworthy per-file ranges) and
  * degrades to the whole-table COW [[ManifestV2Sink.upsert]] otherwise;
  * either way it is ONE atomic commit and the pre-merge snapshot stays
  * time-travelable.
  */
class ManifestMergeRule(spark: SparkSession) extends Rule[LogicalPlan] {

  private def graftTarget(plan: LogicalPlan): Option[DataSourceV2Relation] =
    plan.collectFirst {
      case r: DataSourceV2Relation if r.table.isInstanceOf[ManifestTable] => r
    }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.resolveOperators {
      case m: MergeIntoTable if m.resolved &&
          m.childrenResolved && graftTarget(m.targetTable).isDefined =>
        rewrite(m, graftTarget(m.targetTable).get)
      case u: UpdateTable if u.resolved &&
          u.childrenResolved && graftTarget(u.table).isDefined =>
        rewriteUpdate(u, graftTarget(u.table).get)
    }

  /** SQL `UPDATE graft.t SET c = expr [WHERE pred]`: a COW rewrite —
    * the post-update table is the target relation projected through
    * `IF(pred, value, old)` per assigned column, published as ONE
    * overwrite commit (readers see pre- or post-update, never a mix;
    * the pre-update snapshot stays time-travelable). Deterministic
    * row-local expressions only — subqueries in SET/WHERE are not
    * row-local and are refused. The whole-table rewrite is the honest
    * copy-on-write; a stats-narrowed variant would ride the same
    * metadata [[ManifestV2Sink.upsertNarrow]] plans against.
    */
  private def rewriteUpdate(u: UpdateTable,
      target: DataSourceV2Relation): LogicalPlan = {
    val table = target.table.asInstanceOf[ManifestTable]
    def rowLocal(e: Expression): Unit =
      if (e.exists(_.isInstanceOf[
          org.apache.spark.sql.catalyst.expressions.PlanExpression[_]]))
        throw new UnsupportedOperationException(
          "graft UPDATE supports row-local SET/WHERE expressions only " +
            "(no subqueries)")
    val cond = u.condition.getOrElse(Literal(true, BooleanType))
    rowLocal(cond)
    val assigned = u.assignments.map { a =>
      a.key match {
        case t: AttributeReference =>
          rowLocal(a.value)
          t.exprId -> a.value
        case other => throw new UnsupportedOperationException(
          s"graft UPDATE supports top-level column assignment, got $other")
      }
    }.toMap
    val projected = Project(
      u.table.output.map { attr =>
        assigned.get(attr.exprId) match {
          case Some(v) =>
            Alias(If(cond, v, attr), attr.name)(): NamedExpression
          case None => attr: NamedExpression
        }
      },
      u.table)
    GraftUpdateCommand(table.dir, projected)
  }

  private def unsupported(why: String): Nothing =
    throw new UnsupportedOperationException(
      s"graft MERGE INTO supports the canonical upsert only — " +
        s"ON t.k = s.k, WHEN MATCHED THEN UPDATE SET *, WHEN NOT " +
        s"MATCHED THEN INSERT * ($why)")

  private def rewrite(m: MergeIntoTable,
      target: DataSourceV2Relation): LogicalPlan = {
    val table = target.table.asInstanceOf[ManifestTable]
    if (m.notMatchedBySourceActions.nonEmpty)
      unsupported("NOT MATCHED BY SOURCE actions present")
    if (m.withSchemaEvolution)
      unsupported("WITH SCHEMA EVOLUTION not supported")
    val targetOut = m.targetTable.outputSet
    val sourceOut = m.sourceTable.outputSet
    // the analyzer wraps type-widening Casts around source columns
    // (VALUES literals arrive as INT against BIGINT targets) — the
    // column identity is underneath
    def stripCast(e: Expression): Expression = e match {
      case org.apache.spark.sql.catalyst.expressions.Cast(c, _, _, _) =>
        stripCast(c)
      case other => other
    }
    // the upsert key: one target=source equality on a shared name
    val key = (m.mergeCondition match {
      case EqualTo(a, b) => Some((stripCast(a), stripCast(b)))
      case _ => None
    }) match {
      case Some((a: AttributeReference, b: AttributeReference)) =>
        val (t, s) =
          if (targetOut.contains(a) && sourceOut.contains(b)) (a, b)
          else if (targetOut.contains(b) && sourceOut.contains(a)) (b, a)
          else unsupported("ON must compare a target column to a source column")
        if (t.name != s.name)
          unsupported(s"ON joins differently-named columns " +
            s"(${t.name} vs ${s.name}) — the upsert key is one shared name")
        t.name
      case _ => unsupported("ON must be a single equality")
    }
    // full-column assignments, target := same-named source expression
    def fullAssignments(as: Seq[Assignment]): Map[String, Expression] = {
      val byName = as.map { a =>
        a.key match {
          case t: AttributeReference if targetOut.contains(t) =>
            t.name -> a.value
          case other => unsupported(s"assignment to non-column $other")
        }
      }.toMap
      val targetNames = m.targetTable.output.map(_.name)
      if (byName.keySet != targetNames.toSet)
        unsupported(s"SET must cover every target column " +
          s"(missing: ${targetNames.filterNot(byName.contains).mkString(",")})")
      byName
    }
    val upd = m.matchedActions match {
      case Seq(UpdateAction(None, as, _)) => fullAssignments(as)
      case _ => unsupported(
        "need exactly one unconditional WHEN MATCHED THEN UPDATE")
    }
    val ins = m.notMatchedActions match {
      case Seq(InsertAction(None, as)) => fullAssignments(as)
      case _ => unsupported(
        "need exactly one unconditional WHEN NOT MATCHED THEN INSERT")
    }
    // UPDATE and INSERT must write the same rows, or routing both
    // through one upsert would silently pick one of two semantics
    m.targetTable.output.map(_.name).foreach { n =>
      if (!upd(n).semanticEquals(ins(n)))
        unsupported(s"UPDATE and INSERT assign column $n differently")
    }
    val projected = Project(
      m.targetTable.output.map(t =>
        Alias(ins(t.name), t.name)(): NamedExpression),
      m.sourceTable)
    GraftMergeCommand(table.dir, key, projected)
  }
}

/** The eager command the rule rewrites to: project the source to the
  * target's columns, then ONE atomic upsert commit (stats-narrowed
  * when the head's metadata supports it).
  */
case class GraftMergeCommand(path: String, key: String,
    projected: LogicalPlan) extends LeafRunnableCommand {
  override def innerChildren: Seq[QueryPlan[_]] = Seq(projected)
  override def run(spark: SparkSession): Seq[Row] = {
    val src = org.apache.spark.sql.graftbridge.bridge.ofRows(spark, projected)
    val (schema, _) = ManifestV2Sink.readManifest(path).getOrElse(
      throw new IllegalArgumentException(s"no manifest at $path"))
    val integralKey = schema(key).dataType match {
      case org.apache.spark.sql.types.LongType |
           org.apache.spark.sql.types.IntegerType => true
      case _ => false
    }
    if (integralKey && ManifestV2Sink.committedDeleteFileCount(path) == 0)
      ManifestV2Sink.upsertNarrow(spark, path, src, key)
    else
      ManifestV2Sink.upsert(spark, path, src, key)
    Seq.empty
  }
}

/** The eager command SQL UPDATE rewrites to: materialize the
  * post-update projection of the target (the DSv2 scan reads the
  * pre-update head lazily while the write stages — the same
  * read-under-lock discipline as [[ManifestV2Sink.upsert]]) and
  * publish it as one overwrite commit.
  */
case class GraftUpdateCommand(path: String,
    projected: LogicalPlan) extends LeafRunnableCommand {
  override def innerChildren: Seq[QueryPlan[_]] = Seq(projected)
  override def run(spark: SparkSession): Seq[Row] = {
    val df = org.apache.spark.sql.graftbridge.bridge.ofRows(spark, projected)
    ManifestV2Sink.commitLock(path).synchronized {
      ManifestV2Sink.withHeadLock(path) {
        df.write.format("graft-manifest").mode("overwrite").save(path)
      }
    }
    Seq.empty
  }
}
