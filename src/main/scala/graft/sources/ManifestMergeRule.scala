package graft.sources

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Alias, And, AttributeReference, CaseWhen, Cast, EqualTo, Expression, GreaterThan, If, In, IsNull, Literal, MonotonicallyIncreasingID, NamedExpression, Not}
import org.apache.spark.sql.catalyst.expressions.aggregate.Count
import org.apache.spark.sql.catalyst.plans.QueryPlan
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Assignment, DeleteAction, Filter, InsertAction, Join, JoinHint, LogicalPlan, MergeIntoTable, Project, Union, UpdateAction, UpdateTable}
import org.apache.spark.sql.catalyst.plans.{Inner, LeftAnti, LeftOuter, LeftSemi}
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
  * supported grammar (the general CDC-apply rewrite covers
  * conditional actions, DELETE actions, partial SET lists, and NOT
  * MATCHED BY SOURCE — the full ANSI MERGE action surface).
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

  /** SQL `UPDATE graft.t SET c = expr [WHERE pred]`: a copy-on-write
    * rewrite, STATS-NARROWED when the metadata allows — the
    * [[ManifestV2Sink.upsertNarrow]] treatment the r12 scaladoc
    * admitted was unbuilt. The WHERE predicate translates to source
    * filters and plans against the manifest's per-file stats
    * ([[ManifestSkipping.keepEntry]]): files provably disjoint from
    * the predicate CARRY OVER as raw entries (zero bytes read), and
    * only intersecting files rewrite through `IF(pred, value, old)`
    * per assigned column — so a targeted update of one day's rows in
    * a 100-TB time-clustered table rewrites one file, not the table.
    * Untranslatable predicates and tombstoned heads degrade to the
    * honest whole-table COW. Either way it is ONE atomic commit
    * (readers see pre- or post-update, never a mix; the pre-update
    * snapshot stays time-travelable). Deterministic row-local
    * expressions only — subqueries in SET/WHERE are not row-local and
    * are refused.
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
    val projectList: Seq[NamedExpression] =
      u.table.output.map { attr =>
        assigned.get(attr.exprId) match {
          case Some(v) =>
            Alias(If(cond, v, attr), attr.name)(): NamedExpression
          case None => attr: NamedExpression
        }
      }
    GraftUpdateCommand(table.dir, Project(projectList, u.table), cond)
  }

  private def unsupported(why: String): Nothing =
    throw new UnsupportedOperationException(
      s"graft MERGE INTO supports the canonical upsert (ON t.k = s.k, " +
        "WHEN MATCHED THEN UPDATE SET *, WHEN NOT MATCHED THEN INSERT " +
        "*) and the general CDC-apply shape (conditional WHEN MATCHED " +
        "UPDATE/DELETE actions, partial SET lists, conditional WHEN " +
        "NOT MATCHED INSERTs, WHEN NOT MATCHED BY SOURCE " +
        s"UPDATE/DELETE) ($why)")

  /** Two tiers: the CANONICAL upsert shape routes to the
    * stats-narrowed [[ManifestV2Sink.upsertNarrow]] fast path
    * (rewrites only files whose key ranges intersect the updates);
    * everything else in the CDC-apply grammar — `WHEN MATCHED [AND
    * cond] THEN UPDATE SET a = ..., b = ...` (partial lists fine),
    * `WHEN MATCHED [AND cond] THEN DELETE`, multiple ordered matched
    * actions (first whose condition holds wins, ANSI semantics),
    * `WHEN NOT MATCHED [AND cond] THEN INSERT`, and `WHEN NOT MATCHED
    * BY SOURCE [AND cond] THEN UPDATE/DELETE` (the table-sync idiom:
    * target rows with no source match update or retire) — compiles to
    * one whole-table copy-on-write commit
    * ([[GraftMergeGenericCommand]]). Schema evolution stays refused
    * at analysis.
    */
  private def rewrite(m: MergeIntoTable,
      target: DataSourceV2Relation): LogicalPlan = {
    if (m.withSchemaEvolution)
      unsupported("WITH SCHEMA EVOLUTION not supported")
    canonical(m, target).getOrElse(rewriteGeneric(m, target))
  }

  /** The canonical-upsert detector: Some(fast-path command) when the
    * MERGE is exactly `ON t.k = s.k, WHEN MATCHED THEN UPDATE SET *,
    * WHEN NOT MATCHED THEN INSERT *` with UPDATE ≡ INSERT values —
    * None (fall through to the general rewrite) otherwise.
    */
  private def canonical(m: MergeIntoTable,
      target: DataSourceV2Relation): Option[LogicalPlan] = {
    if (m.notMatchedBySourceActions.nonEmpty) return None
    val table = target.table.asInstanceOf[ManifestTable]
    val targetOut = m.targetTable.outputSet
    val sourceOut = m.sourceTable.outputSet
    // the analyzer wraps type-widening Casts around source columns
    // (VALUES literals arrive as INT against BIGINT targets) — the
    // column identity is underneath
    def stripCast(e: Expression): Expression = e match {
      case Cast(c, _, _, _) => stripCast(c)
      case other => other
    }
    // the upsert key: one target=source equality on a shared name
    val keyOpt: Option[String] = (m.mergeCondition match {
      case EqualTo(a, b) => Some((stripCast(a), stripCast(b)))
      case _ => None
    }) flatMap {
      case (a: AttributeReference, b: AttributeReference) =>
        val pair =
          if (targetOut.contains(a) && sourceOut.contains(b)) Some((a, b))
          else if (targetOut.contains(b) && sourceOut.contains(a))
            Some((b, a))
          else None
        pair.collect { case (t, s) if t.name == s.name => t.name }
      case _ => None
    }
    // full-column assignments, target := same-named source expression
    def fullAssignments(as: Seq[Assignment])
        : Option[Map[String, Expression]] = {
      val byName = as.flatMap { a =>
        a.key match {
          case t: AttributeReference if targetOut.contains(t) =>
            Some(t.name -> a.value)
          case _ => None
        }
      }.toMap
      if (byName.size == as.size &&
        byName.keySet == m.targetTable.output.map(_.name).toSet)
        Some(byName)
      else None
    }
    for {
      key <- keyOpt
      upd <- m.matchedActions match {
        case Seq(UpdateAction(None, as, _)) => fullAssignments(as)
        case _ => None
      }
      ins <- m.notMatchedActions match {
        case Seq(InsertAction(None, as)) => fullAssignments(as)
        case _ => None
      }
      // UPDATE and INSERT must write the same rows, or routing both
      // through one upsert would silently pick one of two semantics
      if m.targetTable.output.map(_.name)
        .forall(n => upd(n).semanticEquals(ins(n)))
    } yield {
      val projected = Project(
        m.targetTable.output.map(t =>
          Alias(ins(t.name), t.name)(): NamedExpression),
        m.sourceTable)
      GraftMergeCommand(table.dir, key, projected)
    }
  }

  /** The general CDC-apply rewrite — ANSI MERGE semantics compiled to
    * plain relational algebra over the resolved plans:
    *  - SURVIVORS: target LEFT OUTER source on the merge condition; a
    *    per-row action ordinal picks the FIRST matched action whose
    *    condition holds (null = no action → row unchanged); DELETE
    *    ordinals filter out, UPDATE ordinals project `CASE action`
    *    per column (partial SET lists leave other columns alone);
    *  - INSERTS: source LEFT ANTI target on the merge condition, the
    *    first insert action whose condition holds supplies the
    *    values; rows matching no insert action drop (ANSI).
    * The union publishes as ONE atomic overwrite commit — readers see
    * pre- or post-merge, never a mix, and the pre-merge snapshot
    * stays time-travelable. Conditions and values must be row-local
    * (no subqueries), same rule as UPDATE.
    */
  private def rewriteGeneric(m: MergeIntoTable,
      target: DataSourceV2Relation): LogicalPlan = {
    val table = target.table.asInstanceOf[ManifestTable]
    def rowLocal(e: Expression): Unit =
      if (e.exists(_.isInstanceOf[
          org.apache.spark.sql.catalyst.expressions.PlanExpression[_]]))
        unsupported("conditions and values must be row-local " +
          "(no subqueries)")
    rowLocal(m.mergeCondition)
    val tOut = m.targetTable.output

    def castTo(e: Expression,
        attr: org.apache.spark.sql.catalyst.expressions.Attribute)
        : Expression =
      if (e.dataType == attr.dataType) e else Cast(e, attr.dataType)

    // matched actions in declaration order: Some(assignments) =
    // UPDATE (possibly partial), None = DELETE
    val matched: Seq[(Option[Expression], Option[Map[String, Expression]])] =
      m.matchedActions.map {
        case UpdateAction(cond, as, _) =>
          cond.foreach(rowLocal)
          val byName = as.map { a =>
            a.key match {
              case t: AttributeReference =>
                rowLocal(a.value); t.name -> a.value
              case other =>
                unsupported(s"assignment to non-column $other")
            }
          }.toMap
          (cond, Some(byName))
        case DeleteAction(cond) =>
          cond.foreach(rowLocal)
          (cond, None)
        case other => unsupported(s"unsupported matched action $other")
      }
    val inserts: Seq[(Option[Expression], Map[String, Expression])] =
      m.notMatchedActions.map {
        case InsertAction(cond, as) =>
          cond.foreach(rowLocal)
          val byName = as.map { a =>
            a.key match {
              case t: AttributeReference =>
                rowLocal(a.value); t.name -> a.value
              case other =>
                unsupported(s"assignment to non-column $other")
            }
          }.toMap
          (cond, byName)
        case other => unsupported(s"unsupported not-matched action $other")
      }
    // NOT MATCHED BY SOURCE actions (target rows with NO source match):
    // UPDATE (possibly partial) or DELETE, same encoding as `matched`
    val bySource
        : Seq[(Option[Expression], Option[Map[String, Expression]])] =
      m.notMatchedBySourceActions.map {
        case UpdateAction(cond, as, _) =>
          cond.foreach(rowLocal)
          val byName = as.map { a =>
            a.key match {
              case t: AttributeReference =>
                rowLocal(a.value); t.name -> a.value
              case other =>
                unsupported(s"assignment to non-column $other")
            }
          }.toMap
          // BY SOURCE conditions/values may reference TARGET columns
          // only (there is no source row) — the analyzer enforces it
          (cond, Some(byName))
        case DeleteAction(cond) =>
          cond.foreach(rowLocal)
          (cond, None)
        case other =>
          unsupported(s"unsupported not-matched-by-source action $other")
      }

    // ---- survivors: target ⟕ source; ONE ordinal space covers the
    // matched actions (ordinals 0..m-1, gated on a source match) and
    // the NOT MATCHED BY SOURCE actions (ordinals m.., gated on NO
    // match) — first-true-wins within each family, ANSI semantics
    val survivors: LogicalPlan =
      if (matched.isEmpty && bySource.isEmpty)
        m.targetTable // insert-only MERGE
      else if (matched.isEmpty) {
        // BY-SOURCE-ONLY shape: no WHEN MATCHED actions, so matched
        // target rows pass through UNTOUCHED — and ANSI permits many
        // source matches per target row here. A LeftOuter join would
        // emit one copy per match; decompose instead: semi (matched,
        // verbatim, exactly once) ∪ anti (unmatched, actions applied).
        val semi = Join(m.targetTable, m.sourceTable, LeftSemi,
          Some(m.mergeCondition), JoinHint.NONE)
        val anti = Join(m.targetTable, m.sourceTable, LeftAnti,
          Some(m.mergeCondition), JoinHint.NONE)
        val actAlias = Alias(CaseWhen(
          bySource.zipWithIndex.map { case ((cond, _), i) =>
            (cond.getOrElse(Literal(true)): Expression,
              Literal(i): Expression)
          }, None), "__graft_act")()
        val withAct = Project(anti.output :+ actAlias, anti)
        val actRef = actAlias.toAttribute
        val deleteOrds = bySource.zipWithIndex.collect {
          case ((_, None), i) => Literal(i): Expression
        }
        val afterDeletes =
          if (deleteOrds.isEmpty) withAct
          else Filter(
            org.apache.spark.sql.catalyst.expressions.Or(
              IsNull(actRef), Not(In(actRef, deleteOrds))), withAct)
        val applied = Project(tOut.map { attr =>
          val branches = bySource.zipWithIndex.collect {
            case ((_, Some(as)), i) if as.contains(attr.name) =>
              (EqualTo(actRef, Literal(i)): Expression,
                castTo(as(attr.name), attr))
          }
          if (branches.isEmpty) attr: NamedExpression
          else Alias(CaseWhen(branches, attr), attr.name)()
            : NamedExpression
        }, afterDeletes)
        Union(Seq(semi, applied))
      } else {
        val mTag = Alias(Literal(true), "__graft_matched")()
        val srcTagged =
          Project(m.sourceTable.output :+ mTag, m.sourceTable)
        // cardinality guard: unless the source is PROVABLY unique on
        // the merge key, tag target rows with a unique id and let
        // [[MergeCardinalityGuard]] detect a twice-matched id from
        // inside this very join — no second join, no second job
        val needGuard = !ManifestMergeRule.sourceUniqueOnKey(
          m.mergeCondition, m.sourceTable, m.targetTable)
        val tid = Alias(MonotonicallyIncreasingID(), "__graft_tid")()
        val tBase =
          if (needGuard) Project(m.targetTable.output :+ tid,
            m.targetTable)
          else m.targetTable
        val joined0 = Join(tBase, srcTagged, LeftOuter,
          Some(m.mergeCondition), JoinHint.NONE)
        val matchedRef = mTag.toAttribute
        val joined =
          if (needGuard)
            Filter(Not(MergeCardinalityGuard(tid.toAttribute,
              matchedRef)), joined0)
          else joined0
        val allActs: Seq[(Expression,
            Option[Map[String, Expression]])] =
          matched.zipWithIndex.map { case ((cond, as), _) =>
            (And(matchedRef,
              cond.getOrElse(Literal(true)): Expression): Expression, as)
          } ++ bySource.map { case (cond, as) =>
            (And(IsNull(matchedRef),
              cond.getOrElse(Literal(true)): Expression): Expression, as)
          }
        val actAlias = Alias(CaseWhen(
          allActs.zipWithIndex.map { case ((gate, _), i) =>
            (gate, Literal(i): Expression)
          }, None), "__graft_act")()
        val withAct = Project(joined.output :+ actAlias, joined)
        val actRef = actAlias.toAttribute
        val deleteOrds = allActs.zipWithIndex.collect {
          case ((_, None), i) => Literal(i): Expression
        }
        val afterDeletes =
          if (deleteOrds.isEmpty) withAct
          else Filter(
            org.apache.spark.sql.catalyst.expressions.Or(
              IsNull(actRef), Not(In(actRef, deleteOrds))), withAct)
        Project(tOut.map { attr =>
          val branches = allActs.zipWithIndex.collect {
            case ((_, Some(as)), i) if as.contains(attr.name) =>
              (EqualTo(actRef, Literal(i)): Expression,
                castTo(as(attr.name), attr))
          }
          if (branches.isEmpty) attr: NamedExpression
          else Alias(CaseWhen(branches, attr), attr.name)()
            : NamedExpression
        }, afterDeletes)
      }

    // ---- inserts: source ⟔ target, first-true insert action
    val insertRows: Option[LogicalPlan] =
      if (inserts.isEmpty) None // matched-only MERGE (pure CDC delete)
      else {
        val anti = Join(m.sourceTable, m.targetTable, LeftAnti,
          Some(m.mergeCondition), JoinHint.NONE)
        val iAlias = Alias(CaseWhen(
          inserts.zipWithIndex.map { case ((cond, _), i) =>
            (cond.getOrElse(Literal(true)): Expression,
              Literal(i): Expression)
          }, None), "__graft_iact")()
        val withIAct = Project(anti.output :+ iAlias, anti)
        val iRef = iAlias.toAttribute
        Some(Project(tOut.map { attr =>
          Alias(CaseWhen(
            inserts.zipWithIndex.map { case ((_, as), i) =>
              (EqualTo(iRef, Literal(i)): Expression,
                as.get(attr.name).map(castTo(_, attr))
                  .getOrElse(Literal(null, attr.dataType)): Expression)
            }, None), attr.name)(): NamedExpression
        }, Filter(Not(IsNull(iRef)), withIAct)))
      }

    // ANSI cardinality guard: rides INSIDE the survivors join via
    // [[MergeCardinalityGuard]] (see the general branch above) —
    // no second join, no second job. Skipped when the source is
    // provably key-unique, and vacuous for insert-only /
    // by-source-only shapes (multi-match-legal per ANSI; their
    // rewrites never duplicate).
    GraftMergeGenericCommand(table.dir, insertRows match {
      case Some(ins) => Union(Seq(survivors, ins))
      case None => survivors
    })
  }
}

object ManifestMergeRule {
  import org.apache.spark.sql.catalyst.plans.logical.{Aggregate => LAggregate, Deduplicate, Distinct => LDistinct}

  /** True iff the MERGE source is PROVABLY unique on the single
    * equi-join key — one row per key by construction, so the
    * cardinality-violation check is vacuous and skipped:
    *  - an Aggregate grouping on (exactly or among) the key,
    *  - a `dropDuplicates(key)` (Deduplicate keyed on it) — NOTE a
    *    whole-row Distinct does NOT qualify (distinct (k, v) rows can
    *    still repeat k),
    * walked through Filters and key-preserving Projects (the key's
    * exprId must survive — an aliasing rebind gets a fresh id and
    * soundly fails the walk). The OTHER operand must be a TARGET
    * attribute: a condition like `ON s.a = s.b` touches no target
    * column, so source-side uniqueness on `a` says nothing about
    * matches-per-target-row — the guard must stay. Anything
    * unprovable keeps the check.
    */
  private[sources] def sourceUniqueOnKey(cond: Expression,
      source: LogicalPlan, target: LogicalPlan): Boolean = cond match {
    case EqualTo(x, y) =>
      val pair = Seq((x, y), (y, x)).collectFirst {
        case (k: AttributeReference, t: AttributeReference)
          if source.outputSet.contains(k) &&
            target.outputSet.contains(t) => k
      }
      pair.exists { k =>
        def walk(p: LogicalPlan): Boolean = p match {
          case Project(projList, child) =>
            projList.exists {
              case a: AttributeReference => a.exprId == k.exprId
              case _ => false
            } && walk(child)
          case Filter(_, child) => walk(child)
          // unique on k requires k be the ONLY grouping expression —
          // grouping on (k, other) is unique per PAIR, not per k
          case LAggregate(groupExprs, _, _, _) =>
            groupExprs.nonEmpty && groupExprs.forall {
              case a: AttributeReference => a.exprId == k.exprId
              case _ => false
            }
          case d: Deduplicate => d.keys.exists(_.exprId == k.exprId) &&
            d.keys.length == 1
          case LDistinct(child) =>
            // whole-row distinct is key-unique only for a 1-column row
            child.output.length == 1 &&
              child.output.head.exprId == k.exprId
          case _ => false
        }
        walk(source)
      }
    case _ => false
  }
}

/** The eager command the general CDC-apply MERGE rewrites to: the
  * post-merge table (survivors ∪ inserts, built by
  * [[ManifestMergeRule.rewriteGeneric]]) published as ONE atomic
  * overwrite commit under the table's commit locks. The target scan
  * inside the plan reads the pre-merge head lazily while the write
  * stages — the same read-under-lock discipline as every composite
  * commit here.
  */
case class GraftMergeGenericCommand(path: String,
    merged: LogicalPlan)
    extends LeafRunnableCommand {
  override def innerChildren: Seq[QueryPlan[_]] = Seq(merged)
  override def run(spark: SparkSession): Seq[Row] = {
    val df = org.apache.spark.sql.graftbridge.bridge.ofRows(spark, merged)
    ManifestV2Sink.commitLock(path).synchronized {
      ManifestV2Sink.withHeadLock(path) {
        // cardinality violations surface FROM THE REWRITE JOB itself
        // ([[MergeCardinalityGuard]] rides the survivors join) — the
        // transactional write aborts, nothing publishes
        df.write.format("graft-manifest")
          .options(ManifestV2Sink.layoutOptions(path))
          .mode("overwrite").save(path)
      }
    }
    Seq.empty
  }
}

/** IN-JOB MERGE cardinality detection — zero extra jobs, zero extra
  * joins: rides the survivors LeftOuter join as a never-true Filter
  * predicate and throws when one target row matches twice.
  *
  * WHY ADJACENCY SUFFICES: for a LeftOuter join Spark always streams
  * the LEFT (target) side — broadcast/shuffled-hash build the right,
  * sort-merge buffers right matches — so all N join copies of one
  * target row are emitted CONSECUTIVELY by one task. Detecting two
  * adjacent matched rows with the same `__graft_tid` therefore
  * catches every multi-match, with two longs of per-partition state
  * instead of the old second join + groupBy + count (which re-ran
  * the whole join — at 100 TB, twice the merge cost just to guard).
  * Nondeterministic on purpose: the optimizer neither folds,
  * combines (And would short-circuit past the state update), nor
  * pushes this predicate anywhere else in the plan.
  */
case class MergeCardinalityGuard(tid: Expression, matched: Expression)
    extends Expression
    with org.apache.spark.sql.catalyst.expressions.Nondeterministic
    with org.apache.spark.sql.catalyst.expressions.codegen
      .CodegenFallback {
  override def children: Seq[Expression] = Seq(tid, matched)
  override def nullable: Boolean = false
  override def dataType: org.apache.spark.sql.types.DataType =
    org.apache.spark.sql.types.BooleanType
  @transient private var prevSet = false
  @transient private var prev = 0L
  override protected def initializeInternal(partitionIndex: Int): Unit = {
    prevSet = false
    prev = 0L
  }
  override protected def evalInternal(
      input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    if (matched.eval(input) == true) {
      val t = tid.eval(input).asInstanceOf[Long]
      if (prevSet && prev == t)
        throw new UnsupportedOperationException(
          "graft MERGE cardinality violation: more than one source " +
            "row matched a single target row under the ON condition " +
            "with WHEN MATCHED actions present — the result would be " +
            "nondeterministic/duplicated (ANSI MERGE raises here; " +
            "dedupe the source on the merge keys first)")
      prev = t
      prevSet = true
    }
    false
  }
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(tid = newChildren(0), matched = newChildren(1))
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

/** The eager command SQL UPDATE rewrites to. Under the commit locks:
  * translate the WHERE to source filters, split the head's files into
  * UNTOUCHED (stats provably disjoint — carried over as raw manifest
  * entries, zero rows move) and TOUCHED (read back, projected through
  * the update's `IF(pred, value, old)` expressions rebound onto the
  * touched-files frame, rewritten via scratch → adopt), then ONE
  * atomic publish. Falls back to the whole-table COW overwrite when
  * the predicate is untranslatable, the head carries tombstones, or
  * nothing can be skipped.
  */
case class GraftUpdateCommand(path: String,
    projected: Project, cond: Expression) extends LeafRunnableCommand {
  override def innerChildren: Seq[QueryPlan[_]] = Seq(projected)
  override def run(spark: SparkSession): Seq[Row] = {
    ManifestV2Sink.commitLock(path).synchronized {
      ManifestV2Sink.withHeadLock(path) {
        val (schema, entries) = ManifestV2Sink.readManifest(path).getOrElse(
          throw new IllegalArgumentException(s"no manifest at $path"))
        val filters = org.apache.spark.sql.graftbridge.bridge
          .translateFilter(cond)
        val narrowable = filters.isDefined &&
          !entries.exists(ManifestV2Sink.isDeleteEntry)
        val (touched, untouched) =
          if (narrowable)
            entries.partition(
              ManifestSkipping.keepEntry(_, filters.toSeq))
          else (entries, Seq.empty[String])
        if (narrowable && untouched.nonEmpty) {
          // rebind the update projection onto the touched-files frame
          // (same columns by construction: readDataFiles serves the
          // committed schema the relation resolved against)
          // DV-aware: never resurrect deletion-vector-deleted rows
          val touchedDf = ManifestV2Sink.readDataEntries(spark, path,
            schema, touched)
          val child = touchedDf.queryExecution.analyzed
          val byName = child.output.map(a => a.name -> a).toMap
          val rebound = projected.projectList.map(_.transform {
            case a: AttributeReference if byName.contains(a.name) =>
              byName(a.name)
          }.asInstanceOf[NamedExpression])
          val frame = org.apache.spark.sql.graftbridge.bridge.ofRows(
            spark, Project(rebound, child))
          val scratch = java.nio.file.Paths.get(path,
            s"_rewrite-update-" +
              java.util.UUID.randomUUID().toString.take(8))
          try {
            // carry the table's partition/Bloom layout into the
            // rewritten files (and co-locate partition values per
            // task) so narrowed updates don't degrade future pruning
            val partCols = ManifestV2Sink.tablePartitionColumns(path)
            (if (partCols.nonEmpty)
               frame.repartition(math.max(touched.length, 1),
                 partCols.map(org.apache.spark.sql.functions.col): _*)
             else frame.repartition(math.max(touched.length, 1)))
              .write.format("graft-manifest")
              .options(ManifestV2Sink.layoutOptions(path))
              .mode("append").save(scratch.toString)
            val adopted =
              ManifestV2Sink.adoptScratchFiles(path, scratch.toString)
            ManifestV2Sink.publish(path, schema,
              untouched ++ adopted, "update-narrow")
          } finally ManifestV2Sink.deleteRecursively(scratch)
        } else {
          val df = org.apache.spark.sql.graftbridge.bridge.ofRows(
            spark, projected)
          // the whole-table COW keeps the table's Bloom layout too
          df.write.format("graft-manifest")
            .options(ManifestV2Sink.layoutOptions(path))
            .mode("overwrite").save(path)
        }
      }
    }
    Seq.empty
  }
}
