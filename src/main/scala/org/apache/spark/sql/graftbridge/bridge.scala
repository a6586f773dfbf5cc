package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ↔ Expression bridge. Spark 4 made these conversions
  * `private[sql]` (`org.apache.spark.sql.classic.ExpressionUtils`), so
  * this one-file shim lives under the sql package solely to re-export
  * them for graft's native expressions. Nothing else in the project
  * reaches into Spark internals.
  */
object bridge {
  def toColumn(e: Expression): Column = ExpressionUtils.column(e)
  def toExpression(c: Column): Expression = ExpressionUtils.expression(c)

  /** `Dataset.ofRows` re-export for graft's MERGE command: turn the
    * analyzer-resolved source plan back into a DataFrame to feed the
    * sink's upsert (also `private[sql]` in Spark 4).
    */
  def ofRows(spark: org.apache.spark.sql.SparkSession,
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)
      : org.apache.spark.sql.DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)

  /** `internalCreateDataFrame` re-export (also `private[sql]`): turn
    * an RDD of InternalRows from graft's per-file readers into a
    * DataFrame — the deletion-vector-aware rewrite reads need row
    * positions only the per-file readers define.
    */
  def ofInternalRows(spark: org.apache.spark.sql.SparkSession,
      rdd: org.apache.spark.rdd.RDD[
        org.apache.spark.sql.catalyst.InternalRow],
      schema: org.apache.spark.sql.types.StructType)
      : org.apache.spark.sql.DataFrame =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .internalCreateDataFrame(rdd, schema)

  /** Catalyst predicate → data-source Filter, re-exported for the
    * stats-narrowed UPDATE's file planning (`protected[sql]` on
    * DataSourceStrategy in Spark 4).
    */
  def translateFilter(predicate: Expression)
      : Option[org.apache.spark.sql.sources.Filter] =
    org.apache.spark.sql.execution.datasources.DataSourceStrategy
      .translateFilter(predicate, supportNestedPredicatePushdown = true)

  /** Hash-partitioned local checkpoint that KEEPS its partitioning.
    *
    * `Dataset.localCheckpoint` under AQE wraps the checkpointed RDD in
    * a LogicalRDD with `UnknownPartitioning` (the adaptive plan's
    * partitioning is not trusted at construction time), so every
    * downstream join/aggregation keyed the same way re-shuffles a
    * frame that is ALREADY correctly distributed — in an iterative
    * fixpoint (connected components, NN-Descent) that is one avoidable
    * full shuffle of the iterated frame PER ROUND. This helper
    * repartitions by `keys` into exactly `parts` partitions (explicit
    * user repartition — AQE never coalesces it, so the physical layout
    * is hash(keys, parts) by construction), locally checkpoints the
    * result lazily, and wraps it in a LogicalRDD that DECLARES that
    * partitioning, which EnsureRequirements then honors.
    *
    * The declared partitioning is a fact about the rows, not a hint:
    * rows were placed by `HashPartitioning(keys, parts)` evaluation in
    * the repartition exchange, and localCheckpoint pins blocks in
    * place. Keys are resolved by name against the frame's output.
    */
  def checkpointKeyed(df: org.apache.spark.sql.DataFrame,
      parts: Int, keys: String*): org.apache.spark.sql.DataFrame =
    checkpointKeyedEager(df, parts, eager = false, keys: _*)

  /** [[checkpointKeyed]] with explicit materialization control: eager
    * when the frame feeds multiple lazy broadcast builds (concurrent
    * broadcast threads would otherwise race to materialize the same
    * unpersisted prefix and duplicate its compute — measured on the
    * MMR greedy loop), lazy when a single downstream action follows.
    */
  def checkpointKeyedEager(df: org.apache.spark.sql.DataFrame,
      parts: Int, eager: Boolean,
      keys: String*): org.apache.spark.sql.DataFrame = {
    val spark = df.sparkSession
      .asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    val pre = df.repartition(parts, keys.map(df.col): _*)
      .asInstanceOf[org.apache.spark.sql.classic.Dataset[
        org.apache.spark.sql.Row]]
    val qe = pre.queryExecution
    // same materialization shape as Dataset.checkpoint: per-row copy
    // (unsafe rows reuse buffers), lazy local checkpoint — the first
    // action computes AND persists, later plans read the blocks
    val rdd = qe.toRdd.map(_.copy())
    rdd.localCheckpoint()
    if (eager) rdd.count() // materialize + pin blocks now
    val attrs = qe.analyzed.output
    val keyAttrs = keys.map(k => attrs.find(_.name == k).getOrElse(
      throw new IllegalArgumentException(s"no column $k")))
    val part = org.apache.spark.sql.catalyst.plans.physical
      .HashPartitioning(keyAttrs, parts)
    org.apache.spark.sql.classic.Dataset.ofRows(spark,
      org.apache.spark.sql.execution.LogicalRDD(
        attrs, rdd, part, Nil, isStreaming = false)(spark))
  }
}
