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
}
