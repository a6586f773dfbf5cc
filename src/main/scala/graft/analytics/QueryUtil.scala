package graft.analytics

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.core.Tables

/** Shared helpers for oracle-checked queries.
  *
  * Determinism note: double summation is order-dependent, and Spark and
  * DuckDB will visit rows in different orders — so raw `sum(double)`
  * can hash-mismatch the oracle. Every money/quantity aggregate
  * therefore casts to an exact DECIMAL first (associative, engine
  * independent) and casts the final result back to DOUBLE (exact for
  * our magnitudes — well under 2^53). The SQL twin of each helper is in
  * the oracle strings.
  */
object QueryUtil {

  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(spark, dir, name)

  /** Exact, order-independent sum of a double column. */
  def dsum(c: Column, scale: Int = 2): Column =
    sum(c.cast(DecimalType(18, scale))).cast("double")

  /** Exact mean: exact sum over exact count (IEEE division is
    * deterministic given identical operands).
    */
  def davg(c: Column, scale: Int = 2): Column =
    (sum(c.cast(DecimalType(18, scale))).cast("double") /
      count(c).cast("double"))

  /** SQL twins (kept adjacent so Spark and oracle stay in lockstep). */
  def sqlDsum(x: String, scale: Int = 2): String =
    s"CAST(SUM(CAST(($x) AS DECIMAL(18,$scale))) AS DOUBLE)"
  def sqlDavg(x: String, scale: Int = 2): String =
    s"(CAST(SUM(CAST(($x) AS DECIMAL(18,$scale))) AS DOUBLE) / CAST(COUNT($x) AS DOUBLE))"
}
