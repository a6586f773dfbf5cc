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

  /** Integer parts-per-million ratio: `floor(1e6·a/b)` of exact
    * integers is one IEEE-exact divide on identical operands in both
    * engines → bit-identical. The cross-engine way to emit any ratio.
    */
  def ppm(num: Column, den: Column): Column =
    floor(lit(1e6) * num.cast("double") / den.cast("double")).cast("long")

  /** Exact, order-independent sum of a COMPUTED double expression.
    * `dsum`'s double→DECIMAL cast rounds half-up in Spark but not
    * always identically in DuckDB at .00005 boundaries (observed
    * 1-row-in-70 divergences); flooring the identical IEEE double
    * first is bit-identical in both engines. The long partials are
    * summed through DECIMAL(38,0) so the total cannot overflow int64
    * at any corpus size (DuckDB auto-promotes its SUM to HUGEINT —
    * same exact integer, same nearest-double cast).
    */
  def fsum(c: Column, scale: Double = 10000.0): Column =
    sum(floor(c * lit(scale)).cast("long").cast(DecimalType(38, 0)))
      .cast("double") / lit(scale)

  /** Epoch-day integer of a timestamp/date column — the cross-engine
    * date key (a DATE output column reads back with engine-specific
    * pandas dtypes in the driver compare; an int64 day never does).
    */
  def epochDay(c: Column): Column =
    datediff(c.cast("date"), lit(java.sql.Date.valueOf("1970-01-01")))
      .cast("long")

  /** SQL twins (kept adjacent so Spark and oracle stay in lockstep). */
  def sqlEpochDay(x: String): String =
    s"CAST(date_diff('day', DATE '1970-01-01', CAST($x AS DATE)) AS BIGINT)"

  def sqlDsum(x: String, scale: Int = 2): String =
    s"CAST(SUM(CAST(($x) AS DECIMAL(18,$scale))) AS DOUBLE)"
  def sqlDavg(x: String, scale: Int = 2): String =
    s"(CAST(SUM(CAST(($x) AS DECIMAL(18,$scale))) AS DOUBLE) / CAST(COUNT($x) AS DOUBLE))"
  def sqlPpm(num: String, den: String): String =
    s"CAST(floor(1e6 * CAST($num AS DOUBLE) / CAST($den AS DOUBLE)) AS BIGINT)"
  def sqlFsum(x: String, scale: String = "10000.0"): String =
    s"CAST(SUM(CAST(floor(($x) * $scale) AS BIGINT)) AS DOUBLE) / $scale"
}
