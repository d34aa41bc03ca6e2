package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Deterministic numeric aggregation helpers.
  *
  * Plain `sum(double)` is order-dependent (IEEE addition is not
  * associative), so the result varies with partitioning and never
  * bit-matches an external oracle. Summing through a wide decimal is exact
  * and therefore order-independent: both Spark and DuckDB produce the same
  * DECIMAL(38,10) sum, and the final cast to double is a single well-defined
  * rounding. Per-row double→decimal(30,10) rounding is itself deterministic
  * (no double lies exactly on a half-ulp of the 1e-10 grid — such ties have
  * non-dyadic denominators).
  *
  * DuckDB oracle mirror: CAST(SUM(CAST(x AS DECIMAL(30,10))) AS DOUBLE).
  *
  * At 100 TB these stay fully distributed: decimal sums get partial
  * (map-side) aggregation exactly like double sums.
  */
object AggFns {
  private val D = DecimalType(30, 10)

  /** Exact, order-independent sum of a double expression → double. */
  def dsum(c: Column): Column = sum(c.cast(D)).cast("double")

  /** Deterministic average: exact decimal sum cast to double, divided by
    * count (IEEE division of identical operands is bit-identical anywhere).
    * DuckDB mirror: CAST(SUM(CAST(x AS DECIMAL(30,10))) AS DOUBLE) / COUNT(x). */
  def davg(c: Column): Column = sum(c.cast(D)).cast("double") / count(c)
}
