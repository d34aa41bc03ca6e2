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
  *
  * Representable range: |x| < 1e20 per row (decimal(30,10)); the session
  * pins spark.sql.ansi.enabled=false, so out-of-range values null out
  * instead of aborting the query (ADVICE.md r1). The harness testdata is
  * far inside this range.
  */
object AggFns {
  private val D = DecimalType(30, 10)

  /** Exact, order-independent sum of a double expression → double.
    *
    * The final round(…, 4) matters for cross-engine parity: DuckDB casts
    * decimal→double via the unscaled integer, which at scale 10 exceeds
    * 2^53 for ~1e9-sized sums and silently loses precision. Money-grid
    * inputs (≤4 decimal places) make the scale-4 round an identity, and
    * the smaller unscaled value converts exactly in every engine. */
  def dsum(c: Column): Column = round(sum(c.cast(D)), 4).cast("double")

  /** Exact sum of a PRODUCT of two money-grid doubles (e.g. price ×
    * (1-discount)). The double product has a long binary expansion, and
    * engines disagree on double→decimal rounding for such values (binary
    * vs shortest-repr). Casting each FACTOR to decimal(18,4) first is
    * unambiguous for 2-decimal source data, and the decimal multiply +
    * decimal sum are then exact in every engine.
    * DuckDB mirror: CAST(SUM(CAST(a AS DECIMAL(18,4)) * CAST(b AS
    * DECIMAL(18,4))) AS DOUBLE). */
  def dsumTimes(a: Column, b: Column): Column = {
    val D4 = DecimalType(18, 4)
    round(sum(a.cast(D4) * b.cast(D4)), 4).cast("double")
  }

  /** Deterministic average: exact decimal sum cast to double, divided by
    * count (IEEE division of identical operands is bit-identical anywhere).
    * DuckDB mirror: CAST(SUM(CAST(x AS DECIMAL(30,10))) AS DOUBLE) / COUNT(x). */
  def davg(c: Column): Column =
    round(sum(c.cast(D)), 4).cast("double") / count(c)
}
