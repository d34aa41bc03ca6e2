package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Temporal/interval join operators Spark lacks as built-ins, expressed in
  * the scalable shapes (SURVEY.md §2 "no other joins exist" — these are
  * engine extensions for the training-data/analytics surface).
  *
  * - [[asofJoinBackward]]: for each left row, the latest right row at or
  *   before its timestamp (per key). NOT a sort-merge band join or a
  *   windowed cross product: both sides are unioned, shuffled ONCE on the
  *   key, and resolved with a running `last(ignoreNulls)` window — a
  *   linear per-partition scan. This is the only shape that survives
  *   100 TB: cost is one shuffle of (key, ts, payload), no pair blow-up.
  * - [[rangeJoinBinned]]: point-in-interval join via bin bucketing. Each
  *   interval explodes to the fixed-width bins it covers, each point maps
  *   to exactly one bin, and the join becomes an equi-join on the bin key
  *   plus a residual between-filter — turning an unbounded theta join
  *   into a bounded hash join (the standard range-join optimization).
  */
object Temporal {

  /** Backward as-of join (per-key "latest value at or before ts").
    *
    * @param left      probe side; all its columns are preserved
    * @param right     reference side (e.g. quotes/clicks/checkpoints)
    * @param on        equi-key column name present on both sides
    * @param leftTs    timestamp column name on `left`
    * @param rightTs   timestamp column name on `right`
    * @param rightVals right columns to carry onto matches (null when no
    *                  right row precedes the left row)
    *
    * Ties: a right row at exactly the left timestamp matches (inclusive).
    * Multiple right rows on the same (key, ts) must be pre-deduplicated by
    * the caller (deterministic reducer, e.g. groupBy + max) — same
    * contract as DuckDB/pandas ASOF.
    */
  def asofJoinBackward(left: DataFrame, right: DataFrame, on: String,
                       leftTs: String, rightTs: String,
                       rightVals: Seq[String]): DataFrame =
    asofJoin(left, right, on, leftTs, rightTs, rightVals, forward = false)

  /** Backward as-of join with a staleness bound: matches older than
    * `toleranceSec` seconds are nulled out (pandas
    * merge_asof(tolerance=...) semantics — a quote/sensor reading past
    * its freshness window must not be carried forward). Pure composition
    * over [[asofJoinBackward]]: the matched right timestamp rides along
    * as an extra value, then a row-local predicate nulls stale values —
    * still one key shuffle, no second pass. */
  def asofJoinBackwardWithin(left: DataFrame, right: DataFrame, on: String,
                             leftTs: String, rightTs: String,
                             rightVals: Seq[String],
                             toleranceSec: Long): DataFrame = {
    require(toleranceSec >= 0, "toleranceSec must be non-negative")
    val rts = "_graft_asof_rts"
    require(!left.columns.contains(rts) && !right.columns.contains(rts),
      s"inputs must not contain a $rts column (internal working column)")
    val joined = asofJoinBackward(left,
      right.withColumn(rts, col(rightTs)), on, leftTs, rightTs,
      rightVals :+ rts)
    val fresh = col(rts).isNotNull &&
      (col(leftTs).cast("long") - col(rts).cast("long")) <= toleranceSec
    joined.select(left.columns.map(col).toSeq ++
      rightVals.map(v => when(fresh, col(v)).as(v)): _*)
  }

  /** Forward as-of join: for each left row, the EARLIEST right row at or
    * after its timestamp (per key) — the mirror of [[asofJoinBackward]]
    * (e.g. "next click after each view"). Same contract, same single-
    * shuffle shape; only the scan direction flips. */
  def asofJoinForward(left: DataFrame, right: DataFrame, on: String,
                      leftTs: String, rightTs: String,
                      rightVals: Seq[String]): DataFrame =
    asofJoin(left, right, on, leftTs, rightTs, rightVals, forward = true)

  /** Nearest as-of join: for each left row, the right row whose timestamp
    * is CLOSEST (either direction, per key); ties go backward — pandas
    * merge_asof(direction='nearest') semantics. Same contract as the
    * directional forms. Still ONE key shuffle: both scan directions are
    * windows over the same hash partitioning (one exchange, two sorts),
    * never a pair join. */
  def asofJoinNearest(left: DataFrame, right: DataFrame, on: String,
                      leftTs: String, rightTs: String,
                      rightVals: Seq[String]): DataFrame = {
    require(rightVals.nonEmpty, "rightVals must name at least one column")
    val leftCols = left.columns.toSeq
    require(rightVals.intersect(leftCols).isEmpty,
      s"rightVals ${rightVals.intersect(leftCols).mkString(",")} collide with left columns")
    val working = Seq("_ts", "_side", "_rv", "_rvb", "_rvf")
    require(working.intersect(leftCols).isEmpty,
      s"left columns ${working.intersect(leftCols).mkString(",")} collide with asof working columns")
    val l = left
      .withColumn("_ts", col(leftTs))
      .withColumn("_side", lit(1))
    // the matched right row's own ts rides in the struct as _rts so the
    // two candidates' gaps are comparable after the scans
    val r = right.select(
      col(on), col(rightTs).as("_ts"), lit(0).as("_side"),
      struct(rightVals.map(col) :+ col(rightTs).as("_rts"): _*).as("_rv"))
    val unioned = l.unionByName(r, allowMissingColumns = true)
    def w(order: Column) = Window.partitionBy(on)
      .orderBy(order, col("_side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val matched = unioned
      .withColumn("_rvb", last(col("_rv"), ignoreNulls = true).over(w(col("_ts").asc)))
      .withColumn("_rvf", last(col("_rv"), ignoreNulls = true).over(w(col("_ts").desc)))
      .filter(col("_side") === 1)
    val gapB = col("_ts").cast("long") - col("_rvb")("_rts").cast("long")
    val gapF = col("_rvf")("_rts").cast("long") - col("_ts").cast("long")
    val chosen = when(col("_rvf").isNull, col("_rvb"))
      .when(col("_rvb").isNull, col("_rvf"))
      .when(gapB <= gapF, col("_rvb")) // tie → backward (pandas contract)
      .otherwise(col("_rvf"))
    matched
      .withColumn("_rv", chosen)
      .select(leftCols.map(col) ++ rightVals.map(v => col("_rv")(v).as(v)): _*)
  }

  private def asofJoin(left: DataFrame, right: DataFrame, on: String,
                       leftTs: String, rightTs: String,
                       rightVals: Seq[String], forward: Boolean): DataFrame = {
    require(rightVals.nonEmpty, "rightVals must name at least one column")
    val leftCols = left.columns.toSeq
    require(rightVals.intersect(leftCols).isEmpty,
      s"rightVals ${rightVals.intersect(leftCols).mkString(",")} collide with left columns")
    val working = Seq("_ts", "_side", "_rv")
    require(working.intersect(leftCols).isEmpty,
      s"left columns ${working.intersect(leftCols).mkString(",")} collide with asof working columns")
    // _side: right=0 sorts before left=1 at equal ts → inclusive match
    val l = left
      .withColumn("_ts", col(leftTs))
      .withColumn("_side", lit(1))
    // All rightVals ride ONE struct so the match resolves once: the whole
    // winning right row is carried, and a legitimately-NULL field inside it
    // stays attached to that row (per-column last(ignoreNulls) would blend
    // fields from different right rows when a value column holds NULLs).
    val r = right.select(
      col(on), col(rightTs).as("_ts"), lit(0).as("_side"),
      struct(rightVals.map(col): _*).as("_rv"))
    val unioned = l.unionByName(r, allowMissingColumns = true)
    // backward: ascending scan, nearest ts ≤ left; forward: descending
    // scan, nearest ts ≥ left. Right (side 0) sorts before left at equal
    // ts in both directions → inclusive match.
    val tsOrder = if (forward) col("_ts").desc else col("_ts").asc
    val w = Window.partitionBy(on)
      .orderBy(tsOrder, col("_side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val matched = unioned
      .withColumn("_rv", last(col("_rv"), ignoreNulls = true).over(w))
    matched.filter(col("_side") === 1)
      .select(leftCols.map(col) ++ rightVals.map(v => col("_rv")(v).as(v)): _*)
  }

  /** Point-in-interval join: rows of `points` paired with every row of
    * `intervals` whose [lo, hi] contains the point (inclusive bounds).
    *
    * @param binWidth bucketing granularity — intervals explode to
    *                 ceil(span/binWidth)+1 bin keys; choose it near the
    *                 typical interval span so replication stays O(1)
    */
  def rangeJoinBinned(points: DataFrame, pointCol: String,
                      intervals: DataFrame, loCol: String, hiCol: String,
                      binWidth: Double): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    require(!points.columns.contains("_bin") && !intervals.columns.contains("_bin"),
      "input frames must not contain a _bin column (internal working column)")
    val p = points.withColumn("_bin",
      floor(col(pointCol) / binWidth).cast("long"))
    // degenerate hi<lo intervals would make sequence() count DOWN and
    // fabricate bins; they can never match, so drop them up front
    val iv = intervals.filter(col(loCol) <= col(hiCol)).withColumn("_bin",
      explode(sequence(floor(col(loCol) / binWidth).cast("long"),
        floor(col(hiCol) / binWidth).cast("long"))))
    p.join(iv, p("_bin") === iv("_bin") &&
        col(pointCol) >= col(loCol) && col(pointCol) <= col(hiCol))
      .drop("_bin")
  }
}
