package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Manual skew mitigation for shuffle joins: salt the big (skewed) side
  * into `buckets` sub-keys and replicate the small side once per salt, so
  * one hot key spreads over `buckets` reducers instead of melting a
  * single task at 100 TB.
  *
  * AQE's skew-join split (on by default in [[graft.GraftSession]]) covers
  * sort-merge joins after the fact; explicit salting remains the tool
  * when the skew is known ahead of time, when the join must be
  * shuffled-hash, or when a groupBy (not a join) is the skewed shuffle.
  *
  * The salt is `pmod(xxhash64(entire row), buckets)` — deterministic (no
  * rand(), so plans stay replayable/cacheable) while still spreading a
  * hot key's rows, which differ in their other columns.
  */
object Skew {

  def saltBig(big: DataFrame, buckets: Int): DataFrame =
    big.withColumn("_salt",
      pmod(xxhash64(big.columns.map(col): _*), lit(buckets)).cast("int"))

  def replicateSmall(small: DataFrame, buckets: Int): DataFrame =
    small.withColumn("_salt",
      explode(sequence(lit(0), lit(buckets - 1))))

  /** Salted two-stage aggregation for skewed group keys: stage 1 partially
    * aggregates on (key, salt) — a hot key spreads over `buckets` reducers
    * — stage 2 combines the per-salt partials on the key alone (tiny:
    * ≤ buckets rows per key). count and decimal-sum both re-combine
    * exactly, so the result is identical to the unsalted groupBy.
    *
    * Returns `keys :+ cnt :+ sum_v` with the same decimal-exact sum
    * discipline as [[graft.functions.AggFns.dsum]]. */
  def saltedSumCount(df: DataFrame, keys: Seq[String], valCol: String,
                     buckets: Int): DataFrame = {
    val D = org.apache.spark.sql.types.DecimalType(30, 10)
    val stage1 = saltBig(df, buckets)
      .groupBy((keys :+ "_salt").map(col): _*)
      .agg(count(lit(1)).as("_cnt"), sum(col(valCol).cast(D)).as("_sum"))
    stage1.groupBy(keys.map(col): _*)
      .agg(sum(col("_cnt")).as("cnt"),
        round(sum(col("_sum")), 4).cast("double").as("sum_v"))
  }

  /** Equi-join `big ⋈ small` on `bigKey === smallKey`, salted. Result is
    * identical to the unsalted join (salts match by construction). */
  def saltedJoin(big: DataFrame, small: DataFrame,
                 bigKey: Column, smallKey: Column,
                 buckets: Int, joinType: String = "inner"): DataFrame = {
    val b = saltBig(big, buckets)
    val s = replicateSmall(small, buckets)
    b.join(s, bigKey === smallKey && b("_salt") === s("_salt"), joinType)
      .drop(b("_salt")).drop(s("_salt"))
  }
}
