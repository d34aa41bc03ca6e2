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
