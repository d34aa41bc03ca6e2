package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Round-6 gate queries: the genuinely-streaming run must agree with its
  * batch twin, and the bucketed join must keep its Exchange-free witness
  * honest (it throws from inside the query if the layout is unused). */
class Registry5Spec extends SparkSpec {

  test("streaming_hits_window equals the batch windowed count") {
    val streamed = Registry5.streamingHitsWindow.run(spark, sf).collect()
    val batch = graft.Tables.orders(spark, sf)
      .filter(col("o_orderdate").isNotNull)
      .groupBy(date_format(date_trunc("hour", col("o_orderdate")),
        "yyyy-MM-dd HH:mm:ss").as("ws"),
        col("o_orderpriority").as("classe"))
      .agg(count(lit(1)).as("cnt"))
      .orderBy("ws", "classe")
      .collect()
    assert(streamed.length == batch.length && streamed.length > 0)
    assert(streamed.toSeq == batch.toSeq)
  }

  test("q50_bucketed_join matches the plain-parquet join and passes its own witness") {
    // .run throws IllegalStateException if an Exchange sneaks below the SMJ
    val bucketed = Registry5.q50BucketedJoin.run(spark, sf).collect()
    val plain = graft.Tables.orders(spark, sf)
      .join(graft.Tables.lineitem(spark, sf),
        col("o_orderkey") === col("l_orderkey"))
      .groupBy("o_orderstatus")
      .agg(count(lit(1)).as("cnt"),
        graft.functions.AggFns.dsum(col("l_quantity")).as("sum_qty"))
      .orderBy("o_orderstatus")
      .collect()
    assert(bucketed.length == plain.length && bucketed.length > 0)
    assert(bucketed.toSeq == plain.toSeq)
  }

  test("q51_partitioned_prune matches the direct aggregate (witness inside the query)") {
    // .run throws IllegalStateException if the court predicate is not a PartitionFilter
    val pruned = Registry5.q51PartitionedPrune.run(spark, sf).collect()
    val direct = graft.Tables.orders(spark, sf)
      .filter(pmod(col("o_custkey"), lit(5)) === 2)
      .groupBy(col("o_orderpriority").as("classe"))
      .agg(count(lit(1)).as("cnt"))
      .orderBy("classe")
      .collect()
    assert(pruned.length == direct.length && pruned.length > 0)
    assert(pruned.toSeq == direct.toSeq)
  }

  test("streaming_dedup collapses every re-delivery to one row per key") {
    val out = Registry5.streamingDedup.run(spark, sf).collect()
    val keys = graft.Tables.orders(spark, sf)
      .filter(col("o_orderdate").isNotNull).count()
    assert(out.length == keys)
    assert(out.map(_.getString(0)).distinct.length == out.length)
  }
}
