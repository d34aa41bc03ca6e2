package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Bucketing = the persisted form of co-located joins: both fact tables
  * written with `bucketBy` on the join key join WITHOUT any Exchange —
  * the shuffle happened once at write time and is amortized over every
  * subsequent join. This is the 100 TB answer for repeated fact-fact
  * joins (GraftSession scale notes; SURVEY.md §4). */
class BucketingSpec extends SparkSpec {

  test("bucketed fact-fact join plans with zero Exchange") {
    val wh = java.nio.file.Files.createTempDirectory("graft-bucketed").toFile
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      // force a real shuffle join so the assertion is about bucketing
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      graft.Tables.orders(spark, sf)
        .write.mode("overwrite")
        .option("path", s"$wh/orders_b")
        .bucketBy(8, "o_orderkey").sortBy("o_orderkey")
        .saveAsTable("orders_b")
      graft.Tables.lineitem(spark, sf)
        .write.mode("overwrite")
        .option("path", s"$wh/lineitem_b")
        .bucketBy(8, "l_orderkey").sortBy("l_orderkey")
        .saveAsTable("lineitem_b")

      val joined = spark.table("orders_b")
        .join(spark.table("lineitem_b"),
          col("o_orderkey") === col("l_orderkey"))
        .groupBy("o_orderstatus")
        .agg(count(lit(1)).as("cnt"))
      joined.collect()
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), s"expected SMJ in:\n$plan")
      // the join itself is exchange-free; only the tiny post-join
      // aggregation on o_orderstatus may shuffle
      val joinPart = plan.split("SortMergeJoin").last
      assert(!joinPart.contains("Exchange"),
        s"bucketed join should read pre-shuffled buckets:\n$plan")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS orders_b")
      spark.sql("DROP TABLE IF EXISTS lineitem_b")
      org.apache.commons.io.FileUtils.deleteDirectory(wh)
    }
  }
}
