package graft.tools

import org.apache.spark.sql.functions._

/** Relational scale point beyond the round-4 10× probe:
  * `runMain graft.tools.RelProbe <sfDir> <scratchDir> [factor] [query...]`.
  *
  * Replicates lineitem/orders/customer `factor`× with per-copy key
  * offsets (o_orderkey/l_orderkey and c_custkey/o_custkey move together,
  * so referential integrity and join fan-out per key are preserved and
  * value distributions are untouched), then reports steady-state
  * (pass-2) times for the requested queries on the replica. One scan ×
  * crossJoin(range(factor)) builds each table — no driver-side loop. */
object RelProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.create()
    val sfDir = args(0)
    val scratch = args(1)
    val factor = if (args.length > 2) args(2).toInt else 100
    val queries = if (args.length > 3) args.drop(3).toSeq
      else Seq("q01_pricing_agg", "q03_join_agg", "q19_rollup")

    val li = graft.Tables.lineitem(spark, sfDir)
    val ord = graft.Tables.orders(spark, sfDir)
    val cust = graft.Tables.customer(spark, sfDir)
    val ordOff = ord.agg(max("o_orderkey")).head().getLong(0) + 1
    val custOff = cust.agg(max("c_custkey")).head().getLong(0) + 1
    val copies = spark.range(factor).select(col("id").as("_c"))

    li.crossJoin(copies)
      .withColumn("l_orderkey", col("l_orderkey") + col("_c") * ordOff)
      .drop("_c")
      .write.mode("overwrite").parquet(s"$scratch/lineitem.parquet")
    ord.crossJoin(copies)
      .withColumn("o_orderkey", col("o_orderkey") + col("_c") * ordOff)
      .withColumn("o_custkey", col("o_custkey") + col("_c") * custOff)
      .drop("_c")
      .write.mode("overwrite").parquet(s"$scratch/orders.parquet")
    cust.crossJoin(copies)
      .withColumn("c_custkey", col("c_custkey") + col("_c") * custOff)
      .drop("_c")
      .write.mode("overwrite").parquet(s"$scratch/customer.parquet")
    println(s"PROBE rel built ${factor}x at $scratch")

    for (dir <- Seq(sfDir, scratch); q <- queries; pass <- 1 to 2) {
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(q)(spark, dir)
        .write.format("noop").mode("overwrite").save()
      val scale = if (dir == sfDir) "1x" else s"${factor}x"
      println(s"PROBE rel time $scale pass$pass $q ${(System.nanoTime() - t0) / 1e9}")
    }
    spark.stop()
  }
}
