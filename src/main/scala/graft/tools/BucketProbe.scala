package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Measures the bucketed-layout amortization claim behind q50
  * (`runMain graft.tools.BucketProbe <sfDir> <scratchDir> [k]`):
  * the bucketed write costs one up-front shuffle; every subsequent join
  * on the bucket key then skips both Exchanges (+ one sort, since the
  * buckets are also sorted). The probe times the same join+rollup k
  * times over raw parquet vs over the bucketed tables, plus the
  * bucketed write itself, and reports the break-even read count
  * k* = write / (unbucketed − bucketed): a fact table joined on the
  * same key more than k* times pays for its own bucketing. At 100 TB
  * the case is stronger than measured here — local[32] hides the
  * network cost of the two corpus-sized Exchanges the layout removes. */
object BucketProbe {

  private def time(f: => Unit): Double = {
    val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
  }

  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.create()
    val sfDir = args(0)
    val scratch = args(1)
    val k = if (args.length > 2) args(2).toInt else 5

    // q50's read-side plan: merge hint pins SMJ on both variants so the
    // probe isolates the Exchange cost (AQE respects the hint and will
    // not swap in a broadcast)
    def rollup(o: DataFrame, l: DataFrame): DataFrame =
      o.join(l.hint("merge"), col("o_orderkey") === col("l_orderkey"))
        .groupBy("o_orderstatus")
        .agg(count(lit(1)).as("cnt"),
          graft.functions.AggFns.dsum(col("l_quantity")).as("sum_qty"))

    def run(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    val o = graft.Tables.orders(spark, sfDir)
    val l = graft.Tables.lineitem(spark, sfDir)
    run(rollup(o, l)) // warm-up: plan compile + page cache
    val tu = (1 to k).map(_ => time(run(rollup(o, l))))

    val tWrite = time {
      o.write.mode("overwrite").option("path", s"$scratch/orders_bkt")
        .bucketBy(8, "o_orderkey").sortBy("o_orderkey")
        .saveAsTable("probe_orders_bkt")
      l.write.mode("overwrite").option("path", s"$scratch/lineitem_bkt")
        .bucketBy(8, "l_orderkey").sortBy("l_orderkey")
        .saveAsTable("probe_lineitem_bkt")
    }
    val ob = spark.table("probe_orders_bkt")
    val lb = spark.table("probe_lineitem_bkt")
    val plan = rollup(ob, lb).queryExecution.executedPlan.toString
    require(!plan.split("SortMergeJoin").last.contains("Exchange"),
      s"bucketed join subtree contains an Exchange:\n$plan")
    run(rollup(ob, lb)) // warm-up
    val tb = (1 to k).map(_ => time(run(rollup(ob, lb))))

    def fmt(xs: Seq[Double]) = xs.map(x => f"$x%.3f").mkString(",")
    println(s"PROBE bucket write=${f"$tWrite%.2f"} " +
      s"unbucketed=[${fmt(tu)}] bucketed=[${fmt(tb)}]")
    val du = tu.min; val db = tb.min
    println(f"PROBE bucket min_unbucketed=$du%.3f min_bucketed=$db%.3f " +
      f"write=$tWrite%.2f break_even_k=${tWrite / (du - db)}%.1f")
    spark.stop()
  }
}
