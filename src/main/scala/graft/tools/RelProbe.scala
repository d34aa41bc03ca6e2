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
    // optional arg 4: "nobuild" reuses the replica already at <scratch>
    // (a 1000× build writes ~15 GB — retries and query-only runs must
    // not re-pay it); "buildonly" writes the replica and exits
    val flags = args.drop(3).takeWhile(a => a == "nobuild" || a == "buildonly").toSet
    val rebuild = !flags.contains("nobuild")
    val queriesArgs = args.drop(3 + flags.size).toSeq
    val queries = if (queriesArgs.nonEmpty) queriesArgs
      else Seq("q01_pricing_agg", "q03_join_agg", "q19_rollup")

    val li = graft.Tables.lineitem(spark, sfDir)
    val ord = graft.Tables.orders(spark, sfDir)
    val cust = graft.Tables.customer(spark, sfDir)
    val ordOff = ord.agg(max("o_orderkey")).head().getLong(0) + 1
    val custOff = cust.agg(max("c_custkey")).head().getLong(0) + 1
    val copies = spark.range(factor).select(col("id").as("_c"))

    // Writer-side layout is a SCALE decision, not a cosmetic one: the
    // crossJoin inherits the small source's single input partition, so
    // an unrepartitioned write emits ONE multi-GB file whose default
    // ~128 MB-compressed row groups then set the SCAN's per-task memory
    // floor — the round-8 measurement that became the
    // [[graft.operators.Layout.layoutOptimize]] operator (full history
    // in its scaladoc + SCALE.md); the replica build now just calls it.
    // Measured on-disk trade at factor=1000 (lineitem): the original
    // single-task write was 3.5 GB only because each source row's 1000
    // copies sat ADJACENT (non-key columns compressed as ~1000-long
    // runs — a duplication artifact, not real locality); range +
    // local-sort scatters copies across the keyspace by construction
    // (8.3 GB, the replica's true entropy).
    val outParts = math.max(32, factor / 8)
    if (rebuild) {
    graft.operators.Layout.layoutOptimize(
      li.crossJoin(copies)
        .withColumn("l_orderkey", col("l_orderkey") + col("_c") * ordOff)
        .drop("_c"),
      col("l_orderkey"), s"$scratch/lineitem.parquet", outParts)
    graft.operators.Layout.layoutOptimize(
      ord.crossJoin(copies)
        .withColumn("o_orderkey", col("o_orderkey") + col("_c") * ordOff)
        .withColumn("o_custkey", col("o_custkey") + col("_c") * custOff)
        .drop("_c"),
      col("o_orderkey"), s"$scratch/orders.parquet", outParts)
    graft.operators.Layout.layoutOptimize(
      cust.crossJoin(copies)
        .withColumn("c_custkey", col("c_custkey") + col("_c") * custOff)
        .drop("_c"),
      col("c_custkey"), s"$scratch/customer.parquet", outParts)
    println(s"PROBE rel built ${factor}x at $scratch")
    }
    if (flags.contains("buildonly")) { spark.stop(); return }

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
