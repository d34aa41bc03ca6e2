package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, Trigger}
import graft.Tables
import graft.functions.{AggFns, TimeFns}
import graft.streaming.StreamingOps

/** Round-6 additions: the two execution paths SCALE.md sells but round 5
  * left spec-only are put under the driver's oracle gate — the actual
  * Structured Streaming run (not just its batch twin) and a bucketed
  * physical layout whose join is verifiably Exchange-free.
  */
object Registry5 {

  /** The streaming execution path itself under the hash gate. The raw
    * DataJud hit pages are synthesized from `orders` (same inline-fixture
    * discipline as `pipeline_hits`) and written as four JSON page files;
    * [[StreamingOps.streamHits]] then consumes them through the REAL
    * streaming machinery — file-source offsets with `maxFilesPerTrigger=1`
    * (four micro-batches, so windowed state genuinely accumulates across
    * batches), the [[graft.pipeline.Hits.parseHits]] flatten on a
    * streaming frame, a watermarked tumbling-window count, and a
    * run-to-completion `Trigger.AvailableNow` into a memory sink.
    *
    * Complete output mode: the bounded run must emit EVERY window, not
    * just those the final watermark passed (append mode would hold back
    * the trailing watermark-delay horizon of windows in state — correct
    * for an unbounded stream, wrong for a drain-and-stop audit). The
    * memory sink is the bounded-run harness face; the production shape is
    * append mode into a parquet/Kafka sink, where the watermark bounds
    * state instead of the input ending.
    *
    * Oracle: the same windowed GROUP BY the batch face (q16 family)
    * proves, replayed over `orders` — streaming and batch must agree
    * bit-for-bit on the final counts (null filing dates are dropped
    * explicitly on both sides; a watermarked streaming agg never sees
    * null event times).
    *
    * Reference: the `search_after` pagination loop IS this stream —
    * /root/reference/src/jurimetria_pipeline.py:114-158. */
  val streamingHitsWindow = Q("streaming_hits_window",
    """SELECT strftime(date_trunc('hour', o_orderdate), '%Y-%m-%d %H:%M:%S') AS ws,
      |  o_orderpriority AS classe, COUNT(*) AS cnt
      |FROM orders WHERE o_orderdate IS NOT NULL
      |GROUP BY 1, 2 ORDER BY ws, classe""".stripMargin) { (s, d) =>
    val iso = (c: Column) => date_format(c, "yyyy-MM-dd'T'HH:mm:ss'Z'")
    val raw = Tables.orders(s, d).select(
      struct(
        col("o_orderkey").cast("string").as("numeroProcesso"),
        struct(lit(1L).as("codigo"), col("o_orderpriority").as("nome")).as("classe"),
        iso(col("o_orderdate")).as("dataAjuizamento"),
        lit("1").as("grau")
      ).as("_source"),
      array(unix_millis(col("o_orderdate"))).as("sort"))
    val stage = java.nio.file.Files.createTempDirectory("graft_stream")
    val pages = stage.resolve("pages").toString
    raw.repartition(4).write.mode("overwrite").json(pages)
    val parsed = StreamingOps.streamHits(s, pages, "TJX",
      Map("maxFilesPerTrigger" -> "1"))
    val counts = StreamingOps.tumblingCounts(
      parsed.filter(col("data_ajuizamento").isNotNull),
      "data_ajuizamento", "classe")
    val mem = stage.getFileName.toString.replaceAll("[^A-Za-z0-9_]", "_")
    val stream = counts.writeStream.format("memory").queryName(mem)
      .outputMode(OutputMode.Complete)
      .option("checkpointLocation", stage.resolve("ckpt").toString)
      .trigger(Trigger.AvailableNow()).start()
    stream.awaitTermination()
    s.table(mem)
      .select(TimeFns.tsString(col("ws")).as("ws"), col("classe"), col("cnt"))
      .orderBy("ws", "classe")
  }

  /** Bucketed physical layout under the gate: both fact sides are written
    * `bucketBy(8, <join key>)` and the join runs with ZERO Exchange — the
    * shuffle was paid once at write time and is amortized over every
    * subsequent join on that key (the SCALE.md answer for repeated
    * fact-fact joins at 100 TB; pair with the `merge` hint so neither
    * planner nor AQE swaps in a broadcast and hides the layout proof).
    *
    * The Exchange-free claim is a hard witness, not a comment: the query
    * inspects its own physical plan and THROWS if any Exchange appears
    * below the SortMergeJoin (same discipline as the CC convergence
    * witness). Only the tiny post-join rollup on `o_orderstatus` may
    * shuffle.
    *
    * Oracle: the layout must be semantically invisible — a plain
    * join+aggregate over the raw parquet produces identical results. */
  val q50BucketedJoin = Q("q50_bucketed_join",
    """SELECT o_orderstatus, COUNT(*) AS cnt,
      |  CAST(ROUND(SUM(CAST(l_quantity AS DECIMAL(30,10))), 4) AS DOUBLE) AS sum_qty
      |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
      |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin) { (s, d) =>
    val wh = java.nio.file.Files.createTempDirectory("graft_bucketed")
    Tables.orders(s, d).write.mode("overwrite")
      .option("path", s"$wh/orders_bkt")
      .bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .saveAsTable("graft_orders_bkt")
    Tables.lineitem(s, d).write.mode("overwrite")
      .option("path", s"$wh/lineitem_bkt")
      .bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .saveAsTable("graft_lineitem_bkt")
    val out = s.table("graft_orders_bkt")
      .join(s.table("graft_lineitem_bkt").hint("merge"),
        col("o_orderkey") === col("l_orderkey"))
      .groupBy("o_orderstatus")
      .agg(count(lit(1)).as("cnt"), AggFns.dsum(col("l_quantity")).as("sum_qty"))
      .orderBy("o_orderstatus")
    val plan = out.queryExecution.executedPlan.toString
    if (!plan.contains("SortMergeJoin"))
      throw new IllegalStateException(s"bucketed join did not plan as SMJ:\n$plan")
    val joinSubtree = plan.split("SortMergeJoin").last
    if (joinSubtree.contains("Exchange"))
      throw new IllegalStateException(
        s"bucketed join subtree contains an Exchange (layout not used):\n$plan")
    out
  }

  val round6: Seq[Q] = Seq(streamingHitsWindow, q50BucketedJoin)
}
