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

  /** The hit-shaped record stream synthesized from `orders` — the
    * common raw frame behind the streaming fixtures. */
  private[queries] def rawHits(s: SparkSession, d: String): DataFrame = {
    val iso = (c: Column) => date_format(c, "yyyy-MM-dd'T'HH:mm:ss'Z'")
    Tables.orders(s, d).select(
      struct(
        col("o_orderkey").cast("string").as("numeroProcesso"),
        struct(lit(1L).as("codigo"), col("o_orderpriority").as("nome")).as("classe"),
        iso(col("o_orderdate")).as("dataAjuizamento"),
        lit("1").as("grau")
      ).as("_source"),
      array(unix_millis(col("o_orderdate"))).as("sort"))
  }

  /** The raw DataJud hit pages, staged once per sf under the
    * content-keyed cache (the fixture is a pure function of `orders`);
    * shared by every streaming query that consumes the hit stream.
    * Checkpoints and sink names stay run-scoped — only the
    * deterministic page files are cached. */
  private[queries] def hitPagesFixture(s: SparkSession, d: String): String =
    FixtureCache.cached(d, "shits", 1, Seq("orders")) { tmp =>
      rawHits(s, d).repartition(4).write.mode("overwrite")
        .json(tmp.resolve("pages").toString)
    }.resolve("pages").toString

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
    val pages = hitPagesFixture(s, d)
    val stage = StreamHarness.runDir("graft_stream")
    val parsed = StreamingOps.streamHits(s, pages, "TJX",
      Map("maxFilesPerTrigger" -> "1"))
    val counts = StreamingOps.tumblingCounts(
      parsed.filter(col("data_ajuizamento").isNotNull),
      "data_ajuizamento", "classe")
    StreamHarness.drain(counts, stage, OutputMode.Complete)
      .select(TimeFns.tsString(col("ws")).as("ws"), col("classe"), col("cnt"))
      .orderBy("ws", "classe")
  }

  /** Write the two bucketed fact tables once per (sf, source content)
    * and register them as external bucketed tables in the current
    * session's catalog. The write is the amortized-once shuffle of the
    * bucketed-layout story; re-registration (DROP + CREATE over the
    * cached files) is metadata-only, so every invocation after the first
    * measures the read-side join, not the layout build. Spark recovers
    * each file's bucket id from the writer's file-name convention, so an
    * external `CLUSTERED BY` table over the cached files plans
    * identically to the freshly-written one. */
  private def bucketedFactTables(s: SparkSession, d: String): Unit = {
    val specs = Seq(
      ("orders_bkt", "o_orderkey", () => Tables.orders(s, d)),
      ("lineitem_bkt", "l_orderkey", () => Tables.lineitem(s, d)))
    val root = FixtureCache.cached(d, "bkt", 1, Seq("orders", "lineitem")) { tmp =>
      specs.foreach { case (name, key, df) =>
        df().write.mode("overwrite").option("path", tmp.resolve(name).toString)
          .bucketBy(8, key).sortBy(key).saveAsTable(s"graft_${name}_build")
        s.sql(s"DROP TABLE graft_${name}_build") // external: files stay
      }
    }
    specs.foreach { case (name, key, df) =>
      s.sql(s"DROP TABLE IF EXISTS graft_$name")
      s.sql(
        s"""CREATE TABLE graft_$name (${df().schema.toDDL})
           |USING parquet
           |CLUSTERED BY ($key) SORTED BY ($key) INTO 8 BUCKETS
           |LOCATION '${root.resolve(name)}'""".stripMargin)
    }
  }

  /** Bucketed physical layout under the gate: both fact sides are written
    * `bucketBy(8, <join key>)` and the join runs with ZERO Exchange — the
    * shuffle was paid once at write time and is amortized over every
    * subsequent join on that key (the SCALE.md answer for repeated
    * fact-fact joins at 100 TB; pair with the `merge` hint so neither
    * planner nor AQE swaps in a broadcast and hides the layout proof).
    * The layout is staged once per sf via [[bucketedFactTables]]; the
    * query itself is the read-side join plus the witness.
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
    bucketedFactTables(s, d)
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

  /** Hive-partitioned layout under the gate: the flattened processos
    * frame is persisted through [[graft.pipeline.JurimetriaPipeline
    * .persistPartitioned]] (K1 at scale — partition dir per court), read
    * back, and filtered to ONE court. The witness: the scan must carry
    * the court predicate as a PartitionFilter (directory-level pruning —
    * at 100 TB the per-court reader lists one directory instead of
    * scanning the corpus) or the query throws. Court is derived from
    * `o_custkey % 5`, so all five partition directories exist and the
    * pruned read is 1-of-5.
    *
    * Oracle: partition layout must be semantically invisible — the same
    * counts computed straight from `orders`. */
  val q51PartitionedPrune = Q("q51_partitioned_prune",
    """SELECT o_orderpriority AS classe, COUNT(*) AS cnt
      |FROM orders WHERE o_custkey % 5 = 2
      |GROUP BY 1 ORDER BY classe""".stripMargin) { (s, d) =>
    val iso = (c: Column) => date_format(c, "yyyy-MM-dd'T'HH:mm:ss'Z'")
    val raw = Tables.orders(s, d).select(
      struct(
        col("o_orderkey").cast("string").as("numeroProcesso"),
        struct(lit(1L).as("codigo"), col("o_orderpriority").as("nome")).as("classe"),
        iso(col("o_orderdate")).as("dataAjuizamento"),
        lit(null).cast("string").as("dataHoraUltimaAtualizacao"),
        lit(null).cast("struct<nome:string>").as("formato"),
        lit(null).cast("struct<codigo:string,nome:string,codigoMunicipioIBGE:string>")
          .as("orgaoJulgador"),
        lit("1").as("grau"),
        lit(null).cast("array<struct<codigo:bigint,nome:string>>").as("assuntos"),
        lit(null).cast("array<struct<codigo:bigint,nome:string,dataHora:string>>")
          .as("movimentos")
      ).as("_source"),
      array(unix_millis(col("o_orderdate"))).as("sort"),
      concat(lit("TJ"), pmod(col("o_custkey"), lit(5)).cast("string")).as("trib"))
    val flat = graft.pipeline.Hits.parseHits(raw, col("trib"))
    // layout staged once per (sf, content) — the write is the paid-once
    // half of the partitioned-layout story (exactly q50's treatment);
    // the query's own witness is read-side pruning, not the write
    val outDir = FixtureCache.cached(d, "part", 1, Seq("orders")) { tmp =>
      graft.pipeline.JurimetriaPipeline.persistPartitioned(flat, tmp.toString)
    }.toString
    val out = s.read.parquet(s"$outDir/processos_part.parquet")
      .filter(col("tribunal") === "TJ2")
      .groupBy(col("classe"))
      .agg(count(lit(1)).as("cnt"))
      .orderBy("classe")
    val plan = out.queryExecution.executedPlan.toString
    if (!plan.contains("PartitionFilters: [") ||
        !"PartitionFilters: \\[[^\\]]*tribunal".r.findFirstIn(plan).isDefined)
      throw new IllegalStateException(
        s"court predicate did not reach the scan as a PartitionFilter:\n$plan")
    out
  }

  /** Stateful streaming dedup under the gate: every order row is
    * re-delivered 1–3 times (identical copies — the cursor-retry
    * re-delivery the reference's pagination loop can produce), scattered
    * across four JSON page files consumed one per micro-batch; the
    * [[StreamingOps.dedupWithinWatermark]] state store must collapse
    * them back to exactly one row per key.
    *
    * The watermark delay is set to the whole corpus time-span (10 years):
    * a drain-run assertion needs NO late-drop and NO state eviction —
    * with a short delay, a batch that happens to carry the newest
    * timestamp would advance the watermark past every other key's FIRST
    * delivery and the output would depend on which rows landed in which
    * file. The production setting is the opposite trade: delay = max
    * re-delivery lag, so state stays bounded and genuinely-late
    * re-deliveries are dropped as late data. Same operator, one knob.
    *
    * Oracle: re-delivery must be invisible — SELECT DISTINCT over the
    * same synthesized relation, which is one row per order. */
  val streamingDedup = Q("streaming_dedup",
    """SELECT CAST(o_orderkey AS VARCHAR) AS numero, o_orderpriority AS classe,
      |  strftime(o_orderdate, '%Y-%m-%d %H:%M:%S') AS ts
      |FROM orders WHERE o_orderdate IS NOT NULL
      |ORDER BY numero""".stripMargin) { (s, d) =>
    val base = Tables.orders(s, d)
      .filter(col("o_orderdate").isNotNull)
      .select(col("o_orderkey").cast("string").as("numero"),
        col("o_orderpriority").as("classe"),
        col("o_orderdate").as("ts"),
        (pmod(col("o_orderkey"), lit(3)) + 1).cast("int").as("_copies"))
    val redelivered = base
      .select(col("numero"), col("classe"), col("ts"),
        explode(sequence(lit(1), col("_copies"))).as("_i"))
      .drop("_i") // copies are byte-identical: survivor choice is moot
    val pages = FixtureCache.cached(d, "sdedup", 1, Seq("orders")) { tmp =>
      redelivered.repartition(4).write.mode("overwrite")
        .json(tmp.resolve("pages").toString)
    }.resolve("pages").toString
    val stage = StreamHarness.runDir("graft_sdedup")
    val stream = s.readStream
      .schema("numero STRING, classe STRING, ts TIMESTAMP")
      .option("maxFilesPerTrigger", "1").json(pages)
    val deduped = StreamingOps.dedupWithinWatermark(
      stream, "ts", Seq("numero"), watermark = "87600 hours")
    StreamHarness.drain(deduped, stage, OutputMode.Append)
      .select(col("numero"), col("classe"), TimeFns.tsString(col("ts")).as("ts"))
      .orderBy("numero")
  }

  val round6: Seq[Q] = Seq(streamingHitsWindow, q50BucketedJoin,
    q51PartitionedPrune, streamingDedup)
}
