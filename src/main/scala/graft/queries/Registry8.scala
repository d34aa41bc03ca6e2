package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.operators.{Dedup, Similarity}

/** Round-9 additions: the trained two-level IVF loop, incremental
  * cluster maintenance, the writer-layout operator, and the late-data
  * streaming witness. */
object Registry8 {

  /** Fully TRAINED two-level IVF assignment — the round-8 demo
    * ([[Registry7.annIvfTwoLevel]], seed-rule codebooks) upgraded to the
    * production loop: the coarse codebook is Lloyd-refined flat (it is
    * √C-sized — flat cost is n × √C, already sub-linear in C), then the
    * fine codebook is Lloyd-refined THROUGH the routed assignment
    * ([[Similarity.kmeansIterRouted]] — train/serve consistency: fine
    * centroids compete only within their coarse route at training time
    * exactly as they will at query time), then the corpus is assigned
    * through [[Similarity.ivfAssignTwoLevel]] on the trained pair.
    * Total corpus cost: one flat √C argmax (coarse train) + two routed
    * 2√C argmaxes (fine train + serve) + two (cell, d) mean shuffles —
    * nothing n × C anywhere.
    *
    * Oracle: replays the coarse Lloyd step, the fine routing, the
    * routed fine Lloyd step, the re-routing of the refined fine
    * centroids, and the final two-level argmax — same cosine fold,
    * fixed-point-exact means, and score-then-higher-cell ties at every
    * stage. */
  val annIvfTwoLevelTrained = Q("ann_ivf_two_level_trained",
    s"""WITH cs AS (SELECT CAST(vec_id AS INT) AS cell, embedding AS c_vec
       |  FROM embeddings WHERE vec_id < 4),
       |asgc AS (SELECT n_id, cell, n_vec FROM (
       |  SELECT b.vec_id AS n_id, c.cell, b.embedding AS n_vec,
       |    ROW_NUMBER() OVER (PARTITION BY b.vec_id
       |      ORDER BY ${RegistryExt.sqlCos("b.embedding", "c.c_vec")} DESC, c.cell DESC) AS rn
       |  FROM embeddings b CROSS JOIN cs c) WHERE rn = 1),
       |cdm AS (SELECT cell, i AS d,
       |    CAST(SUM(CAST(round(CAST(n_vec[i] AS DOUBLE) * 1e10) AS BIGINT)) AS DOUBLE)
       |      / 1e10 / COUNT(n_vec[i]) AS m
       |  FROM asgc CROSS JOIN (SELECT unnest(range(1, 65)) AS i)
       |  GROUP BY cell, i),
       |coarse1 AS (SELECT cell AS ccell, list(m ORDER BY d) AS c_vec
       |  FROM cdm GROUP BY cell),
       |fs AS (SELECT CAST(vec_id AS INT) AS cell, embedding AS f_vec
       |  FROM embeddings WHERE vec_id < 16),
       |routed0 AS (SELECT cell, ccell, f_vec FROM (
       |  SELECT f.cell, c.ccell, f.f_vec,
       |    ROW_NUMBER() OVER (PARTITION BY f.cell
       |      ORDER BY ${RegistryExt.sqlCos("f.f_vec", "c.c_vec")} DESC, c.ccell DESC) AS rn
       |  FROM fs f CROSS JOIN coarse1 c) WHERE rn = 1),
       |cg AS (SELECT vec_id, ccell, embedding FROM (
       |  SELECT b.vec_id, c.ccell, b.embedding,
       |    ROW_NUMBER() OVER (PARTITION BY b.vec_id
       |      ORDER BY ${RegistryExt.sqlCos("b.embedding", "c.c_vec")} DESC, c.ccell DESC) AS rn
       |  FROM embeddings b CROSS JOIN coarse1 c) WHERE rn = 1),
       |asg0 AS (SELECT n_id, cell, n_vec FROM (
       |  SELECT a.vec_id AS n_id, f.cell, a.embedding AS n_vec,
       |    ROW_NUMBER() OVER (PARTITION BY a.vec_id
       |      ORDER BY ${RegistryExt.sqlCos("a.embedding", "f.f_vec")} DESC, f.cell DESC) AS rn
       |  FROM cg a JOIN routed0 f ON a.ccell = f.ccell) WHERE rn = 1),
       |fdm AS (SELECT cell, i AS d,
       |    CAST(SUM(CAST(round(CAST(n_vec[i] AS DOUBLE) * 1e10) AS BIGINT)) AS DOUBLE)
       |      / 1e10 / COUNT(n_vec[i]) AS m
       |  FROM asg0 CROSS JOIN (SELECT unnest(range(1, 65)) AS i)
       |  GROUP BY cell, i),
       |fine1 AS (SELECT cell, list(m ORDER BY d) AS f_vec
       |  FROM fdm GROUP BY cell),
       |routed1 AS (SELECT cell, ccell, f_vec FROM (
       |  SELECT f.cell, c.ccell, f.f_vec,
       |    ROW_NUMBER() OVER (PARTITION BY f.cell
       |      ORDER BY ${RegistryExt.sqlCos("f.f_vec", "c.c_vec")} DESC, c.ccell DESC) AS rn
       |  FROM fine1 f CROSS JOIN coarse1 c) WHERE rn = 1)
       |SELECT vec_id, ccell, cell, score FROM (
       |  SELECT a.vec_id, a.ccell, f.cell,
       |    ${RegistryExt.sqlCos("a.embedding", "f.f_vec")} AS score,
       |    ROW_NUMBER() OVER (PARTITION BY a.vec_id
       |      ORDER BY ${RegistryExt.sqlCos("a.embedding", "f.f_vec")} DESC,
       |        f.cell DESC) AS rn
       |  FROM cg a JOIN routed1 f ON a.ccell = f.ccell) WHERE rn = 1
       |ORDER BY vec_id""".stripMargin) { (s, d) =>
    val e = Tables.embeddings(s, d)
    val cSeeds = e.filter(col("vec_id") < 4)
      .select(col("vec_id").cast("int").as("cell"), col("embedding").as("c_vec"))
    // coarse codebook feeds BOTH training's routing and the final
    // assignment — checkpoint, or the coarse Lloyd step's corpus pass
    // re-runs per collectCodebook
    val coarse1 = Similarity.kmeansIter(e, cSeeds, "vec_id", "embedding")
      .select(col("cell").as("ccell"), col("c_vec"))
      .localCheckpoint()
    val fSeeds = e.filter(col("vec_id") < 16)
      .select(col("vec_id").cast("int").as("cell"), col("embedding").as("f_vec"))
    val fine1 = Similarity.kmeansIterRouted(e, coarse1, fSeeds,
      "vec_id", "embedding")
    Similarity.ivfAssignTwoLevel(e, coarse1, fine1, "vec_id", "embedding")
      .orderBy("vec_id")
  }

  /** The stored corpus (doc_id < 250) near-dup assets a production
    * nightly append READS rather than rebuilds: the cluster-label
    * ledger and the LSH band index — pure functions of `documents`,
    * staged once per (sf, content) exactly like q50/q51's layouts, so
    * the gated incremental rows measure the APPEND (the operator's
    * production shape), not a per-run corpus re-derivation. */
  private[queries] def corpusNearDupAssets(
      s: SparkSession, d: String): (DataFrame, DataFrame) = {
    val dir = FixtureCache.cached(d, "ccledger", 1, Seq("documents")) { tmp =>
      val corpus = Tables.documents(s, d).filter(col("doc_id") < 250)
      Dedup.bandedKeys(corpus, "doc_id", "text").coalesce(1)
        .write.mode("overwrite").parquet(tmp.resolve("bands.parquet").toString)
      corpus.select(col("doc_id").as("id"))
        .join(Dedup.connectedComponents(
            Dedup.minhashCandidates(corpus, "doc_id", "text"), "a_id", "b_id"),
          Seq("id"), "left")
        .select(col("id"), coalesce(col("cluster"), col("id")).as("cluster"))
        .coalesce(1)
        .write.mode("overwrite").parquet(tmp.resolve("ledger.parquet").toString)
    }
    (s.read.parquet(dir.resolve("ledger.parquet").toString),
      s.read.parquet(dir.resolve("bands.parquet").toString))
  }

  /** Candidate edges incident to `batch`: within-batch LSH pairs ∪
    * batch-vs-stored-index pairs (the probe half of
    * [[Dedup.minhashCandidatesAgainst]], against the PERSISTED band
    * index instead of re-banding the corpus). */
  private def batchIncidentEdges(batch: DataFrame, storedBands: DataFrame): DataFrame =
    Dedup.minhashCandidates(batch, "doc_id", "text")
      .union(Dedup.bandedKeys(batch, "doc_id", "text").alias("a")
        .join(storedBands.alias("b"),
          col("a.band") === col("b.band") && col("a.bk") === col("b.bk"))
        .select(col("a.id").as("a_id"), col("b.id").as("b_id"))
        .distinct())

  /** Incremental near-dup CLUSTER maintenance
    * ([[Dedup.connectedComponentsIncremental]]): the arriving batch's
    * candidate edges (within-batch [[Dedup.minhashCandidates]] ∪
    * batch-vs-stored-band-index pairs) merge into the corpus's existing
    * label ledger WITHOUT corpus-wide re-propagation — propagation runs
    * on a super-node graph of touched labels, and the ledger is only
    * ever scanned map-side. This is the append-cost O(batch + frontier)
    * answer to `dedup_clusters`' O(corpus) nightly re-run; ledger and
    * band index are read from the staged fixture
    * ([[corpusNearDupAssets]]), the production posture.
    *
    * Output: the updated labeling restricted to TOUCHED components
    * (those holding ≥1 batch doc — exactly the rows an incremental
    * maintainer would UPDATE or INSERT; untouched components pass
    * through by construction, so gating the touched set is gating the
    * whole merge). Oracle: the full-corpus recursive-CTE closure —
    * batch-incident pairs are pair-local, so full-corpus labels and
    * incrementally-merged labels must agree exactly — restricted the
    * same way. */
  val dedupClustersIncremental = Q("dedup_clusters_incremental",
    """WITH RECURSIVE w AS (SELECT doc_id, string_split(text, ' ') AS wl FROM documents),
      |sh AS (SELECT doc_id, list_transform(range(1, len(wl) - 1),
      |  i -> wl[i] || ' ' || wl[i+1] || ' ' || wl[i+2]) AS shl FROM w),
      |sig AS (SELECT doc_id, list_transform(range(0, 8),
      |  j -> list_min(list_transform(shl,
      |    x -> substr(md5(CAST(j // 4 AS VARCHAR) || ':' || x),
      |                CAST((j % 4) * 8 + 1 AS INT), 8)))) AS mh
      |  FROM sh),
      |bands AS (SELECT doc_id, t.bnd, md5(mh[2*t.bnd+1] || mh[2*t.bnd+2]) AS bk
      |  FROM sig CROSS JOIN (SELECT unnest(range(0, 4)) AS bnd) t),
      |pairs AS (SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id
      |  FROM bands a JOIN bands b ON a.bnd = b.bnd AND a.bk = b.bk
      |    AND a.doc_id < b.doc_id),
      |edges AS (SELECT a_id AS s, b_id AS t FROM pairs
      |  UNION SELECT b_id, a_id FROM pairs),
      |reach(id, r) AS (
      |  SELECT s, s FROM edges
      |  UNION
      |  SELECT e.s, reach.r FROM edges e JOIN reach ON reach.id = e.t),
      |lbl AS (SELECT id, MIN(r) AS cl FROM reach GROUP BY id),
      |alldocs AS (SELECT d.doc_id, COALESCE(l.cl, d.doc_id) AS cluster_id
      |  FROM documents d LEFT JOIN lbl l ON d.doc_id = l.id)
      |SELECT doc_id, cluster_id FROM alldocs
      |WHERE cluster_id IN (SELECT cluster_id FROM alldocs WHERE doc_id >= 250)
      |ORDER BY doc_id""".stripMargin) { (s, d) =>
    val all = Tables.documents(s, d)
    val batch = all.filter(col("doc_id") >= 250)
    // ledger + band index read from the staged fixture — the assets a
    // production append reads from storage (parquet reads, so the
    // operator's two ledger passes re-scan files, not a CC build)
    val (ledger, storedBands) = corpusNearDupAssets(s, d)
    val updated = Dedup.connectedComponentsIncremental(ledger,
      batch.select(col("doc_id")), "doc_id",
      batchIncidentEdges(batch, storedBands), "a_id", "b_id")
    val touched = updated.filter(col("id") >= 250)
      .select(col("cluster")).distinct()
    updated.join(broadcast(touched), Seq("cluster"))
      .select(col("id").as("doc_id"), col("cluster").as("cluster_id"))
      .orderBy("doc_id")
  }

  /** Range layout under the gate ([[graft.operators.Layout
    * .layoutOptimize]]): lineitem is rewritten range-partitioned +
    * sorted on `l_orderkey` (staged once per (sf, content) — the write
    * is the paid-once half, exactly q50/q51's treatment), then a
    * key-range query runs against the optimized copy with TWO hard
    * witnesses: per-file min/max ranges must be pairwise disjoint
    * ([[graft.operators.Layout.requireDisjointRanges]] — the property
    * file skipping needs), and the range predicate must reach the scan
    * as PushedFilters (the row-group-skipping hook; same
    * throw-don't-trust discipline as q51's PartitionFilters witness).
    * This is the third layout axis next to q50's bucketing (equi-join
    * keys) and q51's hive partitioning (low-cardinality columns): range
    * predicates over a high-cardinality numeric key — and the gated
    * form of the round-8 scan-memory-floor fix (SCALE.md: row-group
    * bytes × scan threads ≤ heap; fix layout at the WRITER).
    *
    * Oracle: the layout must be semantically invisible — the same
    * filter + aggregate over the raw table. */
  val q52LayoutOptimize = Q("q52_layout_optimize",
    """SELECT l_returnflag, COUNT(*) AS cnt,
      |  CAST(ROUND(SUM(CAST(l_quantity AS DECIMAL(30,10))), 4) AS DOUBLE) AS sum_qty
      |FROM lineitem WHERE l_orderkey BETWEEN 1000 AND 2000
      |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin) { (s, d) =>
    val outDir = FixtureCache.cached(d, "layout", 1, Seq("lineitem")) { tmp =>
      graft.operators.Layout.layoutOptimize(
        Tables.lineitem(s, d), col("l_orderkey"),
        tmp.resolve("lineitem_opt.parquet").toString, numFiles = 8)
    }.resolve("lineitem_opt.parquet").toString
    graft.operators.Layout.requireDisjointRanges(s, outDir, "l_orderkey")
    val out = s.read.parquet(outDir)
      .filter(col("l_orderkey").between(1000, 2000))
      .groupBy("l_returnflag")
      .agg(count(lit(1)).as("cnt"),
        graft.functions.AggFns.dsum(col("l_quantity")).as("sum_qty"))
      .orderBy("l_returnflag")
    val plan = out.queryExecution.executedPlan.toString
    if (!"PushedFilters: \\[[^\\]]*l_orderkey".r.findFirstIn(plan).isDefined)
      throw new IllegalStateException(
        s"range predicate did not reach the scan as a PushedFilter:\n$plan")
    out
  }

  /** Late data under the gate — the one streaming branch every prior
    * drain deliberately avoided (time-ordered pages ⇒ nothing ever
    * late): pages arrive Q1, Q2, Q4, spacer, **Q3** — the third
    * time-quartile STRAGGLES two batches behind the fourth — under a
    * 1-second watermark delay, so when Q3's rows arrive the late-event
    * watermark already sits at max(ts) − 1 s and every Q3 row whose
    * hour window has been finalized is genuinely DROPPED (append-mode
    * aggregation). The spacer batch matters: Spark filters late events
    * against the watermark as of the PREVIOUS batch (one-batch lag, so
    * rows arriving in the same batch that advances the watermark are
    * never dropped — measured on 4.1.2: a straggler immediately after
    * the advancing batch passes through and its finalized windows
    * re-emit); a max-ts spacer row ages the advance by one batch
    * without moving it. The drop is witnessed, not assumed: the drain
    * reads `numRowsDroppedByWatermark` from StreamingQueryProgress and
    * the query THROWS if it is zero ([[StreamHarness.drainWithDrops]]);
    * StreamingOpsSpec asserts the exact count. A far-future `fence`
    * page closes every real window (fence/spacer rows group under the
    * 'fence' key and are filtered — the evict gate's driver-row
    * pattern).
    *
    * Determinism: quartiles come from ntile(4) over the unique
    * (ts, event_id) order; the late-filter watermark when the straggler
    * arrives is exactly trunc_ms(max ts) − 1 s (watermarks are
    * millisecond floors); hour-window ends are whole hours. The late
    * set is therefore a CLOSED-FORM predicate both engines can
    * evaluate: q = 3 AND window_end ≤ trunc_ms(max ts) − 1 s — and
    * every ACCEPTED Q3 row's window is provably still live (its end
    * exceeds the same watermark eviction uses), so nothing double-
    * emits. Oracle: the batch windowed count over exactly the
    * surviving rows. Production keeps the same operator and knob; this
    * gate witnesses the drop accounting a 100 TB ingest must monitor
    * (late rows at scale are data loss you have to SEE, not a branch
    * you hope never runs). */
  val streamingLateDrop = Q("streaming_late_drop",
    """WITH e AS (SELECT event_id, event_type, ts,
      |    ntile(4) OVER (ORDER BY ts, event_id) AS q
      |  FROM events WHERE ts IS NOT NULL),
      |mx AS (SELECT max(ts) AS mt FROM e),
      |keep AS (SELECT e.* FROM e CROSS JOIN mx
      |  WHERE NOT (q = 3 AND date_trunc('hour', ts) + INTERVAL 1 HOUR
      |             <= date_trunc('millisecond', mt) - INTERVAL 1 SECOND))
      |SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS ws,
      |  event_type, COUNT(*) AS cnt
      |FROM keep GROUP BY 1, 2 ORDER BY ws, event_type""".stripMargin) { (s, d) =>
    val (table, dropped) = lateDropRun(s, d)
    if (dropped == 0L) throw new IllegalStateException(
      "late-drop gate is vacuous: the watermark dropped nothing — " +
        "straggler staging or delay regressed")
    table
  }

  /** The late-drop drain itself: (surviving windowed counts, rows the
    * watermark dropped). Split from the Q so StreamingOpsSpec can
    * assert the EXACT drop count against the closed-form late set. */
  private[graft] def lateDropRun(s: SparkSession, d: String): (DataFrame, Long) = {
    import s.implicits._
    val pages = FixtureCache.cached(d, "slate", 2, Seq("events")) { tmp =>
      val w = org.apache.spark.sql.expressions.Window.orderBy("ts_us", "event_id")
      val e = Tables.events(s, d).filter(col("ts").isNotNull)
        .select(col("event_id"), col("event_type"),
          unix_micros(col("ts")).as("ts_us"))
        .withColumn("q", ntile(4).over(w))
      // runs once at fixture-build time, not per query (the evict gate's
      // accepted pattern); the fence must outrun every window + delay
      val maxUs = e.agg(max("ts_us")).head().getLong(0)
      val staged = e.select(col("event_id"), col("event_type"), col("ts_us"),
          when(col("q") === 1, 0).when(col("q") === 2, 1)
            .when(col("q") === 4, 2).otherwise(4).as("page"))
        .unionByName(Seq(
          (-2L, "fence", maxUs, 3), // spacer: ages the watermark advance
          (-1L, "fence", maxUs + 4L * 3600 * 1000000, 5))
          .toDF("event_id", "event_type", "ts_us", "page"))
      Registry6.stageOrderedPages(staged, "page", 6, tmp)
    }.resolve("pages").toString
    val stage = StreamHarness.runDir("graft_slate")
    val stream = s.readStream
      .schema("event_id LONG, event_type STRING, ts_us LONG")
      .option("maxFilesPerTrigger", "1").json(pages)
      .select(timestamp_micros(col("ts_us")).as("ts"), col("event_type"))
    val counts = graft.streaming.StreamingOps.tumblingCounts(
      stream, "ts", "event_type", watermark = "1 second")
    val (table, dropped) = StreamHarness.drainWithDrops(
      counts, stage, org.apache.spark.sql.streaming.OutputMode.Append)
    (table.filter(col("event_type") =!= "fence")
      .select(graft.functions.TimeFns.tsString(col("ws")).as("ws"),
        col("event_type"), col("cnt"))
      .orderBy("ws", "event_type"), dropped)
  }

  val round9: Seq[Q] = Seq(annIvfTwoLevelTrained, dedupClustersIncremental,
    q52LayoutOptimize, streamingLateDrop)
}
