package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.operators.{Dedup, Retrieval, Similarity, Vocab}

/** Round-15 additions: adaptive filtered vector search, graph-ledger
  * re-bucketing, the shared text analyzer, the semantic family's
  * arrival face, and the mid-path BPE trainer — the round-14 verdict's
  * prescriptions, each under the oracle gate.
  *
  * Reference (jurimetria-etl) has no ANN/text-index surface; these are
  * the LLM-training-data extensions (brief §"Beyond the reference").
  */
object Registry15 {

  private def docs(s: SparkSession, d: String) = Tables.documents(s, d)
  private def emb(s: SparkSession, d: String) = Tables.embeddings(s, d)

  // -------------------------------------------- filtered ANN, adaptive

  /** Filtered vector search with ADAPTIVE PROBE WIDENING
    * ([[Similarity.ivfPqTopKFromIndexAdaptive]]): the
    * `ann_filtered_indexed_topk` face under a ~1%-selectivity
    * predicate (label = 7 AND vec_id % 5 = 0), where a FIXED
    * nProbe = 4 of 16 starves — the probed cells hold almost none of
    * the allowed rows and recall silently collapses (the round-14
    * verdict's caveat). The widening rule keeps a cell at probe rank r
    * iff r ≤ nProbe OR the cumulative allowed count over better ranks
    * is still below k, so each query probes exactly as far as its
    * filtered candidate supply requires; a filter whose whole allowed
    * set is below the floor degrades to brute-force-over-survivors
    * (every allowed cell probed) — the fallback as the rule's fixed
    * point. The oracle replays the per-cell allowed counts, the
    * cosine-ranked probe list with its 1-PRECEDING cumulative-sum
    * window, the widened keep rule, and the restricted ADC ranking. */
  val annFilteredAdaptiveTopK = Q("ann_filtered_adaptive_topk",
    s"""WITH ${Registry10.sqlPqCodes},
       |qd AS (SELECT q.vec_id AS q_id, js.j AS sub, c.code,
       |    ${Registry10.sqlSubDist("q.embedding", "c.w", "js.j")} AS dist
       |  FROM embeddings q CROSS JOIN js CROSS JOIN cw c
       |  WHERE q.vec_id < 5),
       |cent AS (SELECT CAST(vec_id AS INT) AS cell, embedding AS c_vec
       |  FROM embeddings WHERE vec_id < 16),
       |asg AS (SELECT n_id, cell FROM (
       |  SELECT b.vec_id AS n_id, c.cell, ROW_NUMBER() OVER (
       |    PARTITION BY b.vec_id
       |    ORDER BY ${Registry10.sqlCos("b.embedding", "c.c_vec")} DESC,
       |      c.cell DESC) AS rn
       |  FROM embeddings b CROSS JOIN cent c) WHERE rn = 1),
       |alw AS (SELECT vec_id AS n_id FROM embeddings
       |  WHERE label = 7 AND vec_id % 5 = 0),
       |lg AS (SELECT a.n_id, a.cell FROM asg a JOIN alw USING (n_id)),
       |acnt AS (SELECT cell, COUNT(*) AS cnt FROM lg GROUP BY 1),
       |prb AS (SELECT q.vec_id AS q_id, c.cell, ROW_NUMBER() OVER (
       |    PARTITION BY q.vec_id
       |    ORDER BY ${Registry10.sqlCos("q.embedding", "c.c_vec")} DESC,
       |      c.cell DESC) AS prb
       |  FROM embeddings q CROSS JOIN cent c WHERE q.vec_id < 5),
       |prw AS (SELECT q_id, cell FROM (
       |  SELECT p.q_id, p.cell, p.prb,
       |    COALESCE(SUM(COALESCE(ac.cnt, 0)) OVER (PARTITION BY p.q_id
       |      ORDER BY p.prb
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cumb
       |  FROM prb p LEFT JOIN acnt ac USING (cell))
       |  WHERE prb <= 4 OR cumb < 5),
       |cand AS (SELECT p.q_id, l.n_id FROM prw p JOIN lg l USING (cell)
       |  WHERE p.q_id <> l.n_id),
       |adc AS (SELECT x.q_id, x.n_id,
       |    list_reduce(list_prepend(0.0, list(x.dist ORDER BY x.sub)),
       |      (u, y) -> u + y) AS adc
       |  FROM (SELECT c2.q_id, c2.n_id, q.sub, q.dist
       |    FROM cand c2 JOIN codes n ON n.n_id = c2.n_id
       |    JOIN qd q ON q.q_id = c2.q_id AND q.sub = n.sub
       |      AND q.code = n.code) x
       |  GROUP BY x.q_id, x.n_id),
       |r AS (SELECT q_id, n_id, adc, CAST(ROW_NUMBER() OVER (
       |  PARTITION BY q_id ORDER BY adc ASC, n_id ASC) AS BIGINT) AS rnk
       |  FROM adc)
       |SELECT q_id, n_id, rnk, adc FROM r WHERE rnk <= 5
       |ORDER BY q_id, rnk""".stripMargin) { (s, d) =>
    val (e, cent, cb) = Registry10.ivfPqSparkInputs(s, d)
    val ledger = Similarity.pqIndexBuild(e, cent, cb, "vec_id", "embedding")
    val allowed = e.filter(col("label") === 7 && col("vec_id") % 5 === 0)
      .select("vec_id")
    Similarity.ivfPqTopKFromIndexAdaptive(e.filter(col("vec_id") < 5),
      ledger.join(allowed, Seq("vec_id"), "left_semi"), cent, cb,
      "vec_id", "embedding", k = 5, nProbe = 4)
      .withColumn("rnk", col("rnk").cast("long"))
      .orderBy("q_id", "rnk")
  }

  // -------------------------------------------- ledger re-bucketing

  /** Live-ledger RE-BUCKETING ([[Similarity.rebucketLedger]]): the
    * gsink write law's "size B ∝ corpus" prescription, executable —
    * the fixed 200-node kNN-graph ledger is written bucket-partitioned
    * at B = 16 (the `streaming_graph_ingest` layout), read back LIVE
    * from parquet, re-bucketed to B′ = 64, written partitionBy("bkt")
    * to a new path (the migration protocol: never overwrite in place —
    * old and new numberings would interleave), and read back again.
    * The gate proves the migration is a pure recompute: every
    * (src_id, nbr_id, cos) row survives IDENTICALLY and only `bkt` is
    * re-derived as pmod(src_id, 64) — the oracle builds the same graph
    * and computes the same pmod directly, so any row lost, duplicated,
    * or re-valued by the round-trip breaks the hash. ScaleProbe's
    * gsink family measures the payoff (batch-sized writes restored
    * after corpus growth); this gate pins the identity. */
  val annGraphRebucket = Q("ann_graph_rebucket",
    s"""WITH ${Registry12.sqlKnnGraph}
       |SELECT src_id, nbr_id, cos,
       |  CAST(src_id % 64 AS INT) AS bkt
       |FROM g ORDER BY src_id, nbr_id""".stripMargin) { (s, d) =>
    val e = emb(s, d).filter(col("vec_id") < 200)
    val cent = e.filter(col("vec_id") === 0)
      .select(lit(0).cast("int").as("cell"), col("embedding").as("c_vec"))
    val g0 = Similarity.knnGraph(e, cent, "vec_id", "embedding", k = 3)
      .select("src_id", "nbr_id", "cos")
    val stage = StreamHarness.runDir("graft_rebucket")
    val oldDir = stage.resolve("b16").toString
    val newDir = stage.resolve("b64").toString
    g0.withColumn("bkt", pmod(col("src_id"), lit(16L)).cast("int"))
      .write.partitionBy("bkt").mode("overwrite").parquet(oldDir)
    val live = s.read.parquet(oldDir)
    Similarity.rebucketLedger(live, "src_id", buckets = 64)
      .write.partitionBy("bkt").mode("overwrite").parquet(newDir)
    s.read.parquet(newDir)
      .select(col("src_id"), col("nbr_id"), col("cos"), col("bkt"))
      .orderBy("src_id", "nbr_id")
  }

  val round15: Seq[Q] = Seq(annFilteredAdaptiveTopK, annGraphRebucket)
}
