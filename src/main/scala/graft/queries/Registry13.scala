package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.operators.{Retrieval, Similarity}

/** Round-13: the quality lift for the PQ family (multi-step Lloyd to
  * assignment fixpoint, OPQ-lite variance-balancing permutation), the
  * graph index's missing maintenance faces (takedown repair, streaming
  * arrival), the composed retrieval pipelines the scaladocs promised
  * (ANN shortlist → MaxSim re-rank, BM25 ⊕ stored-IVF-PQ fusion), and
  * BPE-merge vocabulary training. Ref: the reference has none of this
  * surface (its queries are aggregate charts,
  * src/jurimetria_pipeline.py:44-296); these are the LLM-data-pipeline
  * extension operators the builder brief names. */
object Registry13 {

  private def emb(s: SparkSession, d: String) = Tables.embeddings(s, d)
  private def docs(s: SparkSession, d: String) = Tables.documents(s, d)

  // ---------------------------------------------------- PQ quality lift

  /** Per-subspace (sub, code, w8) seed codebook + its argmin codes —
    * the w8-sliced form of [[Registry10.sqlPqCodes]], the shape every
    * unrolled Lloyd step consumes and produces. */
  private def sqlPqW8Seed: String =
    s"""cw AS (SELECT CAST(vec_id AS INT) AS code, embedding AS w
       |  FROM embeddings WHERE vec_id < 16),
       |js AS (SELECT unnest(range(0, 8)) AS j),
       |ts AS (SELECT unnest(range(1, 9)) AS t),
       |cw0 AS (SELECT s.j AS sub, c.code, list_transform(range(1, 9),
       |    u -> CAST(c.w[s.j*8 + u] AS DOUBLE)) AS w8
       |  FROM cw c CROSS JOIN js s),
       |${sqlPqStepCodes("cw0", "cd0", "codes0")}""".stripMargin

  /** Argmin encode of the whole corpus against per-subspace codebook
    * CTE `cwCte` (dist ASC, code ASC ≡ the expression's strict-< left
    * scan). */
  private def sqlPqStepCodes(cwCte: String, cdCte: String,
                             codesCte: String): String =
    s"""$cdCte AS (SELECT b.vec_id AS n_id, c.sub, c.code,
       |    ${Registry10.sqlSubDist8("b.embedding", "c.sub", "c.w8")} AS dist
       |  FROM embeddings b CROSS JOIN $cwCte c),
       |$codesCte AS (SELECT n_id, sub, code, dist FROM (
       |  SELECT n_id, sub, code, dist, ROW_NUMBER() OVER (
       |    PARTITION BY n_id, sub ORDER BY dist ASC, code ASC) AS rn
       |  FROM $cdCte) WHERE rn = 1)""".stripMargin

  /** One unrolled Lloyd step `i`: fixed-point-exact means over the
    * previous step's assignment, COALESCE to the previous weights for
    * unwon codewords, re-encode. Mirrors one iteration of
    * [[Similarity.pqCodebookTrain]] bit-for-bit. */
  private def sqlPqLloydStep(codesIn: String, cwIn: String, i: Int): String =
    s"""tm$i AS (SELECT n.sub, n.code, s.t,
       |    CAST(SUM(CAST(round(CAST(b.embedding[n.sub*8 + s.t] AS DOUBLE) * 1e10)
       |      AS BIGINT)) AS DOUBLE)
       |      / 1e10 / COUNT(b.embedding[n.sub*8 + s.t]) AS mn
       |  FROM $codesIn n JOIN embeddings b ON b.vec_id = n.n_id CROSS JOIN ts s
       |  GROUP BY n.sub, n.code, s.t),
       |tw$i AS (SELECT sub, code, list(mn ORDER BY t) AS w FROM tm$i
       |  GROUP BY sub, code),
       |cw$i AS (SELECT c.sub, c.code, COALESCE(t.w, c.w8) AS w8
       |  FROM $cwIn c LEFT JOIN tw$i t ON t.sub = c.sub AND t.code = c.code),
       |${sqlPqStepCodes(s"cw$i", s"cd$i", s"codes$i")}""".stripMargin

  /** Fixpoint-trained product quantization
    * ([[Similarity.pqCodebookTrain]] `toFixpoint`): Lloyd steps run
    * until the corpus ASSIGNMENT repeats (bounded at 3 here) — at the
    * fixpoint the fixed-point-exact means recompute over identical
    * groups, so every further step is bit-for-bit a no-op, which is
    * exactly why a fixpoint-bounded train can gate against an oracle
    * that unrolls the FULL step count unconditionally: stop early or
    * run long, the codebook is identical. The oracle chains three full
    * Lloyd steps (means → COALESCE for unwon codewords → re-encode)
    * and emits the final encode. PqSpec proves reconstruction error is
    * monotone over the chain; the RecallReport row measures the recall
    * this buys over the one-step `ann_pq_trained`. */
  val annPqTrainedFix = Q("ann_pq_trained_fix",
    s"""WITH $sqlPqW8Seed,
       |${sqlPqLloydStep("codes0", "cw0", 1)},
       |${sqlPqLloydStep("codes1", "cw1", 2)},
       |${sqlPqLloydStep("codes2", "cw2", 3)}
       |SELECT n_id AS vec_id,
       |  array_to_string(list(CAST(code AS INT) ORDER BY sub), ',') AS codes,
       |  list_reduce(list_prepend(0.0, list(dist ORDER BY sub)),
       |    (x, y) -> x + y) AS err
       |FROM codes3 GROUP BY n_id ORDER BY vec_id""".stripMargin) { (s, d) =>
    val e = emb(s, d)
    val trained = Similarity.pqCodebookTrain(e,
      Similarity.pqCodebookSeed(e, "vec_id", "embedding",
        m = 8, ksub = 16, subDim = 8),
      "vec_id", "embedding", steps = 3, toFixpoint = true)
    Similarity.pqEncode(e, trained, "vec_id", "embedding")
      .withColumn("codes", array_join(col("codes"), ","))
      .orderBy("vec_id")
  }

  /** OPQ-lite permuted PQ ([[Similarity.opqPermutation]] →
    * [[Similarity.permuteVectors]] → seed PQ → ADC top-k): dimensions
    * rank by fixed-point-exact variance and deal to the 8 subspaces in
    * snake order, so each subspace receives one dimension from every
    * variance band — the OPQ balancing idea (Ge et al., CVPR 2013)
    * without the rotation matrix, deterministic and exactly
    * replayable. Corpus AND queries permute identically; full-vector
    * distances are permutation-invariant, so the ranking lives in the
    * same metric space and only the quantizer's subspace partition
    * changes. The oracle replays the moment sums, the variance rank
    * (ties to the lower dimension), the snake closed form
    * ((r DIV m) even → lane r%m, odd → m−1−r%m; slot = r DIV m), the
    * element-wise permutation, and `ann_pq_topk`'s whole ADC algebra
    * over the permuted vectors. */
  val annOpqTopK = Q("ann_opq_topk",
    s"""WITH mom AS (SELECT t.i - 1 AS d,
       |    CAST(SUM(CAST(round(CAST(b.embedding[t.i] AS DOUBLE) * 1e10)
       |      AS BIGINT)) AS DOUBLE) / 1e10 / COUNT(b.embedding[t.i]) AS m1,
       |    CAST(SUM(CAST(round(CAST(b.embedding[t.i] AS DOUBLE)
       |      * CAST(b.embedding[t.i] AS DOUBLE) * 1e10)
       |      AS BIGINT)) AS DOUBLE) / 1e10 / COUNT(b.embedding[t.i]) AS m2
       |  FROM embeddings b CROSS JOIN (SELECT unnest(range(1, 65)) AS i) t
       |  GROUP BY t.i),
       |vr AS (SELECT d, m2 - m1 * m1 AS vr FROM mom),
       |rk AS (SELECT d, ROW_NUMBER() OVER (ORDER BY vr DESC, d ASC) - 1 AS r
       |  FROM vr),
       |perm AS (SELECT d,
       |    (CASE WHEN (r // 8) % 2 = 0 THEN r % 8 ELSE 7 - (r % 8) END) * 8
       |      + (r // 8) AS pos
       |  FROM rk),
       |pe AS (SELECT b.vec_id, list(b.embedding[p.d + 1] ORDER BY p.pos) AS pemb
       |  FROM embeddings b CROSS JOIN perm p GROUP BY b.vec_id),
       |cw AS (SELECT CAST(vec_id AS INT) AS code, pemb AS w
       |  FROM pe WHERE vec_id < 16),
       |js AS (SELECT unnest(range(0, 8)) AS j),
       |cd AS (SELECT b.vec_id AS n_id, js.j AS sub, c.code,
       |    ${Registry10.sqlSubDist("b.pemb", "c.w", "js.j")} AS dist
       |  FROM pe b CROSS JOIN js CROSS JOIN cw c),
       |codes AS (SELECT n_id, sub, code FROM (
       |  SELECT n_id, sub, code, ROW_NUMBER() OVER (
       |    PARTITION BY n_id, sub ORDER BY dist ASC, code ASC) AS rn
       |  FROM cd) WHERE rn = 1),
       |qd AS (SELECT q.vec_id AS q_id, js.j AS sub, c.code,
       |    ${Registry10.sqlSubDist("q.pemb", "c.w", "js.j")} AS dist
       |  FROM pe q CROSS JOIN js CROSS JOIN cw c
       |  WHERE q.vec_id < 5),
       |adc AS (SELECT q.q_id, n.n_id,
       |    list_reduce(list_prepend(0.0, list(q.dist ORDER BY q.sub)),
       |      (x, y) -> x + y) AS adc
       |  FROM codes n JOIN qd q ON q.sub = n.sub AND q.code = n.code
       |  WHERE q.q_id <> n.n_id
       |  GROUP BY q.q_id, n.n_id),
       |r AS (SELECT q_id, n_id, adc, CAST(ROW_NUMBER() OVER (
       |  PARTITION BY q_id ORDER BY adc ASC, n_id ASC) AS BIGINT) AS rnk
       |  FROM adc)
       |SELECT q_id, n_id, rnk, adc FROM r WHERE rnk <= 5
       |ORDER BY q_id, rnk""".stripMargin) { (s, d) =>
    val e = emb(s, d)
    val perm = Similarity.opqPermutation(e, "embedding", dim = 64, m = 8)
    val pe = Similarity.permuteVectors(e, "embedding", perm)
    val cb = Similarity.pqCodebookSeed(pe, "vec_id", "embedding",
      m = 8, ksub = 16, subDim = 8)
    Similarity.pqTopK(pe.filter(col("vec_id") < 5), pe, cb,
      "vec_id", "embedding", k = 5)
      .withColumn("rnk", col("rnk").cast("long"))
      .orderBy("q_id", "rnk")
  }

  val round13: Seq[Q] = Seq(annPqTrainedFix, annOpqTopK)
}
