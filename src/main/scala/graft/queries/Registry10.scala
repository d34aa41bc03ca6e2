package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.operators.Similarity

/** Rounds 11–12: the product-quantization ANN family — the memory face
  * of vector search at 10⁹ vectors (codes, not floats, ride the scan),
  * from raw encode through trained, routed, residual, re-ranked, and
  * graph forms. The mixing faces live in [[Registry11]]. */
object Registry10 {

  private def emb(s: SparkSession, d: String) = Tables.embeddings(s, d)

  /** DuckDB left-fold cosine (Registry2's shape — same fold order as
    * [[graft.functions.VectorFns.dotN]]/l2NormN). */
  private def sqlDot(a: String, b: String): String =
    s"""list_reduce(list_prepend(0.0, list_transform(range(1, 65),
       |    i -> CAST($a[i] AS DOUBLE) * CAST($b[i] AS DOUBLE))), (x, y) -> x + y)""".stripMargin
  private[queries] def sqlCos(a: String, b: String): String =
    s"""(${sqlDot(a, b)} / (sqrt(${sqlDot(a, a)}) * sqrt(${sqlDot(b, b)})))"""

  /** DuckDB squared-L2 between subspace j (0-based, width 8) of two
    * FLOAT[64] lists: left fold from 0.0, difference squared by
    * self-multiplication (pow()'s libm rounding is not cross-engine
    * stable; x*x is IEEE-exact). Mirrors [[graft.expressions.PqCodes]]. */
  private[queries] def sqlSubDist(a: String, b: String, j: String): String =
    s"""list_reduce(list_prepend(0.0, list_transform(range(1, 9),
       |  t -> (CAST($a[$j*8 + t] AS DOUBLE) - CAST($b[$j*8 + t] AS DOUBLE))
       |     * (CAST($a[$j*8 + t] AS DOUBLE) - CAST($b[$j*8 + t] AS DOUBLE)))),
       |  (x, y) -> x + y)""".stripMargin

  /** Shared oracle CTEs: the seed-rule PQ codebook (codeword c of
    * subspace j = sub-vector j of the vector with vec_id c, c < 16 —
    * always the ORIGINAL embeddings, a pinned quantizer never moves)
    * and every `corpus` vector's per-subspace argmin codes (`corpus`
    * defaults to the raw table; the upsert gate passes its modified
    * CTE). */
  private[queries] def sqlPqCodes: String = sqlPqCodesOver("embeddings")
  private[queries] def sqlPqCodesOver(corpus: String): String =
    s"""cw AS (SELECT CAST(vec_id AS INT) AS code, embedding AS w
       |  FROM embeddings WHERE vec_id < 16),
       |js AS (SELECT unnest(range(0, 8)) AS j),
       |cd AS (SELECT b.vec_id AS n_id, js.j AS sub, c.code,
       |    ${sqlSubDist("b.embedding", "c.w", "js.j")} AS dist
       |  FROM $corpus b CROSS JOIN js CROSS JOIN cw c),
       |codes AS (SELECT n_id, sub, code, dist FROM (
       |  SELECT n_id, sub, code, dist, ROW_NUMBER() OVER (
       |    PARTITION BY n_id, sub ORDER BY dist ASC, code ASC) AS rn
       |  FROM cd) WHERE rn = 1)""".stripMargin

  /** Product-quantization ENCODE under the gate
    * ([[Similarity.pqEncode]]): every corpus vector compressed to its
    * m=8 sub-codes (per-subspace argmin squared-L2 against the 16-entry
    * seed codebook) plus total squared reconstruction error — one
    * scalar projection over the corpus ([[graft.expressions.PqCodes]]),
    * no join, no shuffle; at 10⁹ vectors the stored index is 8 B/vector
    * against 256 B of raw floats. The oracle replays the argmin
    * (dist ASC, code ASC ≡ the expression's strict-< left scan) and the
    * subspace-order error fold, bit-for-bit. The codes array leaves the
    * engine as a comma-joined STRING on both sides — the gate's
    * canonicalizer sorts rows on every column, and raw array cells are
    * unsortable there (the q14/q36 convention, Registry.scala). */
  val annPqEncode = Q("ann_pq_encode",
    s"""WITH $sqlPqCodes
       |SELECT n_id AS vec_id,
       |  array_to_string(list(CAST(code AS INT) ORDER BY sub), ',') AS codes,
       |  list_reduce(list_prepend(0.0, list(dist ORDER BY sub)),
       |    (x, y) -> x + y) AS err
       |FROM codes GROUP BY n_id ORDER BY vec_id""".stripMargin) { (s, d) =>
    val e = emb(s, d)
    Similarity.pqEncode(e,
      Similarity.pqCodebookSeed(e, "vec_id", "embedding", m = 8, ksub = 16, subDim = 8),
      "vec_id", "embedding")
      .withColumn("codes", array_join(col("codes"), ","))
      .orderBy("vec_id")
  }

  /** PQ top-k via asymmetric distance computation
    * ([[Similarity.pqTopK]]): each query precomputes its 128-entry
    * distance table once, and every corpus candidate is scored from its
    * 8 CODES alone — m table reads, not a 64-wide dot product, over an
    * index 32× smaller than the raw floats. The oracle computes the
    * same quantity the table lookup reads: Σ_j l2²(query sub_j,
    * codeword(j, code_nj)), folded in subspace order. Approximate by
    * construction (distances are to RECONSTRUCTED vectors); ties break
    * to the lower neighbor id. */
  val annPqTopK = Q("ann_pq_topk",
    s"""WITH $sqlPqCodes,
       |qd AS (SELECT q.vec_id AS q_id, js.j AS sub, c.code,
       |    ${sqlSubDist("q.embedding", "c.w", "js.j")} AS dist
       |  FROM embeddings q CROSS JOIN js CROSS JOIN cw c
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
    Similarity.pqTopK(e.filter(col("vec_id") < 5), e,
      Similarity.pqCodebookSeed(e, "vec_id", "embedding", m = 8, ksub = 16, subDim = 8),
      "vec_id", "embedding", k = 5)
      .withColumn("rnk", col("rnk").cast("long"))
      .orderBy("q_id", "rnk")
  }

  /** Squared L2 between subspace `j` of full vector `a` and an 8-wide
    * DOUBLE codeword list `w8` — [[sqlSubDist]] with a pre-sliced right
    * side (trained codewords are stored per-subspace). */
  private[queries] def sqlSubDist8(a: String, j: String, w8: String): String =
    s"""list_reduce(list_prepend(0.0, list_transform(range(1, 9),
       |  t -> (CAST($a[$j*8 + t] AS DOUBLE) - $w8[t])
       |     * (CAST($a[$j*8 + t] AS DOUBLE) - $w8[t]))),
       |  (x, y) -> x + y)""".stripMargin

  /** TRAINED product quantization ([[Similarity.pqCodebookTrain]] →
    * [[Similarity.pqEncode]]): one per-subspace Lloyd step moves each
    * codeword to the fixed-point-exact mean of the sub-vectors it wins
    * under the seed codebook (codewords winning nothing keep their seed
    * weights — codes stay dense), then the corpus re-encodes against the
    * refined codebook. The oracle replays the identical journey: seed
    * argmin assignment, scale-10¹⁰ integer-sum means per (sub, code,
    * dim), COALESCE to the float→double seed weight for unwon codes,
    * re-encode with the same strict-< argmin and subspace-order error
    * fold — the `ann_ivf_kmeans` pattern, restricted to each subspace
    * slice. A spec ([[graft.operators.PqSpec]]) asserts total
    * reconstruction error strictly shrinks vs the seed codebook. */
  /** One-step trained codebook + corpus re-encode, shared by the two
    * trained-PQ oracles: `cw1` = (sub, code, w8) after one Lloyd step
    * (unwon codewords COALESCE to the float→double seed weight),
    * `codes1` = every corpus vector's argmin codes + distances against
    * cw1. Extends [[sqlPqCodes]]'s CTE chain. */
  private def sqlPqTrainedCodes: String =
    s"""ts AS (SELECT unnest(range(1, 9)) AS t),
       |tm AS (SELECT n.sub, n.code, s.t,
       |    CAST(SUM(CAST(round(CAST(b.embedding[n.sub*8 + s.t] AS DOUBLE) * 1e10)
       |      AS BIGINT)) AS DOUBLE)
       |      / 1e10 / COUNT(b.embedding[n.sub*8 + s.t]) AS mn
       |  FROM codes n JOIN embeddings b ON b.vec_id = n.n_id CROSS JOIN ts s
       |  GROUP BY n.sub, n.code, s.t),
       |tw AS (SELECT sub, code, list(mn ORDER BY t) AS w FROM tm
       |  GROUP BY sub, code),
       |cw1 AS (SELECT s.j AS sub, c.code,
       |    COALESCE(t.w, list_transform(range(1, 9),
       |      u -> CAST(c.w[s.j*8 + u] AS DOUBLE))) AS w8
       |  FROM cw c CROSS JOIN js s
       |  LEFT JOIN tw t ON t.sub = s.j AND t.code = c.code),
       |cd1 AS (SELECT b.vec_id AS n_id, c.sub, c.code,
       |    ${sqlSubDist8("b.embedding", "c.sub", "c.w8")} AS dist
       |  FROM embeddings b CROSS JOIN cw1 c),
       |codes1 AS (SELECT n_id, sub, code, dist FROM (
       |  SELECT n_id, sub, code, dist, ROW_NUMBER() OVER (
       |    PARTITION BY n_id, sub ORDER BY dist ASC, code ASC) AS rn
       |  FROM cd1) WHERE rn = 1)""".stripMargin

  val annPqTrained = Q("ann_pq_trained",
    s"""WITH $sqlPqCodes,
       |$sqlPqTrainedCodes
       |SELECT n_id AS vec_id,
       |  array_to_string(list(CAST(code AS INT) ORDER BY sub), ',') AS codes,
       |  list_reduce(list_prepend(0.0, list(dist ORDER BY sub)),
       |    (x, y) -> x + y) AS err
       |FROM codes1 GROUP BY n_id ORDER BY vec_id""".stripMargin) { (s, d) =>
    val e = emb(s, d)
    val trained = Similarity.pqCodebookTrain(e,
      Similarity.pqCodebookSeed(e, "vec_id", "embedding", m = 8, ksub = 16, subDim = 8),
      "vec_id", "embedding", steps = 1)
    Similarity.pqEncode(e, trained, "vec_id", "embedding")
      .withColumn("codes", array_join(col("codes"), ","))
      .orderBy("vec_id")
  }

  /** Shared oracle CTEs for the IVF-PQ composition: flat 16-cell
    * centroid set (the seed vectors double as centroids and codewords),
    * corpus cell assignment (argmax cosine, ties to the higher cell —
    * [[Similarity.ivfAssign]]'s rule), query probes (nProbe=4), each
    * query's per-(sub, code) distance table, and the ADC ranking
    * restricted to probed cells — the `ann_ivf_topk` restriction pattern
    * over `ann_pq_topk`'s scoring algebra. */
  private def sqlIvfPqRanked: String =
    s"""$sqlPqCodes,
       |qd AS (SELECT q.vec_id AS q_id, js.j AS sub, c.code,
       |    ${sqlSubDist("q.embedding", "c.w", "js.j")} AS dist
       |  FROM embeddings q CROSS JOIN js CROSS JOIN cw c
       |  WHERE q.vec_id < 5),
       |${sqlIvfAdcRank("codes", "qd")}""".stripMargin

  /** The routing + restricted-ADC half, parametrized over the corpus
    * CODES CTE and per-query distance-table CTE (seed vs trained
    * codebooks differ only in those two inputs). */
  private[queries] def sqlIvfAdcRank(codesCte: String, qdCte: String,
                                     candJoin: String = "",
                                     corpus: String = "embeddings"): String =
    s"""cent AS (SELECT CAST(vec_id AS INT) AS cell, embedding AS c_vec
       |  FROM embeddings WHERE vec_id < 16),
       |asg AS (SELECT n_id, cell FROM (
       |  SELECT b.vec_id AS n_id, c.cell, ROW_NUMBER() OVER (
       |    PARTITION BY b.vec_id
       |    ORDER BY ${sqlCos("b.embedding", "c.c_vec")} DESC, c.cell DESC) AS rn
       |  FROM $corpus b CROSS JOIN cent c) WHERE rn = 1),
       |probes AS (SELECT q_id, cell FROM (
       |  SELECT q.vec_id AS q_id, c.cell, ROW_NUMBER() OVER (
       |    PARTITION BY q.vec_id
       |    ORDER BY ${sqlCos("q.embedding", "c.c_vec")} DESC, c.cell DESC) AS rn
       |  FROM embeddings q CROSS JOIN cent c WHERE q.vec_id < 5) WHERE rn <= 4),
       |cand AS (SELECT p.q_id, a.n_id FROM probes p JOIN asg a USING (cell)
       |  $candJoin
       |  WHERE p.q_id <> a.n_id),
       |adc AS (SELECT x.q_id, x.n_id,
       |    list_reduce(list_prepend(0.0, list(x.dist ORDER BY x.sub)),
       |      (u, y) -> u + y) AS adc
       |  FROM (SELECT c2.q_id, c2.n_id, q.sub, q.dist
       |    FROM cand c2 JOIN $codesCte n ON n.n_id = c2.n_id
       |    JOIN $qdCte q ON q.q_id = c2.q_id AND q.sub = n.sub AND q.code = n.code) x
       |  GROUP BY x.q_id, x.n_id),
       |r AS (SELECT q_id, n_id, adc, CAST(ROW_NUMBER() OVER (
       |  PARTITION BY q_id ORDER BY adc ASC, n_id ASC) AS BIGINT) AS rnk
       |  FROM adc)""".stripMargin

  private[queries] def ivfPqSparkInputs(s: SparkSession, d: String) = {
    val e = emb(s, d)
    val cent = e.filter(col("vec_id") < 16)
      .select(col("vec_id").cast("int").as("cell"), col("embedding").as("c_vec"))
    val cb = Similarity.pqCodebookSeed(e, "vec_id", "embedding",
      m = 8, ksub = 16, subDim = 8)
    (e, cent, cb)
  }

  /** IVF-PQ composed top-k ([[Similarity.ivfPqTopK]], no re-rank): route
    * each query to its 4 best cells, ADC-score only cell-resident CODES
    * — the 10⁹-vector production shape where both the touched fraction
    * (nProbe/C) and the bytes per touched row (m codes, not 4·dim
    * floats) drop multiplicatively. Approximate on BOTH axes by
    * construction: routing recall (unprobed cells never score, as
    * `ann_ivf_topk`) and PQ reconstruction error (as `ann_pq_topk`). */
  val annIvfPqTopK = Q("ann_ivf_pq_topk",
    s"""WITH $sqlIvfPqRanked
       |SELECT q_id, n_id, rnk, adc FROM r WHERE rnk <= 5
       |ORDER BY q_id, rnk""".stripMargin) { (s, d) =>
    val (e, cent, cb) = ivfPqSparkInputs(s, d)
    Similarity.ivfPqTopK(e.filter(col("vec_id") < 5), e, cent, cb,
      "vec_id", "embedding", k = 5, nProbe = 4)
      .withColumn("rnk", col("rnk").cast("long"))
      .orderBy("q_id", "rnk")
  }

  /** IVF-PQ with EXACT re-rank ([[Similarity.ivfPqTopK]] rerank=10):
    * the top-10 ADC survivors per query re-score against RAW vectors
    * (exact cosine) and the final top-5 rank by cosine — the standard
    * two-stage retrieve that buys back PQ reconstruction error where
    * exactness matters, touching floats for survivors only. The oracle
    * extends the shared ADC ranking with the survivor re-join and
    * cosine re-rank (ties to the lower neighbor id). */
  val annIvfPqRerank = Q("ann_ivf_pq_rerank",
    s"""WITH $sqlIvfPqRanked,
       |surv AS (SELECT q_id, n_id FROM r WHERE rnk <= 10),
       |rr AS (SELECT s.q_id, s.n_id,
       |    ${sqlCos("q.embedding", "b.embedding")} AS cos
       |  FROM surv s JOIN embeddings q ON q.vec_id = s.q_id
       |  JOIN embeddings b ON b.vec_id = s.n_id),
       |r2 AS (SELECT q_id, n_id, cos, CAST(ROW_NUMBER() OVER (
       |  PARTITION BY q_id ORDER BY cos DESC, n_id ASC) AS BIGINT) AS rnk
       |  FROM rr)
       |SELECT q_id, n_id, rnk, cos FROM r2 WHERE rnk <= 5
       |ORDER BY q_id, rnk""".stripMargin) { (s, d) =>
    val (e, cent, cb) = ivfPqSparkInputs(s, d)
    Similarity.ivfPqTopK(e.filter(col("vec_id") < 5), e, cent, cb,
      "vec_id", "embedding", k = 5, nProbe = 4, rerank = 10)
      .withColumn("rnk", col("rnk").cast("long"))
      .orderBy("q_id", "rnk")
  }

  /** The full production configuration in one gate: TRAINED PQ codebook
    * (one Lloyd step) feeding the routed IVF-PQ scan — corpus codes and
    * query distance tables both against the refined codewords, ADC
    * restricted to the 4 probed cells of 16. The oracle swaps the seed
    * codes/tables for the trained ones (`codes1`, `qd1` over cw1) inside
    * the SAME routing + rank algebra ([[sqlIvfAdcRank]]) — training
    * changes the quantizer, never the dataflow. */
  val annIvfPqTrained = Q("ann_ivf_pq_trained",
    s"""WITH $sqlPqCodes,
       |$sqlPqTrainedCodes,
       |qd1 AS (SELECT q.vec_id AS q_id, c.sub, c.code,
       |    ${sqlSubDist8("q.embedding", "c.sub", "c.w8")} AS dist
       |  FROM embeddings q CROSS JOIN cw1 c WHERE q.vec_id < 5),
       |${sqlIvfAdcRank("codes1", "qd1")}
       |SELECT q_id, n_id, rnk, adc FROM r WHERE rnk <= 5
       |ORDER BY q_id, rnk""".stripMargin) { (s, d) =>
    val (e, cent, cb) = ivfPqSparkInputs(s, d)
    val trained = Similarity.pqCodebookTrain(e, cb, "vec_id", "embedding")
    Similarity.ivfPqTopK(e.filter(col("vec_id") < 5), e, cent, trained,
      "vec_id", "embedding", k = 5, nProbe = 4)
      .withColumn("rnk", col("rnk").cast("long"))
      .orderBy("q_id", "rnk")
  }

  /** RESIDUAL IVF-PQ ([[Similarity.residuals]] →
    * [[Similarity.ivfPqTopK]] residual=true): the index quantizes
    * r = v − centroid(cell) instead of raw vectors — the FAISS IVF-PQ
    * default, because residuals concentrate near the origin and the
    * same codebook budget covers a much smaller ball. The codebook is
    * the seed rule over the residuals of vectors 16–31 — NOT 0–15:
    * those ARE the centroids, each assigns to itself at cosine 1, so
    * their residuals are all-zero (a degenerate codebook that scores
    * every candidate identically). Each query computes one distance
    * table PER PROBED CELL (its residual lives in that cell's frame).
    * The oracle replays the whole residual frame: assignment, residual
    * subtraction (floats widened before the subtract — IEEE-identical
    * to zip_with), residual-seed codebook, per-cell query tables, and
    * the cell-matched ADC join (q's table for cell X scores only
    * candidates IN cell X). */
  val annIvfPqResidual = Q("ann_ivf_pq_residual",
    s"""WITH cent AS (SELECT CAST(vec_id AS INT) AS cell, embedding AS c_vec
       |  FROM embeddings WHERE vec_id < 16),
       |asg AS (SELECT n_id, cell FROM (
       |  SELECT b.vec_id AS n_id, c.cell, ROW_NUMBER() OVER (
       |    PARTITION BY b.vec_id
       |    ORDER BY ${sqlCos("b.embedding", "c.c_vec")} DESC, c.cell DESC) AS rn
       |  FROM embeddings b CROSS JOIN cent c) WHERE rn = 1),
       |rv AS (SELECT a.n_id, a.cell,
       |    list_transform(range(1, 65),
       |      i -> CAST(b.embedding[i] AS DOUBLE) - CAST(c.c_vec[i] AS DOUBLE)) AS v
       |  FROM asg a JOIN embeddings b ON b.vec_id = a.n_id
       |  JOIN cent c ON c.cell = a.cell),
       |rcw AS (SELECT CAST(n_id - 16 AS INT) AS code, v AS w FROM rv
       |  WHERE n_id >= 16 AND n_id < 32),
       |js AS (SELECT unnest(range(0, 8)) AS j),
       |cdr AS (SELECT r.n_id, js.j AS sub, c.code,
       |    ${sqlSubDist("r.v", "c.w", "js.j")} AS dist
       |  FROM rv r CROSS JOIN js CROSS JOIN rcw c),
       |codesr AS (SELECT n_id, sub, code FROM (
       |  SELECT n_id, sub, code, ROW_NUMBER() OVER (
       |    PARTITION BY n_id, sub ORDER BY dist ASC, code ASC) AS rn
       |  FROM cdr) WHERE rn = 1),
       |probes AS (SELECT q_id, cell FROM (
       |  SELECT q.vec_id AS q_id, c.cell, ROW_NUMBER() OVER (
       |    PARTITION BY q.vec_id
       |    ORDER BY ${sqlCos("q.embedding", "c.c_vec")} DESC, c.cell DESC) AS rn
       |  FROM embeddings q CROSS JOIN cent c WHERE q.vec_id < 5) WHERE rn <= 4),
       |qrv AS (SELECT p.q_id, p.cell,
       |    list_transform(range(1, 65),
       |      i -> CAST(q.embedding[i] AS DOUBLE) - CAST(c.c_vec[i] AS DOUBLE)) AS v
       |  FROM probes p JOIN embeddings q ON q.vec_id = p.q_id
       |  JOIN cent c ON c.cell = p.cell),
       |qdr AS (SELECT r.q_id, r.cell, js.j AS sub, c.code,
       |    ${sqlSubDist("r.v", "c.w", "js.j")} AS dist
       |  FROM qrv r CROSS JOIN js CROSS JOIN rcw c),
       |cand AS (SELECT p.q_id, a.n_id, a.cell FROM probes p
       |  JOIN asg a USING (cell) WHERE p.q_id <> a.n_id),
       |adc AS (SELECT x.q_id, x.n_id,
       |    list_reduce(list_prepend(0.0, list(x.dist ORDER BY x.sub)),
       |      (u, y) -> u + y) AS adc
       |  FROM (SELECT c2.q_id, c2.n_id, q.sub, q.dist
       |    FROM cand c2 JOIN codesr n ON n.n_id = c2.n_id
       |    JOIN qdr q ON q.q_id = c2.q_id AND q.cell = c2.cell
       |      AND q.sub = n.sub AND q.code = n.code) x
       |  GROUP BY x.q_id, x.n_id),
       |r AS (SELECT q_id, n_id, adc, CAST(ROW_NUMBER() OVER (
       |  PARTITION BY q_id ORDER BY adc ASC, n_id ASC) AS BIGINT) AS rnk
       |  FROM adc)
       |SELECT q_id, n_id, rnk, adc FROM r WHERE rnk <= 5
       |ORDER BY q_id, rnk""".stripMargin) { (s, d) =>
    val (e, cent, _) = ivfPqSparkInputs(s, d)
    val res = Similarity.residuals(e, cent, "vec_id", "embedding")
    val rcb = Similarity.pqCodebookSeed(
      res.filter(col("vec_id") >= 16 && col("vec_id") < 32)
        .withColumn("vec_id", col("vec_id") - 16),
      "vec_id", "rvec", m = 8, ksub = 16, subDim = 8)
    Similarity.ivfPqTopK(e.filter(col("vec_id") < 5), e, cent, rcb,
      "vec_id", "embedding", k = 5, nProbe = 4, residual = true)
      .withColumn("rnk", col("rnk").cast("long"))
      .orderBy("q_id", "rnk")
  }

  /** kNN graph over PQ CODES via SYMMETRIC distance computation
    * ([[Similarity.knnGraphPq]]): within each IVF cell, every pair is
    * scored from the two rows' CODES alone — one k×k codeword-distance
    * table per subspace, built once from the codebook, m reads per
    * pair. The graph build is SDC's home workload (the corpus is both
    * query and candidate set, so ADC's per-query tables would mean one
    * per corpus row). The oracle replays the same quantity the table
    * lookup reads: Σ_j l2²(codeword(j, a_j), codeword(j, b_j)), folded
    * in subspace order, over cell-diagonal pairs, ranked ascending with
    * ties to the lower neighbor. */
  val annKnnGraphPq = Q("ann_knn_graph_pq",
    s"""WITH $sqlPqCodes,
       |cent AS (SELECT CAST(vec_id AS INT) AS cell, embedding AS c_vec
       |  FROM embeddings WHERE vec_id < 16),
       |asg AS (SELECT n_id, cell FROM (
       |  SELECT b.vec_id AS n_id, c.cell, ROW_NUMBER() OVER (
       |    PARTITION BY b.vec_id
       |    ORDER BY ${sqlCos("b.embedding", "c.c_vec")} DESC, c.cell DESC) AS rn
       |  FROM embeddings b CROSS JOIN cent c) WHERE rn = 1),
       |sd AS (SELECT pa.n_id AS src_id, pb.n_id AS nbr_id, pa.sub,
       |    ${sqlSubDist("ca.w", "cb.w", "pa.sub")} AS dist
       |  FROM codes pa JOIN codes pb ON pb.sub = pa.sub
       |  JOIN asg aa ON aa.n_id = pa.n_id
       |  JOIN asg ab ON ab.n_id = pb.n_id AND ab.cell = aa.cell
       |  JOIN cw ca ON ca.code = pa.code
       |  JOIN cw cb ON cb.code = pb.code
       |  WHERE pa.n_id <> pb.n_id),
       |g AS (SELECT src_id, nbr_id,
       |    list_reduce(list_prepend(0.0, list(dist ORDER BY sub)),
       |      (x, y) -> x + y) AS sdc
       |  FROM sd GROUP BY src_id, nbr_id),
       |r AS (SELECT src_id, nbr_id, sdc, CAST(ROW_NUMBER() OVER (
       |  PARTITION BY src_id ORDER BY sdc ASC, nbr_id ASC) AS BIGINT) AS rnk
       |  FROM g)
       |SELECT src_id, nbr_id, rnk, sdc FROM r WHERE rnk <= 3
       |ORDER BY src_id, rnk""".stripMargin) { (s, d) =>
    val (e, cent, cb) = ivfPqSparkInputs(s, d)
    Similarity.knnGraphPq(e, cent, cb, "vec_id", "embedding", k = 3)
      .withColumn("rnk", col("rnk").cast("long"))
      .orderBy("src_id", "rnk")
  }

  val round11: Seq[Q] = Seq(annPqEncode, annPqTopK)
  val round12: Seq[Q] =
    Seq(annPqTrained, annIvfPqTopK, annIvfPqRerank, annIvfPqTrained,
      annIvfPqResidual, annKnnGraphPq)
}
