package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.operators.{Retrieval, Similarity}

/** Round-12 third wave: the remaining production index families —
  * scalar quantization (SQ8) and graph-based beam search — plus the
  * retrieval stack a training pipeline queries with: BM25 posting-list
  * scoring, hybrid reciprocal-rank fusion, and multi-vector MaxSim late
  * interaction. Ref: the reference has no retrieval layer (its queries
  * are aggregate charts, src/jurimetria_pipeline.py:44-296); this is
  * the LLM-data-pipeline extension surface the builder prompt names. */
object Registry12 {

  private def emb(s: SparkSession, d: String) = Tables.embeddings(s, d)
  private def docs(s: SparkSession, d: String) = Tables.documents(s, d)

  /** SQ8 top-k ([[Similarity.sqStats]] → [[Similarity.sqTopK]]): the
    * third memory face of the index family — 4× compression against
    * raw floats, 256 levels per dimension from a min/max training
    * scan, NO codebook (the quantizer is 2 doubles/dimension). Each
    * corpus vector encodes to 64 one-byte level indices; candidates
    * score as squared L2 between the raw query and the DEQUANTIZED
    * reconstruction. The oracle replays the whole journey in the
    * operator's exact IEEE order: per-dimension min/max, step =
    * (mx − mn)/255, code = clamp(⌊(x − mn)/step + 0.5⌋, 0, 255)
    * (floor-plus-half, never round() — HALF_UP vs libm tie behavior
    * differs across engines), dequant = mn + code·step, and the
    * dimension-order distance fold. Ties to the lower neighbor id. */
  val annSq8TopK = Q("ann_sq8_topk",
    s"""WITH ds AS (SELECT unnest(range(1, 65)) AS t),
       |st AS (SELECT s.t, MIN(CAST(b.embedding[s.t] AS DOUBLE)) AS mn,
       |    MAX(CAST(b.embedding[s.t] AS DOUBLE)) AS mx
       |  FROM embeddings b CROSS JOIN ds s GROUP BY s.t),
       |sp AS (SELECT t, mn, (mx - mn) / 255.0 AS stp FROM st),
       |cd AS (SELECT b.vec_id AS n_id, s.t,
       |    CASE WHEN s.stp = 0 THEN 0 ELSE
       |      LEAST(255, GREATEST(0, CAST(floor(
       |        (CAST(b.embedding[s.t] AS DOUBLE) - s.mn) / s.stp + 0.5)
       |        AS BIGINT))) END AS code
       |  FROM embeddings b CROSS JOIN sp s),
       |dd AS (SELECT q.vec_id AS q_id, c.n_id, c.t,
       |    (CAST(q.embedding[c.t] AS DOUBLE) - (s.mn + c.code * s.stp))
       |  * (CAST(q.embedding[c.t] AS DOUBLE) - (s.mn + c.code * s.stp)) AS dsq
       |  FROM embeddings q JOIN cd c ON q.vec_id <> c.n_id
       |  JOIN sp s ON s.t = c.t
       |  WHERE q.vec_id < 5),
       |adc AS (SELECT q_id, n_id,
       |    list_reduce(list_prepend(0.0, list(dsq ORDER BY t)),
       |      (x, y) -> x + y) AS adc
       |  FROM dd GROUP BY q_id, n_id),
       |r AS (SELECT q_id, n_id, adc, CAST(ROW_NUMBER() OVER (
       |  PARTITION BY q_id ORDER BY adc ASC, n_id ASC) AS BIGINT) AS rnk
       |  FROM adc)
       |SELECT q_id, n_id, rnk, adc FROM r WHERE rnk <= 5
       |ORDER BY q_id, rnk""".stripMargin) { (s, d) =>
    val e = emb(s, d)
    val stats = Similarity.sqStats(e, "embedding", dim = 64)
    Similarity.sqTopK(e.filter(col("vec_id") < 5), e, stats,
      "vec_id", "embedding", k = 5)
      .withColumn("rnk", col("rnk").cast("long"))
      .orderBy("q_id", "rnk")
  }

  /** Graph-based ANN ([[Similarity.knnGraph]] →
    * [[Similarity.graphSearchTopK]]): bounded-hop beam search over a
    * prebuilt kNN graph — the fourth index family (HNSW/NSG's layer-0
    * shape), where touched work per query is hops × beam × fan-out,
    * INDEPENDENT of corpus size. The gate pins a fixed 200-node
    * single-cell graph (k = 3 out-edges) so the oracle's graph-build
    * cost is sf-invariant; every query starts at the minimum corpus id
    * and runs 3 hops of beam 4. The oracle UNROLLS the hops as CTE
    * stages (frontier ∪ out-neighbors, exact-cosine score, top-beam
    * with ties to the lower id — the frontier is retained in its own
    * expansion, so the best candidate never regresses), then ranks the
    * final frontier minus the query's own node. Approximate by graph
    * connectivity, bit-exact in scoring. */
  /** The fixed 200-node single-cell kNN graph every graph-family
    * oracle pins (k = 3 out-edges, exact cosine, ties to the lower
    * neighbor id — [[Similarity.knnGraph]]'s election), WITH the edge
    * cosine (the append oracle's degree recap reads it). */
  private[queries] def sqlKnnGraph: String =
    s"""base AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id < 200),
       |g AS (SELECT src_id, nbr_id, cs AS cos FROM (
       |  SELECT a.vec_id AS src_id, b.vec_id AS nbr_id,
       |    ${Registry10.sqlCos("a.embedding", "b.embedding")} AS cs,
       |    ROW_NUMBER() OVER (PARTITION BY a.vec_id
       |    ORDER BY ${Registry10.sqlCos("a.embedding", "b.embedding")} DESC,
       |      b.vec_id ASC) AS rn
       |  FROM base a JOIN base b ON a.vec_id <> b.vec_id) WHERE rn <= 3)""".stripMargin

  /** One exact-cosine beam hop over shared CTEs `g` (edges), `q`
    * (q_id, q_vec), `base` (corpus): candidates = `prev` frontier ∪
    * out-neighbors (distinct), scored into `scored`, top-`beam` into
    * `next`. */
  private[queries] def sqlCosHop(prev: String, cand: String, scored: String,
                        next: String, beam: Int): String =
    s"""$cand AS (SELECT DISTINCT q_id, n_id FROM (
       |  SELECT f.q_id, g.nbr_id AS n_id FROM $prev f JOIN g ON g.src_id = f.n_id
       |  UNION ALL SELECT q_id, n_id FROM $prev)),
       |$scored AS (SELECT q_id, n_id, cs, ROW_NUMBER() OVER (
       |    PARTITION BY q_id ORDER BY cs DESC, n_id ASC) AS rn
       |  FROM (SELECT c.q_id, c.n_id,
       |      ${Registry10.sqlCos("q.q_vec", "b.embedding")} AS cs
       |    FROM $cand c JOIN q ON q.q_id = c.q_id
       |    JOIN base b ON b.vec_id = c.n_id)),
       |$next AS (SELECT q_id, n_id FROM $scored WHERE rn <= $beam)""".stripMargin

  val annGraphSearch = Q("ann_graph_search",
    s"""WITH $sqlKnnGraph,
       |q AS (SELECT vec_id AS q_id, embedding AS q_vec FROM base
       |  WHERE vec_id < 5),
       |f0 AS (SELECT q_id, (SELECT MIN(vec_id) FROM base) AS n_id FROM q),
       |${sqlCosHop("f0", "c1", "s1", "f1", 4)},
       |${sqlCosHop("f1", "c2", "s2", "f2", 4)},
       |${sqlCosHop("f2", "c3", "s3", "f3", 4)},
       |r AS (SELECT q_id, n_id, cs AS cos, CAST(ROW_NUMBER() OVER (
       |  PARTITION BY q_id ORDER BY cs DESC, n_id ASC) AS BIGINT) AS rnk
       |  FROM s3 WHERE rn <= 4 AND q_id <> n_id)
       |SELECT q_id, n_id, rnk, cos FROM r WHERE rnk <= 3
       |ORDER BY q_id, rnk""".stripMargin) { (s, d) =>
    val e = emb(s, d).filter(col("vec_id") < 200)
    val cent = e.filter(col("vec_id") === 0)
      .select(lit(0).cast("int").as("cell"), col("embedding").as("c_vec"))
    val g = Similarity.knnGraph(e, cent, "vec_id", "embedding", k = 3)
    Similarity.graphSearchTopK(e.filter(col("vec_id") < 5), e, g,
      "vec_id", "embedding", k = 3, beam = 4, hops = 3)
      .withColumn("rnk", col("rnk").cast("long"))
      .orderBy("q_id", "rnk")
  }

  /** Shared BM25 oracle CTE chain, top-`k` per query with queries =
    * the distinct token sets of docs 0..2. Every arithmetic step is
    * written in [[Retrieval.bm25Scores]]'s exact IEEE order: rational
    * idf ((N − df) + 0.5)/(df + 0.5) — the argument of the
    * Robertson–Sparck Jones log, kept rational per the text_tfidf
    * precedent (a transcendental log is not bit-stable cross-engine);
    * k1 + 1 spelled `(1.2 + 1.0)` so both engines run the same IEEE
    * add; per-(query, doc) term scores fold in term order. */
  /** The Okapi term-score expression in [[Retrieval.bm25ScoresFromIndex]]'s
    * exact IEEE order (rational idf, k1+1 spelled `(1.2 + 1.0)`). */
  private val sqlBm25TermScore: String =
    """(((CAST(stt.n_docs AS DOUBLE) - CAST(f.df AS DOUBLE)) + 0.5)
      |       / (CAST(f.df AS DOUBLE) + 0.5))
      |    * (CAST(tf.tf AS DOUBLE) * (1.2 + 1.0))
      |    / (CAST(tf.tf AS DOUBLE) + 1.2 * (1.0 - 0.75
      |        + 0.75 * (CAST(dl.dl AS DOUBLE)
      |          / (CAST(stt.sum_dl AS DOUBLE) / CAST(stt.n_docs AS DOUBLE)))))""".stripMargin

  /** One BM25 scoring pass against the shared tf/dl/dfreq/stt CTEs for
    * query-term CTE `qtCte`, ranked top-`k` into CTE `out` (term
    * scores fold in term order; self excluded). */
  private def sqlBm25Pass(qtCte: String, out: String, k: Int): String =
    s"""tsc_$out AS (SELECT q.q_id, tf.doc_id, tf.term,
       |    $sqlBm25TermScore
       |      AS v
       |  FROM tf JOIN $qtCte q USING (term) JOIN dl USING (doc_id)
       |  CROSS JOIN stt JOIN dfreq f USING (term)),
       |sc_$out AS (SELECT q_id, doc_id,
       |    list_reduce(list_prepend(0.0, list(v ORDER BY term)),
       |      (x, y) -> x + y) AS score
       |  FROM tsc_$out WHERE q_id <> doc_id GROUP BY 1, 2),
       |$out AS (SELECT q_id, doc_id, rnk, score FROM (
       |  SELECT q_id, doc_id, score, CAST(ROW_NUMBER() OVER (
       |    PARTITION BY q_id ORDER BY score DESC, doc_id ASC) AS BIGINT) AS rnk
       |  FROM sc_$out) WHERE rnk <= $k)""".stripMargin

  private[queries] def sqlBm25(k: Int, where: String = "TRUE",
                               src: String = "documents"): String =
    s"""toks AS (SELECT doc_id, term FROM (
       |  SELECT doc_id, unnest(string_split(text, ' ')) AS term
       |  FROM $src WHERE $where) WHERE term <> ''),
       |tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM toks GROUP BY 1, 2),
       |dl AS (SELECT doc_id, COUNT(*) AS dl FROM toks GROUP BY 1),
       |dfreq AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY 1),
       |stt AS (SELECT COUNT(*) AS n_docs, SUM(dl) AS sum_dl FROM dl),
       |qt AS (SELECT DISTINCT doc_id AS q_id, term FROM toks WHERE doc_id < 3),
       |${sqlBm25Pass("qt", "lex", k)}""".stripMargin

  /** BM25 lexical retrieval under the gate ([[Retrieval.bm25TopK]]):
    * the inverted-index dataflow — tokenize once, partial-agg tf/dl/df,
    * broadcast-join the query terms against the posting list — ranking
    * every corpus document against the token sets of docs 0..2. Only
    * the tokenize exchange is corpus-sized; at 100 TB this IS how a
    * lexical index build + query runs. */
  val textBm25TopK = Q("text_bm25_topk",
    s"""WITH ${sqlBm25(10)}
       |SELECT q_id, doc_id, rnk, score FROM lex
       |ORDER BY q_id, rnk""".stripMargin) { (s, d) =>
    val dcs = docs(s, d)
    val qt = dcs.filter(col("doc_id") < 3)
      .select(col("doc_id").as("q_id"),
        explode(split(col("text"), " ")).as("term"))
    Retrieval.bm25TopK(qt, dcs, "doc_id", "text", k = 10)
      .withColumn("rnk", col("rnk").cast("long"))
      .orderBy("q_id", "rnk")
  }

  /** Hybrid retrieval via reciprocal-rank fusion
    * ([[Retrieval.rrfFuse]]): BM25 top-20 over documents ⊕ exact-cosine
    * top-20 over embeddings (the testdata id spaces align: doc_id n ↔
    * vec_id n, the standard doc-and-its-embedding pairing), fused as
    * Σ 1/(60 + rank) — rank arithmetic only, no score calibration,
    * which is why RRF is THE production hybrid combiner. A candidate
    * missing from one list contributes 0 from it. The fuse joins two
    * already-top-k'd frames — the corpus never participates. Ties to
    * the lower candidate id. */
  val hybridRrfTopK = Q("hybrid_rrf_topk",
    s"""WITH ${sqlBm25(20)},
       |dcs AS (SELECT c.vec_id AS n_id, q.vec_id AS q_id,
       |    ${Registry10.sqlCos("q.embedding", "c.embedding")} AS cs
       |  FROM embeddings q JOIN embeddings c ON q.vec_id <> c.vec_id
       |  WHERE q.vec_id < 3),
       |den AS (SELECT q_id, n_id, rnk FROM (
       |  SELECT q_id, n_id, CAST(ROW_NUMBER() OVER (
       |    PARTITION BY q_id ORDER BY cs DESC, n_id ASC) AS BIGINT) AS rnk
       |  FROM dcs) WHERE rnk <= 20),
       |lc AS (SELECT q_id, doc_id AS n_id,
       |    1.0 / (60.0 + CAST(rnk AS DOUBLE)) AS c0 FROM lex),
       |dc AS (SELECT q_id, n_id,
       |    1.0 / (60.0 + CAST(rnk AS DOUBLE)) AS c1 FROM den),
       |fz AS (SELECT COALESCE(l.q_id, r2.q_id) AS q_id,
       |    COALESCE(l.n_id, r2.n_id) AS n_id,
       |    COALESCE(l.c0, 0.0) + COALESCE(r2.c1, 0.0) AS rrf
       |  FROM lc l FULL OUTER JOIN dc r2
       |    ON l.q_id = r2.q_id AND l.n_id = r2.n_id),
       |r AS (SELECT q_id, n_id, rrf, CAST(ROW_NUMBER() OVER (
       |  PARTITION BY q_id ORDER BY rrf DESC, n_id ASC) AS BIGINT) AS rnk
       |  FROM fz)
       |SELECT q_id, n_id, rnk, rrf FROM r WHERE rnk <= 10
       |ORDER BY q_id, rnk""".stripMargin) { (s, d) =>
    val dcs = docs(s, d)
    val e = emb(s, d)
    val qt = dcs.filter(col("doc_id") < 3)
      .select(col("doc_id").as("q_id"),
        explode(split(col("text"), " ")).as("term"))
    val lex = Retrieval.bm25TopK(qt, dcs, "doc_id", "text", k = 20)
      .select(col("q_id"), col("doc_id").as("n_id"), col("rnk"))
    val dense = Similarity.bruteForceTopK(e.filter(col("vec_id") < 3), e,
      "vec_id", "embedding", k = 20)
      .select(col("q_id"), col("n_id"), col("rnk"))
    Retrieval.rrfFuse(Seq(lex, dense), k = 10)
      .withColumn("rnk", col("rnk").cast("long"))
      .orderBy("q_id", "rnk")
  }

  /** Multi-vector MaxSim late interaction ([[Retrieval.maxSimTopK]],
    * the ColBERT scoring rule): documents are bags of vectors and
    * score(Q, D) = Σ_{q∈Q} max_{d∈D} cos(q, d). The gate derives a
    * fixed multi-vector corpus from the embeddings table (15 docs of
    * 16 vectors each — vec_id DIV 16, sf-invariant oracle cost; the
    * SEMANTICS gated is the scoring rule, not the grouping); query
    * docs 0..2 rank the other 12. max is an order-free exact
    * aggregate; the sum folds in query-vector order (the collected-
    * struct idiom — bare double sum() has no defined order). */
  val annMaxSimTopK = Q("ann_maxsim_topk",
    s"""WITH mv AS (SELECT vec_id, CAST(vec_id // 16 AS INT) AS doc,
       |    embedding FROM embeddings WHERE vec_id < 240),
       |p AS (SELECT q.doc AS q_doc, q.vec_id AS q_vid, c.doc AS n_doc,
       |    ${Registry10.sqlCos("q.embedding", "c.embedding")} AS cs
       |  FROM mv q JOIN mv c ON q.doc <> c.doc WHERE q.doc < 3),
       |mx AS (SELECT q_doc, q_vid, n_doc, MAX(cs) AS mx
       |  FROM p GROUP BY 1, 2, 3 HAVING MAX(cs) IS NOT NULL),
       |sm AS (SELECT q_doc, n_doc,
       |    list_reduce(list_prepend(0.0, list(mx ORDER BY q_vid)),
       |      (x, y) -> x + y) AS maxsim
       |  FROM mx GROUP BY 1, 2),
       |r AS (SELECT q_doc, n_doc, maxsim, CAST(ROW_NUMBER() OVER (
       |  PARTITION BY q_doc ORDER BY maxsim DESC, n_doc ASC) AS BIGINT) AS rnk
       |  FROM sm)
       |SELECT q_doc, n_doc, rnk, maxsim FROM r WHERE rnk <= 5
       |ORDER BY q_doc, rnk""".stripMargin) { (s, d) =>
    val mv = emb(s, d).filter(col("vec_id") < 240)
      .withColumn("doc", expr("CAST(vec_id DIV 16 AS INT)"))
    Retrieval.maxSimTopK(mv.filter(col("doc") < 3), mv,
      "doc", "vec_id", "embedding", k = 5)
      .withColumn("rnk", col("rnk").cast("long"))
      .orderBy("q_doc", "rnk")
  }

  /** The ADC-scored hop template for [[annGraphSearchPq]]'s oracle:
    * candidates = frontier ∪ out-neighbors (distinct), each scored by
    * the subspace-order ADC fold against the query's distance table,
    * top-`beam` by (adc ASC, id ASC). */
  private def sqlAdcHop(prev: String, cand: String, scored: String,
                        next: String, beam: Int): String =
    s"""$cand AS (SELECT DISTINCT q_id, n_id FROM (
       |  SELECT f.q_id, g.nbr_id AS n_id FROM $prev f JOIN g ON g.src_id = f.n_id
       |  UNION ALL SELECT q_id, n_id FROM $prev)),
       |$scored AS (SELECT q_id, n_id, adc, ROW_NUMBER() OVER (
       |    PARTITION BY q_id ORDER BY adc ASC, n_id ASC) AS rn
       |  FROM (SELECT x.q_id, x.n_id,
       |      list_reduce(list_prepend(0.0, list(x.dist ORDER BY x.sub)),
       |        (u, y) -> u + y) AS adc
       |    FROM (SELECT c2.q_id, c2.n_id, qd.sub, qd.dist FROM $cand c2
       |      JOIN codes n ON n.n_id = c2.n_id
       |      JOIN qd ON qd.q_id = c2.q_id AND qd.sub = n.sub
       |        AND qd.code = n.code) x
       |    GROUP BY x.q_id, x.n_id)),
       |$next AS (SELECT q_id, n_id FROM $scored WHERE rn <= $beam)""".stripMargin

  /** PQ-guided graph search with exact re-rank
    * ([[Similarity.graphSearchPqTopK]]) — the DiskANN shape: beam
    * traversal reads only the fast tier (kNN graph edges + 8-byte PQ
    * codes, ADC-scored), raw floats are touched for the final
    * survivors alone (exact cosine re-rank). The gate pins the same
    * fixed 200-node graph as `ann_graph_search` plus the 16-entry seed
    * codebook; 3 hops of beam 6, all 6 final-frontier survivors
    * re-rank to top-3. Approximate on THREE axes by construction —
    * graph connectivity, beam width, PQ reconstruction — and bit-exact
    * in every score. */
  val annGraphSearchPq = Q("ann_graph_search_pq",
    s"""WITH base AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id < 200),
       |g AS (SELECT src_id, nbr_id FROM (
       |  SELECT a.vec_id AS src_id, b.vec_id AS nbr_id, ROW_NUMBER() OVER (
       |    PARTITION BY a.vec_id
       |    ORDER BY ${Registry10.sqlCos("a.embedding", "b.embedding")} DESC,
       |      b.vec_id ASC) AS rn
       |  FROM base a JOIN base b ON a.vec_id <> b.vec_id) WHERE rn <= 3),
       |cw AS (SELECT CAST(vec_id AS INT) AS code, embedding AS w
       |  FROM embeddings WHERE vec_id < 16),
       |js AS (SELECT unnest(range(0, 8)) AS j),
       |cd AS (SELECT b.vec_id AS n_id, js.j AS sub, c.code,
       |    ${Registry10.sqlSubDist("b.embedding", "c.w", "js.j")} AS dist
       |  FROM base b CROSS JOIN js CROSS JOIN cw c),
       |codes AS (SELECT n_id, sub, code FROM (
       |  SELECT n_id, sub, code, ROW_NUMBER() OVER (
       |    PARTITION BY n_id, sub ORDER BY dist ASC, code ASC) AS rn
       |  FROM cd) WHERE rn = 1),
       |q AS (SELECT vec_id AS q_id, embedding AS q_vec FROM base
       |  WHERE vec_id < 5),
       |qd AS (SELECT q.q_id, js.j AS sub, c.code,
       |    ${Registry10.sqlSubDist("q.q_vec", "c.w", "js.j")} AS dist
       |  FROM q CROSS JOIN js CROSS JOIN cw c),
       |f0 AS (SELECT q_id, (SELECT MIN(vec_id) FROM base) AS n_id FROM q),
       |${sqlAdcHop("f0", "c1", "s1", "f1", 6)},
       |${sqlAdcHop("f1", "c2", "s2", "f2", 6)},
       |${sqlAdcHop("f2", "c3", "s3", "f3", 6)},
       |rr AS (SELECT f.q_id, f.n_id,
       |    ${Registry10.sqlCos("q.q_vec", "b.embedding")} AS cos
       |  FROM f3 f JOIN q ON q.q_id = f.q_id
       |  JOIN base b ON b.vec_id = f.n_id
       |  WHERE f.q_id <> f.n_id),
       |r AS (SELECT q_id, n_id, cos, CAST(ROW_NUMBER() OVER (
       |  PARTITION BY q_id ORDER BY cos DESC, n_id ASC) AS BIGINT) AS rnk
       |  FROM rr)
       |SELECT q_id, n_id, rnk, cos FROM r WHERE rnk <= 3
       |ORDER BY q_id, rnk""".stripMargin) { (s, d) =>
    val e = emb(s, d).filter(col("vec_id") < 200)
    val cent = e.filter(col("vec_id") === 0)
      .select(lit(0).cast("int").as("cell"), col("embedding").as("c_vec"))
    val g = Similarity.knnGraph(e, cent, "vec_id", "embedding", k = 3)
    val cb = Similarity.pqCodebookSeed(emb(s, d), "vec_id", "embedding",
      m = 8, ksub = 16, subDim = 8)
    Similarity.graphSearchPqTopK(e.filter(col("vec_id") < 5), e, g, cb,
      "vec_id", "embedding", k = 3, beam = 6, hops = 3, rerank = 6)
      .withColumn("rnk", col("rnk").cast("long"))
      .orderBy("q_id", "rnk")
  }

  /** Hard-negative mining ([[Retrieval.hardNegatives]]): BM25 top-20
    * candidates NOT present in the dense-cosine top-10 — lexically
    * close but semantically absent, the negatives contrastive training
    * wants. Both rankers are the already-gated ones (`text_bm25_topk`
    * shape at k = 20, `ann_brute_topk` shape at k = 10, doc_id n ↔
    * vec_id n); the mine itself is an anti-join of two small top-k
    * frames re-numbered in lexical-rank order. */
  val mineHardNegatives = Q("mine_hard_negatives",
    s"""WITH ${sqlBm25(20)},
       |dcs AS (SELECT c.vec_id AS n_id, q.vec_id AS q_id,
       |    ${Registry10.sqlCos("q.embedding", "c.embedding")} AS cs
       |  FROM embeddings q JOIN embeddings c ON q.vec_id <> c.vec_id
       |  WHERE q.vec_id < 3),
       |den AS (SELECT q_id, n_id FROM (
       |  SELECT q_id, n_id, ROW_NUMBER() OVER (
       |    PARTITION BY q_id ORDER BY cs DESC, n_id ASC) AS rnk
       |  FROM dcs) WHERE rnk <= 10),
       |mined AS (SELECT l.q_id, l.doc_id AS n_id, l.rnk AS lex_rnk
       |  FROM lex l WHERE NOT EXISTS (SELECT 1 FROM den d
       |    WHERE d.q_id = l.q_id AND d.n_id = l.doc_id)),
       |r AS (SELECT q_id, n_id, lex_rnk, CAST(ROW_NUMBER() OVER (
       |  PARTITION BY q_id ORDER BY lex_rnk ASC) AS BIGINT) AS rnk
       |  FROM mined)
       |SELECT q_id, n_id, rnk, lex_rnk FROM r WHERE rnk <= 10
       |ORDER BY q_id, rnk""".stripMargin) { (s, d) =>
    val dcs = docs(s, d)
    val e = emb(s, d)
    val qt = dcs.filter(col("doc_id") < 3)
      .select(col("doc_id").as("q_id"),
        explode(split(col("text"), " ")).as("term"))
    val lex = Retrieval.bm25TopK(qt, dcs, "doc_id", "text", k = 20)
      .select(col("q_id"), col("doc_id").as("n_id"), col("rnk"))
    val dense = Similarity.bruteForceTopK(e.filter(col("vec_id") < 3), e,
      "vec_id", "embedding", k = 10)
      .select(col("q_id"), col("n_id"), col("rnk"))
    Retrieval.hardNegatives(lex, dense, k = 10)
      .withColumn("rnk", col("rnk").cast("long"))
      .withColumn("lex_rnk", col("lex_rnk").cast("long"))
      .orderBy("q_id", "rnk")
  }

  /** BM25 index APPEND under the gate ([[Retrieval.bm25IndexBuild]] →
    * [[Retrieval.bm25IndexAppend]] → [[Retrieval.bm25TopKFromIndex]]):
    * the lexical index as a stored asset — a (doc_id, term, tf) ledger
    * of docs < 250 extended by a batch of docs ≥ 240 (ten-doc overlap:
    * at-least-once replay, absorbed by the id anti-join). Only the
    * BATCH tokenizes; the ledger ships distinct ids into the
    * anti-join, never tf rows. tf rows are per-document facts, so
    * append ≡ from-scratch rebuild UNCONDITIONALLY (no frozen-
    * quantizer caveat — corpus stats df/N/avgdl re-derive from the
    * current ledger at query time), and the oracle asserts exactly
    * that: it scores from scratch over the whole corpus. A broken
    * anti-join would double-count the overlap docs' tf and shift
    * every score — the gate would hash-mismatch. */
  val textBm25IndexAppend = Q("text_bm25_index_append",
    s"""WITH ${sqlBm25(10)}
       |SELECT q_id, doc_id, rnk, score FROM lex
       |ORDER BY q_id, rnk""".stripMargin) { (s, d) =>
    val dcs = docs(s, d)
    val ledger = Retrieval.bm25IndexBuild(
      dcs.filter(col("doc_id") < 250), "doc_id", "text")
    val appended = Retrieval.bm25IndexAppend(ledger,
      dcs.filter(col("doc_id") >= 240), "doc_id", "text")
    val qt = dcs.filter(col("doc_id") < 3)
      .select(col("doc_id").as("q_id"),
        explode(split(col("text"), " ")).as("term"))
    Retrieval.bm25TopKFromIndex(qt, appended, k = 10)
      .withColumn("rnk", col("rnk").cast("long"))
      .orderBy("q_id", "rnk")
  }

  /** BM25 index TAKEDOWN ([[Retrieval.bm25IndexRemove]]): the
    * GDPR-deletion path of the lexical index — one id-keyed anti-join
    * IS the whole repair (tf rows are independent per document;
    * df/N/avgdl legitimately shift when documents leave, and the
    * scorer re-derives them from the surviving ledger). The oracle
    * scores from scratch over the corpus MINUS the removed docs
    * (50..99) — remove ≡ rebuild of the survivors, the same identity
    * `ann_index_remove` gates for the PQ ledger. */
  val textBm25IndexRemove = Q("text_bm25_index_remove",
    s"""WITH ${sqlBm25(10, "doc_id < 50 OR doc_id >= 100")}
       |SELECT q_id, doc_id, rnk, score FROM lex
       |ORDER BY q_id, rnk""".stripMargin) { (s, d) =>
    val dcs = docs(s, d)
    val ledger = Retrieval.bm25IndexBuild(dcs, "doc_id", "text")
    val survived = Retrieval.bm25IndexRemove(ledger,
      dcs.filter(col("doc_id") >= 50 && col("doc_id") < 100)
        .select("doc_id"))
    val qt = dcs.filter(col("doc_id") < 3)
      .select(col("doc_id").as("q_id"),
        explode(split(col("text"), " ")).as("term"))
    Retrieval.bm25TopKFromIndex(qt, survived, k = 10)
      .withColumn("rnk", col("rnk").cast("long"))
      .orderBy("q_id", "rnk")
  }

  /** Index-quality evaluation under the gate
    * ([[Retrieval.evalRanking]]): recall@5 and reciprocal rank of the
    * routed IVF-PQ index against the exact brute-force truth — the
    * measurement face of the whole approximate family (an index
    * without a measured recall is an unverified index; at pipeline
    * scale the evaluation is itself a distributed job over millions of
    * held-out queries). Integer hit counts and single divides only —
    * means over queries are left to exact integer partial-agg sums.
    * The oracle replays BOTH rankers (the `ann_ivf_pq_topk` and
    * `ann_brute_topk` algebras) and the hit/rank arithmetic. */
  val evalRetrievalQuality = Q("eval_retrieval_quality",
    s"""WITH ${Registry10.sqlPqCodes},
       |qd AS (SELECT q.vec_id AS q_id, js.j AS sub, c.code,
       |    ${Registry10.sqlSubDist("q.embedding", "c.w", "js.j")} AS dist
       |  FROM embeddings q CROSS JOIN js CROSS JOIN cw c
       |  WHERE q.vec_id < 5),
       |${Registry10.sqlIvfAdcRank("codes", "qd")},
       |gt AS (SELECT q_id, n_id, rnk FROM r WHERE rnk <= 5),
       |tcs AS (SELECT q.vec_id AS q_id, c.vec_id AS n_id,
       |    ${Registry10.sqlCos("q.embedding", "c.embedding")} AS cs
       |  FROM embeddings q JOIN embeddings c ON q.vec_id <> c.vec_id
       |  WHERE q.vec_id < 5),
       |tr AS (SELECT q_id, n_id FROM (
       |  SELECT q_id, n_id, ROW_NUMBER() OVER (
       |    PARTITION BY q_id ORDER BY cs DESC, n_id ASC) AS rnk
       |  FROM tcs) WHERE rnk <= 5),
       |h AS (SELECT g.q_id, COUNT(*) AS hits, MIN(g.rnk) AS minr
       |  FROM gt g JOIN tr t ON t.q_id = g.q_id AND t.n_id = g.n_id
       |  GROUP BY g.q_id)
       |SELECT u.q_id, COALESCE(h.hits, 0) AS hits,
       |  CAST(COALESCE(h.hits, 0) AS DOUBLE)
       |    / CAST(LEAST(5, u.tcnt) AS DOUBLE) AS recall,
       |  COALESCE(1.0 / CAST(h.minr AS DOUBLE), 0.0) AS rr
       |FROM (SELECT q_id, COUNT(*) AS tcnt FROM tr GROUP BY 1) u
       |LEFT JOIN h USING (q_id)
       |ORDER BY q_id""".stripMargin) { (s, d) =>
    val (e, cent, cb) = Registry10.ivfPqSparkInputs(s, d)
    val q = e.filter(col("vec_id") < 5)
    val got = Similarity.ivfPqTopK(q, e, cent, cb,
      "vec_id", "embedding", k = 5, nProbe = 4)
    val truth = Similarity.bruteForceTopK(q, e, "vec_id", "embedding", k = 5)
    Retrieval.evalRanking(got, truth, k = 5)
      .orderBy("q_id")
  }

  /** STREAMING lexical-index ingest: the arrival path of
    * [[Retrieval.bm25IndexAppend]] — document pages as file-source
    * micro-batches (one page per trigger), each batch appending its
    * `deltaOnly` tf delta to a parquet-backed ledger after the id
    * anti-join. Pages overlap by 10 docs (at-least-once replay),
    * absorbed by the anti-join; tf rows are per-document facts, so the
    * drained ledger is arrival-order-independent and the gate asserts
    * the strongest form: it equals the from-scratch tf build of the
    * whole corpus. Stateless streaming — the ledger IS the state, held
    * in storage as a production search-index ingest holds its
    * segments (`streaming_index_ingest`'s posture, third ledger
    * family). O(touched) on both sides: delta-append writes, and the
    * anti-join read leg bucket-pruned via
    * [[graft.operators.Ledger.prunedToBatch]] over the
    * pmod(doc_id, B)-partitioned ledger. */
  val streamingBm25Ingest = Q("streaming_bm25_ingest",
    """SELECT doc_id, term, COUNT(*) AS tf
      |FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS term
      |  FROM documents)
      |WHERE term <> ''
      |GROUP BY doc_id, term
      |ORDER BY doc_id, term""".stripMargin) { (s, d) =>
    val dcs = docs(s, d)
    val n = dcs.count()
    val fx = FixtureCache.cached(d, "bmidx", 1, Seq("documents")) { tmp =>
      val pages = tmp.resolve("pages")
      java.nio.file.Files.createDirectories(pages)
      val base = System.currentTimeMillis() - 3600L * 1000
      val qn = n / 4
      for (p <- 0 until 4) {
        val lo = math.max(0L, p * qn - 10)
        val hi = if (p == 3) n else (p + 1) * qn
        val tmpd = tmp.resolve(s"tmp$p")
        dcs.filter(col("doc_id") >= lo && col("doc_id") < hi)
          .repartition(1).write.mode("overwrite").parquet(tmpd.toString)
        val parts = tmpd.toFile.listFiles().toSeq
          .filter(_.getName.endsWith(".parquet")).sortBy(_.getName)
        parts.zipWithIndex.foreach { case (f, i) =>
          val dest = pages.resolve(s"page$p-$i.parquet")
          java.nio.file.Files.move(f.toPath, dest)
          java.nio.file.Files.setLastModifiedTime(dest,
            java.nio.file.attribute.FileTime.fromMillis(base + p * 60000L))
        }
        FixtureCache.deleteRecursively(tmpd)
      }
    }
    val stage = StreamHarness.runDir("graft_bmidx")
    val ledgerDir = stage.resolve("ledger").toString
    // bucket-partitioned on pmod(doc_id, B): the idempotency
    // anti-join's read leg prunes to the batch's elected buckets
    // (O(touched) reads — streaming_index_ingest's posture)
    val nBkt = 16
    import org.apache.spark.sql.types._
    val ledgerSchema = StructType(Seq(StructField("doc_id", LongType),
      StructField("term", StringType),
      StructField("tf", LongType),
      StructField("bkt", IntegerType)))
    s.createDataFrame(s.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      ledgerSchema)
      .write.partitionBy("bkt").mode("overwrite").parquet(ledgerDir)
    val stream = s.readStream
      .schema("doc_id LONG, text STRING, lang STRING, source STRING, n_chars LONG")
      .option("maxFilesPerTrigger", "1")
      .parquet(fx.resolve("pages").toString)
    val appendBatch: (DataFrame, Long) => Unit = { (b, _) =>
      val stored = graft.operators.Ledger.prunedToBatch(
        s.read.schema(ledgerSchema).parquet(ledgerDir), b, "doc_id", nBkt)
      graft.operators.Ledger.withBucket(
        Retrieval.bm25IndexAppend(stored, b, "doc_id", "text",
          deltaOnly = true), "doc_id", nBkt)
        .write.partitionBy("bkt").mode("append").parquet(ledgerDir)
    }
    val run = stream.writeStream
      .foreachBatch(appendBatch)
      .option("checkpointLocation", stage.resolve("ckpt").toString)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    run.awaitTermination()
    s.read.schema(ledgerSchema).parquet(ledgerDir).drop("bkt")
      .orderBy("doc_id", "term")
  }

  /** Routed SQ8 under the gate ([[Similarity.ivfSqTopK]], the FAISS
    * IVFScalarQuantizer): cell routing restricts the scan to 4 of 16
    * cells AND the scan operand is dim one-byte levels (4×) — the
    * quantizer × routing matrix's third row (IVF-flat `ann_ivf_topk`,
    * IVF-PQ `ann_ivf_pq_topk`, now IVF-SQ8), with nothing to train
    * beyond the min/max scan. The oracle composes the `ann_sq8_topk`
    * scoring algebra with the `ann_ivf_topk` probe restriction —
    * routing changes the candidate set, never the scoring. */
  val annIvfSq8TopK = Q("ann_ivf_sq8_topk",
    s"""WITH ds AS (SELECT unnest(range(1, 65)) AS t),
       |st AS (SELECT s.t, MIN(CAST(b.embedding[s.t] AS DOUBLE)) AS mn,
       |    MAX(CAST(b.embedding[s.t] AS DOUBLE)) AS mx
       |  FROM embeddings b CROSS JOIN ds s GROUP BY s.t),
       |sp AS (SELECT t, mn, (mx - mn) / 255.0 AS stp FROM st),
       |cd AS (SELECT b.vec_id AS n_id, s.t,
       |    CASE WHEN s.stp = 0 THEN 0 ELSE
       |      LEAST(255, GREATEST(0, CAST(floor(
       |        (CAST(b.embedding[s.t] AS DOUBLE) - s.mn) / s.stp + 0.5)
       |        AS BIGINT))) END AS code
       |  FROM embeddings b CROSS JOIN sp s),
       |cent AS (SELECT CAST(vec_id AS INT) AS cell, embedding AS c_vec
       |  FROM embeddings WHERE vec_id < 16),
       |asg AS (SELECT n_id, cell FROM (
       |  SELECT b.vec_id AS n_id, c.cell, ROW_NUMBER() OVER (
       |    PARTITION BY b.vec_id
       |    ORDER BY ${Registry10.sqlCos("b.embedding", "c.c_vec")} DESC,
       |      c.cell DESC) AS rn
       |  FROM embeddings b CROSS JOIN cent c) WHERE rn = 1),
       |probes AS (SELECT q_id, cell FROM (
       |  SELECT q.vec_id AS q_id, c.cell, ROW_NUMBER() OVER (
       |    PARTITION BY q.vec_id
       |    ORDER BY ${Registry10.sqlCos("q.embedding", "c.c_vec")} DESC,
       |      c.cell DESC) AS rn
       |  FROM embeddings q CROSS JOIN cent c WHERE q.vec_id < 5) WHERE rn <= 4),
       |cand AS (SELECT p.q_id, a.n_id FROM probes p JOIN asg a USING (cell)
       |  WHERE p.q_id <> a.n_id),
       |dd AS (SELECT c2.q_id, c2.n_id, c.t,
       |    (CAST(q.embedding[c.t] AS DOUBLE) - (s.mn + c.code * s.stp))
       |  * (CAST(q.embedding[c.t] AS DOUBLE) - (s.mn + c.code * s.stp)) AS dsq
       |  FROM cand c2 JOIN cd c ON c.n_id = c2.n_id
       |  JOIN sp s ON s.t = c.t
       |  JOIN embeddings q ON q.vec_id = c2.q_id),
       |adc AS (SELECT q_id, n_id,
       |    list_reduce(list_prepend(0.0, list(dsq ORDER BY t)),
       |      (x, y) -> x + y) AS adc
       |  FROM dd GROUP BY q_id, n_id),
       |r AS (SELECT q_id, n_id, adc, CAST(ROW_NUMBER() OVER (
       |  PARTITION BY q_id ORDER BY adc ASC, n_id ASC) AS BIGINT) AS rnk
       |  FROM adc)
       |SELECT q_id, n_id, rnk, adc FROM r WHERE rnk <= 5
       |ORDER BY q_id, rnk""".stripMargin) { (s, d) =>
    val e = emb(s, d)
    val cent = e.filter(col("vec_id") < 16)
      .select(col("vec_id").cast("int").as("cell"), col("embedding").as("c_vec"))
    val stats = Similarity.sqStats(e, "embedding", dim = 64)
    Similarity.ivfSqTopK(e.filter(col("vec_id") < 5), e, cent, stats,
      "vec_id", "embedding", k = 5, nProbe = 4)
      .withColumn("rnk", col("rnk").cast("long"))
      .orderBy("q_id", "rnk")
  }

  /** Pseudo-relevance feedback under the gate ([[Retrieval.bm25Prf]],
    * RM3-lite): first pass takes each query's BM25 top-3 docs as
    * presumed-relevant, their top-5 NEW terms (by INTEGER total tf,
    * ties to the smaller term — deliberately not the float-weighted
    * RM3 mixture, which would put an unordered cross-row float sum in
    * the selection rule) expand the query, and the expanded query
    * re-ranks top-10. The oracle replays both passes against the SAME
    * shared tf/dl/df/stats CTEs ([[sqlBm25Pass]] twice) plus the
    * integer expansion election — the second pass is the same
    * posting-list algebra, only the query-term set changes. */
  val textBm25Prf = Q("text_bm25_prf",
    s"""WITH ${sqlBm25(3)},
       |fb AS (SELECT l.q_id, t.term, SUM(t.tf) AS ttf
       |  FROM lex l JOIN tf t ON t.doc_id = l.doc_id GROUP BY 1, 2),
       |exp AS (SELECT q_id, term FROM (
       |  SELECT f.q_id, f.term, ROW_NUMBER() OVER (
       |    PARTITION BY f.q_id ORDER BY f.ttf DESC, f.term ASC) AS r
       |  FROM fb f WHERE NOT EXISTS (SELECT 1 FROM qt q
       |    WHERE q.q_id = f.q_id AND q.term = f.term)) WHERE r <= 5),
       |qt1 AS (SELECT q_id, term FROM qt
       |  UNION SELECT q_id, term FROM exp),
       |${sqlBm25Pass("qt1", "lex1", 10)}
       |SELECT q_id, doc_id, rnk, score FROM lex1
       |ORDER BY q_id, rnk""".stripMargin) { (s, d) =>
    val dcs = docs(s, d)
    val qt = dcs.filter(col("doc_id") < 3)
      .select(col("doc_id").as("q_id"),
        explode(split(col("text"), " ")).as("term"))
    Retrieval.bm25Prf(qt, dcs, "doc_id", "text", k = 10,
      fbDocs = 3, expTerms = 5)
      .withColumn("rnk", col("rnk").cast("long"))
      .orderBy("q_id", "rnk")
  }

  /** Perceptual-hash media near-dup under the gate
    * ([[graft.operators.Multimodal.perceptualHash]] → `phashPairs`):
    * the image-dedup signature every multimodal pipeline computes —
    * 64-cell aHash over the (stubbed) decoded frame, 4×16-bit slice
    * banding (pigeonhole-complete at Hamming ≤ 3; at the gate's
    * threshold 8 the bands are the standard heuristic candidate
    * generator, the banded-recall contract of the dedup family), exact
    * integer Hamming confirm on candidates only. Text bytes stand in
    * for payloads (the `multimodal_features` convention; the corpus is
    * pure ASCII so DuckDB character positions ARE byte positions); the
    * oracle replays the byte-downsample, the integer mean test, the
    * slice join, and the positionwise Hamming fold. */
  /** The aHash signature + slice-banding + Hamming-confirm CTE chain
    * (rec → cells → sums → sig → sl → cand → h), ONE construction for
    * the pairs gate and round-14's clusters gate — drift between
    * copies would make them test different signatures. */
  private[queries] def sqlPhashHam: String =
    s"""rec AS (SELECT doc_id AS id, text, length(text) AS n
       |  FROM documents),
       |cells AS (SELECT id, i, CASE WHEN n = 0 THEN 0
       |    ELSE ascii(substring(text, CAST(i * n // 64 AS BIGINT) + 1, 1))
       |    END AS c
       |  FROM rec CROSS JOIN (SELECT unnest(range(0, 64)) AS i)),
       |sums AS (SELECT id, SUM(c) AS s FROM cells GROUP BY id),
       |sig AS (SELECT c2.id, string_agg(
       |    CASE WHEN c2.c * 64 > m.s THEN '1' ELSE '0' END, ''
       |    ORDER BY c2.i) AS sig
       |  FROM cells c2 JOIN sums m ON m.id = c2.id GROUP BY c2.id),
       |sl AS (SELECT id, k, substring(sig, k * 16 + 1, 16) AS v
       |  FROM sig CROSS JOIN (SELECT unnest(range(0, 4)) AS k)),
       |cand AS (SELECT DISTINCT a.id AS a_id, b.id AS b_id
       |  FROM sl a JOIN sl b ON a.k = b.k AND a.v = b.v AND a.id < b.id),
       |h AS (SELECT c.a_id, c.b_id,
       |    list_reduce(list_prepend(0, list_transform(range(1, 65), t ->
       |      CASE WHEN substring(sa.sig, CAST(t AS INT), 1)
       |        <> substring(sb.sig, CAST(t AS INT), 1) THEN 1 ELSE 0 END)),
       |      (x, y) -> x + y) AS ham
       |  FROM cand c JOIN sig sa ON sa.id = c.a_id
       |  JOIN sig sb ON sb.id = c.b_id)""".stripMargin

  val multimodalPhashPairs = Q("multimodal_phash_pairs",
    s"""WITH $sqlPhashHam
       |SELECT a_id, b_id, CAST(ham AS BIGINT) AS ham FROM h WHERE ham <= 8
       |ORDER BY a_id, b_id""".stripMargin) { (s, d) =>
    import s.implicits._
    import graft.operators.Multimodal
    val records = docs(s, d).select(col("doc_id").as("id"), col("text"))
      .as[(Long, String)]
      .map { case (id, text) =>
        Multimodal.MediaRecord(id, "text", text.getBytes("UTF-8"))
      }
    val sigs = Multimodal.perceptualHash(records).toDF()
    Multimodal.phashPairs(sigs, maxHamming = 8)
      .withColumn("ham", col("ham").cast("long"))
      .orderBy("a_id", "b_id")
  }

  /** Graph-index INSERT under the gate ([[Similarity.graphAppend]],
    * the HNSW/DiskANN insert path, batch form): five new nodes
    * (vec_id 200..204) each beam-search the EXISTING 200-node graph
    * for their 3 nearest, join with BIDIRECTIONAL edges (in-edges make
    * the new node findable), and every touched node's out-edges recap
    * to maxDegree = 4 by cosine — the degree bound that keeps per-hop
    * fan-out constant as the graph grows. Batch-parallel by design
    * (every insert sees the pre-batch graph, not its siblings). The
    * oracle replays the stored-graph election WITH edge cosines, the
    * three beam hops per new node, the bidirectional union, and the
    * per-source recap rank. */
  val annGraphAppend = Q("ann_graph_append",
    s"""WITH $sqlKnnGraph,
       |q AS (SELECT vec_id AS q_id, embedding AS q_vec FROM embeddings
       |  WHERE vec_id >= 200 AND vec_id < 205),
       |f0 AS (SELECT q_id, (SELECT MIN(vec_id) FROM base) AS n_id FROM q),
       |${sqlCosHop("f0", "c1", "s1", "f1", 4)},
       |${sqlCosHop("f1", "c2", "s2", "f2", 4)},
       |${sqlCosHop("f2", "c3", "s3", "f3", 4)},
       |fnd AS (SELECT q_id, n_id, cs, ROW_NUMBER() OVER (
       |  PARTITION BY q_id ORDER BY cs DESC, n_id ASC) AS rnk
       |  FROM s3 WHERE rn <= 4 AND q_id <> n_id),
       |top AS (SELECT q_id, n_id, cs FROM fnd WHERE rnk <= 3),
       |alle AS (SELECT src_id, nbr_id, cos FROM g
       |  UNION ALL SELECT q_id AS src_id, n_id AS nbr_id, cs AS cos FROM top
       |  UNION ALL SELECT n_id AS src_id, q_id AS nbr_id, cs AS cos FROM top),
       |rec AS (SELECT src_id, nbr_id, cos, ROW_NUMBER() OVER (
       |  PARTITION BY src_id ORDER BY cos DESC, nbr_id ASC) AS r FROM alle)
       |SELECT src_id, nbr_id, cos FROM rec WHERE r <= 4
       |ORDER BY src_id, nbr_id""".stripMargin) { (s, d) =>
    val e = emb(s, d)
    val base = e.filter(col("vec_id") < 200)
    val cent = base.filter(col("vec_id") === 0)
      .select(lit(0).cast("int").as("cell"), col("embedding").as("c_vec"))
    val g = Similarity.knnGraph(base, cent, "vec_id", "embedding", k = 3)
      .select("src_id", "nbr_id", "cos")
    val batch = e.filter(col("vec_id") >= 200 && col("vec_id") < 205)
    Similarity.graphAppend(g, base, batch, "vec_id", "embedding",
      k = 3, beam = 4, hops = 3, maxDegree = 4)
      .orderBy("src_id", "nbr_id")
  }

  /** Multi-probe LSH under the gate ([[Similarity.lshMultiProbeTopK]]):
    * each query probes its own bucket PLUS the nPlanes = 4 buckets one
    * sign-bit away — the standard LSH recall knob (a true neighbor on
    * the far side of ONE hyperplane is exactly one bucket-bit away;
    * probing those buckets recovers it without re-hashing). The corpus
    * side is untouched — one bucket per row — and the 5× probe fan-out
    * rides the broadcast query side. The oracle extends the
    * `ann_lsh_topk` bucket algebra with the bit-flip probe expansion. */
  val annLshMultiprobe = Q("ann_lsh_multiprobe", {
    def bit(p: Int, v: String) =
      s"""(CASE WHEN list_reduce(list_prepend(0.0, list_transform(range(1, 65),
         |  i -> CAST($v[i] AS DOUBLE) * (CASE WHEN substr(md5('$p:' ||
         |    CAST(i - 1 AS VARCHAR)), 1, 1) >= '8' THEN 1.0 ELSE -1.0 END))),
         |  (x, y) -> x + y) >= 0.0 THEN '1' ELSE '0' END)""".stripMargin
    val bkt = (v: String) => (0 until 4).map(p => bit(p, v)).mkString(" || ")
    s"""WITH b AS (SELECT vec_id, embedding, ${bkt("embedding")} AS bkt
       |  FROM embeddings),
       |q0 AS (SELECT vec_id AS q_id, embedding AS q_vec, bkt FROM b
       |  WHERE vec_id < 5),
       |pr AS (SELECT q_id, q_vec, CASE WHEN t.f = 0 THEN bkt ELSE
       |    substr(bkt, 1, CAST(t.f AS INT) - 1)
       |    || (CASE WHEN substr(bkt, CAST(t.f AS INT), 1) = '1'
       |        THEN '0' ELSE '1' END)
       |    || substr(bkt, CAST(t.f AS INT) + 1, 4) END AS pbkt
       |  FROM q0 CROSS JOIN (SELECT unnest(range(0, 5)) AS f) t),
       |c AS (SELECT vec_id AS n_id, embedding AS n_vec, bkt FROM b),
       |sc AS (SELECT q_id, n_id,
       |    ${Registry10.sqlCos("q_vec", "n_vec")} AS cos
       |  FROM c JOIN pr ON c.bkt = pr.pbkt WHERE q_id <> n_id),
       |r AS (SELECT q_id, n_id, cos, CAST(ROW_NUMBER() OVER
       |  (PARTITION BY q_id ORDER BY cos DESC, n_id) AS BIGINT) AS rnk
       |  FROM sc)
       |SELECT q_id, n_id, rnk, cos FROM r WHERE rnk <= 3
       |ORDER BY q_id, rnk""".stripMargin
  }) { (s, d) =>
    val e = emb(s, d)
    Similarity.lshMultiProbeTopK(e.filter(col("vec_id") < 5), e,
      "vec_id", "embedding", k = 3, nPlanes = 4, dim = 64)
      .withColumn("rnk", col("rnk").cast("long"))
      .orderBy("q_id", "rnk")
  }

  /** STREAMING index SERVE: the query-time arrival path of the
    * deployed IVF-PQ index — query pages as file-source micro-batches,
    * each batch scored against the STORED (vec_id, cell, codes) ledger
    * ([[Similarity.ivfPqTopKFromIndex]]: no corpus floats load, no
    * encode runs; ingest paid those once) and its results appended to
    * a parquet sink. Pages OVERLAP by one query (at-least-once
    * replay): serving is stateless per query and the scoring is
    * deterministic, so replayed results are BYTE-identical rows and
    * dedup-on-read (DISTINCT over the sink) is the idempotence story —
    * the serve-side dual of the ingest gates' id anti-join. The gate
    * asserts the drained, deduped sink equals the from-scratch batch
    * ranking (`ann_ivf_pq_topk`'s oracle verbatim). */
  val streamingAnnServe = Q("streaming_ann_serve",
    s"""WITH ${Registry10.sqlPqCodes},
       |qd AS (SELECT q.vec_id AS q_id, js.j AS sub, c.code,
       |    ${Registry10.sqlSubDist("q.embedding", "c.w", "js.j")} AS dist
       |  FROM embeddings q CROSS JOIN js CROSS JOIN cw c
       |  WHERE q.vec_id < 5),
       |${Registry10.sqlIvfAdcRank("codes", "qd")}
       |SELECT q_id, n_id, rnk, adc FROM r WHERE rnk <= 5
       |ORDER BY q_id, rnk""".stripMargin) { (s, d) =>
    val (e, cent, cb) = Registry10.ivfPqSparkInputs(s, d)
    val fx = FixtureCache.cached(d, "aserve", 1, Seq("embeddings")) { tmp =>
      val pages = tmp.resolve("pages")
      java.nio.file.Files.createDirectories(pages)
      val base = System.currentTimeMillis() - 3600L * 1000
      val bounds = Seq((0L, 3L), (2L, 5L)) // one-query overlap
      bounds.zipWithIndex.foreach { case ((lo, hi), p) =>
        val tmpd = tmp.resolve(s"tmp$p")
        e.filter(col("vec_id") >= lo && col("vec_id") < hi)
          .repartition(1).write.mode("overwrite").parquet(tmpd.toString)
        val parts = tmpd.toFile.listFiles().toSeq
          .filter(_.getName.endsWith(".parquet")).sortBy(_.getName)
        parts.zipWithIndex.foreach { case (f, i) =>
          val dest = pages.resolve(s"page$p-$i.parquet")
          java.nio.file.Files.move(f.toPath, dest)
          java.nio.file.Files.setLastModifiedTime(dest,
            java.nio.file.attribute.FileTime.fromMillis(base + p * 60000L))
        }
        FixtureCache.deleteRecursively(tmpd)
      }
    }
    val stage = StreamHarness.runDir("graft_aserve")
    val ledgerDir = stage.resolve("ledger").toString
    val sinkDir = stage.resolve("results").toString
    Similarity.pqIndexBuild(e, cent, cb, "vec_id", "embedding")
      .write.mode("overwrite").parquet(ledgerDir)
    import org.apache.spark.sql.types._
    s.createDataFrame(s.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      StructType(Seq(StructField("q_id", LongType),
        StructField("n_id", LongType), StructField("rnk", IntegerType),
        StructField("adc", DoubleType))))
      .write.mode("overwrite").parquet(sinkDir)
    val stream = s.readStream
      .schema("vec_id LONG, embedding ARRAY<FLOAT>, label INT")
      .option("maxFilesPerTrigger", "1")
      .parquet(fx.resolve("pages").toString)
    val serveBatch: (DataFrame, Long) => Unit = { (b, _) =>
      val ledger = s.read.parquet(ledgerDir)
      Similarity.ivfPqTopKFromIndex(b, ledger, cent, cb,
        "vec_id", "embedding", k = 5, nProbe = 4)
        .write.mode("append").parquet(sinkDir)
    }
    val run = stream.writeStream
      .foreachBatch(serveBatch)
      .option("checkpointLocation", stage.resolve("ckpt").toString)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    run.awaitTermination()
    s.read.parquet(sinkDir).distinct()
      .withColumn("rnk", col("rnk").cast("long"))
      .orderBy("q_id", "rnk")
  }

  /** BLOCKED perceptual-hash near-dup ([[graft.operators.Multimodal]]
    * `phashPairs(blockCol)`): candidates must also match a
    * payload-length bucket (⌊len/100⌋) — the compound band key that
    * multiplies the effective slice alphabet without widening
    * signatures, the measured prescription for the hot-slice Σn²
    * saturation the unblocked probe surfaced (SCALE.md: banded pairs
    * grew ~60× for 10× docs; the `dedup_simhash_blocked` fix, applied
    * to the phash family). Blocking is also SEMANTICALLY sound for
    * media near-dup: a re-encoded copy keeps roughly its payload size,
    * while two frames that merely share a brightness layout at very
    * different sizes are the false-positive class the block key
    * removes. Same scoring and threshold as `multimodal_phash_pairs` —
    * its result restricted to same-bucket pairs. */
  val multimodalPhashBlocked = Q("multimodal_phash_blocked",
    s"""WITH rec AS (SELECT doc_id AS id, text, length(text) AS n
       |  FROM documents),
       |cells AS (SELECT id, i, CASE WHEN n = 0 THEN 0
       |    ELSE ascii(substring(text, CAST(i * n // 64 AS BIGINT) + 1, 1))
       |    END AS c
       |  FROM rec CROSS JOIN (SELECT unnest(range(0, 64)) AS i)),
       |sums AS (SELECT id, SUM(c) AS s FROM cells GROUP BY id),
       |sig AS (SELECT c2.id, string_agg(
       |    CASE WHEN c2.c * 64 > m.s THEN '1' ELSE '0' END, ''
       |    ORDER BY c2.i) AS sig
       |  FROM cells c2 JOIN sums m ON m.id = c2.id GROUP BY c2.id),
       |sb AS (SELECT s.id, s.sig, r.n // 100 AS blk
       |  FROM sig s JOIN rec r ON r.id = s.id),
       |sl AS (SELECT id, blk, k, substring(sig, k * 16 + 1, 16) AS v
       |  FROM sb CROSS JOIN (SELECT unnest(range(0, 4)) AS k)),
       |cand AS (SELECT DISTINCT a.id AS a_id, b.id AS b_id
       |  FROM sl a JOIN sl b ON a.k = b.k AND a.v = b.v
       |    AND a.blk = b.blk AND a.id < b.id),
       |h AS (SELECT c.a_id, c.b_id,
       |    list_reduce(list_prepend(0, list_transform(range(1, 65), t ->
       |      CASE WHEN substring(sa.sig, CAST(t AS INT), 1)
       |        <> substring(sb2.sig, CAST(t AS INT), 1) THEN 1 ELSE 0 END)),
       |      (x, y) -> x + y) AS ham
       |  FROM cand c JOIN sig sa ON sa.id = c.a_id
       |  JOIN sig sb2 ON sb2.id = c.b_id)
       |SELECT a_id, b_id, CAST(ham AS BIGINT) AS ham FROM h WHERE ham <= 8
       |ORDER BY a_id, b_id""".stripMargin) { (s, d) =>
    import s.implicits._
    import graft.operators.Multimodal
    val dd = docs(s, d)
    val records = dd.select(col("doc_id").as("id"), col("text"))
      .as[(Long, String)]
      .map { case (id, text) =>
        Multimodal.MediaRecord(id, "text", text.getBytes("UTF-8"))
      }
    val sigs = Multimodal.perceptualHash(records).toDF()
      .join(dd.select(col("doc_id").as("id"),
        expr("CAST(length(text) AS BIGINT) DIV 100").as("blk")), "id")
    Multimodal.phashPairs(sigs, maxHamming = 8, blockCol = Some("blk"))
      .withColumn("ham", col("ham").cast("long"))
      .orderBy("a_id", "b_id")
  }

  /** CONNECTED graph search under the gate
    * ([[Similarity.knnGraphConnected]] → [[Similarity.graphSearchTopK]]):
    * the 200-node corpus splits into 8 Voronoi cells, the within-cell
    * kNN edges get a medoid "highway" overlay (each cell's minimum-id
    * member links bidirectionally to the medoids of its 2 nearest
    * cells by centroid cosine), and the beam search runs over the
    * union — the cross-cell fix for the island recall bound the
    * cell-restricted build measures at scale (SCALE.md: recall@10
    * 0.064 → 0.498). The oracle replays cell assignment, the
    * within-cell kNN election, the medoid election, the cell-pair
    * rank, the medoid-cosine highway edges, and the beam hops over
    * the union. */
  val annGraphConnected = Q("ann_graph_connected",
    s"""WITH base AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id < 200),
       |cent AS (SELECT CAST(vec_id AS INT) AS cell, embedding AS c_vec
       |  FROM base WHERE vec_id < 8),
       |asg AS (SELECT n_id, cell FROM (
       |  SELECT b.vec_id AS n_id, c.cell, ROW_NUMBER() OVER (
       |    PARTITION BY b.vec_id
       |    ORDER BY ${Registry10.sqlCos("b.embedding", "c.c_vec")} DESC,
       |      c.cell DESC) AS rn
       |  FROM base b CROSS JOIN cent c) WHERE rn = 1),
       |gl AS (SELECT src_id, nbr_id, cs AS cos FROM (
       |  SELECT a.vec_id AS src_id, b.vec_id AS nbr_id,
       |    ${Registry10.sqlCos("a.embedding", "b.embedding")} AS cs,
       |    ROW_NUMBER() OVER (PARTITION BY a.vec_id
       |    ORDER BY ${Registry10.sqlCos("a.embedding", "b.embedding")} DESC,
       |      b.vec_id ASC) AS rn
       |  FROM base a JOIN base b ON a.vec_id <> b.vec_id
       |  JOIN asg aa ON aa.n_id = a.vec_id
       |  JOIN asg ab ON ab.n_id = b.vec_id AND ab.cell = aa.cell)
       |  WHERE rn <= 3),
       |md AS (SELECT cell, MIN(n_id) AS mid FROM asg GROUP BY cell),
       |cp AS (SELECT a_cell, b_cell FROM (
       |  SELECT a.cell AS a_cell, b.cell AS b_cell, ROW_NUMBER() OVER (
       |    PARTITION BY a.cell
       |    ORDER BY ${Registry10.sqlCos("a.c_vec", "b.c_vec")} DESC,
       |      b.cell DESC) AS rn
       |  FROM cent a JOIN cent b ON a.cell <> b.cell) WHERE rn <= 2),
       |hw0 AS (SELECT ma.mid AS src_id, mb.mid AS nbr_id,
       |    ${Registry10.sqlCos("ea.embedding", "eb.embedding")} AS cos
       |  FROM cp JOIN md ma ON ma.cell = cp.a_cell
       |  JOIN md mb ON mb.cell = cp.b_cell
       |  JOIN base ea ON ea.vec_id = ma.mid
       |  JOIN base eb ON eb.vec_id = mb.mid
       |  WHERE ma.mid <> mb.mid),
       |g AS (SELECT DISTINCT src_id, nbr_id, cos FROM (
       |  SELECT src_id, nbr_id, cos FROM gl
       |  UNION ALL SELECT src_id, nbr_id, cos FROM hw0
       |  UNION ALL SELECT nbr_id AS src_id, src_id AS nbr_id, cos FROM hw0)),
       |q AS (SELECT vec_id AS q_id, embedding AS q_vec FROM base
       |  WHERE vec_id < 5),
       |f0 AS (SELECT q_id, (SELECT MIN(vec_id) FROM base) AS n_id FROM q),
       |${sqlCosHop("f0", "c1", "s1", "f1", 4)},
       |${sqlCosHop("f1", "c2", "s2", "f2", 4)},
       |${sqlCosHop("f2", "c3", "s3", "f3", 4)},
       |r AS (SELECT q_id, n_id, cs AS cos, CAST(ROW_NUMBER() OVER (
       |  PARTITION BY q_id ORDER BY cs DESC, n_id ASC) AS BIGINT) AS rnk
       |  FROM s3 WHERE rn <= 4 AND q_id <> n_id)
       |SELECT q_id, n_id, rnk, cos FROM r WHERE rnk <= 3
       |ORDER BY q_id, rnk""".stripMargin) { (s, d) =>
    val e = emb(s, d).filter(col("vec_id") < 200)
    val cent = e.filter(col("vec_id") < 8)
      .select(col("vec_id").cast("int").as("cell"), col("embedding").as("c_vec"))
    val g = Similarity.knnGraphConnected(e, cent, "vec_id", "embedding",
      k = 3, cellNeighbors = 2)
    Similarity.graphSearchTopK(e.filter(col("vec_id") < 5), e, g,
      "vec_id", "embedding", k = 3, beam = 4, hops = 3)
      .withColumn("rnk", col("rnk").cast("long"))
      .orderBy("q_id", "rnk")
  }

  val round12c: Seq[Q] =
    Seq(annSq8TopK, annGraphSearch, textBm25TopK, hybridRrfTopK,
      annMaxSimTopK, annGraphSearchPq, mineHardNegatives,
      textBm25IndexAppend, textBm25IndexRemove, evalRetrievalQuality,
      streamingBm25Ingest, annIvfSq8TopK, textBm25Prf,
      multimodalPhashPairs, annGraphAppend, annLshMultiprobe,
      streamingAnnServe, multimodalPhashBlocked, annGraphConnected)
}
