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

  /** Quantizer REFRESH under the gate ([[Similarity.pqIndexReencode]]):
    * a ledger built over the full corpus with quantizer A (the seed
    * centroids/codebook from vec_id < 16), takedown-pruned
    * (vec_id ≡ 0 mod 7 removed), then re-encoded under quantizer B
    * (seeded from vec_id 16..31 — the "retrained on the current
    * corpus" stand-in) must equal a from-scratch quantizer-B build of
    * exactly the SURVIVING membership — the ledger is the membership
    * authority (its id set carries the append/remove history), the
    * corpus the float authority. The oracle computes quantizer B's
    * assignment + codes over the survivors directly. */
  val annIndexReencode = Q("ann_index_reencode",
    s"""WITH cwb AS (SELECT CAST(vec_id - 16 AS INT) AS code,
       |    embedding AS w
       |  FROM embeddings WHERE vec_id >= 16 AND vec_id < 32),
       |js AS (SELECT unnest(range(0, 8)) AS j),
       |cd AS (SELECT b.vec_id AS n_id, js.j AS sub, c.code,
       |    ${Registry10.sqlSubDist("b.embedding", "c.w", "js.j")} AS dist
       |  FROM embeddings b CROSS JOIN js CROSS JOIN cwb c
       |  WHERE b.vec_id % 7 <> 0),
       |codes AS (SELECT n_id, sub, code FROM (
       |  SELECT n_id, sub, code, ROW_NUMBER() OVER (
       |    PARTITION BY n_id, sub ORDER BY dist ASC, code ASC) AS rn
       |  FROM cd) WHERE rn = 1),
       |centb AS (SELECT CAST(vec_id - 16 AS INT) AS cell,
       |    embedding AS c_vec
       |  FROM embeddings WHERE vec_id >= 16 AND vec_id < 32),
       |asg AS (SELECT n_id, cell FROM (
       |  SELECT b.vec_id AS n_id, c.cell, ROW_NUMBER() OVER (
       |    PARTITION BY b.vec_id
       |    ORDER BY ${Registry10.sqlCos("b.embedding", "c.c_vec")} DESC,
       |      c.cell DESC) AS rn
       |  FROM embeddings b CROSS JOIN centb c
       |  WHERE b.vec_id % 7 <> 0) WHERE rn = 1)
       |SELECT a.n_id AS vec_id, a.cell,
       |  array_to_string(list(CAST(n.code AS INT) ORDER BY n.sub), ',') AS codes
       |FROM asg a JOIN codes n ON n.n_id = a.n_id
       |GROUP BY a.n_id, a.cell ORDER BY vec_id""".stripMargin) { (s, d) =>
    val (e, centA, cbA) = Registry10.ivfPqSparkInputs(s, d)
    val ledger = Similarity.pqIndexBuild(e, centA, cbA,
      "vec_id", "embedding")
    val survived = Similarity.pqIndexRemove(ledger,
      e.filter(col("vec_id") % 7 === 0).select("vec_id"), "vec_id")
    // quantizer B: seeded from the NEXT 16 corpus vectors (ids 16..31
    // re-based to 0..15 — pqCodebookSeed seeds from idCol < ksub)
    val eShift = e.withColumn("vec_id", col("vec_id") - 16)
      .filter(col("vec_id") >= 0)
    val cbB = Similarity.pqCodebookSeed(eShift, "vec_id", "embedding",
      m = 8, ksub = 16, subDim = 8)
    val centB = e.filter(col("vec_id") >= 16 && col("vec_id") < 32)
      .select((col("vec_id") - 16).cast("int").as("cell"),
        col("embedding").as("c_vec"))
    Similarity.pqIndexReencode(survived, e, centB, cbB,
      "vec_id", "embedding")
      .withColumn("codes", array_join(col("codes"), ","))
      .orderBy("vec_id")
  }

  // ----------------------------------------------- shared text analyzer

  /** The deterministic case/punctuation PERTURBATION both engines
    * apply to the (all-lowercase, alnum) synthetic corpus so the
    * analyzer has real work to undo: token w uppercases iff
    * md5(w)[1] ≥ '8' (~half the vocabulary) and gains a trailing
    * comma iff md5(w)[2] ≥ 'c' (~quarter) — content-derived, so the
    * two engines perturb identically with no side channel. */
  private def perturbed: org.apache.spark.sql.Column =
    array_join(transform(split(col("text"), " "), w =>
      concat(
        when(substring(md5(w), 1, 1) >= "8", upper(w)).otherwise(w),
        when(substring(md5(w), 2, 1) >= "c", lit(",")).otherwise(lit("")))),
      " ")

  // no line may START with "||": the embedding oracle's stripMargin
  // would eat one pipe and leave a binary | over VARCHARs
  private val sqlPerturb: String =
    """array_to_string(list_transform(string_split(text, ' '),
      |    w -> (CASE WHEN substr(md5(w), 1, 1) >= '8'
      |            THEN upper(w) ELSE w END) ||
      |      (CASE WHEN substr(md5(w), 2, 1) >= 'c'
      |            THEN ',' ELSE '' END)), ' ')""".stripMargin

  /** The shared ANALYZER under the gate ([[TextFns.analyze]] /
    * [[TextFns.analyzeStop]]): the corpus is case/punctuation-
    * perturbed (see [[perturbed]] — "court" becomes "COURT,"), then
    * normalized back — lowercase, non-alphanumeric runs collapsed to
    * one space, trimmed — plus the stopword-removal face. The oracle
    * replays the perturbation AND the full normalization chain in
    * DuckDB, so a drift in either engine's regex/case/stoplist
    * algebra flips the hash. This is the one normalization every
    * tokenizing build composes with (the gates below prove the
    * composition against the BM25 and positional families). */
  val textAnalyze = Q("text_analyze", {
    val stop = graft.functions.TextFns.EnStop
      .map(w => s"'$w'").mkString("[", ", ", "]")
    s"""WITH p AS (SELECT doc_id, $sqlPerturb AS pert FROM documents),
       |a AS (SELECT doc_id, pert,
       |    trim(regexp_replace(lower(pert), '[^a-z0-9]+', ' ', 'g'))
       |      AS analyzed
       |  FROM p)
       |SELECT doc_id, pert, analyzed,
       |  array_to_string(list_filter(string_split(analyzed, ' '),
       |    w -> NOT list_contains($stop, w)), ' ') AS analyzed_stop
       |FROM a ORDER BY doc_id""".stripMargin
  }) { (s, d) =>
    import graft.functions.TextFns
    docs(s, d).select(col("doc_id"), perturbed.as("pert"))
      .select(col("doc_id"), col("pert"),
        TextFns.analyze(col("pert")).as("analyzed"),
        TextFns.analyzeStop(col("pert")).as("analyzed_stop"))
      .orderBy("doc_id")
  }

  /** BM25 THROUGH the analyzer — the unification identity: the
    * perturbed corpus ("Court," ≠ "court" under the raw split) is
    * analyzed and fed to the UNCHANGED stored-index BM25 build +
    * serve; the oracle is `text_bm25_topk`'s chain over the RAW
    * corpus. A hash match proves analyze ∘ perturb = id on this
    * corpus — i.e. the analyzer unifies every case/punctuation
    * variant back to the raw term, scores and ranks bit-identical,
    * with the build's tokenizer untouched (normalization composes,
    * it does not fork the index algebra). Queries analyze with the
    * same function — the index/query analyzer pairing the scaladoc
    * prescribes. */
  val textBm25Analyzed = Q("text_bm25_analyzed",
    s"""WITH ${Registry12.sqlBm25(10)}
       |SELECT q_id, doc_id, rnk, score FROM lex
       |ORDER BY q_id, rnk""".stripMargin) { (s, d) =>
    import graft.functions.TextFns
    val dd = docs(s, d).withColumn("text", perturbed)
    val analyzed = dd.withColumn("text", TextFns.analyze(col("text")))
    val ledger = Retrieval.bm25IndexBuild(analyzed, "doc_id", "text")
    val qt = analyzed.filter(col("doc_id") < 3)
      .select(col("doc_id").as("q_id"),
        explode(split(col("text"), " ")).as("term"))
    Retrieval.bm25TopKFromIndex(qt, ledger, k = 10)
      .withColumn("rnk", col("rnk").cast("long"))
      .orderBy("q_id", "rnk")
  }

  /** Metadata-FILTERED BM25 serve from the stored tf ledger
    * ([[Retrieval.bm25TopKFromIndexFiltered]]) — "search within
    * tenant": candidates restrict to documents whose source matches
    * `src1*` (11 of 20 sources) BELOW the posting join, while
    * df/N/avgdl stay GLOBAL — allowed docs keep their unfiltered
    * scores (the filter changes WHO ranks, never HOW a doc scores),
    * the filtered-ANN convention (`ann_filtered_topk`'s frozen
    * quantizer) applied to the lexical family. The oracle keeps the
    * full-corpus tf/dl/dfreq/stt CTEs and restricts the scoring join
    * by the same predicate. */
  val textBm25Filtered = Q("text_bm25_filtered",
    s"""WITH toks AS (SELECT doc_id, term FROM (
       |  SELECT doc_id, unnest(string_split(text, ' ')) AS term
       |  FROM documents) WHERE term <> ''),
       |tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM toks GROUP BY 1, 2),
       |dl AS (SELECT doc_id, COUNT(*) AS dl FROM toks GROUP BY 1),
       |dfreq AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY 1),
       |stt AS (SELECT COUNT(*) AS n_docs, SUM(dl) AS sum_dl FROM dl),
       |qt AS (SELECT DISTINCT doc_id AS q_id, term FROM toks WHERE doc_id < 3),
       |alw AS (SELECT doc_id FROM documents WHERE source LIKE 'src1%'),
       |tsc AS (SELECT q.q_id, tf.doc_id, tf.term,
       |    (((CAST(stt.n_docs AS DOUBLE) - CAST(f.df AS DOUBLE)) + 0.5)
       |       / (CAST(f.df AS DOUBLE) + 0.5))
       |    * (CAST(tf.tf AS DOUBLE) * (1.2 + 1.0))
       |    / (CAST(tf.tf AS DOUBLE) + 1.2 * (1.0 - 0.75
       |        + 0.75 * (CAST(dl.dl AS DOUBLE)
       |          / (CAST(stt.sum_dl AS DOUBLE) / CAST(stt.n_docs AS DOUBLE)))))
       |      AS v
       |  FROM tf JOIN alw USING (doc_id) JOIN qt q USING (term)
       |  JOIN dl USING (doc_id) CROSS JOIN stt JOIN dfreq f USING (term)),
       |sc AS (SELECT q_id, doc_id,
       |    list_reduce(list_prepend(0.0, list(v ORDER BY term)),
       |      (x, y) -> x + y) AS score
       |  FROM tsc WHERE q_id <> doc_id GROUP BY 1, 2),
       |fout AS (SELECT q_id, doc_id, rnk, score FROM (
       |  SELECT q_id, doc_id, score, CAST(ROW_NUMBER() OVER (
       |    PARTITION BY q_id ORDER BY score DESC, doc_id ASC) AS BIGINT) AS rnk
       |  FROM sc) WHERE rnk <= 10)
       |SELECT q_id, doc_id, rnk, score FROM fout
       |ORDER BY q_id, rnk""".stripMargin) { (s, d) =>
    val dcs = docs(s, d)
    val ledger = Retrieval.bm25IndexBuild(dcs, "doc_id", "text")
    val qt = dcs.filter(col("doc_id") < 3)
      .select(col("doc_id").as("q_id"),
        explode(split(col("text"), " ")).as("term"))
    val allowed = dcs.filter(col("source").startsWith("src1"))
      .select("doc_id")
    Retrieval.bm25TopKFromIndexFiltered(qt, ledger, allowed, k = 10)
      .withColumn("rnk", col("rnk").cast("long"))
      .orderBy("q_id", "rnk")
  }

  /** Phrase match THROUGH the analyzer — the positional family's
    * unification identity: positions index the analyzed perturbed
    * corpus, phrases are the analyzed first three words of docs 0..2,
    * and the oracle is `text_phrase_match`'s raw-corpus algebra. A
    * perturbed token that failed to unify would shift or break a
    * phrase's consecutive-position cover and flip occurrence counts. */
  val textPhraseAnalyzed = Q("text_phrase_analyzed",
    s"""WITH pl AS (SELECT doc_id, term, pos FROM (
       |  SELECT d.doc_id, u.i - 1 AS pos, d.parts[u.i] AS term
       |  FROM (SELECT doc_id, string_split(text, ' ') AS parts
       |    FROM documents) d,
       |  UNNEST(range(1, len(d.parts) + 1)) AS u(i))
       |  WHERE term <> ''),
       |ph AS (SELECT q_id, idx, term FROM (
       |  SELECT d.doc_id AS q_id, u.i - 1 AS idx, d.parts[u.i] AS term
       |  FROM (SELECT doc_id, string_split(text, ' ') AS parts
       |    FROM documents WHERE doc_id < 3) d,
       |  UNNEST(range(1, 4)) AS u(i)) WHERE term <> ''),
       |hits AS (SELECT p.q_id, l.doc_id, l.pos - p.idx AS base,
       |    COUNT(*) AS k
       |  FROM pl l JOIN ph p ON p.term = l.term
       |  WHERE l.pos - p.idx >= 0
       |  GROUP BY 1, 2, 3),
       |nt AS (SELECT q_id, COUNT(DISTINCT idx) AS n FROM ph GROUP BY 1)
       |SELECT h.q_id, h.doc_id, CAST(COUNT(*) AS BIGINT) AS occurrences
       |FROM hits h JOIN nt ON nt.q_id = h.q_id WHERE h.k = nt.n
       |GROUP BY h.q_id, h.doc_id
       |ORDER BY h.q_id, h.doc_id""".stripMargin) { (s, d) =>
    import graft.functions.TextFns
    val analyzed = docs(s, d).withColumn("text", perturbed)
      .withColumn("text", TextFns.analyze(col("text")))
    val ledger = Retrieval.positionalIndexBuild(analyzed, "doc_id", "text")
    val ph = analyzed.filter(col("doc_id") < 3)
      .select(col("doc_id").as("q_id"),
        posexplode(slice(split(col("text"), " "), 1, 3))
          .as(Seq("idx", "term")))
    Retrieval.phraseMatch(ph, ledger)
      .orderBy("q_id", "doc_id")
  }

  /** BPE THROUGH the analyzer — the third unification identity,
    * completing the triple the round-14 verdict named (BM25,
    * positions, BPE): merges learned over the analyzed perturbed
    * corpus hash-match `text_bpe_vocab`'s raw-corpus oracle — the
    * case/punctuation noise that would otherwise fracture the word
    * histogram ("Court," and "court" training as distinct words with
    * split frequencies, electing different merges) normalizes away
    * before the histogram exchange. */
  val textBpeAnalyzed = Q("text_bpe_analyzed",
    s"""WITH ${Registry13.sqlBpeChainShared(8)}
       |SELECT step, l AS lhs, r AS rhs, cnt
       |FROM (${(1 to 8).map(i => s"SELECT * FROM b$i").mkString(" UNION ALL ")})
       |ORDER BY step""".stripMargin) { (s, d) =>
    import graft.functions.TextFns
    val analyzed = docs(s, d).withColumn("text", perturbed)
      .withColumn("text", TextFns.analyze(col("text")))
    Vocab.bpeTrain(analyzed, "text", merges = 8)
      .orderBy("step")
  }

  // ------------------------------------- semantic dedup, arrival face

  /** Incremental SEMANTIC near-dup maintenance — the arrival face the
    * lexical family already ships (`dedup_clusters_incremental`),
    * completed for the embedding signal: a pre-batch corpus
    * (vec_id % 40 ≠ 23) holds a stored label ledger (semantic
    * PQ-prefix pairs → [[Dedup.connectedComponents]]) and a stored
    * block index ([[Similarity.semanticBlockIndex]]); the arriving
    * batch (vec_id % 40 = 23) encodes against the FROZEN codebook,
    * blocks against the stored index
    * ([[Similarity.semanticPqPairsAgainst]]) plus within itself, and
    * [[Dedup.connectedComponentsIncremental]] merges the incident
    * edges into the ledger label-graph-sized — never re-propagating
    * the corpus. The oracle is the batch-global answer
    * (`dedup_semantic_clusters`' full-corpus chain restricted to the
    * clusters the batch touches): incremental ≡ from-scratch is
    * exactly the maintenance contract. Batch ids avoid the seed
    * codewords (23 ∉ [0,16)) so the frozen codebook derives from
    * pre-batch data alone. */
  val dedupSemanticIncremental = Q("dedup_semantic_incremental",
    s"""WITH RECURSIVE ${Registry10.sqlPqCodes},
       |blk AS (SELECT n_id, array_to_string(
       |    list(CAST(code AS INT) ORDER BY sub), ',') AS blk
       |  FROM codes WHERE sub < 2 GROUP BY n_id),
       |vbase AS (SELECT b.vec_id AS id, b.embedding AS vec, k.blk
       |  FROM embeddings b JOIN blk k ON k.n_id = b.vec_id),
       |prs AS (SELECT a_id, b_id FROM (
       |  SELECT a.id AS a_id, b.id AS b_id,
       |    ${Registry10.sqlCos("a.vec", "b.vec")} AS cos
       |  FROM vbase a JOIN vbase b ON a.blk = b.blk AND a.id < b.id)
       |  WHERE cos >= 0.3),
       |edges AS (SELECT a_id AS s, b_id AS t FROM prs
       |  UNION SELECT b_id, a_id FROM prs),
       |reach(id, r) AS (
       |  SELECT s, s FROM edges
       |  UNION
       |  SELECT e.s, reach.r FROM edges e JOIN reach ON reach.id = e.t),
       |lbl AS (SELECT id, MIN(r) AS cl FROM reach GROUP BY id),
       |alldocs AS (SELECT b.vec_id, COALESCE(l.cl, b.vec_id) AS cluster_id
       |  FROM embeddings b LEFT JOIN lbl l ON b.vec_id = l.id)
       |SELECT vec_id, cluster_id FROM alldocs
       |WHERE cluster_id IN (SELECT cluster_id FROM alldocs
       |                     WHERE vec_id % 40 = 23)
       |ORDER BY vec_id""".stripMargin) { (s, d) =>
    val e = emb(s, d)
    val stored = e.filter(col("vec_id") % 40 =!= 23)
    val batch = e.filter(col("vec_id") % 40 === 23)
    val cb = Similarity.pqCodebookSeed(e, "vec_id", "embedding",
      m = 8, ksub = 16, subDim = 8)
    // pre-batch assets: label ledger + block index, both stored-only
    val pairs0 = Similarity.semanticPqPairs(stored, cb, "vec_id",
      "embedding", threshold = 0.3, prefix = 2)
    val cc0 = Dedup.connectedComponents(pairs0, "a_id", "b_id")
    val ledger = stored.select(col("vec_id").as("id"))
      .join(cc0, Seq("id"), "left")
      .select(col("id"), coalesce(col("cluster"), col("id")).as("cluster"))
    val storedIdx = Similarity.semanticBlockIndex(stored, cb,
      "vec_id", "embedding", prefix = 2)
    // arrival: encode the batch only, block vs stored + within batch
    val batchIdx = Similarity.semanticBlockIndex(batch, cb,
      "vec_id", "embedding", prefix = 2)
    val incident = Similarity.semanticPqPairsAgainst(batchIdx, storedIdx,
        e, "vec_id", "embedding", threshold = 0.3)
      .unionByName(Similarity.semanticPqPairs(batch, cb, "vec_id",
        "embedding", threshold = 0.3, prefix = 2))
    val updated = Dedup.connectedComponentsIncremental(ledger,
      batch.select(col("vec_id")), "vec_id", incident, "a_id", "b_id")
    val touched = updated.filter(col("id") % 40 === 23)
      .select(col("cluster")).distinct()
    updated.join(broadcast(touched), Seq("cluster"))
      .select(col("id").as("vec_id"), col("cluster").as("cluster_id"))
      .orderBy("vec_id")
  }

  /** Semantic cluster TAKEDOWN ([[Similarity.semanticClustersRemove]])
    * — the deletion face completing the semantic family's
    * build / append / remove triple (the lexical family's
    * `dedup_clusters_remove` posture on the embedding signal):
    * vectors vec_id % 50 = 23 are removed from the stored corpus, and
    * the touched components' surviving members re-pair via the stored
    * block index + exact-cosine confirm and re-propagate — removal
    * can SPLIT a component, which no label mapping expresses. The
    * codebook stays FROZEN (seed ids 0..15 are never removed;
    * retraining on takedown would silently re-block the whole
    * ledger). Oracle: from-scratch closure over the SURVIVORS under
    * the same frozen codebook — deletion maintenance must be
    * indistinguishable from never having ingested the removed
    * vectors, and the full output ledger is gated so untouched-row
    * pass-through is proven too. */
  val dedupSemanticRemove = Q("dedup_semantic_remove",
    s"""WITH RECURSIVE cw AS (SELECT CAST(vec_id AS INT) AS code,
       |    embedding AS w
       |  FROM embeddings WHERE vec_id < 16),
       |js AS (SELECT unnest(range(0, 8)) AS j),
       |sv AS (SELECT vec_id, embedding FROM embeddings
       |  WHERE vec_id % 50 <> 23),
       |cd AS (SELECT b.vec_id AS n_id, js.j AS sub, c.code,
       |    ${Registry10.sqlSubDist("b.embedding", "c.w", "js.j")} AS dist
       |  FROM sv b CROSS JOIN js CROSS JOIN cw c),
       |codes AS (SELECT n_id, sub, code, dist FROM (
       |  SELECT n_id, sub, code, dist, ROW_NUMBER() OVER (
       |    PARTITION BY n_id, sub ORDER BY dist ASC, code ASC) AS rn
       |  FROM cd) WHERE rn = 1),
       |blk AS (SELECT n_id, array_to_string(
       |    list(CAST(code AS INT) ORDER BY sub), ',') AS blk
       |  FROM codes WHERE sub < 2 GROUP BY n_id),
       |vbase AS (SELECT b.vec_id AS id, b.embedding AS vec, k.blk
       |  FROM sv b JOIN blk k ON k.n_id = b.vec_id),
       |prs AS (SELECT a_id, b_id FROM (
       |  SELECT a.id AS a_id, b.id AS b_id,
       |    ${Registry10.sqlCos("a.vec", "b.vec")} AS cos
       |  FROM vbase a JOIN vbase b ON a.blk = b.blk AND a.id < b.id)
       |  WHERE cos >= 0.3),
       |edges AS (SELECT a_id AS s, b_id AS t FROM prs
       |  UNION SELECT b_id, a_id FROM prs),
       |reach(id, r) AS (
       |  SELECT s, s FROM edges
       |  UNION
       |  SELECT e.s, reach.r FROM edges e JOIN reach ON reach.id = e.t),
       |lbl AS (SELECT id, MIN(r) AS cl FROM reach GROUP BY id)
       |SELECT b.vec_id, COALESCE(l.cl, b.vec_id) AS cluster_id
       |FROM sv b LEFT JOIN lbl l ON b.vec_id = l.id
       |ORDER BY b.vec_id""".stripMargin) { (s, d) =>
    val e = emb(s, d)
    val cb = Similarity.pqCodebookSeed(e, "vec_id", "embedding",
      m = 8, ksub = 16, subDim = 8)
    val pairs0 = Similarity.semanticPqPairs(e, cb, "vec_id",
      "embedding", threshold = 0.3, prefix = 2)
    val cc0 = Dedup.connectedComponents(pairs0, "a_id", "b_id")
    val ledger = e.select(col("vec_id").as("id"))
      .join(cc0, Seq("id"), "left")
      .select(col("id"), coalesce(col("cluster"), col("id")).as("cluster"))
    val idx = Similarity.semanticBlockIndex(e, cb, "vec_id", "embedding",
      prefix = 2)
    val rm = e.filter(col("vec_id") % 50 === 23).select(col("vec_id"))
    Similarity.semanticClustersRemove(ledger, rm, "vec_id", idx,
      e, "embedding", threshold = 0.3)
      .select(col("id").as("vec_id"), col("cluster").as("cluster_id"))
      .orderBy("vec_id")
  }

  /** Drain the two-page fixture through
    * [[graft.operators.TxSemanticStack.commitBatch]] (manifest-protocol
    * commits over the 200-id base clustering, 16 buckets per keyed
    * view) and return the stack root — staged once per (dataset,
    * builder version), each gate mutating its own copy. Commit
    * versions: init = 0, page batches = 1, 2. The frozen codebook is
    * deterministic from the base corpus ([[Similarity.pqCodebookSeed]]),
    * so gates re-derive it bit-identically. */
  private[queries] def drainSemanticStack(s: SparkSession, d: String,
                                          tag: String): String = {
    import graft.operators.TxSemanticStack
    val fx0 = Registry13.gingestFixture(s, d)
    val fx = FixtureCache.cached(d, "semstack", 2, Seq("embeddings")) { tmp =>
      val e = emb(s, d)
      val base = e.filter(col("vec_id") < 200)
      val cb = Similarity.pqCodebookSeed(base, "vec_id", "embedding",
        m = 8, ksub = 16, subDim = 8)
      val pairs0 = Similarity.semanticPqPairs(base, cb, "vec_id",
        "embedding", threshold = 0.3, prefix = 2)
      val cc0 = Dedup.connectedComponents(pairs0, "a_id", "b_id")
      val ledger0 = base.select(col("vec_id").as("id"))
        .join(cc0, Seq("id"), "left")
        .select(col("id"),
          coalesce(col("cluster"), col("id")).as("cluster"))
      val idx0 = Similarity.semanticBlockIndex(base, cb, "vec_id",
        "embedding", prefix = 2)
      val root = tmp.resolve("stack").toString
      TxSemanticStack.init(s, root, ledger0, idx0, buckets = 16)
      val stream = s.readStream
        .schema("vec_id LONG, embedding ARRAY<FLOAT>, label INT")
        .option("maxFilesPerTrigger", "1")
        .parquet(fx0.resolve("pages").toString)
      val run = stream.writeStream
        .foreachBatch { (b: DataFrame, id: Long) =>
          TxSemanticStack.commitBatch(s, root, b, id, cb, e,
            "vec_id", "embedding", threshold = 0.3, prefix = 2,
            buckets = 16)
          ()
        }
        .option("checkpointLocation", tmp.resolve("ckpt").toString)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      run.awaitTermination()
      FixtureCache.deleteRecursively(tmp.resolve("ckpt"))
    }
    val stage = StreamHarness.runDir(tag)
    FixtureCache.copyInto(fx.resolve("stack"), stage.resolve("stack"))
    stage.resolve("stack").toString
  }

  /** STREAMING semantic-dedup ingest UNDER THE MANIFEST PROTOCOL — the
    * FIFTH ledger family's arrival face (after PQ codes, BM25 tf, the
    * kNN graph, and positions), drained through
    * [[graft.operators.TxSemanticStack]]: the family's THREE
    * mutually-derived assets — the label ledger in BOTH keyed layouts
    * (by id for seen-checks/lookups/serving, by cluster for the
    * relabel side) and the append-only block index — move in ONE
    * manifest swap per micro-batch, closing the in-place drain's torn
    * window (three independent dynamic overwrites could crash apart,
    * leaving the dual-keyed views DISAGREEING and the replay reading
    * half-mutated state; now the crashed batch's writes are invisible
    * orphans and replay re-derives from the committed cut —
    * exactly-once by batch-id high-water, SemanticStackSpec). Each
    * batch: anti-join already-seen ids (their own id-buckets only),
    * encode fresh rows against the FROZEN base codebook, block vs the
    * stored index (batch block-keys' buckets only) + within the batch,
    * merge incident edges with label-graph-sized incremental CC, land
    * touched buckets at a fresh version. Labels are arrival-order-free
    * (incremental ≡ batch-global CC — the gated
    * `dedup_semantic_incremental` identity), so the oracle is simply
    * the full-corpus semantic-cluster chain over every arrived id; the
    * gate also asserts the dual-keyed views agree at the committed
    * cut, which the one-swap commit makes invariant. */
  /** The semantic-ingest oracle, parameterized by the arrived-id bound
    * (< `bound`): full-corpus PQ-prefix blocking + exact-cosine pairs
    * + recursive-CTE connected components — incremental ≡ batch-global
    * CC is the gated identity that makes this the drain's truth at ANY
    * committed cut, which is why the snapshot gate can reuse it with
    * the pre-snapshot bound. */
  private[queries] def sqlSemanticIngestOracle(bound: Int,
      extra: String = "TRUE"): String =
    s"""WITH RECURSIVE eb AS (SELECT vec_id, embedding FROM embeddings
       |  WHERE vec_id < $bound AND $extra),
       |cw AS (SELECT CAST(vec_id AS INT) AS code, embedding AS w
       |  FROM embeddings WHERE vec_id < 16),
       |js AS (SELECT unnest(range(0, 8)) AS j),
       |cd AS (SELECT b.vec_id AS n_id, js.j AS sub, c.code,
       |    ${Registry10.sqlSubDist("b.embedding", "c.w", "js.j")} AS dist
       |  FROM eb b CROSS JOIN js CROSS JOIN cw c),
       |codes AS (SELECT n_id, sub, code, dist FROM (
       |  SELECT n_id, sub, code, dist, ROW_NUMBER() OVER (
       |    PARTITION BY n_id, sub ORDER BY dist ASC, code ASC) AS rn
       |  FROM cd) WHERE rn = 1),
       |blk AS (SELECT n_id, array_to_string(
       |    list(CAST(code AS INT) ORDER BY sub), ',') AS blk
       |  FROM codes WHERE sub < 2 GROUP BY n_id),
       |vbase AS (SELECT b.vec_id AS id, b.embedding AS vec, k.blk
       |  FROM eb b JOIN blk k ON k.n_id = b.vec_id),
       |prs AS (SELECT a_id, b_id FROM (
       |  SELECT a.id AS a_id, b.id AS b_id,
       |    ${Registry10.sqlCos("a.vec", "b.vec")} AS cos
       |  FROM vbase a JOIN vbase b ON a.blk = b.blk AND a.id < b.id)
       |  WHERE cos >= 0.3),
       |edges AS (SELECT a_id AS s, b_id AS t FROM prs
       |  UNION SELECT b_id, a_id FROM prs),
       |reach(id, r) AS (
       |  SELECT s, s FROM edges
       |  UNION
       |  SELECT e.s, reach.r FROM edges e JOIN reach ON reach.id = e.t),
       |lbl AS (SELECT id, MIN(r) AS cl FROM reach GROUP BY id)
       |SELECT b.vec_id, COALESCE(l.cl, b.vec_id) AS cluster_id
       |FROM eb b LEFT JOIN lbl l ON b.vec_id = l.id
       |ORDER BY b.vec_id""".stripMargin

  val streamingSemanticIngest = Q("streaming_semantic_ingest",
    sqlSemanticIngestOracle(210)) { (s, d) =>
    import graft.operators.TxSemanticStack
    val root = drainSemanticStack(s, d, "graft_semingest")
    // the two ledgers are dual-keyed views of ONE fact table — assert
    // they never drifted before serving the authoritative one (the
    // one-swap commit makes this invariant at every committed cut)
    val byId = TxSemanticStack.resolveLabels(s, root)
    val byCl = TxSemanticStack.resolveLabelsByCluster(s, root)
    require(byId.exceptAll(byCl).isEmpty && byCl.exceptAll(byId).isEmpty,
      "streaming_semantic_ingest: dual-keyed label ledgers drifted")
    byId.select(col("id").as("vec_id"), col("cluster").as("cluster_id"))
      .orderBy("vec_id")
  }

  /** FILTERED graph search under the gate
    * ([[Similarity.graphSearchTopKFiltered]]): the beam traverses the
    * FULL fixed 200-node graph — disallowed nodes still route, the
    * filtered-HNSW discipline — while only label < 5 nodes (~half)
    * may be returned; the beam widens 4 → 8 (widen = 2,
    * ⌈200/~100⌉ — the policy the auto face derives from counts,
    * pinned literal here so the oracle's unrolled hops share it). The
    * oracle replays the three beam-8 hops and applies the
    * allowed-filter + re-rank ONLY at the end — filtering inside the
    * hops would sever paths and is exactly what the operator must not
    * do (a traversal-filtered variant diverges from this oracle). */
  val annGraphFilteredTopK = Q("ann_graph_filtered_topk",
    s"""WITH ${Registry12.sqlKnnGraph},
       |q AS (SELECT vec_id AS q_id, embedding AS q_vec FROM base
       |  WHERE vec_id < 5),
       |f0 AS (SELECT q_id, (SELECT MIN(vec_id) FROM base) AS n_id FROM q),
       |${Registry12.sqlCosHop("f0", "c1", "s1", "f1", 8)},
       |${Registry12.sqlCosHop("f1", "c2", "s2", "f2", 8)},
       |${Registry12.sqlCosHop("f2", "c3", "s3", "f3", 8)},
       |r AS (SELECT q_id, n_id, cs AS cos, CAST(ROW_NUMBER() OVER (
       |  PARTITION BY q_id ORDER BY cs DESC, n_id ASC) AS BIGINT) AS rnk
       |  FROM s3 WHERE rn <= 8 AND q_id <> n_id
       |    AND n_id IN (SELECT vec_id FROM embeddings WHERE label < 5))
       |SELECT q_id, n_id, rnk, cos FROM r WHERE rnk <= 3
       |ORDER BY q_id, rnk""".stripMargin) { (s, d) =>
    val e = emb(s, d).filter(col("vec_id") < 200)
    val cent = e.filter(col("vec_id") === 0)
      .select(lit(0).cast("int").as("cell"), col("embedding").as("c_vec"))
    val g = Similarity.knnGraph(e, cent, "vec_id", "embedding", k = 3)
    Similarity.graphSearchTopKFiltered(e.filter(col("vec_id") < 5), e, g,
      e.filter(col("label") < 5), "vec_id", "embedding",
      k = 3, beam = 4, hops = 3, widen = 2)
      .withColumn("rnk", col("rnk").cast("long"))
      .orderBy("q_id", "rnk")
  }

  // ------------------------------------------------- mid-path BPE

  /** The shared head-election preamble for the two mid-path BPE
    * oracles: word histogram, guarded symbol strings, the
    * (freq DESC, w ASC) ranking with a running symbol-char sum, and
    * the `cap`-char head cut — [[graft.operators.Vocab.bpeTrainHead]]'s
    * election, replayed. `s0` is the head frame the merge rounds
    * consume. */
  private def sqlBpeHead(cap: Int): String =
    s"""w0 AS (SELECT term AS w, COUNT(*) AS freq FROM (
       |  SELECT unnest(string_split(text, ' ')) AS term FROM documents)
       |  WHERE term <> '' GROUP BY 1),
       |sA AS (SELECT w, freq, ' ' || array_to_string(
       |    list_transform(range(1, length(w) + 1),
       |      i -> substring(w, CAST(i AS INT), 1)), '  ') || ' ' AS s
       |  FROM w0),
       |rk AS MATERIALIZED (SELECT w, freq, s,
       |    SUM(length(s)) OVER (ORDER BY freq DESC, w ASC
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
       |  FROM sA),
       |s0 AS MATERIALIZED (SELECT w, freq, s FROM rk WHERE cum <= $cap)""".stripMargin

  /** MID-PATH BPE training under the gate
    * ([[graft.operators.Vocab.bpeTrainHead]]): vocabularies above the
    * driver-local caps train on the frequency-DOMINANT head — here the
    * maximal (freq desc, w asc) prefix whose symbol strings fit 300
    * chars (20 of 31 words, ~68% of token mass) — driver-local, while
    * the tail never ships and contributes no pair statistics (the
    * closure gate below measures exactly what that omits). The oracle
    * replays the ranked election with its running char sum, then the
    * same 8 unrolled merge rounds as `text_bpe_vocab` over the HEAD
    * frame only — a drift in the cut point, the ranking ties, or any
    * merge election flips the hash. */
  val textBpeHeadVocab = Q("text_bpe_head_vocab",
    s"""WITH ${sqlBpeHead(300)},
       |${(1 to 8).map(Registry13.sqlBpeStep).mkString(",\n")}
       |SELECT step, l AS lhs, r AS rhs, cnt
       |FROM (${(1 to 8).map(i => s"SELECT * FROM b$i").mkString(" UNION ALL ")})
       |ORDER BY step""".stripMargin) { (s, d) =>
    Vocab.bpeTrainHead(docs(s, d), "text", merges = 8, headChars = 300)
      .orderBy("step")
  }

  /** The TAIL-CLOSURE verification under the gate
    * ([[graft.operators.Vocab.bpeHeadClosure]]): ONE distributed pass
    * — never per-merge — measuring what the head cut left out:
    * head/tail word counts, head/tail token MASS (the Zipf
    * concentration the mid-path bets on), and `oov_chars`, the
    * distinct characters appearing only in tail words (base-alphabet
    * non-closure: an OOV character can never occur inside a learned
    * merge). The oracle replays the same election and character-set
    * algebra. */
  val textBpeHeadClosure = Q("text_bpe_head_closure",
    s"""WITH ${sqlBpeHead(300)},
       |hf AS (SELECT w, freq, (cum <= 300) AS hd FROM rk),
       |st AS (SELECT
       |    CAST(SUM(CASE WHEN hd THEN 1 ELSE 0 END) AS BIGINT) AS head_words,
       |    CAST(SUM(CASE WHEN hd THEN 0 ELSE 1 END) AS BIGINT) AS tail_words,
       |    CAST(SUM(CASE WHEN hd THEN freq ELSE 0 END) AS BIGINT) AS head_mass,
       |    CAST(SUM(CASE WHEN hd THEN 0 ELSE freq END) AS BIGINT) AS tail_mass
       |  FROM hf),
       |ch AS (SELECT u.c AS c,
       |    MAX(CASE WHEN hf.hd THEN 1 ELSE 0 END) AS in_head
       |  FROM hf, UNNEST(list_transform(range(1, length(hf.w) + 1),
       |    i -> substring(hf.w, CAST(i AS INT), 1))) AS u(c)
       |  GROUP BY 1),
       |ov AS (SELECT CAST(COUNT(*) AS BIGINT) AS oov_chars FROM ch
       |  WHERE in_head = 0)
       |SELECT head_words, tail_words, head_mass, tail_mass, oov_chars
       |FROM st CROSS JOIN ov""".stripMargin) { (s, d) =>
    Vocab.bpeHeadClosure(docs(s, d), "text", headChars = 300)
  }

  val round15: Seq[Q] = Seq(annFilteredAdaptiveTopK, annGraphRebucket,
    textAnalyze, textBm25Analyzed, textPhraseAnalyzed,
    dedupSemanticIncremental, textBpeHeadVocab, textBpeHeadClosure,
    textBpeAnalyzed, streamingSemanticIngest, annGraphFilteredTopK,
    dedupSemanticRemove, textBm25Filtered, annIndexReencode)
}
