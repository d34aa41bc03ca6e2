package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.functions.VectorFns

/** Lexical and hybrid retrieval over the documents corpus — the query
  * side of a training-data pipeline (mining hard negatives, building
  * retrieval training sets, contamination triage) and the standard
  * production search stack: BM25 posting-list scoring, reciprocal-rank
  * fusion of heterogeneous rankers, and multi-vector MaxSim late
  * interaction.
  *
  * Numeric discipline (the repo-wide oracle-parity contract): every
  * cross-row double sum is a LEFT FOLD over a deterministically sorted
  * collected list — never a bare `sum()` aggregate, whose accumulation
  * order Spark does not define for floating point. Ref semantics:
  * reference repo has no retrieval layer (its queries are aggregate
  * charts, src/jurimetria_pipeline.py:44-296); this is the
  * training-pipeline extension surface. */
object Retrieval {

  /** Left-fold sum of `field` over a (sortKey, value) struct list,
    * sorted by the struct's natural (first-field) order — the
    * deterministic cross-row summation idiom (cf. the ADC folds'
    * ORDER BY sub). */
  private def foldSum(structs: org.apache.spark.sql.Column) =
    aggregate(transform(sort_array(structs), s => s.getField("v")),
      lit(0.0), (acc, x) => acc + x)

  /** BM25 document scoring via the posting-list join — the inverted-
    * index dataflow at any scale: tokenize once, aggregate term
    * frequencies (tf), document lengths (dl), and document frequencies
    * (df) with partial aggregation, then join the (small, broadcast)
    * query-term side against the tf table on the term key. Nothing
    * corpus-sized moves except the one tokenize-shuffle that builds the
    * tf table — the same exchange an inverted-index build pays.
    *
    * Scoring: the Robertson/Okapi form
    *   score(q, d) = Σ_{t ∈ q ∩ d} idf(t) · tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl))
    * with k1 = 1.2, b = 0.75. `idf` is kept RATIONAL by default —
    * (N − df + 0.5)/(df + 0.5), the argument of the Robertson–Sparck
    * Jones log — because a transcendental log is not bit-stable across
    * engines (the text_tfidf precedent: tf·N/df rather than log-scaled).
    * Pass `logIdf = true` for the classical log form when cross-engine
    * hash parity is not required; the per-term monotonicity (rarer term
    * ⇒ larger idf) is identical. Per-(query, doc) term scores fold in
    * TERM order (terms are distinct per query by construction here —
    * queries are term SETS, the standard probabilistic-model reading).
    *
    * `queryTerms`: (q_id, term), pre-distincted by the caller or here.
    * Returns (q_id, doc_id, score) for every doc sharing ≥ 1 term. */
  def bm25Scores(queryTerms: DataFrame, docs: DataFrame,
                 idCol: String, textCol: String,
                 k1: Double = 1.2, b: Double = 0.75,
                 logIdf: Boolean = false): DataFrame = {
    val toks = docs.select(col(idCol).as("doc_id"),
      explode(split(col(textCol), " ")).as("term"))
    val tf = toks.groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    val dl = toks.groupBy("doc_id").agg(count(lit(1)).as("dl"))
    val dfreq = tf.groupBy("term").agg(count(lit(1)).as("df"))
    // N and Σdl are exact integer aggregates; avgdl = one IEEE divide
    val stats = dl.agg(count(lit(1)).as("n_docs"), sum("dl").as("sum_dl"))
    val qt = queryTerms.select(col("q_id"), col("term")).distinct()
    val avgdl = col("sum_dl").cast("double") / col("n_docs").cast("double")
    val idfRat = (col("n_docs").cast("double") - col("df").cast("double") + lit(0.5)) /
      (col("df").cast("double") + lit(0.5))
    val idf = if (logIdf) log(idfRat) else idfRat
    val tfD = col("tf").cast("double")
    val denom = tfD + lit(k1) * (lit(1.0) - lit(b) +
      lit(b) * (col("dl").cast("double") / avgdl))
    val termScore = idf * (tfD * lit(k1 + 1.0)) / denom
    tf.join(broadcast(qt), "term")
      .join(dl, "doc_id")
      .crossJoin(broadcast(stats))
      .join(dfreq, "term")
      .select(col("q_id"), col("doc_id"),
        struct(col("term"), termScore.as("v")).as("ts"))
      .groupBy("q_id", "doc_id")
      .agg(foldSum(collect_list(col("ts"))).as("score"))
  }

  /** BM25 top-k: [[bm25Scores]] ranked per query — score descending,
    * ties to the lower doc id, the query's own document (when query
    * terms were drawn from a corpus doc with the same id space)
    * excluded, the ANN-family self-match convention. Partial top-k
    * plants below the exchange (WindowGroupLimit, the q09 shape).
    * Returns (q_id, doc_id, rnk, score). */
  def bm25TopK(queryTerms: DataFrame, docs: DataFrame,
               idCol: String, textCol: String, k: Int,
               k1: Double = 1.2, b: Double = 0.75,
               logIdf: Boolean = false): DataFrame = {
    require(k > 0, "k must be positive")
    bm25Scores(queryTerms, docs, idCol, textCol, k1, b, logIdf)
      .filter(col("q_id") =!= col("doc_id"))
      .withColumn("rnk", row_number().over(
        Window.partitionBy("q_id")
          .orderBy(col("score").desc, col("doc_id").asc)))
      .filter(col("rnk") <= k)
      .select(col("q_id"), col("doc_id"), col("rnk"), col("score"))
  }

  /** Reciprocal-rank fusion of heterogeneous rankers — THE standard
    * hybrid-retrieval combiner (lexical BM25 ⊕ dense ANN), because it
    * needs no score calibration: each ranker contributes
    * 1/(kRrf + rank), summed left-to-right over the ranker list in the
    * caller's order (a fixed-arity chain of IEEE adds — deterministic,
    * no collected fold needed). A candidate absent from a ranker's list
    * contributes 0 from it (the Cormack et al. definition). kRrf = 60 is
    * the published default; ranks are integers, 1/(60 + rnk) is one
    * correctly-rounded divide per entry.
    *
    * Scale shape: inputs are already top-k'd per query (≤ queries × k
    * rows each), so the fuse is a join of SMALL frames — the corpus
    * never participates. Each input: (q_id, n_id, rnk).
    * Returns (q_id, n_id, rnk, rrf) — re-ranked by fused score
    * descending, ties to the lower candidate id. */
  def rrfFuse(rankings: Seq[DataFrame], k: Int, kRrf: Int = 60): DataFrame = {
    require(rankings.nonEmpty, "rrfFuse needs at least one ranking")
    require(k > 0, "k must be positive")
    val contribs = rankings.zipWithIndex.map { case (r, i) =>
      r.select(col("q_id"), col("n_id"),
        (lit(1.0) / (lit(kRrf).cast("double") + col("rnk").cast("double")))
          .as(s"_c$i"))
    }
    val joined = contribs.reduce { (a, b) =>
      a.join(b, Seq("q_id", "n_id"), "full_outer")
    }
    val rrf = contribs.indices
      .map(i => coalesce(col(s"_c$i"), lit(0.0)))
      .reduce(_ + _)
    joined.withColumn("rrf", rrf)
      .withColumn("rnk", row_number().over(
        Window.partitionBy("q_id")
          .orderBy(col("rrf").desc, col("n_id").asc)))
      .filter(col("rnk") <= k)
      .select(col("q_id"), col("n_id"), col("rnk"), col("rrf"))
  }

  /** Multi-vector MaxSim late interaction (the ColBERT scoring rule):
    * documents are BAGS of vectors (one per token/chunk), and
    *   score(Q, D) = Σ_{q ∈ Q} max_{d ∈ D} cos(q, d)
    * — each query vector finds its best-matching document vector
    * independently, then the per-query-vector maxima sum. The max is a
    * partial aggregate (exact for doubles, order-free); the SUM folds in
    * query-vector-id order via the collected-struct idiom (cross-row
    * double adds are order-defined nowhere else).
    *
    * Scale shape: the query side (all vectors of the query docs)
    * broadcasts — guarded by `maxQueryVecs`, the [[Similarity.pqTopK]]
    * refuse posture — and the corpus side never shuffles for scoring:
    * cos + max fold into one partial-aggregated pass keyed
    * (q_doc, q_vid, n_doc); only the ≤ |Q docs| × |Q vecs| × |D docs|
    * maxima cross an exchange. A production deployment prunes the
    * candidate D set with a single-vector ANN stage first (centroid or
    * [CLS] vector) — compose with [[Similarity.ivfPqTopK]] upstream.
    *
    * `queries`: (docCol, idCol, vecCol) — multiple rows per query doc.
    * `corpus`: same shape. Self-pairs (same doc id) are excluded.
    * Returns (q_doc, n_doc, rnk, maxsim), top-k docs per query doc,
    * ties to the lower doc id. */
  def maxSimTopK(queries: DataFrame, corpus: DataFrame,
                 docCol: String, idCol: String, vecCol: String, k: Int,
                 dim: Int = 64, maxQueryVecs: Long = 1L << 20): DataFrame = {
    require(k > 0, "k must be positive")
    val nq = queries.select(col(idCol)).count()
    require(nq <= maxQueryVecs,
      s"maxSimTopK: query side holds $nq vectors > maxQueryVecs=" +
        s"$maxQueryVecs; query docs broadcast their whole vector bags — " +
        "batch the query docs or raise the cap deliberately")
    val q = queries.select(col(docCol).as("q_doc"), col(idCol).as("q_vid"),
      col(vecCol).as("q_vec"), VectorFns.l2NormN(col(vecCol), dim).as("q_nrm"))
    val c = corpus.select(col(docCol).as("n_doc"), col(vecCol).as("n_vec"),
      VectorFns.l2NormN(col(vecCol), dim).as("n_nrm"))
    val best = c.join(broadcast(q), col("q_doc") =!= col("n_doc"))
      .withColumn("cos",
        when(col("q_nrm") > 0.0 && col("n_nrm") > 0.0,
          VectorFns.dotN(col("q_vec"), col("n_vec"), dim) /
            (col("q_nrm") * col("n_nrm"))))
      .groupBy("q_doc", "q_vid", "n_doc")
      .agg(max(col("cos")).as("mx"))
    best
      .select(col("q_doc"), col("n_doc"),
        struct(col("q_vid"), col("mx").as("v")).as("ts"))
      .groupBy("q_doc", "n_doc")
      .agg(foldSum(collect_list(col("ts"))).as("maxsim"))
      .withColumn("rnk", row_number().over(
        Window.partitionBy("q_doc")
          .orderBy(col("maxsim").desc, col("n_doc").asc)))
      .filter(col("rnk") <= k)
      .select(col("q_doc"), col("n_doc"), col("rnk"), col("maxsim"))
  }
}
