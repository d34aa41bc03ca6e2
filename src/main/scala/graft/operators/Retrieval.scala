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

  /** Left-fold PRODUCT, same discipline — for scorers whose per-term
    * contributions multiply (query likelihood) rather than add. */
  private def foldProduct(structs: org.apache.spark.sql.Column) =
    aggregate(transform(sort_array(structs), s => s.getField("v")),
      lit(1.0), (acc, x) => acc * x)

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
                 logIdf: Boolean = false): DataFrame =
    bm25ScoresFromIndex(queryTerms,
      bm25IndexBuild(docs, idCol, textCol), k1, b, logIdf)

  /** Build the BM25 inverted index as a STORED asset: the
    * (doc_id, term, tf) term-frequency ledger — every other statistic
    * the scorer needs derives from it exactly (dl = Σ tf per doc,
    * df = row count per term, N and Σdl = two global aggregates), so
    * this ONE frame is the whole index, and maintaining it is row
    * arithmetic. One tokenize exchange, paid at build (and per
    * APPENDED BATCH thereafter — [[bm25IndexAppend]]), never at query
    * time when the ledger is persisted. Zero-length tokens (minted by
    * consecutive/leading/trailing spaces) are dropped — on real text
    * they would otherwise become a phantom term whose df approaches N
    * and pollute every dl. */
  def bm25IndexBuild(docs: DataFrame, idCol: String,
                     textCol: String): DataFrame =
    docs.select(col(idCol).as("doc_id"),
        explode(split(col(textCol), " ")).as("term"))
      .filter(length(col("term")) > 0)
      .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))

  /** POSITIONAL inverted index: the (doc_id, term, positions) ledger —
    * [[bm25IndexBuild]]'s tf ledger with each term's 0-based word
    * offsets kept (sorted — deterministic array layout), the stored
    * asset phrase and proximity queries need. Positions index the RAW
    * whitespace split (zero-length tokens drop as terms but do not
    * renumber their neighbors), so adjacency means "adjacent in the
    * original text". Same one-tokenize-exchange build shape; the
    * ledger grows by one int per token over the tf form. */
  def positionalIndexBuild(docs: DataFrame, idCol: String,
                           textCol: String): DataFrame =
    docs.select(col(idCol).as("doc_id"),
        posexplode(split(col(textCol), " ")).as(Seq("pos", "term")))
      .filter(length(col("term")) > 0)
      .groupBy("doc_id", "term")
      .agg(sort_array(collect_list(col("pos"))).as("positions"))

  /** Append a document batch to a stored POSITIONAL ledger —
    * [[bm25IndexAppend]]'s posture on the positions shape: tokenize
    * only the batch, anti-join already-indexed ids (idempotent under
    * at-least-once replay; the ledger ships only distinct doc ids).
    * Positions are per-document facts like tf rows, so
    * append ≡ from-scratch rebuild unconditionally. `deltaOnly`
    * returns just the new rows (the parquet `mode("append")` face).
    * Takedown is [[bm25IndexRemove]] — it is shape-generic over any
    * doc_id-keyed ledger, positional included. */
  def positionalIndexAppend(ledger: DataFrame, batch: DataFrame,
                            idCol: String, textCol: String,
                            deltaOnly: Boolean = false): DataFrame = {
    val seen = ledger.select(col("doc_id")).distinct()
    val delta = positionalIndexBuild(batch, idCol, textCol)
      .join(seen, Seq("doc_id"), "left_anti")
    if (deltaOnly) delta else ledger.unionByName(delta)
  }

  /** PHRASE match over a positional ledger: a document matches when
    * some base offset p has phrase term i at position p + i for every
    * i — the classic consecutive-position posting intersection, the
    * query class tf-only indexes cannot answer ("supreme court" as a
    * phrase, not a bag). `phrases`: (q_id, idx, term), idx 0-based
    * within each phrase.
    *
    * Dataflow: the (small, broadcast) phrase-term side joins the
    * posting list on the term key — only postings for the phrase's
    * terms move; positions explode to (base = pos − idx) rows, and a
    * base seen by ALL phrase positions is one occurrence (exact
    * integer arithmetic end-to-end). Repeated terms in a phrase are
    * handled by construction: each idx row joins the posting
    * independently. Returns (q_id, doc_id, occurrences ≥ 1) — a
    * match FILTER, so the query's own document matches itself (rank
    * stages downstream apply their own self-exclusion).
    *
    * Zero-length phrase slots (mintable by doubled spaces in a raw
    * split) are DROPPED before `_n` is counted — the ledger never
    * indexes empty tokens, so an empty slot counted toward `_n` could
    * never be satisfied and would silently make the whole phrase
    * unmatchable, including by its own document. Dropping the slot
    * matches the ledger's positions contract: empty tokens vanish as
    * terms but never renumber their neighbors, so the surviving slots'
    * idx offsets still land on the original text's positions. */
  def phraseMatch(phrases: DataFrame, posLedger: DataFrame): DataFrame = {
    val ph = phrases.filter(length(col("term")) > 0)
    val nTerms = ph.groupBy("q_id")
      .agg(countDistinct(col("idx")).as("_n"))
    val hits = posLedger
      .join(broadcast(
        ph.select(col("q_id"), col("idx"), col("term")).distinct()),
        "term")
      .select(col("q_id"), col("doc_id"), col("idx"),
        explode(col("positions")).as("pos"))
      .withColumn("base", col("pos") - col("idx"))
      .filter(col("base") >= 0)
      .groupBy("q_id", "doc_id", "base")
      .agg(count(lit(1)).as("_k"))
    hits.join(broadcast(nTerms), "q_id")
      .filter(col("_k") === col("_n"))
      .groupBy("q_id", "doc_id")
      .agg(count(lit(1)).as("occurrences"))
  }

  /** PROXIMITY (NEAR/w) match over a positional ledger: a document
    * matches when every query term occurs within a `window`-position
    * span, in ANY order — the query class users reach for the day
    * after phrase search ("court NEAR/3 supreme" — both words close,
    * order free). [[phraseMatch]]'s base arithmetic generalizes by
    * dropping the slot offsets: an assignment of one position per term
    * with max(pos) − min(pos) ≤ window exists iff some ANCHOR position
    * p (any matched-term position in the doc) covers every term inside
    * [p, p + window] — the minimal covering set's min position is such
    * an anchor, so the existence check is exact, not heuristic.
    *
    * Dataflow: the (small, broadcast) query-term SET joins the posting
    * list on the term key — only postings for the query's terms move;
    * positions explode once, then each occurrence reads its own
    * [pos, pos + window] cover as a RANGE-FRAME window aggregate
    * (size of collect_set(term) over rangeBetween(0, window)) — the
    * declarative form of the classic per-doc plane sweep. One
    * (q_id, doc_id) exchange co-locates each group and the frame walk
    * is O(occurrences × window) — never the O(occurrences²) pair
    * blow-up a self-join-then-filter would materialize on a hot
    * doc × stopword query (each frame holds ≤ window + 1 rows:
    * positions are integers and a position holds one term).
    * Zero-length terms drop exactly as in [[phraseMatch]] (the ledger
    * never indexes them). `queryTerms`: (q_id, term) — a term SET
    * (order carries no meaning for NEAR); `window` ≥ 0 in word
    * positions, window = 0 demands all terms at one position (only
    * satisfiable by the single-term query). Returns
    * (q_id, doc_id, anchors ≥ 1) — a match FILTER like
    * [[phraseMatch]], anchors = how many positions open a covering
    * span (a crude density signal; rank stages downstream apply their
    * own scoring). */
  /** The shared window-cover plane sweep of [[proximityMatch]] and
    * [[bestWindow]]: matched postings explode once, then each
    * occurrence reads its [pos, pos + window] cover as a range-frame
    * window aggregate. set-size over the frame is order-free (size()
    * does not read collect_set's nondeterministic order), so the cover
    * count is deterministic; distinct guards the anchor count against
    * a malformed ledger indexing two terms at one position. Returns
    * (q_id, doc_id, pos, _k). One construction for both faces — a fix
    * to the empty-term filter or the frame bound can never apply to
    * one and not the other. */
  private def coverFrame(queryTerms: DataFrame, posLedger: DataFrame,
                         window: Int): DataFrame = {
    val qt = queryTerms.filter(length(col("term")) > 0)
      .select(col("q_id"), col("term")).distinct()
    posLedger
      .join(broadcast(qt), "term")
      .select(col("q_id"), col("doc_id"), col("term"),
        explode(col("positions")).as("pos"))
      .withColumn("_k",
        size(collect_set(col("term")).over(
          Window.partitionBy("q_id", "doc_id").orderBy(col("pos"))
            .rangeBetween(Window.currentRow, window))))
      .select(col("q_id"), col("doc_id"), col("pos"), col("_k"))
      .distinct()
  }

  def proximityMatch(queryTerms: DataFrame, posLedger: DataFrame,
                     window: Int): DataFrame = {
    require(window >= 0, "window must be non-negative")
    val nTerms = queryTerms.filter(length(col("term")) > 0)
      .select(col("q_id"), col("term")).distinct()
      .groupBy("q_id").agg(countDistinct(col("term")).as("_n"))
    coverFrame(queryTerms, posLedger, window)
      .join(broadcast(nTerms), "q_id")
      .filter(col("_k") === col("_n"))
      .groupBy("q_id", "doc_id")
      .agg(count(lit(1)).as("anchors"))
  }

  /** ORDERED proximity match (phrase-with-slop, the Lucene sloppy-
    * ordered shape): the phrase terms must appear in PHRASE ORDER with
    * total span ≤ `window` positions — between [[phraseMatch]] (order
    * + adjacency) and [[proximityMatch]] (neither): "supreme … court"
    * with up to `window` − (n−1) interveners, but never "court …
    * supreme". Matching is an exact GREEDY chain per anchor: for each
    * position p of slot 0, extend slot by slot taking the EARLIEST
    * position that is strictly after the previous slot's and within
    * [p, p + window] — the classic exchange argument makes greedy
    * complete iff ANY valid chain from that anchor exists, so the
    * count is exact, not heuristic.
    *
    * Dataflow: matched postings explode once ([[proximityMatch]]'s
    * shape); the chain then advances one slot per round over
    * ANCHOR-SIZED frames — (q_id, doc_id, p0, last) rows, one per
    * still-alive anchor — each round a ceiling-successor PLANE SWEEP
    * (anchors ∪ slot occurrences, one position-ordered walk per
    * (q, doc) group — O(rows log rows), never the anchors ×
    * occurrences pair join) with [[Lineage.truncate]] between rounds
    * (the beam-hop loop discipline); rounds = phrase length − 1,
    * driver-known from a 1-row bounded collect. Queries with fewer
    * slots than the longest
    * phrase finish early and carry through untouched. `phrases`:
    * (q_id, idx, term) — idx orders the slots (gaps fine, zero-length
    * terms drop as everywhere). Returns (q_id, doc_id, anchors ≥ 1):
    * anchors = slot-0 positions opening a complete ordered chain. */
  def orderedNearMatch(phrases: DataFrame, posLedger: DataFrame,
                       window: Int): DataFrame = {
    require(window >= 0, "window must be non-negative")
    // term joins idx in the sort only to pin determinism if a caller
    // hands duplicate idx slots (a malformed phrase either way)
    val ordered = phrases.filter(length(col("term")) > 0)
      .select(col("q_id"), col("idx"), col("term")).distinct()
      .withColumn("_ord", row_number().over(
        Window.partitionBy("q_id").orderBy(col("idx"), col("term"))) - 1)
    // the loop bound: longest phrase's slot count (1-row collect,
    // bounded by contract — phrases are query-sized)
    val maxOrdRow = ordered.agg(max(col("_ord"))).head()
    val maxOrd = if (maxOrdRow.isNullAt(0)) 0 else maxOrdRow.getInt(0)
    // matched postings feed every chain round (slot filter per round)
    // — truncate so the ledger join runs once, not once per slot
    val occ = Lineage.truncate(posLedger
      .join(broadcast(ordered.select(col("q_id"), col("_ord"), col("term"))),
        "term")
      .select(col("q_id"), col("doc_id"), col("_ord"),
        explode(col("positions")).as("pos")))
    var frontier = Lineage.truncate(occ.filter(col("_ord") === 0)
      .select(col("q_id"), col("doc_id"), col("pos").as("p0"),
        col("pos").as("last")))
    var i = 1
    while (i <= maxOrd) {
      // queries whose phrase ran out of slots are DONE — their anchors
      // survive untouched while longer phrases keep chaining
      val hasSlot = ordered.filter(col("_ord") === i)
        .select(col("q_id")).distinct()
      val done = frontier.join(broadcast(hasSlot), Seq("q_id"), "left_anti")
      // the greedy pick "earliest slot-i position strictly after last"
      // is a ceiling-successor lookup — computed as a PLANE SWEEP, not
      // a frontier × occurrences join (which would materialize
      // anchors × occ_i pairs per doc before its filter, the
      // proximityMatch blow-up): anchors and slot-i occurrences union
      // into one (q, doc) stream ordered by position, and each anchor
      // reads min(np) over the strictly-following rows. A slot-i
      // occurrence AT the anchor's own position (repeated-term
      // phrases) sorts BEFORE the anchor row (np asc_nulls_last), so
      // "following" is exactly "strictly greater position".
      val step = occ.filter(col("_ord") === i)
        .select(col("q_id"), col("doc_id"),
          lit(null).cast("int").as("p0"), col("pos"),
          col("pos").as("np"))
      val tagged = frontier
        .select(col("q_id"), col("doc_id"), col("p0"),
          col("last").as("pos"), lit(null).cast("int").as("np"))
        .unionByName(step)
      val nxt = min(col("np")).over(
        Window.partitionBy("q_id", "doc_id")
          .orderBy(col("pos").asc, col("np").asc_nulls_last)
          .rowsBetween(1, Window.unboundedFollowing))
      val advanced = tagged.withColumn("_nx", nxt)
        .filter(col("p0").isNotNull && col("_nx").isNotNull &&
          col("_nx") <= col("p0") + lit(window))
        .select(col("q_id"), col("doc_id"), col("p0"),
          col("_nx").as("last"))
      frontier = Lineage.truncate(done.unionByName(advanced))
      i += 1
    }
    frontier.groupBy("q_id", "doc_id").agg(count(lit(1)).as("anchors"))
  }

  /** Phrase-boosted BM25 — the standard two-signal relevance compose a
    * production search stack ships first: lexical BM25 recall with
    * exact-phrase presence as a multiplicative boost (matched docs'
    * scores × `boost`), so documents containing the query AS A PHRASE
    * outrank bag-of-words co-occurrence without a second index — both
    * signals read the SAME stored assets (tf ledger, positional
    * ledger), and the boost is one IEEE multiply gated on the match
    * set, bit-deterministic on any engine.
    *
    * Scale shape: [[bm25ScoresFromIndex]]'s posting join (corpus-sized
    * work only in the ledger build, paid at ingest) plus
    * [[phraseMatch]]'s intersection (only phrase-term postings move);
    * the boost join is scores × (query-sized match set). Self excluded,
    * ties to the lower doc id, [[bm25TopKFromIndex]]'s rank contract.
    * Returns (q_id, doc_id, rnk, score). */
  def phraseBoostTopK(queryTerms: DataFrame, phrases: DataFrame,
                      tfLedger: DataFrame, posLedger: DataFrame, k: Int,
                      boost: Double = 1.5,
                      k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(k > 0, "k must be positive")
    require(boost > 0.0, "boost must be positive")
    val matched = phraseMatch(phrases, posLedger)
      .select(col("q_id"), col("doc_id"), lit(true).as("_hit"))
    bm25ScoresFromIndex(queryTerms, tfLedger, k1, b)
      .filter(col("q_id") =!= col("doc_id"))
      .join(matched, Seq("q_id", "doc_id"), "left")
      .withColumn("score",
        when(col("_hit"), col("score") * lit(boost)).otherwise(col("score")))
      .withColumn("rnk", row_number().over(
        Window.partitionBy("q_id")
          .orderBy(col("score").desc, col("doc_id").asc)))
      .filter(col("rnk") <= k)
      .select(col("q_id"), col("doc_id"), col("rnk"), col("score"))
  }

  /** Append a document batch to a stored BM25 ledger: tokenize ONLY
    * the arriving batch, anti-join already-indexed ids (idempotent
    * under at-least-once replay — the [[Similarity.pqIndexAppend]]
    * posture; the ledger side ships only its distinct doc ids, never
    * tf rows). Unlike the PQ index there is NO frozen-quantizer
    * subtlety: tf rows are per-document facts independent of the rest
    * of the corpus, so append ≡ from-scratch rebuild unconditionally —
    * the CORPUS-level statistics (df, N, avgdl) are derived at query
    * time from the current ledger and legitimately drift as it grows
    * (a lexical index's scores are defined against the index NOW).
    * `deltaOnly` returns only the new rows (the parquet
    * `mode("append")` storage face). */
  def bm25IndexAppend(ledger: DataFrame, batch: DataFrame,
                      idCol: String, textCol: String,
                      deltaOnly: Boolean = false): DataFrame = {
    val seen = ledger.select(col("doc_id")).distinct()
    val delta = bm25IndexBuild(batch, idCol, textCol)
      .join(seen, Seq("doc_id"), "left_anti")
    if (deltaOnly) delta else ledger.unionByName(delta)
  }

  /** Index takedown: remove documents from a stored BM25 ledger — one
    * id-keyed anti-join IS the whole repair (tf rows are independent
    * per document; df/N/avgdl re-derive at query time), so
    * remove ≡ from-scratch rebuild of the surviving corpus, and
    * removing never-indexed ids is a no-op. Completes the
    * build / append / remove maintenance triple the PQ and cluster
    * ledgers already have. `removals`: one `doc_id` column. */
  def bm25IndexRemove(ledger: DataFrame, removals: DataFrame): DataFrame =
    ledger.join(removals.select(col("doc_id")).distinct(),
      Seq("doc_id"), "left_anti")

  /** Store the document-length NORM in the posting row — Lucene's
    * norms-in-the-index design: (doc_id, term, tf) gains `dl = Σ tf`
    * over the document, a PER-DOCUMENT fact (appending or removing
    * other documents never changes it, so the column is append-safe
    * and the maintenance triple carries over unchanged). The payoff is
    * at serve time: [[bm25TopKFromStats]] reads dl off the matched
    * posting itself instead of deriving it with a corpus-sized
    * groupBy — the step that otherwise forces a full-ledger aggregate
    * per query batch. Integer-exact (a sum of longs). Applies to a
    * build output or an append delta alike. */
  def withDocNorms(ledger: DataFrame): DataFrame =
    ledger.withColumn("dl",
      sum("tf").over(Window.partitionBy("doc_id")))

  /** The term-statistics LEDGER: (term, df, cf) — document frequency
    * and collection frequency per term, the two cross-document
    * aggregates BM25 (df) and query-likelihood (cf) need. Built once
    * from the tf ledger, then maintained INCREMENTALLY
    * ([[bm25TermStatsAppend]] / [[bm25TermStatsRemove]]) so a serve
    * never re-aggregates the posting ledger: at 10⁹ documents the df
    * of a query's terms is a query-sized read of this frame, not a
    * corpus-sized groupBy. Vocabulary-sized (≪ corpus). */
  def bm25TermStatsBuild(ledger: DataFrame): DataFrame =
    ledger.groupBy("term")
      .agg(count(lit(1)).as("df"), sum("tf").as("cf"))

  /** The 1-row GLOBAL ledger: (n_docs, sum_dl) — N and Σdl, the two
    * whole-corpus scalars in every BM25 denominator. Built once;
    * maintained by 1-row integer arithmetic
    * ([[bm25GlobalStatsAppend]] / [[bm25GlobalStatsRemove]]). */
  def bm25GlobalStatsBuild(ledger: DataFrame): DataFrame =
    ledger.groupBy("doc_id").agg(sum("tf").as("dl"))
      .agg(count(lit(1)).as("n_docs"), sum("dl").as("sum_dl"))

  /** Fold an append DELTA into the term-stats ledger. `batchTf` MUST
    * be the delta tf rows of documents not already indexed (the
    * `deltaOnly = true` output of [[bm25IndexAppend]] — the append
    * path's anti-join is what makes the increment exact; feeding
    * already-indexed rows would double-count df). Only the batch's own
    * terms change: their replacement rows are old ⊕ batch (full-outer
    * merge, so unseen terms mint rows), every other term's row is
    * untouched — with `deltaOnly = true` the caller gets JUST the
    * batch terms' replacement rows. deltaOnly output is a KEY-level
    * delta, NOT bucket-overwrite content: on a term-bucketed layout
    * ([[graft.operators.Ledger.withHashBucket]]) a touched bucket also
    * holds non-batch terms, which a dynamic overwrite with only the
    * batch terms' rows would silently delete. The bucket-overwrite
    * face is `deltaOnly = false` over a bucket-PRUNED stats read
    * ([[graft.operators.Ledger.prunedToKeys]]) — the anti-join leg
    * then carries exactly the non-batch terms sharing the touched
    * buckets, making the replacement complete (the streaming drain's
    * wiring). Integer-exact, so append ≡ from-scratch rebuild of the
    * unioned corpus. */
  def bm25TermStatsAppend(stats: DataFrame, batchTf: DataFrame,
                          deltaOnly: Boolean = false): DataFrame = {
    val b = batchTf.groupBy("term")
      .agg(count(lit(1)).as("_bdf"), sum("tf").as("_bcf"))
    val merged = stats.join(b.select("term"), Seq("term"), "left_semi")
      .join(b, Seq("term"), "full_outer")
      .select(col("term"),
        (coalesce(col("df"), lit(0L)) + coalesce(col("_bdf"), lit(0L)))
          .as("df"),
        (coalesce(col("cf"), lit(0L)) + coalesce(col("_bcf"), lit(0L)))
          .as("cf"))
    if (deltaOnly) merged
    else stats.join(b.select("term"), Seq("term"), "left_anti")
      .unionByName(merged)
  }

  /** Fold a takedown into the term-stats ledger. `removedTf` is the tf
    * rows BEING REMOVED — the caller reads them off the posting ledger
    * by semi-joining the removal ids (bucket-pruned on a partitioned
    * layout), which also makes removing never-indexed ids a no-op
    * (they contribute no rows). Terms whose df reaches 0 DROP — the
    * ledger's row set stays exactly the live vocabulary, so
    * remove ≡ from-scratch rebuild of the surviving corpus. */
  def bm25TermStatsRemove(stats: DataFrame, removedTf: DataFrame,
                          deltaOnly: Boolean = false): DataFrame = {
    val b = removedTf.groupBy("term")
      .agg(count(lit(1)).as("_bdf"), sum("tf").as("_bcf"))
    val merged = stats.join(b, Seq("term"), "inner")
      .select(col("term"), (col("df") - col("_bdf")).as("df"),
        (col("cf") - col("_bcf")).as("cf"))
      .filter(col("df") > 0)
    if (deltaOnly) merged
    else stats.join(b.select("term"), Seq("term"), "left_anti")
      .unionByName(merged)
  }

  /** 1-row global increment for an append delta (same `batchTf`
    * contract as [[bm25TermStatsAppend]]): n_docs gains the batch's
    * distinct documents, sum_dl its total tokens. Empty batch ⇒
    * +0/+0. Integer adds — exact at any history length. */
  def bm25GlobalStatsAppend(global: DataFrame,
                            batchTf: DataFrame): DataFrame = {
    val b = batchTf.agg(
      count_distinct(col("doc_id")).as("_bn"),
      coalesce(sum("tf"), lit(0L)).as("_bdl"))
    global.crossJoin(broadcast(b))
      .select((col("n_docs") + col("_bn")).as("n_docs"),
        (col("sum_dl") + col("_bdl")).as("sum_dl"))
  }

  /** 1-row global decrement for a takedown (same `removedTf` contract
    * as [[bm25TermStatsRemove]]). */
  def bm25GlobalStatsRemove(global: DataFrame,
                            removedTf: DataFrame): DataFrame = {
    val b = removedTf.agg(
      count_distinct(col("doc_id")).as("_bn"),
      coalesce(sum("tf"), lit(0L)).as("_bdl"))
    global.crossJoin(broadcast(b))
      .select((col("n_docs") - col("_bn")).as("n_docs"),
        (col("sum_dl") - col("_bdl")).as("sum_dl"))
  }

  /** BM25 serve in O(query) READS — the production query path over a
    * persisted index: `postings` carries its own norms
    * ([[withDocNorms]] — dl rides the matched row), df comes from the
    * incrementally-maintained term-stats ledger (semi-joined to the
    * query's terms: a query-sized read), and N/Σdl broadcast from the
    * 1-row global ledger — NO corpus-sized aggregate anywhere at query
    * time, where [[bm25ScoresFromIndex]] re-derives dl/df/N/Σdl from
    * the whole tf ledger per serve. On a term-bucketed layout
    * ([[graft.operators.Ledger.withHashBucket]]) the caller prunes
    * both `postings` and `termStats` to the query terms' buckets
    * ([[Ledger.prunedToKeys]]) — a semantic no-op on the term-equi
    * joins that turns both scans into literal `bkt IN` partition
    * filters, completing the serve-side O(query) law.
    *
    * Bit-equal to [[bm25TopKFromIndex]] over the same corpus: the
    * stats ledgers are integer-exact, the term-score expression is
    * spelled identically, and the fold order is the same TERM order —
    * every IEEE step sees the same operands. Returns
    * (q_id, doc_id, rnk, score), self excluded, ties to the lower
    * doc id. */
  def bm25TopKFromStats(queryTerms: DataFrame, postings: DataFrame,
                        termStats: DataFrame, global: DataFrame, k: Int,
                        k1: Double = 1.2, b: Double = 0.75,
                        logIdf: Boolean = false): DataFrame = {
    require(k > 0, "k must be positive")
    val qt = queryTerms.select(col("q_id"), col("term")).distinct()
    val dfq = termStats
      .join(broadcast(qt.select("term").distinct()), Seq("term"),
        "left_semi")
      .select(col("term"), col("df"))
    val avgdl = col("sum_dl").cast("double") / col("n_docs").cast("double")
    val idfRat = (col("n_docs").cast("double") - col("df").cast("double") + lit(0.5)) /
      (col("df").cast("double") + lit(0.5))
    val idf = if (logIdf) log(idfRat) else idfRat
    val tfD = col("tf").cast("double")
    val denom = tfD + lit(k1) * (lit(1.0) - lit(b) +
      lit(b) * (col("dl").cast("double") / avgdl))
    val termScore = idf * (tfD * lit(k1 + 1.0)) / denom
    postings.select(col("doc_id"), col("term"), col("tf"), col("dl"))
      .join(broadcast(qt), "term")
      .join(broadcast(dfq), "term")
      .crossJoin(broadcast(global))
      .select(col("q_id"), col("doc_id"),
        struct(col("term"), termScore.as("v")).as("ts"))
      .groupBy("q_id", "doc_id")
      .agg(foldSum(collect_list(col("ts"))).as("score"))
      .filter(col("q_id") =!= col("doc_id"))
      .withColumn("rnk", row_number().over(
        Window.partitionBy("q_id")
          .orderBy(col("score").desc, col("doc_id").asc)))
      .filter(col("rnk") <= k)
      .select(col("q_id"), col("doc_id"), col("rnk"), col("score"))
  }

  /** Dirichlet query-likelihood serve in O(query) reads — the
    * [[lmTopKFromIndex]] scorer over the SAME stored assets
    * [[bm25TopKFromStats]] reads: cf from the term-stats ledger (the
    * reason the ledger carries cf next to df — one stats asset serves
    * both classical scorers), T = Σdl from the 1-row global ledger
    * (Σdl ≡ Σtf, the total token count), and dl off the norm-carrying
    * posting row. No corpus-sized aggregate at query time;
    * bucket-pruned scans apply exactly as in [[bm25TopKFromStats]].
    * Bit-equal to [[lmTopKFromIndex]]: identical operands through the
    * identical rational decomposition (term-ordered factor fold,
    * in-vocabulary n_q, the explicit n_q-step penalty fold). */
  def lmTopKFromStats(queryTerms: DataFrame, postings: DataFrame,
                      termStats: DataFrame, global: DataFrame, k: Int,
                      mu: Double = 1000.0): DataFrame = {
    require(k > 0, "k must be positive")
    require(mu > 0.0, "mu must be positive")
    val qt = queryTerms.select(col("q_id"), col("term")).distinct()
    val cfq = termStats
      .join(broadcast(qt.select("term").distinct()), Seq("term"),
        "left_semi")
      .select(col("term"), col("cf"))
    // n_q counts only in-vocabulary terms; every query term present in
    // the vocabulary survives the cfq semi-join (bucket pruning keeps
    // all of the query's own buckets), so the count is exact
    val nq = qt.join(cfq.select("term"), Seq("term"), "left_semi")
      .groupBy("q_id").agg(count(lit(1)).as("_nq"))
    val termFactor = lit(1.0) +
      (col("tf").cast("double") * col("sum_dl").cast("double")) /
        (lit(mu) * col("cf").cast("double"))
    val penaltyBase = lit(mu) / (col("dl").cast("double") + lit(mu))
    postings.select(col("doc_id"), col("term"), col("tf"), col("dl"))
      .join(broadcast(qt), "term")
      .join(broadcast(cfq), "term")
      .crossJoin(broadcast(global.select(col("sum_dl"))))
      .select(col("q_id"), col("doc_id"), col("dl"),
        struct(col("term"), termFactor.as("v")).as("ts"))
      // dl is functional on doc_id (one norm per document), so keying
      // it alongside keeps the grouping unchanged while saving the
      // dl re-join the ledger-derivation path pays
      .groupBy("q_id", "doc_id", "dl")
      .agg(foldProduct(collect_list(col("ts"))).as("_mprod"))
      .join(broadcast(nq), "q_id")
      .withColumn("score", col("_mprod") *
        aggregate(sequence(lit(1), col("_nq").cast("int")), lit(1.0),
          (acc, _) => acc * penaltyBase))
      .filter(col("q_id") =!= col("doc_id"))
      .withColumn("rnk", row_number().over(
        Window.partitionBy("q_id")
          .orderBy(col("score").desc, col("doc_id").asc)))
      .filter(col("rnk") <= k)
      .select(col("q_id"), col("doc_id"), col("rnk"), col("score"))
  }

  /** Score queries against a stored tf ledger ([[bm25IndexBuild]]
    * shape) — the query-time path when the index is a persisted asset:
    * no tokenize, the corpus-sized text never loads; dl/df/N/Σdl
    * derive from the ledger with partial aggregation (integer-exact,
    * identical to tokenize-time derivation, so scores are bit-equal to
    * [[bm25Scores]] over the same corpus). */
  def bm25ScoresFromIndex(queryTerms: DataFrame, ledger: DataFrame,
                          k1: Double = 1.2, b: Double = 0.75,
                          logIdf: Boolean = false,
                          allowed: Option[DataFrame] = None): DataFrame = {
    val tf = ledger.select(col("doc_id"), col("term"), col("tf"))
    // metadata filter (filtered-serve face): candidates restrict to the
    // allowed set BELOW the posting join — a selective tenant/category
    // filter reads only its own postings — while df/N/avgdl stay
    // GLOBAL (an index's statistics are properties of the index, not
    // of one query's filter — the filtered-ANN convention, where the
    // quantizer/centroids don't move per predicate either)
    val tfCand = allowed match {
      case Some(a) =>
        tf.join(a.select(col("doc_id")).distinct(), Seq("doc_id"),
          "left_semi")
      case None => tf
    }
    // dl/df/N/Σdl all derive GLOBALLY; the posting join below is driven
    // by the restricted tfCand, so global dl restricts for free
    val dl = tf.groupBy("doc_id").agg(sum("tf").as("dl"))
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
    tfCand.join(broadcast(qt), "term")
      .join(dl, "doc_id")
      .crossJoin(broadcast(stats))
      .join(dfreq, "term")
      .select(col("q_id"), col("doc_id"),
        struct(col("term"), termScore.as("v")).as("ts"))
      .groupBy("q_id", "doc_id")
      .agg(foldSum(collect_list(col("ts"))).as("score"))
  }

  /** Query-likelihood ranking with Dirichlet smoothing (Zhai &
    * Lafferty, SIGIR 2001) — the OTHER classical probabilistic lexical
    * scorer next to BM25, scored from the SAME stored tf ledger:
    *   p(q|d) = Π_{t ∈ q} (tf_{t,d} + μ·cf_t/T) / (dl_d + μ)
    * (cf = collection term frequency, T = total collection tokens,
    * μ = the smoothing mass). Emitted in the standard RANK-EQUIVALENT
    * decomposition that keeps the posting join sparse AND every
    * arithmetic step rational/bit-stable (no logs — the BM25 rational-
    * idf argument):
    *   score = [Π_{t ∈ q ∩ d} (1 + tf·T/(μ·cf))] · (μ/(dl+μ))^{n_q}
    * — the per-query constant Π μ·cf/T is dropped (rank-invariant),
    * matched-term factors fold in TERM order, and the length penalty's
    * integer power n_q (the query's IN-VOCABULARY distinct term count;
    * out-of-vocabulary terms have no smoothed mass and drop, the
    * standard treatment) is computed as an explicit n_q-step left fold
    * of multiplications — `pow()` is libm and not cross-engine stable,
    * a fold of IEEE multiplies is. Only docs sharing ≥ 1 query term
    * score (everything else ties at the background score — the sparse
    * contract every lexical index serves).
    *
    * Scale shape: identical to [[bm25ScoresFromIndex]] — cf/T/dl/n_q
    * derive from the ledger with partial aggregation, the query side
    * broadcasts onto the posting list, nothing corpus-sized moves at
    * query time. Returns (q_id, doc_id, rnk, score), self excluded,
    * ties to the lower doc id. */
  def lmTopKFromIndex(queryTerms: DataFrame, ledger: DataFrame, k: Int,
                      mu: Double = 1000.0): DataFrame = {
    require(k > 0, "k must be positive")
    require(mu > 0.0, "mu must be positive")
    val tf = ledger.select(col("doc_id"), col("term"), col("tf"))
    val dl = tf.groupBy("doc_id").agg(sum("tf").as("dl"))
    val cf = tf.groupBy("term").agg(sum("tf").as("cf"))
    val tot = tf.agg(sum("tf").as("t"))
    val qt = queryTerms.select(col("q_id"), col("term")).distinct()
    // n_q counts only in-vocabulary terms: semi-join the collection's
    // term universe (cf rows) — OOV terms have no smoothed mass
    val nq = qt.join(cf.select("term"), Seq("term"), "left_semi")
      .groupBy("q_id").agg(count(lit(1)).as("_nq"))
    val termFactor = lit(1.0) +
      (col("tf").cast("double") * col("t").cast("double")) /
        (lit(mu) * col("cf").cast("double"))
    val matched = tf.join(broadcast(qt), "term")
      .join(cf, "term")
      .crossJoin(broadcast(tot))
      .select(col("q_id"), col("doc_id"),
        struct(col("term"), termFactor.as("v")).as("ts"))
      .groupBy("q_id", "doc_id")
      .agg(foldProduct(collect_list(col("ts"))).as("_mprod"))
    val penaltyBase = lit(mu) / (col("dl").cast("double") + lit(mu))
    matched
      .join(dl, "doc_id")
      .join(broadcast(nq), "q_id")
      .withColumn("score", col("_mprod") *
        aggregate(sequence(lit(1), col("_nq").cast("int")), lit(1.0),
          (acc, _) => acc * penaltyBase))
      .filter(col("q_id") =!= col("doc_id"))
      .withColumn("rnk", row_number().over(
        Window.partitionBy("q_id")
          .orderBy(col("score").desc, col("doc_id").asc)))
      .filter(col("rnk") <= k)
      .select(col("q_id"), col("doc_id"), col("rnk"), col("score"))
  }

  /** Best-window election over a positional ledger — the SNIPPET face:
    * for each (query, matching doc), the `window`-wide span covering
    * the MOST distinct query terms, earliest span on ties — what a
    * result page highlights and what weak-supervision span-mining
    * extracts. Reuses [[proximityMatch]]'s range-frame plane sweep
    * (each matched occurrence reads its own [pos, pos + window] cover
    * in O(occurrences × window)), then one per-(q, doc) argmax window:
    * cover count descending, start position ascending. Zero-length
    * terms drop as everywhere. Returns
    * (q_id, doc_id, win_start, win_terms ≥ 1) for every doc sharing
    * ≥ 1 query term. */
  def bestWindow(queryTerms: DataFrame, posLedger: DataFrame,
                 window: Int): DataFrame = {
    require(window >= 0, "window must be non-negative")
    coverFrame(queryTerms, posLedger, window)
      .withColumn("_r", row_number().over(
        Window.partitionBy("q_id", "doc_id")
          .orderBy(col("_k").desc, col("pos").asc)))
      .filter(col("_r") === 1)
      .select(col("q_id"), col("doc_id"), col("pos").as("win_start"),
        col("_k").cast("long").as("win_terms"))
  }

  /** [[bm25TopK]] against a stored ledger — rank + self-exclusion over
    * [[bm25ScoresFromIndex]]. */
  def bm25TopKFromIndex(queryTerms: DataFrame, ledger: DataFrame, k: Int,
                        k1: Double = 1.2, b: Double = 0.75,
                        logIdf: Boolean = false): DataFrame = {
    require(k > 0, "k must be positive")
    bm25ScoresFromIndex(queryTerms, ledger, k1, b, logIdf)
      .filter(col("q_id") =!= col("doc_id"))
      .withColumn("rnk", row_number().over(
        Window.partitionBy("q_id")
          .orderBy(col("score").desc, col("doc_id").asc)))
      .filter(col("rnk") <= k)
      .select(col("q_id"), col("doc_id"), col("rnk"), col("score"))
  }

  /** Metadata-FILTERED BM25 serve from the stored ledger — "search
    * within tenant / category / language": candidates restrict to
    * `allowed` (one doc_id column) BELOW the posting join, so a
    * selective filter's serve cost is ∝ the allowed set's postings,
    * never the corpus — while df/N/avgdl stay GLOBAL (scores of
    * allowed docs are identical to their unfiltered scores; the
    * filter changes WHO ranks, never HOW a doc scores — so cached /
    * precomputed per-doc statistics stay valid under every filter,
    * and a filtered top-k is a suffix-stable restriction of the
    * unfiltered ranking). The lexical twin of
    * [[Similarity.ivfPqTopKFromIndex]]'s `allowed` leg; on a
    * doc-bucketed ledger the allowed set can additionally elect
    * buckets ([[Ledger.prunedToBatch]]'s discipline) for a
    * partition-pruned posting scan. Returns
    * (q_id, doc_id, rnk, score), self excluded, ties to the lower
    * doc id. */
  def bm25TopKFromIndexFiltered(queryTerms: DataFrame, ledger: DataFrame,
                                allowed: DataFrame, k: Int,
                                k1: Double = 1.2, b: Double = 0.75,
                                logIdf: Boolean = false): DataFrame = {
    require(k > 0, "k must be positive")
    bm25ScoresFromIndex(queryTerms, ledger, k1, b, logIdf, Some(allowed))
      .filter(col("q_id") =!= col("doc_id"))
      .withColumn("rnk", row_number().over(
        Window.partitionBy("q_id")
          .orderBy(col("score").desc, col("doc_id").asc)))
      .filter(col("rnk") <= k)
      .select(col("q_id"), col("doc_id"), col("rnk"), col("score"))
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

  /** Weighted LINEAR score fusion with per-query min-max
    * normalization — [[rrfFuse]]'s calibrated sibling: where RRF
    * discards scores for ranks, linear fusion keeps score SHAPE (a
    * close second stays close), at the price of a normalization step —
    * the standard convex-combination hybrid (score' = Σ wᵢ·normᵢ)
    * every two-tower + lexical stack ships next to RRF. Each ranking's
    * scores rescale per query to [0, 1] via (s − min)/(max − min); a
    * degenerate list (max = min — every candidate equally good) maps
    * to 1.0, not a 0/0; a candidate absent from a ranking contributes
    * 0 from it. Normalization is two exact per-query aggregates + one
    * fixed-order IEEE expression, and the weighted sum folds over the
    * ranker list in the caller's order — deterministic on any engine,
    * no cross-row float sums.
    *
    * Scale shape: inputs are already top-k'd per query (≤ queries × k
    * rows), so the min/max aggregates and the full-outer fuse all run
    * on SMALL frames — the corpus never participates ([[rrfFuse]]'s
    * argument). `rankings`: (frame, weight) pairs, each frame
    * (q_id, n_id, rnk, score). Returns (q_id, n_id, rnk, fused) —
    * ties to the lower candidate id. */
  def linearFuse(rankings: Seq[(DataFrame, Double)], k: Int): DataFrame = {
    require(rankings.nonEmpty, "linearFuse needs at least one ranking")
    require(k > 0, "k must be positive")
    val contribs = rankings.zipWithIndex.map { case ((r, w), i) =>
      val ext = r.groupBy("q_id")
        .agg(min(col("score")).as("_mn"), max(col("score")).as("_mx"))
      r.join(ext, "q_id")
        .select(col("q_id"), col("n_id"),
          (when(col("_mx") > col("_mn"),
            (col("score") - col("_mn")) / (col("_mx") - col("_mn")))
            .otherwise(lit(1.0)) * lit(w)).as(s"_c$i"))
    }
    val joined = contribs.reduce { (a, b) =>
      a.join(b, Seq("q_id", "n_id"), "full_outer")
    }
    val fused = contribs.indices
      .map(i => coalesce(col(s"_c$i"), lit(0.0)))
      .reduce(_ + _)
    joined.withColumn("fused", fused)
      .withColumn("rnk", row_number().over(
        Window.partitionBy("q_id")
          .orderBy(col("fused").desc, col("n_id").asc)))
      .filter(col("rnk") <= k)
      .select(col("q_id"), col("n_id"), col("rnk"), col("fused"))
  }

  /** Pseudo-relevance feedback (RM3-lite query expansion): run the
    * query, take the top `fbDocs` documents as presumed-relevant,
    * harvest their `expTerms` strongest NEW terms, and re-run the
    * expanded query — the classical second-pass recipe that buys
    * recall for vocabulary-mismatched queries with one extra
    * (tiny-side) scoring round. Expansion strength is the INTEGER
    * total term frequency across the feedback docs (ties to the
    * lexicographically smaller term) — deliberately not the RM3
    * float-weighted mixture, which would put an unordered cross-row
    * float sum in the selection rule; the tf rank preserves the
    * "frequent in relevant docs" signal and keeps the expansion
    * bit-deterministic on any engine. Terms already in the query never
    * expand (left_anti).
    *
    * Scale shape: both extra stages touch only query-sized frames —
    * the feedback join reads ≤ queries × fbDocs ledger partitions on
    * the doc key, and the second scoring pass is the same
    * posting-list join as the first. The corpus-sized work (the tf
    * ledger) is built once and shared by both passes.
    * Returns [[bm25TopKFromIndex]]'s shape for the EXPANDED query. */
  def bm25Prf(queryTerms: DataFrame, docs: DataFrame,
              idCol: String, textCol: String, k: Int,
              fbDocs: Int = 3, expTerms: Int = 5,
              k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(fbDocs > 0, "fbDocs must be positive")
    require(expTerms >= 0, "expTerms must be non-negative")
    val ledger = Lineage.truncate(bm25IndexBuild(docs, idCol, textCol))
    val qt0 = queryTerms.select(col("q_id"), col("term")).distinct()
    val fb = bm25TopKFromIndex(qt0, ledger, fbDocs, k1, b)
      .select(col("q_id"), col("doc_id"))
    val expansion = fb.join(ledger, "doc_id")
      .groupBy("q_id", "term").agg(sum("tf").as("_ttf"))
      .join(qt0, Seq("q_id", "term"), "left_anti")
      .withColumn("_r", row_number().over(
        Window.partitionBy("q_id")
          .orderBy(col("_ttf").desc, col("term").asc)))
      .filter(col("_r") <= expTerms)
      .select(col("q_id"), col("term"))
    bm25TopKFromIndex(qt0.unionByName(expansion), ledger, k, k1, b)
  }

  /** Rank-quality evaluation of a candidate ranking against a truth
    * ranking — the measurement face every index family here needs: an
    * approximate index (IVF, PQ, binary, graph) is only as good as its
    * measured recall, and at training-pipeline scale the evaluation is
    * itself a distributed job (millions of held-out queries). Per
    * query:
    *  - `hits`    = |got@k ∩ truth@k| (integer);
    *  - `recall`  = hits / min(k, |truth@k|) — recall@k with truth@k
    *    as the relevant set; the denominator is the query's ACTUAL
    *    truth count so a truth list shorter than k (small corpus,
    *    truncated ground truth) can still score 1.0 (one
    *    integer-to-double divide, no cross-row float sums);
    *  - `rr`      = 1 / (the candidate rank of the FIRST truth@k item
    *    found in got@k), 0 when none — the reciprocal-rank term of
    *    MRR (min over integer ranks, one divide).
    * Means/aggregates are left to the caller over the integer columns
    * (exact partial-agg sums) — never summed here in floating point.
    *
    * Both inputs: (q_id, n_id, rnk), already top-k'd per query (small
    * frames — the corpus never participates; at 10⁶ held-out queries
    * both sides shuffle once on q_id). The query universe is
    * `truth`'s: a query the candidate index returned nothing for
    * scores 0, not absent. */
  def evalRanking(got: DataFrame, truth: DataFrame, k: Int): DataFrame = {
    require(k > 0, "k must be positive")
    val t = truth.filter(col("rnk") <= k).select(col("q_id"), col("n_id"))
    val g = got.filter(col("rnk") <= k)
      .select(col("q_id"), col("n_id"), col("rnk"))
    val per = g.join(t, Seq("q_id", "n_id"))
      .groupBy("q_id")
      .agg(count(lit(1)).as("hits"), min(col("rnk")).as("_minr"))
    // Recall denominator = |truth@k| per query, NOT a flat k: a truth
    // ranking truncated below k (small corpus, short truth list) must
    // still allow recall = 1 when every relevant item was found.
    t.groupBy("q_id").agg(count(lit(1)).as("_tcnt"))
      .join(per, Seq("q_id"), "left")
      .select(col("q_id"),
        coalesce(col("hits"), lit(0L)).as("hits"),
        (coalesce(col("hits"), lit(0L)).cast("double") /
          least(lit(k.toLong), col("_tcnt")).cast("double")).as("recall"),
        coalesce(lit(1.0) / col("_minr").cast("double"), lit(0.0)).as("rr"))
  }

  /** Hard-negative mining for contrastive training — the standard
    * recipe: candidates that a LEXICAL ranker (BM25) scores high but
    * the DENSE ranker's top-k does NOT contain. Lexically-close-but-
    * semantically-absent documents are exactly the negatives that teach
    * an embedding model the distinctions BM25 can see and it cannot;
    * mining them is a training-data-pipeline job over the whole corpus
    * (one mined set per training query).
    *
    * Dataflow: both inputs are already top-k'd per query
    * (≤ queries × k rows), so the mine is an anti-join of SMALL frames
    * — the corpus never participates; at 10⁹ queries both sides shuffle
    * once on q_id. Candidates keep their lexical rank order
    * (re-numbered dense 1..k after the removal — rank is the mining
    * priority signal). Inputs: (q_id, n_id, rnk) each.
    * Returns (q_id, n_id, rnk, lex_rnk). */
  def hardNegatives(lexical: DataFrame, dense: DataFrame, k: Int): DataFrame = {
    require(k > 0, "k must be positive")
    lexical.select(col("q_id"), col("n_id"), col("rnk").as("lex_rnk"))
      .join(dense.select(col("q_id"), col("n_id")), Seq("q_id", "n_id"),
        "left_anti")
      .withColumn("rnk", row_number().over(
        Window.partitionBy("q_id").orderBy(col("lex_rnk").asc)))
      .filter(col("rnk") <= k)
      .select(col("q_id"), col("n_id"), col("rnk"), col("lex_rnk"))
  }

  /** Maximal-marginal-relevance diversity re-rank (Carbonell &
    * Goldstein, SIGIR 1998) — the curation face of retrieval: a plain
    * top-k returns k near-duplicates of the best hit; MMR greedily
    * picks candidates maximizing
    *   λ·relevance − (1−λ)·max_{s ∈ selected} cos(candidate, s)
    * so each pick is relevant AND far from what is already chosen —
    * the standard recipe for diverse few-shot example selection,
    * dedup'd retrieval-augmented contexts, and diverse training-pair
    * mining. The first pick has an empty selected set (the penalty
    * coalesces to 0), i.e. pure relevance.
    *
    * Dataflow: `candidates` is already top-k'd per query
    * (q_id, n_id, rnk, score — ≤ queries × poolK rows), and vectors
    * join in ONCE from `corpus` for the pool only; the k greedy
    * rounds then run over query-sized frames ([[Lineage.truncate]]
    * per round — the beam-hop loop discipline), each round one
    * pool × selected cosine pass + a per-query argmax window. The
    * corpus never participates beyond the initial pool vector fetch.
    * Ties break to the lower candidate id at every argmax; the
    * objective is a fixed-order IEEE expression, so the whole greedy
    * trajectory is oracle-replayable. Returns
    * (q_id, n_id, pick 1.., mmr). */
  def mmrRerank(candidates: DataFrame, corpus: DataFrame,
                idCol: String, vecCol: String, k: Int,
                lambda: Double = 0.5, dim: Int = 64): DataFrame = {
    require(k > 0, "k must be positive")
    require(lambda >= 0.0 && lambda <= 1.0, "lambda must be in [0, 1]")
    val vecs = corpus.select(col(idCol).as("n_id"), col(vecCol).as("n_vec"),
      VectorFns.l2NormN(col(vecCol), dim).as("n_nrm"))
    val pool = Lineage.truncate(
      candidates.select(col("q_id"), col("n_id"), col("score"))
        .join(vecs, "n_id"))
    var selected = Lineage.truncate(
      pool.sparkSession.createDataFrame(
        pool.sparkSession.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("q_id",
            pool.schema("q_id").dataType),
          org.apache.spark.sql.types.StructField("n_id",
            pool.schema("n_id").dataType),
          org.apache.spark.sql.types.StructField("pick",
            org.apache.spark.sql.types.IntegerType),
          org.apache.spark.sql.types.StructField("mmr",
            org.apache.spark.sql.types.DoubleType)))))
    var round = 1
    while (round <= k) {
      val remaining = pool.join(
        selected.select(col("q_id"), col("n_id")), Seq("q_id", "n_id"),
        "left_anti")
      val selVecs = selected.select(col("q_id"), col("n_id").as("s_id"))
        .join(vecs.select(col("n_id").as("s_id"), col("n_vec").as("s_vec"),
          col("n_nrm").as("s_nrm")), "s_id")
      val penalty = remaining.join(selVecs, Seq("q_id"))
        .withColumn("_cos",
          when(col("n_nrm") > 0.0 && col("s_nrm") > 0.0,
            VectorFns.dotN(col("n_vec"), col("s_vec"), dim) /
              (col("n_nrm") * col("s_nrm"))))
        .groupBy("q_id", "n_id").agg(max(col("_cos")).as("_mx"))
      val best = remaining
        .join(penalty, Seq("q_id", "n_id"), "left")
        .withColumn("mmr", lit(lambda) * col("score") -
          lit(1.0 - lambda) * coalesce(col("_mx"), lit(0.0)))
        .withColumn("_r", row_number().over(
          Window.partitionBy("q_id")
            .orderBy(col("mmr").desc, col("n_id").asc)))
        .filter(col("_r") === 1)
        .select(col("q_id"), col("n_id"), lit(round).as("pick"), col("mmr"))
      selected = Lineage.truncate(selected.unionByName(best))
      round += 1
    }
    selected.select(col("q_id"), col("n_id"), col("pick"), col("mmr"))
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
  /** MaxSim over an ANN SHORTLIST — the production two-stage
    * composition [[maxSimTopK]]'s scaladoc prescribes: a cheap
    * single-vector ANN stage (centroid / [CLS] representative) picks
    * `pairs` = (q_doc, n_doc) candidates, and the expensive
    * all-vectors MaxSim runs ONLY on those pairs. The corpus's vector
    * bags are touched for shortlisted documents alone (the pair frame
    * — ≤ query docs × shortlist rows — broadcasts onto the corpus
    * scan; everything else prunes before any cosine runs), which is
    * what makes multi-vector late interaction affordable at 10⁹ docs:
    * full MaxSim is |Q docs| × |D docs| × both bag widths, the
    * composed form is |Q docs| × shortlist × bag widths.
    *
    * Scoring, null contract ([[maxSimTopK]]'s zero-norm posture), tie
    * order, and the collected-struct fold are identical to the
    * unrestricted operator — restriction changes the candidate set,
    * never the scoring (the `ivfSqTopK` routing argument). `k` must be
    * ≤ the per-query shortlist size to mean anything; pairs with
    * q_doc = n_doc are excluded as always. */
  def maxSimRerank(pairs: DataFrame, queries: DataFrame, corpus: DataFrame,
                   docCol: String, idCol: String, vecCol: String, k: Int,
                   dim: Int = 64, maxQueryVecs: Long = 1L << 20): DataFrame = {
    require(k > 0, "k must be positive")
    val nq = queries.select(col(idCol)).count()
    require(nq <= maxQueryVecs,
      s"maxSimRerank: query side holds $nq vectors > maxQueryVecs=" +
        s"$maxQueryVecs; query docs broadcast their whole vector bags — " +
        "batch the query docs or raise the cap deliberately")
    val q = queries.select(col(docCol).as("q_doc"), col(idCol).as("q_vid"),
      col(vecCol).as("q_vec"), VectorFns.l2NormN(col(vecCol), dim).as("q_nrm"))
    val c = corpus.select(col(docCol).as("n_doc"), col(vecCol).as("n_vec"),
      VectorFns.l2NormN(col(vecCol), dim).as("n_nrm"))
    val pr = pairs.select(col("q_doc"), col("n_doc")).distinct()
    val best = c.join(broadcast(pr), Seq("n_doc"))
      .join(broadcast(q), Seq("q_doc"))
      .filter(col("q_doc") =!= col("n_doc"))
      .withColumn("cos",
        when(col("q_nrm") > 0.0 && col("n_nrm") > 0.0,
          VectorFns.dotN(col("q_vec"), col("n_vec"), dim) /
            (col("q_nrm") * col("n_nrm"))))
      .groupBy("q_doc", "q_vid", "n_doc")
      .agg(max(col("cos")).as("mx"))
    best.filter(col("mx").isNotNull)
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
    // Null-contract: cos is null for a zero-norm vector on EITHER
    // side. max() skips nulls, so a zero-norm CORPUS vector simply
    // never wins; but a zero-norm QUERY vector is null against every
    // corpus vector and its null mx would poison the whole doc's fold
    // (acc + null = null). Drop those rows — an unmatchable query
    // vector contributes 0 to the MaxSim sum (and a query doc whose
    // vectors are ALL zero-norm drops entirely, the family's refuse/
    // drop posture — sqTopK, pqTopK drop refused rows the same way).
    best.filter(col("mx").isNotNull)
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
