package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.Tables
import graft.functions.TextFns
import graft.operators.{Dedup, Prune, Sampling, Temporal}

/** Round-3 extensions: the missing middle of the dedup pipeline
  * (candidate pairs → connected-component clusters), Bloom-prefiltered
  * semi joins, deterministic sampling/quota curation ops, PII redaction,
  * per-group embedding centroids, and the forward as-of join. Same
  * determinism rules as [[Registry]]. */
object Registry3 {

  private def o(s: SparkSession, d: String) = Tables.orders(s, d)
  private def li(s: SparkSession, d: String) = Tables.lineitem(s, d)
  private def ev(s: SparkSession, d: String) = Tables.events(s, d)
  private def docs(s: SparkSession, d: String) = Tables.documents(s, d)
  private def emb(s: SparkSession, d: String) = Tables.embeddings(s, d)

  /** Near-dup CLUSTERS: MinHash+LSH candidate pairs closed under
    * transitivity ([[Dedup.connectedComponents]] min-label propagation),
    * every document labeled with its component's smallest doc_id
    * (singletons label themselves). This is the operator that turns
    * pairwise dedup signals into the keep/drop decision a training
    * pipeline actually executes. Oracle: the same pair SQL as
    * dedup_minhash_lsh, closed with a recursive CTE. */
  /** The MinHash+LSH pairs → recursive transitive closure CTE chain
    * (w…lbl), shared with round-14's quality-aware survivor gate —
    * one construction so the two can never test different clusterings. */
  private[queries] def sqlMinhashCc: String =
    """w AS (SELECT doc_id, string_split(text, ' ') AS wl FROM documents),
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
      |lbl AS (SELECT id, MIN(r) AS cl FROM reach GROUP BY id)""".stripMargin

  val dedupClusters = Q("dedup_clusters",
    s"""WITH RECURSIVE $sqlMinhashCc
      |SELECT d.doc_id, COALESCE(l.cl, d.doc_id) AS cluster_id
      |FROM documents d LEFT JOIN lbl l ON d.doc_id = l.id
      |ORDER BY d.doc_id""".stripMargin) { (s, d) =>
    val corpus = docs(s, d)
    val pairs = Dedup.minhashCandidates(corpus, "doc_id", "text")
    val cc = Dedup.connectedComponents(pairs, "a_id", "b_id")
    corpus.select("doc_id")
      .join(cc, corpus("doc_id") === cc("id"), "left")
      .select(col("doc_id"),
        coalesce(col("cluster"), col("doc_id")).as("cluster_id"))
      .orderBy("doc_id")
  }

  /** Bloom-prefiltered semi join ([[Prune.bloomSemiJoin]]): lineitems of
    * high-value orders. The Bloom pass prunes the fact scan before the
    * shuffle; the result is exactly the semi join, so the plain IN
    * subquery is the oracle. */
  val q38BloomSemiJoin = Q("q38_bloom_semi_join",
    """SELECT l_orderkey, COUNT(*) AS n_items,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(30,10))) AS DOUBLE) AS sum_qty
      |FROM lineitem
      |WHERE l_orderkey IN (SELECT o_orderkey FROM orders WHERE o_totalprice > 400000)
      |GROUP BY l_orderkey ORDER BY l_orderkey""".stripMargin) { (s, d) =>
    val dim = o(s, d).filter(col("o_totalprice") > 400000).select("o_orderkey")
    Prune.bloomSemiJoin(
      li(s, d).select("l_orderkey", "l_quantity"), "l_orderkey",
      dim, "o_orderkey", expectedItems = 100000L)
      .groupBy("l_orderkey")
      .agg(count(lit(1)).as("n_items"),
        sum(col("l_quantity").cast(DecimalType(30, 10))).cast("double").as("sum_qty"))
      .orderBy("l_orderkey")
  }

  /** Deterministic stratified Bernoulli sample, 25% per language
    * ([[Sampling.stratifiedSample]]): pure filter, zero shuffles, same
    * rows on any cluster at any partitioning. */
  val sampleStratified = Q("sample_stratified",
    """SELECT doc_id, lang FROM documents
      |WHERE substr(md5('graft:' || lang || ':' || CAST(doc_id AS VARCHAR)), 1, 8)
      |      < '40000000'
      |ORDER BY doc_id""".stripMargin) { (s, d) =>
    Sampling.stratifiedSample(docs(s, d), col("lang"), col("doc_id"), 0.25)
      .select("doc_id", "lang")
      .orderBy("doc_id")
  }

  /** Per-source quota ([[Sampling.quotaPerGroup]]): at most 5 documents
    * per source, drawn by deterministic salted-hash order — the
    * cap-per-domain curation op. */
  val sampleQuota = Q("sample_quota",
    """SELECT doc_id, source FROM (
      |  SELECT doc_id, source, ROW_NUMBER() OVER (
      |    PARTITION BY source
      |    ORDER BY md5('graft:' || CAST(doc_id AS VARCHAR)), doc_id) AS rn
      |  FROM documents)
      |WHERE rn <= 5 ORDER BY doc_id""".stripMargin) { (s, d) =>
    Sampling.quotaPerGroup(docs(s, d), col("source"), col("doc_id"), 5)
      .select("doc_id", "source")
      .orderBy("doc_id")
  }

  /** PII redaction ([[TextFns.redactPii]]) over synthetic PII built from
    * real event columns (the corpus itself contains none): emails, URLs
    * and long digit runs all hit. DuckDB mirrors with RE2 + 'g'. */
  val textRedact = Q("text_redact",
    """SELECT event_id,
      |  regexp_replace(regexp_replace(regexp_replace(
      |    'u' || CAST(user_id AS VARCHAR) || ' mail user' || CAST(user_id AS VARCHAR)
      |      || '@mail.example.com see https://ex.com/p/' || CAST(event_id AS VARCHAR)
      |      || '?c=4111222233334444 ' || props,
      |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
      |    'https?://[^ \t\n]+', '<URL>', 'g'),
      |    '[0-9]{8,}', '<NUM>', 'g') AS redacted
      |FROM events WHERE event_type = 'click'
      |ORDER BY event_id""".stripMargin) { (s, d) =>
    val raw = concat(
      lit("u"), col("user_id").cast("string"),
      lit(" mail user"), col("user_id").cast("string"),
      lit("@mail.example.com see https://ex.com/p/"), col("event_id").cast("string"),
      lit("?c=4111222233334444 "), col("props"))
    ev(s, d).filter(col("event_type") === "click")
      .select(col("event_id"), TextFns.redactPii(raw).as("redacted"))
      .orderBy("event_id")
  }

  /** Per-label embedding centroids (the k-means update step / class
    * prototype op): posexplode to (label, pos, v), one partial-agg
    * shuffle on (label, pos) — the 64-float vectors never ride the
    * exchange whole. Decimal sums + single IEEE division keep the
    * centroid bit-identical across engines ([[graft.functions.AggFns]]
    * discipline); floats widen to double BEFORE the decimal cast. */
  val embCentroids = Q("emb_centroids",
    """SELECT label, t.i - 1 AS pos,
      |  CAST(ROUND(SUM(CAST(CAST(embedding[t.i] AS DOUBLE) AS DECIMAL(30,10))), 4)
      |       AS DOUBLE) / COUNT(*) AS centroid,
      |  COUNT(*) AS n
      |FROM embeddings, (SELECT unnest(range(1, 65)) AS i) t
      |GROUP BY 1, 2 ORDER BY label, pos""".stripMargin) { (s, d) =>
    emb(s, d)
      .select(col("label"), posexplode(col("embedding")).as(Seq("p", "v")))
      .select(col("label"), col("p").cast("long").as("pos"), col("v"))
      .groupBy("label", "pos")
      .agg(
        (round(sum(col("v").cast("double").cast(DecimalType(30, 10))), 4)
          .cast("double") / count(lit(1))).as("centroid"),
        count(lit(1)).as("n"))
      .orderBy("label", "pos")
  }

  /** Forward as-of join ([[Temporal.asofJoinForward]]): each view matched
    * to the EARLIEST click by the same user at or after it — the "time to
    * next action" mirror of q24. DuckDB native ASOF with `<=`. */
  val q39AsofForward = Q("q39_asof_forward",
    """WITH v AS (SELECT event_id, user_id, ts FROM events
      |  WHERE event_type = 'view' AND ts IS NOT NULL),
      |c AS (SELECT user_id, ts, MAX(event_id) AS click_id FROM events
      |  WHERE event_type = 'click' AND ts IS NOT NULL GROUP BY 1, 2)
      |SELECT v.event_id, v.user_id, c.click_id,
      |  date_diff('second', v.ts, c.ts) AS gap_s
      |FROM v ASOF LEFT JOIN c ON v.user_id = c.user_id AND v.ts <= c.ts
      |ORDER BY v.event_id""".stripMargin) { (s, d) =>
    val e = ev(s, d)
    val views = e.filter(col("event_type") === "view" && col("ts").isNotNull)
      .select("event_id", "user_id", "ts")
    val clicks = e.filter(col("event_type") === "click" && col("ts").isNotNull)
      .groupBy("user_id", "ts").agg(max(col("event_id")).as("click_id"))
      .withColumnRenamed("ts", "click_ts")
    Temporal.asofJoinForward(views, clicks, on = "user_id",
      leftTs = "ts", rightTs = "click_ts",
      rightVals = Seq("click_id", "click_ts"))
      .select(col("event_id"), col("user_id"), col("click_id"),
        (col("click_ts").cast("long") - col("ts").cast("long")).as("gap_s"))
      .orderBy("event_id")
  }

  /** Benchmark decontamination ([[Dedup.decontaminate]]): the corpus with
    * every document leaking ≥5 distinct 3-shingles into the holdout
    * split (source = src0) removed — the eval-leak check. Holdout
    * shingles broadcast; the corpus never shuffles for the probe. */
  val decontaminateQ = Q("decontaminate",
    """WITH w AS (SELECT doc_id, source, string_split(text, ' ') AS wl FROM documents),
      |sh AS (SELECT doc_id, source, list_distinct(list_transform(range(1, len(wl) - 1),
      |  i -> wl[i] || ' ' || wl[i+1] || ' ' || wl[i+2])) AS shl FROM w),
      |c AS (SELECT doc_id, unnest(shl) AS s FROM sh WHERE source <> 'src0'),
      |h AS (SELECT DISTINCT unnest(shl) AS s FROM sh WHERE source = 'src0'),
      |bad AS (SELECT c.doc_id FROM c JOIN h USING (s)
      |  GROUP BY c.doc_id HAVING COUNT(*) >= 5)
      |SELECT doc_id, source FROM documents
      |WHERE source <> 'src0' AND doc_id NOT IN (SELECT doc_id FROM bad)
      |ORDER BY doc_id""".stripMargin) { (s, d) =>
    val all = docs(s, d)
    Dedup.decontaminate(
      all.filter(col("source") =!= "src0"), "doc_id", "text",
      all.filter(col("source") === "src0"), "text", minShared = 5)
      .select("doc_id", "source")
      .orderBy("doc_id")
  }

  /** Vocabulary head: global top-100 tokens by frequency (tokenizer-
    * vocab construction). Partial-agg wordcount + TakeOrderedAndProject —
    * never a full sort of the vocabulary. */
  val textVocabTopk = Q("text_vocab_topk",
    """SELECT t AS token, COUNT(*) AS cnt
      |FROM (SELECT unnest(string_split(text, ' ')) AS t FROM documents)
      |GROUP BY 1 ORDER BY cnt DESC, token LIMIT 100""".stripMargin) { (s, d) =>
    docs(s, d).select(explode(split(col("text"), " ")).as("token"))
      .groupBy("token").agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("token")).limit(100)
  }

  /** TF-IDF term scoring (corpus-relevance weighting). The idf is kept
    * rational — tf·N/df via exactly-rounded IEEE multiply/divide — so the
    * score bit-matches across engines (a transcendental log would not).
    * Shape: one tokenize pass feeds both the tf agg and the distinct-df
    * agg; N is a broadcast scalar. */
  val textTfidf = Q("text_tfidf",
    """WITH toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS t FROM documents),
      |tf AS (SELECT doc_id, t, COUNT(*) AS tf FROM toks GROUP BY 1, 2),
      |df AS (SELECT t, COUNT(*) AS df
      |  FROM (SELECT DISTINCT doc_id, t FROM toks) GROUP BY 1),
      |n AS (SELECT COUNT(*) AS n_docs FROM documents)
      |SELECT tf.doc_id, tf.t AS token, tf.tf, df.df,
      |  CAST(tf.tf AS DOUBLE) * CAST(n.n_docs AS DOUBLE) / CAST(df.df AS DOUBLE) AS score
      |FROM tf JOIN df USING (t) CROSS JOIN n
      |WHERE tf.doc_id < 50
      |ORDER BY doc_id, token""".stripMargin) { (s, d) =>
    val toks = docs(s, d).select(col("doc_id"), explode(split(col("text"), " ")).as("t"))
    val tf = toks.groupBy("doc_id", "t").agg(count(lit(1)).as("tf"))
    val dfreq = toks.distinct().groupBy("t").agg(count(lit(1)).as("df"))
    val n = docs(s, d).agg(count(lit(1)).as("n_docs"))
    tf.filter(col("doc_id") < 50)
      .join(dfreq, "t")
      .crossJoin(broadcast(n))
      .select(col("doc_id"), col("t").as("token"), col("tf"), col("df"),
        (col("tf").cast("double") * col("n_docs").cast("double")
          / col("df").cast("double")).as("score"))
      .orderBy("doc_id", "token")
  }

  /** Sliding-window counts ([[graft.streaming.StreamingOps.slidingCounts]]
    * batch face): 1-hour windows sliding every 15 minutes — each event
    * lands in exactly 4 windows. Oracle replays Spark's epoch-aligned
    * window starts arithmetically. */
  val q40SlidingWindow = Q("q40_sliding_window",
    """SELECT CAST(floor(epoch(ts) / 900) AS BIGINT) * 900 - 900 * t.k AS ws,
      |  event_type, COUNT(*) AS cnt
      |FROM events CROSS JOIN (SELECT unnest(range(0, 4)) AS k) t
      |WHERE ts IS NOT NULL
      |GROUP BY 1, 2 ORDER BY ws, event_type""".stripMargin) { (s, d) =>
    graft.streaming.StreamingOps.slidingCounts(
      ev(s, d).filter(col("ts").isNotNull), "ts", "event_type")
      .select(col("ws").cast("long").as("ws"), col("event_type"), col("cnt"))
      .orderBy("ws", "event_type")
  }

  /** Quantile bucketing: per-language length deciles (curriculum/quality
    * binning). NTILE's equal-fill definition matches across engines; the
    * (n_chars, doc_id) order is total, so buckets are deterministic. */
  val q41Ntile = Q("q41_ntile_bucketing",
    """SELECT doc_id, lang, NTILE(10) OVER (
      |  PARTITION BY lang ORDER BY n_chars, doc_id) AS decile
      |FROM documents ORDER BY doc_id""".stripMargin) { (s, d) =>
    import org.apache.spark.sql.expressions.Window
    docs(s, d).select(col("doc_id"), col("lang"),
      ntile(10).over(Window.partitionBy("lang").orderBy("n_chars", "doc_id"))
        .cast("long").as("decile"))
      .orderBy("doc_id")
  }

  /** Incremental exact dedup ([[Dedup.dedupIncremental]]): the batch
    * (doc_id ≥ 250) dedups within itself, then against the ledger of
    * already-ingested digests (doc_id < 250) — only digests ride the
    * anti join. */
  val dedupIncrementalQ = Q("dedup_incremental",
    """WITH seen AS (SELECT DISTINCT md5(text) AS h FROM documents WHERE doc_id < 250),
      |surv AS (SELECT doc_id, n_chars, text FROM (
      |  SELECT doc_id, n_chars, text,
      |    ROW_NUMBER() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
      |  FROM documents WHERE doc_id >= 250)
      |  WHERE rn = 1)
      |SELECT doc_id, n_chars FROM surv
      |WHERE md5(text) NOT IN (SELECT h FROM seen)
      |ORDER BY doc_id""".stripMargin) { (s, d) =>
    val all = docs(s, d)
    val ledger = all.filter(col("doc_id") < 250).select(md5(col("text")).as("h"))
    Dedup.dedupIncremental(all.filter(col("doc_id") >= 250), "doc_id", "text",
      ledger, "h")
      .select("doc_id", "n_chars")
      .orderBy("doc_id")
  }

  /** Fixed-width histogram profile ([[graft.operators.Relational
    * .histogram]]) of event values: 10 bins of width 50 from 0 — the
    * one-pass profiling primitive (counts + exact min/max per bin). */
  val profileHistogram = Q("profile_histogram",
    """SELECT LEAST(GREATEST(CAST(floor(value / 50.0) AS BIGINT), 0), 9) AS bin,
      |  COUNT(*) AS cnt, MIN(value) AS lo_v, MAX(value) AS hi_v
      |FROM events WHERE value IS NOT NULL
      |GROUP BY 1 ORDER BY bin""".stripMargin) { (s, d) =>
    graft.operators.Relational.histogram(ev(s, d), col("value"),
      lo = 0.0, width = 50.0, nBins = 10)
      .orderBy("bin")
  }

  /** SimHash near-dup pairs ([[Dedup.simhashPairs]]): 64-bit signatures
    * (bits 33-64 from a salted second digest), 16-bit slice blocking,
    * exact hamming ≤ 3 filter. Completes the simhash path
    * (dedup_simhash emits the signatures; this emits the decisions). */
  val dedupSimhashPairs = Q("dedup_simhash_pairs",
    """WITH sigs AS (SELECT doc_id, array_to_string(list_transform(range(1, 65),
      |    p -> CASE WHEN 2 * len(list_filter(string_split(text, ' '),
      |        x -> substr(md5(CASE WHEN p <= 32 THEN x ELSE '1:' || x END),
      |                    ((p - 1) % 32) + 1, 1) >= '8'))
      |        > len(string_split(text, ' '))
      |      THEN '1' ELSE '0' END), '') AS sig
      |  FROM documents),
      |ch AS (SELECT doc_id, sig, t.ci, substr(sig, t.ci * 16 + 1, 16) AS ck
      |  FROM sigs CROSS JOIN (SELECT unnest(range(0, 4)) AS ci) t),
      |cand AS (SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id,
      |    a.sig AS sa, b.sig AS sb
      |  FROM ch a JOIN ch b ON a.ci = b.ci AND a.ck = b.ck
      |    AND a.doc_id < b.doc_id)
      |SELECT a_id, b_id, hamming FROM (
      |  SELECT a_id, b_id, CAST(len(list_filter(range(1, 65),
      |    i -> substr(sa, i, 1) != substr(sb, i, 1))) AS BIGINT) AS hamming
      |  FROM cand)
      |WHERE hamming <= 3 ORDER BY a_id, b_id""".stripMargin) { (s, d) =>
    Dedup.simhashPairs(docs(s, d), "doc_id", "text")
      .orderBy("a_id", "b_id")
  }

  /** Sketch percentiles (Greenwald-Khanna via percentile_approx) — the
    * 100 TB drop-in for q22's exact interpolation (SCALE.md). Made
    * hash-checkable the same way as q23_approx_distinct: the output
    * carries the exact interpolated quantiles (DuckDB quantile_cont
    * bit-matches them, proven by q22) plus `*_within` booleans asserting
    * each sketch value landed between the exact quantiles at p±0.02
    * (accuracy 10000 ⇒ rank error 1e-4, 200× slack; the 0.99 upper bound
    * clamps to max). Oracle emits literal TRUE per bound. */
  val q42ApproxPercentiles = Q("q42_approx_percentiles",
    """SELECT l_returnflag,
      |  quantile_cont(l_extendedprice, 0.5) AS p50,
      |  quantile_cont(l_extendedprice, 0.95) AS p95,
      |  quantile_cont(l_extendedprice, 0.99) AS p99,
      |  TRUE AS p50_within, TRUE AS p95_within, TRUE AS p99_within
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin) { (s, d) =>
    val x = col("l_extendedprice")
    // ONE exact-percentile aggregate for all seven cut points (each
    // separate percentile(...) call buffers the whole group again — at
    // sf0.1 the fused form is ~5× faster) + one sketch + one max.
    li(s, d).groupBy("l_returnflag")
      .agg(percentile_approx(x,
        array(lit(0.5), lit(0.95), lit(0.99)), lit(10000)).as("_ap"),
        percentile(x, array(lit(0.48), lit(0.5), lit(0.52), lit(0.93),
          lit(0.95), lit(0.97), lit(0.99))).as("_p"),
        max(x).as("_hi99"))
      .select(col("l_returnflag"),
        element_at(col("_p"), 2).as("p50"),
        element_at(col("_p"), 5).as("p95"),
        element_at(col("_p"), 7).as("p99"),
        (element_at(col("_ap"), 1)
          .between(element_at(col("_p"), 1), element_at(col("_p"), 3)))
          .as("p50_within"),
        (element_at(col("_ap"), 2)
          .between(element_at(col("_p"), 4), element_at(col("_p"), 6)))
          .as("p95_within"),
        (element_at(col("_ap"), 3)
          .between(element_at(col("_p"), 6), col("_hi99")))
          .as("p99_within"))
      .orderBy("l_returnflag")
  }

  /** Multiset set ops — the ALL twins of q26/q27's distinct-set forms:
    * multiplicities are preserved (min for intersect, difference for
    * except), which Spark plans as a single count-compare aggregation,
    * not a distinct + join. Output rows repeat, so the total order is on
    * the (repeating) value columns — identical rows hash identically. */
  val q43IntersectAll = Q("q43_intersect_all",
    """SELECT user_id, event_type FROM events WHERE event_id % 2 = 0
      |INTERSECT ALL
      |SELECT user_id, event_type FROM events WHERE event_id % 2 = 1
      |ORDER BY user_id, event_type""".stripMargin) { (s, d) =>
    val e = ev(s, d)
    e.filter(col("event_id") % 2 === 0).select("user_id", "event_type")
      .intersectAll(
        e.filter(col("event_id") % 2 === 1).select("user_id", "event_type"))
      .orderBy("user_id", "event_type")
  }

  val q44ExceptAll = Q("q44_except_all",
    """SELECT user_id, event_type FROM events WHERE event_id % 2 = 0
      |EXCEPT ALL
      |SELECT user_id, event_type FROM events WHERE event_id % 2 = 1
      |ORDER BY user_id, event_type""".stripMargin) { (s, d) =>
    val e = ev(s, d)
    e.filter(col("event_id") % 2 === 0).select("user_id", "event_type")
      .exceptAll(
        e.filter(col("event_id") % 2 === 1).select("user_id", "event_type"))
      .orderBy("user_id", "event_type")
  }

  /** Near-dup survivors ([[Dedup.nearDedupSurvivors]]): pairs → clusters
    * → keep the cluster rep — the applied form of dedup_clusters. */
  val dedupNearSurvivors = Q("dedup_near_survivors",
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
      |lbl AS (SELECT id, MIN(r) AS cl FROM reach GROUP BY id)
      |SELECT d.doc_id, d.lang FROM documents d LEFT JOIN lbl l ON d.doc_id = l.id
      |WHERE COALESCE(l.cl, d.doc_id) = d.doc_id
      |ORDER BY d.doc_id""".stripMargin) { (s, d) =>
    Dedup.nearDedupSurvivors(docs(s, d), "doc_id", "text")
      .select("doc_id", "lang")
      .orderBy("doc_id")
  }

  /** Incremental MinHash+LSH ([[Dedup.minhashCandidatesAgainst]]): the
    * arriving batch (doc_id ≥ 250) probes the corpus band index
    * (doc_id < 250) — candidates are batch × corpus, never corpus². */
  val dedupMinhashIncremental = Q("dedup_minhash_incremental",
    """WITH w AS (SELECT doc_id, string_split(text, ' ') AS wl FROM documents),
      |sh AS (SELECT doc_id, list_transform(range(1, len(wl) - 1),
      |  i -> wl[i] || ' ' || wl[i+1] || ' ' || wl[i+2]) AS shl FROM w),
      |sig AS (SELECT doc_id, list_transform(range(0, 8),
      |  j -> list_min(list_transform(shl,
      |    x -> substr(md5(CAST(j // 4 AS VARCHAR) || ':' || x),
      |                CAST((j % 4) * 8 + 1 AS INT), 8)))) AS mh
      |  FROM sh),
      |bands AS (SELECT doc_id, t.bnd, md5(mh[2*t.bnd+1] || mh[2*t.bnd+2]) AS bk
      |  FROM sig CROSS JOIN (SELECT unnest(range(0, 4)) AS bnd) t)
      |SELECT DISTINCT a.doc_id AS batch_id, b.doc_id AS corpus_id
      |FROM bands a JOIN bands b ON a.bnd = b.bnd AND a.bk = b.bk
      |WHERE a.doc_id >= 250 AND b.doc_id < 250
      |ORDER BY batch_id, corpus_id""".stripMargin) { (s, d) =>
    val all = docs(s, d)
    Dedup.minhashCandidatesAgainst(
      all.filter(col("doc_id") >= 250), all.filter(col("doc_id") < 250),
      "doc_id", "text")
      .orderBy("batch_id", "corpus_id")
  }

  /** Salted skew-proof join ([[graft.operators.Skew.saltedJoin]]):
    * lineitem ⋈ supplier with the hot-key spread over 8 salt buckets —
    * result identical to the plain join (the oracle), aggregated per
    * nation. */
  val q45SaltedJoin = Q("q45_salted_join",
    """SELECT s_nationkey, COUNT(*) AS n_items,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(30,10))) AS DOUBLE) AS sum_qty
      |FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
      |GROUP BY s_nationkey ORDER BY s_nationkey""".stripMargin) { (s, d) =>
    val sup = Tables.supplier(s, d).select("s_suppkey", "s_nationkey")
    graft.operators.Skew.saltedJoin(
      li(s, d).select("l_suppkey", "l_quantity"), sup,
      col("l_suppkey"), col("s_suppkey"), buckets = 8)
      .groupBy("s_nationkey")
      .agg(count(lit(1)).as("n_items"),
        sum(col("l_quantity").cast(DecimalType(30, 10))).cast("double").as("sum_qty"))
      .orderBy("s_nationkey")
  }

  /** End-to-end curation pipeline — the flagship composed training-data
    * query: quality-score filter → exact dedup (keep-first) →
    * deterministic 50% stratified sample per language → 20-doc quota per
    * source. Every stage is one of the gate-checked operators; the
    * composition itself is what a production corpus build runs. */
  val curatePipeline = Q("curate_pipeline", {
    val en = graft.functions.TextFns.EnStop.map(w => s"'$w'").mkString("[", ", ", "]")
    s"""WITH t AS (SELECT doc_id, text, lang, source,
       |  CAST(length(regexp_replace(text, '[a-z0-9 ]', '', 'g')) AS DOUBLE)
       |    / CAST(length(text) AS DOUBLE) AS punct_ratio,
       |  CAST(list_sum(list_transform(string_split(text, ' '), x -> length(x))) AS DOUBLE)
       |    / CAST(len(string_split(text, ' ')) AS DOUBLE) AS avg_word_len,
       |  CAST(len(list_filter(string_split(text, ' '), x -> list_contains($en, x))) AS DOUBLE)
       |    / CAST(len(string_split(text, ' ')) AS DOUBLE) AS stopword_ratio
       |  FROM documents),
       |q AS (SELECT doc_id, text, lang, source,
       |  ((CASE WHEN length(text) >= 100 THEN 1.0
       |      ELSE CAST(length(text) AS DOUBLE) / 100.0 END
       |    + (1.0 - LEAST(punct_ratio * 5.0, 1.0))
       |    + (CASE WHEN avg_word_len >= 3.0 AND avg_word_len <= 10.0
       |        THEN 1.0 ELSE 0.5 END)
       |    + LEAST(stopword_ratio * 4.0, 1.0)) / 4.0) AS quality
       |  FROM t),
       |f AS (SELECT doc_id, text, lang, source FROM q WHERE quality >= 0.7),
       |dd AS (SELECT doc_id, lang, source FROM (
       |  SELECT doc_id, lang, source,
       |    ROW_NUMBER() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
       |  FROM f) WHERE rn = 1),
       |sm AS (SELECT doc_id, lang, source FROM dd
       |  WHERE substr(md5('graft:' || lang || ':' || CAST(doc_id AS VARCHAR)), 1, 8)
       |        < '80000000')
       |SELECT doc_id, lang, source FROM (
       |  SELECT doc_id, lang, source, ROW_NUMBER() OVER (
       |    PARTITION BY source
       |    ORDER BY md5('graft:' || CAST(doc_id AS VARCHAR)), doc_id) AS rn2
       |  FROM sm)
       |WHERE rn2 <= 20 ORDER BY doc_id""".stripMargin
  }) { (s, d) =>
    val scored = docs(s, d)
      .withColumn("quality", TextFns.qualityScore(col("text")))
    val filtered = scored.filter(col("quality") >= 0.7)
    val deduped = Dedup.dedupKeepFirst(filtered, "doc_id", "text")
    val sampled = Sampling.stratifiedSample(deduped, col("lang"), col("doc_id"), 0.5)
    Sampling.quotaPerGroup(sampled, col("source"), col("doc_id"), 20)
      .select("doc_id", "lang", "source")
      .orderBy("doc_id")
  }

  /** Distribution window functions: percent_rank and cume_dist over a
    * total per-partition order — both are rank arithmetic (rank-1)/(n-1)
    * and rank/n, so they bit-match across engines given the total order
    * (single IEEE division of identical integers). */
  val q46DistributionRanks = Q("q46_distribution_ranks",
    """SELECT doc_id, lang,
      |  percent_rank() OVER (PARTITION BY lang ORDER BY n_chars, doc_id) AS pr,
      |  cume_dist() OVER (PARTITION BY lang ORDER BY n_chars, doc_id) AS cd
      |FROM documents ORDER BY doc_id""".stripMargin) { (s, d) =>
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("lang").orderBy("n_chars", "doc_id")
    docs(s, d).select(col("doc_id"), col("lang"),
      percent_rank().over(w).as("pr"),
      cume_dist().over(w).as("cd"))
      .orderBy("doc_id")
  }

  /** MapType round-trip: per-user event-type counts built into a map
    * (map_from_entries over a sorted entry list), probed with element_at,
    * and exploded back to rows — exercises map construction, lookup and
    * iteration while the exploded output keeps the oracle a plain GROUP
    * BY (map iteration order never reaches the compare: rows re-sort). */
  val q47MapRoundtrip = Q("q47_map_roundtrip",
    """SELECT user_id, event_type, COUNT(*) AS cnt,
      |  COUNT(*) FILTER (event_type = 'click')
      |    OVER (PARTITION BY user_id) AS n_click_rows
      |FROM events GROUP BY user_id, event_type
      |ORDER BY user_id, event_type""".stripMargin) { (s, d) =>
    val grouped = ev(s, d).groupBy("user_id", "event_type")
      .agg(count(lit(1)).as("cnt"))
    val asMap = grouped.groupBy("user_id")
      .agg(map_from_entries(array_sort(
        collect_list(struct(col("event_type"), col("cnt"))))).as("m"))
    asMap.select(col("user_id"),
        explode(col("m")).as(Seq("event_type", "cnt")),
        when(map_contains_key(col("m"), lit("click")), lit(1L)).otherwise(lit(0L))
          .as("n_click_rows"))
      .orderBy("user_id", "event_type")
  }

  /** Nearest as-of join ([[Temporal.asofJoinNearest]]): each view matched
    * to the click CLOSEST in time either direction (ties backward —
    * pandas merge_asof 'nearest'). Oracle composes DuckDB's two
    * directional ASOFs with the same gap comparison; both engines
    * truncate each timestamp to epoch seconds before differencing. */
  val q48AsofNearest = Q("q48_asof_nearest",
    """WITH v AS (SELECT event_id, user_id, ts FROM events
      |  WHERE event_type = 'view' AND ts IS NOT NULL),
      |c AS (SELECT user_id, ts, MAX(event_id) AS click_id FROM events
      |  WHERE event_type = 'click' AND ts IS NOT NULL GROUP BY 1, 2),
      |b AS (SELECT v.event_id, v.user_id, v.ts, c.ts AS bts, c.click_id AS bid
      |  FROM v ASOF LEFT JOIN c ON v.user_id = c.user_id AND v.ts >= c.ts),
      |f AS (SELECT v.event_id, c.ts AS fts, c.click_id AS fid
      |  FROM v ASOF LEFT JOIN c ON v.user_id = c.user_id AND v.ts <= c.ts)
      |SELECT b.event_id, b.user_id,
      |  CASE WHEN fts IS NULL THEN bid
      |       WHEN bts IS NULL THEN fid
      |       WHEN date_diff('second', bts, b.ts) <= date_diff('second', b.ts, fts)
      |         THEN bid
      |       ELSE fid END AS click_id
      |FROM b JOIN f ON b.event_id = f.event_id
      |ORDER BY b.event_id""".stripMargin) { (s, d) =>
    val e = ev(s, d)
    val views = e.filter(col("event_type") === "view" && col("ts").isNotNull)
      .select("event_id", "user_id", "ts")
    val clicks = e.filter(col("event_type") === "click" && col("ts").isNotNull)
      .groupBy("user_id", "ts").agg(max(col("event_id")).as("click_id"))
      .withColumnRenamed("ts", "click_ts")
    Temporal.asofJoinNearest(views, clicks, on = "user_id",
      leftTs = "ts", rightTs = "click_ts",
      rightVals = Seq("click_id"))
      .select("event_id", "user_id", "click_id")
      .orderBy("event_id")
  }

  val round3: Seq[Q] = Seq(dedupClusters, q38BloomSemiJoin, sampleStratified,
    sampleQuota, textRedact, embCentroids, q39AsofForward, decontaminateQ,
    textVocabTopk, textTfidf, q40SlidingWindow, q41Ntile, dedupIncrementalQ,
    profileHistogram, q42ApproxPercentiles, dedupSimhashPairs,
    q43IntersectAll, q44ExceptAll, dedupMinhashIncremental, q45SaltedJoin,
    curatePipeline, q46DistributionRanks, dedupNearSurvivors, q47MapRoundtrip,
    q48AsofNearest)
}
