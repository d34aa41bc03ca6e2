package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}
import graft.Tables
import graft.functions.TimeFns
import graft.operators.{Dedup, Similarity}
import graft.streaming.StreamingOps

/** Round-8 additions, closing the round-7 verdict's composition gaps
  * and the gaps round 8's own probes surfaced: the clustering chain
  * (pairs → components → survivors → size audit) wired to the
  * scale-safe WIDE MinHash candidate config end-to-end, sessionize's
  * state-EVICTION path under the gate (event-time timeout — the branch
  * the sentinel drain deliberately bypasses), the RocksDB state store
  * exercised by the oracle, token-budget corpus mixing (batch AND
  * streaming faces — the mixture builder quota capping approximates),
  * and compound-key SimHash blocking (the knob for the
  * vote-concentration saturation the 1000× probe measured).
  */
object Registry7 {

  private def docs(s: SparkSession, d: String) = Tables.documents(s, d)

  /** Shared oracle CTE chain: WIDE (16-hash / 4×4-row-band) MinHash
    * candidate pairs closed under transitivity — the pair SQL of
    * `dedup_minhash_wide` + the recursive closure of `dedup_clusters`.
    * `lbl` is (id, cl): each paired doc's component minimum. */
  private val wideCcCte =
    """w AS (SELECT doc_id, string_split(text, ' ') AS wl FROM documents),
      |sh AS (SELECT doc_id, list_transform(range(1, len(wl) - 1),
      |  i -> wl[i] || ' ' || wl[i+1] || ' ' || wl[i+2]) AS shl FROM w),
      |sig AS (SELECT doc_id, list_transform(range(0, 16),
      |  j -> list_min(list_transform(shl,
      |    x -> substr(md5(CAST(j // 4 AS VARCHAR) || ':' || x),
      |                CAST((j % 4) * 8 + 1 AS INT), 8)))) AS mh
      |  FROM sh),
      |bands AS (SELECT doc_id, t.bnd,
      |    md5(mh[4*t.bnd+1] || mh[4*t.bnd+2] || mh[4*t.bnd+3] || mh[4*t.bnd+4]) AS bk
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

  /** Near-dup clusters over the WIDE LSH candidate config — the
    * round-7 verdict's #1: `dedup_clusters` consumes the DEFAULT 8-hash
    * / 4×2-row pairs, whose chance-collision term the 100× probe
    * measured going 233× super-linear on the homogeneous corpus, and
    * connected components inherits exactly that edge growth (406×).
    * This is the same pairs → min-label-propagation chain fed by
    * [[Dedup.minhashCandidates]] at 16 hashes / 4×4-row bands (band
    * collision ≈ J^rows — squaring the rows-per-band collapses the
    * chance term), so the composed product a curation run actually
    * executes is gated in its scale-safe wiring, not just the pair
    * stage. Trade, as documented on `dedup_minhash_wide`: recall below
    * J ≈ 0.7 — the near-dup band, not the exact-dup band. */
  val dedupClustersWide = Q("dedup_clusters_wide",
    s"""WITH RECURSIVE $wideCcCte
       |SELECT d.doc_id, COALESCE(l.cl, d.doc_id) AS cluster_id
       |FROM documents d LEFT JOIN lbl l ON d.doc_id = l.id
       |ORDER BY d.doc_id""".stripMargin) { (s, d) =>
    val corpus = docs(s, d)
    val pairs = Dedup.minhashCandidates(corpus, "doc_id", "text",
      numHashes = 16, bands = 4)
    val cc = Dedup.connectedComponents(pairs, "a_id", "b_id")
    corpus.select("doc_id")
      .join(cc, corpus("doc_id") === cc("id"), "left")
      .select(col("doc_id"),
        coalesce(col("cluster"), col("doc_id")).as("cluster_id"))
      .orderBy("doc_id")
  }

  /** The APPLIED end of the wide chain: one surviving document per
    * wide-config near-dup cluster ([[Dedup.nearDedupSurvivors]] at
    * 16/4×4) — with [[dedupClustersWide]] this gates the full
    * pairs → clusters → keep/drop decision in the configuration that
    * stays sub-linear at 100×. */
  val dedupNearSurvivorsWide = Q("dedup_near_survivors_wide",
    s"""WITH RECURSIVE $wideCcCte
       |SELECT d.doc_id, d.lang FROM documents d LEFT JOIN lbl l ON d.doc_id = l.id
       |WHERE COALESCE(l.cl, d.doc_id) = d.doc_id
       |ORDER BY d.doc_id""".stripMargin) { (s, d) =>
    Dedup.nearDedupSurvivors(docs(s, d), "doc_id", "text",
      numHashes = 16, bands = 4)
      .select("doc_id", "lang")
      .orderBy("doc_id")
  }

  /** The wide chain's audit face: cluster-size histogram over the wide
    * candidate components (`dedup_cluster_sizes` on the 16/4×4 config) —
    * with [[dedupClustersWide]] and [[dedupNearSurvivorsWide]] this
    * gates all three consumers of the pair stage in the configuration
    * that stays sub-linear at scale. */
  val dedupClusterSizesWide = Q("dedup_cluster_sizes_wide",
    s"""WITH RECURSIVE $wideCcCte,
       |lab AS (SELECT d.doc_id, COALESCE(l.cl, d.doc_id) AS cl
       |  FROM documents d LEFT JOIN lbl l ON d.doc_id = l.id),
       |cs AS (SELECT cl, CAST(COUNT(*) AS BIGINT) AS sz FROM lab GROUP BY cl)
       |SELECT sz AS cluster_size, CAST(COUNT(*) AS BIGINT) AS n_clusters,
       |  CAST(sz * COUNT(*) AS BIGINT) AS n_docs
       |FROM cs GROUP BY sz ORDER BY cluster_size""".stripMargin) { (s, d) =>
    val corpus = docs(s, d)
    val cc = Dedup.connectedComponents(
      Dedup.minhashCandidates(corpus, "doc_id", "text",
        numHashes = 16, bands = 4), "a_id", "b_id")
    corpus.select("doc_id")
      .join(cc, corpus("doc_id") === cc("id"), "left")
      .select(coalesce(col("cluster"), col("doc_id")).as("cl"))
      .groupBy("cl").agg(count(lit(1)).as("sz"))
      .groupBy("sz").agg(count(lit(1)).as("n_clusters"))
      .select(col("sz").as("cluster_size"), col("n_clusters"),
        (col("sz") * col("n_clusters")).as("n_docs"))
      .orderBy("cluster_size")
  }

  /** Sessionize's state-EVICTION path under the gate: the same 12-hour
    * gaps-and-islands semantics as `streaming_sessionize`, but every
    * session closes through the `hasTimedOut` branch of
    * [[StreamingOps.sessionize]] under `EventTimeTimeout` — the arm the
    * sentinel design deliberately bypasses, and the place streaming
    * correctness bugs live (round-7 verdict missing #2).
    *
    * Determinism: pages are time-quartiles consumed in order
    * ([[Registry6.stageOrderedPages]]), so the watermark (delay 1 s)
    * after batch b is max(ts of batches ≤ b) − 1 s — never ahead of any
    * undelivered event (quartile staging orders deliveries), so no real
    * event is late and no session evicts while a future event could
    * still extend it (its successor t₂ ≤ last + gap bounds every
    * earlier-batch timestamp, hence the watermark, below the timeout).
    * Two trailing pages carry one WATERMARK-DRIVER row each (user −1,
    * at corpus-max + 10 and + 20 gaps): the first advances the final
    * watermark past every real session's last + gap + 1 so every real
    * session times out DURING the drain; the second makes that advance
    * visible as a data batch (no reliance on no-data-batch scheduling).
    * The driver rows are fixture plumbing, filtered out of the result;
    * the oracle sees only real events.
    *
    * Oracle: identical to `streaming_sessionize` — eviction must change
    * WHEN a session is emitted, never WHAT. */
  val streamingSessionizeEvict = Q("streaming_sessionize_evict",
    """WITH e AS (SELECT user_id AS uid, epoch_ms(ts) AS tm FROM events),
      |x AS (SELECT uid, tm, CASE WHEN LAG(tm) OVER w IS NULL
      |    OR tm - LAG(tm) OVER w > 43200000 THEN 1 ELSE 0 END AS brk
      |  FROM e WINDOW w AS (PARTITION BY uid ORDER BY tm)),
      |y AS (SELECT uid, tm, SUM(brk) OVER (PARTITION BY uid ORDER BY tm
      |    ROWS UNBOUNDED PRECEDING) AS sid FROM x)
      |SELECT uid, MIN(tm) AS ts_start, MAX(tm) AS ts_end,
      |  CAST(COUNT(*) AS BIGINT) AS n
      |FROM y GROUP BY uid, sid ORDER BY uid, ts_start""".stripMargin) { (s, d) =>
    import s.implicits._
    val gapMs = 43200000L // 12 hours
    val e = Tables.events(s, d)
      .select(col("user_id").as("user"), unix_millis(col("ts")).as("tsMillis"))
    val fx = FixtureCache.cached(d, "ssevict", 1, Seq("events")) { tmp =>
      val maxTs = e.agg(max("tsMillis")).head().getLong(0)
      val real = e.withColumn("page",
        ntile(4).over(org.apache.spark.sql.expressions.Window
          .orderBy("tsMillis", "user")) - 1)
      val drivers = s.range(2).select(
        lit(-1L).as("user"),
        (lit(maxTs) + (col("id") + 1) * lit(10 * gapMs)).as("tsMillis"),
        (col("id") + 4).cast("int").as("page"))
      Registry6.stageOrderedPages(real.unionByName(drivers), "page", 6, tmp)
    }
    val stage = StreamHarness.runDir("graft_ssevict")
    val stream = s.readStream.schema("user LONG, tsMillis LONG")
      .option("maxFilesPerTrigger", "1").json(fx.resolve("pages").toString)
      .withColumn("ts", timestamp_millis(col("tsMillis")))
      .withWatermark("ts", "1 second")
      .as[StreamingOps.UserEvent]
    val sessions = StreamingOps.sessionize(stream, gapMs,
      GroupStateTimeout.EventTimeTimeout())
    StreamHarness.drain(sessions.toDF(), stage, OutputMode.Append)
      .filter(col("user") >= 0) // drop the watermark-driver plumbing
      .select(col("user").as("uid"), col("start").as("ts_start"),
        col("end").as("ts_end"), col("n"))
      .orderBy("uid", "ts_start")
  }

  /** The watermarked tumbling-window drain on the ROCKSDB state store
    * ([[StreamHarness.rocksDbProvider]] pinned via per-query conf) —
    * same operator, fixture, and oracle as `streaming_hits_window`, so
    * the green row isolates exactly one claim: swapping the state-store
    * provider changes WHERE state lives (off-heap/on-disk, incremental
    * checkpoints — the bounded-heap posture a 100 TB ingest needs),
    * never what the query computes. The whole gated streaming set runs
    * green under `-Dgraft.stateStore=rocksdb` (SCALE.md); this row
    * keeps one RocksDB execution inside the driver's own gate. */
  val streamingWindowRocksdb = Q("streaming_window_rocksdb",
    """SELECT strftime(date_trunc('hour', o_orderdate), '%Y-%m-%d %H:%M:%S') AS ws,
      |  o_orderpriority AS classe, COUNT(*) AS cnt
      |FROM orders WHERE o_orderdate IS NOT NULL
      |GROUP BY 1, 2 ORDER BY ws, classe""".stripMargin) { (s, d) =>
    val pages = Registry5.hitPagesFixture(s, d)
    val stage = StreamHarness.runDir("graft_rocks")
    val parsed = StreamingOps.streamHits(s, pages, "TJX",
      Map("maxFilesPerTrigger" -> "1"))
    val counts = StreamingOps.tumblingCounts(
      parsed.filter(col("data_ajuizamento").isNotNull),
      "data_ajuizamento", "classe")
    StreamHarness.drain(counts, stage, OutputMode.Complete,
      Map("spark.sql.streaming.stateStore.providerClass" ->
        StreamHarness.rocksDbProvider))
      .select(TimeFns.tsString(col("ws")).as("ws"), col("classe"), col("cnt"))
      .orderBy("ws", "classe")
  }

  /** Compound-key SimHash blocking ([[Dedup.simhashPairs]] with
    * `blockCol`): the wide 128-bit config ADDITIONALLY blocked on
    * language + length bucket (the same key `dedup_ngram_jaccard`
    * blocks on), so candidates must share block AND an intact slice.
    * This is the knob the round-8 1000× probe motivates: simhash bits
    * are majority votes and concentrate on homogeneous corpora, so at
    * 5·10⁶ docs even the 2³² slice alphabet's collision entropy
    * saturates — a block key multiplies the effective key space without
    * widening signatures (measured: 13.8× fewer candidate incidences at
    * 5 M docs — 0.61/doc — though the growth EXPONENT stays
    * concentration-bound within blocks; SCALE.md). Recall trade is
    * explicit and standard:
    * pigeonhole completeness holds WITHIN a block; cross-block pairs
    * (different language or far-apart lengths) are excluded by design.
    * Oracle: the wide-simhash SQL with the block equality added. */
  val dedupSimhashBlocked = Q("dedup_simhash_blocked",
    """WITH sigs AS (SELECT doc_id,
      |    lang || '|' || CAST(n_chars // 100 AS VARCHAR) AS blk,
      |    array_to_string(list_transform(range(1, 129),
      |    p -> CASE WHEN 2 * len(list_filter(string_split(text, ' '),
      |        x -> substr(md5(CASE WHEN p <= 32 THEN x
      |                         ELSE CAST((p - 1) // 32 AS VARCHAR) || ':' || x END),
      |                    ((p - 1) % 32) + 1, 1) >= '8'))
      |        > len(string_split(text, ' '))
      |      THEN '1' ELSE '0' END), '') AS sig
      |  FROM documents),
      |ch AS (SELECT doc_id, blk, sig, t.ci, substr(sig, t.ci * 32 + 1, 32) AS ck
      |  FROM sigs CROSS JOIN (SELECT unnest(range(0, 4)) AS ci) t),
      |cand AS (SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id,
      |    a.sig AS sa, b.sig AS sb
      |  FROM ch a JOIN ch b ON a.ci = b.ci AND a.ck = b.ck
      |    AND a.blk = b.blk AND a.doc_id < b.doc_id)
      |SELECT a_id, b_id, hamming FROM (
      |  SELECT a_id, b_id, CAST(len(list_filter(range(1, 129),
      |    i -> substr(sa, i, 1) != substr(sb, i, 1))) AS BIGINT) AS hamming
      |  FROM cand)
      |WHERE hamming <= 3 ORDER BY a_id, b_id""".stripMargin) { (s, d) =>
    Dedup.simhashPairs(docs(s, d), "doc_id", "text",
      bits = 128, chunks = 4, maxHamming = 3,
      blockCol = Some(concat(col("lang"), lit("|"),
        floor(col("n_chars") / 100).cast("long").cast("string"))))
      .orderBy("a_id", "b_id")
  }

  /** Token-budget corpus mixing ([[graft.operators.Sampling.tokenBudgetPerSource]]):
    * every source equalized to a 400-token budget, documents admitted in
    * the deterministic salted-hash draw order until the tokens BEFORE a
    * document reach the budget — `sample_quota` counts documents; a
    * pretraining mixture buys TOKENS, and a long-document source must
    * exhaust the same budget in fewer rows. The oracle replays the
    * global per-source exclusive running sum; the operator computes the
    * same prefix in the bucketed two-phase shape (per-(source, hash
    * prefix) sums + within-bucket window) that keeps a tens-of-sources
    * mixing key from serializing a 100 TB corpus onto tens of
    * partitions. */
  val sampleTokenBudget = Q("sample_token_budget",
    """WITH t AS (SELECT doc_id, source,
      |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
      |  FROM documents),
      |c AS (SELECT doc_id, source, n_tokens,
      |    COALESCE(SUM(n_tokens) OVER (PARTITION BY source
      |      ORDER BY md5('graft:' || CAST(doc_id AS VARCHAR)), doc_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS prior
      |  FROM t)
      |SELECT doc_id, source, n_tokens FROM c WHERE prior < 400
      |ORDER BY doc_id""".stripMargin) { (s, d) =>
    val t = docs(s, d).select(col("doc_id"), col("source"),
      graft.functions.TextFns.wsTokenCount(col("text")).cast("long").as("n_tokens"))
    val budgets = t.select(col("source")).distinct()
      .withColumn("token_budget", lit(400L))
    graft.operators.Sampling.tokenBudgetPerSource(t,
      col("source"), col("doc_id"), col("n_tokens"), budgets)
      .orderBy("doc_id")
  }

  /** Streaming token-budget admission under the gate
    * ([[StreamingOps.tokenBudgetPerKey]]): per-user budget of 100
    * tokens (cost = event_id % 7 + 1, riding the fixture) over four
    * time-ordered micro-batches — `streaming_quota` admits the first n
    * EVENTS; this admits until the TOKEN budget fills, and the budget
    * crosses mid-batch for most users, which only works if the
    * accumulated-cost counter genuinely persists across batches.
    *
    * Determinism: pages are global (ts, event_id) quartiles
    * ([[Registry6.stageOrderedPages]]), so each user's events arrive in
    * rank order across batches and the operator's within-batch
    * (tsMillis, eventId) sort pins the order inside them — admission
    * order equals rank order by construction, exactly the guarantee the
    * batch oracle's running sum replays.
    *
    * Oracle: the per-user exclusive running token sum in (ts, event_id)
    * order, admitted while under 100. */
  val streamingTokenBudget = Q("streaming_token_budget",
    """WITH e AS (SELECT user_id AS uid, epoch_ms(ts) AS tm, event_id AS eid,
      |    event_id % 7 + 1 AS toks
      |  FROM events WHERE ts IS NOT NULL),
      |c AS (SELECT uid, tm, eid, toks,
      |    COALESCE(SUM(toks) OVER (PARTITION BY uid ORDER BY tm, eid
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS prior
      |  FROM e)
      |SELECT uid, tm, eid, toks FROM c WHERE prior < 100
      |ORDER BY uid, tm, eid""".stripMargin) { (s, d) =>
    import s.implicits._
    val e = Tables.events(s, d).filter(col("ts").isNotNull)
      .select(col("user_id").as("user"), unix_millis(col("ts")).as("tsMillis"),
        col("event_id").as("eventId"),
        (col("event_id") % 7 + 1).cast("long").as("toks"))
    val fx = FixtureCache.cached(d, "stokbud", 1, Seq("events")) { tmp =>
      val paged = e.withColumn("page",
        ntile(4).over(org.apache.spark.sql.expressions.Window
          .orderBy("tsMillis", "eventId")) - 1)
      Registry6.stageOrderedPages(paged, "page", 4, tmp)
    }
    val stage = StreamHarness.runDir("graft_stokbud")
    val stream = s.readStream
      .schema("user LONG, tsMillis LONG, eventId LONG, toks LONG")
      .option("maxFilesPerTrigger", "1").json(fx.resolve("pages").toString)
      .as[StreamingOps.TokenEvent]
    val admitted = StreamingOps.tokenBudgetPerKey(stream, budget = 100L)
    StreamHarness.drain(admitted.toDF(), stage, OutputMode.Append)
      .select(col("user").as("uid"), col("tsMillis").as("tm"),
        col("eventId").as("eid"), col("toks"))
      .orderBy("uid", "tm", "eid")
  }

  /** INCREMENTAL curation end-to-end — the nightly-append composition
    * next to `curate_pipeline`'s full-corpus build: the arriving batch
    * (doc_id ≥ 250) is quality-filtered, deduped within itself AND
    * against the stored corpus's digest LEDGER
    * ([[Dedup.dedupIncremental]] — 32-byte digests, the corpus text
    * never moves), NEAR-dup'd against the corpus's cluster ledger
    * ([[Dedup.connectedComponentsIncremental]] over batch-incident
    * MinHash candidates — a batch doc survives iff it is its merged
    * component's representative, i.e. no corpus member and no smaller
    * surviving batch member; round 9, closing the gap where the append
    * silently lacked the near-dup stage its full-corpus sibling has),
    * then admitted source-by-source until a 300-token budget fills
    * ([[graft.operators.Sampling.tokenBudgetPerSource]]). Every stage
    * is an oracle-gated operator; the composition is what a production
    * corpus APPEND actually runs — and at 100 TB the batch is the only
    * side that shuffles (quality/tokens are per-row, the exact ledger
    * ships digests, the cluster ledger is scanned map-side with
    * batch-sized broadcasts, the budget gate broadcasts). */
  val curateIncremental = Q("curate_incremental", {
    val en = graft.functions.TextFns.EnStop.map(w => s"'$w'").mkString("[", ", ", "]")
    s"""WITH RECURSIVE t AS (SELECT doc_id, text, lang, source,
       |  CAST(length(regexp_replace(text, '[a-z0-9 ]', '', 'g')) AS DOUBLE)
       |    / CAST(length(text) AS DOUBLE) AS punct_ratio,
       |  CAST(list_sum(list_transform(string_split(text, ' '), x -> length(x))) AS DOUBLE)
       |    / CAST(len(string_split(text, ' ')) AS DOUBLE) AS avg_word_len,
       |  CAST(len(list_filter(string_split(text, ' '), x -> list_contains($en, x))) AS DOUBLE)
       |    / CAST(len(string_split(text, ' ')) AS DOUBLE) AS stopword_ratio
       |  FROM documents WHERE doc_id >= 250),
       |q AS (SELECT doc_id, text, lang, source,
       |  ((CASE WHEN length(text) >= 100 THEN 1.0
       |      ELSE CAST(length(text) AS DOUBLE) / 100.0 END
       |    + (1.0 - LEAST(punct_ratio * 5.0, 1.0))
       |    + (CASE WHEN avg_word_len >= 3.0 AND avg_word_len <= 10.0
       |        THEN 1.0 ELSE 0.5 END)
       |    + LEAST(stopword_ratio * 4.0, 1.0)) / 4.0) AS quality
       |  FROM t),
       |f AS (SELECT doc_id, text, source FROM q WHERE quality >= 0.7),
       |dd AS (SELECT doc_id, text, source FROM (
       |  SELECT doc_id, text, source,
       |    ROW_NUMBER() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
       |  FROM f) WHERE rn = 1),
       |fresh AS (SELECT doc_id, text, source FROM dd
       |  WHERE md5(text) NOT IN
       |    (SELECT DISTINCT md5(text) FROM documents WHERE doc_id < 250)),
       |nd AS (SELECT doc_id, text FROM documents WHERE doc_id < 250
       |  UNION ALL SELECT doc_id, text FROM fresh),
       |ndw AS (SELECT doc_id, string_split(text, ' ') AS wl FROM nd),
       |ndsh AS (SELECT doc_id, list_transform(range(1, len(wl) - 1),
       |  i -> wl[i] || ' ' || wl[i+1] || ' ' || wl[i+2]) AS shl FROM ndw),
       |ndsig AS (SELECT doc_id, list_transform(range(0, 8),
       |  j -> list_min(list_transform(shl,
       |    x -> substr(md5(CAST(j // 4 AS VARCHAR) || ':' || x),
       |                CAST((j % 4) * 8 + 1 AS INT), 8)))) AS mh
       |  FROM ndsh),
       |ndb AS (SELECT doc_id, u.bnd, md5(mh[2*u.bnd+1] || mh[2*u.bnd+2]) AS bk
       |  FROM ndsig CROSS JOIN (SELECT unnest(range(0, 4)) AS bnd) u),
       |ndp AS (SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id
       |  FROM ndb a JOIN ndb b ON a.bnd = b.bnd AND a.bk = b.bk
       |    AND a.doc_id < b.doc_id),
       |nde AS (SELECT a_id AS s, b_id AS t FROM ndp
       |  UNION SELECT b_id, a_id FROM ndp),
       |reach(id, r) AS (
       |  SELECT s, s FROM nde
       |  UNION
       |  SELECT e.s, reach.r FROM nde e JOIN reach ON reach.id = e.t),
       |lbl AS (SELECT id, MIN(r) AS cl FROM reach GROUP BY id),
       |surv AS (SELECT f.doc_id, f.text, f.source FROM fresh f
       |  LEFT JOIN lbl l ON f.doc_id = l.id
       |  WHERE COALESCE(l.cl, f.doc_id) = f.doc_id),
       |tok AS (SELECT doc_id, source,
       |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
       |  FROM surv),
       |c AS (SELECT doc_id, source, n_tokens,
       |    COALESCE(SUM(n_tokens) OVER (PARTITION BY source
       |      ORDER BY md5('graft:' || CAST(doc_id AS VARCHAR)), doc_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS prior
       |  FROM tok)
       |SELECT doc_id, source, n_tokens FROM c WHERE prior < 300
       |ORDER BY doc_id""".stripMargin
  }) { (s, d) =>
    val all = docs(s, d)
    val batch = all.filter(col("doc_id") >= 250)
      .withColumn("quality", graft.functions.TextFns.qualityScore(col("text")))
      .filter(col("quality") >= 0.7)
      .drop("quality")
    val corpus = all.filter(col("doc_id") < 250)
    val ledger = corpus.select(md5(col("text")).as("digest"))
    // materialized: the exact-dedup survivors feed the near-dup stage's
    // three consumers (within-batch pairs, cross pairs, survivor join)
    val fresh = graft.operators.Lineage.truncate(
      Dedup.dedupIncremental(batch, "doc_id", "text", ledger, "digest"))
    // NEAR-dup stage (round 9): merge the batch's candidate edges into
    // the corpus's cluster ledger; a batch doc survives iff it is its
    // merged component's representative (cluster == own id ⇒ no corpus
    // member and no smaller surviving batch member). Ledger + band
    // index are the production append's STORED assets — read from the
    // staged fixture (Registry8.corpusNearDupAssets), so this row
    // measures the append, not a per-run corpus re-derivation.
    val (clusterLedger, storedBands) = Registry8.corpusNearDupAssets(s, d)
    val newEdges = Dedup.minhashCandidates(fresh, "doc_id", "text")
      .union(Dedup.bandedKeys(fresh, "doc_id", "text").alias("a")
        .join(storedBands.alias("b"),
          col("a.band") === col("b.band") && col("a.bk") === col("b.bk"))
        .select(col("a.id").as("a_id"), col("b.id").as("b_id"))
        .distinct())
    val updated = Dedup.connectedComponentsIncremental(clusterLedger,
      fresh.select(col("doc_id")), "doc_id", newEdges, "a_id", "b_id")
    val surv = fresh.join(
      updated.filter(col("id") === col("cluster"))
        .select(col("id").as("doc_id")),
      Seq("doc_id"), "left_semi")
    val t = surv.select(col("doc_id"), col("source"),
      graft.functions.TextFns.wsTokenCount(col("text")).cast("long").as("n_tokens"))
    val budgets = t.select(col("source")).distinct()
      .withColumn("token_budget", lit(300L))
    graft.operators.Sampling.tokenBudgetPerSource(t,
      col("source"), col("doc_id"), col("n_tokens"), budgets)
      .orderBy("doc_id")
  }

  /** Frozen-model fluency scoring — `text_fluency`'s train/apply loop
    * SPLIT at the production boundary: the char-bigram model is trained
    * on the STORED corpus (doc_id < 250) and applied unchanged to the
    * arriving batch (doc_id ≥ 250) — a nightly append scores new data
    * against a frozen filter, it does not retrain per batch. The split
    * makes the add-one smoothing path REAL: batch bigrams unseen in
    * training get (0+1)·scale(c₁) and unseen contexts (1)·(10¹² div
    * (0+V)) via LEFT joins + coalesce — the single-dataflow form's
    * inner joins never exercise unseen events because the model was
    * trained on the very documents being scored. Same fixed-point
    * order-free arithmetic, same broadcast-model scale shape (the
    * model is alphabet² rows regardless of corpus size).
    *
    * The harness corpus shares one alphabet across the split (0 unseen
    * bigrams at sf0.01), so the smoothing branch is proven by
    * [[FluencySpec]] on synthetic data where unseen events exist; the
    * oracle row proves the frozen-model join itself. */
  private[queries] def fluencyModel(train: DataFrame): (DataFrame, DataFrame, DataFrame) = {
    val bigrams = (t: Column) => org.apache.spark.sql.GraftExpr.col(
      graft.expressions.CharNgrams(org.apache.spark.sql.GraftExpr.expr(t), 2))
    val tb = train.filter(char_length(col("text")) >= 2)
      .select(explode(bigrams(col("text"))).as("b"))
    val cb = tb.groupBy("b").agg(count(lit(1)).as("nb"))
    val cc = cb.groupBy(substring(col("b"), 1, 1).as("c")).agg(sum("nb").as("nc"))
    val v = train
      .select(explode(split(col("text"), "")).as("ch"))
      .filter(char_length(col("ch")) > 0)
      .agg(count_distinct(col("ch")).as("nv"))
    (cb, cc, v)
  }

  /** Score `batch` against a frozen model — LEFT joins + coalesce give
    * unseen bigrams (0+1)·scale(c₁) and unseen contexts the
    * (1)·(10¹² div (0+V)) floor (add-one smoothing over the TRAINED
    * alphabet). */
  private[queries] def fluencyScore(batch: DataFrame,
                                    model: (DataFrame, DataFrame, DataFrame)): DataFrame = {
    val (cb, cc, v) = model
    val bigrams = (t: Column) => org.apache.spark.sql.GraftExpr.col(
      graft.expressions.CharNgrams(org.apache.spark.sql.GraftExpr.expr(t), 2))
    batch.filter(char_length(col("text")) >= 2)
      .select(col("doc_id"), (char_length(col("text")) - 1).as("n"),
        explode(bigrams(col("text"))).as("b"))
      .join(broadcast(cb), Seq("b"), "left")
      .join(broadcast(cc), substring(col("b"), 1, 1) === col("c"), "left")
      .crossJoin(broadcast(v))
      .select(col("doc_id"), col("n"),
        ((coalesce(col("nb"), lit(0L)) + 1) *
          expr("CAST(1000000000000 AS BIGINT) div (coalesce(nc, CAST(0 AS BIGINT)) + nv)"))
          .as("ps"))
      .groupBy("doc_id", "n")
      .agg(sum("ps").as("sp"))
      .select(col("doc_id"),
        (col("sp").cast("double") / col("n") / lit(1e12)).as("fluency"))
  }

  val textFluencyApply = Q("text_fluency_apply",
    """WITH bg AS (SELECT substr(text, CAST(pos AS INT), 2) AS b
      |  FROM (SELECT text, unnest(range(1, length(text))) AS pos
      |        FROM documents WHERE doc_id < 250)),
      |cb AS (SELECT b, COUNT(*) AS nb FROM bg GROUP BY b),
      |cc AS (SELECT substr(b, 1, 1) AS c, COUNT(*) AS nc FROM bg GROUP BY 1),
      |v AS (SELECT COUNT(DISTINCT substr(text, CAST(i AS INT), 1)) AS nv
      |  FROM (SELECT text, unnest(range(1, length(text) + 1)) AS i
      |        FROM documents WHERE doc_id < 250)),
      |sb AS (SELECT doc_id, n, substr(text, CAST(pos AS INT), 2) AS b
      |  FROM (SELECT doc_id, text, length(text) - 1 AS n,
      |    unnest(range(1, length(text))) AS pos
      |    FROM documents WHERE doc_id >= 250)),
      |p AS (SELECT doc_id, n,
      |    (COALESCE(nb, 0) + 1)
      |      * (1000000000000 // (COALESCE(nc, 0) + nv)) AS ps
      |  FROM sb LEFT JOIN cb USING (b)
      |    LEFT JOIN cc ON substr(sb.b, 1, 1) = cc.c CROSS JOIN v)
      |SELECT doc_id, CAST(SUM(ps) AS DOUBLE) / n / 1e12 AS fluency
      |FROM p GROUP BY doc_id, n ORDER BY doc_id""".stripMargin) { (s, d) =>
    val model = fluencyModel(docs(s, d).filter(col("doc_id") < 250))
    fluencyScore(docs(s, d).filter(col("doc_id") >= 250), model)
      .orderBy("doc_id")
  }

  /** Two-level IVF assignment ([[Similarity.ivfAssignTwoLevel]]): the
    * fix for the assignment cost hidden inside SCALE.md's own sizing
    * rule — "centroids ∝ corpus" keeps cells flat but makes FLAT
    * assignment n × C dot products, quadratic in the corpus; routing
    * through √C coarse cells makes it n × 2√C with identical cell
    * geometry. Codebooks here: 4 coarse seeds routing 16 fine seeds
    * (the same seed rule every ann_* row uses). The oracle replays
    * both argmax levels with the same cosine fold and the same
    * score-then-higher-cell tie rule. */
  val annIvfTwoLevel = Q("ann_ivf_two_level",
    s"""WITH coarse AS (SELECT CAST(vec_id AS INT) AS ccell, embedding AS c_vec
       |  FROM embeddings WHERE vec_id < 4),
       |fine AS (SELECT CAST(vec_id AS INT) AS cell, embedding AS f_vec
       |  FROM embeddings WHERE vec_id < 16),
       |routed AS (SELECT cell, ccell, f_vec FROM (
       |  SELECT f.cell, c.ccell, f.f_vec,
       |    ROW_NUMBER() OVER (PARTITION BY f.cell
       |      ORDER BY ${RegistryExt.sqlCos("f.f_vec", "c.c_vec")} DESC,
       |        c.ccell DESC) AS rn
       |  FROM fine f CROSS JOIN coarse c) WHERE rn = 1),
       |c1 AS (SELECT vec_id, ccell, embedding FROM (
       |  SELECT q.vec_id, c.ccell, q.embedding,
       |    ROW_NUMBER() OVER (PARTITION BY q.vec_id
       |      ORDER BY ${RegistryExt.sqlCos("q.embedding", "c.c_vec")} DESC,
       |        c.ccell DESC) AS rn
       |  FROM embeddings q CROSS JOIN coarse c) WHERE rn = 1)
       |SELECT vec_id, ccell, cell, score FROM (
       |  SELECT a.vec_id, a.ccell, f.cell,
       |    ${RegistryExt.sqlCos("a.embedding", "f.f_vec")} AS score,
       |    ROW_NUMBER() OVER (PARTITION BY a.vec_id
       |      ORDER BY ${RegistryExt.sqlCos("a.embedding", "f.f_vec")} DESC,
       |        f.cell DESC) AS rn
       |  FROM c1 a JOIN routed f ON a.ccell = f.ccell) WHERE rn = 1
       |ORDER BY vec_id""".stripMargin) { (s, d) =>
    val e = Tables.embeddings(s, d)
    val coarse = e.filter(col("vec_id") < 4)
      .select(col("vec_id").cast("int").as("ccell"), col("embedding").as("c_vec"))
    val fine = e.filter(col("vec_id") < 16)
      .select(col("vec_id").cast("int").as("cell"), col("embedding").as("f_vec"))
    Similarity.ivfAssignTwoLevel(e, coarse, fine, "vec_id", "embedding")
      .orderBy("vec_id")
  }

  val round8: Seq[Q] = Seq(dedupClustersWide, dedupNearSurvivorsWide,
    dedupClusterSizesWide, streamingSessionizeEvict, streamingWindowRocksdb,
    sampleTokenBudget, dedupSimhashBlocked, streamingTokenBudget,
    curateIncremental, textFluencyApply, annIvfTwoLevel)
}
