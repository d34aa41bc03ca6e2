package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.operators.Dedup

/** Round-9 second-wave additions: sub-document span dedup, the
  * fixed-token shard manifest, large-holdout banded decontamination,
  * and streaming ingest dedup. */
object Registry9 {

  private def docs(s: SparkSession, d: String) = Tables.documents(s, d)

  /** Sub-document EXACT span dedup ([[Dedup.dedupSpans]]): every
    * 3-word aligned span that already occurred earlier in the corpus
    * (global (doc_id, span_idx) order) is removed from the document;
    * first occurrences stay. Document-level dedup misses recurring
    * boilerplate inside otherwise-distinct documents — this is the
    * aligned-window, shuffle-join-cost form of suffix-array substring
    * dedup (span width 3 here so the small-vocabulary corpus exercises
    * real cross-document collisions; production uses ~50-token spans).
    *
    * Oracle: the same election replayed relationally — span table via
    * lateral unnest, first-occurrence winners via a window, surviving
    * text re-joined in span order. */
  val dedupSpans = Q("dedup_spans",
    """WITH w AS (SELECT doc_id, string_split(text, ' ') AS wl FROM documents),
      |sp AS (SELECT doc_id, t.i AS idx,
      |    array_to_string(list_slice(wl, t.i*3+1, t.i*3+3), ' ') AS span
      |  FROM w, unnest(range(0, (len(wl)+2)//3)) AS t(i)),
      |win AS (SELECT doc_id, idx FROM (
      |  SELECT doc_id, idx, ROW_NUMBER() OVER (PARTITION BY md5(span)
      |      ORDER BY doc_id, idx) AS rn FROM sp) WHERE rn = 1),
      |re AS (SELECT s.doc_id,
      |    array_to_string(list(s.span ORDER BY s.idx), ' ') AS text_dedup,
      |    COUNT(*) AS spans_kept
      |  FROM sp s JOIN win USING (doc_id, idx) GROUP BY s.doc_id),
      |tot AS (SELECT doc_id, (len(wl)+2)//3 AS spans_total FROM w)
      |SELECT d.doc_id, COALESCE(r.text_dedup, '') AS text_dedup,
      |  t.spans_total, COALESCE(r.spans_kept, 0) AS spans_kept
      |FROM documents d JOIN tot t USING (doc_id)
      |LEFT JOIN re r USING (doc_id)
      |ORDER BY doc_id""".stripMargin) { (s, d) =>
    Dedup.dedupSpans(docs(s, d), "doc_id", "text", spanWords = 3)
      .select(col("doc_id"), col("text_dedup"),
        col("spans_total").cast("long").as("spans_total"),
        col("spans_kept").cast("long").as("spans_kept"))
      .orderBy("doc_id")
  }

  /** Fixed-token training-shard manifest ([[graft.operators.Pack
    * .shardManifest]]): every document lands in the per-source 400-token
    * shard where its token offset starts, offsets laid out in the
    * deterministic salted-hash draw order (the hash is the shuffle — a
    * shard never holds one domain's contiguous slice). Whole documents
    * never split; [[graft.operators.Pack.packSequences]] (`pack_seqs`)
    * is the downstream stage that cuts exact sequences. The oracle
    * replays the serial per-source exclusive prefix sum; the operator
    * computes the same prefix in the bucketed two-phase shape that
    * keeps a tens-of-sources key from serializing a 100 TB corpus
    * (`sample_token_budget`'s pattern, minus its budget prune — every
    * document gets a shard). */
  val shardManifest = Q("shard_manifest",
    """WITH t AS (SELECT doc_id, source,
      |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
      |  FROM documents),
      |c AS (SELECT doc_id, source,
      |    COALESCE(SUM(n_tokens) OVER (PARTITION BY source
      |      ORDER BY md5('graft:' || CAST(doc_id AS VARCHAR)), doc_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS prior
      |  FROM t)
      |SELECT doc_id, source, CAST(prior AS BIGINT) AS shard_tok0,
      |  CAST(prior // 400 AS BIGINT) AS shard_id
      |FROM c ORDER BY doc_id""".stripMargin) { (s, d) =>
    graft.operators.Pack.shardManifest(
      docs(s, d).select(col("doc_id"), col("source"),
        graft.functions.TextFns.wsTokenCount(col("text")).as("n_tokens")),
      col("source"), col("doc_id"), col("n_tokens"), shardTokens = 400L)
      .select(col("doc_id"), col("source"), col("shard_tok0"), col("shard_id"))
      .orderBy("doc_id")
  }

  /** Exact decontamination at any holdout size
    * ([[Dedup.decontaminateJoin]]): same pooled ≥5-distinct-shared-
    * 3-shingles semantics as `decontaminate` — and the same oracle —
    * with the holdout side SHUFFLE-joined instead of broadcast, the
    * shape for a holdout that is itself corpus-sized (another training
    * corpus, a year of eval suites). The two gates proving identical
    * output IS the point: the scale path must be semantically free. */
  val decontaminateJoinQ = Q("decontaminate_join",
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
    Dedup.decontaminateJoin(
      all.filter(col("source") =!= "src0"), "doc_id", "text",
      all.filter(col("source") === "src0"), "text", minShared = 5)
      .select("doc_id", "source")
      .orderBy("doc_id")
  }

  /** Near-dup-level decontamination ([[Dedup.decontaminateBanded]]):
    * corpus-vs-holdout MinHash band join for candidates, pooled exact
    * shingle confirm on candidate documents only — corpus shingles
    * never ride an exchange, so this is the cheapest probe when the
    * threat model is verbatim/near-dup leakage. Recall is the LSH
    * family's: on this synthetic corpus (overlap scattered thinly
    * across many holdout docs — the adversarial case) it confirms 2 of
    * the 91 exhaustive drops, which is exactly why `decontaminate_join`
    * exists; both contracts are gated. */
  val decontaminateBandedQ = Q("decontaminate_banded",
    """WITH w AS (SELECT doc_id, source, string_split(text, ' ') AS wl FROM documents),
      |sh AS (SELECT doc_id, source, list_transform(range(1, len(wl) - 1),
      |  i -> wl[i] || ' ' || wl[i+1] || ' ' || wl[i+2]) AS shl FROM w),
      |sig AS (SELECT doc_id, source, list_transform(range(0, 8),
      |  j -> list_min(list_transform(shl,
      |    x -> substr(md5(CAST(j // 4 AS VARCHAR) || ':' || x),
      |                CAST((j % 4) * 8 + 1 AS INT), 8)))) AS mh
      |  FROM sh),
      |bands AS (SELECT doc_id, source, t.bnd, md5(mh[2*t.bnd+1] || mh[2*t.bnd+2]) AS bk
      |  FROM sig CROSS JOIN (SELECT unnest(range(0, 4)) AS bnd) t),
      |cand AS (SELECT DISTINCT c.doc_id AS cid, h.doc_id AS hid
      |  FROM bands c JOIN bands h ON c.bnd = h.bnd AND c.bk = h.bk
      |  WHERE c.source <> 'src0' AND h.source = 'src0'),
      |dsh AS (SELECT doc_id, source, list_distinct(shl) AS dshl FROM sh),
      |csh AS (SELECT doc_id, unnest(dshl) AS s FROM dsh WHERE source <> 'src0'),
      |hsh AS (SELECT doc_id, unnest(dshl) AS s FROM dsh WHERE source = 'src0'),
      |pooled AS (SELECT DISTINCT cand.cid, hsh.s
      |  FROM cand JOIN hsh ON hsh.doc_id = cand.hid),
      |conf AS (SELECT p.cid FROM pooled p
      |  JOIN csh ON csh.doc_id = p.cid AND csh.s = p.s
      |  GROUP BY p.cid HAVING COUNT(*) >= 5)
      |SELECT doc_id, source FROM documents
      |WHERE source <> 'src0' AND doc_id NOT IN (SELECT cid FROM conf)
      |ORDER BY doc_id""".stripMargin) { (s, d) =>
    val all = docs(s, d)
    Dedup.decontaminateBanded(
      all.filter(col("source") =!= "src0"), "doc_id", "text",
      all.filter(col("source") === "src0"), "doc_id", "text", minShared = 5)
      .select("doc_id", "source")
      .orderBy("doc_id")
  }

  /** Cluster-ledger DELETION maintenance
    * ([[Dedup.connectedComponentsRemove]]): the takedown path — remove
    * a batch of documents (doc_id ≡ 0 mod 7) from the stored corpus
    * (doc_id < 250) and repair near-dup cluster labels by
    * re-propagating only within TOUCHED components, whose edges are
    * re-derived from the stored LSH band index
    * ([[Registry8.corpusNearDupAssets]] — the same staged ledger +
    * band index the append face reads). Removal can SPLIT a component
    * (the removed doc may be its only bridge), which no label mapping
    * expresses — hence the subgraph rebuild, still
    * O(touched), never O(corpus). At this sf the removal dissolves the
    * {8, 245} near-dup pair: 245 leaves, 8 relabels to a singleton.
    *
    * Oracle: from-scratch recursive-CTE closure over the REMAINING
    * documents — deletion maintenance must be indistinguishable from
    * never having ingested the removed docs (the full output ledger is
    * gated, so untouched-row pass-through is proven too). */
  val dedupClustersRemove = Q("dedup_clusters_remove",
    """WITH RECURSIVE w AS (SELECT doc_id, string_split(text, ' ') AS wl
      |  FROM documents WHERE doc_id < 250 AND doc_id % 7 <> 0),
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
      |SELECT w.doc_id, COALESCE(l.cl, w.doc_id) AS cluster_id
      |FROM w LEFT JOIN lbl l ON w.doc_id = l.id
      |ORDER BY doc_id""".stripMargin) { (s, d) =>
    val (ledger, storedBands) = Registry8.corpusNearDupAssets(s, d)
    val rm = Tables.documents(s, d)
      .filter(col("doc_id") < 250 && col("doc_id") % 7 === 0)
      .select(col("doc_id"))
    Dedup.connectedComponentsRemove(ledger, rm, "doc_id", storedBands)
      .select(col("id").as("doc_id"), col("cluster").as("cluster_id"))
      .orderBy("doc_id")
  }

  /** Z-ORDER layout under the gate ([[graft.operators.Layout
    * .layoutOptimizeZ]]): lineitem rewritten clustered on
    * (l_orderkey, l_partkey) via bit-interleaved scaled keys — the
    * fourth layout axis after bucketing (q50), hive partitioning
    * (q51), and single-key ranges (q52): range predicates over
    * SEVERAL high-cardinality columns, where a single-key range
    * layout leaves every other column's per-file span at the full
    * domain. Three hard witnesses before the result is trusted: the
    * per-file stats must let a strip predicate on EACH dimension skip
    * at least half the files ([[graft.operators.Layout
    * .requirePrunable]] × 2 — the single-key layout fails this on the
    * second key by construction, spec'd in LayoutSpec), and the
    * l_partkey predicate must reach the scan as a PushedFilter
    * (row-group skipping hook, q52's pattern). The query itself
    * filters on l_partkey — the dimension q52's layout cannot serve.
    *
    * Oracle: layout must be semantically invisible — same filter +
    * aggregate over the raw table. */
  val q53ZorderLayout = Q("q53_zorder_layout",
    """SELECT l_returnflag, COUNT(*) AS cnt,
      |  CAST(ROUND(SUM(CAST(l_quantity AS DECIMAL(30,10))), 4) AS DOUBLE) AS sum_qty
      |FROM lineitem WHERE l_partkey BETWEEN 100 AND 150
      |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin) { (s, d) =>
    val outDir = FixtureCache.cached(d, "zorder", 2, Seq("lineitem")) { tmp =>
      graft.operators.Layout.layoutOptimizeZ(
        Tables.lineitem(s, d),
        Seq(col("l_orderkey"), col("l_partkey")),
        tmp.resolve("lineitem_z.parquet").toString, numFiles = 16)
    }.resolve("lineitem_z.parquet").toString
    graft.operators.Layout.requirePrunable(s, outDir, "l_orderkey", 1000, 1200)
    graft.operators.Layout.requirePrunable(s, outDir, "l_partkey", 100, 130)
    val out = s.read.parquet(outDir)
      .filter(col("l_partkey").between(100, 150))
      .groupBy("l_returnflag")
      .agg(count(lit(1)).as("cnt"),
        graft.functions.AggFns.dsum(col("l_quantity")).as("sum_qty"))
      .orderBy("l_returnflag")
    val plan = out.queryExecution.executedPlan.toString
    if (!"PushedFilters: \\[[^\\]]*l_partkey".r.findFirstIn(plan).isDefined)
      throw new IllegalStateException(
        s"range predicate did not reach the scan as a PushedFilter:\n$plan")
    out
  }

  /** The corpus (doc_id < 250) span-digest LEDGER — the stored asset a
    * production append's span dedup reads (distinct 16-byte digests,
    * never text), staged once per (sf, content) like
    * [[Registry8.corpusNearDupAssets]]. */
  private def corpusSpanLedger(s: SparkSession, d: String): DataFrame = {
    val dir = FixtureCache.cached(d, "spledger", 1, Seq("documents")) { tmp =>
      // the ledger is every distinct span digest of the stored corpus
      // (a maintainer appends survivor digests, which IS the distinct
      // span set)
      val k = 3
      val words = split(col("text"), " ")
      Tables.documents(s, d).filter(col("doc_id") < 250)
        .select(words.as("_w"),
          explode(sequence(lit(0),
            ((size(words) - 1) / k).cast("int"))).as("_i"))
        .select(md5(array_join(
          slice(col("_w"), col("_i") * k + 1, lit(k)), " ")).as("h"))
        .distinct()
        .coalesce(1)
        .write.mode("overwrite").parquet(tmp.resolve("spans.parquet").toString)
    }
    s.read.parquet(dir.resolve("spans.parquet").toString)
  }

  /** Incremental span dedup ([[Dedup.dedupSpansIncremental]]): the
    * arriving batch (doc_id ≥ 250) elects first occurrences within
    * itself and drops every span already in the stored corpus span
    * ledger — [[Registry3]]'s `dedup_incremental` posture at
    * sub-document granularity, completing the span-dedup maintenance
    * story (full-corpus `dedup_spans` is the nightly rebuild this
    * replaces). The ledger ships 16-byte digests; batch text crosses
    * one exchange. */
  val dedupSpansIncrementalQ = Q("dedup_spans_incremental",
    """WITH w AS (SELECT doc_id, string_split(text, ' ') AS wl FROM documents),
      |sp AS (SELECT doc_id, t.i AS idx,
      |    array_to_string(list_slice(wl, t.i*3+1, t.i*3+3), ' ') AS span
      |  FROM w, unnest(range(0, (len(wl)+2)//3)) AS t(i)),
      |led AS (SELECT DISTINCT md5(span) AS h FROM sp WHERE doc_id < 250),
      |bsp AS (SELECT doc_id, idx, span FROM sp WHERE doc_id >= 250),
      |win AS (SELECT doc_id, idx FROM (
      |  SELECT doc_id, idx, md5(span) AS h,
      |    ROW_NUMBER() OVER (PARTITION BY md5(span) ORDER BY doc_id, idx) AS rn
      |  FROM bsp) WHERE rn = 1 AND h NOT IN (SELECT h FROM led)),
      |re AS (SELECT b.doc_id,
      |    array_to_string(list(b.span ORDER BY b.idx), ' ') AS text_dedup,
      |    COUNT(*) AS spans_kept
      |  FROM bsp b JOIN win USING (doc_id, idx) GROUP BY b.doc_id),
      |tot AS (SELECT doc_id, (len(wl)+2)//3 AS spans_total FROM w
      |  WHERE doc_id >= 250)
      |SELECT t.doc_id AS doc_id, COALESCE(r.text_dedup, '') AS text_dedup,
      |  t.spans_total, COALESCE(r.spans_kept, 0) AS spans_kept
      |FROM tot t LEFT JOIN re r ON t.doc_id = r.doc_id
      |ORDER BY t.doc_id""".stripMargin) { (s, d) =>
    val batch = docs(s, d).filter(col("doc_id") >= 250)
    Dedup.dedupSpansIncremental(batch, "doc_id", "text",
      corpusSpanLedger(s, d), "h", spanWords = 3)
      .select(col("doc_id"), col("text_dedup"),
        col("spans_total").cast("long").as("spans_total"),
        col("spans_kept").cast("long").as("spans_kept"))
      .orderBy("doc_id")
  }

  /** End-to-end curation WITH the output stage: `curate_pipeline`'s
    * stages (quality filter → exact dedup → stratified sample → source
    * quota) feeding [[graft.operators.Pack.shardManifest]] — the
    * manifest a training job actually consumes, so the composed product
    * runs curation and shard assignment in ONE plan. Shard budget 200
    * tokens per source (~3 shards per source after the 20-doc quota). */
  val curateShards = Q("curate_shards", {
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
       |f AS (SELECT doc_id, text, lang, source,
       |  CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens FROM q
       |  WHERE quality >= 0.7),
       |dd AS (SELECT doc_id, lang, source, n_tokens FROM (
       |  SELECT doc_id, lang, source, n_tokens,
       |    ROW_NUMBER() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
       |  FROM f) WHERE rn = 1),
       |sm AS (SELECT doc_id, lang, source, n_tokens FROM dd
       |  WHERE substr(md5('graft:' || lang || ':' || CAST(doc_id AS VARCHAR)), 1, 8)
       |        < '80000000'),
       |cur AS (SELECT doc_id, source, n_tokens FROM (
       |  SELECT doc_id, source, n_tokens, ROW_NUMBER() OVER (
       |    PARTITION BY source
       |    ORDER BY md5('graft:' || CAST(doc_id AS VARCHAR)), doc_id) AS rn2
       |  FROM sm) WHERE rn2 <= 20),
       |pr AS (SELECT doc_id, source,
       |  COALESCE(SUM(n_tokens) OVER (PARTITION BY source
       |    ORDER BY md5('graft:' || CAST(doc_id AS VARCHAR)), doc_id
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS prior
       |  FROM cur)
       |SELECT doc_id, source, CAST(prior AS BIGINT) AS shard_tok0,
       |  CAST(prior // 200 AS BIGINT) AS shard_id
       |FROM pr ORDER BY doc_id""".stripMargin
  }) { (s, d) =>
    val scored = docs(s, d)
      .withColumn("quality", graft.functions.TextFns.qualityScore(col("text")))
    val filtered = scored.filter(col("quality") >= 0.7)
      .withColumn("n_tokens",
        graft.functions.TextFns.wsTokenCount(col("text")).cast("long"))
    val deduped = Dedup.dedupKeepFirst(filtered, "doc_id", "text")
    val sampled = graft.operators.Sampling.stratifiedSample(
      deduped, col("lang"), col("doc_id"), 0.5)
    val curated = graft.operators.Sampling.quotaPerGroup(
      sampled, col("source"), col("doc_id"), 20)
    graft.operators.Pack.shardManifest(
      curated.select(col("doc_id"), col("source"), col("n_tokens")),
      col("source"), col("doc_id"), col("n_tokens"), shardTokens = 200L)
      .select(col("doc_id"), col("source"), col("shard_tok0"), col("shard_id"))
      .orderBy("doc_id")
  }

  /** Per-stage drop accounting for the curation pipeline — the batch
    * analog of `streaming_late_drop`'s discipline: rows a pipeline
    * silently discards are data loss you have to SEE, so the audit
    * face emits (stage, rows_out) for every stage of
    * `curate_pipeline`'s composition. Each row is one partial-agg
    * count over that stage's subtree (an audit pass, priced
    * accordingly; a production run computes the same numbers free via
    * `observe()` on the single curation plan — this face gates the
    * NUMBERS, which observe() metrics are not hash-checkable for). */
  val curateAudit = Q("curate_audit", {
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
       |        < '80000000'),
       |qt AS (SELECT doc_id FROM (
       |  SELECT doc_id, ROW_NUMBER() OVER (
       |    PARTITION BY source
       |    ORDER BY md5('graft:' || CAST(doc_id AS VARCHAR)), doc_id) AS rn2
       |  FROM sm) WHERE rn2 <= 20)
       |SELECT * FROM (
       |  SELECT 0 AS stage_no, 'input' AS stage, COUNT(*) AS rows_out FROM documents
       |  UNION ALL SELECT 1, 'quality', COUNT(*) FROM f
       |  UNION ALL SELECT 2, 'dedup', COUNT(*) FROM dd
       |  UNION ALL SELECT 3, 'sample', COUNT(*) FROM sm
       |  UNION ALL SELECT 4, 'quota', COUNT(*) FROM qt)
       |ORDER BY stage_no""".stripMargin
  }) { (s, d) =>
    val input = docs(s, d)
    val filtered = input
      .withColumn("quality", graft.functions.TextFns.qualityScore(col("text")))
      .filter(col("quality") >= 0.7)
    val deduped = Dedup.dedupKeepFirst(filtered, "doc_id", "text")
    val sampled = graft.operators.Sampling.stratifiedSample(
      deduped, col("lang"), col("doc_id"), 0.5)
    val quota = graft.operators.Sampling.quotaPerGroup(
      sampled, col("source"), col("doc_id"), 20)
    Seq(("input", input), ("quality", filtered), ("dedup", deduped),
      ("sample", sampled), ("quota", quota)).zipWithIndex
      .map { case ((name, df), i) =>
        df.agg(count(lit(1)).as("rows_out"))
          .select(lit(i).cast("int").as("stage_no"),
            lit(name).as("stage"), col("rows_out"))
      }
      .reduce(_ unionByName _)
      .orderBy("stage_no")
  }

  val round9b: Seq[Q] = Seq(dedupSpans, shardManifest,
    decontaminateJoinQ, decontaminateBandedQ, dedupClustersRemove,
    q53ZorderLayout, dedupSpansIncrementalQ, curateShards, curateAudit)
}
