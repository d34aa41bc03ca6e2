package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.TextFns
import graft.operators.{Multimodal, Pack, Similarity}
import graft.pipeline.Legacy

/** Round-4 additions: oracle coverage for the legacy-connector surface
  * (previously unit-test-only), the trained-index ANN path, and the
  * multimodal resize stage. See [[Registry]] for the determinism rules.
  *
  * The legacy queries derive their raw inputs INLINE from the harness
  * tables (orders/events) — both engines build the identical raw relation
  * from the same parquet, so the hash compare exercises the legacy
  * semantics (malformed-row drop, trim, dd/MM/yyyy→ISO, cast projection)
  * with no external fixture file.
  */
object Registry4 {

  private def o(s: SparkSession, d: String) = Tables.orders(s, d)
  private def ev(s: SparkSession, d: String) = Tables.events(s, d)
  private def emb(s: SparkSession, d: String) = Tables.embeddings(s, d)

  /** DuckDB left-fold cosine (same shape as RegistryExt's). */
  private def sqlDot(a: String, b: String): String =
    s"""list_reduce(list_prepend(0.0, list_transform(range(1, 65),
       |    i -> CAST($a[i] AS DOUBLE) * CAST($b[i] AS DOUBLE))), (x, y) -> x + y)""".stripMargin
  private def sqlCos(a: String, b: String): String =
    s"""(${sqlDot(a, b)} / (sqrt(${sqlDot(a, a)}) * sqrt(${sqlDot(b, b)})))"""

  /** Legacy e-SAJ row semantics ([[Legacy.parseEsajRows]]: SURVEY §2
    * P5+W5+F8+F9, reference legacy_datajud_connector.py:53-75) under the
    * oracle gate. The raw cell arrays are synthesized from `orders`:
    * every 10th row is malformed (2 cells → dropped), every 7th carries
    * an unparseable date (→ null), cells arrive untrimmed (→ trimmed),
    * and the 6th cell exists but is ignored. The oracle builds the
    * expected OUTPUT directly — if any legacy step (drop/trim/reformat/
    * projection) misbehaves, the hash flips. */
  val legacyEsajRows = Q("legacy_esaj_rows",
    """SELECT CAST(o_orderkey AS VARCHAR) || '-89.2026.8.26.0100' AS processo,
      |  o_orderstatus AS classe,
      |  o_orderpriority AS assunto,
      |  'Vara ' || CAST(o_orderkey % 5 AS VARCHAR) AS orgao,
      |  CASE WHEN o_orderkey % 7 = 0 THEN NULL
      |       ELSE strftime(o_orderdate, '%Y-%m-%d') END AS data
      |FROM orders WHERE o_orderkey % 10 <> 0
      |ORDER BY processo""".stripMargin) { (s, d) =>
    val cells = when(col("o_orderkey") % 10 === 0,
      array(lit(" truncated "), lit("row")))
      .otherwise(array(
        concat(lit("  "), col("o_orderkey").cast("string"),
          lit("-89.2026.8.26.0100 ")),
        concat(col("o_orderstatus"), lit(" ")),
        concat(lit(" "), col("o_orderpriority")),
        concat(lit(" Vara "), (col("o_orderkey") % 5).cast("string")),
        when(col("o_orderkey") % 7 === 0, lit("not-a-date"))
          .otherwise(date_format(col("o_orderdate"), "dd/MM/yyyy")),
        lit("ignored-sixth-cell")))
    Legacy.parseEsajRows(o(s, d).select(cells.as("cells")), col("cells"))
      .orderBy("processo")
  }

  /** Legacy DataJud stats projection ([[Legacy.statsProjection]]: SURVEY
    * §2 S4+P4, reference legacy_datajud_connector.py:128-146) under the
    * oracle gate: raw records derived from `events` with mixed input
    * types (int ano → long, preserved nulls in both metric columns). */
  val legacyStats = Q("legacy_stats",
    """SELECT event_type || '#' || CAST(event_id AS VARCHAR) AS classe,
      |  CAST(year(ts) AS BIGINT) AS ano,
      |  value AS tempo_medio_dias,
      |  CASE WHEN event_id % 11 = 0 THEN NULL ELSE value END
      |    AS taxa_provimento_percent
      |FROM events ORDER BY classe""".stripMargin) { (s, d) =>
    val raw = ev(s, d).select(
      concat(col("event_type"), lit("#"), col("event_id")).as("classe"),
      year(col("ts")).as("ano"), // int on purpose: the projection casts
      col("value").as("tempo_medio_dias"),
      when(col("event_id") % 11 === 0, lit(null).cast("double"))
        .otherwise(col("value")).as("taxa_provimento_percent"))
    Legacy.statsProjection(raw).orderBy("classe")
  }

  /** Resize stage ([[Multimodal.resizeTo]]): fit each decoded frame into
    * a 320×240 box preserving aspect ratio. Decode geometry is the stub's
    * arithmetic (byte_len mod 640/480, clamped to ≥1), so the oracle
    * replays it exactly; scale/trunc are single IEEE ops on both sides.
    * The Spark side feeds `text.getBytes("UTF-8")` into the stub, so the
    * oracle measures UTF-8 BYTES too — DuckDB `strlen`, not `length`
    * (characters); they differ the moment a document is non-ASCII. */
  val multimodalResize = Q("multimodal_resize",
    """SELECT id,
      |  CAST(GREATEST(1, trunc(w * scale)) AS BIGINT) AS width,
      |  CAST(GREATEST(1, trunc(h * scale)) AS BIGINT) AS height,
      |  scale, content_md5
      |FROM (
      |  SELECT doc_id AS id,
      |    GREATEST(strlen(text) % 640, 1) AS w,
      |    GREATEST(strlen(text) % 480, 1) AS h,
      |    LEAST(CAST(1.0 AS DOUBLE),
      |      LEAST(CAST(320 AS DOUBLE) / GREATEST(strlen(text) % 640, 1),
      |            CAST(240 AS DOUBLE) / GREATEST(strlen(text) % 480, 1)))
      |      AS scale,
      |    md5(text) AS content_md5
      |  FROM documents)
      |ORDER BY id""".stripMargin) { (s, d) =>
    import s.implicits._
    val records = Tables.documents(s, d)
      .select(col("doc_id").as("id"), col("text")).as[(Long, String)]
      .map { case (id, text) =>
        Multimodal.MediaRecord(id, "text", text.getBytes("UTF-8"))
      }
    Multimodal.resizeTo(records, 320, 240).toDF()
      .select(col("id"),
        col("width").cast("long").as("width"),
        col("height").cast("long").as("height"),
        col("scale"), col("content_md5"))
      .orderBy("id")
  }

  /** Trained-index ANN ([[Similarity.kmeansIter]] →
    * [[Similarity.ivfTopKWith]]): one Lloyd step refines 8 seed centroids
    * (lowest-id vectors), then IVF probes the refined codebook. The
    * oracle replays the identical refine (argmax-cosine assignment,
    * fixed-point-exact per-dim sums, two IEEE divides per mean) and the
    * identical probe/score/rank, so both engines walk the same index. */
  val annIvfKmeans = Q("ann_ivf_kmeans",
    s"""WITH cent0 AS (SELECT CAST(vec_id AS INT) AS cell, embedding AS c_vec
       |  FROM embeddings WHERE vec_id < 8),
       |asg0 AS (SELECT n_id, cell, n_vec FROM (
       |  SELECT b.vec_id AS n_id, c.cell, b.embedding AS n_vec,
       |    ROW_NUMBER() OVER (PARTITION BY b.vec_id
       |      ORDER BY ${sqlCos("b.embedding", "c.c_vec")} DESC, c.cell DESC) AS rn
       |  FROM embeddings b CROSS JOIN cent0 c) WHERE rn = 1),
       |dm AS (SELECT cell, i AS d,
       |    CAST(SUM(CAST(round(CAST(n_vec[i] AS DOUBLE) * 1e10) AS BIGINT)) AS DOUBLE)
       |      / 1e10 / COUNT(n_vec[i]) AS m
       |  FROM asg0 CROSS JOIN (SELECT unnest(range(1, 65)) AS i)
       |  GROUP BY cell, i),
       |cent1 AS (SELECT cell, list(m ORDER BY d) AS c_vec FROM dm GROUP BY cell),
       |asg AS (SELECT n_id, cell, n_vec FROM (
       |  SELECT b.vec_id AS n_id, c.cell, b.embedding AS n_vec,
       |    ROW_NUMBER() OVER (PARTITION BY b.vec_id
       |      ORDER BY ${sqlCos("b.embedding", "c.c_vec")} DESC, c.cell DESC) AS rn
       |  FROM embeddings b CROSS JOIN cent1 c) WHERE rn = 1),
       |probes AS (SELECT q_id, cell, q_vec FROM (
       |  SELECT q.vec_id AS q_id, c.cell, q.embedding AS q_vec,
       |    ROW_NUMBER() OVER (PARTITION BY q.vec_id
       |      ORDER BY ${sqlCos("q.embedding", "c.c_vec")} DESC, c.cell DESC) AS rn
       |  FROM embeddings q CROSS JOIN cent1 c WHERE q.vec_id < 5) WHERE rn <= 3),
       |sc AS (SELECT q_id, n_id, ${sqlCos("p.q_vec", "a.n_vec")} AS cos
       |  FROM probes p JOIN asg a USING (cell) WHERE q_id <> n_id),
       |r AS (SELECT q_id, n_id, cos, CAST(ROW_NUMBER() OVER
       |  (PARTITION BY q_id ORDER BY cos DESC, n_id) AS BIGINT) AS rnk FROM sc)
       |SELECT q_id, n_id, rnk, cos FROM r WHERE rnk <= 3
       |ORDER BY q_id, rnk""".stripMargin) { (s, d) =>
    val e = emb(s, d)
    val cent0 = e.filter(col("vec_id") < 8)
      .select(col("vec_id").cast("int").as("cell"), col("embedding").as("c_vec"))
    // the refined codebook feeds BOTH the assignment and the probe joins;
    // without a checkpoint Spark plans the 2-shuffle refine once per
    // consumer (no exchange reuse across broadcasts) — 8 rows, so
    // materializing it is free
    val cent1 = Similarity.kmeansIter(e, cent0, "vec_id", "embedding")
      .localCheckpoint()
    Similarity.ivfTopKWith(e.filter(col("vec_id") < 5), e, cent1,
      "vec_id", "embedding", k = 3, nProbe = 3)
      .withColumn("rnk", col("rnk").cast("long"))
      .orderBy("q_id", "rnk")
  }

  /** Fixed-window chunking ([[Pack.chunkFixed]]): 200-char windows, 50
    * overlap — the embedding-index prep stage. Shuffle-free narrow
    * explode; the ORDER BY is the oracle's, not the operator's. */
  val packChunk = Q("pack_chunk_documents",
    """SELECT doc_id, CAST(off // 150 AS BIGINT) AS chunk_id,
      |  substr(text, CAST(off + 1 AS INT), 200) AS chunk
      |FROM (SELECT doc_id, text,
      |  unnest(range(0, GREATEST(length(text) - 1, 0) + 1, 150)) AS off
      |  FROM documents)
      |ORDER BY doc_id, chunk_id""".stripMargin) { (s, d) =>
    Pack.chunkFixed(Tables.documents(s, d), "doc_id", "text",
      size = 200, overlap = 50)
      .orderBy("doc_id", "chunk_id")
  }

  /** Token-budget sequence packing ([[Pack.packSequences]]): documents
    * laid end-to-end per source, cut every 256 whitespace tokens,
    * straddling docs split across sequences. The oracle replays the
    * same integer layout arithmetic over the same window cumsum. */
  val packSequences = Q("pack_sequences",
    """SELECT source, doc_id, CAST(seq_id AS BIGINT) AS seq_id,
      |  CAST(LEAST(cum, (seq_id + 1) * 256)
      |    - GREATEST(strt, seq_id * 256) AS BIGINT) AS tok_in_seq
      |FROM (
      |  SELECT source, doc_id, cum, cum - tk AS strt,
      |    unnest(range((cum - tk) // 256, (cum - 1) // 256 + 1)) AS seq_id
      |  FROM (
      |    SELECT source, doc_id, tk,
      |      CAST(SUM(tk) OVER (PARTITION BY source ORDER BY doc_id
      |        ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
      |    FROM (SELECT source, doc_id,
      |        CAST(len(string_split(text, ' ')) AS BIGINT) AS tk
      |      FROM documents)
      |    WHERE tk > 0))
      |ORDER BY doc_id, seq_id""".stripMargin) { (s, d) =>
    val docs = Tables.documents(s, d)
    Pack.packSequences(docs, "doc_id", TextFns.wsTokenCount(col("text")),
      budget = 256L, partCol = col("source"))
      .orderBy("doc_id", "seq_id")
  }

  /** Gopher-style repetition quality signals, per document: distinct-token
    * ratio, most-frequent-token fraction (tie → lexicographically largest,
    * deterministic on both engines), and most-frequent-bigram fraction —
    * the repetition gates a pretraining curation pass runs next to
    * text_quality's length/punct signals. Shape: ZERO-SHUFFLE projection
    * over the fused [[graft.expressions.RepetitionStats]] codegen kernel
    * (one pass per row builds the token/bigram frequency maps row-locally);
    * the earlier explode → two-level groupBy form exchanged the whole
    * tokenized corpus to answer a row-local question. The oracle keeps the
    * relational formulation — two engines, two shapes, one hash. Ratios
    * are single IEEE divides of exact longs. */
  val textRepetition = Q("text_repetition",
    """WITH t AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
      |  FROM documents),
      |uni AS (SELECT doc_id, tok, COUNT(*) AS c FROM t GROUP BY 1, 2),
      |agg AS (SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_tok,
      |    CAST(COUNT(*) AS BIGINT) AS n_distinct
      |  FROM uni GROUP BY doc_id),
      |top AS (SELECT doc_id, tok AS top_tok, c AS top_c FROM (
      |  SELECT doc_id, tok, c, ROW_NUMBER() OVER (PARTITION BY doc_id
      |    ORDER BY c DESC, tok DESC) AS rn FROM uni) WHERE rn = 1),
      |bg AS (SELECT doc_id,
      |    unnest(list_transform(range(1, len(string_split(text, ' '))),
      |      i -> string_split(text, ' ')[i] || ' ' ||
      |           string_split(text, ' ')[i + 1])) AS b
      |  FROM documents),
      |tb AS (SELECT doc_id, MAX(c) AS top2_c FROM (
      |  SELECT doc_id, b, COUNT(*) AS c FROM bg GROUP BY 1, 2) GROUP BY 1)
      |SELECT agg.doc_id, n_tok, n_distinct,
      |  CAST(n_distinct AS DOUBLE) / CAST(n_tok AS DOUBLE) AS distinct_ratio,
      |  top_tok,
      |  CAST(top_c AS DOUBLE) / CAST(n_tok AS DOUBLE) AS top_frac,
      |  CAST(top2_c AS DOUBLE) / CAST(n_tok - 1 AS DOUBLE) AS top2_frac
      |FROM agg LEFT JOIN top ON agg.doc_id = top.doc_id
      |  LEFT JOIN tb ON agg.doc_id = tb.doc_id
      |ORDER BY agg.doc_id""".stripMargin) { (s, d) =>
    val st = TextFns.repetitionStats(col("text"))
    Tables.documents(s, d)
      .select(col("doc_id"), st.as("_r"))
      .select(col("doc_id"),
        col("_r.n_tok").as("n_tok"),
        col("_r.n_distinct").as("n_distinct"),
        (col("_r.n_distinct").cast("double") / col("_r.n_tok").cast("double"))
          .as("distinct_ratio"),
        col("_r.top_tok").as("top_tok"),
        (col("_r.top_c").cast("double") / col("_r.n_tok").cast("double"))
          .as("top_frac"),
        (col("_r.top2_c").cast("double")
          / (col("_r.n_tok") - 1).cast("double")).as("top2_frac"))
      .orderBy("doc_id")
  }

  /** Incremental IVF ingest ([[Similarity.ivfAssign]]): a new batch
    * (every vec_id ≡ 7 mod 10) lands in the existing 16-cell seed
    * codebook — broadcast join + argmax, the corpus itself untouched.
    * The oracle replays the same cosine argmax with the same tie rule. */
  val annIvfAssign = Q("ann_ivf_assign",
    s"""WITH cent AS (SELECT CAST(vec_id AS INT) AS cell, embedding AS c_vec
       |  FROM embeddings WHERE vec_id < 16)
       |SELECT vec_id, cell, score FROM (
       |  SELECT q.vec_id, c.cell, ${sqlCos("q.embedding", "c.c_vec")} AS score,
       |    ROW_NUMBER() OVER (PARTITION BY q.vec_id
       |      ORDER BY ${sqlCos("q.embedding", "c.c_vec")} DESC, c.cell DESC) AS rn
       |  FROM embeddings q CROSS JOIN cent c WHERE q.vec_id % 10 = 7)
       |WHERE rn = 1 ORDER BY vec_id""".stripMargin) { (s, d) =>
    val e = emb(s, d)
    val seed = e.filter(col("vec_id") < 16)
      .select(col("vec_id").cast("int").as("cell"), col("embedding").as("c_vec"))
    Similarity.ivfAssign(e.filter(col("vec_id") % 10 === 7), seed,
      "vec_id", "embedding")
      .orderBy("vec_id")
  }

  /** Dup-cluster size audit: the histogram a curation run reads to judge
    * dedup aggressiveness (how many pairs/triples/blobs). Same pairs +
    * connected components as dedup_clusters, then two cheap aggs; the
    * oracle extends the recursive-CTE closure with the same histogram. */
  val dedupClusterSizes = Q("dedup_cluster_sizes",
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
      |lbl AS (SELECT id, MIN(r) AS cl FROM reach GROUP BY id),
      |lab AS (SELECT d.doc_id, COALESCE(l.cl, d.doc_id) AS cl
      |  FROM documents d LEFT JOIN lbl l ON d.doc_id = l.id),
      |cs AS (SELECT cl, CAST(COUNT(*) AS BIGINT) AS sz FROM lab GROUP BY cl)
      |SELECT sz AS cluster_size, CAST(COUNT(*) AS BIGINT) AS n_clusters,
      |  CAST(sz * COUNT(*) AS BIGINT) AS n_docs
      |FROM cs GROUP BY sz ORDER BY cluster_size""".stripMargin) { (s, d) =>
    import graft.operators.Dedup
    val corpus = Tables.documents(s, d)
    val cc = Dedup.connectedComponents(
      Dedup.minhashCandidates(corpus, "doc_id", "text"), "a_id", "b_id")
    corpus.select("doc_id")
      .join(cc, corpus("doc_id") === cc("id"), "left")
      .select(coalesce(col("cluster"), col("doc_id")).as("cl"))
      .groupBy("cl").agg(count(lit(1)).as("sz"))
      .groupBy("sz").agg(count(lit(1)).as("n_clusters"))
      .select(col("sz").as("cluster_size"), col("n_clusters"),
        (col("sz") * col("n_clusters")).as("n_docs"))
      .orderBy("cluster_size")
  }

  /** Corpus-level audit rollup, per (source, lang): the headline numbers
    * a dataset card reports. Pure partial-agg shapes (sums/counts of
    * exact longs — no order-dependent doubles), one shuffle on the tiny
    * group key. */
  val corpusStats = Q("corpus_stats",
    """SELECT source, lang,
      |  CAST(COUNT(*) AS BIGINT) AS n_docs,
      |  CAST(SUM(n_chars) AS BIGINT) AS total_chars,
      |  CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS total_tokens,
      |  CAST(MIN(n_chars) AS BIGINT) AS min_chars,
      |  CAST(MAX(n_chars) AS BIGINT) AS max_chars
      |FROM documents GROUP BY source, lang
      |ORDER BY source, lang""".stripMargin) { (s, d) =>
    Tables.documents(s, d)
      .groupBy("source", "lang")
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_chars")).as("total_chars"),
        sum(TextFns.wsTokenCount(col("text"))).as("total_tokens"),
        min(col("n_chars")).as("min_chars"),
        max(col("n_chars")).as("max_chars"))
      .orderBy("source", "lang")
  }

  /** The pure-SQL face of the custom kernels: the whole query is a
    * `spark.sql(...)` string using the `graft_*` functions registered by
    * [[graft.GraftExtensions]] (rolling hash, word shingles, fused dot) —
    * proof a SQL-only user gets the same codegen'd kernels and the same
    * oracle-exact results as the Column API. */
  val sqlGraftFns = Q("sql_graft_functions",
    """SELECT doc_id,
      |  list_reduce(list_prepend(CAST(0 AS BIGINT),
      |    list_transform(range(1, length(text) + 1),
      |      i -> CAST(ascii(text[i]) AS BIGINT))),
      |    (a, b) -> (a * 31 + b) % 1000000007) AS rh,
      |  CAST(len(list_distinct(list_transform(range(1, len(string_split(text,' ')) - 1),
      |    i -> string_split(text,' ')[i] || ' ' || string_split(text,' ')[i+1]
      |         || ' ' || string_split(text,' ')[i+2]))) AS BIGINT) AS n_shingles,
      |  list_reduce(list_prepend(0.0, list_transform(range(1, 65),
      |    i -> CAST(e.embedding[i] AS DOUBLE) * CAST(e.embedding[i] AS DOUBLE))),
      |    (x, y) -> x + y) AS sq_norm
      |FROM documents d JOIN embeddings e ON d.doc_id = e.vec_id
      |ORDER BY doc_id""".stripMargin) { (s, d) =>
    Tables.documents(s, d).createOrReplaceTempView("docs_g4")
    Tables.embeddings(s, d).createOrReplaceTempView("emb_g4")
    s.sql(
      """SELECT doc_id,
        |  graft_rolling_hash(text) AS rh,
        |  CAST(size(array_distinct(graft_word_shingles(text, 3))) AS BIGINT)
        |    AS n_shingles,
        |  graft_dot(embedding, embedding) AS sq_norm
        |FROM docs_g4 d JOIN emb_g4 e ON d.doc_id = e.vec_id
        |ORDER BY doc_id""".stripMargin)
  }

  /** Weighted Bernoulli sample ([[graft.operators.Sampling.weightedSample]]):
    * keep probability grows with document length (weight = n_chars/300,
    * clamped) — the upsample-by-quality curation primitive, reproducible
    * under any partitioning. Zero shuffles bar the oracle's ORDER BY. */
  val sampleWeighted = Q("sample_weighted",
    """SELECT doc_id, n_chars FROM (
      |  SELECT doc_id, n_chars,
      |    CAST(n_chars AS DOUBLE) / 300.0 AS w,
      |    substr(md5('graft:' || CAST(doc_id AS VARCHAR)), 1, 8) AS draw
      |  FROM documents)
      |WHERE w >= 1.0 OR draw <
      |  lpad(lower(hex(CAST(floor(GREATEST(0.0, w) * 4294967296.0) AS BIGINT))), 8, '0')
      |ORDER BY doc_id""".stripMargin) { (s, d) =>
    import graft.operators.Sampling
    Sampling.weightedSample(
      Tables.documents(s, d).select(col("doc_id"), col("n_chars")),
      col("n_chars").cast("double") / 300.0, col("doc_id"))
      .orderBy("doc_id")
  }

  /** Tolerance-bounded as-of join
    * ([[graft.operators.Temporal.asofJoinBackwardWithin]]): q24's
    * view←click match, but clicks staler than 10 minutes are nulled —
    * pandas merge_asof(tolerance) semantics. The oracle replays the
    * plain ASOF join and applies the same staleness CASE. */
  val q49AsofTolerance = Q("q49_asof_tolerance",
    """WITH v AS (SELECT event_id, user_id, ts FROM events
      |  WHERE event_type = 'view' AND ts IS NOT NULL),
      |c AS (SELECT user_id, ts, MAX(event_id) AS click_id FROM events
      |  WHERE event_type = 'click' AND ts IS NOT NULL GROUP BY 1, 2),
      |j AS (SELECT v.event_id, v.user_id, c.click_id, c.ts AS cts, v.ts AS vts
      |  FROM v ASOF LEFT JOIN c ON v.user_id = c.user_id AND v.ts >= c.ts)
      |SELECT event_id, user_id,
      |  CASE WHEN cts IS NOT NULL AND date_diff('second', cts, vts) <= 600
      |    THEN click_id END AS click_id,
      |  CASE WHEN cts IS NOT NULL AND date_diff('second', cts, vts) <= 600
      |    THEN CAST(date_diff('second', cts, vts) AS BIGINT) END AS gap_s
      |FROM j ORDER BY event_id""".stripMargin) { (s, d) =>
    import graft.operators.Temporal
    val e = ev(s, d)
    val views = e.filter(col("event_type") === "view" && col("ts").isNotNull)
      .select("event_id", "user_id", "ts")
    val clicks = e.filter(col("event_type") === "click" && col("ts").isNotNull)
      .groupBy("user_id", "ts").agg(max(col("event_id")).as("click_id"))
      .withColumnRenamed("ts", "click_ts")
    Temporal.asofJoinBackwardWithin(views, clicks, on = "user_id",
      leftTs = "ts", rightTs = "click_ts",
      rightVals = Seq("click_id", "click_ts"), toleranceSec = 600L)
      .select(col("event_id"), col("user_id"), col("click_id"),
        (col("ts").cast("long") - col("click_ts").cast("long")).as("gap_s"))
      .orderBy("event_id")
  }

  /** Deterministic 80/10/10 train/val/test split
    * ([[graft.operators.Sampling.assignSplit]]), reported as per-(lang,
    * split) counts — the canonical ML dataset partitioning, reproducible
    * and stable under corpus growth. The oracle replays the cumulative
    * hex-threshold ladder over the same salted draw. */
  val sampleSplit = Q("sample_split",
    s"""SELECT lang, CASE
       |    WHEN substr(md5('graft:split:' || CAST(doc_id AS VARCHAR)), 1, 8)
       |      < '${graft.operators.Sampling.hexThreshold(0.8)}' THEN 'train'
       |    WHEN substr(md5('graft:split:' || CAST(doc_id AS VARCHAR)), 1, 8)
       |      < '${graft.operators.Sampling.hexThreshold(0.9)}' THEN 'val'
       |    ELSE 'test' END AS split,
       |  CAST(COUNT(*) AS BIGINT) AS n_docs
       |FROM documents GROUP BY 1, 2 ORDER BY lang, split""".stripMargin) { (s, d) =>
    import graft.operators.Sampling
    Sampling.assignSplit(Tables.documents(s, d), col("doc_id"),
      Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
      .groupBy("lang", "split").agg(count(lit(1)).as("n_docs"))
      .orderBy("lang", "split")
  }

  val round4: Seq[Q] = Seq(legacyEsajRows, legacyStats, multimodalResize,
    annIvfKmeans, packChunk, packSequences, textRepetition, annIvfAssign,
    dedupClusterSizes, corpusStats, sqlGraftFns, sampleWeighted,
    q49AsofTolerance, sampleSplit)
}
