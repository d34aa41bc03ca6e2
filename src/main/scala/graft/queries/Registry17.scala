package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.operators.{Retrieval, Similarity, TxVectorStack}

/** Round-15 transactional index lifecycle: the [[graft.operators.Manifest]]
  * commit protocol extended from the BM25 serve stack to the VECTOR
  * index ([[graft.operators.TxVectorStack]]). The IVF-PQ stack is the
  * protocol's sharpest client: its assets (codes ledger, centroids,
  * codebook) are mutually meaningless when torn — a PQ code is m
  * indexes into one specific codebook, so serving codes from
  * quantizer A against codebook B mis-ranks silently. One manifest
  * pins all three to a consistent cut; quantizer refresh becomes a
  * single atomic swap instead of [[Similarity.pqIndexReencode]]'s
  * documented "write to a new path, then switch readers" convention.
  *
  * Reference (jurimetria-etl) has no vector surface; these are the
  * LLM-training-data extensions (brief §"Beyond the reference").
  */
object Registry17 {

  private def emb(s: SparkSession, d: String) = Tables.embeddings(s, d)

  /** Drain the whole embeddings table into a fresh vector stack in
    * four overlapping arrival batches (10-id overlaps — the
    * at-least-once replay the anti-join absorbs) under quantizer A
    * (the shared seed inputs). Returns the stack root. */
  private[queries] def drainVectorStack(s: SparkSession, d: String,
                                        tag: String): String = {
    // deterministic drain, staged once per (dataset, builder version);
    // each gate mutates its own copy (drainTxStack's discipline —
    // bump the version when TxVectorStack's on-disk format changes)
    val fx = FixtureCache.cached(d, "vecstack", 2,
      Seq("embeddings")) { tmp =>
      val (e, cent, cb) = Registry10.ivfPqSparkInputs(s, d)
      val root = tmp.resolve("stack").toString
      TxVectorStack.init(s, root, cent, cb)
      val n = e.select("vec_id").count()
      val qn = n / 4
      for (p <- 0 until 4) {
        val lo = math.max(0L, p * qn - 10)
        val hi = if (p == 3) n else (p + 1) * qn
        TxVectorStack.commitBatch(s, root,
          e.filter(col("vec_id") >= lo && col("vec_id") < hi),
          p.toLong, "vec_id", "embedding", buckets = 16)
      }
    }
    val stage = StreamHarness.runDir(tag)
    FixtureCache.copyInto(fx.resolve("stack"), stage.resolve("stack"))
    stage.resolve("stack").toString
  }

  /** The vector index under the MANIFEST protocol
    * ([[graft.operators.TxVectorStack]]): quantizer committed first,
    * four overlapping arrival batches encoded under it (each an
    * anti-joined delta at a versioned path + one manifest swap), then
    * the IVF-PQ serve ([[Similarity.ivfPqTopKFromIndex]]) resolved
    * ONLY through the committed manifest — codes, centroids, and
    * codebook all from pinned versions. The oracle is
    * `ann_ivf_pq_topk`'s exact routing + restricted-ADC algebra over
    * the raw corpus, so a torn cut (codes without their quantizer), a
    * double-applied overlap, or a leaked uncommitted batch flips the
    * ranking hash. VectorStackSpec carries the crash faces. */
  val annIndexManifest = Q("ann_index_manifest",
    s"""WITH ${Registry10.sqlPqCodes},
       |qd AS (SELECT q.vec_id AS q_id, js.j AS sub, c.code,
       |    ${Registry10.sqlSubDist("q.embedding", "c.w", "js.j")} AS dist
       |  FROM embeddings q CROSS JOIN js CROSS JOIN cw c
       |  WHERE q.vec_id < 5),
       |${Registry10.sqlIvfAdcRank("codes", "qd")}
       |SELECT q_id, n_id, rnk, adc FROM r WHERE rnk <= 5
       |ORDER BY q_id, rnk""".stripMargin) { (s, d) =>
    val root = drainVectorStack(s, d, "graft_vectx")
    val (ledger, cent, cb) = TxVectorStack.resolve(s, root)
    Similarity.ivfPqTopKFromIndex(
      emb(s, d).filter(col("vec_id") < 5), ledger, cent, cb,
      "vec_id", "embedding", k = 5, nProbe = 4)
      .withColumn("rnk", col("rnk").cast("long"))
      .orderBy("q_id", "rnk")
  }

  /** Quantizer refresh as ONE transaction
    * ([[graft.operators.TxVectorStack.refresh]]): the drained stack
    * re-encodes its committed membership under quantizer B (seeded
    * from corpus vectors 16..31, `ann_index_reencode`'s retrained
    * stand-in) into a fresh codes base + fresh quant version, and a
    * single manifest swap moves BOTH pointers — where the in-place
    * reencode gate documents "write to a new path, then switch
    * readers" as the caller's job, here the switch is the protocol's
    * commit point and a crash anywhere leaves quantizer A serving
    * (VectorStackSpec). The output is the post-swap ledger resolved
    * through the manifest; the oracle builds quantizer B's assignment
    * + codes from scratch, so a row lost by the re-encode, a stale
    * quantizer pin, or codes mixed across quantizers flips the hash. */
  val annRefreshManifest = Q("ann_refresh_manifest",
    s"""WITH cwb AS (SELECT CAST(vec_id - 16 AS INT) AS code,
       |    embedding AS w
       |  FROM embeddings WHERE vec_id >= 16 AND vec_id < 32),
       |js AS (SELECT unnest(range(0, 8)) AS j),
       |cd AS (SELECT b.vec_id AS n_id, js.j AS sub, c.code,
       |    ${Registry10.sqlSubDist("b.embedding", "c.w", "js.j")} AS dist
       |  FROM embeddings b CROSS JOIN js CROSS JOIN cwb c),
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
       |  FROM embeddings b CROSS JOIN centb c) WHERE rn = 1)
       |SELECT a.n_id AS vec_id, a.cell,
       |  array_to_string(list(CAST(n.code AS INT) ORDER BY n.sub), ',') AS codes
       |FROM asg a JOIN codes n ON n.n_id = a.n_id
       |GROUP BY a.n_id, a.cell ORDER BY vec_id""".stripMargin) { (s, d) =>
    val root = drainVectorStack(s, d, "graft_vecrf")
    val e = emb(s, d)
    val centB = e.filter(col("vec_id") >= 16 && col("vec_id") < 32)
      .select((col("vec_id") - 16).cast("int").as("cell"),
        col("embedding").as("c_vec"))
    val cbB = Similarity.pqCodebookSeed(
      e.withColumn("vec_id", col("vec_id") - 16)
        .filter(col("vec_id") >= 0),
      "vec_id", "embedding", m = 8, ksub = 16, subDim = 8)
    require(TxVectorStack.refresh(s, root, e, centB, cbB,
      "vec_id", "embedding", buckets = 16),
      "refresh must run on a committed stack")
    val st = graft.operators.Manifest.read(s, root).get
    require(st.baseV == st.globalV && st.baseV > 3L,
      "one swap must move the codes base and quantizer pointers together")
    TxVectorStack.resolve(s, root)._1
      .withColumn("codes", array_join(col("codes"), ","))
      .orderBy("vec_id")
  }

  /** TRANSACTIONAL DELETE on the BM25 stack
    * ([[graft.operators.TxServeStack.commitDelete]] — soft-delete
    * tombstones, Lucene's live-docs design): the drained 4-page stack
    * retires docs ≡ 3 (mod 7) in ONE commit — a tiny tombstone id
    * file, the removed postings' terms decremented out of their stats
    * buckets (df-0 terms drop), the 1-row global decremented — and
    * every read anti-joins the visible tombstones. O(touched): the
    * postings themselves are never rewritten (the physical purge is
    * compaction's). The output is the post-delete serve; the oracle
    * computes BM25 over the SURVIVING corpus from scratch, so a
    * leaked tombstoned doc, a stale df, or an undecremented N/Σdl
    * flips scores. ManifestSpec holds the crash face, the
    * double-delete no-op, and the era/re-ingest semantics. */
  val streamingStatsDelete = Q("streaming_stats_delete",
    s"""WITH ${Registry12.sqlBm25(10, "doc_id % 7 <> 3")}
       |SELECT q_id, doc_id, rnk, score FROM lex
       |ORDER BY q_id, rnk""".stripMargin) { (s, d) =>
    import graft.operators.TxServeStack
    val root = Registry16.drainTxStack(s, d, "graft_statsdel")
    require(TxServeStack.commitDelete(s, root,
      Tables.documents(s, d).filter(col("doc_id") % 7 === 3)
        .select("doc_id"),
      batchId = 4L, "doc_id", docBuckets = 16, termBuckets = 16),
      "the delete batch must commit on the drained stack")
    Registry16.txBm25Serve(s, d, root)
  }

  /** Transactional delete on the VECTOR stack
    * ([[graft.operators.TxVectorStack.commitDelete]]): vec_ids ≡ 3
    * (mod 7) tombstone in one commit and the IVF-PQ serve anti-joins
    * them — deleted members can never be returned as neighbors, with
    * zero code rows rewritten (codes are independent under a frozen
    * quantizer, so unlike the BM25 twin there are no derived stats to
    * fold). The oracle restricts the ADC scoring to surviving members
    * (the codes CTE filtered — routing and distance algebra
    * unchanged), so a tombstoned member leaking into any top-5 flips
    * the hash. VectorStackSpec holds the crash face, era semantics,
    * and the refresh-time purge. */
  val annIndexDelete = Q("ann_index_delete",
    s"""WITH ${Registry10.sqlPqCodes},
       |codes2 AS (SELECT * FROM codes WHERE n_id % 7 <> 3),
       |qd AS (SELECT q.vec_id AS q_id, js.j AS sub, c.code,
       |    ${Registry10.sqlSubDist("q.embedding", "c.w", "js.j")} AS dist
       |  FROM embeddings q CROSS JOIN js CROSS JOIN cw c
       |  WHERE q.vec_id < 5),
       |${Registry10.sqlIvfAdcRank("codes2", "qd")}
       |SELECT q_id, n_id, rnk, adc FROM r WHERE rnk <= 5
       |ORDER BY q_id, rnk""".stripMargin) { (s, d) =>
    val root = drainVectorStack(s, d, "graft_vecdel")
    val e = emb(s, d)
    require(TxVectorStack.commitDelete(s, root,
      e.filter(col("vec_id") % 7 === 3).select("vec_id"),
      batchId = 4L, "vec_id", buckets = 16),
      "the delete batch must commit on the drained stack")
    val (ledger, cent, cb) = TxVectorStack.resolve(s, root)
    Similarity.ivfPqTopKFromIndex(
      e.filter(col("vec_id") < 5), ledger, cent, cb,
      "vec_id", "embedding", k = 5, nProbe = 4)
      .withColumn("rnk", col("rnk").cast("long"))
      .orderBy("q_id", "rnk")
  }

  /** STREAMING arrival for the vector stack — the sixth streaming
    * ledger family (after tf, PQ codes, graph, positions, semantic
    * labels): Structured Streaming pages drain through
    * [[graft.operators.TxVectorStack.commitBatch]], so every
    * micro-batch is one atomic manifest commit — encode-under-pinned-
    * quantizer, bucket-pruned anti-join, versioned delta write, swap.
    * The foreachBatch batch ID is the protocol's high-water id, which
    * makes the sink EXACTLY-ONCE end to end (a replayed micro-batch
    * skips whole — stronger than the in-place drains' anti-join
    * absorption, which is merely idempotent). The serve is
    * `ann_index_manifest`'s, so the oracle is the same raw-corpus
    * routing + restricted-ADC algebra. */
  val streamingVectorIngest = Q("streaming_vector_ingest",
    s"""WITH ${Registry10.sqlPqCodes},
       |qd AS (SELECT q.vec_id AS q_id, js.j AS sub, c.code,
       |    ${Registry10.sqlSubDist("q.embedding", "c.w", "js.j")} AS dist
       |  FROM embeddings q CROSS JOIN js CROSS JOIN cw c
       |  WHERE q.vec_id < 5),
       |${Registry10.sqlIvfAdcRank("codes", "qd")}
       |SELECT q_id, n_id, rnk, adc FROM r WHERE rnk <= 5
       |ORDER BY q_id, rnk""".stripMargin) { (s, d) =>
    val (e, cent, cb) = Registry10.ivfPqSparkInputs(s, d)
    val fx = Registry16.pagesFixture(s, d, "vecpages", "embeddings",
      e, "vec_id")
    val stage = StreamHarness.runDir("graft_vecingest")
    val root = stage.resolve("stack").toString
    TxVectorStack.init(s, root, cent, cb)
    val stream = s.readStream
      .schema("vec_id LONG, embedding ARRAY<FLOAT>, label INT")
      .option("maxFilesPerTrigger", "1")
      .parquet(fx.resolve("pages").toString)
    val run = stream.writeStream
      .foreachBatch { (b: DataFrame, id: Long) =>
        TxVectorStack.commitBatch(s, root, b, id, "vec_id", "embedding",
          buckets = 16)
        ()
      }
      .option("checkpointLocation", stage.resolve("ckpt").toString)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    run.awaitTermination()
    val (ledger, centR, cbR) = TxVectorStack.resolve(s, root)
    Similarity.ivfPqTopKFromIndex(
      emb(s, d).filter(col("vec_id") < 5), ledger, centR, cbR,
      "vec_id", "embedding", k = 5, nProbe = 4)
      .withColumn("rnk", col("rnk").cast("long"))
      .orderBy("q_id", "rnk")
  }

  /** TRANSACTIONAL UPSERT on the BM25 stack
    * ([[graft.operators.TxServeStack.commitUpsert]] — the re-crawl
    * face): after the 4-page drain, docs ≡ 5 (mod 10) arrive AGAIN
    * with new text (`text || ' updated'`), and ONE commit retires
    * their old rows (ordered tombstone at this batch id — the
    * replacement rows, born at the same id, survive it), lands the
    * new postings, and folds the exact stats net (old decremented,
    * new incremented, both sides' buckets re-pinned). The oracle
    * computes BM25 over the UPDATED corpus from scratch, so a stale
    * row still serving, a double-counted df, or a missed global move
    * flips scores — including for query doc 0's own scores against
    * the shifted collection statistics. ManifestSpec holds the crash
    * face and last-writer-wins. */
  val streamingStatsUpsert = Q("streaming_stats_upsert",
    s"""WITH ${Registry12.sqlBm25(10, "TRUE",
         """(SELECT doc_id, CASE WHEN doc_id % 10 = 5
           |  THEN text || ' updated' ELSE text END AS text
           |  FROM documents)""".stripMargin)}
       |SELECT q_id, doc_id, rnk, score FROM lex
       |ORDER BY q_id, rnk""".stripMargin) { (s, d) =>
    import graft.operators.TxServeStack
    val root = Registry16.drainTxStack(s, d, "graft_statsup")
    val up = Tables.documents(s, d).filter(col("doc_id") % 10 === 5)
      .select(col("doc_id"), concat(col("text"), lit(" updated")).as("text"))
    require(TxServeStack.commitUpsert(s, root, up, 4L,
      "doc_id", "text", docBuckets = 16, termBuckets = 16),
      "the upsert batch must commit on the drained stack")
    Registry16.txBm25Serve(s, d, root)
  }

  /** Transactional upsert on the VECTOR stack
    * ([[graft.operators.TxVectorStack.commitUpsert]] — the re-embed
    * face): vectors ≡ 5 (mod 10) re-arrive ROTATED (halves swapped —
    * the content-derived stand-in for "the document changed, its
    * embedding moved"), and one commit tombstones the stale codes and
    * encodes the replacements under the PINNED quantizer. The oracle
    * re-derives assignment + codes over the UPDATED corpus while the
    * quantizer CTEs stay on the original seed vectors (the stack's
    * quantizer does not move on upsert — exactly the frozen-quantizer
    * invariant), so a stale code serving or a replacement encoded
    * against the wrong codebook flips the ranking. */
  val annIndexUpsert = Q("ann_index_upsert",
    s"""WITH mod AS (SELECT vec_id,
       |    CASE WHEN vec_id % 10 = 5
       |      THEN embedding[33:64] || embedding[1:32]
       |      ELSE embedding END AS embedding
       |  FROM embeddings),
       |${Registry10.sqlPqCodesOver("mod")},
       |qd AS (SELECT q.vec_id AS q_id, js.j AS sub, c.code,
       |    ${Registry10.sqlSubDist("q.embedding", "c.w", "js.j")} AS dist
       |  FROM embeddings q CROSS JOIN js CROSS JOIN cw c
       |  WHERE q.vec_id < 5),
       |${Registry10.sqlIvfAdcRank("codes", "qd", corpus = "mod")}
       |SELECT q_id, n_id, rnk, adc FROM r WHERE rnk <= 5
       |ORDER BY q_id, rnk""".stripMargin) { (s, d) =>
    val root = drainVectorStack(s, d, "graft_vecup")
    val e = emb(s, d)
    val rot = e.filter(col("vec_id") % 10 === 5)
      .select(col("vec_id"), concat(slice(col("embedding"), 33, 32),
        slice(col("embedding"), 1, 32)).as("embedding"))
    require(TxVectorStack.commitUpsert(s, root, rot, 4L,
      "vec_id", "embedding", buckets = 16),
      "the upsert batch must commit on the drained stack")
    val (ledger, cent, cb) = TxVectorStack.resolve(s, root)
    Similarity.ivfPqTopKFromIndex(
      e.filter(col("vec_id") < 5), ledger, cent, cb,
      "vec_id", "embedding", k = 5, nProbe = 4)
      .withColumn("rnk", col("rnk").cast("long"))
      .orderBy("q_id", "rnk")
  }

  /** The TRANSACTIONAL search page ([[Retrieval.rrfFuse]] over BOTH
    * manifest stacks): the lexical leg serves
    * [[Retrieval.bm25TopKFromStats]] from the drained
    * [[graft.operators.TxServeStack]] (stats path-pruned to the query
    * terms' pinned buckets), the dense leg serves
    * [[Similarity.ivfPqTopKFromIndex]] from the drained
    * [[graft.operators.TxVectorStack]] (codes + quantizer from one
    * pinned cut), and the fuse is rank arithmetic over two
    * query-sized frames — the complete production deployment: every
    * corpus-sized asset behind an atomic manifest, every query-time
    * read O(query), two metadata files as the whole serve overhead.
    * The oracle is `hybrid_stats_topk`'s verbatim (each leg is
    * bit-equal to its in-flow twin — gated identities — so the fused
    * ranking cannot differ); any torn cut on either stack flips it. */
  /** The hybrid manifest-stack oracle (raw-corpus BM25 ⊕ IVF-ADC, RRF
    * fuse) — shared verbatim by `hybrid_manifest_topk` and the
    * joint-snapshot gate (whose pinned pre-upsert serve must equal
    * exactly this). */
  private[queries] val sqlHybridOracle: String =
    s"""WITH ${Registry12.sqlBm25(20)},
       |${Registry10.sqlPqCodes},
       |qd AS (SELECT q.vec_id AS q_id, js.j AS sub, c.code,
       |    ${Registry10.sqlSubDist("q.embedding", "c.w", "js.j")} AS dist
       |  FROM embeddings q CROSS JOIN js CROSS JOIN cw c
       |  WHERE q.vec_id < 3),
       |${Registry10.sqlIvfAdcRank("codes", "qd")},
       |den AS (SELECT q_id, n_id, rnk FROM r WHERE rnk <= 20),
       |lc AS (SELECT q_id, doc_id AS n_id,
       |    1.0 / (60.0 + CAST(rnk AS DOUBLE)) AS c0 FROM lex),
       |dc AS (SELECT q_id, n_id,
       |    1.0 / (60.0 + CAST(rnk AS DOUBLE)) AS c1 FROM den),
       |fz AS (SELECT COALESCE(l.q_id, r2.q_id) AS q_id,
       |    COALESCE(l.n_id, r2.n_id) AS n_id,
       |    COALESCE(l.c0, 0.0) + COALESCE(r2.c1, 0.0) AS rrf
       |  FROM lc l FULL OUTER JOIN dc r2
       |    ON l.q_id = r2.q_id AND l.n_id = r2.n_id),
       |fr AS (SELECT q_id, n_id, rrf, CAST(ROW_NUMBER() OVER (
       |  PARTITION BY q_id ORDER BY rrf DESC, n_id ASC) AS BIGINT) AS rnk
       |  FROM fz)
       |SELECT q_id, n_id, rnk, rrf FROM fr WHERE rnk <= 10
       |ORDER BY q_id, rnk""".stripMargin

  /** The hybrid serve over BOTH manifest stacks at given version pins
    * — [[hybridManifestTopK]]'s dataflow, parameterized so the
    * joint-snapshot gate can serve a pinned (lexical, vector) cut. */
  private[queries] def hybridManifestServe(s: SparkSession, d: String,
      lexRoot: String, vecRoot: String,
      lexVersion: Option[Long] = None,
      vecVersion: Option[Long] = None): DataFrame = {
    import graft.operators.{Ledger, TxServeStack}
    val qt = Tables.documents(s, d).filter(col("doc_id") < 3)
      .select(col("doc_id").as("q_id"),
        explode(split(col("text"), " ")).as("term"))
    val qBkts = Ledger.keyHashBuckets(qt.select("term").distinct(),
      "term", 16)
    val (postings, stats, global) =
      TxServeStack.resolve(s, lexRoot, statsBuckets = Some(qBkts),
        version = lexVersion)
    val lex = Retrieval.bm25TopKFromStats(qt, postings, stats, global,
        k = 20)
      .select(col("q_id"), col("doc_id").as("n_id"), col("rnk"))
    val (codes, cent, cb) = TxVectorStack.resolve(s, vecRoot,
      version = vecVersion)
    val den = Similarity.ivfPqTopKFromIndex(
        emb(s, d).filter(col("vec_id") < 3), codes, cent, cb,
        "vec_id", "embedding", k = 20, nProbe = 4)
      .select(col("q_id"), col("n_id"), col("rnk"))
    Retrieval.rrfFuse(Seq(lex, den), k = 10)
      .withColumn("rnk", col("rnk").cast("long"))
      .orderBy("q_id", "rnk")
  }

  val hybridManifestTopK = Q("hybrid_manifest_topk",
    sqlHybridOracle) { (s, d) =>
    hybridManifestServe(s, d,
      Registry16.drainTxStack(s, d, "graft_hymftx"),
      drainVectorStack(s, d, "graft_hymfvec"))
  }

  /** The POSITIONAL family under the manifest — the lexical stack's
    * fourth asset ([[graft.operators.TxServeStack.resolvePositions]]),
    * committed in the SAME swap as postings/stats/global so a phrase
    * serve can never see a cut where a document's tf exists but its
    * positions don't (or vice versa). The gate drains four pages WITH
    * positions, then UPSERTS docs ≡ 5 (mod 10) with new text — the
    * shared ordered tombstone retires the old positional rows and the
    * replacements land in the same commit — and serves
    * [[Retrieval.phraseMatch]] (docs 0..2's first-3-term phrases) from
    * the manifest-resolved rows under term-bucket pruning. The oracle
    * replays the exact shifted-base intersection over the UPDATED
    * corpus, so a stale position row, a lost replacement, or a torn
    * postings/positions cut flips occurrence counts. */
  val textPhraseManifest = Q("text_phrase_manifest",
    s"""WITH src AS (SELECT doc_id, CASE WHEN doc_id % 10 = 5
       |    THEN text || ' updated' ELSE text END AS text
       |  FROM documents),
       |pl AS (SELECT doc_id, term, pos FROM (
       |  SELECT d.doc_id, u.i - 1 AS pos, d.parts[u.i] AS term
       |  FROM (SELECT doc_id, string_split(text, ' ') AS parts
       |    FROM src) d,
       |  UNNEST(range(1, len(d.parts) + 1)) AS u(i))
       |  WHERE term <> ''),
       |ph AS (SELECT q_id, idx, term FROM (
       |  SELECT d.doc_id AS q_id, u.i - 1 AS idx, d.parts[u.i] AS term
       |  FROM (SELECT doc_id, string_split(text, ' ') AS parts
       |    FROM src WHERE doc_id < 3) d,
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
    import graft.operators.{Ledger, TxServeStack}
    val root = Registry16.drainTxStack(s, d, "graft_posmft",
      positions = true)
    val up = Tables.documents(s, d).filter(col("doc_id") % 10 === 5)
      .select(col("doc_id"), concat(col("text"), lit(" updated")).as("text"))
    require(TxServeStack.commitUpsert(s, root, up, 4L,
      "doc_id", "text", docBuckets = 16, termBuckets = 16,
      positions = true),
      "the upsert batch must commit on the drained stack")
    val ph = Tables.documents(s, d).filter(col("doc_id") < 3)
      .select(col("doc_id").as("q_id"),
        posexplode(slice(split(col("text"), " "), 1, 3))
          .as(Seq("idx", "term")))
    val phBkts = Ledger.keyHashBuckets(ph.select("term").distinct(),
      "term", 16)
    Retrieval.phraseMatch(ph,
        TxServeStack.resolvePositions(s, root,
          termBuckets = Some(phBkts)))
      .orderBy("q_id", "doc_id")
  }

  /** SNAPSHOT reads on the vector stack: the head moves on (an upsert
    * re-embeds vectors ≡ 5 mod 10), but a reader pinned to the
    * pre-upsert version serves the index EXACTLY as drained — original
    * codes, original membership — concurrent with the new head. The
    * oracle is `ann_index_manifest`'s raw-corpus algebra verbatim
    * (the snapshot must be bit-blind to the upsert), so any leak of
    * post-snapshot state through the pinned read flips the ranking.
    * The BM25 twin is `streaming_stats_snapshot`. */
  val annIndexSnapshot = Q("ann_index_snapshot",
    s"""WITH ${Registry10.sqlPqCodes},
       |qd AS (SELECT q.vec_id AS q_id, js.j AS sub, c.code,
       |    ${Registry10.sqlSubDist("q.embedding", "c.w", "js.j")} AS dist
       |  FROM embeddings q CROSS JOIN js CROSS JOIN cw c
       |  WHERE q.vec_id < 5),
       |${Registry10.sqlIvfAdcRank("codes", "qd")}
       |SELECT q_id, n_id, rnk, adc FROM r WHERE rnk <= 5
       |ORDER BY q_id, rnk""".stripMargin) { (s, d) =>
    val root = drainVectorStack(s, d, "graft_vecsnap")
    val e = emb(s, d)
    val vPre = graft.operators.Manifest.read(s, root).get.version
    val rot = e.filter(col("vec_id") % 10 === 5)
      .select(col("vec_id"), concat(slice(col("embedding"), 33, 32),
        slice(col("embedding"), 1, 32)).as("embedding"))
    require(TxVectorStack.commitUpsert(s, root, rot, 4L,
      "vec_id", "embedding", buckets = 16),
      "the upsert batch must commit so the head moves past the snapshot")
    val (ledger, cent, cb) = TxVectorStack.resolve(s, root,
      version = Some(vPre))
    Similarity.ivfPqTopKFromIndex(
      e.filter(col("vec_id") < 5), ledger, cent, cb,
      "vec_id", "embedding", k = 5, nProbe = 4)
      .withColumn("rnk", col("rnk").cast("long"))
      .orderBy("q_id", "rnk")
  }

  val round17: Seq[Q] = Seq(annIndexManifest, annRefreshManifest,
    streamingStatsDelete, annIndexDelete, streamingVectorIngest,
    streamingStatsUpsert, annIndexUpsert, hybridManifestTopK,
    textPhraseManifest, annIndexSnapshot)
}
