package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.operators.{Retrieval, Similarity}

/** Round-14: the maintenance and quality faces the round-13 verdict
  * prescribed — the positional ledger's takedown witness, proximity
  * (NEAR/w) matching over the same stored positions, the
  * production-shaped ksub=64 PQ codebook under the hash gate, and the
  * graph index's compaction face. Ref: the reference has none of this
  * surface (its queries are aggregate charts,
  * src/jurimetria_pipeline.py:44-296); these are LLM-data-pipeline
  * extension operators. */
object Registry14 {

  private def emb(s: SparkSession, d: String) = Tables.embeddings(s, d)
  private def docs(s: SparkSession, d: String) = Tables.documents(s, d)

  /** The positional-ledger CTE shared by this round's positional
    * gates: raw-split word offsets, empty tokens dropped as terms but
    * never renumbering their neighbors (`text_phrase_match`'s
    * construction), with an optional extra predicate for takedown
    * replay. */
  private def sqlPosLedger(extra: String = ""): String =
    s"""pl AS (SELECT doc_id, term, pos FROM (
       |  SELECT d.doc_id, u.i - 1 AS pos, d.parts[u.i] AS term
       |  FROM (SELECT doc_id, string_split(text, ' ') AS parts
       |    FROM documents) d,
       |  UNNEST(range(1, len(d.parts) + 1)) AS u(i))
       |  WHERE term <> ''$extra)""".stripMargin

  /** The 3-slot phrase frame of docs 0..2 (empty slots dropped before
    * the slot count, the [[Retrieval.phraseMatch]] contract). */
  private def sqlPhrases: String =
    s"""ph AS (SELECT q_id, idx, term FROM (
       |  SELECT d.doc_id AS q_id, u.i - 1 AS idx, d.parts[u.i] AS term
       |  FROM (SELECT doc_id, string_split(text, ' ') AS parts
       |    FROM documents WHERE doc_id < 3) d,
       |  UNNEST(range(1, 4)) AS u(i)) WHERE term <> ''),
       |nt AS (SELECT q_id, COUNT(DISTINCT idx) AS n FROM ph GROUP BY 1)""".stripMargin

  /** The shifted-base phrase intersection CTE over ledger CTE `pl` and
    * phrase CTE `ph` ([[Retrieval.phraseMatch]]'s algebra) — shared by
    * the match/remove gates' final select AND the boost gate's match
    * set, one construction so they can never intersect differently. */
  private def sqlPhraseHitsCte: String =
    s"""hits AS (SELECT p.q_id, l.doc_id, l.pos - p.idx AS base,
       |    COUNT(*) AS k
       |  FROM pl l JOIN ph p ON p.term = l.term
       |  WHERE l.pos - p.idx >= 0
       |  GROUP BY 1, 2, 3)""".stripMargin

  /** [[sqlPhraseHitsCte]] + the all-slots filter and occurrence-count
    * select — the full phrase-match oracle tail. */
  private def sqlPhraseHits: String =
    s"""$sqlPhraseHitsCte
       |SELECT h.q_id, h.doc_id, CAST(COUNT(*) AS BIGINT) AS occurrences
       |FROM hits h JOIN nt ON nt.q_id = h.q_id WHERE h.k = nt.n
       |GROUP BY h.q_id, h.doc_id
       |ORDER BY h.q_id, h.doc_id""".stripMargin

  /** Positional-ledger TAKEDOWN under the gate
    * ([[Retrieval.bm25IndexRemove]] → [[Retrieval.phraseMatch]]):
    * docs 1, 2 and every doc ≥ 200 tombstone out of the stored
    * positional index — one doc_id-keyed anti-join IS the whole repair
    * (positions are per-document facts like tf rows), so
    * remove ≡ from-scratch rebuild of the survivors, which is exactly
    * what the oracle replays (the phrase algebra over the pre-filtered
    * ledger). Removing docs 1 and 2 deletes phrase queries 1 and 2's
    * own self-matches — the takedown is VISIBLE in the hash, not a
    * no-op on unmatched ids. Completes the fourth ledger family's
    * build / append / remove maintenance triple (PQ codes, BM25 tf,
    * dedup clusters all have theirs). */
  val textPhraseIndexRemove = Q("text_phrase_index_remove",
    s"""WITH ${sqlPosLedger(extra =
         " AND NOT (doc_id IN (1, 2) OR doc_id >= 200)")},
       |$sqlPhrases,
       |$sqlPhraseHits""".stripMargin) { (s, d) =>
    val dd = docs(s, d)
    val ledger = Retrieval.positionalIndexBuild(dd, "doc_id", "text")
    val pruned = Retrieval.bm25IndexRemove(ledger,
      dd.filter(col("doc_id").isin(1, 2) || col("doc_id") >= 200)
        .select("doc_id"))
    val ph = dd.filter(col("doc_id") < 3)
      .select(col("doc_id").as("q_id"),
        posexplode(slice(split(col("text"), " "), 1, 3))
          .as(Seq("idx", "term")))
    Retrieval.phraseMatch(ph, pruned)
      .orderBy("q_id", "doc_id")
  }

  /** Proximity (NEAR/3) match under the gate
    * ([[Retrieval.proximityMatch]]): each query is the first three
    * words of docs 0..2 as a term SET, matched when every term falls
    * inside a 3-position window in ANY order — the query class phrase
    * match cannot answer and the one real retrieval users reach for
    * next. The oracle replays the exact existence algebra: matched
    * postings, the anchor-position frame, the within-doc window cover
    * (anchor p covers term t iff t has a position in [p, p+3]), the
    * distinct-term count per anchor, and the all-terms filter — an
    * off-by-one in the window bound or a drift in the anchor
    * definition flips the anchor counts. */
  val textNearMatch = Q("text_near_match",
    s"""WITH ${sqlPosLedger()},
       |qt AS (SELECT DISTINCT q_id, term FROM (
       |  SELECT d.doc_id AS q_id, d.parts[u.i] AS term
       |  FROM (SELECT doc_id, string_split(text, ' ') AS parts
       |    FROM documents WHERE doc_id < 3) d,
       |  UNNEST(range(1, 4)) AS u(i)) WHERE term <> ''),
       |nt AS (SELECT q_id, COUNT(DISTINCT term) AS n FROM qt GROUP BY 1),
       |occ AS (SELECT q.q_id, l.doc_id, l.term, l.pos
       |  FROM pl l JOIN qt q ON q.term = l.term),
       |anc AS (SELECT DISTINCT q_id, doc_id, pos AS base FROM occ),
       |cov AS (SELECT o.q_id, o.doc_id, a.base,
       |    COUNT(DISTINCT o.term) AS k
       |  FROM occ o JOIN anc a ON a.q_id = o.q_id AND a.doc_id = o.doc_id
       |    AND o.pos >= a.base AND o.pos <= a.base + 3
       |  GROUP BY 1, 2, 3)
       |SELECT c.q_id, c.doc_id, CAST(COUNT(*) AS BIGINT) AS anchors
       |FROM cov c JOIN nt ON nt.q_id = c.q_id WHERE c.k = nt.n
       |GROUP BY c.q_id, c.doc_id
       |ORDER BY c.q_id, c.doc_id""".stripMargin) { (s, d) =>
    val dd = docs(s, d)
    val ledger = Retrieval.positionalIndexBuild(dd, "doc_id", "text")
    val qt = dd.filter(col("doc_id") < 3)
      .select(col("doc_id").as("q_id"),
        explode(slice(split(col("text"), " "), 1, 3)).as("term"))
    Retrieval.proximityMatch(qt, ledger, window = 3)
      .orderBy("q_id", "doc_id")
  }

  /** Production-shaped PQ codebook under the hash gate
    * ([[Similarity.pqCodebookSeed]] ksub=64 →
    * [[Similarity.pqTopK]]): the gated PQ family pins ksub=16 for
    * oracle cost, while SCALE.md's measured recall lift lives at the
    * production budget (ksub=256) — this gate closes the gap with a
    * mid-size 64-codeword codebook (seeded, deterministic) whose whole
    * ADC journey runs under the oracle machinery: 4× the codeword
    * range of `ann_pq_topk` through the identical argmin + subspace-
    * order fold + rank algebra, so the budget LEVER itself (more
    * codewords per subspace, same dataflow) is hash-witnessed, not
    * only report-measured. */
  val annPqTopKK64 = Q("ann_pq_topk_k64",
    s"""WITH cw AS (SELECT CAST(vec_id AS INT) AS code, embedding AS w
       |  FROM embeddings WHERE vec_id < 64),
       |js AS (SELECT unnest(range(0, 8)) AS j),
       |cd AS (SELECT b.vec_id AS n_id, js.j AS sub, c.code,
       |    ${Registry10.sqlSubDist("b.embedding", "c.w", "js.j")} AS dist
       |  FROM embeddings b CROSS JOIN js CROSS JOIN cw c),
       |codes AS (SELECT n_id, sub, code FROM (
       |  SELECT n_id, sub, code, ROW_NUMBER() OVER (
       |    PARTITION BY n_id, sub ORDER BY dist ASC, code ASC) AS rn
       |  FROM cd) WHERE rn = 1),
       |qd AS (SELECT q.vec_id AS q_id, js.j AS sub, c.code,
       |    ${Registry10.sqlSubDist("q.embedding", "c.w", "js.j")} AS dist
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
      Similarity.pqCodebookSeed(e, "vec_id", "embedding",
        m = 8, ksub = 64, subDim = 8),
      "vec_id", "embedding", k = 5)
      .withColumn("rnk", col("rnk").cast("long"))
      .orderBy("q_id", "rnk")
  }

  /** Graph COMPACTION under the gate ([[Similarity.graphCompact]]):
    * a tombstone-heavy history — 30% of the pinned 200-node corpus
    * removed — compacts to a fresh k-NN build over the 140 survivors,
    * the periodic rebuild the repair scaladoc defers to
    * (`ann_graph_repair` restores reachability but is honestly not
    * rebuild-parity; compaction clears the residue). The oracle IS the
    * surviving-corpus build replay: pairwise cosine rank over the
    * filtered base, rn ≤ 3 — so the gate hashes the compaction
    * contract itself (compacted ≡ freshly built, no removal-history
    * residue). The RecallReport repaired-vs-compacted rows measure
    * what the parity buys. */
  val annGraphCompact = Q("ann_graph_compact",
    s"""WITH sbase AS (SELECT vec_id, embedding FROM embeddings
       |  WHERE vec_id < 200 AND NOT (vec_id >= 10 AND vec_id < 70)),
       |g AS (SELECT src_id, nbr_id, cs AS cos FROM (
       |  SELECT a.vec_id AS src_id, b.vec_id AS nbr_id,
       |    ${Registry10.sqlCos("a.embedding", "b.embedding")} AS cs,
       |    ROW_NUMBER() OVER (PARTITION BY a.vec_id
       |    ORDER BY ${Registry10.sqlCos("a.embedding", "b.embedding")} DESC,
       |      b.vec_id ASC) AS rn
       |  FROM sbase a JOIN sbase b ON a.vec_id <> b.vec_id) WHERE rn <= 3)
       |SELECT src_id, nbr_id, cos FROM g
       |ORDER BY src_id, nbr_id""".stripMargin) { (s, d) =>
    val e = emb(s, d).filter(col("vec_id") < 200)
    val cent = e.filter(col("vec_id") === 0)
      .select(lit(0).cast("int").as("cell"), col("embedding").as("c_vec"))
    val removals = e.filter(col("vec_id") >= 10 && col("vec_id") < 70)
      .select("vec_id")
    Similarity.graphCompact(e, removals, cent, "vec_id", "embedding", k = 3)
      .select("src_id", "nbr_id", "cos")
      .orderBy("src_id", "nbr_id")
  }

  /** ORDERED proximity (phrase-with-slop) under the gate
    * ([[Retrieval.orderedNearMatch]]): docs 0..2's first three words
    * must appear in PHRASE ORDER with total span ≤ 3 — at most one
    * intervener across the whole phrase — the Lucene sloppy-ordered
    * middle ground between `text_phrase_match` (adjacency) and
    * `text_near_match` (order-free). The oracle unrolls the exact
    * greedy chain: slot-0 anchors, then per slot the MIN position
    * strictly after the previous slot's within [p0, p0+3] — the
    * exchange argument makes greedy-completion ≡ any-chain-exists, so
    * a drift in the strictness, the window bound, or the greedy pick
    * flips the anchor counts. */
  val textNearOrdered = Q("text_near_ordered",
    s"""WITH ${sqlPosLedger()},
       |$sqlPhrases,
       |ord AS (SELECT q_id, idx, term, ROW_NUMBER() OVER (
       |    PARTITION BY q_id ORDER BY idx) - 1 AS o
       |  FROM (SELECT DISTINCT q_id, idx, term FROM ph)),
       |occ AS (SELECT p.q_id, l.doc_id, p.o, l.pos
       |  FROM pl l JOIN ord p ON p.term = l.term),
       |f0 AS (SELECT q_id, doc_id, pos AS p0, pos AS last
       |  FROM occ WHERE o = 0),
       |f1 AS (SELECT f.q_id, f.doc_id, f.p0, MIN(s.pos) AS last
       |  FROM f0 f JOIN occ s ON s.q_id = f.q_id AND s.doc_id = f.doc_id
       |    AND s.o = 1 AND s.pos > f.last AND s.pos <= f.p0 + 3
       |  GROUP BY 1, 2, 3),
       |f2 AS (SELECT f.q_id, f.doc_id, f.p0, MIN(s.pos) AS last
       |  FROM f1 f JOIN occ s ON s.q_id = f.q_id AND s.doc_id = f.doc_id
       |    AND s.o = 2 AND s.pos > f.last AND s.pos <= f.p0 + 3
       |  GROUP BY 1, 2, 3)
       |SELECT q_id, doc_id, CAST(COUNT(*) AS BIGINT) AS anchors
       |FROM f2 GROUP BY 1, 2
       |ORDER BY q_id, doc_id""".stripMargin) { (s, d) =>
    val dd = docs(s, d)
    val ledger = Retrieval.positionalIndexBuild(dd, "doc_id", "text")
    val ph = dd.filter(col("doc_id") < 3)
      .select(col("doc_id").as("q_id"),
        posexplode(slice(split(col("text"), " "), 1, 3))
          .as(Seq("idx", "term")))
    // the oracle unrolls EXACTLY two chain rounds (3 slots per query);
    // assert the fixture property it depends on so a data change fails
    // LOUDLY instead of silently diverging from the operator's
    // early-finish contract (which the spec covers separately)
    val slots = ph.filter(length(col("term")) > 0)
      .groupBy("q_id").agg(countDistinct(col("idx")).as("n"))
      .agg(min("n"), max("n")).head()
    require(slots.getLong(0) == 3 && slots.getLong(1) == 3,
      "text_near_ordered's oracle unrolls 3 slots; the fixture drifted")
    Retrieval.orderedNearMatch(ph, ledger, window = 3)
      .orderBy("q_id", "doc_id")
  }

  /** Phrase-boosted BM25 under the gate
    * ([[Retrieval.phraseBoostTopK]]): the two-signal relevance compose
    * every production search stack ships — BM25 bag-of-words recall
    * with exact-phrase presence as a ×1.5 multiplicative boost, both
    * signals read from STORED assets (the tf ledger and the positional
    * ledger — no second index, no re-tokenize). The oracle composes
    * the two already-proven algebras (the Okapi CTE chain's sc_lex
    * scores, the shifted-base phrase intersection) with the one gated
    * multiply and re-ranks — a drift in either signal or in the boost
    * arithmetic flips the fused ranking. */
  val textPhraseBoostTopK = Q("text_phrase_boost_topk",
    s"""WITH ${Registry12.sqlBm25(10)},
       |${sqlPosLedger()},
       |$sqlPhrases,
       |$sqlPhraseHitsCte,
       |pm AS (SELECT h.q_id, h.doc_id
       |  FROM hits h JOIN nt ON nt.q_id = h.q_id WHERE h.k = nt.n
       |  GROUP BY h.q_id, h.doc_id),
       |bs AS (SELECT s.q_id, s.doc_id,
       |    CASE WHEN pm.doc_id IS NOT NULL THEN s.score * 1.5
       |         ELSE s.score END AS score
       |  FROM sc_lex s LEFT JOIN pm
       |    ON pm.q_id = s.q_id AND pm.doc_id = s.doc_id),
       |rb AS (SELECT q_id, doc_id, score, CAST(ROW_NUMBER() OVER (
       |  PARTITION BY q_id ORDER BY score DESC, doc_id ASC) AS BIGINT) AS rnk
       |  FROM bs)
       |SELECT q_id, doc_id, rnk, score FROM rb WHERE rnk <= 10
       |ORDER BY q_id, rnk""".stripMargin) { (s, d) =>
    val dd = docs(s, d)
    val tfLedger = Retrieval.bm25IndexBuild(dd, "doc_id", "text")
    val posLedger = Retrieval.positionalIndexBuild(dd, "doc_id", "text")
    val qt = dd.filter(col("doc_id") < 3)
      .select(col("doc_id").as("q_id"),
        explode(split(col("text"), " ")).as("term"))
    val ph = dd.filter(col("doc_id") < 3)
      .select(col("doc_id").as("q_id"),
        posexplode(slice(split(col("text"), " "), 1, 3))
          .as(Seq("idx", "term")))
    Retrieval.phraseBoostTopK(qt, ph, tfLedger, posLedger, k = 10,
      boost = 1.5)
      .withColumn("rnk", col("rnk").cast("long"))
      .orderBy("q_id", "rnk")
  }

  /** STREAMING positional-index ingest — the FOURTH ledger family's
    * arrival face, completing the quadruple (`streaming_index_ingest`
    * PQ codes, `streaming_bm25_ingest` tf rows,
    * `streaming_graph_ingest` graph edges, now positions): document
    * pages as file-source micro-batches, each appending its
    * [[Retrieval.positionalIndexAppend]] `deltaOnly` rows after the id
    * anti-join (pages overlap by 10 docs — at-least-once replay,
    * absorbed). Positions are per-document facts, so the drained
    * ledger is arrival-order-independent and the gate asserts the
    * strongest form: it equals the from-scratch positional build of
    * the whole corpus. Positions leave both engines as comma-joined
    * strings (the q14 array convention). O(touched) on both sides:
    * delta-append writes, and the anti-join read leg bucket-pruned via
    * [[graft.operators.Ledger.prunedToBatch]] over the
    * pmod(doc_id, B)-partitioned ledger. */
  val streamingPositionalIngest = Q("streaming_positional_ingest",
    """SELECT doc_id, term,
      |  array_to_string(list(pos ORDER BY pos), ',') AS positions
      |FROM (SELECT d.doc_id, u.i - 1 AS pos, d.parts[u.i] AS term
      |  FROM (SELECT doc_id, string_split(text, ' ') AS parts
      |    FROM documents) d,
      |  UNNEST(range(1, len(d.parts) + 1)) AS u(i))
      |WHERE term <> ''
      |GROUP BY doc_id, term
      |ORDER BY doc_id, term""".stripMargin) { (s, d) =>
    val dcs = docs(s, d)
    val n = dcs.count()
    // the SAME quartered page fixture streaming_bm25_ingest uses
    // (identical key + builder → one cached copy serves both drains)
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
    val stage = StreamHarness.runDir("graft_posidx")
    val ledgerDir = stage.resolve("ledger").toString
    // bucket-partitioned on pmod(doc_id, B): O(touched) anti-join reads
    val nBkt = 16
    import org.apache.spark.sql.types._
    val ledgerSchema = StructType(Seq(StructField("doc_id", LongType),
      StructField("term", StringType),
      StructField("positions", ArrayType(IntegerType)),
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
        Retrieval.positionalIndexAppend(stored, b, "doc_id", "text",
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
      .select(col("doc_id"), col("term"),
        array_join(col("positions"), ",").as("positions"))
      .orderBy("doc_id", "term")
  }

  /** Semantic near-dup CLUSTERS — the SemDeDup keep/drop decision
    * face: [[Similarity.semanticPqPairs]]' PQ-prefix-blocked cosine
    * pairs closed under transitivity
    * ([[graft.operators.Dedup.connectedComponents]] min-label
    * propagation), every vector labeled with its component's smallest
    * id (singletons label themselves) — `dedup_clusters`' posture with
    * the lexical MinHash signal swapped for the embedding signal, so
    * the semantic family now has the same pairs → clusters →
    * keep/drop chain the MinHash family ships. The oracle composes the
    * two already-proven algebras: `dedup_pq_semantic`'s block + confirm
    * CTEs and `dedup_clusters`' recursive closure. */
  val dedupSemanticClusters = Q("dedup_semantic_clusters",
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
       |lbl AS (SELECT id, MIN(r) AS cl FROM reach GROUP BY id)
       |SELECT b.vec_id, COALESCE(l.cl, b.vec_id) AS cluster_id
       |FROM embeddings b LEFT JOIN lbl l ON b.vec_id = l.id
       |ORDER BY b.vec_id""".stripMargin) { (s, d) =>
    import graft.operators.Dedup
    val e = emb(s, d)
    val cb = Similarity.pqCodebookSeed(e, "vec_id", "embedding",
      m = 8, ksub = 16, subDim = 8)
    val pairs = Similarity.semanticPqPairs(e, cb, "vec_id", "embedding",
      threshold = 0.3, prefix = 2)
    val cc = Dedup.connectedComponents(pairs, "a_id", "b_id")
    e.select("vec_id")
      .join(cc, e("vec_id") === cc("id"), "left")
      .select(col("vec_id"),
        coalesce(col("cluster"), col("vec_id")).as("cluster_id"))
      .orderBy("vec_id")
  }

  /** FILTERED vector search over the stored IVF-PQ ledger
    * ([[Similarity.pqIndexBuild]] → label semi-join →
    * [[Similarity.ivfPqTopKFromIndex]]): only corpus vectors whose
    * metadata passes the predicate (label < 5, ~half the corpus) may
    * be returned — the production "vector search WHERE …" face every
    * deployed ANN service needs (tenancy, language, license filters).
    * Composed as a pre-scan restriction of the code ledger: the
    * predicate prunes ledger ROWS before any ADC runs (at scale, a
    * partition/zone-map prune on the stored ledger), the routing and
    * scoring algebra untouched — restriction changes the candidate
    * set, never the scoring (the `ivfSqTopK` argument). The oracle
    * composes `ann_ivf_pq_topk`'s routing + ADC chain with the label
    * join on the candidate set. */
  val annFilteredIndexedTopK = Q("ann_filtered_indexed_topk",
    s"""WITH ${Registry10.sqlPqCodes},
       |qd AS (SELECT q.vec_id AS q_id, js.j AS sub, c.code,
       |    ${Registry10.sqlSubDist("q.embedding", "c.w", "js.j")} AS dist
       |  FROM embeddings q CROSS JOIN js CROSS JOIN cw c
       |  WHERE q.vec_id < 5),
       |${Registry10.sqlIvfAdcRank("codes", "qd", candJoin =
         "JOIN embeddings lb ON lb.vec_id = a.n_id AND lb.label < 5")}
       |SELECT q_id, n_id, rnk, adc FROM r WHERE rnk <= 5
       |ORDER BY q_id, rnk""".stripMargin) { (s, d) =>
    val (e, cent, cb) = Registry10.ivfPqSparkInputs(s, d)
    val ledger = Similarity.pqIndexBuild(e, cent, cb, "vec_id", "embedding")
    val allowed = e.filter(col("label") < 5).select("vec_id")
    Similarity.ivfPqTopKFromIndex(e.filter(col("vec_id") < 5),
      ledger.join(allowed, Seq("vec_id"), "left_semi"), cent, cb,
      "vec_id", "embedding", k = 5, nProbe = 4)
      .withColumn("rnk", col("rnk").cast("long"))
      .orderBy("q_id", "rnk")
  }

  /** Weighted linear hybrid fusion under the gate
    * ([[Retrieval.linearFuse]]): BM25 top-20 (stored tf ledger) ⊕
    * exact-cosine top-20, each min-max normalized PER QUERY to [0, 1]
    * and combined 0.5/0.5 — [[Retrieval.rrfFuse]]'s calibrated
    * sibling, keeping score SHAPE where RRF keeps only rank. The
    * oracle replays the per-side extrema, the degenerate-list guard
    * (max = min → 1.0), the normalization divide, the weighted
    * fixed-order sum with absent-side 0, and the fused re-rank — a
    * drift in any normalization or the combine order flips the
    * ranking. */
  val hybridLinearTopK = Q("hybrid_linear_topk",
    s"""WITH ${Registry12.sqlBm25(20)},
       |dcs AS (SELECT q.vec_id AS q_id, c.vec_id AS n_id,
       |    ${Registry10.sqlCos("q.embedding", "c.embedding")} AS score
       |  FROM embeddings q JOIN embeddings c ON q.vec_id <> c.vec_id
       |  WHERE q.vec_id < 3),
       |den AS (SELECT q_id, n_id, score FROM (
       |  SELECT q_id, n_id, score, ROW_NUMBER() OVER (
       |    PARTITION BY q_id ORDER BY score DESC, n_id ASC) AS rnk
       |  FROM dcs) WHERE rnk <= 20),
       |lex2 AS (SELECT q_id, doc_id AS n_id, score FROM lex),
       |lst AS (SELECT q_id, MIN(score) AS mn, MAX(score) AS mx
       |  FROM lex2 GROUP BY 1),
       |dst AS (SELECT q_id, MIN(score) AS mn, MAX(score) AS mx
       |  FROM den GROUP BY 1),
       |lc AS (SELECT l.q_id, l.n_id,
       |    (CASE WHEN st.mx > st.mn THEN (l.score - st.mn) / (st.mx - st.mn)
       |          ELSE 1.0 END) * 0.5 AS c0
       |  FROM lex2 l JOIN lst st USING (q_id)),
       |dc AS (SELECT d2.q_id, d2.n_id,
       |    (CASE WHEN st.mx > st.mn THEN (d2.score - st.mn) / (st.mx - st.mn)
       |          ELSE 1.0 END) * 0.5 AS c1
       |  FROM den d2 JOIN dst st USING (q_id)),
       |fz AS (SELECT COALESCE(l.q_id, r2.q_id) AS q_id,
       |    COALESCE(l.n_id, r2.n_id) AS n_id,
       |    COALESCE(l.c0, 0.0) + COALESCE(r2.c1, 0.0) AS fused
       |  FROM lc l FULL OUTER JOIN dc r2
       |    ON l.q_id = r2.q_id AND l.n_id = r2.n_id),
       |fr AS (SELECT q_id, n_id, fused, CAST(ROW_NUMBER() OVER (
       |  PARTITION BY q_id ORDER BY fused DESC, n_id ASC) AS BIGINT) AS rnk
       |  FROM fz)
       |SELECT q_id, n_id, rnk, fused FROM fr WHERE rnk <= 10
       |ORDER BY q_id, rnk""".stripMargin) { (s, d) =>
    val dd = docs(s, d)
    val e = emb(s, d)
    val tfLedger = Retrieval.bm25IndexBuild(dd, "doc_id", "text")
    val qt = dd.filter(col("doc_id") < 3)
      .select(col("doc_id").as("q_id"),
        explode(split(col("text"), " ")).as("term"))
    val lex = Retrieval.bm25TopKFromIndex(qt, tfLedger, k = 20)
      .select(col("q_id"), col("doc_id").as("n_id"), col("rnk"),
        col("score"))
    val den = Similarity.bruteForceTopK(e.filter(col("vec_id") < 3), e,
      "vec_id", "embedding", k = 20)
      .select(col("q_id"), col("n_id"), col("rnk"), col("cos").as("score"))
    Retrieval.linearFuse(Seq((lex, 0.5), (den, 0.5)), k = 10)
      .withColumn("rnk", col("rnk").cast("long"))
      .orderBy("q_id", "rnk")
  }

  /** Perceptual-hash media CLUSTERS — the keep/drop decision face for
    * the MULTIMODAL near-dup signal, completing the symmetry round-14
    * gave the embedding signal (`dedup_semantic_clusters`): every
    * media-signal family now runs the same pairs → connected
    * components → smallest-id label chain the lexical MinHash family
    * established. The oracle composes `multimodal_phash_pairs`' shared
    * signature/banding/Hamming CTEs with the recursive closure. */
  val multimodalPhashClusters = Q("multimodal_phash_clusters",
    s"""WITH RECURSIVE ${Registry12.sqlPhashHam},
       |prs AS (SELECT a_id, b_id FROM h WHERE ham <= 8),
       |edges AS (SELECT a_id AS s, b_id AS t FROM prs
       |  UNION SELECT b_id, a_id FROM prs),
       |reach(id, r) AS (
       |  SELECT s, s FROM edges
       |  UNION
       |  SELECT e.s, reach.r FROM edges e JOIN reach ON reach.id = e.t),
       |lbl AS (SELECT id, MIN(r) AS cl FROM reach GROUP BY id)
       |SELECT d.doc_id AS id, COALESCE(l.cl, d.doc_id) AS cluster_id
       |FROM documents d LEFT JOIN lbl l ON d.doc_id = l.id
       |ORDER BY id""".stripMargin) { (s, d) =>
    import s.implicits._
    import graft.operators.{Dedup, Multimodal}
    val records = docs(s, d).select(col("doc_id").as("id"), col("text"))
      .as[(Long, String)]
      .map { case (id, text) =>
        Multimodal.MediaRecord(id, "text", text.getBytes("UTF-8"))
      }
    val sigs = Multimodal.perceptualHash(records).toDF()
    val pairs = Multimodal.phashPairs(sigs, maxHamming = 8)
    val cc = Dedup.connectedComponents(pairs, "a_id", "b_id")
    docs(s, d).select(col("doc_id"))
      .join(cc, col("doc_id") === cc("id"), "left")
      .select(col("doc_id").as("id"),
        coalesce(col("cluster"), col("doc_id")).as("cluster_id"))
      .orderBy("id")
  }

  /** Query-likelihood (Dirichlet-smoothed) lexical ranking under the
    * gate ([[Retrieval.lmTopKFromIndex]], Zhai & Lafferty): the second
    * classical probabilistic scorer, served from the SAME stored tf
    * ledger BM25 reads — one ledger, two ranking models. The oracle
    * replays the rank-equivalent rational decomposition exactly:
    * matched-term factors 1 + tf·T/(μ·cf) folded in term order, the
    * in-vocabulary distinct-term count n_q, and the length penalty
    * (μ/(dl+μ))^{n_q} as an explicit n_q-step multiply fold (`pow` is
    * libm and not cross-engine stable; a fold of IEEE multiplies is). */
  val textLmTopK = Q("text_lm_topk",
    s"""WITH ${Registry12.sqlBm25(20)},
       |cfq AS (SELECT term, CAST(SUM(tf) AS BIGINT) AS cf FROM tf
       |  GROUP BY 1),
       |tt AS (SELECT CAST(SUM(tf) AS BIGINT) AS t FROM tf),
       |nql AS (SELECT q.q_id, COUNT(*) AS nq FROM qt q
       |  JOIN cfq USING (term) GROUP BY 1),
       |mp AS (SELECT q.q_id, tf.doc_id,
       |    list_reduce(list_prepend(1.0, list(
       |      1.0 + (CAST(tf.tf AS DOUBLE) * CAST(tt.t AS DOUBLE))
       |        / (1000.0 * CAST(f.cf AS DOUBLE)) ORDER BY tf.term)),
       |      (x, y) -> x * y) AS mprod
       |  FROM tf JOIN qt q USING (term) JOIN cfq f USING (term)
       |  CROSS JOIN tt
       |  GROUP BY 1, 2),
       |scl AS (SELECT m.q_id, m.doc_id, m.mprod * list_reduce(
       |    list_prepend(1.0, list_transform(range(1, n.nq + 1),
       |      x -> 1000.0 / (CAST(dl.dl AS DOUBLE) + 1000.0))),
       |    (x, y) -> x * y) AS score
       |  FROM mp m JOIN dl ON dl.doc_id = m.doc_id
       |  JOIN nql n ON n.q_id = m.q_id
       |  WHERE m.q_id <> m.doc_id),
       |rl AS (SELECT q_id, doc_id, score, CAST(ROW_NUMBER() OVER (
       |  PARTITION BY q_id ORDER BY score DESC, doc_id ASC) AS BIGINT)
       |  AS rnk FROM scl)
       |SELECT q_id, doc_id, rnk, score FROM rl WHERE rnk <= 10
       |ORDER BY q_id, rnk""".stripMargin) { (s, d) =>
    val dd = docs(s, d)
    val tfLedger = Retrieval.bm25IndexBuild(dd, "doc_id", "text")
    val qt = dd.filter(col("doc_id") < 3)
      .select(col("doc_id").as("q_id"),
        explode(split(col("text"), " ")).as("term"))
    Retrieval.lmTopKFromIndex(qt, tfLedger, k = 10, mu = 1000.0)
      .withColumn("rnk", col("rnk").cast("long"))
      .orderBy("q_id", "rnk")
  }

  /** Best-window (snippet) election under the gate
    * ([[Retrieval.bestWindow]]): for each query × matching doc, the
    * 4-position span covering the most distinct query terms, earliest
    * span on ties — the highlight a result page renders and the span
    * weak supervision mines, computed by the same range-frame plane
    * sweep `text_near_match` uses with an argmax instead of an
    * all-terms filter. The oracle replays the cover counts (via the
    * quadratic join form — oracle cost, not engine cost) and the
    * (count desc, start asc) election. */
  val textBestWindow = Q("text_best_window",
    s"""WITH ${sqlPosLedger()},
       |qtw AS (SELECT DISTINCT q_id, term FROM (
       |  SELECT d.doc_id AS q_id, d.parts[u.i] AS term
       |  FROM (SELECT doc_id, string_split(text, ' ') AS parts
       |    FROM documents WHERE doc_id < 3) d,
       |  UNNEST(range(1, 4)) AS u(i)) WHERE term <> ''),
       |occ AS (SELECT q.q_id, l.doc_id, l.term, l.pos
       |  FROM pl l JOIN qtw q ON q.term = l.term),
       |cov AS (SELECT o.q_id, o.doc_id, a.pos AS p,
       |    COUNT(DISTINCT o.term) AS k
       |  FROM occ o JOIN (SELECT DISTINCT q_id, doc_id, pos FROM occ) a
       |    ON a.q_id = o.q_id AND a.doc_id = o.doc_id
       |    AND o.pos >= a.pos AND o.pos <= a.pos + 3
       |  GROUP BY 1, 2, 3),
       |wn AS (SELECT q_id, doc_id, p, k, ROW_NUMBER() OVER (
       |  PARTITION BY q_id, doc_id ORDER BY k DESC, p ASC) AS r FROM cov)
       |SELECT q_id, doc_id, p AS win_start, CAST(k AS BIGINT) AS win_terms
       |FROM wn WHERE r = 1
       |ORDER BY q_id, doc_id""".stripMargin) { (s, d) =>
    val dd = docs(s, d)
    val ledger = Retrieval.positionalIndexBuild(dd, "doc_id", "text")
    val qt = dd.filter(col("doc_id") < 3)
      .select(col("doc_id").as("q_id"),
        explode(slice(split(col("text"), " "), 1, 3)).as("term"))
    Retrieval.bestWindow(qt, ledger, window = 3)
      .withColumn("win_start", col("win_start").cast("long"))
      .orderBy("q_id", "doc_id")
  }

  /** Quality-aware near-dup survivor selection under the gate
    * ([[graft.operators.Dedup.keepBestPerCluster]]): `dedup_survivors`
    * keeps the smallest id per exact-dup group (cheap, arbitrary);
    * production curation keeps the CLEANEST member — here the MinHash
    * near-dup clusters (`dedup_clusters`' labeling, shared CTE) elect
    * the member with the highest `text_quality` composite (shared
    * CTE), ties to the smaller id, singletons surviving
    * unconditionally. The oracle composes the two already-proven
    * chains with one rank window — scoring drift OR clustering drift
    * flips the survivor set. */
  val dedupSurvivorsQuality = Q("dedup_survivors_quality",
    s"""WITH RECURSIVE ${Registry3.sqlMinhashCc},
       |${RegistryExt.sqlQualityCte},
       |al AS (SELECT d.doc_id, COALESCE(l.cl, d.doc_id) AS cl, qy.quality
       |  FROM documents d LEFT JOIN lbl l ON d.doc_id = l.id
       |  JOIN qy ON qy.doc_id = d.doc_id),
       |rk AS (SELECT doc_id, cl, quality, ROW_NUMBER() OVER (
       |  PARTITION BY cl ORDER BY quality DESC, doc_id ASC) AS rn FROM al)
       |SELECT doc_id, quality FROM rk WHERE rn = 1
       |ORDER BY doc_id""".stripMargin) { (s, d) =>
    import graft.operators.Dedup
    import graft.functions.TextFns
    val dd = docs(s, d)
    val pairs = Dedup.minhashCandidates(dd, "doc_id", "text")
    val cc = Dedup.connectedComponents(pairs, "a_id", "b_id")
    Dedup.keepBestPerCluster(dd, "doc_id", cc,
      TextFns.qualityScore(col("text")), scoreOut = "quality")
      .select("doc_id", "quality")
      .orderBy("doc_id")
  }

  /** TRAINED ksub=64 product quantization under the gate
    * ([[Similarity.pqCodebookSeed]] ksub=64 →
    * [[Similarity.pqCodebookTrain]] 2 Lloyd steps →
    * [[Similarity.pqEncode]]): `ann_pq_topk_k64` put the
    * production-shaped codebook WIDTH under the hash gate; this puts
    * its TRAINING there too — two full Lloyd steps (fixed-point-exact
    * means, COALESCE for unwon codewords, re-encode) at the 64-way
    * alphabet, the shape SCALE.md's recall table measures at
    * ksub=256. The oracle chains the same per-subspace step algebra
    * as `ann_pq_trained_fix` with the wider codeword range. */
  val annPqTrainedK64 = Q("ann_pq_trained_k64",
    s"""WITH ${Registry13.sqlPqW8Seed(ksub = 64)},
       |${Registry13.sqlPqLloydStep("codes0", "cw0", 1)},
       |${Registry13.sqlPqLloydStep("codes1", "cw1", 2)}
       |SELECT n_id AS vec_id,
       |  array_to_string(list(CAST(code AS INT) ORDER BY sub), ',') AS codes,
       |  list_reduce(list_prepend(0.0, list(dist ORDER BY sub)),
       |    (x, y) -> x + y) AS err
       |FROM codes2 GROUP BY n_id ORDER BY vec_id""".stripMargin) { (s, d) =>
    val e = emb(s, d)
    val trained = Similarity.pqCodebookTrain(e,
      Similarity.pqCodebookSeed(e, "vec_id", "embedding",
        m = 8, ksub = 64, subDim = 8),
      "vec_id", "embedding", steps = 2)
    Similarity.pqEncode(e, trained, "vec_id", "embedding")
      .withColumn("codes", array_join(col("codes"), ","))
      .orderBy("vec_id")
  }

  val round14: Seq[Q] =
    Seq(textPhraseIndexRemove, textNearMatch, annPqTopKK64, annGraphCompact,
      textNearOrdered, textPhraseBoostTopK, streamingPositionalIngest,
      dedupSemanticClusters, annFilteredIndexedTopK, hybridLinearTopK,
      multimodalPhashClusters, textLmTopK, textBestWindow,
      dedupSurvivorsQuality, annPqTrainedK64)
}
