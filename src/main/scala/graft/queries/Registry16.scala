package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.operators.{Ledger, Retrieval}

/** Round-15 serve-side additions: the O(query) BM25 serve law. The
  * round's drains made every ledger WRITE and ingest-read O(touched);
  * this family closes the remaining corpus-sized step — the serve
  * itself. [[Retrieval.bm25ScoresFromIndex]] re-derives dl/df/N/Σdl
  * from the whole tf ledger per query batch (three corpus-sized
  * aggregates + a full posting scan); the production shape stores the
  * norm in the posting row (Lucene's norms design), keeps df/cf in an
  * incrementally-maintained vocabulary-sized stats ledger with the
  * same build/append/remove triple every other ledger family has, and
  * term-buckets the posting layout so a serve reads only its query
  * terms' buckets. Plus the takedown face of the bucket discipline:
  * removals rewrite only the buckets they touch.
  *
  * Reference (jurimetria-etl) has no retrieval surface; these are the
  * LLM-training-data extensions (brief §"Beyond the reference").
  */
object Registry16 {

  private def docs(s: SparkSession, d: String) = Tables.documents(s, d)
  private def emb(s: SparkSession, d: String) = Tables.embeddings(s, d)

  /** DuckDB left-fold dot/cosine over the FIRST n components — the
    * prefix-space twin of Registry10.sqlCos (same fold order as
    * [[graft.functions.VectorFns.dotN]] over a sliced array). */
  private def sqlDotN(a: String, b: String, n: Int): String =
    s"""list_reduce(list_prepend(0.0, list_transform(range(1, ${n + 1}),
       |    i -> CAST($a[i] AS DOUBLE) * CAST($b[i] AS DOUBLE))), (x, y) -> x + y)""".stripMargin
  private def sqlCosN(a: String, b: String, n: Int): String =
    s"""(${sqlDotN(a, b, n)} / (sqrt(${sqlDotN(a, a, n)}) * sqrt(${sqlDotN(b, b, n)})))"""

  /** Shared stats-oracle algebra: tf/df/cf/dl/N/Σdl over the raw
    * space-split corpus restricted by `where` — the exact DuckDB
    * replay of [[Retrieval.bm25IndexBuild]] →
    * [[Retrieval.bm25TermStatsBuild]] ⊗ [[Retrieval.bm25GlobalStatsBuild]]. */
  private def sqlStats(where: String): String =
    s"""toks AS (SELECT doc_id, term FROM (
       |  SELECT doc_id, unnest(string_split(text, ' ')) AS term
       |  FROM documents WHERE $where) WHERE term <> ''),
       |tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM toks GROUP BY 1, 2),
       |st AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS df,
       |    CAST(SUM(tf) AS BIGINT) AS cf FROM tf GROUP BY 1),
       |dl AS (SELECT doc_id, COUNT(*) AS dl FROM toks GROUP BY 1),
       |g AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
       |    CAST(SUM(dl) AS BIGINT) AS sum_dl FROM dl)""".stripMargin

  // ------------------------------------------------- stats ledger triple

  /** The BM25 statistics ledgers under the gate
    * ([[Retrieval.bm25TermStatsBuild]] +
    * [[Retrieval.bm25GlobalStatsBuild]]): per-term df/cf and the 1-row
    * N/Σdl, built from the tf ledger — the cross-document aggregates a
    * serve must NOT re-derive per query. The oracle computes the same
    * statistics from the raw corpus directly; the global scalars ride
    * every row via a 1-row cross join so one gate pins both frames. */
  val textIndexStats = Q("text_index_stats",
    s"""WITH ${sqlStats("TRUE")}
       |SELECT term, df, cf, n_docs, sum_dl
       |FROM st CROSS JOIN g ORDER BY term""".stripMargin) { (s, d) =>
    val ledger = Retrieval.bm25IndexBuild(docs(s, d), "doc_id", "text")
    Retrieval.bm25TermStatsBuild(ledger)
      .crossJoin(broadcast(Retrieval.bm25GlobalStatsBuild(ledger)))
      .orderBy("term")
  }

  /** The stats ledgers' ARRIVAL face ([[Retrieval.bm25TermStatsAppend]]
    * + [[Retrieval.bm25GlobalStatsAppend]]): stats built over the base
    * corpus (doc_id % 10 ≠ 7), then the held-out batch's append DELTA
    * (the anti-joined `deltaOnly` tf rows — the contract that makes
    * the increment exact) folds in: batch terms merge old ⊕ batch
    * (unseen terms mint rows), untouched terms pass through, the
    * global row gains the batch's doc/token counts by integer adds.
    * The oracle computes full-corpus stats from scratch — incremental
    * ≡ rebuild, the same identity every ledger family gates. */
  val textIndexStatsAppend = Q("text_index_stats_append",
    s"""WITH ${sqlStats("TRUE")}
       |SELECT term, df, cf, n_docs, sum_dl
       |FROM st CROSS JOIN g ORDER BY term""".stripMargin) { (s, d) =>
    val dcs = docs(s, d)
    val base = dcs.filter(col("doc_id") % 10 =!= 7)
    val batch = dcs.filter(col("doc_id") % 10 === 7)
    val l0 = Retrieval.bm25IndexBuild(base, "doc_id", "text")
    val delta = Retrieval.bm25IndexAppend(l0, batch, "doc_id", "text",
      deltaOnly = true)
    Retrieval.bm25TermStatsAppend(Retrieval.bm25TermStatsBuild(l0), delta)
      .crossJoin(broadcast(Retrieval.bm25GlobalStatsAppend(
        Retrieval.bm25GlobalStatsBuild(l0), delta)))
      .orderBy("term")
  }

  /** The stats ledgers' TAKEDOWN face ([[Retrieval.bm25TermStatsRemove]]
    * + [[Retrieval.bm25GlobalStatsRemove]]): stats built over the full
    * corpus, then docs ≡ 7 (mod 10) remove — the removed tf rows (read
    * off the posting ledger by a removal-id semi-join, which also
    * makes removing never-indexed ids a no-op) decrement df/cf and the
    * global row; terms whose df reaches 0 drop, so the ledger's rows
    * stay exactly the live vocabulary. Oracle = from-scratch stats of
    * the surviving corpus. */
  val textIndexStatsRemove = Q("text_index_stats_remove",
    s"""WITH ${sqlStats("doc_id % 10 <> 7")}
       |SELECT term, df, cf, n_docs, sum_dl
       |FROM st CROSS JOIN g ORDER BY term""".stripMargin) { (s, d) =>
    val dcs = docs(s, d)
    val ledger = Retrieval.bm25IndexBuild(dcs, "doc_id", "text")
    val removedTf = ledger.join(
      dcs.filter(col("doc_id") % 10 === 7).select("doc_id"),
      Seq("doc_id"), "left_semi")
    Retrieval.bm25TermStatsRemove(
        Retrieval.bm25TermStatsBuild(ledger), removedTf)
      .crossJoin(broadcast(Retrieval.bm25GlobalStatsRemove(
        Retrieval.bm25GlobalStatsBuild(ledger), removedTf)))
      .orderBy("term")
  }

  // ------------------------------------------------- O(query) BM25 serve

  /** The O(query) SERVE under the gate ([[Retrieval.bm25TopKFromStats]]
    * over the full stored layout): the norm-carrying posting ledger
    * ([[Retrieval.withDocNorms]] — dl rides the posting row) and the
    * term-stats ledger are written TERM-BUCKETED
    * (pmod(xxhash64(term), 64), [[Ledger.withHashBucket]]), read back
    * live, and the serve prunes BOTH scans to the query terms' buckets
    * ([[Ledger.prunedToKeys]] — a semantic no-op on the term-equi
    * joins, a literal `bkt IN` partition filter in the plan); df joins
    * from the pruned stats rows, N/Σdl broadcast from the 1-row global
    * ledger. No corpus-sized aggregate and no full posting scan at
    * query time — serve reads are ∝ the query's buckets' occupancy at
    * ANY corpus size. Bit-equal to the full-derivation serve: the
    * oracle is `text_bm25_topk`'s exact chain, which re-derives every
    * statistic from the raw corpus. */
  val textBm25StatsTopK = Q("text_bm25_stats_topk",
    s"""WITH ${Registry12.sqlBm25(10)}
       |SELECT q_id, doc_id, rnk, score FROM lex
       |ORDER BY q_id, rnk""".stripMargin) { (s, d) =>
    val dcs = docs(s, d)
    val ledger = Retrieval.withDocNorms(
      Retrieval.bm25IndexBuild(dcs, "doc_id", "text"))
    val stage = StreamHarness.runDir("graft_statserve")
    val postDir = stage.resolve("postings").toString
    val statsDir = stage.resolve("termstats").toString
    Ledger.withHashBucket(ledger, "term", 64)
      .write.partitionBy("bkt").mode("overwrite").parquet(postDir)
    Ledger.withHashBucket(Retrieval.bm25TermStatsBuild(ledger), "term", 64)
      .write.partitionBy("bkt").mode("overwrite").parquet(statsDir)
    val global = Retrieval.bm25GlobalStatsBuild(ledger)
    val qt = dcs.filter(col("doc_id") < 3)
      .select(col("doc_id").as("q_id"),
        explode(split(col("text"), " ")).as("term"))
    val qterms = qt.select("term").distinct()
    Retrieval.bm25TopKFromStats(qt,
      Ledger.prunedToKeys(s.read.parquet(postDir), qterms, "term", 64),
      Ledger.prunedToKeys(s.read.parquet(statsDir), qterms, "term", 64),
      global, k = 10)
      .withColumn("rnk", col("rnk").cast("long"))
      .orderBy("q_id", "rnk")
  }

  /** Dirichlet query-likelihood from the SAME stats assets
    * ([[Retrieval.lmTopKFromStats]]): one stored layout — norm-carrying
    * term-bucketed postings, the (df, cf) term-stats ledger, the 1-row
    * global — serves BOTH classical lexical scorers (cf is why the
    * stats ledger carries a second column). Same pruned-scan serve
    * shape as `text_bm25_stats_topk`; the oracle is `text_lm_topk`'s
    * exact rational-decomposition replay (term-ordered factor fold,
    * in-vocabulary n_q, explicit n_q-step penalty fold), which derives
    * every statistic from the raw corpus — so a drift anywhere in the
    * stats maintenance or the serve algebra flips the hash. */
  val textLmStatsTopK = Q("text_lm_stats_topk",
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
    val dcs = docs(s, d)
    val ledger = Retrieval.withDocNorms(
      Retrieval.bm25IndexBuild(dcs, "doc_id", "text"))
    val stats = Retrieval.bm25TermStatsBuild(ledger)
    val global = Retrieval.bm25GlobalStatsBuild(ledger)
    val qt = dcs.filter(col("doc_id") < 3)
      .select(col("doc_id").as("q_id"),
        explode(split(col("text"), " ")).as("term"))
    val qterms = qt.select("term").distinct()
    Retrieval.lmTopKFromStats(qt,
      Ledger.prunedToKeys(Ledger.withHashBucket(ledger, "term", 64),
        qterms, "term", 64),
      Ledger.prunedToKeys(Ledger.withHashBucket(stats, "term", 64),
        qterms, "term", 64),
      global, k = 10, mu = 1000.0)
      .withColumn("rnk", col("rnk").cast("long"))
      .orderBy("q_id", "rnk")
  }

  /** STREAMING maintenance of the whole serve stack
    * (`streaming_bm25_ingest`'s drain extended to the stats ledgers —
    * what a search engine's soft-commit does): each micro-batch (1)
    * appends its anti-joined, NORM-carrying posting delta to the
    * doc-bucketed posting ledger, (2) folds the delta into the
    * term-bucketed term-stats ledger by replacing ONLY the batch
    * terms' buckets (pruned read → merge → dynamic bucket overwrite —
    * [[Ledger.overwriteBuckets]]), and (3) increments the 1-row
    * global by integer adds. Page overlaps (at-least-once replay) are
    * absorbed BEFORE the stats fold — the tf delta's anti-join is
    * what makes every downstream increment exact. The gate's output is
    * the O(query) serve ([[Retrieval.bm25TopKFromStats]]) over the
    * drained assets; the oracle derives everything from the raw corpus
    * — streamed-maintained serve ≡ batch truth. (Crash contract: the
    * three storage commits are not atomic, and replay CANNOT heal a
    * crash between them — the delta derivation anti-joins the posting
    * ledger, so once postings committed, the replayed page yields an
    * EMPTY delta and the stats folds absorb nothing. The posting
    * ledger is the single AUTHORITY; df/cf/N/Σdl are derived data
    * whose recovery path is re-derivation from postings
    * ([[Retrieval.bm25TermStatsBuild]] / [[Retrieval.bm25GlobalStatsBuild]]
    * — corpus-sized, paid only on crash recovery, never steady-state).
    * A production deployment closes the window with a transactional
    * table format or a per-asset batch-id high-water mark.) */
  val streamingStatsIngest = Q("streaming_stats_ingest",
    s"""WITH ${Registry12.sqlBm25(10)}
       |SELECT q_id, doc_id, rnk, score FROM lex
       |ORDER BY q_id, rnk""".stripMargin) { (s, d) =>
    val dcs = docs(s, d)
    val fx = bmPagesFixture(s, d)
    val stage = StreamHarness.runDir("graft_statsingest")
    val postDir = stage.resolve("postings").toString
    val statsDir = stage.resolve("termstats").toString
    val globalDir = stage.resolve("global").toString
    val nBkt = 16 // doc buckets (posting anti-join pruning)
    val sBkt = 16 // term-hash buckets (stats overwrite + serve pruning)
    import org.apache.spark.sql.types._
    val postSchema = StructType(Seq(StructField("doc_id", LongType),
      StructField("term", StringType), StructField("tf", LongType),
      StructField("dl", LongType), StructField("bkt", IntegerType)))
    val statsSchema = StructType(Seq(StructField("term", StringType),
      StructField("df", LongType), StructField("cf", LongType),
      StructField("bkt", IntegerType)))
    s.createDataFrame(s.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      postSchema).write.partitionBy("bkt").mode("overwrite").parquet(postDir)
    s.createDataFrame(s.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      statsSchema).write.partitionBy("bkt").mode("overwrite").parquet(statsDir)
    import s.implicits._
    Seq((0L, 0L)).toDF("n_docs", "sum_dl")
      .write.mode("overwrite").parquet(globalDir)
    val stream = s.readStream
      .schema("doc_id LONG, text STRING, lang STRING, source STRING, n_chars LONG")
      .option("maxFilesPerTrigger", "1")
      .parquet(fx.resolve("pages").toString)
    val appendBatch: (DataFrame, Long) => Unit = { (b, _) =>
      val storedTf = graft.operators.Ledger.prunedToBatch(
        s.read.schema(postSchema).parquet(postDir), b, "doc_id", nBkt)
      // lazy: the postings append right below is the first consumer
      // and drains every partition — it materializes the checkpoint;
      // the two overlapped folds then reuse the blocks (guide §2.4)
      val delta = Retrieval.bm25IndexAppend(storedTf, b, "doc_id", "text",
        deltaOnly = true).localCheckpoint(eager = false)
      // 1. postings: norm-carrying delta, parquet append
      graft.operators.Ledger.withBucket(
          Retrieval.withDocNorms(delta), "doc_id", nBkt)
        .write.partitionBy("bkt").mode("append").parquet(postDir)
      // 2 and 3 are BOTH derived data recovered by re-derivation from
      // the (already committed) postings on a crash — their mutual
      // order is not load-bearing, only postings-first is, so the two
      // folds overlap (guide §2.6); each leg reads only the
      // checkpointed delta and its own storage directory
      graft.operators.Par.both({
        // 2. term stats: replace the batch terms' buckets — the pruned
        // stored rows (batch buckets' FULL content) merge the delta;
        // non-batch terms sharing a touched bucket ride through the
        // append's anti-join leg, so the bucket replacement is complete
        val batchTerms = delta.select("term").distinct()
        val replaced = Retrieval.bm25TermStatsAppend(
          graft.operators.Ledger.prunedToKeys(
              s.read.schema(statsSchema).parquet(statsDir),
              batchTerms, "term", sBkt)
            .drop("bkt"), delta)
        graft.operators.Ledger.overwriteBuckets(
          graft.operators.Ledger.withHashBucket(replaced, "term", sBkt)
            // lazy: overwriteBuckets' present collect materializes it
            // BEFORE the dynamic overwrite clears what it read
            .localCheckpoint(eager = false),
          graft.operators.Ledger.keyHashBuckets(batchTerms, "term", sBkt),
          statsDir)
      }, {
        // 3. global: 1-row integer increment, full overwrite
        val g1 = Retrieval.bm25GlobalStatsAppend(
          s.read.parquet(globalDir), delta).localCheckpoint()
        g1.write.mode("overwrite").parquet(globalDir)
      })
    }
    val run = stream.writeStream
      .foreachBatch(appendBatch)
      .option("checkpointLocation", stage.resolve("ckpt").toString)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    run.awaitTermination()
    val qt = dcs.filter(col("doc_id") < 3)
      .select(col("doc_id").as("q_id"),
        explode(split(col("text"), " ")).as("term"))
    val qterms = qt.select("term").distinct()
    // THIS ledger's postings are DOC-bucketed (the ingest anti-join's
    // layout), so term-bucket pruning does not apply to them — the
    // term-pruned posting serve is `text_bm25_stats_topk`'s gate; the
    // stats ledger IS term-bucketed and prunes
    Retrieval.bm25TopKFromStats(qt,
      s.read.schema(postSchema).parquet(postDir),
      Ledger.prunedToKeys(s.read.schema(statsSchema).parquet(statsDir),
        qterms, "term", sBkt),
      s.read.parquet(globalDir), k = 10)
      .withColumn("rnk", col("rnk").cast("long"))
      .orderBy("q_id", "rnk")
  }

  /** Term-bucket-pruned PHRASE serve ([[Retrieval.phraseMatch]] over a
    * TERM-bucketed positional ledger) — the third lexical ledger
    * family under the serve-side O(query) law: the phrase's terms
    * elect hash buckets, the stored positional index reads back under
    * a literal `bkt IN` partition filter, and the shifted-base
    * intersection sees a bit-identical world (every posting a phrase
    * term can match lives in that term's own bucket). Positional
    * ledgers are the heaviest lexical asset (one int per token), so
    * the pruning matters most here. The oracle is `text_phrase_match`'s
    * exact algebra over the raw corpus — any row the pruning wrongly
    * dropped (or kept) flips occurrence counts. */
  val textPhrasePrunedServe = Q("text_phrase_pruned_serve",
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
    val dcs = docs(s, d)
    val stage = StreamHarness.runDir("graft_posserve")
    val dir = stage.resolve("posledger").toString
    Ledger.withHashBucket(
        Retrieval.positionalIndexBuild(dcs, "doc_id", "text"),
        "term", 64)
      .write.partitionBy("bkt").mode("overwrite").parquet(dir)
    val ph = dcs.filter(col("doc_id") < 3)
      .select(col("doc_id").as("q_id"),
        posexplode(slice(split(col("text"), " "), 1, 3))
          .as(Seq("idx", "term")))
    val phTerms = ph.select("term").distinct()
    Retrieval.phraseMatch(ph,
        Ledger.prunedToKeys(s.read.parquet(dir), phTerms, "term", 64))
      .orderBy("q_id", "doc_id")
  }

  // ------------------------------------------- O(touched) bucket takedown

  /** O(touched-bucket) TAKEDOWN under the gate
    * ([[Ledger.removeBucketDelta]]): the tf ledger is stored
    * bucket-partitioned on pmod(doc_id, 64) (the drain families'
    * layout), docs ≡ 0 (mod 7) remove — the removal ids elect buckets,
    * the replacement content is the touched buckets' survivors (pruned
    * read + id anti-join), and dynamic partition-overwrite rewrites
    * JUST those directories; every other bucket holds no removable row
    * and is neither read nor written — where [[Retrieval.bm25IndexRemove]]
    * rewrites the whole ledger. The gate reads the ledger back and
    * pins the full survivor content with its bucket column: any row
    * lost from an untouched bucket, left behind in a touched one, or
    * re-bucketed by the round-trip breaks the hash. */
  val textIndexRemoveBucketed = Q("text_index_remove_bucketed",
    s"""WITH toks AS (SELECT doc_id, term FROM (
       |  SELECT doc_id, unnest(string_split(text, ' ')) AS term
       |  FROM documents WHERE doc_id % 7 <> 0) WHERE term <> ''),
       |tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM toks GROUP BY 1, 2)
       |SELECT doc_id, term, tf, CAST(doc_id % 64 AS INT) AS bkt
       |FROM tf ORDER BY doc_id, term""".stripMargin) { (s, d) =>
    val dcs = docs(s, d)
    val stage = StreamHarness.runDir("graft_rmbkt")
    val dir = stage.resolve("ledger").toString
    Ledger.withBucket(
        Retrieval.bm25IndexBuild(dcs, "doc_id", "text"), "doc_id", 64)
      .write.partitionBy("bkt").mode("overwrite").parquet(dir)
    val removals = dcs.filter(col("doc_id") % 7 === 0).select("doc_id")
    // localCheckpoint materializes the touched-sized replacement frame
    // before the dynamic overwrite clears the directories it read from
    val delta = Ledger.removeBucketDelta(s.read.parquet(dir), removals,
      "doc_id", 64).localCheckpoint()
    Ledger.overwriteBuckets(delta,
      Ledger.batchBuckets(removals, "doc_id", 64), dir)
    s.read.parquet(dir)
      .select(col("doc_id"), col("term"), col("tf"), col("bkt"))
      .orderBy("doc_id", "term")
  }

  /** Bucket COMPACTION under the gate ([[Ledger.compactBuckets]]):
    * an append-drained ledger accumulates one parquet file per batch
    * per touched bucket; the compaction cadence elects the fragmented
    * buckets ([[Ledger.fragmentedBuckets]] — a metadata listing, never
    * data) and rewrites each to ONE file with bit-identical content —
    * the ledger life cycle's fourth face next to build/append/remove
    * (what a table format's OPTIMIZE does, expressed on the raw
    * bucket-partitioned layout). The fixture builds the ledger in
    * four writes (1 build + 3 appends — multiple files per bucket,
    * guarded), compacts, asserts the 1-file-per-bucket postcondition
    * in-query, and hashes the full read-back with its bucket column:
    * any row lost, duplicated, or re-bucketed by the rewrite breaks
    * the gate. The oracle derives the tf content from the raw corpus
    * — compaction must be invisible to every consumer. */
  val textIndexCompact = Q("text_index_compact",
    s"""WITH toks AS (SELECT doc_id, term FROM (
       |  SELECT doc_id, unnest(string_split(text, ' ')) AS term
       |  FROM documents) WHERE term <> ''),
       |tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM toks GROUP BY 1, 2)
       |SELECT doc_id, term, tf, CAST(doc_id % 16 AS INT) AS bkt
       |FROM tf ORDER BY doc_id, term""".stripMargin) { (s, d) =>
    val dcs = docs(s, d)
    val n = dcs.count()
    val stage = StreamHarness.runDir("graft_compact")
    val dir = stage.resolve("ledger").toString
    val cuts = Seq(0L, n / 2, n * 3 / 4, n * 7 / 8, n)
    cuts.init.zip(cuts.tail).zipWithIndex.foreach { case ((lo, hi), i) =>
      Ledger.withBucket(
          Retrieval.bm25IndexBuild(
            dcs.filter(col("doc_id") >= lo && col("doc_id") < hi),
            "doc_id", "text"), "doc_id", 16)
        .write.partitionBy("bkt")
        .mode(if (i == 0) "overwrite" else "append").parquet(dir)
    }
    val frag = Ledger.fragmentedBuckets(s, dir, maxFiles = 1)
    require(frag.nonEmpty,
      "fixture must fragment: 4 writes should leave >1 file somewhere")
    Ledger.compactBuckets(s, dir, frag)
    val after = Ledger.bucketFileCounts(s, dir)
    require(after.nonEmpty && after.forall { case (b, nf) =>
      nf <= 1 || !frag.contains(b) },
      s"compacted buckets must hold exactly one file, got $after")
    s.read.parquet(dir)
      .select(col("doc_id"), col("term"), col("tf"), col("bkt"))
      .orderBy("doc_id", "term")
  }

  // ------------------------------------------------- matryoshka ANN

  /** Matryoshka prefix-dimension search under the gate
    * ([[graft.operators.Similarity.matryoshkaTopK]]): stage 1 scores
    * with the first 16 of 64 components read from a STORED prefix
    * ledger (written once at "ingest" — the adaptive-retrieval
    * deployment where stage 1's scan I/O is dPrefix/dim of the
    * corpus), stage 2 re-ranks the top-20 survivors by exact full-dim
    * cosine to top-5. The oracle replays both stages: prefix cosine as
    * a range(1,17) left fold (the same slice the Spark side stores),
    * rank to 20 with the (pcos DESC, n_id) tie rule, full-width rerank
    * with brute force's algebra — a drift in either stage's candidate
    * set or either tie-break flips the hash. */
  val annMatryoshka = Q("ann_matryoshka_topk",
    s"""WITH q AS (SELECT vec_id AS q_id, embedding AS q_vec
       |  FROM embeddings WHERE vec_id < 5),
       |c AS (SELECT vec_id AS n_id, embedding AS n_vec FROM embeddings),
       |ps AS (SELECT q_id, n_id, ${sqlCosN("q_vec", "n_vec", 16)} AS pcos
       |  FROM c CROSS JOIN q WHERE q_id <> n_id),
       |pr AS (SELECT q_id, n_id FROM (
       |  SELECT q_id, n_id, ROW_NUMBER() OVER (PARTITION BY q_id
       |    ORDER BY pcos DESC, n_id ASC) AS prnk FROM ps)
       |  WHERE prnk <= 20),
       |sc AS (SELECT pr.q_id, pr.n_id,
       |    ${RegistryExt.sqlCos("q.q_vec", "c.n_vec")} AS cos
       |  FROM pr JOIN q ON pr.q_id = q.q_id
       |  JOIN c ON pr.n_id = c.n_id),
       |r AS (SELECT q_id, n_id, cos, CAST(ROW_NUMBER() OVER
       |  (PARTITION BY q_id ORDER BY cos DESC, n_id ASC) AS BIGINT) AS rnk
       |  FROM sc)
       |SELECT q_id, n_id, rnk, cos FROM r WHERE rnk <= 5
       |ORDER BY q_id, rnk""".stripMargin) { (s, d) =>
    import graft.operators.Similarity
    val e = emb(s, d)
    val stage = StreamHarness.runDir("graft_mrl")
    val prefDir = stage.resolve("prefix16").toString
    e.select(col("vec_id"), slice(col("embedding"), 1, 16).as("embedding"))
      .write.mode("overwrite").parquet(prefDir)
    Similarity.matryoshkaTopK(e.filter(col("vec_id") < 5), e,
      "vec_id", "embedding", k = 5, dPrefix = 16, rerank = 20,
      prefixCorpus = Some(s.read.parquet(prefDir)))
      .withColumn("rnk", col("rnk").cast("long"))
      .orderBy("q_id", "rnk")
  }

  /** A 4-page streaming fixture over any id-keyed table: rows split
    * into four mtime-ordered parquet page files with 10-id overlaps
    * (the at-least-once replay the drains absorb), page p covering
    * [max(0, p·⌊n/4⌋ − 10), (p+1)·⌊n/4⌋). `table` keys the
    * FixtureCache dependency; `tag` names the cache entry. */
  private[queries] def pagesFixture(s: SparkSession, d: String,
      tag: String, table: String, rows: DataFrame,
      idCol: String): java.nio.file.Path = {
    val n = rows.count()
    FixtureCache.cached(d, tag, 1, Seq(table)) { tmp =>
      val pages = tmp.resolve("pages")
      java.nio.file.Files.createDirectories(pages)
      val base = System.currentTimeMillis() - 3600L * 1000
      val qn = n / 4
      for (p <- 0 until 4) {
        val lo = math.max(0L, p * qn - 10)
        val hi = if (p == 3) n else (p + 1) * qn
        val tmpd = tmp.resolve(s"tmp$p")
        rows.filter(col(idCol) >= lo && col(idCol) < hi)
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
  }

  /** The document corpus's pages fixture (FixtureCache "bmidx"). */
  private def bmPagesFixture(s: SparkSession, d: String): java.nio.file.Path =
    pagesFixture(s, d, "bmidx", "documents", docs(s, d), "doc_id")

  /** Drain the pages fixture through [[graft.operators.TxServeStack.commitBatch]]
    * (manifest-protocol commits, 16 doc + 16 term buckets) and return
    * the stack root. One micro-batch per page in mtime order, so
    * batches 0..3 commit manifest versions 0..3. */
  private[queries] def drainTxStack(s: SparkSession, d: String,
                           tag: String,
                           positions: Boolean = false): String = {
    import graft.operators.TxServeStack
    // the 4-page drain is deterministic (same pages → same 4 commits),
    // so it stages ONCE per (dataset, builder version) and each gate
    // mutates its own copy — eight gates share one drain instead of
    // eight. Version couples to TxServeStack.commitBatch's on-disk
    // format: bump it whenever the drained bytes change.
    val fx = FixtureCache.cached(d,
      if (positions) "txstackpos" else "txstack", 2,
      Seq("documents")) { tmp =>
      val root = tmp.resolve("stack").toString
      val stream = s.readStream
        .schema("doc_id LONG, text STRING, lang STRING, source STRING, n_chars LONG")
        .option("maxFilesPerTrigger", "1")
        .parquet(bmPagesFixture(s, d).resolve("pages").toString)
      val run = stream.writeStream
        .foreachBatch { (b: DataFrame, id: Long) =>
          TxServeStack.commitBatch(s, root, b, id, "doc_id", "text",
            docBuckets = 16, termBuckets = 16, positions = positions)
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

  /** The manifest gates' serve: resolve the stack (optionally pinned
    * to a snapshot `version`) with the query terms' stats buckets
    * elected — PATH-level pruning, an unelected bucket's directory is
    * never listed — then the O(query) BM25 over docs 0..2's token
    * sets. */
  private[queries] def txBm25Serve(s: SparkSession, d: String, root: String,
                          version: Option[Long] = None): DataFrame = {
    import graft.operators.TxServeStack
    val qt = docs(s, d).filter(col("doc_id") < 3)
      .select(col("doc_id").as("q_id"),
        explode(split(col("text"), " ")).as("term"))
    val qBkts = Ledger.keyHashBuckets(qt.select("term").distinct(),
      "term", 16)
    val (postings, stats, global) =
      TxServeStack.resolve(s, root, statsBuckets = Some(qBkts),
        version = version)
    Retrieval.bm25TopKFromStats(qt, postings, stats, global, k = 10)
      .withColumn("rnk", col("rnk").cast("long"))
      .orderBy("q_id", "rnk")
  }

  /** The TRANSACTIONAL serve-stack drain under the gate
    * ([[graft.operators.TxServeStack]] — the [[graft.operators.Manifest]]
    * commit protocol): where `streaming_stats_ingest` pays three
    * independent storage commits per batch (and documents the crash
    * window between them as unhealable), here every asset write lands
    * at a versioned path no reader resolves, and ONE atomic manifest
    * rename publishes all three together — per-bucket MVCC for the
    * term stats (untouched buckets stay pinned at old versions),
    * per-batch delta directories for the postings, batch-id
    * high-water for exactly-once replay. The gate's output is the
    * O(query) BM25 serve resolved ONLY through the manifest (the
    * stats read is PATH-pruned to the query terms' buckets — an
    * unelected bucket's directory is never listed); the oracle derives
    * everything from the raw corpus, so torn or double-applied state
    * from any batch flips the hash. ManifestSpec carries the crash
    * face: assets written + commit skipped ≡ invisible. */
  val streamingStatsManifest = Q("streaming_stats_manifest",
    s"""WITH ${Registry12.sqlBm25(10)}
       |SELECT q_id, doc_id, rnk, score FROM lex
       |ORDER BY q_id, rnk""".stripMargin) { (s, d) =>
    txBm25Serve(s, d, drainTxStack(s, d, "graft_statstx"))
  }

  /** SNAPSHOT reads over the manifest stack ([[graft.operators.Manifest.readAt]]
    * — the table-format time-travel face): every commit freezes its
    * consistent cut in an immutable `manifest.v=N` history file, so a
    * reader pinned to version 1 serves EXACTLY the stack as of batch
    * 1's commit — pages 2 and 3 arrived, committed, and moved the
    * pointer, and the pinned reader must see none of it. The gate
    * drains all four pages, then serves at version 1; the oracle
    * computes BM25 over just the first two pages' documents
    * (doc_id < 2·⌊n/4⌋ — the fixture's page boundaries), so any leak
    * of post-snapshot state (a doc, a stats increment, the global
    * N/Σdl moving) flips scores and the hash. readAt refuses
    * versions above the committed pointer (a crashed batch's torn
    * history file stays invisible — ManifestSpec). */
  val streamingStatsSnapshot = Q("streaming_stats_snapshot",
    s"""WITH ${Registry12.sqlBm25(10,
         "doc_id < 2 * ((SELECT COUNT(*) FROM documents) // 4)")}
       |SELECT q_id, doc_id, rnk, score FROM lex
       |ORDER BY q_id, rnk""".stripMargin) { (s, d) =>
    txBm25Serve(s, d, drainTxStack(s, d, "graft_statssnap"),
      version = Some(1L))
  }

  /** GARBAGE COLLECTION under the protocol
    * ([[graft.operators.TxServeStack.vacuum]]): versioned writes never
    * delete, so superseded stats-bucket versions, compacted-away
    * posting deltas, and crash orphans accumulate as unreadable
    * storage. The gate drains four pages, compacts (stranding the
    * four delta dirs), simulates a crashed batch (assets written,
    * swap skipped — the orphan class), vacuums with retention 0, and
    * REQUIRES garbage was actually reclaimed and the post-vacuum
    * batch-dir listing is empty; the output is the serve through the
    * surviving pins vs the raw-corpus oracle — a vacuum that deleted
    * one live path flips the hash, a vacuum that missed the orphan
    * fails the require. ManifestSpec holds the retention face
    * (retainVersions keeps old snapshots servable; retire ends time
    * travel). */
  val streamingStatsVacuum = Q("streaming_stats_vacuum",
    s"""WITH ${Registry12.sqlBm25(10)}
       |SELECT q_id, doc_id, rnk, score FROM lex
       |ORDER BY q_id, rnk""".stripMargin) { (s, d) =>
    import graft.operators.{Manifest, TxServeStack}
    val root = drainTxStack(s, d, "graft_statsvac")
    require(TxServeStack.compactPostings(s, root),
      "the drained stack must have visible postings to compact")
    // a crashed batch: all three asset writes land, the swap never runs
    TxServeStack.commitBatch(s, root,
      docs(s, d).filter(col("doc_id") < 5), 99L, "doc_id", "text",
      docBuckets = 16, termBuckets = 16, publish = false)
    val vs = TxServeStack.vacuum(s, root, retainVersions = 0)
    require(vs.deletedDirs > 0,
      "compaction + the crash left garbage; vacuum must reclaim it")
    val f = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(s.sessionState.newHadoopConf())
    val strays = f.listStatus(
        new org.apache.hadoop.fs.Path(s"$root/postings")).toSeq
      .map(_.getPath.getName).filter(_.startsWith("batch="))
    require(strays.isEmpty,
      s"compacted-away delta dirs survived vacuum: $strays")
    require(Manifest.read(s, root).get.batchId == 3L,
      "vacuum must not disturb the committed pointer")
    txBm25Serve(s, d, root)
  }

  /** Posting compaction under the protocol
    * ([[graft.operators.TxServeStack.compactPostings]]): the 4-page
    * drain leaves 4 per-batch delta directories; compaction
    * consolidates them into a 1-file-per-bucket versioned BASE and
    * swaps a manifest whose delta window restarts — the drain-age
    * answer, same single-rename atomicity as a batch commit. The
    * serve then resolves THROUGH the moved base pointer; the oracle
    * is the raw-corpus truth, so a row lost, duplicated, or
    * re-bucketed by the consolidation flips the hash (and
    * ManifestSpec holds the crash face + post-compaction append). */
  val streamingStatsCompacted = Q("streaming_stats_compacted",
    s"""WITH ${Registry12.sqlBm25(10)}
       |SELECT q_id, doc_id, rnk, score FROM lex
       |ORDER BY q_id, rnk""".stripMargin) { (s, d) =>
    import graft.operators.TxServeStack
    val root = drainTxStack(s, d, "graft_statscpt")
    require(TxServeStack.compactPostings(s, root),
      "the drained stack must have visible postings to compact")
    val stC = graft.operators.Manifest.read(s, root).get
    require(stC.baseV >= 0, "compaction must move the base pointer")
    txBm25Serve(s, d, root)
  }

  /** The FULL O(query) hybrid ([[Retrieval.rrfFuse]] of
    * [[Retrieval.bm25TopKFromStats]] ⊕
    * [[graft.operators.Similarity.ivfPqTopKFromIndex]]):
    * `hybrid_indexed_topk`'s deployment upgraded on the lexical side
    * — that gate's BM25 leg still re-derives dl/df/N/Σdl from the
    * whole tf ledger per query batch; here it reads norm-carrying
    * postings + the vocabulary stats ledger under `bkt IN` pruning
    * and the 1-row global, so BOTH legs of the fuse do query-sized
    * reads over corpus-sized stored assets. The oracle is
    * `hybrid_indexed_topk`'s verbatim (the stats serve is bit-equal
    * to the full-derivation serve — RetrievalSpec's identity — so
    * the fused ranking cannot differ). */
  val hybridStatsTopK = Q("hybrid_stats_topk",
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
       |ORDER BY q_id, rnk""".stripMargin) { (s, d) =>
    import graft.operators.Similarity
    val dcs = docs(s, d)
    val (e, cent, cb) = Registry10.ivfPqSparkInputs(s, d)
    val sBkt = 64
    val postings = Ledger.withHashBucket(
      Retrieval.withDocNorms(
        Retrieval.bm25IndexBuild(dcs, "doc_id", "text")), "term", sBkt)
    val stats = Ledger.withHashBucket(
      Retrieval.bm25TermStatsBuild(
        postings.select("doc_id", "term", "tf")), "term", sBkt)
    val global = Retrieval.bm25GlobalStatsBuild(
      postings.select("doc_id", "term", "tf"))
    val codeLedger = Similarity.pqIndexBuild(e, cent, cb,
      "vec_id", "embedding")
    val qt = dcs.filter(col("doc_id") < 3)
      .select(col("doc_id").as("q_id"),
        explode(split(col("text"), " ")).as("term"))
    val qterms = qt.select("term").distinct()
    val lex = Retrieval.bm25TopKFromStats(qt,
      Ledger.prunedToKeys(postings, qterms, "term", sBkt),
      Ledger.prunedToKeys(stats, qterms, "term", sBkt),
      global, k = 20)
      .select(col("q_id"), col("doc_id").as("n_id"), col("rnk"))
    val den = Similarity.ivfPqTopKFromIndex(e.filter(col("vec_id") < 3),
      codeLedger, cent, cb, "vec_id", "embedding", k = 20, nProbe = 4)
      .select(col("q_id"), col("n_id"), col("rnk"))
    Retrieval.rrfFuse(Seq(lex, den), k = 10)
      .withColumn("rnk", col("rnk").cast("long"))
      .orderBy("q_id", "rnk")
  }

  /** Term-pruned SNIPPET serve ([[Retrieval.bestWindow]] over a
    * TERM-bucketed positional ledger) — the fourth consumer of the
    * serve-side pruning law after the BM25/LM/phrase serves: the
    * snippet query's terms elect hash buckets, the positional ledger
    * (the heaviest lexical asset — one row per token) reads back
    * under a literal `bkt IN` filter, and the cover sweep sees a
    * bit-identical world (every occurrence a query term can cover
    * lives in that term's own bucket). Oracle = `text_best_window`'s
    * quadratic-join replay over the raw corpus. */
  val textBestWindowPruned = Q("text_best_window_pruned",
    s"""WITH pl AS (SELECT doc_id, term, pos FROM (
       |  SELECT d.doc_id, u.i - 1 AS pos, d.parts[u.i] AS term
       |  FROM (SELECT doc_id, string_split(text, ' ') AS parts
       |    FROM documents) d,
       |  UNNEST(range(1, len(d.parts) + 1)) AS u(i))
       |  WHERE term <> ''),
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
    val sBkt = 64
    val ledger = Ledger.withHashBucket(
      Retrieval.positionalIndexBuild(dd, "doc_id", "text"), "term", sBkt)
    val qt = dd.filter(col("doc_id") < 3)
      .select(col("doc_id").as("q_id"),
        explode(slice(split(col("text"), " "), 1, 3)).as("term"))
    Retrieval.bestWindow(qt,
      Ledger.prunedToKeys(ledger, qt.select("term").distinct(),
        "term", sBkt),
      window = 3)
      .withColumn("win_start", col("win_start").cast("long"))
      .orderBy("q_id", "doc_id")
  }

  /** The SEARCH-PAGE composition — the serve-side sibling of
    * `curate_incremental`'s ingest composition, chaining three
    * gate-checked stages into the one dataflow a result page runs:
    * (1) corpus admission by the quality composite
    * ([[graft.functions.TextFns.qualityScore]] ≥ 0.75 — at sf0.1 this
    * drops query doc 1 itself, so the filter demonstrably reshapes
    * the query set, not just the candidates), (2) BM25 top-10 from
    * the survivors' stored stats assets under `bkt IN` pruning
    * ([[Retrieval.bm25TopKFromStats]]), (3) a best-window snippet per
    * hit from the survivors' term-bucketed positional ledger
    * ([[Retrieval.bestWindow]], window 3 over the full query term
    * set). Every hit carries its snippet (a BM25 match shares ≥ 1
    * term with the query, so a cover window always exists). The
    * oracle chains the three proven algebras — quality CTE → BM25
    * CTE restricted by the quality cut → cover/argmax CTE — and any
    * drift in admission, ranking, or window election flips the
    * hash. */
  val searchPageServe = Q("search_page_serve", {
    val where =
      "doc_id IN (SELECT doc_id FROM qy WHERE quality >= 0.75)"
    s"""WITH ${RegistryExt.sqlQualityCte},
       |${Registry12.sqlBm25(10, where)},
       |pl AS (SELECT doc_id, term, pos FROM (
       |  SELECT d.doc_id, u.i - 1 AS pos, d.parts[u.i] AS term
       |  FROM (SELECT doc_id, string_split(text, ' ') AS parts
       |    FROM documents WHERE $where) d,
       |  UNNEST(range(1, len(d.parts) + 1)) AS u(i))
       |  WHERE term <> ''),
       |occ AS (SELECT q.q_id, l.doc_id, l.term, l.pos
       |  FROM pl l JOIN qt q ON q.term = l.term),
       |cov AS (SELECT o.q_id, o.doc_id, a.pos AS p,
       |    COUNT(DISTINCT o.term) AS k
       |  FROM occ o JOIN (SELECT DISTINCT q_id, doc_id, pos FROM occ) a
       |    ON a.q_id = o.q_id AND a.doc_id = o.doc_id
       |    AND o.pos >= a.pos AND o.pos <= a.pos + 3
       |  GROUP BY 1, 2, 3),
       |wn AS (SELECT q_id, doc_id, p, k, ROW_NUMBER() OVER (
       |  PARTITION BY q_id, doc_id ORDER BY k DESC, p ASC) AS r FROM cov)
       |SELECT l.q_id, l.doc_id, l.rnk, l.score,
       |  w.p AS win_start, CAST(w.k AS BIGINT) AS win_terms
       |FROM lex l JOIN wn w
       |  ON w.q_id = l.q_id AND w.doc_id = l.doc_id AND w.r = 1
       |ORDER BY l.q_id, l.rnk""".stripMargin }) { (s, d) =>
    import graft.functions.TextFns
    val dd = docs(s, d)
    val surv = dd.filter(TextFns.qualityScore(col("text")) >= 0.75)
    val sBkt = 64
    val postings = Ledger.withHashBucket(
      Retrieval.withDocNorms(
        Retrieval.bm25IndexBuild(surv, "doc_id", "text")), "term", sBkt)
    val stats = Ledger.withHashBucket(
      Retrieval.bm25TermStatsBuild(
        postings.select("doc_id", "term", "tf")), "term", sBkt)
    val global = Retrieval.bm25GlobalStatsBuild(
      postings.select("doc_id", "term", "tf"))
    val qt = surv.filter(col("doc_id") < 3)
      .select(col("doc_id").as("q_id"),
        explode(split(col("text"), " ")).as("term"))
    val qterms = qt.select("term").distinct()
    val hits = Retrieval.bm25TopKFromStats(qt,
      Ledger.prunedToKeys(postings, qterms, "term", sBkt),
      Ledger.prunedToKeys(stats, qterms, "term", sBkt),
      global, k = 10)
    val posLedger = Ledger.withHashBucket(
      Retrieval.positionalIndexBuild(surv, "doc_id", "text"),
      "term", sBkt)
    val wins = Retrieval.bestWindow(qt,
      Ledger.prunedToKeys(posLedger, qterms, "term", sBkt), window = 3)
    hits.join(wins, Seq("q_id", "doc_id"))
      .select(col("q_id"), col("doc_id"),
        col("rnk").cast("long").as("rnk"), col("score"),
        col("win_start").cast("long").as("win_start"), col("win_terms"))
      .orderBy("q_id", "rnk")
  }

  val round16: Seq[Q] = Seq(textIndexStats, textIndexStatsAppend,
    textIndexStatsRemove, textBm25StatsTopK, textIndexRemoveBucketed,
    textLmStatsTopK, streamingStatsIngest, textPhrasePrunedServe,
    textIndexCompact, annMatryoshka, streamingStatsManifest,
    hybridStatsTopK, textBestWindowPruned, searchPageServe,
    streamingStatsCompacted, streamingStatsSnapshot,
    streamingStatsVacuum)
}
