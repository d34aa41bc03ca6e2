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

  val round16: Seq[Q] = Seq(textIndexStats, textIndexStatsAppend,
    textIndexStatsRemove, textBm25StatsTopK, textIndexRemoveBucketed)
}
