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

  val round9b: Seq[Q] = Seq(dedupSpans, shardManifest)
}
