package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.operators.{Dedup, Sampling}

/** Round-16 second wave: the leakage-free dataset split (near-dup
  * clusters cross the train/test cut as units) and the mergeable-sketch
  * ledger family (distinct-count profiles served from stored HLL
  * sketches under the manifest protocol).
  *
  * Reference (jurimetria-etl) has no dataset-split or sketch surface;
  * these are LLM-training-data extensions (brief §"Beyond the
  * reference").
  */
object Registry19 {

  private def docs(s: SparkSession, d: String) = Tables.documents(s, d)

  /** LEAKAGE-FREE train/val/test split
    * ([[graft.operators.Sampling.assignSplitLeakFree]]): the draw key
    * is the near-dup cluster representative, so a cluster's members
    * all land on the SAME side of every cut — the eval-leak guard
    * `sample_split`'s per-row draw cannot give (a test doc whose
    * near-copy trained the model measures memorization). Clusters are
    * the dedup stage's own artifact: MinHash-LSH pairs →
    * connected-components min-labels, exactly `dedup_cluster_sizes`'
    * closure.
    *
    * The rollup proves the invariant cross-engine: `n_dup_members`
    * counts member rows riding a representative other than themselves
    * — a cluster straddling a split boundary would move members
    * between split groups and flip BOTH `n_docs` and `n_dup_members`
    * (the oracle draws on the closure's representative, so any
    * engine-side member drawing on its own id diverges wherever the
    * two draws land differently). `n_clusters` pins the distinct draw
    * units per split. */
  val sampleSplitLeakFree = Q("sample_split_leakfree",
    s"""WITH RECURSIVE w AS (SELECT doc_id, string_split(text, ' ') AS wl FROM documents),
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
       |sp AS (SELECT doc_id, cl, CASE
       |    WHEN substr(md5('graft:split:' || CAST(cl AS VARCHAR)), 1, 8)
       |      < '${Sampling.hexThreshold(0.8)}' THEN 'train'
       |    WHEN substr(md5('graft:split:' || CAST(cl AS VARCHAR)), 1, 8)
       |      < '${Sampling.hexThreshold(0.9)}' THEN 'val'
       |    ELSE 'test' END AS split
       |  FROM lab)
       |SELECT split, CAST(COUNT(*) AS BIGINT) AS n_docs,
       |  CAST(COUNT(DISTINCT cl) AS BIGINT) AS n_clusters,
       |  CAST(SUM(CASE WHEN doc_id <> cl THEN 1 ELSE 0 END) AS BIGINT)
       |    AS n_dup_members
       |FROM sp GROUP BY split ORDER BY split""".stripMargin) { (s, d) =>
    val corpus = docs(s, d)
    val labels = Dedup.connectedComponents(
      Dedup.minhashCandidates(corpus, "doc_id", "text"), "a_id", "b_id")
    Sampling.assignSplitLeakFree(corpus.select("doc_id"), col("doc_id"),
        labels, Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
      .join(labels.select(col("id").as("doc_id"), col("cluster")),
        Seq("doc_id"), "left")
      .select(col("split"), col("doc_id"),
        coalesce(col("cluster"), col("doc_id")).as("cl"))
      .groupBy("split")
      .agg(count(lit(1)).as("n_docs"),
        count_distinct(col("cl")).as("n_clusters"),
        sum(when(col("doc_id") =!= col("cl"), 1L).otherwise(0L))
          .as("n_dup_members"))
      .orderBy("split")
  }

  val round19: Seq[Q] = Seq(sampleSplitLeakFree)
}
