package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.operators.Similarity

/** Round-11 additions: the product-quantization ANN family (the memory
  * face of vector search at 10⁹ vectors — codes, not floats, ride the
  * scan), temperature-based source mixing, and epoch upsampling. */
object Registry10 {

  private def emb(s: SparkSession, d: String) = Tables.embeddings(s, d)

  /** DuckDB squared-L2 between subspace j (0-based, width 8) of two
    * FLOAT[64] lists: left fold from 0.0, difference squared by
    * self-multiplication (pow()'s libm rounding is not cross-engine
    * stable; x*x is IEEE-exact). Mirrors [[graft.expressions.PqCodes]]. */
  private def sqlSubDist(a: String, b: String, j: String): String =
    s"""list_reduce(list_prepend(0.0, list_transform(range(1, 9),
       |  t -> (CAST($a[$j*8 + t] AS DOUBLE) - CAST($b[$j*8 + t] AS DOUBLE))
       |     * (CAST($a[$j*8 + t] AS DOUBLE) - CAST($b[$j*8 + t] AS DOUBLE)))),
       |  (x, y) -> x + y)""".stripMargin

  /** Shared oracle CTEs: the seed-rule PQ codebook (codeword c of
    * subspace j = sub-vector j of the vector with vec_id c, c < 16) and
    * every corpus vector's per-subspace argmin codes. */
  private def sqlPqCodes: String =
    s"""cw AS (SELECT CAST(vec_id AS INT) AS code, embedding AS w
       |  FROM embeddings WHERE vec_id < 16),
       |js AS (SELECT unnest(range(0, 8)) AS j),
       |cd AS (SELECT b.vec_id AS n_id, js.j AS sub, c.code,
       |    ${sqlSubDist("b.embedding", "c.w", "js.j")} AS dist
       |  FROM embeddings b CROSS JOIN js CROSS JOIN cw c),
       |codes AS (SELECT n_id, sub, code, dist FROM (
       |  SELECT n_id, sub, code, dist, ROW_NUMBER() OVER (
       |    PARTITION BY n_id, sub ORDER BY dist ASC, code ASC) AS rn
       |  FROM cd) WHERE rn = 1)""".stripMargin

  /** Product-quantization ENCODE under the gate
    * ([[Similarity.pqEncode]]): every corpus vector compressed to its
    * m=8 sub-codes (per-subspace argmin squared-L2 against the 16-entry
    * seed codebook) plus total squared reconstruction error — one
    * scalar projection over the corpus ([[graft.expressions.PqCodes]]),
    * no join, no shuffle; at 10⁹ vectors the stored index is 8 B/vector
    * against 256 B of raw floats. The oracle replays the argmin
    * (dist ASC, code ASC ≡ the expression's strict-< left scan) and the
    * subspace-order error fold, bit-for-bit. */
  val annPqEncode = Q("ann_pq_encode",
    s"""WITH $sqlPqCodes
       |SELECT n_id AS vec_id,
       |  list(CAST(code AS INT) ORDER BY sub) AS codes,
       |  list_reduce(list_prepend(0.0, list(dist ORDER BY sub)),
       |    (x, y) -> x + y) AS err
       |FROM codes GROUP BY n_id ORDER BY vec_id""".stripMargin) { (s, d) =>
    val e = emb(s, d)
    Similarity.pqEncode(e,
      Similarity.pqCodebookSeed(e, "vec_id", "embedding", m = 8, ksub = 16, subDim = 8),
      "vec_id", "embedding")
      .orderBy("vec_id")
  }

  /** PQ top-k via asymmetric distance computation
    * ([[Similarity.pqTopK]]): each query precomputes its 128-entry
    * distance table once, and every corpus candidate is scored from its
    * 8 CODES alone — m table reads, not a 64-wide dot product, over an
    * index 32× smaller than the raw floats. The oracle computes the
    * same quantity the table lookup reads: Σ_j l2²(query sub_j,
    * codeword(j, code_nj)), folded in subspace order. Approximate by
    * construction (distances are to RECONSTRUCTED vectors); ties break
    * to the lower neighbor id. */
  val annPqTopK = Q("ann_pq_topk",
    s"""WITH $sqlPqCodes,
       |qd AS (SELECT q.vec_id AS q_id, js.j AS sub, c.code,
       |    ${sqlSubDist("q.embedding", "c.w", "js.j")} AS dist
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
      Similarity.pqCodebookSeed(e, "vec_id", "embedding", m = 8, ksub = 16, subDim = 8),
      "vec_id", "embedding", k = 5)
      .withColumn("rnk", col("rnk").cast("long"))
      .orderBy("q_id", "rnk")
  }

  val round11: Seq[Q] = Seq(annPqEncode, annPqTopK)
}
