package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.operators.Similarity

/** Round-9 additions: the trained two-level IVF loop, incremental
  * cluster maintenance, the writer-layout operator, and the late-data
  * streaming witness. */
object Registry8 {

  /** Fully TRAINED two-level IVF assignment — the round-8 demo
    * ([[Registry7.annIvfTwoLevel]], seed-rule codebooks) upgraded to the
    * production loop: the coarse codebook is Lloyd-refined flat (it is
    * √C-sized — flat cost is n × √C, already sub-linear in C), then the
    * fine codebook is Lloyd-refined THROUGH the routed assignment
    * ([[Similarity.kmeansIterRouted]] — train/serve consistency: fine
    * centroids compete only within their coarse route at training time
    * exactly as they will at query time), then the corpus is assigned
    * through [[Similarity.ivfAssignTwoLevel]] on the trained pair.
    * Total corpus cost: one flat √C argmax (coarse train) + two routed
    * 2√C argmaxes (fine train + serve) + two (cell, d) mean shuffles —
    * nothing n × C anywhere.
    *
    * Oracle: replays the coarse Lloyd step, the fine routing, the
    * routed fine Lloyd step, the re-routing of the refined fine
    * centroids, and the final two-level argmax — same cosine fold,
    * fixed-point-exact means, and score-then-higher-cell ties at every
    * stage. */
  val annIvfTwoLevelTrained = Q("ann_ivf_two_level_trained",
    s"""WITH cs AS (SELECT CAST(vec_id AS INT) AS cell, embedding AS c_vec
       |  FROM embeddings WHERE vec_id < 4),
       |asgc AS (SELECT n_id, cell, n_vec FROM (
       |  SELECT b.vec_id AS n_id, c.cell, b.embedding AS n_vec,
       |    ROW_NUMBER() OVER (PARTITION BY b.vec_id
       |      ORDER BY ${RegistryExt.sqlCos("b.embedding", "c.c_vec")} DESC, c.cell DESC) AS rn
       |  FROM embeddings b CROSS JOIN cs c) WHERE rn = 1),
       |cdm AS (SELECT cell, i AS d,
       |    CAST(SUM(CAST(round(CAST(n_vec[i] AS DOUBLE) * 1e10) AS BIGINT)) AS DOUBLE)
       |      / 1e10 / COUNT(n_vec[i]) AS m
       |  FROM asgc CROSS JOIN (SELECT unnest(range(1, 65)) AS i)
       |  GROUP BY cell, i),
       |coarse1 AS (SELECT cell AS ccell, list(m ORDER BY d) AS c_vec
       |  FROM cdm GROUP BY cell),
       |fs AS (SELECT CAST(vec_id AS INT) AS cell, embedding AS f_vec
       |  FROM embeddings WHERE vec_id < 16),
       |routed0 AS (SELECT cell, ccell, f_vec FROM (
       |  SELECT f.cell, c.ccell, f.f_vec,
       |    ROW_NUMBER() OVER (PARTITION BY f.cell
       |      ORDER BY ${RegistryExt.sqlCos("f.f_vec", "c.c_vec")} DESC, c.ccell DESC) AS rn
       |  FROM fs f CROSS JOIN coarse1 c) WHERE rn = 1),
       |cg AS (SELECT vec_id, ccell, embedding FROM (
       |  SELECT b.vec_id, c.ccell, b.embedding,
       |    ROW_NUMBER() OVER (PARTITION BY b.vec_id
       |      ORDER BY ${RegistryExt.sqlCos("b.embedding", "c.c_vec")} DESC, c.ccell DESC) AS rn
       |  FROM embeddings b CROSS JOIN coarse1 c) WHERE rn = 1),
       |asg0 AS (SELECT n_id, cell, n_vec FROM (
       |  SELECT a.vec_id AS n_id, f.cell, a.embedding AS n_vec,
       |    ROW_NUMBER() OVER (PARTITION BY a.vec_id
       |      ORDER BY ${RegistryExt.sqlCos("a.embedding", "f.f_vec")} DESC, f.cell DESC) AS rn
       |  FROM cg a JOIN routed0 f ON a.ccell = f.ccell) WHERE rn = 1),
       |fdm AS (SELECT cell, i AS d,
       |    CAST(SUM(CAST(round(CAST(n_vec[i] AS DOUBLE) * 1e10) AS BIGINT)) AS DOUBLE)
       |      / 1e10 / COUNT(n_vec[i]) AS m
       |  FROM asg0 CROSS JOIN (SELECT unnest(range(1, 65)) AS i)
       |  GROUP BY cell, i),
       |fine1 AS (SELECT cell, list(m ORDER BY d) AS f_vec
       |  FROM fdm GROUP BY cell),
       |routed1 AS (SELECT cell, ccell, f_vec FROM (
       |  SELECT f.cell, c.ccell, f.f_vec,
       |    ROW_NUMBER() OVER (PARTITION BY f.cell
       |      ORDER BY ${RegistryExt.sqlCos("f.f_vec", "c.c_vec")} DESC, c.ccell DESC) AS rn
       |  FROM fine1 f CROSS JOIN coarse1 c) WHERE rn = 1)
       |SELECT vec_id, ccell, cell, score FROM (
       |  SELECT a.vec_id, a.ccell, f.cell,
       |    ${RegistryExt.sqlCos("a.embedding", "f.f_vec")} AS score,
       |    ROW_NUMBER() OVER (PARTITION BY a.vec_id
       |      ORDER BY ${RegistryExt.sqlCos("a.embedding", "f.f_vec")} DESC,
       |        f.cell DESC) AS rn
       |  FROM cg a JOIN routed1 f ON a.ccell = f.ccell) WHERE rn = 1
       |ORDER BY vec_id""".stripMargin) { (s, d) =>
    val e = Tables.embeddings(s, d)
    val cSeeds = e.filter(col("vec_id") < 4)
      .select(col("vec_id").cast("int").as("cell"), col("embedding").as("c_vec"))
    // coarse codebook feeds BOTH training's routing and the final
    // assignment — checkpoint, or the coarse Lloyd step's corpus pass
    // re-runs per collectCodebook
    val coarse1 = Similarity.kmeansIter(e, cSeeds, "vec_id", "embedding")
      .select(col("cell").as("ccell"), col("c_vec"))
      .localCheckpoint()
    val fSeeds = e.filter(col("vec_id") < 16)
      .select(col("vec_id").cast("int").as("cell"), col("embedding").as("f_vec"))
    val fine1 = Similarity.kmeansIterRouted(e, coarse1, fSeeds,
      "vec_id", "embedding")
    Similarity.ivfAssignTwoLevel(e, coarse1, fine1, "vec_id", "embedding")
      .orderBy("vec_id")
  }

  val round9: Seq[Q] = Seq(annIvfTwoLevelTrained)
}
