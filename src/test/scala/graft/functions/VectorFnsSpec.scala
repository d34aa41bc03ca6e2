package graft.functions

import graft.SparkSpec
import graft.operators.Similarity
import org.apache.spark.sql.functions._

class VectorFnsSpec extends SparkSpec {
  import spark.implicits._

  private lazy val vecs = Seq(
    (1L, Array(1.0f, 0.0f, 0.0f)),
    (2L, Array(0.0f, 1.0f, 0.0f)),
    (3L, Array(2.0f, 0.0f, 0.0f)),   // parallel to 1
    (4L, Array(1.0f, 1.0f, 0.0f))
  ).toDF("vec_id", "embedding")

  test("dot / l2Norm / cosine basics") {
    val r = vecs.filter($"vec_id" === 4).select(
      VectorFns.dot($"embedding", $"embedding").as("d"),
      VectorFns.l2Norm($"embedding").as("n")).head()
    assert(r.getDouble(0) == 2.0 && math.abs(r.getDouble(1) - math.sqrt(2)) < 1e-12)
  }

  test("cosine: orthogonal → 0, parallel → 1") {
    val a = vecs.filter($"vec_id" === 1).select($"embedding".as("a"))
    val cross = a.crossJoin(vecs.select($"vec_id", $"embedding".as("b")))
      .select($"vec_id", VectorFns.cosine($"a", $"b").as("cos"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(cross(2L) == 0.0 && cross(3L) == 1.0)
  }

  test("plane: deterministic ±1 components") {
    val p0 = VectorFns.plane(0, 8)
    assert(p0.toSeq == VectorFns.plane(0, 8).toSeq)   // stable
    assert(p0.forall(v => v == 1.0 || v == -1.0))
    assert(VectorFns.plane(1, 8).toSeq != p0.toSeq)    // planes differ
  }

  test("bruteForceTopK: parallel vector ranks first for its query") {
    val top = Similarity.bruteForceTopK(
      vecs.filter($"vec_id" === 1), vecs, "vec_id", "embedding", k = 2, dim = 3)
      .collect().map(r => (r.getAs[Long]("n_id"), r.getAs[Int]("rnk")))
    assert(top.head == (3L, 1))
  }

  test("lshTopK: identical-direction vectors share a bucket") {
    val top = Similarity.lshTopK(
      vecs.filter($"vec_id" === 1), vecs, "vec_id", "embedding",
      k = 2, nPlanes = 2, dim = 3)
      .collect().map(_.getAs[Long]("n_id"))
    assert(top.contains(3L)) // parallel vector has identical sign pattern
  }

  test("ivfTopK: probing every cell reproduces the brute-force ranking") {
    // centroids = ids < 3 = vecs {1,2}; nProbe=2 probes both cells →
    // candidate set is the whole corpus, so the result must equal brute force
    val q = vecs.filter($"vec_id" === 4)
    val ivf = Similarity.ivfTopK(q, vecs, "vec_id", "embedding",
      k = 3, nCells = 3, nProbe = 2, dim = 3)
      .select("q_id", "n_id", "rnk").collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val bf = Similarity.bruteForceTopK(q, vecs, "vec_id", "embedding", k = 3, dim = 3)
      .select("q_id", "n_id", "rnk").collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(ivf == bf)
  }

  test("kmeansIter: refined centroids are the per-cell dimension means") {
    // centroids at the axes; members cluster around each axis
    val corpus = Seq(
      (1L, Array(1.0f, 0.0f, 0.0f)),
      (2L, Array(0.8f, 0.2f, 0.0f)),
      (3L, Array(0.0f, 1.0f, 0.0f)),
      (4L, Array(0.0f, 0.9f, 0.1f))
    ).toDF("vec_id", "embedding")
    val cent = Seq((0, Array(1.0, 0.0, 0.0)), (1, Array(0.0, 1.0, 0.0)))
      .toDF("cell", "c_vec")
    val refined = Similarity.kmeansIter(corpus, cent, "vec_id", "embedding", dim = 3)
      .orderBy("cell").collect()
      .map(r => r.getInt(0) -> r.getSeq[Double](1)).toMap
    def close(a: Seq[Double], b: Seq[Double]) =
      a.zip(b).forall { case (x, y) => math.abs(x - y) < 1e-6 }
    assert(close(refined(0), Seq(0.9, 0.1, 0.0)))   // mean of vecs 1,2
    assert(close(refined(1), Seq(0.0, 0.95, 0.05))) // mean of vecs 3,4
  }

  test("ivfTopK: single probe restricts candidates to the query's cell") {
    val q = vecs.filter($"vec_id" === 3) // parallel to centroid 1
    val ids = Similarity.ivfTopK(q, vecs, "vec_id", "embedding",
      k = 4, nCells = 3, nProbe = 1, dim = 3)
      .collect().map(_.getAs[Long]("n_id")).toSet
    // cell of centroid 1 holds vecs {1, 3}; vec 2's cell is unprobed
    assert(ids.contains(1L) && !ids.contains(2L))
  }

  test("ivfAssign: argmax cell with higher-cell ties, corpus untouched") {
    val cent = Seq((0, Array(1.0f, 0.0f, 0.0f)), (1, Array(0.0f, 1.0f, 0.0f)),
      (2, Array(1.0f, 0.0f, 0.0f))) // cell 2 duplicates cell 0 → tie
      .toDF("cell", "c_vec")
    val batch = Seq((10L, Array(0.9f, 0.1f, 0.0f)), (11L, Array(0.0f, 2.0f, 0.0f)))
      .toDF("vec_id", "embedding")
    val got = Similarity.ivfAssign(batch, cent, "vec_id", "embedding", dim = 3)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    // vec 10 is nearest the duplicated axis → tie breaks to the HIGHER cell
    assert(got == Map(10L -> 2, 11L -> 1))
  }

  test("ivfAssignTwoLevel: fine argmax stays inside the coarse route") {
    val coarse = Seq((0, Array(1.0f, 0.0f, 0.0f)), (1, Array(0.0f, 1.0f, 0.0f)))
      .toDF("ccell", "c_vec")
    val fine = Seq(
      (0, Array(1.0f, 0.0f, 0.0f)),    // routes to ccell 0
      (1, Array(0.9f, 0.45f, 0.0f)),   // routes to ccell 0
      (2, Array(0.0f, 1.0f, 0.0f)))    // routes to ccell 1
      .toDF("cell", "f_vec")
    val batch = Seq(
      (10L, Array(0.6f, 0.8f, 0.0f)),  // route 1; GLOBAL best fine is 1
      (11L, Array(1.0f, 0.0f, 0.0f)))  // route 0 → fine 0
      .toDF("vec_id", "embedding")
    val got = Similarity.ivfAssignTwoLevel(
      batch, coarse, fine, "vec_id", "embedding", dim = 3)
      .collect().map(r => r.getLong(0) -> ((r.getInt(1), r.getInt(2)))).toMap
    // vec 10's globally-best fine centroid (1, cos ≈ 0.894) lives under
    // route 0, but its coarse route is 1 — the contract confines the
    // fine competition to the route, so it lands in cell 2 (cos 0.8)
    assert(got == Map(10L -> ((1, 2)), 11L -> ((0, 0))))
  }

  test("kmeansIterRouted: means follow the ROUTED membership, not the flat one") {
    val coarse = Seq((0, Array(1.0f, 0.0f, 0.0f)), (1, Array(0.0f, 1.0f, 0.0f)))
      .toDF("ccell", "c_vec")
    val fine = Seq(
      (0, Array(1.0f, 0.0f, 0.0f)),   // route 0
      (1, Array(0.6f, 0.8f, 0.0f)),   // route 1 (closer to y than x axis)
      (2, Array(0.0f, 1.0f, 0.0f)))   // route 1
      .toDF("cell", "f_vec")
    // vec 10: coarse route 0 (x-ish), but its GLOBALLY best fine centroid
    // is 1 (route 1) — flat refinement would put it in cell 1's mean;
    // routed refinement confines it to route 0's only fine cell, 0
    val corpus = Seq(
      (10L, Array(0.8f, 0.6f, 0.0f)),
      (11L, Array(1.0f, 0.0f, 0.0f)),
      (12L, Array(0.0f, 1.0f, 0.0f))
    ).toDF("vec_id", "embedding")
    val got = Similarity.kmeansIterRouted(corpus, coarse, fine,
      "vec_id", "embedding", dim = 3)
      .collect().map(r => r.getInt(0) -> r.getSeq[Double](1)).toMap
    def close(a: Seq[Double], b: Seq[Double]) =
      a.zip(b).forall { case (x, y) => math.abs(x - y) < 1e-6 }
    assert(close(got(0), Seq(0.9, 0.3, 0.0)))  // mean of vecs 10, 11
    assert(close(got(2), Seq(0.0, 1.0, 0.0)))  // vec 12 alone
    assert(!got.contains(1))                   // fine cell 1 won nothing
  }

  test("cellMeans: dyadic .5-tie quantizes away from zero (oracle parity)") {
    // −0.27392578125 is exactly representable in float32 and sits exactly
    // on a scale-10 decimal tie; both engines' round() go away from zero
    val corpus = Seq((1L, Array(-0.27392578125f, 0.0f, 0.0f)))
      .toDF("vec_id", "embedding")
    val cent = Seq((0, Array(-1.0, 0.0, 0.0))).toDF("cell", "c_vec")
    val m = Similarity.kmeansIter(corpus, cent, "vec_id", "embedding", dim = 3)
      .head().getSeq[Double](1)
    assert(m.head == -2739257813L.toDouble / 1e10 / 1L)
  }

  test("ivfAssignTwoLevel: keepVec appends the input vector unchanged") {
    val coarse = Seq((0, Array(1.0f, 0.0f, 0.0f))).toDF("ccell", "c_vec")
    val fine = Seq((0, Array(1.0f, 0.0f, 0.0f))).toDF("cell", "f_vec")
    val batch = Seq((10L, Array(0.5f, 0.25f, 0.0f))).toDF("vec_id", "embedding")
    val r = Similarity.ivfAssignTwoLevel(batch, coarse, fine,
      "vec_id", "embedding", dim = 3, keepVec = true).head()
    assert(r.schema.fieldNames.toSeq ==
      Seq("vec_id", "ccell", "cell", "score", "embedding"))
    assert(r.getSeq[Float](4) == Seq(0.5f, 0.25f, 0.0f))
  }

  test("ivfAssignTwoLevel: a fine-centroid-less coarse route is refused") {
    val coarse = Seq((0, Array(1.0f, 0.0f, 0.0f)), (1, Array(0.0f, 1.0f, 0.0f)),
      (2, Array(0.0f, 0.0f, 1.0f))) // no fine centroid will route here
      .toDF("ccell", "c_vec")
    val fine = Seq((0, Array(1.0f, 0.0f, 0.0f)), (1, Array(0.0f, 1.0f, 0.0f)))
      .toDF("cell", "f_vec")
    val batch = Seq((10L, Array(0.0f, 0.0f, 1.0f))).toDF("vec_id", "embedding")
    assertThrows[IllegalArgumentException] {
      Similarity.ivfAssignTwoLevel(batch, coarse, fine, "vec_id", "embedding",
        dim = 3)
    }
  }

  test("nearDupPairs: oversized block is refused, balanced blocks run") {
    // all four vectors share one block → block of 4 > cap of 3 → refuse
    assertThrows[IllegalArgumentException] {
      Similarity.nearDupPairs(vecs, "vec_id", "embedding",
        lit(0), threshold = 0.9, dim = 3, maxBlockRows = 3)
    }
    // under the cap the quadratic-within-block join runs and finds the
    // parallel pair (1, 3)
    val pairs = Similarity.nearDupPairs(vecs, "vec_id", "embedding",
      lit(0), threshold = 0.999, dim = 3, maxBlockRows = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((1L, 3L)))
  }

  test("nearDupPairs: null blocks produce no pairs and don't trip the guard") {
    // null block keys never satisfy a.blk === b.blk — a corpus whose
    // largest "block" is the null group must run, not be refused
    val blk = when(col("vec_id") < 4, lit(null).cast("int")).otherwise(lit(1))
    val out = Similarity.nearDupPairs(vecs, "vec_id", "embedding",
      blk, threshold = -1.0, dim = 3, maxBlockRows = 2)
    // only vec 4 lands in a real block → zero pairs, no exception
    assert(out.count() == 0)
  }

  test("knnGraph: neighbors stay within the cell, ranked by cosine; hot cell refused") {
    // cells: x-axis family {1, 3} vs y-axis {2}; centroids = unit axes
    val cent = Seq((0, Array(1.0f, 0.0f, 0.0f)), (1, Array(0.0f, 1.0f, 0.0f)))
      .toDF("cell", "c_vec")
    val g = Similarity.knnGraph(vecs, cent, "vec_id", "embedding",
      k = 1, dim = 3)
      .select("src_id", "nbr_id", "rnk")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getInt(2))).toMap
    // 1 and 3 are parallel -> mutual top-1; 4 (diagonal, ties to cell 1... )
    assert(g(1L) == ((3L, 1)) && g(3L) == ((1L, 1)))
    // 2's only options are its cellmates -- never the x-axis family
    assert(g.get(2L).forall { case (n, _) => n != 1L && n != 3L })
    // the guard refuses a saturated cell rather than going quadratic
    assertThrows[IllegalArgumentException] {
      Similarity.knnGraph(vecs, cent.filter(col("cell") === 0),
        "vec_id", "embedding", k = 1, dim = 3, maxCellRows = 2)
    }
  }
}
