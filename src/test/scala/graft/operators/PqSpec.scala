package graft.operators

import graft.SparkSpec
import graft.Tables
import org.apache.spark.sql.functions._
import org.apache.spark.sql.catalyst.util.ArrayData

/** Round-12 PQ family: training, IVF-PQ composition, and the
  * refuse-don't-corrupt contracts (null-element refusal, codebook
  * mismatch detection, refused-row dropping, query-side size guard). */
class PqSpec extends SparkSpec {
  import spark.implicits._

  private lazy val emb = Tables.embeddings(spark, sf)
  private def seedCb = Similarity.pqCodebookSeed(
    emb, "vec_id", "embedding", m = 8, ksub = 16, subDim = 8)

  private def totalErr(cb: org.apache.spark.sql.DataFrame): Double =
    Similarity.pqEncode(emb, cb, "vec_id", "embedding")
      .agg(sum("err")).head().getDouble(0)

  test("pqCodebookTrain: one Lloyd step strictly shrinks reconstruction error") {
    val seedErr = totalErr(seedCb)
    val trained = Similarity.pqCodebookTrain(emb, seedCb, "vec_id", "embedding")
    val trainedErr = totalErr(trained)
    assert(trainedErr < seedErr,
      s"trained err $trainedErr !< seed err $seedErr")
    // two steps never worse than one (Lloyd monotonicity, up to the
    // 1e-10 fixed-point mean quantization)
    val twoErr = totalErr(
      Similarity.pqCodebookTrain(emb, seedCb, "vec_id", "embedding", steps = 2))
    assert(twoErr <= trainedErr + 1e-6)
  }

  test("pqCodebookTrain: unwon codewords keep their weights; codes stay dense") {
    // corpus clusters at (1,1) and (9,9) per subspace; codeword 2 sits
    // far away at (100, -100) and wins nothing
    val corpus = Seq(
      (0L, Array(1.0f, 1.0f, 9.0f, 9.0f)),
      (1L, Array(1.2f, 0.8f, 8.8f, 9.2f)),
      (2L, Array(9.0f, 9.0f, 1.0f, 1.0f))
    ).toDF("vec_id", "embedding")
    val cb = Seq(
      (0, 0, Array(1.0, 1.0)), (0, 1, Array(9.0, 9.0)), (0, 2, Array(100.0, -100.0)),
      (1, 0, Array(1.0, 1.0)), (1, 1, Array(9.0, 9.0)), (1, 2, Array(100.0, -100.0))
    ).toDF("sub", "code", "w_vec")
    val t = Similarity.pqCodebookTrain(corpus, cb, "vec_id", "embedding")
      .collect().map(r => (r.getInt(0), r.getInt(1)) ->
        r.getSeq[Double](2).toArray).toMap
    assert(t.keySet.size == 6, "codes must stay dense — no codeword dropped")
    // unwon codeword 2 retains its weights in both subspaces
    assert(t((0, 2)).toSeq == Seq(100.0, -100.0))
    assert(t((1, 2)).toSeq == Seq(100.0, -100.0))
    // codeword 0 of subspace 0 moves to the mean of its two winners
    // (float literals aren't exact decimals — compare to 1e-7)
    assert(t((0, 0)).zip(Seq(1.1, 0.9)).forall { case (a, b) =>
      math.abs(a - b) < 1e-7 })
    // codeword 1 of subspace 0 keeps its single winner's sub-vector
    assert(t((0, 1)).toSeq == Seq(9.0, 9.0))
  }

  test("pqEncode: null-element vectors refuse (null codes, never zero-padded)") {
    val corpus = Seq(
      (0L, Array[java.lang.Float](1.0f, 2.0f, 3.0f, 4.0f)),
      (1L, Array[java.lang.Float](1.0f, null, 3.0f, 4.0f))
    ).toDF("vec_id", "embedding")
    val cb = Seq((0, 0, Array(0.0, 0.0)), (1, 0, Array(0.0, 0.0)))
      .toDF("sub", "code", "w_vec")
    val out = Similarity.pqEncode(corpus, cb, "vec_id", "embedding")
      .collect().map(r => r.getLong(0) -> r.isNullAt(1)).toMap
    assert(!out(0L) && out(1L),
      "vector with a null element must refuse to encode")
  }

  test("pqTopK: refused corpus/query rows are dropped, not ranked first") {
    val corpus = Seq(
      (0L, Array[java.lang.Float](1.0f, 0.0f)),
      (1L, Array[java.lang.Float](0.9f, 0.1f)),
      (2L, Array[java.lang.Float](null, 0.0f)),   // refuses: must NOT outrank 1
      (3L, Array[java.lang.Float](0.0f, 1.0f))
    ).toDF("vec_id", "embedding")
    val cb = Seq((0, 0, Array(1.0, 0.0)), (0, 1, Array(0.0, 1.0)))
      .toDF("sub", "code", "w_vec")
    val got = Similarity.pqTopK(corpus.filter($"vec_id" === 0), corpus, cb,
      "vec_id", "embedding", k = 2)
      .select("n_id", "rnk").collect().map(r => (r.getLong(0), r.getInt(1)))
    assert(!got.map(_._1).contains(2L), "refused corpus row leaked into top-k")
    assert(got.toSet == Set((1L, 1), (3L, 2)))
    // a refused QUERY emits no rows at all (not k null-scored rows)
    val qNull = Similarity.pqTopK(corpus.filter($"vec_id" === 2), corpus, cb,
      "vec_id", "embedding", k = 2)
    assert(qNull.count() == 0)
  }

  test("pqTopK / ivfPqTopK: query-side count guard refuses a corpus-sized query frame") {
    val cb = seedCb
    val e1 = intercept[IllegalArgumentException] {
      Similarity.pqTopK(emb, emb, cb, "vec_id", "embedding", k = 3,
        maxQueryRows = 100)
    }
    assert(e1.getMessage.contains("maxQueryRows"))
    val cent = emb.filter($"vec_id" < 16)
      .select($"vec_id".cast("int").as("cell"), $"embedding".as("c_vec"))
    val e2 = intercept[IllegalArgumentException] {
      Similarity.ivfPqTopK(emb, emb, cent, cb, "vec_id", "embedding",
        k = 3, maxQueryRows = 100)
    }
    assert(e2.getMessage.contains("maxQueryRows"))
  }

  test("ivfPqTopK: rerank pool smaller than k refuses") {
    val cent = emb.filter($"vec_id" < 16)
      .select($"vec_id".cast("int").as("cell"), $"embedding".as("c_vec"))
    val e = intercept[IllegalArgumentException] {
      Similarity.ivfPqTopK(emb.filter($"vec_id" < 2), emb, cent, seedCb,
        "vec_id", "embedding", k = 5, rerank = 3)
    }
    assert(e.getMessage.contains("rerank"))
  }

  test("ivfPqTopK: all cells probed + full re-rank pool == exact brute force") {
    // 4 cells, nProbe=4 probes everything; rerank=500 re-ranks every
    // candidate by exact cosine — the composition must collapse to
    // bruteForceTopK exactly (recall loss comes ONLY from routing and
    // PQ approximation, both disabled here)
    val q = emb.filter($"vec_id" < 3)
    val cent = emb.filter($"vec_id" < 4)
      .select($"vec_id".cast("int").as("cell"), $"embedding".as("c_vec"))
    val got = Similarity.ivfPqTopK(q, emb, cent, seedCb,
      "vec_id", "embedding", k = 5, nProbe = 4, rerank = 500)
      .select("q_id", "n_id", "rnk").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val want = Similarity.bruteForceTopK(q, emb, "vec_id", "embedding", k = 5)
      .select("q_id", "n_id", "rnk").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(got == want)
  }

  test("ivfPqTopK: two-level coarse routing composes (k rows/query, adc parity on probed set)") {
    // coarse routes over the same fine cells: assignments may differ
    // from the flat argmax (the routed approximation), but the ADC
    // algebra must be identical — for each query, every (q_id, n_id)
    // BOTH configurations retain must carry the same adc score
    val q = emb.filter($"vec_id" < 3)
    val fine = emb.filter($"vec_id" < 16)
      .select($"vec_id".cast("int").as("cell"), $"embedding".as("c_vec"))
    val coarse = emb.filter($"vec_id" < 4)
      .select($"vec_id".cast("int").as("ccell"), $"embedding".as("c_vec"))
    val flat = Similarity.ivfPqTopK(q, emb, fine, seedCb,
      "vec_id", "embedding", k = 5, nProbe = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(3)).toMap
    val routed = Similarity.ivfPqTopK(q, emb, fine, seedCb,
      "vec_id", "embedding", k = 5, nProbe = 4, coarse = Some(coarse))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(3)).toMap
    assert(routed.size == 15, s"expected 3 queries x k=5, got ${routed.size}")
    val common = flat.keySet intersect routed.keySet
    assert(common.nonEmpty)
    assert(common.forall(p => flat(p) == routed(p)),
      "ADC scores must be identical for pairs both configurations retain")
  }

  test("residuals: rvec + centroid reconstructs the vector; residual PQ beats raw at the same budget") {
    val cent = emb.filter($"vec_id" < 16)
      .select($"vec_id".cast("int").as("cell"), $"embedding".as("c_vec"))
    val res = Similarity.residuals(emb, cent, "vec_id", "embedding")
    // r = v − c must reconstruct v (float-origin doubles — subtraction
    // error is far below 1e-10)
    val maxRe = res.join(cent, "cell")
      .join(emb.select($"vec_id", $"embedding"), "vec_id")
      .select(expr("""aggregate(zip_with(zip_with(rvec, c_vec,
          (r, c) -> r + CAST(c AS DOUBLE)), embedding,
          (s, v) -> abs(s - CAST(v AS DOUBLE))), 0.0D, (a, x) -> greatest(a, x))""")
        .as("re"))
      .agg(max("re")).head().getDouble(0)
    assert(maxRe < 1e-10, s"residual + centroid drifted from v by $maxRe")
    // NOTE deliberately NOT asserted here: "residual err < raw err on
    // the fixture". The fixture embeddings are unclustered, so 16
    // cosine cells don't explain much position and residual balls can
    // exceed raw ones — the residual win is a property of CLUSTERED
    // data, proven exactly below.
  }

  test("residual PQ: on clustered data the residual codebook is exact where raw cannot be") {
    // two clusters c0, c1; every member is center + one of two SHARED
    // offsets r0/r1. A residual codebook {r0, r1} per subspace encodes
    // the corpus with ZERO error; a raw codebook with the same budget
    // (2 codewords/subspace, seeded from corpus vectors) cannot
    // represent all center×offset combinations and must err.
    val c0 = Array(8.0f, 0.0f, 8.0f, 0.0f)
    val c1 = Array(0.0f, 8.0f, 0.0f, 8.0f)
    val r0 = Array(1.0f, 0.0f, 1.0f, 0.0f)
    val r1 = Array(0.0f, 1.0f, 0.0f, 1.0f)
    def plus(a: Array[Float], b: Array[Float]) =
      a.zip(b).map { case (x, y) => x + y }
    val corpus = Seq(
      (0L, plus(c0, r0)), (1L, plus(c0, r1)),
      (2L, plus(c1, r0)), (3L, plus(c1, r1))
    ).toDF("vec_id", "embedding")
    val cent = Seq((0, c0), (1, c1)).toDF("cell", "c_vec")
    val res = Similarity.residuals(corpus, cent, "vec_id", "embedding", dim = 4)
    // members assign to their own cluster (cosine ~1 vs ~0.12)
    assert(res.collect().map(r => r.getLong(0) -> r.getInt(1)).toMap ==
      Map(0L -> 0, 1L -> 0, 2L -> 1, 3L -> 1))
    val rcb = Seq(
      (0, 0, Array(1.0, 0.0)), (0, 1, Array(0.0, 1.0)),
      (1, 0, Array(1.0, 0.0)), (1, 1, Array(0.0, 1.0))
    ).toDF("sub", "code", "w_vec")
    val resErr = Similarity.pqEncode(res, rcb, "vec_id", "rvec")
      .agg(sum("err")).head().getDouble(0)
    val rawCb = Similarity.pqCodebookSeed(corpus, "vec_id", "embedding",
      m = 2, ksub = 2, subDim = 2)
    val rawErr = Similarity.pqEncode(corpus, rawCb, "vec_id", "embedding")
      .agg(sum("err")).head().getDouble(0)
    assert(resErr == 0.0, s"residual codebook must be exact, err=$resErr")
    assert(rawErr > 0.0,
      "raw codebook cannot represent all center x offset combinations")
  }

  test("knnGraphPq: cell-diagonal SDC graph — same-cluster neighbors, zero distance for shared codes") {
    // clusters from the residual test: members of a cluster share the
    // cell; within a cell, rows quantizing to the SAME codes are at
    // SDC 0 and rank first (ties to lower id)
    val c0 = Array(8.0f, 0.0f, 8.0f, 0.0f)
    val c1 = Array(0.0f, 8.0f, 0.0f, 8.0f)
    val corpus = Seq(
      (0L, c0), (1L, c0),                                  // identical codes
      (2L, Array(9.0f, 1.0f, 9.0f, 1.0f)),                 // same cell as 0/1
      (3L, c1), (4L, Array(1.0f, 9.0f, 1.0f, 9.0f))
    ).toDF("vec_id", "embedding")
    val cent = Seq((0, c0), (1, c1)).toDF("cell", "c_vec")
    val cb = Seq(
      (0, 0, Array(8.0, 0.0)), (0, 1, Array(0.0, 8.0)),
      (1, 0, Array(8.0, 0.0)), (1, 1, Array(0.0, 8.0))
    ).toDF("sub", "code", "w_vec")
    val g = Similarity.knnGraphPq(corpus, cent, cb, "vec_id", "embedding",
      k = 2, dim = 4)
      .collect().map(r => (r.getLong(0), r.getInt(2)) ->
        (r.getLong(1), r.getDouble(3))).toMap
    // 0 and 1 share codes: SDC 0, mutual rank-1
    assert(g((0L, 1)) == (1L, 0.0) && g((1L, 1)) == (0L, 0.0))
    // the graph is cell-diagonal: cluster-1 members never neighbor cell 0
    assert(!g.values.map(_._1).toSet.contains(3L) ||
      g.keys.filter(k => g(k)._1 == 3L).forall { case (s, _) => s == 4L })
    // vector 2 quantizes to the same codes as 0/1 (argmin over the two
    // codewords) — its SDC to both is 0, ranked by lower id
    assert(g((2L, 1)) == (0L, 0.0) && g((2L, 2)) == (1L, 0.0))
  }

  test("PqSdcLookup.score: mismatch fails loudly; valid codes read the right slots") {
    // table for m=2 subspaces, k_0=k_1=2: entries [j][a][b]
    val tab = Array(0.0, 5.0, 5.0, 0.0, /* sub1 */ 0.0, 7.0, 7.0, 0.0)
    val offs = Array(0, 4)
    val widths = Array(2, 2)
    val s = graft.expressions.PqSdcLookup.score(
      ArrayData.toArrayData(Array(0, 1)), ArrayData.toArrayData(Array(1, 1)),
      tab, offs, widths)
    assert(s == 5.0 + 0.0)
    val eM = intercept[IllegalArgumentException] {
      graft.expressions.PqSdcLookup.score(
        ArrayData.toArrayData(Array(0)), ArrayData.toArrayData(Array(0, 1)),
        tab, offs, widths)
    }
    assert(eM.getMessage.contains("different codebook"))
    val eW = intercept[IllegalArgumentException] {
      graft.expressions.PqSdcLookup.score(
        ArrayData.toArrayData(Array(0, 2)), ArrayData.toArrayData(Array(0, 1)),
        tab, offs, widths)
    }
    assert(eW.getMessage.contains("out of range"))
  }

  test("PqAdcLookup.score: codebook/codes mismatch fails loudly") {
    val qtab = ArrayData.toArrayData(Array(0.5, 1.5, 2.5, 3.5))
    // m mismatch: table built for 2 subspaces, codes carry 1
    val eM = intercept[IllegalArgumentException] {
      graft.expressions.PqAdcLookup.score(qtab,
        ArrayData.toArrayData(Array(0)), Array(0, 2), Array(2, 2))
    }
    assert(eM.getMessage.contains("different codebook"))
    // width overflow: code 3 in a k_j=2 subspace
    val eW = intercept[IllegalArgumentException] {
      graft.expressions.PqAdcLookup.score(qtab,
        ArrayData.toArrayData(Array(0, 3)), Array(0, 2), Array(2, 2))
    }
    assert(eW.getMessage.contains("out of range"))
    // valid codes read the right slots
    val s = graft.expressions.PqAdcLookup.score(qtab,
      ArrayData.toArrayData(Array(1, 0)), Array(0, 2), Array(2, 2))
    assert(s == 1.5 + 2.5)
  }

  test("binarySign: bit packing exact on a constructed vector; 0.0 signs positive") {
    // alternating +/− with a 0.0 at position 1: bits 10101…, so each
    // 32-bit half is 0b1010…10 = 0xAAAAAAAA
    val v = (0 until 64).map(i => if (i % 2 == 0) 0.0f else -1.0f).toArray
    val df = Seq((1L, v)).toDF("id", "vec")
    val row = Similarity.binarySign(df, "id", "vec").head()
    assert(row.getLong(1) == 0xAAAAAAAAL && row.getLong(2) == 0xAAAAAAAAL)
    // a null ELEMENT nulls the signature (refuse, don't zero-pad)
    val bad = Seq((2L, (0 until 64).map(i =>
      if (i == 7) null else java.lang.Float.valueOf(1.0f)).toArray))
      .toDF("id", "vec")
    assert(Similarity.binarySign(bad, "id", "vec").head().isNullAt(1))
    // dim not a multiple of 32 is refused
    assertThrows[IllegalArgumentException] {
      Similarity.binarySign(df, "id", "vec", dim = 48)
    }
  }

  test("hammingTopK: full re-rank pool == exact brute force; refused rows dropped") {
    val q = emb.filter($"vec_id" < 3)
    val got = Similarity.hammingTopK(q, emb, "vec_id", "embedding",
      k = 5, rerank = 500)
      .select("q_id", "n_id", "rnk").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val want = Similarity.bruteForceTopK(q, emb, "vec_id", "embedding", k = 5)
      .select("q_id", "n_id", "rnk").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(got == want)
    // a null-signature corpus row never outranks real neighbors
    val poisoned = emb.select($"vec_id", $"embedding")
      .unionByName(Seq((9999L, null.asInstanceOf[Array[Float]]))
        .toDF("vec_id", "embedding"))
    val top = Similarity.hammingTopK(q, poisoned, "vec_id", "embedding", k = 5)
    assert(top.filter($"n_id" === 9999L).isEmpty)
    // query-side guard refuses a corpus-sized query frame
    assertThrows[IllegalArgumentException] {
      Similarity.hammingTopK(emb, emb, "vec_id", "embedding", k = 5,
        maxQueryRows = 10)
    }
  }

  test("pqIndexRemove: takedown == rebuild of survivors; absent ids are a no-op") {
    val cent = emb.filter($"vec_id" < 16)
      .select($"vec_id".cast("int").as("cell"), $"embedding".as("c_vec"))
    val ledger = Similarity.pqIndexBuild(emb, cent, seedCb, "vec_id", "embedding")
    val rm = emb.filter($"vec_id" % 5 === 0).select($"vec_id")
    val got = Similarity.pqIndexRemove(ledger, rm, "vec_id")
    val want = Similarity.pqIndexBuild(emb.filter($"vec_id" % 5 =!= 0),
      cent, seedCb, "vec_id", "embedding")
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)
    // removing ids that were never indexed changes nothing
    val noop = Similarity.pqIndexRemove(got,
      spark.range(100000, 100010).select($"id".as("vec_id")), "vec_id")
    assert(noop.exceptAll(got).isEmpty && got.exceptAll(noop).isEmpty)
  }

  test("pqIndexReencode: ledger is the membership authority, corpus the float authority") {
    val cent = emb.filter($"vec_id" < 16)
      .select($"vec_id".cast("int").as("cell"), $"embedding".as("c_vec"))
    // ledger over a strict subset of the corpus (members 0..149 minus
    // multiples of 5 — an append/remove history the corpus can't see)
    val members = emb.filter($"vec_id" < 150 && $"vec_id" % 5 =!= 0)
    val ledger = Similarity.pqIndexRemove(
      Similarity.pqIndexBuild(emb.filter($"vec_id" < 150), cent, seedCb,
        "vec_id", "embedding"),
      emb.filter($"vec_id" % 5 === 0).select($"vec_id"), "vec_id")
    // quantizer B: the next 16 ids re-based (a retrain stand-in)
    val shifted = emb.withColumn("vec_id", $"vec_id" - 16)
      .filter($"vec_id" >= 0)
    val cbB = Similarity.pqCodebookSeed(shifted, "vec_id", "embedding",
      m = 8, ksub = 16, subDim = 8)
    val centB = emb.filter($"vec_id" >= 16 && $"vec_id" < 32)
      .select(($"vec_id" - 16).cast("int").as("cell"),
        $"embedding".as("c_vec"))
    val got = Similarity.pqIndexReencode(ledger, emb, centB, cbB,
      "vec_id", "embedding")
    // identity: re-encode == from-scratch B-build of exactly the members
    val want = Similarity.pqIndexBuild(members, centB, cbB,
      "vec_id", "embedding")
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)
    // corpus rows OUTSIDE the membership never enter the refreshed
    // ledger (ids >= 150 exist in the corpus but not the ledger)
    assert(got.filter($"vec_id" >= 150).isEmpty)
    // members whose floats are gone from the corpus drop (the corpus
    // is the float authority — codes cannot re-derive codes)
    val corpusMissing = emb.filter($"vec_id" =!= 7L)
    val got2 = Similarity.pqIndexReencode(ledger, corpusMissing, centB,
      cbB, "vec_id", "embedding")
    assert(got2.filter($"vec_id" === 7L).isEmpty &&
      got2.count() == got.count() - 1)
  }

  test("pqIndexBuild/pqIndexAppend: append == rebuild, ledger untouched, idempotent") {
    val cent = emb.filter($"vec_id" < 16)
      .select($"vec_id".cast("int").as("cell"), $"embedding".as("c_vec"))
    val cb = seedCb
    // appending a batch (with an already-indexed overlap) to a partial
    // ledger must be indistinguishable from a from-scratch rebuild
    val fullIdx = Similarity.pqIndexBuild(emb, cent, cb, "vec_id", "embedding")
    val ledger = Similarity.pqIndexBuild(
      emb.filter($"vec_id" < 30), cent, cb, "vec_id", "embedding")
    val appended = Similarity.pqIndexAppend(ledger,
      emb.filter($"vec_id" >= 20), cent, cb, "vec_id", "embedding")
    assert(appended.exceptAll(fullIdx).isEmpty &&
      fullIdx.exceptAll(appended).isEmpty)
    // idempotence: replaying the same batch adds nothing
    val again = Similarity.pqIndexAppend(appended,
      emb.filter($"vec_id" >= 20), cent, cb, "vec_id", "embedding")
    assert(again.count() == appended.count())
    // stored rows pass through, never re-encoded: a sentinel mutation
    // planted in the ledger survives the append verbatim
    val mutated = ledger.withColumn("cell",
      when($"vec_id" === 0, lit(-99)).otherwise($"cell"))
    val out = Similarity.pqIndexAppend(mutated,
      emb.filter($"vec_id" >= 20), cent, cb, "vec_id", "embedding")
    assert(out.filter($"vec_id" === 0).head().getInt(1) == -99)
  }

  test("pqCodebookTrain toFixpoint: early exit equals running every step (the gate identity)") {
    // two tight clusters per subspace; the assignment stabilizes after
    // one step, so fixpoint-train must equal the full unrolled chain
    val corpus = Seq(
      (0L, Array(1.0f, 1.1f, 9.0f, 9.1f)),
      (1L, Array(1.2f, 0.9f, 8.8f, 9.3f)),
      (2L, Array(9.1f, 9.0f, 1.1f, 0.9f)),
      (3L, Array(8.9f, 9.2f, 1.0f, 1.2f))
    ).toDF("vec_id", "embedding")
    val cb = Seq(
      (0, 0, Array(0.0, 0.0)), (0, 1, Array(10.0, 10.0)),
      (1, 0, Array(0.0, 0.0)), (1, 1, Array(10.0, 10.0))
    ).toDF("sub", "code", "w_vec")
    def weights(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getInt(0), r.getInt(1)) ->
        r.getSeq[Double](2).toList).toMap
    val full = weights(Similarity.pqCodebookTrain(corpus, cb,
      "vec_id", "embedding", steps = 5))
    val fix = weights(Similarity.pqCodebookTrain(corpus, cb,
      "vec_id", "embedding", steps = 5, toFixpoint = true))
    assert(fix == full,
      s"fixpoint early-exit drifted from the full chain: $fix vs $full")
    // and on the real fixture: fixpoint-bounded == plain at equal steps
    val a = weights(Similarity.pqCodebookTrain(emb, seedCb,
      "vec_id", "embedding", steps = 2))
    val b = weights(Similarity.pqCodebookTrain(emb, seedCb,
      "vec_id", "embedding", steps = 2, toFixpoint = true))
    assert(a == b)
  }

  test("pqCodebookTrain: more Lloyd steps never increase reconstruction error") {
    val errs = Seq(1, 2, 3).map(n => totalErr(
      Similarity.pqCodebookTrain(emb, seedCb, "vec_id", "embedding",
        steps = n, toFixpoint = true)))
    assert(errs.sliding(2).forall { case Seq(a, b) => b <= a + 1e-6 },
      s"error must be monotone non-increasing over steps: $errs")
  }

  test("opqPermutation: variance rank + snake assignment on a constructed corpus") {
    // per-dim variances 1, 9, 4, 16 -> rank order d3, d1, d2, d0
    // snake over m=2 subspaces (slotW=2): r0->pos0, r1->pos2, r2->pos3, r3->pos1
    val corpus = Seq(
      (0L, Array(1.0f, 3.0f, 2.0f, 4.0f)),
      (1L, Array(-1.0f, -3.0f, -2.0f, -4.0f))
    ).toDF("vec_id", "embedding")
    val perm = Similarity.opqPermutation(corpus, "embedding", dim = 4, m = 2)
      .collect().map(r => r.getInt(0) -> r.getInt(1)).toMap
    assert(perm == Map(3 -> 0, 0 -> 1, 1 -> 2, 2 -> 3),
      s"snake assignment drifted: $perm")
    val permuted = Similarity.permuteVectors(corpus, "embedding",
      Similarity.opqPermutation(corpus, "embedding", dim = 4, m = 2))
      .orderBy("vec_id").collect().map(_.getSeq[Float](1).toList)
    assert(permuted.head == List(4.0f, 1.0f, 3.0f, 2.0f),
      s"permuted vector wrong: ${permuted.head}")
  }

  test("semanticPqPairs: code-prefix blocks find within-block dups and never cross blocks") {
    // codebook m=2 (2-wide subspaces, 2 codewords): sub-vectors near
    // (1,0) code 0, near (0,1) code 1
    val cb = Seq(
      (0, 0, Array(1.0, 0.0)), (0, 1, Array(0.0, 1.0)),
      (1, 0, Array(1.0, 0.0)), (1, 1, Array(0.0, 1.0))
    ).toDF("sub", "code", "w_vec")
    val corpus = Seq(
      (0L, Array(1.0f, 0.0f, 1.0f, 0.0f)),   // block "0,0"
      (1L, Array(0.9f, 0.1f, 0.9f, 0.1f)),   // block "0,0" — near-dup of 0
      (2L, Array(0.1f, 0.9f, 0.1f, 0.9f)),   // block "1,1": cos vs 0 is
      (3L, Array(0.2f, 0.8f, 0.2f, 0.8f))    //   ~0.3 but never compared
    ).toDF("vec_id", "embedding")
    val pairs = Similarity.semanticPqPairs(corpus, cb, "vec_id", "embedding",
      threshold = 0.1, prefix = 2, dim = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((0L, 1L), (2L, 3L)),
      s"blocking must keep within-block pairs only: $pairs")
  }

  test("permuteVectors: full-vector distances are permutation-invariant; broken perms refuse") {
    val e = emb.filter($"vec_id" < 30)
    val perm = Similarity.opqPermutation(e, "embedding", dim = 64, m = 8)
    val pe = Similarity.permuteVectors(e, "embedding", perm)
    val raw = Similarity.bruteForceTopK(e.filter($"vec_id" < 3), e,
      "vec_id", "embedding", k = 5)
      .select("q_id", "n_id", "rnk").collect().toSet
    val prm = Similarity.bruteForceTopK(pe.filter($"vec_id" < 3), pe,
      "vec_id", "embedding", k = 5)
      .select("q_id", "n_id", "rnk").collect().toSet
    assert(raw == prm, "cosine ranking must be permutation-invariant")
    val broken = Seq((0, 0), (1, 0)).toDF("pos", "d") // d repeats, pos 1 missing... (both defects)
    intercept[IllegalArgumentException] {
      Similarity.permuteVectors(e, "embedding", broken)
    }
  }

  test("matryoshkaTopK: full-width prefix with full rerank equals brute force") {
    val q = emb.filter($"vec_id" < 3)
    val n = emb.count().toInt
    val brute = Similarity.bruteForceTopK(q, emb, "vec_id", "embedding", k = 5)
      .orderBy("q_id", "rnk").collect().toSeq
    val mrl = Similarity.matryoshkaTopK(q, emb, "vec_id", "embedding",
      k = 5, dPrefix = 64, rerank = n)
      .orderBy("q_id", "rnk").collect().toSeq
    assert(mrl == brute,
      "dPrefix = dim with an uncut rerank must reproduce brute force exactly")
  }

  test("matryoshkaTopK: stored-prefix path is bit-equal to the inline slice; cos is exact full-dim") {
    val q = emb.filter($"vec_id" < 3)
    val pref = emb.select($"vec_id",
      slice($"embedding", 1, 16).as("embedding"))
    val inline = Similarity.matryoshkaTopK(q, emb, "vec_id", "embedding",
      k = 5, dPrefix = 16, rerank = 20)
      .orderBy("q_id", "rnk").collect().toSeq
    val stored = Similarity.matryoshkaTopK(q, emb, "vec_id", "embedding",
      k = 5, dPrefix = 16, rerank = 20,
      prefixCorpus = Some(pref))
      .orderBy("q_id", "rnk").collect().toSeq
    assert(inline == stored,
      "the stored prefix ledger must be a pure input substitution")
    // every returned cos is the exact full-dim cosine — the survivors'
    // scores must match brute force's for the same (q, n) pairs
    val bf = Similarity.bruteForceTopK(q, emb, "vec_id", "embedding",
      k = emb.count().toInt)
      .select("q_id", "n_id", "cos").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    inline.foreach { r =>
      val key = (r.getLong(0), r.getLong(1))
      assert(bf(key) == r.getDouble(3),
        s"rerank score for $key drifted from exact full-dim cosine")
    }
  }

  test("matryoshkaTopK: guards refuse bad widths and a rerank below k") {
    val q = emb.filter($"vec_id" < 2)
    intercept[IllegalArgumentException] {
      Similarity.matryoshkaTopK(q, emb, "vec_id", "embedding",
        k = 5, dPrefix = 0, rerank = 10)
    }
    intercept[IllegalArgumentException] {
      Similarity.matryoshkaTopK(q, emb, "vec_id", "embedding",
        k = 5, dPrefix = 65, rerank = 10)
    }
    intercept[IllegalArgumentException] {
      Similarity.matryoshkaTopK(q, emb, "vec_id", "embedding",
        k = 5, dPrefix = 16, rerank = 4)
    }
  }
}
