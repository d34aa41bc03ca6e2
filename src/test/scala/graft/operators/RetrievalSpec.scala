package graft.operators

import graft.SparkSpec
import graft.Tables
import org.apache.spark.sql.functions._

/** Round-12 third wave: SQ8 scalar quantization, graph beam search,
  * BM25 posting-list scoring, RRF fusion, MaxSim late interaction —
  * each family's defining property plus the refuse/guard contracts. */
class RetrievalSpec extends SparkSpec {
  import spark.implicits._

  private lazy val emb = Tables.embeddings(spark, sf)
  private lazy val docs = Tables.documents(spark, sf)

  // ---- SQ8 -------------------------------------------------------------

  test("sqEncode: codes bounded 0..255; per-element error <= step/2") {
    val stats = Similarity.sqStats(emb, "embedding", dim = 64)
    val st = stats.collect().map(r =>
      r.getInt(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    val enc = Similarity.sqEncode(emb, stats, "vec_id", "embedding")
      .join(emb, "vec_id").select("vec_id", "codes", "embedding")
      .collect()
    assert(enc.nonEmpty)
    enc.foreach { r =>
      val codes = r.getSeq[Int](1)
      val v = r.getSeq[Float](2)
      assert(codes.length == 64)
      codes.zipWithIndex.foreach { case (c, i) =>
        assert(c >= 0 && c <= 255, s"code $c out of byte range")
        val (mn, mx) = st(i)
        val step = (mx - mn) / 255.0
        val deq = mn + c * step
        // nearest-level guarantee: half a step, plus float-widening slack
        assert(math.abs(v(i).toDouble - deq) <= step / 2.0 + 1e-9,
          s"dim $i: ${v(i)} dequantized to $deq with step $step")
      }
    }
  }

  test("sqTopK: matches exact squared-L2 ranking on a well-separated corpus") {
    // cluster gaps >> quantization resolution, so SQ8 order == exact order
    val corpus = Seq(
      (0L, Array(0.0f, 0.0f)), (1L, Array(10.0f, 0.0f)),
      (2L, Array(20.0f, 0.0f)), (3L, Array(30.0f, 0.0f))
    ).toDF("vec_id", "embedding")
    val stats = Similarity.sqStats(corpus, "embedding", dim = 2)
    val got = Similarity.sqTopK(corpus.filter($"vec_id" === 0L), corpus,
      stats, "vec_id", "embedding", k = 3)
      .orderBy("rnk").collect().map(_.getLong(1)).toSeq
    assert(got == Seq(1L, 2L, 3L), s"SQ8 ranking drifted: $got")
  }

  test("sqTopK: refused corpus rows are dropped, never ranked") {
    val corpus = Seq(
      (0L, Array[java.lang.Float](0.0f, 0.0f)),
      (1L, Array[java.lang.Float](1.0f, 0.0f)),
      (2L, Array[java.lang.Float](null, 0.0f)),
      (3L, Array[java.lang.Float](2.0f, 0.0f))
    ).toDF("vec_id", "embedding")
    val valid = corpus.filter($"vec_id" =!= 2L)
    val stats = Similarity.sqStats(valid, "embedding", dim = 2)
    val got = Similarity.sqTopK(corpus.filter($"vec_id" === 0L), corpus,
      stats, "vec_id", "embedding", k = 3)
      .orderBy("rnk").collect().map(_.getLong(1)).toSeq
    assert(got == Seq(1L, 3L), s"refused row must vanish, got $got")
  }

  test("SqAdcDist: codes from a different quantizer throw, never mis-score") {
    import org.apache.spark.sql.GraftExpr
    def score(codes: Array[Int]) = {
      val df = Seq((Array(0.1f, 0.2f, 0.3f), codes)).toDF("q", "codes")
      df.select(GraftExpr.col(graft.expressions.SqAdcDist(
        GraftExpr.expr(col("q")), GraftExpr.expr(col("codes")),
        Array(0.0, 0.0, 0.0), Array(0.1, 0.1, 0.1))).as("s")).collect()
    }
    // wrong code count (2 codes vs 3-dim quantizer)
    val e1 = intercept[Exception] { score(Array(1, 2)) }
    assert(e1.getMessage.contains("different quantizer") ||
      (e1.getCause != null && e1.getCause.getMessage.contains("different quantizer")))
    // out-of-range code
    val e2 = intercept[Exception] { score(Array(1, 300, 2)) }
    assert(e2.getMessage.contains("different quantizer") ||
      (e2.getCause != null && e2.getCause.getMessage.contains("different quantizer")))
  }

  test("ivfSqTopK: all cells probed collapses to exhaustive sqTopK; rerank to brute force") {
    val e = emb.filter($"vec_id" < 60)
    val cent = e.filter($"vec_id" < 8)
      .select($"vec_id".cast("int").as("cell"), $"embedding".as("c_vec"))
    val stats = Similarity.sqStats(e, "embedding", dim = 64)
    val q = e.filter($"vec_id" < 3)
    val routed = Similarity.ivfSqTopK(q, e, cent, stats,
      "vec_id", "embedding", k = 5, nProbe = 8)
      .select("q_id", "n_id", "rnk", "adc").orderBy("q_id", "rnk")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(3))).toSeq
    val flat = Similarity.sqTopK(q, e, stats, "vec_id", "embedding", k = 5)
      .select("q_id", "n_id", "rnk", "adc").orderBy("q_id", "rnk")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(3))).toSeq
    assert(routed == flat, "probing every cell must equal the exhaustive scan")
    val reranked = Similarity.ivfSqTopK(q, e, cent, stats,
      "vec_id", "embedding", k = 5, nProbe = 8, rerank = 59)
      .select("q_id", "n_id", "rnk").orderBy("q_id", "rnk")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSeq
    val brute = Similarity.bruteForceTopK(q, e, "vec_id", "embedding", k = 5)
      .select("q_id", "n_id", "rnk").orderBy("q_id", "rnk")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSeq
    assert(reranked == brute,
      "all cells + full-pool re-rank must equal exact brute force")
  }

  test("lshMultiProbeTopK: candidates strictly contain the single-probe set") {
    val e = emb.filter($"vec_id" < 200)
    val q = e.filter($"vec_id" < 3)
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.select("q_id", "n_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    // k = corpus size → the "top-k" IS the whole candidate set
    val single = pairs(Similarity.lshTopK(q, e, "vec_id", "embedding",
      k = 200, nPlanes = 4))
    val multi = pairs(Similarity.lshMultiProbeTopK(q, e, "vec_id", "embedding",
      k = 200, nPlanes = 4))
    assert(single.subsetOf(multi),
      s"multi-probe lost single-probe candidates: ${single.diff(multi)}")
    assert(multi.size > single.size,
      "probing 4 extra buckets must widen the candidate set on this corpus")
  }

  test("ivfPqTopKFromIndex: serving from the stored ledger equals the composed search") {
    val e = emb.filter($"vec_id" < 100)
    val cent = e.filter($"vec_id" < 8)
      .select($"vec_id".cast("int").as("cell"), $"embedding".as("c_vec"))
    val cb = Similarity.pqCodebookSeed(emb, "vec_id", "embedding",
      m = 8, ksub = 16, subDim = 8)
    val q = e.filter($"vec_id" < 3)
    val ledger = Similarity.pqIndexBuild(e, cent, cb, "vec_id", "embedding")
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("q_id", "rnk").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getDouble(3))).toSeq
    val served = rows(Similarity.ivfPqTopKFromIndex(q, ledger, cent, cb,
      "vec_id", "embedding", k = 5, nProbe = 3))
    val direct = rows(Similarity.ivfPqTopK(q, e, cent, cb,
      "vec_id", "embedding", k = 5, nProbe = 3))
    assert(served == direct,
      "the stored ledger must serve bit-identical rankings")
  }

  test("ivfPqTopKFromIndexAdaptive: no widening when supply is rich; brute fixed point when starved") {
    val e = emb.filter($"vec_id" < 200)
    val cent = e.filter($"vec_id" < 8)
      .select($"vec_id".cast("int").as("cell"), $"embedding".as("c_vec"))
    val cb = Similarity.pqCodebookSeed(emb, "vec_id", "embedding",
      m = 8, ksub = 16, subDim = 8)
    val q = e.filter($"vec_id" < 3)
    val ledger = Similarity.pqIndexBuild(e, cent, cb, "vec_id", "embedding")
      .localCheckpoint()
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("q_id", "rnk").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getDouble(3))).toSeq
    // unfiltered ledger: every probed cell is full, the cumulative
    // count covers k inside nProbe cells — the adaptive rule must
    // degrade to exactly the fixed-probe serve
    assert(rows(Similarity.ivfPqTopKFromIndexAdaptive(q, ledger, cent, cb,
        "vec_id", "embedding", k = 5, nProbe = 3)) ==
      rows(Similarity.ivfPqTopKFromIndex(q, ledger, cent, cb,
        "vec_id", "embedding", k = 5, nProbe = 3)),
      "rich supply must not widen")
    // starved filter: 6 allowed rows < k+1 — the widening rule's fixed
    // point probes every allowed cell, i.e. ADC over ALL survivors
    // (per-query result covers the whole allowed set minus self)
    val allowed = e.filter($"vec_id" % 33 === 0).select("vec_id")
    val nAllowed = allowed.count()
    assert(nAllowed >= 3 && nAllowed < 10, s"fixture drifted: $nAllowed")
    val lgF = ledger.join(allowed, Seq("vec_id"), "left_semi")
    val got = Similarity.ivfPqTopKFromIndexAdaptive(q, lgF, cent, cb,
      "vec_id", "embedding", k = 10, nProbe = 2)
    val perQ = got.groupBy("q_id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val allowedIds = allowed.as[Long].collect().toSet
    for ((qid, n) <- perQ) {
      val want = if (allowedIds(qid)) nAllowed - 1 else nAllowed
      assert(n == want,
        s"query $qid returned $n of $want allowed survivors — starved")
    }
  }

  test("graphSearchTopKFiltered: auto-widen = ceil(corpus/allowed); unwidened post-filter returns no more") {
    val e = emb.filter($"vec_id" < 60)
    val cent = e.filter($"vec_id" === 0)
      .select(lit(0).cast("int").as("cell"), $"embedding".as("c_vec"))
    val g = Similarity.knnGraph(e, cent, "vec_id", "embedding", k = 3)
      .localCheckpoint()
    val q = e.filter($"vec_id" < 3)
    val allowed = e.filter($"vec_id" % 3 === 0) // 20 of 60 → factor 3
    def rows(widen: Int) =
      Similarity.graphSearchTopKFiltered(q, e, g, allowed,
        "vec_id", "embedding", k = 5, beam = 4, hops = 3, widen = widen)
        .select("q_id", "n_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val auto = rows(0)
    assert(auto == rows(3),
      "widen=0 must derive exactly ceil(60/20) = 3")
    // an unwidened post-filter can only return a subset of the widened
    // pool's allowed members (the starvation the widening exists for)
    val starved = rows(1)
    assert(starved.subsetOf(auto) || starved.size <= auto.size,
      s"unwidened pool returned more than the widened one: $starved vs $auto")
    assert(auto.forall { case (_, n) => n % 3 == 0 },
      "a disallowed node leaked into filtered results")
  }

  // ---- graph beam search ----------------------------------------------

  test("graphSearchTopK: complete graph + wide beam collapses to brute force") {
    val e = emb.filter($"vec_id" < 30)
    val ids = e.select($"vec_id").as[Long].collect()
    val complete = ids.flatMap(a => ids.filter(_ != a).map(b => (a, b)))
      .toSeq.toDF("src_id", "nbr_id")
    val got = Similarity.graphSearchTopK(e.filter($"vec_id" < 3), e,
      complete, "vec_id", "embedding", k = 5, beam = 30, hops = 1)
      .select("q_id", "n_id", "rnk").orderBy("q_id", "rnk")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSeq
    val want = Similarity.bruteForceTopK(e.filter($"vec_id" < 3), e,
      "vec_id", "embedding", k = 5)
      .select("q_id", "n_id", "rnk").orderBy("q_id", "rnk")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSeq
    assert(got == want)
  }

  test("graphSearchTopK: more hops never regress the best candidate") {
    val e = emb.filter($"vec_id" < 100)
    val cent = e.filter($"vec_id" === 0)
      .select(lit(0).cast("int").as("cell"), $"embedding".as("c_vec"))
    val g = Similarity.knnGraph(e, cent, "vec_id", "embedding", k = 3)
    def best(hops: Int): Map[Long, Double] =
      Similarity.graphSearchTopK(e.filter($"vec_id" < 3), e, g,
        "vec_id", "embedding", k = 1, beam = 4, hops = hops)
        .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    val one = best(1); val three = best(3)
    one.keySet.foreach { q =>
      assert(three(q) >= one(q) - 1e-12,
        s"query $q: best cos regressed ${one(q)} -> ${three(q)}")
    }
  }

  test("knnGraphConnected: highway edges bridge the islands the cell-restricted build leaves") {
    // two tight clusters; two centroids put each cluster in its own
    // cell, so knnGraph alone has NO cross-cluster edge and a beam
    // from the global entry (cluster A) can never reach cluster B
    val corpus = Seq(
      (0L, Array(1.0f, 0.0f)), (1L, Array(0.99f, 0.05f)), (2L, Array(0.98f, 0.1f)),
      (10L, Array(0.0f, 1.0f)), (11L, Array(0.05f, 0.99f)), (12L, Array(0.1f, 0.98f))
    ).toDF("vec_id", "embedding")
    val cent = Seq((0, Array(1.0f, 0.0f)), (1, Array(0.0f, 1.0f)))
      .toDF("cell", "c_vec")
    val island = Similarity.knnGraph(corpus, cent, "vec_id", "embedding",
      k = 2, dim = 2).select("src_id", "nbr_id", "cos")
    val q = corpus.filter($"vec_id" === 10L) // wants cluster B, entry is 0
    def reached(g: org.apache.spark.sql.DataFrame) =
      Similarity.graphSearchTopK(q, corpus, g, "vec_id", "embedding",
        k = 2, beam = 4, hops = 4, dim = 2)
        .collect().map(_.getLong(1)).toSet
    assert(reached(island).forall(_ < 10L),
      "cell-restricted graph must strand the search on island A")
    val connected = Similarity.knnGraphConnected(corpus, cent,
      "vec_id", "embedding", k = 2, cellNeighbors = 1, dim = 2)
    val got = reached(connected)
    assert(got.exists(_ >= 10L),
      s"highway edges must let the search cross to cluster B: $got")
    // local edges are a subset of the connected graph
    assert(island.exceptAll(connected).isEmpty)
  }

  test("graphEntries: routed seeds make an island graph searchable without highway edges") {
    // same two-island fixture as the connectivity tests: single-entry
    // search strands on island A; per-query medoid entries reach B
    val corpus = Seq(
      (0L, Array(1.0f, 0.0f)), (1L, Array(0.99f, 0.05f)), (2L, Array(0.98f, 0.1f)),
      (10L, Array(0.0f, 1.0f)), (11L, Array(0.05f, 0.99f)), (12L, Array(0.1f, 0.98f))
    ).toDF("vec_id", "embedding")
    val cent = Seq((0, Array(1.0f, 0.0f)), (1, Array(0.0f, 1.0f)))
      .toDF("cell", "c_vec")
    val island = Similarity.knnGraph(corpus, cent, "vec_id", "embedding",
      k = 2, dim = 2).select("src_id", "nbr_id", "cos")
    val q = corpus.filter($"vec_id" === 10L)
    val single = Similarity.graphSearchTopK(q, corpus, island,
      "vec_id", "embedding", k = 2, beam = 4, hops = 4, dim = 2)
      .collect().map(_.getLong(1)).toSet
    assert(single.forall(_ < 10L), "single entry must strand on island A")
    val ent = Similarity.graphEntries(q, corpus, cent,
      "vec_id", "embedding", nProbe = 2, dim = 2)
    // the probe elects both cells; cell 1's medoid (node 10) seeds B
    val seeds = ent.collect().map(_.getLong(1)).toSet
    assert(seeds.exists(_ >= 10L), s"probe must seed island B: $seeds")
    val routed = Similarity.graphSearchTopK(q, corpus, island,
      "vec_id", "embedding", k = 2, beam = 4, hops = 4, dim = 2,
      entries = Some(ent))
      .collect().map(_.getLong(1)).toSet
    assert(routed.exists(_ >= 10L),
      s"routed entries must reach island B over the island graph: $routed")
  }

  test("graphSearchTopK: disconnected components are unreachable (the graph-ANN caveat)") {
    // two islands; entry node (min id) is on island A — island B never appears
    val corpus = Seq(
      (0L, Array(1.0f, 0.0f)), (1L, Array(0.9f, 0.1f)),
      (10L, Array(0.0f, 1.0f)), (11L, Array(0.1f, 0.9f))
    ).toDF("vec_id", "embedding")
    val g = Seq((0L, 1L), (1L, 0L), (10L, 11L), (11L, 10L))
      .toDF("src_id", "nbr_id")
    // query 10 points at island B, but search starts on island A
    val got = Similarity.graphSearchTopK(corpus.filter($"vec_id" === 10L),
      corpus, g, "vec_id", "embedding", k = 2, beam = 4, hops = 5)
      .collect().map(_.getLong(1)).toSet
    assert(got == Set(0L, 1L), s"unreachable island leaked into $got")
  }

  test("graphSearchTopK: beam < k refuses") {
    val e = emb.filter($"vec_id" < 10)
    val g = Seq((0L, 1L)).toDF("src_id", "nbr_id")
    intercept[IllegalArgumentException] {
      Similarity.graphSearchTopK(e, e, g, "vec_id", "embedding",
        k = 5, beam = 3, hops = 1)
    }
  }

  test("graphAppend: an inserted node becomes findable; degrees never exceed the cap") {
    val e = emb.filter($"vec_id" < 100)
    val cent = e.filter($"vec_id" === 0)
      .select(lit(0).cast("int").as("cell"), $"embedding".as("c_vec"))
    val g = Similarity.knnGraph(e, cent, "vec_id", "embedding", k = 3)
      .select("src_id", "nbr_id", "cos")
    val batch = emb.filter($"vec_id" >= 100 && $"vec_id" < 103)
    val g2 = Similarity.graphAppend(g, e, batch, "vec_id", "embedding",
      k = 3, beam = 4, hops = 3, maxDegree = 4)
    // every degree respects the cap
    val maxDeg = g2.groupBy("src_id").count().agg(max("count")).head().getLong(0)
    assert(maxDeg <= 4, s"degree cap violated: $maxDeg")
    // inserted nodes have out-edges AND in-edges (findable both ways)
    val newIds = Set(100L, 101L, 102L)
    val outs = g2.filter($"src_id" >= 100).select("src_id").distinct()
      .collect().map(_.getLong(0)).toSet
    val ins = g2.filter($"nbr_id" >= 100).select("nbr_id").distinct()
      .collect().map(_.getLong(0)).toSet
    assert(outs == newIds, s"every inserted node needs out-edges: $outs")
    assert(ins == newIds, s"every inserted node needs in-edges: $ins")
    // a search over the appended graph can now RETURN an inserted node
    val all = e.unionByName(batch)
    val found = Similarity.graphSearchTopK(batch, all, g2,
      "vec_id", "embedding", k = 3, beam = 8, hops = 4)
      .select("n_id").collect().map(_.getLong(0)).toSet
    assert(found.nonEmpty)
    // at-least-once replay: re-appending the same batch is a no-op
    // (already-inserted nodes are anti-joined out, never re-searched)
    val g3 = Similarity.graphAppend(g2, e, batch, "vec_id", "embedding",
      k = 3, beam = 4, hops = 3, maxDegree = 4)
    assert(g3.exceptAll(g2).isEmpty && g2.exceptAll(g3).isEmpty,
      "replayed append must leave the graph byte-identical")
  }

  test("graphRemove: tombstoned nodes vanish from both edge ends and from search results") {
    val e = emb.filter($"vec_id" < 60)
    val cent = e.filter($"vec_id" === 0)
      .select(lit(0).cast("int").as("cell"), $"embedding".as("c_vec"))
    val g = Similarity.knnGraph(e, cent, "vec_id", "embedding", k = 3)
      .select("src_id", "nbr_id", "cos")
    val pruned = Similarity.graphRemove(g,
      Seq(5L, 6L).toDF("id"))
    assert(pruned.filter($"src_id".isin(5L, 6L) || $"nbr_id".isin(5L, 6L))
      .count() == 0)
    val survivors = e.filter(!$"vec_id".isin(5L, 6L))
    val res = Similarity.graphSearchTopK(e.filter($"vec_id" < 3), survivors,
      pruned, "vec_id", "embedding", k = 3, beam = 6, hops = 3)
      .select("n_id").collect().map(_.getLong(0)).toSet
    assert(!res.contains(5L) && !res.contains(6L))
  }

  test("graphRepair: re-linking the orphaned neighborhood recovers the recall a tombstone loses") {
    // a chain graph A(0,1) - bridge(5) - B(10,11): removing the bridge
    // strands island B behind the entry node (min id, island A)
    val corpus = Seq(
      (0L, Array(1.0f, 0.0f)), (1L, Array(0.95f, 0.31f)),
      (5L, Array(0.7f, 0.71f)),
      (10L, Array(0.31f, 0.95f)), (11L, Array(0.0f, 1.0f))
    ).toDF("vec_id", "embedding")
    val g = Seq(
      (0L, 1L, 0.97), (1L, 0L, 0.97), (1L, 5L, 0.88), (5L, 1L, 0.88),
      (5L, 10L, 0.88), (10L, 5L, 0.88), (10L, 11L, 0.97), (11L, 10L, 0.97)
    ).toDF("src_id", "nbr_id", "cos")
    val removals = Seq(5L).toDF("vec_id")
    val surviving = corpus.filter($"vec_id" =!= 5L)
    val pruned = Similarity.graphRemove(g, removals, "vec_id")
    def reach(graph: org.apache.spark.sql.DataFrame) =
      Similarity.graphSearchTopK(corpus.filter($"vec_id" === 11L),
        surviving, graph, "vec_id", "embedding", k = 2, beam = 4,
        hops = 4, dim = 2)
        .collect().map(_.getLong(1)).toSet
    assert(reach(pruned).forall(_ < 10L),
      "tombstone-only graph must strand island B")
    val repaired = Similarity.graphRepair(g, surviving, removals,
      "vec_id", "embedding", k = 2, beam = 4, hops = 4, maxDegree = 4,
      dim = 2)
    // removed node fully gone; degree cap holds
    assert(repaired.filter($"src_id" === 5L || $"nbr_id" === 5L).count() == 0)
    val maxDeg = repaired.groupBy("src_id").count()
      .agg(max("count")).head().getLong(0)
    assert(maxDeg <= 4, s"degree cap violated: $maxDeg")
    // the orphaned island re-links: the same search now crosses to B
    val got = reach(repaired)
    assert(got.contains(10L),
      s"repair must restore reachability into island B, got $got")
  }

  test("graphCompact: rebuild-parity on the survivors; never-present removal ids are no-ops") {
    val e = emb.filter($"vec_id" < 100)
    val cent = e.filter($"vec_id" === 0)
      .select(lit(0).cast("int").as("cell"), $"embedding".as("c_vec"))
    val removals = e.filter($"vec_id" >= 10 && $"vec_id" < 40)
      .select("vec_id")
    val compacted = Similarity.graphCompact(e, removals, cent,
      "vec_id", "embedding", k = 3)
      .select("src_id", "nbr_id", "cos")
    val fresh = Similarity.knnGraph(
      e.filter($"vec_id" < 10 || $"vec_id" >= 40), cent,
      "vec_id", "embedding", k = 3)
      .select("src_id", "nbr_id", "cos")
    assert(compacted.exceptAll(fresh).isEmpty &&
      fresh.exceptAll(compacted).isEmpty,
      "compaction must equal the from-scratch survivor build")
    assert(compacted.filter($"src_id" >= 10 && $"src_id" < 40).count() == 0,
      "no removal-history residue")
    // removal ids that never existed change nothing
    val withGhosts = Similarity.graphCompact(e,
      removals.unionByName(Seq(10000L, 10001L).toDF("vec_id")), cent,
      "vec_id", "embedding", k = 3)
      .select("src_id", "nbr_id", "cos")
    assert(withGhosts.exceptAll(fresh).isEmpty &&
      fresh.exceptAll(withGhosts).isEmpty)
  }

  // ---- PQ-guided graph search (DiskANN shape) --------------------------

  test("graphSearchPqTopK: complete graph + full re-rank collapses to brute force") {
    val e = emb.filter($"vec_id" < 30)
    val ids = e.select($"vec_id").as[Long].collect()
    val complete = ids.flatMap(a => ids.filter(_ != a).map(b => (a, b)))
      .toSeq.toDF("src_id", "nbr_id")
    val cb = Similarity.pqCodebookSeed(emb, "vec_id", "embedding",
      m = 8, ksub = 16, subDim = 8)
    val got = Similarity.graphSearchPqTopK(e.filter($"vec_id" < 3), e,
      complete, cb, "vec_id", "embedding", k = 5, beam = 30, hops = 1,
      rerank = 30)
      .select("q_id", "n_id", "rnk").orderBy("q_id", "rnk")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSeq
    val want = Similarity.bruteForceTopK(e.filter($"vec_id" < 3), e,
      "vec_id", "embedding", k = 5)
      .select("q_id", "n_id", "rnk").orderBy("q_id", "rnk")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSeq
    assert(got == want)
  }

  test("graphSearchPqTopK: rerank=0 over the complete graph equals exhaustive ADC (pqTopK)") {
    val e = emb.filter($"vec_id" < 30)
    val ids = e.select($"vec_id").as[Long].collect()
    val complete = ids.flatMap(a => ids.filter(_ != a).map(b => (a, b)))
      .toSeq.toDF("src_id", "nbr_id")
    val cb = Similarity.pqCodebookSeed(emb, "vec_id", "embedding",
      m = 8, ksub = 16, subDim = 8)
    val got = Similarity.graphSearchPqTopK(e.filter($"vec_id" < 3), e,
      complete, cb, "vec_id", "embedding", k = 5, beam = 30, hops = 1)
      .select("q_id", "n_id", "rnk", "adc").orderBy("q_id", "rnk")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(3))).toSeq
    val want = Similarity.pqTopK(e.filter($"vec_id" < 3), e, cb,
      "vec_id", "embedding", k = 5)
      .select("q_id", "n_id", "rnk", "adc").orderBy("q_id", "rnk")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(3))).toSeq
    assert(got == want)
  }

  test("graphSearchPqTopK: rerank below k refuses") {
    val e = emb.filter($"vec_id" < 20)
    val g = Seq((0L, 1L)).toDF("src_id", "nbr_id")
    val cb = Similarity.pqCodebookSeed(emb, "vec_id", "embedding",
      m = 8, ksub = 16, subDim = 8)
    intercept[IllegalArgumentException] {
      Similarity.graphSearchPqTopK(e, e, g, cb, "vec_id", "embedding",
        k = 5, beam = 8, hops = 1, rerank = 3)
    }
  }

  // ---- hard-negative mining --------------------------------------------

  test("hardNegatives: dense hits are removed, lexical rank order is preserved and re-numbered") {
    val lex = Seq((1L, 10L, 1), (1L, 11L, 2), (1L, 12L, 3), (1L, 13L, 4))
      .toDF("q_id", "n_id", "rnk")
    val dense = Seq((1L, 11L, 1), (1L, 99L, 2)).toDF("q_id", "n_id", "rnk")
    val got = Retrieval.hardNegatives(lex, dense, k = 2)
      .orderBy("rnk").collect()
      .map(r => (r.getLong(1), r.getInt(2), r.getInt(3))).toSeq
    // 11 mined out; 10, 12 survive with lex_rnk 1, 3 re-numbered 1, 2
    assert(got == Seq((10L, 1, 1), (12L, 2, 3)), s"got $got")
  }

  // ---- BM25 ------------------------------------------------------------

  test("bm25: rarer terms score higher; self is excluded; rational idf stays positive") {
    val corpus = Seq(
      (0L, "rare common"),            // the query doc
      (1L, "rare filler filler"),     // matches the rare term
      (2L, "common filler filler"),   // matches the common term, same tf/dl
      (3L, "common filler filler"),
      (4L, "common filler filler")
    ).toDF("doc_id", "text")
    val qt = Seq((0L, "rare"), (0L, "common")).toDF("q_id", "term")
    val got = Retrieval.bm25TopK(qt, corpus, "doc_id", "text", k = 4)
      .orderBy("rnk").collect()
    assert(!got.map(_.getLong(1)).contains(0L), "self must be excluded")
    assert(got.head.getLong(1) == 1L,
      "the rare-term match must outrank the common-term matches")
    got.foreach(r => assert(r.getDouble(3) > 0.0,
      "rational idf is always positive (unlike the log form past df > N/2)"))
  }

  test("bm25: logIdf mode preserves the rare-over-common ordering") {
    val corpus = Seq(
      (0L, "rare common"), (1L, "rare filler filler"),
      (2L, "common filler filler"), (3L, "common filler filler"),
      (4L, "common filler filler"), (5L, "common filler filler"),
      (6L, "other words here"), (7L, "other words here"),
      (8L, "other words here"), (9L, "other words here")
    ).toDF("doc_id", "text")
    val qt = Seq((0L, "rare"), (0L, "common")).toDF("q_id", "term")
    val got = Retrieval.bm25TopK(qt, corpus, "doc_id", "text", k = 5,
      logIdf = true).orderBy("rnk").collect()
    assert(got.head.getLong(1) == 1L)
  }

  test("bm25: length normalization — same tf, shorter doc scores higher") {
    val corpus = Seq(
      (0L, "term"),
      (1L, "term pad"),
      (2L, "term pad pad pad pad pad pad pad")
    ).toDF("doc_id", "text")
    val qt = Seq((99L, "term")).toDF("q_id", "term")
    val got = Retrieval.bm25TopK(qt, corpus, "doc_id", "text", k = 3)
      .orderBy("rnk").collect().map(_.getLong(1)).toSeq
    assert(got == Seq(0L, 1L, 2L), s"dl normalization inverted: $got")
  }

  test("bm25Prf: expansion reaches vocabulary-mismatched docs; expTerms=0 is plain BM25") {
    val corpus = Seq(
      (0L, "alpha"),
      (1L, "alpha beta"),            // feedback doc: shares alpha, carries beta
      (2L, "beta beta gamma"),       // no alpha — invisible without expansion
      (3L, "delta delta delta")
    ).toDF("doc_id", "text")
    val qt = Seq((0L, "alpha")).toDF("q_id", "term")
    val plain = Retrieval.bm25TopK(qt, corpus, "doc_id", "text", k = 4)
      .collect().map(_.getLong(1)).toSet
    assert(plain == Set(1L), s"plain BM25 must see only the alpha doc: $plain")
    val prf = Retrieval.bm25Prf(qt, corpus, "doc_id", "text", k = 4,
      fbDocs = 1, expTerms = 2)
      .collect().map(_.getLong(1)).toSet
    assert(prf.contains(2L),
      s"expansion via 'beta' must recover the mismatched doc: $prf")
    val zero = Retrieval.bm25Prf(qt, corpus, "doc_id", "text", k = 4,
      fbDocs = 1, expTerms = 0)
      .collect().map(_.getLong(1)).toSet
    assert(zero == plain, "expTerms=0 must collapse to plain BM25")
  }

  // ---- BM25 ledger maintenance -----------------------------------------

  test("bm25IndexAppend: replayed batches are absorbed; append == from-scratch rebuild") {
    val ledger = Retrieval.bm25IndexBuild(
      docs.filter($"doc_id" < 250), "doc_id", "text")
    val batch = docs.filter($"doc_id" >= 240)
    val once = Retrieval.bm25IndexAppend(ledger, batch, "doc_id", "text")
    // at-least-once replay: appending the same batch again adds nothing
    val twice = Retrieval.bm25IndexAppend(once, batch, "doc_id", "text")
    assert(once.count() == twice.count(), "replayed append must be a no-op")
    // append == rebuild, row for row
    val rebuild = Retrieval.bm25IndexBuild(docs, "doc_id", "text")
    assert(once.exceptAll(rebuild).isEmpty && rebuild.exceptAll(once).isEmpty)
    // delta face carries ONLY the genuinely new docs (overlap excluded)
    val delta = Retrieval.bm25IndexAppend(ledger, batch, "doc_id", "text",
      deltaOnly = true)
    assert(delta.select("doc_id").distinct().agg(min("doc_id"))
      .head().getLong(0) >= 250)
  }

  test("bm25IndexRemove: takedown == rebuild of survivors; unknown ids are a no-op") {
    val ledger = Retrieval.bm25IndexBuild(docs, "doc_id", "text")
    val removed = Retrieval.bm25IndexRemove(ledger,
      docs.filter($"doc_id" >= 50 && $"doc_id" < 100).select("doc_id"))
    val rebuild = Retrieval.bm25IndexBuild(
      docs.filter($"doc_id" < 50 || $"doc_id" >= 100), "doc_id", "text")
    assert(removed.exceptAll(rebuild).isEmpty && rebuild.exceptAll(removed).isEmpty)
    val noop = Retrieval.bm25IndexRemove(ledger,
      Seq(999999L).toDF("doc_id"))
    assert(noop.count() == ledger.count(),
      "removing never-indexed ids must change nothing")
  }

  test("bm25TopKFromIndex: stored-ledger scores are bit-equal to the tokenize path") {
    val qt = docs.filter($"doc_id" < 3)
      .select($"doc_id".as("q_id"), explode(split($"text", " ")).as("term"))
    val direct = Retrieval.bm25TopK(qt, docs, "doc_id", "text", k = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getDouble(3)))
    val ledger = Retrieval.bm25IndexBuild(docs, "doc_id", "text")
    val stored = Retrieval.bm25TopKFromIndex(qt, ledger, k = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getDouble(3)))
    assert(direct.sortBy(t => (t._1, t._3)).toSeq ==
      stored.sortBy(t => (t._1, t._3)).toSeq)
  }

  // ---- RRF -------------------------------------------------------------

  test("rrfFuse: agreement wins — a candidate in both lists beats single-list peers") {
    val a = Seq((1L, 10L, 2), (1L, 11L, 1)).toDF("q_id", "n_id", "rnk")
    val b = Seq((1L, 10L, 2), (1L, 12L, 1)).toDF("q_id", "n_id", "rnk")
    val got = Retrieval.rrfFuse(Seq(a, b), k = 3)
      .orderBy("rnk").collect()
    assert(got.head.getLong(1) == 10L,
      "rank-2-in-both (2/62) must beat rank-1-in-one (1/61)")
    val rrf10 = got.head.getDouble(3)
    assert(math.abs(rrf10 - 2.0 / 62.0) < 1e-15)
  }

  test("rrfFuse: three-way fusion and absent-list zeros") {
    val a = Seq((1L, 10L, 1)).toDF("q_id", "n_id", "rnk")
    val b = Seq((1L, 10L, 1)).toDF("q_id", "n_id", "rnk")
    val c = Seq((1L, 11L, 1)).toDF("q_id", "n_id", "rnk")
    val got = Retrieval.rrfFuse(Seq(a, b, c), k = 2)
      .collect().map(r => r.getLong(1) -> r.getDouble(3)).toMap
    assert(math.abs(got(10L) - 2.0 / 61.0) < 1e-15)
    assert(math.abs(got(11L) - 1.0 / 61.0) < 1e-15)
  }

  // ---- ranking evaluation ----------------------------------------------

  test("evalRanking: perfect, partial, and zero-hit queries score exactly") {
    val truth = Seq(
      (1L, 10L, 1), (1L, 11L, 2),     // q1: both found
      (2L, 20L, 1), (2L, 21L, 2),     // q2: one found at got-rank 2
      (3L, 30L, 1), (3L, 31L, 2)      // q3: nothing found
    ).toDF("q_id", "n_id", "rnk")
    val got = Seq(
      (1L, 11L, 1), (1L, 10L, 2),
      (2L, 99L, 1), (2L, 20L, 2),
      (3L, 98L, 1), (3L, 97L, 2)
    ).toDF("q_id", "n_id", "rnk")
    val r = Retrieval.evalRanking(got, truth, k = 2)
      .orderBy("q_id").collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getDouble(2), x.getDouble(3)))
    assert(r(0) == ((1L, 2L, 1.0, 1.0)), s"q1: ${r(0)}")
    assert(r(1) == ((2L, 1L, 0.5, 0.5)), s"q2: ${r(1)}")
    assert(r(2) == ((3L, 0L, 0.0, 0.0)), s"q3: ${r(2)}")
  }

  test("evalRanking: an exact index evaluates to recall 1 and rr 1 on every query") {
    val e = emb.filter($"vec_id" < 50)
    val truth = Similarity.bruteForceTopK(e.filter($"vec_id" < 3), e,
      "vec_id", "embedding", k = 5)
    val r = Retrieval.evalRanking(truth, truth, k = 5).collect()
    assert(r.length == 3)
    r.foreach(x => assert(x.getDouble(2) == 1.0 && x.getDouble(3) == 1.0))
  }

  test("phraseMatch: consecutive-only semantics, overlap counting, repeated-term phrases") {
    val corpus = Seq(
      (0L, "a b c d"),   // contains "b c"
      (1L, "c b a"),     // reversed — must NOT match
      (2L, "b x c"),     // gap — must NOT match
      (3L, "b c b c"),   // two occurrences
      (4L, "a a a")      // for the repeated-term phrase
    ).toDF("doc_id", "text")
    val ledger = Retrieval.positionalIndexBuild(corpus, "doc_id", "text")
    val bc = Seq((0L, 0, "b"), (0L, 1, "c")).toDF("q_id", "idx", "term")
    val got = Retrieval.phraseMatch(bc, ledger)
      .collect().map(r => r.getLong(1) -> r.getLong(2)).toMap
    assert(got == Map(0L -> 1L, 3L -> 2L),
      s"phrase 'b c' matches drifted: $got")
    // repeated-term phrase "a a" over "a a a": overlapping bases 0 and 1
    val aa = Seq((1L, 0, "a"), (1L, 1, "a")).toDF("q_id", "idx", "term")
    val got2 = Retrieval.phraseMatch(aa, ledger)
      .collect().map(r => r.getLong(1) -> r.getLong(2)).toMap
    assert(got2 == Map(4L -> 2L), s"'a a' occurrences drifted: $got2")
  }

  test("positionalIndexAppend: append == rebuild; replayed batches are absorbed") {
    val ledger = Retrieval.positionalIndexBuild(
      docs.filter($"doc_id" < 30), "doc_id", "text")
    val batch = docs.filter($"doc_id" >= 20 && $"doc_id" < 50)
    val once = Retrieval.positionalIndexAppend(ledger, batch, "doc_id", "text")
    val rebuild = Retrieval.positionalIndexBuild(
      docs.filter($"doc_id" < 50), "doc_id", "text")
    assert(once.exceptAll(rebuild).isEmpty && rebuild.exceptAll(once).isEmpty,
      "append must equal the from-scratch rebuild")
    val twice = Retrieval.positionalIndexAppend(once, batch, "doc_id", "text")
    assert(twice.count() == once.count(), "replayed batch must be absorbed")
  }

  test("proximityMatch: NEAR/w hits where phrase fails; window bound is inclusive and exact") {
    val corpus = Seq(
      (0L, "b c x"),       // adjacent, in order
      (1L, "c x b"),       // reversed with a gap of 1 — span 2
      (2L, "b x y z c"),   // span 4 — outside NEAR/3
      (3L, "b x y c"),     // span 3 — exactly on the NEAR/3 boundary
      (4L, "b b b")        // missing c entirely
    ).toDF("doc_id", "text")
    val ledger = Retrieval.positionalIndexBuild(corpus, "doc_id", "text")
    val q = Seq((0L, "b"), (0L, "c")).toDF("q_id", "term")
    // phrase "b c" (consecutive, ordered) matches doc 0 only…
    val phrase = Retrieval.phraseMatch(
      Seq((0L, 0, "b"), (0L, 1, "c")).toDF("q_id", "idx", "term"), ledger)
      .collect().map(_.getLong(1)).toSet
    assert(phrase == Set(0L), s"phrase baseline drifted: $phrase")
    // …NEAR/3 additionally matches the reversed doc 1 and the
    // boundary-span doc 3, still excludes span-4 doc 2 and doc 4
    val near = Retrieval.proximityMatch(q, ledger, window = 3)
      .collect().map(r => r.getLong(1) -> r.getLong(2)).toMap
    assert(near.keySet == Set(0L, 1L, 3L),
      s"NEAR/3 match set drifted: $near")
    // anchors: doc 0 — base 0 covers {b@0, c@1}, base 1 covers c only
    // (no b in [1,4]… b@0 is BEFORE the anchor) → 1 anchor; doc 3 —
    // only base 0 spans both ends → 1 anchor
    assert(near(0L) == 1L && near(3L) == 1L, s"anchor counts drifted: $near")
    // window=0 collapses to single-position cover: multi-term queries
    // can never match
    assert(Retrieval.proximityMatch(q, ledger, window = 0).isEmpty)
    // zero-length query terms drop (the phraseMatch posture): a query
    // with an empty slot still matches on its real terms
    val qEmpty = Seq((0L, "b"), (0L, ""), (0L, "c")).toDF("q_id", "term")
    val near2 = Retrieval.proximityMatch(qEmpty, ledger, window = 3)
      .collect().map(_.getLong(1)).toSet
    assert(near2 == Set(0L, 1L, 3L), s"empty-term query drifted: $near2")
  }

  test("lmTopKFromIndex: hand-computed Dirichlet scores; OOV terms drop from n_q; length penalty orders") {
    // corpus: T = 6 total tokens, cf(a)=3, cf(b)=2, cf(z)=1
    val corpus = Seq(
      (0L, "a b"),      // the query doc
      (1L, "a a"),      // short, tf(a)=2
      (2L, "a b z")     // longer, has both terms once
    ).toDF("doc_id", "text")
    val tf = Retrieval.bm25IndexBuild(corpus, "doc_id", "text")
    val qt = Seq((0L, "a"), (0L, "b"), (0L, "oov")).toDF("q_id", "term")
    val got = Retrieval.lmTopKFromIndex(qt, tf, k = 3, mu = 2.0)
      .collect().map(r => r.getLong(1) -> r.getDouble(3)).toMap
    // T = 7 tokens, cf(a) = 4, cf(b) = 2; n_q = 2 (oov has no
    // collection mass and drops); mu = 2; doc 0 is the query's self
    // doc 1: {a: 1 + 2*7/(2*4) = 2.75}, dl 2 -> penalty (2/4)^2
    val d1 = (1.0 * 2.75) * ((1.0 * 0.5) * 0.5)
    // doc 2: {a: 1 + 7/8 = 1.875} * {b: 1 + 7/4 = 2.75}, dl 3 -> (2/5)^2
    val d2 = ((1.0 * 1.875) * 2.75) * ((1.0 * 0.4) * 0.4)
    assert(math.abs(got(1L) - d1) < 1e-12 && math.abs(got(2L) - d2) < 1e-12,
      s"hand-computed QL scores drifted: $got (want 1->$d1, 2->$d2)")
    assert(got(2L) > got(1L), "both-terms doc must outrank the single-term doc")
  }

  test("bestWindow: densest span wins, earliest on ties, every matching doc reported") {
    val corpus = Seq(
      (0L, "a x b x x a b c"),  // [5,8] covers a,b,c — the densest
      (1L, "a x x x b"),        // no span covers both within w=3
      (2L, "c c c")             // single distinct term, window at 0
    ).toDF("doc_id", "text")
    val ledger = Retrieval.positionalIndexBuild(corpus, "doc_id", "text")
    val qt = Seq((9L, "a"), (9L, "b"), (9L, "c")).toDF("q_id", "term")
    val got = Retrieval.bestWindow(qt, ledger, window = 3)
      .collect().map(r => r.getLong(1) -> (r.getInt(2), r.getLong(3))).toMap
    assert(got(0L) == (5, 3L), s"densest window drifted: ${got(0L)}")
    // doc 1: best any-window covers 1 term; earliest start = pos 0
    assert(got(1L) == (0, 1L), s"tie-to-earliest drifted: ${got(1L)}")
    assert(got(2L) == (0, 1L), s"single-term doc drifted: ${got(2L)}")
  }

  test("linearFuse: min-max normalization, degenerate-list guard, absent-side zero, weights") {
    val a = Seq((0L, 1L, 1, 10.0), (0L, 2L, 2, 5.0), (0L, 3L, 3, 0.0))
      .toDF("q_id", "n_id", "rnk", "score")
    val b = Seq((0L, 2L, 1, 7.0), (0L, 4L, 2, 7.0)) // degenerate: max = min
      .toDF("q_id", "n_id", "rnk", "score")
    val got = Retrieval.linearFuse(Seq((a, 0.6), (b, 0.4)), k = 4)
      .collect().map(r => r.getLong(1) -> r.getDouble(3)).toMap
    // a normalizes to {1: 1.0, 2: 0.5, 3: 0.0}; b's degenerate list is
    // 1.0 for both; fused = 0.6*na + 0.4*nb with absent sides 0
    assert(got(1L) == 0.6 && got(2L) == 0.6 * 0.5 + 0.4 &&
      got(3L) == 0.0 && got(4L) == 0.4,
      s"fused scores drifted: $got")
    // candidate 2 (in both lists) must outrank 1 (first list only)
    val order = Retrieval.linearFuse(Seq((a, 0.6), (b, 0.4)), k = 4)
      .orderBy("rnk").collect().map(_.getLong(1)).toSeq
    assert(order.head == 2L, s"fusion order drifted: $order")
  }

  test("filtered indexed ANN: every hit passes the predicate; unfiltered ranks preserved on the allowed subset") {
    val e = emb.filter($"vec_id" < 200)
    val cent = e.filter($"vec_id" < 8)
      .select($"vec_id".cast("int").as("cell"), $"embedding".as("c_vec"))
    val cb = Similarity.pqCodebookSeed(e, "vec_id", "embedding",
      m = 8, ksub = 16, subDim = 8)
    val ledger = Similarity.pqIndexBuild(e, cent, cb, "vec_id", "embedding")
    val allowed = e.filter($"label" < 5).select("vec_id")
    val q = e.filter($"vec_id" < 3)
    val got = Similarity.ivfPqTopKFromIndex(q,
      ledger.join(allowed, Seq("vec_id"), "left_semi"), cent, cb,
      "vec_id", "embedding", k = 5, nProbe = 4)
    val labels = e.select($"vec_id".as("n_id"), $"label")
    assert(got.join(labels, "n_id").filter($"label" >= 5).count() == 0,
      "a filtered-out vector leaked into the results")
    // restriction never rescores: the filtered top-k is the unfiltered
    // candidate list with disallowed rows dropped and ranks renumbered
    val unf = Similarity.ivfPqTopKFromIndex(q, ledger, cent, cb,
      "vec_id", "embedding", k = 200, nProbe = 4)
      .join(allowed.select($"vec_id".as("n_id")), Seq("n_id"), "left_semi")
      .withColumn("rr", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("q_id")
          .orderBy($"rnk")))
      .filter($"rr" <= 5)
      .select($"q_id", $"n_id")
    assert(got.select($"q_id", $"n_id").exceptAll(unf).isEmpty &&
      unf.exceptAll(got.select($"q_id", $"n_id")).isEmpty,
      "filtered serve must equal drop-and-renumber of the unfiltered scan")
  }

  test("orderedNearMatch: order enforced, slop honored, greedy chain is exact, short phrases finish early") {
    val corpus = Seq(
      (0L, "b x c"),       // ordered, span 2 — matches NEAR/3 ordered
      (1L, "c x b"),       // reversed — unordered NEAR/3 hits, ordered must NOT
      (2L, "b x y z c"),   // span 4 — outside the window
      (3L, "b c d c"),     // greedy case: c@1 then d@2 completes; c@3 would dead-end
      (4L, "b c")          // for the 2-term query
    ).toDF("doc_id", "text")
    val ledger = Retrieval.positionalIndexBuild(corpus, "doc_id", "text")
    val bc = Seq((0L, 0, "b"), (0L, 1, "c")).toDF("q_id", "idx", "term")
    val got = Retrieval.orderedNearMatch(bc, ledger, window = 3)
      .collect().map(r => r.getLong(1) -> r.getLong(2)).toMap
    assert(got.keySet == Set(0L, 3L, 4L),
      s"ordered NEAR/3 'b c' match set drifted: $got")
    val bcd = Seq((1L, 0, "b"), (1L, 1, "c"), (1L, 2, "d"))
      .toDF("q_id", "idx", "term")
    val got3 = Retrieval.orderedNearMatch(bcd, ledger, window = 3)
      .collect().map(r => r.getLong(1) -> r.getLong(2)).toMap
    assert(got3 == Map(3L -> 1L),
      s"greedy must take c@1 (not c@3) and complete with d@2: $got3")
    // mixed lengths in ONE call: the 2-term query finishes one round
    // before the 3-term one and must carry through the done leg
    val mixed = Retrieval.orderedNearMatch(bc.unionByName(bcd), ledger,
      window = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(mixed == Set((0L, 0L), (0L, 3L), (0L, 4L), (1L, 3L)),
      s"mixed-length phrase batch drifted: $mixed")
  }

  test("phraseBoostTopK: phrase presence outranks a better bag-of-words score; no phrase = plain BM25 order") {
    // doc 10 repeats the terms (high tf, higher BM25) but never as the
    // phrase; doc 11 has them ONCE but adjacent — the boost must flip
    val corpus2 = Seq(
      (9L, "q w"),
      (10L, "q z w z q z w z q z"),
      (11L, "q w z z z z"),
      (12L, "z z z z z z")
    ).toDF("doc_id", "text")
    val tf = Retrieval.bm25IndexBuild(corpus2, "doc_id", "text")
    val pos = Retrieval.positionalIndexBuild(corpus2, "doc_id", "text")
    val qt = Seq((9L, "q"), (9L, "w")).toDF("q_id", "term")
    val ph = Seq((9L, 0, "q"), (9L, 1, "w")).toDF("q_id", "idx", "term")
    val plain = Retrieval.bm25TopKFromIndex(qt, tf, k = 3)
      .orderBy("rnk").collect().map(_.getLong(1)).toSeq
    assert(plain.head == 10L, s"bag-of-words baseline drifted: $plain")
    val boosted = Retrieval.phraseBoostTopK(qt, ph, tf, pos, k = 3,
      boost = 1.5)
      .orderBy("rnk").collect().map(_.getLong(1)).toSeq
    assert(boosted.head == 11L,
      s"the phrase doc must outrank the bag doc under the boost: $boosted")
    // a phrase that matches nothing leaves the ranking = plain BM25
    val phNone = Seq((9L, 0, "w"), (9L, 1, "q")).toDF("q_id", "idx", "term")
    val same = Retrieval.phraseBoostTopK(qt, phNone, tf, pos, k = 3)
      .orderBy("rnk").collect().map(_.getLong(1)).toSeq
    assert(same == plain, s"no-match boost must be a no-op: $same vs $plain")
  }

  test("positional remove: takedown == rebuild of survivors; removed docs vanish from phrase hits") {
    val ledger = Retrieval.positionalIndexBuild(
      docs.filter($"doc_id" < 50), "doc_id", "text")
    val removals = docs.filter($"doc_id" >= 20 && $"doc_id" < 30)
      .select("doc_id")
    val pruned = Retrieval.bm25IndexRemove(ledger, removals)
    val rebuild = Retrieval.positionalIndexBuild(
      docs.filter($"doc_id" < 20 || ($"doc_id" >= 30 && $"doc_id" < 50)),
      "doc_id", "text")
    assert(pruned.exceptAll(rebuild).isEmpty && rebuild.exceptAll(pruned).isEmpty,
      "positional takedown must equal the from-scratch survivor rebuild")
    // a phrase drawn from a REMOVED doc no longer matches it
    val ph = docs.filter($"doc_id" === 25)
      .select($"doc_id".as("q_id"),
        posexplode(slice(split($"text", " "), 1, 3)).as(Seq("idx", "term")))
    val hits = Retrieval.phraseMatch(ph, pruned)
      .collect().map(_.getLong(1)).toSet
    assert(!hits.contains(25L), s"removed doc still matches: $hits")
  }

  test("mmrRerank: a near-duplicate of the first pick defers to a diverse candidate; lambda=1 is plain top-k") {
    val corpus = Seq(
      (0L, Array(1.0f, 0.0f)),    // the query
      (1L, Array(0.99f, 0.14f)),  // best hit
      (2L, Array(0.99f, 0.14f)),  // identical to 1 — a near-dup candidate
      (3L, Array(0.14f, -0.99f))  // orthogonal to the best hit: zero
                                  // penalty, modest relevance — beats
                                  // the duplicate's cos-1 penalty
    ).toDF("vec_id", "embedding")
    val cand = Similarity.bruteForceTopK(corpus.filter($"vec_id" === 0L),
      corpus, "vec_id", "embedding", k = 3, dim = 2)
      .select($"q_id", $"n_id", $"cos".as("score"))
    def picks(lambda: Double) =
      Retrieval.mmrRerank(cand, corpus, "vec_id", "embedding", k = 2,
        lambda = lambda, dim = 2)
        .orderBy("pick").collect().map(_.getLong(1)).toSeq
    // relevance order is 1, 2, 3 (tie 1-vs-2 to the lower id); with the
    // diversity penalty the duplicate of pick 1 loses to candidate 3
    assert(picks(0.5) == Seq(1L, 3L), s"diversity pick drifted: ${picks(0.5)}")
    // lambda = 1 removes the penalty entirely: plain relevance order
    assert(picks(1.0) == Seq(1L, 2L), s"lambda=1 must be top-k: ${picks(1.0)}")
  }

  // ---- MaxSim ----------------------------------------------------------

  test("maxSimTopK: an identical bag under another doc id scores |Q| (cos 1 per query vector)") {
    val q = Seq(
      (0, 0L, Array(1.0f, 0.0f)), (0, 1L, Array(0.0f, 1.0f))
    ).toDF("doc", "vec_id", "embedding")
    val clone = Seq(
      (7, 10L, Array(1.0f, 0.0f)), (7, 11L, Array(0.0f, 1.0f)),
      (8, 20L, Array(1.0f, 0.0f)), (8, 21L, Array(-1.0f, 0.0f))
    ).toDF("doc", "vec_id", "embedding")
    val got = Retrieval.maxSimTopK(q, q.union(clone),
      "doc", "vec_id", "embedding", k = 2, dim = 2)
      .orderBy("rnk").collect()
    assert(got.head.getInt(1) == 7, "the cloned bag must rank first")
    assert(math.abs(got.head.getDouble(3) - 2.0) < 1e-12,
      "identical bag scores exactly |Q|")
    // doc 8 covers only the first query vector (max cos 1 + 0) = 1
    assert(math.abs(got(1).getDouble(3) - 1.0) < 1e-12)
  }

  test("maxSimRerank: a full shortlist collapses to maxSimTopK; pruned docs never rank") {
    val mv = emb.filter($"vec_id" < 96)
      .withColumn("doc", expr("CAST(vec_id DIV 16 AS INT)"))
    val q = mv.filter($"doc" < 2)
    val allPairs = q.select($"doc".as("q_doc")).distinct()
      .crossJoin(mv.select($"doc".as("n_doc")).distinct())
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("q_doc", "rnk").collect()
        .map(r => (r.getInt(0), r.getInt(1), r.getInt(2), r.getDouble(3)))
        .toSeq
    val full = rows(Retrieval.maxSimRerank(allPairs, q, mv,
      "doc", "vec_id", "embedding", k = 3))
    val direct = rows(Retrieval.maxSimTopK(q, mv,
      "doc", "vec_id", "embedding", k = 3))
    assert(full == direct,
      "restriction to the complete pair set must be bit-identical")
    // pruning the winner from the shortlist: it can never rank
    val winner = direct.head._2
    val pruned = allPairs.filter($"n_doc" =!= winner)
    val got = rows(Retrieval.maxSimRerank(pruned, q, mv,
      "doc", "vec_id", "embedding", k = 3))
    assert(!got.exists(_._2 == winner), "a pruned doc leaked into the re-rank")
  }

  test("maxSimTopK: query-side size guard refuses") {
    val mv = emb.withColumn("doc", expr("CAST(vec_id DIV 16 AS INT)"))
    intercept[IllegalArgumentException] {
      Retrieval.maxSimTopK(mv, mv, "doc", "vec_id", "embedding",
        k = 2, maxQueryVecs = 3)
    }
  }

  test("maxSimTopK: a zero-norm query vector contributes 0, never nulls the doc score") {
    val q = Seq(
      (0, 0L, Array(1.0f, 0.0f)),
      (0, 1L, Array(0.0f, 0.0f)) // zero-norm: cos null vs EVERY corpus vec
    ).toDF("doc", "vec_id", "embedding")
    val corpus = Seq(
      (7, 10L, Array(1.0f, 0.0f)), (8, 20L, Array(0.0f, 1.0f))
    ).toDF("doc", "vec_id", "embedding")
    val got = Retrieval.maxSimTopK(q, q.union(corpus),
      "doc", "vec_id", "embedding", k = 2, dim = 2)
      .orderBy("rnk").collect()
    assert(got.length == 2, s"both corpus docs must rank, got ${got.length}")
    // doc 7: max cos from vec 0 alone = 1.0; the zero-norm vector adds 0
    assert(got.head.getInt(1) == 7)
    assert(math.abs(got.head.getDouble(3) - 1.0) < 1e-12,
      s"zero-norm query vector must contribute 0, got ${got.head.getDouble(3)}")
    assert(!got.exists(_.isNullAt(3)), "no null maxsim may survive")
    // a query doc whose vectors are ALL zero-norm drops entirely
    val allZero = Seq((1, 2L, Array(0.0f, 0.0f)))
      .toDF("doc", "vec_id", "embedding")
    val dropped = Retrieval.maxSimTopK(allZero, corpus,
      "doc", "vec_id", "embedding", k = 2, dim = 2).collect()
    assert(dropped.isEmpty, "an unmatchable query doc drops, never null-ranks")
  }

  test("evalRanking: truth shorter than k divides by the actual truth count") {
    // truth carries only 2 rows for q1 — a perfect candidate must score 1.0
    val truth = Seq((1L, 10L, 1), (1L, 11L, 2)).toDF("q_id", "n_id", "rnk")
    val got = Seq((1L, 10L, 1), (1L, 11L, 2), (1L, 12L, 3))
      .toDF("q_id", "n_id", "rnk")
    val r = Retrieval.evalRanking(got, truth, k = 5).collect()
    assert(r.length == 1)
    assert(r.head.getLong(1) == 2L)
    assert(r.head.getDouble(2) == 1.0,
      s"recall must reach 1.0 with truncated truth, got ${r.head.getDouble(2)}")
  }

  test("bm25IndexBuild: zero-length tokens from repeated spaces never become terms") {
    val corpus = Seq(
      (0L, "alpha  beta"), // double space mints a "" token if unfiltered
      (1L, " alpha beta "), (2L, "gamma")
    ).toDF("doc_id", "text")
    val ledger = Retrieval.bm25IndexBuild(corpus, "doc_id", "text")
    val terms = ledger.select("term").distinct()
      .collect().map(_.getString(0)).toSet
    assert(terms == Set("alpha", "beta", "gamma"),
      s"phantom empty term leaked: $terms")
    // dl must count only real tokens: doc 0 and doc 1 both have dl = 2
    val dl = ledger.groupBy("doc_id").agg(sum("tf").as("dl"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(dl == Map(0L -> 2L, 1L -> 2L, 2L -> 1L), s"dl drifted: $dl")
  }

  test("bm25TopKFromIndexFiltered: allowed docs keep their unfiltered scores; disallowed never rank") {
    val dcs = graft.Tables.documents(spark, sf)
    val ledger = Retrieval.bm25IndexBuild(dcs, "doc_id", "text")
    val qt = dcs.filter(col("doc_id") < 3)
      .select(col("doc_id").as("q_id"),
        explode(split(col("text"), " ")).as("term"))
    val allowed = dcs.filter(col("doc_id") % 3 === 0).select("doc_id")
    val filtered = Retrieval.bm25TopKFromIndexFiltered(
      qt, ledger, allowed, k = 10)
    // no disallowed candidate ranks
    assert(filtered.filter(col("doc_id") % 3 =!= 0).isEmpty,
      "a disallowed doc ranked")
    // global stats: an allowed doc's score is bit-identical to its
    // unfiltered score (the filter changes WHO ranks, never HOW a doc
    // scores) — so the filtered ranking is the allowed restriction of
    // a big-k unfiltered ranking
    val unf = Retrieval.bm25TopKFromIndex(qt, ledger, k = 10000)
      .filter(col("doc_id") % 3 === 0)
      .withColumn("rnk", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("q_id")
          .orderBy(col("score").desc, col("doc_id").asc)))
      .filter(col("rnk") <= 10)
      .select("q_id", "doc_id", "rnk", "score")
    val f2 = filtered.select(col("q_id"), col("doc_id"),
      col("rnk").cast("int").as("rnk"), col("score"))
    assert(f2.exceptAll(unf).isEmpty && unf.exceptAll(f2).isEmpty,
      "filtered serve drifted from the allowed restriction of the " +
        "unfiltered ranking")
  }

  // ---- stats ledgers + the O(query) serve ------------------------------

  test("bm25 stats ledgers: append/remove fold to the from-scratch rebuild; df=0 terms drop; empty delta is a no-op") {
    val base = Seq((1L, "a b a"), (2L, "b c")).toDF("doc_id", "text")
    val batch = Seq((3L, "c d")).toDF("doc_id", "text")
    val l0 = Retrieval.bm25IndexBuild(base, "doc_id", "text")
    val st0 = Retrieval.bm25TermStatsBuild(l0)
    val g0 = Retrieval.bm25GlobalStatsBuild(l0)
    val delta = Retrieval.bm25IndexAppend(l0, batch, "doc_id", "text",
      deltaOnly = true)
    val lAll = Retrieval.bm25IndexBuild(base.unionByName(batch),
      "doc_id", "text")
    val stAll = Retrieval.bm25TermStatsBuild(lAll)
    // append ≡ rebuild of the unioned corpus (term "d" minted fresh)
    val stApp = Retrieval.bm25TermStatsAppend(st0, delta)
    assert(stApp.exceptAll(stAll).isEmpty && stAll.exceptAll(stApp).isEmpty,
      "term-stats append drifted from the rebuild")
    val gApp = Retrieval.bm25GlobalStatsAppend(g0, delta).head()
    val gAll = Retrieval.bm25GlobalStatsBuild(lAll).head()
    assert(gApp == gAll, s"global append $gApp != rebuild $gAll")
    // remove doc 3 ≡ rebuild of the base corpus — and term "d", whose
    // df reaches 0, must VANISH from the ledger's rows
    val removedTf = lAll.join(Seq(3L).toDF("doc_id"),
      Seq("doc_id"), "left_semi")
    val stRem = Retrieval.bm25TermStatsRemove(stAll, removedTf)
    assert(stRem.exceptAll(st0).isEmpty && st0.exceptAll(stRem).isEmpty,
      "term-stats remove drifted from the rebuild")
    assert(stRem.filter(col("term") === "d").isEmpty,
      "a df=0 term survived the takedown")
    val gRem = Retrieval.bm25GlobalStatsRemove(
      Retrieval.bm25GlobalStatsBuild(lAll), removedTf).head()
    assert(gRem == g0.head(), "global remove drifted from the rebuild")
    // an empty delta leaves both ledgers untouched (+0/+0, no rows)
    val stNoop = Retrieval.bm25TermStatsAppend(st0, l0.limit(0))
    assert(stNoop.exceptAll(st0).isEmpty && st0.exceptAll(stNoop).isEmpty)
    assert(Retrieval.bm25GlobalStatsAppend(g0, l0.limit(0)).head() ==
      g0.head())
  }

  test("bm25TopKFromStats == bm25TopKFromIndex bit-for-bit; bucket-pruned serve identical") {
    val dcs = docs.filter(col("doc_id") < 200)
    val qt = dcs.filter(col("doc_id") < 3)
      .select(col("doc_id").as("q_id"),
        explode(split(col("text"), " ")).as("term"))
    val ledger = Retrieval.bm25IndexBuild(dcs, "doc_id", "text")
    val want = Retrieval.bm25TopKFromIndex(qt, ledger, k = 10)
      .collect().map(_.toSeq).sortBy(_.toString)
    assert(want.nonEmpty)
    val norm = Retrieval.withDocNorms(ledger)
    val st = Retrieval.bm25TermStatsBuild(ledger)
    val g = Retrieval.bm25GlobalStatsBuild(ledger)
    val got = Retrieval.bm25TopKFromStats(qt, norm, st, g, k = 10)
      .collect().map(_.toSeq).sortBy(_.toString)
    assert(got.toSeq == want.toSeq,
      "stats serve drifted from the full-derivation serve")
    // pruning postings AND stats to the query terms' hash buckets is a
    // semantic no-op on the serve (bkt is a function of the term)
    val qterms = qt.select("term").distinct()
    val postB = Ledger.withHashBucket(norm, "term", 16)
    val statB = Ledger.withHashBucket(st, "term", 16)
    val gotPr = Retrieval.bm25TopKFromStats(qt,
        Ledger.prunedToKeys(postB, qterms, "term", 16),
        Ledger.prunedToKeys(statB, qterms, "term", 16), g, k = 10)
      .collect().map(_.toSeq).sortBy(_.toString)
    assert(gotPr.toSeq == want.toSeq,
      "bucket-pruned serve drifted from the full-derivation serve")
  }

  test("lmTopKFromStats == lmTopKFromIndex bit-for-bit; OOV query terms still drop from n_q") {
    val dcs = docs.filter(col("doc_id") < 200)
    val qt = dcs.filter(col("doc_id") < 3)
      .select(col("doc_id").as("q_id"),
        explode(split(col("text"), " ")).as("term"))
      // an out-of-vocabulary term per query: must not perturb n_q in
      // either path (no smoothed mass — the standard treatment)
      .unionByName(Seq((0L, "zzoov"), (1L, "zzoov"), (2L, "zzoov"))
        .toDF("q_id", "term"))
    val ledger = Retrieval.bm25IndexBuild(dcs, "doc_id", "text")
    val want = Retrieval.lmTopKFromIndex(qt, ledger, k = 10, mu = 1000.0)
      .collect().map(_.toSeq).sortBy(_.toString)
    assert(want.nonEmpty)
    val got = Retrieval.lmTopKFromStats(qt,
        Retrieval.withDocNorms(ledger),
        Retrieval.bm25TermStatsBuild(ledger),
        Retrieval.bm25GlobalStatsBuild(ledger), k = 10, mu = 1000.0)
      .collect().map(_.toSeq).sortBy(_.toString)
    assert(got.toSeq == want.toSeq,
      "stats-ledger LM serve drifted from the full-derivation serve")
  }

  test("withDocNorms: dl is the per-document token total and appending other docs never changes it") {
    val a = Seq((1L, "x y x"), (2L, "y z")).toDF("doc_id", "text")
    val la = Retrieval.withDocNorms(
      Retrieval.bm25IndexBuild(a, "doc_id", "text"))
    val dl = la.select("doc_id", "dl").distinct()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(dl == Map(1L -> 3L, 2L -> 2L), s"dl drifted: $dl")
    // doc 1's rows under a grown corpus are bit-identical — dl is a
    // per-document fact, which is what makes the column append-safe
    val b = Seq((1L, "x y x"), (2L, "y z"), (3L, "x"))
      .toDF("doc_id", "text")
    val lb = Retrieval.withDocNorms(
      Retrieval.bm25IndexBuild(b, "doc_id", "text"))
      .filter(col("doc_id") === 1)
    val one = la.filter(col("doc_id") === 1)
    assert(lb.exceptAll(one).isEmpty && one.exceptAll(lb).isEmpty)
  }
}
