package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators.{Retrieval, Similarity}

/** Measured-recall report for every approximate index family against
  * exact brute-force truth — the engine measuring its own indexes
  * ([[Retrieval.evalRanking]] driven across the whole ANN surface):
  * `runMain graft.tools.RecallReport [sfDir] [nQueries] [k]`.
  *
  * Prints one line per family: recall@k and MRR as the MEAN of
  * [[Retrieval.evalRanking]]'s own per-query columns — the report and
  * the operator define recall identically (per-query denominator
  * min(k, |truth@k|)), so a truth list shorter than k scores the same
  * here as under the gates. The means are double sums over ≤ n rows —
  * REPORT quantities, not gate hashes, so the unordered aggregate is
  * acceptable and noted. Configurations mirror the gated queries' so
  * the numbers explain the gates' approximation contracts
  * quantitatively. */
object RecallReport {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val nQ = if (args.length > 1) args(1).toInt else 50
    val k = if (args.length > 2) args(2).toInt else 10
    val spark = graft.GraftSession.create()
    val e = graft.Tables.embeddings(spark, sfDir)
    val q = e.filter(col("vec_id") < nQ)
    val truth = graft.operators.Lineage.truncate(
      Similarity.bruteForceTopK(q, e, "vec_id", "embedding", k))
    val cent = e.filter(col("vec_id") < 16)
      .select(col("vec_id").cast("int").as("cell"), col("embedding").as("c_vec"))
    val cb = Similarity.pqCodebookSeed(e, "vec_id", "embedding",
      m = 8, ksub = 16, subDim = 8)
    val cbT = Similarity.pqCodebookTrain(e, cb, "vec_id", "embedding")
    lazy val cbF = Similarity.pqCodebookTrain(e, cb, "vec_id", "embedding",
      steps = 10, toFixpoint = true)
    // OPQ-lite space: everything (corpus, queries, centroids) permutes
    // identically — cosine routing is permutation-invariant, so the
    // routed candidate sets match the raw space exactly
    lazy val perm = Similarity.opqPermutation(e, "embedding", dim = 64, m = 8)
    lazy val pe = graft.operators.Lineage.truncate(
      Similarity.permuteVectors(e, "embedding", perm))
    lazy val pq2 = pe.filter(col("vec_id") < nQ)
    lazy val pcent = pe.filter(col("vec_id") < 16)
      .select(col("vec_id").cast("int").as("cell"),
        col("embedding").as("c_vec"))
    lazy val pcb = Similarity.pqCodebookSeed(pe, "vec_id", "embedding",
      m = 8, ksub = 16, subDim = 8)
    lazy val pcbF = Similarity.pqCodebookTrain(pe, pcb, "vec_id", "embedding",
      steps = 10, toFixpoint = true)
    val stats = Similarity.sqStats(e, "embedding", dim = 64)
    lazy val graph = Similarity.knnGraph(e, cent, "vec_id", "embedding", k = 8)
      .select("src_id", "nbr_id", "cos")
    lazy val graphC = Similarity.knnGraphConnected(e, cent,
      "vec_id", "embedding", k = 8, cellNeighbors = 3)
    val families: Seq[(String, () => DataFrame)] = Seq(
      "lsh(4 planes)" -> (() =>
        Similarity.lshTopK(q, e, "vec_id", "embedding", k, nPlanes = 4)),
      "lsh_multiprobe(4 planes)" -> (() =>
        Similarity.lshMultiProbeTopK(q, e, "vec_id", "embedding", k, nPlanes = 4)),
      "ivf_flat(4/16)" -> (() =>
        Similarity.ivfTopK(q, e, "vec_id", "embedding", k, nCells = 16, nProbe = 4)),
      "ivf_pq_seed(4/16)" -> (() =>
        Similarity.ivfPqTopK(q, e, cent, cb, "vec_id", "embedding", k, nProbe = 4)),
      "ivf_pq_trained(4/16)" -> (() =>
        Similarity.ivfPqTopK(q, e, cent, cbT, "vec_id", "embedding", k, nProbe = 4)),
      "ivf_pq_rerank(4/16,r=3k)" -> (() =>
        Similarity.ivfPqTopK(q, e, cent, cb, "vec_id", "embedding", k,
          nProbe = 4, rerank = 3 * k)),
      "ivf_sq8(4/16)" -> (() =>
        Similarity.ivfSqTopK(q, e, cent, stats, "vec_id", "embedding", k, nProbe = 4)),
      "sq8_flat" -> (() =>
        Similarity.sqTopK(q, e, stats, "vec_id", "embedding", k)),
      "binary_hamming" -> (() =>
        Similarity.hammingTopK(q, e, "vec_id", "embedding", k)),
      "binary_rerank(r=3k)" -> (() =>
        Similarity.hammingTopK(q, e, "vec_id", "embedding", k, rerank = 3 * k)),
      "pq_adc_exhaustive" -> (() =>
        Similarity.pqTopK(q, e, cb, "vec_id", "embedding", k)),
      "pq_fixpoint(<=10 steps)" -> (() =>
        Similarity.pqTopK(q, e, cbF, "vec_id", "embedding", k)),
      "ivf_pq_fixpoint(4/16)" -> (() =>
        Similarity.ivfPqTopK(q, e, cent, cbF, "vec_id", "embedding", k,
          nProbe = 4)),
      "pq_opq_seed" -> (() =>
        Similarity.pqTopK(pq2, pe, pcb, "vec_id", "embedding", k)),
      "pq_opq_fixpoint" -> (() =>
        Similarity.pqTopK(pq2, pe, pcbF, "vec_id", "embedding", k)),
      "ivf_pq_opq_fixpoint(4/16)" -> (() =>
        Similarity.ivfPqTopK(pq2, pe, pcent, pcbF, "vec_id", "embedding", k,
          nProbe = 4)),
      "ivf_pq_fixpoint_rerank(4/16,r=3k)" -> (() =>
        Similarity.ivfPqTopK(q, e, cent, cbF, "vec_id", "embedding", k,
          nProbe = 4, rerank = 3 * k)),
      // the gated mid-size budget (ann_pq_trained_k64; the GATE pins
      // 2 Lloyd steps for oracle cost — the report trains to fixpoint
      // so all three codeword-budget points share one protocol)
      "pq_fixpoint_ksub64" -> (() =>
        Similarity.pqTopK(q, e,
          Similarity.pqCodebookTrain(e,
            Similarity.pqCodebookSeed(e, "vec_id", "embedding",
              m = 8, ksub = 64, subDim = 8),
            "vec_id", "embedding", steps = 10, toFixpoint = true),
          "vec_id", "embedding", k)),
      // production codebook budget (ksub=256, the FAISS default): the
      // gates pin ksub=16 for oracle cost; quality at the real size is
      // a REPORT number
      "pq_fixpoint_ksub256" -> (() =>
        Similarity.pqTopK(q, e,
          Similarity.pqCodebookTrain(e,
            Similarity.pqCodebookSeed(e, "vec_id", "embedding",
              m = 8, ksub = 256, subDim = 8),
            "vec_id", "embedding", steps = 10, toFixpoint = true),
          "vec_id", "embedding", k)),
      "graph(beam16,hops4)" -> (() =>
        Similarity.graphSearchTopK(q, e, graph, "vec_id", "embedding", k,
          beam = 16, hops = 4)),
      "graph_pq_rerank(beam16,hops4,r=16)" -> (() =>
        Similarity.graphSearchPqTopK(q, e, graph, cb, "vec_id", "embedding", k,
          beam = 16, hops = 4, rerank = 16)),
      "graph_connected(beam16,hops8)" -> (() =>
        Similarity.graphSearchTopK(q, e, graphC, "vec_id", "embedding", k,
          beam = 16, hops = 8)),
      "graph_multientry(4probes,beam16,hops4)" -> (() =>
        Similarity.graphSearchTopK(q, e, graph, "vec_id", "embedding", k,
          beam = 16, hops = 4, entries = Some(
            Similarity.graphEntries(q, e, cent, "vec_id", "embedding",
              nProbe = 4)))),
      "graph_conn_multientry(4probes,beam16,hops4)" -> (() =>
        Similarity.graphSearchTopK(q, e, graphC, "vec_id", "embedding", k,
          beam = 16, hops = 4, entries = Some(
            Similarity.graphEntries(q, e, cent, "vec_id", "embedding",
              nProbe = 4)))),
      // matryoshka prefix-width curve (ann_matryoshka_topk's serving
      // pattern): stage-1 arithmetic AND — with a stored prefix
      // ledger — scan I/O scale with dPrefix/64; recall measures what
      // each truncation level costs at a fixed rerank budget
      "matryoshka(d8,r=3k)" -> (() =>
        Similarity.matryoshkaTopK(q, e, "vec_id", "embedding", k,
          dPrefix = 8, rerank = 3 * k)),
      "matryoshka(d16,r=3k)" -> (() =>
        Similarity.matryoshkaTopK(q, e, "vec_id", "embedding", k,
          dPrefix = 16, rerank = 3 * k)),
      "matryoshka(d32,r=3k)" -> (() =>
        Similarity.matryoshkaTopK(q, e, "vec_id", "embedding", k,
          dPrefix = 32, rerank = 3 * k)))
    println(f"RECALL sf=$sfDir queries=$nQ k=$k")
    // takedown-repair story: tombstone a 10% id range out of the
    // connected graph, then measure search recall against the
    // SURVIVING corpus's truth — tombstone-only vs repaired
    val removals = e.filter(col("vec_id") >= 500 && col("vec_id") < 700)
      .select("vec_id")
    lazy val surviving = graft.operators.Lineage.truncate(
      e.filter(col("vec_id") < 500 || col("vec_id") >= 700))
    lazy val truthSurv = graft.operators.Lineage.truncate(
      Similarity.bruteForceTopK(q, surviving, "vec_id", "embedding", k))
    lazy val prunedG = Similarity.graphRemove(graphC, removals, "vec_id")
    lazy val repairedG = Similarity.graphRepair(graphC, surviving, removals,
      "vec_id", "embedding", k = 8, beam = 16, hops = 8, maxDegree = 16)
    val takedown: Seq[(String, () => DataFrame)] = Seq(
      "graph_conn_tombstoned(beam16,hops8)" -> (() =>
        Similarity.graphSearchTopK(q, surviving, prunedG,
          "vec_id", "embedding", k, beam = 16, hops = 8)),
      "graph_conn_repaired(beam16,hops8)" -> (() =>
        Similarity.graphSearchTopK(q, surviving, repairedG,
          "vec_id", "embedding", k, beam = 16, hops = 8)),
      // the compaction face (ann_graph_compact): periodic rebuild over
      // the survivors — the recall ceiling repair approaches but does
      // not reach (repair is honestly not rebuild-parity); same
      // connected-build family as the tombstoned/repaired rows so the
      // three numbers are one story
      "graph_conn_compacted(beam16,hops8)" -> (() =>
        Similarity.graphSearchTopK(q, surviving,
          Similarity.knnGraphConnected(surviving, cent,
            "vec_id", "embedding", k = 8, cellNeighbors = 3),
          "vec_id", "embedding", k, beam = 16, hops = 8)))
    // aggregate from evalRanking's OWN per-query recall column (mean
    // over queries) so the report defines recall exactly as the
    // operator does — the per-query denominator is min(k, |truth@k|),
    // not a flat n·k, and the two only coincide when every truth list
    // runs the full k deep; mrr = avg(rr) likewise
    def report(name: String, mk: () => DataFrame, truthDf: DataFrame): Unit =
      try {
        val ev = Retrieval.evalRanking(mk(), truthDf, k)
          .agg(avg(col("recall")).as("rec"), avg(col("rr")).as("m"))
          .head()
        println(f"RECALL $name%-36s recall@$k=${ev.getDouble(0)}%.3f " +
          f"mrr=${ev.getDouble(1)}%.3f")
      } catch { case ex: Throwable =>
        println(s"RECALL $name ERROR ${ex.getMessage.linesIterator.next()}")
      }
    takedown.foreach { case (name, mk) => report(name, mk, truthSurv) }
    families.foreach { case (name, mk) => report(name, mk, truth) }
    // filtered-ANN recall vs predicate selectivity (round 15): the
    // stored-ledger serve restricted to a metadata filter, FIXED
    // nProbe=4/16 vs the ADAPTIVE widening rule, each against brute
    // force over the filter's survivors (the correct truth for a
    // filtered search). A selective filter starves fixed probes —
    // the probed cells hold few allowed rows — while the adaptive
    // rule widens until the supply floor (k) is met, degrading to
    // brute-over-survivors when the whole allowed set is below it.
    val ledger = graft.operators.Lineage.truncate(
      Similarity.pqIndexBuild(e, cent, cb, "vec_id", "embedding"))
    val sels: Seq[(String, org.apache.spark.sql.Column)] = Seq(
      ("label<5 (~50%)", col("label") < 5),
      ("label=7 (~10%)", col("label") === 7),
      ("label=7&id%5=0 (~2%)", col("label") === 7 && col("vec_id") % 5 === 0),
      ("label=7&id%20=0 (~0.5%)",
        col("label") === 7 && col("vec_id") % 20 === 0))
    sels.foreach { case (selName, pred) =>
      val allowed = e.filter(pred).select("vec_id")
      val nAllowed = allowed.count()
      val lgF = graft.operators.Lineage.truncate(
        ledger.join(allowed, Seq("vec_id"), "left_semi"))
      val truthF = graft.operators.Lineage.truncate(
        Similarity.bruteForceTopK(q,
          e.join(allowed, Seq("vec_id"), "left_semi"),
          "vec_id", "embedding", k))
      println(s"RECALL filtered allowed=$nAllowed $selName")
      report(s"filtered_fixed(4/16) $selName", () =>
        Similarity.ivfPqTopKFromIndex(q, lgF, cent, cb,
          "vec_id", "embedding", k, nProbe = 4), truthF)
      report(s"filtered_adaptive(4/16) $selName", () =>
        Similarity.ivfPqTopKFromIndexAdaptive(q, lgF, cent, cb,
          "vec_id", "embedding", k, nProbe = 4), truthF)
      // widen to a 3k candidate floor (the rerank-pool sizing): the
      // production setting when the filter starves the default probes
      report(s"filtered_adaptive(4/16,m=3k) $selName", () =>
        Similarity.ivfPqTopKFromIndexAdaptive(q, lgF, cent, cb,
          "vec_id", "embedding", k, nProbe = 4,
          minCandidates = 3 * k), truthF)
    }
    // the graph family's filtered face (round 15): a plain post-filter
    // of the final frontier (widen = 1) vs the auto-widened beam, at
    // ~10% selectivity — the graph-side twin of the probe-widening
    // story above
    val allowed7 = e.filter(col("label") === 7)
    val truth7 = graft.operators.Lineage.truncate(
      Similarity.bruteForceTopK(q,
        e.join(allowed7.select("vec_id"), Seq("vec_id"), "left_semi"),
        "vec_id", "embedding", k))
    report("graph_filtered_postfilter(beam16) label=7", () =>
      Similarity.graphSearchTopKFiltered(q, e, graphC, allowed7,
        "vec_id", "embedding", k, beam = 16, hops = 4, widen = 1), truth7)
    report("graph_filtered_widened(beam16,auto) label=7", () =>
      Similarity.graphSearchTopKFiltered(q, e, graphC, allowed7,
        "vec_id", "embedding", k, beam = 16, hops = 4), truth7)
    // quantizer-refresh story (round 15, pqIndexReencode's measured
    // motivation): DRIFT = the corpus's upper half displaced by a
    // fixed alternating-sign per-dim offset (deterministic; norm
    // ~3.2 against typical vector norm ~8). The STALE codebook
    // fixpoint-trained on the PRE-drift corpus serves the drifted
    // one; the REFRESHED codebook retrains on the current corpus —
    // exhaustive ADC on both (no routing) so the delta is pure
    // quantization quality. Truth = brute force over the drifted
    // corpus.
    val half = e.agg(max("vec_id")).head().getLong(0) / 2
    val eD = graft.operators.Lineage.truncate(
      e.withColumn("embedding",
        when(col("vec_id") >= half,
          transform(col("embedding"), (x, i) =>
            (x + when(pmod(i, lit(2)) === 0, lit(0.4f))
              .otherwise(lit(-0.4f))).cast("float")))
          .otherwise(col("embedding"))))
    val qD = eD.filter(col("vec_id") < nQ)
    val truthD = graft.operators.Lineage.truncate(
      Similarity.bruteForceTopK(qD, eD, "vec_id", "embedding", k))
    val cbStale = Similarity.pqCodebookTrain(e, cb, "vec_id", "embedding",
      steps = 10, toFixpoint = true)
    val cbFresh = Similarity.pqCodebookTrain(eD,
      Similarity.pqCodebookSeed(eD, "vec_id", "embedding",
        m = 8, ksub = 16, subDim = 8),
      "vec_id", "embedding", steps = 10, toFixpoint = true)
    report("pq_drift_stale(fixpoint,pre-drift)", () =>
      Similarity.pqTopK(qD, eD, cbStale, "vec_id", "embedding", k), truthD)
    report("pq_drift_refreshed(fixpoint,current)", () =>
      Similarity.pqTopK(qD, eD, cbFresh, "vec_id", "embedding", k), truthD)
    // same story at the ksub=64 budget, where codeword capacity is no
    // longer the binding constraint and the drift penalty is purer
    def cb64On(c: DataFrame) = Similarity.pqCodebookTrain(c,
      Similarity.pqCodebookSeed(c, "vec_id", "embedding",
        m = 8, ksub = 64, subDim = 8),
      "vec_id", "embedding", steps = 10, toFixpoint = true)
    report("pq_drift_stale_ksub64", () =>
      Similarity.pqTopK(qD, eD, cb64On(e), "vec_id", "embedding", k), truthD)
    report("pq_drift_refreshed_ksub64", () =>
      Similarity.pqTopK(qD, eD, cb64On(eD), "vec_id", "embedding", k), truthD)
    spark.stop()
  }
}
