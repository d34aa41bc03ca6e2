package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Plan-shape assertions: SCALE.md's claims, executable. Each test checks
  * the physical plan property that makes the operator scale, not just its
  * result. sf0.001 keeps them fast — plan SHAPE is scale-invariant
  * (modulo size-based broadcast choices, asserted where forced). */
class PlanAssertionsSpec extends SparkSpec {

  private def planOf(df: DataFrame): String = {
    // collect() executes THIS DataFrame's QueryExecution, so the plan
    // string reflects AQE's FINAL decisions (a noop write would execute
    // a separate command QueryExecution and leave this one un-run)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("isFinalPlan=false"),
      "expected the AQE-final executed plan")
    plan
  }

  private def q(name: String): DataFrame = SparkEntry.queries(name)(spark, sf)

  test("q01: filter and column pruning reach the parquet scan") {
    val plan = planOf(q("q01_pricing_agg"))
    assert(plan.contains("PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate"))
    // only the 6 needed columns (4 measures + 2 group keys) are read —
    // none of the wide string columns reach the scan
    assert(plan.contains("ReadSchema: struct<l_quantity:double,l_extendedprice:double,l_discount:double,l_returnflag"))
    assert(!plan.contains("l_comment") && !plan.contains("l_shipmode"))
  }

  test("q01: aggregation is partial (map-side combine before the exchange)") {
    val plan = planOf(q("q01_pricing_agg"))
    assert(plan.contains("partial_sum") || plan.contains("partial_count"))
  }

  test("q02/q10: top-k is TakeOrderedAndProject, never a global sort") {
    assert(planOf(q("q10_topn")).contains("TakeOrderedAndProject"))
    assert(planOf(q("q02_filter_sort_limit")).contains("TakeOrderedAndProject"))
  }

  test("q04: the lookup join broadcasts the dim side") {
    val plan = planOf(q("q04_lookup_enrich"))
    assert(plan.contains("BroadcastHashJoin"))
    assert(plan.contains("BroadcastExchange"))
  }

  test("q09: rank-filter plants partial+final WindowGroupLimit") {
    val plan = planOf(q("q09_window_rank"))
    assert(plan.contains("WindowGroupLimit"))
    assert(plan.contains("Partial") && plan.contains("Final"))
  }

  test("q24: as-of join is ONE key exchange + window, no join node") {
    val plan = planOf(q("q24_asof_join"))
    assert(plan.contains("RunningWindowFunction") || plan.contains("Window"))
    assert(!plan.contains("SortMergeJoin") && !plan.contains("BroadcastHashJoin"),
      "as-of must not materialize a pair join")
  }

  test("q25: range join runs as a broadcast equi-join on the bin key") {
    val plan = planOf(q("q25_range_join"))
    assert(plan.contains("BroadcastHashJoin") || plan.contains("SortMergeJoin"))
    assert(plan.contains("_bin"), "join key must be the derived bin")
  }

  test("dedup_exact: the shuffle carries the digest, not the text") {
    val plan = planOf(q("dedup_exact"))
    // the group key is the md5 expression (planner-aliased as
    // _groupingexpression); the raw text column must NOT ride the exchange
    val exchanges = plan.split("Exchange hashpartitioning").drop(1)
    assert(exchanges.nonEmpty)
    assert(!exchanges.head.split("\n").head.contains("text#"),
      s"exchange must not partition on the document text:\n$plan")
  }

  test("ann_brute: corpus side never shuffles (query set broadcasts)") {
    val plan = planOf(q("ann_brute_topk"))
    assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("BroadcastHashJoin"))
  }

  test("sample_stratified: pure filter — zero exchanges besides the oracle's order") {
    val plan = planOf(q("sample_stratified"))
    // the sample itself is a scan-side filter; the only exchange allowed
    // is the final ORDER BY's range partitioning
    assert(!plan.contains("Exchange hashpartitioning"),
      s"stratified sample must not shuffle:\n$plan")
  }

  test("q39: forward as-of is the same no-join single-exchange shape as q24") {
    val plan = planOf(q("q39_asof_forward"))
    assert(plan.contains("Window"))
    assert(!plan.contains("SortMergeJoin") && !plan.contains("BroadcastHashJoin"),
      "forward as-of must not materialize a pair join")
  }

  test("q38: bloom prefilter sits in the fact scan stage, before the exchange") {
    val plan = planOf(q("q38_bloom_semi_join"))
    assert(plan.contains("LeftSemi"), "exactness comes from the semi join")
    // the bloom probe is the codegen'd might_contain built-in in a
    // scan-stage Filter, so pruned fact rows never reach an exchange and
    // the probe never leaves WholeStageCodegen
    val filterLine = plan.linesIterator.find(l =>
      l.contains("Filter") && l.contains("might_contain"))
    assert(filterLine.nonEmpty, s"bloom probe filter missing from the plan:\n$plan")
    assert(!plan.toLowerCase.contains("udf"), "probe must not be a UDF")
  }

  test("sample_token_budget: one corpus-sized exchange; gate frame broadcasts") {
    val plan = planOf(q("sample_token_budget"))
    // the corpus meets the (prior, budget) gate as a BROADCAST join —
    // the sources×16-row frame must never force a corpus shuffle
    assert(plan.contains("BroadcastHashJoin"),
      s"bucket gate must broadcast to the corpus:\n$plan")
    // the only window over corpus rows partitions by (source, bucket) —
    // the naive per-source window (tens of partitions for a 100 TB
    // corpus) must not appear
    val windows = plan.linesIterator.filter(_.contains("Window")).toSeq
    assert(windows.exists(_.contains("_graft_mix_b")),
      s"running sum must partition by (source, bucket):\n$plan")
  }

  test("dedup_simhash_blocked: block key rides the slice-join shuffle key") {
    val plan = planOf(q("dedup_simhash_blocked"))
    // the compound key must be part of the join's equi-key set (hash
    // partitioning on block + slice), not a post-join filter — the
    // whole point is a smaller exchange, not a bigger one filtered late
    val joinLine = plan.linesIterator.find(l =>
      l.contains("Join") && l.contains("_graft_blk"))
    assert(joinLine.nonEmpty,
      s"block equality missing from the join keys:\n$plan")
  }

  test("wide clustering chain: candidate join shuffles band keys, never text") {
    val plan = planOf(q("dedup_clusters_wide"))
    // every hashpartitioning exchange carries derived keys (band/bk/id),
    // none carries the document text column
    val exchanges = plan.linesIterator
      .filter(_.contains("Exchange hashpartitioning")).toSeq
    assert(exchanges.nonEmpty)
    assert(!exchanges.exists(_.contains("text#")),
      s"document text must never ride an exchange:\n${exchanges.mkString("\n")}")
  }

  test("ann_pq_encode: one codegen'd scalar projection — no join, no data shuffle") {
    val plan = planOf(q("ann_pq_encode"))
    assert(!plan.contains("Join"), s"encode must not join:\n$plan")
    // the only exchange is the oracle's ORDER BY (range partitioning);
    // no hash exchange ever touches the corpus
    assert(!plan.contains("hashpartitioning"),
      s"encode must not hash-shuffle the corpus:\n$plan")
    assert(plan.linesIterator.exists(l =>
      l.contains("*(") && l.contains("graft_pq_codes")),
      s"PqCodes projection fell out of codegen:\n$plan")
  }

  test("ann_pq_topk: corpus ships codes into the join; partial top-k below the exchange") {
    val plan = planOf(q("ann_pq_topk"))
    // the broadcast side is the query (tables); the corpus side streams
    assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("BroadcastHashJoin"))
    // rank ≤ k plants partial+final WindowGroupLimit (the q09 shape):
    // per-partition candidate lists shrink to k before the exchange
    assert(plan.contains("WindowGroupLimit"), s"no partial top-k:\n$plan")
    assert(plan.contains("_codes"), s"codes column missing from plan:\n$plan")
  }

  test("ann_ivf_pq_topk: probe join keys on cell; raw embeddings stop at the encode projection") {
    val df = q("ann_ivf_pq_topk")
    val plan = planOf(df)
    assert(plan.contains("BroadcastHashJoin") && plan.contains("cell"),
      s"probe join must broadcast-hash on the cell key:\n$plan")
    // the corpus (streamed) side of the probe join must OUTPUT only
    // (n_id, cell, _codes) — the raw embedding column is consumed by
    // the fused assign+encode projection and never crosses the join
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.joins.BroadcastHashJoinExec
    def allNodes(p: SparkPlan): Seq[SparkPlan] =
      p.collect { case n => n }.flatMap {
        case a: AdaptiveSparkPlanExec => allNodes(a.executedPlan)
        case s: QueryStageExec => s +: allNodes(s.plan)
        case n => Seq(n)
      }
    val joins = allNodes(df.queryExecution.executedPlan)
      .collect { case j: BroadcastHashJoinExec => j }
    assert(joins.nonEmpty, s"no BroadcastHashJoinExec found:\n$plan")
    import org.apache.spark.sql.catalyst.optimizer.BuildRight
    val streamedOut = joins.map(j =>
      (if (j.buildSide == BuildRight) j.left else j.right).output.map(_.name))
    assert(streamedOut.exists(_.contains("_codes")),
      s"probe join's streamed side does not carry codes: $streamedOut")
    assert(streamedOut.forall(!_.contains("embedding")),
      s"raw embeddings leaked into a join's streamed side: $streamedOut")
  }

  test("ann_opq_topk: permutation is a pure projection; the moment pass partial-aggregates") {
    val plan = planOf(q("ann_opq_topk"))
    // same scan shape as ann_pq_topk: query side broadcasts, partial
    // top-k below the exchange — the permutation adds NO join and no
    // corpus shuffle (it is a static element-read projection)
    assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("BroadcastHashJoin"))
    assert(plan.contains("WindowGroupLimit"), s"no partial top-k:\n$plan")
    // the variance pass runs in its own (driver-collected, dim-sized)
    // job — assert THAT plan partial-aggregates map-side
    val momPlan = planOf(graft.operators.Similarity.opqPermutation(
      Tables.embeddings(spark, sf), "embedding", dim = 64, m = 8))
    assert(momPlan.contains("partial_sum") || momPlan.contains("partial_count"),
      s"moment aggregate not partial:\n$momPlan")
  }

  test("ann_maxsim_rerank: the shortlist pair frame broadcasts onto the corpus scan") {
    val plan = planOf(q("ann_maxsim_rerank"))
    val bcasts = plan.linesIterator.count(_.contains("BroadcastExchange"))
    // at least the pair frame and the query bags broadcast — the
    // corpus's vector bags never shuffle for scoring
    assert(bcasts >= 2, s"expected pair+query broadcasts, got $bcasts:\n$plan")
    assert(plan.contains("BroadcastHashJoin"), s"pair join must be a broadcast hash join:\n$plan")
  }

  test("dedup_pq_semantic: the block join keys on the derived code prefix, never the vector") {
    val plan = planOf(q("dedup_pq_semantic"))
    // nearDupPairs renames the prefix key to its working column `blk`
    assert(plan.contains("blk"), s"derived block key missing from plan:\n$plan")
    // no hash exchange may carry the embedding column: the quadratic
    // join moves on the KB-wide prefix key, vectors ride within rows
    val exchanges = plan.linesIterator.filter(_.contains("hashpartitioning")).toSeq
    assert(exchanges.forall(l => !l.contains("embedding")),
      s"an exchange partitions on the raw vector:\n${exchanges.mkString("\n")}")
  }

  test("bpeApply: the merge chain compiles to projections, histogram partial-aggregates") {
    import spark.implicits._
    val docs = Seq("aaab aaab ab").toDF("text")
    val merges = graft.operators.Vocab.bpeTrain(docs, "text", merges = 3)
    val df = graft.operators.Vocab.bpeApply(docs, "text", merges)
    val plan = planOf(df)
    assert(!plan.contains("Join"), s"apply must not join:\n$plan")
    assert(plan.contains("partial_sum") || plan.contains("partial_count"),
      s"token histogram not partial-aggregated:\n$plan")
  }

  test("streaming graph sink: per-batch write is touched-buckets-sized, pruned on read, append-exact") {
    import graft.operators.Similarity
    val e = Tables.embeddings(spark, sf)
    val base = e.filter(col("vec_id") < 200)
    val cent = base.filter(col("vec_id") === 0)
      .select(lit(0).cast("int").as("cell"), col("embedding").as("c_vec"))
    val g0 = Similarity.knnGraph(base, cent, "vec_id", "embedding", k = 3)
      .select("src_id", "nbr_id", "cos")
    val dir = java.nio.file.Files.createTempDirectory("graft_sinkspec")
    try {
      val nBkt = 64
      g0.withColumn("bkt", pmod(col("src_id"), lit(nBkt.toLong)).cast("int"))
        .write.partitionBy("bkt").mode("overwrite").parquet(dir.toString)
      val stored = spark.read.parquet(dir.toString)
      val batch = e.filter(col("vec_id") >= 200 && col("vec_id") < 203)
      val out = Similarity.graphAppendBucketDelta(stored, e, batch,
        "vec_id", "embedding", k = 3, buckets = nBkt,
        beam = 4, hops = 3, maxDegree = 4)
      // write volume is touched-sized: a 3-node batch touches a strict
      // subset of the 64 buckets and far fewer rows than the ledger
      // (bucket granularity is the write amplification: ~touched
      // sources / buckets of the ledger re-writes, here ~12/64)
      val outBkts = out.select("bkt").distinct().count()
      val allBkts = stored.select("bkt").distinct().count()
      assert(outBkts < allBkts,
        s"delta spans $outBkts of $allBkts buckets — not touched-only")
      assert(out.count() < stored.count() / 2,
        "per-batch write rows must be batch+neighborhood-sized, not graph-sized")
      // the survivors leg reads ONLY the touched buckets: its ledger
      // scan carries a LITERAL bkt partition predicate (the search's
      // full-graph read is behind the delta's checkpoint, so the one
      // scan left in this plan is the survivors')
      out.collect()
      val plan = out.queryExecution.executedPlan.toString
      assert(raw"PartitionFilters: \[[^\]]*bkt[^\]]*".r.findFirstIn(plan)
        .exists(_.contains("IN")),
        s"expected a literal bkt IN partition filter on the survivors scan:\n$plan")
      // end-to-end: dynamic overwrite of the touched buckets leaves the
      // ledger bit-equal to a full graphAppend
      val fullNext = Similarity.graphAppend(
        stored.select("src_id", "nbr_id", "cos"), e, batch,
        "vec_id", "embedding", k = 3, beam = 4, hops = 3, maxDegree = 4)
        .localCheckpoint()
      out.localCheckpoint()
        .write.mode("overwrite").option("partitionOverwriteMode", "dynamic")
        .partitionBy("bkt").parquet(dir.toString)
      val after = spark.read.parquet(dir.toString)
        .select("src_id", "nbr_id", "cos")
      assert(after.exceptAll(fullNext).isEmpty &&
        fullNext.exceptAll(after).isEmpty,
        "bucket-delta write must reproduce the full graphAppend ledger")
    } finally {
      graft.queries.FixtureCache.deleteRecursively(dir)
    }
  }

  test("graph drain READ path: hop/anti-join/recap ledger scans are bucket-pruned and search-exact") {
    import graft.operators.Similarity
    val e = Tables.embeddings(spark, sf)
    val base = e.filter(col("vec_id") < 200)
    val cent = base.filter(col("vec_id") === 0)
      .select(lit(0).cast("int").as("cell"), col("embedding").as("c_vec"))
    val g0 = Similarity.knnGraph(base, cent, "vec_id", "embedding", k = 3)
      .select("src_id", "nbr_id", "cos")
    val dir = java.nio.file.Files.createTempDirectory("graft_readspec")
    try {
      val nBkt = 64
      g0.withColumn("bkt", pmod(col("src_id"), lit(nBkt.toLong)).cast("int"))
        .write.partitionBy("bkt").mode("overwrite").parquet(dir.toString)
      val stored = spark.read.parquet(dir.toString)
      // bit-equality first: the bucket-pruned search is the SAME search
      // (the bkt IN filter is a no-op on the n_id === src_id equi-join)
      val q3 = e.filter(col("vec_id") >= 200 && col("vec_id") < 203)
      val unpr = Similarity.graphSearchTopK(q3, e,
        stored.select("src_id", "nbr_id"), "vec_id", "embedding",
        k = 3, beam = 4, hops = 3)
      val pr = Similarity.graphSearchTopK(q3, e, stored, "vec_id",
        "embedding", k = 3, beam = 4, hops = 3,
        edgeBuckets = Some(nBkt))
      assert(pr.exceptAll(unpr).isEmpty && unpr.exceptAll(pr).isEmpty,
        "bucket-pruned search must return bit-identical results")
      // the unpruned control run above legitimately scanned the whole
      // ledger — scope the plan witness to executions AFTER it
      val minId = spark.sharedState.statusStore.executionsList()
        .lastOption.map(_.executionId).getOrElse(-1L)
      // the full drain: every ledger-read leg elects a literal bucket
      // set, and with a bucket-partitioned corpus the per-hop VECTOR
      // reads (score legs) elect theirs too
      val cdir = java.nio.file.Files.createTempDirectory("graft_corpusspec")
      try {
        e.withColumn("bkt", pmod(col("vec_id"), lit(nBkt.toLong)).cast("int"))
          .write.partitionBy("bkt").mode("overwrite").parquet(cdir.toString)
        // the fixture write above reads vectors unpruned by design —
        // scope the corpus-scan witness to executions after it
        val cMinId = spark.sharedState.statusStore.executionsList()
          .lastOption.map(_.executionId).getOrElse(-1L)
        val corpusB = spark.read.parquet(cdir.toString)
        val probe = new Similarity.LedgerReadProbe
        val out = Similarity.graphAppendBucketDelta(stored, corpusB, q3,
          "vec_id", "embedding", k = 3, buckets = nBkt,
          beam = 4, hops = 3, maxDegree = 4, probe = Some(probe),
          corpusBuckets = Some(nBkt))
        out.collect()
        val stages = probe.stages
        assert(stages.count(_._1 == "hop") >= 3,
          s"expected a bucket election per beam hop, got: ${stages.map(_._1)}")
        assert(stages.count(_._1 == "score") >= 4, // seed + one per hop
          s"expected a corpus-bucket election per score leg, got: ${stages.map(_._1)}")
        for (leg <- Seq("inserted", "recap", "survivors"))
          assert(stages.exists(_._1 == leg), s"missing $leg bucket election")
        assert(probe.buckets.nonEmpty && probe.buckets.size < nBkt,
          s"read buckets ${probe.buckets.size} of $nBkt — not a strict subset")
        // bit-equality vs the unbucketed-corpus drain result
        val outPlain = Similarity.graphAppendBucketDelta(stored, e, q3,
          "vec_id", "embedding", k = 3, buckets = nBkt,
          beam = 4, hops = 3, maxDegree = 4)
        assert(out.exceptAll(outPlain).isEmpty &&
          outPlain.exceptAll(out).isEmpty,
          "corpus-pruned drain must produce bit-identical deltas")
        // plan witness: every executed corpus scan that read VECTORS
        // (the embedding column) carried a bkt partition filter; the
        // one unpruned corpus read is the entry min-id scan, which
        // reads no floats
        val ctoken = cdir.getFileName.toString
        var cplans: Seq[String] = Nil
        var cstable = 0
        var ctries = 0
        while (ctries < 100 && cstable < 3) {
          val now = spark.sharedState.statusStore.executionsList()
            .filter(_.executionId > cMinId)
            .map(_.physicalPlanDescription)
            .filter(p => p.contains(ctoken) && p.contains("Scan parquet") &&
              !p.contains("WriteFiles"))
          if (now.nonEmpty && now.size == cplans.size) cstable += 1
          else cstable = 0
          cplans = now
          Thread.sleep(100); ctries += 1
        }
        val vecScans = cplans.filter(p =>
          raw"ReadSchema: [^\n]*embedding".r.findFirstIn(p).isDefined)
        assert(vecScans.nonEmpty,
          "no executed plan read corpus vectors — the witness found nothing")
        // a single-bucket election compiles to `bkt = N` (Catalyst
        // rewrites a 1-element isin), multi-bucket to `bkt IN (...)`
        val unprunedVec = vecScans.filterNot(p =>
          raw"PartitionFilters: \[[^\]]*bkt[^\]]*".r.findFirstIn(p)
            .exists(f => f.contains("IN") || f.contains("=")))
        assert(unprunedVec.isEmpty,
          s"${unprunedVec.size} corpus vector scan(s) without a bkt " +
            s"partition filter:\n${unprunedVec.headOption.getOrElse("").take(4000)}")
      } finally {
        graft.queries.FixtureCache.deleteRecursively(cdir)
      }
      // plan witness via the SQL status store: every executed plan that
      // scanned the ledger path did so under a bkt partition filter —
      // no leg of the drain reads the whole stored graph
      val token = dir.getFileName.toString
      // the store fills from the listener bus asynchronously — poll
      // until the matching-plan count is non-zero AND stable
      var plans: Seq[String] = Nil
      var stable = 0
      var tries = 0
      while (tries < 100 && stable < 3) {
        val now = spark.sharedState.statusStore.executionsList()
          .filter(_.executionId > minId)
          .map(_.physicalPlanDescription)
          .filter(p => p.contains(token) && p.contains("Scan parquet"))
        if (now.nonEmpty && now.size == plans.size) stable += 1 else stable = 0
        plans = now
        Thread.sleep(100); tries += 1
      }
      assert(plans.nonEmpty,
        "no executed plan scanned the ledger — the witness found nothing")
      val unpruned = plans.filterNot(p =>
        raw"PartitionFilters: \[[^\]]*bkt[^\]]*".r.findFirstIn(p)
          .exists(f => f.contains("IN") || f.contains("isnotnull")))
      assert(unpruned.isEmpty,
        s"${unpruned.size} ledger scan(s) without a bkt partition filter:\n" +
          unpruned.headOption.getOrElse("").take(4000))
    } finally {
      graft.queries.FixtureCache.deleteRecursively(dir)
    }
  }

  test("append-only ledger drains: the idempotency anti-join reads bucket-pruned and delta-exact") {
    import graft.operators.{Ledger, Retrieval}
    val dcs = Tables.documents(spark, sf)
    val nBkt = 64
    val dir = java.nio.file.Files.createTempDirectory("graft_lidxspec")
    try {
      // a stored tf ledger over doc_id < 150, bucket-partitioned
      Ledger.withBucket(
          Retrieval.bm25IndexBuild(dcs.filter(col("doc_id") < 150),
            "doc_id", "text"), "doc_id", nBkt)
        .write.partitionBy("bkt").mode("overwrite").parquet(dir.toString)
      val batch = dcs.filter(col("doc_id") >= 140 && col("doc_id") < 160)
      // control: the unpruned append (legitimately scans the ledger)
      val unpr = Retrieval.bm25IndexAppend(
        spark.read.parquet(dir.toString), batch, "doc_id", "text",
        deltaOnly = true)
      val unprRows = unpr.collect()
      // scope the plan witness to executions after the control run
      val minId = spark.sharedState.statusStore.executionsList()
        .lastOption.map(_.executionId).getOrElse(-1L)
      // the drains' read leg: prune the stored side to the batch's
      // elected buckets before the anti-join — a semantic no-op (pmod
      // is a function of the id), so the delta is bit-identical
      val bkts = Ledger.batchBuckets(batch, "doc_id", nBkt)
      assert(bkts.nonEmpty && bkts.size < nBkt,
        s"elected ${bkts.size} of $nBkt buckets — not a strict subset")
      val pr = Retrieval.bm25IndexAppend(
        Ledger.prunedToBatch(spark.read.parquet(dir.toString), batch,
          "doc_id", nBkt), batch, "doc_id", "text", deltaOnly = true)
      // driver-side multiset compare — an exceptAll here would
      // re-execute the UNPRUNED control scan after the watermark
      def canon(rs: Array[org.apache.spark.sql.Row]) =
        rs.map(_.toSeq.map(String.valueOf).mkString("\t")).sorted.toSeq
      assert(canon(pr.collect()) == canon(unprRows),
        "bucket-pruned append must produce a bit-identical delta")
      assert(unprRows.nonEmpty, "overlap fixture produced an empty delta")
      // plan witness via the SQL status store: every executed plan that
      // scanned the ledger after the watermark carried a bkt partition
      // filter (single-bucket isin compiles to `bkt = N`, not IN)
      val token = dir.getFileName.toString
      var plans: Seq[String] = Nil
      var stable = 0
      var tries = 0
      while (tries < 100 && stable < 3) {
        val now = spark.sharedState.statusStore.executionsList()
          .filter(_.executionId > minId)
          .map(_.physicalPlanDescription)
          .filter(p => p.contains(token) && p.contains("Scan parquet") &&
            !p.contains("WriteFiles"))
        if (now.nonEmpty && now.size == plans.size) stable += 1
        else stable = 0
        plans = now
        Thread.sleep(100); tries += 1
      }
      assert(plans.nonEmpty,
        "no executed plan scanned the ledger — the witness found nothing")
      val unpruned = plans.filterNot(p =>
        raw"PartitionFilters: \[[^\]]*bkt[^\]]*".r.findFirstIn(p)
          .exists(f => f.contains("IN") || f.contains("=")))
      assert(unpruned.isEmpty,
        s"${unpruned.size} ledger scan(s) without a bkt partition filter:\n" +
          unpruned.headOption.getOrElse("").take(4000))
    } finally {
      graft.queries.FixtureCache.deleteRecursively(dir)
    }
  }

  test("text_near_match: the query-term side broadcasts onto the posting list") {
    val plan = planOf(q("text_near_match"))
    // only postings for the query's terms move: the term join must be
    // a broadcast (query side), never a corpus-sized shuffle join
    assert(plan.contains("BroadcastHashJoin"),
      s"query terms must broadcast to the posting list:\n$plan")
  }

  test("ann_filtered_indexed_topk: the metadata filter prunes the ledger BEFORE the probe join") {
    val plan = planOf(q("ann_filtered_indexed_topk"))
    // the predicate is a semi join on the ledger side; the ADC probe
    // join consumes the already-restricted rows — at scale this is the
    // predicate prune that keeps disallowed codes from ever scoring
    assert(plan.contains("LeftSemi"),
      s"the label predicate must restrict as a semi join:\n$plan")
    val semiIdx = plan.indexOf("LeftSemi")
    val adcIdx = plan.indexOf("graft_pq_adc")
    assert(semiIdx >= 0 && adcIdx >= 0 && adcIdx < semiIdx,
      s"ADC scoring must sit ABOVE the semi-restricted ledger scan " +
        s"(adc at $adcIdx, semi at $semiIdx):\n$plan")
  }

  test("O(query) BM25 serve: posting and stats scans carry bkt partition filters; result equals the full-derivation serve") {
    import graft.operators.{Ledger, Retrieval}
    val dcs = Tables.documents(spark, sf)
    val nBkt = 64
    val stage = java.nio.file.Files.createTempDirectory("graft_servspec")
    try {
      val postDir = stage.resolve("postings").toString
      val statsDir = stage.resolve("termstats").toString
      // index build (legitimately corpus-sized, before the witness
      // window): norm-carrying postings + term stats, both term-bucketed
      val ledger = Retrieval.withDocNorms(
        Retrieval.bm25IndexBuild(dcs, "doc_id", "text"))
      Ledger.withHashBucket(ledger, "term", nBkt)
        .write.partitionBy("bkt").mode("overwrite").parquet(postDir)
      Ledger.withHashBucket(Retrieval.bm25TermStatsBuild(ledger),
          "term", nBkt)
        .write.partitionBy("bkt").mode("overwrite").parquet(statsDir)
      val global = Retrieval.bm25GlobalStatsBuild(ledger)
        .localCheckpoint() // pin: the serve must not re-scan the corpus
      val qt = dcs.filter(col("doc_id") < 3)
        .select(col("doc_id").as("q_id"),
          explode(split(col("text"), " ")).as("term"))
      // control: the full-derivation serve over the raw tf ledger
      val want = Retrieval.bm25TopKFromIndex(qt,
          Retrieval.bm25IndexBuild(dcs, "doc_id", "text"), k = 10)
        .collect().map(_.toSeq.map(String.valueOf).mkString("\t")).sorted
      assert(want.nonEmpty)
      // witness window opens here
      val minId = spark.sharedState.statusStore.executionsList()
        .lastOption.map(_.executionId).getOrElse(-1L)
      val qterms = qt.select("term").distinct()
      val got = Retrieval.bm25TopKFromStats(qt,
          Ledger.prunedToKeys(spark.read.parquet(postDir), qterms,
            "term", nBkt),
          Ledger.prunedToKeys(spark.read.parquet(statsDir), qterms,
            "term", nBkt),
          global, k = 10)
        .collect().map(_.toSeq.map(String.valueOf).mkString("\t")).sorted
      assert(got.toSeq == want.toSeq,
        "the O(query) serve drifted from the full-derivation serve")
      // every executed plan that scanned either stored asset inside the
      // witness window carried a bkt partition filter
      val token = stage.getFileName.toString
      var plans: Seq[String] = Nil
      var stable = 0
      var tries = 0
      while (tries < 100 && stable < 3) {
        val now = spark.sharedState.statusStore.executionsList()
          .filter(_.executionId > minId)
          .map(_.physicalPlanDescription)
          .filter(p => p.contains(token) && p.contains("Scan parquet") &&
            !p.contains("WriteFiles"))
        if (now.nonEmpty && now.size == plans.size) stable += 1
        else stable = 0
        plans = now
        Thread.sleep(100); tries += 1
      }
      assert(plans.nonEmpty,
        "no executed plan scanned the stored index — the witness found nothing")
      val unpruned = plans.filterNot(p =>
        raw"PartitionFilters: \[[^\]]*bkt[^\]]*".r.findFirstIn(p)
          .exists(f => f.contains("IN") || f.contains("=")))
      assert(unpruned.isEmpty,
        s"${unpruned.size} stored-index scan(s) without a bkt partition " +
          s"filter:\n" + unpruned.headOption.getOrElse("").take(4000))
    } finally {
      graft.queries.FixtureCache.deleteRecursively(stage)
    }
  }

  test("manifest serve: the stats read resolves only elected pinned paths; the tombstone anti-join broadcasts") {
    import graft.operators.{Ledger, TxServeStack}
    val dcs = Tables.documents(spark, sf)
    val stage = java.nio.file.Files.createTempDirectory("graft_mftplan")
    try {
      val root = stage.resolve("stack").toString
      TxServeStack.commitBatch(spark, root,
        dcs.filter(col("doc_id") < 100), 0L, "doc_id", "text", 8, 16)
      TxServeStack.commitBatch(spark, root,
        dcs.filter(col("doc_id") >= 100), 1L, "doc_id", "text", 8, 16)
      TxServeStack.commitDelete(spark, root,
        dcs.filter(col("doc_id") % 9 === 4).select("doc_id"), 2L,
        "doc_id", 8, 16)
      val qterms = dcs.filter(col("doc_id") === 0)
        .select(explode(split(col("text"), " ")).as("term"))
        .filter(col("term") =!= "").distinct()
      val bkts = Ledger.keyHashBuckets(qterms, "term", 16)
      val (postings, stats, _) = TxServeStack.resolve(spark, root,
        statsBuckets = Some(bkts))
      // PATH-level pruning: every file the stats frame can read lives
      // under an ELECTED bucket's pinned version directory — an
      // unelected bucket's directory was never even listed
      val okDir = bkts.map(b => s"/bkt=$b/").toSet
      val stray = stats.inputFiles.filterNot(f => okDir.exists(f.contains))
      assert(stats.inputFiles.nonEmpty && stray.isEmpty,
        s"stats read resolved unelected paths: ${stray.take(3).mkString(", ")}")
      // the ordered-liveness join must broadcast the (tiny) tombstone
      // frame, not shuffle the posting ledger
      val plan = postings.queryExecution.executedPlan.toString
      assert(plan.contains("BroadcastHashJoin") && plan.contains("LeftOuter"),
        s"tombstone liveness join is not a broadcast:\n${plan.take(3000)}")
      assert(!plan.contains("SortMergeJoin"),
        "the liveness join shuffled the posting ledger")
      assert(postings.count() > 0)
    } finally {
      graft.queries.FixtureCache.deleteRecursively(stage)
    }
  }

  test("pruned snippet serve: the stored positional scan carries a bkt partition filter; windows equal the unpruned serve") {
    import graft.operators.{Ledger, Retrieval}
    val dcs = Tables.documents(spark, sf)
    val nBkt = 64
    val stage = java.nio.file.Files.createTempDirectory("graft_snipspec")
    try {
      val posDir = stage.resolve("positions").toString
      Ledger.withHashBucket(
          Retrieval.positionalIndexBuild(dcs, "doc_id", "text"),
          "term", nBkt)
        .write.partitionBy("bkt").mode("overwrite").parquet(posDir)
      val qt = dcs.filter(col("doc_id") < 3)
        .select(col("doc_id").as("q_id"),
          explode(slice(split(col("text"), " "), 1, 3)).as("term"))
      val want = Retrieval.bestWindow(qt,
          Retrieval.positionalIndexBuild(dcs, "doc_id", "text"),
          window = 3)
        .collect().map(_.toSeq.map(String.valueOf).mkString("\t")).sorted
      assert(want.nonEmpty)
      val minId = spark.sharedState.statusStore.executionsList()
        .lastOption.map(_.executionId).getOrElse(-1L)
      val got = Retrieval.bestWindow(qt,
          Ledger.prunedToKeys(spark.read.parquet(posDir),
            qt.select("term").distinct(), "term", nBkt),
          window = 3)
        .collect().map(_.toSeq.map(String.valueOf).mkString("\t")).sorted
      assert(got.toSeq == want.toSeq,
        "the pruned snippet serve drifted from the unpruned one")
      val token = stage.getFileName.toString
      var plans: Seq[String] = Nil
      var stable = 0
      var tries = 0
      while (tries < 100 && stable < 3) {
        val now = spark.sharedState.statusStore.executionsList()
          .filter(_.executionId > minId)
          .map(_.physicalPlanDescription)
          .filter(p => p.contains(token) && p.contains("Scan parquet") &&
            !p.contains("WriteFiles"))
        if (now.nonEmpty && now.size == plans.size) stable += 1
        else stable = 0
        plans = now
        Thread.sleep(100); tries += 1
      }
      assert(plans.nonEmpty,
        "no executed plan scanned the stored positional ledger")
      val unpruned = plans.filterNot(p =>
        raw"PartitionFilters: \[[^\]]*bkt[^\]]*".r.findFirstIn(p)
          .exists(f => f.contains("IN") || f.contains("=")))
      assert(unpruned.isEmpty,
        s"${unpruned.size} positional-ledger scan(s) without a bkt " +
          s"partition filter:\n" + unpruned.headOption.getOrElse("").take(4000))
    } finally {
      graft.queries.FixtureCache.deleteRecursively(stage)
    }
  }

  test("custom kernels stay inside WholeStageCodegen") {
    val df = Tables.documents(spark, sf).select(
      graft.functions.TextFns.rollingHash(col("text")).as("rh"),
      graft.functions.TextFns.wsTokenCount(col("text")).as("n"))
    val plan = planOf(df)
    // "*(n)" prefixes mark operators inside a WholeStageCodegen stage;
    // the kernel projection must carry one (no interpreted fallback)
    assert(plan.linesIterator.exists(l => l.contains("*(") && l.contains("Project")),
      s"kernel projection fell out of codegen:\n$plan")
  }
}
