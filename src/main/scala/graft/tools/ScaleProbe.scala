package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scaling probe for the NON-relational operator families (dedup pair
  * generation, connected components, ANN probe fan-out, tf-idf):
  * `runMain graft.tools.ScaleProbe <sfDir> <scratchDir> [factor]`.
  *
  * The relational probe (SCALE.md round 4) replicated tables verbatim —
  * fine for joins/aggs, WRONG for pair operators: verbatim copies make
  * every row an exact dup of factor-1 others and the candidate set
  * explodes as a data artifact. Here each document copy c ≥ 1 gets
  * (a) its word order deterministically PERMUTED (sort by
  * md5(pos:word:copy) — k-shingles are adjacency-local, so a permuted
  * copy shares almost no shingles with its original), and (b) ~38% of
  * its tokens suffixed with the copy id (simhash votes over the token
  * MULTISET and ignores order entirely — only changing the multiset
  * decorrelates it; rotation or pure permutation leaves the signature
  * bit-identical). Per-row length/vocabulary/work stay comparable, and
  * because the transform is content-deterministic, two ORGANICALLY
  * near-identical documents in the same copy transform identically and
  * remain near-dups: true-duplicate density grows linearly with the
  * corpus, never quadratically. Embedding copies get their components
  * cyclically shifted by c mod dim (norm-preserving, decorrelates
  * cosine).
  *
  * For each family the probe reports steady-state (pass-2) time at 1×
  * and `factor`×, PLUS the quantity that actually governs 100 TB cost:
  * candidate-pair counts for the three blocked pair generators
  * (Σ n·(n-1)/2 over join-key groups — the join fan-in, measured BEFORE
  * any similarity filter), label-propagation rounds for CC, and IVF cell
  * occupancy for ANN. */
object ScaleProbe {

  private def choose2(grouped: DataFrame): Long =
    grouped.agg(sum(expr("n * (n - 1) div 2")).as("c")).head().getLong(0)

  /** Query → family, for the optional 4th-arg family filter (csv of
    * {minhash,simhash,jaccard,cc,ccwide,ccinc,ann,pq,retr,tfidf,fluency,
    * mix,spans,decon,semdedup,gsink} —
    * e.g. the 100× point runs `minhash` alone; default runs
    * everything). */
  private val family = Map(
    "dedup_minhash_lsh" -> "minhash", "dedup_minhash_wide" -> "minhash",
    "dedup_simhash_pairs" -> "simhash",
    "dedup_simhash_wide" -> "simhash", "dedup_simhash_blocked" -> "simhash",
    "dedup_ngram_jaccard" -> "jaccard",
    "dedup_clusters" -> "cc", "dedup_clusters_wide" -> "ccwide",
    "ann_ivf_topk" -> "ann", "text_tfidf" -> "tfidf",
    "text_fluency" -> "fluency",
    "dedup_spans" -> "spans",
    "decontaminate" -> "decon", "decontaminate_join" -> "decon")

  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.create()
    val sfDir = args(0)
    val scratch = args(1)
    val factor = if (args.length > 2) args(2).toInt else 10
    val families: Set[String] =
      if (args.length > 3) args(3).split(",").toSet else Set("all")
    def want(f: String) = families.contains("all") || families.contains(f)
    // flags (comma-separated, arg 5):
    //   nobuild — reuse an already-built replica at <scratchDir> (the
    //     100× corpus takes minutes to build; re-runs shouldn't re-pay)
    //   notime — skip the timed query runs, report governing counts only
    //     (the saturating config's QUERY at 100× is exactly the blow-up
    //     the counts predict; counting its candidates is one cheap agg)
    val flags: Set[String] =
      if (args.length > 4) args(4).split(",").toSet else Set.empty
    val rebuild = !flags.contains("nobuild")
    val timed = !flags.contains("notime")

    // ---- build the perturbed replica corpus
    val docs0 = graft.Tables.documents(spark, sfDir)
    val emb0 = graft.Tables.embeddings(spark, sfDir)
    val docOff = docs0.agg(max("doc_id")).head().getLong(0) + 1
    val embOff = emb0.agg(max("vec_id")).head().getLong(0) + 1
    // One explode over copy ids instead of a factor-way union: the
    // transforms below are byte-identical to the per-copy-literal form
    // (the copy tag rides a column through the same md5 salts), but the
    // plan stays O(1) in `factor` — a 1000-way union's analysis alone
    // dominated the build, and the single-projection shape is also how a
    // real replica fan-out would run on a cluster.
    if (rebuild) {
      val c = col("_c")
      val tag = c.cast("string")
      val w = split(col("text"), " ")
      val tagged = transform(w, (t, i) => struct(
        md5(concat_ws(":", i.cast("string"), t, tag)).as("k"),
        when(substring(md5(concat_ws(";", t, i.cast("string"), tag)), 1, 1) < "6",
          concat(t, lit("_c"), tag)).otherwise(t).as("t")))
      // repartition BEFORE the fan-out: the sf parquet is one file → one
      // input split, and the explode multiplies rows without adding
      // parallelism, so the whole perturbation would run on one core
      docs0.repartition(32)
        .select(col("*"), explode(sequence(lit(0L), lit(factor - 1L))).as("_c"))
        .select(
          (col("doc_id") + c * lit(docOff)).as("doc_id"),
          when(c === 0, col("text")).otherwise(concat_ws(" ",
            transform(array_sort(tagged), s => s("t")))).as("text"),
          col("lang"), col("source"), col("n_chars"))
        .write.mode("overwrite").parquet(s"$scratch/documents.parquet")
    }
    if (rebuild && (want("ann") || want("pq") || want("retr") ||
        want("semdedup") || want("gsink") || want("txgraph"))) {
      val c = col("_c")
      val k = (c % 64).cast("int")
      val e = col("embedding")
      emb0.repartition(32)
        .select(col("*"), explode(sequence(lit(0L), lit(factor - 1L))).as("_c"))
        .select(
          (col("vec_id") + c * lit(embOff)).as("vec_id"),
          when(c === 0, e).otherwise(
            concat(slice(e, k + lit(1), lit(64) - k), slice(e, lit(1), k)))
            .as("embedding"),
          col("label"))
        .write.mode("overwrite").parquet(s"$scratch/embeddings.parquet")
    }
    println(s"PROBE built ${factor}x corpus at $scratch")

    // ---- steady-state times per family, 1x then Nx
    val queries = Seq("dedup_minhash_lsh", "dedup_minhash_wide",
      "dedup_simhash_pairs",
      "dedup_simhash_wide", "dedup_simhash_blocked", "dedup_ngram_jaccard",
      "dedup_clusters", "dedup_clusters_wide",
      "ann_ivf_topk", "text_tfidf", "text_fluency",
      "dedup_spans", "decontaminate", "decontaminate_join")
      .filter(q => timed && want(family(q)))
    for (dir <- Seq(sfDir, scratch); q <- queries; pass <- 1 to 2) {
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(q)(spark, dir)
        .write.format("noop").mode("overwrite").save()
      val scale = if (dir == sfDir) "1x" else s"${factor}x"
      println(s"PROBE time $scale pass$pass $q ${(System.nanoTime() - t0) / 1e9}")
    }

    // ---- candidate-pair counts (join fan-in before similarity filters)
    for (dir <- Seq(sfDir, scratch)) {
      val scale = if (dir == sfDir) "1x" else s"${factor}x"
      val d = graft.Tables.documents(spark, dir)
      val nDocs = d.count()

      if (want("minhash")) {
        val mh = choose2(graft.operators.Dedup.bandedKeys(d, "doc_id", "text")
          .groupBy("band", "bk").agg(count(lit(1)).as("n")))
        println(s"PROBE candidates $scale minhash_lsh docs=$nDocs pairs=$mh")
        // wide (16-hash / 4×4-row) variant: rows-per-band is the
        // chance-collision knob (p ≈ J^rows per band) — the prescribed
        // config once the n²·J² term surfaces (measured at 5·10⁵
        // homogeneous docs with the default 8/4×2)
        val mhW = choose2(
          graft.operators.Dedup.bandedKeys(d, "doc_id", "text", 16, 4)
            .groupBy("band", "bk").agg(count(lit(1)).as("n")))
        println(s"PROBE candidates $scale minhash_wide docs=$nDocs pairs=$mhW")
      }

      if (want("simhash")) {
        val sigs = graft.operators.Dedup.simhashed(d, "doc_id", "text", 64)
        val chunkArr = array((0 until 4).map(b =>
          substring(col("sig"), b * 16 + 1, 16)): _*)
        val sh = choose2(sigs
          .select(posexplode(chunkArr).as(Seq("ci", "ck")))
          .groupBy("ci", "ck").agg(count(lit(1)).as("n")))
        println(s"PROBE candidates $scale simhash docs=$nDocs pairs=$sh")

        // wide (128-bit / 32-bit slice) variant: the slice alphabet grows
        // 2^16 → 2^32, which is the prescribed fix for the 64-bit path's
        // super-linear candidate growth on homogeneous corpora
        val blk = concat(col("lang"), lit("|"),
          floor(col("n_chars") / 100).cast("long").cast("string"))
        val sigsW = graft.operators.Dedup.simhashed(d, "doc_id", "text", 128,
          carry = Seq("blk" -> blk))
        val chunkArrW = array((0 until 4).map(b =>
          substring(col("sig"), b * 32 + 1, 32)): _*)
        val chW = sigsW.select(col("blk"),
          posexplode(chunkArrW).as(Seq("ci", "ck")))
        val shW = choose2(chW.groupBy("ci", "ck").agg(count(lit(1)).as("n")))
        println(s"PROBE candidates $scale simhash_wide docs=$nDocs pairs=$shW")
        // compound-key variant (dedup_simhash_blocked): slice AND
        // lang|length-bucket must match — the knob for vote-concentration
        // saturation the 1000× probe surfaced (alphabet growth can't
        // outrun Σp² on a homogeneous corpus; a block key multiplies the
        // effective key space without widening signatures)
        val shB = choose2(chW.groupBy("ci", "ck", "blk").agg(count(lit(1)).as("n")))
        println(s"PROBE candidates $scale simhash_blocked docs=$nDocs pairs=$shB")
      }

      if (want("jaccard")) {
        // jaccard join fan-in: shared (block, gram-hash) incidences
        val gramHash = (s: org.apache.spark.sql.Column) =>
          org.apache.spark.sql.GraftExpr.col(graft.expressions.RollingHash(
            org.apache.spark.sql.GraftExpr.expr(s)))
        val ex0 = d
          .select(col("doc_id"),
            concat(col("lang"), lit("|"),
              floor(col("n_chars") / 100).cast("long").cast("string")).as("blk"),
            array_distinct(transform(
              array_distinct(graft.operators.Dedup.shingles(col("text"))),
              gramHash)).as("hs"))
          .select(col("blk"), explode(col("hs")).as("h"))
        val jac = choose2(ex0.groupBy("blk", "h").agg(count(lit(1)).as("n")))
        println(s"PROBE candidates $scale ngram_jaccard docs=$nDocs sharedgram_incidences=$jac")
        // df-capped variant (maxGramDf = 4, the dedup_ngram_jaccard_capped
        // gate value): fan-in per surviving gram is bounded by the cap,
        // so growth is linear in the corpus by construction — measured
        // here to confirm
        val keep = ex0.groupBy("h").agg(count(lit(1)).as("_df"))
          .filter(col("_df") <= 4).select("h")
        val jacC = choose2(ex0.join(keep, "h")
          .groupBy("blk", "h").agg(count(lit(1)).as("n")))
        println(s"PROBE candidates $scale ngram_jaccard_capped docs=$nDocs sharedgram_incidences=$jacC")
      }

      // sub-document span dedup (dedup_spans): winner election is a
      // partial-aggregatable min-of-struct over (digest, id, idx) rows —
      // the governing quantities are the span-row count (the 48-byte
      // exchange) and the duplicate fraction (rows − distinct digests =
      // exactly the rows the reassembly join drops). Both must stay
      // linear: spans/doc is fixed by span width, and the perturbed
      // replica decorrelates word order, so duplicate density tracks
      // true-duplicate density, never factor².
      if (want("spans")) {
        val spanRows = d.filter(col("text").isNotNull)
          .select(explode(sequence(lit(0),
            ((size(split(col("text"), " ")) - 1) / 3).cast("int"))).as("i"),
            col("text"))
          .select(md5(array_join(
            slice(split(col("text"), " "), col("i") * 3 + 1, lit(3)), " ")).as("h"))
        val n = spanRows.count()
        val distinctH = spanRows.select("h").distinct().count()
        println(s"PROBE spans $scale docs=$nDocs span_rows=$n " +
          s"distinct=$distinctH dup_rows=${n - distinctH}")
      }

      // decontamination at scale (decontaminate_join vs the broadcast
      // form): the governing quantities are the holdout's distinct-
      // shingle count (the broadcast payload — multiply by ~60 B/row
      // hashed-relation overhead against the 8 GiB broadcast ceiling)
      // and the corpus∩holdout matched incidences (the shuffle-join
      // fan-in and the partial-agg input; ≤ corpus shingle rows by
      // construction since the holdout side is distinct).
      if (want("decon")) {
        val hold = d.filter(col("source") === "src0")
          .select(explode(array_distinct(
            graft.operators.Dedup.shingles(col("text")))).as("s"))
          .distinct()
        val nh = hold.count()
        val matched = d.filter(col("source") =!= "src0")
          .select(col("doc_id"), explode(array_distinct(
            graft.operators.Dedup.shingles(col("text")))).as("s"))
          .join(hold, "s").count()
        println(s"PROBE decon $scale docs=$nDocs holdout_shingles=$nh " +
          s"matched_incidences=$matched")
      }

      if (want("cc")) {
        val pairs = graft.operators.Dedup.minhashCandidates(d, "doc_id", "text")
        val (labels, rounds) =
          graft.operators.Dedup.connectedComponentsWithRounds(pairs, "a_id", "b_id")
        val nEdges = pairs.count()
        val nLabeled = labels.count()
        println(s"PROBE cc $scale edges=$nEdges labeled=$nLabeled rounds=$rounds")
      }
      // the wide-config chain (dedup_clusters_wide): CC fed by the
      // 16-hash/4×4-row candidate set — the probe that shows edge
      // growth returning to ~linear where the default config's
      // chance-collision term saturates (round-7: 406× at 100×).
      // `ccwide` alone skips the default chain: at 1000× the default's
      // saturated candidate set is exactly the blow-up the counts
      // already predict, and running CC over it would measure the
      // saturation, not the chain
      if (want("cc") || want("ccwide")) {
        val pairsW = graft.operators.Dedup.minhashCandidates(
          d, "doc_id", "text", numHashes = 16, bands = 4)
        val (labelsW, roundsW) =
          graft.operators.Dedup.connectedComponentsWithRounds(pairsW, "a_id", "b_id")
        println(s"PROBE cc_wide $scale edges=${pairsW.count()} " +
          s"labeled=${labelsW.count()} rounds=$roundsW")
      }

      // incremental cluster maintenance (connectedComponentsIncremental):
      // a FIXED batch (the 1× corpus, ids offset past the replica's)
      // appends against corpora a decade apart. Stored nightly assets —
      // the corpus band index and the label ledger — are built UNTIMED
      // (they are what a production append reads from disk; the ledger
      // is all-singleton, since ledger SIZE, not label structure, is
      // what the corpus-side passes scale with). Timed: the candidate
      // probe (batch bands ⋈ stored index) and the merge + full-ledger
      // relabel. The claim under test: every EXCHANGE is batch-sized —
      // the only corpus-sized terms are shuffle-free columnar scans
      // (the stored-index probe and the relabel pass), which layout
      // (bucketing/sorting, cf. layoutOptimize) prunes further.
      if (want("ccinc")) {
        val bandDir = s"$scratch/_ccinc_bands_$scale"
        graft.operators.Dedup.bandedKeys(d, "doc_id", "text")
          .write.mode("overwrite").parquet(bandDir)
        val storedBands = spark.read.parquet(bandDir)
        val ledger = d.select(col("doc_id").as("id"), col("doc_id").as("cluster"))
        val maxId = d.agg(max("doc_id")).head().getLong(0)
        val batch = graft.Tables.documents(spark, sfDir)
          .select((col("doc_id") + maxId + 1).as("doc_id"), col("text"))
        for (pass <- 1 to 2) {
          var t0 = System.nanoTime()
          val newEdges = graft.operators.Lineage.truncate(
            graft.operators.Dedup.minhashCandidates(batch, "doc_id", "text")
              .union(
                graft.operators.Dedup.bandedKeys(batch, "doc_id", "text").alias("a")
                  .join(storedBands.alias("b"),
                    col("a.band") === col("b.band") && col("a.bk") === col("b.bk"))
                  .select(col("a.id").as("a_id"), col("b.id").as("b_id"))
                  .distinct()))
          val ne = newEdges.count()
          val tProbe = (System.nanoTime() - t0) / 1e9
          t0 = System.nanoTime()
          graft.operators.Dedup.connectedComponentsIncremental(
              ledger, batch.select("doc_id"), "doc_id", newEdges, "a_id", "b_id")
            .write.format("noop").mode("overwrite").save()
          val tMerge = (System.nanoTime() - t0) / 1e9
          println(f"PROBE ccinc $scale pass$pass new_edges=$ne " +
            f"probe_s=$tProbe%.2f merge_relabel_s=$tMerge%.2f")
        }
      }

      if (want("ann")) {
        val e = graft.Tables.embeddings(spark, dir)
        val cent = e.filter(col("vec_id") < 16)
          .select(col("vec_id").cast("int").as("cell"), col("embedding").as("c_vec"))
        val cells = graft.operators.Similarity.ivfAssign(e, cent, "vec_id", "embedding")
          .groupBy("cell").agg(count(lit(1)).as("n"))
          .agg(max("n").as("mx"), avg("n").as("mean")).head()
        println(s"PROBE ivf $scale max_cell=${cells.getLong(0)} mean_cell=${cells.getDouble(1)}")
        // assignment cost at the "centroids ∝ corpus" sizing rule:
        // flat n×C vs two-level n×2√C at C=1024 (32 coarse routes) —
        // the seed ids exist at every scale, so the codebooks (hence
        // routing) are identical across dirs and only n varies
        val fine = e.filter(col("vec_id") < 1024)
          .select(col("vec_id").cast("int").as("cell"), col("embedding").as("f_vec"))
        val coarse = e.filter(col("vec_id") < 32)
          .select(col("vec_id").cast("int").as("ccell"), col("embedding").as("c_vec"))
        for (pass <- 1 to 2) {
          var t0 = System.nanoTime()
          graft.operators.Similarity.ivfAssign(e,
            fine.select(col("cell"), col("f_vec").as("c_vec")),
            "vec_id", "embedding")
            .write.format("noop").mode("overwrite").save()
          val tf = (System.nanoTime() - t0) / 1e9
          t0 = System.nanoTime()
          graft.operators.Similarity.ivfAssignTwoLevel(
            e, coarse, fine, "vec_id", "embedding")
            .write.format("noop").mode("overwrite").save()
          val t2 = (System.nanoTime() - t0) / 1e9
          println(f"PROBE ivf_assign $scale pass$pass flat_c1024=$tf%.2f two_level_32x1024=$t2%.2f")
        }
      }

      if (want("gsink")) {
        // streaming graph sink: the governing count is per-batch WRITE
        // volume — rows and buckets the bucket-delta replaces vs the
        // stored ledger's size. O(touched) means write_rows tracks the
        // BATCH (stays flat as the corpus grows) while ledger_rows
        // grows with the corpus; a full-rewrite sink would have
        // write_rows = ledger_rows.
        import graft.operators.Similarity
        val e = graft.Tables.embeddings(spark, dir)
        val nV = e.count()
        // cells ∝ corpus (the knnGraph sizing rule, as the retr probe's
        // graph build) so the base-graph SETUP stays linear — the probe
        // measures the sink's write volume, not a mis-sized build
        val nCellsS = if (dir == sfDir) 64 else 64 * factor
        val cent = e.filter(col("vec_id") < nCellsS)
          .select(col("vec_id").cast("int").as("cell"),
            col("embedding").as("c_vec"))
        val batch = e.orderBy(col("vec_id").desc).limit(5)
        val base = e.join(batch.select("vec_id"), Seq("vec_id"), "left_anti")
        val g = graft.operators.Lineage.truncate(
          Similarity.knnGraph(base, cent, "vec_id", "embedding", k = 3)
            .select("src_id", "nbr_id", "cos"))
        val buckets = 4096
        val stored = g.withColumn("bkt",
          pmod(col("src_id"), lit(buckets.toLong)).cast("int"))
        val probe = new Similarity.LedgerReadProbe
        val eB = e.withColumn("bkt",
          pmod(col("vec_id"), lit(buckets.toLong)).cast("int"))
        val delta = graft.operators.Lineage.truncate(
          Similarity.graphAppendBucketDelta(stored, eB, batch,
            "vec_id", "embedding", k = 3, buckets = buckets,
            beam = 4, hops = 3, maxDegree = 4, probe = Some(probe),
            corpusBuckets = Some(buckets)))
        // READ volume (round 15): every drain leg elects a literal
        // bucket set (LedgerReadProbe records them); read_rows counts
        // ledger rows in the union of those buckets — the rows a
        // partition-pruned batch actually opens — and scan_rows sums
        // per-leg volumes (hop re-reads included). O(touched) on the
        // read side means both track the BATCH while ledger_rows
        // grows with the corpus.
        val perBkt = stored.groupBy("bkt").agg(count(lit(1)).as("n"))
          .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
        val ledgerStages = probe.stages.filterNot(_._1 == "score")
        val ledgerBkts = ledgerStages.flatMap(_._2).distinct
        val readRows = ledgerBkts.map(perBkt.getOrElse(_, 0L)).sum
        val scanRows = ledgerStages
          .map(_._2.map(perBkt.getOrElse(_, 0L)).sum).sum
        // corpus (vector) read volume: rows in the union of the score
        // legs' elected buckets — the floats a batch's scoring joins
        // actually load vs the whole corpus (round 15)
        val perCBkt = eB.groupBy("bkt").agg(count(lit(1)).as("n"))
          .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
        val scoreBkts = probe.stages.filter(_._1 == "score")
          .flatMap(_._2).distinct
        val corpusRead = scoreBkts.map(perCBkt.getOrElse(_, 0L)).sum
        println(s"PROBE gsink $scale nodes=$nV ledger_rows=${g.count()} " +
          s"batch=5 write_rows=${delta.count()} " +
          s"write_buckets=${delta.select("bkt").distinct().count()} " +
          s"of $buckets " +
          s"read_buckets=${ledgerBkts.size} read_rows=$readRows " +
          s"scan_rows=$scanRows legs=${probe.stages.size} " +
          s"corpus_read_rows=$corpusRead of $nV")
        // re-bucketing payoff (round 15): a ledger that outgrew its
        // creation-time B pays occupancy-inflated bucket rewrites per
        // batch; rebucketLedger(B → 4096) restores batch-sized writes.
        // B = 64 plays the undersized creation-time choice.
        val small = 64
        val storedSmall = g.withColumn("bkt",
          pmod(col("src_id"), lit(small.toLong)).cast("int"))
        val dSmall = graft.operators.Lineage.truncate(
          Similarity.graphAppendBucketDelta(storedSmall, e, batch,
            "vec_id", "embedding", k = 3, buckets = small,
            beam = 4, hops = 3, maxDegree = 4))
        val rb = graft.operators.Lineage.truncate(
          Similarity.rebucketLedger(storedSmall, "src_id", buckets))
        val dRb = graft.operators.Lineage.truncate(
          Similarity.graphAppendBucketDelta(rb, e, batch,
            "vec_id", "embedding", k = 3, buckets = buckets,
            beam = 4, hops = 3, maxDegree = 4))
        println(s"PROBE rebucket $scale B=$small " +
          s"write_rows_undersized=${dSmall.count()} " +
          s"-> rebucket B'=$buckets " +
          s"write_rows_restored=${dRb.count()}")
      }

      if (want("lidx")) {
        // append-only ledger drains (PQ codes / tf / positions): the
        // write is batch-sized by construction (deltaOnly + parquet
        // append), so the governing count is the idempotency
        // anti-join's READ volume — rows the pruned stored side opens
        // ([[graft.operators.Ledger.prunedToBatch]]: occupancy of the
        // batch's elected buckets) vs the whole ledger a naive
        // anti-join scans. The tf ledger is the representative (worst
        // rows-per-key of the three families).
        import graft.operators.{Ledger, Retrieval}
        val d = graft.Tables.documents(spark, dir)
        val nD = d.count()
        val buckets = 4096
        val batch = d.orderBy(col("doc_id").desc).limit(50)
        val base = d.join(batch.select("doc_id"), Seq("doc_id"), "left_anti")
        val stored = graft.operators.Lineage.truncate(
          Ledger.withBucket(
            Retrieval.bm25IndexBuild(base, "doc_id", "text"),
            "doc_id", buckets))
        val ledgerRows = stored.count()
        val bkts = Ledger.batchBuckets(batch, "doc_id", buckets)
        val readRows = stored
          .filter(col("bkt").isin(bkts: _*)).count()
        val delta = Retrieval.bm25IndexAppend(
          Ledger.prunedToBatch(stored, batch, "doc_id", buckets),
          batch, "doc_id", "text", deltaOnly = true)
        println(s"PROBE lidx $scale docs=$nD ledger_rows=$ledgerRows " +
          s"batch=50 read_buckets=${bkts.size} of $buckets " +
          s"read_rows=$readRows write_rows=${delta.count()}")
      }

      if (want("serv")) {
        // the O(query) BM25 serve: the governing count is the posting
        // and term-stats rows the query's elected hash buckets open
        // ([[graft.operators.Ledger.prunedToKeys]]) vs the whole
        // ledger the full-derivation serve scans AND aggregates. The
        // query is fixed (docs 0..2's terms) while the corpus grows,
        // so the read fraction must fall ∝ 1/corpus until the elected
        // buckets saturate (query terms' bucket occupancy — the same
        // B ∝ corpus sizing law as lidx/gsink).
        import graft.operators.{Ledger, Retrieval}
        val d = graft.Tables.documents(spark, dir)
        val nD = d.count()
        val buckets = 4096
        val ledger = graft.operators.Lineage.truncate(
          Ledger.withHashBucket(
            Retrieval.withDocNorms(
              Retrieval.bm25IndexBuild(d, "doc_id", "text")),
            "term", buckets))
        val ledgerRows = ledger.count()
        val stats = graft.operators.Lineage.truncate(
          Ledger.withHashBucket(Retrieval.bm25TermStatsBuild(
            ledger.select("doc_id", "term", "tf")), "term", buckets))
        val vocabRows = stats.count()
        // two query shapes: a whole-document query (30 of the base
        // corpus's ~31 terms — the matched-postings floor dominates,
        // since ANY inverted index must read its own terms' postings)
        // and a 3-term query (the pruning's effect isolated: read ∝
        // query size, independent of the corpus's vocabulary growth)
        val qtDoc = d.filter(col("doc_id") < 3)
          .select(col("doc_id").as("q_id"),
            explode(split(col("text"), " ")).as("term"))
        val qtSmall = qtDoc.select(col("q_id"), col("term"))
          .distinct()
          .withColumn("_r", row_number().over(
            org.apache.spark.sql.expressions.Window
              .partitionBy("q_id").orderBy("term")))
          .filter(col("_r") <= 3).drop("_r")
        for ((tag, qt) <- Seq("docq" -> qtDoc, "small3" -> qtSmall)) {
          val qterms = qt.select("term").distinct()
          val nQTerms = qterms.count()
          val bkts = Ledger.keyHashBuckets(qterms, "term", buckets)
          val postRead = ledger.filter(col("bkt").isin(bkts: _*)).count()
          val statsRead = stats.filter(col("bkt").isin(bkts: _*)).count()
          println(s"PROBE serv $scale $tag docs=$nD " +
            s"ledger_rows=$ledgerRows vocab_rows=$vocabRows " +
            s"q_terms=$nQTerms read_buckets=${bkts.size} of $buckets " +
            s"post_read=$postRead stats_read=$statsRead")
        }
      }

      if (want("compact")) {
        // ledger fragmentation (round 15): an append drain leaves one
        // file per batch per touched bucket, so a serve's pruned read
        // opens elected_buckets × files_per_bucket parquet footers for
        // batch-sized content — the footer/row-group constant is what
        // grows, not the rows. Governing counts: files under the
        // elected buckets before/after [[Ledger.compactBuckets]], with
        // the pass-2 pruned-read wall both ways; rows are identical by
        // the gate's contract, so any wall delta is pure per-file
        // overhead.
        import graft.operators.{Ledger, Retrieval}
        val d = graft.Tables.documents(spark, dir)
        val buckets = 64
        val nBatches = 16
        val stage = java.nio.file.Files.createTempDirectory("graft_pcpt")
        val ldir = stage.resolve("ledger").toString
        try {
          val ledger = graft.operators.Lineage.truncate(
            Ledger.withHashBucket(Retrieval.withDocNorms(
              Retrieval.bm25IndexBuild(d, "doc_id", "text")),
              "term", buckets))
          for (b <- 0 until nBatches) {
            ledger.filter(pmod(col("doc_id"), lit(nBatches.toLong)) === b)
              .coalesce(1)
              .write.partitionBy("bkt").mode("append").parquet(ldir)
          }
          // deterministic 3-term election (orderBy before limit): the
          // frame is evaluated more than once below and a free-order
          // limit could pick different terms per evaluation
          val qterms = d.filter(col("doc_id") === 0)
            .select(explode(split(col("text"), " ")).as("term"))
            .filter(col("term") =!= "").distinct()
            .orderBy("term").limit(3)
          val bkts = Ledger.keyHashBuckets(qterms, "term", buckets)
          def elected = Ledger.bucketFileCounts(spark, ldir)
            .filter { case (b, _) => bkts.contains(b) }
          def readWall(): (Long, Double) = {
            var rows = 0L; var best = Double.MaxValue
            for (_ <- 1 to 2) {
              val t0 = System.nanoTime()
              rows = spark.read.parquet(ldir)
                .filter(col("bkt").isin(bkts: _*))
                .join(qterms, Seq("term"), "left_semi").count()
              best = math.min(best, (System.nanoTime() - t0) / 1e9)
            }
            (rows, best)
          }
          val fBefore = elected.values.sum
          val (rowsB, wallB) = readWall()
          Ledger.compactBuckets(spark, ldir,
            Ledger.fragmentedBuckets(spark, ldir, maxFiles = 1))
          val fAfter = elected.values.sum
          val (rowsA, wallA) = readWall()
          require(rowsA == rowsB,
            s"compaction changed pruned-read content: $rowsB -> $rowsA")
          println(f"PROBE compact $scale buckets=$buckets " +
            f"batches=$nBatches elected=${bkts.size} " +
            f"files_before=$fBefore read_s_before=$wallB%.3f " +
            f"files_after=$fAfter read_s_after=$wallA%.3f rows=$rowsB")
        } finally {
          graft.queries.FixtureCache.deleteRecursively(stage)
        }
      }

      if (want("txstack")) {
        // manifest-protocol serve stack (round 15): the laws under the
        // transactional drain. Governing counts — (1) a batch WRITES
        // its delta rows + its touched stats buckets' occupancy, never
        // the ledger; (2) a DELETE writes one tombstone row per doc +
        // rewrites only the removed terms' buckets; (3) a SERVE reads
        // the query terms' pinned stats paths (path-level pruning: an
        // unelected bucket's directory is never listed) + one manifest
        // file; (4) VACUUM reclaims ∝ commit history (superseded
        // versions), never ∝ corpus. Wall times at toy scale are
        // commit-constant-dominated; the counts are what scale.
        import graft.operators.{Ledger, Manifest, Retrieval, TxServeStack}
        val d = graft.Tables.documents(spark, dir)
        val nD = d.count()
        val stage = java.nio.file.Files.createTempDirectory("graft_txp")
        val root = stage.resolve("stack").toString
        try {
          val docB = 64; val termB = 256
          val qn = nD / 4
          for (p <- 0 until 4) {
            val lo = math.max(0L, p * qn - 10)
            val hi = if (p == 3) nD else (p + 1) * qn
            TxServeStack.commitBatch(spark, root,
              d.filter(col("doc_id") >= lo && col("doc_id") < hi),
              p.toLong, "doc_id", "text", docB, termB)
          }
          val st = Manifest.read(spark, root).get
          // the last commit's stats write = the pins it CHANGED vs the
          // prior head (attempt tokens — never reconstruct paths from
          // the ordinal)
          val stPrev3 = Manifest.readAt(spark, root, st.version - 1).get
          val changed3 = st.statsV.toSeq.diff(stPrev3.statsV.toSeq)
          val ledgerRows = TxServeStack.resolve(spark, root)._1.count()
          val vocabRows = TxServeStack.resolve(spark, root)._2.count()
          val lastDelta = spark.read
            .parquet(s"$root/postings/batch=3").count()
          val lastTouched = changed3.size
          val lastStatsRows = spark.read.option("basePath", s"$root/stats")
            .parquet(changed3.sorted
              .map { case (b, v) => s"$root/stats/v=$v/bkt=$b" }: _*)
            .count()
          println(s"PROBE txstack $scale docs=$nD ledger_rows=$ledgerRows " +
            s"vocab_rows=$vocabRows batch4_delta_rows=$lastDelta " +
            s"batch4_stats_buckets=$lastTouched of $termB " +
            s"batch4_stats_rows=$lastStatsRows")
          // transactional delete: 1% of the corpus retires
          TxServeStack.commitDelete(spark, root,
            d.filter(col("doc_id") % 100 === 3).select("doc_id"), 4L,
            "doc_id", docB, termB)
          val st2 = Manifest.read(spark, root).get
          val tomb = spark.read.parquet(s"$root/deletes/batch=4").count()
          val changed4 = st2.statsV.toSeq.diff(st.statsV.toSeq)
          val delTouched = changed4.size
          val delStatsRows =
            if (delTouched == 0) 0L
            else spark.read.option("basePath", s"$root/stats")
              .parquet(changed4.sorted
                .map { case (b, v) => s"$root/stats/v=$v/bkt=$b" }: _*)
              .count()
          println(s"PROBE txstack $scale delete_docs=$tomb " +
            s"delete_stats_buckets=$delTouched of $termB " +
            s"delete_stats_rows=$delStatsRows postings_rewritten=0")
          // transactional upsert: 1% of the corpus re-crawled with new
          // text — one commit writes tombstones ∝ batch, the
          // replacements' postings ∝ batch, and the stats NET of both
          // sides' buckets; old posting rows: zero rewritten
          TxServeStack.commitUpsert(spark, root,
            d.filter(col("doc_id") % 100 === 7)
              .select(col("doc_id"),
                concat(col("text"), lit(" updated")).as("text")),
            5L, "doc_id", "text", docB, termB)
          val st3 = Manifest.read(spark, root).get
          val upTomb = spark.read.parquet(s"$root/deletes/batch=5").count()
          val upDelta = spark.read.parquet(s"$root/postings/batch=5").count()
          val upTouched = st3.statsV.toSeq.diff(st2.statsV.toSeq).size
          println(s"PROBE txstack $scale upsert_docs=$upTomb " +
            s"upsert_delta_rows=$upDelta " +
            s"upsert_stats_buckets=$upTouched of $termB " +
            s"old_rows_rewritten=0")
          // manifest-resolved serve: 3-term query, path-level pruning
          val qterms = d.filter(col("doc_id") === 0)
            .select(explode(split(col("text"), " ")).as("term"))
            .filter(col("term") =!= "").distinct()
            .orderBy("term").limit(3)
          val bkts = Ledger.keyHashBuckets(qterms, "term", termB)
          val (_, sPruned, _) = TxServeStack.resolve(spark, root,
            statsBuckets = Some(bkts))
          val statsRead = sPruned.count()
          // census against the manifest the serve actually resolves
          // (the current head, after the upsert)
          val stServe = Manifest.read(spark, root).get
          val dirsOpened = stServe.statsV.keySet.count(bkts.contains)
          println(s"PROBE txstack $scale serve_q_terms=3 " +
            s"stats_dirs_opened=$dirsOpened of ${stServe.statsV.size} " +
            s"stats_rows_read=$statsRead vs vocab_rows=$vocabRows")
          // compaction + vacuum: reclaim ∝ history, serve unchanged
          TxServeStack.compactPostings(spark, root)
          val vs = TxServeStack.vacuum(spark, root)
          println(s"PROBE txstack $scale vacuum_deleted_dirs=${vs.deletedDirs} " +
            s"retired_manifests=${vs.deletedManifests} kept_dirs=${vs.keptDirs}")
        } finally {
          graft.queries.FixtureCache.deleteRecursively(stage)
        }
      }

      if (want("txgraph")) {
        // graph stack under the manifest protocol (round 16): the
        // data-plane law is gsink's (unchanged — the protocol lands
        // the SAME touched-bucket replacement content at a versioned
        // path instead of overwriting in place); what this probe pins
        // is the protocol's own cost: a commit writes the touched
        // buckets + TWO metadata files (manifest + history) at any
        // corpus size, and vacuum reclaims ∝ commit history (the
        // superseded pins), never ∝ corpus.
        import graft.operators.{Lineage, Manifest, Similarity, TxGraphStack}
        val e = graft.Tables.embeddings(spark, dir)
        val nV = e.count()
        val buckets = 4096
        val nCellsT = if (dir == sfDir) 64 else 64 * factor
        val cent = e.filter(col("vec_id") < nCellsT)
          .select(col("vec_id").cast("int").as("cell"),
            col("embedding").as("c_vec"))
        val batch = e.orderBy(col("vec_id").desc).limit(5)
        val base = e.join(batch.select("vec_id"), Seq("vec_id"), "left_anti")
        val g = Lineage.truncate(
          Similarity.knnGraph(base, cent, "vec_id", "embedding", k = 3)
            .select("src_id", "nbr_id", "cos"))
        val stage = java.nio.file.Files.createTempDirectory("graft_txg")
        val root = stage.resolve("gstack").toString
        try {
          TxGraphStack.init(spark, root, g, buckets)
          val eB = e.withColumn("bkt",
            pmod(col("vec_id"), lit(buckets.toLong)).cast("int"))
          TxGraphStack.commitBatch(spark, root, eB, batch, 0L,
            "vec_id", "embedding", k = 3, buckets = buckets,
            beam = 4, hops = 3, maxDegree = 4,
            corpusBuckets = Some(buckets))
          val st = Manifest.read(spark, root).get
          val st0 = Manifest.readAt(spark, root, st.version - 1).get
          val changedG = st.statsV.toSeq.diff(st0.statsV.toSeq)
          val touched = changedG.size
          val writeRows = spark.read
            .option("basePath", s"$root/edges")
            .parquet(changedG.sorted.map { case (b, v) =>
              s"$root/edges/v=$v/bkt=$b" }: _*).count()
          val ledgerRows = TxGraphStack.resolve(spark, root).count()
          println(s"PROBE txgraph $scale nodes=$nV " +
            s"ledger_rows=$ledgerRows batch=5 " +
            s"commit_write_rows=$writeRows " +
            s"commit_buckets=$touched of $buckets metadata_files=2")
          val vs = TxGraphStack.vacuum(spark, root)
          println(s"PROBE txgraph $scale " +
            s"vacuum_deleted_dirs=${vs.deletedDirs} " +
            s"retired_manifests=${vs.deletedManifests} " +
            s"kept_dirs=${vs.keptDirs}")
        } finally {
          graft.queries.FixtureCache.deleteRecursively(stage)
        }
      }

      if (want("txsketch")) {
        // sketch ledger under the manifest protocol (round 16): the
        // law that makes sketches THE answer at 100 TB — state bytes
        // per key are ~CONSTANT while the tracked distinct set grows
        // ∝ corpus (an HLL register array + a capped theta sample set
        // vs the exact distinct set itself), a batch commit writes
        // only its touched buckets' key rows + two metadata files,
        // and a serve opens the elected buckets' pinned dirs only.
        // Keys: a 256-way synthetic domain over the doc text hash —
        // the realistic many-key profile (per-domain distinct doc
        // tracking); values: doc_id (distinct ∝ corpus).
        import graft.operators.{Manifest, TxSketchStack}
        val d = graft.Tables.documents(spark, dir)
        val keyed = d.select(
          concat(lit("d"), pmod(xxhash64(col("text")), lit(256L)))
            .as("dom"),
          col("doc_id"))
        val nD = d.count()
        val stage = java.nio.file.Files.createTempDirectory("graft_txsk")
        val root = stage.resolve("stack").toString
        try {
          TxSketchStack.init(spark, root)
          val qn = nD / 4
          for (p <- 0 until 3) {
            TxSketchStack.commitBatch(spark, root,
              keyed.filter(col("doc_id") >= p * qn &&
                col("doc_id") < (p + 1) * qn),
              p.toLong, "dom", "doc_id", buckets = 64)
          }
          val stPrev = Manifest.read(spark, root).get
          TxSketchStack.commitBatch(spark, root,
            keyed.filter(col("doc_id") >= 3 * qn && col("doc_id") < nD),
            3L, "dom", "doc_id", buckets = 64)
          val st = Manifest.read(spark, root).get
          // the last commit's write = the pins it CHANGED (attempt
          // tokens, so paths resolve through the pin map, never v=N)
          val changed = st.statsV.toSeq.diff(stPrev.statsV.toSeq)
          val lastRows = spark.read
            .option("basePath", s"$root/sketch")
            .parquet(changed.map { case (b, v) =>
              s"$root/sketch/v=$v/bkt=$b" }: _*).count()
          val lastTouched = changed.size
          // total pinned state bytes: the constant-per-key law
          val fsys = new org.apache.hadoop.fs.Path(root)
            .getFileSystem(spark.sessionState.newHadoopConf())
          val pinnedBytes = st.statsV.toSeq.map { case (b, v) =>
            fsys.getContentSummary(new org.apache.hadoop.fs.Path(
              s"$root/sketch/v=$v/bkt=$b")).getLength
          }.sum
          val resolved = TxSketchStack.resolve(spark, root)
            .localCheckpoint()
          val nKeys = resolved.count()
          println(s"PROBE txsketch $scale docs=$nD keys=$nKeys " +
            s"batch4_write_rows=$lastRows " +
            s"batch4_buckets=$lastTouched of 64 " +
            s"pinned_state_bytes=$pinnedBytes metadata_files=2")
          // estimate quality at this cardinality: worst relative
          // error across keys (HLL lgK=12 bound ~1.6%; theta exact
          // below 4096 samples/key)
          val exact = keyed.groupBy(col("dom").as("key"))
            .agg(count_distinct(col("doc_id")).as("ex"))
          val worst = TxSketchStack.estimates(resolved)
            .join(exact, Seq("key"))
            .select(max(abs(col("est") - col("ex")) / col("ex")))
            .head().getDouble(0)
          println(f"PROBE txsketch $scale worst_rel_err=$worst%.4f " +
            s"of hll_bound=0.016")
          // pruned serve: 2 queried keys open <= 2 of the pinned dirs
          import spark.implicits._
          val q2 = Seq("d3", "d7").toDF("key")
          val served = TxSketchStack.resolve(spark, root,
            keys = Some((q2, 64)))
          val files = served.inputFiles
          val dirsOpened = files.map(f =>
            f.substring(0, f.lastIndexOf('/'))).distinct.length
          println(s"PROBE txsketch $scale serve_q_keys=2 " +
            s"sketch_dirs_opened=$dirsOpened of ${st.statsV.size} " +
            s"rows_read=${served.count()}")
          val vs = TxSketchStack.vacuum(spark, root)
          println(s"PROBE txsketch $scale " +
            s"vacuum_deleted_dirs=${vs.deletedDirs} " +
            s"retired_manifests=${vs.deletedManifests} " +
            s"kept_dirs=${vs.keptDirs}")
        } finally {
          graft.queries.FixtureCache.deleteRecursively(stage)
        }
      }

      if (want("txview")) {
        // change-feed consumer laws (round 17): between adjacent cuts
        // the feed reads only RE-PINNED upstream buckets (rows ∝ the
        // changed keys' bucket population, not the ledger), a view
        // refresh rewrites only the touched GROUPS' member buckets
        // (rows ∝ group sizes, not corpus), and a 1-group serve opens
        // one member dir. All three must hold constant while the
        // corpus grows — the feed/view pair is what makes a nightly
        // dashboard O(delta) instead of O(corpus).
        import graft.operators.{Manifest, TxSketchStack, TxViewStack}
        val dv = graft.Tables.documents(spark, dir)
        val keyed = dv.select(
          concat(lit("d"), pmod(xxhash64(col("text")), lit(256L)))
            .as("dom"),
          col("doc_id"))
        val nD = dv.count()
        val stage = java.nio.file.Files.createTempDirectory("graft_txvw")
        val root = stage.resolve("stack").toString
        val view = stage.resolve("view").toString
        try {
          TxSketchStack.init(spark, root)
          val qn = nD / 4
          for (p <- 0 until 3)
            TxSketchStack.commitBatch(spark, root,
              keyed.filter(col("doc_id") >= p * qn &&
                col("doc_id") < (p + 1) * qn),
              p.toLong, "dom", "doc_id", buckets = 64)
          // group = first digit of the domain id: 10 groups, ~26 keys
          val grpOf: org.apache.spark.sql.Column =>
            org.apache.spark.sql.Column = c => substring(c, 2, 1)
          TxViewStack.build(spark, view, root, grpOf, buckets = 16)
          // the nightly delta: the last quarter's arrivals for TWO
          // domains only — the small-feed regime a cadence consumer
          // actually sees
          val upPrev = Manifest.read(spark, root).get
          TxSketchStack.commitBatch(spark, root,
            keyed.filter(col("doc_id") >= 3 * qn &&
              col("dom").isin("d3", "d7")),
            3L, "dom", "doc_id", buckets = 64)
          val upSt = Manifest.read(spark, root).get
          val upChanged = upSt.statsV.toSeq.diff(upPrev.statsV.toSeq)
          val feedReadRows = spark.read
            .option("basePath", s"$root/sketch")
            .parquet((upChanged ++ upChanged.map { case (b, _) =>
              b -> upPrev.statsV(b) }).distinct.map { case (b, v) =>
              s"$root/sketch/v=$v/bkt=$b" }: _*).count()
          val feedRows = TxSketchStack.changes(spark, root,
            upPrev.version, upSt.version).count()
          val ledgerRows = TxSketchStack.resolve(spark, root).count()
          println(s"PROBE txview $scale docs=$nD feed_keys=$feedRows " +
            s"feed_buckets=${upChanged.size} of 64 " +
            s"feed_read_rows=$feedReadRows of ledger_rows=$ledgerRows")
          val vwPrev = Manifest.read(spark, view).get
          TxViewStack.refresh(spark, view, root, upSt.version, grpOf,
            buckets = 16)
          val vwSt = Manifest.read(spark, view).get
          val vwChanged = vwSt.statsV.toSeq.diff(vwPrev.statsV.toSeq)
          val refreshRows = spark.read
            .option("basePath", s"$view/members")
            .parquet(vwChanged.map { case (b, v) =>
              s"$view/members/v=$v/bkt=$b" }: _*).count()
          println(s"PROBE txview $scale refresh_buckets=" +
            s"${vwChanged.size} of 16 refresh_write_rows=$refreshRows")
          import spark.implicits._
          val served = TxViewStack.members(spark, view,
            groups = Some((Seq("3").toDF("grp"), 16)))
          val dirsOpened = served.inputFiles.map(f =>
            f.substring(0, f.lastIndexOf('/'))).distinct.length
          println(s"PROBE txview $scale serve_groups=1 " +
            s"member_dirs_opened=$dirsOpened of ${vwSt.statsV.size} " +
            s"rows_read=${served.count()}")
        } finally {
          graft.queries.FixtureCache.deleteRecursively(stage)
        }
      }

      if (want("txsplit")) {
        // split-assignment ledger (round 16/17): the laws that govern
        // it at 100 TB — (1) pinned state is one tiny row per assigned
        // doc (bytes/doc ~constant as the corpus grows); (2) a small
        // batch's commit cost is the undersized-B law: each touched
        // bucket's REPLACEMENT rewrites ledger/B rows, so with B fixed
        // the write grows ∝ corpus — measured here, with the rebucket
        // migration as the cure (B′ ∝ corpus restores write ∝ batch);
        // (3) the inheritance read elects MEMBER buckets only, so the
        // arrival path's reads stay ≤ B dirs at any corpus size.
        import graft.operators.{Manifest, TxSplitStack}
        val ids = d.select("doc_id")
        val nD = ids.count()
        val sp = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)
        val stage = java.nio.file.Files.createTempDirectory("graft_txsp")
        val root = stage.resolve("ledger").toString
        try {
          TxSplitStack.init(spark, root)
          // pair clusters (stable labels): the bulk drain, 4 quarters
          val labels = ids.select(col("doc_id").as("id"),
            (col("doc_id") - col("doc_id") % 2).as("cluster"))
          val qn = nD / 4
          for (p <- 0 until 4) {
            val lo = p * qn
            val hi = if (p == 3) nD else (p + 1) * qn
            TxSplitStack.commitAssign(spark, root,
              ids.filter(col("doc_id") >= lo && col("doc_id") < hi),
              labels, p.toLong, "doc_id", sp, buckets = 64)
          }
          val st = Manifest.read(spark, root).get
          val fsys = new org.apache.hadoop.fs.Path(root)
            .getFileSystem(spark.sessionState.newHadoopConf())
          val pinnedBytes = st.statsV.toSeq.map { case (b, v) =>
            fsys.getContentSummary(new org.apache.hadoop.fs.Path(
              s"$root/assign/v=$v/bkt=$b")).getLength
          }.sum
          println(s"PROBE txsplit $scale docs=$nD " +
            s"pinned_state_bytes=$pinnedBytes " +
            s"bytes_per_doc=${pinnedBytes / math.max(nD, 1)}")
          // small-batch commit at B=64: 256 arrivals, each pairing with
          // a stored doc (the inheritance path on the grown ledger) —
          // the write is the touched buckets' replacement, ∝ ledger/B
          def arrivalsAt(base: Long) = {
            val a = spark.range(base, base + 256).toDF("doc_id")
            val lab = a.select(col("doc_id").as("id"),
              ((col("doc_id") - base) * 2).as("cluster"))
              .unionByName(ids.select(col("doc_id").as("id"),
                col("doc_id").as("cluster"))
                .filter(col("id") % 2 === 0 && col("id") < 512))
            (a, lab)
          }
          def changedRows(prev: Manifest.State,
                          now: Manifest.State): Long = {
            val changed = now.statsV.toSeq.diff(prev.statsV.toSeq)
            if (changed.isEmpty) 0L
            else spark.read.option("basePath", s"$root/assign")
              .parquet(changed.map { case (b, v) =>
                s"$root/assign/v=$v/bkt=$b" }: _*).count()
          }
          val (a5, l5) = arrivalsAt(nD)
          val st4 = Manifest.read(spark, root).get
          val t5 = System.nanoTime()
          TxSplitStack.commitAssign(spark, root, a5, l5, 4L, "doc_id",
            sp, buckets = 64)
          val dt5 = (System.nanoTime() - t5) / 1e9
          val wrote5 = changedRows(st4, Manifest.read(spark, root).get)
          println(f"PROBE txsplit $scale batch_256_at_B64 " +
            f"write_rows=$wrote5 of_ledger=$nD secs=$dt5%.2f")
          // the cure: rebucket to B' = 1024, same 256-doc batch shape —
          // replacement rows drop to ~ledger/B' per touched bucket
          TxSplitStack.rebucket(spark, root, newBuckets = 1024)
          val (a6, l6) = arrivalsAt(nD + 1000000L)
          val st5b = Manifest.read(spark, root).get
          val t6 = System.nanoTime()
          TxSplitStack.commitAssign(spark, root, a6, l6, 5L, "doc_id",
            sp, buckets = 1024)
          val dt6 = (System.nanoTime() - t6) / 1e9
          val wrote6 = changedRows(st5b, Manifest.read(spark, root).get)
          println(f"PROBE txsplit $scale batch_256_at_B1024 " +
            f"write_rows=$wrote6 of_ledger=${nD + 256} secs=$dt6%.2f")
          // incremental-quarantine serve: O(conflicted) pinned rows
          val qRows = TxSplitStack.quarantineIncremental(spark, root)
            .count()
          println(s"PROBE txsplit $scale quarantine_inc_rows=$qRows " +
            s"of_ledger=${nD + 512}")
        } finally {
          graft.queries.FixtureCache.deleteRecursively(stage)
        }
      }

      if (want("txtable")) {
        // general keyed table + join view (round 17): the laws —
        // (1) SCHEMA EVOLUTION is O(1): zero data rows read or
        // written, zero re-pins, constant wall at any corpus size
        // (the whole point of metadata-only add-column vs the
        // O(corpus) rewrite it replaces); (2) an upsert batch writes
        // its touched buckets' replacement (the shared undersized-B
        // law, cured by rebucket-style B' growth); (3) the JOIN
        // VIEW's refresh reads the FEED + its buckets only — never
        // either upstream corpus — and its serve aggregates member
        // rows, not upstream ledgers.
        import graft.operators.{Manifest, TxJoinViewStack, TxServeStack,
          TxSplitStack, TxTableStack}
        val d = graft.Tables.documents(spark, dir)
        val nD = d.count()
        val stage = java.nio.file.Files.createTempDirectory("graft_txt")
        val root = stage.resolve("tbl").toString
        try {
          val B = 64
          TxTableStack.init(spark, root, "doc_id LONG, lang STRING")
          val qn = nD / 4
          for (p <- 0 until 4) {
            val lo = p * qn
            val hi = if (p == 3) nD else (p + 1) * qn
            TxTableStack.commitBatch(spark, root,
              d.filter(col("doc_id") >= lo && col("doc_id") < hi)
                .select("doc_id", "lang"),
              p.toLong, "doc_id", B)
          }
          val fsys = new org.apache.hadoop.fs.Path(root)
            .getFileSystem(spark.sessionState.newHadoopConf())
          def dataFiles(): Long = {
            val it = fsys.listFiles(
              new org.apache.hadoop.fs.Path(s"$root/rows"), true)
            var n = 0L
            while (it.hasNext) {
              if (it.next().getPath.getName.endsWith(".parquet")) n += 1
            }
            n
          }
          // THE evolution law: O(1) at any scale
          val filesBefore = dataFiles()
          val pinsBefore = Manifest.read(spark, root).get.statsV
          val tEv = System.nanoTime()
          TxTableStack.evolveSchema(spark, root, "quality DOUBLE")
          val dtEv = (System.nanoTime() - tEv) / 1e9
          val stEv = Manifest.read(spark, root).get
          require(stEv.statsV == pinsBefore && dataFiles() == filesBefore,
            "evolution must be metadata-only")
          println(f"PROBE txtable $scale docs=$nD evolve_secs=$dtEv%.2f " +
            s"data_files_touched=0 repins=0")
          // small upsert on the grown ledger: touched-bucket law
          val st0 = Manifest.read(spark, root).get
          val up = d.filter(col("doc_id") < 256)
            .select(col("doc_id"), col("lang"), lit(0.5).as("quality"))
          val tUp = System.nanoTime()
          TxTableStack.commitBatch(spark, root, up, 4L, "doc_id", B)
          val dtUp = (System.nanoTime() - tUp) / 1e9
          val st1 = Manifest.read(spark, root).get
          val changedT = st1.statsV.toSeq.diff(st0.statsV.toSeq)
          val wrote = spark.read.option("basePath", s"$root/rows")
            .parquet(changedT.map { case (b, v) =>
              s"$root/rows/v=$v/bkt=$b" }: _*).count()
          println(f"PROBE txtable $scale upsert_256 write_rows=$wrote " +
            f"of_ledger=$nD buckets=${changedT.size} of $B secs=$dtUp%.2f")
          // 4-key micro-upsert: the bucket-pruning law (write ∝ the
          // touched buckets' occupancy ≈ ledger × 4/B, never the
          // ledger; the undersized-B cure is rebucket, measured once
          // for the shared writeRepin kernel in the txsplit family)
          val st1m = Manifest.read(spark, root).get
          TxTableStack.commitBatch(spark, root,
            d.filter(col("doc_id") < 4)
              .select(col("doc_id"), col("lang"), lit(0.9).as("quality")),
            5L, "doc_id", B)
          val changedM = Manifest.read(spark, root).get.statsV.toSeq
            .diff(st1m.statsV.toSeq)
          val wroteM = spark.read.option("basePath", s"$root/rows")
            .parquet(changedM.map { case (b, v) =>
              s"$root/rows/v=$v/bkt=$b" }: _*).count()
          println(s"PROBE txtable $scale upsert_4 write_rows=$wroteM " +
            s"of_ledger=$nD buckets=${changedM.size} of $B")

          // join view over a lexical drain + split ledger at this scale
          val lexRoot = stage.resolve("lex").toString
          val splRoot = stage.resolve("spl").toString
          val viewRoot = stage.resolve("view").toString
          for (p <- 0 until 2)
            TxServeStack.commitBatch(spark, lexRoot,
              d.filter(col("doc_id") >= p * (nD / 2) &&
                col("doc_id") < (if (p == 1) nD else nD / 2)),
              p.toLong, "doc_id", "text", 64, 256)
          TxSplitStack.init(spark, splRoot)
          TxSplitStack.commitAssign(spark, splRoot, d.select("doc_id"),
            d.select(col("doc_id").as("id"),
              (col("doc_id") - col("doc_id") % 2).as("cluster")),
            0L, "doc_id", Seq("train" -> 0.8, "val" -> 0.1,
              "test" -> 0.1), buckets = 64)
          TxJoinViewStack.build(spark, viewRoot, lexRoot, splRoot,
            buckets = 64)
          // the nightly delta: retire 256 docs from the index, refresh
          val vw0 = Manifest.read(spark, viewRoot).get
          TxServeStack.commitDelete(spark, lexRoot,
            d.filter(col("doc_id") >= nD - 256).select("doc_id"),
            2L, "doc_id", 64, 256)
          val tRf = System.nanoTime()
          TxJoinViewStack.refreshLex(spark, viewRoot, lexRoot,
            Manifest.read(spark, lexRoot).get.version, 64, 64)
          val dtRf = (System.nanoTime() - tRf) / 1e9
          val vw1 = Manifest.read(spark, viewRoot).get
          val changedV = vw1.statsV.toSeq.diff(vw0.statsV.toSeq)
          val vWrote = spark.read.option("basePath", s"$viewRoot/members")
            .parquet(changedV.map { case (b, v) =>
              s"$viewRoot/members/v=$v/bkt=$b" }: _*).count()
          println(f"PROBE txjoin $scale docs=$nD feed_docs=256 " +
            f"refresh_write_rows=$vWrote buckets=${changedV.size} " +
            f"of 64 secs=$dtRf%.2f")
          val tSv = System.nanoTime()
          val served = TxJoinViewStack.serveTokens(spark, viewRoot)
            .count()
          println(f"PROBE txjoin $scale serve_splits=$served " +
            f"secs=${(System.nanoTime() - tSv) / 1e9}%.2f")
        } finally {
          graft.queries.FixtureCache.deleteRecursively(stage)
        }
      }

      if (want("semdedup")) {
        // PQ-prefix semantic blocking: the governing count is the
        // blocked candidate-pair total Sigma n*(n-1)/2 over blocks. At a
        // FIXED prefix the alphabet is constant (ksub^prefix), so
        // candidates grow quadratically with the corpus - the same
        // saturation every banded family measures - and the prescription
        // is the same: grow the prefix with the corpus (one more
        // subspace multiplies the alphabet by ksub, dividing occupancy).
        import graft.operators.Similarity
        val e = graft.Tables.embeddings(spark, dir)
        val cb = Similarity.pqCodebookSeed(e, "vec_id", "embedding",
          m = 8, ksub = 16, subDim = 8)
        for (prefix <- Seq(2, 3)) {
          val g = Similarity.pqEncode(e, cb, "vec_id", "embedding")
            .filter(col("codes").isNotNull)
            .select(array_join(slice(col("codes"), 1, prefix), ",").as("blk"))
            .groupBy("blk").agg(count(lit(1)).as("n"))
          val st = g.agg(max("n").as("mx"), count(lit(1)).as("blocks"),
            sum(expr("CAST(n * (n - 1) DIV 2 AS BIGINT)")).as("pairs")).head()
          println(s"PROBE semdedup $scale prefix=$prefix " +
            s"blocks=${st.getLong(1)} max_block=${st.getLong(0)} " +
            s"cand_pairs=${st.getLong(2)}")
        }
        for (pass <- 1 to 2) {
          val t0 = System.nanoTime()
          Similarity.semanticPqPairs(e, cb, "vec_id", "embedding",
            threshold = 0.3, prefix = 2)
            .write.format("noop").mode("overwrite").save()
          println(f"PROBE semdedup $scale pass$pass " +
            f"pairs_prefix2_s=${(System.nanoTime() - t0) / 1e9}%.2f")
        }
        // arrival face (round 15): per-batch incident candidate volume
        // = Σ over the batch's blocks of batch_n × stored_n — the
        // governing count of dedup_semantic_incremental's maintenance
        // cost; O(batch) means it tracks the batch's block occupancy,
        // not the corpus pair total above
        val batchSem = e.filter(col("vec_id") % 40 === 23)
        val storedSem = e.filter(col("vec_id") % 40 =!= 23)
        val sIdx = Similarity.semanticBlockIndex(storedSem, cb,
          "vec_id", "embedding", prefix = 2)
        val bIdx = Similarity.semanticBlockIndex(batchSem, cb,
          "vec_id", "embedding", prefix = 2)
        val inc = bIdx.groupBy("blk").agg(count(lit(1)).as("bn"))
          .join(sIdx.groupBy("blk").agg(count(lit(1)).as("sn")), Seq("blk"))
          .agg(sum(col("bn") * col("sn")).as("cand")).head()
        println(s"PROBE semdedup $scale incident_batch=${batchSem.count()} " +
          s"incident_cand=${if (inc.isNullAt(0)) 0L else inc.getLong(0)}")
      }

      if (want("pq")) {
        // PQ family: encode throughput (scalar projection — must scale
        // linearly with zero shuffle), the EXHAUSTIVE ADC scan (pqTopK —
        // linear and honest, the pre-routing baseline), and the composed
        // IVF-PQ (4 of 16 cells probed — cost ∝ probed fraction). The
        // governing count is Σ probed-cell occupancy vs corpus size:
        // that ratio, not wall time, is what survives a 1000× scale-up.
        import graft.operators.Similarity
        val e = graft.Tables.embeddings(spark, dir)
        val cb = Similarity.pqCodebookSeed(e, "vec_id", "embedding",
          m = 8, ksub = 16, subDim = 8)
        val q = e.filter(col("vec_id") < 5)
        val cent = e.filter(col("vec_id") < 16)
          .select(col("vec_id").cast("int").as("cell"), col("embedding").as("c_vec"))
        for (pass <- 1 to 2) {
          var t0 = System.nanoTime()
          Similarity.pqEncode(e, cb, "vec_id", "embedding")
            .write.format("noop").mode("overwrite").save()
          val tEnc = (System.nanoTime() - t0) / 1e9
          t0 = System.nanoTime()
          Similarity.pqTopK(q, e, cb, "vec_id", "embedding", k = 5)
            .write.format("noop").mode("overwrite").save()
          val tAdc = (System.nanoTime() - t0) / 1e9
          t0 = System.nanoTime()
          Similarity.ivfPqTopK(q, e, cent, cb, "vec_id", "embedding",
            k = 5, nProbe = 4)
            .write.format("noop").mode("overwrite").save()
          val tIvf = (System.nanoTime() - t0) / 1e9
          println(f"PROBE pq $scale pass$pass encode_s=$tEnc%.2f " +
            f"adc_exhaustive_s=$tAdc%.2f ivfpq_4of16_s=$tIvf%.2f")
        }
        // SDC vs float graph: same cell-diagonal pair set, the PQ form
        // ships m-byte codes where the float form ships 4·dim-byte
        // vectors — the exchange-byte cut is the measured quantity.
        // Centroids scale ∝ corpus (SCALE.md's sizing rule: constant
        // occupancy) — with the 1× cell count the within-cell pair set
        // grows QUADRATICALLY with the replica (at 100× that is ~2.5e9
        // pairs, a mis-sized index, and exactly what the operators'
        // hot-cell guard exists to refuse at a tighter cap)
        val nCellsKnn = if (dir == sfDir) 16 else 16 * factor
        val centKnn = e.filter(col("vec_id") < nCellsKnn)
          .select(col("vec_id").cast("int").as("cell"),
            col("embedding").as("c_vec"))
        for (pass <- 1 to 2) {
          var t0 = System.nanoTime()
          Similarity.knnGraph(e, centKnn, "vec_id", "embedding", k = 3)
            .write.format("noop").mode("overwrite").save()
          val tF = (System.nanoTime() - t0) / 1e9
          t0 = System.nanoTime()
          Similarity.knnGraphPq(e, centKnn, cb, "vec_id", "embedding", k = 3)
            .write.format("noop").mode("overwrite").save()
          val tS = (System.nanoTime() - t0) / 1e9
          println(f"PROBE pq $scale pass$pass cells=$nCellsKnn " +
            f"knn_float_s=$tF%.2f knn_sdc_s=$tS%.2f")
        }
        // binary face: sign + Hamming scan — the exhaustive baseline at
        // 8 B/row signatures and 2 word ops/candidate; must stay linear
        for (pass <- 1 to 2) {
          val t0 = System.nanoTime()
          Similarity.hammingTopK(q, e, "vec_id", "embedding", k = 5)
            .write.format("noop").mode("overwrite").save()
          println(f"PROBE pq $scale pass$pass " +
            f"hamming_exhaustive_s=${(System.nanoTime() - t0) / 1e9}%.2f")
        }
        // incremental index maintenance: append a FIXED 1000-vector
        // batch to a STORED corpus-sized ledger, delta face (what a
        // parquet-backed ledger writes). Encode/assign cost is ∝ batch;
        // the only corpus-∝ term is the anti-join's column-pruned
        // 8-byte-id ledger scan — wall should stay near-flat while the
        // ledger grows 100×.
        val ledgerPath = s"$scratch/pq_ledger_$scale.parquet"
        Similarity.pqIndexBuild(e, cent, cb, "vec_id", "embedding")
          .write.mode("overwrite").parquet(ledgerPath)
        val stored = spark.read.parquet(ledgerPath)
        val mxId = e.agg(max("vec_id")).head().getLong(0)
        val batch = e.filter(col("vec_id") < 1000)
          .withColumn("vec_id", col("vec_id") + lit(mxId + 1))
        for (pass <- 1 to 2) {
          val t0 = System.nanoTime()
          Similarity.pqIndexAppend(stored, batch, cent, cb,
            "vec_id", "embedding", deltaOnly = true)
            .write.format("noop").mode("overwrite").save()
          println(f"PROBE pq $scale pass$pass " +
            f"index_append_batch1000_s=${(System.nanoTime() - t0) / 1e9}%.2f")
        }
        val n = e.count()
        val occ = Similarity.ivfAssign(e, cent, "vec_id", "embedding")
          .groupBy("cell").agg(count(lit(1)).as("n"))
        val cent2 = cent.withColumn("c_nrm",
          graft.functions.VectorFns.l2NormN(col("c_vec"), 64))
        val probes = q.select(col("vec_id").as("q_id"),
            col("embedding").as("q_vec"),
            graft.functions.VectorFns.l2NormN(col("embedding"), 64).as("q_nrm"))
          .join(broadcast(cent2))
          .withColumn("cos", when(col("q_nrm") > 0.0 && col("c_nrm") > 0.0,
            graft.functions.VectorFns.dotN(col("q_vec"), col("c_vec"), 64)
              / (col("q_nrm") * col("c_nrm"))))
          .withColumn("prb", org.apache.spark.sql.functions.row_number().over(
            org.apache.spark.sql.expressions.Window.partitionBy("q_id")
              .orderBy(col("cos").desc, col("cell").desc)))
          .filter(col("prb") <= 4).select("q_id", "cell")
        val probed = probes.join(occ, "cell")
          .agg(sum("n")).head().getLong(0)
        val exhaustive = n * q.count()
        println(f"PROBE pq $scale corpus=$n probed_candidates=$probed " +
          f"exhaustive_candidates=$exhaustive " +
          f"scan_fraction=${probed.toDouble / exhaustive}%.4f")
      }

      // round-12 third wave: SQ8 encode/scan, frozen-graph beam search,
      // BM25 posting fan-in. The claims under test: SQ8 is linear with a
      // zero-shuffle encode (like pqEncode, at 4× not 32× compression);
      // graph-search WALL TIME is flat across corpus decades once the
      // graph is a stored asset (touched work = hops × beam × fan-out
      // per query, corpus-independent — the defining property of the
      // family); BM25's only corpus-∝ exchange is the tokenize that
      // builds the tf table, while the QUERY-side join fan-in is
      // Σ df(t) over query terms (the posting-list read a real inverted
      // index would do), measured here as the governing count.
      if (want("retr")) {
        import graft.operators.{Retrieval, Similarity}
        val e = graft.Tables.embeddings(spark, dir)
        val q5 = e.filter(col("vec_id") < 5)
        val stats = Similarity.sqStats(e, "embedding", dim = 64)
        for (pass <- 1 to 2) {
          var t0 = System.nanoTime()
          Similarity.sqEncode(e, stats, "vec_id", "embedding")
            .write.format("noop").mode("overwrite").save()
          val tEnc = (System.nanoTime() - t0) / 1e9
          t0 = System.nanoTime()
          Similarity.sqTopK(q5, e, stats, "vec_id", "embedding", k = 5)
            .write.format("noop").mode("overwrite").save()
          val tScan = (System.nanoTime() - t0) / 1e9
          println(f"PROBE retr $scale pass$pass sq8_encode_s=$tEnc%.2f " +
            f"sq8_exhaustive_s=$tScan%.2f")
        }
        // positional-retrieval faces over a STORED ledger (round 14):
        // build once per corpus, then time the match ops alone —
        // phrase and both NEAR forms must scale with MATCHED postings
        // (the query terms' occurrence lists), never with the corpus²
        // pair space (the plane-sweep argument); the 10× wall ratio is
        // the witness
        val posPath = s"$scratch/_posledger_$scale.parquet"
        var tP0 = System.nanoTime()
        graft.operators.Retrieval.positionalIndexBuild(d, "doc_id", "text")
          .write.mode("overwrite").parquet(posPath)
        println(f"PROBE retr $scale " +
          f"pos_ledger_build_s=${(System.nanoTime() - tP0) / 1e9}%.2f")
        val posLedger = spark.read.parquet(posPath)
        val phq = d.filter(col("doc_id") < 3)
          .select(col("doc_id").as("q_id"),
            posexplode(slice(split(col("text"), " "), 1, 3))
              .as(Seq("idx", "term")))
        val qts = phq.select(col("q_id"), col("term"))
        for (pass <- 1 to 2) {
          tP0 = System.nanoTime()
          Retrieval.phraseMatch(phq, posLedger)
            .write.format("noop").mode("overwrite").save()
          val tPh = (System.nanoTime() - tP0) / 1e9
          tP0 = System.nanoTime()
          Retrieval.proximityMatch(qts, posLedger, window = 3)
            .write.format("noop").mode("overwrite").save()
          val tNe = (System.nanoTime() - tP0) / 1e9
          tP0 = System.nanoTime()
          Retrieval.orderedNearMatch(phq, posLedger, window = 3)
            .write.format("noop").mode("overwrite").save()
          val tOr = (System.nanoTime() - tP0) / 1e9
          println(f"PROBE retr $scale pass$pass phrase_s=$tPh%.2f " +
            f"near_s=$tNe%.2f ordered_s=$tOr%.2f")
        }
        // frozen-graph search: build the kNN graph ONCE per corpus
        // (cells ∝ corpus — the knnGraph sizing rule), store it, then
        // time the 3-hop beam search alone against the stored edges
        val nCellsG = if (dir == sfDir) 16 else 16 * factor
        val centG = e.filter(col("vec_id") < nCellsG)
          .select(col("vec_id").cast("int").as("cell"),
            col("embedding").as("c_vec"))
        val graphPath = s"$scratch/_graph_$scale.parquet"
        var t0 = System.nanoTime()
        Similarity.knnGraph(e, centG, "vec_id", "embedding", k = 3)
          .select("src_id", "nbr_id", "cos")
          .write.mode("overwrite").parquet(graphPath)
        println(f"PROBE retr $scale graph_build_s=${(System.nanoTime() - t0) / 1e9}%.2f")
        val storedGraph = spark.read.parquet(graphPath)
        for (pass <- 1 to 2) {
          t0 = System.nanoTime()
          Similarity.graphSearchTopK(q5, e, storedGraph,
            "vec_id", "embedding", k = 3, beam = 4, hops = 3)
            .write.format("noop").mode("overwrite").save()
          println(f"PROBE retr $scale pass$pass " +
            f"graph_search_s=${(System.nanoTime() - t0) / 1e9}%.2f")
        }
        // RECALL WITNESS at the probe decade (round-18 / VERDICT r17
        // task 7): wall-clock flatness alone hides a quality collapse
        // — a beam that never escapes its entry cells is ALSO flat,
        // and the island `knnGraph` above is exactly that (recall
        // ~0.08, the round-12 finding re-measured here every decade
        // as the contrast row). The REQUIREd witness runs on the
        // graph a user should store — `knnGraphConnected`, the medoid
        // highway build — at the round-12 quality configuration
        // (beam 16, hops 8): recall@3 vs the exact bruteForceTopK on
        // a 16-query sample must clear the floor at EVERY probed
        // decade, so the quality law rides the probe next to the wall
        // law instead of living only at fixed SF
        // (eval_retrieval_quality).
        val qR = e.filter(col("vec_id") < 16)
        val exactG = Similarity.bruteForceTopK(qR, e, "vec_id",
          "embedding", k = 3).select(col("q_id"), col("n_id"))
          .localCheckpoint()
        val denomG = exactG.count()
        def recallOf(graph: DataFrame, beam: Int, hops: Int): Double =
          Similarity.graphSearchTopK(qR, e, graph, "vec_id",
            "embedding", k = 3, beam = beam, hops = hops)
            .select(col("q_id"), col("n_id"))
            .join(exactG, Seq("q_id", "n_id")).count().toDouble / denomG
        val recIsl = recallOf(storedGraph, 4, 3)
        val connPath = s"$scratch/_graphc_$scale.parquet"
        t0 = System.nanoTime()
        Similarity.knnGraphConnected(e, centG, "vec_id", "embedding",
          k = 3).write.mode("overwrite").parquet(connPath)
        val tConnB = (System.nanoTime() - t0) / 1e9
        val storedConn = spark.read.parquet(connPath)
        t0 = System.nanoTime()
        val recConn = recallOf(storedConn, 16, 8)
        val tConnS = (System.nanoTime() - t0) / 1e9
        println(f"PROBE retr $scale graph_recall_at3 island=$recIsl%.3f " +
          f"connected=$recConn%.3f conn_build_s=$tConnB%.2f " +
          f"conn_search_s=$tConnS%.2f pairs=$denomG")
        require(recConn >= 0.45,
          f"connected-graph beam recall collapsed at $scale: " +
            f"$recConn%.3f < 0.45 — the wall-flatness law is " +
            "meaningless without the quality floor")
        // graph-index INSERT: a FIXED 5-node batch appended against the
        // stored graph — beam searches + a touched-sources-only degree
        // recap, so wall must stay near-flat while the graph grows 10×
        val mxIdG = e.agg(max("vec_id")).head().getLong(0)
        val batchG = e.filter(col("vec_id") < 5)
          .withColumn("vec_id", col("vec_id") + lit(mxIdG + 1))
        for (pass <- 1 to 2) {
          t0 = System.nanoTime()
          Similarity.graphAppend(storedGraph, e, batchG,
            "vec_id", "embedding", k = 3, beam = 4, hops = 3,
            maxDegree = 4)
            .write.format("noop").mode("overwrite").save()
          println(f"PROBE retr $scale pass$pass " +
            f"graph_append_batch5_s=${(System.nanoTime() - t0) / 1e9}%.2f")
        }
        // MINHASH HOT-BAND CAP (round-18 / VERDICT r17 task 5): on a
        // template-injected corpus (every 20th doc the same
        // boilerplate) the LSH self-join's governing count is Σ C(n,2)
        // over band buckets — the template bucket alone is quadratic
        // in corpus scale. The df-capped variant (maxBandDf's degrade
        // arm) drops over-cap buckets, so its pair count is bounded by
        // bands × cap per doc — the measured exponent fix, phash's
        // capped32 row brought to minhash.
        {
          import graft.operators.Dedup
          val tplM = lit(
            "terms of service apply to all content provided herein")
          val modD = d.select(col("doc_id").as("id"),
            when(col("doc_id") % 20 === 0, tplM)
              .otherwise(col("text")).as("text"))
          val bkM = Dedup.bandedKeys(modD, "id", "text")
            .localCheckpoint()
          val candU = choose2(
            bkM.groupBy("band", "bk").agg(count(lit(1)).as("n")))
          val keptM = bkM.join(
            bkM.groupBy("band", "bk").agg(count(lit(1)).as("_df"))
              .filter(col("_df") <= 16).select("band", "bk"),
            Seq("band", "bk"))
          val candC = choose2(
            keptM.groupBy("band", "bk").agg(count(lit(1)).as("n")))
          println(s"PROBE retr $scale minhash docs=$nDocs " +
            s"banded_pairs=$candU banded_pairs_capped16=$candC")
        }
        // perceptual-hash near-dup: banded candidate pairs are the
        // governing count (the slice join's fan-in before the Hamming
        // confirm) — must track true-duplicate density, never factor²
        import spark.implicits._
        val recs = d.select(col("doc_id").as("id"), col("text"))
          .as[(Long, String)]
          .map { case (id, text) => graft.operators.Multimodal
            .MediaRecord(id, "text", text.getBytes("UTF-8")) }
        val sigsP = graft.operators.Multimodal.perceptualHash(recs).toDF()
        val slB = sigsP.select(col("id"), col("sig"),
            explode(sequence(lit(0), lit(3))).as("k"))
          .withColumn("v", expr("substring(sig, k * 16 + 1, 16)"))
        val candP = choose2(slB.groupBy("k", "v").agg(count(lit(1)).as("n")))
        // blocked variant (compound (slice, length-bucket) key — the
        // dedup_simhash_blocked prescription): the Σn² term must
        // collapse back toward linear
        val slBb = slB.join(d.select(col("doc_id").as("id"),
          expr("CAST(length(text) AS BIGINT) DIV 100").as("blk")), "id")
        val candPb = choose2(
          slBb.groupBy("k", "v", "blk").agg(count(lit(1)).as("n")))
        // occupancy-capped (maxSliceDf = 32, the maxGramDf pattern):
        // fan-in per surviving bucket is bounded by the cap, so growth
        // is linear in the corpus BY CONSTRUCTION — the exponent fix
        val keptC = slBb.join(
          slBb.groupBy("k", "v", "blk").agg(count(lit(1)).as("_df"))
            .filter(col("_df") <= 32).select("k", "v", "blk"),
          Seq("k", "v", "blk"))
        val candPc = choose2(
          keptC.groupBy("k", "v", "blk").agg(count(lit(1)).as("n")))
        println(s"PROBE retr $scale phash docs=$nDocs banded_pairs=$candP " +
          s"banded_pairs_blocked=$candPb banded_pairs_capped32=$candPc")
        for (pass <- 1 to 2) {
          t0 = System.nanoTime()
          graft.operators.Multimodal.phashPairs(sigsP, maxHamming = 8)
            .write.format("noop").mode("overwrite").save()
          println(f"PROBE retr $scale pass$pass " +
            f"phash_pairs_s=${(System.nanoTime() - t0) / 1e9}%.2f")
        }
        // BM25 governing counts + timed end-to-end ranking
        val toks = d.select(col("doc_id"),
          explode(split(col("text"), " ")).as("term"))
        val qterms = toks.filter(col("doc_id") < 3).select("term").distinct()
        val nq = qterms.count()
        val fanin = toks.distinct().join(qterms, "term").count()
        println(s"PROBE retr $scale docs=$nDocs query_terms=$nq " +
          s"posting_fanin=$fanin")
        val qt = toks.filter(col("doc_id") < 3)
          .select(col("doc_id").as("q_id"), col("term"))
        for (pass <- 1 to 2) {
          t0 = System.nanoTime()
          Retrieval.bm25TopK(qt, d, "doc_id", "text", k = 10)
            .write.format("noop").mode("overwrite").save()
          println(f"PROBE retr $scale pass$pass " +
            f"bm25_s=${(System.nanoTime() - t0) / 1e9}%.2f")
        }
      }

      if (want("mix")) {
        // token-budget mixing: the bucketed two-phase prefix sum vs the
        // naive per-source window, timed at a 1% mixing rate (budget =
        // 1% of each source's tokens). The mixing key is the scale
        // hazard — tens of sources ⇒ a per-source window serializes the
        // corpus onto tens of partitions; the bucketed form multiplies
        // parallelism by 16 AND prunes budget-exceeded buckets before
        // the window shuffle. n_chars stands in for the token count so
        // the timing isolates the prefix-sum shape, not tokenization.
        val t = d.select(col("doc_id"), col("source"),
          col("n_chars").cast("long").as("toks"))
        val budgets = t.groupBy(col("source"))
          .agg((sum("toks") / 100).cast("long").as("token_budget"))
        val w = org.apache.spark.sql.expressions.Window.partitionBy("source")
          .orderBy(md5(concat_ws(":", lit("graft"), col("doc_id"))), col("doc_id"))
          .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
        val naive = t
          .join(broadcast(budgets), "source")
          .withColumn("prior", coalesce(sum(col("toks")).over(w), lit(0L)))
          .filter(col("prior") < col("token_budget"))
          .select("doc_id", "source", "toks")
        val bucketed = graft.operators.Sampling.tokenBudgetPerSource(
          t, col("source"), col("doc_id"), col("toks"), budgets)
        for ((name, df) <- Seq("naive" -> naive, "bucketed" -> bucketed);
             pass <- 1 to 2) {
          val t0 = System.nanoTime()
          df.write.format("noop").mode("overwrite").save()
          println(s"PROBE mix $scale $name pass$pass ${(System.nanoTime() - t0) / 1e9}")
        }
        val (na, bu) = (naive.count(), bucketed.count())
        println(s"PROBE mix $scale admitted naive=$na bucketed=$bu agree=${na == bu}")
      }
    }
    spark.stop()
  }
}
