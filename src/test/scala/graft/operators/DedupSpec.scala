package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class DedupSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog"),
    (2L, "the quick brown fox jumps over the lazy cat"),  // near-dup of 1
    (3L, "the quick brown fox jumps over the lazy dog"),  // exact dup of 1
    (4L, "completely different words appear here today"),
    (5L, "ab")                                            // < 3 words
  ).toDF("doc_id", "text")

  test("simhashPairs: unblocked corpora past maxDocs are refused; blocking waives the guard") {
    // the guard is the 1000x probe's prescription made executable:
    // vote concentration turns unblocked candidate growth super-linear
    val ex = intercept[IllegalArgumentException] {
      Dedup.simhashPairs(docs, "doc_id", "text", maxDocs = 3)
    }
    assert(ex.getMessage.contains("MinHash"))
    // a compound block key is the in-family fix, so it waives the guard
    Dedup.simhashPairs(docs, "doc_id", "text",
      blockCol = Some(lit("blk")), maxDocs = 3).count()
    // under the cap the unblocked form still runs
    Dedup.simhashPairs(docs, "doc_id", "text", maxDocs = 100).count()
  }

  test("dedupKeepFirst: only the smallest-id row of each text survives, payload intact") {
    import spark.implicits._
    val docs = Seq((3L, "same text", "a"), (1L, "same text", "b"),
      (2L, "other", "c")).toDF("doc_id", "text", "tag")
    val out = Dedup.dedupKeepFirst(docs, "doc_id", "text")
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getString(2))).toSeq
    assert(out == Seq((1L, "b"), (2L, "c"))) // id 3's duplicate dropped
    // duplicated ids still yield EXACTLY one survivor per distinct text
    val dupIds = Seq((1L, "same", "a"), (1L, "same", "b")).toDF("doc_id", "text", "tag")
    assert(Dedup.dedupKeepFirst(dupIds, "doc_id", "text").count() == 1)
  }

  test("dedupSpans: repeated spans keep only their first (doc, idx) occurrence") {
    // k=2 spans of doc 1: "a b", "c d", "a b" — the second "a b" is an
    // INTRA-document repeat; doc 2 repeats "a b" and "c d" across docs
    val in = Seq((1L, "a b c d a b"), (2L, "a b c d x"), (3L, "y"))
      .toDF("doc_id", "text")
    val out = Dedup.dedupSpans(in, "doc_id", "text", spanWords = 2)
      .select("doc_id", "text_dedup", "spans_total", "spans_kept")
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getInt(2), r.getInt(3)))
    assert(out(0) == ((1L, "a b c d", 3, 2)))
    assert(out(1) == ((2L, "x", 3, 1)))     // both full spans already seen
    assert(out(2) == ((3L, "y", 1, 1)))
  }

  test("dedupSpans: null text passes through; fully-duplicated doc empties") {
    val in = Seq((1L, "a b c d"), (2L, "a b c d"), (3L, null))
      .toDF("doc_id", "text")
    val out = Dedup.dedupSpans(in, "doc_id", "text", spanWords = 2)
      .select("doc_id", "text_dedup", "spans_total", "spans_kept")
      .orderBy("doc_id").collect()
    assert(out(1).getString(1) == "" && out(1).getInt(3) == 0)
    assert(out(2).isNullAt(1) && out(2).getInt(2) == 0 && out(2).getInt(3) == 0)
  }

  test("dedupSpansIncremental: ledger spans drop, batch-internal firsts keep") {
    val batch = Seq((10L, "a b c d e f"), (11L, "c d x y"))
      .toDF("doc_id", "text")
    // ledger holds the digest of span "a b" (and an unrelated digest)
    val ledger = Seq("a b", "zz zz").toDF("t")
      .select(md5(col("t")).as("h"))
    val out = Dedup.dedupSpansIncremental(batch, "doc_id", "text",
      ledger, "h", spanWords = 2)
      .select("doc_id", "text_dedup", "spans_kept")
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getInt(2)))
    // doc 10: "a b" in ledger (dropped), "c d" + "e f" fresh (kept)
    assert(out(0) == ((10L, "c d e f", 2)))
    // doc 11: "c d" already claimed by doc 10 within the batch; "x y" kept
    assert(out(1) == ((11L, "x y", 1)))
  }

  test("decontaminateJoin == decontaminate (exact parity), minus the broadcast hint") {
    val corpus = Seq(
      (1L, "the quick brown fox jumps over the lazy dog tonight"),
      (2L, "completely unrelated words appear in this training row"),
      (3L, "the quick brown fox jumps over the lazy dog again")
    ).toDF("doc_id", "text")
    val holdout = Seq(
      (10L, "the quick brown fox jumps over the lazy dog")
    ).toDF("doc_id", "text")
    val viaJoin = Dedup.decontaminateJoin(corpus, "doc_id", "text",
      holdout, "text", minShared = 5).select("doc_id").orderBy("doc_id")
      .collect().map(_.getLong(0)).toSeq
    val viaBcast = Dedup.decontaminate(corpus, "doc_id", "text",
      holdout, "text", minShared = 5).select("doc_id").orderBy("doc_id")
      .collect().map(_.getLong(0)).toSeq
    assert(viaJoin == Seq(2L) && viaBcast == Seq(2L))
    // the scale path differs only by the hint: broadcast form carries
    // one on the holdout side, the join form none
    def hints(df: org.apache.spark.sql.DataFrame) =
      df.queryExecution.analyzed.collect {
        case h: org.apache.spark.sql.catalyst.plans.logical.ResolvedHint => h
      }.size
    assert(hints(Dedup.decontaminate(corpus, "doc_id", "text",
      holdout, "text", 5)) == 1)
    assert(hints(Dedup.decontaminateJoin(corpus, "doc_id", "text",
      holdout, "text", 5)) == 0)
  }

  test("decontaminateBanded: verbatim leak dropped, clean doc kept") {
    val corpus = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"), // = holdout doc
      (2L, "completely unrelated words appear in this training row")
    ).toDF("doc_id", "text")
    val holdout = Seq(
      (10L, "the quick brown fox jumps over the lazy dog")
    ).toDF("doc_id", "text")
    val kept = Dedup.decontaminateBanded(corpus, "doc_id", "text",
      holdout, "doc_id", "text", minShared = 5)
      .select("doc_id").collect().map(_.getLong(0)).toSeq
    assert(kept == Seq(2L))
  }

  test("exactGroups: dup texts collapse, smallest id kept") {
    val g = Dedup.exactGroups(docs, "doc_id", "text")
    assert(g.count() == 4)
    val dup = g.filter($"cnt" === 2).head()
    assert(dup.getAs[Long]("keep_id") == 1L)
  }

  test("shingles: k-grams; short docs get empty set") {
    val sh = docs.select($"doc_id", Dedup.shingles($"text").as("sh"))
    val r1 = sh.filter($"doc_id" === 1).head().getSeq[String](1)
    assert(r1.head == "the quick brown" && r1.size == 7)
    assert(sh.filter($"doc_id" === 5).head().getSeq[String](1).isEmpty)
  }

  test("minhashCandidates: exact+near dups collide, distinct docs don't, short docs never join") {
    val pairs = Dedup.minhashCandidates(docs, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 3L)))            // identical → all bands match
    assert(pairs.contains((1L, 2L)) || pairs.contains((2L, 3L))) // near-dup likely
    assert(!pairs.exists(p => p._1 == 4L || p._2 == 4L))
    assert(!pairs.exists(p => p._1 == 5L || p._2 == 5L)) // null bands never join
  }

  test("ngramJaccardPairs df cap: ubiquitous grams stop generating pairs; survivors rescore over the filtered space") {
    import spark.implicits._
    // docs 1-3 share the same 3-shingle ("common common common ...");
    // 1 and 2 additionally share a rare tail
    val d = Seq(
      (1L, "common common common rare tail one"),
      (2L, "common common common rare tail two"),
      (3L, "common common common other words here")
    ).toDF("doc_id", "text")
    val uncapped = Dedup.ngramJaccardPairs(d, "doc_id", "text",
      lit("b"), threshold = 0.01)
      .select("a_id", "b_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(uncapped.contains((1L, 3L))) // via the shared common shingle
    // cap 2 drops every gram present in all three docs; only the
    // rare-tail evidence survives, so (1,3)/(2,3) disappear
    val capped = Dedup.ngramJaccardPairs(d, "doc_id", "text",
      lit("b"), threshold = 0.01, maxGramDf = Some(2))
      .select("a_id", "b_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(capped.contains((1L, 2L)))
    assert(!capped.contains((1L, 3L)) && !capped.contains((2L, 3L)))
  }

  test("minhashCandidates wide (16 hashes, 4x4 rows): exact dups still collide, selectivity only tightens") {
    val pairs = Dedup.minhashCandidates(docs, "doc_id", "text",
      numHashes = 16, bands = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 3L))) // identical text agrees on every minhash
    assert(!pairs.exists(p => p._1 == 4L || p._2 == 4L)) // distinct stays apart
    assert(!pairs.exists(p => p._1 == 5L || p._2 == 5L))
  }

  test("simhash: identical texts share signatures; signature is 16 bits") {
    val sigs = docs.select($"doc_id", Dedup.simhash($"text").as("sig"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(sigs(1L) == sigs(3L))
    assert(sigs.values.forall(s => s.length == 16 && s.forall("01".contains(_))))
    // near-dups are hamming-close (≤ 4 of 16 bits differ)
    val ham = sigs(1L).zip(sigs(2L)).count { case (a, b) => a != b }
    assert(ham <= 4)
  }

  test("simhashed keeps NULL-text rows with all-zero sig, matching the array-lambda form") {
    val withNull = Seq((1L, Option("the quick brown fox")), (2L, Option.empty[String]))
      .toDF("doc_id", "text")
    val staged = Dedup.simhashed(withNull, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val lambda = withNull.select($"doc_id", Dedup.simhash($"text").as("sig"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(staged.keySet == Set(1L, 2L)) // NULL row survives
    assert(staged(2L) == "0" * 16)
    assert(staged == lambda)
  }

  test("connectedComponents: chain closes transitively, min id labels, components stay apart") {
    // components: {1,2,3,4} (a chain — needs propagation), {10,11}, {20,21,22} (triangle)
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L),
      (20L, 21L), (21L, 22L), (20L, 22L)).toDF("a_id", "b_id")
    val cc = Dedup.connectedComponents(pairs, "a_id", "b_id")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(cc == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L, 20L -> 20L, 21L -> 20L, 22L -> 20L))
    // empty pair list → empty labeling
    assert(Dedup.connectedComponents(pairs.filter($"a_id" < 0), "a_id", "b_id").count() == 0)
  }

  test("connectedComponents: diameter > maxIter fails loudly, never returns non-minimal labels") {
    // a 12-node chain has diameter 11: 2 rounds (1 seeded + 1) cannot
    // close it — the operator must throw, not silently mislabel
    val chain = (0L until 11L).map(i => (i, i + 1)).toDF("a_id", "b_id")
    assertThrows[IllegalStateException] {
      Dedup.connectedComponents(chain, "a_id", "b_id", maxIter = 2)
    }
    // with enough rounds the same chain converges to the min label
    val ok = Dedup.connectedComponents(chain, "a_id", "b_id", maxIter = 15)
      .collect().map(r => r.getLong(1)).toSet
    assert(ok == Set(0L))
  }

  test("minhashCandidatesAgainst: batch probes corpus only — no batch×batch or corpus×corpus pairs") {
    val corpus = docs.filter($"doc_id" <= 2)  // ids 1, 2 (near-dups)
    val batch = docs.filter($"doc_id" >= 3)   // 3 = exact dup of 1; 4, 5 unrelated
    val pairs = Dedup.minhashCandidatesAgainst(batch, corpus, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((3L, 1L)))          // exact dup found across sets
    assert(pairs.forall { case (b, c) => b >= 3 && c <= 2 }) // strictly cross-set
    assert(!pairs.exists(p => p._1 == 5L))    // short doc never joins
  }

  test("simhashPairs: exact dups at hamming 0, near-dups close, distinct docs absent") {
    val pairs = Dedup.simhashPairs(docs, "doc_id", "text", maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(pairs((1L, 3L)) == 0L)            // identical texts → identical sigs
    assert(!pairs.keySet.exists(p => p._1 == 4L || p._2 == 4L)) // unrelated doc
    // blocking must be complete for the claimed radius
    assertThrows[IllegalArgumentException] {
      Dedup.simhashPairs(docs, "doc_id", "text", chunks = 4, maxHamming = 4)
    }
  }

  test("simhashPairs wide (128-bit/32-bit slices): exact dups at hamming 0; sig prefix agrees with 64-bit path") {
    val pairs = Dedup.simhashPairs(docs, "doc_id", "text",
      bits = 128, chunks = 4, maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(pairs((1L, 3L)) == 0L) // identical texts → identical 128-bit sigs
    assert(!pairs.keySet.exists(p => p._1 == 4L || p._2 == 4L))
    // signature definition is position-stable: the first 64 bits of a
    // 128-bit signature ARE the 64-bit signature (bits 32d..32d+31 from
    // the d-salted digest, independent of the requested width)
    val s64 = Dedup.simhashed(docs, "doc_id", "text", 64)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val s128 = Dedup.simhashed(docs, "doc_id", "text", 128)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(s128.values.forall(s => s.length == 128 && s.forall("01".contains(_))))
    assert(s64.keySet.forall(id => s128(id).take(64) == s64(id)))
  }

  test("nearDedupSurvivors: one doc per near-dup cluster, singletons pass, payload intact") {
    val out = Dedup.nearDedupSurvivors(docs, "doc_id", "text")
      .select("doc_id").as[Long].collect().toSet
    // 1,2,3 collide in LSH (exact + near dups) → only 1 survives;
    // 4 and 5 are singletons
    assert(out == Set(1L, 4L, 5L))
    assert(Dedup.nearDedupSurvivors(docs, "doc_id", "text").columns.toSeq ==
      Seq("doc_id", "text"))
  }

  test("keepBestPerCluster: highest score survives, ties to the smaller id, singletons pass") {
    val frame = Seq(
      (1L, 0.2), (2L, 0.9), (3L, 0.9), // cluster 1: 2 and 3 tie on score
      (7L, 0.1)                        // singleton (absent from clusters)
    ).toDF("doc_id", "sc")
    val clusters = Seq((1L, 1L), (2L, 1L), (3L, 1L)).toDF("id", "cluster")
    val out = Dedup.keepBestPerCluster(frame, "doc_id", clusters, $"sc",
      scoreOut = "q")
    val ids = out.select("doc_id").as[Long].collect().toSet
    assert(ids == Set(2L, 7L), s"survivor set drifted: $ids")
    assert(out.columns.toSeq == Seq("doc_id", "sc", "q"))
  }

  test("keepBestPerCluster: a label colliding with an absent doc's id cannot drop the singleton") {
    // arbitrary labeling (NOT min-member-id): label 7 names a cluster
    // whose members are 1..3, while doc 7 is absent from the labeling —
    // the namespaced window key keeps singleton 7 out of that cluster's
    // rank window, so it survives unconditionally
    val frame = Seq(
      (1L, 0.2), (2L, 0.9), (3L, 0.4),
      (7L, 0.1) // singleton whose id equals the cluster LABEL
    ).toDF("doc_id", "sc")
    val clusters = Seq((1L, 7L), (2L, 7L), (3L, 7L)).toDF("id", "cluster")
    val ids = Dedup.keepBestPerCluster(frame, "doc_id", clusters, $"sc")
      .select("doc_id").as[Long].collect().toSet
    assert(ids == Set(2L, 7L),
      s"label/id collision wrongly changed the survivor set: $ids")
  }

  test("semantic arrival face: stored-pairs ∪ batch-incident-pairs = full-corpus pairs") {
    // threshold 0.0: the decomposition property is threshold-independent
    // and the tiny spec corpus confirms few pairs at 0.3
    import graft.operators.Similarity
    val e = graft.Tables.embeddings(spark, sf).filter($"vec_id" < 300)
    val stored = e.filter($"vec_id" % 40 =!= 23)
    val batch = e.filter($"vec_id" % 40 === 23)
    val cb = Similarity.pqCodebookSeed(e, "vec_id", "embedding",
      m = 8, ksub = 16, subDim = 8)
    def keys(df: org.apache.spark.sql.DataFrame) =
      df.select("a_id", "b_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val full = keys(Similarity.semanticPqPairs(e, cb, "vec_id",
      "embedding", threshold = 0.0, prefix = 2))
    val pre = keys(Similarity.semanticPqPairs(stored, cb, "vec_id",
      "embedding", threshold = 0.0, prefix = 2))
    val sIdx = Similarity.semanticBlockIndex(stored, cb, "vec_id", "embedding")
    val bIdx = Similarity.semanticBlockIndex(batch, cb, "vec_id", "embedding")
    val incident = keys(Similarity.semanticPqPairsAgainst(bIdx, sIdx, e,
        "vec_id", "embedding", threshold = 0.0)) ++
      keys(Similarity.semanticPqPairs(batch, cb, "vec_id", "embedding",
        threshold = 0.0, prefix = 2))
    assert(pre.union(incident) == full,
      s"pair decomposition leaked: missing=${full.diff(pre ++ incident)} " +
        s"extra=${(pre ++ incident).diff(full)}")
    assert(incident.nonEmpty, "fixture has no batch-incident pairs — weak test")
  }

  test("dedupIncremental: within-batch winner survives only if unseen in the ledger") {
    val batch = Seq(
      (10L, "seen before"),   // in ledger → dropped
      (11L, "fresh text"),    // survives
      (12L, "fresh text"),    // within-batch dup of 11 → dropped
      (13L, "also new")       // survives
    ).toDF("doc_id", "text")
    val ledger = Seq("seen before").toDF("t").select(md5($"t").as("h"))
    val out = Dedup.dedupIncremental(batch, "doc_id", "text", ledger, "h")
      .select("doc_id").as[Long].collect().toSet
    assert(out == Set(11L, 13L))
    // empty ledger → plain within-batch dedup
    assert(Dedup.dedupIncremental(batch, "doc_id", "text",
      ledger.filter($"h" === ""), "h").count() == 3)
  }

  test("decontaminate: drops only docs sharing >= minShared shingles with the holdout") {
    val corpus = Seq(
      (1L, "the quick brown fox jumps over the lazy dog today"), // heavy overlap
      (2L, "completely different words appear here today again"),
      (3L, "the quick brown cat sat still")                      // 1 shared shingle
    ).toDF("doc_id", "text")
    val holdout = Seq(
      (100L, "the quick brown fox jumps over the lazy dog")
    ).toDF("doc_id", "text")
    val k3 = Dedup.decontaminate(corpus, "doc_id", "text", holdout, "text", minShared = 3)
      .select("doc_id").as[Long].collect().toSet
    assert(k3 == Set(2L, 3L)) // doc 1 leaks 7 shingles; doc 3 only 1
    val k1 = Dedup.decontaminate(corpus, "doc_id", "text", holdout, "text", minShared = 1)
      .select("doc_id").as[Long].collect().toSet
    assert(k1 == Set(2L))
    // empty holdout keeps everything
    val all = Dedup.decontaminate(corpus, "doc_id", "text",
      holdout.filter($"doc_id" < 0), "text", minShared = 1)
    assert(all.count() == 3)
  }

  test("ngramJaccardPairs: exact dup scores 1.0; blocking prevents cross-block pairs") {
    val blocked = Dedup.ngramJaccardPairs(docs, "doc_id", "text",
      blockKey = when($"doc_id" <= 3, "a").otherwise("b"), threshold = 0.01)
    val m = blocked.collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(m((1L, 3L)) == 1.0)
    assert(m((1L, 2L)) > 0.5 && m((1L, 2L)) < 1.0)
    assert(!m.keySet.exists(p => p._1 <= 3 && p._2 > 3))
  }
}
