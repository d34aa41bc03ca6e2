package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.operators.{Manifest, TxGraphStack, TxSemanticStack,
  TxServeStack, TxVectorStack, Vocab}

/** Round-16 additions: the last two streaming families (kNN graph,
  * semantic labels) brought under the [[Manifest]] commit protocol get
  * their snapshot-read and vacuum faces; the search page gets a JOINT
  * (lexical, vector) version pin; and the mid-path BPE trainer gets
  * the tail-OOV guard its closure pass prescribed.
  *
  * Reference (jurimetria-etl) has no index/streaming surface; these
  * are the LLM-training-data extensions (brief §"Beyond the
  * reference").
  */
object Registry18 {

  private def docs(s: SparkSession, d: String) = Tables.documents(s, d)
  private def emb(s: SparkSession, d: String) = Tables.embeddings(s, d)

  // -------------------------------------------- graph stack faces

  /** SNAPSHOT read on the graph stack ([[Manifest.readAt]] through
    * [[TxGraphStack.resolve]]): both pages drain (commit versions
    * 1, 2 over the init at 0), but a reader pinned to version 1 serves
    * the graph EXACTLY as of the first page's commit — the second
    * append's insertions, bidirectional back-edges, and degree recaps
    * are all invisible. The oracle replays the 200-node build plus
    * ONLY the first unrolled append journey; any leak of
    * post-snapshot state (one recapped edge list, one new node) flips
    * the hash. The BM25/vector twins are `streaming_stats_snapshot` /
    * `ann_index_snapshot`. */
  val annGraphSnapshot = Q("ann_graph_snapshot",
    s"""WITH ${Registry12.sqlKnnGraph},
       |allv AS (SELECT vec_id, embedding FROM embeddings),
       |${Registry13.sqlGraphAppendReplay(1, "g", "g1", 200, 205)}
       |SELECT src_id, nbr_id, cos FROM g1
       |ORDER BY src_id, nbr_id""".stripMargin) { (s, d) =>
    TxGraphStack
      .resolve(s, Registry13.drainGraphStack(s, d, "graft_gsnap"),
        version = Some(1L))
      .select("src_id", "nbr_id", "cos")
      .orderBy("src_id", "nbr_id")
  }

  /** GARBAGE COLLECTION on the graph stack ([[TxGraphStack.vacuum]]):
    * each commit strands the touched buckets' previous versions, and a
    * crashed batch (asset writes landed, swap skipped — simulated with
    * `publish = false`) strands a whole orphan version. The gate
    * drains, orphans one batch, vacuums with retention 0, and REQUIRES
    * garbage was reclaimed with the committed pointer undisturbed; the
    * output is the post-vacuum serve vs the full two-append oracle —
    * a vacuum that deleted one live pinned bucket flips the hash. */
  val annGraphVacuum = Q("ann_graph_vacuum",
    s"""WITH ${Registry12.sqlKnnGraph},
       |allv AS (SELECT vec_id, embedding FROM embeddings),
       |${Registry13.sqlGraphAppendReplay(1, "g", "g1", 200, 205)},
       |${Registry13.sqlGraphAppendReplay(2, "g1", "g2", 205, 210)}
       |SELECT src_id, nbr_id, cos FROM g2
       |ORDER BY src_id, nbr_id""".stripMargin) { (s, d) =>
    val root = Registry13.drainGraphStack(s, d, "graft_gvac")
    val fx0 = Registry13.gingestFixture(s, d)
    val corpus = s.read.parquet(fx0.resolve("corpus").toString)
    // a crashed batch: the touched buckets' replacement content lands
    // at an unpinned version, the swap never runs
    TxGraphStack.commitBatch(s, root, corpus,
      emb(s, d).filter(col("vec_id") >= 210 && col("vec_id") < 215),
      99L, "vec_id", "embedding", k = 3, buckets = 16,
      beam = 4, hops = 3, maxDegree = 4, corpusBuckets = Some(16),
      publish = false)
    val vs = TxGraphStack.vacuum(s, root, retainVersions = 0)
    require(vs.deletedDirs > 0,
      "superseded bucket versions + the orphan must be reclaimed")
    require(Manifest.read(s, root).get.batchId == 1L,
      "vacuum must not disturb the committed pointer")
    TxGraphStack.resolve(s, root)
      .select("src_id", "nbr_id", "cos")
      .orderBy("src_id", "nbr_id")
  }

  // -------------------------------------------- semantic stack faces

  /** SNAPSHOT read on the semantic stack: the full drain commits both
    * pages, but a reader pinned to version 1 serves the label ledger
    * EXACTLY as of the first page's commit — ids 205..209 absent,
    * every component merge the second page caused undone. The oracle
    * is the full-corpus CC truth over arrivals < 205 (incremental ≡
    * batch-global CC at any cut — the `dedup_semantic_incremental`
    * identity is what makes a bounded oracle exist at all). */
  val dedupSemanticSnapshot = Q("dedup_semantic_snapshot",
    Registry15.sqlSemanticIngestOracle(205)) { (s, d) =>
    TxSemanticStack
      .resolveLabels(s,
        Registry15.drainSemanticStack(s, d, "graft_semsnap"),
        version = Some(1L))
      .select(col("id").as("vec_id"), col("cluster").as("cluster_id"))
      .orderBy("vec_id")
  }

  /** GARBAGE COLLECTION on the semantic stack
    * ([[TxSemanticStack.vacuum]]): label merges strand superseded
    * bucket versions on BOTH keyed views, and a crashed batch strands
    * orphans across all three asset families. Drain, orphan one batch
    * (`publish = false` under the same frozen codebook), vacuum with
    * retention 0, REQUIRE reclaim + an undisturbed pointer, then serve
    * — and assert the dual-keyed views still agree, since a vacuum
    * that swept a live pinned bucket on one view would desynchronize
    * them before it flipped the oracle hash. */
  val dedupSemanticVacuum = Q("dedup_semantic_vacuum",
    Registry15.sqlSemanticIngestOracle(210)) { (s, d) =>
    import graft.operators.Similarity
    val root = Registry15.drainSemanticStack(s, d, "graft_semvac")
    val e = emb(s, d)
    val cb = Similarity.pqCodebookSeed(e.filter(col("vec_id") < 200),
      "vec_id", "embedding", m = 8, ksub = 16, subDim = 8)
    TxSemanticStack.commitBatch(s, root,
      e.filter(col("vec_id") >= 210 && col("vec_id") < 215), 99L,
      cb, e, "vec_id", "embedding", threshold = 0.3, prefix = 2,
      buckets = 16, publish = false)
    val vs = TxSemanticStack.vacuum(s, root, retainVersions = 0)
    require(vs.deletedDirs > 0,
      "superseded label-bucket versions + the orphan must be reclaimed")
    require(Manifest.read(s, root).get.batchId == 1L,
      "vacuum must not disturb the committed pointer")
    val byId = TxSemanticStack.resolveLabels(s, root)
    val byCl = TxSemanticStack.resolveLabelsByCluster(s, root)
    require(byId.exceptAll(byCl).isEmpty && byCl.exceptAll(byId).isEmpty,
      "dedup_semantic_vacuum: dual-keyed label ledgers drifted")
    byId.select(col("id").as("vec_id"), col("cluster").as("cluster_id"))
      .orderBy("vec_id")
  }

  /** TRANSACTIONAL TAKEDOWN on the semantic stack
    * ([[TxSemanticStack.commitRemove]]): vectors ≡ 23 (mod 50) among
    * the arrivals retire in ONE commit — an ordered tombstone kills
    * their block-index rows at read, the touched components' surviving
    * members re-pair via the stored index + exact-cosine confirm and
    * re-propagate (removal can SPLIT a component — no label mapping
    * expresses it), and BOTH keyed label views land their touched
    * buckets at a fresh version under the one swap. The oracle is the
    * from-scratch CC truth over the survivors under the same frozen
    * codebook — deletion maintenance must be indistinguishable from
    * never having ingested the removed vectors (the in-flow
    * `dedup_semantic_remove` contract, now crash-safe). */
  val dedupSemanticTxRemove = Q("dedup_semantic_tx_remove",
    Registry15.sqlSemanticIngestOracle(210, "vec_id % 50 <> 23")) { (s, d) =>
    import graft.operators.Similarity
    val root = Registry15.drainSemanticStack(s, d, "graft_semtxrm")
    val e = emb(s, d)
    require(TxSemanticStack.commitRemove(s, root,
      e.filter(col("vec_id") < 210 && col("vec_id") % 50 === 23)
        .select("vec_id"),
      batchId = 4L, e, "vec_id", "embedding", threshold = 0.3,
      buckets = 16),
      "the takedown batch must commit on the drained stack")
    val byId = TxSemanticStack.resolveLabels(s, root)
    val byCl = TxSemanticStack.resolveLabelsByCluster(s, root)
    require(byId.exceptAll(byCl).isEmpty && byCl.exceptAll(byId).isEmpty,
      "dedup_semantic_tx_remove: dual-keyed label ledgers drifted")
    byId.select(col("id").as("vec_id"), col("cluster").as("cluster_id"))
      .orderBy("vec_id")
  }

  /** TRANSACTIONAL TAKEDOWN on the graph stack
    * ([[TxGraphStack.commitRemove]] — node tombstones, the soft-delete
    * law with a graph's twist): removing nodes 10..29 writes (id,
    * asof) rows into their tombstone buckets and ZERO edge rows —
    * every edge touching them (including stale in-edges scattered
    * across buckets no prune could cheaply rewrite) dies at read under
    * the ordered two-endpoint rule. The serve is the full drained
    * graph (two appended pages) minus everything incident to the
    * removed set; the oracle filters the two-append replay the same
    * way. */
  val annGraphTxRemove = Q("ann_graph_tx_remove",
    s"""WITH ${Registry12.sqlKnnGraph},
       |allv AS (SELECT vec_id, embedding FROM embeddings),
       |${Registry13.sqlGraphAppendReplay(1, "g", "g1", 200, 205)},
       |${Registry13.sqlGraphAppendReplay(2, "g1", "g2", 205, 210)}
       |SELECT src_id, nbr_id, cos FROM g2
       |WHERE src_id NOT BETWEEN 10 AND 29
       |  AND nbr_id NOT BETWEEN 10 AND 29
       |ORDER BY src_id, nbr_id""".stripMargin) { (s, d) =>
    val root = Registry13.drainGraphStack(s, d, "graft_gtxrm")
    require(TxGraphStack.commitRemove(s, root,
      emb(s, d).filter(col("vec_id") >= 10 && col("vec_id") < 30)
        .select("vec_id"),
      batchId = 4L, "vec_id", buckets = 16),
      "the takedown batch must commit on the drained stack")
    TxGraphStack.resolve(s, root)
      .select("src_id", "nbr_id", "cos")
      .orderBy("src_id", "nbr_id")
  }

  /** TRANSACTIONAL REPAIR on the graph stack
    * ([[TxGraphStack.commitRemove]] ∘ [[TxGraphStack.commitRepair]]):
    * on the 200-node base stack, nodes 10..29 tombstone (batch 0),
    * then the repair (batch 1) elects the orphaned neighborhood from
    * the RAW rows' dead edges, beam-searches each orphan's 3 nearest
    * over the LIVE graph, and writes the touched sources' recapped
    * lists as their buckets' replacement — two commits whose composed
    * serve must equal the in-flow remove-then-repair bit-for-bit: the
    * oracle is `ann_graph_repair`'s full replay VERBATIM. */
  val annGraphTxRepair = Q("ann_graph_tx_repair",
    Registry13.sqlGraphRepairOracle) { (s, d) =>
    import graft.operators.Similarity
    val e = emb(s, d).filter(col("vec_id") < 200)
    val cent = e.filter(col("vec_id") === 0)
      .select(lit(0).cast("int").as("cell"), col("embedding").as("c_vec"))
    val g = Similarity.knnGraph(e, cent, "vec_id", "embedding", k = 3)
      .select("src_id", "nbr_id", "cos")
    val stage = StreamHarness.runDir("graft_gtxrp")
    val root = stage.resolve("stack").toString
    TxGraphStack.init(s, root, g, buckets = 16)
    val rm = e.filter(col("vec_id") >= 10 && col("vec_id") < 30)
      .select("vec_id")
    require(TxGraphStack.commitRemove(s, root, rm, 0L, "vec_id",
      buckets = 16), "the takedown must commit")
    require(TxGraphStack.commitRepair(s, root, emb(s, d), 1L,
      "vec_id", "embedding", k = 3, buckets = 16, beam = 4, hops = 3,
      maxDegree = 4), "the repair must commit")
    TxGraphStack.resolve(s, root)
      .select("src_id", "nbr_id", "cos")
      .orderBy("src_id", "nbr_id")
  }

  /** Graph COMPACTION under the protocol ([[TxGraphStack.compactEdges]]
    * — the physical purge the soft deletes defer to): after the
    * takedown, compaction consolidates the LIVE rows into fresh
    * one-file bucket versions and RETIRES the tombstone family in the
    * same swap. The serve must be bit-identical to the pre-compaction
    * tombstoned serve (`ann_graph_tx_remove`'s oracle), the tombstone
    * pin map must be empty, and vacuum must reclaim the superseded
    * versions — all REQUIREd in-gate. */
  val annGraphTxCompact = Q("ann_graph_tx_compact",
    s"""WITH ${Registry12.sqlKnnGraph},
       |allv AS (SELECT vec_id, embedding FROM embeddings),
       |${Registry13.sqlGraphAppendReplay(1, "g", "g1", 200, 205)},
       |${Registry13.sqlGraphAppendReplay(2, "g1", "g2", 205, 210)}
       |SELECT src_id, nbr_id, cos FROM g2
       |WHERE src_id NOT BETWEEN 10 AND 29
       |  AND nbr_id NOT BETWEEN 10 AND 29
       |ORDER BY src_id, nbr_id""".stripMargin) { (s, d) =>
    val root = Registry13.drainGraphStack(s, d, "graft_gtxcp")
    require(TxGraphStack.commitRemove(s, root,
      emb(s, d).filter(col("vec_id") >= 10 && col("vec_id") < 30)
        .select("vec_id"),
      batchId = 4L, "vec_id", buckets = 16),
      "the takedown batch must commit on the drained stack")
    require(TxGraphStack.compactEdges(s, root),
      "compaction must run on the tombstoned stack")
    require(Manifest.read(s, root).get.auxV.isEmpty,
      "compaction must retire the whole tombstone family")
    val vs = TxGraphStack.vacuum(s, root, retainVersions = 0)
    require(vs.deletedDirs > 0,
      "compaction strands superseded versions; vacuum must reclaim them")
    TxGraphStack.resolve(s, root)
      .select("src_id", "nbr_id", "cos")
      .orderBy("src_id", "nbr_id")
  }

  /** Transactional RE-BUCKET mid-life ([[TxGraphStack.rebucket]] —
    * the migration the gsink sizing rule "B ∝ corpus" prescribes,
    * executable as one commit): the drained B=16 stack re-buckets to
    * B′=64 (one swap moves the whole pin map to the new keyspace — a
    * reader can never observe the numberings interleaved), and a
    * THIRD append batch then commits under B′. The oracle replays all
    * three appends — the re-bucket must be invisible to every
    * consumer and the post-migration append bit-exact. In-gate
    * REQUIREs pin the migration actually happened (a pin above the
    * old keyspace exists; the old version dirs are unpinned). */
  val annGraphTxRebucket = Q("ann_graph_tx_rebucket",
    // the intermediate graphs + the corpus MATERIALIZE: a third
    // unrolled append would otherwise re-scan embeddings.parquet once
    // per CTE reference and blow DuckDB past the fd limit
    s"""WITH ${Registry12.sqlKnnGraph},
       |gm AS MATERIALIZED (SELECT * FROM g),
       |allv AS MATERIALIZED (SELECT vec_id, embedding FROM embeddings),
       |${Registry13.sqlGraphAppendReplay(1, "gm", "g1", 200, 205)},
       |g1m AS MATERIALIZED (SELECT * FROM g1),
       |${Registry13.sqlGraphAppendReplay(2, "g1m", "g2", 205, 210)},
       |g2m AS MATERIALIZED (SELECT * FROM g2),
       |${Registry13.sqlGraphAppendReplay(3, "g2m", "g3", 210, 215)}
       |SELECT src_id, nbr_id, cos FROM g3
       |ORDER BY src_id, nbr_id""".stripMargin) { (s, d) =>
    val root = Registry13.drainGraphStack(s, d, "graft_gtxrb")
    require(TxGraphStack.rebucket(s, root, newBuckets = 64),
      "the drained stack must re-bucket")
    val pins = Manifest.read(s, root).get.statsV
    require(pins.keys.exists(_ >= 16),
      s"B'=64 pins must use the new keyspace, got ${pins.keys.toSeq.sorted}")
    val fx0 = Registry13.gingestFixture(s, d)
    val corpus = s.read.parquet(fx0.resolve("corpus").toString)
    require(TxGraphStack.commitBatch(s, root, corpus,
      emb(s, d).filter(col("vec_id") >= 210 && col("vec_id") < 215),
      2L, "vec_id", "embedding", k = 3, buckets = 64,
      beam = 4, hops = 3, maxDegree = 4, corpusBuckets = Some(16)),
      "the post-migration append must commit under B'")
    TxGraphStack.resolve(s, root)
      .select("src_id", "nbr_id", "cos")
      .orderBy("src_id", "nbr_id")
  }

  // -------------------------------------------- joint page snapshot

  /** The search page's JOINT snapshot ([[Manifest.pinPage]]): a page
    * pins (lexical version, vector version) ONCE at open, then both
    * stacks move on — a document upsert re-scores the lexical side, a
    * vector upsert re-embeds the dense side — and every leg of the
    * pinned page still serves the pre-upsert cut of BOTH stacks. This
    * is the repeatable-read face the per-stack snapshots
    * (`streaming_stats_snapshot`, `ann_index_snapshot`) compose into:
    * without the pin, pagination after a mid-page commit fuses
    * lexical-at-T2 against vector-at-T1 and the ranks drift
    * mid-scroll. The oracle is `hybrid_manifest_topk`'s raw-corpus
    * algebra VERBATIM (the pre-upsert corpus), so any leak of either
    * upsert through the pinned pair flips the fused ranking. */
  val hybridSnapshotTopK = Q("hybrid_snapshot_topk",
    Registry17.sqlHybridOracle) { (s, d) =>
    val lexRoot = Registry16.drainTxStack(s, d, "graft_hysnlex")
    val vecRoot = Registry17.drainVectorStack(s, d, "graft_hysnvec")
    val pin = Manifest.pinPage(s, lexRoot, vecRoot)
    // both heads move AFTER the pin; the two upserts hit INDEPENDENT
    // stacks (separate roots, manifests, locks) — overlap them
    // (guide §2.6), the pinned-snapshot serve below is unaffected
    val up = docs(s, d).filter(col("doc_id") % 10 === 5)
      .select(col("doc_id"),
        concat(col("text"), lit(" updated")).as("text"))
    val rot = emb(s, d).filter(col("vec_id") % 10 === 5)
      .select(col("vec_id"), concat(slice(col("embedding"), 33, 32),
        slice(col("embedding"), 1, 32)).as("embedding"))
    val (upOk, rotOk) = graft.operators.Par.both(
      TxServeStack.commitUpsert(s, lexRoot, up, 4L,
        "doc_id", "text", docBuckets = 16, termBuckets = 16),
      TxVectorStack.commitUpsert(s, vecRoot, rot, 4L,
        "vec_id", "embedding", buckets = 16))
    require(upOk,
      "the lexical upsert must commit so the head moves past the pin")
    require(rotOk,
      "the vector upsert must commit so the head moves past the pin")
    Registry17.hybridManifestServe(s, d, lexRoot, vecRoot,
      lexVersion = Some(pin.lexVersion),
      vecVersion = Some(pin.vecVersion))
  }

  // -------------------------------------------- BPE tail-OOV guard

  /** The mid-path BPE trainer's TAIL-OOV guard under the gate
    * ([[Vocab.bpeTrainHeadGuarded]]): the corpus is perturbed so its
    * TAIL contains a character the head's alphabet lacks (doc 0 gains
    * one freq-1 word carrying '§' — ranked dead last by
    * (freq DESC, w ASC), so the 300-char head cut excludes it), the
    * exact case head-training cannot close: an OOV character can never
    * appear inside any learned merge. The guard measures the closure
    * pass, detects oov_chars > 0 (REQUIREd in-gate — a fixture drift
    * that closed the alphabet would silently gate nothing), REFUSES
    * the head cut, and falls back to the full election. The oracle is
    * the full-corpus 8-merge replay over the perturbed corpus — had
    * the guard taken the head path anyway, every merge's cnt (and
    * possibly its election) would carry only head votes and the hash
    * flips. */
  val textBpeOovGuard = Q("text_bpe_oov_guard",
    s"""WITH ${Registry13.sqlBpeChainShared(8,
         """(SELECT CASE WHEN doc_id = 0 THEN text || ' §q§q'
           |  ELSE text END AS text FROM documents) AS src""".stripMargin)}
       |SELECT step, l AS lhs, r AS rhs, cnt
       |FROM (${(1 to 8).map(i => s"SELECT * FROM b$i").mkString(" UNION ALL ")})
       |ORDER BY step""".stripMargin) { (s, d) =>
    val mod = docs(s, d).withColumn("text",
      when(col("doc_id") === 0, concat(col("text"), lit(" §q§q")))
        .otherwise(col("text")))
    val cl = Vocab.bpeHeadClosure(mod, "text", headChars = 300).head()
    require(cl.getLong(cl.fieldIndex("oov_chars")) > 0,
      "the fixture must leave an OOV char in the tail — the guarded " +
        "path has nothing to refuse otherwise")
    Vocab.bpeTrainHeadGuarded(mod, "text", merges = 8, headChars = 300,
        closure = Some(cl))
      .orderBy("step")
  }

  val round18: Seq[Q] = Seq(annGraphSnapshot, annGraphVacuum,
    dedupSemanticSnapshot, dedupSemanticVacuum, hybridSnapshotTopK,
    textBpeOovGuard, dedupSemanticTxRemove, annGraphTxRemove,
    annGraphTxRepair, annGraphTxCompact, annGraphTxRebucket)
}
