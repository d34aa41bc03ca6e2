package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.operators.{Dedup, Manifest, Sampling, TxSketchStack, TxSplitStack}

/** Round-17 wave: the cross-process commit fence exercised end-to-end,
  * sketch-stack reconfiguration (lgK resize), the split ledger's
  * streaming face, incremental merge-conflict quarantine, and the
  * curation composition that chains dedup → sticky split → profile.
  *
  * Reference (jurimetria-etl) has none of these surfaces; they are
  * LLM-training-data extensions (brief §"Beyond the reference").
  */
object Registry20 {

  private def docs(s: SparkSession, d: String) = Tables.documents(s, d)

  private val splits3 = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)

  /** CROSS-PROCESS WRITER FENCE ([[Manifest.commit]]'s create-exclusive
    * history-file CAS) driven through a public stack: after the 4-page
    * sketch drain, a FOREIGN committer (a second process — simulated by
    * writing its `manifest.v=N` history file directly, the atomic step
    * it would win) owns the next version with its pointer swap never
    * landing. Our commit from the same cut must LOSE the CAS (the
    * in-process version check cannot see the foreign file — the pointer
    * never moved), ROLL the winner's pointer forward (un-wedging the
    * stack), and surface [[Manifest.CommitConflict]]; the clean retry
    * re-derives from the advanced head, where the batch id is now below
    * the high-water mark and absorbs. The serve afterwards must be
    * exactly the drained profile — the oracle's full-corpus exact
    * counts through the ±5% witness prove no batch was lost or doubled
    * in the scuffle. */
  val manifestFenceRace = Q("manifest_fence_race",
    """SELECT event_type AS key, CAST(COUNT(*) AS BIGINT) AS n_rows,
      |  CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_users,
      |  TRUE AS est_ok
      |FROM events GROUP BY 1 ORDER BY key""".stripMargin) { (s, d) =>
    val root = Registry19.drainSketchStack(s, d, "graft_fence")
    val st = Manifest.read(s, root).get
    // the foreign winner: derived from the same cut, published its
    // history file (same pins — a no-op maintenance commit), crashed
    // before its pointer swap
    val foreign = st.copy(version = st.version + 1,
      batchId = st.batchId + 100)
    java.nio.file.Files.write(
      java.nio.file.Paths.get(root, s"manifest.v=${foreign.version}"),
      foreign.render.getBytes("UTF-8"))
    val conflicted =
      try {
        TxSketchStack.commitBatch(s, root,
          Tables.events(s, d).limit(10), st.batchId + 1,
          "event_type", "user_id", buckets = 8)
        false
      } catch { case _: Manifest.CommitConflict => true }
    require(conflicted, "a commit racing a foreign history file must " +
      "lose the create-exclusive CAS")
    require(Manifest.read(s, root).contains(foreign),
      "the loser must roll the crashed winner's pointer forward")
    // clean retry from the advanced head: the batch id is below the
    // foreign high-water mark — absorbed, exactly-once holds
    require(!TxSketchStack.commitBatch(s, root,
      Tables.events(s, d).limit(10), st.batchId + 1,
      "event_type", "user_id", buckets = 8),
      "the retry must absorb below the advanced high-water mark")
    Registry19.sketchWitness(s, d, TxSketchStack.resolve(s, root))
  }

  /** SKETCH-STACK RECONFIGURATION
    * ([[graft.operators.TxSketchStack.commitResize]]): change a live
    * stack's accuracy budget. Sketches are NOT mergeable across
    * register widths — `hll_union` refuses, the loud-failure contract
    * — so the migration re-aggregates the whole profile from the raw
    * slice under lgK 12 → 14 (and theta 4096 → 8192 samples) and swaps
    * once, `ann_index_reencode`'s pattern. The post-resize serve must
    * match the oracle's exact profile through the witness (a lost key
    * or a double-counted tally moves `n_rows` exactly), and the
    * PRE-resize cut must stay reconstructible via [[Manifest.readAt]]
    * — an old eval's profile survives the reconfiguration until
    * vacuumed. */
  val sketchResizeServe = Q("sketch_resize_serve",
    """SELECT event_type AS key, CAST(COUNT(*) AS BIGINT) AS n_rows,
      |  CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_users,
      |  TRUE AS est_ok
      |FROM events GROUP BY 1 ORDER BY key""".stripMargin) { (s, d) =>
    val root = Registry19.drainSketchStack(s, d, "graft_skresz")
    val pre = Manifest.read(s, root).get
    require(TxSketchStack.commitResize(s, root, Tables.events(s, d),
      4L, "event_type", "user_id", buckets = 8, lgK = 14,
      thetaLgNom = 13), "the resize migration must commit")
    // time travel across the reconfiguration: the lgK=12 cut still
    // serves (its rows carry their own registers — cuts never mix)
    val old = TxSketchStack.estimates(
      TxSketchStack.resolve(s, root, version = Some(pre.version)))
    require(old.count() > 0, "the pre-resize snapshot must serve")
    Registry19.sketchWitness(s, d, TxSketchStack.resolve(s, root))
  }

  // ---------------------------------------- split ledger streaming face

  /** Four document pages in arrival order: the seed page (odd doc_ids),
    * then the even doc_ids in three deterministic slices (d mod 6 = 0,
    * 2, 4) — non-contiguous by design, so inheritance is OBSERVABLE:
    * an even arrival's 8-block always has its odd members already
    * stored, and the minimum stored member (block base + 1) drew its
    * own ladder — a different hash than the block label's. */
  private[queries] def splitPagesFixture(s: SparkSession, d: String): java.nio.file.Path =
    FixtureCache.cached(d, "sppages", 1, Seq("documents")) { tmp =>
      val pages = tmp.resolve("pages")
      java.nio.file.Files.createDirectories(pages)
      val ids = docs(s, d).select("doc_id")
      val base = System.currentTimeMillis() - 3600L * 1000
      val preds = Seq(
        col("doc_id") % 2 === 1,
        col("doc_id") % 2 === 0 && col("doc_id") % 6 === 0,
        col("doc_id") % 2 === 0 && col("doc_id") % 6 === 2,
        col("doc_id") % 2 === 0 && col("doc_id") % 6 === 4)
      preds.zipWithIndex.foreach { case (p, i) =>
        val tmpd = tmp.resolve(s"tmp$i")
        ids.filter(p).repartition(1)
          .write.mode("overwrite").parquet(tmpd.toString)
        val part = tmpd.toFile.listFiles().toSeq
          .filter(_.getName.endsWith(".parquet")).minBy(_.getName)
        val dest = pages.resolve(s"page$i.parquet")
        java.nio.file.Files.move(part.toPath, dest)
        java.nio.file.Files.setLastModifiedTime(dest,
          java.nio.file.attribute.FileTime.fromMillis(base + i * 60000L))
        FixtureCache.deleteRecursively(tmpd)
      }
    }

  /** Drain the pages into a split ledger: one
    * [[TxSplitStack.commitAssign]] per micro-batch, exactly-once by the
    * foreachBatch id. The seed page assigns under SINGLETON labels
    * (every odd doc its own draw); later pages assign under 8-BLOCK
    * labels, so each even arrival joins a cluster whose stored minimum
    * member is the block's first odd doc — the inheritance path runs on
    * every arrival. Deterministic (same pages → same 4 commits), staged
    * once per (dataset, builder version). */
  private[queries] def drainSplitStream(s: SparkSession, d: String,
                                        tag: String): String = {
    val fx = FixtureCache.cached(d, "spstream", 1, Seq("documents")) { tmp =>
      val root = tmp.resolve("ledger").toString
      TxSplitStack.init(s, root)
      val corpus = docs(s, d)
      val singles = corpus.select(col("doc_id").as("id"),
        col("doc_id").as("cluster"))
      val blocks = corpus.select(col("doc_id").as("id"),
        (col("doc_id") - col("doc_id") % 8).as("cluster"))
      val stream = s.readStream.schema("doc_id LONG")
        .option("maxFilesPerTrigger", "1")
        .parquet(splitPagesFixture(s, d).resolve("pages").toString)
      val run = stream.writeStream
        .foreachBatch { (b: DataFrame, id: Long) =>
          TxSplitStack.commitAssign(s, root, b,
            if (id == 0L) singles else blocks, id, "doc_id", splits3,
            buckets = 8)
          ()
        }
        .option("checkpointLocation", tmp.resolve("ckpt").toString)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      run.awaitTermination()
      FixtureCache.deleteRecursively(tmp.resolve("ckpt"))
    }
    val stage = StreamHarness.runDir(tag)
    FixtureCache.copyInto(fx.resolve("ledger"), stage.resolve("ledger"))
    stage.resolve("ledger").toString
  }

  /** STREAMING split assignment — the split ledger's streaming face
    * (every other ledger family already drains through the harness):
    * arrivals spread over 4 micro-batches, each one fenced
    * [[TxSplitStack.commitAssign]] commit, exactly-once by batch id
    * (a replayed page absorbs whole — REQUIREd in-gate). The oracle
    * replays both rules without a closure: odd docs (the seed page)
    * drew their own ladder; every even doc inherited the stored
    * minimum member of its 8-block — the block's first odd doc, whose
    * split is ladder(block + 1), NOT the ladder of the block label an
    * inheritance-less engine would draw. A missed inheritance, a
    * wrong min election, or a stored row moving across batches all
    * shift the per-split tallies. */
  val streamingSplitAssign = Q("streaming_split_assign",
    s"""WITH a AS (SELECT doc_id,
       |  CASE WHEN doc_id % 2 = 1 THEN ${Registry19.sqlLadder("doc_id")}
       |  ELSE ${Registry19.sqlLadder("doc_id - doc_id % 8 + 1")}
       |  END AS split
       |  FROM documents)
       |SELECT split, CAST(COUNT(*) AS BIGINT) AS n_docs,
       |  CAST(SUM(CASE WHEN doc_id % 2 = 1 THEN 1 ELSE 0 END) AS BIGINT)
       |    AS n_seed,
       |  CAST(SUM(CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT)
       |    AS n_arrivals
       |FROM a GROUP BY split ORDER BY split""".stripMargin) { (s, d) =>
    val root = drainSplitStream(s, d, "graft_spstream")
    // exactly-once: a re-delivered page (same batch id) absorbs whole
    val blocks = docs(s, d).select(col("doc_id").as("id"),
      (col("doc_id") - col("doc_id") % 8).as("cluster"))
    require(!TxSplitStack.commitAssign(s, root,
      docs(s, d).filter(col("doc_id") % 2 === 0 && col("doc_id") % 6 === 4),
      blocks, 3L, "doc_id", splits3, buckets = 8),
      "a replayed micro-batch must be absorbed by the high-water mark")
    TxSplitStack.resolve(s, root)
      .groupBy("split")
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("doc_id") % 2 === 1, 1L).otherwise(0L)).as("n_seed"),
        sum(when(col("doc_id") % 2 === 0, 1L).otherwise(0L))
          .as("n_arrivals"))
      .orderBy("split")
  }

  /** INCREMENTAL merge-conflict quarantine
    * ([[TxSplitStack.quarantineIncremental]]): conflicts are only ever
    * CREATED by a commit (an arrival's labels bridging
    * differently-assigned clusters), so [[TxSplitStack.commitAssign]]
    * re-audits exactly the batch's clusters and maintains a conflict
    * family under the same manifest swap — the serve reads O(conflicted)
    * pinned rows instead of [[TxSplitStack.quarantine]]'s full ledger
    * scan. The ingest: two quad-cluster waves draw independently
    * (doc%8 ∈ [0,4) then [4,6) — same 8-block, different quads,
    * different draws), then tail arrivals (doc%8 ≥ 6, blocks past the
    * 4/5 boundary) carry 8-BLOCK labels that merge the quads — every
    * block whose two quads drew different splits becomes conflicted,
    * members of both eras included. The gate REQUIREs the incremental
    * set equals the full scan (`inc_matches_full`) and the oracle
    * replays draws, inheritance, and the conflict rule arithmetically. */
  val sampleSplitQuarantineInc = Q("sample_split_quarantine_inc",
    s"""WITH p AS (SELECT (COUNT(*) - COUNT(*) % 8) AS cap FROM documents),
       |p2 AS (SELECT cap, (4*cap//5) - ((4*cap//5) % 8) AS t FROM p),
       |d AS (SELECT doc_id, doc_id - doc_id % 8 AS b FROM documents, p2
       |  WHERE doc_id < cap AND doc_id - doc_id % 8 >= t),
       |s AS (SELECT doc_id, b, CASE WHEN doc_id % 8 IN (4, 5)
       |    THEN ${Registry19.sqlLadder("b + 4")}
       |    ELSE ${Registry19.sqlLadder("b")} END AS split FROM d),
       |bad AS (SELECT b FROM s GROUP BY b HAVING COUNT(DISTINCT split) > 1)
       |SELECT split, CAST(COUNT(*) AS BIGINT) AS n_quarantined,
       |  TRUE AS inc_matches_full
       |FROM s JOIN bad USING (b) GROUP BY split ORDER BY split""".stripMargin) { (s, d) =>
    val stage = StreamHarness.runDir("graft_spqinc")
    val root = stage.resolve("ledger").toString
    TxSplitStack.init(s, root)
    val all = docs(s, d).select("doc_id")
    val n = all.count()
    val cap = n - n % 8
    val t = { val x = 4 * cap / 5; x - x % 8 }
    val corpus = all.filter(col("doc_id") < cap)
    val quads = corpus.select(col("doc_id").as("id"),
      (col("doc_id") - col("doc_id") % 4).as("cluster"))
    require(TxSplitStack.commitAssign(s, root,
      corpus.filter(col("doc_id") % 8 < 4), quads, 0L, "doc_id",
      splits3, buckets = 8), "wave-1 assign must commit")
    require(TxSplitStack.commitAssign(s, root,
      corpus.filter(col("doc_id") % 8 >= 4 && col("doc_id") % 8 < 6),
      quads, 1L, "doc_id", splits3, buckets = 8),
      "wave-2 assign must commit")
    // the merge: tail arrivals carry 8-block labels for blocks ≥ t
    val lF = corpus.select(col("doc_id").as("id"),
      when(col("doc_id") - col("doc_id") % 8 >= t,
        col("doc_id") - col("doc_id") % 8)
        .otherwise(col("doc_id") - col("doc_id") % 4).as("cluster"))
    require(TxSplitStack.commitAssign(s, root,
      corpus.filter(col("doc_id") % 8 >= 6 && col("doc_id") >= t),
      lF, 2L, "doc_id", splits3, buckets = 8),
      "the merging assign must commit")
    val inc = TxSplitStack.quarantineIncremental(s, root)
      .localCheckpoint()
    val full = TxSplitStack.quarantine(s, root, lF)
      .localCheckpoint()
    val eq = inc.exceptAll(full).isEmpty && full.exceptAll(inc).isEmpty
    inc.groupBy("split")
      .agg(count(lit(1)).as("n_quarantined"))
      .withColumn("inc_matches_full", lit(eq))
      .orderBy("split")
  }

  /** CURATION COMPOSITION with the split + profile stages — the
    * end-to-end "nightly append → dedup → leak-free sticky split →
    * release profile" a training-data platform runs, every stage an
    * already-gated operator:
    *
    *  1. the STORED corpus (doc_id < 250) was split at ingest time —
    *     batch 0 under its own minhash closure (leak-free against
    *     itself, write-once thereafter);
    *  2. the arriving batch (doc_id ≥ 250) is quality-filtered
    *     (≥ 0.7), exact-deduped within itself and against the stored
    *     digest ledger ([[Dedup.dedupIncremental]]);
    *  3. survivors are assigned under the FULL closure — an arrival
    *     near-duplicating a stored cluster INHERITS its split (the
    *     leak would otherwise put the near-copy of a test doc in
    *     train), a fresh cluster draws its own ladder;
    *  4. the release profile: distinct SOURCES per split served from a
    *     sketch ledger keyed by split (the release dashboard's query),
    *     pinned by the oracle's exact distinct through the ±5% witness
    *     (exact at this cardinality).
    *
    * The oracle replays all four stages: the quality ladder, the
    * md5 dedup, both closures with the inheritance rule, and the
    * exact per-split rollup. */
  val curateSplitProfile = Q("curate_split_profile", {
    val en = graft.functions.TextFns.EnStop.map(w => s"'$w'")
      .mkString("[", ", ", "]")
    s"""WITH RECURSIVE t AS (SELECT doc_id, text, source,
       |  CAST(length(regexp_replace(text, '[a-z0-9 ]', '', 'g')) AS DOUBLE)
       |    / CAST(length(text) AS DOUBLE) AS punct_ratio,
       |  CAST(list_sum(list_transform(string_split(text, ' '), x -> length(x))) AS DOUBLE)
       |    / CAST(len(string_split(text, ' ')) AS DOUBLE) AS avg_word_len,
       |  CAST(len(list_filter(string_split(text, ' '), x -> list_contains($en, x))) AS DOUBLE)
       |    / CAST(len(string_split(text, ' ')) AS DOUBLE) AS stopword_ratio
       |  FROM documents WHERE doc_id >= 250),
       |q AS (SELECT doc_id, text, source,
       |  ((CASE WHEN length(text) >= 100 THEN 1.0
       |      ELSE CAST(length(text) AS DOUBLE) / 100.0 END
       |    + (1.0 - LEAST(punct_ratio * 5.0, 1.0))
       |    + (CASE WHEN avg_word_len >= 3.0 AND avg_word_len <= 10.0
       |        THEN 1.0 ELSE 0.5 END)
       |    + LEAST(stopword_ratio * 4.0, 1.0)) / 4.0) AS quality
       |  FROM t),
       |f AS (SELECT doc_id, text, source FROM q WHERE quality >= 0.7),
       |dd AS (SELECT doc_id, text, source FROM (
       |  SELECT doc_id, text, source,
       |    ROW_NUMBER() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
       |  FROM f) WHERE rn = 1),
       |fresh AS (SELECT doc_id, text, source FROM dd
       |  WHERE md5(text) NOT IN
       |    (SELECT DISTINCT md5(text) FROM documents WHERE doc_id < 250)),
       |${Registry19.sqlCc("p1", "doc_id < 250")},
       |${Registry19.sqlCc("pf",
           "doc_id < 250 OR doc_id IN (SELECT doc_id FROM fresh)")},
       |s1 AS (SELECT doc_id, cl, ${Registry19.sqlLadder("cl")} AS split
       |  FROM p1lab),
       |m AS (SELECT lf.cl AS fcl, MIN(s1.doc_id) AS mdoc
       |  FROM pflab lf JOIN s1 ON s1.doc_id = lf.doc_id GROUP BY lf.cl),
       |inh AS (SELECT m.fcl, s1.split AS isplit
       |  FROM m JOIN s1 ON s1.doc_id = m.mdoc),
       |arr AS (SELECT doc_id, cl FROM pflab WHERE doc_id >= 250),
       |s2 AS (SELECT a.doc_id,
       |    COALESCE(i.isplit, ${Registry19.sqlLadder("a.cl")}) AS split
       |  FROM arr a LEFT JOIN inh i ON a.cl = i.fcl),
       |allrows AS (SELECT doc_id, split FROM s1
       |  UNION ALL SELECT doc_id, split FROM s2),
       |rel AS (SELECT r.split, dcs.source FROM allrows r
       |  JOIN documents dcs ON dcs.doc_id = r.doc_id)
       |SELECT split, CAST(COUNT(*) AS BIGINT) AS n_docs,
       |  CAST(COUNT(DISTINCT source) AS BIGINT) AS n_sources,
       |  TRUE AS est_ok
       |FROM rel GROUP BY split ORDER BY split""".stripMargin
  }) { (s, d) =>
    val all = docs(s, d)
    val stored = all.filter(col("doc_id") < 250)
    val stage = StreamHarness.runDir("graft_curspl")
    val root = stage.resolve("ledger").toString
    TxSplitStack.init(s, root)
    // 1. the stored corpus's ingest-time split (its own closure)
    val l1 = Dedup.connectedComponents(
      Dedup.minhashCandidates(stored, "doc_id", "text"), "a_id", "b_id")
    require(TxSplitStack.commitAssign(s, root, stored, l1, 0L,
      "doc_id", splits3, buckets = 8), "stored assign must commit")
    // 2. the nightly batch: quality gate, exact dedup (within + ledger)
    val batch = all.filter(col("doc_id") >= 250)
      .withColumn("quality",
        graft.functions.TextFns.qualityScore(col("text")))
      .filter(col("quality") >= 0.7)
      .drop("quality")
    val ledger = stored.select(md5(col("text")).as("digest"))
    val fresh = graft.operators.Lineage.truncate(
      Dedup.dedupIncremental(batch, "doc_id", "text", ledger, "digest"))
    // 3. sticky leak-free split under the FULL closure
    val lF = Dedup.connectedComponents(
      Dedup.minhashCandidates(
        stored.select("doc_id", "text")
          .unionByName(fresh.select("doc_id", "text")),
        "doc_id", "text"), "a_id", "b_id")
    require(TxSplitStack.commitAssign(s, root, fresh, lF, 1L,
      "doc_id", splits3, buckets = 8), "batch assign must commit")
    // 4. the release profile: distinct sources per split, served from
    //    a sketch ledger keyed by split (one commit, then no raw pass)
    val release = TxSplitStack.resolve(s, root)
      .join(all.select("doc_id", "source"), Seq("doc_id"))
    val skRoot = stage.resolve("profile").toString
    TxSketchStack.init(s, skRoot)
    require(TxSketchStack.commitBatch(s, skRoot, release, 0L,
      "split", "source", buckets = 4),
      "the profile batch must commit")
    val exact = release.groupBy(col("split").as("key"))
      .agg(count(lit(1)).as("n_docs"),
        count_distinct(col("source")).as("n_sources"))
    TxSketchStack.estimates(TxSketchStack.resolve(s, skRoot))
      .join(exact, Seq("key"))
      .select(col("key").as("split"), col("n_docs"), col("n_sources"),
        (abs(col("est") - col("n_sources")) <=
          greatest(col("n_sources") * lit(0.05), lit(0.0))).as("est_ok"))
      .orderBy("split")
  }

  /** Transactional RE-BUCKET on the split ledger
    * ([[TxSplitStack.rebucket]] — the sketch/lexical stacks' twin): the
    * cure for the undersized-B law (with B fixed while the corpus
    * grows, every batch's touched-bucket replacement rewrites
    * ledger/B rows per bucket). The stored corpus assigns under B=8,
    * ONE commit moves assignment + conflict families wholesale to
    * B′=32, then the arrivals assign under the NEW keyspace — the
    * inheritance read must elect member buckets under B′ or it misses
    * the stored members entirely. The oracle is the sticky gate's
    * two-phase replay: a row lost in migration, an inheritance read
    * against the old numbering, or a new row landing in a wrong bucket
    * all shift the tallies. */
  val sampleSplitRebucket = Q("sample_split_rebucket",
    s"""WITH RECURSIVE ${Registry19.sqlCc("p1", "doc_id < 250")},
       |${Registry19.sqlCc("pf", "TRUE")},
       |s1 AS (SELECT doc_id, cl, ${Registry19.sqlLadder("cl")} AS split
       |  FROM p1lab),
       |m AS (SELECT lf.cl AS fcl, MIN(s1.doc_id) AS mdoc
       |  FROM pflab lf JOIN s1 ON s1.doc_id = lf.doc_id GROUP BY lf.cl),
       |inh AS (SELECT m.fcl, s1.split AS isplit
       |  FROM m JOIN s1 ON s1.doc_id = m.mdoc),
       |arr AS (SELECT doc_id, cl FROM pflab WHERE doc_id >= 250),
       |s2 AS (SELECT a.doc_id,
       |    COALESCE(i.isplit, ${Registry19.sqlLadder("a.cl")}) AS split
       |  FROM arr a LEFT JOIN inh i ON a.cl = i.fcl),
       |allrows AS (SELECT doc_id, split FROM s1
       |  UNION ALL SELECT doc_id, split FROM s2)
       |SELECT split, CAST(COUNT(*) AS BIGINT) AS n_docs,
       |  CAST(SUM(CASE WHEN doc_id < 250 THEN 1 ELSE 0 END) AS BIGINT)
       |    AS n_stored,
       |  CAST(SUM(CASE WHEN doc_id >= 250 THEN 1 ELSE 0 END) AS BIGINT)
       |    AS n_arrivals
       |FROM allrows GROUP BY split ORDER BY split""".stripMargin) { (s, d) =>
    val stage = StreamHarness.runDir("graft_sprebkt")
    val root = stage.resolve("ledger").toString
    TxSplitStack.init(s, root)
    val corpus = docs(s, d)
    val stored = corpus.filter(col("doc_id") < 250)
    val l1 = Dedup.connectedComponents(
      Dedup.minhashCandidates(stored, "doc_id", "text"), "a_id", "b_id")
    require(TxSplitStack.commitAssign(s, root, stored, l1, 0L,
      "doc_id", splits3, buckets = 8), "phase-1 assign must commit")
    require(TxSplitStack.rebucket(s, root, newBuckets = 32),
      "the re-bucket migration must commit on the assigned ledger")
    val lF = Dedup.connectedComponents(
      Dedup.minhashCandidates(corpus, "doc_id", "text"), "a_id", "b_id")
    require(TxSplitStack.commitAssign(s, root,
      corpus.filter(col("doc_id") >= 250), lF, 1L,
      "doc_id", splits3, buckets = 32),
      "the post-migration assign must commit under the new keyspace")
    TxSplitStack.resolve(s, root)
      .groupBy("split")
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("doc_id") < 250, 1L).otherwise(0L)).as("n_stored"),
        sum(when(col("doc_id") >= 250, 1L).otherwise(0L))
          .as("n_arrivals"))
      .orderBy("split")
  }

  val round20: Seq[Q] = Seq(manifestFenceRace, sketchResizeServe,
    streamingSplitAssign, sampleSplitQuarantineInc, curateSplitProfile,
    sampleSplitRebucket)
}
