package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.operators.{Dedup, Sampling, TxSketchStack}

/** Round-16 second wave: the leakage-free dataset split (near-dup
  * clusters cross the train/test cut as units) and the mergeable-sketch
  * ledger family (distinct-count profiles served from stored HLL
  * sketches under the manifest protocol).
  *
  * Reference (jurimetria-etl) has no dataset-split or sketch surface;
  * these are LLM-training-data extensions (brief §"Beyond the
  * reference").
  */
object Registry19 {

  private def docs(s: SparkSession, d: String) = Tables.documents(s, d)

  /** LEAKAGE-FREE train/val/test split
    * ([[graft.operators.Sampling.assignSplitLeakFree]]): the draw key
    * is the near-dup cluster representative, so a cluster's members
    * all land on the SAME side of every cut — the eval-leak guard
    * `sample_split`'s per-row draw cannot give (a test doc whose
    * near-copy trained the model measures memorization). Clusters are
    * the dedup stage's own artifact: MinHash-LSH pairs →
    * connected-components min-labels, exactly `dedup_cluster_sizes`'
    * closure.
    *
    * The rollup proves the invariant cross-engine: `n_dup_members`
    * counts member rows riding a representative other than themselves
    * — a cluster straddling a split boundary would move members
    * between split groups and flip BOTH `n_docs` and `n_dup_members`
    * (the oracle draws on the closure's representative, so any
    * engine-side member drawing on its own id diverges wherever the
    * two draws land differently). `n_clusters` pins the distinct draw
    * units per split. */
  val sampleSplitLeakFree = Q("sample_split_leakfree",
    s"""WITH RECURSIVE w AS (SELECT doc_id, string_split(text, ' ') AS wl FROM documents),
       |sh AS (SELECT doc_id, list_transform(range(1, len(wl) - 1),
       |  i -> wl[i] || ' ' || wl[i+1] || ' ' || wl[i+2]) AS shl FROM w),
       |sig AS (SELECT doc_id, list_transform(range(0, 8),
       |  j -> list_min(list_transform(shl,
       |    x -> substr(md5(CAST(j // 4 AS VARCHAR) || ':' || x),
       |                CAST((j % 4) * 8 + 1 AS INT), 8)))) AS mh
       |  FROM sh),
       |bands AS (SELECT doc_id, t.bnd, md5(mh[2*t.bnd+1] || mh[2*t.bnd+2]) AS bk
       |  FROM sig CROSS JOIN (SELECT unnest(range(0, 4)) AS bnd) t),
       |pairs AS (SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id
       |  FROM bands a JOIN bands b ON a.bnd = b.bnd AND a.bk = b.bk
       |    AND a.doc_id < b.doc_id),
       |edges AS (SELECT a_id AS s, b_id AS t FROM pairs
       |  UNION SELECT b_id, a_id FROM pairs),
       |reach(id, r) AS (
       |  SELECT s, s FROM edges
       |  UNION
       |  SELECT e.s, reach.r FROM edges e JOIN reach ON reach.id = e.t),
       |lbl AS (SELECT id, MIN(r) AS cl FROM reach GROUP BY id),
       |lab AS (SELECT d.doc_id, COALESCE(l.cl, d.doc_id) AS cl
       |  FROM documents d LEFT JOIN lbl l ON d.doc_id = l.id),
       |sp AS (SELECT doc_id, cl, CASE
       |    WHEN substr(md5('graft:split:' || CAST(cl AS VARCHAR)), 1, 8)
       |      < '${Sampling.hexThreshold(0.8)}' THEN 'train'
       |    WHEN substr(md5('graft:split:' || CAST(cl AS VARCHAR)), 1, 8)
       |      < '${Sampling.hexThreshold(0.9)}' THEN 'val'
       |    ELSE 'test' END AS split
       |  FROM lab)
       |SELECT split, CAST(COUNT(*) AS BIGINT) AS n_docs,
       |  CAST(COUNT(DISTINCT cl) AS BIGINT) AS n_clusters,
       |  CAST(SUM(CASE WHEN doc_id <> cl THEN 1 ELSE 0 END) AS BIGINT)
       |    AS n_dup_members
       |FROM sp GROUP BY split ORDER BY split""".stripMargin) { (s, d) =>
    val corpus = docs(s, d)
    val labels = Dedup.connectedComponents(
      Dedup.minhashCandidates(corpus, "doc_id", "text"), "a_id", "b_id")
    Sampling.assignSplitLeakFree(corpus.select("doc_id"), col("doc_id"),
        labels, Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
      .join(labels.select(col("id").as("doc_id"), col("cluster")),
        Seq("doc_id"), "left")
      .select(col("split"), col("doc_id"),
        coalesce(col("cluster"), col("doc_id")).as("cl"))
      .groupBy("split")
      .agg(count(lit(1)).as("n_docs"),
        count_distinct(col("cl")).as("n_clusters"),
        sum(when(col("doc_id") =!= col("cl"), 1L).otherwise(0L))
          .as("n_dup_members"))
      .orderBy("split")
  }

  /** The shared recursive-CTE minhash closure (dedup_cluster_sizes'
    * oracle machinery), parameterized by a doc filter and a CTE name
    * prefix so one oracle can close over two corpus cuts. */
  private[queries] def sqlCc(prefix: String, where: String): String =
    s"""${prefix}w AS (SELECT doc_id, string_split(text, ' ') AS wl
       |  FROM documents WHERE $where),
       |${prefix}sh AS (SELECT doc_id, list_transform(range(1, len(wl) - 1),
       |  i -> wl[i] || ' ' || wl[i+1] || ' ' || wl[i+2]) AS shl FROM ${prefix}w),
       |${prefix}sig AS (SELECT doc_id, list_transform(range(0, 8),
       |  j -> list_min(list_transform(shl,
       |    x -> substr(md5(CAST(j // 4 AS VARCHAR) || ':' || x),
       |                CAST((j % 4) * 8 + 1 AS INT), 8)))) AS mh
       |  FROM ${prefix}sh),
       |${prefix}bands AS (SELECT doc_id, t.bnd,
       |    md5(mh[2*t.bnd+1] || mh[2*t.bnd+2]) AS bk
       |  FROM ${prefix}sig CROSS JOIN (SELECT unnest(range(0, 4)) AS bnd) t),
       |${prefix}pairs AS (SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id
       |  FROM ${prefix}bands a JOIN ${prefix}bands b
       |  ON a.bnd = b.bnd AND a.bk = b.bk AND a.doc_id < b.doc_id),
       |${prefix}edges AS (SELECT a_id AS s, b_id AS t FROM ${prefix}pairs
       |  UNION SELECT b_id, a_id FROM ${prefix}pairs),
       |${prefix}reach(id, r) AS (
       |  SELECT s, s FROM ${prefix}edges
       |  UNION
       |  SELECT e.s, ${prefix}reach.r FROM ${prefix}edges e
       |    JOIN ${prefix}reach ON ${prefix}reach.id = e.t),
       |${prefix}lbl AS (SELECT id, MIN(r) AS cl FROM ${prefix}reach GROUP BY id),
       |${prefix}lab AS (SELECT d.doc_id, COALESCE(l.cl, d.doc_id) AS cl
       |  FROM documents d LEFT JOIN ${prefix}lbl l ON d.doc_id = l.id
       |  WHERE $where)""".stripMargin

  private[queries] def sqlLadder(key: String): String =
    s"""CASE WHEN substr(md5('graft:split:' || CAST($key AS VARCHAR)), 1, 8)
       |  < '${Sampling.hexThreshold(0.8)}' THEN 'train'
       |WHEN substr(md5('graft:split:' || CAST($key AS VARCHAR)), 1, 8)
       |  < '${Sampling.hexThreshold(0.9)}' THEN 'val'
       |ELSE 'test' END""".stripMargin

  /** The deterministic two-phase assignment drain the sticky/snapshot
    * gates share (same pages → same two commits): staged once per
    * (dataset, builder version), each gate reads its own copy. */
  private def drainSplitLedger(s: SparkSession, d: String,
                               tag: String): String = {
    import graft.operators.TxSplitStack
    val splits = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)
    // v2: commitAssign also maintains the conflict family (auxV pins)
    val fx = FixtureCache.cached(d, "splitledger", 2, Seq("documents")) { tmp =>
      val root = tmp.resolve("ledger").toString
      TxSplitStack.init(s, root)
      val corpus = docs(s, d)
      val stored = corpus.filter(col("doc_id") < 250)
      val l1 = Dedup.connectedComponents(
        Dedup.minhashCandidates(stored, "doc_id", "text"), "a_id", "b_id")
      require(TxSplitStack.commitAssign(s, root, stored, l1, 0L,
        "doc_id", splits, buckets = 8), "phase-1 assign must commit")
      val lF = Dedup.connectedComponents(
        Dedup.minhashCandidates(corpus, "doc_id", "text"), "a_id", "b_id")
      require(TxSplitStack.commitAssign(s, root,
        corpus.filter(col("doc_id") >= 250), lF, 1L,
        "doc_id", splits, buckets = 8), "phase-2 assign must commit")
    }
    val stage = StreamHarness.runDir(tag)
    FixtureCache.copyInto(fx.resolve("ledger"), stage.resolve("ledger"))
    stage.resolve("ledger").toString
  }

  /** STICKY split assignment
    * ([[graft.operators.TxSplitStack.commitAssign]]): the write-once
    * ledger closing `sample_split_leakfree`'s documented caveat — a
    * grown corpus can re-elect a cluster's min-label and MOVE the
    * whole cluster across the cut on re-assignment; here assignment
    * is drawn once at arrival and never changes. Two commits: the
    * stored corpus (docs < 250) under its own closure, then the
    * arrivals under the FULL closure — an arrival joining a cluster
    * with already-assigned members INHERITS the minimum-id stored
    * member's split (leak-free against everything ingested); an
    * arrival in a new cluster draws the ladder over its
    * representative. The oracle replays both closures and both rules;
    * a stored row moving, an inheritance missed, or a ladder drawn
    * over the wrong representative all shift the per-split tallies. */
  val sampleSplitSticky = Q("sample_split_sticky",
    s"""WITH RECURSIVE ${sqlCc("p1", "doc_id < 250")},
       |${sqlCc("pf", "TRUE")},
       |s1 AS (SELECT doc_id, cl, ${sqlLadder("cl")} AS split FROM p1lab),
       |m AS (SELECT lf.cl AS fcl, MIN(s1.doc_id) AS mdoc
       |  FROM pflab lf JOIN s1 ON s1.doc_id = lf.doc_id GROUP BY lf.cl),
       |inh AS (SELECT m.fcl, s1.split AS isplit
       |  FROM m JOIN s1 ON s1.doc_id = m.mdoc),
       |arr AS (SELECT doc_id, cl FROM pflab WHERE doc_id >= 250),
       |s2 AS (SELECT a.doc_id,
       |    COALESCE(i.isplit, ${sqlLadder("a.cl")}) AS split
       |  FROM arr a LEFT JOIN inh i ON a.cl = i.fcl),
       |allrows AS (SELECT doc_id, split FROM s1
       |  UNION ALL SELECT doc_id, split FROM s2)
       |SELECT split, CAST(COUNT(*) AS BIGINT) AS n_docs,
       |  CAST(SUM(CASE WHEN doc_id < 250 THEN 1 ELSE 0 END) AS BIGINT)
       |    AS n_stored,
       |  CAST(SUM(CASE WHEN doc_id >= 250 THEN 1 ELSE 0 END) AS BIGINT)
       |    AS n_arrivals
       |FROM allrows GROUP BY split ORDER BY split""".stripMargin) { (s, d) =>
    import graft.operators.TxSplitStack
    val root = drainSplitLedger(s, d, "graft_spsticky")
    TxSplitStack.resolve(s, root)
      .groupBy("split")
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("doc_id") < 250, 1L).otherwise(0L)).as("n_stored"),
        sum(when(col("doc_id") >= 250, 1L).otherwise(0L))
          .as("n_arrivals"))
      .orderBy("split")
  }

  /** SNAPSHOT read on the split ledger ([[Manifest.readAt]] through
    * [[graft.operators.TxSplitStack.resolve]]): both assignment phases
    * commit, but a reader pinned to version 1 reconstructs EXACTLY
    * the split the phase-1 eval ran against — the arrivals invisible.
    * Dataset versioning's core requirement: an old eval's
    * train/test cut is recoverable forever (until vacuumed). The
    * oracle replays only the phase-1 closure and ladder. */
  val sampleSplitSnapshot = Q("sample_split_snapshot",
    s"""WITH RECURSIVE ${sqlCc("p1", "doc_id < 250")},
       |s1 AS (SELECT doc_id, ${sqlLadder("cl")} AS split FROM p1lab)
       |SELECT split, CAST(COUNT(*) AS BIGINT) AS n_docs
       |FROM s1 GROUP BY split ORDER BY split""".stripMargin) { (s, d) =>
    import graft.operators.TxSplitStack
    val root = drainSplitLedger(s, d, "graft_spsnap")
    TxSplitStack.resolve(s, root, version = Some(1L))
      .groupBy("split")
      .agg(count(lit(1)).as("n_docs"))
      .orderBy("split")
  }

  /** VACUUM on the split ledger: retention 0 reclaims the
    * phase-1-superseded bucket versions and history manifests, the
    * resolved assignment is unchanged (same rollup as
    * `sample_split_sticky`'s oracle), and the phase-1 snapshot is
    * gone — retention bounds time travel, stated on every stack. */
  val sampleSplitVacuum = Q("sample_split_vacuum",
    s"""WITH RECURSIVE ${sqlCc("p1", "doc_id < 250")},
       |${sqlCc("pf", "TRUE")},
       |s1 AS (SELECT doc_id, cl, ${sqlLadder("cl")} AS split FROM p1lab),
       |m AS (SELECT lf.cl AS fcl, MIN(s1.doc_id) AS mdoc
       |  FROM pflab lf JOIN s1 ON s1.doc_id = lf.doc_id GROUP BY lf.cl),
       |inh AS (SELECT m.fcl, s1.split AS isplit
       |  FROM m JOIN s1 ON s1.doc_id = m.mdoc),
       |arr AS (SELECT doc_id, cl FROM pflab WHERE doc_id >= 250),
       |s2 AS (SELECT a.doc_id,
       |    COALESCE(i.isplit, ${sqlLadder("a.cl")}) AS split
       |  FROM arr a LEFT JOIN inh i ON a.cl = i.fcl),
       |allrows AS (SELECT doc_id, split FROM s1
       |  UNION ALL SELECT doc_id, split FROM s2)
       |SELECT split, CAST(COUNT(*) AS BIGINT) AS n_docs
       |FROM allrows GROUP BY split ORDER BY split""".stripMargin) { (s, d) =>
    import graft.operators.TxSplitStack
    val root = drainSplitLedger(s, d, "graft_spvac")
    val vs = TxSplitStack.vacuum(s, root, retainVersions = 0)
    require(vs.deletedDirs > 0,
      s"vacuum must reclaim superseded assignment versions, got $vs")
    TxSplitStack.resolve(s, root)
      .groupBy("split")
      .agg(count(lit(1)).as("n_docs"))
      .orderBy("split")
  }

  /** MERGE-CONFLICT QUARANTINE
    * ([[graft.operators.TxSplitStack.quarantine]]): sticky assignment
    * and leak-freedom cannot both survive a cluster MERGE — two
    * clusters assigned different splits at different times, later
    * bridged, leave near-duplicates on both sides of the cut, and
    * re-drawing would break every stored eval. The ledger surfaces
    * the conflict instead of hiding it: every assigned doc whose
    * CURRENT cluster carries ≥ 2 distinct stored splits, as the
    * eval-time exclusion list. Labels here are arithmetic pair/block
    * clusters (cl = id − id mod 2, then id − id mod 4) so the merges
    * — and therefore the conflict set — are deterministic and
    * oracle-expressible without a closure; the conflict RULE is
    * what's under test. */
  val sampleSplitQuarantine = Q("sample_split_quarantine",
    s"""WITH s1 AS (SELECT doc_id, doc_id - doc_id % 2 AS cl1,
       |    ${sqlLadder("doc_id - doc_id % 2")} AS split
       |  FROM documents WHERE doc_id < 250),
       |mrg AS (SELECT doc_id, split, doc_id - doc_id % 4 AS clf FROM s1),
       |bad AS (SELECT clf FROM mrg GROUP BY clf
       |  HAVING COUNT(DISTINCT split) > 1)
       |SELECT split, CAST(COUNT(*) AS BIGINT) AS n_quarantined
       |FROM mrg JOIN bad USING (clf)
       |GROUP BY split ORDER BY split""".stripMargin) { (s, d) =>
    import graft.operators.TxSplitStack
    val splits = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)
    val stage = StreamHarness.runDir("graft_spquar")
    val root = stage.resolve("ledger").toString
    TxSplitStack.init(s, root)
    val stored = docs(s, d).filter(col("doc_id") < 250)
    // phase 1: pair clusters (id − id%2) — every pair draws one split
    val l1 = stored.select(col("doc_id").as("id"),
      (col("doc_id") - col("doc_id") % 2).as("cluster"))
    require(TxSplitStack.commitAssign(s, root, stored, l1, 0L,
      "doc_id", splits, buckets = 8), "phase-1 assign must commit")
    // later, 4-blocks merge adjacent pairs; differently-drawn pairs
    // now share a cluster — the quarantine set
    val lF = stored.select(col("doc_id").as("id"),
      (col("doc_id") - col("doc_id") % 4).as("cluster"))
    TxSplitStack.quarantine(s, root, lF)
      .groupBy("split")
      .agg(count(lit(1)).as("n_quarantined"))
      .orderBy("split")
  }

  // -------------------------------------------- sketch ledger family

  /** Four NON-overlapping event pages in arrival order (mtime + name
    * ascending) — the sketch drain's exact row tallies make page
    * overlap a semantic change (HLL absorbs a re-delivered row,
    * `n_rows` must not), so this fixture does not reuse the
    * deliberately-overlapping `pagesFixture`. Dense event_ids make the
    * page boundary `n/4` oracle-expressible. */
  private[queries] def eventPagesFixture(s: SparkSession, d: String): java.nio.file.Path =
    FixtureCache.cached(d, "skpages", 1, Seq("events")) { tmp =>
      val pages = tmp.resolve("pages")
      java.nio.file.Files.createDirectories(pages)
      val ev = Tables.events(s, d).select("event_id", "user_id", "event_type")
      val n = ev.count()
      val qn = n / 4
      val base = System.currentTimeMillis() - 3600L * 1000
      for (p <- 0 until 4) {
        val lo = p * qn
        val hi = if (p == 3) n else (p + 1) * qn
        val tmpd = tmp.resolve(s"tmp$p")
        ev.filter(col("event_id") >= lo && col("event_id") < hi)
          .repartition(1).write.mode("overwrite").parquet(tmpd.toString)
        val part = tmpd.toFile.listFiles().toSeq
          .filter(_.getName.endsWith(".parquet")).minBy(_.getName)
        val dest = pages.resolve(s"page$p.parquet")
        java.nio.file.Files.move(part.toPath, dest)
        java.nio.file.Files.setLastModifiedTime(dest,
          java.nio.file.attribute.FileTime.fromMillis(base + p * 60000L))
        FixtureCache.deleteRecursively(tmpd)
      }
    }

  /** Drain the event pages into a sketch stack: one
    * [[TxSketchStack.commitBatch]] per micro-batch (key = event_type,
    * value = user_id, B = 8), exactly-once by the foreachBatch id.
    * The drain is deterministic (same pages → same 4 commits), so it
    * stages ONCE per (dataset, builder version) and each gate mutates
    * its own copy — `drainTxStack`'s caching discipline. Version
    * couples to TxSketchStack's on-disk format. */
  private[queries] def drainSketchStack(s: SparkSession, d: String,
                                        tag: String): String = {
    val fx = FixtureCache.cached(d, "skstack", 2, Seq("events")) { tmp =>
      val root = tmp.resolve("stack").toString
      TxSketchStack.init(s, root)
      val stream = s.readStream
        .schema("event_id LONG, user_id LONG, event_type STRING")
        .option("maxFilesPerTrigger", "1")
        .parquet(eventPagesFixture(s, d).resolve("pages").toString)
      val run = stream.writeStream
        .foreachBatch { (b: DataFrame, id: Long) =>
          TxSketchStack.commitBatch(s, root, b, id, "event_type",
            "user_id", buckets = 8)
          ()
        }
        .option("checkpointLocation", tmp.resolve("ckpt").toString)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      run.awaitTermination()
      FixtureCache.deleteRecursively(tmp.resolve("ckpt"))
    }
    val stage = StreamHarness.runDir(tag)
    FixtureCache.copyInto(fx.resolve("stack"), stage.resolve("stack"))
    stage.resolve("stack").toString
  }

  /** Exact-twin witness frame: the stack's (n_rows, estimate) joined
    * against the raw corpus's exact distinct counts. `est_ok` pins the
    * HLL estimate inside its published error envelope (±5% ≫ the
    * 1.04/√2¹² ≈ 1.6% bound at lgK=12) — a dropped page, a
    * double-counted replay, or a mis-merged bucket moves `exact_users`
    * / `n_rows` / `est` far past it. The oracle carries the exact
    * columns and a literal TRUE: cross-engine the ESTIMATE itself is
    * not replayable (DuckDB has no Datasketches HLL), the law it must
    * satisfy is. */
  private[queries] def sketchWitness(s: SparkSession, d: String,
                            resolved: DataFrame): DataFrame = {
    val exact = Tables.events(s, d)
      .groupBy(col("event_type").as("key"))
      .agg(count_distinct(col("user_id")).as("exact_users"))
    TxSketchStack.estimates(resolved)
      .join(exact, Seq("key"))
      .select(col("key"), col("n_rows"), col("exact_users"),
        (abs(col("est") - col("exact_users")) <=
          col("exact_users") * lit(0.05)).as("est_ok"))
      .orderBy("key")
  }

  /** STREAMING sketch-ledger ingest
    * ([[graft.operators.TxSketchStack.commitBatch]]): the
    * distinct-count profile (exact row tally + HLL user sketch per
    * event type) maintained from the stream under the manifest
    * protocol — every micro-batch is one atomic commit (batch agg →
    * touched-bucket merge → versioned write → swap), exactly-once by
    * batch-id high-water. The serve reads ONLY the 5-row sketch ledger
    * — no raw-event pass; the oracle's exact distinct counts pin the
    * estimates through the ±5% witness and the tallies exactly. */
  val streamingSketchIngest = Q("streaming_sketch_ingest",
    """SELECT event_type AS key, CAST(COUNT(*) AS BIGINT) AS n_rows,
      |  CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_users,
      |  TRUE AS est_ok
      |FROM events GROUP BY 1 ORDER BY key""".stripMargin) { (s, d) =>
    val root = drainSketchStack(s, d, "graft_skingest")
    sketchWitness(s, d, TxSketchStack.resolve(s, root))
  }

  /** PRUNED sketch serve: two queried keys elect their buckets from
    * the query frame (a 2-row collect) and the read opens ONLY those
    * pinned bucket directories — the serve-side O(touched) law
    * (SketchStackSpec holds the inputFiles path witness; this gate
    * pins the pruned read's RESULTS cross-engine). */
  val sketchDistinctServe = Q("sketch_distinct_serve",
    """SELECT event_type AS key, CAST(COUNT(*) AS BIGINT) AS n_rows,
      |  CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_users,
      |  TRUE AS est_ok
      |FROM events WHERE event_type IN ('click', 'purchase')
      |GROUP BY 1 ORDER BY key""".stripMargin) { (s, d) =>
    import s.implicits._
    val root = drainSketchStack(s, d, "graft_skserve")
    val keys = Seq("click", "purchase").toDF("key")
    sketchWitness(s, d,
      TxSketchStack.resolve(s, root, keys = Some((keys, 8))))
  }

  /** Cross-key ROLL-UP ([[graft.operators.TxSketchStack.rollup]]):
    * "distinct users across ALL event types" answered by sketch UNION
    * over the 5 stored rows — per-key estimates cannot sum (every user
    * appears under several types; 5 × 150 ≫ 150), slot-max union
    * handles the overlap by construction. The oracle's global exact
    * distinct pins it through the same ±5% witness. */
  val sketchRollupDistinct = Q("sketch_rollup_distinct",
    """SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
      |  CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_users,
      |  TRUE AS est_ok
      |FROM events""".stripMargin) { (s, d) =>
    val root = drainSketchStack(s, d, "graft_skroll")
    val exact = Tables.events(s, d)
      .agg(count_distinct(col("user_id")).as("exact_users"))
    TxSketchStack.rollup(TxSketchStack.resolve(s, root))
      .crossJoin(broadcast(exact))
      .select(col("n_rows"), col("exact_users"),
        (abs(col("est") - col("exact_users")) <=
          col("exact_users") * lit(0.05)).as("est_ok"))
  }

  /** SNAPSHOT read on the sketch stack ([[Manifest.readAt]] through
    * [[TxSketchStack.resolve]]): all four pages drain, but a reader
    * pinned to version 1 serves the profile EXACTLY as of the first
    * page's commit — later pages' rows and users invisible. The oracle
    * restricts the raw pass to the first page's dense-id window
    * (event_id < n/4); any post-snapshot leak moves its exact
    * columns. */
  val sketchSnapshotServe = Q("sketch_snapshot_serve",
    """SELECT event_type AS key, CAST(COUNT(*) AS BIGINT) AS n_rows,
      |  CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_users,
      |  TRUE AS est_ok
      |FROM events
      |WHERE event_id < (SELECT COUNT(*) // 4 FROM events)
      |GROUP BY 1 ORDER BY key""".stripMargin) { (s, d) =>
    val root = drainSketchStack(s, d, "graft_sksnap")
    val n = Tables.events(s, d).count()
    val exact = Tables.events(s, d)
      .filter(col("event_id") < n / 4)
      .groupBy(col("event_type").as("key"))
      .agg(count_distinct(col("user_id")).as("exact_users"))
    TxSketchStack.estimates(
        TxSketchStack.resolve(s, root, version = Some(1L)))
      .join(exact, Seq("key"))
      .select(col("key"), col("n_rows"), col("exact_users"),
        (abs(col("est") - col("exact_users")) <=
          col("exact_users") * lit(0.05)).as("est_ok"))
      .orderBy("key")
  }

  /** VACUUM on the sketch stack: drop every superseded bucket version
    * and history manifest (retention 0), then serve the full profile —
    * bit-identical to `streaming_sketch_ingest`, with reclaim
    * REQUIREd (4 commits over 8 buckets supersede at least one
    * version). */
  val sketchVacuumServe = Q("sketch_vacuum_serve",
    """SELECT event_type AS key, CAST(COUNT(*) AS BIGINT) AS n_rows,
      |  CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_users,
      |  TRUE AS est_ok
      |FROM events GROUP BY 1 ORDER BY key""".stripMargin) { (s, d) =>
    val root = drainSketchStack(s, d, "graft_skvac")
    val vs = TxSketchStack.vacuum(s, root, retainVersions = 0)
    require(vs.deletedDirs > 0,
      s"vacuum must reclaim superseded sketch versions, got $vs")
    sketchWitness(s, d, TxSketchStack.resolve(s, root))
  }

  /** Cross-key SET ALGEBRA from stored THETA sketches
    * ([[graft.operators.TxSketchStack.overlap]]): "users who clicked
    * AND purchased / clicked but never purchased" answered from the
    * committed sample sets — two 1-row lookups and three sketch
    * operations, no raw pass. This is the face HLL registers cannot
    * serve (registers union; they cannot intersect) and the reason
    * the stack carries both families. The corpus is value-filtered so
    * the per-type user sets genuinely differ (unfiltered, every type
    * saw every user — the overlap would be degenerate); below theta's
    * 4096-sample threshold the estimates are EXACT, so the ±5%
    * witness has no headroom to hide in. */
  val sketchOverlapServe = Q("sketch_overlap_serve",
    """WITH f AS (SELECT * FROM events WHERE value >= 90),
      |a AS (SELECT DISTINCT user_id FROM f WHERE event_type = 'click'),
      |b AS (SELECT DISTINCT user_id FROM f WHERE event_type = 'purchase')
      |SELECT
      |  CAST((SELECT COUNT(*) FROM a JOIN b USING (user_id)) AS BIGINT)
      |    AS exact_inter,
      |  CAST((SELECT COUNT(*) FROM a ANTI JOIN b USING (user_id)) AS BIGINT)
      |    AS exact_diff,
      |  CAST((SELECT COUNT(*) FROM (SELECT user_id FROM a
      |    UNION SELECT user_id FROM b)) AS BIGINT) AS exact_union,
      |  TRUE AS est_ok""".stripMargin) { (s, d) =>
    import s.implicits._
    val stage = StreamHarness.runDir("graft_skovl")
    val root = stage.resolve("stack").toString
    TxSketchStack.init(s, root)
    require(TxSketchStack.commitBatch(s, root,
      Tables.events(s, d).filter(col("value") >= 90),
      0L, "event_type", "user_id", buckets = 8),
      "the filtered batch must commit")
    val resolved = TxSketchStack.resolve(s, root,
      keys = Some((Seq("click", "purchase").toDF("key"), 8)))
    val f = Tables.events(s, d).filter(col("value") >= 90)
    def users(t: String) = f.filter(col("event_type") === t)
      .select("user_id").distinct()
    val exact = users("click").withColumn("_a", lit(1))
      .join(users("purchase").withColumn("_b", lit(1)),
        Seq("user_id"), "full_outer")
      .agg(
        sum(when(col("_a").isNotNull && col("_b").isNotNull, 1L)
          .otherwise(0L)).as("exact_inter"),
        sum(when(col("_a").isNotNull && col("_b").isNull, 1L)
          .otherwise(0L)).as("exact_diff"),
        count(lit(1)).as("exact_union"))
    def ok(est: Column, exact: Column): Column =
      abs(est - exact) <= greatest(exact * lit(0.05), lit(2.0))
    TxSketchStack.overlap(resolved, "click", "purchase")
      .crossJoin(broadcast(exact))
      .select(col("exact_inter"), col("exact_diff"), col("exact_union"),
        (ok(col("inter_est"), col("exact_inter")) &&
          ok(col("diff_est"), col("exact_diff")) &&
          ok(col("union_est"), col("exact_union"))).as("est_ok"))
  }

  /** DAY-OVER-DAY RETENTION from stored theta sketches: the classic
    * product question ("of yesterday's users, how many returned
    * today?") answered by ONE intersection over two stored sample
    * sets — at 100 TB the daily sketch rows are the only state, and
    * any D×D retention matrix is D² sketch intersections with zero
    * raw-event passes. Keys here are calendar days (the sketch stack
    * is key-agnostic — same ledger, time keys instead of type keys);
    * both engines derive the day by UTC truncation. */
  val sketchRetentionServe = Q("sketch_retention_serve",
    """WITH a AS (SELECT DISTINCT user_id FROM events
      |  WHERE strftime(ts, '%Y-%m-%d') = '2024-01-01'),
      |b AS (SELECT DISTINCT user_id FROM events
      |  WHERE strftime(ts, '%Y-%m-%d') = '2024-01-02')
      |SELECT
      |  CAST((SELECT COUNT(*) FROM a) AS BIGINT) AS exact_d1,
      |  CAST((SELECT COUNT(*) FROM a JOIN b USING (user_id)) AS BIGINT)
      |    AS exact_retained,
      |  CAST((SELECT COUNT(*) FROM b ANTI JOIN a USING (user_id)) AS BIGINT)
      |    AS exact_new,
      |  TRUE AS est_ok""".stripMargin) { (s, d) =>
    val stage = StreamHarness.runDir("graft_skret")
    val root = stage.resolve("stack").toString
    TxSketchStack.init(s, root)
    val keyed = Tables.events(s, d)
      .select(date_format(col("ts"), "yyyy-MM-dd").as("day"),
        col("user_id"))
    require(TxSketchStack.commitBatch(s, root, keyed, 0L, "day",
      "user_id", buckets = 8),
      "the day-keyed batch must commit")
    val resolved = TxSketchStack.resolve(s, root)
    def users(day: String) = keyed.filter(col("day") === day)
      .select("user_id").distinct()
    val exact = users("2024-01-01").withColumn("_a", lit(1))
      .join(users("2024-01-02").withColumn("_b", lit(1)),
        Seq("user_id"), "full_outer")
      .agg(
        sum(when(col("_a").isNotNull, 1L).otherwise(0L)).as("exact_d1"),
        sum(when(col("_a").isNotNull && col("_b").isNotNull, 1L)
          .otherwise(0L)).as("exact_retained"),
        sum(when(col("_a").isNull && col("_b").isNotNull, 1L)
          .otherwise(0L)).as("exact_new"))
    def ok(est: Column, exact: Column): Column =
      abs(est - exact) <= greatest(exact * lit(0.05), lit(2.0))
    // d1 cardinality, retained = d1 ∩ d2, new = d2 ∖ d1
    val ests = TxSketchStack.overlap(resolved, "2024-01-01", "2024-01-02")
      .crossJoin(broadcast(TxSketchStack.estimates(
        resolved.filter(col("key") === "2024-01-01"))
        .select(col("est").as("d1_est"))))
    // overlap's diff is A∖B (churned); NEW users are B∖A — derive from
    // union − |A| (exact set identity, carried by the same sketches)
    ests.crossJoin(broadcast(exact))
      .select(col("exact_d1"), col("exact_retained"), col("exact_new"),
        (ok(col("d1_est"), col("exact_d1")) &&
          ok(col("inter_est"), col("exact_retained")) &&
          ok(col("union_est") - col("d1_est"), col("exact_new")))
          .as("est_ok"))
  }

  /** KEY-LEVEL REPLACE on the sketch stack
    * ([[graft.operators.TxSketchStack.commitReplace]]) — the takedown
    * face, shaped by non-invertibility: registers and sample sets
    * cannot un-see a value, so removal is REBUILD-AND-SWAP. One commit
    * rebuilds `click` from a re-scan that excludes the withdrawn
    * users (user_id ≡ 0 mod 10), drops `error` entirely, and leaves
    * the other keys' rows riding through their shared buckets. The
    * oracle recomputes the profile over exactly that corpus cut — a
    * stale click sketch still counting a withdrawn user moves
    * `exact_users` past the witness; a leaked `error` row changes the
    * row count. */
  val sketchReplaceServe = Q("sketch_replace_serve",
    """SELECT event_type AS key, CAST(COUNT(*) AS BIGINT) AS n_rows,
      |  CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_users,
      |  TRUE AS est_ok
      |FROM events
      |WHERE event_type <> 'error'
      |  AND NOT (event_type = 'click' AND user_id % 10 = 0)
      |GROUP BY 1 ORDER BY key""".stripMargin) { (s, d) =>
    import s.implicits._
    val root = drainSketchStack(s, d, "graft_skrepl")
    val rebuilt = Tables.events(s, d)
      .filter(col("event_type") === "click" && col("user_id") % 10 =!= 0)
    require(TxSketchStack.commitReplace(s, root, rebuilt,
      Seq("error").toDF("key"), 4L, "event_type", "user_id",
      buckets = 8),
      "the replace batch must commit on the drained stack")
    val exact = Tables.events(s, d)
      .filter(col("event_type") =!= "error" &&
        !(col("event_type") === "click" && col("user_id") % 10 === 0))
      .groupBy(col("event_type").as("key"))
      .agg(count_distinct(col("user_id")).as("exact_users"))
    // LEFT join from the STACK side: a dropped key leaking through
    // commitReplace (e.g. a surviving 'error' row) yields an extra row
    // with null exact columns — a row-set change the gate sees — instead
    // of being silently filtered by an inner join against the oracle cut
    TxSketchStack.estimates(TxSketchStack.resolve(s, root))
      .join(exact, Seq("key"), "left")
      .select(col("key"), col("n_rows"), col("exact_users"),
        (abs(col("est") - col("exact_users")) <=
          col("exact_users") * lit(0.05)).as("est_ok"))
      .orderBy("key")
  }

  // -------------------------------------------- lexical re-bucket

  /** Transactional RE-BUCKET on the LEXICAL stack
    * ([[graft.operators.TxServeStack.rebucket]] —
    * `ann_graph_tx_rebucket`'s twin): after the 4-page drain, ONE
    * commit moves both keyspaces 16 → 32 (postings consolidated under
    * pmod(doc_id, 32); the whole term-stats ledger re-keyed under
    * xxhash-32 with its pin map moving wholesale), then a
    * post-migration DELETE commits under the NEW keyspace and the
    * serve elects its query terms' buckets under B′=32. The oracle is
    * the delete gate's scratch BM25 over the surviving corpus — a row
    * lost in migration, a stats bucket left under the old numbering,
    * or a delete landing in the wrong doc bucket all flip scores. */
  val textIndexRebucket = Q("text_index_rebucket",
    s"""WITH ${Registry12.sqlBm25(10, "doc_id % 7 <> 3")}
       |SELECT q_id, doc_id, rnk, score FROM lex
       |ORDER BY q_id, rnk""".stripMargin) { (s, d) =>
    import graft.operators.{Ledger, Retrieval, TxServeStack}
    val root = Registry16.drainTxStack(s, d, "graft_statsrb")
    require(TxServeStack.rebucket(s, root, newDocBuckets = 32,
      newTermBuckets = 32),
      "the re-bucket migration must commit on the drained stack")
    require(TxServeStack.commitDelete(s, root,
      docs(s, d).filter(col("doc_id") % 7 === 3).select("doc_id"),
      batchId = 4L, "doc_id", docBuckets = 32, termBuckets = 32),
      "the post-migration delete must commit under the new keyspace")
    val qt = docs(s, d).filter(col("doc_id") < 3)
      .select(col("doc_id").as("q_id"),
        explode(split(col("text"), " ")).as("term"))
    val qBkts = Ledger.keyHashBuckets(qt.select("term").distinct(),
      "term", 32)
    val (postings, stats, global) =
      TxServeStack.resolve(s, root, statsBuckets = Some(qBkts))
    Retrieval.bm25TopKFromStats(qt, postings, stats, global, k = 10)
      .withColumn("rnk", col("rnk").cast("long"))
      .orderBy("q_id", "rnk")
  }

  val round19: Seq[Q] = Seq(sampleSplitLeakFree, sampleSplitSticky,
    sampleSplitSnapshot, sampleSplitVacuum,
    sampleSplitQuarantine, streamingSketchIngest,
    sketchDistinctServe, sketchRollupDistinct, sketchSnapshotServe,
    sketchVacuumServe, sketchOverlapServe, sketchRetentionServe,
    sketchReplaceServe,
    textIndexRebucket)
}
