package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.operators.{Catalog, Manifest, TxServeStack, TxSketchStack, TxSplitStack}

/** Round-17 second wave: CHANGE DATA FEEDS between committed manifest
  * cuts (the pin-diff kernel on per-bucket-MVCC families, the
  * window-asset kernel on the batch-delta family), the replica a feed
  * alone can maintain, and the cross-stack CATALOG cut that makes a
  * multi-stack pipeline wave atomic to readers.
  *
  * Reference (jurimetria-etl) has none of these surfaces; they are
  * LLM-training-data extensions (brief §"Beyond the reference").
  */
object Registry21 {

  private def docs(s: SparkSession, d: String) = Tables.documents(s, d)

  /** Apply the CDC mutation wave to a drained sketch stack: a
    * key-replace (drop 'error'; rebuild 'click' without the withdrawn
    * users) then an arrival of a brand-new key ('zz_new' — the first 7
    * events re-keyed). Returns the head version after both commits.
    * Deterministic — the oracle replays both cuts in SQL. */
  private[queries] def cdcMutations(s: SparkSession, d: String,
                           root: String): Long = {
    val rebuilt = Tables.events(s, d)
      .filter(col("event_type") === "click" && col("user_id") % 10 =!= 0)
    import s.implicits._
    require(TxSketchStack.commitReplace(s, root, rebuilt,
      Seq("error").toDF("key"), 4L, "event_type", "user_id",
      buckets = 8), "the replace batch must commit")
    require(TxSketchStack.commitBatch(s, root,
      Tables.events(s, d).filter(col("event_id") < 7)
        .withColumn("event_type", lit("zz_new")),
      5L, "event_type", "user_id", buckets = 8),
      "the new-key batch must commit")
    Manifest.read(s, root).get.version
  }

  /** SKETCH-PROFILE CHANGE FEED ([[TxSketchStack.changes]]): between
    * the 2-page drain cut (version 2) and the head after a
    * key-replace + a new-key arrival, classified insert / delete /
    * update with exact before/after tallies. The serve is a PIN DIFF
    * — only buckets re-pinned between the cuts are read, at both cuts
    * (O(changed buckets), never O(ledger)); a key that gained no rows
    * rides through byte-verbatim and emits nothing. The oracle
    * replays both corpus cuts exactly: the 2-page prefix
    * (event_id < 2·⌊n/4⌋ — the drain's page algebra) vs the
    * post-replace corpus plus the synthetic key. */
  val sketchChanges = Q("sketch_changes",
    """WITH q AS (SELECT (COUNT(*) // 4) AS qn FROM events),
      |b AS (SELECT event_type AS key, CAST(COUNT(*) AS BIGINT) AS c
      |      FROM events, q WHERE event_id < 2 * q.qn GROUP BY 1),
      |a AS (SELECT event_type AS key, CAST(COUNT(*) AS BIGINT) AS c
      |      FROM events
      |      WHERE event_type <> 'error'
      |        AND NOT (event_type = 'click' AND user_id % 10 = 0)
      |      GROUP BY 1
      |      UNION ALL
      |      SELECT 'zz_new' AS key, CAST(COUNT(*) AS BIGINT) AS c
      |      FROM events WHERE event_id < 7)
      |SELECT COALESCE(b.key, a.key) AS key,
      |  CASE WHEN b.key IS NULL THEN 'insert'
      |       WHEN a.key IS NULL THEN 'delete'
      |       ELSE 'update' END AS change,
      |  b.c AS n_rows_before, a.c AS n_rows_after
      |FROM b FULL OUTER JOIN a ON b.key = a.key
      |WHERE b.c IS DISTINCT FROM a.c
      |ORDER BY key""".stripMargin) { (s, d) =>
    val root = Registry19.drainSketchStack(s, d, "graft_skcdc")
    val head = cdcMutations(s, d, root)
    TxSketchStack.changes(s, root, 2L, head)
      .select("key", "change", "n_rows_before", "n_rows_after")
      .orderBy("key")
  }

  /** CDC REPLICA ([[TxSketchStack.changes]]'s consumer contract): a
    * downstream copy pinned at the from-cut is brought to the head by
    * the FEED ALONE — drop the feed's keys, append its non-delete
    * after-images — and must then serve exactly what the head serves
    * (tally and estimate per key, full-outer so a key-set drift
    * surfaces as a null row). The oracle is the head cut's exact
    * profile; `replica_ok` pins replica ≡ direct equality. */
  val sketchChangesApply = Q("sketch_changes_apply",
    """SELECT key, n_rows, TRUE AS replica_ok FROM (
      |  SELECT event_type AS key, CAST(COUNT(*) AS BIGINT) AS n_rows
      |  FROM events
      |  WHERE event_type <> 'error'
      |    AND NOT (event_type = 'click' AND user_id % 10 = 0)
      |  GROUP BY 1
      |  UNION ALL
      |  SELECT 'zz_new' AS key, CAST(COUNT(*) AS BIGINT) AS n_rows
      |  FROM events WHERE event_id < 7)
      |ORDER BY key""".stripMargin) { (s, d) =>
    val root = Registry19.drainSketchStack(s, d, "graft_skrepl2")
    val fromV = 2L
    val head = cdcMutations(s, d, root)
    val feed = TxSketchStack.changes(s, root, fromV, head)
      .localCheckpoint()
    val replica = TxSketchStack.resolve(s, root, version = Some(fromV))
      .join(feed.select("key"), Seq("key"), "left_anti")
      .unionByName(feed.filter(col("change") =!= "delete")
        .select(col("key"), col("n_rows_after").as("n_rows"),
          col("sk"), col("th")))
    val direct = TxSketchStack.estimates(
        TxSketchStack.resolve(s, root, version = Some(head)))
      .select(col("key"), col("n_rows").as("_dn"), col("est").as("_de"))
    TxSketchStack.estimates(replica)
      .join(direct, Seq("key"), "full_outer")
      .select(col("key"), col("n_rows"),
        (col("n_rows") === col("_dn") && col("est") === col("_de"))
          .as("replica_ok"))
      .orderBy("key")
  }

  // ------------------------------------------- lexical doc-level feed

  /** DOC-LEVEL CHANGE FEED on the lexical serve stack
    * ([[TxServeStack.docChanges]]): after two ingest batches (doc_id
    * mod 3 ∈ {0, 1}), the window holds a takedown (mod 6 = 0), and
    * one upsert batch that REPLACES stored docs (mod 6 = 3, re-texted)
    * and INSERTS never-stored ones (mod 3 = 2). The feed classifies
    * exactly from the window's per-batch assets — posting deltas carry
    * births, tombstones carry retirements, and the two liveness
    * probes read only the candidates' doc buckets. A doc absorbed or
    * untouched emits nothing; the oracle is the closed-form
    * classification of the three mod classes. */
  val textIndexChanges = Q("text_index_changes",
    """SELECT doc_id,
      |  CASE WHEN doc_id % 3 = 2 THEN 'insert'
      |       WHEN doc_id % 6 = 0 THEN 'delete'
      |       ELSE 'update' END AS change
      |FROM documents
      |WHERE doc_id % 3 = 2 OR doc_id % 6 = 0 OR doc_id % 6 = 3
      |ORDER BY doc_id""".stripMargin) { (s, d) =>
    val (root, fromV, toV) = cdcLexStack(s, d, "graft_lexcdc")
    TxServeStack.docChanges(s, root, fromV, toV, docBuckets = 16)
      .orderBy("doc_id")
  }

  /** The lexical CDC window both doc-feed gates share: a 2-batch
    * drained stack (doc_id mod 3 ∈ {0, 1}), then a takedown
    * (mod 6 = 0) and an upsert that replaces (mod 6 = 3, re-texted —
    * `reverse` keeps the token COUNT, so the norm survives while the
    * content changes) and inserts (mod 3 = 2). Returns
    * (root, fromVersion, toVersion). */
  private[queries] def cdcLexStack(s: SparkSession, d: String,
                                   tag: String): (String, Long, Long) = {
    val fx = FixtureCache.cached(d, "cdcstack", 1, Seq("documents")) {
      tmp =>
      val root = tmp.resolve("stack").toString
      val dd = docs(s, d)
      TxServeStack.commitBatch(s, root, dd.filter(col("doc_id") % 3 === 0),
        0L, "doc_id", "text", docBuckets = 16, termBuckets = 16)
      TxServeStack.commitBatch(s, root, dd.filter(col("doc_id") % 3 === 1),
        1L, "doc_id", "text", docBuckets = 16, termBuckets = 16)
      ()
    }
    val stage = StreamHarness.runDir(tag)
    FixtureCache.copyInto(fx.resolve("stack"), stage.resolve("stack"))
    val root = stage.resolve("stack").toString
    val dd = docs(s, d)
    val fromV = Manifest.read(s, root).get.version
    TxServeStack.commitDelete(s, root, dd.filter(col("doc_id") % 6 === 0),
      2L, "doc_id", docBuckets = 16, termBuckets = 16)
    TxServeStack.commitUpsert(s, root,
      dd.filter(col("doc_id") % 6 === 3)
        .withColumn("text", reverse(col("text")))
        .unionByName(dd.filter(col("doc_id") % 3 === 2)),
      3L, "doc_id", "text", docBuckets = 16, termBuckets = 16)
    (root, fromV, Manifest.read(s, root).get.version)
  }

  /** DOC FEED WITH AFTER-IMAGES ([[TxServeStack.docChanges]]
    * `stats = true`): the same window, now carrying `dl_before` /
    * `dl_after` from the pruned liveness probes — the after-image
    * parity that lets a consumer maintain subtractable aggregates
    * (doc counts, token totals per class) from the feed ALONE. The
    * oracle derives every norm from the raw corpus (non-empty
    * whitespace tokens — `withDocNorms`' definition); an upsert's
    * re-text is a `reverse`, so `dl_after = dl_before` is itself a
    * checked claim (the norm survives the content change), inserts
    * carry only after, deletes only before. */
  val textIndexChangesStats = Q("text_index_changes_stats",
    """WITH tk AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term
      |           FROM documents),
      |dl AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS dl
      |       FROM tk WHERE term <> '' GROUP BY 1)
      |SELECT d.doc_id,
      |  CASE WHEN d.doc_id % 3 = 2 THEN 'insert'
      |       WHEN d.doc_id % 6 = 0 THEN 'delete'
      |       ELSE 'update' END AS change,
      |  CASE WHEN d.doc_id % 3 = 2 THEN NULL ELSE dl.dl END AS dl_before,
      |  CASE WHEN d.doc_id % 6 = 0 THEN NULL ELSE dl.dl END AS dl_after
      |FROM documents d JOIN dl USING (doc_id)
      |WHERE d.doc_id % 3 = 2 OR d.doc_id % 6 = 0 OR d.doc_id % 6 = 3
      |ORDER BY d.doc_id""".stripMargin) { (s, d) =>
    val (root, fromV, toV) = cdcLexStack(s, d, "graft_lexcdcs")
    TxServeStack.docChanges(s, root, fromV, toV, docBuckets = 16,
      stats = true)
      .orderBy("doc_id")
  }

  // ------------------------------------------------ cross-stack catalog

  /** CROSS-STACK CATALOG CUT ([[graft.operators.Catalog]]): two
    * profile stacks (by event type; by user segment) each ingest the
    * first two event-quarter slices, and ONE catalog publish pins the
    * pair. The next pipeline wave advances BOTH stacks — unevenly (A
    * one slice, B two) — and CRASHES before its catalog publish: a
    * reader resolving through the catalog must still see the
    * CONSISTENT two-stack half-corpus cut (the new stack versions are
    * committed but unreferenced — the invisible-orphan posture one
    * level up), while the healed publish then serves the full wave.
    * The oracle replays all four (cut × stack) exact profiles from
    * the event-quarter algebra. */
  val catalogPinCut = Q("catalog_pin_cut",
    """WITH q AS (SELECT (COUNT(*) // 4) AS qn FROM events)
      |SELECT * FROM (
      |  SELECT 'pinned' AS cut, 'a' AS stack, event_type AS key,
      |    CAST(COUNT(*) AS BIGINT) AS n_rows
      |  FROM events, q WHERE event_id < 2 * q.qn GROUP BY 3
      |  UNION ALL
      |  SELECT 'pinned', 'b', 'u' || CAST(user_id % 7 AS VARCHAR),
      |    CAST(COUNT(*) AS BIGINT)
      |  FROM events, q WHERE event_id < 2 * q.qn GROUP BY 3
      |  UNION ALL
      |  SELECT 'head', 'a', event_type, CAST(COUNT(*) AS BIGINT)
      |  FROM events, q WHERE event_id < 3 * q.qn GROUP BY 3
      |  UNION ALL
      |  SELECT 'head', 'b', 'u' || CAST(user_id % 7 AS VARCHAR),
      |    CAST(COUNT(*) AS BIGINT)
      |  FROM events GROUP BY 3)
      |ORDER BY cut, stack, key""".stripMargin) { (s, d) =>
    val run = StreamHarness.runDir("graft_cat")
    val rootA = run.resolve("a").toString
    val rootB = run.resolve("b").toString
    val cat = run.resolve("cat").toString
    val ev = Tables.events(s, d)
      .select("event_id", "user_id", "event_type")
    val qn = ev.count() / 4
    def slice(k: Int) = ev.filter(
      col("event_id") >= k * qn &&
        (if (k == 3) lit(true) else col("event_id") < (k + 1) * qn))
    def segged(df: DataFrame) = df.withColumn("seg",
      concat(lit("u"), (col("user_id") % 7).cast("string")))
    TxSketchStack.init(s, rootA)
    TxSketchStack.init(s, rootB)
    for (k <- 0 to 1) {
      TxSketchStack.commitBatch(s, rootA, slice(k), k.toLong,
        "event_type", "user_id", buckets = 8)
      TxSketchStack.commitBatch(s, rootB, segged(slice(k)), k.toLong,
        "seg", "event_id", buckets = 8)
    }
    val vA = Manifest.read(s, rootA).get.version
    val vB = Manifest.read(s, rootB).get.version
    Catalog.publish(s, cat, Seq(("a", rootA, vA), ("b", rootB, vB)))
    // the next wave: both stacks advance, unevenly, then the pipeline
    // CRASHES before its catalog publish
    TxSketchStack.commitBatch(s, rootA, slice(2), 2L,
      "event_type", "user_id", buckets = 8)
    TxSketchStack.commitBatch(s, rootB, segged(slice(2)), 2L,
      "seg", "event_id", buckets = 8)
    TxSketchStack.commitBatch(s, rootB, segged(slice(3)), 3L,
      "seg", "event_id", buckets = 8)
    // the reader's cut: still the published pair, not the torn head
    val pinA = Catalog.pinnedVersion(s, cat, "a")
    val pinB = Catalog.pinnedVersion(s, cat, "b")
    require(pinA == vA && pinB == vB,
      "an unpublished pipeline wave must be invisible to catalog readers")
    def serve(root: String, tag: String, cut: String, v: Long) =
      TxSketchStack.estimates(
          TxSketchStack.resolve(s, root, version = Some(v)))
        .select(lit(cut).as("cut"), lit(tag).as("stack"), col("key"),
          col("n_rows"))
    val pinned = serve(rootA, "a", "pinned", pinA)
      .unionByName(serve(rootB, "b", "pinned", pinB))
    // the healed publish: the wave's catalog cut lands
    Catalog.publish(s, cat,
      Seq(("a", rootA, Manifest.read(s, rootA).get.version),
        ("b", rootB, Manifest.read(s, rootB).get.version)))
    val head = serve(rootA, "a", "head", Catalog.pinnedVersion(s, cat, "a"))
      .unionByName(serve(rootB, "b", "head",
        Catalog.pinnedVersion(s, cat, "b")))
    pinned.unionByName(head).orderBy("cut", "stack", "key")
  }

  /** SPLIT-LEDGER CHANGE FEED ([[TxSplitStack.changes]]): between the
    * streaming drain's 2-page cut and its head, the feed is exactly
    * the two later pages' arrivals — INSERT-only, the write-once
    * ledger's signature (stored rows never move; an update or delete
    * row in this feed is an alarm, not data). Each insert carries its
    * after-image split, which the oracle replays closed-form: every
    * even arrival inherited the minimum stored member of its 8-block
    * (the block's first odd doc, split = ladder(block + 1)). The pin
    * diff bounds the read to the arrivals' re-pinned buckets at both
    * cuts. */
  val splitChanges = Q("split_changes",
    s"""SELECT doc_id, 'insert' AS change,
       |  ${Registry19.sqlLadder("doc_id - doc_id % 8 + 1")} AS split
       |FROM documents
       |WHERE doc_id % 2 = 0 AND doc_id % 6 IN (2, 4)
       |ORDER BY doc_id""".stripMargin) { (s, d) =>
    val root = Registry20.drainSplitStream(s, d, "graft_spcdc")
    val head = Manifest.read(s, root).get.version
    TxSplitStack.changes(s, root, 2L, head).orderBy("doc_id")
  }

  /** MULTI-WINDOW FEED REPLAY ([[TxSketchStack.changes]]'s
    * composability law): a replica pinned at the FIRST drain cut is
    * walked to the head by applying the per-commit feeds
    * (v→v+1, one per micro-batch) in order — the exactly-once
    * consumer loop a downstream system runs on a cadence. The result
    * must serve the full-corpus profile through the exact-tally +
    * ±5% estimate witness: a feed window lost, double-applied, or
    * mis-classified moves `n_rows` exactly. */
  val sketchFeedReplay = Q("sketch_feed_replay",
    """SELECT event_type AS key, CAST(COUNT(*) AS BIGINT) AS n_rows,
      |  CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_users,
      |  TRUE AS est_ok
      |FROM events GROUP BY 1 ORDER BY key""".stripMargin) { (s, d) =>
    val root = Registry19.drainSketchStack(s, d, "graft_skfr")
    val head = Manifest.read(s, root).get.version
    val replica0 = TxSketchStack.resolve(s, root, version = Some(1L))
    val replica = (1L until head).foldLeft(replica0) { (rep, v) =>
      val feed = TxSketchStack.changes(s, root, v, v + 1)
        .localCheckpoint()
      rep.join(feed.select("key"), Seq("key"), "left_anti")
        .unionByName(feed.filter(col("change") =!= "delete")
          .select(col("key"), col("n_rows_after").as("n_rows"),
            col("sk"), col("th")))
    }
    Registry19.sketchWitness(s, d, replica)
  }

  /** CATALOG-AWARE VACUUM ([[Catalog.vacuumRetain]]): a release
    * catalog pins the 2-page profile cut; the stack then vacuums on
    * its own cadence with the retention the catalog computes — every
    * version BELOW the pinned floor is retired (REQUIREd in-gate:
    * version 1's snapshot is gone), while the pinned release cut
    * still serves exactly the 2-page profile. Without the coupling, a
    * head-only vacuum would have retired the release an old eval
    * still references. */
  val catalogVacuumFloor = Q("catalog_vacuum_floor",
    """WITH q AS (SELECT (COUNT(*) // 4) AS qn FROM events)
      |SELECT event_type AS key, CAST(COUNT(*) AS BIGINT) AS n_rows,
      |  CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_users,
      |  TRUE AS est_ok
      |FROM events, q WHERE event_id < 2 * q.qn
      |GROUP BY 1 ORDER BY key""".stripMargin) { (s, d) =>
    val root = Registry19.drainSketchStack(s, d, "graft_catvac")
    val cat = StreamHarness.runDir("graft_catvac_cat")
      .resolve("cat").toString
    Catalog.publish(s, cat, Seq(("profile", root, 2L)))
    val retain = Catalog.vacuumRetain(s, cat, "profile", root)
    require(retain == 2, s"head 4 − pinned 2 must retain 2, got $retain")
    TxSketchStack.vacuum(s, root, retainVersions = retain)
    // below the floor: version 1's history is retired
    require(Manifest.readAt(s, root, 1L).isEmpty,
      "vacuum must retire versions below the catalog floor")
    val pinned = Catalog.pinnedVersion(s, cat, "profile")
    val cut = TxSketchStack.estimates(
      TxSketchStack.resolve(s, root, version = Some(pinned)))
    val qn = Tables.events(s, d).count() / 4
    val exact = Tables.events(s, d)
      .filter(col("event_id") < 2 * qn)
      .groupBy(col("event_type").as("key"))
      .agg(count_distinct(col("user_id")).as("exact_users"))
    cut.join(exact, Seq("key"), "full_outer")
      .select(col("key"), col("n_rows"), col("exact_users"),
        (abs(col("est") - col("exact_users")) <=
          col("exact_users") * lit(0.05)).as("est_ok"))
      .orderBy("key")
  }

  lazy val round21: Seq[Q] = Seq(sketchChanges, sketchChangesApply,
    textIndexChanges, textIndexChangesStats, catalogPinCut,
    splitChanges, sketchFeedReplay, catalogVacuumFloor)
}
