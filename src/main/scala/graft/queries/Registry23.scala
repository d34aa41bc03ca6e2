package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.operators.{Catalog, Manifest, TxSketchStack}

/** Round-17 fourth wave: WRITE-AUDIT-PUBLISH on the cross-stack
  * catalog — the release discipline a production training-data
  * platform runs nightly: stage the pipeline wave on a catalog
  * branch, audit it there, and only a fenced fast-forward ever moves
  * what readers see; immutable tags name the cuts evals re-run
  * against months later.
  *
  * Reference (jurimetria-etl) has none of these surfaces; they are
  * LLM-training-data extensions (brief §"Beyond the reference").
  */
object Registry23 {

  /** WRITE-AUDIT-PUBLISH ([[Catalog.branch]] / [[Catalog.fastForward]]
    * / [[Catalog.tag]]): main pins the drain's 2-page cut and tags it
    * `release-1`; the nightly wave then double-applies a page under a
    * fresh batch id (the replay the exactly-once guard can NOT absorb
    * — a pipeline bug, not a retry), publishes to a staging branch,
    * and FAILS its audit (staged total tally ≠ raw corpus count), so
    * main never moves — the poisoned stack version stays an invisible
    * orphan. Remediation rebuilds every key from the true corpus in
    * one replace commit; the re-staged wave passes the audit and the
    * fenced fast-forward lands it as ONE atomic main-catalog swap.
    * The gate serves both faces through main alone: the healed head,
    * and the release cut resolved via its tag — a reader that never
    * learns stack versions, only names. */
  val catalogWapPublish = Q("catalog_wap_publish",
    """WITH q AS (SELECT (COUNT(*) // 4) AS qn FROM events)
      |SELECT * FROM (
      |  SELECT 'head' AS cut, event_type AS key,
      |    CAST(COUNT(*) AS BIGINT) AS n_rows
      |  FROM events GROUP BY 2
      |  UNION ALL
      |  SELECT 'release' AS cut, event_type,
      |    CAST(COUNT(*) AS BIGINT)
      |  FROM events, q WHERE event_id < 2 * q.qn GROUP BY 2)
      |ORDER BY cut, key""".stripMargin) { (s, d) =>
    import s.implicits._
    val root = Registry19.drainSketchStack(s, d, "graft_wap")
    val run = StreamHarness.runDir("graft_wap_cat")
    val main = run.resolve("main").toString
    val stg = run.resolve("stg").toString
    Catalog.publish(s, main, Seq(("profile", root, 2L)))
    Catalog.tag(s, main, "release-1", 0L)
    val ev = Tables.events(s, d)
      .select("event_id", "user_id", "event_type")
    val qn = ev.count() / 4
    // the wave's bug: page 2 re-applied under a FRESH batch id — the
    // high-water guard absorbs replays of the same id, not this
    require(TxSketchStack.commitBatch(s, root,
      ev.filter(col("event_id") >= 2 * qn && col("event_id") < 3 * qn),
      100L, "event_type", "user_id", buckets = 8),
      "the poisoned batch must commit on the drained stack")
    Catalog.branch(s, main, stg)
    Catalog.publish(s, stg,
      Seq(("profile", root, Manifest.read(s, root).get.version)))
    def stagedTotal(): Long = TxSketchStack.resolve(s, root,
        version = Some(Catalog.pinnedVersion(s, stg, "profile")))
      .agg(sum("n_rows")).head().getLong(0)
    val exactN = ev.count()
    require(stagedTotal() != exactN,
      "the poisoned wave must fail its audit")
    require(Catalog.pinnedVersion(s, main, "profile") == 2L,
      "a failed audit must leave main untouched")
    // remediation: rebuild every key from the true corpus, one commit
    require(TxSketchStack.commitReplace(s, root, ev,
      Seq.empty[String].toDF("key"), 101L, "event_type", "user_id",
      buckets = 8), "the remediation replace must commit")
    Catalog.publish(s, stg,
      Seq(("profile", root, Manifest.read(s, root).get.version)))
    require(stagedTotal() == exactN,
      "the healed wave must pass its audit")
    Catalog.fastForward(s, main, stg)
    def serve(cut: String, v: Long): DataFrame =
      TxSketchStack.estimates(
          TxSketchStack.resolve(s, root, version = Some(v)))
        .select(lit(cut).as("cut"), col("key"), col("n_rows"))
    val headV = Catalog.pinnedVersion(s, main, "profile")
    val relV = Catalog.pinnedVersion(s, main, "profile",
      Some(Catalog.resolveTag(s, main, "release-1")))
    serve("head", headV).unionByName(serve("release", relV))
      .orderBy("cut", "key")
  }

  /** CATALOG-ORCHESTRATED MAINTENANCE WAVE — the ops capstone a
    * deployed platform runs on a cadence, composed entirely from
    * gated faces: two production stacks (the event profile from its
    * streaming drain; the sticky split ledger from its) are released
    * as one tagged catalog cut; the corpus then grows (a post-release
    * arrival lands on the profile); maintenance migrates BOTH
    * keyspaces (`rebucket` — content-neutral by contract), publishes
    * the post-maintenance heads as a new catalog cut, and vacuums
    * each stack under [[Catalog.vacuumRetain]]'s floor. The gate
    * REQUIREs the destructive half in-flight (pre-release versions
    * retired on both stacks) and serves all four (cut × stack) faces:
    * the head through the new catalog cut — under the migrated
    * keyspaces — and the release through its TAG, which the vacuum
    * had to keep readable (tags floor retention unconditionally).
    * The split ledger serves IDENTICAL content at both cuts — the
    * write-once law across a migration — while the profile's head
    * carries the arrival the release must not. */
  val catalogMaintenanceWave = Q("catalog_maintenance_wave",
    s"""WITH spl AS (SELECT
       |  CASE WHEN doc_id % 2 = 1 THEN ${Registry19.sqlLadder("doc_id")}
       |  ELSE ${Registry19.sqlLadder("doc_id - doc_id % 8 + 1")}
       |  END AS split FROM documents)
       |SELECT * FROM (
       |  SELECT 'head' AS cut, 'profile' AS stack, event_type AS key,
       |    CAST(COUNT(*) AS BIGINT) AS n
       |  FROM events GROUP BY 3
       |  UNION ALL
       |  SELECT 'head', 'profile', 'zz_new', CAST(COUNT(*) AS BIGINT)
       |  FROM events WHERE event_id < 7
       |  UNION ALL
       |  SELECT 'release', 'profile', event_type,
       |    CAST(COUNT(*) AS BIGINT)
       |  FROM events GROUP BY 3
       |  UNION ALL
       |  SELECT 'head', 'split', split, CAST(COUNT(*) AS BIGINT)
       |  FROM spl GROUP BY 3
       |  UNION ALL
       |  SELECT 'release', 'split', split, CAST(COUNT(*) AS BIGINT)
       |  FROM spl GROUP BY 3)
       |ORDER BY cut, stack, key""".stripMargin) { (s, d) =>
    import graft.operators.TxSplitStack
    val skRoot = Registry19.drainSketchStack(s, d, "graft_mw_sk")
    val spRoot = Registry20.drainSplitStream(s, d, "graft_mw_sp")
    val cat = StreamHarness.runDir("graft_mw_cat").resolve("cat").toString
    val skRel = Manifest.read(s, skRoot).get.version
    val spRel = Manifest.read(s, spRoot).get.version
    Catalog.publish(s, cat,
      Seq(("profile", skRoot, skRel), ("split", spRoot, spRel)))
    Catalog.tag(s, cat, "release-1", 0L)
    // the corpus grows after the release: a new key arrives
    require(TxSketchStack.commitBatch(s, skRoot,
      Tables.events(s, d).filter(col("event_id") < 7)
        .withColumn("event_type", lit("zz_new")),
      100L, "event_type", "user_id", buckets = 8),
      "the post-release arrival must commit")
    // the maintenance wave: migrate both keyspaces, republish, vacuum
    require(TxSketchStack.rebucket(s, skRoot, newBuckets = 32),
      "the profile keyspace migration must commit")
    require(TxSplitStack.rebucket(s, spRoot, newBuckets = 32),
      "the split keyspace migration must commit")
    Catalog.publish(s, cat,
      Seq(("profile", skRoot, Manifest.read(s, skRoot).get.version),
        ("split", spRoot, Manifest.read(s, spRoot).get.version)))
    TxSketchStack.vacuum(s, skRoot,
      Catalog.vacuumRetain(s, cat, "profile", skRoot))
    TxSplitStack.vacuum(s, spRoot,
      Catalog.vacuumRetain(s, cat, "split", spRoot))
    require(Manifest.readAt(s, skRoot, skRel - 1).isEmpty &&
      Manifest.readAt(s, spRoot, spRel - 1).isEmpty,
      "vacuum must retire the pre-release versions below the floor")
    val relCat = Catalog.resolveTag(s, cat, "release-1")
    def profile(cut: String, v: Long): DataFrame =
      TxSketchStack.estimates(
          TxSketchStack.resolve(s, skRoot, version = Some(v)))
        .select(lit(cut).as("cut"), lit("profile").as("stack"),
          col("key"), col("n_rows").as("n"))
    def splits(cut: String, v: Long): DataFrame =
      TxSplitStack.resolve(s, spRoot, version = Some(v))
        .groupBy(col("split").as("key"))
        .agg(count(lit(1)).as("n"))
        .select(lit(cut).as("cut"), lit("split").as("stack"),
          col("key"), col("n"))
    profile("head", Catalog.pinnedVersion(s, cat, "profile"))
      .unionByName(profile("release",
        Catalog.pinnedVersion(s, cat, "profile", Some(relCat))))
      .unionByName(splits("head", Catalog.pinnedVersion(s, cat, "split")))
      .unionByName(splits("release",
        Catalog.pinnedVersion(s, cat, "split", Some(relCat))))
      .orderBy("cut", "stack", "key")
  }

  /** CATALOG SELF-VACUUM ([[Catalog.vacuum]]): the catalog's own
    * history is a table too — nightly publishes accumulate pin tables
    * and manifest files forever without it. Four cuts advance the
    * profile pin (drain versions 1→4); cut 1 is tagged `release`;
    * the head-window vacuum then retires ONLY cut 0 (REQUIREd
    * in-gate: its snapshot is gone) because the tag drags the floor
    * to 1 — everything at or above it, tagged or not, stays fully
    * readable. The serve goes the long way through the retained
    * history: `resolveTag → pins at that cut → stack snapshot at the
    * pinned version` — the 2-page profile the release froze, while
    * the head cut serves the full corpus. A pin table swept too
    * eagerly breaks the release leg; a manifest kept below the floor
    * without its pin table would break it uglier. */
  val catalogHistoryVacuum = Q("catalog_history_vacuum",
    """WITH q AS (SELECT (COUNT(*) // 4) AS qn FROM events)
      |SELECT * FROM (
      |  SELECT 'head' AS cut, event_type AS key,
      |    CAST(COUNT(*) AS BIGINT) AS n_rows
      |  FROM events GROUP BY 2
      |  UNION ALL
      |  SELECT 'release', event_type, CAST(COUNT(*) AS BIGINT)
      |  FROM events, q WHERE event_id < 2 * q.qn GROUP BY 2)
      |ORDER BY cut, key""".stripMargin) { (s, d) =>
    val root = Registry19.drainSketchStack(s, d, "graft_chv")
    val cat = StreamHarness.runDir("graft_chv_cat").resolve("cat").toString
    for (v <- 1L to 4L)
      Catalog.publish(s, cat, Seq(("profile", root, v)))
    Catalog.tag(s, cat, "release", 1L) // pins drain version 2
    val vs = Catalog.vacuum(s, cat)    // head window, tag drags to 1
    require(vs.deletedDirs > 0, "cut 0's pin table must sweep")
    require(Manifest.readAt(s, cat, 0L).isEmpty,
      "the untagged cut below the floor must retire")
    require(Manifest.readAt(s, cat, 1L).isDefined &&
      Manifest.readAt(s, cat, 2L).isDefined,
      "every cut at or above the dragged floor must stay readable")
    def serve(cut: String, v: Long): DataFrame =
      TxSketchStack.estimates(
          TxSketchStack.resolve(s, root, version = Some(v)))
        .select(lit(cut).as("cut"), col("key"), col("n_rows"))
    serve("head", Catalog.pinnedVersion(s, cat, "profile"))
      .unionByName(serve("release", Catalog.pinnedVersion(s, cat,
        "profile", Some(Catalog.resolveTag(s, cat, "release")))))
      .orderBy("cut", "key")
  }

  /** STREAMING MULTI-STACK PIPELINE under the catalog: each
    * micro-batch commits BOTH profile stacks (by event type; by user
    * segment) and publishes ONE catalog cut pinning the pair — so at
    * every instant a reader resolving through the catalog sees a
    * CONSISTENT two-stack wave, never stack A at tonight's cut while
    * B serves yesterday's. The publish is guarded by the stacks' own
    * exactly-once verdicts (a replayed batch skips both commits and
    * must publish nothing — the catalog has no batch high-water of
    * its own, the guard IS the consumer pattern); the gate REQUIREs
    * cuts == waves, then serves the mid-stream pair through cut 1
    * (both stacks at exactly the 2-page corpus) and the head pair —
    * the four-leg oracle replays the page algebra per stack. */
  val streamingCatalogPublish = Q("streaming_catalog_publish",
    """WITH q AS (SELECT (COUNT(*) // 4) AS qn FROM events)
      |SELECT * FROM (
      |  SELECT 'mid' AS cut, 'a' AS stack, event_type AS key,
      |    CAST(COUNT(*) AS BIGINT) AS n_rows
      |  FROM events, q WHERE event_id < 2 * q.qn GROUP BY 3
      |  UNION ALL
      |  SELECT 'mid', 'b', 'u' || CAST(user_id % 7 AS VARCHAR),
      |    CAST(COUNT(*) AS BIGINT)
      |  FROM events, q WHERE event_id < 2 * q.qn GROUP BY 3
      |  UNION ALL
      |  SELECT 'head', 'a', event_type, CAST(COUNT(*) AS BIGINT)
      |  FROM events GROUP BY 3
      |  UNION ALL
      |  SELECT 'head', 'b', 'u' || CAST(user_id % 7 AS VARCHAR),
      |    CAST(COUNT(*) AS BIGINT)
      |  FROM events GROUP BY 3)
      |ORDER BY cut, stack, key""".stripMargin) { (s, d) =>
    val run = StreamHarness.runDir("graft_scat")
    val rootA = run.resolve("a").toString
    val rootB = run.resolve("b").toString
    val cat = run.resolve("cat").toString
    TxSketchStack.init(s, rootA)
    TxSketchStack.init(s, rootB)
    val stream = s.readStream
      .schema("event_id LONG, user_id LONG, event_type STRING")
      .option("maxFilesPerTrigger", "1")
      .parquet(Registry19.eventPagesFixture(s, d).resolve("pages").toString)
    val q = stream.writeStream
      .foreachBatch { (b: DataFrame, id: Long) =>
        val segged = b.withColumn("seg",
          concat(lit("u"), (col("user_id") % 7).cast("string")))
        // two INDEPENDENT stacks (separate roots, manifests, locks):
        // their commits overlap (guide §2.6); the catalog wave below
        // still publishes strictly after both, preserving the
        // one-cut-per-wave law the REQUIRE pins
        val (cA, cB) = graft.operators.Par.both(
          TxSketchStack.commitBatch(s, rootA, b, id,
            "event_type", "user_id", buckets = 8),
          TxSketchStack.commitBatch(s, rootB, segged, id,
            "seg", "event_id", buckets = 8))
        if (cA || cB)
          Catalog.publish(s, cat, Seq(
            ("a", rootA, Manifest.read(s, rootA).get.version),
            ("b", rootB, Manifest.read(s, rootB).get.version)))
        ()
      }
      .option("checkpointLocation", run.resolve("ckpt").toString)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val head = Manifest.read(s, cat).get.version
    require(head == 3L,
      s"one catalog cut per wave: head version $head for 4 batches")
    def serve(cut: String, catV: Long, stack: String,
              root: String): DataFrame =
      TxSketchStack.estimates(TxSketchStack.resolve(s, root,
          version = Some(Catalog.pinnedVersion(s, cat, stack,
            Some(catV)))))
        .select(lit(cut).as("cut"), lit(stack).as("stack"), col("key"),
          col("n_rows"))
    serve("mid", 1L, "a", rootA)
      .unionByName(serve("mid", 1L, "b", rootB))
      .unionByName(serve("head", head, "a", rootA))
      .unionByName(serve("head", head, "b", rootB))
      .orderBy("cut", "stack", "key")
  }

  lazy val round23: Seq[Q] = Seq(catalogWapPublish,
    catalogMaintenanceWave, catalogHistoryVacuum,
    streamingCatalogPublish)
}
