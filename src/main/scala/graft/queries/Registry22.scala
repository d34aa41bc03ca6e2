package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.operators.{Manifest, TxSketchStack, TxViewStack}

/** Round-17 third wave: the change feeds' DOWNSTREAM CONSUMER — a
  * materialized group-rollup view ([[graft.operators.TxViewStack]])
  * maintained from [[graft.operators.TxSketchStack.changes]] windows
  * alone, its snapshot face, and its streaming refresh loop.
  *
  * Reference (jurimetria-etl) has none of these surfaces; they are
  * LLM-training-data extensions (brief §"Beyond the reference").
  */
object Registry22 {

  /** The view's grouping — a pure function of the key, replayable in
    * SQL as CAST(LENGTH(key) AS VARCHAR). Key lengths cluster the
    * event types non-trivially: {click, error} share 5, signup (and
    * the CDC wave's synthetic zz_new) sit at 6 — so group rollups
    * exercise real cross-member sketch unions, not 1-member echoes. */
  private val grpOf: Column => Column = c => length(c).cast("string")

  private def grpSql(key: String) = s"CAST(LENGTH($key) AS VARCHAR)"

  /** Exact per-group twin of [[TxViewStack.serveRollup]] over a
    * (key, user_id) corpus cut, with the ±5% estimate witness —
    * full-outer so a group leaked or lost by the view maintenance
    * surfaces as a null row, never as a silently-shrunk join. */
  private def viewWitness(serve: DataFrame, cut: DataFrame): DataFrame = {
    val exact = cut.groupBy(grpOf(col("key")).as("grp"))
      .agg(count_distinct(col("user_id")).as("exact_users"))
    serve.join(exact, Seq("grp"), "full_outer")
      .select(col("grp"), col("n_keys"), col("n_rows"),
        col("exact_users"),
        (abs(col("est") - col("exact_users")) <=
          col("exact_users") * lit(0.05)).as("est_ok"))
      .orderBy("grp")
  }

  /** The CDC head cut as a (key, user_id) frame: the corpus after
    * [[Registry21.cdcMutations]] — error dropped, withdrawn click
    * users excluded, the synthetic zz_new key appended. */
  private def cdcHeadCut(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
    ev.filter(col("event_type") =!= "error" &&
        !(col("event_type") === "click" && col("user_id") % 10 === 0))
      .select(col("event_type").as("key"), col("user_id"))
      .unionByName(ev.filter(col("event_id") < 7)
        .select(lit("zz_new").as("key"), col("user_id")))
  }

  private val sqlCdcHead =
    """SELECT event_type AS key, user_id FROM events
      |      WHERE event_type <> 'error'
      |        AND NOT (event_type = 'click' AND user_id % 10 = 0)
      |      UNION ALL
      |      SELECT 'zz_new' AS key, user_id FROM events
      |      WHERE event_id < 7""".stripMargin

  /** FEED-MAINTAINED GROUP ROLLUP ([[TxViewStack.refresh]]): the view
    * materializes at the drain's 2-page cut (one full upstream pass —
    * the last it ever takes), then advances to the drain head and
    * through the CDC mutation wave (key-replace shrinking group "5",
    * the zz_new arrival growing group "6") by feed windows alone —
    * counts by delta, shrunk groups by re-union over the group's
    * member mirror, O(feed + touched-group buckets) per refresh. The
    * serve must equal the head corpus's exact group profile: a feed
    * window lost, double-applied, or a delete left in the mirror
    * moves `n_rows`/`n_keys` exactly, and a stale shrunk sketch
    * (union-only maintenance — the bug this stack's design exists to
    * avoid) pushes `est` past the ±5% witness because the withdrawn
    * click users are 10% of the group. */
  val viewGroupRollup = Q("view_group_rollup",
    s"""WITH head AS ($sqlCdcHead)
       |SELECT ${grpSql("key")} AS grp,
       |  CAST(COUNT(DISTINCT key) AS BIGINT) AS n_keys,
       |  CAST(COUNT(*) AS BIGINT) AS n_rows,
       |  CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_users,
       |  TRUE AS est_ok
       |FROM head GROUP BY 1 ORDER BY grp""".stripMargin) { (s, d) =>
    val root = Registry19.drainSketchStack(s, d, "graft_viewroll")
    val viewRoot = StreamHarness.runDir("graft_viewroll_v")
      .resolve("view").toString
    TxViewStack.build(s, viewRoot, root, grpOf, buckets = 4,
      atVersion = Some(2L))
    require(TxViewStack.refresh(s, viewRoot, root,
      Manifest.read(s, root).get.version, grpOf, buckets = 4),
      "the drain-head refresh window must commit")
    val head = Registry21.cdcMutations(s, d, root)
    require(TxViewStack.refresh(s, viewRoot, root, head, grpOf,
      buckets = 4), "the CDC-wave refresh window must commit")
    viewWitness(TxViewStack.serveRollup(s, viewRoot), cdcHeadCut(s, d))
  }

  /** VIEW TIME TRAVEL ([[TxViewStack.serveRollup]] at a snapshot
    * `version`): after both refresh windows land, version 0 — the
    * build cut — must still serve exactly the 2-page group profile
    * (per-bucket MVCC: a refresh writes REPLACEMENT buckets at fresh
    * versions, it never touches the cut a snapshot reader holds). The
    * oracle replays the 2-page corpus algebra by group. */
  val viewSnapshotRollup = Q("view_snapshot_rollup",
    s"""WITH q AS (SELECT (COUNT(*) // 4) AS qn FROM events),
       |cut AS (SELECT event_type AS key, user_id FROM events, q
       |        WHERE event_id < 2 * q.qn)
       |SELECT ${grpSql("key")} AS grp,
       |  CAST(COUNT(DISTINCT key) AS BIGINT) AS n_keys,
       |  CAST(COUNT(*) AS BIGINT) AS n_rows,
       |  CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_users,
       |  TRUE AS est_ok
       |FROM cut GROUP BY 1 ORDER BY grp""".stripMargin) { (s, d) =>
    val root = Registry19.drainSketchStack(s, d, "graft_viewsnap")
    val viewRoot = StreamHarness.runDir("graft_viewsnap_v")
      .resolve("view").toString
    TxViewStack.build(s, viewRoot, root, grpOf, buckets = 4,
      atVersion = Some(2L))
    require(TxViewStack.refresh(s, viewRoot, root,
      Manifest.read(s, root).get.version, grpOf, buckets = 4),
      "the drain-head refresh window must commit")
    val head = Registry21.cdcMutations(s, d, root)
    require(TxViewStack.refresh(s, viewRoot, root, head, grpOf,
      buckets = 4), "the CDC-wave refresh window must commit")
    val qn = Tables.events(s, d).count() / 4
    val cut = Tables.events(s, d).filter(col("event_id") < 2 * qn)
      .select(col("event_type").as("key"), col("user_id"))
    viewWitness(
      TxViewStack.serveRollup(s, viewRoot, version = Some(0L)), cut)
  }

  /** STREAMING VIEW REFRESH — the consumer loop streaming-native: each
    * micro-batch commits the upstream profile
    * ([[TxSketchStack.commitBatch]]) and, in the same foreachBatch,
    * advances the view to the fresh upstream head by its feed window —
    * producer and consumer exactly-once under ONE replay discipline
    * (a replayed batch skips the upstream commit by batch-id
    * high-water, leaves the head unmoved, and the view refresh to an
    * already-consumed version skips whole). The view starts EMPTY at
    * upstream version 0 — no full pass ever happens; the entire
    * mirror accretes from feeds. Serve must equal the full corpus's
    * exact group profile, cross-member union included (group "5" =
    * click ∪ error). */
  val streamingViewRefresh = Q("streaming_view_refresh",
    s"""SELECT ${grpSql("event_type")} AS grp,
       |  CAST(COUNT(DISTINCT event_type) AS BIGINT) AS n_keys,
       |  CAST(COUNT(*) AS BIGINT) AS n_rows,
       |  CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_users,
       |  TRUE AS est_ok
       |FROM events GROUP BY 1 ORDER BY grp""".stripMargin) { (s, d) =>
    val run = StreamHarness.runDir("graft_viewstream")
    val root = run.resolve("stack").toString
    val viewRoot = run.resolve("view").toString
    TxSketchStack.init(s, root)
    TxViewStack.build(s, viewRoot, root, grpOf, buckets = 4)
    val stream = s.readStream
      .schema("event_id LONG, user_id LONG, event_type STRING")
      .option("maxFilesPerTrigger", "1")
      .parquet(Registry19.eventPagesFixture(s, d).resolve("pages").toString)
    val q = stream.writeStream
      .foreachBatch { (b: DataFrame, id: Long) =>
        TxSketchStack.commitBatch(s, root, b, id, "event_type",
          "user_id", buckets = 8)
        TxViewStack.refresh(s, viewRoot, root,
          Manifest.read(s, root).get.version, grpOf, buckets = 4)
        ()
      }
      .option("checkpointLocation", run.resolve("ckpt").toString)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val cut = Tables.events(s, d)
      .select(col("event_type").as("key"), col("user_id"))
    viewWitness(TxViewStack.serveRollup(s, viewRoot), cut)
  }

  lazy val round22: Seq[Q] = Seq(viewGroupRollup, viewSnapshotRollup,
    streamingViewRefresh)
}
