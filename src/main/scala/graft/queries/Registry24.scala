package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.operators.{Manifest, TxJoinViewStack, TxServeStack,
  TxTableStack}

/** Round-17 fifth wave: the materialized JOIN view
  * ([[graft.operators.TxJoinViewStack]]) — delta-join incremental view
  * maintenance across TWO upstream stacks' change feeds (the lexical
  * serve stack's doc-norm feed ⊕ the split ledger's assignment feed),
  * serving the per-split document/token admission rollup a packing
  * run reads.
  *
  * Reference (jurimetria-etl) has no materialized-view surface; these
  * are LLM-training-data extensions (brief §"Beyond the reference").
  */
object Registry24 {

  private def docs(s: SparkSession, d: String) = Tables.documents(s, d)

  /** The drained-pair fixture both gates start from: the 4-page
    * lexical drain (manifest versions 0..3 — cumulative doc_id
    * prefixes) and the 4-page split drain (versions 1..4 — odds seed,
    * then even thirds inheriting their 8-block's first odd member). */
  private def drainPair(s: SparkSession, d: String,
                        tag: String): (String, String, String) = {
    val lexRoot = Registry16.drainTxStack(s, d, s"${tag}_lex")
    val splitRoot = Registry20.drainSplitStream(s, d, s"${tag}_spl")
    val viewRoot = StreamHarness.runDir(s"${tag}_view")
      .resolve("view").toString
    (lexRoot, splitRoot, viewRoot)
  }

  /** The split every drained doc ends at, replayed closed-form: odd
    * docs (the seed page) drew their own md5 ladder; even docs
    * inherited the stored minimum member of their 8-block — the
    * block's first odd doc — except the corpus-end block with no odd
    * member (max doc_id ≡ 0 mod 8), whose lone even doc drew on its
    * own cluster label. */
  private def sqlSplitOf(key: String): String =
    s"""CASE WHEN $key % 2 = 1 THEN ${Registry19.sqlLadder(key)}
       |  WHEN $key - $key % 8 + 1 <= (SELECT m FROM mx)
       |    THEN ${Registry19.sqlLadder(s"$key - $key % 8 + 1")}
       |  ELSE ${Registry19.sqlLadder(s"$key - $key % 8")} END""".stripMargin

  /** MATERIALIZED JOIN VIEW, inner face
    * ([[TxJoinViewStack.build]]/[[TxJoinViewStack.refreshLex]]/
    * [[TxJoinViewStack.refreshSplit]]/[[TxJoinViewStack.serveTokens]]):
    * built at a MID cut pair (lexical page 1 of 3, split seed page),
    * each side then advanced to its upstream head by its OWN change
    * feed — one window spanning multiple upstream commits, applied to
    * the feed's doc buckets only, the other side's column riding
    * through — and finally a lexical TAKEDOWN (docs ≡ 3 mod 7)
    * propagated through one more feed window. Replayed windows on
    * both cursors must absorb (REQUIREd in-gate). The serve is the
    * packable-corpus rollup: docs and tokens per split over members
    * BOTH sides claim; the oracle recomputes it from the raw corpus —
    * a feed window lost or double-applied, a delete that failed to
    * null the norm, or a split column clobbered by the lexical
    * refresh each move exact token counts. */
  val viewJoinTokens = Q("view_join_tokens",
    s"""WITH mx AS (SELECT MAX(doc_id) AS m FROM documents),
       |toks AS (SELECT doc_id, term FROM (
       |  SELECT doc_id, unnest(string_split(text, ' ')) AS term
       |  FROM documents WHERE doc_id % 7 <> 3) WHERE term <> ''),
       |dlt AS (SELECT doc_id, COUNT(*) AS dl FROM toks GROUP BY 1),
       |spl AS (SELECT doc_id, ${sqlSplitOf("doc_id")} AS split
       |  FROM documents)
       |SELECT split, CAST(COUNT(*) AS BIGINT) AS n_docs,
       |  CAST(SUM(dl) AS BIGINT) AS n_tokens
       |FROM dlt JOIN spl USING (doc_id)
       |GROUP BY 1 ORDER BY 1""".stripMargin) { (s, d) =>
    val (lexRoot, splitRoot, viewRoot) = drainPair(s, d, "graft_jvt")
    TxJoinViewStack.build(s, viewRoot, lexRoot, splitRoot, buckets = 8,
      atLexVersion = Some(1L), atSplitVersion = Some(1L))
    require(TxJoinViewStack.refreshLex(s, viewRoot, lexRoot, 3L,
      lexDocBuckets = 16, buckets = 8),
      "the lexical feed window 1→3 must apply")
    require(TxJoinViewStack.refreshSplit(s, viewRoot, splitRoot, 4L,
      buckets = 8),
      "the split feed window 1→4 must apply")
    require(!TxJoinViewStack.refreshLex(s, viewRoot, lexRoot, 3L,
      lexDocBuckets = 16, buckets = 8),
      "a replayed lexical window must absorb at the cursor")
    require(!TxJoinViewStack.refreshSplit(s, viewRoot, splitRoot, 4L,
      buckets = 8),
      "a replayed split window must absorb at the cursor")
    require(TxServeStack.commitDelete(s, lexRoot,
      docs(s, d).filter(col("doc_id") % 7 === 3).select("doc_id"),
      batchId = 4L, "doc_id", docBuckets = 16, termBuckets = 16),
      "the upstream takedown must commit on the drained stack")
    require(TxJoinViewStack.refreshLex(s, viewRoot, lexRoot, 4L,
      lexDocBuckets = 16, buckets = 8),
      "the takedown feed window 3→4 must apply")
    TxJoinViewStack.serveTokens(s, viewRoot).orderBy("split")
  }

  /** MATERIALIZED JOIN VIEW, outer/audit faces + snapshot
    * ([[TxJoinViewStack.serveLag]]): built at the LAGGED pair (lexical
    * head, split seed page — every doc indexed, only odd docs
    * admitted), the audit rollup classifies members by which sides
    * claim them: `joined` (packable), `indexed_only` (the consumer
    * lag — indexed, admitted by no split). Closing the lag
    * (refreshSplit to the split head) flips every lagging member to
    * `joined`; the gate serves BOTH cuts through the manifest snapshot
    * (the lag cut at version 0, the closed cut at head) in one frame.
    * Docs the tokenizer leaves empty would surface as
    * `assigned_only` — the oracle carries the case so the gate stays
    * honest on corpora that have them. */
  val viewJoinLag = Q("view_join_lag",
    """WITH toks AS (SELECT doc_id, term FROM (
      |  SELECT doc_id, unnest(string_split(text, ' ')) AS term
      |  FROM documents) WHERE term <> ''),
      |dlt AS (SELECT doc_id, COUNT(*) AS dl FROM toks GROUP BY 1),
      |j AS (SELECT d.doc_id, t.dl FROM documents d
      |  LEFT JOIN dlt t USING (doc_id)),
      |lag AS (SELECT CASE
      |    WHEN dl IS NOT NULL AND doc_id % 2 = 1 THEN 'joined'
      |    WHEN dl IS NOT NULL THEN 'indexed_only'
      |    WHEN doc_id % 2 = 1 THEN 'assigned_only' END AS status,
      |  CAST(COUNT(*) AS BIGINT) AS n_docs,
      |  CAST(COALESCE(SUM(dl), 0) AS BIGINT) AS n_tokens
      |  FROM j GROUP BY 1),
      |cls AS (SELECT CASE WHEN dl IS NOT NULL THEN 'joined'
      |    ELSE 'assigned_only' END AS status,
      |  CAST(COUNT(*) AS BIGINT) AS n_docs,
      |  CAST(COALESCE(SUM(dl), 0) AS BIGINT) AS n_tokens
      |  FROM j GROUP BY 1)
      |SELECT 'lag' AS cut, status, n_docs, n_tokens FROM lag
      |WHERE status IS NOT NULL
      |UNION ALL
      |SELECT 'closed' AS cut, status, n_docs, n_tokens FROM cls
      |ORDER BY cut, status""".stripMargin) { (s, d) =>
    val (lexRoot, splitRoot, viewRoot) = drainPair(s, d, "graft_jvl")
    TxJoinViewStack.build(s, viewRoot, lexRoot, splitRoot, buckets = 8,
      atLexVersion = Some(3L), atSplitVersion = Some(1L))
    require(!TxJoinViewStack.refreshLex(s, viewRoot, lexRoot, 3L,
      lexDocBuckets = 16, buckets = 8),
      "the lexical cursor is already at the head — the window absorbs")
    require(TxJoinViewStack.refreshSplit(s, viewRoot, splitRoot, 4L,
      buckets = 8),
      "the lag-closing split window must apply")
    TxJoinViewStack.serveLag(s, viewRoot, version = Some(0L))
      .withColumn("cut", lit("lag"))
      .unionByName(TxJoinViewStack.serveLag(s, viewRoot)
        .withColumn("cut", lit("closed")))
      .select("cut", "status", "n_docs", "n_tokens")
      .orderBy("cut", "status")
  }

  /** TRANSACTIONAL SCHEMA EVOLUTION on the general keyed table
    * ([[TxTableStack.evolveSchema]] — a METADATA-ONLY commit): the
    * doc-metadata sidecar starts at (doc_id, lang), fills from the
    * corpus, then gains `quality DOUBLE` without touching a single
    * stored file — REQUIREd in-gate: the evolution commit re-pins
    * nothing, and the PRE-evolution snapshot still serves exactly the
    * two columns it was written for. After the evolution, a current
    * writer re-images the ≡0 mod 3 docs with their quality, a LAGGING
    * writer (the crawler that has not deployed the field) re-images
    * the ≡0 mod 5 docs under the OLD columns — null-filling quality,
    * the after-image contract — and a batch carrying a column the
    * schema does not know refuses loudly. The serve is the head cut:
    * quality is non-null exactly where the newest image carried it. */
  val tableSchemaEvolve = Q("table_schema_evolve",
    """SELECT doc_id, lang,
      |  CASE WHEN doc_id % 3 = 0 AND doc_id % 5 <> 0
      |    THEN n_chars / 100.0 END AS quality
      |FROM documents ORDER BY doc_id""".stripMargin) { (s, d) =>
    val root = StreamHarness.runDir("graft_tbl").resolve("tbl").toString
    TxTableStack.init(s, root, "doc_id LONG, lang STRING")
    require(TxTableStack.commitBatch(s, root,
      docs(s, d).select("doc_id", "lang"), 0L, "doc_id", buckets = 8),
      "the base batch must commit")
    val pinsBefore = Manifest.read(s, root).get.statsV
    require(TxTableStack.evolveSchema(s, root, "quality DOUBLE"),
      "the evolution must commit")
    require(Manifest.read(s, root).get.statsV == pinsBefore,
      "an evolution commit must be metadata-only: zero re-pins")
    require(org.apache.spark.sql.types.StructType.fromDDL(
      TxTableStack.schemaAt(s, root, Some(1L))) ==
      org.apache.spark.sql.types.StructType.fromDDL(
        "doc_id LONG, lang STRING"),
      "the pre-evolution snapshot must serve the old schema")
    require(TxTableStack.resolve(s, root, Some(1L)).columns.toSeq ==
      Seq("doc_id", "lang"),
      "the pre-evolution snapshot must carry exactly the old columns")
    require(TxTableStack.commitBatch(s, root,
      docs(s, d).filter(col("doc_id") % 3 === 0)
        .select(col("doc_id"), col("lang"),
          (col("n_chars") / lit(100.0)).as("quality")),
      1L, "doc_id", buckets = 8),
      "the current writer's batch must commit")
    require(TxTableStack.commitBatch(s, root,
      docs(s, d).filter(col("doc_id") % 5 === 0)
        .select("doc_id", "lang"),
      2L, "doc_id", buckets = 8),
      "the lagging writer's old-schema batch must commit (null-fill)")
    require(scala.util.Try(TxTableStack.commitBatch(s, root,
      docs(s, d).select(col("doc_id"), col("lang"),
        col("source").as("bogus")), 3L, "doc_id", buckets = 8)).isFailure,
      "a batch carrying an unknown column must refuse")
    TxTableStack.resolve(s, root).orderBy("doc_id")
  }

  /** CHANGE DATA FEED ACROSS AN EVOLUTION BOUNDARY
    * ([[TxTableStack.changes]]): the window opens at the two-column
    * cut and closes after the evolution, a quality back-fill (≡0 mod
    * 3), and a takedown (≡1 mod 7). The feed arrives in the CLOSING
    * cut's schema — the before-cut projects onto it, its new column
    * reading null — so a row whose ONLY difference is the
    * newly-populated column classifies `update`, takedowns classify
    * `delete` with null after-images, and rows that rode through
    * their rewritten buckets unchanged emit nothing (row equality,
    * not pin equality). */
  val tableChangesEvolved = Q("table_changes_evolved",
    """SELECT doc_id,
      |  CASE WHEN doc_id % 7 = 1 THEN NULL ELSE lang END AS lang,
      |  CASE WHEN doc_id % 7 = 1 THEN NULL
      |       WHEN doc_id % 3 = 0 THEN n_chars / 100.0 END AS quality,
      |  CASE WHEN doc_id % 7 = 1 THEN 'delete'
      |       WHEN doc_id % 3 = 0 THEN 'update' END AS change
      |FROM documents
      |WHERE doc_id % 7 = 1 OR doc_id % 3 = 0
      |ORDER BY doc_id""".stripMargin) { (s, d) =>
    val root = StreamHarness.runDir("graft_tblcdc").resolve("tbl").toString
    TxTableStack.init(s, root, "doc_id LONG, lang STRING")
    require(TxTableStack.commitBatch(s, root,
      docs(s, d).select("doc_id", "lang"), 0L, "doc_id", buckets = 8))
    require(TxTableStack.evolveSchema(s, root, "quality DOUBLE"))
    require(TxTableStack.commitBatch(s, root,
      docs(s, d).filter(col("doc_id") % 3 === 0)
        .select(col("doc_id"), col("lang"),
          (col("n_chars") / lit(100.0)).as("quality")),
      1L, "doc_id", buckets = 8))
    require(TxTableStack.commitDelete(s, root,
      docs(s, d).filter(col("doc_id") % 7 === 1).select("doc_id"),
      2L, "doc_id", buckets = 8))
    TxTableStack.changes(s, root, 1L, 4L, "doc_id").orderBy("doc_id")
  }

  /** COMMIT REBASE under the retry shell
    * ([[Manifest.withConflictRetry]]) against a REAL racing commit —
    * `manifest_fence_race`'s sibling with actual data on the line:
    * the winner commits a real batch (evens re-imaged) and crashes
    * between its two steps (history file published, pointer swap
    * never landed — simulated by rewinding the pointer to the prior
    * cut, the same play the fence gate stages). The loser, derived
    * from the stale cut, must (1) lose the create-exclusive CAS to
    * the winner's real history file, (2) roll the winner's pointer
    * forward — un-wedging the stack — and (3) REBASE: the retry shell
    * re-runs the commit face, which re-reads the head and derives
    * against the winner's pins, so the final cut is the SERIAL result
    * of both commits (REQUIREd in-gate: exactly two attempts ran).
    * The oracle replays the serial order: tri-images over even-images
    * over the base corpus. */
  val manifestCommitRebase = Q("manifest_commit_rebase",
    """SELECT doc_id, CASE WHEN doc_id % 3 = 0 THEN 'tri'
      |  WHEN doc_id % 2 = 0 THEN 'even' ELSE lang END AS lang
      |FROM documents ORDER BY doc_id""".stripMargin) { (s, d) =>
    val root = StreamHarness.runDir("graft_rebase").resolve("tbl").toString
    TxTableStack.init(s, root, "doc_id LONG, lang STRING")
    require(TxTableStack.commitBatch(s, root,
      docs(s, d).select("doc_id", "lang"), 0L, "doc_id", buckets = 8)) // v1
    require(TxTableStack.commitBatch(s, root,
      docs(s, d).filter(col("doc_id") % 2 === 0)
        .select(col("doc_id"), lit("even").as("lang")),
      1L, "doc_id", buckets = 8)) // v2: the winner's REAL commit
    // the winner's crash face: its history file manifest.v=2 is
    // durable, the pointer never reached it
    val v1 = Manifest.readAt(s, root, 1L).get
    java.nio.file.Files.write(java.nio.file.Paths.get(root, "manifest"),
      v1.render.getBytes("UTF-8"))
    var attempts = 0
    require(Manifest.withConflictRetry() {
      attempts += 1
      TxTableStack.commitBatch(s, root,
        docs(s, d).filter(col("doc_id") % 3 === 0)
          .select(col("doc_id"), lit("tri").as("lang")),
        2L, "doc_id", buckets = 8)
    }, "the rebased commit must land")
    require(attempts == 2,
      s"the loser must lose the CAS once and land on the rebase, " +
        s"ran $attempts attempts")
    require(Manifest.read(s, root).get.version == 3L,
      "the serial history must be v2 (winner) then v3 (rebase)")
    TxTableStack.resolve(s, root).orderBy("doc_id")
  }

  /** STREAMING table ingest WITH A MID-STREAM EVOLUTION — the
    * metadata sidecar's streaming face (every ledger family drains
    * through the harness), plus the deployment reality no batch gate
    * can stage: the schema changes WHILE the stream runs. Four
    * metadata pages drain through fenced [[TxTableStack.commitBatch]]
    * upserts; before page 2 the consumer evolves `quality DOUBLE`
    * (guarded idempotent — a replayed trigger must not re-evolve),
    * and pages 2-3 write the new column. The pages overlap at their
    * boundaries, so the overlap rows are re-imaged INTO the new
    * schema — the oracle's `2*qn - 10` edge is exactly the
    * after-image contract under evolution. Exactly-once REQUIREd
    * in-gate: a re-delivered page absorbs whole. */
  val streamingTableIngest = Q("streaming_table_ingest",
    """WITH q AS (SELECT (COUNT(*) // 4) AS qn FROM documents)
      |SELECT doc_id, lang,
      |  CASE WHEN doc_id >= 2 * qn - 10 THEN n_chars / 100.0 END
      |    AS quality
      |FROM documents, q ORDER BY doc_id""".stripMargin) { (s, d) =>
    val root = StreamHarness.runDir("graft_tblstr").resolve("tbl").toString
    TxTableStack.init(s, root, "doc_id LONG, lang STRING")
    val ckpt = StreamHarness.runDir("graft_tblstr_ck")
    val pages = Registry16.pagesFixture(s, d, "bmidx", "documents",
      docs(s, d), "doc_id").resolve("pages").toString
    val run = s.readStream
      .schema("doc_id LONG, text STRING, lang STRING, source STRING, n_chars LONG")
      .option("maxFilesPerTrigger", "1")
      .parquet(pages)
      .writeStream
      .foreachBatch { (b: DataFrame, id: Long) =>
        if (id >= 2 && !TxTableStack.schemaAt(s, root).contains("quality"))
          TxTableStack.evolveSchema(s, root, "quality DOUBLE")
        val rows =
          if (id >= 2) b.select(col("doc_id"), col("lang"),
            (col("n_chars") / lit(100.0)).as("quality"))
          else b.select("doc_id", "lang")
        TxTableStack.commitBatch(s, root, rows, id, "doc_id", buckets = 8)
        ()
      }
      .option("checkpointLocation", ckpt.toString)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    run.awaitTermination()
    require(!TxTableStack.commitBatch(s, root,
      docs(s, d).limit(10).select("doc_id", "lang"), 3L, "doc_id",
      buckets = 8),
      "a re-delivered page must be absorbed by the high-water mark")
    TxTableStack.resolve(s, root).orderBy("doc_id")
  }

  /** TIME TRAVEL BY BATCH ID ([[Manifest.readAsOfBatch]] — the
    * logical-clock face of [[Manifest.readAt]]'s version snapshots):
    * "the table as of nightly batch 1" resolves to the LATEST cut at
    * that high-water mark, maintenance commits included — here batch
    * 1's upsert (v3) plus a SECOND schema evolution (v4, batch
    * unchanged), but NOT batch 2's takedown (v5). REQUIREd in-gate:
    * the resolved version is 4 (a naive first-match walk would stop
    * at 3 and miss the evolution), batch 0 resolves below the first
    * evolution, a future batch resolves to the head, and a
    * pre-history batch resolves to nothing. The serve carries the
    * post-evolution `license` column all-null — written by no batch,
    * visible as of batch 1. */
  val tableReadAsofBatch = Q("table_read_asof_batch",
    """SELECT doc_id, lang,
      |  CASE WHEN doc_id % 3 = 0 THEN n_chars / 100.0 END AS quality,
      |  CAST(NULL AS VARCHAR) AS license
      |FROM documents ORDER BY doc_id""".stripMargin) { (s, d) =>
    val root = StreamHarness.runDir("graft_tblaob").resolve("tbl").toString
    TxTableStack.init(s, root, "doc_id LONG, lang STRING")      // v0
    require(TxTableStack.commitBatch(s, root,
      docs(s, d).select("doc_id", "lang"), 0L, "doc_id", buckets = 8)) // v1
    require(TxTableStack.evolveSchema(s, root, "quality DOUBLE"))      // v2
    require(TxTableStack.commitBatch(s, root,
      docs(s, d).filter(col("doc_id") % 3 === 0)
        .select(col("doc_id"), col("lang"),
          (col("n_chars") / lit(100.0)).as("quality")),
      1L, "doc_id", buckets = 8))                                      // v3
    require(TxTableStack.evolveSchema(s, root, "license STRING"))      // v4
    require(TxTableStack.commitDelete(s, root,
      docs(s, d).filter(col("doc_id") % 7 === 1).select("doc_id"),
      2L, "doc_id", buckets = 8))                                      // v5
    require(Manifest.readAsOfBatch(s, root, 0L).map(_.version)
      .contains(2L),
      "batch 0 must resolve to v2 — the first evolution rides batch " +
        "0's cut (maintenance commits keep the batch high-water)")
    val asOf1 = Manifest.readAsOfBatch(s, root, 1L).get
    require(asOf1.version == 4L,
      s"as-of batch 1 must include the maintenance commit on top " +
        s"(v4), got v${asOf1.version}")
    require(Manifest.readAsOfBatch(s, root, 99L).map(_.version)
      .contains(5L), "a future batch must resolve to the head")
    require(Manifest.readAsOfBatch(s, root, -5L).isEmpty,
      "a pre-history batch must resolve to nothing")
    TxTableStack.resolve(s, root, Some(asOf1.version)).orderBy("doc_id")
  }

  /** TABLE RE-BUCKET ([[TxTableStack.rebucket]] — the undersized-B
    * cure, `sample_split_rebucket`'s sibling on the general table):
    * after the fill and a quality back-fill under an EVOLVED schema,
    * one commit migrates the whole row family 8 → 32 buckets (schema
    * and content ride through), then a takedown commits under the NEW
    * keyspace — a delete landing in the wrong bucket numbering would
    * leave its victim alive, which the oracle's row set catches. */
  val tableRebucket = Q("table_rebucket",
    """SELECT doc_id, lang,
      |  CASE WHEN doc_id % 3 = 0 THEN n_chars / 100.0 END AS quality
      |FROM documents WHERE doc_id % 7 <> 1
      |ORDER BY doc_id""".stripMargin) { (s, d) =>
    val root = StreamHarness.runDir("graft_tblrb").resolve("tbl").toString
    TxTableStack.init(s, root, "doc_id LONG, lang STRING")
    require(TxTableStack.commitBatch(s, root,
      docs(s, d).select("doc_id", "lang"), 0L, "doc_id", buckets = 8))
    require(TxTableStack.evolveSchema(s, root, "quality DOUBLE"))
    require(TxTableStack.commitBatch(s, root,
      docs(s, d).filter(col("doc_id") % 3 === 0)
        .select(col("doc_id"), col("lang"),
          (col("n_chars") / lit(100.0)).as("quality")),
      1L, "doc_id", buckets = 8))
    require(TxTableStack.rebucket(s, root, "doc_id", newBuckets = 32),
      "the migration must commit")
    require(TxTableStack.commitDelete(s, root,
      docs(s, d).filter(col("doc_id") % 7 === 1).select("doc_id"),
      2L, "doc_id", buckets = 32),
      "the post-migration takedown must commit under the new keyspace")
    TxTableStack.resolve(s, root).orderBy("doc_id")
  }

  /** STREAMING join-view consumer loop — producer AND consumer in one
    * foreachBatch ([[TxJoinViewStack.refreshSplit]] chasing
    * [[graft.operators.TxSplitStack.commitAssign]] trigger by
    * trigger): the view builds at (lexical head ⊕ the EMPTY split
    * ledger) — every doc `indexed_only` — then accretes the whole
    * assignment side from multi-commit feed windows — the consumer
    * runs at HALF the producer's cadence, each refresh batching two
    * upstream versions into one fenced commit (the amortization the
    * cursor design buys: per-trigger protocol cost was this gate's
    * dominant wall, and the feed is pin-diff-bounded either way) —
    * never re-reading either upstream. The serve is the
    * packable rollup plus the closed-lag witness (REQUIREd: zero
    * `indexed_only`/`assigned_only` members remain). Same split
    * algebra as `streaming_split_assign`'s oracle — seed odds draw,
    * arriving evens inherit their 8-block's first odd. */
  val streamingViewJoin = Q("streaming_view_join",
    s"""WITH mx AS (SELECT MAX(doc_id) AS m FROM documents),
       |toks AS (SELECT doc_id, term FROM (
       |  SELECT doc_id, unnest(string_split(text, ' ')) AS term
       |  FROM documents) WHERE term <> ''),
       |dlt AS (SELECT doc_id, COUNT(*) AS dl FROM toks GROUP BY 1),
       |spl AS (SELECT doc_id, ${sqlSplitOf("doc_id")} AS split
       |  FROM documents)
       |SELECT split, CAST(COUNT(*) AS BIGINT) AS n_docs,
       |  CAST(SUM(dl) AS BIGINT) AS n_tokens
       |FROM dlt JOIN spl USING (doc_id)
       |GROUP BY 1 ORDER BY 1""".stripMargin) { (s, d) =>
    import graft.operators.TxSplitStack
    val lexRoot = Registry16.drainTxStack(s, d, "graft_svj_lex")
    val run = StreamHarness.runDir("graft_svj")
    val splitRoot = run.resolve("ledger").toString
    val viewRoot = run.resolve("view").toString
    TxSplitStack.init(s, splitRoot)
    TxJoinViewStack.build(s, viewRoot, lexRoot, splitRoot, buckets = 8)
    val corpus = docs(s, d)
    val singles = corpus.select(col("doc_id").as("id"),
      col("doc_id").as("cluster"))
    val blocks = corpus.select(col("doc_id").as("id"),
      (col("doc_id") - col("doc_id") % 8).as("cluster"))
    val splits3 = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)
    val q = s.readStream.schema("doc_id LONG")
      .option("maxFilesPerTrigger", "1")
      .parquet(Registry20.splitPagesFixture(s, d)
        .resolve("pages").toString)
      .writeStream
      .foreachBatch { (b: DataFrame, id: Long) =>
        TxSplitStack.commitAssign(s, splitRoot, b,
          if (id == 0L) singles else blocks, id, "doc_id", splits3,
          buckets = 8)
        // AMORTIZED consumer cadence (round-18): the producer must
        // commit per trigger (exactly-once per page), but the view's
        // refreshSplit advances its cursor across EVERY upstream
        // version in the window in ONE fenced commit — so the
        // consumer runs at half the producer's cadence, halving the
        // per-trigger fence pair that dominated this gate's wall
        // (the closing refresh below catches a trailing odd window).
        if (id % 2 == 1)
          TxJoinViewStack.refreshSplit(s, viewRoot, splitRoot,
            Manifest.read(s, splitRoot).get.version, buckets = 8)
        ()
      }
      .option("checkpointLocation", run.resolve("ckpt").toString)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    // drain the trailing window (absorbs as a replay when the last
    // in-stream refresh already reached the split head)
    TxJoinViewStack.refreshSplit(s, viewRoot, splitRoot,
      Manifest.read(s, splitRoot).get.version, buckets = 8)
    val lag = TxJoinViewStack.serveLag(s, viewRoot)
      .filter(col("status") =!= "joined").count()
    require(lag == 0L,
      s"the drained stream must close the lag — $lag members remain")
    TxJoinViewStack.serveTokens(s, viewRoot).orderBy("split")
  }

  /** TYPE-WIDENING EVOLUTION ([[TxTableStack.evolveWiden]] —
    * metadata-only type promotion, the add-column face's sibling):
    * the `views` counter starts INT, fills from the corpus, then
    * promotes to BIGINT in one pointer swap (zero re-pins, REQUIREd)
    * — after which a writer lands values PAST the int range (n_chars
    * × 10⁹), the overflow that forced the promotion. Old buckets'
    * int-typed files read widened for free (the by-name projection
    * casts); the pre-widening snapshot still serves INT; narrowing
    * and non-numeric promotion refuse loudly. */
  val tableTypeWiden = Q("table_type_widen",
    """SELECT doc_id,
      |  CASE WHEN doc_id % 3 = 0 THEN n_chars * 1000000000
      |       ELSE CAST(n_chars % 1000 AS BIGINT) END AS views
      |FROM documents ORDER BY doc_id""".stripMargin) { (s, d) =>
    val root = StreamHarness.runDir("graft_tblwd").resolve("tbl").toString
    TxTableStack.init(s, root, "doc_id LONG, views INT")
    require(TxTableStack.commitBatch(s, root,
      docs(s, d).select(col("doc_id"),
        (col("n_chars") % 1000).cast("int").as("views")),
      0L, "doc_id", buckets = 8))                                  // v1
    val pinsBefore = Manifest.read(s, root).get.statsV
    require(TxTableStack.evolveWiden(s, root, "views", "BIGINT"))  // v2
    require(Manifest.read(s, root).get.statsV == pinsBefore,
      "a type promotion must be metadata-only: zero re-pins")
    require(org.apache.spark.sql.types.StructType.fromDDL(
      TxTableStack.schemaAt(s, root, Some(1L))) ==
      org.apache.spark.sql.types.StructType.fromDDL(
        "doc_id LONG, views INT"),
      "the pre-widening snapshot must serve the narrow type")
    require(scala.util.Try(TxTableStack.evolveWiden(s, root, "views",
      "INT")).isFailure, "narrowing must refuse")
    require(scala.util.Try(TxTableStack.evolveWiden(s, root, "views",
      "STRING")).isFailure, "non-numeric promotion must refuse")
    require(TxTableStack.commitBatch(s, root,
      docs(s, d).filter(col("doc_id") % 3 === 0)
        .select(col("doc_id"),
          (col("n_chars") * lit(1000000000L)).as("views")),
      1L, "doc_id", buckets = 8),
      "the post-promotion batch must land values past the int range")
    TxTableStack.resolve(s, root).orderBy("doc_id")
  }

  /** CONDITIONAL UPSERT — MERGE INTO ([[TxTableStack.commitMerge]]):
    * seed the even docs (lang stored UPPERCASED, so the keep-stored
    * default is observable), then merge the thirds with an ADDITIVE
    * views rule (`s.views + b.views`) and a replace rule on
    * last_source (batch carries a `-b1` suffix). Every row class is
    * distinguishable in the output: matched (doc_id ≡ 0 mod 6) shows
    * doubled views + upper lang + suffixed source; inserts (thirds
    * not even) show batch values verbatim; ride-throughs (evens not
    * thirds) show seed values. The replayed merge must absorb at the
    * batch high-water — the additive rule is exactly the
    * non-idempotent face replay protection exists for. */
  val tableMergeUpsert = Q("table_merge_upsert",
    """WITH seed AS (
      |  SELECT doc_id, upper(lang) AS lang, n_chars AS views,
      |         source AS last_source
      |  FROM documents WHERE doc_id % 2 = 0),
      |delta AS (
      |  SELECT doc_id, lang, n_chars AS views,
      |         source || '-b1' AS last_source
      |  FROM documents WHERE doc_id % 3 = 0)
      |SELECT coalesce(s.doc_id, b.doc_id) AS doc_id,
      |  CASE WHEN s.doc_id IS NOT NULL THEN s.lang
      |       ELSE b.lang END AS lang,
      |  CASE WHEN s.doc_id IS NOT NULL AND b.doc_id IS NOT NULL
      |       THEN s.views + b.views
      |       WHEN s.doc_id IS NOT NULL THEN s.views
      |       ELSE b.views END AS views,
      |  CASE WHEN b.doc_id IS NOT NULL THEN b.last_source
      |       ELSE s.last_source END AS last_source
      |FROM seed s FULL OUTER JOIN delta b ON s.doc_id = b.doc_id
      |ORDER BY doc_id""".stripMargin) { (s, d) =>
    val root = StreamHarness.runDir("graft_tblm").resolve("tbl").toString
    TxTableStack.init(s, root,
      "doc_id LONG, lang STRING, views BIGINT, last_source STRING")
    require(TxTableStack.commitBatch(s, root,
      docs(s, d).filter(col("doc_id") % 2 === 0)
        .select(col("doc_id"), upper(col("lang")).as("lang"),
          col("n_chars").as("views"), col("source").as("last_source")),
      0L, "doc_id", buckets = 8), "the seed batch must commit")
    val delta = docs(s, d).filter(col("doc_id") % 3 === 0)
      .select(col("doc_id"), col("lang"), col("n_chars").as("views"),
        concat(col("source"), lit("-b1")).as("last_source"))
    val rules = Map("views" -> "s.views + b.views",
      "last_source" -> "b.last_source")
    require(TxTableStack.commitMerge(s, root, delta, 1L, "doc_id",
      buckets = 8, onMatched = rules), "the merge must commit")
    require(!TxTableStack.commitMerge(s, root, delta, 1L, "doc_id",
      buckets = 8, onMatched = rules),
      "the replayed merge must absorb — the additive rule would " +
        "double-apply otherwise")
    require(scala.util.Try(TxTableStack.commitMerge(s, root, delta, 2L,
      "doc_id", buckets = 8,
      onMatched = Map("bogus" -> "1"))).isFailure,
      "a rule naming an unknown column must refuse")
    require(scala.util.Try(TxTableStack.commitMerge(s, root, delta, 2L,
      "doc_id", buckets = 8,
      onMatched = Map("doc_id" -> "b.doc_id"))).isFailure,
      "a rule on the key column must refuse")
    TxTableStack.resolve(s, root).orderBy("doc_id")
  }

  lazy val round24: Seq[Q] = Seq(viewJoinTokens, viewJoinLag,
    tableSchemaEvolve, tableChangesEvolved, manifestCommitRebase,
    streamingTableIngest, tableReadAsofBatch, tableRebucket,
    streamingViewJoin, tableTypeWiden, tableMergeUpsert)
}
