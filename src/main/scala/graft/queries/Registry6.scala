package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, Trigger}
import graft.Tables
import graft.functions.TimeFns
import graft.operators.{Dedup, Similarity}
import graft.streaming.StreamingOps

/** Round-7 additions: the wide (128-bit) SimHash signature path the
  * scale analysis prescribes (SCALE.md — 64-bit slice alphabets saturate
  * at ~10⁵–10⁶ docs/partition; 32-bit slices keep candidate growth
  * linear at 10⁸+), and the last three streaming execution paths brought
  * under the driver's oracle gate.
  */
object Registry6 {

  private def docs(s: SparkSession, d: String) = Tables.documents(s, d)

  /** Wide SimHash near-dup pairs — [[Dedup.simhashPairs]] at 128 bits /
    * 4×32-bit slices, the configuration SCALE.md prescribes for 10⁸+
    * document corpora (the 64-bit path's 16-bit slice alphabet saturates
    * on homogeneous corpora: measured 12.2× candidate growth at 10×
    * docs). Bits 32d..32d+31 come from the d-salted digest
    * md5("d:" || token), exactly as the ≤64-bit path defines them, so
    * the oracle replays the same nibble definitions with range(1, 129).
    *
    * Same pigeonhole guarantee (hamming ≤ chunks-1 ⇒ one intact slice),
    * same exact-hamming filter; only the slice alphabet widens — 2¹⁶ →
    * 2³², which is THE selectivity knob for the candidate join at
    * corpus scale. */
  val dedupSimhashWide = Q("dedup_simhash_wide",
    """WITH sigs AS (SELECT doc_id, array_to_string(list_transform(range(1, 129),
      |    p -> CASE WHEN 2 * len(list_filter(string_split(text, ' '),
      |        x -> substr(md5(CASE WHEN p <= 32 THEN x
      |                         ELSE CAST((p - 1) // 32 AS VARCHAR) || ':' || x END),
      |                    ((p - 1) % 32) + 1, 1) >= '8'))
      |        > len(string_split(text, ' '))
      |      THEN '1' ELSE '0' END), '') AS sig
      |  FROM documents),
      |ch AS (SELECT doc_id, sig, t.ci, substr(sig, t.ci * 32 + 1, 32) AS ck
      |  FROM sigs CROSS JOIN (SELECT unnest(range(0, 4)) AS ci) t),
      |cand AS (SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id,
      |    a.sig AS sa, b.sig AS sb
      |  FROM ch a JOIN ch b ON a.ci = b.ci AND a.ck = b.ck
      |    AND a.doc_id < b.doc_id)
      |SELECT a_id, b_id, hamming FROM (
      |  SELECT a_id, b_id, CAST(len(list_filter(range(1, 129),
      |    i -> substr(sa, i, 1) != substr(sb, i, 1))) AS BIGINT) AS hamming
      |  FROM cand)
      |WHERE hamming <= 3 ORDER BY a_id, b_id""".stripMargin) { (s, d) =>
    Dedup.simhashPairs(docs(s, d), "doc_id", "text",
      bits = 128, chunks = 4, maxHamming = 3)
      .orderBy("a_id", "b_id")
  }

  /** Stage `df` as JSON page files the file stream source will consume in
    * `pageCol` order: each page is written separately and its files get
    * strictly ascending modification times (the file source orders new
    * files oldest-mtime-first), so with `maxFilesPerTrigger=1` micro-batch
    * b sees exactly page b — the determinism an ORDER-SENSITIVE stateful
    * operator (sessionize, quota) needs from a drain-run fixture. The
    * order-insensitive streaming queries (window counts, dedup, inner
    * join) keep Registry5's cheaper unordered `repartition(4)` staging. */
  private[queries] def stageOrderedPages(df: DataFrame, pageCol: String, nPages: Int,
                                         buildDir: java.nio.file.Path): Unit = {
    val pages = buildDir.resolve("pages")
    java.nio.file.Files.createDirectories(pages)
    val base = System.currentTimeMillis() - 3600L * 1000
    for (q <- 0 until nPages) {
      val tmp = buildDir.resolve(s"tmp$q")
      df.filter(col(pageCol) === q).drop(pageCol)
        .repartition(1).write.mode("overwrite").json(tmp.toString)
      val parts = tmp.toFile.listFiles().toSeq
        .filter(_.getName.endsWith(".json")).sortBy(_.getName)
      parts.zipWithIndex.foreach { case (p, i) =>
        val dest = pages.resolve(s"page$q-$i.json")
        java.nio.file.Files.move(p.toPath, dest)
        java.nio.file.Files.setLastModifiedTime(dest,
          java.nio.file.attribute.FileTime.fromMillis(base + q * 60000L))
      }
      FixtureCache.deleteRecursively(tmp)
    }
  }

  /** Drain a streaming frame to completion into a memory sink and return
    * the sink table — see [[StreamHarness.drain]] for the state-partition
    * sizing rationale. */
  private def drain(df: DataFrame, stage: java.nio.file.Path,
                    mode: OutputMode): DataFrame =
    StreamHarness.drain(df, stage, mode)

  /** Stream-stream join under the gate ([[StreamingOps.joinWithinWindow]]):
    * click→view attribution within 900 s, both sides real file streams
    * consumed one page per micro-batch, so most matches pair rows that
    * arrived in DIFFERENT micro-batches — the cross-batch join state is
    * what this query exercises (the easiest place for a correctness bug
    * to hide, per the round-6 verdict).
    *
    * Watermark = the whole corpus span (drain-run discipline, exactly as
    * `streaming_dedup` documents): a bounded audit needs NO state
    * eviction — an inner time-bound join emits each match eagerly, the
    * watermark only governs when UNMATCHED state may be dropped, so the
    * full-span setting makes the drain order-insensitive. Production
    * uses watermark = max expected skew between the streams; same
    * operator, one knob.
    *
    * Oracle: the join must equal the batch time-bound join over the same
    * two event partitions — streaming adds delivery, not semantics. */
  val streamingJoinWindow = Q("streaming_join_window",
    """WITH c AS (SELECT user_id, event_id AS click_id, ts AS c_ts
      |    FROM events WHERE event_id % 2 = 1),
      |  v AS (SELECT user_id, event_id AS view_id, ts AS v_ts
      |    FROM events WHERE event_id % 2 = 0)
      |SELECT c.user_id AS c_user, click_id, view_id,
      |  strftime(c_ts, '%Y-%m-%d %H:%M:%S') AS c_time,
      |  strftime(v_ts, '%Y-%m-%d %H:%M:%S') AS v_time
      |FROM c JOIN v ON c.user_id = v.user_id
      |  AND v_ts <= c_ts AND v_ts >= c_ts - INTERVAL 900 SECONDS
      |ORDER BY click_id, view_id""".stripMargin) { (s, d) =>
    val e = Tables.events(s, d)
    // timestamps ride the JSON fixture as epoch-MICROS longs: the JSON
    // writer's default timestamp format is millisecond-precision, and a
    // truncated boundary would flip pair membership vs the micros-exact
    // oracle — integer epochs round-trip bit-exactly
    val clicks = e.filter(col("event_id") % 2 === 1)
      .select(col("user_id").as("c_user"), col("event_id").as("click_id"),
        unix_micros(col("ts")).as("c_us"))
    val views = e.filter(col("event_id") % 2 === 0)
      .select(col("user_id").as("v_user"), col("event_id").as("view_id"),
        unix_micros(col("ts")).as("v_us"))
    val fx = FixtureCache.cached(d, "sjoin", 1, Seq("events")) { tmp =>
      clicks.repartition(4).write.mode("overwrite")
        .json(tmp.resolve("clicks").toString)
      views.repartition(4).write.mode("overwrite")
        .json(tmp.resolve("views").toString)
    }
    val stage = StreamHarness.runDir("graft_sjoin")
    val cStream = s.readStream.schema("c_user LONG, click_id LONG, c_us LONG")
      .option("maxFilesPerTrigger", "1").json(fx.resolve("clicks").toString)
      .select(col("c_user"), col("click_id"), timestamp_micros(col("c_us")).as("c_ts"))
    val vStream = s.readStream.schema("v_user LONG, view_id LONG, v_us LONG")
      .option("maxFilesPerTrigger", "1").json(fx.resolve("views").toString)
      .select(col("v_user"), col("view_id"), timestamp_micros(col("v_us")).as("v_ts"))
    val joined = StreamingOps.joinWithinWindow(cStream, vStream,
      "c_user", "v_user", "c_ts", "v_ts",
      windowSec = 900, watermark = "87600 hours")
    drain(joined, stage, OutputMode.Append)
      .select(col("c_user"), col("click_id"), col("view_id"),
        TimeFns.tsString(col("c_ts")).as("c_time"),
        TimeFns.tsString(col("v_ts")).as("v_time"))
      .orderBy("click_id", "view_id")
  }

  /** Custom-state sessionization under the gate
    * ([[StreamingOps.sessionize]], flatMapGroupsWithState): 12-hour-gap
    * sessions accumulated in the state store across four time-ordered
    * micro-batches — sessions that STRADDLE a batch boundary are the
    * point (state carries the open session; ~2/3 of events extend a
    * session opened in an earlier batch at this gap).
    *
    * Drain-run determinism: pages are time-quartiles consumed in order
    * ([[stageOrderedPages]]) — sessionization is order-sensitive, so the
    * fixture must deliver per-user events in time order across batches
    * (within a batch the operator sorts). `NoTimeout` + one SENTINEL
    * event per user at corpus-max + 10 gaps closes every real session by
    * gap-exceedance (the production path: processing-time timeout closes
    * idle sessions; a bounded drain has no later processing time, so the
    * sentinel replaces the timer). Sentinel sessions themselves stay
    * open in state and are never emitted.
    *
    * Oracle: classic gaps-and-islands over the same events — per user,
    * a new island when the gap to the previous event exceeds 12 h. */
  val streamingSessionize = Q("streaming_sessionize",
    """WITH e AS (SELECT user_id AS uid, epoch_ms(ts) AS tm FROM events),
      |x AS (SELECT uid, tm, CASE WHEN LAG(tm) OVER w IS NULL
      |    OR tm - LAG(tm) OVER w > 43200000 THEN 1 ELSE 0 END AS brk
      |  FROM e WINDOW w AS (PARTITION BY uid ORDER BY tm)),
      |y AS (SELECT uid, tm, SUM(brk) OVER (PARTITION BY uid ORDER BY tm
      |    ROWS UNBOUNDED PRECEDING) AS sid FROM x)
      |SELECT uid, MIN(tm) AS ts_start, MAX(tm) AS ts_end,
      |  CAST(COUNT(*) AS BIGINT) AS n
      |FROM y GROUP BY uid, sid ORDER BY uid, ts_start""".stripMargin) { (s, d) =>
    import s.implicits._
    val gapMs = 43200000L // 12 hours
    val e = Tables.events(s, d)
      .select(col("user_id").as("user"), unix_millis(col("ts")).as("tsMillis"))
    val fx = FixtureCache.cached(d, "ssess", 1, Seq("events")) { tmp =>
      val maxTs = e.agg(max("tsMillis")).head().getLong(0)
      val real = e.withColumn("page",
        ntile(4).over(org.apache.spark.sql.expressions.Window
          .orderBy("tsMillis", "user")) - 1)
      val sentinels = e.select(col("user")).distinct()
        .select(col("user"), lit(maxTs + 10 * gapMs).as("tsMillis"),
          lit(3).as("page"))
      stageOrderedPages(real.unionByName(sentinels), "page", 4, tmp)
    }
    val stage = StreamHarness.runDir("graft_ssess")
    val stream = s.readStream.schema("user LONG, tsMillis LONG")
      .option("maxFilesPerTrigger", "1").json(fx.resolve("pages").toString)
      .as[StreamingOps.UserEvent]
    val sessions = StreamingOps.sessionize(stream, gapMs,
      org.apache.spark.sql.streaming.GroupStateTimeout.NoTimeout())
    drain(sessions.toDF(), stage, OutputMode.Append)
      .select(col("user").as("uid"), col("start").as("ts_start"),
        col("end").as("ts_end"), col("n"))
      .orderBy("uid", "ts_start")
  }

  /** Streaming per-key admission quota under the gate
    * ([[StreamingOps.quotaPerKey]], flatMapGroupsWithState counter
    * state): quota 4 per user over four arrival-ordered micro-batches of
    * exactly 2 events per user each — admission must stop MID-STREAM
    * (after batch 2 of 4), which only works if the per-key counter
    * genuinely persists across micro-batches.
    *
    * Drain-run determinism: "first n arrivals" is only well-defined
    * under a defined arrival order, so the fixture pins it — each user's
    * first 8 events (by ts, event_id) are dealt 2 per page in rank
    * order ([[stageOrderedPages]]), and the cumulative count hits the
    * quota exactly at a batch boundary, so the admitted SET is
    * independent of within-batch iterator order (which Spark does not
    * define after a shuffle).
    *
    * Oracle: the first 4 events per qualifying user — arrival order
    * equals rank order by construction, so the streaming quota must
    * equal the batch rank filter. */
  val streamingQuota = Q("streaming_quota",
    """WITH ranked AS (SELECT user_id, ts,
      |    ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn,
      |    COUNT(*) OVER (PARTITION BY user_id) AS c
      |  FROM events)
      |SELECT user_id AS uid, epoch_ms(ts) AS tm FROM ranked
      |WHERE c >= 8 AND rn <= 4 ORDER BY uid, tm""".stripMargin) { (s, d) =>
    import s.implicits._
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy("ts", "event_id")
    val first8 = Tables.events(s, d)
      .withColumn("rn", row_number().over(w))
      .withColumn("c", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy("user_id")))
      .filter(col("c") >= 8 && col("rn") <= 8)
      .select(col("user_id").as("user"), unix_millis(col("ts")).as("tsMillis"),
        ((col("rn") - 1) / 2).cast("int").as("page"))
    val fx = FixtureCache.cached(d, "squota", 1, Seq("events")) { tmp =>
      stageOrderedPages(first8, "page", 4, tmp)
    }
    val stage = StreamHarness.runDir("graft_squota")
    val stream = s.readStream.schema("user LONG, tsMillis LONG")
      .option("maxFilesPerTrigger", "1").json(fx.resolve("pages").toString)
      .as[StreamingOps.UserEvent]
    val admitted = StreamingOps.quotaPerKey(stream, 4)
    drain(admitted.toDF(), stage, OutputMode.Append)
      .select(col("user").as("uid"), col("tsMillis").as("tm"))
      .orderBy("uid", "tm")
  }

  /** Wide MinHash+LSH candidate pairs — [[Dedup.minhashCandidates]] at
    * 16 hashes / 4 bands × 4 rows, the selectivity step up from the
    * default 8/4×2 exactly as `dedup_simhash_wide` is for simhash. A
    * band collides with probability ≈ J^rows, so doubling rows-per-band
    * squares the chance-collision rate: the round-7 100× probe measured
    * the default config's candidates growing 233× for 100× docs on the
    * homogeneous corpus (the n²·J^2 chance term surfacing at 5·10⁵
    * docs), while this config stays linear at the same scale (SCALE.md).
    * Recall trades down only for pairs with J < ~0.7 — the near-dup
    * band, not the exact-dup band; size rows to corpus, as with slice
    * width. Oracle replays the identical salted-digest slice minhashes
    * with range(0, 16). */
  val dedupMinhashWide = Q("dedup_minhash_wide",
    """WITH w AS (SELECT doc_id, string_split(text, ' ') AS wl FROM documents),
      |sh AS (SELECT doc_id, list_transform(range(1, len(wl) - 1),
      |  i -> wl[i] || ' ' || wl[i+1] || ' ' || wl[i+2]) AS shl FROM w),
      |sig AS (SELECT doc_id, list_transform(range(0, 16),
      |  j -> list_min(list_transform(shl,
      |    x -> substr(md5(CAST(j // 4 AS VARCHAR) || ':' || x),
      |                CAST((j % 4) * 8 + 1 AS INT), 8)))) AS mh
      |  FROM sh),
      |bands AS (SELECT doc_id, t.bnd,
      |    md5(mh[4*t.bnd+1] || mh[4*t.bnd+2] || mh[4*t.bnd+3] || mh[4*t.bnd+4]) AS bk
      |  FROM sig CROSS JOIN (SELECT unnest(range(0, 4)) AS bnd) t)
      |SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id
      |FROM bands a JOIN bands b ON a.bnd = b.bnd AND a.bk = b.bk
      |  AND a.doc_id < b.doc_id
      |ORDER BY a_id, b_id""".stripMargin) { (s, d) =>
    Dedup.minhashCandidates(docs(s, d), "doc_id", "text",
      numHashes = 16, bands = 4)
      .orderBy("a_id", "b_id")
  }

  /** The production streaming sink under the gate: the same watermarked
    * tumbling-window count `streaming_hits_window` drains to a memory
    * sink in complete mode, drained APPEND-mode into a transactional
    * PARQUET sink and read back ([[StreamHarness.drainToParquet]]).
    * This is the semantic the memory-sink audits could not reach:
    * append mode emits a window only once its end passes the final
    * watermark (global max event time − 2 h delay), so the sink holds
    * the finalized prefix and the trailing horizon stays in state when
    * the bounded input ends — the exactly-once file-sink shape a 100 TB
    * ingest actually runs. The drain is run TWICE against the same
    * checkpoint: the second run sees no new files and must write
    * nothing (the sink's commit log is the witness — a double-write
    * would duplicate rows and fail the count oracle).
    *
    * Delivery must be time-ordered across micro-batches
    * ([[stageOrderedPages]] time-quartiles, as sessionize/quota): the
    * watermark is monotonic, so an unordered drain would leap to
    * (global max − delay) after the first batch and append mode would
    * then drop most later deliveries as late data — the complete-mode
    * drains are immune (watermarking doesn't drop there), which is why
    * they can reuse the cheaper unordered fixture and this query
    * cannot. In production the same constraint is the watermark-delay
    * sizing rule: delay ≥ max cross-partition arrival skew.
    *
    * Oracle: the batch windowed count restricted to finalized windows —
    * window end ≤ max(o_orderdate) − 2 h. */
  val streamingParquetSink = Q("streaming_parquet_sink",
    """WITH w AS (SELECT date_trunc('hour', o_orderdate) AS wstart,
      |    o_orderpriority AS classe, COUNT(*) AS cnt
      |  FROM orders WHERE o_orderdate IS NOT NULL GROUP BY 1, 2),
      |m AS (SELECT max(o_orderdate) AS mx FROM orders)
      |SELECT strftime(wstart, '%Y-%m-%d %H:%M:%S') AS ws, classe, cnt
      |FROM w, m
      |WHERE wstart + INTERVAL 1 HOUR <= mx - INTERVAL 2 HOUR
      |ORDER BY ws, classe""".stripMargin) { (s, d) =>
    val pages = FixtureCache.cached(d, "shitsord", 1, Seq("orders")) { tmp =>
      val paged = Registry5.rawHits(s, d).withColumn("page",
        ntile(4).over(org.apache.spark.sql.expressions.Window
          .orderBy(col("sort").getItem(0).asc_nulls_first)) - 1)
      stageOrderedPages(paged, "page", 4, tmp)
    }.resolve("pages").toString
    val stage = StreamHarness.runDir("graft_psink")
    val out = stage.resolve("out").toString
    def counts = {
      val parsed = StreamingOps.streamHits(s, pages, "TJX",
        Map("maxFilesPerTrigger" -> "1"))
      StreamingOps.tumblingCounts(
        parsed.filter(col("data_ajuizamento").isNotNull),
        "data_ajuizamento", "classe")
    }
    StreamHarness.drainToParquet(counts, stage, out)
    StreamHarness.drainToParquet(counts, stage, out) // exactly-once: no-op
      .select(TimeFns.tsString(col("ws")).as("ws"), col("classe"), col("cnt"))
      .orderBy("ws", "classe")
  }

  /** Stream-static enrichment under the gate
    * ([[StreamingOps.enrichStreamingHits]] — the reference's municipio
    * lookup on a live stream): the static dim broadcasts to every
    * micro-batch, no state, no watermark — the one streaming join shape
    * with zero eviction concerns, so append mode is exact regardless of
    * delivery order and the fixture can stay unordered. Customer plays
    * the municipio dim filtered to even keys, so both the matched and
    * fallback paths are live across batch boundaries.
    *
    * Oracle: the identical batch left-join + coalesce fallback. */
  val streamingEnrich = Q("streaming_enrich",
    """SELECT CAST(o_orderkey AS VARCHAR) AS numero,
      |  COALESCE(c.c_name, CAST(o_custkey AS VARCHAR)) AS municipio
      |FROM orders o LEFT JOIN (SELECT c_custkey, c_name FROM customer
      |  WHERE c_custkey % 2 = 0) c ON o.o_custkey = c.c_custkey
      |ORDER BY numero""".stripMargin) { (s, d) =>
    val pages = FixtureCache.cached(d, "senrich", 1, Seq("orders")) { tmp =>
      Tables.orders(s, d).select(
        struct(
          col("o_orderkey").cast("string").as("numeroProcesso"),
          struct(col("o_custkey").cast("string").as("codigo"),
            lit(null).cast("string").as("nome"),
            col("o_custkey").cast("string").as("codigoMunicipioIBGE"))
            .as("orgaoJulgador")
        ).as("_source"),
        array(unix_millis(col("o_orderdate"))).as("sort"))
        .repartition(4).write.mode("overwrite")
        .json(tmp.resolve("pages").toString)
    }.resolve("pages").toString
    val dim = Tables.customer(s, d)
      .filter(col("c_custkey") % 2 === 0)
      .select(col("c_custkey").as("CD_MUN"), col("c_name").as("NM_MUN"))
    val stage = StreamHarness.runDir("graft_senrich")
    val parsed = StreamingOps.streamHits(s, pages, "TJX",
      Map("maxFilesPerTrigger" -> "1"))
    val enriched = StreamingOps.enrichStreamingHits(parsed, dim)
      .select(col("numero_processo").as("numero"), col("municipio"))
    drain(enriched, stage, OutputMode.Append).orderBy("numero")
  }

  /** The sliding-window count's ACTUAL streaming run (q40 is its batch
    * face): overlapping 1 h windows sliding by 15 min over a real
    * 4-micro-batch event stream, complete-mode drain (order-insensitive
    * — watermarking neither drops nor evicts in complete mode, so the
    * cheap unordered fixture is sound, exactly as
    * `streaming_hits_window`). Every event lands in 4 windows; the
    * windowLen/slide ratio is the state-size knob SCALE.md documents.
    *
    * Oracle: q40's arithmetic window replay (epoch-aligned starts). */
  val streamingSlidingWindow = Q("streaming_sliding_window",
    """SELECT CAST(floor(epoch(ts) / 900) AS BIGINT) * 900 - 900 * t.k AS ws,
      |  event_type, COUNT(*) AS cnt
      |FROM events CROSS JOIN (SELECT unnest(range(0, 4)) AS k) t
      |WHERE ts IS NOT NULL
      |GROUP BY 1, 2 ORDER BY ws, event_type""".stripMargin) { (s, d) =>
    val pages = FixtureCache.cached(d, "sslide", 1, Seq("events")) { tmp =>
      Tables.events(s, d).filter(col("ts").isNotNull)
        .select(unix_micros(col("ts")).as("ts_us"), col("event_type"))
        .repartition(4).write.mode("overwrite")
        .json(tmp.resolve("pages").toString)
    }.resolve("pages").toString
    val stage = StreamHarness.runDir("graft_sslide")
    val stream = s.readStream.schema("ts_us LONG, event_type STRING")
      .option("maxFilesPerTrigger", "1").json(pages)
      .select(timestamp_micros(col("ts_us")).as("ts"), col("event_type"))
    val counts = StreamingOps.slidingCounts(stream, "ts", "event_type")
    drain(counts, stage, OutputMode.Complete)
      .select(col("ws").cast("long").as("ws"), col("event_type"), col("cnt"))
      .orderBy("ws", "event_type")
  }

  /** Semantic dedup (SemDeDup-shaped): cluster the embedding space with
    * a trained codebook (one ROUTED Lloyd step over lowest-id seeds,
    * [[Similarity.kmeansIterRouted]]), then drop within-cluster cosine
    * near-dups, keeping the smallest id of each pair. Differs from
    * `dedup_embedding` exactly where it matters at 100 TB: blocks are
    * LEARNED cells, not ground-truth labels — the shape that works when
    * no label column exists. Cost: both the train and the serve
    * assignment are two-level scalar projections (n × 2√C dots, corpus
    * never shuffles whole), the pair join is within-cell quadratic
    * bounded by [[Similarity.nearDupPairs]]'s block-size guard, and the
    * id⋈cell re-join rides compact ids.
    *
    * Oracle: replays the identical routed Lloyd step (fine→coarse
    * routing, corpus→coarse, within-route argmax, fixed-point means),
    * the identical routed final assignment (ties toward the higher cell
    * at both levels), within-cell pair threshold, and keep-min
    * survivorship. */
  val dedupSemantic = Q("dedup_semantic",
    s"""WITH coarsec AS (SELECT CAST(vec_id AS INT) AS ccell, embedding AS c_vec
       |  FROM embeddings WHERE vec_id < 3),
       |cent0 AS (SELECT CAST(vec_id AS INT) AS cell, embedding AS f_vec
       |  FROM embeddings WHERE vec_id < 8),
       |routed0 AS (SELECT cell, ccell, f_vec FROM (
       |  SELECT f.cell, c.ccell, f.f_vec,
       |    ROW_NUMBER() OVER (PARTITION BY f.cell
       |      ORDER BY ${RegistryExt.sqlCos("f.f_vec", "c.c_vec")} DESC, c.ccell DESC) AS rn
       |  FROM cent0 f CROSS JOIN coarsec c) WHERE rn = 1),
       |cg AS (SELECT vec_id, ccell, embedding FROM (
       |  SELECT b.vec_id, c.ccell, b.embedding,
       |    ROW_NUMBER() OVER (PARTITION BY b.vec_id
       |      ORDER BY ${RegistryExt.sqlCos("b.embedding", "c.c_vec")} DESC, c.ccell DESC) AS rn
       |  FROM embeddings b CROSS JOIN coarsec c) WHERE rn = 1),
       |asg0 AS (SELECT n_id, cell, n_vec FROM (
       |  SELECT a.vec_id AS n_id, f.cell, a.embedding AS n_vec,
       |    ROW_NUMBER() OVER (PARTITION BY a.vec_id
       |      ORDER BY ${RegistryExt.sqlCos("a.embedding", "f.f_vec")} DESC, f.cell DESC) AS rn
       |  FROM cg a JOIN routed0 f ON a.ccell = f.ccell) WHERE rn = 1),
       |dm AS (SELECT cell, i AS d,
       |    CAST(SUM(CAST(round(CAST(n_vec[i] AS DOUBLE) * 1e10) AS BIGINT)) AS DOUBLE)
       |      / 1e10 / COUNT(n_vec[i]) AS m
       |  FROM asg0 CROSS JOIN (SELECT unnest(range(1, 65)) AS i)
       |  GROUP BY cell, i),
       |cent1 AS (SELECT cell, list(m ORDER BY d) AS f_vec FROM dm GROUP BY cell),
       |routed1 AS (SELECT cell, ccell, f_vec FROM (
       |  SELECT f.cell, c.ccell, f.f_vec,
       |    ROW_NUMBER() OVER (PARTITION BY f.cell
       |      ORDER BY ${RegistryExt.sqlCos("f.f_vec", "c.c_vec")} DESC, c.ccell DESC) AS rn
       |  FROM cent1 f CROSS JOIN coarsec c) WHERE rn = 1),
       |asg AS (SELECT n_id, cell, n_vec FROM (
       |  SELECT a.vec_id AS n_id, f.cell, a.embedding AS n_vec,
       |    ROW_NUMBER() OVER (PARTITION BY a.vec_id
       |      ORDER BY ${RegistryExt.sqlCos("a.embedding", "f.f_vec")} DESC, f.cell DESC) AS rn
       |  FROM cg a JOIN routed1 f ON a.ccell = f.ccell) WHERE rn = 1),
       |pairs AS (SELECT a.n_id AS a_id, b.n_id AS b_id
       |  FROM asg a JOIN asg b ON a.cell = b.cell AND a.n_id < b.n_id
       |  WHERE ${RegistryExt.sqlCos("a.n_vec", "b.n_vec")} >= 0.3)
       |SELECT n_id AS vec_id, cell FROM asg
       |WHERE n_id NOT IN (SELECT b_id FROM pairs)
       |ORDER BY vec_id""".stripMargin) { (s, d) =>
    val e = Tables.embeddings(s, d)
    // Since round 9 the WHOLE loop is two-level and train/serve
    // consistent: the Lloyd refinement assigns through the same
    // (coarse → within-route fine) argmax the final assignment uses —
    // [[Similarity.kmeansIterRouted]]'s rationale — so no path here
    // pays the flat n × C argmax once centroids grow ∝ corpus.
    val coarse = e.filter(col("vec_id") < 3)
      .select(col("vec_id").cast("int").as("ccell"), col("embedding").as("c_vec"))
    val cent0 = e.filter(col("vec_id") < 8)
      .select(col("vec_id").cast("int").as("cell"), col("embedding").as("f_vec"))
    val cent1 = Similarity.kmeansIterRouted(e, coarse, cent0,
        "vec_id", "embedding")
      .localCheckpoint() // ≤8 rows; feeds routing + two broadcast consumers
    // (id, cell, vec) in one pass — no corpus re-join; checkpointed
    // because it feeds THREE subtrees (both nearDupPairs join sides via
    // its guard action + the outer survivor join) that Spark plans
    // independently — without it the routed-argmax assignment pass
    // runs over the corpus up to 3× (simhashPairs' rationale)
    val withCell = Similarity.ivfAssignTwoLevel(e, coarse, cent1,
        "vec_id", "embedding", keepVec = true)
      .select("vec_id", "cell", "embedding").localCheckpoint()
    val pairs = Similarity.nearDupPairs(withCell, "vec_id", "embedding",
      col("cell"), threshold = 0.3)
    withCell.join(pairs.select(col("b_id").as("vec_id")).distinct(),
        Seq("vec_id"), "left_anti")
      .select(col("vec_id"), col("cell"))
      .orderBy("vec_id")
  }

  /** Corpus-trained fluency score (the KenLM-shaped quality signal,
    * model-free): a char-bigram model is TRAINED on the corpus itself —
    * add-one-smoothed conditional counts p(c₂|c₁) = (n(c₁c₂)+1) /
    * (n(c₁·)+V) — and each document is scored by its mean conditional
    * bigram probability. Gibberish scores low against any natural
    * corpus; it is the train-apply loop of a perplexity filter in one
    * dataflow.
    *
    * Scale shape: the trained model is alphabet² count rows — it
    * BROADCASTS, so scoring is two map-side hash joins over the bigram
    * explode feeding a PLAIN hash aggregate on doc_id with map-side
    * combine: per-bigram probabilities are quantized to fixed-point
    * longs, so the per-doc sum is order-independent and needs no
    * sequential fold at all; bigram extraction is the linear-pass
    * [[graft.expressions.CharNgrams]] kernel. Rejected shapes, measured
    * at sf0.1 (final form 1.4 s): collect_list + array_sort +
    * interpreted per-doc fold (12 s); a broadcast MAP literal probed by
    * an in-array fold (16 s — `element_at` on a map column is a LINEAR
    * scan per lookup); a running-sum window over (doc_id, pos) (7 s —
    * one corpus sort whose only job was float determinism); per-position
    * `substring` extraction (5 s of O(len²) UTF-8 offset re-scans).
    *
    * Determinism without order: ln() is not correctly rounded across
    * engines (hence no log-prob), and float sums are order-dependent —
    * so each p(c₂|c₁) is the exact integer
    * (n(c₁c₂)+1) · (10¹² div (n(c₁·)+V)): the per-context scale factor
    * makes every term ≤ 10¹², a 10⁶-char document sums below 2⁶³ with
    * 9× headroom, and the quantization error is ≤ (n(c₁·)+V)/10¹² ≤
    * 10⁻⁵ relative on a [0,1] quality score. The final
    * sum/n/10¹² runs the two IEEE divisions in the same order in both
    * engines. */
  val textFluency = Q("text_fluency",
    """WITH bg AS (SELECT doc_id, n, substr(text, CAST(pos AS INT), 2) AS b
      |  FROM (SELECT doc_id, text, length(text) - 1 AS n,
      |    unnest(range(1, length(text))) AS pos FROM documents)),
      |cb AS (SELECT b, COUNT(*) AS nb FROM bg GROUP BY b),
      |cc AS (SELECT substr(b, 1, 1) AS c, COUNT(*) AS nc FROM bg GROUP BY 1),
      |v AS (SELECT COUNT(DISTINCT substr(text, CAST(i AS INT), 1)) AS nv
      |  FROM (SELECT text, unnest(range(1, length(text) + 1)) AS i
      |        FROM documents)),
      |p AS (SELECT doc_id, n,
      |    (nb + 1) * (1000000000000 // (nc + nv)) AS ps
      |  FROM bg JOIN cb USING (b)
      |    JOIN cc ON substr(bg.b, 1, 1) = cc.c CROSS JOIN v)
      |SELECT doc_id, CAST(SUM(ps) AS DOUBLE) / n / 1e12 AS fluency
      |FROM p GROUP BY doc_id, n ORDER BY doc_id""".stripMargin) { (s, d) =>
    // CharNgrams: ONE linear code-point pass per document — per-position
    // substring() re-scans the UTF-8 bytes to the code-point offset on
    // every call (O(len²)/doc), and a transform() lambda is interpreted;
    // both measured ~3× slower over the two corpus passes
    val bigrams = (t: Column) => org.apache.spark.sql.GraftExpr.col(
      graft.expressions.CharNgrams(org.apache.spark.sql.GraftExpr.expr(t), 2))
    val bg = docs(s, d)
      .filter(char_length(col("text")) >= 2) // no bigrams → no score row
      .select(col("doc_id"), (char_length(col("text")) - 1).as("n"),
        explode(bigrams(col("text"))).as("b"))
    val cb = bg.groupBy("b").agg(count(lit(1)).as("nb"))
    // context counts roll up from the bigram counts (Σ over the second
    // char) — an alphabet²-row input, not another corpus explode
    val cc = cb.groupBy(substring(col("b"), 1, 1).as("c"))
      .agg(sum("nb").as("nc"))
    val v = docs(s, d)
      .select(explode(split(col("text"), "")).as("ch"))
      .filter(char_length(col("ch")) > 0) // split("") emits a trailing ""
      .agg(count_distinct(col("ch")).as("nv"))
    bg.join(broadcast(cb), "b")
      .join(broadcast(cc), substring(col("b"), 1, 1) === col("c"))
      .crossJoin(broadcast(v))
      .select(col("doc_id"), col("n"),
        ((col("nb") + 1) * expr("CAST(1000000000000 AS BIGINT) div (nc + nv)"))
          .as("ps"))
      .groupBy("doc_id", "n")
      .agg(sum("ps").as("sp"))
      .select(col("doc_id"),
        (col("sp").cast("double") / col("n") / lit(1e12)).as("fluency"))
      .orderBy("doc_id")
  }

  /** Corpus kNN graph ([[Similarity.knnGraph]]): every vector's top-3
    * cosine neighbors within its IVF cell — the graph that duplicate
    * clustering, diversity walks, and label propagation consume. The
    * join is cell-diagonal (n_cell², never corpus²) behind the same
    * hot-cell guard as `dedup_embedding`; the rank filter plants
    * partial+final WindowGroupLimit below the exchange (q09's shape).
    * Since round 9 the corpus-wide assignment rides the two-level
    * routed argmax (3 coarse routes over the 8 fine cells) — here BOTH
    * pair-join sides are corpus-sized, so the routed path is the only
    * sub-quadratic assignment once cells grow ∝ corpus.
    *
    * Oracle: the identical two-level assignment (fine→coarse routing,
    * corpus→coarse, within-route argmax — cosine folds and
    * score-then-higher-cell ties throughout), directed within-cell
    * scoring, and (cos, id)-ranked top-3. */
  val annKnnGraph = Q("ann_knn_graph",
    s"""WITH cent0 AS (SELECT CAST(vec_id AS INT) AS cell, embedding AS f_vec
       |  FROM embeddings WHERE vec_id < 8),
       |coarse AS (SELECT CAST(vec_id AS INT) AS ccell, embedding AS c_vec
       |  FROM embeddings WHERE vec_id < 3),
       |routed AS (SELECT cell, ccell, f_vec FROM (
       |  SELECT f.cell, c.ccell, f.f_vec,
       |    ROW_NUMBER() OVER (PARTITION BY f.cell
       |      ORDER BY ${RegistryExt.sqlCos("f.f_vec", "c.c_vec")} DESC, c.ccell DESC) AS rn
       |  FROM cent0 f CROSS JOIN coarse c) WHERE rn = 1),
       |c1 AS (SELECT vec_id, ccell, embedding FROM (
       |  SELECT b.vec_id, c.ccell, b.embedding,
       |    ROW_NUMBER() OVER (PARTITION BY b.vec_id
       |      ORDER BY ${RegistryExt.sqlCos("b.embedding", "c.c_vec")} DESC, c.ccell DESC) AS rn
       |  FROM embeddings b CROSS JOIN coarse c) WHERE rn = 1),
       |asg AS (SELECT n_id, cell, n_vec FROM (
       |  SELECT a.vec_id AS n_id, f.cell, a.embedding AS n_vec,
       |    ROW_NUMBER() OVER (PARTITION BY a.vec_id
       |      ORDER BY ${RegistryExt.sqlCos("a.embedding", "f.f_vec")} DESC, f.cell DESC) AS rn
       |  FROM c1 a JOIN routed f ON a.ccell = f.ccell) WHERE rn = 1),
       |sc AS (SELECT a.n_id AS src_id, b.n_id AS nbr_id,
       |    ${RegistryExt.sqlCos("a.n_vec", "b.n_vec")} AS cos
       |  FROM asg a JOIN asg b ON a.cell = b.cell AND a.n_id <> b.n_id),
       |r AS (SELECT src_id, nbr_id, cos, CAST(ROW_NUMBER() OVER
       |  (PARTITION BY src_id ORDER BY cos DESC, nbr_id) AS BIGINT) AS rnk FROM sc)
       |SELECT src_id, nbr_id, rnk, cos FROM r WHERE rnk <= 3
       |ORDER BY src_id, rnk""".stripMargin) { (s, d) =>
    val e = Tables.embeddings(s, d)
    val cent0 = e.filter(col("vec_id") < 8)
      .select(col("vec_id").cast("int").as("cell"), col("embedding").as("c_vec"))
    val coarse = e.filter(col("vec_id") < 3)
      .select(col("vec_id").cast("int").as("ccell"), col("embedding").as("c_vec"))
    Similarity.knnGraph(e, cent0, "vec_id", "embedding", k = 3,
        coarse = Some(coarse))
      .withColumn("rnk", col("rnk").cast("long"))
      .orderBy("src_id", "rnk")
  }

  /** Cluster-balanced subsampling: at most 20 vectors per LEARNED cell,
    * drawn by the deterministic salted-hash order of
    * [[graft.operators.Sampling.quotaPerGroup]] — `sample_quota` with
    * the ground-truth `source` column replaced by IVF cells, i.e. the
    * diversity-preserving downsample that works on unlabeled corpora
    * (over-represented modes are capped, sparse modes survive whole).
    *
    * Oracle: the identical assignment + the identical md5 draw. */
  val samplePerCell = Q("sample_percell",
    s"""WITH cent0 AS (SELECT CAST(vec_id AS INT) AS cell, embedding AS c_vec
       |  FROM embeddings WHERE vec_id < 8),
       |asg AS (SELECT n_id, cell FROM (
       |  SELECT b.vec_id AS n_id, c.cell,
       |    ROW_NUMBER() OVER (PARTITION BY b.vec_id
       |      ORDER BY ${RegistryExt.sqlCos("b.embedding", "c.c_vec")} DESC, c.cell DESC) AS rn
       |  FROM embeddings b CROSS JOIN cent0 c) WHERE rn = 1)
       |SELECT n_id AS vec_id, cell FROM (
       |  SELECT n_id, cell, ROW_NUMBER() OVER (PARTITION BY cell
       |    ORDER BY md5('graft:' || CAST(n_id AS VARCHAR)), n_id) AS qrn
       |  FROM asg)
       |WHERE qrn <= 20 ORDER BY vec_id""".stripMargin) { (s, d) =>
    val e = Tables.embeddings(s, d)
    val cent0 = e.filter(col("vec_id") < 8)
      .select(col("vec_id").cast("int").as("cell"), col("embedding").as("c_vec"))
    val assigned = Similarity.ivfAssign(e, cent0, "vec_id", "embedding")
      .select("vec_id", "cell")
    graft.operators.Sampling.quotaPerGroup(assigned,
        col("cell"), col("vec_id"), n = 20)
      .orderBy("vec_id")
  }

  /** df-capped n-gram Jaccard ([[Dedup.ngramJaccardPairs]] with
    * `maxGramDf = 4`): grams shared by more than 4 documents are dropped
    * before the join and Jaccard is measured over the surviving gram
    * space — the third saturation fix of the round-7 100× probes
    * (uncapped shared-gram incidences grew 625× for 100× docs; a fixed
    * cap C bounds fan-in at (C−1)/2 per surviving gram occurrence,
    * linear by construction). The oracle replays the same df filter,
    * per-doc recount, and capped join. */
  val dedupJaccardCapped = Q("dedup_ngram_jaccard_capped",
    """WITH base AS (SELECT doc_id AS id,
      |    lang || '|' || CAST(n_chars // 100 AS VARCHAR) AS blk,
      |    list_distinct(list_transform(
      |      list_distinct(list_transform(range(1, len(string_split(text,' ')) - 1),
      |        i -> string_split(text,' ')[i] || ' ' || string_split(text,' ')[i+1]
      |             || ' ' || string_split(text,' ')[i+2])),
      |      s -> list_reduce(list_prepend(CAST(0 AS BIGINT),
      |             list_transform(range(1, length(s) + 1),
      |               ci -> CAST(ascii(s[ci]) AS BIGINT))),
      |             (x, y) -> (x * 31 + y) % 1000000007))) AS hs
      |  FROM documents),
      |ex0 AS (SELECT id, blk, unnest(hs) AS h FROM base),
      |keep AS (SELECT h FROM (SELECT h, COUNT(*) AS df FROM ex0 GROUP BY h)
      |  WHERE df <= 4),
      |exn AS (SELECT id, blk, h, CAST(COUNT(*) OVER (PARTITION BY id) AS INT) AS n
      |  FROM ex0 JOIN keep USING (h))
      |SELECT a_id, b_id, jaccard FROM (
      |  SELECT a.id AS a_id, b.id AS b_id,
      |    CAST(a.n AS INT) AS na, CAST(b.n AS INT) AS nb,
      |    CAST(COUNT(*) AS DOUBLE) AS inter,
      |    CASE WHEN CAST(a.n + b.n AS DOUBLE) - CAST(COUNT(*) AS DOUBLE) > 0.0
      |      THEN CAST(COUNT(*) AS DOUBLE)
      |           / (CAST(a.n + b.n AS DOUBLE) - CAST(COUNT(*) AS DOUBLE))
      |      ELSE 0.0 END AS jaccard
      |  FROM exn a JOIN exn b ON a.blk = b.blk AND a.h = b.h AND a.id < b.id
      |  GROUP BY a.id, b.id, a.n, b.n)
      |WHERE jaccard >= 0.02 ORDER BY a_id, b_id""".stripMargin) { (s, d) =>
    Dedup.ngramJaccardPairs(docs(s, d), "doc_id", "text",
      concat(col("lang"), lit("|"),
        floor(col("n_chars") / 100).cast("long").cast("string")),
      threshold = 0.02, maxGramDf = Some(4))
      .orderBy("a_id", "b_id")
  }

  val round7: Seq[Q] = Seq(dedupSimhashWide, streamingJoinWindow,
    streamingSessionize, streamingQuota, dedupMinhashWide,
    streamingParquetSink, streamingEnrich, streamingSlidingWindow,
    dedupSemantic, textFluency, annKnnGraph, samplePerCell,
    dedupJaccardCapped)
}
