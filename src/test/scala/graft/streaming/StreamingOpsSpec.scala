package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

class StreamingOpsSpec extends SparkSpec {
  import spark.implicits._

  test("tumblingCounts on a real stream: watermark + windowed agg") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(java.sql.Timestamp, String)]
    val df = mem.toDF().toDF("ts", "event_type")
    val q = StreamingOps.tumblingCounts(df, "ts", "event_type")
      .writeStream.format("memory").queryName("tumbling")
      .outputMode(OutputMode.Append()).start()
    mem.addData(
      (java.sql.Timestamp.valueOf("2024-01-01 10:05:00"), "click"),
      (java.sql.Timestamp.valueOf("2024-01-01 10:55:00"), "click"),
      (java.sql.Timestamp.valueOf("2024-01-01 11:05:00"), "view"))
    q.processAllAvailable()
    // advance watermark far enough to close the 10:00 window
    mem.addData((java.sql.Timestamp.valueOf("2024-01-01 14:00:00"), "click"))
    q.processAllAvailable()
    val rows = spark.table("tumbling").collect()
      .map(r => (r.getTimestamp(0).toString, r.getString(1), r.getLong(2)))
    q.stop()
    assert(rows.contains(("2024-01-01 10:00:00.0", "click", 2L)))
  }

  test("quotaPerKey: first n arrivals pass, later batches stay capped per key") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[StreamingOps.UserEvent]
    val q = StreamingOps.quotaPerKey(mem.toDS(), n = 2)
      .writeStream.format("memory").queryName("quota")
      .outputMode(OutputMode.Append()).start()
    mem.addData(
      StreamingOps.UserEvent(1L, 1000L),
      StreamingOps.UserEvent(1L, 2000L),
      StreamingOps.UserEvent(1L, 3000L),  // over quota in the same batch
      StreamingOps.UserEvent(2L, 1000L))
    q.processAllAvailable()
    // a later batch must not re-open user 1's quota; user 2 has room
    mem.addData(
      StreamingOps.UserEvent(1L, 4000L),
      StreamingOps.UserEvent(2L, 2000L),
      StreamingOps.UserEvent(2L, 3000L))
    q.processAllAvailable()
    val rows = spark.table("quota").as[StreamingOps.UserEvent].collect()
    q.stop()
    assert(rows.count(_.user == 1L) == 2)
    assert(rows.count(_.user == 2L) == 2)
  }

  test("slidingCounts: each event lands in windowLen/slide overlapping windows") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(java.sql.Timestamp, String)]
    val df = mem.toDF().toDF("ts", "event_type")
    val q = StreamingOps.slidingCounts(df, "ts", "event_type")
      .writeStream.format("memory").queryName("sliding")
      .outputMode(OutputMode.Append()).start()
    mem.addData((java.sql.Timestamp.valueOf("2024-01-01 10:05:00"), "click"))
    q.processAllAvailable()
    mem.addData((java.sql.Timestamp.valueOf("2024-01-01 15:00:00"), "view"))
    q.processAllAvailable()
    val starts = spark.table("sliding").collect()
      .filter(_.getString(1) == "click").map(_.getTimestamp(0).toString).sorted
    q.stop()
    // 10:05 is covered by the 4 windows starting 09:15..10:00
    assert(starts.toSeq == Seq("2024-01-01 09:15:00.0", "2024-01-01 09:30:00.0",
      "2024-01-01 09:45:00.0", "2024-01-01 10:00:00.0"))
  }

  test("sessionize: flatMapGroupsWithState emits closed sessions") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[StreamingOps.UserEvent]
    // NoTimeout in the unit test: ProcessingTimeTimeout keeps scheduling
    // no-data batches, which livelocks processAllAvailable()
    val q = StreamingOps.sessionize(mem.toDS(), gapMillis = 60000L,
      timeout = org.apache.spark.sql.streaming.GroupStateTimeout.NoTimeout())
      .writeStream.format("memory").queryName("sessions")
      .outputMode(OutputMode.Append()).start()
    mem.addData(
      StreamingOps.UserEvent(1L, 1000L),
      StreamingOps.UserEvent(1L, 2000L))
    q.processAllAvailable()
    // second batch: gap > 60s closes the first session
    mem.addData(StreamingOps.UserEvent(1L, 500000L))
    q.processAllAvailable()
    val rows = spark.table("sessions").as[StreamingOps.ClosedSession].collect()
    q.stop()
    assert(rows.length == 1)
    assert(rows.head == StreamingOps.ClosedSession(1L, 1000L, 2000L, 2L))
  }

  test("tokenBudgetPerKey: admits by token cost, boundary included, state persists across batches") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[StreamingOps.TokenEvent]
    val q = StreamingOps.tokenBudgetPerKey(mem.toDS(), budget = 10L)
      .writeStream.format("memory").queryName("tokbud")
      .outputMode(OutputMode.Append()).start()
    // batch 1: user 1 spends 4 + 5 = 9 (< 10 → both admitted)
    mem.addData(
      StreamingOps.TokenEvent(1L, 1000L, 1L, 4L),
      StreamingOps.TokenEvent(1L, 2000L, 2L, 5L))
    q.processAllAvailable()
    // batch 2: prior is 9 < 10 → event 3 admitted (boundary crosses the
    // budget); prior is then 15 → event 4 rejected. Only works if the
    // accumulated cost persisted across the batch boundary.
    mem.addData(
      StreamingOps.TokenEvent(1L, 3000L, 3L, 6L),
      StreamingOps.TokenEvent(1L, 4000L, 4L, 1L),
      StreamingOps.TokenEvent(2L, 1000L, 5L, 3L))
    q.processAllAvailable()
    val rows = spark.table("tokbud").as[StreamingOps.TokenEvent].collect()
    q.stop()
    assert(rows.filter(_.user == 1L).map(_.eventId).sorted.toSeq == Seq(1L, 2L, 3L))
    assert(rows.filter(_.user == 2L).map(_.eventId).toSeq == Seq(5L))
  }

  test("tokenBudgetPerKey: checkpoint restart resumes the accumulated cost, not zero") {
    // two drains over the SAME checkpoint, new files between them: run 2
    // must see run 1's accumulated spend from the state store. A state
    // loss would re-open the budget and admit both page-2 events.
    val dir = java.nio.file.Files.createTempDirectory("tokbud-resume")
    def writePage(name: String, rows: Seq[(Long, Long, Long, Long)]): Unit = {
      val w = new java.io.PrintWriter(dir.resolve(name).toFile, "UTF-8")
      rows.foreach { case (u, ts, id, tk) =>
        w.println(s"""{"user":$u,"tsMillis":$ts,"eventId":$id,"toks":$tk}""")
      }
      w.close()
    }
    // the memory sink refuses checkpoint recovery; the parquet sink is
    // the restart-capable one (same reason streaming_parquet_sink uses it)
    val pages = dir.resolve("pages"); java.nio.file.Files.createDirectories(pages)
    val out = dir.resolve("out").toString
    def drainOnce(): Seq[Long] = {
      val stream = spark.readStream
        .schema("user LONG, tsMillis LONG, eventId LONG, toks LONG")
        .json(pages.toString).as[StreamingOps.TokenEvent]
      graft.queries.StreamHarness
        .drainToParquet(StreamingOps.tokenBudgetPerKey(stream, budget = 10L).toDF(),
          dir, out)
        .as[StreamingOps.TokenEvent].collect().map(_.eventId).sorted.toSeq
    }
    writePage("pages/page0.json", Seq((1L, 1000L, 1L, 4L), (1L, 2000L, 2L, 5L)))
    assert(drainOnce() == Seq(1L, 2L)) // spend 9 of 10
    // restart: prior spend 9 < 10 admits the boundary event 3; event 4
    // must be rejected — it only is if the 9 survived the restart (a
    // reset counter would admit 3 AND 4: 0+6 < 10, 6+1 < 10)
    writePage("pages/page1.json", Seq((1L, 3000L, 3L, 6L), (1L, 4000L, 4L, 1L)))
    assert(drainOnce() == Seq(1L, 2L, 3L))
  }

  test("sessionize eviction: event-time timeout closes idle sessions via hasTimedOut") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[StreamingOps.UserEvent]
    // EventTimeTimeout requires a watermarked event-time column upstream;
    // extra columns survive .as[] (encoder binds by name)
    val events = mem.toDS()
      .withColumn("ts", timestamp_millis(col("tsMillis")))
      .withWatermark("ts", "0 seconds")
      .as[StreamingOps.UserEvent]
    val q = StreamingOps.sessionize(events, gapMillis = 60000L,
      timeout = org.apache.spark.sql.streaming.GroupStateTimeout.EventTimeTimeout())
      .writeStream.format("memory").queryName("evict")
      .outputMode(OutputMode.Append()).start()
    mem.addData(
      StreamingOps.UserEvent(1L, 1000L),
      StreamingOps.UserEvent(1L, 2000L))
    q.processAllAvailable()
    // user 1 goes idle; ANOTHER user's later events advance the watermark
    // past 2000 + gap + 1, so user 1's session must close through the
    // hasTimedOut branch — no user-1 event ever exceeds the gap inline.
    // User 2's own events stay within the gap (one open session, never
    // emitted), so eviction is the only close path exercised.
    mem.addData(StreamingOps.UserEvent(2L, 500000L))
    q.processAllAvailable()
    // one more batch: timeouts fire against the watermark committed at
    // the END of the previous batch
    mem.addData(StreamingOps.UserEvent(2L, 520000L))
    q.processAllAvailable()
    val rows = spark.table("evict").as[StreamingOps.ClosedSession].collect()
    q.stop()
    assert(rows.toSeq == Seq(StreamingOps.ClosedSession(1L, 1000L, 2000L, 2L)))
  }

  test("streamHits: arriving hit files flow through the flatten tail incrementally") {
    val dir = java.nio.file.Files.createTempDirectory("stream-hits").toFile
    def writeHits(name: String, nums: Seq[Int]): Unit = {
      val w = new java.io.PrintWriter(new java.io.File(dir, name), "UTF-8")
      nums.foreach { i =>
        w.println(s"""{"_source":{"numeroProcesso":"$i","grau":"G1","dataAjuizamento":"2023-01-0${i}T03:00:00Z"},"sort":[$i]}""")
      }
      w.close()
    }
    writeHits("page1.json", Seq(1, 2))
    val q = StreamingOps.streamHits(spark, dir.getAbsolutePath, "TJSP")
      .filter(graft.operators.Relational.withinPeriod($"data_ajuizamento",
        to_timestamp(lit("2023-01-01 00:00:00")), lit(null).cast("timestamp")))
      .select("tribunal", "numero_processo", "sort")
      .writeStream.format("memory").queryName("hits")
      .outputMode(OutputMode.Append()).start()
    q.processAllAvailable()
    assert(spark.table("hits").count() == 2)
    writeHits("page2.json", Seq(3)) // the next "page" of the cursor
    q.processAllAvailable()
    val rows = spark.table("hits").orderBy("numero_processo").collect()
    q.stop()
    assert(rows.length == 3 && rows.map(_.getString(1)).toSeq == Seq("1", "2", "3"))
    assert(rows.forall(_.getString(0) == "TJSP"))
  }

  test("dedupWithinWatermark: re-delivered keys are dropped across batches") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(java.sql.Timestamp, Long)]
    val df = mem.toDF().toDF("ts", "key")
    val q = StreamingOps.dedupWithinWatermark(df, "ts", Seq("key"), "1 hour")
      .writeStream.format("memory").queryName("dedup_stream")
      .outputMode(OutputMode.Append()).start()
    mem.addData(
      (java.sql.Timestamp.valueOf("2024-01-01 10:00:00"), 1L),
      (java.sql.Timestamp.valueOf("2024-01-01 10:01:00"), 2L))
    q.processAllAvailable()
    // batch 2: key 1 re-delivered inside the watermark → dropped; key 3 new
    mem.addData(
      (java.sql.Timestamp.valueOf("2024-01-01 10:02:00"), 1L),
      (java.sql.Timestamp.valueOf("2024-01-01 10:03:00"), 3L))
    q.processAllAvailable()
    val keys = spark.table("dedup_stream").collect().map(_.getLong(1)).sorted.toSeq
    q.stop()
    assert(keys == Seq(1L, 2L, 3L))
  }

  test("enrichStreamingHits: stream-static broadcast lookup joins each batch") {
    val dir = java.nio.file.Files.createTempDirectory("stream-enrich").toFile
    val w = new java.io.PrintWriter(new java.io.File(dir, "p1.json"), "UTF-8")
    w.println("""{"_source":{"numeroProcesso":"7","orgaoJulgador":{"codigoMunicipioIBGE":"11"}},"sort":[7]}""")
    w.println("""{"_source":{"numeroProcesso":"8","orgaoJulgador":{"codigoMunicipioIBGE":"99"}},"sort":[8]}""")
    w.close()
    val dim = Seq((11L, "Alfa"), (12L, "Beta")).toDF("CD_MUN", "NM_MUN")
    val q = StreamingOps.enrichStreamingHits(
      StreamingOps.streamHits(spark, dir.getAbsolutePath, "TJCE"), dim)
      .select("numero_processo", "municipio")
      .writeStream.format("memory").queryName("enriched_hits")
      .outputMode(OutputMode.Append()).start()
    q.processAllAvailable()
    val got = spark.table("enriched_hits").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    q.stop()
    assert(got == Map("7" -> "Alfa", "8" -> "99")) // matched → name, unmatched → raw code
  }

  test("stream-stream join: time-bounded attribution with watermarked state") {
    implicit val sqlCtx = spark.sqlContext
    val views = MemoryStream[(java.sql.Timestamp, Long, String)]
    val clicks = MemoryStream[(java.sql.Timestamp, Long, String)]
    val v = views.toDF().toDF("vts", "user", "page")
    val c = clicks.toDF().toDF("cts", "cuser", "ad")
    val joined = StreamingOps.joinWithinWindow(
      v, c, "user", "cuser", "vts", "cts", windowSec = 600)
    val q = joined.select(col("vts"), col("page"), col("ad"))
      .writeStream.format("memory").queryName("attributed")
      .outputMode(OutputMode.Append()).start()
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    clicks.addData((ts("2024-01-01 10:00:00"), 1L, "adA"),
      (ts("2024-01-01 09:00:00"), 1L, "adOld"))
    views.addData((ts("2024-01-01 10:05:00"), 1L, "home"),
      (ts("2024-01-01 10:05:00"), 2L, "other"))
    q.processAllAvailable()
    val rows = spark.table("attributed").collect()
      .map(r => (r.getString(1), r.getString(2))).toSet
    q.stop()
    // view@10:05 attributes to click@10:00 (within 600s) but NOT to the
    // 09:00 click (outside) and user 2's view matches nothing
    assert(rows == Set(("home", "adA")))
  }

  test("checkpoint resume: restart continues from the cursor, no duplicates") {
    // the reference's search_after cursor-resume (jurimetria_pipeline.py
    // :114-158) re-expressed: the checkpoint IS the cursor
    val src = java.nio.file.Files.createTempDirectory("ckpt-src").toFile
    val ckpt = java.nio.file.Files.createTempDirectory("ckpt-state").toString
    val sink = java.nio.file.Files.createTempDirectory("ckpt-sink").toString
    def writeHits(name: String, ids: Seq[Int]): Unit = {
      val w = new java.io.PrintWriter(new java.io.File(src, name), "UTF-8")
      ids.foreach(i => w.println(
        s"""{"_source":{"numeroProcesso":"$i","grau":"G1"},"sort":[$i]}"""))
      w.close()
    }
    def run(): Unit = {
      val q = StreamingOps.streamHits(spark, src.getAbsolutePath, "TJSP")
        .select("tribunal", "numero_processo", "sort")
        .writeStream.format("parquet")
        .option("path", sink).option("checkpointLocation", ckpt)
        .outputMode(OutputMode.Append()).start()
      q.processAllAvailable()
      q.stop()
    }
    writeHits("page1.json", Seq(1, 2))
    run()
    writeHits("page2.json", Seq(3, 4))
    run() // restart: page1 must NOT be reprocessed
    val nums = spark.read.parquet(sink)
      .select("numero_processo").as[String].collect().sorted.toSeq
    assert(nums == Seq("1", "2", "3", "4"))
  }

  test("batch/stream parity: tumblingCounts equals the batch histogram plan") {
    val batch = graft.Tables.events(spark, sf)
    val streamed = StreamingOps.tumblingCounts(batch, "ts", "event_type")
      .orderBy("ws", "event_type").collect()
    val direct = batch.groupBy(date_trunc("hour", $"ts").as("ws"), $"event_type")
      .agg(count(lit(1)).as("cnt")).orderBy("ws", "event_type").collect()
    assert(streamed.sameElements(direct))
  }

  test("streaming_late_drop: the watermark drops EXACTLY the closed-form late set") {
    val (out, dropped) = graft.queries.Registry8.lateDropRun(spark, sf)
    val e = graft.Tables.events(spark, sf).filter($"ts".isNotNull)
      .withColumn("q", ntile(4).over(
        org.apache.spark.sql.expressions.Window.orderBy("ts", "event_id")))
    val maxUs = e.agg(max(unix_micros($"ts"))).head().getLong(0)
    // the fixture's late set: Q3 rows whose hour window was finalized
    // when the straggler arrived — window end ≤ trunc_ms(max ts) − 1 s
    val wmUs = (maxUs / 1000L) * 1000L - 1000000L
    val lateRows = e.filter($"q" === 3 &&
      (unix_micros(date_trunc("hour", $"ts")) + 3600L * 1000000L) <= wmUs)
    val late = lateRows.count()
    assert(late > 0, "fixture produced no late rows — the gate would be vacuous")
    // the state operator sees PARTIAL-AGGREGATED rows, so its drop
    // counter counts late (window, key) GROUPS, not raw inputs
    val lateGroups = lateRows
      .select(date_trunc("hour", $"ts"), $"event_type").distinct().count()
    assert(dropped == lateGroups)
    // every late INPUT row is gone from the surviving counts
    assert(out.agg(sum("cnt")).head().getLong(0) == e.count() - late)
  }
}
