package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The writer fence across REAL OS PROCESSES — the round-16/17
  * `manifest_fence_race` gate races two Hadoop `FileSystem` handles
  * inside one JVM, which a JVM-level client cache could in principle
  * mask. Here the second committer is a forked `java` process
  * ([[graft.tools.FenceRaceChild]]) with its own FS client and its
  * own in-process commit locks, so the only coordination surface is
  * the filesystem itself — exactly the 1000-executor deployment
  * shape. Load-bearing claims:
  *
  *  (1) a foreign `manifest.v=N` history file written by ANOTHER
  *      process makes this-process-blind commits LOSE the
  *      create-exclusive CAS: the child (which derived from the stale
  *      pointer) loses exactly once, ROLLS the crashed winner's
  *      pointer forward (healing the wedge), and its retry absorbs
  *      below the advanced high-water mark;
  *  (2) two committers in two DIFFERENT OS processes racing the same
  *      root both terminate, the serial history is consistent (every
  *      committed version's history file exists and parses, batch
  *      high-water nondecreasing), and the final content is the
  *      serial result regardless of which process won each CAS. */
class FenceRaceProcessSpec extends SparkSpec {
  import spark.implicits._

  private def newRoot(): String =
    java.nio.file.Files.createTempDirectory("graft_fence2_spec").toString

  /** Classpath of the compiled engine + the Spark distribution — the
    * same classes this suite runs against. */
  private def childClasspath: String = {
    val classes = new java.io.File(
      Manifest.getClass.getProtectionDomain.getCodeSource.getLocation.toURI)
    val sparkJar = new java.io.File(
      classOf[org.apache.spark.sql.SparkSession]
        .getProtectionDomain.getCodeSource.getLocation.toURI)
    s"${classes.getAbsolutePath}:${sparkJar.getParentFile.getAbsolutePath}/*"
  }

  private val addOpens = Seq(
    "java.base/java.lang", "java.base/java.lang.invoke",
    "java.base/java.lang.reflect", "java.base/java.io",
    "java.base/java.net", "java.base/java.nio",
    "java.base/java.util", "java.base/java.util.concurrent",
    "java.base/java.util.concurrent.atomic",
    "java.base/sun.nio.ch", "java.base/sun.nio.cs",
    "java.base/sun.security.action", "java.base/sun.util.calendar",
  ).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))

  private def launchChild(root: String, lo: Long, hi: Long, lang: String,
                          batchId: Long, barrier: String): Process = {
    val java = System.getProperty("java.home") + "/bin/java"
    val cmd = (Seq(java, "-Xmx2g", "-cp", childClasspath) ++ addOpens ++
      Seq("-Dspark.ui.enabled=false", "graft.tools.FenceRaceChild",
        root, lo.toString, hi.toString, lang, batchId.toString, barrier))
    new ProcessBuilder(cmd: _*)
      .redirectErrorStream(false)
      .start()
  }

  /** (ok, conflicts) parsed from the child's FENCECHILD line. */
  private def awaitChild(p: Process): (Boolean, Int) = {
    val out = new String(p.getInputStream.readAllBytes(), "UTF-8")
    val err = new String(p.getErrorStream.readAllBytes(), "UTF-8")
    assert(p.waitFor(180, java.util.concurrent.TimeUnit.SECONDS),
      "child process must terminate")
    assert(p.exitValue() == 0,
      s"child failed rc=${p.exitValue()}\nstdout:$out\nstderr:${err.takeRight(2000)}")
    val line = out.linesIterator.find(_.startsWith("FENCECHILD"))
      .getOrElse(fail(s"no FENCECHILD line in:\n$out"))
    val kv = line.split(" ").drop(1).map { t =>
      val Array(k, v) = t.split("="); k -> v }.toMap
    (kv("ok").toBoolean, kv("conflicts").toInt)
  }

  private def mkTable(): String = {
    val root = newRoot()
    TxTableStack.init(spark, root, "k LONG, lang STRING")
    assert(TxTableStack.commitBatch(spark, root,
      (0L to 9L).map(k => (k, "base")).toDF("k", "lang"),
      0L, "k", 4)) // v1
    root
  }

  test("a foreign process's history file beats a blind commit: the " +
    "child loses the CAS exactly once, heals the pointer, and absorbs") {
    val root = mkTable()
    val st = Manifest.read(spark, root).get
    // the crashed winner from "another process": its manifest.v=2 is
    // durable (same pins — a no-op maintenance commit with a higher
    // batch high-water), its pointer swap never landed
    val foreign = st.copy(version = st.version + 1,
      batchId = st.batchId + 100)
    java.nio.file.Files.write(
      java.nio.file.Paths.get(root, s"manifest.v=${foreign.version}"),
      foreign.render.getBytes("UTF-8"))
    val barrier = s"$root/_go"
    java.nio.file.Files.write(java.nio.file.Paths.get(barrier),
      Array.emptyByteArray)
    // the child derives from the stale pointer (v1), races nothing in
    // ITS JVM, and must still lose to the foreign file on disk
    val (ok, conflicts) = awaitChild(
      launchChild(root, 10L, 19L, "a", 1L, barrier))
    assert(conflicts == 1,
      s"the child must lose the create-exclusive CAS exactly once, " +
        s"lost $conflicts times")
    assert(!ok, "the retry must absorb below the foreign high-water " +
      "mark (batch 1 <= 100), not re-land")
    assert(Manifest.read(spark, root).contains(foreign),
      "the losing process must roll the crashed winner's pointer forward")
    // no data ever landed: the content is still the base batch
    assert(TxTableStack.resolve(spark, root).count() == 10L)
  }

  test("two OS processes racing the same root: both terminate, the " +
    "history chain is consistent, the serial content holds") {
    val root = mkTable()
    val barrier = s"$root/_go"
    // A: batch 1 re-images 10-19 as "a"; B: batch 2 re-images 10-29 as
    // "b". EITHER serial order ends at lang="b" for keys 10-29 (if B
    // lands first, A's lower batch id absorbs — also serial).
    val pa = launchChild(root, 10L, 19L, "a", 1L, barrier)
    val pb = launchChild(root, 10L, 29L, "b", 2L, barrier)
    Thread.sleep(500) // both children are warming; open the window
    java.nio.file.Files.write(java.nio.file.Paths.get(barrier),
      Array.emptyByteArray)
    val (_, ca) = awaitChild(pa)
    val (okB, cb) = awaitChild(pb)
    assert(okB, "batch 2 must land in every serial order")
    assert(ca <= 5 && cb <= 5, "no livelock")
    val head = Manifest.read(spark, root).get
    assert(head.version >= 2 && head.version <= 3,
      s"serial history must be v2 or v2+v3, got v${head.version}")
    assert(head.batchId == 2L, "the high-water must be batch 2")
    // every committed version's history file exists, parses, and the
    // batch high-water is nondecreasing along the chain
    val batches = (0L to head.version).map { v =>
      val h = Manifest.readAt(spark, root, v)
      assert(h.isDefined, s"history file for v$v must exist and parse")
      h.get.batchId
    }
    assert(batches == batches.sorted,
      s"batch high-water must be nondecreasing, got $batches")
    // the serial content: 0-9 base, 10-29 "b"
    val byLang = TxTableStack.resolve(spark, root)
      .groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byLang == Map("base" -> 10L, "b" -> 20L),
      s"serial content must hold regardless of CAS order, got $byLang")
  }
}
