package graft.queries

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.{OutputMode, Trigger}

/** Shared drain-run harness for the oracle-gated streaming queries:
  * run a streaming frame to completion (AvailableNow, per-file triggers
  * configured by the caller's source) into a memory sink and return the
  * sink table.
  *
  * State-partition sizing: the number of state-store instances per
  * stateful operator is `spark.sql.shuffle.partitions` captured at first
  * query start. A bounded audit fixture is ~10⁵ rows across 4
  * micro-batches — at the session's 32, each store is near-empty yet
  * still writes its delta file every trigger, so the fixed per-trigger
  * cost dominates the bench number. The drain runs at 8 (full stores,
  * same results — hash partitioning by key is semantically invisible);
  * production streams with real key cardinality keep the session's
  * higher setting, and the knob scales exactly like batch shuffle
  * partitions.
  *
  * State-store provider: per-query `extraConf` can pin one (the
  * `streaming_window_rocksdb` gate runs [[rocksDbProvider]]); setting
  * the system property `graft.stateStore=rocksdb` flips EVERY drain to
  * RocksDB in one move — the full-surface re-verify documented in
  * SCALE.md runs under it. RocksDB is the 100 TB-ingest posture: state
  * lives off-heap/on-disk with incremental checkpoints, so store size
  * is bounded by disk, not executor heap — the default HDFS-backed
  * provider keeps every key in JVM heap, which a corpus-scale key
  * cardinality overruns. */
object StreamHarness {
  val drainStatePartitions = "8"

  private val runDirs = new java.util.concurrent.ConcurrentLinkedQueue[java.nio.file.Path]
  private lazy val cleanupHook: Unit =
    Runtime.getRuntime.addShutdownHook(new Thread(() =>
      runDirs.forEach(p => FixtureCache.deleteRecursively(p))))

  /** Run-scoped scratch dir (checkpoints, sinks): unlike the
    * content-keyed [[FixtureCache]] fixtures, these are per-INVOCATION
    * by design (a checkpoint encodes one run's offsets), so they are
    * registered for recursive deletion at JVM exit — bench/verify
    * sweeps run hundreds of drains per JVM and must not accumulate
    * orphaned state dirs. One hook for all dirs, registered lazily. */
  def runDir(prefix: String): java.nio.file.Path = {
    cleanupHook
    val p = java.nio.file.Files.createTempDirectory(prefix)
    runDirs.add(p)
    p
  }

  /** Spark's bundled RocksDB state-store provider (rocksdbjni ships in
    * spark/jars — no extra dependency). */
  val rocksDbProvider =
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"

  private val providerKey = "spark.sql.streaming.stateStore.providerClass"

  private def withDrainConf[A](s: org.apache.spark.sql.SparkSession,
                               extraConf: Map[String, String])(body: => A): A = {
    val wanted =
      Map("spark.sql.shuffle.partitions" -> drainStatePartitions) ++
        (if (sys.props.get("graft.stateStore").contains("rocksdb"))
           Map(providerKey -> rocksDbProvider)
         else Map.empty[String, String]) ++
        extraConf
    val prev = wanted.keys.map(k => k -> s.conf.getOption(k)).toMap
    wanted.foreach { case (k, v) => s.conf.set(k, v) }
    try body finally prev.foreach {
      case (k, Some(v)) => s.conf.set(k, v)
      case (k, None)    => s.conf.unset(k)
    }
  }

  def drain(df: DataFrame, stage: java.nio.file.Path,
            mode: OutputMode,
            extraConf: Map[String, String] = Map.empty): DataFrame =
    drainWithDrops(df, stage, mode, extraConf)._1

  /** [[drain]] plus the run's total `numRowsDroppedByWatermark` summed
    * over every stateful operator's StreamingQueryProgress — the hard
    * witness a late-data gate asserts on (a late-drop query that
    * dropped nothing is vacuous, so the gate THROWS when the count it
    * expected to be positive is zero). */
  def drainWithDrops(df: DataFrame, stage: java.nio.file.Path,
                     mode: OutputMode,
                     extraConf: Map[String, String] = Map.empty): (DataFrame, Long) = {
    val s = df.sparkSession
    val mem = stage.getFileName.toString.replaceAll("[^A-Za-z0-9_]", "_")
    var dropped = 0L
    withDrainConf(s, extraConf) {
      val run = df.writeStream.format("memory").queryName(mem)
        .outputMode(mode)
        .option("checkpointLocation", stage.resolve("ckpt").toString)
        .trigger(Trigger.AvailableNow()).start()
      run.awaitTermination()
      dropped = run.recentProgress
        .flatMap(_.stateOperators).map(_.numRowsDroppedByWatermark).sum
    }
    (s.table(mem), dropped)
  }

  /** Drain into a transactional FILE sink (the production shape the
    * memory-sink audits stand in for): append-mode only, exactly-once
    * via the sink's commit log — a re-run against the same checkpoint
    * writes nothing new, and readers ignore uncommitted files. Returns
    * the files read back. */
  def drainToParquet(df: DataFrame, stage: java.nio.file.Path,
                     outDir: String,
                     extraConf: Map[String, String] = Map.empty): DataFrame = {
    val s = df.sparkSession
    withDrainConf(s, extraConf) {
      val run = df.writeStream.format("parquet")
        .option("path", outDir)
        .outputMode(OutputMode.Append)
        .option("checkpointLocation", stage.resolve("ckpt").toString)
        .trigger(Trigger.AvailableNow()).start()
      run.awaitTermination()
    }
    s.read.parquet(outDir)
  }
}
