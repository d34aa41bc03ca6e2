package graft

import org.apache.spark.sql.SparkSession

/** Canonical SparkSession factory for the graft engine.
  *
  * Required semantics (every entry point must set these):
  *  - `ansi.enabled=false` — reference semantics are permissive:
  *    unparseable timestamps and failed casts null out instead of
  *    aborting (ADVICE r1; SURVEY §2 F1/F6).
  *  - `session.timeZone=UTC` — TimestampType is tz-less UTC micros;
  *    São Paulo wall-clock is derived explicitly (SURVEY §7.4.1).
  *  - `parquet.inferTimestampNTZ.enabled=false` + `nanosAsLong=true` —
  *    harness parquet carries naive ms/ns timestamps.
  *
  * Scale posture (local[32] here; the same knobs scale to a cluster):
  *  - AQE on (default): runtime coalescing, skew-join splitting, and
  *    dynamic broadcast decisions replace hand-tuned partition counts.
  *  - `shuffle.partitions` sized to cores locally; on a 1000-executor
  *    cluster raise it (or let AQE coalesce from a high initial value).
  *    The override is `-Dgraft.shuffle.partitions=N` (same pattern as
  *    `graft.stateStore`): raising partition COUNT, not heap, is how
  *    shuffle working sets stay bounded as data grows. Scan-side the
  *    analogous knob is WRITER layout — row-group size sets a per-task
  *    memory floor no partition setting can split below (measured at
  *    the 1000× relational probe, SCALE.md round 8).
  *  - All operators in this library shuffle on compact derived keys
  *    (digests, hashes, ids) — never on document bodies or vectors —
  *    so partition sizing is governed by row counts, not payload width.
  */
object GraftSession {
  def builder(cores: String): SparkSession.Builder =
    SparkSession.builder()
      .master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions",
        sys.props.getOrElse("graft.shuffle.partitions", cores))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      // Commit cost (guide §6): v2 commits each task file with ONE
      // rename instead of task-rename + job-rename — measured −4% on
      // the commit-heavy gate subset (OPTIMIZATION_r18.md). Correct on
      // any store with atomic rename (local/HDFS); an S3A deployment
      // overrides to its magic committer via this same knob family.
      .config("spark.hadoop.mapreduce.fileoutputcommitter.algorithm.version",
        sys.props.getOrElse("graft.committer.version", "2"))
      // Manifest-pinned reads enumerate O(buckets) directories per
      // family (16-64 paths); the default threshold (32) tips those
      // listings into a DISTRIBUTED listing job whose scheduling costs
      // more than the listing at any scale — pinned dir counts are
      // bounded by bucket counts, not data size. Measured −6% on the
      // same subset; override for catalogs with thousands of paths.
      .config("spark.sql.sources.parallelPartitionDiscovery.threshold",
        sys.props.getOrElse("graft.partitionDiscovery.threshold", "128"))
      // reclaim RELIABLE checkpoints once their frames are GC'd:
      // Lineage.truncate checkpoints one labels frame per CC round when
      // a checkpoint dir is set, and the default (false) leaks every one
      // of them for the life of a long-running session
      .config("spark.cleaner.referenceTracking.cleanCheckpoints", "true")
      .config("spark.ui.enabled", "false")

  /** Cores from the driver contract env (default 32 = harness shape). */
  def coresFromEnv: String = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")

  def create(): SparkSession = {
    val s = builder(coresFromEnv).getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    // graft_* SQL functions available in every engine session (the
    // spark.sql face of the custom kernels; cluster deployments can
    // equivalently set spark.sql.extensions=graft.GraftExtensions)
    GraftExtensions.registerAll(s)
    s
  }
}
