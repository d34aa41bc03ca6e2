package graft.tools

import graft.operators.{Manifest, TxTableStack}
import org.apache.spark.sql.SparkSession

/** Subprocess body for the CROSS-OS-PROCESS writer-fence spec
  * (FenceRaceProcessSpec): a second JVM — its own Hadoop
  * `FileSystem` client, its own in-process commit locks, nothing
  * shared with the parent but the filesystem — that commits one
  * upsert batch against a table root, retrying on
  * [[Manifest.CommitConflict]] by re-calling the commit face (the
  * documented rebase: every face re-reads the manifest at entry).
  * Prints ONE machine-readable line:
  * `FENCECHILD ok=<landed> conflicts=<CAS losses>`.
  *
  * args: root keyLo keyHi lang batchId barrierFile
  *
  * The child warms its session and pre-builds the batch BEFORE
  * blocking on the barrier file, so the parent controls when the
  * race window opens. */
object FenceRaceChild {
  def main(args: Array[String]): Unit = {
    val Array(root, lo, hi, lang, batchId, barrier) = args.take(6)
    val spark = SparkSession.builder().master("local[2]")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    try {
      spark.sparkContext.setLogLevel("ERROR")
      import spark.implicits._
      val batch = (lo.toLong to hi.toLong).map(k => (k, lang))
        .toDF("k", "lang")
      batch.localCheckpoint().count() // warm scheduler + codegen
      Manifest.read(spark, root)      // warm the FS client
      while (!java.nio.file.Files.exists(
        java.nio.file.Paths.get(barrier))) Thread.sleep(10)
      var conflicts = 0
      var committed = false
      var done = false
      while (!done) {
        try {
          committed = TxTableStack.commitBatch(spark, root, batch,
            batchId.toLong, "k", buckets = 4)
          done = true
        } catch {
          case _: Manifest.CommitConflict =>
            conflicts += 1
            if (conflicts > 5) throw new IllegalStateException(
              s"livelock: $conflicts consecutive CAS losses")
        }
      }
      println(s"FENCECHILD ok=$committed conflicts=$conflicts")
    } finally spark.stop()
  }
}
