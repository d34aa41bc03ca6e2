package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** [[Lineage.truncate]]'s contract: identical results either way, and
  * the RELIABLE checkpoint path genuinely engages when the session has
  * a checkpoint dir — the cluster posture must be executable, not a
  * scaladoc promise. */
class LineageSpec extends SparkSpec {
  import spark.implicits._

  private val pairs = Seq(
    (1L, 2L), (2L, 3L), (10L, 11L), (20L, 21L), (21L, 22L))
    .toDF("a_id", "b_id")

  private def labels() =
    Dedup.connectedComponents(pairs, "a_id", "b_id")
      .as[(Long, Long)].collect().toMap

  test("connectedComponents is identical with and without a checkpoint dir") {
    val local = labels()
    val dir = java.nio.file.Files.createTempDirectory("lineage-ckpt")
    // the session is SHARED across suites (SparkSpec.session) and
    // SparkContext has no public unsetCheckpointDir, so the dir is
    // restored via the test-only spark-package bridge — without it every
    // later suite in the JVM silently switches Lineage.truncate to
    // reliable checkpoints (order-dependent cross-suite behavior)
    spark.sparkContext.setCheckpointDir(dir.toString)
    try {
      val reliable = labels()
      assert(reliable == local)
      assert(reliable == Map(1L -> 1L, 2L -> 1L, 3L -> 1L,
        10L -> 10L, 11L -> 10L, 20L -> 20L, 21L -> 20L, 22L -> 20L))
      // the reliable path must actually have written checkpoint data
      val entries = java.nio.file.Files.walk(dir)
      try assert(entries.filter(java.nio.file.Files.isRegularFile(_)).count() > 0,
        "no checkpoint files written — the reliable path did not engage")
      finally entries.close()
    } finally {
      org.apache.spark.GraftTestBridge.clearCheckpointDir(spark.sparkContext)
      graft.queries.FixtureCache.deleteRecursively(dir)
    }
  }
}
