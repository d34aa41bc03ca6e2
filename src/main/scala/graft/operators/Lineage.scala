package graft.operators

import org.apache.spark.sql.DataFrame

/** Lineage truncation for iterative / multi-consumer operators.
  *
  * Label propagation re-derives its frame every round and the
  * signature/assignment frames feed several independent subtrees; both
  * need the plan CUT, not cached — otherwise the lineage (and the
  * re-execution risk) grows with the iteration count. Locally
  * `localCheckpoint()` is right (executor-block storage, no
  * configuration); on a cluster executor loss would lose those blocks
  * mid-job, so production sets `sparkContext.setCheckpointDir` to
  * reliable storage and every operator below upgrades to a RELIABLE
  * checkpoint automatically — the cluster posture the scaladocs
  * promise, executable rather than advisory. */
object Lineage {
  /** Reliable `checkpoint()` when the session has a checkpoint dir,
    * `localCheckpoint()` otherwise. Both are eager: the frame is
    * materialized once, here, and every consumer reads the result. */
  def truncate(df: DataFrame): DataFrame =
    if (df.sparkSession.sparkContext.getCheckpointDir.isDefined) df.checkpoint()
    else df.localCheckpoint()
}
