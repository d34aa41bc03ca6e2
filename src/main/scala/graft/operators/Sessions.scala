package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Event sessionization: assign a session id per (user, gap-bounded run of
  * events). Pure window functions — one shuffle on the user key, then a
  * linear per-partition scan; the standard scalable formulation (lag +
  * running sum), no state store and no driver-side loop.
  */
object Sessions {

  /** Adds `session_id` (0-based per user) to an event frame; a new session
    * starts when the gap to the previous event exceeds `gapSeconds`. */
  def assign(events: DataFrame, userCol: String, tsCol: String,
             gapSeconds: Long = 1800L): DataFrame = {
    val w = Window.partitionBy(userCol).orderBy(tsCol)
    val prev = lag(col(tsCol), 1).over(w)
    val isNew = when(prev.isNull, 0)
      .when(col(tsCol).cast("long") - prev.cast("long") > gapSeconds, 1)
      .otherwise(0)
    events.withColumn("session_id",
      sum(isNew).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
  }

  /** Per-user session count (distinct gap-bounded runs). */
  def countPerUser(events: DataFrame, userCol: String, tsCol: String,
                   gapSeconds: Long = 1800L): DataFrame =
    assign(events, userCol, tsCol, gapSeconds)
      .groupBy(userCol)
      .agg((max(col("session_id")) + 1).as("n_sessions"))
}
