package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** One heavy-hitter: item and its (lower-bound) count. */
case class HeavyHit(item: String, cnt: Long)

/** Misra-Gries heavy-hitters sketch as a typed [[Aggregator]] (custom
  * aggregation path (b): an `Aggregator` over Catalyst encoders — no RDDs,
  * no driver collection; partial aggregation and merge happen inside
  * Spark's normal hash-agg machinery).
  *
  * At 100 TB this answers "which keys are hot?" in one pass with O(k)
  * state per partition — the prerequisite for choosing salting/AQE-skew
  * strategies ([[graft.operators.Skew]]) without a full exact count.
  *
  * Guarantees (classic Misra-Gries):
  *  - every item with true frequency > n/(k+1) is in the summary;
  *  - reported counts are lower bounds, off by at most n/(k+1);
  *  - when k >= number of distinct items the summary is EXACT (no
  *    decrement ever fires, merges are plain sums) — which also makes it
  *    deterministic and DuckDB-oracle-checkable in that regime.
  *
  * Output is sorted by (count desc, item asc) for stable comparison.
  */
class HeavyHitters(k: Int) extends Aggregator[String, Map[String, Long], Seq[HeavyHit]] {
  require(k >= 1, "k must be >= 1")

  override def zero: Map[String, Long] = Map.empty

  override def reduce(b: Map[String, Long], item: String): Map[String, Long] = {
    if (item == null) return b
    b.get(item) match {
      case Some(c) => b.updated(item, c + 1)
      case None if b.size < k => b.updated(item, 1L)
      case None =>
        // decrement-all step: every counter pays one; zeros drop out
        b.flatMap { case (i, c) => if (c > 1) Some(i -> (c - 1)) else None }
    }
  }

  override def merge(m1: Map[String, Long], m2: Map[String, Long]): Map[String, Long] = {
    val combined = m2.foldLeft(m1) { case (acc, (i, c)) =>
      acc.updated(i, acc.getOrElse(i, 0L) + c)
    }
    if (combined.size <= k) combined
    else {
      // shrink: subtract the (k+1)-th largest count from everything
      val cut = combined.values.toSeq.sorted(Ordering[Long].reverse)(k)
      combined.flatMap { case (i, c) => if (c > cut) Some(i -> (c - cut)) else None }
    }
  }

  override def finish(b: Map[String, Long]): Seq[HeavyHit] =
    b.toSeq.sortBy { case (i, c) => (-c, i) }.map { case (i, c) => HeavyHit(i, c) }

  override def bufferEncoder: Encoder[Map[String, Long]] = ExpressionEncoder()
  override def outputEncoder: Encoder[Seq[HeavyHit]] = ExpressionEncoder()
}
