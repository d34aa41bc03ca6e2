package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.sql.Timestamp

class TemporalSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("asofJoinBackward: latest right row at or before each left ts, per key") {
    val left = Seq(
      (1L, 10L, ts("2024-01-01 10:00:00")),  // after two quotes
      (2L, 10L, ts("2024-01-01 08:30:00")),  // between the quotes
      (3L, 10L, ts("2024-01-01 07:00:00")),  // before any quote → null
      (4L, 20L, ts("2024-01-01 12:00:00"))   // other key, exact-ts tie
    ).toDF("id", "k", "t")
    val right = Seq(
      (10L, ts("2024-01-01 08:00:00"), 100L),
      (10L, ts("2024-01-01 09:00:00"), 200L),
      (20L, ts("2024-01-01 12:00:00"), 300L)  // exactly at left ts → matches
    ).toDF("k", "rt", "v")
    val out = Temporal.asofJoinBackward(left, right, "k", "t", "rt", Seq("v"))
      .select("id", "v").as[(Long, Option[Long])].collect().toMap
    assert(out(1L).contains(200L))
    assert(out(2L).contains(100L))
    assert(out(3L).isEmpty)
    assert(out(4L).contains(300L))
  }

  test("asofJoinBackwardWithin: stale matches null out, fresh ones survive, rows preserved") {
    val left = Seq(
      (1L, 10L, ts("2024-01-01 10:00:00")),  // 1h after the 09:00 quote → stale
      (2L, 10L, ts("2024-01-01 09:10:00")),  // 10 min after → fresh
      (3L, 10L, ts("2024-01-01 07:00:00"))   // no match at all → null
    ).toDF("id", "k", "t")
    val right = Seq((10L, ts("2024-01-01 09:00:00"), 200L)).toDF("k", "rt", "v")
    val out = Temporal.asofJoinBackwardWithin(left, right, "k", "t", "rt",
      Seq("v"), toleranceSec = 1800L)
      .select("id", "v").as[(Long, Option[Long])].collect().toMap
    assert(out.size == 3)                  // every left row preserved
    assert(out(1L).isEmpty)                // matched but stale → nulled
    assert(out(2L).contains(200L))         // inside the tolerance
    assert(out(3L).isEmpty)                // never matched
  }

  test("asofJoinBackward preserves every left row and all left columns") {
    val left = Seq((1L, 5L, ts("2024-01-01 00:00:00"), "x")).toDF("id", "k", "t", "tag")
    val right = Seq((99L, ts("2024-01-01 00:00:00"), 1L)).toDF("k", "rt", "v")
    val out = Temporal.asofJoinBackward(left, right, "k", "t", "rt", Seq("v"))
    assert(out.columns.toSeq == Seq("id", "k", "t", "tag", "v"))
    assert(out.count() == 1)
    assert(out.select("v").as[Option[Long]].head().isEmpty) // key 5 has no right rows
  }

  test("asofJoinBackward: NULL fields in the matched right row stay attached to that row") {
    val left = Seq((1L, 10L, ts("2024-01-01 03:00:00"))).toDF("id", "k", "t")
    val right = Seq(
      (10L, ts("2024-01-01 01:00:00"), Option(1L), Option.empty[Long]),
      (10L, ts("2024-01-01 02:00:00"), Option.empty[Long], Option(2L))
    ).toDF("k", "rt", "a", "b")
    // the winning right row is (t=02:00, a=NULL, b=2) — a must be NULL, not
    // the stale a=1 from the older row (no (a=1, b=2) right row exists)
    val out = Temporal.asofJoinBackward(left, right, "k", "t", "rt", Seq("a", "b"))
      .select("a", "b").as[(Option[Long], Option[Long])].head()
    assert(out == ((None, Some(2L))))
  }

  test("asofJoinForward: earliest right row at or after each left ts, per key") {
    val left = Seq(
      (1L, 10L, ts("2024-01-01 07:00:00")),  // before both quotes → first
      (2L, 10L, ts("2024-01-01 08:30:00")),  // between → second
      (3L, 10L, ts("2024-01-01 10:00:00")),  // after all → null
      (4L, 20L, ts("2024-01-01 12:00:00"))   // exact-ts tie → matches
    ).toDF("id", "k", "t")
    val right = Seq(
      (10L, ts("2024-01-01 08:00:00"), 100L),
      (10L, ts("2024-01-01 09:00:00"), 200L),
      (20L, ts("2024-01-01 12:00:00"), 300L)
    ).toDF("k", "rt", "v")
    val out = Temporal.asofJoinForward(left, right, "k", "t", "rt", Seq("v"))
      .select("id", "v").as[(Long, Option[Long])].collect().toMap
    assert(out(1L).contains(100L))
    assert(out(2L).contains(200L))
    assert(out(3L).isEmpty)
    assert(out(4L).contains(300L))
  }

  test("asofJoinNearest: closest right row either direction, ties go backward") {
    val left = Seq(
      (1L, 10L, ts("2024-01-01 08:10:00")),  // 10 min after A, 50 before B → A
      (2L, 10L, ts("2024-01-01 08:50:00")),  // 50 after A, 10 before B → B
      (3L, 10L, ts("2024-01-01 08:30:00")),  // exactly between → backward (A)
      (4L, 10L, ts("2024-01-01 06:00:00")),  // before all → forward (A)
      (5L, 10L, ts("2024-01-01 23:00:00")),  // after all → backward (B)
      (6L, 20L, ts("2024-01-01 12:00:00"))   // key with no right rows → null
    ).toDF("id", "k", "t")
    val right = Seq(
      (10L, ts("2024-01-01 08:00:00"), 100L), // A
      (10L, ts("2024-01-01 09:00:00"), 200L)  // B
    ).toDF("k", "rt", "v")
    val out = Temporal.asofJoinNearest(left, right, "k", "t", "rt", Seq("v"))
      .select("id", "v").as[(Long, Option[Long])].collect().toMap
    assert(out == Map(1L -> Some(100L), 2L -> Some(200L), 3L -> Some(100L),
      4L -> Some(100L), 5L -> Some(200L), 6L -> None))
  }

  test("asofJoinBackward / rangeJoinBinned reject working-column collisions") {
    val l = Seq((1L, ts("2024-01-01 00:00:00"), 0)).toDF("k", "t", "_side")
    val r = Seq((1L, ts("2024-01-01 00:00:00"), 1L)).toDF("k", "rt", "v")
    assertThrows[IllegalArgumentException] {
      Temporal.asofJoinBackward(l, r, "k", "t", "rt", Seq("v"))
    }
    val pts = Seq((1L, 1.0, 9L)).toDF("pid", "x", "_bin")
    val ivs = Seq((1L, 0.0, 2.0)).toDF("iid", "lo", "hi")
    assertThrows[IllegalArgumentException] {
      Temporal.rangeJoinBinned(pts, "x", ivs, "lo", "hi", binWidth = 1.0)
    }
  }

  test("rangeJoinBinned equals the plain theta join, intervals spanning bins") {
    val points = (0 until 100).map(i => (i.toLong, i * 7.0)).toDF("pid", "x")
    val ivs = Seq(
      (1L, 0.0, 50.0),     // spans multiple 20-wide bins
      (2L, 45.0, 45.0),    // degenerate single-point interval
      (3L, 600.0, 800.0),  // overlaps the tail
      (4L, 1000.0, 1100.0) // beyond all points → no matches
    ).toDF("iid", "lo", "hi")
    val binned = Temporal.rangeJoinBinned(points, "x", ivs, "lo", "hi", binWidth = 20.0)
      .select("pid", "iid")
    val theta = points.join(ivs, $"x" >= $"lo" && $"x" <= $"hi").select("pid", "iid")
    assert(binned.count() == theta.count())
    assert(binned.exceptAll(theta).isEmpty && theta.exceptAll(binned).isEmpty)
  }

  test("saltedSumCount equals plain groupBy count/sum") {
    val df = (1 to 500).map(i => (if (i <= 450) "hot" else "cold", i * 0.25)).toDF("k", "v")
    val salted = Skew.saltedSumCount(df, Seq("k"), "v", buckets = 8)
      .orderBy("k").as[(String, Long, Double)].collect().toSeq
    val plain = df.groupBy("k")
      .agg(count(lit(1)).as("cnt"),
        round(sum($"v".cast(org.apache.spark.sql.types.DecimalType(30, 10))), 4)
          .cast("double").as("sum_v"))
      .orderBy("k").as[(String, Long, Double)].collect().toSeq
    assert(salted == plain)
  }
}
