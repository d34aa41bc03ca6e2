package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SessionsSpec extends SparkSpec {
  import spark.implicits._

  test("assign/countPerUser: 30-min gap splits sessions per user") {
    val ev = Seq(
      (1L, "2024-01-01 10:00:00"), (1L, "2024-01-01 10:10:00"),
      (1L, "2024-01-01 11:30:00"),                    // gap > 30min → new
      (2L, "2024-01-01 09:00:00")
    ).toDF("user_id", "s").select($"user_id", to_timestamp($"s").as("ts"))
    val got = Sessions.countPerUser(ev, "user_id", "ts")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 2L, 2L -> 1L))
    val sids = Sessions.assign(ev, "user_id", "ts")
      .filter($"user_id" === 1).orderBy("ts")
      .collect().map(_.getAs[Long]("session_id")).toSeq
    assert(sids == Seq(0L, 0L, 1L))
  }

  test("gap boundary: exactly gapSeconds stays in the same session") {
    val ev = Seq((1L, "2024-01-01 10:00:00"), (1L, "2024-01-01 10:30:00"))
      .toDF("user_id", "s").select($"user_id", to_timestamp($"s").as("ts"))
    assert(Sessions.countPerUser(ev, "user_id", "ts").head().getLong(1) == 1L)
  }
}
