package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Ports of the reference's helper tests
  * (/root/reference/tests/test_anpp_pipeline.py:34-63). */
class TimeFnsSpec extends SparkSpec {
  import spark.implicits._

  test("utcToSp: UTC 03:00 is São Paulo hour 0 (reference :35-38)") {
    val df = Seq("2024-03-10T03:00:00Z").toDF("iso")
      .select(TimeFns.hourSp(to_timestamp($"iso")).as("h"))
    assert(df.head().getLong(0) == 0L)
  }

  test("parseUtcToSp: null in → null out (reference :40-41)") {
    val df = Seq[String](null).toDF("iso")
      .select(TimeFns.parseUtcToSp($"iso").as("t"))
    assert(df.head().isNullAt(0))
  }

  test("parseUtcToSp: unparseable → null, even under Spark 4 (ADVICE r1)") {
    val df = Seq("not-a-date").toDF("iso")
      .select(TimeFns.parseUtcToSp($"iso").as("t"))
    assert(df.head().isNullAt(0))
  }

  test("reformatBrDate: dd/MM/yyyy → yyyy-MM-dd; garbage → null") {
    val df = Seq("05/03/2024", "garbage").toDF("br")
      .select(TimeFns.reformatBrDate($"br").as("iso"))
    val got = df.collect().map(r => Option(r.getString(0)))
    assert(got.toSeq == Seq(Some("2024-03-05"), None))
  }
}
