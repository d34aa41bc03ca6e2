package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Null-semantics triad from SURVEY.md §7.4.2: W1 null-passes, J1
  * unmatched-fallback/null-key, U1 missing columns. */
class RelationalSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = to_timestamp(lit(s))

  test("withinPeriod: null ts passes, both bounds inclusive") {
    val df = Seq(Some("2024-01-05 00:00:00"), Some("2024-02-01 00:00:00"), None)
      .toDF("s").select(to_timestamp($"s").as("t"))
    val got = df.filter(Relational.withinPeriod($"t",
      ts("2024-01-01 00:00:00"), ts("2024-01-31 00:00:00"))).count()
    assert(got == 2) // in-window + null; 2024-02-01 dropped
  }

  test("withinPeriod: null bound = open side (ADVICE r1 medium)") {
    val df = Seq("2020-01-01 00:00:00", "2030-01-01 00:00:00").toDF("s")
      .select(to_timestamp($"s").as("t"))
    val lower = df.filter(Relational.withinPeriod($"t",
      ts("2025-01-01 00:00:00"), lit(null).cast("timestamp"))).count()
    val upper = df.filter(Relational.withinPeriod($"t",
      lit(null).cast("timestamp"), ts("2025-01-01 00:00:00"))).count()
    assert(lower == 1 && upper == 1)
  }

  test("lookupEnrich: match, unmatched-fallback, null key stays null; no dim fan-out or leak") {
    val facts = Seq(Some(1L), Some(2L), None).toDF("k")
    val dim = Seq((1L, "one"), (1L, "one-dup"), (3L, "three")).toDF("ck", "name")
    val out = Relational.lookupEnrich(facts, dim, $"k", "ck", "name",
      "enriched", $"k".cast("string"))
    assert(out.columns.toSeq == Seq("k", "enriched")) // dim cols dropped
    assert(out.count() == 3)                           // dup dim key didn't fan out
    val got = out.orderBy(asc_nulls_last("k")).collect()
      .map(r => Option(r.getString(1))).toSeq
    assert(got == Seq(Some("one"), Some("2"), None))
  }

  test("unionAll: by-name with missing columns; empty seq → None") {
    val a = Seq((1, "x")).toDF("id", "s")
    val b = Seq(2).toDF("id")
    val u = Relational.unionAll(Seq(a, b)).get
    assert(u.count() == 2 && u.columns.toSet == Set("id", "s"))
    assert(Relational.unionAll(Nil).isEmpty)
  }

  test("histogram: fixed-width bins, out-of-range clamps to edges, nulls excluded") {
    import spark.implicits._
    val df = Seq(Option(-5.0), Option(0.0), Option(9.9), Option(10.0),
      Option(25.0), Option(99.0), Option(250.0), None).toDF("v")
    val bins = Relational.histogram(df, $"v", lo = 0.0, width = 10.0, nBins = 10)
      .orderBy("bin")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    // -5 clamps into bin 0; 250 clamps into bin 9; null dropped
    assert(bins.toSeq == Seq(
      (0L, 3L, -5.0, 9.9), (1L, 1L, 10.0, 10.0), (2L, 1L, 25.0, 25.0),
      (9L, 2L, 99.0, 250.0)))
  }
}
