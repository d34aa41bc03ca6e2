package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class HeavyHittersSpec extends SparkSpec {
  import spark.implicits._

  test("exact regime: k >= distinct gives exact counts, sorted desc") {
    val df = (Seq.fill(50)("a") ++ Seq.fill(30)("b") ++ Seq.fill(20)("c"))
      .toDF("x").repartition(4)
    val hh = udaf(new HeavyHitters(8))
    val out = df.agg(hh($"x").as("hh"))
      .select(explode($"hh").as("h")).select($"h.item", $"h.cnt")
      .as[(String, Long)].collect().toSeq
    assert(out == Seq(("a", 50L), ("b", 30L), ("c", 20L)))
  }

  test("approximate regime: the true heavy hitter survives with k < distinct") {
    // 1000 rows: "hot" appears 400 times, 60 cold items 10 times each
    val rows = Seq.fill(400)("hot") ++ (1 to 60).flatMap(i => Seq.fill(10)(s"cold$i"))
    val df = scala.util.Random.javaRandomToRandom(new java.util.Random(7))
      .shuffle(rows).toDF("x").repartition(8)
    val hh = udaf(new HeavyHitters(4))
    val out = df.agg(hh($"x").as("hh"))
      .select(explode($"hh").as("h")).select($"h.item", $"h.cnt")
      .as[(String, Long)].collect().toSeq
    // MG guarantee: any item with freq > n/(k+1) = 200 must be present
    assert(out.map(_._1).contains("hot"))
    // and reported counts are lower bounds
    out.find(_._1 == "hot").foreach { case (_, c) => assert(c <= 400L) }
  }

  test("nulls are ignored") {
    val df = Seq(Some("a"), None, Some("a"), None).toDF("x")
    val hh = udaf(new HeavyHitters(4))
    val out = df.agg(hh($"x").as("hh"))
      .select(explode($"hh").as("h")).select($"h.item", $"h.cnt")
      .as[(String, Long)].collect().toSeq
    assert(out == Seq(("a", 2L)))
  }
}
