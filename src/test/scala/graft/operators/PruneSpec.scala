package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class PruneSpec extends SparkSpec {
  import spark.implicits._

  test("bloomSemiJoin equals the exact semi join (false positives removed, nulls dropped)") {
    val fact = ((1 to 1000).map(i => (Option(i.toLong % 97), i.toLong)) :+
      ((Option.empty[Long], 0L))).toDF("k", "payload")
    val dim = Seq(3L, 5L, 7L, 11L, 96L).toDF("dk")
    val pruned = Prune.bloomSemiJoin(fact, "k", dim, "dk",
      expectedItems = 100L, fpp = 0.1)
    val exact = fact.join(dim, $"k" === $"dk", "left_semi")
    assert(pruned.count() == exact.count())
    assert(pruned.exceptAll(exact).isEmpty && exact.exceptAll(pruned).isEmpty)
    // nothing survives an empty dim
    assert(Prune.bloomSemiJoin(fact, "k", dim.filter($"dk" < 0), "dk",
      expectedItems = 100L).count() == 0)
    // a string key must be rejected, not silently null-cast by the probe
    val sFact = Seq(("3", 1L)).toDF("k", "payload")
    assertThrows[IllegalArgumentException] {
      Prune.bloomSemiJoin(sFact, "k", dim, "dk", expectedItems = 100L)
    }
  }
}
