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
    // mixed integral widths (int fact key vs long dim key) must agree:
    // both sides are cast to long before build/probe
    val iFact = (1 to 200).map(i => (i % 97, i)).toDF("k", "payload")
    val mixed = Prune.bloomSemiJoin(iFact, "k", dim, "dk", expectedItems = 100L)
    val mixedExact = iFact.join(dim, $"k" === $"dk", "left_semi")
    assert(mixed.exceptAll(mixedExact).isEmpty && mixedExact.exceptAll(mixed).isEmpty)
    // the probe is the codegen'd built-in, not a UDF (checked on the
    // analyzed plan: over local test relations the optimizer folds the
    // filter into the LocalTableScan; over file scans it stays physical)
    val plan = pruned.queryExecution.analyzed.toString
    assert(plan.contains("might_contain"), s"expected might_contain in:\n$plan")
    assert(!plan.toLowerCase.contains("udf"), "probe must not be a UDF")
  }
}
