package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class AggFnsSpec extends SparkSpec {
  import spark.implicits._

  test("dsum is partition-order independent (decimal, not IEEE, addition)") {
    val vals = (1 to 10000).map(i => i * 0.01)
    val a = vals.toDF("v").repartition(1)
    val b = vals.reverse.toDF("v").repartition(7)
    val sa = a.agg(AggFns.dsum($"v")).head().getDouble(0)
    val sb = b.agg(AggFns.dsum($"v")).head().getDouble(0)
    assert(sa == sb)
    assert(sa == 500050.0) // 0.01 * Σ(1..10000), exact on the decimal grid
  }

  test("davg and dsumTimes: exact money-grid arithmetic") {
    val df = Seq((10.01, 0.05), (20.02, 0.10)).toDF("price", "disc")
    val r = df.agg(
      AggFns.davg($"price").as("avg"),
      AggFns.dsumTimes($"price", lit(1) - $"disc").as("rev")).head()
    assert(r.getDouble(0) == 15.015)
    assert(r.getDouble(1) == 27.5275) // 10.01*0.95 + 20.02*0.90, exact
  }
}
