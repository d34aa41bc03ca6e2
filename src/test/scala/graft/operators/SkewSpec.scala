package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SkewSpec extends SparkSpec {
  import spark.implicits._

  test("saltedJoin result equals the unsalted join on a skewed key") {
    // 90% of fact rows share one hot key
    val big = (1 to 1000).map(i => (if (i <= 900) 1L else i.toLong, i)).toDF("k", "v")
    val small = Seq((1L, "hot"), (950L, "cold")).toDF("ck", "name")
    val plain = big.join(small, $"k" === $"ck").select("k", "v", "name")
    val salted = Skew.saltedJoin(big, small, $"k", $"ck", buckets = 8)
      .select("k", "v", "name")
    assert(salted.count() == plain.count())
    assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty)
  }

  test("salt actually spreads the hot key across buckets") {
    val big = (1 to 1000).map(i => (1L, i)).toDF("k", "v")
    val spread = Skew.saltBig(big, 8).groupBy("_salt").count().count()
    assert(spread >= 6) // hot key hits most of the 8 buckets
  }
}
