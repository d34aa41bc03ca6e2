package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class LayoutSpec extends SparkSpec {
  import spark.implicits._

  private def tmpDir() =
    java.nio.file.Files.createTempDirectory("graft_layout").toString

  test("layoutOptimize: per-file key ranges are disjoint and sorted") {
    val path = s"${tmpDir()}/t.parquet"
    spark.range(0, 1000).select(col("id").as("k"),
      (col("id") % 7).as("v"))
      .repartition(4) // deliberately scrambled input
      .transform { df => Layout.layoutOptimize(df, col("k"), path, 5); df }
    val ranges = Layout.fileKeyRanges(spark, path, "k")
    assert(ranges.length == 5)
    Layout.requireDisjointRanges(spark, path, "k") // must not throw
    // the rewrite is lossless
    assert(spark.read.parquet(path).agg(count(lit(1)), sum("k")).head() ==
      spark.range(0, 1000).agg(count(lit(1)), sum("id")).head())
  }

  test("requireDisjointRanges: a hash-scattered layout is refused") {
    val path = s"${tmpDir()}/bad.parquet"
    // hash repartition interleaves the keyspace across files — exactly
    // the mis-layout the audit must refuse to bless
    spark.range(0, 1000).select(col("id").as("k"))
      .repartition(4, col("k"))
      .write.parquet(path)
    assertThrows[IllegalStateException] {
      Layout.requireDisjointRanges(spark, path, "k")
    }
  }

  test("layoutOptimize: sub-MiB row groups are refused") {
    assertThrows[IllegalArgumentException] {
      Layout.layoutOptimize(spark.range(3).select(col("id").as("k")),
        col("k"), s"${tmpDir()}/x.parquet", 1, targetRowGroupBytes = 1024)
    }
  }
}
