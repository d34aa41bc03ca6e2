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

  test("layoutOptimizeZ: strip predicates prune on BOTH dims; single-key layout fails the second") {
    // uniform 64x64 grid: a is the "orderkey", b the "partkey"
    val grid = spark.range(0, 4096).select(
      (col("id") / 64).cast("long").as("a"), (col("id") % 64).as("b"))
    val zPath = s"${tmpDir()}/z.parquet"
    Layout.layoutOptimizeZ(grid, Seq(col("a"), col("b")), zPath, numFiles = 16)
    // a ~25% strip on either dimension must skip at least half the files
    Layout.requirePrunable(spark, zPath, "a", 10, 25)
    Layout.requirePrunable(spark, zPath, "b", 10, 25)
    // lossless
    assert(spark.read.parquet(zPath).agg(sum("a"), sum("b")).head() ==
      grid.agg(sum("a"), sum("b")).head())
    // the single-key range layout serves its own key but leaves the
    // other dimension's per-file span at the full domain
    val rPath = s"${tmpDir()}/r.parquet"
    Layout.layoutOptimize(grid, col("a"), rPath, 16)
    Layout.requirePrunable(spark, rPath, "a", 10, 25)
    assertThrows[IllegalStateException] {
      Layout.requirePrunable(spark, rPath, "b", 10, 25)
    }
  }

  test("layoutOptimizeZ: one key or a >63-bit interleave is refused") {
    val df = spark.range(4).select(col("id").as("a"), col("id").as("b"))
    assertThrows[IllegalArgumentException] {
      Layout.layoutOptimizeZ(df, Seq(col("a")), s"${tmpDir()}/x.parquet", 2)
    }
    assertThrows[IllegalArgumentException] {
      Layout.layoutOptimizeZ(df, Seq(col("a"), col("b")),
        s"${tmpDir()}/y.parquet", 2, bits = 32)
    }
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
