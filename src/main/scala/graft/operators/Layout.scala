package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Writer-side physical layout as a first-class operator — the "fix a
  * mis-laid-out table" move the round-8 scan-memory probe proved is a
  * scale requirement, not a cosmetic one (SCALE.md, round-8 "parquet
  * scan-memory floor"): a table written as one giant file with default
  * row groups sets every downstream scan's per-task memory floor at
  * row-group bytes × concurrent scan threads (a split can never be
  * smaller than a row group, and vectored IO buffers a whole row group
  * per task) — measured OOMing a 64 GiB heap at the 1000× relational
  * point until the replica was re-laid-out, after which a BOUNDED 8 GiB
  * heap beat it 54 s vs 294 s on GC alone.
  */
object Layout {

  /** Rewrite `df` under `path` laid out for key-range reading:
    * range-repartitioned into `numFiles` files on `key` (per-file
    * min/max stats become DISJOINT — usable for file skipping),
    * sorted by `key` within each file (row-group stats become tight —
    * usable for row-group skipping), with parquet row groups capped at
    * `targetRowGroupBytes` (the scan-memory floor knob: per-task
    * memory ≈ one row group, so floor × cores must fit the executor
    * heap).
    *
    * This is ONE shuffle (the range exchange) paid at write time and
    * amortized over every subsequent key-range scan — the same
    * paid-once discipline as the bucketed layout (q50) and the
    * hive-partitioned layout (q51), covering the third axis: range
    * predicates over a high-cardinality numeric key, where hive
    * partitioning would explode the directory count and bucketing
    * hashes the ranges apart. Sizing rule: numFiles ≈ table bytes /
    * targetRowGroupBytes keeps one-ish row group per file; the range
    * partitioner samples the key distribution, so skew yields uneven
    * file sizes, not overlapping ranges. */
  def layoutOptimize(df: DataFrame, key: Column, path: String,
                     numFiles: Int,
                     targetRowGroupBytes: Long = 128L << 20): Unit = {
    require(numFiles > 0, "numFiles must be positive")
    require(targetRowGroupBytes >= (1L << 20),
      "targetRowGroupBytes below 1 MiB would fragment the scan")
    df.repartitionByRange(numFiles, key)
      .sortWithinPartitions(key)
      .write.mode("overwrite")
      .option("parquet.block.size", targetRowGroupBytes.toString)
      .parquet(path)
  }

  /** Audit face: per-file (min, max) of `keyName` over the table at
    * `path`, sorted by min — the witness that [[layoutOptimize]]'s
    * ranges landed disjoint (file skipping is only sound/useful when
    * they are). One column-pruned scan; driver-side rows = file count,
    * bounded by construction. */
  def fileKeyRanges(spark: SparkSession, path: String,
                    keyName: String): Array[(String, Long, Long)] =
    spark.read.parquet(path)
      .groupBy(input_file_name().as("f"))
      .agg(min(col(keyName)).as("lo"), max(col(keyName)).as("hi"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._2)

  /** Throw unless the per-file key ranges at `path` are pairwise
    * disjoint — the refuse-don't-corrupt witness the gated layout query
    * runs before trusting the layout for pruning. */
  def requireDisjointRanges(spark: SparkSession, path: String,
                            keyName: String): Unit = {
    val ranges = fileKeyRanges(spark, path, keyName)
    ranges.sliding(2).foreach {
      case Array(a, b) if b._2 <= a._3 =>
        throw new IllegalStateException(
          s"layoutOptimize ranges overlap: ${a._1} [${a._2},${a._3}] vs " +
            s"${b._1} [${b._2},${b._3}] — key ranges must be disjoint for " +
            "file skipping")
      case _ => ()
    }
  }
}
