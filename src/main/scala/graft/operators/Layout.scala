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

  /** Rewrite `df` under `path` laid out for MULTI-column range reading —
    * Z-ORDER: each key is min-max-scaled to a `bits`-wide integer, the
    * scaled keys' bits are interleaved into one space-filling-curve
    * value, and the table is split into grid-ALIGNED files (one per
    * top-bits curve cell — see the placement note in the body) + sorted
    * on the curve value within each file.
    * A single-key range layout ([[layoutOptimize]]) leaves every OTHER
    * column's per-file span at the full domain (zero skipping for its
    * predicates); the Z-curve bounds every dimension's span per file at
    * roughly domain / numFiles^(1/D), so range predicates on ANY of the
    * keys skip most files — the standard multi-dimensional clustering
    * trade: no dimension is perfectly sorted, every dimension is
    * usefully bounded.
    *
    * Cost identical to [[layoutOptimize]]: one range exchange at write
    * time, plus one min/max reduce over the keys (the scaling frame —
    * same pass class as the range partitioner's sampling). Min-max
    * scaling keeps correctness under skew but degrades cell balance on
    * heavily skewed keys (quantile scaling via a sampled CDF is the
    * refinement; the file ranges the audit face checks stay sound
    * either way). Keys must be non-null numerics; `D * bits` must fit
    * in 63 bits. Empty input (or an all-null key) fails loudly rather
    * than NPEing at the scaling frame; key domains of ANY width are
    * scaled exactly — narrow domains shift-then-divide, wide domains
    * divide first, full-range (> 2^63 span) domains take the unsigned
    * shift path — so hash-valued or nanosecond-timestamp keys cannot
    * silently wrap negative and void the clustering. */
  def layoutOptimizeZ(df: DataFrame, keys: Seq[Column], path: String,
                      numFiles: Int, bits: Int = 16,
                      targetRowGroupBytes: Long = 128L << 20): Unit = {
    require(numFiles > 0, "numFiles must be positive")
    require(keys.size >= 2, "Z-order needs at least two keys")
    require(keys.size * bits <= 63,
      s"${keys.size} keys x $bits bits overflow a long")
    require(targetRowGroupBytes >= (1L << 20),
      "targetRowGroupBytes below 1 MiB would fragment the scan")
    val d = keys.size
    val raw = keys.zipWithIndex.foldLeft(df) { case (acc, (k, i)) =>
      acc.withColumn(s"_graft_zr$i", k.cast("long"))
    }
    val mmAggs = (0 until d).flatMap(i => Seq(
      min(col(s"_graft_zr$i")).as(s"mn$i"), max(col(s"_graft_zr$i")).as(s"mx$i")))
    val mm = raw.agg(mmAggs.head, mmAggs.tail: _*).head()
    (0 until d).foreach { i =>
      require(!mm.isNullAt(2 * i) && !mm.isNullAt(2 * i + 1),
        s"layoutOptimizeZ: key ${keys(i)} has no non-null values " +
          "(empty input or all-null key) — nothing to scale")
    }
    val scaled = (0 until d).foldLeft(raw) { case (acc, i) =>
      val mn = mm.getLong(2 * i); val mx = mm.getLong(2 * i + 1)
      // span via BigInt: mx - mn + 1 itself overflows Long on full-range
      // domains (e.g. hash-valued keys spanning ±2^63)
      val span = (BigInt(mx) - BigInt(mn)) + 1
      // Exact integer scaling into [0, 2^bits). Three regimes, widest
      // domain last — shift-then-div silently wraps negative once
      // (key - mn) << bits exceeds 2^63 (a span of ~1.4e14 at the
      // default bits=16: nanosecond timestamps qualify), so the shift
      // form is only used where it provably cannot overflow.
      val scaleExpr =
        if (span <= BigInt(1L << (63 - bits)))
          // narrow domain: shift then div — floor((k-mn) * 2^bits / span)
          s"shiftleft(_graft_zr$i - ${mn}L, $bits) div ${span.toLong}L"
        else if (span <= (BigInt(1) << 63)) {
          // wide domain: divide FIRST by step = ceil(span / 2^bits) —
          // same monotone bucketization into [0, 2^bits), no shift to
          // overflow ((k - mn) <= span - 1 < 2^63 stays a valid Long)
          val step = ((span + (BigInt(1) << bits) - 1) >> bits).toLong
          s"(_graft_zr$i - ${mn}L) div ${step}L"
        } else {
          // full-range domain (span > 2^63, e.g. xxhash64 keys): the
          // wrapped difference k - mn is exactly the unsigned offset in
          // [0, 2^64), so an UNSIGNED shift right by (64 - bits) buckets
          // it into [0, 2^bits) with step 2^(64-bits) — no signed div
          // ever sees the wrapped value
          s"shiftrightunsigned(_graft_zr$i - ${mn}L, ${64 - bits})"
        }
      acc.withColumn(s"_graft_zs$i", expr(scaleExpr))
    }
    val zExpr = (0 until bits).flatMap { b =>
      (0 until d).map(i =>
        s"shiftleft(shiftright(_graft_zs$i, $b) & 1, ${b * d + i})")
    }.mkString(" | ")
    // GRID-ALIGNED file assignment: file i holds exactly the curve cell
    // whose top-fileBits curve prefix is i, so every dimension's
    // per-file span is bounded by its strip width BY CONSTRUCTION
    // (domain / 2^(prefix bits of that dim)) at any corpus size. A
    // sampled range partition on the raw curve value (the previous
    // form) puts file boundaries at data quantiles, and a boundary
    // landing mid-cell yields straddle files whose span on some
    // dimension is the FULL domain — measured voiding the per-dimension
    // prune witness at small corpora (9/16 files intersecting a 13%
    // strip at sf0.001), and data-dependent (so not even stably wrong).
    // Explicit placement needs an identity partitioner, which the
    // Dataset API does not expose — the RDD hop is the one Spark-public
    // hook, pays plain-Row serialization through the one write-time
    // exchange this operator already owns, and is the genuine
    // per-partition-placement case the RDD escape hatch exists for.
    // Effective file count is 2^floor(log2 numFiles) (curve prefixes
    // must be whole bits); balance under skew is traded for guaranteed
    // alignment, consistent with the min-max scaling note above.
    val fileBits = math.min(
      63 - java.lang.Long.numberOfLeadingZeros(numFiles.toLong), d * bits)
    val nb = 1 << fileBits
    val zdf = scaled.withColumn("_graft_zv", expr(zExpr))
      .withColumn("_graft_zb",
        shiftrightunsigned(col("_graft_zv"), d * bits - fileBits))
    val schema = zdf.schema
    val zbIdx = schema.fieldIndex("_graft_zb")
    val placed = zdf.rdd
      .map(r => (r.getLong(zbIdx), r))
      .partitionBy(new org.apache.spark.Partitioner {
        override def numPartitions: Int = nb
        override def getPartition(key: Any): Int = key.asInstanceOf[Long].toInt
      })
      .map(_._2)
    zdf.sparkSession.createDataFrame(placed, schema)
      .sortWithinPartitions("_graft_zv")
      .drop((0 until d).flatMap(i => Seq(s"_graft_zr$i", s"_graft_zs$i"))
        ++ Seq("_graft_zv", "_graft_zb"): _*)
      .write.mode("overwrite")
      .option("parquet.block.size", targetRowGroupBytes.toString)
      .parquet(path)
  }

  /** How many files at `path` a range predicate `keyName ∈ [lo, hi]`
    * must read, by per-file min/max stats: (intersecting, total). The
    * pruning-value audit for [[layoutOptimizeZ]], where per-file ranges
    * on each dimension are bounded but deliberately NOT disjoint. */
  def filesIntersecting(spark: SparkSession, path: String, keyName: String,
                        lo: Long, hi: Long): (Int, Int) = {
    val ranges = fileKeyRanges(spark, path, keyName)
    (ranges.count { case (_, mn, mx) => mx >= lo && mn <= hi }, ranges.length)
  }

  /** Throw unless the per-file stats at `path` let the predicate
    * `keyName ∈ [lo, hi]` skip at least half the files — the
    * refuse-don't-trust witness the Z-order gate runs per dimension
    * (a mis-built layout silently reads everything; this makes it
    * loud). */
  def requirePrunable(spark: SparkSession, path: String, keyName: String,
                      lo: Long, hi: Long): Unit = {
    val (hit, total) = filesIntersecting(spark, path, keyName, lo, hi)
    if (hit * 2 > total)
      throw new IllegalStateException(
        s"layout at $path is not pruning-usable for $keyName in [$lo, $hi]: " +
          s"$hit of $total files intersect (need <= half)")
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
