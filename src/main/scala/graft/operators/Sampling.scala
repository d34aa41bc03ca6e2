package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Deterministic sampling / capping for training-data curation. A corpus
  * sample must be REPRODUCIBLE (same rows on every run, any cluster size,
  * any partitioning) — `rand()`-based sampling is none of those. Hash
  * thresholding is: a row is kept iff a salted md5 of its key falls under
  * the fraction threshold, a pure per-row predicate.
  *
  * Scale shape: [[stratifiedSample]] is a filter — zero shuffles, full
  * codegen, perfectly parallel. [[quotaPerGroup]] is one hash-shuffle on
  * the group key (the window needs group locality; at 100 TB pre-bucket
  * the corpus by the quota key to make it exchange-free).
  */
object Sampling {

  /** First-8-hex-chars threshold for a Bernoulli fraction: md5's leading
    * 32 bits are uniform, so P(hex8 < "%08x"(f·2³²)) = f. Lowercase-hex
    * string comparison is identical in every engine. */
  def hexThreshold(fraction: Double): String = {
    require(fraction >= 0.0 && fraction <= 1.0, "fraction must be in [0,1]")
    f"${(fraction * (1L << 32)).toLong.min((1L << 32) - 1)}%08x"
  }

  /** Deterministic stratified Bernoulli sample: keeps ~`fraction` of the
    * rows of EACH stratum, independent of row order and partitioning.
    * The stratum rides inside the hash so re-salting per stratum keeps
    * draws independent across strata sharing key values.
    *
    * DuckDB oracle mirror:
    * `WHERE substr(md5(salt || ':' || strata || ':' || key), 1, 8) < 'xx'`.
    */
  def stratifiedSample(df: DataFrame, strata: Column, key: Column,
                       fraction: Double, salt: String = "graft"): DataFrame =
    if (fraction >= 1.0) df
    else df.filter(
      substring(md5(concat_ws(":", lit(salt), strata, key)), 1, 8)
        < lit(hexThreshold(fraction)))

  /** Deterministic WEIGHTED Bernoulli sample: each row is kept with its
    * OWN probability `weightCol` (clamped to [0,1]) — the upsample/
    * downsample-by-quality curation primitive (e.g. weight = a quality
    * score, so better documents survive more often), with the same
    * reproducibility contract as [[stratifiedSample]]: a pure per-row
    * hash predicate, zero shuffles, any-partitioning-stable.
    *
    * The per-row threshold is the weight rendered as the same 8-hex-char
    * string [[hexThreshold]] produces (floor(w·2³²), lowercase, left-
    * padded), compared against the md5 draw; weight ≥ 1 keeps the row
    * unconditionally. DuckDB oracle mirror:
    * `CASE WHEN w >= 1.0 THEN TRUE ELSE substr(md5(salt || ':' || key), 1, 8)
    *  < lpad(lower(hex(CAST(floor(w * 4294967296.0) AS BIGINT))), 8, '0') END`.
    */
  def weightedSample(df: DataFrame, weightCol: Column, key: Column,
                     salt: String = "graft"): DataFrame = {
    val w = greatest(lit(0.0), weightCol.cast("double"))
    val draw = substring(md5(concat_ws(":", lit(salt), key)), 1, 8)
    val thr = lpad(lower(hex(floor(w * 4294967296.0).cast("long"))), 8, "0")
    df.filter(w >= 1.0 || draw < thr)
  }

  /** Deterministic train/validation/test split: every row gets exactly
    * one split label from a cumulative-fraction ladder over a salted-md5
    * draw — reproducible on any cluster, and re-running with a GROWN
    * corpus never moves an existing row between splits (the draw depends
    * only on the key). Fractions must sum to 1 (±1e-9); the last split
    * absorbs the hash-ceiling remainder.
    *
    * The draw mixes an operator-distinct `"split"` tag into the hash
    * input, so composing the curation primitives — weighted-sample a
    * corpus, then split the survivors — stays independent: with the
    * shared draw of the samplers, every weightedSample survivor has
    * draw < floor(w·2³²) and a sum-to-1 ladder over the SAME draw would
    * label (nearly) all of them with the first split.
    *
    * DuckDB oracle mirror:
    * `CASE WHEN substr(md5(salt || ':split:' || key), 1, 8)
    * < '<hex(f1)>' THEN 'a' WHEN ... ELSE '<last>' END`. */
  def assignSplit(df: DataFrame, key: Column,
                  splits: Seq[(String, Double)],
                  salt: String = "graft",
                  outCol: String = "split"): DataFrame = {
    require(splits.size >= 2, "need at least two splits")
    require(splits.forall(_._2 > 0.0), "every split fraction must be positive")
    require(math.abs(splits.map(_._2).sum - 1.0) < 1e-9,
      s"split fractions must sum to 1, got ${splits.map(_._2).sum}")
    require(!df.columns.contains(outCol), s"input already has a $outCol column")
    val draw = substring(md5(concat_ws(":", lit(salt), lit("split"), key)), 1, 8)
    val cum = splits.scanLeft(0.0)(_ + _._2).tail
    // ladder of upper bounds; the final split is the otherwise-arm so
    // fraction rounding in the hex ceiling can never drop a row
    val arms = splits.init.zip(cum.init)
      .map { case ((name, _), upper) => (draw < lit(hexThreshold(upper)), name) }
    val ladder = arms.tail
      .foldLeft(when(arms.head._1, arms.head._2)) {
        case (acc, (cond, name)) => acc.when(cond, name)
      }
      .otherwise(splits.last._1)
    df.withColumn(outCol, ladder)
  }

  /** Per-group quota: at most `n` rows per group, chosen by a
    * deterministic salted-hash order (a fixed "random" draw) with the key
    * itself as the tiebreak. The standard cap-per-domain /
    * cap-per-source curation op. */
  def quotaPerGroup(df: DataFrame, group: Column, key: Column, n: Int,
                    salt: String = "graft"): DataFrame = {
    require(n > 0, "quota must be positive")
    val rn = "_graft_quota_rn"
    require(!df.columns.contains(rn), s"input already has a $rn column")
    val w = Window.partitionBy(group)
      .orderBy(md5(concat_ws(":", lit(salt), key)), key)
    df.withColumn(rn, row_number().over(w))
      .filter(col(rn) <= n)
      .drop(rn)
  }
}
