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

  /** TOKEN-budget corpus mixing: keep each source's documents, in the
    * deterministic salted-hash order of [[quotaPerGroup]], until the
    * source's token budget fills — [[quotaPerGroup]] counts documents,
    * this counts what a pretraining mixture actually buys (a source of
    * long documents exhausts the same budget in fewer rows). A document
    * is admitted iff the tokens BEFORE it in draw order are under the
    * budget, so the boundary document is included (monotone in the
    * budget, never empty for a positive budget) and the admitted set is
    * independent of partitioning. `budgets` is (source, token_budget)
    * rows; sources without a budget row are dropped (inner join), null
    * budgets admit nothing.
    *
    * Scale shape — the naive form is ONE WINDOW PER SOURCE, and mixing
    * keys are few (tens of sources over 100 TB), so a per-source running
    * sum would serialize the corpus onto a handful of partitions. The
    * budget is therefore resolved in two phases: (1) per-(source,
    * hash-prefix-bucket) token sums — a tiny partial-agg frame (sources
    * × 16 rows) whose prefix-sum gives each bucket's PRIOR token count;
    * (2) the running sum runs per (source, bucket) — 16× the
    * parallelism, and buckets wholly past the budget are pruned BEFORE
    * the window shuffle, so at a 1% mixing rate ~15/16 of the corpus
    * never rides the exchange. Bucket = first `prefixLen` hex digits of
    * the same md5 the ordering uses, so bucket order IS draw order and
    * prior + within-bucket prefix = the global prefix sum exactly;
    * widen the prefix (prefixLen = 2 → 256 buckets) as sources grow —
    * the admitted set is prefix-invariant (same global order), only the
    * parallelism changes. */
  def tokenBudgetPerSource(df: DataFrame, sourceCol: Column, keyCol: Column,
                           tokensCol: Column, budgets: DataFrame,
                           salt: String = "graft",
                           prefixLen: Int = 1): DataFrame = {
    require(prefixLen >= 1 && prefixLen <= 8,
      "prefixLen must be 1..8 hex digits (16 to ~4e9 buckets)")
    val cols = Seq("_graft_mix_h", "_graft_mix_b", "_graft_mix_t",
      "_graft_mix_src", "_graft_mix_prior", "_graft_mix_run",
      "_graft_mix_budget")
    cols.foreach(c => require(!df.columns.contains(c),
      s"input already has a $c column"))
    val draw = md5(concat_ws(":", lit(salt), keyCol))
    val base = df
      .withColumn("_graft_mix_src", sourceCol)
      .withColumn("_graft_mix_h", draw)
      .withColumn("_graft_mix_b", substring(col("_graft_mix_h"), 1, prefixLen))
      .withColumn("_graft_mix_t", tokensCol.cast("long"))
    val perBucket = base
      .groupBy(col("_graft_mix_src"), col("_graft_mix_b"))
      .agg(sum(col("_graft_mix_t")).as("_bt"))
    // prior tokens of every earlier bucket: a sources×16-row window
    val wb = Window.partitionBy("_graft_mix_src").orderBy("_graft_mix_b")
      .rowsBetween(Window.unboundedPreceding, -1)
    val priors = perBucket
      .withColumn("_graft_mix_prior", coalesce(sum(col("_bt")).over(wb), lit(0L)))
      .drop("_bt")
    val budget = budgets.select(col("source").as("_graft_mix_src"),
      col("token_budget").cast("long").as("_graft_mix_budget"))
    val gate = priors.join(budget, "_graft_mix_src")
      // prune buckets already past the budget BEFORE the window shuffle
      .filter(col("_graft_mix_prior") < col("_graft_mix_budget"))
    val wd = Window.partitionBy(col("_graft_mix_src"), col("_graft_mix_b"))
      .orderBy(col("_graft_mix_h"), keyCol) // same (draw, key) total order as quotaPerGroup
      .rowsBetween(Window.unboundedPreceding, -1)
    base.join(broadcast(gate), Seq("_graft_mix_src", "_graft_mix_b"))
      .withColumn("_graft_mix_run",
        col("_graft_mix_prior") + coalesce(sum(col("_graft_mix_t")).over(wd), lit(0L)))
      .filter(col("_graft_mix_run") < col("_graft_mix_budget"))
      .drop(cols: _*)
  }
}
