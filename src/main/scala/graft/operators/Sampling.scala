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

  /** LEAKAGE-FREE split: near-dup clusters move between splits as
    * UNITS. [[assignSplit]] draws on the row key, so two near-duplicate
    * documents can land on opposite sides of a train/test cut — the
    * classic eval leak (the test document's near-copy trained the
    * model, so held-out loss is memorization, not generalization).
    * Here the draw key is the cluster REPRESENTATIVE: `labels` is the
    * dedup stage's connected-components output (id, cluster) —
    * [[Dedup.connectedComponents]]' min-label — and every member
    * inherits its cluster's single draw (singletons, absent from
    * `labels`, represent themselves). Same salted ladder, same
    * stability under corpus growth — growing a CLUSTER never moves it
    * (the min-label representative only changes if a smaller id joins,
    * which is the same contract the dedup survivors already live
    * with).
    *
    * Scale shape: one broadcast-or-shuffle left join against the label
    * table (cluster members ≪ corpus — labels only exist for docs
    * with at least one near-dup pair), then [[assignSplit]]'s pure
    * per-row predicate. The CC labels are the dedup pipeline's
    * existing artifact, not a new corpus pass.
    *
    * DuckDB oracle mirror: the recursive-CTE closure's min-label per
    * id, then [[assignSplit]]'s ladder over
    * `'salt:split:' || COALESCE(cl, id)`. */
  def assignSplitLeakFree(df: DataFrame, key: Column, labels: DataFrame,
                          splits: Seq[(String, Double)],
                          salt: String = "graft",
                          outCol: String = "split"): DataFrame = {
    val rep = "_graft_split_rep"
    require(!df.columns.contains(rep), s"input already has a $rep column")
    val lab = labels.select(col("id").as(rep + "_id"),
      col("cluster").as(rep))
    // no broadcast hint: the label table is usually small (docs with at
    // least one pair) but CAN approach corpus scale on a dup-heavy crawl
    // — let AQE pick broadcast vs shuffle from its measured size
    val joined = df.join(lab, key === col(rep + "_id"), "left")
    assignSplit(joined.withColumn(rep, coalesce(col(rep), key)),
        col(rep), splits, salt, outCol)
      .drop(rep, rep + "_id")
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
  /** TEMPERATURE-scaled per-source token budgets — the standard
    * multi-source pretraining mix (sample source i ∝ T_i^α for α < 1,
    * flattening the natural distribution so low-resource sources are
    * not drowned; α = 0.5 is the common default): returns the
    * (source, token_budget) frame [[tokenBudgetPerSource]] admits
    * against, with budget_i = ⌊totalBudget · T_i^α / Σ_j T_j^α⌋.
    *
    * Cross-engine exactness: the shares are computed in INTEGER
    * arithmetic — T_i^α is scaled to ⌊T_i^α · 2²⁰⌉ (a BIGINT; exact in
    * a double up to 2^53, i.e. corpora to ~10¹⁹ tokens), the
    * denominator is an integer SUM (fold-order-free, unlike a double
    * sum), and the budget is an integral `div` of DECIMAL(38,0)
    * products — so a DuckDB oracle replays it bit-for-bit (HUGEINT `//`
    * mirror). α = 0.5 rides `sqrt`, which IEEE-754 requires correctly
    * rounded in every engine; other α ride `pow`, deterministic within
    * Spark but libm-dependent across engines — gate only sqrt-exact
    * α values (the [[graft.queries]] q42 / PQ-oracle precedent for
    * refusing libm-unstable functions at the gate boundary).
    *
    * Scale shape: one partial-agg `groupBy(source)` over the corpus
    * (map-side combine; tens of sources → a tiny frame), then
    * driver-free integer arithmetic on that frame; floor rounding means
    * Σ budget_i ≤ totalBudget (never over-admits). Sources with zero
    * tokens get budget 0. */
  def temperatureBudgets(df: DataFrame, sourceCol: Column, tokensCol: Column,
                         totalBudget: Long, alpha: Double = 0.5): DataFrame = {
    require(totalBudget > 0, "totalBudget must be positive")
    require(alpha > 0.0 && alpha <= 1.0, "alpha must be in (0, 1]")
    val tot = df.groupBy(sourceCol.as("source"))
      .agg(sum(tokensCol.cast("long")).as("_tt"))
    val p =
      if (alpha == 1.0) col("_tt").cast("double")
      else if (alpha == 0.5) sqrt(col("_tt").cast("double"))
      else pow(col("_tt").cast("double"), lit(alpha))
    val scored = tot
      .withColumn("_s", round(p * (1L << 20)).cast("decimal(38,0)"))
      .drop("_tt")
    val denom = scored.agg(sum(col("_s")).as("_denom"))
    scored.crossJoin(broadcast(denom))
      .withColumn("token_budget",
        expr(s"CAST((CAST($totalBudget AS DECIMAL(38,0)) * _s) div _denom AS BIGINT)"))
      .select(col("source"), col("token_budget"))
  }

  /** EPOCH upsampling: repeat each source's documents whole-corpus
    * epochs until its token target fills — the low-resource-language /
    * high-quality-source move (a source whose total tokens T_i fall
    * short of its target is seen ⌊target_i/T_i⌋ full epochs, capped at
    * `maxEpochs` against memorization), with the REMAINDER of the
    * target filled by a partial epoch admitted in the deterministic
    * draw order of [[tokenBudgetPerSource]]. Emits one row per
    * (document, epoch), `epochCol` ∈ [0, full] — epoch indices below
    * `full` are complete copies; epoch `full` is the partial prefix.
    * Degenerate cases compose cleanly: target < T_i → zero full epochs,
    * the whole plan is one partial epoch (ordinary token-budget
    * mixing); cap reached → remainder forced 0 (never more than
    * `maxEpochs` epochs); a source with no target row, or zero tokens,
    * is dropped.
    *
    * Scale shape: the epoch fan-out is a generator (`explode` of a
    * per-row `sequence`) — no join, no shuffle, output ∝ admitted
    * tokens; the plan frame (per-source totals vs targets) is a tiny
    * broadcast; the partial epoch pays [[tokenBudgetPerSource]]'s
    * bucketed-window shape. `targets` is (source, target_tokens)
    * rows. */
  def epochUpsample(df: DataFrame, sourceCol: Column, keyCol: Column,
                    tokensCol: Column, targets: DataFrame, maxEpochs: Int,
                    salt: String = "graft",
                    epochCol: String = "epoch"): DataFrame = {
    require(maxEpochs >= 1, "maxEpochs must be at least 1")
    val helpers = Seq("_graft_ep_src", "_graft_ep_tt", "_graft_ep_tgt",
      "_graft_ep_full", "_graft_ep_rem")
    (helpers :+ epochCol).foreach(c =>
      require(!df.columns.contains(c), s"input already has a $c column"))
    val tot = df.groupBy(sourceCol.as("_graft_ep_src"))
      .agg(sum(tokensCol.cast("long")).as("_graft_ep_tt"))
      .filter(col("_graft_ep_tt") > 0)
    val tgt = targets.select(col("source").as("_graft_ep_src"),
      col("target_tokens").cast("long").as("_graft_ep_tgt"))
    val plan = tot.join(tgt, "_graft_ep_src")
      .withColumn("_graft_ep_full",
        least(expr("_graft_ep_tgt div _graft_ep_tt"), lit(maxEpochs.toLong)))
      .withColumn("_graft_ep_rem",
        when(col("_graft_ep_full") < maxEpochs,
          col("_graft_ep_tgt") - col("_graft_ep_full") * col("_graft_ep_tt"))
          .otherwise(lit(0L)))
    val planned = df.withColumn("_graft_ep_src", sourceCol)
      .join(broadcast(plan), "_graft_ep_src")
    val full = planned
      .filter(col("_graft_ep_full") > 0)
      .withColumn(epochCol,
        explode(sequence(lit(0L), col("_graft_ep_full") - 1)))
    val partial = tokenBudgetPerSource(df, sourceCol, keyCol, tokensCol,
        plan.select(col("_graft_ep_src").as("source"),
          col("_graft_ep_rem").as("token_budget")),
        salt)
      .withColumn("_graft_ep_src", sourceCol)
      .join(broadcast(plan), "_graft_ep_src")
      .withColumn(epochCol, col("_graft_ep_full"))
    full.unionByName(partial).drop(helpers: _*)
  }

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
