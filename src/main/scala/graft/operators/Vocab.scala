package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Subword-vocabulary training: byte-pair-encoding merge learning over
  * a document corpus (Sennrich et al., ACL 2016 — the canonical
  * LLM-tokenizer training step; [[graft.functions.TextFns.bpeishCount]]
  * is the APPLY-side budget proxy, this is the LEARN side).
  *
  * Dataflow per merge round (the Lloyd/label-propagation loop pattern):
  * one pass over the DISTINCT-WORD frame (tokenize once up front —
  * pair statistics are per word FORM × its corpus frequency, so the
  * corpus text is never rescanned), a pair-count aggregate
  * (partial-aggregated map-side; the exchange carries (l, r, cnt)
  * groups, never words), a 1-row argmax collect to the driver (the
  * merge decision is globally sequential BY DEFINITION — same as the
  * Lloyd step's codebook collect), and a codegen'd literal `replace`
  * projection applying the merge. [[Lineage.truncate]] pins the word
  * frame each round, so plan depth stays flat in the merge count.
  *
  * Determinism contract (exactly oracle-able): pair counts are integer
  * sums; the winning pair maximizes (cnt, then lexicographically
  * smaller l, then r); merges apply LEFT-TO-RIGHT NON-OVERLAPPING
  * within each word — the standard BPE greedy scan, realized
  * identically in both engines as string `replace` over the guarded
  * symbol encoding below.
  *
  * Symbol encoding: a word's symbol sequence is one string — a guard
  * space, the symbols joined by DOUBLE spaces, a guard space
  * (`" a  b  c "`). Searching for `" l  r "` can then never match
  * across a symbol boundary (symbols contain no spaces), and because
  * adjacent occurrences SHARE only the middle of a double separator,
  * replace's non-overlapping left-to-right scan consumes exactly the
  * greedy BPE merge positions (`" a  a  a  a "` → `" aa  aa "`). */
object Vocab {

  /** The guard-encoded symbol string of word column `w` — one shared
    * construction for train, apply, and count (drift here would make
    * them tokenize different alphabets). */
  private def symbolString(w: String): Column =
    concat(lit(" "),
      array_join(expr(s"transform(sequence(1, length($w)), i -> substring($w, i, 1))"),
        "  "),
      lit(" "))

  /** One merge as a literal replace over the guarded encoding. */
  private def applyOne(s: Column, l: String, r: String): Column =
    call_function("replace", s, lit(s" $l  $r "), lit(s" $l$r "))

  /** Collect a merge table in learned order. KB-scale by contract (a
    * production vocab is ~10⁴–10⁵ rows — the PQ-codebook collect
    * argument). */
  private def collectMerges(merges: DataFrame): Seq[(String, String)] =
    merges.select(col("step"), col("lhs"), col("rhs"))
      .orderBy("step").collect()
      .map(r => (r.getString(1), r.getString(2))).toSeq

  /** Replace chain per projection before the plan is cut: bounds both
    * expression-tree depth (Catalyst's recursive transforms overflow
    * the stack thousands of levels deep) and generated-method size
    * (whole-stage codegen splits at 64 KB). */
  private val MergesPerStage = 64

  /** Apply a whole merge table to a frame's `s` column: chunks of
    * [[MergesPerStage]] chained replaces, [[Lineage.truncate]] between
    * chunks so a 10⁵-merge vocabulary runs as ~10³ shallow projections
    * over the (vocab-sized) word frame instead of one 10⁵-deep
    * expression Catalyst cannot analyze. */
  private def applyMerges(frame: DataFrame,
                          ordered: Seq[(String, String)]): DataFrame =
    ordered.grouped(MergesPerStage).foldLeft(frame) { (df, chunk) =>
      Lineage.truncate(df.withColumn("s",
        chunk.foldLeft(col("s")) { case (c, (l, r)) => applyOne(c, l, r) }))
    }

  /** Learn `merges` BPE merges. Returns the merge table
    * (step 1.., lhs, rhs, cnt) — the tokenizer artifact; fewer rows
    * when the corpus runs out of mergeable pairs. */
  def bpeTrain(docs: DataFrame, textCol: String, merges: Int): DataFrame = {
    require(merges > 0, "merges must be positive")
    val spark = docs.sparkSession
    val words = docs
      .select(explode(split(col(textCol), " ")).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy("w").agg(count(lit(1)).as("freq"))
    var state = Lineage.truncate(words.withColumn("s", symbolString("w")))
    val learned = scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, Long)]
    var step = 1
    var exhausted = false
    while (step <= merges && !exhausted) {
      val best = state
        .select(col("freq"), explode(expr(
          """transform(slice(split(trim(s), '  '), 1,
            |  size(split(trim(s), '  ')) - 1),
            |  (x, i) -> struct(x AS l,
            |    element_at(split(trim(s), '  '), i + 2) AS r))""".stripMargin))
          .as("p"))
        .groupBy(col("p.l").as("l"), col("p.r").as("r"))
        .agg(sum("freq").as("cnt"))
        .orderBy(col("cnt").desc, col("l").asc, col("r").asc)
        .limit(1).collect()
      if (best.isEmpty) exhausted = true
      else {
        val l = best(0).getString(0)
        val r = best(0).getString(1)
        learned += ((step, l, r, best(0).getLong(2)))
        state = Lineage.truncate(state.withColumn("s", applyOne(col("s"), l, r)))
        step += 1
      }
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(
        learned.toSeq.map { case (st, l, r, c) => Row(st, l, r, c) }, 1),
      StructType(Seq(StructField("step", IntegerType, nullable = false),
        StructField("lhs", StringType, nullable = false),
        StructField("rhs", StringType, nullable = false),
        StructField("cnt", LongType, nullable = false))))
  }

  /** APPLY a learned merge table ([[bpeTrain]]'s output) to a corpus
    * and return the subword-token histogram (token, cnt — counts
    * weighted by word frequency): the tokenizer's serving side, and
    * the vocabulary artifact an LLM data pipeline ships with its
    * tokenized shards.
    *
    * Scale shape: the merge table collects to the driver (KB-scale by
    * contract) and applies as [[MergesPerStage]]-deep chained-replace
    * projections over the DISTINCT-WORD frame — narrow codegen'd maps
    * with the plan cut between chunks, so a 10⁵-merge production vocab
    * is ~10³ shallow vocab-sized passes; no join, no shuffle until the
    * final (token)-keyed histogram aggregate, whose exchange carries
    * partial counts, never words. Tokenizing new text against a FROZEN
    * vocabulary is the same call with someone else's merge frame —
    * merges apply in learned order, which is what makes BPE apply
    * deterministic on any engine. */
  def bpeApply(docs: DataFrame, textCol: String,
               merges: DataFrame): DataFrame = {
    val words = docs
      .select(explode(split(col(textCol), " ")).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy("w").agg(count(lit(1)).as("freq"))
      .withColumn("s", symbolString("w"))
    applyMerges(words, collectMerges(merges))
      .select(col("freq"), explode(split(trim(col("s")), "  ")).as("token"))
      .groupBy("token").agg(sum("freq").as("cnt"))
  }

  /** Per-document BPE token counts against a frozen merge table — the
    * budget column every packing/mixing stage downstream consumes
    * ([[Pack.packSequences]], [[Sampling.tokenBudgetPerSource]]):
    * replaces the whitespace/bpeish PROXIES with the real learned
    * tokenizer's counts.
    *
    * Scale shape: the merge chain runs once per DISTINCT WORD (the
    * vocabulary frame — tokenizing "the" once, not 10⁹ times; same
    * chunked projections as [[bpeApply]]), then documents join their
    * words on the word key and sum — one word-keyed join whose
    * exchange carries (word, count) pairs, one partial-aggregated
    * per-doc sum. Returns (idCol, n_tokens); documents whose text
    * holds no words are absent (count 0 ≡ no packable content, the
    * [[Pack.packSequences]] `_tk > 0` posture). */
  def bpeTokenCounts(docs: DataFrame, idCol: String, textCol: String,
                     merges: DataFrame): DataFrame = {
    val words = docs
      .select(col(idCol), explode(split(col(textCol), " ")).as("w"))
      .filter(length(col("w")) > 0)
    val wordToks = applyMerges(
      words.select("w").distinct().withColumn("s", symbolString("w")),
      collectMerges(merges))
      .select(col("w"), size(split(trim(col("s")), "  ")).cast("long").as("_wtk"))
    words.join(wordToks, "w")
      .groupBy(col(idCol)).agg(sum("_wtk").as("n_tokens"))
  }
}
