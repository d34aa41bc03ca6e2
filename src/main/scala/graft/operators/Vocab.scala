package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Subword-vocabulary training: byte-pair-encoding merge learning over
  * a document corpus (Sennrich et al., ACL 2016 — the canonical
  * LLM-tokenizer training step; [[graft.functions.TextFns.bpeishCount]]
  * is the APPLY-side budget proxy, this is the LEARN side).
  *
  * Dataflow: the corpus-sized work — the distinct-word histogram — is
  * one distributed tokenize exchange, always (pair statistics are per
  * word FORM × its corpus frequency, so the corpus text is never
  * rescanned). The merge LOOP itself is globally sequential by
  * definition and runs in one of two places: DRIVER-LOCAL over the
  * collected histogram when it fits `maxDistinctWords` (the
  * single-node-trainer shape — one collect, then in-memory rounds; the
  * production path, since a 10⁵-merge vocab over a 10⁵-word histogram
  * is MBs of driver state vs ~10⁵ sequential cluster jobs), or
  * DISTRIBUTED above the cap: per round one pair-count aggregate
  * (partial-aggregated map-side; the exchange carries (l, r, cnt)
  * groups, never words), a 1-row argmax collect (the Lloyd-step
  * codebook-collect posture), and a codegen'd literal `replace`
  * projection, with [[Lineage.truncate]] pinning the word frame so
  * plan depth stays flat in the merge count. Both paths elect
  * bit-identical merge tables (gated).
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

  /** UTF-8 binary string comparison — Spark's UTF8String and DuckDB's
    * default collation order strings by their UTF-8 BYTES, while
    * Java's `compareTo` orders by UTF-16 code units (the two diverge
    * above the basic multilingual plane): the local merge loop must
    * elect the same tie-broken pair the distributed argmax would. */
  private def utf8Compare(a: String, b: String): Int = {
    val x = a.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val y = b.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val n = math.min(x.length, y.length)
    var i = 0
    while (i < n) {
      val c = (x(i) & 0xff) - (y(i) & 0xff)
      if (c != 0) return c
      i += 1
    }
    x.length - y.length
  }

  /** The DRIVER-LOCAL merge loop over a collected (s, freq) histogram
    * — what every single-node BPE trainer does, and the production
    * answer when the distinct-word frame fits the driver (a 10⁵-word
    * vocabulary is MBs): the merge decision is globally sequential BY
    * DEFINITION, so the distributed loop's per-round
    * aggregate + 1-row collect buys nothing once the whole histogram
    * is driver-sized — it pays a corpus-cluster round-trip per merge
    * (~10⁵ sequential jobs for a production vocab).
    *
    * Pair statistics maintain INCREMENTALLY (the Sennrich learn_bpe
    * refinement): applying merge (l, r) re-counts only the words that
    * actually contain the pair (a pair → word-index map, superset-
    * stale entries filtered by a contains check), and the argmax is a
    * lazy max-heap of (count, l, r) snapshots with stale entries
    * skipped on pop — per-round cost is O(affected words + heap ops),
    * not O(vocabulary), so merge count scales past 10⁵ without the
    * whole-histogram rescan each round. Bit-identical to the
    * distributed rounds: same guarded symbol strings (collected as
    * Spark built them — no re-derivation that could drift on
    * supplementary-plane characters), same overlap-counting adjacent
    * pairs, same (cnt desc, lhs asc, rhs asc) election under UTF-8
    * byte order (the heap's total order), same literal non-overlapping
    * left-to-right replace (`String.replace` ≡ the engines'
    * `replace`). A leftover occurrence after an odd-overlap replace
    * re-enters the counts via the re-count, exactly as the
    * distributed recount would see it. */
  private def trainLocal(state: DataFrame,
                         merges: Int): Seq[(Int, String, String, Long)] = {
    val rows = state.select(col("s"), col("freq")).collect()
    val sArr = rows.map(_.getString(0))
    val fArr = rows.map(_.getLong(1))
    val cnt = scala.collection.mutable.HashMap.empty[(String, String), Long]
    val where = scala.collection.mutable.HashMap
      .empty[(String, String), scala.collection.mutable.HashSet[Int]]
    // max-heap order: count desc, then lhs/rhs asc in UTF-8 bytes —
    // the exact distributed election order
    val heapOrd: Ordering[(Long, String, String)] =
      (a: (Long, String, String), b: (Long, String, String)) => {
        val c = java.lang.Long.compare(a._1, b._1)
        if (c != 0) c
        else {
          val lc = utf8Compare(b._2, a._2)
          if (lc != 0) lc else utf8Compare(b._3, a._3)
        }
      }
    val heap = scala.collection.mutable.PriorityQueue
      .empty[(Long, String, String)](heapOrd)
    // strip exactly the two guard spaces (never a bare trim: a symbol
    // drawn from the corpus could END in a character Java's trim would
    // eat but the engines' space-only trim would not)
    def eachPair(s: String)(f: ((String, String)) => Unit): Unit = {
      val syms = s.substring(1, s.length - 1).split("  ", -1)
      var i = 0
      while (i < syms.length - 1) {
        f((syms(i), syms(i + 1)))
        i += 1
      }
    }
    def register(i: Int, sign: Long): Unit = eachPair(sArr(i)) { key =>
      val nv = cnt.getOrElse(key, 0L) + sign * fArr(i)
      if (nv == 0L) cnt.remove(key) else cnt.update(key, nv)
      if (nv != 0L) heap.enqueue((nv, key._1, key._2))
      if (sign > 0L) {
        // `where` is a SUPERSET of true containment (never shrunk on
        // decrement — the word may hold the pair elsewhere); the
        // apply-time contains() check filters the stale entries
        where.getOrElseUpdate(key, scala.collection.mutable.HashSet.empty)
          .add(i)
      }
    }
    sArr.indices.foreach(register(_, 1L))
    val learned = scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, Long)]
    var step = 1
    var exhausted = false
    while (step <= merges && !exhausted) {
      // pop stale snapshots (count changed since push) until the top
      // reflects a live pair
      var best: (Long, String, String) = null
      while (best == null && heap.nonEmpty) {
        val top = heap.dequeue()
        if (cnt.get((top._2, top._3)).contains(top._1)) best = top
      }
      if (best == null) exhausted = true
      else {
        val (c, l, r) = best
        learned += ((step, l, r, c))
        val pat = s" $l  $r "
        val rep = s" $l$r "
        // snapshot-and-remove BEFORE re-registering, so any index a
        // recount re-adds lands in a fresh set that survives this round
        val affected = where.remove((l, r))
          .getOrElse(scala.collection.mutable.HashSet.empty)
        // iteration order is irrelevant: each word re-counts
        // independently and pair counts are commutative sums
        affected.toArray.foreach { i =>
          if (sArr(i).contains(pat)) {
            register(i, -1L)
            sArr(i) = sArr(i).replace(pat, rep)
            register(i, 1L)
          }
        }
        step += 1
      }
    }
    learned.toSeq
  }

  /** The DISTRIBUTED merge loop — one pair-count aggregate + 1-row
    * argmax collect + one replace projection per round over the
    * materialized word frame; the path for vocabularies too large to
    * collect. */
  private def trainDistributed(state0: DataFrame,
                               merges: Int): Seq[(Int, String, String, Long)] = {
    var state = state0
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
    learned.toSeq
  }

  /** Learn `merges` BPE merges. Returns the merge table
    * (step 1.., lhs, rhs, cnt) — the tokenizer artifact; fewer rows
    * when the corpus runs out of mergeable pairs.
    *
    * Path selection: the corpus-sized work — the word histogram — is
    * always distributed (one tokenize exchange); the merge LOOP then
    * runs driver-local when the distinct-word frame fits BOTH caps —
    * `maxDistinctWords` rows AND `maxLocalChars` total symbol-string
    * characters (the collect is string-heavy, so rows alone would
    * under-count a long-token vocabulary) — ([[trainLocal]]: a
    * 10⁵-merge production vocabulary becomes one collect plus an
    * in-memory loop instead of ~10⁵ sequential cluster round-trips at
    * ~0.17 s each), and distributed above either cap
    * ([[trainDistributed]]). The two paths elect identical merge
    * tables bit-for-bit (the gates pin this); the counts that pick the
    * path read from the already-materialized frame, one cheap
    * action. */
  def bpeTrain(docs: DataFrame, textCol: String, merges: Int,
               maxDistinctWords: Long = 1L << 20,
               maxLocalChars: Long = 1L << 27): DataFrame = {
    require(merges > 0, "merges must be positive")
    require(maxDistinctWords >= 0, "maxDistinctWords must be non-negative")
    require(maxLocalChars >= 0, "maxLocalChars must be non-negative")
    val spark = docs.sparkSession
    val words = docs
      .select(explode(split(col(textCol), " ")).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy("w").agg(count(lit(1)).as("freq"))
    val state = Lineage.truncate(words.withColumn("s", symbolString("w")))
    // the local path collects the symbol strings, so the gate bounds
    // BYTES as well as rows: a row-count cap alone would happily
    // collect 2^20 hundred-char tokens (URLs, hashes) into driver heap
    val stats = state.agg(count(lit(1)).as("n"),
      coalesce(sum(length(col("s"))), lit(0L)).as("chars")).head()
    val learned =
      if (stats.getLong(0) <= maxDistinctWords &&
          stats.getLong(1) <= maxLocalChars) trainLocal(state, merges)
      else trainDistributed(state, merges)
    spark.createDataFrame(
      spark.sparkContext.parallelize(
        learned.map { case (st, l, r, c) => Row(st, l, r, c) }, 1),
      StructType(Seq(StructField("step", IntegerType, nullable = false),
        StructField("lhs", StringType, nullable = false),
        StructField("rhs", StringType, nullable = false),
        StructField("cnt", LongType, nullable = false))))
  }

  /** MID-PATH BPE for vocabularies ABOVE the driver-local caps — the
    * standard practical answer between [[bpeTrain]]'s two poles: the
    * frequency-DOMINANT head of the vocabulary (words ranked by
    * (freq desc, w asc), the maximal prefix whose cumulative
    * symbol-string chars fit `headChars`) collects and trains
    * driver-local, while the tail — Zipf-distributed vocabularies put
    * the overwhelming share of token OCCURRENCES in the head — never
    * ships to the driver and contributes no pair statistics. The
    * learned table still APPLIES to every word (tail words tokenize
    * through whatever merges match, characters otherwise — BPE apply
    * is total by construction); what the tail loses is only its vote
    * in the elections, bounded by [[bpeHeadClosure]]'s measured
    * tail-mass fraction. This trades the distributed path's
    * per-merge cluster round-trip (~10⁵ sequential jobs at production
    * vocab) for ONE ranked election pass + the in-memory loop.
    *
    * The election window runs unpartitioned over the vocab-sized
    * histogram (one single-partition exchange of (w, freq, len) rows
    * — MBs at 10⁶ words; the corpus text never rides it). Same merge
    * semantics as [[bpeTrain]]'s local path bit-for-bit on the head
    * frame: guarded symbol strings, (cnt desc, lhs, rhs) UTF-8
    * election, non-overlapping left-to-right replace. */
  def bpeTrainHead(docs: DataFrame, textCol: String, merges: Int,
                   headChars: Long,
                   maxHeadRows: Long = 1L << 20): DataFrame = {
    require(merges > 0, "merges must be positive")
    require(headChars > 0, "headChars must be positive")
    val spark = docs.sparkSession
    val words = docs
      .select(explode(split(col(textCol), " ")).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy("w").agg(count(lit(1)).as("freq"))
    val ranked = words.withColumn("s", symbolString("w"))
      .withColumn("_cum", sum(length(col("s"))).over(
        org.apache.spark.sql.expressions.Window
          .orderBy(col("freq").desc, col("w").asc)
          .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
            org.apache.spark.sql.expressions.Window.currentRow)))
    val head = Lineage.truncate(
      ranked.filter(col("_cum") <= headChars).select(col("s"), col("freq")))
    val nHead = head.count()
    require(nHead > 0,
      s"bpeTrainHead: headChars=$headChars admits no word — the longest " +
        "most-frequent word's symbol string alone exceeds the budget")
    require(nHead <= maxHeadRows,
      s"bpeTrainHead: head holds $nHead rows > maxHeadRows=$maxHeadRows; " +
        "lower headChars or raise the cap deliberately")
    val learned = trainLocal(head, merges)
    spark.createDataFrame(
      spark.sparkContext.parallelize(
        learned.map { case (st, l, r, c) => Row(st, l, r, c) }, 1),
      StructType(Seq(StructField("step", IntegerType, nullable = false),
        StructField("lhs", StringType, nullable = false),
        StructField("rhs", StringType, nullable = false),
        StructField("cnt", LongType, nullable = false))))
  }

  /** The TAIL-CLOSURE verification for [[bpeTrainHead]] — ONE
    * distributed pass, never per-merge: a 1-row frame measuring what
    * the head election left out. `head_words`/`tail_words` count
    * vocabulary rows on each side of the `headChars` cut;
    * `head_mass`/`tail_mass` sum word frequencies (token OCCURRENCES —
    * the quantity Zipf concentrates in the head: tail_mass / total is
    * the occurrence fraction that trained without a vote);
    * `oov_chars` counts distinct CHARACTERS appearing only in tail
    * words — base-alphabet non-closure (an OOV character can never
    * appear inside any learned merge; its words tokenize to raw
    * characters). A pipeline promotes the head cut when tail_mass and
    * oov_chars are acceptably small — measured, not assumed. */
  def bpeHeadClosure(docs: DataFrame, textCol: String,
                     headChars: Long): DataFrame = {
    require(headChars > 0, "headChars must be positive")
    val words = docs
      .select(explode(split(col(textCol), " ")).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy("w").agg(count(lit(1)).as("freq"))
    val ranked = Lineage.truncate(words.withColumn("s", symbolString("w"))
      .withColumn("_cum", sum(length(col("s"))).over(
        org.apache.spark.sql.expressions.Window
          .orderBy(col("freq").desc, col("w").asc)
          .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
            org.apache.spark.sql.expressions.Window.currentRow)))
      .withColumn("_head", col("_cum") <= headChars))
    val chars = ranked.select(col("_head"),
        explode(expr("transform(sequence(1, length(w)), i -> substring(w, i, 1))"))
          .as("c"))
      .groupBy("c")
      .agg(max(when(col("_head"), 1).otherwise(0)).as("_inHead"))
    val oov = chars.filter(col("_inHead") === 0)
      .agg(count(lit(1)).as("oov_chars"))
    ranked.groupBy()
      .agg(
        sum(when(col("_head"), 1L).otherwise(0L)).as("head_words"),
        sum(when(!col("_head"), 1L).otherwise(0L)).as("tail_words"),
        sum(when(col("_head"), col("freq")).otherwise(0L)).as("head_mass"),
        sum(when(!col("_head"), col("freq")).otherwise(0L)).as("tail_mass"))
      .crossJoin(broadcast(oov))
  }

  /** GUARDED mid-path BPE — [[bpeTrainHead]] behind the closure check
    * its scaladoc prescribes: the head path is only sound when the
    * head's base alphabet CLOSES over the corpus (an OOV character —
    * one appearing only in tail words — can never occur inside a
    * learned merge, and head-training cannot recover it; its words
    * would tokenize to raw characters forever). This face measures
    * [[bpeHeadClosure]] first (ONE distributed pass) and takes the
    * head path only when `oov_chars` = 0; otherwise it REFUSES the
    * head cut and falls back to the full election ([[bpeTrain]] —
    * distributed above the driver caps), so every character votes.
    * The promotion rule is measured, not assumed: the production
    * cadence runs the closure pass per corpus snapshot and the head
    * path activates exactly where Zipf actually concentrated the
    * alphabet. */
  def bpeTrainHeadGuarded(docs: DataFrame, textCol: String, merges: Int,
                          headChars: Long,
                          maxHeadRows: Long = 1L << 20,
                          closure: Option[Row] = None): DataFrame = {
    // callers that already ran the closure pass (the promotion-gate
    // read every pipeline does first) hand its row in — the guard must
    // not re-pay the distributed scan it exists to interpret
    val cl = closure.getOrElse(
      bpeHeadClosure(docs, textCol, headChars).head())
    val oov = cl.getLong(cl.fieldIndex("oov_chars"))
    if (oov > 0) bpeTrain(docs, textCol, merges)
    else bpeTrainHead(docs, textCol, merges, headChars, maxHeadRows)
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
