package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence-construction stages of a training-data pipeline: fixed-window
  * document chunking (embedding/indexing prep) and token-budget sequence
  * packing (pretraining batch prep). Both are pure narrow algebra over
  * the corpus — chunking is shuffle-free, packing shuffles once on the
  * pack-group key — so they scale linearly with corpus bytes.
  */
object Pack {

  /** Split each document into fixed-size character windows with
    * `overlap` characters of context carried between consecutive chunks
    * (the standard RAG/embedding-index prep). Token-based chunking swaps
    * the length/substr pair for token equivalents; the dataflow is
    * identical.
    *
    * Chunk starts are 0, size-overlap, 2(size-overlap), … while < length
    * (the last chunk may be short; an empty — but non-null — text emits
    * exactly one empty chunk at offset 0); null text yields no rows. One
    * explode, no shuffle, stays in whole-stage codegen. */
  def chunkFixed(docs: DataFrame, idCol: String, textCol: String,
                 size: Int, overlap: Int): DataFrame = {
    require(size > 0 && overlap >= 0 && overlap < size,
      s"need 0 <= overlap < size, got size=$size overlap=$overlap")
    val step = size - overlap
    docs
      // explicit: null text chunks to nothing (greatest() would otherwise
      // skip the null length and emit one null chunk at offset 0)
      .filter(col(textCol).isNotNull)
      .select(col(idCol), col(textCol).as("_text"),
        explode(sequence(lit(0),
          greatest(length(col(textCol)) - 1, lit(0)), lit(step))).as("_off"))
      .select(col(idCol),
        expr(s"_off div $step").cast("long").as("chunk_id"),
        expr(s"substring(_text, _off + 1, $size)").as("chunk"))
  }

  /** Pack documents into fixed `budget`-token training sequences, GPT
    * pretraining style: documents are laid end-to-end in a deterministic
    * order (by `idCol` within each `partCol` group) and cut every
    * `budget` tokens, so a document can straddle two (or more)
    * sequences. Emits one row per (document, sequence) with the token
    * count that lands in that sequence — the exact manifest a sequence
    * builder consumes.
    *
    * Scale shape: ONE shuffle (the window partition on `partCol`);
    * packing is embarrassingly parallel across groups (source shards in
    * production — a global pack order would serialize the corpus through
    * one partition). All arithmetic is integer (no float division), so
    * the layout is reproducible on any engine/partitioning. Zero-token
    * documents are dropped (they occupy no sequence space). */
  def packSequences(docs: DataFrame, idCol: String, tokenCol: Column,
                    budget: Long, partCol: Column): DataFrame = {
    require(budget > 0, "budget must be positive")
    val w = Window.partitionBy(col("_src")).orderBy(col("_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    docs
      .select(partCol.as("_src"), col(idCol).as("_id"),
        tokenCol.cast("long").as("_tk"))
      .filter(col("_tk") > 0)
      .withColumn("_cum", sum(col("_tk")).over(w))
      .withColumn("_start", col("_cum") - col("_tk"))
      .select(col("_src"), col("_id"), col("_tk"), col("_cum"), col("_start"),
        explode(sequence(
          expr(s"_start div $budget"),
          expr(s"(_cum - 1) div $budget"))).as("seq_id"))
      .select(col("_src").as("source"), col("_id").as("doc_id"),
        col("seq_id").cast("long").as("seq_id"),
        (least(col("_cum"), (col("seq_id") + 1) * budget) -
          greatest(col("_start"), col("seq_id") * budget)).as("tok_in_seq"))
  }

  /** Assign every document to a fixed-token-budget training SHARD — the
    * output-manifest stage of a curation run: training jobs consume the
    * corpus as ~equal-token shards, and the assignment must be
    * deterministic (re-runnable, resumable) and shuffled (a shard must
    * not be one domain's contiguous slice). Documents are laid out per
    * source in the salted-hash draw order of
    * [[Sampling.quotaPerGroup]]/[[Sampling.tokenBudgetPerSource]] (the
    * hash IS the shuffle), and a document lands in the shard where its
    * token offset starts: `shard_id = prior_tokens div shardTokens` —
    * whole documents never split (a shard overshoots by at most one
    * document; [[packSequences]] is the stage that splits into exact
    * sequences downstream).
    *
    * Scale shape: the same bucketed two-phase prefix sum as
    * [[Sampling.tokenBudgetPerSource]] — per-(source, hash-prefix)
    * token sums give each bucket's prior, the running sum windows per
    * (source, bucket) at `16^prefixLen`× the parallelism of a
    * per-source window — minus that operator's budget prune (every
    * document receives a shard, so every bucket rides). One window
    * shuffle over (source, bucket); the bucket-prior frame is
    * sources × buckets rows and broadcasts.
    *
    * Output: the input columns plus `shard_id` (per-source, 0-based)
    * and `shard_tok0` (the document's starting token offset within its
    * source — the audit column a resume/verify pass checks). Null/zero
    * token counts occupy no space but still land in the shard at their
    * draw position. */
  def shardManifest(docs: DataFrame, sourceCol: Column, keyCol: Column,
                    tokensCol: Column, shardTokens: Long,
                    salt: String = "graft", prefixLen: Int = 1): DataFrame = {
    require(shardTokens > 0, "shardTokens must be positive")
    require(prefixLen >= 1 && prefixLen <= 8,
      "prefixLen must be 1..8 hex digits (16 to ~4e9 buckets)")
    val cols = Seq("_graft_shard_h", "_graft_shard_b", "_graft_shard_t",
      "_graft_shard_src", "_graft_shard_prior")
    cols.foreach(c => require(!docs.columns.contains(c),
      s"input already has a $c column"))
    val base = docs
      .withColumn("_graft_shard_src", sourceCol)
      .withColumn("_graft_shard_h", md5(concat_ws(":", lit(salt), keyCol)))
      .withColumn("_graft_shard_b",
        substring(col("_graft_shard_h"), 1, prefixLen))
      .withColumn("_graft_shard_t", coalesce(tokensCol.cast("long"), lit(0L)))
    val perBucket = base
      .groupBy(col("_graft_shard_src"), col("_graft_shard_b"))
      .agg(sum(col("_graft_shard_t")).as("_bt"))
    val wb = Window.partitionBy("_graft_shard_src").orderBy("_graft_shard_b")
      .rowsBetween(Window.unboundedPreceding, -1)
    val priors = perBucket
      .withColumn("_graft_shard_prior",
        coalesce(sum(col("_bt")).over(wb), lit(0L)))
      .drop("_bt")
    val wd = Window
      .partitionBy(col("_graft_shard_src"), col("_graft_shard_b"))
      .orderBy(col("_graft_shard_h"), keyCol)
      .rowsBetween(Window.unboundedPreceding, -1)
    base.join(broadcast(priors), Seq("_graft_shard_src", "_graft_shard_b"))
      .withColumn("shard_tok0",
        col("_graft_shard_prior") +
          coalesce(sum(col("_graft_shard_t")).over(wd), lit(0L)))
      .withColumn("shard_id", expr(s"shard_tok0 div ${shardTokens}L"))
      .drop(cols: _*)
  }
}
