package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bucket-partitioned ledger discipline, shared by every streaming
  * ingest family whose state lives in storage rather than the stream
  * engine (the PQ index, tf, and positional ledgers; the graph and
  * semantic-label ledgers carry their own variants inside
  * [[Similarity]] / the drains because their read legs are
  * multi-stage).
  *
  * The problem it closes: an append-only drain's WRITE is batch-sized
  * (`deltaOnly` + parquet append), but the idempotency anti-join reads
  * the stored ledger's id column — O(ledger) per micro-batch at 10⁹
  * rows. Because the ledger is partitioned on `bkt = pmod(key, B)`
  * and pmod is a FUNCTION of the key, a batch row can only collide
  * with stored rows in the batch's own buckets — so pre-filtering the
  * stored side to the batch's elected bucket set is a semantic no-op
  * on the anti-join (bit-identical delta) that turns the read into a
  * literal `bkt IN (...)` partition filter: O(touched buckets ×
  * ledger/B), the same law as the graph sink's write side
  * (SCALE.md's gsink table). Size B ∝ corpus and the per-batch read
  * stays batch-sized at any scale; [[Similarity.rebucketLedger]] is
  * the migration face when the corpus outgrows B. */
object Ledger {

  /** `bkt = pmod(key, buckets)` — the write-side column every
    * bucket-partitioned ledger derives before `partitionBy("bkt")`. */
  def withBucket(df: DataFrame, keyCol: String, buckets: Int): DataFrame = {
    require(buckets > 0, "buckets must be positive")
    df.withColumn("bkt", pmod(col(keyCol), lit(buckets.toLong)).cast("int"))
  }

  /** The bucket set an arriving batch's keys can touch — a driver
    * `collect` bounded by B (≤ buckets distinct ints, regardless of
    * batch or corpus size). */
  def batchBuckets(batch: DataFrame, keyCol: String,
                   buckets: Int): Seq[Int] = {
    require(buckets > 0, "buckets must be positive")
    batch.select(pmod(col(keyCol), lit(buckets.toLong)).cast("int")
        .as("bkt"))
      .distinct().collect().map(_.getInt(0)).toSeq.sorted
  }

  /** Prune a stored bucket-partitioned ledger to the buckets `batch`'s
    * keys elect: the anti-join read leg of an idempotent append scans
    * only those partition directories (a literal `bkt IN` / `bkt = N`
    * partition filter in the executed plan). Rows outside the elected
    * buckets cannot share a key with any batch row, so downstream
    * key-equi anti-joins and joins see a bit-identical world. */
  def prunedToBatch(stored: DataFrame, batch: DataFrame, keyCol: String,
                    buckets: Int): DataFrame = {
    val bkts = batchBuckets(batch, keyCol, buckets)
    stored.filter(col("bkt").isin(bkts: _*))
  }
}
