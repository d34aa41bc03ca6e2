package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Deduplication family for large-scale training-data pipelines: exact,
  * MinHash+LSH, SimHash, and blocked n-gram Jaccard. All hashing is
  * md5-based (hex strings): engine-portable (oracle-checkable in DuckDB)
  * and cluster-stable (no JVM-private hash seeds).
  *
  * Scale notes (the whole point of these operators):
  *  - exact dedup is one hash-shuffle on a 32-byte digest, never on the
  *    full text;
  *  - MinHash/LSH turns the O(n²) pair problem into a shuffle on band
  *    keys: only documents sharing a band collide, so the join fan-out is
  *    bounded by real near-duplicate density, not corpus size;
  *  - n-gram Jaccard is only ever evaluated on candidate pairs produced by
  *    a blocking key — never on the cross product.
  */
object Dedup {

  /** Word k-shingles (k=3): the standard unit for near-dup detection.
    * Documents with fewer than k words get an empty shingle set. */
  def shingles(text: Column, k: Int = 3): Column = {
    val w = split(text, " ")
    when(size(w) >= k,
      transform(sequence(lit(1), size(w) - (k - 1)),
        i => concat_ws(" ", (0 until k).map(off => element_at(w, i + off)): _*)))
      .otherwise(array().cast("array<string>"))
  }

  /** MinHash signature: `numHashes` permutations simulated as
    * min(md5(j + ":" + shingle)) — the lexicographic min of a hex digest
    * is a uniform min-hash, identical in every engine. */
  def minhashSignature(shingleArr: Column, numHashes: Int = 8): Column =
    array((0 until numHashes).map { j =>
      array_min(transform(shingleArr, s => md5(concat(lit(s"$j:"), s))))
    }: _*)

  /** LSH band keys: signature split into `bands` bands of
    * numHashes/bands rows each, one md5 key per band. Empty shingle sets
    * produce null keys, which never join (null != null). */
  def bandKeys(sig: Column, numHashes: Int = 8, bands: Int = 4): Column = {
    val rows = numHashes / bands
    array((0 until bands).map { b =>
      md5(concat((0 until rows).map(r => element_at(sig, b * rows + r + 1)): _*))
    }: _*)
  }

  /** MinHash+LSH candidate pairs: (a_id, b_id) with a < b for documents
    * sharing at least one band. The self-join shuffles on (band index,
    * band key) — at 100 TB this is the only way the pair search scales. */
  def minhashCandidates(docs: DataFrame, idCol: String, textCol: String,
                        numHashes: Int = 8, bands: Int = 4): DataFrame = {
    val banded = docs
      .select(col(idCol).as("id"),
        bandKeys(minhashSignature(shingles(col(textCol)), numHashes),
          numHashes, bands).as("bks"))
      .select(col("id"), posexplode(col("bks")).as(Seq("band", "bk")))
      .filter(col("bk").isNotNull)
    val a = banded.select(col("id").as("a_id"), col("band"), col("bk"))
    val b = banded.select(col("id").as("b_id"), col("band"), col("bk"))
    a.join(b, Seq("band", "bk"))
      .filter(col("a_id") < col("b_id"))
      .select("a_id", "b_id").distinct()
  }

  /** SimHash signature as a bit-string of length `bits` (≤32 with md5 hex
    * digits): bit p is 1 when the majority of tokens have a high p-th hex
    * digit in their md5. Hamming-close signatures ⇒ similar documents. */
  def simhash(text: Column, bits: Int = 16): Column = {
    val w = split(text, " ")
    concat((1 to bits).map { p =>
      when(size(filter(w, t => substring(md5(t), p, 1) >= "8")) * 2 > size(w), "1")
        .otherwise("0")
    }: _*)
  }

  /** Blocked n-gram Jaccard: exact Jaccard over distinct word-shingle
    * sets, evaluated only for pairs sharing `blockKey` (e.g. language +
    * length bucket). Returns (a_id, b_id, jaccard) above `threshold`. */
  def ngramJaccardPairs(docs: DataFrame, idCol: String, textCol: String,
                        blockKey: Column, threshold: Double, k: Int = 3): DataFrame = {
    val base = docs.select(
      col(idCol).as("id"),
      blockKey.as("blk"),
      array_distinct(shingles(col(textCol), k)).as("sh"))
    val a = base.select(col("id").as("a_id"), col("blk"), col("sh").as("sh_a"))
    val b = base.select(col("id").as("b_id"), col("blk"), col("sh").as("sh_b"))
    val inter = size(array_intersect(col("sh_a"), col("sh_b"))).cast("double")
    val union = (size(col("sh_a")) + size(col("sh_b"))).cast("double") - inter
    a.join(b, Seq("blk"))
      .filter(col("a_id") < col("b_id"))
      .withColumn("jaccard", when(union > 0.0, inter / union).otherwise(lit(0.0)))
      .filter(col("jaccard") >= threshold)
      .select("a_id", "b_id", "jaccard")
  }

  /** Exact-dedup survivor view: one row per distinct md5(text), keeping
    * the smallest id (deterministic winner, standard keep-first policy). */
  def exactGroups(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.groupBy(md5(col(textCol)).as("h"))
      .agg(count(lit(1)).as("cnt"), min(col(idCol)).as("keep_id"))
}
