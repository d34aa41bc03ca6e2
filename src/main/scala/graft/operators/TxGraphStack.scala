package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The kNN-GRAPH ledger under the [[Manifest]] commit protocol — the
  * transactional face of `streaming_graph_ingest`'s drain, closing the
  * torn-commit window its in-place form carries: a dynamic partition
  * overwrite of N touched bucket directories is not atomic, and a
  * mid-write crash leaves the ledger half-replaced — fatal HERE
  * specifically, because a graph append is NOT idempotent by anti-join
  * (the recap derives each touched source's new edge list from its
  * STORED list, so a replay against partially-overwritten state
  * recaps garbage and commits it).
  *
  * Under the protocol the hazard disappears structurally: the graph is
  * ONE asset family (`edges/v=V/bkt=B`) under per-bucket MVCC —
  * [[Manifest.State.statsV]] pins each bucket at the version that last
  * replaced it — and a batch writes its touched buckets' replacement
  * content ([[Similarity.graphAppendBucketDelta]], the same
  * O(touched) read+write discipline) to the FRESH version directory
  * nothing pins, then ONE manifest swap re-pins exactly the touched
  * buckets. A crash anywhere before the swap leaves every committed
  * pin intact; the replayed batch re-derives its delta from the
  * COMMITTED cut (not the mutated one), overwrites the same fresh
  * paths, and commits once — exactly-once by batch-id high-water.
  * Snapshot reads ([[Manifest.readAt]]) and vacuum come free: every
  * commit freezes its pin map in an immutable history file.
  *
  * Scale shape is unchanged from the in-place drain (the protocol adds
  * two metadata files per commit): reads under literal `bkt IN`
  * partition filters over the pinned paths, writes ∝ touched buckets.
  */
object TxGraphStack {

  /** Create the stack from a built base graph (src_id, nbr_id, cos):
    * all present buckets land at `edges/v=0` and the first manifest
    * pins them. `buckets` fixes the ledger's pmod(src_id, B) layout —
    * the same B every subsequent [[commitBatch]] must pass. */
  def init(spark: SparkSession, root: String, edges: DataFrame,
           buckets: Int): Unit = {
    require(Manifest.read(spark, root).isEmpty,
      s"graph stack already initialized at $root")
    val b = Ledger.withBucket(
      edges.select(col("src_id"), col("nbr_id"), col("cos")),
      "src_id", buckets).localCheckpoint()
    val present = b.select(col("bkt")).distinct()
      .collect().map(_.getInt(0))
    b.write.partitionBy("bkt").mode("overwrite")
      .parquet(s"$root/edges/v=0")
    Manifest.commit(spark, root, Manifest.State(0L, -1L, -1L,
      present.map(_ -> 0L).toMap))
  }

  /** The committed edge rows (src_id, nbr_id, cos, bkt), each bucket
    * read at ITS pinned version; `restrict` prunes the read to an
    * elected bucket set at the PATH level (an unelected bucket's
    * directory is never listed — the serve-side O(touched) law). */
  private def readEdges(spark: SparkSession, root: String,
                        st: Manifest.State,
                        restrict: Option[Seq[Int]]): DataFrame = {
    val pinned = restrict match {
      case None => st.statsV
      case Some(bs) => st.statsV.filter { case (b, _) => bs.contains(b) }
    }
    if (pinned.isEmpty)
      spark.emptyDataFrame.select(lit(0L).as("src_id"),
        lit(0L).as("nbr_id"), lit(0.0).as("cos"), lit(0).as("bkt"))
        .limit(0)
    else spark.read.option("basePath", s"$root/edges")
      .parquet(pinned.toSeq.sorted.map { case (b, v) =>
        s"$root/edges/v=$v/bkt=$b" }: _*)
      .select(col("src_id"), col("nbr_id"), col("cos"), col("bkt"))
  }

  /** Resolve the committed graph for searching — optionally pruned to
    * `buckets` (path-level) and/or pinned to a snapshot `version`
    * (time travel: the graph exactly as of that commit, concurrent
    * with later commits). */
  def resolve(spark: SparkSession, root: String,
              buckets: Option[Seq[Int]] = None,
              version: Option[Long] = None): DataFrame = {
    val st = version match {
      case None => Manifest.read(spark, root).getOrElse(
        throw new IllegalStateException(s"no committed manifest at $root"))
      case Some(v) => Manifest.readAt(spark, root, v).getOrElse(
        throw new IllegalStateException(
          s"version $v at $root is uncommitted or vacuumed"))
    }
    readEdges(spark, root, st, buckets)
  }

  /** One arrival batch through the protocol: beam-link the batch nodes
    * against the COMMITTED graph (every ledger read bucket-pruned —
    * [[Similarity.graphAppendBucketDelta]]'s discipline, reading only
    * manifest-pinned paths), write the touched buckets' replacement
    * content at `edges/v=N`, swap. `corpus` is the scoring-vector
    * table (bucket-partitioned on pmod(id, `corpusBuckets`) when set,
    * so per-hop vector reads prune too). Idempotent by batch id;
    * `publish = false` is the crash face — and unlike the in-place
    * drain, the crashed batch's partial writes are invisible orphans,
    * so its replay recaps against clean committed state. */
  def commitBatch(spark: SparkSession, root: String, corpus: DataFrame,
                  batch: DataFrame, batchId: Long, idCol: String,
                  vecCol: String, k: Int, buckets: Int, beam: Int = 8,
                  hops: Int = 3, maxDegree: Int = 8,
                  corpusBuckets: Option[Int] = None,
                  publish: Boolean = true): Boolean = {
    val st = Manifest.read(spark, root).getOrElse(
      throw new IllegalStateException(
        s"graph stack not initialized at $root — call init first"))
    if (batchId <= st.batchId) return false // replayed: already committed
    val vNew = st.version + 1
    val stored = readEdges(spark, root, st, None)
    val replaced = Similarity.graphAppendBucketDelta(stored, corpus,
      batch, idCol, vecCol, k = k, buckets = buckets, beam = beam,
      hops = hops, maxDegree = maxDegree, corpusBuckets = corpusBuckets)
      .localCheckpoint()
    val touched = replaced.select(col("bkt")).distinct()
      .collect().map(_.getInt(0))
    if (touched.nonEmpty)
      replaced.write.partitionBy("bkt").mode("overwrite")
        .parquet(s"$root/edges/v=$vNew")
    if (publish)
      // a graph append never empties a touched bucket (the replacement
      // carries the bucket's survivors), so re-pin = touched → vNew
      Manifest.commit(spark, root, st.copy(version = vNew,
        batchId = batchId, statsV = st.statsV ++ touched.map(_ -> vNew)))
    true
  }

  /** [[TxServeStack.vacuum]]'s twin for the graph stack: reclaim
    * superseded bucket versions (each commit strands the touched
    * buckets' previous pins), crash orphans, and history manifests
    * below the retention floor. Same writer caveat: not concurrent
    * with an in-flight commit ([[Manifest.commit]]'s fence protects
    * the pointer, not un-swapped fresh-version writes). */
  def vacuum(spark: SparkSession, root: String,
             retainVersions: Int = 0): TxServeStack.VacuumStats = {
    val cur = Manifest.read(spark, root).getOrElse(
      throw new IllegalStateException(s"no committed manifest at $root"))
    val floor = cur.version - retainVersions.toLong
    val retained = ((floor to cur.version)
      .flatMap(v => Manifest.readAt(spark, root, v)) :+ cur).distinct
    val keepEdges = retained.flatMap(_.statsV.map { case (b, v) =>
      s"v=$v/bkt=$b" }).toSet
    val (deleted, retired, kept) = Manifest.sweepUnpinned(spark, root,
      floor, Seq(Manifest.SweepFamily("edges", 2, keepEdges)))
    TxServeStack.VacuumStats(deleted, retired, kept)
  }
}
