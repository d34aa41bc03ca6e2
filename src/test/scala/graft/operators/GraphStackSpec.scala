package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** [[TxGraphStack]] — the kNN-graph ledger under the manifest
  * protocol. The load-bearing claims, beyond ManifestSpec's generic
  * ones: (1) a crashed batch's partial bucket writes are invisible and
  * its REPLAY recaps against the clean committed cut (the in-place
  * drain's fatal case — graph append is not idempotent by anti-join);
  * (2) snapshot reads pin the graph as of an old commit; (3) vacuum
  * reclaims superseded bucket versions and orphans without touching a
  * live pin. */
class GraphStackSpec extends SparkSpec {
  import spark.implicits._

  private val dim = 64
  private def vec(i: Int): Array[Float] =
    Array.tabulate(dim)(j => (((i * 31 + j * 7) % 17) - 8) / 8.0f)

  private def vecs(ids: Seq[Int]) =
    ids.map(i => (i.toLong, vec(i))).toDF("vec_id", "embedding")

  // the corpus stages through bucketed parquet — the drain's real
  // shape (fresh scan attributes per read, partition-prunable layout)
  private lazy val corpusDir: String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_gscorp")
    vecs(0 until 22)
      .withColumn("bkt", pmod($"vec_id", lit(4L)).cast("int"))
      .write.partitionBy("bkt").mode("overwrite").parquet(dir.toString)
    dir.toString
  }
  private def corpus = spark.read.parquet(corpusDir)

  private def initStack(root: String): Unit = {
    val cent = corpus.filter($"vec_id" === 0)
      .select(lit(0).cast("int").as("cell"), $"embedding".as("c_vec"))
    val g0 = Similarity.knnGraph(corpus.filter($"vec_id" < 12), cent,
      "vec_id", "embedding", k = 2).select("src_id", "nbr_id", "cos")
    TxGraphStack.init(spark, root, g0, buckets = 4)
  }

  private def commit(root: String, ids: Seq[Int], id: Long,
                     publish: Boolean = true): Boolean =
    TxGraphStack.commitBatch(spark, root, corpus, vecs(ids), id,
      "vec_id", "embedding", k = 2, buckets = 4, beam = 3, hops = 2,
      maxDegree = 3, corpusBuckets = Some(4), publish = publish)

  private def snap(root: String): Set[String] =
    TxGraphStack.resolve(spark, root).collect().map(_.toString).toSet

  test("uncommitted batch invisible; crash replay recaps against the committed cut and converges") {
    val dirA = java.nio.file.Files.createTempDirectory("graft_gsa")
    val dirB = java.nio.file.Files.createTempDirectory("graft_gsb")
    try {
      initStack(dirA.toString); initStack(dirB.toString)
      // A: straight through (one-node overlap between batches)
      commit(dirA.toString, 12 to 16, 0L)
      commit(dirA.toString, 16 to 21, 1L)
      // B: batch 1 crashes AFTER its versioned writes, BEFORE the swap
      commit(dirB.toString, 12 to 16, 0L)
      val afterB0 = snap(dirB.toString)
      commit(dirB.toString, 16 to 21, 1L, publish = false)
      assert(snap(dirB.toString) == afterB0,
        "bucket writes before the manifest swap leaked to a reader")
      assert(Manifest.read(spark, dirB.toString).get.batchId == 0L)
      // replay: the delta derivation reads the COMMITTED cut — the
      // exact property the in-place drain lacks (its replay would
      // recap against the half-overwritten ledger)
      commit(dirB.toString, 16 to 21, 1L)
      assert(snap(dirB.toString) == snap(dirA.toString),
        "crash + replay drifted from the straight-through run")
    } finally {
      graft.queries.FixtureCache.deleteRecursively(dirA)
      graft.queries.FixtureCache.deleteRecursively(dirB)
    }
  }

  test("high-water mark: a committed batch replays as a no-op; fence rejects a stale committer") {
    val dir = java.nio.file.Files.createTempDirectory("graft_gshw")
    try {
      val root = dir.toString
      initStack(root)
      assert(commit(root, 12 to 16, 0L))
      val s0 = snap(root)
      val v0 = Manifest.read(spark, root).get.version
      assert(!commit(root, 12 to 16, 0L))
      assert(snap(root) == s0)
      assert(Manifest.read(spark, root).get.version == v0)
      // a committer that derived from a superseded cut is fenced
      val stale = Manifest.read(spark, root).get
      assert(commit(root, 16 to 18, 1L))
      intercept[Manifest.CommitConflict] {
        Manifest.commit(spark, root,
          stale.copy(version = stale.version + 1, batchId = 5L))
      }
    } finally {
      graft.queries.FixtureCache.deleteRecursively(dir)
    }
  }

  test("takedown: tombstones kill both endpoints' edges; re-ingest lands fresh past its tombstone; compaction purges and retires the window") {
    val dir = java.nio.file.Files.createTempDirectory("graft_gsrm")
    try {
      val root = dir.toString
      initStack(root)
      commit(root, 12 to 16, 0L)
      val before = TxGraphStack.resolve(spark, root)
        .select("src_id", "nbr_id", "cos").localCheckpoint()
      // remove two nodes — crash face first (invisible), then commit
      val rm = Seq(3L, 14L).toDF("vec_id")
      TxGraphStack.commitRemove(spark, root, rm, 1L, "vec_id",
        buckets = 4, publish = false)
      assert(snap(root) == before.withColumn("bkt",
        pmod($"src_id", lit(4L)).cast("int"))
        .collect().map(_.toString).toSet,
        "an uncommitted takedown leaked")
      assert(TxGraphStack.commitRemove(spark, root, rm, 1L, "vec_id",
        buckets = 4))
      val want = Similarity.graphRemove(before, rm, "vec_id")
      val got = TxGraphStack.resolve(spark, root)
        .select("src_id", "nbr_id", "cos")
      assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty,
        "tombstoned serve drifted from graphRemove semantics")
      // re-ingest node 14: its new edges are born PAST the tombstone
      // — the composed serve equals graphAppend over the pruned graph
      assert(commit(root, Seq(14), 2L))
      val want2 = Similarity.graphAppend(want, corpus, vecs(Seq(14)),
        "vec_id", "embedding", k = 2, beam = 3, hops = 2, maxDegree = 3)
      val got2 = TxGraphStack.resolve(spark, root)
        .select("src_id", "nbr_id", "cos")
      assert(got2.exceptAll(want2).isEmpty && want2.exceptAll(got2).isEmpty,
        "post-takedown re-ingest drifted from append-over-pruned " +
          "(stale rows resurrected, or the new edges died)")
      // compaction: bit-identical serve, tombstone family retired
      val g2 = got2.localCheckpoint()
      assert(TxGraphStack.compactEdges(spark, root))
      val got3 = TxGraphStack.resolve(spark, root)
        .select("src_id", "nbr_id", "cos")
      assert(got3.exceptAll(g2).isEmpty && g2.exceptAll(got3).isEmpty,
        "compaction changed the served graph")
      assert(Manifest.read(spark, root).get.auxV.isEmpty,
        "compaction must retire the tombstone family")
      assert(TxGraphStack.vacuum(spark, root).deletedDirs > 0)
    } finally {
      graft.queries.FixtureCache.deleteRecursively(dir)
    }
  }

  test("repair composes with takedown to in-flow remove-then-repair semantics") {
    val dir = java.nio.file.Files.createTempDirectory("graft_gsrp")
    try {
      val root = dir.toString
      initStack(root)
      val g0 = TxGraphStack.resolve(spark, root)
        .select("src_id", "nbr_id", "cos").localCheckpoint()
      val rm = Seq(2L, 7L).toDF("vec_id")
      assert(TxGraphStack.commitRemove(spark, root, rm, 0L, "vec_id",
        buckets = 4))
      assert(TxGraphStack.commitRepair(spark, root, corpus, 1L,
        "vec_id", "embedding", k = 2, buckets = 4, beam = 3, hops = 2,
        maxDegree = 3))
      val surviving = corpus.join(rm.select($"vec_id"), Seq("vec_id"),
        "left_anti")
      val want = Similarity.graphRepair(g0, surviving, rm,
        "vec_id", "embedding", k = 2, beam = 3, hops = 2, maxDegree = 3)
      val got = TxGraphStack.resolve(spark, root)
        .select("src_id", "nbr_id", "cos")
      assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty,
        "commitRemove ∘ commitRepair drifted from in-flow graphRepair")
    } finally {
      graft.queries.FixtureCache.deleteRecursively(dir)
    }
  }

  test("repair evidence survives an interleaved append: touched buckets' dead rows ride through the rewrite") {
    val dir = java.nio.file.Files.createTempDirectory("graft_gsev")
    try {
      val root = dir.toString
      initStack(root)
      val before = TxGraphStack.resolve(spark, root).localCheckpoint()
      val rm = Seq(3L).toDF("vec_id")
      assert(TxGraphStack.commitRemove(spark, root, rm, 0L, "vec_id",
        buckets = 4))
      // the orphaned neighborhood: survivors that pointed at node 3
      val orphans = before.filter($"nbr_id" === 3L && $"src_id" =!= 3L)
        .select($"src_id").distinct().collect().map(_.getLong(0)).toSet
      assert(orphans.nonEmpty, "fixture must orphan someone")
      // an append touching EVERY bucket (ids 16..19 cover pmod 4):
      // its bucket rewrites must NOT purge the orphans' dead rows —
      // the evidence a later repair's election reads
      assert(commit(root, 16 to 19, 1L))
      def degrees = TxGraphStack.resolve(spark, root)
        .filter($"src_id".isin(orphans.toSeq.map(Long.box): _*))
        .groupBy("src_id").count().collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      // fixture sanity: at least one orphan still carries the lost
      // out-edge (degree < k) — otherwise the repair has nothing to
      // prove and the test passes vacuously
      val preRepair = degrees
      assert(orphans.exists(o => preRepair.getOrElse(o, 0L) < 2L),
        s"no orphan left under-degree before repair: $preRepair")
      assert(TxGraphStack.commitRepair(spark, root, corpus, 2L,
        "vec_id", "embedding", k = 2, buckets = 4, beam = 3, hops = 2,
        maxDegree = 3))
      val postRepair = degrees
      assert(orphans.forall(o => postRepair.getOrElse(o, 0L) >= 2L),
        "an orphan stayed under-degree after repair — its dead-row " +
          s"evidence was purged by the interleaved append: $postRepair")
    } finally {
      graft.queries.FixtureCache.deleteRecursively(dir)
    }
  }

  test("bucket-restricted resolve lists ONLY the elected pinned paths; rebucket migrates the pin map in one swap") {
    val dir = java.nio.file.Files.createTempDirectory("graft_gswit")
    try {
      val root = dir.toString
      initStack(root)
      commit(root, 12 to 16, 0L)
      val pins = Manifest.read(spark, root).get.statsV
      val k = pins.keys.min
      // PATH-level pruning witness: an unelected bucket's directory is
      // never even listed — stronger than a partition filter
      val files = TxGraphStack.resolve(spark, root,
        buckets = Some(Seq(k))).inputFiles
      assert(files.nonEmpty && files.forall(_.contains(s"/bkt=$k/")),
        s"restricted resolve read outside its elected bucket: " +
          files.filterNot(_.contains(s"/bkt=$k/")).take(3).mkString(","))
      // rebucket 4 → 8: rows identical, pin map on the new keyspace,
      // a reader can never observe the numberings interleaved
      val before = TxGraphStack.resolve(spark, root)
        .select("src_id", "nbr_id", "cos").localCheckpoint()
      assert(TxGraphStack.rebucket(spark, root, newBuckets = 8))
      val after = TxGraphStack.resolve(spark, root)
        .select("src_id", "nbr_id", "cos")
      assert(after.exceptAll(before).isEmpty &&
        before.exceptAll(after).isEmpty,
        "re-bucketing changed the served rows")
      assert(Manifest.read(spark, root).get.statsV.keys.exists(_ >= 4),
        "the pin map must move to the new keyspace")
      // appends continue under B′
      assert(TxGraphStack.commitBatch(spark, root, corpus,
        vecs(Seq(21)), 1L, "vec_id", "embedding", k = 2, buckets = 8,
        beam = 3, hops = 2, maxDegree = 3, corpusBuckets = Some(4)))
      assert(TxGraphStack.resolve(spark, root)
        .filter($"src_id" === 21L).count() > 0)
    } finally {
      graft.queries.FixtureCache.deleteRecursively(dir)
    }
  }

  test("snapshot pins an old cut; vacuum reclaims superseded versions + orphans, keeps live pins, bounds time travel") {
    val dir = java.nio.file.Files.createTempDirectory("graft_gsvc")
    try {
      val root = dir.toString
      initStack(root)
      commit(root, 12 to 16, 0L)
      val v1 = Manifest.read(spark, root).get.version
      val afterB0 = snap(root)
      commit(root, 16 to 21, 1L)
      assert(snap(root) != afterB0) // the head moved on
      val pinned = TxGraphStack.resolve(spark, root, version = Some(v1))
        .collect().map(_.toString).toSet
      assert(pinned == afterB0,
        "snapshot read drifted from the state committed as that version")
      // a crashed batch leaves orphan bucket writes
      commit(root, 18 to 21, 9L, publish = false)
      val before = snap(root)
      val vs = TxGraphStack.vacuum(spark, root, retainVersions = 0)
      assert(vs.deletedDirs > 0,
        "superseded bucket versions + the orphan must be reclaimed")
      assert(snap(root) == before, "vacuum changed the served state")
      assert(Manifest.readAt(spark, root, v1).isEmpty,
        "retain-0 vacuum must retire history below the head")
      // idempotent; and the stack still appends after a full vacuum
      assert(TxGraphStack.vacuum(spark, root).deletedDirs == 0)
      assert(commit(root, 18 to 21, 2L))
      assert(TxGraphStack.resolve(spark, root)
        .filter($"src_id" === 21L).count() > 0)
    } finally {
      graft.queries.FixtureCache.deleteRecursively(dir)
    }
  }
}
