package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** [[TxSemanticStack]] — the semantic-dedup family's three assets
  * under the manifest protocol. The load-bearing claims: (1) the
  * dual-keyed label views agree at EVERY committed cut (the one-swap
  * commit makes the in-place drain's torn-views window structurally
  * impossible); (2) a crashed batch is invisible and its replay
  * converges to the straight-through state; (3) the incremental drain
  * equals a from-scratch CC over everything arrived; (4) snapshot +
  * vacuum behave as on the other stacks. */
class SemanticStackSpec extends SparkSpec {
  import spark.implicits._

  private val dim = 64
  // near-dup structure by construction: ids sharing i % 5 == 3's class
  // get IDENTICAL vectors (cos = 1 pairs); everything else is unique
  private def vec(i: Int): Array[Float] = {
    val seed = if (i % 5 == 3) 3 else i
    Array.tabulate(dim)(j => (((seed * 31 + j * 7) % 17) - 8) / 8.0f)
  }
  private def vecs(ids: Seq[Int]) =
    ids.map(i => (i.toLong, vec(i))).toDF("vec_id", "embedding")

  private val base = vecs(0 until 10)
  private val all = vecs(0 until 16)
  private lazy val cb = Similarity.pqCodebookSeed(base,
    "vec_id", "embedding", m = 8, ksub = 4, subDim = 8)

  private def initStack(root: String): Unit = {
    val pairs0 = Similarity.semanticPqPairs(base, cb, "vec_id",
      "embedding", threshold = 0.95, prefix = 2)
    val cc0 = Dedup.connectedComponents(pairs0, "a_id", "b_id")
    val ledger0 = base.select($"vec_id".as("id"))
      .join(cc0, Seq("id"), "left")
      .select($"id", coalesce($"cluster", $"id").as("cluster"))
    val idx0 = Similarity.semanticBlockIndex(base, cb, "vec_id",
      "embedding", prefix = 2)
    TxSemanticStack.init(spark, root, ledger0, idx0, buckets = 4)
  }

  private def commit(root: String, ids: Seq[Int], id: Long,
                     publish: Boolean = true): Boolean =
    TxSemanticStack.commitBatch(spark, root, vecs(ids), id, cb, all,
      "vec_id", "embedding", threshold = 0.95, prefix = 2, buckets = 4,
      publish = publish)

  private def labels(root: String): Set[(Long, Long)] =
    TxSemanticStack.resolveLabels(spark, root).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

  /** From-scratch truth over an arrived id set: global CC over the
    * full blocked-pair graph. */
  private def truthOver(ids: Seq[Int]): Set[(Long, Long)] = {
    val arrived = vecs(ids)
    val pairs = Similarity.semanticPqPairs(arrived, cb, "vec_id",
      "embedding", threshold = 0.95, prefix = 2)
    val cc = Dedup.connectedComponents(pairs, "a_id", "b_id")
    arrived.select($"vec_id".as("id"))
      .join(cc, Seq("id"), "left")
      .select($"id", coalesce($"cluster", $"id").as("cluster"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
  }
  private def truth(n: Int): Set[(Long, Long)] = truthOver(0 until n)

  private def viewsAgree(root: String): Boolean = {
    val byId = TxSemanticStack.resolveLabels(spark, root)
    val byCl = TxSemanticStack.resolveLabelsByCluster(spark, root)
    byId.exceptAll(byCl).isEmpty && byCl.exceptAll(byId).isEmpty
  }

  test("incremental drain == from-scratch CC at every cut; dual-keyed views agree at every cut") {
    val dir = java.nio.file.Files.createTempDirectory("graft_ssinc")
    try {
      val root = dir.toString
      initStack(root)
      assert(labels(root) == truth(10))
      assert(viewsAgree(root))
      // batch 1 carries a MERGE: id 13 duplicates the 3/8 component
      commit(root, 10 to 13, 0L)
      assert(labels(root) == truth(14),
        "incremental labels drifted from batch-global CC")
      assert(viewsAgree(root), "the one-swap commit left views apart")
      commit(root, 13 to 15, 1L) // one-id overlap absorbed
      assert(labels(root) == truth(16))
      assert(viewsAgree(root))
    } finally {
      graft.queries.FixtureCache.deleteRecursively(dir)
    }
  }

  test("uncommitted batch invisible across ALL THREE assets; crash replay converges") {
    val dirA = java.nio.file.Files.createTempDirectory("graft_ssa")
    val dirB = java.nio.file.Files.createTempDirectory("graft_ssb")
    try {
      initStack(dirA.toString); initStack(dirB.toString)
      commit(dirA.toString, 10 to 13, 0L)
      commit(dirA.toString, 13 to 15, 1L)
      commit(dirB.toString, 10 to 13, 0L)
      val lb0 = labels(dirB.toString)
      val idx0 = TxSemanticStack.resolveBlockIndex(spark, dirB.toString)
        .collect().map(_.toString).toSet
      commit(dirB.toString, 13 to 15, 1L, publish = false)
      assert(labels(dirB.toString) == lb0,
        "label writes before the swap leaked")
      assert(TxSemanticStack.resolveBlockIndex(spark, dirB.toString)
        .collect().map(_.toString).toSet == idx0,
        "block-index delta before the swap leaked")
      assert(viewsAgree(dirB.toString))
      // replay re-derives from the committed cut and commits once
      commit(dirB.toString, 13 to 15, 1L)
      assert(labels(dirB.toString) == labels(dirA.toString),
        "crash + replay drifted from the straight-through run")
      // high-water: replaying the committed batch is a no-op
      assert(!commit(dirB.toString, 13 to 15, 1L))
    } finally {
      graft.queries.FixtureCache.deleteRecursively(dirA)
      graft.queries.FixtureCache.deleteRecursively(dirB)
    }
  }

  test("takedown: component splits re-propagate exactly; re-ingest after takedown lands past its tombstone") {
    val dir = java.nio.file.Files.createTempDirectory("graft_ssrm")
    try {
      val root = dir.toString
      initStack(root)
      commit(root, 10 to 13, 0L)
      // node 3 bridges the {3, 8, 13} component — removing it splits
      val rm = Seq(3L).toDF("vec_id")
      // crash face first: invisible
      TxSemanticStack.commitRemove(spark, root, rm, 1L, all,
        "vec_id", "embedding", threshold = 0.95, buckets = 4,
        publish = false)
      assert(labels(root) == truth(14), "uncommitted takedown leaked")
      assert(TxSemanticStack.commitRemove(spark, root, rm, 1L, all,
        "vec_id", "embedding", threshold = 0.95, buckets = 4))
      val survivors = (0 until 14).filterNot(_ == 3)
      assert(labels(root) == truthOver(survivors),
        "takedown drifted from never-having-ingested the removed id")
      assert(viewsAgree(root), "takedown desynchronized the views")
      // re-ingest id 3 (batch also carries 14): the ordered tombstone
      // lets the re-arrival land — labels equal the full truth again
      assert(commit(root, Seq(3, 14), 2L))
      assert(labels(root) == truth(15),
        "post-takedown re-ingest did not land (dead block rows paired," +
          " or the tombstone outlived the re-arrival)")
      assert(viewsAgree(root))
    } finally {
      graft.queries.FixtureCache.deleteRecursively(dir)
    }
  }

  test("bucket-restricted label resolve lists ONLY the elected pinned paths") {
    val dir = java.nio.file.Files.createTempDirectory("graft_sswit")
    try {
      val root = dir.toString
      initStack(root)
      commit(root, 10 to 13, 0L)
      val pins = Manifest.read(spark, root).get.statsV
      val k = pins.keys.min
      val files = TxSemanticStack.resolveLabels(spark, root,
        idBuckets = Some(Seq(k))).inputFiles
      assert(files.nonEmpty && files.forall(_.contains(s"/bkt=$k/")),
        s"restricted resolve read outside its elected bucket: " +
          files.filterNot(_.contains(s"/bkt=$k/")).take(3).mkString(","))
    } finally {
      graft.queries.FixtureCache.deleteRecursively(dir)
    }
  }

  test("snapshot pins an old cut; vacuum reclaims superseded versions + orphans on all families, keeps live pins") {
    val dir = java.nio.file.Files.createTempDirectory("graft_ssvc")
    try {
      val root = dir.toString
      initStack(root)
      commit(root, 10 to 13, 0L)
      val v1 = Manifest.read(spark, root).get.version
      val lb1 = labels(root)
      commit(root, 13 to 15, 1L)
      assert(labels(root) != lb1) // the head moved (15 never arrived at v1)
      val pinned = TxSemanticStack.resolveLabels(spark, root,
          version = Some(v1))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(pinned == lb1,
        "snapshot read drifted from the state committed as that version")
      commit(root, 14 to 15, 9L, publish = false) // orphan
      val before = labels(root)
      val vs = TxSemanticStack.vacuum(spark, root, retainVersions = 0)
      assert(vs.deletedDirs > 0,
        "superseded label versions + the orphan must be reclaimed")
      assert(labels(root) == before, "vacuum changed the served state")
      assert(viewsAgree(root),
        "vacuum desynchronized the dual-keyed views")
      assert(Manifest.readAt(spark, root, v1).isEmpty,
        "retain-0 vacuum must retire history below the head")
      assert(TxSemanticStack.vacuum(spark, root).deletedDirs == 0)
    } finally {
      graft.queries.FixtureCache.deleteRecursively(dir)
    }
  }
}
