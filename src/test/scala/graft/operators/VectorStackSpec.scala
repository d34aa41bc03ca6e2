package graft.operators

import graft.SparkSpec
import graft.Tables
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** [[TxVectorStack]] — the manifest protocol on the IVF-PQ serve
  * stack. Load-bearing claims: (1) arrivals under a pinned quantizer
  * compose to exactly a from-scratch build; (2) nothing a crashed
  * commit or refresh wrote is visible, and replay converges; (3) a
  * committed refresh atomically swaps codes AND quantizer to the new
  * version, bit-equal to a from-scratch build under the new
  * quantizer; (4) snapshot reads pin the old index; (5) vacuum
  * reclaims the superseded quantizer/codes without touching a live
  * pin. */
class VectorStackSpec extends SparkSpec {
  import spark.implicits._

  private lazy val emb = Tables.embeddings(spark, sf)
  private lazy val corpus = emb.filter($"vec_id" < 100).cache()
  private def centA = emb.filter($"vec_id" < 16)
    .select($"vec_id".cast("int").as("cell"), $"embedding".as("c_vec"))
  private def cbA = Similarity.pqCodebookSeed(
    emb, "vec_id", "embedding", m = 8, ksub = 16, subDim = 8)
  // quantizer B: seeded from corpus vectors 16..31 (re-based to 0..15)
  private def centB = emb.filter($"vec_id" >= 16 && $"vec_id" < 32)
    .select(($"vec_id" - 16).cast("int").as("cell"),
      $"embedding".as("c_vec"))
  private def cbB = Similarity.pqCodebookSeed(
    emb.withColumn("vec_id", $"vec_id" - 16).filter($"vec_id" >= 0),
    "vec_id", "embedding", m = 8, ksub = 16, subDim = 8)

  private def canon(df: DataFrame): Set[String] =
    df.select($"vec_id", $"cell", array_join($"codes", ",").as("c"))
      .collect().map(_.toString).toSet

  private def ledgerAt(root: String, v: Option[Long] = None): DataFrame =
    TxVectorStack.resolve(spark, root, v)._1

  test("init + batched arrivals == from-scratch build under the pinned quantizer; crash face + replay") {
    val dir = java.nio.file.Files.createTempDirectory("graft_vxa")
    try {
      val root = dir.toString
      TxVectorStack.init(spark, root, centA, cbA)
      val b0 = corpus.filter($"vec_id" < 40)
      val b1 = corpus.filter($"vec_id" >= 30) // 10-id replay overlap
      TxVectorStack.commitBatch(spark, root, b0, 0L,
        "vec_id", "embedding", buckets = 4)
      val after0 = canon(ledgerAt(root))
      assert(after0 == canon(Similarity.pqIndexBuild(b0, centA, cbA,
        "vec_id", "embedding")))
      // crash face: batch 1's assets land, the swap never runs
      TxVectorStack.commitBatch(spark, root, b1, 1L,
        "vec_id", "embedding", buckets = 4, publish = false)
      assert(canon(ledgerAt(root)) == after0,
        "uncommitted codes leaked to a reader")
      // replay commits; overlap absorbed by the anti-join
      assert(TxVectorStack.commitBatch(spark, root, b1, 1L,
        "vec_id", "embedding", buckets = 4))
      assert(canon(ledgerAt(root)) == canon(Similarity.pqIndexBuild(
        corpus, centA, cbA, "vec_id", "embedding")),
        "arrivals drifted from a from-scratch build")
      // high-water: replaying a committed batch is a no-op
      assert(!TxVectorStack.commitBatch(spark, root, b1, 1L,
        "vec_id", "embedding", buckets = 4))
    } finally {
      graft.queries.FixtureCache.deleteRecursively(dir)
    }
  }

  test("refresh: atomic quantizer+codes swap, bit-equal to a from-scratch build under B; snapshot pins A; vacuum reclaims") {
    val dir = java.nio.file.Files.createTempDirectory("graft_vxr")
    try {
      val root = dir.toString
      TxVectorStack.init(spark, root, centA, cbA)
      TxVectorStack.commitBatch(spark, root,
        corpus.filter($"vec_id" < 50), 0L, "vec_id", "embedding", 4)
      TxVectorStack.commitBatch(spark, root,
        corpus.filter($"vec_id" >= 50), 1L, "vec_id", "embedding", 4)
      val underA = canon(ledgerAt(root))
      val vA = Manifest.read(spark, root).get.version
      // crash face: re-encoded base + new quant written, no swap
      TxVectorStack.refresh(spark, root, corpus, centB, cbB,
        "vec_id", "embedding", buckets = 4, publish = false)
      assert(canon(ledgerAt(root)) == underA,
        "uncommitted refresh leaked to a reader")
      // committed refresh: both pointers move in one swap
      assert(TxVectorStack.refresh(spark, root, corpus, centB, cbB,
        "vec_id", "embedding", buckets = 4))
      val st = Manifest.read(spark, root).get
      assert(st.baseV == st.globalV && st.baseV > vA,
        "codes base and quantizer must pin the same new version")
      assert(canon(ledgerAt(root)) == canon(Similarity.pqIndexBuild(
        corpus, centB, cbB, "vec_id", "embedding")),
        "refresh drifted from a from-scratch quantizer-B build")
      // the refreshed base is the codes compaction: 1 file per bucket
      val counts = Ledger.bucketFileCounts(spark,
        s"$root/codes/base/v=${st.baseV}")
      assert(counts.nonEmpty && counts.values.forall(_ == 1),
        s"refreshed base must hold one file per bucket: $counts")
      // snapshot: the pre-refresh version still serves quantizer A
      assert(canon(ledgerAt(root, Some(vA))) == underA,
        "snapshot read lost the pre-refresh index")
      // a post-refresh arrival composes with the new base
      // (ids 100.. are fresh; encoded under the PINNED quantizer B)
      TxVectorStack.commitBatch(spark, root,
        emb.filter($"vec_id" >= 100 && $"vec_id" < 110), 2L,
        "vec_id", "embedding", 4)
      assert(canon(ledgerAt(root)) == canon(Similarity.pqIndexBuild(
        emb.filter($"vec_id" < 110), centB, cbB, "vec_id", "embedding")),
        "post-refresh arrival drifted from a from-scratch build")
      // vacuum with retention keeps vA servable; retain-0 reclaims
      // quantizer A + the refreshed-away deltas and ends time travel
      val before = canon(ledgerAt(root))
      val vs1 = TxVectorStack.vacuum(spark, root,
        retainVersions = (st.version - vA + 1).toInt)
      assert(canon(ledgerAt(root, Some(vA))) == underA,
        "vacuum deleted a retained snapshot's pins")
      val vs2 = TxVectorStack.vacuum(spark, root, retainVersions = 0)
      assert(vs1.deletedDirs + vs2.deletedDirs > 0,
        "refresh strands the old quantizer + deltas; vacuum must reclaim")
      assert(canon(ledgerAt(root)) == before,
        "vacuum changed the served index")
      assert(Manifest.readAt(spark, root, vA).isEmpty,
        "retired history must end time travel")
      val f = new org.apache.hadoop.fs.Path(root)
        .getFileSystem(spark.sessionState.newHadoopConf())
      assert(!f.exists(new org.apache.hadoop.fs.Path(
        s"$root/quant/v=0")), "superseded quantizer survived vacuum")
    } finally {
      graft.queries.FixtureCache.deleteRecursively(dir)
    }
  }

  test("commitDelete: tombstoned serve == survivor build; era semantics; refresh purges and re-encodes survivors only") {
    val dir = java.nio.file.Files.createTempDirectory("graft_vxd")
    try {
      val root = dir.toString
      TxVectorStack.init(spark, root, centA, cbA)
      TxVectorStack.commitBatch(spark, root, corpus, 0L,
        "vec_id", "embedding", 4)
      val before = canon(ledgerAt(root))
      // crash face: tombstone written, swap skipped
      TxVectorStack.commitDelete(spark, root,
        Seq(7L, 21L).toDF("vec_id"), 1L, "vec_id", 4, publish = false)
      assert(canon(ledgerAt(root)) == before, "uncommitted delete leaked")
      assert(TxVectorStack.commitDelete(spark, root,
        Seq(7L, 21L).toDF("vec_id"), 1L, "vec_id", 4))
      val survivors = corpus.filter(!$"vec_id".isin(7L, 21L))
      assert(canon(ledgerAt(root)) == canon(Similarity.pqIndexBuild(
        survivors, centA, cbA, "vec_id", "embedding")),
        "tombstoned ledger drifted from a survivor build")
      // ordered tombstones: a post-delete re-ingest LANDS (born after
      // the tombstone's asof)
      TxVectorStack.commitBatch(spark, root,
        corpus.filter($"vec_id" === 7L), 2L, "vec_id", "embedding", 4)
      val withReadd = survivors.unionByName(corpus.filter($"vec_id" === 7L))
      assert(canon(ledgerAt(root)) == canon(Similarity.pqIndexBuild(
        withReadd, centA, cbA, "vec_id", "embedding")),
        "post-delete re-ingest did not land as a new member")
      // refresh purges tombstones and re-encodes the LIVE membership
      assert(TxVectorStack.refresh(spark, root, corpus, centB, cbB,
        "vec_id", "embedding", buckets = 4))
      assert(canon(ledgerAt(root)) == canon(Similarity.pqIndexBuild(
        withReadd, centB, cbB, "vec_id", "embedding")),
        "refresh drifted from the live membership")
    } finally {
      graft.queries.FixtureCache.deleteRecursively(dir)
    }
  }

  test("commitUpsert: one commit replaces a vector — stale codes retire, the replacement serves, refresh carries it") {
    val dir = java.nio.file.Files.createTempDirectory("graft_vxu")
    try {
      val root = dir.toString
      TxVectorStack.init(spark, root, centA, cbA)
      TxVectorStack.commitBatch(spark, root, corpus, 0L,
        "vec_id", "embedding", 4)
      // vec 7 re-embeds as a rotation of itself; vec 200 is new
      val rot = emb.filter($"vec_id" === 7L || $"vec_id" === 200L)
        .select($"vec_id", concat(slice($"embedding", 33, 32),
          slice($"embedding", 1, 32)).as("embedding"))
      val before = canon(ledgerAt(root))
      TxVectorStack.commitUpsert(spark, root, rot, 1L,
        "vec_id", "embedding", 4, publish = false)
      assert(canon(ledgerAt(root)) == before, "uncommitted upsert leaked")
      assert(TxVectorStack.commitUpsert(spark, root, rot, 1L,
        "vec_id", "embedding", 4))
      val updated = corpus.select($"vec_id", $"embedding")
        .filter($"vec_id" =!= 7L).unionByName(rot)
      assert(canon(ledgerAt(root)) == canon(Similarity.pqIndexBuild(
        updated, centA, cbA, "vec_id", "embedding")),
        "upserted codes drifted from a from-scratch updated build")
      // refresh re-encodes the updated membership's CURRENT floats —
      // the corpus passed to refresh carries the updated vectors
      val corpusNow = updated
      assert(TxVectorStack.refresh(spark, root, corpusNow, centB, cbB,
        "vec_id", "embedding", buckets = 4))
      assert(canon(ledgerAt(root)) == canon(Similarity.pqIndexBuild(
        updated, centB, cbB, "vec_id", "embedding")),
        "refresh lost the upserted state")
    } finally {
      graft.queries.FixtureCache.deleteRecursively(dir)
    }
  }

  test("serve through the stack == ivfPqTopKFromIndex over an in-flow ledger") {
    val dir = java.nio.file.Files.createTempDirectory("graft_vxs")
    try {
      val root = dir.toString
      TxVectorStack.init(spark, root, centA, cbA)
      TxVectorStack.commitBatch(spark, root, corpus, 0L,
        "vec_id", "embedding", 4)
      val (ledger, cent, cb) = TxVectorStack.resolve(spark, root)
      val q = corpus.filter($"vec_id" < 5)
      val got = Similarity.ivfPqTopKFromIndex(q, ledger, cent, cb,
        "vec_id", "embedding", k = 5, nProbe = 4)
      val want = Similarity.ivfPqTopKFromIndex(q,
        Similarity.pqIndexBuild(corpus, centA, cbA, "vec_id", "embedding"),
        centA, cbA, "vec_id", "embedding", k = 5, nProbe = 4)
      assert(got.collect().map(_.toString).sorted.toSeq ==
        want.collect().map(_.toString).sorted.toSeq,
        "stack-resolved serve drifted from the in-flow serve")
    } finally {
      graft.queries.FixtureCache.deleteRecursively(dir)
    }
  }
}
