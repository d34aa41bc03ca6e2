package graft.operators

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll
import org.apache.spark.sql.functions._
import graft.SparkSpec

/** ScalaCheck properties for the round-9 operators.
  *
  * The load-bearing claim of incremental cluster maintenance is an
  * algebraic identity: merging a batch's edges into an existing label
  * ledger through the super-node relabeling must equal re-running
  * connected components over the UNION graph — on any graph shape, not
  * just the near-clique ones the corpus produces. Randomized old/new
  * edge sets exercise chained merges (new edges bridging several old
  * components), batch-only components, old↔old re-detections, and
  * pure singleton batches. */
object Round9Props extends Properties("Round9") {

  private lazy val spark = SparkSpec.session
  import spark.implicits._

  override def overrideParameters(p: org.scalacheck.Test.Parameters) =
    p.withMinSuccessfulTests(8)

  private val oldIds = (0L until 20L).toList
  private val newIds = (20L until 28L).toList

  private def ccMap(edges: List[(Long, Long)], ids: List[Long]): Map[Long, Long] = {
    val cc =
      if (edges.isEmpty) Map.empty[Long, Long]
      else Dedup.connectedComponents(
          edges.toDF("a_id", "b_id"), "a_id", "b_id")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    ids.map(i => i -> cc.getOrElse(i, i)).toMap
  }

  property("connectedComponentsIncremental == CC over the union graph") =
    forAll(
      Gen.listOfN(15, Gen.zip(Gen.oneOf(oldIds), Gen.oneOf(oldIds))),
      // mostly batch-incident (the contract's shape), but old↔old pairs
      // are allowed too — re-detected corpus edges must merge correctly
      Gen.listOfN(10, Gen.zip(Gen.oneOf(oldIds ++ newIds),
        Gen.frequency(3 -> Gen.oneOf(newIds), 1 -> Gen.oneOf(oldIds))))
    ) { (oldRaw, newRaw) =>
      val oldEdges = oldRaw.filter { case (a, b) => a != b }
        .map { case (a, b) => (math.min(a, b), math.max(a, b)) }.distinct
      val newEdges = newRaw.filter { case (a, b) => a != b }
        .map { case (a, b) => (math.min(a, b), math.max(a, b)) }.distinct
      val ledger = ccMap(oldEdges, oldIds).toList.toDF("id", "cluster")
      val newEdgesDf =
        if (newEdges.isEmpty) Seq.empty[(Long, Long)].toDF("a_id", "b_id")
        else newEdges.toDF("a_id", "b_id")
      val got = Dedup.connectedComponentsIncremental(
          ledger, newIds.toDF("doc_id"), "doc_id", newEdgesDf, "a_id", "b_id")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val want = ccMap(oldEdges ++ newEdges, oldIds ++ newIds)
      got == want
    }

  /** dedupSpans against a sequential first-occurrence model: tiny
    * vocabulary + small span widths force heavy intra- and
    * cross-document span collisions. */
  property("dedupSpans == first-occurrence span model") =
    forAll(
      Gen.choose(1, 4),
      Gen.listOfN(8, Gen.choose(1, 9).flatMap(n =>
        Gen.listOfN(n, Gen.oneOf("aa", "bb", "cc")).map(_.mkString(" "))))
    ) { (k, texts) =>
      val docsL = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      val df = docsL.toDF("id", "text")
      val seen = scala.collection.mutable.Set.empty[String]
      val want = docsL.map { case (id, t) =>
        val spans = t.split(" ", -1).toList.grouped(k).map(_.mkString(" ")).toList
        val kept = spans.filter(seen.add)
        id -> ((kept.mkString(" "), spans.length, kept.length))
      }.toMap
      val got = Dedup.dedupSpans(df, "id", "text", k)
        .select("id", "text_dedup", "spans_total", "spans_kept")
        .collect()
        .map(r => r.getLong(0) -> ((r.getString(1), r.getInt(2), r.getInt(3))))
        .toMap
      got == want
    }

  /** The incremental face: ≡ the full-corpus model with the ledger's
    * spans pre-claimed (a ledger span can never survive; batch-internal
    * first occurrences behave exactly as in dedupSpans). */
  property("dedupSpansIncremental == model with pre-claimed ledger") =
    forAll(
      Gen.choose(1, 3),
      Gen.listOfN(6, Gen.choose(1, 7).flatMap(n =>
        Gen.listOfN(n, Gen.oneOf("aa", "bb", "cc")).map(_.mkString(" ")))),
      Gen.listOfN(3, Gen.choose(1, 4).flatMap(n =>
        Gen.listOfN(n, Gen.oneOf("aa", "bb", "cc")).map(_.mkString(" "))))
    ) { (k, batchTexts, ledgerTexts) =>
      val docsL = batchTexts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      val ledgerSpans = ledgerTexts.flatMap(
        _.split(" ", -1).toList.grouped(k).map(_.mkString(" "))).toSet
      val seen = scala.collection.mutable.Set.empty[String] ++= ledgerSpans
      val want = docsL.map { case (id, t) =>
        val spans = t.split(" ", -1).toList.grouped(k).map(_.mkString(" ")).toList
        val kept = spans.filter(seen.add)
        id -> ((kept.mkString(" "), kept.length))
      }.toMap
      val ledger = ledgerSpans.toList.toDF("t").select(md5(col("t")).as("h"))
      val got = Dedup.dedupSpansIncremental(
          docsL.toDF("id", "text"), "id", "text", ledger, "h", k)
        .select("id", "text_dedup", "spans_kept")
        .collect()
        .map(r => r.getLong(0) -> ((r.getString(1), r.getInt(2))))
        .toMap
      got == want
    }

  /** Deletion maintenance ≡ CC over the remaining graph — including
    * SPLITS (removed bridge nodes), the case no label mapping covers.
    * The band index is synthesized one unique band key per edge, so
    * the operator's band self-join reproduces exactly the survivor-
    * restricted edge set. */
  property("connectedComponentsRemove == CC over the remaining graph") =
    forAll(
      Gen.listOfN(18, Gen.zip(Gen.oneOf(oldIds), Gen.oneOf(oldIds))),
      Gen.someOf(oldIds)
    ) { (raw, rmRaw) =>
      val edges = raw.filter { case (a, b) => a != b }
        .map { case (a, b) => (math.min(a, b), math.max(a, b)) }.distinct
      val rm = rmRaw.toList
      val ledger = ccMap(edges, oldIds).toList.toDF("id", "cluster")
      val bandIndex = edges.zipWithIndex.flatMap { case ((a, b), j) =>
        Seq((a, j, s"k$j"), (b, j, s"k$j"))
      }.toDF("id", "band", "bk")
      val rmDf =
        if (rm.isEmpty) Seq.empty[Long].toDF("doc_id")
        else rm.toDF("doc_id")
      val got = Dedup.connectedComponentsRemove(ledger, rmDf, "doc_id", bandIndex)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val keep = oldIds.filterNot(rm.contains)
      val want = ccMap(
        edges.filter { case (a, b) => !rm.contains(a) && !rm.contains(b) },
        keep)
      got == want
    }

  private def md5Hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  /** shardManifest against the serial per-source prefix-sum model, and
    * prefix-invariance: the bucketed two-phase prefix must equal the
    * global draw-order cumsum for ANY bucket width. */
  property("shardManifest == serial prefix model, prefix-invariant") =
    forAll(
      Gen.choose(1L, 20L),
      Gen.listOfN(12, Gen.zip(Gen.oneOf("s0", "s1"), Gen.choose(0L, 9L)))
    ) { (shardTok, rows) =>
      val docsL = rows.zipWithIndex.map { case ((src, tk), i) =>
        (i.toLong, src, tk)
      }
      val df = docsL.toDF("id", "src", "tk")
      val want = docsL.groupBy(_._2).flatMap { case (_, g) =>
        val ordered = g.sortBy { case (id, _, _) => (md5Hex(s"graft:$id"), id) }
        ordered.scanLeft((-1L, 0L)) { case ((_, cum), (id, _, tk)) =>
          (id, cum + tk)
        }.sliding(2).collect { case Seq((_, prior), (id, _)) =>
          id -> ((prior, prior / shardTok))
        }
      }.toMap
      Seq(1, 2).forall { pl =>
        val got = graft.operators.Pack.shardManifest(
            df, col("src"), col("id"), col("tk"), shardTok, prefixLen = pl)
          .select("id", "shard_tok0", "shard_id")
          .collect()
          .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2))))
          .toMap
        got == want
      }
    }
}
