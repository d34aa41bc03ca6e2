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
}
