package graft.operators

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll
import org.apache.spark.sql.functions._
import graft.SparkSpec

/** ScalaCheck properties for the round-8 operators, each against a
  * direct Scala model or an algebraic identity on randomized inputs
  * (the [[OperatorProps]] style).
  *
  * The two identities here are the operators' load-bearing claims:
  * token-budget mixing's bucketed two-phase prefix sum must equal the
  * naive global running sum EXACTLY (the bucketing is a parallelism
  * rewrite, not an approximation), and compound-key simhash blocking
  * must equal the unblocked pair set filtered to equal block keys (a
  * pure candidate-space restriction, never a new pair). */
object Round8Props extends Properties("Round8") {

  private lazy val spark = SparkSpec.session
  import spark.implicits._

  override def overrideParameters(p: org.scalacheck.Test.Parameters) =
    p.withMinSuccessfulTests(5)

  // tokenBudgetPerSource == per-source exclusive-prefix-sum model
  property("tokenBudgetPerSource == draw-ordered running-sum model") =
    forAll(
      Gen.listOfN(80, Gen.zip(Gen.choose(0, 3), Gen.choose(0L, 40L))),
      Gen.choose(1L, 200L)
    ) { (raw, budget) =>
      val rows = raw.zipWithIndex.map { case ((s, t), i) =>
        (i.toLong, s"s$s", t)
      }
      val df = rows.toDF("id", "src", "toks")
      val budgets = rows.map(_._2).distinct.map(s => (s, budget))
        .toDF("source", "token_budget")
      val got = Sampling.tokenBudgetPerSource(
        df, $"src", $"id", $"toks", budgets)
        .select("id").as[Long].collect().toSet
      // model: per source, order by (md5("graft:" || id), id), admit
      // while the tokens BEFORE the row are under the budget
      val md5 = java.security.MessageDigest.getInstance("MD5")
      def draw(id: Long) = md5.digest(s"graft:$id".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      val want = rows.groupBy(_._2).values.flatMap { grp =>
        val ordered = grp.sortBy(r => (draw(r._1), r._1))
        val priors = ordered.map(_._3).scanLeft(0L)(_ + _)
        ordered.zip(priors).collect { case ((id, _, _), p) if p < budget => id }
      }.toSet
      got == want
    }

  // blocked simhash pairs == unblocked pairs ∩ equal-block pairs
  property("simhashPairs(blockCol) == unblocked pairs filtered to equal blocks") =
    forAll(Gen.listOfN(24, Gen.zip(
      Gen.choose(0, 1), // block id
      Gen.listOfN(12, Gen.oneOf("alpha", "beta", "gamma", "delta", "x"))
    ))) { raw =>
      val docs = raw.zipWithIndex.map { case ((b, ws), i) =>
        (i.toLong, ws.mkString(" "), s"b$b")
      }.toDF("doc_id", "text", "blk")
      val blocked = Dedup.simhashPairs(docs, "doc_id", "text",
          bits = 32, chunks = 4, maxHamming = 2, blockCol = Some(col("blk")))
        .select("a_id", "b_id").as[(Long, Long)].collect().toSet
      val unblocked = Dedup.simhashPairs(docs, "doc_id", "text",
          bits = 32, chunks = 4, maxHamming = 2)
        .select("a_id", "b_id").as[(Long, Long)].collect().toSet
      val blockOf = raw.zipWithIndex
        .map { case ((b, _), i) => i.toLong -> b }.toMap
      blocked == unblocked.filter { case (a, b) => blockOf(a) == blockOf(b) }
    }
}
