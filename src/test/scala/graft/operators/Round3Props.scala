package graft.operators

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll
import org.apache.spark.sql.functions._
import graft.SparkSpec

/** ScalaCheck properties for the round-3 curation operators: each checks
  * the distributed implementation against a direct single-threaded Scala
  * model on random inputs. */
object Round3Props extends Properties("Round3") {

  private lazy val spark = SparkSpec.session
  import spark.implicits._

  override def overrideParameters(p: org.scalacheck.Test.Parameters) =
    p.withMinSuccessfulTests(5)

  private def md5Hex(s: String): String = {
    val d = java.security.MessageDigest.getInstance("MD5")
    d.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
  }

  // stratifiedSample == the per-row hash-threshold model, exactly
  property("stratifiedSample == md5-threshold model") =
    forAll(
      Gen.listOfN(200, Gen.zip(Gen.choose(0L, 100000L), Gen.oneOf("en", "de", "zh"))),
      Gen.choose(0.05, 0.95)
    ) { (rows, fraction) =>
      val df = rows.toDF("id", "lang")
      val got = Sampling.stratifiedSample(df, $"lang", $"id", fraction)
        .select("id", "lang").collect().map(r => (r.getLong(0), r.getString(1))).toSet
      val thr = Sampling.hexThreshold(fraction)
      val want = rows.filter { case (id, lang) =>
        md5Hex(s"graft:$lang:$id").substring(0, 8) < thr
      }.toSet
      got == want
    }

  // quotaPerGroup == sort-by-(salted-md5, key) take-n model
  property("quotaPerGroup == per-group hash-order take(n) model") =
    forAll(
      Gen.listOfN(120, Gen.zip(Gen.choose(0L, 400L), Gen.oneOf("a", "b", "c", "d"))),
      Gen.choose(1, 6)
    ) { (raw, n) =>
      val rows = raw.distinct // duplicate (id, grp) rows tie on the order key
      val df = rows.toDF("id", "grp")
      val got = Sampling.quotaPerGroup(df, $"grp", $"id", n)
        .collect().map(r => (r.getLong(0), r.getString(1))).toSet
      // .values (not a Map.flatMap, which would re-key by id and drop
      // ids present in several groups)
      val want = rows.groupBy(_._2).values.flatMap { members =>
        members.sortBy { case (id, _) => (md5Hex(s"graft:$id"), id) }.take(n)
      }.toSet
      got == want
    }

  // asof joins == the per-row nearest-match model, including ties and
  // NULL value columns (the r2 ADVICE blending hazard, generalized)
  property("asofJoinBackward/Forward == nearest-match model") =
    forAll(
      Gen.listOfN(40, Gen.zip(Gen.choose(0L, 5L), Gen.choose(0L, 50L))),
      Gen.listOfN(40, Gen.zip(Gen.choose(0L, 5L), Gen.choose(0L, 50L),
        Gen.option(Gen.choose(0L, 9L))))
    ) { (leftRaw, rightRaw) =>
      // dedup right per (key, ts): the documented ASOF tie contract
      val right = rightRaw.groupBy(r => (r._1, r._2)).values.map(_.maxBy(_._3)).toList
      val left = leftRaw.zipWithIndex.map { case ((k, ts), i) => (i.toLong, k, ts) }
      val lDf = left.toDF("id", "k", "ts")
      val rDf = right.toDF("k", "rts", "v")
      def collectVals(out: org.apache.spark.sql.DataFrame) =
        out.select("id", "v").collect()
          .map(r => r.getLong(0) -> Option(r.get(1)).map(_.asInstanceOf[Long])).toMap
      def run(forward: Boolean) = collectVals(
        if (forward) Temporal.asofJoinForward(lDf, rDf, "k", "ts", "rts", Seq("v"))
        else Temporal.asofJoinBackward(lDf, rDf, "k", "ts", "rts", Seq("v")))
      def model(forward: Boolean) = left.map { case (id, k, ts) =>
        val cands = right.filter(r => r._1 == k &&
          (if (forward) r._2 >= ts else r._2 <= ts))
        val best =
          if (cands.isEmpty) None
          else Some(if (forward) cands.minBy(_._2) else cands.maxBy(_._2))
        id -> best.flatMap(_._3) // a legitimately-NULL value stays NULL
      }.toMap
      val nearestGot = collectVals(
        Temporal.asofJoinNearest(lDf, rDf, "k", "ts", "rts", Seq("v")))
      val nearestWant = left.map { case (id, k, ts) =>
        val cands = right.filter(_._1 == k)
        val best =
          if (cands.isEmpty) None
          // min gap; ties → backward (ts <= left sorts first via the
          // direction flag), then the (key, ts)-deduped row is unique
          else Some(cands.minBy(r => (math.abs(r._2 - ts), if (r._2 <= ts) 0 else 1)))
        id -> best.flatMap(_._3)
      }.toMap
      run(forward = false) == model(forward = false) &&
        run(forward = true) == model(forward = true) &&
        nearestGot == nearestWant
    }

  // connectedComponents == union-find on random sparse graphs
  property("connectedComponents == union-find model") =
    forAll(Gen.listOfN(30, Gen.zip(Gen.choose(0L, 19L), Gen.choose(0L, 19L)))
      .map(_.collect { case (a, b) if a != b => (math.min(a, b), math.max(a, b)) }
        .distinct)
      .suchThat(_.nonEmpty)
    ) { pairs =>
      val df = pairs.toDF("a_id", "b_id")
      val got = Dedup.connectedComponents(df, "a_id", "b_id")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      // union-find model
      val parent = scala.collection.mutable.Map[Long, Long]()
      def find(x: Long): Long = {
        val p = parent.getOrElseUpdate(x, x)
        if (p == x) x else { val r = find(p); parent(x) = r; r }
      }
      pairs.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val nodes = pairs.flatMap(p => Seq(p._1, p._2)).distinct
      val roots = nodes.map(find) // min-id root by construction of union
      val want = nodes.zip(roots).toMap
      got == want
    }
}
