package graft.operators

import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.forAll
import org.apache.spark.sql.functions._
import graft.SparkSpec

/** ScalaCheck properties for the null-semantics triad (SURVEY.md §7.4.2):
  * each property generates random cases, round-trips them through the
  * Spark expression in ONE job, and compares row-wise against a direct
  * Scala model of the reference's Python semantics. */
object NullSemanticsProps extends Properties("NullSemantics") {

  private lazy val spark = SparkSpec.session
  import spark.implicits._

  override def overrideParameters(p: org.scalacheck.Test.Parameters) =
    p.withMinSuccessfulTests(5)

  private val genOptTs: Gen[Option[Long]] =
    Gen.option(Gen.choose(0L, 4000000000L))

  // W1: dentro_do_periodo — null ts passes; each bound optional
  property("withinPeriod == reference model") =
    forAll(Gen.listOfN(100, Gen.zip(genOptTs, genOptTs, genOptTs))) { cases =>
      val df = cases.toDF("ts", "de", "ate").select(
        Relational.withinPeriod(
          timestamp_seconds($"ts"), timestamp_seconds($"de"),
          timestamp_seconds($"ate")).as("got"))
      val got = df.collect().map(r => r.getBoolean(0))
      val want = cases.map { case (ts, de, ate) =>
        ts.isEmpty || ((de.isEmpty || ts.get >= de.get) && (ate.isEmpty || ts.get <= ate.get))
      }
      got.toSeq == want
    }

  // F3: lista_movimentos ordering — nulls first (as epoch), then ascending
  property("sortMovimentos == sortBy(getOrElse(epoch))") =
    forAll(Gen.listOfN(30, Gen.listOfN(6, genOptTs))) { arrays =>
      val df = arrays.map(_.zipWithIndex.map { case (ts, i) => (i.toLong, ts) })
        .toDF("mov")
        .select(graft.pipeline.Hits.sortMovimentos(
          transform($"mov", m => struct(m("_1").as("codigo"),
            lit("x").as("nome"),
            timestamp_seconds(m("_2")).as("dataHora")))).as("sorted"))
      val got = df.collect().map(_.getSeq[org.apache.spark.sql.Row](0)
        .map(r => Option(r.get(2)).map(_ => r.getAs[java.sql.Timestamp](2).getTime / 1000)))
      val want = arrays.map(_.map(_.getOrElse(0L)).sorted)
      got.toSeq.zip(want).forall { case (g, w) =>
        g.map(_.getOrElse(0L)) == w
      }
    }

  // J1: municipios_map.get(k, k) — match wins, unmatched falls back,
  // null key stays null; 1:1 dim regardless of dirty duplicates
  property("lookupEnrich == map.get(k).orElse(k)") =
    forAll(
      Gen.listOfN(60, Gen.option(Gen.choose(0L, 30L))),
      Gen.listOfN(15, Gen.zip(Gen.choose(0L, 30L), Gen.alphaStr.map(_.take(5))))
    ) { (keys, dimPairs) =>
      val facts = keys.toDF("k")
      val dim = dimPairs.toDF("ck", "name")
      val out = Relational.lookupEnrich(facts, dim, $"k", "ck", "name",
        "enriched", $"k".cast("string"))
      val model = dimPairs.toMap // later pairs win in toMap; dropDuplicates
      // picks an arbitrary winner, so only compare on conflict-free dims
      val conflictFree = dimPairs.groupBy(_._1).forall(_._2.map(_._2).distinct.size == 1)
      val got = out.select("k", "enriched").collect()
        .map(r => (Option(r.get(0)).map(_.asInstanceOf[Long]), Option(r.getString(1))))
      Prop.collect(conflictFree) {
        !conflictFree || got.forall { case (k, e) =>
          e == k.map(kk => model.get(kk).getOrElse(kk.toString))
        }
      }
    }
}
