package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.nio.file.Files

class HitSourceSpec extends SparkSpec {
  import spark.implicits._

  private def hit(n: Int) =
    s"""{"_source":{"numeroProcesso":"$n","grau":"G1","classe":{"codigo":1,"nome":"ANPP"}},"sort":[$n]}"""

  private lazy val roots: Map[String, String] = {
    Seq("TJSP" -> Seq(1, 2, 3), "TJCE" -> Seq(4, 5)).map { case (t, ns) =>
      val d = Files.createTempDirectory(s"hits-$t").toFile
      val w = new java.io.PrintWriter(new java.io.File(d, "page1.json"), "UTF-8")
      ns.foreach(n => w.println(hit(n)))
      w.close()
      t -> d.getAbsolutePath
    }.toMap
  }

  private def read() = spark.read.format("graft.sources.HitSource")
    .option("path.TJSP", roots("TJSP")).option("path.TJCE", roots("TJCE"))
    .load()

  test("reads all courts as separate partitions, tribunal injected") {
    val df = read()
    assert(df.rdd.getNumPartitions == 2)
    val counts = df.groupBy("tribunal").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts == Map("TJSP" -> 3L, "TJCE" -> 2L))
    // nested flatten works straight off the source relation
    val classes = df.select($"_source.classe.nome").distinct().collect()
    assert(classes.map(_.getString(0)).toSeq == Seq("ANPP"))
  }

  test("court pruning: tribunal equality filter is pushed and skips partitions") {
    val filtered = read().filter($"tribunal" === "TJSP")
    assert(filtered.count() == 3)
    assert(filtered.rdd.getNumPartitions == 1) // TJCE partition never planned
    val plan = filtered.queryExecution.executedPlan.toString
    assert(plan.contains("tribunals=TJSP"))
  }

  test("limit pushdown: reader stops paging early, Spark re-limits globally") {
    val limited = read().limit(2)
    assert(limited.count() == 2)
    val scan = limited.queryExecution.executedPlan.toString
    assert(scan.contains("limit=2"))
  }

  test("schema pruning reaches the JSON parser") {
    val pruned = read().select($"_source.numeroProcesso".as("np"))
    assert(pruned.collect().map(_.getString(0)).sorted.toSeq ==
      Seq("1", "2", "3", "4", "5"))
  }

  test("composes with the pipeline flatten tail") {
    val parsed = graft.pipeline.Hits.parseHits(read(), col("tribunal"))
    assert(parsed.select("numero_processo").count() == 5)
    assert(parsed.groupBy("tribunal").count().count() == 2)
  }
}
