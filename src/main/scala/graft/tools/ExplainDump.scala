package graft.tools

import java.nio.file.{Files, Paths}

/** Batch `.explain("formatted")` dump for the optimization-round plan
  * receipts: one file per query under an output directory.
  * `runMain graft.tools.ExplainDump <outDir> <suffix> [sfDir] <query...>`
  * writes `<outDir>/<query>_<suffix>.txt` for each named query (e.g.
  * suffix `before` / `after` for plans/r18). */
object ExplainDump {
  def main(args: Array[String]): Unit = {
    val outDir = args(0); val suffix = args(1)
    val (sfDir, names) =
      if (args.length > 2 && args(2).startsWith("/")) (args(2), args.drop(3))
      else ("/root/testdata/sf0.01", args.drop(2))
    Files.createDirectories(Paths.get(outDir))
    val spark = graft.GraftSession.create()
    names.foreach { name =>
      try {
        val df = graft.SparkEntry.queries(name)(spark, sfDir)
        // same rendering as Dataset.explain("formatted"), captured
        val formatted = df.queryExecution.explainString(
          org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
        Files.writeString(Paths.get(s"$outDir/${name}_$suffix.txt"), formatted)
        println(s"wrote $outDir/${name}_$suffix.txt")
      } catch { case e: Throwable =>
        System.err.println(s"[explaindump] $name failed: $e")
      }
    }
    spark.stop()
  }
}
