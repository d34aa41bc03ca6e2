package graft.tools

/** Plan inspection for any registered query:
  * `runMain graft.tools.Explain <query> [sfDir] [exec]`
  * — `exec` additionally runs the query and prints the AQE-final
  * executed plan (broadcast decisions, coalesced partitions). */
object Explain {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.create()
    val sfDir = args.lift(1).getOrElse("/root/testdata/sf0.001")
    val df = graft.SparkEntry.queries(args(0))(spark, sfDir)
    df.explain("formatted")
    if (args.contains("exec")) {
      df.write.format("noop").mode("overwrite").save()
      println(df.queryExecution.executedPlan.toString)
    }
    spark.stop()
  }
}
