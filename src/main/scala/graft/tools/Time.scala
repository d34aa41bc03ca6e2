package graft.tools

/** Steady-state timing for selected queries:
  * `runMain graft.tools.Time <sfDir> <query...>` — two runs each (run 2
  * is post-JIT/post-plan-compile). */
object Time {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.create()
    val sf = args(0)
    for (q <- args.tail; pass <- 1 to 2) {
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(q)(spark, sf)
        .write.format("noop").mode("overwrite").save()
      println(s"TIME pass$pass $q ${(System.nanoTime() - t0) / 1e9}")
    }
    spark.stop()
  }
}
