package graft.tools

import scala.collection.mutable
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd,
  SparkListenerJobStart}

/** Per-Spark-job wall-clock attribution for one query (guide §1: decide
  * where the time goes before touching anything). Runs the query twice
  * (pass 2 is post-JIT / post-plan-compile) and prints, for pass 2,
  * every job's duration, task count, and the callsite that submitted it.
  * `runMain graft.tools.JobProfile <query> [sfDir]` */
object JobProfile {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.create()
    val sfDir = args.lift(1).getOrElse("/root/testdata/sf0.1")
    val starts = mutable.Map[Int, (Long, String, Int)]()
    val rows = mutable.ArrayBuffer[(Int, Double, Int, String)]()
    val listener = new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit =
        starts(js.jobId) = (js.time,
          js.stageInfos.sortBy(_.stageId).lastOption.map(_.name)
            .getOrElse("?"),
          js.stageInfos.map(_.numTasks).sum)
      override def onJobEnd(je: SparkListenerJobEnd): Unit =
        starts.remove(je.jobId).foreach { case (t0, site, tasks) =>
          rows += ((je.jobId, (je.time - t0) / 1e3, tasks, site))
        }
    }
    def runOnce(): Double = {
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(args(0))(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    val w = runOnce() // warm-up pass: JIT + plan compile + fixture build
    spark.sparkContext.addSparkListener(listener)
    val t = runOnce()
    Thread.sleep(500) // let the listener bus drain the last job-end event
    println(f"QUERY ${args(0)} pass1=$w%.2fs pass2=$t%.2fs jobs=${rows.size}")
    val jobSum = rows.map(_._2).sum
    println(f"sum(job wall)=$jobSum%.2fs  gap(driver-side)=${t - jobSum}%.2fs")
    rows.sortBy(-_._2).take(60).foreach { case (id, sec, tasks, site) =>
      println(f"  job=$id%4d  $sec%7.3fs  tasks=$tasks%4d  $site")
    }
    spark.stop()
  }
}
