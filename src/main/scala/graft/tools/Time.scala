import org.apache.spark.sql.SparkSession
object TimeTmp {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (q <- args.tail; sf = args(0)) {
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(q)(spark, sf).write.format("noop").mode("overwrite").save()
      println(s"TIME $q ${(System.nanoTime()-t0)/1e9}")
      val t1 = System.nanoTime()
      graft.SparkEntry.queries(q)(spark, sf).write.format("noop").mode("overwrite").save()
      println(s"TIME2 $q ${(System.nanoTime()-t1)/1e9}")
    }
    spark.stop()
  }
}
