import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object ProbeTmp {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    def time(label: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f; println(s"PROBE $label ${(System.nanoTime()-t0)/1e9}")
    }
    import graft.operators.Dedup
    val sh = docs.select(col("doc_id").as("id"), Dedup.shingles(col("text")).as("sh"))
    time("shingles-only")(sh.write.format("noop").mode("overwrite").save())
    time("shingles-only-2")(sh.write.format("noop").mode("overwrite").save())
    val ex = sh.select(col("id"), explode(col("sh")).as("s"))
    time("explode")(ex.write.format("noop").mode("overwrite").save())
    val dig = ex.select(col("id"), md5(concat(lit("0:"), col("s"))).as("d0"), md5(concat(lit("1:"), col("s"))).as("d1"))
    time("digests")(dig.write.format("noop").mode("overwrite").save())
    val mh = (0 until 8).map { j => min(substring(col(s"dg${j/4}"), (j%4)*8+1, 8)).as(s"mh$j") }
    val dig2 = ex.select(col("id") +: (0 to 1).map(d => md5(concat(lit(s"$d:"), col("s"))).as(s"dg$d")): _*)
    val sig = dig2.groupBy("id").agg(mh.head, mh.tail: _*)
    time("sig-agg")(sig.write.format("noop").mode("overwrite").save())
    spark.stop()
  }
}
