package graft.queries

import java.nio.file.Files
import graft.SparkSpec
import org.apache.spark.sql.streaming.OutputMode

class StreamHarnessSpec extends SparkSpec {

  test("drain restores the session's shuffle partitions even when the stream fails to start") {
    val key = "spark.sql.shuffle.partitions"
    val prev = spark.conf.get(key)
    assert(prev != StreamHarness.drainStatePartitions,
      "spec needs a session setting distinct from the drain override")
    val stage = Files.createTempDirectory("shspec")
    val dir = stage.resolve("pages")
    Files.createDirectories(dir)
    val src = spark.readStream.schema("a LONG").json(dir.toString)
    // an un-watermarked aggregate is rejected in append mode at start(),
    // i.e. INSIDE drain — the restore must still run
    intercept[Exception] {
      StreamHarness.drain(src.groupBy("a").count(), stage, OutputMode.Append)
    }
    assert(spark.conf.get(key) == prev)
  }
}
