package graft.tools

import org.apache.spark.sql.functions._

/** Measured BPE training/apply walls at realistic merge counts — the
  * gates pin 8 rounds for oracle cost; this reports the loop's actual
  * scaling in the merge count (`runMain graft.tools.BpeReport [sfDir]
  * [merges]`). Per-round cost is one pass over the DISTINCT-WORD frame
  * + a pair aggregate + a 1-row collect, so wall should grow linearly
  * in rounds and be governed by vocabulary size, not corpus size;
  * apply is merges/64 chunked projections over the same word frame. */
object BpeReport {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val merges = if (args.length > 1) args(1).toInt else 64
    val spark = graft.GraftSession.create()
    val docs = graft.Tables.documents(spark, sfDir)
    val nWords = docs.select(explode(split(col("text"), " ")).as("w"))
      .filter(length(col("w")) > 0).select("w").distinct().count()
    println(s"BPE sf=$sfDir distinct_words=$nWords merges=$merges")
    var t0 = System.nanoTime()
    val table = graft.operators.Vocab.bpeTrain(docs, "text", merges)
      .localCheckpoint()
    val learned = table.count()
    val tTrain = (System.nanoTime() - t0) / 1e9
    println(f"BPE train merges=$learned%d wall=$tTrain%.1f s " +
      f"per_round=${tTrain / math.max(1L, learned)}%.3f s")
    for (pass <- 1 to 2) {
      t0 = System.nanoTime()
      val toks = graft.operators.Vocab.bpeApply(docs, "text", table)
        .agg(sum("cnt"), count(lit(1))).head()
      println(f"BPE apply pass$pass wall=${(System.nanoTime() - t0) / 1e9}%.1f s " +
        s"total_tokens=${toks.getLong(0)} vocab=${toks.getLong(1)}")
    }
    for (pass <- 1 to 2) {
      t0 = System.nanoTime()
      graft.operators.Vocab.bpeTokenCounts(docs, "doc_id", "text", table)
        .write.format("noop").mode("overwrite").save()
      println(f"BPE counts pass$pass wall=${(System.nanoTime() - t0) / 1e9}%.1f s")
    }
    spark.stop()
  }
}
