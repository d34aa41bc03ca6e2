package graft.tools

import org.apache.spark.sql.functions._

/** Measured BPE training/apply walls at realistic merge counts — the
  * gates pin 8 rounds for oracle cost; this reports the loop's actual
  * scaling in the merge count (`runMain graft.tools.BpeReport [sfDir]
  * [merges]`, merges default 128). Training is timed on BOTH paths:
  * driver-LOCAL (the default — one histogram collect, in-memory merge
  * rounds) and DISTRIBUTED (maxDistinctWords = 0 — per round one pair
  * aggregate + a 1-row collect), so the round-trip tax the local path
  * removes is a measured number, not an assertion; the two merge
  * tables are asserted identical while we're here. Apply is merges/64
  * chunked projections over the word frame. */
object BpeReport {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val merges = if (args.length > 1) args(1).toInt else 128
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
    println(f"BPE train(local) merges=$learned%d wall=$tTrain%.1f s " +
      f"per_round=${tTrain / math.max(1L, learned)}%.3f s")
    t0 = System.nanoTime()
    val tableDist = graft.operators.Vocab.bpeTrain(docs, "text", merges,
      maxDistinctWords = 0L).localCheckpoint()
    val tDist = (System.nanoTime() - t0) / 1e9
    println(f"BPE train(distributed) merges=${tableDist.count()}%d " +
      f"wall=$tDist%.1f s " +
      f"per_round=${tDist / math.max(1L, tableDist.count())}%.3f s " +
      f"speedup_local=${tDist / math.max(1e-9, tTrain)}%.1fx")
    require(table.exceptAll(tableDist).isEmpty &&
      tableDist.exceptAll(table).isEmpty,
      "local and distributed merge tables must be bit-identical")
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
