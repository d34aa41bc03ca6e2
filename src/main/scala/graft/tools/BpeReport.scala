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
    // MID-PATH on a synthetic ABOVE-CAP vocabulary (round 15): ~12.5%
    // of (doc, word) occurrences get a content-derived salt suffix, so
    // the vocabulary inflates ~1000× (the multilingual-web shape: a
    // fat Zipf head + a huge low-frequency tail) while ~87% of token
    // MASS stays in the unsalted head. bpeTrainHead trains driver-local
    // on the headChars-elected head; the closure frame measures the
    // tail it skipped; the distributed path on the same corpus prices
    // the per-merge round-trip the mid-path avoids; merge overlap vs
    // the full-vocabulary local table is the quality number.
    val wide = docs.withColumn("text",
      array_join(transform(split(col("text"), " "), w =>
        when(substring(md5(concat(col("doc_id").cast("string"), lit(":"), w)),
          1, 1) >= "e",
          concat(w, lit("x"), substring(
            md5(concat(col("doc_id").cast("string"), lit("#"), w)), 1, 3)))
          .otherwise(w)), " ")).localCheckpoint()
    val nWide = wide.select(explode(split(col("text"), " ")).as("w"))
      .filter(length(col("w")) > 0).select("w").distinct().count()
    val headCap = 2048L
    val cls = graft.operators.Vocab.bpeHeadClosure(wide, "text", headCap).head()
    val hm = cls.getLong(2); val tm = cls.getLong(3)
    println(s"BPE wide distinct_words=$nWide headChars=$headCap " +
      s"head_words=${cls.getLong(0)} tail_words=${cls.getLong(1)} " +
      f"head_mass=${hm.toDouble / (hm + tm)}%.3f oov_chars=${cls.getLong(4)}")
    t0 = System.nanoTime()
    val tableHead = graft.operators.Vocab.bpeTrainHead(wide, "text",
      merges, headChars = headCap).localCheckpoint()
    val tHead = (System.nanoTime() - t0) / 1e9
    println(f"BPE train(mid-path head) merges=${tableHead.count()}%d " +
      f"wall=$tHead%.1f s")
    t0 = System.nanoTime()
    val tableWide = graft.operators.Vocab.bpeTrain(wide, "text", merges)
      .localCheckpoint()
    val tWide = (System.nanoTime() - t0) / 1e9
    val common = tableHead.select("lhs", "rhs")
      .intersect(tableWide.select("lhs", "rhs")).count()
    println(f"BPE train(wide full-local) wall=$tWide%.1f s " +
      f"head_merge_overlap=$common%d/${tableWide.count()}%d")
    val mDist = math.min(16, merges)
    t0 = System.nanoTime()
    val nDist = graft.operators.Vocab.bpeTrain(wide, "text", mDist,
      maxDistinctWords = 0L).count()
    val tDistW = (System.nanoTime() - t0) / 1e9
    println(f"BPE train(wide distributed) merges=$nDist%d wall=$tDistW%.1f s " +
      f"per_round=${tDistW / math.max(1L, nDist)}%.3f s " +
      f"projected_${merges}m=${tDistW / math.max(1L, nDist) * merges}%.0f s " +
      f"vs mid-path $tHead%.1f s")
    // TAIL-OOV GUARD (round 16): perturb the above-cap corpus so its
    // TAIL carries a character absent from the head's alphabet — the
    // case head-training can never close (an OOV char cannot appear
    // inside any learned merge). bpeTrainHeadGuarded measures the
    // closure, detects oov_chars > 0, REFUSES the head cut, and falls
    // back to the full election; the table is asserted identical to
    // the full-vocabulary train (every character votes).
    val oovC = wide.withColumn("text",
      when(col("doc_id") === 0, concat(col("text"), lit(" §q§q")))
        .otherwise(col("text"))).localCheckpoint()
    val clsO = graft.operators.Vocab.bpeHeadClosure(oovC, "text", headCap)
      .head()
    println(s"BPE oov-corpus headChars=$headCap " +
      s"oov_chars=${clsO.getLong(4)} tail_words=${clsO.getLong(1)}")
    t0 = System.nanoTime()
    val guarded = graft.operators.Vocab.bpeTrainHeadGuarded(oovC, "text",
      merges, headChars = headCap, closure = Some(clsO)).localCheckpoint()
    val tGuard = (System.nanoTime() - t0) / 1e9
    val fullO = graft.operators.Vocab.bpeTrain(oovC, "text", merges)
      .localCheckpoint()
    require(guarded.exceptAll(fullO).isEmpty &&
      fullO.exceptAll(guarded).isEmpty,
      "the guard must fall back to the full election on an OOV tail")
    println(f"BPE train(guarded, oov fallback) wall=$tGuard%.1f s " +
      s"== full-vocabulary table (head path refused)")
    spark.stop()
  }
}
