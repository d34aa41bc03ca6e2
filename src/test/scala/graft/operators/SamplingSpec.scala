package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SamplingSpec extends SparkSpec {
  import spark.implicits._

  private lazy val corpus = (1 to 2000)
    .map(i => (i.toLong, if (i % 4 == 0) "de" else "en"))
    .toDF("id", "lang")

  test("stratifiedSample: ~fraction kept per stratum, deterministic, partition-invariant") {
    val sampled = Sampling.stratifiedSample(corpus, $"lang", $"id", 0.25)
    val perStratum = sampled.groupBy("lang").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // binomial(1500, .25) and binomial(500, .25): ±5σ bands
    assert(perStratum("en") > 280 && perStratum("en") < 470)
    assert(perStratum("de") > 75 && perStratum("de") < 175)
    // same rows regardless of physical partitioning
    val again = Sampling.stratifiedSample(corpus.repartition(13), $"lang", $"id", 0.25)
    assert(sampled.select("id").exceptAll(again.select("id")).isEmpty)
    assert(again.select("id").exceptAll(sampled.select("id")).isEmpty)
    // fraction 1.0 keeps everything
    assert(Sampling.stratifiedSample(corpus, $"lang", $"id", 1.0).count() == 2000)
  }

  test("assignSplit: exactly one label per row, stable under corpus growth") {
    val splits = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)
    val out = Sampling.assignSplit(corpus, $"id", splits)
    assert(out.count() == 2000) // every row labeled, none duplicated
    val byLabel = out.groupBy("split").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byLabel.keySet == Set("train", "val", "test"))
    assert(byLabel("train") > byLabel("val") && byLabel("train") > byLabel("test"))
    // growth stability: labeling a SUBSET gives each row the same split
    val subset = Sampling.assignSplit(corpus.filter($"id" < 500), $"id", splits)
    val full = out.filter($"id" < 500)
    assert(subset.exceptAll(full).isEmpty && full.exceptAll(subset).isEmpty)
    // fractions must sum to 1
    assertThrows[IllegalArgumentException] {
      Sampling.assignSplit(corpus, $"id", Seq("a" -> 0.5, "b" -> 0.4))
    }
  }

  test("assignSplit composes with weightedSample: survivors still split ~80/10/10") {
    // weightedSample keeps rows with draw < floor(w*2^32); if assignSplit
    // reused the SAME draw, every survivor of w=0.5 would land in 'train'.
    // The operator-distinct "split" tag keeps the two draws independent.
    val sampled = Sampling.weightedSample(corpus, lit(0.5), $"id")
    val out = Sampling.assignSplit(sampled, $"id",
      Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
    val byLabel = out.groupBy("split").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val n = byLabel.values.sum.toDouble
    assert(byLabel.keySet == Set("train", "val", "test"))
    // binomial ±5σ bands around 10% of ~1000 survivors
    assert(byLabel("val") / n > 0.05 && byLabel("val") / n < 0.16)
    assert(byLabel("test") / n > 0.05 && byLabel("test") / n < 0.16)
  }


  test("assignSplitLeakFree: a cluster never straddles splits; members inherit the rep's draw") {
    // chains of 5: docs 10k..10k+4 share cluster k (CC min-label = 10k);
    // 1500 singleton docs carry no label row at all
    val pairs = (0 until 100).flatMap { k =>
      (0 until 4).map(i => (10000L + k * 10 + i, 10000L + k * 10 + i + 1))
    }.toDF("a_id", "b_id")
    val members = (0 until 100).flatMap(k => (0 to 4).map(i => 10000L + k * 10 + i))
    val all = (members ++ (1 to 1500).map(_.toLong)).toDF("id")
    val labels = Dedup.connectedComponents(pairs, "a_id", "b_id")
    val splits = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)
    val out = Sampling.assignSplitLeakFree(all, $"id", labels, splits)
    assert(out.count() == all.count()) // one label per row, none duplicated
    // no cluster straddles: every member carries its cluster's single label
    val straddle = out
      .join(labels.select($"id".as("lab_id"), $"cluster"), $"id" === $"lab_id")
      .groupBy("cluster").agg(count_distinct($"split").as("k"))
      .filter($"k" > 1)
    assert(straddle.isEmpty)
    // the inherited label IS the representative's own draw
    val reps = out.filter($"id" >= 10000 && $"id" % 10 === 0)
      .select($"id".as("rep_id"), $"split".as("rep_split"))
    val mismatch = out.filter($"id" >= 10000)
      .withColumn("rep", ($"id" - ($"id" % 10)))
      .join(reps, $"rep" === $"rep_id")
      .filter($"split" =!= $"rep_split")
    assert(mismatch.isEmpty)
    // singletons (no label row) fall back to their own key: identical to
    // the plain per-row split
    val singles = out.filter($"id" < 10000)
    val plain = Sampling.assignSplit(all.filter($"id" < 10000), $"id", splits)
    assert(singles.exceptAll(plain).isEmpty && plain.exceptAll(singles).isEmpty)
  }

  test("tokenBudgetPerSource: bucketed prefix equals the naive per-source running sum") {
    val docs = (1 to 600).map { i =>
      (i.toLong, s"src${i % 5}", (i % 37 + 3).toLong)
    }.toDF("id", "src", "toks")
    val budgets = docs.select($"src".as("source")).distinct()
      .withColumn("token_budget", lit(150L))
    val got = Sampling.tokenBudgetPerSource(
      docs, $"src", $"id", $"toks", budgets)
    // naive reference: one global window per source
    val w = org.apache.spark.sql.expressions.Window.partitionBy("src")
      .orderBy(md5(concat_ws(":", lit("graft"), $"id")), $"id")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val want = docs
      .withColumn("prior", coalesce(sum($"toks").over(w), lit(0L)))
      .filter($"prior" < 150L).drop("prior")
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)
    // schema untouched: exactly the input columns survive
    assert(got.columns.toSeq == Seq("id", "src", "toks"))
    // partition-invariance of the admitted set
    val again = Sampling.tokenBudgetPerSource(
      docs.repartition(13), $"src", $"id", $"toks", budgets)
    assert(got.exceptAll(again).isEmpty && again.exceptAll(got).isEmpty)
  }

  test("tokenBudgetPerSource: the admitted set is prefixLen-invariant") {
    val docs = (1 to 400).map { i =>
      (i.toLong, s"src${i % 3}", (i % 23 + 2).toLong)
    }.toDF("id", "src", "toks")
    val budgets = docs.select($"src".as("source")).distinct()
      .withColumn("token_budget", lit(120L))
    val p1 = Sampling.tokenBudgetPerSource(docs, $"src", $"id", $"toks", budgets)
    // widening the prefix multiplies buckets (the scale knob) but the
    // global draw order — hence the admitted set — is unchanged
    val p2 = Sampling.tokenBudgetPerSource(docs, $"src", $"id", $"toks",
      budgets, prefixLen = 2)
    assert(p1.exceptAll(p2).isEmpty && p2.exceptAll(p1).isEmpty)
  }

  test("tokenBudgetPerSource: boundary doc admitted, budgetless sources dropped, budget monotone") {
    val docs = Seq(
      (1L, "a", 100L), (2L, "a", 100L), (3L, "a", 100L),
      (4L, "b", 100L)).toDF("id", "src", "toks")
    val budgets = Seq(("a", 150L)).toDF("source", "token_budget")
    val got = Sampling.tokenBudgetPerSource(
      docs, $"src", $"id", $"toks", budgets).select("id")
      .as[Long].collect().sorted.toSeq
    // source a: first doc (prior 0 < 150) and the boundary doc
    // (prior 100 < 150) pass, third (prior 200) does not; source b has
    // no budget row and vanishes
    assert(got.size == 2 && !got.contains(4L))
    // growing the budget only ADDS documents
    val more = Sampling.tokenBudgetPerSource(
      docs, $"src", $"id", $"toks",
      Seq(("a", 250L)).toDF("source", "token_budget")).select("id")
      .as[Long].collect().toSet
    assert(got.toSet.subsetOf(more) && more.size == 3)
  }

  test("temperatureBudgets: integer-exact sqrt-shares, floor sum <= total, flattening order") {
    val docs = (1 to 900).map { i =>
      val s = if (i <= 600) "src0" else if (i <= 800) "src1" else "src2"
      (i.toLong, s, 10L)
    }.toDF("id", "src", "toks")
    val b = Sampling.temperatureBudgets(docs, $"src", $"toks", totalBudget = 3000L)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // floor rounding never over-allocates
    assert(b.values.sum <= 3000L)
    // alpha=0.5 flattens: src0 has 6x src2's tokens but only ~sqrt(6) = 2.45x
    // its budget
    assert(b("src0") > b("src1") && b("src1") > b("src2"))
    assert(b("src0").toDouble / b("src2") < 3.0)
    // the shares are integer-exact: replay them driver-side
    val t = Map("src0" -> 6000L, "src1" -> 2000L, "src2" -> 1000L)
    val sc = t.map { case (k, v) =>
      k -> BigInt(math.round(math.sqrt(v.toDouble) * (1L << 20))) }
    val denom = sc.values.sum
    t.keys.foreach { k =>
      assert(BigInt(b(k)) == (BigInt(3000) * sc(k)) / denom) }
    // alpha=1 keeps the natural (unflattened) proportions
    val prop = Sampling.temperatureBudgets(docs, $"src", $"toks", 3000L,
      alpha = 1.0).collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(prop("src0").toDouble / prop("src2") > 5.0)
  }

  test("epochUpsample: cap / full+partial / partial-only regimes, deterministic") {
    // src0: tt=100, target 450 -> full = min(4, 2) = 2 (cap) -> rem 0
    // src1: tt=300, target 450 -> full = 1, rem = 150 -> full + partial
    // src2: tt=600, target 450 -> full = 0 -> partial-only at epoch 0
    val docs = (
      (1 to 10).map(i => (i.toLong, "src0", 10L)) ++
        (11 to 40).map(i => (i.toLong, "src1", 10L)) ++
        (41 to 100).map(i => (i.toLong, "src2", 10L))).toDF("id", "src", "toks")
    val targets = Seq(("src0", 450L), ("src1", 450L), ("src2", 450L))
      .toDF("source", "target_tokens")
    val out = Sampling.epochUpsample(docs, $"src", $"id", $"toks", targets,
      maxEpochs = 2)
    assert(out.columns.toSeq == Seq("id", "src", "toks", "epoch"))
    val by = out.groupBy("src", "epoch").count().collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    // cap regime: two complete epochs, remainder forced 0
    assert(by(("src0", 0L)) == 10 && by(("src0", 1L)) == 10 &&
      !by.contains(("src0", 2L)))
    // full + partial: one complete epoch, then prior < 150 admits 15 docs
    assert(by(("src1", 0L)) == 30 && by(("src1", 1L)) == 15)
    // partial-only: prior < 450 admits 45 docs, all at epoch 0
    assert(by(("src2", 0L)) == 45 && !by.contains(("src2", 1L)))
    // the admitted multiset is partitioning-invariant
    val again = Sampling.epochUpsample(docs.repartition(7), $"src", $"id",
      $"toks", targets, maxEpochs = 2)
    assert(out.exceptAll(again).isEmpty && again.exceptAll(out).isEmpty)
  }

  test("quotaPerGroup: caps each group at n, deterministic winners, payload intact") {
    val out = Sampling.quotaPerGroup(corpus, $"lang", $"id", 7)
    val counts = out.groupBy("lang").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts == Map("en" -> 7L, "de" -> 7L))
    assert(out.columns.toSeq == Seq("id", "lang"))
    val again = Sampling.quotaPerGroup(corpus.repartition(17), $"lang", $"id", 7)
    assert(out.exceptAll(again).isEmpty && again.exceptAll(out).isEmpty)
    // quota larger than the group passes the whole group through
    assert(Sampling.quotaPerGroup(corpus, $"lang", $"id", 10000).count() == 2000)
  }
}
