package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The frozen-model fluency scorer's smoothing contract, on synthetic
  * data where unseen events actually occur (the harness corpus shares
  * one alphabet across the train/apply split, so `text_fluency_apply`'s
  * oracle row cannot distinguish the LEFT joins from inner ones). */
class FluencySpec extends SparkSpec {
  import spark.implicits._

  // train corpus: "abab" ×2 → bigrams ab(4), ba(2); alphabet {a,b} V=2
  private lazy val train = Seq((1L, "abab"), (2L, "abab")).toDF("doc_id", "text")
  private val scale = 1000000000000L

  test("seen bigrams score with trained counts; scoring matches the hand model") {
    val model = Registry7.fluencyModel(train)
    val got = Registry7.fluencyScore(
      Seq((10L, "aba")).toDF("doc_id", "text"), model)
      .select("fluency").as[Double].head()
    // n(a·)=4, n(b·)=2, V=2: ab → (4+1)·(1e12 div 6), ba → (2+1)·(1e12 div 4)
    val want = ((4 + 1) * (scale / 6) + (2 + 1) * (scale / 4)).toDouble / 2 / 1e12
    assert(got == want)
  }

  test("unseen bigram over a seen context gets the add-one numerator") {
    val model = Registry7.fluencyModel(train)
    // "aa" never occurs in training but context 'a' does:
    // (0+1)·(1e12 div (4+2))
    val got = Registry7.fluencyScore(
      Seq((10L, "aa")).toDF("doc_id", "text"), model)
      .select("fluency").as[Double].head()
    assert(got == (scale / 6).toDouble / 1 / 1e12)
  }

  test("unseen CONTEXT gets the (1)·(1e12 div (0+V)) floor, not a null score") {
    val model = Registry7.fluencyModel(train)
    // 'z' is outside the trained alphabet entirely: both the bigram and
    // its context miss the model — the score must be the smoothed floor
    // (an inner join would silently drop the term and corrupt the mean)
    val got = Registry7.fluencyScore(
      Seq((10L, "zz")).toDF("doc_id", "text"), model)
      .select("fluency").as[Double].head()
    assert(got == (scale / 2).toDouble / 1 / 1e12)
  }

  test("a mixed seen/unseen document averages per-bigram fixed-point terms") {
    val model = Registry7.fluencyModel(train)
    // "abz": ab seen (5·(1e12 div 6)); bz unseen over seen context b
    // (1·(1e12 div 4)); n = 2
    val got = Registry7.fluencyScore(
      Seq((10L, "abz")).toDF("doc_id", "text"), model)
      .select("fluency").as[Double].head()
    val want = (5 * (scale / 6) + 1 * (scale / 4)).toDouble / 2 / 1e12
    assert(got == want)
  }
}
