package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TextFnsSpec extends SparkSpec {
  import spark.implicits._

  test("token counts: whitespace vs regex vs bpe-ish") {
    val df = Seq("the cat sat on a mat!").toDF("text").select(
      TextFns.wsTokenCount($"text").as("ws"),
      size(TextFns.regexTokens($"text")).as("re"),
      TextFns.bpeishCount($"text").as("bpe"))
    val r = df.head()
    assert(r.getLong(0) == 6L)
    assert(r.getInt(1) == 6)
    // ceil(3/4)+ceil(3/4)+ceil(3/4)+ceil(2/4)+ceil(1/4)+ceil(3/4) = 6
    assert(r.getLong(2) == 6L)
  }

  test("langId: english vs portuguese stopwords, und for no signal") {
    val df = Seq("the cat is on the mat", "o gato que anda para a casa", "xyzzy plugh")
      .toDF("text").select(TextFns.langId($"text").as("l"))
    assert(df.collect().map(_.getString(0)).toSeq == Seq("en", "pt", "und"))
  }

  test("quality signals: punct ratio and avg word length") {
    val r = Seq("ab cd!!").toDF("text").select(
      TextFns.punctRatio($"text").as("p"),
      TextFns.avgWordLen($"text").as("w")).head()
    assert(math.abs(r.getDouble(0) - 2.0 / 7.0) < 1e-15)
    assert(r.getDouble(1) == 3.0) // "ab"(2) + "cd!!"(4) over 2 words
  }

  test("fingerprint: normalization collapses case/punct; rollingHash is order-sensitive") {
    val df = Seq("Hello, World!", "hello world", "world hello").toDF("text")
      .select(TextFns.fingerprint($"text").as("fp"),
        TextFns.rollingHash($"text").as("rh"))
    val rows = df.collect()
    assert(rows(0).getString(0) == rows(1).getString(0))   // same normalized md5
    assert(rows(1).getLong(1) != rows(2).getLong(1))       // rolling hash differs
  }
}
