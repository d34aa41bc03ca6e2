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

  test("textStats fused pass matches the HOF formulations on edge inputs") {
    val inputs = Seq("", " ", "a  b", "the cat and o gato é", "héllo wörld!!",
      "multi  space   runs", "trailing space ")
    val df = inputs.toDF("text").select(
      $"text",
      TextFns.textStats($"text").as("st"),
      size(split($"text", " ")).cast("long").as("nw_hof"),
      aggregate(split($"text", " "), lit(0L), (a, w) => a + length(w).cast("long")).as("tl_hof"),
      length(regexp_replace($"text", "[a-z0-9 ]", "")).cast("long").as("p_hof"),
      size(filter(split($"text", " "), w => w.isin(TextFns.EnStop: _*))).cast("long").as("en_hof"),
      size(filter(split($"text", " "), w => w.isin(TextFns.PtStop: _*))).cast("long").as("pt_hof"))
    df.collect().foreach { r =>
      val st = r.getStruct(1)
      assert(st.getLong(0) == r.getLong(2), s"n_words for '${r.getString(0)}'")
      assert(st.getLong(1) == r.getLong(3), s"total_word_len for '${r.getString(0)}'")
      assert(st.getLong(2) == r.getLong(4), s"punct for '${r.getString(0)}'")
      assert(st.getLong(3) == r.getLong(5), s"en_hits for '${r.getString(0)}'")
      assert(st.getLong(4) == r.getLong(6), s"pt_hits for '${r.getString(0)}'")
    }
  }

  test("repetitionStats fused pass matches the relational formulation") {
    val inputs = Seq("", " ", "a a b b", "a b a b a", "one",
      "x y x y", "tie tie zzz zzz", "trailing space ")
    val docs = inputs.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val fused = docs.select($"doc_id", TextFns.repetitionStats($"text").as("r"))
      .select($"doc_id", $"r.n_tok", $"r.n_distinct", $"r.top_tok",
        $"r.top_c", $"r.top2_c")
      .orderBy("doc_id").collect()
    // relational model: explode → two-level groupBy (the pre-fusion shape)
    val t = docs.select($"doc_id", explode(split($"text", " ")).as("tok"))
    val uni = t.groupBy("doc_id", "tok").agg(count(lit(1)).as("c"))
    val agg = uni.groupBy("doc_id").agg(
      sum($"c").as("n_tok"), count(lit(1)).as("n_distinct"),
      max(struct($"c", $"tok")).as("top"))
    val tb = docs.select($"doc_id",
        explode(graft.operators.Dedup.shingles($"text", 2)).as("b"))
      .groupBy("doc_id", "b").agg(count(lit(1)).as("c"))
      .groupBy("doc_id").agg(max($"c").as("top2_c"))
    val model = agg.join(tb, Seq("doc_id"), "left")
      .select($"doc_id", $"n_tok", $"n_distinct", $"top.tok", $"top.c", $"top2_c")
      .orderBy("doc_id").collect()
    fused.zip(model).foreach { case (f, m) =>
      assert(f == m, s"doc '${inputs(f.getLong(0).toInt)}'")
    }
  }

  test("redactPii: emails, URLs, long digit runs; short numbers and nulls untouched") {
    val rows = Seq(
      "mail a.user+x@sub.example.org now",
      "go to https://ex.com/p/123?q=1 then stop",
      "card 4111222233334444 pin 12 ok",
      "clean text stays clean",
      null
    ).toDF("text").select(TextFns.redactPii($"text").as("r"))
      .collect().map(r => Option(r.getString(0)))
    assert(rows(0).contains("mail <EMAIL> now"))
    assert(rows(1).contains("go to <URL> then stop"))
    assert(rows(2).contains("card <NUM> pin 12 ok"))
    assert(rows(3).contains("clean text stays clean"))
    assert(rows(4).isEmpty)
  }

  test("fingerprint: normalization collapses case/punct; rollingHash is order-sensitive") {
    val df = Seq("Hello, World!", "hello world", "world hello").toDF("text")
      .select(TextFns.fingerprint($"text").as("fp"),
        TextFns.rollingHash($"text").as("rh"))
    val rows = df.collect()
    assert(rows(0).getString(0) == rows(1).getString(0))   // same normalized md5
    assert(rows(1).getLong(1) != rows(2).getLong(1))       // rolling hash differs
  }

  test("charNgrams kernel: code-point grams, surrogate-safe, short-input empty, SQL face") {
    val smiley = "😀" // one code point, two UTF-16 units
    val rows = Seq("abcd", "ab", "a", "", s"ab${smiley}cd")
      .toDF("text")
      .select(expr("graft_char_ngrams(text, 2)").as("g"))
      .collect().map(_.getSeq[String](0))
    assert(rows(0) == Seq("ab", "bc", "cd"))
    assert(rows(1) == Seq("ab"))
    assert(rows(2).isEmpty && rows(3).isEmpty)
    assert(rows(4) == Seq("ab", s"b$smiley", s"${smiley}c", "cd"))
    // parity with the per-position substring definition the oracle uses
    val t = Seq("the quick brown fox").toDF("text")
    val fast = t.select(expr("graft_char_ngrams(text, 3)"))
      .head().getSeq[String](0)
    val slow = t.select(expr(
      "transform(sequence(1, char_length(text) - 2), i -> substring(text, i, 3))"))
      .head().getSeq[String](0)
    assert(fast == slow)
  }

  test("analyze: case/punct variants unify; stopword face; fingerprint coherence") {
    val df = Seq(
      "The Court, ruled;  the   court ruled.",
      "the court ruled the court ruled",
      "", "  ,;!  ").toDF("text")
      .select(TextFns.analyze($"text").as("a"),
        TextFns.analyzeStop($"text").as("s"),
        TextFns.fingerprint($"text").as("fp"))
    val rows = df.collect()
    // "Court," and "court" unify; runs of space/punct collapse
    assert(rows(0).getString(0) == "the court ruled the court ruled")
    assert(rows(0).getString(0) == rows(1).getString(0))
    // fingerprint = md5 ∘ analyze: analyzer-equal ⇒ fingerprint-equal
    assert(rows(0).getString(2) == rows(1).getString(2))
    // stopword face drops "the", keeps content words
    assert(rows(0).getString(1) == "court ruled court ruled")
    // degenerate inputs normalize to empty, not nulls or stray spaces
    assert(rows(2).getString(0) == "" && rows(3).getString(0) == "")
  }
}
