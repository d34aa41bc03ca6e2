package graft

import org.apache.spark.sql.SparkSessionExtensions

/** The SQL face of the custom expressions. Uses the attach-later path
  * ([[GraftExtensions.registerAll]]) on the shared test session —
  * `withExtensions` only binds at session build time and the suite
  * shares one session; `injectFunction` is exercised structurally. */
class GraftExtensionsSpec extends SparkSpec {

  override def beforeAll(): Unit = {
    super.beforeAll()
    GraftExtensions.registerAll(spark)
  }

  test("injectFunction path registers the same five functions") {
    // apply() to a fresh SparkSessionExtensions must not throw and must
    // cover every row of the shared registry
    new GraftExtensions().apply(new SparkSessionExtensions)
    assert(GraftExtensions.functions.map(_._1.funcName).sorted ==
      Seq("graft_char_ngrams", "graft_dot", "graft_rolling_hash",
        "graft_simhash_mask", "graft_word_shingles"))
  }

  test("graft_simhash_mask resolves in SQL and matches the kernel") {
    val viaSql = spark.sql(
      "SELECT graft_simhash_mask('hello', 16) AS m").head().getSeq[Long](0)
    val direct = graft.expressions.SimhashMask.mask(
      org.apache.spark.unsafe.types.UTF8String.fromString("hello"), 16)
    assert(viaSql == direct.toLongArray().toSeq)
  }

  test("graft_dot resolves in SQL and matches the manual sum") {
    val r = spark.sql(
      "SELECT graft_dot(array(1.0D, 2.0D, 3.0D), array(4.0D, 5.0D, 6.0D)) AS d")
      .head().getDouble(0)
    assert(r == 32.0)
  }

  test("graft_rolling_hash matches the library fold, default and custom modulus") {
    val row = spark.sql(
      "SELECT graft_rolling_hash('abc') AS a, graft_rolling_hash('abc', 97L) AS b")
      .head()
    assert(row.getLong(0) == graft.expressions.RollingHash.hash("abc", 1000000007L))
    assert(row.getLong(1) == graft.expressions.RollingHash.hash("abc", 97L))
  }

  test("graft_word_shingles builds k-grams; short input gives empty array") {
    val rows = spark.sql(
      "SELECT graft_word_shingles('a b c d', 3) AS s, graft_word_shingles('a b', 3) AS e")
      .head()
    assert(rows.getSeq[String](0) == Seq("a b c", "b c d"))
    assert(rows.getSeq[String](1).isEmpty)
  }
}
