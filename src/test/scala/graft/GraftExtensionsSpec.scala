package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** The SQL face of the custom expressions: a session built with
  * [[GraftExtensions]] resolves graft_* functions in plain SQL and the
  * results match the Column-API path. Uses its own session (extensions
  * bind at session build time). */
class GraftExtensionsSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[2]")
      .appName("graft-ext-test")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.ui.enabled", "false")
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }

  test("graft_dot resolves in SQL and matches the manual sum") {
    val r = spark.sql(
      "SELECT graft_dot(array(1.0D, 2.0D, 3.0D), array(4.0D, 5.0D, 6.0D)) AS d")
      .head().getDouble(0)
    assert(r == 32.0)
  }

  test("graft_rolling_hash matches the library fold, default and custom modulus") {
    val Array(h1, h2) = spark.sql(
      "SELECT graft_rolling_hash('abc') AS a, graft_rolling_hash('abc', 97L) AS b")
      .head().toSeq.map(_.asInstanceOf[Long]).toArray
    assert(h1 == graft.expressions.RollingHash.hash("abc", 1000000007L))
    assert(h2 == graft.expressions.RollingHash.hash("abc", 97L))
  }

  test("graft_word_shingles builds k-grams; short input gives empty array") {
    val rows = spark.sql(
      "SELECT graft_word_shingles('a b c d', 3) AS s, graft_word_shingles('a b', 3) AS e")
      .head()
    assert(rows.getSeq[String](0) == Seq("a b c", "b c d"))
    assert(rows.getSeq[String](1).isEmpty)
  }
}
