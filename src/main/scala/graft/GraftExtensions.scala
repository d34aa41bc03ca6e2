package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.types.IntegerType
import graft.expressions.{CharNgrams, DotProduct, RollingHash, WordShingles}

/** SparkSessionExtensions hook registering graft's custom Catalyst
  * expressions as SQL functions, so `spark.sql("SELECT graft_dot(a, b)")`
  * works the same as the Column API (SURVEY.md §7.3's extension path (c)).
  *
  * Wire up either way:
  * {{{
  * SparkSession.builder().withExtensions(new GraftExtensions) ...
  * // or spark.sql.extensions=graft.GraftExtensions on any cluster
  * }}}
  *
  * - `graft_dot(arr, arr) -> double` — fused dot product ([[DotProduct]])
  * - `graft_rolling_hash(text[, modulus]) -> bigint` — Rabin-Karp fold
  *   ([[RollingHash]])
  * - `graft_word_shingles(text, k) -> array<string>` — word k-grams
  *   ([[WordShingles]]; k must be a literal)
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  import GraftExtensions.functions

  override def apply(ext: SparkSessionExtensions): Unit =
    functions.foreach(ext.injectFunction)
}

object GraftExtensions {

  /** Same registrations for a session that already exists (extensions
    * bind at build time; this is the attach-later path). */
  def registerAll(spark: org.apache.spark.sql.SparkSession): Unit =
    functions.foreach { case (id, info, builder) =>
      org.apache.spark.sql.GraftExpr.registerFunction(spark, id, info, builder)
    }

  private def litInt(e: Expression, fn: String): Int = e match {
    case Literal(v: Int, IntegerType) => v
    case other => throw new IllegalArgumentException(
      s"$fn expects a literal int argument, got $other")
  }

  private def litLong(e: Expression, fn: String): Long = e match {
    case Literal(v: Int, IntegerType) => v.toLong
    case Literal(v: Long, _) => v
    case other => throw new IllegalArgumentException(
      s"$fn expects a literal long argument, got $other")
  }

  /** The registry rows shared by both attachment paths. */
  val functions: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    (FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[DotProduct].getName, "graft_dot"),
      (args: Seq[Expression]) => DotProduct(args(0), args(1))),
    (FunctionIdentifier("graft_rolling_hash"),
      new ExpressionInfo(classOf[RollingHash].getName, "graft_rolling_hash"),
      (args: Seq[Expression]) => args match {
        case Seq(c) => RollingHash(c)
        case Seq(c, m) => RollingHash(c, litLong(m, "graft_rolling_hash"))
        case _ => throw new IllegalArgumentException(
          "graft_rolling_hash(text[, modulus])")
      }),
    (FunctionIdentifier("graft_word_shingles"),
      new ExpressionInfo(classOf[WordShingles].getName, "graft_word_shingles"),
      (args: Seq[Expression]) => args match {
        case Seq(c, k) => WordShingles(c, litInt(k, "graft_word_shingles"))
        case _ => throw new IllegalArgumentException(
          "graft_word_shingles(text, k)")
      }),
    (FunctionIdentifier("graft_simhash_mask"),
      new ExpressionInfo(classOf[graft.expressions.SimhashMask].getName,
        "graft_simhash_mask"),
      (args: Seq[Expression]) => args match {
        case Seq(c, b) => graft.expressions.SimhashMask(
          c, litInt(b, "graft_simhash_mask"))
        case _ => throw new IllegalArgumentException(
          "graft_simhash_mask(text, bits)")
      }),
    (FunctionIdentifier("graft_char_ngrams"),
      new ExpressionInfo(classOf[CharNgrams].getName, "graft_char_ngrams"),
      (args: Seq[Expression]) => args match {
        case Seq(c, n) => CharNgrams(c, litInt(n, "graft_char_ngrams"))
        case _ => throw new IllegalArgumentException(
          "graft_char_ngrams(text, n)")
      }))
}
