package graft.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.sql.types._

/** Codegen'd single-pass text statistics: one traversal of the document
  * produces every signal the quality/language pipeline needs —
  *
  *   struct(n_words, total_word_len, punct, en_hits, pt_hits)
  *
  * replacing four-plus interpreted higher-order-function passes
  * (`aggregate` for word lengths, two `filter`s for stopword hits, a
  * regexp_replace for punctuation). Catalyst's subexpression elimination
  * collapses the repeated `TextStats(text)` occurrences inside one
  * projection to a single evaluation, so a 5-signal quality projection
  * costs one pass per row.
  *
  * Parity contract (bit-identical to the DuckDB oracles in
  * [[graft.queries.RegistryExt]]):
  *  - words = split on a single space, trailing empties kept
  *    (`string_split(text, ' ')`);
  *  - lengths count CODEPOINTS (both engines' `length`);
  *  - punct counts codepoints outside [a-z0-9 space]
  *    (`regexp_replace(text, '[a-z0-9 ]', '', 'g')` length);
  *  - en/pt hits = exact word membership in [[graft.functions.TextFns]]'
  *    lexicons.
  */
case class TextStats(child: Expression) extends UnaryExpression {

  override def prettyName: String = "graft_text_stats"

  override def dataType: DataType = TextStats.schema

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string input, got ${child.dataType.catalogString}")

  override def nullSafeEval(input: Any): Any =
    TextStats.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.TextStats.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object TextStats {
  val schema: StructType = StructType(Seq(
    StructField("n_words", LongType, nullable = false),
    StructField("total_word_len", LongType, nullable = false),
    StructField("punct", LongType, nullable = false),
    StructField("en_hits", LongType, nullable = false),
    StructField("pt_hits", LongType, nullable = false)))

  private val enSet: java.util.HashSet[String] = {
    val s = new java.util.HashSet[String]()
    graft.functions.TextFns.EnStop.foreach(s.add)
    s
  }
  private val ptSet: java.util.HashSet[String] = {
    val s = new java.util.HashSet[String]()
    graft.functions.TextFns.PtStop.foreach(s.add)
    s
  }

  /** Shared by interpreted and generated paths. */
  def compute(text: UTF8String): InternalRow = {
    val s = text.toString
    val n = s.length
    var punct = 0L
    var i = 0
    while (i < n) {
      val cp = s.codePointAt(i)
      if (!(cp == ' ' || (cp >= 'a' && cp <= 'z') || (cp >= '0' && cp <= '9')))
        punct += 1
      i += Character.charCount(cp)
    }
    var nWords = 0L
    var totalLen = 0L
    var en = 0L
    var pt = 0L
    var start = 0
    var pos = 0
    while (pos <= n) {
      if (pos == n || s.charAt(pos) == ' ') {
        nWords += 1
        val w = s.substring(start, pos)
        totalLen += w.codePointCount(0, w.length)
        if (enSet.contains(w)) en += 1
        if (ptSet.contains(w)) pt += 1
        start = pos + 1
      }
      pos += 1
    }
    new GenericInternalRow(Array[Any](nWords, totalLen, punct, en, pt))
  }
}
