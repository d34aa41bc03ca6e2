package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.sql.types._

/** Codegen'd word k-shingles: split on single spaces (trailing empties
  * kept, matching `split(text, " ")` and DuckDB `string_split`), then one
  * pass building the n-k+1 space-joined k-grams. Fewer than k words →
  * empty array.
  *
  * Replaces `transform(sequence(1, size(w)-k+1), i -> concat_ws(" ",
  * element_at(w,i), ...))`, whose per-shingle cost is an interpreted
  * lambda dispatch plus k element_at calls — ~15× slower and the single
  * hottest stage of the MinHash/Jaccard dedup pipelines.
  */
case class WordShingles(child: Expression, k: Int)
    extends UnaryExpression {

  override def prettyName: String = "graft_word_shingles"
  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType && k >= 1) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string input and k >= 1")

  override def nullSafeEval(input: Any): Any =
    WordShingles.compute(input.asInstanceOf[UTF8String], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.expressions.WordShingles.compute($c, $k)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object WordShingles {
  /** Shared by interpreted and generated paths. */
  def compute(text: UTF8String, k: Int): ArrayData = {
    // split on literal single space, keeping trailing empty strings —
    // identical to Java String.split(" ", -1) on this pattern
    val words = text.toString.split(" ", -1)
    val n = words.length - k + 1
    if (n <= 0) return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any](n)
    val sb = new java.lang.StringBuilder(32)
    var i = 0
    while (i < n) {
      sb.setLength(0)
      var j = 0
      while (j < k) {
        if (j > 0) sb.append(' ')
        sb.append(words(i + j))
        j += 1
      }
      out(i) = UTF8String.fromString(sb.toString)
      i += 1
    }
    new GenericArrayData(out)
  }
}
