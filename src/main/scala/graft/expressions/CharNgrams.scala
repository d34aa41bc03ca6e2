package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.sql.types._

/** Codegen'd character n-grams: one linear pass over the string's code
  * points producing the numChars−n+1 grams, exactly
  * `substr(text, i, n) for i in 1..numChars−n+1` (code-point indexed,
  * matching Spark `substring` and DuckDB `substr`). Fewer than n chars →
  * empty array.
  *
  * Replaces per-position `substring(text, pos, n)`, which re-scans the
  * UTF-8 bytes from the string start to find the code-point offset on
  * EVERY call — O(len²) per document, and the single hottest stage of
  * the char-bigram fluency model (measured ~3× on text_fluency's two
  * corpus passes at sf0.1). */
case class CharNgrams(child: Expression, n: Int)
    extends UnaryExpression {

  override def prettyName: String = "graft_char_ngrams"
  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType && n >= 1) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string input and n >= 1")

  override def nullSafeEval(input: Any): Any =
    CharNgrams.compute(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.expressions.CharNgrams.compute($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object CharNgrams {
  /** Shared by interpreted and generated paths. */
  def compute(text: UTF8String, n: Int): ArrayData = {
    // code-point array: UTF-16 char indexing would split surrogate pairs
    // and diverge from substring()'s code-point semantics
    val cp = text.toString.codePoints().toArray
    val cnt = cp.length - n + 1
    if (cnt <= 0) return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any](cnt)
    var i = 0
    while (i < cnt) {
      out(i) = UTF8String.fromString(new String(cp, i, n))
      i += 1
    }
    new GenericArrayData(out)
  }
}
