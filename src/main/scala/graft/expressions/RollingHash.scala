package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.sql.types._

/** Codegen'd Rabin-Karp rolling hash: h = fold over codepoints of
  * (h * 31 + c) mod `modulus`, from 0.
  *
  * Replaces an interpreted `aggregate(sequence(1, length(text)), ...)`
  * fold whose per-character cost is a lambda dispatch plus a substring
  * allocation (~30× slower). Same recurrence, same result.
  *
  * Parity note: iterates CODEPOINTS (matching `ascii(substr(text,i,1))`
  * in Spark and `ascii(text[i])` in DuckDB, which both return the
  * codepoint) — surrogate pairs count once.
  */
case class RollingHash(child: Expression, modulus: Long = 1000000007L)
    extends UnaryExpression {

  override def prettyName: String = "graft_rolling_hash"
  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string input, got ${child.dataType.catalogString}")

  override def nullSafeEval(input: Any): Any =
    RollingHash.hash(input.asInstanceOf[UTF8String].toString, modulus)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.expressions.RollingHash.hash($c.toString(), ${modulus}L)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object RollingHash {
  /** Shared by interpreted and generated paths. */
  def hash(s: String, modulus: Long): Long = {
    var h = 0L
    var i = 0
    val n = s.length
    while (i < n) {
      val cp = s.codePointAt(i)
      h = (h * 31 + cp) % modulus
      i += Character.charCount(cp)
    }
    h
  }
}
