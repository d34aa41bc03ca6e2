package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.sql.types._

/** Codegen'd per-token simhash vote mask.
  *
  * Semantics (bit-for-bit the definition the DuckDB oracles replay):
  * signature position p (1..bits) votes 1 when hex digit ((p-1) mod 32)+1
  * of md5(prefix || token) is ≥ '8', where prefix is "" for p ≤ 32 and
  * "d:" for the d-th overflow digest (p in 32d+1..32d+32). A hex digit
  * ≥ '8' is exactly the top bit of its nibble, so the mask reads digest
  * BYTES directly — no hex string, no per-position substring.
  *
  * Output: array of ⌈bits/2⌉ longs, positions packed two per long as
  * 32-bit lanes (position 2i+1 at bit 0, position 2i+2 at bit 32).
  * Summing the packed longs accumulates both lanes independently —
  * halving the aggregate-column count of the majority vote — and a
  * 32-bit lane cannot overflow for any document under 2³¹ tokens.
  *
  * Replaces 64 interpreted-ish `substring(dg, p, 1) >= "8"` projections
  * per token in the 64-bit simhash path — the profiled hot stage of
  * `dedup_simhash_pairs`.
  */
case class SimhashMask(child: Expression, bits: Int)
    extends UnaryExpression {

  override def prettyName: String = "graft_simhash_mask"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType && bits >= 1 && bits <= 256)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string input and 1 <= bits <= 256")

  override def nullSafeEval(input: Any): Any =
    SimhashMask.mask(input.asInstanceOf[UTF8String], bits)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.expressions.SimhashMask.mask($c, $bits)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SimhashMask {
  private val digest = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** Shared by interpreted and generated paths. */
  def mask(s: UTF8String, bits: Int): ArrayData = {
    val md = digest.get()
    val token = s.getBytes
    val nDig = (bits + 31) / 32
    val digests = new Array[Array[Byte]](nDig)
    md.reset()
    digests(0) = md.digest(token)
    var d = 1
    while (d < nDig) {
      md.reset()
      md.update((d.toString + ":").getBytes("UTF-8"))
      md.update(token)
      digests(d) = md.digest()
      d += 1
    }
    val out = new Array[Long]((bits + 1) / 2)
    var p = 0 // 0-based position
    while (p < bits) {
      val dg = digests(p / 32)
      val q = p % 32 // 0-based hex-digit index within this digest
      val b = dg(q / 2)
      // even q = high nibble (hex strings lead with it), odd q = low
      val ind = if (q % 2 == 0) (b >> 7) & 1 else (b >> 3) & 1
      out(p / 2) |= ind.toLong << ((p % 2) * 32)
      p += 1
    }
    new GenericArrayData(out)
  }
}
