package graft.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Codegen'd SCALAR-quantization (SQ8) encode over plan-constant
  * per-dimension ranges: each element maps to its nearest of 256 evenly
  * spaced levels on that dimension's [min, max] span — the third memory
  * face of the index family, between sign-bit binary (64×, codebook-free,
  * coarsest) and product quantization (32×, trained): SQ8 is 4× smaller
  * than raw floats, needs NO training beyond a min/max scan, and loses
  * far less resolution than either (256 levels per dimension vs PQ's 16
  * codewords per 8-wide subspace). FAISS ships it as ScalarQuantizer
  * QT_8bit; it is the default "cheap index" at 10⁸–10⁹ vectors.
  *
  * Level arithmetic (what the DuckDB oracle replays, in this exact
  * IEEE order):
  *   step_i = (max_i − min_i) / 255          (driver-side, one divide)
  *   code_i = clamp(⌊(x_i − min_i) / step_i + 0.5⌋, 0, 255)
  *   dequant_i = min_i + code_i · step_i
  * A degenerate dimension (step_i = 0: min = max over the training
  * corpus) encodes to 0 and dequantizes to min_i exactly. Elements are
  * widened float→double BEFORE the subtract; ⌊·+0.5⌋ is written out
  * (never round(): Spark's HALF_UP-via-BigDecimal and libm rounding
  * differ at ties across engines — floor is exact everywhere).
  *
  * Same refuse-don't-zero-pad contract as [[PqCodes]]: null input,
  * input shorter than the stats dimensionality, or a NULL ELEMENT in
  * the encoded prefix → null row (ArrayData.getFloat reads 0.0 on a
  * null slot, so the null scan runs first). Out-of-range values (a
  * batch row outside the training min/max) CLAMP — that is the defined
  * SQ saturation behavior, not corruption, and the oracle replays it.
  */
case class SqCodes(child: Expression, mins: Array[Double], steps: Array[Double])
    extends UnaryExpression {

  override def prettyName: String = "graft_sq_codes"
  override def nullable: Boolean = true
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _)
        if mins.nonEmpty && mins.length == steps.length =>
      TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires an array<float|double> input and equal-length min/step arrays")
  }

  private lazy val isDouble = child.dataType match {
    case ArrayType(DoubleType, _) => true
    case _ => false
  }

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    SqCodes.encode(v.asInstanceOf[ArrayData], mins, steps, isDouble)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    val mnRef = ctx.addReferenceObj("sqMins", mins, "double[]")
    val stRef = ctx.addReferenceObj("sqSteps", steps, "double[]")
    ev.copy(code = c.code +
      code"""
        |org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} =
        |  graft.expressions.SqCodes.encode(
        |    ${c.isNull} ? null : ${c.value}, $mnRef, $stRef, $isDouble);
        |boolean ${ev.isNull} = ${ev.value} == null;
        |""".stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SqCodes {
  def encode(v: ArrayData, mins: Array[Double], steps: Array[Double],
             dbl: Boolean): ArrayData = {
    if (v == null) return null
    val dim = mins.length
    if (v.numElements() < dim) return null
    var i = 0
    while (i < dim) { if (v.isNullAt(i)) return null; i += 1 }
    val codes = new Array[Int](dim)
    i = 0
    while (i < dim) {
      val x = if (dbl) v.getDouble(i) else v.getFloat(i).toDouble
      val c =
        if (steps(i) == 0.0) 0
        else {
          val lvl = math.floor((x - mins(i)) / steps(i) + 0.5)
          if (lvl < 0.0) 0 else if (lvl > 255.0) 255 else lvl.toInt
        }
      codes(i) = c
      i += 1
    }
    ArrayData.toArrayData(codes)
  }
}

/** Codegen'd SQ8 asymmetric distance: squared L2 between a RAW query
  * vector and the DEQUANTIZED reconstruction of a corpus code row —
  * left fold from 0.0 of (q_i − (min_i + c_i · step_i))² in dimension
  * order, difference squared by self-multiplication. The per-candidate
  * cost is dim fused multiply-adds over a 4×-compressed operand; unlike
  * PQ there is no per-query table to build (subspaces are single
  * dimensions, so a table lookup and the direct compute are the same
  * work — the win is purely the 1-byte-per-dimension scan operand).
  *
  * Validate-loudly mismatch contract ([[PqAdcLookup]]'s posture): a
  * codes row whose length differs from the stats dimensionality, or a
  * code outside 0..255, throws — codes from a different quantizer must
  * never silently mis-rank. Null query or null codes → null. */
case class SqAdcDist(left: Expression, right: Expression,
                     mins: Array[Double], steps: Array[Double])
    extends BinaryExpression {

  override def prettyName: String = "graft_sq_adc"
  override def dataType: DataType = DoubleType
  // null-independent of child nullability: score() refuses (returns
  // null) on a short or hole-y QUERY even when both inputs carry
  // non-nullable schemas — without this override the optimizer could
  // fold the caller's isNotNull guard away and the refused query's
  // candidates would all read back 0.0 and rank FIRST
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType | DoubleType, _), ArrayType(IntegerType, _))
          if mins.nonEmpty && mins.length == steps.length =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (array<float|double>, array<int>) inputs")
    }

  private lazy val isDouble = left.dataType match {
    case ArrayType(DoubleType, _) => true
    case _ => false
  }

  override def nullSafeEval(q: Any, codes: Any): Any =
    SqAdcDist.score(q.asInstanceOf[ArrayData], codes.asInstanceOf[ArrayData],
      mins, steps, isDouble)

  // manual codegen (not nullSafeCodeGen): score returns a BOXED Double —
  // null when the QUERY side refuses (short / null-element vector), which
  // a primitive-slot assignment cannot carry
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val q = left.genCode(ctx)
    val c = right.genCode(ctx)
    val mnRef = ctx.addReferenceObj("sqMins", mins, "double[]")
    val stRef = ctx.addReferenceObj("sqSteps", steps, "double[]")
    ev.copy(code = q.code + c.code +
      code"""
        |boolean ${ev.isNull} = true;
        |double ${ev.value} = 0.0;
        |if (!${q.isNull} && !${c.isNull}) {
        |  Object sqR = graft.expressions.SqAdcDist.score(
        |    ${q.value}, ${c.value}, $mnRef, $stRef, $isDouble);
        |  if (sqR != null) {
        |    ${ev.isNull} = false;
        |    ${ev.value} = ((java.lang.Double) sqR).doubleValue();
        |  }
        |}
        |""".stripMargin)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object SqAdcDist {
  def score(q: ArrayData, codes: ArrayData, mins: Array[Double],
            steps: Array[Double], dbl: Boolean): Any = {
    val dim = mins.length
    if (codes.numElements() != dim)
      throw new IllegalArgumentException(
        s"graft_sq_adc: codes row carries ${codes.numElements()} codes but " +
          s"the quantizer stats cover $dim dimensions — codes from a " +
          "different quantizer")
    if (q.numElements() < dim) return null
    var i = 0
    while (i < dim) { if (q.isNullAt(i)) return null; i += 1 }
    var s = 0.0
    i = 0
    while (i < dim) {
      // a NULL code element would read 0 via ArrayData.getInt and
      // silently score as level 0 — throw, never mis-rank (the
      // validate-loudly contract; codes are index data, a hole means
      // a corrupt ledger)
      if (codes.isNullAt(i))
        throw new IllegalArgumentException(
          s"graft_sq_adc: null code at dimension $i — corrupt codes row")
      val c = codes.getInt(i)
      if (c < 0 || c > 255)
        throw new IllegalArgumentException(
          s"graft_sq_adc: code $c out of range 0..255 at dimension $i — " +
            "codes from a different quantizer")
      val x = if (dbl) q.getDouble(i) else q.getFloat(i).toDouble
      val d = x - (mins(i) + c * steps(i))
      s += d * d
      i += 1
    }
    s
  }
}
