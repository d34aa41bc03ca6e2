package graft.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Codegen'd product-quantization ENCODE over a plan-constant codebook:
  * for one input vector, the m sub-codes (per-subspace argmin squared-L2
  * codeword) plus the total squared reconstruction error, in ONE fused
  * loop — the memory face of ANN at 10⁹ vectors (a 64-dim float vector is
  * 256 B; its m=8 one-byte codes are 8 B, 32×, and ADC search reads ONLY
  * codes).
  *
  * Same plan-shape argument as [[CodebookArgmax]]: the declarative form
  * (explode m subspaces × join ksub codewords × min-struct agg) fans each
  * vector out m × ksub rows and plans a SortAggregate; this expression is
  * a scalar projection — no fan-out, no aggregation, no shuffle, cost
  * exactly m × ksub × subDim fused multiply-adds per vector inside
  * WholeStageCodegen.
  *
  * Bit-parity contract (what the DuckDB oracle replays):
  *  - squared distance per codeword = left fold from 0.0 of
  *    (v[off+t] − w[t])² in subspace order, elements widened
  *    float→double BEFORE the subtract; the difference is squared by
  *    self-multiplication (never pow(), whose libm rounding differs
  *    across engines);
  *  - ties break to the LOWER code (strict `<` improvement on a left
  *    scan), the oracle's `ORDER BY dist ASC, code ASC`;
  *  - `err` accumulates the m winning distances in subspace order, left
  *    fold from 0.0;
  *  - a null input vector, one shorter than m × subDim, or one with a
  *    NULL ELEMENT anywhere in the encoded prefix yields a NULL result
  *    row (refuse, don't zero-pad: a truncated or hole-y embedding
  *    encoding silently would corrupt the index — `ArrayData.getFloat`
  *    on a null slot reads 0.0, so the null scan must run first).
  *
  * `codewords(j)(c)` is codeword c of subspace j; subspaces may have
  * different widths (offsets accumulate), codes within a subspace are
  * dense 0..k_j−1 by construction (the operator validates).
  */
case class PqCodes(child: Expression, codewords: Array[Array[Array[Double]]])
    extends UnaryExpression {

  override def prettyName: String = "graft_pq_codes"
  override def nullable: Boolean = true
  override def dataType: DataType = PqCodes.outType

  // residual vectors (v − centroid) arrive as array<double>; raw
  // embeddings as array<float> — both encode through the same loop,
  // element reads dispatched on a plan-constant flag
  private lazy val isDouble = child.dataType match {
    case ArrayType(DoubleType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _)
        if codewords.nonEmpty && codewords.forall(_.nonEmpty) =>
      TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires an array<float|double> input and non-empty per-subspace codebooks")
  }

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    PqCodes.encode(v.asInstanceOf[ArrayData], codewords, isDouble)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    val cwRef = ctx.addReferenceObj("pqCw", codewords, "double[][][]")
    ev.copy(code = c.code +
      code"""
        |org.apache.spark.sql.catalyst.InternalRow ${ev.value} =
        |  graft.expressions.PqCodes.encode(
        |    ${c.isNull} ? null : ${c.value}, $cwRef, $isDouble);
        |boolean ${ev.isNull} = ${ev.value} == null;
        |""".stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object PqCodes {
  val outType: StructType = StructType(Seq(
    StructField("codes", ArrayType(IntegerType, containsNull = false),
      nullable = false),
    StructField("err", DoubleType, nullable = false)))

  /** Shared by interpreted and generated paths. Null or short input →
    * null (see class doc). `dbl` selects double vs float element reads
    * (a plan-time constant, so the branch predicts perfectly). */
  def encode(v: ArrayData, cw: Array[Array[Array[Double]]],
             dbl: Boolean): InternalRow = {
    if (v == null) return null
    val m = cw.length
    var total = 0
    var j = 0
    while (j < m) { total += cw(j)(0).length; j += 1 }
    if (v.numElements() < total) return null
    var i = 0
    while (i < total) { if (v.isNullAt(i)) return null; i += 1 }
    val codes = new Array[Int](m)
    var err = 0.0
    var off = 0
    j = 0
    while (j < m) {
      val sub = cw(j)
      val subDim = sub(0).length
      var bestC = 0
      var bestD = Double.MaxValue
      var first = true
      var c = 0
      while (c < sub.length) {
        val w = sub(c)
        var s = 0.0
        var t = 0
        while (t < subDim) {
          val x = if (dbl) v.getDouble(off + t) else v.getFloat(off + t).toDouble
          val d = x - w(t)
          s += d * d
          t += 1
        }
        if (first || s < bestD) { bestD = s; bestC = c; first = false }
        c += 1
      }
      codes(j) = bestC
      err += bestD
      off += subDim
      j += 1
    }
    new GenericInternalRow(Array[Any](ArrayData.toArrayData(codes), err))
  }
}

/** Codegen'd asymmetric-distance TABLE for one QUERY vector: entry
  * `offs(j) + c` is the squared L2 distance between the query's j-th
  * sub-vector and codeword c of subspace j — computed once per QUERY,
  * so scoring a corpus row ([[PqAdcLookup]]) is m array reads instead of
  * m × subDim multiplies. Same fold/widening/null contract as
  * [[PqCodes]]. */
case class PqDistTable(child: Expression, codewords: Array[Array[Array[Double]]])
    extends UnaryExpression {

  override def prettyName: String = "graft_pq_dist_table"
  override def nullable: Boolean = true
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  private lazy val isDouble = child.dataType match {
    case ArrayType(DoubleType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _)
        if codewords.nonEmpty && codewords.forall(_.nonEmpty) =>
      TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires an array<float|double> input and non-empty per-subspace codebooks")
  }

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    PqDistTable.table(v.asInstanceOf[ArrayData], codewords, isDouble)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    val cwRef = ctx.addReferenceObj("pqCw", codewords, "double[][][]")
    ev.copy(code = c.code +
      code"""
        |org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} =
        |  graft.expressions.PqDistTable.table(
        |    ${c.isNull} ? null : ${c.value}, $cwRef, $isDouble);
        |boolean ${ev.isNull} = ${ev.value} == null;
        |""".stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object PqDistTable {
  def table(v: ArrayData, cw: Array[Array[Array[Double]]],
            dbl: Boolean): ArrayData = {
    if (v == null) return null
    val m = cw.length
    var total = 0
    var size = 0
    var j = 0
    while (j < m) { total += cw(j)(0).length; size += cw(j).length; j += 1 }
    if (v.numElements() < total) return null
    var i = 0
    while (i < total) { if (v.isNullAt(i)) return null; i += 1 }
    val out = new Array[Double](size)
    var off = 0
    var pos = 0
    j = 0
    while (j < m) {
      val sub = cw(j)
      val subDim = sub(0).length
      var c = 0
      while (c < sub.length) {
        val w = sub(c)
        var s = 0.0
        var t = 0
        while (t < subDim) {
          val x = if (dbl) v.getDouble(off + t) else v.getFloat(off + t).toDouble
          val d = x - w(t)
          s += d * d
          t += 1
        }
        out(pos) = s
        pos += 1
        c += 1
      }
      off += subDim
      j += 1
    }
    ArrayData.toArrayData(out)
  }
}

/** Codegen'd ADC score: left-fold from 0.0 of `qtab(offs(j) + codes(j))`
  * in subspace order — the per-candidate cost of PQ search, m array
  * reads and adds. `offs` are the per-subspace starts into the flattened
  * query table ([[PqDistTable]]'s layout); `widths` are the per-subspace
  * codeword counts k_j. Null on either side → null.
  *
  * Mismatch contract: a codes column encoded against a DIFFERENT
  * codebook than the query table (wrong m, or code ≥ k_j) would
  * otherwise silently read a neighboring subspace's table entry — a
  * wrong distance with no error. The score therefore VALIDATES both the
  * code count (must equal m) and each code against its subspace width,
  * and throws a descriptive error on violation: fail loudly, never
  * mis-rank (the refuse-don't-corrupt posture of [[PqCodes]]). */
case class PqAdcLookup(left: Expression, right: Expression, offs: Array[Int],
                       widths: Array[Int])
    extends BinaryExpression {

  override def prettyName: String = "graft_pq_adc"
  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(IntegerType, _))
          if offs.nonEmpty =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (array<double>, array<int>) inputs")
    }

  override def nullSafeEval(qtab: Any, codes: Any): Any =
    PqAdcLookup.score(qtab.asInstanceOf[ArrayData],
      codes.asInstanceOf[ArrayData], offs, widths)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val offsRef = ctx.addReferenceObj("pqOffs", offs, "int[]")
    val widthsRef = ctx.addReferenceObj("pqWidths", widths, "int[]")
    nullSafeCodeGen(ctx, ev, (q, c) =>
      s"${ev.value} = graft.expressions.PqAdcLookup.score($q, $c, $offsRef, $widthsRef);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Codegen'd SYMMETRIC-distance (SDC) score between two CODE rows:
  * left-fold from 0.0 of `table(offs(j) + a_j·k_j + b_j)` in subspace
  * order, where `table` holds the plan-constant k_j × k_j squared-L2
  * distances BETWEEN CODEWORDS of each subspace (built once,
  * driver-side, from the codebook). This is the PQ paper's other
  * distance mode: where ADC ([[PqAdcLookup]]) needs one table per
  * QUERY, SDC needs one table per CODEBOOK — so it is the mode for
  * code-vs-code workloads (kNN-graph construction, code-space
  * clustering) where both sides of a corpus-sized join would otherwise
  * each need a per-row table. The trade: distances are between two
  * RECONSTRUCTIONS (both sides quantized), so SDC error is ADC error
  * plus the left side's reconstruction error.
  *
  * Same validate-loudly mismatch contract as [[PqAdcLookup]]: wrong
  * code count or out-of-range codes throw, never mis-score. */
case class PqSdcLookup(left: Expression, right: Expression,
                       table: Array[Double], offs: Array[Int],
                       widths: Array[Int])
    extends BinaryExpression {

  override def prettyName: String = "graft_pq_sdc"
  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(IntegerType, _), ArrayType(IntegerType, _))
          if offs.nonEmpty && offs.length == widths.length =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (array<int>, array<int>) inputs")
    }

  override def nullSafeEval(a: Any, b: Any): Any =
    PqSdcLookup.score(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData],
      table, offs, widths)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val tabRef = ctx.addReferenceObj("pqSdcTab", table, "double[]")
    val offsRef = ctx.addReferenceObj("pqSdcOffs", offs, "int[]")
    val widthsRef = ctx.addReferenceObj("pqSdcWidths", widths, "int[]")
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.expressions.PqSdcLookup.score($a, $b, $tabRef, $offsRef, $widthsRef);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object PqSdcLookup {
  def score(a: ArrayData, b: ArrayData, table: Array[Double],
            offs: Array[Int], widths: Array[Int]): Double = {
    val m = offs.length
    if (a.numElements() != m || b.numElements() != m)
      throw new IllegalArgumentException(
        s"graft_pq_sdc: code rows carry ${a.numElements()}/${b.numElements()} " +
          s"sub-codes but the table was built for m=$m subspaces — codes " +
          "from a different codebook")
    var s = 0.0
    var j = 0
    while (j < m) {
      val ca = a.getInt(j)
      val cb = b.getInt(j)
      if (ca < 0 || ca >= widths(j) || cb < 0 || cb >= widths(j))
        throw new IllegalArgumentException(
          s"graft_pq_sdc: code pair ($ca, $cb) out of range for subspace " +
            s"$j (k_$j=${widths(j)}) — codes from a different codebook")
      s += table(offs(j) + ca * widths(j) + cb)
      j += 1
    }
    s
  }
}

object PqAdcLookup {
  def score(qtab: ArrayData, codes: ArrayData, offs: Array[Int],
            widths: Array[Int]): Double = {
    val m = offs.length
    if (codes.numElements() != m)
      throw new IllegalArgumentException(
        s"graft_pq_adc: codes column has ${codes.numElements()} sub-codes " +
          s"but the query table was built for m=$m subspaces — the codes " +
          "were encoded against a different codebook")
    var s = 0.0
    var j = 0
    while (j < m) {
      val c = codes.getInt(j)
      if (c < 0 || c >= widths(j))
        throw new IllegalArgumentException(
          s"graft_pq_adc: code $c out of range for subspace $j " +
            s"(k_$j=${widths(j)}) — the codes were encoded against a " +
            "different codebook than the query distance table")
      s += qtab.getDouble(offs(j) + c)
      j += 1
    }
    s
  }
}
