package graft.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Codegen'd argmax-cosine over a plan-constant codebook: for one input
  * vector, the `(cell, score)` of its best centroid in ONE fused loop.
  *
  * Why a custom Expression — the plan SHAPE, not just the constant
  * factor: the declarative idiom (broadcast-join the codebook with no
  * condition, then `groupBy(id).agg(max(struct(score, cell)))`) plans
  * its aggregate as **SortAggregate**, because a struct-typed MAX has no
  * mutable buffer for the hash aggregate — so the n × C joined fan-out
  * is SORTED, spilling to disk past memory. Measured at 2 M vectors ×
  * 1024 centroids: the partial-agg sort filled 65 GB of spill and
  * killed the job (SCALE.md round 8). This expression evaluates the
  * same argmax as a scalar projection — no fan-out rows ever exist, no
  * aggregation, no shuffle (the old shape also paid a corpus-wide
  * groupBy exchange) — and assignment cost is exactly n × C fused
  * multiply-adds inside WholeStageCodegen.
  *
  * Semantics are bit-for-bit the join+max(struct) idiom's, which the
  * DuckDB oracles replay as `ROW_NUMBER() OVER (ORDER BY cos DESC,
  * cell DESC)`:
  *  - cosine = dot/(‖v‖·‖c‖), elements widened to double BEFORE the
  *    multiply, accumulated left-to-right from 0.0 (the [[DotProduct]]
  *    contract); norms are the same fold + sqrt. Codebook vectors are
  *    held as doubles so a float codebook widens exactly and a TRAINED
  *    (array<double>, [[graft.operators.Similarity.kmeansIter]])
  *    codebook keeps full precision.
  *  - a zero-norm side (or a null input vector) nulls the score, and
  *    null-score candidates lose to ANY scored one; ties — equal score
  *    or all-null — break to the HIGHER cell id (struct-max field
  *    order). A null input therefore yields (highest cell, null), not
  *    a null row, exactly as `max(struct(null, cell))` did.
  *  - scores compare with exact double equality; vectors are assumed
  *    NaN-free (zero-norm is guarded, so no 0/0 arises).
  */
case class CodebookArgmax(child: Expression, cells: Array[Int],
    vecs: Array[Array[Double]], nrms: Array[Double])
    extends UnaryExpression {

  override def prettyName: String = "graft_codebook_argmax"
  override def nullable: Boolean = false
  override def dataType: DataType = CodebookArgmax.outType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) if cells.nonEmpty =>
      TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires an array<float> input and a non-empty codebook")
  }

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    CodebookArgmax.best(v.asInstanceOf[ArrayData], cells, vecs, nrms)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    val cellsRef = ctx.addReferenceObj("cbCells", cells, "int[]")
    val vecsRef = ctx.addReferenceObj("cbVecs", vecs, "double[][]")
    val nrmsRef = ctx.addReferenceObj("cbNrms", nrms, "double[]")
    ev.copy(code = c.code +
      code"""
        |org.apache.spark.sql.catalyst.InternalRow ${ev.value} =
        |  graft.expressions.CodebookArgmax.best(
        |    ${c.isNull} ? null : ${c.value}, $cellsRef, $vecsRef, $nrmsRef);
        |""".stripMargin, isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object CodebookArgmax {
  val outType: StructType = StructType(Seq(
    StructField("cell", IntegerType, nullable = false),
    StructField("score", DoubleType, nullable = true)))

  /** array<float> column value → exact-widened doubles (null-safe). */
  def widen(v: ArrayData): Array[Double] = {
    if (v == null) return null
    val n = v.numElements()
    val out = new Array[Double](n)
    var i = 0
    while (i < n) { out(i) = v.getFloat(i).toDouble; i += 1 }
    out
  }

  /** Left-fold-from-0.0 L2 norm, the [[DotProduct]] fold. */
  def l2(v: Array[Double]): Double = {
    var s = 0.0
    var i = 0
    while (i < v.length) { s += v(i) * v(i); i += 1 }
    math.sqrt(s)
  }

  def best(v: ArrayData, cells: Array[Int], vecs: Array[Array[Double]],
           nrms: Array[Double]): InternalRow =
    core(widen(v), cells, vecs, nrms)

  /** Shared by interpreted, generated, and driver-side (fine-centroid
    * routing) paths. `v == null` behaves as zero-norm: every score is
    * null, so the result is (highest cell, null). */
  def core(v: Array[Double], cells: Array[Int], vecs: Array[Array[Double]],
           nrms: Array[Double]): InternalRow = {
    val nv = if (v == null) 0.0 else l2(v)
    var bestCell = 0
    var bestScore = 0.0
    var bestNull = true
    var any = false
    var c = 0
    while (c < cells.length) {
      var sNull = true
      var s = 0.0
      if (nv > 0.0 && nrms(c) > 0.0) {
        val cv = vecs(c)
        val m = math.min(v.length, cv.length)
        var d = 0.0
        var j = 0
        while (j < m) { d += v(j) * cv(j); j += 1 }
        s = d / (nv * nrms(c))
        sNull = false
      }
      val better =
        if (!any) true
        else if (sNull && bestNull) cells(c) > bestCell
        else if (sNull) false
        else if (bestNull) true
        else s > bestScore || (s == bestScore && cells(c) > bestCell)
      if (better) { bestCell = cells(c); bestScore = s; bestNull = sNull; any = true }
      c += 1
    }
    new GenericInternalRow(Array[Any](bestCell,
      if (bestNull) null else java.lang.Double.valueOf(bestScore)))
  }

  /** Driver-side routing face: just the winning cell. */
  def coreCell(v: Array[Double], cells: Array[Int],
               vecs: Array[Array[Double]], nrms: Array[Double]): Int =
    core(v, cells, vecs, nrms).getInt(0)
}

/** [[CodebookArgmax]] with a per-row codebook CHOICE: the fine level of
  * two-level IVF assignment. `route` (the coarse cell the row already
  * won) selects which fine sub-codebook competes; everything else —
  * fold, tie rule, null semantics — is [[CodebookArgmax.core]]. The
  * operator guarantees every coarse route has a sub-codebook (routes
  * that attracted no fine centroid are refused at construction), so a
  * missing route here is a defect, not data, and throws. */
case class RoutedCodebookArgmax(left: Expression, right: Expression,
    routeIds: Array[Int], cells: Array[Array[Int]],
    vecs: Array[Array[Array[Double]]], nrms: Array[Array[Double]])
    extends BinaryExpression {

  override def prettyName: String = "graft_routed_codebook_argmax"
  override def dataType: DataType = CodebookArgmax.outType

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType, _), IntegerType) if routeIds.nonEmpty =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (array<float>, int) inputs and a non-empty routing")
    }

  override def eval(input: InternalRow): Any = {
    val r = right.eval(input)
    if (r == null) null
    else RoutedCodebookArgmax.bestRouted(
      left.eval(input).asInstanceOf[ArrayData], r.asInstanceOf[Int],
      routeIds, cells, vecs, nrms)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val v = left.genCode(ctx)
    val r = right.genCode(ctx)
    val ridRef = ctx.addReferenceObj("rtIds", routeIds, "int[]")
    val cellsRef = ctx.addReferenceObj("rtCells", cells, "int[][]")
    val vecsRef = ctx.addReferenceObj("rtVecs", vecs, "double[][][]")
    val nrmsRef = ctx.addReferenceObj("rtNrms", nrms, "double[][]")
    ev.copy(code = v.code + r.code +
      code"""
        |boolean ${ev.isNull} = ${r.isNull};
        |org.apache.spark.sql.catalyst.InternalRow ${ev.value} = null;
        |if (!${ev.isNull}) {
        |  ${ev.value} = graft.expressions.RoutedCodebookArgmax.bestRouted(
        |    ${v.isNull} ? null : ${v.value}, ${r.value},
        |    $ridRef, $cellsRef, $vecsRef, $nrmsRef);
        |}
        |""".stripMargin)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object RoutedCodebookArgmax {
  def bestRouted(v: ArrayData, route: Int, routeIds: Array[Int],
                 cells: Array[Array[Int]], vecs: Array[Array[Array[Double]]],
                 nrms: Array[Array[Double]]): InternalRow = {
    var idx = -1
    var i = 0
    while (i < routeIds.length && idx < 0) {
      if (routeIds(i) == route) idx = i
      i += 1
    }
    if (idx < 0) throw new IllegalStateException(
      s"RoutedCodebookArgmax: no fine sub-codebook for coarse route $route")
    CodebookArgmax.core(CodebookArgmax.widen(v), cells(idx), vecs(idx), nrms(idx))
  }
}
