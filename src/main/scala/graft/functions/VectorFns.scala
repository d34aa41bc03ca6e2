package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Dense-vector math over `array<float>` embedding columns, built on
  * higher-order array functions (`zip_with`, `aggregate`) so the dot
  * products run inside WholeStageCodegen with zero shuffle and zero UDF
  * serialization overhead.
  *
  * Numeric discipline: elements are widened float→double BEFORE any
  * arithmetic and accumulated left-to-right, which makes results
  * bit-identical to any engine that does the same (DuckDB list_sum over a
  * DOUBLE[] folds left-to-right too) — required for oracle hash-parity.
  */
object VectorFns {

  /** Left-fold sum of a double array. */
  private def fsum(arr: Column): Column =
    aggregate(arr, lit(0.0), (acc, v) => acc + v)

  /** Dot product of two float/double arrays (double precision), for
    * dynamic dimensionality. Higher-order functions evaluate interpreted —
    * prefer [[dotN]] when the dimension is known. */
  def dot(a: Column, b: Column): Column =
    fsum(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")))

  /** Fast dot product: custom codegen'd Catalyst expression — one fused
    * loop, no per-element lambda dispatch, same left-fold-from-0.0 add
    * order as [[dot]] and the DuckDB oracle. See
    * [[graft.expressions.DotProduct]]. The `dim` parameter is kept for
    * API compatibility; the loop uses the runtime array length. */
  def dotN(a: Column, b: Column, dim: Int = -1): Column =
    org.apache.spark.sql.GraftExpr.col(
      graft.expressions.DotProduct(
        org.apache.spark.sql.GraftExpr.expr(a),
        org.apache.spark.sql.GraftExpr.expr(b)))

  /** L2 norm (double), dynamic-dimension fold form. */
  def l2Norm(a: Column): Column =
    sqrt(fsum(transform(a, x => x.cast("double") * x.cast("double"))))

  /** L2 norm via the fused dot kernel (see [[dotN]]). */
  def l2NormN(a: Column, dim: Int = -1): Column = sqrt(dotN(a, a, dim))

  /** Cosine similarity; null/zero-norm → null (never divide-by-zero). */
  def cosine(a: Column, b: Column): Column = {
    val d = dot(a, b)
    val na = l2Norm(a)
    val nb = l2Norm(b)
    when(na > 0.0 && nb > 0.0, d / (na * nb))
  }

  /** Deterministic pseudo-random ±1 hyperplane `p` of dimension `dim`:
    * component i is +1 when the first hex digit of md5("p:i") is >= '8',
    * else -1. md5-derived planes are reproducible in ANY engine (and any
    * cluster size) without shipping a random state; they are computed ONCE
    * on the driver and folded into the plan as a literal array (a per-row
    * md5 would cost planes×dim digests per row). */
  def plane(planeId: Int, dim: Int): Array[Double] = {
    val digest = java.security.MessageDigest.getInstance("MD5")
    Array.tabulate(dim) { i =>
      val hex = digest.digest(s"$planeId:$i".getBytes("UTF-8"))
      digest.reset()
      // first hex digit >= '8' == high bit of first byte set
      if ((hex(0) & 0x80) != 0) 1.0 else -1.0
    }
  }

  /** Random-hyperplane LSH bucket key: `nPlanes` sign bits concatenated.
    * Vectors with high cosine similarity collide with high probability —
    * the scale path for ANN at 100 TB (bucket join instead of cross join).
    * The ±1 plane components are driver-side constants folded into an
    * unrolled codegen'd sum (same add order as the oracle's fold). */
  def lshBucket(vec: Column, nPlanes: Int, dim: Int): Column =
    concat((0 until nPlanes).map { p =>
      val planeCol = array(plane(p, dim).map(lit(_)): _*)
      when(dotN(vec, planeCol, dim) >= 0.0, "1").otherwise("0")
    }: _*)
}
