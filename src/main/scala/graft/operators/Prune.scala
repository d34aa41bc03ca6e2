package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.GraftExpr
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal, ScalarSubquery}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.functions._
import org.apache.spark.util.sketch.BloomFilter

/** Scan-side pruning for big joins. At 100 TB the dominant join cost is
  * shuffling the fact side; when the dim side is selective but too large
  * to broadcast as a hash relation, a Bloom filter of its keys IS small
  * enough to broadcast and prunes most fact rows before they ever reach
  * the exchange. (Spark's own runtime row-level filtering,
  * `spark.sql.optimizer.runtime.bloomFilter.enabled`, injects the same
  * shape automatically for eligible equi-joins; this operator is the
  * explicit form for when the optimizer can't — derived keys, multi-step
  * pipelines, reused filters.)
  */
object Prune {

  /** Exact left-semi join with a Bloom prefilter on the probe side.
    *
    * The same plan shape Spark's runtime row-level filtering
    * (`InjectRuntimeFilter`) produces for eligible equi-joins, built
    * explicitly: `BloomFilterMightContain(ScalarSubquery(Aggregate(
    * BloomFilterAggregate(dim.key))), fact.key)`. The subquery runs
    * once — partial filters merge as bytes through the normal
    * partial-aggregation path — and its result feeds the codegen'd
    * `might_contain` predicate sitting on the fact scan, so rows that
    * can't be in `dim` are dropped BEFORE the shuffle with no per-row
    * boxing and no eager driver action. The ordinary semi join then
    * removes the false positives, so the result is EXACTLY the semi
    * join — the Bloom only shrinks the exchange, it never decides
    * membership. An empty dim yields a null filter, `might_contain`
    * returns null, and nothing survives — still the exact semi join.
    *
    * `fpp` trades broadcast bytes vs residual shuffle rows (1% fpp ≈
    * 9.6 bits/key: 100 M dim keys ≈ 115 MB — broadcastable where the
    * dim's hash relation is not). Note `BloomFilterAggregate` enforces
    * the session caps `spark.sql.optimizer.runtime.bloomFilter.maxNumItems`
    * / `.maxNumBits` (defaults 4M / 67.1M) — raise them for bigger dims.
    *
    * Both keys are cast to long before build/probe so differing integral
    * widths (int fact key vs long dim key) hash identically. Null keys
    * never pass the probe (might_contain(null) is null), matching
    * semi-join semantics. */
  def bloomSemiJoin(fact: DataFrame, factKey: String,
                    dim: DataFrame, dimKey: String,
                    expectedItems: Long = 1000000L,
                    fpp: Double = 0.01): DataFrame = {
    // a non-integral key would be implicitly cast to long (nulls under
    // non-ANSI) and the prefilter would silently drop rows the semi join
    // should keep
    val integral = Set[org.apache.spark.sql.types.DataType](
      org.apache.spark.sql.types.ByteType, org.apache.spark.sql.types.ShortType,
      org.apache.spark.sql.types.IntegerType, org.apache.spark.sql.types.LongType)
    require(integral.contains(fact.schema(factKey).dataType) &&
      integral.contains(dim.schema(dimKey).dataType),
      s"bloomSemiJoin requires integral join keys, got " +
        s"${fact.schema(factKey).dataType.catalogString} / " +
        s"${dim.schema(dimKey).dataType.catalogString}")
    val numBits = BloomFilter.optimalNumOfBits(expectedItems, fpp)
    val agg = new BloomFilterAggregate(
      GraftExpr.expr(col(dimKey).cast("long")),
      Literal(expectedItems), Literal(numBits)).toAggregateExpression()
    val bloomPlan = dim.select(GraftExpr.col(agg).as("_graft_bloom"))
      .queryExecution.analyzed
    val probe = GraftExpr.col(BloomFilterMightContain(
      ScalarSubquery(bloomPlan),
      GraftExpr.expr(col(factKey).cast("long"))))
    fact.filter(probe)
      .join(dim.select(col(dimKey)).distinct(),
        col(factKey) === col(dimKey), "left_semi")
  }
}
