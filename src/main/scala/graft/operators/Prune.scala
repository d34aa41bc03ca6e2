package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

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
    * Two phases: (1) a distributed aggregation builds a Bloom filter of
    * `dim`'s long keys (partials merged on the driver — bytes, not rows);
    * (2) the fact scan drops rows whose key can't be in `dim` BEFORE the
    * shuffle, then the ordinary semi join removes the false positives.
    * The result is therefore EXACTLY the semi join — the Bloom only
    * shrinks the exchange, it never decides membership.
    *
    * `fpp` trades broadcast bytes vs residual shuffle rows (1% fpp ≈
    * 9.6 bits/key: 100 M dim keys ≈ 115 MB — broadcastable where the
    * dim's hash relation is not).
    *
    * The membership probe is a boxed-long UDF, deliberately: it sits in
    * the scan's filter (one virtual call per row pre-shuffle), and Spark
    * exposes no public codegen'd might_contain. Null keys never match
    * (semi-join semantics). */
  def bloomSemiJoin(fact: DataFrame, factKey: String,
                    dim: DataFrame, dimKey: String,
                    expectedItems: Long = 1000000L,
                    fpp: Double = 0.01): DataFrame = {
    // the probe is mightContainLong: a non-integral key would be
    // implicitly cast to long (nulls under non-ANSI) and the prefilter
    // would silently drop rows the semi join should keep
    val integral = Set[org.apache.spark.sql.types.DataType](
      org.apache.spark.sql.types.ByteType, org.apache.spark.sql.types.ShortType,
      org.apache.spark.sql.types.IntegerType, org.apache.spark.sql.types.LongType)
    require(integral.contains(fact.schema(factKey).dataType) &&
      integral.contains(dim.schema(dimKey).dataType),
      s"bloomSemiJoin requires integral join keys, got " +
        s"${fact.schema(factKey).dataType.catalogString} / " +
        s"${dim.schema(dimKey).dataType.catalogString}")
    // Spark's stat.bloomFilter NPEs on a zero-row input (null agg buffer);
    // an empty dim needs no prefilter anyway — the semi join is empty.
    if (dim.isEmpty) {
      fact.join(dim.select(col(dimKey)), col(factKey) === col(dimKey), "left_semi")
    } else {
      val bf = dim.stat.bloomFilter(dimKey, expectedItems, fpp)
      val bc = fact.sparkSession.sparkContext.broadcast(bf)
      val mightContain = udf((k: java.lang.Long) =>
        k != null && bc.value.mightContainLong(k))
      fact.filter(mightContain(col(factKey)))
        .join(dim.select(col(dimKey)).distinct(),
          col(factKey) === col(dimKey), "left_semi")
    }
  }
}
