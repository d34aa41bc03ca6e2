package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the harness-provided parquet tables (TESTDATA.md).
  *
  * All queries in [[SparkEntry.queries]] take `(spark, sfDir)` and read
  * through here, mirroring the reference's source/transform seam (its tests
  * swap the source for an in-memory relation —
  * /root/reference/tests/test_anpp_pipeline.py:98-101).
  */
object Tables {
  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** The events table carries TIMESTAMP(NANOS) parquet timestamps, which
    * Spark only reads as raw longs (spark.sql.legacy.parquet.nanosAsLong,
    * set in every session here). Normalize to TimestampType by integer
    * nanos→micros division (floor — matching how DuckDB truncates nanos).
    * NOTE `div`, not `/`: epoch-nanos ≈ 1.7e18 exceeds double's 2^53
    * exact-integer range, so float division would corrupt timestamps. */
  private def normalizeTs(df: DataFrame, tsCol: String): DataFrame =
    df.schema.find(f => f.name == tsCol && f.dataType == org.apache.spark.sql.types.LongType)
      .map(_ => df.withColumn(tsCol,
        org.apache.spark.sql.functions.timestamp_micros(
          org.apache.spark.sql.functions.expr(s"$tsCol div 1000"))))
      .getOrElse(df)

  def lineitem(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "lineitem")
  def orders(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "orders")
  def customer(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "customer")
  def part(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "part")
  def supplier(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "supplier")
  def nation(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "nation")
  def region(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "region")
  def events(spark: SparkSession, dir: String): DataFrame =
    normalizeTs(load(spark, dir, "events"), "ts")
  def documents(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "embeddings")
}
