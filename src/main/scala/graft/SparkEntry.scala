package graft
import org.apache.spark.sql.{SparkSession, DataFrame}
import graft.queries.RegistryExt
/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * The actual query surface lives in [[graft.queries.Registry]] /
  * [[graft.queries.RegistryExt]]; this object just adapts it. */
object SparkEntry {
  /** Flagship query (the reference's filing-hour histogram, SURVEY.md
    * §7.1) on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q07_hour_histogram")(spark, "/root/testdata/sf0.001")
  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    RegistryExt.all.map(q => q.name -> q.run).toMap
  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    RegistryExt.all.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
