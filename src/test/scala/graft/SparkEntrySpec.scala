package graft

/** Driver-contract invariants (t1 smoke shape + registry hygiene). */
class SparkEntrySpec extends SparkSpec {

  test("entry (flagship) returns rows on sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracle key has a query; names are unique") {
    val q = SparkEntry.queries
    assert(SparkEntry.oracleSql.keySet.subsetOf(q.keySet))
    val names = graft.queries.RegistryExt.all.map(_.name)
    assert(names.distinct.size == names.size)
  }

  test("every query runs and returns at least one row on sf0.001") {
    val failures = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      try { if (fn(spark, sf).count() > 0) None else Some(s"$name: 0 rows") }
      catch { case e: Throwable => Some(s"$name: ${e.getMessage.take(100)}") }
    }
    assert(failures.isEmpty, failures.mkString("; "))
  }
}
