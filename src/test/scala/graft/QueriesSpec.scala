package graft

/** Smoke + shape tests for every judged query at sf0.001: runs, yields
  * rows, is deterministic across two executions (the driver's oracle
  * gate does the value-level check; this keeps `sbt test` meaningful
  * without DuckDB).
  */
class QueriesSpec extends SparkSpec {

  test("entry yields rows (driver smoke contract)") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracle key has a query") {
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
  }

  for ((name, fn) <- SparkEntry.queries.toSeq.sortBy(_._1)) {
    test(s"$name runs and is deterministic at sf0.001") {
      val a = fn(spark, sf0001)
      val rows1 = a.collect().map(_.toString).toSeq
      val rows2 = fn(spark, sf0001).collect().map(_.toString).toSeq
      assert(rows1 == rows2, s"$name nondeterministic")
      assert(rows1.nonEmpty || name.contains("ri_sweep"), s"$name empty")
    }
  }
}
