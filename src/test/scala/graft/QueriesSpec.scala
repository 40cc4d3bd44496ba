package graft

import org.apache.spark.sql.functions._

/** Guard for the driver contract: every SparkEntry query must run against
  * the harness tables and produce sane output. Catches battery regressions
  * in `sbt test` instead of at driver verify time.
  */
class QueriesSpec extends SparkSpecBase {

  private val dir = "/root/testdata/sf0.001"

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every query runs at sf0.001 and returns rows") {
    val counts = SparkEntry.queries.map { case (name, fn) =>
      name -> fn(spark, dir).count()
    }
    val empty = counts.filter(_._2 == 0L)
    assert(empty.isEmpty, s"empty results: ${empty.keys.mkString(", ")}")
  }

  test("every oracleSql key has a matching query") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracle without query: $missing")
  }

  test("oracle-covered queries have deterministic output (rerun-stable)") {
    // run each DuckDB-verified query twice and compare collected output —
    // guards against nondeterminism (ties, float instability, map order)
    // that would break the driver's hash compare
    for (name <- SparkEntry.oracleSql.keys) {
      val fn = SparkEntry.queries(name)
      val a = fn(spark, dir).collect().map(_.toString).toSeq
      val b = fn(spark, dir).collect().map(_.toString).toSeq
      assert(a === b, s"$name is rerun-unstable")
    }
  }
}
