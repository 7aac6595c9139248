package graft

import org.scalatest.funsuite.AnyFunSuite

/** The driver's own smoke contract: entry() returns rows, every
  * registered query has a callable function, and every oracle key has
  * a matching query. */
class EntrySpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("entry returns rows on sf0.001 (driver smoke contract)") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracle key has a registered query") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracles without queries: $missing")
  }

  test("query names are stable and well-formed") {
    assert(SparkEntry.queries.keys.forall(_.matches("[a-z][a-z0-9_]+")))
    assert(SparkEntry.queries.size >= 70)
  }
}
