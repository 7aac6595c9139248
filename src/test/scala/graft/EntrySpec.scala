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

  test("every query has an oracle unless EXPLICITLY rows-only") {
    // The driver records a weaker rows-only check for oracle-less
    // queries; that downgrade must be a deliberate decision, never an
    // accident of forgetting the oracleSql entry. Approximate-by-
    // design operators (their accuracy/recall bounds live in specs):
    val rowsOnlyByDesign = Set(
      "q22_approx_stats", // HLL/quantile sketches: no cross-engine exactness
      "v02_ann_top_k",    // production-config sign-LSH (v07 pins exactness)
      "v04_ann_ivf")      // production-config IVF (v06/v08 pin exactness)
    val unoracled = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    val accidental = unoracled -- rowsOnlyByDesign
    assert(accidental.isEmpty,
      s"queries silently downgraded to rows-only (add an oracle or list " +
        s"them here with a reason): $accidental")
    val stale = rowsOnlyByDesign -- SparkEntry.queries.keySet
    assert(stale.isEmpty, s"rows-only allowlist names absent queries: $stale")
  }

  test("query names are stable and well-formed") {
    assert(SparkEntry.queries.keys.forall(_.matches("[a-z][a-z0-9_]+")))
    assert(SparkEntry.queries.size >= 70)
  }
}
