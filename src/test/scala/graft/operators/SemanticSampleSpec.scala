package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** d41's cap/coverage contract: at most k survivors per semantic
  * cell, sparse cells pass through whole, and the draw is a pure
  * function of the corpus (re-run identical). */
class SemanticSampleSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  private def run(k: Int) =
    NorthStar.semanticSample(spark, dir, k).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))

  test("per-cell cap holds and ranks are 1..n within each cell") {
    val rows = run(4)
    val byCell = rows.groupBy(_._2)
    assert(byCell.values.forall(_.length <= 4))
    byCell.values.foreach { cell =>
      assert(cell.map(_._3).sorted.toSeq === (1L to cell.length).toSeq)
    }
    assert(byCell.size > 1, "projection must spread vectors across cells")
  }

  test("sparse cells survive whole; dense cells are genuinely capped") {
    // k beyond corpus size = the uncapped cell table
    val full = run(1000000).groupBy(_._2).map { case (c, xs) => c -> xs.map(_._1).toSet }
    val capped = run(4).groupBy(_._2).map { case (c, xs) => c -> xs.map(_._1).toSet }
    assert(full.exists(_._2.size > 4), "fixture must have at least one dense cell")
    full.foreach { case (cell, members) =>
      if (members.size <= 4)
        assert(capped(cell) === members, s"sparse cell $cell must keep all members")
      else {
        assert(capped(cell).size === 4)
        assert(capped(cell).subsetOf(members))
      }
    }
  }

  test("deterministic: two runs agree exactly") {
    assert(run(4).toSeq === run(4).toSeq)
  }
}
