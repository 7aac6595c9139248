package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation operators (builder mandate: "salting for skew, AQE
  * for runtime re-plan"). AQE's skew-join split handles sort-merge
  * joins adaptively; these helpers cover the cases AQE does not:
  * a broadcast-infeasible dim join with one hot fact key, and
  * aggregations whose single hot group overwhelms one reducer.
  */
object Skew {

  /** Salted equi-join: fact rows get a uniform salt in [0, factor),
    * dim rows are replicated once per salt value, and the join keys on
    * (key, salt) — a hot key's rows spread over `factor` reducers
    * instead of one. Dim replication costs |dim|·factor, so use for
    * mid-size dims where broadcast is too big but one hot fact key
    * melts a task. Semantics identical to `fact.join(dim, key)` for
    * inner and left joins (the fact side carries one salt per row, so
    * unmatched fact rows surface once). Right/full outer are rejected:
    * an unmatched DIM row exists `saltFactor` times after replication
    * and would surface once per salt. */
  def saltedEquiJoin(fact: DataFrame, dim: DataFrame, key: String,
      saltFactor: Int, joinType: String = "inner"): DataFrame = {
    require(Set("inner", "left", "leftouter", "leftsemi", "leftanti")
      .contains(joinType.toLowerCase.replace("_", "")),
      s"saltedEquiJoin supports inner/left-side joins only (got $joinType): " +
        "dim replication would emit unmatched dim rows once per salt")
    val saltedFact = fact.withColumn("__salt",
      (rand(42) * saltFactor).cast("int"))
    val saltedDim = dim.withColumn("__salt",
      explode(sequence(lit(0), lit(saltFactor - 1))))
    saltedFact.join(saltedDim, Seq(key, "__salt"), joinType).drop("__salt")
  }

  /** Two-phase salted aggregation for algebraic aggregates (sum /
    * count / min / max): phase 1 aggregates per (keys, salt) — the hot
    * group's work spreads over `saltFactor` reducers — phase 2 merges
    * the partials. Spark's map-side partial aggregation already blunts
    * most agg skew; this adds reducer-side spreading for the
    * hot-group-per-reducer residue (e.g. after an exploding join).
    *
    * `aggs` maps output name → (function, input column), function ∈
    * {sum, count, min, max}. */
  def saltedAggregate(df: DataFrame, keys: Seq[String],
      aggs: Map[String, (String, String)], saltFactor: Int): DataFrame = {
    require(aggs.nonEmpty)
    val salted = df.withColumn("__salt", (rand(7) * saltFactor).cast("int"))
    val phase1 = salted.groupBy((keys :+ "__salt").map(col): _*)
      .agg(
        aggs.head._2 match { case (f, c) => partial(f, c).as("__p_" + aggs.head._1) },
        aggs.tail.toSeq.map { case (name, (f, c)) => partial(f, c).as("__p_" + name) }: _*)
    phase1.groupBy(keys.map(col): _*)
      .agg(
        merge(aggs.head._2._1, "__p_" + aggs.head._1).as(aggs.head._1),
        aggs.tail.toSeq.map { case (name, (f, _)) =>
          merge(f, "__p_" + name).as(name) }: _*)
  }

  private def partial(f: String, c: String): Column = f match {
    case "sum" => sum(col(c))
    // count(col), not count(*): the (function, input column) API
    // promises SQL count semantics — nulls in the input column do
    // not count
    case "count" => count(col(c))
    case "min" => min(col(c))
    case "max" => max(col(c))
    case other => throw new IllegalArgumentException(s"non-algebraic aggregate: $other")
  }

  private def merge(f: String, partialCol: String): Column = f match {
    case "sum" | "count" => sum(col(partialCol))
    case "min" => min(col(partialCol))
    case "max" => max(col(partialCol))
  }
}
