package graft

import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}

/** Shared plan-walking helper for plan-shape specs: descend AQE
  * wrapper nodes — a plain `plan.collect` stops at query-stage
  * boundaries and misses nodes inside finished stages. One definition
  * so a Spark upgrade that changes the wrapper node set is fixed in
  * one place. */
object PlanWalk {
  def collectAll[T](p: SparkPlan)(pf: PartialFunction[SparkPlan, Seq[T]]): Seq[T] =
    p.collect {
      case a: AdaptiveSparkPlanExec => collectAll(a.executedPlan)(pf)
      case q: QueryStageExec        => collectAll(q.plan)(pf)
      case n if pf.isDefinedAt(n)   => pf(n)
    }.flatten
}
