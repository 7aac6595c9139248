package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: dump formatted physical plans for representative queries
  * so scan pruning (`PushedFilters`/`ReadSchema`), join strategies
  * (BroadcastHashJoin vs SortMergeJoin) and WholeStageCodegen spans
  * can be audited after every change. Usage:
  * `sbt "runMain graft.PlanAudit [sfDir] [query...]"` */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val names = if (args.length > 1) args.drop(1).toSeq else Seq(
      "q02_filter_project", "q04_revenue_by_region", "q05_top_orders",
      "q13_latest_event_per_user", "d07_minhash_near_dups", "v02_ann_top_k")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { n =>
      println(s"\n========== $n ==========")
      SparkEntry.queries(n)(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
