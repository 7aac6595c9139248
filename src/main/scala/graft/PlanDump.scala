package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.ExplainMode

/** Dev tool: write `.explain("formatted")` output for named queries to
  * files — the before/after plan evidence the optimization rounds
  * commit under `plans/<round>/`. Usage:
  * `sbt "runMain graft.PlanDump <outDir> <suffix> <query...>"`
  * producing `<outDir>/<query>_<suffix>.txt` per query. Session shape
  * matches [[Bench]] (local[32], shuffle=32, AQE on, extensions) so
  * the captured plans are the plans the bench actually runs. */
object PlanDump {
  def main(args: Array[String]): Unit = {
    require(args.length >= 3, "usage: PlanDump <outDir> <suffix> <query...>")
    val outDir = Paths.get(args(0))
    val suffix = args(1)
    val names = args.drop(2).toSeq
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Files.createDirectories(outDir)
    val all = SparkEntry.queries ++ SparkEntry.benchOnly
    names.foreach { n =>
      val df = all(n)(spark, sfDir)
      val txt = df.queryExecution.explainString(ExplainMode.fromString("formatted"))
      // Formatted explain under AQE shows the INITIAL plan without
      // WholeStageCodegen spans; codegen claims need the EXECUTED
      // plan. A noop write would execute a DIFFERENT QueryExecution
      // (the write command's), leaving df.queryExecution un-executed
      // — so drive df's OWN executed plan via its internal-row RDD
      // (no driver collection, no row conversion), then walk the
      // finalized AQE tree for WholeStageCodegen spans.
      val exec = try {
        df.queryExecution.toRdd.foreach(_ => ())
        import org.apache.spark.sql.execution.{SparkPlan, WholeStageCodegenExec}
        import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
        val subtrees = scala.collection.mutable.ArrayBuffer[WholeStageCodegenExec]()
        def go(p: SparkPlan): Unit = p match {
          case a: AdaptiveSparkPlanExec => go(a.executedPlan)
          case q: QueryStageExec => go(q.plan)
          case w: WholeStageCodegenExec =>
            subtrees += w; w.children.foreach(go); w.subqueries.foreach(go)
          case o => o.children.foreach(go); o.subqueries.foreach(go)
        }
        go(df.queryExecution.executedPlan)
        s"Found ${subtrees.size} WholeStageCodegen subtrees.\n" +
          subtrees.zipWithIndex.map { case (w, i) =>
            s"== Subtree ${i + 1} ==\n${w.treeString.linesIterator.take(24).mkString("\n")}"
          }.mkString("\n")
      } catch { case e: Throwable => s"<exec failed: ${e.getMessage}>" }
      val out = txt + "\n\n== Executed: WholeStageCodegen subtrees ==\n" + exec + "\n"
      Files.write(outDir.resolve(s"${n}_$suffix.txt"), out.getBytes("UTF-8"))
      System.err.println(s"wrote ${n}_$suffix.txt (${out.length} chars)")
    }
    spark.stop()
  }
}
