package graft

import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted}

// Ad-hoc profiling harness — not part of the library surface.
object Scratch {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // Cached plans keep their exact output partitioning unless this
      // is on; without it every CacheScope-sealed result pins the full
      // pre-coalesce shuffle width onto all downstream consumers.
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "true")
      // keep the ContextCleaner live on a big-heap JVM (see Bench)
      .config("spark.cleaner.periodicGC.interval", "1min")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val jobs = new AtomicInteger(0)
    val describe = sys.env.contains("SCRATCH_DESCRIBE")
    // executionId → physical-plan description head, captured at SQL
    // execution start so broadcast-future jobs (whose stage callsites
    // are just the thread pool) can be attributed to their query.
    val sqlDescs = new java.util.concurrent.ConcurrentHashMap[String, String]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onOtherEvent(e: org.apache.spark.scheduler.SparkListenerEvent): Unit = e match {
        case s: org.apache.spark.sql.execution.ui.SparkListenerSQLExecutionStart if describe =>
          sqlDescs.put(s.executionId.toString, s.description.linesIterator.take(1).mkString.take(120))
        case s: org.apache.spark.sql.execution.ui.SparkListenerSQLExecutionEnd =>
          sqlDescs.remove(s.executionId.toString) // bound the map over a long run
        case _ => ()
      }
      override def onJobStart(js: SparkListenerJobStart): Unit = {
        jobs.incrementAndGet()
        if (describe) {
          val execId = Option(js.properties)
            .map(_.getProperty("spark.sql.execution.id", "")).getOrElse("")
          val desc = Option(sqlDescs.get(execId)).getOrElse("")
          val stages = js.stageInfos.map(si => s"[${si.stageId}:${si.numTasks}]").mkString(",")
          println(s"  JOB ${js.jobId} exec=$execId tasks=${js.stageInfos.map(_.numTasks).sum} $stages | $desc")
        }
      }
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit =
        if (describe) {
          val si = sc.stageInfo
          val ms = (for {a <- si.completionTime; b <- si.submissionTime} yield a - b).getOrElse(-1L)
          if (ms >= 200) {
            println(f"  STAGE ${si.stageId}%4d ${ms / 1000.0}%6.2f s tasks=${si.numTasks}%4d ${si.name.take(90)}")
            // callsite stack: first graft frames identify the operator
            si.details.linesIterator.filter(_.contains("graft.")).take(3)
              .foreach(l => println(s"        $l"))
          }
        }
    })

    def time(name: String)(f: => Long): Unit = {
      val j0 = jobs.get()
      val t0 = System.nanoTime()
      val n = f
      val dt = (System.nanoTime() - t0) / 1e9
      // listener is async; give it a beat before reading the counter
      Thread.sleep(200)
      println(f"TIME $name%-32s $dt%8.2f s  jobs=${jobs.get() - j0}%4d  rows=$n")
      spark.catalog.clearCache()
    }

    // warmup
    spark.read.parquet(s"$sfDir/lineitem.parquet").groupBy("l_returnflag").count().collect()

    // benchOnly rows (production twins) are measurable here too —
    // they are exactly the rows whose bench numbers need minima
    val all = SparkEntry.queries ++ SparkEntry.benchOnly
    val names = if (args.nonEmpty) args.toSeq else all.keys.toSeq.sorted
    val rounds = sys.env.get("SCRATCH_ROUNDS").map(_.toInt).getOrElse(2)
    for (round <- 1 to rounds; name <- names)
      time(s"$name r$round") { all(name)(spark, sfDir).count() }
    spark.stop()
  }
}
