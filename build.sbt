ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "simpledataengineeringprojectspark"
// Spark jars ship with the image at /opt/spark/jars (zero-egress):
unmanagedBase := file("/opt/spark/jars")
// Test-only deps resolve from the pre-warmed coursier cache; anything
// else is intentionally not resolvable (COURSIER_MODE=offline).
libraryDependencies ++= Seq(
  "org.scalatest" %% "scalatest" % "3.2.19" % Test,
  "org.scalacheck" %% "scalacheck" % "1.18.0" % Test,
)
Test / fork := true
run / fork := true
// Pass the forked program's stdout through verbatim: sbt's default
// LoggedOutput prefixes every line with "[info] ", which corrupts
// Bench's single-JSON-line contract for downstream parsers.
run / outputStrategy := Some(StdoutOutput)
// Spark 4.x on JDK 17 needs these when SparkSession is created outside
// spark-submit (which normally injects them). Matches
// org.apache.spark.launcher.JavaModuleOptions.defaultModuleOptions().
val jdk17AddOpens = Seq(
  "java.base/java.lang", "java.base/java.lang.invoke",
  "java.base/java.lang.reflect", "java.base/java.io",
  "java.base/java.net", "java.base/java.nio",
  "java.base/java.util", "java.base/java.util.concurrent",
  "java.base/java.util.concurrent.atomic",
  "java.base/sun.nio.ch", "java.base/sun.nio.cs",
  "java.base/sun.security.action", "java.base/sun.util.calendar",
).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))
// min(24g, 60% of MemTotal), floored at 2g: the measured 32-task
// sizing where the host affords it, a non-swapping fraction where it
// does not. Linux-only read; other hosts fall back to the 24g cap.
val defaultHeap: String = {
  val capMb = 24 * 1024
  val memTotalMb =
    try {
      scala.io.Source.fromFile("/proc/meminfo").getLines()
        .collectFirst { case l if l.startsWith("MemTotal:") =>
          l.split("\\s+")(1).toLong / 1024 }
    } catch { case _: Throwable => None }
  val mb = memTotalMb.map(t => math.max(2048L, math.min(capMb.toLong, t * 6 / 10)))
    .getOrElse(capMb.toLong)
  s"${mb}m"
}

javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  // Heap sized to the harness shape, not the JVM default: local[32]
  // runs 32 concurrent tasks inside ONE driver JVM, so execution
  // memory per task is (heap × spark.memory.fraction) / 32 — at the
  // old 8g default that was ~150 MB/task and the full-registry bench
  // ran memory-starved (measured: the 30M-row calibration shuffle
  // took 5.0 s in-session vs 1.5 s standalone; 24g restores 1.2-1.6 s
  // and cut the whole bench ~19%). The DEFAULT is clamped to 60% of
  // the host's physical memory so a small host never over-commits
  // and swaps the whole bench; SPARK_DRIVER_MEM still overrides
  // unconditionally for deliberate experiments.
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", defaultHeap)}",
  // Spark's ContextCleaner reclaims shuffle files / broadcasts via
  // weak references, so it needs GCs to happen; with a big heap they
  // become rare and the cleaner runs System.gc() periodically
  // (spark.cleaner.periodicGC.interval, set in the session builders).
  // Without this flag that call is a stop-the-world FULL collection —
  // measured 2-3 s pauses landing inside timed queries; with it G1
  // runs a concurrent cycle instead (reference processing intact).
  "-XX:+ExplicitGCInvokesConcurrent",
) ++
  // Ad-hoc JVM flags for local A/B experiments (GC, tmpdir, extra -D
  // confs) without touching the build — unset in normal runs.
  sys.env.get("SPARK_GRAFT_JAVA_OPTS").toSeq.flatMap(_.split("\\s+")).filter(_.nonEmpty)
