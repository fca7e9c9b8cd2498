ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "maplespark"
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
// forked runs write stdout DIRECTLY (no "[info] " log prefix): the
// driver parses graft.Bench's final JSON line from captured stdout, and
// the logger prefix defeated that parse every round (BENCH_rN.json
// landed with parsed: null)
run / outputStrategy := Some(OutputStrategy.StdoutOutput)
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
javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
  // Throughput collector for the local single-JVM harness (r14 item 8):
  // 32 threads of allocation-heavy micro-tasks on one 8 GB heap are
  // exactly G1's worst case (concurrent-cycle + write-barrier overhead,
  // profiled as executorRunTime ~10x CPU with multi-second GC waits).
  // Full-suite A/B, 185 queries, min-of-2 per arm: G1 111.4 s vs
  // ParallelGC 79.4 s — geomean 0.725, 169/185 queries faster, worst
  // regression +9%. GRAFT_GC overrides (e.g. -XX:+UseG1GC); a real
  // cluster sizes executor heaps separately and should re-evaluate —
  // above ~32 GB heaps G1/ZGC pause behavior usually wins back.
  sys.env.getOrElse("GRAFT_GC", "-XX:+UseParallelGC"),
).filter(_.nonEmpty)
