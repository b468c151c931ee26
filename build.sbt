ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "fuzzysethaskellspark"
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
  // local[32] runs 32 concurrent tasks in one JVM; sort/agg buffers at
  // bench scale need real heap (the box has 128 GiB). Fixed Xms avoids
  // heap-resize pauses mid-bench. 96g (round 5): the 1.6M-clip flagship
  // needs it to keep the N-side per-clip throughput flat vs 400k — at 48g
  // the narrow session's GC halves it and taints the scaling ratio (the
  // round-2 600k artifact). Xms without AlwaysPreTouch only reserves, so
  // small runs don't pay RSS for it.
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "96g")}",
  s"-Xms${sys.env.getOrElse("SPARK_DRIVER_MEM", "96g")}",
  // Throughput collector: G1 treats Spark's task-sized sort/serialization
  // buffers (> half its 16 MB region at this heap) as humongous objects;
  // 32 concurrent tasks allocating them trigger humongous-allocation
  // storms and full GCs that grow with task count — a direct inverse-
  // scaling mechanism at local[4N] vs local[N]. ParallelGC has no region
  // size cliff and wins for batch throughput here.
  "-XX:+UseParallelGC",
  // dev seam for JVM-flag A/Bs (e.g. SPARK_GC_EXTRA="-XX:NewRatio=1");
  // empty in normal runs
) ++ sys.env.get("SPARK_GC_EXTRA").toSeq.flatMap(_.split(" ").filter(_.nonEmpty))
