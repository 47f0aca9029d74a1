ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "youtubecaptionsbasedspeechdatasetparserspark"
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
// Forked run output goes straight to this process's stdout/stderr —
// no sbt "[info]" prefix, so Bench's single JSON line is machine-
// parseable by the driver harness.
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
javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  // 32g: the drain's per-batch processed cache is ~64 KB/url — the
  // bench's design-scale batches (131k urls/politeness window) hold
  // ~8 GB in the storage pool, which a 16g heap would spill
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "32g")}",
  // pre-size the heap: lazy heap growth under the first multi-GB cache
  // build showed up as a one-time ~12 s stall at 16 threads (DiagScale:
  // fresh-JVM cache pass 30.2 s vs 16.8 s warmed) — ergonomic
  // re-sizing mid-benchmark is measurement noise, not engine behavior
  s"-Xms${sys.env.getOrElse("SPARK_DRIVER_MEM", "32g")}",
  // image pipeline allocates ~1 MB/url churn at 15k urls/s across 32
  // threads; throughput GC with a roomy young gen keeps it off the
  // critical path
  "-XX:+UseParallelGC",
)
