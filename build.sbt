ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "cassandra_slow_queriesspark"
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
// Forked `runMain` output normally goes through sbt's logger, which
// prefixes every line with [info]/[error]; that prefix breaks any
// consumer that parses Bench's one-line JSON summary from the process
// tail (BENCH_r03..r05 "parsed": null). StdoutOutput passes the forked
// process's stdout/stderr through verbatim instead.
run / outputStrategy := Some(StdoutOutput)
// ...and sbt's own "[success] Total time" trailer otherwise prints
// AFTER Bench's final summary line, so a consumer that reads the
// literal last line of the process tail still misses the JSON.
ThisBuild / showSuccess := false
Global / excludeLintKeys += showSuccess
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
  // The harness runs 160 queries in ONE local[32] JVM: an 8g heap
  // forces storage-pool eviction + background G1 churn that inflates
  // every query ~2x (measured: full suite 261s vs the same queries
  // isolated at half that), and 160 codegen-heavy plans can exhaust
  // the default 240m JIT code cache (compilation silently stops).
  // The bench box has 128GiB; 32g driver heap + 512m code cache keep
  // the suite measuring operators instead of JVM pressure.
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "32g")}",
  "-XX:ReservedCodeCacheSize=512m",
) ++
  // Optional pinned INITIAL heap (SPARK_DRIVER_XMS=8g): G1 otherwise
  // starts small and grows adaptively, and allocation-heavy FIRST
  // stages can measure heap-growth machinery instead of the operator
  // (see SCALING.md round 10, GifProbe bisection). Opt-in only —
  // default behavior unchanged.
  sys.env.get("SPARK_DRIVER_XMS").map(x => s"-Xms$x").toSeq
