ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "userfeedcdcspark"
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
// Pass the forked JVM's stdout straight through instead of routing it via
// sbt's logger: the logger adds an "[info] " prefix to every line, which
// breaks downstream consumers of Bench's single JSON output line.
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
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
  // Long-session codegen discipline (r20, guide §1/§7): a session that
  // plans many DISTINCT queries (Bench runs 295 twice: warm-up + timed)
  // overflows Spark's generated-code cache at its 100-entry default, so
  // the timed pass re-Janino-compiles every fragment the warm-up pass
  // already compiled — measured as the same query running up to 2×
  // slower inside the 295-query session than standalone (where one
  // query's fragments fit in 100). Sized to hold the whole suite's
  // fragments; scale-independent (driver-side planning cost only, and a
  // real cluster's driver would want the same for a 295-query workload).
  "-Dspark.sql.codegen.cache.maxEntries=8192",
  // The generated classes are also JIT-compiled; at the JDK-17 default
  // 240 MB ReservedCodeCacheSize the profiled segment saturates mid-
  // suite (observed 101/118 MB with sweeper churn). An attribution A/B
  // measured this flag alone as NEUTRAL on the suite total (the codegen
  // cache above is the load-bearing fix) — kept as headroom because the
  // larger codegen cache retains more generated classes for the JIT to
  // compile over a long session.
  "-XX:ReservedCodeCacheSize=512m",
)
