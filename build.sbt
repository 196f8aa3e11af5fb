ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "aibugdeduplicationspark"
// Spark jars ship with the image at /opt/spark/jars (zero-egress):
unmanagedBase := file("/opt/spark/jars")
// Test-only deps resolve from the pre-warmed coursier cache; anything
// else is intentionally not resolvable (COURSIER_MODE=offline).
libraryDependencies ++= Seq(
  "org.scalatest" %% "scalatest" % "3.2.19" % Test,
  "org.scalacheck" %% "scalacheck" % "1.18.0" % Test,
)
Test / fork := true
// Run suites CONCURRENTLY inside the one forked test JVM: suite wall time
// is dominated by per-job driver floors (planning, commit protocol) that
// overlap cleanly against the shared local SparkSession. Suites own
// disjoint target/ roots and never mutate global state (asserted by the
// suites themselves); within-suite tests stay sequential.
Test / testForkedParallel := true
// -oD: per-test durations in the report — the parallel schedule is bounded
// by its straggler suite, so knowing where the minutes go is maintenance
Test / testOptions += Tests.Argument(TestFrameworks.ScalaTest, "-oD")
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
  // local mode = driver-only JVM; 32 executor threads in a small heap spill
  // and GC-thrash (machine has 128 GiB — leave headroom for the OS cache)
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "64g")}",
  // Spark's whole-stage codegen emits many classes; once the default 240MB
  // JIT code cache fills, compilation stops and queries run interpreted
  // (measured: the SAME query 10s on first run, 130s on a later run)
  "-XX:ReservedCodeCacheSize=2g",
)
