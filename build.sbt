ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "tinymapreducespark"
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
// Pass the forked child's stdout through raw (no "[info] " prefix): the
// bench/verify harness parses a bare JSON line from stdout.
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
// local-mode Spark = one JVM; heap IS the cluster memory. 8g starved 32
// executor threads into GC churn on the array-heavy near-dup joins
// (±50% run variance at sf0.1). Default = min(48g, 40% of machine RAM,
// floored at 2g) so a memory-limited CI box isn't OOM-killed by a value
// tuned for a 128 GiB host; SPARK_DRIVER_MEM overrides.
def defaultHeapGb: Int = {
  val osBean = java.lang.management.ManagementFactory.getOperatingSystemMXBean
  val totalGb = osBean match {
    case b: com.sun.management.OperatingSystemMXBean =>
      (b.getTotalMemorySize / (1L << 30)).toInt
    case _ => 20 // unknown platform: land on 8g like the old default
  }
  math.max(2, math.min(48, totalGb * 2 / 5))
}
javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", s"${defaultHeapGb}g")}",
  // whole-stage codegen emits a fresh class per plan; a multi-hundred-
  // query JVM (Bench, TimeAll, ScaleProbe) fills the default 240 MB
  // code cache, the JIT stops compiling, and LATE queries silently run
  // interpreted — the late-session slowdowns the sweep kept showing.
  "-XX:ReservedCodeCacheSize=1g",
)
