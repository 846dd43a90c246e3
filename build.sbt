ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "bigdatacomputingspark"
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
// Pass the forked process's stdout straight through instead of routing it
// via sbt's logger: the driver parses Bench's one-line JSON, and the
// "[info] " prefix the logger adds has broken that parse every round
// (BENCH_r*.json all show parsed:null).
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
  // local[32] shuffle-heavy queries need real heap headroom; 8g caused
  // GC-bound 2x run-to-run variance on the bench
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "48g")}",
  // whole-stage codegen emits hundreds of classes per multi-query run; the
  // default 240m code cache fills mid-run and silently disables the JIT,
  // which showed up as intermittent 2-10x per-stage slowdowns
  "-XX:ReservedCodeCacheSize=1g",
) ++
  // experiment hook: extra space-separated JVM flags for the forked run
  // (e.g. SPARK_GRAFT_JAVA_OPTS="-XX:TieredStopAtLevel=1")
  sys.env.get("SPARK_GRAFT_JAVA_OPTS").toSeq
    .flatMap(_.trim.split("\\s+")).filter(_.nonEmpty)
