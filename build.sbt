ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "pysparkingestionspark"
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
// Route the forked run JVM's stdout/stderr RAW to the console instead of
// through sbt's logger: the logger prefixes every line with "[info] ",
// which is exactly why the driver's BENCH_r08 tail held a complete JSON
// line that still failed json.loads ("[info] {\"metric\":...}"). With
// StdoutOutput the bench line reaches stdout verbatim.
run / connectInput := false
run / outputStrategy := Some(OutputStrategy.StdoutOutput)
// Drop the "[success] Total time: ..." trailer sbt prints after a task,
// so the bench's compact JSON line is the literal LAST line of stdout
// (the driver keeps only the last 2000 chars and parses the last line).
Global / showSuccess := false
// showSuccess is consumed by sbt's command engine, which the unused-
// settings lint can't see (its own warning says as much) — exclude it.
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
// Forward bench knobs (-DgraftBenchRuns / -DgraftBenchOnly on the sbt
// command line) into the forked run JVM.
javaOptions ++= sys.props.toSeq.collect {
  case (k, v) if k.startsWith("graftBench") => s"-D$k=$v"
}
javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
)
