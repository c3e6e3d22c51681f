ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "unicrawlspark"
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
// Pass the forked process's stdout through verbatim (no "[info] " prefix):
// the bench driver greps stdout for the single JSON result line.
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
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "72g")}",
  // lets `sbt runMain` drive mains that expect spark-submit to set the
  // master (e.g. graft.crawl.CrawlMain): SPARK_MASTER=local[8] sbt ...
  s"-Dspark.master=${sys.env.getOrElse("SPARK_MASTER", "local[32]")}",
)
// Benchmark JVMs (runMain graft.Bench / Verify) pre-commit and pre-touch the
// heap: lazy heap expansion means the first big crawl round pays tens of
// seconds of kernel page-zeroing (measured: first 1.2M-page fetch 102s vs
// 13s warm), which would otherwise be misattributed to the engine. Tests
// keep the lazy heap (a pretouched 72g per test fork is pure startup cost).
run / javaOptions ++= Seq(
  s"-Xms${sys.env.getOrElse("SPARK_DRIVER_MEM", "72g")}",
  "-XX:+AlwaysPreTouch",
)
