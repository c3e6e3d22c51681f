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
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "31g")}",
  // lets `sbt runMain` drive mains that expect spark-submit to set the
  // master (e.g. graft.crawl.CrawlMain): SPARK_MASTER=local[8] sbt ...
  s"-Dspark.master=${sys.env.getOrElse("SPARK_MASTER", "local[32]")}",
)
// Benchmark JVMs (runMain graft.Bench / Verify) pre-commit and pre-touch the
// heap: lazy heap expansion means the first big crawl round pays tens of
// seconds of kernel page-zeroing (measured: first 1.2M-page fetch 102s vs
// 13s warm), which would otherwise be misattributed to the engine. Tests
// keep the lazy heap (a pretouched 72g per test fork is pure startup cost).
// 31g, not 72g (r6): a >= 32 GiB heap disables compressed oops — every JVM
// reference doubles to 8 bytes, exactly the pointer-heavy profile of the
// hash/object aggregations in the headline queries. Measured at identical
// code and harness shape: q_dedup_ngram_jaccard 2.25 s at 72g pre-touched
// vs 1.28 s at a compressed-oops heap; the full bench (headline + 1.2M-page
// crawl + seen + training ops) runs clean at 31g with crawl fetch/update
// FASTER than at 72g (12.20/6.93 s vs 12.72/8.26 s). 16g measured equal to
// 31g on the headline; 31g keeps crawl-phase headroom. Override via
// SPARK_DRIVER_MEM as before. Not a local[32]-only constant: <= 31 GiB
// executor JVMs with compressed oops are the standard deployment shape at
// any cluster size (several executors per host, never one giant heap).
run / javaOptions ++= Seq(
  s"-Xms${sys.env.getOrElse("SPARK_DRIVER_MEM", "31g")}",
  "-XX:+AlwaysPreTouch",
)
