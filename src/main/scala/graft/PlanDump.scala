package graft

import org.apache.spark.sql.SparkSession

/** Dump .explain("formatted") for declared queries (no execution beyond
  * plan construction) — the plans/r06 evidence artifacts. Non-contract.
  *
  * Usage: SPARK_GRAFT_PLAN_DIR=plans/r06 SPARK_GRAFT_PLAN_SUFFIX=_after \
  *          sbt "runMain graft.PlanDump q_dedup_ngram_jaccard ..."
  * With no args, dumps every declared query.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val dir = sys.env.getOrElse("SPARK_GRAFT_PLAN_DIR", "plans/r06")
    val suffix = sys.env.getOrElse("SPARK_GRAFT_PLAN_SUFFIX", "")
    val names = if (args.nonEmpty) args.toSeq else Queries.all.keys.toSeq.sorted
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-plan-dump")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.serializer", "org.apache.spark.serializer.KryoSerializer")
      .config("spark.sql.parquet.columnarReaderBatchSize", "512")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    new java.io.File(dir).mkdirs()
    names.foreach { name =>
      try {
        val df = Queries.all(name)(spark, sfDir)
        val txt = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        java.nio.file.Files.writeString(
          java.nio.file.Paths.get(dir, s"$name$suffix.txt"), txt)
        println(s"[plandump] wrote $name")
      } catch {
        case e: Exception => System.err.println(s"[plandump] $name: $e")
      }
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
