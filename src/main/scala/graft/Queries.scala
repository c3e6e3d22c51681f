package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver-checked operator queries over the shared testdata tables, each
  * with a DuckDB oracle (see SparkEntry). Populated operator-by-operator;
  * every entry exercises one operator family from SURVEY.md §2 on the
  * TPC-H-ish tables so the driver's DuckDB compare can verify it.
  */
object Queries {
  def t(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  val all: Map[String, (SparkSession, String) => DataFrame] = Map.empty

  val oracles: Map[String, String] = Map.empty
}
