package graft

import graft.api.FuzzyPipeline
import graft.conf.FuzzyConf
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * The operator inventory itself lives in [[graft.Queries]].
  */
object SparkEntry {

  /** Flagship: the full dedup pipeline (index -> LSH/SimHash candidates ->
    * verify -> connected components) over the sf0.001 documents corpus;
    * one row per document with its duplicate-cluster label.
    */
  def entry(spark: SparkSession): DataFrame = {
    val d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    FuzzyPipeline(spark, d, "doc_id", "text", FuzzyConf()).clusters()
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Queries.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] = Queries.oracleSql
}
