package graft

import graft.operators.Dedup
import graft.queries._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver contract — see /root/repo/SURVEY.md §2 for the operator
  * inventory each query key exercises. */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    RelationalQueries.q1(spark, "/root/testdata/sf0.001")

  /** Registered here rather than in a query group for historical reasons;
    * fully oracle-checked like everything else (PipelineQueries.oracles
    * replays its blocking + jaccard in SQL). */
  private val extraQueries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "dd_ngram_jaccard" -> ((s, dir) =>
      Dedup.ngramJaccardPairs(
        Tables(s, dir, "documents").where(col("doc_id") < 50), "doc_id", "text",
        n = 4, threshold = 0.0)))

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    RelationalQueries.queries ++ GraphQueries.queries ++ EventQueries.queries ++
      TextQueries.queries ++ PipelineQueries.queries ++ AnalyticsQueries.queries ++ extraQueries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    RelationalQueries.oracles ++ GraphQueries.oracles ++ EventQueries.oracles ++
      TextQueries.oracles ++ PipelineQueries.oracles ++ AnalyticsQueries.oracles
}
