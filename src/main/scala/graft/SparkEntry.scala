package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Each implemented operator from SURVEY.md §2 (plus the training-data
  * pipeline extensions) is one `Q` in a category object under
  * `graft.queries`; this object is the flat aggregation the driver
  * consumes. Column names match between each Spark program and its
  * DuckDB oracle SQL, and every query carries a total ORDER BY.
  */
object SparkEntry {

  private def allQs: Seq[Q] =
    RelationalQueries.all ++ PipelineQueries.all ++ AdvancedQueries.all ++
      SetOpQueries.all ++ WindowStatsQueries.all ++ TextQueries.all ++
      DedupQueries.all ++ SimilarityQueries.all ++ MultimodalQueries.all ++
      CurationQueries.all ++ QualityQueries.all ++ RetrievalQueries.all ++
      StreamingQueries.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q03_revenue_by_nation")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    allQs.map(q => q.name -> q.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    allQs.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
