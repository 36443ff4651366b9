package graft
import org.apache.spark.sql.{SparkSession, DataFrame}
/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {
  /** Flagship: the KG-construction pipeline end-to-end on the synthetic
    * corpus (pages -> extract -> link -> WSD -> triples).
    */
  def entry(spark: SparkSession): DataFrame = {
    implicit val s = spark
    pipeline.Pipeline.run(corpus.CorpusGen.pages(spark, 100))
  }
  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    relational.RelationalQueries.queries ++ relational.AdvancedQueries.queries ++
      KgQueries.queries ++ ops.DocOps.queries ++ ops.Multimodal.queries ++
      ops.CorpusOps.queries
  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    relational.RelationalQueries.oracleSql ++ relational.AdvancedQueries.oracleSql ++
      ops.DocOps.oracleSql ++ ops.CorpusOps.oracleSql ++ ops.Multimodal.oracleSql ++
      KgQueries.oracleSql
}
