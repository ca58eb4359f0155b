package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * Aggregates every declared query (SURVEY §2 operator inventory plus
  * the LLM-data-pipeline extensions) from the operator modules.
  */
object SparkEntry {

  /** Every declared query, in registration order. */
  def declared: Seq[Q] =
    operators.Relational.all ++ operators.Analytics.all ++ operators.Events.all ++
      operators.Text.all ++ operators.Dedup.all ++ operators.Similarity.all ++
      operators.MLOps.all ++ operators.Multimodal.all ++ operators.Streaming.all ++
      operators.Sources.all ++ operators.Warehouse.all ++ operators.Graph.all ++
      operators.SqlSurface.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    declared.head.run(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    declared.map(q => q.name -> q.run).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] =
    declared.flatMap(q => q.oracle.map(sql => q.name -> sql.trim)).toMap

  /** Headline subset timed by [[Bench]]. */
  def benchQueries: Seq[Q] = declared.filter(_.bench)
}
