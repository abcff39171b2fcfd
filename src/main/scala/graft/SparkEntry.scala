package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` aggregates every implemented operator from SURVEY.md §2 (plus
  * the LLM-data-pipeline extensions); `oracleSql` carries the DuckDB
  * equivalent the driver hash-compares against at sf0.01.
  */
object SparkEntry {

  private def modules: Seq[(Map[String, (SparkSession, String) => DataFrame], Map[String, String])] =
    Seq(
      (operators.Relational.queries, operators.Relational.oracles),
      (operators.RdfOps.queries, operators.RdfOps.oracles),
      (operators.Projections.queries, operators.Projections.oracles),
      (operators.Events.queries, operators.Events.oracles),
      (operators.TextOps.queries, operators.TextOps.oracles),
      (operators.VectorOps.queries, operators.VectorOps.oracles),
      (operators.PipelineOps.queries, operators.PipelineOps.oracles),
      (operators.RenderOps.queries, operators.RenderOps.oracles),
      (operators.ComposeOps.queries, operators.ComposeOps.oracles),
      (operators.CrawlOps.queries, operators.CrawlOps.oracles),
      (operators.SketchOps.queries, operators.SketchOps.oracles)
    )

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0:
    * the §3.1 person-index pipeline end-to-end. */
  def entry(spark: SparkSession): DataFrame =
    pipelines.PersonIndex.documents(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    modules.iterator.map(_._1).reduce(_ ++ _)

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    modules.iterator.map(_._2).reduce(_ ++ _)
}
