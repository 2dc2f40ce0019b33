package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every implemented operator from SURVEY.md §2 (plus the north-star
  * extension operators) is registered here: `queries` maps name →
  * (session, sfDir) => result; `oracleSql` carries the DuckDB-runnable
  * equivalent where the operator is SQL-expressible.
  */
object SparkEntry {

  /** All registered query groups, in display order. */
  private def groups: Seq[graft.queries.Q] =
    graft.queries.ParityQueries.all ++
      graft.queries.FacadeQueries.all ++
      graft.queries.TextQueries.all ++
      graft.queries.DedupQueries.all ++
      graft.queries.SimilarityQueries.all ++
      graft.queries.MultimodalQueries.all ++
      graft.queries.ScaleQueries.all ++
      graft.queries.TpchQueries.all ++
      graft.queries.SurfaceQueries.all ++
      graft.queries.PipelineQueries.all ++
      graft.queries.SnapshotQueries.all ++
      graft.queries.AnalyticsQueries.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    graft.queries.ParityQueries.flagship(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    groups.map(q => q.name -> q.run).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    groups.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
