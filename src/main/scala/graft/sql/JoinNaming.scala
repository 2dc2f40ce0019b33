package graft.sql

import org.apache.spark.sql.DataFrame

/** Reference join output-naming contract (SURVEY.md §2.3; reference:
  * dfsql/data_sources/base_data_source.py:493-506): after a join, column
  * names that collide between the two sides become `<table-or-alias>.<col>`
  * so they stay addressable (`SELECT t1.sex …` post-join).
  *
  * In Spark the analyzed plan already knows each output attribute's
  * qualifier, so the rename is a metadata pass — no data movement. We
  * qualify *all* collided columns, including join keys with equal names
  * on both sides; the reference leaves equal-named keys as two bare
  * duplicate columns (a latent bug its own survey flags as "not to copy
  * literally" — two identical labels are unaddressable).
  */
object JoinNaming {

  /** Qualify duplicate output names as `qualifier.name`; no-op when all
    * names are unique. Names that stay duplicated even after qualifying
    * (same alias joined twice) get a positional suffix. */
  def disambiguate(df: DataFrame): DataFrame = {
    val names = df.columns
    val dups = names.groupBy(identity).collect {
      case (n, occ) if occ.length > 1 => n
    }.toSet
    if (dups.isEmpty) return df
    val attrs = df.queryExecution.analyzed.output
    val proposed = attrs.map { a =>
      if (dups(a.name) && a.qualifier.nonEmpty) s"${a.qualifier.last}.${a.name}"
      else a.name
    }
    // names still duplicated after qualification (same alias joined with
    // itself, or genuinely duplicate output aliases) are the reference's
    // duplicate-name error (base_data_source.py:331-332) — raised HERE so
    // every facade path (DataSource.query, DfSql.sqlQuery, df.sql) agrees
    val stillDup = proposed.diff(proposed.distinct)
    if (stillDup.nonEmpty)
      throw new graft.QueryExecutionException(
        s"Duplicate column name in output: ${stillDup.head}")
    df.toDF(proposed: _*)
  }
}
