package graft.api

import org.apache.spark.sql.DataFrame

import graft.DfsqlException
import graft.sql.Dialect

/** One-shot functional entry points mirroring the reference's
  * `sql_query(sql, **dataframes)` (reference: dfsql/__init__.py:12-36) and
  * the `df.sql("SELECT …")` accessor (reference: dfsql/extensions.py:10-68).
  *
  * Unlike the reference — which round-trips every DataFrame through a temp
  * CSV — incoming DataFrames are registered directly as temp views: there
  * is no driver-side materialization, so the query plans (and their
  * pushdowns) stay fully distributed.
  */
object DfSql {

  /** Run `sql` against the given name→DataFrame bindings. Mirrors the
    * reference's validations: at least one table; every binding must be
    * referenced in the SQL text. Views are dropped in `finally`. */
  def sqlQuery(sql: String, tables: (String, DataFrame)*): DataFrame = {
    if (tables.isEmpty)
      throw new DfsqlException(
        "Wrong from_tables value. Expected a non-empty set of table name -> DataFrame bindings.")
    tables.foreach { case (name, _) =>
      if (!sql.contains(name))
        throw new DfsqlException(
          s"Table $name found in from_tables, but not in the SQL query.")
    }
    val spark = tables.head._2.sparkSession
    // snapshot any pre-existing temp views sharing a binding name, so the
    // call doesn't clobber session state (the view's analyzed plan
    // survives the drop and can be re-registered)
    val shadowed = tables.flatMap { case (name, _) =>
      val isTempView =
        try spark.catalog.getTable(name).isTemporary
        catch { case _: Exception => false } // absent or non-temp: nothing to restore
      if (isTempView) {
        val prior = spark.table(name)
        prior.queryExecution.analyzed // force analysis before we replace it
        Some(name -> prior)
      } else None
    }
    try {
      tables.foreach { case (name, df) => df.createOrReplaceTempView(name) }
      graft.sql.JoinNaming.disambiguate(
        try spark.sql(Dialect.lower(sql))
        catch {
          // reference error contract (test_interface.py
          // test_error_wrong_table_name): an unbound table raises the
          // library's own exception, and the call is retryable after the
          // failure (the finally below restores session state)
          case e: org.apache.spark.sql.AnalysisException
              if e.getCondition == "TABLE_OR_VIEW_NOT_FOUND" =>
            throw new DfsqlException(
              s"Unknown table ${e.messageParameters.getOrElse("relationName", "?")}")
        })
    } finally {
      tables.foreach { case (name, _) => spark.catalog.dropTempView(name) }
      shadowed.foreach { case (name, df) => df.createOrReplaceTempView(name) }
    }
  }

  /** sqlQuery with the reference's reduce_output=True semantics: a 1×1
    * result comes back as a Scalar (reference: __init__.py:12,
    * base_data_source.py:455-461). */
  def sqlQueryReduced(
      sql: String, tables: (String, DataFrame)*): graft.catalog.QueryResult =
    graft.catalog.QueryResult.reduce(sqlQuery(sql, tables: _*))

  /** sqlQuery with reference-style custom scalar functions registered for
    * the duration of the session (reference: __init__.py custom_functions
    * kwarg; registration shadows same-named built-ins). */
  def sqlQueryWith(
      sql: String,
      customFunctions: Map[String, org.apache.spark.sql.expressions.UserDefinedFunction],
      tables: (String, DataFrame)*): DataFrame = {
    if (tables.nonEmpty) {
      val spark = tables.head._2.sparkSession
      customFunctions.foreach { case (name, f) => spark.udf.register(name, f) }
    }
    sqlQuery(sql, tables: _*)
  }

  /** `df.sql("SELECT a WHERE b > 1")` — implicit-FROM accessor. The frame
    * is bound as table `temp` and every FROM-less SELECT gets
    * `from temp` spliced in (Dialect.addImplicitFrom). */
  implicit class SqlOps(private val df: DataFrame) {
    def sql(query: String): DataFrame = {
      // literal dotted columns (join output naming) stay addressable
      // without manual backticks, as in the reference
      val dotted = df.columns.filter(_.contains(".")).toSet
      val withFrom = Dialect.addImplicitFrom(
        Dialect.backtickDottedColumns(query, dotted), "temp")
      sqlQuery(withFrom, "temp" -> df)
    }
  }
}
