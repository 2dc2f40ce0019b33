package graft.api

import graft.{DfsqlException, SparkSpec}
import graft.api.DfSql.SqlOps

class DfSqlSpec extends SparkSpec {

  private lazy val li = graft.Tables.load(spark, sf0001, "lineitem")
  private lazy val cust = graft.Tables.load(spark, sf0001, "customer")

  test("sqlQuery joins two passed DataFrames") {
    val out = DfSql.sqlQuery(
      "SELECT count(*) AS n FROM li JOIN cust ON li.l_orderkey % 150 = cust.c_custkey",
      "li" -> li, "cust" -> cust)
    assert(out.head.getLong(0) > 0)
  }

  test("sqlQuery rejects bindings missing from the SQL text") {
    assertThrows[DfsqlException] {
      DfSql.sqlQuery("SELECT 1", "unused_table" -> li)
    }
  }

  test("sqlQuery rejects an empty binding set") {
    assertThrows[DfsqlException](DfSql.sqlQuery("SELECT 1"))
  }

  test("unbound table raises DfsqlException, and a retry succeeds (test_error_wrong_table_name)") {
    // reference: sql_query(sql, wrong_table=df) fails twice over — the
    // binding isn't referenced AND the referenced table isn't bound;
    // binding correctly afterwards must work (no stale session state)
    assertThrows[DfsqlException] {
      DfSql.sqlQuery("SELECT l_orderkey FROM whatever_table", "wrong_table" -> li)
    }
    val ok = DfSql.sqlQuery(
      "SELECT l_orderkey FROM whatever_table", "whatever_table" -> li)
    assert(ok.columns.toSeq === Seq("l_orderkey"))
    assert(ok.count() === li.count())
  }

  test("extra unreferenced bindings are rejected (test_error_extra_tables)") {
    assertThrows[DfsqlException] {
      DfSql.sqlQuery("SELECT l_orderkey FROM whatever_table",
        "whatever_table" -> li, "extra_table" -> cust)
    }
  }

  test("backticked caps columns and function-shaped aliases (test_caps_column_names_dataframe)") {
    import spark.implicits._
    val df = Seq((2, "2021-02-27", 3626L), (2, "2021-02-28", 5012L))
      .toDF("ROUTE", "DATE", "RIDES")
    val out = DfSql.sqlQuery(
      """SELECT `DATE` AS __timestamp, AVG(`RIDES`) AS `AVG(RIDES)`
        |FROM tab GROUP BY `DATE` ORDER BY __timestamp""".stripMargin,
      "tab" -> df)
    assert(out.columns.toSeq === Seq("__timestamp", "AVG(RIDES)"))
    assert(out.collect().map(_.getDouble(1)).toSeq === Seq(3626.0, 5012.0))
  }

  test("df.sql with implicit FROM") {
    val n = li.sql("SELECT count(*) AS n").head.getLong(0)
    assert(n === li.count())
  }

  test("df.sql with WHERE and aggregation") {
    val out = li.sql(
      "SELECT l_returnflag, count(*) AS n WHERE l_quantity > 10 GROUP BY l_returnflag ORDER BY l_returnflag")
    assert(out.columns.toSeq === Seq("l_returnflag", "n"))
    assert(out.count() === 3)
  }

  test("df.sql nested IN subquery gets both FROMs injected") {
    val out = li.sql(
      "SELECT l_orderkey WHERE l_orderkey IN (SELECT l_orderkey WHERE l_quantity > 49)")
    assert(out.count() > 0)
  }

  test("df.sql addresses literal dotted columns from a join result") {
    val joined = graft.api.DfSql.sqlQuery(
      "SELECT * FROM a JOIN b ON a.c_custkey = b.c_custkey",
      "a" -> cust, "b" -> cust)
    val renamed = graft.sql.JoinNaming.disambiguate(joined)
    assert(renamed.columns.contains("a.c_name"))
    val out = renamed.sql("SELECT a.c_name WHERE a.c_custkey < 5 ORDER BY a.c_name")
    assert(out.columns.toSeq === Seq("a.c_name"))
    assert(out.count() === 5)
  }

  test("temp view is cleaned up after sqlQuery") {
    DfSql.sqlQuery("SELECT count(*) AS n FROM cleanup_check",
      "cleanup_check" -> li)
    assert(!spark.catalog.tableExists("cleanup_check"))
  }

  test("regression: duplicate output aliases error on the sqlQuery path too") {
    assertThrows[graft.QueryExecutionException] {
      DfSql.sqlQuery("SELECT l_orderkey AS x, l_partkey AS x FROM li", "li" -> li)
    }
  }

  test("regression: a pre-existing temp view sharing a binding name survives") {
    cust.limit(3).createOrReplaceTempView("shared_name")
    DfSql.sqlQuery("SELECT count(*) AS n FROM shared_name", "shared_name" -> li)
    // the user's original view is still there with its original contents
    assert(spark.catalog.tableExists("shared_name"))
    assert(spark.table("shared_name").count() === 3)
    spark.catalog.dropTempView("shared_name")
  }
}
