package graft.commands

import graft.CommandException
import graft.catalog.{DataSource, QueryResult}

/** The three regex-dispatched catalog commands (reference:
  * dfsql/commands.py). These are sniffed *before* SQL parsing
  * (base_data_source.py:164-170) and operate on the DataSource catalog,
  * not on data. Regexes intentionally match the reference's exactly.
  */
object Commands {

  sealed trait Command { def execute(ds: DataSource): QueryResult }

  /** CREATE TABLE (<path>)  — register a file table (commands.py:32-63) */
  final case class CreateTable(path: String) extends Command {
    def execute(ds: DataSource): QueryResult = {
      ds.addTableFromFile(path)
      QueryResult.Ok
    }
  }

  /** DROP TABLE <name>  (commands.py:66-90) */
  final case class DropTable(name: String) extends Command {
    def execute(ds: DataSource): QueryResult = {
      ds.dropTable(name)
      QueryResult.Ok
    }
  }

  /** SHOW TABLES — DataFrame of (name, fpath)  (commands.py:93-117) */
  case object ShowTables extends Command {
    def execute(ds: DataSource): QueryResult = {
      val spark = ds.spark
      import spark.implicits._
      val rows = ds.tableNames.map(n => (n, tablePath(ds, n)))
      QueryResult.Frame(rows.toDF("name", "fpath"))
    }
    private def tablePath(ds: DataSource, name: String): String =
      ds.tableMeta(name).fpath
  }

  /** CREATE TABLE <name> AS SELECT … — extension beyond the reference's
    * three commands: materializes the SELECT to parquet under the
    * DataSource's metadata dir and registers it as a new table. */
  final case class CreateTableAs(name: String, select: String) extends Command {
    def execute(ds: DataSource): QueryResult = {
      // saveTable checks the name BEFORE writing — writing first would
      // leave an orphan file that blocks every retry of the CTAS
      ds.saveTable(name, ds.queryDF(select))
      QueryResult.Ok
    }
  }

  private val createRe = """^CREATE TABLE \((\S+)?\);?$""".r
  private val ctasRe = """(?is)^CREATE TABLE (\w+) AS (SELECT .+?);?$""".r
  private val dropRe = """^DROP TABLE (\S+);?$""".r
  private val showRe = """^SHOW TABLES\s*;?$""".r

  def tryParse(sql: String): Option[Command] = sql match {
    case ctasRe(name, select) => Some(CreateTableAs(name, select))
    case createRe(arg) =>
      if (arg == null)
        throw new CommandException("First argument must be a file path, got instead: null.")
      Some(CreateTable(arg.stripPrefix("'").stripSuffix("'")
        .stripPrefix("\"").stripSuffix("\"")))
    case dropRe(name) =>
      Some(DropTable(name.stripPrefix("'").stripSuffix("'")
        .stripPrefix("\"").stripSuffix("\"")))
    case _ if showRe.matches(sql) => Some(ShowTables)
    case _ => None
  }
}
