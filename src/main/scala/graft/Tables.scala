package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions.{expr, timestamp_micros}
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Test-table access over the driver-generated parquet dirs
  * (/root/testdata/sf*). The reference engine lazily loads CSV files into
  * memory per table (reference: dfsql/table.py:51-72); here a "load" is just
  * declaring a parquet scan — Catalyst prunes columns and pushes filters into
  * the scan, so declaring the full table costs nothing.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Normalize an events `ts` column to session-TZ TIMESTAMP, branching on
    * the type the parquet scan actually produced. The driver has shipped two
    * physical encodings so far — TIMESTAMP(NANOS) read as raw int64 under
    * `nanosAsLong` (pre round 8) and `timestamp[us]` read as TIMESTAMP_NTZ
    * (current) — and a silent misread of one as the other compresses or
    * inflates all event times 1000× (round 7's four wrong streaming
    * answers). So: recognize both, loudly reject anything else. Sessions
    * pin spark.sql.session.timeZone=UTC, so NTZ → TIMESTAMP is an exact
    * wall-clock identity, matching DuckDB's naive-µs read bit for bit.
    */
  def normalizeTs(df: DataFrame): DataFrame = {
    val tsType = df.schema("ts").dataType
    val norm: Column = tsType match {
      case LongType          => timestamp_micros(expr("ts div 1000")) // legacy int64 nanos
      case TimestampNTZType  => expr("CAST(ts AS TIMESTAMP)")         // µs wall clock, UTC session
      case TimestampType     => expr("ts")
      case other => sys.error(
        s"testdata schema changed: events.ts is $other — expected " +
          "TIMESTAMP_NTZ/TIMESTAMP (µs) or LongType (legacy int64 nanos); " +
          "update graft.Tables.normalizeTs for the new contract")
    }
    df.withColumn("ts", norm)
  }

  /** Raw (un-normalized) batch read of an events parquet path, with the
    * legacy-nanos fallback and NO conf mutation on current data: µs
    * parquet infers cleanly with no conf touched at all. Only a
    * TIMESTAMP(NANOS) file (pre-round-8 encoding) fails schema
    * inference — "Illegal Parquet type" — and only THEN does
    * nanosAsLong go on, and stay on: in that era every events read in
    * the session needs it, so session scope is the correct scope. (A
    * set/restore around just this read would be wrong anyway: the conf
    * is consulted again when the scan executes, after a restore would
    * have cleared it.) Shared by the batch loader, the streaming
    * schema derivation and the CDC chunk staging, so all three read
    * the same physical contract. */
  def readEventsRaw(spark: SparkSession, path: String): DataFrame = {
    val key = "spark.sql.legacy.parquet.nanosAsLong"
    try spark.read.parquet(path)
    catch {
      case scala.util.control.NonFatal(_)
          if !spark.conf.get(key, "false").toBoolean =>
        spark.conf.set(key, "true")
        spark.read.parquet(path)
    }
  }

  /** The current events physical contract (µs-native, round 8+) — the
    * schema eventsStream falls back to when its staging directory is
    * still empty at stream construction (the classic file-source
    * pattern: the stream starts before the first file lands). Pinned by
    * TestdataContractSpec against the real files, so this fallback and
    * the data cannot drift apart silently. */
  val eventsContractSchema: org.apache.spark.sql.types.StructType = {
    import org.apache.spark.sql.types._
    StructType(Seq(
      StructField("event_id", LongType),
      StructField("ts", TimestampNTZType),
      StructField("user_id", LongType),
      StructField("event_type", StringType),
      StructField("value", DoubleType),
      StructField("props", StringType)))
  }

  def load(spark: SparkSession, dir: String, name: String): DataFrame = name match {
    case "events" =>
      normalizeTs(readEventsRaw(spark, s"$dir/events.parquet"))
    case _ =>
      spark.read.parquet(s"$dir/$name.parquet")
  }

  /** Register every test table as a temp view named after the table.
    * Failure-isolated per table: one table's schema drift must not take
    * down queries that never touch it (round 7: the events ts change
    * silenced 30 lineitem-only TPC-H gate entries because registerAll
    * eagerly analyzed all ten views). A failed table is reported loudly
    * and skipped — queries touching it then fail with
    * TABLE_OR_VIEW_NOT_FOUND, which names the actual culprit.
    *
    * Returns the set of tables that failed, so a caller can distinguish
    * "table skipped" from "table absent" without scraping stderr; the
    * union of all failures this JVM has seen is also accumulated in
    * [[registerFailuresSeen]] for end-of-run summaries (Verify). */
  def registerAll(spark: SparkSession, dir: String): Set[String] = {
    val failed = Set.newBuilder[String]
    all.foreach { n =>
      try load(spark, dir, n).createOrReplaceTempView(n)
      catch {
        case scala.util.control.NonFatal(e) =>
          failed += n
          // getMessage may be null (e.g. bare NPEs) — the isolation catch
          // must never itself throw
          val msg = Option(e.getMessage).flatMap(_.linesIterator.nextOption())
            .getOrElse("(no message)")
          System.err.println(
            s"[graft] WARN: could not register table '$n' from $dir: " +
              s"${e.getClass.getSimpleName}: $msg")
      }
    }
    val f = failed.result()
    if (f.nonEmpty)
      registerFailuresSeen.updateAndGet(_ ++ f)
    f
  }

  /** Union of every table registerAll failed to register in this JVM —
    * a diagnostic breadcrumb for end-of-run summaries, never control
    * flow. */
  val registerFailuresSeen =
    new java.util.concurrent.atomic.AtomicReference[Set[String]](Set.empty)
}
