package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.operators.Frequency

/** Streaming distinct-count monitoring — the t53 HyperLogLog sketch as
  * per-batch state: each arriving event micro-batch reduces to its
  * per-event-type register set (≤ 256·|keys| rows) and lands in a
  * batchId-keyed partial-sketch store; estimates are served by
  * max-merging the partials at read time.
  *
  * Why this shape survives both failure and scale:
  *   - register max-merge is associative, commutative and IDEMPOTENT,
  *     so an at-least-once foreachBatch retry overwrites its own
  *     partial with identical content and the merged estimate cannot
  *     double-count — exactly-once semantics without transactions;
  *   - per-batch state is bounded by keys·256 longs no matter how many
  *     events the batch carried (the mergeable-summary contract), so
  *     the store grows with batch COUNT, not event volume, and a
  *     periodic compaction is itself just the merge;
  *   - the batch-side reduction is one map-side-combining groupBy —
  *     the corpus never shuffles raw events for the monitor.
  *
  * The q161 gate replays the FINAL merged estimate from the raw events
  * in DuckDB (per-key t53 arithmetic) — valid precisely because
  * max-merge over any batch partition of the events equals the
  * registers of the whole (spec-asserted stream ≡ batch).
  */
object StreamingCardinality {

  /** One micro-batch's partial sketch: per-event-type registers over
    * the stringified user id (stringified so the rolling-hash oracle
    * mode can replay — rule 12). */
  def batchRegisters(events: DataFrame, oracleHash: Boolean): DataFrame =
    Frequency.hllRegisters(
      events.select(col("event_type"),
        col("user_id").cast("string").as("w")),
      "event_type", oracleHash)

  /** Start the monitor over `eventsDir` (one file = one micro-batch),
    * writing partial sketches to `regStore/batch_N`. */
  def start(
      spark: SparkSession, eventsDir: String, regStore: String,
      oracleHash: Boolean = false,
      checkpoint: Option[String] = None): StreamingQuery =
    EventPipeline.withStreamPartitions(spark, 8) {
      val writer = EventPipeline
        .eventsStream(spark, eventsDir, maxFilesPerTrigger = Some(1))
        .writeStream
      checkpoint.foreach(c => writer.option("checkpointLocation", c))
      writer
        .foreachBatch { (batch: DataFrame, batchId: Long) =>
          batchRegisters(batch, oracleHash)
            .write.mode("overwrite").parquet(s"$regStore/batch_$batchId")
          ()
        }
        .start()
    }

  /** Serve the per-key estimates from the partial-sketch store:
    * max-merge all batches' registers, then the keyed t53 estimate
    * against the provided exact frame (event_type, n_exact). */
  def estimateFromStore(
      spark: SparkSession, regStore: String,
      exact: DataFrame): DataFrame = {
    // list concrete batch dirs rather than globbing — a glob over an
    // unexpectedly-empty dir throws an opaque PATH_NOT_FOUND (q84's
    // hard-won convention); an explicit empty check is diagnosable
    val batches = Option(new java.io.File(regStore).listFiles())
      .getOrElse(Array.empty[java.io.File])
      .filter(f => f.isDirectory && f.getName.startsWith("batch_"))
      .map(_.getAbsolutePath).sorted
    require(batches.nonEmpty,
      s"StreamingCardinality: no batch_* partial sketches under $regStore")
    val merged = spark.read.parquet(batches.toIndexedSeq: _*)
      .groupBy(col("event_type"), col("b"))
      .agg(max(col("pmax")).as("pmax"))
    Frequency.hllEstimateByKey(spark, merged, "event_type", exact)
  }
}
