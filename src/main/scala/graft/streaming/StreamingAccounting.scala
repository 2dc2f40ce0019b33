package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.StreamingQuery

import graft.operators.Sampling

/** Streaming Horvitz–Thompson token accounting (q223) — q221's
  * threshold-sampling bookkeeping run as an online monitor: each
  * arriving document micro-batch reduces to its per-source partial
  * tallies (`Sampling.htTallies` — a handful of exact int64 sums per
  * source) and lands in a batchId-keyed partial store; the running
  * per-source estimate is served by SUMMING the partials and attaching
  * the error column (`Sampling.htFinish`).
  *
  * Why this shape survives both failure and scale (the q161 argument,
  * with the sketch replaced by exact integers):
  *   - the partials are plain integer sums, so merging is associative
  *     and commutative, and partials over ANY batch partition of the
  *     corpus sum to the corpus answer — stream ≡ batch EXACTLY, which
  *     is why the q223 gate reuses q221's batch oracle verbatim (the
  *     q153 proof shape);
  *   - every write is batchId-keyed overwrite, so an at-least-once
  *     foreachBatch retry rewrites identical content into its own key
  *     and the merged report cannot double-count — exactly-once
  *     semantics without transactions (spec-asserted by replaying a
  *     batch);
  *   - per-batch state is one row per source no matter how many
  *     documents the batch carried, so the store grows with batch
  *     COUNT, not corpus volume, and the batch-side reduction is one
  *     map-side-combining groupBy — the corpus text is read once, at
  *     the door.
  */
object StreamingAccounting {

  /** Start the accountant over `docsDir` (one file = one micro-batch),
    * writing per-source partial tallies to `store/batch_N`. */
  def start(
      spark: SparkSession, docsDir: String, store: String,
      oracleHash: Boolean = false,
      checkpoint: Option[String] = None): StreamingQuery =
    EventPipeline.withStreamPartitions(spark, 8) {
      val writer = spark.readStream
        .schema(IngestDedup.docsSchema(spark, docsDir))
        .option("maxFilesPerTrigger", 1)
        .parquet(docsDir)
        .writeStream
      checkpoint.foreach(c => writer.option("checkpointLocation", c))
      writer
        .foreachBatch { (batch: DataFrame, batchId: Long) =>
          Sampling.htTallies(batch, oracleHash = oracleHash)
            .write.mode("overwrite").parquet(s"$store/batch_$batchId")
          ()
        }
        .start()
    }

  /** Serve the running per-source report from the partial store. */
  def reportFromStore(spark: SparkSession, store: String): DataFrame = {
    // list concrete batch dirs rather than globbing — a glob over an
    // unexpectedly-empty dir throws an opaque PATH_NOT_FOUND (q84's
    // hard-won convention); an explicit empty check is diagnosable
    val batches = Option(new java.io.File(store).listFiles())
      .getOrElse(Array.empty[java.io.File])
      .filter(f => f.isDirectory && f.getName.startsWith("batch_"))
      .map(_.getAbsolutePath).sorted
    require(batches.nonEmpty,
      s"StreamingAccounting: no batch_* partial tallies under $store")
    Sampling.htFinish(spark.read.parquet(batches.toIndexedSeq: _*))
  }
}
