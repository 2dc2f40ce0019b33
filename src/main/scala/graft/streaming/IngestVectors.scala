package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types.{ArrayType, FloatType, IntegerType, LongType, StructType}

/** Streaming vector ingest into a persisted IVF index — the ONLINE
  * half of the s51/s66 store pattern, and the standard shape of a
  * production vector-search write path (arrivals absorbed between
  * periodic quantizer retrains): each micro-batch of embeddings is
  * cell-assigned by the store's FROZEN quantizer and lands in a
  * batchId-keyed postings subdir inside foreachBatch.
  *
  * Why this shape survives failure and scale:
  *   - cell assignment is a pure function of the embedding (fixed
  *     hyperplanes), so batches commute — postings are a set and the
  *     arrival order cannot change any search result;
  *   - each batch OVERWRITES its own subdir, so an at-least-once
  *     foreachBatch retry rewrites identical content instead of
  *     duplicating postings — exactly-once state without transactions
  *     (the StreamingCardinality contract applied to an index);
  *   - the write path never touches the centroid artifact and never
  *     compacts synchronously — per batch it is one narrow projection
  *     plus one partition-local parquet write, so ingest latency is
  *     independent of index size (no fold-back, the q153 property).
  *
  * The s67 gate proves stream ≡ batch by construction: after the loop
  * drains, `searchIvfIndex` over the streamed store must hash-match
  * the frozen-quantizer recompute oracle (s66's), which never saw a
  * stream at all.
  */
object IngestVectors {

  /** The embeddings-table schema the file stream reads (a file stream
    * needs an explicit schema; matches Tables.load's parquet layout). */
  val vectorSchema: StructType = new StructType()
    .add("vec_id", LongType)
    .add("embedding", ArrayType(FloatType))
    .add("label", IntegerType)

  /** Start the ingest loop: every arriving parquet file of vectors is
    * one micro-batch appended (idempotently) to `indexDir`'s postings. */
  def start(spark: SparkSession, inDir: String, indexDir: String,
      checkpointDir: String): StreamingQuery =
    spark.readStream
      .schema(vectorSchema)
      .option("maxFilesPerTrigger", 1)
      .parquet(inDir)
      .writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, bid: Long) =>
        graft.operators.Similarity.appendIvfIndex(
          batch, indexDir, subdir = Some(s"batch_$bid"))
        ()
      }
      .start()
}
