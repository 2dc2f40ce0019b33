package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: media payloads ride as opaque `binary`
  * columns next to typed metadata, and per-item decode/feature-extraction
  * runs partition-wise over an iterator (the Scala analog of
  * `mapInPandas`: one JVM-side pass per partition, batch-shaped, no
  * driver collection).
  *
  * The actual codec step is STUBBED — image/audio libraries are not in
  * this container — with a deterministic fake decoder; everything around
  * it (schema, partitioning, batch iteration, output shape) is the real
  * pipeline a decoder would drop into.
  */
object Multimodal {

  /** A media row: payload + sidecar metadata. */
  final case class MediaItem(
      media_id: Long, kind: String, payload: Array[Byte], source: String)

  /** Extracted features per media item (what a real decoder would emit). */
  final case class MediaFeatures(
      media_id: Long, kind: String, n_bytes: Int,
      width: Int, height: Int, n_frames: Int, feat: Array[Float])

  /** Deterministic payload hash the stub decoder derives everything
    * from (base-31 byte fold, 64-bit wrap — replayable in HUGEINT). */
  def payloadHash(bytes: Array[Byte]): Long = {
    var h = 0L
    var i = 0
    while (i < bytes.length) { h = h * 31 + (bytes(i) & 0xff); i += 1 }
    h
  }

  /** Stub frame count for a video payload hash — the ONE definition both
    * extractFeatures and sampleFrames (and the m45/m46 oracles) encode. */
  def videoFrames(h: Long): Int = 1 + math.floorMod(h >> 32, 30).toInt

  /** STUB decoder: deterministic pseudo-features derived from payload
    * bytes. A real implementation replaces only this function (e.g. JNI
    * image decode → resize → embed); the signature is the contract. */
  def stubDecode(item: MediaItem): MediaFeatures = {
    val bytes = item.payload
    val n = bytes.length
    val h = payloadHash(bytes)
    val width = 64 + math.floorMod(h, 512).toInt
    val height = 64 + math.floorMod(h >> 16, 512).toInt
    val frames = if (item.kind == "video") videoFrames(h) else 1
    val feat = Array.tabulate(8)(j =>
      math.floorMod(h >> j, 1000).toFloat / 1000f)
    MediaFeatures(item.media_id, item.kind, n, width, height, frames, feat)
  }

  /** Build a media table from the documents corpus: the text bytes stand
    * in for an image/audio payload (binary column), kind cycles through
    * modalities. Partitioned by media_id — the layout a 100 TB media lake
    * would use (payloads near their metadata, no wide shuffle). */
  def mediaTable(docs: DataFrame): DataFrame =
    // repartition: a decode stage is CPU-bound per item; a single-split
    // input would otherwise pin the whole decode on one core
    docs.repartition(col("doc_id")).select(
      col("doc_id").as("media_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (col("doc_id") % 3 + 1).cast("int")).as("kind"),
      col("text").cast("binary").as("payload"),
      col("source"))

  /** Ingest a directory of real media files as a media table via Spark's
    * binaryFile source: one row per file with the payload as a binary
    * column (plus path/length metadata), kind derived from the file
    * extension. This is the on-ramp from an object-store media lake into
    * the same decode pipeline the synthetic table feeds — at 100 TB the
    * source parallelizes by file and never materializes payloads on the
    * driver. `media_id` is the path's 64-bit hash: stable across runs,
    * no window/zipWithIndex over the whole lake. */
  def fromBinaryFiles(spark: SparkSession, dir: String): DataFrame =
    spark.read.format("binaryFile").load(dir)
      .select(
        xxhash64(col("path")).as("media_id"),
        when(col("path").rlike("(?i)\\.(png|jpe?g|gif|bmp)$"), "image")
          .when(col("path").rlike("(?i)\\.(wav|mp3|flac|ogg)$"), "audio")
          .when(col("path").rlike("(?i)\\.(mp4|mkv|webm|avi)$"), "video")
          .otherwise("binary").as("kind"),
        col("content").as("payload"),
        col("path").as("source"))

  /** Partition-wise feature extraction (mapPartitions — the batch shape:
    * one decoder instance per partition, streamed iterator, no collect). */
  def extractFeatures(spark: SparkSession, media: DataFrame): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.as[MediaItem].mapPartitions { it =>
      // a real decoder would init its native context once here
      it.map(stubDecode)
    }
  }

  /** One sampled frame of a video payload. */
  final case class FrameSample(media_id: Long, frame_idx: Long, frame_fp: Long)

  /** Frame sampling: every `everyK`-th frame of each video payload as its
    * own row — the row-AMPLIFYING decode shape (one video → many frames),
    * which is why the media table repartitions before this stage: the
    * amplification happens inside each partition, never through a
    * shuffle. Non-video rows emit nothing. The per-frame fingerprint is
    * derived deterministically from (payload hash, frame index) by the
    * stub; a real decoder would emit the frame tensor or its embedding
    * with the identical iterator shape. */
  def sampleFrames(
      spark: SparkSession, media: DataFrame, everyK: Int = 4): Dataset[FrameSample] = {
    import spark.implicits._
    require(everyK >= 1, s"everyK must be >= 1, got $everyK")
    media.as[MediaItem].mapPartitions { it =>
      it.flatMap { item =>
        if (item.kind != "video") Iterator.empty
        else {
          val h = payloadHash(item.payload)
          val nFrames = videoFrames(h)
          Iterator.range(0, nFrames, everyK).map { idx =>
            FrameSample(item.media_id, idx.toLong, h * 1000003L + idx)
          }
        }
      }
    }
  }
}
