package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQueryListener

import graft.streaming.EventPipeline

/** Streaming/state-store scale probe (round-8 verdict #3): the batch
  * operators have ScaleProbe; this drives the STATEFUL streaming
  * surface — the stream-stream join (q83 shape) and the CDC upsert
  * loop (q107 shape) — over a synthetic event stream ~100× the sf0.1
  * gate volume, recording per-batch latency and state-store rows from
  * the StreamingQueryListener, and asserting the stream/batch parity
  * contract (exactly-once: streamed output ≡ one-shot batch result) at
  * that volume.
  *
  * Event-time design: ts advances 10 ms per event (100 events/s), so
  * the 10-minute join lookback holds ~60k events in the state store —
  * state that SCALES with volume density, unlike the gate corpus where
  * the watermark keeps state near-empty. That is the surface CLAUDE.md
  * rule 10 is about: per-batch cost = state-store open/commit ×
  * partitions + state maintenance; the probe runs the join at two
  * partition counts to show where the rule's crossover sits at volume.
  *
  * Usage: runMain graft.tools.StreamScaleProbe [nEvents] [outDir]
  */
object StreamScaleProbe {

  /** Deterministic synthetic events in the gate contract's columns.
    * user count = n/200 keeps per-user click rates near the gate's, so
    * the join output stays ~linear in n rather than quadratic.
    * `usPerEvent` sets event-time density: the join's state holds the
    * 10-minute lookback window, i.e. 6e8/usPerEvent events of state —
    * the knob that sweeps state-store volume independently of n. */
  def events(spark: SparkSession, n: Long, usPerEvent: Long = 10000L): DataFrame = {
    val users = math.max(1000L, n / 200L)
    // INDEPENDENT seeded hash draws per attribute: user_id and
    // event_type from one shared hash are arithmetically correlated
    // (users is a multiple of 4, so h % users determines h % 4 — every
    // user gets exactly one event type and the join matches nothing)
    spark.range(n).toDF("event_id")
      .select(
        col("event_id"),
        // 100 events/sec of event time, strictly increasing with
        // event_id — chunk boundaries are then clean watermark
        // boundaries and append-mode join output equals the batch join
        timestamp_micros(lit(1700000000000000L) + col("event_id") * usPerEvent).as("ts"),
        pmod(xxhash64(col("event_id"), lit(1)), lit(users)).as("user_id"),
        element_at(array(lit("click"), lit("purchase"), lit("view"), lit("error")),
          (pmod(xxhash64(col("event_id"), lit(2)), lit(4)) + 1).cast("int")).as("event_type"),
        (pmod(xxhash64(col("event_id"), lit(3)), lit(10000)).cast("double") / 100.0)
          .as("value"))
  }

  /** Stage `chunks` LSN-ordered parquet files (ascending event_id
    * ranges, ascending mtimes) — the multi-micro-batch arrival shape,
    * same contract as EventPipeline.cdcChunksDir but at probe volume. */
  private def stageChunks(
      spark: SparkSession, ev: DataFrame, n: Long, dir: String, chunks: Int): Unit = {
    val t0 = System.currentTimeMillis()
    val root = java.nio.file.Paths.get(dir)
    java.nio.file.Files.createDirectories(root)
    (0 until chunks).foreach { i =>
      val lo = i * n / chunks
      val hi = (i + 1) * n / chunks
      val tmp = java.nio.file.Files.createTempDirectory(s"graft_sprobe_c$i")
      ev.filter(col("event_id") >= lo && col("event_id") < hi)
        .coalesce(1).write.mode("overwrite").parquet(tmp.toString)
      val part = Option(tmp.toFile.listFiles()).getOrElse(Array.empty)
        .find(_.getName.endsWith(".parquet"))
        .getOrElse(sys.error(s"probe chunk $i produced no parquet part"))
      val dst = root.resolve(f"chunk_$i%02d.parquet")
      java.nio.file.Files.move(part.toPath, dst,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      dst.toFile.setLastModified(t0 + i * 2000L)
    }
  }

  /** Collects (batchId, inputRows, triggerExecution ms, state rows)
    * per micro-batch — the latency-vs-state table the round-8 verdict
    * asked for. */
  private final class ProgressCollector extends StreamingQueryListener {
    val batches = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long, Long)]
    override def onQueryStarted(e: StreamingQueryListener.QueryStartedEvent): Unit = ()
    override def onQueryTerminated(e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()
    override def onQueryProgress(e: StreamingQueryListener.QueryProgressEvent): Unit =
      synchronized {
        val p = e.progress
        if (p.numInputRows > 0) {
          val state = Option(p.stateOperators).map(_.map(_.numRowsTotal).sum).getOrElse(0L)
          val ms = Option(p.durationMs.get("triggerExecution")).map(_.longValue).getOrElse(-1L)
          batches += ((p.batchId, p.numInputRows, ms, state))
        }
      }
    def report(label: String): Unit = synchronized {
      batches.foreach { case (b, in, ms, st) =>
        println(f"[sprobe] $label%-22s batch=$b%2d rows=$in%9d state_rows=$st%8d trigger=$ms%6d ms")
      }
      batches.clear()
    }
  }

  private def time[A](label: String)(body: => A): A = {
    val t0 = System.nanoTime()
    val r = body
    println(f"[sprobe] $label%-40s ${(System.nanoTime() - t0) / 1e9}%8.1f s")
    r
  }

  /** xxhash64-sum checksum over the join's output pairs — an
    * order-independent witness strong enough to call two 100×-volume
    * result sets identical without collecting either. */
  private def pairChecksum(df: DataFrame): (Long, java.math.BigDecimal) = {
    val r = df.agg(count(lit(1)),
      sum(xxhash64(col("p_id"), col("c_id")).cast("decimal(38,0)"))).head()
    (r.getLong(0), r.getDecimal(1))
  }

  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(10000000L) // 100× sf0.1
    val out = args.lift(1).getOrElse("/tmp/graft_stream_probe")
    val usPerEvent = args.lift(2).map(_.toLong).getOrElse(10000L)
    val chunks = 10
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    println(s"[sprobe] n_events=$n chunks=$chunks (~${n / chunks} events/micro-batch) " +
      s"us_per_event=$usPerEvent (~${600000000L / usPerEvent} events in the 10-min state window)")

    val chunksDir = s"$out/chunks"
    time("event gen + chunk staging") {
      stageChunks(spark, events(spark, n, usPerEvent), n, chunksDir, chunks)
    }
    val collector = new ProgressCollector
    spark.streams.addListener(collector)

    // ---- stream-stream join (q83 shape) at two partition counts ----
    // rule 10 says state partitions track state volume, not the batch
    // default; with ~60k state rows the crossover is measurable
    def runJoin(parts: Int): (Long, java.math.BigDecimal, Double) = {
      val sinkDir = s"$out/join_p$parts"
      val t0 = System.nanoTime()
      val q = EventPipeline.withStreamPartitions(spark, parts) {
        EventPipeline
          .purchaseClickJoin(EventPipeline.eventsStream(spark, chunksDir,
            maxFilesPerTrigger = Some(1)))
          .writeStream
          .foreachBatch { (batch: DataFrame, batchId: Long) =>
            batch.write.mode("overwrite").parquet(s"$sinkDir/batch_$batchId"); ()
          }
          .start()
      }
      try q.processAllAvailable() finally q.stop()
      val wall = (System.nanoTime() - t0) / 1e9
      collector.report(s"join p=$parts")
      val (c, h) = pairChecksum(spark.read.parquet(s"$sinkDir/batch_*"))
      (c, h, wall)
    }
    val (c8, h8, w8) = time("q83 stream-stream join, 8 partitions")(runJoin(8))
    val (c64, h64, w64) = time("q83 stream-stream join, 64 partitions")(runJoin(64))
    println(f"[sprobe] join wall: p8=$w8%.1f s  p64=$w64%.1f s  (ratio ${w8 / w64}%.2f)")
    val (cb, hb) = pairChecksum(
      EventPipeline.purchaseClickJoin(spark.read.parquet(s"$chunksDir/chunk_*")))
    println(s"[sprobe] join pairs: stream_p8=$c8 stream_p64=$c64 batch=$cb")
    require(cb > 0, "probe produced no join pairs — event-mix generation broke")
    require(c8 == cb && h8 == hb,
      s"stream/batch parity broke at volume (p8): stream=$c8/$h8 batch=$cb/$hb")
    require(c64 == cb && h64 == hb,
      s"stream/batch parity broke at volume (p64): stream=$c64/$h64 batch=$cb/$hb")
    println(s"[sprobe] exactly-once: stream ≡ batch interval join at $n events — OK")

    // ---- CDC upsert loop (q107 shape) ----
    val snapRoot = s"$out/snaps"
    val base = spark.range(0).select(col("id"), lit(0.0).as("val"))
    time("q107 cdc upsert, 10 micro-batches") {
      val q = EventPipeline.startCdcUpsertQuery(spark, chunksDir, snapRoot, base)
      try q.processAllAvailable() finally q.stop()
    }
    collector.report("cdc")
    val snaps = Option(new java.io.File(snapRoot).listFiles()).getOrElse(Array.empty)
      .filter(_.getName.startsWith("snap_")).map(_.getName).sorted
    val finalSnap = spark.read.parquet(s"$snapRoot/${snaps.last}")
    // one-shot batch merge over the whole log — the q107 oracle shape
    val all = spark.read.parquet(s"$chunksDir/chunk_*")
    val batchMerged = graft.operators.Snapshot.cdcMerge(
      base,
      all.select(col("user_id").as("id"),
        when(col("event_type") === "error", "D").otherwise("U").as("op"),
        col("value").as("val"), col("event_id")),
      key = "id", op = "op", seq = "event_id").select(col("id"), col("val"))
    val diff = finalSnap.exceptAll(batchMerged)
      .unionByName(batchMerged.exceptAll(finalSnap)).count()
    val (ns, nb) = (finalSnap.count(), batchMerged.count())
    println(s"[sprobe] cdc snapshot rows: stream=$ns batch=$nb diff=$diff")
    require(diff == 0 && ns == nb,
      s"cdc stream/batch parity broke at volume: $ns vs $nb, diff=$diff")
    println(s"[sprobe] exactly-once: cumulative CDC upsert ≡ one-shot merge at $n events — OK")

    spark.streams.removeListener(collector)
    spark.stop()
  }
}
