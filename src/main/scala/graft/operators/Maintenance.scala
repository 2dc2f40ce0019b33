package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Table-maintenance operations a long-lived parquet corpus needs.
  *
  * Small-file compaction: streaming sinks, incremental CDC merges and
  * per-batch appends leave thousands of KB-sized files per partition;
  * at 100 TB the resulting task-per-file scheduling and open/seek
  * overhead dominates scan time (the canonical "small files problem").
  * Compaction rewrites a directory into ⌈bytes/target⌉ files.
  *
  * Shape: `coalesce`, not `repartition` — compaction must not pay a
  * full shuffle of the data it rewrites; coalesce only merges read
  * splits. The rewrite lands in a NEW directory (never in place: Spark
  * cannot overwrite an input path mid-read, and a failed in-place
  * rewrite would destroy the table) — the caller swaps paths/catalog
  * pointers after success, which is exactly the transactional-commit
  * contract table formats automate. */
object Maintenance {

  /** Rewrite the parquet directory `src` into `dst` with file count
    * ⌈total bytes / targetFileBytes⌉ (min 1). Returns the output file
    * count. Data is byte-for-byte the same rows; only layout changes. */
  def compactParquet(spark: SparkSession, src: String, dst: String,
      targetFileBytes: Long = 128L * 1024 * 1024): Long = {
    require(targetFileBytes > 0, "targetFileBytes must be positive")
    val bytes = parquetBytes(new java.io.File(src))
    val n = math.max(1L, (bytes + targetFileBytes - 1) / targetFileBytes)
    spark.read.parquet(src)
      .coalesce(n.toInt)
      .write.mode("overwrite").parquet(dst)
    n
  }

  /** Total bytes of parquet data files under `dir` (recursive; skips
    * _SUCCESS/_metadata sidecars). Local-FS implementation — on a real
    * cluster this is one FileSystem.listStatus pass. */
  def parquetBytes(dir: java.io.File): Long = {
    val children = Option(dir.listFiles()).getOrElse(Array.empty)
    children.map { f =>
      if (f.isDirectory) parquetBytes(f)
      else if (f.getName.endsWith(".parquet")) f.length()
      else 0L
    }.sum
  }

  /** Parquet data-file count under `dir` (recursive). */
  def parquetFileCount(dir: java.io.File): Long = {
    val children = Option(dir.listFiles()).getOrElse(Array.empty)
    children.map { f =>
      if (f.isDirectory) parquetFileCount(f)
      else if (f.getName.endsWith(".parquet")) 1L else 0L
    }.sum
  }

  /** Incremental maintenance of a count/sum materialized view — the
    * classic IVM algebra (Gupta & Mumick's delta rules): count and sum
    * are self-maintainable under inserts AND retractions, so a view over
    * a petabyte base updates from a signed delta AGGREGATE without
    * touching base rows. `view` and `delta` share a schema of
    * `keys ++ numeric columns` where the FIRST numeric column is the
    * row count; delta rows carry +1/−cnt (and signed sums) for
    * inserts/retractions. Groups whose merged count reaches zero are
    * dropped — they no longer exist in the maintained view, exactly as
    * a recompute would show (the gate's oracle IS the recompute).
    *
    * Shape: one unionByName + one groupBy at view-key grain — the
    * shuffle is bounded by |view| + |delta| AGGREGATE rows (distinct
    * keys), never the base table. */
  def mergeAggDelta(
      view: DataFrame, delta: DataFrame, keys: Seq[String]): DataFrame = {
    import org.apache.spark.sql.functions._
    require(keys.nonEmpty, "mergeAggDelta needs at least one view key")
    val valueCols = view.columns.filterNot(keys.contains)
    require(valueCols.nonEmpty, "view needs a count column")
    val merged = view.unionByName(delta)
      .groupBy(keys.map(col): _*)
      .agg(sum(col(valueCols.head)).as(valueCols.head),
        valueCols.tail.map(c => sum(col(c)).as(c)): _*)
    merged.filter(col(valueCols.head) > 0)
  }
}
