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

  /** Atomic versioned publish (q224) — the manifest-commit primitive
    * every multi-directory swap in this repo points at ("a real
    * deployment commits via a manifest"): data lands in a fresh
    * `root/v_N` directory, fully written BEFORE one atomic rename
    * flips `root/MANIFEST` (a one-line version pointer) — so a reader
    * resolves the manifest and opens a version that is either
    * entirely old or entirely new, never a mix and never mid-write,
    * with NO window (contrast the IVF store's documented four-rename
    * caveat, which this primitive removes for any store that adopts
    * it). Crash anywhere before the flip leaves the old version
    * served and the half-written `v_N` as debris the next publish
    * overwrites (version numbers only advance on a successful flip).
    * This is the exact commit shape table formats (Iceberg/Delta)
    * automate; here it is the plain-filesystem core, POSIX-atomic via
    * `Files.move(..., ATOMIC_MOVE)`.
    *
    * Scale shape: the data write is whatever the caller's frame costs;
    * the commit itself is O(1) driver-side metadata. Old versions stay
    * until [[pruneVersions]] — which is what makes readers of version
    * N-1 safe while N publishes (snapshot isolation by retention). */
  def publishVersion(df: DataFrame, root: String): Long =
    commitVersion(root)(dir => df.write.mode("overwrite").parquet(dir))

  /** The multi-artifact form of [[publishVersion]]: the caller writes
    * ANY layout (several datasets, subdirectories) under the fresh
    * version directory, and the commit is the same single atomic
    * manifest rename — so a store whose state spans multiple artifacts
    * (the IVF index's postings + centroids) flips them together with
    * no mixed-read window, which four sequential directory renames can
    * never guarantee. Debris from a crashed previous attempt at the
    * same version number is cleared BEFORE the write callback (version
    * numbers only advance on a successful flip, so a retry lands on
    * the same v_N). Returns the committed version. */
  def commitVersion(root: String)(write: String => Unit): Long = {
    import java.nio.file.{Files, Paths, StandardCopyOption}
    Files.createDirectories(Paths.get(root))
    val next = currentVersion(root).getOrElse(0L) + 1
    rmTree(new java.io.File(s"$root/v_$next"))
    write(s"$root/v_$next")
    val tmp = Paths.get(root, s".manifest_$next.tmp")
    Files.write(tmp, next.toString.getBytes("UTF-8"))
    Files.move(tmp, Paths.get(root, "MANIFEST"),
      StandardCopyOption.REPLACE_EXISTING, StandardCopyOption.ATOMIC_MOVE)
    next
  }

  /** Optimistic-concurrency variant of [[commitVersion]] (r14) — the
    * multi-WRITER contract the plain verb documents away: two
    * concurrent `commitVersion` calls both derive `next = base + 1`
    * and both write `v_next` CONCURRENTLY, corrupting the directory
    * before either flips. This variant takes an atomic CLAIM on the
    * version number BEFORE any data is written —
    * `Files.createFile` is O_CREAT|O_EXCL, the same create-if-absent
    * commit shape Delta's log protocol uses — so exactly one writer
    * can ever produce a given `v_N`; the loser returns None (no
    * partial state anywhere) and must re-read the manifest, re-derive
    * its write, and retry. `expectedBase` is the optimistic-read
    * guard: if the store advanced since the caller planned its write,
    * the commit refuses before claiming (a publish derived from stale
    * state must not land even if its version number happens to be
    * free).
    *
    * Liveness: a writer that dies between claim and flip leaves its
    * claim blocking that version number. Breaking it is an explicit
    * OPERATOR verb ([[breakStaleClaim]]), not something racers do
    * implicitly on a timeout — the filesystem has no lease clock, and
    * a "stale" writer might be a live slow one (an object-store
    * deployment replaces the claim file with a conditional put and
    * this decision disappears). Spent claims (≤ the committed
    * version) are garbage-collected by [[pruneVersions]]. */
  def commitVersionExclusive(root: String, expectedBase: Option[Long])
      (write: String => Unit): Option[Long] = {
    import java.nio.file.{Files, Paths, StandardCopyOption}
    Files.createDirectories(Paths.get(root))
    val base = currentVersion(root).getOrElse(0L)
    if (expectedBase.exists(_ != base)) return None // stale plan
    val next = base + 1
    try Files.createFile(Paths.get(root, s".claim_$next"))
    catch {
      case _: java.nio.file.FileAlreadyExistsException => return None
    }
    // sole claim holder from here: debris can only be a broken claim
    // this same verb released via breakStaleClaim
    rmTree(new java.io.File(s"$root/v_$next"))
    write(s"$root/v_$next")
    val tmp = Paths.get(root, s".manifest_$next.tmp")
    Files.write(tmp, next.toString.getBytes("UTF-8"))
    Files.move(tmp, Paths.get(root, "MANIFEST"),
      StandardCopyOption.REPLACE_EXISTING, StandardCopyOption.ATOMIC_MOVE)
    Some(next)
  }

  /** Release the claim of a DEAD writer (crashed between claim and
    * manifest flip) so the version number becomes claimable again;
    * also clears its half-written data. Refuses when the version is
    * already committed (the claim is spent, not stale) — returns
    * whether a claim was actually broken. Operator-invoked by
    * design: see [[commitVersionExclusive]]'s liveness note. */
  def breakStaleClaim(root: String, version: Long): Boolean = {
    val cur = currentVersion(root).getOrElse(0L)
    if (version <= cur) return false
    val claim = new java.io.File(root, s".claim_$version")
    if (!claim.exists()) return false
    rmTree(new java.io.File(s"$root/v_$version"))
    claim.delete()
  }

  /** Recursive delete (local-FS maintenance helper, shared by the
    * versioned-store verbs). */
  private[graft] def rmTree(f: java.io.File): Unit = {
    Option(f.listFiles()).foreach(_.foreach(rmTree)); f.delete(); ()
  }

  /** The committed version, or None for an unpublished root. */
  def currentVersion(root: String): Option[Long] = {
    val m = new java.io.File(root, "MANIFEST")
    if (!m.exists()) None
    else Some(new String(
      java.nio.file.Files.readAllBytes(m.toPath), "UTF-8").trim.toLong)
  }

  /** Read the committed version's data — resolves the manifest FIRST,
    * then opens only that version's directory. */
  def readPublished(spark: SparkSession, root: String): DataFrame = {
    val v = currentVersion(root).getOrElse(
      sys.error(s"readPublished: no MANIFEST under $root"))
    spark.read.parquet(s"$root/v_$v")
  }

  /** Drop versions older than the committed one minus `keep` — the
    * retention knob that bounds storage while leaving in-flight
    * readers of recent versions safe. Never touches the committed
    * version or anything newer (a half-written v_{N+1} belongs to the
    * publisher). */
  def pruneVersions(root: String, keep: Int = 1): Unit = {
    val cur = currentVersion(root).getOrElse(return)
    val re = """v_(\d+)""".r
    val claimRe = """\.claim_(\d+)""".r
    Option(new java.io.File(root).listFiles()).getOrElse(Array.empty)
      .foreach { f =>
        f.getName match {
          case re(n) if n.toLong < cur - keep => rmTree(f)
          // spent claims (≤ committed) are garbage; a claim for
          // cur + 1 may belong to an in-flight writer — never touched
          case claimRe(n) if n.toLong <= cur => f.delete(); ()
          case _ => ()
        }
      }
  }

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
