package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.operators.Materialize.Ops

/** Distributed ordered prefix sums — the shared decomposition behind
  * every "cumulative count over a sorted support" operator (KS CDFs,
  * Mann–Whitney rank offsets, quantile-normalization CDFs, systematic
  * sampling strides).
  *
  * A global `Window.orderBy(x)` moves the WHOLE frame to one partition
  * (the r9 t63 defect class — Spark logs `WindowExec: No Partition
  * Defined`). The support frames these operators feed are usually
  * domain-bounded, but "usually" is a caller promise: a high-cardinality
  * long feature (raw timestamps, hashes) silently turns the window into
  * a single-partition corpus sort. This helper makes the shape
  * unconditionally scale-safe (VERDICT r10 directive #2) using the
  * two-pass decomposition proved bit-exact at 525k rows by
  * `Sampling.systematicSample`'s probe (ARCHITECTURE.md, r10):
  *
  *   1. every row gets an ORDER-PRESERVING range bucket — DECIMAL
  *      arithmetic end-to-end, so an extreme value domain can never hit
  *      the ANSI Long-overflow throw (rule 21a); only MONOTONICITY of
  *      the bucket map is used, so decimal rounding inside the division
  *      is harmless (it can only shift a bucket boundary);
  *   2. per-bucket totals → per-bucket offsets via a TRIANGULAR
  *      broadcast self-join over the ≤`buckets`-row totals frame — no
  *      window at all, not even a bounded unpartitioned one, so the
  *      `WindowExec` warning class is structurally gone;
  *   3. a per-bucket window ordered by x adds the local running sum to
  *      the broadcast offset.
  *
  * Exactness: integer addition is associative, so bucket-local sums plus
  * exact offsets equal the global ordered sum bit-for-bit — the oracle
  * SQL (a plain global window in DuckDB) stays valid unchanged.
  */
object Prefix {

  /** Append running sums in ascending `xCol` order — per `groupCols`
    * group when given (each group gets its own independent cumsum; the
    * range buckets are shared, which only affects load balance, never
    * values).
    *
    * For each `(srcCol, outCol)` in `sums`, `outCol` becomes the sum of
    * `srcCol` over all rows in the same group with smaller `xCol` —
    * plus the current row when `inclusive`. `xCol` must be integral,
    * non-null, and UNIQUE per row within its group (callers pass
    * histogram supports or injective order hashes); summed columns must
    * be non-null integers (LongType); `groupCols` values must be
    * NON-NULL (the offsets equi-join is null-rejecting — a NULL group
    * would silently drop its rows, where groupBy would keep them). The
    * input is materialized once (rule 5): three plan branches read it
    * (the min/max normalizer, the bucket totals, and the final pass). */
  def cumsum(
      df: DataFrame, xCol: String, sums: Seq[(String, String)],
      inclusive: Boolean, buckets: Int = 256,
      groupCols: Seq[String] = Nil): DataFrame = {
    require(sums.nonEmpty, "at least one column to accumulate")
    import org.apache.spark.sql.expressions.Window
    def D(c: Column) = c.cast("decimal(38,0)")
    val in = df.materializeOnce()
    val mnmx = in.agg(min(col(xCol)).as("p_mn"), max(col(xCol)).as("p_mx"))
    // width = span DIV buckets + 1 ≥ 1 (never a zero divisor); bkt is a
    // monotone nondecreasing map of x into ~[0, buckets]
    val bucketed = in.crossJoin(broadcast(mnmx))
      .withColumn("p_bkt",
        floor((D(col(xCol)) - D(col("p_mn"))) /
          (floor((D(col("p_mx")) - D(col("p_mn"))) / lit(buckets)) + lit(1)))
          .cast("int"))
      .drop("p_mn", "p_mx")
    val gb = groupCols :+ "p_bkt"
    val bw = bucketed.groupBy(gb.map(col): _*)
      .agg(sum(col(sums.head._1)).as(s"p_bw_0"),
        sums.tail.zipWithIndex.map { case ((s, _), i) =>
          sum(col(s)).as(s"p_bw_${i + 1}")
        }: _*)
      .materializeOnce() // both sides of the triangular join
    val lower = bw.select(
      (groupCols.map(g => col(g).as(s"p_lg_$g")) :+ col("p_bkt").as("p_lb")) ++
        sums.indices.map(i => col(s"p_bw_$i").as(s"p_lw_$i")): _*)
    // offsets(g, b) = Σ_{b' < b} totals(g, b'): equi-keyed on the group,
    // triangular on the ≤`buckets` bucket ids — |G|·buckets² pairs max,
    // still totals-frame-sized work, never row-sized
    val lowerCond = groupCols
      .map(g => col(g) === col(s"p_lg_$g"))
      .foldLeft(col("p_lb") < col("p_bkt"))(_ && _)
    val offsets = bw
      .join(broadcast(lower), lowerCond, "left")
      .groupBy(gb.map(col): _*)
      .agg(coalesce(sum(col("p_lw_0")), lit(0L)).as("p_off_0"),
        sums.indices.tail.map(i =>
          coalesce(sum(col(s"p_lw_$i")), lit(0L)).as(s"p_off_$i")): _*)
      .select((gb.map(col) ++ sums.indices.map(i => col(s"p_off_$i"))): _*)
    val wB = Window.partitionBy(gb.map(col): _*).orderBy(col(xCol))
      .rowsBetween(Window.unboundedPreceding,
        if (inclusive) Window.currentRow else -1)
    val joined = bucketed.join(broadcast(offsets), gb)
    val withCum = sums.zipWithIndex.foldLeft(joined) {
      case (acc, ((s, out), i)) =>
        acc.withColumn(out,
          col(s"p_off_$i") + coalesce(sum(col(s)).over(wB), lit(0L)))
    }
    withCum.drop("p_bkt" +: sums.indices.map(i => s"p_off_$i"): _*)
  }

  /** Running MAX in ascending `xCol` order — the prefix-max sibling of
    * [[cumsum]], same three-step decomposition (max is associative and
    * commutative like integer addition, so bucket-local maxima plus
    * the max of all lower buckets' maxima ≡ the global ordered running
    * max exactly). INCLUSIVE of the current row — the watermark shape
    * (q220's "largest event time seen so far, including me") that rule
    * 23 forbids writing as a bare global window. `xCol` integral,
    * non-null, unique per group; `maxCol` non-null LongType; the empty
    * lower-bucket prefix uses Long.MinValue as the max identity. */
  def cummax(
      df: DataFrame, xCol: String, maxCol: String, outCol: String,
      buckets: Int = 256, groupCols: Seq[String] = Nil): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    def D(c: Column) = c.cast("decimal(38,0)")
    val in = df.materializeOnce()
    val mnmx = in.agg(min(col(xCol)).as("p_mn"), max(col(xCol)).as("p_mx"))
    val bucketed = in.crossJoin(broadcast(mnmx))
      .withColumn("p_bkt",
        floor((D(col(xCol)) - D(col("p_mn"))) /
          (floor((D(col("p_mx")) - D(col("p_mn"))) / lit(buckets)) + lit(1)))
          .cast("int"))
      .drop("p_mn", "p_mx")
    val gb = groupCols :+ "p_bkt"
    val bw = bucketed.groupBy(gb.map(col): _*)
      .agg(max(col(maxCol)).as("p_bm"))
      .materializeOnce() // both sides of the triangular join
    val lower = bw.select(
      (groupCols.map(g => col(g).as(s"p_lg_$g")) :+ col("p_bkt").as("p_lb"))
        :+ col("p_bm").as("p_lm"): _*)
    val lowerCond = groupCols
      .map(g => col(g) === col(s"p_lg_$g"))
      .foldLeft(col("p_lb") < col("p_bkt"))(_ && _)
    val offsets = bw
      .join(broadcast(lower), lowerCond, "left")
      .groupBy(gb.map(col): _*)
      .agg(coalesce(max(col("p_lm")), lit(Long.MinValue)).as("p_offm"))
      .select(gb.map(col) :+ col("p_offm"): _*)
    val wB = Window.partitionBy(gb.map(col): _*).orderBy(col(xCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    bucketed.join(broadcast(offsets), gb)
      .withColumn(outCol,
        greatest(col("p_offm"), max(col(maxCol)).over(wB)))
      .drop("p_bkt", "p_offm")
  }
}
