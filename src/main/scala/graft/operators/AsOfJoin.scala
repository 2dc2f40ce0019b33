package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: for every left row, the single most recent right row with
  * the same key and `rightTs <= leftTs` — the canonical time-series
  * enrichment operator Spark lacks natively.
  *
  * Implementation is the scale-correct union-window pattern, NOT a range
  * join: tag both sides, union, and run one `last(value, ignoreNulls)`
  * window per enriched column over (key, ts). Cost is a single shuffle on
  * the key plus a per-partition sort — O(n log n) regardless of how many
  * right rows precede each left row, where a naive `leftTs >= rightTs`
  * theta-join degenerates to a broadcast nested loop (quadratic and
  * broadcast-bound). Rows at exactly equal timestamps resolve
  * right-before-left (inclusive as-of).
  */
object AsOfJoin {

  /** @param valueCols right columns to carry, as (rightName, outputName);
    *                   output names must not collide with left columns. */
  def asOfLeft(
      left: DataFrame, right: DataFrame, key: String,
      leftTs: String, rightTs: String,
      valueCols: Seq[(String, String)]): DataFrame = {
    val l = left
      .withColumn("__asof_ts", col(leftTs))
      .withColumn("__asof_side", lit(0))
    val r = right.select(
      Seq(col(key), col(rightTs).as("__asof_ts"), lit(1).as("__asof_side")) ++
        valueCols.map { case (rc, out) => col(rc).as(out) }: _*)
    val unioned = l.unionByName(r, allowMissingColumns = true)
    // right rows sort before left rows at equal ts → inclusive semantics
    val w = Window.partitionBy(col(key))
      .orderBy(col("__asof_ts").asc, col("__asof_side").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled = valueCols.foldLeft(unioned) { case (df, (_, out)) =>
      df.withColumn(out, last(col(out), ignoreNulls = true).over(w))
    }
    filled.filter(col("__asof_side") === 0)
      .drop("__asof_ts", "__asof_side")
  }

  /** Forward as-of with optional tolerance: for every left row, the
    * EARLIEST right row with `rightTs >= leftTs` (inclusive), its values
    * nulled out when the match lies more than `toleranceSec` whole
    * seconds ahead — the other half of the merge_asof surface
    * (pandas/polars `direction='forward', tolerance=...`). Nulling the
    * nearest match beyond tolerance is equivalent to excluding it: any
    * farther row is farther still.
    *
    * Same union-window scale shape as [[asOfLeft]], mirrored: ONE
    * shuffle on the key, a per-partition sort, `first(value,
    * ignoreNulls)` over the FOLLOWING frame. Left rows sort before
    * right rows at equal ts, so an equal-ts right row is inside the
    * left row's frame (inclusive semantics). The tolerance compares
    * whole-second epochs (CLAUDE.md rule 2: ≥1 s granularity stays
    * exact under any physical ts resolution). */
  /** @param rightTie right column breaking ties between right rows at
    *                  the SAME timestamp (smallest wins) — without it,
    *                  which of two equal-ts right rows supplies the
    *                  values is schedule-dependent. Pass the right
    *                  side's unique id whenever equal timestamps are
    *                  possible. */
  def asOfForward(
      left: DataFrame, right: DataFrame, key: String,
      leftTs: String, rightTs: String,
      valueCols: Seq[(String, String)],
      toleranceSec: Option[Long] = None,
      rightTie: Option[String] = None): DataFrame = {
    val l = left
      .withColumn("__asof_ts", col(leftTs))
      .withColumn("__asof_side", lit(0))
    val r = right.select(
      Seq(col(key), col(rightTs).as("__asof_ts"), lit(1).as("__asof_side"),
        col(rightTs).as("__asof_mts"),
        rightTie.map(col).getOrElse(lit(0L)).as("__asof_tie")) ++
        valueCols.map { case (rc, out) => col(rc).as(out) }: _*)
    val unioned = l.unionByName(r, allowMissingColumns = true)
    // left rows carry a null tie; nulls_first keeps them ahead of the
    // equal-ts right rows they must not shadow (side already separates
    // the sides — the tie only orders equal-ts RIGHT rows)
    val w = Window.partitionBy(col(key))
      .orderBy(col("__asof_ts").asc, col("__asof_side").asc,
        col("__asof_tie").asc_nulls_first)
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    // ONE struct (match ts + every value) filled by a SINGLE
    // first(ignoreNulls): per-column fills would let a NULL value in
    // the nearest right row pull that value from a LATER row while the
    // tolerance check uses the nearest row's timestamp — values beyond
    // tolerance could survive, and different valueCols could come from
    // different rows. The struct is null on left rows (a struct of
    // nulls is NOT null, so the side guard is what makes ignoreNulls
    // skip them); everything the match supplies now comes from exactly
    // one right row, nulls included (merge_asof semantics).
    val valNames = valueCols.map(_._2)
    val packed = when(col("__asof_side") === 1,
      struct(col("__asof_mts").as("__mts") +:
        valNames.map(n => col(n).as(n)): _*))
    val filled = unioned
      .withColumn("__asof_pick", first(packed, ignoreNulls = true).over(w))
    val lefts = valNames.foldLeft(
      filled.filter(col("__asof_side") === 0)
        .withColumn("__asof_mts", col("__asof_pick.__mts"))) {
      case (df, out) => df.withColumn(out, col("__asof_pick").getField(out))
    }
    val bounded = toleranceSec match {
      case Some(t) =>
        val inTol = col("__asof_mts").cast("long") -
          col(leftTs).cast("long") <= t
        valueCols.foldLeft(lefts) { case (df, (_, out)) =>
          df.withColumn(out, when(inTol, col(out)))
        }
      case None => lefts
    }
    bounded.drop("__asof_ts", "__asof_side", "__asof_mts", "__asof_tie",
      "__asof_pick")
  }
}
