package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Skyline (Pareto-dominance) queries — the multi-criteria "best
  * tradeoffs" operator (Börzsönyi/Kossmann/Stocker, ICDE 2001; Spark
  * SQL integration per the EDBT 2023 skyline-in-Spark line of work):
  * return every row not DOMINATED by another, where a dominates b iff
  * a is ≤ b on every minimized criterion and strictly < on at least
  * one (maximized criteria are negated into minimized form by the
  * caller-facing API).
  *
  * Scale shape — the distributive property does all the work: the
  * global skyline is a subset of the union of per-partition skylines,
  * so phase 1 prunes each partition independently (block-nested-loop
  * inside mapPartitions, no shuffle), and phase 2 runs the same prune
  * over the survivors pulled to one partition. For d criteria over n
  * random-order rows the expected skyline is O((ln n)^(d−1)) — the
  * phase-2 input is tiny even when n is 100 TB, and phase 1 is
  * embarrassingly parallel. No driver-side loops; both phases are the
  * same per-partition pass.
  */
object Skyline {

  /** BNL skyline of one in-memory block: keep a window of
    * non-dominated points; each candidate is dropped if dominated,
    * inserted otherwise, evicting window points it dominates. */
  private def bnl(it: Iterator[(Long, Array[Double])]): Iterator[(Long, Array[Double])] = {
    val window = scala.collection.mutable.ArrayBuffer.empty[(Long, Array[Double])]
    def dominates(a: Array[Double], b: Array[Double]): Boolean = {
      var le = true; var lt = false; var i = 0
      while (i < a.length && le) {
        if (a(i) > b(i)) le = false
        else if (a(i) < b(i)) lt = true
        i += 1
      }
      le && lt
    }
    it.foreach { cand =>
      var dominated = false
      var i = 0
      while (i < window.length && !dominated) {
        if (dominates(window(i)._2, cand._2)) dominated = true
        else if (dominates(cand._2, window(i)._2)) window.remove(i)
        else i += 1
      }
      if (!dominated) window += cand
    }
    window.iterator
  }

  /** Skyline of `df` by the given criteria columns. `minimize` lists
    * columns where smaller is better; `maximize` where larger is
    * better. Returns (id, criteria...) rows of the Pareto frontier —
    * join back on `id` for the full payload. Duplicate criterion
    * vectors: neither strictly dominates the other, so ALL copies
    * survive (the standard skyline semantics the oracle's NOT EXISTS
    * replays). */
  def skyline(
      spark: SparkSession, df: DataFrame, id: String,
      minimize: Seq[String], maximize: Seq[String] = Nil): DataFrame = {
    import spark.implicits._
    require(minimize.nonEmpty || maximize.nonEmpty, "no criteria")
    val crit = minimize.map(c => col(c).cast("double")) ++
      maximize.map(c => -col(c).cast("double"))
    val names = minimize ++ maximize
    val points = df.select(col(id).cast("long"), array(crit: _*))
      .toDF("_1", "_2").as[(Long, Array[Double])]
    val local = points.mapPartitions(bnl)          // phase 1: no shuffle
    val global = local.repartition(1).mapPartitions(bnl)
    val crit2 = names.indices.map { i =>
      val v = col("_2").getItem(i)
      (if (i >= minimize.length) -v else v).as(names(i))
    }
    global.toDF().select(col("_1").as(id) +: crit2: _*)
  }
}
