package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.Materialize.Ops

/** Distributed heavy hitters (frequent items) — the scale pattern for
  * "top words / domains / hosts above a support threshold" when the key
  * cardinality is too large to aggregate exactly up front.
  *
  * Two-phase Misra–Gries (Misra & Gries 1982; the distributed-merge
  * analysis is Agarwal et al., "Mergeable summaries", PODS 2012):
  *
  *   1. every partition runs a k-counter Misra–Gries summary over its
  *      items — O(k) memory regardless of partition size, one pass, and
  *      any item with local frequency > n_p/(k+1) is guaranteed to
  *      survive its partition;
  *   2. the union of survivors (≤ k·partitions candidate keys, tiny) is
  *      recounted EXACTLY with a semi-join + groupBy, and the exact
  *      support filter count·(k+1) > N keeps precisely the true heavy
  *      hitters.
  *
  * Since Σ_p count_p(x) = count(x) > N/(k+1) forces count_p(x) >
  * n_p/(k+1) in at least one partition, every true heavy hitter is a
  * candidate — so the final output is EXACT and independent of how rows
  * were partitioned, even though the intermediate candidate set is not.
  * That's what makes the operator oracle-able: DuckDB replays the plain
  * exact HAVING query. The support filter is integer arithmetic — no
  * doubles anywhere.
  */
object Frequency {

  /** Exact heavy hitters over `items` (single string column `item`):
    * all values with count·(k+1) > N, with exact counts.
    * k bounds per-partition memory; support threshold is 1/(k+1). */
  def heavyHitters(spark: SparkSession, items: DataFrame, k: Int): DataFrame = {
    import spark.implicits._
    // read three times: the MG pass, the exact recount, the total count
    val ds = items.select(col("item")).materializeOnce()
    val candidates = ds.as[String].mapPartitions { it =>
      val counters = scala.collection.mutable.HashMap.empty[String, Long]
      it.foreach { x =>
        if (counters.contains(x)) counters(x) += 1L
        else if (counters.size < k) counters(x) = 1L
        else {
          // decrement-all step; drop zeroed counters
          val dead = List.newBuilder[String]
          counters.mapValuesInPlace((_, v) => v - 1L)
          counters.foreach { case (key, v) => if (v == 0L) dead += key }
          dead.result().foreach(counters.remove)
        }
      }
      counters.keysIterator
    }.toDF("item").distinct()
    val total = ds.agg(count(lit(1)).as("n_total"))
    ds.join(candidates, Seq("item"), "left_semi")
      .groupBy(col("item")).agg(count(lit(1)).as("cnt"))
      .crossJoin(total)
      .filter(col("cnt") * (k + 1) > col("n_total"))
      .select(col("item"), col("cnt"))
      .orderBy(col("cnt").desc, col("item"))
  }
}
