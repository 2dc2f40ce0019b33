package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.Materialize.Ops

/** Market-basket association mining over (basket, item) pairs — the
  * classic support/lift co-occurrence analysis (Agrawal–Imieliński–Swami
  * SIGMOD'93), restricted to pairs: with bounded per-basket item counts
  * the pair explosion is Σ|basket|² — linear in data for the retail /
  * clickstream shapes this engine targets — so the full Apriori lattice
  * is unnecessary for the dominant "which attributes co-occur" question.
  *
  * Exactness: all supports are exact int64 counts; lift is ONE double
  * division of two exact int64 products ((N·c_ab)/(c_a·c_b)), a single
  * correctly-rounded IEEE op that both engines compute bit-identically
  * (CLAUDE.md rule 17's single-op family — nothing is summed after the
  * division).
  *
  * Scale shape: one distinct shuffle at (basket, item) grain, one
  * self-join co-keyed on basket, one pair-grain groupBy. The item-count
  * frame is bounded by the ITEM DOMAIN — small for retail SKUs, but a
  * 20M-row latent OOM when items are e.g. part keys at sf100 — so its
  * two joins carry NO broadcast hint: AQE broadcasts when the measured
  * size fits `autoBroadcastJoinThreshold` and shuffles when it doesn't
  * (AssociationPlanSpec asserts the gate-scale plan still broadcasts,
  * AQE-chosen). Only the 1-row total frame keeps a forced broadcast.
  * The basket table is never broadcast and never collected. At 2^53+
  * basket counts the N·c_ab product would round in the double cast —
  * far beyond any real corpus (9e15 baskets).
  */
object Association {

  /** Unordered item pairs co-occurring in ≥ `minSupport` baskets, with
    * exact support counts and lift = N·c_ab / (c_a·c_b).
    *
    * Output: (b1, b2, pair_orders, lift) with b1 < b2; callers order /
    * limit. Duplicate (basket, item) rows are collapsed first so each
    * basket contributes one unit of support per pair.
    */
  def pairLift(
      baskets: DataFrame, basketCol: String, itemCol: String,
      minSupport: Long): DataFrame = {
    require(minSupport >= 1, "minSupport must be >= 1")
    val ob = baskets
      .select(col(basketCol).as("ok"), col(itemCol).as("b"))
      .distinct()
      .materializeOnce() // read by both self-join sides + 2 count aggs
    val n = ob.agg(countDistinct(col("ok")).as("n_orders"))
    val bc = ob.groupBy(col("b")).agg(count(lit(1)).as("cnt"))
    val pairs = ob.as("x")
      .join(ob.as("y"), col("x.ok") === col("y.ok") && col("x.b") < col("y.b"))
      .select(col("x.b").as("b1"), col("y.b").as("b2"))
      .groupBy(col("b1"), col("b2"))
      .agg(count(lit(1)).as("pair_orders"))
      .filter(col("pair_orders") >= minSupport)
    pairs
      .join(bc.select(col("b").as("b1"), col("cnt").as("c1")), "b1")
      .join(bc.select(col("b").as("b2"), col("cnt").as("c2")), "b2")
      .crossJoin(broadcast(n)) // 1-row normalizer
      .select(col("b1"), col("b2"), col("pair_orders"),
        ((col("n_orders") * col("pair_orders")).cast("double") /
          (col("c1") * col("c2")).cast("double")).as("lift"))
  }
}
