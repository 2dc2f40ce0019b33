package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
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

  /** HLL register count (m) and the scale of the integer harmonic sum:
    * registers are tracked as P_b = max(lowest-set-bit of the bucketed
    * hash suffix) — a monotone image of the classical max-rho register
    * (P = 2^(rho-1)) — so each term of Σ 2^-rho_b becomes the EXACT
    * integer 2^47 / P_b and the whole sketch needs no floating point
    * until one final division. */
  val HllBuckets = 256
  val HllCap: Long = 1L << 47 // register ceiling: P capped at 2^47
  /** alpha_m · m² · 2^48 folded into one double constant — the only
    * float in the estimate (est = HllAlphaScaled / S). */
  val HllAlphaScaled: Double =
    0.7213 / (1.0 + 1.079 / HllBuckets) * HllBuckets * HllBuckets *
      281474976710656.0 // 2^48

  /** HyperLogLog distinct-count sketch (Flajolet/Fusy/Gandouet/Meunier,
    * AofA 2007) over a single string column `w`, built to be BIT-EXACT
    * replayable cross-engine — no libm anywhere:
    *
    *   - bucket = low 8 hash bits; suffix sw = hash >>> 8 (both are
    *     pure bit extractions, identical on Spark's signed int64 and
    *     the oracle's unsigned HUGEINT replay);
    *   - the register is maintained as max(sw & -sw) — the lowest-set-
    *     bit trick; max of P ≡ max of rho since P = 2^(rho-1) is
    *     monotone — one integer max per bucket, mergeable (the 100 TB
    *     story: partial aggregation compresses any partition to ≤256
    *     longs before the shuffle);
    *   - the harmonic sum Σ_b 2^-rho_b is scaled by 2^48 into the
    *     integer S = Σ_b (2^47 DIV P_b) (empty register → 2^48):
    *     exact, order-independent, ≤ 256·2^48 < 2^57 so it fits int64;
    *   - the ONLY double op is the final est = HllAlphaScaled / S, one
    *     IEEE division — deterministic in any engine.
    *
    * Raw estimate only (no small-range linear-counting branch — that
    * needs ln; callers monitoring corpora with cardinality ≫ m don't
    * hit the regime, and the spec pins the observed rel_err). Output is
    * one row: (m, n_zero, s_num, est, n_exact, rel_err) — the exact
    * count rides along so the sketch's error is itself a gated number. */
  /** The register-value expression shared by every HLL entry point:
    * lowest set bit of the 56-bit hash suffix `sw`, capped at 2^47
    * (sw = 0 ⇒ the cap). */
  private def hllP: Column =
    when(col("sw") === 0L, lit(HllCap))
      .otherwise(least(lit(HllCap), col("sw").bitwiseAND(-col("sw"))))

  /** Per-key HLL registers over (key, w) rows → (key, b, pmax), at most
    * 256·|keys| rows. Register max-merge is associative, commutative
    * AND idempotent — partial register sets from different batches (or
    * an at-least-once replay of the SAME batch) merge by groupBy-max
    * into exactly the registers of the union. That's what makes the
    * sketch streamable: see streaming.StreamingCardinality. */
  def hllRegisters(
      items: DataFrame, key: String,
      oracleHash: Boolean = false): DataFrame = {
    val h =
      if (oracleHash) graft.expressions.RollingHash(col("w"))
      else xxhash64(col("w"))
    items.select(col(key), pmod(h, lit(HllBuckets.toLong)).as("b"),
        shiftrightunsigned(h, 8).as("sw"))
      .select(col(key), col("b"), hllP.as("p"))
      .groupBy(col(key), col("b")).agg(max(col("p")).as("pmax"))
  }

  /** Per-key estimates from (possibly merged) registers plus a per-key
    * exact-count frame (key, n_exact) — hllDistinct's arithmetic,
    * keyed: same integer term sum, same single division. */
  def hllEstimateByKey(
      spark: SparkSession, regs: DataFrame, key: String,
      exact: DataFrame): DataFrame = {
    val allb = regs.select(col(key)).distinct()
      .crossJoin(spark.range(HllBuckets).select(col("id").as("b")))
    val terms = allb.join(regs, Seq(key, "b"), "left")
      .select(col(key), col("pmax").isNull.as("isz"),
        when(col("pmax").isNull, lit(1L << 48))
          .otherwise(expr(s"${HllCap}L DIV pmax")).as("term"))
    val sketch = terms.groupBy(col(key)).agg(
      sum(col("term")).as("s_num"),
      sum(when(col("isz"), 1L).otherwise(0L)).as("n_zero"))
    val estCol = lit(HllAlphaScaled) / col("s_num").cast("double")
    val exD = col("n_exact").cast("double")
    sketch.join(exact, Seq(key))
      .select(col(key), lit(HllBuckets.toLong).as("m"), col("n_zero"),
        col("s_num"), estCol.as("est"), col("n_exact"),
        (abs(estCol - exD) / exD).as("rel_err"))
      .orderBy(col(key))
  }

  /** Count-Min sketch point estimates (Cormode & Muthukrishnan 2005)
    * for the exact top-k items — the frequency sibling of the HLL
    * sketch, completing the repo's mergeable-summary family (HLL =
    * cardinality, CMS = frequency, Misra–Gries = heavy hitters, Bloom
    * = membership). depth hashed counter rows of `width` cells each;
    * an item's estimate is the MIN of its cells. Counters are plain
    * integer sums (mergeable by cell-wise addition — the 100 TB story:
    * a sketch per partition/day, summed, never the corpus re-counted),
    * so the whole estimate is bit-exact replayable, and the one-sided
    * error guarantee — estimate ≥ exact, always — ships as a
    * hash-gated column rather than spec prose.
    *
    * Output: the exact top-k items with (n_exact, est, overcount)
    * — overcount/width·Σn is the classic ε bound a user checks here
    * before trusting the sketch for the long tail. */
  def countMinTopK(
      spark: SparkSession, items: DataFrame, k: Int = 20,
      width: Int = 1024, depth: Int = 4,
      oracleHash: Boolean = false): DataFrame = {
    def bucket(i: Int): Column = {
      val salted = concat(lit(s"cms$i"), col("w"))
      val h =
        if (oracleHash) graft.expressions.RollingHash(salted)
        else xxhash64(salted)
      pmod(h, lit(width.toLong))
    }
    val ws = items.select(col("w")).materializeOnce() // counters + exact
    val counters = ws.select(posexplode(
        array((0 until depth).map(bucket): _*)).as(Seq("row", "bucket")))
      .groupBy(col("row"), col("bucket"))
      .agg(count(lit(1)).as("cnt")) // ≤ depth·width rows: broadcastable
    val exact = ws.groupBy(col("w")).agg(count(lit(1)).as("n_exact"))
      .orderBy(col("n_exact").desc, col("w")).limit(k)
    exact.select(col("w"), col("n_exact"), posexplode(
        array((0 until depth).map(bucket): _*)).as(Seq("row", "bucket")))
      .join(broadcast(counters), Seq("row", "bucket"))
      .groupBy(col("w"), col("n_exact")).agg(min(col("cnt")).as("est"))
      .select(col("w"), col("n_exact"), col("est"),
        (col("est") - col("n_exact")).as("overcount")) // ≥ 0, a theorem
      .orderBy(col("n_exact").desc, col("w"))
  }

  def hllDistinct(
      spark: SparkSession, items: DataFrame,
      oracleHash: Boolean = false): DataFrame = {
    val h =
      if (oracleHash) graft.expressions.RollingHash(col("w"))
      else xxhash64(col("w"))
    val hashed = items
      .select(col("w"), pmod(h, lit(HllBuckets.toLong)).as("b"),
        shiftrightunsigned(h, 8).as("sw"))
      .materializeOnce() // feeds the registers AND the exact count
    val regs = hashed.select(col("b"), hllP.as("p"))
      .groupBy(col("b")).agg(max(col("p")).as("pmax"))
    val terms = spark.range(HllBuckets).select(col("id").as("b"))
      .join(regs, Seq("b"), "left")
      .select(col("pmax").isNull.as("isz"),
        when(col("pmax").isNull, lit(1L << 48))
          .otherwise(expr(s"${HllCap}L DIV pmax")).as("term"))
    val sketch = terms.agg(
      sum(col("term")).as("s_num"),
      sum(when(col("isz"), 1L).otherwise(0L)).as("n_zero"))
    val exact = hashed.agg(countDistinct(col("w")).as("n_exact"))
    val estCol = lit(HllAlphaScaled) / col("s_num").cast("double")
    val exD = col("n_exact").cast("double")
    sketch.crossJoin(exact) // 1-row normalizer
      .select(lit(HllBuckets.toLong).as("m"), col("n_zero"), col("s_num"),
        estCol.as("est"), col("n_exact"),
        (abs(estCol - exD) / exD).as("rel_err"))
      .orderBy(col("m"))
  }

  /** Join-cardinality estimation by KMV/theta-sketch intersection
    * (Beyer et al., SIGMOD 2007; the theta-sketch set operations of
    * Dasgupta et al.) — the planner question "how many distinct keys do
    * these two tables share?" answered WITHOUT joining them: each side
    * is reduced to its k smallest key hashes (one TakeOrdered per side —
    * k+1 rows reach the driver plan, never the data), θ = min of the two
    * (k+1)-th smallest, and the matching sketch hashes below θ scale up
    * by 2^62/θ. Everything downstream of the two sketches touches ≤ k+1
    * rows per side; the estimate is exact integer arithmetic
    * (n_sample·2^62 div θ, products on DECIMAL(38,0)).
    *
    * Hashing: RollingHash over the key lpad'ed to 12 chars AND
    * REVERSED. Both transforms are load-bearing for uniformity: the pad
    * alone leaves a lattice (a decimal key's last 4 digits keep the
    * never-wrapping coefficients p³=1e18, p²,p¹,p⁰, so bottom-k hashes
    * cluster on lattice points — measured 4.7× θ inflation on orderkeys,
    * est 3087 vs exact 14743); reversing puts every VARYING digit at a
    * position whose coefficient p^(≥7) wraps mod 2^64, which is where
    * the mixing comes from (the constant zero tail then only multiplies
    * by the odd constant p^7 — a bijection mod 2^64, uniformity-
    * preserving). Masked to [0, 2^62) so the fraction-of-keyspace math
    * needs no signed affine shift. Oracle replays the polynomial per
    * rule 12; measured rel. error 4.7% (sf0.01) / 2.0% (sf0.1) at k=256
    * vs the σ=1/√k=6.25% theory band.
    *
    * When BOTH sides have ≤ k distinct keys, θ stays 2^62 and the
    * estimate collapses to the exact intersection — the sketch's exact
    * regime, mirrored from q88. `exact_intersection` (a real distinct
    * join) and the 25% agreement flag are the gate's verification
    * columns; a 100 TB caller skips them — not computing that join is
    * the operator's entire point. */
  def kmvJoinCardinality(
      a: DataFrame, b: DataFrame, k: Int = 256): DataFrame = {
    val mask = (1L << 62) - 1
    def keyHash(c: Column): Column =
      graft.expressions.RollingHash(reverse(lpad(c.cast("string"), 12, "0")))
        .bitwiseAND(lit(mask))
    def sketch(df: DataFrame): DataFrame =
      df.select(keyHash(col("key")).as("h")).distinct()
        .orderBy(col("h")).limit(k + 1)
        .materializeOnce() // feeds its theta AND the sample join
    def thetaOf(s: DataFrame, name: String): DataFrame =
      s.agg(when(count(lit(1)) === k + 1, max(col("h")))
        .otherwise(lit(mask) + 1).as(name))
    val (sa, sb) = (sketch(a), sketch(b))
    val th = thetaOf(sa, "theta_a").crossJoin(thetaOf(sb, "theta_b"))
      .select(least(col("theta_a"), col("theta_b")).as("theta"))
    val sample = sa.join(sb, Seq("h")) // ≤ k+1 rows a side: broadcast
      .crossJoin(th).filter(col("h") < col("theta"))
      .agg(count(lit(1)).as("n_sample"))
    val exact = a.select(col("key")).distinct()
      .join(b.select(col("key")).distinct(), Seq("key"))
      .agg(count(lit(1)).as("exact_intersection"))
    sample.crossJoin(th).crossJoin(exact)
      .withColumn("est_intersection", expr(
        "cast(n_sample as decimal(38,0)) * 4611686018427387904 div theta"))
      .select(col("theta"), col("n_sample"), col("est_intersection"),
        col("exact_intersection"),
        ((col("exact_intersection") === 0 && col("n_sample") === 0) ||
          abs(col("est_intersection") - col("exact_intersection")) * 4
            <= col("exact_intersection")).as("within_25pct"))
      .orderBy(col("theta"))
  }
}
