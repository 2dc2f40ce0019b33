package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class FrequencySpec extends SparkSpec {
  import spark.implicits._

  /** Exact reference: plain groupBy + integer support filter. */
  private def exact(items: Seq[String], k: Int): Set[(String, Long)] = {
    val n = items.size
    items.groupBy(identity).view.mapValues(_.size.toLong)
      .filter { case (_, c) => c * (k + 1) > n }
      .toSet.map { (kv: (String, Long)) => kv }
  }

  private def run(items: Seq[String], k: Int, parts: Int): Set[(String, Long)] =
    Frequency.heavyHitters(spark,
        items.toDF("item").repartition(parts), k)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet

  test("heavyHitters is exact and partition-independent") {
    // skewed stream: hot ~38%, warm ~24% (above the 1/5 support — the
    // filter is STRICT, so an exact-boundary count is excluded),
    // long tail of singletons
    val items = Seq.fill(400)("hot") ++ Seq.fill(250)("warm") ++
      (0 until 400).map(i => s"tail$i")
    val want = exact(items, 4) // support > 1/5 → hot, warm
    assert(want.map(_._1) === Set("hot", "warm"))
    for (parts <- Seq(1, 4, 13)) {
      assert(run(items, 4, parts) === want, s"parts=$parts")
    }
  }

  test("heavyHitters returns empty when nothing crosses the support") {
    val items = (0 until 100).map(i => s"u$i") // all unique
    assert(run(items, 9, 4) === Set.empty)
  }

  test("heavyHitters counts are exact, not summary estimates") {
    val items = Seq.fill(7)("a") ++ Seq.fill(3)("b")
    // k=1 → support > 1/2: only 'a', with its EXACT count
    assert(run(items, 1, 3) === Set(("a", 7L)))
  }

  test("heavyHitters equals the exact answer on seeded Zipf streams") {
    val rng = new scala.util.Random(7)
    for (trial <- 1 to 3) {
      // Zipf-ish: item i drawn with probability ∝ 1/(i+1)
      val items = Seq.fill(1500) {
        val u = rng.nextDouble()
        s"w${(1.0 / u).toInt % 40}"
      }
      for (k <- Seq(3, 9, 24)) {
        assert(run(items, k, 7) === exact(items, k), s"trial=$trial k=$k")
      }
    }
  }

  test("countMinTopK: one-sided error, forced-collision limit, partition-invariant") {
    import spark.implicits._
    val items = (0 until 2000).map(i => s"k${i % 100}") // 100 keys × 20
      .toDF("w")
    val out = Frequency.countMinTopK(spark, items, k = 10).collect()
    assert(out.length === 10)
    // the CMS theorem: estimates never undercount
    assert(out.forall(r => r.getLong(2) >= r.getLong(1)), out.toSeq)
    assert(out.forall(_.getLong(1) === 20L)) // uniform exact counts
    // counters are plain sums → partitioning cannot move any cell
    val again = Frequency
      .countMinTopK(spark, items.repartition(13), k = 10).collect()
    assert(out.map(_.toSeq).toSeq === again.map(_.toSeq).toSeq)
    // width=1 forces every key into one cell: est = total rows exactly
    val crowded = Frequency
      .countMinTopK(spark, items, k = 3, width = 1, depth = 2).collect()
    assert(crowded.forall(_.getLong(2) === 2000L), crowded.toSeq)
  }

  test("hllDistinct: estimate within the 3σ HLL bound, partition-invariant") {
    import spark.implicits._
    // 5000 distinct keys, duplicated ×3 — duplicates must not move the
    // registers (cardinality, not count)
    val keys = (0 until 5000).map(i => s"key_$i")
    val items = (keys ++ keys ++ keys).toDF("w")
    val row = Frequency.hllDistinct(spark, items).head()
    assert(row.getLong(0) === 256L) // m
    assert(row.getLong(4) === 5000L) // exact rides along
    // standard HLL error: 1.04/sqrt(256) = 6.5%; 3σ ≈ 20%
    assert(row.getDouble(5) < 0.20, s"rel_err=${row.getDouble(5)}")
    // register maxes are order-independent → repartitioning is a no-op
    val again = Frequency.hllDistinct(spark, items.repartition(13)).head()
    assert(row.toSeq === again.toSeq)
    // oracle-hash mode is deterministic too and its own estimate
    val orc = Frequency.hllDistinct(spark, items, oracleHash = true).head()
    assert(orc.getLong(4) === 5000L)
    assert(orc.getDouble(5) < 0.20, s"oracle rel_err=${orc.getDouble(5)}")
  }

  test("kmvJoinCardinality: exact regime below k, estimate regime above") {
    import spark.implicits._
    // both sides under k=256 distinct: θ stays 2^62 and est == exact
    val a = (1L to 200L).toDF("key")
    val b = (101L to 300L).toDF("key")
    val r = Frequency.kmvJoinCardinality(a, b, k = 256).head()
    assert(r.getLong(0) === (1L << 62), s"theta must be the sentinel: $r")
    assert(r.getLong(2) === 100L && r.getLong(3) === 100L, r)
    assert(r.getBoolean(4))
    // estimate regime: 12k ∩ 12k sharing 6k keys; k=256 ⇒ σ ≈ 6.25%,
    // the 25% gate is 4σ
    val bigA = (1L to 12000L).toDF("key")
    val bigB = (6001L to 18000L).toDF("key")
    val e = Frequency.kmvJoinCardinality(bigA, bigB, k = 256).head()
    assert(e.getLong(0) < (1L << 62), "theta must tighten above k")
    assert(e.getBoolean(4),
      s"est ${e.getLong(2)} not within 25% of exact ${e.getLong(3)}")
  }

  test("kmvJoinCardinality: disjoint sides estimate zero-ish, flag holds") {
    import spark.implicits._
    val a = (1L to 5000L).toDF("key")
    val b = (100001L to 105000L).toDF("key")
    val r = Frequency.kmvJoinCardinality(a, b, k = 256).head()
    assert(r.getLong(3) === 0L)
    // no common keys → no common sketch hashes (collision odds ~2^-62)
    assert(r.getLong(1) === 0L && r.getLong(2) === 0L && r.getBoolean(4), r)
  }
}
