package graft.operators

import graft.SparkSpec

/** The SimHash half of the rule-13 recall symmetry (round-7 directive 7).
  *
  * LshRecallGateSpec pins the minhash family's brute-force oracle
  * contract on every `sbt test`; the SimHash gates (d39/d42/d43) are
  * lower-risk — their oracles REPLAY the banding, so oracle validity
  * can't silently break — but a structural bug in the band split
  * (wrong shift, wrong mask, a cap that eats a guaranteed bucket)
  * would still ship as green gates that all agree on the same wrong
  * candidate set. This suite checks the banding against an
  * INDEPENDENT witness: brute-force Hamming distance over the
  * collected fingerprints (sf0.01 is ~10^3 docs → ~10^5 driver-side
  * pairs, trivial for a spec; production never does this).
  *
  *   1. Soundness: every banded candidate is a real sub-threshold
  *      pair (the hamming filter works).
  *   2. Pigeonhole guarantee: 4 bands of 16 bits MUST catch every
  *      pair with Hamming distance ≤ 3 (3 differing bits can touch
  *      at most 3 bands, so one band matches exactly). A miss here
  *      is a banding bug, not tuning.
  *
  * Recall on 3 < d ≤ 8 is probabilistic by design (Manku WWW '07);
  * the oracle replays the banding, so no contract depends on it.
  */
class SimhashRecallGateSpec extends SparkSpec {

  test("rule-13 symmetry: SimHash banding sound + complete for Hamming<=3 at sf0.01") {
    val docs = graft.Tables.load(spark, sf001, "documents")
    val maxHamming = 8
    val fp = Dedup.simhash(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val brute = (for {
      i <- fp.indices.iterator
      j <- (i + 1) until fp.length
      d = java.lang.Long.bitCount(fp(i)._2 ^ fp(j)._2) if d <= maxHamming
      (a, b) = (math.min(fp(i)._1, fp(j)._1), math.max(fp(i)._1, fp(j)._1))
    } yield (a, b) -> d.toLong).toMap
    val banded = Dedup.simhashPairs(docs, maxHamming).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap

    assert(brute.nonEmpty, "gate corpus has no sub-threshold SimHash pairs " +
      "— both assertions below would be vacuous")
    val unsound = banded.keySet -- brute.keySet
    assert(unsound.isEmpty,
      s"banded pairs not within Hamming $maxHamming: $unsound — the " +
        "hamming filter or fingerprint build is broken")
    val guaranteed = brute.filter(_._2 <= 3).keySet
    val missedGuaranteed = guaranteed -- banded.keySet
    assert(missedGuaranteed.isEmpty,
      s"pairs with Hamming<=3 missed by 4x16 banding: $missedGuaranteed — " +
        "pigeonhole says this is impossible with correct band extraction; " +
        "check the shift/mask in simhashPairs or a cap eating a live bucket")
    // values must agree where both found the pair
    banded.foreach { case (k, d) => assert(brute(k) == d,
      s"hamming disagrees for $k: banded=$d brute=${brute(k)}") }
  }
}
