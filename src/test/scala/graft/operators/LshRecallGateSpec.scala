package graft.operators

import graft.SparkSpec

/** The rule-13 recall contract, automated.
  *
  * Eight gate queries (d38, d44, d46, d47, q70, q134, q136, q139) are
  * oracled against the BRUTE-FORCE exact-Jaccard pair set, which is valid
  * only while the banded-LSH candidate stage has 100% recall on the gate
  * corpus — and, since the minhash family moved to 64-bit hashed
  * shingles, only absent xxhash64 shingle collisions. Until round 6 that
  * contract was enforced by a human remembering to run tools.RecallCheck
  * after any band/cap/shingle change; this suite runs the same
  * comparison at sf0.01 (the driver's correctness-gate SF) on every
  * `sbt test`, so a change that silently degrades recall fails CI
  * instead of shipping as eight green gates.
  *
  * tools.RecallCheck remains the wider manual witness (both SFs, plus
  * the SimHash variants); run it after any intentional re-tuning.
  */
class LshRecallGateSpec extends SparkSpec {

  test("rule-13 gate: minhash candidates→verify equals brute force at sf0.01") {
    val docs = graft.Tables.load(spark, sf001, "documents")
    val verified = Dedup.minhashVerifiedPairs(docs, threshold = 0.5, maxDf = 20)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    val exact = Dedup.ngramJaccardPairs(docs, threshold = 0.5, maxDf = 20)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    assert(exact.nonEmpty, "gate corpus lost its planted near-dup pairs")
    val missed = exact.keySet -- verified.keySet
    val extra = verified.keySet -- exact.keySet
    assert(missed.isEmpty && extra.isEmpty,
      s"LSH recall broke: missed=$missed extra=$extra — the brute-force " +
        "oracle on d38/d44/d46/d47/q70/q134/q136/q139 is no longer valid " +
        "(rule 13); re-tune bands/cap/shingles or re-oracle before landing")
    assert(verified === exact,
      "pair sets match but Jaccard values drifted — check the df-cap and " +
        "shingle hashing on both pipelines")
  }
}
