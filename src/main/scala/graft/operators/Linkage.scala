package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.operators.Materialize.Ops

/** Probabilistic record linkage — the structured-record sibling of the
  * text dedup family (Fellegi & Sunter, JASA 1969; surveyed in
  * Christen, "Data Matching", 2012). Candidate pairs come from a
  * blocking key (as in sortedNeighborhoodPairs); each pair is scored by
  * an INTEGER agreement weight per field (agree → +w_a, disagree →
  * w_d, the log-likelihood-ratio weights of the F-S model pre-scaled to
  * integers), so every score — and the score histogram a practitioner
  * reads to place the match/non-match thresholds — is exact and
  * replayable cross-engine.
  *
  * Scale shape: ONE shuffle co-keyed on the block, per-block quadratic
  * pair generation bounded by `maxBlock` (oversized blocks are skipped
  * entirely — the d38 capBuckets contract, replayed by the oracle), one
  * histogram groupBy at score grain (output-sized). Nothing driver-side.
  */
object Linkage {

  /** One compared field: pairs agree when `expr` is equal on both
    * sides (nulls never agree); weights are pre-scaled integers. */
  final case class FieldWeight(expr: Column, wAgree: Long, wDisagree: Long)

  /** Histogram of pair scores within blocks: (score, n_pairs). */
  def fellegiSunterHistogram(
      records: DataFrame, id: Column, block: Column,
      fields: Seq[FieldWeight], maxBlock: Long = 1000L): DataFrame = {
    require(fields.nonEmpty, "at least one field to compare")
    val proj = records.select(
      id.as("rid") +: block.as("bk") +:
        fields.zipWithIndex.map { case (f, i) => f.expr.as(s"f$i") }: _*)
      .materializeOnce() // block-size cap + both join sides
    val ok = proj.groupBy(col("bk")).agg(count(lit(1)).as("bsz"))
      .filter(col("bsz") <= maxBlock).select(col("bk"))
    val fil = proj.join(ok, Seq("bk"))
    val a = fil.select(col("bk") +: col("rid").as("ra") +:
      fields.indices.map(i => col(s"f$i").as(s"a$i")): _*)
    val b = fil.select(col("bk") +: col("rid").as("rb") +:
      fields.indices.map(i => col(s"f$i").as(s"b$i")): _*)
    val score = fields.zipWithIndex.map { case (f, i) =>
      when(col(s"a$i") === col(s"b$i"), lit(f.wAgree)).otherwise(lit(f.wDisagree))
    }.reduce(_ + _)
    a.join(b, Seq("bk"))
      .filter(col("ra") < col("rb"))
      .select(score.as("score"))
      .groupBy(col("score")).agg(count(lit(1)).as("n_pairs"))
      .orderBy(col("score"))
  }

  /** Blocking-scheme quality audit (Christen's pair-completeness /
    * reduction-ratio metrics): given the TRUE pair set (from an exact
    * join — lossless ground truth) and a (record, block-key) table,
    * report how many true pairs the scheme keeps and how much of the
    * quadratic comparison space it prunes.
    *
    * Exactness: the candidate count is Σ_b m_b·(m_b−1) with BOTH the
    * per-block product and the sum in DECIMAL (rule 18 + ANSI rule
    * 21a: a plain-Long m·(m−1) THROWS past m ≈ 3.04e9, realistic at
    * 100 TB, and the cross-block sum overflows int64 far earlier). The
    * /2 never happens in integer space: `n_cand` is reported as DOUBLE
    * (cand2/2 — exact below 2^53, the honest type for an audit count
    * that can legitimately pass int64), and the reduction ratio
    * divides cand2 by the DECIMAL total-pair product directly, so no
    * halving is needed anywhere.
    *
    * Scale shape: one groupBy at block grain for the candidate count
    * (NEVER enumerating candidate pairs — the count comes from block
    * sizes), two key-joins for the found count, 1-row normalizer
    * crossJoins. */
  def blockingAudit(truth: DataFrame, keyed: DataFrame): DataFrame = {
    val k = keyed.select(col("doc_id"), col("bk")).materializeOnce()
    val nRec = k.agg(count(lit(1)).as("n_records"))
    // cand2 = 2 * n_candidate_pairs = Σ_b m·(m−1); DECIMAL(19,0) factors
    // so the product is (38,0) — never a Long op that ANSI could throw on
    val cand = k.groupBy(col("bk")).agg(count(lit(1)).as("m"))
      .agg(coalesce(sum(col("m").cast("decimal(19,0)") *
          (col("m") - lit(1)).cast("decimal(19,0)")),
        lit(0L).cast("decimal(38,0)")).as("cand2"))
    val t = truth.select(col("id_a"), col("id_b")).materializeOnce()
    val nTrue = t.agg(count(lit(1)).as("n_true"))
    val found = t
      .join(k.select(col("doc_id").as("id_a"), col("bk").as("bka")), Seq("id_a"))
      .join(k.select(col("doc_id").as("id_b"), col("bk").as("bkb")), Seq("id_b"))
      .filter(col("bka") === col("bkb"))
      .agg(count(lit(1)).as("n_found"))
    nRec.crossJoin(broadcast(nTrue)) // 1-row normalizers throughout
      .crossJoin(broadcast(cand))
      .crossJoin(broadcast(found))
      .select(col("n_records"), col("n_true"),
        (col("cand2").cast("double") / lit(2.0)).as("n_cand"),
        col("n_found"),
        (col("n_found").cast("double") / col("n_true").cast("double"))
          .as("pairs_completeness"),
        // 1 − cand2 / (n·(n−1)): both sides stay un-halved, the total
        // product goes through the same DECIMAL route as cand2
        (lit(1.0) - col("cand2").cast("double") /
          (col("n_records").cast("decimal(19,0)") *
            (col("n_records") - lit(1)).cast("decimal(19,0)")).cast("double"))
          .as("reduction_ratio"))
  }
}
