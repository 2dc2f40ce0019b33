package graft.queries

import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.TextFunctions
import graft.operators.Dedup

/** Deduplication operators over the documents table. The synthetic corpus
  * plants ~5% near-duplicate pairs (word-level perturbations), so the
  * fuzzy variants return real matches; exact variants demonstrate the
  * mechanism (the corpus has no byte-identical texts).
  */
object DedupQueries {

  private def docs(s: org.apache.spark.sql.SparkSession, d: String) =
    Tables.load(s, d, "documents")

  val all: Seq[Q] = Seq(

    // exact dedup on the canonical (sorted-token) fingerprint
    Q("d36_dedup_exact", Some(
      """SELECT md5(array_to_string(list_sort(string_split_regex(trim(text), '\s+')), ' ')) AS fp,
        |       min(doc_id) AS keep_id, count(*) AS n_dups
        |FROM documents GROUP BY 1 ORDER BY fp""".stripMargin),
      (s, d) => Dedup.exactGroups(docs(s, d),
        TextFunctions.canonicalFingerprint(col("text")))),

    // dedup by key columns (keep lowest doc_id per (lang, source))
    Q("d37_dedup_bykey", Some(
      """SELECT lang, source, min(doc_id) AS keep_id FROM documents
        |GROUP BY lang, source ORDER BY lang, source, keep_id""".stripMargin),
      (s, d) => Dedup.byKey(docs(s, d), Seq("lang", "source"))),

    // MinHash + banded LSH in the canonical candidates→verify shape:
    // the bucket join proposes pairs, exact n-gram Jaccard confirms them.
    // Verification makes the output deterministic (no estimator), so it
    // takes the same brute-force oracle as d40 — and the hash match
    // additionally ASSERTS 100% LSH recall on the gate corpus (verified
    // at sf0.01 and sf0.1, 25/25 and 256/256 pairs; tools.RecallCheck).
    Q("d38_minhash_lsh", Some(ngramJaccardOracle),
      (s, d) => Dedup.minhashVerifiedPairs(docs(s, d), threshold = 0.5,
        maxDf = 20)),

    // SimHash near-dup pairs (bit-vote fingerprint, banded). Hamming ≤ 3:
    // unweighted simhash over a shared small vocabulary sits near the
    // false-positive cliff by ~6 bits, so the cut stays tight.
    Q("d39_simhash", None,
      (s, d) => Dedup.simhashPairs(docs(s, d), maxHamming = 3)),

    // set-SimHash fingerprints: distinct tokens vote once — repetition-
    // robust, unlike the tf-implicit occurrence voting of d39 (xxhash64
    // bit votes → rows-only; semantics spec-tested on planted documents)
    Q("d42_simhash_set", None,
      (s, d) => Dedup.simhashSet(docs(s, d))
        .orderBy(col("doc_id"))),

    // SimHash candidates→exact-verify. Deterministic values, but NOT
    // oracle-equal to the brute pair set: 4×16 banding provably misses
    // high-Hamming near-dups (23/25 at sf0.01 even at h=16 —
    // tools.RecallCheck), so this stays rows-only; the subset-with-exact-
    // values relation is spec-tested.
    Q("d43_simhash_verified", None,
      (s, d) => Dedup.simhashVerifiedPairs(docs(s, d), maxHamming = 8,
        maxDf = 20)),

    // exact n-gram Jaccard pairs — fully SQL-expressible, oracled
    Q("d40_ngram_jaccard", Some(ngramJaccardOracle),
      // maxDf=20: the inverted-index join costs Σ df² per shingle, so the
      // DF cap is the whole ballgame at scale — 20 here ≈ 0.4% of the
      // sf0.1 corpus, the usual boilerplate-shingle cutoff.
      (s, d) => Dedup.ngramJaccardPairs(docs(s, d), n = 3, threshold = 0.5,
        maxDf = 20)),

    // duplicate CLUSTERS: connected components over the verified pair
    // set (transitive closure — A~B~C collapses even without an A~C
    // pair). Spark runs distributed min-label propagation; the oracle
    // replays reachability with a recursive CTE.
    Q("d44_dup_clusters", Some(
      s"""WITH RECURSIVE $ngramPairCtes,
         |pairs AS (
         |  SELECT id_a, id_b
         |  FROM inter
         |  JOIN sizes sa ON sa.doc_id = id_a
         |  JOIN sizes sb ON sb.doc_id = id_b
         |  WHERE inter / (sa.sz + sb.sz - inter) >= 0.5),
         |edges AS (
         |  SELECT id_a AS s, id_b AS d FROM pairs
         |  UNION ALL
         |  SELECT id_b, id_a FROM pairs),
         |walk(id, lbl) AS (
         |  SELECT s, s FROM edges
         |  UNION
         |  SELECT e.s, w.lbl FROM edges e JOIN walk w ON w.id = e.d)
         |SELECT id AS doc_id, min(lbl) AS cluster_id
         |FROM walk GROUP BY id ORDER BY doc_id""".stripMargin),
      (s, d) => Dedup.connectedComponents(
        Dedup.minhashVerifiedPairs(docs(s, d), threshold = 0.5, maxDf = 20))
        .orderBy(col("doc_id"))),

    // survivor selection: per duplicate cluster keep the highest-QUALITY
    // member (not the lowest id) — the policy real corpus builds use.
    // Composes connectedComponents with the quality score; one window
    // over (cluster_id) picks the survivor.
    Q("d46_cluster_survivors",
      Some("WITH RECURSIVE " + ngramPairCtes + ",\n" +
        """|pairs AS (
           |  SELECT id_a, id_b FROM inter
           |  JOIN sizes sa ON sa.doc_id = id_a
           |  JOIN sizes sb ON sb.doc_id = id_b
           |  WHERE inter / (sa.sz + sb.sz - inter) >= 0.5),
           |edges AS (
           |  SELECT id_a AS s, id_b AS d FROM pairs
           |  UNION ALL SELECT id_b, id_a FROM pairs),
           |walk(id, lbl) AS (
           |  SELECT s, s FROM edges
           |  UNION
           |  SELECT e.s, w.lbl FROM edges e JOIN walk w ON w.id = e.d),
           |cc AS (SELECT id AS doc_id, min(lbl) AS cluster_id
           |       FROM walk GROUP BY id),
           |scored AS (
           |  SELECT doc_id,
           |    round(
           |      least(length(text) / 500.0, 1.0) * 0.4
           |      + least(CAST(len(list_filter(string_split_regex(trim(text), '\s+'),
           |            x -> x IN ('the','a','an','and','or','of','to','in','is','it'))) AS DOUBLE)
           |          / len(string_split_regex(trim(text), '\s+')) * 5.0, 1.0) * 0.4
           |      + (1.0 - least(CAST(len(regexp_extract_all(text, '[.,!?;:]')) AS DOUBLE)
           |          / CAST(greatest(len(string_split_regex(trim(text), '\s+')), 1) AS DOUBLE), 1.0)) * 0.2,
           |      6) AS quality
           |  FROM documents),
           |ranked AS (
           |  SELECT cc.cluster_id, cc.doc_id, s.quality,
           |         row_number() OVER (PARTITION BY cc.cluster_id
           |                            ORDER BY s.quality DESC, cc.doc_id) AS rn,
           |         count(*) OVER (PARTITION BY cc.cluster_id) AS n_members
           |  FROM cc JOIN scored s ON s.doc_id = cc.doc_id)
           |SELECT cluster_id, doc_id AS keep_id, quality, n_members
           |FROM ranked WHERE rn = 1 ORDER BY cluster_id""".stripMargin),
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val cc = Dedup.connectedComponents(
          Dedup.minhashVerifiedPairs(docs(s, d), threshold = 0.5, maxDf = 20))
        val scored = docs(s, d).select(col("doc_id"),
          graft.functions.TextFunctions.qualityScore(col("text")).as("quality"))
        val w = Window.partitionBy(col("cluster_id"))
          .orderBy(col("quality").desc, col("doc_id"))
        val wc = Window.partitionBy(col("cluster_id"))
        cc.join(scored, Seq("doc_id"))
          .withColumn("rn", row_number().over(w))
          .withColumn("n_members", count(lit(1)).over(wc))
          .filter(col("rn") === 1)
          .select(col("cluster_id"), col("doc_id").as("keep_id"),
            col("quality"), col("n_members"))
          .orderBy(col("cluster_id"))
      }),

    // benchmark-contamination check (decontamination): per-document
    // overlap of 3-gram shingles against the shingle set of docs 0-4
    // (standing in for an eval set)
    Q("d45_contamination", Some(
      s"""WITH $ngramShingleCte,
         |bench AS (SELECT DISTINCT sh FROM ex WHERE doc_id IN ($benchIdsSql)),
         |corpus AS (SELECT * FROM ex WHERE doc_id NOT IN ($benchIdsSql)),
         |sizes AS (SELECT doc_id, count(*) AS n_shingles FROM corpus GROUP BY doc_id),
         |ov AS (SELECT c.doc_id, count(*) AS n_overlap
         |       FROM corpus c JOIN bench b ON c.sh = b.sh GROUP BY c.doc_id)
         |SELECT s.doc_id, s.n_shingles,
         |       coalesce(ov.n_overlap, 0) AS n_overlap,
         |       CAST(coalesce(ov.n_overlap, 0) AS DOUBLE)
         |         / CAST(s.n_shingles AS DOUBLE) AS rate
         |FROM sizes s LEFT JOIN ov ON s.doc_id = ov.doc_id
         |ORDER BY s.doc_id""".stripMargin),
      (s, d) => Dedup.contaminationCheck(docs(s, d), benchIds))
  )

  /** Benchmark docs for the contamination check: ids 0–4 stand in for an
    * eval set. Interpolated into the d45 oracle — one definition drives
    * both engines. */
  // lazy like every val `all` forces during its own init (object
  // init order: `all` runs first, and a forward-referenced plain val
  // would still be null — the q-object NPE class of bug)
  private lazy val benchIds: Seq[Long] = Seq(0L, 1L, 2L, 3L, 4L)
  private lazy val benchIdsSql: String = benchIds.mkString(",")

  /** (doc_id, distinct 3-gram shingle) — the DuckDB mirror of
    * Dedup.shingleTable. The shingle is built by list-SLICING
    * (`w[i:i+2]`, truncating like Spark's `slice`), not positional
    * indexing: a sub-3-token document must yield its one partial shingle
    * on both engines, where `w[i+2]` would turn the whole string NULL
    * and silently drop the document from DuckDB's side. The trailing
    * `sh <> ''` mirrors Spark's length>0 shingle filter — an empty/
    * whitespace-only document tokenizes to [''] and must vanish from
    * BOTH engines, not just Spark. private[queries]: q70's prep
    * pipeline interpolates the same CTEs (one definition, two oracles). */
  private[queries] lazy val ngramShingleCte: String =
    """ex AS (
      |  SELECT doc_id, sh FROM (
      |    SELECT doc_id, unnest(list_distinct(sh_list)) AS sh FROM (
      |      SELECT doc_id,
      |        list_transform(range(1, greatest(len(w) - 3, 0) + 2),
      |                       i -> array_to_string(w[i:i+2], ' ')) AS sh_list
      |      FROM (SELECT doc_id, string_split_regex(trim(text), '\s+') AS w FROM documents)))
      |  WHERE sh <> '')""".stripMargin

  /** The shared CTE chain computing exact 3-gram Jaccard intersections
    * with the df≤20 skew cap (ends with `inter`; `sizes` also exposed). */
  private[queries] lazy val ngramPairCtes: String =
    s"""$ngramShingleCte,
      |sizes AS (SELECT doc_id, count(*) AS sz FROM ex GROUP BY doc_id),
      |keep AS (SELECT sh FROM ex GROUP BY sh HAVING count(*) <= 20),
      |fil AS (SELECT ex.doc_id, ex.sh FROM ex JOIN keep USING (sh)),
      |inter AS (
      |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS inter
      |  FROM fil a JOIN fil b ON a.sh = b.sh AND a.doc_id < b.doc_id
      |  GROUP BY 1, 2)""".stripMargin

  /** Brute-force 3-gram Jaccard pair set at threshold 0.5 — the shared
    * oracle for d40 (same algorithm) and d38 (candidates→verify LSH,
    * where equality also asserts recall).
    * `lazy` because `all` above initializes first (object init order). */
  private lazy val ngramJaccardOracle: String =
    s"""WITH $ngramPairCtes
       |SELECT id_a, id_b,
       |       inter / (sa.sz + sb.sz - inter) AS jaccard
       |FROM inter
       |JOIN sizes sa ON sa.doc_id = id_a
       |JOIN sizes sb ON sb.doc_id = id_b
       |WHERE inter / (sa.sz + sb.sz - inter) >= 0.5
       |ORDER BY id_a, id_b""".stripMargin
}
