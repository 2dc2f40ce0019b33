package graft.queries

import org.apache.spark.sql.functions._

import graft.Tables
import graft.expressions.RollingHash
import graft.functions.TextFunctions._
import graft.operators.Materialize.Ops

/** Text-analysis operators over the documents table. Every oracle mirrors
  * the Spark expression step for step (same regexes, same fold order) so
  * results hash-match bitwise.
  */
object TextQueries {

  private def docs(s: org.apache.spark.sql.SparkSession, d: String) =
    Tables.load(s, d, "documents")

  /** t85: counts per PII class (rule 7: DuckDB regexp_count is
    * len(regexp_extract_all)) and the SAME declaration-order chained
    * redaction, generated from Curation.piiPatterns. */
  private lazy val piiScanOracle: String = {
    import graft.operators.Curation.piiPatterns
    val countCols = piiPatterns.map { case (n, p) =>
      s"CAST(len(regexp_extract_all(text, '$p')) AS BIGINT) AS n_$n"
    }.mkString(",\n        |  ")
    val total = piiPatterns.map { case (n, _) => s"n_$n" }.mkString(" + ")
    val redacted = piiPatterns.foldLeft("text") { case (acc, (n, p)) =>
      s"regexp_replace($acc, '$p', '[${n.toUpperCase}]', 'g')"
    }
    s"""WITH c AS (
       |  SELECT doc_id,
       |  $countCols,
       |  $redacted AS redacted
       |  FROM documents)
       |SELECT doc_id, ${piiPatterns.map { case (n, _) => s"n_$n" }
        .mkString(", ")},
       |  $total AS n_pii, ($total) > 0 AS has_pii, redacted
       |FROM c ORDER BY doc_id""".stripMargin
  }

  /** t82's blocklist — ONE definition feeding both engines (rule 12).
    * Terms are corpus-vocabulary words standing in for a bad-word list;
    * \w-only is REQUIRED (cross-dialect \b, enforced by the operator). */
  private val blockTerms = Seq("slow", "merge", "spark", "hash")
  private val blockPerMille = 20
  private val blockPat = blockTerms.mkString("\\b(", "|", ")\\b")

  val all: Seq[Q] = Seq(

    // token / char / punctuation statistics
    Q("t31_text_stats", Some(
      """SELECT doc_id,
        |       length(text) AS n_chars_calc,
        |       len(string_split_regex(trim(text), '\s+')) AS n_tokens,
        |       len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) AS n_bpeish,
        |       len(regexp_extract_all(text, '[.,!?;:]')) AS n_punct
        |FROM documents ORDER BY doc_id""".stripMargin),
      (s, d) => docs(s, d).select(col("doc_id"),
        length(col("text")).as("n_chars_calc"),
        tokenCount(col("text")).as("n_tokens"),
        bpeishTokenCount(col("text")).as("n_bpeish"),
        punctCount(col("text")).as("n_punct"))
        .orderBy(col("doc_id"))),

    // lexical-diversity stats: type/token ratio + hapax fraction per
    // document — corpus-quality signals (low TTR = repetitive text).
    // One explode + per-(doc, word) count + per-doc aggregate; all
    // ratios are exact-int divisions, identical IEEE on both engines.
    Q("t43_ttr", Some(
      """WITH tok AS (
        |  SELECT doc_id, unnest(string_split_regex(trim(text), '\s+')) AS w
        |  FROM documents),
        |tf AS (SELECT doc_id, w, count(*) AS c FROM tok GROUP BY doc_id, w)
        |SELECT doc_id,
        |  CAST(sum(c) AS BIGINT) AS n_tokens,
        |  count(*) AS n_types,
        |  CAST(count(*) FILTER (WHERE c = 1) AS BIGINT) AS n_hapax,
        |  CAST(count(*) AS DOUBLE) / CAST(sum(c) AS DOUBLE) AS ttr,
        |  CAST(count(*) FILTER (WHERE c = 1) AS DOUBLE) / count(*)
        |    AS hapax_frac
        |FROM tf GROUP BY doc_id ORDER BY doc_id""".stripMargin),
      (s, d) => {
        val tf = docs(s, d)
          .repartition(col("doc_id")) // row-amplifying explode (rule 6)
          .select(col("doc_id"), explode(tokens(col("text"))).as("w"))
          .groupBy(col("doc_id"), col("w")).agg(count(lit(1)).as("c"))
        tf.groupBy(col("doc_id"))
          .agg(sum(col("c")).cast("bigint").as("n_tokens"),
            count(lit(1)).as("n_types"),
            count(when(col("c") === 1, 1)).cast("bigint").as("n_hapax"))
          .select(col("doc_id"), col("n_tokens"), col("n_types"),
            col("n_hapax"),
            (col("n_types").cast("double") / col("n_tokens").cast("double"))
              .as("ttr"),
            (col("n_hapax").cast("double") / col("n_types").cast("double"))
              .as("hapax_frac"))
          .orderBy(col("doc_id"))
      }),

    // char-bigram familiarity: mean corpus frequency of each document's
    // character transitions — the cheap fluency/noise proxy (garbled
    // text is made of rare bigrams). Corpus model counts over the
    // DISTINCT-word table (q132's machinery); per-doc join broadcasts
    // the tiny bigram vocabulary. Σcnt/n is an exact-int division.
    Q("t44_bigram_familiarity", Some(
      """WITH wc AS (
        |  SELECT w AS word, count(*) AS cnt FROM (
        |    SELECT unnest(string_split_regex(trim(text), '\s+')) AS w
        |    FROM documents)
        |  GROUP BY w),
        |model AS (
        |  SELECT substr(word, CAST(i AS BIGINT), 2) AS pair,
        |         CAST(sum(cnt) AS BIGINT) AS pair_cnt
        |  FROM wc, unnest(range(1, CAST(len(word) AS BIGINT))) AS t(i)
        |  WHERE len(word) >= 2 GROUP BY 1),
        |dp AS (
        |  SELECT doc_id, substr(word, CAST(i AS BIGINT), 2) AS pair
        |  FROM (SELECT doc_id,
        |          unnest(string_split_regex(trim(text), '\s+')) AS word
        |        FROM documents),
        |       unnest(range(1, CAST(len(word) AS BIGINT))) AS t(i)
        |  WHERE len(word) >= 2),
        |per_doc AS (
        |  SELECT doc_id, count(*) AS n_bigrams,
        |         CAST(sum(pair_cnt) AS BIGINT) AS sum_cnt
        |  FROM dp JOIN model USING (pair) GROUP BY doc_id)
        |SELECT d.doc_id,
        |  COALESCE(p.n_bigrams, 0) AS n_bigrams,
        |  COALESCE(CAST(p.sum_cnt AS DOUBLE) / CAST(p.n_bigrams AS DOUBLE),
        |           0.0e0) AS familiarity
        |FROM documents d LEFT JOIN per_doc p USING (doc_id)
        |ORDER BY d.doc_id""".stripMargin),
      (s, d) => graft.operators.Vocab.bigramFamiliarity(docs(s, d))),

    // out-of-vocabulary rate per document against the corpus' own
    // top-100 word vocabulary (count-desc, word tiebreak — the same k
    // words every run): tokenizer-coverage / domain-shift diagnostic.
    Q("t45_oov_rate", Some(
      """WITH toks AS (
        |  SELECT doc_id, unnest(string_split_regex(trim(text), '\s+')) AS w
        |  FROM documents),
        |wc AS (SELECT w, count(*) AS n FROM toks GROUP BY w),
        |vocab AS (SELECT w FROM wc ORDER BY n DESC, w LIMIT 100),
        |per AS (
        |  SELECT t.doc_id, count(*) AS n_tokens,
        |         CAST(sum(CASE WHEN v.w IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_oov
        |  FROM toks t LEFT JOIN vocab v ON t.w = v.w
        |  GROUP BY t.doc_id)
        |SELECT doc_id, n_tokens, n_oov,
        |       CAST(n_oov AS DOUBLE) / CAST(n_tokens AS DOUBLE) AS oov_rate
        |FROM per ORDER BY doc_id""".stripMargin),
      (s, d) => graft.operators.Vocab.oovRate(docs(s, d), vocabSize = 100)),

    // n-gram-marker language ID (mechanism demo; corpus is EN-vocab)
    Q("t32_langid", Some(
      """WITH m AS (
        |  SELECT doc_id, lang,
        |    len(regexp_extract_all(' '||text||' ', ' the '))+len(regexp_extract_all(' '||text||' ', ' and ')) AS s_en,
        |    len(regexp_extract_all(' '||text||' ', ' le '))+len(regexp_extract_all(' '||text||' ', ' et ')) AS s_fr,
        |    len(regexp_extract_all(' '||text||' ', ' el '))+len(regexp_extract_all(' '||text||' ', ' y ')) AS s_es,
        |    len(regexp_extract_all(' '||text||' ', ' der '))+len(regexp_extract_all(' '||text||' ', ' und ')) AS s_de,
        |    len(regexp_extract_all(' '||text||' ', ' de '))+len(regexp_extract_all(' '||text||' ', ' he ')) AS s_zh
        |  FROM documents)
        |SELECT doc_id, lang,
        |  CASE WHEN greatest(s_en,s_fr,s_es,s_de,s_zh) <= 0 THEN 'und'
        |       WHEN s_en = greatest(s_en,s_fr,s_es,s_de,s_zh) THEN 'en'
        |       WHEN s_fr = greatest(s_en,s_fr,s_es,s_de,s_zh) THEN 'fr'
        |       WHEN s_es = greatest(s_en,s_fr,s_es,s_de,s_zh) THEN 'es'
        |       WHEN s_de = greatest(s_en,s_fr,s_es,s_de,s_zh) THEN 'de'
        |       WHEN s_zh = greatest(s_en,s_fr,s_es,s_de,s_zh) THEN 'zh'
        |       ELSE 'und' END AS lang_pred
        |FROM m ORDER BY doc_id""".stripMargin),
      (s, d) => docs(s, d).select(col("doc_id"), col("lang"),
        langId(col("text")).as("lang_pred"))
        .orderBy(col("doc_id"))),

    // quality scoring: length/stopword/punctuation heuristics
    Q("t33_quality", Some(
      s"""SELECT doc_id,
        |  len(string_split_regex(trim(text), '\\s+')) AS n_tokens,
        |  round(CAST(len(list_filter(string_split_regex(trim(text), '\\s+'),
        |        x -> x IN ('the','a','an','and','or','of','to','in','is','it'))) AS DOUBLE)
        |      / len(string_split_regex(trim(text), '\\s+')), 6) AS stop_ratio,
        |  $qualityExprSql AS quality
        |FROM documents ORDER BY doc_id""".stripMargin),
      (s, d) => docs(s, d).select(col("doc_id"),
        tokenCount(col("text")).as("n_tokens"),
        round(stopwordRatio(col("text")), 6).as("stop_ratio"),
        qualityScore(col("text")).as("quality"))
        .orderBy(col("doc_id"))),

    // content fingerprints: exact md5 + order-insensitive canonical md5
    Q("t34_fingerprint", Some(
      """SELECT doc_id, md5(text) AS fp,
        |       md5(array_to_string(list_sort(string_split_regex(trim(text), '\s+')), ' ')) AS canon_fp
        |FROM documents ORDER BY doc_id""".stripMargin),
      (s, d) => docs(s, d).select(col("doc_id"),
        fingerprint(col("text")).as("fp"),
        canonicalFingerprint(col("text")).as("canon_fp"))
        .orderBy(col("doc_id"))),

    // rolling-hash fingerprint — custom codegen'd Catalyst Expression.
    // Oracled: DuckDB replays the polynomial fold in HUGEINT with an
    // explicit mod-2^64 wrap, then re-signs into BIGINT. ord(char) ==
    // UTF-8 byte only for ASCII, which this corpus is (asserted: zero
    // rows with octet_length <> length at both gate SFs).
    Q("t35_rolling_hash", Some(
      """SELECT doc_id,
        |  CAST(CASE WHEN h >= CAST('9223372036854775808' AS HUGEINT)
        |            THEN h - CAST('18446744073709551616' AS HUGEINT)
        |            ELSE h END AS BIGINT) AS roll_fp
        |FROM (
        |  SELECT doc_id,
        |    list_reduce(
        |      list_prepend(CAST(0 AS HUGEINT),
        |        list_transform(range(1, length(text)+1),
        |                       i -> CAST(ord(text[i]) AS HUGEINT))),
        |      (acc, x) -> (acc * 1000003 + x) % CAST('18446744073709551616' AS HUGEINT)) AS h
        |  FROM documents)
        |ORDER BY doc_id""".stripMargin),
      (s, d) => docs(s, d).select(col("doc_id"),
        RollingHash(col("text")).as("roll_fp"))
        .orderBy(col("doc_id"))),

    // corpus-wide frequent tokens: explode → groupBy → top-k.
    // The 100 TB shape: partial counts map-side, TakeOrdered caps the
    // driver result at k — no full sort, no collect of the long tail.
    Q("t36_token_topk", Some(
      """SELECT w, count(*) AS n
        |FROM (SELECT unnest(string_split_regex(trim(text), '\s+')) AS w FROM documents)
        |GROUP BY w ORDER BY n DESC, w LIMIT 20""".stripMargin),
      (s, d) => docs(s, d)
        .select(explode(tokens(col("text"))).as("w"))
        .groupBy(col("w")).agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("w"))
        .limit(20)),

    // TF-IDF-weighted top term per document. The idf is the RATIONAL
    // form (N+1)/(df+1) — deliberately no ln(): log implementations can
    // differ in the last ulp across engines, while the rational form is
    // two exact int→double conversions and one division, bit-identical
    // everywhere; ranking order is unchanged (ln is monotone).
    Q("t38_tfidf", Some(
      """WITH toks AS (
        |  SELECT doc_id, unnest(string_split_regex(trim(text), '\s+')) AS w
        |  FROM documents),
        |tf AS (SELECT doc_id, w, count(*) AS tf FROM toks GROUP BY doc_id, w),
        |dfreq AS (SELECT w, count(DISTINCT doc_id) AS df FROM toks GROUP BY w),
        |n AS (SELECT count(*) AS n FROM documents),
        |scored AS (
        |  SELECT tf.doc_id, tf.w,
        |         tf.tf * ((n.n + 1.0) / (dfreq.df + 1.0)) AS score
        |  FROM tf JOIN dfreq USING (w) CROSS JOIN n),
        |ranked AS (
        |  SELECT doc_id, w, score,
        |         row_number() OVER (PARTITION BY doc_id
        |                            ORDER BY score DESC, w) AS rn
        |  FROM scored)
        |SELECT doc_id, w AS top_term, score FROM ranked WHERE rn = 1
        |ORDER BY doc_id""".stripMargin),
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        // repartition before the row-amplifying explode (rule 6), and
        // materialize once — the exploded tokens feed BOTH the tf and the
        // df aggregations (rule 5: shared subtree, or pay the explode 2×)
        val toks = docs(s, d)
          .repartition(col("doc_id"))
          .select(col("doc_id"), explode(tokens(col("text"))).as("w"))
          .materializeOnce()
        val tf = toks.groupBy(col("doc_id"), col("w"))
          .agg(count(lit(1)).as("tf"))
        val dfreq = toks.groupBy(col("w"))
          .agg(countDistinct(col("doc_id")).as("df"))
        val n = docs(s, d).count()
        val scored = tf.join(dfreq, Seq("w"))
          .withColumn("score",
            col("tf") * (lit(n + 1.0) / (col("df") + lit(1.0))))
        val w = Window.partitionBy(col("doc_id"))
          .orderBy(col("score").desc, col("w"))
        scored.withColumn("rn", row_number().over(w))
          .filter(col("rn") === 1)
          .select(col("doc_id"), col("w").as("top_term"), col("score"))
          .orderBy(col("doc_id"))
      }),

    // context-window chunking: split every document into 96-token chunks
    // on a 64-token stride (32-token overlap) — the standard pre-training
    // windowing step. One explode of the start offsets per doc; the
    // chunk slice stays a column expression (no UDF).
    Q("t39_chunking", Some(
      """WITH t AS (
        |  SELECT doc_id, string_split_regex(trim(text), '\s+') AS w
        |  FROM documents),
        |s AS (
        |  SELECT doc_id, w,
        |         unnest(range(0, greatest(len(w), 1), 64)) AS start
        |  FROM t)
        |SELECT doc_id, start // 64 AS chunk_id,
        |       array_to_string(w[start+1:start+96], ' ') AS chunk,
        |       len(w[start+1:start+96]) AS n_tokens
        |FROM s ORDER BY doc_id, chunk_id""".stripMargin),
      (s, d) => {
        val toks = docs(s, d)
          .select(col("doc_id"), tokens(col("text")).as("w"))
        toks
          .withColumn("start", explode(sequence(lit(0),
            greatest(size(col("w")) - 1, lit(0)), lit(64))))
          .select(col("doc_id"),
            (col("start") / 64).cast("bigint").as("chunk_id"),
            array_join(slice(col("w"), col("start") + 1, lit(96)), " ").as("chunk"),
            size(slice(col("w"), col("start") + 1, lit(96))).cast("bigint")
              .as("n_tokens"))
          .orderBy(col("doc_id"), col("chunk_id"))
      }),

    // document length histogram, 100-char buckets capped at 10
    // (width_bucket is absent in DuckDB 1.0, so plain arithmetic)
    Q("t37_len_histogram", Some(
      """SELECT CAST(least(floor(length(text) / 100.0), 9) AS INT) + 1 AS bucket,
        |       count(*) AS n
        |FROM documents GROUP BY 1 ORDER BY bucket""".stripMargin),
      (s, d) => docs(s, d)
        .select((least(floor(length(col("text")) / 100.0), lit(9)).cast("int") + 1)
          .as("bucket"))
        .groupBy(col("bucket")).agg(count(lit(1)).as("n"))
        .orderBy(col("bucket"))),

    // C4-style PII redaction: emails/phones/IPv4 swapped for typed tags,
    // plus per-kind match counts for filter-rate monitoring. The corpus
    // contains no PII (redacted == text, counts 0) — the oracle still
    // replays every regex, and planted-text semantics are spec-tested.
    Q("t40_pii_redact", Some(
      """SELECT doc_id,
        |  regexp_replace(regexp_replace(regexp_replace(text,
        |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
        |    '\b[0-9]{3}[-.][0-9]{3}[-.][0-9]{4}\b', '<PHONE>', 'g'),
        |    '\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b', '<IP>', 'g')
        |    AS redacted,
        |  len(regexp_extract_all(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS n_email,
        |  len(regexp_extract_all(text, '\b[0-9]{3}[-.][0-9]{3}[-.][0-9]{4}\b')) AS n_phone,
        |  len(regexp_extract_all(text, '\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b')) AS n_ip
        |FROM documents ORDER BY doc_id""".stripMargin),
      (s, d) => docs(s, d).select(
        Seq(col("doc_id"),
          graft.operators.Curation.piiRedact(col("text")).as("redacted")) ++
          graft.operators.Curation.piiCounts(col("text"))
            .map { case (n, c) => c.as(n) }: _*)
        .orderBy(col("doc_id"))),

    // Gopher-style repetition metrics: duplicate-word mass and the most
    // frequent word/bigram share per document
    Q("t41_repetition", Some(
      """WITH t AS (
        |  SELECT doc_id, string_split_regex(trim(text), '\s+') AS w FROM documents),
        |base AS (
        |  SELECT doc_id, CAST(len(w) AS BIGINT) AS n_words,
        |         round(1.0 - len(list_distinct(w)) * 1.0 / len(w), 6) AS dup_word_frac
        |  FROM t),
        |wc AS (SELECT doc_id, g, count(*) AS c
        |       FROM (SELECT doc_id, unnest(w) AS g FROM t) GROUP BY 1, 2),
        |tw AS (SELECT doc_id, g AS top_word, c AS top_word_n,
        |              row_number() OVER (PARTITION BY doc_id ORDER BY c DESC, g) AS rn
        |       FROM wc),
        |bc AS (SELECT doc_id, g, count(*) AS c
        |       FROM (SELECT doc_id,
        |               unnest(list_transform(range(1, len(w)),
        |                 i -> w[i] || ' ' || w[i+1])) AS g
        |             FROM t) GROUP BY 1, 2),
        |tb AS (SELECT doc_id, c AS top_bigram_n,
        |              row_number() OVER (PARTITION BY doc_id ORDER BY c DESC, g) AS rn
        |       FROM bc)
        |SELECT b.doc_id, b.n_words, b.dup_word_frac, tw.top_word,
        |       round(tw.top_word_n * 1.0 / b.n_words, 6) AS top_word_frac,
        |       round(coalesce(tb.top_bigram_n, 0) * 1.0 / greatest(b.n_words - 1, 1), 6)
        |         AS top_bigram_frac
        |FROM base b
        |JOIN tw ON tw.doc_id = b.doc_id AND tw.rn = 1
        |LEFT JOIN tb ON tb.doc_id = b.doc_id AND tb.rn = 1
        |ORDER BY b.doc_id""".stripMargin),
      (s, d) => graft.operators.Curation.repetitionMetrics(docs(s, d))),

    // Gopher-style quality gate: per-rule flags + combined keep verdict
    Q("t42_gopher_filters", Some(
      """WITH s AS (
        |  SELECT doc_id, text, string_split_regex(trim(text), '\s+') AS w
        |  FROM documents),
        |m AS (SELECT doc_id,
        |  CAST(len(w) AS BIGINT) AS n_words,
        |  round((length(text) - (len(w) - 1)) * 1.0 / len(w), 6) AS mean_word_len,
        |  round(len(list_filter(w, x -> x IN ('the','a','an','and','or','of','to','in','is','it'))) * 1.0
        |        / len(w), 6) AS stop_frac,
        |  round(1.0 - len(list_distinct(w)) * 1.0 / len(w), 6) AS dup_word_frac
        |  FROM s)
        |SELECT doc_id, n_words, mean_word_len, stop_frac, dup_word_frac,
        |  n_words >= 25 AND n_words <= 200 AS len_ok,
        |  mean_word_len >= 3.0 AND mean_word_len <= 12.0 AS mean_len_ok,
        |  stop_frac >= 0.02 AS stop_ok,
        |  dup_word_frac <= 0.55 AS rep_ok,
        |  (n_words >= 25 AND n_words <= 200)
        |    AND (mean_word_len >= 3.0 AND mean_word_len <= 12.0)
        |    AND stop_frac >= 0.02 AND dup_word_frac <= 0.55 AS keep
        |FROM m ORDER BY doc_id""".stripMargin),
      (s, d) => graft.operators.Curation.gopherFilters(docs(s, d))),

    // type-coverage curve (t84): token mass under the top-k vocabulary
    // types — the corpus-measured Zipf head a vocab-size decision
    // reads. Exact integer mass/per-mille + one double share; top-k by
    // (count desc, type) on both engines.
    Q("t84_type_coverage", Some(
      """WITH ty AS MATERIALIZED (
        |  SELECT w, count(*) AS c FROM (
        |    SELECT unnest(string_split_regex(trim(text), '\s+')) AS w
        |    FROM documents)
        |  WHERE len(w) > 0 GROUP BY w),
        |tot AS (SELECT sum(CAST(c AS HUGEINT)) AS tot,
        |          count(*) AS n_types FROM ty),
        |rk AS (SELECT c, row_number() OVER (ORDER BY c DESC, w) AS rn
        |       FROM ty),
        |top AS (SELECT k.k, count(*) AS types_used,
        |          sum(CAST(c AS HUGEINT)) AS mass
        |        FROM (VALUES (1), (4), (16)) k(k)
        |        JOIN rk ON rk.rn <= k.k GROUP BY k.k)
        |SELECT CAST(k AS BIGINT) AS k, n_types, types_used,
        |  CAST(mass AS BIGINT) AS top_mass, CAST(tot AS BIGINT) AS total_tokens,
        |  CAST((mass * 1000 - (mass * 1000) % tot) // tot AS BIGINT)
        |    AS per_mille,
        |  CAST(mass AS DOUBLE) / CAST(tot AS DOUBLE) AS share
        |FROM top, tot ORDER BY k""".stripMargin),
      (s, d) => graft.operators.Curation.typeCoverage(docs(s, d))),

    // PII scan + redaction (t85): per-class counts on the original
    // text and the deterministically-ordered chained redaction — both
    // engines driven by ONE pattern list (Curation.piiPatterns, rule
    // 12). The synthetic corpus is PII-free (counts 0, redacted ≡
    // text — itself a worthwhile no-false-positive assertion at
    // corpus scale); CurationSpec drives real PII through both the
    // counters and the redactor.
    Q("t85_pii_scan", Some(piiScanOracle),
      (s, d) => graft.operators.Curation.piiScan(docs(s, d))),

    // integer bigram surprisal (t86): the CCNet perplexity-proxy
    // quality filter with the LM integerized — per-pair bits are
    // ⌊log₂ c(prev)⌋ − ⌊log₂ c(prev,cur)⌋ via length(bin(n))−1 (the
    // m63 idiom), so both engines replay the score bit-for-bit with no
    // libm anywhere. Oracle builds adjacency positionally off the
    // token array (the t44 range-lateral pattern).
    Q("t86_surprisal", Some(
      """WITH toks AS MATERIALIZED (
        |  SELECT doc_id, unnest(string_split_regex(trim(text), '\s+')) AS w
        |  FROM documents),
        |uni AS MATERIALIZED (SELECT w, count(*) AS c1 FROM toks GROUP BY w),
        |dp AS MATERIALIZED (
        |  SELECT doc_id, arr[CAST(i AS BIGINT)] AS prev,
        |         arr[CAST(i AS BIGINT) + 1] AS cur
        |  FROM (SELECT doc_id,
        |          string_split_regex(trim(text), '\s+') AS arr
        |        FROM documents),
        |       unnest(range(1, CAST(len(arr) AS BIGINT))) AS t(i)),
        |bi AS MATERIALIZED (
        |  SELECT prev, cur, count(*) AS c2 FROM dp GROUP BY prev, cur),
        |per AS (
        |  SELECT d.doc_id, count(*) AS n_bigrams,
        |         CAST(sum((length(bin(u.c1)) - 1)
        |                - (length(bin(b.c2)) - 1)) AS BIGINT) AS sum_bits
        |  FROM dp d
        |  JOIN bi b ON b.prev = d.prev AND b.cur = d.cur
        |  JOIN uni u ON u.w = d.prev
        |  GROUP BY d.doc_id)
        |SELECT doc.doc_id,
        |  COALESCE(p.n_bigrams, 0) AS n_bigrams,
        |  COALESCE(p.sum_bits, 0) AS surprisal_bits,
        |  COALESCE(CAST(p.sum_bits AS DOUBLE) / CAST(p.n_bigrams AS DOUBLE),
        |           0.0e0) AS bits_per_bigram
        |FROM documents doc LEFT JOIN per p USING (doc_id)
        |ORDER BY doc.doc_id""".stripMargin),
      (s, d) => graft.operators.Vocab.surprisal(docs(s, d))),

    // blocklist screening (t82): per-doc whole-word occurrence counts
    // for a keyword list in ONE regex pass + the integer cross-
    // multiplied density flag (rule 17). The pattern interpolates from
    // ONE Scala constant into both engines (rule 12); \w-only terms
    // keep \b semantics identical between Java and RE2 dialects.
    // DuckDB has no regexp_count -> len(regexp_extract_all) (rule 7).
    Q("t82_blocklist", Some(
      s"""SELECT doc_id,
         |  CAST(len(regexp_extract_all(text, '$blockPat')) AS BIGINT)
         |    AS n_hits,
         |  CAST(len(string_split_regex(trim(text), '\\s+')) AS BIGINT)
         |    AS n_tokens,
         |  CAST(len(regexp_extract_all(text, '$blockPat')) AS BIGINT)
         |      * 1000
         |    >= $blockPerMille
         |      * CAST(len(string_split_regex(trim(text), '\\s+')) AS BIGINT)
         |    AS flagged
         |FROM documents ORDER BY doc_id""".stripMargin),
      (s, d) => graft.operators.Curation.blocklistScreen(
        docs(s, d), blockTerms, perMille = blockPerMille)),

    // filter-funnel attrition report (t80): the per-stage survival
    // table a corpus build publishes — language → length → mean-len →
    // stopword → repetition → exact-dedup gates IN ORDER, survivors /
    // removed / attrition / cumulative survival per stage. Gates are
    // t42's exact flags; keeper = min doc_id per canonical fingerprint
    // (d36); one conditional aggregate fanned to 7 stage rows.
    Q("t80_filter_funnel", Some(filterFunnelOracle),
      (s, d) => graft.operators.Curation.filterFunnel(docs(s, d))),

    // tokenizer fertility by language (t81): subword-ish tokens per
    // whitespace word, per language — the table a team reads before
    // committing to a tokenizer (high fertility = that language pays
    // more compute per word; the multilingual-tokenizer-fairness
    // readout of Ács/Petrov-style analyses). Exact int64 sums, one
    // division per row (rule 17); one corpus pass, 5-row output.
    Q("t81_token_fertility", Some(
      """WITH a AS (
        |  SELECT lang, count(*) AS n_docs,
        |    CAST(sum(len(string_split_regex(trim(text), '\s+'))) AS BIGINT)
        |      AS n_words,
        |    CAST(sum(len(regexp_extract_all(text,
        |      '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]'))) AS BIGINT) AS n_bpeish
        |  FROM documents GROUP BY lang)
        |SELECT lang, n_docs, n_words, n_bpeish,
        |  CAST(n_bpeish AS DOUBLE) / CAST(n_words AS DOUBLE) AS fertility
        |FROM a ORDER BY lang""".stripMargin),
      (s, d) => docs(s, d).groupBy(col("lang")).agg(
          count(lit(1)).as("n_docs"),
          sum(tokenCount(col("text")).cast("long")).as("n_words"),
          sum(bpeishTokenCount(col("text")).cast("long")).as("n_bpeish"))
        .select(col("lang"), col("n_docs"), col("n_words"), col("n_bpeish"),
          (col("n_bpeish").cast("double") / col("n_words").cast("double"))
            .as("fertility"))
        .orderBy(col("lang"))),

    // DSIR-style importance weights (Xie et al., NeurIPS 2023): hashed-
    // unigram target-vs-source feature mass per document, target =
    // English docs. Gate runs oracle-hash mode (rolling-hash polynomial,
    // HUGEINT replay); the integer sufficient statistics plus ONE
    // int64/int64 division make the ratio bit-reproducible cross-engine
    // (rule 17) — the log-ratio divergence is documented on the operator.
    Q("t46_dsir_weights", Some(
      s"""WITH words AS (
         |  SELECT doc_id, lang = 'en' AS is_target,
         |         unnest(string_split_regex(trim(text), '\\s+')) AS w
         |  FROM documents),
         |hashed AS (SELECT doc_id, is_target,
         |  (${DedupQueries.polyHashSql("w")}) % 4096 AS f FROM words),
         |feats AS (SELECT f,
         |  sum(CASE WHEN is_target THEN 1 ELSE 0 END) AS tgt_f,
         |  count(*) AS all_f
         |  FROM hashed GROUP BY f),
         |scored AS (SELECT doc_id,
         |  sum(tgt_f + 1) AS tgt_mass,
         |  sum(all_f - tgt_f + 1) AS src_mass
         |  FROM hashed JOIN feats USING (f) GROUP BY doc_id)
         |SELECT doc_id, CAST(tgt_mass AS BIGINT) AS tgt_mass,
         |       CAST(src_mass AS BIGINT) AS src_mass,
         |       CAST(tgt_mass AS DOUBLE) / CAST(src_mass AS DOUBLE) AS ratio
         |FROM scored ORDER BY doc_id""".stripMargin),
      (s, d) => graft.operators.Curation.importanceWeights(
        docs(s, d), col("lang") === "en", oracleHash = true)
        .select(col("doc_id"),
          col("tgt_mass").cast("bigint").as("tgt_mass"),
          col("src_mass").cast("bigint").as("src_mass"),
          col("ratio"))
        .orderBy(col("doc_id"))),

    // Lexicon sentiment scoring (t47 — the SURVEY §7.6 "sentiment-
    // lexicon score" item; distributed-sentiment shape per the Spark
    // sentiment @ EDBT 2016 line): per doc, positive/negative token
    // occurrence counts against the shared lexicons (one definition —
    // the SQL interpolates TextFunctions' lists) and the normalized
    // score as ONE int64/int64 division.
    Q("t47_sentiment", Some(
      s"""WITH s AS (
         |  SELECT doc_id, string_split_regex(trim(text), '\\s+') AS w
         |  FROM documents),
         |c AS (SELECT doc_id,
         |  CAST(len(list_filter(w, x -> x IN (${
            graft.functions.TextFunctions.positiveLexicon
              .map(w => s"'$w'").mkString(", ")}))) AS BIGINT) AS n_pos,
         |  CAST(len(list_filter(w, x -> x IN (${
            graft.functions.TextFunctions.negativeLexicon
              .map(w => s"'$w'").mkString(", ")}))) AS BIGINT) AS n_neg,
         |  CAST(len(w) AS BIGINT) AS n_tokens
         |  FROM s)
         |SELECT doc_id, n_pos, n_neg,
         |       CAST(n_pos - n_neg AS DOUBLE) / CAST(n_tokens AS DOUBLE)
         |         AS sentiment
         |FROM c ORDER BY doc_id""".stripMargin),
      (s, d) => {
        import graft.functions.TextFunctions
        docs(s, d).select(col("doc_id"),
          TextFunctions.positiveCount(col("text")).as("n_pos"),
          TextFunctions.negativeCount(col("text")).as("n_neg"),
          TextFunctions.tokenCount(col("text")).cast("long").as("n_tokens"))
          .select(col("doc_id"), col("n_pos"), col("n_neg"),
            ((col("n_pos") - col("n_neg")).cast("double")
              / col("n_tokens").cast("double")).as("sentiment"))
          .orderBy(col("doc_id"))
      }),

    // Filter-agreement audit (t48): confusion counts + acc/prec/rec/F1/
    // Cohen's kappa of the heuristic quality-score gate (quality >= 0.5)
    // against the Gopher rules — the QA step for swapping one corpus
    // filter for another. Both verdict columns replay t33's and t42's
    // green expressions; all metrics are arithmetic over single
    // int64/int64 divisions (rule 17), with kappa's pe in rate-product
    // form so nothing overflows at any corpus size.
    Q("t48_filter_agreement", Some(
      """WITH s AS (
        |  SELECT doc_id, text, string_split_regex(trim(text), '\s+') AS w
        |  FROM documents),
        |m AS (SELECT doc_id,
        |  CAST(len(w) AS BIGINT) AS n_words,
        |  round((length(text) - (len(w) - 1)) * 1.0 / len(w), 6) AS mean_word_len,
        |  round(len(list_filter(w, x -> x IN ('the','a','an','and','or','of','to','in','is','it'))) * 1.0
        |        / len(w), 6) AS stop_frac,
        |  round(1.0 - len(list_distinct(w)) * 1.0 / len(w), 6) AS dup_word_frac,
        |  round(
        |    least(length(text) / 500.0, 1.0) * 0.4
        |    + least(CAST(len(list_filter(w, x -> x IN ('the','a','an','and','or','of','to','in','is','it'))) AS DOUBLE)
        |        / len(w) * 5.0, 1.0) * 0.4
        |    + (1.0 - least(CAST(len(regexp_extract_all(text, '[.,!?;:]')) AS DOUBLE)
        |        / CAST(greatest(len(w), 1) AS DOUBLE), 1.0)) * 0.2,
        |    6) AS quality
        |  FROM s),
        |v AS (SELECT doc_id, quality >= 0.5 AS p,
        |  (n_words >= 25 AND n_words <= 200)
        |    AND (mean_word_len >= 3.0 AND mean_word_len <= 12.0)
        |    AND stop_frac >= 0.02 AND dup_word_frac <= 0.55 AS g
        |  FROM m),
        |c AS (SELECT
        |  count(CASE WHEN p AND g THEN 1 END) AS tp,
        |  count(CASE WHEN p AND NOT g THEN 1 END) AS fp,
        |  count(CASE WHEN NOT p AND g THEN 1 END) AS fn,
        |  count(CASE WHEN NOT p AND NOT g THEN 1 END) AS tn
        |  FROM v),
        |c2 AS (SELECT tp, fp, fn, tn, tp + fp + fn + tn AS n FROM c),
        |r AS (SELECT tp, fp, fn, tn, n,
        |  CASE WHEN n > 0 THEN CAST(tp + tn AS DOUBLE) / CAST(n AS DOUBLE) END AS acc,
        |  CASE WHEN tp + fp > 0 THEN CAST(tp AS DOUBLE) / CAST(tp + fp AS DOUBLE) END AS prec,
        |  CASE WHEN tp + fn > 0 THEN CAST(tp AS DOUBLE) / CAST(tp + fn AS DOUBLE) END AS rec,
        |  CASE WHEN 2 * tp + fp + fn > 0
        |       THEN CAST(2 * tp AS DOUBLE) / CAST(2 * tp + fp + fn AS DOUBLE) END AS f1,
        |  CASE WHEN n > 0 THEN
        |    (CAST(tp + fp AS DOUBLE) / CAST(n AS DOUBLE))
        |      * (CAST(tp + fn AS DOUBLE) / CAST(n AS DOUBLE))
        |    + (CAST(fn + tn AS DOUBLE) / CAST(n AS DOUBLE))
        |      * (CAST(fp + tn AS DOUBLE) / CAST(n AS DOUBLE)) END AS pe
        |  FROM c2)
        |SELECT tp, fp, fn, tn, n, acc, prec, rec, f1,
        |  CASE WHEN 1.0 - pe <> 0.0 THEN (acc - pe) / (1.0 - pe) END AS kappa
        |FROM r""".stripMargin),
      (s, d) => {
        val ds = docs(s, d)
        val gf = graft.operators.Curation.gopherFilters(ds)
          .select(col("doc_id"), col("keep"))
        val scored = ds.select(col("doc_id"),
          (qualityScore(col("text")) >= 0.5).as("p"))
          .join(gf, Seq("doc_id"))
        graft.operators.Curation.filterAgreement(scored, col("p"), col("keep"))
      }),

    // Vocabulary-growth / Heaps'-law curve (t49): cumulative distinct
    // types vs cumulative tokens in doc_id ingest order, one point per
    // 50 doc ids. Corpus-sized work is two keyed aggregations; the
    // cumulative window runs over the bucket frame only (curve-sized).
    // Explicit ROWS frame on both engines; cumulative sums CAST to
    // BIGINT (DuckDB window sum is HUGEINT — rule 1).
    Q("t49_vocab_growth", Some(
      """WITH words AS (
        |  SELECT doc_id, unnest(string_split_regex(trim(text), '\s+')) AS w
        |  FROM documents),
        |wz AS (SELECT doc_id, w FROM words WHERE w <> ''),
        |tok AS (SELECT doc_id // 50 AS bucket, count(*) AS n_tokens
        |        FROM wz GROUP BY 1),
        |fst AS (SELECT w, min(doc_id) AS first_doc FROM wz GROUP BY w),
        |nt AS (SELECT first_doc // 50 AS bucket, count(*) AS n_new_types
        |       FROM fst GROUP BY 1),
        |j AS (SELECT t.bucket, t.n_tokens,
        |        coalesce(n.n_new_types, 0) AS n_new_types
        |      FROM tok t LEFT JOIN nt n ON n.bucket = t.bucket),
        |c AS (SELECT bucket, n_tokens, n_new_types,
        |  CAST(sum(n_tokens) OVER (ORDER BY bucket
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |    AS tokens_cum,
        |  CAST(sum(n_new_types) OVER (ORDER BY bucket
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |    AS types_cum
        |  FROM j)
        |SELECT bucket, n_tokens, n_new_types, tokens_cum, types_cum,
        |  CAST(types_cum AS DOUBLE) / CAST(tokens_cum AS DOUBLE) AS ttr
        |FROM c ORDER BY bucket""".stripMargin),
      (s, d) => graft.operators.Vocab.vocabGrowth(docs(s, d), bucket = 50L)),

    // Zipf rank-frequency curve (t50) in count-of-counts form: one row
    // per distinct word frequency with its type count, tied-rank
    // interval, and token mass — the full log-log plot without ranking
    // individual words (the rank window runs over the count-of-counts
    // table, O(√tokens) rows; keySkew's scale argument). All integer.
    Q("t50_zipf_curve", Some(
      """WITH words AS (
        |  SELECT unnest(string_split_regex(trim(text), '\s+')) AS w
        |  FROM documents),
        |wc AS (SELECT w, count(*) AS freq FROM words WHERE w <> '' GROUP BY w),
        |cc AS (SELECT freq, count(*) AS n_types FROM wc GROUP BY freq),
        |rk AS (SELECT freq, n_types,
        |  CAST(coalesce(sum(n_types) OVER (ORDER BY freq DESC
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) + 1
        |    AS BIGINT) AS rank_lo
        |  FROM cc)
        |SELECT freq, n_types, rank_lo,
        |       rank_lo + n_types - 1 AS rank_hi,
        |       freq * n_types AS mass
        |FROM rk ORDER BY rank_lo""".stripMargin),
      (s, d) => graft.operators.Vocab.zipfCurve(docs(s, d))),

    // Token-distribution drift (t51): exact-integer total variation
    // distance between the English and non-English slices over 4096
    // hashed-unigram buckets — TVD's single common denominator makes
    // the numerator a plain integer sum (HUGEINT/DECIMAL replay, rule
    // 18) with staged final divisions (rule 17), where PSI/KL would
    // sum per-bucket logs (not oracle-able). Top-50 drifted buckets
    // ranked by the exact numerator; gate runs the rolling-hash
    // oracle mode (rule 12).
    Q("t51_token_drift", Some(tokenDriftOracle),
      (s, d) => graft.operators.Curation.tokenDrift(
        docs(s, d), col("lang") === "en", oracleHash = true)),

    // Drift vs a PERSISTED baseline (t52): the monitoring edition of
    // the store pattern — the settled slice's bucket counts are a
    // prior run's parquet artifact (Staging.driftBaselineDir), only
    // the incoming batch is tokenized. Output is bit-identical to the
    // t51 recompute (coalesced full-outer join ≡ single-pass split),
    // so it shares t51's oracle verbatim; store ≡ recompute is also
    // spec-asserted (CurationSpec "driftAgainstBaseline ≡ tokenDrift").
    Q("t52_drift_vs_baseline", Some(tokenDriftOracle),
      (s, d) => graft.operators.Curation.driftAgainstBaseline(
        s, docs(s, d).filter(col("lang") =!= "en"),
        Staging.driftBaselineDir(s, d), oracleHash = true)),

    // HyperLogLog distinct-shingle sketch (t53): the mergeable
    // cardinality monitor, homegrown so the WHOLE estimate is
    // bit-replayable — registers tracked as max(lowest-set-bit) (a
    // monotone image of max-rho, so no log2 anywhere), the harmonic sum
    // scaled to the exact integer Σ 2^47 DIV P_b, and the single float
    // op is the final alpha·m²·2^48 / S division (constant via dlit).
    // Input is the 3-gram shingle stream (the d38/d40 unit): distinct-
    // shingle cardinality is what sizes an LSH dedup job, and it's the
    // high-cardinality regime where the raw HLL estimate is valid (the
    // corpus vocabulary itself is ~31 words — linear-counting regime,
    // deliberately avoided; see Frequency.hllDistinct). Exact count +
    // relative error ride along, so the sketch's own accuracy is a
    // hash-gated number. Gate runs the rolling-hash oracle mode
    // (rule 12); production default is xxhash64.
    Q("t53_hll_distinct", Some(hllOracle),
      (s, d) => graft.operators.Frequency.hllDistinct(
        s, docs(s, d)
          .select(tokens(col("text")).as("toks"))
          .select(explode(shinglesFromTokens(col("toks"), 3)).as("w")),
        oracleHash = true)),

    // cross-document line dedup (t54): the CCNet/C4 boilerplate pass —
    // any line in ≥2 distinct documents is dropped from every document,
    // survivors reassemble in original order (clean_md5 pins the
    // reassembly, not just counts). Lines here are fixed 10-token
    // chunks (the corpus has no newlines); production splits on '\n' —
    // the operator takes the exploded line frame either way.
    Q("t54_line_dedup", Some(lineDedupOracle),
      (s, d) => graft.operators.Curation.lineDedup(
        graft.operators.Curation.tokenChunkLines(docs(s, d)))),

    // length-aware batching efficiency (q165): padding waste of
    // 32-doc batches in length order vs arrival order, per lang shard
    // — the dynamic-batching payoff as an exact integer (the saving
    // ratio is the one final division). Both orderings replay as
    // partitioned row_number windows.
    Q("q165_batch_padding", Some(
      """WITH base AS (SELECT lang, doc_id, n_chars FROM documents),
        |bs AS (
        |  SELECT lang,
        |    (row_number() OVER (PARTITION BY lang
        |       ORDER BY n_chars, doc_id) - 1) // 32 AS b,
        |    n_chars
        |  FROM base),
        |ps AS (SELECT lang, count(*) * max(n_chars) - sum(n_chars) AS pad
        |       FROM bs GROUP BY lang, b),
        |srt AS (SELECT lang, CAST(sum(pad) AS BIGINT) AS pad_sorted,
        |          CAST(count(*) AS BIGINT) AS n_batches
        |        FROM ps GROUP BY lang),
        |ba AS (
        |  SELECT lang,
        |    (row_number() OVER (PARTITION BY lang ORDER BY doc_id) - 1) // 32
        |      AS b,
        |    n_chars
        |  FROM base),
        |pa AS (SELECT lang, count(*) * max(n_chars) - sum(n_chars) AS pad
        |       FROM ba GROUP BY lang, b),
        |arr AS (SELECT lang, CAST(sum(pad) AS BIGINT) AS pad_arrival
        |        FROM pa GROUP BY lang),
        |cnt AS (SELECT lang, count(*) AS n_docs FROM base GROUP BY lang)
        |SELECT c.lang, c.n_docs, s.n_batches, s.pad_sorted, a.pad_arrival,
        |  CASE WHEN a.pad_arrival = 0 THEN CAST(0 AS DOUBLE)
        |       ELSE CAST(a.pad_arrival - s.pad_sorted AS DOUBLE)
        |         / CAST(a.pad_arrival AS DOUBLE) END AS saving
        |FROM cnt c JOIN srt s ON c.lang = s.lang
        |JOIN arr a ON c.lang = a.lang
        |ORDER BY c.lang""".stripMargin),
      (s, d) => graft.operators.Curation.lengthBatchingEfficiency(
        docs(s, d))),

    // Count-Min sketch (t55): frequency estimates for the exact top-20
    // shingles from 4×1024 integer counters — the mergeable frequency
    // sketch completing the summary family (HLL/MG/Bloom/CMS). The
    // one-sided guarantee (est ≥ exact, always) ships as the
    // hash-gated overcount column. Counters are plain integer sums, so
    // the oracle replays cells, min, everything; rolling-hash oracle
    // mode per rule 12.
    Q("t55_count_min", Some(countMinOracle),
      (s, d) => graft.operators.Frequency.countMinTopK(
        s, docs(s, d)
          .select(tokens(col("text")).as("toks"))
          .select(explode(shinglesFromTokens(col("toks"), 3)).as("w")),
        oracleHash = true)),

    // BM25 lexical retrieval (t56): top-10 documents per query under the
    // Okapi ranking function in exact integer fixed point — the sparse
    // half of the retrieval family (the dense half is s41–s57). The
    // queries are harness-derived (corpus frequency ranks 11..16, 3
    // terms apiece); the idf is the RATIONAL Robertson–Spärck Jones
    // odds (ln dropped — t38's engine-portability decision); every
    // product rides DECIMAL(38,0)/HUGEINT, every quotient fits int64 by
    // construction. See operators/Retrieval.scala for the derivation.
    Q("t56_bm25_topk", Some(bm25Oracle),
      (s, d) => graft.operators.Retrieval.bm25TopKDerived(docs(s, d), 10)),

    // language-ID confusion matrix (t57): the classifier-eval readout
    // for the t32 heuristic against the trusted lang label — exact cell
    // counts, and each diagonal cell's share IS that class's recall.
    // Share is the q150 row-normalization idiom (one int/int divide).
    Q("t57_langid_confusion", Some(
      """WITH m AS (
        |  SELECT doc_id, lang,
        |    len(regexp_extract_all(' '||text||' ', ' the '))+len(regexp_extract_all(' '||text||' ', ' and ')) AS s_en,
        |    len(regexp_extract_all(' '||text||' ', ' le '))+len(regexp_extract_all(' '||text||' ', ' et ')) AS s_fr,
        |    len(regexp_extract_all(' '||text||' ', ' el '))+len(regexp_extract_all(' '||text||' ', ' y ')) AS s_es,
        |    len(regexp_extract_all(' '||text||' ', ' der '))+len(regexp_extract_all(' '||text||' ', ' und ')) AS s_de,
        |    len(regexp_extract_all(' '||text||' ', ' de '))+len(regexp_extract_all(' '||text||' ', ' he ')) AS s_zh
        |  FROM documents),
        |p AS (SELECT lang AS truth,
        |  CASE WHEN greatest(s_en,s_fr,s_es,s_de,s_zh) <= 0 THEN 'und'
        |       WHEN s_en = greatest(s_en,s_fr,s_es,s_de,s_zh) THEN 'en'
        |       WHEN s_fr = greatest(s_en,s_fr,s_es,s_de,s_zh) THEN 'fr'
        |       WHEN s_es = greatest(s_en,s_fr,s_es,s_de,s_zh) THEN 'es'
        |       WHEN s_de = greatest(s_en,s_fr,s_es,s_de,s_zh) THEN 'de'
        |       WHEN s_zh = greatest(s_en,s_fr,s_es,s_de,s_zh) THEN 'zh'
        |       ELSE 'und' END AS pred
        |  FROM m),
        |c AS (SELECT truth, pred, count(*) AS n FROM p GROUP BY 1, 2)
        |SELECT truth, pred, n,
        |       CAST(n AS DOUBLE)
        |         / CAST(sum(n) OVER (PARTITION BY truth) AS DOUBLE)
        |         AS share_of_truth
        |FROM c ORDER BY truth, pred""".stripMargin),
      (s, d) => graft.operators.Profiling.confusionMatrix(
        docs(s, d).select(col("lang"), langId(col("text")).as("pred")),
        truth = "lang", pred = "pred")),

    // Cohen's kappa for the language-ID heuristic (t58): chance-
    // corrected agreement as the SINGLE exact division
    // (A·N − Σrᵢcᵢ)/(N² − Σrᵢcᵢ) — the t57 matrix condensed to one
    // bit-exact statistic. HUGEINT marginal products (rule 18).
    Q("t58_langid_kappa", Some(
      """WITH m AS (
        |  SELECT doc_id, lang,
        |    len(regexp_extract_all(' '||text||' ', ' the '))+len(regexp_extract_all(' '||text||' ', ' and ')) AS s_en,
        |    len(regexp_extract_all(' '||text||' ', ' le '))+len(regexp_extract_all(' '||text||' ', ' et ')) AS s_fr,
        |    len(regexp_extract_all(' '||text||' ', ' el '))+len(regexp_extract_all(' '||text||' ', ' y ')) AS s_es,
        |    len(regexp_extract_all(' '||text||' ', ' der '))+len(regexp_extract_all(' '||text||' ', ' und ')) AS s_de,
        |    len(regexp_extract_all(' '||text||' ', ' de '))+len(regexp_extract_all(' '||text||' ', ' he ')) AS s_zh
        |  FROM documents),
        |p AS (SELECT lang AS truth,
        |  CASE WHEN greatest(s_en,s_fr,s_es,s_de,s_zh) <= 0 THEN 'und'
        |       WHEN s_en = greatest(s_en,s_fr,s_es,s_de,s_zh) THEN 'en'
        |       WHEN s_fr = greatest(s_en,s_fr,s_es,s_de,s_zh) THEN 'fr'
        |       WHEN s_es = greatest(s_en,s_fr,s_es,s_de,s_zh) THEN 'es'
        |       WHEN s_de = greatest(s_en,s_fr,s_es,s_de,s_zh) THEN 'de'
        |       WHEN s_zh = greatest(s_en,s_fr,s_es,s_de,s_zh) THEN 'zh'
        |       ELSE 'und' END AS pred
        |  FROM m),
        |c AS (SELECT truth, pred, count(*) AS n FROM p GROUP BY 1, 2),
        |rm AS (SELECT truth AS k, sum(n) AS r FROM c GROUP BY 1),
        |cm AS (SELECT pred AS k, sum(n) AS cc FROM c GROUP BY 1),
        |rc_sum AS (SELECT sum(rm.r * cm.cc) AS s_rc
        |           FROM rm JOIN cm USING (k)),
        |t AS (SELECT CAST(sum(n) AS BIGINT) AS n_rows,
        |             CAST(sum(CASE WHEN truth = pred THEN n ELSE 0 END)
        |                  AS BIGINT) AS agree
        |      FROM c)
        |SELECT n_rows, agree,
        |       CAST((SELECT s_rc FROM rc_sum) AS BIGINT) AS sum_rc,
        |       CASE WHEN n_rows*n_rows = (SELECT s_rc FROM rc_sum) THEN 0.0e0
        |            ELSE CAST(agree*n_rows - (SELECT s_rc FROM rc_sum)
        |                      AS DOUBLE)
        |               / CAST(n_rows*n_rows - (SELECT s_rc FROM rc_sum)
        |                      AS DOUBLE) END AS kappa
        |FROM t""".stripMargin),
      (s, d) => graft.operators.Profiling.cohenKappa(
        docs(s, d).select(col("lang"), langId(col("text")).as("pred")),
        truth = "lang", pred = "pred")),

    // distributed BPE merge TRAINING (t59): 6 argmax-merge rounds over
    // the distinct-word table, hash-matching the chained-CTE replay
    // (one Scala constant drives both round counts — rule 12's one-
    // definition-two-engines). Plain-replace merge semantics, pinned
    // by spec; support sums HUGEINT→BIGINT (rule 18).
    Q("t59_bpe_train", Some(bpeTrainOracle(bpeRounds)),
      (s, d) => graft.operators.Vocab.bpeTrain(s, docs(s, d), bpeRounds)),

    // BPE ENCODE (t60): apply the t59-trained merge table to every doc —
    // the collected merge list (6 rows, the shipped tokenizer artifact)
    // folds into a replace chain over the exploded word table. Oracle
    // re-derives the SAME merges via the shared CTE chain, then encodes
    // with the identical padded replace. compression = one exact int
    // division (rule 17); sums HUGEINT→BIGINT (rule 18).
    Q("t60_bpe_encode", Some(bpeEncodeOracle(bpeRounds)),
      (s, d) => {
        val m = graft.operators.Vocab.bpeTrain(s, docs(s, d), bpeRounds)
          .collect().map(r => (r.getString(1), r.getString(2))).toSeq
        graft.operators.Vocab.bpeEncode(docs(s, d), m)
      }),

    // adjacent-word collocations by exact lift (t61): Church & Hanks'
    // association ratio with the log dropped (monotone, so the same
    // ranking with one exact division). Margins/total are pair-table
    // sums (HUGEINT→BIGINT, rule 18); top-30 totally ordered by
    // (lift desc, l, r).
    Q("t61_collocations", Some(
      """WITH tk AS (
        |  SELECT string_split_regex(trim(text), '\s+') AS t FROM documents),
        |pr AS (SELECT unnest(list_transform(range(1, len(t)),
        |         i -> {'l': t[i], 'r': t[i+1]})) AS p FROM tk),
        |pc AS (SELECT p.l AS l, p.r AS r, count(*) AS c FROM pr
        |       WHERE p.l <> '' AND p.r <> '' GROUP BY 1, 2),
        |lm AS (SELECT l, CAST(sum(c) AS BIGINT) AS c_l FROM pc GROUP BY 1),
        |rm AS (SELECT r, CAST(sum(c) AS BIGINT) AS c_r FROM pc GROUP BY 1),
        |tot AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM pc)
        |SELECT pc.l, pc.r, CAST(c AS BIGINT) AS c_xy, c_l, c_r,
        |       CAST(c*n AS DOUBLE) / CAST(c_l*c_r AS DOUBLE) AS lift
        |FROM pc JOIN lm USING (l) JOIN rm USING (r) CROSS JOIN tot
        |ORDER BY lift DESC, l, r LIMIT 30""".stripMargin),
      (s, d) => graft.operators.Vocab.collocations(docs(s, d), k = 30)),

    // Cavnar-Trenkle rank-profile language ID (t62): trained top-20
    // char-bigram profiles per language, out-of-place distance, argmin
    // classify — all integer counts/ranks/|diffs| with total tiebreaks,
    // so training AND inference hash-match. Output is the confusion
    // table (the trained counterpart to t57's heuristic eval).
    Q("t62_ct_langid", Some(ctLangOracle(ctTopN)),
      (s, d) => graft.operators.Vocab.ctLangConfusion(docs(s, d), ctTopN)),

    // corpus datasheet (q199): the one-row "Datasheets for Datasets"
    // summary (Gebru et al., CACM 2021) a corpus release ships —
    // volume, vocabulary, language mix, duplication — assembled from
    // exact aggregates with single-division ratios (rule 17). The
    // dup rate uses the canonical-fingerprint groups (the d36 path:
    // cheap and exact; fuzzy rates live in d38/d44's own gates).
    Q("q199_corpus_datasheet", Some(
      """WITH tk AS (
        |  SELECT doc_id, w FROM (
        |    SELECT doc_id, unnest(string_split_regex(trim(text), '\s+')) AS w
        |    FROM documents) WHERE w <> ''),
        |vol AS (SELECT count(*) AS n_tokens,
        |               count(DISTINCT w) AS n_types FROM tk),
        |dv AS (SELECT count(*) AS n_docs,
        |              count(DISTINCT lang) AS n_langs,
        |              count(DISTINCT source) AS n_sources FROM documents),
        |tl AS (SELECT count(*) AS top_lang_docs FROM documents
        |       GROUP BY lang ORDER BY count(*) DESC, lang LIMIT 1),
        |dup AS (SELECT CAST(sum(n - 1) AS BIGINT) AS dup_docs FROM (
        |          SELECT count(*) AS n FROM documents
        |          GROUP BY md5(array_to_string(list_sort(
        |            string_split_regex(trim(text), '\s+')), ' '))))
        |SELECT dv.n_docs, vol.n_tokens, vol.n_types,
        |       CAST(vol.n_tokens AS DOUBLE) / CAST(dv.n_docs AS DOUBLE)
        |         AS mean_doc_tokens,
        |       CAST(vol.n_types AS DOUBLE) / CAST(vol.n_tokens AS DOUBLE)
        |         AS ttr,
        |       dv.n_langs, dv.n_sources,
        |       (SELECT top_lang_docs FROM tl) AS top_lang_docs,
        |       CAST((SELECT top_lang_docs FROM tl) AS DOUBLE)
        |         / CAST(dv.n_docs AS DOUBLE) AS top_lang_share,
        |       dup.dup_docs AS exact_dup_docs,
        |       CAST(dup.dup_docs AS DOUBLE) / CAST(dv.n_docs AS DOUBLE)
        |         AS exact_dup_rate
        |FROM dv CROSS JOIN vol CROSS JOIN dup
        |ORDER BY n_docs""".stripMargin),
      (s, d) => {
        val dd = docs(s, d)
        val tk = dd.select(col("doc_id"),
          explode(graft.functions.TextFunctions.tokens(col("text"))).as("w"))
          .filter(col("w") =!= "")
        val vol = tk.agg(count(lit(1)).as("n_tokens"),
          countDistinct(col("w")).as("n_types"))
        val dv = dd.agg(count(lit(1)).as("n_docs"),
          countDistinct(col("lang")).as("n_langs"),
          countDistinct(col("source")).as("n_sources"))
        val tl = dd.groupBy(col("lang")).agg(count(lit(1)).as("tld"))
          .orderBy(col("tld").desc, col("lang")).limit(1)
          .select(col("tld").as("top_lang_docs"))
        val dup = dd.groupBy(
            graft.functions.TextFunctions.canonicalFingerprint(col("text")))
          .agg(count(lit(1)).as("n"))
          .agg(sum(col("n") - 1).as("dup_docs"))
        dv.crossJoin(broadcast(vol)).crossJoin(broadcast(tl))
          .crossJoin(broadcast(dup))
          .select(col("n_docs"), col("n_tokens"), col("n_types"),
            (col("n_tokens").cast("double") / col("n_docs").cast("double"))
              .as("mean_doc_tokens"),
            (col("n_types").cast("double") / col("n_tokens").cast("double"))
              .as("ttr"),
            col("n_langs"), col("n_sources"), col("top_lang_docs"),
            (col("top_lang_docs").cast("double") / col("n_docs").cast("double"))
              .as("top_lang_share"),
            col("dup_docs").cast("bigint").as("exact_dup_docs"),
            (col("dup_docs").cast("double") / col("n_docs").cast("double"))
              .as("exact_dup_rate"))
          .orderBy(col("n_docs"))
      }),

    // distributional outlier docs (t64): per-doc TVD to the corpus
    // unigram distribution — q192's integer-TVD idiom at text scale,
    // grid-free (absent-word mass closes in one product because
    // Σ g_w = N). tvd is one division; the outlier verdict is the
    // cross-multiplied theorem 5·scaled > 4·n_d·N (t = 2/5).
    Q("t64_token_tvd", Some(
      """WITH tk AS (
        |  SELECT doc_id, w FROM (
        |    SELECT doc_id, unnest(string_split_regex(trim(text), '\s+')) AS w
        |    FROM documents) WHERE w <> ''),
        |dw AS (SELECT doc_id, w, count(*) AS c FROM tk GROUP BY 1, 2),
        |g AS (SELECT w, count(*) AS gw FROM tk GROUP BY 1),
        |nd AS (SELECT doc_id, count(*) AS n FROM tk GROUP BY 1),
        |tot AS (SELECT count(*) AS nn FROM tk),
        |s AS (SELECT d.doc_id, nd.n, t.nn,
        |             sum(abs(d.c*t.nn - g.gw*nd.n) - g.gw*nd.n) AS partial
        |      FROM dw d JOIN g USING (w)
        |      JOIN nd ON nd.doc_id = d.doc_id CROSS JOIN tot t
        |      GROUP BY 1, 2, 3)
        |SELECT doc_id, n AS n_tokens,
        |       CAST(partial + n*nn AS BIGINT) AS tvd_scaled,
        |       CAST(partial + n*nn AS DOUBLE)
        |         / CAST(2*n*nn AS DOUBLE) AS tvd,
        |       5*(partial + n*nn) > 4*n*nn AS is_outlier
        |FROM s ORDER BY doc_id""".stripMargin),
      (s, d) => graft.operators.Curation.tokenDistributionOutliers(
        docs(s, d), tNum = 2L, tDen = 5L)),

    // TextRank keywords (t63): q148's integer fixed-point PageRank
    // re-targeted to the word co-occurrence graph; oracle replays the
    // identical floor-arithmetic rounds from the shared scale/teleport
    // constants. Total-order top-20 by (pr desc, word).
    Q("t63_textrank", Some(textRankOracle),
      (s, d) => graft.operators.Vocab.textRank(docs(s, d), k = 20)),

    // exact two-sample KS distance (t66): max CDF gap between src0 and
    // src1's n_chars distributions as an integer rational max (decimal
    // products, one division at the output) — shape-sensitive drift
    // where t64's TVD sees hashed token mass. Support-sized windows.
    Q("t66_ks_drift", Some(
      """WITH base AS (
        |  SELECT source AS g, n_chars AS x FROM documents
        |  WHERE source IN ('src0', 'src1')),
        |hist AS (
        |  SELECT x, sum(CASE WHEN g = 'src0' THEN 1 ELSE 0 END) AS ca,
        |         sum(CASE WHEN g = 'src1' THEN 1 ELSE 0 END) AS cb
        |  FROM base GROUP BY x),
        |cum AS (
        |  SELECT x, sum(ca) OVER (ORDER BY x) AS fa,
        |         sum(cb) OVER (ORDER BY x) AS fb FROM hist),
        |tot AS (
        |  SELECT sum(CASE WHEN g = 'src0' THEN 1 ELSE 0 END) AS na,
        |         sum(CASE WHEN g = 'src1' THEN 1 ELSE 0 END) AS nb
        |  FROM base)
        |SELECT CAST(t.na AS BIGINT) AS na, CAST(t.nb AS BIGINT) AS nb,
        |       CAST(max(abs(c.fa * t.nb - c.fb * t.na)) AS DOUBLE) AS d_num,
        |       CAST(max(abs(c.fa * t.nb - c.fb * t.na)) AS DOUBLE)
        |         / CAST(t.na * t.nb AS DOUBLE) AS ks_d
        |FROM cum c, tot t GROUP BY t.na, t.nb""".stripMargin),
      (s, d) => graft.operators.Curation.ksStatistic(
        docs(s, d), col("source"), col("n_chars"), "src0", "src1")),

    // Pearson χ² homogeneity of the lang × source contingency (t67):
    // zero cells included, exact decimal inner differences, per-cell
    // double terms summed by the rule-3 SEQUENTIAL fold over the
    // (lang, source)-sorted cell list — DuckDB replays with an ordered
    // list_sum. The categorical drift test beside t66's shape test.
    Q("t67_chi_square", Some(chiSquareLangSourceSql),
      (s, d) => graft.operators.Curation.chiSquareHomogeneity(
        docs(s, d), col("lang"), col("source"))),

    // exact Mann–Whitney U / AUC effect size (t68): tie-corrected
    // doubled mid-ranks by count-of-counts — the stochastic-dominance
    // sibling of t66's KS. All-integer until the two output divisions.
    Q("t68_mann_whitney", Some(
      """WITH base AS (
        |  SELECT source AS g, n_chars AS x FROM documents
        |  WHERE source IN ('src0', 'src1')),
        |hist AS (
        |  SELECT x, sum(CASE WHEN g = 'src0' THEN 1 ELSE 0 END) AS ca,
        |         sum(CASE WHEN g = 'src1' THEN 1 ELSE 0 END) AS cb
        |  FROM base GROUP BY x),
        |cum AS (
        |  SELECT ca, ca + cb AS c,
        |         coalesce(sum(ca + cb) OVER (ORDER BY x
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |           AS bfr
        |  FROM hist),
        |tot AS (
        |  SELECT sum(CASE WHEN g = 'src0' THEN 1 ELSE 0 END) AS na,
        |         sum(CASE WHEN g = 'src1' THEN 1 ELSE 0 END) AS nb
        |  FROM base),
        |r AS (SELECT sum(CAST(ca AS HUGEINT) * (2 * bfr + c + 1)) AS r2
        |      FROM cum)
        |SELECT CAST(t.na AS BIGINT) AS na, CAST(t.nb AS BIGINT) AS nb,
        |       CAST(r.r2 - CAST(t.na AS HUGEINT) * (t.na + 1) AS DOUBLE)
        |         AS u2_a,
        |       CAST(r.r2 - CAST(t.na AS HUGEINT) * (t.na + 1) AS DOUBLE)
        |         / CAST(2 * CAST(t.na AS HUGEINT) * t.nb AS DOUBLE) AS auc
        |FROM r, tot t""".stripMargin),
      (s, d) => graft.operators.Curation.mannWhitney(
        docs(s, d), col("source"), col("n_chars"), "src0", "src1")),

    // exact quantile normalization (t69): map src1's n_chars
    // distribution onto src0's by integer cross-multiplied rank lookup
    // — no division anywhere; the corpus length-matching primitive.
    Q("t69_quantile_norm", Some(
      """WITH base AS (
        |  SELECT source AS g, n_chars AS x FROM documents
        |  WHERE source IN ('src0', 'src1')),
        |ca AS (SELECT x AS y, sum(c) OVER (ORDER BY x) AS fa
        |       FROM (SELECT x, count(*) AS c FROM base
        |             WHERE g = 'src0' GROUP BY x)),
        |cb AS (SELECT x, sum(c) OVER (ORDER BY x) AS fb
        |       FROM (SELECT x, count(*) AS c FROM base
        |             WHERE g = 'src1' GROUP BY x)),
        |tot AS (
        |  SELECT sum(CASE WHEN g = 'src0' THEN 1 ELSE 0 END) AS na,
        |         sum(CASE WHEN g = 'src1' THEN 1 ELSE 0 END) AS nb
        |  FROM base)
        |SELECT b.x, CAST(b.fb AS BIGINT) AS cum_b,
        |       CAST(min(a.y) AS BIGINT) AS mapped
        |FROM cb b CROSS JOIN tot t
        |JOIN ca a ON a.fa * t.nb >= b.fb * t.na
        |GROUP BY b.x, b.fb ORDER BY b.x""".stripMargin),
      (s, d) => graft.operators.Curation.quantileNormalize(
        docs(s, d), col("source"), col("n_chars"), "src0", "src1")),

    // Welch's unequal-variance t (t70): the mean-shift member of the
    // drift family (t66 shape / t68 dominance / t67 categorical) —
    // exact decimal sufficient statistics (n, Σx, Σx²), then one fixed
    // double DAG mirrored op-for-op by the oracle (the q133 contract).
    Q("t70_welch_ttest", Some(welchOracle),
      (s, d) => graft.operators.Curation.welchT(
        docs(s, d), col("source"), col("n_chars"), "src0", "src1")),

    // Cramér's V (t71): the size-free association strength √(χ²/(n·
    // min(r−1,c−1))) over the lang × source contingency — χ² grows
    // with n even at fixed association; V is the thresholdable number.
    Q("t71_cramers_v", Some(
      s"""SELECT n, n_rows, n_cols, chi2,
         |  sqrt(chi2 / (CAST(n AS DOUBLE)
         |    * CAST(least(n_rows - 1, n_cols - 1) AS DOUBLE))) AS v
         |FROM ($chiSquareLangSourceSql)""".stripMargin),
      (s, d) => graft.operators.Curation.cramersV(
        docs(s, d), col("lang"), col("source"))),

    // shuffle-quality audit (q208): lag-1 same-source adjacency in the
    // modular-permutation order vs the exact uniform-permutation
    // expectation Σc(c−1)/n — residual clumping in a training
    // curriculum shows ratio ≫ 1. Ranks via Prefix.cumsum (no global
    // window at any cardinality), adjacency one equi-join on rank+1.
    Q("q208_shuffle_audit", Some(shuffleAuditOracle),
      (s, d) => graft.operators.Curation.shuffleAudit(
        docs(s, d), col("doc_id"), col("source"))),

    // calibration report (t72): reliability diagram of the t33 quality
    // score against a long-doc outcome — per-bin counts exact, rates
    // and midpoints single divisions, no double ever summed (rule 3).
    // The diagnostic a pipeline reads before thresholding a filter.
    Q("t72_calibration", Some(
      s"""WITH s AS (SELECT $qualityExprSql AS score,
         |            n_chars >= 300 AS y FROM documents),
         |b AS (SELECT least(CAST(floor(score * 10) AS BIGINT), 9) AS bucket,
         |             CASE WHEN y THEN 1 ELSE 0 END AS yi FROM s)
         |SELECT bucket, count(*) AS n, CAST(sum(yi) AS BIGINT) AS n_pos,
         |  CAST(sum(yi) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS obs_rate,
         |  (CAST(bucket AS DOUBLE) + 0.5) / 10.0 AS conf_mid,
         |  abs(CAST(sum(yi) AS DOUBLE) / CAST(count(*) AS DOUBLE)
         |      - (CAST(bucket AS DOUBLE) + 0.5) / 10.0) AS gap
         |FROM b GROUP BY bucket ORDER BY bucket""".stripMargin),
      (s, d) => graft.operators.Curation.calibrationReport(
        docs(s, d), graft.functions.TextFunctions.qualityScore(col("text")),
        col("n_chars") >= 300)),

    // Spearman rank correlation (t73): does char length track token
    // count? Tie-corrected via t68's doubled mid-ranks (all integer),
    // exact decimal sufficient statistics over the JOINT support, one
    // double DAG at the output (the t70 contract). Marginal ranks come
    // from Prefix.cumsum — no global window at any cardinality; the
    // oracle keeps plain windows (exact decomposition, rule 23).
    Q("t73_spearman", Some(
      """WITH base AS (
        |  SELECT n_chars AS x,
        |         len(string_split_regex(trim(text), '\s+')) AS y
        |  FROM documents),
        |joint AS MATERIALIZED (
        |  SELECT x, y, count(*) AS c FROM base GROUP BY x, y),
        |mx AS (
        |  SELECT x, 2 * bx + ck + 1 AS rx FROM (
        |    SELECT x, ck, coalesce(sum(ck) OVER (ORDER BY x
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS bx
        |    FROM (SELECT x, sum(c) AS ck FROM joint GROUP BY x))),
        |my AS (
        |  SELECT y, 2 * b_y + ck + 1 AS ry FROM (
        |    SELECT y, ck, coalesce(sum(ck) OVER (ORDER BY y
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS b_y
        |    FROM (SELECT y, sum(c) AS ck FROM joint GROUP BY y))),
        |m AS (
        |  SELECT sum(c) AS n,
        |         sum(CAST(c AS HUGEINT) * rx) AS sx,
        |         sum(CAST(c AS HUGEINT) * ry) AS sy,
        |         sum(CAST(c AS HUGEINT) * rx * rx) AS sxx,
        |         sum(CAST(c AS HUGEINT) * ry * ry) AS syy,
        |         sum(CAST(c AS HUGEINT) * rx * ry) AS sxy
        |  FROM joint JOIN mx USING (x) JOIN my USING (y))
        |SELECT CAST(n AS BIGINT) AS n,
        |  (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
        |     - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
        |  / sqrt((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
        |       - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
        |     * (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
        |       - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))) AS rho
        |FROM m""".stripMargin),
      (s, d) => graft.operators.Curation.spearman(
        docs(s, d), col("n_chars"), tokenCount(col("text")))),

    // Kendall τ-b (t74): the concordant/discordant-PAIR companion of
    // t73 — all-pairs counting on the joint support only (a domain-
    // bounded support×support inequality join, the t69 contract), tie
    // terms as doubled decimal-exact margins, one double DAG output.
    Q("t74_kendall", Some(
      """WITH base AS (
        |  SELECT n_chars AS x,
        |         len(string_split_regex(trim(text), '\s+')) AS y
        |  FROM documents),
        |joint AS MATERIALIZED (
        |  SELECT x, y, count(*) AS c FROM base GROUP BY x, y),
        |cd AS (
        |  SELECT
        |    coalesce(sum(CASE WHEN a.y < b.y
        |      THEN CAST(a.c AS HUGEINT) * b.c END), 0) AS conc,
        |    coalesce(sum(CASE WHEN a.y > b.y
        |      THEN CAST(a.c AS HUGEINT) * b.c END), 0) AS disc
        |  FROM joint a JOIN joint b ON a.x < b.x),
        |t1 AS (SELECT coalesce(sum(CAST(ck AS HUGEINT) * (ck - 1)), 0) AS t1
        |       FROM (SELECT sum(c) AS ck FROM joint GROUP BY x)),
        |t2 AS (SELECT coalesce(sum(CAST(ck AS HUGEINT) * (ck - 1)), 0) AS t2
        |       FROM (SELECT sum(c) AS ck FROM joint GROUP BY y)),
        |tot AS (SELECT n, CAST(n AS HUGEINT) * (n - 1) AS t0
        |        FROM (SELECT sum(c) AS n FROM joint))
        |SELECT CAST(n AS BIGINT) AS n,
        |  CAST(conc AS DOUBLE) AS conc, CAST(disc AS DOUBLE) AS disc,
        |  2.0 * CAST(conc - disc AS DOUBLE)
        |    / sqrt(CAST(t0 - t1 AS DOUBLE) * CAST(t0 - t2 AS DOUBLE))
        |    AS tau_b
        |FROM cd, tot, t1, t2""".stripMargin),
      (s, d) => graft.operators.Curation.kendallTau(
        docs(s, d), col("n_chars"), tokenCount(col("text")))),

    // FORCAST readability (t75): grade = 20 − 15·(monosyllables/words),
    // the standard readability index needing NO sentence segmentation
    // (this corpus has none) — syllables estimated as vowel-group runs.
    // Integer counts, one mirrored double DAG; n_words ≥ 1 always
    // (split of a trimmed string is never empty), so no zero divisor.
    Q("t75_readability", Some(
      """SELECT doc_id,
        |  CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT)
        |    AS n_words,
        |  CAST(len(list_filter(string_split_regex(trim(text), '\s+'),
        |    w -> len(regexp_extract_all(w, '[aeiouyAEIOUY]+')) = 1))
        |    AS BIGINT) AS n_mono,
        |  20.0 - 15.0 * (
        |    CAST(len(list_filter(string_split_regex(trim(text), '\s+'),
        |      w -> len(regexp_extract_all(w, '[aeiouyAEIOUY]+')) = 1))
        |      AS DOUBLE)
        |    / CAST(len(string_split_regex(trim(text), '\s+')) AS DOUBLE))
        |    AS forcast_grade
        |FROM documents ORDER BY doc_id""".stripMargin),
      (s, d) => docs(s, d).select(col("doc_id"),
        tokenCount(col("text")).cast("bigint").as("n_words"),
        monosyllableCount(col("text")).cast("bigint").as("n_mono"),
        (lit(20.0) - lit(15.0) *
          (monosyllableCount(col("text")).cast("double") /
            tokenCount(col("text")).cast("double"))).as("forcast_grade"))
        .orderBy(col("doc_id"))),

    // word burstiness (t76): variance-to-mean ratio of per-doc counts
    // over ALL docs (zeros closed in one product because Σc and Σc² are
    // corpus sums — Church & Gale, 1995) — content words clump (VMR ≫
    // 1), function words spread (VMR ≈ 1). Exact decimal moments, one
    // double DAG, top-20 by (vmr desc, word) via orderBy+limit.
    Q("t76_burstiness", Some(
      """WITH tok AS (
        |  SELECT doc_id, unnest(string_split_regex(trim(text), '\s+')) AS w
        |  FROM documents),
        |tf AS (SELECT doc_id, w, count(*) AS c FROM tok
        |       WHERE w <> '' GROUP BY 1, 2),
        |nn AS (SELECT count(*) AS n FROM documents),
        |st AS (SELECT w, sum(c) AS t, sum(CAST(c AS HUGEINT) * c) AS sq
        |       FROM tf GROUP BY w HAVING sum(c) >= 50)
        |SELECT w AS word, CAST(t AS BIGINT) AS n_occ,
        |  (CAST(sq AS DOUBLE)
        |     - CAST(t AS DOUBLE) * CAST(t AS DOUBLE) / CAST(n AS DOUBLE))
        |    / CAST(t AS DOUBLE) AS vmr
        |FROM st, nn
        |ORDER BY vmr DESC, word LIMIT 20""".stripMargin),
      (s, d) => {
        val tf = docs(s, d)
          .repartition(col("doc_id")) // row-amplifying explode (rule 6)
          .select(col("doc_id"), explode(tokens(col("text"))).as("w"))
          .filter(col("w") =!= "")
          .groupBy(col("doc_id"), col("w")).agg(count(lit(1)).as("c"))
        val n = docs(s, d).agg(count(lit(1)).as("n"))
        tf.groupBy(col("w"))
          .agg(sum(col("c")).as("t"),
            sum(col("c").cast("decimal(38,0)") * col("c")).as("sq"))
          .filter(col("t") >= 50)
          .crossJoin(broadcast(n)) // 1-row normalizer
          .select(col("w").as("word"), col("t").cast("bigint").as("n_occ"),
            ((col("sq").cast("double") -
              col("t").cast("double") * col("t").cast("double") /
                col("n").cast("double")) /
              col("t").cast("double")).as("vmr"))
          .orderBy(col("vmr").desc, col("word")).limit(20)
      }),

    // self-BLEU-style corpus overlap precision (t77): per doc and
    // n-gram order (2, 3), the clipped modified precision against the
    // REST of the corpus — Σ min(c_doc, c_corpus − c_doc) over the
    // doc's grams / the doc's gram count. The Texygen diversity
    // readout as exact integer num/den plus one division (rule 17);
    // no geometric mean, so no float summation. Gate runs exact gram
    // STRINGS (count contract is hash-free); production shuffles
    // 8-byte xxhash64 keys instead, under CurationSpec.
    Q("t77_self_bleu", Some(
      """WITH t AS MATERIALIZED (
        |  SELECT doc_id, string_split_regex(trim(text), '\s+') AS w
        |  FROM documents),
        |g2 AS (SELECT doc_id, g FROM (
        |    SELECT doc_id, unnest(list_transform(
        |      range(1, greatest(len(w) - 2, 0) + 2),
        |      i -> array_to_string(w[i:i+1], ' '))) AS g FROM t)
        |  WHERE g <> ''),
        |dc2 AS MATERIALIZED (
        |  SELECT doc_id, g, count(*) AS cd FROM g2 GROUP BY 1, 2),
        |cc2 AS (SELECT g, sum(cd) AS ct FROM dc2 GROUP BY g),
        |a2 AS (SELECT dc2.doc_id,
        |         CAST(sum(least(cd, ct - cd)) AS BIGINT) AS num2,
        |         CAST(sum(cd) AS BIGINT) AS den2
        |       FROM dc2 JOIN cc2 USING (g) GROUP BY 1),
        |g3 AS (SELECT doc_id, g FROM (
        |    SELECT doc_id, unnest(list_transform(
        |      range(1, greatest(len(w) - 3, 0) + 2),
        |      i -> array_to_string(w[i:i+2], ' '))) AS g FROM t)
        |  WHERE g <> ''),
        |dc3 AS MATERIALIZED (
        |  SELECT doc_id, g, count(*) AS cd FROM g3 GROUP BY 1, 2),
        |cc3 AS (SELECT g, sum(cd) AS ct FROM dc3 GROUP BY g),
        |a3 AS (SELECT dc3.doc_id,
        |         CAST(sum(least(cd, ct - cd)) AS BIGINT) AS num3,
        |         CAST(sum(cd) AS BIGINT) AS den3
        |       FROM dc3 JOIN cc3 USING (g) GROUP BY 1)
        |SELECT a2.doc_id, num2, den2,
        |  CAST(num2 AS DOUBLE) / CAST(den2 AS DOUBLE) AS p2,
        |  num3, den3,
        |  CAST(num3 AS DOUBLE) / CAST(den3 AS DOUBLE) AS p3
        |FROM a2 JOIN a3 ON a2.doc_id = a3.doc_id
        |ORDER BY a2.doc_id""".stripMargin),
      (s, d) => graft.operators.Curation.selfOverlapPrecision(
        docs(s, d), hashGrams = false)),

    // exact phrase search (t78): positional inverted index + adjacency
    // intersection (IIR §2.4) — the serving-side counterpart of t56's
    // BM25. One postings explode, m−1 keyed joins per phrase, per-
    // phrase totals + top-3 docs. Oracle is GENERATED from the same
    // Retrieval.phraseQueries constants (rule 12).
    Q("t78_phrase_search", Some(phraseSearchOracle),
      (s, d) => graft.operators.Retrieval.phraseSearch(docs(s, d))),

    // split-drift report (q207): the "did my split skew anything" check
    // a pipeline runs right after q86's hash split — KS distance and
    // Mann–Whitney AUC on length, χ² on language, all between the
    // train/test assignments, one (metric, value) row each. Pure
    // composition of t66/t67/t68's operators with the q134 split
    // expression; a clean split shows D≈0, AUC≈0.5, small χ².
    Q("q207_split_drift", Some(splitDriftOracle),
      (s, d) => {
        import graft.operators.{Curation, Sampling}
        val split = when(Sampling.hashBucket(col("doc_id"), 100) < 80, "train")
          .when(Sampling.hashBucket(col("doc_id"), 100) < 90, "val")
          .otherwise("test")
        val base = docs(s, d)
          .select(split.as("g"), col("n_chars"), col("lang"))
        val ks = Curation
          .ksStatistic(base, col("g"), col("n_chars"), "train", "test")
          .select(lit("ks_n_chars").as("metric"), col("ks_d").as("value"))
        val mw = Curation
          .mannWhitney(base, col("g"), col("n_chars"), "train", "test")
          .select(lit("auc_n_chars").as("metric"), col("auc").as("value"))
        val chi = Curation.chiSquareHomogeneity(
            base.filter(col("g").isin("train", "test")),
            col("g"), col("lang"))
          .select(lit("chi2_lang").as("metric"), col("chi2").as("value"))
        ks.unionByName(mw).unionByName(chi).orderBy(col("metric"))
      })
  )

  /** q207: the t66/t68/t67 SQL shapes over the q134 split expression,
    * unioned to (metric, value) rows. */
  private lazy val splitDriftOracle: String =
    s"""WITH sbase AS (
       |  SELECT CASE WHEN (doc_id * 104729) % 100 < 80 THEN 'train'
       |              WHEN (doc_id * 104729) % 100 < 90 THEN 'val'
       |              ELSE 'test' END AS g, n_chars AS x, lang
       |  FROM documents),
       |bt AS MATERIALIZED (SELECT * FROM sbase WHERE g IN ('train', 'test')),
       |hist AS MATERIALIZED (
       |  SELECT x, sum(CASE WHEN g = 'train' THEN 1 ELSE 0 END) AS ca,
       |         sum(CASE WHEN g = 'test' THEN 1 ELSE 0 END) AS cb
       |  FROM bt GROUP BY x),
       |cum AS (SELECT x, sum(ca) OVER (ORDER BY x) AS fa,
       |               sum(cb) OVER (ORDER BY x) AS fb FROM hist),
       |tot AS MATERIALIZED (
       |  SELECT sum(CASE WHEN g = 'train' THEN 1 ELSE 0 END) AS na,
       |         sum(CASE WHEN g = 'test' THEN 1 ELSE 0 END) AS nb
       |  FROM bt),
       |ks AS (
       |  SELECT 'ks_n_chars' AS metric,
       |         CAST(max(abs(c.fa * t.nb - c.fb * t.na)) AS DOUBLE)
       |           / CAST(t.na * t.nb AS DOUBLE) AS value
       |  FROM cum c, tot t GROUP BY t.na, t.nb),
       |cum2 AS (
       |  SELECT ca, ca + cb AS c,
       |         coalesce(sum(ca + cb) OVER (ORDER BY x
       |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
       |           AS bfr
       |  FROM hist),
       |mw AS (
       |  SELECT 'auc_n_chars' AS metric,
       |         CAST(r.r2 - CAST(t.na AS HUGEINT) * (t.na + 1) AS DOUBLE)
       |           / CAST(2 * CAST(t.na AS HUGEINT) * t.nb AS DOUBLE) AS value
       |  FROM (SELECT sum(CAST(ca AS HUGEINT) * (2 * bfr + c + 1)) AS r2
       |        FROM cum2) r, tot t),
       |cells AS (SELECT g AS r, lang AS c2, count(*) AS o
       |          FROM bt GROUP BY 1, 2),
       |crs AS (SELECT r, sum(o) AS rsum FROM cells GROUP BY r),
       |ccs AS (SELECT c2, sum(o) AS csum FROM cells GROUP BY c2),
       |ctot AS (SELECT sum(o) AS n, count(DISTINCT r) AS nr,
       |                count(DISTINCT c2) AS nc FROM cells),
       |cfl AS (
       |  SELECT crs.r, ccs.c2, crs.rsum, ccs.csum, coalesce(cells.o, 0) AS o
       |  FROM crs CROSS JOIN ccs
       |  LEFT JOIN cells ON cells.r = crs.r AND cells.c2 = ccs.c2),
       |cterms AS (
       |  SELECT f.r, f.c2, t.n, t.nr, t.nc,
       |         CAST(CAST(f.o AS HUGEINT) * t.n - CAST(f.rsum AS HUGEINT) * f.csum AS DOUBLE)
       |       * CAST(CAST(f.o AS HUGEINT) * t.n - CAST(f.rsum AS HUGEINT) * f.csum AS DOUBLE)
       |       / CAST(CAST(t.n AS HUGEINT) * f.rsum * f.csum AS DOUBLE) AS term
       |  FROM cfl f CROSS JOIN ctot t),
       |chi AS (
       |  SELECT 'chi2_lang' AS metric,
       |         list_sum(list_transform(list({'r': r, 'c': c2, 't': term}
       |                    ORDER BY r, c2), x -> x.t)) AS value
       |  FROM cterms GROUP BY n, nr, nc)
       |SELECT metric, value FROM (
       |  SELECT * FROM ks UNION ALL SELECT * FROM mw
       |  UNION ALL SELECT * FROM chi)
       |ORDER BY metric""".stripMargin

  /** t63 oracle: the word graph, replayable dense word ids, and the
    * q148-style generated PR iteration CTEs from the SAME constants. */
  /** The TextFunctions.qualityScore replay — factored so t33 and the
    * t72 calibration report share one definition (rule 12). */
  private lazy val qualityExprSql: String =
    """round(
      |    least(length(text) / 500.0, 1.0) * 0.4
      |    + least(CAST(len(list_filter(string_split_regex(trim(text), '\s+'),
      |          x -> x IN ('the','a','an','and','or','of','to','in','is','it'))) AS DOUBLE)
      |        / len(string_split_regex(trim(text), '\s+')) * 5.0, 1.0) * 0.4
      |    + (1.0 - least(CAST(len(regexp_extract_all(text, '[.,!?;:]')) AS DOUBLE)
      |        / CAST(greatest(len(string_split_regex(trim(text), '\s+')), 1) AS DOUBLE), 1.0)) * 0.2,
      |    6)""".stripMargin

  /** t67 + t71: the zero-cell-complete χ² replay over lang × source,
    * factored so Cramér's V wraps the identical statistic. */
  private lazy val chiSquareLangSourceSql: String =
    """WITH cells AS MATERIALIZED (
      |  SELECT lang AS r, source AS c, count(*) AS o
      |  FROM documents GROUP BY 1, 2),
      |rs AS (SELECT r, sum(o) AS rsum FROM cells GROUP BY r),
      |cs AS (SELECT c, sum(o) AS csum FROM cells GROUP BY c),
      |tot AS (SELECT sum(o) AS n, count(DISTINCT r) AS nr,
      |               count(DISTINCT c) AS nc FROM cells),
      |fl AS (
      |  SELECT rs.r, cs.c, rs.rsum, cs.csum, coalesce(cells.o, 0) AS o
      |  FROM rs CROSS JOIN cs
      |  LEFT JOIN cells ON cells.r = rs.r AND cells.c = cs.c),
      |terms AS (
      |  SELECT f.r, f.c, t.n, t.nr, t.nc,
      |         CAST(CAST(f.o AS HUGEINT) * t.n - CAST(f.rsum AS HUGEINT) * f.csum AS DOUBLE)
      |       * CAST(CAST(f.o AS HUGEINT) * t.n - CAST(f.rsum AS HUGEINT) * f.csum AS DOUBLE)
      |       / CAST(CAST(t.n AS HUGEINT) * f.rsum * f.csum AS DOUBLE) AS term
      |  FROM fl f CROSS JOIN tot t)
      |SELECT CAST(n AS BIGINT) AS n, CAST(nr AS BIGINT) AS n_rows,
      |       CAST(nc AS BIGINT) AS n_cols,
      |       CAST((nr - 1) * (nc - 1) AS BIGINT) AS dof,
      |       list_sum(list_transform(list({'r': r, 'c': c, 't': term}
      |                  ORDER BY r, c), x -> x.t)) AS chi2
      |FROM terms GROUP BY n, nr, nc""".stripMargin

  /** t70: the Welch DAG replay — exact HUGEINT sufficient statistics,
    * then the same double operations Curation.welchT applies, step for
    * step (mean → var → se² → t, dof). */
  private lazy val welchOracle: String =
    """WITH base AS (
      |  SELECT source AS g, n_chars AS x FROM documents
      |  WHERE source IN ('src0', 'src1')),
      |m AS (
      |  SELECT sum(CASE WHEN g = 'src0' THEN 1 ELSE 0 END) AS na,
      |         sum(CASE WHEN g = 'src1' THEN 1 ELSE 0 END) AS nb,
      |         sum(CASE WHEN g = 'src0' THEN CAST(x AS HUGEINT) ELSE 0 END) AS sa,
      |         sum(CASE WHEN g = 'src1' THEN CAST(x AS HUGEINT) ELSE 0 END) AS sb,
      |         sum(CASE WHEN g = 'src0' THEN CAST(x AS HUGEINT) * x ELSE 0 END) AS qa,
      |         sum(CASE WHEN g = 'src1' THEN CAST(x AS HUGEINT) * x ELSE 0 END) AS qb
      |  FROM base),
      |v AS (
      |  SELECT CAST(na AS BIGINT) AS na, CAST(nb AS BIGINT) AS nb,
      |    CAST(sa AS DOUBLE) / CAST(na AS DOUBLE) AS mean_a,
      |    CAST(sb AS DOUBLE) / CAST(nb AS DOUBLE) AS mean_b,
      |    (CAST(qa AS DOUBLE) - CAST(sa AS DOUBLE) * CAST(sa AS DOUBLE)
      |       / CAST(na AS DOUBLE)) / (CAST(na AS DOUBLE) - 1) AS var_a,
      |    (CAST(qb AS DOUBLE) - CAST(sb AS DOUBLE) * CAST(sb AS DOUBLE)
      |       / CAST(nb AS DOUBLE)) / (CAST(nb AS DOUBLE) - 1) AS var_b
      |  FROM m),
      |s AS (
      |  SELECT na, nb, mean_a, mean_b,
      |    var_a / CAST(na AS DOUBLE) AS se2_a,
      |    var_b / CAST(nb AS DOUBLE) AS se2_b,
      |    CAST(na AS DOUBLE) - 1 AS dfa, CAST(nb AS DOUBLE) - 1 AS dfb
      |  FROM v)
      |SELECT na, nb, mean_a, mean_b,
      |  (mean_a - mean_b) / sqrt(se2_a + se2_b) AS t_stat,
      |  ((se2_a + se2_b) * (se2_a + se2_b))
      |    / (se2_a * se2_a / dfa + se2_b * se2_b / dfb) AS dof
      |FROM s""".stripMargin

  /** q208: row_number over the modular-permutation order (the global
    * window is fine HERE — DuckDB is the single-node oracle; the Spark
    * side uses Prefix.cumsum), lag-1 adjacency, exact expectation. */
  private lazy val shuffleAuditOracle: String =
    s"""WITH base AS MATERIALIZED (
      |  SELECT doc_id AS did, source AS k FROM documents),
      |h AS (
      |  SELECT did, k,
      |    ${DedupQueries.signWrap(DedupQueries.polyHashSql("h1s"))} AS h
      |  FROM (SELECT did, k, reverse(CAST(h1 AS VARCHAR)) AS h1s FROM (
      |    SELECT did, k,
      |      ${DedupQueries.signWrap(DedupQueries.polyHashSql("ds"))} AS h1
      |    FROM (SELECT did, k, CAST(did AS VARCHAR) AS ds FROM base)))),
      |r AS MATERIALIZED (
      |  SELECT k, row_number() OVER (ORDER BY h) AS rk FROM h),
      |adj AS (SELECT a.k AS k, b.k AS k2 FROM r a JOIN r b ON b.rk = a.rk + 1),
      |obs AS (SELECT count(*) AS n_adj,
      |        sum(CASE WHEN k = k2 THEN 1 ELSE 0 END) AS same_adj FROM adj),
      |e AS (SELECT sum(c) AS n,
      |        coalesce(sum(CAST(c AS HUGEINT) * (c - 1)), 0) AS s2
      |      FROM (SELECT count(*) AS c FROM base GROUP BY k))
      |SELECT CAST(e.n AS BIGINT) AS n, CAST(obs.n_adj AS BIGINT) AS n_adj,
      |  CAST(obs.same_adj AS BIGINT) AS same_adj,
      |  CAST(e.s2 AS DOUBLE) / CAST(e.n AS DOUBLE) AS expected_same,
      |  CAST(obs.same_adj AS DOUBLE)
      |    / (CAST(e.s2 AS DOUBLE) / CAST(e.n AS DOUBLE)) AS ratio
      |FROM obs, e""".stripMargin

  private lazy val textRankOracle: String = {
    val scale = graft.operators.Dedup.pageRankScale
    val teleport = graft.operators.Dedup.pageRankTeleport(scale)
    val iters = (1 to 3).map { i =>
      s"""it$i AS (
         |  SELECT e.dst AS v,
         |         CAST($teleport + (85 * sum(r.pr // dg.d)) // 100 AS BIGINT) AS pr
         |  FROM e JOIN deg dg ON dg.src = e.src
         |  JOIN it${i - 1} r ON r.v = e.src
         |  GROUP BY e.dst)""".stripMargin
    }.mkString(",\n")
    s"""WITH tk AS (
       |  SELECT string_split_regex(trim(text), '\\s+') AS t FROM documents),
       |pr0 AS (SELECT unnest(list_transform(range(1, len(t)),
       |          i -> {'a': t[i], 'b': t[i+1]})) AS p FROM tk),
       |pp AS (SELECT DISTINCT least(p.a, p.b) AS wa, greatest(p.a, p.b) AS wb
       |       FROM pr0 WHERE p.a <> '' AND p.b <> '' AND p.a <> p.b),
       |nodes AS (SELECT wa AS w FROM pp UNION SELECT wb FROM pp),
       |voc AS (SELECT w, CAST(row_number() OVER (ORDER BY w) AS BIGINT) AS id
       |        FROM nodes),
       |ed AS (SELECT va.id AS id_a, vb.id AS id_b FROM pp
       |       JOIN voc va ON va.w = pp.wa JOIN voc vb ON vb.w = pp.wb),
       |e AS (SELECT id_a AS src, id_b AS dst FROM ed
       |      UNION ALL SELECT id_b, id_a FROM ed),
       |deg AS (SELECT src, count(*) AS d FROM e GROUP BY src),
       |it0 AS (SELECT src AS v, CAST($scale AS BIGINT) AS pr FROM deg),
       |$iters
       |SELECT voc.w AS word, r.pr FROM it3 r JOIN voc ON voc.id = r.v
       |ORDER BY pr DESC, word LIMIT 20""".stripMargin
  }

  /** t62's profile size — one constant for both engines (rule 12). */
  private lazy val ctTopN = 20

  private def ctLangOracle(n: Int): String =
    s"""WITH base AS (
       |  SELECT doc_id, truth, unnest(list_transform(
       |           range(1, len(word)), i -> word[i:i+1])) AS bg
       |  FROM (SELECT doc_id, lang AS truth,
       |          unnest(string_split_regex(trim(text), '\\s+')) AS word
       |        FROM documents)),
       |lp AS (SELECT truth AS cand, bg, count(*) AS c
       |       FROM base GROUP BY 1, 2),
       |lprof AS (SELECT cand, bg, lr FROM (
       |            SELECT cand, bg, CAST(row_number() OVER (
       |              PARTITION BY cand ORDER BY c DESC, bg) AS BIGINT) AS lr
       |            FROM lp) WHERE lr <= $n),
       |dp AS (SELECT doc_id, truth, bg, count(*) AS c
       |       FROM base GROUP BY 1, 2, 3),
       |dprof AS (SELECT doc_id, truth, bg, dr FROM (
       |            SELECT doc_id, truth, bg, CAST(row_number() OVER (
       |              PARTITION BY doc_id ORDER BY c DESC, bg) AS BIGINT) AS dr
       |            FROM dp) WHERE dr <= $n),
       |langs AS (SELECT DISTINCT cand FROM lprof),
       |dist AS (SELECT d.doc_id, d.truth, l.cand,
       |                CAST(sum(COALESCE(abs(d.dr - p.lr), $n)) AS BIGINT)
       |                  AS dist
       |         FROM dprof d CROSS JOIN langs l
       |         LEFT JOIN lprof p ON p.cand = l.cand AND p.bg = d.bg
       |         GROUP BY 1, 2, 3),
       |pick AS (SELECT truth, cand AS pred, row_number() OVER (
       |           PARTITION BY doc_id ORDER BY dist, cand) AS pk
       |         FROM dist)
       |SELECT truth, pred, count(*) AS n_docs FROM pick WHERE pk = 1
       |GROUP BY 1, 2 ORDER BY truth, pred""".stripMargin

  /** t59's round count — one constant for the Spark loop AND the
    * generated oracle CTE chain. */
  private lazy val bpeRounds = 6

  /** Shared t59/t60 training CTE chain: w0 = spaced single-char symbols
    * per distinct word; each round r counts pairs from w(r−1), picks the
    * argmax in t_r, and rewrites words in w_r with the same padded plain
    * replace the Spark side uses. COALESCE guards the (never-hit at gate
    * scale) pairs-exhausted round with a no-op target. */
  private def bpeChainCtes(rounds: Int): String = {
    val w0 =
      """w0 AS MATERIALIZED (
        |  SELECT array_to_string(list_transform(range(1, len(word) + 1),
        |           i -> word[i:i]), ' ') AS w, cnt FROM (
        |    SELECT word, count(*) AS cnt FROM (
        |      SELECT unnest(string_split_regex(trim(text), '\s+')) AS word
        |      FROM documents) WHERE word <> '' GROUP BY 1))""".stripMargin
    val steps = (1 to rounds).map { r =>
      s"""p$r AS MATERIALIZED (
         |  SELECT pair, CAST(sum(cnt) AS BIGINT) AS total FROM (
         |    SELECT unnest(list_transform(range(1, len(s)),
         |             i -> s[i] || ' ' || s[i+1])) AS pair, cnt FROM (
         |      SELECT string_split(w, ' ') AS s, cnt FROM w${r - 1}))
         |  GROUP BY 1),
         |t$r AS MATERIALIZED (SELECT pair, total FROM p$r
         |        ORDER BY total DESC, pair LIMIT 1),
         |w$r AS MATERIALIZED (SELECT trim(replace(' '||w||' ',
         |          ' '||COALESCE((SELECT pair FROM t$r), chr(1))||' ',
         |          ' '||replace(COALESCE((SELECT pair FROM t$r), chr(1)),
         |                       ' ', '')||' ')) AS w, cnt
         |        FROM w${r - 1})""".stripMargin
    }
    s"$w0,\n${steps.mkString(",\n")}"
  }

  /** t59 oracle: the training chain's merge rows, one per round. */
  private def bpeTrainOracle(rounds: Int): String = {
    val out = (1 to rounds).map(r =>
      s"""SELECT CAST($r AS BIGINT) AS round, pair,
         |       replace(pair, ' ', '') AS merged, total AS support
         |FROM t$r""".stripMargin).mkString("\nUNION ALL\n")
    s"WITH ${bpeChainCtes(rounds)}\n$out\nORDER BY round"
  }

  /** t60 oracle: re-derive the merges via the shared chain, then encode
    * every (doc, word) occurrence with the identical padded replaces and
    * aggregate per doc. Sums are HUGEINT→BIGINT; compression is the one
    * exact double division mirrored on the Spark side. */
  private def bpeEncodeOracle(rounds: Int): String = {
    val enc = (1 to rounds).map { r =>
      s"""e$r AS MATERIALIZED (SELECT doc_id, n_chars, trim(replace(' '||w||' ',
         |          ' '||COALESCE((SELECT pair FROM t$r), chr(1))||' ',
         |          ' '||replace(COALESCE((SELECT pair FROM t$r), chr(1)),
         |                       ' ', '')||' ')) AS w
         |        FROM e${r - 1})""".stripMargin
    }
    s"""WITH ${bpeChainCtes(rounds)},
       |e0 AS MATERIALIZED (
       |  SELECT doc_id, len(word) AS n_chars,
       |         array_to_string(list_transform(range(1, len(word) + 1),
       |           i -> word[i:i]), ' ') AS w FROM (
       |    SELECT doc_id, unnest(string_split_regex(trim(text), '\\s+')) AS word
       |    FROM documents) WHERE word <> ''),
       |${enc.mkString(",\n")}
       |SELECT doc_id, count(*) AS n_words,
       |       CAST(sum(n_chars) AS BIGINT) AS n_chars,
       |       CAST(sum(len(string_split(w, ' '))) AS BIGINT) AS n_tokens,
       |       CAST(sum(n_chars) AS DOUBLE) / CAST(sum(len(string_split(w, ' '))) AS DOUBLE)
       |         AS compression
       |FROM e$rounds GROUP BY doc_id ORDER BY doc_id""".stripMargin
  }

  /** t56 oracle: the same fixed-point BM25, HUGEINT for the products,
    * `//` for the floors (truncation ≡ Spark div on these all-positive
    * operands — CLAUDE.md rule 21). */
  private lazy val bm25Oracle: String =
    s"""WITH $bm25Ctes
       |SELECT query_id, CAST(rank AS BIGINT) AS rank, doc_id,
       |       CAST(s AS BIGINT) AS score_scaled, CAST(n_terms AS BIGINT) AS n_terms
       |FROM rk WHERE rank <= 10 ORDER BY query_id, rank""".stripMargin

  /** The t56 CTE chain up to the full ranked list `rk(query_id, doc_id,
    * s, n_terms, rank)` — shared with the s58 hybrid-fusion oracle
    * (rule 12: one definition, two consumers). */
  private[queries] lazy val bm25Ctes: String =
    """toks AS (
      |  SELECT doc_id, unnest(string_split_regex(trim(text), '\s+')) AS w
      |  FROM documents),
      |cnt AS (SELECT w, count(*) AS n FROM toks GROUP BY w),
      |qt AS (
      |  SELECT (rn - 11) // 3 AS query_id, w FROM (
      |    SELECT w, row_number() OVER (ORDER BY n DESC, w) AS rn FROM cnt)
      |  WHERE rn BETWEEN 11 AND 16),
      |meta AS (SELECT (SELECT count(*) FROM toks) AS l,
      |                (SELECT count(*) FROM documents) AS n_docs),
      |posting AS (
      |  SELECT qt.query_id, qt.w, toks.doc_id FROM toks JOIN qt USING (w)),
      |tf AS (SELECT query_id, w, doc_id, count(*) AS tf
      |       FROM posting GROUP BY 1, 2, 3),
      |dfr AS (SELECT w, count(DISTINCT doc_id) AS df FROM posting GROUP BY w),
      |lens AS (SELECT doc_id, count(*) AS dl FROM toks GROUP BY doc_id),
      |scored AS (
      |  SELECT tf.query_id, tf.doc_id,
      |         (10000::HUGEINT * (2*(n_docs - df) + 1) * (22000000 * tf)) //
      |         ((2*df + 1)::HUGEINT * (10000000*tf + 3000000 +
      |            9 * ((1000000::HUGEINT * dl * n_docs) // l))) AS term_score
      |  FROM tf JOIN dfr USING (w) JOIN lens USING (doc_id) CROSS JOIN meta),
      |agg AS (SELECT query_id, doc_id, sum(term_score) AS s,
      |               count(*) AS n_terms
      |        FROM scored GROUP BY 1, 2),
      |rk AS (SELECT *, row_number() OVER (
      |         PARTITION BY query_id ORDER BY s DESC, doc_id) AS rank
      |       FROM agg)""".stripMargin

  /** t55: the 4×1024 counter build, per-item cell lookup and min —
    * replayed cell for cell (salted polynomial hashes, rule 12). */
  private lazy val countMinOracle: String = {
    val width = 1024
    val depth = 4
    def bSql(i: Int, wexpr: String) =
      s"CAST((${DedupQueries.polyHashSql(s"('cms$i' || $wexpr)")}) % $width AS BIGINT)"
    val cnts = (0 until depth).map(i =>
      s"SELECT $i AS row, ${bSql(i, "w")} AS bucket, count(*) AS cnt " +
        "FROM words GROUP BY 2").mkString("\nUNION ALL\n")
    val eb = (0 until depth).map(i =>
      s"SELECT w, n_exact, $i AS row, ${bSql(i, "w")} AS bucket FROM exact")
      .mkString("\nUNION ALL\n")
    s"""WITH ${DedupQueries.ngramShingleCte},
       |words AS (SELECT sh AS w FROM ex),
       |cnts AS ($cnts),
       |exact AS (SELECT w, count(*) AS n_exact FROM words GROUP BY w
       |          ORDER BY n_exact DESC, w LIMIT 20),
       |eb AS ($eb),
       |est AS (SELECT e.w, e.n_exact, min(c.cnt) AS est
       |        FROM eb e JOIN cnts c ON e.row = c.row AND e.bucket = c.bucket
       |        GROUP BY e.w, e.n_exact)
       |SELECT w, CAST(n_exact AS BIGINT) AS n_exact,
       |  CAST(est AS BIGINT) AS est,
       |  CAST(est - n_exact AS BIGINT) AS overcount
       |FROM est ORDER BY n_exact DESC, w""".stripMargin
  }

  /** t54: chunk derivation, distinct-doc line DF, anti-join, ordered
    * reassembly and the md5 pin — replayed step for step. */
  private lazy val lineDedupOracle: String =
    """WITH toks AS (
      |  SELECT doc_id, string_split_regex(trim(text), '\s+') AS w
      |  FROM documents),
      |lines0 AS (SELECT doc_id, unnest(range(0, (len(w) + 9) // 10)) AS pos, w
      |           FROM toks),
      |ln AS (SELECT doc_id, pos,
      |         array_to_string(w[(pos*10+1):(pos*10+10)], ' ') AS line
      |       FROM lines0
      |       WHERE length(array_to_string(w[(pos*10+1):(pos*10+10)], ' ')) > 0),
      |boiler AS (SELECT line FROM (
      |             SELECT line, count(DISTINCT doc_id) AS df
      |             FROM ln GROUP BY line)
      |           WHERE df >= 2),
      |totals AS (SELECT doc_id, count(*) AS n_lines FROM ln GROUP BY doc_id),
      |kept AS (SELECT l.doc_id, l.pos, l.line
      |         FROM ln l LEFT JOIN boiler b ON l.line = b.line
      |         WHERE b.line IS NULL),
      |clean AS (SELECT doc_id,
      |            array_to_string(list(line ORDER BY pos), ' ') AS clean,
      |            count(*) AS n_kept
      |          FROM kept GROUP BY doc_id)
      |SELECT t.doc_id, CAST(t.n_lines AS BIGINT) AS n_lines,
      |  CAST(t.n_lines - coalesce(c.n_kept, 0) AS BIGINT) AS n_dropped,
      |  md5(coalesce(c.clean, '')) AS clean_md5
      |FROM totals t LEFT JOIN clean c ON t.doc_id = c.doc_id
      |ORDER BY t.doc_id""".stripMargin

  /** t53: the bit-trick HLL replayed — unsigned suffix via hu // 256,
    * lowest-set-bit via sw & -sw on the BIGINT suffix, register max,
    * integer term sum (HUGEINT → BIGINT, rule 18), one double division
    * with the alpha constant through dlit (rule 14). */
  private lazy val hllOracle: String = {
    import graft.operators.Frequency.{HllAlphaScaled, HllBuckets, HllCap}
    val alpha = SimilarityQueries.dlit(HllAlphaScaled)
    s"""WITH ${DedupQueries.ngramShingleCte},
       |words AS (SELECT sh AS w FROM ex),
       |hashed AS (SELECT w, (${DedupQueries.polyHashSql("w")}) AS hu
       |           FROM words),
       |bw AS (SELECT w, CAST(hu % $HllBuckets AS BIGINT) AS b,
       |              CAST(hu // $HllBuckets AS BIGINT) AS sw
       |       FROM hashed),
       |pr AS (SELECT b, CASE WHEN sw = 0 THEN $HllCap
       |                 ELSE least($HllCap, sw & (-sw)) END AS p
       |       FROM bw),
       |regs AS (SELECT b, max(p) AS pmax FROM pr GROUP BY b),
       |allb AS (SELECT unnest(range(0, $HllBuckets)) AS b),
       |terms AS (SELECT pmax IS NULL AS isz,
       |    CASE WHEN pmax IS NULL THEN ${1L << 48}
       |         ELSE $HllCap // pmax END AS term
       |  FROM allb LEFT JOIN regs USING (b)),
       |s AS (SELECT CAST(sum(term) AS BIGINT) AS s_num,
       |        CAST(sum(CASE WHEN isz THEN 1 ELSE 0 END) AS BIGINT) AS n_zero
       |      FROM terms),
       |exd AS (SELECT count(DISTINCT w) AS n_exact FROM words)
       |SELECT CAST($HllBuckets AS BIGINT) AS m, n_zero, s_num,
       |  $alpha / CAST(s_num AS DOUBLE) AS est, n_exact,
       |  abs($alpha / CAST(s_num AS DOUBLE) - CAST(n_exact AS DOUBLE))
       |    / CAST(n_exact AS DOUBLE) AS rel_err
       |FROM s, exd
       |ORDER BY m""".stripMargin
  }

  /** t51/t52 shared oracle — one SQL string for the recompute AND the
    * store path (their outputs are bit-identical by construction). */
  private lazy val tokenDriftOracle: String =
    s"""WITH words AS (
       |  SELECT lang = 'en' AS is_a,
       |         unnest(string_split_regex(trim(text), '\\s+')) AS w
       |  FROM documents),
       |hashed AS (SELECT is_a, (${DedupQueries.polyHashSql("w")}) % 4096 AS f
       |           FROM words),
       |feats AS (SELECT f,
       |  sum(CASE WHEN is_a THEN 1 ELSE 0 END) AS a_cnt,
       |  sum(CASE WHEN NOT is_a THEN 1 ELSE 0 END) AS b_cnt
       |  FROM hashed GROUP BY f),
       |tot AS (SELECT sum(a_cnt) AS a_tot, sum(b_cnt) AS b_tot FROM feats),
       |d AS (SELECT f, a_cnt, b_cnt, a_tot, b_tot,
       |        abs(a_cnt * b_tot - b_cnt * a_tot) AS diff
       |      FROM feats, tot),
       |s AS (SELECT *, sum(diff) OVER () AS tvd_num,
       |        row_number() OVER (ORDER BY diff DESC, f) AS rank
       |      FROM d)
       |SELECT CAST(rank AS BIGINT) AS rank, CAST(f AS BIGINT) AS f,
       |  CAST(a_cnt AS BIGINT) AS a_cnt, CAST(b_cnt AS BIGINT) AS b_cnt,
       |  CAST(diff AS DOUBLE) / CAST(a_tot AS DOUBLE)
       |    / CAST(b_tot AS DOUBLE) AS contrib,
       |  CAST(tvd_num AS DOUBLE) / CAST(a_tot AS DOUBLE)
       |    / CAST(b_tot AS DOUBLE) / 2.0 AS tvd
       |FROM s WHERE rank <= 50 ORDER BY rank""".stripMargin

  /** t80: t42's metric CTE plus the canonical-fingerprint keeper map,
    * the 7 funnel sums in one aggregate, stage rows generated as a
    * UNION ALL over the 1-row frame (arms built in Scala — one stage
    * list, both engines). */
  private lazy val filterFunnelOracle: String = {
    val names = Seq("raw", "language", "length", "mean_word_len",
      "stopword", "repetition", "exact_dedup")
    def survSql(k: Int): String =
      if (k == 0) "count(*)"
      else "CAST(sum(CASE WHEN " +
        (1 to k).map(i => s"g$i").mkString(" AND ") +
        " THEN 1 ELSE 0 END) AS BIGINT)"
    val sums = (0 to 6).map(k => s"${survSql(k)} AS s$k").mkString(",\n  ")
    val arms = names.zipWithIndex.map { case (nm, k) =>
      val prev = if (k == 0) s"s$k" else s"s${k - 1}"
      val removed = if (k == 0) "CAST(0 AS BIGINT)" else s"$prev - s$k"
      val attr =
        if (k == 0) "0.0e0"
        else s"""CASE WHEN $prev = 0 THEN 0.0e0
                |    ELSE CAST($prev - s$k AS DOUBLE) / CAST($prev AS DOUBLE)
                |    END""".stripMargin
      s"""SELECT CAST($k AS BIGINT) AS stage_ord, '$nm' AS stage,
         |  s$k AS survivors, $removed AS removed,
         |  $attr AS attrition_rate,
         |  CASE WHEN s0 = 0 THEN 0.0e0
         |    ELSE CAST(s$k AS DOUBLE) / CAST(s0 AS DOUBLE) END
         |    AS cum_survival
         |FROM r""".stripMargin
    }.mkString("\nUNION ALL\n")
    s"""WITH s AS (
       |  SELECT doc_id, text, lang,
       |         string_split_regex(trim(text), '\\s+') AS w
       |  FROM documents),
       |m AS (SELECT doc_id, lang,
       |  CAST(len(w) AS BIGINT) AS n_words,
       |  round((length(text) - (len(w) - 1)) * 1.0 / len(w), 6)
       |    AS mean_word_len,
       |  round(len(list_filter(w, x -> x IN
       |    ('the','a','an','and','or','of','to','in','is','it'))) * 1.0
       |        / len(w), 6) AS stop_frac,
       |  round(1.0 - len(list_distinct(w)) * 1.0 / len(w), 6)
       |    AS dup_word_frac,
       |  md5(array_to_string(list_sort(w), ' ')) AS fp
       |  FROM s),
       |kp AS (SELECT fp, min(doc_id) AS keep_id FROM m GROUP BY fp),
       |g AS (SELECT m.doc_id,
       |  m.lang = 'en' AS g1,
       |  m.n_words >= 25 AND m.n_words <= 200 AS g2,
       |  m.mean_word_len >= 3.0 AND m.mean_word_len <= 12.0 AS g3,
       |  m.stop_frac >= 0.02 AS g4,
       |  m.dup_word_frac <= 0.55 AS g5,
       |  m.doc_id = kp.keep_id AS g6
       |  FROM m JOIN kp USING (fp)),
       |r AS MATERIALIZED (SELECT
       |  $sums
       |FROM g)
       |$arms
       |ORDER BY stage_ord""".stripMargin
  }

  /** t78: the positional-postings mirror of Retrieval.phraseSearch —
    * per-phrase arm CTEs generated from the SAME phraseQueries list
    * (rule 12), adjacency via pos-offset equi-joins on the shared
    * MATERIALIZED postings (rule 22). */
  private lazy val phraseSearchOracle: String = {
    val qs = graft.operators.Retrieval.phraseQueries
    val arms = qs.zipWithIndex.map { case (p, k) =>
      val terms = p.split(" ")
      val joins = terms.indices.tail.map(i =>
        s"JOIN po a$i ON a$i.doc_id = a0.doc_id AND a$i.pos = a0.pos + $i")
        .mkString(" ")
      val conds = terms.zipWithIndex
        .map { case (t, i) => s"a$i.term = '$t'" }.mkString(" AND ")
      s"""pp$k AS (SELECT '$p' AS phrase, a0.doc_id AS doc_id,
         |  count(*) AS n_matches FROM po a0 $joins
         |  WHERE $conds GROUP BY 2)""".stripMargin
    }.mkString(",\n")
    val union = qs.indices.map(k => s"SELECT * FROM pp$k")
      .mkString(" UNION ALL ")
    s"""WITH tk AS (
       |  SELECT doc_id, string_split_regex(trim(text), '\\s+') AS w
       |  FROM documents),
       |po AS MATERIALIZED (
       |  SELECT doc_id, p.i - 1 AS pos, p.t AS term FROM (
       |    SELECT doc_id, unnest(list_transform(range(1, len(w) + 1),
       |      i -> {'i': i, 't': w[i]})) AS p FROM tk)),
       |$arms,
       |u AS MATERIALIZED ($union),
       |tot AS (SELECT phrase, count(*) AS n_docs,
       |          CAST(sum(n_matches) AS BIGINT) AS total_matches
       |        FROM u GROUP BY phrase),
       |r AS (SELECT phrase, doc_id, n_matches, row_number() OVER (
       |        PARTITION BY phrase ORDER BY n_matches DESC, doc_id) AS rnk
       |      FROM u)
       |SELECT r.phrase, CAST(r.rnk AS BIGINT) AS rnk, r.doc_id,
       |  r.n_matches, tot.n_docs, tot.total_matches
       |FROM r JOIN tot USING (phrase) WHERE r.rnk <= 3
       |ORDER BY r.phrase, r.rnk""".stripMargin
  }
}
