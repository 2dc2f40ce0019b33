package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions
import graft.operators.Materialize.Ops

/** Corpus-curation operators for LLM training-data pipelines: the
  * document-level quality gates, repetition statistics, deterministic
  * global shuffle, and domain-mixing steps that sit between raw ingest
  * and dedup/tokenization in a web-scale build (the filter families
  * popularized by C4 — Raffel '20 — and the Gopher rules — Rae '21).
  *
  * Everything is a narrow column computation or a (doc_id, gram)-keyed
  * aggregation: no cross joins, no driver-side state, deterministic
  * everywhere (hash order instead of rand()), so results are replayable
  * and the shapes survive a 1000-executor scale-up unchanged.
  */
object Curation {

  // ---- repetition metrics (Gopher-style) ----

  /** Duplicate-word fraction per document: 1 − |distinct|/|all| — a pure
    * array computation, no explode. */
  def dupWordFrac(text: Column): Column = {
    val toks = TextFunctions.tokens(text)
    round(lit(1.0) - size(array_distinct(toks)).cast("double") /
      size(toks).cast("double"), 6)
  }

  /** Per-document repetition metrics: word count, duplicate-word
    * fraction, the most frequent word and its mass, and the most
    * frequent word-bigram's mass. Ties break lexicographically so the
    * result is deterministic on both engines.
    *
    * Shape at scale: one explode → groupBy(doc, gram) → per-doc window
    * max. The explode amplifies by words-per-doc (bounded), the groupBy
    * combines map-side, and the window partitions by doc_id — no skew
    * beyond the longest single document. */
  def repetitionMetrics(docs: DataFrame): DataFrame = {
    // ONE tokenize, checkpointed: three plan branches (top word, top
    // bigram, per-doc stats) read the token table — without the
    // checkpoint each branch re-scans and re-tokenizes the corpus
    // (the shared-explode rule from the dedup pipelines)
    val words = docs.repartition(col("doc_id"))
      .select(col("doc_id"), TextFunctions.tokens(col("text")).as("toks"))
      .materializeOnce()
    // (doc, word) counts → per-doc top word (count desc, word asc)
    val wordCounts = words
      .select(col("doc_id"), explode(col("toks")).as("w"))
      .groupBy(col("doc_id"), col("w")).agg(count(lit(1)).as("c"))
    val topWord = wordCounts
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("doc_id")).orderBy(col("c").desc, col("w"))))
      .filter(col("rn") === 1)
      .select(col("doc_id"), col("w").as("top_word"), col("c").as("top_word_n"))
    // word bigrams via sliding pairs over the token array
    val bigrams = words.select(col("doc_id"),
      explode(expr(
        "transform(slice(toks, 1, greatest(size(toks) - 1, 0)), " +
          "(x, i) -> concat(x, ' ', toks[i + 1]))")).as("g"))
    val topBigram = bigrams
      .groupBy(col("doc_id"), col("g")).agg(count(lit(1)).as("c"))
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("doc_id")).orderBy(col("c").desc, col("g"))))
      .filter(col("rn") === 1)
      .select(col("doc_id"), col("c").as("top_bigram_n"))
    words
      .select(col("doc_id"),
        size(col("toks")).cast("long").as("n_words"),
        round(lit(1.0) - size(array_distinct(col("toks"))).cast("double") /
          size(col("toks")).cast("double"), 6).as("dup_word_frac"))
      .join(topWord, Seq("doc_id"))
      // left: a single-token document has no bigrams at all
      .join(topBigram, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_words"), col("dup_word_frac"),
        col("top_word"),
        round(col("top_word_n").cast("double") / col("n_words"), 6)
          .as("top_word_frac"),
        round(coalesce(col("top_bigram_n"), lit(0L)).cast("double") /
          greatest(col("n_words") - 1, lit(1)), 6).as("top_bigram_frac"))
      .orderBy(col("doc_id"))
  }

  // ---- Gopher-style quality gate ----

  /** Per-document quality-filter verdict: the word-count, mean-word-
    * length, stopword and repetition gates of the Gopher rules, each
    * surfaced as its own flag plus the combined keep decision — a
    * pipeline wants the per-rule breakdown for filter-rate monitoring,
    * not just the survivors. Pure column arithmetic: stays in one
    * codegen stage, composes with parquet pushdown. */
  def gopherFilters(
      docs: DataFrame,
      minWords: Int = 25, maxWords: Int = 200,
      minMeanLen: Double = 3.0, maxMeanLen: Double = 12.0,
      minStopFrac: Double = 0.02, maxDupFrac: Double = 0.55): DataFrame = {
    val nWords = TextFunctions.tokenCount(col("text")).cast("long")
    val meanLen = round(TextFunctions.meanTokenLen(col("text")), 6)
    val stopFrac = round(TextFunctions.stopwordRatio(col("text")), 6)
    val dupFrac = dupWordFrac(col("text"))
    docs.select(col("doc_id"),
      nWords.as("n_words"), meanLen.as("mean_word_len"),
      stopFrac.as("stop_frac"), dupFrac.as("dup_word_frac"),
      (nWords >= minWords && nWords <= maxWords).as("len_ok"),
      (meanLen >= minMeanLen && meanLen <= maxMeanLen).as("mean_len_ok"),
      (stopFrac >= minStopFrac).as("stop_ok"),
      (dupFrac <= maxDupFrac).as("rep_ok"))
      .withColumn("keep",
        col("len_ok") && col("mean_len_ok") && col("stop_ok") && col("rep_ok"))
      .orderBy(col("doc_id"))
  }

  /** Ordered filter-funnel attrition report — the per-stage survival
    * table every corpus build publishes (the C4/Gopher/RefinedWeb
    * papers all report it): documents flowing through language →
    * length → mean-word-length → stopword → repetition → exact-dedup
    * gates IN ORDER, with survivors, per-stage removals, the stage
    * attrition rate and cumulative survival. Gates reuse
    * [[gopherFilters]]' exact flags; the dedup keeper is min doc_id
    * per canonical fingerprint (the d36 contract).
    *
    * Scale shape: flags are one codegen pass; the keeper map is one
    * fingerprint groupBy + an equi-join back; the funnel itself is ONE
    * conditional aggregate (7 sums in one pass) fanned out to stage
    * rows by a 7-arm union over the 1-row frame. Rates are single
    * divisions of exact int64s with zero-denominator guards (ANSI,
    * rule 21a). */
  def filterFunnel(docs: DataFrame, lang: String = "en"): DataFrame = {
    val flags = gopherFilters(docs)
      .select(col("doc_id"), col("len_ok"), col("mean_len_ok"),
        col("stop_ok"), col("rep_ok"))
    val withFp = docs.select(col("doc_id"), col("lang"),
      TextFunctions.canonicalFingerprint(col("text")).as("fp"))
    val keepers = withFp.groupBy(col("fp")).agg(min(col("doc_id")).as("keep_id"))
    val g = withFp.join(flags, Seq("doc_id")).join(keepers, Seq("fp"))
      .select(col("doc_id"),
        (col("lang") === lang).as("g1"), col("len_ok").as("g2"),
        col("mean_len_ok").as("g3"), col("stop_ok").as("g4"),
        col("rep_ok").as("g5"), (col("doc_id") === col("keep_id")).as("g6"))
    def surv(k: Int): Column = {
      val cond = (1 to k).map(i => col(s"g$i")).reduceOption(_ && _)
      cond.map(c => sum(when(c, 1L).otherwise(0L)))
        .getOrElse(count(lit(1)).cast("long"))
    }
    val row = g.agg(surv(0).as("s0"), surv(1).as("s1"), surv(2).as("s2"),
      surv(3).as("s3"), surv(4).as("s4"), surv(5).as("s5"), surv(6).as("s6"))
      .materializeOnce() // feeds all seven stage arms
    val names = Seq("raw", "language", "length", "mean_word_len",
      "stopword", "repetition", "exact_dedup")
    names.zipWithIndex.map { case (nm, k) =>
      val s = col(s"s$k")
      val prev = if (k == 0) s else col(s"s${k - 1}")
      row.select(lit(k.toLong).as("stage_ord"), lit(nm).as("stage"),
        s.as("survivors"),
        (if (k == 0) lit(0L) else (prev - s)).as("removed"),
        (if (k == 0) lit(0.0)
         else when(prev === 0L, lit(0.0))
           .otherwise((prev - s).cast("double") / prev.cast("double")))
          .as("attrition_rate"),
        when(col("s0") === 0L, lit(0.0))
          .otherwise(s.cast("double") / col("s0").cast("double"))
          .as("cum_survival"))
    }.reduce(_ unionByName _).orderBy(col("stage_ord"))
  }

  /** Agreement audit between two document filters — the QA step a
    * pipeline runs when swapping one quality gate for another (e.g. a
    * heuristic score replacing the Gopher rules): confusion counts of
    * `pred` against `gold` plus the derived metrics, as ONE aggregated
    * row. All sufficient statistics are int64 counts from a single
    * pass; every metric is arithmetic over single int64/int64 divisions
    * (correctly rounded, hence bit-reproducible cross-engine — rule-17
    * discipline). Cohen's kappa uses the rate-product form
    * `pe = pa1·pb1 + pa0·pb0` with each rate its own single division —
    * overflow-free at any corpus size, where the integer cross-product
    * form `(tp+fp)(tp+fn)` would pass 2^63 around 10^10 documents.
    * F1 is computed as `2·tp / (2·tp+fp+fn)` — algebraically the
    * harmonic mean, but a SINGLE division instead of a composition of
    * three. Degenerate denominators (an empty class) yield NULL, not a
    * cross-engine NaN-vs-inf mismatch. */
  def filterAgreement(scored: DataFrame, pred: Column, gold: Column): DataFrame = {
    val counts = scored.select(pred.as("p"), gold.as("g"))
      .agg(
        count(when(col("p") && col("g"), 1)).as("tp"),
        count(when(col("p") && !col("g"), 1)).as("fp"),
        count(when(!col("p") && col("g"), 1)).as("fn"),
        count(when(!col("p") && !col("g"), 1)).as("tn"))
    def ratio(num: Column, den: Column): Column =
      when(den > 0, num.cast("double") / den.cast("double"))
    val n = col("tp") + col("fp") + col("fn") + col("tn")
    val withRates = counts.select(
      col("tp"), col("fp"), col("fn"), col("tn"), n.as("n"),
      ratio(col("tp") + col("tn"), n).as("acc"),
      ratio(col("tp"), col("tp") + col("fp")).as("prec"),
      ratio(col("tp"), col("tp") + col("fn")).as("rec"),
      ratio(lit(2) * col("tp"),
        lit(2) * col("tp") + col("fp") + col("fn")).as("f1"),
      (ratio(col("tp") + col("fp"), n) * ratio(col("tp") + col("fn"), n)
        + ratio(col("fn") + col("tn"), n) * ratio(col("fp") + col("tn"), n))
        .as("pe"))
    withRates.select(
      col("tp"), col("fp"), col("fn"), col("tn"), col("n"),
      col("acc"), col("prec"), col("rec"), col("f1"),
      when(lit(1.0) - col("pe") =!= 0.0,
        (col("acc") - col("pe")) / (lit(1.0) - col("pe"))).as("kappa"))
  }

  // ---- PII redaction (C4-style) ----

  private val emailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  private val phoneRe = "\\b[0-9]{3}[-.][0-9]{3}[-.][0-9]{4}\\b"
  private val ipRe = "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b"

  /** Redact emails, phone numbers, and IPv4 addresses with typed
    * placeholder tags. Character classes only (no lookaround), so the
    * patterns mean the same thing to Java regex and RE2-family engines —
    * the portability constraint every cross-engine pipeline has. */
  def piiRedact(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, emailRe, "<EMAIL>"),
        phoneRe, "<PHONE>"),
      ipRe, "<IP>")

  /** Count of PII matches per kind (email, phone, ip) for filter-rate
    * monitoring. */
  def piiCounts(text: Column): Seq[(String, Column)] = Seq(
    "n_email" -> regexp_count(text, lit(emailRe)).cast("long"),
    "n_phone" -> regexp_count(text, lit(phoneRe)).cast("long"),
    "n_ip" -> regexp_count(text, lit(ipRe)).cast("long"))

  // ---- deterministic corpus shuffle ----

  /** Global pseudorandom order without rand(): sort by md5(seed:doc_id).
    * Deterministic across runs and engines, uniform enough to break any
    * ingest-order correlation before sequence packing / epoch slicing.
    * At scale this is exactly one range-partitioned sort — the same cost
    * as any global ORDER BY — and the key is reproducible from the row
    * itself, so a re-run (or a resumed job) lands every document in the
    * same position. */
  /** Distributional outlier detection: per document, the total
    * variation distance between its unigram distribution and the
    * corpus-wide one — the "does this doc even look like this corpus"
    * signal (boilerplate, wrong-language and template docs sit far
    * from the corpus distribution; ordinary prose sits close). The
    * q192 integer-TVD idiom at text scale, WITHOUT the doc×vocab grid:
    *   2·n_d·N·tvd = Σ_{w∈doc} (|c_dw·N − g_w·n_d| − g_w·n_d) + n_d·N
    * (absent words contribute g_w·n_d each, and Σ_w g_w = N closes the
    * remainder in one product), so the only work is the doc-word table
    * joined to the BROADCAST vocabulary margins — one corpus explode,
    * no grid. Products ride DECIMAL(38,0) (rule 18: c·N passes 2^63
    * near 10⁹-token corpora... at 10¹⁴ tokens DECIMAL(38) still holds
    * c·N ≤ 10^28); tvd is one division, the outlier verdict the
    * cross-multiplied theorem tDen·scaled > 2·tNum·n_d·N. */
  def tokenDistributionOutliers(docs: DataFrame, tNum: Long, tDen: Long,
      id: Column = col("doc_id"), text: Column = col("text")): DataFrame = {
    require(tNum > 0 && tDen > 0)
    val tk = docs.repartition(id) // row-amplifying explode (rule 6)
      .select(id.as("doc_id"),
        explode(TextFunctions.tokens(text)).as("w"))
      .filter(col("w") =!= "")
      .materializeOnce() // feeds doc-word counts, margins, totals
    val dw = tk.groupBy(col("doc_id"), col("w")).agg(count(lit(1)).as("c"))
    val g = tk.groupBy(col("w")).agg(count(lit(1)).as("gw")) // vocab-sized
    val nd = tk.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
    val tot = tk.agg(count(lit(1)).as("nn")) // 1-row normalizer
    def D(c: Column) = c.cast("decimal(38,0)")
    dw.join(broadcast(g), Seq("w"))
      .join(nd, Seq("doc_id"))
      .crossJoin(broadcast(tot))
      .groupBy(col("doc_id"), col("n"), col("nn"))
      .agg(sum(abs(D(col("c")) * D(col("nn")) - D(col("gw")) * D(col("n")))
        - D(col("gw")) * D(col("n"))).as("partial"))
      .select(col("doc_id"), col("n").as("n_tokens"),
        (col("partial") + D(col("n")) * D(col("nn")))
          .cast("bigint").as("tvd_scaled"),
        ((col("partial") + D(col("n")) * D(col("nn"))).cast("double")
          / (D(lit(2L)) * D(col("n")) * D(col("nn"))).cast("double"))
          .as("tvd"),
        (D(lit(tDen)) * (col("partial") + D(col("n")) * D(col("nn"))) >
          D(lit(2L * tNum)) * D(col("n")) * D(col("nn"))).as("is_outlier"))
      .orderBy(col("doc_id"))
  }

  def corpusShuffle(docs: DataFrame, seed: String = "s0"): DataFrame =
    docs.select(col("doc_id"),
      md5(concat_ws(":", lit(seed), col("doc_id"))).as("shuffle_key"))
      .orderBy(col("shuffle_key"), col("doc_id"))

  /** Curriculum ordering (quality-annealed data ordering): every
    * document gets a quality bin from EXACT type-1 quantile thresholds
    * of its rounded quality score, then the corpus is ordered
    * best-bin-first with a deterministic seeded shuffle INSIDE each bin
    * — the "clean data first, shuffled within stage" recipe of
    * curriculum training schedules, fully reproducible by construction
    * (no rand(), so re-runs and the oracle see the identical order).
    *
    * Scale shape: thresholds come from the count-of-counts histogram
    * over the ROUNDED score (≤10⁶ distinct values by the 6-dp
    * rounding, so the quantile window is bounded — q149's argument);
    * bin assignment is a broadcast join against the (nBins−1)-row
    * threshold frame; the final orderBy is Spark's distributed range
    * sort — no global row_number is ever materialized. */
  def curriculumOrder(
      docs: DataFrame, seed: String = "s0", nBins: Int = 10): DataFrame = {
    val scored = docs.select(col("doc_id"),
      round(TextFunctions.qualityScore(col("text")), 6).as("quality"))
      .materializeOnce() // feeds the histogram AND the assignment join
    val qs = (1 until nBins).map(i => i.toDouble / nBins)
    val th = Profiling.exactQuantiles(
      scored.withColumn("g", lit(1)), group = "g", value = "quality", qs = qs)
      .select(col("q_value"))
    scored
      .join(broadcast(th), col("quality") >= col("q_value"), "left")
      .groupBy(col("doc_id"), col("quality"))
      .agg(count(col("q_value")).as("above"))
      .select(col("doc_id"), col("quality"),
        (col("above") + 1).cast("bigint").as("bin"),
        md5(concat_ws(":", lit(seed), col("doc_id"))).as("skey"))
      .orderBy(col("bin").desc, col("skey"), col("doc_id"))
  }

  // ---- domain mixing ----

  /** Down-sample each source domain to a per-domain cap, choosing
    * survivors in deterministic hash order (so the SAME documents
    * survive on every run — resampling must be reproducible for a
    * training corpus). One window over source; the caps ride along as a
    * broadcast map literal, not a join. */
  def domainMix(
      docs: DataFrame, caps: Map[String, Int], defaultCap: Int): DataFrame = {
    val capCol = caps.foldLeft(lit(defaultCap)) { case (acc, (src, n)) =>
      when(col("source") === src, lit(n)).otherwise(acc)
    }
    docs.select(col("doc_id"), col("source"),
      md5(concat_ws(":", lit("mix"), col("doc_id"))).as("hk"))
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("source")).orderBy(col("hk"), col("doc_id"))))
      .filter(col("rn") <= capCol)
      .select(col("doc_id"), col("source"))
      .orderBy(col("source"), col("doc_id"))
  }

  /** Relative (within-domain) quality filtering — the CCNet/RefinedWeb
    * move of thresholding quality per SOURCE rather than globally: a
    * global cutoff empties low-scoring domains and keeps every doc of
    * high-scoring ones; ranking within the domain keeps the best `keep`
    * fraction of each. percent_rank = (rank−1)/(n−1) with a doc_id
    * tiebreak, so ranks are unique and the int÷int division is one
    * identical IEEE op in both engines. One window per domain — the
    * shuffle partitions by exactly the key the filter needs; nothing
    * global. */
  def domainPercentileFilter(docs: DataFrame, keep: Double): DataFrame = {
    val scored = docs.select(col("doc_id"), col("source"),
      round(TextFunctions.qualityScore(col("text")), 6).as("quality"))
    val w = Window.partitionBy(col("source"))
      .orderBy(col("quality").desc, col("doc_id"))
    scored
      .withColumn("pct_rank", percent_rank().over(w))
      .filter(col("pct_rank") <= lit(keep))
      .orderBy(col("source"), col("pct_rank"), col("doc_id"))
  }

  /** Temperature-based domain reweighting (the α=0.5 point of the
    * p_i ∝ n_i^α family — unigram-LM / DoReMi-style smoothing that
    * up-weights small domains): per-source sampling weights and an
    * integer token-budget allocation proportional to √n_i.
    *
    * Determinism contract: √n on an exact integer is a single
    * correctly-rounded IEEE op (identical on every engine), and it is
    * immediately floor-scaled to an int64 (× 10⁶) so ALL downstream
    * arithmetic — the Σw normalizer, the budget split — is exact
    * integer math. No double is ever summed, so partial-aggregation
    * order cannot drift a bit. The per-source share is one final
    * int÷int double division. Group count = #domains (tiny); one
    * aggregate over the corpus. */
  def temperatureMix(docs: DataFrame, budget: Long): DataFrame = {
    val w = floor(sqrt(col("n").cast("double")) * 1e6).cast("bigint")
    // materialized once: the normalizer aggregate would otherwise
    // recompute the whole corpus scan (rule 5); the table is #domains
    // rows, so the checkpoint is free
    val counts = docs.groupBy(col("source"))
      .agg(count(lit(1)).as("n"))
      .select(col("source"), col("n"), w.as("w"))
      .materializeOnce()
    val tot = counts.agg(sum(col("w")).as("sw"))
    counts.crossJoin(tot) // 1-row normalizer; no data skew possible
      .select(col("source"), col("n"),
        (col("w").cast("double") / col("sw").cast("double")).as("share"),
        // integer division (Spark DIV ≡ DuckDB // on positives): `/` on
        // int64 yields a DOUBLE quotient in both engines, and a floor
        // of that double can be off by one ulp across engines
        expr(s"CAST(($budget * w) DIV sw AS BIGINT)").as("alloc_tokens"))
      .orderBy(col("source"))
  }

  /** Token-distribution drift between two corpus slices — the
    * distribution-shift monitor a production pipeline runs between
    * crawl snapshots, sources, or train/serve windows. Token
    * occurrences bucket into `buckets` hashed features (bounded table
    * by construction, same move as importanceWeights); drift is TOTAL
    * VARIATION DISTANCE, chosen over PSI/KL/χ² because TVD admits an
    * EXACT integer form: TVD = Σ_f |a_f·B − b_f·A| / (2·A·B) has ONE
    * common denominator, so the numerator is a plain integer sum
    * (DECIMAL(38,0) — a_f·B passes 2^63 near 10^12 tokens, rule 18)
    * and the only floating-point ops are the final staged divisions,
    * identical on both engines (rule 17). PSI/KL would sum per-bucket
    * logs — order-dependent doubles, not oracle-able.
    *
    * Returns the `topK` most-drifted buckets (ranked by the exact
    * integer numerator, ties by bucket id) with each bucket's
    * contribution and the corpus-wide TVD on every row. The rank/TVD
    * windows run over the `buckets`-row feature table — bounded, never
    * corpus-sized. */
  def tokenDrift(
      docs: DataFrame, isA: Column, buckets: Int = 4096, topK: Int = 50,
      oracleHash: Boolean = false): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(buckets > 0 && (buckets & (buckets - 1)) == 0,
      s"buckets must be a power of two, got $buckets")
    val h =
      if (oracleHash) graft.expressions.RollingHash(col("w"))
      else xxhash64(col("w"))
    val feats = docs
      .select(isA.as("is_a"),
        explode(TextFunctions.tokens(col("text"))).as("w"))
      .withColumn("f", pmod(h, lit(buckets.toLong))).drop("w")
      .groupBy(col("f")).agg(
        sum(when(col("is_a"), 1L).otherwise(0L)).as("a_cnt"),
        sum(when(!col("is_a"), 1L).otherwise(0L)).as("b_cnt"))
      .materializeOnce() // feeds the totals AND the per-bucket output
    tvdRank(feats, topK)
  }

  /** Exact two-sample Kolmogorov–Smirnov distance between the integer
    * `value` distributions of groups `ga` and `gb`:
    * D = max_x |F_a(x) − F_b(x)|, computed as an INTEGER rational max —
    * the per-value numerator |cum_a(x)·n_b − cum_b(x)·n_a| is maximized
    * exactly (DECIMAL(38,0) products, rule 18: cum·n passes 2^63 at
    * ~3e9 rows/side), and the single division happens once at the
    * output. The distribution-shift test to run between two crawl
    * sources before mixing them — sensitive to SHAPE where t64's TVD
    * sees hashed-bucket mass and q205's χ² sees categorical counts.
    *
    * Scale shape: one groupBy collapses both samples to the merged
    * VALUE SUPPORT (count-of-counts: bounded by the feature's domain —
    * for n_chars, max document length — not corpus size); the CDFs
    * come from [[Prefix.cumsum]]'s bucketed distributed prefix sum, so
    * even a high-cardinality support (raw timestamps, hashes) never
    * lands on one partition (VERDICT r10 directive #2 — exact, so the
    * global-window oracle is unchanged). One 1-row normalizer
    * crossJoin. */
  def ksStatistic(
      df: DataFrame, group: Column, value: Column,
      ga: String, gb: String): DataFrame = {
    val base = df.select(group.as("g"), value.cast("long").as("x"))
      .filter(col("g").isin(ga, gb))
    val hist = base.groupBy(col("x")).agg(
      sum(when(col("g") === ga, 1L).otherwise(0L)).as("ca"),
      sum(when(col("g") === gb, 1L).otherwise(0L)).as("cb"))
    val cum = Prefix.cumsum(hist, "x",
        Seq("ca" -> "fa", "cb" -> "fb"), inclusive = true)
      .select(col("x"), col("fa"), col("fb"))
    val tot = base.agg(
      sum(when(col("g") === ga, 1L).otherwise(0L)).as("na"),
      sum(when(col("g") === gb, 1L).otherwise(0L)).as("nb"))
    def D(c: Column) = c.cast("decimal(38,0)")
    cum.crossJoin(broadcast(tot))
      .select(col("na"), col("nb"),
        abs(D(col("fa")) * col("nb") - D(col("fb")) * col("na")).as("num"))
      .groupBy(col("na"), col("nb")).agg(max(col("num")).as("dnum"))
      .select(col("na"), col("nb"),
        col("dnum").cast("double").as("d_num"),
        (col("dnum").cast("double") /
          (D(col("na")) * col("nb")).cast("double")).as("ks_d"))
  }

  /** Exact Mann–Whitney U (Wilcoxon rank-sum) between the integer
    * `value` distributions of groups `ga`/`gb`, via count-of-counts
    * mid-ranks: for a distinct value with group counts (ca, cb) and
    * `before` items below it, every a-item there carries DOUBLED
    * mid-rank 2·before + (ca+cb) + 1 — an integer, so the tie-corrected
    * rank sum R2 = Σ ca·(2·before + c + 1) and the doubled statistic
    * u2 = R2 − na(na+1) stay exact (DECIMAL(38,0) products, rule 18).
    * auc = u2 / (2·na·nb) = P(a>b) + ½P(a=b) is the common-language
    * effect size, emitted as one division of exact integers. The
    * rank-based sibling of [[ksStatistic]]: KS asks "do the CDFs ever
    * separate", U asks "does one distribution stochastically dominate".
    *
    * Scale shape: identical to ksStatistic — corpus collapses to the
    * merged value support first; `before` comes from the exclusive
    * [[Prefix.cumsum]], so no single-partition window exists for ANY
    * support cardinality. */
  def mannWhitney(
      df: DataFrame, group: Column, value: Column,
      ga: String, gb: String): DataFrame = {
    def D(c: Column) = c.cast("decimal(38,0)")
    val base = df.select(group.as("g"), value.cast("long").as("x"))
      .filter(col("g").isin(ga, gb))
    val hist = base.groupBy(col("x")).agg(
        sum(when(col("g") === ga, 1L).otherwise(0L)).as("ca"),
        sum(when(col("g") === gb, 1L).otherwise(0L)).as("cb"))
      .withColumn("cc", col("ca") + col("cb"))
    val cum = Prefix.cumsum(hist, "x",
        Seq("cc" -> "before"), inclusive = false)
      .select(col("ca"), col("cc").as("c"), col("before"))
    val tot = base.agg(
      sum(when(col("g") === ga, 1L).otherwise(0L)).as("na"),
      sum(when(col("g") === gb, 1L).otherwise(0L)).as("nb"))
    cum
      .agg(sum(D(col("ca")) * (lit(2L) * col("before") + col("c") + 1L))
        .as("r2"))
      .crossJoin(broadcast(tot)) // 1-row normalizer
      .select(col("na"), col("nb"),
        (col("r2") - D(col("na")) * (col("na") + 1L)).cast("double")
          .as("u2_a"),
        ((col("r2") - D(col("na")) * (col("na") + 1L)).cast("double") /
          (lit(2L).cast("decimal(38,0)") * col("na") * col("nb"))
            .cast("double")).as("auc"))
  }

  /** Exact quantile normalization of group `gb`'s integer `value`
    * distribution onto group `ga`'s (the batch-effect correction /
    * corpus length-matching primitive): each distinct b-value x maps to
    * the smallest a-value y whose CDF position reaches x's —
    * mapped(x) = min{ y : cum_a(y)·n_b ≥ cum_b(x)·n_a }, an integer
    * cross-multiplied quantile lookup with NO division anywhere
    * (DECIMAL(38,0) products, rule 18). Always defined: the largest
    * a-value satisfies the inequality for every x.
    *
    * Scale shape: both samples collapse to their value supports
    * (count-of-counts); the threshold join is support×support bounded —
    * domain-sized on both sides, never corpus rows — and plans as a
    * broadcast non-equi join over the (bounded) a-support. Output: one
    * row per distinct b-value, total order. */
  def quantileNormalize(
      df: DataFrame, group: Column, value: Column,
      ga: String, gb: String): DataFrame = {
    def D(c: Column) = c.cast("decimal(38,0)")
    val base = df.select(group.as("g"), value.cast("long").as("x"))
      .filter(col("g").isin(ga, gb))
    // per-group CDF via the distributed prefix sum (directive #2): the
    // support-sized frame never collapses to one partition
    def cum(gname: String, xc: String, fc: String) = Prefix.cumsum(
        base.filter(col("g") === gname)
          .groupBy(col("x")).agg(count(lit(1)).as("c")),
        "x", Seq("c" -> fc), inclusive = true)
      .select(col("x").as(xc), col(fc))
    val ca = cum(ga, "y", "fa")
    val cb = cum(gb, "x", "fb")
    val nb = base.groupBy().agg(
      sum(when(col("g") === ga, 1L).otherwise(0L)).as("na"),
      sum(when(col("g") === gb, 1L).otherwise(0L)).as("nb"))
    cb.crossJoin(broadcast(nb)) // 1-row normalizer
      .join(broadcast(ca), D(col("fa")) * col("nb") >= D(col("fb")) * col("na"))
      .groupBy(col("x"), col("fb"))
      .agg(min(col("y")).as("mapped"))
      .select(col("x"), col("fb").as("cum_b"), col("mapped"))
      .orderBy(col("x"))
  }

  /** Calibration report (reliability diagram — DeGroot & Fienberg,
    * The Statistician 1983; the per-bin |gap| is what ECE weights, Guo
    * et al. ICML 2017) of a [0,1] `score` against a binary `label` —
    * the check a pipeline runs before
    * thresholding a quality/toxicity/educational-value classifier:
    * equal-width score bins, per-bin observed positive rate vs the
    * bin-midpoint confidence, and the |gap| that an ECE would weight.
    * Scale shape: ONE corpus groupBy to bin grain (≤ `buckets` rows);
    * every reported number is exact-integer-derived (counts), with the
    * rates/midpoints as single double divisions — no double is ever
    * SUMMED (rule 3), which is also why the scalar ECE is left to the
    * caller (a ≤`buckets`-row ordered fold, q?-style) rather than
    * emitted here. The top bin is closed ([…, 1.0] clamps in). */
  def calibrationReport(
      df: DataFrame, score: Column, label: Column,
      buckets: Int = 10): DataFrame = {
    val b = least(floor(score * lit(buckets)).cast("long"),
      lit(buckets - 1L))
    df.select(b.as("bucket"), when(label, 1L).otherwise(0L).as("y"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n"), sum(col("y")).as("n_pos"))
      .select(col("bucket"), col("n"), col("n_pos"),
        (col("n_pos").cast("double") / col("n").cast("double"))
          .as("obs_rate"),
        ((col("bucket").cast("double") + lit(0.5)) / lit(buckets.toDouble))
          .as("conf_mid"))
      .withColumn("gap", abs(col("obs_rate") - col("conf_mid")))
      .orderBy(col("bucket"))
  }

  /** Welch's unequal-variance t statistic between the integer `value`
    * distributions of groups `ga`/`gb` (Welch, Biometrika 1947) — the
    * mean-shift test beside t66's shape test and t68's dominance test:
    * "did the new crawl change AVERAGE document length" with no
    * equal-variance assumption.
    *
    * Exactness: the sufficient statistics (n, Σx, Σx²) are EXACT
    * DECIMAL(38,0) sums; the statistic is then a fixed double DAG over
    * those exact inputs — every step one correctly-rounded IEEE op
    * identical in both engines (the q133 contract: sqrt of / on exact
    * inputs), so the oracle hash-matches with no tolerance. Output one
    * row: (na, nb, mean_a, mean_b, t_stat, dof — Welch–Satterthwaite).
    *
    * Scale shape: ONE aggregation pass over the corpus (partial+final,
    * no join, no window), then 1-row arithmetic. */
  def welchT(
      df: DataFrame, group: Column, value: Column,
      ga: String, gb: String): DataFrame = {
    def D(c: Column) = c.cast("decimal(38,0)")
    val zero = lit(0L).cast("decimal(38,0)")
    val base = df.select(group.as("g"), value.cast("long").as("x"))
      .filter(col("g").isin(ga, gb))
    val m = base.agg(
      sum(when(col("g") === ga, 1L).otherwise(0L)).as("na"),
      sum(when(col("g") === gb, 1L).otherwise(0L)).as("nb"),
      sum(when(col("g") === ga, D(col("x"))).otherwise(zero)).as("sa"),
      sum(when(col("g") === gb, D(col("x"))).otherwise(zero)).as("sb"),
      sum(when(col("g") === ga, D(col("x")) * col("x")).otherwise(zero)).as("qa"),
      sum(when(col("g") === gb, D(col("x")) * col("x")).otherwise(zero)).as("qb"))
    def d(n: String) = col(n).cast("double")
    // the double DAG, mirrored operation-for-operation by the oracle:
    // mean = S/n; var = (Q - S*S/n)/(n-1); se2 = var/n;
    // t = (ma-mb)/sqrt(se2a+se2b); dof = (se2a+se2b)^2 /
    //     (se2a^2/(na-1) + se2b^2/(nb-1))
    m.select(col("na"), col("nb"),
        (d("sa") / d("na")).as("mean_a"), (d("sb") / d("nb")).as("mean_b"),
        ((d("qa") - d("sa") * d("sa") / d("na")) / (d("na") - lit(1.0)))
          .as("var_a"),
        ((d("qb") - d("sb") * d("sb") / d("nb")) / (d("nb") - lit(1.0)))
          .as("var_b"))
      .select(col("na"), col("nb"), col("mean_a"), col("mean_b"),
        (col("var_a") / col("na").cast("double")).as("se2_a"),
        (col("var_b") / col("nb").cast("double")).as("se2_b"),
        (col("na").cast("double") - lit(1.0)).as("dfa"),
        (col("nb").cast("double") - lit(1.0)).as("dfb"))
      .select(col("na"), col("nb"), col("mean_a"), col("mean_b"),
        ((col("mean_a") - col("mean_b")) / sqrt(col("se2_a") + col("se2_b")))
          .as("t_stat"),
        (((col("se2_a") + col("se2_b")) * (col("se2_a") + col("se2_b"))) /
          (col("se2_a") * col("se2_a") / col("dfa") +
            col("se2_b") * col("se2_b") / col("dfb"))).as("dof"))
  }

  /** Cramér's V association strength of the `rowKey` × `colKey`
    * contingency (Cramér, 1946): √(χ²/(n·min(r−1, c−1))) — the
    * normalized, size-free companion of [[chiSquareHomogeneity]]
    * (χ² grows with n even for a fixed association; V ∈ [0,1] is the
    * number a pipeline thresholds on, e.g. "is lang entangled with
    * source"). One double DAG over the chi2 output row. */
  def cramersV(df: DataFrame, rowKey: Column, colKey: Column): DataFrame =
    chiSquareHomogeneity(df, rowKey, colKey)
      .select(col("n"), col("n_rows"), col("n_cols"), col("chi2"),
        sqrt(col("chi2") / (col("n").cast("double") *
          least(col("n_rows") - 1, col("n_cols") - 1).cast("double")))
          .as("v"))

  /** Shuffle-quality audit of a deterministic corpus order: the lag-1
    * same-key adjacency count in the shuffled order vs its expectation
    * under a uniform random permutation. A bad shuffle (runs of one
    * source/domain surviving) shows ratio ≫ 1; a healthy one sits near
    * 1 — the check a pipeline runs on its curriculum BEFORE training,
    * since residual clumping inflates gradient correlation.
    *
    * The order is the q204 AVALANCHE mix — the rolling-hash fold
    * applied through the reversed decimal string of a first fold
    * (Layout.consistentShardAudit's convention, SQL-replayable). A
    * LINEAR modular permutation ([[Sampling.orderHash]]) is itself
    * measurably clumped as a shuffle: consecutive ranks differ by the
    * constant stride C⁻¹ mod P, so any key correlated with an id
    * residue class reads as runs — measured ratio 3.61 on an id-mod-7
    * key at 525k docs before the switch (ScaleProbe r11ops). Hash
    * uniqueness is the d36-style 64-bit contract, not structural
    * (fine: the audit reads a ratio, and Prefix's per-row-unique
    * requirement fails softly as ±1 rank on a collision). Ranks
    * come from [[Prefix.cumsum]] — no global window at any cardinality
    * — and adjacency is one equi-join on rank+1.
    *
    * Expectation, exact: E[same] = Σ_k c_k(c_k−1)/n (decimal sums;
    * the (n−1) pair count cancels); emitted as a double alongside the
    * observed count and their ratio. */
  def shuffleAudit(df: DataFrame, id: Column, key: Column): DataFrame = {
    def D(c: Column) = c.cast("decimal(38,0)")
    val base = df.select(id.as("did"), key.as("k"))
      .withColumn("h", graft.expressions.RollingHash(
        reverse(graft.expressions.RollingHash(col("did").cast("string"))
          .cast("string"))))
      .withColumn("one", lit(1L))
    val ranked = Prefix.cumsum(base, "h", Seq("one" -> "rk"),
        inclusive = true)
      .select(col("rk"), col("k")).materializeOnce() // both join sides
    val adj = ranked.join(
      ranked.select((col("rk") - 1).as("rk"), col("k").as("k2")), Seq("rk"))
    val obs = adj.agg(count(lit(1)).as("n_adj"),
      sum(when(col("k") === col("k2"), 1L).otherwise(0L)).as("same_adj"))
    val exp = base.groupBy(col("k")).agg(count(lit(1)).as("c"))
      .agg(sum(col("c")).as("n"),
        coalesce(sum(D(col("c")) * (col("c") - 1)),
          lit(0L).cast("decimal(38,0)")).as("s2"))
    obs.crossJoin(broadcast(exp)) // 1-row normalizer
      .select(col("n"), col("n_adj"), col("same_adj"),
        (col("s2").cast("double") / col("n").cast("double"))
          .as("expected_same"),
        (col("same_adj").cast("double") /
          (col("s2").cast("double") / col("n").cast("double"))).as("ratio"))
  }

  /** Spearman rank correlation (tie-corrected; Spearman, Am. J.
    * Psychol. 1904) between two integer features — the monotone-
    * association readout a pipeline checks between proxy signals
    * ("does char length actually track token count / quality score")
    * before substituting the cheap one for the expensive one. Pearson
    * on mid-ranks, with the t68 DOUBLED-mid-rank trick so every rank is
    * an integer: a distinct value with count ck and `before` items
    * below it carries doubled mid-rank 2·before + ck + 1.
    *
    * Exactness: the five sufficient statistics (Σc·rx, Σc·ry, Σc·rx²,
    * Σc·ry², Σc·rx·ry) are exact DECIMAL(38,0) sums over the JOINT
    * support (bounded: Σc·rx·ry ≤ n·(2n+1)² < 1e38 up to n ≈ 1e12),
    * doubling cancels in the correlation, and the statistic is one
    * fixed double DAG over the exact sums — the q133/t70 contract, so
    * the oracle hash-matches with no tolerance.
    *
    * Scale shape: one corpus groupBy to the joint (x, y) support;
    * marginal doubled ranks via [[Prefix.cumsum]] (no global window at
    * any support cardinality); two support-sized equi-joins; one
    * 1-row aggregate. */
  def spearman(df: DataFrame, xCol: Column, yCol: Column): DataFrame = {
    def D(c: Column) = c.cast("decimal(38,0)")
    val joint = df
      .select(xCol.cast("long").as("x"), yCol.cast("long").as("y"))
      .groupBy(col("x"), col("y")).agg(count(lit(1)).as("c"))
      .materializeOnce() // feeds both marginal passes AND the moments
    def ranks(k: String, rk: String) = Prefix.cumsum(
        joint.groupBy(col(k)).agg(sum(col("c")).as("ck")),
        k, Seq("ck" -> "bk"), inclusive = false)
      .select(col(k), (lit(2L) * col("bk") + col("ck") + 1L).as(rk))
    val m = joint
      .join(ranks("x", "rx"), Seq("x"))
      .join(ranks("y", "ry"), Seq("y"))
      .agg(sum(col("c")).as("n"),
        sum(D(col("c")) * col("rx")).as("sx"),
        sum(D(col("c")) * col("ry")).as("sy"),
        sum(D(col("c")) * col("rx") * col("rx")).as("sxx"),
        sum(D(col("c")) * col("ry") * col("ry")).as("syy"),
        sum(D(col("c")) * col("rx") * col("ry")).as("sxy"))
    def d(nm: String) = col(nm).cast("double")
    // the double DAG, mirrored op-for-op by the oracle:
    // rho = (n·Sxy − Sx·Sy) / sqrt((n·Sxx − Sx²) · (n·Syy − Sy²));
    // a constant margin (zero rank variance) has no defined rho → NaN,
    // guarded explicitly because ANSI mode throws on x/0 even for
    // doubles (never hit by the oracled corpus)
    val vx = d("n") * d("sxx") - d("sx") * d("sx")
    val vy = d("n") * d("syy") - d("sy") * d("sy")
    m.select(col("n").cast("bigint").as("n"),
      when(vx === 0.0 || vy === 0.0, lit(Double.NaN))
        .otherwise((d("n") * d("sxy") - d("sx") * d("sy")) /
          sqrt(vx * vy)).as("rho"))
  }

  /** Kendall rank correlation τ-b (tie-corrected; Kendall, Biometrika
    * 1938) between two integer features — the concordance companion of
    * [[spearman]]: counts agreeing vs disagreeing PAIRS, so it reads as
    * "probability a random pair sorts the same way under both
    * features" and is robust where Spearman's squared rank gaps
    * overweight far-apart swaps.
    *
    * All-pairs arithmetic on the JOINT support only: concordant
    * C = Σ c₁c₂ over support cells with x₁<x₂ ∧ y₁<y₂, discordant D
    * likewise with y₁>y₂ — exact DECIMAL(38,0) products; the doubled
    * tie terms 2n₁ = Σ cx(cx−1), 2n₂ = Σ cy(cy−1) and the doubled pair
    * total 2n₀ = n(n−1) stay decimal-exact, and
    * τ_b = 2(C−D) / √((2n₀−2n₁)(2n₀−2n₂)) is one double DAG over
    * exact inputs (the product of two ~n² terms cannot stay in
    * decimal38 — each factor casts to double first, the q136 idiom).
    *
    * Scale shape: one corpus groupBy to the joint support, then a
    * support×support inequality self-join — domain-bounded on both
    * sides (never corpus rows; the [[quantileNormalize]] contract), so
    * the operator is for DOMAIN-BOUNDED features (lengths, counts,
    * grades), not raw hashes. Margins are support-sized aggregates. */
  def kendallTau(df: DataFrame, xCol: Column, yCol: Column): DataFrame = {
    def D(c: Column) = c.cast("decimal(38,0)")
    val zero = lit(0L).cast("decimal(38,0)")
    val joint = df
      .select(xCol.cast("long").as("x"), yCol.cast("long").as("y"))
      .groupBy(col("x"), col("y")).agg(count(lit(1)).as("c"))
      .materializeOnce() // self-joined + two margin passes (rule 5)
    val cd = joint.join(
        joint.select(col("x").as("x2"), col("y").as("y2"),
          col("c").as("c2")),
        col("x") < col("x2"))
      .agg(
        coalesce(sum(when(col("y") < col("y2"), D(col("c")) * col("c2"))),
          zero).as("conc"),
        coalesce(sum(when(col("y") > col("y2"), D(col("c")) * col("c2"))),
          zero).as("disc"))
    def ties(k: String, out: String) = joint
      .groupBy(col(k)).agg(sum(col("c")).as("ck"))
      .agg(coalesce(sum(D(col("ck")) * (col("ck") - 1)), zero).as(out))
    val tot = joint.agg(sum(col("c")).as("n"))
      .select(col("n"), (D(col("n")) * (col("n") - 1)).as("t0"))
    cd.crossJoin(broadcast(tot)) // 1-row frames throughout
      .crossJoin(broadcast(ties("x", "t1")))
      .crossJoin(broadcast(ties("y", "t2")))
      .select(col("n").cast("bigint").as("n"),
        col("conc").cast("double").as("conc"),
        col("disc").cast("double").as("disc"),
        // all-tied margin → zero denominator → τ undefined (NaN),
        // guarded because ANSI throws on double x/0 (never hit by the
        // oracled corpus)
        when(col("t0") === col("t1") || col("t0") === col("t2"),
          lit(Double.NaN))
          .otherwise(lit(2.0) * (col("conc") - col("disc")).cast("double") /
            sqrt((col("t0") - col("t1")).cast("double") *
              (col("t0") - col("t2")).cast("double"))).as("tau_b"))
  }

  /** Pearson χ² test of homogeneity over the `rowKey` × `colKey`
    * contingency table (zero cells included — the full key cross
    * product contributes). Per-cell terms (O·N − R·C)²/(N·R·C) are
    * computed with an exact DECIMAL(38,0) inner difference cast to
    * DOUBLE before the square (the square of an exact 1e24-scale
    * integer cannot stay in decimal38; the cast is one correctly-
    * rounded op), then summed by a SEQUENTIAL fold over the
    * (rowKey, colKey)-sorted cell list — rule 3's determinized-
    * double-sum idiom, replayed by DuckDB's ordered list_sum. Output:
    * one row (n, n_rows, n_cols, dof, chi2).
    *
    * Scale shape: one corpus groupBy to cell grain; everything after
    * runs on the cells frame (≤ |rows|·|cols| — domain-bounded), and
    * the fold collapses it on a single bounded row. */
  def chiSquareHomogeneity(
      df: DataFrame, rowKey: Column, colKey: Column): DataFrame = {
    def D(c: Column) = c.cast("decimal(38,0)")
    val cells = df.select(rowKey.as("r"), colKey.as("c"))
      .groupBy(col("r"), col("c")).agg(count(lit(1)).as("o"))
      .materializeOnce() // feeds margins AND the full-cross left join
    val rsum = cells.groupBy(col("r")).agg(sum(col("o")).as("rs"))
    val csum = cells.groupBy(col("c")).agg(sum(col("o")).as("cs"))
    val tot = cells.agg(sum(col("o")).as("n"),
      countDistinct(col("r")).as("nr"), countDistinct(col("c")).as("nc"))
    val full = rsum.crossJoin(csum) // domain-bounded cross product
      .join(cells, Seq("r", "c"), "left")
      .withColumn("o", coalesce(col("o"), lit(0L)))
    val terms = full.crossJoin(broadcast(tot))
      .select(col("r"), col("c"), col("nr"), col("nc"), col("n"),
        ((D(col("o")) * col("n") - D(col("rs")) * col("cs"))
          .cast("double") * (D(col("o")) * col("n") - D(col("rs")) * col("cs"))
          .cast("double") /
          (D(col("n")) * col("rs") * col("cs")).cast("double")).as("term"))
    terms
      .groupBy(col("n"), col("nr"), col("nc"))
      .agg(sort_array(collect_list(struct(col("r"), col("c"), col("term"))))
        .as("ts"))
      .select(col("n"), col("nr").as("n_rows"), col("nc").as("n_cols"),
        ((col("nr") - 1) * (col("nc") - 1)).as("dof"),
        aggregate(transform(col("ts"), t => t.getField("term")),
          lit(0.0), (acc, x) => acc + x).as("chi2"))
  }

  /** The TVD arithmetic over an ALREADY-AGGREGATED (f, a_cnt, b_cnt)
    * feature frame — shared by tokenDrift (both slices in one pass)
    * and driftAgainstBaseline (slice A read from a persisted store).
    * One definition, so the store path cannot drift from the
    * recompute path. */
  private def tvdRank(feats: DataFrame, topK: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val tot = feats.agg(sum(col("a_cnt")).as("a_tot"),
      sum(col("b_cnt")).as("b_tot"))
    val d = feats.crossJoin(broadcast(tot)) // 1-row normalizer
      .withColumn("diff",
        abs(col("a_cnt").cast("decimal(38,0)") * col("b_tot")
          - col("b_cnt").cast("decimal(38,0)") * col("a_tot")))
    val all = Window.partitionBy(lit(0))
    val rk = Window.partitionBy(lit(0))
      .orderBy(col("diff").desc, col("f"))
    d.withColumn("tvd_num", sum(col("diff")).over(all))
      .withColumn("rank", row_number().over(rk))
      .filter(col("rank") <= topK)
      .select(col("rank").cast("bigint").as("rank"), col("f"),
        col("a_cnt"), col("b_cnt"),
        (col("diff").cast("double") / col("a_tot").cast("double")
          / col("b_tot").cast("double")).as("contrib"),
        (col("tvd_num").cast("double") / col("a_tot").cast("double")
          / col("b_tot").cast("double") / lit(2.0)).as("tvd"))
      .orderBy(col("rank"))
  }

  /** Hashed-unigram bucket counts of a corpus slice — the persisted
    * half of the drift-store pattern. */
  private def hashedBucketCounts(
      docs: DataFrame, buckets: Int, oracleHash: Boolean): DataFrame = {
    val h =
      if (oracleHash) graft.expressions.RollingHash(col("w"))
      else xxhash64(col("w"))
    docs.select(explode(TextFunctions.tokens(col("text"))).as("w"))
      .withColumn("f", pmod(h, lit(buckets.toLong))).drop("w")
      .groupBy(col("f")).agg(count(lit(1)).as("cnt"))
  }

  /** Persist a drift BASELINE: the bucket counts of a settled corpus
    * snapshot, written once — the monitoring edition of the d53/s51/
    * m55 "index, not recompute" pattern. A daily pipeline re-tokenizes
    * only the incoming batch; the baseline side is a `buckets`-row
    * parquet read. */
  def writeDriftBaseline(docs: DataFrame, path: String,
      buckets: Int = 4096, oracleHash: Boolean = false): Unit =
    hashedBucketCounts(docs, buckets, oracleHash)
      .write.mode("overwrite").parquet(path)

  /** tokenDrift of an incoming batch AGAINST the persisted baseline.
    * Buckets absent on one side coalesce to zero, exactly as in the
    * single-pass recompute, so the output is bit-identical to
    * tokenDrift over (baseline ∪ batch) — asserted by spec, and the
    * gate hash-matches the same oracle SQL as t51's shape. */
  def driftAgainstBaseline(
      spark: org.apache.spark.sql.SparkSession, batch: DataFrame,
      path: String, buckets: Int = 4096, topK: Int = 50,
      oracleHash: Boolean = false): DataFrame = {
    val base = spark.read.parquet(path)
      .select(col("f"), col("cnt").as("a_cnt"))
    val b = hashedBucketCounts(batch, buckets, oracleHash)
      .select(col("f"), col("cnt").as("b_cnt"))
    val feats = base.join(b, Seq("f"), "full")
      .select(col("f"),
        coalesce(col("a_cnt"), lit(0L)).as("a_cnt"),
        coalesce(col("b_cnt"), lit(0L)).as("b_cnt"))
      .materializeOnce() // feeds the totals AND the per-bucket output
    tvdRank(feats, topK)
  }

  /** Hashed-unigram importance weights for target-distribution data
    * selection — the DSIR recipe (Xie et al., "Data Selection for
    * Language Models via Importance Resampling", NeurIPS 2023): bucket
    * every token occurrence into `buckets` hashed features, estimate
    * target-mass and source-mass per feature, then score each document
    * by how much feature mass its tokens carry under the target
    * distribution versus the raw source. The feature table is bounded
    * at `buckets` rows BY CONSTRUCTION no matter the corpus size —
    * that bound is what lets it broadcast into the scoring join, so
    * the only corpus-wide shuffles are the explode-side groupBys.
    *
    * Exactness divergence (documented): DSIR proper ranks by
    * Σ log(p̂_tgt(f)/p̂_src(f)); summed libm logs are not
    * bit-reproducible across engines, so the operator emits the
    * INTEGER sufficient statistics — per-doc +1-smoothed target-mass
    * and source-mass occurrence sums — plus their single-division
    * ratio (ONE correctly-rounded IEEE op over exact int64 inputs,
    * rule 17: deterministic on both engines). Ranking by mass ratio is
    * the same monotone "more target-like than source-like" signal; a
    * consumer wanting the exact log-ratio estimator can fold it from
    * the identical statistics downstream.
    *
    * Production hash is xxhash64 (codegen); `oracleHash` swaps in the
    * RollingHash polynomial so DuckDB replays the whole pipeline
    * (CLAUDE.md rule 12). `buckets` must be a power of two: 2^64 ≡ 0
    * (mod 2^k), so signed floorMod and the oracle's unsigned HUGEINT
    * mod agree bucket-for-bucket. */
  def importanceWeights(
      docs: DataFrame, isTarget: Column, buckets: Int = 4096,
      oracleHash: Boolean = false): DataFrame = {
    require(buckets > 0 && (buckets & (buckets - 1)) == 0,
      s"buckets must be a power of two, got $buckets")
    val h =
      if (oracleHash) graft.expressions.RollingHash(col("w"))
      else xxhash64(col("w"))
    val words = docs
      .select(col("doc_id"), isTarget.as("is_target"),
        explode(TextFunctions.tokens(col("text"))).as("w"))
      .withColumn("f", pmod(h, lit(buckets.toLong)))
      .drop("w")
    // feature table: ≤ `buckets` rows regardless of corpus size →
    // broadcast-able by construction
    val feats = words.groupBy(col("f")).agg(
      sum(when(col("is_target"), 1L).otherwise(0L)).as("tgt_f"),
      count(lit(1)).as("all_f"))
    words.join(broadcast(feats), "f")
      .groupBy(col("doc_id"))
      .agg(sum(col("tgt_f") + 1).as("tgt_mass"),
        sum(col("all_f") - col("tgt_f") + 1).as("src_mass"))
      .select(col("doc_id"), col("tgt_mass"), col("src_mass"),
        (col("tgt_mass").cast("double") / col("src_mass").cast("double"))
          .as("ratio"))
  }

  /** Cross-document LINE dedup — the CCNet/C4 boilerplate pass
    * (Wenzek et al. LREC 2020 dedup paragraphs by hash across the
    * whole crawl; C4 drops any three-sentence span seen twice): a
    * line appearing in ≥ `minDocs` DISTINCT documents is boilerplate
    * (nav bars, cookie banners, license headers) and is dropped from
    * every document; survivors reassemble in original order. Operates
    * on an exploded (doc_id, pos, line) frame so the caller owns the
    * line definition (split text on '\n' in production; the gate
    * derives fixed-width token chunks since the synthetic corpus has
    * no newlines).
    *
    * Returns one row per input document: (doc_id, n_lines, n_dropped,
    * clean_md5) — the md5 of the space-rejoined surviving lines pins
    * the reassembly order, not just the counts.
    *
    * Scale shape: the line-DF aggregate is a map-side-combining
    * groupBy; the boilerplate set joins back by line value (at 100 TB
    * you'd hash lines to int64 first — the shingleHashTable move —
    * and broadcast the boilerplate set, which is small by definition:
    * it's the lines that repeat). The reassembly collect_list is
    * bounded by lines-per-document. */
  def lineDedup(lines: DataFrame, minDocs: Long = 2L): DataFrame = {
    val ln = lines.materializeOnce() // feeds DF, totals, and the anti-join
    val boiler = ln.groupBy(col("line"))
      .agg(countDistinct(col("doc_id")).as("df"))
      .filter(col("df") >= minDocs).select(col("line"))
    val totals = ln.groupBy(col("doc_id")).agg(count(lit(1)).as("n_lines"))
    val kept = ln.join(boiler, Seq("line"), "left_anti")
    val clean = kept.groupBy(col("doc_id"))
      .agg(array_join(
        transform(array_sort(collect_list(struct(col("pos"), col("line")))),
          x => x.getField("line")), " ").as("clean"),
        count(lit(1)).as("n_kept"))
    totals.join(clean, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_lines"),
        (col("n_lines") - coalesce(col("n_kept"), lit(0L))).as("n_dropped"),
        md5(coalesce(col("clean"), lit(""))).as("clean_md5"))
      .orderBy(col("doc_id"))
  }

  /** Length-aware batching efficiency — the dynamic-batching question
    * every training/inference pipeline answers before fixing its
    * collator: if documents are batched in LENGTH order instead of
    * arrival order, how much padding disappears? Within each lang
    * shard, docs are cut into `batchSize`-doc batches two ways
    * (length-sorted vs doc_id arrival); a batch's padding is
    * count·max(len) − Σlen (every member padded to the batch max).
    * All integer arithmetic — the saving ratio is the single final
    * division — so both orderings' waste hash-match exactly.
    *
    * Scale shape: windows partition by the shard (lang); at 100 TB the
    * shard key is whatever unit batches are drawn from (file, worker
    * split), keeping window partitions at shard size — there is never
    * a global sort. */
  def lengthBatchingEfficiency(
      docs: DataFrame, batchSize: Int = 32): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import graft.operators.Layout.intDiv
    val base = docs.select(col("lang"), col("doc_id"), col("n_chars"))
      .materializeOnce() // two window orderings over the same frame
    def wastePerLang(w: org.apache.spark.sql.expressions.WindowSpec,
        tag: String): DataFrame =
      base.withColumn("b",
          intDiv(row_number().over(w).cast("long") - 1L,
            lit(batchSize.toLong)))
        .groupBy(col("lang"), col("b"))
        .agg((count(lit(1)) * max(col("n_chars")) - sum(col("n_chars")))
          .as("pad"))
        .groupBy(col("lang"))
        .agg(sum(col("pad")).as(s"pad_$tag"), count(lit(1)).as(s"nb_$tag"))
    val sorted = wastePerLang(
      Window.partitionBy(col("lang")).orderBy(col("n_chars"), col("doc_id")),
      "sorted")
    val arrival = wastePerLang(
      Window.partitionBy(col("lang")).orderBy(col("doc_id")), "arrival")
    val counts = base.groupBy(col("lang")).agg(count(lit(1)).as("n_docs"))
    counts.join(sorted, Seq("lang")).join(arrival, Seq("lang"))
      .select(col("lang"), col("n_docs"), col("nb_sorted").as("n_batches"),
        col("pad_sorted"), col("pad_arrival"),
        when(col("pad_arrival") === 0L, lit(0.0))
          .otherwise((col("pad_arrival") - col("pad_sorted")).cast("double")
            / col("pad_arrival").cast("double")).as("saving"))
      .orderBy(col("lang"))
  }

  /** Fixed-width token chunks as pseudo-lines: (doc_id, pos, line) for
    * every non-empty `width`-token chunk — the gate's line definition
    * for a corpus without newlines. */
  def tokenChunkLines(docs: DataFrame, width: Int = 10): DataFrame =
    docs.select(col("doc_id"), TextFunctions.tokens(col("text")).as("toks"))
      .select(col("doc_id"), posexplode(
        transform(sequence(lit(0L),
            graft.operators.Layout.intDiv(
              size(col("toks")) + lit(width - 1), lit(width)) - 1L),
          i => array_join(slice(col("toks"), (i * width + 1).cast("int"),
            lit(width)), " ")))
        .as(Seq("pos", "line")))
      .filter(length(col("line")) > 0)
      .select(col("doc_id"), col("pos").cast("long").as("pos"), col("line"))

  /** Adjusted Rand Index between two complete partitions of the same
    * item set (Hubert & Arabie, "Comparing partitions", J. of
    * Classification 1985) — the chance-corrected agreement score, used
    * here as the dedup-QA readout: how much do two DEFINITIONS of
    * "duplicate" (e.g. MinHash-Jaccard clusters vs winnowing-
    * fingerprint clusters) agree about the corpus? ARI = 1 iff the
    * partitions are identical, ≈ 0 for independent ones.
    *
    * Exactness (rules 18/21a): the pair-count sums Σ n(n−1) run DOUBLED
    * in DECIMAL(38,0) (no Long product, no halving until the final
    * double DAG); the statistic is then one fixed shape of double ops
    * over exactly-agreed inputs, mirrored textually by the oracle, with
    * BOTH degenerate cases pinned to the identical-partition convention
    * ARI = 1 behind lazy CaseWhens: all-singleton partitions
    * (denominator 0), and n ≤ 1 joint items (where the expectation term
    * e would divide by n·(n−1) = 0 — ANSI throws, rule 21a, so the
    * n ≤ 1 branch comes FIRST and keeps e unevaluated).
    *
    * Scale shape: one equi-join to the joint assignment, one groupBy to
    * contingency grain (bounded by |clusters_a|·|clusters_b| touched
    * cells, each cell a real co-occurrence), marginal groupBys at
    * cluster grain, three 1-row frames cross-joined (broadcast
    * normalizers). Nothing quadratic in items. */
  def adjustedRandIndex(a: DataFrame, b: DataFrame): DataFrame = {
    val joint = a.select(col("doc_id"), col("cluster_id").as("x"))
      .join(b.select(col("doc_id"), col("cluster_id").as("y")), Seq("doc_id"))
    val cont = joint.groupBy(col("x"), col("y"))
      .agg(count(lit(1)).as("nij"))
      .materializeOnce() // feeds the cell sum AND both marginals
    val s1 = cont.agg(sum(col("nij")).as("n"),
      sum(col("nij").cast("decimal(38,0)") * (col("nij") - 1)).as("sij2"))
    val s2 = cont.groupBy(col("x")).agg(sum(col("nij")).as("ai"))
      .agg(sum(col("ai").cast("decimal(38,0)") * (col("ai") - 1)).as("sa2"))
    val s3 = cont.groupBy(col("y")).agg(sum(col("nij")).as("bj"))
      .agg(sum(col("bj").cast("decimal(38,0)") * (col("bj") - 1)).as("sb2"))
    val e = col("sa2").cast("double") * col("sb2").cast("double") /
      (col("n").cast("double") * (col("n") - 1))
    val denom = (col("sa2").cast("double") + col("sb2").cast("double")) /
      lit(2.0) - e
    s1.crossJoin(broadcast(s2)).crossJoin(broadcast(s3)) // 1-row normalizers
      .select(col("n").cast("bigint").as("n_items"),
        col("sa2").cast("double").as("sa2"),
        col("sb2").cast("double").as("sb2"),
        col("sij2").cast("double").as("sij2"),
        when(col("n") <= 1, lit(1.0)) // before e: n(n-1)=0 would throw
          .when(denom === 0.0, lit(1.0))
          .otherwise((col("sij2").cast("double") - e) / denom).as("ari"))
      .orderBy(col("n_items"))
  }

  /** Self-BLEU-style corpus overlap precision (the diversity readout of
    * Zhu et al., "Texygen: a benchmarking platform for text generation
    * models", SIGIR 2018, at corpus scale): per document and n-gram
    * order, the CLIPPED modified n-gram precision of the document
    * against the rest of the corpus — numerator Σ_g min(c_doc(g),
    * c_corpus(g) − c_doc(g)), denominator the document's total n-gram
    * count. p_n → 1 marks a document whose phrasing the corpus already
    * contains wholesale (low diversity / templated); p_n → 0 marks
    * novel text. Emitted as exact integer numerator/denominator per
    * order plus the single-division ratio (rule 17) — no geometric
    * mean, so no float summation anywhere.
    *
    * Scale shape: per order, one explode → (doc, gram) groupBy (map-
    * side combined) → gram-grain corpus counts → one equi-join back.
    * `hashGrams` (production default) shuffles 8-byte xxhash64 keys
    * instead of gram strings; the gate runs exact strings (the count
    * contract is hash-free, so the oracle needs no polynomial replay). */
  def selfOverlapPrecision(docs: DataFrame, ns: Seq[Int] = Seq(2, 3),
      hashGrams: Boolean = true): DataFrame = {
    val words = docs.repartition(col("doc_id"))
      .select(col("doc_id"), TextFunctions.tokens(col("text")).as("toks"))
      .materializeOnce() // feeds every order's explode
    val perN = ns.map { n =>
      val grams = words.select(col("doc_id"),
          explode(TextFunctions.windowsFromTokens(col("toks"), n)).as("gs"))
        .select(col("doc_id"),
          (if (hashGrams) xxhash64(col("gs")) else col("gs")).as("g"))
      val dc = grams.groupBy(col("doc_id"), col("g"))
        .agg(count(lit(1)).as("cd"))
        .materializeOnce() // feeds corpus counts AND the clip join
      val cc = dc.groupBy(col("g")).agg(sum(col("cd")).as("ct"))
      dc.join(cc, Seq("g"))
        .groupBy(col("doc_id"))
        .agg(sum(least(col("cd"), col("ct") - col("cd"))).as(s"num$n"),
          sum(col("cd")).as(s"den$n"))
    }
    perN.reduce((a, b) => a.join(b, Seq("doc_id")))
      .select(col("doc_id") +: ns.flatMap(n => Seq(
        col(s"num$n"), col(s"den$n"),
        (col(s"num$n").cast("double") / col(s"den$n").cast("double"))
          .as(s"p$n"))): _*)
      .orderBy(col("doc_id"))
  }

  /** Blocklist screening: per document, occurrence counts for a term
    * list plus a density flag — the toxicity/spam/boilerplate keyword
    * pass every production corpus filter runs before anything
    * model-based (e.g. the C4 "bad words" filter, Raffel et al., JMLR
    * 2020 §2.2). Matching is one whole-word alternation regex compiled
    * once — ONE scan of the text per document regardless of list size,
    * not a scan per term — and the flag is the integer cross-multiplied
    * density test hits·1000 ≥ per_mille·tokens (rule 17: no division).
    *
    * Scale shape: a pure per-row map (regexp_count + tokenCount); no
    * shuffle, no state. At 100 TB this is the cheapest full-corpus pass
    * there is; a 10k-term production list compiles into an Aho–Corasick
    * automaton behind the same per-partition map, with this regex
    * alternation as the reference semantics. Terms must be \\w-only
    * (the \\b anchors and the alternation are then identical in Java
    * and RE2 regex dialects, which is what makes the pass oracle-able
    * verbatim). */
  /** Type-coverage curve (t84): the token mass covered by the top-k
    * vocabulary types for each k — the number a tokenizer/vocab-size
    * decision actually needs (Zipf's law says a tiny head covers most
    * of the stream; this measures YOUR corpus's head instead of
    * assuming the law). Emitted as exact integers (top-k mass, total,
    * integer per-mille via the exact-remainder floor) plus the one
    * double share division.
    *
    * Scale shape: one explode → type-grain groupBy (map-side
    * combined); each top-k is a TakeOrdered (orderBy+limit — no global
    * window, no full sort: Spark keeps k rows per partition and merges
    * on the driver); the per-k aggregates run on ≤ k rows. Sums in
    * DECIMAL(38,0): total token mass at 100 TB passes what int32 holds
    * and rule 18 says never bet on 2^63 either. */
  def typeCoverage(docs: DataFrame, ks: Seq[Int] = Seq(1, 4, 16)): DataFrame = {
    val types = docs
      .select(explode(TextFunctions.tokens(col("text"))).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy(col("w")).agg(count(lit(1)).as("c"))
      .materializeOnce() // the total agg and every top-k read it
    val tot = types.agg(sum(col("c").cast("decimal(38,0)")).as("tot"),
      count(lit(1)).as("n_types"))
    val perK = ks.map { k =>
      types.orderBy(col("c").desc, col("w")).limit(k)
        .agg(sum(col("c").cast("decimal(38,0)")).as("mass"),
          count(lit(1)).as("types_used"))
        .select(lit(k.toLong).as("k"), col("types_used"), col("mass"))
    }.reduce(_.unionByName(_))
    val pm1000 = col("mass") * 1000 // decimal
    perK.crossJoin(broadcast(tot))
      .select(col("k"), col("n_types"), col("types_used"),
        col("mass").cast("bigint").as("top_mass"),
        col("tot").cast("bigint").as("total_tokens"),
        // exact floor: remainder first (decimal `/` rounds at scale 6)
        ((pm1000 - pm1000 % col("tot")) / col("tot")).cast("bigint")
          .as("per_mille"),
        (col("mass").cast("double") / col("tot").cast("double"))
          .as("share"))
      .orderBy(col("k"))
  }

  /** PII pattern classes — ONE definition feeding the Spark columns
    * AND (interpolated) the DuckDB oracle (rule 12). Deliberately
    * RE2-compatible (no backreferences, no lookaround) so the Java and
    * DuckDB regex engines agree token-for-token; each pattern is the
    * conservative high-precision form a redaction pass wants (a missed
    * exotic format costs a second pass; a false positive mangles
    * text). */
  val piiPatterns: Seq[(String, String)] = Seq(
    "email" -> "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}",
    "phone" -> "\\b\\d{3}[-.]\\d{3}[-.]\\d{4}\\b",
    "ssn" -> "\\b\\d{3}-\\d{2}-\\d{4}\\b",
    // real octets only (0-255): \d{1,3} accepted 999.999.999.999,
    // over-matching for a list documented as conservative
    // high-precision (VERDICT r12 directive #7). Alternation order is
    // longest-first so RE2/Java leftmost-first semantics agree.
    "ipv4" -> ("\\b(25[0-5]|2[0-4]\\d|1\\d\\d|[1-9]?\\d)" +
      "(\\.(25[0-5]|2[0-4]\\d|1\\d\\d|[1-9]?\\d)){3}\\b"))

  /** PII scan + redaction (t85): per document, occurrence counts per
    * PII class and the text with every match replaced by its
    * `[CLASS]` token — the pass every shipped training corpus runs
    * (and the one regulators ask about first). Counts are computed on
    * the ORIGINAL text; redaction chains the replaces in the fixed
    * declaration order, so overlapping classes resolve
    * deterministically on both engines (SSN before phone would change
    * `123-45-6789`'s fate — the order IS the contract, hence one
    * shared pattern list).
    *
    * Scale shape: a pure per-row map (regexp_count + regexp_replace);
    * no shuffle, no state — the cheapest kind of full-corpus pass. */
  def piiScan(docs: DataFrame): DataFrame = {
    val counts = piiPatterns.map { case (name, pat) =>
      regexp_count(col("text"), lit(pat)).cast("long").as(s"n_$name")
    }
    val redacted = piiPatterns.foldLeft(col("text")) {
      case (c, (name, pat)) =>
        regexp_replace(c, pat, s"[${name.toUpperCase}]")
    }
    docs.select(col("doc_id") +: counts :+ redacted.as("redacted"): _*)
      .withColumn("n_pii",
        piiPatterns.map { case (n, _) => col(s"n_$n") }.reduce(_ + _))
      .select(col("doc_id") +:
        piiPatterns.map { case (n, _) => col(s"n_$n") } :+
        col("n_pii") :+ (col("n_pii") > 0).as("has_pii") :+
        col("redacted"): _*)
      .orderBy(col("doc_id"))
  }

  def blocklistScreen(docs: DataFrame, terms: Seq[String],
      perMille: Int = 20): DataFrame = {
    require(terms.nonEmpty && terms.forall(_.matches("\\w+")),
      s"blocklist terms must be word-character-only: $terms")
    val pat = terms.mkString("\\b(", "|", ")\\b")
    docs.select(col("doc_id"),
        regexp_count(col("text"), lit(pat)).cast("long").as("n_hits"),
        TextFunctions.tokenCount(col("text")).cast("long").as("n_tokens"))
      .select(col("doc_id"), col("n_hits"), col("n_tokens"),
        (col("n_hits") * 1000L >= lit(perMille.toLong) * col("n_tokens"))
          .as("flagged"))
      .orderBy(col("doc_id"))
  }
}
