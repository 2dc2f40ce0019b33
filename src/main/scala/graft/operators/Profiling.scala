package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.operators.Materialize.Ops

/** Corpus/table profiling — the data-quality monitoring step of a
  * training-data pipeline (row counts, null rates, exact cardinalities,
  * value ranges per column), computed in ONE scan.
  *
  * The reference has no profiling surface (its `describe` analog lives
  * in pandas); this is extension surface sized for 100 TB: all per-
  * column aggregates ride a single wide aggregation (Spark plans the
  * multiple COUNT(DISTINCT)s as one Expand + aggregate — one pass over
  * the data with map-side partials, never k scans for k columns), and
  * the wide one-row result is stacked to long form driver-side-free
  * with an explode of column structs.
  */
object Profiling {

  /** One row per profiled column: (col_name, n_rows, n_null,
    * n_distinct, min_val, max_val). min/max are CAST to string so
    * mixed-type columns share one schema — exact for the string and
    * integer columns this is aimed at; float columns would hit engine-
    * specific double formatting (profile those as typed queries
    * instead). n_distinct is EXACT (count distinct), the profiling
    * default; sketch-based cardinality at higher scale is the KMV
    * operator's job (q59/q88). */
  def columnProfile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "columnProfile needs at least one column")
    val aggs = cols.flatMap { c =>
      Seq(
        count(col(c)).as(s"${c}__nn"),
        countDistinct(col(c)).as(s"${c}__nd"),
        min(col(c)).cast("string").as(s"${c}__min"),
        max(col(c)).cast("string").as(s"${c}__max"))
    }
    val one = df.agg(count(lit(1)).as("__n"), aggs: _*)
    val entries = cols.map { c =>
      struct(
        lit(c).as("col_name"),
        col("__n").as("n_rows"),
        (col("__n") - col(s"${c}__nn")).as("n_null"),
        col(s"${c}__nd").as("n_distinct"),
        col(s"${c}__min").as("min_val"),
        col(s"${c}__max").as("max_val"))
    }
    one.select(explode(array(entries: _*)).as("p"))
      .select(col("p.*"))
      .orderBy(col("col_name"))
  }

  /** k-anonymity audit over a generalization ladder (Sweeney, "k-
    * anonymity: a model for protecting privacy", 2002; Samarati's
    * generalization lattice): for each ladder level — a progressively
    * COARSER set of quasi-identifier columns, ending in full
    * suppression — report how many equivalence classes exist, how many
    * are smaller than k, and how many rows sit in those small classes
    * (the re-identifiable population). The first level with zero small
    * classes is the minimal generalization that satisfies k-anonymity.
    *
    * Scale shape: the table is aggregated ONCE, at the finest level;
    * every coarser level re-aggregates the finest CLASS TABLE (bounded
    * by distinct QI combinations, not rows) — the rollup trick, hence
    * the `require` that coarser levels use a subset of the finest
    * level's columns. Mapping-based generalizations (nation → region)
    * are expressed by pre-joining the mapped column and listing it in
    * the ladder. All counts are int64; `satisfies` is derived, not
    * computed driver-side. */
  def kAnonymityLadder(
      df: DataFrame, ladder: Seq[Seq[String]], k: Long): DataFrame = {
    require(ladder.nonEmpty && ladder.head.nonEmpty,
      "ladder needs a finest non-empty level first")
    require(ladder.tail.forall(_.forall(ladder.head.contains)),
      "every coarser level must use a subset of the finest level's columns")
    val finest = df.groupBy(ladder.head.map(col): _*)
      .agg(count(lit(1)).as("cs"))
      .materializeOnce() // class table feeds every coarser level
    val levels = ladder.zipWithIndex.map { case (cols, i) =>
      val classes =
        if (i == 0) finest
        else if (cols.isEmpty) finest.agg(sum(col("cs")).as("cs"))
        else finest.groupBy(cols.map(col): _*).agg(sum(col("cs")).as("cs"))
      classes.agg(
        count(lit(1)).as("n_classes"),
        count(when(col("cs") < k, 1)).as("n_small_classes"),
        sum(when(col("cs") < k, col("cs")).otherwise(lit(0L)))
          .as("n_rows_at_risk"))
        .select(lit(i).cast("bigint").as("level"),
          lit(cols.mkString(",")).as("quasi_ids"),
          col("n_classes"), col("n_small_classes"), col("n_rows_at_risk"),
          (col("n_small_classes") === 0).as("satisfies"))
    }
    levels.reduce(_ union _).orderBy(col("level"))
  }

  /** l-diversity ladder (Machanavajjhala et al., TKDD 2007) — the audit
    * k-anonymity misses: a class can be large (k-anonymous) yet expose
    * its members' SENSITIVE attribute because every member shares one
    * value. For each generalization level, report the equivalence
    * classes whose count of distinct sensitive values is below l, the
    * rows they expose, and the level's minimum diversity.
    *
    * Scale shape, one notch deeper than [[kAnonymityLadder]]'s rollup:
    * distinct counts don't sum across levels, but the finest
    * (QI..., sensitive) CLASS-VALUE table — bounded by distinct
    * combinations, not rows — rolls up exactly: a coarser level groups
    * it on (subset-QI, sensitive), and per-class diversity is then a
    * plain row count of that table, never a countDistinct over data. */
  def lDiversityLadder(
      df: DataFrame, ladder: Seq[Seq[String]], sensitive: String,
      l: Long): DataFrame = {
    require(ladder.nonEmpty && ladder.head.nonEmpty,
      "ladder needs a finest non-empty level first")
    require(ladder.tail.forall(_.forall(ladder.head.contains)),
      "every coarser level must use a subset of the finest level's columns")
    val base = df
      .groupBy((ladder.head :+ sensitive).map(col): _*)
      .agg(count(lit(1)).as("cs"))
      .materializeOnce() // class-value table feeds every coarser level
    val levels = ladder.zipWithIndex.map { case (cols, i) =>
      val classSens =
        if (i == 0) base
        else base.groupBy((cols :+ sensitive).map(col): _*)
          .agg(sum(col("cs")).as("cs"))
      val classes =
        if (cols.isEmpty)
          classSens.agg(count(lit(1)).as("dv"), sum(col("cs")).as("rows_"))
        else classSens.groupBy(cols.map(col): _*)
          .agg(count(lit(1)).as("dv"), sum(col("cs")).as("rows_"))
      classes.agg(
        count(lit(1)).as("n_classes"),
        count(when(col("dv") < l, 1)).as("n_low_div"),
        sum(when(col("dv") < l, col("rows_")).otherwise(lit(0L)))
          .as("risk"),
        min(col("dv")).as("min_diversity"))
        .select(lit(i).cast("bigint").as("level"),
          lit(cols.mkString(",")).as("quasi_ids"),
          col("n_classes"), col("n_low_div"),
          col("risk").cast("bigint").as("n_rows_at_risk"),
          col("min_diversity"),
          (col("n_low_div") === 0).as("satisfies"))
    }
    levels.reduce(_ union _).orderBy(col("level"))
  }

  /** t-closeness audit (Li, Li & Venkatasubramanian, ICDE 2007) —
    * the step past [[lDiversityLadder]]: an equivalence class can be
    * l-diverse yet still leak if its sensitive-value DISTRIBUTION
    * diverges from the corpus-wide one. For a categorical sensitive
    * attribute the distance is total variation:
    *   tvd(class) = ½ Σ_v |cs_v/n_c − gs_v/N|
    *              = Σ_v |cs_v·N − gs_v·n_c| / (2·n_c·N)
    * The numerator is EXACT integer arithmetic (the q187 cross-multiply
    * idiom), so the audit hash-matches: tvd is ONE division at the end,
    * and the breach verdict `tvd > tNum/tDen` cross-multiplies to the
    * integer theorem  tDen·scaled > 2·tNum·n_c·N — no float threshold.
    *
    * Scale shape: the corpus reduces to the (QI, sensitive) class-value
    * table in one shuffle (shared with the class/global margins via
    * materializeOnce); the audit grid is classes × DISTINCT sensitive
    * values — the sensitive domain is small by definition of the audit,
    * so the expansion is a broadcast nested loop over an output-sized
    * frame, never a corpus shuffle. Products accumulate as
    * DECIMAL(38,0) (rule 18: cs·N passes 2^63 near 10⁹ rows); the
    * final DOUBLE casts are exact while scaled, 2·n_c·N < 2^53. */
  def tCloseness(df: DataFrame, quasiIds: Seq[String], sensitive: String,
      tNum: Long, tDen: Long): DataFrame = {
    require(quasiIds.nonEmpty && tNum > 0 && tDen > 0)
    val qi = quasiIds.map(col)
    val base = df.groupBy((quasiIds :+ sensitive).map(col): _*)
      .agg(count(lit(1)).as("cs"))
      .materializeOnce() // feeds class margins, global margins, the grid
    val classes = base.groupBy(qi: _*).agg(sum(col("cs")).as("nc"))
    val global = base.groupBy(col(sensitive)).agg(sum(col("cs")).as("gs"))
    val total = base.agg(sum(col("cs")).as("nn")) // 1-row normalizer
    def D(c: Column) = c.cast("decimal(38,0)")
    val grid = classes
      .crossJoin(broadcast(global)) // classes × small sensitive domain
      .join(base, quasiIds :+ sensitive, "left")
      .crossJoin(broadcast(total))
      .select((qi :+ col("nc") :+ col("nn") :+
        abs(D(coalesce(col("cs"), lit(0L))) * D(col("nn"))
          - D(col("gs")) * D(col("nc"))).as("term")): _*)
    grid.groupBy(qi :+ col("nc") :+ col("nn"): _*)
      .agg(sum(col("term")).as("scaled"))
      .select((qi :+ col("nc").as("class_n") :+
        col("scaled").cast("bigint").as("tvd_scaled") :+
        (col("scaled").cast("double")
          / (D(lit(2L)) * D(col("nc")) * D(col("nn"))).cast("double"))
          .as("tvd") :+
        (D(lit(tDen)) * col("scaled") >
          D(lit(2L * tNum)) * D(col("nc")) * D(col("nn"))).as("breaches")): _*)
      .orderBy(qi: _*)
  }

  /** Key-skew diagnostics: exact Gini coefficient, max key share, and
    * cardinality of a key column — the pre-flight check before choosing
    * a partitioning/salting strategy for a join or aggregation on that
    * key.
    *
    * Scale shape: per-key counts (one shuffle at key grain) reduce to
    * the COUNT-OF-COUNTS table, whose size is bounded by the number of
    * distinct frequencies — O(√(2·rows)) worst case (~1.4M entries for
    * 10¹² rows), so the single-partition rank window over it is safe at
    * any corpus size. The Gini over grouped sorted counts is pure
    * integer arithmetic until one final division:
    *   G = 2·S/(k·T) − (k+1)/k,  S = Σ_groups c·(m·R + m(m+1)/2)
    * (c = frequency, m = #keys with it, R = rank offset, k = #keys,
    * T = rows) — exact on both engines, no double is ever summed. */
  def keySkew(df: DataFrame, key: String): DataFrame = {
    val tf = df.groupBy(col(key)).agg(count(lit(1)).as("c"))
    val cc = tf.groupBy(col("c")).agg(count(lit(1)).as("m"))
    // rank offset R = #keys with smaller frequency (cumulative m)
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("c"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val ranked = cc.select(col("c"), col("m"),
      coalesce(sum(col("m")).over(w), lit(0L)).as("r"))
    // S summed as DECIMAL(38,0): c·m·R can pass 2^63 on a trillion-row
    // corpus (DuckDB's HUGEINT sum is the mirror). Every factor is cast
    // to decimal BEFORE any product forms, so no int64 intermediate
    // exists anywhere — m·R alone can pass 2^63 under ~1e10 keys, and
    // DuckDB would auto-promote to HUGEINT where Spark wraps: an
    // engine-asymmetric failure at exactly the scale this documents.
    // m(m+1)/2 is an exact even division (decimal / 2 of an even value
    // has no fractional part, same pattern as triangleCensus); t rides
    // decimal for the same reason and lands back in bigint.
    val cD = col("c").cast("decimal(38,0)")
    val mD = col("m").cast("decimal(38,0)")
    val rD = col("r").cast("decimal(38,0)")
    ranked.agg(
        sum(col("m")).as("k"),
        sum(cD * mD).cast("bigint").as("t"),
        max(col("c")).as("top_count"),
        sum(cD * (mD * rD
          + ((mD * (mD + lit(1))) / lit(2)).cast("decimal(38,0)"))).as("s"))
      .select(
        col("k").as("n_keys"), col("t").as("n_rows"), col("top_count"),
        (col("top_count").cast("double") / col("t").cast("double"))
          .as("max_share"),
        (lit(2) * col("s").cast("double")
          / (col("k").cast("double") * col("t").cast("double"))
          - (col("k") + 1).cast("double") / col("k").cast("double"))
          .as("gini"))
  }

  /** Exact per-group quantiles of an integer-valued column at any
    * scale, via the same count-of-counts reduction as keySkew: the raw
    * rows collapse to a (group, value, frequency) histogram — O(distinct
    * values) entries, ≪ rows for any bounded-domain metric (doc length,
    * token count, status code) — and quantile q is the smallest value
    * whose within-group cumulative frequency reaches ceil(q·n)
    * (quantile_disc / type-1 semantics). The per-group cumulative
    * window runs over the histogram, never the rows, so no sort of the
    * data ever happens; everything before the final min is a groupBy.
    * Exactness needs no sketch: the histogram IS the full distribution.
    * Cross-engine: ceil(q·n) is one IEEE multiply + ceil on both
    * engines (no summation — rule-17 safe shape). */
  def exactQuantiles(
      df: DataFrame, group: String, value: String,
      qs: Seq[Double]): DataFrame = {
    require(qs.nonEmpty && qs.forall(q => q > 0 && q <= 1),
      s"quantiles must lie in (0, 1]: $qs")
    val hist = df.groupBy(col(group), col(value)).agg(count(lit(1)).as("m"))
    val wCum = org.apache.spark.sql.expressions.Window
      .partitionBy(col(group)).orderBy(col(value))
    val wAll = org.apache.spark.sql.expressions.Window
      .partitionBy(col(group))
    val cum = hist
      .withColumn("cum", sum(col("m")).over(wCum))
      .withColumn("n", sum(col("m")).over(wAll))
    // fan each histogram entry out over the (tiny, constant) quantile
    // list, then keep entries at or past their target rank; the min
    // value per (group, q) is the exact quantile
    cum
      .select(col(group), col(value), col("cum"), col("n"),
        explode(array(qs.map(lit): _*)).as("q"))
      .filter(col("cum") >= ceil(col("q") * col("n")))
      .groupBy(col(group), col("q"))
      .agg(min(col(value)).as("q_value"))
      .orderBy(col(group), col("q"))
  }

  /** Exact WEIGHTED per-group quantiles: quantile qn/den is the
    * smallest value whose within-group cumulative WEIGHT satisfies
    * cum·den ≥ qn·totalW — all-integer cross-multiplication
    * (DECIMAL(38,0) products, rule 18), no division anywhere. The
    * token-budget form of [[exactQuantiles]]: with weight = token
    * count, "below which doc length does the 90th percentile of
    * TRAINING TOKENS sit" — the number batching and truncation
    * policies actually need (a doc-count percentile underweights the
    * long documents that dominate the token budget).
    *
    * Scale shape: one groupBy to the (group, value) histogram, then
    * cumulative weights from the GROUPED [[Prefix.cumsum]] — neither a
    * big group nor a high-cardinality support ever lands on one
    * partition (exactQuantiles' per-group histogram window is fine for
    * bounded domains; this one is unconditionally scale-safe). The
    * quantile fan-out is a constant-size explode; totals are
    * group-grain (broadcast). */
  def weightedQuantiles(
      df: DataFrame, group: String, value: String, weight: String,
      qs: Seq[Int], den: Int = 100): DataFrame = {
    require(qs.nonEmpty && qs.forall(q => q > 0 && q <= den),
      s"quantile numerators must lie in (0, $den]: $qs")
    def D(c: Column) = c.cast("decimal(38,0)")
    val hist = df.groupBy(col(group), col(value))
      .agg(sum(col(weight).cast("long")).as("cw"))
    val cum = graft.operators.Prefix.cumsum(hist, value,
      Seq("cw" -> "cum"), inclusive = true, groupCols = Seq(group))
    val tot = hist.groupBy(col(group)).agg(sum(col("cw")).as("tw"))
    cum.join(broadcast(tot), Seq(group))
      .select(col(group), col(value), col("cum"), col("tw"),
        explode(array(qs.map(n => lit(n.toLong)): _*)).as("qn"))
      .filter(D(col("cum")) * lit(den.toLong) >= D(col("qn")) * col("tw"))
      .groupBy(col(group), col("qn").as("q_num"))
      .agg(min(col(value)).cast("bigint").as("q_value"))
      .select(col(group), col("q_num"), lit(den.toLong).as("q_den"),
        col("q_value"))
      .orderBy(col(group), col("q_num"))
  }

  /** Declarative data-quality expectations (Deequ/Great-Expectations-
    * shaped): each row-level check is a boolean predicate counted in ONE
    * wide aggregation over the table — k checks never cost k scans.
    * A row with a NULL predicate counts as a violation (the CASE's ELSE
    * branch), which is the conservative audit contract. Output one row
    * per check: (check_name, n_checked, n_violations, passed). */
  def rowExpectations(df: DataFrame, checks: Seq[(String, Column)]): DataFrame = {
    require(checks.nonEmpty, "rowExpectations needs at least one check")
    val aggs = checks.map { case (name, cond) =>
      sum(when(cond, 0L).otherwise(1L)).as(s"__v_$name")
    }
    val one = df.agg(count(lit(1)).as("__n"), aggs: _*)
    val entries = checks.map { case (name, _) =>
      struct(lit(name).as("check_name"), col("__n").as("n_checked"),
        col(s"__v_$name").as("n_violations"),
        (col(s"__v_$name") === 0L).as("passed"))
    }
    one.select(explode(array(entries: _*)).as("e")).select(col("e.*"))
  }

  /** Key-uniqueness expectation: violations = rows beyond the first per
    * key value (count − distinct count). One aggregate, no join. */
  def uniqueExpectation(df: DataFrame, name: String, keys: Seq[String]): DataFrame =
    df.agg(count(lit(1)).as("n"),
      countDistinct(keys.head, keys.tail: _*).as("nd"))
      .select(lit(name).as("check_name"), col("n").as("n_checked"),
        (col("n") - col("nd")).as("n_violations"),
        (col("n") === col("nd")).as("passed"))

  /** Referential-integrity expectation: violations = child rows whose
    * key has no parent (left-anti count). The parent side reduces to its
    * distinct key before the join, so at scale the anti-join runs
    * against the key set, not the parent table. */
  def referentialExpectation(
      child: DataFrame, childKey: String,
      parent: DataFrame, parentKey: String, name: String): DataFrame = {
    val orphans = child.select(col(childKey))
      .join(parent.select(col(parentKey)).distinct(),
        col(childKey) === col(parentKey), "left_anti")
      .agg(count(lit(1)).as("nv"))
    child.agg(count(lit(1)).as("n")).crossJoin(orphans)
      .select(lit(name).as("check_name"), col("n").as("n_checked"),
        col("nv").as("n_violations"), (col("nv") === 0L).as("passed"))
  }

  /** Classifier-evaluation confusion matrix: one row per
    * (truth, predicted) cell with its exact count and its share of the
    * truth class (the per-class recall decomposition — the diagonal
    * cell's share IS that class's recall). The standard eval readout
    * for any labeling stage of the pipeline (language ID, quality
    * gates, topic rules) against a trusted column.
    *
    * One groupBy at cell grain + a truth-partitioned window over the
    * TINY cell table (|classes|², never rows); share is one int/int
    * double division (rule 17, the q150 row-normalization idiom). */
  def confusionMatrix(df: DataFrame, truth: String, pred: String): DataFrame = {
    val cells = df.groupBy(col(truth).as("truth"), col(pred).as("pred"))
      .agg(count(lit(1)).as("n"))
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("truth"))
    cells
      .withColumn("share_of_truth",
        col("n").cast("double") / sum(col("n")).over(w).cast("double"))
      .orderBy(col("truth"), col("pred"))
  }

  /** Cohen's kappa (Cohen 1960) — agreement beyond chance between a
    * predicted and a trusted label: κ = (p_o − p_e)/(1 − p_e). Clearing
    * denominators turns it into the SINGLE exact division
    *
    *   κ = (A·N − Σᵢ rᵢ·cᵢ) / (N² − Σᵢ rᵢ·cᵢ)
    *
    * (A = agreeing rows, rᵢ/cᵢ = truth/pred marginals) — both
    * polynomials are exact integers on DECIMAL(38,0) (DuckDB HUGEINT,
    * rule 18; N² caps N at ~10^19 — unreachable), so the chance-
    * corrected agreement statistic hash-matches bit-for-bit. Perfect-
    * chance degenerate case (N² = Σrᵢcᵢ) reports 0.0.
    *
    * Cost: one cell-grain groupBy + marginal aggregates over the tiny
    * |classes|² cell table. */
  def cohenKappa(df: DataFrame, truth: String, pred: String): DataFrame = {
    val cells = df.groupBy(col(truth).as("t"), col(pred).as("p"))
      .agg(count(lit(1)).as("n"))
      .materializeOnce() // marginals + diagonal + total read it
    val marg = cells.groupBy(col("t")).agg(sum(col("n")).as("r"))
      .join(cells.groupBy(col("p")).agg(sum(col("n")).as("c")),
        col("t") === col("p"))
      .agg(sum(col("r").cast("decimal(38,0)") * col("c").cast("decimal(38,0)"))
        .as("s_rc"))
    val tot = cells.agg(sum(col("n")).as("n_rows"),
      sum(when(col("t") === col("p"), col("n")).otherwise(lit(0L))).as("agree"))
    val nD = col("n_rows").cast("decimal(38,0)")
    tot.crossJoin(broadcast(marg)) // two 1-row frames
      .select(col("n_rows"), col("agree"),
        col("s_rc").cast("bigint").as("sum_rc"),
        when(nD * nD === col("s_rc"), lit(0.0))
          .otherwise(
            (col("agree").cast("decimal(38,0)") * nD - col("s_rc")).cast("double")
              / (nD * nD - col("s_rc")).cast("double"))
          .as("kappa"))
  }

  /** Simpson concentration / diversity per group (Simpson 1949): for
    * each `group`, D = Σ n_i(n_i−1) / (N(N−1)) over the counts of
    * `label` values — the probability two random members share a label
    * (no logarithms, unlike Shannon entropy, so it is EXACT: integer
    * power sums plus one division). `effective_labels` = 1/D is the
    * equivalent even-label count, the mix-balance number a data-mixture
    * designer actually reads.
    *
    * The pair sums ride DECIMAL(38,0) (DuckDB HUGEINT, rule 18):
    * N(N−1) passes 2^63 already at N ≈ 3·10^9 rows per group — real at
    * 100 TB. Final values are exact-int→double casts + one division
    * each (rule 17). Two bounded groupBys, no joins. */
  def simpsonDiversity(
      df: DataFrame, group: String, label: String): DataFrame = {
    val cnt = df.groupBy(col(group), col(label)).agg(count(lit(1)).as("c"))
    val cD = col("c").cast("decimal(38,0)")
    val agg = cnt.groupBy(col(group))
      .agg(sum(col("c")).as("n_rows"), count(lit(1)).as("n_labels"),
        sum(cD * (cD - 1)).as("num"))
    val nD = col("n_rows").cast("decimal(38,0)")
    agg.select(col(group), col("n_rows"), col("n_labels"),
        when(col("n_rows") < 2, lit(0.0))
          .otherwise(col("num").cast("double")
            / (nD * (nD - 1)).cast("double")).as("simpson"),
        when(col("num") === 0, lit(0.0))
          .otherwise((nD * (nD - 1)).cast("double")
            / col("num").cast("double")).as("effective_labels"))
      .orderBy(col(group))
  }

  /** Trimmed mean per group: drop values outside the exact [lo, hi]
    * quantiles (computed by the same count-of-counts rule as
    * exactQuantiles — min value whose cumulative count reaches
    * ⌈q·n⌉), average what remains. The robust location statistic for
    * monitoring dashboards — a handful of crawler blowups can move a
    * plain mean arbitrarily, but not this one.
    *
    * Exact for integral value columns: the kept-sum is exact int64
    * (DuckDB HUGEINT → BIGINT at the boundary) and the mean is one
    * int/int double division (rule 17). Histogram + windows at
    * (group, distinct value) grain, then one join-back at value grain —
    * never a global sort of rows. */
  def trimmedMean(
      df: DataFrame, group: String, value: String,
      lo: Double = 0.1, hi: Double = 0.9): DataFrame = {
    require(lo >= 0 && hi <= 1 && lo < hi, s"bad trim bounds ($lo, $hi)")
    val qs = exactQuantiles(df, group, value, Seq(lo, hi))
    val bounds = qs.groupBy(col(group)).agg(
      min(when(col("q") === lo, col("q_value"))).as("lo_v"),
      max(when(col("q") === hi, col("q_value"))).as("hi_v"))
    df.join(bounds, Seq(group))
      .filter(col(value) >= col("lo_v") && col(value) <= col("hi_v"))
      .groupBy(col(group))
      .agg(count(lit(1)).as("n_kept"), sum(col(value)).as("kept_total"))
      .select(col(group), col("n_kept"), col("kept_total"),
        (col("kept_total").cast("double") / col("n_kept").cast("double"))
          .as("trimmed_mean"))
      .orderBy(col(group))
  }

  /** Functional-dependency conformance audit: does X → Y hold? One
    * summary row per candidate FD — total X-groups, groups where Y is
    * not unique, and the worst group's distinct-Y count. The discovery
    * primitive of FD-profiling systems (Papenbrock et al., "Functional
    * dependency discovery: an experimental evaluation", VLDB 2015),
    * restricted to candidate checking: the pipeline use case is
    * asserting a believed invariant ("brand determines manufacturer")
    * and quantifying the damage when it breaks.
    *
    * One groupBy at X grain + one global aggregate — two shuffles, all
    * counts exact int64, no collect. */
  def fdViolations(
      df: DataFrame, fdName: String, lhs: Seq[String], rhs: String): DataFrame =
    df.groupBy(lhs.map(col): _*)
      .agg(countDistinct(col(rhs)).as("__ndv"))
      .agg(count(lit(1)).as("n_groups"),
        sum(when(col("__ndv") > 1, 1L).otherwise(0L)).as("n_violating"),
        max(col("__ndv")).as("max_distinct_rhs"))
      .select(lit(fdName).as("fd"), col("n_groups"), col("n_violating"),
        col("max_distinct_rhs"), (col("n_violating") === 0L).as("holds"))

  /** The DuckDB replay, generated from the same column list so the two
    * engines cannot drift: one aggregate CTE, one UNION ALL arm per
    * column reading from it. */
  def columnProfileOracleSql(table: String, cols: Seq[String]): String = {
    val aggExprs = cols.map { c =>
      s"""count($c) AS ${c}__nn, count(DISTINCT $c) AS ${c}__nd,
         |    CAST(min($c) AS VARCHAR) AS ${c}__min,
         |    CAST(max($c) AS VARCHAR) AS ${c}__max""".stripMargin
    }.mkString(",\n    ")
    val arms = cols.map { c =>
      s"""SELECT '$c' AS col_name, n AS n_rows, n - ${c}__nn AS n_null,
         |  ${c}__nd AS n_distinct, ${c}__min AS min_val, ${c}__max AS max_val
         |FROM agg""".stripMargin
    }.mkString("\nUNION ALL\n")
    s"""WITH agg AS (
       |  SELECT count(*) AS n,
       |    $aggExprs
       |  FROM $table)
       |$arms
       |ORDER BY col_name""".stripMargin
  }
}
