package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.operators.Materialize.Ops

/** Event-log analytics shaped for 100 TB: every operator here is
  * aggregates + equi-joins on the entity key (map-side partial
  * aggregation everywhere, no windows over unbounded partitions, no
  * driver round-trips), and every comparison runs on exact int64
  * event keys — (whole-second timestamp, sequence id) packed into one
  * BIGINT — so results are deterministic and cross-engine replayable.
  *
  * The reference has no event surface; this is extension surface in the
  * lineage of warehouse funnel/retention SQL.
  */
object EventAnalytics {

  /** Exact second-order moment term: ONE factor widened to
    * DECIMAL(38,0) BEFORE the product. `(a*b).cast(decimal)` computes
    * the product in LONG first — under ANSI mode (rule 21a) that
    * throws SparkArithmeticException the moment a single count passes
    * ~3.04e9 (√2^63), i.e. exactly at the 100 TB scale the decimal
    * SUM was chosen for, while the DuckDB oracles multiply in HUGEINT
    * and sail on. decimal(38,0) × bigint is exact (result precision
    * caps at 38; terms < 2^126). All moment sums (CUPED, OLS trend,
    * hourly ACF) go through this helper; MomentTermSpec plants a
    * >2^32 count against it. */
  def momentTerm(a: Column, b: Column): Column =
    a.cast("decimal(38,0)") * b

  /** Total event order as one BIGINT: epoch-seconds * 1e6 + seq. Whole
    * seconds are the cross-engine-safe granularity (CLAUDE.md rule 2);
    * the sequence id breaks sub-second ties deterministically. Caller
    * guarantees seq < 1e6 per corpus (gate data: event_id < 1e6). */
  def eventKey(ts: Column, seq: Column): Column =
    unix_timestamp(date_trunc("second", ts)) * lit(1000000L) + seq

  /** Strict-order funnel: for each entity, step i counts only if it
    * occurs strictly after the entity's earliest completion of step
    * i-1. Returns (funnel_depth, n_users): depth d = entities whose
    * deepest strictly-ordered prefix is steps 1..d.
    *
    * Shape: one filtered aggregate per step (min event key), chained by
    * equi-joins on the entity — step tables shrink monotonically, and
    * every aggregate combines map-side. No per-entity event arrays, no
    * sorts. */
  /** The funnel chain: table i holds (e, t_i) — each entity's earliest
    * key of step i that strictly follows its t_{i-1}. Each step table
    * is materialized once (rule 5): it feeds BOTH the next step's chain
    * join and whatever the caller unions/joins downstream — left lazy,
    * step i's subtree re-scans the event log i+1 times (the audit
    * showed 6 scans for a 3-step funnel; materialized: one pushed-down
    * scan per step, and the materialized tables are per-entity
    * aggregates, bounded by entity count, not log size). */
  private def stepTimeTables(
      events: DataFrame, entity: String, step: String,
      key: Column, steps: Seq[String]): Seq[DataFrame] = {
    val base = events.select(col(entity).as("e"), col(step).as("s"),
      key.as("k"))
    val first = base.filter(col("s") === steps.head)
      .groupBy(col("e")).agg(min(col("k")).as("t0"))
      .materializeOnce()
    steps.tail.zipWithIndex.foldLeft(Seq(first)) {
      case (acc, (st, i)) =>
        val prev = acc.last
        acc :+ base.filter(col("s") === st)
          .join(prev.select(col("e"), col(s"t$i")), Seq("e"))
          .filter(col("k") > col(s"t$i"))
          .groupBy(col("e")).agg(min(col("k")).as(s"t${i + 1}"))
          .materializeOnce()
    }
  }

  def funnelDepths(
      events: DataFrame, entity: String, step: String,
      key: Column, steps: Seq[String]): DataFrame = {
    require(steps.nonEmpty, "funnelDepths needs at least one step")
    val stepTables = stepTimeTables(events, entity, step, key, steps)
    // depth per entity = number of chained steps present; entities with
    // no first step never appear (depth 0 is the complement — callers
    // that need it subtract from the entity universe)
    val depths = stepTables.zipWithIndex.map { case (t, i) =>
      t.select(col("e"), lit(i + 1L).as("d"))
    }.reduce(_ union _)
      .groupBy(col("e")).agg(max(col("d")).as("funnel_depth"))
    depths.groupBy(col("funnel_depth"))
      .agg(count(lit(1)).as("n_users"))
      .orderBy(col("funnel_depth"))
  }

  /** Retention cohort matrix: cohort = the entity's first-activity
    * week, one row per (cohort week, week offset) with the count of
    * distinct entities active that week. Weeks are date_trunc('week')
    * boundaries (Monday, both engines); offsets are exact integer
    * day-diffs div 7. Two aggregates + one equi-join on the entity. */
  def retentionCohorts(
      events: DataFrame, entity: String, ts: String): DataFrame = {
    val wk = date_trunc("week", col(ts))
    // materialized once (rule 5): activity feeds the cohort aggregate
    // AND the join — and it is (entities x weeks), far smaller than the
    // event log it distills
    val activity = events.select(col(entity).as("e"), wk.as("w")).distinct()
      .materializeOnce()
    val cohorts = activity.groupBy(col("e")).agg(min(col("w")).as("cohort_week"))
    activity.join(cohorts, Seq("e"))
      .groupBy(col("cohort_week"),
        ((unix_timestamp(col("w")) - unix_timestamp(col("cohort_week")))
          / lit(604800L)).cast("long").as("week_offset"))
      .agg(count(lit(1)).as("n_active"))
      .orderBy(col("cohort_week"), col("week_offset"))
  }

  /** Per-leg funnel latency quantiles — how long converting entities
    * take between consecutive funnel steps, as exact quantiles. The
    * step-time chain is [[stepTimeTables]] (shared with funnelDepths);
    * each leg joins two consecutive per-entity tables (bounded by
    * entity count, not log size) and the quantiles run on
    * [[Profiling.exactQuantiles]]' count-of-counts histogram — distinct
    * latencies ≪ converting entities, so nothing here ever sorts data.
    * Latencies are whole seconds: the event key is sec·1e6 + seq, so
    * t DIV 1e6 is the epoch second exactly and the difference is exact
    * integer math on both engines. */
  def funnelStepLatencies(
      events: DataFrame, entity: String, step: String,
      key: Column, steps: Seq[String], qs: Seq[Double]): DataFrame = {
    require(steps.size >= 2, "funnelStepLatencies needs at least two steps")
    val stepTables = stepTimeTables(events, entity, step, key, steps)
    val legs = (0 until steps.size - 1).map { i =>
      stepTables(i).select(col("e"), col(s"t$i"))
        .join(stepTables(i + 1).select(col("e"), col(s"t${i + 1}")), Seq("e"))
        .select(lit(s"${steps(i)}->${steps(i + 1)}").as("leg"),
          (expr(s"t${i + 1} DIV 1000000") - expr(s"t$i DIV 1000000"))
            .as("dt_sec"))
    }.reduce(_ union _)
    Profiling.exactQuantiles(legs, group = "leg", value = "dt_sec", qs = qs)
  }

  /** First-order Markov transition matrix of the event stream: for each
    * ordered (prev → next) event-type pair, the count and the row-
    * normalized probability — the session-model / anomaly-baseline
    * staple. Ordering uses the cross-engine-safe eventKey (second-floor
    * + sequence tiebreak, rule 2): raw ts is µs in Spark vs ns in
    * DuckDB, so sub-second order could silently diverge. Shape: one
    * lag window partitioned by entity (state scales with entities, all
    * parallel), then a count aggregate over a #types² table; the row
    * normalizer is a window over that tiny table. */
  def transitionMatrix(
      events: DataFrame, entity: String, step: String,
      key: Column): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(entity)).orderBy(col("__k"))
    val pairs = events
      .select(col(entity), col(step).as("next_type"), key.as("__k"))
      .withColumn("prev_type", lag(col("next_type"), 1).over(w))
      .filter(col("prev_type").isNotNull)
    val counts = pairs.groupBy(col("prev_type"), col("next_type"))
      .agg(count(lit(1)).as("n"))
    val wRow = org.apache.spark.sql.expressions.Window
      .partitionBy(col("prev_type"))
    counts
      .withColumn("p", col("n").cast("double")
        / sum(col("n")).over(wRow).cast("double"))
      .orderBy(col("prev_type"), col("next_type"))
  }

  /** Sequential-episode support (the 2-sequence restriction of GSP /
    * AprioriAll, Srikant & Agrawal EDBT 1996): for every ordered type
    * pair (a, b), the number of entities with SOME occurrence of a
    * strictly before SOME occurrence of b — counted once per entity.
    * Complements transitionMatrix (adjacent steps only): an episode
    * tolerates arbitrary interleaving, the "signup eventually leads to
    * purchase" question a Markov matrix can't answer.
    *
    * "Some a before some b" ⟺ min_key(a) < max_key(b), so the whole
    * computation collapses to one (entity, type) summary groupBy and a
    * type-pair self-join co-keyed on entity — per-entity work is
    * |types|², never |events|². Ordering rides the int64 event key
    * (second-floor × 1e6 + sequence id): unique per entity, so strict
    * `<` is tie-free and resolution-proof (rule 2). share is one
    * int/int double division (rule 17). */
  def episodeSupport(
      events: DataFrame, entity: String, step: String,
      key: Column): DataFrame = {
    val ut = events
      .select(col(entity).as("u"), col(step).as("t"), key.as("__k"))
      .groupBy(col("u"), col("t"))
      .agg(min(col("__k")).as("first_k"), max(col("__k")).as("last_k"))
      .materializeOnce() // both sides of the pair self-join
    val nUsers = ut.select(col("u")).distinct()
      .agg(count(lit(1)).as("n_users"))
    ut.as("a")
      .join(ut.as("b"), col("a.u") === col("b.u")
        && col("a.t") =!= col("b.t") && col("a.first_k") < col("b.last_k"))
      .groupBy(col("a.t").as("t_a"), col("b.t").as("t_b"))
      .agg(count(lit(1)).as("support"))
      .crossJoin(broadcast(nUsers)) // 1-row normalizer
      .select(col("t_a"), col("t_b"), col("support"),
        (col("support").cast("double") / col("n_users").cast("double"))
          .as("share"))
      .orderBy(col("t_a"), col("t_b"))
  }

  /** Seasonal-baseline forecastability readout (the MASE denominator
    * family, Hyndman & Koehler 2006): per series, the summed absolute
    * error of the naive forecast (previous hour) vs the seasonal-naive
    * forecast (same hour yesterday). ratio < 1 means daily seasonality
    * explains the series better than persistence — the monitoring
    * pre-check before anyone fits a real model.
    *
    * Lags are CALENDAR joins on the hour-floored timestamp (h−1h,
    * h−24h), not row-order windows, so gaps in the grid skip pairs on
    * both engines identically. Hour floors are ≥1s granularity
    * (rule 2); the error sums are exact int64 (|count diffs|); the
    * ratio is one double division of exact sums (rule 17), guarded on
    * a zero denominator.
    *
    * Scale shape: one groupBy to hour grain (bounded: series × hours),
    * then two self-equi-joins of that compact frame — never a window
    * over raw events. */
  def seasonalBaselineError(
      events: DataFrame, series: String, ts: String): DataFrame = {
    val hourly = events
      .groupBy(col(series).as("g"), date_trunc("hour", col(ts)).as("h"))
      .agg(count(lit(1)).as("c"))
      .materializeOnce() // base of both lag self-joins
    def lagError(hours: Int, nName: String, saeName: String): DataFrame =
      hourly.as("cur")
        .join(hourly.as("prev"),
          col("cur.g") === col("prev.g") &&
            col("prev.h") + expr(s"INTERVAL $hours HOURS") === col("cur.h"))
        .groupBy(col("cur.g").as("g"))
        .agg(count(lit(1)).as(nName),
          sum(abs(col("cur.c") - col("prev.c"))).as(saeName))
    lagError(1, "n_naive", "sae_naive")
      .join(lagError(24, "n_seasonal", "sae_seasonal"), Seq("g"))
      .select(col("g").as(series), col("n_naive"), col("sae_naive"),
        col("n_seasonal"), col("sae_seasonal"),
        when(col("sae_naive") === 0, lit(0.0))
          .otherwise(col("sae_seasonal").cast("double")
            / col("sae_naive").cast("double"))
          .as("seasonal_vs_naive"))
      .orderBy(col(series))
  }

  /** Top entry journeys: each entity's first `depth` steps in event
    * order, folded to a `a>b>c` path string, ranked by how many
    * entities share the path — the Sankey-diagram feed and the
    * aggregate view q150's pairwise transition matrix can't give
    * (a Markov matrix forgets position; a path keeps it).
    *
    * Determinism: ordering is the unique int64 event key (rule 2), the
    * per-entity fold sorts the COLLECTED (rank, step) structs (bounded
    * at `depth` rows per entity), and the final rank breaks count ties
    * on the path string — total order throughout. Counts exact. */
  def topPaths(
      events: DataFrame, entity: String, step: String, key: Column,
      depth: Int = 3, topN: Int = 20): DataFrame = {
    require(depth >= 1 && topN >= 1, "depth and topN must be >= 1")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(entity)).orderBy(col("__k"))
    val first = events
      .select(col(entity), col(step).as("__s"), key.as("__k"))
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= depth)
    val paths = first.groupBy(col(entity))
      .agg(sort_array(collect_list(struct(col("__rn"), col("__s")))).as("a"))
      .select(
        concat_ws(">", transform(col("a"), x => x.getField("__s"))).as("path"),
        size(col("a")).cast("bigint").as("depth"))
    paths.groupBy(col("path"), col("depth"))
      .agg(count(lit(1)).as("n_entities"))
      .orderBy(col("n_entities").desc, col("path"))
      .limit(topN)
  }

  /** Two-proportion A/B significance gate: among entities with ≥1
    * `denomType` event, does the share reaching `numType` differ
    * between cohorts (entity id parity) at |z| > 2? The frequentist
    * companion to q169's CUPED readout, shipped as the q163 idiom —
    * the pooled z² test multiplied out to the EXACT integer inequality
    *
    *   (c1·n2 − c2·n1)²·N  >  z²·C·(N−C)·n1·n2
    *
    * (N = n1+n2, C = c1+c2, z² = 4), so the significance verdict is a
    * theorem, not a float comparison. Products ride DECIMAL(38,0)
    * (DuckDB HUGEINT): the squared term bounds cohorts at ~10^9
    * entities before precision-38 overflow — beyond that, sample or
    * shard the test. The two proportions are single int/int divisions
    * (rule 17). Output is ONE row. */
  def twoProportionGate(
      events: DataFrame, entity: String, step: String,
      denomType: String, numType: String, zSq: Int = 4): DataFrame = {
    val per = events.groupBy(col(entity).as("u"))
      .agg(max(when(col(step) === denomType, 1L).otherwise(0L)).as("d"),
        max(when(col(step) === numType, 1L).otherwise(0L)).as("p"))
      .filter(col("d") === 1)
      .withColumn("cohort", pmod(col("u"), lit(2)))
    val g = per.groupBy(col("cohort"))
      .agg(count(lit(1)).as("n"), sum(col("p")).as("c"))
    val row = g.filter(col("cohort") === 0)
      .select(col("n").as("n1"), col("c").as("c1"))
      .crossJoin(broadcast(g.filter(col("cohort") === 1)
        .select(col("n").as("n2"), col("c").as("c2"))))
    def D(c: Column) = c.cast("decimal(38,0)")
    val bigN = D(col("n1")) + D(col("n2"))
    val bigC = D(col("c1")) + D(col("c2"))
    val diff = D(col("c1")) * D(col("n2")) - D(col("c2")) * D(col("n1"))
    row.select(col("n1"), col("c1"), col("n2"), col("c2"),
      (col("c1").cast("double") / col("n1").cast("double")).as("p1"),
      (col("c2").cast("double") / col("n2").cast("double")).as("p2"),
      (diff * diff * bigN >
        D(lit(zSq)) * bigC * (bigN - bigC) * D(col("n1")) * D(col("n2")))
        .as("significant"))
  }

  /** RFM customer segmentation (Hughes 1994 — the classic
    * recency/frequency/monetary tercile scoring): per entity, days
    * since last transaction, transaction count, and monetary total in
    * cents, each scored 1–3 against the EXACT tercile thresholds of
    * the entity population (count-of-counts quantile rule — min value
    * whose cumulative count reaches ⌈q·n⌉), composed into the familiar
    * 3-digit RFM code. Recency scores inverted (recent = 3).
    *
    * Exactness: r_days is integer DIV of epoch seconds; cents go
    * through DECIMAL(18,2)·100 (exact for 2-dp prices, rule 1); scores
    * are integer CASE ladders against integer thresholds — the output
    * is all-int64, no floats anywhere. The ⅓/⅔ quantile literals are
    * shared with the oracle via dlit (rule 14).
    *
    * Scale shape: one entity-grain groupBy, three value-HISTOGRAM
    * quantile passes (count-of-counts — the window sorts distinct
    * metric values, not rows), three 1-row broadcast threshold
    * frames. */
  def rfmSegments(
      tx: DataFrame, entity: String, ts: String,
      amountCents: Column): DataFrame = {
    val anchor = tx.agg(max(unix_timestamp(col(ts))).as("a0"))
    val per = tx.groupBy(col(entity))
      .agg(max(unix_timestamp(col(ts))).as("last_ts"),
        count(lit(1)).as("f"), sum(amountCents).as("m_cents"))
      .crossJoin(broadcast(anchor)) // 1-row anchor
      .withColumn("r_days", expr("(a0 - last_ts) DIV 86400"))
      .drop("a0", "last_ts")
      .materializeOnce() // three quantile passes + the final scoring read
    val qs = Seq(1.0 / 3, 2.0 / 3)
    def thresholds(metric: String, p: String) =
      Profiling.exactQuantiles(per.withColumn("g", lit(1L)), "g", metric, qs)
        .groupBy(col("g"))
        .agg(min(when(col("q") === qs.head, col("q_value"))).as(s"${p}1"),
          min(when(col("q") === qs(1), col("q_value"))).as(s"${p}2"))
        .drop("g")
    def ladder(v: Column, t1: Column, t2: Column, invert: Boolean): Column = {
      val asc = when(v <= t1, 1L).when(v <= t2, 2L).otherwise(3L)
      if (invert) when(v <= t1, 3L).when(v <= t2, 2L).otherwise(1L) else asc
    }
    per
      .crossJoin(broadcast(thresholds("r_days", "tr")))
      .crossJoin(broadcast(thresholds("f", "tf")))
      .crossJoin(broadcast(thresholds("m_cents", "tm")))
      .select(col(entity), col("r_days"), col("f"), col("m_cents"),
        ladder(col("r_days"), col("tr1"), col("tr2"), invert = true).as("r_score"),
        ladder(col("f"), col("tf1"), col("tf2"), invert = false).as("f_score"),
        ladder(col("m_cents"), col("tm1"), col("tm2"), invert = false).as("m_score"))
      .withColumn("rfm",
        col("r_score") * 100 + col("f_score") * 10 + col("m_score"))
      .orderBy(col(entity))
  }

  /** One-sided integer CUSUM changepoint detector (Page 1954) over the
    * hourly count series of each `series` value: S_t = max(0, S_{t−1} +
    * c_t − k), alarm when S_t ≥ hFactor·k, with allowance k = the
    * integer ceiling of the series' mean hourly count. The standard
    * sequential drift detector, run batch — the exact-arithmetic
    * sibling of q163's window z-test (CUSUM accumulates persistent
    * small shifts a per-hour z-test never sees).
    *
    * A CUSUM is inherently sequential (each state depends on the
    * previous), which is exactly the shape `functions.aggregate` over a
    * per-group collected array handles: the series grid is TIME-bounded
    * (hours × series, independent of event volume), so collect_list per
    * group is a bounded buffer, not a data-scaled one — at 100 TB the
    * grid for a year is still 8,760 rows per series. All arithmetic is
    * int64 (exact; DuckDB replays the recurrence with a recursive CTE);
    * k's ceiling-division is integer DIV on both engines (rule 21).
    * The allowance k rides IN the fold accumulator, not as an outer
    * lambda reference (rule 4). alarm_idx is 1-based; 0 = no alarm. */
  def cusumChangepoint(
      events: DataFrame, series: String, ts: String,
      hFactor: Long = 5L): DataFrame = {
    require(hFactor >= 1, "hFactor must be >= 1")
    val hourly = events
      .groupBy(col(series).as("g"), date_trunc("hour", col(ts)).as("h"))
      .agg(count(lit(1)).as("c"))
    val agg = hourly.groupBy(col("g"))
      .agg(sort_array(collect_list(struct(col("h"), col("c")))).as("arr"),
        count(lit(1)).as("n"), sum(col("c")).as("tot"))
      .withColumn("k", expr("(tot + n - 1) DIV n"))
    val zero = struct(lit(0L).as("s"), lit(0L).as("mx"),
      lit(0L).as("alarm"), lit(0L).as("i"), col("k").as("k"))
    val folded = aggregate(col("arr"), zero, (acc, x) => {
      val i2 = acc.getField("i") + 1
      val s2 = greatest(lit(0L),
        acc.getField("s") + x.getField("c") - acc.getField("k"))
      struct(s2.as("s"),
        greatest(acc.getField("mx"), s2).as("mx"),
        when(acc.getField("alarm") > 0, acc.getField("alarm"))
          .otherwise(when(s2 >= acc.getField("k") * hFactor, i2)
            .otherwise(lit(0L))).as("alarm"),
        i2.as("i"), acc.getField("k").as("k"))
    })
    agg.select(col("g").as(series), col("n").as("n_hours"), col("k"),
        folded.getField("mx").as("max_cusum"),
        folded.getField("alarm").as("alarm_idx"))
      .orderBy(col(series))
  }

  /** Merge a per-key aggregate snapshot with the same aggregate over a
    * new batch — incremental aggregation maintenance: history is never
    * rescanned; counts and sums combine because they are commutative
    * monoids (the map-side-combine property, applied across batches).
    * Both inputs carry (key, n, total); output the same. */
  def mergeAggSnapshots(snapshot: DataFrame, batch: DataFrame,
      key: String): DataFrame = {
    val b = batch.select(col(key), col("n").as("__bn"),
      col("total").as("__bt"))
    snapshot.join(b, Seq(key), "full_outer")
      .select(col(key),
        (coalesce(col("n"), lit(0L)) + coalesce(col("__bn"), lit(0L))).as("n"),
        (coalesce(col("total"), lit(0L).cast("decimal(18,2)")) +
          coalesce(col("__bt"), lit(0L).cast("decimal(18,2)")))
          .cast("decimal(18,2)").as("total"))
  }

  /** Mergeable-histogram percentile estimates: values bucket into
    * fixed-width integer bins (one map-side-combining aggregate — the
    * 100 TB alternative to a global sort), and each requested quantile
    * reports its bin's inclusive upper bound — error ≤ binWidth,
    * deterministic, exactly replayable. `value` must be integral
    * (cents, bytes, tokens). */
  def histogramPercentiles(
      df: DataFrame, value: Column, binWidth: Long,
      quantiles: Seq[Double]): DataFrame = {
    val hist = df.select(
      graft.operators.Layout.quantizeByWidth(value, binWidth).as("bin"))
      .groupBy(col("bin")).agg(count(lit(1)).as("c"))
    // cumulative counts over ~(range/binWidth) bins — the post-process
    // is tiny relative to the scan, and the window is over bins, not rows
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("bin"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val cum = hist
      .withColumn("cum", sum(col("c")).over(w))
      .withColumn("tot", sum(col("c")).over(
        org.apache.spark.sql.expressions.Window
          .orderBy(col("bin"))
          .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
            org.apache.spark.sql.expressions.Window.unboundedFollowing)))
      // materialized once (rule 5): every quantile arm reads cum; left
      // lazy each arm re-runs the FULL scan+histogram (audit showed one
      // table scan per quantile). cum is bins-sized — tiny.
      .materializeOnce()
    val qRows = quantiles.map { q =>
      cum.filter(col("cum") * lit(100L) >= col("tot") * lit((q * 100).round))
        .orderBy(col("bin"))
        .limit(1)
        .select(lit(q).as("quantile"),
          ((col("bin") + 1) * binWidth - 1).as("upper_bound"))
    }
    qRows.reduce(_ union _).orderBy(col("quantile"))
  }

  /** Trajectory similarity top-k (q156) — behavioral-sequence search in
    * the REPOSE/top-k-trajectory lineage (ICDE 2021), Spark-first: each
    * user's journey is their event-type sequence ordered by the exact
    * int64 eventKey; journeys compare by Jaccard over DISTINCT
    * event-type trigrams; each query user gets their k most similar
    * users. The inverted-index join is the pruning — users sharing no
    * trigram are never scored — and `maxDf` drops corpus-ubiquitous
    * trigrams (the d40 DF-cap pattern) so no hot gram makes the join
    * quadratic. Sizes/intersections are exact int64; the ratio is ONE
    * int64/int64 division (rule 17), so ranking is bit-reproducible. */
  def trajectoryTopK(
      events: DataFrame, isQuery: Column, k: Int,
      maxDf: Int = 200): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id")).orderBy(col("key"))
    val grams0 = events
      .select(col("user_id"), eventKey(col("ts"), col("event_id")).as("key"),
        col("event_type"))
      .withColumn("t1", lead(col("event_type"), 1).over(w))
      .withColumn("t2", lead(col("event_type"), 2).over(w))
      .filter(col("t2").isNotNull)
      .select(col("user_id"),
        concat_ws(">", col("event_type"), col("t1"), col("t2")).as("g"))
      .distinct()
    val keep = grams0.groupBy(col("g")).agg(count(lit(1)).as("df"))
      .filter(col("df") <= maxDf).select(col("g"))
    // one materialization: grams feed sizes, the query side, and the
    // candidate side of the inverted-index join (rule 5)
    val grams = grams0.join(keep, Seq("g")).materializeOnce()
    val sizes = grams.groupBy(col("user_id")).agg(count(lit(1)).as("n"))
    val q = grams.filter(isQuery).select(col("user_id").as("q_id"), col("g"))
    val inter = q.join(grams.select(col("user_id"), col("g")), Seq("g"))
      .filter(col("user_id") =!= col("q_id"))
      .groupBy(col("q_id"), col("user_id"))
      .agg(count(lit(1)).as("inter_n"))
    val scored = inter
      .join(sizes.select(col("user_id").as("q_id"), col("n").as("qn")), Seq("q_id"))
      .join(sizes.select(col("user_id"), col("n").as("un")), Seq("user_id"))
      .select(col("q_id"), col("user_id"), col("inter_n"),
        (col("qn") + col("un") - col("inter_n")).as("union_n"))
      .withColumn("jacc",
        col("inter_n").cast("double") / col("union_n").cast("double"))
    val wr = Window.partitionBy(col("q_id"))
      .orderBy(col("jacc").desc, col("user_id"))
    scored.withColumn("rank", row_number().over(wr).cast("long"))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("user_id"), col("inter_n"), col("union_n"),
        col("jacc"), col("rank"))
  }

  /** Ingest-volume anomaly detection — the data-quality monitor a
    * pipeline runs on every source: hourly event counts per type,
    * each hour tested against its trailing window's mean ± z·std.
    * The test is the EXACT INTEGER inequality
    *   (n·x − S)² > z²·(n·Sxx − S²)
    * (multiply the usual |x−μ| > z·σ through by n² — no division, no
    * sqrt, no float boundary), so the flag is deterministic and
    * replayable. A zero-variance history flags ANY deviation — the
    * strictest honest reading. Hours with fewer than `minTrail`
    * trailing samples report false with zeroed terms (no baseline, no
    * verdict).
    *
    * Scale shape: the hourly rollup is a map-side-combining groupBy;
    * the trailing window partitions by event_type over HOURS (bounded
    * rows per partition at any event volume — the aggregation happens
    * before the window, not under it). */
  def volumeAnomalies(
      events: DataFrame, trailHours: Int = 24, z: Long = 3L,
      minTrail: Long = 12L): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val hourly = events
      .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("h"))
      .agg(count(lit(1)).as("x"))
    val w = Window.partitionBy(col("event_type")).orderBy(col("h"))
      .rowsBetween(-trailHours, -1)
    // x² and the squared/cross terms route through DECIMAL(38,0) (rule
    // 18, as in q187/q189/q192): under ANSI mode plain int64 products
    // THROW once hourly counts reach ~1.3e8 ((n·x−S)² passes 2^63) or
    // x≈3e9 (Σx² overflows) — volumes a 100 TB ingest plausibly hits.
    // The anomaly verdict compares the exact decimals; dev2/bound are
    // emitted as DOUBLE (one correctly-rounded conversion, identical in
    // both engines; DuckDB replays the products in HUGEINT).
    val withTrail = hourly.select(col("event_type"), col("h"), col("x"),
      coalesce(sum(col("x")).over(w), lit(0L)).as("s"),
      coalesce(sum(col("x").cast("decimal(38,0)") * col("x")).over(w),
        lit(0L).cast("decimal(38,0)")).as("sxx"),
      count(col("x")).over(w).as("trail_n"))
    val dev = col("trail_n").cast("decimal(38,0)") * col("x") - col("s")
    val dev2 = dev * dev
    val bound = lit(z * z) *
      (col("trail_n") * col("sxx") -
        col("s").cast("decimal(38,0)") * col("s"))
    withTrail.select(col("event_type"),
        date_format(col("h"), "yyyy-MM-dd HH:mm:ss").as("h"),
        col("x").as("n_events"), col("trail_n"),
        when(col("trail_n") >= minTrail, dev2)
          .otherwise(lit(0L).cast("decimal(38,0)")).as("dev2x"),
        when(col("trail_n") >= minTrail, bound)
          .otherwise(lit(0L).cast("decimal(38,0)")).as("boundx"))
      .select(col("event_type"), col("h"), col("n_events"), col("trail_n"),
        col("dev2x").cast("double").as("dev2"),
        col("boundx").cast("double").as("bound"),
        (col("trail_n") >= minTrail && col("dev2x") > col("boundx"))
          .as("is_anomaly"))
      .orderBy(col("event_type"), col("h"))
  }

  /** CUPED experiment readout (Deng, Xu, Kohavi & Walker, WSDM 2013) —
    * the industry-standard variance-reduction for A/B metrics: each
    * user's post-period metric y is adjusted by their PRE-period
    * activity x (a covariate the treatment cannot have caused),
    * adj_mean_v = ȳ_v − θ·(x̄_v − x̄) with θ = cov(x,y)/var(x) pooled.
    *
    * Exactness: all moments (n, Σx, Σy, Σx², Σxy) are integer counts
    * summed as DECIMAL(38,0) (rule 18), θ's numerator/denominator are
    * decimal products emitted as exact BIGINT columns, and the final
    * means are a fixed tree of correctly-rounded double ops over those
    * exact integers — bit-identical in any IEEE engine. Variant
    * assignment is the deterministic hash split (q134's). One shuffle
    * at user grain; the global-moment frame is a 1-row broadcast. */
  def cupedReadout(
      events: DataFrame, cutoverTs: String,
      metricEvent: String = "purchase"): DataFrame = {
    val pre = col("ts") < to_timestamp(lit(cutoverTs))
    val perUser = events.groupBy(col("user_id")).agg(
      sum(when(pre, 1L).otherwise(0L)).as("x"),
      sum(when(!pre && col("event_type") === metricEvent, 1L)
        .otherwise(0L)).as("y"))
      .materializeOnce() // feeds the global moments AND per-variant sums
    val g = perUser.agg(
      count(lit(1)).as("n"),
      sum(col("x").cast("decimal(38,0)")).as("sx"),
      sum(col("y").cast("decimal(38,0)")).as("sy"),
      // momentTerm widens a factor BEFORE the product (ANSI overflow
      // seam, rule 21a); the oracle multiplies in HUGEINT
      sum(momentTerm(col("x"), col("x"))).as("sxx"),
      sum(momentTerm(col("x"), col("y"))).as("sxy"))
    val v = perUser
      .groupBy(when(Sampling.hashBucket(col("user_id"), 100) < 50, "A")
        .otherwise("B").as("variant"))
      .agg(count(lit(1)).as("n_users"),
        sum(col("x").cast("decimal(38,0)")).as("sx_v"),
        sum(col("y").cast("decimal(38,0)")).as("sy_v"))
    def d(c: Column): Column = c.cast("double")
    v.crossJoin(broadcast(g))
      .withColumn("theta_num",
        expr("cast(n as decimal(38,0)) * sxy - sx * sy"))
      .withColumn("theta_den",
        expr("cast(n as decimal(38,0)) * sxx - sx * sx"))
      .select(col("variant"), col("n_users"),
        col("sy_v").cast("bigint").as("sum_y"),
        col("sx_v").cast("bigint").as("sum_x"),
        col("theta_num").cast("bigint").as("theta_num"),
        col("theta_den").cast("bigint").as("theta_den"),
        (d(col("sy_v")) / d(col("n_users"))).as("mean_y"),
        (d(col("sy_v")) / d(col("n_users"))
          - (d(col("theta_num")) / d(col("theta_den")))
            * (d(col("sx_v")) / d(col("n_users")) - d(col("sx")) / d(col("n"))))
          .as("adjusted_mean_y"))
      .orderBy(col("variant"))
  }

  /** Long-run (stationary) distribution of the [[transitionMatrix]]
    * chain via integer fixed-point power iteration — where the user
    * population settles if the observed one-step dynamics keep running,
    * the canonical summary a transition matrix exists to produce.
    *
    * Exactness contract (the q148-PageRank idiom on a Markov chain):
    * mass is carried as int64 units of 1/scale; each step computes
    * π'(j) = Σ_i ⌊π(i)·c(i,j) / rowsum(i)⌋ — per-term floor, then an
    * integer sum, so every round is exact and replayable (DuckDB `//`
    * truncates identically on these non-negative operands, rule 21).
    * Valid while scale·max(c) < 2^63 (scale=10⁹ → 9.2×10⁹ transitions
    * per matrix cell). States are the DISTINCT `prev` types (each has
    * rowsum ≥ 1 by construction); mass flowing into a next-only state
    * leaves the chain, and a state receiving no mass stays in the
    * output at 0.
    *
    * Scale shape: the corpus-sized work is q150's lag + pair groupBy;
    * the collected matrix is |types|² rows — the driver-held artifact
    * (like k-means centroids or BPE merges), iterated in exact Long
    * arithmetic with zero per-iteration jobs. */
  def markovStationary(
      events: DataFrame, entity: String, step: String, key: Column,
      iters: Int, scale: Long = 1000000000L): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(entity)).orderBy(col("__k"))
    val pairs = events
      .select(col(entity), col(step).as("next_type"), key.as("__k"))
      .withColumn("prev_type", lag(col("next_type"), 1).over(w))
      .filter(col("prev_type").isNotNull)
    val m = pairs.groupBy(col("prev_type"), col("next_type"))
      .agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    require(m.nonEmpty, "markovStationary needs at least one transition")
    val rowsum = m.groupBy(_._1).map { case (s, rs) => s -> rs.map(_._3).sum }
    val states = m.map(_._1).distinct.sorted
    var pi: Map[String, Long] = states.map(_ -> scale / states.length).toMap
    (1 to iters).foreach { _ =>
      val next = scala.collection.mutable.Map.empty[String, Long]
        .withDefaultValue(0L)
      m.foreach { case (i, j, c) =>
        // driver-side Long math sits OUTSIDE ANSI protection: enforce the
        // documented scale·max(c) < 2^63 validity bound loudly instead of
        // wrapping silently past it (plan-level siblings throw via ANSI)
        pi.get(i).foreach(mass =>
          next(j) += Math.multiplyExact(mass, c) / rowsum(i)) }
      pi = states.map(s => s -> next(s)).toMap
    }
    val spark = events.sparkSession
    import spark.implicits._
    states.toSeq.map(s => (s, pi(s), pi(s).toDouble / scale.toDouble))
      .toDF("state", "pi_scaled", "pi")
      .orderBy(col("state"))
  }

  /** Exact OLS trend of daily event volume: slope, intercept and r² of
    * count-per-day regressed on the day index, each as ONE division of
    * two exactly-computed integers (closed-form normal equations:
    * slope = (nΣxy−ΣxΣy)/(nΣx²−(Σx)²), intercept = (ΣyΣx²−ΣxΣxy)/den,
    * r² = num²/(den·(nΣy²−(Σy)²))) — the q133/q187 exact-rational
    * idiom applied to regression, so the fit hash-matches across
    * engines with no iterative solver and no error-prone float sums.
    *
    * Scale shape: the corpus reduces to the per-day histogram in one
    * groupBy (the only corpus-sized shuffle); the regression itself
    * runs over day-count rows. Sums accumulate as DECIMAL(38,0)
    * (CLAUDE.md rule 18 — daily volumes square past 2^63 at 100 TB);
    * the final casts to DOUBLE are exact while |num|,|den| < 2^53,
    * which holds through ~10⁵ days × 10⁸ events/day for the slope
    * terms (r²'s squared numerator binds first; it is a RATIO of
    * same-scale quantities, so shrinking the day bucket restores
    * headroom long before the fit loses meaning). */
  def olsTrend(events: DataFrame, ts: Column = col("ts")): DataFrame = {
    val daily = events.groupBy(to_date(ts).as("day"))
      .agg(count(lit(1)).as("y"))
    val d0 = daily.agg(min(col("day")).as("d0")) // 1-row normalizer
    val xy = daily.crossJoin(broadcast(d0))
      .select(datediff(col("day"), col("d0")).cast("long").as("x"), col("y"))
    def D(c: Column) = c.cast("decimal(38,0)")
    def dbl(c: Column) = c.cast("double")
    xy.agg(count(lit(1)).as("n"),
        sum(D(col("x"))).as("sx"), sum(D(col("y"))).as("sy"),
        // momentTerm widens a factor before the product (rule 21a)
        sum(momentTerm(col("x"), col("x"))).as("sxx"),
        sum(momentTerm(col("x"), col("y"))).as("sxy"),
        sum(momentTerm(col("y"), col("y"))).as("syy"))
      .withColumn("num", expr("cast(n as decimal(38,0)) * sxy - sx * sy"))
      .withColumn("den", expr("cast(n as decimal(38,0)) * sxx - sx * sx"))
      .withColumn("deny", expr("cast(n as decimal(38,0)) * syy - sy * sy"))
      .select(col("n").as("n_days"),
        (dbl(col("num")) / dbl(col("den"))).as("slope"),
        (dbl(expr("sy * sxx - sx * sxy")) / dbl(col("den"))).as("intercept"),
        (dbl(expr("num * num")) / dbl(expr("den * deny"))).as("r2"))
      .orderBy(col("n_days"))
  }

  /** Sliding-window burst detection: per user, the maximum number of
    * events inside ANY `windowSec`-second window (a RANGE frame over
    * whole-second epoch — frame membership is value-defined, so peer
    * order within a second cannot change the count and the result is
    * exactly replayable), plus a boolean flag at `threshold` — the
    * rate-limit / bot-detection primitive run before ingesting a
    * crawl's event stream.
    *
    * Scale shape: ONE shuffle (partition by user); the RANGE window
    * scans each user's ordered events once. No self-join — the naive
    * pairwise formulation this replaces is O(events²) per hot user. */
  def maxBurst(events: DataFrame, windowSec: Int, threshold: Long,
      entity: String = "user_id", ts: Column = col("ts")): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(entity)).orderBy(col("sec"))
      .rangeBetween(-(windowSec - 1L), 0L)
    events.select(col(entity), ts.cast("long").as("sec"))
      .withColumn("burst", count(lit(1)).over(w))
      .groupBy(col(entity))
      .agg(count(lit(1)).as("n_events"), max(col("burst")).as("max_burst"))
      .select(col(entity), col("n_events"), col("max_burst"),
        (col("max_burst") >= threshold).as("flagged"))
      .orderBy(col(entity))
  }

  /** Inter-arrival-time histogram: per-user gaps between consecutive
    * events, bucketed by integer log₂ of the whole-second gap — the
    * traffic-shape diagnostic (human activity is heavy-tailed across
    * buckets; bot/replay traffic spikes one bucket). The bucket is
    * length(bin(gap)) — the binary-representation length, an exact
    * integer both engines compute identically (no floating log).
    * Zero-gap pairs (same wall-clock second) land in bucket 0.
    *
    * Scale shape: one shuffle (partition by user), a lag window, and
    * an output bounded by 64 buckets.
    *
    * `key` is the lag tie-break within a second (like episodeSupport /
    * topPaths / markovStationary take theirs) — callers whose table has
    * no `event_id` pass their own unique column. */
  def interArrivalHistogram(events: DataFrame,
      entity: String = "user_id", ts: Column = col("ts"),
      key: Column = col("event_id")): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(entity)).orderBy(col("sec"), col("eid"))
    events
      .select(col(entity), ts.cast("long").as("sec"), key.as("eid"))
      .withColumn("gap", col("sec") - lag(col("sec"), 1).over(w))
      .filter(col("gap").isNotNull)
      .select(when(col("gap") === 0, lit(0L))
        .otherwise(length(bin(col("gap"))).cast("long")).as("bucket"),
        col("gap"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_gaps"), min(col("gap")).as("min_gap"),
        max(col("gap")).as("max_gap"))
      .orderBy(col("bucket"))
  }

  /** Discrete churn life table: for each activity age k (days between
    * a user's first and last event), the at-risk count (users whose
    * observed age is ≥ k), observed churns at k, right-censored users
    * at k (their last day IS the corpus' last day — still alive), and
    * the hazard d_k / n_k as one exact division. This is the
    * Kaplan-Meier life table in count form; reporting the per-age
    * hazard instead of the cumulative product keeps every cell an
    * integer or a single int÷int division (rule 17) — the survival
    * curve is a trivial client-side fold of these rows.
    *
    * Scale shape: one groupBy user (the corpus shuffle), then the age
    * histogram; the at-risk reverse-cumulative window runs over
    * DISTINCT ages — output-sized at any corpus size (the zipfCurve /
    * count-of-counts argument). That contract is ENFORCED, not assumed
    * (r11 directive #7): every age entering the window must be a
    * calendar-day count in [0, maxAgeDays], so the window's input is
    * bounded by the observation horizon by construction. A caller that
    * feeds a non-day-grain age (e.g. a raw seconds diff) fails loudly
    * with the contract named instead of silently building the
    * unbounded-global-window scale bug rule 23 exists to prevent. */
  def churnHazard(events: DataFrame, entity: String = "user_id",
      ts: Column = col("ts"), maxAgeDays: Long = 40000L): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val users = events.groupBy(col(entity))
      .agg(min(to_date(ts)).as("f"), max(to_date(ts)).as("l"))
    val gmax = events.agg(max(to_date(ts)).as("gmax")) // 1-row normalizer
    val hist = users.crossJoin(broadcast(gmax))
      .select(datediff(col("l"), col("f")).cast("long").as("age"),
        when(col("l") === col("gmax"), 1L).otherwise(0L).as("cens"))
      .groupBy(col("age"))
      .agg(count(lit(1)).as("n_at_age"),
        sum(lit(1L) - col("cens")).as("deaths"),
        sum(col("cens")).as("censored"))
      // the guard rides on the output column so pruning can't drop it;
      // assert_true is NULL on success, so the `when` passes age through
      .select(when(assert_true(col("age").between(0L, maxAgeDays),
          lit(s"churnHazard contract: age support must be calendar-day " +
            s"grain in [0, $maxAgeDays] (got a value outside) — feed " +
            "day-floored timestamps or raise maxAgeDays")).isNull,
          col("age")).as("age"),
        col("n_at_age"), col("deaths"), col("censored"))
    val atRisk = Window.orderBy(col("age"))
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    hist.select(col("age"), sum(col("n_at_age")).over(atRisk).as("at_risk"),
        col("deaths"), col("censored"))
      .select(col("age"), col("at_risk"), col("deaths"), col("censored"),
        (col("deaths").cast("double") / col("at_risk").cast("double"))
          .as("hazard"))
      .orderBy(col("age"))
  }

  /** Kaplan–Meier product-limit survival curve (Kaplan & Meier,
    * "Nonparametric estimation from incomplete observations", JASA
    * 1958) over [[churnHazard]]'s life table: S(t) = Π_{s ≤ t}
    * (1 − deaths_s / at_risk_s), with users last seen on the corpus's
    * final day right-censored — the retention curve a growth team
    * actually plots, completing q191's per-age hazard with the
    * cumulative estimator.
    *
    * Exactness: deaths/at_risk are exact int64 counts; the running
    * product is a SEQUENTIAL ascending-age left fold in doubles, and
    * the oracle replays the identical multiplication sequence
    * (list_reduce over the age-ordered list), so every S(t) is
    * bit-equal — float products cannot be reassociated (unlike the
    * Prefix.cumsum integer sums), which is why the fold is explicit.
    *
    * Scale shape: everything up to the support is the churnHazard
    * chain (one user-grain groupBy + an age-grain groupBy); the fold
    * then runs on ONE row holding the age support — bounded by the
    * CALENDAR (distinct integer day-ages ≤ observation horizon), the
    * same domain-bounded contract as the q191 window it builds on. */
  def kaplanMeier(events: DataFrame, entity: String = "user_id",
      ts: Column = col("ts")): DataFrame = {
    val h = churnHazard(events, entity, ts)
      .select(col("age"), col("at_risk"), col("deaths"), col("censored"))
    val outT = "array<struct<age:bigint,at_risk:bigint,deaths:bigint," +
      "censored:bigint,s:double>>"
    h.agg(sort_array(collect_list(struct(
        col("age"), col("at_risk"), col("deaths"), col("censored"))))
        .as("sup"))
      .select(aggregate(col("sup"),
        struct(lit(1.0).as("acc"), array().cast(outT).as("out")),
        (st, x) => {
          val s = st.getField("acc") * (lit(1.0) -
            x.getField("deaths").cast("double") /
              x.getField("at_risk").cast("double"))
          struct(s.as("acc"),
            concat(st.getField("out"), array(struct(
              x.getField("age").as("age"),
              x.getField("at_risk").as("at_risk"),
              x.getField("deaths").as("deaths"),
              x.getField("censored").as("censored"),
              s.as("s")))).as("out"))
        }).getField("out").as("out"))
      .select(explode(col("out")).as("r"))
      .select(col("r.age").as("age"), col("r.at_risk").as("at_risk"),
        col("r.deaths").as("deaths"), col("r.censored").as("censored"),
        col("r.s").as("survival"))
      .orderBy(col("age"))
  }

  /** Linear multi-touch attribution with EXACT integer credit: every
    * conversion distributes `unit` credit units over its qualifying
    * touches (same user, inside the lookback window ending at the
    * conversion) by largest-remainder — base = unit DIV k per touch,
    * the unit % k leftover units to the EARLIEST touches (ts, then
    * event_id tiebreak). Exactly `unit` credit per touched conversion,
    * conserved by construction (the q133 temperature-mix allocation
    * trick applied to attribution), so the whole model is integer
    * arithmetic and replayable — no float credit that sums to 99.999.
    *
    * Scale shape: conversions×touches is an equi-join on user_id with
    * a time-bound predicate (the q83 join shape, batch form — AQE
    * handles user skew); the rank window partitions by conversion id,
    * bounded by touches-per-conversion inside one lookback window,
    * so no unbounded partitions. Output is one row per touch type. */
  def linearAttribution(
      events: DataFrame, touchTypes: Seq[String],
      convType: String = "purchase", lookbackMin: Int = 60,
      unit: Long = 100L): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val conv = events.filter(col("event_type") === convType)
      .select(col("event_id").as("conv_id"), col("user_id"),
        col("ts").as("conv_ts"))
    val touch = events.filter(col("event_type").isInCollection(touchTypes))
      .select(col("user_id"), col("event_id").as("touch_id"),
        col("event_type"), col("ts").as("touch_ts"))
    val joined = conv.join(touch, Seq("user_id"))
      .filter(col("touch_ts") <= col("conv_ts") &&
        col("touch_ts") >= col("conv_ts") -
          expr(s"INTERVAL $lookbackMin MINUTES"))
    val wr = Window.partitionBy(col("conv_id"))
      .orderBy(col("touch_ts"), col("touch_id"))
    val wk = Window.partitionBy(col("conv_id"))
    joined
      .withColumn("r", row_number().over(wr))
      .withColumn("k", count(lit(1)).over(wk))
      .withColumn("credit",
        graft.operators.Layout.intDiv(lit(unit), col("k")) +
          when(col("r") <= pmod(lit(unit), col("k")), 1L).otherwise(0L))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_touches"),
        sum(col("credit")).as("credit_units"),
        countDistinct(col("conv_id")).as("n_conversions"))
      .orderBy(col("event_type"))
  }

  /** Watermark-delay audit (q220): how late do events actually arrive?
    * Each event's LATENESS is the high-water mark of event time among
    * everything that arrived before it, minus its own event time — the
    * exact quantity a Structured Streaming watermark trades against
    * dropped data, measured on the batch corpus so the q83-family jobs
    * can pick `withWatermark` delays from numbers instead of folklore.
    * Arrival order is simulated with the injective `Sampling.orderHash`
    * permutation of event_id (a deterministic stand-in for network
    * reordering, same hash both engines — rule 12).
    *
    * The running max over arrival order is rule 23's forbidden global
    * window verbatim — it runs on [[Prefix.cummax]] (bucket maxima +
    * triangular prefix-max, bit-equal to the window by associativity);
    * the oracle keeps the plain global window. Latenesses stay in
    * exact integer µs end to end.
    *
    * Scale shape: one per-row map (hash + epoch µs), the cummax
    * decomposition (no unpartitioned window at any cardinality), one
    * event-type-grain groupBy. */
  def watermarkAudit(events: DataFrame,
      lateSec: Seq[Long] = Seq(60L, 600L)): DataFrame = {
    val ev = events.select(col("event_type"),
      unix_micros(col("ts")).as("tsus"),
      graft.operators.Sampling.orderHash(col("event_id")).as("arr"))
    val wm = graft.operators.Prefix.cummax(ev, "arr", "tsus", "wm")
      .withColumn("late_us", col("wm") - col("tsus"))
    val lateCols = lateSec.map(s =>
      sum(when(col("late_us") > s * 1000000L, 1L).otherwise(0L))
        .as(s"late_${s}s"))
    val aggs = lateCols :+ max(col("late_us")).as("max_late_us")
    wm.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_events"), aggs: _*)
      .orderBy(col("event_type"))
  }

  /** Periodicity detection via lagged autocorrelation of the hourly
    * event-count series (the Box–Jenkins sample ACF, computed at the
    * chosen lags): r(L) = (n·Σxy − Σx·Σy) / √((n·Σx²−(Σx)²)·(n·Σy²−(Σy)²))
    * over the aligned pairs (h_t, h_{t+L}) — a daily-traffic corpus
    * peaks at L = 24. Every sum is an exact integer (counts and count
    * products) carried in DECIMAL(38,0) — hourly counts at 100 TB put
    * n·Σxy far past 2^63 (rule 18) — and the statistic is then one
    * fixed shape of double ops over exactly-agreed integers (the ARI
    * pattern), with a lazy guard pinning the zero-variance degenerate
    * to NULL on both engines (rule 21a: ANSI throws on x/0.0).
    *
    * Scale shape: the corpus collapses to HOUR grain in one map-side-
    * combined groupBy; the per-lag self-join and all sums run on the
    * calendar-bounded hourly table (the q191 at-risk argument — 8,760
    * rows per year no matter how many events), broadcast on both
    * sides. */
  def hourlyAutocorrelation(events: DataFrame,
      lags: Seq[Int] = Seq(1, 6, 12, 24)): DataFrame = {
    val hourly = events
      // DIV, not `/`: int64 `/` is a DOUBLE quotient in both engines
      .select(graft.operators.Layout
        .intDiv(unix_timestamp(col("ts")), lit(3600L)).as("h"))
      .groupBy(col("h")).agg(count(lit(1)).as("c"))
    val lagged = lags.map { l =>
      hourly.select(col("h"), col("c").as("x"))
        .join(hourly.select((col("h") - l).as("h"), col("c").as("y")),
          Seq("h"))
        .select(lit(l.toLong).as("lag"), col("x"), col("y"))
    }.reduce(_.unionByName(_))
    val d = (c: String) => col(c).cast("double")
    val sums = lagged.groupBy(col("lag"))
      .agg(count(lit(1)).as("n_pairs"),
        sum(col("x").cast("decimal(38,0)")).as("sx"),
        sum(col("y").cast("decimal(38,0)")).as("sy"),
        // momentTerm widens a factor before the product: LONG x*y
        // throws under ANSI once an hourly count passes ~3.04e9 — the
        // sum widening alone (pre-r13 form) didn't protect the TERM
        sum(momentTerm(col("x"), col("y"))).as("sxy"),
        sum(momentTerm(col("x"), col("x"))).as("sxx"),
        sum(momentTerm(col("y"), col("y"))).as("syy"))
    val num = d("n_pairs") * d("sxy") - d("sx") * d("sy")
    val vx = d("n_pairs") * d("sxx") - d("sx") * d("sx")
    val vy = d("n_pairs") * d("syy") - d("sy") * d("sy")
    sums.select(col("lag"), col("n_pairs"),
        d("sxy").as("sxy"), d("sxx").as("sxx"), d("syy").as("syy"),
        when(vx * vy === 0.0, lit(null).cast("double"))
          .otherwise(num / sqrt(vx * vy)).as("acf"))
      .orderBy(col("lag"))
  }
}
