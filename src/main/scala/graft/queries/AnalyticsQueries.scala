package graft.queries

import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.EventAnalytics

/** Event-log analytics (operators/EventAnalytics.scala) under the
  * oracle gate: strict-order funnels, retention cohorts, incremental
  * aggregate maintenance, and mergeable-histogram percentiles. All
  * comparisons run on exact int64 event keys (whole-second time ×
  * sequence id), so every query hash-matches.
  */
object AnalyticsQueries {

  private def T(s: org.apache.spark.sql.SparkSession, d: String, n: String) =
    Tables.load(s, d, n)

  /** DuckDB mirror of EventAnalytics.eventKey. */
  private val keySql =
    "CAST(epoch(date_trunc('second', ts)) AS BIGINT) * 1000000 + event_id"

  /** q186: exact-tercile threshold CTE over a `per` metric — the
    * count-of-counts quantile rule, with the ⅓/⅔ doubles rendered via
    * dlit so both engines compare against identical IEEE products. */
  private def rfmThrCte(metric: String, name: String): String = {
    import SimilarityQueries.dlit
    s"""$name AS (SELECT
       |  min(CASE WHEN cum >= ceil(${dlit(1.0 / 3)}*n) THEN v END) AS t1,
       |  min(CASE WHEN cum >= ceil(${dlit(2.0 / 3)}*n) THEN v END) AS t2
       |FROM (SELECT v, sum(m) OVER (ORDER BY v) AS cum,
       |             sum(m) OVER () AS n
       |      FROM (SELECT $metric AS v, count(*) AS m
       |            FROM per GROUP BY 1)))""".stripMargin
  }

  /** q194 constants — one definition drives the Scala iteration AND the
    * generated oracle CTE chain (rule 12). */
  private lazy val markovIters = 20
  private lazy val markovScale = 1000000000L

  /** q194 oracle: the q150 pair CTEs, then `markovIters` chained
    * power-iteration rounds in the identical floor arithmetic
    * (p.pi * c.n // rowsum, summed per target state), and a final LEFT
    * JOIN back to the state set so zero-mass states keep their row. */
  private lazy val markovOracle: String = {
    val steps = (1 to markovIters).map { r =>
      s"""p$r AS MATERIALIZED (SELECT c.next_type AS state,
         |  CAST(sum(p.pi * c.n // r.rowsum) AS BIGINT) AS pi
         |FROM p${r - 1} p JOIN c ON c.prev_type = p.state
         |JOIN rs r ON r.prev_type = c.prev_type
         |WHERE c.next_type IN (SELECT state FROM st)
         |GROUP BY 1)""".stripMargin
    }
    s"""WITH seq AS (
       |  SELECT user_id, event_type, $keySql AS k FROM events),
       |lagged AS (
       |  SELECT lag(event_type, 1) OVER (
       |           PARTITION BY user_id ORDER BY k) AS prev_type,
       |         event_type AS next_type FROM seq),
       |c AS MATERIALIZED (SELECT prev_type, next_type, count(*) AS n FROM lagged
       |      WHERE prev_type IS NOT NULL GROUP BY 1, 2),
       |rs AS MATERIALIZED (SELECT prev_type, CAST(sum(n) AS BIGINT) AS rowsum
       |       FROM c GROUP BY 1),
       |st AS MATERIALIZED (SELECT DISTINCT prev_type AS state FROM c),
       |p0 AS (SELECT state,
       |         $markovScale // (SELECT count(*) FROM st) AS pi FROM st),
       |${steps.mkString(",\n")}
       |SELECT st.state, CAST(COALESCE(p.pi, 0) AS BIGINT) AS pi_scaled,
       |       CAST(COALESCE(p.pi, 0) AS DOUBLE)
       |         / CAST($markovScale AS DOUBLE) AS pi
       |FROM st LEFT JOIN p$markovIters p USING (state)
       |ORDER BY state""".stripMargin
  }

  val all: Seq[Q] = Seq(

    // strict-order funnel signup -> click -> purchase: one filtered
    // min-aggregate per step, chained on the entity key.
    // the log is sparsified (1 event in 13) so users genuinely spread
    // across depths — on the full log every user completes the funnel
    // and the gate would compare a single row
    Q("q103_funnel", Some(
      s"""WITH base AS (
         |  SELECT user_id AS e, event_type AS s, $keySql AS k FROM events
         |  WHERE event_id % 13 = 0),
         |s0 AS (SELECT e, min(k) AS t0 FROM base WHERE s = 'signup' GROUP BY e),
         |s1 AS (SELECT b.e, min(b.k) AS t1 FROM base b
         |       JOIN s0 ON b.e = s0.e AND b.k > s0.t0
         |       WHERE b.s = 'click' GROUP BY b.e),
         |s2 AS (SELECT b.e, min(b.k) AS t2 FROM base b
         |       JOIN s1 ON b.e = s1.e AND b.k > s1.t1
         |       WHERE b.s = 'purchase' GROUP BY b.e),
         |d AS (SELECT e, CAST(max(d) AS BIGINT) AS funnel_depth FROM (
         |        SELECT e, 1 AS d FROM s0
         |        UNION ALL SELECT e, 2 FROM s1
         |        UNION ALL SELECT e, 3 FROM s2) u GROUP BY e)
         |SELECT funnel_depth, count(*) AS n_users
         |FROM d GROUP BY funnel_depth ORDER BY funnel_depth""".stripMargin),
      (s, d) => {
        val ev = T(s, d, "events").filter(col("event_id") % 13 === 0)
        EventAnalytics.funnelDepths(ev, "user_id", "event_type",
          EventAnalytics.eventKey(col("ts"), col("event_id")),
          Seq("signup", "click", "purchase"))
      }),

    // retention cohorts: first-activity week x weekly activity counts
    Q("q104_retention", Some(
      """WITH act AS (
        |  SELECT DISTINCT user_id AS e,
        |         CAST(date_trunc('week', ts) AS TIMESTAMP) AS w FROM events),
        |coh AS (SELECT e, min(w) AS cohort_week FROM act GROUP BY e)
        |SELECT c.cohort_week,
        |       CAST((CAST(epoch(a.w) AS BIGINT) -
        |             CAST(epoch(c.cohort_week) AS BIGINT)) / 604800 AS BIGINT)
        |         AS week_offset,
        |       count(*) AS n_active
        |FROM act a JOIN coh c ON a.e = c.e
        |GROUP BY 1, 2 ORDER BY cohort_week, week_offset""".stripMargin),
      (s, d) => EventAnalytics.retentionCohorts(
        T(s, d, "events"), "user_id", "ts")),

    // incremental aggregate maintenance: merge the pre-1997 snapshot
    // with the 1997+ batch; history is never rescanned.
    Q("q105_agg_merge", Some(
      """WITH h AS (
        |  SELECT o_custkey, count(*) AS n,
        |         sum(CAST(o_totalprice AS DECIMAL(18,2))) AS total
        |  FROM orders WHERE o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
        |  GROUP BY o_custkey),
        |b AS (
        |  SELECT o_custkey, count(*) AS n,
        |         sum(CAST(o_totalprice AS DECIMAL(18,2))) AS total
        |  FROM orders WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
        |  GROUP BY o_custkey)
        |SELECT COALESCE(h.o_custkey, b.o_custkey) AS o_custkey,
        |       CAST(COALESCE(h.n, 0) + COALESCE(b.n, 0) AS BIGINT) AS n,
        |       CAST(COALESCE(h.total, 0) + COALESCE(b.total, 0) AS DOUBLE) AS total
        |FROM h FULL OUTER JOIN b ON h.o_custkey = b.o_custkey
        |ORDER BY o_custkey""".stripMargin),
      (s, d) => {
        val cut = "1997-01-01 00:00:00"
        def agg(df: org.apache.spark.sql.DataFrame) =
          df.groupBy(col("o_custkey"))
            .agg(count(lit(1)).as("n"),
              sum(col("o_totalprice").cast("decimal(18,2)")).as("total"))
        val orders = T(s, d, "orders")
        EventAnalytics.mergeAggSnapshots(
            agg(orders.filter(col("o_orderdate") < lit(cut).cast("timestamp"))),
            agg(orders.filter(col("o_orderdate") >= lit(cut).cast("timestamp"))),
            "o_custkey")
          .select(col("o_custkey"), col("n"),
            col("total").cast("double").as("total"))
          .orderBy(col("o_custkey"))
      }),

    // incremental view maintenance WITH retractions (q170): q105 covers
    // the insert-only snapshot merge; this is the delete side of the
    // IVM algebra (Gupta–Mumick delta rules) — a count/sum view updates
    // from a SIGNED delta aggregate (inserts +1, retractions −1, signed
    // sums) without rescanning the base, and groups whose count reaches
    // zero vanish. The oracle is the full recompute over the composed
    // final set ((base ∖ retracted) ∪ inserted = orderkey % 20 ≠ 3), so
    // the hash match IS the maintained-view ≡ recompute theorem at gate
    // scale. Price cents are exact ints; sums ride DECIMAL/HUGEINT.
    Q("q170_mv_retraction_delta", Some(
      """SELECT o_orderpriority, count(*) AS n_orders,
        |       CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
        |                     AS BIGINT)) AS BIGINT) AS sum_cents
        |FROM orders WHERE o_orderkey % 20 <> 3
        |GROUP BY 1 ORDER BY 1""".stripMargin),
      (s, d) => {
        val orders = T(s, d, "orders")
        // cents via DECIMAL(18,2): a raw double*100 truncates vs rounds
        // differently across engines (the q106 idiom)
        val cents =
          expr("CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)")
        def agg(df: org.apache.spark.sql.DataFrame, sign: Int) =
          df.groupBy(col("o_orderpriority"))
            .agg((count(lit(1)) * sign).as("n"),
              (sum(cents.cast("decimal(38,0)")) * sign).as("cents"))
        val v0 = agg(orders.filter(pmod(col("o_orderkey"), lit(10)) =!= 9), 1)
        val delta = agg(
          orders.filter(pmod(col("o_orderkey"), lit(10)) === 9), 1)
          .unionByName(
            agg(orders.filter(pmod(col("o_orderkey"), lit(20)) === 3), -1))
        graft.operators.Maintenance
          .mergeAggDelta(v0, delta, Seq("o_orderpriority"))
          .select(col("o_orderpriority"),
            col("n").cast("bigint").as("n_orders"),
            col("cents").cast("bigint").as("sum_cents"))
          .orderBy(col("o_orderpriority"))
      }),

    // market-basket pair association (q171): which part brands co-occur
    // in an order more often than independence predicts. Exact int64
    // support counts; lift is ONE double division of exact products
    // (rule-17 single-op family), so the hash match includes the lift
    // column. Total order: lift DESC with the (b1,b2) unique tiebreak.
    Q("q171_basket_lift", Some(
      """WITH ob AS (
        |  SELECT DISTINCT l_orderkey AS ok, p_brand AS b
        |  FROM lineitem JOIN part ON l_partkey = p_partkey),
        |n AS (SELECT count(DISTINCT ok) AS n_orders FROM ob),
        |bc AS (SELECT b, count(*) AS cnt FROM ob GROUP BY 1),
        |pc AS (SELECT x.b AS b1, y.b AS b2, count(*) AS pair_orders
        |       FROM ob x JOIN ob y ON x.ok = y.ok AND x.b < y.b
        |       GROUP BY 1, 2 HAVING count(*) >= 8)
        |SELECT b1, b2, pair_orders,
        |       CAST(n.n_orders * pc.pair_orders AS DOUBLE) /
        |       CAST(c1.cnt * c2.cnt AS DOUBLE) AS lift
        |FROM pc CROSS JOIN n
        |JOIN bc c1 ON pc.b1 = c1.b
        |JOIN bc c2 ON pc.b2 = c2.b
        |ORDER BY lift DESC, b1, b2 LIMIT 40""".stripMargin),
      (s, d) => {
        val items = T(s, d, "lineitem")
          .join(T(s, d, "part"),
            col("l_partkey") === col("p_partkey"))
        graft.operators.Association.pairLift(
            items, basketCol = "l_orderkey", itemCol = "p_brand",
            minSupport = 8)
          .orderBy(col("lift").desc, col("b1"), col("b2")).limit(40)
      }),

    // mergeable-histogram percentiles over price cents, $100 bins:
    // the sketch alternative to a global sort, error <= one bin.
    Q("q106_hist_percentile", Some(
      """WITH hist AS (
        |  SELECT CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT) // 10000 AS bin,
        |         count(*) AS c
        |  FROM lineitem GROUP BY 1),
        |cum AS (
        |  SELECT bin, sum(c) OVER (ORDER BY bin) AS cum, sum(c) OVER () AS tot
        |  FROM hist),
        |q AS (
        |  SELECT CAST(0.5 AS DOUBLE) AS quantile, min(bin) AS b FROM cum
        |  WHERE cum * 100 >= tot * 50
        |  UNION ALL
        |  SELECT CAST(0.9 AS DOUBLE), min(bin) FROM cum WHERE cum * 100 >= tot * 90
        |  UNION ALL
        |  SELECT CAST(0.99 AS DOUBLE), min(bin) FROM cum WHERE cum * 100 >= tot * 99)
        |SELECT quantile, (b + 1) * 10000 - 1 AS upper_bound
        |FROM q ORDER BY quantile""".stripMargin),
      (s, d) => EventAnalytics.histogramPercentiles(
        T(s, d, "lineitem"),
        (col("l_extendedprice").cast("decimal(18,2)") * 100).cast("long"),
        binWidth = 10000L, quantiles = Seq(0.5, 0.9, 0.99)))
  ) ++ Seq(

    // time-series gap-fill: sparse per-type hourly readings (value > 90
    // sparsifies the log so real gaps exist) are densified against a
    // generated hour spine, then last-observation-carried-forward fills
    // the gauge. Scale shape: the spine is sequence()-exploded from a
    // 5-row bounds aggregate (never a driver loop); the LOCF window
    // partitions by series key, so state is bounded per series; counts
    // coalesce to 0 while the carried gauge keeps its last double
    // unchanged (no new arithmetic → hash-safe). Hour floors compose
    // exactly across engines (CLAUDE.md rule 2).
    Q("q120_gapfill", Some(
      // `gapped` feeds BOTH the spine bounds and the join — MATERIALIZED
      // or DuckDB re-runs the whole events scan per consumer (rule 22;
      // flagged by the r13 oracle-cost watchdog on a contended judge
      // machine at 9.46 s — measured bit-identical here either way)
      """WITH gapped AS MATERIALIZED (
        |  SELECT event_type, date_trunc('hour', ts) AS h, count(*) AS n_obs,
        |         CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_v
        |  FROM events WHERE value > 90 GROUP BY 1, 2),
        |bounds AS (
        |  SELECT event_type, min(h) AS mn, max(h) AS mx FROM gapped GROUP BY 1),
        |spine AS (
        |  SELECT event_type, unnest(generate_series(mn, mx, INTERVAL 1 HOUR)) AS h
        |  FROM bounds),
        |joined AS (
        |  SELECT s.event_type, s.h, g.n_obs, g.avg_v
        |  FROM spine s LEFT JOIN gapped g
        |    ON s.event_type = g.event_type AND s.h = g.h)
        |SELECT event_type, h, COALESCE(n_obs, 0) AS n_obs,
        |       (n_obs IS NULL) AS filled,
        |       last_value(avg_v IGNORE NULLS) OVER (
        |         PARTITION BY event_type ORDER BY h
        |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS v_locf
        |FROM joined
        |ORDER BY event_type, h""".stripMargin),
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val gapped = T(s, d, "events").filter(col("value") > 90)
          .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("h"))
          .agg(count(lit(1)).as("n_obs"),
            (sum(col("value").cast("decimal(18,2)")).cast("double") /
              count(lit(1))).as("avg_v"))
        val spine = gapped.groupBy(col("event_type"))
          .agg(min(col("h")).as("mn"), max(col("h")).as("mx"))
          .select(col("event_type"),
            explode(sequence(col("mn"), col("mx"), expr("interval 1 hour")))
              .as("h"))
        val w = Window.partitionBy(col("event_type")).orderBy(col("h"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        spine.join(gapped, Seq("event_type", "h"), "left")
          .select(col("event_type"), col("h"),
            coalesce(col("n_obs"), lit(0L)).as("n_obs"),
            col("n_obs").isNull.as("filled"),
            last(col("avg_v"), ignoreNulls = true).over(w).as("v_locf"))
          .orderBy(col("event_type"), col("h"))
      }),

    // first-order Markov transition matrix of the event stream: counts
    // and row-normalized probabilities per (prev -> next) type pair.
    // Ordering is the int64 event key (second-floor + sequence id):
    // unique per entity, so the lag is deterministic regardless of the
    // engines' physical ts resolution (rule 2). The probability is one
    // int/int IEEE divide over the tiny #types² table.
    Q("q150_transition_matrix", Some(
      s"""WITH seq AS (
         |  SELECT user_id, event_type, $keySql AS k FROM events),
         |lagged AS (
         |  SELECT lag(event_type, 1) OVER (
         |           PARTITION BY user_id ORDER BY k) AS prev_type,
         |         event_type AS next_type
         |  FROM seq),
         |c AS (
         |  SELECT prev_type, next_type, count(*) AS n FROM lagged
         |  WHERE prev_type IS NOT NULL GROUP BY prev_type, next_type)
         |SELECT prev_type, next_type, n,
         |       CAST(n AS DOUBLE)
         |         / CAST(sum(n) OVER (PARTITION BY prev_type) AS DOUBLE) AS p
         |FROM c ORDER BY prev_type, next_type""".stripMargin),
      (s, d) => EventAnalytics.transitionMatrix(
        T(s, d, "events"), entity = "user_id", step = "event_type",
        key = EventAnalytics.eventKey(col("ts"), col("event_id")))),

    // sequential-episode support (q173): for each ordered type pair,
    // how many users did SOME a strictly before SOME b — the GSP
    // 2-sequence, which tolerates interleaving where q150's Markov
    // matrix sees only adjacency. min/max over the unique int64 event
    // key make "<" tie-free on any physical ts resolution; share is one
    // int/int double division.
    Q("q173_episode_support", Some(
      s"""WITH ut AS (
         |  SELECT user_id AS u, event_type AS t,
         |         min($keySql) AS first_k, max($keySql) AS last_k
         |  FROM events GROUP BY 1, 2),
         |n AS (SELECT count(DISTINCT u) AS n_users FROM ut)
         |SELECT a.t AS t_a, b.t AS t_b, count(*) AS support,
         |       CAST(count(*) AS DOUBLE)
         |         / (SELECT CAST(n_users AS DOUBLE) FROM n) AS share
         |FROM ut a JOIN ut b
         |  ON a.u = b.u AND a.t <> b.t AND a.first_k < b.last_k
         |GROUP BY a.t, b.t
         |ORDER BY t_a, t_b""".stripMargin),
      (s, d) => EventAnalytics.episodeSupport(
        T(s, d, "events"), entity = "user_id", step = "event_type",
        key = EventAnalytics.eventKey(col("ts"), col("event_id")))),

    // seasonal-baseline forecastability (q177): per event type, summed
    // |error| of naive (h−1) vs seasonal-naive (h−24) hourly-count
    // forecasts — the MASE-denominator pre-check. Calendar lag joins on
    // the hour floor (rule 2), exact int64 error sums (DuckDB HUGEINT →
    // BIGINT, rule 18), ratio = one double division.
    Q("q177_seasonal_baseline", Some(
      """WITH hourly AS (
        |  SELECT event_type AS g, date_trunc('hour', ts) AS h, count(*) AS c
        |  FROM events GROUP BY 1, 2),
        |n1 AS (
        |  SELECT cur.g, count(*) AS n_naive,
        |         CAST(sum(abs(cur.c - prev.c)) AS BIGINT) AS sae_naive
        |  FROM hourly cur JOIN hourly prev
        |    ON cur.g = prev.g AND prev.h + INTERVAL 1 HOUR = cur.h
        |  GROUP BY 1),
        |n24 AS (
        |  SELECT cur.g, count(*) AS n_seasonal,
        |         CAST(sum(abs(cur.c - prev.c)) AS BIGINT) AS sae_seasonal
        |  FROM hourly cur JOIN hourly prev
        |    ON cur.g = prev.g AND prev.h + INTERVAL 24 HOUR = cur.h
        |  GROUP BY 1)
        |SELECT n1.g AS event_type, n_naive, sae_naive,
        |       n_seasonal, sae_seasonal,
        |       CASE WHEN sae_naive = 0 THEN 0.0e0
        |            ELSE CAST(sae_seasonal AS DOUBLE)
        |               / CAST(sae_naive AS DOUBLE) END AS seasonal_vs_naive
        |FROM n1 JOIN n24 ON n1.g = n24.g
        |ORDER BY event_type""".stripMargin),
      (s, d) => EventAnalytics.seasonalBaselineError(
        T(s, d, "events"), series = "event_type", ts = "ts")),

    // integer CUSUM changepoint detector (q184): S_t = max(0, S_{t−1}
    // + c_t − k) over each type's hourly counts, alarm at 5k — the
    // sequential drift detector q163's per-window z-test can't be.
    // Spark folds the recurrence with functions.aggregate over the
    // bounded per-series grid; DuckDB replays it with a recursive CTE.
    // All int64; k = ceil-mean via integer DIV (rule 21).
    Q("q184_cusum_changepoint", Some(
      """WITH RECURSIVE hourly AS MATERIALIZED (
        |  SELECT event_type AS g, date_trunc('hour', ts) AS h, count(*) AS c
        |  FROM events GROUP BY 1, 2),
        |idx AS MATERIALIZED (SELECT g, c,
        |               row_number() OVER (PARTITION BY g ORDER BY h) AS i,
        |               count(*) OVER (PARTITION BY g) AS n,
        |               CAST(sum(c) OVER (PARTITION BY g) AS BIGINT) AS tot
        |        FROM hourly),
        |kk AS MATERIALIZED (SELECT g, max(n) AS n,
        |              (max(tot) + max(n) - 1) // max(n) AS k
        |       FROM idx GROUP BY 1),
        |walk(g, i, s, mx, alarm) AS (
        |  SELECT g, CAST(0 AS BIGINT), CAST(0 AS BIGINT),
        |         CAST(0 AS BIGINT), CAST(0 AS BIGINT) FROM kk
        |  UNION ALL
        |  SELECT w.g, w.i + 1,
        |         greatest(0, w.s + ix.c - kk.k),
        |         greatest(w.mx, greatest(0, w.s + ix.c - kk.k)),
        |         CASE WHEN w.alarm > 0 THEN w.alarm
        |              WHEN greatest(0, w.s + ix.c - kk.k) >= 5*kk.k
        |                THEN w.i + 1
        |              ELSE 0 END
        |  FROM walk w
        |  JOIN idx ix ON ix.g = w.g AND ix.i = w.i + 1
        |  JOIN kk ON kk.g = w.g)
        |SELECT w.g AS event_type, kk.n AS n_hours, kk.k,
        |       w.mx AS max_cusum, w.alarm AS alarm_idx
        |FROM walk w JOIN kk ON kk.g = w.g AND w.i = kk.n
        |ORDER BY event_type""".stripMargin),
      (s, d) => EventAnalytics.cusumChangepoint(
        T(s, d, "events"), series = "event_type", ts = "ts")),

    // RFM customer segmentation (q186): recency/frequency/monetary
    // tercile scores + 3-digit code, all-int64 output. Thresholds are
    // the exact count-of-counts terciles; the ⅓/⅔ double literals go
    // through dlit on the DuckDB side (rule 14); cents via
    // DECIMAL(18,2)·100 (rule 1); r_days via integer // (rule 21).
    Q("q186_rfm_segments", Some(
      s"""WITH a0 AS (
         |  SELECT CAST(epoch(max(o_orderdate)) AS BIGINT) AS a FROM orders),
         |per AS (
         |  SELECT o_custkey AS cust,
         |         ((SELECT a FROM a0)
         |           - CAST(epoch(max(o_orderdate)) AS BIGINT)) // 86400
         |           AS r_days,
         |         count(*) AS f,
         |         CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) * 100
         |              AS BIGINT) AS m_cents
         |  FROM orders GROUP BY 1),
         |${rfmThrCte("r_days", "tr")},
         |${rfmThrCte("f", "tf")},
         |${rfmThrCte("m_cents", "tm")}
         |SELECT o_custkey, r_days, f, m_cents, r_score, f_score, m_score,
         |       r_score*100 + f_score*10 + m_score AS rfm
         |FROM (
         |  SELECT cust AS o_custkey, r_days, f, m_cents,
         |    CAST(CASE WHEN r_days <= (SELECT t1 FROM tr) THEN 3
         |              WHEN r_days <= (SELECT t2 FROM tr) THEN 2
         |              ELSE 1 END AS BIGINT) AS r_score,
         |    CAST(CASE WHEN f <= (SELECT t1 FROM tf) THEN 1
         |              WHEN f <= (SELECT t2 FROM tf) THEN 2
         |              ELSE 3 END AS BIGINT) AS f_score,
         |    CAST(CASE WHEN m_cents <= (SELECT t1 FROM tm) THEN 1
         |              WHEN m_cents <= (SELECT t2 FROM tm) THEN 2
         |              ELSE 3 END AS BIGINT) AS m_score
         |  FROM per)
         |ORDER BY o_custkey""".stripMargin),
      (s, d) => EventAnalytics.rfmSegments(
        T(s, d, "orders"), entity = "o_custkey", ts = "o_orderdate",
        // decimal → exact integer cents → int64 BEFORE the sum (rule 1)
        amountCents = (col("o_totalprice").cast("decimal(18,2)") * 100)
          .cast("bigint"))),

    // two-proportion A/B significance (q187): click→purchase share by
    // user-parity cohort, the pooled z² test multiplied out to an exact
    // integer inequality (q163 idiom) — DECIMAL(38,0)/HUGEINT products,
    // single-division proportions, boolean verdict as a theorem.
    Q("q187_ab_significance", Some(
      """WITH per AS (
        |  SELECT user_id AS u,
        |         max(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS d,
        |         max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS p
        |  FROM events GROUP BY 1),
        |g AS (SELECT u % 2 AS cohort, count(*) AS n,
        |             CAST(sum(p) AS BIGINT) AS c
        |      FROM per WHERE d = 1 GROUP BY 1),
        |r AS (SELECT
        |        (SELECT n FROM g WHERE cohort = 0) AS n1,
        |        (SELECT c FROM g WHERE cohort = 0) AS c1,
        |        (SELECT n FROM g WHERE cohort = 1) AS n2,
        |        (SELECT c FROM g WHERE cohort = 1) AS c2)
        |SELECT n1, c1, n2, c2,
        |       CAST(c1 AS DOUBLE) / CAST(n1 AS DOUBLE) AS p1,
        |       CAST(c2 AS DOUBLE) / CAST(n2 AS DOUBLE) AS p2,
        |       (c1*n2 - c2*n1)*(c1*n2 - c2*n1)*(n1+n2)
        |         > 4*(c1+c2)*((n1+n2)-(c1+c2))*n1*n2 AS significant
        |FROM r""".stripMargin),
      (s, d) => EventAnalytics.twoProportionGate(
        T(s, d, "events"), entity = "user_id", step = "event_type",
        denomType = "click", numType = "purchase")),

    // exact OLS trend of daily volume (q189): slope/intercept/r² each
    // as ONE division of exactly-computed integers (normal equations;
    // the q187 exact-rational idiom applied to regression). Sums are
    // DECIMAL(38,0) in Spark / HUGEINT in DuckDB (rule 18); all
    // numerators/denominators stay < 2^53 so the DOUBLE casts are
    // exact on both engines.
    Q("q189_ols_trend", Some(
      """WITH daily AS (
        |  SELECT date_trunc('day', ts) AS day, count(*) AS y
        |  FROM events GROUP BY 1),
        |xy AS (SELECT CAST(date_diff('day',
        |         (SELECT min(day) FROM daily), day) AS BIGINT) AS x, y
        |       FROM daily),
        |g AS (SELECT count(*) AS n, sum(x) AS sx, sum(y) AS sy,
        |             sum(x*x) AS sxx, sum(x*y) AS sxy, sum(y*y) AS syy
        |      FROM xy)
        |SELECT CAST(n AS BIGINT) AS n_days,
        |       CAST(n*sxy - sx*sy AS DOUBLE)
        |         / CAST(n*sxx - sx*sx AS DOUBLE) AS slope,
        |       CAST(sy*sxx - sx*sxy AS DOUBLE)
        |         / CAST(n*sxx - sx*sx AS DOUBLE) AS intercept,
        |       CAST((n*sxy - sx*sy) * (n*sxy - sx*sy) AS DOUBLE)
        |         / CAST((n*sxx - sx*sx) * (n*syy - sy*sy) AS DOUBLE) AS r2
        |FROM g ORDER BY n_days""".stripMargin),
      (s, d) => EventAnalytics.olsTrend(T(s, d, "events"))),

    // sliding-window burst detection (q190): max events per user inside
    // any 1-hour window via a RANGE frame over whole-second epoch —
    // value-defined frames make peer order irrelevant, so the count is
    // exactly replayable. One shuffle, no O(n²) self-join.
    Q("q190_burst_windows", Some(
      """WITH s AS (SELECT user_id,
        |  CAST(epoch(date_trunc('second', ts)) AS BIGINT) AS sec
        |  FROM events),
        |b AS (SELECT user_id, count(*) OVER (PARTITION BY user_id
        |        ORDER BY sec RANGE BETWEEN 3599 PRECEDING AND CURRENT ROW)
        |        AS burst FROM s)
        |SELECT user_id, count(*) AS n_events,
        |       CAST(max(burst) AS BIGINT) AS max_burst,
        |       max(burst) >= 3 AS flagged
        |FROM b GROUP BY user_id ORDER BY user_id""".stripMargin),
      (s, d) => EventAnalytics.maxBurst(
        T(s, d, "events"), windowSec = 3600, threshold = 3L)),

    // discrete churn life table (q191): per activity age, at-risk /
    // deaths / right-censored counts and the hazard as one exact
    // division — the Kaplan-Meier table in count form. The at-risk
    // reverse-cumulative window runs over DISTINCT ages (output-sized).
    // watermark-delay audit (q220): per-event lateness against the
    // arrival-order high-water mark of event time (arrival = the
    // orderHash permutation, one definition both engines), counted at
    // the candidate watermark delays — the measured basis for q83's
    // withWatermark choice. Spark runs Prefix.cummax (rule 23); the
    // oracle keeps the plain global running-max window.
    Q("q220_watermark_audit", Some(
      s"""WITH e AS (
         |  SELECT event_type, epoch_us(ts) AS tsus,
         |         ${graft.operators.Sampling.orderHashSql("event_id")} AS arr
         |  FROM events),
         |w AS (
         |  SELECT event_type, tsus,
         |    max(tsus) OVER (ORDER BY arr
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS wm
         |  FROM e)
         |SELECT event_type, count(*) AS n_events,
         |  CAST(sum(CASE WHEN wm - tsus > 60000000 THEN 1 ELSE 0 END)
         |    AS BIGINT) AS late_60s,
         |  CAST(sum(CASE WHEN wm - tsus > 600000000 THEN 1 ELSE 0 END)
         |    AS BIGINT) AS late_600s,
         |  CAST(max(wm - tsus) AS BIGINT) AS max_late_us
         |FROM w GROUP BY event_type ORDER BY event_type""".stripMargin),
      (s, d) => EventAnalytics.watermarkAudit(T(s, d, "events"))),

    // periodicity detection (q216): lagged sample autocorrelation of
    // the hourly event-count series — the daily-cycle readout (acf
    // peaks at lag 24 on diurnal traffic). Count sums and count
    // products in DECIMAL(38,0)/HUGEINT (rule 18); the statistic is one
    // fixed double DAG over exactly-agreed integers (the ARI pattern)
    // with the zero-variance degenerate pinned to NULL (rule 21a). All
    // per-lag work runs on the calendar-bounded hourly table.
    Q("q216_autocorr", Some(
      """WITH hourly AS MATERIALIZED (
        |  SELECT epoch_us(ts) // 3600000000 AS h, count(*) AS c
        |  FROM events GROUP BY 1),
        |lagged AS (
        |  SELECT l.lag, a.c AS x, b.c AS y
        |  FROM (VALUES (1), (6), (12), (24)) l(lag)
        |  JOIN hourly a ON true
        |  JOIN hourly b ON b.h = a.h + l.lag),
        |sums AS (
        |  SELECT lag, count(*) AS n_pairs,
        |    sum(CAST(x AS HUGEINT)) AS sx, sum(CAST(y AS HUGEINT)) AS sy,
        |    sum(CAST(x AS HUGEINT) * y) AS sxy,
        |    sum(CAST(x AS HUGEINT) * x) AS sxx,
        |    sum(CAST(y AS HUGEINT) * y) AS syy
        |  FROM lagged GROUP BY lag)
        |SELECT CAST(lag AS BIGINT) AS lag, n_pairs,
        |  CAST(sxy AS DOUBLE) AS sxy, CAST(sxx AS DOUBLE) AS sxx,
        |  CAST(syy AS DOUBLE) AS syy,
        |  CASE WHEN (CAST(n_pairs AS DOUBLE) * CAST(sxx AS DOUBLE)
        |        - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
        |      * (CAST(n_pairs AS DOUBLE) * CAST(syy AS DOUBLE)
        |        - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)) = 0.0e0
        |    THEN NULL
        |    ELSE (CAST(n_pairs AS DOUBLE) * CAST(sxy AS DOUBLE)
        |        - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
        |      / sqrt((CAST(n_pairs AS DOUBLE) * CAST(sxx AS DOUBLE)
        |          - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
        |        * (CAST(n_pairs AS DOUBLE) * CAST(syy AS DOUBLE)
        |          - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)))
        |  END AS acf
        |FROM sums ORDER BY lag""".stripMargin),
      (s, d) => EventAnalytics.hourlyAutocorrelation(T(s, d, "events"))),

    Q("q191_churn_hazard", Some(
      s"""WITH $lifeTableCtes
        |SELECT age,
        |       CAST(sum(n_at_age) OVER (ORDER BY age ROWS BETWEEN
        |         CURRENT ROW AND UNBOUNDED FOLLOWING) AS BIGINT) AS at_risk,
        |       deaths, censored,
        |       CAST(deaths AS DOUBLE) / CAST(sum(n_at_age) OVER (ORDER BY
        |         age ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
        |         AS DOUBLE) AS hazard
        |FROM h ORDER BY age""".stripMargin),
      (s, d) => EventAnalytics.churnHazard(T(s, d, "events"))),

    // Kaplan-Meier survival curve (q213): q191's life table completed
    // with the product-limit estimator S(t) = prod(1 - d/n) — the
    // running float product replayed as the IDENTICAL ascending-age
    // multiplication sequence on both sides (list_reduce over the
    // ordered list; float products can't be reassociated, so the fold
    // is explicit, not a window). Support bounded by calendar days.
    Q("q213_kaplan_meier", Some(
      s"""WITH $lifeTableCtes,
        |sup AS MATERIALIZED (
        |  SELECT age,
        |         CAST(sum(n_at_age) OVER (ORDER BY age ROWS BETWEEN
        |           CURRENT ROW AND UNBOUNDED FOLLOWING) AS BIGINT)
        |           AS at_risk,
        |         deaths, censored
        |  FROM h)
        |SELECT s1.age, s1.at_risk, s1.deaths, s1.censored,
        |  (SELECT list_reduce(
        |     list_prepend(CAST(1.0 AS DOUBLE),
        |       list(1.0 - CAST(s2.deaths AS DOUBLE)
        |                    / CAST(s2.at_risk AS DOUBLE)
        |            ORDER BY s2.age)),
        |     (a, x) -> a * x)
        |   FROM sup s2 WHERE s2.age <= s1.age) AS survival
        |FROM sup s1 ORDER BY s1.age""".stripMargin),
      (s, d) => EventAnalytics.kaplanMeier(T(s, d, "events"))),

    // t-closeness audit (q192): the step past q157/q167 in the privacy
    // ladder — per QI class, total variation distance to the global
    // sensitive distribution, with the numerator in exact integers
    // (Σ|cs·N − gs·n_c|), tvd as ONE division, and the breach verdict
    // as the cross-multiplied theorem 5·scaled > 4·n_c·N (t = 2/5).
    Q("q192_t_closeness", Some(
      """WITH src AS (
        |  SELECT n.n_name,
        |         CAST(c.c_acctbal * 100 AS BIGINT) // 100000 AS bal_bucket,
        |         c.c_mktsegment AS sens
        |  FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey),
        |base AS (SELECT n_name, bal_bucket, sens, count(*) AS cs
        |         FROM src GROUP BY 1, 2, 3),
        |cls AS (SELECT n_name, bal_bucket, CAST(sum(cs) AS BIGINT) AS nc
        |        FROM base GROUP BY 1, 2),
        |gdist AS (SELECT sens, CAST(sum(cs) AS BIGINT) AS gs
        |          FROM base GROUP BY 1),
        |tot AS (SELECT CAST(sum(cs) AS BIGINT) AS nn FROM base),
        |grid AS (SELECT c.n_name, c.bal_bucket, c.nc, t.nn,
        |                abs(COALESCE(b.cs, 0)*t.nn - g.gs*c.nc) AS term
        |         FROM cls c CROSS JOIN gdist g CROSS JOIN tot t
        |         LEFT JOIN base b ON b.n_name = c.n_name
        |           AND b.bal_bucket = c.bal_bucket AND b.sens = g.sens),
        |agg AS (SELECT n_name, bal_bucket, nc, nn,
        |               CAST(sum(term) AS BIGINT) AS tvd_scaled
        |        FROM grid GROUP BY 1, 2, 3, 4)
        |SELECT n_name, bal_bucket, nc AS class_n, tvd_scaled,
        |       CAST(tvd_scaled AS DOUBLE) / CAST(2*nc*nn AS DOUBLE) AS tvd,
        |       5*tvd_scaled > 4*nc*nn AS breaches
        |FROM agg ORDER BY n_name, bal_bucket""".stripMargin),
      (s, d) => {
        val src = T(s, d, "customer").join(T(s, d, "nation"),
          col("c_nationkey") === col("n_nationkey"))
          .select(col("n_name"),
            expr("CAST(c_acctbal * 100 AS BIGINT) div 100000")
              .as("bal_bucket"),
            col("c_mktsegment").as("sens"))
        graft.operators.Profiling.tCloseness(src,
          Seq("n_name", "bal_bucket"), sensitive = "sens",
          tNum = 2L, tDen = 5L)
      }),

    // inter-arrival histogram (q197): per-user consecutive gaps
    // bucketed by the binary-representation length of the whole-second
    // gap — an exact integer log2 both engines compute identically
    // (length(bin(gap))), no floating log anywhere. Tie-free lag order
    // rides (sec, event_id).
    Q("q197_interarrival_hist", Some(
      """WITH s AS (SELECT user_id,
        |  CAST(epoch(date_trunc('second', ts)) AS BIGINT) AS sec, event_id
        |  FROM events),
        |g AS (SELECT sec - lag(sec, 1) OVER (
        |        PARTITION BY user_id ORDER BY sec, event_id) AS gap
        |      FROM s)
        |SELECT CASE WHEN gap = 0 THEN 0
        |            ELSE length(bin(gap)) END AS bucket,
        |       count(*) AS n_gaps,
        |       CAST(min(gap) AS BIGINT) AS min_gap,
        |       CAST(max(gap) AS BIGINT) AS max_gap
        |FROM g WHERE gap IS NOT NULL
        |GROUP BY 1 ORDER BY bucket""".stripMargin),
      (s, d) => EventAnalytics.interArrivalHistogram(T(s, d, "events"))),

    // Markov stationary distribution (q194): where q150's one-step
    // dynamics settle, by integer fixed-point power iteration (mass in
    // units of 1/1e9, per-term floor then integer sum — exact and
    // replayable each round). The matrix is the driver-held artifact;
    // the oracle replays the SAME 20 rounds as chained CTEs generated
    // from the shared constants (rule 12).
    Q("q194_markov_stationary", Some(markovOracle),
      (s, d) => EventAnalytics.markovStationary(
        T(s, d, "events"), entity = "user_id", step = "event_type",
        key = EventAnalytics.eventKey(col("ts"), col("event_id")),
        iters = markovIters, scale = markovScale)),

    // top entry journeys (q188): first-3-step paths per user, ranked by
    // cohort size — the Sankey feed; position-aware where q150's Markov
    // matrix is not. Unique event-key order, count-then-path total
    // order, LIMIT after it (deterministic top-20).
    Q("q188_top_paths", Some(
      s"""WITH seq AS (
         |  SELECT user_id, event_type, $keySql AS k FROM events),
         |r AS (SELECT user_id, event_type,
         |             row_number() OVER (
         |               PARTITION BY user_id ORDER BY k) AS rn
         |      FROM seq),
         |f AS (SELECT user_id,
         |             string_agg(event_type, '>' ORDER BY rn) AS path,
         |             count(*) AS depth
         |      FROM r WHERE rn <= 3 GROUP BY 1)
         |SELECT path, depth, count(*) AS n_entities
         |FROM f GROUP BY 1, 2
         |ORDER BY n_entities DESC, path LIMIT 20""".stripMargin),
      (s, d) => EventAnalytics.topPaths(
        T(s, d, "events"), entity = "user_id", step = "event_type",
        key = EventAnalytics.eventKey(col("ts"), col("event_id")))),

    // per-leg funnel latency quantiles: the q103 strict-order chain,
    // then exact count-of-counts quantiles (q149's shape) over whole-
    // second step gaps. The event key is sec*1e6 + seq, so k DIV 1e6 is
    // the epoch second exactly and dt_sec is exact integer math on both
    // engines; quantile probes are e-suffixed literals (rule 14).
    Q("q151_funnel_latency", Some(
      s"""WITH base AS (
         |  SELECT user_id AS e, event_type AS s, $keySql AS k FROM events
         |  WHERE event_id % 13 = 0),
         |s0 AS (SELECT e, min(k) AS t0 FROM base WHERE s = 'signup' GROUP BY e),
         |s1 AS (SELECT b.e, min(b.k) AS t1 FROM base b
         |       JOIN s0 ON b.e = s0.e AND b.k > s0.t0
         |       WHERE b.s = 'click' GROUP BY b.e),
         |s2 AS (SELECT b.e, min(b.k) AS t2 FROM base b
         |       JOIN s1 ON b.e = s1.e AND b.k > s1.t1
         |       WHERE b.s = 'purchase' GROUP BY b.e),
         |legs AS (
         |  SELECT 'signup->click' AS leg,
         |         s1.t1 // 1000000 - s0.t0 // 1000000 AS dt_sec
         |  FROM s1 JOIN s0 ON s1.e = s0.e
         |  UNION ALL
         |  SELECT 'click->purchase',
         |         s2.t2 // 1000000 - s1.t1 // 1000000
         |  FROM s2 JOIN s1 ON s2.e = s1.e),
         |hist AS (SELECT leg, dt_sec, count(*) AS m FROM legs
         |         GROUP BY leg, dt_sec),
         |cum AS (
         |  SELECT leg, dt_sec,
         |         sum(m) OVER (PARTITION BY leg ORDER BY dt_sec) AS cum,
         |         sum(m) OVER (PARTITION BY leg) AS n
         |  FROM hist),
         |fan AS (
         |  SELECT leg, dt_sec, cum, n,
         |         unnest([${latencyProbes.map(q => s"${q}e0").mkString(", ")}]) AS q
         |  FROM cum)
         |SELECT leg, q, min(dt_sec) AS q_value
         |FROM fan
         |WHERE cum >= CAST(ceil(q * n) AS BIGINT)
         |GROUP BY leg, q
         |ORDER BY leg, q""".stripMargin),
      (s, d) => EventAnalytics.funnelStepLatencies(
        T(s, d, "events").filter(col("event_id") % 13 === 0),
        entity = "user_id", step = "event_type",
        key = EventAnalytics.eventKey(col("ts"), col("event_id")),
        steps = Seq("signup", "click", "purchase"), qs = latencyProbes)),

    // Skyline / Pareto frontier (q155): parts that are best price/size
    // tradeoffs — no other part is both cheaper-or-equal AND
    // bigger-or-equal with one strict. Spark side runs the two-phase
    // distributed BNL (per-partition prune, then prune of the tiny
    // survivor union — the distributive property that makes skylines
    // feasible at 100 TB); the oracle replays the DEFINITION as a
    // quadratic NOT EXISTS, so the pruning must be exactly
    // dominance-preserving to hash-match.
    Q("q155_skyline", Some(
      """WITH p AS (SELECT p_partkey,
        |             CAST(p_retailprice AS DOUBLE) AS p_retailprice,
        |             CAST(p_size AS DOUBLE) AS p_size
        |           FROM part)
        |SELECT p_partkey, p_retailprice, p_size
        |FROM p a
        |WHERE NOT EXISTS (
        |  SELECT 1 FROM p b
        |  WHERE b.p_retailprice <= a.p_retailprice AND b.p_size >= a.p_size
        |    AND (b.p_retailprice < a.p_retailprice OR b.p_size > a.p_size))
        |ORDER BY p_partkey""".stripMargin),
      (s, d) => graft.operators.Skyline.skyline(
        s, T(s, d, "part"), "p_partkey",
        minimize = Seq("p_retailprice"), maximize = Seq("p_size"))
        .orderBy(col("p_partkey"))),

    // Trajectory similarity top-k (q156): each query user's 5 most
    // similar users by Jaccard over distinct event-type trigrams of
    // their eventKey-ordered journeys — inverted-index join prunes
    // non-overlapping users, DF cap kills ubiquitous grams, and the
    // one int64/int64 division keeps the ranking bit-reproducible.
    Q("q156_trajectory_topk", Some(
      s"""WITH e AS (SELECT user_id, $keySql AS key, event_type FROM events),
         |seq AS (SELECT user_id, event_type,
         |  lead(event_type, 1) OVER (PARTITION BY user_id ORDER BY key) AS t1,
         |  lead(event_type, 2) OVER (PARTITION BY user_id ORDER BY key) AS t2
         |  FROM e),
         |grams0 AS MATERIALIZED (SELECT DISTINCT user_id,
         |             event_type || '>' || t1 || '>' || t2 AS g
         |           FROM seq WHERE t2 IS NOT NULL),
         |keep AS (SELECT g FROM grams0 GROUP BY g HAVING count(*) <= 200),
         |grams AS MATERIALIZED (SELECT grams0.* FROM grams0 JOIN keep USING (g)),
         |sizes AS (SELECT user_id, count(*) AS n FROM grams GROUP BY user_id),
         |q AS (SELECT user_id AS q_id, g FROM grams WHERE user_id < 5),
         |inter AS (SELECT q.q_id, c.user_id, count(*) AS inter_n
         |          FROM q JOIN grams c ON q.g = c.g AND c.user_id != q.q_id
         |          GROUP BY q.q_id, c.user_id),
         |sc AS (SELECT i.q_id, i.user_id,
         |         i.inter_n, sq.n + su.n - i.inter_n AS union_n,
         |         CAST(i.inter_n AS DOUBLE)
         |           / CAST(sq.n + su.n - i.inter_n AS DOUBLE) AS jacc
         |       FROM inter i
         |       JOIN sizes sq ON sq.user_id = i.q_id
         |       JOIN sizes su ON su.user_id = i.user_id),
         |rk AS (SELECT *, row_number() OVER
         |         (PARTITION BY q_id ORDER BY jacc DESC, user_id) AS rank
         |       FROM sc)
         |SELECT q_id, user_id, CAST(inter_n AS BIGINT) AS inter_n,
         |       CAST(union_n AS BIGINT) AS union_n, jacc,
         |       CAST(rank AS BIGINT) AS rank
         |FROM rk WHERE rank <= 5 ORDER BY q_id, rank""".stripMargin),
      (s, d) => EventAnalytics.trajectoryTopK(
        T(s, d, "events"), col("user_id") < 5, k = 5)
        .orderBy(col("q_id"), col("rank"))),

    // k-anonymity generalization ladder (q157): per level of
    // progressively coarser quasi-identifiers (nation+segment → region+
    // segment → region → full suppression), the equivalence classes
    // below k=20 and the rows they expose — the privacy audit a
    // released dataset runs. One corpus aggregation at the finest
    // level; coarser levels roll up the class table (not the table).
    Q("q157_k_anonymity", Some(
      """WITH src AS (
        |  SELECT n.n_name, n.n_regionkey, c.c_mktsegment
        |  FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey),
        |f AS (SELECT n_name, n_regionkey, c_mktsegment, count(*) AS cs
        |      FROM src GROUP BY 1, 2, 3),
        |l1c AS (SELECT n_regionkey, c_mktsegment, sum(cs) AS cs
        |        FROM f GROUP BY 1, 2),
        |l2c AS (SELECT n_regionkey, sum(cs) AS cs FROM f GROUP BY 1),
        |l3c AS (SELECT sum(cs) AS cs FROM f),
        |lv0 AS (SELECT CAST(0 AS BIGINT) AS level,
        |  'n_name,n_regionkey,c_mktsegment' AS quasi_ids,
        |  count(*) AS n_classes,
        |  count(CASE WHEN cs < 20 THEN 1 END) AS n_small_classes,
        |  CAST(sum(CASE WHEN cs < 20 THEN cs ELSE 0 END) AS BIGINT) AS n_rows_at_risk,
        |  count(CASE WHEN cs < 20 THEN 1 END) = 0 AS satisfies FROM f),
        |lv1 AS (SELECT CAST(1 AS BIGINT) AS level,
        |  'n_regionkey,c_mktsegment' AS quasi_ids,
        |  count(*) AS n_classes,
        |  count(CASE WHEN cs < 20 THEN 1 END) AS n_small_classes,
        |  CAST(sum(CASE WHEN cs < 20 THEN cs ELSE 0 END) AS BIGINT) AS n_rows_at_risk,
        |  count(CASE WHEN cs < 20 THEN 1 END) = 0 AS satisfies FROM l1c),
        |lv2 AS (SELECT CAST(2 AS BIGINT) AS level,
        |  'n_regionkey' AS quasi_ids,
        |  count(*) AS n_classes,
        |  count(CASE WHEN cs < 20 THEN 1 END) AS n_small_classes,
        |  CAST(sum(CASE WHEN cs < 20 THEN cs ELSE 0 END) AS BIGINT) AS n_rows_at_risk,
        |  count(CASE WHEN cs < 20 THEN 1 END) = 0 AS satisfies FROM l2c),
        |lv3 AS (SELECT CAST(3 AS BIGINT) AS level,
        |  '' AS quasi_ids,
        |  count(*) AS n_classes,
        |  count(CASE WHEN cs < 20 THEN 1 END) AS n_small_classes,
        |  CAST(sum(CASE WHEN cs < 20 THEN cs ELSE 0 END) AS BIGINT) AS n_rows_at_risk,
        |  count(CASE WHEN cs < 20 THEN 1 END) = 0 AS satisfies FROM l3c)
        |SELECT * FROM lv0 UNION ALL SELECT * FROM lv1
        |UNION ALL SELECT * FROM lv2 UNION ALL SELECT * FROM lv3
        |ORDER BY level""".stripMargin),
      (s, d) => {
        val src = T(s, d, "customer").join(T(s, d, "nation"),
          col("c_nationkey") === col("n_nationkey"))
          .select(col("n_name"), col("n_regionkey"), col("c_mktsegment"))
        graft.operators.Profiling.kAnonymityLadder(src,
          Seq(Seq("n_name", "n_regionkey", "c_mktsegment"),
            Seq("n_regionkey", "c_mktsegment"),
            Seq("n_regionkey"), Seq.empty), k = 20L)
      }),

    // l-diversity ladder (q167): the audit k-anonymity misses — a class
    // can be k-large yet leak its members' sensitive value when all of
    // them share it. Sensitive = market segment; quasi-identifiers =
    // nation × account-balance bucket (exact cents → int64 → DIV, so
    // negative balances truncate identically on both engines, rule 21),
    // generalized to nation, then full suppression. Diversity counts
    // are row counts of the rolled-up (QI, sensitive) class-value
    // table — never a countDistinct over data (Profiling.scala).
    Q("q167_l_diversity", Some(
      """WITH src AS (
        |  SELECT n.n_name,
        |         CAST(c.c_acctbal * 100 AS BIGINT) // 100000 AS bal_bucket,
        |         c.c_mktsegment AS sens
        |  FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey),
        |base AS (SELECT n_name, bal_bucket, sens, count(*) AS cs
        |         FROM src GROUP BY 1, 2, 3),
        |c0 AS (SELECT n_name, bal_bucket, count(*) AS dv, sum(cs) AS rws
        |       FROM base GROUP BY 1, 2),
        |l0 AS (SELECT CAST(0 AS BIGINT) AS level,
        |  'n_name,bal_bucket' AS quasi_ids, count(*) AS n_classes,
        |  count(CASE WHEN dv < 3 THEN 1 END) AS n_low_div,
        |  CAST(sum(CASE WHEN dv < 3 THEN rws ELSE 0 END) AS BIGINT)
        |    AS n_rows_at_risk,
        |  CAST(min(dv) AS BIGINT) AS min_diversity,
        |  count(CASE WHEN dv < 3 THEN 1 END) = 0 AS satisfies FROM c0),
        |b1 AS (SELECT n_name, sens, sum(cs) AS cs FROM base GROUP BY 1, 2),
        |c1 AS (SELECT n_name, count(*) AS dv, sum(cs) AS rws
        |       FROM b1 GROUP BY 1),
        |l1 AS (SELECT CAST(1 AS BIGINT) AS level,
        |  'n_name' AS quasi_ids, count(*) AS n_classes,
        |  count(CASE WHEN dv < 3 THEN 1 END) AS n_low_div,
        |  CAST(sum(CASE WHEN dv < 3 THEN rws ELSE 0 END) AS BIGINT)
        |    AS n_rows_at_risk,
        |  CAST(min(dv) AS BIGINT) AS min_diversity,
        |  count(CASE WHEN dv < 3 THEN 1 END) = 0 AS satisfies FROM c1),
        |b2 AS (SELECT sens, sum(cs) AS cs FROM base GROUP BY 1),
        |c2 AS (SELECT count(*) AS dv, sum(cs) AS rws FROM b2),
        |l2 AS (SELECT CAST(2 AS BIGINT) AS level,
        |  '' AS quasi_ids, count(*) AS n_classes,
        |  count(CASE WHEN dv < 3 THEN 1 END) AS n_low_div,
        |  CAST(sum(CASE WHEN dv < 3 THEN rws ELSE 0 END) AS BIGINT)
        |    AS n_rows_at_risk,
        |  CAST(min(dv) AS BIGINT) AS min_diversity,
        |  count(CASE WHEN dv < 3 THEN 1 END) = 0 AS satisfies FROM c2)
        |SELECT * FROM l0 UNION ALL SELECT * FROM l1 UNION ALL
        |SELECT * FROM l2 ORDER BY level""".stripMargin),
      (s, d) => {
        val src = T(s, d, "customer").join(T(s, d, "nation"),
          col("c_nationkey") === col("n_nationkey"))
          .select(col("n_name"),
            expr("CAST(c_acctbal * 100 AS BIGINT) div 100000")
              .as("bal_bucket"),
            col("c_mktsegment").as("sens"))
        graft.operators.Profiling.lDiversityLadder(src,
          Seq(Seq("n_name", "bal_bucket"), Seq("n_name"), Seq.empty),
          sensitive = "sens", l = 3L)
      }),

    // linear multi-touch attribution (q162): every purchase splits 100
    // integer credit units over its click/view touches in the hour
    // before it, largest-remainder to the earliest touches — exactly
    // 100 units per touched conversion by construction (the q133
    // allocation trick), so credit conservation is part of the hash.
    Q("q162_attribution", Some(
      """WITH conv AS (
        |  SELECT event_id AS conv_id, user_id, ts AS conv_ts
        |  FROM events WHERE event_type = 'purchase'),
        |touch AS (
        |  SELECT user_id, event_id AS touch_id, event_type, ts AS touch_ts
        |  FROM events WHERE event_type IN ('click', 'view')),
        |j AS (
        |  SELECT c.conv_id, t.event_type, t.touch_id, t.touch_ts
        |  FROM conv c JOIN touch t ON c.user_id = t.user_id
        |   AND t.touch_ts <= c.conv_ts
        |   AND t.touch_ts >= c.conv_ts - INTERVAL 60 MINUTE),
        |r AS (
        |  SELECT *,
        |    row_number() OVER (PARTITION BY conv_id
        |                       ORDER BY touch_ts, touch_id) AS r,
        |    count(*) OVER (PARTITION BY conv_id) AS k
        |  FROM j),
        |c AS (
        |  SELECT event_type, conv_id,
        |    100 // k + CASE WHEN r <= 100 % k THEN 1 ELSE 0 END AS credit
        |  FROM r)
        |SELECT event_type, CAST(count(*) AS BIGINT) AS n_touches,
        |  CAST(sum(credit) AS BIGINT) AS credit_units,
        |  CAST(count(DISTINCT conv_id) AS BIGINT) AS n_conversions
        |FROM c GROUP BY event_type ORDER BY event_type""".stripMargin),
      (s, d) => EventAnalytics.linearAttribution(
        T(s, d, "events"), touchTypes = Seq("click", "view"))),

    // ingest-volume anomaly monitor (q163): hourly counts per type
    // tested against the trailing-24h window with the exact integer
    // inequality (n·x − S)² > 9·(n·Sxx − S²) — |x−μ| > 3σ multiplied
    // through by n², so the flag has no float boundary and the whole
    // monitor hash-matches. Hours with <12 trailing samples report
    // false with zeroed terms.
    // CUPED experiment readout (q169): variance-reduced A/B metric —
    // each user's post-period purchase count adjusted by their
    // pre-period activity, θ = cov/var pooled. Integer moments ride
    // DECIMAL(38,0)/HUGEINT and surface as exact BIGINT; the two means
    // are a fixed tree of correctly-rounded double ops over identical
    // integers, so even the adjusted mean hash-matches. The cutover is
    // a whole-day literal (rule 2). Variant split = q134's hash.
    Q("q169_cuped", Some(
      """WITH peruser AS (
        |  SELECT user_id,
        |    sum(CASE WHEN ts < TIMESTAMP '2024-01-16 00:00:00'
        |             THEN 1 ELSE 0 END) AS x,
        |    sum(CASE WHEN ts >= TIMESTAMP '2024-01-16 00:00:00'
        |                  AND event_type = 'purchase'
        |             THEN 1 ELSE 0 END) AS y
        |  FROM events GROUP BY user_id),
        |g AS (SELECT count(*) AS n, sum(x) AS sx, sum(y) AS sy,
        |        sum(x*x) AS sxx, sum(x*y) AS sxy FROM peruser),
        |v AS (SELECT CASE WHEN (user_id * 104729) % 100 < 50
        |               THEN 'A' ELSE 'B' END AS variant,
        |        count(*) AS n_users, sum(x) AS sx_v, sum(y) AS sy_v
        |      FROM peruser GROUP BY 1)
        |SELECT variant, n_users,
        |  CAST(sy_v AS BIGINT) AS sum_y, CAST(sx_v AS BIGINT) AS sum_x,
        |  CAST(n*sxy - sx*sy AS BIGINT) AS theta_num,
        |  CAST(n*sxx - sx*sx AS BIGINT) AS theta_den,
        |  CAST(sy_v AS DOUBLE) / CAST(n_users AS DOUBLE) AS mean_y,
        |  CAST(sy_v AS DOUBLE) / CAST(n_users AS DOUBLE)
        |    - (CAST(n*sxy - sx*sy AS DOUBLE) / CAST(n*sxx - sx*sx AS DOUBLE))
        |      * (CAST(sx_v AS DOUBLE) / CAST(n_users AS DOUBLE)
        |         - CAST(sx AS DOUBLE) / CAST(n AS DOUBLE))
        |    AS adjusted_mean_y
        |FROM v CROSS JOIN g ORDER BY variant""".stripMargin),
      (s, d) => EventAnalytics.cupedReadout(
        T(s, d, "events"), cutoverTs = "2024-01-16 00:00:00")),

    Q("q163_volume_anomaly", Some(
      """WITH hourly AS (
        |  SELECT event_type, date_trunc('hour', ts) AS h, count(*) AS x
        |  FROM events GROUP BY 1, 2),
        |trail AS (
        |  SELECT event_type, h, x,
        |    CAST(coalesce(sum(x) OVER w, 0) AS BIGINT) AS s,
        |    coalesce(sum(CAST(x AS HUGEINT) * x) OVER w, 0) AS sxx,
        |    CAST(count(x) OVER w AS BIGINT) AS trail_n
        |  FROM hourly
        |  WINDOW w AS (PARTITION BY event_type ORDER BY h
        |               ROWS BETWEEN 24 PRECEDING AND 1 PRECEDING)),
        |terms AS (
        |  SELECT event_type, h, x AS n_events, trail_n,
        |    CASE WHEN trail_n >= 12
        |         THEN (CAST(trail_n AS HUGEINT) * x - s)
        |            * (CAST(trail_n AS HUGEINT) * x - s)
        |         ELSE 0 END AS dev2,
        |    CASE WHEN trail_n >= 12
        |         THEN 9 * (CAST(trail_n AS HUGEINT) * sxx
        |                   - CAST(s AS HUGEINT) * s)
        |         ELSE 0 END AS bound
        |  FROM trail)
        |SELECT event_type,
        |  strftime(CAST(h AS TIMESTAMP), '%Y-%m-%d %H:%M:%S') AS h,
        |  CAST(n_events AS BIGINT) AS n_events, trail_n,
        |  CAST(dev2 AS DOUBLE) AS dev2, CAST(bound AS DOUBLE) AS bound,
        |  trail_n >= 12 AND dev2 > bound AS is_anomaly
        |FROM terms
        |ORDER BY event_type, h""".stripMargin),
      (s, d) => EventAnalytics.volumeAnomalies(T(s, d, "events")))
  )

  /** q151's quantile probes; interpolated e-suffixed into the oracle
    * (rule 14) so both engines parse the identical double. */
  private lazy val latencyProbes: Seq[Double] = Seq(0.5, 0.9, 0.99)

  /** The q191/q213 shared life table: user first/last day, integer
    * day-age, final-day right-censoring, age-grain death/censor counts
    * (ends with CTE `h`). One definition, both estimators. */
  private lazy val lifeTableCtes: String =
    """u AS (SELECT user_id, min(date_trunc('day', ts)) AS f,
      |                  max(date_trunc('day', ts)) AS l
      |           FROM events GROUP BY 1),
      |a AS (SELECT CAST(date_diff('day', f, l) AS BIGINT) AS age,
      |             CASE WHEN l = (SELECT max(date_trunc('day', ts))
      |                            FROM events) THEN 1 ELSE 0 END AS cens
      |      FROM u),
      |h AS MATERIALIZED (
      |      SELECT age, count(*) AS n_at_age,
      |             CAST(sum(1 - cens) AS BIGINT) AS deaths,
      |             CAST(sum(cens) AS BIGINT) AS censored
      |      FROM a GROUP BY 1)""".stripMargin
}
