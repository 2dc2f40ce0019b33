package graft.queries

import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.{AsOfJoin, Layout, RangeJoin, RuntimeFilter, Skew}

/** Scale-pattern operators: as-of join (union-window, not range join),
  * salted aggregation/join (skew mitigation, result-identical to naive
  * forms — the oracles assert it), rollup, pivot, and a genuinely
  * STREAMING query whose append-mode output is oracled against the batch
  * watermark formula.
  */
object ScaleQueries {

  val all: Seq[Q] = Seq(

    // structured streaming, under the correctness gate: run the events
    // file through readStream → watermark → 5-min windows → memory sink;
    // append mode emits exactly the windows closed by the final watermark
    // (max event time - 10 min), which the DuckDB oracle reproduces.
    Q("q51_stream_windows", Some(
      """WITH wm AS (SELECT max(ts) - INTERVAL 10 MINUTE AS w FROM events),
        |b AS (SELECT time_bucket(INTERVAL 5 MINUTE, ts) AS w_start, event_type,
        |             count(*) AS n, sum(CAST(value AS DECIMAL(18,2))) AS total_value
        |      FROM events GROUP BY 1, 2)
        |SELECT b.w_start, b.event_type, b.n,
        |       CAST(b.total_value AS DOUBLE) AS total_value FROM b, wm
        |WHERE b.w_start + INTERVAL 5 MINUTE <= wm.w
        |ORDER BY w_start, event_type""".stripMargin),
      (s, d) => {
        val name = "graft_stream_q51"
        val q = graft.streaming.EventPipeline.startWindowedQuery(
          s, graft.queries.Staging.eventsDir(d), name)
        try q.processAllAvailable() finally q.stop()
        s.table(name)
          .select(col("w_start"), col("event_type"), col("n"),
            col("total_value").cast("double").as("total_value"))
          .orderBy(col("w_start"), col("event_type"))
      }),

    // native session windows as a STREAM under the gate (q225): the
    // session-window state machine merges a user's events across
    // micro-batches until the watermark closes the session — unlike
    // q68 (the same islands semantics computed in batch with
    // lag/cumsum), the Spark side here is the real stateful streaming
    // operator, so the oracle's gaps-and-islands replay is a genuine
    // cross-implementation differential. Emission contract mirrors
    // q51/q113: a session is emitted once its END (last event + the
    // 30-minute gap) clears the final watermark (max ts − 10 min); the
    // oracle applies the same cutoff. Session breaks at diff > gap
    // STRICTLY — measured (2-event exact-gap repro + a 5-session delta
    // at the 10M-event probe): Spark MERGES an event landing exactly
    // at the window end into the session, so the islands break must be
    // `>`, not q68's self-consistent-both-sides `>=`; with `>` the
    // oracle stays tie-proof under any testdata regen (rule 2's
    // philosophy — current SFs carry no exact-gap ties). Value sums
    // ride DECIMAL(18,2) (order-independent), doubles only at the
    // output cast (rule 1). (user_id, s_start) is a unique total order:
    // a user's sessions are disjoint by construction.
    Q("q225_stream_sessions", Some(
      """WITH wm AS (SELECT max(ts) - INTERVAL 10 MINUTE AS w FROM events),
        |e AS (
        |  SELECT user_id, ts, event_id, value,
        |    CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
        |           OR ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
        |              > INTERVAL 30 MINUTE
        |         THEN 1 ELSE 0 END AS brk
        |  FROM events),
        |sids AS (
        |  SELECT user_id, ts, event_id, value,
        |    sum(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |                   ROWS UNBOUNDED PRECEDING) AS sid
        |  FROM e),
        |sess AS (
        |  SELECT user_id, min(ts) AS s_start,
        |         max(ts) + INTERVAL 30 MINUTE AS s_end,
        |         count(*) AS n_events,
        |         sum(CAST(value AS DECIMAL(18,2))) AS total_value
        |  FROM sids GROUP BY user_id, sid)
        |SELECT s.s_start, s.s_end, s.user_id, s.n_events,
        |       CAST(s.total_value AS DOUBLE) AS total_value
        |FROM sess s, wm WHERE s.s_end <= wm.w
        |ORDER BY s.user_id, s.s_start""".stripMargin),
      (s, d) => {
        val name = "graft_stream_q225"
        val q = graft.streaming.EventPipeline.startSessionsQuery(
          s, graft.queries.Staging.eventsDir(d), name)
        try q.processAllAvailable() finally q.stop()
        s.table(name)
          .select(col("s_start"), col("s_end"), col("user_id"),
            col("n_events"), col("total_value").cast("double").as("total_value"))
          .orderBy(col("user_id"), col("s_start"))
      }),

    // hopping-window streaming aggregation under the gate: 10-minute
    // windows sliding every 5 — each event lands in exactly two
    // windows, which the oracle reproduces by unnesting the two bucket
    // starts; append mode emits windows whose END clears the final
    // watermark (max ts - 10 min).
    Q("q113_stream_hopping", Some(
      """WITH wm AS (SELECT max(ts) - INTERVAL 10 MINUTE AS w FROM events),
        |e AS (SELECT event_type, value,
        |             unnest([time_bucket(INTERVAL 5 MINUTE, ts),
        |                     time_bucket(INTERVAL 5 MINUTE, ts) - INTERVAL 5 MINUTE])
        |               AS w_start
        |      FROM events),
        |b AS (SELECT w_start, event_type, count(*) AS n,
        |             sum(CAST(value AS DECIMAL(18,2))) AS total_value
        |      FROM e GROUP BY 1, 2)
        |SELECT b.w_start, b.event_type, b.n,
        |       CAST(b.total_value AS DOUBLE) AS total_value FROM b, wm
        |WHERE b.w_start + INTERVAL 10 MINUTE <= wm.w
        |ORDER BY w_start, event_type""".stripMargin),
      (s, d) => {
        val name = "graft_stream_q113"
        val q = graft.streaming.EventPipeline.startHoppingQuery(
          s, graft.queries.Staging.eventsDir(d), name)
        try q.processAllAvailable() finally q.stop()
        s.table(name)
          .select(col("w_start"), col("event_type"), col("n"),
            col("total_value").cast("double").as("total_value"))
          .orderBy(col("w_start"), col("event_type"))
      }),

    // ROLLUP with subtotal rows labeled 'ALL'
    Q("q46_rollup", Some(
      """SELECT coalesce(l_returnflag, 'ALL') AS flag,
        |       coalesce(l_linestatus, 'ALL') AS status,
        |       count(*) AS n, sum(l_quantity) AS sum_qty
        |FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
        |ORDER BY flag, status""".stripMargin),
      (s, d) => Tables.load(s, d, "lineitem")
        .rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("n"), sum(col("l_quantity")).as("sum_qty"))
        .select(coalesce(col("l_returnflag"), lit("ALL")).as("flag"),
          coalesce(col("l_linestatus"), lit("ALL")).as("status"),
          col("n"), col("sum_qty"))
        .orderBy(col("flag"), col("status"))),

    // PIVOT linestatus into columns
    Q("q47_pivot", Some(
      """SELECT l_returnflag,
        |       sum(CASE WHEN l_linestatus = 'F' THEN l_quantity END) AS F,
        |       sum(CASE WHEN l_linestatus = 'O' THEN l_quantity END) AS O
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin),
      (s, d) => Tables.load(s, d, "lineitem")
        .groupBy(col("l_returnflag"))
        .pivot("l_linestatus", Seq("F", "O"))
        .agg(sum(col("l_quantity")))
        .orderBy(col("l_returnflag"))),

    // as-of join: each purchase enriched with the user's latest prior click
    Q("q48_asof_join", Some(
      """SELECT p.event_id, p.user_id, c.event_id AS click_id
        |FROM (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts
        |      FROM events WHERE event_type = 'purchase') p
        |ASOF LEFT JOIN (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts
        |      FROM events WHERE event_type = 'click') c
        |  ON p.user_id = c.user_id AND p.ts >= c.ts
        |ORDER BY p.event_id""".stripMargin),
      (s, d) => {
        val ev = Tables.load(s, d, "events")
        AsOfJoin.asOfLeft(
          ev.filter(col("event_type") === "purchase"),
          ev.filter(col("event_type") === "click"),
          key = "user_id", leftTs = "ts", rightTs = "ts",
          valueCols = Seq("event_id" -> "click_id"))
          .select(col("event_id"), col("user_id"), col("click_id"))
          .orderBy(col("event_id"))
      }),

    // forward as-of with tolerance (q196): each click linked to the
    // user's NEXT purchase, nulled when it is more than 3600 whole
    // seconds ahead — merge_asof direction='forward' + tolerance. The
    // oracle ranks the unbounded forward candidates and nulls the
    // nearest match past tolerance (equivalent to excluding it: any
    // farther row is farther still); second-epoch comparison keeps the
    // bound exact under any ts resolution (rule 2).
    Q("q196_asof_forward", Some(
      """WITH p AS (SELECT event_id, user_id, ts FROM events
        |           WHERE event_type = 'purchase'),
        |c AS (SELECT event_id, user_id, ts FROM events
        |      WHERE event_type = 'click'),
        |j AS (SELECT c.event_id, p.event_id AS purchase_id, p.ts AS pts,
        |             row_number() OVER (PARTITION BY c.event_id
        |               ORDER BY p.ts, p.event_id) AS rn
        |      FROM c JOIN p ON p.user_id = c.user_id AND p.ts >= c.ts),
        |m AS (SELECT event_id, purchase_id, pts FROM j WHERE rn = 1)
        |SELECT c.event_id, c.user_id,
        |       CASE WHEN CAST(epoch(date_trunc('second', m.pts)) AS BIGINT)
        |               - CAST(epoch(date_trunc('second', c.ts)) AS BIGINT)
        |              <= 3600 THEN m.purchase_id END AS purchase_id
        |FROM c LEFT JOIN m ON m.event_id = c.event_id
        |ORDER BY c.event_id""".stripMargin),
      (s, d) => {
        val ev = Tables.load(s, d, "events")
        AsOfJoin.asOfForward(
          ev.filter(col("event_type") === "click"),
          ev.filter(col("event_type") === "purchase"),
          key = "user_id", leftTs = "ts", rightTs = "ts",
          valueCols = Seq("event_id" -> "purchase_id"),
          toleranceSec = Some(3600L), rightTie = Some("event_id"))
          .select(col("event_id"), col("user_id"), col("purchase_id"))
          .orderBy(col("event_id"))
      }),

    // interval (range) join via time-bucketing: every click within the 5
    // minutes before each purchase, same user. The bin equi-join replaces
    // the cross join a bare range predicate would cost (operator doc);
    // DuckDB executes the same semantics natively (IEJoin), which is the
    // oracle.
    // CAST(ts AS TIMESTAMP) is an identity on the µs-native data (kept
    // from the ns era, when it truncated DuckDB's ns to Spark's µs —
    // harmless now, and robust if a nanos boot ever returns)
    Q("q81_range_join", Some(
      """SELECT p.event_id AS p_id, p.user_id AS user_id, c.event_id AS c_id
        |FROM events p JOIN events c
        |  ON p.user_id = c.user_id
        | AND CAST(c.ts AS TIMESTAMP) >= CAST(p.ts AS TIMESTAMP) - INTERVAL 5 MINUTE
        | AND CAST(c.ts AS TIMESTAMP) <= CAST(p.ts AS TIMESTAMP)
        |WHERE p.event_type = 'purchase' AND c.event_type = 'click'
        |ORDER BY p_id, c_id""".stripMargin),
      (s, d) => {
        val ev = Tables.load(s, d, "events")
        RangeJoin.intervalJoin(
          ev.filter(col("event_type") === "purchase"),
          ev.filter(col("event_type") === "click"),
          tsCol = "ts", lookbackSec = 300, keys = Seq("user_id"))
          .select(col("l_event_id").as("p_id"), col("user_id"),
            col("r_event_id").as("c_id"))
          .orderBy(col("p_id"), col("c_id"))
      }),

    // interval×interval OVERLAP join (q183): 25 nation-anchored 10-day
    // audit windows × variable-length order intervals — the general
    // overlap case q81's point-in-window bucketing can't express. Both
    // sides bin-explode over their spanned 10-day quanta (no cross
    // join); the oracle is DuckDB's native IEJoin over the bare overlap
    // predicate. Everything rides int64 epoch seconds (whole-day
    // stamps, rule 2) and the min-date anchor is computed in-query, so
    // a testdata regen moves both engines together.
    Q("q183_overlap_join", Some(
      """WITH d0 AS (
        |  SELECT CAST(epoch(min(o_orderdate)) AS BIGINT) AS d FROM orders),
        |w AS (SELECT n_nationkey AS window_id,
        |             (SELECT d FROM d0) + n_nationkey*30*86400 AS ws,
        |             (SELECT d FROM d0) + n_nationkey*30*86400 + 864000 AS we
        |      FROM nation),
        |o AS (SELECT o_orderkey,
        |             CAST(epoch(o_orderdate) AS BIGINT) AS os,
        |             CAST(epoch(o_orderdate) AS BIGINT)
        |               + (o_orderkey % 5)*86400 AS oe
        |      FROM orders)
        |SELECT window_id, count(*) AS n_orders,
        |       min(o_orderkey) AS min_okey, max(o_orderkey) AS max_okey,
        |       CAST(sum(o_orderkey) AS BIGINT) AS sum_okey
        |FROM w JOIN o ON o.os <= w.we AND w.ws <= o.oe
        |GROUP BY 1 ORDER BY window_id""".stripMargin),
      (s, d) => {
        val orders = Tables.load(s, d, "orders")
        val d0 = orders.agg(
          min(unix_timestamp(col("o_orderdate"))).as("d0"))
        val windows = Tables.load(s, d, "nation")
          .crossJoin(broadcast(d0)) // 1-row anchor
          .select(col("n_nationkey").as("window_id"),
            (col("d0") + col("n_nationkey") * 30 * 86400).as("ws"),
            (col("d0") + col("n_nationkey") * 30 * 86400 + 864000).as("we"))
        val ords = orders.select(col("o_orderkey"),
          unix_timestamp(col("o_orderdate")).as("os"),
          (unix_timestamp(col("o_orderdate"))
            + (col("o_orderkey") % 5) * 86400).as("oe"))
        RangeJoin.overlapJoin(
            windows.withColumnRenamed("ws", "s").withColumnRenamed("we", "e"),
            ords.withColumnRenamed("os", "s").withColumnRenamed("oe", "e"),
            sCol = "s", eCol = "e", binSize = 864000L)
          .groupBy(col("l_window_id").as("window_id"))
          .agg(count(lit(1)).as("n_orders"),
            min(col("r_o_orderkey")).as("min_okey"),
            max(col("r_o_orderkey")).as("max_okey"),
            sum(col("r_o_orderkey")).as("sum_okey"))
          .orderBy(col("window_id"))
      }),

    // bloom runtime-filter join: the big side is pruned by a distributed
    // bloom sketch of the small side's keys BEFORE the join shuffle.
    // False positives only cost work — the join stays exact, which is
    // what the plain-join oracle asserts.
    Q("q82_bloom_join", Some(
      """SELECT o_orderpriority, count(*) AS n, sum(l_quantity) AS sum_qty
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |WHERE o_totalprice > 400000
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin),
      (s, d) => {
        val big = Tables.load(s, d, "lineitem")
        val small = Tables.load(s, d, "orders")
          .filter(col("o_totalprice") > 400000)
        RuntimeFilter.bloomJoin(big, small, "l_orderkey", "o_orderkey",
          expectedKeys = 100000L)
          .groupBy(col("o_orderpriority"))
          .agg(count(lit(1)).as("n"), sum(col("l_quantity")).as("sum_qty"))
          .orderBy(col("o_orderpriority"))
      }),

    // salted two-phase aggregation — identical result to plain GROUP BY
    Q("q49_salted_agg", Some(
      """SELECT l_suppkey,
        |       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS total
        |FROM lineitem GROUP BY l_suppkey ORDER BY l_suppkey""".stripMargin),
      (s, d) => {
        val li = Tables.load(s, d, "lineitem")
        Skew.saltedSum(li, Seq("l_suppkey"),
          col("l_extendedprice").cast("decimal(18,2)"), as = "total",
          saltExpr = xxhash64(col("l_orderkey"), col("l_linenumber")),
          salts = 16)
          .withColumn("total", col("total").cast("double"))
          .orderBy(col("l_suppkey"))
      }),

    // salted join — identical result to the plain equi-join
    Q("q50_salted_join", Some(
      """SELECT s_name, count(*) AS n,
        |       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS total
        |FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
        |GROUP BY s_name ORDER BY s_name""".stripMargin),
      (s, d) => {
        val li = Tables.load(s, d, "lineitem")
        val sup = Tables.load(s, d, "supplier")
        Skew.saltedJoin(li, sup, "l_suppkey", "s_suppkey",
          saltExpr = xxhash64(col("l_orderkey"), col("l_linenumber")), salts = 8)
          .groupBy(col("s_name"))
          .agg(count(lit(1)).as("n"),
            sum(col("l_extendedprice").cast("decimal(18,2)")).cast("double").as("total"))
          .orderBy(col("s_name"))
      }),

    // z-order layout key: exact integer Morton code over two dimensions
    // (bounds pass → map-side quantize/interleave), summarized per
    // 2^20-key bucket with both dimensions' spans — the bounded-span
    // output IS the pruning argument (each bucket touches a small range
    // of part keys AND supplier keys, so footer min/max stats can skip
    // it for predicates on either). Oracle generated from the same
    // bits/dims constants (Layout.zorderSql).
    Q("q102_zorder_layout", Some(zorderOracle),
      (s, d) => Layout.zorderKey(
          Tables.load(s, d, "lineitem")
            .select(col("l_partkey"), col("l_suppkey")),
          Seq("l_partkey", "l_suppkey"), bits = 16)
        .groupBy(shiftrightunsigned(col("zkey"), 20).as("zbucket"))
        .agg(count(lit(1)).as("n"),
          min(col("l_partkey")).as("min_part"), max(col("l_partkey")).as("max_part"),
          min(col("l_suppkey")).as("min_supp"), max(col("l_suppkey")).as("max_supp"))
        .orderBy(col("zbucket"))),

    // zone-map pruning audit (q193): the layout decision as a measured
    // number — simulated footer min/max skipping for a centered 10%
    // range box over (l_partkey, l_suppkey), under key-range files by
    // insert key ('natural') vs by Morton key ('zorder'). BOTH layouts'
    // per-file stats come from ONE GROUPING SETS shuffle; the verdict
    // is integer comparisons plus two exact divisions per layout.
    Q("q193_pruning_audit", Some(pruningOracle),
      (s, d) => Layout.pruningAudit(
        Tables.load(s, d, "lineitem")
          .select(col("l_orderkey"), col("l_partkey"), col("l_suppkey")),
        dims = Seq("l_partkey", "l_suppkey"), naturalKey = "l_orderkey"))
  )

  /** q193: bounds CTE (dims + natural key), the generated Morton
    * expression, GROUPING SETS per-file stats for both layouts, and the
    * integer band thresholds — all from the same constants as the Spark
    * side (fileBits=8, bits=16, band 45..55%). */
  private lazy val pruningOracle: String = {
    val (zExpr, _) = Layout.zorderSql(Seq("l_partkey", "l_suppkey"), 16)
    val boundsCte = Seq("l_partkey", "l_suppkey", "l_orderkey").map(d =>
      s"CAST(min($d) AS BIGINT) AS min_$d, CAST(max($d) AS BIGINT) AS max_$d")
      .mkString("SELECT ", ", ", "")
    s"""WITH b AS ($boundsCte FROM lineitem),
       |k AS (
       |  SELECT (CASE WHEN b.max_l_orderkey = b.min_l_orderkey THEN 0
       |          ELSE (CAST(t.l_orderkey AS BIGINT) - b.min_l_orderkey) * 255
       |               // (b.max_l_orderkey - b.min_l_orderkey) END) AS nf,
       |         ($zExpr >> 24) AS zf, t.l_partkey, t.l_suppkey
       |  FROM lineitem t CROSS JOIN b),
       |s AS (SELECT nf, zf, count(*) AS n,
       |             CAST(min(l_partkey) AS BIGINT) AS fmin_p,
       |             CAST(max(l_partkey) AS BIGINT) AS fmax_p,
       |             CAST(min(l_suppkey) AS BIGINT) AS fmin_s,
       |             CAST(max(l_suppkey) AS BIGINT) AS fmax_s
       |      FROM k GROUP BY GROUPING SETS ((nf), (zf))),
       |p AS (SELECT CASE WHEN nf IS NOT NULL THEN 'natural'
       |             ELSE 'zorder' END AS layout, n,
       |             fmin_p, fmax_p, fmin_s, fmax_s FROM s),
       |a AS (SELECT p.*,
       |        (fmax_p >= b.min_l_partkey
       |           + (b.max_l_partkey - b.min_l_partkey) * 45 // 100
       |         AND fmin_p <= b.min_l_partkey
       |           + (b.max_l_partkey - b.min_l_partkey) * 55 // 100
       |         AND fmax_s >= b.min_l_suppkey
       |           + (b.max_l_suppkey - b.min_l_suppkey) * 45 // 100
       |         AND fmin_s <= b.min_l_suppkey
       |           + (b.max_l_suppkey - b.min_l_suppkey) * 55 // 100)
       |          AS hit
       |      FROM p CROSS JOIN b)
       |SELECT layout, count(*) AS n_files,
       |       CAST(sum(CASE WHEN hit THEN 1 ELSE 0 END) AS BIGINT)
       |         AS n_scanned,
       |       CAST(sum(n) AS BIGINT) AS rows_total,
       |       CAST(sum(CASE WHEN hit THEN n ELSE 0 END) AS BIGINT)
       |         AS rows_scanned,
       |       CAST(sum(CASE WHEN hit THEN 1 ELSE 0 END) AS DOUBLE)
       |         / CAST(count(*) AS DOUBLE) AS scanned_file_share,
       |       CAST(sum(CASE WHEN hit THEN n ELSE 0 END) AS DOUBLE)
       |         / CAST(sum(n) AS DOUBLE) AS scanned_row_share
       |FROM a GROUP BY layout ORDER BY layout""".stripMargin
  }

  /** q102: bounds CTE + the generated quantize/interleave expression,
    * bucketed and spanned exactly as the Spark side. */
  private lazy val zorderOracle: String = {
    val (zExpr, boundsCte) = Layout.zorderSql(Seq("l_partkey", "l_suppkey"), 16)
    s"""WITH b AS ($boundsCte FROM lineitem),
       |z AS (
       |  SELECT $zExpr AS zkey, t.l_partkey, t.l_suppkey
       |  FROM lineitem t CROSS JOIN b)
       |SELECT zkey >> 20 AS zbucket, count(*) AS n,
       |       min(l_partkey) AS min_part, max(l_partkey) AS max_part,
       |       min(l_suppkey) AS min_supp, max(l_suppkey) AS max_supp
       |FROM z GROUP BY zkey >> 20
       |ORDER BY zbucket""".stripMargin
  }
}
