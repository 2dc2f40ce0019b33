package graft.queries

import org.apache.spark.sql.functions._

import graft.Tables

/** Function-surface suite: JSON extraction, window functions, string and
  * math libraries, conditionals, interval arithmetic, array functions,
  * grouping sets — all oracled. Determinism notes: transcendentals other
  * than sqrt (correctly-rounded by IEEE) are avoided; float→string
  * formatting is never part of an oracle projection.
  */
object SurfaceQueries {

  val all: Seq[Q] = Seq(

    // JSON extraction from the events.props string column
    Q("q60_json", Some(
      """SELECT event_id,
        |       json_extract_string(props, '$.k') AS k_str,
        |       CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_num
        |FROM events ORDER BY event_id""".stripMargin),
      (s, d) => Tables.load(s, d, "events")
        .select(col("event_id"),
          get_json_object(col("props"), "$.k").as("k_str"),
          get_json_object(col("props"), "$.k").cast("bigint").as("k_num"))
        .orderBy(col("event_id"))),

    // window-function suite: rank, lag/lead, running aggregates
    Q("q61_window_suite", Some(
      """SELECT o_custkey, o_orderkey, o_totalprice,
        |  rank()       OVER w AS rnk,
        |  dense_rank() OVER w AS drnk,
        |  lag(o_totalprice)  OVER w AS prev_price,
        |  lead(o_totalprice) OVER w AS next_price,
        |  count(*) OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey
        |                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS running_n,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2)))
        |    OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_total
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey)
        |ORDER BY o_custkey, rnk""".stripMargin),
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy(col("o_custkey"))
          .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        val wr = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        Tables.load(s, d, "orders")
          .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
            rank().over(w).as("rnk"),
            dense_rank().over(w).as("drnk"),
            lag(col("o_totalprice"), 1).over(w).as("prev_price"),
            lead(col("o_totalprice"), 1).over(w).as("next_price"),
            count(lit(1)).over(wr).as("running_n"),
            sum(col("o_totalprice").cast("decimal(18,2)")).over(wr)
              .cast("double").as("running_total"))
          .orderBy(col("o_custkey"), col("rnk"))
      }),

    // string-function suite
    Q("q62_string_suite", Some(
      """SELECT c_custkey,
        |  substr(c_name, 10, 5) AS sub5,
        |  replace(c_name, 'Customer', 'C') AS repl,
        |  lpad(CAST(c_custkey AS VARCHAR), 6, '0') AS padded,
        |  reverse(c_mktsegment) AS rev,
        |  strpos(c_name, '9') AS pos9,
        |  length(trim('  ' || c_mktsegment || ' ')) AS trimmed_len
        |FROM customer ORDER BY c_custkey""".stripMargin),
      (s, d) => Tables.load(s, d, "customer")
        .select(col("c_custkey"),
          substring(col("c_name"), 10, 5).as("sub5"),
          regexp_replace(col("c_name"), "Customer", "C").as("repl"),
          lpad(col("c_custkey").cast("string"), 6, "0").as("padded"),
          reverse(col("c_mktsegment")).as("rev"),
          instr(col("c_name"), "9").as("pos9"),
          length(trim(concat(lit("  "), col("c_mktsegment"), lit(" "))))
            .as("trimmed_len"))
        .orderBy(col("c_custkey"))),

    // conditional suite: CASE, coalesce∘nullif, least/greatest
    Q("q63_conditional", Some(
      """SELECT o_orderkey,
        |  CASE WHEN o_totalprice > 300000 THEN 'high'
        |       WHEN o_totalprice > 100000 THEN 'mid'
        |       ELSE 'low' END AS bucket,
        |  coalesce(nullif(o_orderstatus, 'O'), 'open') AS status_label,
        |  least(o_totalprice, 250000.0) AS capped,
        |  greatest(o_totalprice, 50000.0) AS floored
        |FROM orders ORDER BY o_orderkey""".stripMargin),
      (s, d) => Tables.load(s, d, "orders")
        .select(col("o_orderkey"),
          when(col("o_totalprice") > 300000, "high")
            .when(col("o_totalprice") > 100000, "mid")
            .otherwise("low").as("bucket"),
          coalesce(nullif(col("o_orderstatus"), lit("O")), lit("open"))
            .as("status_label"),
          least(col("o_totalprice"), lit(250000.0)).as("capped"),
          greatest(col("o_totalprice"), lit(50000.0)).as("floored"))
        .orderBy(col("o_orderkey"))),

    // math suite (sqrt is correctly-rounded IEEE; exp/ln avoided)
    Q("q64_math", Some(
      """SELECT l_orderkey, l_linenumber,
        |  abs(l_partkey - 1000) AS a_abs,
        |  CAST(ceil(l_extendedprice / 1000) AS BIGINT) AS a_ceil,
        |  CAST(floor(l_extendedprice / 1000) AS BIGINT) AS a_floor,
        |  round(l_extendedprice / 7, 2) AS a_round,
        |  sqrt(l_quantity) AS a_sqrt,
        |  power(l_linenumber, 3) AS a_pow
        |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin),
      (s, d) => Tables.load(s, d, "lineitem")
        .select(col("l_orderkey"), col("l_linenumber"),
          abs(col("l_partkey") - 1000).as("a_abs"),
          ceil(col("l_extendedprice") / 1000).as("a_ceil"),
          floor(col("l_extendedprice") / 1000).as("a_floor"),
          round(col("l_extendedprice") / 7, 2).as("a_round"),
          sqrt(col("l_quantity")).as("a_sqrt"),
          pow(col("l_linenumber"), 3).as("a_pow"))
        .orderBy(col("l_orderkey"), col("l_linenumber"))),

    // interval arithmetic + calendar truncation
    Q("q65_interval", Some(
      """SELECT o_orderkey,
        |  o_orderdate + INTERVAL 30 DAY AS due_date,
        |  CAST(date_trunc('quarter', o_orderdate) AS TIMESTAMP) AS q_start,
        |  date_diff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS days_since
        |FROM orders ORDER BY o_orderkey""".stripMargin),
      (s, d) => Tables.load(s, d, "orders")
        .select(col("o_orderkey"),
          (col("o_orderdate") + expr("INTERVAL 30 DAY")).as("due_date"),
          date_trunc("quarter", col("o_orderdate")).as("q_start"),
          datediff(col("o_orderdate").cast("date"),
            lit("1995-01-01").cast("date")).as("days_since"))
        .orderBy(col("o_orderkey"))),

    // array functions over embeddings (no float→string formatting)
    Q("q66_array_functions", Some(
      """SELECT vec_id,
        |  len(embedding) AS n_dims,
        |  embedding[1] AS first_dim,
        |  list_max(embedding) AS amax,
        |  list_min(embedding) AS amin
        |FROM embeddings ORDER BY vec_id""".stripMargin),
      (s, d) => Tables.load(s, d, "embeddings")
        .select(col("vec_id"),
          size(col("embedding")).as("n_dims"),
          element_at(col("embedding"), 1).as("first_dim"),
          array_max(col("embedding")).as("amax"),
          array_min(col("embedding")).as("amin"))
        .orderBy(col("vec_id"))),

    // session windows under the oracle: Spark's native session_window vs
    // the classic gaps-and-islands SQL (lag + cumulative break count).
    // Timestamps project only at second granularity — exact on the
    // µs-native data (and under any coarser truncation, since µs divides
    // s; rule 2). The break condition uses >= gap to mirror
    // session_window's exclusive end.
    Q("q68_sessionize", Some(
      """WITH e AS (
        |  SELECT user_id, ts, value,
        |    CASE WHEN lag(ts) OVER w IS NULL
        |           OR ts - lag(ts) OVER w >= INTERVAL 30 MINUTE
        |         THEN 1 ELSE 0 END AS brk
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
        |g AS (
        |  SELECT user_id, ts, value,
        |    sum(brk) OVER (PARTITION BY user_id ORDER BY ts
        |                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
        |  FROM e)
        |SELECT user_id, CAST(date_trunc('second', min(ts)) AS TIMESTAMP) AS s_start_sec,
        |       count(*) AS n_events,
        |       CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
        |FROM g GROUP BY user_id, sid
        |ORDER BY user_id, s_start_sec""".stripMargin),
      (s, d) => Tables.load(s, d, "events")
        .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
        .agg(count(lit(1)).as("n_events"),
          sum(col("value").cast("decimal(18,2)")).cast("double").as("total_value"))
        .select(col("user_id"),
          date_trunc("second", col("session_window.start")).as("s_start_sec"),
          col("n_events"), col("total_value"))
        .orderBy(col("user_id"), col("s_start_sec"))),

    // exact interpolated percentiles (Spark percentile ≡ DuckDB
    // quantile_cont: same sort + linear-interpolation formula)
    Q("q79_percentiles", Some(
      """SELECT o_orderstatus,
        |       quantile_cont(o_totalprice, 0.5) AS p50,
        |       quantile_cont(o_totalprice, 0.9) AS p90,
        |       count(*) AS n
        |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin),
      (s, d) => Tables.load(s, d, "orders")
        .groupBy(col("o_orderstatus"))
        .agg(expr("percentile(o_totalprice, 0.5)").as("p50"),
          expr("percentile(o_totalprice, 0.9)").as("p90"),
          count(lit(1)).as("n"))
        .orderBy(col("o_orderstatus"))),

    // GROUPING SETS beyond plain rollup
    Q("q67_grouping_sets", Some(
      """SELECT coalesce(l_returnflag, 'ALL') AS flag,
        |       coalesce(l_linestatus, 'ALL') AS status,
        |       count(*) AS n, sum(l_quantity) AS sum_qty
        |FROM lineitem
        |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        |ORDER BY flag, status""".stripMargin),
      (s, d) => {
        Tables.registerAll(s, d)
        s.sql(
          """SELECT coalesce(l_returnflag, 'ALL') AS flag,
            |       coalesce(l_linestatus, 'ALL') AS status,
            |       count(*) AS n, sum(l_quantity) AS sum_qty
            |FROM lineitem
            |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
            |ORDER BY flag, status""".stripMargin)
      }),

    // CUBE: all 2^k grouping combinations (rollup covers the prefix
    // chain, grouping sets the explicit list — cube completes the family)
    Q("q109_cube", Some(
      """SELECT coalesce(l_returnflag, 'ALL') AS flag,
        |       coalesce(l_linestatus, 'ALL') AS status,
        |       count(*) AS n, sum(l_quantity) AS sum_qty
        |FROM lineitem
        |GROUP BY CUBE (l_returnflag, l_linestatus)
        |ORDER BY flag, status""".stripMargin),
      (s, d) => Tables.load(s, d, "lineitem")
        .cube(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("n"), sum(col("l_quantity")).as("sum_qty"))
        .select(coalesce(col("l_returnflag"), lit("ALL")).as("flag"),
          coalesce(col("l_linestatus"), lit("ALL")).as("status"),
          col("n"), col("sum_qty"))
        .orderBy(col("flag"), col("status"))),

    // rank-fraction windows: percent_rank ((rank-1)/(n-1)), cume_dist,
    // ntile — the quantile-binning window family. Exact: the divisions
    // are small-integer ratios, identical IEEE doubles in both engines.
    Q("q110_window_ranks", Some(
      """SELECT o_custkey, o_orderkey,
        |       percent_rank() OVER w AS pr,
        |       cume_dist()    OVER w AS cd,
        |       CAST(ntile(4)  OVER w AS BIGINT) AS quartile
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice, o_orderkey)
        |ORDER BY o_custkey, o_orderkey""".stripMargin),
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy(col("o_custkey"))
          .orderBy(col("o_totalprice"), col("o_orderkey"))
        Tables.load(s, d, "orders")
          .select(col("o_custkey"), col("o_orderkey"),
            percent_rank().over(w).as("pr"),
            cume_dist().over(w).as("cd"),
            ntile(4).over(w).cast("long").as("quartile"))
          .orderBy(col("o_custkey"), col("o_orderkey"))
      }),

    // conditional/boolean aggregates: count_if, bool_and, bool_or
    Q("q111_conditional_aggs", Some(
      """SELECT l_returnflag,
        |       count(*) FILTER (WHERE l_quantity > 25) AS n_big,
        |       bool_and(l_quantity > 0)  AS all_positive,
        |       bool_or(l_discount > 0.05) AS any_discounted
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin),
      (s, d) => Tables.load(s, d, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(count_if(col("l_quantity") > 25).as("n_big"),
          bool_and(col("l_quantity") > 0).as("all_positive"),
          bool_or(col("l_discount") > 0.05).as("any_discounted"))
        .orderBy(col("l_returnflag"))),

    // unpivot/melt: wide measure columns → long (key, measure, value)
    // rows via the native Unpivot plan (Spark 3.4+ df.unpivot — an
    // Expand node: per-row fan-out, no shuffle, no join). The oracle is
    // the portable UNION ALL formulation.
    Q("q119_unpivot", Some(
      """SELECT l_orderkey, l_linenumber, measure, val FROM (
        |  SELECT l_orderkey, l_linenumber, 'l_quantity' AS measure, l_quantity AS val FROM lineitem
        |  UNION ALL SELECT l_orderkey, l_linenumber, 'l_extendedprice', l_extendedprice FROM lineitem
        |  UNION ALL SELECT l_orderkey, l_linenumber, 'l_discount', l_discount FROM lineitem
        |  UNION ALL SELECT l_orderkey, l_linenumber, 'l_tax', l_tax FROM lineitem)
        |ORDER BY l_orderkey, l_linenumber, measure""".stripMargin),
      (s, d) => Tables.load(s, d, "lineitem")
        .unpivot(
          Array(col("l_orderkey"), col("l_linenumber")),
          Array(col("l_quantity"), col("l_extendedprice"),
            col("l_discount"), col("l_tax")),
          "measure", "val")
        .orderBy(col("l_orderkey"), col("l_linenumber"), col("measure"))),

    // moment statistics (variance / stddev / correlation) computed from
    // EXACT decimal power sums, not the engines' streaming aggregates:
    // Spark's stddev/corr accumulate doubles in partition order, so their
    // low bits are nondeterministic under shuffle and can never
    // hash-match another engine. Σx, Σx², Σxy as decimals are exact and
    // order-independent; the closed-form combine runs as one identical
    // IEEE expression on both sides. Same pattern at 100 TB: the power
    // sums are map-side-combining aggregates, the formula is a per-group
    // scalar epilogue.
    Q("q121_moments", Some(
      """WITH s AS (
        |  SELECT l_returnflag, count(*) AS n,
        |    CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sx,
        |    CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sxx,
        |    sum(l_quantity) AS sy,
        |    sum(l_quantity * l_quantity) AS syy,
        |    CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_quantity AS DECIMAL(8,2))) AS DOUBLE) AS sxy
        |  FROM lineitem GROUP BY l_returnflag)
        |SELECT l_returnflag, n,
        |  (n * sxx - sx * sx) / (n * (n - 1)) AS var_price,
        |  sqrt((n * sxx - sx * sx) / (n * (n - 1))) AS sd_price,
        |  (n * sxy - sx * sy)
        |    / (sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy)) AS corr_price_qty
        |FROM s ORDER BY l_returnflag""".stripMargin),
      (s, d) => {
        val price = col("l_extendedprice").cast("decimal(18,2)")
        val sums = Tables.load(s, d, "lineitem")
          .groupBy(col("l_returnflag"))
          .agg(count(lit(1)).as("n"),
            sum(price).cast("double").as("sx"),
            sum(price * price).cast("double").as("sxx"),
            sum(col("l_quantity")).as("sy"),
            sum(col("l_quantity") * col("l_quantity")).as("syy"),
            sum(price * col("l_quantity").cast("decimal(8,2)"))
              .cast("double").as("sxy"))
        val varP = (col("n") * col("sxx") - col("sx") * col("sx")) /
          (col("n") * (col("n") - 1))
        val corr = (col("n") * col("sxy") - col("sx") * col("sy")) /
          (sqrt(col("n") * col("sxx") - col("sx") * col("sx")) *
            sqrt(col("n") * col("syy") - col("sy") * col("sy")))
        sums.select(col("l_returnflag"), col("n"),
          varP.as("var_price"), sqrt(varP).as("sd_price"),
          corr.as("corr_price_qty"))
          .orderBy(col("l_returnflag"))
      }),

    // ordered string aggregation: deterministic listagg via sort-then-
    // join (collect_list alone is partition-order-dependent — the
    // array_sort is what makes this oracle-able)
    Q("q112_string_agg", Some(
      """SELECT n_regionkey, string_agg(n_name, ',' ORDER BY n_name) AS members
        |FROM nation GROUP BY n_regionkey ORDER BY n_regionkey""".stripMargin),
      (s, d) => Tables.load(s, d, "nation")
        .groupBy(col("n_regionkey"))
        .agg(array_join(array_sort(collect_list(col("n_name"))), ",")
          .as("members"))
        .orderBy(col("n_regionkey"))),

    // semi-structured extraction: events.props is a JSON payload; parse
    // it ONCE into a typed struct (from_json with an explicit schema —
    // the scalable idiom: one parse however many fields are projected,
    // fully codegen'd; repeated get_json_object calls re-parse the
    // string per field), then aggregate the extracted int. All-integer
    // aggregates, so exact; DuckDB's HUGEINT sum is cast back per
    // rule 1.
    Q("q152_props_json", Some(
      """WITH e AS (
        |  SELECT event_type, CAST(props->>'$.k' AS BIGINT) AS k FROM events)
        |SELECT event_type, count(*) AS n,
        |       CAST(sum(k) AS BIGINT) AS sum_k,
        |       min(k) AS min_k, max(k) AS max_k,
        |       CAST(count(DISTINCT k) AS BIGINT) AS n_distinct_k
        |FROM e GROUP BY event_type ORDER BY event_type""".stripMargin),
      (s, d) => Tables.load(s, d, "events")
        .select(col("event_type"),
          from_json(col("props"), org.apache.spark.sql.types.StructType(Seq(
            org.apache.spark.sql.types.StructField("k",
              org.apache.spark.sql.types.LongType))))
            .getField("k").as("k"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"), sum(col("k")).as("sum_k"),
          min(col("k")).as("min_k"), max(col("k")).as("max_k"),
          countDistinct(col("k")).as("n_distinct_k"))
        .orderBy(col("event_type")))
  )
}
