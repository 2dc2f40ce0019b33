package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** One registered query: Spark implementation + (optionally) the equivalent
  * ANSI SQL the driver runs in DuckDB as an oracle. Column names/aliases must
  * match between the two — the driver's compare sorts columns by name.
  */
final case class Q(
    name: String,
    oracle: Option[String],
    run: (SparkSession, String) => DataFrame)

/** The dfsql parity surface (SURVEY.md §2) expressed Spark-first.
  *
  * Determinism rules for oracle hash-matching (DuckDB vs Spark):
  *   - every query ends in a total ORDER BY (unique tiebreak column);
  *   - sums over non-integral doubles go through DECIMAL casts (exact,
  *     order-independent — a double sum's value depends on partition order)
  *     and the FINAL decimal value is cast to DOUBLE on both sides: the
  *     round-1 driver artifact showed DuckDB results surface in pandas as
  *     float64 while Spark parquet decimals stay Decimal, so a stringified
  *     compare sees '6105.7' vs '6105.70' and hash-mismatches any decimal
  *     output column (CORRECTNESS_r01.json q13/q16/q25/q49/q50/q58/q61);
  *   - single-row double arithmetic (a*b, 1-x, a/b) is bitwise identical in
  *     any IEEE-754 engine, so projections need no special handling;
  *   - l_quantity is integral-valued, so plain sum/avg over it is exact.
  *
  * Reference semantics being mirrored (citations into /root/reference):
  * projection/filter dfsql/data_sources/base_data_source.py:250-288,398-400;
  * joins :463-507; aggregation :290-383,522-539; subqueries :509-520,233-241;
  * ORDER/LIMIT/OFFSET :385-389,433-442; functions dfsql/functions.py.
  */
object ParityQueries {

  private def T(s: SparkSession, dir: String, n: String): DataFrame =
    graft.Tables.load(s, dir, n)

  /** decimal-cast for exact, order-independent sums over 2-dp doubles */
  private def dec(c: Column): Column = c.cast("decimal(18,2)")

  val all: Seq[Q] = Seq(

    // ---- projection + scalar arithmetic (base_data_source.py:250-288) ----
    Q("q01_projection", Some(
      """SELECT l_orderkey, l_linenumber, l_quantity,
        |       l_extendedprice * (1 - l_discount) AS disc_price
        |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin),
      (s, d) => T(s, d, "lineitem")
        .select($"l_orderkey", $"l_linenumber", $"l_quantity",
          ($"l_extendedprice" * (lit(1) - $"l_discount")).as("disc_price"))
        .orderBy($"l_orderkey", $"l_linenumber")),

    // ---- WHERE with and/or/not + comparisons (functions.py:39-145) ----
    Q("q02_filter", Some(
      """SELECT l_orderkey, l_linenumber, l_quantity, l_discount, l_returnflag
        |FROM lineitem
        |WHERE l_quantity > 45 AND NOT (l_discount > 0.02) AND l_returnflag = 'R'
        |ORDER BY l_orderkey, l_linenumber""".stripMargin),
      (s, d) => T(s, d, "lineitem")
        .filter($"l_quantity" > 45 && !($"l_discount" > 0.02) && $"l_returnflag" === "R")
        .select($"l_orderkey", $"l_linenumber", $"l_quantity", $"l_discount", $"l_returnflag")
        .orderBy($"l_orderkey", $"l_linenumber")),

    // ---- GROUP BY + sum/avg/count/min/max (base_data_source.py:290-383) ----
    Q("q03_agg_group", Some(
      """SELECT l_returnflag, l_linestatus,
        |       sum(l_quantity) AS sum_qty,
        |       avg(l_quantity) AS avg_qty,
        |       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base,
        |       min(l_extendedprice) AS min_price,
        |       max(l_extendedprice) AS max_price,
        |       count(*) AS count_order
        |FROM lineitem GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin),
      (s, d) => T(s, d, "lineitem")
        .groupBy($"l_returnflag", $"l_linestatus")
        .agg(
          sum($"l_quantity").as("sum_qty"),
          avg($"l_quantity").as("avg_qty"),
          sum(dec($"l_extendedprice")).cast("double").as("sum_base"),
          min($"l_extendedprice").as("min_price"),
          max($"l_extendedprice").as("max_price"),
          count(lit(1)).as("count_order"))
        .orderBy($"l_returnflag", $"l_linestatus")),

    // ---- implicit aggregation: no GROUP BY (base_data_source.py:402-415) ----
    Q("q04_agg_implicit", Some(
      """SELECT count(*) AS n_rows, sum(l_quantity) AS sum_qty,
        |       min(l_extendedprice) AS min_price, max(l_extendedprice) AS max_price
        |FROM lineitem""".stripMargin),
      (s, d) => T(s, d, "lineitem")
        .agg(count(lit(1)).as("n_rows"), sum($"l_quantity").as("sum_qty"),
          min($"l_extendedprice").as("min_price"), max($"l_extendedprice").as("max_price"))),

    // ---- count(DISTINCT …) — exact (functions.py:321-323) ----
    Q("q05_count_distinct", Some(
      """SELECT count(DISTINCT l_suppkey) AS n_supp,
        |       count(DISTINCT l_partkey) AS n_part,
        |       count(DISTINCT l_returnflag) AS n_flag
        |FROM lineitem""".stripMargin),
      (s, d) => T(s, d, "lineitem")
        .agg(countDistinct($"l_suppkey").as("n_supp"),
          countDistinct($"l_partkey").as("n_part"),
          countDistinct($"l_returnflag").as("n_flag"))),

    // ---- HAVING (base_data_source.py:424-428) ----
    Q("q06_having", Some(
      """SELECT l_suppkey, sum(l_quantity) AS sum_qty, count(*) AS n
        |FROM lineitem GROUP BY l_suppkey
        |HAVING sum(l_quantity) > 15000 ORDER BY l_suppkey""".stripMargin),
      (s, d) => T(s, d, "lineitem")
        .groupBy($"l_suppkey")
        .agg(sum($"l_quantity").as("sum_qty"), count(lit(1)).as("n"))
        .filter($"sum_qty" > 15000)
        .orderBy($"l_suppkey")),

    // ---- DISTINCT (base_data_source.py:430-431) ----
    Q("q07_distinct", Some(
      """SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem
        |ORDER BY l_returnflag, l_linestatus""".stripMargin),
      (s, d) => T(s, d, "lineitem")
        .select($"l_returnflag", $"l_linestatus").distinct()
        .orderBy($"l_returnflag", $"l_linestatus")),

    // ---- ORDER BY multi-key asc/desc + LIMIT/OFFSET (:385-389,433-442) ----
    Q("q08_order_limit_offset", Some(
      """SELECT o_orderkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 20 OFFSET 5""".stripMargin),
      (s, d) => T(s, d, "orders")
        .select($"o_orderkey", $"o_totalprice")
        .orderBy($"o_totalprice".desc, $"o_orderkey")
        .offset(5).limit(20)),

    // ---- INNER JOIN (base_data_source.py:463-507) ----
    Q("q09_join_inner", Some(
      """SELECT o_orderkey, o_totalprice, c_name, c_mktsegment
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |WHERE o_totalprice > 400000
        |ORDER BY o_orderkey""".stripMargin),
      (s, d) => T(s, d, "orders")
        .join(broadcast(T(s, d, "customer")), $"o_custkey" === $"c_custkey")
        .filter($"o_totalprice" > 400000)
        .select($"o_orderkey", $"o_totalprice", $"c_name", $"c_mktsegment")
        .orderBy($"o_orderkey")),

    // ---- LEFT JOIN + aggregation over the nullable side ----
    Q("q10_join_left", Some(
      """SELECT c_custkey, c_name, count(o_orderkey) AS n_orders
        |FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        |GROUP BY c_custkey, c_name ORDER BY c_custkey""".stripMargin),
      (s, d) => T(s, d, "customer")
        .join(T(s, d, "orders"), $"c_custkey" === $"o_custkey", "left")
        .groupBy($"c_custkey", $"c_name")
        .agg(count($"o_orderkey").as("n_orders"))
        .orderBy($"c_custkey")),

    // ---- RIGHT JOIN ----
    Q("q11_join_right", Some(
      """SELECT n_nationkey, n_name, s_name
        |FROM supplier RIGHT JOIN nation ON s_nationkey = n_nationkey
        |ORDER BY n_nationkey, s_name NULLS FIRST""".stripMargin),
      (s, d) => T(s, d, "supplier")
        .join(T(s, d, "nation"), $"s_nationkey" === $"n_nationkey", "right")
        .select($"n_nationkey", $"n_name", $"s_name")
        .orderBy($"n_nationkey", $"s_name".asc_nulls_first)),

    // ---- FULL JOIN over two derived tables ----
    Q("q12_join_full", Some(
      """SELECT nk_c, nk_s, n_cust, n_supp FROM
        |  (SELECT c_nationkey AS nk_c, count(*) AS n_cust FROM customer GROUP BY c_nationkey) a
        |  FULL JOIN
        |  (SELECT s_nationkey AS nk_s, count(*) AS n_supp FROM supplier GROUP BY s_nationkey) b
        |  ON nk_c = nk_s
        |ORDER BY nk_c NULLS FIRST, nk_s NULLS FIRST""".stripMargin),
      (s, d) => {
        val a = T(s, d, "customer").groupBy($"c_nationkey".as("nk_c"))
          .agg(count(lit(1)).as("n_cust"))
        val b = T(s, d, "supplier").groupBy($"s_nationkey".as("nk_s"))
          .agg(count(lit(1)).as("n_supp"))
        a.join(b, $"nk_c" === $"nk_s", "full")
          .select($"nk_c", $"nk_s", $"n_cust", $"n_supp")
          .orderBy($"nk_c".asc_nulls_first, $"nk_s".asc_nulls_first)
      }),

    // ---- FROM (subquery) derived table (base_data_source.py:509-520) ----
    Q("q13_from_subquery", Some(
      """SELECT o_custkey, CAST(total AS DOUBLE) AS total FROM
        |  (SELECT o_custkey, sum(CAST(o_totalprice AS DECIMAL(18,2))) AS total
        |   FROM orders GROUP BY o_custkey) t
        |WHERE total > 1500000 ORDER BY o_custkey""".stripMargin),
      (s, d) => T(s, d, "orders")
        .groupBy($"o_custkey")
        .agg(sum(dec($"o_totalprice")).as("total"))
        .filter($"total" > 1500000)
        .select($"o_custkey", $"total".cast("double").as("total"))
        .orderBy($"o_custkey")),

    // ---- WHERE x IN (subquery) → left-semi join (base_data_source.py:233-241) ----
    Q("q14_in_subquery", Some(
      """SELECT o_orderkey, o_custkey FROM orders
        |WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING')
        |ORDER BY o_orderkey""".stripMargin),
      (s, d) => T(s, d, "orders")
        .join(T(s, d, "customer").filter($"c_mktsegment" === "BUILDING")
            .select($"c_custkey"),
          $"o_custkey" === $"c_custkey", "left_semi")
        .select($"o_orderkey", $"o_custkey")
        .orderBy($"o_orderkey")),

    // ---- scalar subquery (base_data_source.py:241,282-286) ----
    Q("q15_scalar_subquery", Some(
      """SELECT o_orderkey, o_totalprice FROM orders
        |WHERE o_totalprice > (SELECT 0.95 * max(o_totalprice) FROM orders)
        |ORDER BY o_orderkey""".stripMargin),
      (s, d) => {
        graft.Tables.registerAll(s, d)
        s.sql(
          """SELECT o_orderkey, o_totalprice FROM orders
            |WHERE o_totalprice > (SELECT 0.95 * max(o_totalprice) FROM orders)
            |ORDER BY o_orderkey""".stripMargin)
      }),

    // ---- CAST (base_data_source.py:228-231; names mapped per §1.2) ----
    Q("q16_cast", Some(
      """SELECT l_orderkey, l_linenumber,
        |       CAST(l_quantity AS INTEGER) AS qty_int,
        |       CAST(l_orderkey AS VARCHAR) AS key_str,
        |       CAST(CAST(l_discount AS DECIMAL(4,2)) AS DOUBLE) AS disc_dec
        |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin),
      (s, d) => T(s, d, "lineitem")
        .select($"l_orderkey", $"l_linenumber",
          $"l_quantity".cast("int").as("qty_int"),
          $"l_orderkey".cast("string").as("key_str"),
          $"l_discount".cast("decimal(4,2)").cast("double").as("disc_dec"))
        .orderBy($"l_orderkey", $"l_linenumber")),

    // ---- lower/upper/concat (functions.py:253-275) ----
    Q("q17_strings", Some(
      """SELECT c_custkey, lower(c_name) AS lname, upper(c_mktsegment) AS useg,
        |       c_name || '-' || c_mktsegment AS cat
        |FROM customer ORDER BY c_custkey""".stripMargin),
      (s, d) => T(s, d, "customer")
        .select($"c_custkey", lower($"c_name").as("lname"),
          upper($"c_mktsegment").as("useg"),
          concat($"c_name", lit("-"), $"c_mktsegment").as("cat"))
        .orderBy($"c_custkey")),

    // ---- LIKE = anchored Python-regex dialect (functions.py:278-288) ----
    Q("q18_like_regex", Some(
      """SELECT c_custkey, c_name FROM customer
        |WHERE regexp_matches(c_name, '^(?:Customer#0*1.*7)')
        |ORDER BY c_custkey""".stripMargin),
      (s, d) => T(s, d, "customer")
        .filter($"c_name".rlike("^(?:Customer#0*1.*7)"))
        .select($"c_custkey", $"c_name")
        .orderBy($"c_custkey")),

    // ---- arithmetic incl. % and ^-as-power (functions.py:194-248) ----
    Q("q19_arith", Some(
      """SELECT l_orderkey, l_linenumber,
        |       l_partkey + l_suppkey AS a_add,
        |       l_partkey - l_suppkey AS a_sub,
        |       l_partkey * 2 AS a_mul,
        |       l_extendedprice / l_quantity AS a_div,
        |       l_partkey % 10 AS a_mod,
        |       power(l_linenumber, 2) AS a_pow
        |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin),
      (s, d) => T(s, d, "lineitem")
        .select($"l_orderkey", $"l_linenumber",
          ($"l_partkey" + $"l_suppkey").as("a_add"),
          ($"l_partkey" - $"l_suppkey").as("a_sub"),
          ($"l_partkey" * 2).as("a_mul"),
          ($"l_extendedprice" / $"l_quantity").as("a_div"),
          ($"l_partkey" % 10).as("a_mod"),
          pow($"l_linenumber", 2).as("a_pow"))
        .orderBy($"l_orderkey", $"l_linenumber")),

    // ---- GROUP BY scalar expression (base_data_source.py:528-539) ----
    Q("q20_groupby_expr", Some(
      """SELECT lower(c_mktsegment) AS seg, count(*) AS n,
        |       CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS bal
        |FROM customer GROUP BY lower(c_mktsegment) ORDER BY seg""".stripMargin),
      (s, d) => T(s, d, "customer")
        .groupBy(lower($"c_mktsegment").as("seg"))
        .agg(count(lit(1)).as("n"), sum(dec($"c_acctbal")).cast("double").as("bal"))
        .orderBy($"seg")),

    // ---- IS NULL / IS NOT NULL (functions.py:75-102) ----
    Q("q21_is_null", Some(
      """SELECT l_orderkey, l_linenumber,
        |       nullif(l_returnflag, 'N') AS flag_or_null,
        |       (nullif(l_returnflag, 'N') IS NULL) AS flag_is_null
        |FROM lineitem
        |WHERE nullif(l_returnflag, 'N') IS NOT NULL OR l_linenumber = 1
        |ORDER BY l_orderkey, l_linenumber""".stripMargin),
      (s, d) => T(s, d, "lineitem")
        .select($"l_orderkey", $"l_linenumber",
          nullif($"l_returnflag", lit("N")).as("flag_or_null"),
          nullif($"l_returnflag", lit("N")).isNull.as("flag_is_null"))
        .filter($"flag_or_null".isNotNull || $"l_linenumber" === 1)
        .orderBy($"l_orderkey", $"l_linenumber")),

    // ---- flagship: 3-way join + agg + HAVING + ORDER + LIMIT ----
    Q("q22_flagship", Some(
      """SELECT c_custkey, c_name,
        |       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(1 - l_discount AS DECIMAL(8,2))) AS DOUBLE) AS revenue,
        |       count(DISTINCT o_orderkey) AS n_orders
        |FROM customer
        |JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON o_orderkey = l_orderkey
        |WHERE o_orderstatus = 'F'
        |GROUP BY c_custkey, c_name
        |HAVING count(DISTINCT o_orderkey) > 1
        |ORDER BY revenue DESC, c_custkey LIMIT 10""".stripMargin),
      (s, d) => flagship(s, d)),

    // ---- set operation (extension beyond reference fence, free in Spark) ----
    Q("q23_union_all", Some(
      """SELECT id, kind FROM (
        |  SELECT c_custkey AS id, 'customer' AS kind FROM customer
        |  UNION ALL
        |  SELECT s_suppkey AS id, 'supplier' AS kind FROM supplier) u
        |ORDER BY kind, id""".stripMargin),
      (s, d) => T(s, d, "customer").select($"c_custkey".as("id"), lit("customer").as("kind"))
        .unionAll(T(s, d, "supplier").select($"s_suppkey".as("id"), lit("supplier").as("kind")))
        .orderBy($"kind", $"id")),

    // ---- window top-k per group (extension; scale-friendly vs collect) ----
    Q("q24_window_topk", Some(
      """SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |         row_number() OVER (PARTITION BY o_custkey
        |                            ORDER BY o_totalprice DESC, o_orderkey) AS rn
        |  FROM orders) t
        |WHERE rn <= 3 ORDER BY o_custkey, rn""".stripMargin),
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy($"o_custkey")
          .orderBy($"o_totalprice".desc, $"o_orderkey")
        T(s, d, "orders")
          .select($"o_custkey", $"o_orderkey", $"o_totalprice",
            row_number().over(w).as("rn"))
          .filter($"rn" <= 3)
          .orderBy($"o_custkey", $"rn")
      }),

    // ---- time-bucketed aggregation over the events table (extension) ----
    Q("q25_events_hourly", Some(
      """SELECT date_trunc('hour', ts) AS h, event_type, count(*) AS n,
        |       CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total
        |FROM events GROUP BY date_trunc('hour', ts), event_type
        |ORDER BY h, event_type""".stripMargin),
      (s, d) => T(s, d, "events")
        .groupBy(date_trunc("hour", $"ts").as("h"), $"event_type")
        .agg(count(lit(1)).as("n"),
          sum($"value".cast("decimal(18,2)")).cast("double").as("total"))
        .orderBy($"h", $"event_type"))
  )

  /** Flagship query, also wired to SparkEntry.entry (smoke-checked rows>0). */
  def flagship(s: SparkSession, d: String): DataFrame = {
    val rev = (dec($"l_extendedprice") *
      (lit(1) - $"l_discount").cast("decimal(8,2)"))
    T(s, d, "customer")
      .join(T(s, d, "orders"), $"c_custkey" === $"o_custkey")
      .join(T(s, d, "lineitem"), $"o_orderkey" === $"l_orderkey")
      .filter($"o_orderstatus" === "F")
      .groupBy($"c_custkey", $"c_name")
      .agg(sum(rev).cast("double").as("revenue"),
        countDistinct($"o_orderkey").as("n_orders"))
      .filter($"n_orders" > 1)
      .orderBy($"revenue".desc, $"c_custkey")
      .limit(10)
  }

  // $"x" sugar without a SparkSession-bound implicits import
  private implicit class Dollar(val sc: StringContext) {
    def $(args: Any*): Column = col(sc.s(args: _*))
  }
}
