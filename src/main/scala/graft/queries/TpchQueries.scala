package graft.queries

import org.apache.spark.sql.functions._

import graft.Tables

/** TPC-H-shaped headline queries plus SQL-surface extensions (CTE,
  * correlated EXISTS/NOT EXISTS, date functions) — the throughput
  * reference shapes. Deterministic-decimal rules as everywhere; averages
  * over 2-dp prices are expressed as CAST(sum_decimal AS DOUBLE)/count
  * (exact numerator → identical IEEE division in both engines).
  */
object TpchQueries {

  private def dec(c: org.apache.spark.sql.Column) = c.cast("decimal(18,2)")

  val all: Seq[Q] = Seq(

    // TPC-H Q1: pricing summary report
    Q("q52_tpch_q1", Some(
      """SELECT l_returnflag, l_linestatus,
        |  sum(l_quantity) AS sum_qty,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(1 - l_discount AS DECIMAL(8,2))) AS DOUBLE) AS sum_disc_price,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(1 - l_discount AS DECIMAL(8,2)) * CAST(1 + l_tax AS DECIMAL(8,2))) AS DOUBLE) AS sum_charge,
        |  avg(l_quantity) AS avg_qty,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_price,
        |  count(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '2001-09-01 00:00:00'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin),
      (s, d) => {
        val li = Tables.load(s, d, "lineitem")
        val disc = dec(col("l_extendedprice")) *
          (lit(1) - col("l_discount")).cast("decimal(8,2)")
        val charge = disc * (lit(1) + col("l_tax")).cast("decimal(8,2)")
        li.filter(col("l_shipdate") <= lit("2001-09-01 00:00:00").cast("timestamp"))
          .groupBy(col("l_returnflag"), col("l_linestatus"))
          .agg(
            sum(col("l_quantity")).as("sum_qty"),
            sum(dec(col("l_extendedprice"))).cast("double").as("sum_base_price"),
            sum(disc).cast("double").as("sum_disc_price"),
            sum(charge).cast("double").as("sum_charge"),
            avg(col("l_quantity")).as("avg_qty"),
            (sum(dec(col("l_extendedprice"))).cast("double") / count(lit(1)))
              .as("avg_price"),
            count(lit(1)).as("count_order"))
          .orderBy(col("l_returnflag"), col("l_linestatus"))
      }),

    // TPC-H Q3 shape: shipping priority (o_orderpriority stands in)
    Q("q53_tpch_q3", Some(
      """SELECT o_orderkey, o_orderdate, o_orderpriority,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(1 - l_discount AS DECIMAL(8,2))) AS DOUBLE) AS revenue
        |FROM customer JOIN orders ON c_custkey = o_custkey
        |              JOIN lineitem ON l_orderkey = o_orderkey
        |WHERE c_mktsegment = 'BUILDING'
        |  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
        |  AND l_shipdate > TIMESTAMP '1998-01-01 00:00:00'
        |GROUP BY o_orderkey, o_orderdate, o_orderpriority
        |ORDER BY revenue DESC, o_orderkey LIMIT 10""".stripMargin),
      (s, d) => {
        val rev = dec(col("l_extendedprice")) *
          (lit(1) - col("l_discount")).cast("decimal(8,2)")
        Tables.load(s, d, "customer").filter(col("c_mktsegment") === "BUILDING")
          .join(Tables.load(s, d, "orders"), col("c_custkey") === col("o_custkey"))
          .filter(col("o_orderdate") < lit("1998-01-01 00:00:00").cast("timestamp"))
          .join(Tables.load(s, d, "lineitem"), col("l_orderkey") === col("o_orderkey"))
          .filter(col("l_shipdate") > lit("1998-01-01 00:00:00").cast("timestamp"))
          .groupBy(col("o_orderkey"), col("o_orderdate"), col("o_orderpriority"))
          .agg(sum(rev).cast("double").as("revenue"))
          .orderBy(col("revenue").desc, col("o_orderkey"))
          .limit(10)
      }),

    // TPC-H Q5 shape: local supplier volume by nation within a region
    Q("q54_tpch_q5", Some(
      """SELECT n_name,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(1 - l_discount AS DECIMAL(8,2))) AS DOUBLE) AS revenue
        |FROM customer
        |JOIN orders   ON c_custkey = o_custkey
        |JOIN lineitem ON l_orderkey = o_orderkey
        |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        |JOIN nation   ON c_nationkey = n_nationkey
        |JOIN region   ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA'
        |GROUP BY n_name ORDER BY revenue DESC, n_name""".stripMargin),
      (s, d) => {
        val rev = dec(col("l_extendedprice")) *
          (lit(1) - col("l_discount")).cast("decimal(8,2)")
        // The region predicate is the query's only selectivity (1/5), so
        // apply it BEFORE the big joins, not after: restrict customer and
        // supplier through the broadcast nation⋈region dimension first,
        // then run orders⋈customer and the dominant lineitem⋈orders
        // shuffle on the reduced inputs. Left-deep declaration order IS
        // the executed order (no CBO join reorder), so declaring the
        // filter last made every shuffle 5× wider than needed.
        val asia = Tables.load(s, d, "nation")
          .join(Tables.load(s, d, "region"),
            col("n_regionkey") === col("r_regionkey"))
          .filter(col("r_name") === "ASIA")
          .select(col("n_nationkey"), col("n_name"))
        val cust = Tables.load(s, d, "customer")
          .join(broadcast(asia), col("c_nationkey") === col("n_nationkey"))
          .select(col("c_custkey"), col("c_nationkey"), col("n_name"))
        val supp = Tables.load(s, d, "supplier")
          .join(broadcast(asia.select(col("n_nationkey").as("sn_key"))),
            col("s_nationkey") === col("sn_key"))
          .select(col("s_suppkey"), col("s_nationkey"))
        Tables.load(s, d, "orders")
          .join(cust, col("o_custkey") === col("c_custkey"))
          .join(Tables.load(s, d, "lineitem"), col("l_orderkey") === col("o_orderkey"))
          .join(supp,
            col("l_suppkey") === col("s_suppkey") &&
              col("c_nationkey") === col("s_nationkey"))
          .groupBy(col("n_name"))
          .agg(sum(rev).cast("double").as("revenue"))
          .orderBy(col("revenue").desc, col("n_name"))
      }),

    // CTE (WITH clause) — order-count histogram
    Q("q55_cte", Some(
      """WITH per_cust AS (
        |  SELECT o_custkey, count(*) AS n FROM orders GROUP BY o_custkey)
        |SELECT n, count(*) AS n_custs FROM per_cust GROUP BY n ORDER BY n""".stripMargin),
      (s, d) => {
        Tables.registerAll(s, d)
        s.sql(
          """WITH per_cust AS (
            |  SELECT o_custkey, count(*) AS n FROM orders GROUP BY o_custkey)
            |SELECT n, count(*) AS n_custs FROM per_cust GROUP BY n ORDER BY n""".stripMargin)
      }),

    // correlated EXISTS → left-semi (beyond the reference's uncorrelated fence)
    Q("q56_exists", Some(
      """SELECT c_custkey, c_name FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders
        |              WHERE o_custkey = c_custkey AND o_totalprice > 400000)
        |ORDER BY c_custkey""".stripMargin),
      (s, d) => {
        Tables.registerAll(s, d)
        s.sql(
          """SELECT c_custkey, c_name FROM customer
            |WHERE EXISTS (SELECT 1 FROM orders
            |              WHERE o_custkey = c_custkey AND o_totalprice > 400000)
            |ORDER BY c_custkey""".stripMargin)
      }),

    // correlated NOT EXISTS → left-anti
    Q("q57_not_exists", Some(
      """SELECT p_partkey, p_name FROM part
        |WHERE NOT EXISTS (SELECT 1 FROM lineitem WHERE l_partkey = p_partkey
        |                  AND l_quantity > 49)
        |ORDER BY p_partkey""".stripMargin),
      (s, d) => {
        Tables.registerAll(s, d)
        s.sql(
          """SELECT p_partkey, p_name FROM part
            |WHERE NOT EXISTS (SELECT 1 FROM lineitem WHERE l_partkey = p_partkey
            |                  AND l_quantity > 49)
            |ORDER BY p_partkey""".stripMargin)
      }),

    // approximate distinct via the custom KMV TypedImperativeAggregate,
    // in its ESTIMATE regime (partkey cardinality >> k=256). The gate
    // runs oracle-mode (RollingHash polynomial over the stringified key,
    // CLAUDE.md rule 12): DuckDB replays the k-min hash set, the k-th
    // value and the (k-1)/x eval exactly, so the sketch's full partial/
    // merge/eval lifecycle is hash-checked in the regime that matters.
    // The xxhash64 production default stays spec-tested (KmvSpec).
    Q("q59_kmv_distinct", Some(kmvEstimateOracle),
      (s, d) => Tables.load(s, d, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(countDistinct(col("l_partkey")).as("exact_parts"),
          graft.expressions.KMinValues.oracle(
            col("l_partkey").cast("string"), 256).as("approx_parts"))
        .orderBy(col("l_returnflag"))),

    // KMV in its EXACT regime: below the sketch size (k=256) the bottom-k
    // buffer holds every distinct hash, so the result equals
    // COUNT(DISTINCT) — nationkey has 25 values at every SF. This oracles
    // the full TypedImperativeAggregate lifecycle (partial update /
    // shuffle serialize / merge / final eval); q59 exercises the
    // estimation regime under spec.
    Q("q88_kmv_exact", Some(
      """SELECT c_mktsegment,
        |       CAST(count(DISTINCT c_nationkey) AS DOUBLE) AS n_nations
        |FROM customer GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin),
      (s, d) => Tables.load(s, d, "customer")
        .groupBy(col("c_mktsegment"))
        .agg(graft.expressions.KMinValues(col("c_nationkey"), 256).as("n_nations"))
        .orderBy(col("c_mktsegment"))),

    // join-cardinality estimation (q168): KMV/theta-sketch intersection
    // answering "how many distinct keys do lineitem and orders share?"
    // WITHOUT the join — each side reduces to its 256 smallest key
    // hashes, θ = min of the (k+1)-th minima, matching sketch hashes
    // below θ scale by 2^62/θ in exact integer arithmetic. Keys are
    // lpad'ed AND reversed before the rolling hash — see
    // Frequency.kmvJoinCardinality for why both are load-bearing for
    // hash uniformity. exact_intersection/within_25pct are the gate's
    // verification columns — the 100 TB caller skips them. Oracle
    // replays the polynomial per rule 12.
    Q("q168_join_cardinality", Some(kmvIntersectionOracle),
      (s, d) => graft.operators.Frequency.kmvJoinCardinality(
        Tables.load(s, d, "lineitem").select(col("l_orderkey").as("key")),
        Tables.load(s, d, "orders").select(col("o_orderkey").as("key")))),

    // bucketed co-located join: both sides written bucketed by the join
    // key once, so the join itself runs with NO exchange on either side
    // (asserted by BucketingSpec) — the pay-the-shuffle-once layout for
    // recurring big joins. Results equal the plain join, which is the
    // oracle.
    Q("q92_bucketed_join", Some(
      """SELECT o_orderpriority,
        |       CAST(sum(l_quantity) AS BIGINT) AS sum_qty, count(*) AS n
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin),
      (s, d) => graft.operators.Bucketing
        .bucketedJoin(s, d, "lineitem", "l_orderkey", "orders", "o_orderkey")
        .groupBy(col("o_orderpriority"))
        .agg(sum(col("l_quantity")).cast("bigint").as("sum_qty"),
          count(lit(1)).as("n"))
        .orderBy(col("o_orderpriority"))),

    // TPC-H Q6: forecasting revenue change — a pure scan+filter+agg, the
    // canonical pushdown shape: every predicate reaches the parquet scan
    // (PushedFilters), no join, no shuffle beyond the final 1-row agg.
    // Discount bounds sit BETWEEN the 0.01 grid points (0.045/0.075), so
    // a 1-ulp literal difference between engines can't flip membership.
    Q("q114_tpch_q6", Some(
      """SELECT
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_discount AS DECIMAL(8,2))) AS DOUBLE) AS revenue,
        |  count(*) AS n
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
        |  AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
        |  AND l_discount > 0.045 AND l_discount < 0.075
        |  AND l_quantity < 24""".stripMargin),
      (s, d) => Tables.load(s, d, "lineitem")
        .filter(col("l_shipdate") >= lit("1997-01-01 00:00:00").cast("timestamp") &&
          col("l_shipdate") < lit("1998-01-01 00:00:00").cast("timestamp") &&
          col("l_discount") > 0.045 && col("l_discount") < 0.075 &&
          col("l_quantity") < 24)
        .agg(sum(dec(col("l_extendedprice")) * col("l_discount").cast("decimal(8,2)"))
          .cast("double").as("revenue"),
          count(lit(1)).as("n"))),

    // TPC-H Q10: returned-item reporting. Scale shape: the fact side is
    // reduced to customer grain BEFORE the dimension joins — revenue is
    // pre-aggregated by o_custkey (one shuffle at customer cardinality),
    // then customer joins that small aggregate and nation is broadcast.
    // Joining lineitem→customer row-by-row first would shuffle the full
    // fact table against a key it doesn't need yet.
    Q("q115_tpch_q10", Some(
      """SELECT c_custkey, c_name, n_name,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(1 - l_discount AS DECIMAL(8,2))) AS DOUBLE) AS revenue
        |FROM customer
        |JOIN orders   ON c_custkey = o_custkey
        |JOIN lineitem ON l_orderkey = o_orderkey
        |JOIN nation   ON c_nationkey = n_nationkey
        |WHERE l_returnflag = 'R'
        |  AND o_orderdate >= TIMESTAMP '1997-07-01 00:00:00'
        |  AND o_orderdate <  TIMESTAMP '1997-10-01 00:00:00'
        |GROUP BY c_custkey, c_name, n_name
        |ORDER BY revenue DESC, c_custkey LIMIT 20""".stripMargin),
      (s, d) => {
        val rev = dec(col("l_extendedprice")) *
          (lit(1) - col("l_discount")).cast("decimal(8,2)")
        val ordersQ = Tables.load(s, d, "orders")
          .filter(col("o_orderdate") >= lit("1997-07-01 00:00:00").cast("timestamp") &&
            col("o_orderdate") < lit("1997-10-01 00:00:00").cast("timestamp"))
          .select(col("o_orderkey"), col("o_custkey"))
        val byCust = Tables.load(s, d, "lineitem")
          .filter(col("l_returnflag") === "R")
          .select(col("l_orderkey"), rev.as("rev"))
          .join(ordersQ, col("l_orderkey") === col("o_orderkey"))
          .groupBy(col("o_custkey"))
          .agg(sum(col("rev")).as("rev_d"))
        Tables.load(s, d, "customer")
          .join(byCust, col("c_custkey") === col("o_custkey"))
          .join(broadcast(Tables.load(s, d, "nation")),
            col("c_nationkey") === col("n_nationkey"))
          .select(col("c_custkey"), col("c_name"), col("n_name"),
            col("rev_d").cast("double").as("revenue"))
          .orderBy(col("revenue").desc, col("c_custkey"))
          .limit(20)
      }),

    // TPC-H Q14: promotion effect — broadcast dimension join + conditional
    // aggregation (two decimal sums in one pass, divided as doubles).
    Q("q116_tpch_q14", Some(
      """SELECT
        |  100 * CAST(sum(CASE WHEN p_type = 'PROMO'
        |        THEN CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(1 - l_discount AS DECIMAL(8,2))
        |        ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE)
        |      / CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(1 - l_discount AS DECIMAL(8,2))) AS DOUBLE) AS promo_pct,
        |  count(*) AS n
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE l_shipdate >= TIMESTAMP '1997-09-01 00:00:00'
        |  AND l_shipdate <  TIMESTAMP '1997-10-01 00:00:00'""".stripMargin),
      (s, d) => {
        val rev = dec(col("l_extendedprice")) *
          (lit(1) - col("l_discount")).cast("decimal(8,2)")
        Tables.load(s, d, "lineitem")
          .filter(col("l_shipdate") >= lit("1997-09-01 00:00:00").cast("timestamp") &&
            col("l_shipdate") < lit("1997-10-01 00:00:00").cast("timestamp"))
          .join(broadcast(Tables.load(s, d, "part")
            .select(col("p_partkey"), col("p_type"))),
            col("l_partkey") === col("p_partkey"))
          .agg(
            (lit(100) * sum(when(col("p_type") === "PROMO", rev)
              .otherwise(lit(0).cast("decimal(18,2)"))).cast("double")
              / sum(rev).cast("double")).as("promo_pct"),
            count(lit(1)).as("n"))
      }),

    // TPC-H Q18: large-volume customers — the HAVING-on-fact-aggregate
    // shape. The order-grain aggregate runs FIRST (map-side partial sum,
    // then one shuffle at order grain); only the few surviving orderkeys
    // join back to orders/customer, so the dimension joins see a tiny
    // input instead of the whole fact table.
    Q("q117_tpch_q18", Some(
      """SELECT c_custkey, c_name, o_orderkey, o_orderdate, o_totalprice,
        |       sum_qty
        |FROM (SELECT l_orderkey, sum(l_quantity) AS sum_qty
        |      FROM lineitem GROUP BY l_orderkey HAVING sum(l_quantity) > 300) big
        |JOIN orders   ON o_orderkey = l_orderkey
        |JOIN customer ON c_custkey = o_custkey
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 100""".stripMargin),
      (s, d) => {
        val big = Tables.load(s, d, "lineitem")
          .groupBy(col("l_orderkey"))
          .agg(sum(col("l_quantity")).as("sum_qty"))
          .filter(col("sum_qty") > 300)
        big.join(Tables.load(s, d, "orders"), col("o_orderkey") === col("l_orderkey"))
          .join(Tables.load(s, d, "customer"), col("c_custkey") === col("o_custkey"))
          .select(col("c_custkey"), col("c_name"), col("o_orderkey"),
            col("o_orderdate"), col("o_totalprice"), col("sum_qty"))
          .orderBy(col("o_totalprice").desc, col("o_orderkey"))
          .limit(100)
      }),

    // TPC-H Q19 shape: disjunctive mixed-side predicates. The classic Q19
    // rewrite is applied by hand: the part side is pre-filtered with the
    // UNION of the per-disjunct dimension ranges (brand IN + size ≤ 15)
    // and broadcast; the fact side pre-filters the union of the quantity
    // ranges; the exact per-branch conjunction runs after the join. The
    // scan therefore skips everything the disjunction can never accept —
    // without the rewrite neither side's filter is pushable.
    Q("q118_tpch_q19", Some(
      """SELECT
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(1 - l_discount AS DECIMAL(8,2))) AS DOUBLE) AS revenue,
        |  count(*) AS n
        |FROM lineitem JOIN part ON p_partkey = l_partkey
        |WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
        |       AND l_quantity >= 1 AND l_quantity <= 11)
        |   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10
        |       AND l_quantity >= 10 AND l_quantity <= 20)
        |   OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 15
        |       AND l_quantity >= 20 AND l_quantity <= 30)""".stripMargin),
      (s, d) => {
        val parts = Tables.load(s, d, "part")
          .filter(col("p_brand").isin("Brand#12", "Brand#23", "Brand#34") &&
            col("p_size").between(1, 15))
          .select(col("p_partkey"), col("p_brand"), col("p_size"))
        val branch =
          (col("p_brand") === "Brand#12" && col("p_size").between(1, 5) &&
            col("l_quantity") >= 1 && col("l_quantity") <= 11) ||
          (col("p_brand") === "Brand#23" && col("p_size").between(1, 10) &&
            col("l_quantity") >= 10 && col("l_quantity") <= 20) ||
          (col("p_brand") === "Brand#34" && col("p_size").between(1, 15) &&
            col("l_quantity") >= 20 && col("l_quantity") <= 30)
        Tables.load(s, d, "lineitem")
          .filter(col("l_quantity") >= 1 && col("l_quantity") <= 30)
          .join(broadcast(parts), col("p_partkey") === col("l_partkey"))
          .filter(branch)
          .agg(sum(dec(col("l_extendedprice")) *
            (lit(1) - col("l_discount")).cast("decimal(8,2)"))
            .cast("double").as("revenue"),
            count(lit(1)).as("n"))
      }),

    // TPC-H Q7: volume shipping between two nations. Scale shape: the
    // 2/25-nation restriction is applied to supplier and customer FIRST
    // through broadcast dimension joins, so the dominant lineitem⋈orders
    // shuffle runs on a fact side already reduced ~12× by the supplier
    // cut; the pair disjunction (only ~half the joined rows survive)
    // filters after both nations are attached.
    Q("q124_tpch_q7", Some(
      """SELECT supp_nation, cust_nation, l_year,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(1 - l_discount AS DECIMAL(8,2))) AS DOUBLE) AS revenue
        |FROM (
        |  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
        |         CAST(year(l_shipdate) AS BIGINT) AS l_year,
        |         l_extendedprice, l_discount
        |  FROM supplier
        |  JOIN lineitem ON s_suppkey = l_suppkey
        |  JOIN orders   ON o_orderkey = l_orderkey
        |  JOIN customer ON c_custkey = o_custkey
        |  JOIN nation n1 ON s_nationkey = n1.n_nationkey
        |  JOIN nation n2 ON c_nationkey = n2.n_nationkey
        |  WHERE (n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
        |     OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
        |GROUP BY supp_nation, cust_nation, l_year
        |ORDER BY supp_nation, cust_nation, l_year""".stripMargin),
      (s, d) => {
        val rev = dec(col("l_extendedprice")) *
          (lit(1) - col("l_discount")).cast("decimal(8,2)")
        val nations = Tables.load(s, d, "nation")
          .filter(col("n_name").isin("NATION_1", "NATION_2"))
          .select(col("n_nationkey"), col("n_name"))
        val supp = Tables.load(s, d, "supplier")
          .join(broadcast(nations), col("s_nationkey") === col("n_nationkey"))
          .select(col("s_suppkey"), col("n_name").as("supp_nation"))
        val cust = Tables.load(s, d, "customer")
          .join(broadcast(nations), col("c_nationkey") === col("n_nationkey"))
          .select(col("c_custkey"), col("n_name").as("cust_nation"))
        Tables.load(s, d, "lineitem")
          .join(broadcast(supp), col("l_suppkey") === col("s_suppkey"))
          .join(Tables.load(s, d, "orders")
            .select(col("o_orderkey"), col("o_custkey")),
            col("l_orderkey") === col("o_orderkey"))
          .join(cust, col("o_custkey") === col("c_custkey"))
          .filter((col("supp_nation") === "NATION_1" && col("cust_nation") === "NATION_2") ||
            (col("supp_nation") === "NATION_2" && col("cust_nation") === "NATION_1"))
          .groupBy(col("supp_nation"), col("cust_nation"),
            year(col("l_shipdate")).cast("bigint").as("l_year"))
          .agg(sum(rev).cast("double").as("revenue"))
          .orderBy(col("supp_nation"), col("cust_nation"), col("l_year"))
      }),

    // TPC-H Q8: national market share inside a region's market for one
    // part type. The part cut (1/6) broadcasts into the fact scan first;
    // the customer side is restricted to the region through the
    // broadcast nation⋈region dimension before its shuffle join.
    Q("q125_tpch_q8", Some(
      """SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
        |  CAST(sum(CASE WHEN sn.n_name = 'NATION_3'
        |        THEN CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(1 - l_discount AS DECIMAL(8,2))
        |        ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE)
        |    / CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(1 - l_discount AS DECIMAL(8,2))) AS DOUBLE) AS mkt_share,
        |  count(*) AS n
        |FROM lineitem
        |JOIN part     ON p_partkey = l_partkey
        |JOIN supplier ON s_suppkey = l_suppkey
        |JOIN nation sn ON s_nationkey = sn.n_nationkey
        |JOIN orders   ON o_orderkey = l_orderkey
        |JOIN customer ON c_custkey = o_custkey
        |JOIN nation cn ON c_nationkey = cn.n_nationkey
        |JOIN region   ON cn.n_regionkey = r_regionkey
        |WHERE r_name = 'EUROPE' AND p_type = 'PROMO'
        |GROUP BY year(o_orderdate)
        |ORDER BY o_year""".stripMargin),
      (s, d) => {
        val rev = dec(col("l_extendedprice")) *
          (lit(1) - col("l_discount")).cast("decimal(8,2)")
        val europe = Tables.load(s, d, "nation")
          .join(Tables.load(s, d, "region"),
            col("n_regionkey") === col("r_regionkey"))
          .filter(col("r_name") === "EUROPE")
          .select(col("n_nationkey").as("cn_key"))
        val cust = Tables.load(s, d, "customer")
          .join(broadcast(europe), col("c_nationkey") === col("cn_key"))
          .select(col("c_custkey"))
        val suppNation = Tables.load(s, d, "supplier")
          .join(broadcast(Tables.load(s, d, "nation")
            .select(col("n_nationkey"), col("n_name").as("supp_nation"))),
            col("s_nationkey") === col("n_nationkey"))
          .select(col("s_suppkey"), col("supp_nation"))
        Tables.load(s, d, "lineitem")
          .join(broadcast(Tables.load(s, d, "part")
            .filter(col("p_type") === "PROMO").select(col("p_partkey"))),
            col("l_partkey") === col("p_partkey"))
          .join(broadcast(suppNation), col("l_suppkey") === col("s_suppkey"))
          .join(Tables.load(s, d, "orders")
            .select(col("o_orderkey"), col("o_custkey"), col("o_orderdate")),
            col("l_orderkey") === col("o_orderkey"))
          .join(cust, col("o_custkey") === col("c_custkey"))
          .groupBy(year(col("o_orderdate")).cast("bigint").as("o_year"))
          .agg(
            (sum(when(col("supp_nation") === "NATION_3", rev)
              .otherwise(lit(0).cast("decimal(18,2)"))).cast("double")
              / sum(rev).cast("double")).as("mkt_share"),
            count(lit(1)).as("n"))
          .orderBy(col("o_year"))
      }),

    // TPC-H Q13: customer order-count distribution — the filtered LEFT
    // join + double aggregation shape (customers with zero orders must
    // survive into the c_count=0 bucket).
    Q("q126_tpch_q13", Some(
      """SELECT c_count, count(*) AS custdist
        |FROM (SELECT c_custkey, count(o_orderkey) AS c_count
        |      FROM customer LEFT JOIN orders
        |        ON c_custkey = o_custkey AND o_orderstatus <> 'P'
        |      GROUP BY c_custkey)
        |GROUP BY c_count
        |ORDER BY custdist DESC, c_count DESC""".stripMargin),
      (s, d) => {
        val perCust = Tables.load(s, d, "customer").select(col("c_custkey"))
          .join(Tables.load(s, d, "orders")
            .filter(col("o_orderstatus") =!= "P")
            .select(col("o_custkey"), col("o_orderkey")),
            col("c_custkey") === col("o_custkey"), "left")
          .groupBy(col("c_custkey"))
          .agg(count(col("o_orderkey")).as("c_count"))
        perCust.groupBy(col("c_count"))
          .agg(count(lit(1)).as("custdist"))
          .orderBy(col("custdist").desc, col("c_count").desc)
      }),

    // TPC-H Q17: small-quantity-order revenue. The correlated per-part
    // average is a groupBy at part grain joined back — and it runs over
    // the fact rows ALREADY semi-joined to the broadcast part cut (the
    // filter is on part attributes only, so per-part averages over the
    // reduced set equal the unfiltered ones). The quantity predicate is
    // integer-rescaled (5·qty < avg) so no 0.2 literal exists to drift.
    Q("q127_tpch_q17", Some(
      """WITH pk AS (SELECT p_partkey FROM part
        |            WHERE p_brand = 'Brand#12' AND p_size < 25),
        |li AS (SELECT l_partkey, l_quantity, l_extendedprice
        |       FROM lineitem JOIN pk ON p_partkey = l_partkey),
        |pa AS (SELECT l_partkey, avg(l_quantity) AS avg_qty
        |       FROM li GROUP BY l_partkey)
        |SELECT
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / 7
        |    AS avg_yearly,
        |  count(*) AS n
        |FROM li JOIN pa USING (l_partkey)
        |WHERE 5 * l_quantity < avg_qty""".stripMargin),
      (s, d) => {
        val li = Tables.load(s, d, "lineitem")
          .join(broadcast(Tables.load(s, d, "part")
            .filter(col("p_brand") === "Brand#12" && col("p_size") < 25)
            .select(col("p_partkey"))),
            col("l_partkey") === col("p_partkey"))
          .select(col("l_partkey"), col("l_quantity"), col("l_extendedprice"))
        val perPart = li.groupBy(col("l_partkey"))
          .agg(avg(col("l_quantity")).as("avg_qty"))
        li.join(perPart, Seq("l_partkey"))
          .filter(lit(5) * col("l_quantity") < col("avg_qty"))
          .agg((sum(dec(col("l_extendedprice"))).cast("double") / lit(7))
            .as("avg_yearly"),
            count(lit(1)).as("n"))
      }),

    // TPC-H Q4 shape: order-priority checking. The reference predicate
    // (l_commitdate < l_receiptdate) has no column here; "shipped more
    // than 60 days after ordering" keeps the same correlated-EXISTS-
    // with-inequality plan (left-semi with a mixed condition).
    Q("q128_tpch_q4", Some(
      """SELECT o_orderpriority, count(*) AS order_count
        |FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
        |  AND o_orderdate <  TIMESTAMP '1997-07-01 00:00:00'
        |  AND EXISTS (SELECT 1 FROM lineitem
        |              WHERE l_orderkey = o_orderkey
        |                AND l_shipdate > o_orderdate + INTERVAL 60 DAY)
        |GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin),
      (s, d) => {
        Tables.registerAll(s, d)
        s.sql(
          """SELECT o_orderpriority, count(*) AS order_count
            |FROM orders
            |WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
            |  AND o_orderdate <  TIMESTAMP '1997-07-01 00:00:00'
            |  AND EXISTS (SELECT 1 FROM lineitem
            |              WHERE l_orderkey = o_orderkey
            |                AND l_shipdate > o_orderdate + INTERVAL 60 DAY)
            |GROUP BY o_orderpriority
            |ORDER BY o_orderpriority""".stripMargin)
      }),

    // TPC-H Q21 shape: suppliers who were the ONLY supplier with a
    // returned line on a multi-supplier finished order — the double
    // correlated self-join (EXISTS + NOT EXISTS against the same fact
    // table) that stresses semi/anti-join planning. The reference's
    // late-delivery predicate maps to l_returnflag = 'R'.
    Q("q129_tpch_q21", Some(
      """SELECT s_name, count(*) AS numwait
        |FROM supplier
        |JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
        |JOIN orders ON o_orderkey = l1.l_orderkey
        |WHERE o_orderstatus = 'F' AND l1.l_returnflag = 'R'
        |  AND EXISTS (SELECT 1 FROM lineitem l2
        |              WHERE l2.l_orderkey = l1.l_orderkey
        |                AND l2.l_suppkey <> l1.l_suppkey)
        |  AND NOT EXISTS (SELECT 1 FROM lineitem l3
        |                  WHERE l3.l_orderkey = l1.l_orderkey
        |                    AND l3.l_suppkey <> l1.l_suppkey
        |                    AND l3.l_returnflag = 'R')
        |GROUP BY s_name
        |ORDER BY numwait DESC, s_name LIMIT 100""".stripMargin),
      (s, d) => {
        Tables.registerAll(s, d)
        s.sql(
          """SELECT s_name, count(*) AS numwait
            |FROM supplier
            |JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
            |JOIN orders ON o_orderkey = l1.l_orderkey
            |WHERE o_orderstatus = 'F' AND l1.l_returnflag = 'R'
            |  AND EXISTS (SELECT 1 FROM lineitem l2
            |              WHERE l2.l_orderkey = l1.l_orderkey
            |                AND l2.l_suppkey <> l1.l_suppkey)
            |  AND NOT EXISTS (SELECT 1 FROM lineitem l3
            |                  WHERE l3.l_orderkey = l1.l_orderkey
            |                    AND l3.l_suppkey <> l1.l_suppkey
            |                    AND l3.l_returnflag = 'R')
            |GROUP BY s_name
            |ORDER BY numwait DESC, s_name LIMIT 100""".stripMargin)
      }),

    // TPC-H Q22 shape: rich customers with no large orders — scalar
    // subquery threshold + NOT EXISTS anti-join, grouped by nation.
    // (The reference's "no orders at all" returns zero rows on this
    // synthetic data, where every customer has orders; "no order over
    // 250k" keeps the identical plan with a non-empty result.)
    Q("q130_tpch_q22", Some(
      """SELECT c_nationkey, count(*) AS numcust,
        |  CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS totacctbal
        |FROM customer
        |WHERE c_acctbal > (
        |    SELECT CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
        |           / count(*)
        |    FROM customer WHERE c_acctbal > 0)
        |  AND NOT EXISTS (SELECT 1 FROM orders
        |                  WHERE o_custkey = c_custkey
        |                    AND o_totalprice > 250000)
        |GROUP BY c_nationkey
        |ORDER BY c_nationkey""".stripMargin),
      (s, d) => {
        Tables.registerAll(s, d)
        s.sql(
          """SELECT c_nationkey, count(*) AS numcust,
            |  CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS totacctbal
            |FROM customer
            |WHERE c_acctbal > (
            |    SELECT CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
            |           / count(*)
            |    FROM customer WHERE c_acctbal > 0)
            |  AND NOT EXISTS (SELECT 1 FROM orders
            |                  WHERE o_custkey = c_custkey
            |                    AND o_totalprice > 250000)
            |GROUP BY c_nationkey
            |ORDER BY c_nationkey""".stripMargin)
      }),

    // TPC-H Q15 shape: top supplier by 3-month revenue — the
    // aggregate-view + scalar-max-subquery plan (view reused by the
    // ranking and the threshold; ties all surface, per spec).
    Q("q140_tpch_q15", Some(tpchQ15Sql), (s, d) => {
      Tables.registerAll(s, d); s.sql(tpchQ15Sql)
    }),

    // TPC-H Q9 shape: profit by nation and order-year. Adapted: the
    // testdata has no partsupp, so amount omits the ps_supplycost·qty
    // term (revenue-only profit); the 5-way join + LIKE part filter —
    // the plan Q9 exists to stress — is intact. 'red' stands in for
    // the spec's color token (this corpus has no 'green' parts).
    Q("q141_tpch_q9", Some(tpchQ9Sql), (s, d) => {
      Tables.registerAll(s, d); s.sql(tpchQ9Sql)
    }),

    // TPC-H Q11 shape: value concentration — groups whose value exceeds
    // a fixed fraction of the corpus-wide total (HAVING against a
    // scalar aggregate over the same view). Adapted: lineitem revenue
    // per part stands in for partsupp supplycost·availqty.
    Q("q142_tpch_q11", Some(tpchQ11Sql), (s, d) => {
      Tables.registerAll(s, d); s.sql(tpchQ11Sql)
    }),

    // TPC-H Q12 shape: shipping-delay priority split — the two
    // conditional sums over a fact-dim join. Adapted: l_linestatus
    // stands in for l_shipmode and "late" is shipdate > orderdate+60d
    // (the corpus has no commit/receipt dates).
    Q("q143_tpch_q12", Some(tpchQ12Sql), (s, d) => {
      Tables.registerAll(s, d); s.sql(tpchQ12Sql)
    }),

    // TPC-H Q2 shape: min-cost supplier per part within a region — the
    // correlated scalar-min subquery over a multi-join (Catalyst
    // rewrites it to an aggregate + join; the dims broadcast). Adapted:
    // lineitem's per-(part,supplier) min unit price stands in for
    // partsupp.ps_supplycost.
    Q("q144_tpch_q2", Some(tpchQ2Sql), (s, d) => {
      Tables.registerAll(s, d); s.sql(tpchQ2Sql)
    }),

    // TPC-H Q16 shape: supplier diversity per part attribute group —
    // count(DISTINCT) with a NOT IN anti-join subquery. Adapted:
    // lineitem bridges part↔supplier (no partsupp); the complaint
    // pattern is a name LIKE.
    Q("q145_tpch_q16", Some(tpchQ16Sql), (s, d) => {
      Tables.registerAll(s, d); s.sql(tpchQ16Sql)
    }),

    // TPC-H Q20 shape: suppliers with excess flagged-part volume — the
    // nested IN chain whose inner filter compares two aggregates of the
    // same fact table (quarter volume vs half of all-time volume).
    // l_quantity is integral so both sums are exact (rule: plain sums
    // over integral doubles are order-independent).
    Q("q146_tpch_q20", Some(tpchQ20Sql), (s, d) => {
      Tables.registerAll(s, d); s.sql(tpchQ20Sql)
    }),

    // date/time functions over order dates
    Q("q58_date_functions", Some(
      """SELECT year(o_orderdate) AS y, month(o_orderdate) AS m,
        |       count(*) AS n,
        |       CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
        |FROM orders GROUP BY year(o_orderdate), month(o_orderdate)
        |ORDER BY y, m""".stripMargin),
      (s, d) => Tables.load(s, d, "orders")
        .groupBy(year(col("o_orderdate")).as("y"),
          month(col("o_orderdate")).as("m"))
        .agg(count(lit(1)).as("n"),
          sum(dec(col("o_totalprice"))).cast("double").as("total"))
        .orderBy(col("y"), col("m")))
  )

  /** Q15/Q9/Q11 run the IDENTICAL SQL text on both engines (the shared
    * dialect subset: decimal sums cast to DOUBLE at the boundary, total
    * ORDER BY, e-suffixed double literals per rule 14). `lazy`: `all`
    * initializes first (rule 11). */
  private lazy val tpchQ15Sql: String =
    """WITH revenue AS (
      |  SELECT l_suppkey AS supplier_no,
      |         sum(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(1 - l_discount AS DECIMAL(8,2))) AS total_revenue
      |  FROM lineitem
      |  WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      |    AND l_shipdate < TIMESTAMP '1997-04-01 00:00:00'
      |  GROUP BY l_suppkey)
      |SELECT s_suppkey, s_name, CAST(total_revenue AS DOUBLE) AS total_revenue
      |FROM supplier JOIN revenue ON s_suppkey = supplier_no
      |WHERE total_revenue = (SELECT max(total_revenue) FROM revenue)
      |ORDER BY s_suppkey""".stripMargin

  private lazy val tpchQ9Sql: String =
    """SELECT nation, o_year, CAST(sum(amount) AS DOUBLE) AS sum_profit
      |FROM (
      |  SELECT n_name AS nation, CAST(year(o_orderdate) AS BIGINT) AS o_year,
      |         CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(1 - l_discount AS DECIMAL(8,2)) AS amount
      |  FROM lineitem
      |  JOIN supplier ON s_suppkey = l_suppkey
      |  JOIN part ON p_partkey = l_partkey
      |  JOIN orders ON o_orderkey = l_orderkey
      |  JOIN nation ON s_nationkey = n_nationkey
      |  WHERE p_name LIKE '%red%') profit
      |GROUP BY nation, o_year
      |ORDER BY nation, o_year DESC""".stripMargin

  /** Q11's concentration threshold is MEAN-relative (1.3x the mean
    * part share), not a fixed fraction: TPC-H's 0.0001/SF exists
    * because a fixed fraction goes vacuous as part count grows — a
    * fixed 0.001 returned 0 rows at every gate SF (ADVICE r6). The
    * threshold is sum*1.3e0/count — double ops in identical textual
    * order on both engines (identical SQL text runs on both). */
  private lazy val tpchQ11Sql: String =
    """WITH value_by_part AS (
      |  SELECT l_partkey,
      |         sum(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(1 - l_discount AS DECIMAL(8,2))) AS part_value
      |  FROM lineitem GROUP BY l_partkey)
      |SELECT l_partkey, CAST(part_value AS DOUBLE) AS part_value
      |FROM value_by_part
      |WHERE CAST(part_value AS DOUBLE) > (
      |  SELECT CAST(sum(part_value) AS DOUBLE) * 1.3e0 / count(*) FROM value_by_part)
      |ORDER BY part_value DESC, l_partkey""".stripMargin

  /** CASE sums land as HUGEINT in DuckDB vs BIGINT in Spark — cast at
    * the boundary (rule 1). timestamp + INTERVAL n DAY parses and
    * computes identically in both engines. */
  private lazy val tpchQ12Sql: String =
    """SELECT l_linestatus,
      |  CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
      |  CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
      |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
      |WHERE l_shipdate > o_orderdate + INTERVAL 60 DAY
      |GROUP BY l_linestatus
      |ORDER BY l_linestatus""".stripMargin

  /** unit_cost is a single IEEE divide (2-dp price / integral qty) —
    * bitwise identical across engines, and only compared/min'd, never
    * summed, so no decimal plumbing is needed. */
  private lazy val tpchQ2Sql: String =
    """WITH cost AS (
      |  SELECT l_partkey, l_suppkey, min(l_extendedprice / l_quantity) AS unit_cost
      |  FROM lineitem GROUP BY l_partkey, l_suppkey)
      |SELECT s_acctbal, s_name, n_name, p_partkey, p_brand, unit_cost
      |FROM part
      |JOIN cost ON p_partkey = l_partkey
      |JOIN supplier ON s_suppkey = l_suppkey
      |JOIN nation ON s_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |WHERE p_type = 'STANDARD' AND r_name = 'ASIA'
      |  AND unit_cost = (
      |    SELECT min(c2.unit_cost) FROM cost c2
      |    JOIN supplier s2 ON s2.s_suppkey = c2.l_suppkey
      |    JOIN nation n2 ON n2.n_nationkey = s2.s_nationkey
      |    JOIN region r2 ON r2.r_regionkey = n2.n_regionkey
      |    WHERE c2.l_partkey = p_partkey AND r2.r_name = 'ASIA')
      |ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
      |LIMIT 100""".stripMargin

  /** p_size is INT32 in the parquet — cast to BIGINT in the output
    * (rule 1: no non-int64 integer column may reach a final schema). */
  private lazy val tpchQ16Sql: String =
    """SELECT p_brand, p_type, CAST(p_size AS BIGINT) AS p_size,
      |  count(DISTINCT l_suppkey) AS supplier_cnt
      |FROM part JOIN lineitem ON p_partkey = l_partkey
      |WHERE p_brand <> 'Brand#13' AND p_type <> 'PROMO'
      |  AND p_size IN (1, 9, 14, 19, 23, 36, 45, 49)
      |  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_name LIKE '%007%')
      |GROUP BY p_brand, p_type, p_size
      |ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
      |LIMIT 50""".stripMargin

  private lazy val tpchQ20Sql: String =
    """WITH qw AS (
      |  SELECT l_partkey, l_suppkey, sum(l_quantity) AS qtyw
      |  FROM lineitem
      |  WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      |    AND l_shipdate < TIMESTAMP '1997-04-01 00:00:00'
      |  GROUP BY l_partkey, l_suppkey),
      |qall AS (
      |  SELECT l_partkey, l_suppkey, sum(l_quantity) AS qtyall
      |  FROM lineitem GROUP BY l_partkey, l_suppkey)
      |SELECT s_suppkey, s_name FROM supplier
      |WHERE s_suppkey IN (
      |  SELECT qw.l_suppkey FROM qw
      |  JOIN qall ON qall.l_partkey = qw.l_partkey AND qall.l_suppkey = qw.l_suppkey
      |  JOIN part ON p_partkey = qw.l_partkey
      |  WHERE p_name LIKE '%red%' AND qtyw > 0.5e0 * qtyall)
      |ORDER BY s_suppkey""".stripMargin

  /** q59's oracle: DuckDB replay of the KMV estimate. Distinct keys →
    * polynomial hash (HUGEINT, sign-wrapped to the BIGINT domain Spark's
    * TreeSet orders by) → per-group k smallest → exact KMinValues.eval
    * arithmetic: below k the sketch is exact; otherwise map the k-th
    * smallest signed hash onto (0,1) and estimate (k-1)/x. The double
    * constants are interpolated from the very Long.MinValue/MaxValue
    * arithmetic the Scala eval performs, so the IEEE division is
    * identical on both engines. `lazy`: `all` initializes first. */
  /** q168 oracle: both sketches, θ, the sample and the integer scale-up
    * replayed; hashes masked to [0,2^62) via % on the HUGEINT fold. */
  private lazy val kmvIntersectionOracle: String = {
    val k1 = 257 // k+1
    val full = "4611686018427387904" // 2^62 = θ sentinel when not full
    def side(tag: String, key: String, table: String): String =
      s"""h$tag AS (
         |  SELECT DISTINCT CAST(${DedupQueries.polyHashSql(
        s"reverse(lpad(CAST($key AS VARCHAR), 12, '0'))")} % $full AS BIGINT) AS h
         |  FROM $table),
         |s$tag AS (SELECT h FROM h$tag ORDER BY h LIMIT $k1),
         |t$tag AS (SELECT CASE WHEN count(*) = $k1 THEN max(h)
         |                 ELSE $full END AS theta_$tag FROM s$tag)""".stripMargin
    s"""WITH ${side("a", "l_orderkey", "lineitem")},
       |${side("b", "o_orderkey", "orders")},
       |th AS (SELECT least(theta_a, theta_b) AS theta FROM ta, tb),
       |smp AS (SELECT count(*) AS n_sample
       |        FROM sa JOIN sb USING (h) CROSS JOIN th WHERE h < theta),
       |ex AS (SELECT count(*) AS exact_intersection FROM
       |  (SELECT DISTINCT l_orderkey AS key FROM lineitem) l
       |  JOIN (SELECT DISTINCT o_orderkey AS key FROM orders) o USING (key)),
       |fin AS (SELECT CAST(theta AS BIGINT) AS theta,
       |  CAST(n_sample AS BIGINT) AS n_sample,
       |  CAST((n_sample::HUGEINT * $full) // theta AS BIGINT)
       |    AS est_intersection,
       |  CAST(exact_intersection AS BIGINT) AS exact_intersection
       |  FROM smp CROSS JOIN th CROSS JOIN ex)
       |SELECT *, (exact_intersection = 0 AND n_sample = 0)
       |  OR abs(est_intersection - exact_intersection) * 4
       |     <= exact_intersection AS within_25pct
       |FROM fin ORDER BY theta""".stripMargin
  }

  private lazy val kmvEstimateOracle: String = {
    val k = 256
    val minD = Long.MinValue.toDouble
    val rangeD = Long.MaxValue.toDouble - Long.MinValue.toDouble
    val x = s"((CAST(kth AS DOUBLE) - ($minD)) / $rangeD)"
    s"""WITH vals AS (
       |  SELECT DISTINCT l_returnflag, CAST(l_partkey AS VARCHAR) AS w
       |  FROM lineitem WHERE l_partkey IS NOT NULL),
       |hd AS (
       |  SELECT DISTINCT l_returnflag,
       |         ${DedupQueries.signWrap(DedupQueries.polyHashSql("w"))} AS h
       |  FROM vals),
       |ranked AS (
       |  SELECT l_returnflag, h,
       |         row_number() OVER (PARTITION BY l_returnflag ORDER BY h) AS rn,
       |         count(*) OVER (PARTITION BY l_returnflag) AS nd
       |  FROM hd),
       |sk AS (
       |  SELECT l_returnflag,
       |         max(CASE WHEN rn = $k THEN h END) AS kth,
       |         max(nd) AS nd
       |  FROM ranked GROUP BY l_returnflag),
       |ex AS (
       |  SELECT l_returnflag, count(DISTINCT l_partkey) AS exact_parts
       |  FROM lineitem GROUP BY l_returnflag)
       |SELECT e.l_returnflag, e.exact_parts,
       |       CASE WHEN s.nd < $k THEN CAST(s.nd AS DOUBLE)
       |            WHEN $x <= 0.0 THEN ${k.toDouble}
       |            ELSE ${(k - 1).toDouble} / $x END AS approx_parts
       |FROM ex e JOIN sk s USING (l_returnflag)
       |ORDER BY l_returnflag""".stripMargin
  }
}
