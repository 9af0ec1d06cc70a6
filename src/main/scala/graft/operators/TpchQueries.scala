package graft.operators

import graft.QueryGroup
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** TPC-H-derived relational suite, adapted to the slim driver schema
  * (FIXTURES.md: no comment/address/phone columns, DOUBLE prices,
  * TIMESTAMP dates; the missing partsupp table is synthesized
  * deterministically — TpchSynth — as an identical CTE on both engines,
  * so q02/q11 run their REAL shapes). Query shapes follow the reference corpus at
  * presto-benchto-benchmarks/src/main/resources/sql/presto/tpch/q*.sql;
  * each is expressed with the DataFrame API (declarative — Catalyst picks
  * broadcast vs shuffle joins, partial/final aggregation, TopN).
  *
  * Scale notes (100 TB design intent):
  *  - nation/region are broadcast-joined (tiny dims) — no shuffle;
  *  - fact-fact joins (orders ⨝ lineitem) shuffle on the join key only
  *    after filters are pushed to the parquet scan;
  *  - every aggregate is partial+final (map-side combine) by planning;
  *  - ORDER BY ... LIMIT n compiles to TakeOrderedAndProject (no global
  *    sort).
  * Floats are rounded on OUTPUT only, to absorb summation-order
  * nondeterminism across partitioned vs sequential (DuckDB) execution.
  */
object TpchQueries extends QueryGroup {

  private def ts(s: String): Column = lit(s).cast("timestamp")
  private def rev: Column = col("l_extendedprice") * (lit(1.0) - col("l_discount"))

  /** TPC-H Q2 over the synthesized partsupp — IDENTICAL text on both
    * engines (the CTE derives partsupp from part x supplier with pure key
    * arithmetic, TpchSynth). Correlated min-subquery decorrelates to a
    * per-part min aggregate joined back — the reference's plan shape too.
    */
  private val Q02Sql: String =
    s"""WITH partsupp AS (
       |${TpchSynth.partsuppPrefixedSql(identity)}
       |)
       |SELECT round(s_acctbal, 2) AS s_acctbal, s_name, n_name, p_partkey,
       |  p_brand, p_type
       |FROM part, supplier, partsupp, nation, region
       |WHERE p_partkey = ps_partkey
       |  AND s_suppkey = ps_suppkey
       |  AND p_size BETWEEN 10 AND 20
       |  AND p_type = 'LARGE'
       |  AND s_nationkey = n_nationkey
       |  AND n_regionkey = r_regionkey
       |  AND r_name = 'EUROPE'
       |  AND ps_supplycost = (
       |    SELECT min(ps_supplycost)
       |    FROM partsupp, supplier, nation, region
       |    WHERE p_partkey = ps_partkey
       |      AND s_suppkey = ps_suppkey
       |      AND s_nationkey = n_nationkey
       |      AND n_regionkey = r_regionkey
       |      AND r_name = 'EUROPE')
       |ORDER BY s_acctbal DESC, n_name, s_name, p_partkey""".stripMargin

  def defs = Seq(
    // ── Q1: full-scan grouped aggregation (partial+final HashAggregate) ──
    q("q01_pricing_summary",
      """SELECT l_returnflag, l_linestatus,
        |  round(sum(l_quantity), 2) AS sum_qty,
        |  round(sum(l_extendedprice), 2) AS sum_base_price,
        |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
        |  round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
        |  round(avg(l_quantity), 4) AS avg_qty,
        |  round(avg(l_extendedprice), 4) AS avg_price,
        |  round(avg(l_discount), 4) AS avg_disc,
        |  count(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin) { (s, _) =>
      s.table("lineitem")
        .filter(col("l_shipdate") <= ts("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          round(sum("l_quantity"), 2).as("sum_qty"),
          round(sum("l_extendedprice"), 2).as("sum_base_price"),
          round(sum(rev), 2).as("sum_disc_price"),
          round(sum(rev * (lit(1.0) + col("l_tax"))), 2).as("sum_charge"),
          round(avg("l_quantity"), 4).as("avg_qty"),
          round(avg("l_extendedprice"), 4).as("avg_price"),
          round(avg("l_discount"), 4).as("avg_disc"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus")
    },

    // ── Q2: min-cost supplier — correlated min-subquery over partsupp ──
    // partsupp is the deterministic TpchSynth derivation, declared as an
    // IDENTICAL CTE on both engines (the SpatialOps synthetic-coordinate
    // mechanism); predicates tuned to fixture values ('LARGE' exists,
    // '%BRASS' doesn't; size widened to a range so several parts qualify) so the result is non-trivial. Reference shape:
    // presto-benchto-benchmarks/.../tpch/q02.sql.
    q("q02_min_cost_supplier", Q02Sql) { (s, _) => s.sql(Q02Sql) },

    // ── Q3: 3-way join + agg + deterministic top-N ──
    q("q03_shipping_priority",
      """SELECT l_orderkey,
        |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
        |  o_orderdate, o_orderpriority
        |FROM customer
        |JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON l_orderkey = o_orderkey
        |WHERE c_mktsegment = 'BUILDING'
        |  AND o_orderdate < TIMESTAMP '1998-06-30'
        |  AND l_shipdate > TIMESTAMP '1998-06-30'
        |GROUP BY l_orderkey, o_orderdate, o_orderpriority
        |ORDER BY revenue DESC, l_orderkey
        |LIMIT 10""".stripMargin) { (s, _) =>
      s.table("customer").filter(col("c_mktsegment") === "BUILDING")
        .join(s.table("orders"), col("c_custkey") === col("o_custkey"))
        .filter(col("o_orderdate") < ts("1998-06-30"))
        .join(s.table("lineitem"), col("l_orderkey") === col("o_orderkey"))
        .filter(col("l_shipdate") > ts("1998-06-30"))
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(round(sum(rev), 2).as("revenue"))
        .orderBy(desc("revenue"), col("l_orderkey"))
        .limit(10)
    },

    // ── Q4: EXISTS correlated subquery → left-semi join ──
    q("q04_order_priority",
      """SELECT o_orderpriority, count(*) AS order_count
        |FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1996-01-01'
        |  AND o_orderdate < TIMESTAMP '1996-07-01'
        |  AND EXISTS (SELECT 1 FROM lineitem
        |              WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
        |GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin) { (s, _) =>
      s.sql("""SELECT o_orderpriority, count(*) AS order_count
              |FROM orders
              |WHERE o_orderdate >= TIMESTAMP '1996-01-01'
              |  AND o_orderdate < TIMESTAMP '1996-07-01'
              |  AND EXISTS (SELECT 1 FROM lineitem
              |              WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
              |GROUP BY o_orderpriority
              |ORDER BY o_orderpriority""".stripMargin)
    },

    // ── Q5: 6-way join, dims broadcast, facts shuffled on keys ──
    q("q05_local_supplier",
      """SELECT n_name, round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
        |FROM customer
        |JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON l_orderkey = o_orderkey
        |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE o_orderdate >= TIMESTAMP '1996-01-01'
        |  AND o_orderdate < TIMESTAMP '1997-01-01'
        |GROUP BY n_name
        |ORDER BY revenue DESC, n_name""".stripMargin) { (s, _) =>
      s.table("customer")
        .join(s.table("orders"), col("c_custkey") === col("o_custkey"))
        .filter(col("o_orderdate") >= ts("1996-01-01") && col("o_orderdate") < ts("1997-01-01"))
        .join(s.table("lineitem"), col("l_orderkey") === col("o_orderkey"))
        .join(s.table("supplier"),
          col("l_suppkey") === col("s_suppkey") && col("c_nationkey") === col("s_nationkey"))
        .join(broadcast(s.table("nation")), col("s_nationkey") === col("n_nationkey"))
        .join(broadcast(s.table("region")), col("n_regionkey") === col("r_regionkey"))
        .groupBy("n_name")
        .agg(round(sum(rev), 2).as("revenue"))
        .orderBy(desc("revenue"), col("n_name"))
    },

    // ── Q6: scan + pushed filter + ungrouped agg ──
    q("q06_revenue_forecast",
      """SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        |  AND l_shipdate < TIMESTAMP '1997-01-01'
        |  AND l_discount BETWEEN 0.05 AND 0.07
        |  AND l_quantity < 24""".stripMargin) { (s, _) =>
      s.table("lineitem")
        .filter(col("l_shipdate") >= ts("1996-01-01") && col("l_shipdate") < ts("1997-01-01")
          && col("l_discount").between(0.05, 0.07) && col("l_quantity") < 24)
        .agg(round(sum(col("l_extendedprice") * col("l_discount")), 2).as("revenue"))
    },

    // ── Q7: bi-national volume (nation dim joined under two roles) ──
    q("q07_volume_shipping",
      """SELECT supp_nation, cust_nation, l_year, round(sum(volume), 2) AS revenue
        |FROM (
        |  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
        |         year(l_shipdate) AS l_year,
        |         l_extendedprice * (1 - l_discount) AS volume
        |  FROM supplier
        |  JOIN lineitem ON s_suppkey = l_suppkey
        |  JOIN orders ON o_orderkey = l_orderkey
        |  JOIN customer ON c_custkey = o_custkey
        |  JOIN nation n1 ON s_nationkey = n1.n_nationkey
        |  JOIN nation n2 ON c_nationkey = n2.n_nationkey
        |  WHERE ((n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_8')
        |      OR (n1.n_name = 'NATION_8' AND n2.n_name = 'NATION_3'))
        |) shipping
        |GROUP BY supp_nation, cust_nation, l_year
        |ORDER BY supp_nation, cust_nation, l_year""".stripMargin) { (s, _) =>
      val n1 = s.table("nation").select(col("n_nationkey").as("n1_key"), col("n_name").as("supp_nation"))
      val n2 = s.table("nation").select(col("n_nationkey").as("n2_key"), col("n_name").as("cust_nation"))
      s.table("supplier")
        .join(s.table("lineitem"), col("s_suppkey") === col("l_suppkey"))
        .join(s.table("orders"), col("o_orderkey") === col("l_orderkey"))
        .join(s.table("customer"), col("c_custkey") === col("o_custkey"))
        .join(broadcast(n1), col("s_nationkey") === col("n1_key"))
        .join(broadcast(n2), col("c_nationkey") === col("n2_key"))
        .filter((col("supp_nation") === "NATION_3" && col("cust_nation") === "NATION_8")
          || (col("supp_nation") === "NATION_8" && col("cust_nation") === "NATION_3"))
        .withColumn("l_year", year(col("l_shipdate")))
        .groupBy("supp_nation", "cust_nation", "l_year")
        .agg(round(sum(rev), 2).as("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    },

    // ── Q8: market share — conditional aggregation over a wide join ──
    q("q08_market_share",
      """SELECT o_year,
        |  round(sum(CASE WHEN nation = 'BRAZIL' THEN volume ELSE 0 END)
        |        / sum(volume), 4) AS mkt_share
        |FROM (
        |  SELECT year(o_orderdate) AS o_year,
        |         l_extendedprice * (1 - l_discount) AS volume,
        |         n2.n_name AS nation
        |  FROM part
        |  JOIN lineitem ON p_partkey = l_partkey
        |  JOIN supplier ON s_suppkey = l_suppkey
        |  JOIN orders ON l_orderkey = o_orderkey
        |  JOIN customer ON o_custkey = c_custkey
        |  JOIN nation n1 ON c_nationkey = n1.n_nationkey
        |  JOIN region ON n1.n_regionkey = r_regionkey
        |  JOIN nation n2 ON s_nationkey = n2.n_nationkey
        |  WHERE r_name = 'AMERICA' AND p_type = 'ECONOMY'
        |) all_nations
        |GROUP BY o_year
        |ORDER BY o_year""".stripMargin) { (s, _) =>
      s.sql("""SELECT o_year,
              |  round(sum(CASE WHEN nation = 'BRAZIL' THEN volume ELSE 0 END)
              |        / sum(volume), 4) AS mkt_share
              |FROM (
              |  SELECT year(o_orderdate) AS o_year,
              |         l_extendedprice * (1 - l_discount) AS volume,
              |         n2.n_name AS nation
              |  FROM part
              |  JOIN lineitem ON p_partkey = l_partkey
              |  JOIN supplier ON s_suppkey = l_suppkey
              |  JOIN orders ON l_orderkey = o_orderkey
              |  JOIN customer ON o_custkey = c_custkey
              |  JOIN nation n1 ON c_nationkey = n1.n_nationkey
              |  JOIN region ON n1.n_regionkey = r_regionkey
              |  JOIN nation n2 ON s_nationkey = n2.n_nationkey
              |  WHERE r_name = 'AMERICA' AND p_type = 'ECONOMY'
              |) all_nations
              |GROUP BY o_year
              |ORDER BY o_year""".stripMargin)
    },

    // ── Q9 (adapted: no partsupp/supplycost): profit by nation × year ──
    // the REAL q09 shape: profit = revenue − supplycost·quantity over the
    // synthesized partsupp (round 3's adaptation dropped the partsupp
    // term AND its '%green%' predicate matched nothing in the fixture —
    // the query was silently empty). '%red%' matches ~1/8 of parts; the
    // (partkey, suppkey) equi-join against the derived partsupp keeps the
    // lineitems sold by one of the part's 4 suppliers.
    q("q09_product_profit",
      s"""WITH partsupp AS (
         |${TpchSynth.partsuppPrefixedSql(identity)}
         |)
         |SELECT nation, o_year, round(sum(amount), 2) + 0.0 AS sum_profit
         |FROM (
         |  SELECT n_name AS nation, year(o_orderdate) AS o_year,
         |         l_extendedprice * (1 - l_discount) - ps_supplycost * l_quantity AS amount
         |  FROM part
         |  JOIN lineitem ON p_partkey = l_partkey
         |  JOIN partsupp ON ps_partkey = l_partkey AND ps_suppkey = l_suppkey
         |  JOIN supplier ON s_suppkey = l_suppkey
         |  JOIN orders ON o_orderkey = l_orderkey
         |  JOIN nation ON s_nationkey = n_nationkey
         |  WHERE p_name LIKE '%red%'
         |) profit
         |GROUP BY nation, o_year
         |ORDER BY nation, o_year DESC""".stripMargin) { (s, _) =>
      val ps = s.sql(TpchSynth.partsuppPrefixedSql(identity))
      s.table("part").filter(col("p_name").like("%red%"))
        .join(s.table("lineitem"), col("p_partkey") === col("l_partkey"))
        .join(ps, col("ps_partkey") === col("l_partkey") &&
          col("ps_suppkey") === col("l_suppkey"))
        .join(s.table("supplier"), col("s_suppkey") === col("l_suppkey"))
        .join(s.table("orders"), col("o_orderkey") === col("l_orderkey"))
        .join(broadcast(s.table("nation")), col("s_nationkey") === col("n_nationkey"))
        .select(col("n_name").as("nation"), year(col("o_orderdate")).as("o_year"),
          (rev - col("ps_supplycost") * col("l_quantity")).as("amount"))
        .groupBy("nation", "o_year")
        .agg((round(sum("amount"), 2) + lit(0.0)).as("sum_profit"))
        .orderBy(col("nation"), desc("o_year"))
    },

    // ── Q10 (adapted cols): top returned-revenue customers ──
    q("q10_returned_items",
      """SELECT c_custkey, c_name,
        |  CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount) * 100 + 0.5) AS BIGINT)) AS DOUBLE) / 100 AS revenue,
        |  round(c_acctbal, 2) AS c_acctbal, n_name
        |FROM customer
        |JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON l_orderkey = o_orderkey
        |JOIN nation ON c_nationkey = n_nationkey
        |WHERE o_orderdate >= TIMESTAMP '1996-01-01'
        |  AND o_orderdate < TIMESTAMP '1996-04-01'
        |  AND l_returnflag = 'R'
        |GROUP BY c_custkey, c_name, c_acctbal, n_name
        |ORDER BY revenue DESC, c_custkey
        |LIMIT 20""".stripMargin) { (s, _) =>
      s.table("customer")
        .join(s.table("orders"), col("c_custkey") === col("o_custkey"))
        .filter(col("o_orderdate") >= ts("1996-01-01") && col("o_orderdate") < ts("1996-04-01"))
        .join(s.table("lineitem"), col("l_orderkey") === col("o_orderkey"))
        .filter(col("l_returnflag") === "R")
        .join(broadcast(s.table("nation")), col("c_nationkey") === col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        // per-row cents quantization in pure IEEE double ops (identical on
        // any engine), then an exact integer sum — order-independent under
        // any partitioning, no decimal-cast rounding-mode divergence
        .agg((sum(floor(rev * 100 + 0.5).cast("bigint")).cast("double") / 100).as("revenue"))
        .select(col("c_custkey"), col("c_name"), col("revenue"),
          round(col("c_acctbal"), 2).as("c_acctbal"), col("n_name"))
        .orderBy(desc("revenue"), col("c_custkey"))
        .limit(20)
    },

    // ── Q11: important stock — grouped agg vs global-scalar HAVING ──
    // Same synthesized-partsupp CTE as q02 on the oracle side; the Spark
    // side is the DataFrame plan you'd run at 100 TB: the 4-supplier dim
    // slice broadcast, ONE shuffle to (ps_partkey) partial+final sums,
    // and the global threshold joined back as a broadcast 1-row scalar —
    // no second scan-side shuffle, no collect. Reference shape:
    // presto-benchto-benchmarks/.../tpch/q11.sql.
    q("q11_important_stock",
      s"""WITH partsupp AS (
         |${TpchSynth.partsuppPrefixedSql(identity)}
         |)
         |SELECT ps_partkey, round(sum(ps_supplycost * ps_availqty), 2) AS value
         |FROM partsupp, supplier, nation
         |WHERE ps_suppkey = s_suppkey AND s_nationkey = n_nationkey
         |  AND n_name = 'NATION_7'
         |GROUP BY ps_partkey
         |HAVING sum(ps_supplycost * ps_availqty) > (
         |  SELECT sum(ps_supplycost * ps_availqty) * 0.001
         |  FROM partsupp, supplier, nation
         |  WHERE ps_suppkey = s_suppkey AND s_nationkey = n_nationkey
         |    AND n_name = 'NATION_7')
         |ORDER BY value DESC, ps_partkey""".stripMargin) { (s, _) =>
      val ps = s.sql(TpchSynth.partsuppPrefixedSql(identity))
      val base = ps
        .join(s.table("supplier"), col("ps_suppkey") === col("s_suppkey"))
        .join(broadcast(s.table("nation").filter(col("n_name") === "NATION_7")),
          col("s_nationkey") === col("n_nationkey"))
        .select(col("ps_partkey"),
          (col("ps_supplycost") * col("ps_availqty")).as("v"))
      val grouped = base.groupBy("ps_partkey").agg(sum("v").as("value0"))
      val threshold = base.agg((sum("v") * lit(0.001)).as("threshold"))
      grouped.join(broadcast(threshold))
        .filter(col("value0") > col("threshold"))
        .select(col("ps_partkey"), round(col("value0"), 2).as("value"))
        .orderBy(desc("value"), col("ps_partkey"))
    },

    // ── Q12 (adapted: no shipmode): conditional counts ──
    q("q12_priority_shipping",
      """SELECT l_returnflag,
        |  CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
        |  CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
        |FROM orders
        |JOIN lineitem ON o_orderkey = l_orderkey
        |WHERE l_shipdate >= TIMESTAMP '1997-01-01'
        |  AND l_shipdate < TIMESTAMP '1998-01-01'
        |GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin) { (s, _) =>
      val isHigh = col("o_orderpriority").isin("1-URGENT", "2-HIGH")
      s.table("orders")
        .join(s.table("lineitem"), col("o_orderkey") === col("l_orderkey"))
        .filter(col("l_shipdate") >= ts("1997-01-01") && col("l_shipdate") < ts("1998-01-01"))
        .groupBy("l_returnflag")
        .agg(
          sum(when(isHigh, 1).otherwise(0)).as("high_line_count"),
          sum(when(!isHigh, 1).otherwise(0)).as("low_line_count"))
        .orderBy("l_returnflag")
    },

    // ── Q13: LEFT OUTER join + two-level aggregation ──
    q("q13_customer_distribution",
      """SELECT c_count, count(*) AS custdist
        |FROM (
        |  SELECT c_custkey, count(o_orderkey) AS c_count
        |  FROM customer
        |  LEFT OUTER JOIN orders ON c_custkey = o_custkey
        |    AND o_orderpriority <> '1-URGENT'
        |  GROUP BY c_custkey
        |) c_orders
        |GROUP BY c_count
        |ORDER BY custdist DESC, c_count DESC""".stripMargin) { (s, _) =>
      s.table("customer")
        .join(s.table("orders").filter(col("o_orderpriority") =!= "1-URGENT"),
          col("c_custkey") === col("o_custkey"), "left_outer")
        .groupBy("c_custkey")
        .agg(count(col("o_orderkey")).as("c_count"))
        .groupBy("c_count")
        .agg(count(lit(1)).as("custdist"))
        .orderBy(desc("custdist"), desc("c_count"))
    },

    // ── Q14: promo ratio (conditional agg over join) ──
    q("q14_promo_effect",
      """SELECT round(100.0 * sum(CASE WHEN p_type = 'PROMO'
        |    THEN l_extendedprice * (1 - l_discount) ELSE 0 END)
        |  / sum(l_extendedprice * (1 - l_discount)), 4) AS promo_revenue
        |FROM lineitem
        |JOIN part ON l_partkey = p_partkey
        |WHERE l_shipdate >= TIMESTAMP '1996-09-01'
        |  AND l_shipdate < TIMESTAMP '1996-10-01'""".stripMargin) { (s, _) =>
      s.table("lineitem")
        .filter(col("l_shipdate") >= ts("1996-09-01") && col("l_shipdate") < ts("1996-10-01"))
        .join(s.table("part"), col("l_partkey") === col("p_partkey"))
        .agg(round(lit(100.0) * sum(when(col("p_type") === "PROMO", rev).otherwise(0.0)) / sum(rev), 4)
          .as("promo_revenue"))
    },

    // ── Q15: top supplier via scalar subquery over an aggregated view ──
    q("q15_top_supplier",
      """WITH revenue AS (
        |  SELECT l_suppkey AS supplier_no,
        |         sum(l_extendedprice * (1 - l_discount)) AS total_revenue
        |  FROM lineitem
        |  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        |    AND l_shipdate < TIMESTAMP '1996-04-01'
        |  GROUP BY l_suppkey
        |)
        |SELECT s_suppkey, s_name, round(total_revenue, 2) AS total_revenue
        |FROM supplier JOIN revenue ON s_suppkey = supplier_no
        |WHERE total_revenue = (SELECT max(total_revenue) FROM revenue)
        |ORDER BY s_suppkey""".stripMargin) { (s, _) =>
      s.sql("""WITH revenue AS (
              |  SELECT l_suppkey AS supplier_no,
              |         sum(l_extendedprice * (1 - l_discount)) AS total_revenue
              |  FROM lineitem
              |  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
              |    AND l_shipdate < TIMESTAMP '1996-04-01'
              |  GROUP BY l_suppkey
              |)
              |SELECT s_suppkey, s_name, round(total_revenue, 2) AS total_revenue
              |FROM supplier JOIN revenue ON s_suppkey = supplier_no
              |WHERE total_revenue = (SELECT max(total_revenue) FROM revenue)
              |ORDER BY s_suppkey""".stripMargin)
    },

    // ── Q16 (adapted via lineitem): supplier breadth per part attrs ──
    q("q16_supplier_breadth",
      """SELECT p_brand, p_type, p_size, count(DISTINCT l_suppkey) AS supplier_cnt
        |FROM lineitem
        |JOIN part ON l_partkey = p_partkey
        |WHERE p_brand <> 'Brand#1' AND p_type <> 'PROMO' AND p_size IN (1, 5, 9, 13, 17, 21, 25, 29)
        |GROUP BY p_brand, p_type, p_size
        |ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
        |LIMIT 30""".stripMargin) { (s, _) =>
      s.table("lineitem")
        .join(s.table("part"), col("l_partkey") === col("p_partkey"))
        .filter(col("p_brand") =!= "Brand#1" && col("p_type") =!= "PROMO"
          && col("p_size").isin(1, 5, 9, 13, 17, 21, 25, 29))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(countDistinct("l_suppkey").as("supplier_cnt"))
        .orderBy(desc("supplier_cnt"), col("p_brand"), col("p_type"), col("p_size"))
        .limit(30)
    },

    // ── Q17: correlated scalar subquery (decorrelated by Catalyst) ──
    q("q17_small_quantity",
      """SELECT round(sum(l_extendedprice) / 7.0, 2) AS avg_yearly
        |FROM lineitem
        |JOIN part ON p_partkey = l_partkey
        |WHERE p_brand = 'Brand#3'
        |  AND l_quantity < (SELECT 0.5 * avg(l_quantity)
        |                    FROM lineitem l2 WHERE l2.l_partkey = p_partkey)""".stripMargin) { (s, _) =>
      s.sql("""SELECT round(sum(l_extendedprice) / 7.0, 2) AS avg_yearly
              |FROM lineitem
              |JOIN part ON p_partkey = l_partkey
              |WHERE p_brand = 'Brand#3'
              |  AND l_quantity < (SELECT 0.5 * avg(l_quantity)
              |                    FROM lineitem l2 WHERE l2.l_partkey = p_partkey)""".stripMargin)
    },

    // ── Q18: HAVING-style IN subquery over grouped facts, top-N ──
    q("q18_large_orders",
      """SELECT c_name, c_custkey, o_orderkey, o_orderdate,
        |  round(o_totalprice, 2) AS o_totalprice,
        |  round(sum(l_quantity), 2) AS total_qty
        |FROM customer
        |JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON o_orderkey = l_orderkey
        |WHERE o_orderkey IN (
        |  SELECT l_orderkey FROM lineitem GROUP BY l_orderkey HAVING sum(l_quantity) > 200)
        |GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
        |ORDER BY o_totalprice DESC, o_orderkey
        |LIMIT 100""".stripMargin) { (s, _) =>
      val bigOrders = s.table("lineitem").groupBy("l_orderkey")
        .agg(sum("l_quantity").as("qty")).filter(col("qty") > 200)
        .select(col("l_orderkey").as("big_orderkey"))
      s.table("customer")
        .join(s.table("orders"), col("c_custkey") === col("o_custkey"))
        .join(bigOrders, col("o_orderkey") === col("big_orderkey"), "left_semi")
        .join(s.table("lineitem"), col("o_orderkey") === col("l_orderkey"))
        .groupBy("c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(round(sum("l_quantity"), 2).as("total_qty"))
        .select(col("c_name"), col("c_custkey"), col("o_orderkey"), col("o_orderdate"),
          round(col("o_totalprice"), 2).as("o_totalprice"), col("total_qty"))
        .orderBy(desc("o_totalprice"), col("o_orderkey"))
        .limit(100)
    },

    // ── Q19 (adapted): OR of conjunctive range predicates ──
    q("q19_discounted_revenue",
      """SELECT round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
        |FROM lineitem
        |JOIN part ON p_partkey = l_partkey
        |WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 11)
        |   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 25 AND l_quantity BETWEEN 10 AND 20)
        |   OR (p_brand = 'Brand#3'  AND p_size BETWEEN 1 AND 35 AND l_quantity BETWEEN 20 AND 30)""".stripMargin) { (s, _) =>
      s.table("lineitem")
        .join(s.table("part"), col("p_partkey") === col("l_partkey"))
        .filter(
          (col("p_brand") === "Brand#12" && col("p_size").between(1, 15) && col("l_quantity").between(1, 11))
            || (col("p_brand") === "Brand#23" && col("p_size").between(1, 25) && col("l_quantity").between(10, 20))
            || (col("p_brand") === "Brand#3" && col("p_size").between(1, 35) && col("l_quantity").between(20, 30)))
        .agg(round(sum(rev), 2).as("revenue"))
    },

    // ── Q20 (adapted): nested semi-joins ──
    q("q20_part_promotion",
      """SELECT s_name, round(s_acctbal, 2) AS s_acctbal
        |FROM supplier
        |JOIN nation ON s_nationkey = n_nationkey
        |WHERE n_name = 'NATION_5'
        |  AND s_suppkey IN (
        |    SELECT l_suppkey FROM lineitem
        |    WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE 'red%')
        |      AND l_shipdate >= TIMESTAMP '1996-01-01'
        |      AND l_shipdate < TIMESTAMP '1997-01-01'
        |    GROUP BY l_suppkey
        |    HAVING sum(l_quantity) > 50)
        |ORDER BY s_name""".stripMargin) { (s, _) =>
      s.sql("""SELECT s_name, round(s_acctbal, 2) AS s_acctbal
              |FROM supplier
              |JOIN nation ON s_nationkey = n_nationkey
              |WHERE n_name = 'NATION_5'
              |  AND s_suppkey IN (
              |    SELECT l_suppkey FROM lineitem
              |    WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE 'red%')
              |      AND l_shipdate >= TIMESTAMP '1996-01-01'
              |      AND l_shipdate < TIMESTAMP '1997-01-01'
              |    GROUP BY l_suppkey
              |    HAVING sum(l_quantity) > 50)
              |ORDER BY s_name""".stripMargin)
    },

    // ── Q21 (adapted: late = shipped >60d after order): EXISTS + NOT EXISTS ──
    q("q21_suppliers_waiting",
      """SELECT s_name, count(*) AS numwait
        |FROM supplier
        |JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
        |JOIN orders ON o_orderkey = l1.l_orderkey
        |JOIN nation ON s_nationkey = n_nationkey
        |WHERE o_orderstatus = 'F'
        |  AND l1.l_shipdate > o_orderdate + INTERVAL 60 DAY
        |  AND EXISTS (SELECT 1 FROM lineitem l2
        |              WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey)
        |  AND NOT EXISTS (SELECT 1 FROM lineitem l3
        |                  WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
        |                    AND l3.l_shipdate > o_orderdate + INTERVAL 60 DAY)
        |GROUP BY s_name
        |ORDER BY numwait DESC, s_name
        |LIMIT 25""".stripMargin) { (s, _) =>
      s.sql("""SELECT s_name, count(*) AS numwait
              |FROM supplier
              |JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
              |JOIN orders ON o_orderkey = l1.l_orderkey
              |JOIN nation ON s_nationkey = n_nationkey
              |WHERE o_orderstatus = 'F'
              |  AND l1.l_shipdate > o_orderdate + INTERVAL '60' DAY
              |  AND EXISTS (SELECT 1 FROM lineitem l2
              |              WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey)
              |  AND NOT EXISTS (SELECT 1 FROM lineitem l3
              |                  WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
              |                    AND l3.l_shipdate > o_orderdate + INTERVAL '60' DAY)
              |GROUP BY s_name
              |ORDER BY numwait DESC, s_name
              |LIMIT 25""".stripMargin)
    },

    // ── Q22 (adapted): NOT EXISTS + uncorrelated scalar subquery ──
    q("q22_global_sales",
      """SELECT c_nationkey, count(*) AS numcust, round(sum(c_acctbal), 2) AS totacctbal
        |FROM customer
        |WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer WHERE c_acctbal > 0.0)
        |  AND NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey AND o_orderstatus = 'P')
        |GROUP BY c_nationkey
        |ORDER BY c_nationkey""".stripMargin) { (s, _) =>
      s.sql("""SELECT c_nationkey, count(*) AS numcust, round(sum(c_acctbal), 2) AS totacctbal
              |FROM customer
              |WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer WHERE c_acctbal > 0.0)
              |  AND NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey AND o_orderstatus = 'P')
              |GROUP BY c_nationkey
              |ORDER BY c_nationkey""".stripMargin)
    },
  )
}
