package graft.operators

import graft.QueryGroup
import org.apache.spark.sql.functions._

/** Join-strategy coverage (SURVEY.md §2.3). The reference implements
  * hash join (LookupJoinOperator.java:53), semi join
  * (HashSemiJoinOperator.java:32), nested-loop/cross
  * (NestedLoopJoinOperator.java:36) and outer variants
  * (LookupOuterOperator.java:32). Here Catalyst picks
  * Broadcast/ShuffledHash/SortMerge per statistics; dims are explicitly
  * broadcast where we know they're tiny (the 100 TB plan: never shuffle a
  * fact table against a 25-row dim).
  */
object JoinOps extends QueryGroup {

  def defs = Seq(
    // plain equi inner join, fact ⨝ fact: shuffles both sides on the key
    q("join_inner",
      """SELECT o_orderstatus, count(*) AS n, round(sum(l_quantity), 2) AS qty
        |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        |GROUP BY o_orderstatus
        |ORDER BY o_orderstatus""".stripMargin) { (s, _) =>
      s.table("orders").join(s.table("lineitem"), col("o_orderkey") === col("l_orderkey"))
        .groupBy("o_orderstatus")
        .agg(count(lit(1)).as("n"), round(sum("l_quantity"), 2).as("qty"))
        .orderBy("o_orderstatus")
    },

    // broadcast join: 25-row dim replicated to every task, zero shuffle
    // of the probe side (reference REPLICATED distribution,
    // JoinNode.java:37-38)
    q("join_broadcast_dim",
      """SELECT n_name, count(*) AS n_cust, round(avg(c_acctbal), 4) AS avg_bal
        |FROM customer JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY n_name
        |ORDER BY n_name""".stripMargin) { (s, _) =>
      s.table("customer")
        .join(broadcast(s.table("nation")), col("c_nationkey") === col("n_nationkey"))
        .groupBy("n_name")
        .agg(count(lit(1)).as("n_cust"), round(avg("c_acctbal"), 4).as("avg_bal"))
        .orderBy("n_name")
    },

    // LEFT OUTER with a join-side filter (nulls preserved)
    q("join_left_outer",
      """SELECT c_custkey, count(o_orderkey) AS n_open
        |FROM customer
        |LEFT OUTER JOIN orders ON c_custkey = o_custkey AND o_orderstatus = 'O'
        |GROUP BY c_custkey
        |ORDER BY c_custkey""".stripMargin) { (s, _) =>
      s.table("customer")
        .join(s.table("orders").filter(col("o_orderstatus") === "O"),
          col("c_custkey") === col("o_custkey"), "left_outer")
        .groupBy("c_custkey")
        .agg(count(col("o_orderkey")).as("n_open"))
        .orderBy("c_custkey")
    },

    // RIGHT OUTER (probe/build roles swapped)
    q("join_right_outer",
      """SELECT n_nationkey, n_name, count(s_suppkey) AS n_supp
        |FROM supplier
        |RIGHT OUTER JOIN nation ON s_nationkey = n_nationkey
        |GROUP BY n_nationkey, n_name
        |ORDER BY n_nationkey""".stripMargin) { (s, _) =>
      s.table("supplier")
        .join(s.table("nation"), col("s_nationkey") === col("n_nationkey"), "right_outer")
        .groupBy("n_nationkey", "n_name")
        .agg(count(col("s_suppkey")).as("n_supp"))
        .orderBy("n_nationkey")
    },

    // FULL OUTER of two aggregated sides
    q("join_full_outer",
      """SELECT coalesce(c.k, s.k) AS nationkey,
        |  coalesce(c.n_cust, 0) AS n_cust, coalesce(s.n_supp, 0) AS n_supp
        |FROM (SELECT c_nationkey AS k, count(*) AS n_cust FROM customer GROUP BY 1) c
        |FULL OUTER JOIN (SELECT s_nationkey AS k, count(*) AS n_supp FROM supplier GROUP BY 1) s
        |  ON c.k = s.k
        |ORDER BY nationkey""".stripMargin) { (s, _) =>
      val custs = s.table("customer").groupBy(col("c_nationkey").as("ck"))
        .agg(count(lit(1)).as("n_cust"))
      val supps = s.table("supplier").groupBy(col("s_nationkey").as("sk"))
        .agg(count(lit(1)).as("n_supp"))
      custs.join(supps, col("ck") === col("sk"), "full_outer")
        .select(
          coalesce(col("ck"), col("sk")).as("nationkey"),
          coalesce(col("n_cust"), lit(0)).as("n_cust"),
          coalesce(col("n_supp"), lit(0)).as("n_supp"))
        .orderBy("nationkey")
    },

    // LEFT SEMI (EXISTS) — reference HashSemiJoinOperator.java:32
    q("join_semi",
      """SELECT count(*) AS n_cust_with_urgent
        |FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders
        |              WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')""".stripMargin) { (s, _) =>
      s.table("customer")
        .join(s.table("orders").filter(col("o_orderpriority") === "1-URGENT"),
          col("c_custkey") === col("o_custkey"), "left_semi")
        .agg(count(lit(1)).as("n_cust_with_urgent"))
    },

    // LEFT ANTI (NOT EXISTS)
    q("join_anti",
      """SELECT c_nationkey, count(*) AS n_cust_no_orders
        |FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders
        |                  WHERE o_custkey = c_custkey AND o_orderstatus = 'P')
        |GROUP BY c_nationkey
        |ORDER BY c_nationkey""".stripMargin) { (s, _) =>
      s.table("customer")
        .join(s.table("orders").filter(col("o_orderstatus") === "P"),
          col("c_custkey") === col("o_custkey"), "left_anti")
        .groupBy("c_nationkey")
        .agg(count(lit(1)).as("n_cust_no_orders"))
        .orderBy("c_nationkey")
    },

    // NULL-aware NOT IN (3-valued semantics — reference's null-aware
    // anti join, SURVEY.md §2.3)
    q("join_not_in",
      """SELECT count(*) AS n
        |FROM customer
        |WHERE c_custkey NOT IN (SELECT o_custkey FROM orders WHERE o_orderstatus = 'P')""".stripMargin) { (s, _) =>
      s.sql("""SELECT count(*) AS n
              |FROM customer
              |WHERE c_custkey NOT IN (SELECT o_custkey FROM orders WHERE o_orderstatus = 'P')""".stripMargin)
    },

    // CROSS join (reference NestedLoopJoinOperator.java:36)
    q("join_cross",
      """SELECT r_name, n_name FROM region CROSS JOIN nation
        |ORDER BY r_name, n_name""".stripMargin) { (s, _) =>
      s.table("region").crossJoin(s.table("nation"))
        .select("r_name", "n_name")
        .orderBy("r_name", "n_name")
    },

    // theta (inequality) join — planned as nested-loop + filter, like the
    // reference's cross-join-with-filter
    q("join_theta",
      """SELECT a.n_name AS n1, b.n_name AS n2
        |FROM nation a JOIN nation b ON a.n_nationkey < b.n_nationkey
        |  AND a.n_regionkey = b.n_regionkey
        |ORDER BY n1, n2""".stripMargin) { (s, _) =>
      val a = s.table("nation").select(col("n_nationkey").as("ak"),
        col("n_regionkey").as("ar"), col("n_name").as("n1"))
      val b = s.table("nation").select(col("n_nationkey").as("bk"),
        col("n_regionkey").as("br"), col("n_name").as("n2"))
      a.join(b, col("ak") < col("bk") && col("ar") === col("br"))
        .select("n1", "n2").orderBy("n1", "n2")
    },

    // As-of join (point-in-time lookup): for each left event, the most
    // recent right event at-or-before its timestamp, per key. Spark has
    // no ASOF operator and the naive range-join spelling
    // (b.ts <= a.ts → max) expands pairwise in hot keys — quadratic
    // under skew. The scale-safe plan is union + ordered window: tag
    // both sides, merge each key's timeline with ONE shuffle on the
    // key, and carry the latest right payload forward with
    // last(ignore nulls) over rows UNBOUNDED PRECEDING..CURRENT. Cost
    // is O(n log n) sort within partitions, zero pairwise expansion at
    // any skew. Right rows sort before left rows at equal ts, so an
    // exactly-simultaneous right row matches (ASOF `>=` semantics);
    // the fixture has no (user_id, ts) duplicates, so the match is
    // deterministic. Oracle: DuckDB's native ASOF LEFT JOIN.
    q("join_asof",
      """SELECT c.user_id, c.event_id AS click_id, e.event_id AS err_id,
        |  CAST(date_diff('second', e.ts, c.ts) AS BIGINT) AS err_gap_s,
        |  round(e.value, 2) AS err_value
        |FROM (SELECT * FROM events WHERE event_type = 'click') c
        |ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'error') e
        |  ON c.user_id = e.user_id AND c.ts >= e.ts
        |ORDER BY c.user_id, click_id""".stripMargin) { (s, _) =>
      import org.apache.spark.sql.expressions.Window
      val ev = s.table("events")
      val errs = ev.filter(col("event_type") === "error")
        .select(col("user_id"), col("ts"), lit(0).as("side"),
          lit(null).cast("bigint").as("click_id"),
          struct(col("event_id").as("id"), col("ts").as("ts"),
            col("value").as("v")).as("err"))
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("user_id"), col("ts"), lit(1).as("side"),
          col("event_id").as("click_id"),
          lit(null).cast(errs.schema("err").dataType).as("err"))
      val w = Window.partitionBy("user_id")
        .orderBy(col("ts"), col("side"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      errs.unionByName(clicks)
        .withColumn("e", last(col("err"), ignoreNulls = true).over(w))
        .filter(col("click_id").isNotNull)
        .select(col("user_id"), col("click_id"), col("e.id").as("err_id"),
          (unix_timestamp(col("ts")) - unix_timestamp(col("e.ts"))).as("err_gap_s"),
          round(col("e.v"), 2).as("err_value"))
        .orderBy("user_id", "click_id")
    },

    // IN-subquery in a disjunction → ExistenceJoin (can't be planned as
    // a plain semi join)
    q("join_existence",
      """SELECT count(*) AS n
        |FROM customer
        |WHERE c_acctbal > 9900.0
        |   OR c_custkey IN (SELECT o_custkey FROM orders WHERE o_totalprice > 400000.0)""".stripMargin) { (s, _) =>
      s.sql("""SELECT count(*) AS n
              |FROM customer
              |WHERE c_acctbal > 9900.0
              |   OR c_custkey IN (SELECT o_custkey FROM orders WHERE o_totalprice > 400000.0)""".stripMargin)
    },
  )
}
