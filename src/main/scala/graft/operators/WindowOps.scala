package graft.operators

import graft.QueryGroup
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Window-function coverage (SURVEY.md §2.5; reference
  * operator/WindowOperator.java:47, frame spec WindowNode.java:325-337,
  * ranking/value functions under operator/window/).
  *
  * Scale: every window here partitions on a real key (nation / customer /
  * supplier) so partitions parallelize; none uses an empty PARTITION BY
  * over the full fact table (the classic single-task window trap).
  */
object WindowOps extends QueryGroup {

  def defs = Seq(
    // ranking family — ties handled identically in Spark/DuckDB
    q("win_ranking",
      """SELECT c_nationkey, c_custkey,
        |  row_number() OVER (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey) AS rn,
        |  rank()       OVER (PARTITION BY c_nationkey ORDER BY c_mktsegment) AS rnk,
        |  dense_rank() OVER (PARTITION BY c_nationkey ORDER BY c_mktsegment) AS drnk,
        |  round(percent_rank() OVER (PARTITION BY c_nationkey ORDER BY c_mktsegment), 6) AS prnk,
        |  round(cume_dist()    OVER (PARTITION BY c_nationkey ORDER BY c_mktsegment), 6) AS cd,
        |  ntile(4) OVER (PARTITION BY c_nationkey ORDER BY c_custkey) AS quartile
        |FROM customer
        |ORDER BY c_nationkey, c_custkey""".stripMargin) { (s, _) =>
      val byBal = Window.partitionBy("c_nationkey").orderBy(desc("c_acctbal"), col("c_custkey"))
      val bySeg = Window.partitionBy("c_nationkey").orderBy("c_mktsegment")
      val byKey = Window.partitionBy("c_nationkey").orderBy("c_custkey")
      s.table("customer").select(
        col("c_nationkey"), col("c_custkey"),
        row_number().over(byBal).as("rn"),
        rank().over(bySeg).as("rnk"),
        dense_rank().over(bySeg).as("drnk"),
        round(percent_rank().over(bySeg), 6).as("prnk"),
        round(cume_dist().over(bySeg), 6).as("cd"),
        ntile(4).over(byKey).as("quartile"))
        .orderBy("c_nationkey", "c_custkey")
    },

    // value functions: lag/lead with defaults, first/last/nth over a full
    // frame (reference LagFunction.java, NthValueFunction.java …)
    q("win_value_funcs",
      """SELECT o_custkey, o_orderkey,
        |  round(lag(o_totalprice, 1, 0.0)  OVER w, 2) AS prev_price,
        |  round(lead(o_totalprice, 1, 0.0) OVER w, 2) AS next_price,
        |  round(first_value(o_totalprice) OVER w2, 2) AS first_price,
        |  round(last_value(o_totalprice)  OVER w2, 2) AS last_price,
        |  round(nth_value(o_totalprice, 2) OVER w2, 2) AS second_price
        |FROM orders
        |WINDOW w  AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey),
        |       w2 AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |              ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
        |ORDER BY o_custkey, o_orderkey""".stripMargin) { (s, _) =>
      val w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
      val w2 = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      s.table("orders").select(
        col("o_custkey"), col("o_orderkey"),
        round(lag(col("o_totalprice"), 1, 0.0).over(w), 2).as("prev_price"),
        round(lead(col("o_totalprice"), 1, 0.0).over(w), 2).as("next_price"),
        round(first_value(col("o_totalprice")).over(w2), 2).as("first_price"),
        round(last_value(col("o_totalprice")).over(w2), 2).as("last_price"),
        round(nth_value(col("o_totalprice"), 2).over(w2), 2).as("second_price"))
        .orderBy("o_custkey", "o_orderkey")
    },

    // ROWS frames: running total + moving average
    // (reference FrameInfo.java:25)
    q("win_rows_frames",
      """SELECT o_custkey, o_orderkey,
        |  round(sum(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_total,
        |  round(avg(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |        ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 4) AS moving_avg3,
        |  count(*) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |        ROWS BETWEEN 1 PRECEDING AND 1 FOLLOWING) AS neighbors
        |FROM orders
        |ORDER BY o_custkey, o_orderkey""".stripMargin) { (s, _) =>
      val w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
      s.table("orders").select(
        col("o_custkey"), col("o_orderkey"),
        round(sum("o_totalprice").over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)), 2)
          .as("running_total"),
        round(avg("o_totalprice").over(w.rowsBetween(-2, Window.currentRow)), 4).as("moving_avg3"),
        count(lit(1)).over(w.rowsBetween(-1, 1)).as("neighbors"))
        .orderBy("o_custkey", "o_orderkey")
    },

    // RANGE frame with a numeric offset (value-based peers)
    q("win_range_frame",
      """SELECT s_nationkey, s_suppkey,
        |  count(*) OVER (PARTITION BY s_nationkey ORDER BY s_acctbal
        |        RANGE BETWEEN 1000.0 PRECEDING AND 1000.0 FOLLOWING) AS peers_within_1k
        |FROM supplier
        |ORDER BY s_nationkey, s_suppkey""".stripMargin) { (s, _) =>
      s.sql("""SELECT s_nationkey, s_suppkey,
              |  count(*) OVER (PARTITION BY s_nationkey ORDER BY s_acctbal
              |        RANGE BETWEEN 1000.0 PRECEDING AND 1000.0 FOLLOWING) AS peers_within_1k
              |FROM supplier
              |ORDER BY s_nationkey, s_suppkey""".stripMargin)
    },

    // aggregate-over-partition without ORDER BY: ratio-to-total
    // (reference AggregateWindowFunction.java)
    q("win_ratio_to_total",
      """SELECT c_nationkey, c_custkey,
        |  round(c_acctbal / sum(c_acctbal) OVER (PARTITION BY c_nationkey), 6) AS bal_share,
        |  count(*) OVER (PARTITION BY c_nationkey) AS nation_size
        |FROM customer
        |WHERE c_acctbal > 0
        |ORDER BY c_nationkey, c_custkey""".stripMargin) { (s, _) =>
      val w = Window.partitionBy("c_nationkey")
      s.table("customer").filter(col("c_acctbal") > 0).select(
        col("c_nationkey"), col("c_custkey"),
        round(col("c_acctbal") / sum("c_acctbal").over(w), 6).as("bal_share"),
        count(lit(1)).over(w).as("nation_size"))
        .orderBy("c_nationkey", "c_custkey")
    },

    // top-N per group: rank + filter → Spark plans WindowGroupLimit
    // (reference TopNRowNumberOperator.java:38)
    q("win_topn_per_group",
      """SELECT * FROM (
        |  SELECT c_nationkey, c_custkey, round(c_acctbal, 2) AS c_acctbal,
        |    row_number() OVER (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey) AS rn
        |  FROM customer) t
        |WHERE rn <= 3
        |ORDER BY c_nationkey, rn""".stripMargin) { (s, _) =>
      val w = Window.partitionBy("c_nationkey").orderBy(desc("c_acctbal"), col("c_custkey"))
      s.table("customer")
        .select(col("c_nationkey"), col("c_custkey"),
          round(col("c_acctbal"), 2).as("c_acctbal"),
          row_number().over(w).as("rn"))
        .filter(col("rn") <= 3)
        .orderBy("c_nationkey", "rn")
    },

    // IGNORE NULLS variants of lag / lead / first_value / last_value
    // (reference operator/window/LagFunction.java et al. — load-bearing in
    // real sessionization SQL: "carry forward the last non-null reading")
    q("win_ignore_nulls",
      """WITH e AS (
        |  SELECT event_id, user_id, ts,
        |    CASE WHEN event_type = 'click' THEN NULL ELSE round(value, 4) END AS v
        |  FROM events)
        |SELECT event_id,
        |  lag(v IGNORE NULLS) OVER w AS prev_v,
        |  lead(v IGNORE NULLS) OVER w AS next_v,
        |  first_value(v IGNORE NULLS) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS first_v,
        |  last_value(v IGNORE NULLS) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS carry_v
        |FROM e
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        |ORDER BY event_id""".stripMargin) { (s, _) =>
      s.sql("""WITH e AS (
              |  SELECT event_id, user_id, ts,
              |    CASE WHEN event_type = 'click' THEN NULL ELSE round(value, 4) END AS v
              |  FROM events)
              |SELECT event_id,
              |  lag(v) IGNORE NULLS OVER w AS prev_v,
              |  lead(v) IGNORE NULLS OVER w AS next_v,
              |  first_value(v) IGNORE NULLS OVER (PARTITION BY user_id ORDER BY ts, event_id
              |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS first_v,
              |  last_value(v) IGNORE NULLS OVER (PARTITION BY user_id ORDER BY ts, event_id
              |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS carry_v
              |FROM e
              |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
              |ORDER BY event_id""".stripMargin)
    },
  )
}
