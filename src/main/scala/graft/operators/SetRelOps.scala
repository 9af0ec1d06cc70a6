package graft.operators

import graft.QueryGroup
import org.apache.spark.sql.functions._

/** Set operations, UNNEST, TABLESAMPLE and related relational shapes
  * (SURVEY.md §2.7–2.8; reference UnionNode/IntersectNode/ExceptNode,
  * operator/unnest/UnnestOperator.java:48, SampleNode.java:32).
  */
object SetRelOps extends QueryGroup {

  def defs = Seq(
    q("set_union_all",
      """SELECT k, count(*) AS n FROM (
        |  SELECT c_nationkey AS k FROM customer WHERE c_acctbal > 5000
        |  UNION ALL
        |  SELECT s_nationkey AS k FROM supplier
        |) t GROUP BY k ORDER BY k""".stripMargin) { (s, _) =>
      s.table("customer").filter(col("c_acctbal") > 5000).select(col("c_nationkey").as("k"))
        .unionAll(s.table("supplier").select(col("s_nationkey").as("k")))
        .groupBy("k").agg(count(lit(1)).as("n")).orderBy("k")
    },

    q("set_union_distinct",
      """SELECT k FROM (
        |  SELECT c_nationkey AS k FROM customer WHERE c_acctbal > 9000
        |  UNION
        |  SELECT s_nationkey AS k FROM supplier
        |) t ORDER BY k""".stripMargin) { (s, _) =>
      s.table("customer").filter(col("c_acctbal") > 9000).select(col("c_nationkey").as("k"))
        .union(s.table("supplier").select(col("s_nationkey").as("k")))
        .distinct()
        .orderBy("k")
    },

    // INTERSECT / EXCEPT — Catalyst rewrites to semi/anti joins, the same
    // strategy as the reference's ImplementIntersectAndExceptAsUnion
    q("set_intersect",
      """SELECT c_nationkey AS k FROM customer WHERE c_mktsegment = 'BUILDING'
        |INTERSECT
        |SELECT s_nationkey FROM supplier
        |ORDER BY k""".stripMargin) { (s, _) =>
      s.table("customer").filter(col("c_mktsegment") === "BUILDING")
        .select(col("c_nationkey").as("k"))
        .intersect(s.table("supplier").select(col("s_nationkey").as("k")))
        .orderBy("k")
    },

    q("set_except",
      """SELECT c_custkey % 200 AS k FROM customer
        |EXCEPT
        |SELECT s_suppkey FROM supplier
        |ORDER BY k""".stripMargin) { (s, _) =>
      s.table("customer").select((col("c_custkey") % 200).as("k"))
        .except(s.table("supplier").select(col("s_suppkey").as("k")))
        .orderBy("k")
    },

    q("set_intersect_all",
      """SELECT k, count(*) AS n FROM (
        |  SELECT o_custkey AS k FROM orders WHERE o_orderstatus = 'F'
        |  INTERSECT ALL
        |  SELECT o_custkey AS k FROM orders WHERE o_totalprice > 100000.0
        |) t GROUP BY k ORDER BY k""".stripMargin) { (s, _) =>
      s.table("orders").filter(col("o_orderstatus") === "F").select(col("o_custkey").as("k"))
        .intersectAll(s.table("orders").filter(col("o_totalprice") > 100000.0)
          .select(col("o_custkey").as("k")))
        .groupBy("k").agg(count(lit(1)).as("n")).orderBy("k")
    },

    q("set_except_all",
      """SELECT k, count(*) AS n FROM (
        |  SELECT o_custkey AS k FROM orders
        |  EXCEPT ALL
        |  SELECT o_custkey AS k FROM orders WHERE o_orderstatus = 'O'
        |) t GROUP BY k ORDER BY k""".stripMargin) { (s, _) =>
      s.table("orders").select(col("o_custkey").as("k"))
        .exceptAll(s.table("orders").filter(col("o_orderstatus") === "O")
          .select(col("o_custkey").as("k")))
        .groupBy("k").agg(count(lit(1)).as("n")).orderBy("k")
    },

    // UNNEST WITH ORDINALITY ≙ posexplode (reference UnnestOperator.java:48)
    q("unnest_posexplode",
      """SELECT vec_id, generate_subscripts(embedding, 1) - 1 AS pos,
        |  round(CAST(unnest(embedding) AS DOUBLE), 5) AS val
        |FROM embeddings
        |WHERE vec_id < 50
        |ORDER BY vec_id, pos""".stripMargin) { (s, _) =>
      s.table("embeddings").filter(col("vec_id") < 50)
        .select(col("vec_id"), posexplode(col("embedding")).as(Seq("pos", "v")))
        .select(col("vec_id"), col("pos"), round(col("v").cast("double"), 5).as("val"))
        .orderBy("vec_id", "pos")
    },

    // UNNEST + re-aggregation (array → rows → grouped sum)
    q("unnest_reagg",
      """SELECT label, round(sum(CAST(v AS DOUBLE)), 3) AS total, count(*) AS n_vals
        |FROM (SELECT label, unnest(embedding) AS v FROM embeddings) t
        |GROUP BY label
        |ORDER BY label""".stripMargin) { (s, _) =>
      s.table("embeddings")
        .select(col("label"), explode(col("embedding")).as("v"))
        .groupBy("label")
        .agg(round(sum(col("v").cast("double")), 3).as("total"), count(lit(1)).as("n_vals"))
        .orderBy("label")
    },

    // UNNEST of a map → (key, value) rows (reference UnnestOperator.java:48,
    // grammar SqlBase.g4:304). Runs Presto's CROSS JOIN UNNEST … AS t(k, v)
    // surface through the dialect parser (→ LATERAL VIEW explode).
    q("unnest_map",
      """SELECT n_nationkey, 'a' AS k, n_nationkey AS v FROM nation
        |UNION ALL
        |SELECT n_nationkey, 'b' AS k, n_nationkey * 2 AS v FROM nation
        |ORDER BY n_nationkey, k""".stripMargin) { (s, _) =>
      s.sql("""SELECT n_nationkey, t.k, t.v
              |FROM nation
              |CROSS JOIN UNNEST(map_from_arrays(array('a', 'b'),
              |  array(n_nationkey, n_nationkey * 2))) AS t(k, v)
              |ORDER BY n_nationkey, k""".stripMargin)
    },

    // multi-argument UNNEST = positional zip, null-padded to the longest
    // input (UnnestOperator.java:48) — lengths 1..3 vs a fixed 2 exercise
    // padding in both directions
    q("unnest_multiarg",
      """SELECT n_nationkey,
        |  unnest(range(1, n_nationkey % 3 + 2)) AS x,
        |  unnest(['p', 'q']) AS y
        |FROM nation
        |ORDER BY n_nationkey, coalesce(x, 99), y""".stripMargin) { (s, _) =>
      s.sql("""SELECT n_nationkey, t.x, t.y
              |FROM nation
              |CROSS JOIN UNNEST(sequence(1, n_nationkey % 3 + 1), array('p', 'q')) AS t(x, y)
              |ORDER BY n_nationkey, coalesce(x, 99), y""".stripMargin)
    },

    // UNNEST WITH ORDINALITY through the dialect parser's textual form —
    // ordinality 1-based, LAST column, as the reference's grammar places
    // it (SqlBase.g4:304)
    q("unnest_with_ordinality",
      """SELECT vec_id, round(CAST(unnest(embedding) AS DOUBLE), 5) AS val,
        |  CAST(generate_subscripts(embedding, 1) AS BIGINT) AS ord
        |FROM embeddings WHERE vec_id < 30
        |ORDER BY vec_id, ord""".stripMargin) { (s, _) =>
      s.sql("""SELECT vec_id, round(CAST(t.v AS DOUBLE), 5) AS val, t.ord
              |FROM embeddings
              |CROSS JOIN UNNEST(embedding) WITH ORDINALITY AS t(v, ord)
              |WHERE vec_id < 30
              |ORDER BY vec_id, ord""".stripMargin)
    },

    // TABLESAMPLE (reference SampleNode.java:32) — sampling is
    // engine-specific, so the check is rows-only; the spec pins bounds
    qNoOracle("sample_bernoulli") { (s, _) =>
      s.table("lineitem").sample(withReplacement = false, fraction = 0.1, seed = 42L)
        .agg(count(lit(1)).as("n_sampled"))
    },

    // scalar subquery + IN subquery combination
    q("subq_scalar_uncorrelated",
      """SELECT c_nationkey, count(*) AS n_above_avg
        |FROM customer
        |WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer)
        |GROUP BY c_nationkey
        |ORDER BY c_nationkey""".stripMargin) { (s, _) =>
      s.sql("""SELECT c_nationkey, count(*) AS n_above_avg
              |FROM customer
              |WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer)
              |GROUP BY c_nationkey
              |ORDER BY c_nationkey""".stripMargin)
    },

    // correlated scalar subquery in the SELECT list
    q("subq_correlated_select",
      """SELECT n_nationkey, n_name,
        |  (SELECT count(*) FROM customer WHERE c_nationkey = n_nationkey) AS n_cust,
        |  (SELECT round(coalesce(max(s_acctbal), 0.0), 2) FROM supplier
        |   WHERE s_nationkey = n_nationkey) AS top_supp_bal
        |FROM nation
        |ORDER BY n_nationkey""".stripMargin) { (s, _) =>
      s.sql("""SELECT n_nationkey, n_name,
              |  (SELECT count(*) FROM customer WHERE c_nationkey = n_nationkey) AS n_cust,
              |  (SELECT round(coalesce(max(s_acctbal), 0.0), 2) FROM supplier
              |   WHERE s_nationkey = n_nationkey) AS top_supp_bal
              |FROM nation
              |ORDER BY n_nationkey""".stripMargin)
    },

    // LATERAL join (reference ApplyNode/LateralJoinNode, SURVEY.md §2.8)
    q("lateral_join",
      """SELECT n_name, o_orderkey, round(o_totalprice, 2) AS o_totalprice
        |FROM nation,
        |LATERAL (
        |  SELECT o_orderkey, o_totalprice
        |  FROM orders JOIN customer ON o_custkey = c_custkey
        |  WHERE c_nationkey = n_nationkey
        |  ORDER BY o_totalprice DESC, o_orderkey
        |  LIMIT 2) t
        |ORDER BY n_name, o_totalprice DESC, o_orderkey""".stripMargin) { (s, _) =>
      s.sql("""SELECT n_name, o_orderkey, round(o_totalprice, 2) AS o_totalprice
              |FROM nation,
              |LATERAL (
              |  SELECT o_orderkey, o_totalprice
              |  FROM orders JOIN customer ON o_custkey = c_custkey
              |  WHERE c_nationkey = n_nationkey
              |  ORDER BY o_totalprice DESC, o_orderkey
              |  LIMIT 2) t
              |ORDER BY n_name, o_totalprice DESC, o_orderkey""".stripMargin)
    },

    // global sort (no limit) — distributed as range-partitioned sort
    // (reference OrderByOperator.java:30 / MergeOperator.java:44)
    q("sort_global",
      """SELECT o_orderkey, o_orderstatus, round(o_totalprice, 2) AS o_totalprice
        |FROM orders
        |WHERE o_totalprice > 350000.0
        |ORDER BY o_totalprice DESC, o_orderkey""".stripMargin) { (s, _) =>
      s.table("orders").filter(col("o_totalprice") > 350000.0)
        .select(col("o_orderkey"), col("o_orderstatus"), round(col("o_totalprice"), 2).as("o_totalprice"))
        .orderBy(desc("o_totalprice"), col("o_orderkey"))
    },

    // ORDER BY + LIMIT → TakeOrderedAndProject (reference TopNOperator.java:35)
    q("sort_topn",
      """SELECT l_orderkey, l_linenumber, round(l_extendedprice, 2) AS l_extendedprice
        |FROM lineitem
        |ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber
        |LIMIT 100""".stripMargin) { (s, _) =>
      s.table("lineitem")
        .select(col("l_orderkey"), col("l_linenumber"), round(col("l_extendedprice"), 2).as("l_extendedprice"))
        .orderBy(desc("l_extendedprice"), col("l_orderkey"), col("l_linenumber"))
        .limit(100)
    },
  )
}
