package graft.operators

import org.apache.spark.sql.SparkSession

import graft.{QueryDef, QueryGroup, Tables}

/** Runs reference benchto SQL texts VERBATIM through the engine —
  * double-quoted identifiers, `DATE '…' + INTERVAL '…' YEAR` arithmetic,
  * unprefixed TPC-H column names, three-part `"db"."schema"."table"`
  * references and all (reference:
  * presto-benchto-benchmarks/src/main/resources/sql/presto/tpch/q*.sql).
  * The only preprocessing is what benchto itself does before submitting:
  * substituting the `${database}`/`${schema}`/`${prefix}` template
  * variables. Each text is then wrapped in an outer SELECT that rounds
  * float aggregates (output normalization for the DuckDB comparison —
  * the inner text stays byte-identical).
  *
  * The unprefixed column names resolve through a `tpch` catalog database
  * of views over the driver parquet (`l_extendedprice` → `extendedprice`
  * etc.) — the same connector-style mapping the reference's tpch
  * connector performs (presto-tpch/.../TpchMetadata.java).
  *
  * Note q05/q06 predicates select the TPC-H-spec 1994 window, which is
  * empty in the driver fixture (dates start 1995) — kept verbatim anyway
  * (the empty result is still oracle-compared); `dialect_q06_shifted`
  * repeats q06 over 1996 for a non-trivial value check.
  */
object DialectOps extends QueryGroup {

  /** table → (viewColumn → fixtureColumn) */
  private val tpchTables: Seq[(String, Seq[String])] = Seq(
    "lineitem" -> Seq("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
      "l_quantity", "l_extendedprice", "l_discount", "l_tax", "l_returnflag",
      "l_linestatus", "l_shipdate"),
    "orders" -> Seq("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
      "o_orderdate", "o_orderpriority"),
    "customer" -> Seq("c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment"),
    "part" -> Seq("p_partkey", "p_name", "p_brand", "p_type", "p_size", "p_retailprice"),
    "supplier" -> Seq("s_suppkey", "s_name", "s_nationkey", "s_acctbal"),
    "nation" -> Seq("n_nationkey", "n_name", "n_regionkey"),
    "region" -> Seq("r_regionkey", "r_name"))

  private val viewsFor =
    new java.util.concurrent.ConcurrentHashMap[SparkSession, String]()

  /** Permanent views with connector-style unprefixed columns; memoized
    * per (session, dir) like Tables.register.
    */
  private def ensureTpchViews(spark: SparkSession, dir: String): Unit = {
    if (viewsFor.put(spark, dir) != dir) {
      spark.sql("CREATE DATABASE IF NOT EXISTS tpch")
      tpchTables.foreach { case (table, cols) =>
        val select = cols
          .map(c => s"$c AS ${c.substring(c.indexOf('_') + 1)}")
          .mkString(", ")
        spark.sql(
          s"CREATE OR REPLACE VIEW tpch.$table AS SELECT $select FROM parquet.`$dir/$table.parquet`")
      }
    }
  }

  /** benchto's template substitution (the step its runner performs before
    * submitting the text to the engine).
    */
  private def substitute(text: String): String = text
    .replace("${database}", "spark_catalog")
    .replace("${schema}", "tpch")
    .replace("${prefix}", "")

  private def verbatim(name: String, oracle: String, text: String, wrap: String => String): QueryDef =
    QueryDef(name, Some(oracle), (s, dir) => {
      Tables.register(s, dir)
      ensureTpchViews(s, dir)
      s.sql(wrap(s"( ${substitute(text)} )"))
    })

  // reference sql/presto/tpch/q01.sql — byte-identical text
  private val q01Text =
    """SELECT
      |  l.returnflag,
      |  l.linestatus,
      |  sum(l.quantity)                                       AS sum_qty,
      |  sum(l.extendedprice)                                  AS sum_base_price,
      |  sum(l.extendedprice * (1 - l.discount))               AS sum_disc_price,
      |  sum(l.extendedprice * (1 - l.discount) * (1 + l.tax)) AS sum_charge,
      |  avg(l.quantity)                                       AS avg_qty,
      |  avg(l.extendedprice)                                  AS avg_price,
      |  avg(l.discount)                                       AS avg_disc,
      |  count(*)                                              AS count_order
      |FROM
      |  "${database}"."${schema}"."${prefix}lineitem" AS l
      |WHERE
      |  l.shipdate <= DATE '1998-12-01' - INTERVAL '90' DAY
      |GROUP BY
      |  l.returnflag,
      |  l.linestatus
      |ORDER BY
      |  l.returnflag,
      |  l.linestatus""".stripMargin

  // reference sql/presto/tpch/q05.sql
  private val q05Text =
    """SELECT
      |  n.name,
      |  sum(l.extendedprice * (1 - l.discount)) AS revenue
      |FROM
      |  "${database}"."${schema}"."${prefix}customer" AS c,
      |  "${database}"."${schema}"."${prefix}orders" AS o,
      |  "${database}"."${schema}"."${prefix}lineitem" AS l,
      |  "${database}"."${schema}"."${prefix}supplier" AS s,
      |  "${database}"."${schema}"."${prefix}nation" AS n,
      |  "${database}"."${schema}"."${prefix}region" AS r
      |WHERE
      |  c.custkey = o.custkey
      |  AND l.orderkey = o.orderkey
      |  AND l.suppkey = s.suppkey
      |  AND c.nationkey = s.nationkey
      |  AND s.nationkey = n.nationkey
      |  AND n.regionkey = r.regionkey
      |  AND r.name = 'ASIA'
      |  AND o.orderdate >= DATE '1994-01-01'
      |  AND o.orderdate < DATE '1994-01-01' + INTERVAL '1' YEAR
      |GROUP BY
      |  n.name
      |ORDER BY
      |  revenue DESC""".stripMargin

  // reference sql/presto/tpch/q06.sql
  private val q06Text =
    """SELECT
      |  sum(l.extendedprice*l.discount) AS revenue
      |FROM
      |  "${database}"."${schema}"."${prefix}lineitem" l
      |WHERE
      |  l.shipdate >= DATE '1994-01-01'
      |  AND l.shipdate < DATE '1994-01-01' + INTERVAL '1' YEAR
      |  AND l.discount BETWEEN .06 - 0.01 AND .06 + 0.01
      |  AND l.quantity < 24""".stripMargin

  // reference sql/presto/tpch/q14.sql
  private val q14Text =
    """SELECT 100.00 * sum(CASE
      |                    WHEN p.type LIKE 'PROMO%'
      |                      THEN l.extendedprice * (1 - l.discount)
      |                    ELSE 0
      |                    END) / sum(l.extendedprice * (1 - l.discount)) AS promo_revenue
      |FROM
      |  "${database}"."${schema}"."${prefix}lineitem" AS l,
      |  "${database}"."${schema}"."${prefix}part" AS p
      |WHERE
      |  l.partkey = p.partkey
      |  AND l.shipdate >= DATE '1995-09-01'
      |  AND l.shipdate < DATE '1995-09-01' + INTERVAL '1' MONTH""".stripMargin

  def defs = Seq(
    verbatim("dialect_q01_verbatim",
      """SELECT l_returnflag AS returnflag, l_linestatus AS linestatus,
        |  round(sum(l_quantity), 2) AS sum_qty,
        |  round(sum(l_extendedprice), 2) AS sum_base_price,
        |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
        |  round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
        |  round(avg(l_quantity), 4) AS avg_qty,
        |  round(avg(l_extendedprice), 4) AS avg_price,
        |  round(avg(l_discount), 4) AS avg_disc,
        |  count(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-12-01' - INTERVAL 90 DAY
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
      q01Text,
      inner => s"""SELECT returnflag, linestatus,
                  |  round(sum_qty, 2) AS sum_qty,
                  |  round(sum_base_price, 2) AS sum_base_price,
                  |  round(sum_disc_price, 2) AS sum_disc_price,
                  |  round(sum_charge, 2) AS sum_charge,
                  |  round(avg_qty, 4) AS avg_qty,
                  |  round(avg_price, 4) AS avg_price,
                  |  round(avg_disc, 4) AS avg_disc,
                  |  count_order
                  |FROM $inner
                  |ORDER BY returnflag, linestatus""".stripMargin),

    verbatim("dialect_q05_verbatim",
      """SELECT n_name AS name, round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
        |FROM customer, orders, lineitem, supplier, nation, region
        |WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
        |  AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        |  AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
        |  AND r_name = 'ASIA'
        |  AND o_orderdate >= TIMESTAMP '1994-01-01'
        |  AND o_orderdate < TIMESTAMP '1995-01-01'
        |GROUP BY n_name ORDER BY revenue DESC""".stripMargin,
      q05Text,
      inner => s"SELECT name, round(revenue, 2) AS revenue FROM $inner ORDER BY revenue DESC, name"),

    verbatim("dialect_q06_verbatim",
      """SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1994-01-01' AND l_shipdate < TIMESTAMP '1995-01-01'
        |  AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24""".stripMargin,
      q06Text,
      inner => s"SELECT round(revenue, 2) AS revenue FROM $inner"),

    // q06 again with the date window shifted into the fixture's range —
    // same verbatim dialect surface, non-empty result
    verbatim("dialect_q06_shifted",
      """SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
        |  AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24""".stripMargin,
      q06Text.replace("1994-01-01", "1996-01-01"),
      inner => s"SELECT round(revenue, 2) AS revenue FROM $inner"),

    verbatim("dialect_q14_verbatim",
      """SELECT round(100.00 * sum(CASE WHEN p_type LIKE 'PROMO%'
        |    THEN l_extendedprice * (1 - l_discount) ELSE 0 END)
        |  / sum(l_extendedprice * (1 - l_discount)), 4) AS promo_revenue
        |FROM lineitem, part
        |WHERE l_partkey = p_partkey
        |  AND l_shipdate >= TIMESTAMP '1995-09-01' AND l_shipdate < TIMESTAMP '1995-10-01'""".stripMargin,
      q14Text,
      inner => s"SELECT round(promo_revenue, 4) AS promo_revenue FROM $inner"),
  )
}
