package graft.operators

/** Deterministic extension of the slim driver fixture (TESTDATA.md) to
  * the FULL TPC-H schema the reference's benchto texts expect — the
  * missing columns (mfgr, container, shipmode, commitdate, phone, …) and
  * the whole `partsupp` table are derived from the key columns with pure
  * arithmetic, the way the reference's tpch connector generates rows from
  * keys on the fly (presto-tpch/.../TpchMetadata.java, and the dbgen
  * formulas in the TPC-H spec §4.2).
  *
  * The SAME derivation text builds both sides of the correctness gate:
  *  - Spark: `CREATE VIEW tpch.<t> AS <tableSql(t, parquetRef)>` — the
  *    catalog database the verbatim texts resolve against;
  *  - DuckDB oracle: `WITH tpch_<t> AS (<tableSql(t, identity)>) …`.
  * One source, zero drift: any formula change flows to both engines.
  *
  * Scale note: every derivation is a per-row projection (codegen'd, no
  * shuffle, no state), so the views add nothing to the scan cost at
  * 100 TB; `partsupp` is part ⨯ 4 via a 4-row inline table — a flatMap,
  * not a join.
  */
object TpchSynth {

  /** All benchto-visible tables, partsupp last (derived from part+supplier). */
  val tables: Seq[String] = Seq("region", "nation", "supplier", "customer",
    "part", "orders", "lineitem", "partsupp")

  private def phone(nationkey: String, key: String): String =
    s"CAST($nationkey + 10 AS VARCHAR(2)) || '-555-' || " +
      s"lpad(CAST($key % 10000 AS VARCHAR(4)), 4, '0')"

  /** Connector-style SELECT producing the full TPC-H column set with
    * unprefixed names; `ref(table)` supplies the FROM-clause reference
    * for a base fixture table.
    */
  def tableSql(table: String, ref: String => String): String = table match {
    case "region" =>
      s"SELECT r_regionkey AS regionkey, r_name AS name FROM ${ref("region")}"

    case "nation" =>
      s"SELECT n_nationkey AS nationkey, n_name AS name, n_regionkey AS regionkey FROM ${ref("nation")}"

    case "supplier" =>
      s"""SELECT s_suppkey AS suppkey, s_name AS name, s_nationkey AS nationkey,
         |  s_acctbal AS acctbal,
         |  'addr ' || CAST(s_suppkey AS VARCHAR(12)) AS address,
         |  ${phone("s_nationkey", "s_suppkey")} AS phone,
         |  CASE WHEN s_suppkey % 13 = 0 THEN 'waits Customer bold Complaints sleep'
         |       ELSE 'furiously regular packages nod' END AS comment
         |FROM ${ref("supplier")}""".stripMargin

    case "customer" =>
      s"""SELECT c_custkey AS custkey, c_name AS name, c_nationkey AS nationkey,
         |  c_acctbal AS acctbal, c_mktsegment AS mktsegment,
         |  'addr ' || CAST(c_custkey AS VARCHAR(12)) AS address,
         |  ${phone("c_nationkey", "c_custkey")} AS phone,
         |  CASE WHEN c_custkey % 11 = 0 THEN 'accounts sleep special requests linger'
         |       ELSE 'carefully ironic accounts wake' END AS comment
         |FROM ${ref("customer")}""".stripMargin

    case "part" =>
      // container: (k%5, k%6) is a bijection onto the 30 size×shape
      // combos (CRT) — every TPC-H container value occurs
      s"""SELECT p_partkey AS partkey, p_name AS name, p_brand AS brand,
         |  p_type AS type, p_size AS size, p_retailprice AS retailprice,
         |  'Manufacturer#' || CAST(p_partkey % 5 + 1 AS VARCHAR(1)) AS mfgr,
         |  CASE CAST(p_partkey % 5 AS INT) WHEN 0 THEN 'SM' WHEN 1 THEN 'MED'
         |       WHEN 2 THEN 'LG' WHEN 3 THEN 'JUMBO' ELSE 'WRAP' END || ' ' ||
         |  CASE CAST(p_partkey % 6 AS INT) WHEN 0 THEN 'CASE' WHEN 1 THEN 'BOX'
         |       WHEN 2 THEN 'BAG' WHEN 3 THEN 'PKG' WHEN 4 THEN 'PACK'
         |       ELSE 'JAR' END AS container
         |FROM ${ref("part")}""".stripMargin

    case "orders" =>
      // o_shippriority is the constant 0 in dbgen output (TPC-H §4.2.3)
      s"""SELECT o_orderkey AS orderkey, o_custkey AS custkey,
         |  o_orderstatus AS orderstatus, o_totalprice AS totalprice,
         |  o_orderdate AS orderdate, o_orderpriority AS orderpriority,
         |  0 AS shippriority,
         |  CASE WHEN o_orderkey % 23 = 0 THEN 'blithely special requests haggle'
         |       ELSE 'quickly final deposits boost' END AS comment
         |FROM ${ref("orders")}""".stripMargin

    case "lineitem" =>
      s"""SELECT l_orderkey AS orderkey, l_partkey AS partkey,
         |  l_suppkey AS suppkey, l_linenumber AS linenumber,
         |  l_quantity AS quantity, l_extendedprice AS extendedprice,
         |  l_discount AS discount, l_tax AS tax, l_returnflag AS returnflag,
         |  l_linestatus AS linestatus, l_shipdate AS shipdate,
         |  l_shipdate + (CAST((l_orderkey * 3 + l_linenumber * 7) % 41 AS INT) - 20) * INTERVAL '1' DAY AS commitdate,
         |  l_shipdate + (CAST((l_orderkey * 5 + l_linenumber * 11) % 30 AS INT) + 1) * INTERVAL '1' DAY AS receiptdate,
         |  CASE CAST((l_orderkey + l_linenumber) % 7 AS INT) WHEN 0 THEN 'REG AIR'
         |       WHEN 1 THEN 'AIR' WHEN 2 THEN 'RAIL' WHEN 3 THEN 'SHIP'
         |       WHEN 4 THEN 'TRUCK' WHEN 5 THEN 'MAIL' ELSE 'FOB' END AS shipmode,
         |  CASE CAST((l_orderkey + l_linenumber * 3) % 4 AS INT)
         |       WHEN 0 THEN 'DELIVER IN PERSON' WHEN 1 THEN 'COLLECT COD'
         |       WHEN 2 THEN 'NONE' ELSE 'TAKE BACK RETURN' END AS shipinstruct
         |FROM ${ref("lineitem")}""".stripMargin

    case "partsupp" =>
      // 4 suppliers per part (dbgen's SUPP_PER_PART), suppkeys spread by a
      // stride coprime to the 0-based supplier count; costs/quantities are
      // key-hash arithmetic. Scale: a flatMap over part — no join, no
      // shuffle, never materialized.
      s"""SELECT p_partkey AS partkey,
         |  CAST((p_partkey * 7 + i.n * 13) % (SELECT count(*) FROM ${ref("supplier")}) AS BIGINT) AS suppkey,
         |  CAST((p_partkey * 31 + i.n * 17) % 9999 + 1 AS INT) AS availqty,
         |  CAST((p_partkey * 53 + i.n * 29) % 90000 AS DOUBLE) / 100.0 + 1.0 AS supplycost
         |FROM ${ref("part")} CROSS JOIN
         |  (SELECT 0 AS n UNION ALL SELECT 1 UNION ALL SELECT 2 UNION ALL SELECT 3) i""".stripMargin
  }

  /** DuckDB CTE preamble: `tpch_region AS (…), …` over the driver's
    * registered fixture tables (identity refs).
    */
  def duckCtePreamble: String =
    tables.map(t => s"tpch_$t AS (\n${tableSql(t, identity)}\n)").mkString("WITH ", ",\n", "\n")

  /** Prefixed-name twin of a synthesized column set, for engine-side temp
    * views that keep fixture naming (`ps_partkey` etc. — used by the
    * adapted q02/q09/q11/q16/q20 shapes in TpchQueries).
    */
  def partsuppPrefixedSql(ref: String => String): String =
    s"""SELECT partkey AS ps_partkey, suppkey AS ps_suppkey,
       |  availqty AS ps_availqty, supplycost AS ps_supplycost
       |FROM (${tableSql("partsupp", ref)}) ps""".stripMargin
}
