package graft.operators

/** Deterministic TPC-DS schema synthesized from the slim TPC-H fixture —
  * the same connector-style trick as [[TpchSynth]]: every TPC-DS table the
  * adapted benchto corpus needs (reference:
  * presto-benchto-benchmarks/src/main/resources/sql/presto/tpcds/q*.sql)
  * is a pure per-row projection over a fixture table (or a small
  * cross-product against an inline digit series), derived with key
  * arithmetic only. The SAME derivation text builds both sides of the
  * correctness gate:
  *
  *  - Spark: `CREATE VIEW tpcds.<t> AS <tableSql(t, parquetRef)>`;
  *  - DuckDB oracle: `WITH tpcds_<t> AS (<tableSql(t, identity)>) …`.
  *
  * Mapping (fixture → TPC-DS):
  *  - lineitem, split 3 ways on `(l_orderkey + l_linenumber) % 3`, becomes
  *    the three channel fact tables store_sales / web_sales /
  *    catalog_sales (disjoint slices, so cross-channel INTERSECT/EXCEPT
  *    shapes are meaningful; customers derive from the orderkey alone, so
  *    one buyer's lines land in several channels like a real multi-channel
  *    shopper).
  *  - part → item, customer → customer (+ a 1:1 customer_address),
  *    supplier → store.
  *  - the l_returnflag = 'R' sub-slice of the store channel becomes
  *    store_returns (same key derivations, so returns join their sales);
  *  - date_dim / time_dim / customer_demographics /
  *    household_demographics / promotion / reason / inventory are
  *    generated from inline digit-table series (no fixture input;
  *    identical row sets on both engines).
  *
  * Surrogate-key note: `d_date_sk` (and the fact tables' `*_sold_date_sk`
  * / `inv_date_sk`) are DATE-typed rather than the spec's julian INT —
  * day-number arithmetic has no portable Spark/DuckDB spelling, and the
  * join SHAPE (fact ⋈ date_dim on the surrogate) is what the corpus
  * exercises, not the key's physical type.
  *
  * Scale note: every derivation is a stateless projection (codegen'd, no
  * shuffle); the generated dimensions are tiny (date_dim 2 557 rows,
  * time_dim 86 400, demographics 720, promotion 300, reason 35,
  * inventory |part|×104) and broadcast at any SF, so the views add
  * nothing to the 100 TB scan cost.
  */
object TpcdsSynth {

  /** Tables the adapted corpus references (generated dims first). */
  val tables: Seq[String] = Seq(
    "date_dim", "time_dim", "customer_demographics", "household_demographics",
    "warehouse", "income_band", "ship_mode", "call_center", "web_site",
    "web_page", "catalog_page",
    "item", "customer", "customer_address", "store", "promotion", "reason",
    "store_sales", "web_sales", "catalog_sales",
    "store_returns", "catalog_returns", "web_returns", "inventory")

  private def digits(alias: String): String =
    "(SELECT 0 AS n UNION ALL SELECT 1 UNION ALL SELECT 2 UNION ALL " +
      "SELECT 3 UNION ALL SELECT 4 UNION ALL SELECT 5 UNION ALL " +
      "SELECT 6 UNION ALL SELECT 7 UNION ALL SELECT 8 UNION ALL SELECT 9) " + alias

  /** Inline integer series 0 until limit (a cross-product of 10-row digit
    * tables — portable to any SQL engine, no generate_series dialect).
    */
  private def series(limit: Int, alias: String): String = {
    val k = math.max(1, math.ceil(math.log10(limit.toDouble)).toInt)
    val term = (0 until k)
      .map(i => if (i == 0) "d0.n" else s"d$i.n * ${BigInt(10).pow(i)}")
      .mkString(" + ")
    val froms = (0 until k).map(i => digits(s"d$i")).mkString(", ")
    s"(SELECT $term AS n FROM $froms WHERE $term < $limit) $alias"
  }

  /** Fixture epoch: l_shipdate spans 1995-01-02..2001-11-04, so date_dim
    * covers 1995-01-01 + 2557 days = through 2001-12-31, and month_seq
    * 1200 anchors at 1995-01 (the corpus' `BETWEEN 1200 AND 1211` window
    * selects the fixture's first year).
    */
  private val epoch = "DATE '1995-01-01'"
  private val days = 2557

  /** Channel-split fact columns shared by the three sales tables: the
    * buyer derives from the orderkey alone (all lines of a ticket share a
    * customer), per-line demographics/address vary by line.
    *
    * Monetary columns are EXACT DECIMAL(18,2) values built from integer
    * cents with modular arithmetic only — no floating division. Rationale:
    * the correctness gate hash-compares round()ed aggregates, and Spark
    * (BigDecimal HALF_UP on the shortest decimal repr) and DuckDB (rounding
    * the raw float) disagree whenever a float aggregate lands on a .xx5
    * tie; float-tailed source values made that a 3-in-15-query event at
    * sf0.1. Integer cents → decimal sums are exact and order-independent
    * on both engines, so the tie class vanishes at the source. `cents`
    * (= l_extendedprice in cents) is exact: the parquet double is a
    * 2-decimal value, so round(x*100) snaps to the true integer.
    */
  private val cents = "CAST(round(l_extendedprice * 100) AS BIGINT)"
  private val qty = "CAST(l_quantity AS BIGINT)"
  private def money(cexpr: String) =
    s"CAST(CAST($cexpr AS DECIMAL(18,2)) / 100 AS DECIMAL(18,2))"

  private def saleCols(p: String, buyer: String, custCount: String): String = {
    s"""CAST(l_shipdate AS DATE) AS ${p}_sold_date_sk,
       |  CAST((l_orderkey * 7919 + l_linenumber * 10007) % 86400 AS BIGINT) AS ${p}_sold_time_sk,
       |  CAST((l_orderkey * 13 + l_linenumber * 3) % 300 AS BIGINT) AS ${p}_promo_sk,
       |  l_partkey AS ${p}_item_sk,
       |  CAST((l_orderkey * 7 + 3) % $custCount AS BIGINT) AS ${p}_${buyer}customer_sk,
       |  CAST((l_orderkey * 13 + l_linenumber * 7) % 720 AS BIGINT) AS ${p}_${buyer}cdemo_sk,
       |  CAST((l_orderkey * 11 + 5) % 720 AS BIGINT) AS ${p}_${buyer}hdemo_sk,
       |  CAST((l_orderkey * 17 + l_linenumber * 11) % $custCount AS BIGINT) AS ${p}_${buyer}addr_sk,
       |  CAST(l_quantity AS INT) AS ${p}_quantity,
       |  ${money(s"$cents % 90000 + 100")} AS ${p}_list_price,
       |  ${money(s"($cents % 90000 + 100) * $qty")} AS ${p}_ext_list_price,
       |  ${money(s"($cents * 7 + CAST(round(l_discount * 100) AS BIGINT) * 13) % 90000 + 50")} AS ${p}_sales_price,
       |  ${money(s"(($cents * 7 + CAST(round(l_discount * 100) AS BIGINT) * 13) % 90000 + 50) * $qty")} AS ${p}_ext_sales_price,
       |  ${money(s"($cents * 11 + 7) % 10000")} AS ${p}_ext_discount_amt,
       |  ${money(s"($cents * 3 + 1) % 5000")} AS ${p}_coupon_amt,
       |  ${money(s"($cents * 13 + 17) % 60000 + 50")} AS ${p}_wholesale_cost,
       |  ${money(s"(($cents * 13 + 17) % 60000 + 50) * $qty")} AS ${p}_ext_wholesale_cost,
       |  ${money(s"(($cents * 7 + CAST(round(l_discount * 100) AS BIGINT) * 13) % 90000 + 50) * $qty - (($cents * 13 + 17) % 60000 + 50) * $qty")} AS ${p}_net_profit,
       |  ${money(s"(($cents * 7 + CAST(round(l_discount * 100) AS BIGINT) * 13) % 90000 + 50) * $qty + CAST(round(l_tax * 100) AS BIGINT) * $qty")} AS ${p}_net_paid,
       |  ${money(s"CAST(round(l_tax * 100) AS BIGINT) * $qty")} AS ${p}_ext_tax,
       |  ${money(s"(($cents * 7 + CAST(round(l_discount * 100) AS BIGINT) * 13) % 90000 + 50) * $qty + 2 * CAST(round(l_tax * 100) AS BIGINT) * $qty")} AS ${p}_net_paid_inc_tax""".stripMargin
  }

  /** One-scan projection of ALL THREE channel slices to the columns
    * tpcds_q14's shared CTEs need (round 17, guide §2.4). The channel
    * fact views are disjoint `(l_orderkey + l_linenumber) % 3` slices of
    * lineitem whose sold_date_sk / item_sk / quantity / list_price
    * derivations are textually identical (saleCols above), so the UNION
    * ALL of the three channels over any common predicate equals one scan
    * of lineitem with `channel = (l_orderkey + l_linenumber) % 3`
    * carried as a column — same rows, same values, one fact read instead
    * of three. Built from the same `cents`/`money` snippets as saleCols
    * so the derivations can never drift apart.
    */
  def allChannelSalesSql(ref: String => String): String =
    s"""SELECT CAST(l_shipdate AS DATE) AS sold_date_sk,
       |  l_partkey AS item_sk,
       |  CAST((l_orderkey + l_linenumber) % 3 AS INT) AS channel,
       |  CAST(l_quantity AS INT) AS quantity,
       |  ${money(s"$cents % 90000 + 100")} AS list_price
       |FROM ${ref("lineitem")}""".stripMargin

  /** Connector-style SELECT producing the TPC-DS column subset the corpus
    * touches; `ref(table)` supplies the FROM-clause reference for a base
    * fixture table.
    *
    * `custCount` is the SQL snippet standing for |customer| in the key
    * derivations. The default — a scalar subquery over the referenced
    * table — is what the DuckDB oracle runs (the preamble is built
    * statically, before any data is readable). The Spark views inline
    * the actual count as a literal instead (ensureTpcdsViews): the value
    * is identical, but a catalog view's text is re-analyzed on EVERY
    * reference, and the subquery's nested parquet relation made each of
    * the corpus' many fact-view references pay subquery + file-relation
    * resolution — measured as 3.1 s ResolveRelations + 2.5 s
    * ResolveSQLOnFile + 1.8 s ResolveSubquery of tpcds_q14's 4.9 s
    * planning time at sf0.1.
    */
  def tableSql(table: String, ref: String => String,
               custCount: String = null): String = {
    val cnt = Option(custCount)
      .getOrElse("(SELECT count(*) FROM " + ref("customer") + ")")
    tableSqlImpl(table, ref, cnt)
  }

  private def tableSqlImpl(table: String, ref: String => String,
                           cnt: String): String = table match {
    case "date_dim" =>
      s"""SELECT d_date AS d_date_sk, d_date,
         |  CAST(EXTRACT(YEAR FROM d_date) AS INT) AS d_year,
         |  CAST(EXTRACT(MONTH FROM d_date) AS INT) AS d_moy,
         |  CAST(EXTRACT(DAY FROM d_date) AS INT) AS d_dom,
         |  CAST(EXTRACT(QUARTER FROM d_date) AS INT) AS d_qoy,
         |  1200 + (CAST(EXTRACT(YEAR FROM d_date) AS INT) - 1995) * 12
         |       + CAST(EXTRACT(MONTH FROM d_date) AS INT) - 1 AS d_month_seq,
         |  CAST(n % 7 AS INT) AS d_dow,
         |  CASE CAST(n % 7 AS INT) WHEN 0 THEN 'Sunday' WHEN 1 THEN 'Monday'
         |       WHEN 2 THEN 'Tuesday' WHEN 3 THEN 'Wednesday'
         |       WHEN 4 THEN 'Thursday' WHEN 5 THEN 'Friday'
         |       ELSE 'Saturday' END AS d_day_name,
         |  CAST(FLOOR(n / 7.0) AS INT) + 5270 AS d_week_seq,
         |  CAST(EXTRACT(YEAR FROM d_date) AS VARCHAR(4)) || 'Q' ||
         |    CAST(EXTRACT(QUARTER FROM d_date) AS VARCHAR(1)) AS d_quarter_name
         |FROM (SELECT s.n AS n, CAST($epoch + s.n * INTERVAL '1' DAY AS DATE) AS d_date
         |      FROM ${series(days, "s")}) dd""".stripMargin

    // the epoch 1995-01-01 is a Sunday, so d_dow = n % 7 with the TPC-DS
    // convention (0 = Sunday) needs no engine day-of-week function — the
    // portable spelling both engines evaluate identically
    case "time_dim" =>
      s"""SELECT CAST(s.n AS BIGINT) AS t_time_sk,
         |  CAST(s.n AS INT) AS t_time,
         |  CAST(FLOOR(s.n / 3600.0) AS INT) AS t_hour,
         |  CAST(FLOOR((s.n % 3600) / 60.0) AS INT) AS t_minute,
         |  CAST(s.n % 60 AS INT) AS t_second,
         |  CASE WHEN s.n < 43200 THEN 'AM' ELSE 'PM' END AS t_am_pm,
         |  CASE WHEN s.n >= 21600 AND s.n < 32400 THEN 'breakfast'
         |       WHEN s.n >= 39600 AND s.n < 50400 THEN 'lunch'
         |       WHEN s.n >= 61200 AND s.n < 72000 THEN 'dinner'
         |       ELSE NULL END AS t_meal_time
         |FROM ${series(86400, "s")}""".stripMargin

    case "customer_demographics" =>
      s"""SELECT CAST(s.n AS BIGINT) AS cd_demo_sk,
         |  CASE WHEN s.n % 2 = 0 THEN 'M' ELSE 'F' END AS cd_gender,
         |  CASE CAST(s.n % 5 AS INT) WHEN 0 THEN 'M' WHEN 1 THEN 'S'
         |       WHEN 2 THEN 'D' WHEN 3 THEN 'W' ELSE 'U' END AS cd_marital_status,
         |  CASE CAST(s.n % 7 AS INT) WHEN 0 THEN 'Primary'
         |       WHEN 1 THEN 'Secondary' WHEN 2 THEN 'College'
         |       WHEN 3 THEN '2 yr Degree' WHEN 4 THEN '4 yr Degree'
         |       WHEN 5 THEN 'Advanced Degree' ELSE 'Unknown' END AS cd_education_status,
         |  CAST((s.n % 20 + 1) * 500 AS INT) AS cd_purchase_estimate,
         |  CASE CAST(s.n % 4 AS INT) WHEN 0 THEN 'Good' WHEN 1 THEN 'High Risk'
         |       WHEN 2 THEN 'Low Risk' ELSE 'Unknown' END AS cd_credit_rating,
         |  CAST(s.n % 7 AS INT) AS cd_dep_count,
         |  CAST((s.n * 3 + 1) % 7 AS INT) AS cd_dep_employed_count,
         |  CAST((s.n * 5 + 2) % 7 AS INT) AS cd_dep_college_count
         |FROM ${series(720, "s")}""".stripMargin

    case "household_demographics" =>
      s"""SELECT CAST(s.n AS BIGINT) AS hd_demo_sk,
         |  CAST(s.n % 20 + 1 AS INT) AS hd_income_band_sk,
         |  CASE CAST(s.n % 6 AS INT) WHEN 0 THEN '>10000' WHEN 1 THEN 'Unknown'
         |       WHEN 2 THEN '1001-5000' WHEN 3 THEN '0-500'
         |       WHEN 4 THEN '501-1000' ELSE '5001-10000' END AS hd_buy_potential,
         |  CAST(s.n % 10 AS INT) AS hd_dep_count,
         |  CAST(s.n % 5 AS INT) AS hd_vehicle_count
         |FROM ${series(720, "s")}""".stripMargin

    case "item" =>
      s"""SELECT p_partkey AS i_item_sk,
         |  'ITEM' || lpad(CAST(p_partkey AS VARCHAR(10)), 10, '0') AS i_item_id,
         |  p_name AS i_product_name,
         |  p_brand AS i_brand,
         |  CAST(substr(p_brand, 7, 2) AS INT) AS i_brand_id,
         |  CASE CAST(p_partkey % 8 AS INT) WHEN 0 THEN 'personal'
         |       WHEN 1 THEN 'portable' WHEN 2 THEN 'reference'
         |       WHEN 3 THEN 'self-help' WHEN 4 THEN 'accessories'
         |       WHEN 5 THEN 'classical' WHEN 6 THEN 'fragrances'
         |       ELSE 'pants' END AS i_class,
         |  CAST(p_partkey % 8 + 1 AS INT) AS i_class_id,
         |  CASE CAST(p_partkey % 6 AS INT) WHEN 0 THEN 'Books'
         |       WHEN 1 THEN 'Children' WHEN 2 THEN 'Electronics'
         |       WHEN 3 THEN 'Women' WHEN 4 THEN 'Music'
         |       ELSE 'Men' END AS i_category,
         |  CAST(p_partkey % 6 + 1 AS INT) AS i_category_id,
         |  CAST(p_partkey % 50 AS INT) AS i_manufact_id,
         |  'Manufact#' || CAST(p_partkey % 50 AS VARCHAR(2)) AS i_manufact,
         |  CAST(p_partkey % 8 AS INT) AS i_manager_id,
         |  CASE CAST(p_partkey % 12 AS INT) WHEN 0 THEN 'pale'
         |       WHEN 1 THEN 'slate' WHEN 2 THEN 'blanched'
         |       WHEN 3 THEN 'burnished' WHEN 4 THEN 'purple'
         |       WHEN 5 THEN 'burlywood' WHEN 6 THEN 'indian'
         |       WHEN 7 THEN 'spring' WHEN 8 THEN 'floral'
         |       WHEN 9 THEN 'medium' WHEN 10 THEN 'salmon'
         |       ELSE 'peach' END AS i_color,
         |  CASE CAST(p_partkey % 7 AS INT) WHEN 0 THEN 'Unknown'
         |       WHEN 1 THEN 'Each' WHEN 2 THEN 'Dozen' WHEN 3 THEN 'Case'
         |       WHEN 4 THEN 'Pallet' WHEN 5 THEN 'Gross'
         |       ELSE 'Box' END AS i_units,
         |  CASE CAST((p_partkey * 3 + 1) % 7 AS INT) WHEN 0 THEN 'small'
         |       WHEN 1 THEN 'medium' WHEN 2 THEN 'large'
         |       WHEN 3 THEN 'extra large' WHEN 4 THEN 'economy'
         |       WHEN 5 THEN 'N/A' ELSE 'petite' END AS i_size,
         |  p_retailprice AS i_current_price,
         |  CAST(CAST((CAST(round(p_retailprice * 100) AS BIGINT) * 13 + 17) % 60000 + 50 AS DECIMAL(18,2)) / 100 AS DECIMAL(18,2)) AS i_wholesale_cost,
         |  p_name || ' #' || CAST(p_partkey AS VARCHAR(10)) AS i_item_desc
         |FROM ${ref("part")}""".stripMargin

    case "customer" =>
      s"""SELECT c_custkey AS c_customer_sk,
         |  'AAAAAAAA' || CAST(c_custkey AS VARCHAR(12)) AS c_customer_id,
         |  'First' || CAST(c_custkey % 19 AS VARCHAR(2)) AS c_first_name,
         |  'Last' || CAST(c_custkey % 23 AS VARCHAR(2)) AS c_last_name,
         |  CASE CAST(c_custkey % 6 AS INT) WHEN 0 THEN 'Mr.' WHEN 1 THEN 'Mrs.'
         |       WHEN 2 THEN 'Ms.' WHEN 3 THEN 'Dr.' WHEN 4 THEN 'Sir'
         |       ELSE 'Miss' END AS c_salutation,
         |  CASE WHEN c_custkey % 2 = 0 THEN 'Y' ELSE 'N' END AS c_preferred_cust_flag,
         |  CAST(1924 + c_custkey % 69 AS INT) AS c_birth_year,
         |  CAST(c_custkey % 12 + 1 AS INT) AS c_birth_month,
         |  CAST(c_custkey % 28 + 1 AS INT) AS c_birth_day,
         |  CASE CAST(c_custkey % 5 AS INT) WHEN 0 THEN 'UNITED STATES'
         |       WHEN 1 THEN 'CANADA' WHEN 2 THEN 'GERMANY'
         |       WHEN 3 THEN 'JAPAN' ELSE 'BRAZIL' END AS c_birth_country,
         |  'login' || CAST(c_custkey % 50 AS VARCHAR(2)) AS c_login,
         |  'c' || CAST(c_custkey AS VARCHAR(12)) || '@example.com' AS c_email_address,
         |  CAST((c_custkey * 7 + 3) % 720 AS BIGINT) AS c_current_cdemo_sk,
         |  CAST((c_custkey * 11 + 5) % 720 AS BIGINT) AS c_current_hdemo_sk,
         |  c_custkey AS c_current_addr_sk,
         |  CAST($epoch + ((c_custkey * 73 + 11) % $days) * INTERVAL '1' DAY AS DATE) AS c_first_sales_date_sk,
         |  CAST($epoch + ((c_custkey * 73 + 41) % $days) * INTERVAL '1' DAY AS DATE) AS c_first_shipto_date_sk,
         |  CAST($epoch + ((c_custkey * 73 + 97) % $days) * INTERVAL '1' DAY AS DATE) AS c_last_review_date_sk
         |FROM ${ref("customer")}""".stripMargin

    case "customer_address" =>
      s"""SELECT c_custkey AS ca_address_sk,
         |  lpad(CAST((c_custkey * 17 + 7) % 100000 AS VARCHAR(5)), 5, '0') AS ca_zip,
         |  CASE CAST(c_custkey % 8 AS INT) WHEN 0 THEN 'Williamson County'
         |       WHEN 1 THEN 'Rush County' WHEN 2 THEN 'Toole County'
         |       WHEN 3 THEN 'Jefferson County' WHEN 4 THEN 'Dona Ana County'
         |       WHEN 5 THEN 'La Porte County' WHEN 6 THEN 'Franklin Parish'
         |       ELSE 'Orange County' END AS ca_county,
         |  CASE CAST(c_custkey % 10 AS INT) WHEN 0 THEN 'MS' WHEN 1 THEN 'IN'
         |       WHEN 2 THEN 'ND' WHEN 3 THEN 'OK' WHEN 4 THEN 'NM'
         |       WHEN 5 THEN 'VA' WHEN 6 THEN 'TN' WHEN 7 THEN 'TX'
         |       WHEN 8 THEN 'CA' ELSE 'NY' END AS ca_state,
         |  'United States' AS ca_country,
         |  'City' || CAST(c_custkey % 37 AS VARCHAR(2)) AS ca_city,
         |  CAST(-5 - c_custkey % 3 AS INT) AS ca_gmt_offset,
         |  CAST((c_custkey * 7) % 1000 + 1 AS VARCHAR(4)) AS ca_street_number,
         |  'Street' || CAST(c_custkey % 30 AS VARCHAR(2)) AS ca_street_name,
         |  CASE CAST(c_custkey % 5 AS INT) WHEN 0 THEN 'Ave' WHEN 1 THEN 'Blvd'
         |       WHEN 2 THEN 'Ct' WHEN 3 THEN 'Dr' ELSE 'Ln' END AS ca_street_type,
         |  'Suite ' || CAST(c_custkey % 100 AS VARCHAR(2)) AS ca_suite_number,
         |  CASE CAST(c_custkey % 3 AS INT) WHEN 0 THEN 'apartment'
         |       WHEN 1 THEN 'condo' ELSE 'single family' END AS ca_location_type
         |FROM ${ref("customer")}""".stripMargin

    // store names use the TPC-DS digit-word domain ('ese' = 3) so the
    // reference's verbatim s_store_name = 'ese' predicates (q88/q96)
    // select a real 10% slice instead of an empty set
    case "store" =>
      s"""SELECT s_suppkey AS s_store_sk,
         |  'S' || lpad(CAST(s_suppkey AS VARCHAR(10)), 9, '0') AS s_store_id,
         |  CASE CAST(s_suppkey % 10 AS INT) WHEN 0 THEN 'ought'
         |       WHEN 1 THEN 'able' WHEN 2 THEN 'pri' WHEN 3 THEN 'ese'
         |       WHEN 4 THEN 'anti' WHEN 5 THEN 'cally' WHEN 6 THEN 'ation'
         |       WHEN 7 THEN 'eing' WHEN 8 THEN 'bar' ELSE 'n st' END AS s_store_name,
         |  'Unknown' AS s_company_name,
         |  CASE CAST(s_suppkey % 8 AS INT) WHEN 0 THEN 'Williamson County'
         |       WHEN 1 THEN 'Rush County' WHEN 2 THEN 'Toole County'
         |       WHEN 3 THEN 'Jefferson County' WHEN 4 THEN 'Dona Ana County'
         |       WHEN 5 THEN 'La Porte County' WHEN 6 THEN 'Franklin Parish'
         |       ELSE 'Orange County' END AS s_county,
         |  CASE CAST(s_suppkey % 10 AS INT) WHEN 0 THEN 'MS' WHEN 1 THEN 'IN'
         |       WHEN 2 THEN 'ND' WHEN 3 THEN 'OK' WHEN 4 THEN 'NM'
         |       WHEN 5 THEN 'VA' WHEN 6 THEN 'TN' WHEN 7 THEN 'TX'
         |       WHEN 8 THEN 'CA' ELSE 'NY' END AS s_state,
         |  CAST(s_suppkey % 10 + 1 AS INT) AS s_market_id,
         |  CAST((s_suppkey * 7) % 300 + 50 AS INT) AS s_number_employees,
         |  lpad(CAST((s_suppkey * 17 + 7) % 100000 AS VARCHAR(5)), 5, '0') AS s_zip,
         |  'City' || CAST(s_suppkey % 15 AS VARCHAR(2)) AS s_city,
         |  CAST(-5 - s_suppkey % 3 AS INT) AS s_gmt_offset,
         |  CAST(s_suppkey % 6 + 1 AS INT) AS s_company_id,
         |  CAST((s_suppkey * 7) % 1000 + 1 AS VARCHAR(4)) AS s_street_number,
         |  'Street' || CAST(s_suppkey % 30 AS VARCHAR(2)) AS s_street_name,
         |  CASE CAST(s_suppkey % 5 AS INT) WHEN 0 THEN 'Ave' WHEN 1 THEN 'Blvd'
         |       WHEN 2 THEN 'Ct' WHEN 3 THEN 'Dr' ELSE 'Ln' END AS s_street_type,
         |  'Suite ' || CAST(s_suppkey % 100 AS VARCHAR(2)) AS s_suite_number
         |FROM ${ref("supplier")}""".stripMargin

    case "promotion" =>
      s"""SELECT CAST(s.n AS BIGINT) AS p_promo_sk,
         |  'PROMO' || lpad(CAST(s.n AS VARCHAR(4)), 4, '0') AS p_promo_id,
         |  'promo' || CAST(s.n % 10 AS VARCHAR(2)) AS p_promo_name,
         |  CASE WHEN s.n % 2 = 0 THEN 'Y' ELSE 'N' END AS p_channel_dmail,
         |  CASE WHEN s.n % 3 = 0 THEN 'Y' ELSE 'N' END AS p_channel_email,
         |  CASE WHEN s.n % 5 = 0 THEN 'Y' ELSE 'N' END AS p_channel_tv,
         |  CASE WHEN s.n % 7 = 0 THEN 'Y' ELSE 'N' END AS p_channel_event
         |FROM ${series(300, "s")}""".stripMargin

    // 'reason ' || n puts the reference's verbatim r_reason_desc =
    // 'reason 28' (q93) inside the synthesized domain (n < 35)
    case "reason" =>
      s"""SELECT CAST(s.n AS BIGINT) AS r_reason_sk,
         |  'reason ' || CAST(s.n AS VARCHAR(2)) AS r_reason_desc
         |FROM ${series(35, "s")}""".stripMargin

    // matches the inv_warehouse_sk domain (p_partkey % 5)
    case "warehouse" =>
      s"""SELECT CAST(s.n AS BIGINT) AS w_warehouse_sk,
         |  'Warehouse' || CAST(s.n AS VARCHAR(1)) AS w_warehouse_name,
         |  CAST((s.n * 7 + 3) % 10 * 100000 + 50000 AS INT) AS w_warehouse_sq_ft,
         |  'City' || CAST(s.n AS VARCHAR(1)) AS w_city,
         |  CASE CAST(s.n % 5 AS INT) WHEN 0 THEN 'Williamson County'
         |       WHEN 1 THEN 'Rush County' WHEN 2 THEN 'Toole County'
         |       WHEN 3 THEN 'Jefferson County' ELSE 'Orange County' END AS w_county,
         |  CASE CAST(s.n % 5 AS INT) WHEN 0 THEN 'MS' WHEN 1 THEN 'IN'
         |       WHEN 2 THEN 'ND' WHEN 3 THEN 'OK' ELSE 'NM' END AS w_state,
         |  'United States' AS w_country
         |FROM ${series(5, "s")}""".stripMargin

    // the spec's 20 ship modes: 5 types × 4 carrier groups
    case "ship_mode" =>
      s"""SELECT CAST(s.n AS BIGINT) AS sm_ship_mode_sk,
         |  'SM' || lpad(CAST(s.n AS VARCHAR(2)), 2, '0') AS sm_ship_mode_id,
         |  CASE CAST(s.n % 5 AS INT) WHEN 0 THEN 'EXPRESS'
         |       WHEN 1 THEN 'NEXT DAY' WHEN 2 THEN 'OVERNIGHT'
         |       WHEN 3 THEN 'REGULAR' ELSE 'TWO DAY' END AS sm_type,
         |  CASE CAST(s.n % 4 AS INT) WHEN 0 THEN 'UPS' WHEN 1 THEN 'FEDEX'
         |       WHEN 2 THEN 'AIRBORNE' ELSE 'USPS' END AS sm_carrier,
         |  'CODE' || CAST(s.n AS VARCHAR(2)) AS sm_code
         |FROM ${series(20, "s")}""".stripMargin

    case "call_center" =>
      s"""SELECT CAST(s.n AS BIGINT) AS cc_call_center_sk,
         |  'CC' || lpad(CAST(s.n AS VARCHAR(1)), 1, '0') AS cc_call_center_id,
         |  'Call Center ' || CAST(s.n AS VARCHAR(1)) AS cc_name,
         |  'Manager' || CAST(s.n AS VARCHAR(1)) AS cc_manager,
         |  CASE CAST(s.n % 3 AS INT) WHEN 0 THEN 'Williamson County'
         |       WHEN 1 THEN 'Rush County' ELSE 'Orange County' END AS cc_county
         |FROM ${series(6, "s")}""".stripMargin

    case "web_site" =>
      s"""SELECT CAST(s.n AS BIGINT) AS web_site_sk,
         |  'WEB' || lpad(CAST(s.n AS VARCHAR(2)), 2, '0') AS web_site_id,
         |  'site_' || CAST(s.n AS VARCHAR(2)) AS web_name,
         |  CASE CAST(s.n % 10 AS INT) WHEN 0 THEN 'ought'
         |       WHEN 1 THEN 'able' WHEN 2 THEN 'pri' WHEN 3 THEN 'ese'
         |       WHEN 4 THEN 'anti' WHEN 5 THEN 'cally' WHEN 6 THEN 'ation'
         |       WHEN 7 THEN 'eing' WHEN 8 THEN 'bar' ELSE 'n st' END AS web_company_name
         |FROM ${series(24, "s")}""".stripMargin

    // char counts span 100..6000 so the corpus' 5000-5200 band selects
    // a real slice
    case "web_page" =>
      s"""SELECT CAST(s.n AS BIGINT) AS wp_web_page_sk,
         |  'WP' || lpad(CAST(s.n AS VARCHAR(2)), 2, '0') AS wp_web_page_id,
         |  CAST(100 + (s.n * 100) % 5901 AS INT) AS wp_char_count
         |FROM ${series(60, "s")}""".stripMargin

    case "catalog_page" =>
      s"""SELECT CAST(s.n AS BIGINT) AS cp_catalog_page_sk,
         |  'CP' || lpad(CAST(s.n AS VARCHAR(3)), 3, '0') AS cp_catalog_page_id,
         |  'page_desc_' || CAST(s.n AS VARCHAR(3)) AS cp_description
         |FROM ${series(200, "s")}""".stripMargin

    // matches the hd_income_band_sk domain (n % 20 + 1)
    case "income_band" =>
      s"""SELECT CAST(s.n + 1 AS BIGINT) AS ib_income_band_sk,
         |  CAST(s.n * 10000 AS INT) AS ib_lower_bound,
         |  CAST((s.n + 1) * 10000 AS INT) AS ib_upper_bound
         |FROM ${series(20, "s")}""".stripMargin

    // ~2% of each channel's "q76 key" is NULL (the spec generator's
    // null-skew: unknown store / walk-in web buyer / missing catalog
    // ship address) so the corpus' IS NULL census queries select a real
    // slice; inner joins on these keys drop the same rows on both engines
    case "store_sales" =>
      s"""SELECT l_orderkey AS ss_ticket_number,
         |  CASE WHEN (l_orderkey * 31 + l_linenumber * 7) % 50 = 13
         |       THEN NULL ELSE l_suppkey END AS ss_store_sk,
         |  ${saleCols("ss", "", s"$cnt")}
         |FROM ${ref("lineitem")}
         |WHERE (l_orderkey + l_linenumber) % 3 = 0""".stripMargin

    // ws/cs carry the spec's warehouse key (store_sales has none),
    // aligned with the inventory/catalog_returns derivation (item % 5);
    // the ship date trails the sold date by a deterministic 1-30 days
    // (the slim fixture carries no l_receiptdate)
    case "web_sales" =>
      s"""SELECT l_orderkey AS ws_order_number,
         |  CASE WHEN (l_orderkey * 31 + l_linenumber * 7) % 50 = 13 THEN NULL
         |       ELSE CAST((l_orderkey * 19 + 7) % $cnt AS BIGINT) END AS ws_ship_customer_sk,
         |  CAST(l_partkey % 5 AS INT) AS ws_warehouse_sk,
         |  CAST(CAST(l_shipdate AS DATE) + (1 + (l_orderkey * 3 + l_linenumber) % 30) * INTERVAL '1' DAY AS DATE) AS ws_ship_date_sk,
         |  CAST(l_orderkey % 24 AS BIGINT) AS ws_web_site_sk,
         |  CAST((l_orderkey * 5 + l_linenumber) % 60 AS BIGINT) AS ws_web_page_sk,
         |  CAST((l_orderkey * 2 + l_linenumber) % 720 AS BIGINT) AS ws_ship_hdemo_sk,
         |  -- ^ even orderkey coefficient on purpose: rows surviving q90's
         |  --   hour+page gates sit on k≡9 (mod 12), l=4, where an odd
         |  --   coefficient pins dep-count parity odd and the spec's
         |  --   hd_dep_count = 6 slice would be structurally empty
         |  CAST((l_orderkey * 3 + l_linenumber) % 20 AS BIGINT) AS ws_ship_mode_sk,
         |  CAST((l_orderkey * 23 + l_linenumber * 13) % $cnt AS BIGINT) AS ws_ship_addr_sk,
         |  ${money(s"(($cents * 19 + 29) % 8000 + 20) * $qty")} AS ws_ext_ship_cost,
         |  ${saleCols("ws", "bill_", s"$cnt")}
         |FROM ${ref("lineitem")}
         |WHERE (l_orderkey + l_linenumber) % 3 = 1""".stripMargin

    case "catalog_sales" =>
      s"""SELECT l_orderkey AS cs_order_number,
         |  CAST((l_orderkey * 19 + 7) % $cnt AS BIGINT) AS cs_ship_customer_sk,
         |  CAST(l_partkey % 5 AS INT) AS cs_warehouse_sk,
         |  CAST(CAST(l_shipdate AS DATE) + (1 + (l_orderkey * 3 + l_linenumber) % 30) * INTERVAL '1' DAY AS DATE) AS cs_ship_date_sk,
         |  CAST(l_orderkey % 6 AS BIGINT) AS cs_call_center_sk,
         |  CAST((l_orderkey * 3 + l_linenumber) % 20 AS BIGINT) AS cs_ship_mode_sk,
         |  CAST((l_orderkey * 7 + l_linenumber * 3) % 200 AS BIGINT) AS cs_catalog_page_sk,
         |  CASE WHEN (l_orderkey * 31 + l_linenumber * 7) % 50 = 13 THEN NULL
         |       ELSE CAST((l_orderkey * 23 + l_linenumber * 13) % $cnt AS BIGINT) END AS cs_ship_addr_sk,
         |  ${money(s"(($cents * 19 + 29) % 8000 + 20) * $qty")} AS cs_ext_ship_cost,
         |  ${saleCols("cs", "bill_", s"$cnt")}
         |FROM ${ref("lineitem")}
         |WHERE (l_orderkey + l_linenumber) % 3 = 2""".stripMargin

    // returns are the l_returnflag = 'R' slice of the store_sales channel
    // — same key derivations as saleCols("ss", …) so (item_sk,
    // ticket_number) joins line up with the sale, the returned quantity is
    // a 1..qty portion, and the return date trails the sale by < 60 days
    // (still a stateless per-row projection of lineitem, no shuffle)
    case "store_returns" =>
      val retQty = "(1 + (l_orderkey + l_linenumber) % CAST(l_quantity AS BIGINT))"
      s"""SELECT CAST(CAST(l_shipdate AS DATE) + (l_orderkey % 60) * INTERVAL '1' DAY AS DATE) AS sr_returned_date_sk,
         |  l_partkey AS sr_item_sk,
         |  l_orderkey AS sr_ticket_number,
         |  l_suppkey AS sr_store_sk,
         |  CAST((l_orderkey * 7 + 3) % $cnt AS BIGINT) AS sr_customer_sk,
         |  CAST((l_orderkey * 13 + l_linenumber * 7) % 720 AS BIGINT) AS sr_cdemo_sk,
         |  CAST((l_orderkey * 3 + l_linenumber) % 35 AS BIGINT) AS sr_reason_sk,
         |  CAST($retQty AS INT) AS sr_return_quantity,
         |  ${money(s"(($cents * 7 + CAST(round(l_discount * 100) AS BIGINT) * 13) % 90000 + 50) * $retQty")} AS sr_return_amt,
         |  ${money(s"($cents * 23 + 11) % 3000")} AS sr_fee,
         |  ${money(s"(($cents * 13 + 17) % 60000 + 50) * $retQty")} AS sr_net_loss
         |FROM ${ref("lineitem")}
         |WHERE (l_orderkey + l_linenumber) % 3 = 0 AND l_returnflag = 'R'""".stripMargin

    // catalog/web returns mirror store_returns on their channel's slice:
    // same key derivations as saleCols so (item_sk, order_number) joins
    // line up with the sale and the returning customer/address ARE the
    // bill customer/address — still stateless per-row projections
    case "catalog_returns" =>
      val retQty = "(1 + (l_orderkey + l_linenumber) % CAST(l_quantity AS BIGINT))"
      s"""SELECT CAST(CAST(l_shipdate AS DATE) + (l_orderkey % 60) * INTERVAL '1' DAY AS DATE) AS cr_returned_date_sk,
         |  l_partkey AS cr_item_sk,
         |  l_orderkey AS cr_order_number,
         |  CAST(l_partkey % 5 AS INT) AS cr_warehouse_sk,
         |  CAST(l_orderkey % 6 AS BIGINT) AS cr_call_center_sk,
         |  CAST((l_orderkey * 7 + l_linenumber * 3) % 200 AS BIGINT) AS cr_catalog_page_sk,
         |  CAST((l_orderkey * 7 + 3) % $cnt AS BIGINT) AS cr_returning_customer_sk,
         |  CAST((l_orderkey * 17 + l_linenumber * 11) % $cnt AS BIGINT) AS cr_returning_addr_sk,
         |  CAST((l_orderkey * 3 + l_linenumber) % 35 AS BIGINT) AS cr_reason_sk,
         |  CAST($retQty AS INT) AS cr_return_quantity,
         |  ${money(s"(($cents * 7 + CAST(round(l_discount * 100) AS BIGINT) * 13) % 90000 + 50) * $retQty")} AS cr_return_amount,
         |  ${money(s"((($cents * 7 + CAST(round(l_discount * 100) AS BIGINT) * 13) % 90000 + 50) + CAST(round(l_tax * 100) AS BIGINT)) * $retQty")} AS cr_return_amt_inc_tax,
         |  ${money(s"($cents * 29 + 31) % 40000")} AS cr_refunded_cash,
         |  ${money(s"($cents * 37 + 41) % 20000")} AS cr_reversed_charge,
         |  ${money(s"($cents * 43 + 47) % 10000")} AS cr_store_credit,
         |  ${money(s"(($cents * 13 + 17) % 60000 + 50) * $retQty")} AS cr_net_loss
         |FROM ${ref("lineitem")}
         |WHERE (l_orderkey + l_linenumber) % 3 = 2 AND l_returnflag = 'R'""".stripMargin

    case "web_returns" =>
      val retQty = "(1 + (l_orderkey + l_linenumber) % CAST(l_quantity AS BIGINT))"
      s"""SELECT CAST(CAST(l_shipdate AS DATE) + (l_orderkey % 60) * INTERVAL '1' DAY AS DATE) AS wr_returned_date_sk,
         |  l_partkey AS wr_item_sk,
         |  l_orderkey AS wr_order_number,
         |  CAST((l_orderkey * 5 + l_linenumber) % 60 AS BIGINT) AS wr_web_page_sk,
         |  CAST((l_orderkey * 7 + 3) % $cnt AS BIGINT) AS wr_returning_customer_sk,
         |  CAST((l_orderkey * 17 + l_linenumber * 11) % $cnt AS BIGINT) AS wr_returning_addr_sk,
         |  CAST((l_orderkey * 13 + l_linenumber * 7) % 720 AS BIGINT) AS wr_refunded_cdemo_sk,
         |  CASE WHEN (l_orderkey + 2 * l_linenumber) % 3 = 0
         |       THEN CAST((l_orderkey * 11 + l_linenumber * 17) % 720 AS BIGINT)
         |       ELSE CAST((l_orderkey * 13 + l_linenumber * 7) % 720 AS BIGINT)
         |       END AS wr_returning_cdemo_sk,
         |  CAST((l_orderkey * 19 + l_linenumber * 7) % $cnt AS BIGINT) AS wr_refunded_addr_sk,
         |  ${money(s"($cents * 23 + 11) % 3000")} AS wr_fee,
         |  ${money(s"($cents * 29 + 31) % 40000")} AS wr_refunded_cash,
         |  CAST((l_orderkey * 3 + l_linenumber) % 35 AS BIGINT) AS wr_reason_sk,
         |  CAST($retQty AS INT) AS wr_return_quantity,
         |  ${money(s"(($cents * 7 + CAST(round(l_discount * 100) AS BIGINT) * 13) % 90000 + 50) * $retQty")} AS wr_return_amt,
         |  ${money(s"(($cents * 13 + 17) % 60000 + 50) * $retQty")} AS wr_net_loss
         |FROM ${ref("lineitem")}
         |WHERE (l_orderkey + l_linenumber) % 3 = 1 AND l_returnflag = 'R'""".stripMargin

    case "inventory" =>
      // weekly snapshots over the fixture's first two years — |part|×104
      // rows, a flatMap over part, never materialized
      s"""SELECT CAST($epoch + (w.n * 7) * INTERVAL '1' DAY AS DATE) AS inv_date_sk,
         |  p_partkey AS inv_item_sk,
         |  CAST(p_partkey % 5 AS INT) AS inv_warehouse_sk,
         |  CAST((p_partkey * 13 + w.n * 389) % 1000 AS INT) AS inv_quantity_on_hand
         |FROM ${ref("part")} CROSS JOIN ${series(104, "w")}""".stripMargin
  }

  /** DuckDB CTE preamble: `tpcds_date_dim AS (…), …` over the driver's
    * registered fixture tables (identity refs).
    */
  def duckCtePreamble: String =
    tables.map(t => s"tpcds_$t AS (\n${tableSql(t, identity)}\n)")
      .mkString("WITH ", ",\n", "\n")
}
