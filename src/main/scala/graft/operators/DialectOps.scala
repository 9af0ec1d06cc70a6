package graft.operators

import org.apache.spark.sql.SparkSession

import graft.{QueryDef, QueryGroup, Tables}

/** Runs the reference's COMPLETE benchto TPC-H corpus (all 22 texts,
  * BenchtoTexts.scala) VERBATIM through the engine — double-quoted
  * identifiers, `DATE '…' + INTERVAL '…' YEAR` arithmetic, unprefixed
  * TPC-H column names, three-part `"db"."schema"."table"` references,
  * correlated scalar subqueries over partsupp and all (reference:
  * presto-benchto-benchmarks/src/main/resources/sql/presto/tpch/q*.sql).
  * The only preprocessing is what benchto itself does before submitting:
  * substituting the `${database}`/`${schema}`/`${prefix}` template
  * variables. Each text runs inside an outer normalization SELECT
  * (positional column aliases + float rounding + total ORDER) so the
  * driver's DuckDB hash-compare is deterministic — the inner text stays
  * byte-identical.
  *
  * Name resolution goes through a `tpch` catalog database of views that
  * extend the slim fixture to the full TPC-H schema (TpchSynth — the
  * connector-style mapping the reference's tpch connector performs,
  * presto-tpch/.../TpchMetadata.java). The DuckDB oracle reproduces the
  * exact same derivations as CTEs built from the SAME strings, and runs
  * the same text with the three-part references collapsed to those CTE
  * names.
  *
  * Several texts keep TPC-H-spec predicates that are empty in this
  * fixture (1993/94 date windows before the fixture's 1995 epoch,
  * nation/type literals like 'GERMANY' or '%BRASS' the generator never
  * emits). They are kept verbatim anyway — the empty result is still
  * oracle-compared, and the non-empty twins live in TpchQueries
  * (fixture-tuned predicates) — plus `dialect_q06_shifted` repeats q06
  * over 1996 for a non-trivial value check.
  */
object DialectOps extends QueryGroup {

  private val viewsFor =
    new java.util.concurrent.ConcurrentHashMap[SparkSession, String]()

  /** Catalog views over the driver parquet, extended to the full TPC-H
    * schema (TpchSynth). `compute` holds the per-key lock until the views
    * exist, so a concurrent second caller can't observe the pair as
    * registered mid-creation.
    */
  private def ensureTpchViews(spark: SparkSession, dir: String): Unit =
    viewsFor.compute(spark, (_, prev) => {
      if (prev != dir) {
        spark.sql("CREATE DATABASE IF NOT EXISTS tpch")
        TpchSynth.tables.foreach { t =>
          val body = TpchSynth.tableSql(t, b => s"parquet.`$dir/$b.parquet`")
          spark.sql(s"CREATE OR REPLACE VIEW tpch.$t AS $body")
        }
      }
      dir
    })

  /** benchto's template substitution (the step its runner performs before
    * submitting the text to the engine).
    */
  private def substitute(text: String): String = text
    .replace("${database}", "spark_catalog")
    .replace("${schema}", "tpch")
    .replace("${prefix}", "")

  /** Oracle-side: collapse `"${database}"."${schema}"."${prefix}t"` to the
    * quoted CTE identifier `"tpch_t"` (tpch corpus) and the unquoted
    * `${database}.${schema}.t` form to `tpch_t` (distributed_sort corpus).
    */
  private def collapse(text: String): String = text
    .replace("\"${database}\".\"${schema}\".\"${prefix}", "\"tpch_")
    .replace("${database}.${schema}.", "tpch_")

  /** One verbatim corpus entry.
    * @param aliases  positional names for the text's output columns
    *                 (needed because e.g. q02 projects two `name`s and
    *                 q18 an unaliased `sum(l.quantity)`)
    * @param norm     output exprs over the aliases: float rounding +
    *                 integer-width pinning (DuckDB sums INTEGER into
    *                 HUGEINT, extract() into BIGINT)
    * @param order    total ORDER BY over the normalized names ("" = 1 row)
    * @param oracleFix tiny DuckDB dialect shim applied to the ORACLE text
    *                 only (e.g. q20's `date('…')` — no such function in
    *                 DuckDB); the engine-side text is never touched
    */
  private def verbatim(name: String, text: String, aliases: Seq[String],
      norm: Seq[String], order: String,
      oracleFix: String => String = identity): QueryDef = {
    def wrap(inner: String): String = {
      val sel = s"SELECT ${norm.mkString(", ")}\nFROM (\n$inner\n) AS t(${aliases.mkString(", ")})"
      if (order.isEmpty) sel else s"$sel\nORDER BY $order"
    }
    val oracle = TpchSynth.duckCtePreamble + wrap(oracleFix(collapse(text)))
    QueryDef(name, Some(oracle), (s, dir) => {
      Tables.register(s, dir)
      ensureTpchViews(s, dir)
      s.sql(wrap(substitute(text)))
    })
  }

  private def r2(c: String) = s"round($c, 2) AS $c"
  private def r4(c: String) = s"round($c, 4) AS $c"
  private def big(c: String) = s"CAST($c AS BIGINT) AS $c"

  def defs = Seq(
    verbatim("dialect_q01_verbatim", BenchtoTexts.q01,
      Seq("returnflag", "linestatus", "sum_qty", "sum_base_price",
        "sum_disc_price", "sum_charge", "avg_qty", "avg_price", "avg_disc",
        "count_order"),
      Seq("returnflag", "linestatus", r2("sum_qty"), r2("sum_base_price"),
        r2("sum_disc_price"), r2("sum_charge"), r4("avg_qty"),
        r4("avg_price"), r4("avg_disc"), "count_order"),
      "returnflag, linestatus"),

    verbatim("dialect_q02_verbatim", BenchtoTexts.q02,
      Seq("acctbal", "s_name", "n_name", "partkey", "mfgr", "address",
        "phone", "s_comment"),
      Seq(r2("acctbal"), "s_name", "n_name", "partkey", "mfgr", "address",
        "phone", "s_comment"),
      "acctbal DESC, n_name, s_name, partkey"),

    verbatim("dialect_q03_verbatim", BenchtoTexts.q03,
      Seq("orderkey", "revenue", "orderdate", "shippriority"),
      Seq("orderkey", r2("revenue"), "orderdate", big("shippriority")),
      "revenue DESC, orderdate, orderkey"),

    verbatim("dialect_q04_verbatim", BenchtoTexts.q04,
      Seq("orderpriority", "order_count"),
      Seq("orderpriority", big("order_count")),
      "orderpriority"),

    verbatim("dialect_q05_verbatim", BenchtoTexts.q05,
      Seq("name", "revenue"),
      Seq("name", r2("revenue")),
      "revenue DESC, name"),

    verbatim("dialect_q06_verbatim", BenchtoTexts.q06,
      Seq("revenue"), Seq(r2("revenue")), ""),

    // q06 again with the date window shifted into the fixture's range —
    // same verbatim dialect surface, non-empty result
    verbatim("dialect_q06_shifted",
      BenchtoTexts.q06.replace("1994-01-01", "1996-01-01"),
      Seq("revenue"), Seq(r2("revenue")), ""),

    verbatim("dialect_q07_verbatim", BenchtoTexts.q07,
      Seq("supp_nation", "cust_nation", "l_year", "revenue"),
      Seq("supp_nation", "cust_nation", big("l_year"), r2("revenue")),
      "supp_nation, cust_nation, l_year"),

    verbatim("dialect_q08_verbatim", BenchtoTexts.q08,
      Seq("o_year", "mkt_share"),
      Seq(big("o_year"), r4("mkt_share")),
      "o_year"),

    verbatim("dialect_q09_verbatim", BenchtoTexts.q09,
      Seq("nation", "o_year", "sum_profit"),
      Seq("nation", big("o_year"), r2("sum_profit")),
      "nation, o_year DESC"),

    verbatim("dialect_q10_verbatim", BenchtoTexts.q10,
      Seq("custkey", "c_name", "revenue", "acctbal", "n_name", "address",
        "phone", "c_comment"),
      Seq("custkey", "c_name", r2("revenue"), r2("acctbal"), "n_name",
        "address", "phone", "c_comment"),
      "revenue DESC, custkey"),

    verbatim("dialect_q11_verbatim", BenchtoTexts.q11,
      Seq("partkey", "value"),
      Seq("partkey", r2("value")),
      "value DESC, partkey"),

    verbatim("dialect_q12_verbatim", BenchtoTexts.q12,
      Seq("shipmode", "high_line_count", "low_line_count"),
      Seq("shipmode", big("high_line_count"), big("low_line_count")),
      "shipmode"),

    verbatim("dialect_q13_verbatim", BenchtoTexts.q13,
      Seq("c_count", "custdist"),
      Seq(big("c_count"), big("custdist")),
      "custdist DESC, c_count DESC"),

    verbatim("dialect_q14_verbatim", BenchtoTexts.q14,
      Seq("promo_revenue"), Seq(r4("promo_revenue")), ""),

    verbatim("dialect_q15_verbatim", BenchtoTexts.q15,
      Seq("suppkey", "name", "address", "phone", "total_revenue"),
      Seq("suppkey", "name", "address", "phone", r2("total_revenue")),
      "suppkey"),

    verbatim("dialect_q16_verbatim", BenchtoTexts.q16,
      Seq("brand", "type", "size", "supplier_cnt"),
      Seq("brand", "type", "size", big("supplier_cnt")),
      "supplier_cnt DESC, brand, type, size"),

    verbatim("dialect_q17_verbatim", BenchtoTexts.q17,
      Seq("avg_yearly"), Seq(r2("avg_yearly")), ""),

    verbatim("dialect_q18_verbatim", BenchtoTexts.q18,
      Seq("name", "custkey", "orderkey", "orderdate", "totalprice",
        "sum_qty"),
      Seq("name", "custkey", "orderkey", "orderdate", r2("totalprice"),
        r2("sum_qty")),
      "totalprice DESC, orderdate, orderkey"),

    verbatim("dialect_q19_verbatim", BenchtoTexts.q19,
      Seq("revenue"), Seq(r2("revenue")), ""),

    verbatim("dialect_q20_verbatim", BenchtoTexts.q20,
      Seq("name", "address"),
      Seq("name", "address"),
      "name",
      oracleFix = _.replace("date('1994-01-01')", "DATE '1994-01-01'")),

    verbatim("dialect_q21_verbatim", BenchtoTexts.q21,
      Seq("name", "numwait"),
      Seq("name", big("numwait")),
      "numwait DESC, name"),

    verbatim("dialect_q22_verbatim", BenchtoTexts.q22,
      Seq("cntrycode", "numcust", "totacctbal"),
      Seq("cntrycode", big("numcust"), r2("totacctbal")),
      "cntrycode"),

    // the distributed_sort corpus (count over a global ORDER BY —
    // Catalyst correctly eliminates the fruitless inner sort; the
    // reference runs it to benchmark its distributed-sort operator)
    verbatim("dialect_sort_1col", BenchtoTexts.sort1,
      Seq("n1"), Seq(big("n1")), ""),
    verbatim("dialect_sort_6cols", BenchtoTexts.sort6,
      Seq("n1", "n2", "n3", "n4", "n5", "n6"),
      Seq(big("n1"), big("n2"), big("n3"), big("n4"), big("n5"), big("n6")),
      ""),

    // ── Presto operator semantics (opt-in conf; PrestoOperators) ──
    // The two constructs both dialects parse but compute differently —
    // round-8's "silent divergence" list. Under the conf, integer `/`
    // truncates toward zero (reference BigintOperators.java divide) and
    // subscripts are 1-based erroring on out-of-bounds
    // (ArraySubscriptOperator.java:68). DuckDB's `//` and 1-based list
    // subscripts natively share Presto's semantics, so the oracles pin
    // values, including negative-operand truncation direction.
    q("dialect_int_division",
      """SELECT o_orderkey,
        |  o_orderkey // 7 AS div7,
        |  (0 - o_orderkey) // 7 AS negdiv7,
        |  o_orderkey // CAST(3 AS BIGINT) AS div3,
        |  o_totalprice / 2 AS half_price,
        |  round(o_orderkey / CAST(400 AS DOUBLE), 6) AS ratio
        |FROM orders ORDER BY o_orderkey LIMIT 500""".stripMargin) { (s, _) =>
      s.conf.set(graft.functions.PrestoOperators.ConfKey, "true")
      try s.sql(
        """SELECT o_orderkey,
          |  o_orderkey / 7 AS div7,
          |  (0 - o_orderkey) / 7 AS negdiv7,
          |  o_orderkey / CAST(3 AS BIGINT) AS div3,
          |  o_totalprice / 2 AS half_price,
          |  round(o_orderkey / CAST(400 AS DOUBLE), 6) AS ratio
          |FROM orders ORDER BY o_orderkey LIMIT 500""".stripMargin)
      finally s.conf.unset(graft.functions.PrestoOperators.ConfKey)
    },

    // exercised through the reference's own session surface: SET SESSION
    // graft.presto_operators (translateSessionProperty) — integer-keyed
    // map subscript goes through the same element_at rewrite as arrays;
    // string-literal keys keep the stock path (identical semantics).
    q("dialect_subscript",
      """SELECT c_custkey,
        |  [c_custkey, c_nationkey + 0, 42][1] AS first_elem,
        |  [c_custkey, c_nationkey + 0, 42][3] AS third_elem,
        |  string_split(c_mktsegment, 'U')[1] AS seg_head,
        |  map([1, 2], ['lo', 'hi'])[2][1] AS map_int_key,
        |  map(['k1', 'k2'], [c_custkey, c_nationkey + 0])['k2'][1] AS map_str_key
        |FROM customer ORDER BY c_custkey LIMIT 500""".stripMargin) { (s, _) =>
      s.sql("SET SESSION graft.presto_operators=true")
      try s.sql(
        """SELECT c_custkey,
          |  ARRAY[c_custkey, c_nationkey, 42][1] AS first_elem,
          |  ARRAY[c_custkey, c_nationkey, 42][3] AS third_elem,
          |  split(c_mktsegment, 'U')[1] AS seg_head,
          |  MAP(ARRAY[1, 2], ARRAY['lo', 'hi'])[2] AS map_int_key,
          |  MAP(ARRAY['k1', 'k2'], ARRAY[c_custkey, c_nationkey])['k2'] AS map_str_key
          |FROM customer ORDER BY c_custkey LIMIT 500""".stripMargin)
      finally s.sql("SET SESSION graft.presto_operators=false")
    },

    // ── dialect tranche 2 (round-9 verdict ask #8): the next text-level
    // constructs a porting user hits. ARRAY[…] literals (SqlBase.g4
    // arrayConstructor) — the always-on rewrite, pinned here under the
    // conf composed with 1-based subscripts and nesting; DuckDB's list
    // literals are natively 1-based so the oracle pins values. ──
    q("dialect_array_literal",
      """SELECT o_orderkey,
        |  [1, 2, o_orderkey][3] AS a3,
        |  [[o_orderkey], [o_orderkey + 1]][2][1] AS nested,
        |  len([o_orderkey, 7]) AS alen
        |FROM orders ORDER BY o_orderkey LIMIT 500""".stripMargin) { (s, _) =>
      s.conf.set(graft.functions.PrestoOperators.ConfKey, "true")
      try s.sql(
        """SELECT o_orderkey,
          |  ARRAY[1, 2, o_orderkey][3] AS a3,
          |  ARRAY[ARRAY[o_orderkey], ARRAY[o_orderkey + 1]][2][1] AS nested,
          |  cardinality(ARRAY[o_orderkey, 7]) AS alen
          |FROM orders ORDER BY o_orderkey LIMIT 500""".stripMargin)
      finally s.conf.unset(graft.functions.PrestoOperators.ConfKey)
    },

    // ── dialect tranche 3 (round 11): TIME ± INTERVAL wraps modulo 24h
    // in the reference (DateTimeOperators.java:65-74 modulo24Hour;
    // YEAR TO MONTH on a TIME is a NO-OP, :137-147) where stock Spark's
    // ANSI TIME raises DATETIME_OVERFLOW past midnight. DuckDB wraps
    // natively — including the YM no-op — so the oracle pins values
    // (r15: the engine renders TIME/TIMESTAMP varchar with MILLIS like
    // the reference's SqlTime.toString, so the oracle appends '.000').
    // DATE/TIMESTAMP ± interval keep stock behavior through the same
    // dispatch (d_ok/ts_ok guard the fallback rows, incl. the DAY-only
    // interval keeping the DATE type). ──
    q("dialect_time_wrap",
      """WITH t AS (
        |  SELECT o_orderkey,
        |    make_time(CAST(o_orderkey % 24 AS BIGINT), CAST(o_orderkey % 60 AS BIGINT),
        |              CAST(o_orderkey % 60 AS DOUBLE)) AS tod
        |  FROM orders WHERE o_orderkey < 700)
        |SELECT o_orderkey,
        |  CAST(tod + INTERVAL 90 MINUTE AS VARCHAR) || '.000' AS plus90m,
        |  CAST(tod + INTERVAL 23 HOUR AS VARCHAR) || '.000' AS plus23h,
        |  CAST(tod - INTERVAL 2 HOUR AS VARCHAR) || '.000' AS minus2h,
        |  CAST(tod + INTERVAL 3 MONTH AS VARCHAR) || '.000' AS ym_noop,
        |  CAST(CAST(DATE '2020-01-31' + INTERVAL 1 DAY AS DATE) AS VARCHAR) AS d_ok,
        |  CAST(TIMESTAMP '2020-01-01 10:00:00' + INTERVAL 2 HOUR AS VARCHAR) || '.000' AS ts_ok
        |FROM t ORDER BY o_orderkey""".stripMargin) { (s, _) =>
      s.conf.set(graft.functions.PrestoOperators.ConfKey, "true")
      try s.sql(
        """WITH t AS (
          |  SELECT o_orderkey,
          |    make_time(CAST(o_orderkey % 24 AS INT), CAST(o_orderkey % 60 AS INT),
          |              CAST(o_orderkey % 60 AS INT)) AS tod
          |  FROM orders WHERE o_orderkey < 700)
          |SELECT o_orderkey,
          |  CAST(tod + INTERVAL '90' MINUTE AS STRING) AS plus90m,
          |  CAST(tod + INTERVAL '23' HOUR AS STRING) AS plus23h,
          |  CAST(tod - INTERVAL '2' HOUR AS STRING) AS minus2h,
          |  CAST(tod + INTERVAL '3' MONTH AS STRING) AS ym_noop,
          |  CAST(DATE '2020-01-31' + INTERVAL '1' DAY AS STRING) AS d_ok,
          |  CAST(TIMESTAMP '2020-01-01 10:00:00' + INTERVAL '2' HOUR AS STRING) AS ts_ok
          |FROM t ORDER BY o_orderkey""".stripMargin)
      finally s.conf.unset(graft.functions.PrestoOperators.ConfKey)
    },

    // ── dialect tranche 3 (round 11): extremum NULL propagation.
    // The reference's greatest/least return NULL when ANY argument is
    // NULL (AbstractGreatestLeast.java:120 RETURN_NULL_ON_NULL) and
    // array_min/array_max return NULL when the array CONTAINS a null
    // (ArrayMinMaxUtils.java:41-43); Spark AND DuckDB both skip nulls
    // in all four, so the oracle states the semantics longhand (the
    // NULL cases computed by an explicit CASE). ──
    q("dialect_greatest_null",
      """SELECT o_orderkey,
        |  CASE WHEN o_orderkey % 3 = 0 THEN NULL
        |       ELSE greatest(o_orderkey, (o_orderkey % 7) * 100) END AS g,
        |  CASE WHEN o_orderkey % 5 = 0 THEN NULL
        |       ELSE least(o_orderkey, (o_orderkey % 11) * 50) END AS l,
        |  greatest(o_orderkey, (o_orderkey % 7) * 100, 42) AS g_ctrl,
        |  CASE WHEN o_orderkey % 4 = 0 THEN NULL
        |       ELSE list_min([o_orderkey, o_orderkey % 13]) END AS amn,
        |  list_max([o_orderkey, o_orderkey % 13]) AS amx_ctrl
        |FROM orders WHERE o_orderkey < 700 ORDER BY o_orderkey""".stripMargin) { (s, _) =>
      s.conf.set(graft.functions.PrestoOperators.ConfKey, "true")
      try s.sql(
        """SELECT o_orderkey,
          |  greatest(o_orderkey,
          |    CASE WHEN o_orderkey % 3 = 0 THEN NULL
          |         ELSE (o_orderkey % 7) * 100 END) AS g,
          |  least(o_orderkey,
          |    CASE WHEN o_orderkey % 5 = 0 THEN NULL
          |         ELSE (o_orderkey % 11) * 50 END) AS l,
          |  greatest(o_orderkey, (o_orderkey % 7) * 100, 42) AS g_ctrl,
          |  array_min(array(o_orderkey,
          |    CASE WHEN o_orderkey % 4 = 0 THEN NULL
          |         ELSE o_orderkey % 13 END)) AS amn,
          |  array_max(array(o_orderkey, o_orderkey % 13)) AS amx_ctrl
          |FROM orders WHERE o_orderkey < 700 ORDER BY o_orderkey""".stripMargin)
      finally s.conf.unset(graft.functions.PrestoOperators.ConfKey)
    },

    // double-quoted identifiers: Presto lexes "…" as an identifier in
    // every position (quotedIdentifier; strings are single-quoted only),
    // Spark as a string literal. This engine makes the Presto semantics
    // STANDING — GraftSession sets spark.sql.ansi.doubleQuotedIdentifiers
    // (the verbatim benchto corpus requires it) — so the oracle row runs
    // the Presto spellings (table names, aliased columns, the "" escape
    // path pinned in PrestoOperatorsSpec) under the conf, and DuckDB,
    // which natively lexes "…" as identifiers, replays them verbatim.
    q("dialect_quoted_ident",
      """SELECT "n_name" AS "nm", "n_regionkey" AS "rk",
        |  'lit "kept"' AS "a b"
        |FROM "nation" WHERE "n_nationkey" < 10 ORDER BY "nm"""".stripMargin) { (s, _) =>
      s.conf.set(graft.functions.PrestoOperators.ConfKey, "true")
      try s.sql(
        """SELECT "n_name" AS "nm", "n_regionkey" AS "rk",
          |  'lit "kept"' AS "a b"
          |FROM "nation" WHERE "n_nationkey" < 10 ORDER BY "nm"""".stripMargin)
      finally s.conf.unset(graft.functions.PrestoOperators.ConfKey)
    },

    // standalone FROM UNNEST (Presto relationPrimary — no CROSS JOIN):
    // rewritten to a one-row-dummy LATERAL VIEW subquery that projects
    // only the generated columns, so SELECT * matches Presto. Multi-arg
    // zip + explicit column alias exercised; DuckDB's unnest-in-SELECT
    // zips the same way. ──
    q("dialect_from_unnest",
      """SELECT x, y FROM (SELECT unnest(['a','b','c']) AS x,
        |  unnest([10, 20, 30]) AS y) ORDER BY y""".stripMargin) { (s, _) =>
      s.sql(
        """SELECT x, y FROM UNNEST(ARRAY['a','b','c'], ARRAY[10, 20, 30]) AS t(x, y)
          |ORDER BY y""".stripMargin)
    },

    // ── CAST(json AS ARRAY(JSON)) keeps per-element SUBTREE TEXT
    // (JsonToArrayCast.java via JsonUtil.java:892-896 — round 14, closes
    // r13 missing #1). Heterogeneous elements (nested array, object,
    // string, null) round-trip as compact JSON text with input key
    // order; the JSON null element is the TEXT 'null', not SQL NULL.
    // The DuckDB oracle states every expected subtree longhand from the
    // generating operands. ──
    q("dialect_json_array_elems",
      """WITH j AS (
        |  SELECT o_orderkey AS k,
        |    CAST(o_orderkey % 7 AS VARCHAR) AS a, CAST(o_custkey % 5 AS VARCHAR) AS b,
        |    CAST(o_orderkey % 3 AS VARCHAR) AS c, CAST(o_custkey % 9 AS VARCHAR) AS d
        |  FROM orders WHERE o_orderkey < 500)
        |SELECT k, CAST(i AS BIGINT) AS idx,
        |  CASE i WHEN 1 THEN '[' || a || ',' || b || ']'
        |         WHEN 2 THEN '{"k":' || c || '}'
        |         WHEN 3 THEN '"s' || d || '"'
        |         ELSE 'null' END AS elem
        |FROM j CROSS JOIN (SELECT unnest([1, 2, 3, 4]) AS i)
        |ORDER BY k, idx""".stripMargin) { (s, _) =>
      s.sql(
        """WITH j AS (
          |  SELECT o_orderkey AS k,
          |    '[[' || CAST(o_orderkey % 7 AS VARCHAR) || ',' || CAST(o_custkey % 5 AS VARCHAR) ||
          |    '], {"k": ' || CAST(o_orderkey % 3 AS VARCHAR) || '}, "s' ||
          |    CAST(o_custkey % 9 AS VARCHAR) || '", null]' AS txt
          |  FROM orders WHERE o_orderkey < 500)
          |SELECT k, CAST(idx AS BIGINT) AS idx, elem
          |FROM j CROSS JOIN UNNEST(CAST(json_parse(txt) AS ARRAY(JSON)))
          |  WITH ORDINALITY AS t(elem, idx)
          |ORDER BY k, idx""".stripMargin)
    },

    // ── zone-carrying TIMESTAMP WITH TIME ZONE (opt-in conf;
    // ZonedTimestamps — reference presto-spi TimestampWithTimeZoneType /
    // DateTimeEncoding, presto-main DateTimeFunctions). Operands are
    // construct-then-observe: a wall-clock string built from order keys
    // (always 10:00–13:59 local, away from every DST transition hour so
    // gap/overlap resolution differences can't leak in) interpreted in a
    // per-row REGION zone (DuckDB's ICU silently maps unknown/offset
    // zone spellings to UTC — probed — so fixed offsets are pinned in
    // ZonedTimestampsSpec instead). The DuckDB twin computes every
    // observation from its native TIMESTAMPTZ + `timezone()` with the
    // offset derived as epoch(wall)-epoch(instant). ──
    q("dialect_ztz_observe",
      """WITH t AS (
        |  SELECT o_orderkey AS k,
        |    (['Asia/Tokyo', 'America/New_York', 'Australia/Lord_Howe',
        |      'Asia/Kolkata', 'UTC'])[CAST(o_orderkey % 5 AS INTEGER) + 1] AS zone,
        |    CAST(CAST(o_orderdate AS DATE) AS VARCHAR) || ' ' ||
        |      lpad(CAST(10 + o_custkey % 4 AS VARCHAR), 2, '0') || ':' ||
        |      lpad(CAST(o_custkey % 60 AS VARCHAR), 2, '0') || ':' ||
        |      lpad(CAST(o_orderkey % 60 AS VARCHAR), 2, '0') AS ws
        |  FROM orders),
        |z AS (
        |  SELECT k, zone, CAST(ws AS TIMESTAMP) AS wall,
        |    timezone(zone, CAST(ws AS TIMESTAMP)) AS tstz
        |  FROM t),
        |o AS (
        |  SELECT *, CAST(epoch(wall) - epoch(tstz) AS BIGINT) AS off
        |  FROM z)
        |SELECT k,
        |  strftime(wall, '%Y-%m-%d %H:%M:%S.%g') || ' ' || zone AS render,
        |  strftime(wall, '%Y-%m-%dT%H:%M:%S.%g') ||
        |    CASE WHEN off = 0 THEN 'Z' ELSE
        |      (CASE WHEN off < 0 THEN '-' ELSE '+' END ||
        |       lpad(CAST(CAST((abs(off) - (abs(off) % 3600)) / 3600 AS BIGINT) AS VARCHAR), 2, '0') || ':' ||
        |       lpad(CAST(CAST((abs(off) % 3600) / 60 AS BIGINT) AS VARCHAR), 2, '0')) END AS iso,
        |  CAST(hour(wall) AS BIGINT) AS hr,
        |  CAST(minute(wall) AS BIGINT) AS mi,
        |  CAST(day(wall) AS BIGINT) AS dy,
        |  CAST(month(wall) AS BIGINT) AS mo,
        |  CAST(isodow(wall) AS BIGINT) AS dow,
        |  CAST(CAST((off - (off % 3600)) / 3600 AS BIGINT) AS BIGINT) AS tzh,
        |  CAST(CAST((off % 3600) / 60 AS BIGINT) AS BIGINT) AS tzm,
        |  CAST(wall AS VARCHAR) AS wall_str,
        |  CAST(CAST(wall AS DATE) AS VARCHAR) AS d_str,
        |  CAST(epoch(tstz) AS BIGINT) AS unix
        |FROM o ORDER BY k LIMIT 500""".stripMargin) { (s, _) =>
      s.conf.set(graft.functions.ZonedTimestamps.ConfKey, "true")
      try s.sql(
        """WITH t AS (
          |  SELECT o_orderkey AS k,
          |    element_at(array('Asia/Tokyo', 'America/New_York', 'Australia/Lord_Howe',
          |      'Asia/Kolkata', 'UTC'), CAST(o_orderkey % 5 AS INT) + 1) AS zone,
          |    concat(CAST(CAST(o_orderdate AS DATE) AS STRING), ' ',
          |      lpad(CAST(10 + o_custkey % 4 AS STRING), 2, '0'), ':',
          |      lpad(CAST(o_custkey % 60 AS STRING), 2, '0'), ':',
          |      lpad(CAST(o_orderkey % 60 AS STRING), 2, '0')) AS ws
          |  FROM orders),
          |z AS (
          |  SELECT k, with_timezone(CAST(ws AS TIMESTAMP), zone) AS zt
          |  FROM t)
          |SELECT k,
          |  CAST(zt AS VARCHAR) AS render,
          |  to_iso8601(zt) AS iso,
          |  CAST(hour(zt) AS BIGINT) AS hr,
          |  CAST(minute(zt) AS BIGINT) AS mi,
          |  CAST(day(zt) AS BIGINT) AS dy,
          |  CAST(month(zt) AS BIGINT) AS mo,
          |  CAST(day_of_week(zt) AS BIGINT) AS dow,
          |  timezone_hour(zt) AS tzh,
          |  timezone_minute(zt) AS tzm,
          |  CAST(CAST(zt AS TIMESTAMP) AS VARCHAR) AS wall_str,
          |  CAST(CAST(zt AS DATE) AS VARCHAR) AS d_str,
          |  CAST(to_unixtime(zt) AS BIGINT) AS unix
          |FROM z ORDER BY k LIMIT 500""".stripMargin)
      finally s.conf.unset(graft.functions.ZonedTimestamps.ConfKey)
    },

    // zone-carrying arithmetic: date_trunc keeps the zone; day-time
    // intervals are exact durations on the instant, year-month intervals
    // and the date_add/date_diff field functions are wall-aware
    // (DateTimeOperators.java raw-millis add vs chronology add);
    // comparisons stay instant-based across zones. The +26h column
    // CROSSES New-York's 2026-03-08 spring-forward for k≡1 (mod 5) rows
    // in the shifted-window variant below, exercised deterministically in
    // ZonedTimestampsSpec; here every row's window is DST-quiet so the
    // two engines' gap handling cannot diverge.
    q("dialect_ztz_arith",
      """WITH t AS (
        |  SELECT o_orderkey AS k,
        |    (['Asia/Tokyo', 'America/New_York', 'Australia/Lord_Howe',
        |      'Asia/Kolkata', 'UTC'])[CAST(o_orderkey % 5 AS INTEGER) + 1] AS zone,
        |    CAST(CAST(o_orderdate AS DATE) AS VARCHAR) || ' ' ||
        |      lpad(CAST(10 + o_custkey % 4 AS VARCHAR), 2, '0') || ':30:00' AS ws
        |  FROM orders),
        |z AS (
        |  SELECT k, zone, CAST(ws AS TIMESTAMP) AS wall,
        |    timezone(zone, CAST(ws AS TIMESTAMP)) AS tstz
        |  FROM t)
        |SELECT k,
        |  strftime(CAST(date_trunc('day', wall) AS TIMESTAMP), '%Y-%m-%d %H:%M:%S.%g') || ' ' || zone AS trunc_day,
        |  strftime(date_trunc('hour', wall), '%Y-%m-%d %H:%M:%S.%g') || ' ' || zone AS trunc_hour,
        |  strftime(timezone(zone, tstz + INTERVAL 26 HOUR), '%Y-%m-%d %H:%M:%S.%g') || ' ' || zone AS plus_dt,
        |  strftime(wall + INTERVAL 1 MONTH, '%Y-%m-%d %H:%M:%S.%g') || ' ' || zone AS plus_ym,
        |  strftime(wall + INTERVAL 3 DAY, '%Y-%m-%d %H:%M:%S.%g') || ' ' || zone AS dadd,
        |  CAST(3 AS BIGINT) AS dd_day,
        |  CAST(26 AS BIGINT) AS dd_hour,
        |  tstz > TIMESTAMPTZ '1995-06-15 00:00:00+00' AS cmp_lit,
        |  TRUE AS eq_cross
        |FROM z ORDER BY k LIMIT 500""".stripMargin) { (s, _) =>
      s.conf.set(graft.functions.ZonedTimestamps.ConfKey, "true")
      try s.sql(
        """WITH t AS (
          |  SELECT o_orderkey AS k,
          |    element_at(array('Asia/Tokyo', 'America/New_York', 'Australia/Lord_Howe',
          |      'Asia/Kolkata', 'UTC'), CAST(o_orderkey % 5 AS INT) + 1) AS zone,
          |    concat(CAST(CAST(o_orderdate AS DATE) AS STRING), ' ',
          |      lpad(CAST(10 + o_custkey % 4 AS STRING), 2, '0'), ':30:00') AS ws
          |  FROM orders),
          |z AS (
          |  SELECT k, with_timezone(CAST(ws AS TIMESTAMP), zone) AS zt
          |  FROM t)
          |SELECT k,
          |  CAST(date_trunc('day', zt) AS VARCHAR) AS trunc_day,
          |  CAST(date_trunc('hour', zt) AS VARCHAR) AS trunc_hour,
          |  CAST(zt + INTERVAL '26' HOUR AS VARCHAR) AS plus_dt,
          |  CAST(zt + INTERVAL '1' MONTH AS VARCHAR) AS plus_ym,
          |  CAST(date_add('day', 3, zt) AS VARCHAR) AS dadd,
          |  date_diff('day', zt, date_add('day', 3, zt)) AS dd_day,
          |  date_diff('hour', zt, zt + INTERVAL '26' HOUR) AS dd_hour,
          |  zt > TIMESTAMP '1995-06-15 00:00:00 UTC' AS cmp_lit,
          |  at_timezone(zt, 'Asia/Tokyo') = at_timezone(zt, 'America/New_York') AS eq_cross
          |FROM z ORDER BY k LIMIT 500""".stripMargin)
      finally s.conf.unset(graft.functions.ZonedTimestamps.ConfKey)
    },

    // zone-carrying GROUP BY / DISTINCT key the INSTANT (round 12
    // ZonedGroupingRule — reference TimestampWithTimeZoneType.java
    // hashes/compares the unpacked millisUtc, ignoring the zone bits):
    // the same order-date instant is carried in five different zones via
    // at_timezone (instant-preserving), and grouping must merge them.
    // The DuckDB twin never sees a zone at all — it groups the plain
    // instants — so the row is green ONLY if the struct encoding's
    // (instant, zone) pair key is rewritten away. The -1/-2 sentinel
    // rows pin count(DISTINCT z) and the SELECT DISTINCT node path.
    q("dialect_ztz_groupby",
      """WITH t AS (
        |  SELECT CAST(o_orderdate AS TIMESTAMP) AS ts FROM orders),
        |agg AS (
        |  SELECT CAST(epoch(ts) AS BIGINT) AS instant_s,
        |    CAST(count(*) AS BIGINT) AS n
        |  FROM t GROUP BY 1)
        |SELECT instant_s, n FROM agg
        |UNION ALL
        |SELECT CAST(-1 AS BIGINT), (SELECT CAST(count(DISTINCT ts) AS BIGINT) FROM t)
        |UNION ALL
        |SELECT CAST(-2 AS BIGINT), (SELECT CAST(count(*) AS BIGINT) FROM (SELECT DISTINCT ts FROM t))
        |ORDER BY instant_s""".stripMargin) { (s, _) =>
      s.conf.set(graft.functions.ZonedTimestamps.ConfKey, "true")
      try s.sql(
        """WITH t AS (
          |  SELECT at_timezone(CAST(CAST(o_orderdate AS TIMESTAMP) AS TIMESTAMP WITH TIME ZONE),
          |    element_at(array('Asia/Tokyo', 'America/New_York', 'Australia/Lord_Howe',
          |      'Asia/Kolkata', 'UTC'), CAST(o_orderkey % 5 AS INT) + 1)) AS zt
          |  FROM orders),
          |agg AS (
          |  SELECT CAST(to_unixtime(zt) AS BIGINT) AS instant_s,
          |    CAST(count(*) AS BIGINT) AS n
          |  FROM t GROUP BY zt)
          |SELECT instant_s, n FROM agg
          |UNION ALL
          |SELECT CAST(-1 AS BIGINT), (SELECT CAST(count(DISTINCT zt) AS BIGINT) FROM t)
          |UNION ALL
          |SELECT CAST(-2 AS BIGINT), (SELECT CAST(count(*) AS BIGINT) FROM (SELECT DISTINCT zt FROM t))
          |ORDER BY instant_s""".stripMargin)
      finally s.conf.unset(graft.functions.ZonedTimestamps.ConfKey)
    },

    // zone-carrying arithmetic ACROSS DST transitions (round 12 — these
    // semantics were previously pinned only in ZonedTimestampsSpec; the
    // r11 verdict asked for DuckDB-TIMESTAMPTZ replay). Each row's base
    // wall clock is 10:30 local on a day whose FOLLOWING day contains a
    // transition (NY 1995-04-02 spring-forward / 1995-10-29 fall-back,
    // London 1995-03-26 / 1995-10-22; Tokyo as the no-DST control), so:
    // day-time intervals are exact instants (+26 h is always 93 600 s),
    // the day/month FIELD adds are wall-preserving (Joda chronology add,
    // DateTimeOperators.java), and the local day length comes out 23, 24
    // or 25 hours. All result walls sit at 10:30–13:30 local — never in
    // a gap or overlap — so ICU (DuckDB) and java.time resolve
    // identically.
    q("dialect_ztz_dst",
      """WITH t AS (
        |  SELECT o_orderkey AS k,
        |    (['America/New_York', 'America/New_York', 'Europe/London',
        |      'Europe/London', 'Asia/Tokyo'])[CAST(o_orderkey % 5 AS INTEGER) + 1] AS zone,
        |    (['1995-04-01', '1995-10-28', '1995-03-25',
        |      '1995-10-21', '1995-06-15'])[CAST(o_orderkey % 5 AS INTEGER) + 1]
        |      || ' 10:30:00' AS ws
        |  FROM orders WHERE o_orderkey < 5000),
        |z AS (
        |  SELECT k, zone, CAST(ws AS TIMESTAMP) AS wall,
        |    timezone(zone, CAST(ws AS TIMESTAMP)) AS tstz
        |  FROM t)
        |SELECT k,
        |  strftime(timezone(zone, tstz + INTERVAL 26 HOUR), '%Y-%m-%d %H:%M:%S.%g') || ' ' || zone AS p26,
        |  strftime(wall + INTERVAL 1 DAY, '%Y-%m-%d %H:%M:%S.%g') || ' ' || zone AS dadd,
        |  strftime(wall + INTERVAL 1 MONTH, '%Y-%m-%d %H:%M:%S.%g') || ' ' || zone AS madd,
        |  CAST(CAST(epoch(timezone(zone, wall + INTERVAL 1 DAY)) - epoch(tstz) AS BIGINT) / 3600 AS BIGINT) AS day_hours,
        |  CAST(epoch(tstz + INTERVAL 26 HOUR) - epoch(tstz) AS BIGINT) AS s26
        |FROM z ORDER BY k LIMIT 500""".stripMargin) { (s, _) =>
      s.conf.set(graft.functions.ZonedTimestamps.ConfKey, "true")
      try s.sql(
        """WITH t AS (
          |  SELECT o_orderkey AS k,
          |    element_at(array('America/New_York', 'America/New_York', 'Europe/London',
          |      'Europe/London', 'Asia/Tokyo'), CAST(o_orderkey % 5 AS INT) + 1) AS zone,
          |    concat(element_at(array('1995-04-01', '1995-10-28', '1995-03-25',
          |      '1995-10-21', '1995-06-15'), CAST(o_orderkey % 5 AS INT) + 1),
          |      ' 10:30:00') AS ws
          |  FROM orders WHERE o_orderkey < 5000),
          |z AS (
          |  SELECT k, with_timezone(CAST(ws AS TIMESTAMP), zone) AS zt
          |  FROM t)
          |SELECT k,
          |  CAST(zt + INTERVAL '26' HOUR AS VARCHAR) AS p26,
          |  CAST(date_add('day', 1, zt) AS VARCHAR) AS dadd,
          |  CAST(zt + INTERVAL '1' MONTH AS VARCHAR) AS madd,
          |  date_diff('hour', zt, date_add('day', 1, zt)) AS day_hours,
          |  CAST(to_unixtime(zt + INTERVAL '26' HOUR) - to_unixtime(zt) AS BIGINT) AS s26
          |FROM z ORDER BY k LIMIT 500""".stripMargin)
      finally s.conf.unset(graft.functions.ZonedTimestamps.ConfKey)
    },

    // at_timezone re-zoning (instant preserved, zone replaced — reference
    // DateTimeFunctions `at_timezone`): render/extract/offset observe the
    // NEW zone while to_unixtime is invariant. Previously spec-only; the
    // DuckDB twin derives every observation from the SAME instant
    // re-walled with `timezone(zone2, tstz)`.
    q("dialect_ztz_at_timezone",
      """WITH t AS (
        |  SELECT o_orderkey AS k,
        |    (['Asia/Tokyo', 'America/New_York', 'Australia/Lord_Howe',
        |      'Asia/Kolkata', 'UTC'])[CAST(o_orderkey % 5 AS INTEGER) + 1] AS zone,
        |    (['Asia/Tokyo', 'America/New_York', 'Australia/Lord_Howe',
        |      'Asia/Kolkata', 'UTC'])[CAST((o_orderkey + 2) % 5 AS INTEGER) + 1] AS zone2,
        |    CAST(CAST(o_orderdate AS DATE) AS VARCHAR) || ' ' ||
        |      lpad(CAST(10 + o_custkey % 4 AS VARCHAR), 2, '0') || ':' ||
        |      lpad(CAST(o_custkey % 60 AS VARCHAR), 2, '0') || ':00' AS ws
        |  FROM orders),
        |z AS (
        |  SELECT k, zone2, timezone(zone, CAST(ws AS TIMESTAMP)) AS tstz
        |  FROM t),
        |o AS (
        |  SELECT k, zone2, tstz, timezone(zone2, tstz) AS wall2,
        |    CAST(epoch(timezone(zone2, tstz)) - epoch(tstz) AS BIGINT) AS off2
        |  FROM z)
        |SELECT k,
        |  strftime(wall2, '%Y-%m-%d %H:%M:%S.%g') || ' ' || zone2 AS render2,
        |  CAST(hour(wall2) AS BIGINT) AS hr2,
        |  CAST(CAST((off2 - (off2 % 3600)) / 3600 AS BIGINT) AS BIGINT) AS tzh2,
        |  CAST(0 AS BIGINT) AS dsec
        |FROM o ORDER BY k LIMIT 500""".stripMargin) { (s, _) =>
      s.conf.set(graft.functions.ZonedTimestamps.ConfKey, "true")
      try s.sql(
        """WITH t AS (
          |  SELECT o_orderkey AS k,
          |    element_at(array('Asia/Tokyo', 'America/New_York', 'Australia/Lord_Howe',
          |      'Asia/Kolkata', 'UTC'), CAST(o_orderkey % 5 AS INT) + 1) AS zone,
          |    element_at(array('Asia/Tokyo', 'America/New_York', 'Australia/Lord_Howe',
          |      'Asia/Kolkata', 'UTC'), CAST((o_orderkey + 2) % 5 AS INT) + 1) AS zone2,
          |    concat(CAST(CAST(o_orderdate AS DATE) AS STRING), ' ',
          |      lpad(CAST(10 + o_custkey % 4 AS STRING), 2, '0'), ':',
          |      lpad(CAST(o_custkey % 60 AS STRING), 2, '0'), ':00') AS ws
          |  FROM orders),
          |z AS (
          |  SELECT k, zone2, with_timezone(CAST(ws AS TIMESTAMP), zone) AS zt
          |  FROM t)
          |SELECT k,
          |  CAST(at_timezone(zt, zone2) AS VARCHAR) AS render2,
          |  CAST(hour(at_timezone(zt, zone2)) AS BIGINT) AS hr2,
          |  timezone_hour(at_timezone(zt, zone2)) AS tzh2,
          |  CAST(to_unixtime(at_timezone(zt, zone2)) - to_unixtime(zt) AS BIGINT) AS dsec
          |FROM z ORDER BY k LIMIT 500""".stripMargin)
      finally s.conf.unset(graft.functions.ZonedTimestamps.ConfKey)
    },

    // min/max aggregates and window ORDER BY on zoned values follow the
    // INSTANT (reference millisUtc compareTo) — previously pinned only by
    // the instant-order spec. Construction guarantees globally unique
    // instants (one fixed date, wall = 10:00 + k seconds with k < 2700,
    // and the five zone offsets ≥ 5 400 s apart), so cross-engine
    // ordering is deterministic without relying on tie-break choices;
    // groups (k % 7) mix all five zones. Outputs are instants (epoch
    // seconds) — the zone of the winning value is arbitrary in the
    // reference and is not compared.
    q("dialect_ztz_minmax_order",
      """WITH t AS (
        |  SELECT o_orderkey AS k,
        |    (['Asia/Tokyo', 'America/New_York', 'Australia/Lord_Howe',
        |      'Asia/Kolkata', 'UTC'])[CAST(o_orderkey % 5 AS INTEGER) + 1] AS zone,
        |    TIMESTAMP '1995-06-15 10:00:00' + o_orderkey * INTERVAL 1 SECOND AS wall
        |  FROM orders WHERE o_orderkey < 2700),
        |z AS (
        |  SELECT k, CAST(k % 7 AS BIGINT) AS g,
        |    timezone(zone, wall) AS tstz
        |  FROM t),
        |r AS (
        |  SELECT g, k,
        |    row_number() OVER (PARTITION BY g ORDER BY epoch(tstz)) AS rnk,
        |    CAST(epoch(min(tstz) OVER (PARTITION BY g)) AS BIGINT) AS min_s,
        |    CAST(epoch(max(tstz) OVER (PARTITION BY g)) AS BIGINT) AS max_s
        |  FROM z)
        |SELECT g, CAST(rnk AS BIGINT) AS rnk, k, min_s, max_s
        |FROM r WHERE rnk <= 3 ORDER BY g, rnk""".stripMargin) { (s, _) =>
      s.conf.set(graft.functions.ZonedTimestamps.ConfKey, "true")
      try s.sql(
        """WITH t AS (
          |  SELECT o_orderkey AS k,
          |    element_at(array('Asia/Tokyo', 'America/New_York', 'Australia/Lord_Howe',
          |      'Asia/Kolkata', 'UTC'), CAST(o_orderkey % 5 AS INT) + 1) AS zone,
          |    timestampadd(SECOND, o_orderkey, TIMESTAMP '1995-06-15 10:00:00') AS wall
          |  FROM orders WHERE o_orderkey < 2700),
          |z AS (
          |  SELECT k, CAST(k % 7 AS BIGINT) AS g,
          |    with_timezone(wall, zone) AS zt
          |  FROM t),
          |r AS (
          |  SELECT g, k,
          |    row_number() OVER (PARTITION BY g ORDER BY zt) AS rnk,
          |    CAST(to_unixtime(min(zt) OVER (PARTITION BY g)) AS BIGINT) AS min_s,
          |    CAST(to_unixtime(max(zt) OVER (PARTITION BY g)) AS BIGINT) AS max_s
          |  FROM z)
          |SELECT g, CAST(rnk AS BIGINT) AS rnk, k, min_s, max_s
          |FROM r WHERE rnk <= 3 ORDER BY g, rnk""".stripMargin)
      finally s.conf.unset(graft.functions.ZonedTimestamps.ConfKey)
    },

    // set operations on zoned values key the INSTANT (round 13 —
    // ZonedGroupingRule's Intersect/Except/Union-DISTINCT arms;
    // reference TimestampWithTimeZoneType.java millisUtc equality). The
    // two sides carry the SAME instants in DIFFERENT zones (Tokyo vs
    // New York via instant-preserving at_timezone), so INTERSECT is
    // nonempty ONLY if (instant, zone) pair keying is rewritten away —
    // the unfixed engine returns 0 rows here. The DuckDB twin never
    // sees a zone. Sums of surviving instants pin the VALUES, not just
    // the counts.
    q("dialect_ztz_setop",
      """WITH a AS (
        |  SELECT CAST(o_orderdate AS TIMESTAMP) AS zt
        |  FROM orders WHERE o_orderkey % 3 = 0),
        |b AS (
        |  SELECT CAST(o_orderdate AS TIMESTAMP) AS zt
        |  FROM orders WHERE o_orderkey % 2 = 0)
        |SELECT op, n, s FROM (
        |  SELECT 'intersect' AS op, CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(epoch(zt)) AS BIGINT) AS s
        |  FROM (SELECT zt FROM a INTERSECT SELECT zt FROM b)
        |  UNION ALL
        |  SELECT 'except', CAST(count(*) AS BIGINT), CAST(sum(epoch(zt)) AS BIGINT)
        |  FROM (SELECT zt FROM a EXCEPT SELECT zt FROM b)
        |  UNION ALL
        |  SELECT 'union_d', CAST(count(*) AS BIGINT), CAST(sum(epoch(zt)) AS BIGINT)
        |  FROM (SELECT zt FROM a UNION SELECT zt FROM b))
        |ORDER BY op""".stripMargin) { (s, _) =>
      s.conf.set(graft.functions.ZonedTimestamps.ConfKey, "true")
      try s.sql(
        """WITH a AS (
          |  SELECT at_timezone(CAST(CAST(o_orderdate AS TIMESTAMP) AS TIMESTAMP WITH TIME ZONE),
          |    'Asia/Tokyo') AS zt
          |  FROM orders WHERE o_orderkey % 3 = 0),
          |b AS (
          |  SELECT at_timezone(CAST(CAST(o_orderdate AS TIMESTAMP) AS TIMESTAMP WITH TIME ZONE),
          |    'America/New_York') AS zt
          |  FROM orders WHERE o_orderkey % 2 = 0)
          |SELECT op, n, s FROM (
          |  SELECT 'intersect' AS op, CAST(count(*) AS BIGINT) AS n,
          |    CAST(sum(to_unixtime(zt)) AS BIGINT) AS s
          |  FROM (SELECT zt FROM a INTERSECT SELECT zt FROM b)
          |  UNION ALL
          |  SELECT 'except', CAST(count(*) AS BIGINT), CAST(sum(to_unixtime(zt)) AS BIGINT)
          |  FROM (SELECT zt FROM a EXCEPT SELECT zt FROM b)
          |  UNION ALL
          |  SELECT 'union_d', CAST(count(*) AS BIGINT), CAST(sum(to_unixtime(zt)) AS BIGINT)
          |  FROM (SELECT zt FROM a UNION SELECT zt FROM b))
          |ORDER BY op""".stripMargin)
      finally s.conf.unset(graft.functions.ZonedTimestamps.ConfKey)
    },

    // now()/current_timestamp under the zoned mode return TIMESTAMP WITH
    // TIME ZONE in the SESSION zone (round 13; DateTimeFunctions.java
    // currentTimestamp). The value itself is wall-clock-dependent, so
    // the oracle compares INVARIANTS: the carried zone is the session
    // zone (offset fields 0, rendering ends in ' UTC'), the instant
    // agrees with localtimestamp (same ComputeCurrentTime epoch), and
    // the bare CURRENT_TIMESTAMP keyword matches now().
    q("dialect_ztz_now",
      """SELECT CAST(0 AS BIGINT) AS tzh, CAST(0 AS BIGINT) AS tzm,
        |  CAST(1 AS BIGINT) AS zone_tok, CAST(1 AS BIGINT) AS same_epoch,
        |  CAST(1 AS BIGINT) AS kw_parity""".stripMargin) { (s, _) =>
      s.conf.set(graft.functions.ZonedTimestamps.ConfKey, "true")
      try s.sql(
        """SELECT
          |  CAST(timezone_hour(now()) AS BIGINT) AS tzh,
          |  CAST(timezone_minute(now()) AS BIGINT) AS tzm,
          |  CAST(CASE WHEN CAST(now() AS VARCHAR) LIKE '% UTC' THEN 1 ELSE 0 END AS BIGINT) AS zone_tok,
          |  CAST(CASE WHEN abs(to_unixtime(now()) - to_unixtime(localtimestamp)) < 2.0
          |    THEN 1 ELSE 0 END AS BIGINT) AS same_epoch,
          |  CAST(CASE WHEN to_unixtime(current_timestamp) = to_unixtime(now())
          |    THEN 1 ELSE 0 END AS BIGINT) AS kw_parity""".stripMargin)
      finally s.conf.unset(graft.functions.ZonedTimestamps.ConfKey)
    },

    // ── TIME WITH TIME ZONE under the zoned mode, oracle-compared
    // (round 12 — the last zoned surface that had no oracle at all;
    // DuckDB's own TIMETZ orders (wall, offset) where the reference
    // orders raw UTC-normalized nanos, so every expected value is
    // computed LONGHAND from the same operand grid instead — the
    // dialect_time_wrap pattern). 500 rows × 7 zones (fixed offsets
    // incl. ±fractional and +13:45, named zones incl. the Kathmandu
    // 1970-epoch-offset quirk: the reference's packed chronology takes
    // a region zone's offset AT 1970-01-01, so Asia/Kathmandu is
    // +05:30 here, not today's +05:45 — TimeWithTimeZoneType /
    // DateTimeFunctions.java). Covers rendering, wall fields,
    // epoch-date offset fields, modulo-24h interval wrap in BOTH
    // directions plus the 26h (>1 day) and YEAR-TO-MONTH-no-op shapes
    // (DateTimeOperators.java:79-137), and raw-UTC-nanos comparison
    // incl. constructed cross-zone equality (gated on the re-zoned
    // wall staying inside [0, 24h) — outside it the unwrapped UTC
    // nanos differ by a day and equality must FAIL; the gate itself is
    // a compared column).
    {
      val zoneList = "'UTC','+05:30','-03:30','+13:45','Asia/Tokyo'," +
        "'America/New_York','Asia/Kathmandu'"
      val offList = "0, 19800, -12600, 49500, 32400, -18000, 19800"
      def p(e: String, n: Int) =
        s"lpad(CAST(CAST($e AS BIGINT) AS STRING), $n, '0')"
      def todTxt(tod: String, ms: String) =
        s"concat(${p(s"(($tod) - ($tod) % 3600) / 3600", 2)}, ':', " +
          s"${p(s"(($tod) % 3600 - ($tod) % 60) / 60", 2)}, ':', " +
          s"${p(s"($tod) % 60", 2)}, '.', ${p(ms, 3)})"
      val gridDuck =
        """WITH g AS (
          |  SELECT i,
          |    (i * 1103515245 + 12345) % 2147483648 AS h1,
          |    (i * 69069 + 99991) % 2147483648 AS h2
          |  FROM range(0, 500) t(i)
          |)""".stripMargin
      val gridSpark =
        """WITH g AS (
          |  SELECT id AS i,
          |    (id * 1103515245 + 12345) % 2147483648 AS h1,
          |    (id * 69069 + 99991) % 2147483648 AS h2
          |  FROM range(0, 500)
          |)""".stripMargin
      q("dialect_ttz_parity",
        gridDuck +
          s""", o AS (
             |  SELECT i,
             |    ([$zoneList])[CAST(i % 7 AS INTEGER) + 1] AS zone,
             |    ([$zoneList])[CAST((i + 3) % 7 AS INTEGER) + 1] AS zone2,
             |    ([$offList])[CAST(i % 7 AS INTEGER) + 1] AS off1,
             |    ([$offList])[CAST((i + 3) % 7 AS INTEGER) + 1] AS off2,
             |    h1 % 86400 AS tod,
             |    h2 % 86400 AS tod2,
             |    (h2 % 8) * 125 AS ms
             |  FROM g
             |)
             |SELECT i,
             |  concat(${todTxt("tod", "ms")}, ' ', zone) AS render,
             |  CAST((tod - tod % 3600) / 3600 AS BIGINT) AS hr,
             |  CAST((tod % 3600 - tod % 60) / 60 AS BIGINT) AS mi,
             |  CAST(tod % 60 AS BIGINT) AS sec,
             |  CAST(ms AS BIGINT) AS msec,
             |  CAST((off1 - (off1 % 3600)) / 3600 AS BIGINT) AS tzh,
             |  CAST((off1 % 3600) / 60 AS BIGINT) AS tzm,
             |  concat(${todTxt("(tod + 5700) % 86400", "ms")}, ' ', zone) AS plus95m,
             |  concat(${todTxt("((tod - 12000) % 86400 + 86400) % 86400", "ms")}, ' ', zone) AS minus200m,
             |  concat(${todTxt("(tod + 93600) % 86400", "ms")}, ' ', zone) AS plus26h,
             |  concat(${todTxt("tod", "ms")}, ' ', zone) AS ym_noop,
             |  (tod - off1) < (tod2 - off2) AS lt,
             |  (tod - off1) < tod2 AS ltm,
             |  (tod - off1 + off2) BETWEEN 0 AND 86399 AS eq_rezone,
             |  (tod - off1 + off2) BETWEEN 0 AND 86399 AS eq_possible
             |FROM o ORDER BY i""".stripMargin) { (s, _) =>
        s.conf.set(graft.functions.ZonedTimestamps.ConfKey, "true")
        try s.sql(
          gridSpark +
            s""", o AS (
               |  SELECT i,
               |    element_at(array($zoneList), CAST(i % 7 AS INT) + 1) AS zone,
               |    element_at(array($zoneList), CAST((i + 3) % 7 AS INT) + 1) AS zone2,
               |    element_at(array($offList), CAST(i % 7 AS INT) + 1) AS off1,
               |    element_at(array($offList), CAST((i + 3) % 7 AS INT) + 1) AS off2,
               |    h1 % 86400 AS tod,
               |    h2 % 86400 AS tod2,
               |    (h2 % 8) * 125 AS ms
               |  FROM g
               |), z AS (
               |  SELECT i, off1, off2, tod, tod2, ms,
               |    CAST(concat(${todTxt("tod", "ms")}, ' ', zone) AS TIME WITH TIME ZONE) AS t1,
               |    CAST(concat(${todTxt("tod2", "ms")}, ' ', zone2) AS TIME WITH TIME ZONE) AS t2,
               |    CAST(concat(${todTxt("((tod - off1 + off2) % 86400 + 86400) % 86400", "ms")}, ' ', zone2) AS TIME WITH TIME ZONE) AS te
               |  FROM o
               |)
               |SELECT i,
               |  CAST(t1 AS VARCHAR) AS render,
               |  CAST(hour(t1) AS BIGINT) AS hr,
               |  CAST(minute(t1) AS BIGINT) AS mi,
               |  CAST(second(t1) AS BIGINT) AS sec,
               |  CAST(millisecond(t1) AS BIGINT) AS msec,
               |  CAST(timezone_hour(t1) AS BIGINT) AS tzh,
               |  CAST(timezone_minute(t1) AS BIGINT) AS tzm,
               |  CAST(t1 + INTERVAL '95' MINUTE AS VARCHAR) AS plus95m,
               |  CAST(t1 - INTERVAL '200' MINUTE AS VARCHAR) AS minus200m,
               |  CAST(t1 + INTERVAL '26' HOUR AS VARCHAR) AS plus26h,
               |  CAST(t1 + INTERVAL '2' MONTH AS VARCHAR) AS ym_noop,
               |  t1 < t2 AS lt,
               |  t1 < CAST(${todTxt("tod2", "ms")} AS TIME) AS ltm,
               |  t1 = te AS eq_rezone,
               |  (tod - off1 + off2) BETWEEN 0 AND 86399 AS eq_possible
               |FROM z ORDER BY i""".stripMargin)
        finally s.conf.unset(graft.functions.ZonedTimestamps.ConfKey)
      }
    },

    // ── dialect tranche 4 (round 12, probed against SqlBase.g4 +
    // JsonUtil.java): CAST(complex AS JSON) semantics. The reference
    // renders ROWs as JSON ARRAYS (RowJsonGeneratorWriter writes
    // start/end-array — field names discarded) and map keys
    // stringified then SORTED AS STRINGS (MapJsonGeneratorWriter's
    // TreeMap: map(10→…, 2→…) renders {"10":…,"2":…}) — both diverge
    // from Spark's to_json (objects, map order). PrestoJsonRender
    // (ScalarExprs.scala) implements the writer family; the DuckDB
    // oracle builds the expected texts by string construction from the
    // same source rows. Probed-identical constructs shipped WITHOUT
    // rows (no divergence): DECIMAL '1.2' / X'ab' typed literals,
    // row-field access r.f; TRY(subquery) divergence documented in
    // COVERAGE (we catch subquery errors the reference propagates). ──
    q("dialect_json_complex",
      """SELECT o_orderkey AS k,
        |  '[' || o_orderkey || ',"q\"' || o_orderstatus || '",true,null]' AS rj,
        |  '{"10":' || (o_orderkey + 2) || ',"2":' || (o_orderkey + 3) ||
        |    ',"alpha":' || (o_orderkey + 1) || ',"beta":' || o_orderkey || '}' AS mj,
        |  '[[' || o_orderkey || ',"' || o_orderstatus || '"],null]' AS aj,
        |  '[' || o_orderkey || '.00,1.20]' AS dj
        |FROM orders ORDER BY k LIMIT 500""".stripMargin) { (s, _) =>
      s.sql(
        """SELECT o_orderkey AS k,
          |  CAST(ROW(o_orderkey, concat('q"', o_orderstatus), true,
          |           CAST(NULL AS INTEGER)) AS JSON) AS rj,
          |  CAST(MAP(ARRAY['beta', 'alpha', '10', '2'],
          |           ARRAY[o_orderkey, o_orderkey + 1, o_orderkey + 2,
          |                 o_orderkey + 3]) AS JSON) AS mj,
          |  CAST(ARRAY[ROW(o_orderkey, o_orderstatus),
          |             CAST(NULL AS STRUCT<field0: BIGINT,
          |                                 field1: STRING>)] AS JSON) AS aj,
          |  CAST(ROW(CAST(o_orderkey AS DECIMAL(12,2)),
          |           CAST(1.20 AS DECIMAL(5,2))) AS JSON) AS dj
          |FROM orders ORDER BY k LIMIT 500""".stripMargin)
    },

    // The REVERSE direction (round 12): CAST(json AS ROW/ARRAY/MAP) +
    // the `JSON '…'` typed literal (SqlBase.g4 primaryExpression).
    // Reference JsonUtil.java BlockBuilderAppenders accept JSON ARRAYS
    // positionally for ROW targets (and objects by lower-cased name,
    // missing→null), parse MAP keys from field-name TEXT, and coerce
    // across token classes (string→number parse, boolean→1,
    // double→BIGINT rounds HALF_UP) — all places from_json silently
    // nulls or rejects; PrestoJsonDecode (ScalarExprs.scala) implements
    // the contract. DuckDB oracle computes every expected value
    // arithmetically from the same source rows. ──
    q("dialect_json_decode",
      """SELECT o_orderkey AS k,
        |  o_orderkey AS a, 's' || o_orderstatus AS b, o_orderkey + 5 AS c,
        |  CAST(3 AS BIGINT) AS d, CAST(1 AS BIGINT) AS e,
        |  o_orderkey AS x, o_orderkey * 2 AS y, CAST(NULL AS VARCHAR) AS z,
        |  o_orderkey + 1 AS mv, CAST(8 AS BIGINT) AS m7,
        |  CAST(1 AS BIGINT) AS a1, CAST(2 AS BIGINT) AS a2,
        |  CAST(4 AS BIGINT) AS a3, CAST(1 AS BIGINT) AS a4,
        |  CAST(NULL AS BIGINT) AS a5
        |FROM orders ORDER BY k LIMIT 500""".stripMargin) { (s, _) =>
      s.sql(
        """WITH t AS (
          |  SELECT o_orderkey AS k,
          |    CAST('[' || CAST(o_orderkey AS VARCHAR) || ',"s' || o_orderstatus ||
          |         '","' || CAST(o_orderkey + 5 AS VARCHAR) || '",2.5,true]'
          |      AS ROW(a BIGINT, b VARCHAR, c BIGINT, d BIGINT, e BIGINT)) AS pr,
          |    CAST('{"x":' || CAST(o_orderkey AS VARCHAR) || ',"Y":"' ||
          |         CAST(o_orderkey * 2 AS VARCHAR) || '"}'
          |      AS ROW(y BIGINT, x BIGINT, z VARCHAR)) AS nr,
          |    CAST('{"' || CAST(o_orderkey + 100000 AS VARCHAR) || '":' ||
          |         CAST(o_orderkey + 1 AS VARCHAR) || ',"7":"8"}'
          |      AS MAP(BIGINT, BIGINT)) AS m,
          |    CAST(JSON ' [1, "2", 3.5, true, null] ' AS ARRAY(BIGINT)) AS arr
          |  FROM orders)
          |SELECT k,
          |  pr.a AS a, pr.b AS b, pr.c AS c, pr.d AS d, pr.e AS e,
          |  nr.x AS x, nr.y AS y, nr.z AS z,
          |  element_at(m, k + 100000) AS mv, element_at(m, 7) AS m7,
          |  element_at(arr, 1) AS a1, element_at(arr, 2) AS a2,
          |  element_at(arr, 3) AS a3, element_at(arr, 4) AS a4,
          |  element_at(arr, 5) AS a5
          |FROM t ORDER BY k LIMIT 500""".stripMargin)
    },

    // ORDER BY inside array_agg (Presto grammar aggregate sortItem;
    // Spark has no in-aggregate sort): rewritten to a comparator
    // array_sort over (value, keys) structs. Single-key DESC, multi-key
    // with ties, and DISTINCT (→ array_distinct, first-occurrence
    // multiset) all pinned; arrays emit as joined strings because the
    // driver's comparator cannot sort array cells. ──
    q("dialect_array_agg_order",
      """SELECT n_regionkey,
        |  array_to_string(array_agg(n_name ORDER BY n_nationkey DESC), '|') AS names_desc,
        |  array_to_string(array_agg(n_name ORDER BY n_nationkey % 3, n_name DESC), '|') AS names_multi,
        |  array_to_string(list_sort(list_distinct(array_agg(CAST(n_nationkey % 4 AS VARCHAR)))), '|') AS dk
        |FROM nation GROUP BY n_regionkey ORDER BY n_regionkey""".stripMargin) { (s, _) =>
      s.sql(
        """SELECT n_regionkey,
          |  concat_ws('|', array_agg(n_name ORDER BY n_nationkey DESC)) AS names_desc,
          |  concat_ws('|', array_agg(n_name ORDER BY n_nationkey % 3, n_name DESC)) AS names_multi,
          |  concat_ws('|', array_sort(array_agg(DISTINCT CAST(n_nationkey % 4 AS STRING)))) AS dk
          |FROM nation GROUP BY n_regionkey ORDER BY n_regionkey""".stripMargin)
    },

    // EXTRACT field semantics (always-on dialect veneer, like the
    // date_add rewrite): Presto's AstBuilder delegates every field to
    // the matching scalar function, so DOW is ISO day_of_week (Mon=1 …
    // Sun=7) where Spark's own EXTRACT(DOW) is 0-based Sunday-start —
    // a silent off-by-one-and-wrap a porting user would hit on every
    // weekday filter. DuckDB's isodow/isoyear natively share Presto's
    // definitions, so the oracle pins values across the whole date
    // column. ──
    q("dialect_extract",
      """SELECT o_orderkey,
        |  CAST(EXTRACT(isodow FROM o_orderdate) AS BIGINT) AS dow,
        |  CAST(EXTRACT(doy FROM o_orderdate) AS BIGINT) AS doy,
        |  CAST(EXTRACT(isoyear FROM o_orderdate) AS BIGINT) AS yow,
        |  CAST(EXTRACT(week FROM o_orderdate) AS BIGINT) AS wk,
        |  CAST(EXTRACT(quarter FROM o_orderdate) AS BIGINT) AS qtr
        |FROM orders ORDER BY o_orderkey LIMIT 500""".stripMargin) { (s, _) =>
      s.sql(
        """SELECT o_orderkey,
          |  CAST(EXTRACT(DOW FROM o_orderdate) AS BIGINT) AS dow,
          |  CAST(EXTRACT(DOY FROM o_orderdate) AS BIGINT) AS doy,
          |  CAST(EXTRACT(YOW FROM o_orderdate) AS BIGINT) AS yow,
          |  CAST(EXTRACT(WEEK FROM o_orderdate) AS BIGINT) AS wk,
          |  CAST(EXTRACT(QUARTER FROM o_orderdate) AS BIGINT) AS qtr
          |FROM orders ORDER BY o_orderkey LIMIT 500""".stripMargin)
    },

    // floating/decimal → integral CAST rounding (dialect tranche 3):
    // the reference rounds HALF_UP — half away from zero
    // (DoubleOperators.castToLong: DoubleMath.roundToLong(HALF_UP)),
    // Spark truncates, DuckDB rounds half-even — a THREE-way divergence
    // (FnSpec pins all three characterizations). Under the conf the
    // late-binding PrestoCastToIntegral restores reference semantics;
    // the oracle computes the expected values arithmetically since
    // DuckDB's own cast disagrees with both. String→integral stays the
    // shared ANSI parse (the passthrough column).
    q("dialect_cast_rounding",
      """SELECT o_orderkey,
        |  CAST(o_orderkey + 1 AS BIGINT) AS hu_pos,
        |  CAST(-(o_orderkey + 1) AS BIGINT) AS hu_neg,
        |  CAST(o_orderkey AS BIGINT) AS hu_frac,
        |  CAST(o_orderkey + 1 AS BIGINT) AS hu_dec,
        |  CAST(o_orderkey AS BIGINT) AS str_passthrough
        |FROM orders ORDER BY o_orderkey LIMIT 500""".stripMargin) { (s, _) =>
      s.conf.set(graft.functions.PrestoOperators.ConfKey, "true")
      try s.sql(
        """SELECT o_orderkey,
          |  CAST(o_orderkey + 0.5D AS BIGINT) AS hu_pos,
          |  CAST(-(o_orderkey + 0.5D) AS BIGINT) AS hu_neg,
          |  CAST(o_orderkey + 0.3D AS BIGINT) AS hu_frac,
          |  CAST(CAST(o_orderkey AS DECIMAL(18,1)) + CAST(0.5 AS DECIMAL(2,1)) AS BIGINT) AS hu_dec,
          |  CAST(CAST(o_orderkey AS STRING) AS BIGINT) AS str_passthrough
          |FROM orders ORDER BY o_orderkey LIMIT 500""".stripMargin)
      finally s.conf.unset(graft.functions.PrestoOperators.ConfKey)
    },

    // reduce() 4-arg lambda spelling (ArrayReduceFunction.java — state
    // fold + output lambda): Spark 4's `reduce` IS the same surface, so
    // the pin proves the verbatim Presto text runs; the oracle computes
    // the fold arithmetically (DuckDB's list_reduce has no init/output
    // lambda form).
    q("dialect_reduce",
      """SELECT o_orderkey,
        |  (o_orderkey + 5) * 10 AS folded,
        |  CAST(round((o_orderkey + 5) / 2.0, 2) AS DOUBLE) AS avg2
        |FROM orders ORDER BY o_orderkey LIMIT 500""".stripMargin) { (s, _) =>
      s.conf.set(graft.functions.PrestoOperators.ConfKey, "true")
      try s.sql(
        """SELECT o_orderkey,
          |  reduce(ARRAY[o_orderkey, 2, 3], CAST(0 AS BIGINT), (s, x) -> s + x, s -> s * 10) AS folded,
          |  CAST(reduce(ARRAY[o_orderkey, 5],
          |    CAST(ROW(0.0, 0) AS STRUCT<sum: DOUBLE, count: INT>),
          |    (s, x) -> CAST(ROW(s.sum + x, s.count + 1) AS STRUCT<sum: DOUBLE, count: INT>),
          |    s -> round(s.sum / s.count, 2)) AS DOUBLE) AS avg2
          |FROM orders ORDER BY o_orderkey LIMIT 500""".stripMargin)
      finally s.conf.unset(graft.functions.PrestoOperators.ConfKey)
    },
  )
}
