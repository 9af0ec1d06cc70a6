package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.GraftSqlParser.rewrite

/** Direct pins for the dialect parser's textual rewrites — these run on
  * EVERY statement the engine parses, so each transformation and, just
  * as important, each non-transformation (plain Spark SQL must pass
  * through byte-identical) gets an explicit contract here.
  */
class ParserSpec extends AnyFunSuite {

  test("date_add/date_diff quoted units become timestampadd/timestampdiff") {
    assert(rewrite("SELECT date_add('day', 5, ts)") == "SELECT timestampadd(day, 5, ts)")
    assert(rewrite("SELECT date_diff('month', a, b)") == "SELECT timestampdiff(month, a, b)")
  }

  test("ARRAY literals convert innermost-first so nesting works") {
    assert(rewrite("SELECT ARRAY[1, 2, 3]") == "SELECT array(1, 2, 3)")
    assert(rewrite("SELECT ARRAY[ARRAY[1], ARRAY[2]]") == "SELECT array(array(1), array(2))")
  }

  test("CAST rewrites: JSON, Presto complex types, bare VARCHAR") {
    assert(rewrite("SELECT CAST(x AS JSON)") == "SELECT cast_to_json(x)")
    assert(rewrite("SELECT CAST(j AS ARRAY(VARCHAR))") == "SELECT complex_cast(j, 'ARRAY<STRING>')")
    assert(rewrite("SELECT CAST(j AS MAP(VARCHAR, BIGINT))") ==
      "SELECT complex_cast(j, 'MAP<STRING, BIGINT>')")
    assert(rewrite("SELECT CAST(j AS ROW(a VARCHAR, b DOUBLE))") ==
      "SELECT complex_cast(j, 'STRUCT<a: STRING, b: DOUBLE>')")
    assert(rewrite("SELECT CAST(x AS VARCHAR)") == "SELECT CAST(x AS STRING)")
    // nested: inner cast rewritten inside the outer's expression side
    assert(rewrite("SELECT CAST(CAST(x AS JSON) AS ARRAY(BIGINT))") ==
      "SELECT complex_cast(cast_to_json(x), 'ARRAY<BIGINT>')")
  }

  test("CAST non-rewrites: Spark types and spellings pass through") {
    assert(rewrite("SELECT CAST(x AS BIGINT)") == "SELECT CAST(x AS BIGINT)")
    assert(rewrite("SELECT CAST(x AS DECIMAL(10,2))") == "SELECT CAST(x AS DECIMAL(10,2))")
    assert(rewrite("SELECT CAST(x AS VARCHAR(10))") == "SELECT CAST(x AS VARCHAR(10))")
    // the angle spelling is ALSO the reference grammar's legacy complex
    // form (round 13), so it routes through the complex-cast dispatch —
    // structurally identical for every input Spark's own CAST accepted,
    // additive (reference JSON-decode) for string sources Spark rejected
    assert(rewrite("SELECT CAST(x AS ARRAY<STRING>)") ==
      "SELECT complex_cast(x, 'ARRAY<STRING>')")
  }

  test("UNNEST forms: single, map, multi-arg zip, WITH ORDINALITY") {
    assert(rewrite("SELECT * FROM t CROSS JOIN UNNEST(xs) AS u(x)") ==
      "SELECT * FROM t LATERAL VIEW explode(xs) u AS x")
    assert(rewrite("SELECT * FROM t CROSS JOIN UNNEST(m) AS u(k, v)") ==
      "SELECT * FROM t LATERAL VIEW explode(m) u AS k, v")
    assert(rewrite("SELECT * FROM t CROSS JOIN UNNEST(a, b) AS u(x, y)") ==
      "SELECT * FROM t LATERAL VIEW inline(arrays_zip(a, b)) u AS x, y")
    assert(rewrite("SELECT * FROM t CROSS JOIN UNNEST(xs) WITH ORDINALITY AS u(x, o)") ==
      "SELECT * FROM t LATERAL VIEW inline(transform(xs, (e, i) -> struct(e, CAST(i + 1 AS BIGINT)))) u AS x, o")
    // parenthesized argument expressions survive (paren-balanced scan)
    assert(rewrite("SELECT * FROM t CROSS JOIN UNNEST(map_from_arrays(array(1), array(2))) AS u(k, v)") ==
      "SELECT * FROM t LATERAL VIEW explode(map_from_arrays(array(1), array(2))) u AS k, v")
  }

  test("MAP constructor: two-array Presto form only") {
    // round 13: EVERY two-arg MAP(a, b) routes through the late-binding
    // MapCtorDispatch (array pair → map_from_arrays on RESOLVED types;
    // the old textual array(-prefix check silently built a one-entry
    // Spark map for MAP(CAST(..), ..) / MAP(key_col, val_col))
    assert(rewrite("SELECT MAP(ARRAY['a'], ARRAY[1])") ==
      "SELECT graft_map_ctor(array('a'), array(1))")
    // Spark's variadic map() untouched
    assert(rewrite("SELECT map('k', 1, 'j', 2)") == "SELECT map('k', 1, 'j', 2)")
    // CAST type text MAP(...) is handled by the cast rewrite, not this one
    assert(rewrite("SELECT CAST(j AS MAP(VARCHAR, VARCHAR))") ==
      "SELECT complex_cast(j, 'MAP<STRING, STRING>')")
  }

  test("Presto EXPLAIN dialect: option list and ANALYZE map to Spark modes") {
    assert(rewrite("EXPLAIN (TYPE DISTRIBUTED) SELECT 1") ==
      "EXPLAIN FORMATTED SELECT 1")
    assert(rewrite("EXPLAIN (TYPE LOGICAL) SELECT 1") ==
      "EXPLAIN EXTENDED SELECT 1")
    assert(rewrite("EXPLAIN (FORMAT TEXT, TYPE IO) SELECT 1") ==
      "EXPLAIN FORMATTED SELECT 1")
    assert(rewrite("EXPLAIN ANALYZE SELECT 1") == "EXPLAIN FORMATTED SELECT 1")
    assert(rewrite("explain analyze verbose SELECT 1") ==
      "EXPLAIN FORMATTED SELECT 1")
    // plain EXPLAIN and non-EXPLAIN statements untouched
    assert(rewrite("EXPLAIN SELECT 1") == "EXPLAIN SELECT 1")
    assert(rewrite("SELECT 'EXPLAIN (TYPE IO)'") == "SELECT 'EXPLAIN (TYPE IO)'")
    // end-to-end through the session parser
    val rows = TestSession.spark.sql(
      "EXPLAIN (TYPE DISTRIBUTED) SELECT 1 + 1").collect()
    assert(rows.nonEmpty && rows(0).getString(0).contains("Physical Plan"))
  }

  test("Presto DECIMAL literals carry their textual precision/scale") {
    assert(rewrite("SELECT DECIMAL '12.34'") ==
      "SELECT CAST('12.34' AS DECIMAL(4, 2))")
    // reference Decimals.java:115 — leading integral zeros don't count:
    // precision = integralPart(0) + scale(3)
    assert(rewrite("SELECT DECIMAL '-0.001'") ==
      "SELECT CAST('-0.001' AS DECIMAL(3, 3))")
    assert(rewrite("SELECT decimal '7'") == "SELECT CAST('7' AS DECIMAL(1, 0))")
    // a DECIMAL(p,s) TYPE spelling is not a literal and stays put
    assert(rewrite("SELECT CAST(x AS DECIMAL(10,2))") ==
      "SELECT CAST(x AS DECIMAL(10,2))")
    val r = TestSession.spark.sql("SELECT DECIMAL '12.34' + DECIMAL '0.66'")
      .collect()(0)
    assert(r.getDecimal(0).toPlainString == "13.00")
  }

  test("plain SQL and string literals pass through unchanged") {
    val q = "SELECT 'a cast as json string', col FROM t WHERE s = 'ARRAY[1]'"
    // string literals containing trigger words are not corrupted: the
    // CAST scanner tracks quotes; ARRAY[...] inside quotes is the one
    // documented textual hazard and stays out of the fixture corpus
    assert(rewrite("SELECT c1 AS x FROM t") == "SELECT c1 AS x FROM t")
    assert(rewrite(q).contains("'a cast as json string'"))
  }

  test("PREPARE/EXECUTE/DEALLOCATE: session-scoped statements with ? binding") {
    val s = TestSession.spark
    assert(s.sql("PREPARE p_spec FROM SELECT ? + ? AS v, 'a?b' AS lit")
      .collect()(0).getString(0) == "p_spec")
    val r = s.sql("EXECUTE p_spec USING 2, 40").collect()(0)
    // ? inside the string literal must NOT bind
    assert(r.getInt(0) == 42 && r.getString(1) == "a?b")
    // re-execution with different parameters, same statement
    assert(s.sql("EXECUTE p_spec USING 1, 1").collect()(0).getInt(0) == 2)
    // wrong arity errors loudly
    intercept[Exception](s.sql("EXECUTE p_spec USING 1"))
    s.sql("DEALLOCATE PREPARE p_spec").collect()
    intercept[Exception](s.sql("EXECUTE p_spec USING 1, 2"))
    // Spark's own EXECUTE IMMEDIATE still works through the veneer
    assert(s.sql("EXECUTE IMMEDIATE 'SELECT 7'").collect()(0).getInt(0) == 7)
  }

  test("DESCRIBE OUTPUT/INPUT: prepared-statement metadata, reference shapes") {
    val s = TestSession.spark
    Tables.register(s, TestSession.sf)
    s.sql("PREPARE d_spec FROM SELECT o_orderkey, o_totalprice AS price, ? AS p " +
      "FROM orders ORDER BY o_orderkey")
    val out = s.sql("DESCRIBE OUTPUT d_spec").collect()
    assert(out.map(_.getString(0)).toSeq == Seq("o_orderkey", "price", "p"))
    // direct column: unaliased, origin table in the qualifier, fixed size
    val key = out(0)
    assert(key.getString(4) == "bigint" && key.getLong(5) == 8L && !key.getBoolean(6))
    assert(key.getString(3) == "orders", s"origin table: $key")
    // aliased expression: marked aliased, no origin
    val price = out(1)
    assert(price.getString(4) == "double" && price.getBoolean(6))
    // ? parameter types as unknown (bound to NULL for analysis)
    assert(out(2).getString(4) == "unknown" && out(2).getBoolean(6))
    // DESCRIBE INPUT: 0-based positions, unknown types; no params → NULL row
    val in = s.sql("DESCRIBE INPUT d_spec").collect()
    assert(in.length == 1 && in(0).getLong(0) == 0L && in(0).getString(1) == "unknown")
    assert(s.sql("DESCRIBE INPUT d_spec").columns.toSeq == Seq("Position", "Type"))
    s.sql("PREPARE d_spec0 FROM SELECT 1")
    val in0 = s.sql("DESCRIBE INPUT d_spec0").collect()
    assert(in0.length == 1 && in0(0).isNullAt(0) && in0(0).isNullAt(1))
    // aggregate statements keep their select list in Aggregate, not a
    // Project — derived/aliased columns must still report Aliased
    // (round-8 advice; reference Field.isAliased)
    s.sql("PREPARE d_agg FROM SELECT o_orderpriority, count(*) AS n FROM orders GROUP BY 1")
    val agg = s.sql("DESCRIBE OUTPUT d_agg").collect()
    assert(agg.map(_.getString(0)).toSeq == Seq("o_orderpriority", "n"))
    assert(!agg(0).getBoolean(6), "grouping column is a direct reference")
    assert(agg(1).getBoolean(6), "count(*) AS n must be aliased")
    s.sql("DEALLOCATE PREPARE d_agg")
    // unknown statement errors loudly; plain DESCRIBE TABLE still works
    intercept[Exception](s.sql("DESCRIBE OUTPUT nope_zzz"))
    assert(s.sql("DESCRIBE orders").collect().nonEmpty)
    s.sql("DEALLOCATE PREPARE d_spec")
    s.sql("DEALLOCATE PREPARE d_spec0")
  }

  test("SET SESSION maps known reference properties, errors on unknown ones") {
    import graft.functions.GraftSqlParser.translateSessionProperty
    assert(translateSessionProperty("hash_partition_count", "48") ==
      "SET spark.sql.shuffle.partitions=48")
    assert(translateSessionProperty("join_distribution_type", "'PARTITIONED'") ==
      "SET spark.sql.autoBroadcastJoinThreshold=-1")
    assert(translateSessionProperty("join_reordering_strategy", "'AUTOMATIC'") ==
      "SET spark.sql.cbo.joinReorder.enabled=true")
    val e = intercept[IllegalArgumentException](
      translateSessionProperty("query_max_memory", "'1GB'"))
    assert(e.getMessage.contains("query_max_memory"))
    // end-to-end: the statement round-trips through spark.sql and RESET
    val s = TestSession.spark
    val before = s.conf.get("spark.sql.shuffle.partitions")
    assert(s.sql("SET SESSION hash_partition_count = 48").collect()(0)
      .getString(1) == "48")
    assert(s.conf.get("spark.sql.shuffle.partitions") == "48")
    s.sql("RESET SESSION hash_partition_count").collect()
    s.conf.set("spark.sql.shuffle.partitions", before)
  }

  test("EXPLAIN ANALYZE executes and reports per-operator row counts") {
    val s = TestSession.spark
    Tables.register(s, TestSession.sf)
    val text = s.sql(
      """EXPLAIN ANALYZE SELECT o_orderpriority, count(*) AS n
        |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        |GROUP BY o_orderpriority""".stripMargin).collect()(0).getString(0)
    // the final adaptive plan, annotated with RUNTIME stats: the join and
    // aggregate operators must carry real row counts from the execution
    assert(text.contains("rows:"), s"no runtime row counts:\n$text")
    assert("HashAggregate \\[[^\\]]*rows: [1-9]".r.findFirstIn(text).isDefined,
      s"aggregate must report a non-zero output row count:\n$text")
    assert(text.contains("Join"), s"join operator missing from tree:\n$text")
    // the scan row count equals the actual lineitem row count (6000 at
    // sf0.001) — proof the numbers are measurements, not estimates
    assert(text.contains("rows: 6000"), s"scan must report 6000 rows:\n$text")
  }

  test("CREATE FUNCTION: Presto CALLED ON NULL INPUT clause is absorbed") {
    val s = TestSession.spark
    s.sql("""CREATE OR REPLACE TEMPORARY FUNCTION p_double(x INT)
            |RETURNS INT LANGUAGE SQL DETERMINISTIC CALLED ON NULL INPUT
            |RETURN x * 2""".stripMargin)
    assert(s.sql("SELECT p_double(21)").collect()(0).getInt(0) == 42)
  }

  test("SHOW STATS FOR t: per-column live stats plus the summary row") {
    val s = TestSession.spark
    Tables.register(s, TestSession.sf)
    val rows = s.sql("SHOW STATS FOR lineitem").collect()
    val cols = s.table("lineitem").schema.fieldNames
    // one row per column + one summary row, reference column shape
    assert(rows.length == cols.length + 1)
    val byName = rows.filter(!_.isNullAt(0)).map(r => r.getString(0) -> r).toMap
    assert(byName.keySet == cols.toSet)
    // the summary row alone carries row_count, and it is the real count
    val summary = rows.filter(_.isNullAt(0))
    assert(summary.length == 1)
    assert(summary.head.getAs[Long]("row_count") ==
      s.table("lineitem").count())
    assert(rows.filter(!_.isNullAt(0)).forall(_.isNullAt(3)))
    // a numeric column exposes exact low/high; a varchar column does not
    val ok = byName("l_orderkey")
    assert(!ok.isNullAt(4) && !ok.isNullAt(5), "numeric low/high must be real")
    assert(ok.getAs[Double]("high_value") >= ok.getAs[Double]("low_value"))
    assert(ok.getAs[Long]("distinct_count") > 0)
    assert(byName("l_returnflag").isNullAt(4) &&
      byName("l_returnflag").getAs[Long]("distinct_count") == 3)
    // no-null fixture columns report a 0.0 nulls fraction
    assert(byName.values.forall(_.getAs[Double]("nulls_fraction") == 0.0))
  }

  test("SHOW SESSION lists the mapped properties with live values") {
    val s = TestSession.spark
    val rows = s.sql("SHOW SESSION").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(rows.keySet == Set("hash_partition_count",
      "join_distribution_type", "join_reordering_strategy"))
    assert(rows("hash_partition_count") ==
      s.conf.get("spark.sql.shuffle.partitions"))
    // SET SESSION must be visible in the next SHOW SESSION
    s.sql("SET SESSION hash_partition_count = 7")
    try {
      val after = s.sql("SHOW SESSION").collect()
        .map(r => r.getString(0) -> r.getString(1)).toMap
      assert(after("hash_partition_count") == "7")
    } finally s.sql("RESET SESSION hash_partition_count").collect()
  }

  test("SHOW STATS FOR (SELECT ...): the query form aggregates the subquery") {
    val s = TestSession.spark
    Tables.register(s, TestSession.sf)
    val rows = s.sql(
      """SHOW STATS FOR (SELECT l_orderkey, l_quantity, l_returnflag
        |FROM lineitem WHERE l_quantity > 25)""".stripMargin).collect()
    assert(rows.length == 4) // 3 columns + summary
    val summary = rows.filter(_.isNullAt(0))
    val expect = s.table("lineitem").filter("l_quantity > 25").count()
    assert(summary.head.getAs[Long]("row_count") == expect)
    val qty = rows.filter(r => !r.isNullAt(0) && r.getString(0) == "l_quantity").head
    assert(qty.getAs[Double]("low_value") > 25.0 - 1e-9)
  }

  test("DATE - DATE is integer days; interval arithmetic is untouched") {
    val s = TestSession.spark
    // ResolveDateSubToDays: the q50/q62/q99 day_sk-lag buckets compare
    // the difference against integers, and DuckDB agrees natively
    val d = s.sql(
      "SELECT DATE '2020-03-01' - DATE '2020-02-01' AS days").collect().head
    assert(d.getAs[Int]("days") == 29)
    assert(s.sql("SELECT CASE WHEN (DATE '2020-01-31' - DATE '2020-01-01') <= 30 " +
      "THEN 1 ELSE 0 END AS b").collect().head.getAs[Int]("b") == 1)
    // date ± interval and timestamp subtraction keep Spark semantics
    val plus = s.sql("SELECT DATE '2020-01-01' + INTERVAL '1' DAY AS dd")
      .collect().head.getAs[java.sql.Date]("dd")
    assert(plus.toString == "2020-01-02")
    val ts = s.sql("SELECT TIMESTAMP '2020-01-02 00:00:00' - " +
      "TIMESTAMP '2020-01-01 12:00:00' AS iv").collect().head.get(0)
    assert(ts.toString.contains("12"), s"timestamp diff stays an interval: $ts")
  }
}
