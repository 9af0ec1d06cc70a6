package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the dialect comparison semantics (functions/PrestoComparisons):
  * raw-Java NaN scalar comparisons, three-valued structural equality,
  * error-on-null array/row ordering, map equality — each matching the
  * reference (DoubleOperators.java, ArrayEqualOperator.java,
  * RowEqualOperator.java, MapEqualOperator.java/MapGenericEquality.java,
  * ArrayLessThanOperator.java, MapDistinctFromOperator.java) — plus the
  * both-state contract: flag OFF keeps stock Spark on every one of those
  * shapes, and the flag-ON plan keeps its scale paths (parquet filter
  * pushdown of the guarded comparison, hash-join extraction of a
  * float-keyed equi-join). Value parity across a 400-row operand grid is
  * oracle-checked by `fuzz_cmp_parity`; this spec pins the cells DuckDB
  * can't express directly plus the plan shapes.
  */
class PrestoComparisonsSpec extends AnyFunSuite {
  private lazy val spark = TestSession.spark

  private def withDialect[T](f: => T): T = {
    spark.conf.set(graft.functions.PrestoOperators.ConfKey, "true")
    try f finally spark.conf.unset(graft.functions.PrestoOperators.ConfKey)
  }

  private def one(sql: String): org.apache.spark.sql.Row =
    spark.sql(sql).collect()(0)

  test("dialect ON: NaN scalar comparisons are raw Java (DoubleOperators.java)") {
    withDialect {
      val r = one(
        """SELECT
          |  CAST('NaN' AS DOUBLE) = CAST('NaN' AS DOUBLE)  AS eq,
          |  CAST('NaN' AS DOUBLE) <> CAST('NaN' AS DOUBLE) AS ne,
          |  CAST('NaN' AS DOUBLE) > 5.0D                   AS gt,
          |  5.0D < CAST('NaN' AS DOUBLE)                   AS lt,
          |  CAST('NaN' AS DOUBLE) >= CAST('NaN' AS DOUBLE) AS ge,
          |  CAST('NaN' AS DOUBLE) <=> CAST('NaN' AS DOUBLE) AS nsd,
          |  CAST('NaN' AS DOUBLE) BETWEEN 0.0D AND 10.0D   AS btw,
          |  CAST(NULL AS DOUBLE) = CAST('NaN' AS DOUBLE)   AS null_vs_nan""".stripMargin)
      assert(r.getBoolean(0) === false, "NaN = NaN")
      assert(r.getBoolean(1) === true, "NaN <> NaN")
      assert(r.getBoolean(2) === false, "NaN > 5")
      assert(r.getBoolean(3) === false, "5 < NaN")
      assert(r.getBoolean(4) === false, "NaN >= NaN")
      assert(r.getBoolean(5) === true, "<=> keeps NaN-self-equal (distinctFrom)")
      assert(r.getBoolean(6) === false, "NaN BETWEEN")
      assert(r.isNullAt(7), "NULL vs NaN propagates NULL (RETURN_NULL_ON_NULL)")
    }
  }

  test("dialect ON: structural equality is three-valued; map equality works (ArrayEqualOperator/MapGenericEquality)") {
    withDialect {
      val r = one(
        """SELECT
          |  array(1, NULL) = array(1, NULL)                          AS arr_ind,
          |  array(1, NULL) = array(2, NULL)                          AS arr_false,
          |  array(1, 2) = array(1, 2, 3)                             AS arr_len,
          |  array(CAST('NaN' AS DOUBLE)) = array(CAST('NaN' AS DOUBLE)) AS arr_nan,
          |  named_struct('a', 1, 'b', CAST(NULL AS INT)) =
          |    named_struct('a', 1, 'b', CAST(NULL AS INT))           AS row_ind,
          |  map(1, 'a', 2, 'b') = map(2, 'b', 1, 'a')                AS map_true,
          |  map(1, 'a') = map(2, 'a')                                AS map_misskey,
          |  map(1, CAST(NULL AS STRING)) = map(1, CAST(NULL AS STRING)) AS map_ind,
          |  map(1, 'a') <=> map(1, 'a')                              AS map_nsd""".stripMargin)
      assert(r.isNullAt(0), "NULL element => indeterminate")
      assert(r.getBoolean(1) === false, "definite unequal beats indeterminate")
      assert(r.getBoolean(2) === false, "length mismatch decides false")
      assert(r.getBoolean(3) === false, "nested NaN uses raw equality")
      assert(r.isNullAt(4), "row NULL field => indeterminate")
      assert(r.getBoolean(5) === true, "map equality is key-order-insensitive")
      assert(r.getBoolean(6) === false, "missing key decides false")
      assert(r.isNullAt(7), "map NULL value => indeterminate")
      assert(r.getBoolean(8) === true, "map <=> (MapDistinctFromOperator)")
      val nested = one(
        """SELECT
          |  array(map(1, 'a')) <=> array(map(1, 'a')) AS am_t,
          |  array(map(1, 'a')) <=> array(map(1, 'b')) AS am_f,
          |  array(map(1, 'a')) = array(map(1, 'a'))   AS am_eq""".stripMargin)
      assert(nested.getBoolean(0) && !nested.getBoolean(1),
        "map nested in array: <=> recurses distinctFrom")
      assert(nested.getBoolean(2), "map nested in array: = recurses EQUAL")
    }
  }

  test("dialect ON: array/row ordering errors on NULL elements, NaN element reads equal (ArrayLessThanOperator)") {
    withDialect {
      val r = one(
        """SELECT
          |  array(1, 2) < array(1, 3)      AS lt,
          |  array(1, 2) < array(1, 2, 0)   AS lt_len,
          |  array(CAST('NaN' AS DOUBLE)) <= array(5.0D) AS nan_le,
          |  array(CAST('NaN' AS DOUBLE)) <  array(5.0D) AS nan_lt,
          |  named_struct('a', 2, 'b', 0) > named_struct('a', 1, 'b', 9) AS row_gt""".stripMargin)
      assert(r.getBoolean(0) && r.getBoolean(1))
      assert(r.getBoolean(2) === true, "NaN element neither less nor greater; length ties <=")
      assert(r.getBoolean(3) === false)
      assert(r.getBoolean(4) === true)
      val e = intercept[Exception] {
        one("SELECT array(1, NULL) < array(1, 2)")
      }
      assert(e.getMessage.contains("null element"),
        s"reference errors on null array elements, got: ${e.getMessage}")
    }
  }

  test("dialect ON: member search uses the reference EQUAL (ArrayContains/ArrayPosition/ArrayRemoveFunction)") {
    withDialect {
      val r = one(
        """SELECT
          |  contains(array(CAST('NaN' AS DOUBLE), 1.0D), CAST('NaN' AS DOUBLE)) AS c_nan,
          |  contains(array(1.0D, CAST(NULL AS DOUBLE)), 3.0D)                   AS c_nullmiss,
          |  array_position(array(CAST('NaN' AS DOUBLE), 1.0D), CAST('NaN' AS DOUBLE)) AS p_nan,
          |  size(array_remove(array(CAST('NaN' AS DOUBLE), 1.0D, 1.0D), 1.0D))  AS r_keepnan,
          |  size(array_remove(array(CAST('NaN' AS DOUBLE)), CAST('NaN' AS DOUBLE))) AS r_nan,
          |  contains(array('x', 'y'), 'y')                                      AS c_str""".stripMargin)
      assert(r.getBoolean(0) === false, "NaN is never found (raw EQUAL)")
      assert(r.isNullAt(1), "no match + null element => NULL")
      assert(r.getLong(2) === 0L, "array_position NaN => 0")
      assert(r.getInt(3) === 1, "remove drops value-equal, keeps NaN")
      assert(r.getInt(4) === 1, "remove never matches NaN")
      assert(r.getBoolean(5) === true, "non-float element types keep the builtin")
      val e = intercept[Exception] { one(
        """SELECT contains(array(named_struct('a', 1, 'b', CAST(NULL AS INT))),
          |                named_struct('a', 1, 'b', CAST(NULL AS INT)))""".stripMargin) }
      assert(e.getMessage.contains("does not support arrays"),
        s"indeterminate element compare errors like the reference: ${e.getMessage}")
    }
  }

  test("dialect ON: greatest/least reject NaN (AbstractGreatestLeast.checkNotNaN), NULL-prop stays outermost") {
    withDialect {
      val r = one(
        """SELECT
          |  TRY(greatest(1.0D, CAST('NaN' AS DOUBLE))) AS g_nan,
          |  TRY(least(CAST('NaN' AS DOUBLE), 5.0D))    AS l_nan,
          |  greatest(1.0D, 2.0D)                       AS g_ok,
          |  greatest(CAST(NULL AS DOUBLE), CAST('NaN' AS DOUBLE)) AS g_null_first""".stripMargin)
      assert(r.isNullAt(0) && r.isNullAt(1), "NaN argument errors (TRY => NULL)")
      assert(r.getDouble(2) === 2.0)
      assert(r.isNullAt(3), "RETURN_NULL_ON_NULL wins before the NaN check")
      val e = intercept[Exception] {
        one("SELECT greatest(CAST('NaN' AS DOUBLE), 1.0D)")
      }
      assert(e.getMessage.contains("Invalid argument to greatest(): NaN"))
    }
  }

  test("dialect ON: NULLIF and simple CASE consume the reference EQUAL (via the lowered EqualTo)") {
    // Spark lowers both constructs to EqualTo during analysis, so the
    // guarded-comparison rule covers them without a dedicated rewrite —
    // this pin makes that coverage a contract instead of an accident
    withDialect {
      val r = one(
        """SELECT
          |  isnan(nullif(CAST('NaN' AS DOUBLE), CAST('NaN' AS DOUBLE))) AS nullif_nan,
          |  nullif(1.5D, 1.5D) AS nullif_eq,
          |  CASE CAST('NaN' AS DOUBLE) WHEN CAST('NaN' AS DOUBLE) THEN 'hit' ELSE 'miss' END AS case_nan,
          |  CASE array(1, CAST(NULL AS INT)) WHEN array(1, CAST(NULL AS INT)) THEN 'hit' ELSE 'miss' END AS case_arr""".stripMargin)
      assert(r.getBoolean(0), "nullif(NaN, NaN) keeps NaN (raw EQUAL is false)")
      assert(r.isNullAt(1))
      assert(r.getString(2) === "miss", "simple CASE never matches NaN")
      assert(r.getString(3) === "miss", "indeterminate candidate is no-match")
    }
    // stock Spark: both constructs match NaN
    val s = one(
      """SELECT nullif(CAST('NaN' AS DOUBLE), CAST('NaN' AS DOUBLE)) AS n,
        |  CASE CAST('NaN' AS DOUBLE) WHEN CAST('NaN' AS DOUBLE) THEN 'hit' ELSE 'miss' END AS c""".stripMargin)
    assert(s.isNullAt(0) && s.getString(1) === "hit")
  }

  test("dialect OFF: every shape keeps stock Spark semantics") {
    val r = one(
      """SELECT
        |  CAST('NaN' AS DOUBLE) = CAST('NaN' AS DOUBLE) AS nan_eq,
        |  CAST('NaN' AS DOUBLE) > 5.0D                  AS nan_gt,
        |  array(1, NULL) = array(1, NULL)               AS arr_eq,
        |  array(1, NULL) < array(1, 2)                  AS arr_lt,
        |  contains(array(CAST('NaN' AS DOUBLE)), CAST('NaN' AS DOUBLE)) AS c_nan,
        |  array_position(array(CAST('NaN' AS DOUBLE)), CAST('NaN' AS DOUBLE)) AS p_nan,
        |  isnan(greatest(1.0D, CAST('NaN' AS DOUBLE)))  AS g_nan""".stripMargin)
    assert(r.getBoolean(0) === true, "stock Spark: NaN self-equal")
    assert(r.getBoolean(1) === true, "stock Spark: NaN largest")
    assert(r.getBoolean(2) === true, "stock Spark: nested NULLs equal")
    assert(r.getBoolean(3) === true, "stock Spark: NULL sorts first, no error")
    assert(r.getBoolean(4) === true, "stock Spark: contains finds NaN")
    assert(r.getLong(5) === 1L, "stock Spark: array_position finds NaN")
    assert(r.getBoolean(6) === true, "stock Spark: greatest returns NaN")
    // stock Spark rejects map equality — the dialect-only surface stays off
    val e = intercept[Exception] { one("SELECT map(1, 'a') = map(1, 'a')") }
    assert(e.getMessage.contains("INVALID_ORDERING_TYPE"))
  }

  test("dialect ON: reference known-answer vectors (TestArrayOperators/TestMapOperators/TestDoubleOperators)") {
    withDialect {
      val r = one(
        """SELECT
          |  ARRAY [1, 2, 3] = ARRAY [1, 2, 3]                 AS a1,  -- TestArrayOperators.java:1235
          |  ARRAY [10, 20, 30] < ARRAY [10, 20, 40, 50]       AS a2,  -- :1307
          |  ARRAY [10, 20, 30] < ARRAY [10, 40]               AS a3,  -- :1309
          |  ARRAY [10, 20] < ARRAY [10, 20, 30]               AS a4,  -- :1311
          |  ARRAY [1.1E0, 2.2E0, 3.3E0, 4.4E0] < ARRAY [1.1E0, 2.2E0, 5.5E0] AS a5, -- :1321
          |  MAP(ARRAY[1], ARRAY[2]) = MAP(ARRAY[1], ARRAY[2]) AS m1,  -- TestMapOperators.java:630
          |  MAP(ARRAY[3], ARRAY[1]) = MAP(ARRAY[2], ARRAY[1]) AS m2,  -- :632
          |  MAP(ARRAY[1], ARRAY[2]) = MAP(ARRAY[1, 3], ARRAY[2, 4]) AS m3, -- :641
          |  37.7 IS DISTINCT FROM 37.7                        AS d1,  -- TestDoubleOperators.java:242
          |  CAST(NULL AS DOUBLE) IS DISTINCT FROM CAST(NULL AS DOUBLE) AS d2, -- :241
          |  CAST('NaN' AS DOUBLE) IS DISTINCT FROM CAST('NaN' AS DOUBLE) AS d3 -- :246 nan()
          |""".stripMargin)
      assert(r.getBoolean(0) && r.getBoolean(1) && r.getBoolean(2) && r.getBoolean(3) && r.getBoolean(4))
      assert(r.getBoolean(5) && !r.getBoolean(6) && !r.getBoolean(7))
      assert(!r.getBoolean(8) && !r.getBoolean(9) && !r.getBoolean(10))
      // CONTAINS over structural elements with a null INSIDE the probe
      // value errors NOT_SUPPORTED (TestArrayOperators.java:536)
      val e = intercept[Exception] { one(
        "SELECT contains(ARRAY [ARRAY [1.1E0, 2.2E0], ARRAY [3.3E0, 4.3E0]], ARRAY [1.1E0, CAST(NULL AS DOUBLE)])") }
      assert(e.getMessage.contains("does not support arrays"))
    }
  }

  test("dialect ON: non-deterministic operands evaluate once (With-bound guard)") {
    withDialect {
      // ln(rand()-2) is always NaN: the reference's raw > is false for
      // every row (stock Spark's NaN-largest would keep all 100); the
      // operand is non-deterministic, so the guard must share ONE
      // evaluation with the comparison rather than re-drawing
      val r = one(
        "SELECT count(*) AS n FROM range(0, 100) WHERE ln(rand() - 2.0D) > -999.0D")
      assert(r.getLong(0) === 0L)
      val in = one(
        "SELECT count(*) AS n FROM range(0, 100) WHERE ln(rand() - 2.0D) IN (1.0D, 2.0D)")
      assert(in.getLong(0) === 0L)
      // sanity: the bound comparison still passes real values through
      val half = one(
        "SELECT count(*) AS n FROM range(0, 1000) WHERE rand() < 0.5").getLong(0)
      assert(half > 350 && half < 650, s"rand() < 0.5 kept $half of 1000")
    }
    val off = one(
      "SELECT count(*) AS n FROM range(0, 100) WHERE ln(rand() - 2.0D) > -999.0D")
    // stock Spark: ln out of domain is NULL -> filter drops all rows too;
    // the flag-off contrast that matters is NaN-largest, pinned above
    assert(off.getLong(0) === 0L)
  }

  test("both confs ON: zoned values keep instant comparison, never the structural path") {
    spark.conf.set(graft.functions.PrestoOperators.ConfKey, "true")
    spark.conf.set(graft.functions.ZonedTimestamps.ConfKey, "true")
    try {
      // same instant in two zones: the zoned rewrite compares instants
      // (equal); the structural path would compare the carrier struct
      // fields (zone strings differ => definitely unequal)
      val r = one(
        """SELECT
          |  TIMESTAMP '2001-08-22 03:04:05 Asia/Tokyo' =
          |    at_timezone(TIMESTAMP '2001-08-22 03:04:05 Asia/Tokyo', 'America/New_York') AS same_instant,
          |  TIMESTAMP '2001-08-22 03:04:05 Asia/Tokyo' <
          |    TIMESTAMP '2001-08-22 03:04:06 Asia/Tokyo' AS lt""".stripMargin)
      assert(r.getBoolean(0), "instant equality must win over struct equality")
      assert(r.getBoolean(1))
    } finally {
      spark.conf.unset(graft.functions.ZonedTimestamps.ConfKey)
      spark.conf.unset(graft.functions.PrestoOperators.ConfKey)
    }
  }

  test("dialect ON: guarded float comparisons keep pushdown and hash joins (the scale paths)") {
    withDialect {
      Tables.register(spark, TestSession.sf)
      val scan = spark.sql(
        "SELECT l_orderkey FROM lineitem WHERE l_extendedprice > 1000.0")
        .queryExecution.executedPlan.toString
      assert(scan.contains("GreaterThan(l_extendedprice,1000.0)"),
        s"comparison must stay in PushedFilters under the dialect:\n$scan")
      val join = spark.sql(
        """SELECT a.l_orderkey FROM lineitem a
          |JOIN lineitem b ON a.l_extendedprice = b.l_extendedprice
          |WHERE a.l_quantity < 2""".stripMargin)
        .queryExecution.executedPlan.toString
      assert(join.contains("HashJoin"),
        s"float-keyed equi-join must stay a hash join under the dialect:\n$join")
      assert(!join.contains("NestedLoop") && !join.contains("Cartesian"))
    }
  }
}
