package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.PrestoOperators

/** Pins the opt-in Presto operator semantics (PrestoOperators): integer
  * `/` truncation and 1-based subscripts — round-8's two silent dialect
  * divergences. Every test asserts BOTH states: the conf off (stock Spark
  * semantics, so the verbatim TPC corpora are provably untouched) and on
  * (reference semantics, BigintOperators.java divide /
  * ArraySubscriptOperator.java).
  */
class PrestoOperatorsSpec extends AnyFunSuite {
  private lazy val spark = TestSession.spark

  private def withDialect[T](f: => T): T = {
    spark.conf.set(PrestoOperators.ConfKey, "true")
    try f finally spark.conf.unset(PrestoOperators.ConfKey)
  }

  private def one(sql: String): Any =
    spark.sql(sql).collect()(0).get(0)

  test("integer division truncates toward zero under the dialect, stays double off") {
    assert(one("SELECT 5 / 2") == 2.5)                        // conf off
    withDialect {
      assert(one("SELECT 5 / 2") == 2)
      assert(one("SELECT -7 / 2") == -3, "Java/Presto truncation, not floor")
      assert(one("SELECT 7 / -2") == -3)
      assert(one("SELECT CAST(10 AS BIGINT) / 3") == 3L, "wider integral type wins")
      assert(one("SELECT 10 / CAST(3 AS TINYINT)") == 3)
    }
    assert(one("SELECT 5 / 2") == 2.5, "conf resets cleanly")
  }

  test("non-integral division keeps fractional semantics under the dialect") {
    withDialect {
      assert(one("SELECT 5.0E0 / 2") == 2.5)                  // double / int
      assert(one("SELECT 5 / 2.0E0") == 2.5)                  // int / double
      // decimal / int carries the REFERENCE's result type
      // (DecimalOperators.java: scale max(s1,s2), so 2 here — "2.50")
      val dec = one("SELECT CAST(5 AS DECIMAL(10,2)) / 2")
      assert(dec.toString == "2.50", s"presto scale: $dec")
      // decimal / decimal, reference scale + HALF_UP rounding:
      // 1.00 / 3.000 → scale 3 → 0.333
      assert(one("SELECT CAST(1 AS DECIMAL(5,2)) / CAST(3 AS DECIMAL(6,3))").toString == "0.333")
      assert(one("SELECT CAST(2 AS DECIMAL(5,2)) / CAST(3 AS DECIMAL(6,3))").toString == "0.667")
      // division by zero still errors (reference DIVISION_BY_ZERO)
      intercept[Exception](one("SELECT 5 / 0"))
    }
  }

  test("subscripts are 1-based under the dialect, 0-based off") {
    assert(one("SELECT array(10, 20, 30)[1]") == 20)          // conf off: 0-based
    withDialect {
      assert(one("SELECT array(10, 20, 30)[1]") == 10)
      assert(one("SELECT array(10, 20, 30)[3]") == 30)
      // out-of-bounds and index 0 throw, like the reference under ANSI
      intercept[Exception](one("SELECT array(10, 20, 30)[4]"))
      intercept[Exception](one("SELECT array(10, 20, 30)[0]"))
      // map subscripts: integer and string-literal keys both do key lookup
      assert(one("SELECT map(1, 'a', 2, 'b')[2]") == "b")
      assert(one("SELECT map('x', 7)['x']") == 7)
      // non-literal subscript expression is still 1-based
      assert(one("SELECT array(10, 20, 30)[1 + 1]") == 20)
    }
    assert(one("SELECT array(10, 20, 30)[1]") == 20)
  }

  test("split delimiter is literal under the dialect, regex off") {
    // conf off: Spark regex semantics — '.' matches everything
    assert(one("SELECT size(split('a.b.c', '.'))") == 6)
    withDialect {
      assert(one("SELECT split('a.b.c', '.')[1]") == "a")   // literal dot, 1-based
      assert(one("SELECT size(split('a.b.c', '.'))") == 3)
      assert(one("SELECT split('a|b|c', '|')[2]") == "b")
      // 3-arg limit: last part carries the rest unsplit (both engines)
      assert(one("SELECT split('a.b.c', '.', 2)[2]") == "b.c")
      // non-literal delimiter quotes per row
      assert(one("SELECT size(split('a.b.c', substr('.x', 1, 1)))") == 3)
    }
    assert(one("SELECT size(split('a.b.c', '.'))") == 6)
  }

  test("double-quoted identifiers are Presto-lexed in BOTH conf states (standing session semantics)") {
    // Presto lexes "…" as an identifier in every position
    // (SqlBase.g4 quotedIdentifier; strings are single-quoted only).
    // This engine makes that semantics STANDING — GraftSession sets
    // spark.sql.ansi.doubleQuotedIdentifiers (the verbatim benchto
    // corpus requires it) — so the dialect conf must neither enable nor
    // disable it: identifier lexing, alias positions, table names, and
    // the "" escape all hold with the conf off AND on
    // (dialect_quoted_ident is the oracle row for the on-state).
    Tables.register(spark, TestSession.sf)
    def probe(): Unit = {
      val r = spark.sql(
        """SELECT "n_name" AS "the name", 'keep "this"' AS s
          |FROM "nation" WHERE "n_nationkey" = 0""".stripMargin)
      assert(r.schema.map(_.name) == Seq("the name", "s"))
      val row = r.collect()(0)
      assert(row.getString(0) == spark.sql(
        "SELECT n_name FROM nation WHERE n_nationkey = 0").collect()(0).getString(0))
      assert(row.getString(1) == "keep \"this\"", "single-quoted strings untouched")
      val esc = spark.sql("""SELECT n_name AS "odd""name" FROM nation LIMIT 1""")
      assert(esc.schema.head.name == "odd\"name", esc.schema.head.name)
    }
    probe()           // conf off
    withDialect(probe()) // conf on
  }

  test("floating->integral CAST rounds HALF_UP under the dialect, truncates off") {
    def casts() = {
      val r = spark.sql(
        """SELECT CAST(2.5D AS BIGINT) a, CAST(-2.5D AS BIGINT) b,
          |  CAST(2.4D AS BIGINT) c, CAST(CAST(2.5 AS DECIMAL(3,1)) AS BIGINT) d,
          |  CAST(CAST(2.5 AS FLOAT) AS INT) e, CAST('7' AS BIGINT) f,
          |  TRY_CAST('nope' AS BIGINT) g""".stripMargin).collect()(0)
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getInt(4), r.getLong(5), r.isNullAt(6))
    }
    assert(casts() == ((2L, -2L, 2L, 2L, 2, 7L, true)), "off: Spark truncation")
    // on: DoubleOperators.castToLong HALF_UP — away from zero on ties;
    // decimal sources likewise; string parse unchanged; TRY_CAST keeps
    // its null-on-error contract (not wrapped)
    assert(withDialect(casts()) == ((3L, -3L, 2L, 3L, 3, 7L, true)),
      "on: reference HALF_UP rounding")
  }

  test("greatest/least propagate NULL under the dialect, skip nulls off") {
    // reference AbstractGreatestLeast.java:120 RETURN_NULL_ON_NULL;
    // Spark and DuckDB both skip nulls (the silent-wrong-extremum class)
    assert(one("SELECT greatest(1, NULL)") == 1)  // conf off: stock skip
    withDialect {
      assert(one("SELECT greatest(1, NULL)") == null)
      assert(one("SELECT least(NULL, 2)") == null)
      assert(one("SELECT greatest(3, 1, 2)") == 3)
      assert(one("SELECT least(3, 1, 2)") == 1)
      assert(one("SELECT greatest(1.5D, 2.5D, NULL)") == null)
      // array extrema: NULL when the array CONTAINS a null
      // (ArrayMinMaxUtils.java:41-43)
      assert(one("SELECT array_min(array(3, NULL, 2))") == null)
      assert(one("SELECT array_max(array(3, NULL))") == null)
      assert(one("SELECT array_min(array(3, 1, 2))") == 1)
      assert(one("SELECT array_min(CAST(NULL AS ARRAY<INT>))") == null)
    }
    assert(one("SELECT least(NULL, 2)") == 2, "conf resets cleanly")
    assert(one("SELECT array_min(array(3, NULL, 2))") == 2, "stock skips nulls")
  }

  test("TIME ± INTERVAL wraps modulo 24h under the dialect, raises off") {
    // reference DateTimeOperators.java:65-74 (modulo24Hour) / :137-147
    // (YEAR TO MONTH no-op on TIME); stock ANSI Spark raises
    // DATETIME_OVERFLOW past midnight
    withDialect {
      assert(one("SELECT CAST(TIME '23:59:59' + INTERVAL '2' SECOND AS STRING)") == "00:00:01.000")
      assert(one("SELECT CAST(TIME '00:00:01' - INTERVAL '2' SECOND AS STRING)") == "23:59:59.000",
        "subtraction past midnight wraps UP (floorMod)")
      assert(one("SELECT CAST(TIME '12:00:00' + INTERVAL '36' HOUR AS STRING)") == "00:00:00.000")
      assert(one("SELECT CAST(TIME '07:08:09.123456' + INTERVAL '1' SECOND AS STRING)") ==
        "07:08:10.123456", "micros survive the wrap arithmetic")
      assert(one("SELECT CAST(TIME '07:08:09' + INTERVAL '3' MONTH AS STRING)") == "07:08:09.000",
        "YEAR TO MONTH interval is a no-op on TIME (reference :137)")
      // the dispatch's fallback rows keep stock semantics and TYPES
      assert(one("SELECT CAST(DATE '2020-01-31' + INTERVAL '1' DAY AS STRING)") == "2020-02-01",
        "DAY-only interval keeps the DATE type (no timestamp widening)")
      assert(one("SELECT DATE '2020-01-31' + INTERVAL '1' DAY").isInstanceOf[java.sql.Date])
      assert(one("SELECT CAST(DATE '2020-01-31' + INTERVAL '1' MONTH AS STRING)") == "2020-02-29")
      assert(one("SELECT CAST(TIMESTAMP '2020-01-01 10:00:00' + INTERVAL '2' HOUR AS STRING)")
        .toString.startsWith("2020-01-01 12:00:00"))
    }
    // conf off: stock ANSI overflow error
    val e = intercept[Exception](one("SELECT TIME '23:59:59' + INTERVAL '2' SECOND"))
    assert(e.getMessage.contains("DATETIME_OVERFLOW"))
  }

  test("TIME wrap covers derivable non-literal interval shapes (round-12 widening)") {
    withDialect {
      // interval ARITHMETIC (the literal-only r11 match raised
      // DATETIME_OVERFLOW on these)
      assert(one("SELECT CAST(TIME '23:00:00' + INTERVAL '2' HOUR * 3 AS STRING)") ==
        "05:00:00.000", "multiplied interval wraps")
      assert(one("SELECT CAST(TIME '01:00:00' - INTERVAL '1' HOUR * 2 AS STRING)") ==
        "23:00:00.000", "subtracted multiplied interval wraps up")
      assert(one("SELECT CAST(TIME '23:00:00' + (INTERVAL '1' HOUR + INTERVAL '90' MINUTE) AS STRING)") ==
        "01:30:00.000", "interval sum wraps")
      assert(one("SELECT CAST(TIME '23:00:00' + CAST('02:00:00' AS INTERVAL HOUR TO SECOND) AS STRING)") ==
        "01:00:00.000", "CAST-to-interval wraps")
      assert(one("SELECT CAST(TIME '12:00:00' + INTERVAL '4' HOUR / 2 AS STRING)") ==
        "14:00:00.000", "divided interval dispatches")
      // ~292k-year interval: the micros→nanos multiply would overflow Long
      // without the mod-24h pre-reduction (ADVICE r11); whole days ≡ 0 mod 24h
      assert(one("SELECT CAST(TIME '12:00:00' + INTERVAL '106751990' DAY AS STRING)") ==
        "12:00:00.000", "huge interval reduces mod 24h before the nanos multiply")
    }
  }

  test("map-typed MAP keys are a LOUD documented delta (reference allows any comparable key)") {
    // MapType.java:39 admits map-typed keys; Spark hard-rejects the
    // shape at analysis. The delta stays LOUD — pinned here so it can
    // never silently change class (VERDICT r15 ask #4).
    withDialect {
      val e = intercept[Exception] {
        one("SELECT MAP(ARRAY[MAP(ARRAY[1], ARRAY[2])], ARRAY[3])")
      }
      assert(e.toString.contains("map type cannot be used as a MAP key"),
        s"map-key rejection must name the delta: $e")
      val e2 = intercept[Exception] {
        one("SELECT map_from_entries(ARRAY[(MAP(ARRAY[1], ARRAY[2]), 3)])")
      }
      assert(e2.toString.contains("map type cannot be used as a MAP key"),
        s"entries-ctor map-key rejection must name the delta: $e2")
    }
  }

  test("wrapTimeAdd is overflow-safe at the Long boundary (unit)") {
    import graft.functions.GraftFnUtils.wrapTimeAdd
    val day = 86400000000L // micros
    assert(wrapTimeAdd(0L, 106751990L * day) == 0L)
    assert(wrapTimeAdd(43200L * 1000000000L, 106751990L * day + 3600000000L) ==
      46800L * 1000000000L, "12:00 + huge+1h = 13:00")
    assert(wrapTimeAdd(0L, -106751990L * day - 3600000000L) ==
      82800L * 1000000000L, "negative huge interval wraps up")
  }

  test("null-propagating extrema evaluate each argument exactly once") {
    // the r11 CaseWhen shape duplicated every argument into both the null
    // probe and the extremum; With-bound refs must hit the UDF once per row
    PrestoOperatorsSpec.evalCount.set(0L)
    val counting = org.apache.spark.sql.functions.udf { (x: Long) =>
      PrestoOperatorsSpec.evalCount.incrementAndGet(); x
    }.asNondeterministic()
    spark.udf.register("graft_count_eval", counting)
    withDialect {
      val rows = spark.sql(
        "SELECT greatest(graft_count_eval(id), 2L) FROM range(10)").collect()
      assert(rows.length == 10)
      assert(PrestoOperatorsSpec.evalCount.get() == 10L,
        s"each argument evaluated once, got ${PrestoOperatorsSpec.evalCount.get()}")
      PrestoOperatorsSpec.evalCount.set(0L)
      val arr = spark.sql(
        "SELECT array_min(array(graft_count_eval(id), id + 1)) FROM range(10)").collect()
      assert(arr.length == 10)
      assert(PrestoOperatorsSpec.evalCount.get() == 10L,
        s"array argument evaluated once, got ${PrestoOperatorsSpec.evalCount.get()}")
    }
  }

  test("dialect reaches inside subqueries and CTEs") {
    withDialect {
      assert(one("WITH t AS (SELECT 7 / 2 AS v) SELECT v FROM t") == 3)
      assert(one("SELECT (SELECT 9 / 4)") == 2)
      assert(one("SELECT x FROM VALUES (1) AS s(x) WHERE (SELECT 5 / 2) = 2") == 1)
    }
  }

  test("SET SESSION graft.presto_operators drives the conf") {
    spark.sql("SET SESSION graft.presto_operators=true")
    try assert(one("SELECT 5 / 2") == 2)
    finally spark.sql("SET SESSION graft.presto_operators=false")
    assert(one("SELECT 5 / 2") == 2.5)
  }

  test("integer division matches Java/Presto semantics over 200 random operand pairs") {
    // BigintOperators.java divide IS Java's long division — compare the
    // dialect's answers against it en masse (deterministic seed)
    val rnd = new scala.util.Random(9L)
    val cases = Seq.fill(200)((rnd.nextInt(2000001) - 1000000,
      { val d = rnd.nextInt(999) + 1; if (rnd.nextBoolean()) d else -d }))
    val values = cases.map { case (a, b) => s"($a, $b)" }.mkString(", ")
    withDialect {
      val rows = spark.sql(
        s"SELECT a, b, a / b AS d FROM VALUES $values AS t(a, b)").collect()
      rows.foreach { r =>
        val (a, b, d) = (r.getInt(0), r.getInt(1), r.getInt(2))
        assert(d == a / b, s"$a / $b: got $d, Java/Presto says ${a / b}")
      }
    }
  }

  test("the verbatim TPC-H corpus is invariant to the dialect conf") {
    // A user migrating Presto SQL would leave the conf ON for
    // everything — the corpus texts (written FOR Presto) must then
    // return byte-identical results, or the rewrite corrupts standard
    // queries. Representative arithmetic-heavy texts: q01 (sums/avgs),
    // q06 (decimal literals), q08 (share division), q12 (CASE counts),
    // q14 (100.00 * x / y), q19 (quantity ranges).
    for (q <- Seq("dialect_q01_verbatim", "dialect_q06_verbatim",
        "dialect_q08_verbatim", "dialect_q12_verbatim",
        "dialect_q14_verbatim", "dialect_q19_verbatim")) {
      val off = SparkEntry.queries(q)(spark, TestSession.sf)
        .collect().map(_.toString).sorted.toSeq
      val on = withDialect {
        SparkEntry.queries(q)(spark, TestSession.sf)
          .collect().map(_.toString).sorted.toSeq
      }
      assert(on == off, s"$q diverges under the Presto operator dialect")
    }
  }

  // ── SimplifyElementAt (plans/SimplifyElementAt.scala) ──
  // element_at(array(...), <in-bounds literal>) must simplify to the
  // selected child: upstream Spark 4.1.2 has no SimplifyExtractValueOps
  // case for ElementAt, and the un-simplified shape breaks whole-stage
  // codegen (nullable=false via the non-null child, yet doGenCode still
  // assigns the never-declared ev.isNull — janino "is not an rvalue",
  // whole stage falls back to interpreted).

  test("in-bounds literal element_at over an inline array simplifies away") {
    val df = spark.sql(
      """SELECT element_at(array(c_custkey, c_nationkey, 42), 1) AS a,
        |       element_at(array(c_custkey, c_nationkey, 42), 3) AS b,
        |       element_at(array(c_custkey, c_nationkey, 42), -3) AS c
        |FROM parquet.`/root/testdata/sf0.001/customer.parquet`""".stripMargin)
    val opt = df.queryExecution.optimizedPlan.toString
    assert(!opt.contains("element_at") && !opt.contains("array("),
      s"array build should be simplified out:\n$opt")
    val r = df.limit(5).collect()
    assert(r.forall(row => row.getLong(1) == 42L))
    assert(r.forall(row => row.getLong(0) == row.getLong(2)),
      "negative index counts from the back")
  }

  test("the dialect_subscript shape survives codegen.fallback=false") {
    // Before the rule this exact projection pair killed codegen for the
    // whole scan+project stage (observed in the round-9 verify sweep).
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try withDialect {
      val rows = spark.sql(
        """SELECT ARRAY[c_custkey, c_nationkey, 42][1] AS first_elem,
          |       ARRAY[c_custkey, c_nationkey, 42][3] AS third_elem
          |FROM parquet.`/root/testdata/sf0.001/customer.parquet`
          |ORDER BY first_elem LIMIT 5""".stripMargin).collect()
      assert(rows.nonEmpty && rows.forall(_.getLong(1) == 42L))
    } finally spark.conf.unset("spark.sql.codegen.fallback")
  }

  test("out-of-bounds and zero literal subscripts keep the erroring path") {
    withDialect {
      intercept[Exception](one("SELECT array(10, 20, 30)[5]"))
      intercept[Exception](one("SELECT array(10, 20, 30)[0]"))
      // element_at, statically out of bounds: NULL like the reference
      // (ArrayElementAtFunction.java:124-126 — round 12; the erroring
      // subscript above is the reference's ArraySubscriptOperator dual).
      // Dialect-flag scope since round 13.
      assert(spark.sql("SELECT element_at(array(10, 20, 30), 9)")
        .collect()(0).isNullAt(0))
    }
    // flag off: element_at keeps Spark's ANSI erroring contract
    intercept[Exception] {
      spark.sql("SELECT element_at(array(10, 20, 30), 9)").collect()
    }
  }

  test("JSON scalar casts coerce by token class under the dialect (wave 9)") {
    withDialect {
      // JsonOperators.java castToBigint/…: JSON 'null' is SQL NULL, float
      // tokens round HALF_UP, quoted numbers parse, booleans map to 1/0
      assert(spark.sql("SELECT cast(JSON 'null' as BIGINT)").collect()(0).isNullAt(0))
      assert(one("SELECT cast(JSON '128.9' as BIGINT)") == 129L)
      assert(one("SELECT cast(JSON 'true' as BIGINT)") == 1L)
      assert(one("SELECT cast(JSON '\"128\"' as INTEGER)") == 128)
      assert(one("SELECT cast(JSON '1e309' as DOUBLE)") == Double.PositiveInfinity)
      assert(one("SELECT cast(JSON '\"NaN\"' as REAL)").asInstanceOf[Float].isNaN)
      assert(one("SELECT cast(JSON '\"True\"' as BOOLEAN)") == true)
      // castToVarchar UNQUOTES string tokens (not an identity copy)
      assert(one("SELECT cast(JSON '\"abc\"' as VARCHAR)") == "abc")
      assert(one("SELECT cast(JSON 'true' as VARCHAR)") == "true")
      // timestamp → JSON: quoted millisecond rendering
      // (JsonUtil TimestampJsonGeneratorWriter)
      assert(one("SELECT CAST(TIMESTAMP '1970-01-01 00:00:01' AS JSON)")
        == "\"1970-01-01 00:00:01.000\"")
      assert(spark.sql("SELECT cast(cast(null as timestamp) as JSON)")
        .collect()(0).isNullAt(0))
    }
    // conf off: plain string semantics keep Spark's cast (errors on 'true')
    intercept[Exception](spark.sql("SELECT cast(json_parse('true') as BIGINT)").collect())
  }

  test("floating % is raw IEEE under the dialect (never errors)") {
    withDialect {
      assert(one("SELECT REAL'-0.0' % REAL'0.0'").asInstanceOf[Float].isNaN)
      assert(one("SELECT DOUBLE '7.5' % 0.0").asInstanceOf[Double].isNaN)
      assert(one("SELECT 17 % 5") == 2, "integral % keeps the stock node")
      intercept[Exception](one("SELECT 5 % 0"))
    }
    intercept[Exception](one("SELECT DOUBLE '7.5' % 0.0")) // ANSI off-dialect
  }

  test("IPADDRESS/IPPREFIX cast family and byte-order comparisons (wave 9)") {
    withDialect {
      // IpAddressOperators: v4-mapped text canonicalizes, varbinary reads
      // 4 bytes v4-mapped / 16 bytes v6, varbinary output is 16 bytes
      assert(one("SELECT CAST('::ffff:1.2.3.4' AS IPADDRESS)") == "1.2.3.4")
      assert(one("SELECT CAST('2001:0db8:0000:0000:0000:ff00:0042:8329' AS IPADDRESS)")
        == "2001:db8::ff00:42:8329")
      assert(one("SELECT CAST(x'01020304' AS IPADDRESS)") == "1.2.3.4")
      assert(one("SELECT CAST(CAST('1.2.3.4' AS IPADDRESS) AS VARBINARY)")
        .asInstanceOf[Array[Byte]].length == 16)
      // ordering uses the 16-byte key, not canonical text ('::1' maps
      // below v4-mapped space; '2.' > '10.' textually but not in bytes)
      assert(one("SELECT IPADDRESS '::1' <= CAST('1.2.3.5' AS IPADDRESS)") == true)
      assert(one("SELECT CAST('2.0.0.0' AS IPADDRESS) < CAST('10.0.0.0' AS IPADDRESS)") == true)
      // IpPrefixOperators: host bits zero, address↔prefix casts
      assert(one("SELECT CAST('192.168.0.1/24' AS IPPREFIX)") == "192.168.0.0/24")
      assert(one("SELECT CAST(CAST('1.2.3.4' AS IPADDRESS) AS IPPREFIX)") == "1.2.3.4/32")
      assert(one("SELECT CAST(CAST('::1' AS IPADDRESS) AS IPPREFIX)") == "::1/128")
      assert(one("SELECT CAST(CAST('64:ff9b::10.0.0.0/64' AS IPPREFIX) AS IPADDRESS)")
        == "64:ff9b::")
      // loud errors: hostnames never resolve, bad binary lengths reject
      intercept[Exception](one("SELECT CAST('facebook.com' AS IPADDRESS)"))
      // hex-only names would pass a loose char-class but are HOSTNAMES
      // to getByName (DNS from a cast — ADVICE r14); legacy inet_aton
      // shorthands are rejected by the reference's Guava parser too
      intercept[Exception](one("SELECT CAST('cafe' AS IPADDRESS)"))
      intercept[Exception](one("SELECT CAST('dead.beef' AS IPADDRESS)"))
      intercept[Exception](one("SELECT CAST('12345' AS IPADDRESS)"))
      intercept[Exception](one("SELECT CAST('1.2.3' AS IPADDRESS)"))
      intercept[Exception](one("SELECT CAST('1.2.3.444' AS IPADDRESS)"))
      intercept[Exception](one("SELECT CAST(x'f000001100' AS IPADDRESS)"))
      intercept[Exception](one("SELECT CAST('1.2.3.4' AS IPPREFIX)"))
    }
  }

  test("KAT value-gate closures: strings, JSON tokens, LIKE, intervals (wave 9)") {
    withDialect {
      // substr: start 0 / past-the-front is EMPTY (StringFunctions.substr)
      assert(one("SELECT SUBSTR('Quadratically', 0)") == "")
      assert(one("SELECT SUBSTR('Quadratically', -50)") == "")
      assert(one("SELECT SUBSTRING('Quadratically' FROM 5)") == "ratically")
      // replace with empty search interleaves (the fork's own vectors)
      assert(one("SELECT REPLACE('abc', '', 'xx')") == "xxaxxbxxcxx")
      // 1-arg trim family strips ALL Unicode whitespace
      assert(one("SELECT LTRIM(concat(chr(8232), ' x'))") == "x")
      // strrpos reproduces the fork's byte/char index confusion
      // bug-for-bug (its tests pin 2 where the code-point position is 4)
      assert(one("SELECT STRRPOS('信念,爱,希望', '爱')") == 2L)
      assert(one("SELECT STRRPOS('abc/xyz/foo/bar', '/', 3)") == 4L)
      // split_part index 0 errors (the fork's testSplitPartInvalid is
      // @Test(expectedExceptions) — the exception is the contract)
      assert(intercept[Exception] { one("SELECT SPLIT_PART('a-b', '-', 0)") }
        .toString.contains("Index must be greater than zero"))
      // LIKE has no default escape character (the SQL text carries raw
      // single backslashes — Presto string literals don't unescape).
      // An EXPLICIT ESCAPE still applies — including an explicit
      // backslash, which the parser rewrites to a sentinel so the
      // no-default-escape analysis arm can't strip it (ADVICE r14).
      assert(one("SELECT '_monkey_' like '\\_monkey\\_'") == false)
      assert(one("SELECT '_monkey_' like '#_monkey#_' escape '#'") == true)
      assert(one("SELECT '_monkey_' like '\\_monkey\\_' escape '\\'") == true)
      assert(one("SELECT 'Xmonkey_' like '\\_monkey\\_' escape '\\'") == false)
      // and the rewrite never fires on dialect-shaped text INSIDE a
      // string literal (quote-doubled ESCAPE '\' as literal content)
      assert(one("SELECT ' ESCAPE ''\\'''") == " ESCAPE '\\'")
      // named-group replacement references
      assert(one("SELECT REGEXP_REPLACE('wxyz', '(?<xyz>[xyz])', '$${xyz}$${xyz}')".replace("$$", "$"))
        == "wxxyyzz")
      // json_parse canonicalizes with SORTED keys -> JSON '=' is textual
      assert(one("SELECT JSON '{\"a\":1, \"b\":2}' = JSON '{\"b\":2, \"a\":1}'") == true)
      // the probe's SQL type picks the JSON token class
      assert(one("SELECT JSON_ARRAY_CONTAINS('[1, \"8\"]', 8)") == false)
      assert(one("SELECT JSON_ARRAY_CONTAINS('[1]', 1.0)") == false)
      assert(one("SELECT JSON_ARRAY_CONTAINS('[true]', true)") == true)
      // json_array_get: JSON null element is SQL NULL
      assert(spark.sql("SELECT JSON_ARRAY_GET('[1, null]', 1)").collect()(0).isNullAt(0))
      // non-finite doubles QUOTE as JSON
      assert(one("SELECT cast(nan() as JSON)") == "\"NaN\"")
      // bare interval renderings
      assert(one("SELECT cast(INTERVAL '124-30' YEAR TO MONTH as varchar)") == "126-6")
      assert(one("SELECT cast(INTERVAL '12 10:45:32.123' DAY TO SECOND as varchar)")
        == "12 10:45:32.123")
      // url_extract_parameter: first occurrence; bare key is ''
      assert(one("SELECT url_extract_parameter('http://e.com/p?k1&k1=v1', 'k1')") == "")
      // is_nan(NULL) is NULL; round(decimal, NULL scale) is NULL
      assert(spark.sql("SELECT is_nan(NULL)").collect()(0).isNullAt(0))
      assert(spark.sql("SELECT round(DECIMAL '-3.0', CAST(NULL as INTEGER))")
        .collect()(0).isNullAt(0))
      // 16-byte v4-mapped binary renders as its dotted quad
      assert(one("SELECT CAST(x'00000000000000000000ffff01020304' AS IPADDRESS)")
        == "1.2.3.4")
    }
  }

  test("DataFrame API is never rewritten") {
    import org.apache.spark.sql.functions._
    withDialect {
      val df = spark.range(1).select(
        (lit(5) / lit(2)).as("d"),
        array(lit(10), lit(20))(1).as("s"))
      val row = df.collect()(0)
      assert(row.get(0) == 2.5, "Column / stays Spark semantics")
      assert(row.get(1) == 20, "Column apply stays 0-based")
    }
  }
}

object PrestoOperatorsSpec {
  /** Shared across executor threads in local mode — counts UDF invocations
    * for the single-evaluation pin.
    */
  val evalCount = new java.util.concurrent.atomic.AtomicLong(0L)
}
