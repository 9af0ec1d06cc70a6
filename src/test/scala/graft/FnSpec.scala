package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the engine's own function layer (graft.functions.GraftFunctions):
  * checksum order-independence, HLL sketch re-aggregatability (the
  * partial/merge contract that makes sketches work under AQE at scale),
  * histogram correctness, and dialect-function semantics.
  */
class FnSpec extends AnyFunSuite {
  private lazy val spark = TestSession.spark

  private def ready(): Unit = Tables.register(spark, TestSession.sf)

  /** Reference CALL CONVENTIONS (log/trim argument order, regexp/
    * split_part/element_at contracts, random(n), kurtosis definition)
    * are part of the Presto dialect flag since round 13 — one flag, one
    * coherent dialect. The DataFrame API is untouched by the flag.
    */
  private def withDialect[T](f: => T): T = {
    spark.conf.set(graft.functions.PrestoOperators.ConfKey, "true")
    try f finally spark.conf.unset(graft.functions.PrestoOperators.ConfKey)
  }

  test("CAST(complex AS JSON): rows are arrays, map keys string-sorted, reference temporal/float text (JsonUtil.java writers)") {
    // oracle row dialect_json_complex pins row-as-array/sorted-map/
    // decimal over the corpus; these are the surfaces DuckDB can't
    // replay textually: temporal quoting, NaN/Infinity quoting (Jackson
    // default), REAL toString, map nested IN a row, top-level NULL
    val r = spark.sql(
      """SELECT
        |  CAST(ROW(DATE '2001-08-22',
        |           TIMESTAMP '2001-08-22 03:04:05.321999') AS JSON) tj,
        |  CAST(ROW(sqrt(-1E0), CAST('Infinity' AS DOUBLE),
        |           CAST(2.5 AS REAL)) AS JSON) fj,
        |  CAST(ROW(MAP(ARRAY['b', 'a'], ARRAY[1, 2])) AS JSON) nj,
        |  CAST(CAST(NULL AS STRUCT<x: INT>) AS JSON) z""".stripMargin)
      .collect()(0)
    // millis precision (printTimestampWithoutTimeZone): micros truncate
    assert(r.getString(0) == "[\"2001-08-22\",\"2001-08-22 03:04:05.321\"]")
    assert(r.getString(1) == "[\"NaN\",\"Infinity\",2.5]")
    assert(r.getString(2) == "[{\"a\":2,\"b\":1}]")
    assert(r.isNullAt(3)) // RETURN_NULL_ON_NULL: SQL NULL, not "null"
  }

  test("CAST(json AS complex): positional rows, coercions, error contract (JsonUtil.java appenders)") {
    // oracle row dialect_json_decode pins the value surface over the
    // corpus; these are the shapes DuckDB can't replay: the ERROR
    // contract (from_json would silently null), duplicate-name and
    // arity failures, and nested row-in-array decode
    ready() // JSON '…' literal lowers to the registered json_parse
    val r = spark.sql(
      """SELECT
        |  CAST('[[1,"a"],{"b":"x","A":7}]'
        |    AS ARRAY(ROW(a BIGINT, b VARCHAR))) AS nested,
        |  CAST(JSON '{"k": [1, 2]}' AS MAP(VARCHAR, ARRAY(BIGINT))) AS mj""".stripMargin)
      .collect()(0)
    val nested = r.getSeq[org.apache.spark.sql.Row](0)
    // element 0: positional array; element 1: object by LOWER-CASED name
    assert(nested(0).getLong(0) == 1L && nested(0).getString(1) == "a")
    assert(nested(1).getLong(0) == 7L && nested(1).getString(1) == "x")
    assert(r.getMap[String, scala.collection.Seq[Long]](1)("k").toSeq == Seq(1L, 2L))
    // malformed input ERRORS (INVALID_CAST_ARGUMENT), not null
    def fails(sql: String): Unit =
      assertThrows[Exception](spark.sql(sql).collect())
    fails("SELECT CAST('not json' AS ARRAY(BIGINT))")
    fails("SELECT CAST('[1,2]' AS ROW(a BIGINT))") // arity mismatch
    fails("""SELECT CAST('{"a":1,"A":2}' AS ROW(a BIGINT))""") // dup name
    fails("SELECT CAST('{\"a\":1}' AS ARRAY(BIGINT))") // object for array
  }

  test("datetime field functions decompose intervals like the reference (ResolveIntervalFields)") {
    // reference DateTimeFunctions.java *FromInterval (:787-1191):
    // total-millis fields, Java toward-zero division; EXTRACT delegates
    // to the same scalars. Stock Spark's date-typed builtins rejected
    // interval args through the graft EXTRACT rewrite until round 11.
    val r = spark.sql(
      """SELECT day(INTERVAL '3 04:05:06.789' DAY TO SECOND) d,
        |  hour(INTERVAL '3 04:05:06.789' DAY TO SECOND) h,
        |  minute(INTERVAL '3 04:05:06.789' DAY TO SECOND) mi,
        |  second(INTERVAL '3 04:05:06.789' DAY TO SECOND) ss,
        |  millisecond(INTERVAL '3 04:05:06.789' DAY TO SECOND) ms,
        |  CAST(EXTRACT(HOUR FROM INTERVAL '50' HOUR) AS BIGINT) eh,
        |  CAST(EXTRACT(DAY FROM INTERVAL '50' HOUR) AS BIGINT) ed,
        |  day(INTERVAL '-50' HOUR) negd, hour(INTERVAL '-50' HOUR) negh,
        |  year(INTERVAL '26' MONTH) y, month(INTERVAL '26' MONTH) m,
        |  year(INTERVAL '-26' MONTH) negy, month(INTERVAL '-26' MONTH) negm,
        |  day(DATE '2020-03-15') plain_day""".stripMargin).collect()(0)
    assert(Seq(0, 1, 2, 3, 4).map(r.getLong) == Seq(3L, 4L, 5L, 6L, 789L))
    assert(r.getLong(5) == 2L && r.getLong(6) == 2L) // 50h = 2d 2h (DuckDB's own EXTRACT says 0d 50h — components kept separate there)
    assert(r.getLong(7) == -2L && r.getLong(8) == -2L) // Java toward-zero
    assert(r.getLong(9) == 2L && r.getLong(10) == 2L)
    assert(r.getLong(11) == -2L && r.getLong(12) == -2L)
    assert(r.getInt(13) == 15) // non-interval args keep the stock builtin
  }

  test("narrowing decimal CAST rounds HALF_UP (reference DecimalCasts semantics; DuckDB truncates)") {
    // The one pinned engine-vs-oracle dialect divergence of the decimal
    // family: the reference narrows decimal scale with HALF_UP
    // (presto-main/src/main/java/com/facebook/presto/type/DecimalCasts.java,
    // UnscaledDecimal128Arithmetic.rescale), and Spark's Cast does the
    // same — while DuckDB's narrowing decimal CAST TRUNCATES toward zero
    // (probed 2026-08: CAST(1.005 AS DECIMAL(10,2)) → 1.00,
    // CAST(1.016 …) → 1.01, CAST(2.5 AS DECIMAL(10,0)) → 2). The
    // fuzz_decimal_parity sweep therefore compares only exact,
    // never-narrowed projections; THIS pin is where the divergent
    // behavior itself is asserted, as engine-side HALF_UP literals.
    val r = spark.sql(
      """SELECT CAST(CAST(1.005 AS DECIMAL(6,3)) AS DECIMAL(10,2)) c1,
        |  CAST(CAST(1.015 AS DECIMAL(6,3)) AS DECIMAL(10,2)) c2,
        |  CAST(CAST(-1.005 AS DECIMAL(6,3)) AS DECIMAL(10,2)) c3,
        |  CAST(CAST(1.016 AS DECIMAL(6,3)) AS DECIMAL(10,2)) c4,
        |  CAST(CAST(2.5 AS DECIMAL(6,1)) AS DECIMAL(10,0)) c5,
        |  CAST(CAST(3.5 AS DECIMAL(6,1)) AS DECIMAL(10,0)) c6""".stripMargin)
      .collect()(0)
    assert(r.getDecimal(0).toPlainString == "1.01")   // DuckDB: 1.00
    assert(r.getDecimal(1).toPlainString == "1.02")   // DuckDB: 1.01
    assert(r.getDecimal(2).toPlainString == "-1.01")  // DuckDB: -1.00 (HALF_UP = away from zero)
    assert(r.getDecimal(3).toPlainString == "1.02")   // DuckDB: 1.01 (truncation, not any rounding)
    assert(r.getDecimal(4).toPlainString == "3")      // DuckDB: 2
    assert(r.getDecimal(5).toPlainString == "4")      // DuckDB: 3 (so not half-even either)
  }

  test("floating->integral CAST truncates by default (three-way dialect divergence pinned)") {
    // CAST(2.5 AS BIGINT) is THREE different numbers across the engines
    // in play: the reference rounds HALF_UP to 3 (DoubleOperators
    // .castToLong — DoubleMath.roundToLong HALF_UP), stock Spark
    // truncates to 2 (this engine's default, asserted here), and DuckDB
    // rounds half-even to 2 (probed: 2.5→2, 3.5→4, -2.5→-2) — which is
    // why fuzz_cast_parity excludes the raw cast and routes through
    // round(). The reference behavior is available under the dialect
    // conf via PrestoCastToIntegral (oracle row dialect_cast_rounding;
    // both-state pins in PrestoOperatorsSpec).
    val r = spark.sql(
      """SELECT CAST(2.5D AS BIGINT) c1, CAST(3.5D AS BIGINT) c2,
        |  CAST(-2.5D AS BIGINT) c3, CAST(2.999D AS BIGINT) c4""".stripMargin)
      .collect()(0)
    assert(r.getLong(0) == 2L)   // reference: 3, DuckDB: 2
    assert(r.getLong(1) == 3L)   // reference: 4, DuckDB: 4
    assert(r.getLong(2) == -2L)  // reference: -3, DuckDB: -2
    assert(r.getLong(3) == 2L)   // all three agree off the tie
  }

  test("checksum is order-independent and value-sensitive") {
    ready()
    val a = spark.sql("SELECT checksum(l_partkey) FROM lineitem").collect()(0).getLong(0)
    val b = spark.sql(
      """SELECT checksum(l_partkey) FROM
        |(SELECT l_partkey FROM lineitem DISTRIBUTE BY l_orderkey SORT BY l_extendedprice)""".stripMargin)
      .collect()(0).getLong(0)
    val c = spark.sql("SELECT checksum(l_partkey + 1) FROM lineitem").collect()(0).getLong(0)
    assert(a == b, "checksum must not depend on row order/partitioning")
    assert(a != c, "checksum must be sensitive to values")
  }

  test("checksum handles nulls like the reference (null adds PRIME64)") {
    ready()
    val r = spark.sql(
      """SELECT checksum(x) FROM VALUES (1), (CAST(NULL AS INT)), (2) AS t(x)""").collect()(0).getLong(0)
    val noNull = spark.sql(
      """SELECT checksum(x) FROM VALUES (1), (2) AS t(x)""").collect()(0).getLong(0)
    assert(r == noNull + 0x9E3779B185EBCA87L)
  }

  test("HLL sketch: partial sketches merge to the global estimate") {
    ready()
    // aggregate per-group sketches, merge them, compare against both the
    // direct global sketch and the exact count — under deliberately tiny
    // shuffle parallelism to force multi-partition partial/final paths
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    try {
      spark.conf.set("spark.sql.shuffle.partitions", "3")
      val row = spark.sql(
        """WITH g AS (SELECT l_returnflag, approx_set(l_orderkey) AS hll FROM lineitem GROUP BY 1)
          |SELECT cardinality(merge(hll)) AS merged,
          |  (SELECT cardinality(approx_set(l_orderkey)) FROM lineitem) AS direct,
          |  (SELECT count(DISTINCT l_orderkey) FROM lineitem) AS exact
          |FROM g""".stripMargin).collect()(0)
      val (merged, direct, exact) = (row.getLong(0), row.getLong(1), row.getLong(2))
      assert(merged == direct, s"merge of partials ($merged) must equal direct sketch ($direct)")
      assert(math.abs(merged - exact).toDouble / exact < 0.05,
        s"estimate $merged vs exact $exact exceeds 5%")
    } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
  }

  test("cardinality dispatches: array size vs HLL estimate") {
    ready()
    val r = spark.sql(
      "SELECT cardinality(array(1,2,3)), cardinality(approx_set(x)) FROM VALUES (1),(2),(3),(3) AS t(x)")
      .collect()(0)
    assert(r.getLong(0) == 3L)
    assert(r.getLong(1) == 3L) // tiny cardinality → exact under linear counting
  }

  test("histogram counts match groupBy counts under forced partial/final") {
    ready()
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    try {
      spark.conf.set("spark.sql.shuffle.partitions", "3")
      val hist = spark.sql("SELECT histogram(o_orderpriority) AS h FROM orders")
        .collect()(0).getMap[String, Long](0)
      val exact = spark.sql("SELECT o_orderpriority, count(*) FROM orders GROUP BY 1")
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(hist.size == exact.size)
      exact.foreach { case (k, v) => assert(hist(k) == v, s"key $k: ${hist(k)} != $v") }
    } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
  }

  test("presto dialect scalars: strpos, from_base/to_base, day_of_week, date_diff") {
    ready()
    val r = spark.sql(
      """SELECT strpos('hello world', 'world'),
        |  to_base(255, 16), from_base('ff', 16),
        |  day_of_week(DATE '2026-08-12'),
        |  date_diff('day', TIMESTAMP '2026-01-01', TIMESTAMP '2026-08-12'),
        |  date_format(TIMESTAMP '2026-08-12 13:45:00', '%Y-%m-%d %H:%i'),
        |  hamming_distance('abcde', 'abcdf')""".stripMargin).collect()(0)
    assert(r.getLong(0) == 7L)
    assert(r.getString(1) == "ff")
    assert(r.getLong(2) == 255L)
    assert(r.getLong(3) == 3L) // 2026-08-12 is a Wednesday (ISO 3)
    assert(r.getLong(4) == 223L)
    assert(r.getString(5) == "2026-08-12 13:45")
    assert(r.getLong(6) == 1L)
  }

  test("0.235 legacy aliases: urlencoder/urldecoder, day_of_month") {
    // UrlFunctions.java:151,162 alias the url_encode/url_decode pair;
    // DateTimeFunctions aliases day as day_of_month. The full 274-name
    // annotation surface (tools/extract_ref_names.py) resolves via
    // CheckNames; this pins the alias SEMANTICS equal to the primaries.
    ready()
    val r = spark.sql(
      """SELECT urlencoder('a b&c=d'), url_encode('a b&c=d'),
        |  urldecoder('a+b%26c%3Dd'),
        |  day_of_month(DATE '2026-02-10'), day(DATE '2026-02-10')""".stripMargin)
      .collect()(0)
    assert(r.getString(0) == r.getString(1))
    assert(r.getString(0) == "a+b%26c%3Dd")
    assert(r.getString(2) == "a b&c=d")
    assert(r.getLong(3) == 10L && r.getInt(4) == 10)
  }

  test("bitwise 3-arg forms: reference semantics, errors, double-pow mask quirk") {
    ready()
    val r = spark.sql(
      """SELECT bitwise_shift_left(7, 2, 4),
        |  bitwise_logical_shift_right(-1, 62, 64),
        |  bitwise_arithmetic_shift_right(-16, 2),
        |  bit_count(9, 64), bit_count(-7, 64), bit_count(9, 8),
        |  bitwise_shift_left(1, 58, 58)""".stripMargin).collect()(0)
    assert(r.getLong(0) == 12L)    // 28 & 0b1111
    assert(r.getLong(1) == 3L)
    assert(r.getLong(2) == -4L)
    assert(r.getLong(3) == 2L && r.getLong(4) == 62L && r.getLong(5) == 2L)
    // the reference's sub-64 mask goes through double pow
    // (BitwiseFunctions.java:101): at bits=58 `(long)(pow(2,58)-1)` rounds
    // UP to 2^58 — so 1<<58 & mask keeps the bit the exact mask would
    // clear. Reproduced bug-for-bug.
    assert(r.getLong(6) == (1L << 58))
    def fails(sql: String, msg: String): Unit = {
      val e = intercept[Exception](spark.sql(sql).collect())
      def all(t: Throwable): Seq[String] =
        if (t == null) Nil else t.getMessage +: all(t.getCause)
      assert(all(e).exists(m => m != null && m.contains(msg)),
        s"expected '$msg' in ${all(e)}")
    }
    fails("SELECT bit_count(0, 1)", "between 2 and 64")
    fails("SELECT bit_count(256, 8)", "can not be represented with 8 bits")
    fails("SELECT bitwise_shift_left(1, -1, 8)", "Specified shift must be positive")
    fails("SELECT bitwise_arithmetic_shift_right(1, -2)", "Specified shift must be positive")
  }

  test("qdigest sketch: quantiles within rank error, partials merge") {
    ready()
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    try {
      spark.conf.set("spark.sql.shuffle.partitions", "3")
      val row = spark.sql(
        """WITH g AS (SELECT l_returnflag, qdigest_agg(l_quantity) AS qd FROM lineitem GROUP BY 1)
          |SELECT value_at_quantile(merge_qdigest(qd), 0.5D) AS est,
          |  (SELECT percentile(l_quantity, 0.48) FROM lineitem) AS lo,
          |  (SELECT percentile(l_quantity, 0.52) FROM lineitem) AS hi,
          |  (SELECT values_at_quantiles(qdigest_agg(l_quantity), array(0.1D, 0.9D)) FROM lineitem) AS vq
          |FROM g""".stripMargin).collect()(0)
      val (est, lo, hi) = (row.getDouble(0), row.getDouble(1), row.getDouble(2))
      assert(est >= lo && est <= hi, s"merged p50 $est outside [$lo, $hi]")
      val vq = row.getSeq[Double](3)
      assert(vq.length == 2 && vq(0) <= vq(1))
      // inverse quantile: rank of the p50 estimate must be ~0.5
      val rank = spark.sql(
        s"""SELECT quantile_at_value(qdigest_agg(l_quantity), ${est}D) FROM lineitem""")
        .collect()(0).getDouble(0)
      assert(math.abs(rank - 0.5) < 0.08, s"quantile_at_value($est) = $rank, expected ~0.5")
    } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
  }

  test("reduce_agg folds with lambdas and merges partials") {
    ready()
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    try {
      spark.conf.set("spark.sql.shuffle.partitions", "3")
      val r = spark.sql(
        """SELECT
          |  reduce_agg(CAST(l_quantity AS BIGINT), 0L, (s, x) -> s + x * x, (a, b) -> a + b) AS sumsq,
          |  (SELECT CAST(sum(CAST(l_quantity AS BIGINT) * CAST(l_quantity AS BIGINT)) AS BIGINT)
          |   FROM lineitem) AS expected,
          |  reduce_agg(l_orderkey, CAST(NULL AS BIGINT),
          |    (s, x) -> CASE WHEN s IS NULL OR x > s THEN x ELSE s END,
          |    (a, b) -> CASE WHEN a IS NULL THEN b WHEN b IS NULL THEN a WHEN b > a THEN b ELSE a END) AS mx,
          |  (SELECT max(l_orderkey) FROM lineitem) AS mx_expected
          |FROM lineitem""".stripMargin).collect()(0)
      assert(r.getLong(0) == r.getLong(1), s"sumsq ${r.getLong(0)} != ${r.getLong(1)}")
      assert(r.getLong(2) == r.getLong(3), s"max ${r.getLong(2)} != ${r.getLong(3)}")
    } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
  }

  test("multimap_agg groups all values per key") {
    ready()
    val mm = spark.sql("SELECT multimap_agg(n_regionkey, n_name) FROM nation")
      .collect()(0).getMap[Long, scala.collection.Seq[String]](0)
    assert(mm.size == 5)
    assert(mm.values.map(_.size).sum == 25)
  }

  test("fn_decimal types: arithmetic stays DECIMAL at declared precision/scale") {
    // The CORRECTNESS queries emit DOUBLE (DuckDB's fetch coerces DECIMAL
    // to float64, so the driver's hash is representation-sensitive); the
    // decimal *typing* contract (reference Decimals.java:43) is pinned here.
    ready()
    val df = spark.sql(
      """SELECT
        |  CAST(CAST(l_orderkey AS DECIMAL(18,2)) + CAST(l_partkey AS DECIMAL(18,2)) AS DECIMAL(20,2)) AS d_add,
        |  CAST(sum(CAST(CAST(l_quantity AS BIGINT) AS DECIMAL(12,2))) AS DECIMAL(20,2)) AS qty_sum
        |FROM lineitem GROUP BY 1""".stripMargin)
    import org.apache.spark.sql.types.DecimalType
    assert(df.schema("d_add").dataType == DecimalType(20, 2))
    assert(df.schema("qty_sum").dataType == DecimalType(20, 2))
    // exactness: decimal sum == integer-cents sum (no float drift)
    val r = spark.sql(
      """SELECT CAST(sum(CAST(CAST(l_quantity AS BIGINT) AS DECIMAL(12,2))) * 100 AS BIGINT) AS cents,
        |       sum(CAST(l_quantity AS BIGINT)) * 100 AS cents_exact
        |FROM lineitem""".stripMargin).collect()(0)
    assert(r.getLong(0) == r.getLong(1))
  }

  test("map_agg and map_union build real maps") {
    ready()
    val m = spark.sql(
      "SELECT map_agg(n_name, n_nationkey) FROM nation WHERE n_regionkey = 0")
      .collect()(0).getMap[String, Long](0)
    assert(m.size == 5)
    val u = spark.sql(
      """SELECT map_union(m) FROM (
        |  SELECT map('a', 1) AS m UNION ALL SELECT map('b', 2))""".stripMargin)
      .collect()(0).getMap[String, Int](0)
    assert(u == Map("a" -> 1, "b" -> 2))
  }

  test("map_agg skips null keys and keeps one value per duplicate key") {
    ready()
    // reference MapAggregationFunction (KeyValuePairs.add): null keys
    // silently dropped, duplicate keys keep an arbitrary single value —
    // NEVER an error (the session's EXCEPTION dedup policy must not leak)
    val m = spark.sql(
      """SELECT map_agg(k, v) FROM VALUES
        |  ('a', 1), (CAST(NULL AS STRING), 99), ('a', 2), ('b', 3) AS t(k, v)""".stripMargin)
      .collect()(0).getMap[String, Int](0)
    assert(m.keySet == Set("a", "b"))
    assert(Set(1, 2).contains(m("a")) && m("b") == 3)
    val u = spark.sql(
      """SELECT map_union(m) FROM (
        |  SELECT map('a', 1, 'c', 7) AS m UNION ALL SELECT map('a', 5, 'b', 2))""".stripMargin)
      .collect()(0).getMap[String, Int](0)
    assert(u.keySet == Set("a", "b", "c"))
    assert(Set(1, 5).contains(u("a")) && u("b") == 2 && u("c") == 7)
  }

  test("histogram and multimap_agg merge value-equal binary keys") {
    ready()
    // Array[Byte] compares by reference — without key normalization every
    // occurrence of the same varbinary value became its own bucket
    val h = spark.sql(
      """SELECT histogram(to_utf8(k)) FROM VALUES ('x'), ('x'), ('y') AS t(k)""")
      .collect()(0).getMap[Array[Byte], Long](0)
    assert(h.size == 2, s"binary keys must merge by value, got ${h.size} buckets")
    assert(h.values.toSeq.sorted == Seq(1L, 2L))
    val mm = spark.sql(
      """SELECT multimap_agg(to_utf8(k), v) FROM
        |  VALUES ('x', 1), ('x', 2), ('y', 3) AS t(k, v)""".stripMargin)
      .collect()(0).getMap[Array[Byte], Seq[Int]](0)
    assert(mm.size == 2)
    // struct keys likewise
    val hs = spark.sql(
      """SELECT histogram(named_struct('a', k)) FROM VALUES (1), (1), (2) AS t(k)""")
      .collect()(0).getMap[Any, Long](0)
    assert(hs.size == 2)
  }

  test("checksum returns NULL for an empty group (reference NullableLongState)") {
    ready()
    val r = spark.sql("SELECT checksum(l_partkey) FROM lineitem WHERE l_orderkey < 0")
      .collect()(0)
    assert(r.isNullAt(0), "checksum over zero rows must be NULL")
    // all-nulls group is NOT empty: contributes PRIME64 per row
    val r2 = spark.sql("SELECT checksum(x) FROM VALUES (CAST(NULL AS INT)) AS t(x)").collect()(0)
    assert(!r2.isNullAt(0))
  }

  test("TRY returns NULL on runtime errors, value otherwise") {
    ready()
    val r = spark.sql(
      """SELECT TRY(1 + 1) AS ok,
        |  TRY(CAST(100 AS DECIMAL(10,2)) / 0) AS div0,
        |  TRY(CAST('oops' AS INTEGER)) AS badcast,
        |  TRY(CAST(1e18 AS INTEGER)) AS overflow""".stripMargin).collect()(0)
    assert(r.getInt(0) == 2)
    assert(r.isNullAt(1) && r.isNullAt(2) && r.isNullAt(3))
  }

  test("strpos instance arity and unsupported-arity error message") {
    ready()
    val r = spark.sql(
      """SELECT strpos('ababab', 'ab') AS p1, strpos('ababab', 'ab', 2) AS p2,
        |  strrpos('ababab', 'ab') AS plast, strrpos('ababab', 'ab', 2) AS plast2,
        |  strpos('ababab', 'zz', 2) AS missing""".stripMargin)
      .collect()(0)
    assert(r.getLong(0) == 1L && r.getLong(1) == 3L && r.getLong(2) == 5L &&
      r.getLong(3) == 3L && r.getLong(4) == 0L)
    // the reference rejects instance <= 0 (stringPositionFromStart);
    // from-the-end search is strrpos, not a negative instance
    intercept[Exception] {
      spark.sql("SELECT strpos('ababab', 'ab', -1)").collect()
    }
    val e = intercept[Exception] {
      spark.sql("SELECT truncate(1.5, 2, 3, 4)").collect()
    }
    assert(e.getMessage.contains("truncate"), s"arity error must name the function: ${e.getMessage}")
    assert(!e.getClass.getName.contains("MatchError"))
  }

  test("bounded_collect_list caps the buffer in update and merge") {
    ready()
    val r = spark.sql(
      """SELECT size(bounded_collect_list(l_partkey, 7)) FROM
        |(SELECT l_partkey FROM lineitem DISTRIBUTE BY l_orderkey)""".stripMargin)
      .collect()(0).getInt(0)
    assert(r == 7)
    val small = spark.sql("SELECT size(bounded_collect_list(x, 100)) FROM VALUES (1), (2) t(x)")
      .collect()(0).getInt(0)
    assert(small == 2)
  }

  test("is_json_scalar validates; json_parse canonicalizes; bad JSON errors") {
    ready()
    val r = spark.sql(
      """SELECT is_json_scalar('1'), is_json_scalar('"abc"'), is_json_scalar('null'),
        |  is_json_scalar('[1,2]'), is_json_scalar('{"a":1}'),
        |  json_parse(' { "b" : [ 1 , 2 ] } ')""".stripMargin).collect()(0)
    assert(r.getBoolean(0) && r.getBoolean(1) && r.getBoolean(2))
    assert(!r.getBoolean(3) && !r.getBoolean(4))
    assert(r.getString(5) == """{"b":[1,2]}""")
    val bad = intercept[Exception] { spark.sql("SELECT json_parse('{nope')").collect() }
    assert(bad.getMessage.contains("JSON") || bad.getCause != null)
  }

  test("t-digest: accurate mid + tail quantiles, partials merge, weights honored") {
    ready()
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    try {
      spark.conf.set("spark.sql.shuffle.partitions", "3")
      val exact = spark.sql(
        """SELECT percentile(l_extendedprice, array(0.48, 0.5, 0.52, 0.99, 0.995, 0.9985, 0.999, 0.9995)),
          |  max(l_extendedprice)
          |FROM lineitem""".stripMargin).collect()(0)
      val ps = exact.getSeq[Double](0)
      val mx = exact.getDouble(1)
      val est = spark.sql(
        s"""WITH g AS (SELECT l_returnflag, tdigest_agg(l_extendedprice) AS td
           |           FROM lineitem GROUP BY l_returnflag)
           |SELECT value_at_quantile(merge_tdigest(td), 0.5D),
           |       value_at_quantile(merge_tdigest(td), 0.999D),
           |       quantile_at_value(merge_tdigest(td), CAST(${ps(1)} AS DOUBLE))
           |FROM g""".stripMargin).collect()(0)
      assert(est.getDouble(0) >= ps(0) && est.getDouble(0) <= ps(2),
        s"p50 ${est.getDouble(0)} outside [${ps(0)}, ${ps(2)}]")
      assert(est.getDouble(1) >= ps(5) && est.getDouble(1) <= mx,
        s"p999 ${est.getDouble(1)} outside [${ps(5)}, $mx] — tail accuracy is t-digest's point")
      assert(math.abs(est.getDouble(2) - 0.5) < 0.02,
        s"rank of exact median should be ~0.5, got ${est.getDouble(2)}")
      // weighted arity: 10% of mass at 1, 90% at 100 → p50 = 100
      val w = spark.sql(
        """SELECT value_at_quantile(tdigest_agg(x, w), 0.5D)
          |FROM VALUES (1.0, 1.0), (100.0, 9.0) AS t(x, w)""".stripMargin).collect()(0).getDouble(0)
      assert(w > 50.0, s"weighted median must land on the heavy centroid, got $w")
    } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
  }

  test("set_digest: exact intersection/jaccard under the cap, digests re-merge") {
    ready()
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    try {
      spark.conf.set("spark.sql.shuffle.partitions", "3")
      // disjoint + overlapping small sets with known overlap: A={1..100},
      // B={51..150} → |A∩B|=50, J=50/150
      val r = spark.sql(
        """WITH v AS (SELECT explode(sequence(1, 150)) AS x),
          |d AS (SELECT make_set_digest(CASE WHEN x <= 100 THEN x END) AS da,
          |             make_set_digest(CASE WHEN x > 50 THEN x END) AS db
          |      FROM v)
          |SELECT intersection_cardinality(da, db),
          |       jaccard_index(da, db),
          |       cardinality(da),
          |       cardinality(hash_counts(da))
          |FROM d""".stripMargin).collect()(0)
      assert(r.getLong(0) == 50L, s"exact intersection must be 50, got ${r.getLong(0)}")
      assert(math.abs(r.getDouble(1) - 50.0 / 150.0) < 0.12,
        s"jaccard ~1/3, got ${r.getDouble(1)}")
      assert(math.abs(r.getLong(2) - 100L) <= 5, s"cardinality ~100, got ${r.getLong(2)}")
      assert(r.getLong(3) == 100L, "hash_counts must expose every retained hash")
      // merge path: per-group digests re-merge to the global digest
      val m = spark.sql(
        """WITH g AS (SELECT l_returnflag, make_set_digest(l_partkey) AS d
          |           FROM lineitem GROUP BY l_returnflag)
          |SELECT intersection_cardinality(merge_set_digest(d), merge_set_digest(d)) AS self_inter,
          |       (SELECT count(DISTINCT l_partkey) FROM lineitem) AS exact
          |FROM g""".stripMargin).collect()(0)
      assert(m.getLong(0) == m.getLong(1),
        s"merged digest self-intersection must equal exact distinct count while exact: $m")
    } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
  }

  test("MAP(ARRAY[...], ARRAY[...]) constructor and spatial point scalars") {
    ready()
    val m = spark.sql("SELECT MAP(ARRAY['a', 'b'], ARRAY[1, 2])")
      .collect()(0).getMap[String, Int](0)
    assert(m == Map("a" -> 1, "b" -> 2))
    // Spark's variadic map() must keep working
    val m2 = spark.sql("SELECT map('k', 7)").collect()(0).getMap[String, Int](0)
    assert(m2 == Map("k" -> 7))
    val r = spark.sql(
      """SELECT st_x(st_point(3.0D, 4.0D)), st_y(st_point(3.0D, 4.0D)),
        |  st_distance(st_point(0.0D, 0.0D), st_point(3.0D, 4.0D)),
        |  round(great_circle_distance(36.12, -86.67, 33.94, -118.40), 0)""".stripMargin)
      .collect()(0)
    assert(r.getDouble(0) == 3.0 && r.getDouble(1) == 4.0 && r.getDouble(2) == 5.0)
    // canonical test pair (BNA→LAX) ≈ 2886 km on a 6371.01 km sphere
    assert(math.abs(r.getDouble(3) - 2886.0) <= 1.0, s"got ${r.getDouble(3)}")
  }

  test("json_extract_scalar decides on node type, not rendered text") {
    ready()
    val r = spark.sql(
      """SELECT
        |  json_extract_scalar('{"a": "[tag]"}', '$.a'),
        |  json_extract_scalar('{"a": "{y}"}', '$.a'),
        |  json_extract_scalar('{"a": [1, 2]}', '$.a'),
        |  json_extract_scalar('{"a": {"b": 1}}', '$.a'),
        |  json_extract_scalar('{"a": 42}', '$.a'),
        |  json_extract_scalar('{"a": true}', '$.a'),
        |  json_extract_scalar('{"a": null}', '$.a'),
        |  json_extract_scalar('{"a": 1}', '$.missing'),
        |  json_extract_scalar('not json', '$.a')""".stripMargin).collect()(0)
    assert(r.getString(0) == "[tag]", "bracket-prefixed string scalar")
    assert(r.getString(1) == "{y}", "brace-prefixed string scalar")
    assert(r.isNullAt(2) && r.isNullAt(3), "containers -> NULL")
    assert(r.getString(4) == "42" && r.getString(5) == "true")
    assert(r.isNullAt(6), "JSON null -> NULL")
    assert(r.isNullAt(7) && r.isNullAt(8), "missing path / bad json -> NULL")
  }

  test("codepoint requires exactly one code point, incl. astral plane") {
    ready()
    val r = spark.sql("SELECT codepoint('A'), codepoint('é'), codepoint('😀')")
      .collect()(0)
    assert(r.getInt(0) == 65)
    assert(r.getInt(1) == 0xE9)
    assert(r.getInt(2) == 0x1F600, "surrogate pair is ONE code point")
    val err = intercept[Exception] {
      spark.sql("SELECT codepoint('ab')").collect()
    }
    assert(err.getMessage != null)
    intercept[Exception] { spark.sql("SELECT codepoint('')").collect() }
  }

  test("Joda datetime patterns translate; divergent tokens never pass through") {
    ready()
    import graft.functions.GraftFnUtils.jodaToJavaPattern
    assert(jodaToJavaPattern("YYYY-MM-dd") == "yyyy-MM-dd")
    assert(jodaToJavaPattern("ZZ") == "xxxxx")
    assert(jodaToJavaPattern("ZZZ") == "VV")
    assert(jodaToJavaPattern("'at' HH:mm") == "'at' HH:mm")
    intercept[IllegalArgumentException] { jodaToJavaPattern("xxxx-ww") }
    // 1996-12-30 is ISO week 1 of 1997: java.time 'YYYY' would print
    // 1997; Joda year-of-era must print 1996
    val r = spark.sql(
      """SELECT format_datetime(TIMESTAMP '1996-12-30', 'YYYY-MM-dd'),
        |  parse_datetime('1996-12-30 10:30:00', 'yyyy-MM-dd HH:mm:ss')""".stripMargin)
      .collect()(0)
    assert(r.getString(0) == "1996-12-30")
    assert(r.getTimestamp(1).toString == "1996-12-30 10:30:00.0")
    // column-valued pattern: the SAME translation applies per row — the
    // divergent 'YYYY' must still print the Joda year-of-era, not java's
    // week-based year, even when the pattern isn't a literal
    val c = spark.sql(
      """SELECT format_datetime(TIMESTAMP '1996-12-30', p)
        |FROM (SELECT concat('YYY', 'Y-MM-dd') AS p)""".stripMargin).collect()(0)
    assert(c.getString(0) == "1996-12-30", "non-literal pattern must translate")
    // ...and untranslatable tokens error loudly on that path too
    intercept[Exception] {
      spark.sql(
        """SELECT format_datetime(TIMESTAMP '1996-12-30', p)
          |FROM (SELECT concat('x', 'xxx') AS p)""".stripMargin).collect()
    }
  }

  test("with_timezone resolves the ambiguous fall-back hour to the EARLIER offset") {
    ready()
    // 2026-11-01 01:30 America/New_York happens twice; java.time (and so
    // this engine) picks the earlier offset, EDT = 05:30 UTC. DuckDB/
    // Postgres pick the later (EST, 06:30) — documented divergence, which
    // is why this case is spec-pinned rather than in the fn_tz_dst oracle.
    val r = spark.sql(
      """SELECT date_format(with_timezone(TIMESTAMP '2026-11-01 01:30:00',
        |  'America/New_York'), 'yyyy-MM-dd HH:mm')""".stripMargin).collect()(0)
    assert(r.getString(0) == "2026-11-01 05:30")
  }

  test("word_stem is Porter2 (Snowball english) — reference vectors + divergence classes") {
    ready()
    import graft.functions.Porter2Stemmer.stem
    // the reference's own test vectors (TestWordStemFunction.java) —
    // it wraps Snowball's EnglishStemmer, i.e. Porter2
    val referenceVectors = Seq(
      "" -> "", "x" -> "x", "abc" -> "abc",
      "generally" -> "general", "useful" -> "use", "runs" -> "run",
      "run" -> "run", "authorized" -> "author",
      "accessories" -> "accessori", "intensifying" -> "intensifi",
      "resentment" -> "resent", "faithfulness" -> "faith")
    // the classes where 1980 Porter (shipped rounds 4-7) diverged, plus
    // Porter2's exceptional forms and invariants
    val porter2Only = Seq(
      "ties" -> "tie", "dying" -> "die", "lying" -> "lie", "tying" -> "tie",
      "skis" -> "ski", "skies" -> "sky", "ugly" -> "ugli", "early" -> "earli",
      "only" -> "onli", "singly" -> "singl", "sky" -> "sky", "news" -> "news",
      "bias" -> "bias", "proceed" -> "proceed", "exceed" -> "exceed",
      "succeed" -> "succeed", "inning" -> "inning", "outing" -> "outing")
    // demo-vocabulary block (identical stems under Porter1 and Porter2 —
    // regression guard that the rewrite didn't disturb the common cases)
    val shared = Seq(
      "consign" -> "consign", "consigned" -> "consign",
      "consigning" -> "consign", "consignment" -> "consign",
      "consist" -> "consist", "consisted" -> "consist",
      "consistency" -> "consist", "consistent" -> "consist",
      "consistently" -> "consist", "consisting" -> "consist",
      "consists" -> "consist",
      "consolation" -> "consol", "consolatory" -> "consolatori",
      "console" -> "consol", "consoled" -> "consol",
      "consolidate" -> "consolid", "consolidated" -> "consolid",
      "consoling" -> "consol", "consonant" -> "conson",
      "consort" -> "consort", "conspicuous" -> "conspicu",
      "conspiracy" -> "conspiraci", "conspirator" -> "conspir",
      "conspire" -> "conspir", "constable" -> "constabl",
      "constancy" -> "constanc", "constant" -> "constant",
      "caresses" -> "caress", "ponies" -> "poni",
      "caress" -> "caress", "cats" -> "cat",
      "feed" -> "feed", "agreed" -> "agre", "plastered" -> "plaster",
      "bled" -> "bled", "motoring" -> "motor", "sing" -> "sing",
      "sized" -> "size", "hopping" -> "hop", "tanned" -> "tan",
      "falling" -> "fall", "hissing" -> "hiss", "fizzed" -> "fizz",
      "failing" -> "fail", "filing" -> "file",
      "happy" -> "happi",
      "electriciti" -> "electr", "electrical" -> "electr",
      "hopeful" -> "hope", "goodness" -> "good",
      "controll" -> "control", "roll" -> "roll")
    (referenceVectors ++ porter2Only ++ shared).foreach { case (in, want) =>
      assert(stem(in) == want, s"stem($in) = ${stem(in)}, want $want")
    }
    val r = spark.sql(
      "SELECT word_stem('Running'), word_stem('presumably', 'en')").collect()(0)
    assert(r.getString(0) == "run")
    assert(r.getString(1) == "presum")
    // the non-English Snowball transcriptions (wave 9) — the reference's
    // own vectors (TestWordStemFunction.java:38-42, as checked out)
    val langs = spark.sql(
      "SELECT word_stem('continuerait', 'fr'), word_stem('torpedearon', 'es'), " +
        "word_stem('quilomtricos', 'pt'), word_stem('pronunziare', 'it'), " +
        "word_stem('auferstnde', 'de')").collect()(0)
    assert(langs.getString(0) == "continu")
    assert(langs.getString(1) == "torped")
    assert(langs.getString(2) == "quilomtr")
    assert(langs.getString(3) == "pronunz")
    assert(langs.getString(4) == "auferstnd")
    // unknown codes stay loud (WordStemFunction.java:95)
    intercept[Exception] {
      spark.sql("SELECT word_stem('test', 'xx')").collect()
    }
  }

  test("WKT polygon subset: containment with holes/concavity, measures") {
    ready()
    import graft.functions.GeometryFns
    // donut: outer 10x10 square, inner 4x4 hole
    val donut = "POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0), (3 3, 7 3, 7 7, 3 7, 3 3))"
    assert(GeometryFns.stContains(donut, "POINT (1 1)"), "in shell")
    assert(!GeometryFns.stContains(donut, "POINT (5 5)"), "in hole")
    assert(!GeometryFns.stContains(donut, "POINT (11 5)"), "outside")
    assert(GeometryFns.area(donut) == 100.0 - 16.0)
    // concave L-shape: the notch is OUTSIDE even though the bbox covers it
    val ell = "POLYGON ((0 0, 10 0, 10 4, 4 4, 4 10, 0 10, 0 0))"
    assert(GeometryFns.stContains(ell, "POINT (2 8)"))
    assert(!GeometryFns.stContains(ell, "POINT (8 8)"), "bbox-only hit must be out")
    assert(GeometryFns.area(ell) == 10.0 * 4 + 4.0 * 6)
    val c = GeometryFns.centroid("POLYGON ((0 0, 4 0, 4 2, 0 2, 0 0))")
    assert(c.x == 2.0 && c.y == 1.0)
    // SQL surface incl. canonicalization + envelope
    val r = spark.sql(
      s"""SELECT st_contains('$donut', 'POINT (5 5)'),
         |  st_within('POINT (1 1)', '$donut'),
         |  st_envelope('$ell'),
         |  st_num_points('$donut'),
         |  st_as_text(st_point(3.5D, 4.0D))""".stripMargin).collect()(0)
    assert(!r.getBoolean(0) && r.getBoolean(1))
    // reference envelope vertex order: (xmin ymin, xmin ymax, xmax ymax,
    // xmax ymin) — TestGeoFunctions.testSTEnvelope:707 (wave 9 aligned
    // the engine's previous reversed ring)
    assert(r.getString(2) == "POLYGON ((0 0, 0 10, 10 10, 10 0, 0 0))")
    assert(r.getLong(3) == 8L)
    assert(r.getString(4) == "POINT (3.5 4)")
    intercept[Exception] {
      spark.sql("SELECT st_polygon('POLYGON ((0 0, 1 1))')").collect()
    }
  }

  test("ST_Intersects: polygon/polygon edges, holes, linestrings") {
    ready()
    import graft.functions.GeometryFns.stIntersects
    val sq = "POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0))"
    // overlapping / disjoint / contained
    assert(stIntersects(sq, "POLYGON ((5 5, 15 5, 15 15, 5 15, 5 5))"))
    assert(!stIntersects(sq, "POLYGON ((20 20, 30 20, 30 30, 20 30, 20 20))"))
    assert(stIntersects(sq, "POLYGON ((2 2, 4 2, 4 4, 2 4, 2 2))"), "containment, no edge contact")
    // shared edge only (boundary-inclusive → true)
    assert(stIntersects(sq, "POLYGON ((10 0, 20 0, 20 10, 10 10, 10 0))"), "shared edge")
    // touching corner only → true
    assert(stIntersects(sq, "POLYGON ((10 10, 20 10, 20 20, 10 20, 10 10))"), "touching corner")
    // polygon fully inside the other's HOLE → false
    val donut = "POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0), (3 3, 7 3, 7 7, 3 7, 3 3))"
    assert(!stIntersects(donut, "POLYGON ((4 4, 6 4, 6 6, 4 6, 4 4))"), "inside hole")
    assert(stIntersects(donut, "POLYGON ((2 2, 6 2, 6 6, 2 6, 2 2))"), "crosses hole boundary")
    // linestrings: crossing, inside, touching endpoint, disjoint
    assert(stIntersects(sq, "LINESTRING (-5 5, 15 5)"), "line crosses polygon")
    assert(stIntersects(sq, "LINESTRING (2 2, 8 8)"), "line inside polygon")
    assert(stIntersects("LINESTRING (0 0, 10 10)", "LINESTRING (0 10, 10 0)"), "lines cross")
    assert(stIntersects("LINESTRING (0 0, 5 5)", "LINESTRING (5 5, 9 0)"), "lines touch at endpoint")
    assert(!stIntersects("LINESTRING (0 0, 1 1)", "LINESTRING (2 2, 3 3)"), "collinear disjoint")
    assert(stIntersects("LINESTRING (0 0, 4 4)", "LINESTRING (2 2, 8 8)"), "collinear overlap")
    // points
    assert(stIntersects("POINT (5 5)", sq) && stIntersects(sq, "POINT (10 5)"))
    assert(!stIntersects("POINT (5 5)", donut), "point in hole")
    // ST_Intersection (Sutherland–Hodgman, convex clip)
    import graft.functions.GeometryFns.{area, stIntersection}
    assert(area(stIntersection(sq, "POLYGON ((5 5, 15 5, 15 15, 5 15, 5 5))")) == 25.0)
    assert(stIntersection(sq, "POLYGON ((20 20, 30 20, 30 30, 20 30, 20 20))") == "POLYGON EMPTY")
    // contained polygon comes back whole
    assert(area(stIntersection(sq, "POLYGON ((2 2, 4 2, 4 4, 2 4, 2 2))")) == 4.0)
    // concave SUBJECT against convex clip: the notch must stay out
    val ell2 = "POLYGON ((0 0, 10 0, 10 4, 4 4, 4 10, 0 10, 0 0))"
    assert(area(stIntersection(ell2, "POLYGON ((2 2, 8 2, 8 8, 2 8, 2 2))")) ==
      (6.0 * 2 + 2.0 * 4), "L-shape clipped by square keeps only the L area")
    // triangle clip (non-rectangular convex window): x+y <= 12 shaves the
    // square's far corner (legs 8) -> 100 - 8*8/2
    assert(area(stIntersection(sq, "POLYGON ((0 0, 12 0, 0 12, 0 0))")) == 68.0)
    // coincident boundaries and holes route through the robust overlay
    // (round 8, PolygonOverlay): X∩X = X, and a donut whose shell IS the
    // square intersects to the donut itself (100 − 16)
    assert(math.abs(area(stIntersection(ell2, ell2)) - 64.0) < 1e-9)
    assert(math.abs(area(stIntersection(donut, sq)) - 84.0) < 1e-9)
    // ST_Union (outside boundary walk; declared transversal subset)
    import graft.functions.GeometryFns.stUnion
    // partial overlap: inclusion–exclusion area
    assert(area(stUnion("POLYGON ((0 0, 2 0, 2 2, 0 2, 0 0))",
      "POLYGON ((1.25 1.25, 3.25 1.25, 3.25 3.25, 1.25 3.25, 1.25 1.25))")) == 7.4375)
    // disjoint → MULTIPOLYGON whose area sums the components
    val mp = stUnion("POLYGON ((0 0, 1 0, 1 1, 0 1, 0 0))",
      "POLYGON ((5 5, 7 5, 7 7, 5 7, 5 5))")
    assert(mp.startsWith("MULTIPOLYGON") && area(mp) == 5.0)
    // containment (either order) → the outer polygon
    assert(area(stUnion(sq, "POLYGON ((1.5 1.5, 2.5 1.5, 2.5 2.5, 1.5 2.5, 1.5 1.5))")) == 100.0)
    assert(area(stUnion("POLYGON ((1.5 1.5, 2.5 1.5, 2.5 2.5, 1.5 2.5, 1.5 1.5))", sq)) == 100.0)
    // concave input: crossing a plus-sign keeps both bars
    assert(area(stUnion("POLYGON ((1 0, 2 0, 2 3, 1 3, 1 0))",
      "POLYGON ((0 1.25, 3 1.25, 3 2.25, 0 2.25, 0 1.25))")) == 5.0)
    // a bar across both arms of a U encloses a pocket → union with a HOLE
    val uShape = "POLYGON ((0 0, 9 0, 9 6, 6 6, 6 2, 3 2, 3 6, 0 6, 0 0))"
    val bar = "POLYGON ((-0.75 3.25, 9.75 3.25, 9.75 4.25, -0.75 4.25, -0.75 3.25))"
    val withHole = stUnion(uShape, bar)
    assert(area(withHole) == 46.5, "shell minus enclosed hole")
    assert(withHole.count(_ == '(') == 3, "one shell ring + one hole ring")
    // POLYGON EMPTY passes the other input through
    assert(area(stUnion("POLYGON EMPTY", sq)) == 100.0)
    // shared-edge contact routes through the robust overlay (round 8,
    // PolygonOverlay): the two squares merge into one 4×2 polygon
    val sharedEdge = stUnion("POLYGON ((0 0, 2 0, 2 2, 0 2, 0 0))",
      "POLYGON ((2 0, 4 0, 4 2, 2 2, 2 0))")
    assert(area(sharedEdge) == 8.0 && !sharedEdge.startsWith("MULTI"), sharedEdge)
    // NEAR-degenerate contact (a vertex 1e-13 off the other's edge —
    // degenerate by construction, nonzero in floating point) snaps to
    // the touch inside the overlay's coordinate tolerance: a clean
    // point-contact MULTIPOLYGON, never a plausible-but-wrong ring walk
    val nearTouch = stUnion("POLYGON ((0 0, 2 0, 2 2, 0 2, 0 0))",
      "POLYGON ((1 2.0000000000001, 3 2.5, 1 4, 1 2.0000000000001))")
    assert(nearTouch.startsWith("MULTIPOLYGON") &&
      math.abs(area(nearTouch) - 6.0) < 1e-6, nearTouch)
    // …while a clearly-transversal crossing just 0.01 away still works
    assert(area(stUnion("POLYGON ((0 0, 2 0, 2 2, 0 2, 0 0))",
      "POLYGON ((0.5 1.99, 1.5 1.99, 1.5 3, 0.5 3, 0.5 1.99))")) > 4.0)
    // SQL surface: st_intersects, st_length, st_line_from_text
    val r = spark.sql(
      """SELECT st_intersects('POLYGON ((0 0, 2 0, 2 2, 0 2, 0 0))',
        |                     'POLYGON ((2 2, 3 2, 3 3, 2 3, 2 2))'),
        |  round(st_length('LINESTRING (0 0, 3 4, 3 10)'), 4),
        |  st_line_from_text('LINESTRING(0.0 0.0, 1.5 2.0)'),
        |  st_num_points('LINESTRING (0 0, 1 1, 2 2)')""".stripMargin).collect()(0)
    assert(r.getBoolean(0), "corner touch via SQL")
    assert(r.getDouble(1) == 11.0)
    assert(r.getString(2) == "LINESTRING (0 0, 1.5 2)")
    assert(r.getLong(3) == 3L)
  }

  test("Bing tiles: known landmark, quadkey roundtrip, polygon inverse") {
    ready()
    import graft.functions.GeometryFns
    // the Bing docs example: Seattle-area point at zoom 3 → tile (1, 2),
    // quadkey "021"
    val t = GeometryFns.bingTileAt(47.61, -122.33, 3)
    assert(GeometryFns.tileX(t) == 1 && GeometryFns.tileY(t) == 2)
    assert(GeometryFns.quadKey(t) == "021")
    assert(GeometryFns.fromQuadKey("021") == t)
    // tile polygon contains the original point and its centroid maps back
    val poly = GeometryFns.tilePolygon(t)
    assert(GeometryFns.stContains(poly, "POINT (-122.33 47.61)"))
    // zoom-0 tile covers the world; corner tiles clamp the neighborhood
    assert(GeometryFns.tilesAround(0.0, 0.0, 0).length == 1)
    assert(GeometryFns.tilesAround(84.0, -179.0, 4).length == 4, "corner clamps to 4")
    assert(GeometryFns.tilesAround(10.0, 10.0, 4).length == 9)
    intercept[Exception] { GeometryFns.bingTileAt(89.0, 0.0, 5) }
    intercept[Exception] { GeometryFns.encode(16, 0, 4) }
    val r = spark.sql(
      "SELECT bing_tile_quadkey(bing_tile(3, 5, 4)), bing_tile_zoom_level(bing_tile('0213'))")
      .collect()(0)
    assert(r.getString(0) == "0213")
    assert(r.getInt(1) == 4)
  }

  test("long-tail scalar batch: FNV vectors, IEEE-754, CDFs, IP, multimap") {
    ready()
    // published FNV test vectors
    val r = spark.sql(
      """SELECT fnv1_32(to_utf8('')), fnv1a_32(to_utf8('a')),
        |  fnv1_64(to_utf8('')), fnv1a_64(to_utf8('a')),
        |  from_ieee754_64(to_ieee754_64(3.1415926535D)),
        |  from_ieee754_32(to_ieee754_32(CAST(2.5 AS FLOAT))),
        |  round(normal_cdf(0.0D, 1.0D, 1.96D), 6),
        |  round(inverse_normal_cdf(0.0D, 1.0D, 0.975D), 4),
        |  round(beta_cdf(2.0D, 5.0D, 0.5D), 6),
        |  ip_prefix('192.168.255.255', 9),
        |  ip_subnet_min('192.64.0.0/9'), ip_subnet_max('192.64.0.0/9'),
        |  is_subnet_of('192.64.0.0/9', '192.100.1.2'),
        |  is_subnet_of('192.64.0.0/9', '192.64.8.0/24'),
        |  is_subnet_of('192.64.0.0/9', '10.0.0.1'),
        |  split_to_multimap('a=1;b=2;a=3', ';', '=')['a'],
        |  from_utf8(from_base64url(to_base64url(to_utf8('h?i/j'))))""".stripMargin)
      .collect()(0)
    assert(r.getLong(0) == 0x811c9dc5L.toInt.toLong)
    assert(r.getLong(1) == 0xe40c292cL.toInt.toLong)
    assert(r.getLong(2) == 0xcbf29ce484222325L)
    assert(r.getLong(3) == 0xaf63dc4c8601ec8cL)
    assert(r.getDouble(4) == 3.1415926535)
    assert(r.getFloat(5) == 2.5f)
    assert(r.getDouble(6) == 0.975002)
    assert(r.getDouble(7) == 1.96)
    assert(math.abs(r.getDouble(8) - 0.890625) < 1e-6)
    assert(r.getString(9) == "192.128.0.0/9")
    assert(r.getString(10) == "192.0.0.0")
    assert(r.getString(11) == "192.127.255.255")
    assert(r.getBoolean(12) && r.getBoolean(13) && !r.getBoolean(14))
    assert(r.getSeq[String](15) == Seq("1", "3"))
    assert(r.getString(16) == "h?i/j")
    // IPv6: RFC 5952 canonical form — longest zero run compressed to '::'
    // (leftmost on ties), lowercase, no leading zeros
    val v6 = spark.sql(
      """SELECT ip_prefix('2001:0db8:85a3:0001:0001:8a2e:0370:7334', 48),
        |  ip_subnet_min('2001:db8::/32'), ip_subnet_max('64:ff9b::17/64'),
        |  ip_prefix('::1', 128), ip_prefix('1:0:0:2:0:0:3:4', 128),
        |  ip_prefix('1:0:0:2:0:0:0:3', 128)""".stripMargin)
      .collect()(0)
    assert(v6.getString(0) == "2001:db8:85a3::/48")
    assert(v6.getString(1) == "2001:db8::")
    assert(v6.getString(2) == "64:ff9b::ffff:ffff:ffff:ffff")
    assert(v6.getString(3) == "::1/128")
    assert(v6.getString(4) == "1::2:0:0:3:4/128", "leftmost run wins the tie")
    assert(v6.getString(5) == "1:0:0:2::3/128", "longest run is compressed")
  }

  test("spooky_hash_v2: reference test vectors and path coverage") {
    ready()
    // the reference's own pins (TestVarbinaryFunctions.java:338-341)
    val r = spark.sql(
      """SELECT to_hex(spooky_hash_v2_32(to_utf8(''))),
        |  to_hex(spooky_hash_v2_64(to_utf8(''))),
        |  to_hex(spooky_hash_v2_32(to_utf8('hello'))),
        |  to_hex(spooky_hash_v2_64(to_utf8('hello')))""".stripMargin).collect()(0)
    assert(r.getString(0) == "6BF50919")
    assert(r.getString(1) == "232706FC6BF50919")
    assert(r.getString(2) == "D382E6CA")
    assert(r.getString(3) == "3768826AD382E6CA")
    // the 32-bit hash is the truncated 64-bit hash (holds for every input
    // length band: remainder-only, 16..31, whole 32-byte blocks, and the
    // >= 192-byte long-hash path)
    import graft.functions.SpookyHashV2
    Seq(0, 3, 12, 15, 16, 20, 31, 32, 33, 95, 96, 191, 192, 300).foreach { n =>
      val in = Array.tabulate[Byte](n)(i => (i * 37 + 11).toByte)
      assert(SpookyHashV2.hash32(in) == SpookyHashV2.hash64(in).toInt, s"len $n")
      assert(SpookyHashV2.hash64(in) != 0L, s"len $n degenerate")
    }
    // lambda predicates + fail + plural inverse-quantile
    val r2 = spark.sql(
      """SELECT all_match(ARRAY[2, 4, 6], x -> x % 2 = 0),
        |  any_match(ARRAY[1, 2, 3], x -> x > 2),
        |  none_match(ARRAY[1, 2, 3], x -> x > 5),
        |  bitwise_arithmetic_shift_right(-8, 1),
        |  bitwise_logical_shift_right(-1, 62),
        |  (SELECT quantiles_at_values(qdigest_agg(l_quantity),
        |     array(1.0D, 50.0D)) FROM lineitem) AS ranks""".stripMargin).collect()(0)
    assert(r2.getBoolean(0) && r2.getBoolean(1) && r2.getBoolean(2))
    assert(r2.getLong(3) == -4L, "arithmetic shift keeps the sign")
    assert(r2.getLong(4) == 3L, "logical shift zero-fills")
    val ranks = r2.getSeq[Double](5)
    assert(ranks.length == 2 && ranks(0) < 0.1 && ranks(1) > 0.9)
    val err = intercept[Exception] {
      spark.sql("SELECT fail('boom')").collect()
    }
    assert(err.getMessage.contains("boom"))
    // RETURN_NULL_ON_NULL (round 13): every Scala-UDF-backed function
    // returns NULL on a NULL argument instead of crashing — the
    // reference's default scalar null convention, applied uniformly at
    // the registry seam (TestJsonFunctions IS_JSON_SCALAR(null) et al.)
    val nulls = spark.sql(
      """SELECT is_json_scalar(NULL), json_array_contains(NULL, true),
        |  hamming_distance(NULL, 'x'), normalize(NULL),
        |  json_size(NULL, '$'), url_encode(NULL)""".stripMargin).collect()(0)
    (0 until 6).foreach(i => assert(nulls.isNullAt(i), s"col $i must be NULL"))
    // ROW(...) constructor + positional access — anonymous fields carry
    // the reference's field0..fieldN-1 names (round 13; RowType.anonymous,
    // TestRowOperators row(1,2).field0)
    val rw = spark.sql("SELECT row(1, 'a').field0, row(1, 'a').field1").collect()(0)
    assert(rw.getInt(0) == 1 && rw.getString(1) == "a")
    // multimap_from_entries: grouped values, first-occurrence key order
    val mm = spark.sql(
      """SELECT multimap_from_entries(
        |  ARRAY[struct('a', 1), struct('b', 2), struct('a', 3)])""".stripMargin)
      .collect()(0).getMap[String, scala.collection.Seq[Int]](0)
    assert(mm("a") == Seq(1, 3) && mm("b") == Seq(2))
    // scale_qdigest: doubling every weight must leave quantiles unchanged
    // but double the implied mass (rank function sees same distribution)
    val sc = spark.sql(
      """WITH s AS (SELECT qdigest_agg(l_quantity) AS qd FROM lineitem)
        |SELECT value_at_quantile(qd, 0.5D) AS p50,
        |  value_at_quantile(scale_qdigest(qd, 2.0D), 0.5D) AS p50x2,
        |  value_at_quantile(scale_tdigest(
        |    (SELECT tdigest_agg(l_quantity) FROM lineitem), 3.0D), 0.5D) AS t50
        |FROM s""".stripMargin).collect()(0)
    assert(math.abs(sc.getDouble(0) - sc.getDouble(1)) <= 1.0,
      s"scaling weights must not move quantiles: ${sc.getDouble(0)} vs ${sc.getDouble(1)}")
    assert(sc.getDouble(2) > 0)
  }

  test("md5/sha1/xxhash64 are VARBINARY digests, not the Spark builtins (round 12)") {
    ready()
    // Reference semantics (VarbinaryFunctions.java:246-300): md5/sha1/
    // xxhash64 return VARBINARY where Spark's same-named builtins emit
    // hex TEXT (md5, sha1) or a seed-42 typed-value BIGINT (xxhash64) —
    // the session registration shadows them. KATs from the reference's
    // TestVarbinaryFunctions.java:303-332.
    val df = spark.sql(
      """SELECT md5(to_utf8('hashme')) AS m, sha1(to_utf8('hashme')) AS s1,
        |  xxhash64(to_utf8('hashme')) AS x""".stripMargin)
    assert(df.schema.fields.forall(_.dataType ==
      org.apache.spark.sql.types.BinaryType), df.schema.treeString)
    val kat = spark.sql(
      """SELECT to_hex(md5(to_utf8('hashme'))),
        |  to_hex(sha1(to_utf8('hashme'))),
        |  to_hex(xxhash64(to_utf8(''))),
        |  to_hex(xxhash64(to_utf8('hashme')))""".stripMargin).collect()(0)
    assert(kat.getString(0) == "533F6357E0210E67D91F651BC49E1278")
    assert(kat.getString(1) == "FB78992E561929A6967D5328F49413FA99048D06")
    assert(kat.getString(2) == "EF46DB3751D8E999")
    assert(kat.getString(3) == "F9D96E0E1165E892")
    // Long-input vectors (exercise the 32-byte stripe loop + each tail
    // band) from an independent from-the-published-spec XXH64
    // implementation, itself validated against the reference vectors;
    // the 39-byte one is the xxHash project's own published example.
    val long = spark.sql(
      s"""SELECT to_hex(xxhash64(to_utf8('${"A" * 64}'))),
         |  to_hex(xxhash64(to_utf8('Nobody inspects the spammish repetition')))""".stripMargin)
      .collect()(0)
    assert(long.getString(0) == "09CFEE27ADB0DEBD")
    assert(long.getString(1) == "FBCEA83C8A378BF1")
    // 200 generated bytes via from_hex (non-ASCII byte coverage)
    val gen = (0 until 200).map(i => f"${(i * 37 + 11) % 256}%02X").mkString
    assert(spark.sql(s"SELECT to_hex(xxhash64(from_hex('$gen')))")
      .collect()(0).getString(0) == "2F074B6DD9094E34")
    // NON-binary operands keep the Spark builtins bit-for-bit (shapes
    // no Presto query can produce — the reference defines these only
    // over VARBINARY): Spark 4's functions.md5/functions.xxhash64
    // route by name too, so the engine's own minhash/bloom pipelines
    // depend on this dispatch arm (DigestDispatch).
    val compat = spark.sql(
      "SELECT md5('hashme') AS m, xxhash64('x') AS x1, xxhash64(5, 7) AS h")
    assert(compat.schema("m").dataType ==
      org.apache.spark.sql.types.StringType)
    assert(compat.schema("x1").dataType ==
      org.apache.spark.sql.types.LongType)
    assert(compat.schema("h").dataType ==
      org.apache.spark.sql.types.LongType)
    val compatRow = compat.collect()(0)
    assert(compatRow.getString(0) == "533f6357e0210e67d91f651bc49e1278",
      "string md5 keeps Spark's lowercase-hex-text builtin")
    assert(compatRow.getLong(2) ==
      spark.range(1).select(org.apache.spark.sql.functions
        .xxhash64(org.apache.spark.sql.functions.lit(5),
          org.apache.spark.sql.functions.lit(7))).collect()(0).getLong(0))
  }

  test("log/trim argument order and element_at bounds follow the reference (round 12)") {
    ready()
    withDialect {
    // log(number, base) — MathFunctions.java:171; Spark's builtin is
    // log(base, number), a silent swap for any ported query
    val lg = spark.sql("SELECT log(8, 2), log(100, 10), log(2.0)").collect()(0)
    assert(lg.getDouble(0) == 3.0, s"log(8, 2) = ${lg.getDouble(0)}")
    assert(lg.getDouble(1) == 2.0)
    assert(math.abs(lg.getDouble(2) - math.log(2.0)) < 1e-15,
      "1-arg log stays ln")
    // the Scala functions API must keep SPARK semantics — it feeds the
    // engine's internal pipelines (and users' DataFrame code)
    import org.apache.spark.sql.functions.{lit, log => slog}
    val apiLog = spark.range(1).select(slog(2.0, lit(8.0))).collect()(0).getDouble(0)
    assert(apiLog == 3.0, s"functions.log(2.0, 8.0) must stay log base 2 = $apiLog")
    // log-family domain edges: raw Java Math like the reference
    // (MathFunctions.java) — NaN for negative, -Infinity at zero —
    // where Spark's Log expressions return NULL; the functions API
    // keeps Spark's NULL
    val dom = spark.sql(
      "SELECT ln(-1.0), ln(0.0), log10(-5.0), log2(0.0), log(-8.0, 2.0)")
      .collect()(0)
    assert(dom.getDouble(0).isNaN && dom.getDouble(2).isNaN && dom.getDouble(4).isNaN)
    assert(dom.getDouble(1).isNegInfinity && dom.getDouble(3).isNegInfinity)
    assert(spark.range(1).select(org.apache.spark.sql.functions
      .log(org.apache.spark.sql.functions.lit(-1.0))).collect()(0).isNullAt(0),
      "functions.log keeps Spark's NULL out of domain")
    // trim/ltrim/rtrim(string, chars) — StringFunctions.java:586-614
    // source-first; Spark's 2-arg spelling is trim-set-first
    val tr = spark.sql(
      """SELECT trim('zzhizz', 'z'), ltrim('xxhixx', 'x'), rtrim('hixx', 'x'),
        |  trim('abhiba', 'ab')""".stripMargin).collect()(0)
    assert(tr.getString(0) == "hi")
    assert(tr.getString(1) == "hixx")
    assert(tr.getString(2) == "hi")
    assert(tr.getString(3) == "hi", "2-arg trim trims by codepoint SET")
    // element_at: |index| > cardinality returns NULL
    // (ArrayElementAtFunction.java:124-126); index 0 still errors;
    // negative indexes count from the back
    val ea = spark.sql(
      """SELECT element_at(ARRAY(1, 2, 3), 9), element_at(ARRAY(1, 2, 3), -9),
        |  element_at(ARRAY(1, 2, 3), -1), element_at(map(1, 'a'), 99)""".stripMargin)
      .collect()(0)
    assert(ea.isNullAt(0) && ea.isNullAt(1))
    assert(ea.getInt(2) == 3)
    assert(ea.isNullAt(3))
    val zeroErr = intercept[Exception] {
      spark.sql("SELECT element_at(ARRAY(1, 2, 3), 0)").collect()
    }
    assert(zeroErr.getMessage.toLowerCase.contains("index"),
      s"index 0 must still error: ${zeroErr.getMessage.take(100)}")
    // the SUBSCRIPT path stays strict (reference ArraySubscriptOperator
    // errors on OOB) — the element_at leniency must not leak into it
    assert(spark.sql("SELECT ARRAY(1, 2, 3)[2]").collect()(0).getInt(0) == 2)
    intercept[Exception] {
      spark.sql("SELECT ARRAY(1, 2, 3)[9]").collect()
    }
    }
  }

  test("regexp_extract/split_part/random follow the reference contracts (round 12)") {
    ready()
    withDialect {
    // regexp_extract (JoniRegexpFunctions.java:245-276): default group 0
    // = whole match (Spark defaults 1); no match and unmatched group are
    // NULL (Spark returns '')
    val re = spark.sql(
      """SELECT regexp_extract('W12_ab', 'W[0-9]+'),
        |  regexp_extract('W12_ab', 'W([0-9]+)', 1),
        |  regexp_extract('abc', 'zz(q)', 1),
        |  regexp_extract('xy', '(a)|(x)', 1)""".stripMargin).collect()(0)
    assert(re.getString(0) == "W12", "default group is 0 — the whole match")
    assert(re.getString(1) == "12")
    assert(re.isNullAt(2), "no match -> NULL, not ''")
    assert(re.isNullAt(3), "group that did not participate -> NULL")
    intercept[Exception] {
      spark.sql("SELECT regexp_extract('abc', 'a(b)', 5)").collect()
    }
    // regexp_extract_all shares the contract: default group 0, and a
    // group not participating in a match contributes a NULL element
    // (Spark appends ''); regexp_replace 2-arg removes matches
    val rea = spark.sql(
      """SELECT array_join(regexp_extract_all('W12_a W9_b', 'W[0-9]+'), '|'),
        |  regexp_extract_all('xa', '(x)|(q)', 2)[1] IS NULL,
        |  regexp_replace('a1b22c', '[0-9]+')""".stripMargin).collect()(0)
    assert(rea.getString(0) == "W12|W9", "default group 0 over all matches")
    assert(rea.getBoolean(1), "non-participating group -> NULL element")
    assert(rea.getString(2) == "abc", "2-arg regexp_replace removes matches")
    // json_extract / get_json_object (JsonFunctions.java:443-467 — BOTH
    // reference names share the ObjectExtractor) return the subtree AS
    // JSON TEXT, string scalars keep their quotes; json_extract_scalar
    // is the unquoting spelling. Under the flag get_json_object follows
    // the reference; flag-off keeps Spark's unquoting builtin (pinned in
    // the flag-OFF test below).
    val je = spark.sql(
      """SELECT json_extract('{"a": "x"}', '$.a'),
        |  get_json_object('{"a": "x"}', '$.a'),
        |  json_extract('{"a": {"b": [1, 2]}}', '$.a["b"]'),
        |  json_extract('{"a": 1}', '$.missing'),
        |  json_extract_scalar('{"a": "x"}', '$.a')""".stripMargin).collect()(0)
    assert(je.getString(0) == "\"x\"", "string scalar keeps quotes")
    assert(je.getString(1) == "\"x\"", "get_json_object = json_extract under the flag")
    assert(je.getString(2) == "[1,2]", "bracket field access, compact re-emit")
    assert(je.isNullAt(3), "missing path -> NULL")
    assert(je.getString(4) == "x", "json_extract_scalar unquotes")
    // functions.get_json_object keeps Spark's unquoting semantics
    assert(spark.range(1).select(org.apache.spark.sql.functions
      .get_json_object(org.apache.spark.sql.functions.lit("{\"a\": \"x\"}"), "$.a"))
      .collect()(0).getString(0) == "x")
    // array || element appends, element || array prepends
    // (ArrayConcatUtils.java — ResolveArrayConcatElement); string and
    // array-array || stay stock Spark
    val ac = spark.sql(
      """SELECT array_join(ARRAY(1, 2) || 3, ','),
        |  array_join(0 || ARRAY(1, 2), ','),
        |  array_join(ARRAY(1) || ARRAY(2), ','),
        |  'a' || 'b' || 1""".stripMargin).collect()(0)
    assert(ac.getString(0) == "1,2,3")
    assert(ac.getString(1) == "0,1,2")
    assert(ac.getString(2) == "1,2")
    assert(ac.getString(3) == "ab1")
    // mixed-width NUMERIC shapes widen like the reference's implicit
    // coercions (round-13 ADVICE fix: exact-type-only used to fail
    // analysis with DATA_DIFF_TYPES); non-numeric mismatch still errors
    val acw = spark.sql(
      """SELECT array_join(ARRAY(CAST(1 AS BIGINT), CAST(2 AS BIGINT)) || 3, ','),
        |  array_join(0.5 || ARRAY(1, 2), ','),
        |  typeof(ARRAY(CAST(1 AS BIGINT)) || 2)""".stripMargin).collect()(0)
    assert(acw.getString(0) == "1,2,3", "array(bigint) || int literal widens")
    assert(acw.getString(1) == "0.5,1.0,2.0" || acw.getString(1) == "0.5,1,2",
      s"decimal || array(int) widens: ${acw.getString(1)}")
    assert(acw.getString(2) == "array(bigint)")
    // a non-numeric, non-coercible mismatch keeps the analysis error
    intercept[Exception] {
      spark.sql("SELECT ARRAY(1, 2) || DATE '2001-01-01'").collect()
    }
    // zero-length regex matches advance one CODEPOINT (round-13 ADVICE
    // fix — +1 UTF-16 char used to resume mid-surrogate-pair, emitting
    // an extra element on non-BMP input)
    assert(spark.sql("SELECT size(regexp_extract_all('a😀b', ''))")
      .collect()(0).getInt(0) == 4,
      "empty-match count = codepoints + 1, surrogate pair not split")
    // map_concat: duplicate keys keep the LAST map's value and key
    // order is the reference's last-map-first merge
    // (MapConcatFunction.java) — Spark's builtin under the session's
    // EXCEPTION dedup policy would throw on overlap
    val mc = spark.sql(
      """SELECT element_at(map_concat(map(1, 'a'), map(1, 'X')), 1),
        |  array_join(map_keys(map_concat(map(1, 'a', 2, 'b'), map(3, 'c'))), ',')""".stripMargin)
      .collect()(0)
    assert(mc.getString(0) == "X", "last map wins on duplicate keys")
    assert(mc.getString(1) == "3,1,2", "last-map-first key order")
    // functions.map_concat keeps Spark behavior (errors under the
    // session's EXCEPTION policy on overlap)
    intercept[Exception] {
      spark.range(1).select(org.apache.spark.sql.functions.map_concat(
        org.apache.spark.sql.functions.map(org.apache.spark.sql.functions.lit(1),
          org.apache.spark.sql.functions.lit("a")),
        org.apache.spark.sql.functions.map(org.apache.spark.sql.functions.lit(1),
          org.apache.spark.sql.functions.lit("X")))).collect()
    }
    // split_part (StringFunctions.java:449-492): literal delimiter,
    // index past the fields -> NULL, empty delimiter -> per codepoint,
    // split_part contracts (index 0 errors)
    val sp = spark.sql(
      """SELECT split_part('a_b_c', '_', 2), split_part('a_b', '_', 9),
        |  split_part('hi', '', 2), split_part('a.b', '.', 2)""".stripMargin)
      .collect()(0)
    assert(sp.getString(0) == "b")
    assert(sp.isNullAt(1), "index past the fields -> NULL, not ''")
    assert(sp.getString(2) == "i")
    assert(sp.getString(3) == "b", "delimiter is literal, not a regex")
    // index 0 raises (StringFunctions.splitPart:453); the fork's
    // testSplitPartInvalid is @Test(expectedExceptions) — its literal
    // never validates, so the exception is the pinned contract
    val spErr = intercept[Exception] {
      spark.sql("SELECT split_part('a_b', '_', 0)").collect()
    }
    assert(spErr.getMessage != null &&
      spErr.toString.contains("Index must be greater than zero"))
    // random(n)/rand(n): a random INTEGER in [0, n) of the bound's type
    // (MathFunctions.java:574-610) — Spark reads the argument as a seed
    val rnd = spark.sql(
      "SELECT random(10), rand(CAST(7 AS BIGINT)) FROM range(50)")
    assert(rnd.schema.fields(0).dataType ==
      org.apache.spark.sql.types.IntegerType)
    assert(rnd.schema.fields(1).dataType ==
      org.apache.spark.sql.types.LongType)
    val vals = rnd.collect()
    assert(vals.forall(r => r.getInt(0) >= 0 && r.getInt(0) < 10))
    assert(vals.forall(r => r.getLong(1) >= 0L && r.getLong(1) < 7L))
    assert(vals.map(_.getInt(0)).distinct.length > 1, "actually random")
    intercept[Exception] {
      spark.sql("SELECT random(0)").collect()
    }
    // the Scala functions API keeps Spark semantics on all of these
    import org.apache.spark.sql.functions.{lit, regexp_extract => sre}
    val api = spark.range(1).select(
      sre(lit("abc"), "zz(q)", 1).as("r"),
      org.apache.spark.sql.functions.rand(10).as("d"),
      org.apache.spark.sql.functions.split_part(lit("a_b"), lit("_"), lit(9)).as("s"))
      .collect()(0)
    assert(api.getString(0) == "", "functions.regexp_extract keeps '' on no-match")
    assert(api.getDouble(1) >= 0.0 && api.getDouble(1) < 1.0,
      "functions.rand(10) stays a seeded double")
    assert(api.getString(2) == "", "functions.split_part keeps '' out of range")
    // skewness/kurtosis (CentralMomentsAggregation.java:55-86):
    // kurtosis is SAMPLE-corrected excess G2 (Spark's builtin is
    // population excess — different on every input); NULL below 4 rows
    // (skewness below 3). The Scala API keeps Spark's definitions.
    val mo = spark.sql(
      """SELECT skewness(x) AS s, kurtosis(x) AS k,
        |  (SELECT kurtosis(y) FROM (SELECT CAST(id AS DOUBLE) y FROM range(3))) AS k3,
        |  (SELECT skewness(y) FROM (SELECT CAST(id AS DOUBLE) y FROM range(2))) AS s2
        |FROM (SELECT CAST(id * id % 17 AS DOUBLE) AS x FROM range(20))""".stripMargin)
      .collect()(0)
    assert(math.abs(mo.getDouble(0) - 0.31183600641636594) < 1e-12,
      "population skewness like the reference")
    assert(math.abs(mo.getDouble(1) - (-1.479528828015647)) < 1e-12,
      "sample-corrected G2 kurtosis like the reference")
    assert(mo.isNullAt(2) && mo.isNullAt(3), "n<4 / n<3 -> NULL")
    import org.apache.spark.sql.functions.{kurtosis => skurt}
    val sparkKurt = spark.sql(
      "SELECT CAST(id * id % 17 AS DOUBLE) AS x FROM range(20)")
      .agg(skurt(org.apache.spark.sql.functions.col("x"))).collect()(0).getDouble(0)
    assert(math.abs(sparkKurt - (-1.479528828015647)) > 1e-3,
      "functions.kurtosis stays Spark's population excess (they differ here)")
    // from_hex is STRICT like the reference (fromHexVarchar): odd
    // length and non-hex characters ERROR — Spark's unhex zero-pads /
    // NULLs them — which is what makes TRY(from_hex(..)) meaningful
    intercept[Exception] {
      spark.sql("SELECT from_hex('ab1')").collect()
    }
    intercept[Exception] {
      spark.sql("SELECT from_hex('zz')").collect()
    }
    val fh = spark.sql(
      "SELECT to_hex(from_hex('Ab12')), try(from_hex('ab1'))").collect()(0)
    assert(fh.getString(0) == "AB12")
    assert(fh.isNullAt(1), "TRY turns the strict error into NULL")
    // non-ASCII Unicode digits (Arabic-Indic '٣', fullwidth '３') must
    // ERROR like the reference's ASCII-only hexDigitCharToInt — round-13
    // ADVICE fix: Character.digit accepted them, breaking TRY parity
    intercept[Exception] {
      spark.sql("SELECT from_hex('٣٣')").collect()
    }
    assert(spark.sql("SELECT try(from_hex('３３'))").collect()(0).isNullAt(0),
      "TRY(from_hex) is NULL on fullwidth digits, not bytes")
    // normalize(x, NFD): the form is a bare KEYWORD in the reference
    // grammar (SqlBase.g4 normalForm) that Spark would read as a
    // column; vectors from TestStringFunctions.java:977-984
    val nz = spark.sql(
      """SELECT normalize(concat('scho', chr(776), 'n'), NFC),
        |  normalize(concat('scho', chr(776), 'n')),
        |  length(normalize(concat('sch', chr(246), 'n'), NFD)),
        |  normalize(concat(chr(65313), 'b'), NFKC)""".stripMargin).collect()(0)
    assert(nz.getString(0) == "sch\u00f6n", "NFC composes to precomposed o-umlaut")
    assert(nz.getString(1) == "sch\u00f6n", "1-arg normalize is NFC")
    assert(nz.getInt(2) == 6, "NFD decomposes o-umlaut to o + combining diaeresis")
    assert(nz.getString(3) == "Ab", "NFKC folds fullwidth")
    // from_utf8 REPLACES invalid sequences (U+FFFD default, one-char or
    // codepoint or empty replacement) — vectors from
    // TestStringFunctions.java:1013-1020; Spark's decode would error
    val fu = spark.sql(
      """SELECT from_utf8(from_hex('58BF')), from_utf8(from_hex('58BF'), '#'),
        |  from_utf8(from_hex('58DF'), 35), from_utf8(from_hex('58BF'), ''),
        |  from_utf8(from_hex('58F7')), from_utf8(to_utf8('hello'))""".stripMargin)
      .collect()(0)
    assert(fu.getString(0) == "X�")
    assert(fu.getString(1) == "X#")
    assert(fu.getString(2) == "X#")
    assert(fu.getString(3) == "X")
    assert(fu.getString(4) == "X�")
    assert(fu.getString(5) == "hello")
    intercept[Exception] {
      spark.sql("SELECT from_utf8(to_utf8('x'), 'toolong')").collect()
    }
    // typeof renders the reference's display names (TypeOfFunction.java)
    val to = spark.sql(
      """SELECT typeof(1), typeof('ab'), typeof(to_utf8('x')),
        |  typeof(ARRAY(CAST(1 AS BIGINT))), typeof(named_struct('a', 1.5))""".stripMargin)
      .collect()(0)
    assert(to.getString(0) == "integer")
    assert(to.getString(1) == "varchar")
    assert(to.getString(2) == "varbinary")
    assert(to.getString(3) == "array(bigint)")
    assert(to.getString(4) == "row(a decimal(2,1))")
    }
  }

  test("flag OFF: SQL is pure Spark SQL — no call convention applies (round 13)") {
    ready()
    // the round-13 coherence contract: with spark.graft.prestoOperators
    // unset, every name keeps its stock Spark meaning (previously the
    // call conventions were always-on, silently changing Spark-semantics
    // SQL — the ADVICE-flagged mixed dialect)
    val r = spark.sql(
      """SELECT log(8, 2), ln(-1.0) IS NULL,
        |  trim('zzhizz', 'z'),
        |  regexp_extract('W12_ab', 'W([0-9]+)'),
        |  regexp_extract('abc', 'zz(q)', 1),
        |  split_part('a_b', '_', 9)""".stripMargin).collect()(0)
    assert(math.abs(r.getDouble(0) - 1.0 / 3.0) < 1e-12,
      "log(base, number) — Spark order")
    assert(r.getBoolean(1), "ln out of domain stays NULL")
    // Spark's 2-arg trim is trim(trimSet, source): 'zzhizz' is the SET,
    // so every char of 'z' (all in the set) is stripped -> ''
    assert(r.getString(2) == "", "2-arg trim stays trim-set-first")
    assert(r.getString(3) == "12", "regexp_extract default group stays 1")
    assert(r.getString(4) == "", "no-match stays ''")
    assert(r.getString(5) == "", "split_part OOB stays ''")
    assert(spark.sql("SELECT get_json_object('{\"a\": \"x\"}', '$.a')")
      .collect()(0).getString(0) == "x",
      "get_json_object keeps Spark's unquoting builtin with the flag off")
    // kurtosis in SQL = Spark's population excess = the functions API
    val ks = spark.sql(
      """SELECT kurtosis(x) FROM
        |(SELECT CAST(id * id % 17 AS DOUBLE) AS x FROM range(20))""".stripMargin)
      .collect()(0).getDouble(0)
    val ka = spark.sql("SELECT CAST(id * id % 17 AS DOUBLE) AS x FROM range(20)")
      .agg(org.apache.spark.sql.functions.kurtosis(
        org.apache.spark.sql.functions.col("x"))).collect()(0).getDouble(0)
    assert(ks == ka, "kurtosis stays Spark's population excess")
    // rand(5) stays a seeded double; element_at stays ANSI-erroring
    val rd = spark.sql("SELECT rand(5) FROM range(3)").collect()
    assert(rd.forall(x => x.getDouble(0) >= 0.0 && x.getDouble(0) < 1.0))
    intercept[Exception] {
      spark.sql("SELECT element_at(array(1, 2, 3), 9)").collect()
    }
  }

  test("Presto type spellings translate to Spark DDL") {
    import graft.functions.GraftSqlParser.translateType
    assert(translateType("ARRAY(VARCHAR)") == "ARRAY<STRING>")
    assert(translateType("MAP(VARCHAR, ARRAY(INTEGER))") == "MAP<STRING, ARRAY<INT>>")
    assert(translateType("ROW(a VARCHAR, b ARRAY(DOUBLE))") == "STRUCT<a: STRING, b: ARRAY<DOUBLE>>")
    assert(translateType("DECIMAL(10,2)") == "DECIMAL(10,2)")
  }

  test("teradata family: HH halfday render, char2hexint UTF-16BE, YY pivot, index") {
    Tables.register(spark, TestSession.sf)
    val r = spark.sql(
      """SELECT
        |  to_char(TIMESTAMP '2024-01-01 00:30:00', 'HH:MI') AS midnight,
        |  to_char(TIMESTAMP '2024-01-01 13:05:00', 'HH:MI') AS afternoon,
        |  char2hexint('Ab 中') AS hx,
        |  index('abcabc', 'ca') AS hit,
        |  index('abc', 'zz') AS miss,
        |  CAST(to_timestamp('2024-02-29 23:59:58', 'YYYY-MM-DD HH24:MI:SS') AS STRING) AS leap,
        |  CAST(to_date('99-12-31', 'YY-MM-DD') AS STRING) AS y99,
        |  CAST(to_date('00-01-01', 'YY-MM-DD') AS STRING) AS y00
        |""".stripMargin).collect()(0)
    // Joda hourOfHalfday renders midnight as 00 (strftime %I would say 12)
    assert(r.getString(0) == "00:30", s"midnight ${r.getString(0)}")
    assert(r.getString(1) == "01:05")
    assert(r.getString(2) == "0041006200204E2D", s"hex ${r.getString(2)}")
    assert(r.getLong(3) == 3L && r.getLong(4) == 0L)
    assert(r.getString(5) == "2024-02-29 23:59:58")
    // two-digit years land in 2000-2099 (reference pivot 2050)
    assert(r.getString(6) == "2099-12-31" && r.getString(7) == "2000-01-01")
  }

  test("color family: codes, HSB interpolation endpoints, render/bar sequences") {
    Tables.register(spark, TestSession.sf)
    val r = spark.sql(
      """SELECT color('#f00'), color('magenta'), rgb(255, 0, 0),
        |  color(0.0D, rgb(255, 0, 0), rgb(0, 255, 0)),
        |  color(1.0D, rgb(255, 0, 0), rgb(0, 255, 0)),
        |  color(5.0D, 0.0D, 10.0D, rgb(10, 20, 30), rgb(10, 20, 30)),
        |  render('x', rgb(255, 0, 0)),
        |  bar(0.5D, 4, rgb(255, 0, 0), rgb(255, 0, 0)),
        |  color(7.0D, rgb(1, 2, 3), rgb(4, 5, 6))
        |""".stripMargin).collect()(0)
    assert(r.getLong(0) == 0xFF0000L && r.getLong(1) == -6L && r.getLong(2) == 0xFF0000L)
    // interpolation endpoints round-trip through HSB exactly
    assert(r.getLong(3) == 0xFF0000L && r.getLong(4) == 0x00FF00L)
    // equal endpoints are a fixed point at any value; fraction clamps to [0,1]
    assert(r.getLong(5) == ((10L << 16) | (20L << 8) | 30L))
    assert(r.getLong(8) == ((4L << 16) | (5L << 8) | 6L))
    // pure red quantizes to ANSI cube index 196
    assert(r.getString(6) == "\u001b[38;5;196mx\u001b[0m")
    assert(r.getString(7) == "\u001b[38;5;196m█\u001b[38;5;196m█\u001b[0m  ")
    intercept[Exception] { spark.sql("SELECT color('nope')").collect() }
    intercept[Exception] { spark.sql("SELECT rgb(256, 0, 0)").collect() }
  }

  test("date_add/date_diff/date_trunc accept TIME and return DATE for DATE (ResolveTimeArithmetic)") {
    // reference DateTimeFunctions.java addFieldValueTime:414 (wrap mod
    // 24h), diffTime:482 (truncate toward zero), truncateTime:356,
    // addFieldValueDate:405 / truncateDate:347 (DATE in → DATE out,
    // where stock timestampadd/TruncTimestamp return TIMESTAMP)
    val df = spark.sql(
      """SELECT
        |  date_add('hour', 3, TIME '23:10:05.125') AS ta,
        |  date_diff('minute', TIME '10:00:00', TIME '11:30:59') AS td,
        |  date_diff('hour', TIME '11:30:59', TIME '10:00:00') AS tdn,
        |  date_trunc('hour', TIME '10:22:33.125') AS tt,
        |  date_add('quarter', 2, DATE '2020-01-31') AS dq,
        |  date_trunc('month', DATE '2020-02-15') AS dtm,
        |  date_trunc('day', DATE '2020-02-15') AS dtd""".stripMargin)
    val sch = df.schema
    assert(sch("ta").dataType.typeName.startsWith("time"))
    assert(sch("tt").dataType.typeName.startsWith("time"))
    assert(sch("dq").dataType == org.apache.spark.sql.types.DateType)
    assert(sch("dtm").dataType == org.apache.spark.sql.types.DateType)
    assert(sch("dtd").dataType == org.apache.spark.sql.types.DateType)
    val r = df.selectExpr("CAST(ta AS STRING)", "td", "tdn",
      "CAST(tt AS STRING)", "CAST(dq AS STRING)", "CAST(dtm AS STRING)",
      "CAST(dtd AS STRING)").collect()(0)
    assert(r.getString(0) == "02:10:05.125", "wraps past midnight")
    assert(r.getLong(1) == 90L)
    assert(r.getLong(2) == -1L, "truncates toward zero")
    assert(r.getString(3) == "10:00:00")
    assert(r.getString(4) == "2020-07-31", "chronology month add")
    assert(r.getString(5) == "2020-02-01")
    assert(r.getString(6) == "2020-02-15", "'day' is the identity on DATE")
    // day and up are not valid TIME fields (reference getTimeField)
    val err = intercept[Exception](
      spark.sql("SELECT date_trunc('day', TIME '10:22:33')").collect())
    assert(err.getMessage.contains("not a valid TIME field"))
    // to_iso8601's DATE overload prints date-only (toISO8601FromDate)
    val iso = spark.sql(
      """SELECT to_iso8601(DATE '2020-02-15') AS a,
        |  to_iso8601(TIMESTAMP '2020-02-15 10:30:45.123') AS b""".stripMargin)
      .collect()(0)
    assert(iso.getString(0) == "2020-02-15")
    assert(iso.getString(1) == "2020-02-15T10:30:45.123Z")
  }

  test("localtime returns the session-zone time-of-day as TIME") {
    Tables.register(spark, TestSession.sf)
    val r = spark.sql(
      """SELECT localtime() AS lt,
        |  CAST(EXTRACT(HOUR FROM localtimestamp()) * 3600
        |       + EXTRACT(MINUTE FROM localtimestamp()) * 60 AS BIGINT) AS ts_sec
        |""".stripMargin).collect()(0)
    assert(r.get(0) != null)
    // both are evaluated at query start in the pinned-UTC session; allow
    // a small skew window (they are separate expressions)
    val lt = r.getAs[java.time.LocalTime](0).toSecondOfDay
    val tod = r.getLong(1)
    val diff = math.abs(lt - tod)
    assert(diff < 120 || diff > 86280, s"localtime $lt s vs localtimestamp $tod s")
  }

  test("word_stem covers the reference's full 20-language STEMMERS matrix (round 15)") {
    Tables.register(spark, TestSession.sf)
    def stem(w: String, l: String): String =
      spark.sql(s"SELECT word_stem('$w', '$l')").collect()(0).getString(0)
    // the six languages the reference's own tests exercise
    // (TestWordStemFunction.java:26-42)
    assert(stem("authorized", "en") == "author")
    assert(stem("continuerait", "fr") == "continu")
    assert(stem("torpedearon", "es") == "torped")
    assert(stem("quilomtricos", "pt") == "quilomtr")
    assert(stem("pronunziare", "it") == "pronunz")
    assert(stem("auferstnde", "de") == "auferstnd")
    // round-15 additions, hand-derived against the published Snowball
    // specs (snowballstem.org): da step1 e + step3 els + step4
    // undouble; no step1 ene; sv step1 arne/heten + step3 fullt;
    // nl 3b lijk + repeated step 2, heid in R2 + ig
    assert(stem("bestemmelse", "da") == "bestem")
    assert(stem("indtagelse", "da") == "indtag")
    assert(stem("havnedistriktene", "no") == "havnedistrikt")
    assert(stem("possessivt", "no") == "possessiv")
    assert(stem("hans", "no") == "han")
    assert(stem("jaktkarlarne", "sv") == "jaktkarl")
    assert(stem("klokheten", "sv") == "klok")
    // fullt only strips inside R1 — the bare word is its own stem, the
    // compound strips (the spec's suffix-in-R1 discipline)
    assert(stem("fullt", "sv") == "fullt")
    assert(stem("framgangsfullt", "sv") == "framgangsfull")
    assert(stem("lichamelijk", "nl") == "licham")
    assert(stem("gezelligheid", "nl") == "gezell")
    // the ten remaining codes of WordStemFunction.java's STEMMERS map
    // (ca da... ca eu fi hu hy ir lt ro ru tr) are NOT transcribed —
    // pinned LOUD documented deltas, never silent wrong stems
    for (l <- Seq("ca", "eu", "fi", "hu", "hy", "ir", "lt", "ro", "ru", "tr")) {
      val e = intercept[Exception] { stem("test", l) }
      assert(e.toString.contains("Unknown stemmer language"), s"$l must error loudly")
      assert(e.toString.contains("documented delta"), s"$l names the delta")
    }
    // a code OUTSIDE the reference's map errors with the reference's text
    val e = intercept[Exception] { stem("test", "xx") }
    assert(e.toString.contains("Unknown stemmer language: xx"))
  }

  test("truncate/round/sign keep the reference's DECIMAL result types (round 15)") {
    Tables.register(spark, TestSession.sf)
    spark.conf.set(graft.functions.PrestoOperators.ConfKey, "true")
    try {
      def one(sql: String): Any = spark.sql(sql).collect()(0).get(0)
      // truncate(decimal(p,s)) -> decimal(max(1,p-s),0) toward zero
      // (MathFunctions.java:898-936)
      assert(one("SELECT truncate(DECIMAL '1234.56')").toString == "1234")
      assert(one("SELECT truncate(DECIMAL '-1234.56')").toString == "-1234")
      assert(one("SELECT truncate(DECIMAL '1234567890123456789012.999')").toString
        == "1234567890123456789012", "no long overflow on wide decimals")
      // truncate(decimal(p,s), n) -> decimal(p,s), digits below n zeroed
      assert(one("SELECT truncate(DECIMAL '1234.56', 1)").toString == "1234.50")
      assert(one("SELECT truncate(DECIMAL '-1239.99', 1)").toString == "-1239.90")
      assert(one("SELECT truncate(DECIMAL '1234.56', -4)").toString == "0.00")
      assert(one("SELECT truncate(DECIMAL '1234.56', 3)").toString == "1234.56")
      // round(decimal(p,s), n) keeps scale s (decimal(min(38,p+1),s)) —
      // half away from zero at scale n (MathFunctions.java:838-865)
      assert(one("SELECT round(DECIMAL '3.449', 1)").toString == "3.400")
      assert(one("SELECT round(DECIMAL '-3.450', 1)").toString == "-3.500")
      assert(one("SELECT round(DECIMAL '1254.5678', -2)").toString == "1300.0000")
      assert(one("SELECT round(DECIMAL '9.99', 1)").toString == "10.00")
      // runtime (non-literal) scale works — the decimal dynamic-scale
      // KAT residual class is CLOSED by the dispatch kernel
      val dyn = spark.sql(
        "SELECT round(DECIMAL '3.449', CAST(x AS INT)) FROM VALUES (1), (2) t(x)")
        .collect().map(_.get(0).toString).sorted
      assert(dyn.sameElements(Array("3.400", "3.450")), dyn.mkString(","))
      // truncate(double) stays in DOUBLE space (no Floor-long overflow)
      assert(one("SELECT truncate(1.0E300)") == 1.0e300)
      // sign keeps the operand's type family (decimal -> decimal(1,0))
      assert(one("SELECT sign(DECIMAL '-123.000000000000000')").toString == "-1")
      assert(one("SELECT sign(CAST(7 AS BIGINT))") == 1L)
      assert(one("SELECT sign(CAST(-2 AS INTEGER))") == -1)
      assert(one("SELECT sign(CAST(0.0 AS DOUBLE))") == 0.0)
    } finally spark.conf.unset(graft.functions.PrestoOperators.ConfKey)
  }
}
