package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, rng}
import org.scalatest.funsuite.AnyFunSuite

/** Property-based function round-trips (SURVEY §5): ScalaCheck generates
  * random inputs and each family is checked against an independent JVM
  * reference (java.time, BigDecimal, BigInt radix, direct JSON
  * bookkeeping) — coverage beyond the hand-picked vectors of FnSpec.
  * One DataFrame per family (not one job per sample): Spark evaluates
  * the whole sample batch in a single collect.
  *
  * Generators run on a FIXED seed so a failure reproduces exactly.
  */
class PropertyFnSpec extends AnyFunSuite {
  private lazy val spark = TestSession.spark

  private def samples[A](g: Gen[A], n: Int, seed: Long): List[A] =
    Gen.listOfN(n, g)(Gen.Parameters.default, rng.Seed(seed))
      .getOrElse(fail("generator exhausted"))

  test("property: Joda format_datetime/parse_datetime round-trip") {
    Tables.register(spark, TestSession.sf)
    import spark.implicits._
    // 1900..2100, microsecond values; the pattern keeps millis, so the
    // reference is the input truncated to milliseconds
    val gen = Gen.choose(-2208988800000000L, 4102444800000000L)
    val df = samples(gen, 300, 42L).toDF("us")
      .selectExpr("us",
        "unix_micros(parse_datetime(" +
          "format_datetime(timestamp_micros(us), 'yyyy-MM-dd HH:mm:ss.SSS')," +
          " 'yyyy-MM-dd HH:mm:ss.SSS')) AS back")
    df.collect().foreach { r =>
      val us = r.getLong(0)
      val expected = Math.floorDiv(us, 1000L) * 1000L
      assert(r.getLong(1) == expected, s"us=$us")
    }
  }

  test("property: Presto %-format date_format/date_parse round-trip") {
    Tables.register(spark, TestSession.sf)
    import spark.implicits._
    val gen = Gen.choose(-2208988800L, 4102444800L) // seconds range
    val df = samples(gen, 300, 43L).toDF("s")
      .selectExpr("s",
        "unix_micros(date_parse(" +
          "date_format(timestamp_seconds(s), '%Y-%m-%d %H:%i:%s')," +
          " '%Y-%m-%d %H:%i:%s')) AS back")
    df.collect().foreach { r =>
      assert(r.getLong(1) == r.getLong(0) * 1000000L, s"s=${r.getLong(0)}")
    }
  }

  test("date_parse duplicate specifiers: Joda last-field-wins (wave 9)") {
    // TestDateTimeFunctionsBase:837 — date_parse('2013 14', '%Y %y') →
    // 2014-01-01 (the earlier %Y consumes its digits but binds nothing)
    val r = spark.sql(
      "SELECT CAST(date_parse('2013 14', '%Y %y') AS STRING)").collect()(0)
    assert(r.getString(0) == "2014-01-01 00:00:00")
  }

  test("date_format renders day/meridiem names in the session locale") {
    // the reference's Korean-locale session vectors
    // (TestDateTimeFunctionsBase:886-898): %a/%W/%p/%r follow
    // Session.getLocale — SET spark.graft.locale routes through a
    // locale-carrying runtime formatter
    spark.conf.set("spark.graft.locale", "ko")
    try {
      val r = spark.sql(
        "SELECT date_format(TIMESTAMP '2001-01-09 13:04:05.321', '%a'), " +
          "date_format(TIMESTAMP '2001-01-09 13:04:05.321', '%W'), " +
          "date_format(TIMESTAMP '2001-01-09 13:04:05.321', '%p'), " +
          "date_format(TIMESTAMP '2001-01-09 13:04:05.321', '%r')").collect()(0)
      assert(r.getString(0) == "화", r.getString(0))
      assert(r.getString(1) == "화요일")
      assert(r.getString(2) == "오후")
      assert(r.getString(3) == "01:04:05 오후")
    } finally spark.conf.unset("spark.graft.locale")
    // default locale unchanged
    assert(spark.sql("SELECT date_format(TIMESTAMP '2001-01-09 13:04:05', '%a')")
      .collect()(0).getString(0) == "Tue")
  }

  test("property: decimal add/multiply agree with BigDecimal") {
    import spark.implicits._
    // DECIMAL(18,6) operands; magnitudes bounded so DECIMAL(38,12)
    // products can't overflow under ANSI
    val dec = Gen.choose(-999999999999L, 999999999999L)
      .map(v => new java.math.BigDecimal(java.math.BigInteger.valueOf(v), 6))
    val pairs = samples(Gen.zip(dec, dec), 300, 44L)
    val df = pairs.toDF("a", "b").selectExpr(
      "CAST(a AS DECIMAL(18,6)) AS a", "CAST(b AS DECIMAL(18,6)) AS b")
      .selectExpr("a", "b", "a + b AS s", "a * b AS p")
    df.collect().foreach { case Row(a: java.math.BigDecimal,
        b: java.math.BigDecimal, s: java.math.BigDecimal, p: java.math.BigDecimal) =>
      assert(s.compareTo(a.add(b)) == 0, s"sum $a + $b")
      assert(p.compareTo(a.multiply(b)) == 0, s"product $a * $b")
    }
  }

  test("property: to_base/from_base round-trip across radixes 2..36") {
    Tables.register(spark, TestSession.sf)
    import spark.implicits._
    val gen = Gen.zip(
      Gen.choose(Long.MinValue / 2 + 1, Long.MaxValue / 2), Gen.choose(2, 36))
    val df = samples(gen, 400, 45L).toDF("x", "b")
      .selectExpr("x", "b", "from_base(to_base(x, b), b) AS back",
        "to_base(x, b) AS repr")
    df.collect().foreach { r =>
      val (x, b) = (r.getLong(0), r.getInt(1))
      assert(r.getLong(2) == x, s"x=$x base=$b repr=${r.getString(3)}")
      // independent radix reference: BigInt agrees with the string form
      assert(BigInt(r.getString(3), b).longValue == x,
        s"repr ${r.getString(3)} base $b is not $x")
    }
  }

  test("property: json_extract_scalar and array length agree with generation") {
    Tables.register(spark, TestSession.sf)
    import spark.implicits._
    val gen = for {
      a <- Gen.choose(-1000000, 1000000)
      c <- Gen.alphaNumStr.map(_.take(12))
      d <- Gen.listOf(Gen.choose(-99, 99)).map(_.take(8))
    } yield (a, c, d)
    val rows = samples(gen, 300, 46L).map { case (a, c, d) =>
      val json =
        s"""{"a": $a, "b": {"c": "$c"}, "d": [${d.mkString(",")}]}"""
      (json, a.toString, c, d.length.toLong,
        d.headOption.map(_.toString).orNull)
    }
    val df = rows.toDF("j", "ea", "ec", "elen", "ed0").selectExpr(
      "ea", "ec", "elen", "ed0",
      "json_extract_scalar(j, '$.a') AS a",
      "json_extract_scalar(j, '$.b.c') AS c",
      "CAST(json_array_length(json_extract(j, '$.d')) AS BIGINT) AS len",
      "json_extract_scalar(j, '$.d[0]') AS d0")
    df.collect().foreach { r =>
      assert(r.getString(4) == r.getString(0), "path $.a")
      assert(r.getString(5) == r.getString(1), "path $.b.c")
      assert(r.getLong(6) == r.getLong(2), "array length $.d")
      assert(r.getString(7) == r.getString(3), "path $.d[0]")
    }
  }

  test("property: string and binary codec round-trips") {
    Tables.register(spark, TestSession.sf)
    import spark.implicits._
    // chr/codepoint are inverses over BMP + astral codepoints
    // (excluding surrogates)
    val cpGen = Gen.frequency(
      8 -> Gen.choose(0x20, 0xD7FF),
      2 -> Gen.choose(0x10000, 0x2FFFF))
    val cps = samples(cpGen, 200, 48L)
    spark.createDataset(cps).toDF("cp")
      .selectExpr("cp", "codepoint(chr(cp)) AS back")
      .collect().foreach(r =>
        assert(r.getAs[Number](1).longValue == r.getInt(0).toLong,
          s"cp=${r.getInt(0)}"))
    // hex and base64 round-trips over random binary; levenshtein/
    // hamming identities over the same strings
    val strGen = Gen.listOf(Gen.choose(0, 255)).map(_.take(30))
    val rows = samples(strGen, 200, 49L).map(bs => Tuple1(bs.map(_.toByte).toArray))
    rows.toDF("b").selectExpr(
      "b",
      "from_hex(to_hex(b)) AS hx",
      "from_base64(to_base64(b)) AS b64",
      "length(b) AS n")
      .collect().foreach { r =>
        val b = r.getAs[Array[Byte]](0)
        assert(java.util.Arrays.equals(b, r.getAs[Array[Byte]](1)), "hex")
        assert(java.util.Arrays.equals(b, r.getAs[Array[Byte]](2)), "base64")
      }
    val sGen = Gen.listOf(Gen.alphaNumChar).map(_.mkString.take(25))
    val pairs = samples(Gen.zip(sGen, sGen), 200, 50L)
    pairs.toDF("a", "b").selectExpr(
      "levenshtein_distance(a, a) AS laa",
      "levenshtein_distance(a, b) AS lab",
      "levenshtein_distance(b, a) AS lba",
      "reverse(reverse(a)) = a AS rev2",
      "length(a) AS la", "length(b) AS lb")
      .collect().foreach { r =>
        def n(i: Int) = r.getAs[Number](i).longValue
        assert(n(0) == 0L, "levenshtein(a,a) must be 0")
        assert(n(1) == n(2), "levenshtein must be symmetric")
        assert(n(1) >= math.abs(n(4) - n(5)),
          "levenshtein lower bound |len diff|")
        assert(r.getBoolean(3), "reverse is an involution")
      }
  }

  test("property: url_encode/url_decode round-trip on printable strings") {
    Tables.register(spark, TestSession.sf)
    import spark.implicits._
    val gen = Gen.listOf(Gen.frequency(
      8 -> Gen.alphaNumChar,
      3 -> Gen.oneOf(' ', '&', '=', '?', '/', '+', '%', '#', 'ü', 'é', '中'),
    )).map(_.mkString.take(40))
    val df = samples(gen, 300, 47L).toDF("s")
      .selectExpr("s", "url_decode(url_encode(s)) AS back")
    df.collect().foreach { r =>
      assert(r.getString(1) == r.getString(0), s"s=${r.getString(0)}")
    }
  }

  test("property: top-n aggregates equal sort-and-slice on random data") {
    Tables.register(spark, TestSession.sf)
    import spark.implicits._
    // random (value, key) pairs with unique keys (ties are arbitrary by
    // contract, so the generator avoids them to keep the test exact)
    val gen = Gen.listOfN(400, Gen.zip(Gen.choose(-1000L, 1000L), Gen.choose(0, 9)))
      .map(_.zipWithIndex.map { case ((v, g), i) => (v, i.toLong * 7 + g, g) })
    for ((rows, seed) <- Seq(49L, 50L).map(s => (samples(gen, 1, s).head, s))) {
      val df = rows.toDF("v", "k", "g").repartition(5)
      val got = df.groupBy("g").agg(expr("max_by(v, k, 7)").as("top"),
          expr("min_by(v, k, 7)").as("bottom"))
        .collect().map(r => r.getInt(0) -> (r.getSeq[Long](1), r.getSeq[Long](2))).toMap
      val expect = rows.groupBy(_._3).map { case (g, rs) =>
        val sorted = rs.sortBy(-_._2)
        g -> (sorted.take(7).map(_._1).toSeq, sorted.reverse.take(7).map(_._1).toSeq)
      }
      assert(got == expect, s"seed=$seed: top-n diverged from sort-and-slice")
    }
  }

  test("property: bloom filter has no false negatives on random strings") {
    Tables.register(spark, TestSession.sf)
    import spark.implicits._
    val gen = Gen.listOfN(500, Gen.nonEmptyListOf(Gen.alphaNumChar).map(_.mkString.take(24)))
    val inSet = samples(gen, 1, 51L).head.distinct
    val outSet = samples(gen, 1, 52L).head.distinct.filterNot(inSet.toSet).map("out-" + _)
    val bloom = inSet.toDF("s").agg(expr("bloom_filter_agg(s, 10000L)")).scalar()
    val probed = (inSet.map((_, true)) ++ outSet.map((_, false))).toDF("s", "member")
      .withColumn("hit", call_function("bloom_might_contain", bloom, col("s")))
      .collect().map(r => (r.getString(0), r.getBoolean(1), r.getBoolean(2)))
    // every member MUST hit (the property the dedup pipelines rely on)
    assert(probed.filter(_._2).forall(_._3), "bloom false negative!")
    // and the fpp stays plausible at this sizing (10k items default bits)
    val fp = probed.filterNot(_._2).count(_._3)
    assert(fp <= math.max(5, outSet.size / 10), s"$fp false positives of ${outSet.size}")
  }

  test("property: url_extract_* recover the components a URL was built from") {
    Tables.register(spark, TestSession.sf)
    import spark.implicits._
    val host = for {
      a <- Gen.nonEmptyListOf(Gen.alphaLowerChar).map(_.mkString.take(10))
      b <- Gen.nonEmptyListOf(Gen.alphaLowerChar).map(_.mkString.take(10))
    } yield s"$a.$b.com"
    val seg = Gen.nonEmptyListOf(Gen.alphaNumChar).map(_.mkString.take(8))
    val gen = for {
      proto <- Gen.oneOf("http", "https")
      h <- host
      port <- Gen.option(Gen.choose(1, 65535))
      p1 <- seg; p2 <- seg
      k <- seg; v <- seg
      frag <- Gen.option(seg)
    } yield (proto, h, port, s"/$p1/$p2", s"$k=$v", k, v, frag)
    val rows = samples(gen, 300, 48L)
    val df = rows.map { case (proto, h, port, path, qs, k, _, frag) =>
      val url = proto + "://" + h + port.map(":" + _).getOrElse("") +
        path + "?" + qs + frag.map("#" + _).getOrElse("")
      (url, k)
    }.toDF("url", "k").selectExpr(
      "url_extract_protocol(url)", "url_extract_host(url)",
      "url_extract_port(url)", "url_extract_path(url)",
      "url_extract_query(url)", "url_extract_parameter(url, k)",
      "url_extract_fragment(url)")
    df.collect().zip(rows).foreach { case (r, (proto, h, port, path, qs, _, v, frag)) =>
      assert(r.getString(0) == proto && r.getString(1) == h, s"proto/host: $r")
      assert(Option(r.get(2)).map(_.toString.toInt) == port, s"port: $r vs $port")
      assert(r.getString(3) == path && r.getString(4) == qs, s"path/query: $r")
      assert(r.getString(5) == v, s"parameter: $r vs $v")
      assert(Option(r.getString(6)) == frag, s"fragment: $r vs $frag")
    }
  }

  test("property: dialect structural comparison invariants (reference EQUAL recursion)") {
    // Independent test-side model of the reference's ArrayEqualOperator
    // recursion over ARRAY<DOUBLE>: three-valued equality with raw-Java
    // element compares. The engine path under test is the full SQL one
    // (parser seam → PrestoComparisonRule → interpreted expressions).
    def refEq(a: List[Option[Double]], b: List[Option[Double]]): Option[Boolean] = {
      if (a.length != b.length) return Some(false)
      var ind = false
      a.zip(b).foreach {
        // raw Java ==: NaN never equal (incl. NaN vs NaN) — definite
        case (Some(x), Some(y)) => if (!(x == y)) return Some(false)
        case _ => ind = true
      }
      if (ind) None else Some(true)
    }
    def refContains(a: List[Option[Double]], e: Option[Double]): Option[Boolean] = {
      if (e.isEmpty) return None
      var foundNull = false
      a.foreach {
        case Some(x) => if (x == e.get) return Some(true)
        case None => foundNull = true
      }
      if (foundNull) None else Some(false)
    }

    val elem: Gen[Option[Double]] = Gen.frequency(
      3 -> Gen.oneOf(0.0, 1.5, -2.5, 7.0).map(Some(_)),
      1 -> Gen.const(Some(Double.NaN)),
      1 -> Gen.const(Some(Double.PositiveInfinity)),
      1 -> Gen.const(None))
    val arr: Gen[List[Option[Double]]] = Gen.choose(0, 3).flatMap(Gen.listOfN(_, elem))
    val gen = for { a <- arr; b <- arr; e <- elem } yield (a, b, e)
    val rows = samples(gen, 250, 49L)

    def lit(v: Option[Double]): String = v match {
      case None => "CAST(NULL AS DOUBLE)"
      case Some(d) if d.isNaN => "CAST('NaN' AS DOUBLE)"
      case Some(d) if d.isPosInfinity => "CAST('Infinity' AS DOUBLE)"
      case Some(d) => s"CAST($d AS DOUBLE)"
    }
    def alit(a: List[Option[Double]]): String =
      if (a.isEmpty) "CAST(array() AS ARRAY<DOUBLE>)"
      else s"array(${a.map(lit).mkString(", ")})"

    val values = rows.map { case (a, b, e) =>
      s"(${alit(a)}, ${alit(b)}, ${lit(e)})"
    }.mkString(",\n")
    spark.conf.set(graft.functions.PrestoOperators.ConfKey, "true")
    val got =
      try spark.sql(
        s"""SELECT a = b AS eq, b = a AS eq_sym, a <=> b AS nsd,
           |  contains(a, e) AS mem, array_position(a, e) AS pos,
           |  size(array_remove(a, e)) AS rmsz
           |FROM VALUES $values t(a, b, e)""".stripMargin).collect()
      finally spark.conf.unset(graft.functions.PrestoOperators.ConfKey)

    got.zip(rows).foreach { case (r, (a, b, e)) =>
      val eq = if (r.isNullAt(0)) None else Some(r.getBoolean(0))
      val eqSym = if (r.isNullAt(1)) None else Some(r.getBoolean(1))
      assert(eq == refEq(a, b), s"eq: a=$a b=$b")
      assert(eqSym == refEq(b, a), s"symmetry: a=$a b=$b")
      // <=> must agree with every DEFINITE eq verdict
      if (eq.contains(true)) assert(r.getBoolean(2), s"nsd vs eq-true: $a $b")
      if (eq.contains(false) && a.length == b.length &&
          a.zip(b).forall { case (x, y) => x.isDefined == y.isDefined &&
            x.forall(!_.isNaN) && y.forall(!_.isNaN) })
        assert(!r.getBoolean(2), s"nsd vs eq-false: $a $b")
      val mem = if (r.isNullAt(3)) None else Some(r.getBoolean(3))
      assert(mem == refContains(a, e), s"contains: a=$a e=$e")
      // position/remove consistency with contains
      if (e.isDefined) {
        val pos = r.getLong(4)
        if (mem.contains(true)) {
          assert(pos >= 1 && a(pos.toInt - 1) == e, s"pos: a=$a e=$e pos=$pos")
        } else assert(pos == 0L, s"pos-absent: a=$a e=$e pos=$pos")
        val removed = a.count(x => x.isDefined && x.get == e.get)
        assert(r.getInt(5) == a.length - removed, s"remove: a=$a e=$e")
      } else assert(r.isNullAt(4) && r.isNullAt(5), s"null value: $a")
    }
  }

  test("property: dialect text rewrites never fire inside string literals or comments (round 15)") {
    // The ADVICE class fixed pointwise four times by round 14
    // (angle-bracket splitTopLevel, typed-literal quote guard, …):
    // dialect-SHAPED text inside a string literal or comment must pass
    // through every rewrite pass untouched. The check is SEMANTIC, not
    // textual — rewriteRawBackslashes legitimately re-escapes literal
    // text, so the property is "executing the rewritten statement
    // yields exactly the payload", which also catches bad re-escapes.
    Tables.register(spark, TestSession.sf)
    spark.conf.set(graft.functions.PrestoOperators.ConfKey, "true")
    try {
      val frags = Seq("ARRAY [1, 2]", "MAP(", "TYPE 'x'", "ORDER BY 1",
        "--", "/*", "*/", "ESCAPE '\\'", "CAST(x AS JSON)", "U&'d\\0061'",
        "X'0A 1B'", "TIMESTAMP '2020-01-01 12:00:00 UTC'",
        "INTERVAL '12 10' DAY TO SECOND", "5 / 2", "TRY(1/0)",
        "AT TIME ZONE 'UTC'", "DECIMAL '1.5'", "a[1]", "''quoted''",
        "\\d+", "FROM unnest(x) WITH ORDINALITY", "TABLESAMPLE BERNOULLI (10)",
        "CHAR 'y'", "JSON '{\"a\":1}'", "col AS \"alias\"", "EXTRACT(YEAR FROM d)")
      val gen = for {
        n <- Gen.choose(1, 6)
        parts <- Gen.listOfN(n,
          Gen.oneOf(Gen.oneOf(frags), Gen.alphaNumStr.map(_.take(8))))
        sep <- Gen.oneOf(" ", "", " x ")
      } yield parts.mkString(sep)
      val payloads = samples(gen, 150, 1501L)
      payloads.foreach { p =>
        val lit = p.replace("'", "''")
        val got = spark.sql(s"SELECT '$lit' AS c").collect()(0).getString(0)
        assert(got == p, s"literal corrupted: <$p> -> <$got>")
      }
      // comments: dialect-shaped comment text must not trigger rewrites
      // or corrupt the statement around it
      payloads.foreach { p =>
        // Spark brackets NEST: strip both comment tokens from the probe
        val line = p.replace("*/", "xx").replace("/*", "yy").replace("\n", " ")
        val r1 = spark.sql(s"SELECT 7 AS c /* $line */").collect()(0).get(0)
        assert(r1 == 7, s"block comment broke the statement: <$line>")
        val r2 = spark.sql(s"SELECT 7 AS c -- $line").collect()(0).get(0)
        assert(r2 == 7, s"line comment broke the statement: <$line>")
      }
    } finally spark.conf.unset(graft.functions.PrestoOperators.ConfKey)
  }
}
