package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.ZonedTimestamps

/** Pins the opt-in zone-carrying TIMESTAMP WITH TIME ZONE mode
  * (ZonedTimestamps; reference presto-spi TimestampWithTimeZoneType.java
  * / DateTimeEncoding.java, presto-main DateTimeFunctions.java). Every
  * family asserts BOTH states: conf off (the engine's documented
  * UTC-instant approximation — provably untouched) and on (carried-zone
  * reference semantics).
  */
class ZonedTimestampsSpec extends AnyFunSuite {
  private lazy val spark = TestSession.spark

  private def withZoned[T](f: => T): T = {
    spark.conf.set(ZonedTimestamps.ConfKey, "true")
    try f finally spark.conf.unset(ZonedTimestamps.ConfKey)
  }

  private def one(sql: String): Any =
    spark.sql(sql).collect()(0).get(0)

  private val TokyoLit = "TIMESTAMP '2001-08-22 03:04:05.321 Asia/Tokyo'"

  test("zoned literal: carried zone renders, instant is the zone-shifted UTC") {
    withZoned {
      assert(one(s"SELECT CAST($TokyoLit AS VARCHAR)") ==
        "2001-08-22 03:04:05.321 Asia/Tokyo")
      // the instant is 18:04:05.321 UTC of the previous day (UTC+9)
      assert(one(s"SELECT to_unixtime($TokyoLit)") ==
        one("SELECT to_unixtime(TIMESTAMP '2001-08-21 18:04:05.321')"))
      // offset-zone literal
      assert(one("SELECT CAST(TIMESTAMP '2001-08-22 03:04:05.321 +05:30' AS VARCHAR)") ==
        "2001-08-22 03:04:05.321 +05:30")
    }
    // conf off: Spark's own literal parse consumes the zone into the
    // instant (documented approximation), renders in session UTC
    assert(one(s"SELECT CAST($TokyoLit AS STRING)").toString
      .startsWith("2001-08-21 18:04:05.321"))
  }

  test("at_timezone keeps the instant and sets the zone; with_timezone interprets the wall clock") {
    withZoned {
      assert(one(s"SELECT CAST(at_timezone($TokyoLit, 'America/Los_Angeles') AS VARCHAR)") ==
        "2001-08-21 11:04:05.321 America/Los_Angeles")
      // same instant in any zone ⇒ equal (millisUtc comparison)
      assert(one(s"SELECT at_timezone($TokyoLit, 'America/Los_Angeles') = $TokyoLit") == true)
      assert(one(
        "SELECT CAST(with_timezone(TIMESTAMP '2020-06-01 12:00:00', 'Asia/Tokyo') AS VARCHAR)") ==
        "2020-06-01 12:00:00.000 Asia/Tokyo")
      // AT TIME ZONE spelling routes through the same construct
      assert(one(s"SELECT CAST($TokyoLit AT TIME ZONE 'UTC' AS VARCHAR)") ==
        "2001-08-21 18:04:05.321 UTC")
    }
    // conf off: at_timezone is the documented wall-clock shift
    assert(one("SELECT CAST(at_timezone(TIMESTAMP '2020-01-01 00:00:00', 'Asia/Tokyo') AS STRING)")
      .toString.startsWith("2020-01-01 09:00:00"))
  }

  test("timezone_hour / timezone_minute read the carried zone's offset at the instant") {
    withZoned {
      assert(one("SELECT timezone_hour(TIMESTAMP '2020-01-01 10:00:00 +05:30')") == 5L)
      assert(one("SELECT timezone_minute(TIMESTAMP '2020-01-01 10:00:00 +05:30')") == 30L)
      // negative offsets truncate toward zero on BOTH fields
      assert(one("SELECT timezone_hour(TIMESTAMP '2020-01-01 10:00:00 -05:30')") == -5L)
      assert(one("SELECT timezone_minute(TIMESTAMP '2020-01-01 10:00:00 -05:30')") == -30L)
      // DST-varying offset: New York is -5 in January, -4 in July
      assert(one("SELECT timezone_hour(TIMESTAMP '2020-01-15 10:00:00 America/New_York')") == -5L)
      assert(one("SELECT timezone_hour(TIMESTAMP '2020-07-15 10:00:00 America/New_York')") == -4L)
      // half-hour DST zone: Lord Howe +10:30 standard, +11:00 daylight
      assert(one("SELECT timezone_minute(TIMESTAMP '2020-07-15 10:00:00 Australia/Lord_Howe')") == 30L)
      assert(one("SELECT timezone_minute(TIMESTAMP '2020-01-15 10:00:00 Australia/Lord_Howe')") == 0L)
    }
    // conf off: pinned constant-0 approximation
    assert(one("SELECT timezone_hour(TIMESTAMP '2020-01-15 10:00:00')") == 0L)
  }

  test("field extraction reads the wall clock in the value's own zone") {
    withZoned {
      assert(one(s"SELECT hour($TokyoLit)") == 3)
      assert(one(s"SELECT day($TokyoLit)") == 22)
      assert(one(s"SELECT EXTRACT(HOUR FROM $TokyoLit)") == 3)
      assert(one(s"SELECT minute($TokyoLit)") == 4)
      assert(one(s"SELECT year_of_week($TokyoLit)") == 2001L)
      // format functions observe the wall clock too
      assert(one(s"SELECT format_datetime($TokyoLit, 'yyyy-MM-dd HH:mm')") ==
        "2001-08-22 03:04")
    }
    // conf off: naive literal extraction unchanged
    assert(one("SELECT hour(TIMESTAMP '2001-08-22 03:04:05')") == 3)
  }

  test("casts: VARCHAR renders, TIMESTAMP yields the wall clock, DATE its date") {
    withZoned {
      assert(one(s"SELECT CAST(CAST($TokyoLit AS TIMESTAMP) AS VARCHAR)").toString
        .startsWith("2001-08-22 03:04:05.321"))
      assert(one(s"SELECT CAST(CAST($TokyoLit AS DATE) AS VARCHAR)") == "2001-08-22")
      // CAST(varchar AS TIMESTAMP WITH TIME ZONE) keeps the string's zone
      assert(one(
        "SELECT CAST(CAST('2001-08-22 03:04:05.321 Asia/Tokyo' AS TIMESTAMP WITH TIME ZONE) AS VARCHAR)") ==
        "2001-08-22 03:04:05.321 Asia/Tokyo")
      // naive sources attach the session zone (UTC)
      assert(one(
        "SELECT CAST(CAST(TIMESTAMP '2001-08-22 03:04:05' AS TIMESTAMP WITH TIME ZONE) AS VARCHAR)") ==
        "2001-08-22 03:04:05.000 UTC")
    }
    // conf off: the cast maps to the documented TIMESTAMP approximation
    assert(one("SELECT CAST(CAST('2001-08-22 03:04:05 Asia/Tokyo' AS TIMESTAMP WITH TIME ZONE) AS STRING)")
      .toString.startsWith("2001-08-21 18:04:05"))
  }

  test("iso8601: to_iso8601 prints the numeric offset; from_iso8601_timestamp carries it") {
    withZoned {
      assert(one(s"SELECT to_iso8601($TokyoLit)") == "2001-08-22T03:04:05.321+09:00")
      assert(one("SELECT to_iso8601(TIMESTAMP '2001-08-22 03:04:05.321 UTC')") ==
        "2001-08-22T03:04:05.321Z")
      assert(one("SELECT CAST(from_iso8601_timestamp('2001-08-22T03:04:05.321+09:00') AS VARCHAR)") ==
        "2001-08-22 03:04:05.321 +09:00")
      assert(one("SELECT CAST(from_iso8601_timestamp('2001-08-22T03:04:05.321Z') AS VARCHAR)") ==
        "2001-08-22 03:04:05.321 UTC")
    }
    // conf off unchanged: UTC-instant 'Z' rendering
    assert(one("SELECT to_iso8601(TIMESTAMP '2001-08-22 03:04:05.321')") ==
      "2001-08-22T03:04:05.321Z")
  }

  test("comparisons and IN-lists are instant-based across zones") {
    withZoned {
      // 03:04 Tokyo == 18:04 previous day UTC — equal instants
      assert(one(s"SELECT $TokyoLit = TIMESTAMP '2001-08-21 18:04:05.321 UTC'") == true)
      assert(one(s"SELECT $TokyoLit > TIMESTAMP '2001-08-21 18:04:05.320 UTC'") == true)
      assert(one(s"SELECT $TokyoLit < TIMESTAMP '2001-08-21 18:04:05.322 UTC'") == true)
      // zoned vs naive: the naive side is the documented UTC instant
      assert(one(s"SELECT $TokyoLit = TIMESTAMP '2001-08-21 18:04:05.321'") == true)
      assert(one(s"SELECT $TokyoLit BETWEEN TIMESTAMP '2001-08-21 18:00:00 UTC' AND TIMESTAMP '2001-08-21 19:00:00 UTC'") == true)
      assert(one(s"SELECT $TokyoLit IN (TIMESTAMP '2001-08-21 18:04:05.321 UTC', TIMESTAMP '2030-01-01 00:00:00 UTC')") == true)
    }
  }

  test("interval arithmetic: precise units add to the instant, day+ adds wall-clock in zone") {
    withZoned {
      // spring forward in New York, 2026-03-08 02:00 EST → 03:00 EDT.
      val z = "with_timezone(TIMESTAMP '2026-03-08 00:30:00', 'America/New_York')"
      // +26 hours of REAL time crosses the gap: wall advances 27h
      assert(one(s"SELECT CAST($z + INTERVAL '26' HOUR AS VARCHAR)") ==
        "2026-03-09 03:30:00.000 America/New_York")
      // INTERVAL DAY TO SECOND is an EXACT duration in the reference
      // (DateTimeOperators.java adds raw millis): +1 DAY = +24 real
      // hours, so the wall clock lands one hour later across the gap
      assert(one(s"SELECT CAST($z + INTERVAL '1' DAY AS VARCHAR)") ==
        "2026-03-09 01:30:00.000 America/New_York")
      // …whereas the date_add FIELD spelling is wall-aware; the two
      // notions really differ by one hour of real time
      assert(one(s"SELECT date_diff('hour', date_add('day', 1, $z), $z + INTERVAL '1' DAY)") == 1L)
      // year-month adds on the wall clock too
      assert(one(s"SELECT CAST($z + INTERVAL '1' MONTH AS VARCHAR)") ==
        "2026-04-08 00:30:00.000 America/New_York")
      // subtraction mirrors addition
      assert(one(s"SELECT CAST(($z + INTERVAL '1' DAY) - INTERVAL '1' DAY AS VARCHAR)") ==
        "2026-03-08 00:30:00.000 America/New_York")
      // date_add field spelling: day+ fields are wall-aware (Joda
      // chronology add), hour and below act on the instant
      assert(one(s"SELECT CAST(date_add('day', 1, $z) AS VARCHAR)") ==
        "2026-03-09 00:30:00.000 America/New_York")
      assert(one(s"SELECT CAST(date_add('hour', 26, $z) AS VARCHAR)") ==
        "2026-03-09 03:30:00.000 America/New_York")
      // date_diff: 'day' counts wall days (1), 'hour' counts real hours (23)
      assert(one(s"SELECT date_diff('day', $z, date_add('day', 1, $z))") == 1L)
      assert(one(s"SELECT date_diff('hour', $z, date_add('day', 1, $z))") == 23L)
    }
    // conf off: naive interval arithmetic unchanged
    assert(one("SELECT CAST(TIMESTAMP '2026-03-08 00:30:00' + INTERVAL '1' DAY AS STRING)")
      .toString.startsWith("2026-03-09 00:30:00"))
  }

  test("date_trunc truncates the wall clock in the zone and keeps the zone") {
    withZoned {
      assert(one(s"SELECT CAST(date_trunc('day', $TokyoLit) AS VARCHAR)") ==
        "2001-08-22 00:00:00.000 Asia/Tokyo")
      assert(one(s"SELECT CAST(date_trunc('hour', $TokyoLit) AS VARCHAR)") ==
        "2001-08-22 03:00:00.000 Asia/Tokyo")
      // truncation result still compares by instant
      assert(one(s"SELECT date_trunc('day', $TokyoLit) < $TokyoLit") == true)
    }
    // conf off unchanged
    assert(one("SELECT CAST(date_trunc('day', TIMESTAMP '2001-08-22 03:04:05') AS STRING)")
      .toString.startsWith("2001-08-22 00:00:00"))
  }

  test("nulls propagate; min/max and ORDER BY follow instant order") {
    withZoned {
      assert(one("SELECT at_timezone(CAST(NULL AS TIMESTAMP), 'Asia/Tokyo') IS NULL") == true)
      assert(one("SELECT timezone_hour(CAST(NULL AS TIMESTAMP))") == null)
      // min/max pick by instant (struct ordering is instant-first)
      assert(one(
        s"""SELECT CAST(min(z) AS VARCHAR) FROM (
           |  SELECT $TokyoLit AS z
           |  UNION ALL SELECT TIMESTAMP '2001-08-21 17:00:00.000 UTC')""".stripMargin) ==
        "2001-08-21 17:00:00.000 UTC")
      val ordered = spark.sql(
        s"""SELECT CAST(z AS VARCHAR) FROM (
           |  SELECT $TokyoLit AS z
           |  UNION ALL SELECT TIMESTAMP '2001-08-21 17:00:00.000 UTC'
           |  UNION ALL SELECT TIMESTAMP '2001-08-22 05:00:00.000 +09:00')
           |ORDER BY z""".stripMargin).collect().map(_.getString(0))
      assert(ordered.head == "2001-08-21 17:00:00.000 UTC")
      assert(ordered.last == "2001-08-22 05:00:00.000 +09:00")
    }
  }

  test("GROUP BY / DISTINCT / count(DISTINCT) / window partition on a raw zoned value key the INSTANT") {
    withZoned {
      // same instant carried in two zones — the reference hashes millisUtc
      // alone (TimestampWithTimeZoneType.java), so this is ONE group.
      // Round 12's ZonedGroupingRule closed what was previously the
      // documented (instant, zone)-pair residual.
      val t =
        s"(SELECT $TokyoLit AS z UNION ALL SELECT TIMESTAMP '2001-08-21 18:04:05.321 UTC')"
      assert(spark.sql(s"SELECT z FROM $t GROUP BY z").count() == 1)
      assert(spark.sql(s"SELECT DISTINCT z FROM $t").count() == 1)
      // the aggregate observes the WHOLE merged group
      assert(spark.sql(s"SELECT count(*) AS n FROM $t GROUP BY z")
        .collect().head.getLong(0) == 2L)
      // the surviving group-key value is an arbitrary MEMBER of the group
      // (reference: whichever packed value the hash table saw first)
      val r = spark.sql(s"SELECT CAST(z AS VARCHAR) AS r FROM $t GROUP BY z")
        .collect().head.getString(0)
      assert(Set("2001-08-22 03:04:05.321 Asia/Tokyo",
        "2001-08-21 18:04:05.321 UTC").contains(r), r)
      // count(DISTINCT z) counts instants
      assert(one(s"SELECT count(DISTINCT z) FROM $t") == 1L)
      // window partitioning shares a frame across zones of one instant
      val rn = spark.sql(
        s"SELECT count(*) OVER (PARTITION BY z) AS c FROM $t")
        .collect().map(_.getLong(0)).toSeq
      assert(rn == Seq(2L, 2L))
      // an ORDINARY 2-field struct is untouched — still keys the pair
      val s2 =
        "(SELECT named_struct('a', 1, 'b', 'x') AS g UNION ALL SELECT named_struct('a', 1, 'b', 'y'))"
      assert(spark.sql(s"SELECT g FROM $s2 GROUP BY g").count() == 2)
    }
    // conf OFF: the rule must not fire at all (no zoned type exists;
    // struct grouping is stock)
    val off = spark.sql(
      """SELECT g FROM (SELECT named_struct('ztz_utc', TIMESTAMP '2001-01-01 00:00:00', 'ztz_tz', 'UTC') AS g
        |  UNION ALL SELECT named_struct('ztz_utc', TIMESTAMP '2001-01-01 00:00:00', 'ztz_tz', 'Asia/Tokyo')) GROUP BY g""".stripMargin)
    assert(off.count() == 2)
  }

  test("set operations and dropDuplicates on zoned values key the INSTANT (round 13)") {
    withZoned {
      // same instant in two zones: INTERSECT matches, EXCEPT is empty,
      // UNION DISTINCT merges — reference millisUtc equality
      // (TimestampWithTimeZoneType.java; SetOperationNode hashes the
      // type's own hash). Closes what was the documented set-op residual.
      val a = s"(SELECT $TokyoLit AS z)"
      val b = "(SELECT TIMESTAMP '2001-08-21 18:04:05.321 UTC' AS z)"
      assert(spark.sql(s"SELECT z FROM $a INTERSECT SELECT z FROM $b").count() == 1)
      assert(spark.sql(s"SELECT z FROM $a EXCEPT SELECT z FROM $b").count() == 0)
      assert(spark.sql(s"SELECT z FROM $a UNION SELECT z FROM $b").count() == 1)
      // the surviving value is an arbitrary MEMBER (zone from one input)
      val surv = spark.sql(
        s"SELECT CAST(z AS VARCHAR) AS r FROM ($a INTERSECT $b)")
        .collect().head.getString(0)
      assert(Set("2001-08-22 03:04:05.321 Asia/Tokyo",
        "2001-08-21 18:04:05.321 UTC").contains(surv), surv)
      // a DIFFERENT instant still separates
      val c = "(SELECT TIMESTAMP '2001-08-21 18:04:05.322 UTC' AS z)"
      assert(spark.sql(s"SELECT z FROM $a INTERSECT SELECT z FROM $c").count() == 0)
      assert(spark.sql(s"SELECT z FROM $a UNION SELECT z FROM $c").count() == 2)
      // the DataFrame dropDuplicates path (Deduplicate) keys instants too
      val dd = spark.sql(s"SELECT 'k' AS k, z FROM $a UNION ALL SELECT 'k', z FROM $b")
        .dropDuplicates("z")
      assert(dd.count() == 1)
      // ordinary struct set-ops are untouched (the rule only fires on the
      // zoned shape)
      val s2a = "(SELECT named_struct('a', 1, 'b', 'x') AS g)"
      val s2b = "(SELECT named_struct('a', 1, 'b', 'y') AS g)"
      assert(spark.sql(s"SELECT g FROM $s2a INTERSECT SELECT g FROM $s2b").count() == 0)
    }
    // conf OFF: raw 2-field structs keep stock pair keying
    val off = spark.sql(
      """SELECT g FROM (SELECT named_struct('ztz_utc', TIMESTAMP '2001-01-01 00:00:00', 'ztz_tz', 'UTC') AS g)
        |INTERSECT
        |SELECT g FROM (SELECT named_struct('ztz_utc', TIMESTAMP '2001-01-01 00:00:00', 'ztz_tz', 'Asia/Tokyo') AS g)""".stripMargin)
    assert(off.count() == 0)
  }

  test("now()/current_timestamp carry the session zone under the zoned mode (round 13)") {
    withZoned {
      // zone is the session zone (UTC here) — DateTimeFunctions.java
      // currentTimestamp packs session.getTimeZoneKey()
      assert(one("SELECT timezone_hour(now())") == 0L)
      assert(one("SELECT timezone_minute(now())") == 0L)
      assert(one("SELECT CAST(now() AS VARCHAR)").toString.endsWith(" UTC"))
      // instant agrees with localtimestamp (one ComputeCurrentTime epoch)
      assert(one(
        "SELECT abs(to_unixtime(now()) - to_unixtime(localtimestamp)) < 2.0") == true)
      // the bare keyword resolves to the same zoned value
      assert(one("SELECT to_unixtime(current_timestamp) = to_unixtime(now())") == true)
      assert(one("SELECT CAST(current_timestamp AS VARCHAR)").toString.endsWith(" UTC"))
      // comparisons against zoned columns are instant-based (no analysis
      // error from mixed zoned/zoned operands)
      assert(one(s"SELECT $TokyoLit < now()") == true)
    }
    // conf OFF: now() stays Spark's plain TIMESTAMP
    assert(spark.sql("SELECT now() AS t").schema.head.dataType ==
      org.apache.spark.sql.types.TimestampType)
  }

  test("TIME WITH TIME ZONE: literal, rendering, extraction, offsets, casts") {
    withZoned {
      assert(one("SELECT CAST(TIME '03:04:05.321 +05:30' AS VARCHAR)") ==
        "03:04:05.321 +05:30")
      assert(one("SELECT CAST(TIME '03:04:05 Asia/Tokyo' AS VARCHAR)") ==
        "03:04:05.000 Asia/Tokyo")
      // wall-clock extraction
      assert(one("SELECT hour(TIME '03:04:05 +05:30')") == 3)
      assert(one("SELECT minute(TIME '03:04:05 +05:30')") == 4)
      // millisecond accepts TIME like the reference (round 12:
      // MillisecondOf late-binding — the format path rejects TIME)
      assert(one("SELECT millisecond(TIME '03:04:05.321 +05:30')") == 321L)
      assert(one("SELECT millisecond(TIME '03:04:05.321')") == 321L)
      // offsets evaluate at the type's epoch date (fixed offsets exact;
      // region zones take their 1970-01-01 offset — the reference's
      // packed-chronology quirk)
      assert(one("SELECT timezone_hour(TIME '03:04:05 -05:30')") == -5L)
      assert(one("SELECT timezone_minute(TIME '03:04:05 -05:30')") == -30L)
      assert(one("SELECT timezone_hour(TIME '03:04:05 Asia/Tokyo')") == 9L)
      // casts: TIME drops the zone; strings carry their token; TIME
      // sources attach the session zone; a zoned TIMESTAMP keeps its
      // wall time AND zone
      assert(one("SELECT CAST(CAST(TIME '03:04:05.321 +05:30' AS TIME) AS VARCHAR)")
        .toString.startsWith("03:04:05.321"))
      assert(one("SELECT CAST(CAST('07:08:09 +05:30' AS TIME WITH TIME ZONE) AS VARCHAR)") ==
        "07:08:09.000 +05:30")
      assert(one("SELECT CAST(CAST(TIME '07:08:09' AS TIME WITH TIME ZONE) AS VARCHAR)") ==
        "07:08:09.000 UTC")
      assert(one(s"SELECT CAST(CAST($TokyoLit AS TIME WITH TIME ZONE) AS VARCHAR)") ==
        "03:04:05.321 Asia/Tokyo")
      // CURRENT_TIME carries the session zone under the conf
      assert(one("SELECT CAST(CURRENT_TIME AS VARCHAR)").toString.endsWith(" UTC"))
    }
    // conf off: the cast maps to the documented zoneless TIME
    assert(one("SELECT CAST(CAST(TIME '07:08:09' AS TIME WITH TIME ZONE) AS STRING)")
      .toString.startsWith("07:08:09"))
  }

  test("TIME WITH TIME ZONE ± INTERVAL wraps modulo 24h, zone carried (round 11)") {
    // reference DateTimeOperators.java:79-88 (modulo24Hour on the zoned
    // time's chronology); YEAR TO MONTH is a no-op on any TIME (:137)
    withZoned {
      assert(one("SELECT CAST(TIME '23:30:00 Asia/Tokyo' + INTERVAL '45' MINUTE AS VARCHAR)") ==
        "00:15:00.000 Asia/Tokyo")
      assert(one("SELECT CAST(TIME '00:10:00 +05:30' - INTERVAL '20' MINUTE AS VARCHAR)") ==
        "23:50:00.000 +05:30", "subtraction past midnight wraps up, zone kept")
      assert(one("SELECT CAST(TIME '07:08:09 UTC' + INTERVAL '2' MONTH AS VARCHAR)") ==
        "07:08:09.000 UTC", "year-month interval is a no-op")
      assert(one("SELECT CAST(CAST(NULL AS TIME WITH TIME ZONE) + INTERVAL '1' HOUR AS VARCHAR)")
        == null)
    }
  }

  test("TIME WITH TIME ZONE comparisons order by UTC-normalized wall time") {
    withZoned {
      // 10:00 +05:30 is the same UTC-normalized instant as 04:30 UTC
      assert(one("SELECT TIME '10:00:00 +05:30' = TIME '04:30:00 UTC'") == true)
      assert(one("SELECT TIME '10:00:00 +05:30' < TIME '04:30:01 UTC'") == true)
      assert(one("SELECT TIME '10:00:00 +05:30' > TIME '04:29:59 UTC'") == true)
      // a LATER wall clock in a FURTHER-east zone can be the earlier value
      assert(one("SELECT TIME '23:00:00 Asia/Tokyo' < TIME '20:00:00 UTC'") == true)
      // MIXED TIME vs TIME WITH TIME ZONE: the plain side coerces to
      // the session (UTC) zone and compares UTC-normalized (round 12,
      // ResolveZonedTimeCompare — previously failed analysis)
      assert(one("SELECT TIME '10:00:00' = TIME '10:00:00 UTC'") == true)
      assert(one("SELECT TIME '15:30:00 +05:30' = TIME '10:00:00'") == true)
      assert(one("SELECT TIME '15:30:00 +05:30' < TIME '10:00:01'") == true)
      assert(one(
        "SELECT TIME '10:00:00' IN (TIME '15:30:00 +05:30', TIME '01:00:00')") == true)
      // ALL-ZONED BETWEEN lifts to instants too (round 15 — the raw
      // Between node compared the zoned struct WALL-first before;
      // TestTimestampWithTimeZoneBase.java:218 class, KAT value gate)
      assert(one("SELECT TIME '03:04:05.321 +07:09' between " +
        "TIME '02:04:05.111 +06:09' and TIME '02:04:05.333 +06:09'") == true)
      assert(one("SELECT TIMESTAMP '2001-01-22 03:04:05.321 +07:09' between " +
        "TIMESTAMP '2001-01-22 02:04:05.111 +06:09' and " +
        "TIMESTAMP '2001-01-22 02:04:05.321 +06:09'") == true)
      assert(one("SELECT TIME '03:04:05.321 +07:09' between " +
        "TIME '02:04:05.322 +06:09' and TIME '02:04:05.333 +06:09'") == false)
    }
  }

  test("at_timezone over TIME WITH TIME ZONE keeps the instant (round 14)") {
    // reference KAT vectors (TestDateTimeFunctionsBase testTimeWithTimeZone
    // atTimeZone family), epoch-date offsets per the engine's TTZ model;
    // incl. the offset-INTERVAL zone form (DateTimeFunctions.java:319)
    withZoned {
      assert(one("SELECT CAST(at_timezone(TIME '10:00 Europe/Warsaw', 'UTC') AS VARCHAR)")
        == "09:00:00.000 UTC")
      assert(one("SELECT CAST(at_timezone(TIME '10:00 +01:00', INTERVAL '2' HOUR) AS VARCHAR)")
        == "11:00:00.000 +02:00")
      // wraps into [0, 24h)
      assert(one("SELECT CAST(at_timezone(TIME '00:00 +14:00', '-14:00') AS VARCHAR)")
        == "20:00:00.000 -14:00")
      // identity zone
      assert(one("SELECT CAST(at_timezone(TIME '10:00 Asia/Kabul', 'Asia/Kabul') AS VARCHAR)")
        == "10:00:00.000 Asia/Kabul")
      // seconds in the offset interval error like the reference
      val e = intercept[Exception] {
        one("SELECT CAST(at_timezone(TIME '10:00 +01:00', INTERVAL '130' SECOND) AS VARCHAR)")
      }
      assert(e.getMessage.contains("interval contains seconds") ||
        Option(e.getCause).exists(_.getMessage.contains("interval contains seconds")))
    }
  }

  test("lenient literal/cast text: 1-digit fields, juxtaposed offsets, padded walls (wave 9)") {
    withZoned {
      // the reference's Joda text parser is maximally lenient
      // (TestTimestampWithTimeZoneBase:273-318, TestTimeWithTimeZoneBase:67)
      assert(one("SELECT cast(TIMESTAMP '2001-1-22 03:04 +07:09' as varchar)")
        == "2001-01-22 03:04:00.000 +07:09")
      assert(one("SELECT cast(TIMESTAMP '2001-1-22 +07:09' as varchar)")
        == "2001-01-22 00:00:00.000 +07:09")
      assert(one("SELECT cast(TIME '3:4+07:09' AS VARCHAR)")
        == "03:04:00.000 +07:09")
      assert(one(
        "SELECT cast(cast('2001-1-22 03:04 +07:09' as timestamp with time zone) AS VARCHAR)")
        == "2001-01-22 03:04:00.000 +07:09")
      assert(one(
        "SELECT cast(cast('2001-1-22 Europe/Berlin' as timestamp with time zone) AS VARCHAR)")
        == "2001-01-22 00:00:00.000 Europe/Berlin")
    }
  }

  test("the zoned mode leaves ordinary queries untouched (casts, comparisons, intervals all stock)") {
    withZoned {
      assert(one("SELECT CAST(1.9 AS STRING)") == "1.9")
      assert(one("SELECT CAST('2020-01-02' AS DATE) > CAST('2020-01-01' AS DATE)") == true)
      assert(one("SELECT CAST(TIMESTAMP '2020-01-01 00:00:00' + INTERVAL '2' HOUR AS STRING)")
        .toString.startsWith("2020-01-01 02:00:00"))
      assert(one("SELECT date_diff('day', DATE '2020-01-01', DATE '2020-02-01')") == 31L)
      assert(one("SELECT 3 IN (1, 2, 3)") == true)
      assert(one("SELECT hour(TIMESTAMP '2020-01-01 07:08:09')") == 7)
    }
  }
}
