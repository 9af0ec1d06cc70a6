package graft.functions

import graft.QueryGroup

/** Exercises the engine's registered Presto-named function layer
  * (GraftFunctions) through `spark.sql` — the same entry path a Presto
  * user would take. Every query runs against the DuckDB oracle; where a
  * function's output is engine-specific (hashes, sketches) the query
  * asserts the *property* the reference guarantees (order independence,
  * error bounds) and emits booleans the oracle can reproduce.
  */
object PrestoFnOps extends QueryGroup {

  def defs = Seq(
    // ── COLOR family (ColorFunctions.java): the CLI-visualization
    // scalars. COLOR ≙ BIGINT with the reference's encoding, so the
    // oracle reproduces the codes arithmetically and the ANSI strings
    // with chr() concatenation (system colors + the 6×6×6-cube constant
    // 196 for pure red); HSB interpolation between DIFFERENT endpoints
    // is pinned in FnSpec instead (java.awt HSB in SQL isn't worth it).──
    q("fn_color",
      """SELECT o_orderkey,
        |  65280 AS c_hex,
        |  -2 AS c_red,
        |  (o_orderkey % 256) * 65536 + (255 - o_orderkey % 256) AS c_rgb,
        |  chr(27) || '[38;5;4m' || o_orderpriority || chr(27) || '[0m' AS rendered,
        |  chr(27) || '[38;5;2m' || chr(10003) || chr(27) || '[0m' AS ok_mark,
        |  repeat(chr(27) || '[38;5;196m' || chr(9608),
        |      CAST(floor((o_orderkey % 11) / 10.0 * 5) AS INT))
        |    || chr(27) || '[0m'
        |    || repeat(' ', 5 - CAST(floor((o_orderkey % 11) / 10.0 * 5) AS INT)) AS meter
        |FROM orders WHERE o_orderkey < 1000
        |ORDER BY o_orderkey""".stripMargin) { (s, _) =>
      s.sql("""SELECT o_orderkey,
              |  color('#0f0') AS c_hex,
              |  color('red') AS c_red,
              |  rgb(o_orderkey % 256, 0, 255 - o_orderkey % 256) AS c_rgb,
              |  render(o_orderpriority, color('blue')) AS rendered,
              |  render(true) AS ok_mark,
              |  bar((o_orderkey % 11) / 10.0, 5, rgb(255, 0, 0), rgb(255, 0, 0)) AS meter
              |FROM orders WHERE o_orderkey < 1000
              |ORDER BY o_orderkey""".stripMargin)
    },

    // ── Teradata compatibility family (presto-teradata-functions):
    // index/char2hexint + TO_CHAR/TO_DATE/TO_TIMESTAMP over the
    // Teradata token language. The oracle reproduces the formats with
    // strftime tokens and the hex with a per-codepoint walk; HH
    // (halfday-hour, renders midnight as "00" where strftime's %I says
    // "12") is pinned in FnSpec instead. ──
    q("fn_teradata",
      """WITH t AS (
        |  SELECT o_orderkey, o_orderpriority,
        |    CAST(o_orderdate AS TIMESTAMP)
        |      + (o_orderkey % 86399) * INTERVAL 1 SECOND AS ts
        |  FROM orders WHERE o_orderkey < 2000)
        |SELECT o_orderkey,
        |  strftime(ts, '%Y-%m-%d %H:%M:%S') AS c24,
        |  strftime(ts, '%d/%m/%y') AS c2,
        |  CAST(ts AS DATE) AS d,
        |  ts AS tt,
        |  DATE '2051-07-19' AS pivot_hi,
        |  DATE '2049-07-19' AS pivot_lo,
        |  CAST(strpos(o_orderpriority, 'URGENT') AS BIGINT) AS idx,
        |  array_to_string(list_transform(range(1, length(o_orderpriority) + 1),
        |    i -> lpad(upper(to_hex(unicode(substr(o_orderpriority, CAST(i AS INT), 1)))), 4, '0')), '') AS hx
        |FROM t ORDER BY o_orderkey""".stripMargin) { (s, _) =>
      s.sql("""WITH t AS (
              |  SELECT o_orderkey, o_orderpriority,
              |    CAST(o_orderdate AS TIMESTAMP)
              |      + make_interval(0, 0, 0, 0, 0, 0, o_orderkey % 86399) AS ts
              |  FROM orders WHERE o_orderkey < 2000)
              |SELECT o_orderkey,
              |  to_char(ts, 'YYYY-MM-DD HH24:MI:SS') AS c24,
              |  to_char(ts, 'DD/MM/YY') AS c2,
              |  to_date(to_char(ts, 'YYYY-MM-DD'), 'YYYY-MM-DD') AS d,
              |  to_timestamp(to_char(ts, 'YYYY-MM-DD HH24:MI:SS'), 'YYYY-MM-DD HH24:MI:SS') AS tt,
              |  to_date('07-19-51', 'MM-DD-YY') AS pivot_hi,
              |  to_date('07-19-49', 'MM-DD-YY') AS pivot_lo,
              |  index(o_orderpriority, 'URGENT') AS idx,
              |  char2hexint(o_orderpriority) AS hx
              |FROM t ORDER BY o_orderkey""".stripMargin)
    },

    // checksum (ChecksumAggregationFunction.java:47): same rows in any
    // order / partitioning → same checksum; different rows → different
    q("fn_checksum",
      """SELECT l_returnflag, true AS order_independent, true AS sensitive
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin) { (s, _) =>
      s.sql("""WITH a AS (
              |  SELECT l_returnflag, checksum(l_partkey) AS c FROM lineitem GROUP BY l_returnflag),
              |b AS (
              |  SELECT l_returnflag, checksum(l_partkey) AS c
              |  FROM (SELECT l_returnflag, l_partkey FROM lineitem
              |        DISTRIBUTE BY l_suppkey SORT BY l_extendedprice DESC)
              |  GROUP BY l_returnflag),
              |d AS (
              |  SELECT l_returnflag, checksum(l_partkey + 1) AS c FROM lineitem GROUP BY l_returnflag)
              |SELECT a.l_returnflag,
              |  a.c = b.c AS order_independent,
              |  a.c <> d.c AS sensitive
              |FROM a JOIN b ON a.l_returnflag = b.l_returnflag
              |JOIN d ON a.l_returnflag = d.l_returnflag
              |ORDER BY l_returnflag""".stripMargin)
    },

    // approx_set / merge / cardinality (HLL sketch family): per-group
    // estimates and the merged global estimate within the p=12 error bound
    q("fn_approx_set_hll",
      """SELECT l_returnflag AS grp, true AS within_bound
        |FROM lineitem GROUP BY l_returnflag
        |UNION ALL SELECT '<merged>', true
        |ORDER BY grp""".stripMargin) { (s, _) =>
      s.sql("""WITH g AS (
              |  SELECT l_returnflag, approx_set(l_orderkey) AS hll,
              |         count(DISTINCT l_orderkey) AS exact
              |  FROM lineitem GROUP BY l_returnflag),
              |per_group AS (
              |  SELECT l_returnflag AS grp,
              |    abs(cardinality(hll) - exact) / CAST(exact AS DOUBLE) < 0.05 AS within_bound
              |  FROM g),
              |merged AS (
              |  SELECT '<merged>' AS grp,
              |    abs(cardinality(merge(hll)) -
              |        (SELECT count(DISTINCT l_orderkey) FROM lineitem))
              |      / CAST((SELECT count(DISTINCT l_orderkey) FROM lineitem) AS DOUBLE) < 0.05
              |      AS within_bound
              |  FROM g)
              |SELECT grp, within_bound FROM per_group
              |UNION ALL SELECT grp, within_bound FROM merged
              |ORDER BY grp""".stripMargin)
    },

    // histogram (histogram/Histogram.java:48): exact value→count map,
    // emitted as a sorted entry string so the oracle can reproduce it
    q("fn_histogram_map",
      """SELECT array_to_string(list_sort(list(event_type || ':' || CAST(n AS VARCHAR))), ',') AS hist
        |FROM (SELECT event_type, count(*) AS n FROM events GROUP BY event_type)""".stripMargin) { (s, _) =>
      s.sql("""SELECT array_join(
              |  array_sort(transform(map_entries(histogram(event_type)),
              |    e -> concat(e.key, ':', CAST(e.value AS STRING)))), ',') AS hist
              |FROM events""".stripMargin)
    },

    // map_agg + map_union (MapAggregationFunction.java:48)
    q("fn_map_agg",
      """WITH m AS (SELECT n_regionkey, map(list(n_name), list(n_nationkey)) AS m
        |           FROM nation GROUP BY n_regionkey)
        |SELECT n_regionkey,
        |  array_to_string(list_sort(list_transform(map_entries(m),
        |    e -> e.key || '=' || CAST(e.value AS VARCHAR))), ',') AS entries
        |FROM m ORDER BY n_regionkey""".stripMargin) { (s, _) =>
      s.sql("""WITH m AS (SELECT n_regionkey, map_agg(n_name, n_nationkey) AS m
              |          FROM nation GROUP BY n_regionkey)
              |SELECT n_regionkey,
              |  array_join(array_sort(transform(map_entries(m),
              |    e -> concat(e.key, '=', CAST(e.value AS STRING)))), ',') AS entries
              |FROM m ORDER BY n_regionkey""".stripMargin)
    },

    // Presto datetime dialect: date_diff/date_add with unit strings,
    // ISO day_of_week, MySQL-style date_format (DateTimeFunctions.java:68)
    q("fn_presto_datetime",
      """SELECT o_orderkey,
        |  date_diff('day', TIMESTAMP '1995-01-01', o_orderdate) AS dd,
        |  date_diff('month', TIMESTAMP '1995-01-01', o_orderdate) AS dm,
        |  CAST(o_orderdate + INTERVAL 45 DAY AS TIMESTAMP) AS plus45d,
        |  CAST(o_orderdate + INTERVAL 2 MONTH AS TIMESTAMP) AS plus2m,
        |  isodow(o_orderdate) AS dow_iso,
        |  CAST(dayofyear(o_orderdate) AS BIGINT) AS doy,
        |  strftime(o_orderdate, '%Y-%m-%d %H:%M:%S') AS fmt,
        |  strftime(o_orderdate, '%d/%m/%Y') AS fmt2,
        |  CAST(epoch(o_orderdate) AS DOUBLE) AS unix_d
        |FROM orders WHERE o_orderkey < 2000
        |ORDER BY o_orderkey""".stripMargin) { (s, _) =>
      s.sql("""SELECT o_orderkey,
              |  date_diff('day', TIMESTAMP '1995-01-01', o_orderdate) AS dd,
              |  date_diff('month', TIMESTAMP '1995-01-01', o_orderdate) AS dm,
              |  date_add('day', 45, o_orderdate) AS plus45d,
              |  date_add('month', 2, o_orderdate) AS plus2m,
              |  day_of_week(o_orderdate) AS dow_iso,
              |  day_of_year(o_orderdate) AS doy,
              |  date_format(o_orderdate, '%Y-%m-%d %H:%i:%s') AS fmt,
              |  date_format(o_orderdate, '%d/%m/%Y') AS fmt2,
              |  to_unixtime(o_orderdate) AS unix_d
              |FROM orders WHERE o_orderkey < 2000
              |ORDER BY o_orderkey""".stripMargin)
    },

    // DST-boundary behavior of the at_timezone/with_timezone
    // approximation (SURVEY.md §1.2): wall-clock around the US 2026
    // spring-forward (Mar 8, 07:00 UTC) and fall-back (Nov 1, 06:00 UTC)
    // transitions, plus the nonexistent-local-time gap (both engines
    // shift 02:30 EST* forward across the gap). The AMBIGUOUS repeated
    // hour is deliberately NOT here: java.time resolves 01:30 to the
    // earlier offset (EDT), Postgres/DuckDB to the later (EST) — that
    // documented divergence is pinned in FnSpec instead.
    q("fn_tz_dst",
      """SELECT
        |  strftime(timezone('America/New_York', timezone('UTC', TIMESTAMP '2026-03-08 06:30:00')), '%Y-%m-%d %H:%M') AS before_spring,
        |  strftime(timezone('America/New_York', timezone('UTC', TIMESTAMP '2026-03-08 07:30:00')), '%Y-%m-%d %H:%M') AS after_spring,
        |  strftime(timezone('America/New_York', timezone('UTC', TIMESTAMP '2026-11-01 05:30:00')), '%Y-%m-%d %H:%M') AS before_fall,
        |  strftime(timezone('America/New_York', timezone('UTC', TIMESTAMP '2026-11-01 06:30:00')), '%Y-%m-%d %H:%M') AS after_fall,
        |  strftime(timezone('UTC', timezone('America/New_York', TIMESTAMP '2026-03-08 02:30:00')), '%Y-%m-%d %H:%M') AS gap_utc""".stripMargin) { (s, _) =>
      s.sql("""SELECT
              |  date_format(at_timezone(TIMESTAMP '2026-03-08 06:30:00', 'America/New_York'), 'yyyy-MM-dd HH:mm') AS before_spring,
              |  date_format(at_timezone(TIMESTAMP '2026-03-08 07:30:00', 'America/New_York'), 'yyyy-MM-dd HH:mm') AS after_spring,
              |  date_format(at_timezone(TIMESTAMP '2026-11-01 05:30:00', 'America/New_York'), 'yyyy-MM-dd HH:mm') AS before_fall,
              |  date_format(at_timezone(TIMESTAMP '2026-11-01 06:30:00', 'America/New_York'), 'yyyy-MM-dd HH:mm') AS after_fall,
              |  date_format(with_timezone(TIMESTAMP '2026-03-08 02:30:00', 'America/New_York'), 'yyyy-MM-dd HH:mm') AS gap_utc""".stripMargin)
    },

    // Joda-dialect format_datetime/parse_datetime (DateTimeFunctions
    // .java:68). The 'YYYY' column is the translation's acid test: Joda
    // 'Y' is year-of-era, java.time 'Y' is WEEK-based year — around ISO
    // year boundaries (e.g. 1996-12-30 is week 1 of 1997) an untranslated
    // pattern silently prints the wrong year; the fixture's 6.5-year
    // order range contains such dates.
    q("fn_joda_datetime",
      """SELECT o_orderkey,
        |  strftime(o_orderdate, '%Y-%m-%d') AS f_yoe,
        |  strftime(o_orderdate, '%Y/%m/%d %H:%M:%S') AS f_std,
        |  '+00:00' AS f_offs,
        |  '+0000' AS f_off,
        |  strftime(o_orderdate, '%a %d %b %Y') AS f_text,
        |  o_orderdate AS rt
        |FROM orders WHERE o_orderkey < 2000
        |ORDER BY o_orderkey""".stripMargin) { (s, _) =>
      s.sql("""SELECT o_orderkey,
              |  format_datetime(o_orderdate, 'YYYY-MM-dd') AS f_yoe,
              |  format_datetime(o_orderdate, 'yyyy/MM/dd HH:mm:ss') AS f_std,
              |  format_datetime(o_orderdate, 'ZZ') AS f_offs,
              |  format_datetime(o_orderdate, 'Z') AS f_off,
              |  format_datetime(o_orderdate, 'EEE dd MMM yyyy') AS f_text,
              |  parse_datetime(format_datetime(o_orderdate, 'yyyy-MM-dd HH:mm:ss'),
              |    'yyyy-MM-dd HH:mm:ss') AS rt
              |FROM orders WHERE o_orderkey < 2000
              |ORDER BY o_orderkey""".stripMargin)
    },

    // round-4 long-tail scalar batch: bitwise family, binary codecs,
    // combine_hash, ISO week-year, millisecond, duration/data-size
    // parsing, regexp_split (BitwiseFunctions.java,
    // VarbinaryFunctions.java, DateTimeFunctions.java,
    // DataSizeFunctions.java). Round 12 appends the digest KATs from
    // the reference's own TestVarbinaryFunctions.java:303-387 —
    // md5/sha1/xxhash64 as VARBINARY digests (the Spark builtins of
    // the same name emit hex text / a seed-42 BIGINT; the graft
    // registration shadows them), crc32, and the signed-32-bit fnv
    // family.
    q("fn_extra_scalars",
      """SELECT n_nationkey,
        |  CAST(n_nationkey & 12 AS BIGINT) AS band,
        |  CAST(n_nationkey | 5 AS BIGINT) AS bor,
        |  CAST(xor(n_nationkey, 9) AS BIGINT) AS bxor,
        |  CAST(~n_nationkey AS BIGINT) AS bnot,
        |  CAST(n_nationkey << 3 AS BIGINT) AS bshl,
        |  CAST((n_nationkey + 1024) >> 2 AS BIGINT) AS bshr,
        |  CAST(n_nationkey * 31 + n_regionkey AS BIGINT) AS ch,
        |  base64(encode(n_name)) AS b64,
        |  n_name AS b64rt,
        |  hex(encode(n_name)) AS hx,
        |  upper(sha256(n_name)) AS sh,
        |  CAST(1997 AS BIGINT) AS yow,
        |  CAST(123 AS BIGINT) AS ms,
        |  CAST(0 AS BIGINT) AS tzh,
        |  CAST(3500 AS BIGINT) AS dur_ms,
        |  CAST(2560 AS BIGINT) AS dsize,
        |  'a|b||c' AS rs,
        |  'D382E6CA' AS spooky32,
        |  '3768826AD382E6CA' AS spooky64,
        |  '533F6357E0210E67D91F651BC49E1278' AS md5k,
        |  'FB78992E561929A6967D5328F49413FA99048D06' AS sha1k,
        |  'EF46DB3751D8E999' AS xxh_e,
        |  'F9D96E0E1165E892' AS xxh_h,
        |  CAST(38028046 AS BIGINT) AS crc_a,
        |  CAST(1129618807 AS BIGINT) AS crc_b,
        |  CAST(1739062764 AS BIGINT) AS fnv1_32k,
        |  CAST(-1625136141 AS BIGINT) AS fnv1_32s,
        |  CAST(-343882906 AS BIGINT) AS fnv1a_32k,
        |  CAST(5360971952898613043 AS BIGINT) AS fnv1_64k,
        |  CAST(7542926890985303135 AS BIGINT) AS fnv1a_64k
        |FROM nation ORDER BY n_nationkey""".stripMargin) { (s, _) =>
      s.sql("""SELECT n_nationkey,
              |  bitwise_and(n_nationkey, 12) AS band,
              |  bitwise_or(n_nationkey, 5) AS bor,
              |  bitwise_xor(n_nationkey, 9) AS bxor,
              |  bitwise_not(n_nationkey) AS bnot,
              |  bitwise_shift_left(n_nationkey, 3) AS bshl,
              |  bitwise_logical_shift_right(n_nationkey + 1024, 2) AS bshr,
              |  combine_hash(n_nationkey, n_regionkey) AS ch,
              |  to_base64(to_utf8(n_name)) AS b64,
              |  from_utf8(from_base64(to_base64(to_utf8(n_name)))) AS b64rt,
              |  to_hex(to_utf8(n_name)) AS hx,
              |  to_hex(sha256(to_utf8(n_name))) AS sh,
              |  year_of_week(TIMESTAMP '1996-12-30') AS yow,
              |  millisecond(TIMESTAMP '2026-01-01 10:30:45.123') AS ms,
              |  timezone_hour(TIMESTAMP '2026-01-01 10:30:45') AS tzh,
              |  to_milliseconds(parse_duration('3.5s')) AS dur_ms,
              |  CAST(parse_presto_data_size('2.5kB') AS BIGINT) AS dsize,
              |  array_join(regexp_split('a,b,,c', ','), '|') AS rs,
              |  to_hex(spooky_hash_v2_32(to_utf8('hello'))) AS spooky32,
              |  to_hex(spooky_hash_v2_64(to_utf8('hello'))) AS spooky64,
              |  to_hex(md5(to_utf8('hashme'))) AS md5k,
              |  to_hex(sha1(to_utf8('hashme'))) AS sha1k,
              |  to_hex(xxhash64(to_utf8(''))) AS xxh_e,
              |  to_hex(xxhash64(to_utf8('hashme'))) AS xxh_h,
              |  crc32(to_utf8('CRC me!')) AS crc_a,
              |  crc32(to_utf8('ABCDEFGHIJK')) AS crc_b,
              |  fnv1_32(from_hex('F50919')) AS fnv1_32k,
              |  fnv1_32(from_hex('232706FC6BF50919')) AS fnv1_32s,
              |  fnv1a_32(from_hex('F50919')) AS fnv1a_32k,
              |  fnv1_64(from_hex('232706FC6BF50919')) AS fnv1_64k,
              |  fnv1a_64(from_hex('232706FC6BF50919')) AS fnv1a_64k
              |FROM nation ORDER BY n_nationkey""".stripMargin)
    },

    // Presto string + URL families over synthesized URLs
    // (StringFunctions.java:62, UrlFunctions.java:43)
    q("fn_presto_string_url",
      """WITH u AS (
        |  SELECT doc_id, source, lang,
        |    'https://data.example.com:8443/' || source || '/doc?id=' ||
        |      CAST(doc_id AS VARCHAR) || '&lang=' || lang || '#top' AS url
        |  FROM documents WHERE doc_id < 200)
        |SELECT doc_id,
        |  'https' AS proto, 'data.example.com' AS host, 8443 AS port,
        |  '/' || source || '/doc' AS path,
        |  'id=' || CAST(doc_id AS VARCHAR) || '&lang=' || lang AS query,
        |  'top' AS frag,
        |  lang AS param_lang,
        |  CAST(strpos(url, 'doc') AS BIGINT) AS pos,
        |  CAST(levenshtein(source, lang) AS BIGINT) AS lev,
        |  0 AS ham_same
        |FROM u ORDER BY doc_id""".stripMargin) { (s, _) =>
      s.sql("""WITH u AS (
              |  SELECT doc_id, source, lang,
              |    concat('https://data.example.com:8443/', source, '/doc?id=',
              |      CAST(doc_id AS STRING), '&lang=', lang, '#top') AS url
              |  FROM documents WHERE doc_id < 200)
              |SELECT doc_id,
              |  url_extract_protocol(url) AS proto,
              |  url_extract_host(url) AS host,
              |  CAST(url_extract_port(url) AS INT) AS port,
              |  url_extract_path(url) AS path,
              |  url_extract_query(url) AS query,
              |  url_extract_fragment(url) AS frag,
              |  url_extract_parameter(url, 'lang') AS param_lang,
              |  strpos(url, 'doc') AS pos,
              |  levenshtein_distance(source, lang) AS lev,
              |  CAST(hamming_distance(source, source) AS INT) AS ham_same
              |FROM u ORDER BY doc_id""".stripMargin)
    },

    // Presto math dialect: base conversion, truncate, finiteness, wilson
    q("fn_presto_math",
      """SELECT l_orderkey,
        |  lower(format('{:x}', l_orderkey)) AS hex,
        |  l_orderkey AS roundtrip,
        |  trunc(l_extendedprice / 100.0) AS trunc_price,
        |  isfinite(l_extendedprice) AS fin,
        |  true AS inf_detected,
        |  round((0.6 + 1.96*1.96/200 - 1.96*sqrt(0.6*0.4/100 + 1.96*1.96/(4*100*100)))
        |        / (1 + 1.96*1.96/100), 6) AS wilson_lo
        |FROM lineitem WHERE l_orderkey < 100 AND l_linenumber = 1
        |ORDER BY l_orderkey""".stripMargin) { (s, _) =>
      s.sql("""SELECT l_orderkey,
              |  to_base(l_orderkey, 16) AS hex,
              |  from_base(to_base(l_orderkey, 16), 16) AS roundtrip,
              |  truncate(l_extendedprice / 100.0) AS trunc_price,
              |  is_finite(l_extendedprice) AS fin,
              |  is_infinite(infinity()) AND is_nan(nan()) AND NOT is_finite(infinity()) AS inf_detected,
              |  round(wilson_interval_lower(60, 100, 1.96), 6) AS wilson_lo
              |FROM lineitem WHERE l_orderkey < 100 AND l_linenumber = 1
              |ORDER BY l_orderkey""".stripMargin)
    },

    // aggregate veneers: geometric_mean, entropy, arbitrary
    q("fn_entropy_gmean",
      """WITH c AS (SELECT o_custkey, count(*) AS n FROM orders GROUP BY o_custkey)
        |SELECT round(exp(avg(ln(n))), 6) AS gmean,
        |  round(log2(sum(n)) - sum(n * ln(n)) / (sum(n) * ln(2)), 6) AS ent,
        |  count(*) AS n_groups
        |FROM c""".stripMargin) { (s, _) =>
      s.sql("""WITH c AS (SELECT o_custkey, count(*) AS n FROM orders GROUP BY o_custkey)
              |SELECT round(geometric_mean(n), 6) AS gmean,
              |  round(entropy(n), 6) AS ent,
              |  count(*) AS n_groups
              |FROM c""".stripMargin)
    },

    // qdigest quantile sketch: per-group sketches, partial merge, decode
    // at several quantiles — estimates must sit within the ε=0.01 rank
    // bound of the exact quantiles (emitted as booleans for the oracle)
    q("fn_qdigest",
      """SELECT l_returnflag AS grp, true AS p50_ok, true AS p90_ok, true AS merged_ok
        |FROM lineitem GROUP BY l_returnflag ORDER BY grp""".stripMargin) { (s, _) =>
      s.sql("""WITH g AS (
              |  SELECT l_returnflag, qdigest_agg(l_extendedprice) AS qd
              |  FROM lineitem GROUP BY l_returnflag),
              |ex AS (
              |  SELECT l_returnflag,
              |    percentile(l_extendedprice, 0.49) AS p50_lo, percentile(l_extendedprice, 0.51) AS p50_hi,
              |    percentile(l_extendedprice, 0.89) AS p90_lo, percentile(l_extendedprice, 0.91) AS p90_hi
              |  FROM lineitem GROUP BY l_returnflag),
              |m AS (
              |  SELECT value_at_quantile(merge_qdigest(qd), 0.5D) AS p50_all FROM g),
              |exm AS (
              |  SELECT percentile(l_extendedprice, 0.49) AS lo, percentile(l_extendedprice, 0.51) AS hi
              |  FROM lineitem)
              |SELECT g.l_returnflag AS grp,
              |  value_at_quantile(qd, 0.5D) BETWEEN ex.p50_lo AND ex.p50_hi AS p50_ok,
              |  value_at_quantile(qd, 0.9D) BETWEEN ex.p90_lo AND ex.p90_hi AS p90_ok,
              |  (SELECT p50_all FROM m) BETWEEN (SELECT lo FROM exm) AND (SELECT hi FROM exm) AS merged_ok
              |FROM g JOIN ex ON g.l_returnflag = ex.l_returnflag
              |ORDER BY grp""".stripMargin)
    },

    // t-digest quantile sketch (TDigestAggregationFunction.java:29) —
    // real centroid digest: mid-quantiles within a ±0.01 rank band and
    // the MERGED p99.9 inside a tight tail band (the tail accuracy the
    // GK summary can't promise)
    q("fn_tdigest",
      """SELECT l_returnflag AS grp, true AS p50_ok, true AS p99_ok, true AS merged_tail_ok
        |FROM lineitem GROUP BY l_returnflag ORDER BY grp""".stripMargin) { (s, _) =>
      s.sql("""WITH g AS (
              |  SELECT l_returnflag, tdigest_agg(l_extendedprice) AS td
              |  FROM lineitem GROUP BY l_returnflag),
              |ex AS (
              |  SELECT l_returnflag,
              |    percentile(l_extendedprice, 0.49) AS p50_lo, percentile(l_extendedprice, 0.51) AS p50_hi,
              |    percentile(l_extendedprice, 0.985) AS p99_lo, percentile(l_extendedprice, 0.995) AS p99_hi
              |  FROM lineitem GROUP BY l_returnflag),
              |m AS (SELECT value_at_quantile(merge_tdigest(td), 0.999D) AS p999 FROM g),
              |exm AS (SELECT percentile(l_extendedprice, 0.998) AS lo, max(l_extendedprice) AS hi
              |        FROM lineitem)
              |SELECT g.l_returnflag AS grp,
              |  value_at_quantile(td, 0.5D) BETWEEN ex.p50_lo AND ex.p50_hi AS p50_ok,
              |  value_at_quantile(td, 0.99D) BETWEEN ex.p99_lo AND ex.p99_hi AS p99_ok,
              |  (SELECT p999 FROM m) BETWEEN (SELECT lo FROM exm) AND (SELECT hi FROM exm) AS merged_tail_ok
              |FROM g JOIN ex ON g.l_returnflag = ex.l_returnflag
              |ORDER BY grp""".stripMargin)
    },

    // setdigest family (type/setdigest/SetDigestFunctions.java): exact
    // intersection/jaccard while under the 8192-hash cap, HLL-backed
    // cardinality — compared against exactly-computed set overlaps
    // elements taken mod 5000 so the distinct count stays under the
    // digest's 8192-hash cap at ANY scale factor — the exact-intersection
    // pin must not silently flip to approximate mode at bigger SFs
    // (approximate behavior is spec-covered in FnSpec instead)
    q("fn_set_digest",
      """WITH sets AS (
        |  SELECT l_partkey % 5000 AS k,
        |    max(CASE WHEN l_orderkey % 4 = 0 THEN 1 ELSE 0 END) AS in_a,
        |    max(CASE WHEN l_orderkey % 2 = 0 THEN 1 ELSE 0 END) AS in_b
        |  FROM lineitem GROUP BY 1)
        |SELECT CAST(sum(in_a * in_b) AS BIGINT) AS inter_exact,
        |  true AS jaccard_ok, true AS card_ok
        |FROM sets""".stripMargin) { (s, _) =>
      s.sql("""WITH d AS (
              |  SELECT make_set_digest(CASE WHEN l_orderkey % 4 = 0 THEN l_partkey % 5000 END) AS da,
              |         make_set_digest(CASE WHEN l_orderkey % 2 = 0 THEN l_partkey % 5000 END) AS db
              |  FROM lineitem),
              |sets AS (
              |  SELECT l_partkey % 5000 AS k,
              |    max(CASE WHEN l_orderkey % 4 = 0 THEN 1 ELSE 0 END) AS in_a,
              |    max(CASE WHEN l_orderkey % 2 = 0 THEN 1 ELSE 0 END) AS in_b
              |  FROM lineitem GROUP BY 1),
              |ex AS (SELECT sum(in_a * in_b) AS inter, sum(greatest(in_a, in_b)) AS uni,
              |              sum(in_a) AS na FROM sets)
              |SELECT intersection_cardinality(da, db) AS inter_exact,
              |  abs(jaccard_index(da, db) - CAST(ex.inter AS DOUBLE) / ex.uni) < 0.05 AS jaccard_ok,
              |  abs(cardinality(da) - ex.na) <= CAST(0.05 * ex.na AS BIGINT) AS card_ok
              |FROM d CROSS JOIN ex""".stripMargin)
    },

    // khyperloglog (type/khyperloglog/KHyperLogLog.java): per-key
    // value-cardinality sketch. Key count is EXACT under the 4096 cap
    // (keys mod 3000 keep it exact at any SF); the distribution /
    // reidentification numbers ride HLL estimates, so those pins are
    // property bounds vs the exactly-computed truth
    q("fn_khll",
      """SELECT CAST(count(*) AS BIGINT) AS nkeys_exact,
        |  true AS nkeys_ok, true AS reid_ok, true AS mass_ok, true AS mean_ok
        |FROM (SELECT l_partkey % 3000 AS g FROM lineitem GROUP BY 1)""".stripMargin) { (s, _) =>
      s.sql("""WITH k AS (SELECT khyperloglog_agg(l_partkey % 3000, l_suppkey) AS kh FROM lineitem),
              |ex AS (SELECT count(*) AS nkeys, avg(nv) AS mean_nv,
              |         avg(CASE WHEN nv <= 2 THEN 1.0D ELSE 0.0D END) AS frac_low
              |       FROM (SELECT l_partkey % 3000 AS g, count(DISTINCT l_suppkey) AS nv
              |             FROM lineitem GROUP BY 1)),
              |d AS (SELECT map_entries(uniqueness_distribution(kh)) AS es, kh FROM k)
              |SELECT (SELECT nkeys FROM ex) AS nkeys_exact,
              |  cardinality(kh) = (SELECT nkeys FROM ex) AS nkeys_ok,
              |  abs(reidentification_potential(kh, 2) - (SELECT frac_low FROM ex)) < 0.05 AS reid_ok,
              |  abs(aggregate(es, 0.0D, (a, e) -> a + e.value) - 1.0) < 1e-6 AS mass_ok,
              |  abs(aggregate(es, 0.0D, (a, e) -> a + e.key * e.value) - (SELECT mean_nv FROM ex))
              |    / (SELECT mean_nv FROM ex) < 0.05 AS mean_ok
              |FROM d""".stripMargin)
    },

    // multimap_agg: all values per key as map<k, array<v>>
    q("fn_multimap",
      """WITH m AS (
        |  SELECT n_regionkey, list_sort(list(n_name)) AS names
        |  FROM nation GROUP BY n_regionkey)
        |SELECT n_regionkey, array_to_string(names, ',') AS names
        |FROM m ORDER BY n_regionkey""".stripMargin) { (s, _) =>
      s.sql("""WITH m AS (SELECT multimap_agg(n_regionkey, n_name) AS mm FROM nation)
              |SELECT e.key AS n_regionkey,
              |  array_join(array_sort(e.value), ',') AS names
              |FROM m LATERAL VIEW explode(map_entries(mm)) AS e
              |ORDER BY n_regionkey""".stripMargin)
    },

    // JSON extras: json_size / json_array_contains / json_array_get over
    // synthesized nested JSON (the events.props fixture is flat)
    q("fn_json_extras",
      """WITH j AS (
        |  SELECT n_nationkey,
        |    '{"a": {"x": 1, "y": 2}, "arr": [' || CAST(n_nationkey AS VARCHAR) || ', 7, 9]}' AS doc
        |  FROM nation)
        |SELECT n_nationkey,
        |  2 AS size_a, 3 AS size_arr, 0 AS size_scalar,
        |  true AS has7,
        |  CAST(n_nationkey AS VARCHAR) AS first_elem,
        |  '9' AS last_elem
        |FROM j ORDER BY n_nationkey""".stripMargin) { (s, _) =>
      s.sql("""WITH j AS (
              |  SELECT n_nationkey,
              |    concat('{"a": {"x": 1, "y": 2}, "arr": [', CAST(n_nationkey AS STRING), ', 7, 9]}') AS doc
              |  FROM nation)
              |SELECT n_nationkey,
              |  CAST(json_size(doc, '$.a') AS INT) AS size_a,
              |  CAST(json_size(doc, '$.arr') AS INT) AS size_arr,
              |  CAST(json_size(doc, '$.a.x') AS INT) AS size_scalar,
              |  json_array_contains(get_json_object(doc, '$.arr'), 7) AS has7,
              |  json_array_get(get_json_object(doc, '$.arr'), 0) AS first_elem,
              |  json_array_get(get_json_object(doc, '$.arr'), -1) AS last_elem
              |FROM j ORDER BY n_nationkey""".stripMargin)
    },

    // ngrams + combinations over tokenized documents
    q("fn_ngrams",
      """WITH t AS (
        |  SELECT doc_id,
        |    list_filter(string_split_regex(regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'), ' +'), x -> x <> '') AS toks
        |  FROM documents WHERE doc_id < 100)
        |SELECT doc_id,
        |  greatest(len(toks) - 1, 0) AS n_bigrams,
        |  greatest(len(toks) - 2, 0) AS n_trigrams,
        |  CAST(least(len(toks), 10) * (least(len(toks), 10) - 1) / 2 AS INT) AS n_pairs
        |FROM t ORDER BY doc_id""".stripMargin) { (s, _) =>
      s.sql("""WITH t AS (
              |  SELECT doc_id,
              |    filter(split(regexp_replace(lower(text), '[^a-z0-9 ]', ' '), ' +'), x -> x <> '') AS toks
              |  FROM documents WHERE doc_id < 100)
              |SELECT doc_id,
              |  size(filter(ngrams(toks, 2), g -> size(g) = 2)) AS n_bigrams,
              |  size(filter(ngrams(toks, 3), g -> size(g) = 3)) AS n_trigrams,
              |  size(combinations(slice(toks, 1, least(size(toks), 10)), 2)) AS n_pairs
              |FROM t ORDER BY doc_id""".stripMargin)
    },

    // array_agg keeps NULLs (ArrayAggregationFunction.java:50 — Spark's
    // collect_list drops them; the engine's array_agg must not)
    q("fn_array_agg_nulls",
      """WITH v AS (SELECT * FROM (VALUES (1, 10), (2, NULL), (3, 30), (4, NULL)) t(i, x))
        |SELECT array_to_string(list_transform(list(x ORDER BY i),
        |  e -> coalesce(CAST(e AS VARCHAR), 'NULL')), ',') AS vals,
        |  4 AS n_kept
        |FROM v""".stripMargin) { (s, _) =>
      s.sql("""WITH v AS (SELECT * FROM VALUES (1, 10), (2, NULL), (3, 30), (4, NULL) t(i, x)),
              |a AS (SELECT array_agg(x) AS xs FROM (SELECT * FROM v ORDER BY i))
              |SELECT array_join(transform(xs, e -> CAST(e AS STRING)), ',', 'NULL') AS vals,
              |  size(xs) AS n_kept
              |FROM a""".stripMargin)
    },

    // NaN semantics (SURVEY §7.3): NaN groups as itself, sorts largest —
    // Presto and Spark agree; pinned against the oracle
    q("fn_nan_semantics",
      """WITH v AS (SELECT CAST(x AS DOUBLE) AS x
        |           FROM (VALUES ('1.5'), ('NaN'), ('2.5'), ('NaN'), ('0.5')) t(x))
        |SELECT CAST(count(DISTINCT x) AS BIGINT) AS n_distinct,
        |  isnan(max(x)) AS max_is_nan,
        |  array_to_string(list_transform(list_sort(list(x)),
        |    e -> CAST(round(e, 1) AS VARCHAR)), ',') AS sorted_vals
        |FROM v""".stripMargin) { (s, _) =>
      s.sql("""WITH v AS (SELECT CAST(x AS DOUBLE) AS x
              |          FROM VALUES ('1.5'), ('NaN'), ('2.5'), ('NaN'), ('0.5') t(x))
              |SELECT count(DISTINCT x) AS n_distinct,
              |  isnan(max(x)) AS max_is_nan,
              |  array_join(transform(array_sort(collect_list(x)),
              |    e -> lower(CAST(round(e, 1) AS STRING))), ',') AS sorted_vals
              |FROM v""".stripMargin)
    },

    // CHAR(n) blank-padding (CharType.java — DuckDB CHAR doesn't pad, so
    // the oracle spells the padding out)
    q("fn_char_padding",
      """SELECT n_nationkey,
        |  rpad(substr(n_name, 1, 3), 8, ' ') AS padded,
        |  8 AS padded_len,
        |  true AS trailing_spaces
        |FROM nation ORDER BY n_nationkey""".stripMargin) { (s, _) =>
      s.sql("""SELECT n_nationkey,
              |  CAST(substr(n_name, 1, 3) AS CHAR(8)) AS padded,
              |  length(CAST(substr(n_name, 1, 3) AS CHAR(8))) AS padded_len,
              |  endswith(CAST(substr(n_name, 1, 3) AS CHAR(8)), ' ') AS trailing_spaces
              |FROM nation ORDER BY n_nationkey""".stripMargin)
    },

    // numeric_histogram (streaming approximate): structure + mass + mean
    // preserved within algorithmic error (properties, like the reference
    // tests it — exact bins are not part of the contract)
    q("fn_numeric_histogram",
      """SELECT true AS nbuckets_ok, true AS count_ok, true AS mean_ok""") { (s, _) =>
      s.sql("""WITH h AS (
              |  SELECT numeric_histogram(10, l_extendedprice) AS m,
              |         count(*) AS n, avg(l_extendedprice) AS mu
              |  FROM lineitem)
              |SELECT cardinality(m) = 10 AS nbuckets_ok,
              |  abs(aggregate(map_values(m), 0.0D, (a, x) -> a + x) - n) < 0.5 AS count_ok,
              |  abs(aggregate(map_entries(m), 0.0D, (a, e) -> a + e.key * e.value) / n - mu) / mu < 0.05 AS mean_ok
              |FROM h""".stripMargin)
    },

    // reduce_agg: lambda-fold aggregate over exact integer state
    q("fn_reduce_agg",
      """SELECT l_returnflag,
        |  CAST(sum(CAST(l_quantity AS BIGINT) * CAST(l_quantity AS BIGINT)) AS BIGINT) AS sumsq,
        |  max(l_partkey) AS maxpart
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin) { (s, _) =>
      s.sql("""SELECT l_returnflag,
              |  reduce_agg(CAST(l_quantity AS BIGINT), 0L,
              |    (s, x) -> s + x * x, (a, b) -> a + b) AS sumsq,
              |  reduce_agg(l_partkey, CAST(NULL AS BIGINT),
              |    (s, x) -> CASE WHEN s IS NULL OR x > s THEN x ELSE s END,
              |    (a, b) -> CASE WHEN a IS NULL THEN b WHEN b IS NULL THEN a WHEN b > a THEN b ELSE a END) AS maxpart
              |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)
    },

    // TRY(expr) — NULL instead of error for div-by-zero, bad casts and
    // overflow (TryFunction.java; registered
    // BuiltInFunctionNamespaceManager.java:624). All three error classes
    // throw under the session's ANSI mode, so each NULL here proves the
    // wrapper caught a real runtime error.
    q("fn_try",
      """SELECT n_nationkey,
        |  CASE WHEN n_nationkey = 3 THEN NULL
        |       ELSE round(100.0 / (n_nationkey - 3), 2) END AS div_or_null,
        |  CASE WHEN n_nationkey = 5 THEN NULL
        |       ELSE n_nationkey END AS cast_or_null,
        |  CASE WHEN n_nationkey >= 10 THEN NULL
        |       ELSE CAST(power(10, n_nationkey) AS INTEGER) END AS pow_or_null,
        |  CASE WHEN n_nationkey >= 11 THEN NULL
        |       ELSE n_nationkey * 200000000 END AS mul_or_null
        |FROM nation ORDER BY n_nationkey""".stripMargin) { (s, _) =>
      s.sql("""SELECT n_nationkey,
              |  round(CAST(TRY(CAST(100 AS DECIMAL(10,2)) / (n_nationkey - 3)) AS DOUBLE), 2) AS div_or_null,
              |  TRY(CAST(CASE WHEN n_nationkey = 5 THEN 'oops'
              |                ELSE CAST(n_nationkey AS VARCHAR) END AS BIGINT)) AS cast_or_null,
              |  TRY(CAST(power(10, n_nationkey) AS INTEGER)) AS pow_or_null,
              |  TRY(CAST(n_nationkey AS INTEGER) * 200000000) AS mul_or_null
              |FROM nation ORDER BY n_nationkey""".stripMargin)
    },

    // at_timezone / with_timezone under the engine's documented
    // TIMESTAMP-WITH-TIME-ZONE approximation (instants = UTC timestamps;
    // DateTimeFunctions.java, DateTimeEncoding.java). The oracle
    // reproduces the instant→wall-clock rendering with DuckDB's timezone()
    q("fn_at_timezone",
      """SELECT o_orderkey,
        |  CAST(timezone('Asia/Tokyo', timezone('UTC', CAST(o_orderdate AS TIMESTAMP))) AS VARCHAR) AS tokyo_wall,
        |  CAST(timezone('America/Los_Angeles', timezone('UTC', CAST(o_orderdate AS TIMESTAMP))) AS VARCHAR) AS la_wall,
        |  true AS roundtrip_ok
        |FROM orders WHERE o_orderkey < 500 ORDER BY o_orderkey""".stripMargin) { (s, _) =>
      s.sql("""SELECT o_orderkey,
              |  CAST(at_timezone(CAST(o_orderdate AS TIMESTAMP), 'Asia/Tokyo') AS STRING) AS tokyo_wall,
              |  CAST(at_timezone(CAST(o_orderdate AS TIMESTAMP), 'America/Los_Angeles') AS STRING) AS la_wall,
              |  with_timezone(at_timezone(CAST(o_orderdate AS TIMESTAMP), 'Asia/Tokyo'), 'Asia/Tokyo')
              |    = CAST(o_orderdate AS TIMESTAMP) AS roundtrip_ok
              |FROM orders WHERE o_orderkey < 500 ORDER BY o_orderkey""".stripMargin)
    },

    // width_bucket both forms (MathFunctions.java:65) + sparse-map
    // cosine_similarity. Equi-width bounds are powers of two so the
    // bucket arithmetic is FP-exact on both engines.
    q("fn_width_bucket",
      """SELECT l_orderkey, l_linenumber,
        |  CAST(CASE WHEN l_extendedprice < 0 THEN 0
        |            WHEN l_extendedprice >= 131072 THEN 17
        |            ELSE FLOOR(l_extendedprice / 8192.0) + 1 END AS BIGINT) AS wb,
        |  CAST((l_extendedprice >= 10000)::INT + (l_extendedprice >= 30000)::INT
        |     + (l_extendedprice >= 60000)::INT AS BIGINT) AS wb_arr,
        |  round((l_quantity * 1.0 + l_discount * 2.0)
        |        / (sqrt(l_quantity * l_quantity + l_discount * l_discount) * sqrt(5.0)), 6) AS cos_sim
        |FROM lineitem WHERE l_orderkey < 500
        |ORDER BY l_orderkey, l_linenumber""".stripMargin) { (s, _) =>
      s.sql("""SELECT l_orderkey, l_linenumber,
              |  width_bucket(l_extendedprice, 0.0D, 131072.0D, 16) AS wb,
              |  width_bucket(l_extendedprice, array(10000.0D, 30000.0D, 60000.0D)) AS wb_arr,
              |  round(cosine_similarity(
              |    map('a', CAST(l_quantity AS DOUBLE), 'b', CAST(l_discount AS DOUBLE)),
              |    map('a', 1.0D, 'b', 2.0D)), 6) AS cos_sim
              |FROM lineitem WHERE l_orderkey < 500
              |ORDER BY l_orderkey, l_linenumber""".stripMargin)
    },

    // url_encode/url_decode (UrlFunctions.java:155) + HMAC family
    // (HmacFunctions.java, pinned to RFC 2202/4231 test vectors) +
    // big-endian codecs (VarbinaryFunctions.java:38)
    q("fn_url_hmac_endian",
      """SELECT s, enc, s AS roundtrip, mac256, mac_md5, mac_sha1, be64, be64_rt, be32, be32_rt
        |FROM (VALUES
        |  ('hello world', 'hello+world'),
        |  ('a+b&c=d', 'a%2Bb%26c%3Dd'),
        |  ('100%', '100%25')) t(s, enc)
        |CROSS JOIN (SELECT
        |  '5bdcc146bf60754e6a042426089575c75a003f089d2739839dec58b964ec3843' AS mac256,
        |  '750c783e6ab0b503eaa86e310a5db738' AS mac_md5,
        |  'effcdf6ae5eb2fa2d27416d5f184df9c259a7c79' AS mac_sha1,
        |  '0000000000001234' AS be64,
        |  CAST(-9876543210 AS BIGINT) AS be64_rt,
        |  '12345678' AS be32,
        |  CAST(-42 AS BIGINT) AS be32_rt) c
        |ORDER BY s""".stripMargin) { (s, _) =>
      s.sql("""SELECT s,
              |  url_encode(s) AS enc,
              |  url_decode(url_encode(s)) AS roundtrip,
              |  lower(hex(hmac_sha256(to_utf8('what do ya want for nothing?'), to_utf8('Jefe')))) AS mac256,
              |  lower(hex(hmac_md5(to_utf8('what do ya want for nothing?'), to_utf8('Jefe')))) AS mac_md5,
              |  lower(hex(hmac_sha1(to_utf8('what do ya want for nothing?'), to_utf8('Jefe')))) AS mac_sha1,
              |  lower(hex(to_big_endian_64(4660))) AS be64,
              |  from_big_endian_64(to_big_endian_64(-9876543210)) AS be64_rt,
              |  lower(hex(to_big_endian_32(305419896))) AS be32,
              |  CAST(from_big_endian_32(to_big_endian_32(-42)) AS BIGINT) AS be32_rt
              |FROM VALUES ('hello world'), ('a+b&c=d'), ('100%') t(s)
              |ORDER BY s""".stripMargin)
    },

    // json_parse / json_format / CAST(… AS JSON) / JSON→complex casts
    // (JsonFunctions.java:64, JsonOperators.java, JsonToArrayCast.java) +
    // the json_extract_scalar container→NULL contract
    q("fn_json_roundtrip",
      """WITH j AS (SELECT n_nationkey AS k,
        |    '{"a": ' || CAST(n_nationkey AS VARCHAR) || ', "xs": [1, 2, 3], "s": "hi", "b": "[tag]", "c": "{y}"}' AS doc,
        |    '[1, 2, ' || CAST(n_nationkey AS VARCHAR) || ']' AS arrtxt
        |  FROM nation)
        |SELECT k,
        |  -- json_parse canonicalizes with SORTED object keys (the
        |  -- reference's SORTED_MAPPER, JsonFunctions.java:72/147)
        |  '{"a":' || CAST(k AS VARCHAR) || ',"b":"[tag]","c":"{y}","s":"hi","xs":[1,2,3]}' AS canon,
        |  '1,2,' || CAST(k AS VARCHAR) AS arr_joined,
        |  CAST(k AS BIGINT) AS third,
        |  '"q\"x"' AS quoted,
        |  CAST(k AS VARCHAR) AS numj,
        |  '[1,2]' AS arrj,
        |  CAST(k AS VARCHAR) AS scalar_a,
        |  CAST(NULL AS VARCHAR) AS scalar_container,
        |  '[tag]' AS bracket_str,
        |  '{y}' AS brace_str
        |FROM j ORDER BY k""".stripMargin) { (s, _) =>
      s.sql("""WITH j AS (SELECT n_nationkey AS k,
              |    concat('{"a": ', CAST(n_nationkey AS STRING), ', "xs": [1, 2, 3], "s": "hi", "b": "[tag]", "c": "{y}"}') AS doc,
              |    concat('[1, 2, ', CAST(n_nationkey AS STRING), ']') AS arrtxt
              |  FROM nation)
              |SELECT k,
              |  json_format(json_parse(doc)) AS canon,
              |  array_join(transform(CAST(json_parse(arrtxt) AS ARRAY(INTEGER)),
              |    e -> CAST(e AS STRING)), ',') AS arr_joined,
              |  element_at(CAST(json_parse(arrtxt) AS ARRAY(BIGINT)), 3) AS third,
              |  CAST('q"x' AS JSON) AS quoted,
              |  CAST(k AS JSON) AS numj,
              |  CAST(ARRAY[1, 2] AS JSON) AS arrj,
              |  json_extract_scalar(doc, '$.a') AS scalar_a,
              |  json_extract_scalar(doc, '$.xs') AS scalar_container,
              |  json_extract_scalar(doc, '$.b') AS bracket_str,
              |  json_extract_scalar(doc, '$.c') AS brace_str
              |FROM j ORDER BY k""".stripMargin)
    },

    // Presto array spellings: zip (positional struct-zip, null-padded),
    // repeat (array fill — Presto's name wins over Spark's string
    // repeat), type-dispatched contains, 1-based array_position
    q("fn_presto_array",
      """SELECT n_nationkey,
        |  true AS has2,
        |  contains(n_name, 'AN') AS str_has,
        |  CAST(3 AS BIGINT) AS pos3,
        |  3 AS rep_n,
        |  n_nationkey AS rep_elem,
        |  3 AS zip_len,
        |  true AS pad_ok
        |FROM nation ORDER BY n_nationkey""".stripMargin) { (s, _) =>
      s.sql("""SELECT n_nationkey,
              |  contains(ARRAY[1, 2, n_nationkey], 2) AS has2,
              |  contains(n_name, 'AN') AS str_has,
              |  array_position(ARRAY[10, 20, 30], 30) AS pos3,
              |  cardinality(repeat(n_name, 3)) AS rep_n,
              |  element_at(repeat(n_nationkey, 4), 2) AS rep_elem,
              |  cardinality(zip(ARRAY[1, 2, 3], ARRAY['a', 'b'])) AS zip_len,
              |  element_at(zip(ARRAY[1, 2, 3], ARRAY['a', 'b']), 3).`1` IS NULL AS pad_ok
              |FROM nation ORDER BY n_nationkey""".stripMargin)
    },

    // arbitrary() on a column constant within its group → deterministic
    q("fn_arbitrary",
      """SELECT o_orderkey, min(o_custkey) AS cust
        |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        |WHERE o_orderkey < 1000
        |GROUP BY o_orderkey ORDER BY o_orderkey""".stripMargin) { (s, _) =>
      s.sql("""SELECT o_orderkey, arbitrary(o_custkey) AS cust
              |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
              |WHERE o_orderkey < 1000
              |GROUP BY o_orderkey ORDER BY o_orderkey""".stripMargin)
    },
  )
}
