package graft.functions

import org.apache.spark.sql.catalyst.{FunctionIdentifier, TableIdentifier}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.parser.ParserInterface
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.types.{DataType, StructType}

/** Light Presto→Spark SQL dialect rewriter (SURVEY.md §7.3 "dialect
  * veneer": translate the surface, do NOT port the ANTLR grammar).
  * Wraps the session's parser and rewrites constructs Spark's grammar
  * rejects:
  *
  *  - `date_add('day', n, ts)` / `date_diff('day', a, b)` — Presto passes
  *    the unit as a string literal; Spark's grammar special-cases these
  *    names and demands an unquoted unit. Rewritten to
  *    `timestampadd(day, ...)` / `timestampdiff(day, ...)`, which have
  *    identical semantics (to − from; unit arithmetic).
  *  - `ARRAY[1, 2, 3]` literal syntax → `array(1, 2, 3)` (innermost-first,
  *    so nesting works).
  *  - `CAST(x AS JSON)` → `cast_to_json(x)` (JsonOperators.java semantics
  *    in the CastToJson expression), and `CAST(j AS ARRAY(…)/MAP(…)/
  *    ROW(…))` — the JSON-to-complex casts, JsonToArrayCast.java et al. —
  *    → `from_json(j, '<spark ddl>')` with Presto type spellings
  *    (VARCHAR, ROW(a T), ARRAY(T)) translated to Spark DDL. In valid
  *    Presto only JSON casts to complex types, so routing every
  *    string-source complex cast through from_json is semantics-safe.
  *  - `CROSS JOIN UNNEST(args) AS t(cols)` (grammar SqlBase.g4:304,
  *    UnnestOperator.java:48) → `LATERAL VIEW explode(arg) t AS cols`
  *    (single arg: array element or map key/value) or
  *    `LATERAL VIEW inline(arrays_zip(args)) t AS cols` (multi-arg zip,
  *    null-padded to the longest input like the reference). Argument
  *    expressions containing parentheses and WITH ORDINALITY are out of
  *    scope for the textual form (use posexplode directly).
  *
  * Textual rewriting is deliberately conservative: patterns are anchored
  * to the exact call shapes above. A string literal that *contains* one of
  * these shapes would be corrupted — accepted and documented (the
  * reference's own benchto SQL corpus never does that).
  */
class GraftSqlParser(delegate: ParserInterface) extends ParserInterface {

  import GraftSqlParser._

  /** Prepared statements (grammar SqlBase.g4:96-104 PREPARE/EXECUTE/
    * DEALLOCATE). The map lives on the parser INSTANCE — Spark builds one
    * parser per session, so statements are session-scoped like the
    * reference's Session.preparedStatements.
    */
  private val prepared = new java.util.concurrent.ConcurrentHashMap[String, String]()

  override def parsePlan(sqlText: String): LogicalPlan = sqlText match {
    // prepared-statement metadata (DescribeOutputRewrite.java /
    // DescribeInputRewrite.java) — commands, because OUTPUT needs the
    // ANALYZED schema of the stored body, which only exists at run time
    case DescribeOutputStmt(name) =>
      val body = prepared.get(name.toLowerCase)
      require(body != null, s"DESCRIBE OUTPUT: prepared statement '$name' not found")
      // RAW body: the command re-parses through spark.sql → this parser,
      // so the rewrite applies there exactly once (backslash doubling is
      // not idempotent)
      graft.plans.DescribeOutputCommand(bindAllNull(body))
    case DescribeInputStmt(name) =>
      val body = prepared.get(name.toLowerCase)
      require(body != null, s"DESCRIBE INPUT: prepared statement '$name' not found")
      graft.plans.DescribeInputCommand(parameterCount(body))
    case _ => parsePlanRest(sqlText)
  }

  /** Opt-in Presto operator semantics applied on the PARSED plan, so the
    * rewrite sees structure (not text) and never touches DataFrame-API
    * plans. ONE flag selects ONE coherent dialect (round 13, was
    * previously mixed): `spark.graft.prestoOperators` turns on BOTH the
    * operator semantics (integer `/` truncation, 1-based subscripts —
    * PrestoOperators) and the call conventions where the two engines
    * share a NAME but disagree on meaning (log/trim argument order,
    * element_at bounds, regexp_extract group-0 + NULL contracts,
    * kurtosis definition — PrestoCallConventions). With the flag off,
    * SQL is pure Spark SQL, semantics untouched.
    */
  private def dialectPlan(plan: LogicalPlan): LogicalPlan = {
    val p1 =
      if (PrestoOperators.enabled) PrestoOperators(PrestoCallConventions(plan))
      else plan
    if (ZonedTimestamps.enabled) ZonedTimestamps(p1) else p1
  }

  private def parsePlanRest(sqlText: String): LogicalPlan =
    sessionStatement(sqlText, prepared) match {
      case Some(replacement) => dialectPlan(delegate.parsePlan(replacement))
      case None =>
        // EXPLAIN ANALYZE executes the statement and reports per-operator
        // runtime stats (ExplainAnalyzeOperator.java:34) — a command, not
        // a textual rewrite, because metrics only exist after execution
        ExplainAnalyze.findFirstMatchIn(sqlText) match {
          case Some(m) =>
            // RAW text: executes via spark.sql → this parser → one rewrite
            graft.plans.ExplainAnalyzeCommand(sqlText.substring(m.end))
          case None => dialectPlan(delegate.parsePlan(rewrite(sqlText)))
        }
    }
  override def parseQuery(sqlText: String): LogicalPlan =
    dialectPlan(delegate.parseQuery(rewrite(sqlText)))
  override def parseExpression(sqlText: String): Expression = {
    val e0 = delegate.parseExpression(rewrite(sqlText))
    val e1 =
      if (PrestoOperators.enabled)
        e0.transformDown(PrestoCallConventions.exprRewrite)
          .transformDown(PrestoOperators.exprRewrite)
      else e0
    if (ZonedTimestamps.enabled) e1.transformDown(ZonedTimestamps.exprRewrite) else e1
  }

  override def parseTableIdentifier(sqlText: String): TableIdentifier =
    delegate.parseTableIdentifier(sqlText)
  override def parseFunctionIdentifier(sqlText: String): FunctionIdentifier =
    delegate.parseFunctionIdentifier(sqlText)
  override def parseMultipartIdentifier(sqlText: String): Seq[String] =
    delegate.parseMultipartIdentifier(sqlText)
  override def parseTableSchema(sqlText: String): StructType =
    delegate.parseTableSchema(sqlText)
  override def parseDataType(sqlText: String): DataType =
    delegate.parseDataType(sqlText)
  override def parseRoutineParam(sqlText: String): StructType =
    delegate.parseRoutineParam(sqlText)
}

object GraftSqlParser {

  private val PrepareStmt = raw"(?is)^\s*PREPARE\s+(\w+)\s+FROM\s+(.+)$$".r
  private val ExecuteStmt = raw"(?is)^\s*EXECUTE\s+(\w+)(?:\s+USING\s+(.+?))?\s*;?\s*$$".r
  private val DeallocStmt = raw"(?is)^\s*DEALLOCATE\s+PREPARE\s+(\w+)\s*;?\s*$$".r
  private val DescribeOutputStmt = raw"(?is)^\s*DESCRIBE\s+OUTPUT\s+(\w+)\s*;?\s*$$".r
  private val DescribeInputStmt = raw"(?is)^\s*DESCRIBE\s+INPUT\s+(\w+)\s*;?\s*$$".r
  private val SetSession = raw"(?is)^\s*SET\s+SESSION\s+([\w.]+)\s*=\s*(.+?)\s*;?\s*$$".r
  private val ResetSession = raw"(?is)^\s*RESET\s+SESSION\s+([\w.]+)\s*;?\s*$$".r
  private val ShowStats = raw"(?is)^\s*SHOW\s+STATS\s+FOR\s+([\w.]+)\s*;?\s*$$".r
  private val ShowStatsQuery =
    raw"(?is)^\s*SHOW\s+STATS\s+FOR\s*\((.+)\)\s*;?\s*$$".r
  private val ShowSession = raw"(?is)^\s*SHOW\s+SESSION\s*;?\s*$$".r

  /** The reference session properties this dialect maps (the
    * translateSessionProperty table); SHOW SESSION renders them with
    * their CURRENT Spark-side values, mirroring ShowSessionTask.java's
    * (name, value, default, type, description) shape minus the
    * description catalog.
    */
  private def showSessionSql(spark: org.apache.spark.sql.SparkSession): String = {
    def conf(k: String, d: String) = spark.conf.getOption(k).getOrElse(d)
    val rows = Seq(
      ("hash_partition_count",
        conf("spark.sql.shuffle.partitions", "200"), "integer"),
      ("join_distribution_type",
        if (conf("spark.sql.autoBroadcastJoinThreshold", "10485760") == "-1")
          "PARTITIONED" else "AUTOMATIC", "varchar"),
      ("join_reordering_strategy",
        if (conf("spark.sql.cbo.joinReorder.enabled", "false") == "true")
          "AUTOMATIC" else "ELIMINATE_CROSS_JOINS", "varchar"))
    rows.map { case (n, v, t) =>
      s"SELECT '$n' AS name, '$v' AS value, '$t' AS type"
    }.mkString("\nUNION ALL ")
  }

  /** `SHOW STATS FOR t` (reference ShowStatsRewrite.java /
    * MetadataManager.getTableStatistics): rewritten to ONE single-pass
    * aggregate over the table, unpivoted to the reference's row shape —
    * a row per column carrying distinct count / nulls fraction / numeric
    * low-high, plus the summary row carrying row_count. Stats are
    * computed live and exactly (count DISTINCT, not a sketch): the
    * statement stays one scan regardless of column count, which is the
    * property that matters at scale; swapping approx_count_distinct in
    * is a one-line change traded against oracle exactness.
    */
  private[graft] def showStatsSelect(cols: Seq[(String, Boolean)],
      from: String): String = {
    val aggs = cols.flatMap { case (c, num) =>
      Seq(s"count($c) AS nn_$c", s"count(DISTINCT $c) AS d_$c") ++
        (if (num) Seq(s"CAST(min($c) AS DOUBLE) AS lo_$c",
          s"CAST(max($c) AS DOUBLE) AS hi_$c")
        else Nil)
    }
    val rows = cols.map { case (c, num) =>
      val lo = if (num) s"lo_$c" else "CAST(NULL AS DOUBLE)"
      val hi = if (num) s"hi_$c" else "CAST(NULL AS DOUBLE)"
      s"SELECT CAST('$c' AS VARCHAR(64)) AS column_name, d_$c AS distinct_count, " +
        s"round((rc - nn_$c) / CAST(rc AS DOUBLE), 4) AS nulls_fraction, " +
        s"CAST(NULL AS BIGINT) AS row_count, $lo AS low_value, $hi AS high_value FROM s"
    } :+ ("SELECT CAST(NULL AS VARCHAR(64)), CAST(NULL AS BIGINT), " +
      "CAST(NULL AS DOUBLE), rc, CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE) FROM s")
    s"WITH s AS (SELECT count(*) AS rc, ${aggs.mkString(", ")} FROM $from)\n" +
      rows.mkString("\nUNION ALL ")
  }

  /** Reference session properties (SystemSessionProperties.java) with a
    * faithful Spark SQL-conf equivalent. Properties without one fail by
    * name rather than silently no-op.
    */
  private[graft] def translateSessionProperty(key: String, rawValue: String): String = {
    val value = rawValue.trim.stripPrefix("'").stripSuffix("'")
    key.toLowerCase match {
      // SystemSessionProperties.HASH_PARTITION_COUNT — the number of
      // partitions a hash-distributed exchange produces ≙ Spark's
      // shuffle partition count
      case "hash_partition_count" =>
        s"SET spark.sql.shuffle.partitions=$value"
      // JOIN_DISTRIBUTION_TYPE BROADCAST/PARTITIONED/AUTOMATIC ≙ forcing
      // or forbidding broadcast-hash joins via the size threshold
      case "join_distribution_type" => value.toUpperCase match {
        case "PARTITIONED" => "SET spark.sql.autoBroadcastJoinThreshold=-1"
        case "BROADCAST" => "SET spark.sql.autoBroadcastJoinThreshold=512m"
        case _ => "SET spark.sql.autoBroadcastJoinThreshold=10485760"
      }
      // JOIN_REORDERING_STRATEGY NONE/ELIMINATE_CROSS_JOINS/AUTOMATIC ≙
      // the CBO join-reorder switch
      case "join_reordering_strategy" =>
        s"SET spark.sql.cbo.joinReorder.enabled=${value.toUpperCase == "AUTOMATIC"}"
      // engine-specific: opt-in Presto operator semantics (integer `/`
      // truncation + 1-based subscripts — PrestoOperators)
      case "graft.presto_operators" =>
        s"SET ${PrestoOperators.ConfKey}=${value.toLowerCase == "true"}"
      // engine-specific: opt-in zone-carrying TIMESTAMP WITH TIME ZONE
      // (ZonedTimestamps)
      case "graft.zoned_timestamps" =>
        s"SET ${ZonedTimestamps.ConfKey}=${value.toLowerCase == "true"}"
      case other => throw new IllegalArgumentException(
        s"SET SESSION $other: no Spark mapping for this session property " +
          "(reference SystemSessionProperties.java)")
    }
  }

  /** Count `?` parameters outside string literals (the positions
    * DESCRIBE INPUT reports).
    */
  private[graft] def parameterCount(body: String): Int = {
    var inQuote = false
    var n = 0
    body.foreach {
      case '\'' => inQuote = !inQuote
      case '?' if !inQuote => n += 1
      case _ => ()
    }
    n
  }

  /** Bind every `?` to NULL — DESCRIBE OUTPUT analyzes the body without
    * argument values, exactly the reference's unknown-parameter typing.
    */
  private[graft] def bindAllNull(body: String): String =
    bindParameters(body, Seq.fill(parameterCount(body))("NULL"))

  /** Substitute `?` parameters (top-level, outside string literals) with
    * the EXECUTE … USING expressions, positionally (SqlBase.g4 `EXECUTE
    * qualifiedName (USING expression (',' expression)*)?`).
    */
  private[graft] def bindParameters(body: String, args: Seq[String]): String = {
    val out = new StringBuilder
    var inQuote = false
    var n = 0
    body.foreach {
      case '\'' => inQuote = !inQuote; out += '\''
      case '?' if !inQuote =>
        require(n < args.length,
          s"EXECUTE: statement has more parameters than USING arguments (${args.length})")
        out ++= s"(${args(n)})"; n += 1
      case c => out += c
    }
    require(n == args.length,
      s"EXECUTE: ${args.length} USING arguments for $n parameters")
    out.toString
  }

  /** Handle the session-statement surface; returns the replacement SQL to
    * delegate (already dialect-rewritten where needed), or None for
    * ordinary statements.
    */
  private def sessionStatement(sql: String,
      prepared: java.util.concurrent.ConcurrentHashMap[String, String]): Option[String] = sql match {
    case PrepareStmt(name, body) =>
      prepared.put(name.toLowerCase, body.trim.stripSuffix(";"))
      Some(s"SELECT '${name.toLowerCase}' AS prepared")
    case ExecuteStmt(name, usingArgs) if !name.equalsIgnoreCase("IMMEDIATE") =>
      // (EXECUTE IMMEDIATE is Spark's own statement — pass it through)
      val body = prepared.get(name.toLowerCase)
      require(body != null, s"EXECUTE: prepared statement '$name' not found")
      val args = Option(usingArgs).map(splitTopLevel).getOrElse(Seq.empty)
      Some(rewrite(bindParameters(body, args)))
    case DeallocStmt(name) =>
      prepared.remove(name.toLowerCase)
      Some(s"SELECT '${name.toLowerCase}' AS deallocated")
    case ShowStats(tbl) =>
      val spark = org.apache.spark.sql.SparkSession.active
      val cols = spark.table(tbl).schema.fields.toSeq.map { f =>
        f.name -> f.dataType.isInstanceOf[org.apache.spark.sql.types.NumericType]
      }
      Some(showStatsSelect(cols, tbl))
    case ShowStatsQuery(inner) =>
      // the query form (`SHOW STATS FOR (SELECT …)`, ShowStatsRewrite's
      // other arm): derive the schema from the inner query's analyzed
      // plan, then aggregate over it as an inline subquery
      val spark = org.apache.spark.sql.SparkSession.active
      val body = rewrite(inner.trim)
      val cols = spark.sql(body).schema.fields.toSeq.map { f =>
        f.name -> f.dataType.isInstanceOf[org.apache.spark.sql.types.NumericType]
      }
      Some(showStatsSelect(cols, s"($body) graft_show_stats_q"))
    case ShowSession() =>
      Some(showSessionSql(org.apache.spark.sql.SparkSession.active))
    case SetSession(key, value) =>
      Some(translateSessionProperty(key, value))
    case ResetSession(key) =>
      // route through the translator to reuse the name check, then RESET
      val set = translateSessionProperty(key, "0")
      Some(set.replaceFirst("(?i)^SET ", "RESET ").takeWhile(_ != '='))
    case _ => None
  }

  private val DateAddDiff =
    raw"(?i)\bdate_(add|diff)\s*\(\s*'(\w+)'\s*,".r
  // whitespace before `[` allowed — the reference grammar (and its own
  // test corpus: TestArrayOperators.java writes `ARRAY [1, 2, 3]`)
  // treats ARRAY and the bracket as separate tokens
  private val ArrayKw = raw"(?i)\bARRAY\s*\[".r
  private val CastStart = raw"(?i)\bCAST\s*\(".r
  private val UnnestStart = raw"(?is)\bCROSS\s+JOIN\s+UNNEST\s*\(".r
  private val UnnestAlias = raw"(?is)^\s+(WITH\s+ORDINALITY\s+)?AS\s+(\w+)\s*\(([^()]*)\)".r

  private val CalledOnNull = raw"(?i)\bCALLED\s+ON\s+NULL\s+INPUT\b".r

  // `"col" "alias"` — Presto's no-AS alias where BOTH sides are
  // double-quoted identifiers. Spark's grammar accepts `"col" AS "alias"`
  // but not the juxtaposed form even with doubleQuotedIdentifiers on
  // (the alias-without-AS rule doesn't admit a double-quoted token), so
  // insert the AS. Same-line adjacency only; identifier contexts are the
  // only legal reading once double quotes lex as identifiers.
  private val QuotedAlias = ("\"([^\"\n]+)\"[ \t]+\"([^\"\n]+)\"").r

  def rewrite(sql: String): String = {
    // Presto CREATE FUNCTION's CALLED ON NULL INPUT (SqlBase.g4
    // routineCharacteristic) is Spark's (and Presto's) default null
    // semantics — strip the clause Spark's grammar lacks. RETURNS NULL ON
    // NULL INPUT is left to error loudly: silently dropping it would
    // change null propagation.
    var out = CalledOnNull.replaceAllIn(sql, "")
    out = rewriteExplicitBsEscape(out)
    // zone-carrying TIMESTAMP WITH TIME ZONE literals (opt-in conf;
    // ZonedTimestamps): `TIMESTAMP '<wall> <zone>'` constructs a zoned
    // value by interpreting the wall clock in the zone — exactly
    // with_timezone. Default-off path keeps Spark's own literal parse
    // (zone consumed, instant kept — the documented approximation).
    if (ZonedTimestamps.enabled) out = rewriteZonedTsLiterals(out)
    out = QuotedAlias.replaceAllIn(out, m =>
      "\"" + m.group(1) + "\" AS \"" + m.group(2) + "\"")
    out = DateAddDiff.replaceAllIn(out, m =>
      s"timestamp${m.group(1).toLowerCase}(${m.group(2)},")
    out = rewriteArrayLiterals(out)
    out = rewriteBinarySpaces(out)
    out = rewriteInternalTry(out)
    out = rewritePartialIntervals(out)
    rewriteSortNulls(rewriteMapCtor(rewriteCasts(rewriteUnnest(rewriteExplain(
      rewriteTypedLiterals(
      rewriteDecimalLiterals(rewriteJsonLiterals(rewriteExtract(rewriteAtTimeZone(
        rewriteBareTemporals(rewriteCharLiterals(rewriteRawBackslashes(rewriteUnicodeLiterals(rewriteFromUnnest(
          rewriteTablesample(rewriteQuantified(rewriteArrayAggOrderBy(
            rewriteArrayAggDistinct(out)))))))))))))))))))
  }

  /** An explicit `ESCAPE '\'` clause is legal in the reference (same
    * behavior as Spark's DEFAULT LIKE escape) but parses to
    * `Like(_,_,'\\')` — indistinguishable from Spark's default node, so
    * the dialect's no-default-escape analysis arm would silently strip
    * it (ADVICE r14). Rewrite the clause to the '\u0001' sentinel BEFORE
    * backslash doubling; ResolvePrestoComparisons turns the sentinel
    * into [[org.apache.spark.sql.graft.LikeBackslash]].
    */
  private val ExplicitBsEscape = raw"(?i)\bESCAPE\s+'\\'".r
  private def rewriteExplicitBsEscape(sql: String): String =
    ExplicitBsEscape.replaceAllIn(sql, m =>
      if (insideQuoteOrComment(sql, m.start))
        java.util.regex.Matcher.quoteReplacement(m.group(0))
      else "ESCAPE '\u0001'")

  /** `X'00 7b 22'` — the reference's binary literal allows internal
    * whitespace (BinaryLiteral strips it before hex-decoding); Spark's
    * X'..' demands contiguous hex digits. Strip the whitespace, quote/
    * comment-guarded (KAT replay r14, TestJsonExtract vectors).
    */
  /** Partial-field interval literals — the reference's `INTERVAL '12 10'
    * DAY TO SECOND` fills the missing LOWER fields with zeros
    * (TestIntervalDayTime.java:49-60) and `INTERVAL '124-30' YEAR TO
    * MONTH` normalizes overflowing months into years; Spark demands the
    * full canonical field count. Pad/normalize the text (KAT replay
    * r14); unparseable text passes through for Spark's own error.
    */
  private val PartialInterval =
    raw"(?i)\bINTERVAL\s+'([^']*)'\s+(DAY|HOUR|MINUTE|YEAR)\s+TO\s+(SECOND|MINUTE|HOUR|MONTH)".r
  private def rewritePartialIntervals(sql: String): String =
    PartialInterval.replaceAllIn(sql, m => {
      if (insideQuoteOrComment(sql, m.start))
        java.util.regex.Matcher.quoteReplacement(m.matched)
      else {
        val text = m.group(1).trim
        val from = m.group(2).toUpperCase
        val to = m.group(3).toUpperCase
        val (sign, body) =
          if (text.startsWith("-")) ("-", text.substring(1).trim)
          else if (text.startsWith("+")) ("", text.substring(1).trim)
          else ("", text)
        val canon: Option[String] = (from, to) match {
          case ("YEAR", "MONTH") =>
            raw"^(\d+)(?:-(\d+))?$$".r.findFirstMatchIn(body).map { g =>
              val tot = g.group(1).toLong * 12 +
                Option(g.group(2)).map(_.toLong).getOrElse(0L)
              s"${tot / 12}-${tot % 12}"
            }
          case _ =>
            val order = Seq("DAY", "HOUR", "MINUTE", "SECOND")
            val needed = order.indexOf(to) - order.indexOf(from) + 1
            val re = from match {
              case "DAY" => raw"^(\d+)(?:\s+(\d+)(?::(\d+)(?::(\d+(?:\.\d+)?))?)?)?$$".r
              case "HOUR" => raw"^(\d+)(?::(\d+)(?::(\d+(?:\.\d+)?))?)?$$".r
              case "MINUTE" => raw"^(\d+)(?::(\d+(?:\.\d+)?))?$$".r
              case _ => raw"a^".r
            }
            if (needed < 1) None
            else re.findFirstMatchIn(body).map { g =>
              val given = (1 to g.groupCount)
                .map(i => Option(g.group(i))).takeWhile(_.isDefined).flatten
              val padded = given.padTo(needed, "0").take(needed)
              if (from == "DAY")
                padded.head + (if (needed > 1) " " + padded.tail.mkString(":") else "")
              else padded.mkString(":")
            }
        }
        canon match {
          case Some(c) =>
            java.util.regex.Matcher.quoteReplacement(
              s"INTERVAL '$sign$c' $from TO $to")
          case None => java.util.regex.Matcher.quoteReplacement(m.matched)
        }
      }
    })

  /** The reference desugars TRY(x) to `"$internal$try"(() -> x)`
    * (TryExpressionRewriter) and its tests call the internal spelling
    * directly — map it back to the graft `try` function: replacing the
    * prefix through the 0-arg lambda arrow leaves the expression
    * parenthesized inside try(..) with the call's own closing paren.
    */
  private val InternalTry = "(?i)\"\\$internal\\$try\"\\s*\\(\\s*\\(\\s*\\)\\s*->".r
  private def rewriteInternalTry(sql: String): String =
    InternalTry.replaceAllIn(sql, m =>
      if (insideQuoteOrComment(sql, m.start))
        java.util.regex.Matcher.quoteReplacement(m.matched)
      else "try(")

  private val SpacedBinary = raw"(?i)\bX'([0-9A-Fa-f\s]*\s[0-9A-Fa-f\s]*)'".r
  private def rewriteBinarySpaces(sql: String): String =
    SpacedBinary.replaceAllIn(sql, m =>
      if (insideQuoteOrComment(sql, m.start))
        java.util.regex.Matcher.quoteReplacement(m.matched)
      else
        java.util.regex.Matcher.quoteReplacement(
          s"X'${m.group(1).replaceAll("\\s+", "")}'"))

  /** `ARRAY [..]` literals → `array(..)` via a QUOTE-AWARE bracket scan
    * (round 13 — the old regex corrupted brackets inside embedded string
    * literals, e.g. `ARRAY[JSON '[1, "a"]']`, the documented veneer
    * caveat; the reference's own TestArrayOperators corpus hits it).
    * Recursion rewrites inner literals first, so nesting converges;
    * occurrences inside quotes/comments are left untouched.
    */
  private def rewriteArrayLiterals(sql: String): String =
    ArrayKw.findAllMatchIn(sql).toList
      .find(m => !insideQuoteOrComment(sql, m.start)) match {
      case None => sql
      case Some(m) =>
        val open = m.end - 1
        val close = matchingBracket(sql, open)
        if (close < 0) sql // unbalanced — let the real parser error
        else {
          val inner = rewriteArrayLiterals(sql.substring(open + 1, close))
          sql.substring(0, m.start) + s"array($inner)" +
            rewriteArrayLiterals(sql.substring(close + 1))
        }
    }

  /** Index of the ']' matching the '[' at `open`, skipping single-quoted
    * text; -1 when unbalanced.
    */
  private def matchingBracket(s: String, open: Int): Int = {
    var depth = 0
    var inQuote = false
    var i = open
    while (i < s.length) {
      s.charAt(i) match {
        case '\'' => inQuote = !inQuote
        case '[' if !inQuote => depth += 1
        case ']' if !inQuote =>
          depth -= 1
          if (depth == 0) return i
        case _ =>
      }
      i += 1
    }
    -1
  }

  /** Presto allows UNNEST as a STANDALONE relation (`SELECT * FROM
    * UNNEST(a) [WITH ORDINALITY] [AS t(cols)]` — grammar relationPrimary),
    * where Spark's UNNEST only exists through our CROSS JOIN rewrite.
    * Rewritten to a subquery over a one-row dummy + LATERAL VIEW that
    * projects ONLY the generated columns (so `SELECT *` matches Presto).
    */
  private val FromUnnestStart = raw"(?is)\bFROM\s+UNNEST\s*\(".r
  private val FromUnnestTail =
    raw"(?is)^\s*(WITH\s+ORDINALITY\s*)?(?:AS\s+)?(\w+)?\s*(?:\(([^()]*)\))?".r

  private def rewriteFromUnnest(sql: String): String =
    FromUnnestStart.findFirstMatchIn(sql) match {
      case Some(m) if !insideQuoteOrComment(sql, m.start) =>
        val open = m.end - 1
        val close = matchingParen(sql, open)
        if (close < 0) return sql
        val args = splitTopLevel(sql.substring(open + 1, close))
        val t = FromUnnestTail.findFirstMatchIn(sql.substring(close + 1)).get
        // the optional alias token must not swallow a following keyword
        val aliasTok = Option(t.group(2)).filterNot(a => Seq("WHERE", "GROUP",
          "ORDER", "LIMIT", "HAVING", "JOIN", "CROSS", "LEFT", "RIGHT",
          "FULL", "INNER", "UNION", "INTERSECT", "EXCEPT", "ON", "WITH",
          "SELECT").contains(a.toUpperCase))
        val cols = Option(t.group(3)).filter(_ => aliasTok.isDefined)
          .map(splitTopLevel(_).map(_.trim))
        val ordinality = t.group(1) != null
        val gen =
          if (ordinality) {
            require(args.length == 1,
              "FROM UNNEST WITH ORDINALITY rewrite supports a single array argument")
            s"inline(transform(${args.head}, (e, i) -> struct(e AS _c1, CAST(i + 1 AS BIGINT) AS _c2)))"
          } else if (args.length == 1) s"explode(${args.head})"
          else s"inline(arrays_zip(${args.mkString(", ")}))"
        val alias = aliasTok.getOrElse("__unnest")
        val proj = cols.map(_.mkString(", ")).getOrElse(s"$alias.*")
        val lateral = cols match {
          case Some(cs) => s"LATERAL VIEW $gen $alias AS ${cs.mkString(", ")}"
          case None => s"LATERAL VIEW $gen $alias"
        }
        val consumed = close + 1 + (if (aliasTok.isDefined) t.end
          else t.group(1) match { case null => 0; case g => sql.substring(close + 1).indexOf(g) + g.length })
        sql.substring(0, m.start) +
          s"FROM (SELECT $proj FROM (SELECT 1) AS __unnest_dummy $lateral) AS $alias" +
          rewriteFromUnnest(sql.substring(consumed))
      case _ => sql
    }

  /** `TABLESAMPLE BERNOULLI(p)` / `TABLESAMPLE SYSTEM(p)` (Presto
    * sampleType) → Spark's `TABLESAMPLE (p PERCENT)`. Spark's sampling
    * is per-row Bernoulli; the reference's SYSTEM is block sampling —
    * both are "approximately p% of rows with no exact-count guarantee",
    * the contract sample_bernoulli's spec pins.
    */
  private val Tablesample =
    raw"(?is)\bTABLESAMPLE\s+(BERNOULLI|SYSTEM)\s*\(([^()]*)\)".r

  private def rewriteTablesample(sql: String): String =
    Tablesample.replaceAllIn(sql, m =>
      if (insideQuoteOrComment(sql, m.start)) java.util.regex.Matcher.quoteReplacement(m.group(0))
      else java.util.regex.Matcher.quoteReplacement(s"TABLESAMPLE (${m.group(2).trim} PERCENT)"))

  /** Quantified subquery comparisons (Presto quantifiedComparison):
    * the two forms congruent with IN rewrite textually — `= ANY/SOME
    * (SELECT …)` → `IN (SELECT …)`, `<> ALL (SELECT …)` → `NOT IN
    * (SELECT …)`. Ordering quantifiers (`> ALL` …) stay unsupported and
    * error loudly at parse. The `(SELECT` anchor keeps Spark's any()/
    * some() BOOLEAN AGGREGATES (same spellings!) untouched.
    */
  private val AnyQuant = raw"(?is)=\s*(?:ANY|SOME)\s*\(\s*(SELECT\b)".r
  private val AllQuant = raw"(?is)(?:<>|!=)\s*ALL\s*\(\s*(SELECT\b)".r

  private def rewriteQuantified(sql: String): String = {
    val a = AnyQuant.replaceAllIn(sql, m =>
      if (insideQuoteOrComment(sql, m.start)) java.util.regex.Matcher.quoteReplacement(m.group(0))
      else java.util.regex.Matcher.quoteReplacement(s" IN (${m.group(1)}"))
    AllQuant.replaceAllIn(a, m =>
      if (insideQuoteOrComment(a, m.start)) java.util.regex.Matcher.quoteReplacement(m.group(0))
      else java.util.regex.Matcher.quoteReplacement(s" NOT IN (${m.group(1)}"))
  }

  /** `array_agg(e ORDER BY k1 [ASC|DESC], …)` — Presto allows ORDER BY
    * inside any aggregate call (grammar aggregate sortItem); Spark does
    * not. The array_agg form (by far the common one) rewrites to a
    * comparator sort over (value, keys) structs:
    * transform(array_sort(array_agg(struct(e AS _v, k AS _k1, …)),
    * (l, r) -> cmp), s -> s._v). Null sort keys compare as EQUAL here
    * (Presto's aggregate ORDER BY puts them last) — the one contract
    * corner, documented; other aggregates with ORDER BY error loudly.
    */
  private val ArrayAggStart = raw"(?is)\barray_agg\s*\(".r
  private val OrderByInAgg = raw"(?is)\sORDER\s+BY\s".r

  private def rewriteArrayAggOrderBy(sql: String): String = {
    val m = ArrayAggStart.findFirstMatchIn(sql).orNull
    if (m == null) return sql
    if (insideQuoteOrComment(sql, m.start))
      return sql.substring(0, m.end) + rewriteArrayAggOrderBy(sql.substring(m.end))
    val open = m.end - 1
    val close = matchingParen(sql, open)
    if (close < 0) return sql
    val body = sql.substring(open + 1, close)
    // top-level ORDER BY only (depth 0, not inside a nested call)
    val ob = OrderByInAgg.findAllMatchIn(body).find { om =>
      val prefix = body.substring(0, om.start)
      prefix.count(_ == '(') == prefix.count(_ == ')') &&
        prefix.count(_ == '\'') % 2 == 0
    }.orNull
    val tail = rewriteArrayAggOrderBy(sql.substring(close + 1))
    if (ob == null) return sql.substring(0, close + 1) + tail
    val value = body.substring(0, ob.start).trim
    val keys = splitTopLevel(body.substring(ob.end)).map(_.trim).map { k =>
      val up = k.toUpperCase
      if (up.endsWith(" DESC")) (k.substring(0, k.length - 5).trim, true)
      else if (up.endsWith(" ASC")) (k.substring(0, k.length - 4).trim, false)
      else (k, false)
    }
    val fields = keys.zipWithIndex.map { case ((k, _), i) => s"$k AS _k${i + 1}" }
    val cmp = keys.zipWithIndex.foldRight("0") { case (((_, desc), i), rest) =>
      val (lo, hi) = if (desc) ("1", "-1") else ("-1", "1")
      val f = s"_k${i + 1}"
      s"CASE WHEN l.$f < r.$f THEN $lo WHEN l.$f > r.$f THEN $hi ELSE $rest END"
    }
    sql.substring(0, m.start) +
      s"transform(array_sort(array_agg(struct($value AS _v, ${fields.mkString(", ")})), " +
      s"(l, r) -> $cmp), s -> s._v)" + tail
  }

  /** `array_agg(DISTINCT e)` — the custom null-keeping array_agg builder
    * resolves to a transform() wrapper, which Spark's DISTINCT handling
    * rejects. Presto's semantics (distinct multiset, first-occurrence
    * order) are exactly array_distinct over the plain aggregate.
    */
  private val ArrayAggDistinct = raw"(?is)\barray_agg\s*\(\s*DISTINCT\b".r

  private def rewriteArrayAggDistinct(sql: String): String =
    ArrayAggDistinct.findFirstMatchIn(sql) match {
      case Some(m) if !insideQuoteOrComment(sql, m.start) =>
        val open = sql.indexOf('(', m.start)
        val close = matchingParen(sql, open)
        if (close < 0) return sql
        val inner = sql.substring(m.end, close).trim
        sql.substring(0, m.start) + s"array_distinct(array_agg($inner))" +
          rewriteArrayAggDistinct(sql.substring(close + 1))
      case Some(m) =>
        sql.substring(0, m.end) + rewriteArrayAggDistinct(sql.substring(m.end))
      case None => sql
    }

  /** Presto's EXTRACT delegates every field to the matching scalar
    * function (AstBuilder.visitExtract — DOW → day_of_week, YOW →
    * year_of_week, …). Spark's EXTRACT disagrees on several fields
    * (DOW is 0-based Sunday-start vs Presto's ISO day_of_week; YOW /
    * TIMEZONE_HOUR / TIMEZONE_MINUTE don't exist), so replay the same
    * field→function mapping textually. Unknown fields pass through to
    * Spark's own EXTRACT.
    */
  private val ExtractFieldFn: Map[String, String] = Map(
    "YEAR" -> "year", "QUARTER" -> "quarter", "MONTH" -> "month",
    "WEEK" -> "week", "DAY" -> "day", "DAY_OF_MONTH" -> "day",
    "DAY_OF_WEEK" -> "day_of_week", "DOW" -> "day_of_week",
    "DAY_OF_YEAR" -> "day_of_year", "DOY" -> "day_of_year",
    "YEAR_OF_WEEK" -> "year_of_week", "YOW" -> "year_of_week",
    "HOUR" -> "hour", "MINUTE" -> "minute", "SECOND" -> "second",
    "TIMEZONE_HOUR" -> "timezone_hour", "TIMEZONE_MINUTE" -> "timezone_minute")

  private val ExtractStart = raw"(?is)\bEXTRACT\s*\(\s*(\w+)\s+FROM\b".r

  private def rewriteExtract(sql: String): String =
    ExtractStart.findFirstMatchIn(sql) match {
      case Some(m) if !insideQuoteOrComment(sql, m.start) &&
          ExtractFieldFn.contains(m.group(1).toUpperCase) =>
        val open = sql.indexOf('(', m.start)
        val close = matchingParen(sql, open)
        if (close < 0) sql
        else {
          val argEnd = m.end // position right after FROM
          val arg = rewriteExtract(sql.substring(argEnd, close))
          val fn = ExtractFieldFn(m.group(1).toUpperCase)
          sql.substring(0, m.start) + s"$fn($arg)" + rewriteExtract(sql.substring(close + 1))
        }
      case Some(m) =>
        // unknown field or quoted: skip this occurrence, continue after
        sql.substring(0, m.end) + rewriteExtract(sql.substring(m.end))
      case None => sql
    }

  /** `<primary> AT TIME ZONE '<zone>'` (Presto grammar
    * valueExpression AT timeZoneSpecifier) → `at_timezone(primary,
    * zone)` under the engine's documented UTC-instant contract. The
    * operand is grabbed by a bounded backward scan: a close-paren
    * (balanced, plus a preceding identifier chain — function call or
    * parenthesized expression), a string literal (plus an optional
    * preceding TIMESTAMP/TIME type keyword), or an identifier/number
    * chain. INTERVAL zone offsets are out of textual scope (use
    * at_timezone directly).
    */
  private val AtTimeZone = raw"(?is)\bAT\s+TIME\s+ZONE\s+('(?:[^']|'')*')".r

  private def rewriteAtTimeZone(sql: String): String = {
    val m = AtTimeZone.findFirstMatchIn(sql).orNull
    if (m == null || insideQuoteOrComment(sql, m.start)) return sql
    val zone = m.group(1)
    var end = m.start
    while (end > 0 && sql.charAt(end - 1).isWhitespace) end -= 1
    var start = end
    if (start > 0 && sql.charAt(start - 1) == ')') {
      // balanced back to the matching open paren
      var depth = 0
      var i = start - 1
      var done = false
      while (i >= 0 && !done) {
        val c = sql.charAt(i)
        if (c == ')') depth += 1
        else if (c == '(') { depth -= 1; if (depth == 0) done = true }
        i -= 1
      }
      start = i + 1
      // preceding identifier chain (function name, incl. dotted)
      while (start > 0 && (sql.charAt(start - 1).isLetterOrDigit ||
        sql.charAt(start - 1) == '_' || sql.charAt(start - 1) == '.')) start -= 1
    } else if (start > 0 && sql.charAt(start - 1) == '\'') {
      var i = start - 2
      while (i >= 0 && !(sql.charAt(i) == '\'' &&
        (i == 0 || sql.charAt(i - 1) != '\''))) i -= 1
      start = i
      // optional type keyword before the literal (TIMESTAMP '…')
      var j = start
      while (j > 0 && sql.charAt(j - 1).isWhitespace) j -= 1
      var k = j
      while (k > 0 && sql.charAt(k - 1).isLetter) k -= 1
      val kw = sql.substring(k, j).toUpperCase
      if (kw == "TIMESTAMP" || kw == "TIME" || kw == "DATE") start = k
    } else {
      while (start > 0 && (sql.charAt(start - 1).isLetterOrDigit ||
        sql.charAt(start - 1) == '_' || sql.charAt(start - 1) == '.')) start -= 1
    }
    if (start >= end) return sql // nothing grabbable — leave for the parser
    val operand = sql.substring(start, end)
    sql.substring(0, start) + s"at_timezone($operand, $zone)" +
      rewriteAtTimeZone(sql.substring(m.end))
  }

  /** Zoned TIMESTAMP literal: `TIMESTAMP '<wall> <zone>'` where the zone
    * is a region id (at least one '/'), a UTC spelling, or a numeric
    * offset (SqlBase.g4 TIMESTAMP literal → TimestampWithTimeZoneType
    * when the text carries a zone, TestDateTimeFunctionsBase literals).
    * Applied only when ZonedTimestamps is enabled.
    */
  // named zones need whitespace before them; a numeric offset may be
  // juxtaposed directly (the reference's Joda text parser accepts
  // TIME '3:4+07:09' and TIMESTAMP '2001-1-2+07:09' — KAT wave 9)
  private val ZonedTsLit =
    raw"(?is)\bTIMESTAMP\s*'([^']+?)(?:\s+((?:[A-Za-z][A-Za-z0-9_\-]*/[A-Za-z][A-Za-z0-9_\-+/]*)|UTC|GMT|UT)|\s*([+-]\d{1,2}:\d{2}))'".r

  /** Zoned TIME literal: `TIME '<wall> <zone>'` (the \bTIME\s*' shape
    * cannot match inside TIMESTAMP literals — 'STAMP' intervenes).
    */
  private val ZonedTimeLit =
    raw"(?is)\bTIME\s*'([^']+?)(?:\s+((?:[A-Za-z][A-Za-z0-9_\-]*/[A-Za-z][A-Za-z0-9_\-+/]*)|UTC|GMT|UT)|\s*([+-]\d{1,2}:\d{2}))'".r

  private def rewriteZonedTsLiterals(sql: String): String = {
    def zoneOf(m: scala.util.matching.Regex.Match): String =
      if (m.group(2) != null) m.group(2) else m.group(3)
    val ts = ZonedTsLit.replaceAllIn(sql, m =>
      if (insideQuoteOrComment(sql, m.start))
        java.util.regex.Matcher.quoteReplacement(m.group(0))
      else java.util.regex.Matcher.quoteReplacement(
        s"with_timezone(TIMESTAMP '${m.group(1)}', '${zoneOf(m)}')"))
    ZonedTimeLit.replaceAllIn(ts, m =>
      if (insideQuoteOrComment(ts, m.start))
        java.util.regex.Matcher.quoteReplacement(m.group(0))
      else java.util.regex.Matcher.quoteReplacement(
        s"zoned_ttz(TIME '${m.group(1)}', '${zoneOf(m)}')"))
  }

  /** Presto's bare temporal keywords (grammar specialExpression):
    * LOCALTIMESTAMP / LOCALTIME / CURRENT_TIME have no parenthesized
    * form in Spark's grammar — map to the registered functions (under
    * the zoned-type contract CURRENT_TIME's zone-carrying result is
    * descoped to the session-zone TIME, i.e. localtime).
    */
  private val BareTemporal = raw"(?i)\b(LOCALTIMESTAMP|LOCALTIME|CURRENT_TIME)\b(?!\s*\(|_)".r

  private def rewriteBareTemporals(sql: String): String =
    BareTemporal.replaceAllIn(sql, m =>
      if (insideQuoteOrComment(sql, m.start)) java.util.regex.Matcher.quoteReplacement(m.group(0))
      else m.group(1).toUpperCase match {
        case "LOCALTIMESTAMP" => "localtimestamp()"
        // CURRENT_TIME is zone-carrying in the reference — under the
        // zoned mode it returns TIME WITH TIME ZONE in the session zone
        case "CURRENT_TIME" if ZonedTimestamps.enabled =>
          "zoned_ttz(localtime(), 'UTC')"
        case _ => "localtime()"
      })

  /** Presto string literals are STANDARD SQL: `''` is the only escape
    * and a backslash is a literal character (`'\d'` = backslash-d),
    * while Spark's default lexer unescapes backslash sequences — so a
    * ported `regexp_like(x, '\d+')` would silently match the letter d.
    * Double every backslash inside single-quoted literals so Spark's
    * unescape restores the raw text. Runs once per statement (the
    * re-parsing commands store raw text for exactly this reason); the
    * U&'…' decode runs first so its emitted backslashes are protected
    * too. Scala-side lit()/Column strings never pass through here.
    */
  private def rewriteRawBackslashes(sql: String): String = {
    if (sql.indexOf('\\') < 0) return sql
    val b = new StringBuilder
    var i = 0
    var inStr = false
    while (i < sql.length) {
      val c = sql.charAt(i)
      if (!inStr && c == '-' && i + 1 < sql.length && sql.charAt(i + 1) == '-') {
        val nl = sql.indexOf('\n', i)
        val end = if (nl < 0) sql.length else nl + 1
        b.append(sql.substring(i, end)); i = end
      } else {
        if (c == '\'') inStr = !inStr
        if (c == '\\' && inStr) b.append("\\\\") else b.append(c)
        i += 1
      }
    }
    b.toString
  }

  /** Presto's Unicode string literal `U&'d\0061ta'` with optional
    * `UESCAPE '#'` (grammar UNICODE_STRING / SqlParser unicode decode:
    * `\XXXX` 4-hex, `\+XXXXXX` 6-hex, doubled escape char = itself).
    * Decoded at rewrite time into a plain SQL literal (quotes
    * re-escaped), so the engine's parser/codegen never sees the form.
    */
  private val UnicodeLiteral =
    raw"(?is)\bU&'((?:[^']|'')*)'(?:\s+UESCAPE\s+'(.)')?".r

  private def rewriteUnicodeLiterals(sql: String): String =
    UnicodeLiteral.replaceAllIn(sql, m =>
      if (insideQuoteOrComment(sql, m.start)) java.util.regex.Matcher.quoteReplacement(m.group(0))
      else try {
        val esc = Option(m.group(2)).map(_.charAt(0)).getOrElse('\\')
        val body = m.group(1).replace("''", "'")
        val out = new StringBuilder
        var i = 0
        while (i < body.length) {
          val c = body.charAt(i)
          if (c == esc && i + 1 < body.length && body.charAt(i + 1) == esc) {
            out.append(esc); i += 2
          } else if (c == esc && i + 1 < body.length && body.charAt(i + 1) == '+' &&
              i + 8 <= body.length) {
            out.appendAll(Character.toChars(
              Integer.parseInt(body.substring(i + 2, i + 8), 16))); i += 8
          } else if (c == esc && i + 5 <= body.length) {
            out.appendAll(Character.toChars(
              Integer.parseInt(body.substring(i + 1, i + 5), 16))); i += 5
          } else { out.append(c); i += 1 }
        }
        java.util.regex.Matcher.quoteReplacement(
          "'" + out.toString.replace("'", "''") + "'")
      } catch { case _: IllegalArgumentException =>
        // malformed escape — keep the original text; the parser errors
        java.util.regex.Matcher.quoteReplacement(m.group(0))
      })

  /** Presto's typed CHAR literal `CHAR 'ab'` → CAST with the literal's
    * codepoint length (CharType(n), SqlBase.g4 typeConstructor), which
    * the session's preserved-CHAR semantics then blank-pads like the
    * reference.
    */
  private val CharLiteral = raw"(?s)\bCHAR\s*'((?:[^']|'')*)'".r

  private def rewriteCharLiterals(sql: String): String =
    CharLiteral.replaceAllIn(sql, m =>
      if (insideQuoteOrComment(sql, m.start)) java.util.regex.Matcher.quoteReplacement(m.group(0))
      else {
        val content = m.group(1)
        val n = math.max(1, content.replace("''", "'").codePointCount(0, content.replace("''", "'").length))
        java.util.regex.Matcher.quoteReplacement(s"CAST('$content' AS CHAR($n))")
      })

  private val OrderByKw = raw"(?i)\bORDER\s+BY\b".r
  private val SortTerminator =
    raw"(?i)^(LIMIT|OFFSET|FETCH|ROWS|RANGE|GROUPS|WINDOW)\b".r
  private val HasNullsMarker = raw"(?is).*\bNULLS\s+(FIRST|LAST)\s*$$".r
  private val EndsDesc = raw"(?is).*\bDESC\s*$$".r

  /** Presto's default null ordering is NULLS LAST for BOTH directions
    * (reference PlannerUtils.java:39-51: UNDEFINED → ASC_NULLS_LAST /
    * DESC_NULLS_LAST), where Spark defaults unmarked ASC to NULLS FIRST.
    * The divergence is visible whenever an ORDER BY ... LIMIT cuts a
    * result whose sort keys carry NULLs (ROLLUP grouping rows are the
    * common case: TPC-DS q05/q18/q67/q77/q80 order rollup keys ASC under
    * LIMIT 100, and the two defaults select different top-100 sets) —
    * so unmarked non-DESC sort items get the dialect's explicit
    * NULLS LAST. Unmarked DESC already defaults to NULLS LAST in Spark.
    */
  private def rewriteSortNulls(sql: String): String = {
    // quote/comment state per position, so ORDER BY inside a string
    // literal (or a -- comment) is never rewritten
    val starts = OrderByKw.findAllMatchIn(sql).toList
      .filter(m => !insideQuoteOrComment(sql, m.start))
    starts.reverse.foldLeft(sql)((cur, m) => rewriteSortItems(cur, m.end))
  }

  private def insideQuoteOrComment(s: String, pos: Int): Boolean = {
    var i = 0
    var q: Char = 0
    var block = 0 // bracketed-comment depth (Spark comments NEST)
    while (i < pos) {
      val c = s.charAt(i)
      if (block > 0) {
        if (c == '*' && i + 1 < s.length && s.charAt(i + 1) == '/') { block -= 1; i += 1 }
        else if (c == '/' && i + 1 < s.length && s.charAt(i + 1) == '*') { block += 1; i += 1 }
      }
      else if (q != 0) { if (c == q) q = 0 }
      else if (c == '\'' || c == '"') q = c
      else if (c == '-' && i + 1 < s.length && s.charAt(i + 1) == '-') {
        val nl = s.indexOf('\n', i)
        i = if (nl < 0) s.length else nl
        if (i >= pos) return true
      }
      else if (c == '/' && i + 1 < s.length && s.charAt(i + 1) == '*') {
        block += 1; i += 1
      }
      i += 1
    }
    q != 0 || block > 0
  }

  /** Append NULLS LAST to each unmarked non-DESC sort item of the ORDER
    * BY whose keyword ends at `from`; the item list ends at a top-level
    * `)`, a frame/limit keyword, or end of text.
    */
  private def rewriteSortItems(sql: String, from: Int): String = {
    val items = scala.collection.mutable.ListBuffer.empty[String]
    var itemStart = from
    var i = from
    var depth = 0
    var q: Char = 0
    var end = sql.length
    var done = false
    while (i < sql.length && !done) {
      val c = sql.charAt(i)
      if (q != 0) { if (c == q) q = 0; i += 1 }
      else c match {
        case '\'' | '"' => q = c; i += 1
        case '(' => depth += 1; i += 1
        case ')' if depth == 0 => end = i; done = true
        case ')' => depth -= 1; i += 1
        case ',' if depth == 0 =>
          items += sql.substring(itemStart, i); itemStart = i + 1; i += 1
        case _ =>
          if (depth == 0 && (c.isLetter && (i == 0 || !sql.charAt(i - 1).isLetterOrDigit && sql.charAt(i - 1) != '_')) &&
              SortTerminator.findFirstIn(sql.substring(i, math.min(sql.length, i + 8))).isDefined) {
            end = i; done = true
          } else i += 1
      }
    }
    items += sql.substring(itemStart, if (done) end else sql.length)
    val rewritten = items.map { item =>
      if (item.trim.isEmpty || HasNullsMarker.matches(item) || EndsDesc.matches(item)) item
      else {
        val cut = item.lastIndexWhere(!_.isWhitespace) + 1
        item.substring(0, cut) + " NULLS LAST" + item.substring(cut)
      }
    }
    sql.substring(0, from) + rewritten.mkString(",") + sql.substring(end)
  }

  private val JsonLiteral = raw"(?i)\bJSON\s*'((?:[^']|'')*)'".r

  /** Presto's typed JSON literal `JSON '…'` (grammar SqlBase.g4
    * primaryExpression `JSON' string`): the canonical JSON value of the
    * text — parse-validated and re-serialized, which is exactly
    * `json_parse` (JsonFunctions.java); invalid text errors at runtime
    * like the reference's literal evaluation. Quote doubling preserved.
    */
  private def rewriteJsonLiterals(sql: String): String =
    JsonLiteral.replaceAllIn(sql, m =>
      if (insideQuoteOrComment(sql, m.start))
        java.util.regex.Matcher.quoteReplacement(m.group(0))
      else
        java.util.regex.Matcher.quoteReplacement(s"json_parse('${m.group(1)}')"))

  private val DecimalLiteral = raw"(?i)\bDECIMAL\s*'\s*(-?)(\d*)(?:\.(\d*))?\s*'".r

  /** Presto's GENERIC typed literal `TYPE 'text'` (grammar SqlBase.g4
    * primaryExpression `identifier string` — a cast shorthand valid for
    * any type; the reference's own test corpus writes BIGINT '1',
    * DOUBLE '002.100', VARCHAR 'x' throughout). Spark's grammar only
    * knows DATE/TIMESTAMP/INTERVAL/X'..' (and the graft rewrites for
    * DECIMAL/JSON/CHAR), so the remaining scalar type keywords rewrite
    * to the equivalent explicit CAST. Spellings are mapped to Spark
    * types (REAL→FLOAT, VARCHAR→STRING — Spark's bare VARCHAR demands a
    * length). Found by replaying TestArrayOperators vectors (round 13).
    */
  // juxtaposed form TINYINT'123' allowed too (the grammar treats the
  // type word and the string as separate tokens; TestMathFunctions
  // writes it without the space)
  private val TypedLiteral =
    raw"(?i)\b(DOUBLE\s+PRECISION|BIGINT|INTEGER|INT|SMALLINT|TINYINT|DOUBLE|REAL|BOOLEAN|VARCHAR|VARBINARY|IPADDRESS|IPPREFIX)\s*'((?:[^']|'')*)'".r

  private def rewriteTypedLiterals(sql: String): String =
    TypedLiteral.replaceAllIn(sql, m => {
      // quote/comment guard (as rewriteArrayLiterals/rewriteMapCtor):
      // TYPE 'text' shaped content INSIDE a string literal must pass
      // through untouched — the ('')-aware body otherwise matches across
      // a doubled-quote escape and corrupts the literal.
      if (insideQuoteOrComment(sql, m.start))
        java.util.regex.Matcher.quoteReplacement(m.matched)
      else {
      m.group(1).toUpperCase.replaceAll("\\s+", " ") match {
        // IPADDRESS/IPPREFIX literals CANONICALIZE in the reference
        // (IpAddressType/IpPrefixType: '::ffff:1.2.3.4' reads as
        // '1.2.3.4', a prefix zeroes its host bits) — route through the
        // graft canonicalizers instead of a bare CAST (KAT replay r14)
        case "IPADDRESS" =>
          java.util.regex.Matcher.quoteReplacement(s"ip_canonical('${m.group(2)}')")
        case "IPPREFIX" =>
          java.util.regex.Matcher.quoteReplacement(s"ip_prefix_canonical('${m.group(2)}')")
        case other =>
          val t = other match {
            case "REAL" => "FLOAT"
            case "VARCHAR" => "STRING"
            case "VARBINARY" => "BINARY" // utf8 bytes of the text, both engines
            case "INTEGER" => "INT"
            case "DOUBLE PRECISION" => "DOUBLE" // SQL-standard spelling
            case x => x
          }
          java.util.regex.Matcher.quoteReplacement(s"CAST('${m.group(2)}' AS $t)")
      }
      }
    })

  /** Presto's typed decimal literal `DECIMAL '12.3'` → DECIMAL(3,1)
    * (grammar SqlBase.g4 DECIMAL_VALUE; precision/scale taken from the
    * literal text, DecimalParseResult). Spark's grammar has no such
    * form — rewrite to an explicit CAST with the same derived type.
    */
  private def rewriteDecimalLiterals(sql: String): String =
    DecimalLiteral.replaceAllIn(sql, m =>
      if (insideQuoteOrComment(sql, m.start))
        java.util.regex.Matcher.quoteReplacement(m.group(0))
      else {
      val sign = m.group(1)
      val whole = Option(m.group(2)).getOrElse("")
      val frac = Option(m.group(3)).getOrElse("")
      val scale = frac.length
      // leading zeros of the integral part don't count toward precision
      // (reference literal parsing: DECIMAL '0.2' is DECIMAL(1,1))
      val wholeDigits = whole.dropWhile(_ == '0').length
      val precision = math.max(wholeDigits + scale, math.max(scale, 1))
      s"CAST('$sign$whole${if (scale > 0) s".$frac" else ""}' AS DECIMAL($precision, $scale))"
      })

  private val ExplainOpts = raw"(?is)^(\s*)EXPLAIN\s*\(([^)]*)\)".r
  private val ExplainAnalyze = raw"(?is)^(\s*)EXPLAIN\s+ANALYZE(\s+VERBOSE)?\b".r

  /** Presto EXPLAIN dialect (grammar SqlBase.g4 `EXPLAIN ('(' option ')')?`,
    * options TYPE LOGICAL/DISTRIBUTED/IO/VALIDATE + FORMAT TEXT/JSON):
    * map TYPE LOGICAL to Spark's EXTENDED (logical plans shown) and every
    * other option set to FORMATTED (the physical/distributed plan).
    * EXPLAIN ANALYZE is normally intercepted in parsePlan (it executes
    * and reports runtime metrics — ExplainAnalyzeCommand); the textual
    * mapping to FORMATTED below remains only as the render-only fallback
    * for the parseQuery/parseExpression paths.
    */
  private def rewriteExplain(sql: String): String =
    ExplainOpts.findFirstMatchIn(sql) match {
      case Some(m) =>
        val target =
          if (m.group(2).toUpperCase.contains("LOGICAL")) "EXPLAIN EXTENDED"
          else "EXPLAIN FORMATTED"
        m.group(1) + target + sql.substring(m.end)
      case None =>
        ExplainAnalyze.findFirstMatchIn(sql) match {
          case Some(m) => m.group(1) + "EXPLAIN FORMATTED" + sql.substring(m.end)
          case None => sql
        }
    }

  private val MapCtorStart = raw"(?i)\bMAP\s*\(".r

  /** Presto's two-array map constructor `MAP(ARRAY[…], ARRAY[…])`
    * (MapConstructor.java) → `map_from_arrays(…)`. Spark's variadic
    * `map(k1, v1, …)` keeps its meaning: the rewrite fires only when the
    * call has exactly two top-level arguments and both are array
    * constructors (by that point ARRAY[…] literals are already
    * `array(…)`). The one shadowed Spark form — a two-entry
    * `map(array(…), array(…))` with array KEYS — is pathological (array
    * keys defeat every map operation) and documented away.
    */
  private def rewriteMapCtor(sql: String): String = {
    // runs AFTER rewriteCasts (type text is already encoded into quoted
    // Spark DDL by then), so a quote guard suffices to keep MAP(..)
    // inside type strings / literals untouched
    MapCtorStart.findAllMatchIn(sql)
      .find(m => !insideQuoteOrComment(sql, m.start)) match {
      case None => sql
      case Some(m) =>
        val open = m.end - 1
        val close = matchingParen(sql, open)
        if (close < 0) return sql
        val body = rewriteMapCtor(sql.substring(open + 1, close))
        val tail = rewriteMapCtor(sql.substring(close + 1))
        val args = splitTopLevel(body)
        // round 13: EVERY two-argument MAP(a, b) dispatches on the
        // RESOLVED types (MapCtorDispatch — array pair → map_from_arrays,
        // anything else keeps Spark's pair map). The old textual
        // `array(`-prefix check silently built a one-entry Spark map for
        // MAP(CAST(.. AS ARRAY(..)), ..) or MAP(key_col, val_col) —
        // found replaying TestMapOperators vectors.
        val ctor =
          if (args.length == 2) s"graft_map_ctor($body)"
          else sql.substring(m.start, open) + s"($body)" // keep original spelling
        sql.substring(0, m.start) + ctor + tail
    }
  }

  /** `CROSS JOIN UNNEST(args) AS t(cols)` → LATERAL VIEW form (see class
    * doc); paren-balanced so args may be arbitrary expressions.
    */
  /** First match of `re` that is not inside a string literal or line
    * comment (round 15: the quote-safety property test generalizes the
    * pointwise ADVICE fixes — every structural rewrite selects its
    * anchor through this).
    */
  private def firstUnquoted(re: scala.util.matching.Regex, sql: String)
      : Option[scala.util.matching.Regex.Match] =
    re.findAllMatchIn(sql).find(m => !insideQuoteOrComment(sql, m.start))

  private def rewriteUnnest(sql: String): String = {
    firstUnquoted(UnnestStart, sql) match {
      case None => sql
      case Some(m) =>
        val open = m.end - 1
        val close = matchingParen(sql, open)
        if (close < 0) return sql
        UnnestAlias.findFirstMatchIn(sql.substring(close + 1)) match {
          case Some(t) =>
            val args = splitTopLevel(sql.substring(open + 1, close))
            val ordinality = t.group(1) != null
            val gen =
              if (ordinality) {
                // Presto puts the 1-based ordinality column LAST; an
                // index lambda builds (element, ordinal) structs so
                // inline emits the columns in that order (arrays only —
                // maps WITH ORDINALITY are out of textual scope)
                require(args.length == 1,
                  "UNNEST WITH ORDINALITY rewrite supports a single array argument")
                s"inline(transform(${args.head}, (e, i) -> struct(e, CAST(i + 1 AS BIGINT))))"
              } else if (args.length == 1) s"explode(${args.head})"
              else s"inline(arrays_zip(${args.mkString(", ")}))"
            sql.substring(0, m.start) +
              s"LATERAL VIEW $gen ${t.group(2)} AS ${t.group(3)}" +
              rewriteUnnest(sql.substring(close + 1 + t.end))
          case None => // no alias list — leave for the real parser to reject
            sql.substring(0, close + 1) + rewriteUnnest(sql.substring(close + 1))
        }
    }
  }

  /** Split on commas at paren depth 0, outside single quotes. EXPRESSION
    * lists only count '('/')' — a top-level comparison (`a < b`) or
    * lambda arrow (`x -> ..`) must NOT shift depth, or later commas stop
    * splitting (r13 counted '<'/'>' for every caller, so
    * `MAP(ARRAY[a < b], ARRAY[c])` failed its 2-arg split and silently
    * fell back to Spark's one-entry map). Legacy `ARRAY<..>` spellings
    * inside an expression are always wrapped by their `CAST(..)` parens,
    * so paren-only depth still covers their inner commas.
    */
  private def splitTopLevel(s: String): Seq[String] =
    splitTopLevelImpl(s, typeMode = false)

  /** Split a TYPE-text list (translateType call sites): here '<'/'>' are
    * the legacy `ARRAY<..>`/`MAP<..>` brackets and DO nest — `MAP<ARRAY
    * <INT>, INT>`'s inner comma is not a field boundary — while
    * comparisons/lambdas cannot occur.
    */
  private def splitTypeList(s: String): Seq[String] =
    splitTopLevelImpl(s, typeMode = true)

  private def splitTopLevelImpl(s: String, typeMode: Boolean): Seq[String] = {
    val parts = scala.collection.mutable.ArrayBuffer.empty[String]
    var depth = 0
    var inQuote = false
    var start = 0
    var i = 0
    while (i < s.length) {
      s.charAt(i) match {
        case '\'' => inQuote = !inQuote
        case '(' if !inQuote => depth += 1
        case ')' if !inQuote => depth -= 1
        case '<' | '>' if !inQuote && typeMode =>
          depth += (if (s.charAt(i) == '<') 1 else -1)
        case ',' if !inQuote && depth == 0 =>
          parts += s.substring(start, i).trim
          start = i + 1
        case _ =>
      }
      i += 1
    }
    parts += s.substring(start).trim
    parts.toSeq
  }

  /** Find the index just past the ')' matching the '(' at `open`. */
  private def matchingParen(s: String, open: Int): Int = {
    var depth = 0
    var inQuote = false
    var i = open
    while (i < s.length) {
      s.charAt(i) match {
        case '\'' => inQuote = !inQuote
        case '(' if !inQuote => depth += 1
        case ')' if !inQuote =>
          depth -= 1
          if (depth == 0) return i
        case _ =>
      }
      i += 1
    }
    -1
  }

  /** Last top-level ` AS ` inside a CAST body (the type separator — the
    * expression side may itself contain casts, already rewritten by the
    * innermost-first recursion).
    */
  private def lastTopLevelAs(s: String): Int = {
    var depth = 0
    var inQuote = false
    var found = -1
    var i = 0
    while (i < s.length - 3) {
      s.charAt(i) match {
        case '\'' => inQuote = !inQuote
        case '(' if !inQuote => depth += 1
        case ')' if !inQuote => depth -= 1
        case c if !inQuote && depth == 0 && (c == 'A' || c == 'a') =>
          if (i > 0 && s.charAt(i - 1).isWhitespace &&
            (s.charAt(i + 1) == 'S' || s.charAt(i + 1) == 's') &&
            i + 2 < s.length && s.charAt(i + 2).isWhitespace) found = i
        case _ =>
      }
      i += 1
    }
    found
  }

  /** Presto type text → Spark DDL (recursive). Returns None when the type
    * needs no translation (already valid Spark).
    */
  private[graft] def translateType(t0: String): String = {
    val t = t0.trim
    val up = t.toUpperCase
    if (up.startsWith("ARRAY(") && t.endsWith(")"))
      s"ARRAY<${translateType(t.substring(6, t.length - 1))}>"
    // the reference grammar's LEGACY angle spellings (SqlBase.g4 type:
    // ARRAY '<' type '>' / MAP '<' type ',' type '>') — its own test
    // corpus writes CAST(.. AS ARRAY<BIGINT>) throughout
    else if (up.startsWith("ARRAY<") && t.endsWith(">"))
      s"ARRAY<${translateType(t.substring(6, t.length - 1))}>"
    else if (up.startsWith("MAP<") && t.endsWith(">")) {
      val kv = splitTypeList(t.substring(4, t.length - 1))
      require(kv.length == 2, s"bad MAP type: $t0")
      s"MAP<${translateType(kv.head)}, ${translateType(kv(1))}>"
    } else if (up.startsWith("MAP(") && t.endsWith(")")) {
      val kv = splitTypeList(t.substring(4, t.length - 1))
      require(kv.length == 2, s"bad MAP type: $t0")
      s"MAP<${translateType(kv.head)}, ${translateType(kv(1))}>"
    } else if (up.startsWith("ROW(") && t.endsWith(")")) {
      // the reference allows ANONYMOUS row fields (`ROW(INTEGER,
      // INTEGER)` — RowType.anonymous, named field0..fieldN-1 like the
      // reference's own ROW() constructor); Spark structs need names
      val fields = splitTypeList(t.substring(4, t.length - 1)).zipWithIndex.map {
        case (f, i) =>
          val ft = f.trim
          // a field is ANONYMOUS when its first word is a type keyword
          // standing alone or opening its own parameter list — DECIMAL(10,
          // 5), ARRAY(..), multi-word TIME/TIMESTAMP/DOUBLE spellings. A
          // named field is `identifier type` (a name that shadows a type
          // keyword would need quoting, as in the reference).
          val word = ft.takeWhile(c => c.isLetterOrDigit || c == '_')
          val afterWord = ft.drop(word.length)
          val isTypeWord = word.toUpperCase.matches(
            "ARRAY|MAP|ROW|DOUBLE|TIME|TIMESTAMP|DECIMAL|VARCHAR|CHAR|INTEGER|INT|BIGINT|SMALLINT|TINYINT|BOOLEAN|REAL|DATE|JSON|VARBINARY|UNKNOWN")
          val bareType = isTypeWord && (afterWord.trim.isEmpty ||
            afterWord.trim.startsWith("(") || afterWord.trim.startsWith("<") ||
            Seq("TIME", "TIMESTAMP", "DOUBLE").contains(word.toUpperCase))
          if (bareType) s"field$i: ${translateType(ft)}"
          else {
            val sp = ft.indexOf(' ')
            require(sp > 0, s"ROW field needs 'name type': $f")
            s"${ft.substring(0, sp)}: ${translateType(ft.substring(sp + 1))}"
          }
      }
      s"STRUCT<${fields.mkString(", ")}>"
    } else if (up == "VARCHAR") "STRING"
    else if (up == "INTEGER") "INT"
    else if (up == "REAL") "FLOAT"
    else if (up == "VARBINARY") "BINARY"
    else if (up.replaceAll("\\s+", " ") == "DOUBLE PRECISION") "DOUBLE"
    // the sketch family's SQL type spellings are all VARBINARY-modeled
    // here (the digests ARE their serialized bytes — §2.4 sketches):
    // CAST(NULL AS qdigest(bigint)) et al. must type-check (KAT r14)
    else if (up.startsWith("QDIGEST") || up.startsWith("TDIGEST") ||
      up == "HYPERLOGLOG" || up == "P4HYPERLOGLOG" || up == "SETDIGEST" ||
      up == "KHYPERLOGLOG") "BINARY"
    // the reference's bottom type (UnknownType.java; the type of a bare
    // NULL / empty-array literal) — Spark's spelling is VOID
    else if (up == "UNKNOWN") "VOID"
    else t
  }

  /** Rewrite Presto-specific CASTs (innermost-first so nesting works). */
  private def rewriteCasts(sql: String): String = {
    firstUnquoted(CastStart, sql) match {
      case None => sql
      case Some(m) =>
        val open = m.end - 1
        val close = matchingParen(sql, open)
        if (close < 0) return sql // unbalanced — let the real parser error
        val body = rewriteCasts(sql.substring(open + 1, close))
        val tail = rewriteCasts(sql.substring(close + 1))
        val asIdx = lastTopLevelAs(body)
        val rewritten = if (asIdx < 0) s"CAST($body)" else {
          val expr = body.substring(0, asIdx).trim
          val tpe = body.substring(asIdx + 3).trim
          val up = tpe.toUpperCase
          if (up == "JSON") s"cast_to_json($expr)"
          // TIMESTAMP/TIME WITH TIME ZONE: zone-carrying under the opt-in
          // conf (string sources keep their own trailing zone token); the
          // documented zoneless approximation otherwise
          else if (up.replaceAll("\\s+", " ") == "TIMESTAMP WITH TIME ZONE")
            if (ZonedTimestamps.enabled) s"zoned_tstz($expr)"
            else s"CAST($expr AS TIMESTAMP)"
          else if (up.replaceAll("\\s+", " ") == "TIME WITH TIME ZONE")
            if (ZonedTimestamps.enabled) s"zoned_ttz_cast($expr)"
            else s"CAST($expr AS TIME)"
          else if (up.startsWith("ARRAY(") || up.startsWith("MAP(") ||
              up.startsWith("ROW(") ||
              up.startsWith("ARRAY<") || up.startsWith("MAP<"))
            // source type decides JSON-parse vs structural cast — the
            // late-binding ComplexCastDispatch picks after resolution
            // (a ROW(...) source must structurally cast, not from_json);
            // angle forms are the grammar's legacy spellings
            s"complex_cast($expr, '${translateType(tpe)}')"
          else if (up == "UNKNOWN") s"CAST($expr AS VOID)"
          // IPADDRESS/IPPREFIX: late-binding dispatch on the source type
          // (varchar canonicalizes, varbinary reads 4/16 bytes, prefix ↔
          // address convert — IpAddressOperators/IpPrefixOperators)
          else if (up == "IPADDRESS") s"ip_cast($expr)"
          else if (up == "IPPREFIX") s"ip_prefix_cast($expr)"
          else if (up == "VARCHAR") s"CAST($expr AS STRING)"
          else if (up == "VARBINARY") s"CAST($expr AS BINARY)"
          else if (up.replaceAll("\\s+", " ") == "DOUBLE PRECISION")
            s"CAST($expr AS DOUBLE)" // SQL-standard spelling (KAT r14)
          else if (up.startsWith("QDIGEST") || up.startsWith("TDIGEST") ||
              up == "HYPERLOGLOG" || up == "P4HYPERLOGLOG" ||
              up == "SETDIGEST" || up == "KHYPERLOGLOG")
            // sketch types are VARBINARY-modeled (digests ARE their bytes)
            s"CAST($expr AS BINARY)"
          else s"CAST($expr AS $tpe)"
        }
        sql.substring(0, m.start) + rewritten + tail
    }
  }
}
