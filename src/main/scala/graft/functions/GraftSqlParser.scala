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
  *
  * Textual rewriting is deliberately conservative: patterns are anchored
  * to the exact call shapes above. A string literal that *contains* one of
  * these shapes would be corrupted — accepted and documented (the
  * reference's own benchto SQL corpus never does that).
  */
class GraftSqlParser(delegate: ParserInterface) extends ParserInterface {

  import GraftSqlParser._

  override def parsePlan(sqlText: String): LogicalPlan =
    delegate.parsePlan(rewrite(sqlText))
  override def parseQuery(sqlText: String): LogicalPlan =
    delegate.parseQuery(rewrite(sqlText))
  override def parseExpression(sqlText: String): Expression =
    delegate.parseExpression(rewrite(sqlText))

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
  private val DateAddDiff =
    raw"(?i)\bdate_(add|diff)\s*\(\s*'(\w+)'\s*,".r
  private val ArrayLiteral =
    raw"(?i)\bARRAY\[([^\[\]]*)\]".r

  def rewrite(sql: String): String = {
    var out = DateAddDiff.replaceAllIn(sql, m =>
      s"timestamp${m.group(1).toLowerCase}(${m.group(2)},")
    // innermost-first so ARRAY[ARRAY[1], ARRAY[2]] converges
    var prev: String = null
    while (prev != out) {
      prev = out
      out = ArrayLiteral.replaceAllIn(out, m => s"array(${m.group(1)})")
    }
    out
  }
}
