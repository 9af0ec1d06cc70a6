// Lives inside org.apache.spark.sql to reach the private[sql]
// StringUtils.escapeLikeRegex — the same translation Spark's own Like
// node uses, so an explicit backslash escape matches Spark-default LIKE
// semantics exactly (see RegexpLambda for the placement convention).
package org.apache.spark.sql.graft

import java.util.regex.Pattern

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.StringUtils
import org.apache.spark.sql.types.{AbstractDataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** LIKE with an EXPLICIT `ESCAPE '\'` clause under the Presto dialect.
  *
  * The reference has no DEFAULT escape character (LikeFunctions.java —
  * backslash in a bare LIKE pattern is a literal), but a user may still
  * name backslash explicitly: `x LIKE p ESCAPE '\'`. That clause parses
  * to `Like(x, p, '\\')` — byte-identical to Spark's default-escape
  * node — so the dialect's no-default-escape analysis arm would
  * silently strip it (ADVICE r14). The parser rewrites the explicit
  * clause to the '' sentinel and the analysis rule lands here: a
  * distinct node the no-escape arm can never refire on, evaluating with
  * Spark's own LIKE-to-regex translation at escape '\\'.
  *
  * Long-tail scalar (explicit backslash ESCAPE is rare) — CodegenFallback
  * with a per-instance last-pattern cache covers the common literal /
  * low-cardinality pattern case without unbounded growth.
  */
case class LikeBackslash(left: Expression, right: Expression)
    extends BinaryExpression with Predicate with ImplicitCastInputTypes
    with CodegenFallback {

  override def prettyName: String = "like"
  override def inputTypes: Seq[AbstractDataType] =
    Seq(StringType, StringType)

  @transient private[this] var lastPattern: UTF8String = _
  @transient private[this] var lastRegex: Pattern = _

  override def nullSafeEval(s: Any, p: Any): Any = {
    val pu = p.asInstanceOf[UTF8String]
    if (lastRegex == null || lastPattern != pu) {
      lastPattern = pu.clone()
      lastRegex = Pattern.compile(
        StringUtils.escapeLikeRegex(pu.toString, '\\'), Pattern.DOTALL)
    }
    lastRegex.matcher(s.asInstanceOf[UTF8String].toString).matches()
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): LikeBackslash =
    copy(left = newLeft, right = newRight)
}
