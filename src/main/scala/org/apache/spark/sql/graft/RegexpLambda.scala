// Lives inside org.apache.spark.sql because HigherOrderFunction exposes the
// private[sql] AbstractDataType in argumentTypes/functionTypes — the standard
// placement for extension expressions implementing sql-private traits (see
// ReduceAgg). Everything else about this class is graft code.
package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** `regexp_replace(string, pattern, x -> …)` — the reference's
  * lambda-replacement form (JoniRegexpReplaceLambdaFunction.java:47-115):
  * for every match, the lambda receives the ARRAY of capture groups
  * (groups 1..N; a group that did not participate contributes a NULL
  * element — group 0 is never passed) and its result replaces the match.
  * Reference edge semantics reproduced exactly:
  *
  *  - no match → the original string, unchanged;
  *  - a NULL lambda result makes the ENTIRE result NULL ("replacing a
  *    substring with null (unknown) makes the entire string null");
  *  - a zero-width match advances the scan by one position (the skipped
  *    character lands in the next unmatched append), so `'abc'` with
  *    pattern `''` interleaves the replacement between characters.
  *
  * Spark has no higher-order regexp function, so this is a custom
  * [[HigherOrderFunction]]; the dialect registers it only for the
  * 3-arg-with-lambda shape (the plain 3-arg string replacement keeps
  * Spark's builtin). Per-row work is regex + lambda — CodegenFallback
  * is the house cost for long-tail scalars.
  */
case class RegexpReplaceLambda(
    source: Expression, pattern: Expression, function: Expression)
    extends HigherOrderFunction with CodegenFallback {

  override def prettyName: String = "regexp_replace"
  override def dataType: DataType = StringType
  override def nullable: Boolean = true

  override def arguments: Seq[Expression] = Seq(source, pattern)
  override def argumentTypes: Seq[AbstractDataType] = Seq(StringType, StringType)
  override def functions: Seq[Expression] = Seq(function)
  override def functionTypes: Seq[AbstractDataType] = Seq(StringType)

  override def bindInternal(
      f: (Expression, Seq[(DataType, Boolean)]) => LambdaFunction): HigherOrderFunction =
    copy(function =
      f(function, Seq((ArrayType(StringType, containsNull = true), false))))

  @transient private lazy val LambdaFunction(_, Seq(groupsVar: NamedLambdaVariable), _) =
    function

  @transient private lazy val functionForEval: Expression = functionsForEval.head

  // pattern is a literal in every realistic call — cache the last compile
  @transient private var lastPattern: String = _
  @transient private var compiled: java.util.regex.Pattern = _
  private def regex(p: String): java.util.regex.Pattern = {
    if (p != lastPattern) { compiled = java.util.regex.Pattern.compile(p); lastPattern = p }
    compiled
  }

  override def eval(input: InternalRow): Any = {
    val s = source.eval(input)
    if (s == null) return null
    val p = pattern.eval(input)
    if (p == null) return null
    val src = s.asInstanceOf[UTF8String].toString
    val m = regex(p.toString).matcher(src)
    if (!m.find(0)) return s
    val out = new java.lang.StringBuilder(src.length)
    var appendPos = 0
    var found = true
    while (found) {
      out.append(src, appendPos, m.start)
      appendPos = m.end
      val groups = new Array[Any](m.groupCount())
      var i = 1
      while (i <= m.groupCount()) {
        val g = m.group(i)
        groups(i - 1) = if (g == null) null else UTF8String.fromString(g)
        i += 1
      }
      groupsVar.value.set(new GenericArrayData(groups))
      val replaced = functionForEval.eval(input)
      if (replaced == null) return null
      out.append(replaced.asInstanceOf[UTF8String].toString)
      // zero-width match: resume one past the match end (reference
      // nextStart handling); the skipped character is still emitted by
      // the next unmatched append because appendPos stays behind
      val nextStart = if (m.end == m.start) m.end + 1 else m.end
      found = nextStart <= src.length && m.find(nextStart)
    }
    out.append(src, appendPos, src.length)
    UTF8String.fromString(out.toString)
  }

  override def children: Seq[Expression] = Seq(source, pattern, function)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): RegexpReplaceLambda =
    copy(source = newChildren(0), pattern = newChildren(1), function = newChildren(2))
}

/** `apply(x, v -> …)` — the reference test framework's lambda-apply
  * helper (ApplyFunction, registered by FunctionAssertions for its
  * operator tests and used throughout the geospatial corpus:
  * `apply(bing_tile_polygon(..), g -> ST_Point(ST_XMax(g), ..))`).
  * Dialect-gated like the rest of the replay surface; the lambda's
  * argument type binds to the resolved input type.
  */
case class LambdaApply(arg: Expression, function: Expression)
    extends HigherOrderFunction with CodegenFallback {

  override def prettyName: String = "apply"
  override def dataType: DataType = function.dataType
  override def nullable: Boolean = true

  override def arguments: Seq[Expression] = Seq(arg)
  override def argumentTypes: Seq[AbstractDataType] = Seq(AnyDataType)
  override def functions: Seq[Expression] = Seq(function)
  override def functionTypes: Seq[AbstractDataType] = Seq(AnyDataType)

  override def bindInternal(
      f: (Expression, Seq[(DataType, Boolean)]) => LambdaFunction): HigherOrderFunction =
    copy(function = f(function, Seq((arg.dataType, arg.nullable))))

  @transient private lazy val LambdaFunction(_, Seq(argVar: NamedLambdaVariable), _) =
    function

  @transient private lazy val functionForEval: Expression = functionsForEval.head

  override def eval(input: InternalRow): Any = {
    argVar.value.set(arg.eval(input))
    functionForEval.eval(input)
  }

  override def children: Seq[Expression] = Seq(arg, function)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): LambdaApply =
    copy(arg = newChildren(0), function = newChildren(1))
}
