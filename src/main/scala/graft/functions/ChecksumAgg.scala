package graft.functions

import org.apache.spark.sql.catalyst.dsl.expressions._
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.DeclarativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types._

/** Order-independent checksum aggregate, value-compatible with the
  * reference's `checksum(x)` (ChecksumAggregationFunction.java:47):
  * state += hash(value) * PRIME64 (nulls contribute PRIME64), merged by
  * addition — commutative + associative, so the result is identical under
  * any partitioning / row order. That property is what makes it the
  * correctness-oracle workhorse (compare whole result sets without ORDER
  * BY) at any scale.
  *
  * Divergences (SURVEY.md §7.3 "sketch binary formats" applies in spirit):
  * the row hash is Spark's xxhash64 rather than Presto's per-type hash,
  * and the output is BIGINT rather than VARBINARY — equal inputs give
  * equal checksums, which is the contract the oracle needs. Like the
  * reference's NullableLongState, an empty group (no rows at all) yields
  * NULL — distinct from an all-NULLs group, which contributes PRIME64
  * per row.
  *
  * Declarative (not imperative) so update/merge stay inside whole-stage
  * codegen; arithmetic is pinned to EvalMode.LEGACY wrap-around so the
  * engine's ANSI mode can't turn intentional overflow into an error.
  */
case class ChecksumAgg(child: Expression)
    extends DeclarativeAggregate with UnaryLike[Expression] {

  private val prime64 = 0x9E3779B185EBCA87L

  override def prettyName: String = "checksum"
  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  private lazy val acc = AttributeReference("checksum_acc", LongType, nullable = false)()
  private lazy val seen = AttributeReference("checksum_seen", BooleanType, nullable = false)()

  override lazy val aggBufferAttributes: Seq[AttributeReference] = Seq(acc, seen)
  override lazy val initialValues: Seq[Expression] = Seq(Literal(0L), Literal(false))

  override lazy val updateExpressions: Seq[Expression] = {
    val rowHash = new XxHash64(Seq(child))
    val contribution = If(IsNull(child),
      Literal(prime64),
      Multiply(rowHash, Literal(prime64), EvalMode.LEGACY))
    Seq(Add(acc, contribution, EvalMode.LEGACY), Literal(true))
  }

  override lazy val mergeExpressions: Seq[Expression] =
    Seq(Add(acc.left, acc.right, EvalMode.LEGACY), Or(seen.left, seen.right))

  override lazy val evaluateExpression: Expression =
    If(seen, acc, Literal(null, LongType))

  override protected def withNewChildInternal(newChild: Expression): ChecksumAgg =
    copy(child = newChild)
}
