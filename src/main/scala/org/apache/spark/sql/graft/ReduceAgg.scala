// Lives inside org.apache.spark.sql because HigherOrderFunction's
// argumentTypes/functionTypes expose the private[sql] AbstractDataType —
// the standard placement for extension expressions that implement
// sql-private traits. Everything else about this class is graft code.
package org.apache.spark.sql.graft

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types._

/** `reduce_agg(input, initial, inputFn, combineFn)` — the reference's
  * lambda-fold aggregate (ReduceAggregationFunction.java): folds every
  * input value into a state with `inputFn(state, value)` and merges
  * partial states with `combineFn(a, b)`. Spark has the *scalar*
  * `aggregate()` higher-order function but no aggregate counterpart, so
  * this is genuinely new engine surface: a TypedImperativeAggregate that
  * is also a HigherOrderFunction (the analyzer's lambda-binding rule
  * resolves the two lambdas against the state/input types).
  *
  * Like the reference: the initial state must be a constant, and
  * `combineFn` must be commutative+associative for the result to be
  * partition-order independent — that contract is what lets partials
  * merge under map-side aggregation and AQE at scale.
  */
/** Scalar stand-in produced by the `reduce_agg` function builder. The
  * analyzer's lambda check requires the direct builder result to be a
  * HigherOrderFunction (an AggregateExpression wrapper fails it), so
  * resolution happens in two steps: ResolveHigherOrderFunctions binds the
  * two lambdas against (state, input) / (state, state) here, then the
  * injected ResolveReduceAgg rule swaps this node for the real aggregate.
  */
case class ReduceAggPlaceholder(
    input: Expression,
    initial: Expression,
    inputFn: Expression,
    combineFn: Expression)
    extends Expression with HigherOrderFunction {

  override def prettyName: String = "reduce_agg"
  override def dataType: DataType = initial.dataType
  override def nullable: Boolean = true

  override def children: Seq[Expression] = arguments ++ functions
  override def arguments: Seq[Expression] = Seq(input, initial)
  override def argumentTypes: Seq[AbstractDataType] = Seq(AnyDataType, AnyDataType)
  override def functions: Seq[Expression] = Seq(inputFn, combineFn)
  override def functionTypes: Seq[AbstractDataType] = Seq(AnyDataType, AnyDataType)

  override protected def bindInternal(
      f: (Expression, Seq[(DataType, Boolean)]) => LambdaFunction): HigherOrderFunction = {
    val stateType = initial.dataType
    copy(
      inputFn = f(inputFn, Seq((stateType, true), (input.dataType, input.nullable))),
      combineFn = f(combineFn, Seq((stateType, true), (stateType, true))))
  }

  override def eval(input: InternalRow): Any =
    throw new UnsupportedOperationException("reduce_agg placeholder must be resolved")
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode): org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    throw new UnsupportedOperationException("reduce_agg placeholder must be resolved")
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): ReduceAggPlaceholder =
    copy(input = newChildren(0), initial = newChildren(1),
      inputFn = newChildren(2), combineFn = newChildren(3))
}

/** Analyzer rule (injected via GraftExtensions): once the placeholder's
  * lambdas are bound, replace it with the executable aggregate.
  */
object ResolveReduceAgg
    extends org.apache.spark.sql.catalyst.rules.Rule[
      org.apache.spark.sql.catalyst.plans.logical.LogicalPlan] {
  override def apply(
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): org.apache.spark.sql.catalyst.plans.logical.LogicalPlan =
    plan.resolveExpressions {
      case p: ReduceAggPlaceholder if p.childrenResolved &&
          p.functions.forall(_.isInstanceOf[LambdaFunction]) =>
        ReduceAgg(p.input, p.initial, p.inputFn, p.combineFn).toAggregateExpression()
    }
}

case class ReduceAgg(
    input: Expression,
    initial: Expression,
    inputFn: Expression,
    combineFn: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[AnyRef] {

  override def prettyName: String = "reduce_agg"
  override def dataType: DataType = initial.dataType
  override def nullable: Boolean = true

  override def children: Seq[Expression] = Seq(input, initial, inputFn, combineFn)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    if (!initial.foldable) {
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        "reduce_agg: initial state must be a constant")
    } else (inputFn, combineFn) match {
      case (i: LambdaFunction, c: LambdaFunction) =>
        if (i.dataType != initial.dataType || c.dataType != initial.dataType)
          org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
            s"reduce_agg: both lambdas must return the state type ${initial.dataType.sql}, " +
              s"got ${i.dataType.sql} and ${c.dataType.sql}")
        else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case _ =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          "reduce_agg: third and fourth arguments must be lambda functions")
    }
  }

  @transient private lazy val inputLambda = inputFn.asInstanceOf[LambdaFunction]
  @transient private lazy val combineLambda = combineFn.asInstanceOf[LambdaFunction]
  @transient private lazy val Seq(inStateVar, inValueVar) =
    inputLambda.arguments.map(_.asInstanceOf[NamedLambdaVariable])
  @transient private lazy val Seq(cLeftVar, cRightVar) =
    combineLambda.arguments.map(_.asInstanceOf[NamedLambdaVariable])

  override def createAggregationBuffer(): AnyRef =
    InternalRow.copyValue(initial.eval(InternalRow.empty)).asInstanceOf[AnyRef]

  override def update(buffer: AnyRef, row: InternalRow): AnyRef = {
    val v = input.eval(row)
    inStateVar.value.set(buffer)
    inValueVar.value.set(v)
    InternalRow.copyValue(inputLambda.function.eval(row)).asInstanceOf[AnyRef]
  }

  override def merge(buffer: AnyRef, other: AnyRef): AnyRef = {
    cLeftVar.value.set(buffer)
    cRightVar.value.set(other)
    InternalRow.copyValue(combineLambda.function.eval(InternalRow.empty)).asInstanceOf[AnyRef]
  }

  override def eval(buffer: AnyRef): Any = buffer

  @transient private lazy val proj = UnsafeProjection.create(Array(dataType))

  override def serialize(buffer: AnyRef): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    val row = proj(InternalRow(buffer))
    val bytes = row.getBytes
    out.writeInt(bytes.length)
    out.write(bytes)
    out.flush()
    bos.toByteArray
  }

  override def deserialize(storageFormat: Array[Byte]): AnyRef = {
    val in = new DataInputStream(new ByteArrayInputStream(storageFormat))
    val len = in.readInt()
    val bytes = new Array[Byte](len)
    in.readFully(bytes)
    val row = new UnsafeRow(1)
    row.pointTo(bytes, len)
    InternalRow.copyValue(row.get(0, dataType)).asInstanceOf[AnyRef]
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): ReduceAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): ReduceAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): ReduceAgg =
    copy(input = newChildren(0), initial = newChildren(1),
      inputFn = newChildren(2), combineFn = newChildren(3))
}
