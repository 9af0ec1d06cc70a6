package graft.functions

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Codegen'd dot product over two numeric arrays (FLOAT or DOUBLE
  * elements, both sides the same type) — the hot kernel of the
  * similarity / embedding-dedup family.
  *
  * Rationale: the HOF spelling `aggregate(zip_with(a, b, *), 0d, +)`
  * evaluates an interpreted lambda per ELEMENT; at 64 dims that is ~200
  * interpreted calls per scored pair, which measured ~40 s for the
  * 125k-candidate re-score of dd_embedding_lsh at sf0.1. This expression
  * compiles to a tight primitive loop inside whole-stage codegen
  * (~2 ns/element), keeping the re-score where it belongs: free relative
  * to the shuffle.
  *
  * Array elements must be non-null (embedding vectors by construction);
  * a null ARRAY on either side yields NULL like any binary expression.
  */
case class ArrayDot(left: Expression, right: Expression)
    extends BinaryExpression {

  override def prettyName: String = "array_dot"
  override def dataType: DataType = DoubleType

  private def elemType: DataType = left.dataType match {
    case ArrayType(et, _) => et
    case _ => DoubleType
  }

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(l, _), ArrayType(r, _))
          if l == r && (l == FloatType || l == DoubleType) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case (l, r) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires two ARRAY<FLOAT> or two ARRAY<DOUBLE> " +
            s"arguments, got ${l.catalogString} and ${r.catalogString}")
    }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0
    var i = 0
    elemType match {
      case FloatType =>
        while (i < n) { acc += x.getFloat(i).toDouble * y.getFloat(i).toDouble; i += 1 }
      case _ =>
        while (i < n) { acc += x.getDouble(i) * y.getDouble(i); i += 1 }
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val getter = elemType match {
      case FloatType => "getFloat"
      case _ => "getDouble"
    }
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += (double) $a.$getter($i) * (double) $b.$getter($i);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): ArrayDot = copy(left = l, right = r)
}
