package graft.plans

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Alias, AttributeReference, NamedExpression}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, Project, UnaryNode}
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.types._

/** Spark→Presto type display names (the inverse direction of
  * GraftSqlParser.translateType) for the DESCRIBE OUTPUT surface.
  */
private[plans] object PrestoTypeNames {
  def displayName(dt: DataType): String = dt match {
    case StringType => "varchar"
    case IntegerType => "integer"
    case LongType => "bigint"
    case ShortType => "smallint"
    case ByteType => "tinyint"
    case DoubleType => "double"
    case FloatType => "real"
    case BooleanType => "boolean"
    case DateType => "date"
    case TimestampType | TimestampNTZType => "timestamp"
    case BinaryType => "varbinary"
    case NullType => "unknown"
    case d: DecimalType => s"decimal(${d.precision},${d.scale})"
    case ArrayType(e, _) => s"array(${displayName(e)})"
    case MapType(k, v, _) => s"map(${displayName(k)}, ${displayName(v)})"
    case s: StructType =>
      "row(" + s.fields.map(f => s"${f.name} ${displayName(f.dataType)}").mkString(", ") + ")"
    case other if other.typeName.startsWith("time") => "time"
    case other => other.simpleString
  }

  /** Presto FixedWidthType.getFixedSize for the types that have one;
    * variable-width types report 0 as the reference's rewrite does.
    */
  def fixedSize(dt: DataType): Long = dt match {
    case LongType | DoubleType | TimestampType | TimestampNTZType => 8L
    case IntegerType | DateType | FloatType => 4L
    case ShortType => 2L
    case ByteType | BooleanType => 1L
    case d: DecimalType => if (d.precision <= 18) 8L else 16L
    case _ => 0L
  }
}

/** Presto's `DESCRIBE OUTPUT <stmt>`
  * (sql/rewrite/DescribeOutputRewrite.java): one row per output column
  * of the prepared statement with the reference's exact column set
  * (Column Name / Catalog / Schema / Table / Type / Type Size /
  * Aliased). The statement is ANALYZED, never executed. Origin
  * catalog/schema/table derive from the analyzed attribute's qualifier
  * (empty for computed columns, as in the reference); `?` parameters
  * were bound to NULL at parse time, so their columns type as
  * `unknown` — the reference's display for non-inferable parameters.
  */
case class DescribeOutputCommand(sqlText: String) extends LeafRunnableCommand {

  override val output: Seq[AttributeReference] = Seq(
    AttributeReference("Column Name", StringType, nullable = true)(),
    AttributeReference("Catalog", StringType, nullable = true)(),
    AttributeReference("Schema", StringType, nullable = true)(),
    AttributeReference("Table", StringType, nullable = true)(),
    AttributeReference("Type", StringType, nullable = true)(),
    AttributeReference("Type Size", LongType, nullable = true)(),
    AttributeReference("Aliased", BooleanType, nullable = true)())

  /** The first node carrying the user's select list under purely-unary
    * wrappers (Sort/Limit/Distinct/...) — its Alias-ness is the
    * reference's Field.isAliased. Aggregate statements keep their select
    * list in aggregateExpressions, not a Project (round-8 advice:
    * `SELECT count(*) AS n FROM t` must report n as aliased).
    */
  private def projectOf(p: LogicalPlan): Option[Seq[NamedExpression]] = p match {
    case Project(l, _) => Some(l)
    case a: org.apache.spark.sql.catalyst.plans.logical.Aggregate =>
      Some(a.aggregateExpressions)
    case u: UnaryNode => projectOf(u.child)
    case _ => None
  }

  override def run(spark: SparkSession): Seq[Row] = {
    val analyzed = spark.sql(sqlText).queryExecution.analyzed
    val aliased = projectOf(analyzed) match {
      case Some(l) if l.length == analyzed.output.length =>
        l.map(_.isInstanceOf[Alias])
      case _ => analyzed.output.map(_ => false)
    }
    analyzed.output.zip(aliased).map { case (attr, al) =>
      val q = attr.qualifier
      def at(fromEnd: Int) = if (q.length >= fromEnd) q(q.length - fromEnd) else ""
      Row(attr.name, at(3), at(2), at(1),
        PrestoTypeNames.displayName(attr.dataType),
        PrestoTypeNames.fixedSize(attr.dataType), al)
    }
  }
}

/** Presto's `DESCRIBE INPUT <stmt>`
  * (sql/rewrite/DescribeInputRewrite.java): one (Position, Type) row
  * per `?` parameter, 0-based and ordered; a statement with no
  * parameters yields the reference's single all-NULL row. Types render
  * as `unknown` — the reference's value whenever analysis cannot
  * coerce the parameter, which is the honest answer for every position
  * here since parameters are bound to NULL.
  */
case class DescribeInputCommand(parameterCount: Int) extends LeafRunnableCommand {

  override val output: Seq[AttributeReference] = Seq(
    AttributeReference("Position", LongType, nullable = true)(),
    AttributeReference("Type", StringType, nullable = true)())

  override def run(spark: SparkSession): Seq[Row] =
    if (parameterCount == 0) Seq(Row(null, null))
    else (0 until parameterCount).map(i => Row(i.toLong, "unknown"))
}
