package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.dsl.expressions._
import org.apache.spark.sql.catalyst.expressions.{Expression, If, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.CentralMomentAgg
import org.apache.spark.sql.types.DoubleType

/** The reference's `skewness`/`kurtosis` over Spark's own central-moment
  * machinery (CentralMomentsAggregation.java:55-86):
  *
  *  - skewness = sqrt(n) * m3 / m2^1.5 — the POPULATION formula Spark
  *    also uses, but the reference returns NULL for n < 3 where Spark
  *    computes a value at n = 2, and returns NaN on zero variance where
  *    modern Spark returns NULL (the raw Java division).
  *  - kurtosis = (n-1)n(n+1)/((n-2)(n-3)) * m4/m2² − 3(n−1)²/((n−2)(n−3))
  *    — SAMPLE-bias-corrected excess kurtosis (G2), NULL for n < 4.
  *    Spark's builtin is the POPULATION excess (n·m4/m2² − 3): the two
  *    disagree on EVERY input, by ~6/n for large n and grossly for
  *    small groups — a silent wrong answer for any ported query
  *    (round-12 find via the name-collision audit).
  *
  * Wired at the parser seam (PrestoCallConventions) so SQL text gets
  * the reference definitions while functions.skewness/kurtosis keep
  * Spark's, mirroring the log/trim treatment. Lives in this package to
  * subclass CentralMomentAgg (same precedent as ReduceAgg).
  */
case class PrestoSkewness(child: Expression)
    extends CentralMomentAgg(child, nullOnDivideByZero = false) {

  override protected def momentOrder: Int = 3
  override def prettyName: String = "skewness"

  override val evaluateExpression: Expression = {
    If(n < Literal(3.0),
      Literal.create(null, DoubleType),
      sqrt(n) * m3 / sqrt(m2 * m2 * m2))
  }

  override protected def withNewChildInternal(newChild: Expression): PrestoSkewness =
    copy(child = newChild)
}

case class PrestoKurtosis(child: Expression)
    extends CentralMomentAgg(child, nullOnDivideByZero = false) {

  override protected def momentOrder: Int = 4
  override def prettyName: String = "kurtosis"

  override val evaluateExpression: Expression = {
    If(n < Literal(4.0),
      Literal.create(null, DoubleType),
      (n - Literal(1.0)) * n * (n + Literal(1.0)) /
        ((n - Literal(2.0)) * (n - Literal(3.0))) * m4 / (m2 * m2) -
        Literal(3.0) * (n - Literal(1.0)) * (n - Literal(1.0)) /
        ((n - Literal(2.0)) * (n - Literal(3.0))))
  }

  override protected def withNewChildInternal(newChild: Expression): PrestoKurtosis =
    copy(child = newChild)
}
