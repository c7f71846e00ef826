package graft.functions

import org.apache.spark.sql.{Column, GraftSqlShims}
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.DeclarativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types._

/** Compensated floating-point SUM (Kahan–Babuška–Neumaier): the
  * aggregation buffer carries a running compensation term alongside the
  * sum, so the result is within ~1 ulp of the true sum REGARDLESS of
  * partitioning or merge order — where a plain double sum's error grows
  * with row count and drifts run-to-run with partial-aggregation order
  * (the q10 sf1 3.2e11 sum was the observed case: last-ulp drift against
  * the oracle at 6M rows). The dialect's `sum` maps float/double columns
  * here; integral columns keep the native exact sum.
  *
  * Declarative shape: three fixed-width buffer slots (sum, compensation,
  * emptiness), so the aggregate runs inside HashAggregate with full
  * map-side partial combine and whole-stage codegen — the same plan
  * shape as the native Sum, one fma-class flop wider per row.
  *
  * Each update two-sums the incoming value into (s, c): t = s + x;
  * c += (|s| >= |x|) ? (s - t) + x : (x - t) + s — the Neumaier branch
  * keeps the correction exact even when |x| > |s|. Merges two-sum the
  * partial sums the same way and add the compensations. Non-finite
  * inputs degrade exactly like the native sum (NaN/±Inf propagate; the
  * evaluate guard returns the raw sum there, since compensation terms
  * become NaN under infinities where plain summation would still report
  * ±Inf). Null semantics match native sum: nulls are skipped, an
  * all-null (or empty) group yields null.
  */
case class KahanSumExpr(child: Expression)
    extends DeclarativeAggregate with UnaryLike[Expression] {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "kahan_sum"

  private lazy val s = AttributeReference("s", DoubleType, nullable = false)()
  private lazy val c = AttributeReference("c", DoubleType, nullable = false)()
  private lazy val empty = AttributeReference("empty", BooleanType, nullable = false)()

  override lazy val aggBufferAttributes: Seq[AttributeReference] = Seq(s, c, empty)

  override lazy val initialValues: Seq[Expression] =
    Seq(Literal(0.0), Literal(0.0), Literal(true))

  /** (t, c') of two-summing `x` into `(sl, comp)`. */
  private def twoSum(sl: Expression, x: Expression,
                     comp: Expression): (Expression, Expression) = {
    val t = Add(sl, x)
    val corr = If(GreaterThanOrEqual(Abs(sl), Abs(x)),
      Add(Subtract(sl, t), x),
      Add(Subtract(x, t), sl))
    (t, Add(comp, corr))
  }

  override lazy val updateExpressions: Seq[Expression] = {
    val (t, c2) = twoSum(s, child, c)
    Seq(
      If(IsNull(child), s, t),
      If(IsNull(child), c, c2),
      And(empty, IsNull(child)))
  }

  override lazy val mergeExpressions: Seq[Expression] = {
    val (t, c2) = twoSum(s.left, s.right, Add(c.left, c.right))
    Seq(t, c2, And(empty.left, empty.right))
  }

  override lazy val evaluateExpression: Expression = {
    val nonFinite = Or(IsNaN(s),
      Or(EqualTo(s, Literal(Double.PositiveInfinity)),
        EqualTo(s, Literal(Double.NegativeInfinity))))
    If(empty, Literal(null, DoubleType), If(nonFinite, s, Add(s, c)))
  }

  override protected def withNewChildInternal(newChild: Expression): KahanSumExpr =
    copy(child = newChild)
}

object KahanSumExpr {
  /** `sum(col)` with compensation; the input is cast to double first
    * (float widens exactly), matching the native sum's double result
    * type on fractional inputs. */
  def column(col: Column): Column =
    GraftSqlShims.column(
      KahanSumExpr(Cast(GraftSqlShims.expression(col), DoubleType))
        .toAggregateExpression())
}
