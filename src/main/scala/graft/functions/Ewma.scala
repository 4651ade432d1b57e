package graft.functions

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types._

/** Running exponentially-weighted moving average as a native window
  * function: `ewma_t = α·x_t + (1−α)·ewma_{t−1}`, seeded by the first
  * non-null value (nulls carry the previous state).
  *
  * This is the one indicator family the built-in window aggregates
  * genuinely cannot express — `avg` over a frame is a simple mean, not a
  * recursive smoothing — so it's implemented as an
  * [[AggregateWindowFunction]]: the running frame processes rows in window
  * order and the update is a pure expression tree, so WindowExec evaluates
  * it without leaving codegen'd expression land. Used for Wilder-smoothed
  * RSI (the reference ships Cutler's variant; Wilder is the standard
  * extension).
  *
  * The left-to-right recursive fold is reproduced bit-for-bit by DuckDB's
  * `list_reduce(list(x ORDER BY ...), (acc, x) -> α*x + (1−α)*acc)`.
  */
case class Ewma(child: Expression, alpha: Double)
    extends AggregateWindowFunction with UnaryLike[Expression] {

  override def prettyName: String = "graft_ewma"
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  private lazy val state =
    AttributeReference("ewma_state", DoubleType, nullable = true)()

  override def aggBufferAttributes: Seq[AttributeReference] = Seq(state)

  override val initialValues: Seq[Expression] =
    Seq(Literal.create(null, DoubleType))

  override val updateExpressions: Seq[Expression] = {
    val x = Cast(child, DoubleType)
    Seq(If(IsNull(x), state,
      If(IsNull(state), x,
        Add(Multiply(Literal(alpha), x),
          Multiply(Literal(1.0 - alpha), state)))))
  }

  override val evaluateExpression: Expression = state

  override protected def withNewChildInternal(newChild: Expression): Ewma =
    copy(child = newChild)
}

object Ewma {
  /** Registry builder: `graft_ewma(x, <foldable alpha>)`. */
  def fromChildren(children: Seq[Expression]): Expression = {
    require(children.length == 2, "graft_ewma(x, alpha) takes two arguments")
    val alpha = children(1) match {
      case e if e.foldable => e.eval() match {
        case d: java.lang.Double => d.doubleValue()
        case d: Decimal => d.toDouble
        case other =>
          throw new IllegalArgumentException(s"non-numeric alpha: $other")
      }
      case _ =>
        throw new IllegalArgumentException("alpha must be a literal")
    }
    Ewma(children.head, alpha)
  }
}
