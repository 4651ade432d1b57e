package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native codegen dot product over two numeric arrays — the hot kernel of
  * every embedding operator (cosine dedup, ANN search, sign-LSH
  * projections).
  *
  * Semantically identical to
  * `aggregate(zip_with(a, b, (x, y) -> double(x) * double(y)), 0d, +)` —
  * same left-to-right FP accumulation order, so results stay bit-identical
  * with the DuckDB oracle's `list_reduce` mirror — but those higher-order
  * functions evaluate INTERPRETED, one boxed lambda call per element;
  * measured ~20 s for 2M pairs × 64 dims at sf0.1. This expression compiles
  * to a tight primitive loop inside whole-stage codegen.
  *
  * Mismatched lengths or a null element yield NULL (zip_with pads the
  * shorter side with nulls, nulling the fold — replicated exactly).
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def prettyName: String = "graft_dot"
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(e: Expression) = e.dataType match {
      case ArrayType(FloatType | DoubleType, _) => true
      case _ => false
    }
    if (ok(left) && ok(right)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float|double> inputs, " +
        s"got ${left.dataType.simpleString} and ${right.dataType.simpleString}")
  }

  private def isFloat(e: Expression): Boolean =
    e.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = a.numElements()
    if (n != b.numElements()) return null
    val (af, bf) = (isFloat(left), isFloat(right))
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val x = if (af) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (bf) b.getFloat(i).toDouble else b.getDouble(i)
      acc += x * y
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      val bad = ctx.freshName("bad")
      val getA = if (isFloat(left)) "getFloat" else "getDouble"
      val getB = if (isFloat(right)) "getFloat" else "getDouble"
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $acc = 0.0;
         |  boolean $bad = false;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { $bad = true; break; }
         |    $acc += (double) $a.$getA($i) * (double) $b.$getB($i);
         |  }
         |  if ($bad) ${ev.isNull} = true; else ${ev.value} = $acc;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

/** Session extension registering `graft_dot` (enable via
  * `spark.sql.extensions=graft.functions.GraftExtensions`) — the public
  * `SparkSessionExtensions` injection point, so the function resolves in
  * `expr()`/SQL text without touching Spark internals.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[DotProduct].getName, "graft_dot"),
      (children: Seq[Expression]) => DotProduct(children.head, children(1))))
    ext.injectFunction((
      new FunctionIdentifier("graft_ewma"),
      new ExpressionInfo(classOf[Ewma].getName, "graft_ewma"),
      Ewma.fromChildren _))
    ext.injectFunction((
      new FunctionIdentifier("graft_pq_encode"),
      new ExpressionInfo(classOf[PqEncode].getName, "graft_pq_encode"),
      PqEncode.fromChildren _))
    ext.injectFunction((
      new FunctionIdentifier("graft_subword_count"),
      new ExpressionInfo(classOf[SubwordCount].getName, "graft_subword_count"),
      SubwordCount.fromChildren _))
    ext.injectFunction((
      new FunctionIdentifier("graft_subword_ids"),
      new ExpressionInfo(classOf[SubwordIds].getName, "graft_subword_ids"),
      SubwordIds.fromChildren _))
  }
}
