package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, QuaternaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Native codegen product-quantization encoder —
  * `graft_pq_encode(vec, cbFlat, cnorm2s, numSubspaces)` → `array<bigint>`
  * of per-subspace code indices (the FAISS
  * `ProductQuantizer::compute_code` kernel as a Catalyst expression).
  *
  * `cbFlat` is the FOLDABLE flattened codebook `[m][k][i]` (M·K·SubDim
  * doubles) and `cnorm2s` the foldable per-centroid self-dots `[m][k]`
  * (M·K doubles); both are evaluated ONCE at plan build into reference
  * arrays — per row the generated code runs the bare argmin loops, ~M·K·
  * SubDim fused multiply-adds, with no array allocation besides the M-code
  * result.
  *
  * Why an expression and not `array_position(dists, array_min(dists))`
  * over a generated distance array: that form inlines the K dot-product
  * expansions TWICE (once per aggregate), blowing whole-stage codegen past
  * the JVM's 64 KB method limit at K = 16 and falling back to interpreted
  * evaluation — the exact failure mode the guide's "codegen-friendly"
  * rule is about. Here the loop is data, not code: generated size is
  * constant in M and K.
  *
  * The argmin rank key is ‖c‖² − 2⟨x_m, c⟩ (the ‖x_m‖² term is constant
  * within a subspace's argmin), accumulated in ascending-index order so the
  * key is bit-identical with the oracle's `cnorm2 − 2·list_reduce(...)`;
  * ties keep the LOWEST code index (strict `<` update), matching
  * `row_number() ORDER BY (dist, k)`.
  *
  * The subspace count M is an EXPLICIT foldable argument: deriving it per
  * row from the vector length would let a malformed vector whose length
  * happens to divide the flattened shapes (e.g. 32 elements against an
  * 8×64×8 codebook: m=4, k=128) silently argmin across a misinterpreted
  * codebook grid and emit out-of-range codes. With M pinned, K =
  * cnorm2s.length / M and SubDim = cbFlat.length / cnorm2s.length are
  * codebook properties, and any vector whose length ≠ M·SubDim (or a null
  * vector) yields NULL.
  */
case class PqEncode(vec: Expression, cbFlat: Expression, cnorm2s: Expression,
    numSubspaces: Expression) extends QuaternaryExpression {

  override def first: Expression = vec
  override def second: Expression = cbFlat
  override def third: Expression = cnorm2s
  override def fourth: Expression = numSubspaces

  override def prettyName: String = "graft_pq_encode"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = {
    def arr(e: Expression) = e.dataType match {
      case ArrayType(FloatType | DoubleType, _) => true
      case _ => false
    }
    if (!arr(vec) || !arr(cbFlat) || !arr(cnorm2s))
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires array<float|double> inputs")
    else if (!cbFlat.foldable || !cnorm2s.foldable || !numSubspaces.foldable)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName: codebook arguments must be foldable literals")
    else if (numSubspaces.dataType != IntegerType)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName: numSubspaces must be an INT literal")
    else TypeCheckResult.TypeCheckSuccess
  }

  private def toDoubles(e: Expression): Array[Double] = {
    val a = e.eval(null).asInstanceOf[ArrayData]
    e.dataType.asInstanceOf[ArrayType].elementType match {
      case FloatType => a.toFloatArray().map(_.toDouble)
      case _ => a.toDoubleArray()
    }
  }

  /** Codebook constants, folded once per plan (both eval paths share them). */
  @transient private lazy val cb: Array[Double] = toDoubles(cbFlat)
  @transient private lazy val cn2: Array[Double] = toDoubles(cnorm2s)
  /** Pinned subspace count M (the fourth foldable argument). */
  @transient private lazy val mSub: Int =
    numSubspaces.eval(null).asInstanceOf[Int]
  /** SubDim from the flattened shapes: cbFlat = M·K·SubDim, cnorm2s = M·K. */
  @transient private lazy val subDim: Int =
    if (cn2.length == 0) 0 else cb.length / cn2.length
  /** Expected vector length under the pinned shape. */
  @transient private lazy val expectLen: Int = mSub * subDim

  private def vecIsFloat: Boolean =
    vec.dataType.asInstanceOf[ArrayType].elementType == FloatType

  /** Shared argmin kernel over a materialized double vector. */
  private def encode(x: Array[Double]): Any = {
    if (subDim == 0 || mSub == 0 || x.length != expectLen) return null
    if (cn2.length % mSub != 0) return null
    val m = mSub
    val k = cn2.length / m
    val out = new Array[Long](m)
    var mi = 0
    while (mi < m) {
      var best = 0
      var bestKey = Double.PositiveInfinity
      var ki = 0
      while (ki < k) {
        var acc = 0.0
        var i = 0
        val cOff = (mi * k + ki) * subDim
        val xOff = mi * subDim
        while (i < subDim) { acc += x(xOff + i) * cb(cOff + i); i += 1 }
        val key = cn2(mi * k + ki) - 2.0 * acc
        if (key < bestKey) { bestKey = key; best = ki }
        ki += 1
      }
      out(mi) = best.toLong
      mi += 1
    }
    new GenericArrayData(out)
  }

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val v = vec.eval(input)
    if (v == null) return null
    val a = v.asInstanceOf[ArrayData]
    val n = a.numElements()
    val x = new Array[Double](n)
    var i = 0
    val f = vecIsFloat
    while (i < n) {
      if (a.isNullAt(i)) return null
      x(i) = if (f) a.getFloat(i).toDouble else a.getDouble(i)
      i += 1
    }
    encode(x)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, _, _, _) => {
      val cbRef = ctx.addReferenceObj("pqCb", cb, "double[]")
      val cn2Ref = ctx.addReferenceObj("pqCn2", cn2, "double[]")
      val n = ctx.freshName("n")
      val x = ctx.freshName("x")
      val m = ctx.freshName("m")
      val k = ctx.freshName("k")
      val out = ctx.freshName("out")
      val mi = ctx.freshName("mi")
      val ki = ctx.freshName("ki")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      val key = ctx.freshName("key")
      val best = ctx.freshName("best")
      val bestKey = ctx.freshName("bestKey")
      val bad = ctx.freshName("bad")
      val get = if (vecIsFloat) "getFloat" else "getDouble"
      s"""
         |int $n = $a.numElements();
         |boolean $bad = ($subDim == 0) || ($mSub == 0) ||
         |  ($n != $expectLen) || (${cn2.length} % $mSub != 0);
         |int $m = $mSub;
         |double[] $x = new double[$n];
         |for (int $i = 0; !$bad && $i < $n; $i++) {
         |  if ($a.isNullAt($i)) $bad = true;
         |  else $x[$i] = (double) $a.$get($i);
         |}
         |if ($bad) {
         |  ${ev.isNull} = true;
         |} else {
         |  int $k = ${cn2.length} / $m;
         |  long[] $out = new long[$m];
         |  for (int $mi = 0; $mi < $m; $mi++) {
         |    int $best = 0;
         |    double $bestKey = Double.POSITIVE_INFINITY;
         |    for (int $ki = 0; $ki < $k; $ki++) {
         |      double $acc = 0.0;
         |      for (int $i = 0; $i < $subDim; $i++) {
         |        $acc += $x[$mi * $subDim + $i] * $cbRef[($mi * $k + $ki) * $subDim + $i];
         |      }
         |      double $key = $cn2Ref[$mi * $k + $ki] - 2.0 * $acc;
         |      if ($key < $bestKey) { $bestKey = $key; $best = $ki; }
         |    }
         |    $out[$mi] = (long) $best;
         |  }
         |  ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression,
      newFourth: Expression): PqEncode =
    copy(vec = newFirst, cbFlat = newSecond, cnorm2s = newThird,
      numSubspaces = newFourth)
}

object PqEncode {
  def fromChildren(children: Seq[Expression]): PqEncode = {
    require(children.length == 4,
      "graft_pq_encode(vec, cbFlat, cnorm2s, numSubspaces) takes four arguments")
    PqEncode(children.head, children(1), children(2), children(3))
  }
}
