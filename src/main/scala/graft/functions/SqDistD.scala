package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native codegen'd squared L2 distance over two `array<double>` columns —
  * the PQ-family hot loop (sub-centroid distances run m·k times per corpus
  * row in the encode and per query in the LUT build).
  *
  * Why not compose from [[DotProductD]] (‖x‖²−2x·c+‖c‖²): that identity
  * does NOT hold bitwise in IEEE arithmetic, and the DuckDB oracles mirror
  * the sequential Σ(xᵢ−cᵢ)² fold — this expression keeps the exact fold
  * order (acc += d·d ascending), so results are bit-identical to both the
  * `aggregate`-HOF reference form and the oracle. And why not unroll to
  * plan-time literal terms: an m·k·subDim-term expression tree costs
  * seconds of planning/codegen per query invocation (measured 1.4 → 5.2 s
  * on `q_ivfpq_adc` at sf0.1 — the same lesson as [[RollingHash31]]'s
  * scaladoc and the `lshBucket` literal-sum note).
  *
  * Null handling: null array ⇒ null (standard binary null-safety);
  * elements assumed non-null; the shorter length bounds the loop, same
  * contract as [[DotProductD]].
  */
case class SqDistD(left: Expression, right: Expression) extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_sqdist requires (array<double>, array<double>), got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }

  override def dataType: DataType = DoubleType

  override def prettyName: String = "graft_sqdist"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      val d = x.getDouble(i) - y.getDouble(i)
      acc += d * d
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      val d = ctx.freshName("d")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $d = $a.getDouble($i) - $b.getDouble($i);
         |  $acc += $d * $d;
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression)
      : SqDistD = copy(left = newLeft, right = newRight)
}
