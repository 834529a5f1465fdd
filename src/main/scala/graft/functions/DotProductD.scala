package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native codegen'd dot product over two `array<double>` columns.
  *
  * Why a custom Catalyst Expression (SURVEY.md §7.4 tier b): the engine's
  * similarity scores are expressed as left-fold sums via the `aggregate`
  * higher-order function, which Spark evaluates INTERPRETED (HOF lambdas
  * are CodegenFallback) — every cosine in the top-k/ANN path breaks out of
  * WholeStageCodegen into per-element closure calls. This expression
  * compiles to a tight primitive loop inside the generated code.
  *
  * Semantics are IDENTICAL to the fold it replaces — same left-to-right
  * accumulation order, so scores stay bit-identical to the DuckDB oracle's
  * mirrored `list_reduce` (no oracle changes needed).
  *
  * Null handling: null array ⇒ null result (standard binary null-safety);
  * arrays are assumed element-non-null (embedding vectors — enforced by the
  * parquet schema). Lengths may differ; the shorter bound is used.
  */
case class DotProductD(left: Expression, right: Expression) extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_dot requires (array<double>, array<double>), got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }

  override def dataType: DataType = DoubleType

  override def prettyName: String = "graft_dot"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) { acc += x.getDouble(i) * y.getDouble(i); i += 1 }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += $a.getDouble($i) * $b.getDouble($i);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression)
      : DotProductD = copy(left = newLeft, right = newRight)
}
