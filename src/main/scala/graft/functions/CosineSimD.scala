package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Fused native cosine similarity over two `array<double>` columns.
  *
  * Why (SURVEY.md §7.4 tier b): the ANN/near-dup re-rank paths compute
  * `dot(a,b) / (sqrt(dot(a,a)) * sqrt(dot(b,b)))` per candidate pair —
  * three `graft_dot` calls traverse each array three times. This
  * expression keeps all three accumulators in ONE loop, one traversal,
  * inside WholeStageCodegen. On a 100 TB re-rank of millions of
  * candidates the memory traffic drops 3×.
  *
  * Bit-exactness: each accumulator folds left-to-right from 0.0 exactly
  * like the three separate dots it replaces — `ab` over the common prefix
  * (the composed `graft_dot(a,b)` bound), `aa`/`bb` over EACH array's
  * full length (the composed `graft_dot(a,a)`/`graft_dot(b,b)`) — so
  * `dot/(sqrt*sqrt)` is the same IEEE operation sequence for equal AND
  * unequal lengths, and every declared-query hash is unchanged (pinned
  * by GraftFunctionsSpec and the DuckDB oracles).
  *
  * Null handling mirrors [[DotProductD]]: null array ⇒ null; elements
  * assumed non-null. A zero-norm side yields the IEEE result of x/0.0
  * (NaN or ±Infinity), identical to the composed form.
  */
case class CosineSimD(left: Expression, right: Expression) extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_cos requires (array<double>, array<double>), got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }

  override def dataType: DataType = DoubleType

  override def prettyName: String = "graft_cos"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val nx = x.numElements()
    val ny = y.numElements()
    val n = math.min(nx, ny)
    var ab = 0.0
    var aa = 0.0
    var bb = 0.0
    var i = 0
    while (i < n) {
      val xi = x.getDouble(i)
      val yi = y.getDouble(i)
      ab += xi * yi; aa += xi * xi; bb += yi * yi
      i += 1
    }
    // norm tails: the composed form sums each array's FULL length
    var j = n
    while (j < nx) { val xi = x.getDouble(j); aa += xi * xi; j += 1 }
    j = n
    while (j < ny) { val yi = y.getDouble(j); bb += yi * yi; j += 1 }
    ab / (math.sqrt(aa) * math.sqrt(bb))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val ab = ctx.freshName("ab")
      val aa = ctx.freshName("aa")
      val bb = ctx.freshName("bb")
      val xi = ctx.freshName("xi")
      val yi = ctx.freshName("yi")
      val nx = ctx.freshName("nx")
      val ny = ctx.freshName("ny")
      val j = ctx.freshName("j")
      s"""
         |int $nx = $a.numElements();
         |int $ny = $b.numElements();
         |int $n = java.lang.Math.min($nx, $ny);
         |double $ab = 0.0; double $aa = 0.0; double $bb = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $xi = $a.getDouble($i);
         |  double $yi = $b.getDouble($i);
         |  $ab += $xi * $yi; $aa += $xi * $xi; $bb += $yi * $yi;
         |}
         |for (int $j = $n; $j < $nx; $j++) { double $xi = $a.getDouble($j); $aa += $xi * $xi; }
         |for (int $j = $n; $j < $ny; $j++) { double $yi = $b.getDouble($j); $bb += $yi * $yi; }
         |${ev.value} = $ab / (java.lang.Math.sqrt($aa) * java.lang.Math.sqrt($bb));
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression)
      : CosineSimD = copy(left = newLeft, right = newRight)
}
