package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType}

/** Native argmax-cosine over a literal centroid MATRIX: returns the
  * 0-based row index of the `array<array<double>>` right argument whose
  * cosine with the left `array<double>` vector is LARGEST, under Spark's
  * double ordering (NaN greatest, ±0.0 equal), ties → lowest index.
  *
  * Why (the `graft_sqdist` / PQ encode lesson, round 14): rank-1 cell
  * assignment previously built a k-element array of (cos, cid) structs
  * per row and `array_sort`-ed it with a LAMBDA comparator — at the
  * SemDeDup operating point k ≈ √N that is ~k·log k INTERPRETED
  * comparator evaluations and a k-struct allocation PER CORPUS ROW
  * (measured: 112 s of the ×100 `q_semantic_dedup_auto` wall at k = 448,
  * nearly all assignment). This expression runs the whole scan-and-argmax
  * as one compiled loop inside WholeStageCodegen: k fused
  * cosine-and-compare passes, zero allocation.
  *
  * Bit-exactness: the per-centroid cosine is the IDENTICAL accumulation
  * sequence as [[CosineSimD]] (`ab`/`aa`/`bb` interleaved over the common
  * prefix, then norm tails), and the comparison is Spark's
  * `SQLOrderingUtil.compareDoubles` contract (`x == y` short-circuit
  * makes ±0.0 equal; `Double.compare` puts NaN above everything), so the
  * selected index — and every downstream cell id, join key, and oracle
  * hash — matches the sorted-struct form it replaces (pinned in
  * GraftFunctionsSpec and by the unchanged q_semantic_dedup oracles).
  *
  * Null handling: null vector or null matrix ⇒ null (BinaryExpression
  * default); rows and elements assumed non-null (plan literals). An
  * EMPTY matrix returns -1 — callers require k ≥ 1.
  */
case class ArgmaxCosD(left: Expression, right: Expression) extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val okLeft = left.dataType match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    }
    val okRight = right.dataType match {
      case ArrayType(ArrayType(DoubleType, _), _) => true
      case _ => false
    }
    if (okLeft && okRight) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_argmax_cos requires (array<double>, array<array<double>>), got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }

  override def dataType: DataType = IntegerType

  override def prettyName: String = "graft_argmax_cos"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val v = a.asInstanceOf[ArrayData]
    val m = b.asInstanceOf[ArrayData]
    val nv = v.numElements()
    var bestIdx = -1
    var best = 0.0
    var k = 0
    val rows = m.numElements()
    while (k < rows) {
      val c = m.getArray(k)
      val nc = c.numElements()
      val n = math.min(nv, nc)
      var ab = 0.0; var aa = 0.0; var bb = 0.0
      var i = 0
      while (i < n) {
        val xi = v.getDouble(i); val yi = c.getDouble(i)
        ab += xi * yi; aa += xi * xi; bb += yi * yi
        i += 1
      }
      var j = n
      while (j < nv) { val xi = v.getDouble(j); aa += xi * xi; j += 1 }
      j = n
      while (j < nc) { val yi = c.getDouble(j); bb += yi * yi; j += 1 }
      val cos = ab / (math.sqrt(aa) * math.sqrt(bb))
      // Spark double ordering: == short-circuit (±0.0 equal, keep first),
      // Double.compare (NaN greatest) otherwise
      if (bestIdx < 0 || (!(cos == best) && java.lang.Double.compare(cos, best) > 0)) {
        best = cos; bestIdx = k
      }
      k += 1
    }
    bestIdx
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val nv = ctx.freshName("nv")
      val rows = ctx.freshName("rows")
      val k = ctx.freshName("k")
      val c = ctx.freshName("c")
      val nc = ctx.freshName("nc")
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val ab = ctx.freshName("ab")
      val aa = ctx.freshName("aa")
      val bb = ctx.freshName("bb")
      val xi = ctx.freshName("xi")
      val yi = ctx.freshName("yi")
      val cos = ctx.freshName("cos")
      val best = ctx.freshName("best")
      val bestIdx = ctx.freshName("bestIdx")
      s"""
         |int $nv = $a.numElements();
         |int $rows = $b.numElements();
         |int $bestIdx = -1;
         |double $best = 0.0;
         |for (int $k = 0; $k < $rows; $k++) {
         |  org.apache.spark.sql.catalyst.util.ArrayData $c = $b.getArray($k);
         |  int $nc = $c.numElements();
         |  int $n = java.lang.Math.min($nv, $nc);
         |  double $ab = 0.0; double $aa = 0.0; double $bb = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    double $xi = $a.getDouble($i);
         |    double $yi = $c.getDouble($i);
         |    $ab += $xi * $yi; $aa += $xi * $xi; $bb += $yi * $yi;
         |  }
         |  for (int $j = $n; $j < $nv; $j++) { double $xi = $a.getDouble($j); $aa += $xi * $xi; }
         |  for (int $j = $n; $j < $nc; $j++) { double $yi = $c.getDouble($j); $bb += $yi * $yi; }
         |  double $cos = $ab / (java.lang.Math.sqrt($aa) * java.lang.Math.sqrt($bb));
         |  if ($bestIdx < 0 ||
         |      (!($cos == $best) && java.lang.Double.compare($cos, $best) > 0)) {
         |    $best = $cos; $bestIdx = $k;
         |  }
         |}
         |${ev.value} = $bestIdx;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression)
      : ArgmaxCosD = copy(left = newLeft, right = newRight)
}
