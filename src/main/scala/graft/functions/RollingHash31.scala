package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native 31-base polynomial rolling hash mod 1e9+7 over a string's
  * code points — the codegen form of [[graft.ext.TextOps]]'
  * `aggregate(split(s, ""), 0L, (acc, c) => (acc*31 + ascii(c)) % P)`
  * fold. The HOF form materializes a per-character string array and runs
  * the lambda interpreted (CodegenFallback) for every element; this
  * expression is one tight loop inside WholeStageCodegen.
  *
  * Bit-parity with the HOF fold (pinned in GraftFunctionsSpec): Java's
  * regex `split("")` does NOT split inside a surrogate pair (a pair is
  * one regex code point), and `ascii` returns the full code point of its
  * one-element input — so the equivalent loop iterates CODE POINTS, not
  * UTF-16 units (a unit loop diverges on emoji/supplementary-plane
  * text). Null in ⇒ null out; empty string ⇒ 0 (the fold's zero
  * element).
  */
case class RollingHash31(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other =>
      TypeCheckResult.TypeCheckFailure(s"graft_rollhash requires string, got ${other.simpleString}")
  }

  override def dataType: DataType = LongType

  override def prettyName: String = "graft_rollhash"

  override protected def nullSafeEval(input: Any): Any =
    RollingHash31.hash(input.asInstanceOf[UTF8String].toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.RollingHash31.hash($c.toString())")

  override protected def withNewChildInternal(newChild: Expression): RollingHash31 =
    copy(child = newChild)
}

object RollingHash31 {
  final val P = 1000000007L

  /** Shared by interpreted and generated paths — one loop, no per-char
    * allocation (vs the HOF form's one single-char string per element).
    */
  def hash(s: String): Long = {
    var acc = 0L
    var i = 0
    val n = s.length
    while (i < n) {
      val cp = s.codePointAt(i)
      acc = (acc * 31L + cp) % P
      i += Character.charCount(cp)
    }
    acc
  }
}
