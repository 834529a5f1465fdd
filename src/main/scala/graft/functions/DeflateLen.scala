package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native zlib-deflate length of a string's UTF-8 bytes — the
  * compression-ratio quality proxy LLM-curation pipelines use
  * (boilerplate/templated text compresses far below prose; ratio
  * deflate_len/raw_len near 0 flags machine-generated repetition).
  *
  * Deflate with a FIXED level and strategy is deterministic for a given
  * zlib implementation, and the JRE bundles zlib on every platform the
  * engine runs on — executors across a cluster agree. It is NOT
  * cross-engine portable (DuckDB exposes no deflate), so operators built
  * on it are spec-verified rather than oracle-checked.
  *
  * A Catalyst expression rather than a UDF for the same reason as
  * [[RollingHash31]]: one static call inside WholeStageCodegen, no
  * closure serialization, no per-row encoder round-trip. One Deflater per
  * executor thread (ThreadLocal, `reset()` between rows, never end()'d):
  * native memory is bounded at one 32 KiB zlib window per pool thread for
  * the executor's lifetime, instead of a per-row deflateInit/end churn —
  * see the companion's field comment for the rationale.
  *
  * Null in ⇒ null out; empty string ⇒ the 8-byte empty deflate stream.
  */
case class DeflateLen(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other =>
      TypeCheckResult.TypeCheckFailure(s"graft_deflate_len requires string, got ${other.simpleString}")
  }

  override def dataType: DataType = IntegerType

  override def prettyName: String = "graft_deflate_len"

  override protected def nullSafeEval(input: Any): Any =
    DeflateLen.deflatedLength(input.asInstanceOf[UTF8String].getBytes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.DeflateLen.deflatedLength($c.getBytes())")

  override protected def withNewChildInternal(newChild: Expression): DeflateLen =
    copy(child = newChild)
}

object DeflateLen {
  /** Fixed level 6 (zlib default) — part of the function's contract; a
    * level change would shift every stored score.
    */
  final val Level = 6

  // One native Deflater per executor task thread, reset() between rows:
  // per-row construction would pay JNI deflateInit + a 32 KiB native
  // window allocation per document — dominating the actual compression
  // cost for short strings. Thread-local lifetime is the executor
  // thread's; zlib native memory is bounded by the thread-pool size.
  private val local = new ThreadLocal[(java.util.zip.Deflater, Array[Byte])] {
    override def initialValue() =
      (new java.util.zip.Deflater(Level, /* nowrap = */ false), new Array[Byte](8192))
  }

  def deflatedLength(bytes: Array[Byte]): Int = {
    val (d, buf) = local.get()
    d.reset()
    d.setInput(bytes)
    d.finish()
    var total = 0
    while (!d.finished()) total += d.deflate(buf)
    total
  }
}
