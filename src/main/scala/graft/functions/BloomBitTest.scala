package graft.functions

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BooleanType, DataType, LongType}

/** Bit-membership probe over a BROADCAST word array: `true` iff bit
  * `child` (a bit position in [0, 64·words)) is set.
  *
  * The scale rationale: [[graft.ext.Bloom.mightContain]] embeds the word
  * array as a plan literal, which is fine at kilobyte filter sizes but
  * bloats every generated code fragment (and every plan string, and every
  * task binary) once a decontamination filter reaches 2²⁰+ bits. Here the
  * words travel ONCE per executor as a `Broadcast[Array[Long]]`; the
  * expression carries only the reference, and both the interpreted and the
  * generated paths read `.value` — resolved locally after the first
  * access. Plan size is therefore flat in the filter size (asserted in
  * BloomSpec).
  *
  * Not SQL-registered: a broadcast handle cannot be spelled as a literal
  * argument, so this expression is constructed only through
  * [[graft.ext.Bloom.broadcastFilter]].
  */
case class BloomBitTest(child: Expression, words: Broadcast[Array[Long]])
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case other =>
      TypeCheckResult.TypeCheckFailure(s"bloom_bit_test requires bigint, got ${other.simpleString}")
  }

  override def dataType: DataType = BooleanType

  override def prettyName: String = "bloom_bit_test"

  override protected def nullSafeEval(input: Any): Any = {
    val p = input.asInstanceOf[Long]
    ((words.value((p >>> 6).toInt) >>> (p & 63L).toInt) & 1L) == 1L
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // one reference object per expression instance; the array itself is
    // fetched from the broadcast at first use on each executor
    val ref = ctx.addReferenceObj("bloomWords", words,
      classOf[Broadcast[Array[Long]]].getName)
    defineCodeGen(ctx, ev, p =>
      s"((((long[])$ref.value())[(int)($p >>> 6)] >>> (int)($p & 63L)) & 1L) == 1L")
  }

  override protected def withNewChildInternal(newChild: Expression): BloomBitTest =
    copy(child = newChild)
}
