package graft.functions

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Registration of graft's native Catalyst expressions.
  *
  * Two paths, same builders:
  *  - [[register]]: imperative, idempotent — call on any SparkSession
  *    (what the declared queries use);
  *  - [[GraftSparkExtensions]]: `spark.sql.extensions=graft.functions.GraftSparkExtensions`
  *    for cluster-wide installation at session build.
  *
  * After registration the functions are usable from SQL
  * (`SELECT graft_dot(a, b)`) and the Column API
  * (`call_function("graft_dot", a, b)`).
  */
object GraftFunctions {

  private[functions] val functions: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] =
    Seq(
      (
        FunctionIdentifier("graft_dot"),
        new ExpressionInfo(classOf[DotProductD].getName, "graft_dot"),
        (args: Seq[Expression]) => {
          require(args.length == 2, "graft_dot(arrayA, arrayB) takes 2 arguments")
          DotProductD(args.head, args(1))
        }),
      (
        FunctionIdentifier("graft_cos"),
        new ExpressionInfo(classOf[CosineSimD].getName, "graft_cos"),
        (args: Seq[Expression]) => {
          require(args.length == 2, "graft_cos(arrayA, arrayB) takes 2 arguments")
          CosineSimD(args.head, args(1))
        }),
      (
        FunctionIdentifier("graft_sqdist"),
        new ExpressionInfo(classOf[SqDistD].getName, "graft_sqdist"),
        (args: Seq[Expression]) => {
          require(args.length == 2, "graft_sqdist(arrayA, arrayB) takes 2 arguments")
          SqDistD(args.head, args(1))
        }),
      (
        FunctionIdentifier("graft_argmax_cos"),
        new ExpressionInfo(classOf[ArgmaxCosD].getName, "graft_argmax_cos"),
        (args: Seq[Expression]) => {
          require(args.length == 2,
            "graft_argmax_cos(vec, centroidMatrix) takes 2 arguments")
          ArgmaxCosD(args.head, args(1))
        }),
      (
        FunctionIdentifier("graft_rollhash"),
        new ExpressionInfo(classOf[RollingHash31].getName, "graft_rollhash"),
        (args: Seq[Expression]) => {
          require(args.length == 1, "graft_rollhash(str) takes 1 argument")
          RollingHash31(args.head)
        }),
      (
        FunctionIdentifier("graft_deflate_len"),
        new ExpressionInfo(classOf[DeflateLen].getName, "graft_deflate_len"),
        (args: Seq[Expression]) => {
          require(args.length == 1, "graft_deflate_len(str) takes 1 argument")
          DeflateLen(args.head)
        }),
      (
        FunctionIdentifier("graft_topk"),
        new ExpressionInfo(classOf[SpaceSavingTopK].getName, "graft_topk"),
        (args: Seq[Expression]) => {
          require(args.length == 2 || args.length == 3,
            "graft_topk(str, k[, cap]) takes 2 or 3 arguments")
          def intLit(e: Expression, what: String): Int = e match {
            case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
            case other => throw new IllegalArgumentException(
              s"graft_topk $what must be an integer literal, got $other")
          }
          val k = intLit(args(1), "k")
          val cap = if (args.length == 3) intLit(args(2), "cap") else 8 * k
          SpaceSavingTopK(args.head, k, cap).toAggregateExpression()
        }),
      (
        FunctionIdentifier("graft_topk_w"),
        new ExpressionInfo(classOf[SpaceSavingTopKWeighted].getName, "graft_topk_w"),
        (args: Seq[Expression]) => {
          require(args.length == 4, "graft_topk_w(str, weight, k, cap) takes 4 arguments")
          def intLit(e: Expression, what: String): Int = e match {
            case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
            case other => throw new IllegalArgumentException(
              s"graft_topk_w $what must be an integer literal, got $other")
          }
          SpaceSavingTopKWeighted(args.head, args(1), intLit(args(2), "k"), intLit(args(3), "cap"))
            .toAggregateExpression()
        }),
      (
        FunctionIdentifier("graft_topk_edges"),
        new ExpressionInfo(classOf[TopKEdges].getName, "graft_topk_edges"),
        (args: Seq[Expression]) => {
          require(args.length == 3, "graft_topk_edges(id, score, k) takes 3 arguments")
          val k = args(2) match {
            case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
            case other => throw new IllegalArgumentException(
              s"graft_topk_edges k must be an integer literal, got $other")
          }
          TopKEdges(args.head, args(1), k).toAggregateExpression()
        }))

  /** Idempotent imperative registration on an existing session. */
  def register(spark: SparkSession): Unit =
    functions.foreach { case (ident, info, builder) =>
      spark.sessionState.functionRegistry.registerFunction(ident, info, builder)
    }
}

/** `spark.sql.extensions` entry point. */
class GraftSparkExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftFunctions.functions.foreach(ext.injectFunction)
}
