package graft.functions

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}
import org.apache.spark.sql.SparkSession

/** Native Catalyst expression: dot product of two double arrays.
  *
  * This is the preferred extension path for hot-loop scalar math
  * (SURVEY.md §7.3): a codegen'd `Expression` stays inside
  * WholeStageCodegen — one primitive `for` loop over the unsafe array
  * data, no per-element lambda dispatch (`zip_with` + `aggregate`
  * allocate a HigherOrderFunction frame per element) and no UDF
  * serialization boundary. Used by the similarity operators as the
  * single-pass scoring kernel.
  *
  * Shorter input decides the length (zip semantics); null input →
  * null; elements are assumed non-null (embedding vectors).
  */
case class ArrayDot(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_dot"

  private def elem(e: Expression): Option[DataType] = e.dataType match {
    case ArrayType(t @ (DoubleType | FloatType), _) => Some(t)
    case _ => None
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (elem(left).isDefined && elem(right).isDefined) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<double>/array<float> inputs, " +
        s"got ${left.dataType.sql} and ${right.dataType.sql}")

  private def get(x: ArrayData, side: Expression, i: Int): Double =
    if (elem(side).contains(FloatType)) x.getFloat(i).toDouble else x.getDouble(i)

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) { s += get(x, left, i) * get(y, right, i); i += 1 }
    s
  }

  private def genGet(arr: String, side: Expression, i: String): String =
    if (elem(side).contains(FloatType)) s"(double) $arr.getFloat($i)"
    else s"$arr.getDouble($i)"

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      s"""
         |final int $n = Math.min($x.numElements(), $y.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += ${genGet(x, left, i)} * ${genGet(y, right, i)};
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ArrayDot =
    copy(left = newLeft, right = newRight)
}

object ArrayDot {

  /** Idempotently register `graft_dot` in a session's function registry
    * (for sessions not built via [[GraftExtensions]]).
    */
  def register(spark: SparkSession): Unit = {
    val id = FunctionIdentifier("graft_dot")
    if (!spark.sessionState.functionRegistry.functionExists(id)) {
      spark.sessionState.functionRegistry.registerFunction(
        id,
        new ExpressionInfo(classOf[ArrayDot].getName, "graft_dot"),
        (children: Seq[Expression]) => ArrayDot(children.head, children(1)))
    }
  }
}

/** `SparkSessionExtensions` hook: enable with
  * `spark.sql.extensions=graft.functions.GraftExtensions` to get the
  * native functions in every session of a cluster.
  */
class GraftExtensions extends (org.apache.spark.sql.SparkSessionExtensions => Unit) {
  override def apply(ext: org.apache.spark.sql.SparkSessionExtensions): Unit = {
    ext.injectFunction(
      (FunctionIdentifier("graft_dot"),
        new ExpressionInfo(classOf[ArrayDot].getName, "graft_dot"),
        (children: Seq[Expression]) => ArrayDot(children.head, children(1))))
    ext.injectFunction(TopKAgg.info)
    // plans the row_number-filter top-k idiom as a bounded aggregate
    ext.injectOptimizerRule(_ => graft.plans.TopKRewrite)
    // plans the AsOfJoin logical node as the streaming-merge exec
    ext.injectPlannerStrategy(_ => graft.plans.AsOfJoinStrategy)
  }
}
