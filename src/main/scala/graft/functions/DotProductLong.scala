package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native Catalyst expression: exact dot product of two ARRAY<BIGINT>
  * columns (the quantized-embedding similarity kernel of q26/q27).
  *
  * Why a custom Expression and not `aggregate(zip_with(...))`: Catalyst's
  * higher-order functions evaluate their lambda once per element on the
  * interpreted path — for a 64-dim dot product inside a KNN join that is
  * the innermost loop of the whole query. This expression generates a tight
  * primitive-long loop via doGenCode (and a matching eval for the
  * interpreted path), keeping the join stage inside whole-stage codegen —
  * the (b) rung of the custom-operator ladder (SURVEY §4): an Expression
  * beats a UDF because it codegens and reports nullability/type info to the
  * optimizer.
  *
  * Null semantics: NULL if either array is NULL (BinaryExpression default);
  * the loop runs over min(length) — equal lengths are the CALLER's contract
  * (the RewriteDotProduct rule wraps in its own length guard to preserve
  * the HOF's null-on-mismatch); NULL elements contribute 0, matching
  * `zip_with` x * y with null-skip via coalesce semantics used upstream.
  *
  * `ansi = true` switches the loop to Math.multiplyExact/addExact so a Long
  * overflow fails loudly like ANSI Multiply/Add would have — the rewrite
  * rule passes the evalMode of the operators it replaces; the Column API
  * and SQL registration default to wraparound (legacy) arithmetic. */
final case class DotProductLong(left: Expression, right: Expression,
    ansi: Boolean = false)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(dt: DataType): Boolean = dt match {
      case ArrayType(LongType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two ARRAY<BIGINT> arguments, " +
        s"got ${left.dataType.sql} and ${right.dataType.sql}")
  }

  override def dataType: DataType = LongType

  override def prettyName: String = "dot_product_long"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0L
    var i = 0
    while (i < n) {
      if (!x.isNullAt(i) && !y.isNullAt(i)) {
        if (ansi) acc = Math.addExact(acc, Math.multiplyExact(x.getLong(i), y.getLong(i)))
        else acc += x.getLong(i) * y.getLong(i)
      }
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      val step =
        if (ansi)
          s"$acc = java.lang.Math.addExact($acc, java.lang.Math.multiplyExact($x.getLong($i), $y.getLong($i)));"
        else s"$acc += $x.getLong($i) * $y.getLong($i);"
      s"""
        |int $n = java.lang.Math.min($x.numElements(), $y.numElements());
        |long $acc = 0L;
        |for (int $i = 0; $i < $n; $i++) {
        |  if (!$x.isNullAt($i) && !$y.isNullAt($i)) {
        |    $step
        |  }
        |}
        |${ev.value} = $acc;
      """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProductLong =
    copy(left = newLeft, right = newRight)
}

object DotProductLong {
  /** Column-API entry point (ColumnBridge spans Spark 4's split Column /
    * Expression APIs). */
  def apply(a: Column, b: Column): Column =
    ColumnBridge.column(DotProductLong(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))

  /** injectFunction descriptor: registered by [[graft.Sessions.build]]
    * through SparkSessionExtensions, so `dot_product_long(a, b)` is
    * callable from SQL text as well as the Column API. */
  val registration: (org.apache.spark.sql.catalyst.FunctionIdentifier,
      org.apache.spark.sql.catalyst.expressions.ExpressionInfo,
      Seq[Expression] => Expression) = (
    org.apache.spark.sql.catalyst.FunctionIdentifier("dot_product_long"),
    new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
      classOf[DotProductLong].getCanonicalName, "dot_product_long"),
    (children: Seq[Expression]) => {
      require(children.length == 2,
        s"dot_product_long expects 2 arguments, got ${children.length}")
      DotProductLong(children.head, children(1))
    })
}
