package graft.plans

import graft.functions.DotProductLong
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, LongType}

/** Optimizer rule: rewrite the interpreted higher-order dot-product idiom
  *
  *   aggregate(zip_with(a, b, (x, y) -> x * y), 0L, (acc, v) -> acc + v)
  *
  * into the codegen'd [[graft.functions.DotProductLong]] when both arrays
  * are ARRAY<BIGINT>. Users (and LLM-generated SQL) write the idiomatic
  * fold; the engine runs the tight loop — the (c) rung of the
  * custom-operator ladder scoped to what actually pays: an expression-level
  * Rule, no custom physical operator needed (SURVEY §4).
  *
  * Matching is deliberately narrow: exact Multiply lambda over the zipped
  * pair, Add accumulator, literal 0L seed, no finish transform — anything
  * else keeps Catalyst's own evaluation.
  */
object RewriteDotProduct extends Rule[LogicalPlan] {

  /** ARRAY<BIGINT> with non-null elements: a null element nulls the whole
    * HOF fold (Add(acc, null) -> null) but contributes 0 in DotProductLong,
    * so the rewrite only fires when elements are provably non-null. */
  private def isLongArray(e: Expression): Boolean = e.dataType match {
    case ArrayType(LongType, containsNull) => !containsNull
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case agg @ ArrayAggregate(
            ZipWith(a, b,
              LambdaFunction(mul @ Multiply(mx: NamedLambdaVariable, my: NamedLambdaVariable, _),
                Seq(zx: NamedLambdaVariable, zy: NamedLambdaVariable), _)),
            Literal(0L, LongType),
            LambdaFunction(add @ Add(ax: NamedLambdaVariable, av: NamedLambdaVariable, _),
              Seq(aacc: NamedLambdaVariable, ain: NamedLambdaVariable), _),
            finish)
          if isLongArray(a) && isLongArray(b) &&
            mx.exprId == zx.exprId && my.exprId == zy.exprId &&
            ax.exprId == aacc.exprId && av.exprId == ain.exprId &&
            isIdentityFinish(finish) &&
            // overflow semantics must survive the rewrite: ANSI maps to
            // the exact-arithmetic kernel, LEGACY to wraparound; TRY
            // (null-on-overflow) has no kernel equivalent — keep Catalyst.
            // Compare through the evalMode ACCESSOR: the constructor param
            // is a NumericEvalContext in Spark 4.1, not the EvalMode
            add.evalMode == mul.evalMode &&
            (mul.evalMode == EvalMode.LEGACY || mul.evalMode == EvalMode.ANSI) =>
        // unequal lengths: zip_with pads with nulls, Multiply nulls the
        // pair, Add nulls the fold -> the HOF returns NULL; the kernel
        // loops over min(length), so guard explicitly. Null arrays agree
        // already (Size(null) -> null -> If condition false -> null).
        If(EqualTo(Size(a), Size(b)),
          DotProductLong(a, b, ansi = mul.evalMode == EvalMode.ANSI),
          Literal(null, LongType))
    }

  private def isIdentityFinish(finish: Expression): Boolean = finish match {
    case LambdaFunction(v: NamedLambdaVariable, Seq(arg: NamedLambdaVariable), _) =>
      v.exprId == arg.exprId
    case _ => false
  }

  /** SparkSessionExtensions hook (used by graft.Sessions.build). */
  def inject(e: SparkSessionExtensions): Unit =
    e.injectOptimizerRule(_ => RewriteDotProduct)
}
