package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Add, ArrayAggregate, Expression, LambdaFunction, Literal, Multiply, NamedLambdaVariable, ZipWith}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, DoubleType}

import graft.functions.VecDot

/** Optimizer rule: rewrites the composed higher-order-function dot product
  *
  *   aggregate(zip_with(a, b, (x, y) -> x * y), 0.0D, (acc, v) -> acc + v)
  *
  * into the native codegen'd [[VecDot]] expression. The two forms are
  * bitwise-identical by construction (same index-ordered IEEE operation
  * sequence, same NULL semantics for unequal lengths / null elements — see
  * VecDot's scaladoc and parity spec), but the HOF form never enters
  * whole-stage codegen: ZipWith materializes an intermediate array and
  * ArrayAggregate runs an interpreted per-element lambda. At 100 TB the dot
  * product is the inner loop of every similarity operator, so a user who
  * writes the portable SQL form silently gets the tight loop.
  *
  * This is the engine's demonstration of the `Rule[LogicalPlan]` +
  * `SparkSessionExtensions` tier (SURVEY.md §4): the reference surface
  * needs no custom Catalyst work, so the one rule we ship is an honest
  * optimization, not ceremony. Registered by [[GraftExtensions]].
  */
object VecDotRewrite extends Rule[LogicalPlan] {

  private def isVar(e: Expression, v: NamedLambdaVariable): Boolean = e match {
    case n: NamedLambdaVariable => n.exprId == v.exprId
    case _ => false
  }

  private def isDoubleArray(e: Expression): Boolean = e.dataType match {
    case ArrayType(DoubleType, _) => true
    case _ => false
  }

  /** (x, y) -> x * y (either operand order; IEEE multiply is commutative). */
  private object ProductLambda {
    def unapply(e: Expression): Boolean = e match {
      case LambdaFunction(Multiply(l, r, _),
          Seq(x: NamedLambdaVariable, y: NamedLambdaVariable), _) =>
        (isVar(l, x) && isVar(r, y)) || (isVar(l, y) && isVar(r, x))
      case _ => false
    }
  }

  /** (acc, v) -> acc + v (either order; IEEE add is commutative). */
  private object SumLambda {
    def unapply(e: Expression): Boolean = e match {
      case LambdaFunction(Add(l, r, _),
          Seq(acc: NamedLambdaVariable, v: NamedLambdaVariable), _) =>
        (isVar(l, acc) && isVar(r, v)) || (isVar(l, v) && isVar(r, acc))
      case _ => false
    }
  }

  /** acc -> acc (the implicit finish of 3-arg aggregate()). */
  private object IdentityLambda {
    def unapply(e: Expression): Boolean = e match {
      case LambdaFunction(body, Seq(v: NamedLambdaVariable), _) => isVar(body, v)
      case _ => false
    }
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformAllExpressions {
    case ArrayAggregate(
          ZipWith(a, b, ProductLambda()),
          Literal(0.0, DoubleType),
          SumLambda(),
          IdentityLambda()) if isDoubleArray(a) && isDoubleArray(b) =>
      VecDot(a, b)
  }
}
