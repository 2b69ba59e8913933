package graft.functions

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule

/** Optimizer rule (SURVEY §7.4(c) registration path): rewrites the
  * declarative tokenizer pattern
  *
  *   filter(split(lower(x), '[^a-z]+', -1), t -> NOT (t = ''))
  *
  * into the codegen'd [[TokenizeLower]] kernel. Users keep writing the
  * idiomatic higher-order-function form (or port SQL verbatim); the plan
  * gets the compiled kernel — which also restores whole-stage codegen for
  * the surrounding projection (any HOF evicts its projection from
  * codegen, see PlanAuditSpec).
  *
  * Registered two ways: `GraftExtensions` (spark.sql.extensions) or
  * `spark.experimental.extraOptimizations` for an existing session.
  */
object RewriteTokenize extends Rule[LogicalPlan] {

  private def isNotEmptyCheck(fn: LambdaFunction): Boolean = fn match {
    case LambdaFunction(Not(EqualTo(v: NamedLambdaVariable, Literal(s, _))),
        Seq(arg: NamedLambdaVariable), _) =>
      v.exprId == arg.exprId && s != null && s.toString.isEmpty
    case LambdaFunction(Not(EqualTo(Literal(s, _), v: NamedLambdaVariable)),
        Seq(arg: NamedLambdaVariable), _) =>
      v.exprId == arg.exprId && s != null && s.toString.isEmpty
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case ArrayFilter(
          StringSplit(Lower(child), Literal(regex, _), Literal(limit, _)),
          fn: LambdaFunction)
          if regex != null && regex.toString == "[^a-z]+" &&
             limit == -1 && isNotEmptyCheck(fn) =>
        TokenizeLower(child)
    }
}
