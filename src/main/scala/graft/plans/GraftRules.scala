package graft.plans

import org.apache.spark.sql.catalyst.expressions.ArrayDistinct
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule

import graft.ops.NgramsExpr

/** Optimizer rules for the graft expression surface (injected via
  * GraftExtensions / registered on existing sessions through
  * experimentalMethods.extraOptimizations).
  *
  * [[FuseNgramsDistinct]]: `array_distinct(ngrams(text))` — the
  * natural way to write the distinct-gram set in SQL — is rewritten
  * to the kernel's own distinct mode, which dedups inside the
  * single-pass gram scan instead of materializing the duplicate-heavy
  * array and re-walking it interpreted. Semantically exact: both keep
  * the first occurrence of each gram in order (pinned by the
  * ngrams-vs-HOF differential tests).
  */
object FuseNgramsDistinct extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case ArrayDistinct(g: NgramsExpr) if !g.distinct =>
        g.copy(distinct = true)
    }
}
