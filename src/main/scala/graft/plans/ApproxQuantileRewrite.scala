package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.catalyst.expressions.aggregate.{ApproximatePercentile, Percentile}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule

/** Opt-in query-acceleration rewrite (the OLAP-engine switch a Doris
  * user flips): replace EXACT `percentile` — which materializes and
  * sorts every group's values — with the GK-sketch
  * `percentile_approx` at fixed accuracy. Off unless the session sets
  * `spark.graft.approxQuantiles=true`, because it trades exactness
  * for a bounded-memory single pass; at 100 TB the exact form is a
  * per-group sort of the full column and the sketch is the only
  * tractable plan.
  *
  * Injected by [[graft.GraftExtensions]] via injectOptimizerRule.
  */
case class ApproxQuantileRewrite(spark: SparkSession) extends Rule[LogicalPlan] {

  private val Flag = "spark.graft.approxQuantiles"
  private val Accuracy = 10000

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (!spark.conf.getOption(Flag).contains("true")) plan
    else plan.transformAllExpressions {
      // Only the no-frequency form (frequency 1) maps directly.
      case Percentile(child, percentage, freq, mutOff, inOff, reverse)
          if !reverse && freq.foldable && freq.eval() == 1L =>
        ApproximatePercentile(child, percentage, Literal(Accuracy), mutOff, inOff)
    }
}
