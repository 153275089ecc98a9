package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.StringType
import org.apache.spark.unsafe.types.UTF8String

import graft.functions.exprs.SeverityText

/** Catalyst optimizer rules for the engine, injected via
  * SparkSessionExtensions (GraftFunctions.inject).
  */
object GraftRules {

  /** Severity predicate lowering: `severity_text(sev) = 'ERROR'` →
    * `sev BETWEEN 17 AND 20` — the reference's name↔number predicate
    * rewrite (internal/chstorage/querier_logs_query.go:760-787), which
    * here additionally turns a derived-column predicate into a raw
    * integer-column range that Parquet scans can push down and prune
    * row groups with.
    *
    * Sound by construction: severityText is a total function whose
    * preimage for each level name is exactly the closed range below
    * (UNKNOWN is everything outside [1, 24]).
    */
  object LowerSeverityPredicates extends Rule[LogicalPlan] {
    private val ranges: Map[String, (Int, Int)] = Map(
      "TRACE" -> (1, 4), "DEBUG" -> (5, 8), "INFO" -> (9, 12),
      "WARN" -> (13, 16), "ERROR" -> (17, 20), "FATAL" -> (21, 24))

    private def lower(num: Expression, name: String): Option[Expression] =
      ranges.get(name).map { case (lo, hi) =>
        And(GreaterThanOrEqual(num, Literal(lo)), LessThanOrEqual(num, Literal(hi)))
      }.orElse {
        if (name == "UNKNOWN")
          Some(Or(LessThan(num, Literal(1)), GreaterThan(num, Literal(24))))
        else None
      }

    override def apply(plan: LogicalPlan): LogicalPlan =
      plan.transformAllExpressions {
        case eq @ EqualTo(SeverityText(num), Literal(s: UTF8String, StringType)) =>
          lower(num, s.toString).getOrElse(eq)
        case eq @ EqualTo(Literal(s: UTF8String, StringType), SeverityText(num)) =>
          lower(num, s.toString).getOrElse(eq)
      }
  }
}
