package graft.promql

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Rule evaluation — the half of `/api/v1/rules` worth having (the
  * reference serves the endpoint as NotImplemented,
  * promhandler.go:494-497; evaluation here is parity-plus).
  *
  * A RECORDING rule evaluates its PromQL expression on the step grid
  * and stores the result as a new named series: the output rows are
  * point-layout-shaped (`ts_us, name, labels, value`), so recording is
  * `pointsSink`-appendable — exactly how Prometheus materializes
  * `job:metric:rate5m` style series. An ALERTING rule reuses the same
  * evaluation plus the pending→firing run-state pass the
  * `promql_alert_firing` oracle pins.
  *
  * Spark shape: one PromQL plan per rule per evaluation window —
  * rules evaluate over the SHARED points frame, so a rule group is a
  * union of independent plans over one cached scan; nothing iterates
  * per step.
  */
object Rules {

  final case class RecordingRule(
      record: String,
      expr: String,
      staticLabels: Map[String, String] = Map.empty)

  /** Evaluate one recording rule on the step grid: PromQL range
    * evaluation, then reshape to point rows named `rule.record` with
    * the result labels merged under any static rule labels (static
    * wins, Prometheus rule semantics).
    */
  def record(points: DataFrame, rule: RecordingRule,
      stepUs: Option[Long] = None): DataFrame = {
    val out = PromQL.range(rule.expr, points, stepUs)
    val static = map(rule.staticLabels.toSeq
      .flatMap { case (k, v) => Seq(lit(k), lit(v)) }: _*)
    val merged =
      if (rule.staticLabels.isEmpty) col("labels")
      else map_concat(
        map_filter(col("labels"),
          (k, _) => !array_contains(
            lit(rule.staticLabels.keys.toArray), k)),
        static)
    out.select(
      col("bucket_us").as("ts_us"),
      lit(rule.record).as("name"),
      merged.as("labels"),
      col("value"))
  }

  /** Evaluate a rule GROUP: every rule over the same shared scan, one
    * union of independent plans — appendable to the point layout in a
    * single write.
    */
  def recordGroup(points: DataFrame, rules: Seq[RecordingRule],
      stepUs: Option[Long] = None): DataFrame =
    rules.map(record(points, _, stepUs)).reduce(_ unionByName _)
}
