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

  final case class AlertingRule(
      alert: String,
      expr: String,
      forSteps: Int)

  /** A named rule group (one evaluation interval, Prometheus-style). */
  final case class RuleGroup(
      name: String,
      intervalUs: Long,
      recording: Seq[RecordingRule] = Nil,
      alerting: Seq[AlertingRule] = Nil)

  /** Per-series alert run states over the step grid (the semantics
    * the `promql_alert_firing` oracle pins, generalized to ANY PromQL
    * condition expression): a series is ACTIVE at an evaluation iff
    * the expression returns it (Prometheus alert semantics — the expr
    * IS the condition), `pending` while active for fewer than
    * `forSteps` consecutive evaluations, `firing` from the
    * `forSteps`-th on. Missing evaluations reset the run. One dense
    * grid (explode × the result's own series set) + one frame-bounded
    * window pass — no per-step rescan.
    */
  def alertStates(points: DataFrame, rule: AlertingRule,
      stepUs: Long): DataFrame =
    alertStatesFrom(
      PromQL.range(rule.expr, points, Some(stepUs))
        .select(col("bucket_us").as("__b"), col("labels")),
      stepUs, rule.forSteps)
      .withColumnRenamed("__b", "bucket_us")

  /** LogQL twin (the Loki ruler shape): the condition is a LogQL
    * metric expression evaluated through the real front-end; presence
    * in the result = active, same run-state semantics.
    */
  def alertStatesLogQL(logs: DataFrame, expr: String, stepNs: Long,
      forSteps: Int): DataFrame =
    alertStatesFrom(
      graft.logql.Planner.query(expr, logs, stepNs = Some(stepNs))
        .select(col("bucket_ns").as("__b"), col("labels")),
      stepNs, forSteps)
      .withColumnRenamed("__b", "bucket_ns")

  /** The engine-agnostic run-state core over a (bucket, labels)
    * condition result: densify to the full grid per series, then one
    * frame-bounded window pass.
    */
  private def alertStatesFrom(res0: DataFrame, stepUnits: Long,
      forSteps0: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // Prometheus `for: 0` fires immediately — treat it as one step;
    // anything negative is a config error (an inverted window frame
    // would otherwise surface as an opaque Spark runtime failure)
    require(forSteps0 >= 0, s"forSteps must be >= 0, got $forSteps0")
    val forSteps = math.max(1, forSteps0)
    val res = res0.select(col("__b"), col("labels"),
      graft.logql.VectorMatching.streamKey(col("labels")).as("__k"),
      lit(1).as("active"))
    val grid = res.agg(min(col("__b")).as("lo"), max(col("__b")).as("hi"))
      .select(explode(sequence(col("lo"), col("hi"), lit(stepUnits)))
        .as("__b"))
    val series = res.select(col("__k"), col("labels"))
      .dropDuplicates("__k")
    val dense = grid.crossJoin(broadcast(series))
      .join(res.select(col("__b"), col("__k"), col("active")),
        Seq("__b", "__k"), "left")
      .withColumn("active", coalesce(col("active"), lit(0)))
    val w = Window.partitionBy(col("__k")).orderBy(col("__b"))
      .rowsBetween(-(forSteps - 1), Window.currentRow)
    dense
      .withColumn("__run", sum(col("active")).over(w))
      .withColumn("__w", count(lit(1)).over(w))
      .select(col("__b"), col("labels"),
        when(col("active") === 1 && col("__run") === forSteps &&
            col("__w") === forSteps, "firing")
          .when(col("active") === 1, "pending")
          .otherwise("inactive").as("state"))
  }
}
