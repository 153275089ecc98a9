package graft

import org.apache.spark.sql.functions._

import graft.promql.Rules
import graft.promql.Rules.RecordingRule

/** Recording-rule evaluation: the rule's PromQL expression evaluates
  * on the step grid, lands as point-layout rows under the recorded
  * name, and the NEW series is queryable through the same PromQL
  * front-end — the Prometheus materialization loop, closed.
  */
class RulesSpec extends SparkTestBase {
  import spark.implicits._

  private val H = 3600000000L // 1h in us

  private def pointsDf = Seq(
    (0L * H, "http_requests_total", Map("job" -> "api"), 1.0),
    (1L * H, "http_requests_total", Map("job" -> "api"), 7.0),
    (2L * H, "http_requests_total", Map("job" -> "api"), 10.0),
    (0L * H, "http_requests_total", Map("job" -> "web"), 2.0),
    (1L * H, "http_requests_total", Map("job" -> "web"), 4.0),
    (2L * H, "http_requests_total", Map("job" -> "web"), 9.0)
  ).toDF("ts_us", "name", "labels", "value")

  test("record evaluates the expr and names the result series") {
    val rule = RecordingRule("job:http_requests:sum",
      "sum by (job) (http_requests_total)", Map("rule_group" -> "g1"))
    val out = Rules.record(pointsDf, rule, stepUs = Some(H)).collect()
    assert(out.forall(_.getString(1) == "job:http_requests:sum"))
    // static rule labels merge over result labels
    assert(out.forall(
      _.getMap[String, String](2).get("rule_group").contains("g1")))
    // sum by (job) at the 1h step where both series have fresh samples
    val atH1 = out.filter(_.getLong(0) == 1L * H)
      .map(r => r.getMap[String, String](2)("job") -> r.getDouble(3)).toMap
    assert(atH1 == Map("api" -> 7.0, "web" -> 4.0))
  }

  test("recorded series round-trips through the PromQL front-end") {
    val rule = RecordingRule("job:http_requests:sum",
      "sum by (job) (http_requests_total)")
    val recorded = Rules.record(pointsDf, rule, stepUs = Some(H))
    // append to the point table — the deployment shape (pointsSink)
    val combined = pointsDf.unionByName(recorded)
    val back = graft.promql.PromQL.range(
      "job:http_requests:sum", combined, Some(H))
      .filter(col("bucket_us") === 2L * H)
      .collect()
      .map(r => r.getMap[String, String](1)("job") -> r.getDouble(2))
      .toMap
    assert(back == Map("api" -> 10.0, "web" -> 9.0))
  }

  test("alertStates: pending until forSteps consecutive actives, then firing") {
    // condition: http_requests_total > 5, evaluated hourly, for = 2
    // api: 1, 7, 10  -> inactive-ish, pending@1h, firing@2h
    // web: 2, 4, 9   -> pending only at 2h
    val rule = Rules.AlertingRule("HighRequests",
      "http_requests_total > 5", forSteps = 2)
    val out = Rules.alertStates(pointsDf, rule, stepUs = H)
      .collect()
      .map(r => (r.getLong(0), r.getMap[String, String](1)("job"),
        r.getString(2)))
      .sortBy(t => (t._2, t._1))
    assert(out.toSeq == Seq(
      (1L * H, "api", "pending"), (2L * H, "api", "firing"),
      (1L * H, "web", "inactive"), (2L * H, "web", "pending")))
  }

  test("alertStates: for=0 fires immediately, negative forSteps rejected") {
    // Prometheus `for: 0` semantics — active at a step means firing at
    // that step, no pending phase
    val rule = Rules.AlertingRule("HighRequests",
      "http_requests_total > 5", forSteps = 0)
    val out = Rules.alertStates(pointsDf, rule, stepUs = H)
      .collect()
      .map(r => (r.getLong(0), r.getMap[String, String](1)("job"),
        r.getString(2)))
      .sortBy(t => (t._2, t._1))
    assert(out.toSeq == Seq(
      (1L * H, "api", "firing"), (2L * H, "api", "firing"),
      (1L * H, "web", "inactive"), (2L * H, "web", "firing")))
    val bad = Rules.AlertingRule("Bad", "http_requests_total > 5",
      forSteps = -1)
    intercept[IllegalArgumentException] {
      Rules.alertStates(pointsDf, bad, stepUs = H).collect()
    }
  }

  test("alertStatesLogQL: the Loki-ruler shape over a LogQL condition") {
    val HNs = 3600000000000L
    val MNs = 60000000000L
    // ceil-aligned (t-1h, t] windows: 3 lines inside each of the first
    // two hours — condition > 2 active at steps 1h and 2h; for = 2 →
    // pending@1h, firing@2h
    val logs = Seq(10 * MNs, 20 * MNs, 30 * MNs,
      HNs + 10 * MNs, HNs + 20 * MNs, HNs + 30 * MNs)
      .map(ts => (ts, "req ok", Map("app" -> "api")))
      .toDF("ts_ns", "body", "labels")
    val out = Rules.alertStatesLogQL(logs,
      """count_over_time({app="api"}[1h]) > 2""", HNs, forSteps = 2)
      .collect()
      .map(r => (r.getLong(0) / HNs, r.getString(2)))
      .sortBy(_._1)
    assert(out.toSeq == Seq((1L, "pending"), (2L, "firing")))
  }

  test("recordGroup unions independent rules over the shared scan") {
    val rules = Seq(
      RecordingRule("r:a", "sum by (job) (http_requests_total)"),
      RecordingRule("r:b", "count by (job) (http_requests_total)"))
    val out = Rules.recordGroup(pointsDf, rules, Some(H))
    val names = out.select("name").distinct().collect().map(_.getString(0))
    assert(names.toSet == Set("r:a", "r:b"))
  }
}
