package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.promql.PromQL

/** Grammar coverage against the reference's PromQL compliance corpus
  * (dev/local/ch-compliance/promql-test-queries.yml, 119 templated
  * queries): every supported query must PARSE; every known-unsupported
  * query must keep throwing — when a feature lands, the ledger entry
  * moves up, so semantic drift in either direction fails the build.
  * Template variables are expanded with the tester's standard
  * substitutions (one representative per class where exhaustive
  * expansion adds nothing).
  */
class PromQLComplianceSpec extends AnyFunSuite {

  private val aggOps = Seq("sum", "avg", "max", "min", "count", "stddev", "stdvar")
  private val mathFns = Seq("abs", "ceil", "floor", "exp", "ln", "log2", "log10", "sqrt")
  private val dateFns = Seq("minute", "hour", "day_of_week", "day_of_month",
    "day_of_year", "days_in_month", "month", "year")

  private val supported: Seq[String] =
    Seq(
      // scalar literals
      "42", "1.234", ".123", "1.23e-3", "0x3d", "Inf", "+Inf", "-Inf", "NaN",
      // vector selectors
      "demo_memory_usage_bytes",
      """{__name__="demo_memory_usage_bytes"}""",
      """demo_memory_usage_bytes{type="free"}""",
      """demo_memory_usage_bytes{type!="free"}""",
      """demo_memory_usage_bytes{instance=~"demo.promlabs.com:.*"}""",
      """demo_memory_usage_bytes{instance!~".*:10000"}""",
      """demo_memory_usage_bytes{type="free", instance!="demo.promlabs.com:10000"}""",
      "nonexistent_metric_name",
      // aggregations
      "avg(max by(type) (demo_memory_usage_bytes))",
      "topk (3, demo_memory_usage_bytes)",
      "bottomk by(instance) (2, demo_memory_usage_bytes)",
      "quantile(0.84, demo_memory_usage_bytes)",
      // binary expressions
      "1 * 2 + 4 / 6 - 10 % 2 ^ 2",
      "demo_num_cpus + (1 == bool 2)",
      "demo_memory_usage_bytes % 1.2345",
      "demo_memory_usage_bytes <= bool 1.2345",
      "1.2345 >= bool demo_memory_usage_bytes",
      "(1 * 2 + 4 / 6 - (10%7)^2) / demo_memory_usage_bytes",
      "demo_memory_usage_bytes ^ (1 * 2 + 4 / 6 - 10)",
      "demo_memory_usage_bytes * on(instance, job, type) demo_memory_usage_bytes",
      "sum by(instance, type) (demo_memory_usage_bytes) / on(instance, type) group_left(job) demo_memory_usage_bytes",
      "sum without(job) (demo_memory_usage_bytes) / on(instance, type) group_left demo_memory_usage_bytes",
      "demo_num_cpus * Inf",
      "demo_num_cpus * -Inf",
      "demo_num_cpus * NaN",
      "demo_memory_usage_bytes + -(1)",
      "-demo_memory_usage_bytes",
      "-1 ^ 2",
      // time()
      "1 + time()", "time() - 1", "time() >= bool 1", "time() % time()",
      "time() * demo_memory_usage_bytes",
      // over-time + rate family
      "quantile_over_time(0.84, demo_memory_usage_bytes[1m])",
      "deriv(demo_disk_usage_bytes[1m])",
      "predict_linear(demo_disk_usage_bytes[1m], 600)",
      "time()",
      // label functions
      """label_replace(demo_num_cpus, "job", "destination-value-$1", "instance", "demo.promlabs.com:(.*)")""",
      """label_join(demo_num_cpus, "new_label", "-", "instance", "job")""",
      // date functions, no-arg and offset forms
      "resets(demo_cpu_usage_seconds_total[1m])",
      "changes(demo_batch_last_success_timestamp_seconds[1m])",
      "vector(1.23)", "vector(time())",
      "histogram_quantile(0.9, rate(demo_api_request_duration_seconds_bucket[1m]))",
      "histogram_quantile(0.9, nonexistent_metric)",
      "clamp(demo_memory_usage_bytes, 0, 1)",
      "clamp_max(demo_memory_usage_bytes, 2)",
      "clamp_min(demo_memory_usage_bytes, 2)",
      """count_values("value", demo_api_request_duration_seconds_bucket)""",
      "absent(demo_memory_usage_bytes)",
      "absent(nonexistent_metric_name)",
      "timestamp(demo_num_cpus)",
      "timestamp(timestamp(demo_num_cpus))",
      "avg_over_time(rate(demo_cpu_usage_seconds_total[1m])[2m:10s])",
      // round-5 additions: trig family + atan2 binop, scalar(), group,
      // !=, pi(), mad/holt_winters
      "demo_memory_usage_bytes atan2 demo_memory_usage_bytes",
      "deg(sin(demo_memory_usage_bytes) atan2 cos(demo_memory_usage_bytes))",
      "rad(deg(atan(tan(demo_memory_usage_bytes))))",
      "sinh(cosh(tanh(asin(acos(demo_memory_usage_bytes / 1e10)))))",
      "scalar(demo_num_cpus) * demo_memory_usage_bytes",
      "demo_memory_usage_bytes / scalar(sum(demo_memory_usage_bytes))",
      "group by(instance) (demo_memory_usage_bytes)",
      "demo_memory_usage_bytes != 1.2345",
      "demo_memory_usage_bytes != bool 1.2345",
      "vector(pi())",
      "mad_over_time(demo_memory_usage_bytes[1m])",
      """sort_by_label(demo_memory_usage_bytes, "instance")""",
      """sort_by_label_desc(demo_memory_usage_bytes, "instance", "job")""",
      "holt_winters(demo_disk_usage_bytes[1m], 0.5, 0.3)",
      "double_exponential_smoothing(demo_disk_usage_bytes[1m], 0.5, 0.3)"
    ) ++
      aggOps.map(op => s"$op(demo_memory_usage_bytes)") ++
      aggOps.map(op => s"$op by(instance) (demo_memory_usage_bytes)") ++
      aggOps.map(op => s"$op without(instance, type) (demo_memory_usage_bytes)") ++
      mathFns.map(f => s"$f(demo_memory_usage_bytes)") ++
      mathFns.map(f => s"$f(-demo_memory_usage_bytes)") ++
      Seq("avg", "sum", "max", "min", "count")
        .map(f => s"${f}_over_time(demo_memory_usage_bytes[1m])") ++
      Seq("rate", "increase", "delta")
        .map(f => s"$f(demo_cpu_usage_seconds_total[1m])") ++
      Seq("irate", "idelta")
        .map(f => s"$f(demo_cpu_usage_seconds_total[1m])") ++
      dateFns.map(f => s"$f()") ++
      dateFns.map(f => s"$f(demo_batch_last_success_timestamp_seconds)")

  /** Corpus queries the grammar intentionally rejects today — each must
    * KEEP throwing at parse; a passing parse here means a feature landed
    * and the entry belongs in `supported` (with planner coverage).
    * Plan-time rejections (subquery-of-expression, invalid regexes) are
    * NOT listed — they parse, and their errors surface when planned.
    */
  private val knownUnsupported: Seq[String] = Seq(
    "demo_memory_usage_bytes offset 1m",  // offset on a bare selector
    "demo_memory_usage_bytes offset -1m", // negative offset
    // wrong arity on the parameterized range functions
    "holt_winters(demo_disk_usage_bytes[1m], 0.5)",
    "predict_linear(demo_disk_usage_bytes[1m])",
    "quantile_over_time(demo_memory_usage_bytes[1m])"
  )

  test("compliance corpus: every supported query parses") {
    val failures = supported.flatMap { q =>
      try { PromQL.parse(q); None }
      catch { case e: Throwable => Some(s"$q -> ${e.getMessage}") }
    }
    assert(failures.isEmpty, s"\n${failures.mkString("\n")}")
  }

  test("compliance corpus: known-unsupported queries still throw") {
    val landed = knownUnsupported.flatMap { q =>
      try { PromQL.parse(q) match { case _ => Some(q) } }
      catch { case _: Throwable => None }
    }
    assert(landed.isEmpty,
      s"now parse — move to `supported` and add planner coverage:\n${landed.mkString("\n")}")
  }
}
