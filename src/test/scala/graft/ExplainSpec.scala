package graft

import graft.logql.{Explain, Parser, Planner}

/** `@explain` decision stream (reference engine_explain_query.go +
  * querier_logs_optimizer.go): pushdown taken and blocked, with
  * reasons, for log pipelines and metric sampling.
  */
class ExplainSpec extends SparkTestBase {
  import spark.implicits._

  private def linesOf(q: String): Seq[String] =
    Explain.lines(Parser.parse(q))

  test("pushdown-safe pipeline: filters offload and pipeline collapses") {
    val ls = linesOf("""{job="api"} |= "GET" != "health" | status = "200"""")
    assert(ls.exists(_.startsWith("offloading line filters to the scan:")))
    assert(ls.exists(_.startsWith("offloading label filter to the scan:")))
    assert(ls.exists(_.startsWith("pipeline fully offloaded to the scan:")))
    assert(ls.last == "evaluated query: query_type=LogQuery")
  }

  test("__error__-dependent label filter blocks pushdown with a reason") {
    val ls = linesOf("{job=\"api\"} | json | __error__ = \"\"")
    val blocked = ls.filter(_.contains("NOT offloaded"))
    assert(blocked.exists(l =>
      l.contains("label __error__") && l.contains("| json")), ls.mkString("\n"))
    assert(!ls.exists(_.startsWith("pipeline fully offloaded")))
  }

  test("filter on a parser-extracted label blocks with the parser named") {
    val ls = linesOf("""{job="api"} | json | status = "200"""")
    assert(ls.exists(l => l.contains("NOT offloaded") &&
      l.contains("label status set by | json")), ls.mkString("\n"))
    // a filter on an untouched stream label still offloads
    val ls2 = linesOf("""{job="api"} | regexp `(?P<code>\d+)` | job = "api"""")
    assert(ls2.exists(_.startsWith("offloading label filter")), ls2.mkString("\n"))
  }

  test("line filter after line_format is blocked; before is offloaded") {
    val ls = linesOf(
      """{job="api"} |= "a" | line_format "{{.job}}" |= "b"""")
    assert(ls.exists(l => l.startsWith("offloading line filters") &&
      l.contains("\"a\"")))
    assert(ls.exists(l => l.contains("line filter NOT offloaded") &&
      l.contains("line rewritten") && l.contains("\"b\"")), ls.mkString("\n"))
  }

  test("sampling offload: sum by over count_over_time yes, avg no") {
    val yes = linesOf("""sum by (job) (count_over_time({job="api"} [1m]))""")
    assert(yes.exists(_.startsWith("sampling offloaded:")), yes.mkString("\n"))
    assert(yes.last == "evaluated query: query_type=MetricQuery")
    val no = linesOf("""avg by (job) (count_over_time({job="api"} [1m]))""")
    assert(no.exists(l => l.startsWith("sampling NOT offloaded") &&
      l.contains("avg")), no.mkString("\n"))
  }

  test("@explain returns the decision stream through Planner.query") {
    val logs = Seq((1L, "GET /", Map("job" -> "api")))
      .toDF("ts_ns", "body", "labels")
    val rows = Planner.query("""@explain {job="api"} |= "GET"""", logs)
      .collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getAs[Map[String, String]]("labels") ==
      Map("log" -> "explain")))
    val bodies = rows.map(_.getAs[String]("body")).toSeq
    assert(bodies.exists(_.startsWith("offloading line filters")))
    assert(bodies.last.startsWith("evaluated query:"))
  }
}
