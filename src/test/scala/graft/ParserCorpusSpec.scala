package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.logql.{Parser => LogQLParser, Planner => LogQLPlanner}
import graft.promql.PromQL
import graft.traceql.TraceQL

/** Table-driven accept/reject corpus for the three front-ends — the
  * reference's parser-test shape (internal/logql/parser_test.go,
  * internal/traceql/parser_test.go). Every accepted query must ALSO
  * plan to a resolvable DataFrame, catching planner regressions beyond
  * syntax.
  */
class ParserCorpusSpec extends SparkTestBase {
  import spark.implicits._

  private lazy val logs: DataFrame =
    Seq((1L, """{"k": 1}""", Map("app" -> "a", "env" -> "p")))
      .toDF("ts_ns", "body", "labels")

  private lazy val spans: DataFrame = Seq(
    (1L, 1, null.asInstanceOf[Integer], "op", 1, 0, 10L, 0L, Map("svc" -> "x"), ""))
    .toDF("trace_id", "span_id", "parent_span_id", "name", "kind",
      "status_code", "duration_ns", "start_ns", "attrs", "status_message")

  private lazy val points: DataFrame =
    Seq((1L, "m", 1.0, Map("svc" -> "x"))).toDF("ts_us", "name", "value", "labels")

  private val logqlAccept = Seq(
    """{}""",
    """{app="a"}""",
    """{app="a", env!="q", ns=~"x.*", z!~"y"}""",
    """{app="a"} |= "x" or "y" != "z"""",
    """{app="a"} |~ "err.*" !~ "debug"""",
    """{app="a"} | json | logfmt | decolorize""",
    """{app="a"} | pattern "<_> <m> <_>"""",
    """{app="a"} | regexp "(?P<code>[0-9]+)"""",
    """{app="a"} | json | k > 5 and v <= 10 or s = "x"""",
    """{app="a"} | json | d > 1m30s""",
    """{app="a"} | json | b >= 3MB""",
    """{app="a"} | json | addr = ip("10.0.0.0/8")""",
    """{app="a"} |= ip("10.0.0.0/8") != ip("192.168.0.0/16")""",
    """{app="a"} | keep app, env | drop env""",
    """{app="a"} | distinct app""",
    """{app="a"} | label_format x=app""",
    """{app="a"} | line_format "app={{.app}}"""",
    """count_over_time({app="a"}[5m])""",
    """rate({app="a"}[1h] offset 1h)""",
    """bytes_over_time({app="a"}[1d])""",
    """sum_over_time({app="a"} | json | unwrap k [5m])""",
    """avg_over_time({app="a"} | json | unwrap d duration [5m])""",
    """quantile_over_time(0.99, {app="a"} | json | unwrap k [5m])""",
    """sum by (app) (count_over_time({}[5m]))""",
    """sum without (env) (rate({app="a"}[5m]))""",
    """topk(3, sum by (app) (count_over_time({}[5m])))""",
    """sort_desc(count_over_time({app="a"}[5m]))""",
    """sum(count_over_time({}[5m])) / 60""",
    """sum by (app) (count_over_time({}[5m])) > 10""",
    """sum by (app) (count_over_time({}[5m])) unless sum by (app) (rate({env="p"}[5m]))""",
    // round-2 surface
    """{app="a"} |> "req <_> done" !> "dbg <_>"""",
    """{app="a"} | unpack | k = "v"""",
    """{app="a"} | json ab="a.b", a1="arr[1]" | a1 > 5""",
    """{app="a"} | logfmt --strict --keep-empty x="y", bare""",
    """{app="a"} | drop env="p", app""",
    """{app="a"} | keep app, env="p"""",
    """{app="a"} | label_format t="{{ .app | ToUpper | trunc 2 }}"""",
    """{app="a"} | line_format `{{ regexReplaceAll "a+" .app "A" }}`""",
    """sum by (app) (count_over_time({}[5m])) / on(app) sum by (app) (rate({}[5m]))""",
    """count_over_time({}[5m]) / on(app) group_left sum by (app) (count_over_time({}[5m]))""",
    """sum by (app) (count_over_time({}[5m])) * ignoring(env) group_right(app) sum(rate({}[5m]))""",
    """label_replace(sum by (app) (count_over_time({}[5m])), "x", "$1", "app", "(.*)")""",
    """label_join(sum by (app) (count_over_time({}[5m])), "x", "-", "app", "env")""",
    """rate_counter({app="a"} | json | unwrap k [5m])""",
    """(sum(count_over_time({}[5m])) + 1) * 2 - 3 / 4""",
    """sum(count_over_time({}[5m])) ^ 2 ^ 3"""
  )

  private val logqlReject = Seq(
    """{app=}""",
    """{app="a"} | bogus_stage""",
    """count_over_time({app="a"})""",
    """rate({app="a"}[5parsecs])""",
    // fuzz regression: a bytes-only literal in range position must be a
    // typed ParseError, not a None.get
    """rate({}|logfmt[5mi""",
    """topk(, sum by (a) (count_over_time({}[5m])))""",
    """{app="a"} trailing"""
  )

  private val traceqlAccept = Seq(
    """{ duration > 10ms }""",
    """{ name = "op" && status = 0 }""",
    """{ svc = "x" || kind != 2 }""",
    """{ !(name =~ "a.*") }""",
    """{ span.svc = "x" && resource.svc != "y" }""",
    """{ duration > 5ms } > { duration > 1ms }""",
    """{ name = "op" } >> { svc = "x" }""",
    """{ name = "op" } ~ { name = "op" }""",
    """{ name = "op" } < { name = "op" }""",
    """{ name = "op" } !> { svc = "x" }""",
    """{ svc = "x" } | count() > 1""",
    """{ svc = "x" } | max(duration) >= 10ms""",
    """{ svc = "x" } | avg(duration) < 1s""",
    """{ name = "op" } && { svc = "x" }""",
    """{ name = "op" } || { svc = "x" }""",
    """{ rootName = "op" && duration > 1ms }""",
    """{ traceDuration > 5ms }""",
    // round-2 surface
    """{ status = error }""",
    """{ kind = server && status != unset }""",
    """{ span:id = 1 && span:parentID = 2 }""",
    """{ trace:duration > 1ms }""",
    """{ quantity > 1 } | by(svc) | count() > 1 | select(duration)""",
    """{ name = "op" } | coalesce() | count() >= 1""",
    """{ resource.service.name = "x" }""",
    """{ rootServiceName = "x" && statusMessage = "" }""",
    """{}""",
    """{} | count() > 0""",
    """{ name = "op" } << { svc = "x" }""",
    """{ name = "op" } !<< { svc = "x" }""",
    """{ name = "op" } !>> { svc = "x" }""",
    """{ name = "op" } !< { svc = "x" }""",
    """{ name = "op" } !~ { svc = "x" }""",
    """{ parent.svc = "x" && parent:name = "op" }""",
    """{ parent:duration > 1ms }""",
    """{ name = "op" } &> { svc = "x" }""",
    """{ name = "op" } &< { svc = "x" }""",
    """{ name = "op" } &>> { svc = "x" }""",
    """{ name = "op" } &<< { svc = "x" }""",
    """{ name = "op" } &~ { svc = "x" }"""
  )

  private val traceqlReject = Seq(
    """{ name = }""",
    """{ duration >> 5ms }""",
    """{ name = "op" } |""",
    """{ } garbage"""
  )

  private val promqlAccept = Seq(
    """m""",
    """m{svc="x"}""",
    """m{svc!="y", env=~"p.*"}""",
    """rate(m[5m])""",
    """increase(m{svc="x"}[1h])""",
    """delta(m[30m])""",
    """irate(m[5m])""",
    """count_over_time(m[5m])""",
    """avg_over_time(m{svc="x"}[10m])""",
    """sum by (svc) (rate(m[5m]))""",
    """topk(2, sum by (svc) (count_over_time(m[5m])))""",
    """sum by (svc) (count_over_time(m[5m])) * 60""",
    """sum(rate(m[5m])) > 0.5""",
    // round-2 surface
    """count_over_time(m[5m] offset 1h)""",
    """count_over_time(m[5m]) > bool 1""",
    """sum without (svc) (count_over_time(m[5m]))""",
    """stddev by (svc) (count_over_time(m[5m]))""",
    """quantile(0.9, count_over_time(m[5m]))""",
    """histogram_quantile(0.95, sum by (le) (count_over_time(m[5m])))""",
    """clamp(sqrt(sum(count_over_time(m[5m]))), 1, 10)""",
    """label_replace(sum by (svc) (count_over_time(m[5m])), "x", "$1", "svc", "(.*)")""",
    """quantile_over_time(0.5, m[5m])""",
    """max_over_time(sum by (svc) (count_over_time(m[5m]))[1h:5m])""",
    """(rate(m[5m]) + 1) * 2""",
    """rate(m[5m]) and sum by (svc) (rate(m[5m]))""",
    """rate(m[5m]) / on(svc) group_left sum by (svc) (rate(m[5m]))"""
  )

  private val promqlReject = Seq(
    """rate(m)""",
    """sum by () ()""",
    """m{svc=}""",
    """rate(m[bogus])"""
  )

  test("LogQL corpus: accepted queries parse AND plan") {
    logqlAccept.foreach { q =>
      try LogQLPlanner.query(q, logs).schema
      catch { case e: Throwable => fail(s"'$q' failed: ${e.getMessage}") }
    }
  }

  test("LogQL corpus: printer round-trips through the parser") {
    import graft.logql.Printer
    logqlAccept.foreach { q =>
      val ast1 = LogQLParser.parse(q)
      val printed = Printer.print(ast1)
      val ast2 =
        try LogQLParser.parse(printed)
        catch { case e: Throwable => fail(s"printed form of '$q' → '$printed' fails: ${e.getMessage}") }
      assert(ast1 == ast2, s"round-trip drifted for '$q' → '$printed'")
    }
  }

  test("LogQL corpus: malformed queries are rejected") {
    logqlReject.foreach { q =>
      assertThrows[LogQLParser.ParseError](LogQLParser.parse(q))
    }
  }

  test("TraceQL corpus: accepted queries parse AND plan") {
    traceqlAccept.foreach { q =>
      try TraceQL.plan(q, spans).schema
      catch { case e: Throwable => fail(s"'$q' failed: ${e.getMessage}") }
    }
  }

  test("TraceQL corpus: malformed queries are rejected") {
    traceqlReject.foreach { q =>
      assertThrows[TraceQL.ParseError](TraceQL.parse(q))
    }
  }

  test("PromQL corpus: accepted queries parse AND plan") {
    promqlAccept.foreach { q =>
      try {
        PromQL.parse(q) match {
          case PromQL.Instant(_, _) => PromQL.instant(q, points, evalTsUs = 10L).schema
          case _                 => PromQL.range(q, points).schema
        }
      } catch { case e: Throwable => fail(s"'$q' failed: ${e.getMessage}") }
    }
  }

  test("PromQL corpus: malformed queries are rejected") {
    promqlReject.foreach { q =>
      assertThrows[PromQL.ParseError](PromQL.parse(q))
    }
  }
}
