package graft

import scala.util.Random

import org.apache.spark.sql.functions._

/** Fuzz the PLANNING stage: ParserFuzzSpec pins "parsers fail with
  * typed errors"; this pins the same for parse→plan→analyze, where a
  * different crash class lives (MatchError on an AST shape the planner
  * forgot, NPE on a missing column, exceptions escaping Catalyst
  * analysis). Inputs are seeded-random mutations of valid queries —
  * deterministic (fixed seed), so a failure here reproduces exactly.
  * Acceptable outcomes: a plan, a typed ParseError, an
  * IllegalArgument/UnsupportedOperation, or Spark's own
  * AnalysisException. Anything else is a bug.
  */
class PlannerFuzzSpec extends SparkTestBase {
  import spark.implicits._

  private val N = 300

  private val logqlSeeds = Seq(
    """{app="web"} |= "err" | json | level = "error" | line_format "{{.msg}}"""",
    """sum by (et) (rate({app="web"} | logfmt [5m])) / on(et) group_left count_over_time({}[5m])""",
    """quantile_over_time(0.9, {app="a"} | unwrap dur [1h]) by (svc)""")
  private val promqlSeeds = Seq(
    """histogram_quantile(0.9, sum by (le) (rate(http_bucket[5m])))""",
    """holt_winters(disk{a="b"}[1h], 0.5, 0.3) atan2 scalar(sum(x))""",
    """label_replace(rate(x[5m] offset 1h), "a", "$1", "b", "(.*)")""")
  private val traceqlSeeds = Seq(
    """{ status = error && span.db.name =~ "p.*" } >> { duration > 10ms } | by(name) | count() > 2""",
    """{} | compare({ status = error }, 10, 100, 200)""",
    """{ parent.name = "root" } ~ { event:name = "exception" }""")

  private val junkChars = "{}()[]|=~!<>,.\"'$%^&*-+/ :@abz019".toCharArray

  private def mutate(rnd: Random, seeds: Seq[String]): String = {
    val seed = seeds(rnd.nextInt(seeds.length))
    val pos = rnd.nextInt(seed.length + 1)
    rnd.nextInt(3) match {
      case 0 => seed.substring(0, pos) +
        seed.substring(math.min(pos + 3, seed.length))
      case 1 =>
        val ins = Array.fill(3)(junkChars(rnd.nextInt(junkChars.length))).mkString
        seed.substring(0, pos) + ins + seed.substring(pos)
      case 2 => seed.substring(0, pos)
    }
  }

  private def logs = Seq((1000000000L, "err x", Map("app" -> "web")))
    .toDF("ts_ns", "body", "labels")
  private def points = Seq(
    (1000000L, "x", Map("a" -> "b"), 1.0),
    (1000000L, "http_bucket", Map("le" -> "0.1"), 1.0),
    (1000000L, "disk", Map("a" -> "b"), 1.0))
    .toDF("ts_us", "name", "labels", "value")
  private def spans = Seq(
    (1L, 1L, None: Option[Long], "root", 1000L, 500L, Map("service.name" -> "api")))
    .toDF("trace_id", "span_id", "parent_span_id", "name", "start_ns",
      "duration_ns", "attrs")

  private def cleanly(lang: String, plan: String => Any)(q: String): Unit =
    try { plan(q); () }
    catch {
      case _: graft.logql.Parser.ParseError          => ()
      case _: graft.promql.PromQL.ParseError         => ()
      case _: graft.traceql.TraceQL.ParseError       => ()
      case _: graft.logql.Template.TemplateError     => () // bad {{...}} body
      case _: IllegalArgumentException               => ()
      case _: UnsupportedOperationException          => ()
      case _: org.apache.spark.sql.AnalysisException => ()
      case e: Throwable =>
        fail(s"$lang planner crashed on '$q' → " +
          s"${e.getClass.getName}: ${e.getMessage}")
    }

  /** Execution stage: for inputs that PLAN, also run the job. Runtime
    * user-input failures (an invalid regex reaching rlike, a bad
    * capture group in label_replace) surface as Spark's typed
    * SparkRuntimeException — acceptable; an engine NPE/MatchError
    * inside a task is not and fails with the reproducing input.
    */
  private def execCleanly(lang: String, plan: String => org.apache.spark.sql.DataFrame)(q: String): Unit = {
    val df =
      try Some(plan(q))
      catch { case _: Throwable => None } // plan-stage outcomes covered above
    df.foreach { d =>
      try { d.collect(); () }
      catch {
        // typed runtime input errors (e.g. a user regex reaching rlike)
        case e: Throwable
          if e.getClass.getSimpleName == "SparkRuntimeException" ||
            (e.getMessage != null &&
              (e.getMessage.contains("INVALID_PARAMETER_VALUE") ||
                e.getMessage.contains("PatternSyntaxException"))) => ()
        case e: Throwable =>
          fail(s"$lang execution crashed on '$q' → " +
            s"${e.getClass.getName}: ${e.getMessage}")
      }
    }
  }

  test("LogQL plans also EXECUTE cleanly on mutated inputs") {
    val rnd = new Random(142)
    val l = logs
    (1 to 60).foreach { _ =>
      execCleanly("LogQL", q => graft.logql.Planner.query(q, l))(
        mutate(rnd, logqlSeeds))
    }
  }

  test("PromQL plans also EXECUTE cleanly on mutated inputs") {
    val rnd = new Random(143)
    val p = points
    (1 to 60).foreach { _ =>
      execCleanly("PromQL",
        q => graft.promql.PromQL.range(q, p, Some(60000000L)))(
        mutate(rnd, promqlSeeds))
    }
  }

  test("TraceQL plans also EXECUTE cleanly on mutated inputs") {
    val rnd = new Random(144)
    val s = spans
    (1 to 60).foreach { _ =>
      execCleanly("TraceQL", q => graft.traceql.TraceQL.matchSpans(q, s))(
        mutate(rnd, traceqlSeeds))
    }
  }

  test("LogQL parse→plan fails cleanly on mutated inputs") {
    val rnd = new Random(42)
    val l = logs
    (1 to N).foreach { _ =>
      cleanly("LogQL", q => graft.logql.Planner.query(q, l).schema)(
        mutate(rnd, logqlSeeds))
    }
  }

  test("PromQL parse→plan fails cleanly on mutated inputs") {
    val rnd = new Random(43)
    val p = points
    (1 to N).foreach { _ =>
      cleanly("PromQL",
        q => graft.promql.PromQL.range(q, p, Some(60000000L)).schema)(
        mutate(rnd, promqlSeeds))
    }
  }

  test("TraceQL parse→plan fails cleanly on mutated inputs") {
    val rnd = new Random(44)
    val s = spans
    (1 to N).foreach { _ =>
      cleanly("TraceQL", q => graft.traceql.TraceQL.matchSpans(q, s).schema)(
        mutate(rnd, traceqlSeeds))
    }
  }
}
