package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.logql.Parser

/** Grammar coverage against the reference's LogQL compliance corpus
  * (dev/local/ch-logql-compliance/logql-test-queries.yml, 98 templated
  * queries; substitutions from internal/lokicompliance/expand.go).
  * Same ledger contract as PromQLComplianceSpec: supported queries must
  * parse, known-unsupported must keep throwing.
  */
class LogQLComplianceSpec extends AnyFunSuite {

  private val simpleRangeAggOps = Seq("count_over_time", "rate",
    "bytes_over_time", "bytes_rate")
  private val unwrapRangeAggOps = Seq("rate_counter", "avg_over_time",
    "sum_over_time", "min_over_time", "max_over_time", "stdvar_over_time",
    "stddev_over_time", "first_over_time", "last_over_time")
  private val groupRangeAggOps = Seq("avg_over_time", "stddev_over_time",
    "stdvar_over_time", "max_over_time", "min_over_time", "first_over_time",
    "last_over_time")
  private val unwrapExprs = Seq("unwrap status", "unwrap duration(took)",
    "unwrap bytes(size)")
  private val vecAggOps = Seq("sum", "avg", "max", "min", "count", "stddev", "stdvar")

  private val supported: Seq[String] =
    Seq(
      // vector literal arithmetic
      "vector(1) + vector(2) / vector(3)",
      "vector(2) * vector(3) % vector(2)",
      "vector(4) % vector(3) * vector(2)",
      "vector(1) * vector(2) + vector(4) / vector(6) - vector(10) % vector(2) ^ vector(2)",
      "( vector(1) + vector(2) ) / vector(3)",
      "vector(2) * ( vector(3) % vector(2) )",
      // selectors
      """{this_label_clearly_not_exist=".+"}""",
      """{job="varlogs", this_label_clearly_not_exist="varlogs"}""",
      """{job="varlogs"}""",
      """{job=~".*varlogs.*"}""",
      """{job="varlogs", this_label_clearly_not_exist!="varlogs"}""",
      // line filters
      """{job="varlogs"} |= "no way line would contain this message"""",
      """{job="varlogs"} |= "HEAD"""",
      """{job="varlogs"} != "HEAD"""",
      """{job="varlogs"} |~ "(HEAD|GET)"""",
      """{job="varlogs"} !~ "(HEAD|GET)"""",
      """{job="varlogs"} |= "HEAD" or "GET"""",
      """{job="varlogs"} != "HEAD" or "GET"""",
      """{job="varlogs"} |= ip("127.0.0.1")""",
      """{job="varlogs"} |= ip("127.0.0.1") or ip("192.168.1.0/24")""",
      """{job="varlogs"} != ip("127.0.0.1")""",
      """{job="varlogs"} |= ip("127.0.0.0/24")""",
      """{job="varlogs"} |= ip("127.0.0.1-127.0.0.6")""",
      """{job="varlogs"} |> "no way line would contain <_> pattern"""",
      """{job="varlogs"} !> "no way line would contain <_> pattern"""",
      // parsers + label filters
      """{job="varlogs"} | json""",
      """{job="varlogs"} | json method""",
      """{job="varlogs"} | json method_name="method"""",
      """{job="varlogs"} | regexp `\{.*"method":"(?P<method>\w+)".*\}` | method = "HEAD"""",
      """{job="varlogs"} | pattern `<_>"method":"<method>"<_>` | method = "HEAD"""",
      """{job="varlogs"} | json | method = "HEAD"""",
      """{job="varlogs"} | json | method != "HEAD"""",
      """{job="varlogs"} | json | method =~ "(HEAD|GET)"""",
      """{job="varlogs"} | json | method !~ "(HEAD|GET)"""",
      """{job="varlogs"} | json | status >= 400""",
      """{job="varlogs"} | json | took >= 1ms""",
      """{job="varlogs"} | json | size >= 1KB""",
      """{job="varlogs"} | json | remote_ip = ip("127.0.0.1")""",
      """{job="varlogs"} | json | remote_ip = ip("127.0.0.0/24")""",
      """{job="varlogs"} | json | remote_ip = ip("127.0.0.1-127.0.0.6")""",
      """{job="varlogs"} | json | status > 400 or took >= 1ms""",
      """{job="varlogs"} | json | took >= 1ms and size >= 1KB""",
      """{job="varlogs"} | json status | status > 0 and status < 0""",
      """{job="varlogs"} | json | status > 1000 and status < 0 or method != "HEAD"""",
      """{job="varlogs"} | json | status > 1000 and (status < 0 or method != "HEAD")""",
      """{job="varlogs"} | decolorize""",
      // label_format / line_format
      """{job="varlogs"} | json | label_format status_code=status | status_code >= 400""",
      // multi-line forms (whitespace-insensitive grammar)
      "count_over_time(\n  {job=\"varlogs\"} [1m]\n)",
      "absent_over_time(\n  {job=\"varlogs\"} [1m]\n)",
      "absent_over_time(\n  {job=\"varlogs\"} |= \"no way\" [1m]\n)"
    ) ++
      simpleRangeAggOps.map(op => s"""$op({job="varlogs"} [1m])""") ++
      simpleRangeAggOps.map(op => s"""$op({job="varlogs"} [1m] offset 30s)""") ++
      unwrapRangeAggOps.flatMap(op => unwrapExprs.map(u =>
        s"""$op({job="varlogs"} | json | $u [1m])""")) ++
      groupRangeAggOps.map(op =>
        s"""$op ({job="varlogs"} | json | unwrap status [1m]) by (method)""") ++
      groupRangeAggOps.map(op =>
        s"""$op ({job="varlogs"} | json status,took,size | unwrap status [1m]) by (method, status)""") ++
      Seq(
        """min_over_time ({job="varlogs"} | json status,took,size | unwrap status [1m]) without (filename)""",
        """quantile_over_time(0.90, {job="varlogs"} | json status,took,size | unwrap duration(took) [1m])""",
        """quantile_over_time(0.90, {job="varlogs"} | json status,took,size | unwrap bytes(size) [1m]) by (filename)""",
        """quantile_over_time(0.90, {job="varlogs"} | json status,took,size | unwrap status [1m]) without (job)""") ++
      vecAggOps.map(op => s"""$op(count_over_time({job="varlogs"} [1m]))""") ++
      Seq("sort", "sort_desc").map(op => s"""$op(count_over_time({job="varlogs"} [1m]))""") ++
      Seq("topk", "bottomk").map(op => s"""$op(3, count_over_time({job="varlogs"} [1m]))""") ++
      // bare scalar literal queries + scalar-only arithmetic
      // (engine_literal_query.go: the literal at every grid step)
      Seq("42", "1.234", ".123", "1.23e-3", "1 + 2 / 3", "2 * 3 % 2") ++
      // line_format built-in template variables
      Seq("""{job="varlogs"} | line_format "{{ __timestamp__ }}"""",
        """{job="varlogs"} | line_format "{{ __line__ }}"""")

  /** Corpus queries the grammar intentionally rejects today. */
  private val knownUnsupported: Seq[String] = Seq(
    // trailing comment
    """{job="varlogs"} # anything that comes after will not be interpreted""",
    // comma / juxtaposition label-filter chaining
    """{job="varlogs"} | json | took >= 1ms, size >= 1KB""",
    """{job="varlogs"} | json | took >= 1ms size >= 1KB""",
    """{job="varlogs"} | json | (status > 1000, status < 0) or method != "HEAD""""
  )

  test("LogQL compliance corpus: every supported query parses") {
    val failures = supported.flatMap { q =>
      try { Parser.parse(q); None }
      catch { case e: Throwable => Some(s"$q -> ${e.getMessage}") }
    }
    assert(failures.isEmpty, s"\n${failures.mkString("\n")}")
  }

  test("LogQL compliance corpus: known-unsupported queries still throw") {
    val landed = knownUnsupported.flatMap { q =>
      try { Parser.parse(q) match { case _ => Some(q) } }
      catch { case _: Throwable => None }
    }
    assert(landed.isEmpty,
      s"now parse — move to `supported` and add planner coverage:\n${landed.mkString("\n")}")
  }
}
