package graft

import org.apache.spark.sql.DataFrame

import graft.logql.{Parser, Planner}

/** Grammar coverage against the reference's LogQL compliance corpus
  * (dev/local/ch-logql-compliance/logql-test-queries.yml, 98 templated
  * queries; substitutions from internal/lokicompliance/expand.go).
  * Same ledger contract as PromQLComplianceSpec: supported queries must
  * parse, known-unsupported must keep throwing.
  *
  * Beyond the parse ledger, the corpus EXECUTES (the reference's
  * compliance tester compares results against real Loki,
  * internal/lokicompliance/compare.go; here the oracle is a native
  * Scala re-evaluation over a fixed 8-line fixture): every log-query
  * shape is pinned to an expected row count, and the whole metric
  * matrix (range aggs, unwrap conversions, by/without grouping, vector
  * aggs) is compared value-for-value against the independent
  * evaluator — a parser feature the planner silently ignores (the
  * round-4 by/without trap) fails here.
  */
class LogQLComplianceSpec extends SparkTestBase {

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
        """{job="varlogs"} | line_format "{{ __line__ }}"""") ++
      // round-6 additions: trailing comment, comma/juxtaposition
      // label-filter chaining (upstream grammar; previously rejected)
      Seq(
        """{job="varlogs"} # anything that comes after will not be interpreted""",
        """{job="varlogs"} | json | took >= 1ms, size >= 1KB""",
        """{job="varlogs"} | json | took >= 1ms size >= 1KB""",
        """{job="varlogs"} | json | (status > 1000, status < 0) or method != "HEAD"""")

  /** Corpus queries the grammar intentionally rejects today (round 6:
    * comments and comma/juxtaposition chaining landed, emptying it).
    */
  private val knownUnsupported: Seq[String] = Nil

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

  // ------------------------------------------------------------------
  // Executed ledger: the corpus against a fixed fixture, results
  // checked against a native (non-Spark) re-evaluation.
  // ------------------------------------------------------------------

  /** One fixture line in the lokicompliance world. */
  private case class L(i: Int) {
    val tsNs: Long = i * 5000000000L // 0..35s, one [1m] bucket
    val filename: String = if (i < 4) "/var/log/a.log" else "/var/log/b.log"
    val method: String = if (i % 2 == 0) "GET" else "HEAD"
    val status: Int = Seq(200, 201, 404, 405, 500, 501, 202, 203)(i)
    val took: String = s"${i * 500}us"
    val size: String = s"${i}KB"
    val remoteIp: String = s"127.0.0.$i"
    val body: String =
      s"""{"method":"$method","status":$status,"took":"$took","size":"$size","remote_ip":"$remoteIp"}"""
    val streamLabels: Map[String, String] =
      Map("job" -> "varlogs", "filename" -> filename)
    // all-field json extraction renders every value as a string
    val jsonLabels: Map[String, String] = Map(
      "method" -> method, "status" -> status.toString, "took" -> took,
      "size" -> size, "remote_ip" -> remoteIp)
    def tookSec: Double = i * 500 / 1e6
    // go-humanize convention (the reference's parser): KB = 1000
    def sizeBytes: Double = i * 1000.0
  }
  private val lines: Seq[L] = (0 until 8).map(L)

  private lazy val fixture: DataFrame = {
    import spark.implicits._
    lines.map(l => (l.tsNs, l.body, l.streamLabels))
      .toDF("ts_ns", "body", "labels")
  }

  /** Expected surviving-line counts for every log-query corpus entry
    * (derived from the 8-line fixture; GET rows are even i, statuses
    * ≥400 are i∈2..5, took≥1ms is i≥2, size≥1KB is i≥1, remote_ip is
    * 127.0.0.i).
    */
  private val logQueryCounts: Seq[(String, Int)] = Seq(
    """{job="varlogs"}""" -> 8,
    """{job=~".*varlogs.*"}""" -> 8,
    """{this_label_clearly_not_exist=".+"}""" -> 0,
    """{job="varlogs", this_label_clearly_not_exist="varlogs"}""" -> 0,
    // missing label is the empty string: != matches
    """{job="varlogs", this_label_clearly_not_exist!="varlogs"}""" -> 8,
    """{job="varlogs"} |= "no way line would contain this message"""" -> 0,
    """{job="varlogs"} |= "HEAD"""" -> 4,
    """{job="varlogs"} != "HEAD"""" -> 4,
    """{job="varlogs"} |~ "(HEAD|GET)"""" -> 8,
    """{job="varlogs"} !~ "(HEAD|GET)"""" -> 0,
    """{job="varlogs"} |= "HEAD" or "GET"""" -> 8,
    """{job="varlogs"} != "HEAD" or "GET"""" -> 0,
    """{job="varlogs"} |= ip("127.0.0.1")""" -> 1,
    """{job="varlogs"} |= ip("127.0.0.1") or ip("192.168.1.0/24")""" -> 1,
    """{job="varlogs"} != ip("127.0.0.1")""" -> 7,
    """{job="varlogs"} |= ip("127.0.0.0/24")""" -> 8,
    """{job="varlogs"} |= ip("127.0.0.1-127.0.0.6")""" -> 6,
    """{job="varlogs"} |> "no way line would contain <_> pattern"""" -> 0,
    """{job="varlogs"} !> "no way line would contain <_> pattern"""" -> 8,
    """{job="varlogs"} | json""" -> 8,
    """{job="varlogs"} | json method""" -> 8,
    """{job="varlogs"} | json method_name="method"""" -> 8,
    """{job="varlogs"} | regexp `\{.*"method":"(?P<method>\w+)".*\}` | method = "HEAD"""" -> 4,
    """{job="varlogs"} | pattern `<_>"method":"<method>"<_>` | method = "HEAD"""" -> 4,
    """{job="varlogs"} | json | method = "HEAD"""" -> 4,
    """{job="varlogs"} | json | method != "HEAD"""" -> 4,
    """{job="varlogs"} | json | method =~ "(HEAD|GET)"""" -> 8,
    """{job="varlogs"} | json | method !~ "(HEAD|GET)"""" -> 0,
    """{job="varlogs"} | json | status >= 400""" -> 4,
    """{job="varlogs"} | json | took >= 1ms""" -> 6,
    """{job="varlogs"} | json | size >= 1KB""" -> 7,
    """{job="varlogs"} | json | remote_ip = ip("127.0.0.1")""" -> 1,
    """{job="varlogs"} | json | remote_ip = ip("127.0.0.0/24")""" -> 8,
    """{job="varlogs"} | json | remote_ip = ip("127.0.0.1-127.0.0.6")""" -> 6,
    """{job="varlogs"} | json | status > 400 or took >= 1ms""" -> 6,
    """{job="varlogs"} | json | took >= 1ms and size >= 1KB""" -> 6,
    """{job="varlogs"} | json status | status > 0 and status < 0""" -> 0,
    """{job="varlogs"} | json | status > 1000 and status < 0 or method != "HEAD"""" -> 4,
    """{job="varlogs"} | json | status > 1000 and (status < 0 or method != "HEAD")""" -> 0,
    """{job="varlogs"} | decolorize""" -> 8,
    """{job="varlogs"} | json | label_format status_code=status | status_code >= 400""" -> 4,
    """{job="varlogs"} | line_format "{{ __timestamp__ }}"""" -> 8,
    """{job="varlogs"} | line_format "{{ __line__ }}"""" -> 8,
    // round-6 grammar additions, executed
    """{job="varlogs"} # anything that comes after will not be interpreted""" -> 8,
    """{job="varlogs"} | json | took >= 1ms, size >= 1KB""" -> 6,
    """{job="varlogs"} | json | took >= 1ms size >= 1KB""" -> 6,
    """{job="varlogs"} | json | (status > 1000, status < 0) or method != "HEAD"""" -> 4)

  test("executed ledger: log-query corpus row counts") {
    val failures = logQueryCounts.flatMap { case (q, expected) =>
      try {
        val n = Planner.query(q, fixture).count()
        if (n == expected) None else Some(s"$q -> got $n, want $expected")
      } catch { case e: Throwable => Some(s"$q -> threw ${e.getMessage}") }
    }
    assert(failures.isEmpty, s"\n${failures.mkString("\n")}")
  }

  // ---- native metric evaluation (the in-test oracle) ----

  private def pop(xs: Seq[Double], f: Seq[Double] => Double): Double = f(xs)

  private def nativeOp(op: String, param: Option[Double],
      rows: Seq[(Long, Double, String)]): Double = {
    // rows: (tsNs, unwrapped value, body)
    val vs = rows.map(_._2)
    op match {
      case "count_over_time" => rows.size.toDouble
      case "rate"            => rows.size.toDouble / 60.0
      case "bytes_over_time" => rows.map(_._3.length.toDouble).sum
      case "bytes_rate"      => rows.map(_._3.length.toDouble).sum / 60.0
      case "sum_over_time"   => vs.sum
      case "avg_over_time"   => vs.sum / vs.size
      case "min_over_time"   => vs.min
      case "max_over_time"   => vs.max
      case "first_over_time" => rows.minBy(_._1)._2
      case "last_over_time"  => rows.maxBy(_._1)._2
      case "stdvar_over_time" =>
        val m = vs.sum / vs.size; vs.map(x => (x - m) * (x - m)).sum / vs.size
      case "stddev_over_time" =>
        val m = vs.sum / vs.size
        math.sqrt(vs.map(x => (x - m) * (x - m)).sum / vs.size)
      case "quantile_over_time" =>
        val sorted = vs.sorted
        val rank = param.get * (sorted.size - 1)
        val lo = sorted(rank.toInt)
        val hi = sorted(math.min(rank.toInt + 1, sorted.size - 1))
        lo + (hi - lo) * (rank - rank.toInt)
    }
  }

  /** Evaluates `op({job="varlogs"} | json [fields] | unwrap X [1m])
    * [by|without (...)]` natively: labels = stream ++ extracted json
    * fields; unwrap conversion per expr; grouping regroups BEFORE the
    * (single-bucket) window agg — the semantics the round-4 trap
    * silently dropped.
    */
  private def nativeRangeAgg(op: String, param: Option[Double],
      jsonFields: Option[Set[String]], unwrapExpr: Option[String],
      by: Seq[String], without: Seq[String]): Map[Map[String, String], Double] = {
    def labelsOf(l: L): Map[String, String] = {
      val extracted = jsonFields match {
        case None     => l.jsonLabels
        case Some(fs) => l.jsonLabels.view.filterKeys(fs).toMap
      }
      l.streamLabels ++ extracted
    }
    def unwrapped(l: L): Double = unwrapExpr match {
      case Some("unwrap status")         => l.status.toDouble
      case Some("unwrap duration(took)") => l.tookSec
      case Some("unwrap bytes(size)")    => l.sizeBytes
      case None                          => 0.0
      case other => fail(s"unknown unwrap $other")
    }
    def grouped(labels: Map[String, String]): Map[String, String] =
      if (by.nonEmpty) labels.view.filterKeys(by.contains).toMap
      else if (without.nonEmpty) labels.view.filterKeys(k => !without.contains(k)).toMap
      else labels
    lines.groupBy(l => grouped(labelsOf(l)))
      .view.mapValues(ls =>
        nativeOp(op, param, ls.map(l => (l.tsNs, unwrapped(l), l.body))))
      .toMap
  }

  private def runMetric(q: String): Map[Map[String, String], Double] =
    Planner.query(q, fixture).collect().map { r =>
      r.getAs[Map[String, String]]("labels") -> r.getAs[Double]("value")
    }.toMap

  private def assertSeries(q: String,
      expected: Map[Map[String, String], Double]): Unit = {
    val got = runMetric(q)
    assert(got.keySet == expected.keySet,
      s"$q series mismatch:\n got ${got.keySet}\n want ${expected.keySet}")
    expected.foreach { case (k, v) =>
      assert(math.abs(got(k) - v) <= math.abs(v) * 1e-9 + 1e-12,
        s"$q value mismatch at $k: got ${got(k)}, want $v")
    }
  }

  test("executed ledger: simple range aggs per stream") {
    for (op <- simpleRangeAggOps)
      assertSeries(s"""$op({job="varlogs"} [1m])""",
        nativeRangeAgg(op, None, Some(Set.empty), None, Nil, Nil))
  }

  test("executed ledger: unwrap agg matrix (all conversions)") {
    // rate_counter applies extrapolation; it has its own oracle entry
    for {
      op <- unwrapRangeAggOps if op != "rate_counter"
      u <- unwrapExprs
    } assertSeries(s"""$op({job="varlogs"} | json | $u [1m])""",
      nativeRangeAgg(op, None, None, Some(u), Nil, Nil))
  }

  test("executed ledger: grouped range aggs regroup BEFORE the window") {
    for (op <- groupRangeAggOps) {
      assertSeries(
        s"""$op ({job="varlogs"} | json | unwrap status [1m]) by (method)""",
        nativeRangeAgg(op, None, None, Some("unwrap status"),
          Seq("method"), Nil))
      assertSeries(
        s"""$op ({job="varlogs"} | json status,took,size | unwrap status [1m]) by (method, status)""",
        nativeRangeAgg(op, None, Some(Set("status", "took", "size")),
          Some("unwrap status"), Seq("method", "status"), Nil))
    }
    assertSeries(
      """min_over_time ({job="varlogs"} | json status,took,size | unwrap status [1m]) without (filename)""",
      nativeRangeAgg("min_over_time", None, Some(Set("status", "took", "size")),
        Some("unwrap status"), Nil, Seq("filename")))
    assertSeries(
      """quantile_over_time(0.90, {job="varlogs"} | json status,took,size | unwrap duration(took) [1m])""",
      nativeRangeAgg("quantile_over_time", Some(0.90),
        Some(Set("status", "took", "size")), Some("unwrap duration(took)"), Nil, Nil))
    assertSeries(
      """quantile_over_time(0.90, {job="varlogs"} | json status,took,size | unwrap bytes(size) [1m]) by (filename)""",
      nativeRangeAgg("quantile_over_time", Some(0.90),
        Some(Set("status", "took", "size")), Some("unwrap bytes(size)"),
        Seq("filename"), Nil))
    assertSeries(
      """quantile_over_time(0.90, {job="varlogs"} | json status,took,size | unwrap status [1m]) without (job)""",
      nativeRangeAgg("quantile_over_time", Some(0.90),
        Some(Set("status", "took", "size")), Some("unwrap status"), Nil, Seq("job")))
  }

  test("executed ledger: vector aggs over count_over_time") {
    // per-stream counts: a → 4, b → 4 (one bucket)
    val counts = nativeRangeAgg("count_over_time", None, Some(Set.empty),
      None, Nil, Nil).values.toSeq
    def vagg(op: String): Double = op match {
      case "sum"   => counts.sum
      case "avg"   => counts.sum / counts.size
      case "max"   => counts.max
      case "min"   => counts.min
      case "count" => counts.size.toDouble
      case "stddev" =>
        val m = counts.sum / counts.size
        math.sqrt(counts.map(x => (x - m) * (x - m)).sum / counts.size)
      case "stdvar" =>
        val m = counts.sum / counts.size
        counts.map(x => (x - m) * (x - m)).sum / counts.size
    }
    for (op <- vecAggOps)
      assertSeries(s"""$op(count_over_time({job="varlogs"} [1m]))""",
        Map(Map.empty[String, String] -> vagg(op)))
    // topk(3)/bottomk/sort keep both per-stream series intact
    for (op <- Seq("sort", "sort_desc"))
      assert(runMetric(s"""$op(count_over_time({job="varlogs"} [1m]))""").size == 2)
    for (op <- Seq("topk", "bottomk"))
      assert(runMetric(s"""$op(3, count_over_time({job="varlogs"} [1m]))""").size == 2)
  }
}
