package graft

import java.net.{HttpURLConnection, URI, URLEncoder}

import org.apache.spark.sql.DataFrame

import graft.api.HttpApi

/** The reference's LogQL compliance corpus (dev/local/
  * ch-logql-compliance/logql-test-queries.yml; variant table
  * internal/lokicompliance/expand.go) executed END-TO-END through
  * `/loki/api/v1/query_range` and value-checked against goldens from
  * an INDEPENDENT evaluator (tools/gen_logql_compliance_golden.py:
  * DuckDB-hosted fixture + a from-scratch python implementation of
  * upstream Loki semantics — selectors, line filters incl. ip(),
  * extractors, typed label filters, formats, range/vector
  * aggregations, unwrap samplers, binops). Shared fixture in
  * logql_compliance_lines.csv; regenerate both with
  * `python3 tools/gen_logql_compliance_golden.py` (driver-side).
  *
  * Log queries compare full per-stream entry lists (ts + line);
  * metric queries compare values on the shared step grid
  * t ∈ {60..540 step 60}s (the engine's data-driven fan-out may
  * extend past the last sample — envelope, not semantics).
  */
class LogQLComplianceE2ESpec extends SparkTestBase {
  import spark.implicits._

  private val EvalSteps = (60L to 540L by 60L).toSet

  private def resource(name: String): String = {
    val is = getClass.getResourceAsStream("/" + name)
    require(is != null, s"missing test resource $name")
    try new String(is.readAllBytes(), "UTF-8") finally is.close()
  }

  /** fixture CSV rows: ts_ns,"labels-json","body" (quotes doubled). */
  private lazy val logs: DataFrame = {
    val rows = resource("logql_compliance_lines.csv").linesIterator.drop(1)
      .map { line =>
        val c1 = line.indexOf(',')
        val ts = line.substring(0, c1).toLong
        // labels json is the first quoted field; body the second
        val rest = line.substring(c1 + 1)
        // split `"...","..."` at the `","` boundary
        val mid = rest.indexOf("\",\"")
        val labelsJson = rest.substring(1, mid).replace("\"\"", "\"")
        val body = rest.substring(mid + 3, rest.length - 1).replace("\"\"", "\"")
        val labels = TestJson.parse(labelsJson).asInstanceOf[Map[String, Any]]
          .map { case (k, v) => k -> v.asInstanceOf[String] }
        (ts, body, labels)
      }.toSeq
    rows.toDF("ts_ns", "body", "labels")
  }

  private lazy val golden: Map[String, Map[String, Any]] =
    TestJson.parse(resource("logql_compliance_golden.json"))
      .asInstanceOf[Map[String, Any]]
      .map { case (q, e) => q -> e.asInstanceOf[Map[String, Any]] }

  private def get(url: String): (Int, String) = {
    val conn = URI.create(url).toURL.openConnection().asInstanceOf[HttpURLConnection]
    conn.setRequestMethod("GET")
    val code = conn.getResponseCode
    val is = if (code >= 400) conn.getErrorStream else conn.getInputStream
    val body = new String(is.readAllBytes(), "UTF-8")
    is.close()
    (code, body)
  }

  private def parseVal(s: String): Double = s match {
    case "NaN"                       => Double.NaN
    case "Inf" | "Infinity" | "+Inf" => Double.PositiveInfinity
    case "-Inf" | "-Infinity"        => Double.NegativeInfinity
    case x                           => x.toDouble
  }

  private def close(a: Double, b: Double): Boolean =
    (a.isNaN && b.isNaN) || a == b ||
      math.abs(a - b) <= math.abs(b) * 1e-6 + 1e-9

  private def labelKey(m: Map[String, Any]): String =
    m.toSeq.sortBy(_._1).map { case (k, v) => s"$k=$v" }.mkString("{", ",", "}")

  private def matrixOf(result: List[Any]): Map[String, Map[Long, Double]] =
    result.map { s =>
      val m = s.asInstanceOf[Map[String, Any]]
      val vals = m("values").asInstanceOf[List[Any]].flatMap { p =>
        val pair = p.asInstanceOf[List[Any]]
        val sec = pair.head match {
          case d: Double => d.toLong
          case s: String => s.toDouble.toLong
        }
        val v = pair(1) match {
          case s: String => parseVal(s)
          case d: Double => d
        }
        if (EvalSteps(sec)) Some(sec -> v) else None
      }.toMap
      labelKey(m("metric").asInstanceOf[Map[String, Any]]) -> vals
    }.filter(_._2.nonEmpty).toMap

  private def streamsOf(result: List[Any]): Map[String, List[(String, String)]] =
    result.map { s =>
      val m = s.asInstanceOf[Map[String, Any]]
      val entries = m("values").asInstanceOf[List[Any]].map { p =>
        val pair = p.asInstanceOf[List[Any]]
        (pair.head.asInstanceOf[String], pair(1).asInstanceOf[String])
      }
      labelKey(m("stream").asInstanceOf[Map[String, Any]]) -> entries
    }.filter(_._2.nonEmpty).toMap

  test("LogQL compliance corpus end-to-end vs independent goldens") {
    val api = new HttpApi(logs, spark.emptyDataFrame,
      Seq.empty[(Long, Long, Option[Long], String, Long, Long, Map[String, String])]
        .toDF("trace_id", "span_id", "parent_span_id", "name", "start_ns",
          "duration_ns", "attrs"))
    val port = api.start()
    try {
      val failures = Seq.newBuilder[String]
      var nOk = 0
      golden.toSeq.sortBy(_._1).foreach { case (q, entry) =>
        val enc = URLEncoder.encode(q, "UTF-8")
        val (code, body) = get(s"http://127.0.0.1:$port/loki/api/v1/query_range" +
          s"?query=$enc&step=60&limit=5000&direction=forward")
        if (code != 200) {
          failures += s"$q: engine error $code: ${body.take(200)}"
        } else {
          val parsed = TestJson.parse(body).asInstanceOf[Map[String, Any]]
          val data = parsed("data").asInstanceOf[Map[String, Any]]
          val result = data("result").asInstanceOf[List[Any]]
          if (entry("kind") == "streams") {
            val got = streamsOf(result)
            val want = entry("streams").asInstanceOf[List[Any]].map { s =>
              val m = s.asInstanceOf[Map[String, Any]]
              labelKey(m("stream").asInstanceOf[Map[String, Any]]) ->
                m("values").asInstanceOf[List[Any]].map { p =>
                  val pair = p.asInstanceOf[List[Any]]
                  (pair.head.asInstanceOf[String], pair(1).asInstanceOf[String])
                }
            }.toMap
            if (got.keySet != want.keySet)
              failures += s"$q: stream set\n  got  ${got.keySet.toSeq.sorted.take(4).mkString("; ")}\n  want ${want.keySet.toSeq.sorted.take(4).mkString("; ")}"
            else {
              val bad = want.toSeq.sortBy(_._1).collectFirst {
                case (k, wes) if got(k) != wes =>
                  val g = got(k)
                  val firstDiff = wes.zip(g).indexWhere { case (a, b) => a != b }
                  s"$q $k: entries ${g.size}/${wes.size}, first diff at $firstDiff:" +
                    s"\n  got  ${g.lift(firstDiff)}\n  want ${wes.lift(firstDiff)}"
              }
              bad match {
                case Some(err) => failures += err
                case None      => nOk += 1
              }
            }
          } else {
            val got = matrixOf(result)
            val want = entry("series").asInstanceOf[List[Any]].map { s =>
              val m = s.asInstanceOf[Map[String, Any]]
              labelKey(m("metric").asInstanceOf[Map[String, Any]]) ->
                m("values").asInstanceOf[List[Any]].map { p =>
                  val pair = p.asInstanceOf[List[Any]]
                  pair.head.asInstanceOf[Double].toLong ->
                    parseVal(pair(1).asInstanceOf[String])
                }.toMap
            }.toMap
            if (got.keySet != want.keySet)
              failures += s"$q: series set\n  got  ${got.keySet.toSeq.sorted.mkString("; ")}\n  want ${want.keySet.toSeq.sorted.mkString("; ")}"
            else {
              val bad = want.toSeq.sortBy(_._1).flatMap { case (k, wvals) =>
                val gvals = got(k)
                if (gvals.keySet != wvals.keySet)
                  Some(s"$q $k: steps got ${gvals.keySet.toSeq.sorted} want ${wvals.keySet.toSeq.sorted}")
                else wvals.toSeq.sortBy(_._1).collectFirst {
                  case (sec, wv) if !close(gvals(sec), wv) =>
                    s"$q $k @$sec: got ${gvals(sec)} want $wv"
                }
              }
              bad.headOption match {
                case Some(err) => failures += err
                case None      => nOk += 1
              }
            }
          }
        }
      }
      val fs = failures.result()
      info(s"corpus: ${golden.size} queries, $nOk ok, ${fs.size} failing")
      assert(fs.isEmpty,
        s"\n${fs.size} corpus failures (showing up to 40):\n${fs.take(40).mkString("\n")}")
    } finally api.stop()
  }

  test("LogQL corpus ledger stays complete") {
    assert(golden.size >= 500, s"corpus shrank: ${golden.size}")
    val empties = golden.count(_._2.get("should_be_empty").contains(true))
    assert(empties >= 10, s"expected the should_be_empty entries, saw $empties")
  }
}
