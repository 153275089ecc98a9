package graft

import java.net.{HttpURLConnection, URI, URLEncoder}

import org.apache.spark.sql.DataFrame

import graft.api.HttpApi

/** The reference's PromQL compliance corpus (dev/local/ch-compliance/
  * promql-test-queries.yml; expansion table internal/promcompliance/
  * testcases/expand.go) executed END-TO-END through
  * `/api/v1/query_range` and value-checked against goldens computed by
  * an INDEPENDENT evaluator (tools/gen_compliance_golden.py: DuckDB
  * fixture store + a from-scratch python implementation of upstream
  * Prometheus semantics — per-step lookback, extrapolated rates,
  * bucketQuantile, vector matching). Shared inputs live in
  * compliance_points.csv; expected outputs in compliance_golden.json —
  * regenerate both with `python3 tools/gen_compliance_golden.py`
  * (driver-side; duckdb is not a Scala dependency).
  *
  * Comparison runs on the shared evaluation grid t ∈ {60..300 step 60}s:
  * the engine's data-driven grid may extend past the last sample
  * (lookback tail); those envelope buckets are out of scope here, the
  * VALUES on the shared grid are what compliance pins. Known envelope
  * deviation (documented, also visible in the goldens): series labels
  * never carry `__name__` (the reference's encoder edge drops it
  * through every transform; upstream keeps it for bare selectors).
  */
class PromQLComplianceE2ESpec extends SparkTestBase {
  import spark.implicits._

  private val EvalSteps = Set(60L, 120L, 180L, 240L, 300L)

  // ---- tiny recursive-descent JSON reader (test-only) ----
  private object Json {
    def parse(s: String): Any = { val p = new P(s); val v = p.value(); p.ws(); v }
    private final class P(s: String) {
      var i = 0
      def ws(): Unit = while (i < s.length && s.charAt(i).isWhitespace) i += 1
      def value(): Any = {
        ws()
        s.charAt(i) match {
          case '{' => obj()
          case '[' => arr()
          case '"' => str()
          case 't' => i += 4; true
          case 'f' => i += 5; false
          case 'n' => i += 4; null
          case _   => num()
        }
      }
      def obj(): Map[String, Any] = {
        i += 1; ws()
        val b = Map.newBuilder[String, Any]
        if (s.charAt(i) == '}') { i += 1; return b.result() }
        while (true) {
          ws(); val k = str(); ws()
          require(s.charAt(i) == ':'); i += 1
          b += (k -> value()); ws()
          if (s.charAt(i) == ',') i += 1
          else { require(s.charAt(i) == '}'); i += 1; return b.result() }
        }
        b.result()
      }
      def arr(): List[Any] = {
        i += 1; ws()
        val b = List.newBuilder[Any]
        if (s.charAt(i) == ']') { i += 1; return b.result() }
        while (true) {
          b += value(); ws()
          if (s.charAt(i) == ',') i += 1
          else { require(s.charAt(i) == ']'); i += 1; return b.result() }
        }
        b.result()
      }
      def str(): String = {
        require(s.charAt(i) == '"'); i += 1
        val sb = new StringBuilder
        while (s.charAt(i) != '"') {
          val c = s.charAt(i)
          if (c == '\\') {
            i += 1
            s.charAt(i) match {
              case 'n' => sb.append('\n'); case 't' => sb.append('\t')
              case 'r' => sb.append('\r'); case 'b' => sb.append('\b')
              case 'f' => sb.append('\f')
              case 'u' =>
                sb.append(Integer.parseInt(s.substring(i + 1, i + 5), 16).toChar)
                i += 4
              case other => sb.append(other)
            }
          } else sb.append(c)
          i += 1
        }
        i += 1
        sb.toString
      }
      def num(): Double = {
        val st = i
        while (i < s.length && "+-0123456789.eE".indexOf(s.charAt(i)) >= 0) i += 1
        s.substring(st, i).toDouble
      }
    }
  }

  private def resource(name: String): String = {
    val is = getClass.getResourceAsStream("/" + name)
    require(is != null, s"missing test resource $name")
    try new String(is.readAllBytes(), "UTF-8") finally is.close()
  }

  // ---- fixture: compliance_points.csv → the engine's points frame ----
  private lazy val points: DataFrame = {
    val rows = resource("compliance_points.csv").linesIterator.drop(1).map { line =>
      val c1 = line.indexOf(',')
      val c2 = line.indexOf(',', c1 + 1)
      val c3 = line.lastIndexOf(',')
      val ts = line.substring(0, c1).toLong
      val name = line.substring(c1 + 1, c2)
      val labelsJson = line.substring(c2 + 2, c3 - 1).replace("\"\"", "\"")
      val labels = Json.parse(labelsJson).asInstanceOf[Map[String, Any]]
        .map { case (k, v) => k -> v.asInstanceOf[String] }
      val v = line.substring(c3 + 1) match {
        case "NaN" => Double.NaN
        case x     => x.toDouble
      }
      (ts, name, labels, v)
    }.toSeq
    rows.toDF("ts_us", "name", "labels", "value")
  }

  private lazy val golden: Map[String, Map[String, Any]] =
    Json.parse(resource("compliance_golden.json"))
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
    case "NaN"                  => Double.NaN
    case "Inf" | "Infinity" | "+Inf"  => Double.PositiveInfinity
    case "-Inf" | "-Infinity"   => Double.NegativeInfinity
    case x                      => x.toDouble
  }

  private def close(a: Double, b: Double): Boolean =
    (a.isNaN && b.isNaN) || a == b ||
      math.abs(a - b) <= math.abs(b) * 1e-6 + 1e-9

  private def labelKey(m: Map[String, Any]): String =
    m.toSeq.sortBy(_._1).map { case (k, v) => s"$k=$v" }.mkString("{", ",", "}")

  /** matrix JSON → labelKey → (sec → value), restricted to the grid. */
  private def seriesOf(resultList: List[Any]): Map[String, Map[Long, Double]] =
    resultList.map { s =>
      val m = s.asInstanceOf[Map[String, Any]]
      val metric = m("metric").asInstanceOf[Map[String, Any]]
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
      labelKey(metric) -> vals
    }.filter(_._2.nonEmpty).toMap

  private def compare(q: String, got: Map[String, Map[Long, Double]],
      want: Map[String, Map[Long, Double]]): Option[String] = {
    if (got.keySet != want.keySet)
      return Some(s"$q: series mismatch\n  got  ${got.keySet.toSeq.sorted.mkString("; ")}\n  want ${want.keySet.toSeq.sorted.mkString("; ")}")
    val bad = want.toSeq.sortBy(_._1).flatMap { case (k, wvals) =>
      val gvals = got(k)
      if (gvals.keySet != wvals.keySet)
        Some(s"$q $k: steps got ${gvals.keySet.toSeq.sorted} want ${wvals.keySet.toSeq.sorted}")
      else wvals.toSeq.sortBy(_._1).collectFirst {
        case (sec, wv) if !close(gvals(sec), wv) =>
          s"$q $k @$sec: got ${gvals(sec)} want $wv"
      }
    }
    bad.headOption
  }

  private def emptyLogs = Seq.empty[(Long, String, Map[String, String])]
    .toDF("ts_ns", "body", "labels")
  private def emptySpans =
    Seq.empty[(Long, Long, Option[Long], String, Long, Long, Map[String, String])]
      .toDF("trace_id", "span_id", "parent_span_id", "name", "start_ns",
        "duration_ns", "attrs")

  test("compliance corpus end-to-end vs DuckDB-generated goldens") {
    val api = new HttpApi(emptyLogs, points, emptySpans)
    val port = api.start()
    try {
      val failures = Seq.newBuilder[String]
      var nOk = 0
      golden.toSeq.sortBy(_._1).foreach { case (q, entry) =>
        if (!entry.contains("unsupported")) {
          val enc = URLEncoder.encode(q, "UTF-8")
          val (code, body) =
            get(s"http://127.0.0.1:$port/api/v1/query_range?query=$enc&step=60")
          if (entry.get("expect_error").contains(true)) {
            if (code == 200) failures += s"$q: expected an error, got 200"
            else nOk += 1
          } else if (code != 200) {
            failures += s"$q: engine error $code: ${body.take(200)}"
          } else {
            val parsed = Json.parse(body).asInstanceOf[Map[String, Any]]
            val result = parsed("data").asInstanceOf[Map[String, Any]]("result")
              .asInstanceOf[List[Any]]
            val got = seriesOf(result)
            val want = entry.getOrElse("series", List.empty[Any])
              .asInstanceOf[List[Any]].map { s =>
                val m = s.asInstanceOf[Map[String, Any]]
                val metric = m("metric").asInstanceOf[Map[String, Any]]
                labelKey(metric) -> m("values").asInstanceOf[List[Any]].map { p =>
                  val pair = p.asInstanceOf[List[Any]]
                  pair.head.asInstanceOf[Double].toLong ->
                    parseVal(pair(1).asInstanceOf[String])
                }.toMap
              }.toMap
            compare(q, got, want) match {
              case Some(err) => failures += err
              case None      => nOk += 1
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

  test("corpus coverage ledger stays complete") {
    // every entry must be executed, expect-error, or explicitly
    // unsupported-with-reason; silent shrinkage fails here
    val unsupported = golden.collect {
      case (q, e) if e.contains("unsupported") => q
    }.toSet
    assert(golden.size >= 450, s"corpus shrank: ${golden.size}")
    assert(unsupported.isEmpty,
      s"unsupported entries present: ${unsupported.mkString(", ")}")
  }
}
