package graft

import java.net.{HttpURLConnection, URI, URLEncoder}

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types._

import graft.traceql.TraceQL

/** TraceQL compliance corpus executed through the engine and
  * value-checked against goldens from an INDEPENDENT evaluator
  * (tools/gen_traceql_compliance_golden.py: own parser + evaluator in
  * python, Kleene null semantics, Tempo structural-op conventions —
  * shares no code with the Scala engine). Fixture: 55 spans over 12
  * traces (deep chains, wide fans, orphan parent links, events/links,
  * instrumentation scopes, resource attrs). Covers span filters over
  * every field type and scope, trace intrinsics, parent:/event:/link:
  * refs, all structural ops and negations, && / ||, pipeline
  * by()/select()/scalar HAVING, the metrics family, and compare().
  *
  * Regenerate both resources with
  * `python3 tools/gen_traceql_compliance_golden.py` (driver-side).
  */
class TraceQLComplianceE2ESpec extends SparkTestBase {

  private def resource(name: String): String = {
    val is = getClass.getResourceAsStream("/" + name)
    require(is != null, s"missing test resource $name")
    try new String(is.readAllBytes(), "UTF-8") finally is.close()
  }

  private lazy val spans: DataFrame = {
    val raw = TestJson.parse(resource("traceql_compliance_spans.json"))
      .asInstanceOf[List[Any]]
    val schema = StructType(Seq(
      StructField("trace_id", LongType, nullable = false),
      StructField("span_id", LongType, nullable = false),
      StructField("parent_span_id", LongType, nullable = true),
      StructField("name", StringType, nullable = false),
      StructField("kind", IntegerType, nullable = false),
      StructField("status_code", IntegerType, nullable = false),
      StructField("status_message", StringType, nullable = false),
      StructField("start_ns", LongType, nullable = false),
      StructField("duration_ns", LongType, nullable = false),
      StructField("attrs", MapType(StringType, StringType), nullable = false),
      StructField("resource_attrs", MapType(StringType, StringType),
        nullable = false),
      StructField("scope_name", StringType, nullable = false),
      StructField("scope_version", StringType, nullable = false),
      StructField("events", ArrayType(StructType(Seq(
        StructField("name", StringType, nullable = false)))),
        nullable = false),
      StructField("links", ArrayType(StructType(Seq(
        StructField("trace_id", LongType, nullable = false),
        StructField("span_id", LongType, nullable = false)))),
        nullable = false)))
    val rows: Seq[Row] = raw.map { o =>
      val m = o.asInstanceOf[Map[String, Any]]
      def str(k: String) = m(k).asInstanceOf[String]
      def lng(k: String) = m(k).asInstanceOf[Double].toLong
      def int(k: String) = m(k).asInstanceOf[Double].toInt
      def smap(k: String) = m(k).asInstanceOf[Map[String, Any]]
        .map { case (a, b) => a -> b.asInstanceOf[String] }
      val psid = m("parent_span_id") match {
        case null      => null
        case d: Double => java.lang.Long.valueOf(d.toLong)
      }
      val events = m("events").asInstanceOf[List[Any]]
        .map(n => Row(n.asInstanceOf[String]))
      val links = m("links").asInstanceOf[List[Any]].map { l =>
        val p = l.asInstanceOf[List[Any]]
        Row(p.head.asInstanceOf[Double].toLong,
          p(1).asInstanceOf[Double].toLong)
      }
      Row(lng("trace_id"), lng("span_id"), psid, str("name"), int("kind"),
        int("status_code"), str("status_message"), lng("start_ns"),
        lng("duration_ns"), smap("attrs"), smap("resource"),
        str("scope_name"), str("scope_version"), events, links)
    }
    spark.createDataFrame(
      java.util.Arrays.asList(rows: _*), schema).cache()
  }

  private lazy val goldenRoot: Map[String, Any] =
    TestJson.parse(resource("traceql_compliance_golden.json"))
      .asInstanceOf[Map[String, Any]]
  private lazy val stepNs: Long =
    goldenRoot("step_ns").asInstanceOf[Double].toLong
  private lazy val golden: Map[String, Map[String, Any]] =
    goldenRoot("queries").asInstanceOf[Map[String, Any]]
      .map { case (q, e) => q -> e.asInstanceOf[Map[String, Any]] }

  private def close(a: Double, b: Double): Boolean =
    (a.isNaN && b.isNaN) || a == b ||
      math.abs(a - b) <= math.abs(b) * 1e-6 + 1e-9

  private var port: Int = 0

  private def get(url: String): (Int, String) = {
    val conn = URI.create(url).toURL.openConnection()
      .asInstanceOf[HttpURLConnection]
    conn.setRequestMethod("GET")
    val code = conn.getResponseCode
    val is = if (code >= 400) conn.getErrorStream else conn.getInputStream
    val body = new String(is.readAllBytes(), "UTF-8")
    is.close()
    (code, body)
  }

  /** Span queries go over the wire: `/api/search` spanSets carry the
    * matched spans per trace (the reference's envelope,
    * traceqlengine/engine.go:194-213), so the corpus checks the HTTP
    * surface end-to-end like the LogQL/PromQL corpora do.
    */
  private def checkSpans(q: String, want: List[Any]): Option[String] = {
    val enc = URLEncoder.encode(q, "UTF-8")
    val (code, body) =
      get(s"http://127.0.0.1:$port/api/search?q=$enc&limit=500")
    if (code != 200)
      return Some(s"$q: engine error $code: ${body.take(160)}")
    val parsed = TestJson.parse(body).asInstanceOf[Map[String, Any]]
    val got = parsed("traces").asInstanceOf[List[Any]].flatMap { t =>
      val m = t.asInstanceOf[Map[String, Any]]
      val tid = java.lang.Long.parseUnsignedLong(
        m("traceID").asInstanceOf[String], 16)
      m("spanSets").asInstanceOf[List[Any]].headOption.toList.flatMap { ss =>
        ss.asInstanceOf[Map[String, Any]]("spans")
          .asInstanceOf[List[Any]].map { sp0 =>
            val sm = sp0.asInstanceOf[Map[String, Any]]
            (tid, java.lang.Long.parseUnsignedLong(
              sm("spanID").asInstanceOf[String], 16))
          }
      }
    }.toSet
    val exp = want.map { p =>
      val l = p.asInstanceOf[List[Any]]
      (l.head.asInstanceOf[Double].toLong, l(1).asInstanceOf[Double].toLong)
    }.toSet
    if (got != exp)
      Some(s"$q: spans\n  extra ${(got -- exp).toSeq.sorted.take(8)}" +
        s"\n  missing ${(exp -- got).toSeq.sorted.take(8)}")
    else None
  }

  private def checkRollup(q: String, e: Map[String, Any]): Option[String] = {
    val df = TraceQL.plan(q, spans)
    val cols = df.columns
    val selNames = e("sel_names").asInstanceOf[List[Any]]
      .map(_.asInstanceOf[String])
    val hasBy = e("has_by") == true
    val hasScalar = e("has_scalar") == true
    val got = df.collect().map { r =>
      val tid = r.getLong(cols.indexOf("trace_id"))
      val by = if (hasBy) String.valueOf(r.get(cols.indexOf("by_value")))
        else ""
      val n = r.getLong(cols.indexOf("n_spans"))
      val agg = if (hasScalar)
        Some(r.getDouble(cols.indexOf("agg_value"))) else None
      val sums = selNames.map(nm => nm -> r.getDouble(cols.indexOf(nm))).toMap
      (tid, by) -> ((n, agg, sums))
    }.toMap
    val want = e("rows").asInstanceOf[List[Any]].map { o =>
      val m = o.asInstanceOf[Map[String, Any]]
      val tid = m("trace_id").asInstanceOf[Double].toLong
      val by = if (hasBy) String.valueOf(m("by")) else ""
      val n = m("n_spans").asInstanceOf[Double].toLong
      val agg = m.get("agg").map(_.asInstanceOf[Double])
      val sums = m.get("sums").map(_.asInstanceOf[Map[String, Any]]
        .map { case (k, v) => k -> v.asInstanceOf[Double] })
        .getOrElse(Map.empty[String, Double])
      (tid, by) -> ((n, agg, sums))
    }.toMap
    if (got.keySet != want.keySet)
      return Some(s"$q: rollup groups\n  got  ${got.keySet.toSeq.sorted}" +
        s"\n  want ${want.keySet.toSeq.sorted}")
    want.toSeq.sortBy(_._1).collectFirst {
      case (k, (wn, wagg, wsums)) if {
        val (gn, gagg, gsums) = got(k)
        gn != wn ||
          (wagg.isDefined != gagg.isDefined) ||
          wagg.exists(w => !close(gagg.get, w)) ||
          selNames.exists(nm => !close(gsums.getOrElse(nm, Double.NaN),
            wsums.getOrElse(nm, Double.NaN)))
      } =>
        s"$q $k: got ${got(k)} want ${(wn, wagg, wsums)}"
    }
  }

  private def checkMetrics(q: String, e: Map[String, Any]): Option[String] = {
    val df = TraceQL.planMetrics(q, spans, stepNs)
    val cols = df.columns
    val byNumeric = e("by_numeric") == true
    val hasBy = cols.contains("by_value")
    def normBy(v: Any): String =
      if (v == null) "∅"
      else if (byNumeric) String.valueOf(String.valueOf(v).toDouble)
      else String.valueOf(v)
    val got = df.collect().groupBy { r =>
      if (hasBy) normBy(r.get(cols.indexOf("by_value"))) else "∅"
    }.map { case (k, rs) =>
      k -> rs.map(r => r.getLong(cols.indexOf("bucket_ns")) ->
        r.getDouble(cols.indexOf("value"))).toMap
    }
    val want = e("series").asInstanceOf[List[Any]].map { o =>
      val m = o.asInstanceOf[Map[String, Any]]
      val by = m("by") match {
        case null      => "∅"
        case d: Double => String.valueOf(d)
        case s         => String.valueOf(s)
      }
      by -> m("values").asInstanceOf[Map[String, Any]]
        .map { case (b, v) => b.toLong -> v.asInstanceOf[Double] }
    }.toMap
    if (got.keySet != want.keySet)
      return Some(s"$q: series set\n  got  ${got.keySet.toSeq.sorted}" +
        s"\n  want ${want.keySet.toSeq.sorted}")
    want.toSeq.sortBy(_._1).flatMap { case (k, wvals) =>
      val gvals = got(k)
      if (gvals.keySet != wvals.keySet)
        Some(s"$q $k: buckets got ${gvals.keySet.toSeq.sorted} " +
          s"want ${wvals.keySet.toSeq.sorted}")
      else wvals.toSeq.sortBy(_._1).collectFirst {
        case (b, wv) if !close(gvals(b), wv) =>
          s"$q $k @$b: got ${gvals(b)} want $wv"
      }
    }.headOption
  }

  private def checkCompare(q: String, e: Map[String, Any]): Option[String] = {
    val df0 = TraceQL.planMetrics(q, spans, stepNs)
    val c = df0.columns
    val got = df0.collect()
      .map(r => (r.getLong(c.indexOf("bucket_ns")),
        r.getString(c.indexOf("meta_type")), r.getString(c.indexOf("attr")),
        r.getString(c.indexOf("attr_value")),
        r.getDouble(c.indexOf("n"))))
      .sortBy(t => (t._3, t._4, t._2, t._1)).toSeq
    val want = e("rows").asInstanceOf[List[Any]].map { o =>
      val l = o.asInstanceOf[List[Any]]
      (l.head.asInstanceOf[Double].toLong, l(1).asInstanceOf[String],
        l(2).asInstanceOf[String], l(3).asInstanceOf[String],
        l(4).asInstanceOf[Double])
    }.sortBy(t => (t._3, t._4, t._2, t._1))
    if (got.size != want.size)
      return Some(s"$q: compare rows got ${got.size} want ${want.size}" +
        s"\n  got  ${got.take(6)}\n  want ${want.take(6)}")
    got.zip(want).collectFirst {
      case (g, w) if g._1 != w._1 || g._2 != w._2 || g._3 != w._3 ||
        g._4 != w._4 || !close(g._5, w._5) =>
        s"$q: compare row\n  got  $g\n  want $w"
    }
  }

  private def checkError(q: String, via: String): Option[String] = {
    val attempt = scala.util.Try {
      if (via == "metrics") TraceQL.planMetrics(q, spans, stepNs).collect()
      else TraceQL.matchSpans(q, spans).collect()
    }
    if (attempt.isSuccess) Some(s"$q: expected an error, got a result")
    else None
  }

  test("TraceQL compliance corpus end-to-end vs independent goldens") {
    import spark.implicits._
    val api = new graft.api.HttpApi(
      Seq.empty[(Long, String, Map[String, String])]
        .toDF("ts_ns", "body", "labels"),
      spark.emptyDataFrame, spans)
    port = api.start()
    try {
      runCorpus()
    } finally api.stop()
  }

  private def runCorpus(): Unit = {
    val failures = Seq.newBuilder[String]
    var nOk = 0
    golden.toSeq.sortBy(_._1).foreach { case (q, e) =>
      val bad = try {
        e("kind") match {
          case "spans" =>
            checkSpans(q, e("spans").asInstanceOf[List[Any]])
          case "rollup"  => checkRollup(q, e)
          case "metrics" => checkMetrics(q, e)
          case "compare" => checkCompare(q, e)
          case "error" =>
            checkError(q, e("via").asInstanceOf[String])
        }
      } catch {
        case t: Throwable => Some(s"$q: engine threw ${t.getClass.getSimpleName}: ${t.getMessage}")
      }
      bad match {
        case Some(err) => failures += err
        case None      => nOk += 1
      }
    }
    val fs = failures.result()
    info(s"corpus: ${golden.size} queries, $nOk ok, ${fs.size} failing")
    assert(fs.isEmpty,
      s"\n${fs.size} corpus failures (showing up to 40):\n${fs.take(40).mkString("\n")}")
  }

  test("TraceQL corpus ledger stays complete") {
    assert(golden.size >= 130, s"corpus shrank: ${golden.size}")
    val kinds = golden.values.groupBy(_("kind")).view.mapValues(_.size).toMap
    assert(kinds.getOrElse("spans", 0) >= 90)
    assert(kinds.getOrElse("metrics", 0) >= 15)
    assert(kinds.getOrElse("rollup", 0) >= 10)
    assert(kinds.getOrElse("compare", 0) >= 4)
  }
}
