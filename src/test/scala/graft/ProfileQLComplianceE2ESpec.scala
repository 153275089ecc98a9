package graft

import java.net.{HttpURLConnection, URI, URLEncoder}

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types._

import graft.api.HttpApi

/** ProfileQL compliance corpus executed through the engine's HTTP
  * render path and value-checked against goldens from an INDEPENDENT
  * evaluator (tools/gen_profileql_compliance_golden.py: own selector
  * parser + merge + flamebearer encoder in python — shares no code
  * with the Scala engine). Covers all four matcher operators incl.
  * absent-label semantics, quoted commas and escaped quotes, time
  * windows, maxNodes folding, empty results, malformed selectors, and
  * the labels / label-values / apps endpoints.
  *
  * Regenerate both resources with
  * `python3 tools/gen_profileql_compliance_golden.py` (driver-side).
  */
class ProfileQLComplianceE2ESpec extends SparkTestBase {

  private def resource(name: String): String = {
    val is = getClass.getResourceAsStream("/" + name)
    require(is != null, s"missing test resource $name")
    try new String(is.readAllBytes(), "UTF-8") finally is.close()
  }

  private lazy val profiles: DataFrame = {
    val raw = TestJson.parse(resource("profileql_compliance_profiles.json"))
      .asInstanceOf[List[Any]]
    val schema = StructType(Seq(
      StructField("ts_us", LongType, nullable = false),
      StructField("name", StringType, nullable = false),
      StructField("labels", MapType(StringType, StringType), nullable = false),
      StructField("stack", ArrayType(StringType), nullable = false),
      StructField("value", LongType, nullable = false)))
    val rows: Seq[Row] = raw.map { o =>
      val m = o.asInstanceOf[Map[String, Any]]
      Row(
        m("ts_us").asInstanceOf[Double].toLong,
        m("name").asInstanceOf[String],
        m("labels").asInstanceOf[Map[String, Any]]
          .map { case (k, v) => k -> v.asInstanceOf[String] },
        m("stack").asInstanceOf[List[Any]].map(_.asInstanceOf[String]),
        m("value").asInstanceOf[Double].toLong)
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 4), schema)
  }

  private lazy val golden =
    TestJson.parse(resource("profileql_compliance_golden.json"))
      .asInstanceOf[Map[String, Any]]

  private def get(url: String): (Int, String) = {
    val conn = URI.create(url).toURL.openConnection()
      .asInstanceOf[HttpURLConnection]
    val code = conn.getResponseCode
    val is = if (code >= 400) conn.getErrorStream else conn.getInputStream
    val body = new String(is.readAllBytes(), "UTF-8")
    is.close()
    (code, body)
  }

  private def enc(s: String) = URLEncoder.encode(s, "UTF-8")

  private def withApi[T](f: Int => T): T = {
    import spark.implicits._
    val logsDf = Seq((1L, "x", Map("a" -> "b"))).toDF("ts_ns", "body", "labels")
    val pointsDf = Seq((1L, "m", Map("a" -> "b"), 1.0))
      .toDF("ts_us", "name", "labels", "value")
    val spansDf = Seq((1L, 1L, None: Option[Long], "op", 1L, 1L,
      Map("service.name" -> "x")))
      .toDF("trace_id", "span_id", "parent_span_id", "name", "start_ns",
        "duration_ns", "attrs")
    val api = new HttpApi(logsDf, pointsDf, spansDf, Some(profiles))
    val port = api.start()
    try f(port) finally api.stop()
  }

  private def asLongs(v: Any): Seq[Long] =
    v.asInstanceOf[List[Any]].map(_.asInstanceOf[Double].toLong)

  test("render corpus: every query matches the independent golden") {
    withApi { port =>
      val queries = golden("queries").asInstanceOf[List[Any]]
      assert(queries.size >= 25)
      queries.foreach { qAny =>
        val q = qAny.asInstanceOf[Map[String, Any]]
        val query = q("query").asInstanceOf[String]
        val params = new StringBuilder(s"query=${enc(query)}")
        q.get("from").flatMap(Option(_)).foreach(v =>
          params ++= s"&from=${v.asInstanceOf[Double].toLong}")
        q.get("until").flatMap(Option(_)).foreach(v =>
          params ++= s"&until=${v.asInstanceOf[Double].toLong}")
        val mn = q("maxNodes").asInstanceOf[Double].toLong
        if (mn > 0) params ++= s"&maxNodes=$mn"
        val (code, body) = get(s"http://127.0.0.1:$port/pyroscope/render?$params")
        assert(code == 200, s"[$query] HTTP $code: $body")
        val fb = TestJson.parse(body).asInstanceOf[Map[String, Any]]("flamebearer")
          .asInstanceOf[Map[String, Any]]
        val want = q("flamebearer").asInstanceOf[Map[String, Any]]
        assert(fb("names").asInstanceOf[List[Any]] ==
          want("names").asInstanceOf[List[Any]], s"[$query] names")
        val gotLevels = fb("levels").asInstanceOf[List[Any]].map(asLongs)
        val wantLevels = want("levels").asInstanceOf[List[Any]].map(asLongs)
        assert(gotLevels == wantLevels, s"[$query] levels")
        assert(fb("numTicks").asInstanceOf[Double].toLong ==
          want("numTicks").asInstanceOf[Double].toLong, s"[$query] numTicks")
        assert(fb("maxSelf").asInstanceOf[Double].toLong ==
          want("maxSelf").asInstanceOf[Double].toLong, s"[$query] maxSelf")
      }
    }
  }

  test("malformed selectors are rejected, not misparsed") {
    withApi { port =>
      golden("errors").asInstanceOf[List[Any]].foreach { e =>
        val query = e.asInstanceOf[String]
        val (code, _) = get(
          s"http://127.0.0.1:$port/pyroscope/render?query=${enc(query)}")
        assert(code >= 400, s"[$query] should be rejected, got $code")
      }
    }
  }

  test("labels / label-values / apps match the goldens") {
    withApi { port =>
      val (c1, labels) = get(s"http://127.0.0.1:$port/pyroscope/labels")
      assert(c1 == 200)
      assert(TestJson.parse(labels) == golden("labels"))
      golden("label_values").asInstanceOf[Map[String, Any]].foreach {
        case (label, want) =>
          val (c, got) = get(
            s"http://127.0.0.1:$port/pyroscope/label-values?label=${enc(label)}")
          assert(c == 200)
          assert(TestJson.parse(got) == want, s"label-values($label)")
      }
      val (c2, apps) = get(s"http://127.0.0.1:$port/pyroscope/apps")
      assert(c2 == 200)
      val appNames = TestJson.parse(apps).asInstanceOf[List[Any]]
        .map(_.asInstanceOf[Map[String, Any]]("name"))
      assert(appNames == golden("apps"))
    }
  }
}
