package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.api.ApiEncoders

/** API response encoder specs: shapes parse back as JSON with the
  * documented Loki/Prom/Tempo structure.
  */
class ApiEncodersSpec extends SparkTestBase {
  import spark.implicits._

  test("lokiMatrix renders per-series value pairs in ts order") {
    val df = Seq(
      (2000000000L, Map("app" -> "api"), 2.5),
      (1000000000L, Map("app" -> "api"), 1.5),
      (1000000000L, Map("app" -> "web"), 7.0)
    ).toDF("bucket_ns", "labels", "value")
    val out = ApiEncoders.lokiMatrix(df)
    assert(out.startsWith("""{"status":"success","data":{"resultType":"matrix","result":["""))
    assert(out.contains("""{"metric":{"app":"api"},"values":[[1,"1.5"],[2,"2.5"]]}"""))
    assert(out.contains("""{"metric":{"app":"web"},"values":[[1,"7.0"]]}"""))
    // whole envelope is valid JSON
    val parsed = Seq(out).toDF("j")
      .select(from_json(col("j"), StructType(Seq(
        StructField("status", StringType)))).getField("status"))
      .head().getString(0)
    assert(parsed == "success")
  }

  test("lokiStreams escapes log lines and orders values") {
    val df = Seq(
      (10L, "a \"quoted\" line", Map("app" -> "api")),
      (5L, "first", Map("app" -> "api"))
    ).toDF("ts_ns", "body", "labels")
    val out = ApiEncoders.lokiStreams(df)
    assert(out.contains(""""resultType":"streams""""))
    assert(out.contains("""["5","first"]"""))
    assert(out.contains("""["10","a \"quoted\" line"]"""))
    assert(out.indexOf("\"5\"") < out.indexOf("\"10\"")) // ts order
  }

  test("tempoSearch renders spanSets of matched spans with filtered attrs") {
    // trace 255: root (parentless) + child; only the child matches
    val sp = Seq(
      (255L, 1L, Option.empty[Long], "root-op", 1000L, 2000000L,
        Map("service.name" -> "api", "big.payload" -> "x")),
      (255L, 2L, Option(1L), "child-op", 1500L, 500000L,
        Map("http.method" -> "GET", "noise" -> "y"))
    ).toDF("trace_id", "span_id", "parent_span_id", "name", "start_ns",
      "duration_ns", "attrs")
    val matched = sp.filter(col("name") === "child-op")
    val out = ApiEncoders.tempoSearch(sp, matched,
      allowed = Some(Set("http.method")), limit = 20)
    assert(out.contains(""""traceID":"00000000000000ff""""))
    // metadata comes from the WHOLE trace: root name/service, int ms
    assert(out.contains(""""rootServiceName":"api""""))
    assert(out.contains(""""rootTraceName":"root-op""""))
    assert(out.contains(""""durationMs":2"""))
    // spanSet carries only the matched span, hex id, ns strings
    assert(out.contains(""""spanID":"0000000000000002""""))
    assert(!out.contains(""""spanID":"0000000000000001""""))
    assert(out.contains(""""matched":1"""))
    assert(out.contains(""""spanSets":["""))
    // only query-referenced attributes are echoed
    assert(out.contains(
      """{"key":"http.method","value":{"stringValue":"GET"}}"""))
    assert(!out.contains("noise") && !out.contains("big.payload"))
    assert(out.endsWith(""","metrics":{}}"""))
  }

  test("tempoSearch caps results at the limit, ascending by start") {
    val sp = (1L to 50L).map(i => (i, i, Option.empty[Long], s"op-$i",
        i * 1000L, 1000000L, Map("service.name" -> "api")))
      .toDF("trace_id", "span_id", "parent_span_id", "name", "start_ns",
        "duration_ns", "attrs")
    val out = ApiEncoders.tempoSearch(sp, sp, allowed = None)
    assert("\"traceID\"".r.findAllIn(out).length == 20)
    // ascending by start time (reference engine.go:220): earliest kept
    assert(out.contains(""""traceID":"0000000000000001""""))
    assert(!out.contains(""""traceID":"0000000000000032""""))
    assert("\"traceID\"".r
      .findAllIn(ApiEncoders.tempoSearch(sp, sp, None, 5)).length == 5)
  }

  test("promVector renders instant results") {
    val df = Seq((5000000L, Map("svc" -> "a"), 3.25)).toDF("ts_us", "labels", "value")
    val out = ApiEncoders.promVector(df)
    assert(out.contains(""""resultType":"vector""""))
    assert(out.contains("""{"metric":{"svc":"a"},"value":[5,"3.25"]}"""))
  }

  test("tempoTrace renders one trace's spans with hex ids and ns strings") {
    val df = Seq(
      (7L, 1L, "root", 1000L, 500L),
      (7L, 2L, "child", 1200L, 100L),
      (8L, 1L, "other", 0L, 1L)
    ).toDF("trace_id", "span_id", "name", "start_ns", "duration_ns")
    val out = ApiEncoders.tempoTrace(df, 7L)
    assert(out.startsWith("""{"batches":[{"scopeSpans":[{"spans":["""))
    assert(out.contains(""""spanId":"0000000000000002""""))
    assert(out.contains(""""endTimeUnixNano":"1500""""))
    assert(!out.contains("other"))
  }

  test("promMatrix uses second-resolution buckets from µs") {
    val df = Seq((3000000L, Map("svc" -> "1"), 9.0)).toDF("bucket_us", "labels", "value")
    val out = ApiEncoders.promMatrix(df)
    assert(out.contains("""[[3,"9.0"]]"""))
  }
}
