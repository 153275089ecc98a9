package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.sources.ChSpanLog

/** ClickHouse span-log consumer (reference chreceiver + chotel):
  * glob filtering, per-trace collapse with last-wins attr merge, the
  * lag/cursor read, and conversion to engine spans.
  */
class ChSpanLogSpec extends SparkTestBase {
  import spark.implicits._

  private def sl(rows: (Long, Long, String, Long, Long, Map[String, String])*)
      : DataFrame =
    rows.toSeq.toDF("trace_id", "span_id", "operation_name",
      "start_time_us", "finish_time_us", "attribute")
      .withColumn("parent_span_id", lit(0L))
      .withColumn("kind", lit(1))

  test("glob include/exclude filtering matches the reference matcher") {
    val spans = sl(
      (1L, 1L, "Query", 0L, 1L, Map.empty),
      (1L, 2L, "MergeTask", 0L, 1L, Map.empty),
      (1L, 3L, "Q?x", 0L, 1L, Map.empty))
    def names(cfg: ChSpanLog.FilterConfig): Seq[String] =
      ChSpanLog.filterSpans(spans, cfg)
        .select("operation_name").as[String].collect().sorted.toSeq
    assert(names(ChSpanLog.FilterConfig(include = Seq("Q*"))) ==
      Seq("Q?x", "Query"))
    assert(names(ChSpanLog.FilterConfig(include = Seq("Q?x"))) == Seq("Q?x"))
    assert(names(ChSpanLog.FilterConfig(exclude = Seq("*Task"))) ==
      Seq("Q?x", "Query"))
    assert(names(ChSpanLog.FilterConfig(
      include = Seq("*"), exclude = Seq("Query", "Q?x"))) == Seq("MergeTask"))
  }

  test("collapse merges same-name spans: extents, head identity, last-wins attrs") {
    val spans = sl(
      (7L, 2L, "Query", 100L, 200L, Map("a" -> "1", "b" -> "x")),
      (7L, 5L, "Query", 150L, 400L, Map("a" -> "2")),
      (7L, 9L, "Merge", 50L, 60L, Map("c" -> "z")),
      (8L, 1L, "Query", 10L, 20L, Map.empty))
    val out = ChSpanLog.collapseSpans(spans)
      .orderBy("trace_id", "operation_name").collect()
    assert(out.length == 3)
    val q7 = out.find(r => r.getLong(0) == 7L &&
      r.getString(1) == "Query").get
    // extents span both; representative id = first by (start, span_id)
    assert(q7.getLong(q7.fieldIndex("span_id")) == 2L)
    assert(q7.getLong(q7.fieldIndex("start_time_us")) == 100L)
    assert(q7.getLong(q7.fieldIndex("finish_time_us")) == 400L)
    // a overwritten by the later span, b survives from the earlier one
    assert(q7.getMap[String, String](q7.fieldIndex("attribute")).toMap ==
      Map("a" -> "2", "b" -> "x"))
    val e8 = out.find(_.getLong(0) == 8L).get
    assert(e8.getMap[String, String](e8.fieldIndex("attribute")).isEmpty)
  }

  test("readNew applies the cursor and lag bounds") {
    val spans = sl(
      (1L, 1L, "a", 0L, 100L, Map.empty),
      (1L, 2L, "b", 0L, 200L, Map.empty),
      (1L, 3L, "c", 0L, 980L, Map.empty)) // inside the lag window
    val got = ChSpanLog.readNew(spans, afterFinishUs = 100L,
      nowUs = 1000L, lagUs = 50L)
      .select("operation_name").as[String].collect().toSeq
    assert(got == Seq("b")) // a: before cursor; c: still settling
  }

  test("toSpans emits the engine span shape with the clickhouse identity") {
    val spans = sl((3L, 4L, "Query", 1000L, 2500L, Map("k" -> "v")))
    val row = ChSpanLog.toSpans(spans).head()
    assert(row.getAs[String]("name") == "Query")
    assert(row.getAs[Long]("start_ns") == 1000000L)
    assert(row.getAs[Long]("duration_ns") == 1500000L)
    assert(row.getAs[Map[String, String]]("resource_attrs") ==
      Map("service.name" -> "clickhouse"))
    assert(row.getAs[String]("scope_name") == "chotel")
    assert(row.isNullAt(row.fieldIndex("parent_span_id"))) // 0 = no parent
  }
}
