package graft.model

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.sources.Testdata

/** Deterministic OTel-shaped views over the driver's testdata.
  *
  * The driver corpus is TPC-H-ish (TESTDATA.md); the engine's planners
  * operate on logs/spans/points tables (Schemas). These mappings are
  * simple, SQL-expressible derivations so that every engine query run
  * through a planner has an exact DuckDB oracle over the same parquet:
  *
  *   logs   <- events   (props is the body; event_type drives severity)
  *   spans  <- lineitem (order = trace, lineitem = span; parent = a
  *             binary-tree shape linenumber/2 so child/descendant/sibling
  *             structural ops have real work to do)
  *   points <- events   (one series per event_type, value = value)
  *
  * Severity mapping follows OTel severity numbers (TRACE=1, DEBUG=5,
  * INFO=9, WARN=13, ERROR=17, FATAL=21 — reference mapping table
  * internal/chstorage/querier_logs_query.go:179-215).
  */
object OtelViews {

  /** event_type -> (severity_text, severity_number); deterministic. */
  val severityByEventType: Seq[(String, String, Int)] = Seq(
    ("error", "ERROR", 17),
    ("signup", "INFO", 9),
    ("purchase", "INFO", 9),
    ("click", "DEBUG", 5),
    ("view", "TRACE", 1)
  )

  def logs(td: Testdata): DataFrame = {
    val sevText = severityByEventType.foldLeft(lit("UNKNOWN")) {
      case (acc, (et, txt, _)) => when(col("event_type") === et, txt).otherwise(acc)
    }
    val sevNum = severityByEventType.foldLeft(lit(0)) {
      case (acc, (et, _, num)) => when(col("event_type") === et, num).otherwise(acc)
    }
    td.events.select(
      timestamp_micros(expr("ts div 1000")).as("timestamp"),
      col("ts").as("ts_ns"),
      sevNum.as("severity_number"),
      sevText.as("severity_text"),
      concat(lit("svc-"), (col("user_id") % 4).cast("string")).as("service_name"),
      lit("graft").as("service_namespace"),
      col("event_id"),
      col("props").as("body"),
      map(
        lit("event_type"), col("event_type"),
        lit("user_id"), col("user_id").cast("string")
      ).as("attrs"),
      col("props").as("attrs_json")
    )
  }

  /** Spans from lineitem: trace = order, span = linenumber, parent =
    * linenumber/2 (binary tree, root = 1). duration_ns = quantity ms.
    */
  def spans(td: Testdata): DataFrame = {
    val startNs = (unix_timestamp(col("l_shipdate")) * lit(1000000000L)).cast("long")
    val durNs   = (col("l_quantity") * lit(1000000L)).cast("long")
    td.lineitem.select(
      col("l_orderkey").as("trace_id"),
      col("l_linenumber").as("span_id"),
      when(col("l_linenumber") > 1, (col("l_linenumber") / 2).cast("int")).as("parent_span_id"),
      concat(lit("op-"), col("l_returnflag")).as("name"),
      ((col("l_linenumber") % 5) + 1).cast("int").as("kind"),
      col("l_shipdate").as("start"),
      startNs.as("start_ns"),
      (startNs + durNs).as("end_ns"),
      durNs.as("duration_ns"),
      when(col("l_returnflag") === "R", 2).otherwise(0).as("status_code"),
      concat(lit("svc-"), (col("l_suppkey") % 3).cast("string")).as("service_name"),
      map(
        lit("partkey"), col("l_partkey").cast("string"),
        lit("returnflag"), col("l_returnflag"),
        lit("linestatus"), col("l_linestatus")
      ).as("attrs"),
      col("l_quantity").as("quantity"),
      col("l_extendedprice").as("extendedprice")
    )
  }

  /** Metric points from events: one series per event_type. */
  def points(td: Testdata): DataFrame =
    td.events.select(
      col("event_type").as("series"),
      xxhash64(col("event_type")).as("hash"),
      col("ts").as("ts_ns"),
      timestamp_micros(expr("ts div 1000")).as("timestamp"),
      col("value")
    )
}
