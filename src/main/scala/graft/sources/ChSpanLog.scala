package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** ClickHouse span-log consumer — the reference's chreceiver
  * (otelcolmod/chreceiver/receiver.go:22-156) polls ClickHouse's own
  * `system.opentelemetry_span_log` table, converts rows to OTel spans
  * (internal/chotel/convert.go:55-108), applies include/exclude glob
  * filters and an optional per-trace same-name collapse
  * (internal/chotel/filter.go:19-116), and feeds them into the trace
  * pipeline incrementally (finish-time cursor + a lag so in-flight
  * inserts settle, chotel/reader.go:21-115).
  *
  * Here the span log is any DataFrame with the table's shape and each
  * step is a column transform: the glob filter compiles to one rlike
  * predicate (pushdown-friendly), the collapse is a (trace, name)
  * aggregation whose attr maps merge per-key last-wins — exactly
  * `maps.Copy` over later spans (filter.go:110-113), made
  * deterministic by (finish, span_id) order — and the cursor read is a
  * pushed-down range predicate. The reference's numeric-marker attr
  * typing (convert.go:19-53) is a pdata representation concern; attrs
  * here are canonical strings and the engines compare numerically on
  * demand, so no marker pass is needed.
  */
object ChSpanLog {

  /** service.name every converted span carries (convert.go:29-32). */
  val Resource = "clickhouse"

  final case class FilterConfig(
      exclude: Seq[String] = Nil,
      include: Seq[String] = Nil,
      collapse: Boolean = false)

  /** Glob (`*`/`?`) → anchored regex (filter.go:52-82 semantics). */
  private[sources] def globToRegex(p: String): String =
    "^" + p.flatMap {
      case '*' => ".*"
      case '?' => "."
      case c if "\\.[]{}()+^$|".contains(c) => "\\" + c.toString
      case c => c.toString
    } + "$"

  private def matchesAny(patterns: Seq[String], c: Column): Column =
    patterns.map(p => c.rlike(globToRegex(p)))
      .reduceOption(_ || _).getOrElse(lit(false))

  /** Include/exclude filtering on operation_name (filter.go:19-38):
    * include (when non-empty) keeps only matches, exclude then drops.
    */
  def filterSpans(spanLog: DataFrame, cfg: FilterConfig): DataFrame = {
    val name = col("operation_name")
    val included =
      if (cfg.include.isEmpty) spanLog
      else spanLog.filter(matchesAny(cfg.include, name))
    if (cfg.exclude.isEmpty) included
    else included.filter(!matchesAny(cfg.exclude, name))
  }

  /** Per-trace same-name collapse (filter.go:89-116): one row per
    * (trace_id, operation_name) spanning min(start)..max(finish); the
    * representative identity is the FIRST span by (start, span_id);
    * attribute maps merge per-key LAST-wins by (finish, span_id) —
    * later spans overwrite shared keys, earlier-only keys survive.
    * Two bounded aggregations keyed by (trace, name): span-log volumes
    * are operation-vocabulary × trace shaped, never raw-event shaped.
    */
  def collapseSpans(spanLog: DataFrame): DataFrame = {
    val head = struct(col("start_time_us"), col("span_id"),
      col("parent_span_id"), col("kind"))
    val merged = spanLog
      .groupBy(col("trace_id"), col("operation_name"))
      .agg(
        min(head).as("__head"),
        min(col("start_time_us")).as("start_time_us"),
        max(col("finish_time_us")).as("finish_time_us"))
      .select(col("trace_id"), col("operation_name"),
        col("__head.span_id").as("span_id"),
        col("__head.parent_span_id").as("parent_span_id"),
        col("__head.kind").as("kind"),
        col("start_time_us"), col("finish_time_us"))
    val attrs = spanLog
      .select(col("trace_id"), col("operation_name"),
        col("finish_time_us"), col("span_id"),
        explode(map_entries(col("attribute"))).as("kv"))
      .groupBy(col("trace_id"), col("operation_name"),
        col("kv.key").as("__k"))
      .agg(max_by(col("kv.value"),
        struct(col("finish_time_us"), col("span_id"))).as("__v"))
      .groupBy(col("trace_id"), col("operation_name"))
      .agg(map_from_entries(
        array_sort(collect_list(struct(col("__k"), col("__v")))))
        .as("attribute"))
    merged.join(attrs, Seq("trace_id", "operation_name"), "left")
      .withColumn("attribute",
        coalesce(col("attribute"), map().cast("map<string,string>")))
  }

  /** The incremental poll predicate (reader.go:69-115): spans that
    * finished after the cursor and are at least `lagUs` old, so
    * still-settling inserts aren't consumed early. Both bounds push
    * into the scan.
    */
  def readNew(spanLog: DataFrame, afterFinishUs: Long, nowUs: Long,
      lagUs: Long = 5000000L): DataFrame =
    spanLog.filter(col("finish_time_us") > afterFinishUs &&
      col("finish_time_us") <= nowUs - lagUs)

  /** Span-log rows → engine span rows (convert.go:75-108): the OTel
    * shape the trace layout stores, resource pinned to the clickhouse
    * service identity, scope `chotel`.
    */
  def toSpans(spanLog: DataFrame): DataFrame =
    spanLog.select(
      col("trace_id"),
      col("span_id"),
      when(col("parent_span_id") =!= 0, col("parent_span_id"))
        .as("parent_span_id"),
      col("operation_name").as("name"),
      col("kind"),
      lit(0).as("status_code"),
      (col("start_time_us") * 1000L).as("start_ns"),
      ((col("finish_time_us") - col("start_time_us")) * 1000L)
        .as("duration_ns"),
      col("attribute").as("attrs"),
      map(lit("service.name"), lit(Resource)).as("resource_attrs"),
      lit("chotel").as("scope_name"))
}
