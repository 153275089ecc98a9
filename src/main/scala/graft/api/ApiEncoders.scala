package graft.api

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** HTTP API response encoders — the reference's user surface
  * (internal/lokihandler, promhandler, tempohandler JSON shapes),
  * re-expressed Spark-first: everything per-series/per-trace is built
  * DISTRIBUTED with column expressions (to_json + concat assembly for
  * the heterogenous [ts, "value"] pairs JSON needs), and only the
  * final envelope — one row per series, bounded by series cardinality,
  * not sample volume — is assembled on the driver.
  *
  * Value rendering uses Spark's double→string form; Go's strconv
  * renders some floats differently (e.g. exponents) — a presentation
  * nuance, not a data one.
  */
object ApiEncoders {

  /** One JSON object per series: {"metric":{…},"values":[[sec,"v"],…]}
    * from metric rows (tsCol, labels, value); tsDivToSec converts the
    * bucket column to integer unix seconds (e.g. 1e9 for ns buckets).
    */
  def matrixSeries(df: DataFrame, tsCol: String, tsDivToSec: Long,
      maxRows: Long = 0L): DataFrame = {
    val pair = (p: Column) => concat(
      lit("["), p.getField("t"), lit(",\""), p.getField("v").cast("string"), lit("\"]"))
    // the cap BOUNDS what materializes, not just what reports: the
    // limit stops the scan at cap+1 SAMPLE rows before any of them
    // aggregate into per-series strings (the reference's fetch
    // limit+1-and-stop, querier_logs_query.go:95-151) — without it a
    // 500×-over-cap query would assemble the whole result in driver
    // memory before the post-drain check could throw. Under the cap
    // the limit passes everything through, so results are unchanged;
    // over it, the truncated sum trips checkRows and nothing after
    // cap+1 rows was ever computed.
    val bounded =
      if (maxRows > 0 && maxRows < Int.MaxValue - 1)
        df.limit((maxRows + 1).toInt)
      else df
    bounded.groupBy(col("labels"))
      .agg(sort_array(collect_list(struct(
        expr(s"$tsCol div $tsDivToSec").as("t"), col("value").as("v")))).as("pts"))
      // per-series sample count rides the envelope row: the sample-cap
      // check then costs nothing extra (single-pass guard — the
      // reference fetches limit+1 rows in its ONE query and checks
      // post-drain, querier_logs_query.go:95-151)
      .select(concat(
        lit("{\"metric\":"), to_json(col("labels")),
        lit(",\"values\":["),
        concat_ws(",", transform(col("pts"), pair)),
        lit("]}")).as("series_json"),
        size(col("pts")).as("__n"))
      .orderBy("series_json")
  }

  /** Loki /loki/api/v1/query_range matrix envelope. `maxRows` caps the
    * TOTAL sample count across series, checked inside the one
    * envelope collect (typed [[Limits.TooManySamples]] on overflow).
    */
  def lokiMatrix(df: DataFrame, tsCol: String = "bucket_ns",
      tsDivToSec: Long = 1000000000L, maxBytes: Long = 0L,
      maxRows: Long = 0L): String =
    envelope("matrix", matrixSeries(df, tsCol, tsDivToSec, maxRows),
      maxBytes, maxRows)

  /** Prometheus /api/v1/query_range matrix envelope (µs buckets). */
  def promMatrix(df: DataFrame, tsCol: String = "bucket_us",
      maxBytes: Long = 0L, maxRows: Long = 0L): String =
    envelope("matrix", matrixSeries(df, tsCol, 1000000L, maxRows),
      maxBytes, maxRows)

  /** Loki streams result for log queries: rows (ts_ns, body, labels) →
    * {"stream":{…},"values":[["<ns>","line"],…]} per stream.
    */
  def lokiStreams(df: DataFrame, newestFirst: Boolean = false,
      maxBytes: Long = 0L): String = {
    // ["<ns>","line"] is a homogeneous string pair → to_json escapes
    // the log line correctly
    val pair = (p: Column) =>
      to_json(array(p.getField("t").cast("string"), p.getField("line")))
    val series = df.groupBy(col("labels"))
      .agg(sort_array(collect_list(struct(
        col("ts_ns").as("t"), col("body").as("line"))),
        asc = !newestFirst).as("pts"))
      .select(concat(
        lit("{\"stream\":"), to_json(col("labels")),
        lit(",\"values\":["),
        concat_ws(",", transform(col("pts"), pair)),
        lit("]}")).as("series_json"))
      .orderBy("series_json")
    envelope("streams", series, maxBytes)
  }

  /** Loki instant vector from (labels, value) rows at a fixed
    * evaluation second (the volume endpoints' shape).
    */
  def lokiVector(df: DataFrame, evalSec: Long): String = {
    val series = df.select(concat(
        lit("{\"metric\":"), to_json(col("labels")),
        lit(s",\"value\":[$evalSec,\""), col("value").cast("string"),
        lit("\"]}")).as("series_json"))
      .orderBy("series_json")
    envelope("vector", series)
  }

  /** Instant-query vector result: rows (ts_us, labels, value) →
    * {"metric":{…},"value":[sec,"v"]} per series.
    */
  def promVector(df: DataFrame): String = {
    val series = df.select(concat(
        lit("{\"metric\":"), to_json(col("labels")),
        lit(",\"value\":["), expr("ts_us div 1000000"),
        lit(",\""), col("value").cast("string"), lit("\"]}")).as("series_json"))
      .orderBy("series_json")
    envelope("vector", series)
  }

  /** Tempo /api/search response from per-trace rollups
    * (trace_id, root_name, root_service, start_ns, duration_ns).
    *
    * Capped BEFORE collect: newest `limit` traces by start time
    * (default 20, the reference's default search limit,
    * traceqlengine/engine.go:220-222) — a `{}` match-everything search
    * must never pull the whole store onto the driver.
    */
  /** Attr map → Tempo KeyValue list `[{"key":k,"value":{"stringValue":v}}]`
    * (reference tracestorage/schema_tempo.go:64-78 ConvertToTempoAttrs;
    * our attr maps are string-typed). Sorted for deterministic output.
    */
  private def tempoKvList(m: Column): Column =
    transform(sort_array(map_entries(m)), e =>
      struct(e.getField("key").as("key"),
        struct(e.getField("value").as("stringValue")).as("value")))

  /** Tempo search response: per-trace metadata (root name/service,
    * extent over ALL trace spans) plus spanSet/spanSets carrying the
    * MATCHED spans, each echoing only query-referenced attributes
    * (reference traceqlengine/engine.go:131-226, attrs.go). `allowed =
    * None` (the tags-search path) echoes every attribute; results sort
    * ascending by trace start like the reference's final SortFunc.
    */
  def tempoSearch(sp: DataFrame, matched: DataFrame,
      allowed: Option[Set[String]], limit: Int = 20): String = {
    val emptyMap = map().cast("map<string,string>")
    val attrsCol =
      if (sp.columns.contains("attrs")) col("attrs") else emptyMap
    val resCol =
      if (sp.columns.contains("resource_attrs")) col("resource_attrs")
      else attrsCol
    def filtered(c: Column): Column = allowed match {
      case None                   => c
      case Some(as) if as.isEmpty => emptyMap
      case Some(as) =>
        val arr = array(as.toSeq.sorted.map(lit): _*)
        map_filter(c, (k, _) => array_contains(arr, k))
    }

    val spanStruct = struct(
      format_string("%016x", col("span_id")).as("spanID"),
      col("name").as("name"),
      col("start_ns").cast("string").as("startTimeUnixNano"),
      col("duration_ns").as("durationNanos"),
      tempoKvList(filtered(attrsCol)).as("attributes"))
    val matchedAgg = matched
      .select(col("trace_id"), col("start_ns").as("__s"),
        spanStruct.as("span"))
      .groupBy("trace_id")
      .agg(sort_array(collect_list(struct(col("__s"), col("span"))))
        .as("sl"))
      .select(col("trace_id"),
        transform(col("sl"), x => x.getField("span")).as("spans"))

    // trace metadata over EVERY span of a matched trace (the engine
    // takes root + extent from the whole trace, engine.go:139-166)
    val rootService = coalesce(element_at(resCol, "service.name"),
      element_at(attrsCol, "service.name"))
    val rollup = sp
      .join(matchedAgg.select("trace_id"), Seq("trace_id"), "left_semi")
      .groupBy(col("trace_id"))
      .agg(
        min(col("start_ns")).as("start_ns"),
        (max(col("start_ns") + col("duration_ns")) - min(col("start_ns")))
          .as("duration_ns"),
        min(when(col("parent_span_id").isNull, col("name")))
          .as("root_name"),
        min(when(col("parent_span_id").isNull, rootService))
          .as("root_service"),
        first(when(col("parent_span_id").isNull, resCol),
          ignoreNulls = true).as("root_attrs"))

    // spanSet.attributes: the ROOT's resource attrs, query-filtered
    // (engine.go:200-204); a rootless trace contributes none
    val spanSetStruct = struct(
      col("spans").as("spans"),
      size(col("spans")).as("matched"),
      tempoKvList(filtered(coalesce(col("root_attrs"), emptyMap)))
        .as("attributes"))
    val traces = rollup.join(matchedAgg, Seq("trace_id"))
      .orderBy(col("start_ns"), col("trace_id"))
      .limit(limit)
      .select(to_json(struct(
        format_string("%016x", col("trace_id")).as("traceID"),
        coalesce(col("root_service"), lit("")).as("rootServiceName"),
        coalesce(col("root_name"), lit("")).as("rootTraceName"),
        col("start_ns").cast("string").as("startTimeUnixNano"),
        expr("duration_ns div 1000000").cast("int").as("durationMs"),
        spanSetStruct.as("spanSet"),
        array(spanSetStruct).as("spanSets"))).as("j"))
      .collect().map(_.getString(0))
    s"""{"traces":[${traces.mkString(",")}],"metrics":{}}"""
  }

  /** Tempo trace-by-id response: one trace's spans as a batch
    * (hex ids, ns strings) — the /api/traces/{id} shape.
    */
  def tempoTrace(spans: DataFrame, traceId: Long): String = {
    val rows = traceSpanRows(spans, traceId)
    s"""{"batches":[{"scopeSpans":[{"spans":[${rows.mkString(",")}]}]}]}"""
  }

  /** TraceByIDv2 (/api/v2/traces/{id}): the tempopb TraceByIDResponse
    * wrapper — {"trace":{"resourceSpans":…}} — and None when the
    * trace has no spans (the v2 handler 404s, reference
    * tempohandler.go:660-663).
    */
  def tempoTraceV2(spans: DataFrame, traceId: Long): Option[String] = {
    val rows = traceSpanRows(spans, traceId)
    if (rows.isEmpty) None
    else Some(s"""{"trace":{"resourceSpans":[{"scopeSpans":[{"spans":[${
      rows.mkString(",")}]}]}]}}""")
  }

  private def traceSpanRows(spans: DataFrame, traceId: Long): Array[String] =
    spans.filter(col("trace_id") === traceId)
      .select(to_json(struct(
        format_string("%016x", col("trace_id")).as("traceId"),
        format_string("%016x", col("span_id")).as("spanId"),
        col("name"),
        col("start_ns").cast("string").as("startTimeUnixNano"),
        (col("start_ns") + col("duration_ns")).cast("string").as("endTimeUnixNano"))).as("j"))
      .orderBy("j")
      .collect().map(_.getString(0))

  /** Label-name discovery: distinct map keys, sorted — bounded by
    * label-name cardinality, never sample volume (reference
    * lokihandler.go:243-311 Labels / promhandler.go:72-130 GetLabels).
    * `extra` prepends a synthetic name (`__name__` for Prom).
    */
  def labelNames(df: DataFrame, extra: Option[String]): String = {
    val names = df.select(explode(map_keys(col("labels"))).as("l"))
      .distinct().orderBy("l")
      .collect().map(r => jsonString(r.getString(0)))
    val all = extra.map(jsonString).toSeq ++ names
    s"""{"status":"success","data":[${all.mkString(",")}]}"""
  }

  /** Label-value discovery: distinct non-null values of one label
    * (lokihandler.go:312-364 / promhandler.go:131-180).
    */
  def labelValues(df: DataFrame, value: Column): String = {
    val vals = df.select(value.as("v")).filter(col("v").isNotNull)
      .distinct().orderBy("v")
      .collect().map(r => jsonString(r.getString(0)))
    s"""{"status":"success","data":[${vals.mkString(",")}]}"""
  }

  /** Series discovery: the distinct label SETS, one JSON object each
    * (lokihandler.go:365-604 / promhandler.go:181-281). Distinct runs
    * on the canonical sorted-entry rendering (maps aren't groupable),
    * then the driver collects one row per series.
    */
  def seriesSet(df: DataFrame, labels: Column): String = {
    val rows = df
      .groupBy(graft.logql.VectorMatching.streamKey(labels).as("__k"))
      .agg(first(to_json(labels)).as("j"))
      .orderBy("__k")
      .select("j")
      .collect().map(_.getString(0))
    s"""{"status":"success","data":[${rows.mkString(",")}]}"""
  }

  private[graft] def jsonString(s: String): String =
    "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""

  /** /api/v1/query_exemplars sets: one entry per series, exemplars
    * ts-sorted (reference promhandler.go:392-460). The grouping and
    * per-set JSON render distributed; only one string per series is
    * collected.
    *
    * Frame contract: (ts_us, name, labels, exemplar_labels, value).
    */
  def promExemplars(df: DataFrame): String = {
    val sets = df
      .withColumn("__ex",
        struct(col("ts_us"), col("exemplar_labels"), col("value")))
      .groupBy(col("labels"))
      .agg(collect_list(col("__ex")).as("exs0"))
      // comparator form: sort_array can't order structs holding maps
      .withColumn("exs", expr(
        """array_sort(exs0, (a, b) -> CASE
          |  WHEN a.ts_us < b.ts_us THEN -1 WHEN a.ts_us > b.ts_us THEN 1
          |  WHEN a.value < b.value THEN -1 WHEN a.value > b.value THEN 1
          |  ELSE 0 END)""".stripMargin))
      .select(concat(
        lit("{\"seriesLabels\":"), to_json(col("labels")),
        lit(",\"exemplars\":"),
        // DECIMAL timestamp: to_json renders it plain (a DOUBLE in
        // epoch-seconds range would render scientific)
        to_json(expr(
          """transform(exs, e -> named_struct(
            |  'labels', e.exemplar_labels,
            |  'value', e.value,
            |  'timestamp', CAST(CAST(e.ts_us AS DOUBLE) / 1e6 AS DECIMAL(20,6))))""".stripMargin)),
        lit("}")).as("j"))
      .orderBy("j")
    val rows = sets.collect().map(_.getString(0))
    s"""{"status":"success","data":[${rows.mkString(",")}]}"""
  }

  /** Labels array of the Tempo metrics series envelope
    * (tempoapi Attributes: [{"key":k,"value":{"stringValue":v}}]).
    */
  private def tempoLabels(pairs: Seq[(Column, Column)]): Column =
    if (pairs.isEmpty) lit("[]")
    else to_json(array(pairs.map { case (k, v) =>
      struct(k.as("key"),
        struct(v.cast("string").as("stringValue")).as("value"))
    }: _*))

  /** Series key/labels for a TraceQL metrics result frame: compare()
    * output carries (meta_type, attr, attr_value); a by()/histogram
    * query carries by_value under `byKey`; a bare aggregate is one
    * unlabeled series.
    */
  private def tempoSeriesCols(df: DataFrame,
      byKey: Option[String]): (Seq[Column], Column) =
    if (df.columns.contains("meta_type"))
      (Seq(col("meta_type"), col("attr"), col("attr_value")),
        tempoLabels(Seq(
          lit("__meta_type") -> col("meta_type"),
          col("attr") -> col("attr_value"))))
    else byKey match {
      case Some(k) =>
        (Seq(col("by_value")), tempoLabels(Seq(lit(k) -> col("by_value"))))
      case None => (Nil, tempoLabels(Nil))
    }

  /** Tempo /api/metrics/query_range envelope (tempoapi RangeMetrics:
    * {"series":[{"labels":…,"samples":[{"timestamp_ms":…,"value":…}],
    * "exemplars":[]}]}) from a [[graft.traceql.TraceQL.metricsRange]]
    * frame. Grouping and sample assembly run distributed; one string
    * per series reaches the driver.
    */
  def tempoRangeMetrics(df: DataFrame, byKey: Option[String],
      maxRows: Long = 0L): String = {
    val (keys, labels) = tempoSeriesCols(df, byKey)
    val valueCol = if (df.columns.contains("n")) col("n") else col("value")
    val sample = (p: Column) => concat(
      lit("{\"timestamp_ms\":"), p.getField("t"),
      lit(",\"value\":"), p.getField("v").cast("string"), lit("}"))
    // bound materialization at cap+1 sample rows (see matrixSeries)
    val capped =
      if (maxRows > 0 && maxRows < Int.MaxValue - 1)
        df.limit((maxRows + 1).toInt)
      else df
    val grouped =
      if (keys.isEmpty) capped.groupBy(lit(1).as("__one"))
      else capped.groupBy(keys: _*)
    val rows = grouped
      .agg(sort_array(collect_list(struct(
        expr("bucket_ns div 1000000").as("t"), valueCol.as("v")))).as("pts"))
      .select(concat(
        lit("{\"labels\":"), labels,
        lit(",\"samples\":["), concat_ws(",", transform(col("pts"), sample)),
        lit("],\"exemplars\":[]}")).as("series_json"),
        size(col("pts")).as("__n"))
      .orderBy("series_json")
      .collect()
    // single-pass sample cap (see [[Limits.checkRows]]): counted on
    // the same collect that assembles the envelope
    if (maxRows > 0) {
      var total = 0L
      rows.foreach(r => total += r.getInt(1).toLong)
      Limits.checkRows(total, maxRows)
    }
    val series = rows.map(_.getString(0))
    s"""{"series":[${series.mkString(",")}]}"""
  }

  /** Tempo /api/metrics/query envelope (tempoapi InstantMetrics:
    * {"series":[{"labels":…,"value":…}]}) — the caller evaluates with
    * ONE step spanning the window, so each series has one sample.
    */
  def tempoInstantMetrics(df: DataFrame, byKey: Option[String]): String = {
    val (keys, labels) = tempoSeriesCols(df, byKey)
    val valueCol = if (df.columns.contains("n")) col("n") else col("value")
    val grouped =
      if (keys.isEmpty) df.groupBy(lit(1).as("__one"))
      else df.groupBy(keys: _*)
    val series = grouped
      // one bucket per window by construction; sum is a no-op guard
      .agg(sum(valueCol).as("v"))
      .select(concat(
        lit("{\"labels\":"), labels,
        lit(",\"value\":"), col("v").cast("string"), lit("}"))
        .as("series_json"))
      .orderBy("series_json")
      .collect().map(_.getString(0))
    s"""{"series":[${series.mkString(",")}]}"""
  }

  /** Prom /api/v1/metadata envelope from a series-identity frame
    * (name, unit, description): name → [{type, help, unit}], sorted,
    * optional exact-name filter and limit (reference
    * promhandler.go:463-496; type is always "counter" there too —
    * chstorage querier_metrics_timeseries.go:376-381 TODO).
    */
  def promMetadata(series: DataFrame, metric: Option[String],
      limit: Option[Int]): String = {
    val hasMeta = series.columns.contains("unit")
    val unit = if (hasMeta) coalesce(col("unit"), lit("")) else lit("")
    val desc =
      if (hasMeta) coalesce(col("description"), lit("")) else lit("")
    val base = metric.filter(_.nonEmpty)
      .fold(series)(m => series.filter(col("name") === m))
    val agg = base.groupBy(col("name"))
      .agg(first(unit, ignoreNulls = true).as("u"),
        first(desc, ignoreNulls = true).as("d"))
      .orderBy("name")
    val capped = limit.filter(_ > 0).fold(agg)(agg.limit)
    // bounded by metric-name cardinality, never sample volume
    val entries = capped.collect().map { r =>
      val (n, u, d) =
        (r.getString(0), Option(r.getString(1)), Option(r.getString(2)))
      s"""${jsonString(n)}:[{"type":"counter","help":${jsonString(
        d.getOrElse(""))},"unit":${jsonString(u.getOrElse(""))}}]"""
    }
    s"""{"status":"success","data":{${entries.mkString(",")}}}"""
  }

  private def envelope(resultType: String, series: DataFrame,
      maxBytes: Long = 0L, maxRows: Long = 0L): String = {
    // one row PER SERIES; the byte cap meters each rendered series as
    // the envelope assembles (reference MaxResultBytes semantics: the
    // typed error fires before the oversized envelope is built)
    val meter = new Limits.ByteMeter(maxBytes)
    val rows = series.collect()
    // sample-count cap, post-drain on the SAME collect (no second plan
    // execution): frames carrying a per-series `__n` column sum it
    if (maxRows > 0 && series.columns.contains("__n")) {
      var total = 0L
      rows.foreach(r => total += r.getInt(1).toLong)
      Limits.checkRows(total, maxRows)
    }
    val sb = new StringBuilder(
      s"""{"status":"success","data":{"resultType":"$resultType","result":[""")
    var i = 0
    while (i < rows.length) {
      if (i > 0) sb.append(',')
      sb.append(meter.add(rows(i).getString(0)))
      i += 1
    }
    sb.append("]}}")
    sb.toString
  }
}
