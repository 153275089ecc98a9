package graft.model

import org.apache.spark.sql.types._

/** Canonical table schemas for the engine — the Spark mapping of the
  * reference's ClickHouse DDL (SURVEY.md §1.2/§1.4; reference golden DDL
  * internal/chstorage/_golden/schema.*.sql).
  *
  * Conventions:
  *   - every signal keeps BOTH a µs TimestampType (`timestamp`, for
  *     windowing / partition pruning) and an epoch-ns Long (`ts_ns`,
  *     for API-fidelity arithmetic — LogQL returns ns).
  *   - attributes are MAP<STRING,STRING> for the exact-match fast path
  *     plus an `attrs_json` STRING column for typed/nested access
  *     (reference stores JSON-encoded strings,
  *     internal/chstorage/attributes.go:80-195).
  *   - well-known resource attrs (`service.name`, `service.namespace`,
  *     `service.instance.id`) are materialized top-level columns and
  *     spliced back into the map on read
  *     (reference: internal/chstorage/columns_logs.go:264-273).
  *   - trace/span ids are BINARY; hex only at API edges.
  *
  * At scale these tables are laid out as date-partitioned parquet with
  * sortWithinPartitions on the reference ORDER BY keys (logs:
  * severity_number, service, timestamp; spans: service, start; points:
  * series hash, timestamp) so that min/max stats prune like MergeTree
  * primary-key ranges.
  */
object Schemas {

  val logs: StructType = StructType(Seq(
    StructField("timestamp", TimestampType),
    StructField("ts_ns", LongType),
    StructField("observed_ts_ns", LongType),
    StructField("severity_number", IntegerType),
    StructField("severity_text", StringType),
    StructField("service_name", StringType),
    StructField("service_namespace", StringType),
    StructField("service_instance_id", StringType),
    StructField("trace_id", BinaryType),
    StructField("span_id", BinaryType),
    StructField("trace_flags", IntegerType),
    StructField("body", StringType),
    StructField("attrs", MapType(StringType, StringType)),
    StructField("attrs_json", StringType),
    StructField("resource", MapType(StringType, StringType)),
    StructField("scope_name", StringType),
    StructField("scope_version", StringType),
    StructField("scope", MapType(StringType, StringType))
  ))

  val spanEvent: StructType = StructType(Seq(
    StructField("ts_ns", LongType),
    StructField("name", StringType),
    StructField("attrs", MapType(StringType, StringType))
  ))

  val spanLink: StructType = StructType(Seq(
    StructField("trace_id", BinaryType),
    StructField("span_id", BinaryType),
    StructField("trace_state", StringType),
    StructField("attrs", MapType(StringType, StringType))
  ))

  val spans: StructType = StructType(Seq(
    StructField("trace_id", BinaryType),
    StructField("span_id", BinaryType),
    StructField("parent_span_id", BinaryType),
    StructField("trace_state", StringType),
    StructField("name", StringType),
    StructField("kind", IntegerType),
    StructField("start", TimestampType),
    StructField("start_ns", LongType),
    StructField("end_ns", LongType),
    StructField("duration_ns", LongType),
    StructField("status_code", IntegerType),
    StructField("status_message", StringType),
    StructField("service_name", StringType),
    StructField("service_namespace", StringType),
    StructField("attrs", MapType(StringType, StringType)),
    StructField("attrs_json", StringType),
    StructField("resource", MapType(StringType, StringType)),
    StructField("scope_name", StringType),
    StructField("scope_version", StringType),
    StructField("scope", MapType(StringType, StringType)),
    StructField("events", ArrayType(spanEvent)),
    StructField("links", ArrayType(spanLink))
  ))

  /** Flattened metric points (reference metrics_points: gauges/sums plus
    * histogram/summary sub-series distinguished by `mapping`,
    * internal/chstorage/_golden/schema.metrics_points.sql).
    */
  val points: StructType = StructType(Seq(
    StructField("hash", BinaryType),
    StructField("name", StringType),
    StructField("timestamp", TimestampType),
    StructField("ts_ns", LongType),
    StructField("value", DoubleType),
    StructField("mapping", ByteType),
    StructField("flags", ByteType)
  ))

  /** Series identity (reference metrics_timeseries AggregatingMergeTree,
    * internal/chstorage/columns_metrics.go:66-70).
    */
  val series: StructType = StructType(Seq(
    StructField("hash", BinaryType),
    StructField("name", StringType),
    StructField("unit", StringType),
    StructField("description", StringType),
    StructField("attrs", MapType(StringType, StringType)),
    StructField("resource", MapType(StringType, StringType)),
    StructField("scope", MapType(StringType, StringType)),
    StructField("first_seen", TimestampType),
    StructField("last_seen", TimestampType)
  ))

  /** Native exponential histograms
    * (reference metrics_exp_histograms, columns_metrics.go:237-241).
    */
  val expHistograms: StructType = StructType(Seq(
    StructField("hash", BinaryType),
    StructField("timestamp", TimestampType),
    StructField("ts_ns", LongType),
    StructField("count", LongType),
    StructField("sum", DoubleType),
    StructField("min", DoubleType),
    StructField("max", DoubleType),
    StructField("scale", IntegerType),
    StructField("zerocount", LongType),
    StructField("positive_offset", IntegerType),
    StructField("positive_buckets", ArrayType(LongType)),
    StructField("negative_offset", IntegerType),
    StructField("negative_buckets", ArrayType(LongType)),
    StructField("flags", ByteType)
  ))

  /** Point-kind mapping values (reference Enum8 `mapping`). */
  object Mapping {
    val NoMapping: Byte       = 0
    val HistogramCount: Byte  = 1
    val HistogramSum: Byte    = 2
    val HistogramMin: Byte    = 3
    val HistogramMax: Byte    = 4
    val HistogramBucket: Byte = 5
    val SummaryCount: Byte    = 6
    val SummarySum: Byte      = 7
    val SummaryQuantile: Byte = 8
  }
}
