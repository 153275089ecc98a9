package graft.util

import org.apache.spark.sql.SparkSession

/** Session factory carrying the engine's standard configuration.
  *
  * Design notes (SURVEY.md §1.4, §4.2):
  *   - `spark.sql.legacy.parquet.nanosAsLong=true`: the reference stores
  *     ns-precision timestamps (DateTime64(9)); Spark's TimestampType is µs.
  *     Reading parquet TIMESTAMP(NANOS) as a raw Long keeps ns fidelity
  *     end-to-end (LogQL APIs return ns), exactly like the reference keeps
  *     a ns uint64 (reference: internal/otelstorage/timestamp.go:11-15).
  *   - AQE on: runtime shuffle coalescing + skew-join handling is our
  *     stand-in for ClickHouse's adaptive merges at 100 TB.
  *   - shuffle partitions default to the core count locally; on a real
  *     cluster this is expected to be overridden (e.g. 2-3× total cores).
  */
object GraftSession {

  /** Apply the engine's standard configuration to a builder. */
  def configure(b: SparkSession.Builder, shufflePartitions: Int): SparkSession.Builder =
    b.withExtensions(graft.functions.GraftFunctions.inject)
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled",
        sys.env.getOrElse("SPARK_GRAFT_AQE", "true"))
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // Label-map rewrites (label_replace dst overwrite, OTLP
      // resource/point attr merges) legitimately produce duplicate map
      // keys; the default EXCEPTION policy would fail the whole query
      // or ingest batch. LAST_WIN matches PromQL/LogQL label-overwrite
      // semantics (the rewritten value replaces the old one).
      .config("spark.sql.mapKeyDedupPolicy", "LAST_WIN")
      .config("spark.sql.autoBroadcastJoinThreshold", (64L * 1024 * 1024).toString)
      .config("spark.serializer", "org.apache.spark.serializer.KryoSerializer")
      .config("spark.ui.enabled", "false")

  /** Local session for tests and ad-hoc runs. */
  def local(cores: Int = 32, appName: String = "graft"): SparkSession = {
    val spark = configure(
      SparkSession.builder().master(s"local[$cores]").appName(appName),
      math.max(cores, 1)
    ).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }
}
