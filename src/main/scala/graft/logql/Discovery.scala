package graft.logql

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{MapType, StringType}

/** Log-discovery queries behind Grafana's Logs Drilldown — the
  * reference serves these from lokihandler (DetectedLabels /
  * DetectedFields / DetectedFieldValues: lokihandler.go:62-233,
  * chstorage/querier_logs.go:246-470; Volume: lokihandler.go:404-551).
  *
  * Input contract is the planner's: `ts_ns: Long`, `body: String`,
  * `labels: Map[String, String]`.
  *
  * Scale notes: every query here is explode → groupBy(key) with
  * map-side partial aggregation — output is bounded by label/field
  * cardinality, never by log volume; time/selector filters land on
  * the scan before the explode.
  */
object Discovery {

  /** Stream-label keys with their value cardinality (DetectedLabels,
    * querier_logs.go:246-330; default limit 100 like the handler).
    */
  def detectedLabels(logs: DataFrame, limit: Int = 100): DataFrame =
    logs.select(explode(col("labels")).as(Seq("label", "__v")))
      .groupBy("label")
      .agg(count_distinct(col("__v")).as("cardinality"))
      .orderBy("label")
      .limit(limit)

  private val IntRe = "^-?\\d+$"
  private val FloatRe = "^-?(\\d+\\.\\d*|\\.\\d+|\\d+)([eE][+-]?\\d+)?$"
  private val BoolRe = "^(true|false)$"
  private val DurRe = "^-?(\\d+(\\.\\d+)?(ns|us|µs|ms|s|m|h|d|w))+$"
  private val BytesRe = "^-?\\d+(\\.\\d+)?\\s?([kKMGTPE]i?)?[bB]$"

  /** Fields detected from structured log CONTENT (JSON bodies), with a
    * type deduced from the value population and the value cardinality
    * (DetectedFields, querier_logs.go:361-470 — the reference reads its
    * materialized label map; here the JSON body is the field source).
    * Type heuristic mirrors Loki's: every value int → int, float →
    * float, boolean → boolean, duration → duration, bytes → bytes,
    * else string.
    */
  def detectedFields(logs: DataFrame, limit: Int = 100): DataFrame = {
    val kv = logs.select(
      explode(from_json(col("body"), MapType(StringType, StringType)))
        .as(Seq("label", "__v")))
      .filter(col("__v").isNotNull)
    def allMatch(re: String): Column =
      max(when(col("__v").rlike(re), 0).otherwise(1)) === 0
    kv.groupBy("label")
      .agg(
        count_distinct(col("__v")).as("cardinality"),
        allMatch(IntRe).as("__int"),
        allMatch(FloatRe).as("__float"),
        allMatch(BoolRe).as("__bool"),
        allMatch(DurRe).as("__dur"),
        allMatch(BytesRe).as("__bytes"))
      .select(col("label"),
        when(col("__bool"), "boolean")
          .when(col("__int"), "int")
          .when(col("__float"), "float")
          .when(col("__dur"), "duration")
          .when(col("__bytes"), "bytes")
          .otherwise("string").as("type"),
        col("cardinality"))
      .orderBy("label")
      .limit(limit)
  }

  /** Values of one detected field: stream label first, then the JSON
    * body field (DetectedFieldValues, lokihandler.go:62-114).
    */
  def detectedFieldValues(logs: DataFrame, field: String,
      limit: Int = 100): DataFrame =
    logs.select(coalesce(element_at(col("labels"), field),
        get_json_object(col("body"), s"$$.${field}")).as("value"))
      .filter(col("value").isNotNull)
      .distinct().orderBy("value").limit(limit)

  /** Log volume: entry counts grouped by `targetLabels` (or the
    * selector's matcher labels) over the whole window — the handler's
    * `sum by (agg) (count_over_time({sel}[end-start]))` instant
    * evaluation collapses to exactly this one aggregation
    * (lokihandler.go:495-551). Output (labels, value), one row per
    * group.
    */
  /** Label sub-map used as the volume grouping key. An EMPTY
    * aggregation set (the HTTP default query `{}` with no
    * targetLabels) is guarded explicitly — everything groups into one
    * empty-label series — instead of relying on how a zero-column
    * `array()` coerces inside array_contains.
    */
  private def aggSubMap(agg: Seq[String]): Column =
    if (agg.isEmpty) map().cast("map<string,string>")
    else {
      val aggArr = array(agg.map(lit): _*)
      map_filter(col("labels"), (k, _) => array_contains(aggArr, k))
    }

  def volume(logs: DataFrame, selector: String,
      targetLabels: Seq[String] = Nil): DataFrame = {
    val lq = Parser.parse(selector) match {
      case Ast.LogExpr(l) if l.stages.isEmpty => l
      case _ => throw new IllegalArgumentException(
        "volume requires a selector-only query")
    }
    val agg =
      (if (targetLabels.nonEmpty) targetLabels else lq.matchers.map(_.label))
        .distinct.sorted
    val resolve = (k: String) => element_at(col("labels"), k)
    val filtered = lq.matchers.map(m => Planner.matcherCol(m, resolve))
      .reduceOption(_ && _).fold(logs)(logs.filter)
    filtered
      .withColumn("__sub", aggSubMap(agg))
      .groupBy(VectorMatching.streamKey(col("__sub")).as("__k"))
      .agg(count(lit(1)).cast("double").as("value"))
      .orderBy("__k")
      .select(VectorMatching.labelsOfStreamKey(col("__k")).as("labels"),
        col("value"))
  }

  /** volume_range: [[volume]] bucketed on a step grid — one count
    * series per targetLabels group, the Grafana drilldown timeline
    * (reference lokihandler.go:447-551 QueryVolumeRange). Same single
    * aggregation with the bucket in the key.
    */
  def volumeRange(logs: DataFrame, selector: String, stepNs: Long,
      targetLabels: Seq[String] = Nil): DataFrame = {
    val lq = Parser.parse(selector) match {
      case Ast.LogExpr(l) if l.stages.isEmpty => l
      case _ => throw new IllegalArgumentException(
        "volume requires a selector-only query")
    }
    val agg =
      (if (targetLabels.nonEmpty) targetLabels else lq.matchers.map(_.label))
        .distinct.sorted
    val resolve = (k: String) => element_at(col("labels"), k)
    val filtered = lq.matchers.map(m => Planner.matcherCol(m, resolve))
      .reduceOption(_ && _).fold(logs)(logs.filter)
    filtered
      .withColumn("__sub", aggSubMap(agg))
      .withColumn("bucket_ns", col("ts_ns") - col("ts_ns") % lit(stepNs))
      .groupBy(col("bucket_ns"),
        VectorMatching.streamKey(col("__sub")).as("__k"))
      .agg(count(lit(1)).cast("double").as("value"))
      .orderBy("bucket_ns", "__k")
      .select(col("bucket_ns"),
        VectorMatching.labelsOfStreamKey(col("__k")).as("labels"),
        col("value"))
  }
}
