package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sources.Testdata

/** Remaining LogQL surface (SURVEY.md §2.1/§2.2): unpack, JSON path
  * extraction, or-list line filters, first/last_over_time, rate_counter
  * (Prometheus extrapolation + counter resets over unwrapped values),
  * sort/sort_desc, range offset, vector()/literal expressions.
  */
object QueriesLogQLMore extends QueryPack {

  private def q(name: String, oracle: String)(f: Testdata => DataFrame): Q =
    Q(name, (s: SparkSession, dir: String) => f(Testdata(s, dir)), Some(oracle))

  private val Step1dNs = 86400000000000L
  private val DayUs = 86400000000L

  /** `| unpack` — promtail pack format: lift JSON fields to labels and
    * `_entry` to the line (reference logqlengine/unpack.go). The packed
    * body is synthesized with plain string concat so the oracle can
    * unpack with standard JSON functions.
    */
  val unpack: Q = q(
    "logql_unpack",
    """SELECT lvl, MAX(line) AS max_line, COUNT(*) AS n FROM (
      |  SELECT json_extract_string(packed, '$._entry') AS line,
      |         json_extract_string(packed, '$.lvl') AS lvl
      |  FROM (
      |    SELECT concat('{"_entry":"line-', event_id, '","lvl":"', event_type, '"}') AS packed
      |    FROM events))
      |GROUP BY lvl ORDER BY lvl""".stripMargin
  ) { td =>
    val packed = concat(lit("{\"_entry\":\"line-"), col("event_id"),
      lit("\",\"lvl\":\""), col("event_type"), lit("\"}"))
    td.events
      .select(
        get_json_object(packed, "$._entry").as("line"),
        get_json_object(packed, "$.lvl").as("lvl"))
      .groupBy(col("lvl"))
      .agg(max(col("line")).as("max_line"), count(lit(1)).as("n"))
      .orderBy("lvl")
  }

  /** `| json nested="a.b", second="arr[1]"` — JSONPath field selection
    * into labels (reference logqlengine/json.go + jsonexpr parser).
    */
  val jsonPaths: Q = q(
    "logql_json_paths",
    """SELECT event_type,
      |  CAST(SUM(CAST(json_extract_string(j, '$.a.b') AS BIGINT)) AS BIGINT) AS sum_ab,
      |  CAST(SUM(CAST(json_extract_string(j, '$.arr[1]') AS BIGINT)) AS BIGINT) AS sum_arr1
      |FROM (
      |  SELECT event_type,
      |    concat('{"a":{"b":', user_id, '},"arr":[1,', event_id % 100, ']}') AS j
      |  FROM events)
      |GROUP BY event_type ORDER BY event_type""".stripMargin
  ) { td =>
    val j = concat(lit("{\"a\":{\"b\":"), col("user_id"),
      lit("},\"arr\":[1,"), col("event_id") % 100, lit("]}"))
    td.events
      .select(col("event_type"),
        get_json_object(j, "$.a.b").cast("long").as("ab"),
        get_json_object(j, "$.arr[1]").cast("long").as("arr1"))
      .groupBy(col("event_type"))
      .agg(sum(col("ab")).as("sum_ab"), sum(col("arr1")).as("sum_arr1"))
      .orderBy("event_type")
  }

  /** Line filter or-lists: `|= "..." or "..."` and `!~ ".." or ".."`
    * (reference pipeline.go:35-91 multi-value filters; SQL lowering
    * querier_logs_query.go:654-697).
    */
  val lineFilterOr: Q = q(
    "logql_line_filter_or",
    """SELECT event_type, COUNT(*) AS n FROM events
      |WHERE (contains(props, '"k": 1') OR contains(props, '"k": 2'))
      |  AND NOT (regexp_matches(props, '"k": 1[0-9]') OR regexp_matches(props, '"k": 2[0-9]'))
      |GROUP BY event_type ORDER BY event_type""".stripMargin
  ) { td =>
    td.events
      .filter((col("props").contains("\"k\": 1") || col("props").contains("\"k\": 2")) &&
        !(col("props").rlike("\"k\": 1[0-9]") || col("props").rlike("\"k\": 2[0-9]")))
      .groupBy(col("event_type")).agg(count(lit(1)).as("n"))
      .orderBy("event_type")
  }

  /** `first_over_time` / `last_over_time` per step (reference
    * logqlmetric/aggregator.go first/last).
    */
  val firstLastOverTime: Q = q(
    "logql_first_last_over_time",
    s"""SELECT event_type, bucket_ns,
       |  ARG_MIN(value, ts_ns) AS first_v, ARG_MAX(value, ts_ns) AS last_v
       |FROM (SELECT event_type, value, epoch_ns(ts) AS ts_ns,
       |        epoch_ns(ts) - epoch_ns(ts) % $Step1dNs AS bucket_ns FROM events)
       |GROUP BY event_type, bucket_ns ORDER BY event_type, bucket_ns""".stripMargin
  ) { td =>
    td.events
      .withColumn("bucket_ns", col("ts") - col("ts") % Step1dNs)
      .groupBy(col("event_type"), col("bucket_ns"))
      .agg(
        min_by(col("value"), col("ts")).as("first_v"),
        max_by(col("value"), col("ts")).as("last_v"))
      .orderBy("event_type", "bucket_ns")
  }

  /** `rate_counter({..} | unwrap value [1d])` — Prometheus
    * extrapolatedRate over unwrapped values INCLUDING counter-reset
    * correction (raw values reset constantly, so the correction term
    * dominates; reference logqlmetric/aggregator.go:81-89 +
    * prom_math.go:31-104). Corrections accumulate decimal-exact.
    */
  val rateCounter: Q = {
    val resultSql = "(last_v - first_v + corr)"
    q(
      "logql_rate_counter",
      s"""SELECT event_type, bucket_us,
         |  $resultSql * ${PromMath.oracleExtrapolation(counterZeroClamp = true, resultSql)} / 86400.0 AS rate
         |FROM (
         |  SELECT event_type, bucket_us, COUNT(*) AS n,
         |    MIN(ts_us) AS first_ts_us, MAX(ts_us) AS last_ts_us,
         |    ARG_MIN(value, ts_us) AS first_v, ARG_MAX(value, ts_us) AS last_v,
         |    CAST(COALESCE(SUM(CAST(CASE WHEN value < prev THEN prev END AS DECIMAL(18,4))), 0) AS DOUBLE) AS corr
         |  FROM (
         |    SELECT event_type, value, ts_us, bucket_us,
         |      lag(value) OVER (PARTITION BY event_type, bucket_us ORDER BY ts_us, event_id) AS prev
         |    FROM (SELECT event_type, value, event_id, epoch_us(ts) AS ts_us,
         |            epoch_us(ts) - epoch_us(ts) % $DayUs AS bucket_us FROM events))
         |  GROUP BY event_type, bucket_us)
         |WHERE n >= 2 ORDER BY event_type, bucket_us""".stripMargin
    ) { td =>
      val wLag = Window.partitionBy(col("event_type"), col("bucket_us"))
        .orderBy(col("ts_us"), col("event_id"))
      val st = td.events
        .withColumn("ts_us", expr("ts div 1000"))
        .withColumn("bucket_us", expr(s"ts_us - ts_us % $DayUs"))
        .withColumn("prev", lag(col("value"), 1).over(wLag))
        .groupBy(col("event_type"), col("bucket_us"))
        .agg(
          count(lit(1)).as("n"),
          min(col("ts_us")).as("first_ts_us"),
          max(col("ts_us")).as("last_ts_us"),
          min_by(col("value"), col("ts_us")).as("first_v"),
          max_by(col("value"), col("ts_us")).as("last_v"),
          coalesce(sum(when(col("value") < col("prev"), col("prev"))
            .cast("decimal(18,4)")), lit(0)).cast("double").as("corr"))
        .filter(col("n") >= 2)
      val resultValue = col("last_v") - col("first_v") + col("corr")
      val factor = PromMath.extrapolation(col("first_ts_us"), col("last_ts_us"),
        col("bucket_us"), col("n"), resultValue, col("first_v"), counterZeroClamp = true)
      st.select(col("event_type"), col("bucket_us"),
          (resultValue * factor / 86400.0).as("rate"))
        .orderBy("event_type", "bucket_us")
    }
  }

  /** `sort_desc(count_over_time(..))` — series ordered by value within
    * each step, rank materialized (reference logql/op.go:210-238).
    */
  val sortDesc: Q = q(
    "logql_sort_desc",
    s"""SELECT bucket_ns, event_type, n,
       |  row_number() OVER (PARTITION BY bucket_ns ORDER BY n DESC, event_type) AS rk
       |FROM (
       |  SELECT epoch_ns(ts) - epoch_ns(ts) % $Step1dNs AS bucket_ns, event_type, COUNT(*) AS n
       |  FROM events GROUP BY 1, 2)
       |ORDER BY bucket_ns, rk""".stripMargin
  ) { td =>
    val counts = td.events
      .withColumn("bucket_ns", col("ts") - col("ts") % Step1dNs)
      .groupBy(col("bucket_ns"), col("event_type"))
      .agg(count(lit(1)).as("n"))
    val w = Window.partitionBy(col("bucket_ns")).orderBy(col("n").desc, col("event_type"))
    counts.withColumn("rk", row_number().over(w))
      .select(col("bucket_ns"), col("event_type"), col("n"), col("rk"))
      .orderBy("bucket_ns", "rk")
  }

  /** `count_over_time({..}[1d] offset 1d)` — the selected range shifts
    * back by the offset; bucket labels stay on the query grid
    * (reference logql/range_expr.go:8-30 offset folding).
    */
  val offsetRange: Q = q(
    "logql_offset",
    s"""SELECT bucket_ns, event_type, COUNT(*) AS n FROM (
       |  SELECT (epoch_ns(ts) + $Step1dNs) - (epoch_ns(ts) + $Step1dNs) % $Step1dNs AS bucket_ns,
       |    event_type
       |  FROM events)
       |GROUP BY bucket_ns, event_type ORDER BY bucket_ns, event_type""".stripMargin
  ) { td =>
    td.events
      .withColumn("shifted", col("ts") + Step1dNs)
      .withColumn("bucket_ns", col("shifted") - col("shifted") % Step1dNs)
      .groupBy(col("bucket_ns"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .orderBy("bucket_ns", "event_type")
  }

  /** `vector(5) * 2 + 1` over the step grid — literal expressions and
    * constant folding (reference logql/metric_expr.go:126-236
    * ReduceBinOp; Catalyst folds the arithmetic to 11 at plan time).
    */
  val vectorLiteral: Q = q(
    "logql_vector_literal",
    s"""WITH ext AS (
       |  SELECT min(epoch_ns(ts) - epoch_ns(ts) % $Step1dNs) AS lo,
       |         max(epoch_ns(ts) - epoch_ns(ts) % $Step1dNs) AS hi FROM events)
       |SELECT unnest(generate_series(lo, hi, $Step1dNs)) AS bucket_ns, 11 AS value
       |FROM ext ORDER BY bucket_ns""".stripMargin
  ) { td =>
    val ext = td.events.agg(
      min(col("ts") - col("ts") % Step1dNs).as("lo"),
      max(col("ts") - col("ts") % Step1dNs).as("hi"))
    ext.select(explode(sequence(col("lo"), col("hi"), lit(Step1dNs))).as("bucket_ns"))
      .withColumn("value", lit(5) * 2 + 1)
      .orderBy("bucket_ns")
  }

  /** Log PATTERN MINING — the `/loki/api/v1/patterns` surface the
    * reference stubs empty (lokihandler.go:605-610; parity-plus).
    * Bodies are synthesized from events with plain concat (identical
    * on both engines), then masked and counted by
    * [[graft.logql.PatternMine]]: variable tokens (numbers, hex ids,
    * durations) collapse to `<_>` and each (pattern, level, day)
    * bucket counts occurrences. One template-keyed shuffle; the
    * masking is a codegen'd projection fused into the scan.
    */
  val patternMining: Q = {
    val tmpl = graft.logql.PatternMine.oracleTemplate("body")
    q(
      "logql_pattern_mining",
      s"""WITH lines AS (
         |  SELECT epoch_ns(ts) - epoch_ns(ts) % $Step1dNs AS bucket_ns,
         |    concat('level=', CASE WHEN event_type = 'error' THEN 'error' ELSE 'info' END,
         |      ' user=', user_id, ' action=', event_type,
         |      ' took=', CAST(floor(value * 100) AS BIGINT), 'ms',
         |      ' trace=', md5(CAST(event_id AS VARCHAR))) AS body
         |  FROM events)
         |SELECT $tmpl AS pattern,
         |  CASE WHEN regexp_matches(lower(body), '\\b(error|err|fatal|panic)\\b') THEN 'error'
         |       WHEN regexp_matches(lower(body), '\\b(warn|warning)\\b') THEN 'warn'
         |       WHEN regexp_matches(lower(body), '\\bdebug\\b') THEN 'debug'
         |       WHEN regexp_matches(lower(body), '\\b(info|information)\\b') THEN 'info'
         |       ELSE 'unknown' END AS level,
         |  bucket_ns, CAST(COUNT(*) AS BIGINT) AS n
         |FROM lines GROUP BY pattern, level, bucket_ns
         |ORDER BY bucket_ns, pattern""".stripMargin
    ) { td =>
      val body = concat(
        lit("level="),
        when(col("event_type") === "error", "error").otherwise("info"),
        lit(" user="), col("user_id"),
        lit(" action="), col("event_type"),
        lit(" took="), floor(col("value") * 100).cast("long"), lit("ms"),
        lit(" trace="), md5(col("event_id").cast("string")))
      val logs = td.events.select(col("ts").as("ts_ns"), body.as("body"))
      graft.logql.PatternMine.mine(logs, Step1dNs)
        .orderBy("bucket_ns", "pattern")
    }
  }

  override def queries: Seq[Q] = Seq(
    unpack, jsonPaths, lineFilterOr, firstLastOverTime,
    rateCounter, sortDesc, offsetRange, vectorLiteral, patternMining
  )
}
