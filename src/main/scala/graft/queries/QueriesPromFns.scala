package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.promql.PromQL
import graft.sources.Testdata

/** PromQL function surface through the parser: math/clamp functions,
  * label_replace/label_join, and the extended *_over_time family.
  */
object QueriesPromFns extends QueryPack {

  private val DayUs = 86400000000L

  private def pointsView(td: Testdata): DataFrame =
    td.events.select(
      expr("ts div 1000").as("ts_us"),
      lit("ev").as("name"),
      col("value"),
      map(
        lit("svc"), (col("user_id") % 4).cast("string"),
        lit("et"), col("event_type")).as("labels"))

  /** clamp(sqrt(·)) composition — identical IEEE shapes both sides. */
  val mathFns: Q = Q(
    "promql_e2e_math_fns",
    (s: SparkSession, dir: String) =>
      PromQL.range("""clamp(sqrt(sum by (svc) (count_over_time(ev[1d]))), 10, 50)""",
          pointsView(Testdata(s, dir)))
        .select(col("bucket_us"),
          element_at(col("labels"), "svc").as("svc"),
          round(col("value"), 6).as("value"))
        .orderBy("bucket_us", "svc"),
    Some(
      s"""SELECT bucket_us, svc,
         |  round(least(greatest(sqrt(n), 10.0), 50.0), 6) AS value
         |FROM (
         |  SELECT epoch_us(ts) - epoch_us(ts) % $DayUs AS bucket_us,
         |    CAST(user_id % 4 AS VARCHAR) AS svc, CAST(COUNT(*) AS DOUBLE) AS n
         |  FROM events GROUP BY 1, 2)
         |ORDER BY bucket_us, svc""".stripMargin))

  /** label_replace + label_join rewrite the label map (full-match rule). */
  val labelFns: Q = Q(
    "promql_e2e_label_fns",
    (s: SparkSession, dir: String) =>
      PromQL.range(
          """label_join(label_replace(sum by (svc) (count_over_time(ev[1d])), "env", "zone-$1", "svc", "(.*)"), "combo", "|", "svc", "env")""",
          pointsView(Testdata(s, dir)))
        .select(col("bucket_us"),
          element_at(col("labels"), "svc").as("svc"),
          element_at(col("labels"), "env").as("env"),
          element_at(col("labels"), "combo").as("combo"), col("value"))
        .orderBy("bucket_us", "svc"),
    Some(
      s"""SELECT bucket_us, svc, 'zone-' || svc AS env,
         |  svc || '|' || 'zone-' || svc AS combo, CAST(n AS DOUBLE) AS value
         |FROM (
         |  SELECT epoch_us(ts) - epoch_us(ts) % $DayUs AS bucket_us,
         |    CAST(user_id % 4 AS VARCHAR) AS svc, COUNT(*) AS n
         |  FROM events GROUP BY 1, 2)
         |ORDER BY bucket_us, svc""".stripMargin))

  /** quantile_over_time × present_over_time — the extended over-time
    * family through the parser; present contributes exactly 1.0 per
    * live series, so the product must equal the median alone.
    */
  val overtimeExt: Q = Q(
    "promql_e2e_overtime_ext",
    (s: SparkSession, dir: String) =>
      PromQL.range("""quantile_over_time(0.5, ev[1d]) * present_over_time(ev[1d])""",
          pointsView(Testdata(s, dir)))
        .select(col("bucket_us"),
          element_at(col("labels"), "svc").as("svc"),
          element_at(col("labels"), "et").as("et"),
          round(col("value"), 6).as("value"))
        .orderBy("bucket_us", "svc", "et"),
    Some(
      s"""SELECT epoch_us(ts) - epoch_us(ts) % $DayUs AS bucket_us,
         |  CAST(user_id % 4 AS VARCHAR) AS svc, event_type AS et,
         |  round(quantile_cont(value, 0.5) * 1.0, 6) AS value
         |FROM events GROUP BY 1, 2, 3
         |ORDER BY bucket_us, svc, et""".stripMargin))

  /** stddev_over_time per series. */
  val stddevOverTime: Q = Q(
    "promql_e2e_stddev_over_time",
    (s: SparkSession, dir: String) =>
      PromQL.range("""stddev_over_time(ev[1d])""", pointsView(Testdata(s, dir)))
        .select(col("bucket_us"),
          element_at(col("labels"), "svc").as("svc"),
          element_at(col("labels"), "et").as("et"),
          round(col("value"), 6).as("value"))
        .orderBy("bucket_us", "svc", "et"),
    Some(
      s"""SELECT epoch_us(ts) - epoch_us(ts) % $DayUs AS bucket_us,
         |  CAST(user_id % 4 AS VARCHAR) AS svc, event_type AS et,
         |  round(stddev_pop(value), 6) AS value
         |FROM events GROUP BY 1, 2, 3
         |ORDER BY bucket_us, svc, et""".stripMargin))

  /** Subquery: daily max of 6h counts per svc — the inner evaluates on
    * its own (end-labeled) 6h step grid, the outer over-time tumbles
    * those points by day.
    */
  val subquery: Q = {
    val H6 = 21600000000L
    Q(
      "promql_e2e_subquery",
      (s: SparkSession, dir: String) =>
        PromQL.range("""max_over_time(sum by (svc) (count_over_time(ev[6h]))[1d:6h])""",
            pointsView(Testdata(s, dir)))
          .select(col("bucket_us"),
            element_at(col("labels"), "svc").as("svc"), col("value"))
          .orderBy("bucket_us", "svc"),
      Some(
        s"""SELECT s6 - s6 % $DayUs AS bucket_us, svc, CAST(MAX(n) AS DOUBLE) AS value
           |FROM (
           |  SELECT ((epoch_us(ts) + ${H6 - 1}) // $H6) * $H6 AS s6,
           |    CAST(user_id % 4 AS VARCHAR) AS svc, COUNT(*) AS n
           |  FROM events GROUP BY s6, svc)
           |GROUP BY bucket_us, svc ORDER BY bucket_us, svc""".stripMargin))
  }

  /** Instant evaluation of a full expression (sum of rates at one
    * off-grid time) — the /api/v1/query endpoint shape. The oracle
    * mirrors the shifted-window math literally.
    */
  val instantExprE2e: Q = {
    val tUs = 1705305600000000L // 2024-01-15T08:00Z — off the 1d grid
    val range = 86400000000L
    val delta = ((range - (tUs % range)) % range + range) % range
    val target = tUs + delta - range
    Q(
      "promql_e2e_instant_expr",
      (s: SparkSession, dir: String) =>
        PromQL.instantExpr("""sum by (svc) (count_over_time(ev[1d])) * 2""",
            pointsView(Testdata(s, dir)), evalTsUs = tUs)
          .select(col("ts_us"),
            element_at(col("labels"), "svc").as("svc"), col("value"))
          .orderBy("svc"),
      Some(
        s"""SELECT $tUs AS ts_us, svc, CAST(COUNT(*) AS DOUBLE) * 2 AS value
           |FROM (
           |  SELECT CAST(user_id % 4 AS VARCHAR) AS svc,
           |    epoch_us(ts) + ${delta - 1} AS ts_shift
           |  FROM events)
           |WHERE ts_shift >= $target AND ts_shift < ${target + range}
           |GROUP BY svc ORDER BY svc""".stripMargin))
  }

  /** Raw matrix selector at an instant: the samples of (t-5d, t]. */
  val matrixE2e: Q = {
    val tUs = 1705305600000000L
    val rangeUs = 5L * 86400000000L
    Q(
      "promql_e2e_matrix_raw",
      (s: SparkSession, dir: String) =>
        PromQL.matrix("""ev{svc="2"}[5d]""", pointsView(Testdata(s, dir)),
            evalTsUs = tUs)
          .select(col("ts_us"),
            element_at(col("labels"), "svc").as("svc"),
            element_at(col("labels"), "et").as("et"), col("value")),
      Some(
        s"""SELECT epoch_us(ts) AS ts_us, CAST(user_id % 4 AS VARCHAR) AS svc,
           |  event_type AS et, value
           |FROM events
           |WHERE user_id % 4 = 2
           |  AND epoch_us(ts) > ${tUs - rangeUs} AND epoch_us(ts) <= $tUs
           |ORDER BY ts_us, et""".stripMargin))
  }

  /** absent_over_time through the parser: a never-matching selector
    * yields value 1 on every grid bucket of the table extent.
    */
  val absentE2e: Q = Q(
    "promql_e2e_absent",
    (s: SparkSession, dir: String) =>
      PromQL.range("""absent_over_time(ev{svc="9"}[1d])""",
          pointsView(Testdata(s, dir)))
        .select(col("bucket_us"), col("value"))
        .orderBy("bucket_us"),
    Some(
      s"""SELECT DISTINCT epoch_us(ts) - epoch_us(ts) % $DayUs AS bucket_us,
         |  1.0 AS value
         |FROM events ORDER BY bucket_us""".stripMargin))

  /** `@` modifier: the pinned count_over_time(ev[1d] @ t) evaluates once
    * over (t-1d, t] and repeats at every grid step (upstream promql
    * @-modifier semantics; evaluable in the reference via the vendored
    * engine, SURVEY §2.3).
    */
  val atModifier: Q = {
    val tSec = 1705276800L // 2024-01-15T00:00:00Z
    val tUs = tSec * 1000000L
    Q(
      "promql_e2e_at_modifier",
      (s: SparkSession, dir: String) =>
        PromQL.range(s"""sum by (svc) (count_over_time(ev[1d] @ $tSec))""",
            pointsView(Testdata(s, dir)))
          .select(col("bucket_us"),
            element_at(col("labels"), "svc").as("svc"), col("value"))
          .orderBy("bucket_us", "svc"),
      Some(
        s"""WITH grid AS (
           |  SELECT DISTINCT epoch_us(ts) - epoch_us(ts) % $DayUs AS bucket_us
           |  FROM events),
           |pinned AS (
           |  SELECT CAST(user_id % 4 AS VARCHAR) AS svc,
           |    CAST(COUNT(*) AS DOUBLE) AS value
           |  FROM events
           |  WHERE epoch_us(ts) > $tUs - $DayUs AND epoch_us(ts) <= $tUs
           |  GROUP BY 1)
           |SELECT bucket_us, svc, value FROM grid, pinned
           |ORDER BY bucket_us, svc""".stripMargin))
  }

  override def queries: Seq[Q] =
    Seq(mathFns, labelFns, overtimeExt, stddevOverTime, subquery,
      instantExprE2e, matrixE2e, absentE2e, atModifier)
}
