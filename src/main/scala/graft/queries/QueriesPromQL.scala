package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sources.Testdata

/** PromQL storage-contract operators (SURVEY.md §2.3): instant vector
  * selection with lookback, the extrapolated rate family
  * (rate/delta/irate incl. counter-reset branch and the zero-crossing
  * clamp), histogram_quantile, series metadata, scalar⚬vector binops.
  *
  * The points view is events: series = event_type, sample = value,
  * timestamp = ts (epoch-ns Long). Counters are derived as running
  * decimal-exact cumulative sums so the Prometheus numeric fidelity is
  * testable bit-for-bit (reference formulae:
  * internal/logql/logqlmetric/prom_math.go:31-104; storage-side rate
  * offload internal/chstorage/querier_metrics_rate.go:27-141).
  *
  * All second-resolution arithmetic runs on epoch-µs Longs (exact in
  * double below 2^53) with the SAME expression shape on both engines.
  *
  * Scale notes: rate/delta aggregate per (series, step) after a single
  * shuffle on those keys with map-side partial aggregation (min/max/
  * arg_min/arg_max); the cumulative-counter window partitions by series
  * only — at 100 TB that is the per-series ingest order, which a real
  * deployment materializes at write time (ORDER BY (hash, timestamp)
  * in the reference DDL) rather than sorting at query time.
  */
object QueriesPromQL extends QueryPack {

  private def q(name: String, oracle: String)(f: Testdata => DataFrame): Q =
    Q(name, (s: SparkSession, dir: String) => f(Testdata(s, dir)), Some(oracle))

  private val DayNs = 86400000000000L
  private val DayUs = 86400000000L

  /** Instant vector selector at T with 1h lookback: the newest sample in
    * (T−1h, T] per series, Prometheus staleness model (reference
    * querier_metrics_scanners.go:204-390 selectPoint).
    */
  val instantVector: Q = {
    val tNs = 1705276800000000000L // 2024-01-15T00:00:00Z
    val lookbackNs = 3600000000000L
    q(
      "promql_instant_vector",
      s"""SELECT event_type, value, ts_us FROM (
         |  SELECT event_type, value, epoch_us(ts) AS ts_us,
         |    row_number() OVER (PARTITION BY event_type ORDER BY ts DESC, event_id DESC) AS rn
         |  FROM events
         |  WHERE epoch_ns(ts) <= $tNs AND epoch_ns(ts) > ${tNs - lookbackNs})
         |WHERE rn = 1 ORDER BY event_type""".stripMargin
    ) { td =>
      val w = Window.partitionBy(col("event_type"))
        .orderBy(col("ts").desc, col("event_id").desc)
      td.events
        .filter(col("ts") <= tNs && col("ts") > (tNs - lookbackNs))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("event_type"), col("value"), expr("ts div 1000").as("ts_us"))
        .orderBy("event_type")
    }
  }

  /** Shared per-(series, 1d-step) sample stats over the derived counter:
    * the counter is a running decimal-exact cumulative sum per series.
    */
  private def counterStats(td: Testdata): DataFrame = {
    val wCum = Window.partitionBy(col("event_type"))
      .orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    td.events
      .withColumn("c", sum(col("value").cast("decimal(18,4)")).over(wCum).cast("double"))
      .withColumn("ts_us", expr("ts div 1000"))
      .withColumn("bucket_us", expr(s"ts_us - ts_us % $DayUs"))
      .groupBy(col("event_type"), col("bucket_us"))
      .agg(
        count(lit(1)).as("n"),
        min(col("ts_us")).as("first_ts_us"),
        max(col("ts_us")).as("last_ts_us"),
        min_by(col("c"), col("ts_us")).as("first_v"),
        max_by(col("c"), col("ts_us")).as("last_v"))
  }

  private val oracleCounterStats =
    s"""SELECT event_type, bucket_us, COUNT(*) AS n,
       |  MIN(ts_us) AS first_ts_us, MAX(ts_us) AS last_ts_us,
       |  ARG_MIN(c, ts_us) AS first_v, ARG_MAX(c, ts_us) AS last_v
       |FROM (
       |  SELECT event_type, epoch_us(ts) AS ts_us,
       |    epoch_us(ts) - epoch_us(ts) % $DayUs AS bucket_us,
       |    CAST(SUM(CAST(value AS DECIMAL(18,4))) OVER (
       |      PARTITION BY event_type ORDER BY ts, event_id
       |      ROWS UNBOUNDED PRECEDING) AS DOUBLE) AS c
       |  FROM events)
       |GROUP BY event_type, bucket_us""".stripMargin

  /** Prometheus extrapolation factor — IDENTICAL expression shape on
    * both engines (prom_math.go:31-104 extrapolatedRate).
    */
  private def extrapolation(
      firstTsUs: Column, lastTsUs: Column, bucketUs: Column,
      n: Column, resultValue: Column, firstV: Column,
      counterZeroClamp: Boolean): Column =
    PromMath.extrapolation(firstTsUs, lastTsUs, bucketUs, n, resultValue, firstV,
      counterZeroClamp)

  private def oracleExtrapolation(counterZeroClamp: Boolean): String =
    PromMath.oracleExtrapolation(counterZeroClamp, "(last_v - first_v)")

  /** `rate(counter[1d])` with full Prometheus extrapolation + the
    * zero-crossing clamp on durationToStart (reference
    * prom_math.go:31-104; SQL offload querier_metrics_rate.go:27-141).
    */
  val rateExtrapolated: Q = q(
    "promql_rate_extrapolated",
    s"""SELECT event_type, bucket_us,
       |  (last_v - first_v) * ${oracleExtrapolation(counterZeroClamp = true)} / 86400.0 AS rate
       |FROM ($oracleCounterStats)
       |WHERE n >= 2 ORDER BY event_type, bucket_us""".stripMargin
  ) { td =>
    val st = counterStats(td).filter(col("n") >= 2)
    val resultValue = col("last_v") - col("first_v")
    val factor = extrapolation(col("first_ts_us"), col("last_ts_us"), col("bucket_us"),
      col("n"), resultValue, col("first_v"), counterZeroClamp = true)
    st.select(col("event_type"), col("bucket_us"),
        (resultValue * factor / 86400.0).as("rate"))
      .orderBy("event_type", "bucket_us")
  }

  /** `increase(counter[1d])` — rate × range (same extrapolation). */
  val increase: Q = q(
    "promql_increase",
    s"""SELECT event_type, bucket_us,
       |  (last_v - first_v) * ${oracleExtrapolation(counterZeroClamp = true)} AS increase
       |FROM ($oracleCounterStats)
       |WHERE n >= 2 ORDER BY event_type, bucket_us""".stripMargin
  ) { td =>
    val st = counterStats(td).filter(col("n") >= 2)
    val resultValue = col("last_v") - col("first_v")
    val factor = extrapolation(col("first_ts_us"), col("last_ts_us"), col("bucket_us"),
      col("n"), resultValue, col("first_v"), counterZeroClamp = true)
    st.select(col("event_type"), col("bucket_us"),
        (resultValue * factor).as("increase"))
      .orderBy("event_type", "bucket_us")
  }

  /** `delta(gauge[1d])` — gauge semantics: extrapolated last−first over
    * the RAW values, no counter correction, no zero clamp
    * (prom_math.go delta path).
    */
  val deltaGauge: Q = {
    val oracleGaugeStats =
      s"""SELECT event_type, bucket_us, COUNT(*) AS n,
         |  MIN(ts_us) AS first_ts_us, MAX(ts_us) AS last_ts_us,
         |  ARG_MIN(value, ts_us) AS first_v, ARG_MAX(value, ts_us) AS last_v
         |FROM (SELECT event_type, value, epoch_us(ts) AS ts_us,
         |        epoch_us(ts) - epoch_us(ts) % $DayUs AS bucket_us FROM events)
         |GROUP BY event_type, bucket_us""".stripMargin
    q(
      "promql_delta_gauge",
      s"""SELECT event_type, bucket_us,
         |  (last_v - first_v) * ${oracleExtrapolation(counterZeroClamp = false)} AS delta
         |FROM ($oracleGaugeStats)
         |WHERE n >= 2 ORDER BY event_type, bucket_us""".stripMargin
    ) { td =>
      val st = td.events
        .withColumn("ts_us", expr("ts div 1000"))
        .withColumn("bucket_us", expr(s"ts_us - ts_us % $DayUs"))
        .groupBy(col("event_type"), col("bucket_us"))
        .agg(
          count(lit(1)).as("n"),
          min(col("ts_us")).as("first_ts_us"),
          max(col("ts_us")).as("last_ts_us"),
          min_by(col("value"), col("ts_us")).as("first_v"),
          max_by(col("value"), col("ts_us")).as("last_v"))
        .filter(col("n") >= 2)
      val resultValue = col("last_v") - col("first_v")
      val factor = extrapolation(col("first_ts_us"), col("last_ts_us"), col("bucket_us"),
        col("n"), resultValue, col("first_v"), counterZeroClamp = false)
      st.select(col("event_type"), col("bucket_us"),
          (resultValue * factor).as("delta"))
        .orderBy("event_type", "bucket_us")
    }
  }

  /** `irate(v[..])` — instantaneous rate from the last two samples per
    * series, with the counter-reset branch (curr < prev → curr/dt)
    * (reference querier_metrics_rate.go irate/idelta SQL offload).
    */
  val irate: Q = q(
    "promql_irate",
    """SELECT event_type,
      |  CASE WHEN last_v < prev_v THEN last_v / dt ELSE (last_v - prev_v) / dt END AS irate
      |FROM (
      |  SELECT event_type,
      |    MAX(CASE WHEN rn = 1 THEN value END) AS last_v,
      |    MAX(CASE WHEN rn = 2 THEN value END) AS prev_v,
      |    CAST(MAX(CASE WHEN rn = 1 THEN ts_us END)
      |       - MAX(CASE WHEN rn = 2 THEN ts_us END) AS DOUBLE) / 1e6 AS dt
      |  FROM (
      |    SELECT event_type, value, epoch_us(ts) AS ts_us,
      |      row_number() OVER (PARTITION BY event_type ORDER BY ts DESC, event_id DESC) AS rn
      |    FROM events)
      |  WHERE rn <= 2 GROUP BY event_type)
      |ORDER BY event_type""".stripMargin
  ) { td =>
    val w = Window.partitionBy(col("event_type"))
      .orderBy(col("ts").desc, col("event_id").desc)
    val two = td.events
      .withColumn("ts_us", expr("ts div 1000"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 2)
      .groupBy(col("event_type"))
      .agg(
        max(when(col("rn") === 1, col("value"))).as("last_v"),
        max(when(col("rn") === 2, col("value"))).as("prev_v"),
        ((max(when(col("rn") === 1, col("ts_us")))
          - max(when(col("rn") === 2, col("ts_us")))).cast("double") / 1e6).as("dt"))
    two.select(col("event_type"),
        when(col("last_v") < col("prev_v"), col("last_v") / col("dt"))
          .otherwise((col("last_v") - col("prev_v")) / col("dt")).as("irate"))
      .orderBy("event_type")
  }

  /** `histogram_quantile(0.9, ...)` over fixed le buckets
    * {50,100,200,300,+Inf}: Prometheus in-bucket linear interpolation,
    * +Inf falls back to the highest finite upper bound (reference
    * querier_metrics_hist.go:17-270 + upstream bucketQuantile).
    */
  val histogramQuantile: Q = q(
    "promql_histogram_quantile",
    """SELECT event_type,
      |  ROUND(CASE
      |    WHEN rank <= n1 THEN 0 + 50.0 * (rank / n1)
      |    WHEN rank <= n2 THEN 50 + 50.0 * ((rank - n1) / (n2 - n1))
      |    WHEN rank <= n3 THEN 100 + 100.0 * ((rank - n2) / (n3 - n2))
      |    WHEN rank <= n4 THEN 200 + 100.0 * ((rank - n3) / (n4 - n3))
      |    ELSE 300.0 END, 6) AS q90
      |FROM (
      |  SELECT event_type,
      |    0.9 * COUNT(*) AS rank,
      |    CAST(COUNT(*) FILTER (WHERE value <= 50) AS DOUBLE) AS n1,
      |    CAST(COUNT(*) FILTER (WHERE value <= 100) AS DOUBLE) AS n2,
      |    CAST(COUNT(*) FILTER (WHERE value <= 200) AS DOUBLE) AS n3,
      |    CAST(COUNT(*) FILTER (WHERE value <= 300) AS DOUBLE) AS n4
      |  FROM events GROUP BY event_type)
      |ORDER BY event_type""".stripMargin
  ) { td =>
    val st = td.events
      .groupBy(col("event_type"))
      .agg(
        (count(lit(1)) * 0.9).as("rank"),
        count(when(col("value") <= 50, 1)).cast("double").as("n1"),
        count(when(col("value") <= 100, 1)).cast("double").as("n2"),
        count(when(col("value") <= 200, 1)).cast("double").as("n3"),
        count(when(col("value") <= 300, 1)).cast("double").as("n4"))
    st.select(col("event_type"),
        when(col("rank") <= col("n1"), col("rank") / col("n1") * 50.0 + 0)
          .when(col("rank") <= col("n2"),
            lit(50) + (col("rank") - col("n1")) / (col("n2") - col("n1")) * 50.0)
          .when(col("rank") <= col("n3"),
            lit(100) + (col("rank") - col("n2")) / (col("n3") - col("n2")) * 100.0)
          .when(col("rank") <= col("n4"),
            lit(200) + (col("rank") - col("n3")) / (col("n4") - col("n3")) * 100.0)
          .otherwise(300.0).as("q90_raw"))
      .select(col("event_type"), round(col("q90_raw"), 6).as("q90"))
      .orderBy("event_type")
  }

  /** Series metadata: per-series identity rollup — the
    * metrics_timeseries AggregatingMergeTree analogue (reference
    * querier_metrics_labels.go:24-296, columns_metrics.go:66-70).
    */
  val seriesMetadata: Q = q(
    "promql_series_metadata",
    """SELECT event_type AS series, user_id % 4 AS svc,
      |  MIN(epoch_us(ts)) AS first_seen_us, MAX(epoch_us(ts)) AS last_seen_us,
      |  COUNT(*) AS n_points
      |FROM events GROUP BY series, svc ORDER BY series, svc""".stripMargin
  ) { td =>
    td.events
      .groupBy(col("event_type").as("series"), (col("user_id") % 4).as("svc"))
      .agg(
        min(expr("ts div 1000")).as("first_seen_us"),
        max(expr("ts div 1000")).as("last_seen_us"),
        count(lit(1)).as("n_points"))
      .orderBy("series", "svc")
  }

  /** scalar⚬vector binop with comparison filter: `v * 2 > 150` keeps
    * matching samples; `bool` modifier yields 0/1 (reference
    * logqlmetric/bin_op.go:194-254 scalar path — same for PromQL).
    */
  val scalarBinop: Q = q(
    "promql_scalar_binop",
    s"""SELECT bucket_ns, event_type, n * 2 AS doubled,
       |  CASE WHEN n > 100 THEN 1 ELSE 0 END AS gt100_bool
       |FROM (
       |  SELECT epoch_ns(ts) - epoch_ns(ts) % $DayNs AS bucket_ns, event_type, COUNT(*) AS n
       |  FROM events GROUP BY 1, 2)
       |WHERE n * 2 > 150
       |ORDER BY bucket_ns, event_type""".stripMargin
  ) { td =>
    td.events
      .withColumn("bucket_ns", col("ts") - col("ts") % DayNs)
      .groupBy(col("bucket_ns"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .filter(col("n") * 2 > 150)
      .select(col("bucket_ns"), col("event_type"), (col("n") * 2).as("doubled"),
        when(col("n") > 100, 1).otherwise(0).as("gt100_bool"))
      .orderBy("bucket_ns", "event_type")
  }

  override def queries: Seq[Q] = Seq(
    instantVector, rateExtrapolated, increase, deltaGauge, irate,
    histogramQuantile, seriesMetadata, scalarBinop
  )
}
