package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Testdata

/** PromQL surface, part 2 (SURVEY.md §2.3): vector aggregation over
  * rate results (sum by), many-to-one vector matching (group_left),
  * exemplar queries, exponential-histogram bucket merge, plus the
  * ProfileQL selector + flame-tree merge (SURVEY.md §2.5).
  */
object QueriesPromQLMore extends QueryPack {

  private def q(name: String, oracle: String)(f: Testdata => DataFrame): Q =
    Q(name, (s: SparkSession, dir: String) => f(Testdata(s, dir)), Some(oracle))

  private val DayNs = 86400000000000L

  /** `sum by (svc) (rate(events[1d]))` — vector aggregation over a
    * rate-family inner result: two-level aggregation, the inner one per
    * full series, the outer one dropping labels (reference
    * promhandler + logqlmetric/vector_agg.go same machinery).
    */
  val sumByRate: Q = q(
    "promql_sum_by_rate",
    s"""SELECT bucket_ns, svc, CAST(SUM(n) AS BIGINT) * 1.0 / 86400.0 AS rate
       |FROM (
       |  SELECT epoch_ns(ts) - epoch_ns(ts) % $DayNs AS bucket_ns,
       |    user_id % 4 AS svc, event_type, COUNT(*) AS n
       |  FROM events GROUP BY 1, 2, 3)
       |GROUP BY bucket_ns, svc ORDER BY bucket_ns, svc""".stripMargin
  ) { td =>
    td.events
      .withColumn("bucket_ns", col("ts") - col("ts") % DayNs)
      .withColumn("svc", col("user_id") % 4)
      .groupBy(col("bucket_ns"), col("svc"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .groupBy(col("bucket_ns"), col("svc"))
      .agg((sum(col("n")) * 1.0 / 86400.0).as("rate"))
      .orderBy("bucket_ns", "svc")
  }

  /** Many-to-one matching `v / on(event_type) group_left info` — each
    * (step, series) row joins the single per-type info series
    * (reference bin_op.go group_left/right modifiers;
    * metric_expr.go:238-253).
    */
  val groupLeft: Q = q(
    "promql_group_left",
    s"""SELECT a.bucket_ns, a.event_type, CAST(a.n AS DOUBLE) / b.total AS share
       |FROM (
       |  SELECT epoch_ns(ts) - epoch_ns(ts) % $DayNs AS bucket_ns, event_type, COUNT(*) AS n
       |  FROM events GROUP BY 1, 2) a
       |JOIN (SELECT event_type, COUNT(*) AS total FROM events GROUP BY 1) b
       |  USING (event_type)
       |ORDER BY a.bucket_ns, a.event_type""".stripMargin
  ) { td =>
    val a = td.events
      .withColumn("bucket_ns", col("ts") - col("ts") % DayNs)
      .groupBy(col("bucket_ns"), col("event_type"))
      .agg(count(lit(1)).as("n"))
    val b = td.events.groupBy(col("event_type")).agg(count(lit(1)).as("total"))
    a.join(broadcast(b), Seq("event_type"))
      .select(col("bucket_ns"), col("event_type"),
        (col("n").cast("double") / col("total")).as("share"))
      .orderBy("bucket_ns", "event_type")
  }

  /** Exemplars query: per-series exemplar rows in a time/value range
    * (reference querier_metrics_exemplars.go; promhandler.go:392-460).
    */
  val exemplars: Q = q(
    "promql_exemplars",
    """SELECT event_type, epoch_us(ts) AS ts_us, event_id AS exemplar_id, value
      |FROM events
      |WHERE event_type = 'error' AND value > 300
      |ORDER BY ts_us, exemplar_id LIMIT 50""".stripMargin
  ) { td =>
    td.events
      .filter(col("event_type") === "error" && col("value") > 300)
      .select(col("event_type"), expr("ts div 1000").as("ts_us"),
        col("event_id").as("exemplar_id"), col("value"))
      .orderBy("ts_us", "exemplar_id")
      .limit(50)
  }

  /** Exponential-histogram bucket decomposition + merge: values map to
    * power-of-two buckets (scale 0), per-series bucket counts merge
    * across the range — integer-exact bucket index via bit length, no
    * float log (reference querier_metrics_hist.go:88-167
    * convertBucketsLayout).
    */
  val expHistogramMerge: Q = q(
    "promql_exp_histogram_merge",
    """SELECT event_type, length(bin(CAST(FLOOR(value) AS BIGINT))) - 1 AS bucket_idx,
      |  COUNT(*) AS n
      |FROM events WHERE value >= 1
      |GROUP BY event_type, bucket_idx ORDER BY event_type, bucket_idx""".stripMargin
  ) { td =>
    td.events
      .filter(col("value") >= 1)
      .select(col("event_type"),
        (length(bin(floor(col("value")).cast("long"))) - 1).as("bucket_idx"))
      .groupBy(col("event_type"), col("bucket_idx"))
      .agg(count(lit(1)).as("n"))
      .orderBy("event_type", "bucket_idx")
  }

  /** ProfileQL selector `name{svc="1"}` — fetch matching profile series
    * and total their sample values (reference
    * internal/profileql/parser.go:10-230, profiles fetch
    * storagebackend/profiles.go:99-182).
    */
  val profileSelector: Q = q(
    "profileql_selector",
    s"""SELECT event_type AS name, user_id % 4 AS svc, COUNT(*) AS n_samples,
       |  ${Det.oSum("value")} AS total
       |FROM events WHERE event_type IN ('click', 'view') AND user_id % 4 = 1
       |GROUP BY name, svc ORDER BY name, svc""".stripMargin
  ) { td =>
    td.events
      .filter(col("event_type").isin("click", "view") && col("user_id") % 4 === 1)
      .groupBy(col("event_type").as("name"), (col("user_id") % 4).as("svc"))
      .agg(count(lit(1)).as("n_samples"), Det.dsum(col("value")).as("total"))
      .orderBy("name", "svc")
  }

  /** Flame-tree merge: stacks (3 levels from lineitem) fold into
    * per-prefix totals — the levels array Pyroscope renders (reference
    * internal/profilestorage/flametree.go + profilehandler.go:164-223).
    * The depth levels explode in-row from ONE scan (r19; the oracle's
    * UNION ALL shape reads the table three times), then one partial-agg
    * groupBy folds all levels at once.
    */
  val flameTree: Q = q(
    "profileql_flame_tree",
    s"""SELECT depth, path, CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS total, COUNT(*) AS n
       |FROM (
       |  SELECT 1 AS depth, l_returnflag AS path, l_quantity FROM lineitem
       |  UNION ALL
       |  SELECT 2, l_returnflag || ';' || l_linestatus, l_quantity FROM lineitem
       |  UNION ALL
       |  SELECT 3, l_returnflag || ';' || l_linestatus || ';p' || CAST(l_partkey % 5 AS VARCHAR), l_quantity
       |  FROM lineitem)
       |GROUP BY depth, path ORDER BY depth, path""".stripMargin
  ) { td =>
    // ONE scan: the three prefix levels explode in-row from the same
    // input row (identical (depth, path, quantity) rows reach the
    // aggregation as the previous 3-scan unionAll shape, and the
    // decimal sum is exact so regrouping order cannot move a value) —
    // the union form scanned lineitem three times for three
    // projections of the same 4 columns (r19: compute 0.27 → 0.10
    // isolated, plan 3 scans → 1, same exchange count)
    td.lineitem.select(col("l_quantity"), explode(array(
        struct(lit(1).as("depth"), col("l_returnflag").as("path")),
        struct(lit(2).as("depth"),
          concat_ws(";", col("l_returnflag"), col("l_linestatus")).as("path")),
        struct(lit(3).as("depth"),
          concat(col("l_returnflag"), lit(";"), col("l_linestatus"), lit(";p"),
            (col("l_partkey") % 5).cast("string")).as("path")))).as("dp"))
      .groupBy(col("dp.depth").as("depth"), col("dp.path").as("path"))
      .agg(Det.dsum(col("l_quantity")).as("total"), count(lit(1)).as("n"))
      .orderBy("depth", "path")
  }

  /** Flame-graph DIFF: baseline vs comparison window totals per stack
    * path, full-outer joined — the Pyroscope diff view (reference
    * profilehandler diff rendering). Decimal-exact totals, single
    * subtraction, co-partitioned on path.
    */
  val flameDiff: Q = q(
    "profileql_flame_diff",
    """SELECT COALESCE(a.path, b.path) AS path,
      |  CAST(COALESCE(a.t, 0) AS DOUBLE) AS base_total,
      |  CAST(COALESCE(b.t, 0) AS DOUBLE) AS comp_total,
      |  CAST(COALESCE(b.t, 0) - COALESCE(a.t, 0) AS DOUBLE) AS delta
      |FROM (
      |  SELECT l_returnflag || ';p' || CAST(l_partkey % 5 AS VARCHAR) AS path,
      |    SUM(CAST(l_quantity AS DECIMAL(18,4))) AS t
      |  FROM lineitem WHERE l_linestatus = 'F' GROUP BY 1) a
      |FULL OUTER JOIN (
      |  SELECT l_returnflag || ';p' || CAST(l_partkey % 5 AS VARCHAR) AS path,
      |    SUM(CAST(l_quantity AS DECIMAL(18,4))) AS t
      |  FROM lineitem WHERE l_linestatus = 'O' GROUP BY 1) b
      |ON a.path = b.path
      |ORDER BY path""".stripMargin
  ) { td =>
    def side(status: String) = td.lineitem
      .filter(col("l_linestatus") === status)
      .groupBy(concat(col("l_returnflag"), lit(";p"),
        (col("l_partkey") % 5).cast("string")).as("path"))
      .agg(sum(col("l_quantity").cast(Det.DecT)).as("t"))
    val zero = lit(0).cast(Det.DecT)
    side("F").alias("a").join(side("O").alias("b"),
        col("a.path") === col("b.path"), "full_outer")
      .select(
        coalesce(col("a.path"), col("b.path")).as("path"),
        coalesce(col("a.t"), zero).cast("double").as("base_total"),
        coalesce(col("b.t"), zero).cast("double").as("comp_total"),
        (coalesce(col("b.t"), zero) - coalesce(col("a.t"), zero))
          .cast("double").as("delta"))
      .orderBy("path")
  }

  /** ALERT-RULE STATE MACHINE — the reference serves `/api/v1/rules`
    * as NotImplemented (promhandler.go:494-497); evaluating a rule is
    * parity-plus. Prometheus semantics: a series is `pending` while
    * its condition holds but for less than the `for` duration, and
    * `firing` once the condition has held continuously for `for`
    * (3 consecutive 6 h evaluations here); a step with no samples
    * evaluates the condition FALSE, so the grid must be dense.
    * Spark-first: densify via explode(sequence) × broadcast series,
    * then ONE pass of frame-bounded window functions computes the run
    * state — no per-step rescan, no driver loop.
    */
  val alertFiring: Q = {
    val StepNs = 21600000000000L // 6h
    q(
      "promql_alert_firing",
      s"""WITH counts AS (
         |  SELECT event_type, epoch_ns(ts) - epoch_ns(ts) % $StepNs AS b,
         |    COUNT(*) AS n
         |  FROM events GROUP BY 1, 2),
         |grid AS (
         |  SELECT unnest(generate_series(lo, hi, $StepNs)) AS b
         |  FROM (SELECT min(b) AS lo, max(b) AS hi FROM counts)),
         |series AS (SELECT DISTINCT event_type FROM counts),
         |dense AS (
         |  SELECT s.event_type, g.b, coalesce(c.n, 0) AS n
         |  FROM series s CROSS JOIN grid g
         |  LEFT JOIN counts c ON c.event_type = s.event_type AND c.b = g.b),
         |st AS (
         |  SELECT event_type, b, n,
         |    CASE WHEN n > 18 THEN 1 ELSE 0 END AS active,
         |    SUM(CASE WHEN n > 18 THEN 1 ELSE 0 END) OVER
         |      (PARTITION BY event_type ORDER BY b
         |       ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS act3,
         |    COUNT(*) OVER
         |      (PARTITION BY event_type ORDER BY b
         |       ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS w
         |  FROM dense)
         |SELECT event_type, b AS bucket_ns, CAST(n AS BIGINT) AS n,
         |  CASE WHEN active = 1 AND act3 = 3 AND w = 3 THEN 'firing'
         |       WHEN active = 1 THEN 'pending' ELSE 'inactive' END AS state
         |FROM st ORDER BY event_type, bucket_ns""".stripMargin
    ) { td =>
      import org.apache.spark.sql.expressions.Window
      val counts = td.events
        .withColumn("b", col("ts") - col("ts") % StepNs)
        .groupBy(col("event_type"), col("b"))
        .agg(count(lit(1)).as("n"))
      val grid = counts.agg(min(col("b")).as("lo"), max(col("b")).as("hi"))
        .select(explode(sequence(col("lo"), col("hi"), lit(StepNs))).as("b"))
      val series = counts.select(col("event_type")).distinct()
      val dense = grid.crossJoin(broadcast(series))
        .join(counts, Seq("event_type", "b"), "left")
        .withColumn("n", coalesce(col("n"), lit(0L)))
      val w = Window.partitionBy(col("event_type")).orderBy(col("b"))
        .rowsBetween(-2, Window.currentRow)
      val active = when(col("n") > 18, 1).otherwise(0)
      dense
        .withColumn("active", active)
        .withColumn("act3", sum(col("active")).over(w))
        .withColumn("w", count(lit(1)).over(w))
        .select(col("event_type"), col("b").as("bucket_ns"), col("n"),
          when(col("active") === 1 && col("act3") === 3 && col("w") === 3,
            "firing")
            .when(col("active") === 1, "pending")
            .otherwise("inactive").as("state"))
        .orderBy("event_type", "bucket_ns")
    }
  }

  /** NATIVE-HISTOGRAM `histogram_quantile` through the real PromQL
    * front-end: events fold into scale-0 exponential-histogram SAMPLES
    * (one per day × event_type, mapping-11 bucket rows with integer
    * bucket_idx via bit length), and
    * `histogram_quantile(0.9, sum_over_time(nh[1d]))` evaluates
    * through [[graft.promql.PromQL.range]] — the expansion to
    * cumulative `le` series happens inside the front-end
    * ([[graft.promql.PromQL.expandNativeHistograms]]), mirroring the
    * reference's query-time conversion
    * (querier_metrics_hist.go:17-270). The oracle recomputes the
    * full bucket→quantile math: per-day cumulative counts over sparse
    * bucket indexes, rank 0.9·total, previous-PRESENT-bucket lower
    * bound, linear interpolation.
    */
  val nativeHistQuantile: Q = q(
    "promql_native_hist_quantile",
    """WITH b AS (
      |  SELECT epoch_us(ts) - epoch_us(ts) % 86400000000 AS bucket_us,
      |    event_type AS type,
      |    length(bin(CAST(FLOOR(value) AS BIGINT))) - 1 AS idx,
      |    CAST(COUNT(*) AS DOUBLE) AS n
      |  FROM events WHERE value >= 1
      |  GROUP BY 1, 2, 3),
      |c AS (
      |  SELECT bucket_us, type, idx, n,
      |    SUM(n) OVER (PARTITION BY bucket_us, type ORDER BY idx) AS cum,
      |    SUM(n) OVER (PARTITION BY bucket_us, type) AS total
      |  FROM b),
      |t AS (
      |  SELECT bucket_us, type, power(2.0, idx + 1) AS le, cum, total,
      |    lag(power(2.0, idx + 1)) OVER (PARTITION BY bucket_us, type ORDER BY idx) AS prev_le,
      |    lag(cum) OVER (PARTITION BY bucket_us, type ORDER BY idx) AS prev_cum
      |  FROM c)
      |SELECT bucket_us, type,
      |  round(COALESCE(prev_le, 0.0)
      |    + (le - COALESCE(prev_le, 0.0))
      |      * (0.9 * total - COALESCE(prev_cum, 0.0))
      |      / (cum - COALESCE(prev_cum, 0.0)), 6) AS value
      |FROM t
      |WHERE cum >= 0.9 * total
      |  AND (prev_cum IS NULL OR prev_cum < 0.9 * total)
      |ORDER BY bucket_us, type""".stripMargin
  ) { td =>
    graft.promql.PromQL
      .range("histogram_quantile(0.9, sum_over_time(nh[1d]))", nhDayPoints(td))
      .select(col("bucket_us"), element_at(col("labels"), "type").as("type"),
        round(col("value"), 6).as("value"))
      .orderBy("bucket_us", "type")
  }

  /** Shared native-histogram fixture: one scale-0 exp-histogram SAMPLE
    * per (day, event_type) — mapping-11 bucket rows with integer
    * bucket_idx via bit length, plus the histogram's SUM field as a
    * mapping-12 row (decimal-exact accumulation of the observed
    * values, cast to double once — Det playbook), timestamped at the
    * day start.
    *
    * Ingest-materialized ([[Fixtures.materialized]]): the flattening is
    * the exp-histogram INSERTER's work (the stored
    * metrics_exp_histograms table), so it runs once and the seven
    * native-histogram queries read the stored rows — the deployment
    * split, and ~20 fewer stages per bench pass.
    */
  private def nhDayPoints(td: Testdata): DataFrame =
    Fixtures.materialized(td.spark, td.dir, "nh_day", "ts_us") {
      nhDayPointsBuild(td)
    }

  private def nhDayPointsBuild(td: Testdata): DataFrame = {
    val DayUs = 86400000000L
    val obs = td.events
      .filter(col("value") >= 1)
      .select(expr("(ts div 1000)").as("ts_us0"), col("event_type"),
        col("value").as("obs"),
        (length(bin(floor(col("value")).cast("long"))) - 1).as("bucket_idx"))
      .withColumn("ts_us", col("ts_us0") - col("ts_us0") % DayUs)
    val buckets = obs
      .groupBy(col("ts_us"), col("event_type"), col("bucket_idx"))
      .agg(count(lit(1)).cast("double").as("value"))
      .select(col("ts_us"), lit("nh").as("name"),
        map(lit("type"), col("event_type")).as("labels"), col("value"),
        lit(11).as("mapping"), col("bucket_idx").cast("int").as("bucket_idx"),
        lit(0).as("scale"))
    val sums = obs
      .groupBy(col("ts_us"), col("event_type"))
      .agg(sum(col("obs").cast("decimal(38,9)")).cast("double").as("value"))
      .select(col("ts_us"), lit("nh").as("name"),
        map(lit("type"), col("event_type")).as("labels"), col("value"),
        lit(12).as("mapping"), lit(null).cast("int").as("bucket_idx"),
        lit(0).as("scale"))
    buckets.unionByName(sums)
  }

  /** `histogram_count` over native-histogram series — the observation
    * count is the +Inf cumulative of the expanded le series; the
    * oracle is simply the per-(day, type) event count, which is the
    * strongest possible cross-check of the whole expansion+count path.
    */
  val nativeHistCount: Q = q(
    "promql_native_hist_count",
    """SELECT epoch_us(ts) - epoch_us(ts) % 86400000000 AS bucket_us,
      |  event_type AS type, CAST(COUNT(*) AS DOUBLE) AS value
      |FROM events WHERE value >= 1
      |GROUP BY 1, 2 ORDER BY bucket_us, type""".stripMargin
  ) { td =>
    graft.promql.PromQL
      .range("histogram_count(sum_over_time(nh[1d]))", nhDayPoints(td))
      .select(col("bucket_us"), element_at(col("labels"), "type").as("type"),
        col("value"))
      .orderBy("bucket_us", "type")
  }

  /** `histogram_fraction(3, 100, …)` over native-histogram series:
    * linearly interpolated cumulative at both bounds (3 and 100 sit
    * INSIDE buckets — the interpolation path is exercised, not just
    * exact boundaries), fraction of the total. Oracle replays F(x) as
    * a per-row candidate max over the cumulative bucket rows.
    */
  val nativeHistFraction: Q = q(
    "promql_native_hist_fraction",
    """WITH b AS (
      |  SELECT epoch_us(ts) - epoch_us(ts) % 86400000000 AS bucket_us,
      |    event_type AS type,
      |    length(bin(CAST(FLOOR(value) AS BIGINT))) - 1 AS idx,
      |    CAST(COUNT(*) AS DOUBLE) AS n
      |  FROM events WHERE value >= 1
      |  GROUP BY 1, 2, 3),
      |c AS (
      |  SELECT bucket_us, type, idx, n,
      |    SUM(n) OVER (PARTITION BY bucket_us, type ORDER BY idx) AS cum,
      |    SUM(n) OVER (PARTITION BY bucket_us, type) AS total
      |  FROM b),
      |t AS (
      |  SELECT bucket_us, type, cum, total, power(2.0, idx + 1) AS le,
      |    COALESCE(LAG(power(2.0, idx + 1)) OVER (
      |      PARTITION BY bucket_us, type ORDER BY idx), 0.0) AS lower,
      |    COALESCE(LAG(cum) OVER (
      |      PARTITION BY bucket_us, type ORDER BY idx), 0.0) AS prev_c
      |  FROM c),
      |f AS (
      |  SELECT bucket_us, type,
      |    MAX(CASE WHEN 100.0 >= le THEN cum
      |      WHEN 100.0 > lower THEN prev_c + (cum - prev_c) * (100.0 - lower) / (le - lower)
      |      ELSE 0.0 END) AS fhi,
      |    MAX(CASE WHEN 3.0 >= le THEN cum
      |      WHEN 3.0 > lower THEN prev_c + (cum - prev_c) * (3.0 - lower) / (le - lower)
      |      ELSE 0.0 END) AS flo,
      |    MAX(total) AS total
      |  FROM t GROUP BY 1, 2)
      |SELECT bucket_us, type, round((fhi - flo) / total, 6) AS value
      |FROM f ORDER BY bucket_us, type""".stripMargin
  ) { td =>
    graft.promql.PromQL
      .range("histogram_fraction(3, 100, sum_over_time(nh[1d]))",
        nhDayPoints(td))
      .select(col("bucket_us"), element_at(col("labels"), "type").as("type"),
        round(col("value"), 6).as("value"))
      .orderBy("bucket_us", "type")
  }

  /** `histogram_sum` — the native histogram's sum field, surfaced
    * through expansion (mapping-12 row → `__nh__ = sum` series) and the
    * range aggregation. Oracle = the decimal-exact sum of the raw
    * observed values per (day, type): the whole sum-field path is
    * cross-checked against first principles.
    */
  val nativeHistSum: Q = q(
    "promql_native_hist_sum",
    """SELECT epoch_us(ts) - epoch_us(ts) % 86400000000 AS bucket_us,
      |  event_type AS type,
      |  round(CAST(SUM(CAST(value AS DECIMAL(38,9))) AS DOUBLE), 6) AS value
      |FROM events WHERE value >= 1
      |GROUP BY 1, 2 ORDER BY bucket_us, type""".stripMargin
  ) { td =>
    graft.promql.PromQL
      .range("histogram_sum(sum_over_time(nh[1d]))", nhDayPoints(td))
      .select(col("bucket_us"), element_at(col("labels"), "type").as("type"),
        round(col("value"), 6).as("value"))
      .orderBy("bucket_us", "type")
  }

  /** `histogram_avg` = sum field / observation count — one grouped max
    * over the bucket rows joined with the sum series; a single IEEE
    * division per group keeps both engines bit-identical.
    */
  val nativeHistAvg: Q = q(
    "promql_native_hist_avg",
    """SELECT epoch_us(ts) - epoch_us(ts) % 86400000000 AS bucket_us,
      |  event_type AS type,
      |  round(CAST(SUM(CAST(value AS DECIMAL(38,9))) AS DOUBLE)
      |    / COUNT(*), 6) AS value
      |FROM events WHERE value >= 1
      |GROUP BY 1, 2 ORDER BY bucket_us, type""".stripMargin
  ) { td =>
    graft.promql.PromQL
      .range("histogram_avg(sum_over_time(nh[1d]))", nhDayPoints(td))
      .select(col("bucket_us"), element_at(col("labels"), "type").as("type"),
        round(col("value"), 6).as("value"))
      .orderBy("bucket_us", "type")
  }

  /** `histogram_stddev` — Prometheus's funcHistogramStdDev bucket
    * formula on the decomposed layout: observations of each bucket sit
    * at the geometric mean √(lower·upper) of its bounds (0 when the
    * bucket spans 0), mean = sum/count, variance accumulated in
    * decimal so the bucket order cannot perturb the double sum. The
    * oracle replays the identical formula per (day, type).
    */
  val nativeHistStddev: Q = q(
    "promql_native_hist_stddev",
    """WITH b AS (
      |  SELECT epoch_us(ts) - epoch_us(ts) % 86400000000 AS bucket_us,
      |    event_type AS type,
      |    length(bin(CAST(FLOOR(value) AS BIGINT))) - 1 AS idx,
      |    CAST(COUNT(*) AS DOUBLE) AS n
      |  FROM events WHERE value >= 1 GROUP BY 1, 2, 3),
      |s AS (
      |  SELECT epoch_us(ts) - epoch_us(ts) % 86400000000 AS bucket_us,
      |    event_type AS type,
      |    CAST(SUM(CAST(value AS DECIMAL(38,9))) AS DOUBLE) AS sumv,
      |    CAST(COUNT(*) AS DOUBLE) AS cnt
      |  FROM events WHERE value >= 1 GROUP BY 1, 2),
      |t AS (
      |  SELECT b.bucket_us, b.type, b.n,
      |    power(2.0, idx + 1) AS le,
      |    COALESCE(LAG(power(2.0, idx + 1)) OVER (
      |      PARTITION BY b.bucket_us, b.type ORDER BY idx), 0.0) AS lower,
      |    s.sumv / s.cnt AS mean, s.cnt AS cnt
      |  FROM b JOIN s ON s.bucket_us = b.bucket_us AND s.type = b.type),
      |v AS (
      |  SELECT bucket_us, type,
      |    CAST(SUM(CAST(n * power(
      |      (CASE WHEN lower <= 0 THEN 0.0 ELSE sqrt(lower * le) END) - mean,
      |      2) AS DECIMAL(38,12))) AS DOUBLE) / MAX(cnt) AS var
      |  FROM t GROUP BY 1, 2)
      |SELECT bucket_us, type, round(sqrt(var), 6) AS value
      |FROM v ORDER BY bucket_us, type""".stripMargin
  ) { td =>
    graft.promql.PromQL
      .range("histogram_stddev(sum_over_time(nh[1d]))", nhDayPoints(td))
      .select(col("bucket_us"), element_at(col("labels"), "type").as("type"),
        round(col("value"), 6).as("value"))
      .orderBy("bucket_us", "type")
  }

  /** `histogram_quantile(0.9, rate(nh[1d]))` over native-histogram
    * COUNTERS — the verdict-example query end-to-end: per-bucket
    * cumulative counts sampled hourly (the OTLP cumulative-temporality
    * wire shape, densified to the scrape grid), expanded to classic le
    * counter series inside the front-end, Prometheus-extrapolated rate
    * per le series, then bucket interpolation. The oracle replays the
    * WHOLE chain: hourly dense grid, per-le cumulative counters,
    * the extrapolation formula (shared SQL fragment from [[PromMath]],
    * incl. the zero-crossing clamp — NOT distributive over le, so rate
    * must run per le series exactly like the engine), and the
    * previous-present-bucket interpolation.
    */
  val nativeHistRateQuantile: Q = {
    val HourUs = 3600000000L
    val DayUs2 = 86400000000L
    q(
      "promql_native_hist_rate_quantile",
      s"""WITH e AS (
         |  SELECT epoch_us(ts) AS ts_us, event_type AS type,
         |    length(bin(CAST(FLOOR(value) AS BIGINT))) - 1 AS idx
         |  FROM events WHERE value >= 1),
         |ext AS (SELECT MIN(ts_us) AS lo, MAX(ts_us) AS hi FROM e),
         |grid AS (
         |  SELECT unnest(generate_series(
         |    ((lo + ${HourUs - 1}) // $HourUs) * $HourUs,
         |    ((hi + ${DayUs2 - 1}) // $DayUs2) * $DayUs2,
         |    $HourUs)) AS h
         |  FROM ext),
         |series AS (SELECT DISTINCT type, idx FROM e),
         |cnth AS (
         |  SELECT type, idx,
         |    ((ts_us + ${HourUs - 1}) // $HourUs) * $HourUs AS h,
         |    COUNT(*) AS n1
         |  FROM e GROUP BY 1, 2, 3),
         |cum AS (
         |  SELECT g.h, s.type, s.idx,
         |    SUM(COALESCE(c.n1, 0)) OVER (
         |      PARTITION BY s.type, s.idx ORDER BY g.h) AS c
         |  FROM grid g CROSS JOIN series s
         |  LEFT JOIN cnth c ON c.type = s.type AND c.idx = s.idx AND c.h = g.h),
         |lev AS (
         |  SELECT h, type, idx,
         |    CAST(SUM(c) OVER (PARTITION BY h, type ORDER BY idx) AS DOUBLE) AS lc
         |  FROM cum),
         |st AS (
         |  SELECT ((h + ${DayUs2 - 1}) // $DayUs2) * $DayUs2 AS b, type, idx,
         |    COUNT(*) AS n, MIN(h) AS first_ts_us, MAX(h) AS last_ts_us,
         |    ARG_MIN(lc, h) AS first_v, ARG_MAX(lc, h) AS last_v
         |  FROM lev GROUP BY 1, 2, 3),
         |rate AS (
         |  SELECT b, type, idx,
         |    (last_v - first_v)
         |      * ${PromMath.oracleExtrapolation(counterZeroClamp = true, "(last_v - first_v)")}
         |      / 86400.0 AS r
         |  FROM (SELECT *, b - $DayUs2 AS bucket_us FROM st) WHERE n >= 2),
         |qq AS (
         |  SELECT b, type, power(2.0, idx + 1) AS le, r,
         |    MAX(r) OVER (PARTITION BY b, type) AS total,
         |    LAG(power(2.0, idx + 1)) OVER (
         |      PARTITION BY b, type ORDER BY idx) AS prev_le,
         |    LAG(r) OVER (PARTITION BY b, type ORDER BY idx) AS prev_c
         |  FROM rate)
         |SELECT b AS bucket_us, type,
         |  round(COALESCE(prev_le, 0.0)
         |    + (le - COALESCE(prev_le, 0.0))
         |      * (0.9 * total - COALESCE(prev_c, 0.0))
         |      / (r - COALESCE(prev_c, 0.0)), 6) AS value
         |FROM qq
         |WHERE r >= 0.9 * total AND (prev_c IS NULL OR prev_c < 0.9 * total)
         |ORDER BY bucket_us, type""".stripMargin
    ) { td =>
      // ingest-materialized ([[Fixtures.materialized]]): the hourly
      // densified cumulative grid is the stored cumulative-temporality
      // points table the wire delivers — built once, queried many times
      val pts = Fixtures.materialized(td.spark, td.dir, "nh_hourly_cum",
        "ts_us") {
        import org.apache.spark.sql.expressions.Window
        val e = td.events.filter(col("value") >= 1)
          .select(expr("ts div 1000").as("ts_us"), col("event_type").as("type"),
            (length(bin(floor(col("value")).cast("long"))) - 1).cast("int").as("idx"))
        val ext = e.agg(min("ts_us").as("lo"), max("ts_us").as("hi"))
        val grid = ext.select(explode(sequence(
          expr(s"((lo + ${HourUs - 1}) div $HourUs) * $HourUs"),
          expr(s"((hi + ${DayUs2 - 1}) div $DayUs2) * $DayUs2"),
          lit(HourUs))).as("h"))
        val series = e.select(col("type"), col("idx")).distinct()
        val cnth = e.groupBy(col("type"), col("idx"),
            expr(s"((ts_us + ${HourUs - 1}) div $HourUs) * $HourUs").as("h"))
          .agg(count(lit(1)).as("n1"))
        val wCum = Window.partitionBy(col("type"), col("idx")).orderBy(col("h"))
        grid.crossJoin(broadcast(series))
          .join(cnth, Seq("type", "idx", "h"), "left")
          .withColumn("c", sum(coalesce(col("n1"), lit(0L))).over(wCum))
          .select(col("h").as("ts_us"), lit("nh").as("name"),
            map(lit("type"), col("type")).as("labels"),
            col("c").cast("double").as("value"),
            lit(11).as("mapping"), col("idx").as("bucket_idx"),
            lit(0).as("scale"))
      }
      graft.promql.PromQL
        .range("histogram_quantile(0.9, rate(nh[1d]))", pts, Some(DayUs2))
        .select(col("bucket_us"), element_at(col("labels"), "type").as("type"),
          round(col("value"), 6).as("value"))
        .orderBy("bucket_us", "type")
    }
  }

  override def queries: Seq[Q] = Seq(
    sumByRate, groupLeft, exemplars, expHistogramMerge,
    profileSelector, flameTree, flameDiff, alertFiring, nativeHistQuantile,
    nativeHistRateQuantile, nativeHistCount, nativeHistFraction,
    nativeHistSum, nativeHistAvg, nativeHistStddev
  )
}
