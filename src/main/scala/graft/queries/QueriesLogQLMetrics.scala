package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sources.Testdata

/** LogQL metric-query operators (SURVEY.md §2.2): topk/bottomk per step,
  * vector binary ops (arith + set), absent_over_time, exact Prometheus
  * quantile, label_replace, stddev/stdvar.
  *
  * Steps are exact integer-ns buckets over the events ns Long (the
  * reference's ns step grid, internal/logql/logqlengine/
  * engine_metric_query.go:69-75).
  *
  * Scale notes: per-step top-k uses a rank window partitioned by step —
  * at 100 TB the partial aggregation to (step, labels) counts happens
  * map-side first, so the window sees only series-cardinality rows, not
  * raw events. Set ops are semi/anti joins on the step key, which
  * co-partition with the aggregation shuffle. absent materializes the
  * step grid with a single-row sequence + explode (no driver loop).
  */
object QueriesLogQLMetrics extends QueryPack {

  private def q(name: String, oracle: String)(f: Testdata => DataFrame): Q =
    Q(name, (s: SparkSession, dir: String) => f(Testdata(s, dir)), Some(oracle))

  private val Step6hNs = 21600000000000L
  private val Step1dNs = 86400000000000L

  /** `topk(2, count_over_time({..}[1d]) by (event_type))` — per-step
    * k-extremes via rank window (reference logqlmetric/vector_agg.go:
    * 126-231; heap there, rank-window here).
    */
  val topk: Q = q(
    "logql_topk",
    s"""SELECT bucket_ns, event_type, n FROM (
       |  SELECT bucket_ns, event_type, n,
       |    row_number() OVER (PARTITION BY bucket_ns ORDER BY n DESC, event_type) AS rk
       |  FROM (
       |    SELECT epoch_ns(ts) - epoch_ns(ts) % $Step1dNs AS bucket_ns, event_type, COUNT(*) AS n
       |    FROM events GROUP BY 1, 2))
       |WHERE rk <= 2 ORDER BY bucket_ns, n DESC, event_type""".stripMargin
  ) { td =>
    val counts = td.events
      .withColumn("bucket_ns", col("ts") - col("ts") % Step1dNs)
      .groupBy(col("bucket_ns"), col("event_type"))
      .agg(count(lit(1)).as("n"))
    val w = Window.partitionBy(col("bucket_ns")).orderBy(col("n").desc, col("event_type"))
    counts
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 2)
      .select(col("bucket_ns"), col("event_type"), col("n"))
      .orderBy(col("bucket_ns"), col("n").desc, col("event_type"))
  }

  /** Vector arithmetic binop: per-step error-rate ratio
    * `count_over_time({error}[6h]) / on(step) count_over_time({..}[6h])`
    * — label-matched inner join (reference logqlmetric/bin_op.go:13-254).
    */
  val binopRatio: Q = q(
    "logql_binop_ratio",
    s"""SELECT a.bucket_ns, CAST(a.n_err AS DOUBLE) / b.n_all AS ratio
       |FROM (SELECT epoch_ns(ts) - epoch_ns(ts) % $Step6hNs AS bucket_ns, COUNT(*) AS n_err
       |      FROM events WHERE event_type = 'error' GROUP BY 1) a
       |JOIN (SELECT epoch_ns(ts) - epoch_ns(ts) % $Step6hNs AS bucket_ns, COUNT(*) AS n_all
       |      FROM events GROUP BY 1) b USING (bucket_ns)
       |ORDER BY bucket_ns""".stripMargin
  ) { td =>
    // ONE scan, conditional counts (r19; the join form scanned events
    // twice and joined): the error side is a subset of the all side,
    // so both counts come out of one (bucket) aggregation. The inner
    // join kept only buckets with ≥1 error row — n_err >= 1 is that
    // exact condition (counts are integral; values bit-identical).
    td.events
      .withColumn("bucket_ns", col("ts") - col("ts") % Step6hNs)
      .groupBy(col("bucket_ns"))
      .agg(count(when(col("event_type") === "error", 1)).as("n_err"),
        count(lit(1)).as("n_all"))
      .filter(col("n_err") >= 1)
      .select(col("bucket_ns"),
        (col("n_err").cast("double") / col("n_all")).as("ratio"))
      .orderBy("bucket_ns")
  }

  /** Set binops `and` / `unless` between two per-(step, svc) vectors —
    * left-semi and left-anti joins on the full grouping key (reference
    * logqlmetric/bin_op.go set ops + sample_op.go:12-113).
    */
  val binopSet: Q = q(
    "logql_binop_set",
    s"""WITH a AS (
       |  SELECT epoch_ns(ts) - epoch_ns(ts) % $Step1dNs AS bucket_ns, user_id % 4 AS svc, COUNT(*) AS n
       |  FROM events WHERE event_type = 'error' GROUP BY 1, 2),
       |b AS (
       |  SELECT epoch_ns(ts) - epoch_ns(ts) % $Step1dNs AS bucket_ns, user_id % 4 AS svc
       |  FROM events WHERE event_type = 'signup' AND value > 400 GROUP BY 1, 2)
       |SELECT 'and' AS op, bucket_ns, svc, n FROM a
       |WHERE EXISTS (SELECT 1 FROM b WHERE b.bucket_ns = a.bucket_ns AND b.svc = a.svc)
       |UNION ALL
       |SELECT 'unless' AS op, bucket_ns, svc, n FROM a
       |WHERE NOT EXISTS (SELECT 1 FROM b WHERE b.bucket_ns = a.bucket_ns AND b.svc = a.svc)
       |ORDER BY op, bucket_ns, svc""".stripMargin
  ) { td =>
    val a = td.events.filter(col("event_type") === "error")
      .withColumn("bucket_ns", col("ts") - col("ts") % Step1dNs)
      .withColumn("svc", col("user_id") % 4)
      .groupBy(col("bucket_ns"), col("svc")).agg(count(lit(1)).as("n"))
    val b = td.events.filter(col("event_type") === "signup" && col("value") > 400)
      .withColumn("bucket_ns", col("ts") - col("ts") % Step1dNs)
      .withColumn("svc", col("user_id") % 4)
      .select(col("bucket_ns"), col("svc")).distinct()
    // one outer join instead of a semi + an anti: the b side carries a
    // presence marker, and the op label derives from it — halves the
    // number of scans/shuffles over the reference-shaped two-pass plan.
    val marked = b.withColumn("present", lit(1))
    a.join(marked, Seq("bucket_ns", "svc"), "left_outer")
      .select(
        when(col("present").isNotNull, "and").otherwise("unless").as("op"),
        col("bucket_ns"), col("svc"), col("n"))
      .orderBy("op", "bucket_ns", "svc")
  }

  /** `absent_over_time({error, value>450}[6h])` — 1 for grid steps with
    * no samples; the step grid is generated from the data extent with
    * sequence+explode, absent steps found by anti-join (reference
    * logqlmetric/aggregator.go:144-148).
    */
  val absentOverTime: Q = q(
    "logql_absent_over_time",
    s"""WITH ext AS (
       |  SELECT min(epoch_ns(ts) - epoch_ns(ts) % $Step6hNs) AS lo,
       |         max(epoch_ns(ts) - epoch_ns(ts) % $Step6hNs) AS hi
       |  FROM events),
       |grid AS (SELECT unnest(generate_series(lo, hi, $Step6hNs)) AS bucket_ns FROM ext),
       |present AS (
       |  SELECT DISTINCT epoch_ns(ts) - epoch_ns(ts) % $Step6hNs AS bucket_ns
       |  FROM events WHERE event_type = 'error' AND value > 450)
       |SELECT bucket_ns, 1 AS absent FROM grid
       |WHERE bucket_ns NOT IN (SELECT bucket_ns FROM present)
       |ORDER BY bucket_ns""".stripMargin
  ) { td =>
    val ext = td.events.agg(
      min(col("ts") - col("ts") % Step6hNs).as("lo"),
      max(col("ts") - col("ts") % Step6hNs).as("hi"))
    val grid = ext.select(explode(sequence(col("lo"), col("hi"), lit(Step6hNs))).as("bucket_ns"))
    val present = td.events
      .filter(col("event_type") === "error" && col("value") > 450)
      .select((col("ts") - col("ts") % Step6hNs).as("bucket_ns")).distinct()
    grid.join(present, Seq("bucket_ns"), "left_anti")
      .select(col("bucket_ns"), lit(1).as("absent"))
      .orderBy("bucket_ns")
  }

  /** `quantile_over_time(0.9, {..} | unwrap value [..]) by (event_type)`
    * — exact Prometheus linear-interpolation quantile (reference
    * logqlmetric/prom_math.go:120-147; Spark's exact `percentile` uses
    * the same order-statistic interpolation as DuckDB quantile_cont).
    */
  val quantileOverTime: Q = q(
    "logql_quantile_over_time",
    """SELECT event_type, ROUND(quantile_cont(value, 0.9), 6) AS q90, COUNT(*) AS n
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin
  ) { td =>
    td.events
      .groupBy(col("event_type"))
      .agg(
        round(expr("percentile(value, 0.9D)"), 6).as("q90"),
        count(lit(1)).as("n"))
      .orderBy("event_type")
  }

  /** `label_replace(v, "svc", "service-$1", "svc_src", "svc-(.*)")` —
    * regex label rewrite then regroup (reference logqlmetric/
    * label_replace.go).
    */
  val labelReplace: Q = q(
    "logql_label_replace",
    """SELECT regexp_replace(concat('svc-', CAST(user_id % 4 AS VARCHAR)), '^svc-', 'service-') AS svc,
      |  COUNT(*) AS n
      |FROM events GROUP BY svc ORDER BY svc""".stripMargin
  ) { td =>
    val src = concat(lit("svc-"), (col("user_id") % 4).cast("string"))
    td.events
      .select(regexp_replace(src, "^svc-", "service-").as("svc"))
      .groupBy(col("svc")).agg(count(lit(1)).as("n"))
      .orderBy("svc")
  }

  /** `stdvar_over_time` / `stddev_over_time` with deterministic float
    * math: decimal-exact Σx and Σx², then one fixed-shape double
    * formula — never a float-accumulation race (reference
    * logqlmetric/aggregator.go population variance).
    */
  val stddevStdvar: Q = q(
    "logql_stddev_stdvar",
    """SELECT event_type,
      |  ROUND((CAST(SUM(CAST(value * value AS DECIMAL(28,8))) AS DOUBLE)
      |     - CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE)
      |       * CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*)) / COUNT(*), 6) AS stdvar,
      |  ROUND(SQRT((CAST(SUM(CAST(value * value AS DECIMAL(28,8))) AS DOUBLE)
      |     - CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE)
      |       * CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*)) / COUNT(*)), 6) AS stddev,
      |  COUNT(*) AS n
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin
  ) { td =>
    val s1 = sum(col("value").cast("decimal(18,4)")).cast("double")
    val s2 = sum((col("value") * col("value")).cast("decimal(28,8)")).cast("double")
    val cnt = count(lit(1))
    td.events
      .groupBy(col("event_type"))
      .agg(
        round((s2 - s1 * s1 / cnt) / cnt, 6).as("stdvar"),
        round(sqrt((s2 - s1 * s1 / cnt) / cnt), 6).as("stddev"),
        cnt.as("n"))
      .orderBy("event_type")
  }

  override def queries: Seq[Q] = Seq(
    topk, binopRatio, binopSet, absentOverTime,
    quantileOverTime, labelReplace, stddevStdvar
  )
}
