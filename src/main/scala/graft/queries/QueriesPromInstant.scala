package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.promql.PromQL
import graft.sources.Testdata

/** Round-6 PromQL surface: the instant path over ARBITRARY vector
  * expressions (lookback substitution at the leaves), range queries
  * over BARE vector selectors (the most common Grafana query — the
  * reference serves both through its vendored upstream engine,
  * promhandler.go:282-374), bare-selector `offset`, and group-scoped
  * topk ranking.
  */
object QueriesPromInstant extends QueryPack {

  private val DayUs = 86400000000L
  private val GridUs = 300000000L // default 5m step/lookback
  private val TUs = 1705305600000000L // 2024-01-15T08:00Z, inside the corpus
  // Eval time for the instant-agg entry: a 5m-aligned instant whose
  // lookback window holds samples from all four svc groups at the gate
  // SF (an empty window proves parsing, not evaluation).
  private val TAggUs = 1705505100000000L // 2024-01-17T15:25Z

  /** Points with ONE sample per (series, ts): lookback picks the
    * newest sample per series, and a ts collision inside one series
    * would make "the newest" engine-dependent — dedup makes both
    * engines deterministic (real scrapes never emit two samples of one
    * series at one instant, so this is fidelity, not a workaround).
    */
  private def dedupPointsView(td: Testdata): DataFrame =
    td.events
      .groupBy(expr("ts div 1000").as("ts_us"),
        (col("user_id") % 4).cast("string").as("svc"),
        col("event_type").as("et"))
      .agg(max(col("value")).as("value"))
      .select(col("ts_us"), lit("ev").as("name"), col("value"),
        map(lit("svc"), col("svc"), lit("et"), col("et")).as("labels"))

  private val oracleDedup =
    """SELECT epoch_us(ts) AS tu, CAST(user_id % 4 AS VARCHAR) AS svc,
      |    event_type AS et, MAX(value) AS v
      |  FROM events GROUP BY 1, 2, 3""".stripMargin

  /** Range query over a bare selector: per step (5m default grid),
    * the newest live sample in (step-5m, step] — evaluated as a
    * bounded fan-out (each sample serves at most lookback/step+1
    * steps), never a per-step rescan.
    */
  val rangeBareVector: Q = Q(
    "promql_range_bare_vector",
    (s: SparkSession, dir: String) =>
      PromQL.range("""ev{svc="1"}""", dedupPointsView(Testdata(s, dir)))
        .select(col("bucket_us"),
          element_at(col("labels"), "et").as("et"), col("value"))
        .orderBy("bucket_us", "et"),
    Some(
      s"""WITH p AS ($oracleDedup),
         |fan AS (
         |  SELECT et, v, tu,
         |    ((tu + ${GridUs - 1}) // $GridUs) * $GridUs + u.k * $GridUs AS bucket_us
         |  FROM p, (SELECT unnest([0, 1]) AS k) u
         |  WHERE svc = '1'
         |    AND ((tu + ${GridUs - 1}) // $GridUs) * $GridUs + u.k * $GridUs
         |      < tu + $GridUs),
         |r AS (SELECT bucket_us, et, v,
         |    row_number() OVER (PARTITION BY bucket_us, et ORDER BY tu DESC) AS rn
         |  FROM fan)
         |SELECT bucket_us, et, v AS value FROM r WHERE rn = 1
         |ORDER BY bucket_us, et""".stripMargin))

  /** Instant aggregation over a bare vector — the evalInstant path:
    * lookback latest per series, then the structural sum.
    */
  val instantAgg: Q = Q(
    "promql_instant_vector_agg",
    (s: SparkSession, dir: String) =>
      PromQL.instant("""sum by (svc) (ev)""",
          dedupPointsView(Testdata(s, dir)), evalTsUs = TAggUs)
        .select(col("ts_us"), element_at(col("labels"), "svc").as("svc"),
          round(col("value"), 6).as("value"))
        .orderBy("svc"),
    Some(
      s"""WITH p AS ($oracleDedup),
         |r AS (SELECT svc, et, v,
         |    row_number() OVER (PARTITION BY svc, et ORDER BY tu DESC) AS rn
         |  FROM p WHERE tu <= $TAggUs AND tu > ${TAggUs - GridUs})
         |SELECT $TAggUs AS ts_us, svc, round(SUM(v), 6) AS value
         |FROM r WHERE rn = 1 GROUP BY svc ORDER BY svc""".stripMargin))

  /** Bare-selector offset: the lookback window shifts back wholesale
    * (upstream offset modifier; the corpus's variant_args ["offset"]).
    */
  val selectorOffset: Q = {
    val shifted = TUs - 3600000000L // offset 1h
    Q(
      "promql_selector_offset",
      (s: SparkSession, dir: String) =>
        PromQL.instant("""ev{svc="2"} offset 1h""",
            dedupPointsView(Testdata(s, dir)), evalTsUs = TUs)
          .select(col("ts_us"), element_at(col("labels"), "et").as("et"),
            col("value"))
          .orderBy("et"),
      Some(
        s"""WITH p AS ($oracleDedup),
           |r AS (SELECT et, v,
           |    row_number() OVER (PARTITION BY et ORDER BY tu DESC) AS rn
           |  FROM p WHERE svc = '2'
           |    AND tu <= $shifted AND tu > ${shifted - GridUs})
           |SELECT $TUs AS ts_us, et, v AS value FROM r WHERE rn = 1
           |ORDER BY et""".stripMargin))
  }

  /** topk ranked WITHIN its by(...) group, full series labels kept
    * (upstream aggregation semantics — the round-6 ledger trap).
    */
  val topkGrouped: Q = Q(
    "promql_topk_grouped",
    (s: SparkSession, dir: String) =>
      PromQL.range(
          """topk by (et) (1, sum by (svc, et) (count_over_time(ev[1d])))""",
          Testdata(s, dir).events.select(
            expr("ts div 1000").as("ts_us"), lit("ev").as("name"),
            col("value"),
            map(lit("svc"), (col("user_id") % 4).cast("string"),
              lit("et"), col("event_type")).as("labels")))
        .select(col("bucket_us"),
          element_at(col("labels"), "svc").as("svc"),
          element_at(col("labels"), "et").as("et"), col("value"))
        .orderBy("bucket_us", "et", "svc"),
    Some(
      s"""WITH c AS (
         |  SELECT epoch_us(ts) - epoch_us(ts) % $DayUs AS bucket_us,
         |    CAST(user_id % 4 AS VARCHAR) AS svc, event_type AS et,
         |    CAST(COUNT(*) AS DOUBLE) AS n
         |  FROM events GROUP BY 1, 2, 3),
         |r AS (SELECT *, row_number() OVER (
         |    PARTITION BY bucket_us, et ORDER BY n DESC, svc) AS rn FROM c)
         |SELECT bucket_us, svc, et, n AS value FROM r WHERE rn = 1
         |ORDER BY bucket_us, et, svc""".stripMargin))

  override def queries: Seq[Q] =
    Seq(rangeBareVector, instantAgg, selectorOffset, topkGrouped)
}
