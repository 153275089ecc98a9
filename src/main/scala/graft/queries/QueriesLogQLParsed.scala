package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.logql.Planner
import graft.sources.Testdata

/** LogQL queries that go through the REAL front-end — string → lexer →
  * parser → AST → planner → DataFrame (graft.logql) — with the DuckDB
  * oracle re-deriving the semantics directly. This is the reference's
  * query lifecycle (SURVEY.md §3.1) end-to-end, not hand-built frames.
  */
object QueriesLogQLParsed extends QueryPack {

  /** events as the logs table: body = props, labels = {event_type, user_id}. */
  private def logsView(td: Testdata): DataFrame =
    td.events.select(
      col("ts").as("ts_ns"),
      col("props").as("body"),
      map(
        lit("event_type"), col("event_type"),
        lit("user_id"), col("user_id").cast("string")).as("labels"))

  private def q(name: String, logql: String, oracle: String,
      logLimit: Option[Int] = Some(Planner.DefaultLogLimit))(
      post: DataFrame => DataFrame): Q =
    Q(name, (s: SparkSession, dir: String) =>
      post(Planner.query(logql, logsView(Testdata(s, dir)), logLimit = logLimit)),
      Some(oracle))

  /** Log pipeline through the parser: selector + json + numeric label
    * filter; output rows.
    */
  val parsedPipeline: Q = q(
    "logql_e2e_pipeline",
    """{event_type="error"} | json | k > 50""",
    """SELECT epoch_us(ts) AS ts_us, props AS body FROM events
      |WHERE event_type = 'error'
      |  AND CAST(json_extract_string(props, '$.k') AS DOUBLE) > 50
      |ORDER BY ts_us, body LIMIT 1000""".stripMargin
  ) { df =>
    // planLog's default 1000-line cap is part of the contract here —
    // the total (ts, body) order makes the top-1000 deterministic
    df.select(expr("ts_ns div 1000").as("ts_us"), col("body"))
      .orderBy("ts_us", "body")
  }

  /** Metric query through the parser: anchored regex matcher, range agg,
    * vector agg with by().
    */
  val parsedMetric: Q = q(
    "logql_e2e_metric",
    """sum by (event_type) (count_over_time({user_id=~"1.*"}[6h]))""",
    s"""SELECT epoch_ns(ts) - epoch_ns(ts) % ${21600L * 1000000000} AS bucket_ns,
       |  event_type, CAST(COUNT(*) AS DOUBLE) AS value
       |FROM events
       |WHERE regexp_matches(CAST(user_id AS VARCHAR), '^(?:1.*)$$')
       |GROUP BY bucket_ns, event_type
       |ORDER BY bucket_ns, event_type""".stripMargin
  ) { df =>
    df.select(col("bucket_ns"),
        element_at(col("labels"), "event_type").as("event_type"), col("value"))
      .orderBy("bucket_ns", "event_type")
  }

  /** topk through the parser, deterministic tie-break via the stream key. */
  val parsedTopk: Q = q(
    "logql_e2e_topk",
    """topk(2, sum by (event_type) (count_over_time({}[1d])))""",
    s"""SELECT bucket_ns, event_type, n AS value FROM (
       |  SELECT bucket_ns, event_type, CAST(n AS DOUBLE) AS n,
       |    row_number() OVER (PARTITION BY bucket_ns ORDER BY n DESC, event_type) AS rk
       |  FROM (
       |    SELECT epoch_ns(ts) - epoch_ns(ts) % ${86400L * 1000000000} AS bucket_ns,
       |      event_type, COUNT(*) AS n
       |    FROM events GROUP BY 1, 2))
       |WHERE rk <= 2 ORDER BY bucket_ns, value DESC, event_type""".stripMargin
  ) { df =>
    df.select(col("bucket_ns"),
        element_at(col("labels"), "event_type").as("event_type"), col("value"))
      .orderBy(col("bucket_ns"), col("value").desc, col("event_type"))
  }

  /** Scalar binop through the parser: total count per step divided once
    * (sum of integer-valued doubles is order-exact; the single division
    * keeps the oracle bit-identical).
    */
  val parsedRate: Q = q(
    "logql_e2e_rate",
    """sum(count_over_time({event_type="click"}[1d])) / 86400""",
    s"""SELECT epoch_ns(ts) - epoch_ns(ts) % ${86400L * 1000000000} AS bucket_ns,
       |  CAST(COUNT(*) AS DOUBLE) / 86400.0 AS value
       |FROM events WHERE event_type = 'click'
       |GROUP BY bucket_ns ORDER BY bucket_ns""".stripMargin
  ) { df =>
    df.select(col("bucket_ns"), col("value")).orderBy("bucket_ns")
  }

  /** bottomk through the parser — rank-ascending per step. */
  val parsedBottomk: Q = q(
    "logql_e2e_bottomk",
    """bottomk(2, sum by (event_type) (count_over_time({}[1d])))""",
    s"""SELECT bucket_ns, event_type, n AS value FROM (
       |  SELECT bucket_ns, event_type, CAST(n AS DOUBLE) AS n,
       |    row_number() OVER (PARTITION BY bucket_ns ORDER BY n ASC, event_type) AS rk
       |  FROM (
       |    SELECT epoch_ns(ts) - epoch_ns(ts) % ${86400L * 1000000000} AS bucket_ns,
       |      event_type, COUNT(*) AS n
       |    FROM events GROUP BY 1, 2))
       |WHERE rk <= 2 ORDER BY bucket_ns, value, event_type""".stripMargin
  ) { df =>
    df.select(col("bucket_ns"),
        element_at(col("labels"), "event_type").as("event_type"), col("value"))
      .orderBy(col("bucket_ns"), col("value"), col("event_type"))
  }

  /** without() grouping through the parser: drop event_type, keep user_id. */
  val parsedWithout: Q = q(
    "logql_e2e_without",
    """sum without (event_type) (count_over_time({user_id="7"}[1d]))""",
    s"""SELECT epoch_ns(ts) - epoch_ns(ts) % ${86400L * 1000000000} AS bucket_ns,
       |  CAST(user_id AS VARCHAR) AS user_id, CAST(COUNT(*) AS DOUBLE) AS value
       |FROM events WHERE user_id = 7
       |GROUP BY bucket_ns, user_id ORDER BY bucket_ns""".stripMargin
  ) { df =>
    df.select(col("bucket_ns"),
        element_at(col("labels"), "user_id").as("user_id"), col("value"))
      .orderBy("bucket_ns")
  }

  /** line_format + logfmt + label filter chained through the parser:
    * the body is rewritten to logfmt, re-parsed by the logfmt stage,
    * and filtered on the extracted field.
    */
  val parsedLogfmt: Q = q(
    "logql_e2e_logfmt",
    """{event_type="signup"} | line_format "uid={{.user_id}} t={{.event_type}}" | logfmt | t = "signup"""",
    """SELECT COUNT(*) AS n, MAX(body) AS max_body FROM (
      |  SELECT 'uid=' || user_id || ' t=' || event_type AS body
      |  FROM events WHERE event_type = 'signup')""".stripMargin,
    logLimit = None // aggregated downstream: the line cap must not apply
  ) { df =>
    df.agg(count(lit(1)).as("n"), max(col("body")).as("max_body"))
  }

  override def queries: Seq[Q] = Seq(
    parsedPipeline, parsedMetric, parsedTopk, parsedRate,
    parsedBottomk, parsedWithout, parsedLogfmt)
}
