package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Testdata

/** LogQL operator semantics over the driver testdata (SURVEY.md §2.1/§2.2).
  *
  * `events` plays the logs table: `props` is the body (JSON), `event_type`
  * and `user_id` are stream labels, `ts` is an epoch-ns Long. Steps are
  * exact integer-ns buckets (bucket = ts - ts % step_ns), mirroring the
  * reference's ns step grid (internal/logql/logqlengine/
  * engine_metric_query.go:69-75).
  */
object QueriesLogQL extends QueryPack {
  import Det._

  private def q(name: String, oracle: String)(f: Testdata => DataFrame): Q =
    Q(name, (s: SparkSession, dir: String) => f(Testdata(s, dir)), Some(oracle))

  private val Step6hNs = 21600000000000L // 6h in ns
  private val Step1dNs = 86400000000000L // 1d in ns

  /** Stream selector: conjunctive label matchers
    * ({event_type=~"error|signup", svc="svc-1"}).
    */
  val selector: Q = q(
    "logql_selector",
    """SELECT event_type, COUNT(*) AS n FROM events
      |WHERE event_type IN ('error', 'signup') AND user_id % 4 = 1
      |GROUP BY event_type ORDER BY event_type""".stripMargin
  ) { td =>
    td.events
      .filter(col("event_type").isin("error", "signup") && col("user_id") % 4 === 1)
      .groupBy(col("event_type")).agg(count(lit(1)).as("n"))
      .orderBy("event_type")
  }

  /** Line filter `|= "substr"` → substring containment on the body
    * (reference internal/logql/logqlengine/line_filter.go).
    */
  val lineFilterContains: Q = q(
    "logql_line_filter_contains",
    """SELECT event_type, COUNT(*) AS n FROM events
      |WHERE contains(props, '"k": 7')
      |GROUP BY event_type ORDER BY event_type""".stripMargin
  ) { td =>
    td.events
      .filter(col("props").contains("\"k\": 7"))
      .groupBy(col("event_type")).agg(count(lit(1)).as("n"))
      .orderBy("event_type")
  }

  /** Line filter `|~ "regex"` on the body (documents.text as body). */
  val lineFilterRegex: Q = q(
    "logql_line_filter_regex",
    """SELECT lang, COUNT(*) AS n FROM documents
      |WHERE regexp_matches(text, 'merge (fast|slow)')
      |GROUP BY lang ORDER BY lang""".stripMargin
  ) { td =>
    td.documents
      .filter(col("text").rlike("merge (fast|slow)"))
      .groupBy(col("lang")).agg(count(lit(1)).as("n"))
      .orderBy("lang")
  }

  /** `| json` extraction stage: lift a JSON body field to a label and
    * aggregate over it (reference logqlengine/json.go).
    */
  val jsonExtract: Q = q(
    "logql_json_extract",
    """SELECT event_type, CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k, COUNT(*) AS n
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin
  ) { td =>
    td.events
      .withColumn("k", get_json_object(col("props"), "$.k").cast("long"))
      .groupBy(col("event_type"))
      .agg(sum(col("k")).as("sum_k"), count(lit(1)).as("n"))
      .orderBy("event_type")
  }

  /** `count_over_time({...}[6h])` on a fixed step grid: per-stream
    * windowed counts (reference logqlmetric/aggregator.go:62-91).
    */
  val countOverTime: Q = q(
    "logql_count_over_time",
    s"""SELECT epoch_ns(ts) - epoch_ns(ts) % $Step6hNs AS bucket_ns, event_type, COUNT(*) AS n
       |FROM events GROUP BY bucket_ns, event_type
       |ORDER BY bucket_ns, event_type""".stripMargin
  ) { td =>
    td.events
      .withColumn("bucket_ns", col("ts") - col("ts") % Step6hNs)
      .groupBy(col("bucket_ns"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .orderBy("bucket_ns", "event_type")
  }

  /** `rate({...}[6h])` = count_over_time / range-seconds
    * (reference logqlmetric/aggregator.go:72-76).
    */
  val rate: Q = q(
    "logql_rate",
    s"""SELECT epoch_ns(ts) - epoch_ns(ts) % $Step6hNs AS bucket_ns, event_type,
       |  CAST(COUNT(*) AS DOUBLE) / 21600.0 AS rate
       |FROM events GROUP BY 1, event_type
       |ORDER BY bucket_ns, event_type""".stripMargin
  ) { td =>
    td.events
      .withColumn("bucket_ns", col("ts") - col("ts") % Step6hNs)
      .groupBy(col("bucket_ns"), col("event_type"))
      .agg((count(lit(1)).cast("double") / 21600.0).as("rate"))
      .orderBy("bucket_ns", "event_type")
  }

  /** `bytes_over_time({...}[1d])`: windowed byte sums of the body. */
  val bytesOverTime: Q = q(
    "logql_bytes_over_time",
    s"""SELECT epoch_ns(ts) - epoch_ns(ts) % $Step1dNs AS bucket_ns,
       |  ${oISum("length(props)")} AS bytes
       |FROM events GROUP BY 1 ORDER BY bucket_ns""".stripMargin
  ) { td =>
    td.events
      .withColumn("bucket_ns", col("ts") - col("ts") % Step1dNs)
      .groupBy(col("bucket_ns"))
      .agg(sum(length(col("props"))).as("bytes"))
      .orderBy("bucket_ns")
  }

  /** `sum/min/max/avg_over_time({...} | unwrap value [..]) by (event_type)`:
    * unwrapped-value aggregations (reference logqlmetric/aggregator.go:94-143).
    */
  val unwrapStats: Q = q(
    "logql_unwrap_stats",
    s"""SELECT event_type,
       |  ${oSum("value")} AS sum_v, MIN(value) AS min_v, MAX(value) AS max_v,
       |  ${oAvg("value")} AS avg_v, COUNT(*) AS n
       |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin
  ) { td =>
    td.events
      .groupBy(col("event_type"))
      .agg(
        dsum(col("value")).as("sum_v"),
        min(col("value")).as("min_v"),
        max(col("value")).as("max_v"),
        davg(col("value")).as("avg_v"),
        count(lit(1)).as("n")
      )
      .orderBy("event_type")
  }

  override def queries: Seq[Q] = Seq(
    selector, lineFilterContains, lineFilterRegex, jsonExtract,
    countOverTime, rate, bytesOverTime, unwrapStats
  )
}
