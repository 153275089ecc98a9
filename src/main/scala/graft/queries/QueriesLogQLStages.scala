package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions._
import graft.sources.Testdata

/** LogQL pipeline stages beyond the basics (SURVEY.md §2.1): logfmt,
  * pattern, line_format/label_format, distinct, ip filter, unwrap
  * bytes/duration conversions, decolorize.
  *
  * Several stages run through the engine's native codegen expressions
  * (graft.functions.exprs); their oracles re-derive the expected value
  * arithmetically or with portable SQL, so a kernel bug shows up as a
  * hash mismatch, not a tautology.
  *
  * Scale notes: every stage here is a narrow projection/filter — no
  * shuffle except the final aggregation; all stay inside one
  * whole-stage-codegen span.
  */
object QueriesLogQLStages extends QueryPack {
  import Det._

  private def q(name: String, oracle: String)(f: Testdata => DataFrame): Q =
    Q(name, (s: SparkSession, dir: String) => f(Testdata(s, dir)), Some(oracle))

  /** `| logfmt` field lifting via the native logfmt_get expression
    * (reference internal/logql/logqlengine/logfmt.go). The logfmt line
    * is derived from events columns; the oracle re-extracts with
    * regexes, so extraction must agree exactly.
    */
  val logfmtExtract: Q = q(
    "logql_logfmt_extract",
    """SELECT event_type,
      |  CAST(SUM(CAST(regexp_extract(line, 'user=([0-9]+)', 1) AS BIGINT)) AS BIGINT) AS sum_user,
      |  MAX(regexp_extract(line, 'note="([^"]*)"', 1)) AS max_note,
      |  COUNT(*) AS n
      |FROM (
      |  SELECT event_type,
      |    concat('type=', event_type, ' user=', user_id, ' note="id ', event_id, '"') AS line
      |  FROM events)
      |GROUP BY event_type ORDER BY event_type""".stripMargin
  ) { td =>
    td.events
      .withColumn("line",
        concat(lit("type="), col("event_type"), lit(" user="), col("user_id"),
          lit(" note=\"id "), col("event_id"), lit("\"")))
      .groupBy(col("event_type"))
      .agg(
        sum(logfmt_get(col("line"), lit("user")).cast("long")).as("sum_user"),
        max(logfmt_get(col("line"), lit("note"))).as("max_note"),
        count(lit(1)).as("n"))
      .orderBy("event_type")
  }

  /** `| pattern "<_>merge <nxt> <_>"` positional capture: compiled to an
    * anchored lazy regex at plan time (reference internal/logqlpattern).
    * Oracle uses the equivalent token-after-literal regex.
    */
  val patternExtract: Q = {
    val (regex, _) = graft.functions.Kernels.patternToRegex("<_>merge <nxt> <_>")
    q(
      "logql_pattern_extract",
      """SELECT nxt, COUNT(*) AS n FROM (
        |  SELECT regexp_extract(text, 'merge ([^ ]+) ', 1) AS nxt FROM documents
        |  WHERE contains(text, 'merge '))
        |WHERE nxt <> '' GROUP BY nxt ORDER BY n DESC, nxt""".stripMargin
    ) { td =>
      td.documents
        .filter(col("text").contains("merge "))
        .select(regexp_extract(col("text"), regex, 1).as("nxt"))
        .filter(col("nxt") =!= "")
        .groupBy(col("nxt")).agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("nxt"))
    }
  }

  /** `| line_format "{{.event_type}}/{{.user_id}}"` + `| label_format`
    * rename — template stages as format_string/projections (reference
    * logqlengine/line_format.go, label_format.go).
    */
  val lineFormat: Q = q(
    "logql_line_format",
    """SELECT formatted, COUNT(*) AS n FROM (
      |  SELECT printf('%s/u%d', event_type, user_id % 10) AS formatted FROM events)
      |GROUP BY formatted ORDER BY formatted""".stripMargin
  ) { td =>
    td.events
      .select(format_string("%s/u%d", col("event_type"), col("user_id") % 10).as("formatted"))
      .groupBy(col("formatted")).agg(count(lit(1)).as("n"))
      .orderBy("formatted")
  }

  /** `| distinct event_type` — keep the FIRST row per label value in
    * (ts, event_id) order; deterministic rank instead of dropDuplicates
    * (reference logqlengine/distinct.go keeps first occurrence).
    */
  val distinctStage: Q = q(
    "logql_distinct_stage",
    """SELECT event_type, event_id, epoch_us(ts) AS ts_us FROM (
      |  SELECT event_type, event_id, ts,
      |    row_number() OVER (PARTITION BY event_type ORDER BY ts, event_id) AS rn
      |  FROM events) WHERE rn = 1
      |ORDER BY event_type""".stripMargin
  ) { td =>
    val w = Window.partitionBy(col("event_type")).orderBy(col("ts"), col("event_id"))
    td.events
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("event_type"), col("event_id"), expr("ts div 1000").as("ts_us"))
      .orderBy("event_type")
  }

  /** `ip()` line filter over CIDR and range patterns via the native
    * ip_match expression; the oracle states the same predicate as pure
    * arithmetic on the octet sources (reference logqlengine/ip_matcher.go).
    */
  val ipFilter: Q = q(
    "logql_ip_filter",
    """SELECT event_type, COUNT(*) AS n FROM events
      |WHERE (user_id % 200 = 5) OR (user_id % 200 IN (3, 4))
      |GROUP BY event_type ORDER BY event_type""".stripMargin
  ) { td =>
    val ip = format_string("10.%d.%d.7", col("user_id") % 200, col("event_id") % 250)
    td.events
      .filter(ip_match(ip, lit("10.5.0.0/16")) ||
        ip_match(ip, lit("10.3.0.0-10.4.255.255")))
      .groupBy(col("event_type")).agg(count(lit(1)).as("n"))
      .orderBy("event_type")
  }

  /** `| unwrap dur duration` — parse Go-style durations to seconds via
    * the native parse_duration expression; oracle recomputes the same
    * seconds arithmetically (reference logqlengine/sampler.go:212-226).
    */
  val unwrapDuration: Q = q(
    "logql_unwrap_duration",
    s"""SELECT event_type,
       |  ${oSum("CAST(FLOOR(value*10) AS BIGINT) * 0.001")} AS sum_dur_s,
       |  COUNT(*) AS n
       |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin
  ) { td =>
    val durStr = concat(floor(col("value") * 10).cast("long").cast("string"), lit("ms"))
    td.events
      .withColumn("dur_s", parse_duration(durStr))
      .groupBy(col("event_type"))
      .agg(dsum(col("dur_s")).as("sum_dur_s"), count(lit(1)).as("n"))
      .orderBy("event_type")
  }

  /** `| unwrap sz bytes` — humanized byte sizes via parse_bytes;
    * KiB are exact powers of two so the sum is integer-exact.
    */
  val unwrapBytes: Q = q(
    "logql_unwrap_bytes",
    """SELECT event_type, CAST(SUM((user_id + 1) * 1024) AS BIGINT) AS sum_bytes
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin
  ) { td =>
    val szStr = concat((col("user_id") + 1).cast("string"), lit("KiB"))
    td.events
      .withColumn("bytes", parse_bytes(szStr))
      .groupBy(col("event_type"))
      .agg(sum(col("bytes")).cast("long").as("sum_bytes"))
      .orderBy("event_type")
  }

  /** `| decolorize` — ANSI-SGR-wrapped bodies come back clean; oracle
    * aggregates the plain column directly (reference logqlengine/
    * decolorize.go).
    */
  val decolorizeStage: Q = q(
    "logql_decolorize",
    """SELECT event_type AS clean, COUNT(*) AS n FROM events
      |GROUP BY clean ORDER BY clean""".stripMargin
  ) { td =>
    val colored = concat(lit("\u001b[31m"), col("event_type"), lit("\u001b[0m"))
    td.events
      .select(decolorize(colored).as("clean"))
      .groupBy(col("clean")).agg(count(lit(1)).as("n"))
      .orderBy("clean")
  }

  override def queries: Seq[Q] = Seq(
    logfmtExtract, patternExtract, lineFormat, distinctStage,
    ipFilter, unwrapDuration, unwrapBytes, decolorizeStage
  )
}
