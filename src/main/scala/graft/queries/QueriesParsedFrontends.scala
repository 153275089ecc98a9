package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.promql.PromQL
import graft.sources.Testdata
import graft.traceql.TraceQL

/** TraceQL and PromQL queries through the REAL front-ends (string →
  * parser → planner → DataFrame), oracle-checked like everything else.
  */
object QueriesParsedFrontends extends QueryPack {

  /** lineitem as the spans table for the TraceQL front-end —
    * ingest-materialized once per sfDir (stored parent_path column).
    */
  private def spansView(td: Testdata): DataFrame =
    Fixtures.materializedSpans(td.spark, td.dir, "pf") {
      buildSpansView(td)
    }

  private def buildSpansView(td: Testdata): DataFrame =
    td.lineitem.select(
      col("l_orderkey").as("trace_id"),
      col("l_linenumber").as("span_id"),
      when(col("l_linenumber") > 1, floor(col("l_linenumber") / 2).cast("int"))
        .as("parent_span_id"),
      concat(lit("op-"), col("l_returnflag")).as("name"),
      lit(2).as("kind"),
      when(col("l_returnflag") === "R", 2).otherwise(0).as("status_code"),
      round(col("l_quantity") * 1e6, 0).cast("long").as("duration_ns"),
      (unix_timestamp(col("l_shipdate")) * 1000000000L).as("start_ns"),
      map(
        lit("returnflag"), col("l_returnflag"),
        lit("linestatus"), col("l_linestatus"),
        lit("quantity"), col("l_quantity").cast("string")).as("attrs"))

  private val oracleSpans =
    """SELECT l_orderkey AS trace_id, l_linenumber AS span_id,
      |  CASE WHEN l_linenumber > 1 THEN l_linenumber // 2 END AS parent_span_id,
      |  'op-' || l_returnflag AS name,
      |  CAST(round(l_quantity * 1000000, 0) AS BIGINT) AS duration_ns,
      |  l_returnflag AS returnflag, l_linestatus AS linestatus, l_quantity AS quantity
      |FROM lineitem""".stripMargin

  /** events as the points table for the PromQL front-end. */
  private def pointsView(td: Testdata): DataFrame =
    td.events.select(
      expr("ts div 1000").as("ts_us"),
      col("event_type").as("name"),
      col("value"),
      map(lit("svc"), (col("user_id") % 4).cast("string")).as("labels"))

  /** TraceQL: span filter + scalar HAVING through the parser. */
  val traceqlFilter: Q = Q(
    "traceql_e2e_filter",
    (s: SparkSession, dir: String) =>
      TraceQL.plan("""{ duration > 30ms && linestatus = "F" } | count() >= 3""",
          spansView(Testdata(s, dir)))
        .select(col("trace_id"), col("n_spans"), col("agg_value")),
    Some(s"""WITH spans AS ($oracleSpans)
            |SELECT trace_id, COUNT(*) AS n_spans, CAST(COUNT(*) AS DOUBLE) AS agg_value
            |FROM spans WHERE duration_ns > 30000000 AND linestatus = 'F'
            |GROUP BY trace_id HAVING COUNT(*) >= 3
            |ORDER BY trace_id""".stripMargin))

  /** TraceQL: structural child op through the parser — returns the
    * RIGHT side's matches (reference spanset_op.go:196-215 childSpans:
    * b-spans whose parent matches a).
    */
  val traceqlStructural: Q = Q(
    "traceql_e2e_structural",
    (s: SparkSession, dir: String) =>
      TraceQL.plan("""{ returnflag = "R" } > { quantity > 30 }""",
          spansView(Testdata(s, dir)))
        .select(col("trace_id"), col("n_spans")),
    Some(s"""WITH spans AS ($oracleSpans)
            |SELECT trace_id, COUNT(*) AS n_spans FROM spans c
            |WHERE quantity > 30 AND EXISTS (
            |  SELECT 1 FROM spans p
            |  WHERE p.trace_id = c.trace_id AND p.span_id = c.parent_span_id
            |    AND p.returnflag = 'R')
            |GROUP BY trace_id ORDER BY trace_id""".stripMargin))

  /** TraceQL: descendant op through the parser — returns the RIGHT
    * side's matches that descend from a left match (reference
    * spanset_op.go:158-193 descendantSpans); ancestry from
    * parent_span_id (recursive CTE in the oracle), no dependence on the
    * testdata's span-id numbering.
    */
  val traceqlDescendant: Q = Q(
    "traceql_e2e_descendant",
    (s: SparkSession, dir: String) =>
      TraceQL.plan("""{ returnflag = "R" } >> { quantity > 45 }""",
          spansView(Testdata(s, dir)))
        .select(col("trace_id"), col("n_spans")),
    Some(s"""WITH RECURSIVE spans AS ($oracleSpans),
            |uspans AS (SELECT DISTINCT trace_id, span_id, parent_span_id FROM spans),
            |anc AS (
            |  SELECT trace_id, span_id, parent_span_id AS anc FROM uspans
            |  WHERE parent_span_id IS NOT NULL
            |  UNION ALL
            |  SELECT a.trace_id, a.span_id, u.parent_span_id
            |  FROM anc a JOIN uspans u
            |    ON u.trace_id = a.trace_id AND u.span_id = a.anc
            |  WHERE u.parent_span_id IS NOT NULL)
            |SELECT trace_id, COUNT(*) AS n_spans FROM spans c
            |WHERE quantity > 45 AND EXISTS (
            |  SELECT 1 FROM anc x
            |  JOIN spans p ON p.trace_id = x.trace_id AND p.span_id = x.anc
            |  WHERE x.trace_id = c.trace_id AND x.span_id = c.span_id
            |    AND p.returnflag = 'R')
            |GROUP BY trace_id ORDER BY trace_id""".stripMargin))

  /** TraceQL: spanset `&&` through the parser — traces where both sides
    * match keep the MERGED spans of both sides, deduped by span id
    * (reference spanset_op.go:41-47 mergeSpans).
    */
  val traceqlSpansetAnd: Q = Q(
    "traceql_spanset_and",
    (s: SparkSession, dir: String) =>
      TraceQL.plan("""{ returnflag = "R" } && { quantity > 45 }""",
          spansView(Testdata(s, dir)))
        .select(col("trace_id"), col("n_spans")),
    Some(s"""WITH spans AS ($oracleSpans),
            |l AS (SELECT trace_id, span_id FROM spans WHERE returnflag = 'R'),
            |r AS (SELECT trace_id, span_id FROM spans WHERE quantity > 45),
            |matched AS (
            |  SELECT DISTINCT trace_id FROM l
            |  INTERSECT SELECT DISTINCT trace_id FROM r)
            |SELECT trace_id, COUNT(*) AS n_spans FROM (
            |  SELECT trace_id, span_id FROM l
            |  UNION SELECT trace_id, span_id FROM r)
            |WHERE trace_id IN (SELECT trace_id FROM matched)
            |GROUP BY trace_id ORDER BY trace_id""".stripMargin))

  /** TraceQL: ancestor op `<<` through the parser — returns the RIGHT
    * side's matches that are ancestors of a left match (mirror of
    * descendantSpans, right-side convention).
    */
  val traceqlDescOf: Q = Q(
    "traceql_e2e_desc_of",
    (s: SparkSession, dir: String) =>
      TraceQL.plan("""{ quantity > 45 } << { returnflag = "R" }""",
          spansView(Testdata(s, dir)))
        .select(col("trace_id"), col("n_spans")),
    Some(s"""WITH RECURSIVE spans AS ($oracleSpans),
            |uspans AS (SELECT DISTINCT trace_id, span_id, parent_span_id FROM spans),
            |anc AS (
            |  SELECT trace_id, span_id, parent_span_id AS anc FROM uspans
            |  WHERE parent_span_id IS NOT NULL
            |  UNION ALL
            |  SELECT a.trace_id, a.span_id, u.parent_span_id
            |  FROM anc a JOIN uspans u
            |    ON u.trace_id = a.trace_id AND u.span_id = a.anc
            |  WHERE u.parent_span_id IS NOT NULL)
            |SELECT trace_id, COUNT(*) AS n_spans FROM spans r
            |WHERE r.returnflag = 'R' AND EXISTS (
            |  SELECT 1 FROM anc x JOIN spans s
            |    ON s.trace_id = x.trace_id AND s.span_id = x.span_id
            |  WHERE x.trace_id = r.trace_id AND x.anc = r.span_id
            |    AND s.quantity > 45)
            |GROUP BY trace_id ORDER BY trace_id""".stripMargin))

  /** TraceQL: negated sibling `!~` through the parser — right-side
    * matches with NO left-matching sibling.
    */
  val traceqlNoSibling: Q = Q(
    "traceql_e2e_no_sibling",
    (s: SparkSession, dir: String) =>
      TraceQL.plan("""{ linestatus = "F" } !~ { returnflag = "R" }""",
          spansView(Testdata(s, dir)))
        .select(col("trace_id"), col("n_spans")),
    Some(s"""WITH spans AS ($oracleSpans)
            |SELECT trace_id, COUNT(*) AS n_spans FROM spans r
            |WHERE r.returnflag = 'R' AND NOT EXISTS (
            |  SELECT 1 FROM spans s
            |  WHERE s.trace_id = r.trace_id
            |    AND s.parent_span_id = r.parent_span_id
            |    AND s.span_id <> r.span_id AND s.linestatus = 'F')
            |GROUP BY trace_id ORDER BY trace_id""".stripMargin))

  /** TraceQL: UNION child `&>` through the parser (Tempo's union
    * structural family; the reference parses and rejects these,
    * spanset_op.go:89-102) — BOTH participants survive: the children
    * with a matching parent AND the parents with a matching child.
    */
  val traceqlUnionChild: Q = Q(
    "traceql_e2e_union_child",
    (s: SparkSession, dir: String) =>
      TraceQL.plan("""{ returnflag = "R" } &> { quantity > 45 }""",
          spansView(Testdata(s, dir)))
        .select(col("trace_id"), col("n_spans")),
    Some(s"""WITH spans AS ($oracleSpans),
            |rs AS (
            |  SELECT trace_id, span_id FROM spans c
            |  WHERE quantity > 45 AND EXISTS (
            |    SELECT 1 FROM spans p WHERE p.trace_id = c.trace_id
            |      AND p.span_id = c.parent_span_id AND p.returnflag = 'R')),
            |ls AS (
            |  SELECT trace_id, span_id FROM spans p
            |  WHERE returnflag = 'R' AND EXISTS (
            |    SELECT 1 FROM spans c WHERE c.trace_id = p.trace_id
            |      AND c.parent_span_id = p.span_id AND c.quantity > 45))
            |SELECT trace_id, COUNT(*) AS n_spans FROM (
            |  SELECT trace_id, span_id FROM rs
            |  UNION SELECT trace_id, span_id FROM ls)
            |GROUP BY trace_id ORDER BY trace_id""".stripMargin))

  /** TraceQL: UNION sibling `&~` — spans on either side of the sibling
    * relation survive (symmetric by construction; the dedup matters
    * when a span matches both operands).
    */
  val traceqlUnionSibling: Q = Q(
    "traceql_e2e_union_sibling",
    (s: SparkSession, dir: String) =>
      TraceQL.plan("""{ linestatus = "F" } &~ { returnflag = "R" }""",
          spansView(Testdata(s, dir)))
        .select(col("trace_id"), col("n_spans")),
    Some(s"""WITH spans AS ($oracleSpans),
            |rs AS (
            |  SELECT trace_id, span_id FROM spans r
            |  WHERE returnflag = 'R' AND EXISTS (
            |    SELECT 1 FROM spans s WHERE s.trace_id = r.trace_id
            |      AND s.parent_span_id = r.parent_span_id
            |      AND s.span_id <> r.span_id AND s.linestatus = 'F')),
            |ls AS (
            |  SELECT trace_id, span_id FROM spans l
            |  WHERE linestatus = 'F' AND EXISTS (
            |    SELECT 1 FROM spans s WHERE s.trace_id = l.trace_id
            |      AND s.parent_span_id = l.parent_span_id
            |      AND s.span_id <> l.span_id AND s.returnflag = 'R'))
            |SELECT trace_id, COUNT(*) AS n_spans FROM (
            |  SELECT trace_id, span_id FROM rs
            |  UNION SELECT trace_id, span_id FROM ls)
            |GROUP BY trace_id ORDER BY trace_id""".stripMargin))

  /** PromQL: vector agg over count_over_time through the parser. */
  val promqlSumCount: Q = Q(
    "promql_e2e_sum_count",
    (s: SparkSession, dir: String) =>
      PromQL.range("""sum by (svc) (count_over_time(click[6h]))""",
          pointsView(Testdata(s, dir)))
        .select(col("bucket_us"), element_at(col("labels"), "svc").as("svc"), col("value"))
        .orderBy("bucket_us", "svc"),
    Some(s"""SELECT epoch_us(ts) - epoch_us(ts) % ${21600L * 1000000} AS bucket_us,
            |  CAST(user_id % 4 AS VARCHAR) AS svc, CAST(COUNT(*) AS DOUBLE) AS value
            |FROM events WHERE event_type = 'click'
            |GROUP BY bucket_us, svc ORDER BY bucket_us, svc""".stripMargin))

  /** PromQL: increase with counter-reset correction + extrapolation
    * through the parser — the full prom_math path end-to-end.
    */
  val promqlIncrease: Q = {
    val DayUs = 86400000000L
    val resultSql = "(last_v - first_v + corr)"
    Q(
      "promql_e2e_increase",
      (s: SparkSession, dir: String) =>
        PromQL.range("""increase(error[1d])""", pointsView(Testdata(s, dir)))
          .select(col("bucket_us"), element_at(col("labels"), "svc").as("svc"), col("value"))
          .orderBy("bucket_us", "svc"),
      Some(
        s"""SELECT bucket_us, svc,
           |  $resultSql * ${PromMath.oracleExtrapolation(counterZeroClamp = true, resultSql)} AS value
           |FROM (
           |  SELECT svc, bucket_us, COUNT(*) AS n,
           |    MIN(ts_us) AS first_ts_us, MAX(ts_us) AS last_ts_us,
           |    ARG_MIN(value, ts_us) AS first_v, ARG_MAX(value, ts_us) AS last_v,
           |    CAST(COALESCE(SUM(CAST(CASE WHEN value < prev THEN prev END AS DECIMAL(18,4))), 0) AS DOUBLE) AS corr
           |  FROM (
           |    SELECT svc, value, ts_us, bucket_us,
           |      lag(value) OVER (PARTITION BY svc, bucket_us ORDER BY ts_us) AS prev
           |    FROM (
           |      SELECT CAST(user_id % 4 AS VARCHAR) AS svc, value, epoch_us(ts) AS ts_us,
           |        epoch_us(ts) - epoch_us(ts) % $DayUs AS bucket_us
           |      FROM events WHERE event_type = 'error'))
           |  GROUP BY svc, bucket_us)
           |WHERE n >= 2 ORDER BY bucket_us, svc""".stripMargin))
  }

  /** PromQL: instant as-of query through the parser. */
  val promqlInstant: Q = {
    val tUs = 1705276800000000L // 2024-01-15T00:00:00Z in µs
    val lookbackUs = 86400000000L
    Q(
      "promql_e2e_instant",
      (s: SparkSession, dir: String) =>
        PromQL.instant("""error{svc="2"}""", pointsView(Testdata(s, dir)),
            evalTsUs = tUs, lookbackUs = lookbackUs)
          .select(element_at(col("labels"), "svc").as("svc"), col("value"), col("ts_us"))
          .orderBy("svc"),
      Some(
        s"""SELECT svc, value, ts_us FROM (
           |  SELECT CAST(user_id % 4 AS VARCHAR) AS svc, value, epoch_us(ts) AS ts_us,
           |    row_number() OVER (PARTITION BY user_id % 4 ORDER BY ts DESC) AS rn
           |  FROM events
           |  WHERE event_type = 'error' AND user_id % 4 = 2
           |    AND epoch_us(ts) <= $tUs AND epoch_us(ts) > ${tUs - lookbackUs})
           |WHERE rn = 1 ORDER BY svc""".stripMargin))
  }

  override def queries: Seq[Q] = Seq(
    traceqlFilter, traceqlStructural, traceqlDescendant, traceqlSpansetAnd,
    traceqlDescOf, traceqlNoSibling, traceqlUnionChild, traceqlUnionSibling,
    promqlSumCount, promqlIncrease, promqlInstant)
}
