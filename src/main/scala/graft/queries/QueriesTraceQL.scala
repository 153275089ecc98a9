package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Testdata

/** TraceQL operator surface (SURVEY.md §2.4) over the span view derived
  * from lineitem (OtelViews: trace = order, span = lineitem row,
  * parent = linenumber/2 binary tree).
  *
  * Span identity note: (l_orderkey, l_linenumber) is NOT unique in the
  * testdata, so every query here returns aggregates (pair counts,
  * per-trace rollups), never raw span rows.
  *
  * Scale notes: structural ops are self-joins keyed on
  * (trace_id, span_id) — both sides shuffle-partition on trace_id, so
  * the join co-locates; with bucketing on trace_id at ingest they
  * become shuffle-free. The descendant op uses an exploded precomputed
  * ancestor path (the design SURVEY §7 commits to for 100 TB) instead
  * of an iterative join.
  */
object QueriesTraceQL extends QueryPack {

  private def q(name: String, oracle: String)(f: Testdata => DataFrame): Q =
    Q(name, (s: SparkSession, dir: String) => f(Testdata(s, dir)), Some(oracle))

  /** Spans projection used by all queries (kept inline so the oracle SQL
    * derivation stays visibly in sync): duration_ns = round(quantity·1e6).
    */
  private def spans(td: Testdata): DataFrame =
    Fixtures.materializedSpans(td.spark, td.dir, "tq") {
      buildSpans(td)
    }

  private def buildSpans(td: Testdata): DataFrame =
    td.lineitem.select(
      col("l_orderkey").as("trace_id"),
      col("l_linenumber").as("span_id"),
      when(col("l_linenumber") > 1, floor(col("l_linenumber") / 2).cast("int"))
        .as("parent_span_id"),
      concat(lit("op-"), col("l_returnflag")).as("name"),
      round(col("l_quantity") * 1e6, 0).cast("long").as("duration_ns"),
      when(col("l_returnflag") === "R", 2).otherwise(0).as("status_code"),
      col("l_returnflag").as("returnflag"),
      col("l_linestatus").as("linestatus"),
      col("l_quantity").as("quantity"),
      (unix_timestamp(col("l_shipdate")) * 1000000000L).as("start_ns")
    )

  private val oracleSpans =
    """SELECT l_orderkey AS trace_id, l_linenumber AS span_id,
      |  CASE WHEN l_linenumber > 1 THEN l_linenumber // 2 END AS parent_span_id,
      |  'op-' || l_returnflag AS name,
      |  CAST(round(l_quantity * 1000000, 0) AS BIGINT) AS duration_ns,
      |  CASE WHEN l_returnflag = 'R' THEN 2 ELSE 0 END AS status_code,
      |  l_returnflag AS returnflag, l_linestatus AS linestatus, l_quantity AS quantity,
      |  CAST(epoch(l_shipdate) AS BIGINT) * 1000000000 AS start_ns
      |FROM lineitem""".stripMargin

  /** `{ duration > 30ms && span.returnflag = "A" }` — span filter +
    * per-operation rollup (reference traceqlengine/spanset_filter.go,
    * evaluater.go:50-669).
    */
  val spanFilter: Q = q(
    "traceql_span_filter",
    s"""WITH spans AS ($oracleSpans)
       |SELECT name, COUNT(*) AS n_spans,
       |  CAST(SUM(duration_ns) AS BIGINT) AS sum_dur_ns
       |FROM spans WHERE duration_ns > 30000000 AND returnflag = 'A'
       |GROUP BY name ORDER BY name""".stripMargin
  ) { td =>
    spans(td)
      .filter(col("duration_ns") > 30000000L && col("returnflag") === "A")
      .groupBy(col("name"))
      .agg(count(lit(1)).as("n_spans"), sum(col("duration_ns")).as("sum_dur_ns"))
      .orderBy("name")
  }

  /** Structural child `{returnflag="R"} > {quantity > 30}` — pair counts
    * per trace via self-join on (trace_id, parent=span)
    * (reference traceqlengine/spanset_op.go:49-88).
    */
  val structuralChild: Q = q(
    "traceql_structural_child",
    s"""WITH spans AS ($oracleSpans)
       |SELECT p.trace_id, COUNT(*) AS n_pairs
       |FROM spans p JOIN spans c
       |  ON c.trace_id = p.trace_id AND c.parent_span_id = p.span_id
       |WHERE p.returnflag = 'R' AND c.quantity > 30
       |GROUP BY p.trace_id ORDER BY p.trace_id""".stripMargin
  ) { td =>
    val s = spans(td)
    val p = s.filter(col("returnflag") === "R")
      .select(col("trace_id"), col("span_id")).alias("p")
    val c = s.filter(col("quantity") > 30)
      .select(col("trace_id"), col("parent_span_id")).alias("c")
    p.join(c, col("c.trace_id") === col("p.trace_id") &&
        col("c.parent_span_id") === col("p.span_id"))
      .groupBy(col("p.trace_id").as("trace_id"))
      .agg(count(lit(1)).as("n_pairs"))
      .orderBy("trace_id")
  }

  /** Structural descendant `{returnflag="R"} >> {quantity > 45}` — via
    * the real ancestor chain derived from parent_span_id (a per-trace
    * window walk, graft.traceql.TraceQL.withAncestors; at 100 TB the
    * same array is written once at ingest). The oracle re-derives
    * ancestry with a recursive CTE, so it is independent of the
    * testdata's span-id numbering (reference spanset_op.go:78-88).
    */
  val structuralDescendant: Q = q(
    "traceql_structural_descendant",
    s"""WITH RECURSIVE spans AS ($oracleSpans),
       |uspans AS (SELECT DISTINCT trace_id, span_id, parent_span_id FROM spans),
       |anc AS (
       |  SELECT trace_id, span_id, parent_span_id AS anc FROM uspans
       |  WHERE parent_span_id IS NOT NULL
       |  UNION ALL
       |  SELECT a.trace_id, a.span_id, u.parent_span_id
       |  FROM anc a JOIN uspans u
       |    ON u.trace_id = a.trace_id AND u.span_id = a.anc
       |  WHERE u.parent_span_id IS NOT NULL)
       |SELECT a2.trace_id, COUNT(*) AS n_pairs
       |FROM spans a2 JOIN (
       |  SELECT c.trace_id, x.anc FROM spans c
       |  JOIN anc x ON x.trace_id = c.trace_id AND x.span_id = c.span_id
       |  WHERE c.quantity > 45) d
       |  ON d.trace_id = a2.trace_id AND d.anc = a2.span_id
       |WHERE a2.returnflag = 'R'
       |GROUP BY a2.trace_id ORDER BY a2.trace_id""".stripMargin
  ) { td =>
    val s = spans(td)
    // physical c rows (duplicates count) with their STORED ancestor
    // chain — exploding the ingest-materialized parent_path column is
    // the whole closure; no self-join, no dedup shuffle
    val c = s.filter(col("quantity") > 45)
      .select(col("trace_id"), explode(col("parent_path")).as("anc")).alias("c")
    val a = s.filter(col("returnflag") === "R")
      .select(col("trace_id"), col("span_id")).alias("a")
    a.join(c, col("a.trace_id") === col("c.trace_id") && col("c.anc") === col("a.span_id"))
      .groupBy(col("a.trace_id").as("trace_id"))
      .agg(count(lit(1)).as("n_pairs"))
      .orderBy("trace_id")
  }

  /** Sibling `{returnflag="R"} ~ {returnflag="A"}` — shared-parent join
    * (reference spanset_op.go sibling relation).
    */
  val structuralSibling: Q = q(
    "traceql_structural_sibling",
    s"""WITH spans AS ($oracleSpans)
       |SELECT s1.trace_id, COUNT(*) AS n_pairs
       |FROM spans s1 JOIN spans s2
       |  ON s1.trace_id = s2.trace_id
       |  AND s1.parent_span_id = s2.parent_span_id
       |  AND s1.span_id <> s2.span_id
       |WHERE s1.returnflag = 'R' AND s2.returnflag = 'A'
       |GROUP BY s1.trace_id ORDER BY s1.trace_id""".stripMargin
  ) { td =>
    val s = spans(td)
    val s1 = s.filter(col("returnflag") === "R")
      .select(col("trace_id"), col("span_id"), col("parent_span_id")).alias("s1")
    val s2 = s.filter(col("returnflag") === "A")
      .select(col("trace_id"), col("span_id"), col("parent_span_id")).alias("s2")
    s1.join(s2, col("s1.trace_id") === col("s2.trace_id") &&
        col("s1.parent_span_id") === col("s2.parent_span_id") &&
        col("s1.span_id") =!= col("s2.span_id"))
      .groupBy(col("s1.trace_id").as("trace_id"))
      .agg(count(lit(1)).as("n_pairs"))
      .orderBy("trace_id")
  }

  /** Spanset aggregate + scalar filter `{ } | count() > 8` plus
    * max(duration) (reference traceqlengine/aggregator.go:10-142,
    * scalar_filter.go).
    */
  val spansetAgg: Q = q(
    "traceql_spanset_agg",
    s"""WITH spans AS ($oracleSpans)
       |SELECT trace_id, COUNT(*) AS n_spans,
       |  MAX(duration_ns) AS max_dur_ns
       |FROM spans GROUP BY trace_id HAVING COUNT(*) > 8
       |ORDER BY n_spans DESC, trace_id LIMIT 50""".stripMargin
  ) { td =>
    spans(td)
      .groupBy(col("trace_id"))
      .agg(count(lit(1)).as("n_spans"), max(col("duration_ns")).as("max_dur_ns"))
      .filter(col("n_spans") > 8)
      .orderBy(col("n_spans").desc, col("trace_id"))
      .limit(50)
  }

  /** Trace-level intrinsics: rootName, traceDuration, span count; sorted
    * by trace start with the reference's default result limit 20
    * (reference traceqlengine/engine.go:128-226).
    */
  val traceExtent: Q = q(
    "traceql_trace_extent",
    s"""WITH spans AS ($oracleSpans)
       |SELECT trace_id,
       |  MIN(CASE WHEN span_id = 1 THEN name END) AS root_name,
       |  MIN(start_ns) AS trace_start_ns,
       |  MAX(start_ns + duration_ns) - MIN(start_ns) AS trace_duration_ns,
       |  COUNT(*) AS n_spans
       |FROM spans GROUP BY trace_id
       |ORDER BY trace_start_ns, trace_id LIMIT 20""".stripMargin
  ) { td =>
    spans(td)
      .groupBy(col("trace_id"))
      .agg(
        min(when(col("span_id") === 1, col("name"))).as("root_name"),
        min(col("start_ns")).as("trace_start_ns"),
        (max(col("start_ns") + col("duration_ns")) - min(col("start_ns")))
          .as("trace_duration_ns"),
        count(lit(1)).as("n_spans"))
      .orderBy(col("trace_start_ns"), col("trace_id"))
      .limit(20)
  }

  /** Tag autocomplete: distinct (tag, value) pairs across scopes
    * (reference querier_traces.go:113-391 SearchTagValues).
    */
  val tagAutocomplete: Q = q(
    "traceql_tag_autocomplete",
    """SELECT tag, value FROM (
      |  SELECT DISTINCT 'returnflag' AS tag, l_returnflag AS value FROM lineitem
      |  UNION ALL
      |  SELECT DISTINCT 'linestatus' AS tag, l_linestatus AS value FROM lineitem)
      |ORDER BY tag, value""".stripMargin
  ) { td =>
    val rf = td.lineitem.select(lit("returnflag").as("tag"), col("l_returnflag").as("value")).distinct()
    val ls = td.lineitem.select(lit("linestatus").as("tag"), col("l_linestatus").as("value")).distinct()
    rf.unionAll(ls).orderBy("tag", "value")
  }

  /** TraceQL metrics `{ status = error } | rate() by (linestatus)` —
    * parity-plus: the reference parses these but returns
    * NotImplemented (tempohandler.go:89-120); on Spark it is the same
    * step machinery as LogQL metrics.
    */
  val traceqlMetricsRate: Q = q(
    "traceql_metrics_rate",
    s"""WITH spans AS ($oracleSpans)
       |SELECT start_ns - start_ns % ${86400L * 1000000000} AS bucket_ns, linestatus,
       |  CAST(COUNT(*) AS DOUBLE) / 86400.0 AS rate
       |FROM spans WHERE status_code = 2
       |GROUP BY 1, 2 ORDER BY bucket_ns, linestatus""".stripMargin
  ) { td =>
    spans(td)
      .filter(col("status_code") === 2)
      .withColumn("bucket_ns", col("start_ns") - col("start_ns") % (86400L * 1000000000))
      .groupBy(col("bucket_ns"), col("linestatus"))
      .agg((count(lit(1)).cast("double") / 86400.0).as("rate"))
      .orderBy("bucket_ns", "linestatus")
  }

  override def queries: Seq[Q] = Seq(
    spanFilter, structuralChild, structuralDescendant, structuralSibling,
    spansetAgg, traceExtent, tagAutocomplete, traceqlMetricsRate
  )
}
