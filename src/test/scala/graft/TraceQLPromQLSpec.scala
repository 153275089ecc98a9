package graft

import org.apache.spark.sql.DataFrame

import graft.promql.PromQL
import graft.traceql.TraceQL

/** Front-end specs for the TraceQL and PromQL parsers + planners. */
class TraceQLPromQLSpec extends SparkTestBase {
  import spark.implicits._

  /** Two traces: t1 = root(1) + children 2,3 (+ grandchild 4→2);
    * t2 = root(1) + child 2.
    */
  private lazy val spans: DataFrame = Seq(
    // trace, span, parent, name, kind, status, dur_ns, start_ns, attrs
    (1L, 1, None, "root-op", 1, 0, 50000000L, 0L, Map("svc" -> "api")),
    (1L, 2, Some(1), "db-query", 2, 0, 40000000L, 1L, Map("svc" -> "db")),
    (1L, 3, Some(1), "cache-get", 2, 2, 5000000L, 2L, Map("svc" -> "cache")),
    (1L, 4, Some(2), "db-retry", 2, 2, 35000000L, 3L, Map("svc" -> "db")),
    (2L, 1, None, "root-op", 1, 0, 9000000L, 0L, Map("svc" -> "api")),
    (2L, 2, Some(1), "cache-get", 2, 0, 1000000L, 1L, Map("svc" -> "cache"))
  ).map { case (t, s, p, n, k, st, d, ts, a) =>
    (t, s, p.map(Int.box).orNull.asInstanceOf[Integer], n, k, st, d, ts, a)
  }.toDF("trace_id", "span_id", "parent_span_id", "name", "kind",
    "status_code", "duration_ns", "start_ns", "attrs")

  test("TraceQL: span filter with intrinsics + attrs + scalar filter") {
    val out = TraceQL.plan("""{ duration > 10ms && svc = "db" } | count() >= 2""", spans)
      .collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(1L)) // only t1 has 2 db spans >10ms
    val none = TraceQL.plan("""{ status = 2 } | count() > 2""", spans).collect()
    assert(none.isEmpty)
  }

  test("TraceQL: structural child / descendant / sibling / negated") {
    def traces(q: String): Seq[Long] =
      TraceQL.plan(q, spans).select("trace_id").as[Long].collect().toSeq

    assert(traces("""{ name = "db-query" } > { name = "db-retry" }""") == Seq(1L))
    assert(traces("""{ name = "root-op" } >> { name = "db-retry" }""") == Seq(1L))
    assert(traces("""{ name = "db-query" } ~ { name = "cache-get" }""") == Seq(1L))
    // negated child: cache-gets that are NOT a child of a root-op → none
    // (both traces' cache-gets hang off the root)
    assert(traces("""{ name = "root-op" } !> { name = "cache-get" }""").isEmpty)
    // parent op: root-ops that are the parent of a cache-get → both traces
    assert(traces("""{ name = "cache-get" } < { name = "root-op" }""") == Seq(1L, 2L))
    // right-side convention (reference childSpans returns b-spans): the
    // result spans are the RIGHT side's matches — t1's root has TWO
    // kind=2 children, t2's root has one
    val children = TraceQL.plan("""{ name = "root-op" } > { kind = 2 }""", spans)
      .select("trace_id", "n_spans").as[(Long, Long)].collect().toSeq
    assert(children == Seq((1L, 2L), (2L, 1L)))
  }

  test("TraceQL: descendant walks the real parent chain on an irregular tree") {
    // span ids deliberately unrelated to tree position (7→3→9→15→6):
    // any id-arithmetic ancestry would fail here, and the chain is 4
    // levels deep — beyond any fixed-hop shortcut
    val irregular = Seq(
      (9L, 7, None, "root"),
      (9L, 3, Some(7), "mid"),
      (9L, 9, Some(3), "mid2"),
      (9L, 15, Some(9), "mid3"),
      (9L, 6, Some(15), "leaf")
    ).map { case (t, s, p, n) =>
      (t, s, p.map(Int.box).orNull.asInstanceOf[Integer], n, 2, 0,
        1000000L, 0L, Map.empty[String, String])
    }.toDF("trace_id", "span_id", "parent_span_id", "name", "kind",
      "status_code", "duration_ns", "start_ns", "attrs")

    def traces(q: String): Seq[Long] =
      TraceQL.plan(q, irregular).select("trace_id").as[Long].collect().toSeq

    assert(traces("""{ name = "root" } >> { name = "leaf" }""") == Seq(9L))
    assert(traces("""{ name = "mid2" } >> { name = "leaf" }""") == Seq(9L))
    assert(traces("""{ name = "leaf" } >> { name = "root" }""").isEmpty)
  }

  test("TraceQL: && merges both sides' spans in traces where both match") {
    // t1 matches both sides: db-query (>20ms AND db) appears once after
    // dedup; cache-get (status=2) joins from the right side
    val out = TraceQL.plan("""{ svc = "db" } && { status = 2 }""", spans)
      .select("trace_id", "n_spans").as[(Long, Long)].collect().toSeq
    // t1: spans {2,4} (db) ∪ {3,4} (status=2) = {2,3,4} → 3 spans
    assert(out == Seq((1L, 3L)))
  }

  test("TraceQL: trace-level intrinsics rootName and traceDuration") {
    // t1 spans 0..38ms (start 3 + dur 35ms); t2 spans 0..9ms
    val long = TraceQL.plan("""{ traceDuration > 20ms }""", spans)
      .select("trace_id").as[Long].collect().toSeq
    assert(long == Seq(1L))
    val byRoot = TraceQL.plan("""{ rootName = "root-op" && name = "cache-get" }""", spans)
      .select("trace_id").as[Long].collect().toSeq
    assert(byRoot == Seq(1L, 2L))
  }

  test("TraceQL: regex matcher and parse errors") {
    val out = TraceQL.plan("""{ name =~ "db-.*" }""", spans).collect()
    assert(out.map(r => (r.getLong(0), r.getLong(1))).toSeq == Seq((1L, 2L)))
    intercept[TraceQL.ParseError](TraceQL.parse("{ name = }"))
    intercept[TraceQL.ParseError](TraceQL.parse("{ duration > 5parsecs }"))
  }

  test("TraceQL metrics compare(): selection/baseline split + topN + validation") {
    val out = TraceQL.planMetrics(
        """{ } | compare({ status = 2 })""", spans, stepNs = 1000000000L)
      .select("meta_type", "attr", "attr_value", "n").collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2), r.getDouble(3)))
    // selection = the two status=2 spans (svc cache + db), baseline = 4
    val sel = out.filter(_._1 == "selection")
    assert(sel.toSet == Set(
      ("selection", "svc", "cache", 1.0), ("selection", "svc", "db", 1.0)))
    val base = out.filter(_._1 == "baseline").map(t => (t._3, t._4)).toSeq.sorted
    assert(base == Seq(("api", 2.0), ("cache", 1.0), ("db", 1.0)))

    // topN=1 keeps only the most frequent value per (group, attr)
    val top1 = TraceQL.planMetrics(
        """{ } | compare({ status = 2 }, 1)""", spans, stepNs = 1000000000L)
      .select("meta_type", "attr_value").collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    assert(top1 == Set(("baseline", "api"), ("selection", "cache")))

    // time-window selection: only start_ns in [3, 4) → just the db-retry
    val windowed = TraceQL.planMetrics(
        """{ } | compare({ status = 2 }, 10, 3, 4)""", spans, stepNs = 1000000000L)
      .filter($"meta_type" === "selection")
      .select("attr_value").collect().map(_.getString(0)).toSeq
    assert(windowed == Seq("db"))

    // validation mirrors the reference (metrics_expr.go:83-95)
    intercept[TraceQL.ParseError](TraceQL.planMetrics(
      """{ } | compare()""", spans, 1000000000L))
    intercept[TraceQL.ParseError](TraceQL.planMetrics(
      """{ } | compare({}, 0)""", spans, 1000000000L))
    intercept[TraceQL.ParseError](TraceQL.planMetrics(
      """{ } | compare({}, 1001)""", spans, 1000000000L))
    intercept[TraceQL.ParseError](TraceQL.planMetrics(
      """{ } | compare({}, 10, 1000)""", spans, 1000000000L)) // 3-arg form
    intercept[TraceQL.ParseError](TraceQL.planMetrics(
      """{ } | compare({}, 10, 2000, 1000)""", spans, 1000000000L))
  }

  test("TraceQL compare(): attr-count rollup path matches the exploded path") {
    val grain = 1000000000L
    val cube = TraceQL.AttrCube(
      TraceQL.compareAttrCounts(spans, Seq("name", "kind", "status_code"),
        grainNs = grain), grain)
    def run(q: String, c: Option[TraceQL.AttrCube]): Set[(Long, String, String, String, Double)] =
      TraceQL.planMetrics(q, spans, stepNs = grain, cube = c)
        .select("bucket_ns", "meta_type", "attr", "attr_value", "n")
        .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2),
          r.getString(3), r.getDouble(4))).toSet

    // covered: intrinsic filter + empty outer → cube route, same rows
    val q1 = """{ } | compare({ status = 2 })"""
    assert(run(q1, Some(cube)) == run(q1, None))
    // (PlanSpec pins that a PARQUET-backed cube plans no explode and
    // never scans the spans table — here the cube is an inline local
    // frame, so its own builder explode is visible in the plan)
    // covered: outer restricted on a cube dim
    val q2 = """{ name = "db-query" } | compare({ status = 2 }, 1)"""
    assert(run(q2, Some(cube)) == run(q2, None))
    // NOT covered (attr-map filter) → falls back, still correct
    val q3 = """{ } | compare({ svc = "db" })"""
    assert(run(q3, Some(cube)) == run(q3, None))
    // NOT covered (window not grain-aligned) → falls back, still correct
    val q4 = """{ } | compare({ status = 2 }, 10, 3, 4)"""
    assert(run(q4, Some(cube)) == run(q4, None))
  }

  private val M = 60L * 1000000L // 1 min in µs

  /** counter-ish series: two streams of the same metric. */
  private lazy val points: DataFrame = {
    val rows = for {
      svc <- Seq("a", "b")
      i <- 0 until 10
    } yield {
      val v = if (svc == "a") i.toDouble else (i % 4).toDouble // b resets
      (i * M, "reqs", v, Map("svc" -> svc))
    }
    rows.toDF("ts_us", "name", "value", "labels")
  }

  test("PromQL: instant selector with lookback") {
    val out = PromQL.instant("""reqs{svc="a"}""", points, evalTsUs = 5 * M + 1,
      lookbackUs = 2 * M)
    val rows = out.collect()
    assert(rows.length == 1)
    assert(rows.head.getAs[Double]("value") == 5.0)
    // outside lookback → empty
    assert(PromQL.instant("""reqs{svc="a"}""", points, evalTsUs = 100 * M,
      lookbackUs = M).collect().isEmpty)
  }

  test("PromQL: sum by over count_over_time and scalar binop") {
    val out = PromQL.range("""sum by (svc) (count_over_time(reqs[5m])) * 2""", points)
      .orderBy($"bucket_us", $"labels.svc")
      .select($"labels.svc", $"value").as[(String, Double)].collect()
    // 5-minute buckets: 2 buckets × 2 svcs × 5 samples = value 10 each
    assert(out.length == 4)
    assert(out.forall(_._2 == 10.0))
  }

  test("PromQL: rate handles counter resets via correction") {
    val out = PromQL.range("""increase(reqs[10m])""", points)
      .orderBy($"labels.svc")
      .select($"labels.svc", $"value").as[(String, Double)].collect()
    assert(out.length == 2)
    val bySvc = out.toMap
    // extrapolation factor: sampled 540s, one 60s tail inside threshold
    // → ×600/540. a: raw increase 9; b: 7 increments through two resets.
    assert(math.abs(bySvc("a") - 9.0 * 600 / 540) < 1e-9)
    assert(math.abs(bySvc("b") - 7.0 * 600 / 540) < 1e-9)
  }

  test("PromQL: irate skips zero-interval sample pairs") {
    // svc=dup: the two newest samples share a timestamp → dt == 0 → no
    // point (upstream funcIrate skips when lastSample.T == prevSample.T);
    // svc=ok still yields 1/60s from its last two samples
    val dup = Seq(
      (0L, "reqs", 1.0, Map("svc" -> "dup")),
      (5 * M, "reqs", 2.0, Map("svc" -> "dup")),
      (5 * M, "reqs", 3.0, Map("svc" -> "dup")),
      (4 * M, "reqs", 1.0, Map("svc" -> "ok")),
      (5 * M, "reqs", 2.0, Map("svc" -> "ok"))
    ).toDF("ts_us", "name", "value", "labels")
    val out = PromQL.range("""irate(reqs[10m])""", dup)
      .select($"labels.svc", $"value").as[(String, Double)].collect().toMap
    assert(!out.contains("dup"))
    assert(math.abs(out("ok") - 1.0 / 60) < 1e-12)
  }

  test("PromQL: topk keeps input series labels") {
    val out = PromQL.range("""topk(1, sum by (svc) (count_over_time(reqs[5m])))""", points)
      .collect()
    assert(out.length == 2) // one winner per bucket
    assert(out.forall(!_.isNullAt(1)))
  }

  test("PromQL: approx_quantile_over_time is the discrete-sketch twin") {
    // svc=a holds 0..9 in the single 10m window: the exact variant
    // rank-interpolates (4.5); the mergeable-sketch variant answers
    // with an actual sample at the discrete rank (4.0)
    def one(q: String): Double =
      PromQL.range(q, points).filter($"labels.svc" === "a")
        .select($"value").as[Double].collect().head
    assert(one("""quantile_over_time(0.5, reqs[10m])""") == 4.5)
    assert(one("""approx_quantile_over_time(0.5, reqs[10m])""") == 4.0)
    // out-of-range phi keeps the upstream warn-and-yield-infinity shape
    assert(one("""approx_quantile_over_time(1.5, reqs[10m])""").isPosInfinity)
  }

  test("PromQL: @ start() / @ end() resolve to the query range bounds") {
    // pinned at end: newest a-sample <= 9*M is 9.0, repeated on the grid
    val out = PromQL.range("""reqs{svc="a"} @ end()""", points,
        atRange = Some((0L, 9 * M)))
      .filter($"labels.svc" === "a")
      .select($"value").distinct().as[Double].collect()
    assert(out.toSeq == Seq(9.0))
    // instant query: both forms pin to the eval timestamp
    val inst = PromQL.instant("""reqs{svc="a"} @ start()""", points, 5 * M)
      .select($"value").as[Double].collect()
    assert(inst.toSeq == Seq(5.0))
    // without a known range the sentinel is a query error, not a
    // silent mis-evaluation
    intercept[PromQL.ParseError] {
      PromQL.range("""reqs @ start()""", points)
    }
  }
}
