package graft

import org.apache.spark.sql.execution.ExplainMode

import graft.queries.Registry

/** Physical-plan assertions: the properties that make these queries
  * scale-correct must survive refactors — filters/projections reaching
  * the parquet scan, dimension joins broadcasting, no cartesian
  * products, custom expressions staying inside whole-stage codegen.
  */
class PlanSpec extends SparkTestBase {

  private val sf = "/root/testdata/sf0.001"

  private def planOf(name: String): String = {
    val df = Registry.byName(name).run(spark, sf)
    df.queryExecution.explainString(ExplainMode.fromString("formatted"))
  }

  /** Final (post-AQE) physical plan, materialized by running the query;
    * whole-stage-codegen stages appear as `*(n)` node prefixes.
    */
  private def finalPlanOf(name: String): String = {
    val df = Registry.byName(name).run(spark, sf)
    df.collect()
    df.queryExecution.executedPlan.toString
  }

  test("scan+filter+limit pushes predicates into the parquet scan") {
    val p = planOf("src_scan_filter_limit")
    assert(p.contains("PushedFilters"), s"no pushed filters in:\n$p")
    assert(p.contains("EqualTo(event_type,error)"), "event_type filter not pushed")
    assert(p.contains("GreaterThan(value,100"), "value filter not pushed")
    // column pruning: props is not referenced and must not be read
    assert(!p.contains("props"), "props column should be pruned from the scan")
  }

  test("bare-vector range query: one fan-out scan, one aggregation, no join") {
    val p = planOf("promql_range_bare_vector")
    assert(!p.contains("Join"), s"per-step lookback must not join:\n$p")
    assert(!p.contains("CartesianProduct"))
    // the bounded sample fan-out is a generator, then ONE aggregation
    // keyed (series, step) keeps the newest sample
    assert(p.contains("Generate"), s"expected the step fan-out explode in:\n$p")
    assert(p.contains("HashAggregate") || p.contains("SortAggregate"),
      s"expected the newest-per-(series,step) aggregation in:\n$p")
  }

  test("instant expression evaluation keeps the lookback filter on the scan") {
    val p = planOf("promql_instant_vector_agg")
    // the (t-5m, t] bound must reach the source, not a post-filter
    assert(p.contains("PushedFilters") || p.contains("Filter"),
      s"lookback window filter missing:\n$p")
    assert(!p.contains("CartesianProduct"))
  }

  test("dimension join broadcasts the small side") {
    val p = planOf("src_broadcast_dim_join")
    assert(p.contains("BroadcastHashJoin"), s"expected broadcast join in:\n$p")
  }

  test("candidate semi-join compiles to a real semi join") {
    val p = planOf("src_semijoin_trace_spans")
    assert(p.contains("LeftSemi"), s"expected left-semi join in:\n$p")
    assert(!p.contains("CartesianProduct"))
  }

  test("group_left vector matching broadcasts the one side") {
    val p = planOf("promql_group_left")
    assert(p.contains("BroadcastHashJoin"), s"expected broadcast join in:\n$p")
  }

  test("distributive vector agg over a range agg fuses to ONE aggregation") {
    // `sum by (svc)(count_over_time(m[r]))`: summing per-series integral
    // counts over a label-partition refinement equals counting per
    // coarse group, so both planners group samples directly on the
    // vector grouping — the per-series aggregation, its Exchange and
    // its AQE job disappear (r20). One partial+final pair, one hash
    // exchange; the remaining exchange is the output sort.
    // node headers `(n) HashAggregate` count each operator once (the
    // formatted dump also repeats names in the tree sketch)
    def nodes(p: String, name: String): Int =
      s"""\\(\\d+\\) $name""".r.findAllIn(p).size
    Seq("promql_e2e_sum_count", "logql_e2e_rate").foreach { name =>
      val p = planOf(name)
      val aggs = nodes(p, "HashAggregate")
      assert(aggs == 2, s"$name: expected one partial+final pair, got $aggs:\n$p")
      assert(!p.contains("SortAggregate"), s"$name demoted to SortAggregate:\n$p")
      val hashEx = "Arguments: hashpartitioning".r.findAllIn(p).size
      assert(hashEx == 1, s"$name: expected one hash exchange, got $hashEx:\n$p")
    }
    // the ranked wrapper rides the same fused inner: agg pair + window,
    // nothing else aggregates
    val topk = planOf("logql_e2e_topk")
    assert(nodes(topk, "HashAggregate") == 2,
      s"topk inner must stay one fused aggregation pair:\n$topk")
    assert(!topk.contains("SortAggregate"))
  }

  test("PARSED shared-operand group_left fuses to a window — no join at all") {
    // `sum by (a,b)(X) / on(b) group_left sum by (b)(X)`: the one side
    // is the many side's own (bucket, on-keys) sum, so the planner
    // evaluates the binop as ONE window aggregate over the fine frame
    // (VectorMatching.binSelfGrouped) — the second aggregation, the
    // broadcast build and the join disappear (r19)
    val p = planOf("logql_e2e_group_left")
    assert(p.contains("Window"),
      s"shared-operand group_left must fuse to a window aggregate:\n$p")
    assert(!p.contains("Join"),
      s"fused group_left must not build a join:\n$p")
  }

  test("sliding step fan-out adds no shuffle beyond the aggregations") {
    val p = planOf("logql_rate_sliding")
    // explode(sequence) is a generator in the scan pipeline — the only
    // exchanges are the two aggregation shuffles (range agg + sum by)
    // plus AQE reads; no fan-out-induced repartition
    val exchanges = p.linesIterator.count(_.trim.startsWith("Exchange"))
    assert(exchanges <= 2, s"expected <=2 exchanges, got $exchanges:\n$p")
    assert(p.contains("Generate"), "fan-out should be a Generate (explode)")
  }

  test("IVF probe broadcasts centroids and the single-list filter") {
    val p = planOf("pipe_ann_ivf")
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastNestedLoopJoin"),
      s"centroid assignment must broadcast:\n$p")
    assert(!p.contains("CartesianProduct"), "no unbroadcast cartesian allowed")
  }

  test("native expressions run inside whole-stage codegen") {
    val p = finalPlanOf("logql_ip_filter")
    // the Filter carrying ip_match must be inside a codegen stage (*(n) prefix)
    val line = p.linesIterator.find(l => l.contains("graft_ip_match") && l.contains("Filter"))
    assert(line.isDefined, s"ip_match filter missing in:\n$p")
    assert(line.get.trim.matches("""[+:\-\s]*\*\(\d+\).*"""),
      s"ip_match filter not in a codegen stage: ${line.get}")
  }

  test("unwrap pipeline keeps parse_duration in codegen and prunes columns") {
    val p = planOf("logql_unwrap_duration")
    assert(p.contains("graft_parse_duration"))
    assert(!p.contains("props"), "unused body column should be pruned")
    val f = finalPlanOf("logql_unwrap_duration")
    val line = f.linesIterator.find(l => l.contains("graft_parse_duration") && l.contains("Project"))
    assert(line.isDefined, s"parse_duration projection missing in:\n$f")
    assert(line.get.trim.matches("""[+:\-\s]*\*\(\d+\).*"""),
      s"parse_duration not in a codegen stage: ${line.get}")
  }

  test("structural join has no cartesian product") {
    val p = planOf("traceql_structural_child")
    assert(!p.contains("CartesianProduct"), s"cartesian in:\n$p")
    assert(p.contains("Join") || p.contains("BroadcastHashJoin") || p.contains("SortMergeJoin"))
  }

  test("stratified sampling is one scan, one aggregation, no join") {
    val p = planOf("pipe_sample_stratified")
    // formatted output lists each node once in the tree and once in the
    // details, so count the numbered detail entries
    assert("""\(\d+\) Scan parquet""".r.findAllIn(p).length == 1,
      s"expected single scan:\n$p")
    assert(!p.contains("Join"), s"sampling must not join:\n$p")
  }

  test("curation funnel: digest semi-join + broadcast totals, no cartesian") {
    val p = planOf("pipe_curation_funnel")
    assert(p.contains("LeftSemi"), s"dedup keep-list must semi-join:\n$p")
    assert(p.contains("BroadcastHashJoin"), s"totals must broadcast:\n$p")
    assert(!p.contains("CartesianProduct"))
  }

  test("as-of join is union + one window sort, never a range join") {
    val p = planOf("src_asof_join")
    // the probe×build range-join formulation would appear as a Join
    // (worst case CartesianProduct); the union-window shape has neither
    assert(!p.contains("Join"), s"as-of must not plan a join:\n$p")
    assert(!p.contains("CartesianProduct"))
    assert(p.contains("Window"), s"expected the running last_value window:\n$p")
    // exactly one exchange moves data: the (user_id) partition for the
    // window (the final orderBy adds a range exchange for presentation)
    val exchanges = """\(\d+\) Exchange""".r.findAllIn(p).length
    assert(exchanges <= 2, s"expected ≤2 exchanges (window + order), got $exchanges:\n$p")
  }

  test("sessionize stacks both windows and the session agg on one sort") {
    val p = planOf("src_sessionize")
    assert(!p.contains("Join"), s"sessionize must not join:\n$p")
    // lag + running sum share the (user_id, ts) sort: one hash exchange
    // (formatted output puts the partitioning on the Arguments line)
    val exchanges = "Arguments: hashpartitioning".r.findAllIn(p).length
    assert(exchanges == 1,
      s"lag/cumsum windows must share ONE hash exchange, got $exchanges:\n$p")
  }

  test("sequence packing is one per-source prefix window, no join") {
    val p = planOf("pipe_pack_sequences")
    assert(!p.contains("Join"), s"packing must not join:\n$p")
    val exchanges = "Arguments: hashpartitioning".r.findAllIn(p).length
    assert(exchanges == 1,
      s"prefix sum must ride ONE hash exchange, got $exchanges:\n$p")
  }

  test("RAG chunking is a pure per-row explode: no join, no hash shuffle") {
    val p = planOf("pipe_chunk_overlap")
    assert(!p.contains("Join"), s"chunking must not join:\n$p")
    assert(p.contains("Generate"), "chunk fan-out should be a Generate (explode)")
    // only the presentation orderBy may exchange (range partitioning);
    // the chunk computation itself is shuffle-free
    val hashEx = "Arguments: hashpartitioning".r.findAllIn(p).length
    assert(hashEx == 0, s"chunking must not hash-shuffle, got $hashEx:\n$p")
  }

  test("semantic dedup broadcasts centroids and never goes all-pairs") {
    val p = planOf("pipe_semdedup")
    assert(!p.contains("CartesianProduct"),
      s"pair space must be cluster-bounded, not cartesian:\n$p")
    // the k=8 centroid table rides a broadcast; the pair self-join is an
    // equi-join keyed on the cluster id
    assert(p.contains("Broadcast"), s"centroid assignment must broadcast:\n$p")
  }

  test("substring duplication is one gram-keyed aggregation, no join") {
    val p = planOf("pipe_substring_dup")
    assert(!p.contains("Join"), s"gram rollup must not join:\n$p")
    assert(p.contains("Generate"), "sliding grams should be a Generate (explode)")
  }

  test("window funnel rides (user, ts) sorts and equi-joins, never a range join") {
    val p = planOf("src_window_funnel")
    assert(!p.contains("CartesianProduct"),
      s"funnel must not plan a per-user cross product:\n$p")
    assert(!p.contains("BroadcastNestedLoopJoin"),
      s"the click hop must be an equi-join:\n$p")
    assert(p.contains("Window"), s"expected min-over-following windows:\n$p")
  }

  test("retention is two aggregations, no join") {
    val p = planOf("src_retention")
    assert(!p.contains("Join"), s"retention must not join:\n$p")
    val hashEx = "Arguments: hashpartitioning".r.findAllIn(p).length
    assert(hashEx == 1,
      s"flag rollup must ride ONE hash exchange, got $hashEx:\n$p")
  }

  test("DSIR weights broadcast the bucket model; the corpus never shuffles rows") {
    val p = planOf("pipe_dsir_weights")
    assert(p.contains("BroadcastHashJoin"),
      s"the 128-bucket ratio model must broadcast:\n$p")
    // the only hash exchanges are aggregation exchanges (histogram +
    // per-doc weight rollup) — no document-sized sort-merge join side
    assert(!p.contains("SortMergeJoin"), s"corpus-sized join side:\n$p")
  }

  test("source overlap rolls up per-gram source sets — no gram self-join") {
    val p = planOf("pipe_source_overlap")
    // a gram-keyed self-join would square the hot stop-grams; the set
    // rollup caps each gram at one row and both per-source totals come
    // from ONE broadcast source→n map row (r20; was two aliased
    // broadcast hash joins, a build job each)
    assert(!p.contains("SortMergeJoin"), s"gram-sized join side:\n$p")
    assert(!p.contains("CartesianProduct"))
    assert(p.contains("BroadcastNestedLoopJoin"),
      s"the totals map must attach as one broadcast row:\n$p")
  }

  test("source-overlap sketch: one corpus scan, no signature self-join") {
    val p = planOf("pipe_source_overlap_sketch")
    // all K minhashes ride ONE aggregation over one gram explode; the
    // (seed, m) bucket rollup replaces any signature self-join
    assert("""\(\d+\) Scan parquet""".r.findAllIn(p).length == 1,
      s"expected a single corpus scan:\n$p")
    assert(!p.contains("Join"), s"sketch must not join:\n$p")
  }

  test("vocab stats are two stacked aggregations, no join") {
    val p = planOf("pipe_vocab_stats")
    assert(!p.contains("Join"), s"vocab stats must not join:\n$p")
    // (source, token) exchange + the source rollup — nothing wider
    // than the vocabulary shuffles, and no count_distinct Expand
    assert(!p.contains("Expand"), s"count_distinct expand crept in:\n$p")
    val hashEx = "Arguments: hashpartitioning".r.findAllIn(p).length
    assert(hashEx == 2,
      s"expected (source,token) + source exchanges, got $hashEx:\n$p")
  }

  test("quantized dot product is one projection after an equi-join") {
    val p = planOf("pipe_embed_quantize")
    assert(!p.contains("CartesianProduct"))
    // higher-order functions (aggregate/zip_with) run interpreted —
    // outside whole-stage codegen by Spark design — but the whole fold
    // must still be ONE narrow Project over the join, not a UDF or an
    // extra shuffle
    val f = finalPlanOf("pipe_embed_quantize")
    val line = f.linesIterator.find(l => l.contains("aggregate(zip_with") &&
      l.contains("Project"))
    assert(line.isDefined, s"quantized-dot projection missing in:\n$f")
    assert(!f.contains("BatchEvalPython") && !f.contains("ScalaUDF"))
  }

  test("pattern mining is one scan, one template-keyed rollup, no join") {
    val p = planOf("logql_pattern_mining")
    assert("""\(\d+\) Scan parquet""".r.findAllIn(p).length == 1,
      s"expected single scan:\n$p")
    assert(!p.contains("Join"), s"pattern mining must not join:\n$p")
    // the masking regexp chain must fuse into codegen on the scan side
    // (a UDF here would break whole-stage codegen over the corpus scan)
    assert(!p.contains("ScalaUDF"))
    val hashEx = "Arguments: hashpartitioning".r.findAllIn(p).length
    assert(hashEx == 1,
      s"template rollup must ride ONE hash exchange, got $hashEx:\n$p")
  }

  test("BPE pairs: vocabulary rollup before the pair explode, no join") {
    val p = planOf("pipe_bpe_pairs")
    assert(!p.contains("Join"), s"pair counting must not join:\n$p")
    // two hash exchanges: word rollup, then pair rollup — the explode
    // must sit BETWEEN them (over the vocabulary, not the corpus)
    val hashEx = "Arguments: hashpartitioning".r.findAllIn(p).length
    assert(hashEx == 2,
      s"expected exactly word + pair exchanges, got $hashEx:\n$p")
    assert(p.contains("Generate"), s"expected the pair explode:\n$p")
  }

  test("alert state machine: broadcast densify, one window pass, no sort-merge") {
    val p = planOf("promql_alert_firing")
    // grid × series densify must broadcast the tiny series side
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"),
      s"series set must broadcast into the grid:\n$p")
    assert(!p.contains("SortMergeJoin"), s"nothing here warrants a shuffle join:\n$p")
    assert(p.contains("Window"), s"expected the run-state window:\n$p")
  }

  test("hard negatives broadcast the query set; band filter precedes the rank") {
    val p = planOf("pipe_hard_negatives")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"),
      s"query set must broadcast:\n$p")
    assert(!p.contains("CartesianProduct"),
      s"corpus x queries must never plan a cartesian:\n$p")
    assert(!p.contains("SortMergeJoin"),
      s"corpus must not shuffle for the join:\n$p")
  }

  test("native-histogram expansion is gated: plain-metric query plans ONE scan") {
    // a points frame carrying the exp-histogram decomposition columns,
    // holding BOTH a plain metric (ev) and a native histogram (nh)
    val df = spark.sql(
      """SELECT * FROM VALUES
        |  (1000000L, 'ev', map('svc','1'), 1.0,
        |   CAST(NULL AS INT), CAST(NULL AS INT), CAST(NULL AS INT)),
        |  (2000000L, 'ev', map('svc','1'), 3.0,
        |   CAST(NULL AS INT), CAST(NULL AS INT), CAST(NULL AS INT)),
        |  (1000000L, 'nh', map('svc','1'), 5.0, 11, 3, 0),
        |  (1000000L, 'nh', map('svc','1'), 9.5, 12, CAST(NULL AS INT), 0)
        |AS t(ts_us, name, labels, value, mapping, bucket_idx, scale)"""
        .stripMargin)
    // a query whose selectors all pin PLAIN metric names must bypass
    // the 4-branch bucket expansion: one source scan, no union
    val plain = graft.promql.PromQL
      .range("rate(ev[1h])", df).queryExecution.optimizedPlan.toString
    assert(!plain.contains("Union"),
      s"plain-metric query must not plan the expansion union:\n$plain")
    assert("LocalRelation".r.findAllIn(plain).size <= 1,
      s"plain-metric query must scan the source once:\n$plain")
    // a query over the histogram metric still expands (>1 branch).
    // Checked on the ANALYZED plan: the gate decides at planning time,
    // and over this test's literal 4-row source the optimizer now
    // constant-folds statically-empty expansion branches away (r19:
    // the aggregations no longer reference the labels column — labels
    // rebuild from the __stream key — so pruned branches fold to
    // LocalRelation); a parquet-backed source keeps the union.
    val hist = graft.promql.PromQL
      .range("histogram_count(sum_over_time(nh[1d]))", df)
      .queryExecution.analyzed.toString
    assert(hist.contains("Union"),
      s"histogram query must plan the bucket expansion:\n$hist")
    // an indeterminate (name-less) selector could match nh → must expand
    val anon = graft.promql.PromQL
      .range("""count_over_time({svc="1"}[1h])""", df)
      .queryExecution.analyzed.toString
    assert(anon.contains("Union"),
      s"name-less selector must expand conservatively:\n$anon")
  }

  test("tier-aware instant: a 1-day avg_over_time scans ONLY the stored 6h tier") {
    val p = planOf("pushdown_tier_instant")
    assert(p.contains("rt6h"),
      s"instant must read the materialized 6h tier:\n$p")
    assert(!p.contains("rt1h"),
      s"coarsest-sufficient selection must skip the 1h tier:\n$p")
    assert(!p.contains("events"),
      s"tier-served instant must not scan raw samples:\n$p")
  }

  test("tier-aware range: a 7-day grid of 1-day windows scans ONLY the stored 6h tier") {
    val p = planOf("pushdown_tier_range")
    assert(p.contains("rt6h"),
      s"range grid must read the materialized 6h tier:\n$p")
    assert(!p.contains("rt1h"),
      s"coarsest-sufficient selection must skip the 1h tier:\n$p")
    assert(!p.contains("events"),
      s"tier-served range query must not scan raw samples:\n$p")
  }

  test("log-volume offload: sum by(count_over_time) scans ONLY the volume sidecar") {
    val p = planOf("pushdown_logvol_range")
    assert(p.contains("lv1h"),
      s"volume grid must read the materialized sidecar:\n$p")
    assert(!p.contains("events"),
      s"volume-served range query must not scan a log line:\n$p")
    val pi = planOf("pushdown_logvol_bytes_rate")
    assert(pi.contains("lv1h") && !pi.contains("events"),
      s"volume-served instant must not scan a log line:\n$pi")
  }

  test("group_left binop: shared-operand form plans the fine subtree ONCE") {
    // r19 window fusion: the coarse operand IS the fine operand's
    // (bucket, on-keys) sum, so the binop is one window aggregate over
    // the fine frame — the shared subtree exists once in the PLAN
    // (stronger than the old runtime ReusedExchange dedup of two
    // aggregations), and no join is built — pinned for BOTH planners
    // (LogQL selfGroupedBin, PromQL's shared-operand Bin case)
    for (q <- Seq("logql_e2e_group_left", "promql_e2e_group_left")) {
      val p = finalPlanOf(q)
      assert(p.contains("Window"),
        s"$q: shared-operand group_left must fuse to a window aggregate:\n$p")
      assert(!p.contains("Join"),
        s"$q: fused group_left must not build a join:\n$p")
      val scans = p.linesIterator.count(_.trim.startsWith("Scan parquet"))
      assert(scans <= 1,
        s"$q: the fine subtree must exist once in the plan ($scans scans):\n$p")
    }
  }

  test("compare() scans the ingest-materialized attr-count rollup, not spans") {
    val p = planOf("traceql_metrics_compare")
    // the cube fixture path is the only scan; no explode (Generate) of
    // the attrs maps and no lineitem/spans read in the per-query plan
    assert(p.contains("grcube"),
      s"compare() must read the materialized attr-count cube:\n$p")
    assert(!p.contains("Generate"),
      s"compare() must not explode attr maps per query:\n$p")
    assert(!p.contains("lineitem") && !p.toLowerCase.contains("g_spans") &&
      !p.contains("_gr_"), s"compare() must not scan the spans table:\n$p")
    val pw = planOf("traceql_metrics_compare_window")
    assert(pw.contains("grcube") && !pw.contains("Generate"),
      s"windowed compare() must also ride the rollup:\n$pw")
  }

  test("embedding stats: map-side-combinable dim rollup, no join") {
    val p = planOf("pipe_embed_stats")
    assert(!p.contains("Join"), s"embed stats must not join:\n$p")
    // the (vector x dim) explode collapses to D partial rows per
    // partition BEFORE the exchange (partial_count/partial_sum under
    // the Generate) — the exchange carries partitions x D rows, never
    // the exploded component stream
    assert(p.contains("partial_"), s"partial agg must precede the exchange:\n$p")
  }

  test("CDC chunker is in-row: no Window pass, no cartesian") {
    val p = planOf("pipe_cdc_dedup")
    // boundaries are a function of the row's own token array (filter/
    // slice higher-order exprs), so chunking must never need a
    // per-position window sort — the document-order Window operator
    // the oracle's cumulative-sum formulation would imply
    assert(!p.contains("Window"), s"per-position window crept in:\n$p")
    assert(!p.contains("CartesianProduct"))
  }
}
