package graft

import org.apache.spark.sql.functions._

import graft.sources.RollupTiers

/** Tier selection rules + exactness of the chained stat rollup — the
  * read-planning contract behind `pushdown_rollup_tier_select`.
  */
class RollupTiersSpec extends SparkTestBase {

  private val H = 3600000000000L // 1h in ns
  private val tiers = Seq(H, 6 * H)

  test("select picks the coarsest tier that tiles the window") {
    assert(RollupTiers.select(tiers, 24 * H, "avg").contains(6 * H))
    assert(RollupTiers.select(tiers, 6 * H, "count").contains(6 * H))
    assert(RollupTiers.select(tiers, 3 * H, "sum").contains(H))
    assert(RollupTiers.select(tiers, 2 * H, "min").contains(H))
  }

  test("select falls back to raw when no tier tiles the window") {
    // 90 minutes: neither 1h nor 6h divides it
    assert(RollupTiers.select(tiers, H + H / 2, "avg").isEmpty)
    // window smaller than the finest tier
    assert(RollupTiers.select(tiers, H / 2, "count").isEmpty)
  }

  test("select refuses aggregations stat tiers cannot serve") {
    assert(RollupTiers.select(tiers, 24 * H, "quantile").isEmpty)
    assert(RollupTiers.select(tiers, 24 * H, "last").isEmpty)
  }

  test("raw -> 1h -> 6h -> window chain is exact vs direct aggregation") {
    import spark.implicits._
    // values with 2-decimal cents exercise the decimal sum path;
    // timestamps straddle hour and 6h boundaries
    val raw = Seq(
      ("a", 0L, 1.25), ("a", H / 2, 2.50), ("a", H, 4.75),
      ("a", 7 * H, 100.01), ("b", 0L, 9.99), ("b", 11 * H, 0.01))
      .toDF("k", "ts", "value")
    val hourly = RollupTiers.rollup(raw, Seq("k"), "ts", "value", H)
    val sixly = RollupTiers.reRollup(hourly, Seq("k"), "ts", 6 * H)
    val day = RollupTiers.readAgg(sixly, Seq("k"), "ts", 12 * H, "avg")
      .orderBy("k")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    val direct = raw.groupBy("k")
      .agg((sum(col("value").cast("decimal(18,4)")).cast("double") /
        count(lit(1))).as("v"))
      .orderBy("k")
      .collect().map(r => (r.getString(0), 0L, r.getDouble(1)))
    assert(day.toSeq == direct.toSeq)
    // count/sum/min/max off the same tier
    val stats = RollupTiers.readAgg(sixly, Seq("k"), "ts", 12 * H, "count")
      .orderBy("k").collect().map(r => (r.getString(0), r.getDouble(2)))
    assert(stats.toSeq == Seq(("a", 4.0), ("b", 2.0)))
    val mx = RollupTiers.readAgg(sixly, Seq("k"), "ts", 12 * H, "max")
      .orderBy("k").collect().map(r => (r.getString(0), r.getDouble(2)))
    assert(mx.toSeq == Seq(("a", 100.01), ("b", 9.99)))
  }

  test("PromQL tier-read instant equals the raw path; window boundaries exact") {
    import spark.implicits._
    import graft.promql.PromQL
    val HU = 3600000000L // 1h in µs
    val t = 600L * HU // aligned to both tiers
    val pts = Seq(
      (t - 2 * HU, 10.0), // exactly at t-range: EXCLUDED from (t-2h, t]
      (t - 2 * HU + 1, 2.0),
      (t - HU + 5, 4.0),
      (t, 6.0) // exactly at t: INCLUDED
    ).map { case (ts, v) => ("m", Map("s" -> "1"), ts, v) }
      .toDF("name", "labels", "ts_us", "value")
    val tiers = PromQL.statTierChain(pts, Seq(HU, 6 * HU))
    def vals(df: org.apache.spark.sql.DataFrame): Seq[Double] =
      df.select("value").as[Double].collect().toSeq
    val viaTier = vals(PromQL.instantWithTiers("avg_over_time(m[2h])", pts, t, tiers))
    assert(viaTier == Seq(4.0)) // (2+4+6)/3: boundary semantics exact
    assert(vals(PromQL.instant("avg_over_time(m[2h])", pts, t)) == viaTier)
    // min/count ride the same stats
    assert(vals(PromQL.instantWithTiers("min_over_time(m[2h])", pts, t, tiers)) == Seq(2.0))
    assert(vals(PromQL.instantWithTiers("count_over_time(m[12h])", pts, t, tiers)) == Seq(4.0))
    // a window no tier tiles (90m) falls back to raw, same answer
    val fb = vals(PromQL.instantWithTiers("sum_over_time(m[90m])", pts, t, tiers))
    assert(fb == vals(PromQL.instant("sum_over_time(m[90m])", pts, t)))
    // unaligned eval time falls back rather than serving a shifted window
    val off = vals(PromQL.instantWithTiers("sum_over_time(m[2h])", pts, t + 7, tiers))
    assert(off == vals(PromQL.instant("sum_over_time(m[2h])", pts, t + 7)))
    // an eval time aligned to a FINER tier only (t+2h ≡ 0 mod 1h but
    // not mod 6h over a 12h window) serves from the 1h tier, not raw
    // (avg keeps the decimal sum column visible in the tier plan)
    val t2 = t + 2 * HU
    val fineDf = PromQL.instantWithTiers("avg_over_time(m[12h])", pts, t2, tiers)
    assert(fineDf.queryExecution.optimizedPlan.toString.contains("sum_dec"),
      "finer aligned tier must serve instead of falling back to raw")
    assert(vals(fineDf) == vals(PromQL.instant("avg_over_time(m[12h])", pts, t2)))
  }

  test("PromQL tier-read RANGE grid equals the raw sliding path; misalignment falls back") {
    import spark.implicits._
    import graft.promql.PromQL
    val HU = 3600000000L // 1h in µs
    val t0 = 600L * HU
    val pts = Seq(
      (t0 - 2 * HU, 10.0), (t0 - 2 * HU + 1, 2.0), (t0 - HU + 5, 4.0),
      (t0, 6.0), (t0 + HU + 1, 8.0), (t0 + 3 * HU, 12.0),
      (t0 + 5 * HU + 2, 1.0)
    ).map { case (ts, v) => ("m", Map("s" -> "1"), ts, v) }
      .toDF("name", "labels", "ts_us", "value")
    val tiers = PromQL.statTierChain(pts, Seq(HU, 6 * HU))
    def grid(df: org.apache.spark.sql.DataFrame): Seq[(Long, Double)] =
      df.select("ts_us", "value").as[(Long, Double)].collect().toSeq.sorted
    // 2h windows on a 1h-step grid over 6 hours: every edge is a 1h
    // bucket edge, so the whole grid reads the 1h tier
    val viaTier = PromQL.rangeWithTiers("sum_over_time(m[2h])", pts,
      t0, t0 + 6 * HU, HU, tiers)
    assert(viaTier.queryExecution.optimizedPlan.toString.contains("sum_dec"),
      "aligned grid must read the stat tier")
    val raw = PromQL.rangeWithTiers("sum_over_time(m[2h])", pts,
      t0, t0 + 6 * HU, HU, Map.empty)
    assert(grid(viaTier) == grid(raw), s"${grid(viaTier)} vs ${grid(raw)}")
    assert(grid(viaTier).nonEmpty)
    // a 6h window on a 6h step with 6h-aligned start rides the 6h tier
    val coarse = PromQL.rangeWithTiers("avg_over_time(m[6h])", pts,
      t0, t0 + 6 * HU, 6 * HU, tiers)
    assert(grid(coarse) == grid(PromQL.rangeWithTiers("avg_over_time(m[6h])",
      pts, t0, t0 + 6 * HU, 6 * HU, Map.empty)))
    // a 90m step misaligns the grid edges: falls back to raw, same rows
    val mis = PromQL.rangeWithTiers("sum_over_time(m[2h])", pts,
      t0, t0 + 6 * HU, HU + HU / 2, tiers)
    assert(!mis.queryExecution.optimizedPlan.toString.contains("sum_dec"),
      "misaligned grid must not read the tier")
    // offset: shifted window ends (t − offset) stay bucket edges when
    // start − offset is aligned — the 1h-offset grid rides the tier
    // and equals the raw path; count/min/max ride the same stat merge
    for (q <- Seq("sum_over_time(m[2h] offset 1h)",
        "count_over_time(m[2h])", "min_over_time(m[2h])",
        "max_over_time(m[2h])")) {
      val viaT = PromQL.rangeWithTiers(q, pts, t0, t0 + 6 * HU, HU, tiers)
      assert(viaT.queryExecution.optimizedPlan.toString.contains("__end"),
        s"$q must read the stat tier")
      assert(grid(viaT) ==
        grid(PromQL.rangeWithTiers(q, pts, t0, t0 + 6 * HU, HU, Map.empty)),
        s"$q tier != raw")
    }
  }
}
