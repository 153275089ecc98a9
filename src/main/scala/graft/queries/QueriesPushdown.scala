package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Testdata

/** Optimizer-behavior operators (SURVEY.md §4.1): the `*_over_time`
  * rollup-table pushdown (embedded-backend sidecar analogue),
  * `__error__` propagation semantics, and severity name↔number
  * predicate lowering.
  */
object QueriesPushdown extends QueryPack {

  private def q(name: String, oracle: String)(f: Testdata => DataFrame): Q =
    Q(name, (s: SparkSession, dir: String) => f(Testdata(s, dir)), Some(oracle))

  private val HourNs = 3600000000000L

  /** `count/sum/min/max_over_time` answered from a PRE-AGGREGATED hourly
    * rollup instead of decoding samples — the embedded backend's
    * aggregate sidecar (reference storagebackend/overtime.go:23-140,
    * docs/storage-integration.md:30-47). The rollup is built as a
    * first-level aggregation (at scale: a streaming job maintaining a
    * rollup table); the day-level answer re-aggregates ONLY rollup rows.
    * The oracle computes straight from raw events, so the two-level
    * re-aggregation must be exactly lossless.
    */
  val overtimeRollup: Q = q(
    "pushdown_overtime_rollup",
    s"""SELECT event_type,
       |  epoch_ns(ts) - epoch_ns(ts) % ${24 * HourNs} AS day_ns,
       |  COUNT(*) AS n, ${Det.oSum("value")} AS sum_v,
       |  MIN(value) AS min_v, MAX(value) AS max_v
       |FROM events GROUP BY event_type, day_ns
       |ORDER BY event_type, day_ns""".stripMargin
  ) { td =>
    import graft.sources.RollupTiers
    // level 1: the hourly stat tier the streaming sidecar maintains
    // (same statAggs as Streams.hourlyStatPartials — one maintenance path)
    val rollup = RollupTiers.rollup(
      td.events.select(col("event_type"), col("ts"), col("value")),
      Seq("event_type"), "ts", "value", HourNs)
    // level 2: the query touches only rollup rows (24 per day per series)
    RollupTiers.reRollup(rollup, Seq("event_type"), "ts", 24 * HourNs)
      .select(col("event_type"), col("ts").as("day_ns"), col("n"),
        col("sum_dec").cast("double").as("sum_v"), col("min_v"),
        col("max_v"))
      .orderBy("event_type", "day_ns")
  }

  /** Coarsest-sufficient-TIER selection for `*_over_time` pushdown:
    * the maintained stat tiers are the hourly sidecar's rows and a
    * 6-hourly tier chained FROM them (`RollupTiers.reRollup` — raw
    * samples are scanned exactly once for the whole chain), and the
    * day-window average reads the COARSEST tier that tiles the window
    * ([[graft.sources.RollupTiers.select]] picks 6h over {1h, 6h}): 4
    * stat rows per day per series instead of 24, instead of raw. The
    * oracle replays the day average straight from raw events — the
    * decimal-exact sum chain makes the two bit-equal; tier-selection
    * RULES are pinned by RollupTiersSpec.
    */
  val rollupTierSelect: Q = q(
    "pushdown_rollup_tier_select",
    s"""SELECT event_type,
       |  epoch_ns(ts) - epoch_ns(ts) % ${24 * HourNs} AS day_ns,
       |  ${Det.oAvg("value")} AS value
       |FROM events GROUP BY event_type, day_ns
       |ORDER BY event_type, day_ns""".stripMargin
  ) { td =>
    import graft.sources.RollupTiers
    val DayNs = 24 * HourNs
    val hourly = RollupTiers.rollup(
      td.events.select(col("event_type"), col("ts"), col("value")),
      Seq("event_type"), "ts", "value", HourNs)
    val tiers = Map(
      HourNs -> hourly,
      6 * HourNs -> RollupTiers.reRollup(hourly, Seq("event_type"), "ts",
        6 * HourNs))
    val picked = RollupTiers.select(tiers.keys.toSeq, DayNs, "avg")
      .getOrElse(sys.error("day window must be servable from a tier"))
    require(picked == 6 * HourNs, s"expected the 6h tier, got $picked")
    RollupTiers.readAgg(tiers(picked), Seq("event_type"), "ts", DayNs, "avg")
      .select(col("event_type"), col("ts").as("day_ns"), col("value"))
      .orderBy("event_type", "day_ns")
  }

  /** The maintained stat-tier tables (1h + 6h, chained) the PromQL
    * tier-read planner selects over — materialized once per sf dir,
    * modeling the stored tier layout the streaming sidecar + batch
    * chain maintain.
    */
  private def statTiers(td: Testdata): Map[Long, DataFrame] = {
    val HourUs = 3600000000L
    def pts = td.events.select(lit("ev").as("name"),
      map(lit("et"), col("event_type")).as("labels"),
      expr("ts div 1000").as("ts_us"), col("value"))
    def chain = graft.promql.PromQL.statTierChain(pts, Seq(HourUs, 6 * HourUs))
    Map(
      HourUs -> Fixtures.materialized(td.spark, td.dir, "rt1h", "__end")(
        chain(HourUs)),
      6 * HourUs -> Fixtures.materialized(td.spark, td.dir, "rt6h", "__end")(
        chain(6 * HourUs)))
  }

  /** The PromQL FRONT-END choosing a rollup tier: a 1-day
    * `avg_over_time` instant evaluates over the stored 6h tier (4 stat
    * rows per series) — `RollupTiers.select` inside
    * `PromQL.instantWithTiers` picks it, PlanSpec pins that the plan
    * scans ONLY that tier (no raw events, no 1h tier). The oracle
    * replays the window average from raw events; left-open end-labeled
    * tier buckets make the (t−1d, t] window exact, and the
    * decimal-exact sum chain makes avg bit-equal.
    */
  val tierInstant: Q = q(
    "pushdown_tier_instant",
    s"""SELECT ${1704067200000000L + 2 * 86400000000L} AS ts_us,
       |  event_type AS et, ${Det.oAvg("value")} AS value
       |FROM events
       |WHERE epoch_ns(ts)//1000 > ${1704067200000000L + 86400000000L}
       |  AND epoch_ns(ts)//1000 <= ${1704067200000000L + 2 * 86400000000L}
       |GROUP BY et ORDER BY et""".stripMargin
  ) { td =>
    val pts = td.events.select(lit("ev").as("name"),
      map(lit("et"), col("event_type")).as("labels"),
      expr("ts div 1000").as("ts_us"), col("value"))
    val end = 1704067200000000L + 2 * 86400000000L // 2024-01-03T00:00Z µs
    graft.promql.PromQL.instantWithTiers(
        "avg_over_time(ev[1d])", pts, end, statTiers(td))
      .select(col("ts_us"), element_at(col("labels"), "et").as("et"),
        col("value"))
      .orderBy("et")
  }

  /** The RANGE-query extension of the tier-read planner (r12): a
    * 7-day dashboard grid of 1-day `avg_over_time` windows, step 6h —
    * grid start and step are both 6h-multiples, so every window
    * (t−1d, t] is an exact union of stored 6h buckets and the WHOLE
    * range query reads 4 stat rows per series per step off the 6h
    * tier, never raw events (PlanSpec pins the plan; the reference's
    * sidecar is instant-only, storagebackend/overtime.go:23-140 — this
    * is where dashboard read volume actually lives). The oracle
    * replays every grid point's window average from raw events;
    * left-open end-labeled buckets + the decimal-exact sum chain make
    * all 29 × series values bit-equal.
    */
  val tierRange: Q = {
    val DayUs = 86400000000L
    val start = 1704067200000000L + 7 * DayUs // 2024-01-08T00:00Z µs
    val end = start + 7 * DayUs
    val step = 6 * 3600000000L
    q(
      "pushdown_tier_range",
      s"""WITH grid AS (
         |  SELECT unnest(generate_series($start, $end, $step)) AS ts_us),
         |pts AS (SELECT event_type AS et, epoch_us(ts) AS tus, value FROM events)
         |SELECT g.ts_us, p.et, ${Det.oAvg("p.value")} AS value
         |FROM grid g JOIN pts p
         |  ON p.tus > g.ts_us - $DayUs AND p.tus <= g.ts_us
         |GROUP BY g.ts_us, p.et
         |ORDER BY et, ts_us""".stripMargin
    ) { td =>
      val pts = td.events.select(lit("ev").as("name"),
        map(lit("et"), col("event_type")).as("labels"),
        expr("ts div 1000").as("ts_us"), col("value"))
      graft.promql.PromQL.rangeWithTiers(
          "avg_over_time(ev[1d])", pts, start, end, step, statTiers(td))
        .select(col("ts_us"), element_at(col("labels"), "et").as("et"),
          col("value"))
        .orderBy("et", "ts_us")
    }
  }

  /** The maintained LOG-VOLUME sidecar (hourly count/bytes partials per
    * stream, [[graft.streaming.Streams.logVolumePartials]]) the LogQL
    * aggregation offload reads — built as TWO partial row-sets per hour
    * (modeling the streamed per-batch appends; readers must merge them
    * additively), materialized once per sf dir.
    */
  private def volumeTiers(td: Testdata): Map[Long, DataFrame] = {
    def logsFrame = td.events.select(
      col("ts").as("ts_ns"), col("props").as("body"),
      map(lit("et"), col("event_type")).as("labels"))
    def partials = graft.streaming.Streams.logVolumePartials(
        logsFrame.filter(col("ts_ns") % 2 === 0))
      .unionByName(graft.streaming.Streams.logVolumePartials(
        logsFrame.filter(col("ts_ns") % 2 =!= 0)))
    graft.logql.Planner.volumeTiersOf(
      Fixtures.materialized(td.spark, td.dir, "lv1h", "series_key")(partials))
  }

  /** The LogQL front-end serving `sum by (...) (count_over_time(sel[w]))`
    * off the maintained log-volume sidecar — the reference's
    * BucketedSampleQuery sum-only pushdown
    * (chstorage/querier_logs_optimizer.go:52-152,
    * querier_logs_query.go:364-540): a 7-day dashboard grid of 1-day
    * windows, step 6h, reads 4 integral stat rows per stream per step
    * off the re-rolled 6h tier and never scans a log line (PlanSpec
    * pins the plan). The oracle replays every grid value from raw
    * events; counts are integral, so the partial-merge + regroup chain
    * is bit-equal by construction.
    */
  val logvolRange: Q = {
    val DayNs = 86400000000000L
    val start = 1704067200000000000L + 7 * DayNs
    val end = start + 7 * DayNs
    val step = 6 * HourNs
    q(
      "pushdown_logvol_range",
      s"""WITH grid AS (
         |  SELECT unnest(generate_series($start, $end, $step)) AS bucket_ns),
         |lg AS (SELECT event_type AS et, epoch_ns(ts) AS tns FROM events
         |       WHERE event_type IN ('click', 'view'))
         |SELECT g.bucket_ns, l.et, CAST(COUNT(*) AS DOUBLE) AS value
         |FROM grid g JOIN lg l
         |  ON l.tns > g.bucket_ns - $DayNs AND l.tns <= g.bucket_ns
         |GROUP BY g.bucket_ns, l.et
         |ORDER BY et, bucket_ns""".stripMargin
    ) { td =>
      graft.logql.Planner.volumeTierPlan(
          """sum by (et) (count_over_time({et=~"click|view"}[1d]))""",
          start, end, step, volumeTiers(td))
        .getOrElse(sys.error("grid must be servable from the volume sidecar"))
        .select(col("bucket_ns"), element_at(col("labels"), "et").as("et"),
          col("value"))
        .orderBy("et", "bucket_ns")
    }
  }

  /** The instant form over BYTES with the rate division: `bytes_rate`
    * divides the integral byte sum by the window seconds AFTER the
    * merge (the same double op as the raw path), so the sidecar answer
    * replays bit-equal from raw bodies.
    */
  val logvolBytesRate: Q = {
    val t = 1704067200000000000L + 2 * 86400000000000L
    q(
      "pushdown_logvol_bytes_rate",
      s"""SELECT 'error' AS et,
         |  CAST(SUM(LENGTH(props)) AS DOUBLE) / 86400.0 AS value
         |FROM events WHERE event_type = 'error'
         |  AND epoch_ns(ts) > ${t - 86400000000000L} AND epoch_ns(ts) <= $t
         |""".stripMargin
    ) { td =>
      graft.logql.Planner.volumeInstantPlan(
          """bytes_rate({et="error"}[1d])""", t, volumeTiers(td))
        .getOrElse(sys.error("instant must be servable from the volume sidecar"))
        .select(element_at(col("labels"), "et").as("et"), col("value"))
    }
  }

  /** Age-tiered downsample policy (reference storage_policy.go:52-61)
    * pinned cross-engine: rows pick their tier by partition-date age
    * from "now" (the newest day in the table) exactly as
    * `Layout.compactPointsPartition` does per date partition — tier 1
    * (older than 2 days) rewrites to one LAST representative per
    * series per 1h bucket, tier 2 (older than 5 days) to a COUNT per
    * 6h bucket; representatives carry the bucket-start timestamp.
    * DuckDB replays the tier selection, the bucket alignment, and the
    * deterministic (ts, value)-ordered LAST. Raw pass-through of the
    * youngest days (tier 0) is pinned by LayoutSpec, not here, to keep
    * the gate output at representative rows. Scale shape: each date
    * partition compacts independently — one bounded groupBy per day,
    * never a dataset-wide shuffle.
    */
  val downsampleTiers: Q = q(
    "policy_downsample_tiers",
    """WITH pts AS (
      |  SELECT event_type AS name, epoch_ns(ts)//1000 AS ts_us, value FROM events
      |), b AS (SELECT max(ts_us // 86400000000) AS nowd FROM pts),
      |tiered AS (
      |  SELECT name, ts_us, value,
      |    CASE WHEN nowd - ts_us // 86400000000 >= 5 THEN 2
      |         WHEN nowd - ts_us // 86400000000 >= 2 THEN 1 ELSE 0 END AS tier
      |  FROM pts, b)
      |SELECT name, tier, bucket_us AS ts_us, value FROM (
      |  SELECT name, 1 AS tier, ts_us - ts_us % 3600000000 AS bucket_us,
      |         (max({'t': ts_us, 'v': value})).v AS value
      |  FROM tiered WHERE tier = 1 GROUP BY name, ts_us - ts_us % 3600000000
      |  UNION ALL
      |  SELECT name, 2, ts_us - ts_us % 21600000000,
      |         CAST(count(*) AS DOUBLE)
      |  FROM tiered WHERE tier = 2 GROUP BY name, ts_us - ts_us % 21600000000
      |) ORDER BY name, tier, ts_us""".stripMargin
  ) { td =>
    val DayUs = 86400000000L
    val pts = td.events.select(
      col("event_type").as("name"),
      expr("ts div 1000").as("ts_us"),
      col("value"))
    val bounds = pts.agg(max(expr(s"ts_us div $DayUs")).as("nowd"))
    val tiered = pts.crossJoin(broadcast(bounds))
      .withColumn("age", col("nowd") - expr(s"ts_us div $DayUs"))
      .withColumn("tier",
        when(col("age") >= 5, 2).when(col("age") >= 2, 1).otherwise(0))
      .select("name", "tier", "ts_us", "value")
    // Both tiers in ONE grouped pass over ONE scan (r20; was two
    // StoragePolicy.downsample calls over two scans + a union — three
    // scans and two aggregation exchanges for one pass's work): every
    // row belongs to exactly one tier, so it buckets by its own tier's
    // interval and (name, tier, bucket) is a single grouping; the
    // tier-1 "last" representative and the tier-2 count aggregate side
    // by side and the output picks by tier. Exactly
    // StoragePolicy.downsample's per-tier semantics — "last" = value
    // at max (ts, value), count = rows — per (name, tier, bucket)
    // group, which the oracle replays unchanged. The per-partition
    // maintenance path keeps using downsample(); this is the query's
    // one-pass composition of the same tier table.
    tiered.filter(col("tier") >= 1)
      .withColumn("__bucket",
        when(col("tier") === 1, col("ts_us") - col("ts_us") % 3600000000L)
          .otherwise(col("ts_us") - col("ts_us") % 21600000000L))
      .groupBy(col("name"), col("tier"), col("__bucket"))
      .agg(
        max(struct(col("ts_us"), col("value"))).getField("value").as("__last"),
        count(lit(1)).cast("double").as("__n"))
      .select(col("name"), col("tier"), col("__bucket").as("ts_us"),
        when(col("tier") === 1, col("__last")).otherwise(col("__n"))
          .as("value"))
      .orderBy("name", "tier", "ts_us")
  }

  /** `__error__` propagation: failed extractions KEEP the row and label
    * it (reference logqlengine/logqlerrors; optimizer safety analysis
    * querier_logs_optimizer.go:223-299). Malformed bodies are
    * synthesized by truncating valid JSON on odd event_ids.
    */
  val errorPropagation: Q = q(
    "pushdown_error_propagation",
    """SELECT event_type, err, COUNT(*) AS n,
      |  CAST(SUM(CAST(k AS BIGINT)) AS BIGINT) AS sum_k
      |FROM (
      |  SELECT event_type,
      |    CASE WHEN json_valid(j) THEN '' ELSE 'JSONParserErr' END AS err,
      |    CASE WHEN json_valid(j) THEN json_extract_string(j, '$.k') END AS k
      |  FROM (
      |    SELECT event_type,
      |      CASE WHEN event_id % 2 = 1 THEN substr(props, 1, length(props) - 1)
      |           ELSE props END AS j
      |    FROM events))
      |GROUP BY event_type, err ORDER BY event_type, err""".stripMargin
  ) { td =>
    val j = when(col("event_id") % 2 === 1,
      col("props").substr(lit(1), length(col("props")) - 1))
      .otherwise(col("props"))
    // ONE JSON parse per row: from_json to a map (null iff malformed),
    // then err and k both read the parsed column — from_json is
    // non-cheap so CollapseProject keeps it materialized once
    td.events
      .withColumn("j", j)
      .withColumn("__p", from_json(col("j"),
        org.apache.spark.sql.types.MapType(
          org.apache.spark.sql.types.StringType,
          org.apache.spark.sql.types.StringType)))
      .withColumn("err", when(col("__p").isNull, "JSONParserErr").otherwise(""))
      .withColumn("k", try_element_at(col("__p"), lit("k")))
      .groupBy(col("event_type"), col("err"))
      .agg(count(lit(1)).as("n"), sum(col("k").cast("long")).as("sum_k"))
      .orderBy("event_type", "err")
  }

  /** Severity predicate lowering: `level=~"ERROR|FATAL"` becomes a
    * severity_number range scan on the stored column instead of a regex
    * over derived text (reference querier_logs_query.go:760-787 regex
    * enumeration over the 24 levels).
    */
  val severityLowering: Q = q(
    "pushdown_severity_lowering",
    """SELECT sev, COUNT(*) AS n FROM (
      |  SELECT CASE event_type
      |    WHEN 'error' THEN 17 WHEN 'signup' THEN 9 WHEN 'purchase' THEN 9
      |    WHEN 'click' THEN 5 WHEN 'view' THEN 1 ELSE 0 END AS sev
      |  FROM events)
      |WHERE sev BETWEEN 13 AND 24 OR sev BETWEEN 9 AND 12
      |GROUP BY sev ORDER BY sev""".stripMargin
  ) { td =>
    import graft.model.OtelViews
    val sevNum = OtelViews.severityByEventType.foldLeft(lit(0)) {
      case (acc, (et, _, num)) => when(col("event_type") === et, num).otherwise(acc)
    }
    td.events
      .select(sevNum.as("sev"))
      // ERROR|WARN|FATAL range ∪ INFO range — the lowered predicate
      .filter((col("sev") >= 13 && col("sev") <= 24) || (col("sev") >= 9 && col("sev") <= 12))
      .groupBy(col("sev")).agg(count(lit(1)).as("n"))
      .orderBy("sev")
  }

  /** Skew-safe two-phase aggregation: group keys are salted 16 ways,
    * partially aggregated, then re-aggregated on the true key — the
    * manual fallback when one series/label dominates and even AQE skew
    * handling cannot split a single hot reduce key. The result must be
    * exactly the unsalted aggregate (oracle computes directly).
    */
  val saltedAgg: Q = q(
    "scale_salted_agg",
    s"""SELECT event_type, COUNT(*) AS n, ${Det.oISum("user_id")} AS sum_user
       |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin
  ) { td =>
    val salted = td.events
      .withColumn("__salt", pmod(col("event_id"), lit(16)))
      .groupBy(col("event_type"), col("__salt"))
      .agg(count(lit(1)).as("n"), sum(col("user_id")).as("sum_user"))
    salted
      .groupBy(col("event_type"))
      .agg(sum(col("n")).as("n"), sum(col("sum_user")).as("sum_user"))
      .orderBy("event_type")
  }

  /** attr→scope→resource label resolution: a label read coalesces
    * across the three attribute scopes, widest-scope last (reference
    * chstorage/attributes.go:251-266 coalesce lowering;
    * querier_metrics_timeseries.go:148-260).
    */
  val labelScopeCoalesce: Q = q(
    "pushdown_label_scopes",
    """SELECT lbl, COUNT(*) AS n FROM (
      |  SELECT COALESCE(
      |    CASE WHEN user_id % 3 = 0 THEN event_type END,
      |    CASE WHEN user_id % 3 = 1 THEN 'scope-' || event_type END,
      |    'resource-default') AS lbl
      |  FROM events)
      |GROUP BY lbl ORDER BY lbl""".stripMargin
  ) { td =>
    val attrs = when(col("user_id") % 3 === 0, col("event_type"))
    val scope = when(col("user_id") % 3 === 1, concat(lit("scope-"), col("event_type")))
    td.events
      .select(coalesce(attrs, scope, lit("resource-default")).as("lbl"))
      .groupBy(col("lbl")).agg(count(lit(1)).as("n"))
      .orderBy("lbl")
  }

  override def queries: Seq[Q] = Seq(
    overtimeRollup, rollupTierSelect, tierInstant, tierRange,
    logvolRange, logvolBytesRate, downsampleTiers,
    errorPropagation, severityLowering, saltedAgg, labelScopeCoalesce)
}
