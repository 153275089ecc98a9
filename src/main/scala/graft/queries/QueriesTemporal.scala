package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sources.Testdata

/** Temporal join/windowing operators the reference's signal stores imply
  * but Spark lacks as built-ins: AS-OF join (nearest preceding match per
  * key) and gap-based sessionization.
  *
  * Scale notes (100 TB):
  *   - the as-of join is the union-then-window formulation: tag both
  *     sides, ONE shuffle on (key, ts), and a running last_value carries
  *     the build side forward. The naive alternative — a range join —
  *     explodes to |probe|×|build| per key before picking the max;
  *     the window form moves each row exactly once (this is also how a
  *     stream-table point-in-time join materializes at write time);
  *   - sessionization is two stacked windows over the same (key, ts)
  *     sort — lag to flag gap breaks, running sum to number sessions —
  *     then one aggregation; Spark plans a single Exchange + Sort and
  *     both window functions plus the partial agg ride it.
  */
object QueriesTemporal extends QueryPack {

  private def q(name: String, oracle: String)(f: Testdata => DataFrame): Q =
    Q(name, (s: SparkSession, dir: String) => f(Testdata(s, dir)), Some(oracle))

  /** AS-OF join: every `purchase` event matched to the same user's most
    * recent preceding (or simultaneous) `view` event — last-touch
    * attribution, the canonical as-of shape. Implemented as union +
    * running last_value over one (user, ts) sort; the DuckDB oracle is
    * its native ASOF JOIN, pinning the inclusive `probe.ts >= build.ts`
    * convention.
    */
  val asofJoin: Q = q(
    "src_asof_join",
    """WITH p AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'),
      |v AS (SELECT user_id, ts FROM events WHERE event_type = 'view')
      |SELECT p.event_id, p.user_id,
      |  epoch_us(p.ts) AS purchase_us, epoch_us(v.ts) AS view_us,
      |  epoch_us(p.ts) - epoch_us(v.ts) AS gap_us
      |FROM p ASOF JOIN v ON p.user_id = v.user_id AND p.ts >= v.ts
      |ORDER BY p.event_id""".stripMargin
  ) { td =>
    val ev = td.events
      .filter(col("event_type").isin("view", "purchase"))
      .select(col("event_id"), col("user_id"), col("ts"), col("event_type"))
      // the build side's own ts, null on probe rows, so last_value
      // with ignoreNulls carries the most recent view forward
      .withColumn("view_ts", when(col("event_type") === "view", col("ts")))
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ev.withColumn("last_view_ts", last(col("view_ts"), ignoreNulls = true).over(w))
      .filter(col("event_type") === "purchase" && col("last_view_ts").isNotNull)
      .select(col("event_id"), col("user_id"),
        expr("ts div 1000").as("purchase_us"),
        expr("last_view_ts div 1000").as("view_us"),
        expr("(ts - last_view_ts) div 1000").as("gap_us"))
      .orderBy("event_id")
  }

  /** Gap-based SESSIONIZATION: per-user sessions split where the gap to
    * the previous event exceeds 12 h; one row per session with extent
    * and size. lag flags the breaks, a running sum numbers them, a
    * grouped agg collapses them — all on a single (user, ts) sort.
    */
  val sessionize: Q = q(
    "src_sessionize",
    """WITH o AS (SELECT user_id, event_id, epoch_us(ts) AS ts_us FROM events),
      |g AS (
      |  SELECT *, CASE WHEN lag(ts_us) OVER w IS NULL
      |                   OR ts_us - lag(ts_us) OVER w > 43200000000 THEN 1
      |            ELSE 0 END AS brk
      |  FROM o WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)),
      |s AS (
      |  SELECT *, SUM(brk) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
      |    ROWS UNBOUNDED PRECEDING) AS session_no
      |  FROM g)
      |SELECT user_id, CAST(session_no AS BIGINT) AS session_no,
      |  MIN(ts_us) AS start_us, MAX(ts_us) AS end_us,
      |  CAST(COUNT(*) AS BIGINT) AS n_events,
      |  MAX(ts_us) - MIN(ts_us) AS duration_us
      |FROM s GROUP BY user_id, session_no
      |ORDER BY user_id, session_no""".stripMargin
  ) { td =>
    val GapUs = 43200000000L // 12 h
    val o = td.events.select(col("user_id"), col("event_id"),
      expr("ts div 1000").as("ts_us"))
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts_us"), col("event_id"))
    val run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    o.withColumn("brk",
        when(lag(col("ts_us"), 1).over(w).isNull ||
          col("ts_us") - lag(col("ts_us"), 1).over(w) > GapUs, 1).otherwise(0))
      .withColumn("session_no", sum(col("brk")).over(run))
      .groupBy(col("user_id"), col("session_no"))
      .agg(min(col("ts_us")).as("start_us"), max(col("ts_us")).as("end_us"),
        count(lit(1)).as("n_events"),
        (max(col("ts_us")) - min(col("ts_us"))).as("duration_us"))
      .orderBy("user_id", "session_no")
  }

  /** WINDOW FUNNEL (the ClickHouse `windowFunnel` analytic the
    * reference's backend gives its users): per user, the deepest
    * view → click → purchase chain where every step lands within 24 h
    * of the chain's FIRST event and steps are strictly ordered.
    *
    * Shape: per-row "next click / next purchase at-or-after me"
    * columns from min-over-following windows on ONE (user, ts) sort,
    * then a single co-partitioned (user, ts) equi-join to hop from the
    * matched click to its following purchase — never a per-user
    * probe×build range join.
    */
  val windowFunnel: Q = q(
    "src_window_funnel",
    """WITH e AS (SELECT user_id, epoch_us(ts) AS tu, event_type AS et FROM events
      |           WHERE event_type IN ('view', 'click', 'purchase')),
      |w AS (
      |  SELECT *,
      |    MIN(CASE WHEN et = 'click' THEN tu END) OVER
      |      (PARTITION BY user_id ORDER BY tu ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nc,
      |    MIN(CASE WHEN et = 'purchase' THEN tu END) OVER
      |      (PARTITION BY user_id ORDER BY tu ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS np
      |  FROM e),
      |v AS (SELECT user_id, tu AS t1, nc AS t2 FROM w WHERE et = 'view'),
      |c2 AS (
      |  SELECT v.user_id, v.t1, v.t2, w.np AS t3
      |  FROM v JOIN w ON w.user_id = v.user_id AND w.tu = v.t2 AND w.et = 'click'
      |  WHERE v.t2 IS NOT NULL AND v.t2 > v.t1 AND v.t2 <= v.t1 + 86400000000),
      |lv AS (
      |  SELECT user_id, 1 AS level FROM v
      |  UNION ALL SELECT user_id, 2 AS level FROM c2
      |  UNION ALL SELECT user_id, 3 AS level FROM c2
      |    WHERE t3 IS NOT NULL AND t3 > t2 AND t3 <= t1 + 86400000000)
      |SELECT user_id, CAST(MAX(level) AS BIGINT) AS funnel_level
      |FROM lv GROUP BY user_id ORDER BY user_id""".stripMargin
  ) { td =>
    val WinUs = 86400000000L // 24 h anchored at the chain's first event
    val e = td.events
      .filter(col("event_type").isin("view", "click", "purchase"))
      .select(col("user_id"), expr("ts div 1000").as("tu"),
        col("event_type").as("et"))
    val follow = Window.partitionBy(col("user_id")).orderBy(col("tu"))
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val w = e
      .withColumn("nc", min(when(col("et") === "click", col("tu"))).over(follow))
      .withColumn("np", min(when(col("et") === "purchase", col("tu"))).over(follow))
    val v = w.filter(col("et") === "view")
      .select(col("user_id"), col("tu").as("t1"), col("nc").as("t2"))
    val clicks = w.filter(col("et") === "click")
      .select(col("user_id").as("cu"), col("tu").as("ctu"), col("np"))
    val c2 = v
      .filter(col("t2").isNotNull && col("t2") > col("t1") &&
        col("t2") <= col("t1") + WinUs)
      .join(clicks, col("user_id") === col("cu") && col("ctu") === col("t2"))
      .select(col("user_id"), col("t1"), col("t2"), col("np").as("t3"))
    val lv = v.select(col("user_id"), lit(1).as("level"))
      .unionAll(c2.select(col("user_id"), lit(2).as("level")))
      .unionAll(c2
        .filter(col("t3").isNotNull && col("t3") > col("t2") &&
          col("t3") <= col("t1") + WinUs)
        .select(col("user_id"), lit(3).as("level")))
    lv.groupBy(col("user_id"))
      .agg(max(col("level")).cast("long").as("funnel_level"))
      .orderBy("user_id")
  }

  /** RETENTION (the ClickHouse `retention` analytic): of the users who
    * signed up in week 1, how many purchased in week 2 and week 4.
    * One user-keyed rollup of boolean flags, one scalar aggregate —
    * the flags partial-aggregate map-side, so the corpus shuffles only
    * (user, 3 bits).
    */
  val retention: Q = q(
    "src_retention",
    """WITH f AS (
      |  SELECT user_id,
      |    bool_or(event_type = 'signup' AND ts < TIMESTAMP '2024-01-08') AS c1,
      |    bool_or(event_type = 'purchase' AND ts >= TIMESTAMP '2024-01-08'
      |            AND ts < TIMESTAMP '2024-01-15') AS c2,
      |    bool_or(event_type = 'purchase' AND ts >= TIMESTAMP '2024-01-22'
      |            AND ts < TIMESTAMP '2024-01-29') AS c3
      |  FROM events GROUP BY user_id)
      |SELECT CAST(SUM(CASE WHEN c1 THEN 1 ELSE 0 END) AS BIGINT) AS signed_up,
      |  CAST(SUM(CASE WHEN c1 AND c2 THEN 1 ELSE 0 END) AS BIGINT) AS week2,
      |  CAST(SUM(CASE WHEN c1 AND c3 THEN 1 ELSE 0 END) AS BIGINT) AS week4,
      |  CAST(SUM(CASE WHEN c1 AND c2 THEN 1 ELSE 0 END) * 1000000
      |    // SUM(CASE WHEN c1 THEN 1 ELSE 0 END) AS BIGINT) AS week2_ppm,
      |  CAST(SUM(CASE WHEN c1 AND c3 THEN 1 ELSE 0 END) * 1000000
      |    // SUM(CASE WHEN c1 THEN 1 ELSE 0 END) AS BIGINT) AS week4_ppm
      |FROM f""".stripMargin
  ) { td =>
    // week boundaries as epoch-ns literals (events ts is epoch ns)
    val D08 = 1704672000000000000L
    val D15 = 1705276800000000000L
    val D22 = 1705881600000000000L
    val D29 = 1706486400000000000L
    val f = td.events.groupBy(col("user_id")).agg(
      max(col("event_type") === "signup" && col("ts") < D08).as("c1"),
      max(col("event_type") === "purchase" && col("ts") >= D08 &&
        col("ts") < D15).as("c2"),
      max(col("event_type") === "purchase" && col("ts") >= D22 &&
        col("ts") < D29).as("c3"))
    f.agg(
        sum(when(col("c1"), 1L).otherwise(0L)).as("signed_up"),
        sum(when(col("c1") && col("c2"), 1L).otherwise(0L)).as("week2"),
        sum(when(col("c1") && col("c3"), 1L).otherwise(0L)).as("week4"))
      .select(col("signed_up"), col("week2"), col("week4"),
        expr("(week2 * 1000000) div signed_up").as("week2_ppm"),
        expr("(week4 * 1000000) div signed_up").as("week4_ppm"))
  }

  override def queries: Seq[Q] =
    Seq(asofJoin, sessionize, windowFunnel, retention)
}
