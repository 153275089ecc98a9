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

  override def queries: Seq[Q] = Seq(asofJoin, sessionize)
}
