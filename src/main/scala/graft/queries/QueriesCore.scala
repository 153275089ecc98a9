package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Testdata

/** Core scan / join / aggregation surface (SURVEY.md §2.0):
  * pushdown scans, candidate semi-joins (the TraceQL two-phase pattern),
  * point lookups (TraceByID), broadcast dimension joins (series-hash
  * resolution), and headline aggregations.
  *
  * Scale notes: filters and projections here reach the parquet scan
  * (PushedFilters / ReadSchema); the dimension side of every join is
  * broadcast; aggregations are partial (map-side combine) before the
  * single shuffle on the group keys.
  */
object QueriesCore extends QueryPack {
  import Det._

  private def q(name: String, oracle: String)(f: Testdata => DataFrame): Q =
    Q(name, (s: SparkSession, dir: String) => f(Testdata(s, dir)), Some(oracle))

  /** Pushdown scan + order + limit — the ClickHouse logs-scan analogue
    * (reference internal/chstorage/querier_logs_query.go:40-154).
    */
  val scanFilterLimit: Q = q(
    "src_scan_filter_limit",
    // ts is surfaced as epoch-µs: DuckDB's parquet reader truncates
    // TIMESTAMP(NANOS) to µs, so µs is the finest cross-checkable grain.
    """SELECT event_id, epoch_us(ts) AS ts_us, value
      |FROM events WHERE event_type = 'error' AND value > 100
      |ORDER BY ts_us DESC, event_id LIMIT 100""".stripMargin
  ) { td =>
    td.events
      .filter(col("event_type") === "error" && col("value") > 100)
      .select(col("event_id"), expr("ts div 1000").as("ts_us"), col("value"))
      .orderBy(col("ts_us").desc, col("event_id"))
      .limit(100)
  }

  /** Candidate semi-join: all "spans" (lineitems) of "traces" (orders)
    * containing a matching span — the TraceQL two-phase execution
    * (reference internal/chstorage/querier_traces.go:443-550).
    */
  val semijoinTraceSpans: Q = q(
    "src_semijoin_trace_spans",
    """SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
      |FROM lineitem
      |WHERE l_orderkey IN (
      |  SELECT l_orderkey FROM lineitem WHERE l_returnflag = 'R' AND l_quantity >= 49)
      |ORDER BY l_orderkey, l_linenumber, l_quantity, l_extendedprice""".stripMargin
  ) { td =>
    val li = td.lineitem
    val candidates = li
      .filter(col("l_returnflag") === "R" && col("l_quantity") >= 49)
      .select(col("l_orderkey"))
    li.join(candidates, Seq("l_orderkey"), "left_semi")
      .select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice")
      // (orderkey, linenumber) is NOT unique in the testdata — the
      // ORDER BY must be total or tie order follows scan order
      .orderBy("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice")
  }

  /** Point lookup by id — TraceByID / bloom-index analogue
    * (reference internal/chstorage/querier_traces.go:392-441).
    */
  val pointLookup: Q = q(
    "src_point_lookup",
    """SELECT event_id, epoch_us(ts) AS ts_us, event_type, props, value
      |FROM events WHERE event_id = 123""".stripMargin
  ) { td =>
    td.events
      .filter(col("event_id") === 123)
      .select(col("event_id"), expr("ts div 1000").as("ts_us"),
        col("event_type"), col("props"), col("value"))
  }

  /** Broadcast dimension join + aggregation — the "resolve small series
    * set, broadcast against the big points table" pattern
    * (reference internal/chstorage/querier_metrics_scanners.go:63-200).
    */
  val broadcastDimJoin: Q = q(
    "src_broadcast_dim_join",
    s"""SELECT c_mktsegment, COUNT(*) AS n_orders, ${oSum("o_totalprice")} AS total_price
       |FROM orders JOIN customer ON o_custkey = c_custkey
       |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin
  ) { td =>
    td.orders
      .join(broadcast(td.customer), col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_orders"), dsum(col("o_totalprice")).as("total_price"))
      .orderBy("c_mktsegment")
  }

  /** Headline wide aggregation (TPC-H Q1 shape). */
  val q1Agg: Q = q(
    "q1_agg",
    s"""SELECT l_returnflag, l_linestatus,
       |  ${oSum("l_quantity")} AS sum_qty,
       |  ROUND(${oSum("l_extendedprice")}, 2) AS sum_base_price,
       |  ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4)) * (1 - CAST(l_discount AS DECIMAL(18,4)))) AS DOUBLE), 4) AS sum_disc_price,
       |  ${oAvg("l_quantity")} AS avg_qty,
       |  COUNT(*) AS count_order
       |FROM lineitem WHERE l_shipdate <= TIMESTAMP '2000-12-01'
       |GROUP BY l_returnflag, l_linestatus
       |ORDER BY l_returnflag, l_linestatus""".stripMargin
  ) { td =>
    // the big money sums round back onto their exact decimal grid
    // (2dp prices, 4dp discounted products): above ~2^32 the two
    // engines' decimal→double casts can differ by one ulp (DuckDB
    // divides an int128 by a power of ten; Spark rounds the exact
    // BigDecimal), and re-rounding collapses both to the same grid point
    td.lineitem
      .filter(col("l_shipdate") <= to_timestamp(lit("2000-12-01")))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        dsum(col("l_quantity")).as("sum_qty"),
        round(dsum(col("l_extendedprice")), 2).as("sum_base_price"),
        round(sum(col("l_extendedprice").cast(DecT) * (lit(1) - col("l_discount").cast(DecT)))
          .cast("double"), 4).as("sum_disc_price"),
        davg(col("l_quantity")).as("avg_qty"),
        count(lit(1)).as("count_order")
      )
      .orderBy("l_returnflag", "l_linestatus")
  }

  /** Join + top-k (TPC-H Q3 shape): two big-table joins shuffle on the
    * join keys; the top-k is a partial take over the aggregated result.
    */
  val q3TopkRevenue: Q = q(
    "q3_topk_revenue",
    """SELECT l_orderkey,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4)) * (1 - CAST(l_discount AS DECIMAL(18,4)))) AS DOUBLE) AS revenue
      |FROM customer JOIN orders ON c_custkey = o_custkey
      |  JOIN lineitem ON o_orderkey = l_orderkey
      |WHERE c_mktsegment = 'BUILDING' AND o_orderdate < TIMESTAMP '1999-01-01'
      |GROUP BY l_orderkey
      |ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin
  ) { td =>
    td.customer
      .filter(col("c_mktsegment") === "BUILDING")
      .join(td.orders, col("c_custkey") === col("o_custkey"))
      .filter(col("o_orderdate") < to_timestamp(lit("1999-01-01")))
      .join(td.lineitem, col("o_orderkey") === col("l_orderkey"))
      .groupBy(col("l_orderkey"))
      .agg(sum(col("l_extendedprice").cast(DecT) * (lit(1) - col("l_discount").cast(DecT)))
        .cast("double").as("revenue"))
      .orderBy(col("revenue").desc, col("l_orderkey"))
      .limit(10)
  }

  override def queries: Seq[Q] = Seq(
    scanFilterLimit, semijoinTraceSpans, pointLookup, broadcastDimJoin, q1Agg, q3TopkRevenue
  )
}
