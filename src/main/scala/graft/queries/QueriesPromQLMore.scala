package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Testdata

/** PromQL surface, part 2 (SURVEY.md §2.3): vector aggregation over
  * rate results (sum by), many-to-one vector matching (group_left),
  * exemplar queries, exponential-histogram bucket merge, plus the
  * ProfileQL selector + flame-tree merge (SURVEY.md §2.5).
  */
object QueriesPromQLMore extends QueryPack {

  private def q(name: String, oracle: String)(f: Testdata => DataFrame): Q =
    Q(name, (s: SparkSession, dir: String) => f(Testdata(s, dir)), Some(oracle))

  private val DayNs = 86400000000000L

  /** `sum by (svc) (rate(events[1d]))` — vector aggregation over a
    * rate-family inner result: two-level aggregation, the inner one per
    * full series, the outer one dropping labels (reference
    * promhandler + logqlmetric/vector_agg.go same machinery).
    */
  val sumByRate: Q = q(
    "promql_sum_by_rate",
    s"""SELECT bucket_ns, svc, CAST(SUM(n) AS BIGINT) * 1.0 / 86400.0 AS rate
       |FROM (
       |  SELECT epoch_ns(ts) - epoch_ns(ts) % $DayNs AS bucket_ns,
       |    user_id % 4 AS svc, event_type, COUNT(*) AS n
       |  FROM events GROUP BY 1, 2, 3)
       |GROUP BY bucket_ns, svc ORDER BY bucket_ns, svc""".stripMargin
  ) { td =>
    td.events
      .withColumn("bucket_ns", col("ts") - col("ts") % DayNs)
      .withColumn("svc", col("user_id") % 4)
      .groupBy(col("bucket_ns"), col("svc"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .groupBy(col("bucket_ns"), col("svc"))
      .agg((sum(col("n")) * 1.0 / 86400.0).as("rate"))
      .orderBy("bucket_ns", "svc")
  }

  /** Many-to-one matching `v / on(event_type) group_left info` — each
    * (step, series) row joins the single per-type info series
    * (reference bin_op.go group_left/right modifiers;
    * metric_expr.go:238-253).
    */
  val groupLeft: Q = q(
    "promql_group_left",
    s"""SELECT a.bucket_ns, a.event_type, CAST(a.n AS DOUBLE) / b.total AS share
       |FROM (
       |  SELECT epoch_ns(ts) - epoch_ns(ts) % $DayNs AS bucket_ns, event_type, COUNT(*) AS n
       |  FROM events GROUP BY 1, 2) a
       |JOIN (SELECT event_type, COUNT(*) AS total FROM events GROUP BY 1) b
       |  USING (event_type)
       |ORDER BY a.bucket_ns, a.event_type""".stripMargin
  ) { td =>
    val a = td.events
      .withColumn("bucket_ns", col("ts") - col("ts") % DayNs)
      .groupBy(col("bucket_ns"), col("event_type"))
      .agg(count(lit(1)).as("n"))
    val b = td.events.groupBy(col("event_type")).agg(count(lit(1)).as("total"))
    a.join(broadcast(b), Seq("event_type"))
      .select(col("bucket_ns"), col("event_type"),
        (col("n").cast("double") / col("total")).as("share"))
      .orderBy("bucket_ns", "event_type")
  }

  /** Exemplars query: per-series exemplar rows in a time/value range
    * (reference querier_metrics_exemplars.go; promhandler.go:392-460).
    */
  val exemplars: Q = q(
    "promql_exemplars",
    """SELECT event_type, epoch_us(ts) AS ts_us, event_id AS exemplar_id, value
      |FROM events
      |WHERE event_type = 'error' AND value > 300
      |ORDER BY ts_us, exemplar_id LIMIT 50""".stripMargin
  ) { td =>
    td.events
      .filter(col("event_type") === "error" && col("value") > 300)
      .select(col("event_type"), expr("ts div 1000").as("ts_us"),
        col("event_id").as("exemplar_id"), col("value"))
      .orderBy("ts_us", "exemplar_id")
      .limit(50)
  }

  /** Exponential-histogram bucket decomposition + merge: values map to
    * power-of-two buckets (scale 0), per-series bucket counts merge
    * across the range — integer-exact bucket index via bit length, no
    * float log (reference querier_metrics_hist.go:88-167
    * convertBucketsLayout).
    */
  val expHistogramMerge: Q = q(
    "promql_exp_histogram_merge",
    """SELECT event_type, length(bin(CAST(FLOOR(value) AS BIGINT))) - 1 AS bucket_idx,
      |  COUNT(*) AS n
      |FROM events WHERE value >= 1
      |GROUP BY event_type, bucket_idx ORDER BY event_type, bucket_idx""".stripMargin
  ) { td =>
    td.events
      .filter(col("value") >= 1)
      .select(col("event_type"),
        (length(bin(floor(col("value")).cast("long"))) - 1).as("bucket_idx"))
      .groupBy(col("event_type"), col("bucket_idx"))
      .agg(count(lit(1)).as("n"))
      .orderBy("event_type", "bucket_idx")
  }

  /** ProfileQL selector `name{svc="1"}` — fetch matching profile series
    * and total their sample values (reference
    * internal/profileql/parser.go:10-230, profiles fetch
    * storagebackend/profiles.go:99-182).
    */
  val profileSelector: Q = q(
    "profileql_selector",
    s"""SELECT event_type AS name, user_id % 4 AS svc, COUNT(*) AS n_samples,
       |  ${Det.oSum("value")} AS total
       |FROM events WHERE event_type IN ('click', 'view') AND user_id % 4 = 1
       |GROUP BY name, svc ORDER BY name, svc""".stripMargin
  ) { td =>
    td.events
      .filter(col("event_type").isin("click", "view") && col("user_id") % 4 === 1)
      .groupBy(col("event_type").as("name"), (col("user_id") % 4).as("svc"))
      .agg(count(lit(1)).as("n_samples"), Det.dsum(col("value")).as("total"))
      .orderBy("name", "svc")
  }

  /** Flame-tree merge: stacks (3 levels from lineitem) fold into
    * per-prefix totals — the levels array Pyroscope renders (reference
    * internal/profilestorage/flametree.go + profilehandler.go:164-223).
    * One aggregation per depth, unioned; at scale each is a partial-agg
    * groupBy, and the union is append-only.
    */
  val flameTree: Q = q(
    "profileql_flame_tree",
    s"""SELECT depth, path, CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS total, COUNT(*) AS n
       |FROM (
       |  SELECT 1 AS depth, l_returnflag AS path, l_quantity FROM lineitem
       |  UNION ALL
       |  SELECT 2, l_returnflag || ';' || l_linestatus, l_quantity FROM lineitem
       |  UNION ALL
       |  SELECT 3, l_returnflag || ';' || l_linestatus || ';p' || CAST(l_partkey % 5 AS VARCHAR), l_quantity
       |  FROM lineitem)
       |GROUP BY depth, path ORDER BY depth, path""".stripMargin
  ) { td =>
    val li = td.lineitem
    val d1 = li.select(lit(1).as("depth"), col("l_returnflag").as("path"), col("l_quantity"))
    val d2 = li.select(lit(2).as("depth"),
      concat_ws(";", col("l_returnflag"), col("l_linestatus")).as("path"), col("l_quantity"))
    val d3 = li.select(lit(3).as("depth"),
      concat(col("l_returnflag"), lit(";"), col("l_linestatus"), lit(";p"),
        (col("l_partkey") % 5).cast("string")).as("path"), col("l_quantity"))
    d1.unionAll(d2).unionAll(d3)
      .groupBy(col("depth"), col("path"))
      .agg(Det.dsum(col("l_quantity")).as("total"), count(lit(1)).as("n"))
      .orderBy("depth", "path")
  }

  /** Flame-graph DIFF: baseline vs comparison window totals per stack
    * path, full-outer joined — the Pyroscope diff view (reference
    * profilehandler diff rendering). Decimal-exact totals, single
    * subtraction, co-partitioned on path.
    */
  val flameDiff: Q = q(
    "profileql_flame_diff",
    """SELECT COALESCE(a.path, b.path) AS path,
      |  CAST(COALESCE(a.t, 0) AS DOUBLE) AS base_total,
      |  CAST(COALESCE(b.t, 0) AS DOUBLE) AS comp_total,
      |  CAST(COALESCE(b.t, 0) - COALESCE(a.t, 0) AS DOUBLE) AS delta
      |FROM (
      |  SELECT l_returnflag || ';p' || CAST(l_partkey % 5 AS VARCHAR) AS path,
      |    SUM(CAST(l_quantity AS DECIMAL(18,4))) AS t
      |  FROM lineitem WHERE l_linestatus = 'F' GROUP BY 1) a
      |FULL OUTER JOIN (
      |  SELECT l_returnflag || ';p' || CAST(l_partkey % 5 AS VARCHAR) AS path,
      |    SUM(CAST(l_quantity AS DECIMAL(18,4))) AS t
      |  FROM lineitem WHERE l_linestatus = 'O' GROUP BY 1) b
      |ON a.path = b.path
      |ORDER BY path""".stripMargin
  ) { td =>
    def side(status: String) = td.lineitem
      .filter(col("l_linestatus") === status)
      .groupBy(concat(col("l_returnflag"), lit(";p"),
        (col("l_partkey") % 5).cast("string")).as("path"))
      .agg(sum(col("l_quantity").cast(Det.DecT)).as("t"))
    val zero = lit(0).cast(Det.DecT)
    side("F").alias("a").join(side("O").alias("b"),
        col("a.path") === col("b.path"), "full_outer")
      .select(
        coalesce(col("a.path"), col("b.path")).as("path"),
        coalesce(col("a.t"), zero).cast("double").as("base_total"),
        coalesce(col("b.t"), zero).cast("double").as("comp_total"),
        (coalesce(col("b.t"), zero) - coalesce(col("a.t"), zero))
          .cast("double").as("delta"))
      .orderBy("path")
  }

  override def queries: Seq[Q] = Seq(
    sumByRate, groupLeft, exemplars, expHistogramMerge,
    profileSelector, flameTree, flameDiff
  )
}
