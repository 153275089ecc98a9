package graft

import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.propBoolean

import graft.api.RequestMetrics

/** Properties of the per-route request-metrics registry
  * (api/RequestMetrics.scala) — the counters an operator reads off
  * `GET /api/v1/routes`, so their contracts get pinned, not assumed:
  *
  *   1. COUNTS ARE EXACT under any recording sequence: total, per
  *      status, and the reported mean (counts are LongAdders; only
  *      the quantiles are approximate).
  *   2. QUANTILES ARE BUCKET-ACCURATE: the estimate lands inside the
  *      power-of-two bucket of the true order statistic at the same
  *      rank — the documented ≤2× bucket-edge error, never more.
  *   3. QUANTILES ARE MONOTONE in q (a p95 below the p50 would be a
  *      rendering bug an operator can't detect).
  *   4. EXACT under CONCURRENT recording: parallel writers lose
  *      nothing.
  */
object RequestMetricsPropertySpec extends Properties("RequestMetrics") {

  private val durGen: Gen[Long] = Gen.frequency(
    4 -> Gen.chooseNum(1L, 2000L),          // sub-2ms API hits
    3 -> Gen.chooseNum(2000L, 2000000L),    // 2ms–2s queries
    1 -> Gen.chooseNum(2000000L, 4000000000L)) // multi-minute outliers
  private val statusGen: Gen[Int] = Gen.oneOf(200, 200, 200, 400, 401, 422, 503)
  private val recordsGen: Gen[List[(Long, Int)]] =
    Gen.chooseNum(1, 400).flatMap(n =>
      Gen.listOfN(n, Gen.zip(durGen, statusGen)))

  /** The spec's own copy of the bucket geometry (128 µs · 2^i, last
    * bucket open) — the contract under test, restated independently.
    */
  private def bucketBounds(v: Long): (Double, Double) = {
    var i = 0
    var hi = 128L
    while (i < 25 && v > hi) { i += 1; hi *= 2 }
    val lo = if (i == 0) 0.0 else hi / 2.0
    (lo, if (i == 25) Double.MaxValue else hi.toDouble)
  }

  private def field(json: String, route: String, k: String): Double = {
    val m = java.util.regex.Pattern
      .compile(s""""route":"${java.util.regex.Pattern.quote(route)}".*?"$k":([0-9.]+)""")
      .matcher(json)
    require(m.find(), s"$k of $route not in $json")
    m.group(1).toDouble
  }

  property("counts, statuses, and mean are exact; quantiles bucket-accurate and monotone") =
    Prop.forAll(recordsGen) { recs =>
      val m = new RequestMetrics("t")
      recs.foreach { case (d, s) => m.record("/r", "GET", s, d) }
      val snap = m.snapshotJson
      val n = recs.size
      val sorted = recs.map(_._1).sorted.toIndexedSeq
      def trueAt(q: Double): Long =
        sorted(math.min(n - 1, math.max(0, math.ceil(q * n).toInt - 1)))
      val quantileChecks = Seq(0.50, 0.95, 0.99).map { q =>
        val est = field(snap, "/r", f"p${(q * 100).toInt}%d_ms") * 1000.0
        val (lo, hi) = bucketBounds(trueAt(q))
        // ±1 µs slack: the snapshot renders ms with 3 decimals
        (est >= lo - 1.0 && est <= hi + 1.0) :|
          f"p$q%.2f est=$est%.1fus outside bucket [$lo%.0f,$hi%.0f] of true=${trueAt(q)}"
      }
      Prop.all(Seq(
        (m.count("/r") == n.toLong) :| "count",
        (recs.groupBy(_._2).forall { case (s, g) =>
          m.statusCount("/r", s) == g.size.toLong
        }) :| "per-status counts",
        (math.abs(field(snap, "/r", "mean_ms") -
          recs.map(_._1).sum / 1000.0 / n) <= 0.002) :| "mean",
        (field(snap, "/r", "p50_ms") <= field(snap, "/r", "p95_ms") + 1e-9 &&
          field(snap, "/r", "p95_ms") <= field(snap, "/r", "p99_ms") + 1e-9)
          :| "monotone quantiles") ++ quantileChecks: _*)
    }

  property("concurrent recording loses nothing") =
    Prop.forAll(Gen.chooseNum(2, 8)) { threads =>
      val m = new RequestMetrics("t")
      val per = 5000
      val ts = (1 to threads).map(t => new Thread(() =>
        (1 to per).foreach(i => m.record("/r", "GET",
          if (i % 7 == 0) 503 else 200, (i % 1000).toLong + t))))
      ts.foreach(_.start()); ts.foreach(_.join())
      val want = threads.toLong * per
      (m.count("/r") == want &&
        m.statusCount("/r", 200) + m.statusCount("/r", 503) == want) :|
        s"lost records: ${m.count("/r")} of $want"
    }
}
