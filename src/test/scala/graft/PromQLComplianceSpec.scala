package graft

import org.apache.spark.sql.DataFrame

import graft.promql.PromQL

/** Coverage against the reference's PromQL compliance corpus
  * (dev/local/ch-compliance/promql-test-queries.yml, 119 templated
  * queries): every supported query must PARSE; every known-unsupported
  * query must keep throwing — when a feature lands, the ledger entry
  * moves up, so semantic drift in either direction fails the build.
  * Template variables are expanded with the tester's standard
  * substitutions (one representative per class where exhaustive
  * expansion adds nothing).
  *
  * Beyond the parse ledger, the corpus EXECUTES (the reference's
  * tester compares RESULTS against a vanilla Prometheus,
  * cmd/promql-compliance-tester; here the oracle is a native Scala
  * re-evaluation — including the upstream extrapolation algorithm —
  * over a fixed 21-sample demo-service fixture): every supported
  * query family is compared value-for-value and series-for-series, so
  * a parser feature the planner silently ignores (the round-4
  * by/without trap class) fails `sbt test`.
  */
class PromQLComplianceSpec extends SparkTestBase {

  private val aggOps = Seq("sum", "avg", "max", "min", "count", "stddev", "stdvar")
  private val mathFns = Seq("abs", "ceil", "floor", "exp", "ln", "log2", "log10", "sqrt")
  private val dateFns = Seq("minute", "hour", "day_of_week", "day_of_month",
    "day_of_year", "days_in_month", "month", "year")

  private val supported: Seq[String] =
    Seq(
      // scalar literals
      "42", "1.234", ".123", "1.23e-3", "0x3d", "Inf", "+Inf", "-Inf", "NaN",
      // vector selectors
      "demo_memory_usage_bytes",
      """{__name__="demo_memory_usage_bytes"}""",
      """demo_memory_usage_bytes{type="free"}""",
      """demo_memory_usage_bytes{type!="free"}""",
      """demo_memory_usage_bytes{instance=~"demo.promlabs.com:.*"}""",
      """demo_memory_usage_bytes{instance!~".*:10000"}""",
      """demo_memory_usage_bytes{type="free", instance!="demo.promlabs.com:10000"}""",
      "nonexistent_metric_name",
      // aggregations
      "avg(max by(type) (demo_memory_usage_bytes))",
      "topk (3, demo_memory_usage_bytes)",
      "bottomk by(instance) (2, demo_memory_usage_bytes)",
      "quantile(0.84, demo_memory_usage_bytes)",
      // binary expressions
      "1 * 2 + 4 / 6 - 10 % 2 ^ 2",
      "demo_num_cpus + (1 == bool 2)",
      "demo_memory_usage_bytes % 1.2345",
      "demo_memory_usage_bytes <= bool 1.2345",
      "1.2345 >= bool demo_memory_usage_bytes",
      "(1 * 2 + 4 / 6 - (10%7)^2) / demo_memory_usage_bytes",
      "demo_memory_usage_bytes ^ (1 * 2 + 4 / 6 - 10)",
      "demo_memory_usage_bytes * on(instance, job, type) demo_memory_usage_bytes",
      "sum by(instance, type) (demo_memory_usage_bytes) / on(instance, type) group_left(job) demo_memory_usage_bytes",
      "sum without(job) (demo_memory_usage_bytes) / on(instance, type) group_left demo_memory_usage_bytes",
      "demo_num_cpus * Inf",
      "demo_num_cpus * -Inf",
      "demo_num_cpus * NaN",
      "demo_memory_usage_bytes + -(1)",
      "-demo_memory_usage_bytes",
      "-1 ^ 2",
      // time()
      "1 + time()", "time() - 1", "time() >= bool 1", "time() % time()",
      "time() * demo_memory_usage_bytes",
      // over-time + rate family
      "quantile_over_time(0.84, demo_memory_usage_bytes[1m])",
      "deriv(demo_disk_usage_bytes[1m])",
      "predict_linear(demo_disk_usage_bytes[1m], 600)",
      "time()",
      // label functions
      """label_replace(demo_num_cpus, "job", "destination-value-$1", "instance", "demo.promlabs.com:(.*)")""",
      """label_join(demo_num_cpus, "new_label", "-", "instance", "job")""",
      // date functions, no-arg and offset forms
      "resets(demo_cpu_usage_seconds_total[1m])",
      "changes(demo_batch_last_success_timestamp_seconds[1m])",
      "vector(1.23)", "vector(time())",
      "histogram_quantile(0.9, rate(demo_api_request_duration_seconds_bucket[1m]))",
      "histogram_quantile(0.9, nonexistent_metric)",
      "clamp(demo_memory_usage_bytes, 0, 1)",
      "clamp_max(demo_memory_usage_bytes, 2)",
      "clamp_min(demo_memory_usage_bytes, 2)",
      """count_values("value", demo_api_request_duration_seconds_bucket)""",
      "absent(demo_memory_usage_bytes)",
      "absent(nonexistent_metric_name)",
      "timestamp(demo_num_cpus)",
      "timestamp(timestamp(demo_num_cpus))",
      "avg_over_time(rate(demo_cpu_usage_seconds_total[1m])[2m:10s])",
      // round-5 additions: trig family + atan2 binop, scalar(), group,
      // !=, pi(), mad/holt_winters
      "demo_memory_usage_bytes atan2 demo_memory_usage_bytes",
      "deg(sin(demo_memory_usage_bytes) atan2 cos(demo_memory_usage_bytes))",
      "rad(deg(atan(tan(demo_memory_usage_bytes))))",
      "sinh(cosh(tanh(asin(acos(demo_memory_usage_bytes / 1e10)))))",
      "scalar(demo_num_cpus) * demo_memory_usage_bytes",
      "demo_memory_usage_bytes / scalar(sum(demo_memory_usage_bytes))",
      "group by(instance) (demo_memory_usage_bytes)",
      "demo_memory_usage_bytes != 1.2345",
      "demo_memory_usage_bytes != bool 1.2345",
      "vector(pi())",
      "mad_over_time(demo_memory_usage_bytes[1m])",
      """sort_by_label(demo_memory_usage_bytes, "instance")""",
      """sort_by_label_desc(demo_memory_usage_bytes, "instance", "job")""",
      "holt_winters(demo_disk_usage_bytes[1m], 0.5, 0.3)",
      "double_exponential_smoothing(demo_disk_usage_bytes[1m], 0.5, 0.3)",
      // round-6: bare-selector offset (both signs), corpus
      // variant_args ["offset"]
      "demo_memory_usage_bytes offset 1m",
      "demo_memory_usage_bytes offset -1m"
    ) ++
      aggOps.map(op => s"$op(demo_memory_usage_bytes)") ++
      aggOps.map(op => s"$op by(instance) (demo_memory_usage_bytes)") ++
      aggOps.map(op => s"$op without(instance, type) (demo_memory_usage_bytes)") ++
      mathFns.map(f => s"$f(demo_memory_usage_bytes)") ++
      mathFns.map(f => s"$f(-demo_memory_usage_bytes)") ++
      Seq("avg", "sum", "max", "min", "count")
        .map(f => s"${f}_over_time(demo_memory_usage_bytes[1m])") ++
      Seq("rate", "increase", "delta")
        .map(f => s"$f(demo_cpu_usage_seconds_total[1m])") ++
      Seq("irate", "idelta")
        .map(f => s"$f(demo_cpu_usage_seconds_total[1m])") ++
      dateFns.map(f => s"$f()") ++
      dateFns.map(f => s"$f(demo_batch_last_success_timestamp_seconds)")

  /** Corpus queries the grammar intentionally rejects today — each must
    * KEEP throwing at parse; a passing parse here means a feature landed
    * and the entry belongs in `supported` (with planner coverage).
    * Plan-time rejections (subquery-of-expression, invalid regexes) are
    * NOT listed — they parse, and their errors surface when planned.
    */
  private val knownUnsupported: Seq[String] = Seq(
    // wrong arity on the parameterized range functions
    "holt_winters(demo_disk_usage_bytes[1m], 0.5)",
    "predict_linear(demo_disk_usage_bytes[1m])",
    "quantile_over_time(demo_memory_usage_bytes[1m])",
    // the corpus's should_fail entry: every matcher accepts the empty
    // string — upstream rejects the whole-store selector, so do we
    """{__name__=~".*"}""",
    """{job=~".*"}"""
  )

  test("compliance corpus: every supported query parses") {
    val failures = supported.flatMap { q =>
      try { PromQL.parse(q); None }
      catch { case e: Throwable => Some(s"$q -> ${e.getMessage}") }
    }
    assert(failures.isEmpty, s"\n${failures.mkString("\n")}")
  }

  test("compliance corpus: known-unsupported queries still throw") {
    val landed = knownUnsupported.flatMap { q =>
      try { PromQL.parse(q) match { case _ => Some(q) } }
      catch { case _: Throwable => None }
    }
    assert(landed.isEmpty,
      s"now parse — move to `supported` and add planner coverage:\n${landed.mkString("\n")}")
  }

  // ------------------------------------------------------------------
  // Executed ledger: the corpus shapes against a fixed demo-service
  // fixture, results compared value-for-value against a native
  // (non-Spark) re-evaluation.
  // ------------------------------------------------------------------

  private val T = 300000000L      // eval time: t = 300s
  private val StepUs = 15000000L  // 15s scrape interval, k = 0..20
  private val insts = Seq("demo.promlabs.com:10000", "demo.promlabs.com:10001")

  /** One fixture series: name, labels, sample value at scrape k.
    * NaN marks a stale sample (skipped by the lookback rule).
    */
  private case class S(name: String, labels: Map[String, String],
      at: Int => Double) {
    def samples: Seq[(Long, Double)] = (0 to 20).map(k => (k * StepUs, at(k)))
  }

  private val memSeries = for {
    (inst, ii) <- insts.zipWithIndex
    (tp, ti) <- Seq("free", "used").zipWithIndex
  } yield S("demo_memory_usage_bytes",
    Map("instance" -> inst, "job" -> "demo", "type" -> tp),
    k => (ii + 1) * 1000.0 + ti * 100.0 + (7 * k + 3 * ii + 5 * ti) % 13)

  // counter; instance 0 resets at k = 12
  private val cpuSeries = insts.zipWithIndex.map { case (inst, ii) =>
    S("demo_cpu_usage_seconds_total", Map("instance" -> inst, "job" -> "demo"),
      k => if (ii == 0) { if (k < 12) 10.0 + 3 * k else 2.0 + 3 * (k - 12) }
      else 5.0 + 4.0 * k)
  }

  // exactly linear — deriv/predict_linear close forms
  private val diskSeries = insts.zipWithIndex.map { case (inst, ii) =>
    S("demo_disk_usage_bytes", Map("instance" -> inst, "job" -> "demo"),
      k => 1000.0 * (ii + 1) + 50.0 * k)
  }

  private val cpusSeries = insts.zipWithIndex.map { case (inst, ii) =>
    S("demo_num_cpus", Map("instance" -> inst, "job" -> "demo"),
      _ => 4.0 + 4 * ii)
  }

  private val batchSeries = insts.zipWithIndex.map { case (inst, ii) =>
    S("demo_batch_last_success_timestamp_seconds",
      Map("instance" -> inst, "job" -> "demo"), _ => 1723500000.0 + 3600 * ii)
  }

  private val bucketLes = Seq("0.1", "0.5", "1", "+Inf")
  private val bucketSeries = for {
    (inst, ii) <- insts.zipWithIndex
    (le, li) <- bucketLes.zipWithIndex
  } yield S("demo_api_request_duration_seconds_bucket",
    Map("instance" -> inst, "job" -> "demo", "le" -> le),
    k => if (ii == 0) Seq(10.0 + k, 30.0 + 2 * k, 45.0 + 2 * k, 50.0 + 3 * k)(li)
    else Seq(5.0 + k, 20.0 + k, 30.0 + 2 * k, 40.0 + 2 * k)(li))

  // staleness: live only through k = 10, stale-NaN afterwards
  private val intermittent = Seq(S("demo_intermittent_metric",
    Map("instance" -> insts.head, "job" -> "demo"),
    k => if (k <= 10) 7.0 + k else Double.NaN))

  private val allSeries = memSeries ++ cpuSeries ++ diskSeries ++
    cpusSeries ++ batchSeries ++ bucketSeries ++ intermittent

  private lazy val pts: DataFrame = {
    import spark.implicits._
    allSeries
      .flatMap(s => s.samples.map { case (ts, v) => (ts, s.name, s.labels, v) })
      .toDF("ts_us", "name", "labels", "value")
  }

  // ---- native oracle helpers ----

  private def live(s: S): Seq[(Long, Double)] = s.samples.filterNot(_._2.isNaN)

  /** Lookback rule: newest live sample in (t-5m, t]. */
  private def latestV(s: S, t: Long = T): Option[Double] =
    live(s).filter(p => p._1 <= t && p._1 > t - 300000000L)
      .sortBy(_._1).lastOption.map(_._2)

  /** Samples in the (end-range, end] window. */
  private def win(s: S, rangeUs: Long, end: Long = T): Seq[(Long, Double)] =
    live(s).filter(p => p._1 > end - rangeUs && p._1 <= end)

  private def byName(n: String): Seq[S] = allSeries.filter(_.name == n)

  private def instVec(n: String,
      pred: Map[String, String] => Boolean = _ => true): Map[Map[String, String], Double] =
    byName(n).filter(s => pred(s.labels))
      .flatMap(s => latestV(s).map(s.labels -> _)).toMap

  private def runQ(q: String): Map[Map[String, String], Double] =
    PromQL.instant(q, pts, T).collect()
      .map(r => r.getAs[Map[String, String]]("labels") -> r.getAs[Double]("value"))
      .toMap

  private def close(a: Double, b: Double): Boolean =
    (a.isNaN && b.isNaN) || a == b ||
      math.abs(a - b) <= math.abs(b) * 1e-9 + 1e-9

  private def assertQ(q: String,
      expected: Map[Map[String, String], Double]): Unit = {
    val got = runQ(q)
    assert(got.keySet == expected.keySet,
      s"$q series mismatch:\n got  ${got.keySet}\n want ${expected.keySet}")
    expected.foreach { case (k, v) =>
      assert(close(got(k), v), s"$q value at $k: got ${got(k)}, want $v")
    }
  }

  private def one(v: Double): Map[Map[String, String], Double] =
    Map(Map.empty[String, String] -> v)

  /** Prometheus quantile: linear interpolation on rank φ(n-1). */
  private def promQuantile(phi: Double, vs: Seq[Double]): Double = {
    val sorted = vs.sorted
    val rank = phi * (sorted.size - 1)
    val lo = sorted(math.max(0, rank.toInt))
    val hi = sorted(math.min(rank.toInt + 1, sorted.size - 1))
    lo + (hi - lo) * (rank - rank.toInt)
  }

  /** The upstream extrapolated rate/increase/delta (promql
    * extrapolatedRate): extrapolate the first-to-last delta to the
    * window bounds, half-interval-capped, with the counter
    * zero-crossing clamp on the start side.
    */
  private def extrapolated(samples: Seq[(Long, Double)], rangeUs: Long,
      endUs: Long, isCounter: Boolean, isRate: Boolean): Option[Double] = {
    if (samples.size < 2) return None
    val startS = (endUs - rangeUs) / 1e6
    val endS = endUs / 1e6
    val first = samples.head
    val last = samples.last
    var delta = last._2 - first._2
    if (isCounter) {
      var prev = first._2
      for ((_, v) <- samples.tail) { if (v < prev) delta += prev; prev = v }
    }
    val sampledInterval = (last._1 - first._1) / 1e6
    val avgBetween = sampledInterval / (samples.size - 1)
    var durToStart = first._1 / 1e6 - startS
    var durToEnd = endS - last._1 / 1e6
    if (isCounter && delta > 0 && first._2 >= 0) {
      val durToZero = sampledInterval * (first._2 / delta)
      if (durToZero < durToStart) durToStart = durToZero
    }
    val threshold = avgBetween * 1.1
    if (durToStart >= threshold) durToStart = avgBetween / 2
    if (durToEnd >= threshold) durToEnd = avgBetween / 2
    val factor = (sampledInterval + durToStart + durToEnd) / sampledInterval
    Some(if (isRate) delta * factor / (rangeUs / 1e6) else delta * factor)
  }

  private def vecOf(series: Seq[S], f: S => Option[Double]): Map[Map[String, String], Double] =
    series.flatMap(s => f(s).map(s.labels -> _)).toMap

  // ---- executed families ----

  test("executed ledger: selectors, matchers, offset, staleness") {
    val mem = "demo_memory_usage_bytes"
    assertQ(mem, instVec(mem))
    assertQ(s"""{__name__="$mem"}""", instVec(mem))
    assertQ(s"""$mem{type="free"}""", instVec(mem, _("type") == "free"))
    assertQ(s"""$mem{type!="free"}""", instVec(mem, _("type") != "free"))
    assertQ(s"""$mem{instance=~"demo.promlabs.com:.*"}""", instVec(mem))
    assertQ(s"""$mem{instance=~"host"}""", Map.empty) // fully anchored
    assertQ(s"""$mem{instance!~".*:10000"}""",
      instVec(mem, !_("instance").endsWith(":10000")))
    assertQ(s"""$mem{type="free", instance!="demo.promlabs.com:10000"}""",
      instVec(mem, l => l("type") == "free" && l("instance") != "demo.promlabs.com:10000"))
    assertQ(s"""{type="free", instance!="demo.promlabs.com:10000"}""",
      instVec(mem, l => l("type") == "free" && l("instance") != "demo.promlabs.com:10000"))
    assertQ("nonexistent_metric_name", Map.empty)
    // offset: latest sample at or before t-offset
    assertQ(s"$mem offset 1m", vecOf(memSeries, s => latestV(s, T - 60000000L)))
    assertQ(s"$mem offset -1m", vecOf(memSeries, s => latestV(s, T + 60000000L)))
    // staleness: NaN samples after k=10 are skipped, k=10 survives
    assertQ("demo_intermittent_metric",
      Map(intermittent.head.labels -> 17.0))
  }

  test("executed ledger: aggregation matrix (by/without/k/quantile)") {
    val mem = memSeries
    val latest = vecOf(mem, latestV(_))
    def agg(op: String, vs: Seq[Double]): Double = op match {
      case "sum"   => vs.sum
      case "avg"   => vs.sum / vs.size
      case "max"   => vs.max
      case "min"   => vs.min
      case "count" => vs.size.toDouble
      case "stddev" =>
        val m = vs.sum / vs.size
        math.sqrt(vs.map(x => (x - m) * (x - m)).sum / vs.size)
      case "stdvar" =>
        val m = vs.sum / vs.size
        vs.map(x => (x - m) * (x - m)).sum / vs.size
    }
    def grouped(keys: Seq[String], keep: Boolean): Map[Map[String, String], Seq[Double]] =
      latest.toSeq.groupBy { case (l, _) =>
        if (keep) l.view.filterKeys(keys.contains).toMap
        else l.view.filterKeys(k => !keys.contains(k)).toMap
      }.view.mapValues(_.map(_._2)).toMap
    for (op <- aggOps) {
      assertQ(s"$op(demo_memory_usage_bytes)", one(agg(op, latest.values.toSeq)))
      assertQ(s"$op(nonexistent_metric_name)", Map.empty)
      assertQ(s"$op by() (demo_memory_usage_bytes)",
        one(agg(op, latest.values.toSeq)))
      assertQ(s"$op by(instance) (demo_memory_usage_bytes)",
        grouped(Seq("instance"), keep = true).view.mapValues(agg(op, _)).toMap)
      assertQ(s"$op by(instance, type) (demo_memory_usage_bytes)",
        grouped(Seq("instance", "type"), keep = true).view.mapValues(agg(op, _)).toMap)
      assertQ(s"$op by(nonexistent) (demo_memory_usage_bytes)",
        one(agg(op, latest.values.toSeq)))
      assertQ(s"$op without(instance) (demo_memory_usage_bytes)",
        grouped(Seq("instance"), keep = false).view.mapValues(agg(op, _)).toMap)
      assertQ(s"$op without(instance, type) (demo_memory_usage_bytes)",
        grouped(Seq("instance", "type"), keep = false).view.mapValues(agg(op, _)).toMap)
      assertQ(s"$op without(nonexistent) (demo_memory_usage_bytes)",
        latest.map { case (l, v) => l -> agg(op, Seq(v)) })
    }
    // topk/bottomk keep whole series, ranked by value
    val ranked = latest.toSeq.sortBy(-_._2)
    assertQ("topk (3, demo_memory_usage_bytes)", ranked.take(3).toMap)
    assertQ("bottomk (1, demo_memory_usage_bytes)",
      Map(ranked.last._1 -> ranked.last._2))
    // per-instance bottomk(2) keeps both type series of each instance
    assertQ("bottomk by(instance) (2, demo_memory_usage_bytes)", latest)
    for (phi <- Seq(0.0, 0.5, 0.84, 1.0))
      assertQ(s"quantile($phi, demo_memory_usage_bytes)",
        one(promQuantile(phi, latest.values.toSeq)))
    // nested aggregation
    val maxByType = grouped(Seq("type"), keep = true)
      .view.mapValues(_.max).values.toSeq
    assertQ("avg(max by(type) (demo_memory_usage_bytes))",
      one(maxByType.sum / maxByType.size))
    // group: 1 per group
    assertQ("group by(instance) (demo_memory_usage_bytes)",
      grouped(Seq("instance"), keep = true).view.mapValues(_ => 1.0).toMap)
  }

  test("executed ledger: scalar binops, comparisons, set ops, matching") {
    val latest = vecOf(memSeries, latestV(_))
    val cpus = vecOf(cpusSeries, latestV(_))
    assertQ("demo_memory_usage_bytes % 1.2345",
      latest.view.mapValues(_ % 1.2345).toMap)
    assertQ("demo_memory_usage_bytes <= bool 1.2345",
      latest.view.mapValues(v => if (v <= 1.2345) 1.0 else 0.0).toMap)
    assertQ("1.2345 >= bool demo_memory_usage_bytes",
      latest.view.mapValues(v => if (1.2345 >= v) 1.0 else 0.0).toMap)
    assertQ("demo_memory_usage_bytes != 1.2345", latest)
    assertQ("demo_memory_usage_bytes != bool 1.2345",
      latest.view.mapValues(_ => 1.0).toMap)
    assertQ("demo_num_cpus + (1 == bool 2)", cpus)
    assertQ("demo_num_cpus * Inf",
      cpus.view.mapValues(_ * Double.PositiveInfinity).toMap)
    assertQ("demo_num_cpus * -Inf",
      cpus.view.mapValues(_ * Double.NegativeInfinity).toMap)
    assertQ("demo_num_cpus * NaN",
      cpus.view.mapValues(_ => Double.NaN).toMap)
    assertQ("demo_memory_usage_bytes + -(1)",
      latest.view.mapValues(_ - 1).toMap)
    assertQ("-demo_memory_usage_bytes", latest.view.mapValues(-_).toMap)
    assertQ("-1 ^ 2", one(-1.0)) // unary minus binds looser than ^
    assertQ("42", one(42.0))
    assertQ("1.23e-3", one(1.23e-3))
    assertQ("0x3d", one(61.0))
    assertQ("Inf", one(Double.PositiveInfinity))
    assertQ("NaN", one(Double.NaN))
    assertQ("1 + time()", one(301.0))
    assertQ("time() - 1", one(299.0))
    assertQ("time() >= bool 1", one(1.0))
    assertQ("time() % time()", one(0.0))
    assertQ("time() * demo_num_cpus", cpus.view.mapValues(_ * 300).toMap)
    // one-to-one matching on the full label set: v²
    assertQ("demo_memory_usage_bytes * on(instance, job, type) demo_memory_usage_bytes",
      latest.view.mapValues(v => v * v).toMap)
    // group_left against the unaggregated side: ratio 1 per series
    assertQ("sum without(job) (demo_memory_usage_bytes) / on(instance, type) group_left demo_memory_usage_bytes",
      latest.map { case (l, _) => l.removed("job") -> 1.0 })
    assertQ("demo_memory_usage_bytes atan2 demo_memory_usage_bytes",
      latest.view.mapValues(v => math.atan2(v, v)).toMap)
    // set ops over full-label matching
    assertQ("""demo_memory_usage_bytes{type="free"} or demo_memory_usage_bytes""",
      latest)
    assertQ("""demo_memory_usage_bytes and demo_memory_usage_bytes{type="free"}""",
      latest.view.filterKeys(_("type") == "free").toMap)
    assertQ("""demo_memory_usage_bytes unless demo_memory_usage_bytes{type="free"}""",
      latest.view.filterKeys(_("type") != "free").toMap)
  }

  test("executed ledger: math and trig function surface") {
    val latest = vecOf(memSeries, latestV(_))
    val natives: Seq[(String, Double => Double)] = Seq(
      "abs" -> math.abs, "ceil" -> math.ceil, "floor" -> math.floor,
      "exp" -> math.exp, "ln" -> math.log, "log2" -> (x => math.log(x) / math.log(2.0)),
      "log10" -> math.log10, "sqrt" -> math.sqrt, "sgn" -> (x => math.signum(x)),
      "sin" -> math.sin, "cos" -> math.cos, "tan" -> math.tan,
      "atan" -> math.atan, "sinh" -> math.sinh, "cosh" -> math.cosh,
      "tanh" -> math.tanh, "deg" -> math.toDegrees, "rad" -> math.toRadians)
    for ((fn, nf) <- natives) {
      assertQ(s"$fn(demo_memory_usage_bytes)", latest.view.mapValues(nf).toMap)
      assertQ(s"$fn(-demo_memory_usage_bytes)",
        latest.view.mapValues(v => nf(-v)).toMap)
    }
    assertQ("asin(demo_num_cpus / 1e10)",
      vecOf(cpusSeries, latestV(_)).view.mapValues(v => math.asin(v / 1e10)).toMap)
    assertQ("clamp(demo_memory_usage_bytes, 0, 1)",
      latest.view.mapValues(_ => 1.0).toMap)
    assertQ("clamp_max(demo_memory_usage_bytes, 2)",
      latest.view.mapValues(_ => 2.0).toMap)
    assertQ("clamp_min(demo_memory_usage_bytes, 2)", latest)
    assertQ("round(demo_memory_usage_bytes)", latest) // integers already
  }

  test("executed ledger: over-time family on the 1m window") {
    def window(s: S): Seq[Double] = win(s, 60000000L).map(_._2)
    def overTime(f: Seq[Double] => Double): Map[Map[String, String], Double] =
      memSeries.map(s => s.labels -> f(window(s))).toMap
    assertQ("avg_over_time(demo_memory_usage_bytes[1m])",
      overTime(vs => vs.sum / vs.size))
    assertQ("sum_over_time(demo_memory_usage_bytes[1m])", overTime(_.sum))
    assertQ("max_over_time(demo_memory_usage_bytes[1m])", overTime(_.max))
    assertQ("min_over_time(demo_memory_usage_bytes[1m])", overTime(_.min))
    assertQ("count_over_time(demo_memory_usage_bytes[1m])",
      overTime(_.size.toDouble))
    assertQ("last_over_time(demo_memory_usage_bytes[1m])", overTime(_.last))
    assertQ("first_over_time(demo_memory_usage_bytes[1m])", overTime(_.head))
    assertQ("present_over_time(demo_memory_usage_bytes[1m])", overTime(_ => 1.0))
    assertQ("stddev_over_time(demo_memory_usage_bytes[1m])", overTime { vs =>
      val m = vs.sum / vs.size
      math.sqrt(vs.map(x => (x - m) * (x - m)).sum / vs.size)
    })
    assertQ("stdvar_over_time(demo_memory_usage_bytes[1m])", overTime { vs =>
      val m = vs.sum / vs.size
      vs.map(x => (x - m) * (x - m)).sum / vs.size
    })
    assertQ("quantile_over_time(0.84, demo_memory_usage_bytes[1m])",
      overTime(promQuantile(0.84, _)))
    assertQ("mad_over_time(demo_memory_usage_bytes[1m])", overTime { vs =>
      val med = promQuantile(0.5, vs)
      promQuantile(0.5, vs.map(x => math.abs(x - med)))
    })
  }

  test("executed ledger: rate family matches upstream extrapolation") {
    def rateVec(series: Seq[S], rangeUs: Long, isCounter: Boolean,
        isRate: Boolean): Map[Map[String, String], Double] =
      vecOf(series, s => extrapolated(win(s, rangeUs), rangeUs, T, isCounter, isRate))
    val cpu = "demo_cpu_usage_seconds_total"
    assertQ(s"rate($cpu[1m])",
      rateVec(cpuSeries, 60000000L, isCounter = true, isRate = true))
    assertQ(s"increase($cpu[1m])",
      rateVec(cpuSeries, 60000000L, isCounter = true, isRate = false))
    assertQ(s"delta($cpu[1m])",
      rateVec(cpuSeries, 60000000L, isCounter = false, isRate = false))
    // the 5m window crosses instance 0's reset at k=12
    assertQ(s"rate($cpu[5m])",
      rateVec(cpuSeries, 300000000L, isCounter = true, isRate = true))
    assertQ(s"increase($cpu[5m])",
      rateVec(cpuSeries, 300000000L, isCounter = true, isRate = false))
    // irate/idelta: last two samples only
    def lastTwo(s: S, counter: Boolean, rate: Boolean): Option[Double] = {
      val w = win(s, 60000000L)
      if (w.size < 2) None
      else {
        val Seq(p, l) = w.takeRight(2)
        val dv = if (counter && l._2 < p._2) l._2 else l._2 - p._2
        Some(if (rate) dv / ((l._1 - p._1) / 1e6) else dv)
      }
    }
    assertQ(s"irate($cpu[1m])",
      vecOf(cpuSeries, lastTwo(_, counter = true, rate = true)))
    assertQ(s"idelta($cpu[1m])",
      vecOf(cpuSeries, lastTwo(_, counter = false, rate = false)))
    // resets / changes over the full 5m window
    def pairwise(s: S, f: (Double, Double) => Boolean): Double =
      win(s, 300000000L).map(_._2).sliding(2).count {
        case Seq(a, b) => f(a, b); case _ => false
      }.toDouble
    assertQ(s"resets($cpu[5m])", cpuSeries.map(s => s.labels -> pairwise(s, _ > _)).toMap)
    assertQ(s"changes($cpu[5m])", cpuSeries.map(s => s.labels -> pairwise(s, _ != _)).toMap)
    assertQ("changes(demo_batch_last_success_timestamp_seconds[5m])",
      batchSeries.map(s => s.labels -> 0.0).toMap)
    // deriv / predict_linear: least-squares over the window, intercept
    // anchored at the eval timestamp (upstream linearRegression)
    def regression(s: S, rangeUs: Long): (Double, Double) = {
      val w = win(s, rangeUs)
      val xs = w.map(p => (p._1 - T) / 1e6)
      val ys = w.map(_._2)
      val n = xs.size.toDouble
      val mx = xs.sum / n; val my = ys.sum / n
      val slope = xs.zip(ys).map { case (x, y) => (x - mx) * (y - my) }.sum /
        xs.map(x => (x - mx) * (x - mx)).sum
      (slope, my - slope * mx)
    }
    assertQ("deriv(demo_disk_usage_bytes[1m])",
      diskSeries.map(s => s.labels -> regression(s, 60000000L)._1).toMap)
    assertQ("predict_linear(demo_disk_usage_bytes[1m], 600)",
      diskSeries.map { s =>
        val (slope, intercept) = regression(s, 60000000L)
        s.labels -> (intercept + slope * 600)
      }.toMap)
    // holt_winters / double_exponential_smoothing (sf=0.5, tf=0.3)
    def smooth(s: S): Double = {
      val vs = win(s, 60000000L).map(_._2)
      var s1 = vs.head
      var b = vs(1) - vs.head
      for (i <- 1 until vs.size) {
        val s0 = s1
        s1 = 0.5 * vs(i) + 0.5 * (s1 + b)
        b = 0.3 * (s1 - s0) + 0.7 * b
      }
      s1
    }
    assertQ("holt_winters(demo_disk_usage_bytes[1m], 0.5, 0.3)",
      diskSeries.map(s => s.labels -> smooth(s)).toMap)
    assertQ("double_exponential_smoothing(demo_disk_usage_bytes[1m], 0.5, 0.3)",
      diskSeries.map(s => s.labels -> smooth(s)).toMap)
  }

  test("executed ledger: histogram_quantile over buckets and rates") {
    def bucketQuantile(phi: Double, cum: Seq[(Double, Double)]): Double = {
      // cum: (le, cumulative count) ascending; upstream bucketQuantile
      val total = cum.last._2
      val rank = phi * total
      val idx = cum.indexWhere(_._2 >= rank)
      val (le, c) = cum(idx)
      if (le.isPosInfinity) cum.takeWhile(!_._1.isPosInfinity).last._1
      else {
        val (prevLe, prevC) =
          if (idx == 0) (0.0, 0.0) else cum(idx - 1)
        prevLe + (le - prevLe) * (rank - prevC) / (c - prevC)
      }
    }
    def perInstance(valueOf: S => Option[Double]): Map[Map[String, String], Double] =
      insts.map { inst =>
        val cum = bucketSeries.filter(_.labels("instance") == inst)
          .sortBy(s => s.labels("le") match {
            case "+Inf" => Double.PositiveInfinity; case x => x.toDouble
          })
          .flatMap(s => valueOf(s).map(v =>
            (s.labels("le") match {
              case "+Inf" => Double.PositiveInfinity; case x => x.toDouble
            }, v)))
        Map("instance" -> inst, "job" -> "demo") -> bucketQuantile(0.5, cum)
      }.toMap
    assertQ("histogram_quantile(0.5, demo_api_request_duration_seconds_bucket)",
      perInstance(latestV(_)))
    assertQ("histogram_quantile(0.5, rate(demo_api_request_duration_seconds_bucket[1m]))",
      perInstance(s => extrapolated(win(s, 60000000L), 60000000L, T,
        isCounter = true, isRate = true)))
    assertQ("histogram_quantile(0.9, nonexistent_metric)", Map.empty)
  }

  test("executed ledger: label fns, date fns, absent/timestamp/scalar/vector") {
    val cpus = vecOf(cpusSeries, latestV(_))
    assertQ("""label_replace(demo_num_cpus, "job", "destination-value-$1", "instance", "demo.promlabs.com:(.*)")""",
      cpus.map { case (l, v) =>
        l.updated("job", "destination-value-" + l("instance").split(':').last) -> v
      })
    assertQ("""label_join(demo_num_cpus, "new_label", "-", "instance", "job")""",
      cpus.map { case (l, v) =>
        l.updated("new_label", l("instance") + "-" + l("job")) -> v
      })
    // date fns over a timestamp-valued metric, natively recomputed
    val batch = vecOf(batchSeries, latestV(_))
    def dateOf(sec: Double): java.time.ZonedDateTime =
      java.time.Instant.ofEpochSecond(sec.toLong)
        .atZone(java.time.ZoneOffset.UTC)
    val dateNatives: Seq[(String, java.time.ZonedDateTime => Double)] = Seq(
      "minute" -> (_.getMinute.toDouble),
      "hour" -> (_.getHour.toDouble),
      "day_of_week" -> (d => (d.getDayOfWeek.getValue % 7).toDouble),
      "day_of_month" -> (_.getDayOfMonth.toDouble),
      "day_of_year" -> (_.getDayOfYear.toDouble),
      "days_in_month" -> (d => d.toLocalDate.lengthOfMonth.toDouble),
      "month" -> (_.getMonthValue.toDouble),
      "year" -> (_.getYear.toDouble))
    for ((fn, nf) <- dateNatives) {
      assertQ(s"$fn(demo_batch_last_success_timestamp_seconds)",
        batch.view.mapValues(v => nf(dateOf(v))).toMap)
      // no-arg form: vector(time()) = the eval timestamp (t = 300s)
      assertQ(s"$fn()", one(nf(dateOf(300.0))))
    }
    assertQ("absent(demo_memory_usage_bytes)", Map.empty)
    assertQ("absent(nonexistent_metric_name)", one(1.0))
    // samples land exactly on the eval step, so sample ts == eval ts
    assertQ("timestamp(demo_num_cpus)", cpus.view.mapValues(_ => 300.0).toMap)
    assertQ("timestamp(timestamp(demo_num_cpus))",
      cpus.view.mapValues(_ => 300.0).toMap)
    assertQ("vector(1.23)", one(1.23))
    assertQ("vector(time())", one(300.0))
    assertQ("vector(pi())", one(math.Pi))
    // scalar(): NaN unless exactly one series
    val latest = vecOf(memSeries, latestV(_))
    assertQ("scalar(demo_num_cpus) * demo_memory_usage_bytes",
      latest.view.mapValues(_ => Double.NaN).toMap)
    assertQ("demo_memory_usage_bytes / scalar(sum(demo_memory_usage_bytes))",
      latest.view.mapValues(_ / latest.values.sum).toMap)
    // count_values: occurrences per distinct value, the value label in
    // Go's shortest decimal formatting ("8", not "8.0")
    def fmtGo(v: Double): String =
      if (v == math.floor(v) && math.abs(v) < 1e15) v.toLong.toString
      else v.toString
    assertQ("""count_values("value", demo_num_cpus)""",
      cpus.values.toSeq.groupBy(identity).map { case (v, vs) =>
        Map("value" -> fmtGo(v)) -> vs.size.toDouble
      })
    // sort family: content-preserving
    assertQ("sort(demo_memory_usage_bytes)", latest)
    assertQ("sort_desc(demo_memory_usage_bytes)", latest)
    assertQ("""sort_by_label(demo_memory_usage_bytes, "instance")""", latest)
  }

  test("executed ledger: native-histogram histogram_quantile through the front-end") {
    // exp-histogram samples typed straight through range(): the engine
    // converts mapping-10/11 rows to cumulative le series at query time
    // (the reference's querier_metrics_hist.go conversion) and the
    // classic bucket interpolation runs unchanged.
    import spark.implicits._
    val T0 = 300000000L
    // series a (scale 0, SPARSE layout + zero bucket): zero=1,
    // idx1 (le 4] = 3, idx3 (le 16] = 6 → total 10, rank 9 falls in
    // idx3: 4 + (16-4)·(9-4)/(10-4) = 14
    // series b (scale 1, base √2): idx2 (le 2^1.5] = 5, idx4
    // (le 2^2.5] = 5 → rank 9 in idx4:
    // 2^1.5 + (2^2.5−2^1.5)·(9−5)/(10−5)
    val rows = Seq(
      (T0, "nh", Map("job" -> "a"), 1.0, 10, Option.empty[Int], 0),
      (T0, "nh", Map("job" -> "a"), 3.0, 11, Some(1), 0),
      (T0, "nh", Map("job" -> "a"), 6.0, 11, Some(3), 0),
      (T0, "nh", Map("job" -> "b"), 5.0, 11, Some(2), 1),
      (T0, "nh", Map("job" -> "b"), 5.0, 11, Some(4), 1))
      .toDF("ts_us", "name", "labels", "value", "mapping", "bucket_idx", "scale")
    val out = graft.promql.PromQL
      .range("histogram_quantile(0.9, sum_over_time(nh[5m]))", rows)
      .collect()
      .map(r => r.getMap[String, String](1)("job") -> r.getDouble(2))
      .toMap
    val b15 = math.pow(2.0, 1.5)
    val b25 = math.pow(2.0, 2.5)
    assert(math.abs(out("a") - 14.0) < 1e-9)
    assert(math.abs(out("b") - (b15 + (b25 - b15) * 4.0 / 5.0)) < 1e-9)
    // the instant endpoint takes the same typed path
    val inst = graft.promql.PromQL.instantExpr(
      "histogram_quantile(0.9, sum_over_time(nh[5m]))", rows, T0)
      .collect()
      .map(r => r.getMap[String, String](1)("job") -> r.getDouble(2))
      .toMap
    assert(math.abs(inst("a") - 14.0) < 1e-9)
    // plain (non-histogram) samples in the SAME frame are untouched
    val mixed = rows.unionByName(Seq(
      (T0, "plain", Map("job" -> "c"), 42.0, 0, Option.empty[Int], 0))
      .toDF("ts_us", "name", "labels", "value", "mapping", "bucket_idx", "scale"))
    val plain = graft.promql.PromQL
      .range("sum_over_time(plain[5m])", mixed)
      .collect().map(_.getDouble(2))
    assert(plain.toSeq == Seq(42.0))
    // histogram_count: the +Inf cumulative (= total observations)
    val counts = graft.promql.PromQL
      .range("histogram_count(sum_over_time(nh[5m]))", rows)
      .collect()
      .map(r => r.getMap[String, String](1)("job") -> r.getDouble(2))
      .toMap
    assert(counts == Map("a" -> 10.0, "b" -> 10.0))
    // histogram_fraction over series a (zero=1 @le0, 3 @le4, 6 @le16):
    //   F(8)  = 4 + (10−4)·(8−4)/(16−4) = 6
    //   F(2)  = 1 + (4−1)·(2−0)/(4−0)   = 2.5
    //   fraction = (6 − 2.5) / 10
    val frac = graft.promql.PromQL
      .range("histogram_fraction(2, 8, sum_over_time(nh[5m]))", rows)
      .collect()
      .map(r => r.getMap[String, String](1)("job") -> r.getDouble(2))
      .toMap
    assert(math.abs(frac("a") - 0.35) < 1e-9)
    // (lo, hi] is half-open at the lower bound: fraction(0, huge) for
    // series a EXCLUDES its zero-bucket mass (F(0) = 1 of 10); series b
    // has no zero bucket, so its full-domain fraction is 1
    val all = graft.promql.PromQL
      .range("histogram_fraction(0, 1000000, sum_over_time(nh[5m]))", rows)
      .collect()
      .map(r => r.getMap[String, String](1)("job") -> r.getDouble(2))
      .toMap
    assert(math.abs(all("a") - 0.9) < 1e-9 && all("b") == 1.0)
    // sum field (mapping 12) rides along as a tagged series:
    // histogram_sum/avg surface it, stddev/stdvar use mean = sum/count
    // with the geometric-mean bucket formula (zero-spanning buckets at
    // val 0, per funcHistogramStdDev)
    val withSum = rows.unionByName(Seq(
      (T0, "nh", Map("job" -> "a"), 50.0, 12, Option.empty[Int], 0),
      (T0, "nh", Map("job" -> "b"), 40.0, 12, Option.empty[Int], 1))
      .toDF("ts_us", "name", "labels", "value", "mapping", "bucket_idx", "scale"))
    def evalMap(q: String): Map[String, Double] = graft.promql.PromQL
      .range(q, withSum)
      .collect()
      .map(r => r.getMap[String, String](1)("job") -> r.getDouble(2))
      .toMap
    assert(evalMap("histogram_sum(sum_over_time(nh[5m]))") ==
      Map("a" -> 50.0, "b" -> 40.0))
    assert(evalMap("histogram_avg(sum_over_time(nh[5m]))") ==
      Map("a" -> 5.0, "b" -> 4.0))
    // a: n/val pairs (1,0) (3,0) (6,8), mean 5 →
    //    var = (1·25 + 3·25 + 6·9)/10 = 15.4
    // b: (5,0) (5,√(2^1.5·2^2.5)=4), mean 4 → var = 5·16/10 = 8
    val sv = evalMap("histogram_stdvar(sum_over_time(nh[5m]))")
    assert(math.abs(sv("a") - 15.4) < 1e-9 && math.abs(sv("b") - 8.0) < 1e-9)
    val sd = evalMap("histogram_stddev(sum_over_time(nh[5m]))")
    assert(math.abs(sd("a") - math.sqrt(15.4)) < 1e-9 &&
      math.abs(sd("b") - math.sqrt(8.0)) < 1e-9)
    // the sum series does not disturb the bucket math
    val q2 = evalMap("histogram_quantile(0.9, sum_over_time(nh[5m]))")
    assert(math.abs(q2("a") - 14.0) < 1e-9)
  }

  test("executed ledger: subquery avg_over_time(rate(...)[2m:10s])") {
    // inner rate on the absolute-aligned 10s grid over (t-2m, t]; each
    // step's window is the sliding (s-1m, s]; outer avg over the steps
    val expected = cpuSeries.map { s =>
      val steps = (190 to 300 by 10).map(_ * 1000000L)
      val inner = steps.flatMap(end =>
        extrapolated(win(s, 60000000L, end), 60000000L, end,
          isCounter = true, isRate = true))
      s.labels -> inner.sum / inner.size
    }.toMap
    assertQ("avg_over_time(rate(demo_cpu_usage_seconds_total[1m])[2m:10s])",
      expected)
  }

  test("set op with group modifier bypasses the window fusion") {
    // matches the shared-operand fusion guard in everything but the
    // op: must evaluate as a plain set op (group modifier ignored),
    // not route into binSelfGrouped and die in the arith finish
    val lhs = runQ("count_over_time(demo_memory_usage_bytes[5m])")
    val got = runQ("count_over_time(demo_memory_usage_bytes[5m]) and on(type) group_left sum by(type) (count_over_time(demo_memory_usage_bytes[5m]))")
    assert(got.keySet == lhs.keySet)
    lhs.foreach { case (k, v) => assert(close(got(k), v)) }
  }
}
