package graft

import org.apache.spark.sql.DataFrame

import graft.logql.{Ast, Parser, Planner}

/** End-to-end LogQL front-end tests: string → AST → DataFrame → rows,
  * mirroring the reference's engine-level eval tests
  * (internal/logql/logqlengine/engine_test.go shape).
  */
class LogQLSpec extends SparkTestBase {
  import spark.implicits._

  private val H = 3600L * 1000000000L // 1h in ns

  /** 12 log lines across 2 services, 3 hours. */
  private lazy val logs: DataFrame = {
    val rows = for {
      h <- 0 until 3
      i <- 0 until 4
    } yield {
      val svc = if (i % 2 == 0) "api" else "web"
      val status = if (i == 3) 500 else 200
      val ts = h * H + i * 60L * 1000000000L
      val body = s"""{"status": $status, "dur": "${100 + i * 10}ms", "msg": "req $i done"}"""
      (ts, body, Map("service" -> svc, "env" -> "prod"))
    }
    rows.toDF("ts_ns", "body", "labels")
  }

  private def run(q: String): DataFrame = Planner.query(q, logs)

  test("parser builds the expected AST shapes") {
    val Ast.LogExpr(lq) = Parser.parse(
      """{service="api", env=~"pro.*"} |= "done" != "oops" | json | status >= 500""")
    assert(lq.matchers.map(_.label) == Seq("service", "env"))
    assert(lq.matchers(1).op == Ast.MatchRe)
    assert(lq.stages.size == 4)

    val Ast.MetricExprTop(m) = Parser.parse(
      """topk(2, sum by (service) (count_over_time({env="prod"}[1h])))""")
    val Ast.VectorAgg("topk", _, _, Some(2), inner) = m
    val Ast.VectorAgg("sum", by, _, None, r: Ast.RangeAgg) = inner
    assert(by == Seq("service"))
    assert(r.rangeNs == H)

    intercept[Parser.ParseError](Parser.parse("{service=}"))
    intercept[Parser.ParseError](Parser.parse("count_over_time({a=\"b\"})"))
    // grouping is only legal on the regrouping ops (reference
    // metric_expr.go:48-60)
    intercept[Parser.ParseError](
      Parser.parse("""count_over_time({a="b"}[1m]) by (service)"""))
    intercept[Parser.ParseError](
      Parser.parse("""rate({a="b"}[1m]) without (service)"""))
    intercept[Parser.ParseError](
      Parser.parse("""sum_over_time({a="b"} | unwrap x [1m]) by (service)"""))
  }

  test("range-agg grouping regroups samples BEFORE the window agg") {
    // per hour: statuses are 200,200,200,500 across both services.
    // by (env) pools them → avg 275; a per-stream avg re-averaged
    // would give (200 + 350)/2 = 275 too, so also check max/min per
    // service split: by (service) → api avg 200, web avg 350.
    val out = run("""avg_over_time({env="prod"} | json | unwrap status [1h]) by (service)""")
      .collect()
    assert(out.length == 6) // 3 hours × 2 services
    val bySvc = out.map(r =>
      (r.getAs[Map[String, String]]("labels"), r.getAs[Double]("value")))
    bySvc.foreach { case (labels, v) =>
      assert(labels.keySet == Set("service"))
      if (labels("service") == "api") assert(v == 200.0) else assert(v == 350.0)
    }
    // pooled across everything: by (env) keeps only env → one series
    val pooled = run("""avg_over_time({env="prod"} | json | unwrap status [1h]) by (env)""")
      .collect()
    assert(pooled.length == 3 && pooled.forall(_.getAs[Double]("value") == 275.0))
    // without (service, status, ...) — drop down to env as well
    val wo = run(
      """max_over_time({env="prod"} | json | unwrap status [1h]) without (service, status, dur, msg)""")
      .collect()
    assert(wo.length == 3 && wo.forall(_.getAs[Double]("value") == 500.0))
  }

  test("approx_quantile_over_time: discrete-sketch twin of the exact quantile") {
    // web's hourly statuses are [200, 500]: the exact variant
    // rank-interpolates to 350, the sketch answers with the actual
    // sample at the discrete rank (200); api's ties land on 200 in both
    val approx = run(
      """approx_quantile_over_time(0.5, {env="prod"} | json | unwrap status [1h]) by (service)""")
      .collect()
    assert(approx.length == 6) // 3 hours × 2 services
    assert(approx.forall(_.getAs[Double]("value") == 200.0))
    val exact = run(
      """quantile_over_time(0.5, {env="prod"} | json | unwrap status [1h]) by (service)""")
      .collect()
    assert(exact.count(_.getAs[Double]("value") == 350.0) == 3)
    // out-of-range phi yields the matching infinity, like the exact op
    val inf = run(
      """approx_quantile_over_time(1.5, {env="prod"} | json | unwrap status [1h])""")
      .collect()
    assert(inf.nonEmpty && inf.forall(_.getAs[Double]("value").isPosInfinity))
  }

  test("scalar literal queries: the literal at every grid step") {
    // "1 + 2 / 3" folds to one scalar, fanned over the 1h-extent grid
    val out = run("1 + 2 / 3").collect()
    assert(out.nonEmpty)
    assert(out.forall(r => r.getAs[Double]("value") == 1.0 + 2.0 / 3.0))
    assert(run("42").collect().forall(_.getAs[Double]("value") == 42.0))
    assert(run("1.23e-3").collect().forall(_.getAs[Double]("value") == 1.23e-3))
  }

  test("line_format __line__ and __timestamp__ built-ins") {
    val lines = run("""{service="api"} | line_format "at {{ __timestamp__ }}: {{ __line__ }}"""")
      .orderBy("ts_ns").collect()
    assert(lines.length == 6)
    // first api line: ts 0 → no fraction, Go time.String() form
    assert(lines.head.getAs[String]("body") ==
      """at 1970-01-01 00:00:00 +0000 UTC: {"status": 200, "dur": "100ms", "msg": "req 0 done"}""")
    // second api line of hour 0: ts = 120s exactly (no sub-second part)
    assert(lines(1).getAs[String]("body").startsWith("at 1970-01-01 00:02:00 +0000 UTC:"))
  }

  test("log query: selector + line filter + json + label filter") {
    val out = run("""{service="api"} |= "done" | json | status = "500"""")
      .collect()
    assert(out.length == 0) // api lines are i∈{0,2} → status 200
    val out2 = run("""{service="web"} | json | status = "500"""").collect()
    assert(out2.length == 3) // i=3 each hour
    // extracted labels join the stream identity
    val labels = out2.head.getAs[Map[String, String]]("labels")
    assert(labels("status") == "500" && labels("service") == "web")
  }

  test("label filter with duration comparison and or") {
    val out = run("""{env="prod"} | json | dur > 115ms or status = "500"""").collect()
    // dur > 115ms → i∈{2,3}; status=500 → i=3  ⇒ i∈{2,3} = 6 rows
    assert(out.length == 6)
  }

  test("line_format and label_format") {
    val out = run("""{service="api"} | json | line_format "s={{.status}} svc={{.service}}"""")
      .collect()
    assert(out.head.getAs[String]("body") == "s=200 svc=api")
    val out2 = run("""{service="api"} | json | label_format code=status | code = "200"""")
      .collect()
    assert(out2.length == 6)
  }

  test("metric: sum by over count_over_time") {
    val out = run("""sum by (service) (count_over_time({env="prod"}[1h]))""")
      .orderBy("bucket_ns", "labels.service")
      .select($"bucket_ns", $"labels.service", $"value")
      .as[(Long, String, Double)].collect()
    // per hour: api 2 lines, web 2 lines, 3 hours
    assert(out.length == 6)
    assert(out.forall(_._3 == 2.0))
    assert(out.take(2).map(_._2).toSeq == Seq("api", "web"))
  }

  test("metric: rate, unwrap duration sum, scalar binop") {
    val rate = run("""rate({service="api"}[1h])""")
      .select($"value").as[Double].collect()
    assert(rate.forall(v => math.abs(v - 2.0 / 3600) < 1e-12))

    val durSum = run(
      """sum by (service) (sum_over_time({service="web"} | json | unwrap dur duration [1h]))""")
      .select($"value").as[Double].collect()
    // web lines per hour: i=1 (110ms) + i=3 (130ms) = 0.24s
    assert(durSum.length == 3)
    assert(durSum.forall(v => math.abs(v - 0.24) < 1e-9))

    val doubled = run("""sum by (service) (count_over_time({env="prod"}[1h])) * 2""")
      .select($"value").as[Double].collect()
    assert(doubled.forall(_ == 4.0))
  }

  test("metric: topk and set binop") {
    val top = run("""topk(1, sum by (service) (count_over_time({env="prod"}[1h])))""")
      .collect()
    assert(top.length == 3) // one winner per hour bucket
    val unless = run(
      """sum by (service) (count_over_time({env="prod"}[1h])) unless sum by (service) (count_over_time({service="api"}[1h]))""")
      .select($"labels.service").as[String].collect()
    assert(unless.toSet == Set("web"))
  }

  test("set ops with group modifiers bypass the binop fusions") {
    // the parser accepts group modifiers after and/or/unless; this
    // shape matches the selfGroupedBin window-fusion guard except for
    // the op, and must evaluate as a plain set op (the group modifier
    // is ignored, pre-fusion behavior), not reach the arith finish
    val withMod = run(
      """sum by (service, env) (count_over_time({env="prod"}[1h])) and on(env) group_left sum by (env) (count_over_time({env="prod"}[1h]))""")
      .collect()
    val plain = run(
      """sum by (service, env) (count_over_time({env="prod"}[1h]))""")
      .collect()
    def key(r: org.apache.spark.sql.Row) =
      (r.getAs[Long]("bucket_ns"), r.getAs[Map[String, String]]("labels"),
        r.getAs[Double]("value"))
    assert(withMod.map(key).toSet == plain.map(key).toSet)
    // condBin's shape (subset matchers, by == on) with a set op stays
    // on the join path too: unless removes the strict side's series
    val unl = run(
      """sum by (service) (count_over_time({env="prod"}[1h])) unless on(service) sum by (service) (count_over_time({env="prod", service="api"}[1h]))""")
      .select($"labels.service").as[String].collect()
    assert(unl.toSet == Set("web"))
  }

  test("absent_over_time: grid anti-join") {
    // api never logs status 500 → absent in every 1h bucket
    val absent = run("""absent_over_time({service="api"} | json | status = "500" [1h])""")
      .collect()
    assert(absent.length == 3 && absent.forall(_.getAs[Double]("value") == 1.0))
    // web logs 500 every hour → never absent
    val none = run("""absent_over_time({service="web"} | json | status = "500" [1h])""")
      .collect()
    assert(none.isEmpty)
  }

  test("ip() line filter extracts and matches body IPs") {
    val ipLogs = Seq(
      (1L, "client 10.1.2.3 connected", Map("app" -> "a")),
      (2L, "client 192.168.9.9 connected", Map("app" -> "a")),
      (3L, "no address here", Map("app" -> "a"))
    ).toDF("ts_ns", "body", "labels")
    val in = Planner.query("""{app="a"} |= ip("10.0.0.0/8")""", ipLogs).collect()
    assert(in.map(_.getLong(0)).toSeq == Seq(1L))
    val out = Planner.query("""{app="a"} != ip("10.0.0.0/8")""", ipLogs).collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(2L, 3L))
  }

  test("distinct and keep stages") {
    val d = run("""{env="prod"} | json | distinct service""").collect()
    assert(d.length == 2) // first line per service
    val kept = run("""{env="prod"} | keep env""").collect()
    assert(kept.head.getAs[Map[String, String]]("labels").keySet == Set("env"))
  }

  test("subset-selector binop fuses to ONE scan and keeps join semantics") {
    // r19 condBin: both operands differ only in selector matchers and
    // the strict set contains the weak set — one conditional
    // aggregation, no second scan, no join. Fixture: 4 lines/hour,
    // 2 of them service=api, all env=prod.
    val q = """sum by (env) (count_over_time({service="api"}[1h]))""" +
      """ / on(env) sum by (env) (count_over_time({}[1h]))"""
    val df = run(q)
    val plan = df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(!plan.contains("Join"), s"fused binop must not join:\n$plan")
    assert(!plan.contains("Union"), s"fused binop must not union:\n$plan")
    val rows = df.orderBy("bucket_ns").collect()
    assert(rows.length == 3 && rows.forall(_.getDouble(2) == 0.5),
      s"2 api of 4 total per hour: ${rows.mkString(",")}")

    // comparison ops through the fused path: bool collapses to 0/1,
    // the filter form keeps the lhs value on true
    val ge = run(q.replace("/", ">= bool")).collect()
    assert(ge.length == 3 && ge.forall(_.getDouble(2) == 0.0))
    val lt = run(q.replace("/", "<")).collect()
    assert(lt.length == 3 && lt.forall(_.getDouble(2) == 2.0))

    // row semantics match the 1:1 inner join: a strict side matching
    // NOTHING yields the empty result, not 0-valued rows
    val none = run(
      """sum by (env) (count_over_time({service="none"}[1h]))""" +
        """ / on(env) sum by (env) (count_over_time({}[1h]))""").collect()
    assert(none.isEmpty)
  }

  test("entries/stream keys invert exactly, including hostile label values") {
    import org.apache.spark.sql.functions._
    import graft.logql.VectorMatching._
    val nasty = Map(
      "q" -> """he said "hi" \ there""",
      "u" -> "héllo wörld",
      "plus" -> "a+b/c=d",
      "empty" -> "",
      "sep" -> "a,b:c[d]e{f}")
    val df = Seq(Tuple1(nasty)).toDF("labels")
      .withColumn("viaEntries", labelsOfEntries(entriesKey(col("labels"))))
      .withColumn("viaJson", labelsOfStreamKey(streamKey(col("labels"))))
    val r = df.collect().head
    val orig = r.getAs[Map[String, String]]("labels")
    assert(r.getAs[Map[String, String]]("viaEntries") == orig)
    assert(r.getAs[Map[String, String]]("viaJson") == orig)
    // and the two key forms agree on identity: the JSON string IS the
    // rendering of the sorted entries array
    val keys = Seq(Tuple1(nasty)).toDF("labels")
      .select(streamKey(col("labels")).as("j"),
        to_json(entriesKey(col("labels"))).as("je")).collect().head
    assert(keys.getString(0) == keys.getString(1))
  }
}
