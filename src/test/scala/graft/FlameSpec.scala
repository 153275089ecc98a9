package graft

import graft.profileql.Flame

/** ProfileQL render path: selector matcher semantics and the
  * distributed-side stack cap (reference profileql/parser.go:10-230,
  * profileqlengine/flamebearer.go:11-126).
  */
class FlameSpec extends SparkTestBase {
  import spark.implicits._

  private def profiles = Seq(
    (1L, "cpu", Map("svc" -> "api", "env" -> "prod"), Seq("main", "a"), 5L),
    (2L, "cpu", Map("svc" -> "web", "env" -> "prod"), Seq("main", "b"), 3L),
    (3L, "cpu", Map("svc" -> "api", "env" -> "dev"), Seq("main", "c"), 2L),
    (4L, "cpu", Map("env" -> "prod"), Seq("main", "d"), 1L) // no svc label
  ).toDF("ts_us", "name", "labels", "stack", "value")

  private def numTicks(fb: String): Long =
    """"numTicks":(\d+)""".r.findFirstMatchIn(fb).get.group(1).toLong

  test("selector parses all four matcher operators and quoted commas") {
    val (name, ms) = Flame.parseSelector(
      """cpu{svc="api",env!="dev",region=~"us-.*",zone!~"a|b",tag="x,y"}""")
    assert(name == "cpu")
    assert(ms == Seq(
      Flame.Matcher("svc", "=", "api"),
      Flame.Matcher("env", "!=", "dev"),
      Flame.Matcher("region", "=~", "us-.*"),
      Flame.Matcher("zone", "!~", "a|b"),
      Flame.Matcher("tag", "=", "x,y")))
  }

  test("selector rejects malformed matchers instead of misparsing") {
    // pre-fix, {svc!="api"} silently filtered on a label named `svc!`
    intercept[IllegalArgumentException](Flame.parseSelector("""cpu{svc!"api"}"""))
    intercept[IllegalArgumentException](Flame.parseSelector("""cpu{svc="api"""))
    intercept[IllegalArgumentException](Flame.parseSelector("""cpu{svc=api}"""))
  }

  test("negative and regex matchers filter the merge") {
    // != also matches rows where the label is absent (Prometheus rule)
    val fb = Flame.flamebearer(profiles, """cpu{svc!="api"}""")
    assert(numTicks(fb) == 4) // web(3) + absent-svc(1)
    val re = Flame.flamebearer(profiles, """cpu{svc=~"a.*"}""")
    assert(numTicks(re) == 7) // api rows only
    val nre = Flame.flamebearer(profiles, """cpu{svc!~"a.*"}""")
    assert(numTicks(nre) == 4)
  }

  test("diff flamebearer: double format, per-side totals and deltas") {
    val fb = Flame.flamebearerDiff(profiles,
      leftQuery = """cpu{svc="api"}""", rightQuery = """cpu{svc="web"}""")
    val parsed = TestJson.parse(fb).asInstanceOf[Map[String, Any]]
    assert(parsed("leftTicks").asInstanceOf[Double] == 7.0)  // 5 + 2
    assert(parsed("rightTicks").asInstanceOf[Double] == 3.0)
    val meta = parsed("metadata").asInstanceOf[Map[String, Any]]
    assert(meta("format") == "double")
    val flame = parsed("flamebearer").asInstanceOf[Map[String, Any]]
    assert(flame("numTicks").asInstanceOf[Double] == 10.0)
    val names = flame("names").asInstanceOf[List[Any]]
    assert(names.head == "total" && names.contains("main"))
    // every level is a run of 7-value septets: [xLΔ, lT, lS, xRΔ, rT, rS, name]
    val levels = flame("levels").asInstanceOf[List[Any]]
      .map(_.asInstanceOf[List[Any]].map(_.asInstanceOf[Double].toLong))
    assert(levels.forall(_.size % 7 == 0))
    // root septet carries both sides' totals
    assert(levels.head == List(0L, 7L, 0L, 0L, 3L, 0L, 0L))
    // the "main" frame exists on both sides; leaves a/c are left-only,
    // b is right-only
    val leaf = levels(2).grouped(7).toSeq
    val byName = leaf.map(s => names(s(6).toInt).toString -> s).toMap
    assert(byName("a")(1) == 5L && byName("a")(4) == 0L)
    assert(byName("b")(1) == 0L && byName("b")(4) == 3L)
    assert(byName("c")(1) == 2L && byName("c")(4) == 0L)
  }

  test("stack cap truncates distributed-side but keeps the true total") {
    // cap below the 4 distinct stacks: only the heaviest 2 reach the
    // driver, the rest fold into a root-level "other" frame
    val fb = Flame.flamebearer(profiles, "cpu", maxStacks = 2)
    assert(numTicks(fb) == 11) // full sum, not just the shipped stacks
    assert(fb.contains(""""other""""))
    // heaviest stacks (a=5, b=3) survive; c and d are folded
    assert(fb.contains(""""a"""") && fb.contains(""""b""""))
    assert(!fb.contains(""""c"""") && !fb.contains(""""d""""))
    // uncapped render has no fold
    val full = Flame.flamebearer(profiles, "cpu")
    assert(numTicks(full) == 11 && !full.contains(""""other""""))
  }
}
