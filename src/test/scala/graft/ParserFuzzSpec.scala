package graft

import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.propBoolean

/** Fuzz properties for the three query-language parsers: any input —
  * random garbage, or a valid query with random mutations — must
  * either parse or fail with the parser's own typed error. A
  * StackOverflow, NPE, or index-out-of-bounds here is a
  * denial-of-service on the query endpoint, so the property pins
  * "fails CLEANLY" for the whole input space, complementing the
  * example-based corpus specs.
  */
object ParserFuzzSpec extends Properties("ParserFuzz") {

  private val seeds = Seq(
    """{app="web"} |= "err" | json | level = "error" | line_format "{{.msg}}"""",
    """sum by (et) (rate({app="web"} | logfmt [5m])) / on(et) group_left count_over_time({}[5m])""",
    """histogram_quantile(0.9, sum by (le) (rate(http_bucket[5m])))""",
    """holt_winters(disk{a="b"}[1h], 0.5, 0.3) atan2 scalar(sum(x))""",
    """{ status = error && span.db.name =~ "p.*" } >> { duration > 10ms } | by(name) | count() > 2""",
    """{} | compare({ status = error }, 10, 100, 200)"""
  )

  private val junkChar =
    Gen.oneOf(Gen.alphaNumChar, Gen.oneOf("{}()[]|=~!<>,.\"'$%^&*-+/ :@".toList))
  private val junk: Gen[String] = Gen.chooseNum(0, 60)
    .flatMap(n => Gen.listOfN(n, junkChar).map(_.mkString))

  /** A seed query with one random splice: deletion, insertion, or
    * truncation — the near-valid inputs that trip naive parsers.
    */
  private val mutated: Gen[String] = for {
    seed <- Gen.oneOf(seeds)
    pos <- Gen.chooseNum(0, seed.length)
    kind <- Gen.chooseNum(0, 2)
    ins <- Gen.listOfN(3, junkChar).map(_.mkString)
  } yield kind match {
    case 0 => seed.substring(0, pos) + seed.substring(math.min(pos + 3, seed.length))
    case 1 => seed.substring(0, pos) + ins + seed.substring(pos)
    case 2 => seed.substring(0, pos)
  }

  private val anyInput: Gen[String] = Gen.oneOf(junk, mutated)

  private def cleanly(parse: String => Any)(q: String): Boolean =
    try { parse(q); true }
    catch {
      case _: graft.logql.Parser.ParseError      => true
      case _: graft.promql.PromQL.ParseError     => true
      case _: graft.traceql.TraceQL.ParseError   => true
      case _: IllegalArgumentException           => true // incl. NumberFormat
    } // anything else (NPE, SO, IOOBE) propagates and fails the prop

  property("LogQL parser fails cleanly on arbitrary input") =
    Prop.forAll(anyInput)(cleanly(graft.logql.Parser.parse))

  property("PromQL parser fails cleanly on arbitrary input") =
    Prop.forAll(anyInput)(cleanly(graft.promql.PromQL.parse))

  property("TraceQL parser fails cleanly on arbitrary input") =
    Prop.forAll(anyInput)(cleanly(graft.traceql.TraceQL.parse))
}
