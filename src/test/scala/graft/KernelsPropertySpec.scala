package graft

import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.propBoolean

import graft.functions.Kernels._

/** Property-based kernel checks (raw ScalaCheck, run natively by sbt):
  * invariants that must hold for ALL inputs, complementing the
  * example-based KernelsSpec.
  */
object KernelsPropertySpec extends Properties("Kernels") {

  property("parseDurationSeconds: whole-unit compositions are additive") =
    Prop.forAll(Gen.choose(0, 48), Gen.choose(0, 59), Gen.choose(0, 59)) {
      (h: Int, m: Int, sec: Int) =>
        parseDurationSeconds(s"${h}h${m}m${sec}s")
          .contains(h * 3600.0 + m * 60.0 + sec)
    }

  property("parseBytes: IEC is 1024^k, SI is 10^(3k)") =
    Prop.forAll(Gen.choose(0, 999)) { (n: Int) =>
      parseBytes(s"${n}KiB").contains(n * 1024.0) &&
        parseBytes(s"${n}MiB").contains(n * 1024.0 * 1024) &&
        parseBytes(s"${n}KB").contains(n * 1000.0) &&
        parseBytes(s"${n}MB").contains(n * 1e6)
    }

  private val octet = Gen.choose(0, 255)

  property("ipMatches: every v4 matches its /32, /24 prefix, /0, and self-range") =
    Prop.forAll(octet, octet, octet, octet) { (a: Int, b: Int, c: Int, d: Int) =>
      val ip = s"$a.$b.$c.$d"
      ipMatches(ip, s"$ip/32") && ipMatches(ip, s"$a.$b.$c.0/24") &&
        ipMatches(ip, "0.0.0.0/0") && ipMatches(ip, s"$ip-$ip")
    }

  private val key = Gen.nonEmptyListOf(Gen.alphaLowerChar).map(_.mkString)
  private val value = Gen.listOf(Gen.alphaNumChar).map(_.mkString)

  property("logfmt: generated key=value pairs round-trip") =
    Prop.forAll(key, value, key, value) { (k1: String, v1: String, k2: String, v2: String) =>
      (k1 != k2) ==> {
        val line = s"$k1=$v1 $k2=$v2"
        logfmtGet(line, k1).contains(v1) && logfmtGet(line, k2).contains(v2)
      }
    }

  property("promQuantile: bounded by min/max and monotone in q") =
    Prop.forAll(
      Gen.nonEmptyListOf(Gen.choose(-1e6, 1e6)).map(_.toArray),
      Gen.choose(0.0, 1.0), Gen.choose(0.0, 1.0)) { (vs, q1, q2) =>
      val lo = math.min(q1, q2)
      val hi = math.max(q1, q2)
      val a = promQuantile(lo, vs)
      val b = promQuantile(hi, vs)
      a <= b && a >= vs.min && b <= vs.max
    }

  private val validSeverity =
    Set("TRACE", "DEBUG", "INFO", "WARN", "ERROR", "FATAL", "UNKNOWN")

  property("severityText ∘ deduceSeverity stays in range") =
    Prop.forAll(Gen.asciiPrintableStr) { (s: String) =>
      validSeverity.contains(severityText(deduceSeverity(s)))
    }

  // RE2 fragments a user could write: literals (incl. lone braces),
  // POSIX classes, named groups, quantifiers, alternation
  private val re2Fragment: Gen[String] = Gen.oneOf(
    Gen.nonEmptyListOf(Gen.alphaNumChar).map(_.mkString),
    Gen.const("{"), Gen.const("a{2}"), Gen.const("x{1,3}"),
    Gen.const("[[:digit:]]"), Gen.const("[[:alpha:]]+"),
    Gen.const("(a|b)"), Gen.const("\\d+"),
    Gen.const(".*"), Gen.const("[a-z{]"))

  // noShrink: shrinking fabricates strings outside the generator (e.g.
  // a lone "(") that are invalid RE2 to begin with; group names get
  // unique suffixes — duplicates are invalid in RE2 too
  property("re2ToJava: translated valid-RE2 patterns compile in Java") =
    Prop.forAllNoShrink(Gen.nonEmptyListOf(re2Fragment)) { frags =>
      val re = frags.zipWithIndex.map { case (f, i) =>
        if (i % 3 == 0) s"(?P<g$i>[a-z]+)$f" else f
      }.mkString
      val javaRe = re2ToJava(re)
      scala.util.Try(java.util.regex.Pattern.compile(javaRe)).isSuccess
    }

  // mirror of the Planner.stepFanout / chsql_stepfanout grid math
  private def fanoutSteps(ts: Long, step: Long, range: Long): Seq[Long] = {
    val first = ((ts + step - 1) / step) * step
    val n = range / step + 1
    (0L until n).map(i => first + i * step).filter(_ < ts + range)
  }

  property("step fan-out: every produced step's (S-range, S] window covers ts") =
    Prop.forAll(
      Gen.choose(1L, 1000000L), Gen.choose(1L, 200L), Gen.choose(1L, 10L)) {
      (ts, step, mult) =>
        val range = step * mult
        val steps = fanoutSteps(ts, step, range)
        steps.nonEmpty &&
          steps.forall(s => s >= ts && s < ts + range && s % step == 0) &&
          steps.forall(s => ts > s - range && ts <= s)
    }

  property("pattern mask chain: no digit survives, for any printable input") =
    Prop.forAll(Gen.listOf(Gen.asciiPrintableChar).map(_.mkString)) { s =>
      // same java.util.regex semantics Spark's regexp_replace codegen
      // uses; the LAST mask alone ([0-9]+...) guarantees digit removal,
      // whatever the earlier composite masks did to the string
      val masked = graft.logql.PatternMine.Masks
        .foldLeft(s)((x, m) => x.replaceAll(m, "<_>"))
      !masked.exists(_.isDigit)
    }
}
