package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.Kernels._

/** Unit tests for the pure kernels backing custom expressions
  * (semantics pinned to the reference; see Kernels scaladoc citations).
  */
class KernelsSpec extends AnyFunSuite {

  test("parseDurationSeconds: Go time.ParseDuration + Loki d/w units") {
    assert(parseDurationSeconds("0").contains(0.0))
    assert(parseDurationSeconds("5s").contains(5.0))
    assert(parseDurationSeconds("1m30s").contains(90.0))
    assert(parseDurationSeconds("1.5h").contains(5400.0))
    assert(parseDurationSeconds("-2m").contains(-120.0))
    assert(parseDurationSeconds("100ms").contains(0.1))
    assert(parseDurationSeconds("250us").contains(0.00025))
    assert(parseDurationSeconds("1d").contains(86400.0))
    assert(parseDurationSeconds("2w").contains(1209600.0))
    assert(parseDurationSeconds("").isEmpty)
    assert(parseDurationSeconds("5").isEmpty)    // number w/o unit
    assert(parseDurationSeconds("xs").isEmpty)
    assert(parseDurationSeconds("5parsecs").isEmpty)
  }

  test("parseBytes: SI powers of 1000, IEC powers of 1024, case-insensitive") {
    assert(parseBytes("42").contains(42.0))
    assert(parseBytes("42B").contains(42.0))
    assert(parseBytes("1KB").contains(1000.0))
    assert(parseBytes("1KiB").contains(1024.0))
    assert(parseBytes("1.5MB").contains(1.5e6))
    assert(parseBytes("2 GiB").contains(2d * 1024 * 1024 * 1024))
    assert(parseBytes("3tb").contains(3e12))
    assert(parseBytes("1,000").contains(1000.0))
    assert(parseBytes("").isEmpty)
    assert(parseBytes("MB").isEmpty)
    assert(parseBytes("1XB").isEmpty)
  }

  test("ipMatches: exact, range, CIDR; v4 and v6") {
    assert(ipMatches("192.168.1.5", "192.168.1.5"))
    assert(!ipMatches("192.168.1.5", "192.168.1.6"))
    assert(ipMatches("192.168.1.5", "192.168.1.0/24"))
    assert(!ipMatches("192.168.2.5", "192.168.1.0/24"))
    assert(ipMatches("10.0.0.7", "10.0.0.1-10.0.0.10"))
    assert(!ipMatches("10.0.0.11", "10.0.0.1-10.0.0.10"))
    assert(ipMatches("2001:db8::1", "2001:db8::/32"))
    assert(!ipMatches("2001:db9::1", "2001:db8::/32"))
    // family mismatch never matches
    assert(!ipMatches("192.168.1.5", "2001:db8::/32"))
    // hostnames are rejected, not resolved
    assert(!ipMatches("localhost", "127.0.0.1"))
    assert(!ipMatches("1.2.3.4", "not-an-ip"))
    // prefix lengths out of range
    assert(!ipMatches("1.2.3.4", "1.2.3.4/33"))
  }

  test("logfmtGet / logfmtAll: quoted values, escapes, first-wins") {
    val line = """level=info msg="user \"bob\" logged in" dur=12ms level=debug"""
    assert(logfmtGet(line, "level").contains("info"))
    assert(logfmtGet(line, "msg").contains("""user "bob" logged in"""))
    assert(logfmtGet(line, "dur").contains("12ms"))
    assert(logfmtGet(line, "absent").isEmpty)
    val all = logfmtAll(line).toMap
    assert(all("level") == "info") // first occurrence wins
    assert(logfmtAll(line).map(_._1) == Seq("level", "msg", "dur"))
    assert(logfmtAll(null).isEmpty)
  }

  test("patternToRegex: captures, wildcards, literal quoting") {
    val (re, names) = patternToRegex("<_> <method> took <dur>ms")
    assert(names == Seq("method", "dur"))
    val m = java.util.regex.Pattern.compile(re).matcher("req1 POST took 42ms")
    assert(m.matches())
    assert(m.group("g0") == "POST")
    assert(m.group("g1") == "42")
    // literal regex metachars in the pattern are quoted
    val (re2, _) = patternToRegex("a.b<X>")
    assert(!java.util.regex.Pattern.compile(re2).matcher("aXbY").matches())
    assert(java.util.regex.Pattern.compile(re2).matcher("a.bY").matches())
  }

  test("decolorize strips SGR sequences") {
    assert(decolorize("\u001b[31mred\u001b[0m plain") == "red plain")
    assert(decolorize("no escapes") == "no escapes")
    assert(decolorize(null) == null)
  }

  test("severityText: 24-level OTel mapping") {
    assert(severityText(1) == "TRACE" && severityText(4) == "TRACE")
    assert(severityText(5) == "DEBUG" && severityText(9) == "INFO")
    assert(severityText(13) == "WARN" && severityText(17) == "ERROR")
    assert(severityText(21) == "FATAL" && severityText(24) == "FATAL")
    assert(severityText(0) == "UNKNOWN" && severityText(25) == "UNKNOWN")
  }

  test("promQuantile: Prometheus linear interpolation") {
    val v = Array(1.0, 2.0, 3.0, 4.0)
    assert(promQuantile(0.0, v) == 1.0)
    assert(promQuantile(1.0, v) == 4.0)
    assert(promQuantile(0.5, v) == 2.5)
    assert(math.abs(promQuantile(0.25, v) - 1.75) < 1e-12)
    assert(promQuantile(0.5, Array.empty[Double]).isNaN)
    assert(promQuantile(-0.1, v).isNegInfinity)
    assert(promQuantile(1.1, v).isPosInfinity)
  }

  test("re2ToJava: named groups, POSIX classes, literal braces") {
    assert(re2ToJava("(?P<x>a+)b") == "(?<x>a+)b")
    assert(re2ToJava("[[:digit:]]{2}") == "[\\p{Digit}]{2}")
    assert(re2ToJava("a{") == "a\\{")
    assert(re2ToJava("^{") == "^\\{")
    assert(re2ToJava("a{2,3}") == "a{2,3}")
    assert(re2ToJava("a{2,}") == "a{2,}")
    assert(re2ToJava("\\p{L}{2}") == "\\p{L}{2}")
    assert(re2ToJava("\\{x\\}") == "\\{x\\}")
    // translated POSIX class actually compiles and matches in Java
    assert("123".matches(re2ToJava("[[:digit:]]+")))
    assert("{a}".matches(re2ToJava("{a}")))
  }

  test("xxh3_128: canonical known-answer vectors (seedless XXH128)") {
    def hex(b: Array[Byte]): String = b.map("%02x".format(_)).mkString
    // canonical byte order = BE(high64) ++ BE(low64), matching
    // XXH128_canonicalFromHash of the published reference implementation
    assert(hex(graft.functions.JKernels.xxh3_128(Array.emptyByteArray)) ==
      "99aa06d3014798d86001c324468d497f")
    assert(hex(graft.functions.JKernels.xxh3_128("abc".getBytes("UTF-8"))) ==
      "06b05ab6733a618578af5f94892f3950")
    assert(hex(graft.functions.JKernels.xxh3_128(
      "Nobody inspects the spammish repetition".getBytes("UTF-8"))) ==
      "a32c6f55b80b5f449f1a957522431b91")
    // one-shot vs UTF8String path agree
    assert(hex(graft.functions.JKernels.xxh3_128(
      org.apache.spark.unsafe.types.UTF8String.fromString("abc"))) ==
      "06b05ab6733a618578af5f94892f3950")
  }
}
