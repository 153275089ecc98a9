package graft

import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.propBoolean

import graft.util.MiniYaml

/** Round-trip property for the config-file YAML subset: any tree of
  * maps/lists/scalars the renderer can emit parses back IDENTICALLY —
  * the shape guarantee the strict config loader builds on (a parser
  * that silently mangles nesting would turn config into defaults).
  */
object MiniYamlPropertySpec extends Properties("MiniYaml") {

  private val key: Gen[String] =
    Gen.chooseNum(1, 8).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf(('a' to 'z') ++ Seq('_'))).map(_.mkString))

  // scalars stress quoting: spaces, #, colons, quotes, unicode, and
  // control characters the double-quote escapes must round-trip
  private val scalar: Gen[String] =
    Gen.chooseNum(0, 12).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf(
        Gen.alphaNumChar,
        Gen.oneOf(' ', '#', ':', '\'', '"', '\\', 'é', '\n', '\t', '\r')))
        .map(_.mkString))

  private def tree(depth: Int): Gen[Any] =
    if (depth <= 0) scalar
    else Gen.frequency(
      4 -> scalar,
      2 -> mapGen(depth - 1),
      2 -> listGen(depth - 1))

  private def mapGen(depth: Int): Gen[Map[String, Any]] =
    for {
      n <- Gen.chooseNum(1, 4)
      ks <- Gen.listOfN(n, key).map(_.distinct)
      vs <- Gen.sequence[List[Any], Any](ks.map(_ => tree(depth)))
    } yield ks.zip(vs).toMap

  private def listGen(depth: Int): Gen[List[Any]] =
    for {
      n <- Gen.chooseNum(1, 4)
      vs <- Gen.sequence[List[Any], Any]((1 to n).map(_ => tree(depth)).toList)
    } yield vs

  /** Renders a tree in the subset the parser accepts: always-quoted
    * scalars (double quotes, escaped), block maps/lists, map list
    * items with the first entry on the dash line.
    */
  private def quote(s: String): String =
    "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"")
      .replace("\n", "\\n").replace("\t", "\\t").replace("\r", "\\r") + "\""

  private def render(v: Any, indent: Int): List[String] = v match {
    case m: Map[_, _] =>
      m.asInstanceOf[Map[String, Any]].toList.flatMap {
        case (k, s: String) => List(" " * indent + k + ": " + quote(s))
        case (k, sub)       => (" " * indent + k + ":") :: render(sub, indent + 2)
      }
    case l: List[_] =>
      l.flatMap {
        case s: String => List(" " * indent + "- " + quote(s))
        case m: Map[_, _] =>
          val lines = render(m, indent + 2)
          (" " * indent + "- " + lines.head.drop(indent + 2)) :: lines.tail
        case sub => (" " * indent + "-") :: render(sub, indent + 2)
      }
    case s: String => List(" " * indent + quote(s))
  }

  property("render → parse is the identity on map-rooted trees") =
    Prop.forAll(mapGen(3)) { m =>
      val text = render(m, 0).mkString("\n") + "\n"
      MiniYaml.parse(text) == m
    }

  property("render → parse is the identity on list-rooted trees") =
    Prop.forAll(listGen(3)) { l =>
      val text = render(l, 0).mkString("\n") + "\n"
      MiniYaml.parse(text) == l
    }

  property("comments and blank lines between entries are ignored") =
    Prop.forAll(mapGen(2)) { m =>
      val lines = render(m, 0)
      val noisy = lines.flatMap(l => List("# noise", "", l))
      MiniYaml.parse(noisy.mkString("\n")) == m
    }

  // yaml.Unmarshal parity on double-quoted escapes (ADVICE r15: the
  // verbatim-copy scanner silently turned "a\nb" into "anb" — a quoted
  // secret with such escapes resolved to a DIFFERENT value than the
  // reference's)
  property("standard double-quote escapes are interpreted") = Prop.all(
    (MiniYaml.parse("""k: "a\nb"""") == Map("k" -> "a\nb")) :| "\\n",
    (MiniYaml.parse("""k: "a\tb"""") == Map("k" -> "a\tb")) :| "\\t",
    // \u built at runtime: the Scala lexer itself interprets \uXXXX
    // in source literals, triple-quoted included
    (MiniYaml.parse("k: \"\\" + "u0041\"") == Map("k" -> "A")) :| "\\u",
    (MiniYaml.parse("""k: "\x41"""") == Map("k" -> "A")) :| "\\x",
    (MiniYaml.parse("k: \"\\" + "U0001F600\"") ==
      Map("k" -> new String(Character.toChars(0x1F600)))) :| "\\U",
    (MiniYaml.parse("""k: "a\\nb"""") == Map("k" -> "a\\nb")) :| "\\\\",
    // YAML 1.1 §5.7 tail accepted by go-yaml (ADVICE r16): next-line,
    // nbsp, line/paragraph separator, escaped literal tab
    (MiniYaml.parse("""k: "a\Nb"""") == Map("k" -> "a\u0085b")) :| "\\N",
    (MiniYaml.parse("""k: "a\_b"""") == Map("k" -> "a\u00A0b")) :| "\\_",
    (MiniYaml.parse("""k: "a\Lb"""") == Map("k" -> "a\u2028b")) :| "\\L",
    (MiniYaml.parse("""k: "a\Pb"""") == Map("k" -> "a\u2029b")) :| "\\P",
    (MiniYaml.parse("k: \"a\\\tb\"") == Map("k" -> "a\tb")) :|
      "escaped literal tab",
    Prop.throws(classOf[MiniYaml.ParseError])(
      MiniYaml.parse("""k: "a\qb"""")) :| "unknown escape fails loudly",
    Prop.throws(classOf[MiniYaml.ParseError])(
      MiniYaml.parse("k: \"\\" + "u00g1\"")) :| "bad hex fails loudly",
    Prop.throws(classOf[MiniYaml.ParseError])(
      MiniYaml.parse("k: \"\\" + "U00110000\"")) :|
      "out-of-range codepoint is a ParseError, not a bare IAE")
}
