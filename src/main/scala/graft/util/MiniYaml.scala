package graft.util

/** Minimal YAML-subset parser for the one-binary config file
  * (reference `oteldb --config config.yml`, cmd/oteldb/config.go reads
  * YAML via yaml.Unmarshal). No third-party dependency is available,
  * and the config surface only needs the structural subset:
  *
  *   - block maps (`key: value`, `key:` + indented block)
  *   - block lists (`- value`, `- key: value` + aligned continuation)
  *   - scalars (plain, or single/double-quoted; `#` comments)
  *
  * Everything parses to `Map[String, Any]` / `List[Any]` / `String` —
  * the config-mapping layer owns type conversion and STRICT unknown-key
  * validation (the same philosophy as Serve.parseConfig's flag
  * validation: a typo'd key is a startup error, not a silent default).
  *
  * Deliberately rejected: tabs (YAML forbids them in indentation),
  * flow syntax `{}`/`[]`, anchors, multi-line scalars — a config that
  * needs those is out of this subset's contract and fails loudly.
  */
object MiniYaml {

  final class ParseError(line: Int, msg: String)
      extends RuntimeException(s"yaml line ${line + 1}: $msg")

  private final case class Line(indent: Int, text: String, num: Int)

  /** Parses a document to a Map/List/String tree. An empty document
    * parses to an empty map.
    */
  def parse(text: String): Any = {
    val lines = text.split("\n", -1).zipWithIndex.flatMap { case (raw, i) =>
      // YAML forbids tabs in INDENTATION only — inside a quoted scalar
      // they are legal content (go-yaml accepts both a literal and an
      // escaped tab in double quotes, ADVICE r16), so the rejection
      // covers just the leading-whitespace run
      if (raw.takeWhile(c => c == ' ' || c == '\t').contains('\t'))
        throw new ParseError(i, "tab characters are not allowed in indentation")
      val noComment = stripComment(raw)
      val content = noComment.trim
      if (content.isEmpty) None
      else Some(Line(noComment.indexWhere(_ != ' '), content, i))
    }.toList
    if (lines.isEmpty) Map.empty[String, Any]
    else {
      val (v, rest) = parseBlock(lines, lines.head.indent)
      rest.headOption.foreach(l =>
        throw new ParseError(l.num, s"unexpected dedent/content '${l.text}'"))
      v
    }
  }

  def parseFile(path: String): Any =
    parse(new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(path)), "UTF-8"))

  /** Strips a trailing comment: `#` outside quotes, preceded by
    * whitespace or at line start. Inside double quotes a backslash
    * escapes the next character (so `"\" #"` stays intact); single
    * quotes escape by doubling, which plain toggling tracks correctly.
    */
  private def stripComment(s: String): String = {
    var i = 0
    var quote: Char = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (quote == '"' && c == '\\') i += 1 // skip the escaped char
      else if (quote != 0) { if (c == quote) quote = 0 }
      else if (c == '"' || c == '\'') quote = c
      else if (c == '#' && (i == 0 || s.charAt(i - 1) == ' ')) return s.take(i)
      i += 1
    }
    s
  }

  /** Parses the block starting at `indent`; returns (value, remaining
    * lines at an indent < `indent`).
    */
  private def parseBlock(lines: List[Line], indent: Int): (Any, List[Line]) =
    lines match {
      case l :: _ if l.indent == indent && l.text.startsWith("- ") =>
        parseList(lines, indent)
      case l :: _ if l.indent == indent && l.text == "-" =>
        parseList(lines, indent)
      case l :: _ if l.indent == indent =>
        parseMap(lines, indent)
      case l :: _ =>
        throw new ParseError(l.num, s"bad indentation (expected $indent)")
      case Nil => (Map.empty[String, Any], Nil)
    }

  private def parseMap(lines0: List[Line], indent: Int)
      : (Map[String, Any], List[Line]) = {
    var out = Vector.empty[(String, Any)]
    var lines = lines0
    while (lines.nonEmpty && lines.head.indent == indent &&
        !lines.head.text.startsWith("- ") && lines.head.text != "-") {
      val l = lines.head
      val ci = keyColonIndex(l.text)
      if (ci < 0) throw new ParseError(l.num, s"expected 'key: value' in '${l.text}'")
      val key = unquote(l.text.take(ci).trim, l.num)
      if (out.exists(_._1 == key))
        throw new ParseError(l.num, s"duplicate key '$key'")
      val rest = l.text.drop(ci + 1).trim
      if (rest.nonEmpty) {
        out :+= key -> unquote(rest, l.num)
        lines = lines.tail
      } else {
        // nested block (or an explicitly empty value at dedent/EOF)
        lines = lines.tail
        lines match {
          case n :: _ if n.indent > indent =>
            val (v, r) = parseBlock(lines, n.indent)
            out :+= key -> v
            lines = r
          case _ => out :+= key -> ""
        }
      }
    }
    lines.headOption
      .filter(l => l.indent > indent)
      .foreach(l => throw new ParseError(l.num,
        s"bad indentation under map (expected $indent)"))
    (out.toMap, lines)
  }

  private def parseList(lines0: List[Line], indent: Int)
      : (List[Any], List[Line]) = {
    var out = Vector.empty[Any]
    var lines = lines0
    while (lines.nonEmpty && lines.head.indent == indent &&
        (lines.head.text.startsWith("- ") || lines.head.text == "-")) {
      val l = lines.head
      val body = if (l.text == "-") "" else l.text.drop(2).trim
      if (body.isEmpty) {
        // `-` alone: the item is the following deeper block
        lines = lines.tail
        lines match {
          case n :: _ if n.indent > indent =>
            val (v, r) = parseBlock(lines, n.indent)
            out :+= v; lines = r
          case _ => out :+= ""
        }
      } else if (keyColonIndex(body) >= 0) {
        // `- key: …`: a map item whose first entry sits on the dash
        // line; continuation lines align at the body's column
        val bodyIndent = l.indent + 2
        val synthetic = Line(bodyIndent, body, l.num)
        val (v, r) = parseMap(synthetic :: lines.tail, bodyIndent)
        out :+= v; lines = r
      } else {
        out :+= unquote(body, l.num)
        lines = lines.tail
      }
    }
    lines.headOption
      .filter(l => l.indent > indent)
      .foreach(l => throw new ParseError(l.num,
        s"bad indentation under list (expected $indent)"))
    (out.toList, lines)
  }

  /** Index of the key/value `:` (outside quotes, followed by space or
    * end-of-line); -1 when the line isn't a map entry.
    */
  private def keyColonIndex(s: String): Int = {
    var i = 0
    var quote: Char = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (quote == '"' && c == '\\') i += 1 // skip the escaped char
      else if (quote != 0) { if (c == quote) quote = 0 }
      else if (c == '"' || c == '\'') quote = c
      else if (c == ':' && (i + 1 == s.length || s.charAt(i + 1) == ' '))
        return i
      i += 1
    }
    -1
  }

  private def unquote(s: String, num: Int): String =
    if (s.length >= 2 && s.head == '"' && s.last == '"') {
      // left-to-right unescape (sequential String.replace is
      // order-fragile over runs of backslashes), interpreting the YAML
      // double-quote escapes — copying the escaped character verbatim
      // would silently mangle "a\nb" to "anb" and "A" to "u0041",
      // so a quoted secret containing such escapes would resolve to a
      // DIFFERENT value than the reference's yaml.Unmarshal (ADVICE
      // r15). Unknown escapes fail loudly per the file's contract.
      val inner = s.substring(1, s.length - 1)
      val sb = new StringBuilder(inner.length)
      var i = 0
      def hex(from: Int, digits: Int): Int = {
        if (from + digits > inner.length)
          throw new ParseError(num, s"truncated escape in '$s'")
        val h = inner.substring(from, from + digits)
        try Integer.parseInt(h, 16)
        catch { case _: NumberFormatException =>
          throw new ParseError(num, s"bad hex escape '\\$h'") }
      }
      while (i < inner.length) {
        val c = inner.charAt(i)
        if (c != '\\') { sb.append(c); i += 1 }
        else if (i + 1 >= inner.length)
          throw new ParseError(num, s"trailing backslash in '$s'")
        else inner.charAt(i + 1) match {
          case '\\' => sb.append('\\'); i += 2
          case '"'  => sb.append('"'); i += 2
          case '/'  => sb.append('/'); i += 2
          case ' '  => sb.append(' '); i += 2
          case 'n'  => sb.append('\n'); i += 2
          case 't'  => sb.append('\t'); i += 2
          case 'r'  => sb.append('\r'); i += 2
          case 'b'  => sb.append('\b'); i += 2
          case 'f'  => sb.append('\f'); i += 2
          case '0'  => sb.append('\u0000'); i += 2
          case 'a'  => sb.append('\u0007'); i += 2
          case 'v'  => sb.append('\u000B'); i += 2
          case 'e'  => sb.append('\u001B'); i += 2
          // YAML 1.1 section 5.7's remaining single-char escapes, all
          // accepted by go-yaml (ADVICE r16): next-line, nbsp, line/
          // paragraph separator, and an escaped LITERAL tab character
          case 'N'  => sb.append('\u0085'); i += 2
          case '_'  => sb.append('\u00A0'); i += 2
          case 'L'  => sb.append('\u2028'); i += 2
          case 'P'  => sb.append('\u2029'); i += 2
          case '\t' => sb.append('\t'); i += 2
          case 'x'  => sb.append(hex(i + 2, 2).toChar); i += 4
          case 'u'  => sb.append(hex(i + 2, 4).toChar); i += 6
          case 'U'  =>
            val cp = hex(i + 2, 8)
            // out-of-range codepoints keep the file's ParseError
            // contract (Character.toChars would throw a bare IAE
            // with no line number)
            if (!Character.isValidCodePoint(cp))
              throw new ParseError(num, f"codepoint out of range '\\U$cp%08X'")
            sb.appendAll(Character.toChars(cp)); i += 10
          case other =>
            throw new ParseError(num, s"unknown escape '\\$other' in '$s'")
        }
      }
      sb.toString
    }
    else if (s.length >= 2 && s.head == '\'' && s.last == '\'')
      s.substring(1, s.length - 1).replace("''", "'")
    else if (s.contains(": "))
      throw new ParseError(num, s"ambiguous scalar '$s' (quote it)")
    else s
}
