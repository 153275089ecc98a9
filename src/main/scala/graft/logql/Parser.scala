package graft.logql

import graft.functions.Kernels

/** Hand-rolled LogQL lexer + recursive-descent parser (the reference
  * also hand-rolls: internal/logql/lexer/, parser*.go). Subset: stream
  * selectors, line filters (incl. `or` lists), json/logfmt/pattern/
  * regexp/decolorize stages, label filters (num/str/regex/duration/
  * bytes/ip with and/or), keep/drop/distinct/label_format/line_format/
  * unwrap, range aggregations with offset, vector aggregations with
  * by/without and topk/bottomk, scalar binops.
  */
object Parser {
  import Ast._

  final case class ParseError(msg: String, pos: Int)
      extends RuntimeException(s"$msg at $pos")

  // ---- lexer ----
  sealed trait Tok { def pos: Int }
  final case class TIdent(s: String, pos: Int) extends Tok
  final case class TStr(s: String, pos: Int) extends Tok
  final case class TNum(v: Double, raw: String, pos: Int) extends Tok
  final case class TDur(raw: String, pos: Int) extends Tok
  final case class TOp(s: String, pos: Int) extends Tok
  final case class TEof(pos: Int) extends Tok

  private val multiOps = Seq("|=", "!=", "|~", "!~", "=~", ">=", "<=", "==", "|>", "!>")

  def lex(input: String): Vector[Tok] = {
    val toks = Vector.newBuilder[Tok]
    var i = 0
    val n = input.length
    while (i < n) {
      val c = input.charAt(i)
      if (c.isWhitespace) i += 1
      else if (c == '#') {
        // trailing comment: ignored to end-of-line (reference
        // lexer.go comment handling; quoted '#' is consumed by the
        // string branch before this one can see it)
        while (i < n && input.charAt(i) != '\n') i += 1
      }
      else if (c == '"' || c == '`') {
        val quote = c
        val sb = new StringBuilder
        val start = i
        i += 1
        while (i < n && input.charAt(i) != quote) {
          val ch = input.charAt(i)
          if (quote == '"' && ch == '\\' && i + 1 < n) {
            input.charAt(i + 1) match {
              case 'n' => sb.append('\n'); case 't' => sb.append('\t')
              case o   => sb.append(o)
            }
            i += 2
          } else { sb.append(ch); i += 1 }
        }
        if (i >= n) throw ParseError("unterminated string", start)
        i += 1
        toks += TStr(sb.toString, start)
      } else if (c.isDigit || (c == '.' && i + 1 < n && input.charAt(i + 1).isDigit)) {
        val start = i
        while (i < n && (input.charAt(i).isDigit || input.charAt(i) == '.')) i += 1
        // scientific notation (1.23e-3) — consume the exponent before
        // the duration-unit probe so 'e' isn't taken for a unit
        if (i < n && (input.charAt(i) == 'e' || input.charAt(i) == 'E')) {
          var j = i + 1
          if (j < n && (input.charAt(j) == '+' || input.charAt(j) == '-')) j += 1
          val ds = j
          while (j < n && input.charAt(j).isDigit) j += 1
          if (j > ds && !(j < n && input.charAt(j).isLetter)) i = j
        }
        val numPart = input.substring(start, i)
        // duration suffix? (5m, 1h30m, 250ms, 1d…)
        val unitStart = i
        while (i < n && input.charAt(i).isLetter) i += 1
        if (i > unitStart) {
          var j = i
          // absorb composite durations like 1h30m
          var composite = input.substring(start, i)
          while (j < n && (input.charAt(j).isDigit || input.charAt(j).isLetter)) j += 1
          if (j > i && input.substring(start, j).matches("([0-9.]+[a-zµμ]+)+")) {
            composite = input.substring(start, j); i = j
          }
          if (Kernels.parseDurationSeconds(composite).isDefined)
            toks += TDur(composite, start)
          else if (Kernels.parseBytes(composite).isDefined)
            toks += TDur(composite, start) // planner disambiguates via context
          else throw ParseError(s"bad number/duration '$composite'", start)
        } else toks += TNum(numPart.toDouble, numPart, start)
      } else if (c.isLetter || c == '_') {
        val start = i
        while (i < n && (input.charAt(i).isLetterOrDigit || input.charAt(i) == '_')) i += 1
        toks += TIdent(input.substring(start, i), start)
      } else {
        val two = if (i + 1 < n) input.substring(i, i + 2) else ""
        if (multiOps.contains(two)) { toks += TOp(two, i); i += 2 }
        else { toks += TOp(c.toString, i); i += 1 }
      }
    }
    toks += TEof(n)
    toks.result()
  }

  // ---- parser ----
  final class P(toks: Vector[Tok]) {
    private var pos = 0
    def peek: Tok = toks(pos)
    def peekAhead(k: Int): Tok = toks(math.min(pos + k, toks.length - 1))
    def next(): Tok = { val t = toks(pos); pos += 1; t }
    def expectOp(s: String): Unit = next() match {
      case TOp(`s`, _) => ()
      case t           => throw ParseError(s"expected '$s'", t.pos)
    }
    def acceptOp(s: String): Boolean = peek match {
      case TOp(`s`, _) => pos += 1; true
      case _           => false
    }
    def acceptIdent(s: String): Boolean = peek match {
      case TIdent(`s`, _) => pos += 1; true
      case _              => false
    }
    def ident(): String = next() match {
      case TIdent(s, _) => s
      case t            => throw ParseError("expected identifier", t.pos)
    }
    def str(): String = next() match {
      case TStr(s, _) => s
      case t          => throw ParseError("expected string", t.pos)
    }
    def atEof: Boolean = peek.isInstanceOf[TEof]
  }

  private val rangeOps = Set(
    "count_over_time", "rate", "bytes_over_time", "bytes_rate", "rate_counter",
    "sum_over_time", "avg_over_time", "min_over_time", "max_over_time",
    "first_over_time", "last_over_time", "stdvar_over_time", "stddev_over_time",
    "quantile_over_time", "approx_quantile_over_time", "absent_over_time")
  /** Range-agg ops that accept trailing by/without grouping (reference
    * metric_expr.go:48-60).
    */
  private val groupableRangeOps = Set(
    "avg_over_time", "min_over_time", "max_over_time", "first_over_time",
    "last_over_time", "stdvar_over_time", "stddev_over_time",
    "quantile_over_time", "approx_quantile_over_time")
  private val vectorOps = Set(
    "sum", "avg", "min", "max", "count", "stddev", "stdvar",
    "topk", "bottomk", "sort", "sort_desc")

  def parse(input: String): Expr = {
    val p = new P(lex(input))
    val e = p.peek match {
      case TOp("{", _) => LogExpr(parseLogQuery(p))
      case TOp("(", _) => MetricExprTop(parseMetric(p))
      case TIdent(name, _) if rangeOps(name) || vectorOps(name) ||
          name == "label_replace" || name == "label_join" || name == "vector" =>
        MetricExprTop(parseMetric(p))
      case TNum(_, _, _) => MetricExprTop(parseMetric(p))
      case t => throw ParseError("expected selector or metric function", t.pos)
    }
    if (!p.atEof) throw ParseError("trailing input", p.peek.pos)
    e
  }

  def parseLogQuery(p: P): LogQuery = {
    p.expectOp("{")
    val ms = Seq.newBuilder[Matcher]
    if (!p.acceptOp("}")) {
      var done = false
      while (!done) {
        val label = p.ident()
        val op = p.next() match {
          case TOp("=", _)  => MatchEq
          case TOp("!=", _) => MatchNeq
          case TOp("=~", _) => MatchRe
          case TOp("!~", _) => MatchNotRe
          case t            => throw ParseError("expected matcher op", t.pos)
        }
        ms += Matcher(label, op, p.str())
        if (!p.acceptOp(",")) { p.expectOp("}"); done = true }
      }
    }
    val stages = Seq.newBuilder[Stage]
    var more = true
    while (more) {
      p.peek match {
        case TOp(o @ ("|=" | "!=" | "|~" | "!~"), _) =>
          p.next()
          if ((o == "|=" || o == "!=") && p.acceptIdent("ip")) {
            p.expectOp("(")
            val pats = Seq.newBuilder[String]
            pats += p.str()
            p.expectOp(")")
            while (p.acceptIdent("or")) { // |= ip("a") or ip("b") or-list
              if (!p.acceptIdent("ip")) throw ParseError("expected ip(...)", p.peek.pos)
              p.expectOp("(")
              pats += p.str()
              p.expectOp(")")
            }
            stages += LineFilterIp(pats.result(), negate = o == "!=")
          } else {
          val needles = Seq.newBuilder[String]
          needles += p.str()
          while (p.acceptIdent("or")) needles += p.str()
          val op = o match {
            case "|=" => MatchEq; case "!=" => MatchNeq
            case "|~" => MatchRe; case _ => MatchNotRe
          }
          stages += LineFilter(op, needles.result())
          }
        case TOp(o @ ("|>" | "!>"), _) =>
          p.next()
          stages += PatternLineFilter(p.str(), negate = o == "!>")
        case TOp("|", _) =>
          p.next()
          stages += parsePipeStage(p)
        case _ => more = false
      }
    }
    LogQuery(ms.result(), stages.result())
  }

  private def parsePipeStage(p: P): Stage = p.next() match {
    case TIdent("json", _) =>
      // optional path args: json a="x.b", n  (bare ident = own name)
      p.peek match {
        case TIdent(_, _) =>
          val paths = Seq.newBuilder[(String, String)]
          var done = false
          while (!done) {
            val name = p.ident()
            val path = if (p.acceptOp("=")) p.str() else name
            paths += (name -> path)
            if (!p.acceptOp(",")) done = true
          }
          JsonPathStage(paths.result())
        case _ => JsonStage
      }
    case TIdent("unpack", _)     => UnpackStage
    case TIdent("logfmt", _) =>
      var strict = false
      var keepEmpty = false
      var flags = true
      while (flags && p.acceptOp("-")) {
        p.expectOp("-")
        p.ident() match {
          case "strict"     => strict = true
          case "keep"       => // lexed as keep-empty → "keep" "-" "empty"
            p.expectOp("-"); if (p.ident() != "empty")
              throw ParseError("unknown logfmt flag", p.peek.pos)
            keepEmpty = true
          case other => throw ParseError(s"unknown logfmt flag --$other", p.peek.pos)
        }
        flags = p.peek match { case TOp("-", _) => true; case _ => false }
      }
      val params = Seq.newBuilder[(String, String)]
      p.peek match {
        case TIdent(_, _) =>
          var done = false
          while (!done) {
            val name = p.ident()
            val src = if (p.acceptOp("=")) p.str() else name
            params += (name -> src)
            if (!p.acceptOp(",")) done = true
          }
        case _ => ()
      }
      val ps = params.result()
      if (ps.isEmpty && !strict && !keepEmpty) LogfmtStage
      else LogfmtExprStage(ps, strict, keepEmpty)
    case TIdent("decolorize", _) => DecolorizeStage
    case TIdent("pattern", _)    => PatternStage(p.str())
    case TIdent("regexp", _)     => RegexpStage(p.str())
    case TIdent("unwrap", _) =>
      val first = p.ident()
      first match {
        // Loki's conversion-function form: unwrap duration(took)
        case "bytes" | "duration" | "duration_seconds" if p.acceptOp("(") =>
          val lbl = p.ident()
          p.expectOp(")")
          UnwrapStage(lbl, Some(first))
        case _ =>
          // postfix form: unwrap took duration
          val conv = p.peek match {
            case TIdent(c @ ("bytes" | "duration" | "duration_seconds"), _) =>
              p.next(); Some(c)
            case _ => None
          }
          UnwrapStage(first, conv)
      }
    case TIdent("keep", _) =>
      val is = keepDropItems(p)
      if (is.forall(_._2.isEmpty)) KeepStage(is.map(_._1))
      else KeepValuesStage(is)
    case TIdent("drop", _) =>
      val is = keepDropItems(p)
      if (is.forall(_._2.isEmpty)) DropStage(is.map(_._1))
      else DropValuesStage(is)
    case TIdent("distinct", _) => DistinctStage(identList(p))
    case TIdent("label_format", _) =>
      val rs = Seq.newBuilder[(String, String)]
      val tpls = Seq.newBuilder[(String, String)]
      var done = false
      var pos = 0
      while (!done) {
        pos = p.peek.pos
        val dst = p.ident(); p.expectOp("=")
        p.peek match {
          case TStr(t, _) => p.next(); tpls += (dst -> t)
          case _          => rs += (dst -> p.ident())
        }
        if (!p.acceptOp(",")) done = true
      }
      (rs.result(), tpls.result()) match {
        case (renames, Seq())       => LabelFormatStage(renames)
        case (Seq(), Seq((d, t)))   => LabelFormatTemplateStage(d, t)
        case _ => throw ParseError(
          "label_format: mixing renames and templates unsupported", pos)
      }
    case TIdent("line_format", _) => LineFormatStage(p.str())
    case TIdent(label, _) => // label filter starting with a label name
      LabelFilterStage(parsePredicateRest(p, label))
    case TOp("(", _) =>
      // stage-leading paren group: `| (a, b) or c` — close the group,
      // then keep chaining connectives at this level
      val inner = parsePredicateParen(p)
      p.expectOp(")")
      LabelFilterStage(parsePredTail(p, inner))
    case t => throw ParseError("unknown pipeline stage", t.pos)
  }

  /** keep/drop item list: `name`, `name="value"`, or `name=~"regex"`
    * (reference pipeline.go:296-306).
    */
  private def keepDropItems(p: P): Seq[(String, Option[ValueMatcher])] = {
    val items = Seq.newBuilder[(String, Option[ValueMatcher])]
    var done = false
    while (!done) {
      val name = p.ident()
      val v =
        if (p.acceptOp("=~")) Some(ValueMatcher(p.str(), regex = true))
        else if (p.acceptOp("=")) Some(ValueMatcher(p.str(), regex = false))
        else None
      items += (name -> v)
      if (!p.acceptOp(",")) done = true
    }
    items.result()
  }

  private def identList(p: P): Seq[String] = {
    val out = Seq.newBuilder[String]
    out += p.ident()
    while (p.acceptOp(",")) out += p.ident()
    out.result()
  }

  // predicate grammar: pred := term (('and'|'or') term)* ; term := label cmp value | '(' pred ')'
  private def parsePredicateParen(p: P): LabelPredicate = {
    val first = parseTerm(p)
    parsePredTail(p, first)
  }

  private def parsePredicateRest(p: P, label: String): LabelPredicate = {
    val first = parseCmp(p, label)
    parsePredTail(p, first)
  }

  private def parsePredTail(p: P, first: LabelPredicate): LabelPredicate = {
    var acc = first
    var more = true
    while (more) {
      // `,` and bare juxtaposition both chain as AND (upstream label
      // filter grammar: `| a >= 1ms, b >= 1KB` ≡ `| a >= 1ms b >= 1KB`
      // ≡ and), alongside the explicit and/or keywords
      if (p.acceptIdent("and") || p.acceptOp(",")) acc = PredAnd(acc, parseTerm(p))
      else if (p.acceptIdent("or")) acc = PredOr(acc, parseTerm(p))
      else if (juxtaposedTerm(p)) acc = PredAnd(acc, parseTerm(p))
      else more = false
    }
    acc
  }

  /** Whether the next tokens start another label-filter term with no
    * connective: `(…` or `label <cmp>`. Anything else (the next `|`
    * stage, a range `[`, EOF…) ends the chain.
    */
  private def juxtaposedTerm(p: P): Boolean = p.peek match {
    case TOp("(", _) => true
    case TIdent(l, _) if l != "and" && l != "or" =>
      p.peekAhead(1) match {
        case TOp(op, _) =>
          Set("=", "==", "!=", ">", ">=", "<", "<=", "=~", "!~")(op)
        case _ => false
      }
    case _ => false
  }

  private def parseTerm(p: P): LabelPredicate = p.next() match {
    case TOp("(", _) =>
      val inner = parsePredicateParen(p)
      p.expectOp(")")
      inner
    case TIdent(label, _) => parseCmp(p, label)
    case t => throw ParseError("expected predicate", t.pos)
  }

  private def parseCmp(p: P, label: String): PredCmp = {
    val op = p.next() match {
      case TOp("=", _) | TOp("==", _) => CmpEq
      case TOp("!=", _)               => CmpNeq
      case TOp(">", _)                => CmpGt
      case TOp(">=", _)               => CmpGe
      case TOp("<", _)                => CmpLt
      case TOp("<=", _)               => CmpLe
      case TOp("=~", _) =>
        return PredCmp(label, CmpEq, ReValue(p.str(), negate = false))
      case TOp("!~", _) =>
        return PredCmp(label, CmpEq, ReValue(p.str(), negate = true))
      case t => throw ParseError("expected comparison", t.pos)
    }
    val value = p.peek match {
      case TNum(v, _, _) => p.next(); NumValue(v)
      case TStr(s, _)    => p.next(); StrValue(s)
      case TDur(raw, _) =>
        p.next()
        if (Kernels.parseDurationSeconds(raw).isDefined) DurValue(raw) else BytesValue(raw)
      case TIdent("ip", _) =>
        p.next(); p.expectOp("("); val pat = p.str(); p.expectOp(")")
        IpValue(pat, negate = op == CmpNeq)
      case t => throw ParseError("expected comparison value", t.pos)
    }
    PredCmp(label, op, value)
  }

  /** Prometheus operator precedence (left-assoc except ^). */
  private val precOf = Map(
    "or" -> 1, "and" -> 2, "unless" -> 2,
    ">" -> 3, "<" -> 3, ">=" -> 3, "<=" -> 3, "==" -> 3, "!=" -> 3,
    "+" -> 4, "-" -> 4, "*" -> 5, "/" -> 5, "%" -> 5, "^" -> 6)

  def parseMetric(p: P): MetricExpr = parseBin(p, 1)

  /** Precedence-climbing binop parser: left-associative chains at equal
    * precedence (a - b + c = (a-b)+c), ^ right-associative.
    */
  private def parseBin(p: P, minPrec: Int): MetricExpr = {
    var lhs = parseMetricAtom(p)
    var more = true
    while (more) {
      val opOpt = p.peek match {
        case TOp(o, _) if precOf.contains(o)   => Some(o)
        case TIdent(o, _) if precOf.contains(o) => Some(o)
        case _ => None
      }
      opOpt match {
        case Some(op) if precOf(op) >= minPrec =>
          p.next()
          // `bool` collapses a filtering comparison to 0/1 (upstream
          // LogQL shares the PromQL modifier)
          val b = p.peek match {
            case TIdent("bool", _) => p.next(); true
            case _ => false
          }
          val m = parseMatching(p)
          val nextMin = if (op == "^") precOf(op) else precOf(op) + 1
          lhs = BinOp(op, lhs, parseBin(p, nextMin), m, b)
        case _ => more = false
      }
    }
    lhs
  }

  /** `on(..)/ignoring(..) [group_left|group_right [(include..)]]`
    * after a binop (reference metric_expr.go:238-253).
    */
  private def parseMatching(p: P): Option[VectorMatch] = {
    val on =
      if (p.acceptIdent("on")) Some(true)
      else if (p.acceptIdent("ignoring")) Some(false)
      else None
    on.map { isOn =>
      p.expectOp("(")
      val ls = if (p.acceptOp(")")) Seq.empty[String]
      else { val l = identList(p); p.expectOp(")"); l }
      val side =
        if (p.acceptIdent("group_left")) Some("left")
        else if (p.acceptIdent("group_right")) Some("right")
        else None
      val include = if (side.isDefined && p.acceptOp("(")) {
        if (p.acceptOp(")")) Seq.empty[String]
        else { val l = identList(p); p.expectOp(")"); l }
      } else Seq.empty[String]
      VectorMatch(isOn, ls, side, include)
    }
  }

  private def parseMetricAtom(p: P): MetricExpr = p.peek match {
    case TOp("(", _) => // grouping
      p.next()
      val e = parseBin(p, 1)
      p.expectOp(")")
      e
    case TNum(v, _, _) => p.next(); ScalarLit(v)
    case TIdent("vector", _) =>
      p.next(); p.expectOp("(")
      val v = p.next() match {
        case TNum(x, _, _) => x
        case t             => throw ParseError("expected number", t.pos)
      }
      p.expectOp(")")
      VectorLit(v)
    case TIdent(fn @ ("label_replace" | "label_join"), _) =>
      p.next(); p.expectOp("(")
      val inner = parseMetric(p)
      val strs = Seq.newBuilder[String]
      while (p.acceptOp(",")) strs += p.str()
      p.expectOp(")")
      LabelFnExpr(fn, inner, strs.result())
    case TIdent(name, _) if rangeOps(name) =>
      p.next(); p.expectOp("(")
      val param = if (name.endsWith("quantile_over_time")) {
        val v = p.next() match {
          case TNum(x, _, _) => x
          case t             => throw ParseError("expected quantile", t.pos)
        }
        p.expectOp(",")
        Some(v)
      } else None
      val q = parseLogQuery(p)
      p.expectOp("[")
      val range = p.next() match {
        // a TDur token may carry a BYTES-only literal (the lexer keeps
        // both; context disambiguates) — a typed error, never a .get
        case TDur(raw, pos) => Kernels.parseDurationSeconds(raw) match {
          case Some(sec) => (sec * 1e9).toLong
          case None => throw ParseError(s"expected range duration, got '$raw'", pos)
        }
        case t => throw ParseError("expected range duration", t.pos)
      }
      p.expectOp("]")
      val offset = if (p.acceptIdent("offset")) p.next() match {
        case TDur(raw, pos) => Kernels.parseDurationSeconds(raw) match {
          case Some(sec) => (sec * 1e9).toLong
          case None => throw ParseError(s"expected offset duration, got '$raw'", pos)
        }
        case t => throw ParseError("expected offset duration", t.pos)
      } else 0L
      p.expectOp(")")
      // trailing grouping: avg_over_time(...) by (method)
      var by = Seq.empty[String]
      var without = Seq.empty[String]
      if (p.acceptIdent("by")) { p.expectOp("("); by = identList(p); p.expectOp(")") }
      else if (p.acceptIdent("without")) { p.expectOp("("); without = identList(p); p.expectOp(")") }
      // grouping is only legal on the label-regrouping ops (reference
      // metric_expr.go:48-60 — avg/stddev/stdvar/quantile/max/min/
      // first/last); count_over_time/rate/bytes_* by (...) is a parse error
      if ((by.nonEmpty || without.nonEmpty) && !groupableRangeOps(name))
        throw ParseError(
          s"grouping aggregation is not allowed for operation $name", 0)
      RangeAgg(name, q, range, offset, param, by, without)
    case TIdent(name, _) if vectorOps(name) =>
      p.next()
      var by = Seq.empty[String]
      var without = Seq.empty[String]
      if (p.acceptIdent("by")) { p.expectOp("("); by = identList(p); p.expectOp(")") }
      else if (p.acceptIdent("without")) { p.expectOp("("); without = identList(p); p.expectOp(")") }
      p.expectOp("(")
      val k = if (name == "topk" || name == "bottomk") {
        val v = p.next() match {
          case TNum(x, _, _) => x.toInt
          case t             => throw ParseError("expected k", t.pos)
        }
        p.expectOp(",")
        Some(v)
      } else None
      val inner = parseMetric(p)
      // trailing grouping form: sum(...) by (a)
      p.expectOp(")")
      if (p.acceptIdent("by")) { p.expectOp("("); by = identList(p); p.expectOp(")") }
      else if (p.acceptIdent("without")) { p.expectOp("("); without = identList(p); p.expectOp(")") }
      VectorAgg(name, by, without, k, inner)
    case t => throw ParseError("expected metric expression", t.pos)
  }
}
