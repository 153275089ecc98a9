package graft.logql

/** LogQL AST printer — round-trips with the parser (the reference pins
  * its grammar the same way: parser_test.go printer round-trip).
  */
object Printer {
  import Ast._

  private def quote(s: String): String =
    "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\t' => "\\t"
      case c    => c.toString
    } + "\""

  private def matchOp(op: MatchOp): String = op match {
    case MatchEq => "="; case MatchNeq => "!="
    case MatchRe => "=~"; case MatchNotRe => "!~"
  }

  private def lineFilterOp(op: MatchOp): String = op match {
    case MatchEq => "|="; case MatchNeq => "!="
    case MatchRe => "|~"; case MatchNotRe => "!~"
  }

  def print(e: Expr): String = e match {
    case LogExpr(q)       => printLog(q)
    case MetricExprTop(m) => printMetric(m)
  }

  def printLog(q: LogQuery): String = {
    val sel = q.matchers
      .map(m => s"${m.label}${matchOp(m.op)}${quote(m.value)}")
      .mkString("{", ", ", "}")
    (sel +: q.stages.map(printStage)).mkString(" ")
  }

  private[logql] def printStage(s: Stage): String = s match {
    case LineFilter(op, needles) =>
      s"${lineFilterOp(op)} ${needles.map(quote).mkString(" or ")}"
    case LineFilterIp(pats, neg) =>
      s"${if (neg) "!=" else "|="} ${pats.map(p => s"ip(${quote(p)})").mkString(" or ")}"
    case JsonStage       => "| json"
    case JsonPathStage(paths) =>
      s"| json ${paths.map { case (n, p) => s"$n=${quote(p)}" }.mkString(", ")}"
    case UnpackStage     => "| unpack"
    case PatternLineFilter(pat, neg) =>
      s"${if (neg) "!>" else "|>"} ${quote(pat)}"
    case LogfmtStage     => "| logfmt"
    case LogfmtExprStage(ps, strict, keepEmpty) =>
      val flags = (if (strict) " --strict" else "") +
        (if (keepEmpty) " --keep-empty" else "")
      val args = if (ps.isEmpty) ""
        else " " + ps.map { case (d, s) =>
          if (d == s) d else s"$d=${quote(s)}" }.mkString(", ")
      s"| logfmt$flags$args"
    case DecolorizeStage => "| decolorize"
    case PatternStage(p) => s"| pattern ${quote(p)}"
    case RegexpStage(p)  => s"| regexp ${quote(p)}"
    case LabelFilterStage(p) => s"| ${printPred(p)}"
    case KeepStage(ls)   => s"| keep ${ls.mkString(", ")}"
    case KeepValuesStage(items) =>
      s"| keep ${items.map(printItem).mkString(", ")}"
    case DropStage(ls)   => s"| drop ${ls.mkString(", ")}"
    case DropValuesStage(items) =>
      s"| drop ${items.map(printItem).mkString(", ")}"
    case DistinctStage(ls) => s"| distinct ${ls.mkString(", ")}"
    case LabelFormatStage(rs) =>
      s"| label_format ${rs.map { case (d, src) => s"$d=$src" }.mkString(", ")}"
    case LabelFormatTemplateStage(d, t) => s"| label_format $d=${quote(t)}"
    case LineFormatStage(t) => s"| line_format ${quote(t)}"
    case UnwrapStage(l, conv) =>
      s"| unwrap $l${conv.map(" " + _).getOrElse("")}"
  }

  private def printItem(item: (String, Option[ValueMatcher])): String = item match {
    case (l, Some(ValueMatcher(v, true)))  => s"$l=~${quote(v)}"
    case (l, Some(ValueMatcher(v, false))) => s"$l=${quote(v)}"
    case (l, None)                         => l
  }

  private[logql] def printPred(p: LabelPredicate): String = p match {
    case PredAnd(l, r) => s"${printPred(l)} and ${printPred(r)}"
    case PredOr(l, r)  => s"${printPred(l)} or ${printPred(r)}"
    case PredCmp(label, op, value) =>
      val o = op match {
        case CmpEq => "="; case CmpNeq => "!="
        case CmpGt => ">"; case CmpGe => ">="
        case CmpLt => "<"; case CmpLe => "<="
      }
      value match {
        case NumValue(v) =>
          val n = if (v == v.floor && !v.isInfinite) v.toLong.toString else v.toString
          s"$label $o $n"
        case StrValue(s)      => s"$label $o ${quote(s)}"
        case ReValue(re, neg) => s"$label ${if (neg) "!~" else "=~"} ${quote(re)}"
        case DurValue(raw)    => s"$label $o $raw"
        case BytesValue(raw)  => s"$label $o $raw"
        case IpValue(pat, neg) =>
          s"$label ${if (neg) "!=" else "="} ip(${quote(pat)})"
      }
  }

  def printMetric(m: MetricExpr): String = m match {
    case RangeAgg(op, q, rangeNs, offsetNs, param, by, without) =>
      val dur = formatDuration(rangeNs)
      val off = if (offsetNs != 0) s" offset ${formatDuration(offsetNs)}" else ""
      val p = param.map(v => s"$v, ").getOrElse("")
      val grouping =
        if (by.nonEmpty) s" by (${by.mkString(", ")})"
        else if (without.nonEmpty) s" without (${without.mkString(", ")})"
        else ""
      s"$op($p${printLog(q)}[$dur]$off)$grouping"
    case VectorAgg(op, by, without, k, inner) =>
      val grouping =
        if (by.nonEmpty) s" by (${by.mkString(", ")})"
        else if (without.nonEmpty) s" without (${without.mkString(", ")})"
        else ""
      val kArg = k.map(v => s"$v, ").getOrElse("")
      s"$op$grouping($kArg${printMetric(inner)})"
    case BinOp(op, l, r, m, b) =>
      val mod = m.map { vm =>
        val kw = if (vm.on) "on" else "ignoring"
        val grp = vm.groupSide.map { s =>
          val inc = if (vm.include.nonEmpty) s"(${vm.include.mkString(", ")})" else ""
          s" group_$s$inc"
        }.getOrElse("")
        s" $kw(${vm.labels.mkString(", ")})$grp"
      }.getOrElse("")
      // nested binops print parenthesized so the precedence-climbing
      // parser reconstructs the same tree
      def side(e: MetricExpr): String = e match {
        case _: BinOp => s"(${printMetric(e)})"
        case _        => printMetric(e)
      }
      val boolKw = if (b) " bool" else ""
      s"${side(l)} $op$boolKw$mod ${side(r)}"
    case LabelFnExpr(fn, inner, strs) =>
      s"$fn(${printMetric(inner)}, ${strs.map(quote).mkString(", ")})"
    case ScalarLit(v) =>
      if (v == v.floor && !v.isInfinite) v.toLong.toString else v.toString
    case VectorLit(v) => s"vector(${printMetric(ScalarLit(v))})"
  }

  /** ns → the shortest whole-unit LogQL duration. */
  def formatDuration(ns: Long): String = {
    val units = Seq(
      ("d", 86400000000000L), ("h", 3600000000000L), ("m", 60000000000L),
      ("s", 1000000000L), ("ms", 1000000L), ("us", 1000L), ("ns", 1L))
    units.collectFirst {
      case (u, f) if ns % f == 0 && ns / f > 0 => s"${ns / f}$u"
    }.getOrElse(s"${ns}ns")
  }
}
