package graft.logql

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions

/** Bounded Go-template subset for `line_format` / `label_format`
  * (reference internal/logql/logqlengine/template.go:33-110 — sprig +
  * Loki additions), compiled to Column expressions, never UDFs.
  *
  * Supported inside `{{ ... }}`:
  *   - `.label` field access
  *   - function-call form: `ToLower .lbl`, `trunc 5 .lbl`,
  *     `regexReplaceAll "re" .lbl "repl"`
  *   - pipelines: `.lbl | ToLower | trunc 5` — the piped value becomes
  *     the LAST argument of each stage, Go-template style
  *
  * Functions: ToLower/lower, ToUpper/upper, trim, trimPrefix,
  * trimSuffix, trunc, substr, replace, regexReplaceAll (Java `$1`
  * backrefs), bytes (parse "1KiB" → number), duration (parse "1h" →
  * seconds), b64enc, b64dec, urlencode is NOT supported.
  */
object Template {

  final case class TemplateError(msg: String) extends RuntimeException(msg)

  private sealed trait Tok
  private final case class TField(label: String) extends Tok
  private final case class TStr(s: String) extends Tok
  private final case class TNum(v: Double) extends Tok
  private final case class TIdent(s: String) extends Tok

  /** Split a segment into tokens, respecting double-quoted strings. */
  private def tokenize(seg: String): List[Tok] = {
    val out = List.newBuilder[Tok]
    var i = 0
    val n = seg.length
    while (i < n) {
      val c = seg.charAt(i)
      if (c.isWhitespace) i += 1
      else if (c == '"') {
        val sb = new StringBuilder
        i += 1
        while (i < n && seg.charAt(i) != '"') {
          if (seg.charAt(i) == '\\' && i + 1 < n) { sb.append(seg.charAt(i + 1)); i += 2 }
          else { sb.append(seg.charAt(i)); i += 1 }
        }
        if (i >= n) throw TemplateError(s"unterminated string in '$seg'")
        i += 1
        out += TStr(sb.toString)
      } else if (c == '.') {
        val start = i + 1
        i += 1
        while (i < n && (seg.charAt(i).isLetterOrDigit || seg.charAt(i) == '_')) i += 1
        out += TField(seg.substring(start, i))
      } else if (c.isDigit || c == '-') {
        val start = i
        i += 1
        while (i < n && (seg.charAt(i).isDigit || seg.charAt(i) == '.')) i += 1
        out += TNum(seg.substring(start, i).toDouble)
      } else {
        val start = i
        while (i < n && !seg.charAt(i).isWhitespace) i += 1
        out += TIdent(seg.substring(start, i))
      }
    }
    out.result()
  }

  /** Split on top-level `|` (quotes respected). */
  private def splitPipes(s: String): List[String] = {
    val segs = List.newBuilder[String]
    val cur = new StringBuilder
    var inStr = false
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '"' && (i == 0 || s.charAt(i - 1) != '\\')) { inStr = !inStr; cur.append(c) }
      else if (c == '|' && !inStr) { segs += cur.toString; cur.clear() }
      else cur.append(c)
      i += 1
    }
    segs += cur.toString
    segs.result()
  }

  private def atom(t: Tok, resolve: String => Column): Column = t match {
    case TField(l) => coalesce(resolve(l), lit(""))
    case TStr(s)   => lit(s)
    case TNum(v)   => lit(if (v == v.floor) v.toLong.toString else v.toString)
    case TIdent(s) => throw TemplateError(s"unexpected identifier '$s'")
  }

  private def intArg(t: Tok): Int = t match {
    case TNum(v) => v.toInt
    case other   => throw TemplateError(s"expected integer, got $other")
  }

  private def strArg(t: Tok): String = t match {
    case TStr(s) => s
    case other   => throw TemplateError(s"expected string literal, got $other")
  }

  /** Apply one function with Go-template arg order (value last). */
  private def call(fn: String, args: List[Tok], resolve: String => Column): Column = {
    def value: Column = atom(args.last, resolve)
    fn match {
      case "__line__" | "__timestamp__" if args.isEmpty =>
        // built-in zero-arg template variables (reference
        // logqlengine/template.go __line__/__timestamp__ bindings) —
        // the planner's resolver supplies the body / rendered ts
        coalesce(resolve(fn), lit(""))
      case "ToLower" | "lower" => lower(value)
      case "ToUpper" | "upper" => upper(value)
      case "trim"              => trim(value)
      case "trimPrefix" => // trimPrefix "p" .v
        val p = strArg(args.head)
        when(value.startsWith(p), value.substr(lit(p.length + 1), length(value))).otherwise(value)
      case "trimSuffix" =>
        val p = strArg(args.head)
        when(value.endsWith(p), value.substr(lit(1), length(value) - p.length)).otherwise(value)
      case "trunc" => // trunc n .v
        value.substr(1, intArg(args.head))
      case "substr" => // substr start end .v (0-based, end exclusive)
        val s0 = intArg(args(0)); val e0 = intArg(args(1))
        value.substr(s0 + 1, math.max(e0 - s0, 0))
      case "replace" => // replace old new .v
        replace(value, lit(strArg(args(0))), lit(strArg(args(1))))
      case "regexReplaceAll" => // regexReplaceAll "re" .v "repl"
        regexp_replace(atom(args(1), resolve),
          graft.functions.Kernels.re2ToJava(strArg(args(0))), strArg(args(2)))
      case "bytes"    => GraftFunctions.parse_bytes(value).cast("string")
      case "duration" => GraftFunctions.parse_duration(value).cast("string")
      case "b64enc"   => base64(value.cast("binary"))
      case "b64dec"   => unbase64(value).cast("string")
      case other      => extended(other, args.init, value).getOrElse(
        throw TemplateError(s"unsupported template function '$other'"))
    }
  }

  /** Go reference time layout → java.time pattern for the tokens the
    * reference's templates use (logqlengine/template.go toDateInZone).
    */
  private def goLayoutToJava(l: String): String =
    l.replace("2006", "yyyy").replace("Jan", "MMM").replace("Mon", "EEE")
      .replace("01", "MM").replace("02", "dd").replace("15", "HH")
      .replace("04", "mm").replace("05", "ss").replace(".000", ".SSS")

  /** The remaining FuncMap entries (reference logqlengine/
    * template.go:33-110) — all take the value LAST in Go order, so one
    * table serves both the direct and the piped call forms.
    *
    *   - urlencode/urldecode: query-string escaping
    *   - toDateInZone "layout" "zone" v: parse a wall-clock string in
    *     the zone (rendered in Spark's timestamp string form)
    *   - unixToTime v: epoch by DIGIT COUNT — sec/ms/µs/ns, the
    *     reference's heuristic
    *   - alignLeft/alignRight n v: space-pad without truncating
    *   - count "sub" v: non-overlapping occurrence count
    */
  private def extended(fn: String, pre: List[Tok], value: Column): Option[Column] =
    fn match {
      case "urlencode" => Some(url_encode(value))
      case "urldecode" => Some(url_decode(value))
      case "toDateInZone" =>
        val fmt = goLayoutToJava(strArg(pre(0)))
        val zone = strArg(pre(1))
        Some(to_utc_timestamp(to_timestamp(value, fmt), zone).cast("string"))
      case "unixToTime" =>
        val n = value.cast("long")
        val d = length(trim(value))
        Some(when(d <= 10, timestamp_seconds(n))
          .when(d === 13, timestamp_millis(n))
          .when(d === 16, timestamp_micros(n))
          .otherwise(timestamp_micros((n / 1000).cast("long")))
          .cast("string"))
      case "alignLeft" =>
        val n = intArg(pre.head)
        Some(when(length(value) >= n, value).otherwise(rpad(value, n, " ")))
      case "alignRight" =>
        val n = intArg(pre.head)
        Some(when(length(value) >= n, value).otherwise(lpad(value, n, " ")))
      case "count" =>
        val sub = strArg(pre.head)
        Some(((length(value) - length(replace(value, lit(sub), lit("")))) /
          sub.length).cast("long").cast("string"))
      case _ => None
    }

  /** Compile the inside of one `{{ ... }}` action. */
  private def compileAction(action: String, resolve: String => Column): Column = {
    val segs = splitPipes(action)
    var acc: Option[Column] = None
    for (seg <- segs) {
      val toks = tokenize(seg)
      acc = Some(toks match {
        case (single @ (TField(_) | TStr(_) | TNum(_))) :: Nil if acc.isEmpty =>
          atom(single, resolve)
        case TIdent(fn) :: args =>
          acc match {
            case None => call(fn, args, resolve)
            case Some(piped) =>
              // piped value becomes the last argument
              callPiped(fn, args, piped, resolve)
          }
        case other => throw TemplateError(s"cannot compile segment '$seg'")
      })
    }
    acc.getOrElse(lit(""))
  }

  /** call() but with an already-computed Column as the final arg. */
  private def callPiped(fn: String, args: List[Tok], piped: Column,
      resolve: String => Column): Column = fn match {
    case "ToLower" | "lower" => lower(piped)
    case "ToUpper" | "upper" => upper(piped)
    case "trim"              => trim(piped)
    case "trimPrefix" =>
      val p = strArg(args.head)
      when(piped.startsWith(p), piped.substr(lit(p.length + 1), length(piped))).otherwise(piped)
    case "trimSuffix" =>
      val p = strArg(args.head)
      when(piped.endsWith(p), piped.substr(lit(1), length(piped) - p.length)).otherwise(piped)
    case "trunc"  => piped.substr(1, intArg(args.head))
    case "substr" =>
      val s0 = intArg(args(0)); val e0 = intArg(args(1))
      piped.substr(s0 + 1, math.max(e0 - s0, 0))
    case "replace" =>
      replace(piped, lit(strArg(args(0))), lit(strArg(args(1))))
    case "regexReplaceAll" => // .v | regexReplaceAll "re" "repl"
      regexp_replace(piped,
        graft.functions.Kernels.re2ToJava(strArg(args(0))), strArg(args(1)))
    case "bytes"    => GraftFunctions.parse_bytes(piped).cast("string")
    case "duration" => GraftFunctions.parse_duration(piped).cast("string")
    case "b64enc"   => base64(piped.cast("binary"))
    case "b64dec"   => unbase64(piped).cast("string")
    case other      => extended(other, args, piped).getOrElse(
      throw TemplateError(s"unsupported template function '$other'"))
  }

  private val Action = "\\{\\{(.*?)\\}\\}".r

  /** Compile a full template string to one Column. */
  def compile(template: String, resolve: String => Column): Column = {
    var cols = List.empty[Column]
    var last = 0
    for (m <- Action.findAllMatchIn(template)) {
      if (m.start > last) cols :+= lit(template.substring(last, m.start))
      cols :+= compileAction(m.group(1).trim, resolve)
      last = m.end
    }
    if (last < template.length) cols :+= lit(template.substring(last))
    if (cols.isEmpty) lit("") else concat(cols: _*)
  }
}
