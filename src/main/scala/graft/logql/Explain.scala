package graft.logql

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import Ast._

/** `@explain` query prefix (reference lexer.go:80-84,
  * logqlengine/engine_explain_query.go): instead of results, the query
  * returns ONE synthetic stream labeled {log: explain} whose lines
  * record the planner's pushdown decisions — which line filters and
  * label filters reach the storage scan, whether the whole pipeline
  * offloads, whether metric sampling offloads, and WHY each refusal
  * happened. The safety analysis mirrors the reference's
  * ClickhouseOptimizer (querier_logs_optimizer.go:154-420) over our
  * AST; on the Spark side "offloaded" means the predicate compiles
  * onto stored columns ahead of the parse stages, where Catalyst
  * pushes it into the parquet scan, instead of running post-extract.
  */
object Explain {

  val Prefix = "@explain"

  private val ErrorLabels = Set("__error__", "__error_details__")

  private def predLabels(p: LabelPredicate): Set[String] = p match {
    case PredAnd(l, r)    => predLabels(l) ++ predLabels(r)
    case PredOr(l, r)     => predLabels(l) ++ predLabels(r)
    case PredCmp(l, _, _) => Set(l)
  }

  /** Predicates whose evaluation itself may raise `__error__`
    * (conversion failures — reference failableLabelPredicate).
    */
  private def failable(p: LabelPredicate): Boolean = p match {
    case PredAnd(l, r) => failable(l) || failable(r)
    case PredOr(l, r)  => failable(l) || failable(r)
    case PredCmp(_, _, v) => v match {
      case _: NumValue | _: DurValue | _: BytesValue | _: IpValue => true
      case _: StrValue | _: ReValue => false
    }
  }

  /** Capture names of a `| regexp` pattern ((?P<name>…) groups). */
  private def regexpCaptures(pattern: String): Set[String] =
    "\\(\\?P?<([A-Za-z_][A-Za-z0-9_]*)>".r
      .findAllMatchIn(pattern).map(_.group(1)).toSet

  /** Capture names of a `| pattern` / `<name>` template. */
  private def patternCaptures(pattern: String): Set[String] =
    "<([A-Za-z_][A-Za-z0-9_]*)>".r
      .findAllMatchIn(pattern).map(_.group(1)).filter(_ != "_").toSet

  /** Whether `stage` can change the value (or presence) of `label`
    * before a later filter reads it — the reference's affectsLabel.
    */
  private def affectsLabel(stage: Stage, label: String): Boolean = {
    val isErr = ErrorLabels(label)
    stage match {
      case _: LineFilter | _: LineFilterIp | _: PatternLineFilter => false
      case DecolorizeStage | _: DistinctStage => false
      // full parsers add EVERY parsed field (and may fail)
      case JsonStage | LogfmtStage | UnpackStage => true
      case JsonPathStage(paths) => isErr || paths.exists(_._1 == label)
      case LogfmtExprStage(params, _, _) =>
        isErr || params.exists(_._1 == label)
      case RegexpStage(p)  => regexpCaptures(p).contains(label)
      case PatternStage(p) => patternCaptures(p).contains(label)
      case LineFormatStage(_) => isErr // template may fail
      case LabelFilterStage(pred) => isErr && failable(pred)
      case LabelFormatStage(renames) =>
        isErr || renames.exists(_._1 == label)
      case LabelFormatTemplateStage(l, _) => isErr || l == label
      case KeepStage(ls)       => !ls.contains(label)
      case KeepValuesStage(is) => !is.exists(_._1 == label)
      case DropStage(ls)       => ls.contains(label)
      case DropValuesStage(is) => is.exists(_._1 == label)
      case UnwrapStage(_, _)   => isErr // conversion may fail
    }
  }

  private def isLineFilter(s: Stage): Boolean = s match {
    case _: LineFilter | _: LineFilterIp | _: PatternLineFilter => true
    case _ => false
  }

  /** Stages that leave the line itself untouched (filters past them
    * still see the stored body).
    */
  private def preservesLine(s: Stage): Boolean = s match {
    case _: LineFilter | _: LineFilterIp | _: PatternLineFilter => true
    case JsonStage | LogfmtStage | UnpackStage | _: JsonPathStage |
        _: LogfmtExprStage | _: RegexpStage | _: PatternStage |
        _: LabelFilterStage | _: LabelFormatStage |
        _: LabelFormatTemplateStage | _: KeepStage | _: KeepValuesStage |
        _: DropStage | _: DropValuesStage | _: DistinctStage => true
    case LineFormatStage(_) | DecolorizeStage | _: UnwrapStage => false
  }

  /** Pushdown decision lines for a log pipeline. */
  private def pipelineLines(q: LogQuery): Seq[String] = {
    val out = Seq.newBuilder[String]
    var lineOk = Seq.empty[Stage]
    var lineBlockedBy: Option[Stage] = None
    var scanning = true
    q.stages.foreach { s =>
      if (scanning && isLineFilter(s)) s match {
        case PatternLineFilter(_, _) =>
          out += s"line filter NOT offloaded (pattern op): ${Printer.printStage(s)}"
        case _ => lineOk :+= s
      } else if (scanning && !preservesLine(s)) {
        scanning = false
        lineBlockedBy = Some(s)
      }
      if (!scanning && isLineFilter(s))
        out += s"line filter NOT offloaded (line rewritten by ${Printer
          .printStage(lineBlockedBy.get)}): ${Printer.printStage(s)}"
    }
    if (lineOk.nonEmpty)
      out += s"offloading line filters to the scan: ${lineOk
        .map(Printer.printStage).mkString(" ")}"

    var labelOk = 0
    q.stages.zipWithIndex.foreach {
      case (LabelFilterStage(pred), i) =>
        val labels = predLabels(pred)
        val blocking = labels.flatMap(l =>
          q.stages.take(i).find(affectsLabel(_, l)).map(l -> _))
        if (blocking.isEmpty) {
          labelOk += 1
          out += s"offloading label filter to the scan: | ${Printer.printPred(pred)}"
        } else blocking.foreach { case (l, st) =>
          out += s"label filter NOT offloaded (label $l set by ${Printer
            .printStage(st)}): | ${Printer.printPred(pred)}"
        }
      case _ =>
    }

    val offloadable = lineOk.size + labelOk
    if (q.stages.nonEmpty && offloadable == q.stages.size)
      out += "pipeline fully offloaded to the scan: " +
        Printer.printLog(LogQuery(q.matchers, Nil))
    out.result()
  }

  /** Sampling-offload decision for the metric shape (reference
    * optimizeSampling: only `sum by(...)` over an ungrouped
    * count/bytes/sum-style range aggregation is associative across the
    * per-stream → per-group regrouping).
    */
  private def metricLines(m: MetricExpr): Seq[String] = m match {
    case VectorAgg("sum", by, Nil, _, RangeAgg(op, q, _, _, _, Nil, Nil))
        if by.nonEmpty && Set("count_over_time", "bytes_over_time",
          "rate", "bytes_rate", "sum_over_time")(op) =>
      pipelineLines(q) :+
        s"sampling offloaded: $op grouped by (${by.mkString(", ")}) sums raw samples directly"
    case VectorAgg(op, _, _, _, inner) =>
      collectInner(inner) :+
        (if (op == "sum") "sampling NOT offloaded: grouping not a plain by(...) over an ungrouped range aggregation"
        else s"sampling NOT offloaded: $op is not associative across per-stream regrouping")
    case RangeAgg(_, q, _, _, _, _, _) => pipelineLines(q)
    case BinOp(_, l, r, _, _) => metricLines(l) ++ metricLines(r)
    case LabelFnExpr(_, i, _) => metricLines(i)
    case ScalarLit(_) | VectorLit(_) => Nil
  }

  private def collectInner(m: MetricExpr): Seq[String] = m match {
    case RangeAgg(_, q, _, _, _, _, _) => pipelineLines(q)
    case VectorAgg(_, _, _, _, i)      => collectInner(i)
    case BinOp(_, l, r, _, _) => collectInner(l) ++ collectInner(r)
    case LabelFnExpr(_, i, _) => collectInner(i)
    case ScalarLit(_) | VectorLit(_) => Nil
  }

  /** Decision lines for a parsed query. */
  def lines(e: Expr): Seq[String] = {
    val body = e match {
      case LogExpr(q)       => pipelineLines(q)
      case MetricExprTop(m) => metricLines(m)
    }
    val kind = e match {
      case LogExpr(_)       => "LogQuery"
      case MetricExprTop(_) => "MetricQuery"
    }
    body :+ s"evaluated query: query_type=$kind"
  }

  /** The `@explain` result frame: one {log: explain} stream, one line
    * per decision, timestamps = the decision index (deterministic
    * ordering through the streams envelope).
    */
  def frame(e: Expr, spark: org.apache.spark.sql.SparkSession): DataFrame = {
    import spark.implicits._
    lines(e).zipWithIndex
      .map { case (l, i) => (i.toLong, l, Map("log" -> "explain")) }
      .toDF("ts_ns", "body", "labels")
  }
}
