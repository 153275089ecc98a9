package graft.logql

/** LogQL AST (subset faithful to the reference's grammar:
  * internal/logql/log_expr.go:12-40, pipeline.go:16-313,
  * metric_expr.go:13-253). Scala case classes instead of Go structs;
  * the planner lowers these to DataFrame transformations.
  */
object Ast {

  sealed trait MatchOp
  case object MatchEq extends MatchOp
  case object MatchNeq extends MatchOp
  case object MatchRe extends MatchOp
  case object MatchNotRe extends MatchOp

  final case class Matcher(label: String, op: MatchOp, value: String)

  /** Pipeline stages (reference pipeline.go). */
  sealed trait Stage
  /** |= != |~ !~ with `or` lists (value list is OR-ed). */
  final case class LineFilter(op: MatchOp, needles: Seq[String]) extends Stage
  /** `|= ip("…")` / `!= ip("…")` — any IP literal in the body matches. */
  final case class LineFilterIp(patterns: Seq[String], negate: Boolean) extends Stage
  /** `|> "pat<_>tern"` / `!> "…"` — pattern line filters
    * (reference pipeline.go:35-91 PatternFilter).
    */
  final case class PatternLineFilter(pattern: String, negate: Boolean) extends Stage
  case object JsonStage extends Stage
  /** `| json a="x.b", arr1="arr[1]"` — JSONPath field selection into
    * labels (reference pipeline.go:152-155 + jsonexpr).
    */
  final case class JsonPathStage(paths: Seq[(String, String)]) extends Stage
  /** `| unpack` — promtail pack format: JSON fields → labels, `_entry`
    * → the line (reference pipeline.go:93-99, logqlengine/unpack.go).
    */
  case object UnpackStage extends Stage
  case object LogfmtStage extends Stage
  /** `| logfmt [--strict] [--keep-empty] [dst="src", bare…]` —
    * flagged/param form (reference pipeline.go logfmt flags + exprs).
    */
  final case class LogfmtExprStage(
      params: Seq[(String, String)], strict: Boolean,
      keepEmpty: Boolean) extends Stage
  case object DecolorizeStage extends Stage
  final case class PatternStage(pattern: String) extends Stage
  final case class RegexpStage(pattern: String) extends Stage
  final case class LabelFilterStage(pred: LabelPredicate) extends Stage
  final case class KeepStage(labels: Seq[String]) extends Stage
  /** Value condition on keep/drop items: exact (`lbl="v"`) or regex
    * (`lbl=~"re"`) — reference pipeline.go:296-306 matcher forms.
    */
  final case class ValueMatcher(value: String, regex: Boolean)
  /** `| keep lbl="value", other` — keep a label only where its value
    * matches; bare names always keep (reference pipeline.go keep with
    * matchers).
    */
  final case class KeepValuesStage(items: Seq[(String, Option[ValueMatcher])]) extends Stage
  final case class DropStage(labels: Seq[String]) extends Stage
  /** `| drop lbl="value"` / `| drop lbl=~"re"` — value-conditional
    * drops: the label is removed only where its value matches; None =
    * always (reference pipeline.go drop with matchers).
    */
  final case class DropValuesStage(items: Seq[(String, Option[ValueMatcher])]) extends Stage
  final case class DistinctStage(labels: Seq[String]) extends Stage
  /** label_format renames only (templates are line_format's job). */
  final case class LabelFormatStage(renames: Seq[(String, String)]) extends Stage
  /** label_format dst="template" — template form (template.go:33-110). */
  final case class LabelFormatTemplateStage(label: String, template: String) extends Stage
  /** line_format with {{.label}} substitution templates. */
  final case class LineFormatStage(template: String) extends Stage
  /** | unwrap lbl [bytes|duration|duration_seconds] */
  final case class UnwrapStage(label: String, conv: Option[String]) extends Stage

  /** Label predicate tree (reference pipeline.go:165-275). */
  sealed trait LabelPredicate
  final case class PredAnd(l: LabelPredicate, r: LabelPredicate) extends LabelPredicate
  final case class PredOr(l: LabelPredicate, r: LabelPredicate) extends LabelPredicate
  sealed trait CmpOp
  case object CmpEq extends CmpOp
  case object CmpNeq extends CmpOp
  case object CmpGt extends CmpOp
  case object CmpGe extends CmpOp
  case object CmpLt extends CmpOp
  case object CmpLe extends CmpOp
  sealed trait CmpValue
  final case class NumValue(v: Double) extends CmpValue
  final case class StrValue(v: String) extends CmpValue
  final case class ReValue(v: String, negate: Boolean) extends CmpValue
  final case class DurValue(raw: String) extends CmpValue
  final case class BytesValue(raw: String) extends CmpValue
  final case class IpValue(pattern: String, negate: Boolean) extends CmpValue
  final case class PredCmp(label: String, op: CmpOp, value: CmpValue) extends LabelPredicate

  final case class LogQuery(matchers: Seq[Matcher], stages: Seq[Stage])

  /** Metric expressions (reference metric_expr.go). */
  sealed trait MetricExpr
  /** count_over_time/rate/bytes_over_time/…_over_time(sel[range] offset o),
    * with optional trailing grouping `… by (l)` / `… without (l)`
    * (Loki range-aggregation grouping: samples regroup on the label
    * subset BEFORE aggregating over the window).
    */
  final case class RangeAgg(
      op: String, query: LogQuery, rangeNs: Long, offsetNs: Long,
      param: Option[Double] = None,
      by: Seq[String] = Nil, without: Seq[String] = Nil) extends MetricExpr
  /** sum/avg/min/max/count/topk/bottomk by(..)/without(..) (inner). */
  final case class VectorAgg(
      op: String, by: Seq[String], without: Seq[String],
      k: Option[Int], inner: MetricExpr) extends MetricExpr
  /** on/ignoring + group_left/group_right binop modifiers (reference
    * metric_expr.go:238-253, logqlmetric/bin_op.go:13-254).
    */
  final case class VectorMatch(
      on: Boolean, labels: Seq[String],
      groupSide: Option[String], include: Seq[String])
  final case class BinOp(op: String, lhs: MetricExpr, rhs: MetricExpr,
      matching: Option[VectorMatch] = None,
      boolMod: Boolean = false) extends MetricExpr
  /** label_replace / label_join over a metric expr (Loki supports the
    * Prometheus label functions; logqlengine label fns).
    */
  final case class LabelFnExpr(fn: String, inner: MetricExpr,
      strs: Seq[String]) extends MetricExpr
  final case class ScalarLit(v: Double) extends MetricExpr
  /** `vector(x)`: a constant one-series vector with empty labels at
    * every step of the query grid (reference metric_expr.go:126-144).
    */
  final case class VectorLit(v: Double) extends MetricExpr

  sealed trait Expr
  final case class LogExpr(q: LogQuery) extends Expr
  final case class MetricExprTop(m: MetricExpr) extends Expr
}
