package graft.traceql

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.Kernels

/** TraceQL front-end: AST + hand-rolled parser + DataFrame planner
  * (reference grammar internal/traceql/{expr,field_expr,pipeline}.go;
  * engine semantics traceqlengine/engine.go:96-227).
  *
  * Spans DataFrame contract: `trace_id: Long, span_id: Int,
  * parent_span_id: Int?, name: String, kind: Int, status_code: Int,
  * duration_ns: Long, start_ns: Long, attrs: Map[String,String]`.
  *
  * Execution mirrors the reference's two-phase shape re-expressed in
  * Spark: the span-filter superset prunes candidate traces (a semi-join
  * at scale), structural ops are co-partitioned self-joins on trace_id,
  * spanset aggregates are groupBys with HAVING.
  */
object TraceQL {

  // ---------- AST ----------
  sealed trait FieldRef
  final case class Intrinsic(name: String) extends FieldRef // duration,name,status,kind
  final case class Attr(scope: String, name: String) extends FieldRef
  /** Tempo scoped-intrinsic syntax: span:id, span:parentID, trace:id,
    * event:name, link:traceID/spanID, instrumentation:name/version
    * (reference traceqlengine/evaluater.go:371-620).
    */
  final case class ScopedRef(scope: String, name: String) extends FieldRef

  sealed trait Static
  final case class SStr(v: String) extends Static
  final case class SNum(v: Double) extends Static
  final case class SDurNs(v: Long) extends Static

  sealed trait FieldExpr
  final case class FCmp(ref: FieldRef, op: String, v: Static) extends FieldExpr
  final case class FRe(ref: FieldRef, re: String, negate: Boolean) extends FieldExpr
  final case class FAnd(l: FieldExpr, r: FieldExpr) extends FieldExpr
  final case class FOr(l: FieldExpr, r: FieldExpr) extends FieldExpr
  final case class FNot(e: FieldExpr) extends FieldExpr

  sealed trait SpansetExpr
  final case class SFilter(cond: FieldExpr) extends SpansetExpr
  /** op ∈ > >> ~ < !> (parent/child/descendant/sibling/negated-child). */
  final case class SStructural(op: String, lhs: SpansetExpr, rhs: SpansetExpr) extends SpansetExpr

  /** {…} | agg(field?) cmp value  (count/max/min/avg/sum). */
  final case class ScalarFilter(agg: String, field: Option[FieldRef], op: String, v: Double)
  /** Full query: spanset, then optional pipeline stages — by(field)
    * partitioning, coalesce() (flatten, a no-op on our span-set shape),
    * select(fields) extra projections, and the scalar HAVING
    * (reference internal/traceql/pipeline.go:44-55).
    */
  final case class Query(
      spanset: SpansetExpr, scalar: Option[ScalarFilter],
      by: Option[FieldRef] = None, selects: Seq[FieldRef] = Nil)

  // ---------- parser ----------
  final case class ParseError(msg: String, pos: Int)
      extends RuntimeException(s"$msg at $pos")

  final class P(input: String) {
    var i = 0
    def ws(): Unit = while (i < input.length && input.charAt(i).isWhitespace) i += 1
    def peekCh: Char = if (i < input.length) input.charAt(i) else '\u0000'
    def accept(s: String): Boolean = {
      ws()
      if (input.startsWith(s, i)) { i += s.length; true } else false
    }
    def expect(s: String): Unit =
      if (!accept(s)) throw ParseError(s"expected '$s'", i)
    def ident(): String = {
      ws()
      val start = i
      while (i < input.length && (input.charAt(i).isLetterOrDigit || input.charAt(i) == '_')) i += 1
      if (i == start) throw ParseError("expected identifier", i)
      input.substring(start, i)
    }
    def str(): String = {
      ws()
      expect("\"")
      val sb = new StringBuilder
      while (i < input.length && input.charAt(i) != '"') {
        sb.append(input.charAt(i)); i += 1
      }
      expect("\"")
      sb.toString
    }
    def numberOrDuration(): Static = {
      ws()
      val start = i
      while (i < input.length && (input.charAt(i).isDigit || input.charAt(i) == '.')) i += 1
      if (i == start) throw ParseError("expected number", i)
      val num = input.substring(start, i)
      val us = i
      while (i < input.length && input.charAt(i).isLetter) i += 1
      if (i > us) {
        val raw = input.substring(start, i)
        Kernels.parseDurationSeconds(raw) match {
          case Some(sec) => SDurNs((sec * 1e9).toLong)
          case None      => throw ParseError(s"bad duration '$raw'", start)
        }
      } else SNum(num.toDouble)
    }
    def done: Boolean = { ws(); i >= input.length }
  }

  /** Longest-first so `!>>` wins over `!>` over `>` (and `&>>` over
    * `&>`; `&&` is distinct from every union form).
    */
  private val structuralOps =
    Seq("!>>", "!<<", "&>>", "&<<", ">>", "<<", "!>", "!<", "!~",
      "&>", "&<", "&~", ">", "~", "<", "&&", "||")

  def parse(q: String): Query = {
    val p = new P(q)
    val ss = parseSpanset(p)
    var scalar: Option[ScalarFilter] = None
    var by: Option[FieldRef] = None
    var selects = Seq.empty[FieldRef]
    while (p.accept("|")) {
      val save = p.i
      p.ident() match {
        case "by" =>
          p.expect("("); by = Some(parseRef(p)); p.expect(")")
        case "coalesce" =>
          p.expect("("); p.expect(")") // flatten: no-op on our shape
        case "select" =>
          p.expect("(")
          val rs = Seq.newBuilder[FieldRef]
          rs += parseRef(p)
          while (p.accept(",")) rs += parseRef(p)
          p.expect(")")
          selects = selects ++ rs.result()
        case _ =>
          p.i = save // an aggregate: re-parse as the scalar filter
          scalar = Some(parseScalarFilter(p))
      }
    }
    if (!p.done) throw ParseError("trailing input", p.i)
    Query(ss, scalar, by, selects)
  }

  private def parseSpanset(p: P): SpansetExpr = {
    var lhs: SpansetExpr = parseFilterBlock(p)
    var more = true
    while (more) {
      structuralOps.find(op => p.accept(op)) match {
        case Some(op) => lhs = SStructural(op, lhs, parseFilterBlock(p))
        case None     => more = false
      }
    }
    lhs
  }

  private def parseFilterBlock(p: P): SpansetExpr = {
    p.expect("{")
    if (p.accept("}")) return SFilter(FCmp(Intrinsic("duration"), ">=", SDurNs(0)))
    val cond = parseOr(p)
    p.expect("}")
    SFilter(cond)
  }

  private def parseOr(p: P): FieldExpr = {
    var acc = parseAnd(p)
    while (p.accept("||")) acc = FOr(acc, parseAnd(p))
    acc
  }

  private def parseAnd(p: P): FieldExpr = {
    var acc = parseUnary(p)
    while (p.accept("&&")) acc = FAnd(acc, parseUnary(p))
    acc
  }

  private def parseUnary(p: P): FieldExpr = {
    if (p.accept("!")) FNot(parseUnary(p))
    else if (p.accept("(")) {
      val e = parseOr(p); p.expect(")"); e
    } else parseCmp(p)
  }

  private def parseCmp(p: P): FieldExpr = {
    val ref = parseRef(p)
    val op =
      if (p.accept("=~")) return FRe(ref, p.str(), negate = false)
      else if (p.accept("!~")) return FRe(ref, p.str(), negate = true)
      else if (p.accept(">=")) ">="
      else if (p.accept("<=")) "<="
      else if (p.accept("!=")) "!="
      else if (p.accept("=")) "="
      else if (p.accept(">")) ">"
      else if (p.accept("<")) "<"
      else throw ParseError("expected comparison", p.i)
    p.ws()
    val v: Static =
      if (p.peekCh == '"') SStr(p.str())
      else if (p.peekCh.isLetter) symbolic(p.ident(), p.i)
      else p.numberOrDuration()
    FCmp(ref, op, v)
  }

  /** `status = error` / `kind = server` symbolic literals → the OTel
    * codes (reference traceql static values; evaluater.go status/kind).
    */
  private def symbolic(word: String, pos: Int): Static = word match {
    case "unset" => SNum(0); case "ok" => SNum(1); case "error" => SNum(2)
    case "unspecified" => SNum(0); case "internal" => SNum(1)
    case "server" => SNum(2); case "client" => SNum(3)
    case "producer" => SNum(4); case "consumer" => SNum(5)
    case other => throw ParseError(s"unknown symbolic value '$other'", pos)
  }

  private def parseRef(p: P): FieldRef = {
    p.ws()
    if (p.peekCh == '.') { // leading-dot unscoped attr: `.http.method`
      p.i += 1
      val parts = Seq.newBuilder[String]
      parts += p.ident()
      while (p.accept(".")) parts += p.ident()
      return Attr("", parts.result().mkString("."))
    }
    val first = p.ident()
    if (p.accept(":")) ScopedRef(first, p.ident())
    else if (p.accept(".")) {
      // dotted attr path: resource.service.name → scope + full name
      val parts = Seq.newBuilder[String]
      parts += p.ident()
      while (p.accept(".")) parts += p.ident()
      Attr(first, parts.result().mkString("."))
    } else first match {
      case "duration" | "name" | "status" | "kind" | "rootName" |
           "traceDuration" | "statusMessage" | "rootServiceName" =>
        Intrinsic(first)
      case other => Attr("", other) // bare attr: unscoped lookup
    }
  }

  private def parseScalarFilter(p: P): ScalarFilter = {
    val agg = p.ident()
    p.expect("(")
    val field = if (p.accept(")")) None
    else { val r = parseRef(p); p.expect(")"); Some(r) }
    val op =
      if (p.accept(">=")) ">=" else if (p.accept("<=")) "<="
      else if (p.accept("!=")) "!=" else if (p.accept("=")) "="
      else if (p.accept(">")) ">" else if (p.accept("<")) "<"
      else throw ParseError("expected comparison", p.i)
    val v = p.numberOrDuration() match {
      case SNum(x)   => x
      case SDurNs(x) => x.toDouble
      case _         => throw ParseError("expected scalar", p.i)
    }
    ScalarFilter(agg, field, op, v)
  }

  // ---------- planner ----------
  private def refCol(r: FieldRef): Column = r match {
    case Intrinsic("duration")        => col("duration_ns")
    case Intrinsic("name")            => col("name")
    case Intrinsic("status")          => col("status_code")
    case Intrinsic("kind")            => col("kind")
    case Intrinsic("rootName")        => col("__root_name")
    case Intrinsic("traceDuration")   => col("__trace_duration_ns")
    case Intrinsic("statusMessage")   => col("status_message")
    case Intrinsic("rootServiceName") => col("__root_service")
    case Intrinsic(other)             => col(other)
    case ScopedRef("span", "id")         => col("span_id")
    case ScopedRef("span", "parentID")   => col("parent_span_id")
    case ScopedRef("span", "duration")   => col("duration_ns")
    case ScopedRef("span", "name")       => col("name")
    case ScopedRef("span", "kind")       => col("kind")
    case ScopedRef("span", "status")     => col("status_code")
    case ScopedRef("span", "statusMessage") => col("status_message")
    case ScopedRef("trace", "id")        => col("trace_id")
    case ScopedRef("trace", "duration")  => col("__trace_duration_ns")
    case ScopedRef("trace", "rootName")  => col("__root_name")
    case ScopedRef("trace", "rootService") => col("__root_service")
    case ScopedRef("instrumentation", "name")    => col("scope_name")
    case ScopedRef("instrumentation", "version") => col("scope_version")
    case ScopedRef("parent", "id")       => col("__parent_sid")
    case ScopedRef("parent", "name")     => col("__parent_name")
    case ScopedRef("parent", "duration") => col("__parent_duration_ns")
    case ScopedRef("parent", "status")   => col("__parent_status")
    case ScopedRef(s, n) =>
      throw new IllegalArgumentException(s"unsupported scoped ref $s:$n")
    case Attr("parent", n)          => element_at(col("__parent_attrs"), n)
    // resource./span. attribute maps are DISTINCT and their scoped
    // lookups STRICT; only the unscoped form coalesces span→resource
    // (reference chstorage/attributes.go:251-266). Frames without a
    // resource_attrs column get an empty one via withResourceAttrs.
    case Attr("span", n)            => element_at(col("attrs"), n)
    case Attr("resource", n)        => element_at(col("resource_attrs"), n)
    case Attr(_, n)                 =>
      coalesce(element_at(col("attrs"), n), element_at(col("resource_attrs"), n))
  }

  /** Normalizes the span frame to always carry a `resource_attrs` map so
    * attribute resolution (span→resource coalesce) is uniform; span
    * frames modeled with a single merged map just get an empty overlay.
    */
  private[graft] def withResourceAttrs(spans: DataFrame): DataFrame =
    if (spans.columns.contains("resource_attrs")) spans
    else spans.withColumn("resource_attrs",
      map().cast("map<string,string>"))

  private def usesParentScope(e: FieldExpr): Boolean = e match {
    case FAnd(l, r) => usesParentScope(l) || usesParentScope(r)
    case FOr(l, r)  => usesParentScope(l) || usesParentScope(r)
    case FNot(x)    => usesParentScope(x)
    case FCmp(Attr("parent", _) | ScopedRef("parent", _), _, _) => true
    case FRe(Attr("parent", _) | ScopedRef("parent", _), _, _)  => true
    case _ => false
  }

  /** parent-scope refs join each span to its parent row — keyed on
    * trace_id so the join co-partitions (evaluater.go parent scope).
    */
  private def withParentColumns(spans: DataFrame): DataFrame = {
    val parents = spans.select(
      col("trace_id").as("__p_tid"), col("span_id").as("__parent_sid"),
      col("name").as("__parent_name"),
      col("duration_ns").as("__parent_duration_ns"),
      col("status_code").as("__parent_status"),
      col("attrs").as("__parent_attrs"))
    spans.join(parents,
      spans("trace_id") === parents("__p_tid") &&
        spans("parent_span_id") === parents("__parent_sid"), "left")
      .drop("__p_tid")
  }

  /** event: and link: predicates quantify over the span's event/link
    * arrays — ANY element matching satisfies the span
    * (evaluater.go event/link scopes).
    */
  /** Column + element accessor for the event:/link: array scopes —
    * shared by the quantified predicates and select() projections.
    */
  private def arrayField(scope: String,
      field: String): (String, Column => Column) = scope match {
    case "event" => field match {
      case "name" => ("events", (e: Column) => e.getField("name"))
      case other =>
        throw new IllegalArgumentException(s"unsupported event field '$other'")
    }
    case "link" => field match {
      case "traceID" => ("links", (e: Column) => e.getField("trace_id"))
      case "spanID"  => ("links", (e: Column) => e.getField("span_id"))
      case other =>
        throw new IllegalArgumentException(s"unsupported link field '$other'")
    }
    case other => throw new IllegalArgumentException(s"no array scope '$other'")
  }

  private def existsRef(scope: String, field: String,
      test: Column => Column): Column = {
    val (arr, f) = arrayField(scope, field)
    exists(col(arr), e => test(f(e)))
  }

  /** Trace-level intrinsics computed once per trace with a window over
    * trace_id (reference evaluater.go:371-620 rootName/traceDuration —
    * per-trace state there, a co-partitioned window here).
    */
  private def withTraceIntrinsics(spans: DataFrame): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("trace_id"))
    spans
      .withColumn("__root_name",
        min(when(col("parent_span_id").isNull, col("name"))).over(w))
      // service.name is a RESOURCE attribute in OTel; span frames
      // modeled with one merged map fall back to span attrs
      .withColumn("__root_service",
        min(when(col("parent_span_id").isNull,
          coalesce(element_at(col("resource_attrs"), "service.name"),
            element_at(col("attrs"), "service.name")))).over(w))
      .withColumn("__trace_duration_ns",
        max(col("start_ns") + col("duration_ns")).over(w) - min(col("start_ns")).over(w))
  }

  private def traceLevelRef(r: FieldRef): Boolean = r match {
    case Intrinsic("rootName" | "traceDuration" | "rootServiceName") => true
    case ScopedRef("trace", _) => true
    case _ => false
  }

  private def usesTraceIntrinsics(e: FieldExpr): Boolean = e match {
    case FAnd(l, r) => usesTraceIntrinsics(l) || usesTraceIntrinsics(r)
    case FOr(l, r)  => usesTraceIntrinsics(l) || usesTraceIntrinsics(r)
    case FNot(x)    => usesTraceIntrinsics(x)
    case FCmp(r, _, _) => traceLevelRef(r)
    case FRe(r, _, _)  => traceLevelRef(r)
  }

  private def cmpCol(l: Column, op: String, v: Static): Column = {
    val r: Column = v match {
      case SStr(s)   => lit(s)
      case SNum(n)   => lit(n)
      case SDurNs(n) => lit(n)
    }
    val lc = v match {
      case SNum(_) => l.cast("double")
      case _       => l
    }
    op match {
      case "="  => lc === r
      case "!=" => lc =!= r
      case ">"  => lc > r
      case ">=" => lc >= r
      case "<"  => lc < r
      case "<=" => lc <= r
    }
  }

  def condCol(e: FieldExpr): Column = e match {
    case FAnd(l, r) => condCol(l) && condCol(r)
    case FOr(l, r)  => condCol(l) || condCol(r)
    case FNot(x)    => !condCol(x)
    case FRe(ScopedRef(s @ ("event" | "link"), f), re, neg) =>
      val c = existsRef(s, f, x => x.rlike(s"^(?:${Kernels.re2ToJava(re)})$$"))
      if (neg) !c else c
    case FRe(ref, re, neg) =>
      val c = refCol(ref).rlike(s"^(?:${Kernels.re2ToJava(re)})$$")
      if (neg) !c else c
    case FCmp(ScopedRef(s @ ("event" | "link"), f), op, v) =>
      existsRef(s, f, x => cmpCol(x, op, v))
    case FCmp(ref, op, v) => cmpCol(refCol(ref), op, v)
  }

  /** (trace_id, span_id, parent_path) — the root-ward ancestor chain of
    * every non-root span, derived from parent_span_id by a per-trace
    * pointer walk (reference walks the same in-memory parent map,
    * spanset_op.go:156-193). ONE shuffle (groupByKey on trace_id), then
    * linear in-memory work per trace — traces are small even at 100 TB,
    * so this is the shape that scales: no driver-side probes, no
    * depth-many self-joins, nothing persisted. A cycle guard mirrors the
    * reference's `seen` set for malformed parent links.
    *
    * This is also the ingest-time computation: [[graft.sources.Layout]]
    * writes the result as a `parent_path` column so queries explode a
    * stored array instead of re-deriving the walk.
    */
  private[graft] def parentPaths(spans: DataFrame): DataFrame = {
    val ss = spans.sparkSession
    import ss.implicits._
    // 64-bit ids throughout; a non-numeric id (e.g. hex-string OTel ids
    // not yet normalized to int64) fails LOUDLY instead of null-casting
    // into a broken walk or int-truncating into ancestry collisions.
    def asLong(c: String) =
      when(col(c).isNotNull && col(c).cast("long").isNull,
        raise_error(concat(
          lit(s"graft.parentPaths: non-numeric $c: "), col(c).cast("string"))))
        .otherwise(col(c).cast("long")).as(c)
    spans
      .select(asLong("trace_id"), asLong("span_id"), asLong("parent_span_id"))
      .as[(Long, Long, Option[Long])]
      .groupByKey(_._1)
      .flatMapGroups { (tid, it) =>
        val parent = scala.collection.mutable.HashMap.empty[Long, Long]
        val ids = scala.collection.mutable.ArrayBuffer.empty[Long]
        val seenSpan = scala.collection.mutable.HashSet.empty[Long]
        it.foreach { case (_, sid, p) =>
          if (seenSpan.add(sid)) { // physical span rows may repeat
            ids += sid
            p.foreach(parent.update(sid, _))
          }
        }
        ids.iterator.map { sid =>
          val path = scala.collection.mutable.ArrayBuffer.empty[Long]
          val seen = scala.collection.mutable.HashSet.empty[Long]
          var cur = parent.get(sid)
          while (cur.isDefined && seen.add(cur.get)) {
            path += cur.get
            cur = parent.get(cur.get)
          }
          (tid, sid, path.toSeq)
        }
      }
      .toDF("trace_id", "span_id", "parent_path")
  }

  /** (trace_id, span_id, anc) ancestor-closure pairs. When the spans
    * table carries an ingest-materialized `parent_path` column
    * ([[graft.sources.Layout.withParentPath]]) this is a pure column
    * explode — no extra shuffle; otherwise the chain is derived ad hoc
    * by [[parentPaths]] (one shuffle).
    */
  private[graft] def ancestorPairs(spans: DataFrame,
      dedup: Boolean = true): DataFrame =
    if (spans.columns.contains("parent_path")) {
      // `dedup = false` skips the (trace_id, span_id) dropDuplicates
      // shuffle — safe whenever the pairs feed a semi/anti join, which
      // dedups inherently; pair-COUNTING callers keep the default.
      val base = spans.select(col("trace_id"), col("span_id"), col("parent_path"))
      val uniq = if (dedup) base.dropDuplicates("trace_id", "span_id") else base
      uniq.select(col("trace_id"), col("span_id"),
        explode(col("parent_path")).as("anc"))
    } else
      parentPaths(spans)
        .select(col("trace_id"), col("span_id"),
          explode(col("parent_path")).as("anc"))

  /** Spanset evaluation → matching spans. Structural results follow the
    * reference's convention (spanset_op.go:156-230 childSpans/
    * descendantSpans/siblingSpans all return RIGHT-side spans): `{a} op
    * {b}` yields the b-matches standing in the relation to an a-match —
    * `{a} >> {b}` is "b-spans that descend from an a-span". Negated
    * forms return the b-matches NOT in the relation (anti-join). One
    * intentional divergence, Tempo-faithful: ancestry walks the FULL
    * parent chain of the trace, where the reference resolves parent
    * links only through spans visible on either side (descendantSpans
    * parentOf map) and so misses chains through unmatched intermediates.
    */
  def evalSpanset(e: SpansetExpr, spans: DataFrame): DataFrame = e match {
    case SFilter(cond) =>
      val in0 = withResourceAttrs(spans) // before trace intrinsics: __root_service reads it
      val in1 = if (usesTraceIntrinsics(cond)) withTraceIntrinsics(in0) else in0
      val in = if (usesParentScope(cond)) withParentColumns(in1) else in1
      in.filter(condCol(cond))
        .select(spans.columns.toIndexedSeq.map(col): _*) // shed helper columns
    case SStructural(op, lhs, rhs) =>
      // Each operand is planned exactly ONCE per structural node; `&&`
      // avoids re-reading either subtree by tagging sides in one union.
      lazy val l = evalSpanset(lhs, spans)
      lazy val r = evalSpanset(rhs, spans).alias("r")
      def sameTrace = col("r.trace_id") === col("l.trace_id")
      op match {
        case ">" | "!>" => // r is (not) a child of a matching l
          r.join(l.select(col("trace_id"), col("span_id")).alias("l"),
            sameTrace && col("r.parent_span_id") === col("l.span_id"),
            if (op == ">") "left_semi" else "left_anti")
        case "<" | "!<" => // r is (not) the parent of a matching l
          r.join(l.select(col("trace_id"), col("parent_span_id")).alias("l"),
            sameTrace && col("r.span_id") === col("l.parent_span_id"),
            if (op == "<") "left_semi" else "left_anti")
        case ">>" | "!>>" => // r does (not) descend from a matching l:
          // the real parent-chain closure restricted to l's matches
          // (reference spanset_op.go:158-193 descendantSpans). With a
          // stored parent_path the membership test is IN-ROW: r
          // descends from an l-match ⟺ r.parent_path intersects the
          // trace's l-id set — one match-sized groupBy + one trace-keyed
          // join, no corpus-wide ancestor explode at all.
          if (r.columns.contains("parent_path")) {
            val lSet = l.groupBy(col("trace_id"))
              .agg(collect_set(col("span_id")).as("__lids"))
            val overlap = coalesce(
              arrays_overlap(col("r.parent_path"), col("__lids")), lit(false))
            if (op == ">>")
              r.join(lSet, col("r.trace_id") === lSet("trace_id"))
                .filter(overlap)
                .select(spans.columns.toIndexedSeq.map(c => col(s"r.$c")): _*)
            else
              r.join(lSet, col("r.trace_id") === lSet("trace_id"), "left")
                .filter(!overlap)
                .select(spans.columns.toIndexedSeq.map(c => col(s"r.$c")): _*)
          } else {
            val lIds = l.select(col("trace_id"), col("span_id").as("anc"))
            val descOfL = ancestorPairs(spans, dedup = false)
              .join(lIds, Seq("trace_id", "anc"), "left_semi")
              .select(col("trace_id"), col("span_id")).alias("d")
            r.join(descOfL,
              col("r.trace_id") === col("d.trace_id") &&
                col("r.span_id") === col("d.span_id"),
              if (op == ">>") "left_semi" else "left_anti")
          }
        case "<<" | "!<<" => // r is (not) an ancestor of a matching l
          // the ancestors OF the l-matches are the l rows' OWN stored
          // parent_path — exploding the filtered l side directly skips
          // the corpus-wide ancestor explode + semi-join the general
          // ancestorPairs path would pay (the filter on l reaches the
          // scan, so this explode is match-sized, not table-sized)
          val ancOfL =
            if (l.columns.contains("parent_path"))
              l.select(col("trace_id"), explode(col("parent_path")).as("anc"))
                .alias("d")
            else {
              val lIds = l.select(col("trace_id"), col("span_id"))
              ancestorPairs(spans, dedup = false)
                .join(lIds, Seq("trace_id", "span_id"), "left_semi")
                .select(col("trace_id"), col("anc")).alias("d")
            }
          r.join(ancOfL,
            col("r.trace_id") === col("d.trace_id") &&
              col("r.span_id") === col("d.anc"),
            if (op == "<<") "left_semi" else "left_anti")
        case "~" | "!~" => // r shares (does not share) a parent with a
          // DIFFERENT matching l span (a span is not its own sibling)
          val sib = l.select(col("trace_id"), col("span_id"), col("parent_span_id")).alias("l")
          r.join(sib,
            sameTrace && col("r.parent_span_id") === col("l.parent_span_id") &&
              col("r.span_id") =!= col("l.span_id"),
            if (op == "~") "left_semi" else "left_anti")
        case "&>" | "&<" =>
          // UNION child/parent (Tempo's union operators; the reference
          // parses and rejects them, spanset_op.go:89-102): BOTH
          // participants of the relation survive. ONE inner pair-join
          // instead of two semi-joins re-reading both operands — every
          // (parent, child) relation row carries BOTH survivors, so the
          // two ends project out of the same join. Linear by
          // construction: a child has exactly ONE parent, so pairs are
          // bounded by the child side, never a fan-out product.
          val (parentSide, childSide) =
            if (op == "&>") (l, evalSpanset(rhs, spans)) else (evalSpanset(rhs, spans), l)
          val pairs = childSide.alias("c").join(parentSide.alias("p"),
            col("c.trace_id") === col("p.trace_id") &&
              col("c.parent_span_id") === col("p.span_id"))
          pairs.select(spans.columns.toIndexedSeq.map(c => col(s"c.$c")): _*)
            .unionAll(pairs.select(
              spans.columns.toIndexedSeq.map(c => col(s"p.$c")): _*))
            .dropDuplicates("trace_id", "span_id")
        case "&~" =>
          // UNION sibling: both sides of the relation survive, each
          // side a SEMI-join (the plain `~` shape) — semi short-circuits
          // without materializing sibling pairs, and a measured window
          // variant (two sorts over the tagged union) ran 2× slower at
          // sf0.1, so this stays the two-probe plan.
          // rl derives from the ONE rhs plan (the planned-exactly-once
          // invariant above) — a fresh evalSpanset would construct and
          // run a structural rhs subtree twice
          val rl = r.select(spans.columns.toIndexedSeq.map(c =>
            col(s"r.$c").as(c)): _*)
          val sibL = l.select(col("trace_id"), col("span_id"),
            col("parent_span_id")).alias("l")
          val sibR = rl.select(col("trace_id"), col("span_id"),
            col("parent_span_id")).alias("rb")
          val rSide = r.join(sibL,
            col("r.trace_id") === col("l.trace_id") &&
              col("r.parent_span_id") === col("l.parent_span_id") &&
              col("r.span_id") =!= col("l.span_id"), "left_semi")
          val lSide = l.alias("la").join(sibR,
            col("la.trace_id") === col("rb.trace_id") &&
              col("la.parent_span_id") === col("rb.parent_span_id") &&
              col("la.span_id") =!= col("rb.span_id"), "left_semi")
          rSide.select(spans.columns.toIndexedSeq.map(col): _*)
            .unionAll(lSide.select(spans.columns.toIndexedSeq.map(col): _*))
            .dropDuplicates("trace_id", "span_id")
        case "&>>" | "&<<" =>
          // UNION descendant/ancestor. With a stored parent_path both
          // directions read MATCH-SIZED inputs (the r12 `>>`/`<<`
          // shapes): the descendant side tests in-row overlap against
          // the other side's per-trace id set, the ancestor side
          // explodes the FILTERED side's own path — the corpus-wide
          // ancestorPairs explode is gone from both.
          val rl = evalSpanset(rhs, spans)
          def unionDedup(a: DataFrame, b: DataFrame): DataFrame =
            a.unionAll(b).dropDuplicates("trace_id", "span_id")
          if (spans.columns.contains("parent_path")) {
            // (descOf, ancestorsOf): spans of `of` that descend from
            // `anchor` matches, and `anchor` spans that are ancestors
            // of an `of` match — both ends of one relation
            def ends(anchor: DataFrame, of: DataFrame)
                : (DataFrame, DataFrame) = {
              val aSet = anchor.groupBy(col("trace_id"))
                .agg(collect_set(col("span_id")).as("__aids"))
              val desc = of.alias("o").join(aSet,
                  col("o.trace_id") === aSet("trace_id"))
                .filter(coalesce(
                  arrays_overlap(col("o.parent_path"), col("__aids")),
                  lit(false)))
                .select(spans.columns.toIndexedSeq.map(c => col(s"o.$c")): _*)
              val ancIds = of
                .select(col("trace_id"), explode(col("parent_path")).as("anc"))
              val anc = anchor.alias("a").join(ancIds.alias("i"),
                  col("a.trace_id") === col("i.trace_id") &&
                    col("a.span_id") === col("i.anc"), "left_semi")
                .select(spans.columns.toIndexedSeq.map(c => col(s"a.$c")): _*)
              (desc, anc)
            }
            if (op == "&>>") {
              // descendants of l ∪ ancestors-of-r among l
              val (desc, anc) = ends(anchor = l, of = rl)
              unionDedup(desc, anc)
            } else {
              // ancestors of l ∪ descendants-of-r among l
              val (desc, anc) = ends(anchor = rl, of = l)
              unionDedup(anc, desc)
            }
          } else {
            // no stored ancestry: the general closure, derived once
            val closure = ancestorPairs(spans, dedup = false)
            def semiOn(left: DataFrame, right: DataFrame,
                keys: Seq[String]): DataFrame =
              left.join(right, keys, "left_semi")
            val (anchor, of) = if (op == "&>>") (l, rl) else (rl, l)
            val aIds = anchor.select(col("trace_id"), col("span_id").as("anc"))
            val descIds = closure.join(aIds, Seq("trace_id", "anc"), "left_semi")
              .select(col("trace_id"), col("span_id"))
            val desc = semiOn(of, descIds, Seq("trace_id", "span_id"))
            val ofIds = of.select(col("trace_id"), col("span_id"))
            val ancIds = closure.join(ofIds, Seq("trace_id", "span_id"), "left_semi")
              .select(col("trace_id"), col("anc").as("span_id"))
            val anc = semiOn(anchor, ancIds, Seq("trace_id", "span_id"))
            unionDedup(desc, anc)
          }
        case "&&" => // traces where BOTH sides matched keep the merged
          // spans of both sides, deduped by span identity (reference
          // spanset_op.go:41-47 mergeSpans). Single evaluation of each
          // operand: tag the side in a union, then keep traces that saw
          // both tags — one shuffle on trace_id, no semi-join re-scans.
          val w = org.apache.spark.sql.expressions.Window.partitionBy("trace_id")
          val rm = evalSpanset(rhs, spans)
          l.withColumn("_side", lit(0)).unionAll(rm.withColumn("_side", lit(1)))
            .withColumn("_nsides", size(collect_set(col("_side")).over(w)))
            .filter(col("_nsides") === 2)
            .dropDuplicates("trace_id", "span_id")
            .drop("_side", "_nsides")
        case "||" => // spanset union, deduped by span identity (set ops
          // on map columns are unsupported, so dedup on the span key)
          val rm = evalSpanset(rhs, spans)
          l.unionAll(rm).dropDuplicates("trace_id", "span_id")
      }
  }

  /** Full query → per-trace rollup (trace_id, n_spans, agg value) with
    * the scalar HAVING applied (reference aggregator.go + scalar_filter).
    */
  private def refName(r: FieldRef): String = r match {
    case Intrinsic(n)    => n
    case Attr(_, n)      => n
    case ScopedRef(_, n) => n
  }

  /** The label key a `by(field)` series carries on the metrics HTTP
    * surface — the ref as the user spelled it (`span.foo`, `.foo`,
    * `duration`, `span:id`).
    */
  private def refLabel(r: FieldRef): String = r match {
    case Intrinsic(n)            => n
    case Attr(s, n) if s.isEmpty => s".$n"
    case Attr(s, n)              => s"$s.$n"
    case ScopedRef(s, n)         => s"$s:$n"
  }

  /** Step bucket anchored at `originNs` (0 = absolute alignment, the
    * query-pack convention; the instant HTTP path anchors at the
    * window start so the whole window is ONE bucket).
    */
  private def bucket(originNs: Long, stepNs: Long): Column =
    col("start_ns") - ((col("start_ns") - lit(originNs)) % lit(stepNs))

  /** TraceQL METRICS query (`{cond} | rate() | by(field)` /
    * `| count_over_time() | by(field)` — Tempo's metrics endpoint,
    * left NotImplemented in the reference): matched spans bucket on
    * start_ns over `stepNs` and aggregate per optional by-field.
    * Output (bucket_ns, [by_value,] value).
    */
  def planMetrics(q: String, spans0: DataFrame, stepNs: Long,
      cube: Option[AttrCube] = None): DataFrame =
    metricsRange(q, spans0, stepNs, cube = cube)._1

  /** [[planMetrics]] plus the series label key for the `by`/histogram
    * dimension — what the HTTP envelope needs to label each series.
    */
  def metricsRange(q: String, spans0: DataFrame, stepNs: Long,
      originNs: Long = 0L,
      cube: Option[AttrCube] = None): (DataFrame, Option[String]) = {
    val spans = withResourceAttrs(spans0)
    val p = new P(q)
    val ss = parseSpanset(p)
    p.expect("|")
    val fn = p.ident()
    if (fn == "compare")
      return (planCompare(p, ss, spans, stepNs, originNs, cube), None)
    p.expect("(")
    // field-arg family: min/max/avg/sum/quantile/histogram_over_time(f)
    // (reference parses the same set, traceql/metrics_expr.go:23-145;
    // its engine is NotImplemented — semantics follow Tempo's docs)
    val fieldFns = Set("min_over_time", "max_over_time", "avg_over_time",
      "sum_over_time", "quantile_over_time", "histogram_over_time")
    val field: Option[FieldRef] =
      if (fieldFns(fn)) Some(parseRef(p)) else None
    val quantile: Option[Double] =
      if (fn == "quantile_over_time") {
        p.expect(",")
        p.numberOrDuration() match {
          case SNum(x) => Some(x)
          case _       => throw ParseError("expected quantile", p.i)
        }
      } else None
    if (!fieldFns(fn) && fn != "rate" && fn != "count_over_time")
      throw ParseError(s"unknown metrics fn '$fn'", p.i)
    p.expect(")")
    var by: Option[FieldRef] = None
    // second stage: topk(n)/bottomk(n) keep the n highest/lowest-valued
    // series PER STEP (reference second-stage ops, traceql/op.go:350-416)
    var topK: Option[(Int, Boolean)] = None
    while (p.accept("|")) {
      p.ident() match {
        case "by" =>
          p.expect("("); by = Some(parseRef(p)); p.expect(")")
        case k @ ("topk" | "bottomk") =>
          p.expect("(")
          val n = p.numberOrDuration() match {
            case SNum(x) => x.toInt
            case _       => throw ParseError("expected k", p.i)
          }
          p.expect(")")
          topK = Some((n, k == "topk"))
        case other => throw ParseError(s"unexpected metrics stage '$other'", p.i)
      }
    }
    if (!p.done) throw ParseError("trailing input", p.i)

    val matched0 = evalSpanset(ss, spans)
      .withColumn("bucket_ns", bucket(originNs, stepNs))
    val fv = field.map(r => refCol(r).cast("double"))
    // histogram_over_time raises each value into its next power-of-2
    // bucket and counts per (step, le) — the extra `le` dimension rides
    // the by_value slot
    val matched = fn match {
      case "histogram_over_time" =>
        matched0.withColumn("__le",
          pow(lit(2.0), ceil(log(2.0, fv.get))).cast("double"))
      case _ => matched0
    }
    val v: Column = (fn match {
      case "rate"              => count(lit(1)).cast("double") / (stepNs / 1e9)
      case "count_over_time"   => count(lit(1)).cast("double")
      case "min_over_time"     => min(fv.get)
      case "max_over_time"     => max(fv.get)
      case "avg_over_time"     => avg(fv.get)
      case "sum_over_time"     => sum(fv.get)
      case "quantile_over_time" => percentile(fv.get, lit(quantile.get))
      case "histogram_over_time" => count(lit(1)).cast("double")
    }).as("value")
    val grouped = (fn, by) match {
      case ("histogram_over_time", _) =>
        matched.withColumn("by_value", col("__le").cast("string"))
          .groupBy(col("bucket_ns"), col("by_value")).agg(v)
      case (_, Some(r)) =>
        matched.withColumn("by_value", refCol(r))
          .groupBy(col("bucket_ns"), col("by_value")).agg(v)
      case (_, None) =>
        matched.groupBy(col("bucket_ns")).agg(v)
    }
    val ranked = topK match {
      case Some((n, top)) =>
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("bucket_ns"))
          .orderBy(if (top) col("value").desc else col("value").asc,
            col("by_value")) // deterministic tie-break
        grouped.withColumn("__rk", row_number().over(w))
          .filter(col("__rk") <= n).drop("__rk")
      case None => grouped
    }
    val ordCols =
      if (grouped.columns.contains("by_value")) Seq("bucket_ns", "by_value")
      else Seq("bucket_ns")
    val byKey =
      if (fn == "histogram_over_time") Some("__bucket")
      else by.map(refLabel)
    (ranked.orderBy(ordCols.map(col): _*), byKey)
  }

  /** Ingest-materialized attribute-count rollup backing [[planCompare]]
    * (the reference parses compare() and returns NotImplemented,
    * traceql/metrics_expr.go:59-96; Tempo evaluates it by exploding
    * span attrs per query). The rollup pre-explodes span + resource
    * attr entries ONCE at write time and counts them per (grain time
    * bucket × low-cardinality span dims × attr × value), so the
    * per-query plan is a selection-split groupBy over pre-aggregated
    * counts — no map decode, no explode, no full span scan. `dims` are
    * the intrinsic columns filters may reference (status_code, kind,
    * name); a compare() whose filter/outer references anything else —
    * or whose step/window is not grain-aligned — falls back to the
    * exploded path, same results.
    */
  final case class AttrCube(df: DataFrame, grainNs: Long) {
    /** Dimension columns = everything that isn't the rollup core. */
    def dims: Set[String] =
      df.columns.toSet -- Set("bucket_ns", "attr", "attr_value", "n")
  }

  /** Opens a streamed [[AttrCube]] sidecar layout
    * ([[graft.sources.Layout.writeAttrCube]] under
    * [[graft.streaming.Streams.spansSink]]). The stored rows are
    * per-micro-batch PARTIAL counts; they stay partial here — every
    * cube consumer ([[planCompare]]'s selection-split groupBy,
    * [[rankCompareTopN]]'s totals) re-aggregates with sum(n), so
    * partials merge exactly without a read-time shuffle of their own.
    * The `date` partition column is dropped so [[AttrCube.dims]] sees
    * only real dimension columns (bucket_ns carries the same pruning).
    */
  def attrCubeFrom(spark: org.apache.spark.sql.SparkSession, path: String,
      grainNs: Long = 86400000000000L): AttrCube =
    AttrCube(spark.read.parquet(path).drop("date"), grainNs)

  /** Builds the [[AttrCube]] frame from a spans table: one narrow
    * explode + one count shuffle, run once at ingest/compaction. Row
    * count is bounded by (time buckets × dim combos × attr values) —
    * dims must be low-cardinality intrinsics for the rollup to
    * compress (the deployment discipline: status/kind/name, never ids).
    */
  def compareAttrCounts(spans0: DataFrame, dims: Seq[String],
      grainNs: Long = 86400000000000L): DataFrame = {
    val withA =
      if (spans0.columns.contains("attrs")) spans0
      else spans0.withColumn("attrs", map().cast("map<string,string>"))
    val spans = withResourceAttrs(withA)
    val keyCols = "bucket_ns" +: dims :+ "attr" :+ "attr_value"
    spans
      .select((col("start_ns") - (col("start_ns") % lit(grainNs)))
        .as("bucket_ns") +: dims.map(col) :+
        explode(concat(map_entries(col("attrs")),
          map_entries(col("resource_attrs")))).as("kv"): _*)
      .select(col("bucket_ns") +: dims.map(col) :+
        col("kv.key").as("attr") :+ col("kv.value").as("attr_value"): _*)
      .groupBy(keyCols.map(col): _*)
      .agg(count(lit(1)).as("n"))
  }

  /** The condition [[parseFilterBlock]] emits for the empty block
    * `{ }` — trivially true on any span with a duration, so the cube
    * path may skip it entirely.
    */
  private def trivialTrue(e: SpansetExpr): Boolean = e match {
    case SFilter(FCmp(Intrinsic("duration"), ">=", SDurNs(0))) => true
    case _ => false
  }

  /** Column names a predicate reads, for the cube-coverage test —
    * mirrors [[refCol]] for the simple scalar intrinsics; anything
    * else (attr-map lookups, parent/trace/array scopes) maps to a
    * sentinel that is never a cube dim, so those filters fall back to
    * the exploded path correctly.
    */
  private def refNames(r: FieldRef): Set[String] = r match {
    case Intrinsic("duration") | ScopedRef("span", "duration") =>
      Set("duration_ns")
    case Intrinsic("name") | ScopedRef("span", "name")     => Set("name")
    case Intrinsic("status") | ScopedRef("span", "status") => Set("status_code")
    case Intrinsic("kind") | ScopedRef("span", "kind")     => Set("kind")
    case Intrinsic("statusMessage")                        => Set("status_message")
    case _ => Set("__not_cube_coverable")
  }

  private def fieldRefs(e: FieldExpr): Set[String] = e match {
    case FAnd(l, r)    => fieldRefs(l) ++ fieldRefs(r)
    case FOr(l, r)     => fieldRefs(l) ++ fieldRefs(r)
    case FNot(x)       => fieldRefs(x)
    case FCmp(r, _, _) => refNames(r)
    case FRe(r, _, _)  => refNames(r)
  }

  /** compare()'s shared tail: per-(group, attr) topN value ranking over
    * the aggregated counts. Two windows beat a totals+semi-join here —
    * that formulation recomputes the whole upstream subtree on both
    * join sides (no exchange reuse across differently-keyed shuffles);
    * dense_rank over (total desc, value) is a per-VALUE rank because
    * same-value rows share the pair.
    */
  private def rankCompareTopN(counts: DataFrame, topN: Int): DataFrame = {
    val wTot = org.apache.spark.sql.expressions.Window
      .partitionBy(col("meta_type"), col("attr"), col("attr_value"))
    val wRank = org.apache.spark.sql.expressions.Window
      .partitionBy(col("meta_type"), col("attr"))
      .orderBy(col("__total").desc, col("attr_value"))
    counts
      .withColumn("__total", sum(col("n")).over(wTot))
      .withColumn("__rk", dense_rank().over(wRank))
      .filter(col("__rk") <= topN)
      .drop("__total", "__rk")
      .orderBy("attr", "attr_value", "meta_type", "bucket_ns")
  }

  /** `{ spanset } | compare({ filter }[, topN[, startNs, endNs]])` —
    * splits the matched spans into a selection (matching the filter,
    * optionally within [start, end) ns) and a baseline (the rest) and
    * returns, per attribute value found on them, a count series per
    * group (reference parses + validates only,
    * traceql/metrics_expr.go:59-96; split/series semantics follow
    * Tempo's compare() docs). TopN (default 10, max 1000) keeps the
    * most frequent values PER (group, attribute), ranked by total
    * count with a value tie-break.
    *
    * Output: (bucket_ns, meta_type, attr, attr_value, n).
    *
    * Scale: with a maintained [[AttrCube]] the per-query plan is a
    * selection-split groupBy over ingest-aggregated counts (the spans
    * table is never scanned); otherwise one explode of the attr maps
    * (narrow), one count shuffle keyed by (group, attr, value,
    * bucket), and a value-cardinality-sized ranking window — never an
    * all-pairs or per-span driver walk.
    */
  private def planCompare(p: P, outer: SpansetExpr, spans0: DataFrame,
      stepNs: Long, originNs: Long = 0L,
      cube: Option[AttrCube] = None): DataFrame = {
    p.expect("(")
    val filter = parseFilterBlock(p) match {
      case SFilter(cond) => cond
      case _ => throw ParseError("compare() filter must be one block", p.i)
    }
    var topN = 10
    var startNs = 0L
    var endNs = 0L
    if (p.accept(",")) {
      topN = p.numberOrDuration() match {
        case SNum(x) if x == x.floor => x.toLong.toInt
        case _ => throw ParseError("compare() topN must be an integer", p.i)
      }
      if (p.accept(",")) {
        startNs = p.numberOrDuration() match {
          case SNum(x) => x.toLong
          case _       => throw ParseError("expected start ns", p.i)
        }
        // 3-arg form is invalid: start and end come together
        p.expect(",")
        endNs = p.numberOrDuration() match {
          case SNum(x) => x.toLong
          case _       => throw ParseError("expected end ns", p.i)
        }
      }
    }
    p.expect(")")
    if (!p.done) throw ParseError("trailing input", p.i)
    if (topN <= 0 || topN > 1000)
      throw ParseError(s"compare() top number of values must be between 1 and 1000, got $topN", 0)
    if (startNs != 0 || endNs != 0) {
      if (startNs <= 0 || endNs <= 0)
        throw ParseError("compare() start and end timestamps must be both set", 0)
      if (endNs <= startNs)
        throw ParseError("compare() end timestamp must be greater than start timestamp", 0)
    }

    // Rollup route: when the maintained attr-count cube covers the
    // query — step/origin/window grain-aligned, outer + filter read
    // only cube dims — the plan never touches the spans table at all.
    val viaCube: Option[DataFrame] = cube.flatMap { c =>
      val dims = c.dims
      val aligned = stepNs % c.grainNs == 0 && originNs % c.grainNs == 0 &&
        startNs % c.grainNs == 0 && endNs % c.grainNs == 0
      val outerOk = trivialTrue(outer) || (outer match {
        case SFilter(cond) => fieldRefs(cond).subsetOf(dims)
        case _             => false
      })
      val selOk = fieldRefs(filter).subsetOf(dims)
      if (!(aligned && outerOk && selOk)) None
      else {
        val base = outer match {
          case SFilter(cond) if !trivialTrue(outer) => c.df.filter(condCol(cond))
          case _                                    => c.df
        }
        // window membership tests the grain bucket: with [start, end)
        // grain-aligned, span start ∈ [s, e) ⟺ its bucket ∈ [s, e)
        val sel0 = condCol(filter)
        val sel =
          if (startNs != 0)
            sel0 && col("bucket_ns") >= startNs && col("bucket_ns") < endNs
          else sel0
        val tagged0 = base.withColumn("meta_type",
          when(sel, "selection").otherwise("baseline"))
        val tagged =
          if (stepNs == c.grainNs && originNs == 0L) tagged0
          else tagged0.withColumn("bucket_ns",
            col("bucket_ns") - ((col("bucket_ns") - lit(originNs)) % lit(stepNs)))
        // ONE exchange for the whole compare() tail (guide §2.4): the
        // cube is already ingest-aggregated (cube-sized rows), so
        // hash-distributing it by (meta_type, attr) BEFORE the re-roll
        // satisfies the groupBy's clustering (subset of its keys) AND
        // both ranking windows' — the agg's own exchange and the two
        // window exchanges all disappear (r20 plan: 3 hash exchanges →
        // 1). Parallelism is unchanged: the ranking window was always
        // (meta_type, attr)-partitioned.
        Some(tagged.repartition(col("meta_type"), col("attr"))
          .groupBy("meta_type", "attr", "attr_value", "bucket_ns")
          .agg(sum(col("n")).cast("double").as("n")))
      }
    }
    if (viaCube.isDefined) return rankCompareTopN(viaCube.get, topN)

    val spans =
      if (spans0.columns.contains("attrs")) spans0
      else spans0.withColumn("attrs", map().cast("map<string,string>"))
    val matched = evalSpanset(outer, spans)
    val selBase = condCol(filter)
    val sel =
      if (startNs != 0)
        selBase && col("start_ns") >= startNs && col("start_ns") < endNs
      else selBase
    val tagged = matched
      .withColumn("bucket_ns", bucket(originNs, stepNs))
      .withColumn("meta_type", when(sel, "selection").otherwise("baseline"))
    val exploded = tagged.select(col("bucket_ns"), col("meta_type"),
        explode(concat(map_entries(col("attrs")),
          map_entries(col("resource_attrs")))).as("kv"))
      .select(col("bucket_ns"), col("meta_type"),
        col("kv.key").as("attr"), col("kv.value").as("attr_value"))
    // the count shuffle stays keyed by the full (group, attr, value,
    // bucket) — partial aggregation must collapse the data-sized
    // explode map-side — and the cube-sized COUNTS re-distribute once
    // by (meta_type, attr) so both ranking windows ride that one
    // exchange instead of one each (guide §2.4)
    val counts = exploded
      .groupBy("meta_type", "attr", "attr_value", "bucket_ns")
      .agg(count(lit(1)).cast("double").as("n"))
      .repartition(col("meta_type"), col("attr"))
    rankCompareTopN(counts, topN)
  }

  /** Selector-filtered tag autocomplete (SearchTagValuesV2,
    * reference chstorage/querier_traces.go:113-391): the distinct
    * values `tag` takes on spans matching the spanset selector —
    * unscoped lookup (span→resource coalesce), nulls dropped, sorted.
    */
  def tagValues(q: String, tag: String, spans0: DataFrame): DataFrame =
    matchSpans(q, spans0)
      .transform(withResourceAttrs)
      .select(coalesce(element_at(col("attrs"), tag),
        element_at(col("resource_attrs"), tag)).as("value"))
      .filter(col("value").isNotNull)
      .distinct().orderBy("value")

  /** Distinct attribute names across span + resource scopes
    * (SearchTags, reference tempohandler.go:247-312) — one distinct
    * shuffle over exploded keys, never a per-span driver walk.
    */
  def tagNames(spans0: DataFrame): DataFrame = {
    val withA =
      if (spans0.columns.contains("attrs")) spans0
      else spans0.withColumn("attrs", map().cast("map<string,string>"))
    withResourceAttrs(withA)
      .select(explode(concat(map_keys(col("attrs")),
        map_keys(col("resource_attrs")))).as("tag"))
      .distinct().orderBy("tag")
  }

  /** Intrinsic field names the grammar evaluates — the `intrinsic`
    * scope block of SearchTagsV2 (reference traceql.IntrinsicNames(),
    * tempohandler.go:469-484).
    */
  val intrinsicNames: Seq[String] = Seq(
    "duration", "kind", "name", "rootName", "rootServiceName",
    "status", "statusMessage", "traceDuration")

  /** (scope, tag) pairs split by attribute scope — SearchTagsV2's
    * per-scope blocks (reference tempohandler.go:497-528): span attrs
    * under `span`, resource attrs under `resource`. Same single
    * distinct shuffle as [[tagNames]], with the scope carried through
    * the explode.
    */
  def tagNamesScoped(spans0: DataFrame): DataFrame = {
    val withA =
      if (spans0.columns.contains("attrs")) spans0
      else spans0.withColumn("attrs", map().cast("map<string,string>"))
    withResourceAttrs(withA)
      .select(explode(concat(
        transform(map_keys(col("attrs")),
          k => struct(lit("span").as("scope"), k.as("tag"))),
        transform(map_keys(col("resource_attrs")),
          k => struct(lit("resource").as("scope"), k.as("tag"))))).as("st"))
      .select(col("st.scope").as("scope"), col("st.tag").as("tag"))
      .distinct().orderBy("scope", "tag")
  }

  /** Bare spanset evaluation: the spans matching `q`'s selector, with
    * no pipeline stages — the building block for search endpoints and
    * autocomplete.
    */
  def matchSpans(q: String, spans0: DataFrame): DataFrame = {
    val spans = withResourceAttrs(spans0)
    val p = new P(q)
    val ss = parseSpanset(p)
    if (!p.done) throw ParseError("trailing input", p.i)
    evalSpanset(ss, spans)
  }

  /** Attribute names referenced by the query's filter expressions.
    * Tempo's search API echoes ONLY query-bound attributes on its
    * spanSet rows — propagating the whole attr set per span blows up
    * response size and breaks Grafana's search table (reference
    * traceqlengine/attrs.go:9-21).
    */
  def referencedAttrs(q: String): Set[String] = {
    val p = new P(q)
    val ss = parseSpanset(p) // trailing pipeline stages don't add filter attrs here
    val out = Set.newBuilder[String]
    def walkR(r: FieldRef): Unit = r match {
      case Attr(_, n) => out += n
      case _          => ()
    }
    def walkF(e: FieldExpr): Unit = e match {
      case FAnd(l, r)    => walkF(l); walkF(r)
      case FOr(l, r)     => walkF(l); walkF(r)
      case FNot(x)       => walkF(x)
      case FCmp(r, _, _) => walkR(r)
      case FRe(r, _, _)  => walkR(r)
    }
    def walkS(s: SpansetExpr): Unit = s match {
      case SFilter(c)           => walkF(c)
      case SStructural(_, l, r) => walkS(l); walkS(r)
    }
    walkS(ss)
    out.result()
  }

  def plan(q: String, spans0: DataFrame): DataFrame = {
    val ast = parse(q)
    val spans = withResourceAttrs(spans0)
    val matched0 = evalSpanset(ast.spanset, spans)
    // by(field): the field value becomes part of the spanset identity
    val (grouped, groupCols) = ast.by match {
      case Some(r) =>
        (matched0.withColumn("by_value", refCol(r))
          .groupBy(col("trace_id"), col("by_value")),
          Seq("trace_id", "by_value"))
      case None => (matched0.groupBy(col("trace_id")), Seq("trace_id"))
    }
    // select(f): decimal-exact sum projection per selected field;
    // event:/link: refs are ARRAY-scoped — select() surfaces the
    // distinct field values across the spanset as one sorted
    // comma-joined string (deterministic, and the scalar shape the
    // oracle can recompute), not a numeric sum
    val selAggs = ast.selects.map {
      case r @ ScopedRef(s @ ("event" | "link"), f) =>
        val (arr, get) = arrayField(s, f)
        concat_ws(",", array_sort(array_distinct(flatten(collect_list(
          transform(col(arr), e => get(e).cast("string")))))))
          .as(s"${s}_${refName(r)}_vals")
      case r =>
        sum(refCol(r).cast("decimal(18,4)")).cast("double")
          .as(s"${refName(r)}_sum")
    }
    val orderCols = groupCols.map(col)
    ast.scalar match {
      case None =>
        grouped.agg(count(lit(1)).as("n_spans"), selAggs: _*)
          .orderBy(orderCols: _*)
      case Some(ScalarFilter(agg, field, op, v)) =>
        val target: Column = agg match {
          case "count" => count(lit(1)).cast("double")
          case "max"   => max(refCol(field.get)).cast("double")
          case "min"   => min(refCol(field.get)).cast("double")
          case "avg"   => avg(refCol(field.get).cast("double"))
          case "sum"   => sum(refCol(field.get).cast("double"))
        }
        val df = grouped.agg(count(lit(1)).as("n_spans"),
          (target.as("agg_value") +: selAggs): _*)
        val cond = op match {
          case "="  => col("agg_value") === v
          case "!=" => col("agg_value") =!= v
          case ">"  => col("agg_value") > v
          case ">=" => col("agg_value") >= v
          case "<"  => col("agg_value") < v
          case "<=" => col("agg_value") <= v
        }
        df.filter(cond).orderBy(orderCols: _*)
    }
  }
}
