#!/usr/bin/env python3
"""Golden-result generator for the TraceQL compliance corpus.

Evaluates every corpus query with an INDEPENDENT mini-TraceQL
implementation (own parser + evaluator, shares no code with the Scala
engine) over a hand-authored span fixture. Semantics follow upstream
Tempo TraceQL (grammar: span filters with typed statics, scoped attrs,
intrinsics incl. trace-level, parent:/event:/link:/instrumentation:
scopes, structural ops > >> < << ~ and negations returning RIGHT-side
spans, && mergeSpans / || union, pipeline by()/select()/scalar HAVING,
metrics rate/count_over_time/*_over_time/histogram/topk, compare()).
Null comparison semantics are Kleene three-valued, matching both Go
nil-propagation in the reference and Spark SQL: a comparison on a
missing attribute is unknown, unknown prunes the span.

Writes:
  src/test/resources/traceql_compliance_spans.json   the fixture
  src/test/resources/traceql_compliance_golden.json  expected results

Run driver-side: python3 tools/gen_traceql_compliance_golden.py
"""
import json
import math
import os
import re
from collections import defaultdict

HERE = os.path.dirname(os.path.abspath(__file__))
RES_DIR = os.path.join(HERE, "..", "src", "test", "resources")

STEP_NS = 60 * 1_000_000_000

# ---------------------------------------------------------------------------
# Fixture
# ---------------------------------------------------------------------------

RES = {
    "gateway":   {"service.name": "gateway", "deployment.environment": "prod", "host.name": "h1"},
    "auth":      {"service.name": "auth", "deployment.environment": "prod", "host.name": "h2"},
    "checkout":  {"service.name": "checkout", "deployment.environment": "prod", "host.name": "h3"},
    "payment":   {"service.name": "payment", "deployment.environment": "staging", "host.name": "h4"},
    "inventory": {"service.name": "inventory", "deployment.environment": "staging", "host.name": "h5"},
}


def S(tid, sid, psid, name, kind, status, start_s, dur_ms, svc, smsg="",
      attrs=None, scope=("lib-std", "1.0.0"), events=(), links=()):
    return dict(
        trace_id=tid, span_id=sid, parent_span_id=psid, name=name, kind=kind,
        status_code=status, status_message=smsg,
        start_ns=int(round(start_s * 1e9)), duration_ns=int(round(dur_ms * 1e6)),
        attrs=dict(attrs or {}), resource=dict(RES[svc]),
        scope_name=scope[0], scope_version=scope[1],
        events=list(events), links=[list(l) for l in links])


def fixture():
    sp = []
    # T1: gateway -> checkout -> payment chain, depth 4
    sp += [
        S(1, 1, None, "GET /checkout", 2, 1, 10.0, 500, "gateway"),
        S(1, 2, 1, "auth.check", 3, 1, 10.01, 50, "auth"),
        S(1, 3, 1, "checkout.process", 2, 1, 10.07, 400, "checkout"),
        S(1, 4, 3, "db.query", 3, 1, 10.10, 80, "checkout",
          attrs={"db.system": "postgres", "db.statement": "SELECT carts"}),
        S(1, 5, 3, "payment.charge", 3, 2, 10.20, 200, "payment",
          smsg="upstream 502",
          attrs={"error": "true", "http.status_code": "502"}),
        S(1, 6, 5, "retry.charge", 3, 1, 10.25, 90, "payment"),
        S(1, 7, 6, "db.query", 3, 1, 10.28, 30, "payment",
          attrs={"db.system": "postgres", "db.statement": "INSERT payments"}),
        S(1, 8, 1, "render.response", 1, 1, 10.45, 20, "gateway"),
    ]
    # T2: wide fan, workers 0/3 error
    sp.append(S(2, 20, None, "batch.process", 1, 1, 70.0, 800, "inventory"))
    for i in range(6):
        sp.append(S(2, 21 + i, 20, "worker.%d" % i, 1,
                    2 if i % 3 == 0 else 1, 70.05 + 0.1 * i, 10 + 20 * i,
                    "inventory"))
    # T3: lone error root
    sp.append(S(3, 30, None, "cron.cleanup", 1, 2, 130.0, 5000, "auth",
                smsg="deadline exceeded"))
    # T4: orphan parent link (999 does not exist)
    sp += [
        S(4, 40, None, "ingest", 2, 1, 190.0, 300, "gateway"),
        S(4, 41, 40, "parse", 1, 1, 190.02, 100, "gateway"),
        S(4, 42, 999, "detached.work", 1, 1, 190.05, 50, "gateway"),
        S(4, 43, 41, "store", 3, 1, 190.08, 60, "gateway",
          attrs={"db.system": "redis"}),
    ]
    # T5: chain depth 6
    for i in range(6):
        sp.append(S(5, 50 + i, None if i == 0 else 50 + i - 1, "L%d" % i,
                    1, 1, 250.0 + 0.05 * i, 600 - 100 * i, "checkout"))
    # T6: events + links
    sp += [
        S(6, 60, None, "handle /api", 2, 1, 310.0, 250, "gateway",
          attrs={"http.method": "GET", "http.status_code": "200"}),
        S(6, 61, 60, "cache.get", 1, 1, 310.01, 5, "gateway",
          events=["cache.miss"]),
        S(6, 62, 60, "fetch.remote", 3, 1, 310.02, 120, "gateway",
          links=[(1, 5)]),
        S(6, 63, 62, "decode", 1, 2, 310.10, 30, "gateway",
          smsg="bad payload", events=["exception", "message"]),
    ]
    # T7: http statuses
    sp += [
        S(7, 70, None, "GET /users", 2, 1, 370.0, 180, "gateway",
          attrs={"http.method": "GET", "http.status_code": "200"}),
        S(7, 71, 70, "POST /login", 3, 1, 370.02, 90, "auth",
          attrs={"http.method": "POST", "http.status_code": "201"}),
        S(7, 72, 70, "GET /missing", 3, 1, 370.05, 40, "auth",
          attrs={"http.method": "GET", "http.status_code": "404"}),
        S(7, 73, 70, "GET /boom", 3, 2, 370.08, 60, "payment",
          smsg="internal error",
          attrs={"http.method": "GET", "http.status_code": "500",
                 "error": "true"}),
    ]
    # T8: db sweep + nested child under a db span
    sp.append(S(8, 80, None, "db.batch", 1, 1, 430.0, 700, "inventory"))
    for i, dbs in enumerate(["postgres", "mysql", "redis", "postgres",
                             "cassandra"]):
        sp.append(S(8, 81 + i, 80, "db.query", 3, 1, 430.05 + 0.05 * i,
                    40 + 10 * i, "inventory",
                    attrs={"db.system": dbs, "retry.count": str(i)}))
    sp.append(S(8, 86, 81, "redis.pipeline", 3, 1, 430.5, 15, "inventory",
                attrs={"db.system": "redis"}))
    # T9: error children under ok root
    sp.append(S(9, 90, None, "sync.all", 2, 1, 490.0, 400, "checkout"))
    for i in range(3):
        sp.append(S(9, 91 + i, 90, "sync.shard%d" % i, 1, 2,
                    490.05 + 0.05 * i, 100 + 30 * i, "checkout",
                    smsg="deadline exceeded", attrs={"error": "true"}))
    # T10: producer/consumer, status unset
    sp += [
        S(10, 100, None, "queue.publish", 4, 0, 530.0, 25, "gateway"),
        S(10, 101, 100, "queue.consume", 5, 0, 530.2, 35, "inventory"),
    ]
    # T11: instrumentation scopes
    sp += [
        S(11, 110, None, "http.request", 2, 1, 20.0, 80, "auth",
          scope=("io.otel.http", "1.2.0")),
        S(11, 111, 110, "db.select", 3, 1, 20.02, 40, "auth",
          scope=("io.otel.db", "0.9.1"), attrs={"db.system": "mysql"}),
    ]
    # T12: long-lived trace spread over many step buckets
    sp.append(S(12, 120, None, "tick.root", 1, 1, 80.0, 200, "gateway"))
    for i, t in enumerate([140.0, 260.0, 380.0, 470.0, 530.0]):
        sp.append(S(12, 121 + i, 120, "tick.%d" % i, 1, 1, t, 10, "gateway"))
    return sp


SPANS = fixture()
BY_TRACE = defaultdict(list)
for s in SPANS:
    BY_TRACE[s["trace_id"]].append(s)
PARENT = {t: {s["span_id"]: s["parent_span_id"] for s in ss if
              s["parent_span_id"] is not None}
          for t, ss in BY_TRACE.items()}
IDS = {t: {s["span_id"] for s in ss} for t, ss in BY_TRACE.items()}
KEYED = {(s["trace_id"], s["span_id"]): s for s in SPANS}

TRACE_META = {}
for t, ss in BY_TRACE.items():
    roots = [s for s in ss if s["parent_span_id"] is None]
    root_name = min((s["name"] for s in roots), default=None)
    root_svc = min((s["resource"].get("service.name",
                                      s["attrs"].get("service.name"))
                    for s in roots), default=None)
    dur = (max(s["start_ns"] + s["duration_ns"] for s in ss) -
           min(s["start_ns"] for s in ss))
    TRACE_META[t] = dict(root_name=root_name, root_service=root_svc,
                         trace_duration_ns=dur)


def ancestors(tid, sid):
    """Root-ward parent chain; mirrors the engine's cycle-guarded walk
    (ids that do not exist as spans still appear in the path)."""
    path, seen = [], set()
    cur = PARENT[tid].get(sid)
    while cur is not None and cur not in seen:
        seen.add(cur)
        path.append(cur)
        cur = PARENT[tid].get(cur)
    return path


# ---------------------------------------------------------------------------
# Mini TraceQL parser (independent of the Scala engine)
# ---------------------------------------------------------------------------

SYMBOLIC = {"unset": 0, "ok": 1, "error": 2, "unspecified": 0,
            "internal": 1, "server": 2, "client": 3, "producer": 4,
            "consumer": 5}
DUR_UNITS = {"ns": 1, "us": 1e3, "ms": 1e6, "s": 1e9, "m": 6e10, "h": 3.6e12}


class PErr(Exception):
    pass


class Tok:
    def __init__(self, q):
        self.q = q
        self.i = 0

    def ws(self):
        while self.i < len(self.q) and self.q[self.i].isspace():
            self.i += 1

    def peek(self):
        self.ws()
        return self.q[self.i] if self.i < len(self.q) else "\0"

    def accept(self, s):
        self.ws()
        if self.q.startswith(s, self.i):
            self.i += len(s)
            return True
        return False

    def expect(self, s):
        if not self.accept(s):
            raise PErr("expected %r at %d" % (s, self.i))

    def ident(self):
        self.ws()
        m = re.match(r"[A-Za-z0-9_]+", self.q[self.i:])
        if not m:
            raise PErr("expected ident at %d" % self.i)
        self.i += m.end()
        return m.group(0)

    def string(self):
        self.ws()
        self.expect('"')
        j = self.q.index('"', self.i)
        s = self.q[self.i:j]
        self.i = j + 1
        return s

    def num_or_dur(self):
        self.ws()
        m = re.match(r"[0-9.]+", self.q[self.i:])
        if not m:
            raise PErr("expected number at %d" % self.i)
        self.i += m.end()
        num = m.group(0)
        m2 = re.match(r"[A-Za-z]+", self.q[self.i:])
        if m2:
            self.i += m2.end()
            unit = m2.group(0)
            if unit not in DUR_UNITS:
                raise PErr("bad duration unit %r" % unit)
            return ("dur", int(float(num) * DUR_UNITS[unit]))
        return ("num", float(num))

    def done(self):
        self.ws()
        return self.i >= len(self.q)


STRUCT_OPS = ["!>>", "!<<", "&>>", "&<<", ">>", "<<", "!>", "!<", "!~",
              "&>", "&<", "&~", ">", "~", "<", "&&", "||"]


def parse_ref(p):
    p.ws()
    if p.peek() == ".":
        p.i += 1
        parts = [p.ident()]
        while p.accept("."):
            parts.append(p.ident())
        return ("attr", "", ".".join(parts))
    first = p.ident()
    if p.accept(":"):
        return ("scoped", first, p.ident())
    if p.accept("."):
        parts = [p.ident()]
        while p.accept("."):
            parts.append(p.ident())
        return ("attr", first, ".".join(parts))
    if first in ("duration", "name", "status", "kind", "rootName",
                 "traceDuration", "statusMessage", "rootServiceName"):
        return ("intr", first)
    return ("attr", "", first)


def parse_cmp(p):
    ref = parse_ref(p)
    if p.accept("=~"):
        return ("re", ref, p.string(), False)
    if p.accept("!~"):
        return ("re", ref, p.string(), True)
    for op in (">=", "<=", "!=", "=", ">", "<"):
        if p.accept(op):
            break
    else:
        raise PErr("expected comparison at %d" % p.i)
    c = p.peek()
    if c == '"':
        v = ("str", p.string())
    elif c.isalpha():
        w = p.ident()
        if w not in SYMBOLIC:
            raise PErr("unknown symbolic %r" % w)
        v = ("num", float(SYMBOLIC[w]))
    else:
        v = p.num_or_dur()
    return ("cmp", ref, op, v)


def parse_unary(p):
    if p.accept("!"):
        return ("not", parse_unary(p))
    if p.accept("("):
        e = parse_or(p)
        p.expect(")")
        return e
    return parse_cmp(p)


def parse_and(p):
    acc = parse_unary(p)
    while p.accept("&&"):
        acc = ("and", acc, parse_unary(p))
    return acc


def parse_or(p):
    acc = parse_and(p)
    while p.accept("||"):
        acc = ("or", acc, parse_and(p))
    return acc


def parse_block(p):
    p.expect("{")
    if p.accept("}"):
        return ("filter", ("cmp", ("intr", "duration"), ">=", ("dur", 0)))
    cond = parse_or(p)
    p.expect("}")
    return ("filter", cond)


def parse_spanset(p):
    lhs = parse_block(p)
    while True:
        for op in STRUCT_OPS:
            if p.accept(op):
                lhs = ("struct", op, lhs, parse_block(p))
                break
        else:
            return lhs


# ---------------------------------------------------------------------------
# Evaluator
# ---------------------------------------------------------------------------

def resolve(ref, s):
    """Field value for span dict s, or None when absent."""
    kind = ref[0]
    if kind == "intr":
        n = ref[1]
        if n == "duration":
            return s["duration_ns"]
        if n == "name":
            return s["name"]
        if n == "status":
            return s["status_code"]
        if n == "kind":
            return s["kind"]
        if n == "statusMessage":
            return s["status_message"]
        meta = TRACE_META[s["trace_id"]]
        if n == "rootName":
            return meta["root_name"]
        if n == "rootServiceName":
            return meta["root_service"]
        if n == "traceDuration":
            return meta["trace_duration_ns"]
        raise PErr("intrinsic %r" % n)
    if kind == "scoped":
        scope, n = ref[1], ref[2]
        if scope == "span":
            d = {"id": s["span_id"], "parentID": s["parent_span_id"],
                 "duration": s["duration_ns"], "name": s["name"],
                 "kind": s["kind"], "status": s["status_code"],
                 "statusMessage": s["status_message"]}
            if n not in d:
                _raise(scope, n)
            return d[n]
        if scope == "trace":
            meta = TRACE_META[s["trace_id"]]
            d = {"id": s["trace_id"],
                 "duration": meta["trace_duration_ns"],
                 "rootName": meta["root_name"],
                 "rootService": meta["root_service"]}
            if n not in d:
                _raise(scope, n)
            return d[n]
        if scope == "instrumentation":
            d = {"name": s["scope_name"], "version": s["scope_version"]}
            if n not in d:
                _raise(scope, n)
            return d[n]
        if scope == "parent":
            par = _parent_span(s)
            d0 = {"id", "name", "duration", "status"}
            if n not in d0:
                _raise(scope, n)
            if par is None:
                return None
            return {"id": par["span_id"], "name": par["name"],
                    "duration": par["duration_ns"],
                    "status": par["status_code"]}[n]
        _raise(scope, n)
    if kind == "attr":
        scope, n = ref[1], ref[2]
        if scope == "parent":
            par = _parent_span(s)
            return None if par is None else par["attrs"].get(n)
        if scope == "span":
            return s["attrs"].get(n)
        if scope == "resource":
            return s["resource"].get(n)
        v = s["attrs"].get(n)
        return v if v is not None else s["resource"].get(n)
    raise PErr("ref %r" % (ref,))


def _raise(scope, n):
    raise PErr("unsupported scoped ref %s:%s" % (scope, n))


def _parent_span(s):
    p = s["parent_span_id"]
    return None if p is None else KEYED.get((s["trace_id"], p))


def as_num(v):
    if v is None:
        return None
    if isinstance(v, (int, float)):
        return float(v)
    try:
        return float(v)
    except ValueError:
        return None


def cmp_eval(lv, op, static):
    skind, sval = static
    if lv is None:
        return None
    if skind == "str":
        l = lv
        r = sval
    elif skind == "num":
        l = as_num(lv)
        r = sval
        if l is None:
            return None
    else:  # dur: compare numerically without string coercion
        if not isinstance(lv, (int, float)):
            return None
        l, r = lv, sval
    return {"=": l == r, "!=": l != r, ">": l > r, ">=": l >= r,
            "<": l < r, "<=": l <= r}[op]


def k_not(a):
    return None if a is None else (not a)


def k_and(a, b):
    if a is False or b is False:
        return False
    if a is None or b is None:
        return None
    return True


def k_or(a, b):
    if a is True or b is True:
        return True
    if a is None or b is None:
        return None
    return False


def cond_eval(e, s):
    k = e[0]
    if k == "and":
        return k_and(cond_eval(e[1], s), cond_eval(e[2], s))
    if k == "or":
        return k_or(cond_eval(e[1], s), cond_eval(e[2], s))
    if k == "not":
        return k_not(cond_eval(e[1], s))
    if k == "re":
        _, ref, pat, neg = e
        if ref[0] == "scoped" and ref[1] in ("event", "link"):
            got = _exists(ref, s, lambda x: re.fullmatch(pat, str(x))
                          is not None)
        else:
            lv = resolve(ref, s)
            if lv is None:
                return None
            got = re.fullmatch(pat, str(lv)) is not None
        return k_not(got) if neg else got
    if k == "cmp":
        _, ref, op, v = e
        if ref[0] == "scoped" and ref[1] in ("event", "link"):
            return _exists(ref, s, lambda x: cmp_eval(x, op, v) is True)
        return cmp_eval(resolve(ref, s), op, v)
    raise PErr("cond %r" % (e,))


def _exists(ref, s, test):
    scope, field = ref[1], ref[2]
    if scope == "event":
        if field != "name":
            raise PErr("unsupported event field %r" % field)
        return any(test(n) for n in s["events"])
    if field == "traceID":
        return any(test(l[0]) for l in s["links"])
    if field == "spanID":
        return any(test(l[1]) for l in s["links"])
    raise PErr("unsupported link field %r" % field)


def eval_spanset(e):
    """Returns a set of (trace_id, span_id)."""
    if e[0] == "filter":
        return {(s["trace_id"], s["span_id"]) for s in SPANS
                if cond_eval(e[1], s) is True}
    _, op, lhs, rhs = e
    L = eval_spanset(lhs)
    if op == "&&":
        Rm = eval_spanset(rhs)
        both = {t for t, _ in L} & {t for t, _ in Rm}
        return {k for k in (L | Rm) if k[0] in both}
    if op == "||":
        return L | eval_spanset(rhs)
    R = eval_spanset(rhs)
    l_by_trace = defaultdict(set)
    for t, sid in L:
        l_by_trace[t].add(sid)

    def make_tests(ref):
        def child_of(k):  # k's parent is a ref-match
            s = KEYED[k]
            p = s["parent_span_id"]
            return p is not None and p in ref[k[0]]

        def parent_of(k):  # k is the parent of a ref-match
            t, sid = k
            return any(KEYED[(t, l)]["parent_span_id"] == sid
                       for l in ref[t])

        def desc_of(k):  # k descends from a ref-match (full chain)
            t, sid = k
            return any(a in ref[t] for a in ancestors(t, sid))

        def anc_of(k):  # k is an ancestor of a ref-match
            t, sid = k
            return any(sid in ancestors(t, l) for l in ref[t])

        def sibling_of(k):  # shares a non-null parent with a DIFFERENT ref
            s = KEYED[k]
            p = s["parent_span_id"]
            if p is None:
                return False
            return any(l != k[1] and KEYED[(k[0], l)]["parent_span_id"] == p
                       for l in ref[k[0]])

        return {">": child_of, "<": parent_of, ">>": desc_of,
                "<<": anc_of, "~": sibling_of}

    tests = make_tests(l_by_trace)
    if op.startswith("&") and op != "&&":
        # union structural forms: BOTH participants survive — the
        # r-matches the plain op keeps, plus the l-matches standing on
        # the other end (the CONVERSE relation evaluated against R)
        converse = {"&>": "<", "&<": ">", "&>>": "<<",
                    "&<<": ">>", "&~": "~"}[op]
        r_by_trace = defaultdict(set)
        for t, sid in R:
            r_by_trace[t].add(sid)
        conv_tests = make_tests(r_by_trace)
        return ({k for k in R if tests[op[1:]](k)} |
                {k for k in L if conv_tests[converse](k)})
    if op in tests:
        return {k for k in R if tests[op](k)}
    return {k for k in R if not tests[op.lstrip("!")](k)}


# ---------------------------------------------------------------------------
# Pipeline / metrics evaluation
# ---------------------------------------------------------------------------

def parse_query(q):
    """Full query: spanset + pipeline stages, mirroring the grammar."""
    p = Tok(q)
    ss = parse_spanset(p)
    stages = []
    while p.accept("|"):
        save = p.i
        w = p.ident()
        if w == "by":
            p.expect("(")
            stages.append(("by", parse_ref(p)))
            p.expect(")")
        elif w == "coalesce":
            p.expect("(")
            p.expect(")")
        elif w == "select":
            p.expect("(")
            refs = [parse_ref(p)]
            while p.accept(","):
                refs.append(parse_ref(p))
            p.expect(")")
            stages.append(("select", refs))
        elif w in ("count", "max", "min", "avg", "sum") and _is_scalar(p):
            p.i = save
            stages.append(("scalar", parse_scalar(p)))
        elif w in ("rate", "count_over_time", "min_over_time",
                   "max_over_time", "avg_over_time", "sum_over_time",
                   "quantile_over_time", "histogram_over_time"):
            p.i = save
            stages.append(("metric", parse_metric(p)))
        elif w in ("topk", "bottomk"):
            p.expect("(")
            n = p.num_or_dur()
            p.expect(")")
            stages.append((w, int(n[1])))
        elif w == "compare":
            stages.append(("compare", parse_compare(p)))
        else:
            raise PErr("unknown stage %r" % w)
    if not p.done():
        raise PErr("trailing input at %d" % p.i)
    return ss, stages


def _is_scalar(p):
    # after the ident we are at "(": a scalar filter has a comparison
    # after the closing paren; metrics fns never do. Peek cheaply: the
    # scalar set and metric set are disjoint except none — count/max/...
    # are always scalar filters in this grammar.
    return True


def parse_scalar(p):
    agg = p.ident()
    p.expect("(")
    field = None
    if not p.accept(")"):
        field = parse_ref(p)
        p.expect(")")
    for op in (">=", "<=", "!=", "=", ">", "<"):
        if p.accept(op):
            break
    else:
        raise PErr("expected comparison at %d" % p.i)
    v = p.num_or_dur()
    return (agg, field, op, float(v[1]))


def parse_metric(p):
    fn = p.ident()
    p.expect("(")
    field = None
    quant = None
    if fn in ("min_over_time", "max_over_time", "avg_over_time",
              "sum_over_time", "quantile_over_time", "histogram_over_time"):
        field = parse_ref(p)
        if fn == "quantile_over_time":
            p.expect(",")
            quant = p.num_or_dur()[1]
    p.expect(")")
    return (fn, field, quant)


def parse_compare(p):
    p.expect("(")
    filt = parse_block(p)
    topn, t0, t1 = 10, 0, 0
    if p.accept(","):
        topn = int(p.num_or_dur()[1])
        if p.accept(","):
            t0 = int(p.num_or_dur()[1])
            p.expect(",")
            t1 = int(p.num_or_dur()[1])
    p.expect(")")
    if topn <= 0 or topn > 1000:
        raise PErr("compare topN out of range")
    return (filt[1], topn, t0, t1)


def percentile(vals, phi):
    vs = sorted(vals)
    pos = phi * (len(vs) - 1)
    lo, hi = int(math.floor(pos)), int(math.ceil(pos))
    if lo == hi:
        return vs[lo]
    return vs[lo] + (pos - lo) * (vs[hi] - vs[lo])


def bucket_of(s):
    return s["start_ns"] - s["start_ns"] % STEP_NS


def eval_rollup(ss, stages):
    matched = [KEYED[k] for k in eval_spanset(ss)]
    by = next((st[1] for st in stages if st[0] == "by"), None)
    selects = [r for st in stages if st[0] == "select" for r in st[1]]
    scalar = next((st[1] for st in stages if st[0] == "scalar"), None)
    groups = defaultdict(list)
    for s in matched:
        key = (s["trace_id"], resolve(by, s)) if by else (s["trace_id"],)
        groups[key].append(s)
    rows = []
    for key, ss2 in sorted(groups.items(), key=lambda kv: tuple(
            ("" if x is None else str(x)) for x in kv[0])):
        row = {"trace_id": key[0], "n_spans": len(ss2)}
        if by:
            row["by"] = None if key[1] is None else str(key[1])
        for r in selects:
            nm = r[-1]
            vals = [as_num(resolve(r, s)) for s in ss2]
            row.setdefault("sums", {})[nm + "_sum"] = sum(
                v for v in vals if v is not None)
        if scalar:
            agg, field, op, v = scalar
            if agg == "count":
                av = float(len(ss2))
            else:
                vals = [as_num(resolve(field, s)) for s in ss2]
                vals = [v2 for v2 in vals if v2 is not None]
                av = {"max": max, "min": min, "sum": sum,
                      "avg": lambda x: sum(x) / len(x)}[agg](vals)
            keep = {"=": av == v, "!=": av != v, ">": av > v,
                    ">=": av >= v, "<": av < v, "<=": av <= v}[op]
            if not keep:
                continue
            row["agg"] = av
        rows.append(row)
    return {"kind": "rollup", "has_by": by is not None,
            "has_scalar": scalar is not None,
            "sel_names": [r[-1] + "_sum" for r in selects], "rows": rows}


def eval_metrics(ss, stages):
    matched = [KEYED[k] for k in eval_spanset(ss)]
    fn, field, quant = next(st[1] for st in stages if st[0] == "metric")
    by = next((st[1] for st in stages if st[0] == "by"), None)
    topk = next((("topk", st[1]) for st in stages if st[0] == "topk"), None) \
        or next((("bottomk", st[1]) for st in stages if st[0] == "bottomk"),
                None)
    groups = defaultdict(list)
    hist = fn == "histogram_over_time"
    for s in matched:
        b = bucket_of(s)
        if hist:
            v = as_num(resolve(field, s))
            le = 2.0 ** math.ceil(math.log2(v))
            groups[(b, le)].append(s)
        elif by is not None:
            groups[(b, resolve(by, s))].append(s)
        else:
            groups[(b,)].append(s)
    out = defaultdict(dict)  # by-key -> {bucket: value}
    for key, ss2 in groups.items():
        b = key[0]
        if fn == "rate":
            v = len(ss2) / (STEP_NS / 1e9)
        elif fn in ("count_over_time", "histogram_over_time"):
            v = float(len(ss2))
        else:
            vals = [as_num(resolve(field, s)) for s in ss2]
            vals = [x for x in vals if x is not None]
            v = {"min_over_time": min, "max_over_time": max,
                 "avg_over_time": lambda x: sum(x) / len(x),
                 "sum_over_time": sum,
                 "quantile_over_time":
                     lambda x: percentile(x, quant)}[fn](vals)
        bk = key[1] if len(key) > 1 else None
        out[bk][b] = v
    if topk:
        mode, n = topk
        kept = defaultdict(dict)
        buckets = {b for vs in out.values() for b in vs}
        for b in buckets:
            pairs = [(bk, vs[b]) for bk, vs in out.items() if b in vs]
            pairs.sort(key=lambda kv: ((-kv[1]) if mode == "topk" else kv[1],
                                       str(kv[0])))
            for bk, v in pairs[:n]:
                kept[bk][b] = v
        out = kept
    series = [{"by": (None if bk is None else
                      (bk if hist else str(bk))),
               "values": {str(b): v for b, v in vs.items()}}
              for bk, vs in out.items()]
    series.sort(key=lambda s: "" if s["by"] is None else str(s["by"]))
    return {"kind": "metrics", "by_numeric": hist, "series": series}


def eval_compare(ss, stages):
    matched = [KEYED[k] for k in eval_spanset(ss)]
    cond, topn, t0, t1 = next(st[1] for st in stages if st[0] == "compare")
    counts = defaultdict(float)
    for s in matched:
        sel = cond_eval(cond, s) is True
        if t0 != 0:
            sel = sel and t0 <= s["start_ns"] < t1
        meta = "selection" if sel else "baseline"
        b = bucket_of(s)
        for k, v in list(s["attrs"].items()) + list(s["resource"].items()):
            counts[(meta, k, v, b)] += 1.0
    totals = defaultdict(float)
    for (meta, k, v, b), n in counts.items():
        totals[(meta, k, v)] += n
    ranks = {}
    for (meta, k, v), tot in totals.items():
        ranks.setdefault((meta, k), []).append((v, tot))
    keep = set()
    for (meta, k), vs in ranks.items():
        vs.sort(key=lambda x: (-x[1], x[0]))
        for i, (v, _) in enumerate(vs):
            if i < topn:
                keep.add((meta, k, v))
    rows = sorted([b, meta, k, v, n]
                  for (meta, k, v, b), n in counts.items()
                  if (meta, k, v) in keep)
    return {"kind": "compare", "rows": rows}


def evaluate(q, kind):
    if kind == "spans":
        p = Tok(q)
        ss = parse_spanset(p)
        if not p.done():
            raise PErr("trailing input")
        return {"kind": "spans",
                "spans": sorted(eval_spanset(ss))}
    ss, stages = parse_query(q)
    if kind == "rollup":
        return eval_rollup(ss, stages)
    if kind == "metrics":
        return eval_metrics(ss, stages)
    if kind == "compare":
        return eval_compare(ss, stages)
    raise PErr("kind %r" % kind)


# ---------------------------------------------------------------------------
# Corpus
# ---------------------------------------------------------------------------

CORPUS = [
    # --- filters ---
    ("{}", "spans"),
    ('{ name = "GET /checkout" }', "spans"),
    ('{ name != "parse" }', "spans"),
    ('{ name =~ "db\\..*" }', "spans"),
    ('{ name !~ "worker\\..*" }', "spans"),
    ("{ duration > 100ms }", "spans"),
    ("{ duration <= 50ms }", "spans"),
    ("{ duration >= 1s }", "spans"),
    ("{ status = error }", "spans"),
    ("{ status != ok }", "spans"),
    ("{ status = unset }", "spans"),
    ("{ kind = server }", "spans"),
    ("{ kind = client }", "spans"),
    ("{ kind != internal }", "spans"),
    ('{ statusMessage = "deadline exceeded" }', "spans"),
    ('{ statusMessage =~ "upstream.*" }', "spans"),
    ("{ span:id = 5 }", "spans"),
    ("{ span:parentID = 3 }", "spans"),
    ("{ trace:id = 7 }", "spans"),
    ("{ span:duration > 400ms }", "spans"),
    ('{ span:name =~ "L[0-9]" }', "spans"),
    ("{ span:status = error }", "spans"),
    ('{ span:statusMessage = "upstream 502" }', "spans"),
    ("{ span:kind = producer }", "spans"),
    ('{ .http.method = "GET" }', "spans"),
    ('{ span.http.method = "POST" }', "spans"),
    ('{ resource.service.name = "payment" }', "spans"),
    ('{ .service.name = "gateway" }', "spans"),
    ("{ .http.status_code = 200 }", "spans"),
    ("{ .http.status_code >= 400 }", "spans"),
    ('{ .http.status_code = "404" }', "spans"),
    ('{ .db.system =~ "postgres|mysql" }', "spans"),
    ('{ .db.system != "redis" }', "spans"),
    ('{ .missing.attr = "x" }', "spans"),
    ('{ .missing.attr != "x" }', "spans"),
    ('{ .missing.attr !~ ".*" }', "spans"),
    ('{ name = "db.query" && .db.system = "postgres" }', "spans"),
    ('{ .http.method = "GET" || .db.system = "redis" }', "spans"),
    ("{ !(status = error) }", "spans"),
    ('{ !(.db.system = "postgres") }', "spans"),
    ("{ (kind = server || kind = client) && duration > 50ms }", "spans"),
    ('{ .error = "true" && status = error }', "spans"),
    ("{ .retry.count >= 2 }", "spans"),
    ('{ resource.deployment.environment = "staging" }', "spans"),
    ('{ resource.host.name =~ "h[12]" }', "spans"),
    ('{ .deployment.environment != "prod" }', "spans"),
    # --- trace intrinsics ---
    ('{ rootName = "GET /checkout" }', "spans"),
    ('{ rootServiceName = "gateway" }', "spans"),
    ("{ traceDuration > 1s }", "spans"),
    ("{ trace:duration <= 200ms }", "spans"),
    ('{ trace:rootName =~ "batch.*" }', "spans"),
    ('{ trace:rootService = "inventory" }', "spans"),
    ('{ rootName = "ingest" && status = ok }', "spans"),
    # --- parent scope ---
    ('{ parent:name = "checkout.process" }', "spans"),
    ("{ parent:id = 50 }", "spans"),
    ("{ parent:duration > 400ms }", "spans"),
    ("{ parent:status = error }", "spans"),
    ('{ parent.db.system = "postgres" }', "spans"),
    ('{ parent.http.method = "GET" && .http.status_code = "404" }', "spans"),
    ('{ parent:name =~ "L[02]" }', "spans"),
    # --- event / link ---
    ('{ event:name = "exception" }', "spans"),
    ('{ event:name =~ "cache.*" }', "spans"),
    ('{ event:name != "exception" }', "spans"),
    ("{ link:traceID = 1 }", "spans"),
    ("{ link:spanID = 5 }", "spans"),
    ('{ event:name = "nope" }', "spans"),
    # --- instrumentation ---
    ('{ instrumentation:name = "io.otel.http" }', "spans"),
    ('{ instrumentation:version =~ "0\\..*" }', "spans"),
    ('{ instrumentation:name != "lib-std" }', "spans"),
    # --- structural ---
    ('{ name = "GET /checkout" } > {}', "spans"),
    ("{} > { status = error }", "spans"),
    ("{ kind = server } >> {}", "spans"),
    ('{ name = "L0" } >> { name = "L5" }', "spans"),
    ('{ name = "L5" } << {}', "spans"),
    ('{ name = "L2" } < {}', "spans"),
    ("{ status = error } < {}", "spans"),
    ('{ name = "worker.1" } ~ {}', "spans"),
    ('{ name = "worker.1" } ~ { status = error }', "spans"),
    ("{} !> {}", "spans"),
    ("{ kind = server } !> {}", "spans"),
    ('{ name = "L0" } !>> {}', "spans"),
    ('{ name = "L5" } !<< {}', "spans"),
    ('{ name = "worker.2" } !~ {}', "spans"),
    ('{ name = "GET /checkout" } > { name = "checkout.process" } > '
     '{ name = "payment.charge" }', "spans"),
    ('{ resource.service.name = "gateway" } >> { .db.system = "postgres" }',
     "spans"),
    ("{ status = error } >> { status = error }", "spans"),
    ('{ event:name = "exception" } << {}', "spans"),
    ('{} >> { name = "store" }', "spans"),
    ('{ name = "detached.work" } << {}', "spans"),
    ("{ kind = producer } > { kind = consumer }", "spans"),
    ('{ name = "handle /api" } > { name = "decode" }', "spans"),
    ('{ name = "L0" } >> {} || { name = "L0" }', "spans"),
    # --- union structural (Tempo union family; parity-plus) ---
    ('{ name = "GET /checkout" } &> {}', "spans"),
    ("{ kind = server } &> { status = error }", "spans"),
    ('{ name = "L2" } &< {}', "spans"),
    ('{ name = "L0" } &>> { name = "L5" }', "spans"),
    ('{ name = "L5" } &<< {}', "spans"),
    ('{ name = "worker.1" } &~ {}', "spans"),
    ('{ name = "worker.1" } &~ { status = error }', "spans"),
    ('{ resource.service.name = "gateway" } &>> { .db.system = "postgres" }',
     "spans"),
    ('{ .db.system = "postgres" } && { .db.system = "mysql" }', "spans"),
    ("{ status = error } && { kind = server }", "spans"),
    ('{ name = "cron.cleanup" } || { name = "ingest" }', "spans"),
    ('{ rootServiceName = "gateway" } && { event:name = "exception" }',
     "spans"),
    # --- pipeline rollups ---
    ("{} | count() > 6", "rollup"),
    ("{ status = error } | count() >= 2", "rollup"),
    ('{ name =~ "db\\..*" } | avg(duration) > 50ms', "rollup"),
    ("{} | max(duration) >= 5s", "rollup"),
    ("{ kind = client } | min(duration) < 100ms", "rollup"),
    ("{ .http.status_code >= 200 } | sum(duration) > 100ms", "rollup"),
    ("{} | by(resource.service.name)", "rollup"),
    ('{ status = error } | by(.service.name)', "rollup"),
    ("{} | select(duration)", "rollup"),
    ('{ kind = server } | by(span.http.method) | count() >= 1', "rollup"),
    ("{} | select(duration, span:id)", "rollup"),
    ('{ name =~ "worker\\..*" } | by(status)', "rollup"),
    # --- metrics ---
    ("{} | rate()", "metrics"),
    ("{} | count_over_time()", "metrics"),
    ("{ status = error } | rate()", "metrics"),
    ("{} | count_over_time() | by(resource.service.name)", "metrics"),
    ('{ .http.method = "GET" } | rate() | by(.http.status_code)', "metrics"),
    ("{} | min_over_time(duration)", "metrics"),
    ("{} | max_over_time(duration) | by(.service.name)", "metrics"),
    ('{ name =~ "db\\..*" } | avg_over_time(duration)', "metrics"),
    ("{} | sum_over_time(duration) | by(kind)", "metrics"),
    ("{} | quantile_over_time(duration, 0.5)", "metrics"),
    ("{} | quantile_over_time(duration, 0.9) | by(resource.service.name)",
     "metrics"),
    ("{} | histogram_over_time(duration)", "metrics"),
    ("{} | count_over_time() | by(resource.service.name) | topk(2)",
     "metrics"),
    ("{} | count_over_time() | by(resource.service.name) | bottomk(1)",
     "metrics"),
    ("{ kind = server } >> {} | rate()", "metrics"),
    ('{ .db.system =~ ".+" } | count_over_time() | by(.db.system)',
     "metrics"),
    ("{ .http.status_code > 0 } | avg_over_time(.http.status_code)",
     "metrics"),
    # --- compare ---
    ("{ trace:id = 7 } | compare({ status = error })", "compare"),
    ('{} | compare({ .db.system = "postgres" }, 3)', "compare"),
    ('{ resource.service.name = "gateway" } | compare({ duration > 100ms })',
     "compare"),
    ("{} | compare({ status = error }, 5, 400000000000, 540000000000)",
     "compare"),
    # --- parse/plan errors ---
    ("{ status = bogus }", "error:spans"),
    ("{ span:wat = 1 }", "error:spans"),
    ('{ name = "x" } | compare({ status = error }, 0)', "error:metrics"),
    ("{} | explode()", "error:metrics"),
    ('{ name = "x" ', "error:spans"),
]


def main():
    golden = {}
    for q, kind in CORPUS:
        if kind.startswith("error:"):
            golden[q] = {"kind": "error", "via": kind.split(":")[1]}
            continue
        golden[q] = evaluate(q, kind)
    out = {
        "step_ns": STEP_NS,
        "queries": golden,
    }
    with open(os.path.join(RES_DIR, "traceql_compliance_spans.json"),
              "w") as f:
        json.dump(SPANS, f, indent=0, sort_keys=True)
        f.write("\n")
    with open(os.path.join(RES_DIR, "traceql_compliance_golden.json"),
              "w") as f:
        json.dump(out, f, indent=0, sort_keys=True)
        f.write("\n")
    kinds = defaultdict(int)
    for _, k in CORPUS:
        kinds[k.split(":")[0]] += 1
    print("corpus: %d queries  %s" % (len(CORPUS), dict(kinds)))


if __name__ == "__main__":
    main()
