#!/usr/bin/env python3
"""Golden-result generator for the PromQL compliance corpus.

Expands the reference compliance corpus (dev/local/ch-compliance/
promql-test-queries.yml, expansion table from
internal/promcompliance/testcases/expand.go) against a deterministic
demo-service fixture, evaluates every query with an INDEPENDENT
mini-PromQL evaluator (upstream Prometheus semantics: per-step
lookback, extrapolated rates, bucketQuantile, vector matching), and
writes:

  src/test/resources/compliance_points.csv   the fixture (single source
                                             of truth for both engines)
  src/test/resources/compliance_golden.json  expected per-query results

The fixture rows are loaded into DuckDB and every per-series sample
stream is read back through SQL, so the data path the goldens are
computed from is DuckDB's, not the Scala engine's; the evaluator here
shares no code with the Spark implementation.

Run driver-side (duckdb is not a Scala-side dependency):
  python3 tools/gen_compliance_golden.py
"""
import json
import math
import os
import re
from datetime import datetime, timezone

import duckdb

HERE = os.path.dirname(os.path.abspath(__file__))
RES = os.path.join(HERE, "..", "src", "test", "resources")

LOOK_US = 300_000_000          # 5m lookback
STEP_US = 60_000_000           # query_range step: 60s
EVAL_STEPS = [60, 120, 180, 240, 300]   # seconds; the shared grid

INSTS = ["demo.promlabs.com:10000", "demo.promlabs.com:10001"]

# ---------------------------------------------------------------------------
# Fixture: 21 scrapes at ts = 15k + 2 seconds (off-step, so per-step
# lookback is actually exercised), k = 0..20.
# ---------------------------------------------------------------------------

def fixture_series():
    out = []  # (name, labels-dict, [(ts_us, value)])
    ks = list(range(21))
    ts = [15 * k + 2 for k in ks]

    def add(name, labels, f):
        out.append((name, labels, [(t * 1_000_000, f(k)) for k, t in zip(ks, ts)]))

    for ii, inst in enumerate(INSTS):
        for ti, tp in enumerate(["free", "used"]):
            add("demo_memory_usage_bytes",
                {"instance": inst, "job": "demo", "type": tp},
                lambda k, ii=ii, ti=ti:
                    (ii + 1) * 1000.0 + ti * 100.0 + (7 * k + 3 * ii + 5 * ti) % 13)
        add("demo_cpu_usage_seconds_total", {"instance": inst, "job": "demo"},
            lambda k, ii=ii: (10.0 + 3 * k if k < 12 else 2.0 + 3 * (k - 12))
                if ii == 0 else 5.0 + 4.0 * k)
        add("demo_disk_usage_bytes", {"instance": inst, "job": "demo"},
            lambda k, ii=ii: 1000.0 * (ii + 1) + 50.0 * k)
        add("demo_num_cpus", {"instance": inst, "job": "demo"},
            lambda k, ii=ii: 4.0 + 4 * ii)
        add("demo_batch_last_success_timestamp_seconds",
            {"instance": inst, "job": "demo"},
            lambda k, ii=ii: 1723500000.0 + 3600 * ii)
        bucket_f = [
            lambda k, ii=ii: (10.0 + k if ii == 0 else 5.0 + k),
            lambda k, ii=ii: (30.0 + 2 * k if ii == 0 else 20.0 + k),
            lambda k, ii=ii: (45.0 + 2 * k if ii == 0 else 30.0 + 2 * k),
            lambda k, ii=ii: (50.0 + 3 * k if ii == 0 else 40.0 + 2 * k),
        ]
        for li, le in enumerate(["0.1", "0.5", "1", "+Inf"]):
            add("demo_api_request_duration_seconds_bucket",
                {"instance": inst, "job": "demo", "le": le}, bucket_f[li])
        # _count mirrors the +Inf bucket; _sum grows linearly
        add("demo_api_request_duration_seconds_count",
            {"instance": inst, "job": "demo"}, bucket_f[3])
        add("demo_api_request_duration_seconds_sum",
            {"instance": inst, "job": "demo"},
            lambda k, ii=ii: 25.0 + 1.5 * k + 10.0 * ii)
    # staleness: live through k = 10, NaN afterwards
    add("demo_intermittent_metric", {"instance": INSTS[0], "job": "demo"},
        lambda k: 7.0 + k if k <= 10 else float("nan"))
    return out


# ---------------------------------------------------------------------------
# DuckDB-backed sample store.
# ---------------------------------------------------------------------------

class Store:
    def __init__(self, series):
        self.con = duckdb.connect()
        self.con.execute(
            "CREATE TABLE points(ts_us BIGINT, name VARCHAR, labels VARCHAR, value DOUBLE)")
        rows = []
        for name, labels, samples in series:
            lj = json.dumps(labels, sort_keys=True)
            for ts, v in samples:
                rows.append((ts, name, lj, v))
        self.con.executemany("INSERT INTO points VALUES (?, ?, ?, ?)", rows)
        # per-series streams, ordered, through SQL
        self.series = []  # (name, labels-dict, [(ts_us, v)])
        for name, lj in self.con.execute(
                "SELECT DISTINCT name, labels FROM points ORDER BY name, labels").fetchall():
            samples = self.con.execute(
                "SELECT ts_us, value FROM points WHERE name=? AND labels=? ORDER BY ts_us",
                [name, lj]).fetchall()
            self.series.append((name, json.loads(lj), [(t, v) for t, v in samples]))
        r = self.con.execute("SELECT min(ts_us), max(ts_us) FROM points").fetchone()
        self.min_ts, self.max_ts = r

    def write_csv(self, path):
        with open(path, "w") as f:
            f.write("ts_us,name,labels,value\n")
            for ts, name, lj, v in self.con.execute(
                    "SELECT ts_us, name, labels, value FROM points ORDER BY name, labels, ts_us").fetchall():
                vs = "NaN" if (v != v) else repr(v)
                f.write('%d,%s,"%s",%s\n' % (ts, name, lj.replace('"', '""'), vs))


# ---------------------------------------------------------------------------
# Mini-PromQL: lexer + Pratt parser for the corpus subset.
# ---------------------------------------------------------------------------

class PErr(Exception):
    pass


DUR = {"s": 1, "m": 60, "h": 3600, "d": 86400}


def parse_dur_us(s):
    m = re.fullmatch(r"(\d+)([smhd])", s)
    if not m:
        raise PErr("bad duration " + s)
    return int(m.group(1)) * DUR[m.group(2)] * 1_000_000


TOKEN_RE = re.compile(r"""
    \s+
  | (?P<dur>[0-9]+[smhd])
  | (?P<num>0x[0-9a-fA-F]+|[0-9]*\.[0-9]+(?:[eE][-+]?[0-9]+)?|[0-9]+(?:\.[0-9]*)?(?:[eE][-+]?[0-9]+)?)
  | (?P<str>"(?:[^"\\]|\\.)*"|'(?:[^'\\]|\\.)*')
  | (?P<id>[a-zA-Z_][a-zA-Z0-9_:]*)
  | (?P<op>==|!=|<=|>=|=~|!~|[-+*/%^()<>,={}\[\]:])
""", re.X)


def lex(q):
    toks, i = [], 0
    while i < len(q):
        m = TOKEN_RE.match(q, i)
        if not m:
            raise PErr("lex error at %r" % q[i:])
        i = m.end()
        for kind in ("num", "dur", "str", "id", "op"):
            v = m.group(kind)
            if v is not None:
                toks.append((kind, v))
                break
    toks.append(("eof", ""))
    return toks


AGG_OPS = {"sum", "avg", "max", "min", "count", "stddev", "stdvar",
           "topk", "bottomk", "quantile", "count_values", "group"}
CMP = {"==", "!=", "<", ">", "<=", ">="}


class Parser:
    def __init__(self, q):
        self.toks = lex(q)
        self.i = 0

    def peek(self):
        return self.toks[self.i]

    def next(self):
        t = self.toks[self.i]
        self.i += 1
        return t

    def expect(self, val):
        k, v = self.next()
        if v != val:
            raise PErr("expected %r got %r" % (val, v))

    # precedence: or(1) and/unless(2) cmp(3) +-(4) */%(5) ^(6, right)
    def parse(self):
        e = self.expr(1)
        if self.peek()[0] != "eof":
            raise PErr("trailing %r" % (self.peek(),))
        return e

    def expr(self, minp):
        lhs = self.unary()
        while True:
            k, v = self.peek()
            prec = None
            if v in ("or",):
                prec = 1
            elif v in ("and", "unless"):
                prec = 2
            elif v in CMP:
                prec = 3
            elif v in ("+", "-"):
                prec = 4
            elif v in ("*", "/", "%", "atan2"):
                prec = 5
            elif v == "^":
                prec = 6
            if prec is None or prec < minp:
                return lhs
            self.next()
            boolmod = False
            if self.peek()[1] == "bool":
                self.next()
                boolmod = True
            on = ignoring = None
            grp = None
            grp_labels = []
            if self.peek()[1] in ("on", "ignoring"):
                which = self.next()[1]
                labs = self.label_list()
                if which == "on":
                    on = labs
                else:
                    ignoring = labs
                if self.peek()[1] in ("group_left", "group_right"):
                    grp = self.next()[1]
                    if self.peek()[1] == "(":
                        grp_labels = self.label_list()
            nextp = prec + (0 if v == "^" else 1)
            rhs = self.expr(nextp)
            lhs = ("bin", v, lhs, rhs, boolmod, on, ignoring, grp, grp_labels)

    def label_list(self):
        self.expect("(")
        labs = []
        while self.peek()[1] != ")":
            k, v = self.next()
            if v == ",":
                continue
            labs.append(v)
        self.expect(")")
        return labs

    def unary(self):
        k, v = self.peek()
        if v == "-":
            self.next()
            # unary minus binds looser than ^ only: -1^2 = -(1^2)
            return ("neg", self.expr(6))
        if v == "+":
            self.next()
            return self.expr(6)
        return self.postfix(self.atom())

    def postfix(self, e):
        while True:
            k, v = self.peek()
            if v == "[":
                self.next()
                k2, d = self.next()
                if self.peek()[1] == ":":
                    self.next()
                    k3, st = self.next()
                    self.expect("]")
                    e = ("subquery", e, parse_dur_us(d), parse_dur_us(st))
                else:
                    self.expect("]")
                    e = ("matrix", e, parse_dur_us(d))
            elif v == "offset":
                self.next()
                neg = False
                if self.peek()[1] == "-":
                    self.next()
                    neg = True
                k2, d = self.next()
                off = parse_dur_us(d) * (-1 if neg else 1)
                e = ("offset", e, off)
            else:
                return e

    def atom(self):
        k, v = self.peek()
        if v == "(":
            self.next()
            e = self.expr(1)
            self.expect(")")
            return e
        if k == "num":
            self.next()
            return ("num", float(int(v, 16)) if v.startswith("0x") else float(v))
        if k == "id" and v in ("Inf", "inf"):
            self.next()
            return ("num", float("inf"))
        if k == "id" and v == "NaN":
            self.next()
            return ("num", float("nan"))
        if v == "{":
            return ("selector", None, self.matchers())
        if k == "id":
            self.next()
            if v in AGG_OPS:
                return self.agg(v)
            if self.peek()[1] == "(":
                # function call
                self.next()
                args = []
                while self.peek()[1] != ")":
                    if self.peek()[1] == ",":
                        self.next()
                        continue
                    if self.peek()[0] == "str":
                        args.append(("str", self.next()[1][1:-1]))
                    else:
                        args.append(self.expr(1))
                self.expect(")")
                return ("call", v, args)
            if self.peek()[1] == "{":
                return ("selector", v, self.matchers())
            return ("selector", v, [])
        raise PErr("unexpected %r" % ((k, v),))

    def matchers(self):
        self.expect("{")
        ms = []
        while self.peek()[1] != "}":
            if self.peek()[1] == ",":
                self.next()
                continue
            lk, lv = self.next()
            ok, ov = self.next()
            if ov not in ("=", "!=", "=~", "!~"):
                raise PErr("bad matcher op " + ov)
            sk, sv = self.next()
            ms.append((lv, ov, sv[1:-1]))
        self.expect("}")
        return ms

    def agg(self, op):
        by = without = None
        if self.peek()[1] in ("by", "without"):
            which = self.next()[1]
            labs = self.label_list()
            if which == "by":
                by = labs
            else:
                without = labs
        self.expect("(")
        param = None
        first = None
        if self.peek()[0] == "str":
            param = ("str", self.next()[1][1:-1])
        else:
            first = self.expr(1)
        if self.peek()[1] == ",":
            self.next()
            param = param if param is not None else first
            inner = self.expr(1)
        else:
            inner = first
        self.expect(")")
        if self.peek()[1] in ("by", "without"):
            which = self.next()[1]
            labs = self.label_list()
            if which == "by":
                by = labs
            else:
                without = labs
        return ("agg", op, by, without, param, inner)


# ---------------------------------------------------------------------------
# Evaluator: upstream semantics at one eval timestamp.
# Vector sample: (labels-dict, value, sample_ts_us). Scalar: float.
# ---------------------------------------------------------------------------

def unescape(s):
    return s.encode().decode("unicode_escape")


class Evaluator:
    def __init__(self, store):
        self.store = store

    # -- leaves ------------------------------------------------------------
    def match_series(self, name, matchers):
        out = []
        for sname, labels, samples in self.store.series:
            full = dict(labels)
            full["__name__"] = sname
            if name is not None and sname != name:
                continue
            ok = True
            for (l, op, val) in matchers:
                lv = full.get(l, "")
                if op == "=":
                    ok = lv == val
                elif op == "!=":
                    ok = lv != val
                elif op == "=~":
                    ok = re.fullmatch(val, lv) is not None
                elif op == "!~":
                    ok = re.fullmatch(val, lv) is None
                if not ok:
                    break
            if ok:
                out.append((sname, labels, samples))
        if name is None and not any(
                (l == "__name__" and op in ("=",)) for l, op, val in matchers):
            # whole-store selectors must carry at least one non-empty
            # equality-ish matcher (upstream rejects {__name__=~".*"} class)
            if all(op in ("=~", "!~") and re.fullmatch(val, "") is not None
                   for l, op, val in matchers) or not matchers:
                raise PErr("vector selector must contain at least one non-empty matcher")
        return out

    def live(self, samples):
        return [(t, v) for t, v in samples if v == v]

    def lookback(self, samples, t_us, off_us=0):
        t = t_us - off_us
        win = [(ts, v) for ts, v in self.live(samples)
               if ts <= t and ts > t - LOOK_US]
        return win[-1] if win else None

    def window(self, samples, t_us, range_us, off_us=0):
        t = t_us - off_us
        return [(ts, v) for ts, v in self.live(samples)
                if ts <= t and ts > t - range_us]

    # -- main --------------------------------------------------------------
    def eval(self, ast, t_us, off_us=0):
        """Instant evaluation at t_us → scalar float or list of samples."""
        kind = ast[0]
        if kind == "num":
            return ast[1]
        if kind == "offset":
            return self.eval(ast[1], t_us, off_us + ast[2])
        if kind == "selector":
            name, matchers = ast[1], ast[2]
            out = []
            for sname, labels, samples in self.match_series(name, matchers):
                hit = self.lookback(samples, t_us, off_us)
                if hit is not None:
                    out.append((dict(labels), hit[1], hit[0]))
            return out
        if kind == "neg":
            v = self.eval(ast[1], t_us, off_us)
            if isinstance(v, float):
                return -v
            return [(l, -x, t_us) for (l, x, _) in v]
        if kind == "call":
            return self.call(ast[1], ast[2], t_us, off_us)
        if kind == "agg":
            return self.aggregate(ast, t_us, off_us)
        if kind == "bin":
            return self.binop(ast, t_us, off_us)
        if kind == "matrix":
            raise PErr("matrix selector outside function")
        if kind == "subquery":
            raise PErr("subquery outside function")
        raise PErr("eval " + kind)

    # -- range vectors -----------------------------------------------------
    def range_windows(self, node, t_us, range_us, off_us):
        """[(labels, [(ts,v)...])] for a matrix node at t."""
        if node[0] == "selector":
            name, matchers = node[1], node[2]
            out = []
            for sname, labels, samples in self.match_series(name, matchers):
                w = self.window(samples, t_us, range_us, off_us)
                if w:
                    out.append((dict(labels), w))
            return out
        raise PErr("matrix over non-selector")

    def subquery_windows(self, inner, t_us, range_us, step_us, off_us):
        """Subquery: inner instant-evaluated on the absolute step grid."""
        t = t_us - off_us
        lo, hi = t - range_us, t
        first = (lo // step_us + 1) * step_us
        out = {}
        s = first
        while s <= hi:
            res = self.eval(inner, s)
            if isinstance(res, float):
                res = [({}, res, s)]
            for (l, v, _) in res:
                out.setdefault(json.dumps(l, sort_keys=True), (l, []))[1].append((s, v))
            s += step_us
        return [(l, w) for (l, w) in out.values()]

    def windows_of(self, node, t_us, off_us):
        if node[0] == "matrix":
            return self.range_windows(node[1], t_us, node[2], off_us), node[2]
        if node[0] == "offset":
            return self.windows_of(node[1], t_us, off_us + node[2])
        if node[0] == "subquery":
            rng, st = node[2], node[3]
            return self.subquery_windows(node[1], t_us, rng, st, off_us), rng
        raise PErr("expected range vector")

    # -- functions ---------------------------------------------------------
    def call(self, fn, args, t_us, off_us):
        if fn == "time":
            return t_us / 1e6
        if fn == "pi":
            return math.pi
        if fn == "vector":
            v = self.eval(args[0], t_us, off_us)
            return [({}, float(v), t_us)]
        if fn == "scalar":
            v = self.eval(args[0], t_us, off_us)
            return v[0][1] if isinstance(v, list) and len(v) == 1 else float("nan")
        if fn == "absent":
            v = self.eval(args[0], t_us, off_us)
            if v:
                return []
            labels = {}
            node = args[0]
            while node[0] == "offset":
                node = node[1]
            if node[0] == "selector":
                for (l, op, val) in node[2]:
                    if op == "=" and l != "__name__":
                        labels[l] = val
            return [(labels, 1.0, t_us)]
        if fn == "timestamp":
            v = self.eval(args[0], t_us, off_us)
            return [(l, ts / 1e6, t_us) for (l, x, ts) in v]
        if fn in ("sort", "sort_desc"):
            return self.eval(args[0], t_us, off_us)
        if fn in ("sort_by_label", "sort_by_label_desc"):
            return self.eval(args[0], t_us, off_us)
        if fn == "label_replace":
            v = self.eval(args[0], t_us, off_us)
            dst, repl, src, regex = (unescape(a[1]) for a in args[1:5])
            try:
                cre = re.compile(regex)
            except re.error:
                raise PErr("invalid regex")
            # go-style \$1 refs
            out = []
            for (l, x, ts) in v:
                m = cre.fullmatch(l.get(src, ""))
                nl = dict(l)
                if m is not None:
                    val = re.sub(r"\$(\d+)",
                                 lambda g: m.group(int(g.group(1))) or "",
                                 repl)
                    if val == "":
                        nl.pop(dst, None)
                    else:
                        nl[dst] = val
                out.append((nl, x, ts))
            return out
        if fn == "label_join":
            v = self.eval(args[0], t_us, off_us)
            dst, sep = unescape(args[1][1]), unescape(args[2][1])
            srcs = [unescape(a[1]) for a in args[3:]]
            out = []
            for (l, x, ts) in v:
                nl = dict(l)
                val = sep.join(l.get(s, "") for s in srcs)
                if val == "":
                    nl.pop(dst, None)
                else:
                    nl[dst] = val
                out.append((nl, x, ts))
            return out
        if fn == "histogram_quantile":
            q = self.as_scalar(args[0], t_us, off_us)
            v = self.eval(args[1], t_us, off_us)
            return self.hist_quantile(q, v, t_us)
        if fn in ("clamp", "clamp_min", "clamp_max"):
            v = self.eval(args[0], t_us, off_us)
            if fn == "clamp":
                lo = self.as_scalar(args[1], t_us, off_us)
                hi = self.as_scalar(args[2], t_us, off_us)
                if lo > hi:
                    return [(l, float("nan"), t_us) for (l, x, _) in v]
                return [(l, min(hi, max(lo, x)), t_us) for (l, x, _) in v]
            b = self.as_scalar(args[1], t_us, off_us)
            f = (lambda x: max(b, x)) if fn == "clamp_min" else (lambda x: min(b, x))
            return [(l, f(x), t_us) for (l, x, _) in v]
        if fn == "round":
            v = self.eval(args[0], t_us, off_us)
            to = self.as_scalar(args[1], t_us, off_us) if len(args) > 1 else 1.0
            return [(l, math.floor(x / to + 0.5) * to, t_us) for (l, x, _) in v]
        simple = {
            "abs": abs, "ceil": math.ceil, "floor": math.floor,
            "exp": math.exp, "sqrt": self.safe(math.sqrt),
            "ln": self.safe(math.log), "log2": self.safe(math.log2),
            "log10": self.safe(math.log10), "sgn": lambda x: float((x > 0) - (x < 0)),
            "sin": math.sin, "cos": math.cos, "tan": math.tan,
            "asin": self.safe(math.asin), "acos": self.safe(math.acos),
            "atan": math.atan, "sinh": math.sinh, "cosh": math.cosh,
            "tanh": math.tanh, "deg": math.degrees, "rad": math.radians,
        }
        if fn in simple:
            v = self.eval(args[0], t_us, off_us)
            f = simple[fn]

            def app(x):
                try:
                    return f(x)
                except OverflowError:
                    # Go math returns ±Inf where python raises
                    if fn == "sinh":
                        return math.copysign(float("inf"), x)
                    return float("inf")
            return [(l, app(x), t_us) for (l, x, _) in v]
        date_fns = {
            "minute": lambda d: float(d.minute),
            "hour": lambda d: float(d.hour),
            "day_of_week": lambda d: float(d.isoweekday() % 7),
            "day_of_month": lambda d: float(d.day),
            "day_of_year": lambda d: float(d.timetuple().tm_yday),
            "days_in_month": lambda d: float(
                (d.replace(month=d.month % 12 + 1, day=1,
                           year=d.year + (1 if d.month == 12 else 0))
                 - d.replace(day=1)).days),
            "month": lambda d: float(d.month),
            "year": lambda d: float(d.year),
        }
        if fn in date_fns:
            f = date_fns[fn]
            if not args:
                d = datetime.fromtimestamp(t_us / 1e6, tz=timezone.utc)
                return [({}, f(d), t_us)]
            v = self.eval(args[0], t_us, off_us)
            return [(l, f(datetime.fromtimestamp(x, tz=timezone.utc)), t_us)
                    for (l, x, _) in v]
        # range-vector functions
        if fn in ("rate", "increase", "delta", "irate", "idelta", "deriv",
                  "predict_linear", "resets", "changes", "holt_winters",
                  "double_exponential_smoothing",
                  "sum_over_time", "avg_over_time", "max_over_time",
                  "min_over_time", "count_over_time", "stddev_over_time",
                  "stdvar_over_time", "last_over_time", "first_over_time",
                  "present_over_time", "absent_over_time",
                  "quantile_over_time", "mad_over_time",
                  "ts_of_min_over_time", "ts_of_max_over_time",
                  "ts_of_last_over_time"):
            return self.range_fn(fn, args, t_us, off_us)
        raise PErr("fn " + fn)

    def safe(self, f):
        def g(x):
            try:
                return f(x)
            except ValueError:
                return float("nan")
        return g

    def as_scalar(self, node, t_us, off_us):
        v = self.eval(node, t_us, off_us)
        if isinstance(v, float):
            return v
        raise PErr("scalar arg expected")

    def range_fn(self, fn, args, t_us, off_us):
        if fn in ("ts_of_min_over_time", "ts_of_max_over_time",
                  "ts_of_last_over_time"):
            # upstream experimental: timestamp (s) of the extreme/last
            # sample; updates on >= / <= so the MOST RECENT tied
            # extreme wins
            wins, rng = self.windows_of(args[0], t_us, off_us)
            out = []
            for l, w in wins:
                if fn == "ts_of_last_over_time":
                    ts = max(t for t, _ in w)
                elif fn == "ts_of_max_over_time":
                    ts = max(w, key=lambda p: (p[1], p[0]))[0]
                else:
                    ts = max(w, key=lambda p: (-p[1], p[0]))[0]
                out.append((l, ts / 1e6, t_us))
            return out
        if fn == "quantile_over_time":
            phi = self.as_scalar(args[0], t_us, off_us)
            wins, rng = self.windows_of(args[1], t_us, off_us)
            return [(l, prom_quantile(phi, [v for _, v in w]), t_us)
                    for l, w in wins]
        if fn in ("holt_winters", "double_exponential_smoothing"):
            wins, rng = self.windows_of(args[0], t_us, off_us)
            sf = self.as_scalar(args[1], t_us, off_us)
            tf = self.as_scalar(args[2], t_us, off_us)
            out = []
            for l, w in wins:
                vs = [v for _, v in w]
                if len(vs) < 2:
                    continue
                s1 = vs[0]
                b = vs[1] - vs[0]
                for i in range(1, len(vs)):
                    s0 = s1
                    s1 = sf * vs[i] + (1 - sf) * (s1 + b)
                    b = tf * (s1 - s0) + (1 - tf) * b
                out.append((l, s1, t_us))
            return out
        if fn == "predict_linear":
            wins, rng = self.windows_of(args[0], t_us, off_us)
            horizon = self.as_scalar(args[1], t_us, off_us)
            out = []
            for l, w in wins:
                if len(w) < 2:
                    continue
                slope, intercept = linreg(w, t_us)
                out.append((l, intercept + slope * horizon, t_us))
            return out
        wins, rng = self.windows_of(args[0], t_us, off_us)
        out = []
        if fn == "absent_over_time":
            if wins:
                return []
            labels = {}
            node = args[0]
            while node[0] in ("offset", "matrix", "subquery"):
                node = node[1]
            if node[0] == "selector":
                for (l, op, val) in node[2]:
                    if op == "=" and l != "__name__":
                        labels[l] = val
            return [(labels, 1.0, t_us)]
        for l, w in wins:
            vs = [v for _, v in w]
            n = len(vs)
            if fn in ("rate", "increase", "delta"):
                if n < 2:
                    continue
                v = extrapolated(w, rng, t_us - off_us,
                                 is_counter=fn != "delta", is_rate=fn == "rate")
                out.append((l, v, t_us))
            elif fn in ("irate", "idelta"):
                if n < 2:
                    continue
                (pt, pv), (lt, lv) = w[-2], w[-1]
                if fn == "irate":
                    dv = lv if lv < pv else lv - pv
                    out.append((l, dv / ((lt - pt) / 1e6), t_us))
                else:
                    out.append((l, lv - pv, t_us))
            elif fn == "deriv":
                if n < 2:
                    continue
                out.append((l, linreg(w, t_us)[0], t_us))
            elif fn == "resets":
                out.append((l, float(sum(1 for a, b in zip(vs, vs[1:]) if b < a)), t_us))
            elif fn == "changes":
                out.append((l, float(sum(1 for a, b in zip(vs, vs[1:]) if b != a)), t_us))
            elif fn == "sum_over_time":
                out.append((l, sum(vs), t_us))
            elif fn == "avg_over_time":
                out.append((l, sum(vs) / n, t_us))
            elif fn == "max_over_time":
                out.append((l, max(vs), t_us))
            elif fn == "min_over_time":
                out.append((l, min(vs), t_us))
            elif fn == "count_over_time":
                out.append((l, float(n), t_us))
            elif fn == "last_over_time":
                out.append((l, vs[-1], t_us))
            elif fn == "first_over_time":
                out.append((l, vs[0], t_us))
            elif fn == "present_over_time":
                out.append((l, 1.0, t_us))
            elif fn == "stddev_over_time":
                m = sum(vs) / n
                out.append((l, math.sqrt(sum((x - m) ** 2 for x in vs) / n), t_us))
            elif fn == "stdvar_over_time":
                m = sum(vs) / n
                out.append((l, sum((x - m) ** 2 for x in vs) / n, t_us))
            elif fn == "mad_over_time":
                med = prom_quantile(0.5, vs)
                out.append((l, prom_quantile(0.5, [abs(x - med) for x in vs]), t_us))
            else:
                raise PErr("range fn " + fn)
        return out

    def hist_quantile(self, q, samples, t_us):
        groups = {}
        for (l, v, _) in samples:
            if "le" not in l:
                continue
            le = l["le"]
            lev = float("inf") if le in ("+Inf", "Inf") else float(le)
            key_labels = {k: x for k, x in l.items() if k != "le"}
            key = json.dumps(key_labels, sort_keys=True)
            groups.setdefault(key, (key_labels, []))[1].append((lev, v))
        out = []
        for key, (labels, buckets) in groups.items():
            buckets.sort()
            if len(buckets) < 2 or not math.isinf(buckets[-1][0]):
                continue
            out.append((labels, bucket_quantile(q, buckets), t_us))
        return out

    # -- aggregation -------------------------------------------------------
    def aggregate(self, ast, t_us, off_us):
        _, op, by, without, param, inner = ast
        v = self.eval(inner, t_us, off_us)
        if isinstance(v, float):
            raise PErr("agg over scalar")
        if op == "count_values":
            dst = unescape(param[1])
            groups = {}
            for (l, x, _) in v:
                key_labels = group_labels(l, by, without)
                key_labels = dict(key_labels)
                key_labels[dst] = fmt_go(x)
                key = json.dumps(key_labels, sort_keys=True)
                groups.setdefault(key, (key_labels, 0))
                groups[key] = (key_labels, groups[key][1] + 1)
            return [(l, float(n), t_us) for (l, n) in groups.values()]
        if op in ("topk", "bottomk"):
            k = int(self.as_scalar(param, t_us, off_us))
            groups = {}
            for (l, x, ts) in v:
                key = json.dumps(group_labels(l, by, without), sort_keys=True)
                groups.setdefault(key, []).append((l, x, ts))
            out = []
            for g in groups.values():
                # NaN never ranks into topk/bottomk (upstream heap semantics)
                live = [s for s in g if s[1] == s[1]]
                live.sort(key=lambda s: s[1], reverse=(op == "topk"))
                out.extend(live[:k])
            return [(l, x, t_us) for (l, x, ts) in out]
        groups = {}
        for (l, x, _) in v:
            gl = group_labels(l, by, without)
            key = json.dumps(gl, sort_keys=True)
            groups.setdefault(key, (gl, []))[1].append(x)
        out = []
        for gl, xs in groups.values():
            if op == "sum":
                r = sum(xs)
            elif op == "avg":
                r = sum(xs) / len(xs)
            elif op == "max":
                r = max(xs)
            elif op == "min":
                r = min(xs)
            elif op == "count":
                r = float(len(xs))
            elif op == "group":
                r = 1.0
            elif op in ("stddev", "stdvar"):
                m = sum(xs) / len(xs)
                var = sum((x - m) ** 2 for x in xs) / len(xs)
                r = math.sqrt(var) if op == "stddev" else var
            elif op == "quantile":
                phi = self.as_scalar(param, t_us, off_us)
                r = prom_quantile(phi, xs)
            else:
                raise PErr("agg " + op)
            out.append((gl, r, t_us))
        return out

    # -- binary operators ----------------------------------------------------
    def binop(self, ast, t_us, off_us):
        _, op, ln, rn, boolmod, on, ignoring, grp, grp_labels = ast
        lv = self.eval(ln, t_us, off_us)
        rv = self.eval(rn, t_us, off_us)
        sl, sr = isinstance(lv, float), isinstance(rv, float)
        if sl and sr:
            if op in CMP:
                r = 1.0 if scalar_cmp(op, lv, rv) else 0.0
                return r
            return scalar_arith(op, lv, rv)
        if op in ("and", "or", "unless"):
            return self.setop(op, lv, rv, on, ignoring, t_us)
        if sl or sr:
            vec, scal, scal_left = (rv, lv, True) if sl else (lv, rv, False)
            out = []
            for (l, x, ts) in vec:
                a, b = (scal, x) if scal_left else (x, scal)
                if op in CMP:
                    if boolmod:
                        out.append((l, 1.0 if scalar_cmp(op, a, b) else 0.0, t_us))
                    elif scalar_cmp(op, a, b):
                        out.append((l, x, t_us))
                else:
                    out.append((l, scalar_arith(op, a, b), t_us))
            return out
        # vector-vector
        def mkey(l):
            if on is not None:
                return json.dumps({k: l[k] for k in on if k in l}, sort_keys=True)
            ig = set(ignoring or [])
            return json.dumps({k: v for k, v in l.items() if k not in ig},
                              sort_keys=True)
        right = {}
        for (l, x, ts) in rv:
            k = mkey(l)
            right.setdefault(k, []).append((l, x))
        out = []
        for (l, x, ts) in lv:
            k = mkey(l)
            matches = right.get(k)
            if not matches:
                continue
            if grp is None and len(matches) > 1:
                raise PErr("many-to-many")
            for (rl, rx) in matches[:1] if grp is None else matches:
                a, b = (x, rx) if grp != "group_right" else (x, rx)
                if grp == "group_right":
                    base = dict(rl)
                else:
                    base = dict(l)
                if on is not None and grp is None:
                    base = {k2: l[k2] for k2 in on if k2 in l}
                for gl2 in grp_labels:
                    src = rl if grp == "group_left" else l
                    if gl2 in src:
                        base[gl2] = src[gl2]
                    else:
                        base.pop(gl2, None)
                if op in CMP:
                    if boolmod:
                        out.append((base, 1.0 if scalar_cmp(op, a, b) else 0.0, t_us))
                    elif scalar_cmp(op, a, b):
                        out.append((base, x, t_us))
                else:
                    out.append((base, scalar_arith(op, a, b), t_us))
        return out

    def setop(self, op, lv, rv, on, ignoring, t_us):
        def mkey(l):
            if on is not None:
                return json.dumps({k: l[k] for k in on if k in l}, sort_keys=True)
            ig = set(ignoring or [])
            return json.dumps({k: v for k, v in l.items() if k not in ig},
                              sort_keys=True)
        rkeys = {mkey(l) for (l, x, ts) in rv}
        if op == "and":
            return [(l, x, t_us) for (l, x, ts) in lv if mkey(l) in rkeys]
        if op == "unless":
            return [(l, x, t_us) for (l, x, ts) in lv if mkey(l) not in rkeys]
        lkeys = {mkey(l) for (l, x, ts) in lv}
        return ([(l, x, t_us) for (l, x, ts) in lv] +
                [(l, x, t_us) for (l, x, ts) in rv if mkey(l) not in lkeys])


def group_labels(l, by, without):
    if by is not None:
        return {k: l[k] for k in by if k in l}
    if without is not None:
        return {k: v for k, v in l.items() if k not in without}
    return {}


def scalar_arith(op, a, b):
    if op == "+":
        return a + b
    if op == "-":
        return a - b
    if op == "*":
        return a * b
    if op == "/":
        if b == 0:
            return float("inf") if a > 0 else float("-inf") if a < 0 else float("nan")
        return a / b
    if op == "%":
        return math.fmod(a, b) if b != 0 else float("nan")
    if op == "^":
        try:
            return math.pow(a, b)
        except OverflowError:
            # IEEE pow overflow → ±Inf (Go math.Pow semantics)
            return float("inf") if a > 1 or a < -1 else 0.0
    if op == "atan2":
        return math.atan2(a, b)
    raise PErr("arith " + op)


def scalar_cmp(op, a, b):
    if op == "==":
        return a == b
    if op == "!=":
        return a != b
    if op == "<":
        return a < b
    if op == ">":
        return a > b
    if op == "<=":
        return a <= b
    if op == ">=":
        return a >= b
    raise PErr("cmp " + op)


def prom_quantile(phi, vs):
    if not vs:
        return float("nan")
    if phi != phi:
        return float("nan")
    if phi < 0:
        return float("-inf")
    if phi > 1:
        return float("inf")
    s = sorted(vs)
    n = len(s)
    rank = phi * (n - 1)
    lo = s[max(0, int(math.floor(rank)))]
    hi = s[min(n - 1, int(math.floor(rank)) + 1)]
    return lo + (hi - lo) * (rank - math.floor(rank))


def bucket_quantile(q, buckets):
    """Upstream bucketQuantile over ascending (le, cumulative)."""
    if q != q:
        return float("nan")
    if q < 0:
        return float("-inf")
    if q > 1:
        return float("inf")
    total = buckets[-1][1]
    if total == 0:
        return float("nan")
    rank = q * total
    idx = next(i for i, (le, c) in enumerate(buckets) if c >= rank)
    le, c = buckets[idx]
    if math.isinf(le):
        return buckets[-2][0]
    prev_le, prev_c = (0.0, 0.0) if idx == 0 else buckets[idx - 1]
    if c == prev_c:
        return le
    return prev_le + (le - prev_le) * (rank - prev_c) / (c - prev_c)


def extrapolated(samples, range_us, end_us, is_counter, is_rate):
    """Upstream extrapolatedRate (promql/functions.go)."""
    start_s = (end_us - range_us) / 1e6
    end_s = end_us / 1e6
    first, last = samples[0], samples[-1]
    delta = last[1] - first[1]
    if is_counter:
        prev = first[1]
        for (_, v) in samples[1:]:
            if v < prev:
                delta += prev
            prev = v
    sampled = (last[0] - first[0]) / 1e6
    avg_between = sampled / (len(samples) - 1)
    dur_to_start = first[0] / 1e6 - start_s
    dur_to_end = end_s - last[0] / 1e6
    if is_counter and delta > 0 and first[1] >= 0:
        dur_to_zero = sampled * (first[1] / delta)
        if dur_to_zero < dur_to_start:
            dur_to_start = dur_to_zero
    threshold = avg_between * 1.1
    if dur_to_start >= threshold:
        dur_to_start = avg_between / 2
    if dur_to_end >= threshold:
        dur_to_end = avg_between / 2
    factor = (sampled + dur_to_start + dur_to_end) / sampled
    return delta * factor / (range_us / 1e6) if is_rate else delta * factor


def linreg(samples, t_us):
    """Upstream linearRegression: intercept anchored at eval ts."""
    xs = [(ts - t_us) / 1e6 for ts, _ in samples]
    ys = [v for _, v in samples]
    n = float(len(xs))
    mx, my = sum(xs) / n, sum(ys) / n
    den = sum((x - mx) ** 2 for x in xs)
    if den == 0:
        return 0.0, my
    slope = sum((x - mx) * (y - my) for x, y in zip(xs, ys)) / den
    return slope, my - slope * mx


def fmt_go(v):
    """Go strconv.FormatFloat(v, 'f', -1, 64) for the fixture's range."""
    if v == int(v) and abs(v) < 1e15:
        return str(int(v))
    return repr(v)


# ---------------------------------------------------------------------------
# Corpus: templates (faithful to promql-test-queries.yml) + expansion.
# ---------------------------------------------------------------------------

VARIANTS = {
    "range": ["1s", "15s", "1m", "5m", "15m", "1h"],  # the tester's full set
    "offset": ["1m", "5m", "10m"],
    "simpleAggrOp": ["sum", "avg", "max", "min", "count", "stddev", "stdvar"],
    "simpleTimeAggrOp": ["sum", "avg", "max", "min", "count", "stddev",
                         "stdvar", "absent", "last"],
    "topBottomOp": ["topk", "bottomk"],
    "quantile": ["-0.5", "0.1", "0.5", "0.75", "0.95", "0.90", "0.99", "1", "1.5"],
    "arithBinOp": ["+", "-", "*", "/", "%", "^"],
    "compBinOp": ["==", "!=", "<", ">", "<=", ">="],
    "binOp": ["+", "-", "*", "/", "%", "^", "==", "!=", "<", ">", "<=", ">="],
    "simpleMathFunc": ["abs", "ceil", "floor", "exp", "sqrt", "ln", "log2",
                       "log10", "round"],
    "extrapolatedRateFunc": ["delta", "rate", "increase"],
    "clampFunc": ["clamp_min", "clamp_max"],
    "instantRateFunc": ["idelta", "irate"],
    "dateFunc": ["day_of_month", "day_of_week", "days_in_month", "hour",
                 "minute", "month", "year"],
}

# (template, variant_args, should_fail)
TEMPLATES = [
    ("42", [], False),
    ("1.234", [], False),
    (".123", [], False),
    ("1.23e-3", [], False),
    ("0x3d", [], False),
    ("Inf", [], False),
    ("+Inf", [], False),
    ("-Inf", [], False),
    ("NaN", [], False),
    ("demo_memory_usage_bytes", [], False),
    ('{__name__="demo_memory_usage_bytes"}', [], False),
    ('demo_memory_usage_bytes{type="free"}', [], False),
    ('demo_memory_usage_bytes{type!="free"}', [], False),
    ('demo_memory_usage_bytes{instance=~"demo.promlabs.com:.*"}', [], False),
    ('demo_memory_usage_bytes{instance=~"host"}', [], False),
    ('demo_memory_usage_bytes{instance!~".*:10000"}', [], False),
    ('demo_memory_usage_bytes{type="free", instance!="demo.promlabs.com:10000"}', [], False),
    ('{type="free", instance!="demo.promlabs.com:10000"}', [], False),
    ('{__name__=~".*"}', [], True),
    ("nonexistent_metric_name", [], False),
    ("demo_memory_usage_bytes offset {{.offset}}", ["offset"], False),
    ("demo_memory_usage_bytes offset -{{.offset}}", ["offset"], False),
    ("demo_intermittent_metric", [], False),
    ("{{.simpleAggrOp}}(demo_memory_usage_bytes)", ["simpleAggrOp"], False),
    ("{{.simpleAggrOp}}(nonexistent_metric_name)", ["simpleAggrOp"], False),
    ("{{.simpleAggrOp}} by() (demo_memory_usage_bytes)", ["simpleAggrOp"], False),
    ("{{.simpleAggrOp}} by(instance) (demo_memory_usage_bytes)", ["simpleAggrOp"], False),
    ("{{.simpleAggrOp}} by(instance, type) (demo_memory_usage_bytes)", ["simpleAggrOp"], False),
    ("{{.simpleAggrOp}} by(nonexistent) (demo_memory_usage_bytes)", ["simpleAggrOp"], False),
    ("{{.simpleAggrOp}} without() (demo_memory_usage_bytes)", ["simpleAggrOp"], False),
    ("{{.simpleAggrOp}} without(instance) (demo_memory_usage_bytes)", ["simpleAggrOp"], False),
    ("{{.simpleAggrOp}} without(instance, type) (demo_memory_usage_bytes)", ["simpleAggrOp"], False),
    ("{{.simpleAggrOp}} without(nonexistent) (demo_memory_usage_bytes)", ["simpleAggrOp"], False),
    ("{{.topBottomOp}} (3, demo_memory_usage_bytes)", ["topBottomOp"], False),
    ("{{.topBottomOp}} by(instance) (2, demo_memory_usage_bytes)", ["topBottomOp"], False),
    ("{{.topBottomOp}} without(instance) (2, demo_memory_usage_bytes)", ["topBottomOp"], False),
    ("{{.topBottomOp}} without() (2, demo_memory_usage_bytes)", ["topBottomOp"], False),
    ("quantile({{.quantile}}, demo_memory_usage_bytes)", ["quantile"], False),
    ("avg(max by(type) (demo_memory_usage_bytes))", [], False),
    ("1 * 2 + 4 / 6 - 10 % 2 ^ 2", [], False),
    ("demo_num_cpus + (1 {{.compBinOp}} bool 2)", ["compBinOp"], False),
    ("demo_memory_usage_bytes {{.binOp}} 1.2345", ["binOp"], False),
    ("demo_memory_usage_bytes {{.compBinOp}} bool 1.2345", ["compBinOp"], False),
    ("1.2345 {{.compBinOp}} bool demo_memory_usage_bytes", ["compBinOp"], False),
    ("0.12345 {{.binOp}} demo_memory_usage_bytes", ["binOp"], False),
    ("(1 * 2 + 4 / 6 - (10%7)^2) {{.binOp}} demo_memory_usage_bytes", ["binOp"], False),
    ("demo_memory_usage_bytes {{.binOp}} (1 * 2 + 4 / 6 - 10)", ["binOp"], False),
    ("timestamp(demo_memory_usage_bytes * 1)", [], False),
    ("timestamp(-demo_memory_usage_bytes)", [], False),
    ("demo_memory_usage_bytes {{.binOp}} on(instance, job, type) demo_memory_usage_bytes", ["binOp"], False),
    ("sum by(instance, type) (demo_memory_usage_bytes) {{.binOp}} on(instance, type) group_left(job) demo_memory_usage_bytes", ["binOp"], False),
    ("demo_memory_usage_bytes {{.compBinOp}} bool on(instance, job, type) demo_memory_usage_bytes", ["compBinOp"], False),
    ("demo_memory_usage_bytes / on(instance, job, type, __name__) demo_memory_usage_bytes", [], False),
    ("sum without(job) (demo_memory_usage_bytes) / on(instance, type) demo_memory_usage_bytes", [], False),
    ("sum without(job) (demo_memory_usage_bytes) / on(instance, type) group_left demo_memory_usage_bytes", [], False),
    ("sum without(job) (demo_memory_usage_bytes) / on(instance, type) group_left(job) demo_memory_usage_bytes", [], False),
    ("demo_memory_usage_bytes / on(instance, job) group_left demo_num_cpus", [], False),
    ("demo_memory_usage_bytes / on(instance, type, job, non_existent) demo_memory_usage_bytes", [], False),
    ("demo_num_cpus * Inf", [], False),
    ("demo_num_cpus * -Inf", [], False),
    ("demo_num_cpus * NaN", [], False),
    ("demo_memory_usage_bytes + -(1)", [], False),
    ("-demo_memory_usage_bytes", [], False),
    ("-1 ^ 2", [], False),
    ("1 {{.arithBinOp}} time()", ["arithBinOp"], False),
    ("time() {{.arithBinOp}} 1", ["arithBinOp"], False),
    ("time() {{.compBinOp}} bool 1", ["compBinOp"], False),
    ("1 {{.compBinOp}} bool time()", ["compBinOp"], False),
    ("time() {{.arithBinOp}} time()", ["arithBinOp"], False),
    ("time() {{.compBinOp}} bool time()", ["compBinOp"], False),
    ("time() {{.binOp}} demo_memory_usage_bytes", ["binOp"], False),
    ("demo_memory_usage_bytes {{.binOp}} time()", ["binOp"], False),
    ("{{.simpleTimeAggrOp}}_over_time(demo_memory_usage_bytes[{{.range}}])",
     ["simpleTimeAggrOp", "range"], False),
    ("quantile_over_time({{.quantile}}, demo_memory_usage_bytes[{{.range}}])",
     ["quantile", "range"], False),
    ("timestamp(demo_num_cpus)", [], False),
    ("timestamp(timestamp(demo_num_cpus))", [], False),
    ("{{.simpleMathFunc}}(demo_memory_usage_bytes)", ["simpleMathFunc"], False),
    ("{{.simpleMathFunc}}(-demo_memory_usage_bytes)", ["simpleMathFunc"], False),
    ("{{.extrapolatedRateFunc}}(nonexistent_metric[5m])", ["extrapolatedRateFunc"], False),
    ("{{.extrapolatedRateFunc}}(demo_cpu_usage_seconds_total[{{.range}}])",
     ["extrapolatedRateFunc", "range"], False),
    ("deriv(demo_disk_usage_bytes[{{.range}}])", ["range"], False),
    ("predict_linear(demo_disk_usage_bytes[{{.range}}], 600)", ["range"], False),
    ("time()", [], False),
    ('label_replace(demo_num_cpus, "job", "destination-value-$1", "instance", "demo.promlabs.com:(.*)")', [], False),
    ('label_replace(demo_num_cpus, "job", "destination-value-$1", "instance", "host:(.*)")', [], False),
    ('label_replace(demo_num_cpus, "job", "$1-$2", "instance", "local(.*):(.*)")', [], False),
    ('label_replace(demo_num_cpus, "job", "value-$1", "nonexistent-src", "source-value-(.*)")', [], False),
    ('label_replace(demo_num_cpus, "job", "value-$1", "nonexistent-src", "(.*)")', [], False),
    ('label_replace(demo_num_cpus, "job", "value-$1", "instance", "non-matching-regex")', [], False),
    ('label_replace(demo_num_cpus, "job", "", "dst", ".*")', [], False),
    ('label_replace(demo_num_cpus, "job", "value-$1", "src", "(.*")', [], True),
    ('label_join(demo_num_cpus, "new_label", "-", "instance", "job")', [], False),
    ('label_join(demo_num_cpus, "job", "-", "instance", "job")', [], False),
    ('label_join(demo_num_cpus, "job", "-", "instance")', [], False),
    ("{{.dateFunc}}()", ["dateFunc"], False),
    ("{{.dateFunc}}(demo_batch_last_success_timestamp_seconds offset {{.offset}})",
     ["dateFunc", "offset"], False),
    ("{{.instantRateFunc}}(demo_cpu_usage_seconds_total[{{.range}}])",
     ["instantRateFunc", "range"], False),
    ("{{.clampFunc}}(demo_memory_usage_bytes, 2)", ["clampFunc"], False),
    ("clamp(demo_memory_usage_bytes, 0, 1)", [], False),
    ("clamp(demo_memory_usage_bytes, 0, 1000000000000)", [], False),
    ("clamp(demo_memory_usage_bytes, 1000000000000, 0)", [], False),
    ("clamp(demo_memory_usage_bytes, 1000000000000, 1000000000000)", [], False),
    ("resets(demo_cpu_usage_seconds_total[{{.range}}])", ["range"], False),
    ("changes(demo_batch_last_success_timestamp_seconds[{{.range}}])", ["range"], False),
    ("vector(1.23)", [], False),
    ("vector(time())", [], False),
    ("histogram_quantile({{.quantile}}, rate(demo_api_request_duration_seconds_bucket[1m]))",
     ["quantile"], False),
    ("histogram_quantile(0.9, nonexistent_metric)", [], False),
    ("histogram_quantile(0.9, demo_memory_usage_bytes)", [], False),
    ('histogram_quantile(0.9, {__name__=~"demo_api_request_duration_seconds_.+"})', [], False),
    ('count_values("value", demo_api_request_duration_seconds_bucket)', [], False),
    ("absent(demo_memory_usage_bytes)", [], False),
    ("absent(nonexistent_metric_name)", [], False),
    ("max_over_time((time() - max(demo_batch_last_success_timestamp_seconds) < 1000)[5m:10s] offset 5m)", [], False),
    ("avg_over_time(rate(demo_cpu_usage_seconds_total[1m])[2m:10s])", [], False),
    ("ts_of_max_over_time(demo_memory_usage_bytes[{{.range}}])", ["range"], False),
    ("ts_of_min_over_time(demo_memory_usage_bytes[{{.range}}])", ["range"], False),
    ("ts_of_last_over_time(demo_memory_usage_bytes[{{.range}}])", ["range"], False),
    ("sum(ts_of_max_over_time(demo_cpu_usage_seconds_total[5m]))", [], False),
]


def expand(template, variant_args):
    if not variant_args:
        return [template]
    arg = variant_args[0]
    rest = variant_args[1:]
    out = []
    for val in VARIANTS[arg]:
        out.extend(expand(template.replace("{{.%s}}" % arg, val), rest))
    return out


# Queries the Spark engine intentionally does not serve, with reasons.
# The ledger spec pins this set; an entry leaving it must start passing.
UNSUPPORTED = {
    # none at generation time; populated only if a corpus feature is
    # deliberately out of scope (the spec asserts this stays in sync)
}


def main():
    store = Store(fixture_series())
    os.makedirs(RES, exist_ok=True)
    store.write_csv(os.path.join(RES, "compliance_points.csv"))
    ev = Evaluator(store)

    golden = {}
    n_exec = n_err = 0
    for template, vargs, should_fail in TEMPLATES:
        for q in expand(template, vargs):
            if q in golden:
                continue
            if q in UNSUPPORTED:
                golden[q] = {"unsupported": UNSUPPORTED[q]}
                continue
            if should_fail:
                golden[q] = {"expect_error": True}
                n_err += 1
                continue
            try:
                ast = Parser(q).parse()
            except PErr as e:
                raise SystemExit("parse failed for %r: %s" % (q, e))
            series = {}
            for s in EVAL_STEPS:
                t_us = s * 1_000_000
                try:
                    res = ev.eval(ast, t_us)
                except PErr as e:
                    raise SystemExit("eval failed for %r: %s" % (q, e))
                if isinstance(res, float):
                    res = [({}, res, t_us)]
                for (l, v, _) in res:
                    key = json.dumps(l, sort_keys=True)
                    series.setdefault(key, (l, []))[1].append((s, v))
            golden[q] = {"series": [
                {"metric": l, "values": [[s, fmt_val(v)] for s, v in vals]}
                for l, vals in (series[k] for k in sorted(series))]}
            n_exec += 1
    out = os.path.join(RES, "compliance_golden.json")
    with open(out, "w") as f:
        json.dump(golden, f, indent=0, sort_keys=True)
    print("wrote %s: %d executed, %d expect-error, %d unsupported"
          % (out, n_exec, n_err, len(UNSUPPORTED)))


def fmt_val(v):
    if v != v:
        return "NaN"
    if v == float("inf"):
        return "Inf"
    if v == float("-inf"):
        return "-Inf"
    return repr(v)


if __name__ == "__main__":
    main()
