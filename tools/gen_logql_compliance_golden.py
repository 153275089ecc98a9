#!/usr/bin/env python3
"""Golden-result generator for the LogQL compliance corpus.

Expands the reference corpus (dev/local/ch-logql-compliance/
logql-test-queries.yml; variant table internal/lokicompliance/
expand.go) against a deterministic access-log fixture and evaluates
every query with an INDEPENDENT mini-LogQL evaluator (upstream Loki
semantics: stream selectors, line filters incl. ip(), json/regexp/
pattern extractors, label filters with duration/bytes/ip typing,
line_format/label_format, range aggregations over (t-range, t]
windows, unwrap samplers, vector aggregations, label_replace,
binops). Writes:

  src/test/resources/logql_compliance_lines.csv    the fixture
  src/test/resources/logql_compliance_golden.json  expected results

The fixture is stored in DuckDB and read back per stream through SQL,
mirroring tools/gen_compliance_golden.py; the evaluator here shares no
code with the Scala engine.

Run driver-side: python3 tools/gen_logql_compliance_golden.py
"""
import json
import math
import os
import re
from datetime import datetime, timezone

import duckdb

from gen_compliance_golden import extrapolated, prom_quantile

HERE = os.path.dirname(os.path.abspath(__file__))
RES = os.path.join(HERE, "..", "src", "test", "resources")

STEP_S = 60
EVAL_STEPS = [s for s in range(60, 541, 60)]   # 9 steps inside the fixture extent

# ---------------------------------------------------------------------------
# Fixture: 2 streams x 120 lines at ts = 5k+1 seconds (k = 0..119).
# ---------------------------------------------------------------------------

METHODS = ["GET", "HEAD", "POST"]
STATUSES = [200, 200, 404, 500]
SIZES = ["512B", "1KB", "2KB", "4KB"]


def fixture_lines():
    out = []  # (ts_ns, labels-dict, body)
    for si, fname in enumerate(["/var/log/a.log", "/var/log/b.log"]):
        labels = {"job": "varlogs", "filename": fname}
        for k in range(120):
            ts_ns = (5 * k + 1) * 1_000_000_000
            body = json.dumps({
                "method": METHODS[(k + si) % 3],
                "status": STATUSES[(k + 2 * si) % 4],
                "took": "%dms" % ((7 * k + 3 * si) % 20),
                "size": SIZES[(k + si) % 4],
                "remote_ip": "127.0.0.%d" % ((k + si) % 8),
            }, separators=(",", ":"))
            out.append((ts_ns, labels, body))
    return out


class Store:
    def __init__(self, lines):
        self.con = duckdb.connect()
        self.con.execute(
            "CREATE TABLE lines(ts_ns BIGINT, labels VARCHAR, body VARCHAR)")
        self.con.executemany("INSERT INTO lines VALUES (?, ?, ?)",
            [(t, json.dumps(l, sort_keys=True), b) for t, l, b in lines])
        self.streams = []  # (labels-dict, [(ts_ns, body)])
        for (lj,) in self.con.execute(
                "SELECT DISTINCT labels FROM lines ORDER BY labels").fetchall():
            rows = self.con.execute(
                "SELECT ts_ns, body FROM lines WHERE labels=? ORDER BY ts_ns",
                [lj]).fetchall()
            self.streams.append((json.loads(lj), [(t, b) for t, b in rows]))

    def write_csv(self, path):
        with open(path, "w") as f:
            f.write("ts_ns,labels,body\n")
            for lj, t, b in self.con.execute(
                    "SELECT labels, ts_ns, body FROM lines ORDER BY labels, ts_ns").fetchall():
                pass
            for t, lj, b in self.con.execute(
                    "SELECT ts_ns, labels, body FROM lines ORDER BY labels, ts_ns").fetchall():
                f.write('%d,"%s","%s"\n'
                        % (t, lj.replace('"', '""'), b.replace('"', '""')))


# ---------------------------------------------------------------------------
# Value parsing (Go conventions).
# ---------------------------------------------------------------------------

DUR_UNITS = [("ns", 1e-9), ("us", 1e-6), ("µs", 1e-6), ("ms", 1e-3),
             ("s", 1.0), ("m", 60.0), ("h", 3600.0), ("d", 86400.0),
             ("w", 604800.0)]


def parse_duration_sec(s):
    total = 0.0
    rest = s.strip()
    m = re.fullmatch(r"(?:(\d+(?:\.\d+)?)(ns|us|µs|ms|s|m|h|d|w))+", rest)
    if not m:
        raise ValueError("bad duration " + s)
    for num, unit in re.findall(r"(\d+(?:\.\d+)?)(ns|us|µs|ms|s|m|h|d|w)", rest):
        total += float(num) * dict(DUR_UNITS)[unit]
    return total


BYTES_UNITS = [("KiB", 1024.0), ("MiB", 1024.0 ** 2), ("GiB", 1024.0 ** 3),
               ("KB", 1e3), ("MB", 1e6), ("GB", 1e9),
               ("kB", 1e3), ("B", 1.0), ("b", 1.0)]


def parse_bytes(s):
    t = s.strip()
    for unit, mult in BYTES_UNITS:
        if t.endswith(unit):
            return float(t[:-len(unit)]) * mult
    return float(t)


def ip_in(value, spec):
    """exact, CIDR, or range matching for v4 addresses."""
    def to_int(ip):
        parts = ip.split(".")
        if len(parts) != 4:
            return None
        try:
            return sum(int(p) << (8 * (3 - i)) for i, p in enumerate(parts))
        except ValueError:
            return None
    v = to_int(value)
    if v is None:
        return False
    if "/" in spec:
        base, bits = spec.split("/")
        b = to_int(base)
        mask = ((1 << 32) - 1) ^ ((1 << (32 - int(bits))) - 1)
        return (v & mask) == (b & mask)
    if "-" in spec:
        lo, hi = spec.split("-")
        return to_int(lo) <= v <= to_int(hi)
    return v == to_int(spec)


IP_RE = re.compile(r"\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}")


def go_ts_string(ts_ns):
    """Go time.Time.String() in UTC, trailing fraction zeros trimmed."""
    sec, frac = divmod(ts_ns, 1_000_000_000)
    d = datetime.fromtimestamp(sec, tz=timezone.utc)
    base = d.strftime("%Y-%m-%d %H:%M:%S")
    if frac:
        base += ("." + "%09d" % frac).rstrip("0")
    return base + " +0000 UTC"


# ---------------------------------------------------------------------------
# LogQL mini-parser.
# ---------------------------------------------------------------------------

class PErr(Exception):
    pass


TOK_RE = re.compile(r"""
    \s+ | \#[^\n]*
  | (?P<str>"(?:[^"\\]|\\.)*"|`[^`]*`)
  | (?P<num>[0-9]+(?:\.[0-9]*)?(?:[eE][-+]?[0-9]+)?|\.[0-9]+)
  | (?P<id>[a-zA-Z_][a-zA-Z0-9_]*)
  | (?P<op><=|>=|==|!=|=~|!~|\|=|\|~|!>|\|>|[(){}\[\],=<>|*/%^+-])
""", re.X)


def lex(q):
    toks, i = [], 0
    while i < len(q):
        m = TOK_RE.match(q, i)
        if not m:
            raise PErr("lex at %r" % q[i:i + 20])
        i = m.end()
        for kind in ("str", "num", "id", "op"):
            v = m.group(kind)
            if v is not None:
                toks.append((kind, v))
                break
    toks.append(("eof", ""))
    return toks


def unquote(s):
    if s.startswith("`"):
        return s[1:-1]
    return json.loads(s)


RANGE_OPS = {"count_over_time", "rate", "bytes_over_time", "bytes_rate",
             "absent_over_time", "rate_counter", "avg_over_time",
             "sum_over_time", "min_over_time", "max_over_time",
             "stdvar_over_time", "stddev_over_time", "first_over_time",
             "last_over_time", "quantile_over_time"}
VEC_OPS = {"sum", "avg", "max", "min", "count", "stddev", "stdvar",
           "topk", "bottomk", "sort", "sort_desc"}
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

    def expect(self, v):
        k, got = self.next()
        if got != v:
            raise PErr("expected %r got %r" % (v, got))

    def parse(self):
        e = self.expr(1)
        if self.peek()[0] != "eof":
            raise PErr("trailing %r" % (self.peek(),))
        return e

    def expr(self, minp):
        lhs = self.atom()
        while True:
            k, v = self.peek()
            prec = None
            if v == "or":
                prec = 1
            elif v in ("and", "unless"):
                prec = 2
            elif v in CMP:
                prec = 3
            elif v in ("+", "-"):
                prec = 4
            elif v in ("*", "/", "%"):
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
            rhs = self.expr(prec + (0 if v == "^" else 1))
            lhs = ("bin", v, lhs, rhs, boolmod)

    def atom(self):
        k, v = self.peek()
        if v == "(":
            self.next()
            e = self.expr(1)
            self.expect(")")
            return e
        if k == "num":
            self.next()
            return ("num", float(v))
        if v == "{":
            return self.log_expr()
        if k == "id":
            self.next()
            if v == "vector":
                self.expect("(")
                k2, n = self.next()
                self.expect(")")
                return ("vector", float(n))
            if v == "label_replace":
                self.expect("(")
                inner = self.expr(1)
                args = []
                while self.peek()[1] == ",":
                    self.next()
                    args.append(unquote(self.next()[1]))
                self.expect(")")
                return ("label_replace", inner, args)
            if v in RANGE_OPS:
                return self.range_agg(v)
            if v in VEC_OPS:
                return self.vec_agg(v)
        raise PErr("unexpected %r" % ((k, v),))

    def grouping(self):
        if self.peek()[1] in ("by", "without"):
            which = self.next()[1]
            self.expect("(")
            labs = []
            while self.peek()[1] != ")":
                if self.peek()[1] == ",":
                    self.next()
                    continue
                labs.append(self.next()[1])
            self.expect(")")
            return (which, labs)
        return None

    def range_agg(self, op):
        self.expect("(")
        param = None
        if op == "quantile_over_time":
            k, n = self.next()
            param = float(n)
            self.expect(",")
        sel, stages = self.log_pipeline()
        self.expect("[")
        k, d = self.next()
        # durations lex as num + id ("5" "s") or num with unit glued
        dur = d
        if self.peek()[0] == "id" and re.fullmatch(r"[a-z]+", self.peek()[1]):
            dur += self.next()[1]
        rng_s = parse_duration_sec(dur)
        self.expect("]")
        off_s = 0.0
        if self.peek()[1] == "offset":
            self.next()
            k2, d2 = self.next()
            dur2 = d2
            if self.peek()[0] == "id" and re.fullmatch(r"[a-z]+", self.peek()[1]):
                dur2 += self.next()[1]
            off_s = parse_duration_sec(dur2)
        self.expect(")")
        grp = self.grouping()
        return ("range_agg", op, param, sel, stages,
                int(rng_s * 1e9), int(off_s * 1e9), grp)

    def vec_agg(self, op):
        grp = self.grouping()
        self.expect("(")
        param = None
        if op in ("topk", "bottomk"):
            k, n = self.next()
            param = int(float(n))
            self.expect(",")
        inner = self.expr(1)
        self.expect(")")
        if grp is None:
            grp = self.grouping()
        return ("vec_agg", op, param, grp, inner)

    def log_expr(self):
        sel, stages = self.log_pipeline()
        return ("log", sel, stages)

    def log_pipeline(self):
        sel = self.selector()
        stages = []
        while True:
            k, v = self.peek()
            if v in ("|=", "!=", "|~", "!~"):
                self.next()
                needles = []
                isIp = []
                while True:
                    if self.peek()[1] == "ip":
                        self.next()
                        self.expect("(")
                        needles.append(unquote(self.next()[1]))
                        isIp.append(True)
                        self.expect(")")
                    else:
                        needles.append(unquote(self.next()[1]))
                        isIp.append(False)
                    if self.peek()[1] == "or":
                        self.next()
                        continue
                    break
                stages.append(("linefilter", v, needles, isIp))
            elif v in ("|>", "!>"):
                self.next()
                stages.append(("patternfilter", v, unquote(self.next()[1])))
            elif v == "|":
                self.next()
                stages.append(self.stage())
            else:
                return sel, stages

    def selector(self):
        self.expect("{")
        ms = []
        while self.peek()[1] != "}":
            if self.peek()[1] == ",":
                self.next()
                continue
            lk, lv = self.next()
            ok, ov = self.next()
            sv = unquote(self.next()[1])
            ms.append((lv, ov, sv))
        self.expect("}")
        return ms

    def stage(self):
        k, v = self.next()
        if v == "json":
            params = []
            while self.peek()[0] == "id" or self.peek()[1] == ",":
                if self.peek()[1] == ",":
                    self.next()
                    continue
                name = self.next()[1]
                if self.peek()[1] == "=":
                    self.next()
                    params.append((name, unquote(self.next()[1])))
                else:
                    params.append((name, name))
            return ("json", params)
        if v in ("regexp", "pattern"):
            return (v, unquote(self.next()[1]))
        if v == "decolorize":
            return ("decolorize",)
        if v == "line_format":
            return ("line_format", unquote(self.next()[1]))
        if v == "label_format":
            pairs = []
            while True:
                dst = self.next()[1]
                self.expect("=")
                k2, v2 = self.next()
                if k2 == "str":
                    pairs.append((dst, ("tmpl", unquote(v2))))
                else:
                    pairs.append((dst, ("rename", v2)))
                if self.peek()[1] == ",":
                    self.next()
                    continue
                break
            return ("label_format", pairs)
        if v == "unwrap":
            k2, v2 = self.next()
            if v2 in ("duration", "bytes", "duration_seconds") \
                    and self.peek()[1] == "(":
                self.next()
                lab = self.next()[1]
                self.expect(")")
                return ("unwrap", lab, v2)
            return ("unwrap", v2, None)
        # label filter: ident op value (possibly ip(...)), with and/or/comma
        return self.label_filter_chain(v)

    def label_filter_chain(self, first_tok):
        node = self.label_filter_atom(first_tok)
        while True:
            k, v = self.peek()
            if v in ("and", ","):
                self.next()
                nxt = self.label_filter_atom(None)
                node = ("lf_and", node, nxt)
            elif v == "or":
                self.next()
                nxt = self.label_filter_atom(None)
                node = ("lf_or", node, nxt)
            elif k == "id" and self.toks[self.i + 1][1] in \
                    ("=", "!=", "=~", "!~", "<", ">", "<=", ">=", "=="):
                # juxtaposition chaining = and
                nxt = self.label_filter_atom(None)
                node = ("lf_and", node, nxt)
            else:
                return ("labelfilter", node)

    def label_filter_atom(self, first_tok):
        if first_tok is None:
            k, v = self.next()
        else:
            v = first_tok
        if v == "(":
            inner = self.label_filter_chain(self.next()[1])
            self.expect(")")
            return inner[1]
        label = v
        k, op = self.next()
        if self.peek()[1] == "ip":
            self.next()
            self.expect("(")
            spec = unquote(self.next()[1])
            self.expect(")")
            return ("lf_ip", label, op, spec)
        k2, val = self.next()
        if k2 == "str":
            return ("lf_str", label, op, unquote(val))
        num = val
        # glue a UNIT suffix lexed separately (1 ms / 1 KB) — but never
        # a following label name (juxtaposed filter chaining)
        if self.peek()[0] == "id" and re.fullmatch(
                r"ns|us|µs|ms|s|m|h|d|w|[KMGk]i?[Bb]|[Bb]", self.peek()[1]):
            num += self.next()[1]
        return ("lf_num", label, op, num)


# ---------------------------------------------------------------------------
# Pipeline evaluation.
# ---------------------------------------------------------------------------

ANSI_RE = re.compile(r"\x1b\[[0-9;]*m")


class Entry:
    __slots__ = ("ts_ns", "line", "labels", "unwrapped")

    def __init__(self, ts_ns, line, labels):
        self.ts_ns = ts_ns
        self.line = line
        self.labels = labels
        self.unwrapped = None


def sel_match(labels, matchers):
    for (l, op, v) in matchers:
        lv = labels.get(l, "")
        if op == "=" and lv != v:
            return False
        if op == "!=" and lv == v:
            return False
        if op == "=~" and re.fullmatch(v, lv) is None:
            return False
        if op == "!~" and re.fullmatch(v, lv) is not None:
            return False
    return True


def pattern_to_re(p):
    parts = re.split(r"<_>|<([a-zA-Z_][a-zA-Z0-9_]*)>", p)
    out = []
    it = re.finditer(r"<_>|<([a-zA-Z_][a-zA-Z0-9_]*)>", p)
    last = 0
    for m in it:
        out.append(re.escape(p[last:m.start()]))
        name = m.group(1)
        out.append("(.*?)" if name is None else ("(?P<%s>.*?)" % name))
        last = m.end()
    out.append(re.escape(p[last:]))
    # make the last wildcard greedy so trailing literals anchor
    rx = "".join(out)
    return re.compile("^" + rx + "$", re.S)


def render_template(tmpl, entry):
    def repl(m):
        inner = m.group(1).strip()
        if inner == "__timestamp__":
            return go_ts_string(entry.ts_ns)
        if inner == "__line__":
            return entry.line
        pipem = re.fullmatch(r"\.(\w+)\s*\|\s*(\w+)", inner)
        if pipem:
            v = entry.labels.get(pipem.group(1), "")
            fn = pipem.group(2)
            if fn in ("ToLower", "lower"):
                return v.lower()
            if fn in ("ToUpper", "upper"):
                return v.upper()
            raise PErr("template fn " + fn)
        fm = re.fullmatch(r"\.(\w+)", inner)
        if fm:
            return entry.labels.get(fm.group(1), "")
        raise PErr("template " + inner)
    return re.sub(r"\{\{(.*?)\}\}", repl, tmpl)


def apply_stages(entries, stages):
    out = entries
    for st in stages:
        kind = st[0]
        if kind == "linefilter":
            _, op, needles, isIp = st

            def hit(e, op=op, needles=needles, isIp=isIp):
                def one(n, ip_mode):
                    if ip_mode:
                        return any(ip_in(m.group(0), n)
                                   for m in IP_RE.finditer(e.line))
                    if op in ("|=", "!="):
                        return n in e.line
                    return re.search(n, e.line) is not None
                any_hit = any(one(n, i) for n, i in zip(needles, isIp))
                return any_hit if op in ("|=", "|~") else not any_hit
            out = [e for e in out if hit(e)]
        elif kind == "patternfilter":
            _, op, pat = st
            rx = pattern_to_re(pat)
            out = [e for e in out
                   if (rx.search(e.line) is not None) == (op == "|>")]
        elif kind == "json":
            params = st[1]
            new = []
            for e in out:
                try:
                    obj = json.loads(e.line)
                except ValueError:
                    continue
                labels = dict(e.labels)
                if params:
                    for dst, src in params:
                        if src in obj:
                            labels[dst] = to_label_str(obj[src])
                else:
                    for k2, v2 in obj.items():
                        if isinstance(v2, (dict, list)):
                            continue
                        labels[k2] = to_label_str(v2)
                ne = Entry(e.ts_ns, e.line, labels)
                ne.unwrapped = e.unwrapped
                new.append(ne)
            out = new
        elif kind == "regexp":
            rx = re.compile(st[1])
            new = []
            for e in out:
                m = rx.search(e.line)
                labels = dict(e.labels)
                if m:
                    for name, val in m.groupdict().items():
                        if val is not None:
                            labels[name] = val
                ne = Entry(e.ts_ns, e.line, labels)
                new.append(ne)
            out = new
        elif kind == "pattern":
            rx = pattern_to_re(st[1])
            new = []
            for e in out:
                m = rx.search(e.line)
                labels = dict(e.labels)
                if m:
                    for name, val in m.groupdict().items():
                        if val is not None:
                            labels[name] = val
                new.append(Entry(e.ts_ns, e.line, labels))
            out = new
        elif kind == "decolorize":
            out = [Entry(e.ts_ns, ANSI_RE.sub("", e.line), e.labels)
                   for e in out]
        elif kind == "line_format":
            out = [Entry(e.ts_ns, render_template(st[1], e), e.labels)
                   for e in out]
        elif kind == "label_format":
            new = []
            for e in out:
                labels = dict(e.labels)
                for dst, spec in st[1]:
                    if spec[0] == "rename":
                        src = spec[1]
                        if src in labels:
                            labels[dst] = labels.pop(src)
                    else:
                        labels[dst] = render_template(spec[1], e)
                new.append(Entry(e.ts_ns, e.line, labels))
            out = new
        elif kind == "unwrap":
            _, lab, conv = st
            new = []
            for e in out:
                raw = e.labels.get(lab)
                if raw is None:
                    continue
                try:
                    if conv in ("duration", "duration_seconds"):
                        v = parse_duration_sec(raw)
                    elif conv == "bytes":
                        v = parse_bytes(raw)
                    else:
                        v = float(raw)
                except ValueError:
                    continue
                ne = Entry(e.ts_ns, e.line, e.labels)
                ne.unwrapped = v
                new.append(ne)
            out = new
        elif kind == "labelfilter":
            out = [e for e in out if eval_lf(st[1], e)]
        else:
            raise PErr("stage " + kind)
    return out


def to_label_str(v):
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, float) and v == int(v):
        return str(int(v))
    return str(v)


def eval_lf(node, e):
    kind = node[0]
    if kind == "lf_and":
        return eval_lf(node[1], e) and eval_lf(node[2], e)
    if kind == "lf_or":
        return eval_lf(node[1], e) or eval_lf(node[2], e)
    if kind == "lf_str":
        _, lab, op, v = node
        lv = e.labels.get(lab, "")
        if op in ("=", "=="):
            return lv == v
        if op == "!=":
            return lv != v
        if op == "=~":
            return re.fullmatch(v, lv) is not None
        if op == "!~":
            return re.fullmatch(v, lv) is None
        raise PErr("lf_str op " + op)
    if kind == "lf_ip":
        _, lab, op, spec = node
        lv = e.labels.get(lab, "")
        hit = ip_in(lv, spec)
        return hit if op in ("=", "==") else (not hit)
    if kind == "lf_num":
        _, lab, op, raw = node
        lv = e.labels.get(lab)
        if lv is None:
            return False
        try:
            if re.search(r"(ns|us|µs|ms|[smhdw])$", raw) and not \
                    re.fullmatch(r"[0-9.eE+-]+", raw):
                want = parse_duration_sec(raw)
                have = parse_duration_sec(lv)
            elif re.search(r"[KMGkb]i?[Bb]?$", raw) and not \
                    re.fullmatch(r"[0-9.eE+-]+", raw):
                want = parse_bytes(raw)
                have = parse_bytes(lv)
            else:
                want = float(raw)
                have = float(lv)
        except ValueError:
            return False
        return {"==": have == want, "=": have == want, "!=": have != want,
                ">": have > want, ">=": have >= want,
                "<": have < want, "<=": have <= want}[op]
    raise PErr("lf " + kind)


# ---------------------------------------------------------------------------
# Metric evaluation.
# ---------------------------------------------------------------------------

class Evaluator:
    def __init__(self, store):
        self.store = store

    def log_entries(self, sel, stages):
        out = []
        for labels, rows in self.store.streams:
            if not sel_match(labels, sel):
                continue
            entries = [Entry(t, b, dict(labels)) for t, b in rows]
            out.extend(apply_stages(entries, stages))
        return out

    def eval(self, ast, t_ns):
        kind = ast[0]
        if kind == "num":
            return ast[1]
        if kind == "vector":
            return {(): ast[1]}
        if kind == "range_agg":
            return self.range_agg(ast, t_ns)
        if kind == "vec_agg":
            return self.vec_agg(ast, t_ns)
        if kind == "label_replace":
            v = self.eval(ast[1], t_ns)
            dst, repl, src, regex = ast[2]
            cre = re.compile(regex)
            out = {}
            for lk, val in v.items():
                labels = dict(lk)
                m = cre.fullmatch(labels.get(src, ""))
                if m is not None:
                    nv = re.sub(r"\$(\d+)|\$\{(\d+)\}",
                                lambda g: m.group(int(g.group(1) or g.group(2)))
                                or "", repl)
                    nv = nv.replace("$0", m.group(0)) if "$0" in repl else nv
                    if nv == "":
                        labels.pop(dst, None)
                    else:
                        labels[dst] = nv
                out[tuple(sorted(labels.items()))] = val
            return out
        if kind == "bin":
            return self.binop(ast, t_ns)
        raise PErr("eval " + kind)

    def range_agg(self, ast, t_ns):
        _, op, param, sel, stages, rng_ns, off_ns, grp = ast
        t = t_ns - off_ns
        entries = [e for e in self.log_entries(sel, stages)
                   if t - rng_ns < e.ts_ns <= t]
        if op == "absent_over_time":
            return {} if entries else {(): 1.0}
        groups = {}
        for e in entries:
            labels = dict(e.labels)
            if grp:
                which, labs = grp
                if which == "by":
                    labels = {k: v for k, v in labels.items() if k in labs}
                else:
                    labels = {k: v for k, v in labels.items() if k not in labs}
            groups.setdefault(tuple(sorted(labels.items())), []).append(e)
        out = {}
        rng_s = rng_ns / 1e9
        for lk, es in groups.items():
            es.sort(key=lambda e: e.ts_ns)
            if op == "count_over_time":
                out[lk] = float(len(es))
            elif op == "rate" and all(e.unwrapped is None for e in es):
                out[lk] = len(es) / rng_s
            elif op == "bytes_over_time":
                out[lk] = float(sum(len(e.line.encode()) for e in es))
            elif op == "bytes_rate":
                out[lk] = sum(len(e.line.encode()) for e in es) / rng_s
            else:
                vs = [e.unwrapped for e in es if e.unwrapped is not None]
                if not vs:
                    continue
                if op == "sum_over_time":
                    out[lk] = sum(vs)
                elif op == "avg_over_time":
                    out[lk] = sum(vs) / len(vs)
                elif op == "min_over_time":
                    out[lk] = min(vs)
                elif op == "max_over_time":
                    out[lk] = max(vs)
                elif op == "first_over_time":
                    out[lk] = vs[0]
                elif op == "last_over_time":
                    out[lk] = vs[-1]
                elif op in ("stddev_over_time", "stdvar_over_time"):
                    m = sum(vs) / len(vs)
                    var = sum((x - m) ** 2 for x in vs) / len(vs)
                    out[lk] = math.sqrt(var) if op == "stddev_over_time" else var
                elif op == "quantile_over_time":
                    out[lk] = prom_quantile(param, vs)
                elif op == "rate_counter":
                    samples = [(e.ts_ns // 1000, e.unwrapped) for e in es
                               if e.unwrapped is not None]
                    if len(samples) < 2:
                        continue
                    out[lk] = extrapolated(samples, rng_ns // 1000, t // 1000,
                                           is_counter=True, is_rate=True)
                elif op == "rate":
                    # unwrapped rate: sum of values / range seconds
                    out[lk] = sum(vs) / rng_s
                else:
                    raise PErr("range op " + op)
        return out

    def vec_agg(self, ast, t_ns):
        _, op, param, grp, inner = ast
        v = self.eval(inner, t_ns)
        if isinstance(v, float):
            raise PErr("vec agg over scalar")
        if op in ("sort", "sort_desc"):
            return v
        groups = {}
        for lk, val in v.items():
            labels = dict(lk)
            if grp:
                which, labs = grp
                if which == "by":
                    labels = {k: x for k, x in labels.items() if k in labs}
                else:
                    labels = {k: x for k, x in labels.items() if k not in labs}
            else:
                labels = {}
            groups.setdefault(tuple(sorted(labels.items())), []).append((lk, val))
        out = {}
        if op in ("topk", "bottomk"):
            for gl, pairs in groups.items():
                pairs.sort(key=lambda p: p[1], reverse=(op == "topk"))
                for lk, val in pairs[:param]:
                    out[lk] = val
            return out
        for gl, pairs in groups.items():
            xs = [val for _, val in pairs]
            if op == "sum":
                out[gl] = sum(xs)
            elif op == "avg":
                out[gl] = sum(xs) / len(xs)
            elif op == "max":
                out[gl] = max(xs)
            elif op == "min":
                out[gl] = min(xs)
            elif op == "count":
                out[gl] = float(len(xs))
            elif op in ("stddev", "stdvar"):
                m = sum(xs) / len(xs)
                var = sum((x - m) ** 2 for x in xs) / len(xs)
                out[gl] = math.sqrt(var) if op == "stddev" else var
            else:
                raise PErr("vec op " + op)
        return out

    def binop(self, ast, t_ns):
        _, op, ln, rn, boolmod = ast
        lv = self.eval(ln, t_ns)
        rv = self.eval(rn, t_ns)
        sl, sr = isinstance(lv, float), isinstance(rv, float)

        def arith(a, b):
            if op == "+":
                return a + b
            if op == "-":
                return a - b
            if op == "*":
                return a * b
            if op == "/":
                return (float("inf") if a > 0 else float("-inf") if a < 0
                        else float("nan")) if b == 0 else a / b
            if op == "%":
                return math.fmod(a, b) if b != 0 else float("nan")
            if op == "^":
                return math.pow(a, b)
            raise PErr("arith " + op)

        def cmp(a, b):
            return {"==": a == b, "!=": a != b, "<": a < b, ">": a > b,
                    "<=": a <= b, ">=": a >= b}[op]

        if sl and sr:
            if op in CMP:
                return 1.0 if cmp(lv, rv) else 0.0
            return arith(lv, rv)
        if sl or sr:
            vec, scal, scal_left = (rv, lv, True) if sl else (lv, rv, False)
            out = {}
            for lk, x in vec.items():
                a, b = (scal, x) if scal_left else (x, scal)
                if op in CMP:
                    if boolmod:
                        out[lk] = 1.0 if cmp(a, b) else 0.0
                    elif cmp(a, b):
                        out[lk] = x
                else:
                    out[lk] = arith(a, b)
            return out
        out = {}
        for lk, x in lv.items():
            if lk not in rv:
                continue
            if op in CMP:
                if boolmod:
                    out[lk] = 1.0 if cmp(x, rv[lk]) else 0.0
                elif cmp(x, rv[lk]):
                    out[lk] = x
            else:
                out[lk] = arith(x, rv[lk])
        return out


# ---------------------------------------------------------------------------
# Corpus (faithful to logql-test-queries.yml; bounded variants).
# ---------------------------------------------------------------------------

VARIANTS = {
    "range": ["5s", "1m"],
    "offset": ["1s", "5s", "15s"],
    "topN": ["1", "2", "5"],
    "quantile": ["0.1", "0.5", "0.75", "0.95", "0.90", "0.99", "1", "1.5"],
    "simpleRangeAggOp": ["count_over_time", "rate", "bytes_over_time",
                         "bytes_rate"],
    "unwrapRangeAggOp": ["rate_counter", "avg_over_time", "sum_over_time",
                         "min_over_time", "max_over_time", "stdvar_over_time",
                         "stddev_over_time", "first_over_time",
                         "last_over_time"],
    "groupRangeAggOp": ["avg_over_time", "stddev_over_time",
                        "stdvar_over_time", "max_over_time", "min_over_time",
                        "first_over_time", "last_over_time"],
    "unwrapExpr": ["unwrap status", "unwrap duration(took)",
                   "unwrap bytes(size)"],
    "unwrapLabels": ["status,took,size"],
    "simpleVecAggOp": ["sum", "avg", "max", "min", "count", "stddev",
                       "stdvar"],
    "sortVecAggOp": ["sort", "sort_desc"],
    "topBottomVecAggOp": ["topk", "bottomk"],
    "cmpBinOp": ["==", "!=", ">", ">=", "<", "<="],
}

LOG_TEMPLATES = [
    # (template, [variant args], should_be_empty)
    ('{this_label_clearly_not_exist=".+"}', [], True),
    ('{job="varlogs", this_label_clearly_not_exist="varlogs"}', [], True),
    ('{job="varlogs"}', [], False),
    ('{job=~".*varlogs.*"}', [], False),
    ('{job="varlogs", this_label_clearly_not_exist!="varlogs"}', [], False),
    ('{job="varlogs"} # anything after is a comment', [], False),
    ('{job="varlogs"} |= "no way line would contain this message"', [], True),
    ('{job="varlogs"} |= "HEAD"', [], False),
    ('{job="varlogs"} != "HEAD"', [], False),
    ('{job="varlogs"} |~ "(HEAD|GET)"', [], False),
    ('{job="varlogs"} !~ "(HEAD|GET)"', [], False),
    ('{job="varlogs"} |= "HEAD" or "GET"', [], False),
    ('{job="varlogs"} != "HEAD" or "GET"', [], False),
    ('{job="varlogs"} |= ip("127.0.0.1")', [], False),
    ('{job="varlogs"} |= ip("127.0.0.1") or ip("192.168.1.0/24")', [], False),
    ('{job="varlogs"} |= ip("127.0.0.0/24")', [], False),
    ('{job="varlogs"} |= ip("127.0.0.1-127.0.0.6")', [], False),
    ('{job="varlogs"} |> "no way line would contain <_> pattern"', [], True),
    ('{job="varlogs"} !> "no way line would contain <_> pattern"', [], False),
    ('{job="varlogs"} | json', [], False),
    ('{job="varlogs"} | json method', [], False),
    ('{job="varlogs"} | json method_name="method"', [], False),
    ('{job="varlogs"} | regexp `\\{.*"method":"(?P<method>\\w+)".*\\}` | method = "HEAD"', [], False),
    ('{job="varlogs"} | pattern `<_>"method":"<method>"<_>` | method = "HEAD"', [], False),
    ('{job="varlogs"} | json | method = "HEAD"', [], False),
    ('{job="varlogs"} | json | method != "HEAD"', [], False),
    ('{job="varlogs"} | json | method =~ "(HEAD|GET)"', [], False),
    ('{job="varlogs"} | json | method !~ "(HEAD|GET)"', [], False),
    ('{job="varlogs"} | json | status >= 400', [], False),
    ('{job="varlogs"} | json | took >= 1ms', [], False),
    ('{job="varlogs"} | json | size >= 1KB', [], False),
    ('{job="varlogs"} | json | remote_ip = ip("127.0.0.1")', [], False),
    ('{job="varlogs"} | json | remote_ip = ip("127.0.0.0/24")', [], False),
    ('{job="varlogs"} | json | remote_ip = ip("127.0.0.1-127.0.0.6")', [], False),
    ('{job="varlogs"} | json | status > 400 or took >= 1ms', [], False),
    ('{job="varlogs"} | json | took >= 1ms and size >= 1KB', [], False),
    ('{job="varlogs"} | json | took >= 1ms, size >= 1KB', [], False),
    ('{job="varlogs"} | json | took >= 1ms size >= 1KB', [], False),
    ('{job="varlogs"} | json status | status > 0 and status < 0', [], True),
    ('{job="varlogs"} | json | status > 1000 and status < 0 or method != "HEAD"', [], False),
    ('{job="varlogs"} | json | (status > 1000, status < 0) or method != "HEAD"', [], False),
    ('{job="varlogs"} | json | (status > 1000 status < 0) or method != "HEAD"', [], False),
    ('{job="varlogs"} | json | status > 1000 and (status < 0 or method != "HEAD")', [], True),
    ('{job="varlogs"} | decolorize', [], False),
    ('{job="varlogs"} | line_format "{{ __timestamp__ }}"', [], False),
    ('{job="varlogs"} | json | line_format "{{ .method }}"', [], False),
    ('{job="varlogs"} | json | label_format status_code=status | status_code >= 400', [], False),
    ('{job="varlogs"} | json | label_format method_lower="{{ .method | ToLower }}"', [], False),
]

METRIC_TEMPLATES = [
    ("42", [], False),
    ("1.234", [], False),
    (".123", [], False),
    ("1.23e-3", [], False),
    ("1 + 2 / 3", [], False),
    ("2 * 3 % 2", [], False),
    ("vector(1) + vector(2) / vector(3)", [], False),
    ("vector(2) * vector(3) % vector(2)", [], False),
    ("vector(4) % vector(3) * vector(2)", [], False),
    ("vector(1) * vector(2) + vector(4) / vector(6) - vector(10) % vector(2) ^ vector(2)", [], False),
    ("( vector(1) + vector(2) ) / vector(3)", [], False),
    ("( vector(2) * vector(3) ) % vector(2)", [], False),
    ("vector(2) * ( vector(3) % vector(2) )", [], False),
    ('{{simpleRangeAggOp}}( {job="varlogs"} [{{range}}] )',
     ["simpleRangeAggOp", "range"], False),
    ('{{simpleRangeAggOp}}( {job="varlogs"} [{{range}}] offset {{offset}} )',
     ["simpleRangeAggOp", "range", "offset"], False),
    ('absent_over_time( {job="varlogs"} [{{range}}] )', ["range"], True),
    ('absent_over_time( {job="varlogs"} |= "no way line would contain this message" [{{range}}] )',
     ["range"], False),
    ('{{unwrapRangeAggOp}}( {job="varlogs"} | json | {{unwrapExpr}} [{{range}}] )',
     ["unwrapRangeAggOp", "unwrapExpr", "range"], False),
    ('{{groupRangeAggOp}} ( {job="varlogs"} | json | {{unwrapExpr}} [30s] ) by (method)',
     ["groupRangeAggOp", "unwrapExpr"], False),
    ('{{groupRangeAggOp}} ( {job="varlogs"} | json {{unwrapLabels}} | {{unwrapExpr}} [30s] ) by (filename)',
     ["groupRangeAggOp", "unwrapExpr"], False),
    ('{{groupRangeAggOp}} ( {job="varlogs"} | json {{unwrapLabels}} | {{unwrapExpr}} [30s] ) by (method, status)',
     ["groupRangeAggOp", "unwrapExpr"], False),
    ('min_over_time ( {job="varlogs"} | json {{unwrapLabels}} | {{unwrapExpr}} [{{range}}] ) without (filename)',
     ["unwrapExpr", "range"], False),
    ('min_over_time ( {job="varlogs"} | json method, {{unwrapLabels}} | {{unwrapExpr}} [{{range}}] ) without (method)',
     ["unwrapExpr", "range"], False),
    ('quantile_over_time( {{quantile}}, {job="varlogs"} | json {{unwrapLabels}} | {{unwrapExpr}} [30s] )',
     ["quantile", "unwrapExpr"], False),
    ('quantile_over_time( {{quantile}}, {job="varlogs"} | json {{unwrapLabels}} | {{unwrapExpr}} [30s] ) by (filename)',
     ["quantile", "unwrapExpr"], False),
    ('quantile_over_time( {{quantile}}, {job="varlogs"} | json {{unwrapLabels}} | {{unwrapExpr}} [30s] ) without (job)',
     ["quantile", "unwrapExpr"], False),
    ('{{simpleVecAggOp}}( {{simpleRangeAggOp}}( {job="varlogs"} [30s] ) )',
     ["simpleVecAggOp", "simpleRangeAggOp"], False),
    ('{{simpleVecAggOp}} by (filename) ( {{simpleRangeAggOp}}( {job="varlogs"} [30s] ) )',
     ["simpleVecAggOp", "simpleRangeAggOp"], False),
    ('{{simpleVecAggOp}} by (method) ( {{simpleRangeAggOp}}( {job="varlogs"} | json [30s] ) )',
     ["simpleVecAggOp", "simpleRangeAggOp"], False),
    ('{{simpleVecAggOp}} by (method, status) ( {{simpleRangeAggOp}}( {job="varlogs"} | json method, status [30s] ) )',
     ["simpleVecAggOp", "simpleRangeAggOp"], False),
    ('{{simpleVecAggOp}} without (job, filename) ( {{simpleRangeAggOp}}( {job="varlogs"} | json method, status [30s] ) )',
     ["simpleVecAggOp", "simpleRangeAggOp"], False),
    ('{{topBottomVecAggOp}} ( {{topN}}, bytes_over_time( {job="varlogs"} [{{range}}] ) )',
     ["topBottomVecAggOp", "topN", "range"], False),
    ('{{topBottomVecAggOp}} by (method) ( {{topN}}, bytes_over_time( {job="varlogs"} | json method [30s] ) )',
     ["topBottomVecAggOp", "topN"], False),
    ('{{topBottomVecAggOp}} without (filename) ( {{topN}}, bytes_over_time( {job="varlogs"} [30s] ) )',
     ["topBottomVecAggOp", "topN"], False),
    ('{{sortVecAggOp}} ( bytes_over_time( {job="varlogs"} | json method [{{range}}] ) )',
     ["sortVecAggOp", "range"], False),
    ('label_replace( bytes_over_time( {job="varlogs"} [5s] ), "replace_label", "$0", "filename", ".+" )',
     [], False),
    ('label_replace( bytes_over_time( {job="varlogs"} [5s] ), "job", "$0", "filename", ".+" )',
     [], False),
    ('label_replace( bytes_over_time( {job="varlogs"} | json method [5s] ), "http_method", "$0", "method", ".+" )',
     [], False),
    ('count_over_time( {job="varlogs"} [{{range}}] ) * 2', ["range"], False),
    ('bytes_over_time( {job="varlogs"} [{{range}}] ) / count_over_time( {job="varlogs"} [{{range}}] )',
     ["range"], False),
    ('count_over_time( {job="varlogs"} [{{range}}] ) > 0', ["range"], False),
    ('count_over_time( {job="varlogs"} [{{range}}] ) > 1000000000', ["range"], True),
    ('count_over_time( {job="varlogs"} [{{range}}] ) {{cmpBinOp}} bool 0',
     ["cmpBinOp", "range"], False),
    ('count_over_time( {job="varlogs"} [{{range}}] ) {{cmpBinOp}} bool 1000000000',
     ["cmpBinOp", "range"], False),
    ('count_over_time( {job="varlogs"} != "POST" | json method, status [30s] )',
     [], False),
]


def expand(template, vargs):
    # single-valued dimension, substituted unconditionally
    template = template.replace("{{unwrapLabels}}", VARIANTS["unwrapLabels"][0])
    vargs = [a for a in vargs if a != "unwrapLabels"]
    if not vargs:
        return [template]
    arg = vargs[0]
    out = []
    for val in VARIANTS[arg]:
        out.extend(expand(template.replace("{{%s}}" % arg, val), vargs[1:]))
    return out


def fmt_val(v):
    if v != v:
        return "NaN"
    if v == float("inf"):
        return "Inf"
    if v == float("-inf"):
        return "-Inf"
    return repr(v)


def main():
    store = Store(fixture_lines())
    os.makedirs(RES, exist_ok=True)
    store.write_csv(os.path.join(RES, "logql_compliance_lines.csv"))
    ev = Evaluator(store)

    golden = {}
    n_log = n_metric = 0
    for template, vargs, empty in LOG_TEMPLATES:
        for q in expand(template, vargs):
            if q in golden:
                continue
            try:
                ast = Parser(q).parse()
            except PErr as e:
                raise SystemExit("parse failed for %r: %s" % (q, e))
            assert ast[0] == "log", q
            entries = ev.log_entries(ast[1], ast[2])
            streams = {}
            for e in sorted(entries, key=lambda e: (e.ts_ns,
                    tuple(sorted(e.labels.items())))):
                key = json.dumps(e.labels, sort_keys=True)
                streams.setdefault(key, (e.labels, []))[1].append(
                    [str(e.ts_ns), e.line])
            if empty:
                assert not streams, "expected empty: %s" % q
            golden[q] = {"kind": "streams", "streams": [
                {"stream": l, "values": vs}
                for l, vs in (streams[k] for k in sorted(streams))],
                "should_be_empty": empty}
            n_log += 1
    for template, vargs, empty in METRIC_TEMPLATES:
        for q in expand(template, vargs):
            if q in golden:
                continue
            try:
                ast = Parser(q).parse()
            except (PErr, ValueError) as e:
                raise SystemExit("parse failed for %r: %s" % (q, e))
            series = {}
            for s in EVAL_STEPS:
                res = ev.eval(ast, s * 1_000_000_000)
                if isinstance(res, float):
                    res = {(): res}
                for lk, v in res.items():
                    series.setdefault(lk, []).append([s, fmt_val(v)])
            if empty:
                assert not series, "expected empty: %s" % q
            golden[q] = {"kind": "matrix", "series": [
                {"metric": dict(lk), "values": series[lk]}
                for lk in sorted(series)], "should_be_empty": empty}
            n_metric += 1
    out = os.path.join(RES, "logql_compliance_golden.json")
    with open(out, "w") as f:
        json.dump(golden, f, indent=0, sort_keys=True)
    print("wrote %s: %d log + %d metric queries" % (out, n_log, n_metric))


if __name__ == "__main__":
    main()
