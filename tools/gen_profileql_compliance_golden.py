#!/usr/bin/env python3
"""ProfileQL compliance golden generator — an INDEPENDENT evaluator of
the Pyroscope render semantics (selector matching, stack merge,
flamebearer "single" encoding, maxNodes folding), sharing no code with
the Scala engine. Conventions replicated from the public flamebearer
format: names interned in walk order with names[0] == "total", levels
of [xOffsetDelta, total, self, nameIdx] quads, x offsets delta-encoded
against the end of the previous sibling, children in lexicographic
name order, folded tails as per-parent trailing "other" frames.

Writes src/test/resources/profileql_compliance_profiles.json and
profileql_compliance_golden.json. Driver-side python (json only).
"""
import json
import os
import re

S = 1000000  # seconds -> micros


def sample(ts_s, name, labels, stack, value):
    return {"ts_us": ts_s * S, "name": name, "labels": labels,
            "stack": stack, "value": value}


FIXTURE = [
    sample(1, "cpu", {"svc": "api"}, ["main", "handler", "parse"], 3),
    sample(2, "cpu", {"svc": "api"}, ["main", "handler", "parse"], 2),
    sample(3, "cpu", {"svc": "api"}, ["main", "handler", "parse"], 5),
    sample(2, "cpu", {"svc": "api"}, ["main", "handler", "render"], 4),
    sample(4, "cpu", {"svc": "api"}, ["main", "handler"], 6),
    sample(5, "cpu", {"svc": "api"}, ["main", "io", "read"], 7),
    sample(6, "cpu", {"svc": "api"}, ["main", "io", "write"], 2),
    sample(8, "cpu", {"svc": "api"}, ["main", "a", "b", "c", "d", "e"], 1),
    sample(3, "cpu", {"svc": "web"}, ["main", "srv", "route", "auth"], 8),
    sample(7, "cpu", {"svc": "web"}, ["main", "srv", "route"], 1),
    sample(8, "cpu", {"svc": "web", "region": "us"}, ["runtime", "gc"], 9),
    sample(4, "cpu", {"svc": "db", "region": "eu"}, ["main", "db", "query"], 10),
    sample(9, "cpu", {"svc": "db", "region": "eu"}, ["main", "db", "commit"], 4),
    sample(1, "cpu", {"region": "us"}, ["boot", "init"], 5),
    sample(2, "cpu", {"svc": "api", "note": "a,b"}, ["main", "csv"], 3),
    sample(2, "cpu", {"svc": "api", "note2": 'say "hi"'}, ["main", "quote"], 2),
    sample(3, "alloc", {"svc": "api"}, ["main", "alloc", "arena"], 12),
    sample(5, "alloc", {"svc": "api"}, ["main", "alloc"], 6),
    sample(6, "alloc", {"svc": "web"}, ["main", "heap"], 7),
    sample(7, "goroutine", {"svc": "db", "region": "eu"}, ["sched", "park"], 3),
]


# ---- selector parsing (independent implementation) ----

def parse_selector(q):
    brace = q.find("{")
    if brace < 0:
        return q.strip(), []
    name = q[:brace].strip()
    close = q.rfind("}")
    if close <= brace:
        raise ValueError("unterminated selector body")
    body = q[brace + 1:close]
    i = 0
    matchers = []

    def skip_ws(nonlocal_i):
        while nonlocal_i < len(body) and body[nonlocal_i].isspace():
            nonlocal_i += 1
        return nonlocal_i

    i = skip_ws(i)
    while i < len(body):
        ls = i
        while i < len(body) and (body[i].isalnum() or body[i] in "_."):
            i += 1
        label = body[ls:i]
        if not label:
            raise ValueError("expected label name")
        i = skip_ws(i)
        if body.startswith("=~", i):
            op = "=~"; i += 2
        elif body.startswith("!=", i):
            op = "!="; i += 2
        elif body.startswith("!~", i):
            op = "!~"; i += 2
        elif i < len(body) and body[i] == "=":
            op = "="; i += 1
        else:
            raise ValueError("expected matcher operator")
        i = skip_ws(i)
        if i >= len(body) or body[i] != '"':
            raise ValueError("expected quoted value")
        i += 1
        val = []
        while i < len(body) and body[i] != '"':
            if body[i] == "\\" and i + 1 < len(body):
                i += 1
                val.append({"n": "\n", "t": "\t"}.get(body[i], body[i]))
            else:
                val.append(body[i])
            i += 1
        if i >= len(body):
            raise ValueError("unterminated quoted value")
        i += 1
        matchers.append((label, op, "".join(val)))
        i = skip_ws(i)
        if i < len(body):
            if body[i] != ",":
                raise ValueError("expected comma between matchers")
            i += 1
            i = skip_ws(i)
    return name, matchers


def matches(s, name, matchers, from_us, until_us):
    if name and s["name"] != name:
        return False
    for label, op, value in matchers:
        v = s["labels"].get(label)
        if op == "=":
            if v != value:
                return False
        elif op == "!=":
            if v == value:  # absent label matches !=
                return False
        elif op == "=~":
            if v is None or not re.fullmatch("(?:%s)" % value, v):
                return False
        elif op == "!~":
            if v is not None and re.fullmatch("(?:%s)" % value, v):
                return False
    if from_us is not None and s["ts_us"] < from_us:
        return False
    if until_us is not None and s["ts_us"] > until_us:
        return False
    return True


# ---- flamebearer construction ----

class Node:
    def __init__(self, name):
        self.name = name
        self.total = 0
        self.self_ = 0
        self.children = {}


def flamebearer(query, from_s=None, until_s=None, max_nodes=0):
    name, matchers = parse_selector(query)
    from_us = from_s * S if from_s is not None else None
    until_us = until_s * S if until_s is not None else None
    merged = {}
    for s in FIXTURE:
        if matches(s, name, matchers, from_us, until_us):
            key = tuple(s["stack"])
            merged[key] = merged.get(key, 0) + s["value"]

    root = Node("total")
    for stack, v in merged.items():
        root.total += v
        cur = root
        for frame in stack:
            if frame not in cur.children:
                cur.children[frame] = Node(frame)
            cur = cur.children[frame]
            cur.total += v
        cur.self_ += v

    # fold threshold: keep the max_nodes heaviest nodes by total
    min_val = 0
    if max_nodes > 0:
        totals = []

        def collect(n):
            totals.append(n.total)
            for c in n.children.values():
                collect(c)
        collect(root)
        if len(totals) > max_nodes:
            min_val = sorted(totals, reverse=True)[max_nodes - 1]

    names = []
    name_index = {}

    def intern(n):
        if n not in name_index:
            name_index[n] = len(names)
            names.append("total" if not names else n)
        return name_index[n]

    levels = []
    max_self = [0]

    def walk(n, level, x_offset):
        if n.self_ > max_self[0]:
            max_self[0] = n.self_
        idx = intern(n.name)
        if level == len(levels):
            levels.append([])
        levels[level] += [x_offset, n.total, n.self_, idx]
        child_x = x_offset + n.self_
        other_total = 0
        for key in sorted(n.children):
            c = n.children[key]
            if min_val > 0 and c.total < min_val:
                other_total += c.total
            else:
                walk(c, level + 1, child_x)
                child_x += c.total
        if other_total > 0:
            o = Node("other")
            o.total = other_total
            o.self_ = other_total
            walk(o, level + 1, child_x)

    walk(root, 0, 0)
    # delta-encode x offsets against the end of the previous sibling
    for lvl in levels:
        prev = 0
        for i in range(0, len(lvl), 4):
            abs_x = lvl[i]
            lvl[i] = abs_x - prev
            prev = abs_x + lvl[i + 1]

    return {"names": names, "levels": levels,
            "numTicks": root.total, "maxSelf": max_self[0]}


QUERIES = [
    # (query, from_s, until_s, maxNodes)
    ("cpu", None, None, 0),
    ("", None, None, 0),                      # all profile types merged
    ("cpu{}", None, None, 0),
    ("  cpu  ", None, None, 0),               # name is trimmed
    ('cpu{svc="api"}', None, None, 0),
    ('cpu{svc!="api"}', None, None, 0),       # absent svc matches !=
    ('cpu{svc=~"a.*|w.b"}', None, None, 0),
    ('cpu{svc!~"api|db"}', None, None, 0),    # absent svc matches !~
    ('cpu{svc=~".*"}', None, None, 0),        # absent svc does NOT match =~
    ('cpu{region!="us"}', None, None, 0),
    ('cpu{region="eu", svc="db"}', None, None, 0),
    ('cpu{note="a,b"}', None, None, 0),       # quoted comma
    ('cpu{note2="say \\"hi\\""}', None, None, 0),  # escaped quotes
    ('alloc{svc="api"}', None, None, 0),
    ("goroutine", None, None, 0),
    ("nosuch", None, None, 0),                # empty result
    ('cpu{svc="api"}', 2, 5, 0),
    ("cpu", 4, None, 0),
    ("cpu", None, 3, 0),
    ("cpu", 3, 3, 0),                         # single-second window
    ('cpu{svc="api"}', None, None, 4),        # heavy folding
    ('cpu{svc="api"}', None, None, 8),
    ('cpu{svc="api"}', None, None, 2),        # fold to root+1
    ("cpu", None, None, 6),
    ("alloc", None, None, 3),
]

ERRORS = [
    'cpu{svc>"api"}',        # unknown operator
    'cpu{svc="api"',         # unterminated body
    'cpu{svc="api}',         # unterminated quoted value
    'cpu{svc="a" svc="b"}',  # missing comma
    'cpu{="x"}',             # empty label name
]


def label_names():
    ks = set()
    for s in FIXTURE:
        ks.update(s["labels"].keys())
    return sorted(ks)


def label_values(label):
    return sorted({s["labels"][label] for s in FIXTURE if label in s["labels"]})


def apps():
    return sorted({s["name"] for s in FIXTURE})


def main():
    out_dir = os.path.join(os.path.dirname(__file__), "..",
                           "src", "test", "resources")
    with open(os.path.join(out_dir, "profileql_compliance_profiles.json"),
              "w") as f:
        json.dump(FIXTURE, f, indent=1)
    golden = {
        "queries": [
            {"query": q, "from": fr, "until": un, "maxNodes": mn,
             "flamebearer": flamebearer(q, fr, un, mn)}
            for (q, fr, un, mn) in QUERIES
        ],
        "errors": ERRORS,
        "labels": label_names(),
        "label_values": {k: label_values(k) for k in label_names()},
        "apps": apps(),
    }
    with open(os.path.join(out_dir, "profileql_compliance_golden.json"),
              "w") as f:
        json.dump(golden, f, indent=1)
    print("queries:", len(QUERIES), "errors:", len(ERRORS))


if __name__ == "__main__":
    main()
