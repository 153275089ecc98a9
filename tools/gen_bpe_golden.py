#!/usr/bin/env python3
"""BPE trainer golden generator — an INDEPENDENT implementation of the
Sennrich et al. 2016 merge-learning loop (whitespace vocabulary,
highest-count adjacent pair, ties broken lexicographically on (l, r),
greedy left-to-right merge application), sharing no code with the
Scala trainer. Runs over the sf0.01 documents corpus and writes the
first 64 merges to src/test/resources/bpe_golden.json; BpeSpec pins
graft.pipeline.Bpe.train against it.

Driver-side python (pyarrow only). Regenerate with
`python3 tools/gen_bpe_golden.py` after a testdata regeneration.
"""
import json
import os
from collections import Counter

import pyarrow.parquet as pq

SF_DIR = "/root/testdata/sf0.01"
N_MERGES = 64


def train(vocab, n_merges):
    words = [(list(w), n) for w, n in vocab.items()]
    merges = []
    for _ in range(n_merges):
        pairs = Counter()
        for syms, n in words:
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] += n
        if not pairs:
            break
        # highest count; ties break lexicographically on (l, r)
        (l, r), n = min(pairs.items(), key=lambda e: (-e[1], e[0]))
        merges.append({"rank": len(merges) + 1, "l": l, "r": r, "n": n})
        nxt = []
        for syms, wn in words:
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == l and syms[i + 1] == r:
                    out.append(l + r)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            nxt.append((out, wn))
        words = nxt
    return merges


def main():
    docs = pq.read_table(os.path.join(SF_DIR, "documents.parquet"),
                         columns=["text"])
    vocab = Counter()
    for chunk in docs.column("text").to_pylist():
        for w in chunk.split(" "):
            if w:
                vocab[w] += 1
    merges = train(vocab, N_MERGES)
    out = os.path.join(os.path.dirname(__file__), "..",
                       "src", "test", "resources", "bpe_golden.json")
    with open(out, "w") as f:
        json.dump({"sf_dir": SF_DIR, "n_merges": N_MERGES,
                   "merges": merges}, f, indent=1)
    print(f"wrote {len(merges)} merges to {out}")


if __name__ == "__main__":
    main()
