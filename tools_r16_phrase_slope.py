#!/usr/bin/env python
"""r16: close the phrase-search slope flag (VERDICT r15 Next-round #5).

The r15 full scale_check read phrase 1/2.13/4.64 across 1x/2x/4x — but
with the PRE-fix hook that ran c searches at copy level c (c scans of a
c-sized corpus = a c-squared measurement artifact; fixed in 23520ee to
ONE search per point). This re-runs ONLY the phrase hook with the fixed
shape, interleaved min-of-3 with one untimed warm pass per point (the
scale_check protocol), and prints the slope table the flag asks for.

phrase_search's scale shape: postings are FILTERED to the phrase terms
pre-shuffle (only matching postings shuffle), anchor-normalized
positional match — the dominant cost is the tokenize+posexplode+filter
scan, ∝ corpus size; the true-match set is CONSTANT across copies
(copy-a's vocabulary exists at every level, disjoint-vocab copies never
cross-match), so linear-or-better slope = operator holds.

Usage: python tools_r16_phrase_slope.py [n_trials]
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    trials = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    sf_dir = "/root/testdata/sf0.1"

    from scabillmatch_spark.session import get_spark

    import scale_check as sck
    from scabillmatch_spark.operators.retrieval import phrase_search

    spark = get_spark("phrase_slope")
    spark.read.parquet(f"{sf_dir}/documents.parquet").count()

    docs = {c: sck.corpus(spark, sf_dir, c) for c in (1, 2, 4)}
    n_rows = {}

    def run(c):
        t0 = time.perf_counter()
        n_rows[c] = phrase_search(docs[c], ["qatable", "qascan"]).count()
        return round(time.perf_counter() - t0, 3)

    for c in (1, 2, 4):  # untimed warm pass per point
        run(c)
    res: dict[int, list] = {c: [] for c in (1, 2, 4)}
    for _ in range(trials):
        for c in (1, 2, 4):
            res[c].append(run(c))
    mins = {c: min(res[c]) for c in (1, 2, 4)}
    base = mins[1]
    for c in (1, 2, 4):
        print(
            f"copies={c} min={mins[c]}s slope={round(mins[c]/base, 2)} "
            f"rows={n_rows[c]} trials={res[c]}"
        )


if __name__ == "__main__":
    main()
