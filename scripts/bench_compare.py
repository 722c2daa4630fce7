#!/usr/bin/env python
"""Diff two bench.py JSON outputs: per-query deltas on the common set,
flagging regressions above the review bar (>1.5x AND >0.5s absolute).

Usage: python scripts/bench_compare.py BENCH_old.json BENCH_new.json

Timings on this box swing 2-10x run-to-run on unchanged code (documented
in CHANGELOG round notes) — treat single-run regressions as suspects to
re-measure best-of-N, not verdicts.
"""

from __future__ import annotations

import json
import sys


def _load(path: str) -> dict:
    d = json.load(open(path))
    # driver BENCH_r{N}.json wraps the bench line under "parsed"
    return d.get("parsed") or d


def main(old_path: str, new_path: str) -> int:
    old = _load(old_path)
    new = _load(new_path)
    qo, qn = old.get("queries", {}), new.get("queries", {})
    common = sorted(set(qo) & set(qn))
    if not common:
        print("no common queries")
        return 1
    to, tn = sum(qo[q] for q in common), sum(qn[q] for q in common)
    print(
        f"common {len(common)} queries: {to:.1f}s -> {tn:.1f}s "
        f"({tn / to:.2f}x)   [totals incl. uncommon: "
        f"{old.get('value')}s/{old.get('n_queries')}q -> "
        f"{new.get('value')}s/{new.get('n_queries')}q]"
    )
    regressions = []
    improvements = []
    for q in common:
        a, b = qo[q], qn[q]
        if b > 1.5 * a and b - a > 0.5:
            regressions.append((q, a, b))
        elif a > 1.5 * b and a - b > 0.5:
            improvements.append((q, a, b))
    for label, rows in (("REGRESSION", regressions), ("improved", improvements)):
        for q, a, b in sorted(rows, key=lambda r: r[1] - r[2]):
            print(f"  {label:10s} {q:6s} {a:6.2f}s -> {b:6.2f}s ({b / a:.2f}x)")
    only_new = sorted(set(qn) - set(qo))
    if only_new:
        print(f"  new queries: {', '.join(f'{q}={qn[q]:.2f}s' for q in only_new)}")
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
