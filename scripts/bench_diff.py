#!/usr/bin/env python3
"""Compare two graft.Bench JSON outputs (bench_out.json files).

Reports the per-query relative delta and the worst mover among queries
above a floor (default 0.5 s in the baseline run — below that, fixed
per-job scheduling noise dominates and relative deltas are not
meaningful). A query fails the gate only if it moved BOTH more than
the relative tolerance (default 15%) AND more than the absolute one
(default 0.2 s — the allclose rtol+atol discipline: at sub-second
runtimes the ~0.1-0.2 s per-job scheduling jitter of a shared local
JVM dominates any relative measure). Exit code 1 on failure, so two
consecutive runs can gate reproducibility:

    python3 scripts/bench_diff.py run1.json run2.json [floor] [tol_pct] [atol_sec]
"""
import json
import sys


def main() -> int:
    a = json.load(open(sys.argv[1]))
    b = json.load(open(sys.argv[2]))
    floor = float(sys.argv[3]) if len(sys.argv) > 3 else 0.5
    tol = float(sys.argv[4]) / 100 if len(sys.argv) > 4 else 0.15
    atol = float(sys.argv[5]) if len(sys.argv) > 5 else 0.2
    qa, qb = a["queries"], b["queries"]
    if a.get("trials") != b.get("trials"):
        print(f"WARNING: asymmetric trial counts "
              f"{a.get('trials')} vs {b.get('trials')}")
    common = sorted(set(qa) & set(qb))
    rows = []
    for q in common:
        ta, tb = qa[q], qb[q]
        rel = (tb - ta) / ta if ta > 0 else float("inf")
        rows.append((q, ta, tb, rel))
    gated = [r for r in rows if r[1] >= floor]
    bad = [r for r in gated if abs(r[3]) > tol and abs(r[2] - r[1]) > atol]
    rows.sort(key=lambda r: -abs(r[3]))
    print(f"{len(common)} common queries; total "
          f"{sum(qa[q] for q in common):.2f}s -> "
          f"{sum(qb[q] for q in common):.2f}s; "
          f"{len(gated)} above {floor}s floor, tolerance {tol:.0%} rel + {atol}s abs")
    print("worst movers (any size):")
    for q, ta, tb, rel in rows[:8]:
        print(f"  {q:28s} {ta:6.2f}s -> {tb:6.2f}s  {rel:+6.1%}")
    if bad:
        print(f"FAIL: {len(bad)} above-floor queries moved > {tol:.0%} and > {atol}s:")
        for q, ta, tb, rel in sorted(bad, key=lambda r: -abs(r[3])):
            print(f"  {q:28s} {ta:6.2f}s -> {tb:6.2f}s  {rel:+6.1%}")
        return 1
    print(f"OK: every above-floor query within {tol:.0%} (or {atol}s absolute)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
