#!/usr/bin/env python3
"""Round-end bench hygiene gate (VERDICT r11 item 1): refuse a contended
bench_full.json before it is committed.

The committed artifact is the longitudinal record; a run taken while the
host is stolen (r10: 420 s vs 189 s quiet; r11 snapshot: 299.9 s vs
247.1 s boundary) poisons every later round-over-round comparison. This
gate compares the CANDIDATE's per-query mean (total / n_queries — the
face count grows every round, so totals alone don't compare) against the
median per-query mean of the bench_full.json artifacts in git history,
and exits non-zero above 1.15x — the round-end routine must re-measure
quiet instead of committing.

Usage: python3 scripts/bench_guard.py [bench_full.json]
(run from the repo root, BEFORE `git add bench_full.json`)
"""
import json
import statistics
import subprocess
import sys


def per_query(doc):
    n = len(doc.get("queries") or {})
    return doc["value"] / max(n, 1), n


def main():
    path = sys.argv[1] if len(sys.argv) > 1 else "bench_full.json"
    cand = json.load(open(path))
    cpq, n = per_query(cand)
    revs = subprocess.check_output(
        ["git", "rev-list", "HEAD", "--", path], text=True).split()
    hist = []
    for r in revs[:12]:
        try:
            doc = json.loads(subprocess.check_output(
                ["git", "show", f"{r}:{path}"], text=True,
                stderr=subprocess.DEVNULL))
            hist.append(per_query(doc)[0])
        except Exception:
            pass
    if not hist:
        print(f"[bench-guard] no committed history for {path}; "
              f"candidate {cpq:.3f} s/q accepted")
        return 0
    med = statistics.median(hist)
    ratio = cpq / med
    ok = ratio <= 1.15
    print(f"[bench-guard] candidate {cand['value']:.1f} s / {n} q "
          f"= {cpq:.3f} s/q; history median {med:.3f} s/q "
          f"(n={len(hist)}); ratio {ratio:.2f} -> "
          f"{'OK' if ok else 'REFUSE: contended run, re-measure quiet'}")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
