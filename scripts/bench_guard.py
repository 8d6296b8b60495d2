#!/usr/bin/env python3
"""Round-end bench hygiene gate (VERDICT r11 item 1): refuse a contended
bench_full.json before it is committed.

The committed artifact is the longitudinal record; a run taken while the
host is stolen (r10: 420 s vs 189 s quiet; r11 snapshot: 299.9 s vs
247.1 s boundary) poisons every later round-over-round comparison.

Metric: the MEDIAN per-query ratio of the candidate against the most
recent committed artifact (common queries only). Contention steals CPU
from every query, so it moves the median (r11 contended snapshot: 1.24
vs its quiet predecessor); a host-EPOCH shift in per-job scheduler
latency moves only the round-latency-bound iterative tail while the
volume-bound bulk stays flat (r12 quiet on a 95.6 ms/job epoch: median
1.13, graph tail 2-4x). A plain total/mean cannot tell these apart —
it refused an honest quiet run at r12. The per-job floor is recorded in
the artifact itself (Bench's job_floor_ms) so the tail is interpretable
either way.

Exit 1 when the median ratio exceeds 1.15 — re-measure on a quiet host
instead of committing.

Usage: python3 scripts/bench_guard.py [bench_full.json]
(run from the repo root, BEFORE `git add bench_full.json`)
"""
import json
import statistics
import subprocess
import sys


def main():
    path = sys.argv[1] if len(sys.argv) > 1 else "bench_full.json"
    cand = json.load(open(path))
    cq = cand.get("queries") or {}
    cpq = cand["value"] / max(len(cq), 1)
    floor = cand.get("job_floor_ms")
    revs = subprocess.check_output(
        ["git", "rev-list", "HEAD", "--", path], text=True).split()
    base = None
    for r in revs:
        try:
            doc = json.loads(subprocess.check_output(
                ["git", "show", f"{r}:{path}"], text=True,
                stderr=subprocess.DEVNULL))
            if doc.get("queries"):
                base = doc
                break
        except Exception:
            pass
    if base is None:
        print(f"[bench-guard] no committed history for {path}; "
              f"candidate {cpq:.3f} s/q accepted")
        return 0
    bq = base["queries"]
    common = [k for k in cq if k in bq and bq[k] > 0.05]
    if not common:
        print("[bench-guard] no comparable queries vs history; accepted")
        return 0
    med = statistics.median(cq[k] / bq[k] for k in common)
    ok = med <= 1.15
    floor_s = f" job_floor={floor} ms" if floor is not None else ""
    print(f"[bench-guard] candidate {cand['value']:.1f} s / {len(cq)} q "
          f"= {cpq:.3f} s/q{floor_s}; median per-query ratio vs previous "
          f"committed artifact ({base['value']:.1f} s, n={len(common)} "
          f"common) = {med:.2f} -> "
          f"{'OK' if ok else 'REFUSE: uniform inflation = contended run, re-measure quiet'}")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
