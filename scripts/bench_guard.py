#!/usr/bin/env python3
"""Round-end bench hygiene gate (VERDICT r11 item 1): refuse a contended
bench_full.json before it is committed.

The committed artifact is the longitudinal record; a run taken while the
host is stolen (r10: 420 s vs 189 s quiet; r11 snapshot: 299.9 s vs
247.1 s boundary) poisons every later round-over-round comparison.

Metric: the MEDIAN per-query ratio of the candidate against the most
recent committed artifact that differs from it (common queries only).
Contention steals CPU from every query, so it moves the median (r11
contended snapshot: 1.24 vs its quiet predecessor); a host-EPOCH shift
in per-job scheduler latency moves only the round-latency-bound
iterative tail while the volume-bound bulk stays flat (r12 quiet on a
95.6 ms/job epoch: median 1.13, graph tail 2-4x). A plain total/mean
cannot tell these apart — it refused an honest quiet run at r12.

When BOTH artifacts carry per-query scheduled-job counts ("jobs") and
their own "job_floor_ms" (VERDICT r12 item 2), the gate uses the
FLOOR-CORRECTED ratio median instead: (t - jobs x floor) strips the
scheduler-latency term each query pays on its own host epoch, so the
comparison reads plan work against plan work and an epoch shift no
longer needs hand adjudication. Contention still trips it: stolen CPU
inflates the volume-bound remainder uniformly. Queries whose corrected
base time is at the floor (< 50 ms of plan work) are excluded — their
corrected ratio is 0/0 noise by construction.

Baseline selection (ADVICE r12): a revision whose committed blob is
byte-identical to the candidate is SKIPPED — running the guard after
`git add && git commit` would otherwise compare the artifact to itself
(median 1.00) and always pass. When that happens the guard warns that
it is running post-commit and compares against the most recent
DISTINCT committed artifact, so the verdict is the same one a
correctly-ordered pre-commit run would have produced.

Exit 1 when the gating median ratio exceeds 1.15 — re-measure on a
quiet host instead of committing (or, post-commit, restore the previous
committed artifact).

Usage: python3 scripts/bench_guard.py [bench_full.json]
(run from the repo root, BEFORE `git add bench_full.json`)
"""
import json
import statistics
import subprocess
import sys


def main():
    path = sys.argv[1] if len(sys.argv) > 1 else "bench_full.json"
    cand_text = open(path).read()
    cand = json.loads(cand_text)
    cq = cand.get("queries") or {}
    cpq = cand["value"] / max(len(cq), 1)
    floor = cand.get("job_floor_ms")
    revs = subprocess.check_output(
        ["git", "rev-list", "HEAD", "--", path], text=True).split()
    base = None
    post_commit = False
    for r in revs:
        try:
            blob = subprocess.check_output(
                ["git", "show", f"{r}:{path}"], text=True,
                stderr=subprocess.DEVNULL)
            if blob.strip() == cand_text.strip():
                post_commit = True
                continue
            doc = json.loads(blob)
            if doc.get("queries"):
                base = doc
                break
        except Exception:
            pass
    if post_commit:
        print("[bench-guard] WARNING: candidate is already committed — "
              "running post-commit; comparing against the most recent "
              "DISTINCT committed artifact")
    if base is None:
        print(f"[bench-guard] no distinct committed history for {path}; "
              f"candidate {cpq:.3f} s/q accepted")
        return 0
    bq = base["queries"]
    common = [k for k in cq if k in bq and bq[k] > 0.05]
    if not common:
        print("[bench-guard] no comparable queries vs history; accepted")
        return 0
    med_raw = statistics.median(cq[k] / bq[k] for k in common)
    cj, bj = cand.get("jobs") or {}, base.get("jobs") or {}
    bfloor = base.get("job_floor_ms")
    corrected = (floor is not None and bfloor is not None
                 and cj and bj)
    if corrected:
        ratios = []
        for k in common:
            cb = cq[k] - cj.get(k, 0) * floor / 1000.0
            bb = bq[k] - bj.get(k, 0) * bfloor / 1000.0
            if bb < 0.05:  # base is pure floor: corrected ratio is noise
                continue
            ratios.append(max(cb, 0.02) / bb)
        if ratios:
            med = statistics.median(ratios)
            mode = f"floor-corrected (n={len(ratios)}), raw {med_raw:.2f}"
        else:
            med, mode = med_raw, "raw (all base queries at floor)"
    else:
        med, mode = med_raw, "raw (job counts absent on one side)"
    # job-count drift is a PLAN signal, independent of timing: a query
    # whose scheduled-job count grew means new shuffles/actions/rounds
    # (AQE variance is ±1-2 jobs; growth beyond that is a regression
    # candidate). Warn, don't gate — some faces legitimately vary with
    # data-dependent round counts.
    if cj and bj:
        drift = sorted(((k, bj[k], cj[k]) for k in common
                        if k in cj and k in bj
                        and cj[k] > bj[k] + max(2, 0.2 * bj[k])),
                       key=lambda t: t[2] - t[1], reverse=True)
        for k, b, c in drift[:10]:
            print(f"[bench-guard] WARNING job-count drift {k}: {b} -> {c} "
                  f"scheduled jobs (plan regression candidate)")
    ok = med <= 1.15
    floor_s = f" job_floor={floor} ms" if floor is not None else ""
    print(f"[bench-guard] candidate {cand['value']:.1f} s / {len(cq)} q "
          f"= {cpq:.3f} s/q{floor_s}; median per-query ratio vs previous "
          f"distinct committed artifact ({base['value']:.1f} s, "
          f"n={len(common)} common) = {med:.2f} [{mode}] -> "
          f"{'OK' if ok else 'REFUSE: uniform inflation = contended run, re-measure quiet'}")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
