#!/usr/bin/env python3
"""Min-merge >=2 full graft.Bench runs into one committed artifact.

Single-run benches on this VM disagree by up to 20x per query from
contention (round-7 finding: q_interval_join 10.10 s vs 0.45 s on
identical code), so the per-query MINIMUM across runs is the noise-floor
estimator — same methodology stress_merge.py applies to the stress side.
The merged "value" is recomputed as the sum of the per-query minimums;
each input run's own total is preserved in "runs" for the contention
record.

Rejects: unparseable files, subset runs (metric "subset_total" /
an "only" field — a SPARK_GRAFT_BENCH_ONLY run is not a full bench),
runs with a non-empty "failures" array, and runs whose query sets
disagree (a partial run min-merged into a full one would understate
the total).

Usage:
    python3 tools/bench_merge.py run1.json run2.json [...] out.json
"""
import json
import sys


def main():
    if len(sys.argv) < 4:
        raise SystemExit(__doc__)
    *run_paths, out_path = sys.argv[1:]
    runs = []
    for path in run_paths:
        run = json.load(open(path))
        if run.get("metric") != "total" or "only" in run:
            raise SystemExit(f"{path}: not a full-suite bench "
                             f"(metric={run.get('metric')!r}) — rejected")
        if run.get("failures"):
            raise SystemExit(f"{path}: has failures {run['failures']} — rejected")
        runs.append((path, run))
    names = set(runs[0][1]["queries"])
    for path, run in runs[1:]:
        if set(run["queries"]) != names:
            raise SystemExit(f"{path}: query set differs from {runs[0][0]} — rejected")
    sfs = {run["sf"] for _, run in runs}
    if len(sfs) != 1:
        raise SystemExit(f"runs disagree on sf: {sorted(sfs)}")
    merged = {n: round(min(run["queries"][n] for _, run in runs), 4)
              for n in sorted(names)}
    artifact = {
        "metric": "total",
        "value": round(sum(merged.values()), 4),
        "unit": "sec",
        "queries": merged,
        "sf": sfs.pop(),
        "merge": "per-query min",
        "runs": [{"file": path, "total_sec": round(run["value"], 2)}
                 for path, run in runs],
    }
    with open(out_path, "w") as f:
        json.dump(artifact, f, indent=1)
        f.write("\n")
    totals = ", ".join(f"{r['total_sec']}" for r in artifact["runs"])
    print(f"{out_path}: {len(merged)} queries, min-merged total "
          f"{artifact['value']:.1f}s (single runs: {totals})")


if __name__ == "__main__":
    main()
