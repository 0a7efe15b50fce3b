#!/usr/bin/env python3
"""Merge two StressSmoke runs (1x baseline + Nx replicas) into the
round's BENCH_rNN_sf1.json artifact. Summary fields (totals, max_ratio)
are COMPUTED from the per-query entries at write time, so the artifact
can never contradict itself (the round-5 stale-max_ratio bug).

Usage:
    python3 tools/stress_merge.py <base.json> <x10.json> <out.json> \
        [--replicas 10] [--note "..."] [--bench bench.json] [--merge-into existing.json]

<base.json>/<x10.json> are SPARK_GRAFT_STRESS_OUT files ({"queries":
{name: sec}}). --bench optionally attaches the round's local[32] bench
time per query as bench32_sec. --merge-into starts from an existing
artifact's queries (new entries override same-named old ones) so a
subset re-run can extend the round's artifact.
"""
import argparse
import json


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("base")
    ap.add_argument("x10")
    ap.add_argument("out")
    ap.add_argument("--replicas", type=int, default=10)
    ap.add_argument("--note", default="")
    ap.add_argument("--bench", default=None)
    ap.add_argument("--merge-into", default=None)
    args = ap.parse_args()

    base = json.load(open(args.base))["queries"]
    x10 = json.load(open(args.x10))["queries"]
    bench = {}
    if args.bench:
        bench = json.load(open(args.bench))["queries"]

    queries = {}
    if args.merge_into:
        queries = json.load(open(args.merge_into))["queries"]

    for name in sorted(x10):
        if name not in base:
            raise SystemExit(f"{name} present in x10 but not in base run")
        entry = {
            "sf0.1_sec": round(base[name], 3),
            f"x{args.replicas}_sec": round(x10[name], 3),
            "ratio": round(x10[name] / base[name], 2) if base[name] > 0 else None,
        }
        if name in bench:
            entry["bench32_sec"] = round(bench[name], 3)
        queries[name] = entry

    ratios = [v["ratio"] for v in queries.values() if v.get("ratio") is not None]
    xkey = f"x{args.replicas}_sec"
    artifact = {
        "metric": f"stress_{args.replicas}x",
        "unit": "sec",
        "replicas": args.replicas,
        "shuffle_partitions": 200,
        "note": args.note,
        # summary fields derived from the entries they summarize —
        # never hand-written
        "total_x10_sec": round(sum(v[xkey] for v in queries.values() if xkey in v), 1),
        "total_sf01_sec": round(sum(v["sf0.1_sec"] for v in queries.values()), 1),
        "max_ratio": max(ratios) if ratios else None,
        "max_ratio_query": max(
            (v["ratio"], k) for k, v in queries.items() if v.get("ratio") is not None
        )[1] if ratios else None,
        "queries": queries,
    }
    with open(args.out, "w") as f:
        json.dump(artifact, f, indent=1)
        f.write("\n")
    print(f"{args.out}: {len(queries)} queries, max_ratio "
          f"{artifact['max_ratio']} ({artifact['max_ratio_query']})")


if __name__ == "__main__":
    main()
