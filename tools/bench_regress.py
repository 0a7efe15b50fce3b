#!/usr/bin/env python3
"""Fresh-vs-fresh round-over-round regression gate (round-11 verdict
item 7). Compares two merged bench artifacts produced by the SAME
methodology (bench_merge.py over >=2 fresh same-session runs, with
--fresh): per-query min and fresh_total, naming every query whose
per-query min regressed by more than the threshold.

Usage:
    python3 tools/bench_regress.py prev.json curr.json [--threshold 1.5] \
        [--floor 0.3] [--out report.json]

--floor: queries whose BOTH sides are under `floor` seconds are
reported separately — at this VM's measured noise (sub-second timings
swing 1.7-1.8x run-to-run on identical code, r11 finding), a ratio on
two overhead-floor numbers is not evidence of a regression.
"""
import argparse
import json


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("prev")
    ap.add_argument("curr")
    ap.add_argument("--threshold", type=float, default=1.5)
    ap.add_argument("--floor", type=float, default=0.3)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()
    prev = json.load(open(args.prev))
    curr = json.load(open(args.curr))
    shared = sorted(set(prev["queries"]) & set(curr["queries"]))
    regressed, floor_noise = [], []
    for name in shared:
        p, c = prev["queries"][name], curr["queries"][name]
        if p <= 0 or c <= p * args.threshold:
            continue
        entry = {"query": name, "prev_min_sec": p, "curr_min_sec": c,
                 "ratio": round(c / p, 2)}
        (floor_noise if (p < args.floor and c < args.floor) else regressed).append(entry)
    report = {
        "prev": {"file": args.prev, "head_sha": prev.get("head_sha"),
                 "fresh_total": prev.get("fresh_total"),
                 "min_total": round(sum(prev["queries"][n] for n in shared), 1)},
        "curr": {"file": args.curr, "head_sha": curr.get("head_sha"),
                 "fresh_total": curr.get("fresh_total"),
                 "min_total": round(sum(curr["queries"][n] for n in shared), 1)},
        "shared_queries": len(shared),
        "threshold": args.threshold,
        "regressed": sorted(regressed, key=lambda e: -e["ratio"]),
        "floor_noise": sorted(floor_noise, key=lambda e: -e["ratio"]),
        "improved_2x": sorted(
            [{"query": n, "prev_min_sec": prev["queries"][n],
              "curr_min_sec": curr["queries"][n],
              "ratio": round(curr["queries"][n] / prev["queries"][n], 2)}
             for n in shared
             if curr["queries"][n] > 0 and prev["queries"][n] > 2 * curr["queries"][n]],
            key=lambda e: e["ratio"]),
    }
    text = json.dumps(report, indent=1)
    if args.out:
        with open(args.out, "w") as f:
            f.write(text + "\n")
    print(text)


if __name__ == "__main__":
    main()
