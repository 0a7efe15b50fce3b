#!/usr/bin/env python3
"""Merge StressSmoke runs (1x baseline + Nx replicas) into the round's
BENCH_rNN_sf1.json artifact. Summary fields (totals, max_ratio) are
COMPUTED from the per-query entries at write time, so the artifact can
never contradict itself (the round-5 stale-max_ratio bug).

Both sides accept comma-separated run lists; per-query minimum across
the surviving runs is the noise-floor estimator on this VM (documented
up-to-10x run-to-run contention variance).

Validation (the round-6 fabricated-artifact bug): a run whose JSON
carries a non-empty "failed" array — a crashed or partial StressSmoke —
is REJECTED whole, and any merged entry whose Nx time is implausibly
below its 1x time (x10 < 0.5 * base) is dropped and recorded in the
artifact's "dropped_entries", so a bogus near-zero timing can never
min-merge into a self-consistent-looking sub-linear claim.

Usage:
    python3 tools/stress_merge.py base1.json,base2.json x10a.json,x10b.json out.json \
        [--replicas 10] [--note "..."] [--bench bench.json] \
        [--merge-into existing.json] [--x100 x100.json --x100-replicas 100]
"""
import argparse
import datetime
import json
import re
import subprocess
import sys


def provenance():
    """HEAD sha + UTC timestamp (round-11 verdict: unstamped artifacts
    are indistinguishable from stale number bumps)."""
    try:
        sha = subprocess.run(["git", "rev-parse", "HEAD"],
                             capture_output=True, text=True,
                             check=True).stdout.strip()
    except (OSError, subprocess.CalledProcessError):
        sha = None
    return {"head_sha": sha,
            "generated_utc": datetime.datetime.now(
                datetime.timezone.utc).isoformat(timespec="seconds")}


def load_runs(spec, side, expected_replicas):
    """Load a comma-separated run list, rejecting crashed/partial runs
    and runs whose declared scale doesn't match the slot they're merged
    into (StressSmoke labels every run "sf":"<src>xN"; a 10x file in the
    base slot would inflate the baseline and silently deflate every
    ratio, so a mislabel is a hard error, not a skip)."""
    head_sha = provenance()["head_sha"]
    runs = []
    for path in spec.split(","):
        try:
            run = json.load(open(path))
        except (OSError, json.JSONDecodeError) as e:
            print(f"WARNING: {side} run {path} unreadable ({e}) — rejected",
                  file=sys.stderr)
            continue
        # r12 ADVICE: merge-time stamping alone launders stale run files
        # into a freshly-stamped artifact — every run must carry the
        # HEAD it was measured at, and it must be THIS head. (A -dirty
        # suffix means the measuring tree had uncommitted changes.)
        run_sha = run.get("head_sha")
        if not run_sha:
            raise SystemExit(f"{side} run {path}: no head_sha in artifact "
                             "(pre-r13 binary or hand-edited) — rejected")
        if head_sha and run_sha != head_sha:
            raise SystemExit(f"{side} run {path}: produced at {run_sha}, "
                             f"merging at {head_sha} — stale run rejected")
        m = re.search(r"x(\d+)$", run.get("sf", ""))
        declared = int(m.group(1)) if m else None
        if declared != expected_replicas:
            raise SystemExit(
                f"{side} run {path} declares scale "
                f"{run.get('sf', '<missing>')!r} (x{declared}) but this slot "
                f"expects x{expected_replicas} — wrong file in the slot")
        failed = run.get("failed", [])
        if failed:
            print(f"WARNING: {side} run {path} has {len(failed)} failed "
                  f"queries ({','.join(failed[:5])}…) — rejected whole",
                  file=sys.stderr)
            continue
        runs.append((run["queries"], run.get("out_rows", {})))
    if not runs:
        raise SystemExit(f"no valid {side} runs among: {spec}")
    return runs


def min_merge(runs):
    """Per-query min seconds across runs, plus the per-query output
    cardinality (out_rows is a property of the query at that scale, not
    a timing — runs of identical code must agree; the max across runs
    is taken so a truncated capture can only under-claim the ratio
    denominator, never inflate it)."""
    out, rows = {}, {}
    for run, orows in runs:
        for name, sec in run.items():
            out[name] = min(out.get(name, float("inf")), sec)
        for name, r in orows.items():
            rows[name] = max(rows.get(name, 0), int(r))
    return out, rows


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("base", help="comma-separated 1x run JSONs")
    ap.add_argument("x10", help="comma-separated Nx run JSONs")
    ap.add_argument("out")
    ap.add_argument("--replicas", type=int, default=10)
    ap.add_argument("--note", default="")
    ap.add_argument("--bench", default=None,
                    help="attach local[32] bench seconds as bench32_sec")
    ap.add_argument("--merge-into", default=None,
                    help="start from an existing artifact's queries")
    ap.add_argument("--x100", default=None,
                    help="spot-probe run JSON at a higher replica count")
    ap.add_argument("--x100-replicas", type=int, default=100)
    ap.add_argument("--keep-x100", action="store_true",
                    help="carry the --merge-into artifact's existing x100 "
                         "probes forward (for delta merges that only re-run "
                         "a few queries: probes whose kernels are untouched "
                         "since the base artifact's measurement stay valid; "
                         "the base artifact's note records their HEAD). New "
                         "--x100 runs still overwrite per-probe entries.")
    args = ap.parse_args()

    base, base_rows = min_merge(load_runs(args.base, "base", 1))
    x10, x10_rows = min_merge(load_runs(args.x10, f"x{args.replicas}", args.replicas))
    bench = {}
    if args.bench:
        bench = json.load(open(args.bench))["queries"]

    queries = {}
    if args.merge_into:
        queries = json.load(open(args.merge_into))["queries"]

    dropped = {}
    for name in sorted(x10):
        if name not in base:
            raise SystemExit(f"{name} present in x{args.replicas} but not in base run")
        # sanity gate: an Nx replication cannot plausibly run in under
        # half the 1x time — such an entry is a crashed run's residue
        if x10[name] < base[name] * 0.5:
            print(f"WARNING: {name} x{args.replicas}={x10[name]:.3f}s < "
                  f"0.5 * base={base[name]:.3f}s — implausible, dropped",
                  file=sys.stderr)
            dropped[name] = {"sf0.1_sec": round(base[name], 3),
                             f"x{args.replicas}_sec": round(x10[name], 3)}
            continue
        entry = {
            "sf0.1_sec": round(base[name], 3),
            f"x{args.replicas}_sec": round(x10[name], 3),
            "ratio": round(x10[name] / base[name], 2) if base[name] > 0 else None,
        }
        # output-normalized ratio: a raw ratio near the replica count is
        # only a scale problem when the OUTPUT didn'''t also grow — with
        # out_rows on both sides the artifact separates
        # output-proportional work (ratio_per_outrow ~ ratio/replicas)
        # from genuine super-linearity (ratio_per_outrow >> 1 with flat
        # output), instead of needing a prose note per offender
        if name in base_rows and name in x10_rows and base_rows[name] > 0 \
                and x10_rows[name] > 0 and base[name] > 0:
            entry["out_rows_1x"] = base_rows[name]
            entry[f"out_rows_x{args.replicas}"] = x10_rows[name]
            entry[f"sec_per_Mrow_x{args.replicas}"] = round(
                x10[name] / (x10_rows[name] / 1e6), 3)
            entry["ratio_per_outrow"] = round(
                (x10[name] / x10_rows[name]) / (base[name] / base_rows[name]), 2)
        if name in bench:
            entry["bench32_sec"] = round(bench[name], 3)
        queries[name] = entry

    # --merge-into must not smuggle in entries measured at a different
    # replica count (their x{N}_sec key wouldn't match): totals would
    # silently cover only a subset while being labeled the round total
    xkey = f"x{args.replicas}_sec"
    alien = {k: sorted(v) for k, v in queries.items()
             if "sf0.1_sec" not in v or xkey not in v}
    if alien:
        raise SystemExit(
            f"entries incompatible with --replicas {args.replicas} "
            f"(need sf0.1_sec + {xkey}): {alien}")

    ratios = [v["ratio"] for v in queries.values() if v.get("ratio") is not None]
    artifact = {
        "metric": f"stress_{args.replicas}x",
        **provenance(),
        "unit": "sec",
        "replicas": args.replicas,
        "shuffle_partitions": 200,
        "note": args.note,
        # summary fields derived from the entries they summarize —
        # never hand-written
        "total_x10_sec": round(sum(v[xkey] for v in queries.values()), 1),
        "total_sf01_sec": round(sum(v["sf0.1_sec"] for v in queries.values()), 1),
        "max_ratio": max(ratios) if ratios else None,
        "max_ratio_query": max(
            (v["ratio"], k) for k, v in queries.items() if v.get("ratio") is not None
        )[1] if ratios else None,
        "queries": queries,
    }
    if dropped:
        artifact["dropped_entries"] = dropped
    if args.keep_x100:
        if not args.merge_into:
            raise SystemExit("--keep-x100 requires --merge-into")
        kept = json.load(open(args.merge_into)).get(
            f"x{args.x100_replicas}_probes", {})
        if kept:
            artifact[f"x{args.x100_replicas}_probes"] = kept
    if args.x100:
        x100, x100_rows = min_merge(
            load_runs(args.x100, f"x{args.x100_replicas}", args.x100_replicas))
        # start from probes carried by --keep-x100 (if any); fresh runs
        # overwrite per-probe entries
        probes = dict(artifact.get(f"x{args.x100_replicas}_probes", {}))
        for name, sec in sorted(x100.items()):
            if name not in base:
                raise SystemExit(f"{name} in x100 probe but not in base run")
            if sec < base[name] * 0.5:
                print(f"WARNING: x100 probe {name}={sec:.3f}s implausible — dropped",
                      file=sys.stderr)
                continue
            entry = {
                "sf0.1_sec": round(base[name], 3),
                f"x{args.x100_replicas}_sec": round(sec, 3),
                "ratio": round(sec / base[name], 1) if base[name] > 0 else None,
                "linear_bound": args.x100_replicas,
            }
            # same output normalization the x10 entries carry (round-11
            # verdict item 3): a big raw ratio with proportionally-grown
            # output is output-bound work, not super-linearity — the
            # artifact should say so itself instead of needing prose
            if name in base_rows and name in x100_rows and base_rows[name] > 0 \
                    and x100_rows[name] > 0 and base[name] > 0:
                entry["out_rows_1x"] = base_rows[name]
                entry[f"out_rows_x{args.x100_replicas}"] = x100_rows[name]
                entry["ratio_per_outrow"] = round(
                    (sec / x100_rows[name]) / (base[name] / base_rows[name]), 2)
            probes[name] = entry
        artifact[f"x{args.x100_replicas}_probes"] = probes
    with open(args.out, "w") as f:
        json.dump(artifact, f, indent=1)
        f.write("\n")
    print(f"{args.out}: {len(queries)} queries, max_ratio "
          f"{artifact['max_ratio']} ({artifact['max_ratio_query']})"
          + (f", {len(dropped)} dropped" if dropped else ""))


if __name__ == "__main__":
    main()
