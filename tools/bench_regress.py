#!/usr/bin/env python3
"""Round-over-round regression gate.

Two modes:

1. Merged-artifact mode (round-11 verdict item 7): compares two merged
   bench artifacts produced by the SAME methodology (bench_merge.py
   over >=2 fresh same-session runs, with --fresh): per-query min and
   fresh_total, naming every query whose per-query min regressed by
   more than the threshold.

2. Interleaved mode (round-15 verdict item 6; add --prev-runs/
   --curr-runs): same-HEAD fresh totals spanned 110-138 s in r15, so a
   fresh-vs-fresh comparison mostly measures WHICH VM WINDOW each side
   landed in. The campaign now runs the prior round's HEAD and the
   current HEAD alternately (P/C/P/C/P/C) so contention windows hit
   both sides; this tool then compares PER-QUERY MEDIANS across each
   side's runs and reports a variance figure (per-query relative
   spread (max-min)/median, summarized as median and p90 per side) so
   the report carries its own noise context. When interleaved runs are
   given, the regressed/floor/improved lists are computed from the
   interleaved medians — the merged artifacts remain in the report as
   the headline totals.

Usage:
    python3 tools/bench_regress.py prev.json curr.json [--threshold 1.5] \
        [--floor 0.3] [--out report.json] \
        [--prev-runs a.json,b.json,c.json --curr-runs d.json,e.json,f.json]

--floor: queries whose BOTH sides are under `floor` seconds are
reported separately — at this VM's measured noise (sub-second timings
swing 1.7-1.8x run-to-run on identical code, r11 finding), a ratio on
two overhead-floor numbers is not evidence of a regression.
"""
import argparse
import json
import statistics


def load_runs(paths):
    runs = [json.load(open(p)) for p in paths]
    for p, r in zip(paths, runs):
        if "queries" not in r:
            raise SystemExit(f"{p}: no 'queries' map — not a bench run file")
        if r.get("failures"):
            raise SystemExit(f"{p}: run has failures {r['failures']} — not usable")
    return runs


def side_stats(runs):
    """Per-query median + relative spread over a side's runs."""
    shared = set(runs[0]["queries"])
    for r in runs[1:]:
        shared &= set(r["queries"])
    med, spread = {}, {}
    for q in shared:
        vals = [r["queries"][q] for r in runs]
        m = statistics.median(vals)
        med[q] = m
        spread[q] = (max(vals) - min(vals)) / m if m > 0 else 0.0
    return med, spread


def spread_summary(spread):
    vals = sorted(spread.values())
    if not vals:
        return {}
    p90 = vals[min(len(vals) - 1, int(round(0.9 * (len(vals) - 1))))]
    return {"median_rel_spread": round(statistics.median(vals), 3),
            "p90_rel_spread": round(p90, 3)}


def top_spread(med, spread, n=12):
    """Per-query spread for the noisiest queries (r16 verdict item 3:
    the summary alone can hide a real regression inside the noise band
    — name the queries that carry it, with their medians for scale)."""
    worst = sorted(spread, key=lambda q: -spread[q])[:n]
    return [{"query": q, "rel_spread": round(spread[q], 3),
             "median_sec": round(med[q], 3)} for q in worst]


def min_aliases(entries):
    """Merged-min-mode entries keep the pre-r16 key names alongside the
    unified ones so round-over-round artifacts stay schema-comparable
    (r16 ADVICE: consumers keyed on prev_min_sec broke silently)."""
    return [dict(e, prev_min_sec=e["prev_sec"], curr_min_sec=e["curr_sec"])
            for e in entries]


def classify(prev_q, curr_q, threshold, floor):
    shared = sorted(set(prev_q) & set(curr_q))
    regressed, floor_noise, improved = [], [], []
    for name in shared:
        p, c = prev_q[name], curr_q[name]
        if c > 0 and p > 2 * c:
            improved.append({"query": name, "prev_sec": round(p, 3),
                             "curr_sec": round(c, 3), "ratio": round(c / p, 2)})
        if p <= 0 or c <= p * threshold:
            continue
        entry = {"query": name, "prev_sec": round(p, 3),
                 "curr_sec": round(c, 3), "ratio": round(c / p, 2)}
        (floor_noise if (p < floor and c < floor) else regressed).append(entry)
    return (shared,
            sorted(regressed, key=lambda e: -e["ratio"]),
            sorted(floor_noise, key=lambda e: -e["ratio"]),
            sorted(improved, key=lambda e: e["ratio"]))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("prev")
    ap.add_argument("curr")
    ap.add_argument("--threshold", type=float, default=1.5)
    ap.add_argument("--floor", type=float, default=0.3)
    ap.add_argument("--out", default=None)
    ap.add_argument("--prev-runs", default=None,
                    help="comma-separated raw bench runs of the PRIOR head, "
                         "interleaved with --curr-runs")
    ap.add_argument("--curr-runs", default=None,
                    help="comma-separated raw bench runs of the CURRENT head")
    args = ap.parse_args()
    prev = json.load(open(args.prev))
    curr = json.load(open(args.curr))

    interleaved = None
    if bool(args.prev_runs) != bool(args.curr_runs):
        raise SystemExit("--prev-runs and --curr-runs must be given together")
    if args.prev_runs:
        prev_paths = args.prev_runs.split(",")
        curr_paths = args.curr_runs.split(",")
        prev_runs = load_runs(prev_paths)
        curr_runs = load_runs(curr_paths)
        for label, runs in (("prev", prev_runs), ("curr", curr_runs)):
            shas = {r.get("head_sha") for r in runs}
            if len(shas) > 1:
                raise SystemExit(f"{label} runs span multiple heads: {shas}")
        p_med, p_spread = side_stats(prev_runs)
        c_med, c_spread = side_stats(curr_runs)
        shared, regressed, floor_noise, improved = classify(
            p_med, c_med, args.threshold, args.floor)
        # each classified entry carries both sides' spread so a reader
        # can tell a real shift from two noisy medians at a glance
        for lst in (regressed, floor_noise, improved):
            for e in lst:
                e["prev_rel_spread"] = round(p_spread.get(e["query"], 0.0), 3)
                e["curr_rel_spread"] = round(c_spread.get(e["query"], 0.0), 3)
        interleaved = {
            "prev_runs": prev_paths,
            "curr_runs": curr_paths,
            "prev_head_sha": prev_runs[0].get("head_sha"),
            "curr_head_sha": curr_runs[0].get("head_sha"),
            "shared_queries": len(shared),
            "prev_median_total": round(sum(p_med[q] for q in shared), 1),
            "curr_median_total": round(sum(c_med[q] for q in shared), 1),
            "variance": {"prev": spread_summary(p_spread),
                         "curr": spread_summary(c_spread),
                         "top_spread_prev": top_spread(p_med, p_spread),
                         "top_spread_curr": top_spread(c_med, c_spread)},
            "regressed": regressed,
            "floor_noise": floor_noise,
            "improved_2x": improved,
        }

    # merged-artifact (min-based) comparison — the headline totals; the
    # classification lists come from the interleaved medians when
    # available (they carry the noise-robust signal), else from mins
    shared, m_regressed, m_floor, m_improved = classify(
        prev["queries"], curr["queries"], args.threshold, args.floor)
    m_regressed, m_floor, m_improved = (
        min_aliases(m_regressed), min_aliases(m_floor), min_aliases(m_improved))
    report = {
        "prev": {"file": args.prev, "head_sha": prev.get("head_sha"),
                 "fresh_total": prev.get("fresh_total"),
                 "min_total": round(sum(prev["queries"][n] for n in shared), 1)},
        "curr": {"file": args.curr, "head_sha": curr.get("head_sha"),
                 "fresh_total": curr.get("fresh_total"),
                 "min_total": round(sum(curr["queries"][n] for n in shared), 1)},
        "shared_queries": len(shared),
        "threshold": args.threshold,
        "basis": "interleaved_medians" if interleaved else "merged_mins",
        "regressed": interleaved["regressed"] if interleaved else m_regressed,
        "floor_noise": interleaved["floor_noise"] if interleaved else m_floor,
        "improved_2x": interleaved["improved_2x"] if interleaved else m_improved,
        "merged_min_regressed": m_regressed,
    }
    if interleaved:
        report["interleaved"] = interleaved
    text = json.dumps(report, indent=1)
    if args.out:
        with open(args.out, "w") as f:
            f.write(text + "\n")
    print(text)


if __name__ == "__main__":
    main()
