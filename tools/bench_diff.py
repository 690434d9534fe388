#!/usr/bin/env python3
"""Per-key cross-round bench comparison over the committed full records.

Usage:
    python3 tools/bench_diff.py bench_full_rA.json bench_full_rB.json \
        [--field medians|queries] [--threshold 1.5]

Compares B (newer) against A (older) per key and prints:
  - headline totals + calibrations (apply the SURVEY §6 rule: compare raw
    totals only when calibrations agree within ~25%; otherwise the raw and
    normalized ratios bracket the true code effect);
  - keys whose time ratio exceeds the threshold, slowest regressions first
    (check high_spread_passes in the newer record before believing any
    single outlier — ambient interference on this shared box is one-sided
    and spiky);
  - keys added or removed between the rounds.

Exit code 0 always — this is a report, not a gate (the gate is the DuckDB
compare + ScaleProbe; bench ratios on a shared box need human judgment).
"""
import argparse
import json
import sys


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("older")
    ap.add_argument("newer")
    ap.add_argument("--field", default="medians", choices=["medians", "queries"],
                    help="medians = noise-robust; queries = min-of-passes")
    ap.add_argument("--threshold", type=float, default=1.5)
    args = ap.parse_args()

    a = json.load(open(args.older))
    b = json.load(open(args.newer))
    fa, fb = a[args.field], b[args.field]

    print(f"older: total {a['value']} s / {len(fa)} keys, calibration {a.get('calibration')}")
    print(f"newer: total {b['value']} s / {len(fb)} keys, calibration {b.get('calibration')}")
    ca, cb = a.get("calibration"), b.get("calibration")
    if ca and cb:
        drift = max(ca, cb) / min(ca, cb)
        like = "LIKE-FOR-LIKE (compare raw totals)" if drift <= 1.25 else \
            "calibrations differ >25% — bracket with raw AND normalized ratios"
        print(f"calibration drift {drift:.2f}x: {like}")

    added = sorted(set(fb) - set(fa))
    removed = sorted(set(fa) - set(fb))
    if added:
        print(f"added keys ({len(added)}): {', '.join(added)}")
    if removed:
        print(f"removed keys ({len(removed)}): {', '.join(removed)}")

    regressions = []
    for k in set(fa) & set(fb):
        old, new = fa[k], fb[k]
        if old > 0 and new / old > args.threshold:
            regressions.append((new / old, k, old, new))
    regressions.sort(reverse=True)
    if regressions:
        spread = b.get("high_spread_passes", {})
        print(f"\nkeys over {args.threshold}x ({len(regressions)}):")
        for r, k, old, new in regressions:
            noisy = " [HIGH SPREAD — check passes before believing]" if k in spread else ""
            print(f"  {k}: {old:.3f} -> {new:.3f} s ({r:.2f}x){noisy}")
    else:
        print(f"\nno key over {args.threshold}x ({args.field}).")


if __name__ == "__main__":
    main()
