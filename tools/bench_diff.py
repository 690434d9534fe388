#!/usr/bin/env python3
"""Per-key cross-round bench comparison over the committed full records.

Usage:
    python3 tools/bench_diff.py bench_full_rA.json bench_full_rB.json \
        [--field medians|queries] [--threshold 1.5]

Compares B (newer) against A (older) per key and prints:
  - headline totals + calibrations (apply the SURVEY §6 rule: compare raw
    totals only when calibrations agree within ~25%; otherwise the raw and
    normalized ratios bracket the true code effect);
  - r19+: when BOTH records carry calibration_parallel (the 32-way probe
    that sees SMT/parallel-bandwidth contention the single-thread probe
    provably misses — r18's adjudication), per-key ratios are ALSO
    normalized by it; a key flags only if it exceeds the threshold under
    THAT normalization. Raw-only flags are listed separately as ambient
    suspects.
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

    print(f"older: total {a['value']} s / {len(fa)} keys, calibration {a.get('calibration')}"
          f" single {a.get('calibration_single')} parallel {a.get('calibration_parallel')}"
          f" par_eff {a.get('parallel_efficiency')}")
    print(f"newer: total {b['value']} s / {len(fb)} keys, calibration {b.get('calibration')}"
          f" single {b.get('calibration_single')} parallel {b.get('calibration_parallel')}"
          f" par_eff {b.get('parallel_efficiency')}")
    if b.get("loadavg"):
        print(f"newer loadavg: {json.dumps(b['loadavg'])}")
    ca, cb = a.get("calibration"), b.get("calibration")
    if ca and cb:
        drift = max(ca, cb) / min(ca, cb)
        like = "LIKE-FOR-LIKE (compare raw totals)" if drift <= 1.25 else \
            "calibrations differ >25% — bracket with raw AND normalized ratios"
        print(f"single-thread calibration drift {drift:.2f}x: {like}")
    pa, pb = a.get("calibration_parallel"), b.get("calibration_parallel")
    # scale applied to the NEWER record's per-key times to land both
    # records on the older box's parallel throughput: new_adj = new * pa/pb
    par_scale = None
    if pa and pb:
        pdrift = max(pa, pb) / min(pa, pb)
        par_scale = pa / pb
        print(f"parallel calibration drift {pdrift:.2f}x "
              f"(normalizing newer per-key times by x{par_scale:.3f}; "
              f"flags below survive THAT normalization)")
    elif a.get("cpus") and b.get("cpus") and a["cpus"] != b["cpus"]:
        print(f"WARNING: cpus differ ({a['cpus']} vs {b['cpus']}) — "
              "raw totals are not comparable at all")

    added = sorted(set(fb) - set(fa))
    removed = sorted(set(fa) - set(fb))
    if added:
        print(f"added keys ({len(added)}): {', '.join(added)}")
    if removed:
        print(f"removed keys ({len(removed)}): {', '.join(removed)}")

    regressions, ambient = [], []
    for k in set(fa) & set(fb):
        old, new = fa[k], fb[k]
        if old <= 0:
            continue
        raw = new / old
        adj = raw * par_scale if par_scale else raw
        if adj > args.threshold:
            regressions.append((adj, raw, k, old, new))
        elif raw > args.threshold:
            ambient.append((raw, adj, k, old, new))
    regressions.sort(reverse=True)
    ambient.sort(reverse=True)
    spread = b.get("high_spread_passes", {})
    label = "normalized" if par_scale else "raw"
    if regressions:
        print(f"\nkeys over {args.threshold}x ({label}) ({len(regressions)}):")
        for adj, raw, k, old, new in regressions:
            noisy = " [HIGH SPREAD — check passes before believing]" if k in spread else ""
            print(f"  {k}: {old:.3f} -> {new:.3f} s (raw {raw:.2f}x, {label} {adj:.2f}x){noisy}")
    else:
        print(f"\nno key over {args.threshold}x ({label}, {args.field}).")
    if ambient:
        print(f"\nraw-only flags that DISAPPEAR under parallel normalization "
              f"(ambient contention, not code) ({len(ambient)}):")
        for raw, adj, k, old, new in ambient:
            print(f"  {k}: {old:.3f} -> {new:.3f} s (raw {raw:.2f}x, normalized {adj:.2f}x)")


if __name__ == "__main__":
    main()
