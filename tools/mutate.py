#!/usr/bin/env python3
"""Oracle mutation-kill audit (r16 verdict task 2).

The whole correctness verdict rests on DuckDB-hash equality per key; a
vacuous or accidentally-tautological oracle (one that recomputes the
same expression from the same inputs in a way that can never disagree,
or a compare that doesn't actually look at the values) would sit green
forever. This harness PROVES each sampled key's green CAN go red: it
perturbs the ENGINE frame (drop a row / off-by-one a cell / null a
cell) and asserts the same compare that gates the round now FAILS.

Usage: python3 tools/mutate.py <sfDir> <verifyOutDir> <outJson> [keys...]

Reads <verifyOutDir>/oracle_sql.json + the per-key parquet dumps that
graft.Verify wrote, applies each applicable mutation to a COPY of the
frame, and re-runs the compare semantics (same canon/normalize as
tools/compare.py, imported — not re-implemented, so the kill is against
the real gate). A surviving mutant is a finding and exits nonzero.
"""
import datetime
import json
import math
import os
import re
import sys
from decimal import Decimal

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from compare import canon, normalize, TABLES  # the REAL gate's normalize (applies its canon)


def perturb_value(v):
    """A minimally-different value of the same python type, or None if
    this type isn't perturbable."""
    if v is None:
        return None
    if isinstance(v, bool):
        return not v
    if isinstance(v, int):
        return v + 1
    if isinstance(v, float):
        if math.isnan(v) or math.isinf(v):
            return None
        return v + 0.001 if abs(v) < 1e15 else v * 1.001
    if isinstance(v, Decimal):
        return v + 1
    if isinstance(v, str):
        return v + "x"
    if isinstance(v, bytes):
        return bytes([v[0] ^ 0xFF]) + v[1:] if v else b"\x01"
    if isinstance(v, datetime.datetime):
        return v + datetime.timedelta(seconds=1)
    if isinstance(v, datetime.date):
        return v + datetime.timedelta(days=1)
    if isinstance(v, list):
        for i, x in enumerate(v):
            px = perturb_value(x)
            if px is not None:
                return v[:i] + [px] + v[i + 1:]
        return v + [None]
    if isinstance(v, dict):
        for k in v:
            pv = perturb_value(v[k])
            if pv is not None:
                out = dict(v)
                out[k] = pv
                return out
        return None
    return None


def mutations(rows, schema):
    """Yield (label, mutated_rows) for each applicable mutation."""
    if rows:
        yield "drop_row", rows[1:]
    else:
        # empty result: the only expressible frame mutation is an extra
        # row — all-null cells of the right shape
        yield "add_null_row", [{c: None for c in schema.names}]
        return
    # perturb: first (row, col) holding a perturbable non-null value
    done = False
    for ri, r in enumerate(rows):
        if done:
            break
        for c in schema.names:
            pv = perturb_value(r[c])
            if pv is not None:
                mut = [dict(x) for x in rows]
                mut[ri][c] = pv
                yield f"perturb:{c}", mut
                done = True
                break
    # null_cell: first non-null cell in a NULLABLE column
    done = False
    for ri, r in enumerate(rows):
        if done:
            break
        for f in schema:
            if r[f.name] is not None and f.nullable:
                mut = [dict(x) for x in rows]
                mut[ri][f.name] = None
                yield f"null:{f.name}", mut
                done = True
                break
    # dup_row: duplicate the first row — kills a compare that dedupes or
    # sets rows before diffing (multiset- vs set-sensitivity; r17 verdict
    # task 4). Row count changes, so a length-aware gate must go red.
    yield "dup_row", rows + [dict(rows[0])]
    # swap: exchange two same-typed columns' values within ONE row —
    # kills a canonicalization that sorts values within a row or is
    # otherwise blind to WHICH named column holds a value. Same arrow
    # type keeps the mutant maximally sneaky (no type-tag giveaway), and
    # requiring the GATE'S OWN canon to distinguish the two values
    # guarantees any survival is a real gate defect, not float-rounding.
    ftype = {f.name: f.type for f in schema}
    done = False
    for ri, r in enumerate(rows):
        if done:
            break
        cols = schema.names
        for i in range(len(cols)):
            if done:
                break
            for j in range(i + 1, len(cols)):
                a, b = cols[i], cols[j]
                if ftype[a] != ftype[b] or canon(r[a]) == canon(r[b]):
                    continue
                mut = [dict(x) for x in rows]
                mut[ri][a], mut[ri][b] = mut[ri][b], mut[ri][a]
                yield f"swap:{a}<->{b}", mut
                done = True
                break


def oracle_mutations(sql):
    """Sixth class (r19 verdict task 5): mutate the ORACLE SQL instead of
    the engine frame. The five data classes prove the compare bites on
    engine drift; these prove the per-key oracle is SPECIFIC — and they
    give keys without a same-typed swappable column pair a
    discriminating mutant. A candidate that fails to parse is skipped at
    run time (inapplicable); a candidate whose result equals the
    ORIGINAL oracle's is recorded `equivalent` (that clause is
    non-discriminating at this SF — reported, not a gate defect). A
    candidate that differs from the original yet still matches the
    engine frame is a REAL survivor: the gate's own normalize claimed
    engine==original and engine==mutated while original!=mutated."""
    out = []
    m = re.search(r"\bLIMIT (\d+)\b", sql, re.IGNORECASE)
    if m and int(m.group(1)) >= 1:
        out.append(("oracle_limit_off_by_one",
                    [sql[:m.start()] + f"LIMIT {int(m.group(1)) - 1}" + sql[m.end():]]))
    m = re.search(r"\bWHERE\s+", sql, re.IGNORECASE)
    if m:
        out.append(("oracle_negate_where",
                    [sql[:m.end()] + "NOT " + sql[m.end():]]))
    low = sql.lower()
    for src, dst in (("sum(", "min("), ("avg(", "min("), ("max(", "min("),
                     ("min(", "max("), ("count(", "max("),
                     ("quantile_cont(", "quantile_disc("), ("median(", "avg(")):
        i = low.find(src)
        if i >= 0:
            out.append((f"oracle_agg_swap:{src[:-1]}->{dst[:-1]}",
                        [sql[:i] + dst + sql[i + len(src):]]))
            break
    m = re.search(r" > ", sql)
    if m:
        out.append(("oracle_cmp_boundary",
                    [sql[:m.start()] + " >= " + sql[m.end():]]))
    # two broadly-applicable fallbacks so nearly every oracle carries a
    # discriminating mutant (pure projections have no WHERE/LIMIT/agg):
    # append a char to a string literal, and bump a standalone integer
    # literal. These are ADAPTIVE (r19 second pass): a fixed position
    # often lands on a non-discriminating token (a regex bound like
    # {1,3}, a fixture column the key never projects), so each class
    # carries up to 8 candidate positions ordered LAST-first — CTE-based
    # oracles open with shared fixture columns; the main query body sits
    # at the end — and the runner takes the first candidate that KILLS,
    # falling back to `equivalent`/`inapplicable` only when none does.
    lits = list(re.finditer(r"'([^']*)'", sql))[::-1][:8]
    if lits:
        out.append(("oracle_str_literal", [
            sql[:m.start()] + "'" + m.group(1) + "~'" + sql[m.end():]
            for m in lits]))
    nums = list(re.finditer(r"(?<![\w.'\"])(\d+)(?![\w.])", sql))[::-1][:8]
    if nums:
        out.append(("oracle_num_literal", [
            sql[:m.start()] + str(int(m.group(1)) + 1) + sql[m.end():]
            for m in nums]))
    return out


def oracle_result(con, sql):
    o = con.execute(sql)
    names = [d[0] for d in o.description]
    return normalize(names, o.fetchall())


def compare_frame(con, sql, names, rows):
    """True iff the frame matches the oracle under the gate's canon."""
    o = con.execute(sql)
    o_names = [d[0] for d in o.description]
    o_rows = o.fetchall()
    sn, sr = normalize(names, rows)
    on, orows = normalize(o_names, o_rows)
    return sn == on and sr == orows


def main():
    sf_dir, out_dir, out_json = sys.argv[1], sys.argv[2], sys.argv[3]
    only = set(sys.argv[4:])
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    report = {}
    skipped = []
    # a typo'd key on the command line must be an ERROR, not a silently
    # empty (and therefore vacuously green) audit (r17 review)
    unknown = sorted(only - set(oracles))
    if unknown:
        print(f"ERROR: requested keys not in oracle_sql.json: {unknown}")
        sys.exit(2)
    for name in sorted(oracles):
        if only and name not in only:
            continue
        path = f"{out_dir}/{name}"
        if not os.path.isdir(path):
            skipped.append(name)
            continue
        tbl = pq.read_table(path)
        names = tbl.column_names
        dict_rows = tbl.to_pylist()
        # sanity: the UNMUTATED frame must pass, or the dump is stale
        base_rows = [tuple(d[c] for c in names) for d in dict_rows]
        if not compare_frame(con, oracles[name], names, base_rows):
            report[name] = {"baseline": "FAIL — dump does not match oracle"}
            continue
        entry = {}
        for label, mut in mutations(dict_rows, tbl.schema):
            rows = [tuple(d[c] for c in names) for d in mut]
            ok = compare_frame(con, oracles[name], names, rows)
            entry[label] = "survived" if ok else "killed"
        # sixth class: oracle-side mutants against the UNMUTATED frame.
        # Each class carries one or more candidate positions; the first
        # KILLING candidate settles the class, and only when every
        # candidate is equivalent/unparseable does the weaker status
        # stand (a true `survived` also settles immediately — it is the
        # finding this class exists to catch).
        for label, candidates in oracle_mutations(oracles[name]):
            status = None
            for msql in candidates:
                try:
                    ok = compare_frame(con, msql, names, base_rows)
                except Exception:
                    status = status or "inapplicable"
                    continue
                if not ok:
                    status = "killed"
                    break
                elif oracle_result(con, msql) == oracle_result(con, oracles[name]):
                    status = "equivalent"
                else:
                    status = "survived"
                    break
            entry[label] = status
        report[name] = entry
    total_keys = len(report)
    # "mutants" counts DISCRIMINATING mutants (killed or survived);
    # equivalents and parse-inapplicable oracle candidates are tallied
    # separately — they are findings about clause strength, not gate bugs
    total_muts = sum(1 for v in report.values() for s in v.values()
                     if s in ("killed", "survived"))
    killed = sum(1 for v in report.values() for s in v.values() if s == "killed")
    n_equiv = sum(1 for v in report.values() for s in v.values() if s == "equivalent")
    by_class = {}
    for v in report.values():
        for m, s in v.items():
            if s in ("killed", "survived"):
                by_class[m.split(":")[0]] = by_class.get(m.split(":")[0], 0) + 1
    summary = {
        "sf_dir": sf_dir,
        "keys_sampled": total_keys,
        "mutants": total_muts,
        "killed": killed,
        "survived": total_muts - killed,
        "oracle_equivalent": n_equiv,
        "mutants_by_class": by_class,
        # swap needs two same-typed, canon-distinguishable columns in some
        # row; keys without such a pair legitimately have no swap mutant
        "swap_applicable_keys": sum(
            1 for v in report.values() if any(m.startswith("swap:") for m in v)),
        "oracle_mutant_keys": sum(
            1 for v in report.values()
            if any(m.startswith("oracle_") and s in ("killed", "survived")
                   for m, s in v.items())),
        # keys whose EVERY oracle candidate came back equivalent: the
        # clauses these mutations touch don't discriminate at this SF —
        # reported for review, not failed
        "oracle_all_equivalent_keys": sorted(
            k for k, v in report.items()
            if any(m.startswith("oracle_") for m in v)
            and all(s in ("equivalent", "inapplicable")
                    for m, s in v.items() if m.startswith("oracle_"))),
        "skipped_no_dump": skipped,
    }
    with open(out_json, "w") as f:
        json.dump({"summary": summary, "keys": report}, f, indent=1, sort_keys=True)
    print(json.dumps(summary))
    # anything that is neither a kill nor a benign non-discriminating
    # outcome fails the audit — including a stale-dump baseline FAIL
    surviving = {k: {m: s for m, s in v.items()
                     if s not in ("killed", "equivalent", "inapplicable")}
                 for k, v in report.items()}
    surviving = {k: v for k, v in surviving.items() if v}
    if surviving:
        print("SURVIVING MUTANTS:", json.dumps(surviving, indent=1))
    # a key with no dump was NOT audited — a stale or partial Verify
    # output must fail the audit, not read green (r17 second review)
    if skipped:
        print(f"SKIPPED (no parquet dump — stale Verify output?): {skipped}")
    sys.exit(1 if (surviving or skipped) else 0)


if __name__ == "__main__":
    main()
