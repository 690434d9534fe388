#!/usr/bin/env python3
"""Engine-side mutation-kill audit (r20 verdict task 7 — the seventh
class, the mirror of r19's oracle-side class).

The six mutate.py classes perturb the dumped FRAME or the ORACLE SQL.
Four keys came out of r19 with every oracle-side candidate recorded
`equivalent` (np_date_parse, np_grok_access_log,
ns_agg_percentiles_bucket, ns_esql_mad) — their oracles' mutable
clauses don't discriminate at the audit SF, so nothing yet proves the
COMPARE goes red when the ENGINE's own expression drifts. This
harness closes that: it patches one engine-side literal/expression at
a time (each chosen to be engine-ONLY — never a string the oracle SQL
shares, which would mutate both sides and stay vacuously green),
recompiles, re-runs graft.Verify for just that key, and asserts the
real gate (tools/compare.py's normalize) now FAILS.

Usage: python3 tools/mutate_engine.py <sfDir> <outJson>

Each mutant cycle costs an sbt recompile + a one-key Verify run
(~2 min); the class is scoped to the four all-equivalent keys by
design. Sources are restored on every path (try/finally) and verified
restored at exit via git diff.
"""
import json
import os
import subprocess
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from compare import normalize, TABLES

import duckdb
import pyarrow.parquet as pq

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# (key, label, file, engine-only original snippet, mutated snippet)
MUTANTS = [
    ("np_date_parse", "pattern_hour_letter",
     "src/main/scala/graft/ops/Enrich.scala",
     'to_timestamp(col("httpdate"), "dd/MMM/yyyy:HH:mm:ss Z")',
     'to_timestamp(col("httpdate"), "dd/MMM/yyyy:hh:mm:ss Z")'),
    ("np_date_parse", "unit_swap_millis",
     "src/main/scala/graft/ops/Enrich.scala",
     'unix_millis(to_timestamp(col("httpdate"), "dd/MMM/yyyy:HH:mm:ss Z")).as("parsed_ms")',
     '(unix_millis(to_timestamp(col("httpdate"), "dd/MMM/yyyy:HH:mm:ss Z")) + 1000L).as("parsed_ms")'),
    # grokRx itself is SHARED with the oracle (interpolated into the
    # DuckDB regexp_extract), so the mutant must sit on the engine's
    # call site: feeding the struct extractor a shifted line breaks the
    # anchored match engine-side only.
    ("np_grok_access_log", "shifted_input_line",
     "src/main/scala/graft/ops/Enrich.scala",
     'regexp_extract_struct(col("line"), grokRx, grokGroups)',
     'regexp_extract_struct(substring(col("line"), 2, 1000000), grokRx, grokGroups)'),
    # geoDim's range math is Spark-side only (the oracle spells
    # n_nationkey * 41943 in its own SQL string), so shifting the
    # engine's range start is an engine-only drift both twins must catch
    ("np_geoip_join", "dim_range_shift",
     "src/main/scala/graft/ops/Enrich.scala",
     '(col("n_nationkey") * 41943L).as("ip_start")',
     '(col("n_nationkey") * 41943L + 1L).as("ip_start")'),
    ("np_geoip_bucketed", "dim_range_shift",
     "src/main/scala/graft/ops/Enrich.scala",
     '(col("n_nationkey") * 41943L).as("ip_start")',
     '(col("n_nationkey") * 41943L + 2L).as("ip_start")'),
    ("ns_agg_percentiles_bucket", "fraction_drift",
     "src/main/scala/graft/ops/AggsExt.scala",
     'expr("percentile(c, array(0.25D, 0.5D, 0.75D, 0.9D))")',
     'expr("percentile(c, array(0.25D, 0.5D, 0.75D, 0.91D))")'),
    ("ns_esql_mad", "median_to_avg",
     "src/main/scala/graft/ops/EsqlParser.scala",
     'median(abs(gateOf(e, f) - col(s"__mad_med_$i"))).as(n)',
     'avg(abs(gateOf(e, f) - col(s"__mad_med_$i"))).as(n)'),
]


def run(cmd, **kw):
    return subprocess.run(cmd, cwd=REPO, capture_output=True, text=True, **kw)


def compare_key(sf_dir, out_dir, key):
    """True iff the dumped key matches its oracle under the real gate."""
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    path = f"{out_dir}/{key}"
    if not os.path.isdir(path):
        return None  # verify failed to produce a dump
    tbl = pq.read_table(path)
    names = tbl.column_names
    rows = [tuple(d[c] for c in names) for d in tbl.to_pylist()]
    o = con.execute(oracles[key])
    o_names = [d[0] for d in o.description]
    sn, sr = normalize(names, rows)
    on, orows = normalize(o_names, o.fetchall())
    return sn == on and sr == orows


def main():
    sf_dir, out_json = sys.argv[1], sys.argv[2]
    report = {}
    ok = True
    for key, label, relpath, orig, mut in MUTANTS:
        path = os.path.join(REPO, relpath)
        src = open(path).read()
        if src.count(orig) != 1:
            print(f"ERROR: snippet for {key}/{label} occurs {src.count(orig)}x in {relpath}")
            sys.exit(2)
        out_dir = tempfile.mkdtemp(prefix=f"mut_{key}_")
        try:
            open(path, "w").write(src.replace(orig, mut))
            r = run(["sbt", "-batch", f"runMain graft.Verify {sf_dir} {out_dir} {key}"],
                    env={**os.environ, "SPARK_GRAFT_CPUS": "8"})
            if r.returncode != 0 and "Compilation failed" in r.stdout + r.stderr:
                # a non-compiling mutant tests NOTHING about the gate —
                # that's a harness defect (pick a compiling mutant)
                status = "BUILD_ERROR"
                ok = False
            elif r.returncode != 0:
                # the mutated query THROWS: the driver's gate records an
                # err row → red — the drift is caught, a legitimate kill
                status = "killed (query error)"
            else:
                match = compare_key(sf_dir, out_dir, key)
                if match is None:
                    status = "killed (no dump)"
                elif match:
                    status = "SURVIVED"
                    ok = False
                else:
                    status = "killed"
        finally:
            open(path, "w").write(src)
        report.setdefault(key, {})[label] = status
        print(f"[mutate_engine] {key}/{label}: {status}")
    # paranoia: the tree must be byte-restored
    d = run(["git", "diff", "--stat"] + sorted({m[2] for m in MUTANTS}))
    if d.stdout.strip():
        print("ERROR: sources not restored:\n" + d.stdout)
        sys.exit(2)
    n = sum(len(v) for v in report.values())
    killed = sum(1 for v in report.values() for s in v.values() if s.startswith("killed"))
    summary = {"sf_dir": sf_dir, "keys": len(report), "mutants": n,
               "killed": killed, "survived": n - killed}
    with open(out_json, "w") as f:
        json.dump({"summary": summary, "keys": report}, f, indent=1, sort_keys=True)
    print(json.dumps(summary))
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
