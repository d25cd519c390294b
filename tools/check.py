#!/usr/bin/env python3
"""Local stand-in for the driver's t2 correctness gate: runs each oracle SQL
in DuckDB against the sf parquet tables and compares with the parquet dumps
produced by `graft.Verify`. Columns sorted by name; rows sorted by all
columns; exact value compare (floats exact)."""
import sys, json, glob, os
import duckdb
import pandas as pd

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
OUT = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"

con = duckdb.connect()
for f in glob.glob(f"{SF}/*.parquet"):
    name = os.path.basename(f)[:-len(".parquet")]
    con.sql(f"CREATE VIEW {name} AS SELECT * FROM '{f}'")

oracle = json.load(open(f"{OUT}/oracle_sql.json"))
results = {}
for name in sorted(oracle):
    path = f"{OUT}/{name}"
    if not os.path.isdir(path):
        results[name] = "MISSING_SPARK_OUTPUT"
        continue
    try:
        spark_df = con.sql(f"SELECT * FROM '{path}/*.parquet'").df()
    except Exception as e:
        results[name] = f"SPARK_READ_FAIL: {e}"
        continue
    try:
        duck_df = con.sql(oracle[name]).df()
    except Exception as e:
        results[name] = f"ORACLE_FAIL: {type(e).__name__}: {e}"
        continue
    s_cols, d_cols = sorted(spark_df.columns), sorted(duck_df.columns)
    if s_cols != d_cols:
        results[name] = f"SCHEMA_MISMATCH: spark={s_cols} duck={d_cols}"
        continue
    s = spark_df[s_cols].sort_values(s_cols).reset_index(drop=True)
    d = duck_df[d_cols].sort_values(d_cols).reset_index(drop=True)
    if len(s) != len(d):
        results[name] = f"ROWCOUNT_MISMATCH: spark={len(s)} duck={len(d)}"
        continue
    # normalize dtypes for compare
    diffs = []
    for c in s_cols:
        sv, dv = s[c], d[c]
        try:
            if sv.dtype.kind in "fc" or dv.dtype.kind in "fc":
                eq = (sv.astype(float).fillna(-9e99) - dv.astype(float).fillna(-9e99)).abs() == 0
            else:
                eq = sv.astype(str).fillna("") == dv.astype(str).fillna("")
        except Exception as e:
            diffs.append((c, f"compare error {e}"))
            continue
        if not eq.all():
            bad = (~eq).idxmax()
            nbad = int((~eq).sum())
            diffs.append((c, f"{nbad} diffs, first@{bad}: spark={s[c][bad]!r} duck={d[c][bad]!r}"))
    results[name] = "OK" if not diffs else "VALUE_MISMATCH: " + "; ".join(f"{c}: {m}" for c, m in diffs)

ok = sum(1 for v in results.values() if v == "OK")
for name, v in sorted(results.items()):
    mark = "PASS" if v == "OK" else "FAIL"
    print(f"{mark} {name}" + ("" if v == "OK" else f"  -> {v[:400]}"))
print(f"\n{ok}/{len(results)} queries match")

# gate-purity lint: no float / transcendental-fed fractional-decimal gate
# columns may (re)appear — see tools/gate_lint.py
import subprocess
lint = subprocess.run(
    [sys.executable, os.path.join(os.path.dirname(__file__), "gate_lint.py"),
     SF, OUT])
# OracleLits trust loop: every engine-computed literal fragment the oracle
# consumed is independently re-derived from the fixtures (1-ulp-tolerant
# for ln families, exact for PCA, rank-validity for sketch cuts)
lit = subprocess.run(
    [sys.executable, os.path.join(os.path.dirname(__file__), "lit_check.py"),
     SF, OUT])
# V_FULL freshness gate (round-7 verdict item #5): the committed
# full-registry sf0.1 sweep artifact must cover the CURRENT registry — a
# query landing after the snapshot would otherwise leave a stale "full"
# sweep claiming complete coverage. Set GRAFT_WIP=1 to iterate mid-round;
# the round-close ritual regenerates V_FULL and then runs this unset.
vfull_ok = True
if os.environ.get("GRAFT_WIP") != "1":
    import re
    root = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..")
    vf = glob.glob(os.path.join(root, "V_FULL_r*.json"))
    if not vf:
        print("V_FULL MISSING: no V_FULL_r*.json at repo root")
        vfull_ok = False
    else:
        latest = max(vf, key=lambda p: int(
            re.search(r"r(\d+)", os.path.basename(p)).group(1)))
        meta = json.load(open(latest))
        # n_queries = registry-only count; n_total may also fold in the
        # lit_check re-derivations (the r07 artifact shape)
        n_q = meta.get("n_queries", meta.get("n_total"))
        if n_q != len(oracle):
            print(f"V_FULL STALE: {os.path.basename(latest)} "
                  f"n_queries={n_q} != registry {len(oracle)}")
            vfull_ok = False
        elif meta.get("n_pass") != meta.get("n_total") or meta.get("failed"):
            print(f"V_FULL NOT GREEN: {os.path.basename(latest)}: {meta}")
            vfull_ok = False
        else:
            print(f"V_FULL fresh: {os.path.basename(latest)} covers all "
                  f"{n_q} registered queries")

# exit nonzero on ANY failure — value mismatches foremost, lint/lits after
# — so wrappers can gate on the return code
if ok != len(results) or lint.returncode != 0 or lit.returncode != 0 \
        or not vfull_ok:
    sys.exit(1)
