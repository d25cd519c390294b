#!/usr/bin/env python3
"""Gate-purity lint: keep the correctness gate immune to cross-build float
canonicalization drift (the round-4/5 failure class).

Checks, for every oracle SQL in <outDir>/oracle_sql.json (run after
graft.Verify so the OracleLits literal paths are the ones checked):
DESCRIBE the oracle in DuckDB (views over the sf parquet tables) and flag
any OUTPUT column typed DOUBLE/FLOAT or DECIMAL(scale>0) in an oracle
whose SQL contains a transcendental (ln/log/exp/pow/sqrt) — a quantized
transcendental feeding a float/fractional-decimal gate column is exactly
the pattern whose rounding boundary differs across engine builds (the
round-4/5 failure class). Raw-data doubles (column pass-throughs,
decimal-exact sums cast back to double) are NOT flagged: their values are
bit-identical by construction and have been driver-green since round 1 —
the drift risk is specifically transcendental-derived values.

A small allowlist documents the grandfathered exceptions (each one has
been green at the driver for multiple rounds AND its risky math is
confined in ways noted below). Anything new fails the lint, so pattern-2/3
gates cannot quietly reappear.

Usage: gate_lint.py [sfDir] [outDir]; exit 1 on violations."""
import sys, json, glob, os, re
import duckdb

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
OUT = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"

# name -> (set of tolerated risky columns, justification)
ALLOW = {
    # keep_bp thresholds are integer basis points; pow is quantized
    # HALF_UP at 6 decimals before any comparison. Integer-output query;
    # listed only because the SQL text contains pow().
    "samp_temperature": (set(), "pow quantized to integer basis points"),
}

# Grandfathered risky columns surviving for historical reasons; empty as
# of round 6 (every former entry was reshaped to an int64 micro/nano
# surface). The WARN mechanism stays so a future temporary exception is
# visible every run instead of silently allowed.
WARN_GRANDFATHERED = {}

# ---- duck-type probe grandfather list (round-13 verdict item 2) ----
# The driver's hash canon is dtype-sensitive: an oracle column whose
# DuckDB type differs in WIDTH from the Spark dump's type can hash-fail
# even when every value matches (the round-10..12 samp_pack_curriculum
# HUGEINT red: DuckDB window sum(BIGINT) -> int128). The probe below
# DESCRIBEs every oracle (plan-time only, nothing executes) against its
# Spark dump's parquet schema and FAILS any type mismatch that is not
# explicitly grandfathered here as an exact
# (query, column) -> (spark_type, duck_type) tuple. EMPTY as of round 13:
# the eight historical INTEGER-vs-BIGINT oracles (driver-green — the
# canon widens INTEGER losslessly; it was specifically HUGEINT that
# diverged) were all CAST to BIGINT instead of grandfathered, so every
# registry oracle now duck-types exactly as its Spark dump. Keep it empty:
# CAST the oracle, don't extend this list.
TYPE_GRANDFATHER = {}

# transcendental / precision-hazard functions (word-boundary match).
# sqrt is deliberately absent: IEEE-754 REQUIRES sqrt to be correctly
# rounded, so it cannot differ across conforming engines — only the libm
# transcendentals (ln/log/exp/pow) carry cross-build ulp variance.
RISKY_FN = re.compile(r"\b(ln|log|log2|log10|exp|pow|power)\s*\(",
                      re.IGNORECASE)

con = duckdb.connect()
for f in glob.glob(f"{SF}/*.parquet"):
    name = os.path.basename(f)[: -len(".parquet")]
    con.sql(f"CREATE VIEW {name} AS SELECT * FROM '{f}'")

oracle = json.load(open(f"{OUT}/oracle_sql.json"))
violations = []
warnings = []
probed = 0
for name in sorted(oracle):
    sql = oracle[name]
    try:
        desc = con.sql(f"DESCRIBE {sql}").fetchall()
    except Exception as e:
        violations.append((name, f"DESCRIBE failed: {type(e).__name__}: {e}"))
        continue
    # duck-type probe: the oracle's plan-time types must MATCH the Spark
    # dump's parquet types column-for-column (dtype-sensitive driver hash
    # canon; see TYPE_GRANDFATHER). Only names whose dump exists are
    # probed, so subset runs probe the subset.
    dump = f"{OUT}/{name}"
    if os.path.isdir(dump):
        probed += 1
        try:
            sd = dict((c, t) for c, t, *_ in
                      con.sql(f"DESCRIBE SELECT * FROM '{dump}/*.parquet'")
                      .fetchall())
        except Exception as e:
            sd = {}
            violations.append(
                (name, f"dump DESCRIBE failed: {type(e).__name__}: {e}"))
        for col, typ, *_ in desc:
            t = typ.upper()
            st = sd.get(col, "").upper()
            if not st or st == t:
                continue
            if TYPE_GRANDFATHER.get((name, col)) == (st, t):
                continue
            violations.append(
                (name, f"oracle column '{col}' duck-types {t} but the "
                       f"Spark dump types it {st} — the driver hash canon "
                       "is dtype-sensitive (the samp_pack_curriculum "
                       "HUGEINT class); CAST the oracle column to the "
                       "dump's exact type"))
    if not RISKY_FN.search(sql):
        continue
    allowed_cols, _why = ALLOW.get(name, (set(), ""))
    for col, typ, *_ in desc:
        t = typ.upper()
        if col in allowed_cols:
            continue
        frac_decimal = False
        m = re.match(r"DECIMAL\((\d+),(\d+)\)", t)
        if m and int(m.group(2)) > 0:
            frac_decimal = True
        if t in ("DOUBLE", "FLOAT", "REAL") or frac_decimal:
            if col in WARN_GRANDFATHERED.get(name, set()):
                warnings.append(
                    (name, f"grandfathered {t} column '{col}' in a "
                           "transcendental oracle (driver-green; same-host "
                           "libm) — do not add new ones"))
                continue
            violations.append(
                (name, f"output column '{col}' is {t} while the oracle "
                       "uses a transcendental — such gates drift across "
                       "engine builds (reshape to int64 units or ship the "
                       "constant via OracleLits as an integer)"))

for name, msg in warnings:
    print(f"LINT WARN {name}: {msg}")
if violations:
    for name, msg in violations:
        print(f"LINT FAIL {name}: {msg}")
    print(f"\n{len(violations)} gate-purity violations")
    sys.exit(1)
print(f"gate lint: {len(oracle)} oracles clean, {probed} type-probed "
      f"({len(warnings)} grandfathered warnings)")
