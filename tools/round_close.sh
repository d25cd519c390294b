#!/bin/bash
# Round-close ritual (see memory + .claude/skills/verify): full Verify +
# check at sf0.01, full-registry sweep at sf0.1 -> V_FULL_r{N}, the
# incremental-family sweep at sf0.1 -> V_INCR_r{N}, Bench at sf0.1 ->
# BENCH_FULL.json + bench_history copy + bench_delta, full sbt test.
# Every step's failure fails the ritual (pipefail + explicit exits); the
# bench is only STAMPED (BENCH_FULL.json + bench_history) when the host
# is quiet — a noisy run lands in a scratch path and is reported, never
# committed as the round's snapshot.
# Usage: tools/round_close.sh <round> (e.g. 8)
set -u -o pipefail
R=$(printf "%02d" "$1")
cd "$(dirname "$0")/.."

echo "=== [1/6] Verify + check @ sf0.01"
SPARK_GRAFT_CPUS=8 sbt -batch "runMain graft.Verify /root/testdata/sf0.01 /tmp/verify_001" --error >/dev/null 2>&1 \
  || { echo "VERIFY sf0.01 FAILED"; exit 1; }
GRAFT_WIP=1 python3 tools/check.py /root/testdata/sf0.01 /tmp/verify_001 > /tmp/check_001.log 2>&1
C1=$?
tail -4 /tmp/check_001.log
[ $C1 -ne 0 ] && { echo "CHECK sf0.01 FAILED"; exit 1; }

echo "=== [2/6] Full-registry sweep @ sf0.1"
SPARK_GRAFT_CPUS=16 sbt -batch "runMain graft.Verify /root/testdata/sf0.1 /tmp/verify_01" --error >/dev/null 2>&1 \
  || { echo "VERIFY sf0.1 FAILED"; exit 1; }
GRAFT_WIP=1 python3 tools/check.py /root/testdata/sf0.1 /tmp/verify_01 > /tmp/check_01.log 2>&1
C2=$?
tail -4 /tmp/check_01.log
NQ=$(grep -oE '^[0-9]+/[0-9]+ queries match' /tmp/check_01.log | head -1)
python3 - "$R" "$C2" <<'EOF'
import json, re, sys
r, rc = sys.argv[1], int(sys.argv[2])
log = open('/tmp/check_01.log').read()
m = re.search(r'(\d+)/(\d+) queries match', log)
npass, ntot = int(m.group(1)), int(m.group(2))
lit = re.search(r'lit check: (\d+)/(\d+)', log)
lp, lt = (int(lit.group(1)), int(lit.group(2))) if lit else (0, 0)
failed = re.findall(r'^FAIL (\S+)', log, re.M)
out = {"round": int(r), "sweep": "full_registry", "sf": "0.1",
       "n_pass": npass + lp, "n_total": ntot + lt, "n_queries": ntot,
       "lit_families": lt, "failed": failed}
open(f'V_FULL_r{r}.json', 'w').write(json.dumps(out) + "\n")
print("V_FULL:", out)
EOF
[ $C2 -ne 0 ] && { echo "CHECK sf0.1 FAILED"; exit 1; }

echo "=== [3/6] Incremental-family sweep @ sf0.1"
SPARK_GRAFT_CPUS=16 sbt -batch "runMain graft.VerifySubset /root/testdata/sf0.1 /tmp/v_incr dedup_incr_exact dedup_incr_minhash dedup_incr_components nb_incr_model tx_postings_incr emb_incr_assign ev_anomaly_incr st_stream_dedup emb_pq_incr_encode sk_kmv_incr st_index_retrain sk_cms_incr st_cms_update sk_ams_incr st_ams_update st_hll_update st_kmv_update st_quality_update st_crossdoc_update st_scd2_update" --error >/dev/null 2>&1 \
  || { echo "V_INCR sweep FAILED"; exit 1; }
GRAFT_WIP=1 python3 tools/check.py /root/testdata/sf0.1 /tmp/v_incr > /tmp/check_incr.log 2>&1
C3=$?
tail -3 /tmp/check_incr.log
python3 - "$R" <<'EOF'
import json, re, sys
r = sys.argv[1]
log = open('/tmp/check_incr.log').read()
m = re.search(r'(\d+)/(\d+) queries match', log)
failed = re.findall(r'^FAIL (\S+)', log, re.M)
out = {"round": int(r), "sweep": "incremental_family", "sf": "0.1",
       "n_pass": int(m.group(1)), "n_total": int(m.group(2)),
       "failed": failed}
open(f'V_INCR_r{r}.json', 'w').write(json.dumps(out) + "\n")
print("V_INCR:", out)
EOF
[ $C3 -ne 0 ] && { echo "CHECK incr FAILED"; exit 1; }

echo "=== [4/6] Bench @ sf0.1 (quiet-host gate: 1-min load < 0.5)"
QUIET=0
for i in $(seq 1 30); do
  L=$(cut -d' ' -f1 /proc/loadavg)
  if python3 -c "import sys; sys.exit(0 if float('$L') < 0.5 else 1)"; then
    QUIET=1; break
  fi
  echo "  load $L >= 0.5, waiting ($i/30)..."
  sleep 60
done
BLOG=/tmp/bench_close.log
if [ $QUIET -eq 1 ]; then
  SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt -batch "runMain graft.Bench" --error 2>/dev/null > "$BLOG"
  B=$?
  tail -1 "$BLOG"
  [ $B -ne 0 ] && { echo "BENCH FAILED"; exit 1; }
  # the pre-gate only samples load BEFORE the run — neighbor load rising
  # mid-run (the round-9 stamp: gate at 0.0x, finish at 2+) still pollutes
  # the numbers. Record the post-run load so a reader of the log knows
  # whether the stamp is trustworthy; a quiet re-run stays the remedy.
  LPOST=$(cut -d' ' -f1 /proc/loadavg)
  echo "bench post-run 1-min load: $LPOST"
  python3 -c "import sys; sys.exit(0 if float('$LPOST') < 1.0 else 1)" \
    || echo "WARNING: BENCH STAMPED UNDER MID-RUN NOISE (post-load $LPOST)" \
            "— prefer a quiet re-run snapshot for comparisons"
  # stamp only a successful, quiet-host run as the round's snapshot
  cp BENCH_FULL.json "bench_history/BENCH_FULL_r${R}_final.json"
  echo "=== [5/6] bench_delta vs prior final"
  PRIOR=$(ls bench_history/BENCH_FULL_r*_final.json | grep -v "r${R}_final" | sort | tail -1)
  python3 tools/bench_delta.py BENCH_FULL.json "$PRIOR" | tail -12
else
  # refuse to stamp a noisy run: bench to scratch, committed snapshot
  # and bench_history stay untouched; rerun step 4 by hand when quiet
  echo "HOST NEVER QUIET — bench lands in /tmp/BENCH_FULL_noisy.json, NOT stamped"
  SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_BENCH_FULL=/tmp/BENCH_FULL_noisy.json \
    sbt -batch "runMain graft.Bench" --error 2>/dev/null > "$BLOG"
  B=$?
  tail -1 "$BLOG"
  [ $B -ne 0 ] && { echo "BENCH FAILED"; exit 1; }
  echo "=== [5/6] bench_delta SKIPPED (noisy run, not stamped)"
fi

echo "=== [6/6] full sbt test"
sbt -batch test --error > /tmp/sbt_test_close.log 2>&1
T=$?
echo "SBT_TEST_EXIT=$T"
[ $T -ne 0 ] && { tail -20 /tmp/sbt_test_close.log; echo "SBT TEST FAILED"; exit 1; }

echo "=== final check.py (V_FULL gate armed)"
python3 tools/check.py /root/testdata/sf0.01 /tmp/verify_001 > /tmp/check_final.log 2>&1
F=$?
tail -3 /tmp/check_final.log
echo "ROUND_CLOSE_DONE rc=$F"
exit $F
