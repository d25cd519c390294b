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
import subprocess
sha = subprocess.run(['git', 'rev-parse', 'HEAD'], capture_output=True,
                     text=True).stdout.strip()
dirty = bool(subprocess.run(['git', 'status', '--porcelain'],
                            capture_output=True, text=True).stdout.strip())
out = {"round": int(r), "sweep": "full_registry", "sf": "0.1",
       "n_pass": npass + lp, "n_total": ntot + lt, "n_queries": ntot,
       "lit_families": lt, "failed": failed,
       "commit": sha, "tree_dirty_at_stamp": dirty}
open(f'V_FULL_r{r}.json', 'w').write(json.dumps(out) + "\n")
print("V_FULL:", out)
EOF
[ $C2 -ne 0 ] && { echo "CHECK sf0.1 FAILED"; exit 1; }

echo "=== [3/6] Incremental-family sweep @ sf0.1"
SPARK_GRAFT_CPUS=16 sbt -batch "runMain graft.VerifySubset /root/testdata/sf0.1 /tmp/v_incr dedup_incr_exact dedup_incr_minhash dedup_incr_components nb_incr_model tx_postings_incr emb_incr_assign ev_anomaly_incr st_stream_dedup emb_pq_incr_encode sk_kmv_incr st_index_retrain sk_cms_incr st_cms_update sk_ams_incr st_ams_update st_hll_update st_kmv_update st_quality_update st_crossdoc_update st_scd2_update tx_chunk_dedup_incr st_chunk_dedup_update dedup_incr_segments st_segment_dedup_update samp_doremi_incr st_doremi_update st_sync_children_update st_sync_feed_update" --error >/dev/null 2>&1 \
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
import subprocess
sha = subprocess.run(['git', 'rev-parse', 'HEAD'], capture_output=True,
                     text=True).stdout.strip()
dirty = bool(subprocess.run(['git', 'status', '--porcelain'],
                            capture_output=True, text=True).stdout.strip())
out = {"round": int(r), "sweep": "incremental_family", "sf": "0.1",
       "n_pass": int(m.group(1)), "n_total": int(m.group(2)),
       "failed": failed, "commit": sha, "tree_dirty_at_stamp": dirty}
open(f'V_INCR_r{r}.json', 'w').write(json.dumps(out) + "\n")
print("V_INCR:", out)
EOF
[ $C3 -ne 0 ] && { echo "CHECK incr FAILED"; exit 1; }

echo "=== [4/6] Bench @ sf0.1 (quiet-STAMP gate: pre-load < 0.5 AND embedded post-run load < 1.0)"
# The round-9 lesson: a pre-run gate alone admits runs whose neighbor
# load rises mid-run (gate at 0.0x, finish at 2+ — a 1.5× inflated
# stamp). Bench embeds load_pre (AMBIENT, read at entry before its own
# 32-thread work) and load_post in BENCH_FULL.json. load_post includes
# the bench's own trailing contribution — ~2.5 on an otherwise-idle host
# (round-10 calibration: gate 0.07 → post 2.66 at a total matching the
# r9 quiet snapshot) — so the mid-run-noise ceiling is 3.0, not the
# quiet-ambient 1.0 (which the bench's own load makes unachievable).
# A breaching run is archived as a noisy snapshot and the bench RE-RUNS
# (fresh quiet wait) — only a clean pass is stamped.
# Round-12 recalibration: the 271-query workload's own trailing load is
# higher (the new sync-orchestration gates spawn many short driver-side
# jobs late in the alphabet): two runs entering at ambient 0.26 and 2.64
# agreed within 0.5% on the total (344.6 vs 343.0 s) while posting
# 4.0-4.4 — self-load, not neighbor noise. Ceiling moved 3.0 -> 4.5;
# the PRE-run < 0.5 gate remains the ambient-quiet arbiter.
BLOG=/tmp/bench_close.log
STAMPED=0
for attempt in 1 2 3; do
  QUIET=0
  for i in $(seq 1 30); do
    L=$(cut -d' ' -f1 /proc/loadavg)
    if python3 -c "import sys; sys.exit(0 if float('$L') < 0.5 else 1)"; then
      QUIET=1; break
    fi
    echo "  load $L >= 0.5, waiting ($i/30)..."
    sleep 60
  done
  [ $QUIET -ne 1 ] && break
  SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt -batch "runMain graft.Bench" --error 2>/dev/null > "$BLOG"
  B=$?
  tail -1 "$BLOG"
  [ $B -ne 0 ] && { echo "BENCH FAILED"; exit 1; }
  LPOST=$(python3 -c "import json; d=json.load(open('BENCH_FULL.json')); print(d.get('load_post', -1))")
  # embedded stamp missing (older Bench binary) -> fall back to shell loadavg
  LPOST=$(python3 -c "v=float('$LPOST'); print(v if v >= 0 else float(open('/proc/loadavg').read().split()[0]))")
  echo "bench post-run 1-min load: $LPOST (attempt $attempt)"
  if python3 -c "import sys; sys.exit(0 if float('$LPOST') < 4.5 else 1)"; then
    STAMPED=1; break
  fi
  echo "  MID-RUN NOISE (post-load $LPOST >= 4.5) — archiving noisy snapshot, re-running"
  cp BENCH_FULL.json "bench_history/BENCH_FULL_r${R}_noisy${attempt}.json"
done
if [ $STAMPED -eq 1 ]; then
  # record WHICH code the stamp measured (round-13 hygiene finding: two
  # post-close commits were unswept by the close stamps — the SHA makes
  # that drift detectable, tools/stamp_guard.py enforces it)
  python3 - <<'PYEOF'
import json, subprocess
d = json.load(open('BENCH_FULL.json'))
d['commit'] = subprocess.run(['git', 'rev-parse', 'HEAD'],
    capture_output=True, text=True).stdout.strip()
d['tree_dirty_at_stamp'] = bool(subprocess.run(
    ['git', 'status', '--porcelain'], capture_output=True,
    text=True).stdout.strip())
open('BENCH_FULL.json', 'w').write(json.dumps(d) + "\n")
PYEOF
  # stamp only the clean (pre- AND post-quiet) pass as the round snapshot
  cp BENCH_FULL.json "bench_history/BENCH_FULL_r${R}_final.json"
  echo "=== [5/6] bench_delta vs prior final"
  PRIOR=$(ls bench_history/BENCH_FULL_r*_final.json | grep -v "r${R}_final" | sort | tail -1)
  python3 tools/bench_delta.py BENCH_FULL.json "$PRIOR" | tail -12
else
  # refuse to stamp: restore the committed snapshot; the noisy attempts
  # live in bench_history (and /tmp) for forensics; rerun step 4 by hand
  echo "NO QUIET STAMP ACHIEVED — BENCH_FULL.json restored from git, NOT stamped"
  git checkout -- BENCH_FULL.json 2>/dev/null || true
  echo "=== [5/6] bench_delta SKIPPED (no quiet stamp)"
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
echo "=== stamp guard: any commit AFTER this point must re-sweep (tools/stamp_guard.py)"
python3 tools/stamp_guard.py || true
echo "ROUND_CLOSE_DONE rc=$F"
exit $F
