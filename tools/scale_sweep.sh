#!/bin/bash
# Scale-stress sweep (round-14 verdict item 2): measure per-query runtime
# ratios between sf0.1 and a synthetic ~10x corpus (MakeScale) for the
# sync / dedup-LSH / ANN families, using the EXACT Bench protocol
# (registry warmup on the sf0.001 sibling, gc boundaries, noop sink) via
# SPARK_GRAFT_BENCH_ONLY. Emits SCALE_SWEEP.md. Run on a quiet host —
# Bench embeds load_pre/load_post in each snapshot for forensics.
# Usage: tools/scale_sweep.sh [mult=10]
set -u -o pipefail
cd "$(dirname "$0")/.."
MULT=${1:-10}
SWEEP_Q="o3_bucketed_sync,o3_incremental_fallback,o3_sync_changefeed,o3_sync_children,o3_sync_feed_drift,st_sync_children_update,st_sync_feed_update,dedup_minhash_sig,dedup_minhash_pairs,dedup_components,ann_bruteforce_topk,ann_ivf_topk"
ROOT=/tmp/graft_sweep

echo "=== [1/4] synthesize sf${MULT}x corpus at $ROOT/sfX"
mkdir -p "$ROOT"
# Bench warms up on the <sfdir>/../sf0.001 sibling — give the synthetic
# dir the same shape via a symlink
[ -e "$ROOT/sf0.001" ] || ln -s /root/testdata/sf0.001 "$ROOT/sf0.001"
sbt -batch "runMain graft.MakeScale /root/testdata/sf0.1 $ROOT/sfX $MULT" --error 2>/dev/null | tail -1 \
  || { echo "MakeScale FAILED"; exit 1; }

echo "=== [2/4] Bench subset @ sf0.1 (baseline side)"
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
SPARK_GRAFT_BENCH_ONLY="$SWEEP_Q" \
SPARK_GRAFT_BENCH_FULL=/tmp/sweep_sf01.json \
sbt -batch "runMain graft.Bench" --error 2>/dev/null | tail -1 \
  || { echo "BENCH sf0.1 FAILED"; exit 1; }

echo "=== [3/4] Bench subset @ ${MULT}x"
SPARK_GRAFT_SF_DIR=$ROOT/sfX \
SPARK_GRAFT_BENCH_ONLY="$SWEEP_Q" \
SPARK_GRAFT_BENCH_FULL=/tmp/sweep_sfX.json \
sbt -batch "runMain graft.Bench" --error 2>/dev/null | tail -1 \
  || { echo "BENCH ${MULT}x FAILED"; exit 1; }

echo "=== [4/4] SCALE_SWEEP.md"
python3 - "$MULT" <<'EOF'
import json, sys
mult = int(sys.argv[1])
a = json.load(open('/tmp/sweep_sf01.json'))
b = json.load(open('/tmp/sweep_sfX.json'))
qa, qb = a['queries'], b['queries']
lines = [
    "# SCALE_SWEEP — synthetic %dx stress (round 14)" % mult,
    "",
    "Per-query wall time under the exact Bench protocol "
    "(`SPARK_GRAFT_BENCH_ONLY` subset, full registry warmup on sf0.001, "
    "gc boundary, noop sink), sf0.1 vs a MakeScale %dx corpus "
    "(id-shifted union-multiply; text perturbed per replica)." % mult,
    "",
    "sf0.1 run: load_pre=%s load_post=%s; %dx run: load_pre=%s "
    "load_post=%s" % (a.get('load_pre'), a.get('load_post'),
                      mult, b.get('load_pre'), b.get('load_post')),
    "",
    "| query | sf0.1 s | %dx s | ratio | reading |" % mult,
    "|---|---|---|---|---|",
]
churn = {'o3_sync_changefeed', 'o3_sync_feed_drift', 'st_sync_feed_update'}
for q in sorted(qa):
    ta, tb = qa[q], qb.get(q)
    if tb is None or ta <= 0 or tb <= 0:
        lines.append("| %s | %.2f | FAILED | - | - |" % (q, ta))
        continue
    r = tb / ta
    if q in churn:
        reading = ("flat-ish (churn-proportional path)" if r < 3
                   else "NOT flat - investigate")
    elif r <= 2:
        reading = "flat/sublinear"
    elif r < mult * 1.3:
        reading = ("~linear (verify output growth if well above "
                   "%dx)" % mult)
    else:
        reading = "SUPERLINEAR - investigate"
    lines.append("| %s | %.2f | %.2f | %.2fx | %s |" % (q, ta, tb, r, reading))
lines += ["",
          "Churn-family gates (changefeed/feed-drift/feed-stream) hold "
          "fixed-size churn while the corpus grows %dx, so their expected "
          "ratio is ~flat plus the bootstrap cost inside each gate "
          "harness; snapshot-diff and scan families scale with data." % mult]
open('SCALE_SWEEP.md', 'w').write("\n".join(lines) + "\n")
print("\n".join(lines))
EOF
