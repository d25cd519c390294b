#!/usr/bin/env python3
"""Round-over-round bench drift gate.

Diffs a BENCH_FULL.json against the prior round's map and fails loudly on
per-query regressions, so a slow creep (round 3 -> 4 doubled the shared
total before anyone noticed) is caught the round it happens.

Usage:
    tools/bench_delta.py NEW_BENCH_FULL.json OLD_BENCH_FULL.json [--md OUT.md]

Rules:
  - compared on the intersection of query names, positive (non-failed)
    entries only;
  - a query REGRESSES when new > 2x old AND new - old > 1.0 s (the
    absolute floor keeps sub-second jitter from tripping the 2x ratio);
  - before flagging, each candidate is RE-PROBED in isolation
    (`graft.Prof`, 2 runs, min taken): single-run bench numbers can
    inflate >2.5x on host-level neighbor load (the r6
    `dedup_cluster_stats` 9.4 s driver vs 3.4 s probe), so only
    regressions that REPRODUCE in the probe fail the gate; the rest are
    recorded as noise-cleared in BENCH_DELTA.md. `--no-reprobe` skips
    this (e.g. when sbt or the sf dir is unavailable);
  - exit 1 when any query regresses after re-probe (print them, worst
    first), else 0.

Writes a markdown delta table (biggest movers both directions) to --md
(default BENCH_DELTA.md next to the NEW file).
"""
import argparse
import json
import os
import re
import subprocess
import sys

# Queries whose measurement BOUNDARY changed in some round (what the timed
# window covers — e.g. state construction moved into the untimed warmup).
# Their cross-round delta for that transition is a re-scoping, not a code
# speedup/regression; they are annotated in every BENCH_DELTA.md so a
# reader never misreads the movement.
RESCOPED = {
    "dedup_incr_components": (
        "r4->r5: incremental-CC state construction moved to the untimed "
        "warmup (the timed entry now measures only the incremental path) "
        "- the 24.3->4.5 s drop was a measurement-boundary change"),
    "dedup_components": (
        "r6->r7: the LSH->CC labeling is memoized per session "
        "(ScaleQueries.ccLabels) - the first consumer in bench order "
        "(dedup_best_survivor) pays the CC loop once; this query now "
        "times only the label read"),
    "dedup_cluster_stats": (
        "r6->r7: shares the memoized CC labels (see dedup_components)"),
    "samp_leakage_split": (
        "r6->r7: shares the memoized CC labels (see dedup_components)"),
    # r7->r8: the token-memo consumers read the session tokenized-docs
    # parquet (built in the untimed warmup) instead of re-tokenizing the
    # corpus inside the timed window — tokenize once, reuse everywhere
    "sk_cms_counts": ("r7->r8: reads the tokenized-docs memo (built in "
        "the untimed warmup) instead of re-tokenizing in the timed window"),
    "sk_cms_incr": ("r7->r8: tokenized-docs memo (see sk_cms_counts)"),
    "sk_cms_topk": ("r7->r8: tokenized-docs memo (see sk_cms_counts)"),
    "sk_ams_f2": ("r7->r8: tokenized-docs memo (see sk_cms_counts)"),
    "sk_ams_incr": ("r7->r8: tokenized-docs memo (see sk_cms_counts)"),
    "st_cms_update": ("r7->r8: tokenized-docs memo (see sk_cms_counts)"),
    "st_ams_update": ("r7->r8: tokenized-docs memo (see sk_cms_counts)"),
    "tx_chunks": ("r7->r8: tokenized-docs memo (see sk_cms_counts)"),
    "dedup_minhash_sig": (
        "r7->r8: tokenized-docs memo (see sk_cms_counts)"),
    "dedup_ngram_jaccard": (
        "r7->r8: tokenized-docs memo (see sk_cms_counts)"),
    "mm_cdc_neardup": (
        "r9->r10: the base corpus' CDC fingerprints ride a session memo "
        "built in the untimed warmup (the maintained-index shape) - the "
        "timed entry now chunks only the edited copy; the chunker itself "
        "also gained the (id, segment) split"),
}


def load(path):
    with open(path) as f:
        d = json.load(f)
    return d, {k: v for k, v in d.get("queries", {}).items() if v >= 0}


def reprobe(names, sf_dir):
    """Re-run the flagged queries in isolation via graft.Prof (2 runs
    each) and return {name: min_time}. Returns {} on any failure — the
    caller then treats every candidate as a real regression (fail-closed:
    a broken probe must not silently clear the gate)."""
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ, SPARK_GRAFT_SF_DIR=sf_dir,
               SPARK_GRAFT_PROF_RUNS="2")
    try:
        r = subprocess.run(
            ["sbt", "-batch", "runMain graft.Prof " + " ".join(names)],
            cwd=repo, env=env, capture_output=True, text=True,
            timeout=1800)
    except Exception as e:
        print(f"re-probe failed to run: {e}", file=sys.stderr)
        return {}
    out = {}
    for line in r.stdout.splitlines():
        m = re.match(r"^(\S+)\s+((?:\s*\d+\.\d+)+)\s*$", line)
        if m and m.group(1) in names:
            out[m.group(1)] = min(float(t) for t in m.group(2).split())
    missing = set(names) - set(out)
    if missing:
        print(f"re-probe missing results for {sorted(missing)} "
              f"(rc={r.returncode})", file=sys.stderr)
    return out


def main():
    ap = argparse.ArgumentParser(description=__doc__,
        formatter_class=argparse.RawDescriptionHelpFormatter)
    ap.add_argument("new_path", help="this round's BENCH_FULL.json")
    ap.add_argument("old_path", help="the prior round's BENCH_FULL.json")
    ap.add_argument("--md", dest="md_out", default=None,
        help="markdown output path (default: BENCH_DELTA.md beside new)")
    ap.add_argument("--no-reprobe", action="store_true",
        help="skip the isolation re-probe of flagged regressions")
    ns = ap.parse_args()
    new_path, old_path, md_out = ns.new_path, ns.old_path, ns.md_out
    if md_out is None:
        md_out = os.path.join(os.path.dirname(os.path.abspath(new_path)),
                              "BENCH_DELTA.md")
    dnew, qnew = load(new_path)
    dold, qold = load(old_path)
    shared = sorted(set(qnew) & set(qold))
    rows = [(k, qold[k], qnew[k], qnew[k] / qold[k] if qold[k] > 0 else float("inf"))
            for k in shared]
    candidates = [r for r in rows
                  if r[2] > 2.0 * r[1] and r[2] - r[1] > 1.0]
    cleared = []  # (name, old, benched, probed)
    if candidates and not ns.no_reprobe:
        probes = reprobe([r[0] for r in candidates], dnew.get("sf", ""))
        kept = []
        for k, o, n, x in candidates:
            p = probes.get(k)
            # apply the same gate to the PROBED steady-state time: a
            # candidate that no longer exceeds it was host noise
            if p is not None and not (p > 2.0 * o and p - o > 1.0):
                cleared.append((k, o, n, p))
            else:
                kept.append((k, o, p if p is not None else n,
                             (p if p is not None else n) / o
                             if o > 0 else float("inf")))
        candidates = kept
    regressions = candidates
    regressions.sort(key=lambda r: -(r[2] - r[1]))
    improvements = sorted((r for r in rows if r[1] - r[2] > 1.0),
                          key=lambda r: -(r[1] - r[2]))
    tot_old = sum(qold[k] for k in shared)
    tot_new = sum(qnew[k] for k in shared)

    lines = []
    lines.append("# BENCH delta\n")
    lines.append(f"new: `{new_path}` (sf={dnew.get('sf')}, "
                 f"total={dnew.get('value')}s over {len(qnew)} queries)")
    lines.append(f"old: `{old_path}` (sf={dold.get('sf')}, "
                 f"total={dold.get('value')}s over {len(qold)} queries)")
    lines.append(f"\nShared {len(shared)} queries: "
                 f"{tot_old:.1f} s -> {tot_new:.1f} s "
                 f"({tot_new / tot_old:.2f}x)\n" if tot_old > 0 else "")
    def table(title, rs):
        if not rs:
            return [f"## {title}\n", "(none)\n"]
        out = [f"## {title}\n", "| query | old s | new s | ratio |",
               "|---|---|---|---|"]
        out += [f"| {k}{' ⚠ re-scoped' if k in RESCOPED else ''} "
                f"| {o:.2f} | {n:.2f} | {x:.2f}x |"
                for k, o, n, x in rs[:20]]
        out.append("")
        return out
    lines += table("Regressions (>2x and >1 s, reproduced under re-probe)",
                   regressions)
    if cleared:
        lines.append("## Noise-cleared (flagged by the single-run bench, "
                     "NOT reproduced in isolation)\n")
        lines.append("| query | old s | benched s | probed s |")
        lines.append("|---|---|---|---|")
        lines += [f"| {k} | {o:.2f} | {n:.2f} | {p:.2f} |"
                  for k, o, n, p in cleared]
        lines.append("")
    lines += table("Improvements (>1 s faster)", improvements)
    noted = sorted(set(shared) & set(RESCOPED))
    if noted:
        lines.append("## Measurement-boundary notes\n")
        lines += [f"- **{k}**: {RESCOPED[k]}" for k in noted]
        lines.append("")
    added = sorted(set(qnew) - set(qold))
    removed = sorted(set(qold) - set(qnew))
    if added:
        lines.append(f"Added queries: {', '.join(added)}\n")
    if removed:
        lines.append(f"Removed queries: {', '.join(removed)}\n")
    failed = dnew.get("failed", [])
    if failed:
        lines.append(f"FAILED queries in new run: {', '.join(failed)}\n")
    text = "\n".join(lines) + "\n"
    with open(md_out, "w") as f:
        f.write(text)
    print(text)
    if regressions:
        print(f"FAIL: {len(regressions)} quer{'y' if len(regressions) == 1 else 'ies'} "
              f"regressed >2x (see table)", file=sys.stderr)
        return 1
    print("OK: no >2x per-query regressions")
    return 0


if __name__ == "__main__":
    sys.exit(main())
