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
  - exit 1 when any query regresses (print them, worst first), else 0.

Writes a markdown delta table (biggest movers both directions) to --md
(default BENCH_DELTA.md next to the NEW file).
"""
import argparse
import json
import os
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
}


def load(path):
    with open(path) as f:
        d = json.load(f)
    return d, {k: v for k, v in d.get("queries", {}).items() if v >= 0}


def main():
    ap = argparse.ArgumentParser(description=__doc__,
        formatter_class=argparse.RawDescriptionHelpFormatter)
    ap.add_argument("new_path", help="this round's BENCH_FULL.json")
    ap.add_argument("old_path", help="the prior round's BENCH_FULL.json")
    ap.add_argument("--md", dest="md_out", default=None,
        help="markdown output path (default: BENCH_DELTA.md beside new)")
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
    regressions = [r for r in rows
                   if r[2] > 2.0 * r[1] and r[2] - r[1] > 1.0]
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
    lines += table("Regressions (>2x and >1 s)", regressions)
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
