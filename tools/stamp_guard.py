#!/usr/bin/env python3
"""Stamp-at-HEAD guard (round-14 verdict item 4).

Round-13 hygiene finding: two code commits landed AFTER the round's
V_FULL/V_INCR/BENCH stamps and were never swept by them, so the stamps
certified a different tree than the round shipped. Since round 14 every
stamp records the git SHA it was taken at ("commit"); this guard compares
the newest stamps against HEAD:

  * HEAD == stamp commit (and tree clean)      -> OK
  * post-stamp commits touch NO src/main code  -> OK (docs/stamps only)
  * post-stamp commits touch src/main          -> FAIL, prints the touched
    files and demands either a full re-run of round_close steps 1-3 or a
    targeted `runMain graft.VerifySubset ... <touched queries>` + a
    recorded re-sweep note:

      python3 tools/stamp_guard.py --resweep "<what was re-swept and rc>"

    --resweep appends {"commit": HEAD, "note": ...} to the newest V_FULL
    stamp's "post_close_resweeps" so the next round's judge sees the gap
    was closed, then exits 0.

Run it before handing a round over (round_close runs it automatically at
the end, where it trivially passes — its value is on every LATER commit).
"""
import glob
import json
import re
import subprocess
import sys


def sh(*args: str) -> str:
    return subprocess.run(args, capture_output=True, text=True).stdout.strip()


def newest(pattern: str):
    files = sorted(glob.glob(pattern),
                   key=lambda f: int(re.search(r"_r(\d+)", f).group(1)))
    return files[-1] if files else None


def main() -> int:
    head = sh("git", "rev-parse", "HEAD")
    stamps = [p for p in (newest("V_FULL_r*.json"), newest("V_INCR_r*.json"))
              if p]
    bench = "BENCH_FULL.json"
    try:
        if json.load(open(bench)).get("commit"):
            stamps.append(bench)
    except Exception:
        pass
    if not stamps:
        print("stamp_guard: no stamps found")
        return 0

    if len(sys.argv) > 2 and sys.argv[1] == "--resweep":
        target = newest("V_FULL_r*.json")
        d = json.load(open(target))
        d.setdefault("post_close_resweeps", []).append(
            {"commit": head, "note": sys.argv[2]})
        open(target, "w").write(json.dumps(d) + "\n")
        print(f"stamp_guard: re-sweep note recorded in {target} at {head[:9]}")
        return 0

    worst = 0
    for path in stamps:
        d = json.load(open(path))
        sha = d.get("commit")
        if not sha:
            print(f"stamp_guard: {path} predates commit-stamping — re-stamp "
                  "it via round_close to arm the guard")
            continue
        if sha == head:
            print(f"stamp_guard: {path} is at HEAD ({head[:9]}) — OK")
            continue
        resweeps = {r.get("commit") for r in d.get("post_close_resweeps", [])}
        if head in resweeps:
            print(f"stamp_guard: {path} stamped at {sha[:9]}, HEAD "
                  f"{head[:9]} covered by a recorded re-sweep — OK")
            continue
        touched = [f for f in
                   sh("git", "diff", "--name-only", f"{sha}..HEAD").split("\n")
                   if f.startswith("src/main/")]
        if not touched:
            print(f"stamp_guard: {path} stamped at {sha[:9]}, HEAD "
                  f"{head[:9]} differs but no src/main change — OK")
            continue
        print(f"stamp_guard: {path} stamped at {sha[:9]} but HEAD "
              f"{head[:9]} changed src/main since:")
        for f in touched:
            print(f"  {f}")
        print("  -> re-run the sweeps (round_close steps 1-3) or "
              "VerifySubset the touched queries, then record it:")
        print('     python3 tools/stamp_guard.py --resweep '
              '"VerifySubset <names>: N/N at sf0.01+sf0.1"')
        worst = 1
    dirty = sh("git", "status", "--porcelain")
    if dirty:
        print("stamp_guard: NOTE working tree is dirty — stamps never cover "
              "uncommitted changes")
    return worst


if __name__ == "__main__":
    sys.exit(main())
