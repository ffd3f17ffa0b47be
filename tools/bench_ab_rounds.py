"""Interleaved cross-round benchmark: run the CURRENT tree and a BASE
commit alternately (A/B/A/B...) in one session so per-query round-over-
round deltas are paired against the same box conditions.

Why: this sandbox's throughput drifts 2-3x between minutes, so comparing
BENCH_r{N}.json files recorded hours apart mostly measures the box (the
round-3 report's control query — pure Spark built-in, zero repo code —
"regressed" 3.4x with no code change). Pairing base/head runs per round
removes that confound: each pair shares minutes-scale noise, and medians
over pairs are reported side by side.

Usage:
  python tools/bench_ab_rounds.py [base_commit] [pairs]   # default: HEAD~ 3
Writes BENCH/ab_<base>_vs_head.json and prints a per-query table.
Run EXCLUSIVELY (no concurrent Spark/pytest).
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_bench(cwd: str, sf_dir: str) -> dict:
    env = dict(os.environ, SPARK_GRAFT_SF_DIR=sf_dir)
    out = subprocess.run(
        [sys.executable, "bench.py"], cwd=cwd, env=env,
        capture_output=True, text=True, timeout=900,
    )
    for line in reversed(out.stdout.splitlines()):
        line = line.strip()
        if line.startswith("{"):
            return json.loads(line)
    raise RuntimeError(f"no JSON line from bench in {cwd}:\n{out.stderr[-2000:]}")


def main() -> int:
    base = sys.argv[1] if len(sys.argv) > 1 else "HEAD~"
    pairs = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    base_sha = subprocess.run(
        ["git", "rev-parse", "--short", base], cwd=REPO,
        capture_output=True, text=True, check=True,
    ).stdout.strip()
    wt = os.path.join(REPO, f".ab_base_{base_sha}")
    if not os.path.isdir(wt):
        subprocess.run(
            ["git", "worktree", "add", "--detach", wt, base_sha],
            cwd=REPO, check=True,
        )
    runs: dict[str, list[dict]] = {"base": [], "head": []}
    for i in range(pairs):
        # alternate within-round order: a fixed base-then-head order lets
        # any systematic second-process penalty (page reclaim of the
        # previous 10GB+ JVM, allocator warm state) masquerade as a head
        # regression — observed concretely: with fixed order, UNCHANGED
        # early queries read 1.2-2.4x "slower" on head across all rounds
        # while the zero-repo-code control read FASTER on head
        order = (("base", wt), ("head", REPO)) if i % 2 == 0 else (
            ("head", REPO), ("base", wt))
        for tag, cwd in order:
            r = run_bench(cwd, sf_dir)
            runs[tag].append(r)
            print(f"round {i} {tag}: total={r['value']}s "
                  f"suite={r['queries'].get('suite_build_synth')}s", flush=True)
    names = sorted(
        set(runs["base"][0]["queries"]) & set(runs["head"][0]["queries"])
    )
    table = {}
    print(f"\n{'query':28s} {'base-med':>9s} {'head-med':>9s} {'ratio':>6s}")
    for q in names:
        b = [r["queries"][q] for r in runs["base"]]
        h = [r["queries"][q] for r in runs["head"]]
        bm, hm = statistics.median(b), statistics.median(h)
        table[q] = {
            "base": b, "head": h,
            "base_median": round(bm, 3), "head_median": round(hm, 3),
            "head_over_base": round(hm / bm, 3) if bm else None,
        }
        print(f"{q:28s} {bm:9.3f} {hm:9.3f} {hm / bm if bm else 0:6.2f}")
    out_path = os.path.join(REPO, "BENCH", f"ab_{base_sha}_vs_head.json")
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    with open(out_path, "w") as fh:
        json.dump(
            {"base_commit": base_sha, "pairs": pairs, "sf_dir": sf_dir,
             "queries": table},
            fh, indent=1,
        )
    print("wrote", out_path)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
