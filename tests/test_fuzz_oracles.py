"""One randomized-differential trial per operator family (the full
harness, tools/fuzz_oracles.py, runs >= 50 trials per round; this smoke
keeps the harness itself pinned by CI)."""

import sys

sys.path.insert(0, "/root/repo/tools")

import fuzz_oracles


def test_fuzz_one_trial_per_family(spark):
    summary = fuzz_oracles.run(len(fuzz_oracles.FAMILIES), 7, spark=spark)
    bad = [r for r in summary["results"] if not r["ok"]]
    assert not bad, bad
