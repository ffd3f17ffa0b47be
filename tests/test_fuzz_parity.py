"""Smoke coverage for the randomized sketch-parity fuzz harness
(tools/fuzz_parity.py): one trial per family runs green inside the suite,
so a regression in any kernel/estimator/reference-shim surfaces here even
when the full sweep isn't run. The full record lives in PARITY_FUZZ.json
(260 trials, 13 families, 0 failures, master seed 20260818; second-seed
sweep 130 @ 777 also clean).
"""

from __future__ import annotations

import sys

import pytest

sys.path.insert(0, "/root/repo/tools")

from fuzz_parity import FAMILIES, run_trial


@pytest.mark.parametrize("trial", range(len(FAMILIES)),
                         ids=[name for name, _ in FAMILIES])
def test_parity_fuzz_family(trial):
    rec = run_trial(trial, master_seed=424242)
    assert rec["ok"], rec


def test_parity_fuzz_reports_failure_not_crash(monkeypatch):
    """A mismatch must surface as ok=False with the assertion text, not a
    crash — the harness's exit-1 contract depends on it."""
    import fuzz_parity as fp

    def broken(rng):
        raise AssertionError("synthetic register mismatch")

    monkeypatch.setitem(
        dict(enumerate(fp.FAMILIES)), 0, ("broken", broken))
    monkeypatch.setattr(fp, "FAMILIES", [("broken", broken)])
    rec = fp.run_trial(0, master_seed=1)
    assert rec["ok"] is False and "synthetic" in rec["error"]
