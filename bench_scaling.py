"""N → 4N scaling-efficiency evidence (north rule).

No multi-node cluster exists in this sandbox, so cluster-size scaling is
evidenced by running the IDENTICAL flagship job (bench.py --scaling, a one-scan HLL+count-min+ADBF suite build) at two
parallelism levels — local[1] (N) and local[4] (4N) — in separate
processes on the same deterministic input, and reporting throughput at both
plus efficiency = tp(4N) / (4 * tp(N)). Each level runs ``--reps`` times
and the best throughput is kept (this sandbox shows large first-touch
page-fault stalls unrelated to the engine). Results land in
BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))


def run_once(cpus: int) -> dict:
    env = dict(os.environ, SPARK_GRAFT_CPUS=str(cpus))
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py"), "--scaling"],
        env=env, capture_output=True, text=True, timeout=900,
    )
    return json.loads(out.stdout.strip().splitlines()[-1])


def main() -> None:
    # INTERLEAVED reps: this sandbox's available throughput drifts by 2-3x
    # over minutes (noisy neighbors), so levels must be sampled alternately
    # and compared by best-of; raw samples are reported for transparency.
    reps = int(os.environ.get("BENCH_SCALING_REPS", "3"))
    t0 = time.time()
    runs: dict[int, list[dict]] = {1: [], 4: []}
    for _ in range(reps):
        for cpus in (1, 4):
            runs[cpus].append(run_once(cpus))
    key = "tokens_per_sec_suite_build"
    n1 = max(runs[1], key=lambda p: p[key])
    n4 = max(runs[4], key=lambda p: p[key])
    raw = {c: [p[key] for p in rs] for c, rs in runs.items()}
    tp1 = n1["tokens_per_sec_suite_build"]
    tp4 = n4["tokens_per_sec_suite_build"]
    eff = tp4 / (4 * tp1) if tp1 else 0.0
    result = {
        "metric": "scaling_efficiency_N_to_4N",
        "value": round(eff, 3),
        "unit": "ratio",
        "tokens_per_sec_local1": tp1,
        "tokens_per_sec_local4": tp4,
        "synth_tokens": n1["synth_tokens"],
        "reps": reps,
        "raw_tokens_per_sec": raw,
        "wall_sec": round(time.time() - t0, 1),
    }
    print(json.dumps(result))
    md = f"""# BENCH baseline — measured on this engine

Flagship job: one-scan distributed multi-sketch suite build (HLL++ p=14 +
count-min 4x4096 + exponential ADBF m=65536) over a deterministic
synthetic pre-tokenized table ({n1['synth_tokens']:,} tokens, shape per
BASELINE.json input_hint), identical input at both parallelism levels,
best of {reps} runs per level (see bench_scaling.py for methodology and
why best-of: sandbox first-touch page-fault stalls).

| Parallelism | tokens/sec (best of {reps}) | all samples |
| --- | --- | --- |
| local[1]  (N)  | {tp1:,} | {raw[1]} |
| local[4]  (4N) | {tp4:,} | {raw[4]} |

**Scaling efficiency N→4N = {eff:.3f}** (target >= 0.8; efficiency =
tp(4N) / (4 x tp(N))).

Accuracy at this scale: HLL++ estimate {n4['hll_estimate']:,} for
{n4['synth_tokens']:,} generated tokens (vocabulary = token ids; the
estimate tracks distinct ids within the 1.04/sqrt(2^14) ≈ 0.8% envelope —
bound-checked in tests/test_hll.py and tests/test_aggregate_harness.py).

Full per-operator wall times: BENCH_r{{N}}.json (driver-run `bench.py`).
"""
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(os.path.join(REPO, "BENCH", "BASELINE.md"), "w") as fh:
        fh.write(md)


if __name__ == "__main__":
    main()
