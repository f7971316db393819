"""Controlled N-vs-4N scaling evidence run with Amdahl decomposition.

The sandbox is a Firecracker VM with heavy host-side CPU steal — identical
runs vary ±2-3× — and raw-CPU probes show the 32-thread top end saturates
(multiprocessing busy-loop throughput: 2→8 procs eff ~0.70, 4→16 ~0.81,
8→32 ~0.63). So the honest measurement protocol is:

  * cores 4 / 8 / 16 (below the saturation knee); 4 vs 16 = N vs 4N,
  * interleaved repetitions, min-aggregated per core count
    (min is the steal-free estimate),
  * input sized so per-stage compute dominates fixed stage latency
    (tier 'xl', ~4.1M turns),
  * a fixed-overhead probe (tier 't1', ~2k turns — pure stage latency)
    so the non-scaling term can be split into (a) fixed scheduling
    latency and (b) data-proportional single-disk I/O.

Three-point Amdahl fit t(c) = s + p/c (least squares over the min times):
``s`` is the component that does not scale with local cores. On THIS box
that component is dominated by shuffle/localCheckpoint writes through one
virtio disk — a term that on a real N-vs-4N *executor* cluster scales
with executor count (each executor brings its own disks), which is why
local-mode under-estimates multi-node scaling for shuffle-heavy jobs.

Writes BENCH/scaling_results.json and prints one JSON line.

Usage: python BENCH/scaling.py [reps] [tier]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from lsh_spark import synth  # noqa: E402
from lsh_spark.config import DedupConfig  # noqa: E402
from lsh_spark.plans.pipeline import dedup_pipeline  # noqa: E402
from lsh_spark.session import get_spark  # noqa: E402

CFG = DedupConfig(hash_mode="fast", substring_sample_mod=8)
CORE_POINTS = (4, 8, 16)


def run_once(cores: int, path: str) -> float:
    spark = get_spark(f"scaling_{cores}_{time.monotonic_ns() % 9973}",
                      cores=cores, shuffle_partitions=max(cores, 8))
    try:
        tr = spark.read.parquet(path)
        t0 = time.time()
        dedup_pipeline(spark, tr, CFG).count()
        return round(time.time() - t0, 1)
    finally:
        spark.stop()


def amdahl_fit(mins: dict[int, float]) -> tuple[float, float]:
    """Least-squares fit of t(c) = s + p/c over (core, min-time) points."""
    xs = [1.0 / c for c in mins]
    ys = [mins[c] for c in mins]
    n = len(xs)
    mx, my = sum(xs) / n, sum(ys) / n
    p = sum((x - mx) * (y - my) for x, y in zip(xs, ys)) / \
        sum((x - mx) ** 2 for x in xs)
    s = my - p * mx
    return round(s, 1), round(p, 1)


def main():
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    tier = sys.argv[2] if len(sys.argv) > 2 else "xl"
    path = synth.generate_tier(tier)
    t1_path = synth.generate_tier("t1")
    import pyarrow.parquet as pq
    turns = pq.read_metadata(path).num_rows

    results: dict[int, list[float]] = {c: [] for c in CORE_POINTS}
    for rep in range(reps):
        order = CORE_POINTS if rep % 2 == 0 else tuple(reversed(CORE_POINTS))
        for cores in order:
            t = run_once(cores, path)
            results[cores].append(t)
            print(f"rep{rep} cores={cores}: {t}s", file=sys.stderr, flush=True)
    mins = {c: min(v) for c, v in results.items()}
    # fixed stage-latency probe: same DAG, ~2k turns → data terms vanish
    overhead = {c: run_once(c, t1_path) for c in (4, 16)}
    s, p = amdahl_fit(mins)
    t4, t16 = mins[4], mins[16]
    out = {
        "tier": tier, "turns": turns, "reps": reps,
        "cores": list(CORE_POINTS),
        "all_sec": {str(c): results[c] for c in CORE_POINTS},
        "min_sec": {str(c): mins[c] for c in CORE_POINTS},
        "sec_n": t4, "sec_4n": t16,
        "speedup": round(t4 / t16, 3),
        "efficiency": round(t4 / t16 / 4, 3),
        "turns_per_sec_4n": round(turns / t16, 1),
        "amdahl": {
            "s_sec": s, "p_sec": p,
            "parallel_fraction_at_4": round((p / 4) / (s + p / 4), 3),
            "fixed_stage_latency_sec": overhead,
            "note": ("s = non-core-scaling component on ONE box: fixed stage "
                     "latency (see probe) + data-proportional single-disk "
                     "shuffle/checkpoint I/O; the latter scales with "
                     "executor count on a real cluster"),
        },
    }
    with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "scaling_results.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
