"""Controlled N-vs-4N scaling evidence run.

The sandbox is a Firecracker VM with heavy host-side CPU steal — identical
runs vary ±2-3× — and raw-CPU probes show the 32-thread top end saturates
(multiprocessing busy-loop throughput: 2→8 procs eff ~0.70, 4→16 ~0.81,
8→32 ~0.63). So the honest measurement protocol is:

  * cores 4 vs 16 (below the saturation knee) = the N vs 4N stand-in,
  * interleaved repetitions (A/B/A/B...), min-aggregated per core count
    (min is the steal-free estimate),
  * input sized so per-stage compute dominates fixed stage latency
    (tier 'xl', ~4.1M turns).

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


def main():
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    tier = sys.argv[2] if len(sys.argv) > 2 else "xl"
    path = synth.generate_tier(tier)
    import pyarrow.parquet as pq
    turns = pq.read_metadata(path).num_rows
    results = {4: [], 16: []}
    for rep in range(reps):
        for cores in (16, 4):
            t = run_once(cores, path)
            results[cores].append(t)
            print(f"rep{rep} cores={cores}: {t}s", file=sys.stderr, flush=True)
    t4, t16 = min(results[4]), min(results[16])
    out = {
        "tier": tier, "turns": turns, "reps": reps,
        "cores_n": 4, "cores_4n": 16,
        "all_sec_n": results[4], "all_sec_4n": results[16],
        "sec_n": t4, "sec_4n": t16,
        "speedup": round(t4 / t16, 3),
        "efficiency": round(t4 / t16 / 4, 3),
        "turns_per_sec_4n": round(turns / t16, 1),
    }
    with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "scaling_results.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
