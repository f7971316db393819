"""Hardware-contention probe: the ACTUAL fused kernel under plain
multiprocessing — no Spark, no shuffle, no scheduler.

The N-vs-4N scaling gate keeps coming back to one number: per-task run
time measured from Spark event logs inflates ~1.4-2.0x when core count
goes 4 -> 16 on this Firecracker VM. Before attributing that to *our DAG*
we need the counterfactual: how much does THE SAME KERNEL on THE SAME
BYTES slow down when 16 copies run side by side with zero framework
involvement? Any inflation reproduced here is a property of the sandbox
host (CPU steal, SMT sharing, shared LLC/DRAM), not of the Spark plan —
on a real N-vs-4N *executor* cluster each executor brings its own socket,
LLC and memory channels, so this term does not exist there.

Protocol:
  * build one fixed corpus of documents (synth tier, text column only),
    split into equal chunks, fork a Pool(n) where every worker runs the
    fused per-doc pipeline (tokenize -> blake2b vocab hash -> rolling
    shingle/gram hashes -> minhash matrix min -> simhash) over the SAME
    total work at every pool size;
  * pool sizes 1..32; interleaved reps, min-aggregated (min is the
    steal-free estimate, same protocol as BENCH/scaling.py);
  * report wall, per-doc cpu-seconds (sum of worker-measured kernel time
    / docs), inflation vs 1-proc, and pool-to-pool scaling efficiency;
  * a pure busy-loop control distinguishes CPU-steal/SMT (hits the
    busy loop too) from memory-system contention (hits only the kernel).

Writes BENCH/inflation_results.json and prints one JSON line.

Usage: python BENCH/inflation_probe.py [reps] [tier]
"""

from __future__ import annotations

import json
import multiprocessing as mp
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

POOL_SIZES = (1, 3, 4, 12, 16, 24, 32)


def _kernel_chunk(texts: list[str]) -> tuple[int, float]:
    """Run the fused per-doc feature pipeline over a chunk; return
    (docs_done, kernel_cpu_seconds measured inside the worker)."""
    import numpy as np

    from lsh_spark.config import DedupConfig
    from lsh_spark.functions.hashing import M, minhash_params
    from lsh_spark.functions.text import py_tokens
    from lsh_spark.operators.fused import _rolling
    from lsh_spark.operators.shingle import _token_hashes

    cfg = DedupConfig(hash_mode="fast", substring_sample_mod=8)
    a_vec, b_vec = minhash_params(cfg.num_perms)
    shifts = np.arange(cfg.simhash_bits, dtype=np.uint64)
    t0 = time.perf_counter()
    tok_lists = [py_tokens(t) for t in texts]
    th, lens = _token_hashes(tok_lists)
    pos = 0
    for n in lens:
        seg = th[pos:pos + n]
        pos += n
        sh = (np.unique(_rolling(seg, cfg.shingle_k))
              if n >= cfg.shingle_k else np.empty(0, np.uint64))
        if n >= cfg.substring_k:
            g = _rolling(seg, cfg.substring_k)
            g = g[g % np.uint64(cfg.substring_sample_mod) == 0]
            np.unique(g)
        if len(sh):
            xr = sh.astype(np.int64) % M
            ((a_vec[:, None] * xr[None, :] + b_vec[:, None]) % M).min(axis=1)
        if n:
            uniq, counts = np.unique(seg, return_counts=True)
            signs = (((uniq[:, None] >> shifts[None, :]) & np.uint64(1))
                     .astype(np.int64) * 2 - 1)
            (signs * counts[:, None]).sum(axis=0)
    return len(texts), time.perf_counter() - t0


def _busy_chunk(n_iter: int) -> tuple[int, float]:
    """Pure-CPU control: tight integer loop, near-zero memory traffic."""
    t0 = time.perf_counter()
    x = 0
    for i in range(n_iter):
        x = (x * 1103515245 + 12345) & 0x7FFFFFFF
    return n_iter, time.perf_counter() - t0


def run_pool(fn, chunks: list, n_procs: int) -> dict:
    t0 = time.time()
    with mp.get_context("fork").Pool(n_procs) as pool:
        parts = pool.map(fn, chunks)
    wall = time.time() - t0
    units = sum(p[0] for p in parts)
    cpu = sum(p[1] for p in parts)
    return {"wall": round(wall, 2), "units": units,
            "cpu_sec": round(cpu, 2),
            "cpu_per_kunit_ms": round(cpu / units * 1e6, 1)}


def main():
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    tier = sys.argv[2] if len(sys.argv) > 2 else "scale"

    from lsh_spark import synth
    import pyarrow.parquet as pq
    path = synth.generate_tier(tier)
    texts = pq.read_table(path, columns=["text"]).column("text").to_pylist()
    print(f"corpus: {len(texts)} docs from tier {tier}", file=sys.stderr)

    # equal work at every pool size: fixed chunk size, chunk count is a
    # multiple of every pool size so each worker gets identical load
    n_chunks = 96
    per = len(texts) // n_chunks
    kernel_chunks = [texts[i * per:(i + 1) * per] for i in range(n_chunks)]
    busy_chunks = [2_000_000] * n_chunks

    results: dict[str, dict[int, list[dict]]] = {
        "kernel": {n: [] for n in POOL_SIZES},
        "busy": {n: [] for n in POOL_SIZES},
    }
    for rep in range(reps):
        order = POOL_SIZES if rep % 2 == 0 else tuple(reversed(POOL_SIZES))
        for n in order:
            rk = run_pool(_kernel_chunk, kernel_chunks, n)
            rb = run_pool(_busy_chunk, busy_chunks, n)
            results["kernel"][n].append(rk)
            results["busy"][n].append(rb)
            print(f"rep{rep} procs={n}: kernel {rk['wall']}s "
                  f"(cpu/doc {rk['cpu_per_kunit_ms']}us) busy {rb['wall']}s",
                  file=sys.stderr, flush=True)

    out = {"tier": tier, "docs": len(texts), "reps": reps,
           "pools": list(POOL_SIZES), "workloads": {}}
    for wl in ("kernel", "busy"):
        mins = {n: min(r["wall"] for r in results[wl][n]) for n in POOL_SIZES}
        cpumin = {n: min(r["cpu_sec"] for r in results[wl][n])
                  for n in POOL_SIZES}
        out["workloads"][wl] = {
            "all_wall": {str(n): [r["wall"] for r in results[wl][n]]
                         for n in POOL_SIZES},
            "min_wall": {str(n): mins[n] for n in POOL_SIZES},
            "min_cpu_sec": {str(n): cpumin[n] for n in POOL_SIZES},
            # inflation: worker-measured cpu-seconds for the same work,
            # n procs vs 1 proc — pure hardware contention
            "cpu_inflation_vs_1": {
                str(n): round(cpumin[n] / cpumin[1], 3) for n in POOL_SIZES},
            "eff_3_to_12": round(mins[3] / mins[12] / 4, 3),
            "eff_4_to_16": round(mins[4] / mins[16] / 4, 3),
            "eff_8eq_to_32eq": round(mins[16] / mins[32] / 2, 3),
            "core_equivalents": {
                str(n): round(mins[1] / mins[n], 2) for n in POOL_SIZES},
        }

    with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "inflation_results.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
