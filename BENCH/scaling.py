"""Controlled N-vs-4N scaling evidence: tmpfs-shuffle A/B + I/O accounting.

The sandbox is a Firecracker VM with heavy host-side CPU steal — identical
runs vary ±2-3× — and raw-CPU probes show the 32-thread top end saturates
(multiprocessing busy-loop throughput: 2→8 procs eff ~0.70, 4→16 ~0.81,
8→32 ~0.63). So the honest measurement protocol is:

  * cores 4 / 8 / 16 (below the saturation knee); 4 vs 16 = N vs 4N,
  * interleaved repetitions, min-aggregated per core count
    (min is the steal-free estimate),
  * input sized so per-stage compute dominates fixed stage latency
    (tier 'xl', ~4.1M turns),
  * TWO storage arms for spark.local.dir — the single virtio disk
    (/tmp, ~0.5 GB/s measured) vs tmpfs (/dev/shm, ~2 GB/s measured) —
    isolating the shuffle-I/O share of the non-scaling Amdahl term,
  * per-run shuffle/input/spill BYTE accounting parsed from the Spark
    event log, so the I/O attribution is arithmetic, not argued,
  * a fixed-overhead probe (tier 't1', ~2k turns — pure stage latency)
    so the non-scaling term can be split into (a) fixed scheduling
    latency and (b) data-proportional I/O.

Three-point Amdahl fit t(c) = s + p/c (least squares over the min times):
``s`` is the component that does not scale with local cores. On a real
N-vs-4N *executor* cluster the disk-I/O share of ``s`` scales with
executor count (each executor brings its own disks), which is why
local-mode under-estimates multi-node scaling for shuffle-heavy jobs.

Writes BENCH/scaling_results.json and prints one JSON line.

Usage: python BENCH/scaling.py [reps] [tier]
Env: LSH_SCALING_ARMS=disk,tmpfs (default) | tmpfs | disk
"""

from __future__ import annotations

import glob
import json
import os
import shutil
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from lsh_spark import synth  # noqa: E402
from lsh_spark.config import DedupConfig  # noqa: E402
from lsh_spark.plans.pipeline import dedup_pipeline  # noqa: E402
from lsh_spark.session import get_spark  # noqa: E402

CFG = DedupConfig(hash_mode="fast", substring_sample_mod=8,
                  band_rows=2)  # r=2: 16 bands x 2 rows. r=1 makes
# every pair of docs sharing one popular shingle a candidate, so
# sub-cap bucket sizes grow with corpus size and candidate pairs
# grow ~N^1.75 (measured: 4x docs -> 11.4x candidates, while
# verified/simhash/substring pairs all stayed 4.0x). r=2 keys
# buckets on two minima jointly; planted-dup recall on the scale
# tier is IDENTICAL (0.9924, same caught set - the cascade union
# covers the tail). This is the banding geometry a 10^12-turn run
# needs; parity/oracle configs keep the reference r=1.
# Two N-vs-4N pairs. 3v12 is the PRIMARY pair: a Spark local[c] session
# with Arrow kernels keeps ~2c threads busy (c JVM task threads + c
# Python workers), and the measured busy-thread curve of this VM
# (BENCH/inflation_results.json + BENCH/BASELINE.md) is near-linear only
# up to ~12-16 busy threads, delivering only ~14-20 core-equivalents at
# 32 busy threads (window-dependent). 4v16 (= 8v32 busy threads) therefore measures the hypervisor's
# saturation knee, not the engine; it is still recorded as the
# continuity pair with rounds 1-2.
CORE_POINTS = tuple(int(c) for c in os.environ.get(
    "LSH_SCALING_CORES", "3,4,12,16").split(","))
PAIRS = tuple((n, 4 * n) for n in CORE_POINTS if 4 * n in CORE_POINTS)
EVENT_DIR = "/tmp/lsh-spark-events"
ARM_DIRS = {"disk": "/tmp/lsh-spark-local", "tmpfs": "/dev/shm/lsh-spark-local"}


def measure_write_bw(path: str, mib: int = 1024) -> float:
    """Sequential write bandwidth in bytes/sec (dd, direct where supported)."""
    target = os.path.join(path, "ddtest.bin")
    os.makedirs(path, exist_ok=True)
    flags = [] if path.startswith("/dev/shm") else ["oflag=direct"]
    t0 = time.time()
    subprocess.run(["dd", "if=/dev/zero", f"of={target}", "bs=1M",
                    f"count={mib}", *flags], check=True,
                   stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL)
    dt = time.time() - t0
    os.remove(target)
    return mib * 1024 * 1024 / dt


def parse_event_log(app_dir: str) -> dict:
    """Sum task I/O + CPU metrics from one application's event log.

    ``executor_run_time_sec`` is the core accounting quantity: the sum of
    task run times for identical work at two core counts measures the
    per-task hardware inflation (hypervisor thread-throughput curve) with
    zero modelling — wall ratios divide out into (inflation x packing)."""
    tot = {"shuffle_write_bytes": 0, "shuffle_read_bytes": 0,
           "input_bytes": 0, "disk_spill_bytes": 0, "mem_spill_bytes": 0,
           "executor_run_time_sec": 0.0, "jvm_gc_time_sec": 0.0,
           "n_tasks": 0}
    files = [fp for fp in
             glob.glob(os.path.join(app_dir, "**", "*"), recursive=True)
             if os.path.isfile(fp)]
    for fp in sorted(files):
        with open(fp, errors="replace") as f:
            for line in f:
                if '"SparkListenerTaskEnd"' not in line:
                    continue
                try:
                    ev = json.loads(line)
                except json.JSONDecodeError:   # torn tail line of a live log
                    continue
                m = ev.get("Task Metrics") or {}
                sw = m.get("Shuffle Write Metrics") or {}
                sr = m.get("Shuffle Read Metrics") or {}
                im = m.get("Input Metrics") or {}
                tot["shuffle_write_bytes"] += sw.get("Shuffle Bytes Written", 0)
                tot["shuffle_read_bytes"] += (sr.get("Local Bytes Read", 0)
                                              + sr.get("Remote Bytes Read", 0))
                tot["input_bytes"] += im.get("Bytes Read", 0)
                tot["disk_spill_bytes"] += m.get("Disk Bytes Spilled", 0)
                tot["mem_spill_bytes"] += m.get("Memory Bytes Spilled", 0)
                tot["executor_run_time_sec"] += m.get("Executor Run Time", 0) / 1000
                tot["jvm_gc_time_sec"] += m.get("JVM GC Time", 0) / 1000
                tot["n_tasks"] += 1
    tot["executor_run_time_sec"] = round(tot["executor_run_time_sec"], 1)
    tot["jvm_gc_time_sec"] = round(tot["jvm_gc_time_sec"], 1)
    return tot


def run_once(cores: int, path: str, local_dir: str | None = None,
             with_events: bool = False) -> tuple[float, dict | None]:
    conf = {}
    if local_dir:
        os.makedirs(local_dir, exist_ok=True)
        conf["spark.local.dir"] = local_dir
    if with_events:
        shutil.rmtree(EVENT_DIR, ignore_errors=True)
        os.makedirs(EVENT_DIR, exist_ok=True)
        conf["spark.eventLog.enabled"] = "true"
        conf["spark.eventLog.dir"] = f"file://{EVENT_DIR}"
        conf["spark.eventLog.compress"] = "false"
        conf["spark.eventLog.rolling.enabled"] = "false"
    else:
        # must be explicit: SparkSession.builder conf set by an EARLIER
        # run in this process survives getOrCreate() across spark.stop(),
        # so a bare conf would silently keep event logging on for every
        # subsequent rep (observed: rep1 wrote an .inprogress log)
        conf["spark.eventLog.enabled"] = "false"
    # fixed shuffle width at BOTH cluster sizes (like a production job
    # config): otherwise the session default (3x cores) gives N and 4N
    # different physical plans, and the comparison measures partitioning
    # policy, not scaling. 48 = 4 waves at 12 cores, 16 at 3.
    spark = get_spark(f"scaling_{cores}_{time.monotonic_ns() % 9973}",
                      cores=cores, shuffle_partitions=48,
                      extra_conf=conf)
    try:
        tr = spark.read.parquet(path)
        t0 = time.time()
        dedup_pipeline(spark, tr, CFG).count()
        wall = round(time.time() - t0, 1)
    finally:
        spark.stop()
    io = parse_event_log(EVENT_DIR) if with_events else None
    return wall, io


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


def run_arm(arm: str, path: str, reps: int) -> dict:
    local_dir = ARM_DIRS[arm]
    results: dict[int, list[float]] = {c: [] for c in CORE_POINTS}
    io_by_cores: dict[int, dict] = {}
    for rep in range(reps):
        order = CORE_POINTS if rep % 2 == 0 else tuple(reversed(CORE_POINTS))
        for cores in order:
            want_io = cores not in io_by_cores
            t, io = run_once(cores, path, local_dir, with_events=want_io)
            results[cores].append(t)
            if io is not None:
                io_by_cores[cores] = io
            print(f"[{arm}] rep{rep} cores={cores}: {t}s",
                  file=sys.stderr, flush=True)
    mins = {c: min(v) for c, v in results.items()}
    s, p = amdahl_fit(mins)
    pairs = {}
    for n, n4 in PAIRS:
        tn, t4n = mins[n], mins[n4]
        pairs[f"{n}v{n4}"] = {
            "sec_n": tn, "sec_4n": t4n,
            "speedup": round(tn / t4n, 3),
            "efficiency": round(tn / t4n / 4, 3),
        }
    prim = pairs[f"{PAIRS[0][0]}v{PAIRS[0][1]}"]
    return {
        "local_dir": local_dir,
        "all_sec": {str(c): results[c] for c in CORE_POINTS},
        "min_sec": {str(c): mins[c] for c in CORE_POINTS},
        "pairs": pairs,
        "sec_n": prim["sec_n"], "sec_4n": prim["sec_4n"],
        "speedup": prim["speedup"],
        "efficiency": prim["efficiency"],
        "amdahl": {"s_sec": s, "p_sec": p,
                   "parallel_fraction_at_n": round(
                       (p / PAIRS[0][0]) / (s + p / PAIRS[0][0]), 3)},
        "io_bytes_by_cores": {str(c): v for c, v in io_by_cores.items()},
    }


def main():
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    tier = sys.argv[2] if len(sys.argv) > 2 else "xl"
    arms = os.environ.get("LSH_SCALING_ARMS", "disk,tmpfs").split(",")
    path = synth.generate_tier(tier)
    t1_path = synth.generate_tier("t1")
    import pyarrow.parquet as pq
    turns = pq.read_metadata(path).num_rows

    bw = {"disk_write_bps": round(measure_write_bw("/tmp/lsh-bwtest")),
          "tmpfs_write_bps": round(measure_write_bw("/dev/shm/lsh-bwtest"))}
    shutil.rmtree("/tmp/lsh-bwtest", ignore_errors=True)
    shutil.rmtree("/dev/shm/lsh-bwtest", ignore_errors=True)

    out = {"tier": tier, "turns": turns, "reps": reps,
           "cores": list(CORE_POINTS), "bandwidth": bw, "arms": {}}
    for arm in arms:
        out["arms"][arm] = run_arm(arm.strip(), path, reps)
        shutil.rmtree(ARM_DIRS[arm.strip()], ignore_errors=True)

    # fixed stage-latency probe: same DAG, ~2k turns → data terms vanish
    out["fixed_stage_latency_sec"] = {
        str(c): run_once(c, t1_path)[0] for c in (CORE_POINTS[0], CORE_POINTS[-1])}

    # arithmetic I/O accounting: seconds the measured shuffle+spill bytes
    # need through each medium — compare against the Amdahl s split
    ref_arm = out["arms"].get("tmpfs") or next(iter(out["arms"].values()))
    io16 = ref_arm["io_bytes_by_cores"].get("16")
    if io16:
        moved = (io16["shuffle_write_bytes"] + io16["shuffle_read_bytes"]
                 + io16["disk_spill_bytes"])
        out["io_accounting"] = {
            "bytes_moved_16c": moved,
            "sec_through_disk": round(moved / bw["disk_write_bps"], 1),
            "sec_through_tmpfs": round(moved / bw["tmpfs_write_bps"], 1),
            "note": ("bytes = shuffle write + shuffle read + disk spill at "
                     "16 cores (event-log task metrics); divide by measured "
                     "sequential bandwidth for the serial-I/O bound. "
                     "localCheckpoint blocks ride the block manager "
                     "(memory-first at this RAM size) and are not counted."),
        }

    with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "scaling_results.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
