"""Per-stage scaling diagnosis: WHERE does the non-scaling time live?

The tmpfs-vs-disk A/B (scaling.py) showed the shuffle medium is *not* the
bottleneck (disk arm ≈ tmpfs arm; the 128 GiB page cache absorbs /tmp
shuffle files), so the ~40 s Amdahl serial term at tier xl must be
attributed stage by stage. This script runs the same dedup pipeline once
per core count with event logs on, then reports per stage:

  wall        stage completion - submission (what the user waits)
  task_sum    sum of task run times (the parallelizable work)
  n_tasks     task count (parallelism available)
  max_task    longest task (straggler / skew indicator)
  par_eff     task_sum / (wall * cores) — how full the cores were

Stages with n_tasks < cores or max_task ≈ wall are the non-scaling ones.
Prints a ranked table per core count plus the scaling verdict per stage
name (4c wall vs 16c wall).

Usage: python BENCH/stage_analysis.py [tier]
"""

from __future__ import annotations

import glob
import json
import os
import shutil
import sys
import time
from collections import defaultdict

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
EVENT_DIR = "/tmp/lsh-spark-events-stage"


def run_once(cores: int, path: str) -> float:
    shutil.rmtree(EVENT_DIR, ignore_errors=True)
    os.makedirs(EVENT_DIR, exist_ok=True)
    conf = {
        "spark.eventLog.enabled": "true",
        "spark.eventLog.dir": f"file://{EVENT_DIR}",
        "spark.eventLog.compress": "false",
        "spark.eventLog.rolling.enabled": "false",
    }
    spark = get_spark(f"stage_analysis_{cores}", cores=cores,
                      extra_conf=conf)
    try:
        tr = spark.read.parquet(path)
        t0 = time.time()
        dedup_pipeline(spark, tr, CFG).count()
        wall = time.time() - t0
    finally:
        spark.stop()
    return wall


def parse_stages(event_dir: str) -> list[dict]:
    """One record per stage attempt: wall, task_sum, n_tasks, max_task."""
    stages: dict[tuple, dict] = {}
    task_time: dict[tuple, list] = defaultdict(list)
    files = [fp for fp in glob.glob(os.path.join(event_dir, "**", "*"),
                                    recursive=True) if os.path.isfile(fp)]
    for fp in sorted(files):
        with open(fp, errors="replace") as f:
            for line in f:
                if '"SparkListenerStageCompleted"' in line:
                    ev = json.loads(line)
                    si = ev["Stage Info"]
                    key = (si["Stage ID"], si["Stage Attempt ID"])
                    name = si["Stage Name"].split("\n")[0]
                    sub = si.get("Submission Time")
                    comp = si.get("Completion Time")
                    stages[key] = {
                        "stage": si["Stage ID"],
                        "name": name,
                        "wall": (comp - sub) / 1000.0 if sub and comp else 0.0,
                        "submission": sub, "completion": comp,
                    }
                elif '"SparkListenerTaskEnd"' in line:
                    ev = json.loads(line)
                    key = (ev["Stage ID"], ev["Stage Attempt ID"])
                    m = ev.get("Task Metrics") or {}
                    rt = m.get("Executor Run Time", 0) / 1000.0
                    task_time[key].append(rt)
    out = []
    for key, rec in stages.items():
        ts = task_time.get(key, [])
        rec["task_sum"] = round(sum(ts), 1)
        rec["n_tasks"] = len(ts)
        rec["max_task"] = round(max(ts), 1) if ts else 0.0
        rec["wall"] = round(rec["wall"], 1)
        out.append(rec)
    return sorted(out, key=lambda r: -r["wall"])


def gaps(stage_recs: list[dict], total_wall: float) -> float:
    """Wall seconds NOT covered by any running stage (driver-only time):
    merge [submission, completion] intervals and subtract from span."""
    iv = sorted((r["submission"], r["completion"]) for r in stage_recs
                if r["submission"] and r["completion"])
    if not iv:
        return total_wall
    covered = 0
    cur_s, cur_e = iv[0]
    for s, e in iv[1:]:
        if s > cur_e:
            covered += cur_e - cur_s
            cur_s, cur_e = s, e
        else:
            cur_e = max(cur_e, e)
    covered += cur_e - cur_s
    span = iv[-1][1] if iv else 0
    return round(max(0.0, total_wall - covered / 1000.0), 1)


def main():
    tier = sys.argv[1] if len(sys.argv) > 1 else "xl"
    cores_list = [int(c) for c in
                  (sys.argv[2].split(",") if len(sys.argv) > 2 else [4, 16])]
    path = synth.generate_tier(tier)
    report = {}
    for cores in cores_list:
        wall = run_once(cores, path)
        recs = parse_stages(EVENT_DIR)
        driver_gap = gaps(recs, wall)
        report[cores] = {"wall": round(wall, 1), "stages": recs,
                         "driver_gap_sec": driver_gap}
        print(f"\n=== cores={cores} wall={wall:.1f}s "
              f"driver-only(gap)={driver_gap}s ===", file=sys.stderr)
        print(f"{'stage':>6} {'wall':>7} {'tsum':>8} {'ntask':>6} "
              f"{'maxt':>7} {'eff':>5}  name", file=sys.stderr)
        for r in recs[:25]:
            eff = r["task_sum"] / (r["wall"] * cores) if r["wall"] else 0
            print(f"{r['stage']:>6} {r['wall']:>7} {r['task_sum']:>8} "
                  f"{r['n_tasks']:>6} {r['max_task']:>7} {eff:>5.2f}  "
                  f"{r['name'][:60]}", file=sys.stderr)
    outp = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "stage_analysis.json")
    with open(outp, "w") as f:
        json.dump({str(k): {"wall": v["wall"],
                            "driver_gap_sec": v["driver_gap_sec"],
                            "stages": v["stages"][:40]}
                   for k, v in report.items()}, f, indent=1)
    print(json.dumps({str(k): {"wall": v["wall"],
                               "driver_gap_sec": v["driver_gap_sec"]}
                      for k, v in report.items()}))


if __name__ == "__main__":
    main()
