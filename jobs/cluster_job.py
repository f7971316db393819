"""spark-submit entrypoint: near-duplicate clustering as a cluster job.

north_rule deployment mode: ``spark-submit --py-files lsh_spark.zip
jobs/cluster_job.py --input <transcripts parquet/Iceberg path> --output
<clusters path>``. The session comes from spark-submit (master, executor
counts, memory all owned by the submit command — the code never hardcodes
local mode); the library arrives via --py-files, so nothing needs to be
installed on the executors.

Build the artifact with:  python -m zipfile -c lsh_spark.zip lsh_spark
Smoke-tested end-to-end (zip + spark-submit local[4]) in
tests/test_submit_job.py.
"""

from __future__ import annotations

import argparse


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True,
                    help="transcripts table path (parquet dir or file)")
    ap.add_argument("--output", required=True,
                    help="output path for (doc_id, cluster_id) parquet")
    ap.add_argument("--checkpoint-dir", default=None,
                    help="resumable CheckpointStore root (optional)")
    ap.add_argument("--granularity", default="conv", choices=["conv", "turn"])
    ap.add_argument("--hash-mode", default="fast", choices=["fast", "portable"])
    ap.add_argument("--num-perms", type=int, default=32)
    ap.add_argument("--passes", default="minhash,simhash,substring")
    args = ap.parse_args()

    # Import AFTER argparse so --help works without the --py-files zip;
    # on executors the zip is on sys.path automatically.
    from pyspark.sql import SparkSession

    from lsh_spark.config import DedupConfig
    from lsh_spark.plans.checkpoint import CheckpointStore
    from lsh_spark.plans.pipeline import dedup_pipeline

    spark = SparkSession.builder.appName("lsh_spark_cluster_job").getOrCreate()
    cfg = DedupConfig(granularity=args.granularity, hash_mode=args.hash_mode,
                      num_perms=args.num_perms)
    store = CheckpointStore(args.checkpoint_dir) if args.checkpoint_dir else None
    tr = spark.read.parquet(args.input)
    labels = dedup_pipeline(spark, tr, cfg, store=store,
                            passes=tuple(args.passes.split(",")))
    labels.write.mode("overwrite").parquet(args.output)
    spark.stop()


if __name__ == "__main__":
    main()
