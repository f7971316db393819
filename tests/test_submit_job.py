"""north_rule deployment smoke: spark-submit --py-files lsh_spark.zip.

Proves the library works when it arrives on executors as a zip via
--py-files (no repo on sys.path, no pip install) — the exact deployment
mode the north_rule names. Runs one clustering job at local[4] on the t1
fixture and checks the planted exact-duplicate pair lands in one cluster.
"""

from __future__ import annotations

import os
import shutil
import subprocess
import sys
import zipfile

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.slow
def test_spark_submit_py_files(tmp_path, t1_transcripts, spark):
    spark_submit = shutil.which("spark-submit") or os.path.join(
        os.path.dirname(sys.executable), "spark-submit")
    if not os.path.exists(spark_submit):
        pytest.skip("spark-submit not on PATH")

    zpath = tmp_path / "lsh_spark.zip"
    with zipfile.ZipFile(zpath, "w") as z:
        for root, _dirs, files in os.walk(os.path.join(REPO, "lsh_spark")):
            for f in files:
                if f.endswith(".py"):
                    full = os.path.join(root, f)
                    z.write(full, os.path.relpath(full, REPO))

    from lsh_spark import synth
    out = tmp_path / "clusters"
    env = {**os.environ, "PYSPARK_PYTHON": sys.executable}
    env.pop("PYTHONPATH", None)  # the zip must be the ONLY library source
    res = subprocess.run(
        [spark_submit, "--master", "local[4]",
         "--conf", "spark.sql.shuffle.partitions=8",
         "--py-files", str(zpath),
         os.path.join(REPO, "jobs", "cluster_job.py"),
         "--input", synth.transcripts_path("t1"),
         "--output", str(out),
         "--num-perms", "16"],
        cwd=str(tmp_path),  # NOT the repo root: forces import via the zip
        env=env, capture_output=True, text=True, timeout=600)
    assert res.returncode == 0, res.stderr[-4000:]

    labels = {r["doc_id"]: r["cluster_id"]
              for r in spark.read.parquet(str(out)).collect()}
    assert labels
    import duckdb
    con = duckdb.connect()
    golden = con.sql(
        f"SELECT conv_id_a, conv_id_b FROM "
        f"read_parquet('{synth.dup_labels_path('t1')}') "
        f"WHERE mutation = 'exact'").fetchall()
    assert golden
    for a, b in golden:
        assert labels.get(a) is not None and labels[a] == labels.get(b)
