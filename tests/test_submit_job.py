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


@pytest.mark.slow
def test_spark_submit_standalone_multi_executor(tmp_path, spark):
    """The north_rule deployment shape end-to-end: spark-submit
    --py-files against a REAL standalone master with two worker JVMs
    (multi-executor, cross-process shuffle). The planted exact-dup pair
    must land in one cluster, same as the local[4] smoke above."""
    import subprocess
    import time

    import pyspark

    spark_home = os.path.dirname(os.path.abspath(pyspark.__file__))
    spark_class = os.path.join(spark_home, "bin", "spark-class")
    spark_submit = os.path.join(spark_home, "bin", "spark-submit")
    if not (os.path.exists(spark_class) and os.path.exists(spark_submit)):
        pytest.skip("pyspark bin scripts not present")

    zpath = tmp_path / "lsh_spark.zip"
    with zipfile.ZipFile(zpath, "w") as z:
        for root, _dirs, files in os.walk(os.path.join(REPO, "lsh_spark")):
            for f in files:
                if f.endswith(".py"):
                    full = os.path.join(root, f)
                    z.write(full, os.path.relpath(full, REPO))

    master_url = "spark://127.0.0.1:7177"
    env = {**os.environ, "SPARK_HOME": spark_home,
           "SPARK_NO_DAEMONIZE": "1",
           "SPARK_LOG_DIR": str(tmp_path / "logs"),
           "PYSPARK_PYTHON": sys.executable}
    os.makedirs(env["SPARK_LOG_DIR"], exist_ok=True)
    procs = [subprocess.Popen(
        [spark_class, "org.apache.spark.deploy.master.Master",
         "--host", "127.0.0.1", "--port", "7177", "--webui-port", "8381"],
        env=env, stdout=open(tmp_path / "master.log", "w"),
        stderr=subprocess.STDOUT)]
    time.sleep(5)
    for i in range(2):
        procs.append(subprocess.Popen(
            [spark_class, "org.apache.spark.deploy.worker.Worker",
             master_url, "--cores", "2", "--memory", "4g",
             "--port", str(7190 + i), "--webui-port", str(8390 + i),
             "--work-dir", str(tmp_path / f"worker{i}")],
            env=env, stdout=open(tmp_path / f"worker{i}.log", "w"),
            stderr=subprocess.STDOUT))

    from lsh_spark import synth
    out = tmp_path / "clusters"
    try:
        res = subprocess.run(
            [spark_submit, "--master", master_url,
             "--conf", "spark.sql.shuffle.partitions=8",
             "--conf", "spark.executor.cores=2",
             "--conf", "spark.executor.memory=2g",
             "--conf", "spark.cores.max=4",
             "--py-files", str(zpath),
             os.path.join(REPO, "jobs", "cluster_job.py"),
             "--input", synth.transcripts_path("t1"),
             "--output", str(out),
             "--num-perms", "16"],
            cwd=str(tmp_path), env=env,
            capture_output=True, text=True, timeout=600)
        assert res.returncode == 0, res.stderr[-4000:]
    finally:
        for p in reversed(procs):
            p.terminate()
        for p in procs:
            try:
                p.wait(timeout=20)
            except subprocess.TimeoutExpired:
                p.kill()

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
