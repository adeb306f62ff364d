"""North-rule deployment shape: the pipeline runs as a REAL
``spark-submit --py-files kahi_spark.zip jobs/cdc_ingest_job.py``
process (not just importable code) — packaged exactly as a cluster
submission would be, resumable on re-submit."""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import zipfile

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _zip_package(dest: str) -> str:
    zpath = os.path.join(dest, "kahi_spark.zip")
    with zipfile.ZipFile(zpath, "w") as z:
        pkg = os.path.join(REPO, "kahi_spark")
        for root, _dirs, files in os.walk(pkg):
            for f in files:
                if f.endswith(".py"):
                    full = os.path.join(root, f)
                    z.write(full, os.path.relpath(full, REPO))
    return zpath


@pytest.mark.slow
def test_spark_submit_py_files_end_to_end(spark, tmp_path):
    """Generate a small binlog, run the job via spark-submit in its
    own JVM, then re-submit: the second run must apply 0 new epochs
    (checkpoint resume) and the final state must equal the in-process
    reducer's answer."""
    from pyspark.sql import functions as F

    from kahi_spark.gen import write_event_batches
    from kahi_spark.operators.merge import normalize_events, reduce_events_to_state

    binlog = str(tmp_path / "binlog")
    write_event_batches(binlog, n_events=2000, n_batches=4, seed=5)

    spark_submit = os.path.join(
        os.path.dirname(os.path.dirname(sys.executable)), "bin", "spark-submit"
    )
    if not os.path.exists(spark_submit):
        spark_submit = shutil.which("spark-submit")
    if spark_submit is None or not os.path.exists(spark_submit):
        import pyspark

        spark_submit = os.path.join(os.path.dirname(pyspark.__file__), "bin", "spark-submit")
    assert os.path.exists(spark_submit), "spark-submit launcher not found"

    zpath = _zip_package(str(tmp_path))
    args = [
        spark_submit,
        "--master", "local[4]",
        "--conf", "spark.sql.shuffle.partitions=4",
        "--conf", "spark.ui.enabled=false",
        "--py-files", zpath,
        os.path.join(REPO, "jobs", "cdc_ingest_job.py"),
        "--events", binlog,
        "--table", str(tmp_path / "table"),
        "--checkpoint", str(tmp_path / "ckpt"),
        "--mode", "mor",
        "--n-buckets", "4",
        "--max-files-per-trigger", "2",
        "--timeout-s", "180",
    ]
    env = {**os.environ, "PYSPARK_PYTHON": sys.executable}

    r1 = subprocess.run(args, capture_output=True, text=True, timeout=300, env=env)
    assert r1.returncode == 0, r1.stderr[-2000:]
    m1 = json.loads([l for l in r1.stdout.splitlines() if l.startswith("{")][-1])
    assert len(m1["epochs"]) >= 2  # multiple micro-batches ran

    # re-submit: checkpoint resume → zero new epochs
    r2 = subprocess.run(args, capture_output=True, text=True, timeout=300, env=env)
    assert r2.returncode == 0, r2.stderr[-2000:]
    m2 = json.loads([l for l in r2.stdout.splitlines() if l.startswith("{")][-1])
    assert m2["epochs"] == []

    # final state parity vs the independent batch reducer
    from kahi_spark.sinks.snapshot import SnapshotTable

    table = SnapshotTable(spark, str(tmp_path / "table"), n_buckets=4, mode="mor")
    got = table.read()
    raw = spark.read.parquet(binlog)
    expect = reduce_events_to_state(normalize_events(raw)).select(*got.columns)
    assert got.exceptAll(expect).count() == 0
    assert expect.exceptAll(got).count() == 0
