"""The north-rule launch path, end-to-end: build dist/diive_spark.zip,
then run the flagship cascade job through a real ``spark-submit
--py-files`` subprocess whose PYTHONPATH does NOT contain the repo —
the zip must carry the whole package to the driver and executors,
exactly as on a cluster."""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SUBMIT = shutil.which("spark-submit") or os.path.join(
    os.path.dirname(sys.executable), "spark-submit"
)


@pytest.mark.skipif(not os.path.exists(SUBMIT), reason="no spark-submit")
def test_spark_submit_pyfiles_cascade(spark, tmp_path, tiny_tokens):
    sys.path.insert(0, os.path.join(REPO, "scripts"))
    try:
        from package import build
    finally:
        sys.path.pop(0)
    zip_path = build(str(tmp_path / "diive_spark.zip"))

    toks_path = str(tmp_path / "toks.parquet")
    tiny_tokens.write.parquet(toks_path)
    store_path = str(tmp_path / "store")

    env = dict(os.environ)
    # prove the zip is the only way the package reaches the job
    env.pop("PYTHONPATH", None)
    env["SPARK_LOCAL_DIRS"] = str(tmp_path / "sl")
    proc = subprocess.run(
        [
            SUBMIT,
            "--master", "local[4]",
            "--conf", "spark.ui.enabled=false",
            "--conf", "spark.sql.shuffle.partitions=8",
            "--py-files", zip_path,
            os.path.join(REPO, "scripts", "run_cascade_job.py"),
            "--tokens", toks_path,
            "--store", store_path,
        ],
        capture_output=True, text=True, timeout=600,
        cwd=str(tmp_path), env=env,
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    lines = [l for l in proc.stdout.splitlines()
             if l.startswith("CASCADE_METRICS ")]
    assert lines, proc.stdout[-3000:]
    report = json.loads(lines[0][len("CASCADE_METRICS "):])
    assert report["tier_1m"]["n_rows"] > 0

    # the submitted job's store is a normal TierStore: readable here,
    # resumable (a second submit would skip), and raw round-trips
    from diive_spark.operators.tiers import TierStore

    store = TierStore(spark, store_path)
    assert store.read("tier_1d").count() > 0
    assert store.read_raw_decoded().count() == tiny_tokens.count()
    assert len(store.lineage()) > 0
