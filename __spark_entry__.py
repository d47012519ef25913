"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value hash -> CORRECTNESS_r{N}.json).

All implementations live in the ``diive_spark`` package (see SURVEY.md
section 2 for the operator inventory and reference citations).
"""

from __future__ import annotations

import functools
import os
import sys
from collections.abc import Callable

_REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, _REPO)
# executor Python workers inherit PYTHONPATH from the driver process env
# — sys.path edits alone don't reach them
_pp = os.environ.get("PYTHONPATH", "")
if _REPO not in _pp.split(os.pathsep):
    os.environ["PYTHONPATH"] = f"{_REPO}{os.pathsep}{_pp}" if _pp else _REPO

from pyspark.sql import DataFrame, SparkSession  # noqa: E402

from diive_spark.queries import QUERIES  # noqa: E402


def _ensure_workers(spark: SparkSession) -> None:
    """Make ``diive_spark`` importable by executor Python workers even
    when the session was created before our PYTHONPATH export (the
    driver owns the session): ship the packaged zip via addPyFile —
    exactly the spark-submit --py-files mechanism."""
    sc = spark.sparkContext
    if getattr(sc, "_diive_spark_shipped", False):
        return
    try:
        from scripts.package import build

        sc.addPyFile(build())
    except Exception:
        pass  # PYTHONPATH export usually suffices in local mode
    sc._diive_spark_shipped = True


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: the engine's spine —
    scan -> derived series -> min-count-gated bucket rollup
    (resample semantics of diive/core/times/resampling.py:13-132)."""
    from diive_spark.queries import q_rollup

    _ensure_workers(spark)
    return q_rollup(spark, "/root/testdata/sf0.001")


def _wrap(fn):
    @functools.wraps(fn)
    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        _ensure_workers(spark)
        return fn(spark, sf_dir)

    return run


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: _wrap(fn) for name, (fn, _) in QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB oracle twins; omitted for non-SQL-expressible ops."""
    return {name: sql for name, (_, sql) in QUERIES.items() if sql is not None}
