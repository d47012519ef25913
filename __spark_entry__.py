"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value hash -> CORRECTNESS_r{N}.json).

All implementations live in the ``diive_spark`` package (see SURVEY.md
section 2 for the operator inventory and reference citations).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import DataFrame, SparkSession  # noqa: E402

from diive_spark.queries import QUERIES  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: the engine's spine —
    scan -> derived series -> min-count-gated bucket rollup
    (resample semantics of diive/core/times/resampling.py:13-132)."""
    from diive_spark.queries import q_rollup

    return q_rollup(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: fn for name, (fn, _) in QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB oracle twins; omitted for non-SQL-expressible ops."""
    return {name: sql for name, (_, sql) in QUERIES.items() if sql is not None}
