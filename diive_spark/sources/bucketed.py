"""Bucketed table layout: co-located, shuffle-free joins.

At 100 TB the dominant cost of a fact-to-fact join is the shuffle.
Spark's bucketing writes each table pre-hash-partitioned (and
optionally pre-sorted) on the join key; two tables bucketed on the
same key with the same bucket count join with ZERO Exchange — the
SortMergeJoin reads co-located buckets directly (and skips the sort
when sortBy matched).  This is the storage-level analog of the tier
store's "shuffle once, reuse the partitioning" rule: pay the
distribution cost at WRITE time, amortize it over every subsequent
join/aggregation on that key.

Bucket-count guidance at scale: pick `n_buckets` so one bucket of the
LARGER table is 100-500 MB (fits an executor task comfortably);
both tables must use the same count for the co-located path.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, SparkSession


def ensure_database(spark: SparkSession, name: str, location: str) -> None:
    """Create a database whose tables land under ``location`` (keeps
    bucketed warehouses out of the default cwd warehouse)."""
    spark.sql(f"CREATE DATABASE IF NOT EXISTS {name} LOCATION '{location}'")


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: Sequence[str],
    n_buckets: int,
    sort_cols: Sequence[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Save as a bucketed (+sorted) parquet table.  ``sort_cols``
    should normally equal ``bucket_cols`` so the join-side sort is
    also skipped."""
    w = df.write.mode(mode).format("parquet").bucketBy(
        int(n_buckets), *bucket_cols
    )
    if sort_cols:
        w = w.sortBy(*sort_cols)
    w.saveAsTable(table)


def colocated_join(
    spark: SparkSession, left_table: str, right_table: str,
    on: Sequence[str], how: str = "inner",
) -> DataFrame:
    """Join two identically-bucketed tables.  With matching bucket
    specs the physical plan contains no Exchange on either side (see
    tests/test_plans.py gate)."""
    return spark.table(left_table).join(
        spark.table(right_table), on=list(on), how=how
    )
