"""Physical-plan shape gates: the properties that matter at 100 TB must
hold in the plans Catalyst actually produces."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from diive_spark.operators.gaps import lookup_table_fill
from diive_spark.operators.resample import bucket_rollup
from diive_spark.plans.explain import (
    has_broadcast_join,
    has_partial_aggregation,
    has_pushed_filters,
    scan_read_schema,
    wholestage_codegen_spans,
)

SF = "/root/testdata/sf0.01"


def test_rollup_partial_aggregation(spark, tiny_series):
    df = bucket_rollup(tiny_series, every=60)
    assert "partial_sum" in df._jdf.queryExecution().executedPlan().toString()
    assert wholestage_codegen_spans(df) >= 1


def test_filter_pushdown_reaches_parquet(spark):
    ev = spark.read.parquet(f"{SF}/events.parquet")
    q = ev.where(F.col("event_type") == "click").select("event_id", "value")
    assert has_pushed_filters(q)
    rs = scan_read_schema(q)
    # column pruning: scan must not read all 6 columns
    assert "props" not in rs and "user_id" not in rs


def test_column_pruning_through_rollup(spark):
    ev = spark.read.parquet(f"{SF}/events.parquet")
    series = ev.select(
        F.col("event_type").alias("source"),
        F.lit("d").alias("doc_id"),
        F.col("event_id").alias("pos"),
        "value",
    )
    out = bucket_rollup(series, every=1000)
    rs = scan_read_schema(out)
    assert "props" not in rs and "ts" not in rs


def test_lookup_fill_broadcasts(spark, tiny_series):
    assert has_broadcast_join(lookup_table_fill(tiny_series, bucket=64))


def test_rollup_deterministic_across_partitionings(spark, tiny_series):
    """Same input, different physical partitioning → bit-identical
    rollup (the cross-cluster-size identity the north rule requires)."""
    a = bucket_rollup(tiny_series.repartition(3), every=60)
    b = bucket_rollup(tiny_series.repartition(17, "doc_id"), every=60)

    def checksum(df):
        return df.select(
            F.bit_xor(
                F.xxhash64("source", "doc_id", "bin_start", F.round("sum", 6),
                           "n", F.round("min", 6), F.round("max", 6))
            )
        ).first()[0]

    assert a.count() == b.count()
    assert checksum(a) == checksum(b)
