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
