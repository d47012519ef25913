"""Empty/degenerate-input robustness: every operator a scheduled job
might feed an empty partition or single row must return an empty/sane
frame, not raise."""

from __future__ import annotations

import pyspark.sql.functions as F


def test_empty_series_operators(spark):
    from diive_spark.operators.gaps import gap_runs, interpolate_limited
    from diive_spark.operators.outliers import zscore_flag
    from diive_spark.operators.resample import bucket_rollup, compose_rollup

    empty = spark.createDataFrame(
        [], "source string, doc_id string, pos long, value double"
    )
    assert bucket_rollup(empty, every=60).count() == 0
    assert compose_rollup(bucket_rollup(empty, every=60), every=3600).count() == 0
    assert zscore_flag(empty).count() == 0
    assert gap_runs(empty).count() == 0
    assert interpolate_limited(empty).count() == 0


def test_empty_corpus_operators(spark):
    from diive_spark.operators.dedup import (
        connected_components, exact_dedup, jaccard_pairs_exact, minhash_dedup,
    )
    from diive_spark.operators.scrub import hash_split, redact_pii
    from diive_spark.operators.textstats import repetition_features, top_ngrams

    empty = spark.createDataFrame([], "doc_id long, text string")
    assert exact_dedup(empty).count() == 0
    assert jaccard_pairs_exact(empty).count() == 0
    assert minhash_dedup(empty).count() == 0
    assert repetition_features(empty).count() == 0
    assert top_ngrams(empty).count() == 0
    assert redact_pii(empty).count() == 0
    assert hash_split(empty, {"train": 1.0}, key_col="doc_id").count() == 0
    no_edges = spark.createDataFrame([], "id_a long, id_b long")
    assert connected_components(no_edges).count() == 0


def test_single_row_inputs(spark):
    from diive_spark.operators.joins import interval_join
    from diive_spark.operators.resample import bucket_rollup
    from diive_spark.operators.sessions import sessionize
    from diive_spark.operators.textstats import repetition_features

    one = spark.createDataFrame(
        [("s", "d", 0, 1.5)], "source string, doc_id string, pos long, value double"
    )
    r = bucket_rollup(one, every=60, mincounts_perc=0.0,
                      min_floor_rule=False).collect()
    assert len(r) == 1 and r[0]["n"] == 1 and r[0]["sd"] is None

    doc = spark.createDataFrame([(1, "hello")], "doc_id long, text string")
    rf = repetition_features(doc).collect()[0]
    assert rf["repetition_flag"] == 0

    import datetime as dt
    ev = spark.createDataFrame(
        [(1, dt.datetime(2024, 1, 1))], "user_id long, ts timestamp"
    )
    assert sessionize(ev).collect()[0]["session_id"] == 0

    pts = spark.createDataFrame([("a", 1.0)], "k string, ts double")
    no_iv = spark.createDataFrame([], "k string, start double, end double")
    assert interval_join(pts, no_iv, key_cols=["k"]).count() == 0
    assert interval_join(pts, no_iv, key_cols=["k"], how="left").count() == 1


def test_toolkit_operators_degenerate_inputs(spark):
    """The round-3 toolkit on empty / all-null / single-reading input:
    empty or sane frames out, never a raise."""
    from diive_spark.operators.analyses import (
        acf_agg,
        arrival_stats,
        candle_agg,
        compose_candles,
        compose_stats2d,
        counter_agg,
        gauge_agg,
        lttb_downsample,
        stats2d_agg,
        topk_agg,
    )
    from diive_spark.operators.outliers import (
        cusum_chart,
        ewma_chart,
        robust_zscore_flag,
        seasonal_zscore_flag,
    )

    schema = "source string, doc_id string, pos long, value double"
    empty = spark.createDataFrame([], schema)
    allnull = spark.createDataFrame(
        [("s", "d", i, None) for i in range(5)], schema
    )
    single = spark.createDataFrame([("s", "d", 0, 3.0)], schema)

    for df, n_in in ((empty, 0), (allnull, 5), (single, 1)):
        assert candle_agg(df, 60).count() in (0, 1)
        assert compose_candles(candle_agg(df, 60), 3600).count() in (0, 1)
        assert gauge_agg(df, 60).count() in (0, 1)
        assert stats2d_agg(df, 60).count() in (0, 1)
        assert compose_stats2d(stats2d_agg(df, 60), 3600).count() in (0, 1)
        assert topk_agg(df, 60).count() in (0, 1)
        assert acf_agg(df, 60).count() in (0, 1)
        assert arrival_stats(df, 60).count() == 0     # needs 2+ readings
        assert counter_agg(df, 60).count() in (0, 1)
        assert lttb_downsample(df, 2).count() in (0, 1)
        assert ewma_chart(df, window=2).count() in (0, 1)
        assert cusum_chart(df).count() in (0, 1)
        # flag operators keep the full row set (null flags on nulls)
        assert robust_zscore_flag(df).count() == n_in
        assert seasonal_zscore_flag(df, period=4).count() == n_in

    # single reading: slope/acf/r2 are NULL, candle open==close
    row = stats2d_agg(single, 60).collect()[0]
    assert row["n"] == 1 and row["slope"] is None
    c = candle_agg(single, 60).collect()[0]
    assert c["open"] == c["close"] == 3.0
    g = gauge_agg(single, 60).collect()[0]
    assert g["delta"] is None and g["idelta_left"] is None


def test_ddsketch_and_compose_family_degenerate_inputs(spark):
    """Round-4 operators on empty / single-row / all-null inputs:
    empty or sane frames, never a raise."""
    from diive_spark.operators.analyses import (
        collapse_ddsketch, compose_counter, compose_ddsketch, compose_gauge,
        compose_heartbeat, compose_state, compose_twa, counter_agg,
        ddsketch_agg, ddsketch_collapse_level, ddsketch_quantiles,
        gauge_agg, heartbeat_agg, state_agg, time_weighted_avg)

    empty = spark.createDataFrame(
        [], "source string, doc_id string, pos long, value double"
    )
    sk = ddsketch_agg(empty, every=60)
    assert sk.count() == 0
    assert compose_ddsketch(sk, 3600).count() == 0
    assert collapse_ddsketch(sk, 3).count() == 0
    assert ddsketch_quantiles(sk, [0.5]).count() == 0
    # empty sketch: any level satisfies any cap -> level 0
    assert ddsketch_collapse_level(sk, max_buckets=8) == 0
    for compose, agg in (
        (compose_counter, counter_agg),
        (compose_gauge, gauge_agg),
        (compose_twa, time_weighted_avg),
    ):
        assert compose(agg(empty, every=60), 3600).count() == 0
    assert compose_state(
        state_agg(empty.withColumn("state", F.lit("x")), every=60), 3600
    ).count() == 0
    assert compose_heartbeat(
        heartbeat_agg(empty, every=60, alive_window=5), 3600
    ).count() == 0

    # all-null values: sketch drops them; single zero value -> zero store
    nul = spark.createDataFrame(
        [("a", "d", 0, None), ("a", "d", 1, None), ("a", "d", 2, 0.0)],
        "source string, doc_id string, pos long, value double",
    )
    rows = ddsketch_agg(nul, every=60).collect()
    assert len(rows) == 1 and rows[0]["sign"] == 0 and rows[0]["cnt"] == 1
    q = ddsketch_quantiles(ddsketch_agg(nul, every=60), [0.5]).collect()
    assert len(q) == 1 and q[0]["est"] == 0.0 and q[0]["n"] == 1


def test_snapshot_backend_degenerate(spark, tmp_path):
    """SnapshotBackend on an empty-partition write and reserved-column
    misuse: clean errors / sane snapshots, never corruption."""
    import pytest

    from diive_spark.operators.tiers import SnapshotBackend

    be = SnapshotBackend(spark, str(tmp_path / "t"))
    with pytest.raises(ValueError):
        be.read("never_written")
    assert be.partition_values("never_written") == []
    assert not be.table_exists("never_written")
    df = spark.createDataFrame([("a", 1.0)], "source string, snapv double")
    with pytest.raises(ValueError):
        be.write_partitions(df, "t")  # reserved column name
    # empty write commits an empty snapshot; reads error clearly
    empty = spark.createDataFrame([], "source string, v double")
    be.write_partitions(empty, "t")
    assert be.table_exists("t") and be.partition_values("t") == []
    with pytest.raises(ValueError):
        be.read("t")
