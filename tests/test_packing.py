"""Sequence packing: hand-computed layout, determinism across
partitionings, and shard parallelism plan shape."""

from __future__ import annotations

import pyspark.sql.functions as F

from diive_spark.operators.packing import pack_sequences, packing_stats


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, n_tok long")


def test_pack_sequences_hand_layout(spark):
    # one shard, seq_len 10: docs 4,8,3,10 -> offsets 0,4,12,15..25
    df = _docs(spark, [(1, 4), (2, 8), (3, 3), (4, 10)])
    packed = pack_sequences(
        df, seq_len=10, shard_expr=F.lit(0)
    ).orderBy("doc_id")
    got = [(r["tok_start"], r["tok_end"], r["first_seq"], r["last_seq"],
            r["n_splits"]) for r in packed.collect()]
    assert got == [
        (0, 4, 0, 0, 0),      # fits in seq 0
        (4, 12, 0, 1, 1),     # straddles seq 0/1
        (12, 15, 1, 1, 0),
        (15, 25, 1, 2, 1),    # straddles seq 1/2
    ]
    stats = packing_stats(pack_sequences(df, seq_len=10,
                                         shard_expr=F.lit(0)),
                          seq_len=10).collect()[0]
    assert stats["n_docs"] == 4
    assert stats["n_tokens"] == 25
    assert stats["n_seqs"] == 3          # ceil(25/10)
    assert stats["n_crossings"] == 2
    assert abs(stats["fill_ratio"] - 25 / 30) < 1e-9


def test_pack_sequences_zero_length_doc(spark):
    df = _docs(spark, [(1, 5), (2, 0), (3, 5)])
    packed = {r["doc_id"]: r for r in
              pack_sequences(df, seq_len=4, shard_expr=F.lit(0)).collect()}
    z = packed[2]
    assert z["tok_start"] == z["tok_end"] == 5
    assert z["first_seq"] == z["last_seq"] == 1  # offset 5 -> seq 1
    assert z["n_splits"] == 0


def test_pack_sequences_partitioning_invariant(spark):
    rows = [(i, (i * 7) % 13 + 1) for i in range(200)]
    a = pack_sequences(_docs(spark, rows).repartition(1), seq_len=32,
                       n_shards=4)
    b = pack_sequences(_docs(spark, rows).repartition(16), seq_len=32,
                       n_shards=4)
    pa = sorted(map(tuple, a.collect()))
    pb = sorted(map(tuple, b.collect()))
    assert pa == pb


def test_pack_sequences_no_single_partition_window(spark):
    """The cumsum window partitions by shard — a SinglePartition window
    (global cumsum) would serialize the whole corpus through one task."""
    df = _docs(spark, [(i, 5) for i in range(50)])
    packed = pack_sequences(df, seq_len=16, n_shards=8)
    plan = packed._jdf.queryExecution().executedPlan().toString()
    assert "SinglePartition" not in plan


def test_packing_stats_all_zero_length_shard_ansi_safe(spark):
    """A shard holding only zero-length docs gives total=0, n_seqs=0;
    fill_ratio must be NULL (try_divide), not an ANSI DIVIDE_BY_ZERO
    job abort."""
    docs = spark.createDataFrame(
        [(i, 0) for i in range(8)], "doc_id long, n_tok int"
    )
    packed = pack_sequences(docs, seq_len=16, n_shards=2)
    prev = spark.conf.get("spark.sql.ansi.enabled", None)
    spark.conf.set("spark.sql.ansi.enabled", "true")
    try:
        rows = packing_stats(packed, seq_len=16).collect()
    finally:
        if prev is None:
            spark.conf.unset("spark.sql.ansi.enabled")
        else:
            spark.conf.set("spark.sql.ansi.enabled", prev)
    assert rows and all(r["fill_ratio"] is None for r in rows)
    assert all(r["n_seqs"] == 0 for r in rows)
