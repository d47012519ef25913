"""Streaming rollup: availableNow file-stream equals the batch aggregate
once the watermark closes all windows, and checkpointed resume emits each
window exactly once across restarts."""

from __future__ import annotations

import pandas as pd
import pyspark.sql.functions as F

from diive_spark.streaming.rollup import stream_rollup_partials, write_tier_stream

SCHEMA = "source string, ts timestamp, value double"


def _batch(spark, start_min, n, source="web"):
    rows = [
        (source,
         (pd.Timestamp("2024-01-01")
          + pd.Timedelta(minutes=start_min, seconds=i * 10)).to_pydatetime(),
         float(i % 7))
        for i in range(n)
    ]
    return spark.createDataFrame(rows, SCHEMA)


def test_stream_equals_batch_and_resumes(spark, tmp_path):
    src = str(tmp_path / "in")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    def drain():
        stream = spark.readStream.schema(SCHEMA).parquet(src)
        q = write_tier_stream(stream_rollup_partials(stream), out, ckpt).start()
        q.awaitTermination(120)

    _batch(spark, 0, 60).write.mode("append").parquet(src)
    drain()
    n_run1 = spark.read.parquet(out).count()
    # append mode: trailing windows stay open until the watermark passes
    assert 0 < n_run1 < 11

    # resume from checkpoint with new data: watermark advances, closing
    # run-1 windows; run-2 trailing windows stay open
    _batch(spark, 60, 30).write.mode("append").parquet(src)
    drain()
    # flush sentinel far in the future closes everything else
    _batch(spark, 10000, 1).write.mode("append").parquet(src)
    drain()

    got = spark.read.parquet(out).where(
        F.col("bin_start") < pd.Timestamp("2024-01-02").to_pydatetime()
    )
    exp = (
        _batch(spark, 0, 60).unionByName(_batch(spark, 60, 30))
        .groupBy("source", F.window("ts", "1 minute"))
        .agg(F.count("value").alias("n"), F.sum("value").alias("sum"))
    )
    assert got.count() == exp.count()
    assert got.agg(F.sum("n")).first()[0] == 90
    assert abs(got.agg(F.sum("sum")).first()[0] - exp.agg(F.sum("sum")).first()[0]) < 1e-9
    # exactly-once per window across the three checkpointed runs
    dup = got.groupBy("source", "bin_start").count().where(F.col("count") > 1).count()
    assert dup == 0


def test_stateful_gap_detector_across_restarts(spark, tmp_path):
    from diive_spark.streaming.stateful import stream_gap_detector

    src = str(tmp_path / "gaps_in")
    out = str(tmp_path / "gaps_out")
    ckpt = str(tmp_path / "gaps_ckpt")
    schema = "source string, doc_id string, pos long"

    def drain():
        stream = spark.readStream.schema(schema).parquet(src)
        q = (
            stream_gap_detector(stream)
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    # batch 1: positions 0..9 then a jump to 15 (gap 10..14)
    rows1 = [("web", "d0", p) for p in list(range(10)) + [15]]
    spark.createDataFrame(rows1, schema).write.mode("append").parquet(src)
    drain()
    g1 = spark.read.parquet(out).collect()
    assert len(g1) == 1
    assert (g1[0]["gap_start"], g1[0]["gap_end"], g1[0]["gap_length"]) == (10, 14, 5)

    # RESTART (new query, same checkpoint): batch 2 starts at 18 —
    # the 16..17 gap spans the restart and is only detectable via state
    rows2 = [("web", "d0", p) for p in range(18, 21)]
    spark.createDataFrame(rows2, schema).write.mode("append").parquet(src)
    drain()
    g2 = {(r["gap_start"], r["gap_end"]): r["gap_length"]
          for r in spark.read.parquet(out).collect()}
    assert g2 == {(10, 14): 5, (16, 17): 2}


def test_stream_dedup_exact_suppresses_redelivery(spark, tmp_path):
    """dropDuplicatesWithinWatermark keeps the first delivery of each
    content digest across micro-batches; checkpointed resume does not
    re-emit survivors."""
    import pandas as pd

    from diive_spark.streaming.dedup import stream_dedup_exact

    src = str(tmp_path / "din")
    out = str(tmp_path / "dout")
    ckpt = str(tmp_path / "dckpt")
    sch = "source string, ts timestamp, text string"
    t0 = pd.Timestamp("2024-01-01")

    def mk(rows):
        return spark.createDataFrame(
            [(s, (t0 + pd.Timedelta(minutes=m)).to_pydatetime(), tx)
             for s, m, tx in rows], sch)

    mk([("web", 0, "alpha"), ("web", 1, "beta"),
        ("web", 2, "alpha"),                 # in-batch duplicate
        ("app", 3, "alpha")]).write.mode("append").parquet(src)

    def run():
        stream = spark.readStream.schema(sch).parquet(src)
        deduped = stream_dedup_exact(stream, watermark="10 minutes", key_cols=[])
        q = (deduped.writeStream.format("parquet")
             .option("path", out).option("checkpointLocation", ckpt)
             .outputMode("append").trigger(availableNow=True).start())
        q.awaitTermination(120)

    run()
    got1 = spark.read.parquet(out).toPandas()
    # 'alpha' survives once (first delivery), regardless of source/key
    assert sorted(got1["text"]) == ["alpha", "beta"]

    # second delivery wave: one replay + one new doc
    mk([("web", 4, "alpha"), ("web", 5, "gamma")]).write.mode(
        "append").parquet(src)
    run()
    got2 = spark.read.parquet(out).toPandas()
    assert sorted(got2["text"]) == ["alpha", "beta", "gamma"]


def test_stream_sessions_close_once_and_match_batch(spark, tmp_path):
    """Sessions emit exactly once when the watermark passes their close,
    survive a checkpointed restart with a session still open, and match
    the batch session_stats result."""
    from diive_spark.operators.sessions import session_stats
    from diive_spark.streaming.sessions import stream_sessions, write_sessions_stream

    src = str(tmp_path / "in")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    schema = "user_id long, ts timestamp, value double"

    def rows(user, start_min, secs):
        return [
            (user,
             (pd.Timestamp("2024-01-01")
              + pd.Timedelta(minutes=start_min, seconds=s)).to_pydatetime(),
             1.0)
            for s in secs
        ]

    def drain():
        stream = spark.readStream.schema(schema).parquet(src)
        q = write_sessions_stream(
            stream_sessions(stream, gap="10 minutes", watermark="10 minutes"),
            out, ckpt,
        ).start()
        q.awaitTermination(120)

    # user 1: two bursts 30 min apart -> two sessions; user 2: one burst
    batch1 = rows(1, 0, [0, 30, 60]) + rows(2, 5, [0, 10])
    spark.createDataFrame(batch1, schema).write.mode("append").parquet(src)
    drain()

    # second delivery RESUMES from checkpoint: user 1's second burst,
    # which also extends nothing (gap > 10 min)
    batch2 = rows(1, 30, [0, 20])
    spark.createDataFrame(batch2, schema).write.mode("append").parquet(src)
    drain()
    # sentinel far in the future closes all open sessions
    spark.createDataFrame(rows(9, 10000, [0]), schema).write.mode(
        "append"
    ).parquet(src)
    drain()

    got = spark.read.parquet(out).where(F.col("user_id") != 9).toPandas()
    assert len(got) == 3                                  # 2 + 1 sessions
    assert got.groupby(["user_id", "session_start"]).size().max() == 1
    exp = session_stats(
        spark.createDataFrame(batch1 + batch2, schema),
        gap_seconds=600.0, key_cols=("user_id",),
        agg_cols={"v_sum": F.sum("value")},
    ).where(F.col("user_id") != 9).toPandas()
    g = got.sort_values(["user_id", "session_start"]).reset_index(drop=True)
    e = exp.sort_values(["user_id", "session_start"]).reset_index(drop=True)
    assert g["n_events"].tolist() == e["n_events"].tolist()
    assert g["user_id"].tolist() == e["user_id"].tolist()


def test_stream_static_enrichment(spark, tmp_path):
    """Stream-static join: a file stream of events enriched with a
    static dimension (broadcast per micro-batch, no stream-state);
    output equals the batch join after drain."""
    src = str(tmp_path / "enr_in")
    out = str(tmp_path / "enr_out")
    ckpt = str(tmp_path / "enr_ckpt")
    schema = "user_id long, ts timestamp, value double"
    rows = [(i % 3, pd.Timestamp("2024-01-01").to_pydatetime(), float(i))
            for i in range(30)]
    spark.createDataFrame(rows, schema).write.parquet(src)
    dim = spark.createDataFrame(
        [(0, "bronze"), (1, "silver"), (2, "gold")], "user_id long, tier string"
    )
    stream = spark.readStream.schema(schema).parquet(src)
    q = (
        stream.join(F.broadcast(dim), on="user_id")
        .writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", ckpt)
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    got = spark.read.parquet(out)
    assert got.count() == 30
    sums = {r["tier"]: r["s"] for r in
            got.groupBy("tier").agg(F.sum("value").alias("s")).collect()}
    exp = {r["tier"]: r["s"] for r in
           spark.createDataFrame(rows, schema).join(dim, "user_id")
           .groupBy("tier").agg(F.sum("value").alias("s")).collect()}
    assert sums == exp


def test_stream_stream_interval_join(spark, tmp_path):
    """Watermarked stream-stream join: clicks join impressions of the
    same user within [0, 60 s] after the impression — both sides'
    state bounded by watermarks; output equals the batch theta-join."""
    imp_src = str(tmp_path / "imp")
    clk_src = str(tmp_path / "clk")
    out = str(tmp_path / "ss_out")
    ckpt = str(tmp_path / "ss_ckpt")
    schema_i = "user_id long, imp_ts timestamp, ad string"
    schema_c = "user_id long, clk_ts timestamp"
    t0 = pd.Timestamp("2024-01-01")

    def ts(s):
        return (t0 + pd.Timedelta(seconds=s)).to_pydatetime()

    imps = [(1, ts(0), "a"), (1, ts(300), "b"), (2, ts(0), "c")]
    clks = [(1, ts(30)),      # joins imp 'a' (30 s after)
            (1, ts(320)),     # joins imp 'b' (20 s after)
            (2, ts(120))]     # 120 s after 'c' -> outside window
    spark.createDataFrame(imps, schema_i).write.parquet(imp_src)
    spark.createDataFrame(clks, schema_c).write.parquet(clk_src)

    si = spark.readStream.schema(schema_i).parquet(imp_src).withWatermark(
        "imp_ts", "10 minutes")
    sc_ = spark.readStream.schema(schema_c).parquet(clk_src).withWatermark(
        "clk_ts", "10 minutes")
    joined = si.join(
        sc_,
        (si.user_id == sc_.user_id)
        & (sc_.clk_ts >= si.imp_ts)
        & (sc_.clk_ts <= si.imp_ts + F.expr("interval 60 seconds")),
    ).select(si.user_id, "ad", "imp_ts", "clk_ts")
    q = (
        joined.writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", ckpt)
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    got = spark.read.parquet(out).toPandas()
    assert sorted(got["ad"]) == ["a", "b"]          # 'c' never joined


def test_streamed_partials_compose_into_batch_tier(spark, tmp_path):
    """The claimed interop: 1m partials written by the STREAM feed the
    BATCH compose_rollup unchanged — the streamed tier_1m composed to
    1h equals a direct batch 1h aggregate of the same rows."""
    from diive_spark.operators.resample import compose_rollup

    src = str(tmp_path / "cp_in")
    out = str(tmp_path / "cp_out")
    ckpt = str(tmp_path / "cp_ckpt")
    _batch(spark, 0, 90).write.parquet(src)            # 15 min of 10 s data
    stream = spark.readStream.schema(SCHEMA).parquet(src)
    q = write_tier_stream(stream_rollup_partials(stream), out, ckpt).start()
    q.awaitTermination(120)
    # flush sentinel so every window closes
    _batch(spark, 10000, 1).write.mode("append").parquet(src)
    stream = spark.readStream.schema(SCHEMA).parquet(src)
    q = write_tier_stream(stream_rollup_partials(stream), out, ckpt).start()
    q.awaitTermination(120)

    streamed_1m = (
        spark.read.parquet(out)
        .where(F.col("bin_start") < pd.Timestamp("2024-01-02").to_pydatetime())
        .withColumn("bin_start", F.unix_timestamp("bin_start"))
        .withColumn("bin_end", F.unix_timestamp("bin_end"))
        .withColumn("bin_label", F.col("bin_end"))
    )
    t1h = compose_rollup(streamed_1m, every=3600, key_cols=["source"],
                         mincounts_perc=0.0, min_floor_rule=False)
    direct = (
        _batch(spark, 0, 90)
        .groupBy("source", F.window("ts", "1 hour"))
        .agg(F.count("value").alias("n"), F.sum("value").alias("s"),
             F.min("value").alias("mn"), F.max("value").alias("mx"))
    )
    g = t1h.select("source", "bin_start", "n", "sum", "min", "max").toPandas()
    e = direct.select(
        "source", F.unix_timestamp("window.start").alias("bin_start"),
        "n", "s", "mn", "mx",
    ).toPandas()
    g = g.sort_values("bin_start").reset_index(drop=True)
    e = e.sort_values("bin_start").reset_index(drop=True)
    assert len(g) == len(e) == 1                      # 15 min -> one 1 h bin
    assert g.loc[0, "n"] == e.loc[0, "n"]
    assert abs(g.loc[0, "sum"] - e.loc[0, "s"]) < 1e-9
    assert g.loc[0, "min"] == e.loc[0, "mn"] and g.loc[0, "max"] == e.loc[0, "mx"]


def test_stream_ingest_tokens_matches_batch_store(spark, tmp_path):
    """foreachBatch -> ingest_increment: streaming two token-batch
    files into a TierStore yields tiers bit-identical to one batch
    materialize over everything, and a restart with the same
    checkpoint re-reads nothing (offsets resumed)."""
    from diive_spark.datagen import series_view, tokens_table
    from diive_spark.operators.tiers import TierStore
    from diive_spark.streaming.rollup import stream_ingest_tokens

    src = str(tmp_path / "in")
    ckpt = str(tmp_path / "ckpt")
    b1 = tokens_table(spark, n_docs=40, seed=42)
    b2 = tokens_table(spark, n_docs=70, seed=42).where(
        "doc_id >= 'doc00000040'"
    )
    b1.write.mode("append").parquet(src)

    store = TierStore(spark, str(tmp_path / "stream_store"))

    q = stream_ingest_tokens(spark, src, store, checkpoint=ckpt)
    q.awaitTermination(120)
    b2.write.mode("append").parquet(src)
    q = stream_ingest_tokens(spark, src, store, checkpoint=ckpt)
    q.awaitTermination(120)

    full = TierStore(spark, str(tmp_path / "batch_store"))
    both = b1.unionByName(b2)
    full.write_raw(both)
    full.materialize_cascade(series_view(both))

    for tier in ("tier_1m", "tier_1h", "tier_1d"):
        a = store.read(tier).drop("hll").toPandas().sort_values(
            ["source", "doc_id", "bin_start"]).reset_index(drop=True)
        b = full.read(tier).drop("hll").toPandas().sort_values(
            ["source", "doc_id", "bin_start"]).reset_index(drop=True)
        assert len(a) == len(b) > 0, tier
        pd.testing.assert_frame_equal(
            a[sorted(a.columns)], b[sorted(b.columns)], check_dtype=False
        )

    # resume with nothing new: offsets are checkpointed, no re-merge
    n_lineage = len(store.lineage())
    q = stream_ingest_tokens(spark, src, store, checkpoint=ckpt)
    q.awaitTermination(120)
    assert len(store.lineage()) == n_lineage


def test_stream_ewma_chart_exact_recursion_across_restarts(spark, tmp_path):
    """Streaming EWMA: the exact infinite recursion carried as O(1)
    per-series state — streamed result over two micro-batches (with a
    query restart between them) equals the numpy recursion over the
    concatenated series; redelivered positions are not double-folded."""
    import numpy as np
    import pandas as pd

    from diive_spark.streaming.anomaly import stream_ewma_chart

    src = str(tmp_path / "ew_in")
    out = str(tmp_path / "ew_out")
    ckpt = str(tmp_path / "ew_ckpt")
    schema = "source string, doc_id string, pos long, value double"
    a, mu, sd = 0.25, 10.0, 2.0

    def drain():
        stream = spark.readStream.schema(schema).parquet(src)
        q = (
            stream_ewma_chart(stream, alpha=a, mean=mu, sd=sd, n_sigma=3.0)
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    rng = np.random.default_rng(31)
    v = rng.normal(10.0, 2.0, 60)
    v[40:50] += 9.0                                    # drift segment
    rows1 = [("web", "d0", int(p), float(v[p])) for p in range(30)]
    rows2 = [("web", "d0", int(p), float(v[p])) for p in range(30, 60)]
    rows2 += rows1[-3:]                                # replayed delivery

    spark.createDataFrame(rows1, schema).write.mode("append").parquet(src)
    drain()
    spark.createDataFrame(rows2, schema).write.mode("append").parquet(src)
    drain()                                            # fresh query, same ckpt

    got = (
        spark.read.parquet(out).toPandas()
        .sort_values("pos").reset_index(drop=True)
    )
    assert len(got) == 60                              # replays suppressed
    exp = np.empty(60)
    acc = None
    for t in range(60):
        acc = v[t] if acc is None else acc * (1 - a) + a * v[t]
        exp[t] = acc
    assert np.allclose(got.ewma.to_numpy(), exp, atol=1e-12)
    lim = 3.0 * sd * np.sqrt(a / (2 - a))
    assert (got.flag_ewma.to_numpy() == np.where(
        np.abs(exp - mu) > lim, 2, 0)).all()
    assert got.flag_ewma.to_numpy()[42:50].max() == 2  # drift caught


def test_stream_cusum_chart_state_spans_restart(spark, tmp_path):
    """Streaming CUSUM: the untruncated Page recursion as keyed state —
    a small persistent shift whose accumulation STRADDLES a query
    restart still crosses h (state survived the checkpoint); matches
    the numpy recursion exactly."""
    import numpy as np

    from diive_spark.streaming.anomaly import stream_cusum_chart

    src = str(tmp_path / "cu_in")
    out = str(tmp_path / "cu_out")
    ckpt = str(tmp_path / "cu_ckpt")
    schema = "source string, doc_id string, pos long, value double"
    k, h, mu, sd = 0.5, 5.0, 0.0, 1.0

    def drain():
        stream = spark.readStream.schema(schema).parquet(src)
        q = (
            stream_cusum_chart(stream, k=k, h=h, mean=mu, sd=sd)
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    rng = np.random.default_rng(37)
    v = rng.normal(0.0, 1.0, 60)
    v[25:] += 1.0          # shift starts in batch 1, accumulates into 2
    spark.createDataFrame(
        [("web", "d0", p, float(v[p])) for p in range(30)], schema
    ).write.mode("append").parquet(src)
    drain()
    spark.createDataFrame(
        [("web", "d0", p, float(v[p])) for p in range(30, 60)], schema
    ).write.mode("append").parquet(src)
    drain()

    got = (
        spark.read.parquet(out).toPandas()
        .sort_values("pos").reset_index(drop=True)
    )
    assert len(got) == 60
    hi = lo = 0.0
    exp_hi, exp_flag = np.empty(60), np.empty(60, dtype=int)
    for t in range(60):
        z = (v[t] - mu) / sd
        hi = max(0.0, hi + z - k)
        lo = max(0.0, lo - z - k)
        exp_hi[t] = hi
        exp_flag[t] = 2 if (hi > h or lo > h) else 0
    assert np.allclose(got.cusum_hi.to_numpy(), exp_hi, atol=1e-12)
    assert (got.flag_cusum.to_numpy() == exp_flag).all()
    assert got.flag_cusum.to_numpy()[30:].max() == 2   # crossed post-restart


def test_stream_ewma_chart_survives_arrow_chunk_splits(spark, tmp_path):
    """applyInPandasWithState hands a group over as MULTIPLE Arrow
    chunks (arrow.maxRecordsPerBatch): with tiny chunks and
    reverse-ordered input, a per-chunk sort would mis-drop later
    chunks as replays — the fold must concatenate all chunks before
    sorting (regression for the chunk-split review finding)."""
    import numpy as np

    from diive_spark.streaming.anomaly import stream_ewma_chart

    src = str(tmp_path / "ch_in")
    out = str(tmp_path / "ch_out")
    ckpt = str(tmp_path / "ch_ckpt")
    schema = "source string, doc_id string, pos long, value double"
    a = 0.3
    rng = np.random.default_rng(41)
    v = rng.normal(5.0, 1.0, 60)
    # one file, REVERSE pos order, single partition -> Arrow chunks of 8
    # arrive descending: pos 59..52 first, then 51..44, ...
    rows = [("web", "d0", int(p), float(v[p])) for p in range(59, -1, -1)]
    spark.createDataFrame(rows, schema).coalesce(1).write.parquet(src)

    old = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch")
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "8")
    try:
        q = (
            stream_ewma_chart(
                spark.readStream.schema(schema).parquet(src),
                alpha=a, mean=5.0, sd=1.0, n_sigma=3.0,
            )
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
    finally:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", old)

    got = (
        spark.read.parquet(out).toPandas()
        .sort_values("pos").reset_index(drop=True)
    )
    assert len(got) == 60                      # nothing mis-dropped
    exp, acc = np.empty(60), None
    for t in range(60):
        acc = v[t] if acc is None else acc * (1 - a) + a * v[t]
        exp[t] = acc
    assert np.allclose(got.ewma.to_numpy(), exp, atol=1e-12)


def test_stream_ddsketch_equals_batch_sketch(spark, tmp_path):
    """Streamed DDSketch partials are the IDENTICAL long form as batch
    ddsketch_agg: bit-equal rows on emitted bins, and the batch
    compose_ddsketch runs on the streamed store unchanged (the
    documented contract)."""
    from diive_spark.operators.analyses import compose_ddsketch, ddsketch_agg
    from diive_spark.streaming.rollup import (
        stream_ddsketch_partials, write_tier_stream)

    src = str(tmp_path / "in")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    # two appends so the watermark closes the first batch's windows
    _batch(spark, 0, 60).write.mode("append").parquet(src)
    stream = spark.readStream.schema(SCHEMA).parquet(src)
    q = write_tier_stream(stream_ddsketch_partials(stream), out, ckpt).start()
    q.awaitTermination(120)
    _batch(spark, 30, 60).write.mode("append").parquet(src)
    stream = spark.readStream.schema(SCHEMA).parquet(src)
    q = write_tier_stream(stream_ddsketch_partials(stream), out, ckpt).start()
    q.awaitTermination(120)

    got = spark.read.parquet(out)
    assert got.count() > 0
    # batch twin on the SAME rows, positions = epoch seconds
    batch = spark.read.parquet(src).select(
        "source",
        F.unix_timestamp("ts").cast("long").alias("pos"),
        "value",
    )
    want = ddsketch_agg(batch, every=60, key_cols=["source"])
    # streamed windows still open (after the last watermark) are absent
    # from `got`; compare only emitted bins
    emitted = [r.bin_start for r in got.select("bin_start").distinct().collect()]
    want = want.where(F.col("bin_start").isin(emitted))
    cols = ["source", "bin_start", "sign", "bucket", "cnt"]
    g = got.select(*cols).orderBy(*cols).toPandas()
    w = want.select(*cols).orderBy(*cols).toPandas()
    assert len(g) > 0 and g.reset_index(drop=True).equals(
        w.reset_index(drop=True))
    # batch compose runs on the streamed store UNCHANGED
    comp = compose_ddsketch(got, every=3600, key_cols=["source"])
    assert comp.count() > 0
    assert int(comp.agg(F.sum("cnt")).first()[0]) == int(
        got.agg(F.sum("cnt")).first()[0])


def test_stream_counter_partials_equals_batch(spark, tmp_path):
    """Streamed reset-healed counter partials, composed with the
    documented anchors, reproduce batch counter_agg EXACTLY across
    micro-batch boundaries (increments cross batches via keyed state)
    and tier up through compose_counter."""
    import numpy as np

    from diive_spark.operators.analyses import compose_counter, counter_agg
    from diive_spark.streaming.stateful import stream_counter_partials

    src = str(tmp_path / "ctr_in")
    out = str(tmp_path / "ctr_out")
    ckpt = str(tmp_path / "ctr_ckpt")
    schema = "source string, doc_id string, pos long, value double"

    rng = np.random.default_rng(23)
    c, rows = 0.0, []
    for pos in range(400):
        c += float(rng.integers(0, 5))
        if pos in (90, 181, 240):  # resets, incl. one at a batch edge
            c = 1.0
        rows.append(("web", "d0", pos, c))

    def drain():
        stream = spark.readStream.schema(schema).parquet(src)
        q = (
            stream_counter_partials(stream)
            .writeStream.format("parquet")
            .option("path", out).option("checkpointLocation", ckpt)
            .outputMode("append").trigger(availableNow=True).start()
        )
        q.awaitTermination(120)

    # three micro-batches with edges NOT on bin boundaries
    for lo, hi in ((0, 181), (181, 310), (310, 400)):
        spark.createDataFrame(rows[lo:hi], schema).write.mode(
            "append").parquet(src)
        drain()

    got = spark.read.parquet(out)
    composed = (
        got.groupBy("source", "doc_id", "bin_start")
        .agg(
            F.sum("n").cast("long").alias("n"),
            F.sum("counter_delta").alias("counter_delta"),
            F.sum("n_resets").cast("long").alias("n_resets"),
            F.min_by("first", F.col("first_pos")).alias("first"),
            F.max_by("last", F.col("last_pos")).alias("last"),
        )
    )
    want = counter_agg(spark.createDataFrame(rows, schema), every=60)
    cols = ["source", "doc_id", "bin_start", "n", "counter_delta",
            "n_resets", "first", "last"]
    g = composed.select(*cols).orderBy("bin_start").toPandas()
    w = want.select(*cols).orderBy("bin_start").toPandas()
    assert g.reset_index(drop=True).equals(w.reset_index(drop=True))
    assert int(w["n_resets"].sum()) == 3

    # streamed partials lift into tiers through the SAME batch composer
    tier = compose_counter(
        composed.withColumn("bin_end", F.col("bin_start") + 60)
        .withColumn("bin_label", F.col("bin_start") + 60), every=360)
    assert tier.count() > 0
    assert abs(
        tier.agg(F.sum("counter_delta")).first()[0]
        - w["counter_delta"].sum()
    ) < 1e-9


def test_stream_state_partials_equals_batch(spark, tmp_path):
    """Streamed time-in-state partials, plain-summed, reproduce batch
    state_agg's n_segments/duration exactly across micro-batch edges
    (segments close when their successor arrives, via keyed state)."""
    import numpy as np

    from diive_spark.operators.analyses import state_agg
    from diive_spark.streaming.stateful import stream_state_partials

    src = str(tmp_path / "st_in")
    out = str(tmp_path / "st_out")
    ckpt = str(tmp_path / "st_ckpt")
    schema = "source string, doc_id string, pos long, state string"

    rng = np.random.default_rng(29)
    rows, pos = [], 0
    while pos < 400:
        rows.append(("web", "d0", pos,
                     str(rng.choice(["ok", "warn", "down"]))))
        pos += int(rng.integers(1, 9))

    def drain():
        stream = spark.readStream.schema(schema).parquet(src)
        q = (
            stream_state_partials(stream)
            .writeStream.format("parquet")
            .option("path", out).option("checkpointLocation", ckpt)
            .outputMode("append").trigger(availableNow=True).start()
        )
        q.awaitTermination(120)

    cut = len(rows) // 2
    for chunk in (rows[:cut], rows[cut:]):
        spark.createDataFrame(chunk, schema).write.mode("append").parquet(src)
        drain()

    got = (
        spark.read.parquet(out)
        .groupBy("source", "doc_id", "bin_start", "state")
        .agg(F.sum("n_segments").cast("long").alias("n_segments"),
             F.sum("duration").alias("duration"))
    )
    want = state_agg(spark.createDataFrame(rows, schema), every=60)
    cols = ["source", "doc_id", "bin_start", "state", "n_segments",
            "duration"]
    g = got.select(*cols).orderBy("bin_start", "state").toPandas()
    w = want.select(*cols).orderBy("bin_start", "state").toPandas()
    assert len(g) > 0 and g.reset_index(drop=True).equals(
        w.reset_index(drop=True))


def test_stream_heartbeat_partials_equals_batch(spark, tmp_path):
    """Streamed heartbeat partials, plain-summed, reproduce batch
    heartbeat_agg exactly across micro-batch edges; compose_heartbeat
    lifts them into tiers."""
    import numpy as np

    from diive_spark.operators.analyses import (
        compose_heartbeat, heartbeat_agg)
    from diive_spark.streaming.stateful import stream_heartbeat_partials

    src = str(tmp_path / "hb_in")
    out = str(tmp_path / "hb_out")
    ckpt = str(tmp_path / "hb_ckpt")
    schema = "source string, doc_id string, pos long"

    rng = np.random.default_rng(31)
    rows, pos = [], 0
    while pos < 500:
        rows.append(("web", "d0", pos))
        pos += int(rng.integers(1, 25))

    def drain():
        stream = spark.readStream.schema(schema).parquet(src)
        q = (
            stream_heartbeat_partials(stream, alive_window=10)
            .writeStream.format("parquet")
            .option("path", out).option("checkpointLocation", ckpt)
            .outputMode("append").trigger(availableNow=True).start()
        )
        q.awaitTermination(120)

    cut = len(rows) // 2
    for chunk in (rows[:cut], rows[cut:]):
        spark.createDataFrame(chunk, schema).write.mode("append").parquet(src)
        drain()

    got = (
        spark.read.parquet(out)
        .groupBy("source", "doc_id", "bin_start")
        .agg(F.sum("n_beats").cast("long").alias("n_beats"),
             F.sum("uptime").alias("uptime"),
             F.sum("downtime").alias("downtime"),
             F.sum("n_gaps").cast("long").alias("n_gaps"))
    )
    want = heartbeat_agg(spark.createDataFrame(rows, schema), every=60,
                         alive_window=10)
    cols = ["source", "doc_id", "bin_start", "n_beats", "uptime",
            "downtime", "n_gaps"]
    g = got.select(*cols).orderBy("bin_start").toPandas()
    w = want.select(*cols).orderBy("bin_start").toPandas()
    assert len(g) > 0 and g.reset_index(drop=True).equals(
        w.reset_index(drop=True))
    comp = compose_heartbeat(
        got.withColumn("bin_end", F.col("bin_start") + 60)
        .withColumn("bin_label", F.col("bin_start") + 60)
        .withColumn("live_frac", F.col("uptime")
                    / (F.col("uptime") + F.col("downtime"))), every=300)
    assert comp.count() > 0


def test_stream_twa_partials_equals_batch(spark, tmp_path):
    """Streamed locf time-weight partials, plain-summed, reproduce
    batch time_weighted_avg exactly across micro-batch edges; the twa
    ratio re-derives from the summed partials."""
    import numpy as np

    from diive_spark.operators.analyses import time_weighted_avg
    from diive_spark.streaming.stateful import stream_twa_partials

    src = str(tmp_path / "twa_in")
    out = str(tmp_path / "twa_out")
    ckpt = str(tmp_path / "twa_ckpt")
    schema = "source string, doc_id string, pos long, value double"

    rng = np.random.default_rng(37)
    rows, pos = [], 0
    while pos < 450:
        v = None if rng.random() < 0.1 else float(rng.normal(20, 5))
        rows.append(("web", "d0", pos, v))
        pos += int(rng.integers(1, 20))

    def drain():
        stream = spark.readStream.schema(schema).parquet(src)
        q = (
            stream_twa_partials(stream)
            .writeStream.format("parquet")
            .option("path", out).option("checkpointLocation", ckpt)
            .outputMode("append").trigger(availableNow=True).start()
        )
        q.awaitTermination(120)

    cut = len(rows) // 2
    for chunk in (rows[:cut], rows[cut:]):
        spark.createDataFrame(chunk, schema).write.mode("append").parquet(src)
        drain()

    got = (
        spark.read.parquet(out)
        .groupBy("source", "doc_id", "bin_start")
        .agg(F.sum("n").cast("long").alias("n"),
             F.sum("integral").alias("integral"),
             F.sum("duration").alias("duration"))
        .withColumn("twa", F.col("integral") / F.col("duration"))
    )
    want = time_weighted_avg(spark.createDataFrame(rows, schema), every=60)
    cols = ["source", "doc_id", "bin_start", "n", "integral", "duration",
            "twa"]
    g = got.select(*cols).orderBy("bin_start").toPandas()
    w = want.select(*cols).orderBy("bin_start").toPandas()
    assert len(g) > 0
    assert (g["n"] == w["n"]).all()
    for c in ("integral", "duration", "twa"):
        assert (g[c] - w[c]).abs().max() < 1e-9


def test_stream_gauge_partials_equals_batch(spark, tmp_path):
    """Streamed signed-delta gauge partials, composed with the
    documented anchors, reproduce batch gauge_agg exactly across
    micro-batch edges — including rate via the dx span partial."""
    import numpy as np

    from diive_spark.operators.analyses import gauge_agg
    from diive_spark.streaming.stateful import stream_gauge_partials

    src = str(tmp_path / "g_in")
    out = str(tmp_path / "g_out")
    ckpt = str(tmp_path / "g_ckpt")
    schema = "source string, doc_id string, pos long, value double"

    rng = np.random.default_rng(41)
    rows, pos, g = [], 0, 50.0
    while pos < 450:
        g += float(rng.normal(0, 2))
        v = None if rng.random() < 0.08 else g
        rows.append(("web", "d0", pos, v))
        pos += int(rng.integers(1, 15))

    def drain():
        stream = spark.readStream.schema(schema).parquet(src)
        q = (
            stream_gauge_partials(stream)
            .writeStream.format("parquet")
            .option("path", out).option("checkpointLocation", ckpt)
            .outputMode("append").trigger(availableNow=True).start()
        )
        q.awaitTermination(120)

    cut = len(rows) // 2
    for chunk in (rows[:cut], rows[cut:]):
        spark.createDataFrame(chunk, schema).write.mode("append").parquet(src)
        drain()

    got = (
        spark.read.parquet(out)
        .groupBy("source", "doc_id", "bin_start")
        .agg(
            F.sum("n").cast("long").alias("n"),
            F.sum("delta").alias("delta"),
            F.min_by("idelta_left", F.col("ileft_pos")).alias("idelta_left"),
            F.max_by("idelta_right", F.col("iright_pos")).alias(
                "idelta_right"),
            (F.sum("delta") / F.sum("dx")).alias("rate"),
            F.sum("dx").alias("dx"),
            F.min_by("first", F.col("first_pos")).alias("first"),
            F.max_by("last", F.col("last_pos")).alias("last"),
        )
    )
    want = gauge_agg(spark.createDataFrame(rows, schema), every=60)
    cols = ["source", "doc_id", "bin_start", "n", "delta", "idelta_left",
            "idelta_right", "rate", "dx", "first", "last"]
    g_ = got.select(*cols).orderBy("bin_start").toPandas()
    w = want.select(*cols).orderBy("bin_start").toPandas()
    assert len(g_) > 0 and (g_["n"] == w["n"]).all()
    for c in ("delta", "idelta_left", "idelta_right", "rate", "dx",
              "first", "last"):
        na, nb = g_[c].isna(), w[c].isna()
        assert (na == nb).all(), c
        assert (g_[c] - w[c]).abs().max() < 1e-9, c


def test_stream_counter_partials_null_values_match_batch(spark, tmp_path):
    """Null readings must not poison keyed counter state (pre-fix:
    float(NaN) became prev_val and every later increment was NaN).
    Batch counter_agg's lag chain passes nulls through — the reading
    AFTER a dropout restarts with inc=0 — and the streamed partials
    must reproduce that exactly across a micro-batch edge that lands
    ON a null."""
    from diive_spark.operators.analyses import counter_agg
    from diive_spark.streaming.stateful import stream_counter_partials

    src = str(tmp_path / "ctrn_in")
    out = str(tmp_path / "ctrn_out")
    ckpt = str(tmp_path / "ctrn_ckpt")
    schema = "source string, doc_id string, pos long, value double"

    rows = []
    c = 0.0
    for pos in range(240):
        c += float((pos * 7) % 5)
        # dropouts mid-bin and one exactly at the micro-batch edge
        v = None if pos in (25, 26, 95, 119, 180) else c
        rows.append(("web", "d0", pos, v))

    def drain():
        stream = spark.readStream.schema(schema).parquet(src)
        q = (
            stream_counter_partials(stream)
            .writeStream.format("parquet")
            .option("path", out).option("checkpointLocation", ckpt)
            .outputMode("append").trigger(availableNow=True).start()
        )
        q.awaitTermination(120)

    for lo, hi in ((0, 120), (120, 240)):
        spark.createDataFrame(rows[lo:hi], schema).write.mode(
            "append").parquet(src)
        drain()

    composed = (
        spark.read.parquet(out)
        .groupBy("source", "doc_id", "bin_start")
        .agg(
            F.sum("n").cast("long").alias("n"),
            F.sum("counter_delta").alias("counter_delta"),
            F.sum("n_resets").cast("long").alias("n_resets"),
            F.min_by("first", F.col("first_pos")).alias("first"),
            F.max_by("last", F.col("last_pos")).alias("last"),
        )
    )
    want = counter_agg(spark.createDataFrame(rows, schema), every=60)
    cols = ["source", "doc_id", "bin_start", "n", "counter_delta",
            "n_resets", "first", "last"]
    g = composed.select(*cols).orderBy("bin_start").toPandas()
    w = want.select(*cols).orderBy("bin_start").toPandas()
    assert len(g) == 4
    assert g.reset_index(drop=True).equals(w.reset_index(drop=True))
    # NaN never leaked into a composed increment
    assert g["counter_delta"].notna().all()


def test_stream_state_partials_null_states_match_batch(spark, tmp_path):
    """Null states are dropped like batch state_agg drops them (the
    locf segment runs THROUGH the dropout to the next real reading);
    pre-fix the stream minted phantom 'None' segments via str(None)."""
    from diive_spark.operators.analyses import state_agg
    from diive_spark.streaming.stateful import stream_state_partials

    src = str(tmp_path / "stn_in")
    out = str(tmp_path / "stn_out")
    ckpt = str(tmp_path / "stn_ckpt")
    schema = "source string, doc_id string, pos long, state string"

    states = ["ok", "warn", None, "ok", None, "down", "ok", None, "warn",
              "ok", "down", None]
    rows = [("web", "d0", i * 13, s) for i, s in enumerate(states)]

    def drain():
        stream = spark.readStream.schema(schema).parquet(src)
        q = (
            stream_state_partials(stream)
            .writeStream.format("parquet")
            .option("path", out).option("checkpointLocation", ckpt)
            .outputMode("append").trigger(availableNow=True).start()
        )
        q.awaitTermination(120)

    cut = len(rows) // 2  # edge lands right after a null reading
    for chunk in (rows[:cut], rows[cut:]):
        spark.createDataFrame(chunk, schema).write.mode("append").parquet(src)
        drain()

    got = (
        spark.read.parquet(out)
        .groupBy("source", "doc_id", "bin_start", "state")
        .agg(F.sum("n_segments").cast("long").alias("n_segments"),
             F.sum("duration").alias("duration"))
    )
    assert got.where(F.col("state").isin("None", "nan")).count() == 0
    want = state_agg(spark.createDataFrame(rows, schema), every=60)
    cols = ["source", "doc_id", "bin_start", "state", "n_segments",
            "duration"]
    g = got.select(*cols).orderBy("bin_start", "state").toPandas()
    w = want.select(*cols).orderBy("bin_start", "state").toPandas()
    assert len(g) > 0 and g.reset_index(drop=True).equals(
        w.reset_index(drop=True))


def test_stateful_partials_state_bounded_at_100k_keys(spark, tmp_path):
    """Scale stress (VERDICT r4 item 5): every stateful-partials family
    keeps O(1) keyed state — measured through the state-store metrics
    at 100k distinct series.  Asserts (a) one state row per key, never
    per point, (b) bytes/key bounded (<512 B: a few scalars + the key +
    UnsafeRow/store overhead), (c) a SECOND batch over the SAME keys
    does not grow the store (state size is key-cardinality-bound, not
    stream-length-bound)."""
    import json

    from diive_spark.streaming.stateful import (
        stream_counter_partials, stream_gauge_partials,
        stream_heartbeat_partials, stream_state_partials,
        stream_twa_partials)

    n_keys = 100_000
    base = (
        spark.range(n_keys)
        .select(
            F.concat(F.lit("s"), (F.col("id") % 16).cast("string"))
            .alias("source"),
            F.concat(F.lit("d"), F.col("id").cast("string"))
            .alias("doc_id"),
            (F.col("id") % 97).cast("double").alias("value"),
            F.when(F.col("id") % 3 == 0, "ok").otherwise("down")
            .alias("state"),
        )
    )

    families = {
        "counter": (stream_counter_partials,
                    ["source", "doc_id", "pos", "value"]),
        "state": (stream_state_partials,
                  ["source", "doc_id", "pos", "state"]),
        "heartbeat": (lambda s: stream_heartbeat_partials(
            s, alive_window=10), ["source", "doc_id", "pos"]),
        "twa": (stream_twa_partials, ["source", "doc_id", "pos", "value"]),
        "gauge": (stream_gauge_partials,
                  ["source", "doc_id", "pos", "value"]),
    }

    measured: dict[str, float] = {}
    for fam, (op, cols) in families.items():
        src = str(tmp_path / f"{fam}_in")
        out = str(tmp_path / f"{fam}_out")
        ckpt = str(tmp_path / f"{fam}_ckpt")
        schema = ", ".join(
            f"{c} {'string' if c in ('source', 'doc_id', 'state') else ('long' if c == 'pos' else 'double')}"
            for c in cols
        )

        def drain():
            stream = spark.readStream.schema(schema).parquet(src)
            q = (
                op(stream)
                .writeStream.format("parquet")
                .option("path", out).option("checkpointLocation", ckpt)
                .outputMode("append").trigger(availableNow=True).start()
            )
            q.awaitTermination(300)
            states = [
                so
                for p in q.recentProgress
                for so in p.get("stateOperators", [])
                if so.get("numRowsTotal")
            ]
            assert states, f"{fam}: no state-operator progress"
            return states[-1]

        for rep in (0, 1):  # second batch replays the SAME 100k keys
            batch = base.withColumn("pos", F.lit(rep).cast("long"))
            batch.select(*cols).repartition(8).write.mode(
                "append").parquet(src)
            so = drain()
            n_rows = so["numRowsTotal"]
            # current-version size, NOT memoryUsedBytes: the HDFS-backed
            # store also caches prior version maps for recovery, which
            # would read as phantom per-key growth across batches
            nbytes = so["customMetrics"]["stateOnCurrentVersionSizeBytes"]
            assert n_rows == n_keys, (
                f"{fam} rep{rep}: state rows {n_rows} != keys {n_keys} "
                f"(state must be per-KEY, not per-point)")
            per_key = nbytes / n_keys
            assert per_key < 512, (
                f"{fam} rep{rep}: {per_key:.0f} B/key exceeds bound")
            if rep == 0:
                measured[fam] = per_key
            else:
                # replaying every key may rewrite state but not GROW it
                assert nbytes <= measured[fam] * n_keys * 1.25, (
                    f"{fam}: store grew {measured[fam]:.0f} -> "
                    f"{per_key:.0f} B/key on a same-key batch")
    # one line for DESIGN_SCALE.md's measured-bytes/key row
    print("STATE_BYTES_PER_KEY " + json.dumps(
        {k: round(v, 1) for k, v in measured.items()}))


def test_stream_cm_equals_batch_sketch(spark, tmp_path):
    """Streamed Count-Min partials are the IDENTICAL long form as batch
    cm_sketch_agg: bit-equal cells on emitted bins, and batch
    compose_cm / cm_estimate run on the streamed store unchanged."""
    from diive_spark.operators.analyses import (
        cm_estimate, cm_sketch_agg, compose_cm)
    from diive_spark.streaming.rollup import (
        stream_cm_partials, write_tier_stream)

    src = str(tmp_path / "in")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    _batch(spark, 0, 60).write.mode("append").parquet(src)
    stream = spark.readStream.schema(SCHEMA).parquet(src)
    q = write_tier_stream(stream_cm_partials(stream), out, ckpt).start()
    q.awaitTermination(120)
    _batch(spark, 30, 60).write.mode("append").parquet(src)
    stream = spark.readStream.schema(SCHEMA).parquet(src)
    q = write_tier_stream(stream_cm_partials(stream), out, ckpt).start()
    q.awaitTermination(120)

    got = spark.read.parquet(out)
    assert got.count() > 0
    batch = spark.read.parquet(src).select(
        "source",
        F.unix_timestamp("ts").cast("long").alias("pos"),
        "value",
    )
    want = cm_sketch_agg(batch, every=60, key_cols=["source"])
    emitted = [
        r.bin_start for r in got.select("bin_start").distinct().collect()
    ]
    want = want.where(F.col("bin_start").isin(emitted))
    cols = ["source", "bin_start", "row", "col", "cnt"]
    g = got.select(*cols).orderBy(*cols).toPandas()
    w = want.select(*cols).orderBy(*cols).toPandas()
    assert len(g) > 0 and g.reset_index(drop=True).equals(
        w.reset_index(drop=True))
    # batch compose + probe run on the streamed store UNCHANGED
    comp = compose_cm(got, every=3600, key_cols=["source"])
    assert int(comp.agg(F.sum("cnt")).first()[0]) == int(
        got.agg(F.sum("cnt")).first()[0])
    # true counts from EMITTED 1m bins only — a 1h parent composed from
    # the streamed store excludes still-open 1m windows by design
    probes = (
        batch.withColumn(
            "_b1", (F.floor(F.col("pos") / 60) * 60).cast("long")
        )
        .where(F.col("_b1").isin(emitted))
        .withColumn(
            "bin_start",
            (F.floor(F.col("pos") / 3600) * 3600).cast("long"),
        )
        .withColumn("value", F.col("value").cast("long"))
        .groupBy("source", "bin_start", "value")
        .agg(F.count(F.lit(1)).cast("long").alias("true_cnt"))
    )
    est = cm_estimate(comp, probes, key_cols=["source"])
    bad = est.where(F.col("cm_est") < F.col("true_cnt"))
    # one-sided error holds on every probed item
    assert est.count() > 0 and bad.count() == 0


def test_stream_kalman_bit_parity_with_batch_fold(spark, tmp_path):
    """Streaming Kalman local-level filter: two micro-batches with a
    query restart and a replayed tail must (a) emit one row per unique
    reading, (b) end in a state BIT-IDENTICAL to the batch
    kalman_local_level fold over the concatenated series, and (c) flag
    a planted level jump through the adaptive innovation gate."""
    import numpy as np
    import pandas as pd

    from diive_spark.operators.forecast import kalman_local_level
    from diive_spark.streaming.anomaly import stream_kalman_filter

    src = str(tmp_path / "ka_in")
    out = str(tmp_path / "ka_out")
    ckpt = str(tmp_path / "ka_ckpt")
    schema = "source string, doc_id string, pos long, value double"
    q_var, r_var = 0.2, 4.0

    def drain():
        stream = spark.readStream.schema(schema).parquet(src)
        q = (
            stream_kalman_filter(stream, q=q_var, r=r_var, n_sigma=3.0)
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    rng = np.random.default_rng(41)
    v = rng.normal(20.0, 1.0, 80)
    v[60:] += 25.0                                     # level jump
    rows1 = [("web", "d0", int(p), float(v[p])) for p in range(40)]
    rows2 = [("web", "d0", int(p), float(v[p])) for p in range(40, 80)]
    rows2 += rows1[-4:]                                # replayed delivery

    spark.createDataFrame(rows1, schema).write.mode("append").parquet(src)
    drain()
    spark.createDataFrame(rows2, schema).write.mode("append").parquet(src)
    drain()                                            # fresh query, same ckpt

    got = (
        spark.read.parquet(out).toPandas()
        .sort_values("pos").reset_index(drop=True)
    )
    assert len(got) == 80                              # replays suppressed
    batch_pdf = pd.DataFrame(
        {"source": "web", "doc_id": "d0", "pos": np.arange(80), "value": v}
    )
    b = kalman_local_level(
        spark.createDataFrame(batch_pdf), q=q_var, r=r_var
    ).toPandas().iloc[0]
    last = got.iloc[-1]
    assert last["level"] == b["level"]                 # bit parity
    assert last["p_var"] == b["p_var"]
    assert got.loc[60, "flag_innov"] == 2              # jump caught
    assert (got.loc[5:59, "flag_innov"] == 0).all()    # quiet in-control run


def test_stream_page_hinkley_matches_batch_across_restarts(spark, tmp_path):
    """Page-Hinkley alarms streamed over three drains (with restarts
    and a replayed slice) equal the batch operator bit-for-bit:
    same alarm count, same first alarm, and the streamed peak
    statistics replay the batch fold's exact arithmetic."""
    import numpy as np

    from diive_spark.operators.outliers import page_hinkley
    from diive_spark.streaming.stateful import stream_ph_partials

    rng = np.random.RandomState(13)
    vals = rng.randn(240).cumsum()  # drifting walk -> several alarms
    rows = [("s", "0", i, float(vals[i])) for i in range(240)]
    # gappy sibling series: nulls interleaved
    rows += [
        ("s", "1", i, None if i % 3 == 0 else float(vals[i] * 0.5))
        for i in range(240)
    ]
    schema = "source string, doc_id string, pos long, value double"
    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    def drain():
        stream = spark.readStream.schema(schema).parquet(src)
        q = (
            stream_ph_partials(stream, delta=0.05, lam=8.0)
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    df = spark.createDataFrame(rows, schema)
    df.where("pos < 80").write.mode("append").parquet(src)
    drain()
    # second batch REPLAYS a slice (60-79) plus new arrivals
    df.where("pos >= 60 and pos < 170").write.mode("append").parquet(src)
    drain()
    df.where("pos >= 170").write.mode("append").parquet(src)
    drain()

    got = (
        spark.read.parquet(out)
        .orderBy("doc_id", "alarm_pos")
        .toPandas()
    )
    batch = {
        r["doc_id"]: r
        for r in page_hinkley(
            df, delta=0.05, lam=8.0, key_cols=["source", "doc_id"]
        ).collect()
    }
    assert batch["0"]["n_alarms"] >= 2  # the battery must be non-trivial
    for doc in ("0", "1"):
        sub = got[got["doc_id"] == doc]
        assert len(sub) == batch[doc]["n_alarms"]
        if len(sub):
            assert int(sub["alarm_pos"].iloc[0]) == batch[doc]["first_alarm"]
            assert sub["alarm_no"].tolist() == list(range(1, len(sub) + 1))
    # python twin replay of the exact fold -> bit-identical peaks
    def twin(doc):
        cnt = s = m = mm = 0.0
        peaks = []
        for _, d, i, v in [r for r in rows if r[1] == doc]:
            if v is None:
                continue
            cnt += 1.0
            s += v
            m = m + v - s / cnt - 0.05
            mm = min(mm, m)
            if m - mm > 8.0:
                peaks.append((i, m - mm))
                cnt = s = m = mm = 0.0
        return peaks

    for doc in ("0", "1"):
        exp = twin(doc)
        sub = got[got["doc_id"] == doc]
        assert sub["alarm_pos"].tolist() == [p for p, _ in exp]
        assert sub["ph_peak"].tolist() == [v for _, v in exp]


def test_stream_funnel_matches_batch_completions(spark, tmp_path):
    """Ordered-arrival streaming funnel over three drains (with
    restarts and a replayed slice) emits exactly the batch operator's
    completed actors, with identical anchors and durations."""
    import pyspark.sql.functions as F

    from diive_spark.operators.eventflow import funnel_conversion
    from diive_spark.streaming.stateful import stream_funnel_partials

    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    steps = ["view", "click", "purchase"]
    win = 86400.0
    feed = ev.select(
        "user_id",
        (F.unix_micros(F.col("ts").cast("timestamp")) / F.lit(1e6)).alias(
            "ts_epoch"
        ),
        "event_type",
    ).cache()
    lo, hi = feed.agg(F.min("ts_epoch"), F.max("ts_epoch")).collect()[0]
    c1, c2 = lo + (hi - lo) / 3, lo + 2 * (hi - lo) / 3
    schema = "user_id long, ts_epoch double, event_type string"
    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    def drain():
        stream = spark.readStream.schema(schema).parquet(src)
        q = (
            stream_funnel_partials(stream, steps, window_seconds=win)
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    feed.where(F.col("ts_epoch") < c1).write.mode("append").parquet(src)
    drain()
    # replayed overlap + the middle slice
    feed.where(
        (F.col("ts_epoch") >= c1 - 3600) & (F.col("ts_epoch") < c2)
    ).write.mode("append").parquet(src)
    drain()
    feed.where(F.col("ts_epoch") >= c2).write.mode("append").parquet(src)
    drain()

    got = spark.read.parquet(out).toPandas().set_index("user_id")
    batch = (
        funnel_conversion(ev, steps, window_seconds=win)
        .where(F.col("level") == 3)
        .toPandas()
        .set_index("user_id")
    )
    assert len(batch) >= 3  # corpus must exercise completions
    assert set(got.index) == set(batch.index)
    for uid in batch.index:
        assert got.loc[uid, "t_anchor"] == batch.loc[uid, "t_anchor"]
        assert got.loc[uid, "dur_s"] == batch.loc[uid, "dur_s"]
    # exactly one completion event per actor despite the replay
    assert got.index.is_unique


def test_stream_token_bucket_matches_batch_replay(spark, tmp_path):
    """Streamed throttle events over three drains (restarts + replayed
    slice) equal the batch token-bucket audit bit-for-bit."""
    import pyspark.sql.functions as F

    from diive_spark.operators.eventflow import token_bucket_throttle
    from diive_spark.streaming.stateful import stream_bucket_partials

    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    cap, rate = 3.0, 0.00001
    feed = ev.select(
        "user_id",
        (F.unix_micros(F.col("ts").cast("timestamp")) / F.lit(1e6)).alias(
            "ts_epoch"
        ),
    ).cache()
    lo, hi = feed.agg(F.min("ts_epoch"), F.max("ts_epoch")).collect()[0]
    c1, c2 = lo + (hi - lo) / 3, lo + 2 * (hi - lo) / 3
    schema = "user_id long, ts_epoch double"
    src, out, ckpt = (str(tmp_path / p) for p in ("src", "out", "ckpt"))

    def drain():
        stream = spark.readStream.schema(schema).parquet(src)
        q = (
            stream_bucket_partials(stream, capacity=cap, refill_per_s=rate)
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    feed.where(F.col("ts_epoch") < c1).write.mode("append").parquet(src)
    drain()
    feed.where(
        (F.col("ts_epoch") >= c1 - 7200) & (F.col("ts_epoch") < c2)
    ).write.mode("append").parquet(src)
    drain()
    feed.where(F.col("ts_epoch") >= c2).write.mode("append").parquet(src)
    drain()

    got = spark.read.parquet(out).toPandas()
    batch = token_bucket_throttle(
        ev, capacity=cap, refill_per_s=rate
    ).toPandas().set_index("user_id")
    assert batch["n_throttled"].sum() > 0
    counts = got.groupby("user_id").size()
    for uid, row in batch.iterrows():
        assert counts.get(uid, 0) == row["n_throttled"], uid
        if row["n_throttled"]:
            sub = got[got["user_id"] == uid].sort_values("throttled_ts")
            assert sub["throttled_ts"].iloc[0] == row["first_throttled_t"]
            assert sub["throttle_no"].tolist() == list(
                range(1, len(sub) + 1)
            )


def test_stream_stream_attribution_matches_batch_range_join(spark, tmp_path):
    """Watermarked stream-stream interval join (clicks -> purchases
    within 1 h) over incremental drains equals the batch range join
    exactly."""
    import pyspark.sql.functions as F

    from diive_spark.streaming.joins import stream_attribution

    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    clicks = ev.where("event_type = 'click'").select("user_id", "ts")
    buys = ev.where("event_type = 'purchase'").select("user_id", "ts")
    win = 86400.0

    src_c = str(tmp_path / "clicks")
    src_p = str(tmp_path / "buys")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    schema = "user_id long, ts timestamp"

    def drain():
        st = spark.readStream.schema(schema).parquet(src_c)
        sp = spark.readStream.schema(schema).parquet(src_p)
        q = (
            stream_attribution(st, sp, window_seconds=win)
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)

    # two incremental loads (time-split) with a drain between
    cut = "2024-01-16"
    clicks.where(F.col("ts") < cut).write.mode("append").parquet(src_c)
    buys.where(F.col("ts") < cut).write.mode("append").parquet(src_p)
    drain()
    clicks.where(F.col("ts") >= cut).write.mode("append").parquet(src_c)
    buys.where(F.col("ts") >= cut).write.mode("append").parquet(src_p)
    drain()

    got = (
        spark.read.parquet(out)
        .orderBy("user_id", "t_trig", "t_conv")
        .toPandas()
    )
    batch = (
        clicks.alias("c")
        .join(
            buys.alias("b"),
            (F.col("c.user_id") == F.col("b.user_id"))
            & (F.col("b.ts") >= F.col("c.ts"))
            & (F.col("b.ts") <= F.col("c.ts") + F.expr("INTERVAL 86400 SECONDS")),
        )
        .select(
            F.col("c.user_id").alias("user_id"),
            F.col("c.ts").alias("t_trig"),
            F.col("b.ts").alias("t_conv"),
        )
        .orderBy("user_id", "t_trig", "t_conv")
        .toPandas()
    )
    assert len(batch) >= 20  # the corpus must exercise the join
    assert len(got) == len(batch)
    for col in ("user_id", "t_trig", "t_conv"):
        assert got[col].tolist() == batch[col].tolist(), col
    # lag is the exact micros difference
    lags = (
        got["t_conv"].astype("int64") // 1000 - got["t_trig"].astype("int64") // 1000
    ).astype(float) / 1e6
    import numpy as np

    np.testing.assert_allclose(got["lag_s"], lags, rtol=0, atol=0)


def test_stream_dgim_matches_batch_across_restarts(spark, tmp_path):
    """DGIM sliding-window counts streamed over three drains (with a
    restart and a replayed slice) must equal the shared integer fold
    exactly: same estimates, bounds, and bucket counts at every
    checkpoint position, with the estimate within its own
    deterministic bound of the true windowed count."""
    import numpy as np

    from diive_spark.functions.dgim import (
        dgim_add, dgim_estimate, max_buckets)
    from diive_spark.streaming.stateful import stream_dgim_partials

    rng = np.random.RandomState(99)
    n = 300
    window, ce, thr = 64, 20, 0.0
    vals = rng.randn(n) * 10
    rows = [("s", "0", i, float(vals[i])) for i in range(n)]
    rows += [  # gappy sibling: nulls read as bit 0
        ("s", "1", i, None if i % 4 == 0 else float(vals[i]))
        for i in range(n)
    ]
    schema = "source string, doc_id string, pos long, value double"
    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    def drain():
        stream = spark.readStream.schema(schema).parquet(src)
        q = (
            stream_dgim_partials(
                stream, window=window, check_every=ce, threshold=thr
            )
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    df = spark.createDataFrame(rows, schema)
    df.where("pos < 100").write.mode("append").parquet(src)
    drain()
    df.where("pos >= 80 and pos < 210").write.mode("append").parquet(src)
    drain()  # fresh query object, same checkpoint: replay idempotent
    df.where("pos >= 210").write.mode("append").parquet(src)
    drain()

    got = spark.read.parquet(out).toPandas()

    for doc in ("0", "1"):
        sub = (
            got[got["doc_id"] == doc]
            .sort_values("pos")
            .reset_index(drop=True)
        )
        # python twin of the shared fold
        bpos, bsiz = [], []
        ones = []
        expect = []
        for _, d, i, v in [r for r in rows if r[1] == doc]:
            bit = 1 if (v is not None and v >= thr) else 0
            if bit:
                ones.append(i)
            dgim_add(i, bit, bpos, bsiz, window)
            assert len(bpos) <= max_buckets(window)
            if i % ce == 0:
                est, bound = dgim_estimate(bpos, bsiz)
                exact = sum(1 for o in ones if i - window < o <= i)
                assert abs(est - exact) <= bound  # DGIM guarantee
                expect.append((i, est, bound, len(bpos)))
        assert len(sub) == len(expect), doc
        for row, (i, est, bound, nb) in zip(sub.itertuples(), expect):
            assert row.pos == i and row.est == est, (doc, i)
            assert row.bound == bound and row.n_buckets == nb, (doc, i)


def test_stream_dgim_state_bounded_at_20k_keys(spark, tmp_path):
    """DGIM keyed state is the bucket list, never the window: at 20k
    series with a 1024-position window the store must hold one row per
    key at bounded bytes/key (two ≤~2·log2(W)-long arrays + watermark
    + overhead), and a second batch over the SAME keys must not grow
    it — window width must never appear in the state size."""
    import json

    from diive_spark.streaming.stateful import stream_dgim_partials

    n_keys = 20_000
    window = 1024
    base = spark.range(n_keys).select(
        F.concat(F.lit("s"), (F.col("id") % 16).cast("string"))
        .alias("source"),
        F.concat(F.lit("d"), F.col("id").cast("string")).alias("doc_id"),
        (F.col("id") % 97).cast("double").alias("value"),
    )
    src = str(tmp_path / "dgim_in")
    out = str(tmp_path / "dgim_out")
    ckpt = str(tmp_path / "dgim_ckpt")
    schema = "source string, doc_id string, value double, pos long"

    def drain():
        stream = spark.readStream.schema(schema).parquet(src)
        q = (
            stream_dgim_partials(
                stream, window=window, check_every=1, threshold=40.0
            )
            .writeStream.format("parquet")
            .option("path", out).option("checkpointLocation", ckpt)
            .outputMode("append").trigger(availableNow=True).start()
        )
        q.awaitTermination(300)
        states = [
            so
            for p in q.recentProgress
            for so in p.get("stateOperators", [])
            if so.get("numRowsTotal")
        ]
        assert states
        return states[-1]

    sizes = []
    for rep in (0, 1):
        batch = base.withColumn("pos", F.lit(rep).cast("long"))
        batch.select("source", "doc_id", "value", "pos").repartition(
            8
        ).write.mode("append").parquet(src)
        so = drain()
        assert so["numRowsTotal"] == n_keys
        nbytes = so["customMetrics"]["stateOnCurrentVersionSizeBytes"]
        per_key = nbytes / n_keys
        assert per_key < 1024, f"rep{rep}: {per_key:.0f} B/key"
        sizes.append(nbytes)
    assert sizes[1] <= sizes[0] * 1.25, "same-key batch grew the store"
    print(
        "DGIM_STATE_BYTES_PER_KEY "
        + json.dumps({"per_key": round(sizes[0] / n_keys, 1)})
    )
