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


def _physical_plan(df):
    return df._jdf.queryExecution().executedPlan().toString()


def _has_ntile(plan):
    import re
    return re.search(r"(?<![a-zA-Z_])ntile\(", plan) is not None


def test_quantile_binning_no_single_partition_window(spark):
    """VERDICT r1 item 3: the binned analyses must not funnel the whole
    input through one task.  Gates: no `ntile` window function and no
    SinglePartition exchange anywhere in sorting_bins / quantile_xy
    plans (their offset accounting is keyed, their output is a grouped
    agg, so nothing global-sorts)."""
    from diive_spark.queries import q_sorting_bins, q_quantile_xy

    for qfn in (q_sorting_bins, q_quantile_xy):
        plan = _physical_plan(qfn(spark, SF))
        assert not _has_ntile(plan), qfn.__name__
        assert "SinglePartition" not in plan, qfn.__name__


def test_optimum_range_no_row_level_global_sort(spark):
    """find_optimum_range: the only global window allowed is over the
    n_bins-row bin table (constant-size); the row-level input must not
    pass through `ntile` or a SinglePartition window.  The plan's
    SinglePartition exchanges must all sit above the per-bin Aggregate."""
    from diive_spark.queries import q_optimum_range

    plan = _physical_plan(q_optimum_range(spark, SF))
    assert not _has_ntile(plan)
    # row-level subtree = everything below the first per-bin aggregate;
    # cheap structural proxy: the scan-side must hash-partition on the
    # bucket key, so SinglePartition may appear at most once (bin table)
    assert plan.count("SinglePartition") <= 1


def test_histogram_default_range_no_single_partition_window(spark):
    """Histogram default min/max must come from an aggregate + join,
    not a whole-input SinglePartition window (VERDICT r1 item 3)."""
    from diive_spark.operators.analyses import histogram

    ev = spark.read.parquet(f"{SF}/events.parquet")
    plan = _physical_plan(histogram(ev, n_bins=20, value_col="value"))
    assert "Window" not in plan


def test_asof_join_plan_is_window_not_join(spark):
    """asof_join lowers to union + ordered window — the plan must
    contain no join node at all (and so no cartesian/broadcast-NL)."""
    from diive_spark.queries import q_asof_join

    plan = _physical_plan(q_asof_join(spark, SF))
    for bad in ("SortMergeJoin", "BroadcastHashJoin", "CartesianProduct",
                "BroadcastNestedLoopJoin"):
        assert bad not in plan, bad
    assert "Window" in plan


def test_randunc_m2_uses_broadcast_banded_join(spark):
    """RANDUNC m2's day-band probe must broadcast the (tiny) missing
    side; no cartesian product anywhere in the cascade."""
    from diive_spark.queries import q_banded_unc_m2m3

    plan = _physical_plan(q_banded_unc_m2m3(spark, SF))
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_repetition_and_pii_are_shuffle_free(spark):
    """Per-row corpus filters must compile to pure projections: zero
    Exchange in the plan (the top-bigram count is a sort+fold inside
    the row, not a groupBy)."""
    from diive_spark.operators.scrub import redact_pii
    from diive_spark.operators.textstats import repetition_features

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    for df in (repetition_features(docs), redact_pii(docs)):
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan


def test_sessionize_single_exchange_no_join(spark):
    """Row-level sessionization = one hash partitioning on the key and
    two stacked windows — no join node, no second shuffle."""
    from diive_spark.operators.sessions import sessionize

    ev = spark.read.parquet(f"{SF}/events.parquet").select("user_id", "ts")
    out = sessionize(ev)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 1
    assert "Join" not in plan


def test_stratified_sample_is_scan_plus_filter(spark):
    """Deterministic sampling must stay a pushable filter over the
    scan: no Exchange, no aggregate."""
    from diive_spark.operators.scrub import stratified_hash_sample

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    out = stratified_hash_sample(
        docs, {"en": 0.5, "de": 0.1}, strata_col="lang", key_col="doc_id"
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan and "Aggregate" not in plan


def test_bucketed_join_has_no_exchange(spark, tmp_path):
    """Two tables bucketed on the same key with the same bucket count
    must join with ZERO Exchange (co-located SortMergeJoin) — the
    pay-at-write amortize-at-read layout for repeated fact joins.  A
    plain parquet-to-parquet join of the same data shuffles both
    sides (sanity check that the gate is meaningful)."""
    from diive_spark.sources.bucketed import (
        colocated_join, ensure_database, write_bucketed,
    )

    ev = spark.read.parquet(f"{SF}/events.parquet")
    facts = ev.select("user_id", "event_id", "value")
    dims = ev.groupBy("user_id").agg(F.avg("value").alias("user_avg"))
    ensure_database(spark, "bktdb", str(tmp_path / "wh"))
    # at the fact-to-fact scale this layout targets, neither side fits
    # a broadcast — model that by disabling the auto-broadcast path
    thr = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        write_bucketed(facts, "bktdb.facts", ["user_id"], 8, ["user_id"])
        write_bucketed(dims, "bktdb.dims", ["user_id"], 8, ["user_id"])
        j = colocated_join(spark, "bktdb.facts", "bktdb.dims", ["user_id"])
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan
        assert j.count() == facts.count()

        plain = facts.join(
            dims.withColumnRenamed("user_avg", "x"), on="user_id"
        )
        plain_plan = plain._jdf.queryExecution().executedPlan().toString()
        # without bucketing the same join shuffles both sides
        assert "Exchange" in plain_plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thr)
        spark.sql("DROP DATABASE IF EXISTS bktdb CASCADE")


def test_partitioned_write_prunes_at_scan(spark, tmp_path):
    """Events written partitioned by calendar day: a day-filtered read
    must prune at the PartitionFilters level (directory skip), not as
    a post-scan row filter — the layout rule that turns a 100 TB
    time-range query into a per-day read."""
    out = str(tmp_path / "ev_by_day")
    ev = spark.read.parquet(f"{SF}/events.parquet").withColumn(
        "day", F.to_date("ts")
    )
    ev.write.mode("overwrite").partitionBy("day").parquet(out)
    q = spark.read.parquet(out).where(F.col("day") == "2024-01-01").select(
        "event_id", "value"
    )
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
    seg = plan.split("PartitionFilters:")[1].split("]")[0]
    assert "day" in seg                      # the filter reached pruning
    assert q.count() > 0


def test_corpus_job_plan_gate(spark):
    """The production corpus composition (operators/corpus.py, driven
    by scripts/run_corpus_job.py) must keep its scale shapes: equi-join
    dedup only (never cartesian/BNLJ — a silent fuse here is a 100 TB
    disaster), and a bounded Exchange count (measured 3; localCheckpoint
    severs the multi-hop CC lineage so the final plan stays compact)."""
    from diive_spark.operators.corpus import corpus_pipeline

    docs = spark.read.parquet(f"{SF}/../sf0.001/documents.parquet")
    final = corpus_pipeline(docs, est_threshold=0.6)
    plan = final._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoop" not in plan
    assert plan.count("Exchange") <= 6, plan.count("Exchange")
    # quality-gate barrier (plans/barrier.py): the gate must stay a
    # Filter over a projected boolean — if pushdown ever re-inlines the
    # feature battery, Filter nodes grow split()/regexp chains and the
    # pipeline pays the battery per doc again (measured 7.4x at sf0.1)
    heavy_filters = [
        l for l in plan.splitlines() if "Filter" in l and "split(" in l
    ]
    assert not heavy_filters, heavy_filters
    # output contract: frozen split column present and populated
    splits = {r["split"] for r in final.select("split").distinct().collect()}
    assert splits <= {"train", "val", "test"} and "train" in splits


def test_decontaminate_broadcasts_benchmark(spark):
    """Decontamination must broadcast the benchmark n-gram hash set and
    never shuffle the corpus text: the only hashpartitioning Exchanges
    allowed are the benchmark DISTINCT and the per-doc hit count — a
    SortMergeJoin here would shuffle every corpus n-gram at 100 TB."""
    from diive_spark.operators.scrub import contamination_hits

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    bench = docs.where(F.col("source") == "src0")
    corpus = docs.where(F.col("source") != "src0")
    out = contamination_hits(corpus, bench, n=4)
    plan = _physical_plan(out)
    assert "BroadcastHashJoin" in plan
    for bad in ("SortMergeJoin", "CartesianProduct", "BroadcastNestedLoop"):
        assert bad not in plan, bad
    assert plan.count("Exchange hashpartitioning") <= 2, plan


def test_corpus_job_with_decontamination_plan_gate(spark):
    """The decontaminated composition must keep the same no-cartesian
    guarantee; the extra stage adds the benchmark DISTINCT, the hit
    count, and the verdict join-back (AQE-broadcast) Exchanges only."""
    from diive_spark.operators.corpus import corpus_pipeline

    docs = spark.read.parquet(f"{SF}/../sf0.001/documents.parquet")
    bench = docs.where(F.col("doc_id") % 17 == 0).select("doc_id", "text")
    final = corpus_pipeline(docs, est_threshold=0.6, benchmark=bench,
                            decontam_ngram=4)
    plan = final._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoop" not in plan
    assert plan.count("Exchange") <= 10, plan.count("Exchange")
    assert final.count() > 0


def test_token_span_shuffle_carries_hashes_not_arrays(spark):
    """duplicate_token_spans (hash mode): the groupBy's Exchange input
    must be the narrow (id, pos, span_hash) projection — the token
    arrays are hashed row-locally and never reach a shuffle — and the
    aggregation must have a map-side partial."""
    from diive_spark.operators.dedup import duplicate_token_spans

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    toks = docs.withColumn(
        "tokens",
        F.expr("transform(split(text, ' '), w -> CAST(length(w) AS INT))"),
    ).select("doc_id", "tokens")
    out = duplicate_token_spans(toks, k=8)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert has_partial_aggregation(out)
    # count(DISTINCT doc_id) plans as a two-phase aggregate: exactly
    # two Exchanges — (span_hash, doc_id) then span_hash — and neither
    # may partition on (i.e. carry) the token arrays
    ex_lines = [ln for ln in plan.splitlines() if "Exchange" in ln]
    assert len(ex_lines) == 2, plan
    for ln in ex_lines:
        assert "tokens" not in ln, f"token arrays in shuffle: {ln}"
    # the hashes are computed BEFORE the explode: the Generate node's
    # output is already the narrow (pos, span_hash) pair
    gen = [ln for ln in plan.splitlines() if "Generate" in ln]
    assert gen and all("span_hash" in ln for ln in gen), gen


def test_semantic_dedup_bucket_join_not_cartesian(spark):
    """semantic_dedup's candidate generation must be an equi-join on
    the bucket id — never a cartesian/broadcast-nested-loop product."""
    from diive_spark.operators.similarity import semantic_dedup

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    out = semantic_dedup(emb, threshold=0.42, bucket_bits=4, mode="sign")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_ingest_increment_aggregates_only_the_batch(spark, tmp_path):
    """The incremental merge must never re-aggregate history: stored
    tier rows enter the plan as plain parquet scans (no bucket_rollup
    over decoded raw history), so the raw tier's payload column is
    read only for the replaced-docs fingerprint subtraction, and the
    merged tier write scans the increment — not the stored raw tier."""
    from diive_spark.datagen import series_view, tokens_table
    from diive_spark.operators.tiers import TierStore

    b1 = tokens_table(spark, n_docs=40, seed=42)
    b2 = tokens_table(spark, n_docs=60, seed=42).where(
        "doc_id >= 'doc00000040'"
    )
    store = TierStore(spark, str(tmp_path / "t"))
    store.write_raw(b1)
    store.materialize_cascade(series_view(b1))

    import diive_spark.operators.tiers as tiers_mod

    seen_plans = []
    orig = tiers_mod.TierStore._write_partitions

    def spy(self, df, tier):
        seen_plans.append((tier, df._jdf.queryExecution().executedPlan().toString()))
        return orig(self, df, tier)

    tiers_mod.TierStore._write_partitions = spy
    try:
        store.ingest_increment(b2)
    finally:
        tiers_mod.TierStore._write_partitions = orig
    assert seen_plans
    for tier, plan in seen_plans:
        # gorilla decode of stored history must never feed a tier write
        assert "gorilla_decode" not in plan, tier


def test_hist_sketch_is_shuffle_neutral(spark, tiny_series):
    """The per-bin histogram count array rides the SAME groupBy as the
    moment partials: adding hist_bounds must not add an Exchange, and
    the composition stage must stay a plain two-Exchange agg (no
    explode/re-shuffle of the sketch arrays)."""
    from diive_spark.operators.resample import bucket_rollup, compose_rollup

    kw = dict(every=60, key_cols=["source"], mincounts_perc=0.0,
              min_floor_rule=False)
    base = _physical_plan(bucket_rollup(tiny_series, **kw))
    hist = bucket_rollup(tiny_series, hist_bounds=(0.0, 110.0),
                         hist_bins=55, **kw)
    withh = _physical_plan(hist)
    assert withh.count("Exchange") == base.count("Exchange")
    comp = _physical_plan(
        compose_rollup(hist, every=3600, key_cols=["source"],
                       mincounts_perc=0.0, min_floor_rule=False,
                       hist_bins=55)
    )
    assert comp.count("Exchange") <= 2
    assert "explode(hist" not in comp    # no explode of sketch arrays


def test_counter_agg_and_ltob_single_exchange(spark, tiny_series):
    """counter_agg and ltob_downsample each need exactly one shuffle
    (the per-series window; the bin agg / bucket argmax reuses that
    partitioning) and never collapse to SinglePartition."""
    import pyspark.sql.functions as F

    from diive_spark.operators.analyses import counter_agg, ltob_downsample

    ca = counter_agg(tiny_series.withColumn("ctr", F.col("pos")),
                     every=3600, value_col="ctr")
    p = _physical_plan(ca)
    assert p.count("Exchange") == 1 and "SinglePartition" not in p
    lt = ltob_downsample(tiny_series, every=500)
    p = _physical_plan(lt)
    assert p.count("Exchange") == 1 and "SinglePartition" not in p


def test_candle_and_gauge_agg_plan_shape(spark, tiny_series):
    """candle_agg is one partial-aggregated groupBy (single Exchange);
    compose_candles adds at most one more (tier table is tiny); gauge
    reuses its window partitioning for the bin agg — all without a
    SinglePartition collapse."""
    from diive_spark.operators.analyses import (
        candle_agg,
        compose_candles,
        gauge_agg,
    )

    ca = candle_agg(tiny_series, every=3600)
    p = _physical_plan(ca)
    assert p.count("Exchange") == 1 and "SinglePartition" not in p
    comp = compose_candles(ca, every=7200)
    p = _physical_plan(comp)
    assert p.count("Exchange") <= 2 and "SinglePartition" not in p
    ga = gauge_agg(tiny_series, every=3600)
    p = _physical_plan(ga)
    assert p.count("Exchange") == 1 and "SinglePartition" not in p


def test_toolkit_aggs_plan_shape(spark, tiny_series):
    """stats2d/gauge/acf/arrival reuse their window partitioning for
    the bin agg (single Exchange); topk pays one more for the per-bin
    rank over the already-tiny count table; none collapse to
    SinglePartition."""
    from diive_spark.operators.analyses import (
        acf_agg,
        arrival_stats,
        stats2d_agg,
        topk_agg,
    )

    for op, bound in ((stats2d_agg, 1), (acf_agg, 1), (arrival_stats, 1),
                      (topk_agg, 2)):
        p = _physical_plan(op(tiny_series, 3600))
        assert p.count("Exchange") <= bound, op.__name__
        assert "SinglePartition" not in p, op.__name__


def test_r4_series_ops_exchange_bounds(spark, tiny_series):
    """Round-4 series operators stay narrow: one series-key exchange
    for the window pass (+ one bin exchange where there's a groupBy);
    savgol adds NO exchange beyond the window sort; none of them emit
    a SinglePartition global sort."""
    from diive_spark.operators.analyses import (
        cusum_changepoint,
        interpolated_tw_avg,
        m4_downsample,
        savgol_smooth,
    )

    def n_exchanges(df):
        return _physical_plan(df).count("Exchange")

    # m4: pure groupBy aggregate — exactly one shuffle
    assert n_exchanges(m4_downsample(tiny_series, every=60)) == 1
    # savgol: one window sort exchange, nothing else
    assert n_exchanges(savgol_smooth(tiny_series, window=7)) == 1
    # cusum: window pass + final per-key groupBy
    p = _physical_plan(cusum_changepoint(tiny_series, quantized=1e6))
    assert p.count("Exchange") <= 2 and "SinglePartition" not in p
    # interpolated twa: window pass + bin groupBy; explode is row-local
    p = _physical_plan(
        interpolated_tw_avg(tiny_series, every=60, quantized=1e6)
    )
    assert p.count("Exchange") <= 2 and "SinglePartition" not in p


def test_ddsketch_plan_shape(spark, tiny_series):
    """ddsketch_agg is one partial-aggregated groupBy over bounded
    bucket rows (single Exchange, raw readings never shuffle);
    compose/collapse re-group the tiny bucket table (<= 2 Exchanges);
    the quantile pick runs per (key, bin) windows — never a
    SinglePartition collapse."""
    from diive_spark.operators.analyses import (
        collapse_ddsketch, compose_ddsketch, ddsketch_agg,
        ddsketch_quantiles)

    sk = ddsketch_agg(tiny_series, every=3600)
    p = _physical_plan(sk)
    assert p.count("Exchange") == 1 and "SinglePartition" not in p
    assert has_partial_aggregation(sk)
    comp = compose_ddsketch(sk, 86400)
    p = _physical_plan(comp)
    assert p.count("Exchange") <= 2 and "SinglePartition" not in p
    small = collapse_ddsketch(sk, 3)
    p = _physical_plan(small)
    assert p.count("Exchange") <= 2 and "SinglePartition" not in p
    q = ddsketch_quantiles(comp, [0.5, 0.95])
    assert "SinglePartition" not in _physical_plan(q)


def test_compose_family_plan_shape(spark, tiny_series):
    """Every compose_* rollup is one groupBy over the (tiny) child bin
    table: <= 2 Exchanges (child agg partitioning + the re-group),
    no SinglePartition."""
    import pyspark.sql.functions as F

    from diive_spark.operators.analyses import (
        compose_counter, compose_gauge, compose_heartbeat, compose_state,
        compose_twa, counter_agg, gauge_agg, heartbeat_agg, state_agg,
        time_weighted_avg)

    child_parent = [
        (compose_counter,
         counter_agg(tiny_series.withColumn("c", F.abs(F.col("value"))),
                     every=60, value_col="c")),
        (compose_gauge, gauge_agg(tiny_series, every=60)),
        (compose_state,
         state_agg(tiny_series.withColumn(
             "state", (F.col("value") > 50).cast("string")), every=60)),
        (compose_heartbeat,
         heartbeat_agg(tiny_series.where(F.col("value").isNotNull()),
                       every=60, alive_window=8)),
        (compose_twa, time_weighted_avg(tiny_series, every=60)),
    ]
    for compose, child in child_parent:
        p = _physical_plan(compose(child, 3600))
        assert p.count("Exchange") <= 2, compose.__name__
        assert "SinglePartition" not in p, compose.__name__


def test_no_pushdown_filter_semantics_and_plan(spark):
    """plans/barrier.no_pushdown_filter: values identical to a plain
    where(), but the Filter must NOT be substituted through the Project
    that defines the gated columns — the expensive defining expression
    (here a split battery) stays out of every Filter node."""
    from diive_spark.plans.barrier import no_pushdown_filter

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    feat = docs.withColumn(
        "nw", F.size(F.split(F.lower(F.trim(F.col("text"))), r"\s+"))
    )
    cond = F.col("nw") >= 50
    plain = feat.where(cond)
    gated = no_pushdown_filter(feat, cond)

    a = {tuple(r) for r in plain.select("doc_id", "nw").collect()}
    b = {tuple(r) for r in gated.select("doc_id", "nw").collect()}
    assert a == b and len(a) > 0

    plain_plan = plain._jdf.queryExecution().executedPlan().toString()
    gated_plan = gated._jdf.queryExecution().executedPlan().toString()
    # the plain filter IS substituted (that's the pathology this guards)
    assert any(
        "Filter" in l and "split(" in l for l in plain_plan.splitlines()
    )
    # the gated filter is not: no Filter node carries the battery
    assert not any(
        "Filter" in l and "split(" in l for l in gated_plan.splitlines()
    )
    # the helper's scratch column must not leak into the output
    assert "__gate__" not in gated.columns


def test_cm_sketch_single_exchange_and_partial_agg(spark, tiny_series):
    """cm_sketch_agg is one shuffle (the cell groupBy, map-side
    combined — readings never cross the wire) and compose_cm adds
    exactly one more; neither collapses to SinglePartition."""
    from diive_spark.operators.analyses import cm_sketch_agg, compose_cm

    sk = cm_sketch_agg(tiny_series, every=600)
    p = _physical_plan(sk)
    assert p.count("Exchange") == 1 and "SinglePartition" not in p
    assert "partial_count" in p  # map-side combine before the exchange
    comp = compose_cm(sk, every=3600)
    p2 = _physical_plan(comp)
    assert p2.count("Exchange") == 2 and "SinglePartition" not in p2


def test_bloom_probe_broadcasts_bits_and_never_fans_wide_rows(spark):
    """bloom_probe's membership join against the bit set is a
    broadcast hash join, and the k-way fan-out (Generate/explode)
    happens on the DISTINCT-item relation, never on the wide input
    rows: in the physical plan the Generate must sit below the
    verdict aggregate, with the wide row join above it."""
    import pandas as pd

    from diive_spark.operators.scrub import bloom_build, bloom_probe

    items = spark.createDataFrame(
        pd.DataFrame({"item": [f"g{i}" for i in range(50)]})
    )
    wide = spark.createDataFrame(
        pd.DataFrame(
            {
                "item": [f"g{i}" for i in range(80)],
                "payload": ["x" * 10] * 80,
            }
        )
    )
    bloom = bloom_build(items, m_bits=1024, k=4)
    out = bloom_probe(wide, bloom, m_bits=1024, k=4)
    p = _physical_plan(out)
    assert "BroadcastHashJoin" in p
    # the explode feeds the per-item aggregate (HashAggregate above
    # Generate), so fan-out cost is k * distinct items, not k * rows
    gen = p.find("Generate")
    agg = p.find("HashAggregate")
    assert gen != -1 and agg != -1 and agg < gen


def test_sax_bounded_exchanges_no_single_partition(spark, tiny_series):
    """sax_symbolize = compact-index window + moments groupBy + PAA
    groupBy on the series key: a handful of key-partitioned exchanges,
    never a SinglePartition collapse."""
    from diive_spark.operators.analyses import sax_symbolize

    out = sax_symbolize(tiny_series, segments=8, alphabet=4)
    p = _physical_plan(out)
    assert "SinglePartition" not in p
    assert p.count("Exchange") <= 4


def test_dft_fold_no_explode_no_extra_exchange(spark):
    """dft_power_peak must compute the O(n·K) trig sums as a row-local
    array fold, never a (reading × frequency) explode: no Generate
    node, and only the series-key exchanges (series() window + the
    groupBy collect) appear."""
    from diive_spark.queries import q_dft_power_peak

    plan = _physical_plan(q_dft_power_peak(spark, SF))
    assert "Generate" not in plan          # no explode anywhere
    assert "Join" not in plan
    assert plan.count("Exchange hashpartitioning") <= 2, plan


def test_new_series_ops_no_cartesian_or_bnlj(spark):
    """The round-5 forecast/spectral battery must never fall back to a
    cartesian or nested-loop join (exemplar/profile sides are tiny and
    keyed/broadcast)."""
    from diive_spark.queries import (
        q_dtw_exemplar,
        q_hurst_rs,
        q_seasonal_decompose,
        q_variance_ratio,
    )

    for qfn in (q_dtw_exemplar, q_hurst_rs, q_seasonal_decompose,
                q_variance_ratio):
        plan = _physical_plan(qfn(spark, SF))
        assert "CartesianProduct" not in plan, qfn.__name__
        assert "BroadcastNestedLoopJoin" not in plan, qfn.__name__


def test_dtw_exemplar_side_is_broadcast(spark):
    """dtw_exemplar's per-group exemplar table (one row per source)
    must arrive broadcast — shuffling the full sketch table against a
    40-row side would be the classic smell at 10^12 series."""
    from diive_spark.queries import q_dtw_exemplar

    plan = _physical_plan(q_dtw_exemplar(spark, SF))
    assert "BroadcastHashJoin" in plan


def test_tpch_q6_predicates_reach_the_scan(spark):
    """Q6 is the pushdown benchmark: the shipdate/discount/quantity
    range predicates must appear as PushedFilters on the parquet scan
    and the plan must hold ONE exchange (the 1-row final agg)."""
    from diive_spark.queries import q_tpch_q6

    df = q_tpch_q6(spark, "/root/testdata/sf0.001")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [" in plan
    pushed = plan.split("PushedFilters: [", 1)[1].split("]", 1)[0]
    for col in ("l_shipdate", "l_discount", "l_quantity"):
        assert col in pushed, (col, pushed)
    assert plan.count("Exchange") == 1  # SinglePartition for the agg


def test_tpch_q1_single_shuffle_and_pruned_schema(spark):
    from diive_spark.queries import q_tpch_q1

    df = q_tpch_q1(spark, "/root/testdata/sf0.001")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 1
    # column pruning: the scan must NOT read the unused key columns
    sch = plan.split("ReadSchema: ", 1)[1].split("\n", 1)[0]
    assert "l_orderkey" not in sch and "l_partkey" not in sch


def test_tpch_q3_broadcasts_customer_dim(spark):
    from diive_spark.queries import q_tpch_q3

    df = q_tpch_q3(spark, "/root/testdata/sf0.001")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    # the big join keys on orderkey -- a real hash exchange is expected
    assert "Exchange hashpartitioning" in plan


def test_tpch_q5_broadcasts_dims_no_cartesian(spark):
    from diive_spark.queries import q_tpch_q5

    df = q_tpch_q5(spark, "/root/testdata/sf0.001")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan          # supplier+nation+region dim
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "Exchange hashpartitioning" in plan  # the orderkey exchange


def test_tpch_q14_pushdown_and_broadcast(spark):
    from diive_spark.queries import q_tpch_q14

    df = q_tpch_q14(spark, "/root/testdata/sf0.001")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan          # part dim broadcasts
    assert "CartesianProduct" not in plan
    # the shipdate month filter must reach the lineitem parquet scan
    assert "PushedFilters: [" in plan and "l_shipdate" in plan.split(
        "PushedFilters"
    )[1][:300]


def test_tpch_q10_broadcast_nation_and_pruned_scan(spark):
    from diive_spark.queries import q_tpch_q10

    df = q_tpch_q10(spark, "/root/testdata/sf0.001")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan          # nation dim broadcasts
    assert "CartesianProduct" not in plan
    # returnflag equality reaches the lineitem scan as a pushed filter
    assert "EqualTo(l_returnflag,R)" in plan


def test_seq_pattern_match_no_join_after_sessionize(spark):
    """The regex battery is evaluated row-local on bounded session
    strings: no join appears anywhere in the plan (sessionize is a
    window + groupBy; the pattern counts are conditional aggregates)."""
    from diive_spark.queries import q_seq_pattern_match

    df = q_seq_pattern_match(spark, "/root/testdata/sf0.001")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan
    assert "CartesianProduct" not in plan


def test_psi_drift_broadcasts_edges(spark):
    """The per-source bin-edge dim joins back via broadcast — the big
    series scan is never shuffled for the edge lookup."""
    from diive_spark.queries import q_psi_drift

    df = q_psi_drift(spark, "/root/testdata/sf0.001")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_tpch_q18_broadcasts_filtered_agg(spark):
    """The HAVING-filtered big-order set must broadcast into orders —
    the aggregate-then-semi-join plan, never a full orders shuffle."""
    from diive_spark.queries import q_tpch_q18

    df = q_tpch_q18(spark, "/root/testdata/sf0.001")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    assert "TakeOrderedAndProject" in plan  # top-100, never a full sort


def test_rrf_fusion_broadcast_queries_no_cartesian(spark):
    """The bounded query batch rides a BROADCAST nested-loop (the
    declared brute-force baseline shape, cosine_topk precedent); a
    CartesianProduct (both sides shuffled) must never appear."""
    from diive_spark.queries import q_rrf_fusion

    df = q_rrf_fusion(spark, "/root/testdata/sf0.001")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" in plan
    assert "CartesianProduct" not in plan


def test_table_profile_topk_never_full_sort(spark):
    """Each column's modal value is a TakeOrdered over the grouped
    counts — a global sort of the count table must not appear."""
    from diive_spark.queries import q_table_profile

    df = q_table_profile(spark, "/root/testdata/sf0.001")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
    assert "CartesianProduct" not in plan


def test_diagnostics_battery_no_joins(spark):
    """ARCH-LM, runs test, and turning points are window+aggregate
    plans over the series scan — no join may appear (the runs-test
    median is a window percentile, not a join-back)."""
    from diive_spark.queries import (
        q_arch_lm, q_runs_test, q_turning_points)

    for q in (q_arch_lm, q_runs_test, q_turning_points):
        df = q(spark, "/root/testdata/sf0.001")
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "Join" not in plan, q.__name__
        assert "CartesianProduct" not in plan, q.__name__


def test_tpch_q7_broadcast_nations_no_cartesian(spark):
    from diive_spark.queries import q_tpch_q7

    df = q_tpch_q7(spark, "/root/testdata/sf0.001")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan       # both nation-dim attaches
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    # the ship-window range predicates reach the lineitem scan
    assert "l_shipdate" in plan.split("PushedFilters")[1][:300]


def test_markov_transitions_single_window_no_join(spark):
    """Transition pairs come from one lead window inside the session
    partition and the row totals from a window over the grouped
    pairs — no join anywhere."""
    from diive_spark.queries import q_markov_transitions

    df = q_markov_transitions(spark, "/root/testdata/sf0.001")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan
    assert "CartesianProduct" not in plan


def test_ccf_peak_lag_broadcast_pairs_no_cartesian(spark):
    """The lag explode happens on the bounded pair-filtered left side
    and both pair attaches broadcast — no cartesian, no
    BroadcastNestedLoop; the b-side meets on a plain equi-join."""
    from diive_spark.queries import q_ccf_peak_lag

    df = q_ccf_peak_lag(spark, "/root/testdata/sf0.001")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_vocab_overlap_no_doc_pair_product(spark):
    """The intersection joins the DISTINCT (source, term) relation on
    the term key — per-term fanout is bounded by sources², and no
    cartesian appears."""
    from diive_spark.queries import q_vocab_overlap

    df = q_vocab_overlap(spark, "/root/testdata/sf0.001")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
