"""Scrubbing + sampling operators for training-data pipelines
(target-side; the reference has no text corpus tooling — these cover
the pre-training preprocessing a 100 TB corpus needs).

- PII redaction: email / IPv4 / phone patterns replaced with typed
  placeholder tokens, plus per-kind match counts.  Pure JVM
  ``regexp_replace`` / ``regexp_extract_all`` — no UDFs; patterns stay
  in the RE2-compatible subset so the DuckDB oracle twin can run the
  exact same regexes.
- Deterministic hash sampling: keep rows where the first 8 hex chars of
  md5(seed || key) fall below a rate threshold.  Engine-portable
  (lexicographic hex compare), reproducible, and cluster-stable: the
  decision depends only on the key, never on partitioning — unlike
  ``df.sample`` whose output changes with the split layout.
- Stratified variant: per-stratum rates (e.g. per-language quotas for
  corpus rebalancing) via one when-chain over the same hash.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

# public, standard patterns — kept lookaround-free for RE2 parity
PII_PATTERNS = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "ipv4": r"\b([0-9]{1,3}\.){3}[0-9]{1,3}\b",
    "phone": r"\+?[0-9]{1,3}[-. ]?\(?[0-9]{3}\)?[-. ]?[0-9]{3}[-. ]?[0-9]{4}",
}


def redact_pii(
    df: DataFrame,
    text_col: str = "text",
    kinds: tuple[str, ...] = ("email", "ipv4", "phone"),
    out_col: str = "text_redacted",
) -> DataFrame:
    """Replace each PII match with ``<KIND>`` and count matches per
    kind (``n_email`` etc.).  Order matters: email before phone so the
    digits in a username are not half-eaten by the phone pattern;
    counts are taken on the original text."""
    out = df
    for kind in kinds:
        pat = PII_PATTERNS[kind]
        out = out.withColumn(
            f"n_{kind}",
            F.size(F.regexp_extract_all(F.col(text_col), F.lit(pat), 0)),
        )
    redacted = F.col(text_col)
    for kind in kinds:
        redacted = F.regexp_replace(
            redacted, PII_PATTERNS[kind], f"<{kind.upper()}>"
        )
    return out.withColumn(out_col, redacted)


def _hash_bucket(key_col, seed: int):
    """First 8 hex chars of md5(seed || key) as the sampling bucket."""
    return F.substring(
        F.md5(F.concat(F.lit(str(seed)), F.lit(":"), key_col.cast("string"))), 1, 8
    )


def rate_threshold_hex(rate: float) -> str:
    """Hex threshold such that P(bucket < threshold) == rate over the
    uniform 32-bit bucket space."""
    if not 0.0 <= rate <= 1.0:
        raise ValueError(f"rate must be in [0,1], got {rate}")
    return format(min(int(rate * (1 << 32)), (1 << 32) - 1), "08x")


def _keep_cond(bucket, rate: float):
    """Keep-condition for a hash bucket at ``rate``.  rate >= 1.0 is
    special-cased to literal True: the strict '<' against the capped
    0xffffffff threshold would otherwise drop keys whose md5 bucket is
    exactly 'ffffffff' (~1 in 4B rows) from a supposedly keep-all
    stratum."""
    if rate >= 1.0:
        return F.lit(True)
    return bucket < F.lit(rate_threshold_hex(rate))


def hash_sample(
    df: DataFrame, rate: float, key_col: str, seed: int = 0
) -> DataFrame:
    """Deterministic ``rate`` sample keyed on ``key_col``: a row is kept
    iff md5(seed || key)[:8] < rate-threshold (rate >= 1.0 keeps all).
    Same keys always draw the same verdict across runs, partitionings
    and engines — the property corpus-freeze reproducibility needs."""
    return df.where(_keep_cond(_hash_bucket(F.col(key_col), seed), rate))


def stratified_hash_sample(
    df: DataFrame,
    rates: dict[str, float],
    strata_col: str,
    key_col: str,
    seed: int = 0,
    default_rate: float = 0.0,
) -> DataFrame:
    """Per-stratum deterministic sampling (e.g. language rebalancing:
    {'en': 0.1, 'de': 1.0}).  One hash, one when-chain of boolean
    keep-conditions — no shuffle; rate >= 1.0 strata keep every key
    (no 'ffffffff' edge-bucket loss)."""
    bucket = _hash_bucket(F.col(key_col), seed)
    keep = _keep_cond(bucket, default_rate)
    for stratum, rate in sorted(rates.items()):
        keep = F.when(
            F.col(strata_col) == stratum, _keep_cond(bucket, rate)
        ).otherwise(keep)
    return df.where(keep)


def hash_split(
    df: DataFrame,
    weights: dict[str, float],
    key_col: str,
    seed: int = 0,
    out_col: str = "split",
) -> DataFrame:
    """Deterministic dataset split (train/val/test): each row's md5
    bucket lands in one of the cumulative weight ranges.  Same key ->
    same split forever, across runs, partitionings and engines — the
    property a frozen eval set requires (`randomSplit` re-draws on
    every action and shifts with partitioning).  Weights must sum to
    1 (+-1e-9); ranges are assigned in sorted-name order for
    determinism."""
    total = sum(weights.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"weights must sum to 1, got {total}")
    bucket = _hash_bucket(F.col(key_col), seed)
    expr = None
    acc = 0.0
    for name in sorted(weights):
        acc += weights[name]
        hi = F.lit(rate_threshold_hex(min(acc, 1.0)))
        cond = bucket < hi
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(cond, F.lit(name))
    # float accumulation can leave the last range a hair short of
    # 0xffffffff — fold the remainder into the last (sorted) name
    return df.withColumn(out_col, expr.otherwise(F.lit(sorted(weights)[-1])))


def perplexity_bucket_sample(
    df: DataFrame,
    rates: tuple[float, ...] = (1.0, 0.5, 0.1),
    text_col: str = "text",
    id_col: str = "doc_id",
    score_col: str | None = None,
    seed: int = 0,
    exact_quantiles: bool = True,
    bucket_col: str = "ppl_bucket",
) -> DataFrame:
    """CCNet-style perplexity-bucketed sampling: rank docs by an
    LM-quality proxy (mean unigram log-prob — the negative log of
    perplexity), cut the corpus into ``len(rates)`` equal-probability
    buckets (bucket 0 = head/most-fluent ... last = tail), and keep
    each bucket at its deterministic hash rate keyed on ``id_col``.
    Head-heavy ``rates`` reproduce the classic head/middle/tail corpus
    rebalancing; the verdict depends only on (score, key), never on
    partitioning.

    Scale shape: one score pass (two aggregations, see
    ``unigram_logprob_score``), one tiny quantile row cross-joined
    broadcast, then a pure filter — the docs themselves are never
    shuffled.  ``exact_quantiles=False`` switches the cut points to
    ``approx_percentile`` (t-digest) for corpora where exact
    percentile's per-group buffering is unreasonable; bucket edges then
    move by the sketch error, the keep-decision stays deterministic.
    Docs with no score (no words) land in the tail bucket.  Ties at a
    cut point go to the BETTER bucket (``>=``): with heavy duplicate
    mass the whole tie lands on one side of any threshold, and sending
    equal-quality docs tail-ward would down-sample them for sharing a
    score with the quantile edge.
    """
    if score_col is None:
        from .textstats import unigram_logprob_score

        df = unigram_logprob_score(df, text_col=text_col, id_col=id_col)
        score_col = "unigram_logprob"
    n_b = len(rates)
    qs = F.array(*[F.lit(i / n_b) for i in range(1, n_b)])
    pct = F.percentile(F.col(score_col), qs) if exact_quantiles else (
        F.approx_percentile(F.col(score_col), qs, F.lit(10000))
    )
    thrs = df.agg(pct.alias("_thrs"))
    s = F.col(score_col)
    n_above = F.size(F.filter(F.col("_thrs"), lambda t: s >= t))
    bucketed = (
        df.crossJoin(F.broadcast(thrs))
        .withColumn(
            bucket_col,
            F.lit(n_b - 1) - F.coalesce(n_above, F.lit(0)),
        )
        .drop("_thrs")
    )
    bucket_hash = _hash_bucket(F.col(id_col), seed)
    keep = F.lit(False)
    for i, rate in enumerate(rates):
        keep = F.when(
            F.col(bucket_col) == i, _keep_cond(bucket_hash, rate)
        ).otherwise(keep)
    return bucketed.where(keep)


def temperature_mix_sample(
    df: DataFrame,
    alpha: float = 0.3,
    strata_col: str = "source",
    key_col: str = "doc_id",
    seed: int = 0,
) -> DataFrame:
    """Temperature-based source rebalancing (the multinomial
    alpha-resampling of mT5/XLM-R, public): target share of stratum s
    is p_s ∝ n_s^alpha, flattening the head so low-resource sources
    are not drowned.  Down-sampling only — the largest feasible total
    is chosen so the most-upweighted stratum keeps ALL its rows (rate
    1.0) and every other stratum keeps ``rate_s = (p_s / n_s) /
    max_t(p_t / n_t)``; verdicts are the deterministic per-key hash,
    so the draw is stable across runs, partitionings and engines.

    Scale shape: one tiny per-stratum count aggregate, rates derived
    row-free on the driver-side plan as a broadcast join, then a pure
    filter — the corpus is never shuffled.  Adds ``mix_rate``.
    """
    if alpha < 0:
        raise ValueError(f"alpha must be >= 0, got {alpha}")
    counts = df.groupBy(strata_col).agg(F.count(F.lit(1)).alias("_n"))
    # rate_s ∝ n_s^(alpha-1); normalize so max rate == 1.0
    rated = counts.withColumn(
        "_w", F.pow(F.col("_n").cast("double"), F.lit(alpha - 1.0))
    )
    max_w = rated.agg(F.max("_w").alias("_mw"))
    rates = (
        rated.crossJoin(F.broadcast(max_w))
        .withColumn("mix_rate", F.col("_w") / F.col("_mw"))
        .select(strata_col, "mix_rate")
    )
    bucket = _hash_bucket(F.col(key_col), seed)
    thr = F.lpad(
        F.lower(
            F.conv(
                F.floor(
                    F.least(F.col("mix_rate"), F.lit(1.0)) * F.lit(2.0**32)
                ).cast("string"),
                10, 16,
            )
        ),
        8, "0",
    )
    return (
        df.join(F.broadcast(rates), on=strata_col, how="left")
        .where((F.col("mix_rate") >= 1.0) | (bucket < thr))
    )


def word_ngrams(text_col, n: int):
    """Array of distinct space-joined word ``n``-grams of the
    whitespace-lowercased tokenization of ``text_col``; empty array when
    the doc has fewer than ``n`` words.  Pure column expression — the
    guard matters because ``sequence(1, size-n+1)`` would count DOWN
    when the doc is shorter than ``n``."""
    w = F.split(F.lower(F.trim(text_col)), r"\s+")
    grams = F.when(
        F.size(w) >= n,
        F.transform(
            F.sequence(F.lit(1), F.size(w) - n + 1),
            lambda i: F.concat_ws(" ", F.slice(w, i, n)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return F.array_distinct(grams)


def contamination_hits(
    corpus: DataFrame,
    benchmark: DataFrame,
    n: int = 13,
    text_col: str = "text",
    id_col: str = "doc_id",
    bench_text_col: str | None = None,
) -> DataFrame:
    """Benchmark decontamination (the n-gram-overlap check every
    pre-training pipeline runs against its eval sets; public method —
    GPT-3 App. C / PaLM-style 13-gram overlap): per corpus doc, the
    number of distinct word ``n``-grams it shares with any benchmark
    document.  Returns only contaminated docs: (id_col, n_hits).

    Scale shape: the benchmark side (eval suites — thousands of docs) is
    reduced to a DISTINCT set of 64-bit n-gram hashes and broadcast; the
    corpus side is a row-local explode of per-doc distinct n-gram hashes
    followed by the broadcast hash join and a partially-aggregated
    per-doc count.  The corpus text itself is never shuffled — the only
    exchange carries (doc_id, partial count) rows.  Joining on
    ``xxhash64`` keeps the broadcast map ~5x smaller than the gram
    strings; a collision needs 2^-64 odds against the benchmark set.
    """
    bench_text = bench_text_col or text_col
    bench = (
        benchmark.select(
            F.explode(word_ngrams(F.col(bench_text), n)).alias("_g")
        )
        .select(F.xxhash64("_g").alias("_gh"))
        .distinct()
    )
    return (
        corpus.select(
            F.col(id_col),
            F.explode(word_ngrams(F.col(text_col), n)).alias("_g"),
        )
        .select(id_col, F.xxhash64("_g").alias("_gh"))
        .join(F.broadcast(bench), on="_gh")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_hits"))
    )


def decontaminate(
    corpus: DataFrame,
    benchmark: DataFrame,
    n: int = 13,
    min_hits: int = 1,
    text_col: str = "text",
    id_col: str = "doc_id",
    bench_text_col: str | None = None,
    drop: bool = False,
) -> DataFrame:
    """Join the contamination verdict back onto the corpus: adds
    ``n_contam_hits`` (0 when clean) and ``flag_contaminated`` (1 when
    n_hits >= min_hits).  ``drop=True`` filters contaminated docs out
    instead — the production decontamination pass.  The hits table is
    tiny (contaminated docs only), so AQE broadcasts the join-back."""
    hits = contamination_hits(
        corpus, benchmark, n=n, text_col=text_col, id_col=id_col,
        bench_text_col=bench_text_col,
    )
    out = (
        corpus.join(hits, on=id_col, how="left")
        .withColumn("n_contam_hits", F.coalesce(F.col("n_hits"), F.lit(0)))
        .drop("n_hits")
        .withColumn(
            "flag_contaminated",
            (F.col("n_contam_hits") >= min_hits).cast("int"),
        )
    )
    if drop:
        out = out.where(F.col("flag_contaminated") == 0).drop(
            "n_contam_hits", "flag_contaminated"
        )
    return out


def remove_boilerplate_paragraphs(
    df: DataFrame,
    max_df: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
    sep: str = "\n\n",
    out_col: str = "text_clean",
) -> DataFrame:
    """Sub-document dedup: drop paragraphs that repeat across more than
    ``max_df`` documents (headers, footers, cookie banners — the
    boilerplate a crawled corpus carries into every page), keeping each
    doc's remaining paragraphs in their original order.

    Shape: posexplode paragraphs -> one groupBy on the paragraph digest
    for document frequency (map-side combine collapses within-partition
    repeats) -> broadcast-join the (small) boilerplate digest set back
    -> re-assemble with collect_list ordered by position inside the
    aggregate (sort-based, no window).  Adds ``n_dropped`` per doc.
    """
    paras = df.select(
        F.col(id_col),
        F.posexplode(F.split(F.col(text_col), sep)).alias("_pos", "_para"),
    ).withColumn("_digest", F.md5(F.trim(F.col("_para"))))
    boiler = (
        paras.groupBy("_digest")
        .agg(F.countDistinct(id_col).alias("_df"))
        .where(F.col("_df") > max_df)
        .select("_digest")
    )
    kept = paras.join(F.broadcast(boiler.withColumn("_drop", F.lit(1))),
                      on="_digest", how="left")
    rebuilt = (
        kept.groupBy(id_col)
        .agg(
            F.concat_ws(
                sep,
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.when(
                                F.col("_drop").isNull(),
                                F.struct(F.col("_pos"), F.col("_para")),
                            )
                        )
                    ),
                    lambda s: s._para,
                ),
            ).alias(out_col),
            F.count(F.col("_drop")).alias("n_dropped"),
        )
    )
    return df.join(rebuilt, on=id_col, how="left")


# --- Bloom-filter membership (round-5 continuation) --------------------


def _bloom_pos(item_col, i: int, m_bits: int):
    """Bit position of ``item_col`` under hash ``i``: the first 60 bits
    of md5 over a seed-prefixed item, mod ``m_bits``.  md5 + hex-cast is
    the engine-portable construction this module already uses for
    deterministic sampling (:func:`_hash_bucket`) — the DuckDB twin
    computes the identical integer with
    ``('0x' || substr(md5(...), 1, 15))::BIGINT``."""
    hx = F.substring(F.md5(F.concat(F.lit(f"bf{i}:"), item_col)), 1, 15)
    return F.pmod(F.conv(hx, 16, 10).cast("long"), F.lit(int(m_bits)))


def bloom_build(
    items: DataFrame,
    item_col: str = "item",
    m_bits: int = 1 << 20,
    k: int = 4,
) -> DataFrame:
    """Build a Bloom filter (Bloom, CACM 1970) over the items as a
    LONG-FORM bit set: one row per set bit.  No false negatives ever;
    false-positive rate ~ (1 - exp(-k*n/m))^k.

    Long form (not a packed bitmap) is deliberate: it composes by
    plain union+distinct, broadcasts as an ordinary small relation,
    stays exactly replayable on any SQL engine, and at ~10 bits/item
    is still ~6x smaller than the exact 64-bit hash set
    (:func:`contamination_hits`'s broadcast).  The exact set wins for
    thousands-of-docs eval suites; the bloom is the scale path when
    the membership side reaches billions (seen-URL registries,
    cross-snapshot document caches) where 8 bytes/item no longer
    broadcasts.  A packed variant would swap the distinct for
    ``bitmap_construct_agg`` — same positions, denser transport.
    """
    if not 1 <= k <= 16:
        raise ValueError(f"k must be in [1, 16], got {k}")
    if m_bits < 2:
        raise ValueError(f"m_bits must be >= 2, got {m_bits}")
    col = F.col(item_col).cast("string")
    poss = F.array(*[_bloom_pos(col, i, m_bits) for i in range(k)])
    return (
        items.where(F.col(item_col).isNotNull())
        .select(F.explode(poss).alias("bit"))
        .distinct()
    )


def bloom_probe(
    df: DataFrame,
    bloom: DataFrame,
    item_col: str = "item",
    m_bits: int = 1 << 20,
    k: int = 4,
    flag_col: str = "bloom_hit",
) -> DataFrame:
    """Membership test against a :func:`bloom_build` bit set: returns
    *df* with ``flag_col`` (boolean; true = possibly-member, false =
    DEFINITELY absent).

    Scale shape: the verdict is computed per DISTINCT item (k fan-out
    rows each, broadcast-joined against the bit set, flagged when all
    k probes land on set bits), then hash-joined back onto the rows —
    the wide ``df`` never fans out, and the verdict relation is
    distinct-items-sized, so AQE typically broadcasts the join-back.
    Null items flag false (no membership claim)."""
    col = F.col(item_col).cast("string")
    items = df.select(col.alias("_it")).where(
        F.col("_it").isNotNull()
    ).distinct()
    fan = items.withColumn(
        "_pos",
        F.explode(F.array(*[_bloom_pos(F.col("_it"), i, m_bits)
                            for i in range(k)])),
    )
    verdict = (
        fan.join(
            F.broadcast(bloom.withColumnRenamed("bit", "_pos")
                        .withColumn("_set", F.lit(1))),
            on="_pos", how="left",
        )
        .groupBy("_it")
        .agg((F.count("_set") == k).alias(flag_col))
    )
    out = df.join(
        verdict, on=col == F.col("_it"), how="left"
    ).drop("_it")
    return out.withColumn(flag_col, F.coalesce(F.col(flag_col),
                                               F.lit(False)))
