"""Composed corpus-preprocessing pipeline (the library form of
scripts/run_corpus_job.py): clean -> PII scrub -> exact dedup ->
MinHash near-dedup (multi-hop, optional cross-batch index) -> quality
gates -> frozen split.

Factored out of the spark-submit script so the physical plan of the
EXACT production composition is test-gated (tests/test_plans.py):
future edits can't silently fuse a cartesian product or lose the
narrow-band dedup join shapes.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from ..plans.barrier import no_pushdown_filter
from .dedup import MinHashIndex, exact_dedup, minhash_dedup
from .scrub import decontaminate, hash_split, redact_pii
from .textstats import clean_text, quality_score, repetition_features


def corpus_pipeline(
    docs: DataFrame,
    est_threshold: float = 0.7,
    minhash_index: MinHashIndex | None = None,
    quality_min: float = 0.5,
    weights: dict[str, float] | None = None,
    multi_hop: bool = True,
    benchmark: DataFrame | None = None,
    decontam_ngram: int = 13,
) -> DataFrame:
    """The full preprocessing composition; returns the final frame with
    a ``split`` column, ready for a partitioned write.  When
    ``minhash_index`` is given and already populated, survivors are
    additionally deduped AGAINST the cross-batch band index.  The
    pipeline only READS the index: appending this batch's survivors is
    the caller's post-write step (see scripts/run_corpus_job.py), so
    (a) building the returned plan has no side effects — a dry run or a
    failed write never mutates persistent state — and (b) only docs
    that survived EVERY gate are indexed; a doc dropped for
    contamination or low quality must not suppress a future batch's
    clean near-duplicate.  When ``benchmark`` is given, docs sharing
    any word ``decontam_ngram``-gram with it are dropped before the
    quality gates (eval-set decontamination — a broadcast hash join,
    see scrub.contamination_hits)."""
    cleaned = redact_pii(
        clean_text(docs), text_col="text_clean", out_col="text_scrubbed"
    )
    exact = exact_dedup(cleaned, text_col="text_scrubbed")
    near = minhash_dedup(
        exact, text_col="text_scrubbed",
        est_threshold=est_threshold, multi_hop=multi_hop,
    )
    near = near.where(F.col("canonical_id") == F.col("doc_id"))
    if minhash_index is not None and minhash_index.exists():
        near = minhash_index.dedup_batch(
            near, est_threshold=est_threshold, text_col="text_scrubbed",
            add_survivors=False,
        ).where("kept").drop("kept")
    if benchmark is not None:
        near = decontaminate(
            near, benchmark, n=decontam_ngram,
            text_col="text_scrubbed", bench_text_col="text", drop=True,
        )
    scored = quality_score(
        repetition_features(near, text_col="text_scrubbed"),
        text_col="text_scrubbed",
    )
    # Barrier, not plain where(): pushdown would inline the whole
    # quality+repetition feature battery (split/regexp chains) into a
    # Filter below the dedup join and re-evaluate it per doc without
    # CSE — measured 4.8x the pipeline wall at sf0.1 (plans/barrier.py)
    kept = no_pushdown_filter(
        scored,
        (F.col("repetition_flag") == 0) & (F.col("quality") >= quality_min),
    )
    return hash_split(
        kept,
        weights or {"train": 0.98, "val": 0.01, "test": 0.01},
        key_col="doc_id",
    )
