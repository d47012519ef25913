"""Sequence packing for LLM training data (target-side; the reference
has no analog): concat-and-chunk tokenized docs into fixed-length
training sequences, the step between a cleaned corpus and a dataloader.

Semantics (GPT-style packing): docs are laid end-to-end in a
deterministic order and the stream is cut every ``seq_len`` tokens; a
doc may straddle a cut (``n_splits`` > 0).  The layout is a pure
function of (doc ids, token counts) — no partitioning dependence, so a
re-run or a resumed job reproduces byte-identical packing.

Scale shape: packing is SHARDED, matching how real pipelines write one
packed stream per output file.  Docs hash into ``n_shards`` buckets
(xxhash64 — deterministic), and the running token offset is a window
cumsum WITHIN a shard: each window partition is one shard, shards pack
in parallel, and shard count grows with the corpus so no partition is
unbounded.  A single global cumsum would be a SinglePartition sort —
exactly the shape this module avoids.
"""

from __future__ import annotations

from typing import Sequence

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window


def pack_sequences(
    df: DataFrame,
    seq_len: int,
    n_shards: int = 64,
    len_col: str = "n_tok",
    id_col: str = "doc_id",
    shard_col: str = "shard",
    shard_expr=None,
) -> DataFrame:
    """Assign every doc its place in the packed token stream of its
    shard.  Adds:

    - ``shard``      — pmod(xxhash64(id), n_shards)
    - ``tok_start``  — first token offset of this doc in the shard stream
    - ``tok_end``    — one past the last token offset
    - ``first_seq`` / ``last_seq`` — the fixed-length sequences the doc
      touches (floor(tok_start/seq_len), floor((tok_end-1)/seq_len))
    - ``n_splits``   — sequence boundaries crossed (last_seq - first_seq)

    Zero-length docs get first_seq = last_seq = the sequence their
    offset falls in, n_splits = 0.

    ``shard_expr`` overrides the default xxhash64 shard assignment —
    e.g. pack per source, per input file, or use an engine-portable
    expression when an external system must re-derive the layout.
    """
    if seq_len <= 0:
        raise ValueError(f"seq_len must be positive, got {seq_len}")
    shard = (
        shard_expr if shard_expr is not None
        else F.pmod(F.xxhash64(F.col(id_col)), F.lit(n_shards))
    )
    out = df.withColumn(shard_col, shard)
    w = (
        Window.partitionBy(shard_col)
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    n = F.col(len_col).cast("long")
    end = F.sum(n).over(w)
    start = end - n
    first_seq = F.floor(start / seq_len)
    last_seq = F.floor((F.greatest(end, start + 1) - 1) / seq_len)
    return (
        out.withColumn("tok_start", start)
        .withColumn("tok_end", end)
        .withColumn("first_seq", first_seq)
        .withColumn("last_seq", last_seq)
        .withColumn("n_splits", (last_seq - first_seq).cast("long"))
    )


def packing_stats(
    packed: DataFrame,
    seq_len: int,
    shard_col: str = "shard",
    group_cols: Sequence[str] = (),
) -> DataFrame:
    """Per-shard packing summary: docs, tokens, emitted sequences
    (ceil(total/seq_len)), boundary crossings, and the fill ratio of
    the emitted sequences (1 - padding waste in the final partial
    sequence).  One hash aggregate over the packed frame."""
    total = F.sum(F.col("tok_end") - F.col("tok_start"))
    n_seqs = F.ceil(total / seq_len)
    return (
        packed.groupBy(shard_col, *group_cols)
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            total.alias("n_tokens"),
            n_seqs.alias("n_seqs"),
            F.sum("n_splits").alias("n_crossings"),
            # try_divide: a shard of only zero-length docs has
            # total=0, n_seqs=0 — NULL fill, not an ANSI divide error
            F.try_divide(total, n_seqs * F.lit(seq_len)).alias("fill_ratio"),
        )
    )
