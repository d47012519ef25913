"""Custom stateful streaming operator: incremental gap detection.

The batch gap engine (operators/gaps.py) finds NULL runs with
gaps-and-islands; on a *stream* of arriving series records the same
question — "which positions never arrived?" — needs per-key state that
survives micro-batches.  This is the ``applyInPandasWithState`` pattern
(task brief: custom stateful operators for streams).

State per key: the last seen position.  When a record arrives more than
one step after the stored position, the skipped range is emitted as a
gap row.  State persists in the checkpoint, so a restarted query
continues exactly where it stopped (north rule: resumable from
checkpoint).
"""

from __future__ import annotations

from typing import Any, Iterator, Tuple

import pandas as pd
import pyspark.sql.types as T
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

GAP_SCHEMA = T.StructType(
    [
        T.StructField("source", T.StringType()),
        T.StructField("doc_id", T.StringType()),
        T.StructField("gap_start", T.LongType()),
        T.StructField("gap_end", T.LongType()),
        T.StructField("gap_length", T.LongType()),
    ]
)

STATE_SCHEMA = T.StructType([T.StructField("last_pos", T.LongType())])


def _detect(
    key: Tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    last_pos = state.get[0] if state.exists else None
    gaps: list[tuple] = []
    # concat ALL Arrow chunks before sorting: the group arrives as
    # multiple chunks (arrow.maxRecordsPerBatch) and per-chunk sorting
    # would report spurious gaps when a later chunk holds smaller
    # positions
    all_pos: list[int] = []
    for pdf in pdfs:
        all_pos.extend(int(p) for p in pdf["pos"].tolist())
    for pos in sorted(all_pos):
        if last_pos is not None and pos > last_pos + 1:
            gaps.append(
                (key[0], key[1], last_pos + 1, pos - 1, pos - 1 - last_pos)
            )
        if last_pos is None or pos > last_pos:
            last_pos = pos
    state.update((last_pos,))
    if gaps:
        yield pd.DataFrame(
            gaps, columns=["source", "doc_id", "gap_start", "gap_end", "gap_length"]
        )


def stream_gap_detector(stream_df: DataFrame) -> DataFrame:
    """Stateful gap stream: input (source, doc_id, pos[, ...]) records,
    output one row per detected skipped range."""
    return stream_df.groupBy("source", "doc_id").applyInPandasWithState(
        _detect,
        outputStructType=GAP_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
