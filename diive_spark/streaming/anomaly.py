"""Custom stateful streaming operator: online EWMA control chart.

The batch chart (operators/outliers.py:ewma_chart) bounds per-row state
with a W-truncated fold because batch Spark punishes whole-partition
sequential state.  On a STREAM the trade-off inverts: the EXACT
textbook recursion ``ewma_t = ewma_{t-1}*(1-alpha) + alpha*x_t`` is
O(1) state per series — one float carried across micro-batches via
``applyInPandasWithState``, surviving restarts through the checkpoint
(north rule: resumable from checkpoint).

Control limits are CALIBRATED, not learned online: the target mean and
process sd come from a reference period (in production, read off the
batch tier tables — e.g. TierStore tier_1h mean/sd partials), exactly
the standard control-chart practice of fixing limits from an
in-control baseline.  Learning them on the stream would bias the chart
toward whatever drift it is supposed to catch.

State per key: (ewma, last_pos).  Out-of-order records inside a
micro-batch are sorted by position after concatenating every Arrow
chunk of the group; a record at or before ``last_pos``
(an at-least-once replay) is dropped so redelivery cannot double-fold
— the same idempotence contract as streaming/rollup.py.
"""

from __future__ import annotations

import math
from typing import Any, Iterator, Tuple

import pandas as pd
import pyspark.sql.types as T
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

EWMA_SCHEMA = T.StructType(
    [
        T.StructField("source", T.StringType()),
        T.StructField("doc_id", T.StringType()),
        T.StructField("pos", T.LongType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("ewma", T.DoubleType()),
        T.StructField("flag_ewma", T.IntegerType()),
    ]
)

EWMA_STATE_SCHEMA = T.StructType(
    [
        T.StructField("ewma", T.DoubleType()),
        T.StructField("last_pos", T.LongType()),
    ]
)


def stream_ewma_chart(
    stream_df: DataFrame,
    alpha: float = 0.2,
    mean: float = 0.0,
    sd: float = 1.0,
    n_sigma: float = 3.0,
) -> DataFrame:
    """Stateful EWMA chart over a stream of (source, doc_id, pos, value)
    records: exact recursion, one row out per non-null reading with its
    running ewma and flag (2 outside ``mean ± n_sigma * sigma_ewma``,
    using the asymptotic ``sigma_ewma = sd * sqrt(alpha / (2-alpha))``).
    """
    if not 0.0 < alpha <= 1.0:
        raise ValueError(f"alpha must be in (0, 1], got {alpha}")
    if sd <= 0:
        raise ValueError(f"sd must be > 0, got {sd}")
    if n_sigma <= 0:
        raise ValueError(f"n_sigma must be > 0, got {n_sigma}")
    a = float(alpha)
    limit = float(n_sigma) * float(sd) * math.sqrt(a / (2.0 - a))
    mu = float(mean)

    def _chart(
        key: Tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        ewma, last_pos = state.get if state.exists else (None, None)
        rows: list[tuple] = []
        # applyInPandasWithState hands the group over as MULTIPLE Arrow
        # chunks (split at arrow.maxRecordsPerBatch): sort only after
        # concatenating them all, or a later chunk with smaller
        # positions would be mis-dropped as a replay
        pdf = pd.concat(list(pdfs), ignore_index=True)
        pdf = pdf.dropna(subset=["value"]).sort_values("pos")
        for pos, val in zip(pdf["pos"], pdf["value"]):
            pos, val = int(pos), float(val)
            if last_pos is not None and pos <= last_pos:
                continue  # at-least-once replay: already folded
            ewma = val if ewma is None else ewma * (1.0 - a) + a * val
            flag = 2 if abs(ewma - mu) > limit else 0
            rows.append((key[0], key[1], pos, val, ewma, flag))
            last_pos = pos
        state.update((ewma, last_pos))
        if rows:
            yield pd.DataFrame(
                rows,
                columns=["source", "doc_id", "pos", "value", "ewma",
                         "flag_ewma"],
            )

    return stream_df.groupBy("source", "doc_id").applyInPandasWithState(
        _chart,
        outputStructType=EWMA_SCHEMA,
        stateStructType=EWMA_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


CUSUM_SCHEMA = T.StructType(
    [
        T.StructField("source", T.StringType()),
        T.StructField("doc_id", T.StringType()),
        T.StructField("pos", T.LongType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("cusum_hi", T.DoubleType()),
        T.StructField("cusum_lo", T.DoubleType()),
        T.StructField("flag_cusum", T.IntegerType()),
    ]
)

CUSUM_STATE_SCHEMA = T.StructType(
    [
        T.StructField("cusum_hi", T.DoubleType()),
        T.StructField("cusum_lo", T.DoubleType()),
        T.StructField("last_pos", T.LongType()),
    ]
)


def stream_cusum_chart(
    stream_df: DataFrame,
    k: float = 0.5,
    h: float = 5.0,
    mean: float = 0.0,
    sd: float = 1.0,
) -> DataFrame:
    """Stateful two-sided CUSUM over a stream: the exact Page recursion
    (``hi = max(0, hi + z - k)``, ``lo = max(0, lo - z - k)`` on
    calibrated ``z = (x - mean) / sd``) carried as two floats of keyed
    state — the untruncated statistic the batch chart bounds with a
    window.  Same replay guard and checkpoint-resume contract as
    :func:`stream_ewma_chart`."""
    if sd <= 0:
        raise ValueError(f"sd must be > 0, got {sd}")
    if k < 0 or h <= 0:
        raise ValueError(f"need k >= 0 and h > 0, got k={k}, h={h}")
    kf, hf, mu, sdv = float(k), float(h), float(mean), float(sd)

    def _chart(
        key: Tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        hi, lo, last_pos = state.get if state.exists else (0.0, 0.0, None)
        rows: list[tuple] = []
        # concat ALL Arrow chunks before sorting (see stream_ewma_chart)
        pdf = pd.concat(list(pdfs), ignore_index=True)
        pdf = pdf.dropna(subset=["value"]).sort_values("pos")
        for pos, val in zip(pdf["pos"], pdf["value"]):
            pos, val = int(pos), float(val)
            if last_pos is not None and pos <= last_pos:
                continue  # at-least-once replay: already folded
            z = (val - mu) / sdv
            hi = max(0.0, hi + z - kf)
            lo = max(0.0, lo - z - kf)
            flag = 2 if (hi > hf or lo > hf) else 0
            rows.append((key[0], key[1], pos, val, hi, lo, flag))
            last_pos = pos
        state.update((hi, lo, last_pos))
        if rows:
            yield pd.DataFrame(
                rows,
                columns=["source", "doc_id", "pos", "value",
                         "cusum_hi", "cusum_lo", "flag_cusum"],
            )

    return stream_df.groupBy("source", "doc_id").applyInPandasWithState(
        _chart,
        outputStructType=CUSUM_SCHEMA,
        stateStructType=CUSUM_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


KALMAN_SCHEMA = T.StructType(
    [
        T.StructField("source", T.StringType()),
        T.StructField("doc_id", T.StringType()),
        T.StructField("pos", T.LongType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("level", T.DoubleType()),
        T.StructField("p_var", T.DoubleType()),
        T.StructField("flag_innov", T.IntegerType()),
    ]
)

KALMAN_STATE_SCHEMA = T.StructType(
    [
        T.StructField("m", T.DoubleType()),
        T.StructField("p", T.DoubleType()),
        T.StructField("last_pos", T.LongType()),
    ]
)


def stream_kalman_filter(
    stream_df: DataFrame,
    q: float = 0.1,
    r: float = 1.0,
    n_sigma: float = 3.0,
) -> DataFrame:
    """Stateful streaming Kalman local-level filter (Kalman 1960): the
    batch fold of operators/forecast.py:kalman_local_level carried as
    O(1) per-series state ``(m, P, last_pos)`` across micro-batches —
    IDENTICAL double arithmetic (p_pred = P + q; gain = p_pred /
    (p_pred + r); m += gain * innov; P = (1 - gain) * p_pred; init
    m = x1, P = r), so the streamed final state is bit-equal to the
    batch operator over the same readings (the stream_ewma_chart /
    stateful-partials parity contract).

    Emits one row per non-null reading with the post-update level and
    error variance plus ``flag_innov`` = 2 where the standardized
    innovation ``|x - m_pred| / sqrt(p_pred + r)`` exceeds ``n_sigma``
    — the state-space anomaly gate: unlike the EWMA chart's fixed
    calibrated limits, the innovation variance ADAPTS (wide after
    gaps/starts, tight once locked on).

    At-least-once replays (pos <= last_pos) are dropped before
    folding; out-of-order records within a micro-batch are sorted
    after concatenating all Arrow chunks (the established contract in
    this module).  Restart-safe through the checkpoint.
    """
    if q < 0 or r <= 0:
        raise ValueError(f"need q >= 0 and r > 0, got q={q} r={r}")
    if n_sigma <= 0:
        raise ValueError(f"n_sigma must be > 0, got {n_sigma}")
    qf, rf, ns = float(q), float(r), float(n_sigma)

    def _filt(
        key: Tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        m, p, last_pos = state.get if state.exists else (None, None, None)
        rows: list[tuple] = []
        pdf = pd.concat(list(pdfs), ignore_index=True)
        pdf = pdf.dropna(subset=["value"]).sort_values("pos")
        for pos, val in zip(pdf["pos"], pdf["value"]):
            pos, val = int(pos), float(val)
            if last_pos is not None and pos <= last_pos:
                continue  # at-least-once replay: already folded
            if m is None:
                m, p, flag = val, rf, 0
            else:
                p_pred = p + qf
                gain = p_pred / (p_pred + rf)
                innov = val - m
                flag = (
                    2 if abs(innov) > ns * math.sqrt(p_pred + rf) else 0
                )
                m = m + gain * innov
                p = (1.0 - gain) * p_pred
            rows.append((key[0], key[1], pos, val, m, p, flag))
            last_pos = pos
        state.update((m, p, last_pos))
        if rows:
            yield pd.DataFrame(
                rows,
                columns=["source", "doc_id", "pos", "value", "level",
                         "p_var", "flag_innov"],
            )

    return stream_df.groupBy("source", "doc_id").applyInPandasWithState(
        _filt,
        outputStructType=KALMAN_SCHEMA,
        stateStructType=KALMAN_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
