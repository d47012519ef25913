"""As-of / nearest joins and percentile clipping — the reference-wide
join idioms of SURVEY §2.11.

Reference semantics:
- find_nearest_val (core/funcs/funcs.py:44-48), nearest-years pooling
  (core/times/neighbors.py:23-29): nearest match by absolute axis
  distance.
- df_between_two_dates / similarity windows (core/dfun/frames.py:480-501,
  uncertainty.py:244-285): range predicates.
- percentile clipping (core/dfun/frames.py:671-676): winsorize values
  outside [p_lo, p_hi].

Spark-first design:
- BACKWARD as-of join (most recent right row at-or-before each left
  row) is ONE ordered window over the unioned streams — no join node
  at all: shuffle on the key, sort within partition, last-non-null
  carry-forward.  This is the classic scalable as-of shape (the same
  plan a dedicated ASOF JOIN operator lowers to).
- NEAREST as-of combines the backward pass with a forward pass (the
  same union windowed in reverse) and picks the closer side.
- Tolerance is a filter on the carried axis — no extra pass.
"""

from __future__ import annotations

from typing import Sequence

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window

from ..conventions import KEY_COLS


def asof_join(
    left: DataFrame,
    right: DataFrame,
    axis_col: str = "pos",
    key_cols: Sequence[str] = KEY_COLS,
    value_cols: Sequence[str] = ("value",),
    direction: str = "backward",
    tolerance: int | None = None,
    suffix: str = "_asof",
) -> DataFrame:
    """pandas ``merge_asof`` / DuckDB ``ASOF JOIN`` analog.

    For every left row, attach the right row's ``value_cols`` whose
    axis is the closest at-or-before (``backward``), at-or-after
    (``forward``), or nearest in either direction (``nearest``),
    optionally within ``tolerance`` axis units.  Ties at equal axis:
    the right row at the exact axis wins.

    Plan: union the two inputs with a side marker, one window per
    direction partitioned by the join key — never a join, never a
    cross product.
    """
    vals = list(value_cols)
    keys = list(key_cols)
    lmark = left.select(
        *keys, F.col(axis_col),
        *[F.lit(None).cast(right.schema[v].dataType).alias(f"_r_{v}") for v in vals],
        F.lit(None).cast("long").alias("_r_axis"),
        F.lit(1).alias("_is_left"),
    )
    rmark = right.select(
        *keys, F.col(axis_col),
        *[F.col(v).alias(f"_r_{v}") for v in vals],
        F.col(axis_col).cast("long").alias("_r_axis"),
        F.lit(0).alias("_is_left"),
    )
    u = lmark.unionByName(rmark)

    def carried(ordering):
        # right rows sort before left rows at the same axis so an exact
        # match is visible to the left row
        w = (
            Window.partitionBy(*keys)
            .orderBy(*ordering)
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        cols = {f"_c_{v}": F.last(f"_r_{v}", ignorenulls=True).over(w) for v in vals}
        cols["_c_axis"] = F.last("_r_axis", ignorenulls=True).over(w)
        return cols

    if direction in ("backward", "nearest"):
        bwd = carried([F.col(axis_col).asc(), F.col("_is_left").asc()])
        u = u.withColumns({k + "_b": v for k, v in bwd.items()})
    if direction in ("forward", "nearest"):
        fwd = carried([F.col(axis_col).desc(), F.col("_is_left").asc()])
        u = u.withColumns({k + "_f": v for k, v in fwd.items()})

    out = u.where(F.col("_is_left") == 1)
    ax = F.col(axis_col).cast("long")
    if direction == "backward":
        dist = ax - F.col("_c_axis_b")
        pick = {v: F.col(f"_c_{v}_b") for v in vals}
        pick_axis = F.col("_c_axis_b")
    elif direction == "forward":
        dist = F.col("_c_axis_f") - ax
        pick = {v: F.col(f"_c_{v}_f") for v in vals}
        pick_axis = F.col("_c_axis_f")
    elif direction == "nearest":
        db = ax - F.col("_c_axis_b")
        df_ = F.col("_c_axis_f") - ax
        use_b = F.col("_c_axis_f").isNull() | (
            F.col("_c_axis_b").isNotNull() & (db <= df_)
        )
        dist = F.when(use_b, db).otherwise(df_)
        pick = {
            v: F.when(use_b, F.col(f"_c_{v}_b")).otherwise(F.col(f"_c_{v}_f"))
            for v in vals
        }
        pick_axis = F.when(use_b, F.col("_c_axis_b")).otherwise(F.col("_c_axis_f"))
    else:
        raise ValueError(f"direction must be backward/forward/nearest: {direction}")

    ok = pick_axis.isNotNull()
    if tolerance is not None:
        ok = ok & (dist <= tolerance)
    joined = out.select(
        *keys, axis_col,
        *[F.when(ok, pick[v]).alias(f"{v}{suffix}") for v in vals],
        F.when(ok, pick_axis).alias(f"{axis_col}{suffix}"),
    )
    # re-attach any non-key left columns via the unique (key, axis)
    extra = [c for c in left.columns if c not in keys + [axis_col]]
    if extra:
        return left.join(joined, on=keys + [axis_col], how="left")
    return joined


def nearest_value(
    df: DataFrame,
    probes: DataFrame,
    axis_col: str = "pos",
    key_cols: Sequence[str] = KEY_COLS,
    value_col: str = "value",
) -> DataFrame:
    """find_nearest_val (funcs.py:44-48): for each probe row, the data
    row with the minimum |axis distance| (nearest as-of join)."""
    return asof_join(
        probes, df, axis_col=axis_col, key_cols=key_cols,
        value_cols=(value_col,), direction="nearest", suffix="_nearest",
    )


def winsorize_percentiles(
    df: DataFrame,
    value_col: str,
    p_lo: float = 0.05,
    p_hi: float = 0.95,
    key_cols: Sequence[str] = (),
    out_col: str | None = None,
) -> DataFrame:
    """Percentile clipping (frames.py:671-676): clamp values outside
    [P(p_lo), P(p_hi)] per key — one exact-percentile aggregate joined
    back (no whole-input window)."""
    keys = list(key_cols)
    out_col = out_col or f"{value_col}_winsorized"
    v = F.col(value_col)
    bounds = (df.groupBy(*keys) if keys else df.groupBy()).agg(
        F.percentile(v, F.lit(float(p_lo))).alias("_w_lo"),
        F.percentile(v, F.lit(float(p_hi))).alias("_w_hi"),
    )
    if keys:
        j = df.join(bounds, on=keys, how="left")
    else:
        j = df.crossJoin(F.broadcast(bounds))
    clipped = F.when(v < F.col("_w_lo"), F.col("_w_lo")).when(
        v > F.col("_w_hi"), F.col("_w_hi")
    ).otherwise(v)
    return j.withColumn(out_col, clipped).drop("_w_lo", "_w_hi")


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    point_ts: str = "ts",
    start_col: str = "start",
    end_col: str = "end",
    key_cols: Sequence[str] = (),
    bin_width: float | None = None,
    how: str = "inner",
) -> DataFrame:
    """Point-in-interval range join (df_between_two_dates /
    similarity-window idiom, frames.py:480-501 generalized to an
    interval TABLE instead of one driver-side range).

    Scale shape: a raw theta-join on ``start <= ts <= end`` lowers to
    BroadcastNestedLoop — O(|points| * |intervals|).  Instead both
    sides are bucketized on the axis: intervals explode to the bins
    they cover, points land in exactly one bin, and the join becomes an
    EQUI-join on (keys, bin) + an exact containment filter.  With
    ``bin_width >= max interval length`` (the default, one tiny
    aggregate) each interval covers <= 2 bins, so the candidate set is
    ~2 rows per interval per bin neighborhood — shuffle-bounded, skew
    governed by bin population, AQE-splittable.  No duplicate pairs:
    a point matches an interval in the point's own bin only.

    Timestamps are compared on their epoch-seconds double (exact for
    the parquet micros range); numeric axes pass through.  ``how`` is
    ``inner`` or ``left`` (unmatched points kept with null interval
    columns).
    """
    if how not in ("inner", "left"):
        raise ValueError(f"how must be inner|left, got {how}")
    keys = list(key_cols)

    def ax(df, c):
        # numeric axis for binning: epoch seconds for timestamp columns
        # (tz interpretation is irrelevant — only monotone + consistent
        # across both sides matters), raw double otherwise
        if df.schema[c].dataType.typeName().startswith("timestamp"):
            return F.unix_micros(F.col(c).cast("timestamp")) / F.lit(1e6)
        return F.col(c).cast("double")

    if bin_width is None:
        bin_width = (
            intervals.agg(
                F.max(ax(intervals, end_col) - ax(intervals, start_col)).alias("m")
            ).first()["m"]
            or 1.0
        )
        bin_width = max(float(bin_width), 1e-9)
    b = F.lit(float(bin_width))
    pts = points.withColumn("_bin", F.floor(ax(points, point_ts) / b))
    ivs = intervals.withColumn(
        "_bin",
        F.explode(
            F.sequence(
                F.floor(ax(intervals, start_col) / b),
                F.floor(ax(intervals, end_col) / b),
            )
        ),
    )
    # exact containment on the native column types
    contained = (F.col(point_ts) >= F.col(start_col)) & (
        F.col(point_ts) <= F.col(end_col)
    )
    if how == "inner":
        return pts.join(ivs, on=keys + ["_bin"], how="inner").where(
            contained
        ).drop("_bin")
    # left: unmatched points re-attached via an internal row id (point
    # rows need not be distinct)
    pts = pts.withColumn("_pid", F.monotonically_increasing_id())
    matched = pts.join(ivs, on=keys + ["_bin"], how="inner").where(contained)
    iv_cols = [c for c in ivs.columns if c not in set(keys + ["_bin"])]
    empties = pts.join(matched.select("_pid"), on="_pid", how="left_anti")
    for c in iv_cols:
        empties = empties.withColumn(c, F.lit(None).cast(dict(ivs.dtypes)[c]))
    return matched.drop("_bin", "_pid").unionByName(empties.drop("_bin", "_pid"))


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: Sequence[str],
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skew-spreading equi-join for when the big side has hot keys and
    the small side is too large to broadcast: the big side gets a
    random-per-row salt, the small side is REPLICATED n_salts times
    (explode over the salt range), and the join key becomes
    (keys..., salt) — each hot key now spreads over ``n_salts``
    reducers instead of one straggler task.

    Complements ``salted_source_agg`` (tiers.py) on the join side; AQE
    skew-join splitting covers the same ground reactively, this is the
    deterministic-layout variant for planned-hot keys.  The salt is
    derived from the big side's full row hash — any uniform spreader
    works because the small side carries every salt value.

    Only ``inner`` and ``left`` (big-preserving) joins are supported:
    with right/full, small-side rows with no big-side match would
    surface once per salt replica as n_salts duplicate null-padded
    rows.
    """
    if how not in ("inner", "left"):
        raise ValueError(
            f"salted_join supports how in ('inner', 'left'); got {how!r} — "
            "the replicated small side would emit one null-padded row per "
            "salt for unmatched small-side keys"
        )
    keys = list(on)
    salt_mod = F.lit(int(n_salts))
    b = big.withColumn(
        "_salt", F.pmod(F.xxhash64(*[F.col(c) for c in big.columns]), salt_mod)
    )
    s = small.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), salt_mod - 1))
    )
    return b.join(s, on=keys + ["_salt"], how=how).drop("_salt")
