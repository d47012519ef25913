"""Circular (wind-direction) aggregation — Kanda method.

Reference: diive/core/funcs/funcs.py:52-85 ``winddirection_agg_kanda``:
aggregate sin/cos components, take atan2, wrap negatives into [0, 360).
``agg`` ∈ {mean, median, P25, P75} aggregates the components with the
matching statistic before the atan2.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column


def circular_agg(value_col: str, agg: str = "mean") -> Column:
    """Aggregate expression: circular mean/median/quantile of angles in
    degrees.  Use inside ``groupBy(...).agg(circular_agg('wd'))``."""
    rad = F.radians(F.col(value_col))
    s, c = F.sin(rad), F.cos(rad)
    if agg == "mean":
        sa, ca = F.avg(s), F.avg(c)
    elif agg == "median":
        sa, ca = F.median(s), F.median(c)
    elif agg == "P25":
        sa, ca = F.percentile(s, F.lit(0.25)), F.percentile(c, F.lit(0.25))
    elif agg == "P75":
        sa, ca = F.percentile(s, F.lit(0.75)), F.percentile(c, F.lit(0.75))
    else:
        raise ValueError(f"unsupported circular agg: {agg}")
    deg = F.degrees(F.atan2(sa, ca))
    return (F.when(deg < 0, deg + 360).otherwise(deg)).alias(f"wd_{agg}")
