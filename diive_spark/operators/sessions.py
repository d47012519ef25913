"""Event sessionization: group per-key event streams into sessions
separated by inactivity gaps (the events-table analog of the series
gap-finder, gaps.py:gap_runs — reference GapFinder semantics
core/times/gapfinding.py applied to user activity).

Two Spark-first shapes:

- ``sessionize``: row-level session ids via gaps-and-islands — one
  window per key (lag + cumulative sum of boundary markers), no join.
  Keeps every event row, so downstream per-session transforms stay
  streaming-friendly.
- ``session_stats``: per-session aggregates via the built-in
  ``F.session_window`` (the same operator Structured Streaming uses
  for watermarked session merges) — one shuffle on the key, state
  merged by Catalyst's native session-window exec.

A new session starts when the gap to the previous event reaches
``gap_seconds`` (>=, matching session_window's merge rule — windows
[t, t+gap) that merely touch do NOT merge — and the DuckDB oracle
twin).
"""

from __future__ import annotations

from typing import Sequence

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window


def _epoch(c):
    """Epoch seconds (fractional) for timestamp-ish or numeric cols."""
    return F.unix_micros(F.col(c).cast("timestamp")) / F.lit(1e6)


def sessionize(
    df: DataFrame,
    ts_col: str = "ts",
    key_cols: Sequence[str] = ("user_id",),
    gap_seconds: float = 1800.0,
    out_col: str = "session_id",
) -> DataFrame:
    """Assign a per-key session ordinal (0-based) to every event row.
    Gaps-and-islands: boundary = gap to previous event >= gap_seconds
    (session_window semantics: touching windows do not merge);
    session id = running count of boundaries."""
    keys = list(key_cols)
    w = Window.partitionBy(*keys).orderBy(ts_col)
    prev = F.lag(_epoch(ts_col)).over(w)
    boundary = F.when(
        prev.isNull() | ((_epoch(ts_col) - prev) >= gap_seconds), 1
    ).otherwise(0)
    return df.withColumn(
        out_col,
        F.sum(boundary).over(
            w.rowsBetween(Window.unboundedPreceding, 0)
        ) - 1,
    )


def session_stats(
    df: DataFrame,
    ts_col: str = "ts",
    key_cols: Sequence[str] = ("user_id",),
    gap_seconds: float = 1800.0,
    agg_cols: dict | None = None,
) -> DataFrame:
    """Per-session aggregates via the native session_window operator:
    (keys, session_start, session_end, n_events, duration_s, + extras).
    ``agg_cols`` maps output name -> Column aggregate."""
    keys = list(key_cols)
    sw = F.session_window(F.col(ts_col), f"{gap_seconds} seconds")
    aggs = [F.count(F.lit(1)).alias("n_events")]
    for name, col in (agg_cols or {}).items():
        aggs.append(col.alias(name))
    out = df.groupBy(*keys, sw.alias("_sw")).agg(*aggs)
    return out.select(
        *keys,
        F.col("_sw.start").alias("session_start"),
        F.col("_sw.end").alias("session_end"),
        "n_events",
        *[c for c in (agg_cols or {})],
    )


def rolling_distinct_actors(
    df: DataFrame,
    window_days: int = 7,
    ts_col: str = "ts",
    actor_col: str = "user_id",
    key_cols: Sequence[str] = ("event_type",),
) -> DataFrame:
    """Trailing-N-day distinct-actor counts per key (the WAU/MAU
    product metric): for every day a key has activity, how many
    DISTINCT actors appeared in the trailing ``window_days`` window.

    Two-level shape: one shuffle builds the per-(key, day) actor SET
    (the day partial), then a day-RANGE window unions the trailing
    partials and counts distinct — the window slides over per-day
    summaries, never over raw events.  This is exact; at actor
    cardinalities where a day's set no longer fits a row, swap the
    collect_set partial for the tier family's HLL sketch column
    (resample.distinct_col + hll_union_agg — same compose algebra,
    documented 5% error) without changing the window shape.

    Emits: key cols, ``day`` (yyyy-MM-dd), ``n_day`` (distinct that
    day), ``n_window`` (distinct over the trailing window),
    ``days_covered`` (how many active days the window actually holds,
    <= window_days).
    """
    if window_days < 1:
        raise ValueError(f"window_days must be >= 1, got {window_days}")
    keys = list(key_cols)
    d = df.select(
        *keys,
        F.to_date(F.col(ts_col)).alias("_day"),
        F.col(actor_col).alias("_actor"),
    )
    daily = d.groupBy(*keys, "_day").agg(
        F.collect_set("_actor").alias("_set")
    )
    daynum = F.datediff(F.col("_day"), F.lit("1970-01-01"))
    w = (
        Window.partitionBy(*keys)
        .orderBy(daynum)
        .rangeBetween(-(window_days - 1), 0)
    )
    return daily.select(
        *keys,
        F.date_format("_day", "yyyy-MM-dd").alias("day"),
        F.size("_set").cast("long").alias("n_day"),
        F.size(
            F.array_distinct(F.flatten(F.collect_list("_set").over(w)))
        )
        .cast("long")
        .alias("n_window"),
        F.count(F.lit(1)).over(w).cast("long").alias("days_covered"),
    )


def scd2_history(
    df: DataFrame,
    attr_cols: Sequence[str],
    ts_col: str = "ts",
    key_cols: Sequence[str] = ("user_id",),
    current_end: str = "9999-12-31 00:00:00",
) -> DataFrame:
    """Slowly-changing-dimension type-2 history build (Kimball, The
    Data Warehouse Toolkit ch.5): collapse an UPDATE STREAM of
    attribute observations into validity intervals — one row per
    (key, attribute-state run) with ``valid_from`` / ``valid_to`` /
    ``version`` / ``is_current``.  Consecutive observations with
    identical attributes merge into one interval; each change closes
    the previous interval at the new row's timestamp (end-exclusive
    convention).

    Null-safe change detection (``eqNullSafe``): a null attribute is a
    VALUE, so null->x and x->null are changes while null->null is
    not.  Ties on ``ts_col`` within a key are broken by the attribute
    tuple (deterministic across engines); the run logic is
    gaps-and-islands — one ordered window pass + one aggregate, both
    on the key exchange, no join and no collect.

    ``current_end`` stamps the open interval (the warehouse
    convention of a far-future sentinel keeps BETWEEN point-in-time
    lookups index-friendly — the as-of join in joins.py accepts
    either form).
    """
    keys = list(key_cols)
    attrs = list(attr_cols)
    if not attrs:
        raise ValueError("attr_cols must be non-empty")
    w = Window.partitionBy(*keys).orderBy(ts_col, *attrs)
    changed = F.lit(False)
    for a in attrs:
        changed = changed | ~F.col(a).eqNullSafe(F.lag(a).over(w))
    first = F.row_number().over(w) == 1
    marked = df.withColumn(
        "_brk", F.when(first | changed, 1).otherwise(0)
    ).withColumn(
        "_run",
        F.sum("_brk").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    runs = marked.groupBy(*keys, "_run", *attrs).agg(
        F.min(ts_col).alias("valid_from"),
        F.count(F.lit(1)).cast("long").alias("n_obs"),
    )
    w2 = Window.partitionBy(*keys).orderBy("_run")
    nxt = F.lead("valid_from").over(w2)
    return runs.select(
        *keys,
        *attrs,
        "valid_from",
        F.coalesce(nxt, F.lit(current_end).cast("timestamp")).alias(
            "valid_to"
        ),
        F.col("_run").cast("long").alias("version"),
        nxt.isNull().alias("is_current"),
        "n_obs",
    )


def session_type_affinity(
    df: DataFrame,
    gap_seconds: float = 1800.0,
    ts_col: str = "ts",
    type_col: str = "event_type",
    key_cols: Sequence[str] = ("user_id",),
) -> DataFrame:
    """Session-level co-occurrence affinity between event types
    (market-basket lift / pointwise mutual information, Church & Hanks
    1990; baskets = inactivity-gap sessions from :func:`sessionize`):
    which behaviours travel together within a visit, beyond what their
    base rates predict.

        lift(a,b) = P(a,b) / (P(a) P(b))
                  = n_ab * S / (n_a * n_b)     over S sessions
        pmi(a,b)  = ln lift(a,b)

    Emits one row per unordered type pair observed together at least
    once: ``type_a < type_b``, ``n_a``, ``n_b``, ``n_ab``, ``n_sessions``,
    ``lift``, ``pmi``.  Counts are exact integers (distinct
    session-type presence), so everything but the final ``ln`` is
    order-independent-exact across engines.

    Scale shape: sessionization's one ordered window, then the pair
    explode runs over PER-SESSION TYPE SETS (<= distinct-types-squared
    per session, never events), and the count tables are bounded by
    the type vocabulary squared — KBs at any event volume.
    """
    keys = list(key_cols)
    s = sessionize(df, ts_col=ts_col, key_cols=keys, gap_seconds=gap_seconds)
    sess = s.select(*keys, "session_id", F.col(type_col).alias("_y"))
    per = sess.groupBy(*keys, "session_id").agg(
        F.array_sort(F.collect_set("_y")).alias("_ys")
    )
    n_sessions = per.count()
    singles = {
        r["_y"]: r["c"]
        for r in per.select(F.explode("_ys").alias("_y"))
        .groupBy("_y")
        .agg(F.count(F.lit(1)).alias("c"))
        .collect()
    }
    pairs = per.select(
        F.explode(
            F.flatten(
                F.transform(
                    F.col("_ys"),
                    lambda a, i: F.transform(
                        F.slice(
                            F.col("_ys"), i + 2,
                            F.greatest(
                                F.size("_ys") - i - 1, F.lit(1)
                            ),
                        ),
                        lambda b: F.struct(
                            a.alias("ta"), b.alias("tb")
                        ),
                    ),
                )
            )
        ).alias("_p")
    )
    ab = pairs.groupBy(
        F.col("_p.ta").alias("type_a"), F.col("_p.tb").alias("type_b")
    ).agg(F.count(F.lit(1)).cast("long").alias("n_ab"))
    sm = F.create_map(
        *[x for k, v in sorted(singles.items()) for x in (F.lit(k), F.lit(v))]
    )
    n_a = F.element_at(sm, F.col("type_a")).cast("long")
    n_b = F.element_at(sm, F.col("type_b")).cast("long")
    lift = (
        F.col("n_ab").cast("double") * F.lit(float(n_sessions))
    ) / (n_a.cast("double") * n_b.cast("double"))
    return ab.select(
        "type_a", "type_b",
        n_a.alias("n_a"), n_b.alias("n_b"), "n_ab",
        F.lit(int(n_sessions)).cast("long").alias("n_sessions"),
        lift.alias("lift"),
        F.log(lift).alias("pmi"),
    )
