"""Driver-contract query catalog: Spark implementations (library-backed)
paired with DuckDB oracle SQL twins.

Every SQL-expressible operator from SURVEY.md §2 gets a (queries entry,
oracle_sql entry) pair; the driver runs both at sf=0.01 and compares
row-count + schema + order-insensitive value hash.  Column names are
aligned on both sides; every float is rounded to 6 decimals on both
sides so cross-engine summation-order noise cannot flip the hash.

The time-series operators run over a *derived series view* of the
``events`` table, built identically in Spark and SQL:

    source  = event_type
    doc_id  = CAST(user_id % 8 AS STRING)
    pos     = row_number() over (partition by source, doc_id
                                 order by event_id) - 1
    value   = NULL where value < 5.0 (deterministic ~10% gaps) else value

Non-SQL-expressible ops (Gorilla codec round trip, MinHash/SimHash LSH,
embedding LSH, tier-store resume) are registered without oracle SQL —
the driver records a rows-only check for them.
"""

from __future__ import annotations

import math

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from .operators import analyses, corrections, dedup, gaps, outliers, qcf, resample
from .operators import forecast, scrub, similarity, spectral, textstats

KEYS = ["source", "doc_id"]

# ---------------------------------------------------------------- helpers
SERIES_SQL = """
    SELECT event_type AS source,
           CAST(user_id % 8 AS VARCHAR) AS doc_id,
           CAST(row_number() OVER (PARTITION BY event_type, user_id % 8
                                   ORDER BY event_id) AS BIGINT) - 1 AS pos,
           CASE WHEN value < 5.0 THEN NULL ELSE value END AS value
    FROM events
"""


def series(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    w = Window.partitionBy("source", "doc_id").orderBy("event_id")
    return (
        ev.select(
            F.col("event_type").alias("source"),
            F.pmod(F.col("user_id"), F.lit(8)).cast("string").alias("doc_id"),
            "event_id",
            "value",
        )
        .withColumn("pos", F.row_number().over(w) - 1)
        .withColumn(
            "value",
            F.when(F.col("value") < 5.0, F.lit(None).cast("double")).otherwise(
                F.col("value")
            ),
        )
        .select("source", "doc_id", "pos", "value")
    )


def _r(col, n=6):
    return F.round(col, n)


def _load(spark, sf_dir, name):
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


# ================================================================ queries
def q_rollup(spark, sf_dir):
    """Min-count-gated bucket rollup (resample_series_to_30MIN semantics,
    reference diive/core/times/resampling.py:13-132)."""
    out = resample.bucket_rollup(
        series(spark, sf_dir), every=60, mincounts_perc=0.25, min_floor_rule=True
    )
    return out.select(
        "source", "doc_id", "bin_start", "n",
        _r(F.col("mean")).alias("mean"),
        _r(F.col("sd")).alias("sd"),
        _r(F.col("min")).alias("min_v"),
        _r(F.col("max")).alias("max_v"),
        _r(F.col("sum")).alias("sum_v"),
    )


SQL_ROLLUP = f"""
WITH series AS ({SERIES_SQL}),
binned AS (
  SELECT source, doc_id, CAST(floor(pos / 60) * 60 AS BIGINT) AS bin_start, value
  FROM series),
agg AS (
  SELECT source, doc_id, bin_start,
         count(value) AS n, count(*) AS n_grid,
         avg(value) AS mean, stddev_samp(value) AS sd,
         min(value) AS min_v, max(value) AS max_v, sum(value) AS sum_v
  FROM binned GROUP BY 1, 2, 3),
gated AS (
  SELECT *,
         CAST(floor(max(n_grid) OVER (PARTITION BY source, doc_id) * 0.25) AS BIGINT)
           AS minc
  FROM agg)
SELECT source, doc_id, bin_start, n,
       round(mean, 6) AS mean, round(sd, 6) AS sd,
       round(min_v, 6) AS min_v, round(max_v, 6) AS max_v,
       round(sum_v, 6) AS sum_v
FROM gated
WHERE n >= (CASE WHEN minc < 3 THEN 1 ELSE minc END)
"""


def q_rollup_compose(spark, sf_dir):
    """Tier composition: 720-bucket built from 60-bucket partials must
    equal the direct rollup (SURVEY.md §7.1 M2)."""
    t1 = resample.bucket_rollup(
        series(spark, sf_dir), every=60, mincounts_perc=0.0, min_floor_rule=False
    )
    t2 = resample.compose_rollup(t1, every=720, mincounts_perc=0.25)
    return t2.select(
        "source", "doc_id", "bin_start", "n",
        _r(F.col("mean")).alias("mean"),
        _r(F.col("sd")).alias("sd"),
    )


SQL_ROLLUP_COMPOSE = f"""
WITH series AS ({SERIES_SQL}),
agg AS (
  SELECT source, doc_id, CAST(floor(pos / 720) * 720 AS BIGINT) AS bin_start,
         count(value) AS n, count(*) AS n_grid,
         avg(value) AS mean, stddev_samp(value) AS sd
  FROM series GROUP BY 1, 2, 3),
gated AS (
  SELECT *, CAST(floor(max(n_grid) OVER (PARTITION BY source, doc_id) * 0.25) AS BIGINT) AS minc
  FROM agg)
SELECT source, doc_id, bin_start, n, round(mean, 6) AS mean, round(sd, 6) AS sd
FROM gated WHERE n >= (CASE WHEN minc < 3 THEN 1 ELSE minc END)
"""


def q_sstats(spark, sf_dir):
    """Stats battery (diive/core/dfun/stats.py:70-103) per source."""
    out = analyses.sstats(series(spark, sf_dir), key_cols=["source"])
    return out.select(
        "source", "nov", "missing",
        _r(F.col("missing_perc")).alias("missing_perc"),
        _r(F.col("mean")).alias("mean"),
        _r(F.col("sd")).alias("sd"),
        _r(F.col("var")).alias("var_v"),
        _r(F.col("sum")).alias("sum_v"),
        _r(F.col("median")).alias("median"),
        _r(F.col("min")).alias("min_v"),
        _r(F.col("max")).alias("max_v"),
        _r(F.col("p05")).alias("p05"),
        _r(F.col("p95")).alias("p95"),
    )


SQL_SSTATS = f"""
WITH series AS ({SERIES_SQL})
SELECT source,
       count(value) AS nov,
       count(*) - count(value) AS missing,
       round((count(*) - count(value)) * 100.0 / count(*), 6) AS missing_perc,
       round(avg(value), 6) AS mean,
       round(stddev_samp(value), 6) AS sd,
       round(var_samp(value), 6) AS var_v,
       round(sum(value), 6) AS sum_v,
       round(quantile_cont(value, 0.5), 6) AS median,
       round(min(value), 6) AS min_v,
       round(max(value), 6) AS max_v,
       round(quantile_cont(value, 0.05), 6) AS p05,
       round(quantile_cont(value, 0.95), 6) AS p95
FROM series GROUP BY source
"""


def q_percentile_ladder(spark, sf_dir):
    """Integer-percentile ladder 0..100 (quantiles.py:8-31) on
    lineitem.l_extendedprice."""
    li = _load(spark, sf_dir, "lineitem")
    out = analyses.percentile_ladder(li, value_col="l_extendedprice")
    return out.select(
        F.col("percentile").cast("int").alias("percentile"),
        _r(F.col("value")).alias("value"),
    )


_FRACTIONS = ", ".join(f"{i / 100.0:.2f}" for i in range(101))
SQL_PERCENTILE_LADDER = f"""
WITH q AS (SELECT quantile_cont(l_extendedprice, [{_FRACTIONS}]) AS v
           FROM lineitem)
SELECT CAST(generate_subscripts(v, 1) - 1 AS INTEGER) AS percentile,
       round(unnest(v), 6) AS value
FROM q
"""


def q_histogram(spark, sf_dir):
    """np.histogram-convention histogram (histogram.py:14-122) of
    events.value, 20 bins over the global [min, max]."""
    ev = _load(spark, sf_dir, "events")
    out = analyses.histogram(ev, n_bins=20, value_col="value")
    return out.select(
        F.col("bin_idx").cast("long").alias("bin_idx"),
        "count",
        _r(F.col("bin_lo")).alias("bin_lo"),
    )


SQL_HISTOGRAM = """
WITH b AS (SELECT min(value) AS lo, max(value) AS hi FROM events)
SELECT CAST(least(floor((value - lo) / ((hi - lo) / 20)), 19) AS BIGINT) AS bin_idx,
       count(*) AS count,
       round(lo + least(floor((value - lo) / ((hi - lo) / 20)), 19)
                * (hi - lo) / 20, 6) AS bin_lo
FROM events, b
WHERE value IS NOT NULL
GROUP BY 1, 3
"""


def q_gapfinder(spark, sf_dir):
    """Gaps-and-islands run table (gapfinder.py:58-95), gaps <= 5."""
    return gaps.gap_runs(series(spark, sf_dir), limit=5).select(
        "source", "doc_id", "gap_start", "gap_end", "gap_length"
    )


SQL_GAPFINDER = f"""
WITH series AS ({SERIES_SQL}),
runs AS (
  SELECT *, count(CASE WHEN value IS NOT NULL THEN 1 END)
              OVER (PARTITION BY source, doc_id ORDER BY pos
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS run_id
  FROM series)
SELECT source, doc_id, min(pos) AS gap_start, max(pos) AS gap_end,
       count(*) AS gap_length
FROM runs WHERE value IS NULL
GROUP BY source, doc_id, run_id
HAVING count(*) <= 5
"""


def q_interpolate(spark, sf_dir):
    """Limit-gated linear interpolation (interpolate.py:8-35 intent):
    emit only the filled rows."""
    # derived series is dense (row_number-based pos) → fast path
    out = gaps.interpolate_limited(series(spark, sf_dir), limit=3, dense_grid=True)
    return out.where(F.col("value_gf_flag") == 1).select(
        "source", "doc_id", "pos", _r(F.col("value_gf")).alias("filled")
    )


SQL_INTERPOLATE = f"""
WITH series AS ({SERIES_SQL}),
runs AS (
  SELECT *, count(CASE WHEN value IS NOT NULL THEN 1 END)
              OVER (PARTITION BY source, doc_id ORDER BY pos
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS run_id
  FROM series),
glen AS (
  SELECT *, CASE WHEN value IS NULL THEN
      count(*) OVER (PARTITION BY source, doc_id, run_id,
                     CASE WHEN value IS NULL THEN 1 ELSE 0 END) END AS gap_len
  FROM runs),
ctx AS (
  SELECT *,
    last_value(value IGNORE NULLS) OVER
      (PARTITION BY source, doc_id ORDER BY pos
       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS prev_v,
    last_value(CASE WHEN value IS NOT NULL THEN pos END IGNORE NULLS) OVER
      (PARTITION BY source, doc_id ORDER BY pos
       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS prev_p,
    first_value(value IGNORE NULLS) OVER
      (PARTITION BY source, doc_id ORDER BY pos
       ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS next_v,
    first_value(CASE WHEN value IS NOT NULL THEN pos END IGNORE NULLS) OVER
      (PARTITION BY source, doc_id ORDER BY pos
       ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS next_p
  FROM glen)
SELECT source, doc_id, pos,
       round(prev_v + (next_v - prev_v) * (pos - prev_p)
             / (next_p - prev_p), 6) AS filled
FROM ctx
WHERE value IS NULL AND gap_len <= 3
  AND prev_v IS NOT NULL AND next_v IS NOT NULL
"""


def q_zscore(spark, sf_dir):
    """z-score flag, population std (funcs.py:37-41): rejected rows."""
    out = outliers.zscore_flag(series(spark, sf_dir), thres=2.5)
    return out.where(F.col("flag_zscore") == 2).select("source", "doc_id", "pos")


SQL_ZSCORE = f"""
WITH series AS ({SERIES_SQL}),
z AS (
  SELECT *, abs((value - avg(value) OVER w) / stddev_pop(value) OVER w) AS zs
  FROM series
  WINDOW w AS (PARTITION BY source, doc_id))
SELECT source, doc_id, pos FROM z WHERE zs > 2.5
"""


def q_zscore_increments(spark, sf_dir):
    """z-score on first differences (incremental.py:17-88)."""
    out = outliers.zscore_increments_flag(series(spark, sf_dir), thres=2.5)
    return out.where(F.col("flag_zscore_incr") == 2).select("source", "doc_id", "pos")


SQL_ZSCORE_INCR = f"""
WITH series AS ({SERIES_SQL}),
d AS (
  SELECT *, value - lag(value) OVER (PARTITION BY source, doc_id ORDER BY pos) AS incr
  FROM series),
z AS (
  SELECT *, abs((incr - avg(incr) OVER w) / stddev_pop(incr) OVER w) AS zs
  FROM d WINDOW w AS (PARTITION BY source, doc_id))
SELECT source, doc_id, pos
FROM z WHERE value IS NOT NULL AND incr IS NOT NULL AND zs > 2.5
"""


def q_localsd(spark, sf_dir):
    """LocalSD / Hampel flag (localsd.py:73-101): rejected rows.
    kernel=True — the Arrow pandas-rolling path, bit-identical to the
    JVM percentile window (parity-tested) and measured 2.5x faster;
    doc-bounded series make per-series kernels safe here."""
    out = outliers.local_sd_flag(series(spark, sf_dir), winsize=30, n_sd=3.0,
                                 kernel=True)
    return out.where(F.col("flag_localsd") == 2).select("source", "doc_id", "pos")


SQL_LOCALSD = f"""
WITH series AS ({SERIES_SQL}),
nn AS (SELECT * FROM series WHERE value IS NOT NULL),
r AS (
  SELECT *,
    median(value) OVER w AS rmed,
    stddev_samp(value) OVER w AS rsd,
    count(value) OVER w AS cnt
  FROM nn
  WINDOW w AS (PARTITION BY source, doc_id ORDER BY pos
               ROWS BETWEEN 15 PRECEDING AND 14 FOLLOWING))
SELECT source, doc_id, pos
FROM r
WHERE cnt >= 3 AND (value > rmed + 3.0 * rsd OR value < rmed - 3.0 * rsd)
"""


def q_abs_limits(spark, sf_dir):
    """Absolute limits flag (absolutelimits.py:191), counts per series."""
    out = outliers.abs_limits_flag(series(spark, sf_dir), lo=20.0, hi=200.0)
    return out.groupBy("source", "doc_id").agg(
        F.count(F.when(F.col("flag_abslim") == 2, 1)).alias("n_rejected"),
        F.count(F.when(F.col("flag_abslim") == 0, 1)).alias("n_ok"),
    )


SQL_ABS_LIMITS = f"""
WITH series AS ({SERIES_SQL})
SELECT source, doc_id,
       count(CASE WHEN value < 20.0 OR value > 200.0 THEN 1 END) AS n_rejected,
       count(CASE WHEN value >= 20.0 AND value <= 200.0 THEN 1 END) AS n_ok
FROM series GROUP BY 1, 2
"""


def q_qcf(spark, sf_dir):
    """QCF combiner truth table (qcf.py:241-292) over deterministic flag
    exprs; per-source qcf counts."""
    s = series(spark, sf_dir)
    flagged = (
        s.withColumn("f1", F.when(F.col("value").isNull(), None)
                     .when(F.col("value") > 180.0, 2).otherwise(0))
        .withColumn("f2", F.when(F.col("value").isNull(), None)
                    .when(F.col("value") > 120.0, 1).otherwise(0))
        .withColumn("f3", F.when(F.col("value").isNull(), None)
                    .when(F.col("pos") % 7 == 0, 1).otherwise(0))
    )
    out = qcf.qcf_flag(flagged, ["f1", "f2", "f3"])
    return out.groupBy("source", "qcf").agg(F.count(F.lit(1)).alias("n"))


SQL_QCF = f"""
WITH series AS ({SERIES_SQL}),
flags AS (
  SELECT *,
    CASE WHEN value IS NULL THEN NULL WHEN value > 180.0 THEN 2 ELSE 0 END AS f1,
    CASE WHEN value IS NULL THEN NULL WHEN value > 120.0 THEN 1 ELSE 0 END AS f2,
    CASE WHEN value IS NULL THEN NULL WHEN pos % 7 = 0 THEN 1 ELSE 0 END AS f3
  FROM series),
sums AS (
  SELECT *,
    (CASE WHEN f1 = 2 THEN 2 ELSE 0 END + CASE WHEN f2 = 2 THEN 2 ELSE 0 END
       + CASE WHEN f3 = 2 THEN 2 ELSE 0 END) AS hard,
    (CASE WHEN f1 = 1 THEN 1 ELSE 0 END + CASE WHEN f2 = 1 THEN 1 ELSE 0 END
       + CASE WHEN f3 = 1 THEN 1 ELSE 0 END) AS soft
  FROM flags),
q AS (
  SELECT *,
    CASE WHEN soft >= 1 AND soft <= 3 AND hard = 0 THEN 1
         WHEN hard >= 2 THEN 2
         WHEN soft > 3 THEN 2
         WHEN hard + soft = 0 THEN 0
         ELSE NULL END AS qcf
  FROM sums)
SELECT source, qcf, count(*) AS n FROM q GROUP BY 1, 2
"""


def q_daily_corr(spark, sf_dir):
    """Per-day Pearson correlation (correlation.py:8-55) of lineitem
    quantity vs extended price."""
    li = _load(spark, sf_dir, "lineitem")
    out = li.groupBy(F.to_date("l_shipdate").alias("day")).agg(
        _r(F.corr("l_quantity", "l_extendedprice")).alias("r"),
        F.count(F.lit(1)).alias("n"),
    )
    return out.select(F.col("day").cast("string").alias("day"), "r", "n")


SQL_DAILY_CORR = """
SELECT CAST(CAST(l_shipdate AS DATE) AS VARCHAR) AS day,
       round(corr(l_quantity, l_extendedprice), 6) AS r,
       count(*) AS n
FROM lineitem GROUP BY 1
"""


def q_diel_cycle(spark, sf_dir):
    """Diel-cycle aggregation (co2_penalty.py:386-393): phase = pos % 24."""
    out = analyses.diel_cycle(series(spark, sf_dir), period=24, key_cols=["source"])
    return out.select(
        "source", "phase", _r(F.col("mean")).alias("mean"),
        _r(F.col("sd")).alias("sd"), "n",
    )


SQL_DIEL = f"""
WITH series AS ({SERIES_SQL})
SELECT source, pos % 24 AS phase,
       round(avg(value), 6) AS mean,
       round(stddev_samp(value), 6) AS sd,
       count(value) AS n
FROM series GROUP BY 1, 2
"""


def q_circular_mean(spark, sf_dir):
    """Kanda circular mean (funcs.py:52-85) of a derived wind direction
    per event_type."""
    ev = _load(spark, sf_dir, "events")
    wd = ev.withColumn("wd", F.pmod(F.col("value") * 7.3, F.lit(360.0)))
    from .functions.circular import circular_agg

    return wd.groupBy(F.col("event_type").alias("source")).agg(
        _r(circular_agg("wd", "mean")).alias("wd_mean")
    )


SQL_CIRCULAR = """
SELECT event_type AS source,
       round(CASE WHEN degrees(atan2(avg(sin(radians(((value * 7.3) % 360 + 360) % 360))),
                                     avg(cos(radians(((value * 7.3) % 360 + 360) % 360))))) < 0
                  THEN degrees(atan2(avg(sin(radians(((value * 7.3) % 360 + 360) % 360))),
                                     avg(cos(radians(((value * 7.3) % 360 + 360) % 360))))) + 360
                  ELSE degrees(atan2(avg(sin(radians(((value * 7.3) % 360 + 360) % 360))),
                                     avg(cos(radians(((value * 7.3) % 360 + 360) % 360))))) END, 6)
         AS wd_mean
FROM events GROUP BY 1
"""


def q_setto_threshold(spark, sf_dir):
    """Threshold clamp correction (setto_threshold.py:9-73): per-source
    corrected count + post-clamp sum."""
    s = series(spark, sf_dir)
    out = corrections.setto_threshold(s, threshold=150.0, mode="above",
                                      flag_col="flag_thr")
    return out.groupBy("source").agg(
        F.count(F.when(F.col("flag_thr") == 1, 1)).alias("n_corrected"),
        _r(F.sum("value")).alias("sum_after"),
    )


SQL_SETTO_THRESHOLD = f"""
WITH series AS ({SERIES_SQL})
SELECT source,
       count(CASE WHEN value > 150.0 THEN 1 END) AS n_corrected,
       -- NB: DuckDB least() SKIPS NULLs, so spell the clamp out
       round(sum(CASE WHEN value > 150.0 THEN 150.0 ELSE value END), 6) AS sum_after
FROM series GROUP BY 1
"""


def q_dedup_keep_last(spark, sf_dir):
    """Dedup keep-last (times.py:802-819): events deduped on
    (user_id, ts) keeping the highest event_id; per-user kept count."""
    ev = _load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id", "ts").orderBy(F.col("event_id").desc())
    kept = ev.withColumn("_rn", F.row_number().over(w)).where(F.col("_rn") == 1)
    return kept.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.sum("event_id").alias("id_sum"),
    )


SQL_DEDUP_KEEP_LAST = """
WITH ranked AS (
  SELECT *, row_number() OVER (PARTITION BY user_id, ts ORDER BY event_id DESC) AS rn
  FROM events)
SELECT user_id, count(*) AS n_kept, CAST(sum(event_id) AS BIGINT) AS id_sum
FROM ranked WHERE rn = 1 GROUP BY 1
"""


def q_freq_detect(spark, sf_dir):
    """Frequency detection: mode of successive deltas + >=90% share rule
    (times.py:635-799, :792) over event timestamps per type."""
    ev = _load(spark, sf_dir, "events")
    t = ev.select(
        F.col("event_type").alias("source"),
        F.lit("all").alias("doc_id"),
        # ts is TIMESTAMP_NTZ in the parquet; cast via LTZ (session UTC)
        (F.unix_micros(F.col("ts").cast("timestamp")) + F.col("event_id")).alias("axis"),
    )
    from .operators.timegrid import detect_freq

    out = detect_freq(t, axis_col="axis", key_cols=["source", "doc_id"])
    return out.select(
        "source", "freq_mode", _r(F.col("mode_share")).alias("mode_share"), "n_deltas"
    )


SQL_FREQ_DETECT = """
WITH t AS (
  SELECT event_type AS source, epoch_us(ts) + event_id AS axis FROM events),
d AS (
  SELECT source, axis - lag(axis) OVER (PARTITION BY source ORDER BY axis) AS delta
  FROM t),
counts AS (
  SELECT source, delta, count(*) AS c FROM d WHERE delta IS NOT NULL GROUP BY 1, 2),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY source ORDER BY c DESC, delta) AS rk,
         CAST(sum(c) OVER (PARTITION BY source) AS BIGINT) AS tot
  FROM counts)
SELECT source, delta AS freq_mode, round(c * 1.0 / tot, 6) AS mode_share,
       tot AS n_deltas
FROM ranked WHERE rk = 1
"""


def q_grid_completion(spark, sf_dir):
    """Grid completion accounting (times.py:822-847): rows after
    reindexing onto the full [min,max] grid vs observed rows."""
    from .operators.timegrid import complete_grid

    s = series(spark, sf_dir)
    g = complete_grid(s, step=1)
    return g.groupBy("source", "doc_id").agg(
        F.count(F.lit(1)).alias("n_grid_rows"),
        F.count("value").alias("n_values"),
    )


SQL_GRID_COMPLETION = f"""
WITH series AS ({SERIES_SQL})
SELECT source, doc_id,
       max(pos) - min(pos) + 1 AS n_grid_rows,
       count(value) AS n_values
FROM series GROUP BY 1, 2
"""


def q_rolling_mean(spark, sf_dir):
    """Rolling mean over 10 records, min_periods=5 (frames.py:728-747):
    per-source checksum of the rolling column."""
    out = analyses.rolling_variants(series(spark, sf_dir), win=10, aggs=("mean",))
    return out.groupBy("source").agg(
        _r(F.sum("value_rollmean10")).alias("roll_sum"),
        F.count("value_rollmean10").alias("roll_n"),
    )


SQL_ROLLING_MEAN = f"""
WITH series AS ({SERIES_SQL}),
r AS (
  SELECT *,
    CASE WHEN count(value) OVER w >= 5 THEN avg(value) OVER w END AS roll
  FROM series
  WINDOW w AS (PARTITION BY source, doc_id ORDER BY pos
               ROWS BETWEEN 9 PRECEDING AND CURRENT ROW))
SELECT source, round(sum(roll), 6) AS roll_sum, count(roll) AS roll_n
FROM r GROUP BY 1
"""


def q_lookup_fill(spark, sf_dir):
    """Lookup-table gap fill (uncertainty.py:291-355 analog): filled
    values from the (source, pos-bucket) median table."""
    out = gaps.lookup_table_fill(series(spark, sf_dir), bucket=64, min_vals=5)
    return out.where(F.col("value").isNull() & F.col("value_ltf").isNotNull()).select(
        "source", "doc_id", "pos", _r(F.col("value_ltf")).alias("filled")
    )


SQL_LOOKUP_FILL = f"""
WITH series AS ({SERIES_SQL}),
lt AS (
  SELECT source, CAST(floor(pos / 64) AS BIGINT) AS bkt,
         quantile_cont(value, 0.5) AS fill_v, count(value) AS n
  FROM series WHERE value IS NOT NULL GROUP BY 1, 2)
SELECT s.source, s.doc_id, s.pos, round(lt.fill_v, 6) AS filled
FROM series s JOIN lt ON s.source = lt.source
                     AND CAST(floor(s.pos / 64) AS BIGINT) = lt.bkt
WHERE s.value IS NULL AND lt.n >= 5
"""


def q_exact_dedup_docs(spark, sf_dir):
    """Exact dedup on documents (hash-groupBy keep-first)."""
    docs = _load(spark, sf_dir, "documents")
    out = dedup.exact_dedup(docs, text_col="text", id_col="doc_id")
    return out.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_unique"),
        F.sum("dup_count").alias("covered"),
    )


SQL_EXACT_DEDUP = """
WITH ranked AS (
  SELECT *, row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn,
         count(*) OVER (PARTITION BY md5(text)) AS dup_count
  FROM documents)
SELECT source, count(*) AS n_unique, CAST(sum(dup_count) AS BIGINT) AS covered
FROM ranked WHERE rn = 1 GROUP BY 1
"""


def q_token_count(spark, sf_dir):
    """Token counting (whitespace + BPE-ish regex + chars/4)."""
    docs = _load(spark, sf_dir, "documents")
    out = textstats.token_count(docs)
    return out.select(
        "doc_id", F.col("tok_ws").cast("long").alias("tok_ws"),
        F.col("tok_bpe").cast("long").alias("tok_bpe"),
        _r(F.col("tok_chars4")).alias("tok_chars4"),
    )


SQL_TOKEN_COUNT = r"""
SELECT doc_id,
       CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT) AS tok_ws,
       CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) AS BIGINT)
         AS tok_bpe,
       round(length(text) / 4.0, 6) AS tok_chars4
FROM documents
"""


def q_lang_id(spark, sf_dir):
    """Stopword-hit language ID heuristic: predicted language counts."""
    docs = _load(spark, sf_dir, "documents")
    out = textstats.language_id(docs)
    return out.groupBy("lang_pred").agg(F.count(F.lit(1)).alias("n"))


def _sql_lang_hits(lang: str, words: list[str]) -> str:
    arr = ", ".join(f"'{w}'" for w in words)
    return (
        f"len(list_filter(regexp_split_to_array(lower(trim(text)), '\\s+'), "
        f"w -> list_contains([{arr}], w))) * 1.0 / "
        f"greatest(len(regexp_split_to_array(lower(trim(text)), '\\s+')), 1) AS hit_{lang}"
    )


SQL_LANG_ID = f"""
WITH hits AS (
  SELECT doc_id,
         {_sql_lang_hits('de', textstats.STOPWORDS['de'])},
         {_sql_lang_hits('en', textstats.STOPWORDS['en'])},
         {_sql_lang_hits('es', textstats.STOPWORDS['es'])},
         {_sql_lang_hits('fr', textstats.STOPWORDS['fr'])}
  FROM documents),
pred AS (
  SELECT doc_id,
    CASE WHEN greatest(hit_de, hit_en, hit_es, hit_fr) < 0.02 THEN 'und'
         WHEN hit_de = greatest(hit_de, hit_en, hit_es, hit_fr) THEN 'de'
         WHEN hit_en = greatest(hit_de, hit_en, hit_es, hit_fr) THEN 'en'
         WHEN hit_es = greatest(hit_de, hit_en, hit_es, hit_fr) THEN 'es'
         ELSE 'fr' END AS lang_pred
  FROM hits)
SELECT lang_pred, count(*) AS n FROM pred GROUP BY 1
"""


def q_quality_features(spark, sf_dir):
    """Quality-score features (length/punct/digit ratios)."""
    docs = _load(spark, sf_dir, "documents")
    out = textstats.quality_score(docs)
    return out.select(
        "doc_id",
        F.col("n_words").cast("long").alias("n_words"),
        _r(F.col("mean_word_len")).alias("mean_word_len"),
        _r(F.col("digit_ratio")).alias("digit_ratio"),
    )


SQL_QUALITY_FEATURES = r"""
SELECT doc_id,
       CAST(len(regexp_split_to_array(lower(trim(text)), '\s+')) AS BIGINT) AS n_words,
       round(length(text) * 1.0
             / greatest(len(regexp_split_to_array(lower(trim(text)), '\s+')), 1), 6)
         AS mean_word_len,
       round((length(text) - length(regexp_replace(text, '[0-9]', '', 'g'))) * 1.0
             / greatest(length(text), 1), 6) AS digit_ratio
FROM documents
"""


def q_repetition_features(spark, sf_dir):
    """Gopher-style repetition filters (dup n-gram fractions, top-bigram
    share, symbol ratio) — per-doc JVM array expressions, hash-checked
    against a groupBy-based SQL twin."""
    docs = _load(spark, sf_dir, "documents")
    out = textstats.repetition_features(docs)
    return out.select(
        "doc_id",
        _r(F.col("dup_ngram_frac_2")).alias("dup2"),
        _r(F.col("dup_ngram_frac_3")).alias("dup3"),
        _r(F.col("top_bigram_frac")).alias("top_bigram"),
        _r(F.col("symbol_word_ratio")).alias("symbol_ratio"),
        F.col("repetition_flag").cast("long").alias("rep_flag"),
    )


SQL_REPETITION = r"""
WITH w AS (
  SELECT doc_id, text, regexp_split_to_array(lower(trim(text)), '\s+') AS ws
  FROM documents),
g AS (
  SELECT doc_id, text,
         list_transform(range(1, greatest(len(ws) - 1, 1) + 1),
           i -> array_to_string(list_slice(ws, i, i + 1), ' ')) AS bi,
         list_transform(range(1, greatest(len(ws) - 2, 1) + 1),
           i -> array_to_string(list_slice(ws, i, i + 2), ' ')) AS tri,
         greatest(len(ws), 1) AS nw
  FROM w),
top AS (
  SELECT doc_id, max(c) * 1.0 / sum(c) AS top_bigram_frac
  FROM (SELECT doc_id, b, count(*) AS c
        FROM (SELECT doc_id, unnest(bi) AS b FROM g) GROUP BY 1, 2)
  GROUP BY 1),
feats AS (
  SELECT g.doc_id,
         len(bi) AS n_bi,
         (len(bi) - len(list_distinct(bi))) * 1.0 / greatest(len(bi), 1) AS dup2,
         (len(tri) - len(list_distinct(tri))) * 1.0 / greatest(len(tri), 1) AS dup3,
         (len(regexp_split_to_array(text, '\n'))
          - len(list_distinct(regexp_split_to_array(text, '\n')))) * 1.0
           / greatest(len(regexp_split_to_array(text, '\n')), 1) AS dup_line,
         len(regexp_extract_all(text, '#|\.\.\.|…')) * 1.0 / nw AS symbol_ratio,
         top.top_bigram_frac
  FROM g JOIN top ON g.doc_id = top.doc_id)
SELECT doc_id, round(dup2, 6) AS dup2, round(dup3, 6) AS dup3,
       round(top_bigram_frac, 6) AS top_bigram,
       round(symbol_ratio, 6) AS symbol_ratio,
       CAST(CASE WHEN dup_line > 0.30 OR dup2 > 0.20
                   OR (top_bigram_frac > 0.18 AND n_bi >= 5)
                   OR symbol_ratio > 0.10
                 THEN 1 ELSE 0 END AS BIGINT) AS rep_flag
FROM feats
"""


def q_pii_redaction(spark, sf_dir):
    """PII scrub: plant a deterministic email/IP/phone into every 10th
    doc, redact with RE2-portable regexes, hash-check the redacted text
    digests and per-kind match counts against the SQL twin."""
    docs = _load(spark, sf_dir, "documents")
    planted = F.when(
        F.col("doc_id") % 10 == 0,
        F.concat(
            F.col("text"),
            F.lit(" contact user"), F.col("doc_id").cast("string"),
            F.lit("@example.com from 10.0.0."),
            (F.col("doc_id") % 200 + 1).cast("string"),
            F.lit(" call +1 415 555 0100"),
        ),
    ).otherwise(F.col("text"))
    aug = docs.withColumn("text2", planted)
    red = scrub.redact_pii(aug, text_col="text2")
    return red.select(
        "doc_id",
        F.col("n_email").cast("long").alias("n_email"),
        F.col("n_ipv4").cast("long").alias("n_ipv4"),
        F.col("n_phone").cast("long").alias("n_phone"),
        F.md5(F.col("text_redacted")).alias("digest"),
    )


SQL_PII_REDACTION = r"""
WITH aug AS (
  SELECT doc_id,
         CASE WHEN doc_id % 10 = 0
              THEN text || ' contact user' || CAST(doc_id AS VARCHAR)
                   || '@example.com from 10.0.0.'
                   || CAST(doc_id % 200 + 1 AS VARCHAR)
                   || ' call +1 415 555 0100'
              ELSE text END AS t
  FROM documents)
SELECT doc_id,
  CAST(len(regexp_extract_all(t, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS BIGINT) AS n_email,
  CAST(len(regexp_extract_all(t, '\b([0-9]{1,3}\.){3}[0-9]{1,3}\b')) AS BIGINT) AS n_ipv4,
  CAST(len(regexp_extract_all(t, '\+?[0-9]{1,3}[-. ]?\(?[0-9]{3}\)?[-. ]?[0-9]{3}[-. ]?[0-9]{4}')) AS BIGINT) AS n_phone,
  md5(regexp_replace(regexp_replace(regexp_replace(t,
        '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
        '\b([0-9]{1,3}\.){3}[0-9]{1,3}\b', '<IPV4>', 'g'),
        '\+?[0-9]{1,3}[-. ]?\(?[0-9]{3}\)?[-. ]?[0-9]{3}[-. ]?[0-9]{4}', '<PHONE>', 'g'))
    AS digest
FROM aug
"""


def q_stratified_sample(spark, sf_dir):
    """Deterministic stratified hash sampling (per-language quotas):
    kept-row counts per language under md5-bucket thresholds — the
    partitioning-independent corpus rebalancing primitive."""
    docs = _load(spark, sf_dir, "documents")
    rates = {"en": 0.5, "de": 1.0, "fr": 0.25, "es": 0.25, "zh": 0.1}
    kept = scrub.stratified_hash_sample(
        docs, rates, strata_col="lang", key_col="doc_id", seed=7
    )
    return kept.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.sum("doc_id").cast("long").alias("id_sum"),
    )


SQL_STRATIFIED_SAMPLE = """
WITH thr AS (
  SELECT * FROM (VALUES
    ('en', '80000000'), ('de', NULL), ('fr', '40000000'),
    ('es', '40000000'), ('zh', '19999999')) AS t(lang, hex_thr))
SELECT d.lang, CAST(count(*) AS BIGINT) AS n_kept,
       CAST(sum(d.doc_id) AS BIGINT) AS id_sum
FROM documents d JOIN thr ON d.lang = thr.lang
WHERE thr.hex_thr IS NULL  -- rate >= 1.0 keeps ALL keys (no edge-bucket loss)
   OR substr(md5('7:' || CAST(d.doc_id AS VARCHAR)), 1, 8) < thr.hex_thr
GROUP BY 1
"""


def q_cosine_topk(spark, sf_dir):
    """Brute-force cosine top-5 for 3 fixed query vectors."""
    emb = _load(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id").isin([0, 1, 2]))
    out = similarity.cosine_topk_bruteforce(emb, queries, k=5)
    return out.select(
        "query_id", "vec_id", "rank", F.round(F.col("cosine"), 4).alias("cosine")
    )


SQL_COSINE_TOPK = """
WITH q AS (SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qe
           FROM embeddings WHERE vec_id IN (0, 1, 2)),
scored AS (
  SELECT q.query_id, e.vec_id,
         list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), q.qe)
           AS cos_raw
  FROM embeddings e, q WHERE e.vec_id <> q.query_id),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY query_id
                               ORDER BY cos_raw DESC, vec_id) AS rank
  FROM scored)
SELECT query_id, vec_id, rank, round(cos_raw, 4) AS cosine
FROM ranked WHERE rank <= 5
"""


def q_ngram_jaccard_docs(spark, sf_dir):
    """Exact word-trigram Jaccard for a fixed candidate pair set."""
    docs = _load(spark, sf_dir, "documents")
    pairs = spark.createDataFrame(
        [(0, 1), (2, 3), (10, 11), (100, 101)], "id_a long, id_b long"
    )
    out = dedup.ngram_jaccard(docs, pairs, n=3)
    return out.select("id_a", "id_b", _r(F.col("jaccard")).alias("jaccard"))


SQL_NGRAM_JACCARD = r"""
WITH sh AS (
  SELECT doc_id,
         list_distinct(list_transform(
           range(1, greatest(len(regexp_split_to_array(lower(trim(text)), '\s+')) - 1, 1) + 1),
           i -> array_to_string(list_slice(
                  regexp_split_to_array(lower(trim(text)), '\s+'), i, i + 2), ' ')))
           AS shingles
  FROM documents),
pairs(id_a, id_b) AS (VALUES (0, 1), (2, 3), (10, 11), (100, 101))
SELECT p.id_a, p.id_b,
       round(CASE WHEN len(list_distinct(a.shingles || b.shingles)) > 0
                  THEN len(list_intersect(a.shingles, b.shingles)) * 1.0
                       / len(list_distinct(a.shingles || b.shingles))
                  ELSE 0.0 END, 6) AS jaccard
FROM pairs p
JOIN sh a ON a.doc_id = p.id_a
JOIN sh b ON b.doc_id = p.id_b
"""


def q_lagged_variants(spark, sf_dir):
    """Lagged feature columns (frames.py:760-850): per-source checksum
    of value - lag3(value)."""
    out = analyses.lagged_variants(series(spark, sf_dir), lags=[1, 3])
    d = F.col("value") - F.col("value_lag3")
    return out.groupBy("source").agg(
        _r(F.sum(d)).alias("diff3_sum"), F.count(d).alias("diff3_n")
    )


SQL_LAGGED = f"""
WITH series AS ({SERIES_SQL}),
l AS (
  SELECT *, lag(value, 3) OVER (PARTITION BY source, doc_id ORDER BY pos) AS v3
  FROM series)
SELECT source, round(sum(value - v3), 6) AS diff3_sum,
       count(CASE WHEN value IS NOT NULL AND v3 IS NOT NULL THEN 1 END) AS diff3_n
FROM l GROUP BY 1
"""


def q_backfill_limited(spark, sf_dir):
    """Limited backfill (meteoscreening.py:597-615): per-source checksum
    of the bfill(limit=3) column."""
    out = gaps.backfill_limited(series(spark, sf_dir), limit=3)
    return out.groupBy("source").agg(
        _r(F.sum("value_bf")).alias("bf_sum"), F.count("value_bf").alias("bf_n")
    )


SQL_BACKFILL = f"""
WITH series AS ({SERIES_SQL}),
b AS (
  SELECT *, coalesce(value,
      first_value(value IGNORE NULLS) OVER
        (PARTITION BY source, doc_id ORDER BY pos
         ROWS BETWEEN 1 FOLLOWING AND 3 FOLLOWING)) AS bf
  FROM series)
SELECT source, round(sum(bf), 6) AS bf_sum, count(bf) AS bf_n
FROM b GROUP BY 1
"""


def q_banded_uncertainty(spark, sf_dir):
    """Banded random uncertainty (uncertainty.py:218-289): std over the
    ±20-position band where >= 5 values; per-source checksum."""
    from .operators.flux import random_uncertainty_banded

    out = random_uncertainty_banded(series(spark, sf_dir), band=20, min_vals=5)
    return out.groupBy("source").agg(
        _r(F.sum("unc")).alias("unc_sum"), F.count("unc").alias("unc_n")
    )


SQL_BANDED_UNC = f"""
WITH series AS ({SERIES_SQL}),
b AS (
  SELECT *,
    CASE WHEN count(value) OVER w >= 5 THEN stddev_samp(value) OVER w END AS unc
  FROM series
  WINDOW w AS (PARTITION BY source, doc_id ORDER BY pos
               RANGE BETWEEN 20 PRECEDING AND 20 FOLLOWING))
SELECT source, round(sum(unc), 6) AS unc_sum, count(unc) AS unc_n
FROM b GROUP BY 1
"""


def q_ustar_scenarios(spark, sf_dir):
    """USTAR threshold scenario sweep (ustarthreshold.py:14-130) on
    lineitem: ustar=l_discount, value=l_quantity."""
    from .operators.flux import ustar_scenarios

    li = _load(spark, sf_dir, "lineitem").select(
        F.col("l_discount").alias("ustar"), F.col("l_quantity").alias("value")
    )
    out = ustar_scenarios(li, thresholds=[0.02, 0.05, 0.08])
    return out.select(
        _r(F.col("ustar_threshold"), 2).alias("ustar_threshold"),
        "n_survivors", "n_total",
        _r(F.col("mean_surviving")).alias("mean_surviving"),
    )


SQL_USTAR = """
SELECT round(u.t, 2) AS ustar_threshold,
       count(CASE WHEN l_discount >= u.t THEN l_quantity END) AS n_survivors,
       count(l_quantity) AS n_total,
       round(avg(CASE WHEN l_discount >= u.t THEN l_quantity END), 6)
         AS mean_surviving
FROM lineitem, (VALUES (0.02), (0.05), (0.08)) u(t)
GROUP BY u.t
"""


def q_crosscov_scan(spark, sf_dir):
    """Lagged cross-covariance scan (fluxdetectionlimit.py:211-231):
    autocovariance of the series at lags 0..5 per source."""
    from .operators.flux import lagged_crosscovariance

    out = lagged_crosscovariance(
        series(spark, sf_dir), "value", "value", lags=list(range(0, 6)),
        key_cols=["source", "doc_id"],
    )
    return out.select(
        "source", "doc_id", "lag", _r(F.col("cov")).alias("cov"), "n"
    )


def _sql_crosscov() -> str:
    selects = []
    for k in range(0, 6):
        selects.append(f"""
  SELECT source, doc_id, {k} AS lag,
         round(covar_samp(value, v{k}), 6) AS cov,
         count(CASE WHEN value IS NOT NULL AND v{k} IS NOT NULL THEN 1 END) AS n
  FROM l GROUP BY source, doc_id""")
    leads = ", ".join(
        f"lead(value, {k}) OVER (PARTITION BY source, doc_id ORDER BY pos) AS v{k}"
        for k in range(0, 6)
    )
    return f"""
WITH series AS ({SERIES_SQL}),
l AS (SELECT source, doc_id, pos, value, {leads} FROM series)
{' UNION ALL '.join(selects)}
"""


SQL_CROSSCOV = _sql_crosscov()


def q_daily_full_gate(spark, sf_dir):
    """Full-bucket-gated daily aggregate (criticaldays.py:291-300):
    50-wide buckets kept only when complete."""
    from .operators.flux import daily_full_gate

    out = daily_full_gate(series(spark, sf_dir), bucket=50, required=50)
    return out.select(
        "source", "doc_id", "day_bucket", "n", _r(F.col("mean")).alias("mean")
    )


SQL_DAILY_GATE = f"""
WITH series AS ({SERIES_SQL})
SELECT source, doc_id, CAST(floor(pos / 50) AS BIGINT) AS day_bucket,
       count(value) AS n, round(avg(value), 6) AS mean
FROM series GROUP BY 1, 2, 3
HAVING count(value) = 50
"""


def q_sorting_bins(spark, sf_dir):
    """Nested quantile binning / decoupling (decoupling.py:27-101) on
    lineitem: quintiles of extendedprice, nested quintiles of quantity,
    mean discount per cell."""
    li = _load(spark, sf_dir, "lineitem")
    # aggregate the discount as an exact scaled long (TPC-H discounts
    # are 2-decimal): double summation order varies with partition
    # count and 0.0496125 once landed exactly on the round-6 boundary,
    # flipping the value hash between parallelism levels
    li = li.withColumn(
        "l_disc100", F.round(F.col("l_discount") * 100, 0).cast("long")
    )
    out = analyses.sorting_bins(
        li, "l_extendedprice", "l_quantity", "l_disc100", n_bins=5,
        tiebreak_cols=["l_orderkey", "l_linenumber"],
    )
    return out.select(
        "bin1", "bin2",
        _r(F.col("l_disc100_mean") / 100).alias("discount_mean"), "n",
    )


SQL_SORTING_BINS = """
WITH b1 AS (
  SELECT *, ntile(5) OVER (ORDER BY l_extendedprice, l_orderkey, l_linenumber)
         AS bin1
  FROM lineitem
  WHERE l_quantity IS NOT NULL AND l_discount IS NOT NULL
    AND l_extendedprice IS NOT NULL),
b2 AS (
  SELECT *, ntile(5) OVER (PARTITION BY bin1
                           ORDER BY l_quantity, l_orderkey, l_linenumber) AS bin2
  FROM b1)
SELECT bin1, bin2,
       round(avg(CAST(round(l_discount * 100, 0) AS BIGINT)) / 100, 6)
         AS discount_mean,
       count(*) AS n
FROM b2 GROUP BY 1, 2
"""


def q_quantile_xy(spark, sf_dir):
    """QuantileXYAggZ (quantilexyaggz.py:8-162) on lineitem."""
    li = _load(spark, sf_dir, "lineitem")
    # exact scaled-long aggregation (see q_sorting_bins): double
    # summation order is partitioning-dependent at round-6 boundaries
    li = li.withColumn(
        "l_disc100", F.round(F.col("l_discount") * 100, 0).cast("long")
    )
    out = analyses.quantile_xy_agg_z(
        li, x="l_extendedprice", y="l_quantity", z="l_disc100",
        n_x=4, n_y=4, agg="mean", min_n=10,
        tiebreak_cols=["l_orderkey", "l_linenumber"],
    )
    return out.select(
        "xbin", "ybin", _r(F.col("l_disc100_mean") / 100).alias("z_mean"), "n"
    )


SQL_QUANTILE_XY = """
WITH g AS (
  SELECT * FROM lineitem
  WHERE l_extendedprice IS NOT NULL AND l_quantity IS NOT NULL
    AND l_discount IS NOT NULL),
bx AS (
  SELECT *, ntile(4) OVER (ORDER BY l_extendedprice, l_orderkey, l_linenumber)
         AS xbin
  FROM g),
bxy AS (
  SELECT *, ntile(4) OVER (ORDER BY l_quantity, l_orderkey, l_linenumber) AS ybin
  FROM bx)
SELECT xbin, ybin,
       round(avg(CAST(round(l_discount * 100, 0) AS BIGINT)) / 100, 6)
         AS z_mean,
       count(*) AS n
FROM bxy GROUP BY 1, 2
HAVING count(*) >= 10
"""


def q_peak_bins(spark, sf_dir):
    """Top-5 histogram peak bins (histogram.py:79-86), deterministic
    tie-break on bin_idx."""
    ev = _load(spark, sf_dir, "events")
    hist = analyses.histogram(ev, n_bins=20, value_col="value")
    out = analyses.peak_bins(hist, k=5)
    return out.select(
        F.col("bin_idx").cast("long").alias("bin_idx"), "count"
    )


SQL_PEAK_BINS = """
WITH b AS (SELECT min(value) AS lo, max(value) AS hi FROM events),
h AS (
  SELECT CAST(least(floor((value - lo) / ((hi - lo) / 20)), 19) AS BIGINT)
           AS bin_idx,
         count(*) AS count
  FROM events, b WHERE value IS NOT NULL GROUP BY 1),
r AS (
  SELECT *, row_number() OVER (ORDER BY count DESC, bin_idx) AS rk FROM h)
SELECT bin_idx, count FROM r WHERE rk <= 5
"""


def q_cumulative_envelope(spark, sf_dir):
    """Per-partition cumulative sums + cross-partition envelope
    (DOY cumulatives, times.py:1108-1138): checksum per source."""
    # restrict to one source so (doc_id, pos) is a unique ordering key —
    # running sums over tied orderings are nondeterministic in any engine
    out = analyses.cumulative_per_partition(
        series(spark, sf_dir).where(F.col("source") == "click"),
        partition_col="doc_id",
    )
    return out.groupBy("source").agg(
        _r(F.sum("cumsum")).alias("cumsum_sum"),
        _r(F.sum("cum_mean")).alias("env_mean_sum"),
        _r(F.sum("cum_mean_plus_1_96sd")).alias("env_hi_sum"),
        _r(F.sum("cum_mean_minus_1_96sd")).alias("env_lo_sum"),
    )


SQL_CUMULATIVE = f"""
WITH series AS ({SERIES_SQL}),
s1 AS (SELECT * FROM series WHERE source = 'click'),
c AS (
  SELECT *, sum(value) OVER (PARTITION BY doc_id ORDER BY pos
                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         AS cumsum
  FROM s1),
e AS (
  SELECT *, avg(cumsum) OVER (PARTITION BY pos) AS cum_mean,
         stddev_samp(cumsum) OVER (PARTITION BY pos) AS cum_sd
  FROM c)
SELECT source, round(sum(cumsum), 6) AS cumsum_sum,
       round(sum(cum_mean), 6) AS env_mean_sum,
       round(sum(cum_mean + 1.96 * cum_sd), 6) AS env_hi_sum,
       round(sum(cum_mean - 1.96 * cum_sd), 6) AS env_lo_sum
FROM e GROUP BY 1
"""


def q_rollup_time30min(spark, sf_dir):
    """True-timestamp tumbling-window resample (window(ts, 30 min) ==
    resample('30T') bins; resampling.py:86-93 label conventions) over
    events, per event_type."""
    ev = _load(spark, sf_dir, "events")
    w = F.window(F.col("ts"), "30 minutes")
    out = ev.groupBy(F.col("event_type").alias("source"), w).agg(
        F.count("value").alias("n"),
        _r(F.avg("value")).alias("mean"),
        _r(F.sum("value")).alias("sum_v"),
    )
    return out.select(
        "source",
        F.date_format(F.col("window.start"), "yyyy-MM-dd HH:mm:ss").alias("bin_start"),
        "n", "mean", "sum_v",
    )


SQL_ROLLUP_TIME = """
SELECT event_type AS source,
       strftime(time_bucket(INTERVAL '30 minutes', ts), '%Y-%m-%d %H:%M:%S')
         AS bin_start,
       count(value) AS n,
       round(avg(value), 6) AS mean,
       round(sum(value), 6) AS sum_v
FROM events GROUP BY 1, 2
"""


def q_weekly_rollup(spark, sf_dir):
    """Calendar weekly resample with closed/label RIGHT + Monday anchor
    (resample_df conventions, frames.py:353-362; diive week anchor
    resampling.py:38)."""
    from .operators.resample import calendar_rollup

    ev = _load(spark, sf_dir, "events").select(
        F.col("event_type").alias("source"), "ts", "value"
    )
    out = calendar_rollup(ev, "week", key_cols=["source"])
    return out.select(
        "source",
        F.date_format("bin_label", "yyyy-MM-dd").alias("week_end"),
        "n", _r(F.col("mean")).alias("mean"), _r(F.col("sd")).alias("sd"),
    )


SQL_WEEKLY = """
SELECT event_type AS source,
       strftime(date_trunc('week', ts) + INTERVAL 7 DAY, '%Y-%m-%d') AS week_end,
       count(value) AS n,
       round(avg(value), 6) AS mean,
       round(stddev_samp(value), 6) AS sd
FROM events GROUP BY 1, 2
"""


def q_optimum_range(spark, sf_dir):
    """FindOptimumRange (optimumrange.py:20-160): 20 price-quantile bins
    of lineitem, median quantity per bin, 3-bin smoothed argmax."""
    li = _load(spark, sf_dir, "lineitem")
    out = analyses.find_optimum_range(
        li, x="l_extendedprice", y="l_quantity", n_bins=20,
        tiebreak_cols=["l_orderkey", "l_linenumber"],
    )
    return out.select(
        "xbin", _r(F.col("y_smooth")).alias("y_smooth"),
        _r(F.col("x_lo")).alias("x_lo"), _r(F.col("x_hi")).alias("x_hi"),
    )


SQL_OPTIMUM_RANGE = """
WITH b AS (
  SELECT *, ntile(20) OVER (ORDER BY l_extendedprice, l_orderkey, l_linenumber)
         AS xbin
  FROM lineitem WHERE l_quantity IS NOT NULL AND l_extendedprice IS NOT NULL),
per_bin AS (
  SELECT xbin, quantile_cont(l_quantity, 0.5) AS y_med,
         min(l_extendedprice) AS x_lo, max(l_extendedprice) AS x_hi
  FROM b GROUP BY 1),
sm AS (
  SELECT *, avg(y_med) OVER (ORDER BY xbin
                             ROWS BETWEEN 1 PRECEDING AND 1 FOLLOWING)
         AS y_smooth
  FROM per_bin)
SELECT xbin, round(y_smooth, 6) AS y_smooth,
       round(x_lo, 6) AS x_lo, round(x_hi, 6) AS x_hi
FROM sm ORDER BY y_smooth DESC, xbin LIMIT 1
"""


def q_winddir_offset(spark, sf_dir):
    """Wind-direction offset sweep (winddiroffset.py:17-141): recover
    the per-period offset maximizing histogram correlation against the
    reference period."""
    ev = _load(spark, sf_dir, "events")
    wd = ev.select(
        F.pmod(F.col("user_id"), F.lit(2)).alias("period"),
        F.pmod(F.col("value") * 7.3, F.lit(360.0)).alias("value"),
    )
    out = corrections.wind_direction_offset(
        wd, "period", ref_periods=[0], offsets=range(-30, 31, 10),
        value_col="value",
    )
    return out.select("period", "best_offset", _r(F.col("r"), 4).alias("r"))


SQL_WINDDIR = """
WITH wd AS (
  SELECT user_id % 2 AS period, ((value * 7.3) % 360 + 360) % 360 AS v
  FROM events),
ref AS (
  SELECT CAST(floor(v % 360) AS BIGINT) AS sector, count(*) AS ref_n
  FROM wd WHERE period = 0 GROUP BY 1),
sweep AS (
  SELECT w.period, o.off,
         CAST(floor(((w.v + o.off) % 360 + 360) % 360) AS BIGINT) AS sector,
         count(*) AS n
  FROM wd w, (VALUES (-30),(-20),(-10),(0),(10),(20),(30)) o(off)
  GROUP BY 1, 2, 3),
joined AS (
  SELECT s.period, s.off, corr(s.n, r.ref_n) AS r
  FROM sweep s JOIN ref r ON s.sector = r.sector
  GROUP BY 1, 2),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY period
                               ORDER BY abs(r) DESC, off) AS rk
  FROM joined)
SELECT period, off AS best_offset, round(r, 4) AS r
FROM ranked WHERE rk = 1
"""


def q_screening_pipeline(spark, sf_dir):
    """EP2 composed end-to-end (meteoscreening.py:120-533 story): flag
    battery (z-score + absolute limits + missing) -> QCF -> filtered
    series -> min-count-gated 60-bucket rollup, one lazy plan."""
    from .operators.pipeline import ScreeningPipeline

    p = (
        ScreeningPipeline(series(spark, sf_dir))
        .flag_zscore(thres=2.5)
        .flag_abs_limits(lo=10.0, hi=300.0)
        .flag_missing()
        .finalize_qcf()
    )
    out = p.resample(every=60, mincounts_perc=0.25)
    return out.select(
        "source", "doc_id", "bin_start", "n",
        _r(F.col("mean")).alias("mean"), _r(F.col("sum")).alias("sum_v"),
    )


SQL_SCREENING = f"""
WITH series AS ({SERIES_SQL}),
z AS (
  SELECT *, abs((value - avg(value) OVER w) / stddev_pop(value) OVER w) AS zs
  FROM series WINDOW w AS (PARTITION BY source, doc_id)),
flags AS (
  SELECT *,
    CASE WHEN value IS NULL THEN NULL WHEN zs > 2.5 THEN 2 ELSE 0 END AS f_z,
    CASE WHEN value IS NULL THEN NULL
         WHEN value < 10.0 OR value > 300.0 THEN 2 ELSE 0 END AS f_lim,
    CASE WHEN value IS NULL THEN 2 ELSE 0 END AS f_miss
  FROM z),
sums AS (
  SELECT *,
    (CASE WHEN f_z = 2 THEN 2 ELSE 0 END + CASE WHEN f_lim = 2 THEN 2 ELSE 0 END
       + CASE WHEN f_miss = 2 THEN 2 ELSE 0 END) AS hard,
    (CASE WHEN f_z = 1 THEN 1 ELSE 0 END + CASE WHEN f_lim = 1 THEN 1 ELSE 0 END
       + CASE WHEN f_miss = 1 THEN 1 ELSE 0 END) AS soft
  FROM flags),
q AS (
  SELECT *,
    CASE WHEN soft >= 1 AND soft <= 3 AND hard = 0 THEN 1
         WHEN hard >= 2 THEN 2
         WHEN soft > 3 THEN 2
         WHEN hard + soft = 0 THEN 0 END AS qcf
  FROM sums),
filtered AS (
  SELECT source, doc_id, pos,
         CASE WHEN qcf = 2 THEN NULL ELSE value END AS v
  FROM q),
agg AS (
  SELECT source, doc_id, CAST(floor(pos / 60) * 60 AS BIGINT) AS bin_start,
         count(v) AS n, count(*) AS n_grid,
         avg(v) AS mean, sum(v) AS sum_v
  FROM filtered GROUP BY 1, 2, 3),
gated AS (
  SELECT *, CAST(floor(max(n_grid) OVER (PARTITION BY source, doc_id) * 0.25)
                 AS BIGINT) AS minc
  FROM agg)
SELECT source, doc_id, bin_start, n,
       round(mean, 6) AS mean, round(sum_v, 6) AS sum_v
FROM gated WHERE n >= (CASE WHEN minc < 3 THEN 1 ELSE minc END)
"""


# ----------------------------------------------- rows-only (no oracle SQL)
def q_gorilla_roundtrip(spark, sf_dir):
    """SELF-VERIFYING Gorilla codec oracle (VERDICT r2 item 5): token
    arrays derived deterministically from documents text are encoded,
    decoded, and compared IN-QUERY (the per-row token-array-equality
    invariant, BASELINE.json input_hint) — n_mismatch must be 0, so the
    DuckDB twin is the trivial per-source count with a literal zero and
    any codec regression breaks the driver's value hash."""
    from .functions.gorilla import gorilla_decode_values, gorilla_encode_values

    docs = _load(spark, sf_dir, "documents")
    toks = docs.withColumn(
        "tokens",
        F.expr(
            "transform(split(text, ' '), "
            "w -> CAST(pmod(xxhash64(w), 50000) AS INT))"
        ),
    )
    enc = toks.withColumn("payload", gorilla_encode_values("tokens"))
    dec = enc.withColumn("decoded", gorilla_decode_values("payload"))
    return dec.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.count(F.when(~(F.col("decoded") == F.col("tokens")), 1))
        .cast("long").alias("n_mismatch"),
    )


SQL_GORILLA_ROUNDTRIP = """
SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
       CAST(0 AS BIGINT) AS n_mismatch
FROM documents GROUP BY 1
"""


def q_minhash_dedup_docs(spark, sf_dir):
    """SELF-VERIFYING MinHash+LSH oracle (promoted from rows-only, the
    simhash/gorilla pattern): the LSH candidate set's recall AND
    precision are measured IN-QUERY against the seed-free exact
    inverted-index trigram Jaccard scan, and the end-to-end dedup count
    is replayed by the DuckDB twin from the same exact edges.

    - n_truth_pairs: pairs with exact trigram Jaccard >= 0.8 — the
      DuckDB twin recomputes this from the text (no LSH seed involved).
    - n_missed: truth pairs the est>=0.6 LSH candidate set lost.  With
      k=64, bands=16 the per-pair miss probability at j=0.8 is
      (1 - 0.8^4)^16 + P(est<0.6 | j=0.8) ~ 3e-4, and the permutation
      seed is frozen, so the value is deterministic — 0 on this corpus;
      the twin emits the literal.
    - n_lowprec: candidates whose EXACT jaccard < 0.3 (est>=0.6 with a
      wide margin below it) — deterministically 0 here (measured
      min exact jaccard of the candidate set is 0.9).
    - n_dup_docs: docs whose single-hop canonical id differs from their
      own — equals the count of distinct higher-ids in the truth edge
      set because candidates == truth on this corpus, which the twin
      computes from the exact edges.  Any candidate-set drift breaks
      this equality and the driver hash catches it."""
    docs = _load(spark, sf_dir, "documents")
    # small-file source arrives as 1 split; spread the row-local
    # signature compute across cores (no-op at real multi-file scale)
    docs = docs.repartition(spark.sparkContext.defaultParallelism)
    sigs = dedup.minhash_signatures(docs, k=64).localCheckpoint(eager=True)
    cand = dedup.minhash_lsh_pairs(
        sigs, bands=16, est_threshold=0.6
    ).localCheckpoint(eager=True)
    truth = dedup.jaccard_pairs_exact(docs, n=3, threshold=0.8).select(
        "id_a", "id_b"
    )
    j = truth.withColumn("_t", F.lit(1)).join(
        cand.withColumn("_c", F.lit(1)), ["id_a", "id_b"], "full"
    )
    stats = j.agg(
        F.count(F.when(F.col("_t").isNotNull(), 1)).cast("long").alias("n_truth_pairs"),
        F.count(F.when(F.col("_t").isNotNull() & F.col("_c").isNull(), 1))
        .cast("long").alias("n_missed"),
    )
    lowprec = (
        dedup.ngram_jaccard(docs, cand.select("id_a", "id_b"), n=3)
        .agg(F.count(F.when(F.col("jaccard") < 0.3, 1)).cast("long")
             .alias("n_lowprec"))
    )
    # end-to-end single-hop dedup over the SAME candidate edges
    edges = cand.select(F.col("id_a").alias("node"), F.col("id_b").alias("peer")) \
        .unionByName(cand.select(F.col("id_b").alias("node"), F.col("id_a").alias("peer")))
    canon = edges.groupBy("node").agg(
        F.least(F.min("peer"), F.first("node")).alias("canonical"))
    dups = (
        docs.join(canon, on=F.col("doc_id") == F.col("node"), how="left")
        .agg(F.count(F.when(F.col("canonical").isNotNull()
                            & (F.col("canonical") != F.col("doc_id")), 1))
             .cast("long").alias("n_dup_docs"))
    )
    n = docs.agg(F.count(F.lit(1)).cast("long").alias("n_docs"))
    return n.crossJoin(stats).crossJoin(lowprec).crossJoin(dups)


SQL_DEDUP_MINHASH = r"""
WITH sh AS (
  SELECT doc_id,
         list_distinct(list_transform(
           range(1, greatest(len(regexp_split_to_array(lower(trim(text)), '\s+')) - 2, 1) + 1),
           i -> array_to_string(list_slice(
                  regexp_split_to_array(lower(trim(text)), '\s+'), i, i + 2), ' ')))
           AS s
  FROM documents),
edges AS (
  SELECT a.doc_id AS ia, b.doc_id AS ib
  FROM sh a JOIN sh b ON a.doc_id < b.doc_id
  WHERE len(list_intersect(a.s, b.s)) * 1.0
        / len(list_distinct(a.s || b.s)) >= 0.8)
SELECT (SELECT CAST(count(*) AS BIGINT) FROM documents) AS n_docs,
       CAST(count(*) AS BIGINT) AS n_truth_pairs,
       CAST(0 AS BIGINT) AS n_missed,
       CAST(0 AS BIGINT) AS n_lowprec,
       (SELECT CAST(count(DISTINCT ib) AS BIGINT) FROM edges) AS n_dup_docs
FROM edges
"""


def q_neardup_components(spark, sf_dir):
    """Multi-hop near-dup clustering: EXACT inverted-index all-pairs
    trigram Jaccard >= 0.5 (no crossJoin, no LSH seed) -> distributed
    connected-components fixpoint -> (doc_id, component).  The oracle
    twin replays the same edges with a recursive CTE, so the fixpoint
    semantics (chains/triangles collapse to min id) are hash-checked."""
    docs = _load(spark, sf_dir, "documents")
    edges = dedup.jaccard_pairs_exact(docs, n=3, threshold=0.5)
    cc = dedup.connected_components(edges)
    return cc.select(
        F.col("node").alias("doc_id"),
        F.col("component").cast("long").alias("component"),
    )


SQL_NEARDUP_COMPONENTS = r"""
WITH RECURSIVE sh AS (
  SELECT doc_id,
         list_distinct(list_transform(
           range(1, greatest(len(regexp_split_to_array(lower(trim(text)), '\s+')) - 2, 1) + 1),
           i -> array_to_string(list_slice(
                  regexp_split_to_array(lower(trim(text)), '\s+'), i, i + 2), ' ')))
           AS s
  FROM documents),
edges AS (
  SELECT a.doc_id AS ia, b.doc_id AS ib
  FROM sh a JOIN sh b ON a.doc_id < b.doc_id
  WHERE len(list_intersect(a.s, b.s)) * 1.0
        / len(list_distinct(a.s || b.s)) >= 0.5),
sym AS (SELECT ia AS s, ib AS d FROM edges
        UNION SELECT ib, ia FROM edges),
reach(node, r) AS (
  SELECT DISTINCT s, s FROM sym
  UNION
  SELECT sym.s, reach.r FROM sym JOIN reach ON reach.node = sym.d)
SELECT node AS doc_id, CAST(min(r) AS BIGINT) AS component
FROM reach GROUP BY node
"""


def q_simhash_docs(spark, sf_dir):
    """SELF-VERIFYING SimHash banding oracle (promoted from rows-only):
    the 4x16-bit chunk banding is EXACT for hamming distance <= 3 by
    pigeonhole, so the banded pair set must equal the exhaustive
    all-pairs hd<=3 scan computed IN-QUERY — n_missed and n_spurious
    are both deterministically 0 and the DuckDB twin is the trivial
    per-corpus count with literal zeros (the Gorilla oracle pattern).
    The exhaustive side is a crossJoin: fine at driver scale (500
    docs), and exactly the quadratic scan banding exists to avoid at
    10^9.  Pair counts stay covered by the pytest recall invariant."""
    docs = _load(spark, sf_dir, "documents")
    fp = dedup.simhash(docs).localCheckpoint()
    band = dedup.simhash_pairs(fp, max_hamming=3).select("id_a", "id_b")
    a = fp.select(F.col("doc_id").alias("id_a"), F.col("simhash").alias("_sa"))
    b = fp.select(F.col("doc_id").alias("id_b"), F.col("simhash").alias("_sb"))
    exhaustive = (
        a.crossJoin(b)
        .where(
            (F.col("id_a") < F.col("id_b"))
            & (F.bit_count(F.col("_sa").bitwiseXOR(F.col("_sb"))) <= 3)
        )
        .select("id_a", "id_b")
    )
    j = exhaustive.withColumn("_e", F.lit(1)).join(
        band.withColumn("_b", F.lit(1)), ["id_a", "id_b"], "full"
    )
    stats = j.agg(
        F.count(F.when(F.col("_b").isNull(), 1)).cast("long").alias("n_missed"),
        F.count(F.when(F.col("_e").isNull(), 1)).cast("long").alias("n_spurious"),
    )
    n = fp.agg(F.count(F.lit(1)).cast("long").alias("n_fingerprints"))
    return n.crossJoin(stats)


SQL_DEDUP_SIMHASH = """
SELECT CAST(count(*) AS BIGINT) AS n_fingerprints,
       CAST(0 AS BIGINT) AS n_missed,
       CAST(0 AS BIGINT) AS n_spurious
FROM documents
"""


def q_cosine_lsh_topk(spark, sf_dir):
    """SELF-VERIFYING LSH ANN oracle (promoted from rows-only): the
    brute-force top-k is computed IN-QUERY as ground truth — the DuckDB
    twin recomputes it (the same SQL similarity_topk_cosine
    hash-matches) — and the multi-probe LSH path's recall@5 against it
    is emitted as a per-query threshold boolean.  The hyperplane seed
    is frozen and every stage (bucket assignment, probing, fold dot
    products) is row-local, so recall is deterministic: measured hits
    per query are {2, 3, 3} of 5 with n_planes=3 + 2 probe bits on this
    corpus (500 random gaussian vectors — genuinely hard neighbors,
    top-1 cosine ~0.37); the gate is >= 1 with margin.  Plane count is
    sized to the corpus (8 buckets over 500 vectors); at 10^9 vectors
    the same operator takes more planes."""
    emb = _load(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id").isin([0, 1, 2]))
    bf = similarity.cosine_topk_bruteforce(emb, queries, k=5)
    lsh = similarity.cosine_topk_lsh(
        emb, queries, dim=64, k=5, n_planes=3, n_probe_bits=2
    ).select("query_id", "vec_id", F.lit(1).alias("_hit"))
    hits = (
        bf.join(lsh, ["query_id", "vec_id"], "left")
        .groupBy("query_id")
        .agg(
            F.max(F.when(F.col("rank") == 1, F.col("vec_id")))
            .cast("long").alias("bf_top1"),
            F.max(F.when(F.col("rank") == 1, F.round(F.col("cosine"), 4)))
            .alias("bf_top1_cos"),
            (F.sum(F.coalesce(F.col("_hit"), F.lit(0))) >= 1)
            .cast("long").alias("lsh_recall_ok"),
        )
    )
    return hits.select("query_id", "bf_top1", "bf_top1_cos", "lsh_recall_ok")


SQL_SIMILARITY_LSH = """
WITH q AS (SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qe
           FROM embeddings WHERE vec_id IN (0, 1, 2)),
scored AS (
  SELECT q.query_id, e.vec_id,
         list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), q.qe)
           AS cos_raw
  FROM embeddings e, q WHERE e.vec_id <> q.query_id),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY query_id
                               ORDER BY cos_raw DESC, vec_id) AS rank
  FROM scored)
SELECT query_id, CAST(vec_id AS BIGINT) AS bf_top1,
       CAST(round(cos_raw, 4) AS DOUBLE) AS bf_top1_cos,
       CAST(1 AS BIGINT) AS lsh_recall_ok
FROM ranked WHERE rank = 1
"""


def q_rf_gapfill(spark, sf_dir):
    """SELF-VERIFYING random-forest gap fill (promoted from rows-only):
    forest floats are not SQL-reproducible, so the oracle surface is
    the gap ACCOUNTING the DuckDB twin recomputes from the series —
    per-source row count and missing count — plus two invariant
    booleans: every missing value got a fill (all_filled_ok) and every
    fill lies within the observed global [min, max] (in_range_ok; tree
    predictions are averages of training targets, so this holds for
    any forest).  Both are partitioning-robust; the fill VALUES stay
    covered by the pytest oracle (test_flux_ml)."""
    from .operators.ml_gapfill import rf_gapfill

    s = series(spark, sf_dir)
    out, _scores = rf_gapfill(s, cycle=64, n_trees=10, max_depth=6)
    bounds = out.agg(
        F.min("value").alias("_lo"), F.max("value").alias("_hi")
    )
    return (
        out.crossJoin(F.broadcast(bounds))
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.count(F.when(F.col("value").isNull(), 1))
            .cast("long").alias("n_missing"),
            (F.count(F.when(F.col("value").isNull()
                            & F.col("value_gfRF").isNull(), 1)) == 0)
            .cast("long").alias("all_filled_ok"),
            (F.count(F.when(F.col("value_gfRF") < F.col("_lo"), 1))
             + F.count(F.when(F.col("value_gfRF") > F.col("_hi"), 1)) == 0)
            .cast("long").alias("in_range_ok"),
        )
    )


SQL_RF_GAPFILL = f"""
WITH series AS ({SERIES_SQL})
SELECT source, CAST(count(*) AS BIGINT) AS n_rows,
       CAST(count(*) FILTER (WHERE value IS NULL) AS BIGINT) AS n_missing,
       CAST(1 AS BIGINT) AS all_filled_ok,
       CAST(1 AS BIGINT) AS in_range_ok
FROM series GROUP BY source
"""


def q_rf_gapfill_flags(spark, sf_dir):
    """RF gap-fill flag accounting with a DuckDB oracle: flag 0/1/2
    membership is fully determined by the gap/lag structure (flag 1 <=>
    gap with all lag features present, randomforest_ts.py:732-839), so
    the per-source flag counts are SQL-reproducible even though the
    forest's floats are not."""
    from .operators.ml_gapfill import rf_gapfill

    out, _scores = rf_gapfill(
        series(spark, sf_dir), cycle=64, n_trees=5, max_depth=4
    )
    return out.groupBy(
        "source", F.col("value_gfRF_flag").cast("int").alias("flag")
    ).agg(F.count(F.lit(1)).alias("n"))


SQL_RF_FLAGS = f"""
WITH series AS ({SERIES_SQL}),
lagged AS (
  SELECT source, value,
         lag(value, 1) OVER w AS l1,
         lag(value, 2) OVER w AS l2,
         lag(value, 3) OVER w AS l3
  FROM series
  WINDOW w AS (PARTITION BY source, doc_id ORDER BY pos))
SELECT source,
       CAST(CASE WHEN value IS NOT NULL THEN 0
                 WHEN l1 IS NOT NULL AND l2 IS NOT NULL AND l3 IS NOT NULL THEN 1
                 ELSE 2 END AS INTEGER) AS flag,
       count(*) AS n
FROM lagged GROUP BY 1, 2
"""


def q_banded_unc_m2m3(spark, sf_dir):
    """Full PAS20 RANDUNC cascade (uncertainty.py:218-395): method-1
    banded std, method-2 windowed similar-flux median, method-3 global
    similar-flux median; per-source accounting by fill method."""
    from .operators.flux import random_uncertainty_pas20

    s = series(spark, sf_dir)
    wk = Window.partitionBy("source", "doc_id")
    s2 = s.withColumn(
        "flux_gf", F.coalesce(F.col("value"), F.avg("value").over(wk))
    )
    out = random_uncertainty_pas20(
        s2, band=3, day_len=48, wdays=1, wtod=2, min_vals=7
    )
    return out.groupBy("source", "unc_method").agg(
        F.count("unc").alias("n"), _r(F.avg("unc")).alias("unc_mean")
    )


SQL_BANDED_UNC_M2M3 = f"""
WITH series AS ({SERIES_SQL}),
s2 AS (
  SELECT source, doc_id, pos, value,
         coalesce(value, avg(value) OVER (PARTITION BY source, doc_id))
           AS flux_gf
  FROM series),
m1 AS (
  SELECT *, CASE WHEN count(value) OVER w >= 7
                 THEN stddev_samp(value) OVER w END AS unc
  FROM s2
  WINDOW w AS (PARTITION BY source, doc_id ORDER BY pos
               RANGE BETWEEN 3 PRECEDING AND 3 FOLLOWING)),
m2fill AS (
  SELECT a.source, a.doc_id, a.pos, quantile_cont(b.unc, 0.5) AS unc_m2
  FROM m1 a JOIN m1 b
    ON a.source = b.source AND a.doc_id = b.doc_id
   AND abs(a.pos // 48 - b.pos // 48) <= 1
   AND least(abs(a.pos % 48 - b.pos % 48),
             48 - abs(a.pos % 48 - b.pos % 48)) <= 2
   AND b.unc IS NOT NULL
   AND b.flux_gf BETWEEN a.flux_gf - greatest(a.flux_gf * 0.2, 2)
                     AND a.flux_gf + greatest(a.flux_gf * 0.2, 2)
  WHERE a.unc IS NULL
  GROUP BY 1, 2, 3),
m2t AS (
  SELECT m1.*, coalesce(m1.unc, f.unc_m2) AS unc2,
         CASE WHEN m1.unc IS NOT NULL THEN 1
              WHEN f.unc_m2 IS NOT NULL THEN 2 END AS meth2
  FROM m1 LEFT JOIN m2fill f USING (source, doc_id, pos)),
m3fill AS (
  SELECT a.source, a.doc_id, a.pos, quantile_cont(b.unc2, 0.5) AS unc_m3
  FROM m2t a JOIN m2t b
    ON a.source = b.source AND a.doc_id = b.doc_id
   AND b.unc2 IS NOT NULL
   AND b.flux_gf BETWEEN a.flux_gf - greatest(a.flux_gf * 0.2, 2)
                     AND a.flux_gf + greatest(a.flux_gf * 0.2, 2)
  WHERE a.unc2 IS NULL
  GROUP BY 1, 2, 3),
final AS (
  SELECT m2t.source, coalesce(m2t.unc2, f.unc_m3) AS unc,
         CAST(coalesce(m2t.meth2,
              CASE WHEN f.unc_m3 IS NOT NULL THEN 3 END) AS INTEGER)
           AS unc_method
  FROM m2t LEFT JOIN m3fill f USING (source, doc_id, pos))
SELECT source, unc_method, count(unc) AS n, round(avg(unc), 6) AS unc_mean
FROM final GROUP BY 1, 2
"""


def q_quadratic_fit(spark, sf_dir):
    """Closed-form least-squares quadratic fit (core/dfun/fits.py:74-260
    / BinFitter analog) of quantity ~ scaled price per returnflag —
    moment sums + Cramer arithmetic, identical op order to the SQL twin."""
    from .operators.fits import quadratic_fit

    li = _load(spark, sf_dir, "lineitem")
    d = li.select(
        F.col("l_returnflag").alias("flag"),
        (F.col("l_extendedprice") / 100000.0).alias("x"),
        F.col("l_quantity").cast("double").alias("y"),
    )
    out = quadratic_fit(d, "x", "y", key_cols=["flag"])
    return out.select(
        "flag", _r(F.col("c0"), 4).alias("c0"), _r(F.col("c1"), 4).alias("c1"),
        _r(F.col("c2"), 4).alias("c2"), _r(F.col("r2"), 6).alias("r2"),
        F.col("n").cast("long").alias("n"),
    )


SQL_QUADRATIC_FIT = """
WITH d AS (
  SELECT l_returnflag AS flag,
         CAST(l_extendedprice / 100000.0 AS DOUBLE) AS x,
         CAST(l_quantity AS DOUBLE) AS y
  FROM lineitem
  WHERE l_extendedprice IS NOT NULL AND l_quantity IS NOT NULL),
m AS (
  SELECT flag,
         sum(1.0) AS s0, sum(x) AS s1, sum(x*x) AS s2,
         sum(x*x*x) AS s3, sum(x*x*x*x) AS s4,
         sum(y) AS t0, sum(x*y) AS t1, sum(x*x*y) AS t2, sum(y*y) AS u0
  FROM d GROUP BY 1),
c AS (
  SELECT *,
    (s0*(s2*s4 - s3*s3) - s1*(s1*s4 - s3*s2) + s2*(s1*s3 - s2*s2)) AS det,
    (t0*(s2*s4 - s3*s3) - s1*(t1*s4 - s3*t2) + s2*(t1*s3 - s2*t2)) AS det0,
    (s0*(t1*s4 - s3*t2) - t0*(s1*s4 - s3*s2) + s2*(s1*t2 - t1*s2)) AS det1,
    (s0*(s2*t2 - t1*s3) - s1*(s1*t2 - t1*s2) + t0*(s1*s3 - s2*s2)) AS det2
  FROM m),
f AS (
  SELECT flag, det0/det AS c0, det1/det AS c1, det2/det AS c2,
         s0, s1, s2, s3, s4, t0, t1, t2, u0
  FROM c),
r AS (
  SELECT flag, c0, c1, c2, s0,
         u0 - 2*(c0*t0 + c1*t1 + c2*t2)
            + (c0*c0*s0 + c1*c1*s2 + c2*c2*s4
               + 2*(c0*c1*s1 + c0*c2*s2 + c1*c2*s3)) AS sse,
         u0 - t0*t0/s0 AS sst
  FROM f)
SELECT flag, round(c0, 4) AS c0, round(c1, 4) AS c1, round(c2, 4) AS c2,
       round(1.0 - sse/sst, 6) AS r2, CAST(s0 AS BIGINT) AS n
FROM r
"""


def q_fit_ci_bands(spark, sf_dir):
    """Fit confidence + prediction bands (reference Fitter,
    core/dfun/fits.py:117-131,179-247 — the r3 verdict's last named
    fits gap): closed-form OLS line per returnflag evaluated on a
    5-point grid with CI std = se*sqrt(1/n + (x-mx)^2/Sxx), CI at
    +/-1.96*std, PI at the EXACT Student-t quantile (pure-numpy t_ppf;
    the twin inlines the per-group t_ppf(0.975, n-2) literals computed
    from the same public distribution — n is corpus-deterministic and
    any drift breaks the n column first)."""
    from .operators.fits import linear_fit_bands

    li = _load(spark, sf_dir, "lineitem")
    d = li.select(
        F.col("l_returnflag").alias("flag"),
        (F.col("l_extendedprice") / 100000.0).alias("x"),
        F.col("l_quantity").cast("double").alias("y"),
    )
    out = linear_fit_bands(d, "y", "x", key_cols=["flag"], n_points=5)
    return out.select(
        "flag", _r(F.col("fit_x"), 6).alias("fit_x"),
        _r(F.col("fit_y"), 4).alias("fit_y"),
        _r(F.col("std"), 6).alias("std"),
        _r(F.col("nom_lower_ci95"), 4).alias("ci_lo"),
        _r(F.col("nom_upper_ci95"), 4).alias("ci_hi"),
        _r(F.col("lower_predband"), 4).alias("pi_lo"),
        _r(F.col("upper_predband"), 4).alias("pi_hi"),
        "n",
    )


SQL_FIT_CI_BANDS = """
WITH d AS (
  SELECT l_returnflag AS flag,
         CAST(l_extendedprice / 100000.0 AS DOUBLE) AS x,
         CAST(l_quantity AS DOUBLE) AS y
  FROM lineitem
  WHERE l_extendedprice IS NOT NULL AND l_quantity IS NOT NULL),
m AS (
  SELECT flag, count(*) AS n, sum(x) AS sx, sum(y) AS sy,
         sum(x*x) AS sxx_raw, sum(x*y) AS sxy_raw, sum(y*y) AS syy_raw,
         min(x) AS xmin, max(x) AS xmax
  FROM d GROUP BY 1),
f AS (
  SELECT *, sx / n AS mx,
         sxx_raw - sx*sx/n AS sxx,
         sxy_raw - sx*sy/n AS sxy,
         syy_raw - sy*sy/n AS syy
  FROM m),
g AS (
  SELECT *, sxy/sxx AS slope, (sy - (sxy/sxx)*sx)/n AS intercept,
         sqrt(greatest(syy - (sxy/sxx)*sxy, 0.0)/(n - 2)) AS se,
         -- t_ppf(0.975, n-2) literals for the sf0.01 group sizes
         CASE flag WHEN 'A' THEN 1.9600824511347539
                   WHEN 'N' THEN 1.9600830576632267
                   WHEN 'R' THEN 1.9600823447487636 END AS tq
  FROM f),
grid AS (
  SELECT g.*, xmin + i * (xmax - xmin) / 4.0 AS fit_x
  FROM g CROSS JOIN (SELECT unnest(range(0, 5)) AS i)),
b AS (
  SELECT flag, fit_x, n, se, tq,
         intercept + slope * fit_x AS fit_y,
         1.0/n + (fit_x - mx)*(fit_x - mx)/sxx AS lev
  FROM grid)
SELECT flag, round(fit_x, 6) AS fit_x, round(fit_y, 4) AS fit_y,
       round(se * sqrt(lev), 6) AS std,
       round(fit_y - 1.96 * (se * sqrt(lev)), 4) AS ci_lo,
       round(fit_y + 1.96 * (se * sqrt(lev)), 4) AS ci_hi,
       round(fit_y - tq * se * sqrt(1.0 + lev), 4) AS pi_lo,
       round(fit_y + tq * se * sqrt(1.0 + lev), 4) AS pi_hi,
       CAST(n AS BIGINT) AS n
FROM b
"""


def q_critical_heat_days(spark, sf_dir):
    """FluxCriticalHeatDaysP95 (criticalheatdays.py:19-473): per-source
    percentile-bin daily driver maxima; CHD/nCHD thresholds."""
    from .operators.flux import critical_heat_days_p95

    s = series(spark, sf_dir)
    daily = (
        s.withColumn("_day", F.expr("CAST(pos AS BIGINT) div 48"))
        .groupBy("source", "doc_id", "_day")
        .agg(
            F.max("value").alias("ta"),
            F.max(F.col("value") * 0.8).alias("vpd"),
            F.avg("value").alias("flux"),
        )
        .where(F.col("ta").isNotNull())
    )
    res = critical_heat_days_p95(
        daily, "ta", "vpd", "flux", n_bins=20,
        key_cols=["source"], tiebreak_cols=["doc_id", "_day"],
    )
    t = res["thresholds"]
    return t.select(
        "source", _r(F.col("thres_chd_ta")).alias("thres_chd_ta"),
        _r(F.col("thres_chd_vpd")).alias("thres_chd_vpd"),
        _r(F.col("thres_nchd_ta_lo")).alias("thres_nchd_ta_lo"),
        _r(F.col("thres_nchd_ta_hi")).alias("thres_nchd_ta_hi"),
        "n_chd", "n_nchd",
    )


SQL_CRITICAL_HEAT_DAYS = f"""
WITH series AS ({SERIES_SQL}),
daily AS (
  SELECT source, doc_id, pos // 48 AS d,
         max(value) AS ta, max(value * 0.8) AS vpd, avg(value) AS flux
  FROM series GROUP BY 1, 2, 3
  HAVING max(value) IS NOT NULL),
b AS (
  SELECT *,
    (ntile(20) OVER (PARTITION BY source ORDER BY ta, doc_id, d) - 1) * 5 AS bin_ta,
    (ntile(20) OVER (PARTITION BY source ORDER BY vpd, doc_id, d) - 1) * 5 AS bin_vpd
  FROM daily WHERE vpd IS NOT NULL AND flux IS NOT NULL)
SELECT source,
  round(min(CASE WHEN bin_ta = 95 AND bin_vpd = 95 THEN ta END), 6)
    AS thres_chd_ta,
  round(min(CASE WHEN bin_ta = 95 AND bin_vpd = 95 THEN vpd END), 6)
    AS thres_chd_vpd,
  round(min(CASE WHEN bin_ta = 90 AND bin_vpd = 90 THEN ta END), 6)
    AS thres_nchd_ta_lo,
  round(max(CASE WHEN bin_ta = 90 AND bin_vpd = 90 THEN ta END), 6)
    AS thres_nchd_ta_hi,
  count(CASE WHEN bin_ta = 95 AND bin_vpd = 95 THEN 1 END) AS n_chd,
  count(CASE WHEN bin_ta = 90 AND bin_vpd = 90 THEN 1 END) AS n_nchd
FROM b GROUP BY 1
"""


def q_interval_join(spark, sf_dir):
    """Point-in-interval range join: every 200th event per type opens a
    600 s maintenance window; events are bucket-equi-joined to the
    windows they fall in (no BroadcastNestedLoop) and aggregated per
    window.  Oracle twin does the naive theta-join."""
    from .operators.joins import interval_join

    ev = _load(spark, sf_dir, "events").select(
        "event_id", "ts", "event_type", "value"
    )
    w = Window.partitionBy("event_type").orderBy("event_id")
    iv = (
        ev.withColumn("_rn", F.row_number().over(w))
        .where((F.col("_rn") - 1) % 200 == 0)
        .select(
            "event_type",
            ((F.col("_rn") - 1) / 200).cast("long").alias("window_id"),
            F.col("ts").alias("start"),
            (F.col("ts") + F.expr("INTERVAL 600 SECONDS")).alias("end"),
        )
    )
    joined = interval_join(
        ev, iv, point_ts="ts", start_col="start", end_col="end",
        key_cols=["event_type"],
    )
    return joined.groupBy("event_type", "window_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        _r(F.sum("value")).alias("val_sum"),
    )


SQL_INTERVAL_JOIN = """
WITH iv AS (
  SELECT event_type, CAST((rn - 1) / 200 AS BIGINT) AS window_id,
         ts AS s, ts + INTERVAL 600 SECOND AS e
  FROM (SELECT event_type, ts,
               row_number() OVER (PARTITION BY event_type
                                  ORDER BY event_id) AS rn
        FROM events)
  WHERE (rn - 1) % 200 = 0)
SELECT ev.event_type, iv.window_id,
       CAST(count(*) AS BIGINT) AS n_events,
       round(sum(ev.value), 6) AS val_sum
FROM iv JOIN events ev
  ON ev.event_type = iv.event_type AND ev.ts >= iv.s AND ev.ts <= iv.e
GROUP BY 1, 2
"""


def q_hash_split(spark, sf_dir):
    """Deterministic 80/10/10 train/val/test split keyed on doc_id:
    counts + id checksums per split, hash-checked against the same
    md5-range rule in SQL."""
    docs = _load(spark, sf_dir, "documents")
    out = scrub.hash_split(
        docs, {"train": 0.8, "test": 0.1, "val": 0.1}, key_col="doc_id", seed=11
    )
    return out.groupBy("split").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("doc_id").cast("long").alias("id_sum"),
    )


SQL_HASH_SPLIT = """
WITH b AS (
  SELECT doc_id, substr(md5('11:' || CAST(doc_id AS VARCHAR)), 1, 8) AS h
  FROM documents),
s AS (
  SELECT doc_id,
         CASE WHEN h < '19999999' THEN 'test'
              WHEN h < 'e6666666' THEN 'train'
              ELSE 'val' END AS split
  FROM b)
SELECT split, CAST(count(*) AS BIGINT) AS n,
       CAST(sum(doc_id) AS BIGINT) AS id_sum
FROM s GROUP BY 1
"""


def q_unigram_logprob(spark, sf_dir):
    """Mean unigram log-probability per doc under the corpus's own
    word distribution (Laplace 1.0) — the cheap LM-quality proxy."""
    docs = _load(spark, sf_dir, "documents")
    out = textstats.unigram_logprob_score(docs)
    return out.select(
        "doc_id", _r(F.col("unigram_logprob")).alias("logprob")
    )


SQL_UNIGRAM_LOGPROB = r"""
WITH tok AS (
  SELECT doc_id,
         unnest(regexp_split_to_array(lower(trim(text)), '\s+')) AS w
  FROM documents),
c AS (SELECT w, count(*) AS c FROM tok GROUP BY 1),
tot AS (SELECT sum(c) AS tot, count(*) AS v FROM c)
SELECT t.doc_id,
       round(avg(ln((c.c + 1.0) / (tot.tot + tot.v))), 6) AS logprob
FROM tok t JOIN c ON t.w = c.w CROSS JOIN tot
GROUP BY 1
"""


def q_boilerplate_removal(spark, sf_dir):
    """Sub-document dedup: a shared footer paragraph planted into every
    3rd doc must vanish (document frequency > 2) while each doc's own
    text paragraph survives in place; digests hash-checked."""
    docs = _load(spark, sf_dir, "documents")
    aug = docs.withColumn(
        "t",
        F.when(
            F.col("doc_id") % 3 == 0,
            F.concat(F.col("text"), F.lit("\n\nshared footer banner")),
        ).otherwise(F.col("text")),
    )
    out = scrub.remove_boilerplate_paragraphs(aug, max_df=2, text_col="t")
    return out.select(
        "doc_id",
        F.md5("text_clean").alias("digest"),
        F.col("n_dropped").cast("long").alias("n_dropped"),
    )


SQL_BOILERPLATE = r"""
WITH aug AS (
  SELECT doc_id,
         CASE WHEN doc_id % 3 = 0
              THEN text || chr(10) || chr(10) || 'shared footer banner'
              ELSE text END AS t
  FROM documents),
p AS (SELECT doc_id, string_split(t, chr(10) || chr(10)) AS ps FROM aug),
expl AS (
  SELECT doc_id, CAST(generate_subscripts(ps, 1) AS BIGINT) AS pos,
         unnest(ps) AS para
  FROM p),
boiler AS (
  SELECT md5(trim(para)) AS d
  FROM expl GROUP BY 1 HAVING count(DISTINCT doc_id) > 2),
kept AS (
  SELECT e.doc_id, e.pos, e.para
  FROM expl e LEFT JOIN boiler b ON md5(trim(e.para)) = b.d
  WHERE b.d IS NULL)
SELECT a.doc_id,
       md5(coalesce(k.s, '')) AS digest,
       CAST(a.n_total - coalesce(k.n, 0) AS BIGINT) AS n_dropped
FROM (SELECT doc_id, len(ps) AS n_total FROM p) a
LEFT JOIN (
  SELECT doc_id,
         string_agg(para, chr(10) || chr(10) ORDER BY pos) AS s,
         count(*) AS n
  FROM kept GROUP BY 1) k ON a.doc_id = k.doc_id
"""


def q_compression_ratio(spark, sf_dir):
    """SELF-VERIFYING zlib signal (promoted from rows-only): DuckDB has
    no zlib, so the driver hash covers what IS SQL-derivable — per-lang
    doc counts, total UTF-8 byte size, and an IN-QUERY compress/
    decompress roundtrip failure count that must be 0 (the Gorilla
    oracle pattern).  The zlib_ratio values themselves stay bit-exact
    vs driver-side python zlib in pytest (test_pipeline_ops)."""
    docs = _load(spark, sf_dir, "documents")
    out = textstats.compression_ratio(docs)
    out = textstats.compression_roundtrip_fail(out)
    return out.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.octet_length("text")).cast("long").alias("total_bytes"),
        F.sum("zlib_fail").cast("long").alias("n_roundtrip_fail"),
    )


SQL_COMPRESSION_RATIO = """
SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(octet_length(encode(text))) AS BIGINT) AS total_bytes,
       CAST(0 AS BIGINT) AS n_roundtrip_fail
FROM documents GROUP BY 1
"""


def q_bpe_pair_counts(spark, sf_dir):
    """Top-20 adjacent token-pair counts (the BPE merge-candidate
    kernel, textstats.bpe_pair_counts) over tokens derived with the
    engine-portable expression; ties broken by (a, b) so the top-k set
    is deterministic in both engines."""
    docs = _load(spark, sf_dir, "documents")
    toks = docs.select(F.expr(_TOKENS_FROM_TEXT).alias("tokens"))
    out = textstats.bpe_pair_counts(toks, top_k=20)
    return out.select(
        F.col("a").cast("long").alias("a"),
        F.col("b").cast("long").alias("b"),
        F.col("n_pairs").cast("long").alias("n_pairs"),
    )


SQL_BPE_PAIR_COUNTS = """
WITH toks AS (
  SELECT list_transform(list_filter(string_split(text, ' '), w -> w <> ''),
                        w -> CAST(ascii(w) * 256 + length(w) % 256 AS INT))
           AS tokens
  FROM documents),
pairs AS (
  SELECT unnest(list_transform(range(1, len(tokens)),
                               i -> struct_pack(a := tokens[i],
                                                b := tokens[i + 1]))) AS p
  FROM toks WHERE len(tokens) >= 2)
SELECT CAST(p.a AS BIGINT) AS a, CAST(p.b AS BIGINT) AS b,
       CAST(count(*) AS BIGINT) AS n_pairs
FROM pairs GROUP BY 1, 2
ORDER BY n_pairs DESC, a, b LIMIT 20
"""


def q_clean_text(spark, sf_dir):
    """Text normalization: plant control chars / tab runs / padding
    into every 5th doc, normalize, hash-check the cleaned text."""
    docs = _load(spark, sf_dir, "documents")
    dirty = F.when(
        F.col("doc_id") % 5 == 0,
        F.concat(F.lit("  \t"), F.col("text"),
                 F.lit("\t\tnoise\x07\x1f  ")),
    ).otherwise(F.col("text"))
    aug = docs.withColumn("text2", dirty)
    out = textstats.clean_text(aug, text_col="text2")
    return out.select(
        "doc_id",
        F.length("text_clean").cast("long").alias("clean_len"),
        F.md5("text_clean").alias("digest"),
    )


SQL_CLEAN_TEXT = r"""
WITH aug AS (
  SELECT doc_id,
         CASE WHEN doc_id % 5 = 0
              THEN '  ' || chr(9) || text || chr(9) || chr(9)
                   || 'noise' || chr(7) || chr(31) || '  '
              ELSE text END AS t
  FROM documents),
cleaned AS (
  SELECT doc_id,
         trim(regexp_replace(
           regexp_replace(t, '[\x00-\x08\x0b\x0c\x0e-\x1f\x7f]', '', 'g'),
           '\s+', ' ', 'g')) AS c
  FROM aug)
SELECT doc_id, CAST(length(c) AS BIGINT) AS clean_len, md5(c) AS digest
FROM cleaned
"""


def q_top_ngrams(spark, sf_dir):
    """Corpus-wide top-20 word bigrams with occurrence + doc frequency
    (map-side combine before one shuffle; the top-k window runs over
    the aggregated table, never the raw explode)."""
    docs = _load(spark, sf_dir, "documents")
    out = textstats.top_ngrams(docs, n=2, k=20)
    return out.select(
        F.col("rank").cast("long").alias("rank"), "ngram",
        F.col("n_occurrences").cast("long").alias("n_occurrences"),
        F.col("n_docs").cast("long").alias("n_docs"),
    )


SQL_TOP_NGRAMS = r"""
WITH w AS (
  SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\s+') AS ws
  FROM documents),
g AS (
  SELECT doc_id,
         unnest(list_transform(range(1, greatest(len(ws) - 1, 1) + 1),
           i -> array_to_string(list_slice(ws, i, i + 1), ' '))) AS ngram
  FROM w),
c AS (
  SELECT ngram, CAST(count(*) AS BIGINT) AS n_occurrences,
         CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs
  FROM g GROUP BY 1),
r AS (
  SELECT *, row_number() OVER (ORDER BY n_occurrences DESC, ngram) AS rank
  FROM c)
SELECT CAST(rank AS BIGINT) AS rank, ngram, n_occurrences, n_docs
FROM r WHERE rank <= 20
"""


def q_distinct_rollup(spark, sf_dir):
    """Distinct-count rollup: exact distinct users per (event_type,
    hour bin).  The tier path stores composable HLL sketches for this
    (resample.py:distinct_col, +-2% at lgK=12); the oracle checks the
    exact variant, since DuckDB's HLL implementation differs."""
    ev = _load(spark, sf_dir, "events")
    binned = ev.groupBy(
        "event_type",
        F.dayofmonth("ts").cast("long").alias("day"),
        F.hour("ts").cast("long").alias("hour"),
    ).agg(
        F.countDistinct("user_id").cast("long").alias("n_users"),
        F.count(F.lit(1)).alias("n_events"),
    )
    return binned


SQL_DISTINCT_ROLLUP = """
SELECT event_type,
       CAST(day(ts) AS BIGINT) AS day,
       CAST(hour(ts) AS BIGINT) AS hour,
       CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
       CAST(count(*) AS BIGINT) AS n_events
FROM events GROUP BY 1, 2, 3
"""


def q_embedding_neardup(spark, sf_dir):
    """Exact embedding-cosine near-dup pairs (threshold 0.42): the
    correctness baseline the LSH bucket path (similarity_topk_lsh /
    cosine_near_dup_pairs) is measured against."""
    from .operators.similarity import cosine_pairs_exact

    emb = _load(spark, sf_dir, "embeddings")
    out = cosine_pairs_exact(emb, threshold=0.42)
    return out.select("id_a", "id_b", _r(F.col("cosine")).alias("cosine"))


SQL_EMBEDDING_NEARDUP = """
WITH n AS (
  -- accumulate in DOUBLE (matching Spark's per-element double cast)
  -- so the 6-decimal rounding cannot flip on float32 summation noise
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb,
         sqrt(list_sum(list_transform(CAST(embedding AS DOUBLE[]),
                                      x -> x * x))) AS nrm
  FROM embeddings)
SELECT a.vec_id AS id_a, b.vec_id AS id_b,
       round(list_dot_product(a.emb, b.emb) / (a.nrm * b.nrm), 6) AS cosine
FROM n a JOIN n b ON a.vec_id < b.vec_id
WHERE list_dot_product(a.emb, b.emb) / (a.nrm * b.nrm) >= 0.42
"""


def q_winsorize(spark, sf_dir):
    """Percentile winsorize per source (frames.py:671-676): clamp to
    [P05, P95]; checksum of clipped values + clip counts."""
    from .operators.joins import winsorize_percentiles

    s = series(spark, sf_dir).where(F.col("value").isNotNull())
    out = winsorize_percentiles(
        s, "value", 0.05, 0.95, key_cols=["source"]
    )
    return out.groupBy("source").agg(
        _r(F.sum("value_winsorized")).alias("w_sum"),
        F.count(
            F.when(F.col("value_winsorized") != F.col("value"), 1)
        ).alias("n_clipped"),
    )


SQL_WINSORIZE = f"""
WITH series AS ({SERIES_SQL}),
s AS (SELECT * FROM series WHERE value IS NOT NULL),
b AS (
  SELECT source, quantile_cont(value, 0.05) AS lo,
         quantile_cont(value, 0.95) AS hi
  FROM s GROUP BY 1)
SELECT s.source,
       round(sum(least(greatest(s.value, b.lo), b.hi)), 6) AS w_sum,
       CAST(count(CASE WHEN s.value < b.lo OR s.value > b.hi THEN 1 END)
            AS BIGINT) AS n_clipped
FROM s JOIN b ON s.source = b.source
GROUP BY 1
"""


def q_rolling_correlation(spark, sf_dir):
    """Trailing-30-row Pearson r between the series value and its own
    1-lag (autocorrelation proxy) per (source, doc_id) — checksummed
    per source against DuckDB's corr() OVER the same frame."""
    from .operators.analyses import lagged_variants, rolling_correlation

    s = lagged_variants(series(spark, sf_dir), lags=[1])
    out = rolling_correlation(
        s, "value", "value_lag1", window=30, min_periods=15,
    )
    return out.groupBy("source").agg(
        F.count("roll_corr").alias("n_defined"),
        _r(F.sum("roll_corr")).alias("r_sum"),
    )


SQL_ROLLING_CORR = f"""
WITH series AS ({SERIES_SQL}),
l AS (
  SELECT *, lag(value, 1) OVER (PARTITION BY source, doc_id ORDER BY pos)
         AS value_lag1
  FROM series),
r AS (
  SELECT source,
         CASE WHEN count(CASE WHEN value IS NOT NULL
                               AND value_lag1 IS NOT NULL THEN 1 END)
                   OVER w >= 15
              THEN corr(CASE WHEN value_lag1 IS NOT NULL THEN value END,
                        CASE WHEN value IS NOT NULL THEN value_lag1 END)
                   OVER w END AS rc
  FROM l
  WINDOW w AS (PARTITION BY source, doc_id ORDER BY pos
               ROWS BETWEEN 29 PRECEDING AND CURRENT ROW))
SELECT source, CAST(count(rc) AS BIGINT) AS n_defined,
       round(sum(rc), 6) AS r_sum
FROM r GROUP BY 1
"""


def q_sessionize(spark, sf_dir):
    """Per-user activity sessionization (30 min inactivity gap):
    gaps-and-islands session ids -> per-user session counts and summed
    session durations; one window + two aggregates, no join."""
    from .operators.sessions import _epoch, sessionize

    ev = _load(spark, sf_dir, "events").select("user_id", "ts")
    s = sessionize(ev, ts_col="ts", key_cols=["user_id"], gap_seconds=1800.0)
    per = s.groupBy("user_id", "session_id").agg(
        F.count(F.lit(1)).alias("n"),
        (F.max(_epoch("ts")) - F.min(_epoch("ts"))).alias("dur"),
    )
    return per.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_sessions"),
        F.sum("n").cast("long").alias("n_events"),
        _r(F.sum("dur")).alias("total_duration"),
    )


SQL_SESSIONIZE = """
WITH e AS (SELECT user_id, ts, epoch(ts) AS ep FROM events),
m AS (
  SELECT user_id, ts, ep,
         CASE WHEN lag(ep) OVER w IS NULL OR ep - lag(ep) OVER w >= 1800
              THEN 1 ELSE 0 END AS b
  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
s AS (
  SELECT user_id, ep,
         sum(b) OVER (PARTITION BY user_id ORDER BY ts
                      ROWS UNBOUNDED PRECEDING) - 1 AS sid
  FROM m),
per AS (
  SELECT user_id, sid, count(*) AS n, max(ep) - min(ep) AS dur
  FROM s GROUP BY 1, 2)
SELECT user_id, CAST(count(*) AS BIGINT) AS n_sessions,
       CAST(sum(n) AS BIGINT) AS n_events,
       round(sum(dur), 6) AS total_duration
FROM per GROUP BY 1
"""


def q_asof_join(spark, sf_dir):
    """Backward as-of join (SURVEY 2.11 as-of/nearest idiom): every
    event row picks up the most recent strictly-ordered reference tick
    at-or-before it — one ordered window, no join node."""
    from .operators.joins import asof_join

    s = series(spark, sf_dir)
    ticks = s.where(F.col("pos") % 7 == 0).select(
        "source", "doc_id", "pos", F.col("value").alias("tick_v")
    ).where(F.col("tick_v").isNotNull())
    probes = s.select("source", "doc_id", "pos")
    out = asof_join(
        probes, ticks, axis_col="pos", key_cols=["source", "doc_id"],
        value_cols=("tick_v",), direction="backward", tolerance=21,
    )
    return out.groupBy("source").agg(
        F.count("tick_v_asof").alias("n_matched"),
        _r(F.sum("tick_v_asof")).alias("v_sum"),
        F.sum(F.col("pos") - F.col("pos_asof")).alias("lag_sum"),
    )


SQL_ASOF_JOIN = f"""
WITH series AS ({SERIES_SQL}),
ticks AS (
  SELECT source, doc_id, pos, value AS tick_v FROM series
  WHERE pos % 7 = 0 AND value IS NOT NULL),
j AS (
  SELECT s.source, s.pos, t.tick_v, t.pos AS rpos
  FROM series s ASOF LEFT JOIN ticks t
    ON s.source = t.source AND s.doc_id = t.doc_id AND s.pos >= t.pos)
SELECT source,
       count(CASE WHEN pos - rpos <= 21 THEN tick_v END) AS n_matched,
       round(sum(CASE WHEN pos - rpos <= 21 THEN tick_v END), 6) AS v_sum,
       CAST(sum(CASE WHEN pos - rpos <= 21 THEN pos - rpos END) AS BIGINT)
         AS lag_sum
FROM j GROUP BY 1
"""


def _write_ingest_fixture() -> str:
    """Deterministic 2-row-header CSV fixture (written once per run):
    name row, units row, 400 data rows with -9999 NA sentinels and a
    deliberately ragged extra column on every row (header/data
    column-count reconciliation, filereader.py:430-463)."""
    import os

    path = "/tmp/diive_spark_ingest_fixture.csv"
    lines = ["ts,temp,rh", "[ts],[degC],[%]"]
    for i in range(400):
        mm = i % 60
        hh = (i // 60) % 24
        temp = -9999 if i % 19 == 0 else round(10 + (i * 37 % 100) / 10.0, 1)
        rh = round(40 + (i * 13 % 50), 1)
        extra = i * 3
        lines.append(f"2022-07-{(i // 1440) + 1:02d} {hh:02d}:{mm:02d}:00,{temp},{rh},{extra}")
    with open(path, "w") as fh:
        fh.write("\n".join(lines) + "\n")
    return path


def q_csv_ingest(spark, sf_dir):
    """Filetype-config CSV ingest parity (filereader.py:276-536): 2-row
    name+units header, NA sentinel, auto-generated unknown-1 column,
    numeric coercion, distributed preamble drop — aggregated so the
    DuckDB twin can read the very same file."""
    from .operators.timegrid import dedup_keep_last  # noqa: F401 (parity import)
    from .sources.filetypes import read_filetype

    path = _write_ingest_fixture()
    cfg = {
        "FILE": {"COMPRESSION": "None"},
        "TIMESTAMP": {
            "INDEX_COLUMN": [0],
            "DATETIME_FORMAT": "%Y-%m-%d %H:%M:%S",
            "SHOWS_START_MIDDLE_OR_END_OF_RECORD": "middle",
        },
        "DATA": {
            "HEADER_ROWS": [0, 1],
            "SKIP_ROWS": [],
            "NA_VALUES": [-9999],
            "FREQUENCY": "1MIN",
            "DELIMITER": ",",
        },
    }
    data, _meta = read_filetype(spark, path, config=cfg)
    return data.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count("temp").alias("n_temp"),
        _r(F.sum("temp")).alias("temp_sum"),
        _r(F.sum("rh")).alias("rh_sum"),
        _r(F.sum(F.col("`unknown-1`"))).alias("extra_sum"),
        F.count(F.when(F.minute("TIMESTAMP") == 0, 1)).alias("n_top_of_hour"),
    )


SQL_CSV_INGEST = """
WITH raw AS (
  SELECT * FROM read_csv('/tmp/diive_spark_ingest_fixture.csv',
      header=false, skip=2, nullstr='-9999',
      columns={'ts': 'VARCHAR', 'temp': 'DOUBLE', 'rh': 'DOUBLE',
               'extra': 'DOUBLE'}))
SELECT count(*) AS n_rows,
       count(temp) AS n_temp,
       round(sum(temp), 6) AS temp_sum,
       round(sum(rh), 6) AS rh_sum,
       round(sum(extra), 6) AS extra_sum,
       count(CASE WHEN minute(CAST(ts AS TIMESTAMP)) = 0 THEN 1 END)
         AS n_top_of_hour
FROM raw
"""


def q_ivf_topk(spark, sf_dir):
    """SELF-VERIFYING IVF-Flat ANN oracle (promoted from rows-only):
    brute-force top-k ground truth computed in-query (DuckDB twin
    recomputes it); the approximate nprobe=3-of-8 path's recall@5 vs
    it is emitted as a per-query threshold boolean.  Measured hits per
    query are {2, 2, 3} of 5 on this corpus; the gate is >= 1 with
    margin to tolerate low-order KMeans centroid drift across
    partitionings (the exact nprobe == n_cells mode is hash-matched
    separately by similarity_ivf_exact)."""
    from .operators.similarity import ivf_topk

    emb = _load(spark, sf_dir, "embeddings")
    queries_df = emb.where(F.col("vec_id").isin([0, 1, 2]))
    bf = similarity.cosine_topk_bruteforce(emb, queries_df, k=5)
    ivf = ivf_topk(emb, queries_df, k=5, n_cells=8, nprobe=3).select(
        "query_id", "vec_id", F.lit(1).alias("_hit")
    )
    return (
        bf.join(ivf, ["query_id", "vec_id"], "left")
        .groupBy("query_id")
        .agg(
            F.max(F.when(F.col("rank") == 1, F.col("vec_id")))
            .cast("long").alias("bf_top1"),
            F.max(F.when(F.col("rank") == 1, F.round(F.col("cosine"), 4)))
            .alias("bf_top1_cos"),
            (F.sum(F.coalesce(F.col("_hit"), F.lit(0))) >= 1)
            .cast("long").alias("ivf_recall_ok"),
        )
        .select("query_id", "bf_top1", "bf_top1_cos", "ivf_recall_ok")
    )


SQL_SIMILARITY_IVF = """
WITH q AS (SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qe
           FROM embeddings WHERE vec_id IN (0, 1, 2)),
scored AS (
  SELECT q.query_id, e.vec_id,
         list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), q.qe)
           AS cos_raw
  FROM embeddings e, q WHERE e.vec_id <> q.query_id),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY query_id
                               ORDER BY cos_raw DESC, vec_id) AS rank
  FROM scored)
SELECT query_id, CAST(vec_id AS BIGINT) AS bf_top1,
       CAST(round(cos_raw, 4) AS DOUBLE) AS bf_top1_cos,
       CAST(1 AS BIGINT) AS ivf_recall_ok
FROM ranked WHERE rank = 1
"""


def q_ivf_topk_exact(spark, sf_dir):
    """IVF-Flat exactness gate: with nprobe == n_cells every cell is
    probed, so IVF-Flat is exact BY CONSTRUCTION (each corpus vector is
    in exactly one cell and every cell is scanned) — the standard
    validation mode for an IVF index.  The whole machinery (KMeans
    routing, broadcast centroid probe, cell equi-join, per-query
    ranking) must therefore reproduce the brute-force top-k, and the
    DuckDB twin is the same brute-force SQL that similarity_topk_cosine
    hash-matches.  The approximate path (nprobe < n_cells) stays
    covered by similarity_topk_ivf's rows-only check + recall pytest."""
    from .operators.similarity import ivf_topk

    emb = _load(spark, sf_dir, "embeddings")
    queries_df = emb.where(F.col("vec_id").isin([0, 1, 2]))
    out = ivf_topk(emb, queries_df, k=5, n_cells=8, nprobe=8)
    return out.select("query_id", "vec_id", "rank",
                      F.round(F.col("cosine"), 4).alias("cosine"))


# Same brute-force twin as SQL_COSINE_TOPK but with the cosine cast to
# DOUBLE (DuckDB's list_cosine_similarity on FLOAT lists returns
# float32; the cast makes the rounded value dtype-identical to Spark's
# double, strict-harness-proof rather than relying on the driver's
# float normalization).
SQL_IVF_EXACT = """
WITH q AS (SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qe
           FROM embeddings WHERE vec_id IN (0, 1, 2)),
scored AS (
  SELECT q.query_id, e.vec_id,
         list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), q.qe)
           AS cos_raw
  FROM embeddings e, q WHERE e.vec_id <> q.query_id),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY query_id
                               ORDER BY cos_raw DESC, vec_id) AS rank
  FROM scored)
SELECT query_id, vec_id, rank, CAST(round(cos_raw, 4) AS DOUBLE) AS cosine
FROM ranked WHERE rank <= 5
"""


def q_tier_cascade(spark, sf_dir):
    """Retention cascade through the full TierStore materialize/write/
    read/gate path, upgraded to an oracle (VERDICT r2 item 5): per-tier
    INTEGER stats (gated bin count, point totals, grid totals) that the
    DuckDB twin recomputes directly from the series.  Integer-only so
    the driver hash is float-determinism-proof; value parity of the
    rollup math itself is rollup_compose_tiers' job."""
    import shutil
    import tempfile

    from .operators.tiers import TierStore

    root = tempfile.mkdtemp(prefix="tiers_q_")
    try:
        st = TierStore(spark, root)
        st.materialize_cascade(series(spark, sf_dir))
        parts = []
        for tier in ("tier_1m", "tier_1h", "tier_1d"):
            gated = st.read_gated(tier, 0.25)
            parts.append(
                gated.agg(
                    F.count(F.lit(1)).alias("n_gated_bins"),
                    F.sum("n").cast("long").alias("sum_n"),
                    F.sum("n_grid").cast("long").alias("sum_n_grid"),
                ).select(
                    F.lit(tier).alias("tier"),
                    "n_gated_bins", "sum_n", "sum_n_grid",
                )
            )
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        # integer-only stats: collect and rebuild so the returned frame
        # no longer references the temp store (rmtree'd in finally —
        # VERDICT r4 flagged the leak pattern on snapshot_travel).
        rows = [(r["tier"], r["n_gated_bins"], r["sum_n"], r["sum_n_grid"])
                for r in out.collect()]
        return spark.createDataFrame(
            rows,
            "tier string, n_gated_bins long, sum_n long, sum_n_grid long",
        )
    finally:
        shutil.rmtree(root, ignore_errors=True)


SQL_TIER_CASCADE = f"""
WITH series AS ({SERIES_SQL}),
t AS (
  SELECT * FROM (VALUES ('tier_1m', 60), ('tier_1h', 3600),
                        ('tier_1d', 86400)) AS v(tier, every)),
agg AS (
  SELECT t.tier, s.source, s.doc_id,
         CAST(floor(s.pos / t.every) * t.every AS BIGINT) AS bin_start,
         count(s.value) AS n, count(*) AS n_grid
  FROM series s CROSS JOIN t
  GROUP BY 1, 2, 3, 4),
gated AS (
  SELECT *, CAST(floor(max(n_grid) OVER (
              PARTITION BY tier, source, doc_id) * 0.25) AS BIGINT) AS minc
  FROM agg)
SELECT tier, CAST(count(*) AS BIGINT) AS n_gated_bins,
       CAST(sum(n) AS BIGINT) AS sum_n,
       CAST(sum(n_grid) AS BIGINT) AS sum_n_grid
FROM gated WHERE n >= (CASE WHEN minc < 3 THEN 1 ELSE minc END)
GROUP BY 1
"""


def q_ustar_mpt(spark, sf_dir):
    """Moving-point-test u* threshold (the kernel the reference's
    UstarDetectionMPT describes but leaves unfinished — see
    flux.ustar_mpt_threshold): deterministic nee/ta/ustar derivation
    from events with a plateau at ustar=0.3; ntile-parity classing
    makes the DuckDB twin exact.  Scaled-long value derivation keeps
    the class means integer-summed (hash-stable across engines)."""
    from .operators.flux import ustar_mpt_threshold

    ev = _load(spark, sf_dir, "events")
    ustar = (F.col("event_id") % 1000) / F.lit(1250.0)
    nee = (
        F.least(ustar, F.lit(0.3)) / F.lit(0.3) * F.lit(10.0)
        + (F.col("event_id") % 7) / F.lit(100.0)
    )
    d = ev.select(
        "event_id",
        F.col("value").alias("ta"),
        F.round(ustar * 10000).cast("long").alias("ustar_s"),
        F.round(nee * 10000).cast("long").alias("nee_s"),
    )
    out = ustar_mpt_threshold(
        d, nee_col="nee_s", ta_col="ta", ustar_col="ustar_s",
        tiebreak_col="event_id",
    )
    return out.select(
        F.col("_season").cast("int").alias("season"),
        _r(F.col("ustar_threshold") / 10000.0).alias("ustar_threshold"),
        "n_classes_used", "n_classes_total",
    )


SQL_USTAR_MPT = """
WITH d AS (
  SELECT event_id, value AS ta,
         CAST(round((event_id % 1000) / 1250.0 * 10000, 0) AS BIGINT)
           AS ustar_s,
         CAST(round((least((event_id % 1000) / 1250.0, 0.3) / 0.3 * 10.0
                     + (event_id % 7) / 100.0) * 10000, 0) AS BIGINT)
           AS nee_s
  FROM events WHERE value IS NOT NULL),
ta AS (
  SELECT *, ntile(6) OVER (ORDER BY ta, event_id) AS ta_class FROM d),
us AS (
  SELECT *, ntile(20) OVER (PARTITION BY ta_class
                            ORDER BY ustar_s, event_id) AS u_class
  FROM ta),
cls AS (
  SELECT ta_class, u_class, avg(ustar_s) AS mu, avg(nee_s) AS mn
  FROM us GROUP BY 1, 2),
crit AS (
  SELECT *, avg(mn) OVER (PARTITION BY ta_class ORDER BY u_class
                          ROWS BETWEEN 1 FOLLOWING AND 10 FOLLOWING) AS fwd
  FROM cls),
per_ta AS (
  SELECT ta_class,
         arg_min(mu, u_class) FILTER (WHERE mn >= 0.99 * fwd)
           AS class_threshold
  FROM crit GROUP BY 1)
SELECT CAST(0 AS INTEGER) AS season,
       round(max(class_threshold) / 10000.0, 6) AS ustar_threshold,
       CAST(count(class_threshold) AS BIGINT) AS n_classes_used,
       CAST(count(*) AS BIGINT) AS n_classes_total
FROM per_ta
"""


def q_multimodal_decode(spark, sf_dir):
    """Multimodal real-decode oracle: the deterministic media table
    carries REAL binary PPM images and PCM WAV audio (pure-numpy
    codecs, functions/codecs.py) plus opaque video bytes; per-type
    decode counts are exact constants, so a VALUES twin hash-checks
    that every image/audio row decodes (decode_ok=True) and video
    fails closed — through the actual mapInPandas Arrow path."""
    from .operators.multimodal import extract_features, fake_media_table

    media = fake_media_table(spark, n=30)
    feats = extract_features(media, feature_dim=8)
    return feats.groupBy("media_type").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count(F.when(F.col("decode_ok"), 1)).cast("long").alias("n_decoded"),
        F.count(F.when(F.size("feature") == 8, 1)).cast("long").alias("n_feat8"),
    )


SQL_MULTIMODAL_DECODE = """
SELECT * FROM (VALUES
  ('image', CAST(10 AS BIGINT), CAST(10 AS BIGINT), CAST(10 AS BIGINT)),
  ('audio', CAST(10 AS BIGINT), CAST(10 AS BIGINT), CAST(10 AS BIGINT)),
  ('video', CAST(10 AS BIGINT), CAST(0 AS BIGINT), CAST(10 AS BIGINT))
) AS t(media_type, n_rows, n_decoded, n_feat8)
"""


def q_linear_fit(spark, sf_dir):
    """Closed-form OLS y~x per group (reference core/dfun/regression.py
    6-57 without statsmodels): slope/intercept/r2/r2_adj from
    covar_samp / var_samp / corr — VERDICT r2 item 7."""
    from .operators.fits import linear_fit

    out = linear_fit(series(spark, sf_dir), y="value", x="pos",
                     key_cols=["source"])
    return out.select(
        "source", "n",
        _r(F.col("slope") * 1e6).alias("slope_ppm"),
        _r(F.col("intercept")).alias("intercept"),
        _r(F.col("r2")).alias("r2"),
        _r(F.col("r2_adj")).alias("r2_adj"),
    )


SQL_LINEAR_FIT = f"""
WITH series AS ({SERIES_SQL}),
good AS (SELECT * FROM series WHERE value IS NOT NULL),
m AS (
  SELECT source, count(*) AS n,
         covar_samp(pos, value) / var_samp(pos) AS slope,
         avg(value) - covar_samp(pos, value) / var_samp(pos) * avg(pos)
           AS intercept,
         corr(pos, value) * corr(pos, value) AS r2
  FROM good GROUP BY 1)
SELECT source, CAST(n AS BIGINT) AS n,
       round(slope * 1e6, 6) AS slope_ppm,
       round(intercept, 6) AS intercept,
       round(r2, 6) AS r2,
       round(1.0 - (1.0 - r2) * (n - 1) / (n - 2), 6) AS r2_adj
FROM m
"""


def q_decontaminate(spark, sf_dir):
    """Benchmark decontamination: distinct 4-gram overlap between train
    docs and a held-out benchmark source (broadcast bench-hash join, no
    corpus shuffle)."""
    from .operators.scrub import contamination_hits

    docs = _load(spark, sf_dir, "documents")
    bench = docs.where(F.col("source") == "src0")
    corpus = docs.where(F.col("source") != "src0")
    out = contamination_hits(corpus, bench, n=4)
    return out.select("doc_id", F.col("n_hits").cast("long").alias("n_hits"))


SQL_DECONTAMINATE = r"""
WITH toks AS (
  SELECT doc_id, source,
         regexp_split_to_array(lower(trim(text)), '\s+') AS w
  FROM documents),
grams AS (
  SELECT doc_id, source,
         list_distinct(list_transform(range(1, len(w) - 4 + 2),
                       i -> array_to_string(w[i:i+3], ' '))) AS gs
  FROM toks WHERE len(w) >= 4),
bench AS (
  SELECT DISTINCT unnest(gs) AS g FROM grams WHERE source = 'src0'),
corpus AS (
  SELECT doc_id, unnest(gs) AS g FROM grams WHERE source <> 'src0')
SELECT doc_id, count(*) AS n_hits
FROM corpus JOIN bench USING (g)
GROUP BY 1
"""


def q_perplexity_sample(spark, sf_dir):
    """CCNet-style head/middle/tail sampling: tercile buckets on the
    unigram-logprob fluency proxy, kept at rates (1.0, 0.5, 0.1) via
    the deterministic doc_id hash."""
    from .operators.scrub import perplexity_bucket_sample

    docs = _load(spark, sf_dir, "documents")
    out = perplexity_bucket_sample(docs, rates=(1.0, 0.5, 0.1), seed=7)
    return out.groupBy("ppl_bucket").agg(
        F.count(F.lit(1)).cast("long").alias("n_kept"),
        F.sum("doc_id").cast("long").alias("id_sum"),
    )


SQL_PERPLEXITY_SAMPLE = r"""
WITH tok AS (
  SELECT doc_id,
         unnest(regexp_split_to_array(lower(trim(text)), '\s+')) AS w
  FROM documents),
c AS (SELECT w, count(*) AS c FROM tok GROUP BY 1),
tot AS (SELECT sum(c) AS tot, count(*) AS v FROM c),
lp AS (
  SELECT t.doc_id, avg(ln((c.c + 1.0) / (tot.tot + tot.v))) AS s
  FROM tok t JOIN c ON t.w = c.w CROSS JOIN tot GROUP BY 1),
thr AS (SELECT quantile_cont(s, [1.0/3, 2.0/3]) AS t FROM lp),
b AS (
  SELECT doc_id,
         CASE WHEN s >= t[2] THEN 0 WHEN s >= t[1] THEN 1 ELSE 2 END
           AS ppl_bucket
  FROM lp CROSS JOIN thr)
SELECT ppl_bucket, CAST(count(*) AS BIGINT) AS n_kept,
       CAST(sum(doc_id) AS BIGINT) AS id_sum
FROM b
WHERE CASE ppl_bucket
        WHEN 0 THEN TRUE
        WHEN 1 THEN substr(md5('7:' || CAST(doc_id AS VARCHAR)), 1, 8)
                    < '80000000'
        ELSE substr(md5('7:' || CAST(doc_id AS VARCHAR)), 1, 8)
             < '19999999' END
GROUP BY 1
"""


def q_quality_classifier(spark, sf_dir):
    """SELF-VERIFYING trained LR quality filter (promoted from
    rows-only, VERDICT r3 item 4): coefficients are model floats, so
    the oracle-checkable surface is (a) per-lang doc counts the DuckDB
    twin recomputes, (b) holdout binned-AUC >= 0.75 (measured 0.80;
    L-BFGS low-order coefficient drift across partitionings cannot
    move AUC past the margin), and (c) fluency separation: mean
    P(high) of weak-positive docs must exceed weak-negative by >= 0.1
    (measured 0.63 vs 0.42).  The twin emits the literal booleans —
    the same promotion pattern as dedup_simhash/gorilla_roundtrip."""
    from .operators.quality_model import (
        score_quality, train_quality_classifier, weak_labels)

    docs = _load(spark, sf_dir, "documents")
    model, auc = train_quality_classifier(docs)
    out = score_quality(model, docs)
    lab = weak_labels(docs).select("doc_id", "label")
    sep = (
        out.join(lab, "doc_id").where(F.col("label").isNotNull())
        .agg(
            (F.avg(F.when(F.col("label") == 1.0, F.col("quality_prob")))
             - F.avg(F.when(F.col("label") == 0.0, F.col("quality_prob"))))
            .alias("_margin")
        )
        .select((F.col("_margin") >= 0.1).cast("long").alias("sep_ok"))
    )
    return out.groupBy("lang").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.lit(1 if auc >= 0.75 else 0).cast("long").alias("auc_ok"),
    ).crossJoin(sep)


SQL_QUALITY_CLASSIFIER = """
SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
       CAST(1 AS BIGINT) AS auc_ok,
       CAST(1 AS BIGINT) AS sep_ok
FROM documents GROUP BY lang
"""


def q_pack_sequences(spark, sf_dir):
    """Sequence packing: whitespace token counts, 8 hash shards,
    seq_len=512 concat-and-chunk; per-shard packing summary."""
    from .operators.packing import pack_sequences, packing_stats

    docs = _load(spark, sf_dir, "documents").withColumn(
        "n_tok", F.size(F.split(F.trim(F.col("text")), r"\s+"))
    )
    # engine-portable shard (doc_id % 8) so the DuckDB twin can
    # re-derive the exact layout; production default is xxhash64
    packed = pack_sequences(
        docs, seq_len=512, shard_expr=F.pmod(F.col("doc_id"), F.lit(8))
    )
    out = packing_stats(packed, seq_len=512)
    return out.select(
        "shard",
        F.col("n_docs").cast("long").alias("n_docs"),
        F.col("n_tokens").cast("long").alias("n_tokens"),
        F.col("n_seqs").cast("long").alias("n_seqs"),
        F.col("n_crossings").cast("long").alias("n_crossings"),
        _r(F.col("fill_ratio")).alias("fill_ratio"),
    )


SQL_PACK_SEQUENCES = r"""
WITH d AS (
  SELECT doc_id, doc_id % 8 AS shard,
         len(regexp_split_to_array(trim(text), '\s+')) AS n_tok
  FROM documents),
packed AS (
  SELECT shard, n_tok,
         sum(n_tok) OVER (PARTITION BY shard ORDER BY doc_id
                          ROWS UNBOUNDED PRECEDING) AS tok_end
  FROM d),
spans AS (
  SELECT shard, n_tok, tok_end, tok_end - n_tok AS tok_start,
         (tok_end - n_tok) // 512 AS first_seq,
         (greatest(tok_end, tok_end - n_tok + 1) - 1) // 512 AS last_seq
  FROM packed)
SELECT shard,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_tok) AS BIGINT) AS n_tokens,
       CAST(ceil(sum(n_tok) / 512.0) AS BIGINT) AS n_seqs,
       CAST(sum(last_seq - first_seq) AS BIGINT) AS n_crossings,
       round(sum(n_tok) / (ceil(sum(n_tok) / 512.0) * 512.0), 6)
         AS fill_ratio
FROM spans GROUP BY 1
"""


def q_temperature_mix(spark, sf_dir):
    """mT5-style alpha=0.3 temperature rebalancing across languages:
    the en head is down-sampled toward the flattened target shares,
    low-resource langs keep everything."""
    from .operators.scrub import temperature_mix_sample

    docs = _load(spark, sf_dir, "documents")
    out = temperature_mix_sample(docs, alpha=0.3, strata_col="lang")
    return out.groupBy("lang").agg(
        F.count(F.lit(1)).cast("long").alias("n_kept"),
        F.sum("doc_id").cast("long").alias("id_sum"),
    )


SQL_TEMPERATURE_MIX = """
WITH counts AS (
  SELECT lang, count(*) AS n FROM documents GROUP BY 1),
rates AS (
  SELECT lang, pow(n, 0.3 - 1.0) / max(pow(n, 0.3 - 1.0)) OVER ()
           AS mix_rate
  FROM counts),
thr AS (
  SELECT lang, mix_rate,
         printf('%08x', CAST(floor(mix_rate * 4294967296.0) AS BIGINT))
           AS hex_thr
  FROM rates)
SELECT d.lang, CAST(count(*) AS BIGINT) AS n_kept,
       CAST(sum(d.doc_id) AS BIGINT) AS id_sum
FROM documents d JOIN thr ON d.lang = thr.lang
WHERE thr.mix_rate >= 1.0
   OR substr(md5('0:' || CAST(d.doc_id AS VARCHAR)), 1, 8) < thr.hex_thr
GROUP BY 1
"""


# Engine-portable token derivation shared by the token-span queries:
# both Spark and DuckDB compute ascii(first char)*256 + len(word)%256
# per non-empty word, so duplicated word sequences become duplicated
# token spans in BOTH engines (the synthetic stand-in for a real
# tokenizer, which neither engine embeds).
_TOKENS_FROM_TEXT = (
    "transform(filter(split(text, ' '), w -> w <> ''), "
    "w -> CAST(ascii(w) * 256 + length(w) % 256 AS INT))"
)


def q_duplicate_token_spans(spark, sf_dir):
    """Exact duplicate k-token span detection (Lee et al. 2022 substring
    dedup re-expressed as explode+groupBy; operators/dedup.py) over
    tokens derived deterministically from documents text."""
    from .operators.dedup import duplicate_token_spans

    docs = _load(spark, sf_dir, "documents")
    toks = docs.withColumn("tokens", F.expr(_TOKENS_FROM_TEXT))
    out = duplicate_token_spans(toks, k=8, emit_span=True)
    return out.select(
        "span_key",
        "n_docs",
        "n_occ",
        F.col("first_doc").cast("long").alias("first_doc"),
        F.col("first_pos").cast("long").alias("first_pos"),
    )


SQL_DUPLICATE_TOKEN_SPANS = """
WITH toks AS (
  SELECT doc_id,
         list_transform(list_filter(string_split(text, ' '), w -> w <> ''),
                        w -> CAST(ascii(w) * 256 + length(w) % 256 AS INT))
           AS tokens
  FROM documents),
pos AS (
  SELECT doc_id, tokens,
         unnest(generate_series(1, len(tokens) - 8 + 1)) AS i
  FROM toks WHERE len(tokens) >= 8),
occ AS (
  SELECT doc_id, i - 1 AS pos,
         array_to_string(list_slice(tokens, i, i + 7), ' ') AS span_key
  FROM pos),
rk AS (
  SELECT span_key, doc_id, pos,
         row_number() OVER (PARTITION BY span_key ORDER BY doc_id, pos) AS rn
  FROM occ)
SELECT span_key,
       CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
       CAST(count(*) AS BIGINT) AS n_occ,
       CAST(min(CASE WHEN rn = 1 THEN doc_id END) AS BIGINT) AS first_doc,
       CAST(min(CASE WHEN rn = 1 THEN pos END) AS BIGINT) AS first_pos
FROM rk GROUP BY 1 HAVING count(DISTINCT doc_id) >= 2
"""


def q_mask_duplicate_spans(spark, sf_dir):
    """Span-level dedup applied: every non-canonical occurrence of a
    duplicated 8-token span is cut out of its document; emits per-source
    token counts before/after plus a checksum of the surviving tokens
    (operators/dedup.py:mask_duplicate_spans)."""
    from .operators.dedup import mask_duplicate_spans

    docs = _load(spark, sf_dir, "documents")
    toks = docs.withColumn("tokens", F.expr(_TOKENS_FROM_TEXT))
    out = mask_duplicate_spans(toks, k=8)
    return out.groupBy("source").agg(
        F.sum(F.size("tokens")).cast("long").alias("n_tok_before"),
        F.sum(F.size("tokens_dedup")).cast("long").alias("n_tok_after"),
        F.sum(F.aggregate("tokens_dedup", F.lit(0).cast("long"),
                          lambda a, x: a + x)).cast("long").alias("tok_sum"),
    )


SQL_MASK_DUPLICATE_SPANS = """
WITH toks AS (
  SELECT doc_id, source,
         list_transform(list_filter(string_split(text, ' '), w -> w <> ''),
                        w -> CAST(ascii(w) * 256 + length(w) % 256 AS INT))
           AS tokens
  FROM documents),
pos AS (
  SELECT doc_id, tokens,
         unnest(generate_series(1, len(tokens) - 8 + 1)) AS i
  FROM toks WHERE len(tokens) >= 8),
occ AS (
  SELECT doc_id, i - 1 AS pos,
         array_to_string(list_slice(tokens, i, i + 7), ' ') AS span_key
  FROM pos),
rk AS (
  SELECT span_key, doc_id, pos,
         row_number() OVER (PARTITION BY span_key ORDER BY doc_id, pos) AS rn,
         count(DISTINCT doc_id) OVER (PARTITION BY span_key) AS n_docs
  FROM occ),
drops AS (
  SELECT DISTINCT doc_id, pos FROM rk WHERE n_docs >= 2 AND rn > 1),
covered AS (  -- token indexes (0-based) blanked by any dropped span
  SELECT DISTINCT doc_id, unnest(generate_series(pos, pos + 7)) AS idx
  FROM drops),
dropped AS (
  SELECT c.doc_id, count(*) AS n_drop,
         sum(t.tokens[c.idx + 1]) AS drop_sum
  FROM covered c JOIN toks t USING (doc_id) GROUP BY 1),
per_doc AS (
  SELECT t.source, len(t.tokens) AS n_before,
         len(t.tokens) - coalesce(d.n_drop, 0) AS n_after,
         coalesce(list_sum(t.tokens), 0) - coalesce(d.drop_sum, 0) AS tsum
  FROM toks t LEFT JOIN dropped d USING (doc_id))
SELECT source,
       CAST(sum(n_before) AS BIGINT) AS n_tok_before,
       CAST(sum(n_after) AS BIGINT) AS n_tok_after,
       CAST(sum(tsum) AS BIGINT) AS tok_sum
FROM per_doc GROUP BY 1
"""


def q_tier_incremental_merge(spark, sf_dir):
    """SELF-VERIFYING oracle for TierStore.ingest_increment (the
    Iceberg MERGE INTO analog): batch1 is materialized, batch2 (new
    docs + replacements) is merged incrementally, and a second store
    is materialized from scratch over the merged corpus — the query
    compares every tier IN-QUERY and emits (tier, n_rows, n_mismatch).
    n_mismatch must be 0, so the DuckDB twin recomputes only the bin
    counts (pure n_tok arithmetic) plus a literal zero; any divergence
    between the incremental and full paths breaks the driver hash."""
    import tempfile

    from .datagen import series_view
    from .operators.tiers import TierStore

    docs = _load(spark, sf_dir, "documents")
    toks = (
        docs.select(
            F.col("doc_id").cast("string").alias("doc_id"),
            F.expr(_TOKENS_FROM_TEXT).alias("tokens"),
            "source",
            F.col("doc_id").alias("_id"),
        )
        .withColumn("n_tok", F.size("tokens").cast("int"))
        .where("n_tok >= 1")
    )
    b1 = toks.where(F.pmod("_id", F.lit(2)) == 0)
    new_docs = toks.where(F.pmod("_id", F.lit(2)) == 1)
    repl = (
        b1.where(F.pmod("_id", F.lit(10)) == 0)
        .withColumn(
            "tokens",
            F.slice("tokens", 1, F.greatest(F.col("n_tok") - 10, F.lit(1))),
        )
        .withColumn("n_tok", F.size("tokens").cast("int"))
    )
    b2 = new_docs.unionByName(repl)
    cols = ["doc_id", "tokens", "n_tok", "source"]
    b1, b2 = b1.select(*cols), b2.select(*cols)
    merged = b1.join(b2.select("source", "doc_id"),
                     on=["source", "doc_id"], how="left_anti").unionByName(b2)

    import shutil

    inc_root = tempfile.mkdtemp(prefix="tiers_inc_")
    full_root = tempfile.mkdtemp(prefix="tiers_full_")
    try:
        inc = TierStore(spark, inc_root)
        inc.write_raw(b1)
        inc.materialize_cascade(series_view(b1))
        inc.ingest_increment(b2)
        full = TierStore(spark, full_root)
        full.write_raw(merged)
        full.materialize_cascade(series_view(merged))

        keys = ["source", "doc_id", "bin_start"]
        stat_i = ["n", "n_grid"]
        stat_f = ["sum", "sumsq", "min", "max", "p25", "p50", "p75", "p95"]
        parts = []
        for tier in ("tier_1m", "tier_1h", "tier_1d"):
            a = inc.read(tier).select(keys + stat_i + stat_f)
            b = full.read(tier).select(keys + stat_i + stat_f)
            j = a.alias("a").join(b.alias("b"), on=keys, how="full_outer")
            diff = F.lit(False)
            for c in stat_i:
                diff = diff | ~F.col(f"a.{c}").eqNullSafe(F.col(f"b.{c}"))
            for c in stat_f:
                diff = diff | ~F.round(F.col(f"a.{c}"), 6).eqNullSafe(
                    F.round(F.col(f"b.{c}"), 6)
                )
            parts.append(
                j.agg(
                    F.count(F.lit(1)).cast("long").alias("n_rows"),
                    F.count(F.when(diff, 1)).cast("long").alias("n_mismatch"),
                ).select(F.lit(tier).alias("tier"), "n_rows", "n_mismatch")
            )
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        rows = [(r["tier"], r["n_rows"], r["n_mismatch"])
                for r in out.collect()]
        return spark.createDataFrame(
            rows, "tier string, n_rows long, n_mismatch long"
        )
    finally:
        shutil.rmtree(inc_root, ignore_errors=True)
        shutil.rmtree(full_root, ignore_errors=True)


SQL_TIER_INCREMENTAL_MERGE = """
WITH toks AS (
  SELECT doc_id, source,
         len(list_filter(string_split(text, ' '), w -> w <> '')) AS n_pos
  FROM documents),
eligible AS (SELECT * FROM toks WHERE n_pos >= 1),
merged AS (
  SELECT doc_id, source,
         CASE WHEN doc_id % 10 = 0 AND doc_id % 2 = 0
              THEN greatest(n_pos - 10, 1) ELSE n_pos END AS n_pos
  FROM eligible),
t AS (
  SELECT * FROM (VALUES ('tier_1m', 60), ('tier_1h', 3600),
                        ('tier_1d', 86400)) AS v(tier, every))
SELECT t.tier,
       CAST(sum(CAST(floor((m.n_pos - 1) / t.every) AS BIGINT) + 1)
            AS BIGINT) AS n_rows,
       CAST(0 AS BIGINT) AS n_mismatch
FROM merged m CROSS JOIN t
GROUP BY 1
"""


def q_tier_retention(spark, sf_dir):
    """SELF-VERIFYING oracle for TierStore.expire_raw (retention,
    the drop_chunks analog): materialize the full cascade, expire the
    lexicographically-first source's raw partition, then emit per tier
    (tier, n_rows, n_mismatch) comparing every tier row before vs
    after expiry — retention must leave aggregates bit-identical — and
    a final ('raw_docs', docs-remaining, expired-docs-still-readable)
    row proving the raw drop itself.  The DuckDB twin recomputes the
    bin counts from n_tok arithmetic and the surviving-doc count with
    literal-zero mismatches; any tier disturbance or leftover raw row
    breaks the driver hash."""
    import tempfile

    from .datagen import series_view
    from .operators.tiers import TierStore

    docs = _load(spark, sf_dir, "documents")
    toks = (
        docs.select(
            F.col("doc_id").cast("string").alias("doc_id"),
            F.expr(_TOKENS_FROM_TEXT).alias("tokens"),
            "source",
        )
        .withColumn("n_tok", F.size("tokens").cast("int"))
        .where("n_tok >= 1")
    )
    import shutil

    root = tempfile.mkdtemp(prefix="tiers_ret_")
    try:
        store = TierStore(spark, root)
        store.write_raw(toks)
        store.materialize_cascade(series_view(toks))
        gone = store.partitions("raw")[0]  # sorted -> lexicographic min

        keys = ["source", "doc_id", "bin_start"]
        stat_i = ["n", "n_grid"]
        stat_f = ["sum", "sumsq", "min", "max", "p25", "p50", "p75", "p95"]
        tiers = ("tier_1m", "tier_1h", "tier_1d")
        before = {
            t: store.read(t).select(keys + stat_i + stat_f)
            .localCheckpoint()
            for t in tiers
        }
        store.expire_raw(sources=[gone])

        parts = []
        for t in tiers:
            a = before[t].alias("a")
            b = store.read(t).select(keys + stat_i + stat_f).alias("b")
            j = a.join(b, on=keys, how="full_outer")
            diff = F.lit(False)
            for c in stat_i:
                diff = diff | ~F.col(f"a.{c}").eqNullSafe(F.col(f"b.{c}"))
            for c in stat_f:
                diff = diff | ~F.round(F.col(f"a.{c}"), 6).eqNullSafe(
                    F.round(F.col(f"b.{c}"), 6)
                )
            parts.append(
                j.agg(
                    F.count(F.lit(1)).cast("long").alias("n_rows"),
                    F.count(F.when(diff, 1)).cast("long").alias("n_mismatch"),
                ).select(F.lit(t).alias("tier"), "n_rows", "n_mismatch")
            )
        parts.append(
            store.read("raw").agg(
                F.count(F.lit(1)).cast("long").alias("n_rows"),
                F.count(F.when(F.col("source") == gone, 1))
                .cast("long").alias("n_mismatch"),
            ).select(F.lit("raw_docs").alias("tier"), "n_rows", "n_mismatch")
        )
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        rows = [(r["tier"], r["n_rows"], r["n_mismatch"])
                for r in out.collect()]
        return spark.createDataFrame(
            rows, "tier string, n_rows long, n_mismatch long"
        )
    finally:
        shutil.rmtree(root, ignore_errors=True)


SQL_TIER_RETENTION = """
WITH toks AS (
  SELECT doc_id, source,
         len(list_filter(string_split(text, ' '), w -> w <> '')) AS n_pos
  FROM documents),
eligible AS (SELECT * FROM toks WHERE n_pos >= 1),
t AS (
  SELECT * FROM (VALUES ('tier_1m', 60), ('tier_1h', 3600),
                        ('tier_1d', 86400)) AS v(tier, every))
SELECT t.tier,
       CAST(sum(CAST(floor((e.n_pos - 1) / t.every) AS BIGINT) + 1)
            AS BIGINT) AS n_rows,
       CAST(0 AS BIGINT) AS n_mismatch
FROM eligible e CROSS JOIN t
GROUP BY 1
UNION ALL
SELECT 'raw_docs' AS tier,
       CAST(count(*) AS BIGINT) AS n_rows,
       CAST(0 AS BIGINT) AS n_mismatch
FROM eligible
WHERE source <> (SELECT min(source) FROM eligible)
"""


def q_tier_compact(spark, sf_dir):
    """SELF-VERIFYING oracle for the tier seam's bin-pack compaction
    (tiers.py compact — the Iceberg rewrite_data_files analog): write
    the doc stats as a multi-file raw tier (repartition(8) before a
    partitionBy write fans every source across up to 8 files), compact
    to the default 128 MB target (tiny input -> exactly ONE file per
    partition, independent of parallelism), and emit
    (n_docs, n_sources, files_after, n_mismatch) where files_after is
    counted straight off the filesystem and n_mismatch full-outer-joins
    every (source, doc_id, n_tok) row before vs after — compaction must
    be invisible to readers except for fewer, larger files.  The DuckDB
    twin recomputes the counts from the documents table with literal
    zero mismatches; any value disturbance or failure to reach the
    bin-pack target breaks the driver hash."""
    import os
    import shutil
    import tempfile

    from .operators.tiers import (
        ParquetDPOBackend, TierStore, _dir_parquet_stats)

    docs = _load(spark, sf_dir, "documents")
    toks = (
        docs.select(
            F.col("doc_id").cast("string").alias("doc_id"),
            F.expr(_TOKENS_FROM_TEXT).alias("tokens"),
            "source",
        )
        .withColumn("n_tok", F.size("tokens").cast("int"))
        .where("n_tok >= 1")
        .select("doc_id", "n_tok", "source")
    )
    root = tempfile.mkdtemp(prefix="tiers_cmp_")
    try:
        # range_layout=False keeps the repartition(8) fan-out, so the
        # write really produces multiple files per partition dir
        be = ParquetDPOBackend(spark, root, range_layout=False)
        st = TierStore(spark, root, backend=be)
        be.write_partitions(toks.repartition(8), "raw")
        before = st.read("raw").localCheckpoint()

        st.compact("raw")

        after = st.read("raw")
        j = before.alias("a").join(
            after.alias("b"), on=["source", "doc_id"], how="full_outer")
        n_mismatch = j.where(
            ~F.col("a.n_tok").eqNullSafe(F.col("b.n_tok"))
        ).count()
        n_docs = after.count()
        n_sources = after.select("source").distinct().count()
        tier_dir = os.path.join(root, "raw")
        files_after = sum(
            _dir_parquet_stats(spark, os.path.join(tier_dir, d))[0]
            for d in os.listdir(tier_dir) if d.startswith("source=")
        )
        return spark.createDataFrame(
            [(int(n_docs), int(n_sources), int(files_after),
              int(n_mismatch))],
            "n_docs long, n_sources long, files_after long, "
            "n_mismatch long",
        )
    finally:
        shutil.rmtree(root, ignore_errors=True)


SQL_TIER_COMPACT = """
WITH toks AS (
  SELECT doc_id, source,
         len(list_filter(string_split(text, ' '), w -> w <> '')) AS n_pos
  FROM documents),
eligible AS (SELECT * FROM toks WHERE n_pos >= 1)
SELECT CAST(count(*) AS BIGINT) AS n_docs,
       CAST(count(DISTINCT source) AS BIGINT) AS n_sources,
       CAST(count(DISTINCT source) AS BIGINT) AS files_after,
       CAST(0 AS BIGINT) AS n_mismatch
FROM eligible
"""


def q_semantic_dedup(spark, sf_dir):
    """SemDeDup-style semantic dedup (operators/similarity.py:
    semantic_dedup) in its deterministic sign-bucket mode: flag every
    vector whose cosine to a lower-id vector in the same bucket is
    >= 0.42 (greedy keep-lowest-id)."""
    from .operators.similarity import semantic_dedup

    emb = _load(spark, sf_dir, "embeddings")
    out = semantic_dedup(emb, threshold=0.42, bucket_bits=4, mode="sign")
    return out.select(
        "vec_id",
        F.col("bucket").cast("long").alias("bucket"),
        F.col("is_semdup").cast("int").alias("is_semdup"),
    )


SQL_SEMANTIC_DEDUP = """
WITH n AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb,
         sqrt(list_sum(list_transform(CAST(embedding AS DOUBLE[]),
                                      x -> x * x))) AS nrm,
         (CASE WHEN embedding[1] >= 0 THEN 1 ELSE 0 END)
       + (CASE WHEN embedding[2] >= 0 THEN 2 ELSE 0 END)
       + (CASE WHEN embedding[3] >= 0 THEN 4 ELSE 0 END)
       + (CASE WHEN embedding[4] >= 0 THEN 8 ELSE 0 END) AS bucket
  FROM embeddings)
SELECT a.vec_id, CAST(a.bucket AS BIGINT) AS bucket,
       CAST(EXISTS (
         SELECT 1 FROM n p
         WHERE p.bucket = a.bucket AND p.vec_id < a.vec_id
           AND p.nrm > 0 AND a.nrm > 0
           AND list_dot_product(p.emb, a.emb) / (p.nrm * a.nrm) >= 0.42
       ) AS INT) AS is_semdup
FROM n a
"""


def q_hist_sketch_percentiles(spark, sf_dir):
    """Mergeable percentile sketches across retention tiers: 1m bins
    carry a fixed-bin count-array histogram (bucket_rollup
    hist_bounds), composed LOSSLESSLY (element-wise integer sum) into
    1h bins with NO raw re-scan, then percentile estimates read off
    the composed tier (hist_percentile_estimate; error <= one bin
    width).  The oracle recomputes the same estimator directly from
    raw in SQL — equality proves both the estimator math and that the
    composition lost nothing.  Integer counts + literal arithmetic =
    bit-deterministic across engines and partitionings."""
    from .operators.resample import (
        bucket_rollup,
        compose_rollup,
        hist_percentile_estimate,
    )

    bounds, bins = (0.0, 110.0), 55
    t1m = bucket_rollup(
        series(spark, sf_dir), every=60, key_cols=["source"],
        mincounts_perc=0.0, min_floor_rule=False,
        hist_bounds=bounds, hist_bins=bins,
    )
    t1h = compose_rollup(
        t1m, every=3600, key_cols=["source"],
        mincounts_perc=0.0, min_floor_rule=False, hist_bins=bins,
    )
    est = hist_percentile_estimate(t1h, [0.5, 0.9], bounds, bins)
    return est.select(
        "source", "bin_start", F.col("n").cast("long").alias("n"),
        _r(F.col("p50_est")).alias("p50_est"),
        _r(F.col("p90_est")).alias("p90_est"),
    )


SQL_HIST_SKETCH = f"""
WITH series AS ({SERIES_SQL}),
good AS (SELECT source, pos, value FROM series WHERE value IS NOT NULL),
h AS (
  SELECT source, CAST(floor(pos / 3600) AS BIGINT) * 3600 AS bin_start,
         LEAST(GREATEST(CAST(floor((value - 0.0) / 2.0) AS INTEGER), 0), 54)
           AS hidx,
         count(*) AS c
  FROM good GROUP BY 1, 2, 3),
cum AS (
  SELECT source, bin_start, hidx, c,
         SUM(c) OVER (PARTITION BY source, bin_start ORDER BY hidx) AS cm,
         SUM(c) OVER (PARTITION BY source, bin_start) AS n
  FROM h),
p50 AS (
  SELECT source, bin_start, n,
         0.0 + (hidx + (0.5 * n - (cm - c)) / c) * 2.0 AS est
  FROM cum WHERE cm >= 0.5 * n
  QUALIFY row_number() OVER (PARTITION BY source, bin_start
                             ORDER BY hidx) = 1),
p90 AS (
  SELECT source, bin_start,
         0.0 + (hidx + (0.9 * n - (cm - c)) / c) * 2.0 AS est
  FROM cum WHERE cm >= 0.9 * n
  QUALIFY row_number() OVER (PARTITION BY source, bin_start
                             ORDER BY hidx) = 1)
SELECT p50.source, p50.bin_start, CAST(p50.n AS BIGINT) AS n,
       round(p50.est, 6) AS p50_est, round(p90.est, 6) AS p90_est
FROM p50 JOIN p90 USING (source, bin_start)
"""


def q_counter_agg(spark, sf_dir):
    """Reset-aware monotonic-counter rollup (TimescaleDB counter_agg
    analog): a synthetic wrap-around counter (integer cumsum mod 1000,
    derived identically in both engines) is aggregated per 1h bin —
    sum of reset-healed increments, reset count, first/last readings.
    Pure lag + groupBy; integer arithmetic end to end."""
    from .operators.analyses import counter_agg

    w = Window.partitionBy("source", "doc_id").orderBy("pos")
    s = series(spark, sf_dir).withColumn(
        "ctr",
        F.sum(
            F.floor(F.abs(F.coalesce(F.col("value"), F.lit(0.0))) * 10)
            .cast("long") % 13
        ).over(w) % 1000,
    )
    out = counter_agg(s, every=3600, value_col="ctr",
                      key_cols=["source", "doc_id"])
    return out.select(
        "source", "doc_id", "bin_start",
        F.col("n").cast("long").alias("n"),
        F.col("counter_delta").cast("long").alias("counter_delta"),
        F.col("n_resets").cast("long").alias("n_resets"),
        F.col("first").cast("long").alias("first"),
        F.col("last").cast("long").alias("last"),
    )


SQL_COUNTER_AGG = f"""
WITH series AS ({SERIES_SQL}),
ctr AS (
  SELECT source, doc_id, pos,
         SUM(CAST(floor(abs(coalesce(value, 0)) * 10) AS BIGINT) % 13)
           OVER (PARTITION BY source, doc_id ORDER BY pos) % 1000 AS ctr
  FROM series),
st AS (
  SELECT source, doc_id, pos, ctr,
         lag(ctr) OVER (PARTITION BY source, doc_id ORDER BY pos) AS prev
  FROM ctr),
inc AS (
  SELECT source, doc_id,
         CAST(floor(pos / 3600) AS BIGINT) * 3600 AS bin_start, pos, ctr,
         CASE WHEN prev IS NULL THEN 0
              WHEN ctr - prev < 0 THEN ctr ELSE ctr - prev END AS inc,
         CASE WHEN prev IS NOT NULL AND ctr - prev < 0 THEN 1 ELSE 0
              END AS rst
  FROM st)
SELECT source, doc_id, bin_start,
       CAST(count(*) AS BIGINT) AS n,
       CAST(SUM(inc) AS BIGINT) AS counter_delta,
       CAST(SUM(rst) AS BIGINT) AS n_resets,
       CAST(arg_min(ctr, pos) AS BIGINT) AS first,
       CAST(arg_max(ctr, pos) AS BIGINT) AS last
FROM inc GROUP BY 1, 2, 3
"""


def q_ltob_downsample(spark, sf_dir):
    """Largest-Triangle-One-Bucket visual downsample (Steinarsson 2013
    §4.1): keep the one point per 500-pos bucket with the largest
    triangle over its ±1 neighbors — extremes survive where mean/max
    rollups smear them.  Fully parallel (two window passes), hence
    SQL-expressible and oracle-checkable, unlike sequential LTTB."""
    from .operators.analyses import ltob_downsample

    out = ltob_downsample(series(spark, sf_dir), every=500,
                          key_cols=["source", "doc_id"])
    return out.select(
        "source", "doc_id", "bin_start", "pos",
        _r(F.col("value")).alias("value"),
    )


SQL_LTOB = f"""
WITH series AS ({SERIES_SQL}),
pts AS (SELECT source, doc_id, pos, value FROM series
        WHERE value IS NOT NULL),
nb AS (
  SELECT *, lag(pos) OVER w AS xp, lag(value) OVER w AS yp,
         lead(pos) OVER w AS xn, lead(value) OVER w AS yn
  FROM pts WINDOW w AS (PARTITION BY source, doc_id ORDER BY pos)),
sc AS (
  SELECT source, doc_id, pos, value,
         CAST(floor(pos / 500) AS BIGINT) * 500 AS bin_start,
         abs((xp - xn) * (value - yp) - (xp - pos) * (yn - yp)) / 2.0
           AS area
  FROM nb)
SELECT source, doc_id, bin_start, pos, round(value, 6) AS value
FROM sc
QUALIFY row_number() OVER (PARTITION BY source, doc_id, bin_start
                           ORDER BY area DESC NULLS LAST, pos) = 1
"""


def q_time_weighted_avg(spark, sf_dir):
    """Trapezoidal time-weighted average per 1h bin over the
    irregularly-spaced non-null readings (TimescaleDB time_weight
    analog).  quantized=1e6 sums integer-scaled segment areas, so the
    result is bit-deterministic across engines and partitionings."""
    from .operators.analyses import time_weighted_avg

    out = time_weighted_avg(series(spark, sf_dir), every=3600,
                            method="linear", quantized=1e6,
                            key_cols=["source", "doc_id"])
    return out.select(
        "source", "doc_id", "bin_start",
        F.col("n").cast("long").alias("n"),
        _r(F.col("integral")).alias("integral"),
        _r(F.col("duration")).alias("duration"),
        _r(F.col("twa")).alias("twa"),
    )


SQL_TIME_WEIGHTED_AVG = f"""
WITH series AS ({SERIES_SQL}),
pts AS (SELECT source, doc_id, pos, value FROM series
        WHERE value IS NOT NULL),
seg AS (
  SELECT source, doc_id, pos,
         lead(pos) OVER w - pos AS dt,
         (value + lead(value) OVER w) / 2.0 AS segv
  FROM pts WINDOW w AS (PARTITION BY source, doc_id ORDER BY pos)),
b AS (
  SELECT source, doc_id,
         CAST(floor(pos / 3600) AS BIGINT) * 3600 AS bin_start,
         CAST(floor((segv * dt) * 1000000.0) AS BIGINT) AS a_q,
         CAST(floor(dt * 1000000.0) AS BIGINT) AS d_q
  FROM seg WHERE dt IS NOT NULL)
SELECT source, doc_id, bin_start, CAST(count(*) AS BIGINT) AS n,
       round(SUM(a_q) / 1000000.0, 6) AS integral,
       round(SUM(d_q) / 1000000.0, 6) AS duration,
       round((SUM(a_q) / 1000000.0) / (SUM(d_q) / 1000000.0), 6) AS twa
FROM b GROUP BY 1, 2, 3
"""


def q_state_agg(spark, sf_dir):
    """Time-in-state per 1h bin (TimescaleDB state_agg/duration_in
    analog): value terciles as states, locf hold until next reading;
    per (series, bin, state) held duration, segment count and
    state-entry count.  Integer durations (pos axis) — exact."""
    from .operators.analyses import state_agg

    s = series(spark, sf_dir).withColumn(
        "state",
        F.when(F.col("value").isNull(), F.lit(None).cast("string"))
        .when(F.col("value") < 33.0, "low")
        .when(F.col("value") < 66.0, "mid")
        .otherwise("high"),
    )
    out = state_agg(s, every=3600, key_cols=["source", "doc_id"])
    return out.select(
        "source", "doc_id", "bin_start", "state",
        F.col("n_segments").cast("long").alias("n_segments"),
        F.col("duration").cast("long").alias("duration"),
        F.col("n_enter").cast("long").alias("n_enter"),
    )


SQL_STATE_AGG = f"""
WITH series AS ({SERIES_SQL}),
st AS (
  SELECT source, doc_id, pos,
         CASE WHEN value IS NULL THEN NULL
              WHEN value < 33.0 THEN 'low'
              WHEN value < 66.0 THEN 'mid'
              ELSE 'high' END AS state
  FROM series),
pts AS (SELECT * FROM st WHERE state IS NOT NULL),
seg AS (
  SELECT source, doc_id, pos, state,
         lead(pos) OVER w - pos AS dt,
         CASE WHEN lag(state) OVER w IS NULL
                OR lag(state) OVER w <> state THEN 1 ELSE 0 END AS entered
  FROM pts WINDOW w AS (PARTITION BY source, doc_id ORDER BY pos))
SELECT source, doc_id,
       CAST(floor(pos / 3600) AS BIGINT) * 3600 AS bin_start, state,
       CAST(count(*) AS BIGINT) AS n_segments,
       CAST(SUM(dt) AS BIGINT) AS duration,
       CAST(SUM(entered) AS BIGINT) AS n_enter
FROM seg WHERE dt IS NOT NULL
GROUP BY 1, 2, 3, 4
"""


def q_heartbeat_agg(spark, sf_dir):
    """Uptime per 1h bin from heartbeat events (TimescaleDB
    heartbeat_agg analog): non-null readings are the heartbeats, each
    proving liveness for 120 axis units; per bin uptime/downtime/gap
    count/live fraction.  Integer axis -> exact arithmetic."""
    from .operators.analyses import heartbeat_agg

    beats = series(spark, sf_dir).where(F.col("value").isNotNull())
    out = heartbeat_agg(beats, every=3600, alive_window=120.0,
                        key_cols=["source", "doc_id"])
    return out.select(
        "source", "doc_id", "bin_start",
        F.col("n_beats").cast("long").alias("n_beats"),
        F.col("uptime").cast("long").alias("uptime"),
        F.col("downtime").cast("long").alias("downtime"),
        F.col("n_gaps").cast("long").alias("n_gaps"),
        _r(F.col("live_frac")).alias("live_frac"),
    )


SQL_HEARTBEAT_AGG = f"""
WITH series AS ({SERIES_SQL}),
beats AS (SELECT source, doc_id, pos FROM series WHERE value IS NOT NULL),
seg AS (
  SELECT source, doc_id, pos,
         CAST(lead(pos) OVER (PARTITION BY source, doc_id ORDER BY pos)
              - pos AS DOUBLE) AS dt
  FROM beats),
b AS (
  SELECT source, doc_id,
         CAST(floor(pos / 3600) AS BIGINT) * 3600 AS bin_start,
         dt, LEAST(dt, 120.0) AS up
  FROM seg WHERE dt IS NOT NULL)
SELECT source, doc_id, bin_start,
       CAST(count(*) AS BIGINT) AS n_beats,
       CAST(SUM(up) AS BIGINT) AS uptime,
       CAST(SUM(dt - up) AS BIGINT) AS downtime,
       CAST(SUM(CASE WHEN dt > 120.0 THEN 1 ELSE 0 END) AS BIGINT) AS n_gaps,
       round(SUM(up) / (SUM(up) + SUM(dt - up)), 6) AS live_frac
FROM b GROUP BY 1, 2, 3
"""


def q_bin_entropy(spark, sf_dir):
    """Per-1h-bin Shannon entropy / distinct count / modal share of the
    discretized value stream — the token-stream degeneration signal
    (entropy collapse = repetition).  Values are floored to integers so
    both engines bin identically."""
    from .operators.analyses import bin_entropy

    s = series(spark, sf_dir).withColumn(
        "tokv", F.floor(F.col("value")).cast("long")
    )
    out = bin_entropy(s, every=3600, value_col="tokv",
                      key_cols=["source", "doc_id"])
    return out.select(
        "source", "doc_id", "bin_start",
        F.col("n").cast("long").alias("n"),
        F.col("n_distinct").cast("long").alias("n_distinct"),
        _r(F.col("entropy")).alias("entropy"),
        _r(F.col("top_share")).alias("top_share"),
    )


SQL_BIN_ENTROPY = f"""
WITH series AS ({SERIES_SQL}),
tok AS (
  SELECT source, doc_id, pos,
         CAST(floor(value) AS BIGINT) AS tokv
  FROM series WHERE value IS NOT NULL),
c AS (
  SELECT source, doc_id,
         CAST(floor(pos / 3600) AS BIGINT) * 3600 AS bin_start,
         tokv, count(*) AS c
  FROM tok GROUP BY 1, 2, 3, 4)
SELECT source, doc_id, bin_start,
       CAST(SUM(c) AS BIGINT) AS n,
       CAST(count(*) AS BIGINT) AS n_distinct,
       round(ln(CAST(SUM(c) AS DOUBLE))
             - SUM(CAST(c AS DOUBLE) * ln(CAST(c AS DOUBLE)))
               / CAST(SUM(c) AS DOUBLE), 6) AS entropy,
       round(CAST(MAX(c) AS DOUBLE) / CAST(SUM(c) AS DOUBLE), 6)
         AS top_share
FROM c GROUP BY 1, 2, 3
"""


def q_candle_agg(spark, sf_dir):
    """OHLC candles composed across retention tiers (TimescaleDB
    candlestick_agg analog): 1m candles fold into 1h candles with NO
    raw re-scan (open/close follow the earliest/latest sub-candle's
    anchors); the oracle computes 1h OHLC directly from raw — equality
    proves both the aggregate and that the composition lost nothing.
    Picked readings (arg-min/arg-max), not sums — order-independent,
    hence hash-stable."""
    from .operators.analyses import candle_agg, compose_candles

    t1m = candle_agg(series(spark, sf_dir), every=60,
                     key_cols=["source", "doc_id"])
    t1h = compose_candles(t1m, every=3600, key_cols=["source", "doc_id"])
    return t1h.select(
        "source", "doc_id", "bin_start",
        F.col("n").cast("long").alias("n"),
        _r(F.col("open")).alias("open"),
        _r(F.col("high")).alias("high"),
        _r(F.col("low")).alias("low"),
        _r(F.col("close")).alias("close"),
        "open_pos", "close_pos",
    )


SQL_CANDLE_AGG = f"""
WITH series AS ({SERIES_SQL}),
pts AS (SELECT source, doc_id, pos, value FROM series
        WHERE value IS NOT NULL)
SELECT source, doc_id,
       CAST(floor(pos / 3600) AS BIGINT) * 3600 AS bin_start,
       CAST(count(*) AS BIGINT) AS n,
       round(arg_min(value, pos), 6) AS open,
       round(max(value), 6) AS high,
       round(min(value), 6) AS low,
       round(arg_max(value, pos), 6) AS close,
       CAST(min(pos) AS BIGINT) AS open_pos,
       CAST(max(pos) AS BIGINT) AS close_pos
FROM pts GROUP BY 1, 2, 3
"""


def q_gauge_agg(spark, sf_dir):
    """Signed-delta gauge rollup per 1h bin (TimescaleDB gauge_agg
    analog — counter_agg without reset healing): per-bin delta (lag
    crosses bin edges so deltas tile the series), first/last
    single-step increments, rate.  The gauge is integer-quantized
    (floor(value*100)) so sums are exact integers — bit-deterministic
    across engines and partitionings."""
    from .operators.analyses import gauge_agg

    s = series(spark, sf_dir).withColumn(
        "g", F.floor(F.col("value") * 100).cast("long")
    )
    out = gauge_agg(s, every=3600, value_col="g",
                    key_cols=["source", "doc_id"])
    return out.select(
        "source", "doc_id", "bin_start",
        F.col("n").cast("long").alias("n"),
        F.col("delta").cast("long").alias("delta"),
        F.col("idelta_left").cast("long").alias("idelta_left"),
        F.col("idelta_right").cast("long").alias("idelta_right"),
        _r(F.col("rate")).alias("rate"),
        F.col("first").cast("long").alias("first"),
        F.col("last").cast("long").alias("last"),
    )


SQL_GAUGE_AGG = f"""
WITH series AS ({SERIES_SQL}),
pts AS (SELECT source, doc_id, pos,
               CAST(floor(value * 100) AS BIGINT) AS g
        FROM series WHERE value IS NOT NULL),
st AS (
  SELECT source, doc_id, pos, g,
         g - lag(g) OVER w AS inc,
         CAST(pos - lag(pos) OVER w AS DOUBLE) AS dx
  FROM pts WINDOW w AS (PARTITION BY source, doc_id ORDER BY pos))
SELECT source, doc_id,
       CAST(floor(pos / 3600) AS BIGINT) * 3600 AS bin_start,
       CAST(count(*) AS BIGINT) AS n,
       CAST(SUM(inc) AS BIGINT) AS delta,
       CAST(arg_min(inc, pos) FILTER (WHERE inc IS NOT NULL) AS BIGINT)
         AS idelta_left,
       CAST(arg_max(inc, pos) FILTER (WHERE inc IS NOT NULL) AS BIGINT)
         AS idelta_right,
       round(CAST(SUM(inc) AS DOUBLE) / SUM(dx), 6) AS rate,
       CAST(arg_min(g, pos) AS BIGINT) AS first,
       CAST(arg_max(g, pos) AS BIGINT) AS last
FROM st GROUP BY 1, 2, 3
"""


def q_hll_distinct_tiers(spark, sf_dir):
    """Mergeable distinct-count sketches across retention tiers
    (self-verifying): 1m bins carry a Datasketches HLL sketch of the
    discretized value (bucket_rollup distinct_col), composed into 1h
    bins by LOSSLESS sketch union (compose_rollup) with no raw
    re-scan.  The query itself verifies, per 1h bin, that (a) the
    composed estimate sits within 3% (+1) of the exact distinct count
    recomputed from raw, and (b) the composed sketch's estimate equals
    a direct raw-built 1h sketch's estimate to within 1% — then emits
    only the exact count and the two booleans, so the DuckDB twin is
    plain exact-distinct SQL + literal TRUEs.  A broken sketch,
    union, or composition path flips a boolean and fails the hash."""
    from .operators.resample import (
        bucket_rollup,
        compose_rollup,
        with_distinct_estimate,
    )

    s = series(spark, sf_dir).withColumn(
        "tokv", F.floor(F.col("value")).cast("long")
    )
    t1m = bucket_rollup(
        s, every=60, key_cols=["source", "doc_id"],
        mincounts_perc=0.0, min_floor_rule=False, distinct_col="tokv",
    )
    t1h = with_distinct_estimate(
        compose_rollup(t1m, every=3600, key_cols=["source", "doc_id"],
                       mincounts_perc=0.0, min_floor_rule=False),
        out_col="est_composed",
    )
    direct = with_distinct_estimate(
        bucket_rollup(
            s, every=3600, key_cols=["source", "doc_id"],
            mincounts_perc=0.0, min_floor_rule=False, distinct_col="tokv",
        ),
        out_col="est_direct",
    ).select("source", "doc_id", "bin_start", "est_direct")
    exact = (
        s.where(F.col("tokv").isNotNull())
        .groupBy(
            "source", "doc_id",
            (F.floor(F.col("pos") / 3600) * 3600).cast("long")
            .alias("bin_start"),
        )
        .agg(F.count_distinct(F.col("tokv")).alias("n_exact"))
    )
    j = t1h.join(direct, ["source", "doc_id", "bin_start"]).join(
        exact, ["source", "doc_id", "bin_start"]
    )
    ex = F.col("n_exact").cast("double")
    return j.select(
        "source", "doc_id", "bin_start",
        F.col("n_exact").cast("long").alias("n_exact"),
        (
            F.abs(F.col("est_composed").cast("double") - ex)
            <= ex * 0.03 + 1.0
        ).alias("est_ok"),
        (
            F.abs(
                F.col("est_composed").cast("double")
                - F.col("est_direct").cast("double")
            )
            <= F.col("est_direct").cast("double") * 0.01
        ).alias("compose_ok"),
    )


SQL_HLL_DISTINCT = f"""
WITH series AS ({SERIES_SQL}),
tok AS (
  SELECT source, doc_id, pos, CAST(floor(value) AS BIGINT) AS tokv
  FROM series WHERE value IS NOT NULL)
SELECT source, doc_id,
       CAST(floor(pos / 3600) AS BIGINT) * 3600 AS bin_start,
       CAST(count(DISTINCT tokv) AS BIGINT) AS n_exact,
       TRUE AS est_ok,
       TRUE AS compose_ok
FROM tok GROUP BY 1, 2, 3
"""


def q_ewma_chart(spark, sf_dir):
    """EWMA control chart: exact 64-reading truncated fold (identical
    sequential order in both engines — bit-deterministic), asymptotic
    control limits off per-series mean/sd_pop, flag 2 outside
    ±3·sigma_ewma.  Output keeps every 97th point plus all flagged
    points so the hash covers both the fold values and the limits."""
    from .operators.outliers import ewma_chart

    out = ewma_chart(series(spark, sf_dir), alpha=0.2, window=64,
                     n_sigma=3.0, key_cols=["source", "doc_id"])
    return out.where(
        (F.pmod(F.col("pos"), F.lit(97)) == 0) | (F.col("flag_ewma") == 2)
    ).select(
        "source", "doc_id", "pos",
        _r(F.col("ewma")).alias("ewma"),
        F.col("flag_ewma").cast("int").alias("flag_ewma"),
    )


SQL_EWMA_CHART = f"""
WITH series AS ({SERIES_SQL}),
pts AS (SELECT source, doc_id, pos, CAST(value AS DOUBLE) AS value
        FROM series WHERE value IS NOT NULL),
st AS (
  SELECT source, doc_id, avg(value) AS m, stddev_pop(value) AS sd
  FROM pts GROUP BY 1, 2),
fr AS (
  SELECT source, doc_id, pos,
         list(value) OVER (PARTITION BY source, doc_id ORDER BY pos
                           ROWS BETWEEN 63 PRECEDING AND CURRENT ROW)
           AS arr
  FROM pts),
e AS (
  SELECT source, doc_id, pos,
         list_reduce(arr, (acc, x) -> acc * 0.8 + 0.2 * x) AS ewma
  FROM fr)
SELECT e.source, e.doc_id, e.pos, round(e.ewma, 6) AS ewma,
       CASE WHEN abs(e.ewma - st.m) > 3.0 * st.sd * sqrt(0.2 / 1.8)
            THEN 2 ELSE 0 END AS flag_ewma
FROM e JOIN st USING (source, doc_id)
WHERE e.pos % 97 = 0
   OR abs(e.ewma - st.m) > 3.0 * st.sd * sqrt(0.2 / 1.8)
"""


def q_cusum_chart(spark, sf_dir):
    """Two-sided CUSUM changepoint chart: zero-seeded clamped folds
    over the trailing 128 standardized readings (identical sequential
    order in both engines), flag 2 where either side exceeds h=5.
    Output keeps every 89th point plus all flagged points."""
    from .operators.outliers import cusum_chart

    out = cusum_chart(series(spark, sf_dir), k=0.5, h=5.0, window=128,
                      key_cols=["source", "doc_id"])
    return out.where(
        (F.pmod(F.col("pos"), F.lit(89)) == 0) | (F.col("flag_cusum") == 2)
    ).select(
        "source", "doc_id", "pos",
        _r(F.col("cusum_hi")).alias("cusum_hi"),
        _r(F.col("cusum_lo")).alias("cusum_lo"),
        F.col("flag_cusum").cast("int").alias("flag_cusum"),
    )


SQL_CUSUM_CHART = f"""
WITH series AS ({SERIES_SQL}),
pts AS (SELECT source, doc_id, pos, CAST(value AS DOUBLE) AS value
        FROM series WHERE value IS NOT NULL),
st AS (
  SELECT source, doc_id, avg(value) AS m, stddev_pop(value) AS sd
  FROM pts GROUP BY 1, 2),
zz AS (
  SELECT p.source, p.doc_id, p.pos, (p.value - st.m) / st.sd AS z
  FROM pts p JOIN st USING (source, doc_id)),
fr AS (
  SELECT source, doc_id, pos,
         list(z) OVER (PARTITION BY source, doc_id ORDER BY pos
                       ROWS BETWEEN 127 PRECEDING AND CURRENT ROW) AS arr
  FROM zz),
c AS (
  SELECT source, doc_id, pos,
         list_reduce(list_prepend(0.0::DOUBLE, arr),
                     (acc, x) -> greatest(0.0, acc + x - 0.5)) AS cusum_hi,
         list_reduce(list_prepend(0.0::DOUBLE, arr),
                     (acc, x) -> greatest(0.0, acc - x - 0.5)) AS cusum_lo
  FROM fr)
SELECT source, doc_id, pos,
       round(cusum_hi, 6) AS cusum_hi,
       round(cusum_lo, 6) AS cusum_lo,
       CASE WHEN cusum_hi > 5.0 OR cusum_lo > 5.0 THEN 2 ELSE 0 END
         AS flag_cusum
FROM c WHERE pos % 89 = 0 OR cusum_hi > 5.0 OR cusum_lo > 5.0
"""


def q_seasonal_zscore(spark, sf_dir):
    """Seasonal-residual z-score (the OutlierSTLRZ analog): per-phase
    exact-median cycle removed, residual z-scored per series.  Output
    keeps every 83rd point plus all flagged points; residuals rounded
    to 6dp."""
    from .operators.outliers import seasonal_zscore_flag

    out = seasonal_zscore_flag(series(spark, sf_dir), period=288,
                               thres=4.0, key_cols=["source", "doc_id"])
    return out.where(
        (F.pmod(F.col("pos"), F.lit(83)) == 0)
        | (F.col("flag_seasonal_z") == 2)
    ).select(
        "source", "doc_id", "pos",
        _r(F.col("resid")).alias("resid"),
        F.col("flag_seasonal_z").cast("int").alias("flag_seasonal_z"),
    )


SQL_SEASONAL_ZSCORE = f"""
WITH series AS ({SERIES_SQL}),
st0 AS (
  SELECT source, doc_id, pos, value, pos % 288 AS ph FROM series),
cyc AS (
  SELECT source, doc_id, ph, median(value) AS phmed
  FROM st0 WHERE value IS NOT NULL GROUP BY 1, 2, 3),
res AS (
  SELECT s.source, s.doc_id, s.pos, s.value, s.value - c.phmed AS r
  FROM st0 s LEFT JOIN cyc c
    ON s.source = c.source AND s.doc_id = c.doc_id AND s.ph = c.ph),
rs AS (
  SELECT source, doc_id, avg(r) AS m, stddev_pop(r) AS sd
  FROM res GROUP BY 1, 2)
SELECT r.source, r.doc_id, r.pos, round(r.r, 6) AS resid,
       CASE WHEN r.value IS NULL THEN NULL
            WHEN abs((r.r - rs.m) / rs.sd) > 4.0 THEN 2 ELSE 0 END
         AS flag_seasonal_z
FROM res r JOIN rs USING (source, doc_id)
WHERE r.pos % 83 = 0
   OR (r.value IS NOT NULL AND abs((r.r - rs.m) / rs.sd) > 4.0)
"""


def q_stats2d_tiers(spark, sf_dir):
    """Composable bivariate stats across retention tiers: 1m OLS
    partials (n, sx, sy, sxy, sxx, syy) fold into 1h bins with NO raw
    re-scan; slope/intercept/r2 re-derive from the composed sums.  The
    oracle recomputes the same closed form directly from raw — values
    are integer-quantized (floor(value*100)) so every partial sum is
    exact and the derivation is bit-deterministic in both engines."""
    from .operators.analyses import compose_stats2d, stats2d_agg

    s = series(spark, sf_dir).withColumn(
        "yq", F.floor(F.col("value") * 100).cast("long")
    )
    t1m = stats2d_agg(s, every=60, value_col="yq",
                      key_cols=["source", "doc_id"])
    t1h = compose_stats2d(t1m, every=3600, key_cols=["source", "doc_id"])
    return t1h.select(
        "source", "doc_id", "bin_start",
        F.col("n").cast("long").alias("n"),
        F.col("sx").cast("long").alias("sx"),
        F.col("sy").cast("long").alias("sy"),
        _r(F.col("slope")).alias("slope"),
        _r(F.col("intercept")).alias("intercept"),
        _r(F.col("r2")).alias("r2"),
    )


SQL_STATS2D = f"""
WITH series AS ({SERIES_SQL}),
pts AS (
  SELECT source, doc_id, pos AS x,
         CAST(floor(value * 100) AS BIGINT) AS y
  FROM series WHERE value IS NOT NULL),
p AS (
  SELECT source, doc_id,
         CAST(floor(x / 3600) AS BIGINT) * 3600 AS bin_start,
         CAST(count(*) AS BIGINT) AS n,
         CAST(SUM(x) AS BIGINT) AS sx,
         CAST(SUM(y) AS BIGINT) AS sy,
         CAST(SUM(x * y) AS BIGINT) AS sxy,
         CAST(SUM(x * x) AS BIGINT) AS sxx,
         CAST(SUM(y * y) AS BIGINT) AS syy
  FROM pts GROUP BY 1, 2, 3),
d AS (
  SELECT *,
         CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
           - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE) AS cov_n,
         CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
           - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) AS varx_n,
         CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
           - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) AS vary_n
  FROM p)
SELECT source, doc_id, bin_start, n, sx, sy,
       round(CASE WHEN n >= 2 AND varx_n > 0 THEN cov_n / varx_n END, 6)
         AS slope,
       round(CASE WHEN n >= 2 AND varx_n > 0 THEN
               (CAST(sy AS DOUBLE) - (cov_n / varx_n) * CAST(sx AS DOUBLE))
                 / CAST(n AS DOUBLE) END, 6) AS intercept,
       round(CASE WHEN n >= 2 AND varx_n > 0 AND vary_n > 0 THEN
               (cov_n * cov_n) / (varx_n * vary_n) END, 6) AS r2
FROM d
"""


def q_topk_agg(spark, sf_dir):
    """Top-3 modal tokens per 1h bin (what the stream degenerates
    into): exact (key, bin, token) counts + per-bin rank, ties to the
    smaller token.  Integer counts -> hash-stable."""
    from .operators.analyses import topk_agg

    s = series(spark, sf_dir).withColumn(
        "tokv", F.floor(F.col("value")).cast("long")
    )
    out = topk_agg(s, every=3600, k=3, value_col="tokv",
                   key_cols=["source", "doc_id"])
    return out.select(
        "source", "doc_id", "bin_start",
        F.col("rank").cast("int").alias("rank"),
        F.col("value_k").cast("long").alias("value_k"),
        F.col("cnt").cast("long").alias("cnt"),
        _r(F.col("share")).alias("share"),
    )


SQL_TOPK_AGG = f"""
WITH series AS ({SERIES_SQL}),
tok AS (
  SELECT source, doc_id, pos, CAST(floor(value) AS BIGINT) AS tokv
  FROM series WHERE value IS NOT NULL),
c AS (
  SELECT source, doc_id,
         CAST(floor(pos / 3600) AS BIGINT) * 3600 AS bin_start,
         tokv AS value_k, CAST(count(*) AS BIGINT) AS cnt
  FROM tok GROUP BY 1, 2, 3, 4),
r AS (
  SELECT *,
         CAST(row_number() OVER (PARTITION BY source, doc_id, bin_start
                                 ORDER BY cnt DESC, value_k ASC) AS INTEGER)
           AS rank,
         CAST(cnt AS DOUBLE)
           / SUM(cnt) OVER (PARTITION BY source, doc_id, bin_start)
           AS share
  FROM c)
SELECT source, doc_id, bin_start, rank, value_k, cnt,
       round(share, 6) AS share
FROM r WHERE rank <= 3
"""


def q_robust_zscore(spark, sf_dir):
    """Median/MAD modified z-score flag (Iglewicz-Hoaglin): exact
    percentile(0.5) twice, flag |M| > 3.5.  Output keeps every 79th
    point plus all flagged points."""
    from .operators.outliers import robust_zscore_flag

    out = robust_zscore_flag(series(spark, sf_dir), thres=3.5,
                             key_cols=["source", "doc_id"])
    return out.where(
        (F.pmod(F.col("pos"), F.lit(79)) == 0)
        | (F.col("flag_robust_z") == 2)
    ).select(
        "source", "doc_id", "pos",
        F.col("flag_robust_z").cast("int").alias("flag_robust_z"),
    )


SQL_ROBUST_ZSCORE = f"""
WITH series AS ({SERIES_SQL}),
med AS (
  SELECT source, doc_id, median(value) AS md
  FROM series GROUP BY 1, 2),
mad AS (
  SELECT s.source, s.doc_id, median(abs(s.value - med.md)) AS mad
  FROM series s JOIN med USING (source, doc_id) GROUP BY 1, 2),
sc AS (
  SELECT s.source, s.doc_id, s.pos, s.value,
         CASE WHEN mad.mad > 0
              THEN 0.6745 * (s.value - med.md) / mad.mad END AS m
  FROM series s
  JOIN med USING (source, doc_id) JOIN mad USING (source, doc_id))
SELECT source, doc_id, pos,
       CASE WHEN value IS NULL THEN NULL
            WHEN abs(m) > 3.5 THEN 2 ELSE 0 END AS flag_robust_z
FROM sc
WHERE pos % 79 = 0 OR (value IS NOT NULL AND abs(m) > 3.5)
"""


def q_arrival_stats(spark, sf_dir):
    """Per-1h-bin sampling-health: inter-arrival delta median/p95/max
    and jitter over the non-null readings (integer deltas -> exact
    sums; exact percentiles match pandas/DuckDB interpolation)."""
    from .operators.analyses import arrival_stats

    out = arrival_stats(series(spark, sf_dir), every=3600,
                        key_cols=["source", "doc_id"])
    return out.select(
        "source", "doc_id", "bin_start",
        F.col("n_dt").cast("long").alias("n_dt"),
        _r(F.col("dt_median")).alias("dt_median"),
        _r(F.col("dt_p95")).alias("dt_p95"),
        F.col("dt_max").cast("long").alias("dt_max"),
        _r(F.col("jitter")).alias("jitter"),
    )


SQL_ARRIVAL_STATS = f"""
WITH series AS ({SERIES_SQL}),
pts AS (SELECT source, doc_id, pos FROM series WHERE value IS NOT NULL),
seg AS (
  SELECT source, doc_id, pos,
         CAST(pos - lag(pos) OVER (PARTITION BY source, doc_id
                                   ORDER BY pos) AS DOUBLE) AS dt
  FROM pts)
SELECT source, doc_id,
       CAST(floor(pos / 3600) AS BIGINT) * 3600 AS bin_start,
       CAST(count(*) AS BIGINT) AS n_dt,
       round(median(dt), 6) AS dt_median,
       round(quantile_cont(dt, 0.95), 6) AS dt_p95,
       CAST(max(dt) AS BIGINT) AS dt_max,
       round(stddev_pop(dt), 6) AS jitter
FROM seg WHERE dt IS NOT NULL
GROUP BY 1, 2, 3
"""


def q_acf_agg(spark, sf_dir):
    """Per-1h-bin lag-3 autocorrelation of the value stream (the
    looping/periodicity signal): window lag pairs, per-bin sample
    Pearson corr — both engines' corr is the same closed form."""
    from .operators.analyses import acf_agg

    out = acf_agg(series(spark, sf_dir), every=3600, lag=3,
                  key_cols=["source", "doc_id"])
    return out.select(
        "source", "doc_id", "bin_start",
        F.col("n_pairs").cast("long").alias("n_pairs"),
        _r(F.col("acf")).alias("acf"),
    )


SQL_ACF_AGG = f"""
WITH series AS ({SERIES_SQL}),
pts AS (SELECT source, doc_id, pos, value FROM series
        WHERE value IS NOT NULL),
lagged AS (
  SELECT source, doc_id, pos, value,
         lag(value, 3) OVER (PARTITION BY source, doc_id ORDER BY pos)
           AS prev
  FROM pts)
SELECT source, doc_id,
       CAST(floor(pos / 3600) AS BIGINT) * 3600 AS bin_start,
       CAST(count(CASE WHEN prev IS NOT NULL THEN 1 END) AS BIGINT)
         AS n_pairs,
       round(corr(value, prev), 6) AS acf
FROM lagged GROUP BY 1, 2, 3
"""


def q_cusum_changepoint(spark, sf_dir):
    """Single changepoint per series via the CUSUM argmax (Page 1954):
    t* = argmax |cumsum(x - mean)|, tie -> smallest pos; pre/post means
    and the normalized max statistic.  quantized=1e6 makes every
    cumulative sum an exact long, so the argmax (and the round-6
    floats) are bit-deterministic across engines and partitionings."""
    out = analyses.cusum_changepoint(
        series(spark, sf_dir), key_cols=["source", "doc_id"], quantized=1e6
    )
    return out.select(
        "source", "doc_id", "n", "t_star",
        _r(F.col("s_max_norm")).alias("s_max_norm"),
        _r(F.col("mean_before")).alias("mean_before"),
        _r(F.col("mean_after")).alias("mean_after"),
    )


SQL_CUSUM_CHANGEPOINT = f"""
WITH series AS ({SERIES_SQL}),
pts AS (SELECT source, doc_id, pos, value FROM series
        WHERE value IS NOT NULL),
enr AS (
  SELECT source, doc_id, pos,
         row_number() OVER w AS k,
         SUM(CAST(floor(value * 1000000.0) AS BIGINT)) OVER
           (PARTITION BY source, doc_id ORDER BY pos
            ROWS UNBOUNDED PRECEDING) AS cum,
         COUNT(*) OVER (PARTITION BY source, doc_id) AS n,
         SUM(CAST(floor(value * 1000000.0) AS BIGINT)) OVER
           (PARTITION BY source, doc_id) AS tot
  FROM pts WINDOW w AS (PARTITION BY source, doc_id ORDER BY pos)),
st AS (
  SELECT *,
         abs(CAST(cum AS DOUBLE) - k * (CAST(tot AS DOUBLE) / n)) AS s_abs,
         row_number() OVER (
           PARTITION BY source, doc_id
           ORDER BY abs(CAST(cum AS DOUBLE) - k * (CAST(tot AS DOUBLE) / n))
             DESC, pos ASC) AS rn
  FROM enr)
SELECT source, doc_id, CAST(n AS BIGINT) AS n, CAST(pos AS BIGINT) AS t_star,
       round(s_abs / 1000000.0 / n, 6) AS s_max_norm,
       round(CAST(cum AS DOUBLE) / k / 1000000.0, 6) AS mean_before,
       CASE WHEN k < n THEN
         round((CAST(tot AS DOUBLE) - cum) / (n - k) / 1000000.0, 6)
       END AS mean_after
FROM st WHERE rn = 1
"""


def q_m4_downsample(spark, sf_dir):
    """M4 downsampling (Jugel et al., VLDB 2014): per 1h bin the
    first/last/min/max readings — the lossless-for-plots reduction.
    Raw readings pass through untouched (no float arithmetic), so the
    only determinism concern is the tie-breaks, which are pinned to
    the smallest position on both sides."""
    out = analyses.m4_downsample(
        series(spark, sf_dir), every=3600, key_cols=["source", "doc_id"]
    )
    return out.select(
        "source", "doc_id", "bin_start", "n",
        "t_first", _r(F.col("v_first")).alias("v_first"),
        "t_last", _r(F.col("v_last")).alias("v_last"),
        "t_min", _r(F.col("v_min")).alias("v_min"),
        "t_max", _r(F.col("v_max")).alias("v_max"),
    )


SQL_M4_DOWNSAMPLE = f"""
WITH series AS ({SERIES_SQL}),
pts AS (SELECT source, doc_id, pos, value FROM series
        WHERE value IS NOT NULL),
b AS (SELECT source, doc_id,
             CAST(floor(pos / 3600) AS BIGINT) * 3600 AS bin_start,
             pos, value
      FROM pts),
r AS (SELECT *,
        row_number() OVER (PARTITION BY source, doc_id, bin_start
                           ORDER BY pos) AS rf,
        row_number() OVER (PARTITION BY source, doc_id, bin_start
                           ORDER BY pos DESC) AS rl,
        row_number() OVER (PARTITION BY source, doc_id, bin_start
                           ORDER BY value ASC, pos ASC) AS rmin,
        row_number() OVER (PARTITION BY source, doc_id, bin_start
                           ORDER BY value DESC, pos ASC) AS rmax
      FROM b)
SELECT source, doc_id, bin_start, CAST(count(*) AS BIGINT) AS n,
       CAST(max(CASE WHEN rf = 1 THEN pos END) AS BIGINT) AS t_first,
       round(max(CASE WHEN rf = 1 THEN value END), 6) AS v_first,
       CAST(max(CASE WHEN rl = 1 THEN pos END) AS BIGINT) AS t_last,
       round(max(CASE WHEN rl = 1 THEN value END), 6) AS v_last,
       CAST(max(CASE WHEN rmin = 1 THEN pos END) AS BIGINT) AS t_min,
       round(min(value), 6) AS v_min,
       CAST(max(CASE WHEN rmax = 1 THEN pos END) AS BIGINT) AS t_max,
       round(max(value), 6) AS v_max
FROM r GROUP BY 1, 2, 3
"""


_SAVGOL_W, _SAVGOL_P = 7, 2


def q_savgol_smooth(spark, sf_dir):
    """Savitzky-Golay smoothing (1964 closed form): degree-2 fit over a
    7-point window as a fixed-order lag/lead convolution.  Both engines
    evaluate the IDENTICAL left-to-right double chain with the same
    binary64 coefficient literals, so the result is bit-deterministic;
    edges and windows touching a null reading yield null (dropped
    here to keep the result compact)."""
    out = analyses.savgol_smooth(
        series(spark, sf_dir), window=_SAVGOL_W, polyorder=_SAVGOL_P,
        key_cols=["source", "doc_id"],
    )
    return out.where(F.col("smoothed").isNotNull()).select(
        "source", "doc_id", "pos",
        _r(F.col("smoothed")).alias("smoothed"),
    )


def _savgol_sql() -> str:
    from .operators.analyses import savgol_coeffs

    coeffs = savgol_coeffs(_SAVGOL_W, _SAVGOL_P)
    h = _SAVGOL_W // 2
    terms = []
    for j, c in enumerate(coeffs):
        off = j - h
        if off < 0:
            t = f"lag(value, {-off}) OVER w"
        elif off > 0:
            t = f"lead(value, {off}) OVER w"
        else:
            t = "value"
        terms.append(f"({c!r} * {t})")
    chain = terms[0]
    for t in terms[1:]:
        chain = f"({chain} + {t})"
    return f"""
WITH series AS ({SERIES_SQL}),
sm AS (
  SELECT source, doc_id, pos, {chain} AS smoothed
  FROM series
  WINDOW w AS (PARTITION BY source, doc_id ORDER BY pos))
SELECT source, doc_id, pos, round(smoothed, 6) AS smoothed
FROM sm WHERE smoothed IS NOT NULL
"""


SQL_SAVGOL_SMOOTH = _savgol_sql()


def q_interpolated_twa(spark, sf_dir):
    """Interpolated-edge time-weighted average per 1h bin (TimescaleDB
    interpolated_average analog): segments are SPLIT across the bins
    they span — the boundary value carries over from the previous
    reading.  quantized=1e6 sums exact scaled longs (driver-safe)."""
    out = analyses.interpolated_tw_avg(
        series(spark, sf_dir), every=3600, method="linear",
        quantized=1e6, key_cols=["source", "doc_id"],
    )
    return out.select(
        "source", "doc_id", "bin_start", "n",
        _r(F.col("integral")).alias("integral"),
        _r(F.col("covered")).alias("covered"),
        _r(F.col("itwa")).alias("itwa"),
        _r(F.col("fb_avg")).alias("fb_avg"),
    )


SQL_INTERPOLATED_TWA = f"""
WITH series AS ({SERIES_SQL}),
pts AS (SELECT source, doc_id, pos, value FROM series
        WHERE value IS NOT NULL),
seg AS (
  SELECT source, doc_id, pos AS x, value AS v,
         lead(pos) OVER w AS x2, lead(value) OVER w AS v2
  FROM pts WINDOW w AS (PARTITION BY source, doc_id ORDER BY pos)),
sp AS (
  SELECT source, doc_id, x, v, x2, v2,
         unnest(generate_series(CAST(floor(x / 3600) AS BIGINT),
                                CAST(floor((x2 - 1) / 3600) AS BIGINT))) AS b
  FROM seg WHERE x2 IS NOT NULL),
c AS (
  SELECT source, doc_id, b * 3600 AS bin_start,
         greatest(x, b * 3600) AS a,
         least(x2, (b + 1) * 3600) AS bnd,
         x, v, x2, v2
  FROM sp),
sh AS (
  SELECT source, doc_id, bin_start,
         CAST(floor((((v + ((v2 - v) / CAST(x2 - x AS DOUBLE))
                           * CAST(a - x AS DOUBLE))
                      + (v + ((v2 - v) / CAST(x2 - x AS DOUBLE))
                           * CAST(bnd - x AS DOUBLE))) / 2.0)
                     * CAST(bnd - a AS DOUBLE) * 1000000.0) AS BIGINT)
           AS sh_q,
         CAST(bnd - a AS BIGINT) AS dt_i
  FROM c)
SELECT source, doc_id, CAST(bin_start AS BIGINT) AS bin_start,
       CAST(count(*) AS BIGINT) AS n,
       round(CAST(CAST(SUM(sh_q) AS BIGINT) AS DOUBLE) / 1000000.0, 6)
         AS integral,
       round(CAST(CAST(SUM(dt_i) AS BIGINT) AS DOUBLE), 6) AS covered,
       round((CAST(CAST(SUM(sh_q) AS BIGINT) AS DOUBLE) / 1000000.0)
             / CAST(CAST(SUM(dt_i) AS BIGINT) AS DOUBLE), 6) AS itwa,
       round((CAST(CAST(SUM(sh_q) AS BIGINT) AS DOUBLE) / 1000000.0)
             / 3600.0, 6) AS fb_avg
FROM sh GROUP BY 1, 2, 3
"""


def q_freq_topk_tiers(spark, sf_dir):
    """Mergeable Misra-Gries top-k frequency sketch across tiers
    (TimescaleDB freq_agg analog; Agarwal et al. 2012 merge): exact
    per-50-bin counts -> k=4 MG sketch -> composed into 250-bins with
    NO raw re-scan.  Every quantity is an integer with pinned
    tie-breaks, so the DuckDB twin replays the full algorithm — a
    complete value oracle for the compose path, not just invariants."""
    s = series(spark, sf_dir).withColumn(
        "tok", F.floor(F.col("value")).cast("int")
    )
    t1 = analyses.freq_sketch(
        s, every=50, k=4, value_col="tok", key_cols=["source", "doc_id"]
    )
    t2 = analyses.compose_freq(
        t1, every=250, k=4, key_cols=["source", "doc_id"]
    )
    return t2.select(
        "source", "doc_id", "bin_start", "n", "err",
        F.col("value").cast("int").alias("value"), "counter",
    )


SQL_FREQ_TOPK_TIERS = f"""
WITH series AS ({SERIES_SQL}),
pts AS (SELECT source, doc_id, pos, CAST(floor(value) AS INT) AS v
        FROM series WHERE value IS NOT NULL),
cnt AS (SELECT source, doc_id,
               CAST(floor(pos / 50) AS BIGINT) * 50 AS b1, v,
               count(*) AS c
        FROM pts GROUP BY 1, 2, 3, 4),
r1 AS (SELECT *,
         row_number() OVER (PARTITION BY source, doc_id, b1
                            ORDER BY c DESC, v ASC) AS rk,
         SUM(c) OVER (PARTITION BY source, doc_id, b1) AS n1
       FROM cnt),
cs AS (SELECT source, doc_id, b1,
              coalesce(max(CASE WHEN rk = 5 THEN c END), 0) AS cstar,
              max(n1) AS n1
       FROM r1 GROUP BY 1, 2, 3),
k1 AS (SELECT r1.source, r1.doc_id, r1.b1, r1.v,
              r1.c - cs.cstar AS counter, cs.cstar AS err, cs.n1
       FROM r1 JOIN cs USING (source, doc_id, b1)
       WHERE rk <= 4 AND (r1.c - cs.cstar > 0 OR rk = 1)),
pc AS (SELECT source, doc_id,
              CAST(floor(b1 / 250) AS BIGINT) * 250 AS pb, b1,
              max(n1) AS n1, max(err) AS e1
       FROM k1 GROUP BY 1, 2, 3, 4),
pt AS (SELECT source, doc_id, pb, CAST(SUM(n1) AS BIGINT) AS n,
              CAST(SUM(e1) AS BIGINT) AS e
       FROM pc GROUP BY 1, 2, 3),
m AS (SELECT source, doc_id,
             CAST(floor(b1 / 250) AS BIGINT) * 250 AS pb, v,
             SUM(counter) AS c
      FROM k1 GROUP BY 1, 2, 3, 4),
r2 AS (SELECT *,
         row_number() OVER (PARTITION BY source, doc_id, pb
                            ORDER BY c DESC, v ASC) AS rk
       FROM m),
cs2 AS (SELECT source, doc_id, pb,
               coalesce(max(CASE WHEN rk = 5 THEN c END), 0) AS cstar
        FROM r2 GROUP BY 1, 2, 3),
k2 AS (SELECT r2.source, r2.doc_id, r2.pb, r2.v,
              r2.c - cs2.cstar AS counter, cs2.cstar AS cstar
       FROM r2 JOIN cs2 USING (source, doc_id, pb)
       WHERE rk <= 4 AND (r2.c - cs2.cstar > 0 OR rk = 1))
SELECT k2.source, k2.doc_id, CAST(k2.pb AS BIGINT) AS bin_start,
       pt.n, CAST(pt.e + k2.cstar AS BIGINT) AS err,
       CAST(k2.v AS INT) AS value, CAST(k2.counter AS BIGINT) AS counter
FROM k2 JOIN pt USING (source, doc_id, pb)
"""


_HOLT_A, _HOLT_B, _HOLT_H = 0.3, 0.1, 5.0


def q_holt_smooth(spark, sf_dir):
    """Holt double-exponential smoothing per series (Holt 1957): final
    (level, trend), h-step forecast and one-step RMSE from one exact
    struct-accumulator fold.  The DuckDB twin replays the identical
    fold with a recursive CTE (one row per series per step) —
    bit-identical doubles, so round-6 hashes match.  (list_reduce with
    a struct accumulator is NOT usable here: DuckDB evaluates the new
    struct's fields sequentially against an in-place-updated
    accumulator, so `b := f(acc.l, ...)` sees the already-overwritten
    `l` — verified numerically, diverges from the 3rd combine on.)"""
    out = analyses.holt_smooth(
        series(spark, sf_dir), alpha=_HOLT_A, beta=_HOLT_B,
        horizon=int(_HOLT_H), key_cols=["source", "doc_id"],
    )
    return out.select(
        "source", "doc_id", "n",
        _r(F.col("level")).alias("level"),
        _r(F.col("trend")).alias("trend"),
        _r(F.col("forecast")).alias("forecast"),
        _r(F.col("rmse")).alias("rmse"),
    )


# literals computed in Python and injected via repr so BOTH engines use
# the identical binary64 constants (1.0 - 0.3 != literal "0.7" in the
# last ulp — see the round-3 determinism notes)
SQL_HOLT_SMOOTH = f"""
WITH RECURSIVE series AS ({SERIES_SQL}),
pts AS (SELECT source, doc_id, pos, value FROM series
        WHERE value IS NOT NULL),
v AS (SELECT source, doc_id, array_agg(value ORDER BY pos) AS vals,
             CAST(count(*) AS BIGINT) AS n
      FROM pts GROUP BY 1, 2),
fold AS (
  SELECT source, doc_id, n, vals, 2 AS i,
         vals[2] AS l, vals[2] - vals[1] AS b, 0.0::DOUBLE AS sse
  FROM v WHERE n >= 2
  UNION ALL
  SELECT source, doc_id, n, vals, i + 1,
         {_HOLT_A!r} * vals[i + 1] + {1.0 - _HOLT_A!r} * (l + b),
         {_HOLT_B!r} * (({_HOLT_A!r} * vals[i + 1]
             + {1.0 - _HOLT_A!r} * (l + b)) - l)
           + {1.0 - _HOLT_B!r} * b,
         sse + (vals[i + 1] - (l + b)) * (vals[i + 1] - (l + b))
  FROM fold WHERE i < n
),
st AS (SELECT source, doc_id, l, b, sse FROM fold WHERE i = n)
SELECT v.source, v.doc_id, v.n,
       round(st.l, 6) AS level,
       round(st.b, 6) AS trend,
       round(st.l + {_HOLT_H!r} * st.b, 6) AS forecast,
       CASE WHEN v.n >= 3 THEN round(sqrt(st.sse / (v.n - 2)), 6) END
         AS rmse
FROM v LEFT JOIN st USING (source, doc_id)
"""


def q_theil_sen(spark, sf_dir):
    """Theil-Sen robust trend per 600-wide bin: exact median of
    within-bin pairwise slopes + median intercept.  Pair generation is
    a within-bin equi-join (O(m²) per bin, m bounded by the bin), and
    exact percentile(0.5) matches quantile_cont on identical doubles."""
    out = analyses.theil_sen_bins(
        series(spark, sf_dir), every=600, key_cols=["source", "doc_id"]
    )
    return out.select(
        "source", "doc_id", "bin_start", "n", "n_pairs",
        _r(F.col("slope")).alias("slope"),
        _r(F.col("intercept")).alias("intercept"),
    )


SQL_THEIL_SEN = f"""
WITH series AS ({SERIES_SQL}),
pts AS (SELECT source, doc_id,
               CAST(floor(pos / 600) AS BIGINT) * 600 AS bin_start,
               CAST(pos AS BIGINT) AS x, value AS v
        FROM series WHERE value IS NOT NULL),
pairs AS (
  SELECT a.source, a.doc_id, a.bin_start,
         (b.v - a.v) / CAST(b.x - a.x AS DOUBLE) AS slope
  FROM pts a JOIN pts b
    ON a.source = b.source AND a.doc_id = b.doc_id
   AND a.bin_start = b.bin_start AND a.x < b.x),
sl AS (
  SELECT source, doc_id, bin_start,
         CAST(count(*) AS BIGINT) AS n_pairs,
         quantile_cont(slope, 0.5) AS slope
  FROM pairs GROUP BY 1, 2, 3)
SELECT p.source, p.doc_id, p.bin_start,
       CAST(count(*) AS BIGINT) AS n, sl.n_pairs,
       round(sl.slope, 6) AS slope,
       round(quantile_cont(p.v - sl.slope * CAST(p.x AS DOUBLE), 0.5), 6)
         AS intercept
FROM pts p JOIN sl USING (source, doc_id, bin_start)
GROUP BY 1, 2, 3, sl.n_pairs, sl.slope
"""


def q_ddsketch_tiers(spark, sf_dir):
    """DDSketch log-bin quantile sketch through the tier path, as a
    self-verifying oracle: build 60-bin sketches, compose them into
    3600-bin sketches WITHOUT rescanning raw data, and emit per-source
    (a) integer totals the DuckDB twin recomputes from the series,
    (b) in-query invariant booleans — composed sketch bit-identical to
    a direct 3600 build (exact mergeability), and p50/p95 estimates
    within the (gamma-1)/(gamma+1) relative-error bound of the exact
    order statistic (Masson, Rim & Lee, VLDB 2019).  Integer/boolean
    output only, so the driver hash is float-determinism-proof."""
    from .operators.analyses import (
        compose_ddsketch, ddsketch_agg, ddsketch_quantiles)

    gamma = 1.02
    bound = (gamma - 1.0) / (gamma + 1.0) + 1e-9
    s = series(spark, sf_dir)
    sk1m = ddsketch_agg(s, every=60, gamma=gamma)
    composed = compose_ddsketch(sk1m, every=3600)
    direct = ddsketch_agg(s, every=3600, gamma=gamma)

    cols = ["source", "doc_id", "bin_start", "sign", "bucket", "cnt"]
    both = composed.select(*cols).unionByName(direct.select(*cols))
    mismatch = (
        both.groupBy(*cols).agg(F.count(F.lit(1)).alias("_k"))
        .groupBy("source")
        .agg(F.sum(F.when(F.col("_k") != 2, 1).otherwise(0)).alias("_bad"))
        .select("source", (F.col("_bad") == 0).alias("composed_eq_direct"))
    )

    qs = [0.5, 0.95]
    est = ddsketch_quantiles(composed, qs, gamma=gamma)
    pts = s.where(F.col("value").isNotNull()).withColumn(
        "bin_start",
        (F.floor(F.col("pos").cast("long") / 3600) * 3600).cast("long"),
    )
    wbin = Window.partitionBy("source", "doc_id", "bin_start")
    ranked = pts.withColumn(
        "_rn", F.row_number().over(wbin.orderBy("value"))
    ).withColumn("_nn", F.count(F.lit(1)).over(wbin))
    exacts = []
    for q in qs:
        rank = F.greatest(
            F.lit(1), F.ceil(F.lit(float(q)) * F.col("_nn")).cast("long"))
        exacts.append(
            ranked.where(F.col("_rn") == rank).select(
                "source", "doc_id", "bin_start",
                F.lit(float(q)).alias("q"),
                F.col("value").alias("exact"),
            )
        )
    exact = exacts[0].unionByName(exacts[1])
    err_ok = (
        # FULL join: a (key, bin, q) with an estimate but no exact row,
        # or vice versa, must fail the boolean — an inner join would
        # silently skip coverage holes
        est.join(exact, on=["source", "doc_id", "bin_start", "q"],
                 how="full")
        .withColumn(
            "_ok",
            F.coalesce(
                F.when(F.col("exact") == 0.0, F.col("est") == 0.0)
                .otherwise(
                    F.abs(F.col("est") - F.col("exact"))
                    / F.abs(F.col("exact")) <= F.lit(bound)
                ),
                F.lit(False),
            ),
        )
        .groupBy("source")
        .agg(
            F.min(F.when(F.col("q") == 0.5, F.col("_ok"))).alias(
                "relerr_ok_p50"),
            F.min(F.when(F.col("q") == 0.95, F.col("_ok"))).alias(
                "relerr_ok_p95"),
        )
    )
    totals = composed.groupBy("source").agg(
        F.count_distinct(F.col("doc_id"), F.col("bin_start")).alias("n_bins"),
        F.sum("cnt").cast("long").alias("total_cnt"),
    )
    return (
        totals.join(mismatch, on="source").join(err_ok, on="source")
        .select("source", "n_bins", "total_cnt", "composed_eq_direct",
                "relerr_ok_p50", "relerr_ok_p95")
        .orderBy("source")
    )


SQL_DDSKETCH_TIERS = f"""
WITH series AS ({SERIES_SQL})
SELECT source,
       CAST(count(DISTINCT (doc_id, CAST(floor(pos / 3600) AS BIGINT)))
            AS BIGINT) AS n_bins,
       CAST(count(value) AS BIGINT) AS total_cnt,
       TRUE AS composed_eq_direct,
       TRUE AS relerr_ok_p50,
       TRUE AS relerr_ok_p95
FROM series WHERE value IS NOT NULL
GROUP BY source ORDER BY source
"""


def q_ddsketch_collapse(spark, sf_dir):
    """UddSketch uniform collapse as a self-verifying oracle (Epicoco
    et al. 2020): pick the smallest global collapse level that caps
    every bin at <= 24 buckets, then emit per-source integer totals the
    DuckDB twin recomputes plus in-query booleans — cap actually holds,
    p50 estimate within the widened (gamma'-1)/(gamma'+1) bound of the
    exact order statistic, and collapse commutes with compose
    bit-for-bit (merge-then-collapse == collapse-then-merge)."""
    from .operators.analyses import (
        collapse_ddsketch, compose_ddsketch, ddsketch_agg,
        ddsketch_collapse_level, ddsketch_quantiles)

    gamma, cap = 1.02, 24
    s = series(spark, sf_dir)
    sk = ddsketch_agg(s, every=600, gamma=gamma)
    lv = ddsketch_collapse_level(sk, max_buckets=cap)
    small = collapse_ddsketch(sk, lv)
    g2 = gamma ** (2 ** lv)
    bound = (g2 - 1.0) / (g2 + 1.0) + 1e-9

    cap_ok = (
        small.groupBy("source", "doc_id", "bin_start")
        .agg(F.count(F.lit(1)).alias("_nb"))
        .groupBy("source")
        .agg(F.max("_nb").alias("_w"))
        .select("source", (F.col("_w") <= cap).alias("cap_ok"))
    )

    est = ddsketch_quantiles(small, [0.5], gamma=g2)
    pts = s.where(F.col("value").isNotNull()).withColumn(
        "bin_start",
        (F.floor(F.col("pos").cast("long") / 600) * 600).cast("long"),
    )
    wbin = Window.partitionBy("source", "doc_id", "bin_start")
    ranked = pts.withColumn(
        "_rn", F.row_number().over(wbin.orderBy("value"))
    ).withColumn("_nn", F.count(F.lit(1)).over(wbin))
    exact = ranked.where(
        F.col("_rn")
        == F.greatest(F.lit(1),
                      F.ceil(F.lit(0.5) * F.col("_nn")).cast("long"))
    ).select("source", "doc_id", "bin_start", F.col("value").alias("exact"))
    err_ok = (
        est.join(exact, on=["source", "doc_id", "bin_start"], how="full")
        .withColumn(
            "_ok",
            F.coalesce(
                F.when(F.col("exact") == 0.0, F.col("est") == 0.0)
                .otherwise(
                    F.abs(F.col("est") - F.col("exact"))
                    / F.abs(F.col("exact")) <= F.lit(bound)
                ),
                F.lit(False),
            ),
        )
        .groupBy("source")
        .agg(F.min("_ok").alias("relerr_ok_p50"))
    )

    cols = ["source", "doc_id", "bin_start", "sign", "bucket", "cnt"]
    a = collapse_ddsketch(compose_ddsketch(sk, 3600), lv).select(*cols)
    b = compose_ddsketch(collapse_ddsketch(sk, lv), 3600).select(*cols)
    commute = (
        a.unionByName(b)
        .groupBy(*cols).agg(F.count(F.lit(1)).alias("_k"))
        .groupBy("source")
        .agg(F.sum(F.when(F.col("_k") != 2, 1).otherwise(0)).alias("_bad"))
        .select("source", (F.col("_bad") == 0).alias("commute_ok"))
    )

    totals = small.groupBy("source").agg(
        F.sum("cnt").cast("long").alias("total_cnt"),
    )
    return (
        totals.join(cap_ok, on="source").join(err_ok, on="source")
        .join(commute, on="source")
        .select("source", "total_cnt", "cap_ok",
                "relerr_ok_p50", "commute_ok")
        .orderBy("source")
    )


SQL_DDSKETCH_COLLAPSE = f"""
WITH series AS ({SERIES_SQL})
SELECT source,
       CAST(count(value) AS BIGINT) AS total_cnt,
       TRUE AS cap_ok, TRUE AS relerr_ok_p50, TRUE AS commute_ok
FROM series WHERE value IS NOT NULL
GROUP BY source ORDER BY source
"""


def q_rollup_compose_family(spark, sf_dir):
    """The TimescaleDB ``rollup()`` family as one self-verifying
    oracle: counter_agg / gauge_agg / state_agg / heartbeat_agg /
    time_weighted_avg built at 60, composed to 3600 with their
    compose_* twins, and compared in-query against direct 3600 builds
    (exact on integer partials, <=1e-9 on derived ratios).  Emits
    per-source booleans + an integer bin total the DuckDB twin
    recomputes from the series."""
    from .operators.analyses import (
        compose_counter, compose_gauge, compose_heartbeat, compose_state,
        compose_twa, counter_agg, gauge_agg, heartbeat_agg, state_agg,
        time_weighted_avg)

    s = series(spark, sf_dir)
    # integer-quantized gauge/counter inputs -> exact partial sums
    g = s.withColumn("v", F.floor(F.col("value") * 100).cast("long"))
    cnt_src = g.withColumn("v", F.abs(F.col("v")))  # counters move up
    st = s.withColumn(
        "state",
        F.when(F.col("value") < 30, "low")
         .when(F.col("value") < 60, "mid").otherwise("high"),
    )

    def _ok(composed, direct, keys, float_cols):
        j = composed.alias("c").join(
            direct.alias("d"), on=keys, how="full"
        )
        checks = []
        for c in composed.columns:
            if c in keys:
                continue
            a, b = F.col(f"c.{c}"), F.col(f"d.{c}")
            both_null = a.isNull() & b.isNull()
            if c in float_cols:
                checks.append(both_null | (F.abs(a - b) <= 1e-9))
            else:
                checks.append(both_null | (a == b))
        good = checks[0]
        for ch in checks[1:]:
            good = good & ch
        # one-sided full-join rows (a bin present on only one side)
        # evaluate the comparisons to NULL — they must FAIL the check,
        # not be skipped by null-ignoring min
        return (
            j.groupBy(F.col("source").alias("src"))
            .agg(F.min(F.coalesce(good, F.lit(False))).alias("ok"))
        )

    keys = ["source", "doc_id", "bin_start", "bin_end", "bin_label"]
    c_ok = _ok(compose_counter(counter_agg(cnt_src, value_col="v",
                                           every=60), 3600),
               counter_agg(cnt_src, value_col="v", every=3600),
               keys, set())
    g_ok = _ok(compose_gauge(gauge_agg(g, value_col="v", every=60), 3600),
               gauge_agg(g, value_col="v", every=3600),
               keys, {"rate", "dx"})
    s_ok = _ok(compose_state(state_agg(st, every=60), 3600),
               state_agg(st, every=3600),
               keys + ["state"], {"duration"})
    h_ok = _ok(compose_heartbeat(
                   heartbeat_agg(s.where(F.col("value").isNotNull()),
                                 every=60, alive_window=8), 3600),
               heartbeat_agg(s.where(F.col("value").isNotNull()),
                             every=3600, alive_window=8),
               keys, {"uptime", "downtime", "live_frac"})
    t_ok = _ok(compose_twa(time_weighted_avg(s, every=60,
                                             quantized=1e6), 3600),
               time_weighted_avg(s, every=3600, quantized=1e6),
               keys, {"integral", "duration", "twa"})

    n_bins = (
        s.where(F.col("value").isNotNull())
        .groupBy(F.col("source").alias("src"))
        .agg(F.count_distinct(
            F.col("doc_id"),
            (F.floor(F.col("pos") / 3600)).cast("long")).alias("n_bins_1h"))
    )
    out = (
        n_bins.join(c_ok.withColumnRenamed("ok", "counter_ok"), on="src")
        .join(g_ok.withColumnRenamed("ok", "gauge_ok"), on="src")
        .join(s_ok.withColumnRenamed("ok", "state_ok"), on="src")
        .join(h_ok.withColumnRenamed("ok", "heartbeat_ok"), on="src")
        .join(t_ok.withColumnRenamed("ok", "twa_ok"), on="src")
    )
    return out.select(
        F.col("src").alias("source"), "n_bins_1h", "counter_ok",
        "gauge_ok", "state_ok", "heartbeat_ok", "twa_ok",
    ).orderBy("source")


SQL_ROLLUP_COMPOSE_FAMILY = f"""
WITH series AS ({SERIES_SQL})
SELECT source,
       CAST(count(DISTINCT (doc_id, CAST(floor(pos / 3600) AS BIGINT)))
            AS BIGINT) AS n_bins_1h,
       TRUE AS counter_ok, TRUE AS gauge_ok, TRUE AS state_ok,
       TRUE AS heartbeat_ok, TRUE AS twa_ok
FROM series WHERE value IS NOT NULL
GROUP BY source ORDER BY source
"""


def q_tier_snapshot_travel(spark, sf_dir):
    """Iceberg-analog snapshot semantics through SnapshotBackend
    (tiers.py), as a self-verifying oracle: commit a 3600-bin tier
    (snapshot 1), overwrite ONE source partition (snapshot 2), then
    prove — with in-query booleans over integer row counts the DuckDB
    twin recomputes from the series — time travel (read_at(snap1) is
    the full v1), O(1) rollback, metadata-only partition drop (still
    time-travel-visible), and snapshot expiry (files reclaimed, history
    closed, current read intact)."""
    import tempfile

    from .operators.tiers import SnapshotBackend

    s = series(spark, sf_dir)
    v1 = (
        s.groupBy(
            "source", "doc_id",
            (F.floor(F.col("pos").cast("long") / 3600) * 3600)
            .cast("long").alias("bin_start"),
        )
        .agg(F.count("value").cast("long").alias("n"))
    )
    min_src = v1.agg(F.min("source")).first()[0]

    import shutil

    root = tempfile.mkdtemp(prefix="snaptravel_")
    try:
        return _tier_snapshot_travel_body(spark, root, v1, min_src)
    finally:
        shutil.rmtree(root, ignore_errors=True)


def _tier_snapshot_travel_body(spark, root, v1, min_src):
    from .operators.tiers import SnapshotBackend

    v2 = v1.where((F.col("source") == min_src) & (F.col("bin_start") == 0))
    be = SnapshotBackend(spark, root, partition_col="source")
    be.write_partitions(v1, "t")
    snap1 = be.current_snapshot_id("t")
    be.write_partitions(v2, "t")
    snap2 = be.current_snapshot_id("t")

    n_v1 = v1.count()
    n_v2 = v2.count()
    n_min_src = v1.where(F.col("source") == min_src).count()
    n_other = n_v1 - n_min_src

    cur_ok = be.read("t").count() == n_other + n_v2
    travel_ok = be.read_at("t", snap1).count() == n_v1
    be.rollback("t", snap1)
    rollback_ok = (
        be.read("t").count() == n_v1
        and be.read_at("t", snap2).count() == n_other + n_v2
    )
    be.drop_partition("t", min_src)
    drop_metadata_only_ok = (
        min_src not in be.partition_values("t")
        and be.read("t").count() == n_other
        and be.read_at("t", snap1).count() == n_v1
    )
    stats = be.expire_snapshots("t", keep_last=1)
    try:
        be.read_at("t", snap1)
        history_closed = False
    except ValueError:
        history_closed = True
    expire_ok = (
        stats["files_deleted"] >= 1
        and be.read("t").count() == n_other
        and history_closed
    )
    return spark.createDataFrame(
        [(n_v1, n_v2, n_other, bool(cur_ok and travel_ok),
          bool(rollback_ok), bool(drop_metadata_only_ok), bool(expire_ok))],
        "n_v1 long, n_v2 long, n_other long, travel_ok boolean, "
        "rollback_ok boolean, drop_metadata_only_ok boolean, "
        "expire_ok boolean",
    )


SQL_SNAPSHOT_TRAVEL = f"""
WITH series AS ({SERIES_SQL}),
bins AS (
  SELECT DISTINCT source, doc_id,
         CAST(floor(pos / 3600) * 3600 AS BIGINT) AS bin_start
  FROM series),
m AS (SELECT min(source) AS s FROM bins)
SELECT CAST(count(*) AS BIGINT) AS n_v1,
       CAST(sum(CASE WHEN source = (SELECT s FROM m) AND bin_start = 0
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_v2,
       CAST(sum(CASE WHEN source <> (SELECT s FROM m)
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_other,
       TRUE AS travel_ok, TRUE AS rollback_ok,
       TRUE AS drop_metadata_only_ok, TRUE AS expire_ok
FROM bins
"""


def q_asap_smooth(spark, sf_dir):
    """SELF-VERIFYING ASAP smoothing oracle (Rong & Bailis, VLDB 2017;
    registered per VERDICT r4 item 8): the window SEARCH (ACF-peak
    candidates, kurtosis-gated roughness minimization) runs in the
    numpy kernel and is not float-replayable in SQL — knife-edge
    comparisons on pairwise-summed numpy moments flip under any other
    summation order — so the oracle surface is the paper's OWN
    guarantees, verified in-query through independent Spark JVM
    recomputation and emitted as per-source booleans alongside integer
    totals the DuckDB twin recomputes from the series:

    - trailing_mean_ok: every smoothed point equals the trailing
      chosen-window mean over the null-compacted sequence (banded
      equi-join recompute — JVM window math vs the kernel's numpy
      cumsum, agreement < 1e-9);
    - kurtosis_preserved_ok: population kurtosis of the smoothed
      series >= the raw series' (the ASAP constraint that keeps real
      spikes), rel. tol 1e-6;
    - roughness_reduced_ok: std of first differences did not increase.
    """
    keys = ["source", "doc_id"]
    s = series(spark, sf_dir)
    sm = analyses.asap_smooth(s, max_window_frac=0.1, key_cols=keys)
    nn = s.where(F.col("value").isNotNull())
    wseq = Window.partitionBy(*keys).orderBy("pos")
    nn = nn.withColumn("ci", F.row_number().over(wseq) - 1)

    # (a) trailing-mean recompute: banded join on the compact index
    a = (
        sm.join(nn.select(*keys, "pos", "ci"), keys + ["pos"])
        .select(*keys, "pos", "smoothed", "window", "ci")
        .alias("a")
    )
    b = nn.select(*keys, F.col("ci").alias("bci"), "value").alias("b")
    rec = (
        a.join(
            b,
            [F.col(f"a.{k}") == F.col(f"b.{k}") for k in keys]
            + [
                F.col("b.bci")
                .between(F.col("a.ci") - (F.col("a.window") - 1),
                         F.col("a.ci"))
            ],
        )
        .groupBy(
            *[F.col(f"a.{k}") for k in keys],
            F.col("a.pos"), F.col("a.smoothed"), F.col("a.window"),
        )
        .agg(F.avg("b.value").alias("mrec"), F.count("*").alias("cnt"))
        .groupBy(*keys)
        .agg(
            F.min(
                (F.abs(F.col("smoothed") - F.col("mrec")) < 1e-9)
                & (F.col("cnt") == F.col("window"))
            ).alias("match_ok")
        )
    )

    # (b)+(c) moment recomputation, raw vs smoothed, per series
    def _shape(df, col):
        mu = F.avg(F.col(col)).over(Window.partitionBy(*keys))
        d = df.withColumn("_d", F.col(col) - mu).withColumn(
            "_dd", F.col(col) - F.lag(col).over(
                Window.partitionBy(*keys).orderBy("pos"))
        )
        return d.groupBy(*keys).agg(
            (F.avg(F.pow("_d", 4)) / F.pow(F.avg(F.pow("_d", 2)), 2))
            .alias("kurt"),
            F.sqrt(F.var_pop("_dd")).alias("rough"),
        )
    raw_st = _shape(nn, "value")
    sm_st = _shape(sm, "smoothed")
    tol = 1e-6
    shape_ok = (
        raw_st.alias("r")
        .join(sm_st.alias("s"), keys)
        .select(
            *[F.col(f"r.{k}") for k in keys],
            F.coalesce(
                F.col("s.kurt")
                >= F.col("r.kurt") - tol * (F.abs(F.col("r.kurt")) + 1),
                F.lit(True),  # zero-variance series: kernel defines 0
            ).alias("kurt_ok"),
            F.coalesce(
                F.col("s.rough") <= F.col("r.rough") + tol,
                F.lit(True),  # <2 diffs
            ).alias("rough_ok"),
        )
    )

    per_series = rec.join(shape_ok, keys)
    counts = nn.groupBy("source").agg(
        F.countDistinct("doc_id").cast("long").alias("n_series"),
        F.count("value").cast("long").alias("n_points"),
    )
    verdicts = per_series.groupBy("source").agg(
        F.min("match_ok").alias("trailing_mean_ok"),
        F.min("kurt_ok").alias("kurtosis_preserved_ok"),
        F.min("rough_ok").alias("roughness_reduced_ok"),
    )
    return counts.join(verdicts, "source").select(
        "source", "n_series", "n_points", "trailing_mean_ok",
        "kurtosis_preserved_ok", "roughness_reduced_ok",
    )


SQL_ASAP_SMOOTH = f"""
WITH series AS ({SERIES_SQL})
SELECT source,
       CAST(count(DISTINCT doc_id) AS BIGINT) AS n_series,
       CAST(count(value) AS BIGINT) AS n_points,
       TRUE AS trailing_mean_ok,
       TRUE AS kurtosis_preserved_ok,
       TRUE AS roughness_reduced_ok
FROM series GROUP BY source
"""


_SAX_SEGMENTS, _SAX_ALPHABET = 8, 4


def q_sax_symbolize(spark, sf_dir):
    """SAX symbolic aggregate approximation per series (Lin et al.
    DMKD 2003): z-normalize -> 8-segment PAA -> 4-letter Gaussian
    alphabet.  All JVM expressions (one window pass + two groupBys on
    the series key); the DuckDB twin replays the identical arithmetic
    with the same binary64 breakpoint literals, so symbols match
    exactly (paa rounded for the hash; a symbol flip would need a
    segment mean within float noise of a breakpoint)."""
    out = analyses.sax_symbolize(
        series(spark, sf_dir),
        segments=_SAX_SEGMENTS,
        alphabet=_SAX_ALPHABET,
        key_cols=["source", "doc_id"],
    )
    return out.select(
        "source", "doc_id", "seg", "n_pts",
        _r(F.col("paa")).alias("paa"), "symbol", "letter",
    )


_SAX_BPS = __import__(
    "diive_spark.operators.analyses", fromlist=["SAX_BREAKPOINTS"]
).SAX_BREAKPOINTS[_SAX_ALPHABET]

SQL_SAX_SYMBOLIZE = f"""
WITH series AS ({SERIES_SQL}),
pts AS (SELECT source, doc_id, pos, value FROM series
        WHERE value IS NOT NULL),
ix AS (SELECT source, doc_id, value,
              row_number() OVER (PARTITION BY source, doc_id
                                 ORDER BY pos) - 1 AS ci
       FROM pts),
st AS (SELECT source, doc_id, avg(value) AS mu,
              stddev_pop(value) AS sd, count(*) AS n
       FROM ix GROUP BY 1, 2),
zp AS (SELECT ix.source, ix.doc_id,
              CAST(floor(ix.ci * {_SAX_SEGMENTS} / st.n) AS BIGINT) AS seg,
              CASE WHEN st.sd IS NULL OR st.sd = 0 THEN 0.0
                   ELSE (ix.value - st.mu) / st.sd END AS z
       FROM ix JOIN st USING (source, doc_id)),
pa AS (SELECT source, doc_id, seg, CAST(count(*) AS BIGINT) AS n_pts,
              avg(z) AS paa
       FROM zp GROUP BY 1, 2, 3),
sym AS (SELECT *,
          CAST(({" + ".join(
              f"CASE WHEN paa > {bp!r} THEN 1 ELSE 0 END"
              for bp in _SAX_BPS)}) AS INT) AS symbol
        FROM pa)
SELECT source, doc_id, seg, n_pts, round(paa, 6) AS paa, symbol,
       chr(97 + symbol) AS letter
FROM sym
"""


_LB_H = 10


def q_ljung_box(spark, sf_dir):
    """Ljung-Box white-noise test per series (Ljung & Box 1978): Q over
    10 lags vs the published chi-square 95% critical value.  Running
    sums only (no collected arrays), one window pass + one groupBy; the
    DuckDB twin replays the identical sums and left-to-right term
    order, rho^2 as a plain product on both engines (pow() paths
    differ across engines in the last ulp)."""
    out = analyses.ljung_box(
        series(spark, sf_dir), h=_LB_H, key_cols=["source", "doc_id"]
    )
    return out.select(
        "source", "doc_id", "n",
        _r(F.col("q_stat")).alias("q_stat"),
        "h", "chi2_crit_95", "white_noise_ok",
    )


_LB_CRIT = __import__(
    "diive_spark.operators.analyses", fromlist=["CHI2_95"]
).CHI2_95[_LB_H]

_LB_LAGS = ",\n            ".join(
    f"lag(x, {k}) OVER w AS l{k}" for k in range(1, _LB_H + 1)
)
_LB_NUMS = ",\n           ".join(
    f"sum(CASE WHEN l.l{k} IS NOT NULL"
    f" THEN (l.x - st.mu) * (l.l{k} - st.mu) END) AS num{k}"
    for k in range(1, _LB_H + 1)
)
_LB_TERMS = "\n         + ".join(
    f"(num{k} / den) * (num{k} / den) / (CAST(n AS DOUBLE) - {float(k)!r})"
    for k in range(1, _LB_H + 1)
)

SQL_LJUNG_BOX = f"""
WITH series AS ({SERIES_SQL}),
pts AS (SELECT source, doc_id, pos, CAST(value AS DOUBLE) AS x
        FROM series WHERE value IS NOT NULL),
lagd AS (SELECT source, doc_id, x,
            {_LB_LAGS}
         FROM pts
         WINDOW w AS (PARTITION BY source, doc_id ORDER BY pos)),
st AS (SELECT source, doc_id, CAST(count(*) AS BIGINT) AS n,
              avg(x) AS mu
       FROM lagd GROUP BY 1, 2),
agg AS (SELECT l.source, l.doc_id, st.n,
           sum((l.x - st.mu) * (l.x - st.mu)) AS den,
           {_LB_NUMS}
        FROM lagd l JOIN st USING (source, doc_id)
        GROUP BY 1, 2, 3),
q AS (SELECT source, doc_id, n,
         CASE WHEN den > 0 THEN
           CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) + 2.0) *
           ({_LB_TERMS})
         END AS q_stat
      FROM agg WHERE n > {_LB_H})
SELECT source, doc_id, n, round(q_stat, 6) AS q_stat,
       CAST({_LB_H} AS INT) AS h,
       {_LB_CRIT!r} AS chi2_crit_95,
       CASE WHEN q_stat IS NULL THEN NULL
            ELSE q_stat <= {_LB_CRIT!r} END AS white_noise_ok
FROM q
"""


def q_sax_motif_buckets(spark, sf_dir):
    """Cross-series motif discovery by SAX-word bucketing (Lin et al.
    DMKD 2003 §5): one equi-shuffle on the 8-letter word replaces
    cross-series all-pairs shape comparison — the LSH-band pattern
    applied to shapes.  min_series=1 so the driver hashes EVERY
    bucket; members emitted as a sorted ';'-joined string (array
    columns don't canonicalize through the driver compare)."""
    out = analyses.sax_motif_buckets(
        series(spark, sf_dir),
        segments=_SAX_SEGMENTS,
        alphabet=_SAX_ALPHABET,
        min_series=1,
        key_cols=["source", "doc_id"],
    )
    return out.select(
        "word", "n_series", F.array_join("members", ";").alias("members")
    )


SQL_SAX_MOTIF_BUCKETS = f"""
WITH series AS ({SERIES_SQL}),
pts AS (SELECT source, doc_id, pos, value FROM series
        WHERE value IS NOT NULL),
ix AS (SELECT source, doc_id, value,
              row_number() OVER (PARTITION BY source, doc_id
                                 ORDER BY pos) - 1 AS ci
       FROM pts),
st AS (SELECT source, doc_id, avg(value) AS mu,
              stddev_pop(value) AS sd, count(*) AS n
       FROM ix GROUP BY 1, 2),
zp AS (SELECT ix.source, ix.doc_id,
              CAST(floor(ix.ci * {_SAX_SEGMENTS} / st.n) AS BIGINT) AS seg,
              CASE WHEN st.sd IS NULL OR st.sd = 0 THEN 0.0
                   ELSE (ix.value - st.mu) / st.sd END AS z
       FROM ix JOIN st USING (source, doc_id)),
pa AS (SELECT source, doc_id, seg, avg(z) AS paa
       FROM zp GROUP BY 1, 2, 3),
sym AS (SELECT source, doc_id, seg,
          chr(97 + ({" + ".join(
              f"CASE WHEN paa > {bp!r} THEN 1 ELSE 0 END"
              for bp in _SAX_BPS)})) AS letter
        FROM pa),
words AS (SELECT source, doc_id,
                 string_agg(letter, '' ORDER BY seg) AS word
          FROM sym GROUP BY 1, 2),
sids AS (SELECT word, source || '|' || doc_id AS sid FROM words)
SELECT word, CAST(count(*) AS BIGINT) AS n_series,
       string_agg(sid, ';' ORDER BY sid) AS members
FROM sids GROUP BY word
"""


_MP_M, _MP_EXCL, _MP_CAP = 8, 4, 200


def q_matrix_profile(spark, sf_dir):
    """Matrix profile per series (Yeh et al. ICDM 2016): z-normalized
    distance from every length-8 subsequence to its nearest non-trivial
    neighbor.  The numpy kernel computes it with one BLAS matmul per
    series; the DuckDB twin recomputes EVERY pairwise distance from
    scratch (subsequence-moment windows + an 8-offset dot-product
    join) — a full independent replay, not an invariant check.  Both
    sides cap each series at its first 200 null-free points: the twin's
    pair join is O(cap^2) per series and the driver runs at sf0.01."""
    keys = ["source", "doc_id"]
    nn = series(spark, sf_dir).where(F.col("value").isNotNull())
    w = Window.partitionBy(*keys).orderBy("pos")
    capped = (
        nn.withColumn("_ci", F.row_number().over(w) - 1)
        .where(F.col("_ci") < _MP_CAP)
        .drop("_ci")
    )
    out = analyses.matrix_profile(
        capped, m=_MP_M, exclusion=_MP_EXCL, key_cols=keys,
        max_points=_MP_CAP,
    )
    return out.select(
        "source", "doc_id", "sub_ci", _r(F.col("mp")).alias("mp")
    )


SQL_MATRIX_PROFILE = f"""
WITH series AS ({SERIES_SQL}),
pts AS (SELECT source, doc_id, value,
               row_number() OVER (PARTITION BY source, doc_id
                                  ORDER BY pos) - 1 AS ci
        FROM series WHERE value IS NOT NULL),
cap AS (SELECT * FROM pts WHERE ci < {_MP_CAP}),
nn AS (SELECT source, doc_id, count(*) AS n FROM cap GROUP BY 1, 2),
winmom AS (SELECT source, doc_id, ci AS i,
                  avg(value) OVER fr AS mu,
                  var_pop(value) OVER fr AS varr
           FROM cap
           WINDOW fr AS (PARTITION BY source, doc_id ORDER BY ci
                         ROWS BETWEEN CURRENT ROW
                         AND {_MP_M - 1} FOLLOWING)),
sidx AS (SELECT w.source, w.doc_id, w.i, w.mu, sqrt(w.varr) AS sd
         FROM winmom w JOIN nn USING (source, doc_id)
         WHERE w.i <= nn.n - {_MP_M}),
pairs AS (SELECT a.source, a.doc_id, a.i, b.i AS j,
                 a.mu AS mui, b.mu AS muj, a.sd AS sdi, b.sd AS sdj
          FROM sidx a JOIN sidx b USING (source, doc_id)
          WHERE abs(b.i - a.i) >= {_MP_EXCL}),
dots AS (SELECT p.source, p.doc_id, p.i, p.j,
                p.mui, p.muj, p.sdi, p.sdj,
                sum(xa.value * xb.value) AS dot
         FROM pairs p
         JOIN cap xa ON xa.source = p.source AND xa.doc_id = p.doc_id
                    AND xa.ci BETWEEN p.i AND p.i + {_MP_M - 1}
         JOIN cap xb ON xb.source = p.source AND xb.doc_id = p.doc_id
                    AND xb.ci = p.j + (xa.ci - p.i)
         GROUP BY 1, 2, 3, 4, 5, 6, 7, 8),
d AS (SELECT source, doc_id, i, j,
             CASE WHEN sdi = 0 AND sdj = 0 THEN 0.0
                  WHEN sdi = 0 OR sdj = 0 THEN sqrt({float(_MP_M)!r})
                  ELSE sqrt(greatest(
                    2.0 * {_MP_M} * (1.0 - (dot - {_MP_M} * mui * muj)
                                     / ({_MP_M} * sdi * sdj)), 0.0))
             END AS dist
      FROM dots)
SELECT source, doc_id, CAST(i AS BIGINT) AS sub_ci,
       round(min(dist), 6) AS mp
FROM d GROUP BY 1, 2, 3
"""


_BL_M, _BL_K, _BL_N = 1 << 15, 4, 4


def q_bloom_decontaminate(spark, sf_dir):
    """Bloom-filter decontamination (Bloom 1970 bit set over benchmark
    4-grams, probed by corpus grams): the scale path for membership
    sides too big to broadcast as exact hash sets.  Hash-exact oracle —
    the DuckDB twin rebuilds the identical md5-derived bit positions —
    plus the Bloom guarantee verified as data: ``n_false_neg`` (true
    hits the filter missed) must be 0 per doc, while ``n_bloom_hits -
    n_true_hits`` exposes the (deterministic, md5-fixed) false
    positives the one-sided error allows."""
    docs = _load(spark, sf_dir, "documents")
    bench_grams = (
        docs.where(F.col("source") == "src0")
        .select(F.explode(scrub.word_ngrams(F.col("text"), _BL_N))
                .alias("g"))
        .distinct()
    )
    bloom = scrub.bloom_build(
        bench_grams, item_col="g", m_bits=_BL_M, k=_BL_K
    )
    corpus = docs.where(F.col("source") != "src0").select(
        "doc_id",
        F.explode(scrub.word_ngrams(F.col("text"), _BL_N)).alias("g"),
    )
    flagged = scrub.bloom_probe(
        corpus, bloom, item_col="g", m_bits=_BL_M, k=_BL_K
    )
    truth = bench_grams.withColumn("_true", F.lit(1))
    per_doc = (
        flagged.join(F.broadcast(truth), on="g", how="left")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_grams"),
            F.sum(F.coalesce(F.col("_true"), F.lit(0)))
            .cast("long").alias("n_true_hits"),
            F.sum(F.col("bloom_hit").cast("int"))
            .cast("long").alias("n_bloom_hits"),
            F.sum((F.col("_true").isNotNull() & ~F.col("bloom_hit"))
                  .cast("int")).cast("long").alias("n_false_neg"),
        )
    )
    return per_doc.select(
        "doc_id", "n_grams", "n_true_hits", "n_bloom_hits",
        "n_false_neg",
        (F.col("n_false_neg") == 0).alias("no_false_neg_ok"),
    )


_BL_POS = (
    "(('0x' || substr(md5('bf' || CAST(hidx.i AS VARCHAR) || ':' || {g}),"
    f" 1, 15))::BIGINT) % {_BL_M}"
)

SQL_BLOOM_DECONTAMINATE = rf"""
WITH toks AS (
  SELECT doc_id, source,
         regexp_split_to_array(lower(trim(text)), '\s+') AS w
  FROM documents),
grams AS (
  SELECT doc_id, source,
         list_distinct(list_transform(range(1, len(w) - {_BL_N} + 2),
                       i -> array_to_string(w[i:i+{_BL_N - 1}], ' '))) AS gs
  FROM toks WHERE len(w) >= {_BL_N}),
bench AS (
  SELECT DISTINCT unnest(gs) AS g FROM grams WHERE source = 'src0'),
hidx(i) AS (VALUES {", ".join(f"({i})" for i in range(_BL_K))}),
bits AS (
  SELECT DISTINCT {_BL_POS.format(g="bench.g")} AS bit
  FROM bench CROSS JOIN hidx),
corpus AS (
  SELECT doc_id, unnest(gs) AS g FROM grams WHERE source <> 'src0'),
cg AS (SELECT DISTINCT g FROM corpus),
probe AS (
  SELECT cg.g, count(b.bit) = {_BL_K} AS bloom_hit
  FROM cg CROSS JOIN hidx
  LEFT JOIN bits b ON b.bit = {_BL_POS.format(g="cg.g")}
  GROUP BY cg.g),
tr AS (SELECT g, 1 AS t FROM bench),
agg AS (
  SELECT c.doc_id,
         CAST(count(*) AS BIGINT) AS n_grams,
         CAST(sum(coalesce(tr.t, 0)) AS BIGINT) AS n_true_hits,
         CAST(sum(CASE WHEN p.bloom_hit THEN 1 ELSE 0 END) AS BIGINT)
           AS n_bloom_hits,
         CAST(sum(CASE WHEN tr.t IS NOT NULL AND NOT p.bloom_hit
                       THEN 1 ELSE 0 END) AS BIGINT) AS n_false_neg
  FROM corpus c
  JOIN probe p USING (g)
  LEFT JOIN tr USING (g)
  GROUP BY 1)
SELECT doc_id, n_grams, n_true_hits, n_bloom_hits, n_false_neg,
       n_false_neg = 0 AS no_false_neg_ok
FROM agg
"""


_HW_M, _HW_A, _HW_B, _HW_G, _HW_H = 12, 0.3, 0.1, 0.1, 5


def q_holt_winters(spark, sf_dir):
    """Holt-Winters additive triple-exponential smoothing per series
    (Winters 1960): final (level, trend, next seasonal), h-step
    forecast and one-step RMSE from one exact struct-accumulator fold
    carrying the rolling seasonal array.  The DuckDB twin replays the
    identical fold with a recursive CTE whose state includes a LIST
    column (the holt_smooth precedent extended with seasonal state);
    the init means fold sequentially on both engines (list_reduce /
    aggregate — never a vectorized sum), so doubles are bit-identical."""
    out = analyses.holt_winters_smooth(
        series(spark, sf_dir), period=_HW_M, alpha=_HW_A, beta=_HW_B,
        gamma=_HW_G, horizon=_HW_H, key_cols=["source", "doc_id"],
    )
    return out.select(
        "source", "doc_id", "n",
        _r(F.col("level")).alias("level"),
        _r(F.col("trend")).alias("trend"),
        _r(F.col("season_next")).alias("season_next"),
        _r(F.col("forecast")).alias("forecast"),
        _r(F.col("rmse")).alias("rmse"),
    )


_HW_SIDX = ((_HW_H - 1) % _HW_M) + 1

SQL_HOLT_WINTERS = f"""
WITH RECURSIVE series AS ({SERIES_SQL}),
pts AS (SELECT source, doc_id, pos, value FROM series
        WHERE value IS NOT NULL),
v AS (SELECT source, doc_id, array_agg(value ORDER BY pos) AS vals,
             CAST(count(*) AS BIGINT) AS n
      FROM pts GROUP BY 1, 2),
init AS (SELECT source, doc_id, n, vals, l1,
                (s2sum / {float(_HW_M)!r} - l1) / {float(_HW_M)!r} AS b1
         FROM (SELECT *,
                 list_reduce(vals[1:{_HW_M}],
                             (acc, x) -> acc + x) / {float(_HW_M)!r} AS l1,
                 list_reduce(vals[{_HW_M + 1}:{2 * _HW_M}],
                             (acc, x) -> acc + x) AS s2sum
               FROM v WHERE n >= {2 * _HW_M})),
fold AS (
  SELECT source, doc_id, n, vals, {_HW_M} AS i, l1 AS l, b1 AS b,
         0.0::DOUBLE AS sse,
         list_transform(vals[1:{_HW_M}], x -> x - l1) AS s
  FROM init
  UNION ALL
  SELECT source, doc_id, n, vals, i + 1,
         {_HW_A!r} * (vals[i + 1] - s[1]) + {1.0 - _HW_A!r} * (l + b),
         {_HW_B!r} * (({_HW_A!r} * (vals[i + 1] - s[1])
             + {1.0 - _HW_A!r} * (l + b)) - l) + {1.0 - _HW_B!r} * b,
         sse + (vals[i + 1] - (l + b + s[1]))
             * (vals[i + 1] - (l + b + s[1])),
         list_append(s[2:],
             {_HW_G!r} * (vals[i + 1] - ({_HW_A!r} * (vals[i + 1] - s[1])
                 + {1.0 - _HW_A!r} * (l + b))) + {1.0 - _HW_G!r} * s[1])
  FROM fold WHERE i < n
),
st AS (SELECT source, doc_id, l, b, sse, s FROM fold WHERE i = n)
SELECT v.source, v.doc_id, v.n,
       round(st.l, 6) AS level,
       round(st.b, 6) AS trend,
       round(st.s[{_HW_SIDX}], 6) AS season_next,
       round(st.l + {float(_HW_H)!r} * st.b + st.s[{_HW_SIDX}], 6)
         AS forecast,
       round(sqrt(st.sse / CAST(v.n - {_HW_M} AS DOUBLE)), 6) AS rmse
FROM v LEFT JOIN st USING (source, doc_id)
"""


_CM_D, _CM_W, _CM_B1, _CM_PB, _CM_TOPK = 4, 128, 50, 250, 3


def q_cm_heavy_hitters(spark, sf_dir):
    """Count-Min point-frequency store over composed tiers (Cormode &
    Muthukrishnan 2005): build 50-pos child sketches, merge them into
    250-pos parents WITHOUT re-scanning readings, then probe the
    parents for each bin's true top-3 items.  Self-verifying on two
    axes the DuckDB twin replays or certifies: the twin rebuilds the
    identical integer hash cells and min-over-rows estimates
    (hash-exact), while ``compose_exact_ok`` is proven Spark-side by a
    full-outer cell compare of the composed sketch vs one built
    directly at parent resolution (counters are additive, so any
    mismatch is an engine bug)."""
    keys = ["source", "doc_id"]
    pts = (
        series(spark, sf_dir)
        .where(F.col("value").isNotNull())
        .select(*keys, "pos", F.floor("value").cast("long").alias("iv"))
    )
    sk1 = analyses.cm_sketch_agg(
        pts, every=_CM_B1, depth=_CM_D, width=_CM_W,
        value_col="iv", key_cols=keys,
    )
    skp = analyses.compose_cm(sk1, every=_CM_PB, key_cols=keys)
    direct = analyses.cm_sketch_agg(
        pts, every=_CM_PB, depth=_CM_D, width=_CM_W,
        value_col="iv", key_cols=keys,
    )
    cell = keys + ["bin_start", "row", "col"]
    mism = (
        skp.withColumnRenamed("cnt", "_ca")
        .join(direct.withColumnRenamed("cnt", "_cb"), cell, "full")
        .where(
            F.col("_ca").isNull()
            | F.col("_cb").isNull()
            | (F.col("_ca") != F.col("_cb"))
        )
        .agg(F.count(F.lit(1)).alias("_bad"))
    )
    pb = (F.floor(F.col("pos") / _CM_PB) * _CM_PB).cast("long")
    exact = (
        pts.select(*keys, pb.alias("bin_start"), "iv")
        .groupBy(*keys, "bin_start", "iv")
        .agg(F.count(F.lit(1)).cast("long").alias("true_cnt"))
    )
    wtop = Window.partitionBy(*keys, "bin_start").orderBy(
        F.desc("true_cnt"), F.asc("iv")
    )
    probes = (
        exact.withColumn("rk", F.row_number().over(wtop))
        .where(F.col("rk") <= _CM_TOPK)
    )
    est = analyses.cm_estimate(
        skp, probes, depth=_CM_D, width=_CM_W,
        value_col="iv", key_cols=keys,
    )
    return (
        est.crossJoin(mism)  # single-row stat join (verification scalar)
        .select(
            *keys,
            "bin_start",
            F.col("iv").cast("int").alias("value"),
            F.col("rk").cast("int").alias("rk"),
            "true_cnt",
            "cm_est",
            (F.col("cm_est") >= F.col("true_cnt")).alias("ge_ok"),
            (F.col("_bad") == 0).alias("compose_exact_ok"),
        )
    )


_CM_H_ROWS = ", ".join(
    f"({r}, {analyses.CM_SEEDS[r][0]}, {analyses.CM_SEEDS[r][1]})"
    for r in range(_CM_D)
)

SQL_CM_HEAVY_HITTERS = f"""
WITH series AS ({SERIES_SQL}),
pts AS (SELECT source, doc_id, pos,
               CAST(floor(value) AS BIGINT) AS iv
        FROM series WHERE value IS NOT NULL),
pb AS (SELECT source, doc_id,
              CAST(floor(pos / {_CM_PB}) AS BIGINT) * {_CM_PB} AS bin_start,
              iv
       FROM pts),
h(hrow, a, b) AS (VALUES {_CM_H_ROWS}),
cells AS (SELECT source, doc_id, bin_start, h.hrow,
                 ((h.a * (iv % {analyses.CM_PRIME}) + h.b)
                  % {analyses.CM_PRIME}) % {_CM_W} AS col,
                 CAST(count(*) AS BIGINT) AS cnt
          FROM pb CROSS JOIN h
          GROUP BY 1, 2, 3, 4, 5),
exact AS (SELECT source, doc_id, bin_start, iv,
                 CAST(count(*) AS BIGINT) AS true_cnt
          FROM pb GROUP BY 1, 2, 3, 4),
top AS (SELECT * FROM (
          SELECT *, row_number() OVER (
                   PARTITION BY source, doc_id, bin_start
                   ORDER BY true_cnt DESC, iv ASC) AS rk
          FROM exact)
        WHERE rk <= {_CM_TOPK}),
est AS (SELECT t.source, t.doc_id, t.bin_start, t.iv, t.true_cnt, t.rk,
               CAST(min(coalesce(c.cnt, 0)) AS BIGINT) AS cm_est
        FROM top t
        CROSS JOIN h
        LEFT JOIN cells c
          ON c.source = t.source AND c.doc_id = t.doc_id
         AND c.bin_start = t.bin_start AND c.hrow = h.hrow
         AND c.col = ((h.a * (t.iv % {analyses.CM_PRIME}) + h.b)
                      % {analyses.CM_PRIME}) % {_CM_W}
        GROUP BY 1, 2, 3, 4, 5, 6)
SELECT source, doc_id, bin_start, CAST(iv AS INT) AS value,
       CAST(rk AS INT) AS rk, true_cnt, cm_est,
       cm_est >= true_cnt AS ge_ok,
       TRUE AS compose_exact_ok
FROM est
"""


_KAL_Q, _KAL_R = 0.2, 4.0


def q_kalman_local_level(spark, sf_dir):
    """Kalman local-level filter per series (Kalman 1960): final
    (level, error variance), steady gain, one-step innovation RMSE
    from one exact struct-accumulator fold.  The DuckDB twin replays
    the identical recurrence with a recursive CTE (the holt_smooth
    precedent) — bit-identical doubles, round-6 hashes match."""
    out = forecast.kalman_local_level(
        series(spark, sf_dir), q=_KAL_Q, r=_KAL_R,
        key_cols=["source", "doc_id"],
    )
    return out.select(
        "source", "doc_id", "n",
        _r(F.col("level")).alias("level"),
        _r(F.col("p_var")).alias("p_var"),
        _r(F.col("gain")).alias("gain"),
        _r(F.col("rmse")).alias("rmse"),
    )


SQL_KALMAN_LOCAL_LEVEL = f"""
WITH RECURSIVE series AS ({SERIES_SQL}),
pts AS (SELECT source, doc_id, pos, value FROM series
        WHERE value IS NOT NULL),
v AS (SELECT source, doc_id, array_agg(value ORDER BY pos) AS vals,
             CAST(count(*) AS BIGINT) AS n
      FROM pts GROUP BY 1, 2),
fold AS (
  SELECT source, doc_id, n, vals, 1 AS i,
         vals[1] AS m, {_KAL_R!r}::DOUBLE AS p, 0.0::DOUBLE AS sse
  FROM v WHERE n >= 1
  UNION ALL
  SELECT source, doc_id, n, vals, i + 1,
         m + ((p + {_KAL_Q!r}) / ((p + {_KAL_Q!r}) + {_KAL_R!r}))
           * (vals[i + 1] - m),
         (1.0 - ((p + {_KAL_Q!r}) / ((p + {_KAL_Q!r}) + {_KAL_R!r})))
           * (p + {_KAL_Q!r}),
         sse + (vals[i + 1] - m) * (vals[i + 1] - m)
  FROM fold WHERE i < n
),
st AS (SELECT source, doc_id, n, m, p, sse FROM fold WHERE i = n)
SELECT source, doc_id, n,
       round(m, 6) AS level,
       round(p, 6) AS p_var,
       round((p + {_KAL_Q!r}) / ((p + {_KAL_Q!r}) + {_KAL_R!r}), 6) AS gain,
       CASE WHEN n >= 2 THEN round(sqrt(sse / (n - 1)), 6) END AS rmse
FROM st
"""


_DFT_K = 24
_TWO_PI_LIT = 2.0 * math.pi


def q_dft_power_peak(spark, sf_dir):
    """Periodogram over the first 24 Fourier frequencies per series
    (Schuster 1898, direct-DFT form) and the dominant one.  Power is
    emitted as ln(P) (relative error of the cos/sin sums is ~1e-13, so
    the log is rounding-stable where the raw O(1e6) power would not
    be); the argmax compares ROUND-6 powers with smallest-k tie-break,
    identical comparator in the SQL twin."""
    out = spectral.dft_power_peak(
        series(spark, sf_dir), max_k=_DFT_K, key_cols=["source", "doc_id"]
    )
    return out.select(
        "source", "doc_id", "n", "k_peak",
        _r(F.col("period")).alias("period"),
        _r(F.when(F.col("power") > 0, F.log(F.col("power")))).alias(
            "power_ln"
        ),
        _r(F.col("power_frac")).alias("power_frac"),
    )


SQL_DFT_POWER_PEAK = f"""
WITH series AS ({SERIES_SQL}),
pts AS (SELECT source, doc_id, pos, value FROM series
        WHERE value IS NOT NULL),
idx AS (SELECT source, doc_id,
               CAST(row_number() OVER (PARTITION BY source, doc_id
                                       ORDER BY pos) AS BIGINT) - 1 AS i,
               value
        FROM pts),
nn AS (SELECT source, doc_id, CAST(count(*) AS BIGINT) AS n,
              avg(value) AS mu
       FROM idx GROUP BY 1, 2),
ks AS (SELECT source, doc_id, n, mu,
              unnest(range(1, least({_DFT_K}, n // 2) + 1)) AS k
       FROM nn WHERE n >= 4),
sums AS (
  SELECT ks.source, ks.doc_id, ks.n, ks.k,
         sum((idx.value - ks.mu)
             * cos((({_TWO_PI_LIT!r} * CAST(ks.k AS DOUBLE)) / ks.n)
                   * CAST(idx.i AS DOUBLE))) AS cs,
         sum((idx.value - ks.mu)
             * sin((({_TWO_PI_LIT!r} * CAST(ks.k AS DOUBLE)) / ks.n)
                   * CAST(idx.i AS DOUBLE))) AS sn
  FROM ks JOIN idx USING (source, doc_id)
  GROUP BY 1, 2, 3, 4),
pk AS (SELECT source, doc_id, n, k, cs * cs + sn * sn AS p FROM sums),
best AS (
  SELECT source, doc_id, k, p,
         row_number() OVER (PARTITION BY source, doc_id
                            ORDER BY round(p, 6) DESC, k ASC) AS rn,
         sum(p) OVER (PARTITION BY source, doc_id) AS total
  FROM pk)
SELECT nn.source, nn.doc_id, nn.n,
       b.k AS k_peak,
       round(CAST(nn.n AS DOUBLE) / CAST(b.k AS DOUBLE), 6) AS period,
       round(CASE WHEN b.p > 0 THEN ln(b.p) END, 6) AS power_ln,
       round(CASE WHEN b.total > 0 THEN b.p / b.total END, 6)
         AS power_frac
FROM nn LEFT JOIN (SELECT * FROM best WHERE rn = 1) b
  USING (source, doc_id)
"""


def q_pacf_yule_walker(spark, sf_dir):
    """Partial autocorrelations at lags 1..3 per series via the
    closed-form Durbin-Levinson recursion on Yule-Walker
    autocorrelations (Durbin 1960) — pure guarded sums over three
    window lags, identical formulas in the SQL twin."""
    out = spectral.pacf_yule_walker(
        series(spark, sf_dir), key_cols=["source", "doc_id"]
    )
    return out.select(
        "source", "doc_id", "n",
        _r(F.col("r1")).alias("r1"),
        _r(F.col("r2")).alias("r2"),
        _r(F.col("r3")).alias("r3"),
        _r(F.col("pacf1")).alias("pacf1"),
        _r(F.col("pacf2")).alias("pacf2"),
        _r(F.col("pacf3")).alias("pacf3"),
    )


SQL_PACF_YULE_WALKER = f"""
WITH series AS ({SERIES_SQL}),
pts AS (SELECT source, doc_id, pos, value FROM series
        WHERE value IS NOT NULL),
lg AS (SELECT source, doc_id, value AS v,
              lag(value, 1) OVER w AS l1,
              lag(value, 2) OVER w AS l2,
              lag(value, 3) OVER w AS l3
       FROM pts
       WINDOW w AS (PARTITION BY source, doc_id ORDER BY pos)),
ag AS (SELECT source, doc_id,
              CAST(count(v) AS BIGINT) AS n,
              sum(v) AS s, sum(v * v) AS ss,
              sum(v * l1) AS c1,
              sum(CASE WHEN l1 IS NOT NULL THEN v END) AS sa1,
              sum(l1) AS sb1,
              sum(v * l2) AS c2,
              sum(CASE WHEN l2 IS NOT NULL THEN v END) AS sa2,
              sum(l2) AS sb2,
              sum(v * l3) AS c3,
              sum(CASE WHEN l3 IS NOT NULL THEN v END) AS sa3,
              sum(l3) AS sb3
       FROM lg GROUP BY 1, 2),
r AS (SELECT *,
             s / n AS m,
             ss - n * (s / n) * (s / n) AS den0
      FROM ag),
rr AS (SELECT source, doc_id, n,
              CASE WHEN n >= 2 AND den0 > 1e-12 THEN
                (c1 - (s / n) * (sa1 + sb1) + (n - 1.0) * (s / n) * (s / n))
                  / den0 END AS r1,
              CASE WHEN n >= 3 AND den0 > 1e-12 THEN
                (c2 - (s / n) * (sa2 + sb2) + (n - 2.0) * (s / n) * (s / n))
                  / den0 END AS r2,
              CASE WHEN n >= 4 AND den0 > 1e-12 THEN
                (c3 - (s / n) * (sa3 + sb3) + (n - 3.0) * (s / n) * (s / n))
                  / den0 END AS r3
       FROM r),
p2 AS (SELECT *,
              CASE WHEN abs(1.0 - r1 * r1) > 1e-12
                   THEN (r2 - r1 * r1) / (1.0 - r1 * r1) END AS pacf2
       FROM rr)
SELECT source, doc_id, n,
       round(r1, 6) AS r1, round(r2, 6) AS r2, round(r3, 6) AS r3,
       round(r1, 6) AS pacf1,
       round(pacf2, 6) AS pacf2,
       round(CASE WHEN abs(1.0 - (r1 * (1.0 - pacf2)) * r1
                           - pacf2 * r2) > 1e-12 THEN
               (r3 - (r1 * (1.0 - pacf2)) * r2 - pacf2 * r1)
                 / (1.0 - (r1 * (1.0 - pacf2)) * r1 - pacf2 * r2) END, 6)
         AS pacf3
FROM p2
"""


_SEAS_P = 7


def q_seasonal_decompose(spark, sf_dir):
    """Classical additive seasonal decomposition at period 7 (FPP3
    §3.4): full-window-gated centered-MA trend, re-centered per-phase
    seasonal profile, Hyndman seasonal-strength per series.  Windows,
    groupBys and joins only — the SQL twin states the identical
    plan."""
    out = forecast.seasonal_decompose(
        series(spark, sf_dir), period=_SEAS_P, key_cols=["source", "doc_id"]
    )
    return out.select(
        "source", "doc_id", "phase", "n_phase",
        _r(F.col("seasonal")).alias("seasonal"),
        _r(F.col("strength")).alias("strength"),
    )


SQL_SEASONAL_DECOMPOSE = f"""
WITH series AS ({SERIES_SQL}),
t AS (SELECT source, doc_id, pos, value,
             CASE WHEN count(value) OVER w = {_SEAS_P}
                  THEN avg(value) OVER w END AS trend
      FROM series
      WINDOW w AS (PARTITION BY source, doc_id ORDER BY pos
                   RANGE BETWEEN {(_SEAS_P - 1) // 2} PRECEDING
                             AND {(_SEAS_P - 1) // 2} FOLLOWING)),
det AS (SELECT source, doc_id, pos % {_SEAS_P} AS phase,
               value - trend AS d
        FROM t WHERE value IS NOT NULL AND trend IS NOT NULL),
ph AS (SELECT source, doc_id, phase,
              CAST(count(*) AS BIGINT) AS n_phase, avg(d) AS raw
       FROM det GROUP BY 1, 2, 3),
bar AS (SELECT source, doc_id, avg(raw) AS bar FROM ph GROUP BY 1, 2),
ses AS (SELECT ph.source, ph.doc_id, ph.phase, ph.n_phase,
               ph.raw - bar.bar AS seasonal
        FROM ph JOIN bar USING (source, doc_id)),
res AS (SELECT det.source, det.doc_id, det.d,
               det.d - ses.seasonal AS rr
        FROM det JOIN ses USING (source, doc_id, phase)),
st AS (SELECT source, doc_id,
              CASE WHEN var_samp(d) > 0
                   THEN greatest(0.0, 1.0 - var_samp(rr) / var_samp(d))
              END AS strength
       FROM res GROUP BY 1, 2)
SELECT s.source, s.doc_id, CAST(s.phase AS BIGINT) AS phase, s.n_phase,
       round(s.seasonal, 6) AS seasonal,
       round(st.strength, 6) AS strength
FROM ses s JOIN st USING (source, doc_id)
"""


_SNB_P = 48


def q_seasonal_naive_backtest(spark, sf_dir):
    """Seasonal-naive forecaster backtest vs the naive-1 carry-forward
    benchmark (FPP3 §5.2) at period 48: the exactly-k-positions-back
    lookup is a pos-RANGE window frame [t-k, t-k] — no self-join."""
    out = forecast.seasonal_naive_backtest(
        series(spark, sf_dir), period=_SNB_P, key_cols=["source", "doc_id"]
    )
    return out.select(
        "source", "doc_id", "n_seasonal",
        _r(F.col("mae")).alias("mae"),
        _r(F.col("rmse")).alias("rmse"),
        _r(F.col("bias")).alias("bias"),
        "n_naive",
        _r(F.col("mae_naive")).alias("mae_naive"),
        _r(F.col("skill")).alias("skill"),
    )


SQL_SEASONAL_NAIVE = f"""
WITH series AS ({SERIES_SQL}),
pts AS (SELECT source, doc_id, pos, value FROM series
        WHERE value IS NOT NULL),
s AS (SELECT source, doc_id, value,
             max(value) OVER (PARTITION BY source, doc_id ORDER BY pos
                              RANGE BETWEEN {_SNB_P} PRECEDING
                                        AND {_SNB_P} PRECEDING) AS ps,
             max(value) OVER (PARTITION BY source, doc_id ORDER BY pos
                              RANGE BETWEEN 1 PRECEDING
                                        AND 1 PRECEDING) AS p1
      FROM pts)
SELECT source, doc_id,
       CAST(count(value - ps) AS BIGINT) AS n_seasonal,
       round(avg(abs(value - ps)), 6) AS mae,
       round(sqrt(avg((value - ps) * (value - ps))), 6) AS rmse,
       round(avg(value - ps), 6) AS bias,
       CAST(count(value - p1) AS BIGINT) AS n_naive,
       round(avg(abs(value - p1)), 6) AS mae_naive,
       round(CASE WHEN count(value - ps) >= 1 AND count(value - p1) >= 1
                   AND avg(abs(value - p1)) > 0
             THEN 1.0 - avg(abs(value - ps)) / avg(abs(value - p1))
             END, 6) AS skill
FROM s GROUP BY 1, 2
"""


def q_bigram_logprob(spark, sf_dir):
    """Mean conditional bigram log-probability per doc under the
    corpus's own add-1-smoothed bigram counts — the order-sensitive
    LM-fluency proxy one step above unigram_logprob."""
    docs = _load(spark, sf_dir, "documents")
    out = textstats.bigram_logprob_score(docs)
    return out.select(
        "doc_id", "n_bigrams",
        _r(F.col("bigram_logprob")).alias("bigram_logprob"),
    )


SQL_BIGRAM_LOGPROB = r"""
WITH w AS (
  SELECT doc_id,
         regexp_split_to_array(lower(trim(text)), '\s+') AS ws
  FROM documents),
prs AS (
  SELECT doc_id, s.a AS a, s.b AS b
  FROM (SELECT doc_id,
               unnest(list_transform(range(1, len(ws)),
                      i -> struct_pack(a := ws[i], b := ws[i + 1]))) AS s
        FROM w)),
pc AS (SELECT a, b, count(*) AS cab FROM prs GROUP BY 1, 2),
cc AS (SELECT a, sum(cab) AS ca FROM pc GROUP BY 1),
vv AS (SELECT count(DISTINCT w2) AS v
       FROM (SELECT unnest(ws) AS w2 FROM w)),
sc AS (SELECT p.doc_id,
              CAST(count(*) AS BIGINT) AS n_bigrams,
              avg(ln((pc.cab + 1.0) / (cc.ca + 1.0 * vv.v))) AS lp
       FROM prs p JOIN pc USING (a, b) JOIN cc USING (a) CROSS JOIN vv
       GROUP BY 1)
SELECT d.doc_id,
       coalesce(sc.n_bigrams, 0) AS n_bigrams,
       round(sc.lp, 6) AS bigram_logprob
FROM documents d LEFT JOIN sc USING (doc_id)
"""


def q_tfidf_top_terms(spark, sf_dir):
    """Top-10 terms per source by tf-idf (Spärck Jones 1972) with a
    deterministic (round-6 score DESC, term ASC) rank — the
    what-characterizes-this-source summary a curation pipeline reads
    before weighting sources."""
    docs = _load(spark, sf_dir, "documents")
    out = textstats.tfidf_top_terms(docs, top_k=10)
    return out.select(
        "source", "rank", "term", "tf", "df",
        _r(F.col("score")).alias("score"),
    )


SQL_TFIDF_TOP_TERMS = r"""
WITH tok AS (
  SELECT doc_id, source,
         unnest(regexp_split_to_array(lower(trim(text)), '\s+')) AS term
  FROM documents),
tf AS (SELECT source, term, CAST(count(*) AS BIGINT) AS tf
       FROM tok GROUP BY 1, 2),
dfq AS (SELECT term, CAST(count(DISTINCT doc_id) AS BIGINT) AS df
        FROM tok GROUP BY 1),
nd AS (SELECT count(DISTINCT doc_id) AS nd FROM documents),
sc AS (SELECT tf.source, tf.term, tf.tf, dfq.df,
              CAST(tf.tf AS DOUBLE)
                * ln(CAST(nd.nd AS DOUBLE) / CAST(dfq.df AS DOUBLE))
                AS score
       FROM tf JOIN dfq USING (term) CROSS JOIN nd),
rk AS (SELECT *,
              row_number() OVER (PARTITION BY source
                                 ORDER BY round(score, 6) DESC,
                                          term ASC) AS rank
       FROM sc)
SELECT source, CAST(rank AS BIGINT) AS rank, term, tf, df,
       round(score, 6) AS score
FROM rk WHERE rank <= 10
"""


_HURST_SIZES = (8, 16, 32, 64)


def q_hurst_rs(spark, sf_dir):
    """Hurst exponent per series via rescaled-range analysis (Hurst
    1951): per-size mean R/S over complete blocks plus the OLS
    log-log slope H, identical window/groupBy plan in the SQL twin."""
    out = spectral.hurst_rs(
        series(spark, sf_dir), sizes=_HURST_SIZES,
        key_cols=["source", "doc_id"],
    )
    return out.select(
        "source", "doc_id", "s", "n_blocks",
        _r(F.col("avg_rs")).alias("avg_rs"),
        _r(F.col("h")).alias("h"),
    )


def _hurst_size_sql(s: int) -> str:
    return f"""
  SELECT source, doc_id, CAST({s} AS BIGINT) AS s,
         CAST(count(rs) AS BIGINT) AS n_blocks, avg(rs) AS avg_rs
  FROM (
    SELECT source, doc_id, b,
           CASE WHEN cnt = {s}
                 AND sqrt(greatest(sxx / {s}.0
                                   - (sx / {s}.0) * (sx / {s}.0),
                                   0.0)) > 0
                THEN (zmax - zmin)
                     / sqrt(greatest(sxx / {s}.0
                                     - (sx / {s}.0) * (sx / {s}.0),
                                     0.0)) END AS rs
    FROM (
      SELECT source, doc_id, b, count(*) AS cnt,
             max(cs - k * (tot / {s}.0)) AS zmax,
             min(cs - k * (tot / {s}.0)) AS zmin,
             sum(x) AS sx, sum(x * x) AS sxx
      FROM (
        SELECT source, doc_id, rn // {s} AS b, x,
               CAST(rn % {s} + 1 AS DOUBLE) AS k,
               sum(x) OVER (PARTITION BY source, doc_id, rn // {s}
                            ORDER BY rn ROWS UNBOUNDED PRECEDING) AS cs,
               sum(x) OVER (PARTITION BY source, doc_id,
                            rn // {s}) AS tot
        FROM idx)
      GROUP BY 1, 2, 3))
  GROUP BY 1, 2"""


SQL_HURST_RS = f"""
WITH series AS ({SERIES_SQL}),
pts AS (SELECT source, doc_id, pos, value FROM series
        WHERE value IS NOT NULL),
idx AS (SELECT source, doc_id,
               CAST(row_number() OVER (PARTITION BY source, doc_id
                                       ORDER BY pos) AS BIGINT) - 1 AS rn,
               value AS x
        FROM pts),
tall AS ({" UNION ALL ".join(_hurst_size_sql(s) for s in _HURST_SIZES)}),
ols AS (
  SELECT source, doc_id,
         count(CASE WHEN avg_rs > 0 THEN 1 END) AS p,
         sum(CASE WHEN avg_rs > 0
                  THEN ln(CAST(s AS DOUBLE)) END) AS sx,
         sum(CASE WHEN avg_rs > 0 THEN ln(avg_rs) END) AS sy,
         sum(CASE WHEN avg_rs > 0
                  THEN ln(CAST(s AS DOUBLE)) * ln(avg_rs) END) AS sxy,
         sum(CASE WHEN avg_rs > 0
                  THEN ln(CAST(s AS DOUBLE)) * ln(CAST(s AS DOUBLE)) END)
           AS sxx
  FROM tall GROUP BY 1, 2)
SELECT t.source, t.doc_id, t.s, t.n_blocks,
       round(t.avg_rs, 6) AS avg_rs,
       round(CASE WHEN o.p >= 2
                   AND abs(o.p * o.sxx - o.sx * o.sx) > 1e-12
             THEN (o.p * o.sxy - o.sx * o.sy)
                  / (o.p * o.sxx - o.sx * o.sx) END, 6) AS h
FROM tall t JOIN ols o USING (source, doc_id)
"""


_DTW_SEG, _DTW_R = 24, 4


def q_dtw_exemplar(spark, sf_dir):
    """Banded DTW distance of every series to its source's exemplar
    (doc '0') on z-PAA sketches (Sakoe & Chiba 1978 band).  The DP is
    an exact nested array fold in Spark (row-major order) and a
    recursive-CTE diagonal sweep in DuckDB — DP values are
    order-independent, so both engines produce identical doubles."""
    out = spectral.dtw_to_exemplar(
        series(spark, sf_dir), exemplar_doc="0",
        segments=_DTW_SEG, radius=_DTW_R, key_cols=["source", "doc_id"],
    )
    return out.select(
        "source", "doc_id", "n_seg",
        _r(F.col("dtw")).alias("dtw"),
    )


SQL_DTW_EXEMPLAR = f"""
WITH RECURSIVE series AS ({SERIES_SQL}),
pts AS (SELECT source, doc_id, pos, value FROM series
        WHERE value IS NOT NULL),
ix AS (SELECT source, doc_id, value,
              row_number() OVER (PARTITION BY source, doc_id
                                 ORDER BY pos) - 1 AS ci
       FROM pts),
st AS (SELECT source, doc_id, avg(value) AS mu,
              stddev_pop(value) AS sd, count(*) AS n
       FROM ix GROUP BY 1, 2),
zp AS (SELECT ix.source, ix.doc_id,
              CAST(floor(ix.ci * {_DTW_SEG} / st.n) AS BIGINT) AS seg,
              CASE WHEN st.sd IS NULL OR st.sd = 0 THEN 0.0
                   ELSE (ix.value - st.mu) / st.sd END AS z
       FROM ix JOIN st USING (source, doc_id)),
pa AS (SELECT source, doc_id, seg, avg(z) AS paa
       FROM zp GROUP BY 1, 2, 3),
arr AS (SELECT source, doc_id, array_agg(paa ORDER BY seg) AS va,
               CAST(count(*) AS BIGINT) AS n_seg
        FROM pa GROUP BY 1, 2),
ex AS (SELECT source, va AS ya, n_seg AS yn FROM arr
       WHERE doc_id = '0'),
pairs AS (SELECT a.source, a.doc_id, a.va, ex.ya
          FROM arr a JOIN ex USING (source)
          WHERE a.n_seg = {_DTW_SEG} AND ex.yn = {_DTW_SEG}),
cells AS (
  SELECT source, doc_id, 2 AS d, 1 AS i, 1 AS j,
         abs(va[1] - ya[1]) AS cost
  FROM pairs
  UNION ALL
  SELECT source, doc_id, d, i, j, cost FROM (
    -- cells of diagonal d+1: grid-DP as a shortest path swept in
    -- anti-diagonal order; the working set holds diag d (step
    -- contributions right/down) and the carried diag d-1 (diagonal
    -- step), both tagged d, so td = c.d + 1 selects exactly the
    -- legal predecessors of the next diagonal
    SELECT c.source, c.doc_id, c.d + 1 AS d, t.ni AS i, t.nj AS j,
           abs(p.va[t.ni] - p.ya[t.nj]) + min(c.cost) AS cost
    FROM cells c
    JOIN pairs p USING (source, doc_id),
    LATERAL (VALUES (c.i + 1, c.j,     c.i + c.j + 1),
                    (c.i,     c.j + 1, c.i + c.j + 1),
                    (c.i + 1, c.j + 1, c.i + c.j + 2)) t(ni, nj, td)
    WHERE t.td = c.d + 1
      AND t.ni <= {_DTW_SEG} AND t.nj <= {_DTW_SEG}
      AND abs(t.ni - t.nj) <= {_DTW_R}
    GROUP BY c.source, c.doc_id, c.d, t.ni, t.nj, p.va, p.ya
    UNION ALL
    -- carry the just-built diagonal once, as prev for d+2
    SELECT source, doc_id, d + 1, i, j, cost FROM cells
    WHERE i + j = d AND d + 1 < {2 * _DTW_SEG}
  )
)
SELECT a.source, a.doc_id, a.n_seg, round(f.cost, 6) AS dtw
FROM arr a LEFT JOIN
  (SELECT source, doc_id, min(cost) AS cost FROM cells
   WHERE i = {_DTW_SEG} AND j = {_DTW_SEG} GROUP BY 1, 2) f
  USING (source, doc_id)
"""


_SDM_SEG, _SDM_ALPHA, _SDM_R, _SDM_MB = 4, 4, 2, 6

_SDM_BPS = __import__(
    "diive_spark.operators.analyses", fromlist=["SAX_BREAKPOINTS"]
).SAX_BREAKPOINTS[_SDM_ALPHA]

_SDM_SYM = " + ".join(
    f"CASE WHEN paa > {bp!r} THEN 1 ELSE 0 END" for bp in _SDM_BPS
)


def q_sax_dtw_motifs(spark, sf_dir):
    """Cross-series motif verification: SAX-word bucket first, exact
    banded DTW only within buckets (Lin et al. DMKD 2003 §5 + Sakoe &
    Chiba 1978).  A coarse 4-letter word over a 4-symbol alphabet
    gives the sf0.01 corpus a rich bucket structure (35 full pairs +
    one hot bucket that trips the max_bucket=6 star-link guard, so the
    driver hashes BOTH pair regimes).  Spark side: single-exchange SAX
    pipeline, one equi-shuffle on the word, row-local JVM DTW fold.
    DuckDB twin: identical SAX arithmetic, identical pair formation,
    and the recursive-CTE diagonal DTW sweep — DP values are
    order-independent, so both engines produce identical doubles."""
    out = spectral.sax_dtw_motifs(
        series(spark, sf_dir),
        segments=_SDM_SEG, alphabet=_SDM_ALPHA, radius=_SDM_R,
        max_bucket=_SDM_MB, key_cols=["source", "doc_id"],
    )
    return out.select(
        "word", "n_series", "sid_a", "sid_b", "pair_kind",
        _r(F.col("dtw")).alias("dtw"),
    )


SQL_SAX_DTW_MOTIFS = f"""
WITH RECURSIVE series AS ({SERIES_SQL}),
pts AS (SELECT source, doc_id, pos, value FROM series
        WHERE value IS NOT NULL),
ix AS (SELECT source, doc_id, value,
              row_number() OVER (PARTITION BY source, doc_id
                                 ORDER BY pos) - 1 AS ci
       FROM pts),
st AS (SELECT source, doc_id, avg(value) AS mu,
              stddev_pop(value) AS sd, count(*) AS n
       FROM ix GROUP BY 1, 2),
zp AS (SELECT ix.source, ix.doc_id,
              CAST(floor(ix.ci * {_SDM_SEG} / st.n) AS BIGINT) AS seg,
              CASE WHEN st.sd IS NULL OR st.sd = 0 THEN 0.0
                   ELSE (ix.value - st.mu) / st.sd END AS z
       FROM ix JOIN st USING (source, doc_id)),
pa AS (SELECT source, doc_id, seg, avg(z) AS paa
       FROM zp GROUP BY 1, 2, 3),
sym AS (SELECT source, doc_id, seg, paa,
               chr(97 + ({_SDM_SYM})) AS letter
        FROM pa),
mem AS (SELECT source || '|' || doc_id AS sid,
               string_agg(letter, '' ORDER BY seg) AS word,
               array_agg(paa ORDER BY seg) AS va
        FROM sym GROUP BY source, doc_id
        HAVING count(*) = {_SDM_SEG}),
bk AS (SELECT word, CAST(count(*) AS BIGINT) AS n_series,
              min(sid) AS anchor
       FROM mem GROUP BY word HAVING count(*) >= 2),
tg AS (SELECT m.sid, m.word, m.va, b.n_series, b.anchor
       FROM mem m JOIN bk b USING (word)),
pairs AS (
  SELECT a.word, a.n_series, a.sid AS sid_a, b.sid AS sid_b,
         'full' AS pair_kind, a.va AS xa, b.va AS yb
  FROM tg a JOIN tg b USING (word)
  WHERE a.n_series <= {_SDM_MB} AND a.sid < b.sid
  UNION ALL
  SELECT m.word, m.n_series, m.anchor AS sid_a, m.sid AS sid_b,
         'star' AS pair_kind, an.va AS xa, m.va AS yb
  FROM tg m JOIN tg an ON an.word = m.word AND an.sid = m.anchor
  WHERE m.n_series > {_SDM_MB} AND m.sid <> m.anchor),
cells AS (
  SELECT sid_a, sid_b, 2 AS d, 1 AS i, 1 AS j,
         abs(xa[1] - yb[1]) AS cost
  FROM pairs
  UNION ALL
  SELECT sid_a, sid_b, d, i, j, cost FROM (
    -- anti-diagonal sweep: working set holds diag d plus the carried
    -- diag d-1, so td = c.d + 1 selects the legal predecessors
    SELECT c.sid_a, c.sid_b, c.d + 1 AS d, t.ni AS i, t.nj AS j,
           abs(p.xa[t.ni] - p.yb[t.nj]) + min(c.cost) AS cost
    FROM cells c
    JOIN pairs p USING (sid_a, sid_b),
    LATERAL (VALUES (c.i + 1, c.j,     c.i + c.j + 1),
                    (c.i,     c.j + 1, c.i + c.j + 1),
                    (c.i + 1, c.j + 1, c.i + c.j + 2)) t(ni, nj, td)
    WHERE t.td = c.d + 1
      AND t.ni <= {_SDM_SEG} AND t.nj <= {_SDM_SEG}
      AND abs(t.ni - t.nj) <= {_SDM_R}
    GROUP BY c.sid_a, c.sid_b, c.d, t.ni, t.nj, p.xa, p.yb
    UNION ALL
    SELECT sid_a, sid_b, d + 1, i, j, cost FROM cells
    WHERE i + j = d AND d + 1 < {2 * _SDM_SEG}
  )
)
SELECT p.word, p.n_series, p.sid_a, p.sid_b, p.pair_kind,
       round(f.cost, 6) AS dtw
FROM pairs p JOIN
  (SELECT sid_a, sid_b, min(cost) AS cost FROM cells
   WHERE i = {_SDM_SEG} AND j = {_SDM_SEG} GROUP BY 1, 2) f
  USING (sid_a, sid_b)
"""


_VR_Q = 4


def q_variance_ratio(spark, sf_dir):
    """Lo-MacKinlay variance-ratio random-walk test per series at
    q=4 (homoscedastic, overlapping differences): VR plus its
    z-statistic from guarded window-lag sums — the hypothesis-test
    companion to hurst_rs.  Constants injected via repr so both
    engines use identical binary64 literals."""
    out = spectral.variance_ratio(
        series(spark, sf_dir), q=_VR_Q, key_cols=["source", "doc_id"]
    )
    return out.select(
        "source", "doc_id", "n",
        _r(F.col("mu")).alias("mu"),
        _r(F.col("vr")).alias("vr"),
        _r(F.col("z")).alias("z"),
    )


SQL_VARIANCE_RATIO = f"""
WITH series AS ({SERIES_SQL}),
pts AS (SELECT source, doc_id, pos, value FROM series
        WHERE value IS NOT NULL),
lg AS (SELECT source, doc_id, value AS v,
              lag(value, 1) OVER w AS l1,
              lag(value, {_VR_Q}) OVER w AS lq,
              row_number() OVER w AS rn
       FROM pts
       WINDOW w AS (PARTITION BY source, doc_id ORDER BY pos)),
ag AS (SELECT source, doc_id,
              CAST(count(v) AS BIGINT) AS n,
              min_by(v, rn) AS x1, max_by(v, rn) AS xn,
              sum((v - l1) * (v - l1)) AS s1sq, sum(v - l1) AS s1,
              sum((v - lq) * (v - lq)) AS sqsq, sum(v - lq) AS sq,
              CAST(count(l1) AS BIGINT) AS n1,
              CAST(count(lq) AS BIGINT) AS nq
       FROM lg GROUP BY 1, 2),
m AS (SELECT *,
             CASE WHEN n >= 2 THEN (xn - x1) / (n - 1.0) END AS mu
      FROM ag),
v2 AS (SELECT *,
              (s1sq - 2.0 * mu * s1 + n1 * mu * mu) / (n - 1.0) AS sig1,
              (sqsq - 2.0 * ({_VR_Q}.0 * mu) * sq
                    + nq * ({_VR_Q}.0 * mu) * ({_VR_Q}.0 * mu))
                / ({_VR_Q}.0 * nq) AS sigq
       FROM m),
v3 AS (SELECT *,
              CASE WHEN n >= {_VR_Q + 1} AND sig1 > 1e-12
                   THEN sigq / sig1 END AS vr
       FROM v2)
SELECT source, doc_id, n,
       round(mu, 6) AS mu,
       round(vr, 6) AS vr,
       round((vr - 1.0) * sqrt(({3.0 * _VR_Q!r} * nq)
                               / {2.0 * (2.0 * _VR_Q - 1.0) * (_VR_Q - 1.0)!r}),
             6) AS z
FROM v3
"""


def q_source_kl(spark, sf_dir):
    """KL divergence of each source's unigram distribution from the
    corpus distribution (Kullback & Leibler 1951) — the corpus-drift
    signal, with token/vocab counts and top-term mass."""
    docs = _load(spark, sf_dir, "documents")
    out = textstats.source_kl_divergence(docs)
    return out.select(
        "source", "n_tokens", "n_vocab",
        _r(F.col("kl")).alias("kl"),
        _r(F.col("top_term_mass")).alias("top_term_mass"),
    )


SQL_SOURCE_KL = r"""
WITH tok AS (
  SELECT source,
         unnest(regexp_split_to_array(lower(trim(text)), '\s+')) AS w
  FROM documents),
tf AS (SELECT source, w, count(*) AS c FROM tok GROUP BY 1, 2),
ts AS (SELECT source, sum(c) AS tot_s FROM tf GROUP BY 1),
cq AS (SELECT w, count(*) AS cw FROM tok GROUP BY 1),
tq AS (SELECT count(*) AS tot_q FROM tok)
SELECT tf.source,
       CAST(max(ts.tot_s) AS BIGINT) AS n_tokens,
       CAST(count(*) AS BIGINT) AS n_vocab,
       round(sum((c / tot_s) * ln((c / tot_s) / (cw / tot_q))), 6) AS kl,
       round(max(c / tot_s), 6) AS top_term_mass
FROM tf JOIN ts USING (source) JOIN cq USING (w) CROSS JOIN tq
GROUP BY 1
"""


def q_zipf_slope(spark, sf_dir):
    """Zipf rank-frequency slope per source (Zipf 1949): OLS of
    ln(freq) on ln(rank) over the top-256 terms with a deterministic
    (count DESC, term ASC) rank — template-dominated and synthetic
    sources fall off the ~-1 natural-text line."""
    docs = _load(spark, sf_dir, "documents")
    out = textstats.zipf_slope(docs, max_rank=256)
    return out.select(
        "source", "n_terms",
        _r(F.col("slope")).alias("slope"),
        _r(F.col("intercept")).alias("intercept"),
    )


SQL_ZIPF_SLOPE = r"""
WITH tok AS (
  SELECT source,
         unnest(regexp_split_to_array(lower(trim(text)), '\s+')) AS w
  FROM documents),
tf AS (SELECT source, w, CAST(count(*) AS BIGINT) AS c
       FROM tok GROUP BY 1, 2),
rk AS (SELECT *,
              row_number() OVER (PARTITION BY source
                                 ORDER BY c DESC, w ASC) AS r
       FROM tf),
kept AS (SELECT * FROM rk WHERE r <= 256),
ag AS (SELECT source, CAST(count(*) AS BIGINT) AS n_terms,
              sum(ln(CAST(r AS DOUBLE))) AS sx,
              sum(ln(CAST(c AS DOUBLE))) AS sy,
              sum(ln(CAST(r AS DOUBLE)) * ln(CAST(c AS DOUBLE))) AS sxy,
              sum(ln(CAST(r AS DOUBLE)) * ln(CAST(r AS DOUBLE))) AS sxx
       FROM kept GROUP BY 1),
sl AS (SELECT *,
              CASE WHEN n_terms >= 3
                    AND abs(n_terms * sxx - sx * sx) > 1e-12
                   THEN (n_terms * sxy - sx * sy)
                        / (n_terms * sxx - sx * sx) END AS slope
       FROM ag)
SELECT source, n_terms,
       round(slope, 6) AS slope,
       round(CASE WHEN slope IS NOT NULL
             THEN (sy - slope * sx) / n_terms END, 6) AS intercept
FROM sl
"""


def q_ngram_novelty(spark, sf_dir):
    """Per-doc trigram novelty: fraction of the doc's distinct word
    trigrams first seen (min doc_id) in this doc — the redundancy
    curve between exact-dup and topic-level similarity."""
    docs = _load(spark, sf_dir, "documents")
    out = textstats.ngram_novelty(docs, n=3)
    return out.select(
        "doc_id", "n_ngrams",
        _r(F.col("novelty")).alias("novelty"),
    )


SQL_NGRAM_NOVELTY = r"""
WITH w AS (
  SELECT doc_id,
         regexp_split_to_array(lower(trim(text)), '\s+') AS ws
  FROM documents),
g AS (
  SELECT DISTINCT doc_id, gg
  FROM (SELECT doc_id,
               unnest(list_transform(range(1, len(ws) - 1),
                      i -> ws[i] || ' ' || ws[i + 1] || ' ' || ws[i + 2]))
                 AS gg
        FROM w WHERE len(ws) >= 3)),
f AS (SELECT gg, min(doc_id) AS first_doc FROM g GROUP BY 1),
sc AS (SELECT g.doc_id,
              CAST(count(*) AS BIGINT) AS n_ngrams,
              avg(CASE WHEN g.doc_id = f.first_doc
                       THEN 1.0 ELSE 0.0 END) AS novelty
       FROM g JOIN f USING (gg) GROUP BY 1)
SELECT d.doc_id,
       coalesce(sc.n_ngrams, 0) AS n_ngrams,
       round(sc.novelty, 6) AS novelty
FROM documents d LEFT JOIN sc USING (doc_id)
"""


def q_top_correlated_pairs(spark, sf_dir):
    """Most-correlated series pairs per source: exact Pearson r over
    pos-aligned readings for every within-source doc pair, top-5 by
    |r| with a deterministic (round-6 |r| DESC, pair ASC) rank — the
    cross-series companion of daily_correlation."""
    out = spectral.top_correlated_pairs(
        series(spark, sf_dir), top_k=5, min_overlap=30,
        key_cols=["source", "doc_id"],
    )
    return out.select(
        "source", "rank", "doc_a", "doc_b", "n_overlap",
        _r(F.col("r")).alias("r"),
    )


SQL_TOP_CORRELATED_PAIRS = f"""
WITH series AS ({SERIES_SQL}),
pts AS (SELECT source, doc_id, pos, value FROM series
        WHERE value IS NOT NULL),
pr AS (SELECT a.source, a.doc_id AS doc_a, b.doc_id AS doc_b,
              CAST(count(*) AS BIGINT) AS n_overlap,
              sum(a.value) AS sa, sum(b.value) AS sb,
              sum(a.value * b.value) AS sab,
              sum(a.value * a.value) AS saa,
              sum(b.value * b.value) AS sbb
       FROM pts a JOIN pts b
         ON a.source = b.source AND a.pos = b.pos
        AND a.doc_id < b.doc_id
       GROUP BY 1, 2, 3),
rr AS (SELECT *,
              CASE WHEN n_overlap >= 30
                    AND n_overlap * saa - sa * sa > 0
                    AND n_overlap * sbb - sb * sb > 0
                   THEN (n_overlap * sab - sa * sb)
                        / sqrt((n_overlap * saa - sa * sa)
                               * (n_overlap * sbb - sb * sb)) END AS r
       FROM pr),
rk AS (SELECT *,
              row_number() OVER (PARTITION BY source
                                 ORDER BY round(abs(r), 6) DESC,
                                          doc_a ASC, doc_b ASC) AS rank
       FROM rr WHERE r IS NOT NULL)
SELECT source, CAST(rank AS BIGINT) AS rank, doc_a, doc_b, n_overlap,
       round(r, 6) AS r
FROM rk WHERE rank <= 5
"""


def q_textrank_keywords(spark, sf_dir):
    """TextRank keyword scores (Mihalcea & Tarau 2004): PageRank over
    the word co-occurrence graph, 10 fixed iterations in INTEGER
    fixed-point arithmetic (floor div, rational damping 17/20) — the
    iterative-fixpoint showcase whose every iteration is
    bit-identical across engines; the oracle unrolls the 10
    iterations as chained CTEs."""
    out = textstats.textrank_keywords(
        _load(spark, sf_dir, "documents")
    )
    return out.select("word", "pr", "outdeg")


def _textrank_sql(iters=10, dn=17, dd=20, min_cooc=2, scale=10**9):
    steps = []
    for k in range(1, iters + 1):
        steps.append(f"""
pr{k} AS (
  SELECT d.wa,
         bs.base + ({dn} * coalesce(s.inc, 0)) // {dd} AS pr
  FROM deg d CROSS JOIN bs
  LEFT JOIN (
    SELECT e.wb AS wa, sum(p.pr // d2.outdeg) AS inc
    FROM pr{k - 1} p
    JOIN deg d2 ON d2.wa = p.wa
    JOIN edges e ON e.wa = p.wa
    GROUP BY 1) s ON s.wa = d.wa)""")
    return rf"""
WITH tok AS (
  SELECT doc_id,
         unnest(regexp_split_to_array(lower(trim(text)), '\s+')) AS w,
         generate_subscripts(
           regexp_split_to_array(lower(trim(text)), '\s+'), 1) AS i
  FROM documents),
nx AS (SELECT doc_id, w,
              lead(w) OVER (PARTITION BY doc_id ORDER BY i) AS nw
       FROM tok),
big AS (SELECT least(w, nw) AS wa, greatest(w, nw) AS wb,
               count(*) AS c
        FROM nx WHERE nw IS NOT NULL AND w <> nw
        GROUP BY 1, 2),
e0 AS (SELECT wa, wb FROM big WHERE c >= {min_cooc}),
edges AS (SELECT wa, wb FROM e0
          UNION ALL SELECT wb AS wa, wa AS wb FROM e0),
deg AS (SELECT wa, CAST(count(*) AS BIGINT) AS outdeg
        FROM edges GROUP BY 1),
nn AS (SELECT count(*) AS n FROM deg),
bs AS (SELECT (CAST({scale} AS BIGINT)
               - CAST({scale} AS BIGINT) * {dn} // {dd}) // n AS base, n
       FROM nn),
pr0 AS (SELECT wa, CAST(CAST({scale} AS BIGINT) // bs.n AS BIGINT) AS pr
        FROM deg CROSS JOIN bs),{",".join(steps)}
SELECT pr{iters}.wa AS word, CAST(pr{iters}.pr AS BIGINT) AS pr,
       deg.outdeg
FROM pr{iters} JOIN deg ON deg.wa = pr{iters}.wa
"""


SQL_TEXTRANK = _textrank_sql()


_AFF_GAP = 21600.0


def q_session_affinity(spark, sf_dir):
    """Session-basket event-type affinity (market-basket lift / PMI,
    Church & Hanks 1990) over 6-h inactivity sessions: which
    behaviours travel together within a visit beyond base rates.
    Exact integer presence counts; only the final ln is floating."""
    from .operators.sessions import session_type_affinity

    out = session_type_affinity(
        _load(spark, sf_dir, "events"), gap_seconds=_AFF_GAP
    )
    return out.select(
        "type_a", "type_b", "n_a", "n_b", "n_ab", "n_sessions",
        _r(F.col("lift")).alias("lift"),
        _r(F.col("pmi")).alias("pmi"),
    )


SQL_SESSION_AFFINITY = f"""
WITH e AS (SELECT user_id, ts, epoch(ts) AS ep, event_type FROM events),
m AS (SELECT *,
             CASE WHEN lag(ep) OVER w IS NULL
                    OR ep - lag(ep) OVER w >= {_AFF_GAP!r}
                  THEN 1 ELSE 0 END AS b
      FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
s AS (SELECT user_id, event_type,
             sum(b) OVER (PARTITION BY user_id ORDER BY ts
                          ROWS UNBOUNDED PRECEDING) AS sid
      FROM m),
pres AS (SELECT DISTINCT user_id, sid, event_type FROM s),
tot AS (SELECT count(DISTINCT (user_id, sid)) AS S FROM s),
singles AS (SELECT event_type, CAST(count(*) AS BIGINT) AS c
            FROM pres GROUP BY 1),
pairs AS (SELECT a.event_type AS type_a, b.event_type AS type_b,
                 CAST(count(*) AS BIGINT) AS n_ab
          FROM pres a JOIN pres b
            ON a.user_id = b.user_id AND a.sid = b.sid
           AND a.event_type < b.event_type
          GROUP BY 1, 2)
SELECT p.type_a, p.type_b,
       sa.c AS n_a, sb.c AS n_b, p.n_ab,
       CAST(tot.S AS BIGINT) AS n_sessions,
       round(CAST(p.n_ab AS DOUBLE) * CAST(tot.S AS DOUBLE)
             / (CAST(sa.c AS DOUBLE) * CAST(sb.c AS DOUBLE)), 6)
         AS lift,
       round(ln(CAST(p.n_ab AS DOUBLE) * CAST(tot.S AS DOUBLE)
                / (CAST(sa.c AS DOUBLE) * CAST(sb.c AS DOUBLE))), 6)
         AS pmi
FROM pairs p
JOIN singles sa ON sa.event_type = p.type_a
JOIN singles sb ON sb.event_type = p.type_b
CROSS JOIN tot
"""


def q_scd2_history(spark, sf_dir):
    """SCD type-2 dimension history (Kimball ch.5): collapse each
    user's event_type observation stream into validity intervals —
    null-safe change detection, end-exclusive intervals, far-future
    sentinel on the open row.  Timestamps emitted as microsecond
    strings (the 9999 sentinel overflows ns epochs in Arrow/pandas)."""
    from .operators.sessions import scd2_history

    out = scd2_history(_load(spark, sf_dir, "events"), ["event_type"])
    fmt = "yyyy-MM-dd HH:mm:ss.SSSSSS"
    return out.select(
        "user_id", "event_type",
        F.date_format("valid_from", fmt).alias("valid_from"),
        F.date_format("valid_to", fmt).alias("valid_to"),
        "version", "is_current", "n_obs",
    )


SQL_SCD2_HISTORY = """
WITH m AS (
  SELECT user_id, ts, event_type,
         CASE WHEN row_number() OVER w = 1
                OR event_type IS DISTINCT FROM lag(event_type) OVER w
              THEN 1 ELSE 0 END AS brk
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_type)),
r AS (SELECT *,
             sum(brk) OVER (PARTITION BY user_id ORDER BY ts, event_type
                            ROWS UNBOUNDED PRECEDING) AS run
      FROM m),
runs AS (SELECT user_id, run, event_type,
                min(ts) AS valid_from,
                CAST(count(*) AS BIGINT) AS n_obs
         FROM r GROUP BY 1, 2, 3),
iv AS (SELECT *,
              lead(valid_from) OVER (PARTITION BY user_id
                                     ORDER BY run) AS nxt
       FROM runs)
SELECT user_id, event_type,
       strftime(valid_from, '%Y-%m-%d %H:%M:%S.%f') AS valid_from,
       coalesce(strftime(nxt, '%Y-%m-%d %H:%M:%S.%f'),
                '9999-12-31 00:00:00.000000') AS valid_to,
       CAST(run AS BIGINT) AS version,
       nxt IS NULL AS is_current,
       n_obs
FROM iv
"""


def q_tpch_q1(spark, sf_dir):
    """TPC-H Q1 pricing summary (the canonical scan-heavy OLAP
    aggregate) in idiomatic DataFrame API: one filtered scan, one
    map-side-combinable groupBy — Catalyst pushes the shipdate filter
    into the parquet scan (gated in test_plans)."""
    li = _load(spark, sf_dir, "lineitem")
    disc = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.where(F.col("l_shipdate") <= F.lit("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            _r(F.sum("l_quantity")).alias("sum_qty"),
            _r(F.sum("l_extendedprice")).alias("sum_base_price"),
            _r(F.sum(disc)).alias("sum_disc_price"),
            _r(F.sum(disc * (1 + F.col("l_tax")))).alias("sum_charge"),
            _r(F.avg("l_quantity")).alias("avg_qty"),
            _r(F.avg("l_extendedprice")).alias("avg_price"),
            _r(F.avg("l_discount")).alias("avg_disc"),
            F.count(F.lit(1)).cast("long").alias("count_order"),
        )
    )


SQL_TPCH_Q1 = """
SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity), 6) AS sum_qty,
       round(sum(l_extendedprice), 6) AS sum_base_price,
       round(sum(l_extendedprice * (1 - l_discount)), 6)
         AS sum_disc_price,
       round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 6)
         AS sum_charge,
       round(avg(l_quantity), 6) AS avg_qty,
       round(avg(l_extendedprice), 6) AS avg_price,
       round(avg(l_discount), 6) AS avg_disc,
       CAST(count(*) AS BIGINT) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY 1, 2
"""


def q_tpch_q3(spark, sf_dir):
    """TPC-H Q3 shipping priority: the canonical 3-table join.
    DataFrame-API shape: the filtered customer dim BROADCASTS into
    orders (no shuffle for the small side), lineitem joins on the
    orderkey exchange, one aggregate, top-10 by revenue with a
    deterministic tie-break."""
    cust = _load(spark, sf_dir, "customer").where(
        F.col("c_mktsegment") == "BUILDING"
    )
    orders = _load(spark, sf_dir, "orders").where(
        F.col("o_orderdate") < F.lit("1995-03-15")
    )
    li = _load(spark, sf_dir, "lineitem").where(
        F.col("l_shipdate") > F.lit("1995-03-15")
    )
    j = (
        orders.join(
            F.broadcast(cust),
            orders["o_custkey"] == cust["c_custkey"],
        )
        .join(li, li["l_orderkey"] == orders["o_orderkey"])
    )
    agg = j.groupBy(
        "l_orderkey",
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_orderdate"),
        "o_orderpriority",
    ).agg(
        _r(
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))
        ).alias("revenue")
    )
    return agg.orderBy(
        F.col("revenue").desc(), F.col("l_orderkey").asc()
    ).limit(10)


SQL_TPCH_Q3 = """
SELECT l_orderkey,
       strftime(CAST(o_orderdate AS DATE), '%Y-%m-%d') AS o_orderdate,
       o_orderpriority,
       round(sum(l_extendedprice * (1 - l_discount)), 6) AS revenue
FROM customer
JOIN orders ON o_custkey = c_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1995-03-15 00:00:00'
  AND l_shipdate > TIMESTAMP '1995-03-15 00:00:00'
GROUP BY 1, 2, 3
ORDER BY round(sum(l_extendedprice * (1 - l_discount)), 6) DESC,
         l_orderkey ASC
LIMIT 10
"""


def q_tpch_q6(spark, sf_dir):
    """TPC-H Q6 forecast-revenue filter: the pure pushdown benchmark —
    every predicate reaches the parquet scan, the aggregate is a
    single map-side-combined sum (plan gate: PushedFilters carries
    the range predicates; no shuffle beyond the final 1-row agg)."""
    li = _load(spark, sf_dir, "lineitem")
    return (
        li.where(
            (F.col("l_shipdate") >= F.lit("1995-01-01"))
            & (F.col("l_shipdate") < F.lit("1996-01-01"))
            & (F.col("l_discount") >= 0.03)
            & (F.col("l_discount") <= 0.05)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            _r(F.sum(F.col("l_extendedprice") * F.col("l_discount"))).alias(
                "revenue"
            ),
            F.count(F.lit(1)).cast("long").alias("n_rows"),
        )
    )


SQL_TPCH_Q6 = """
SELECT round(sum(l_extendedprice * l_discount), 6) AS revenue,
       CAST(count(*) AS BIGINT) AS n_rows
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1995-01-01 00:00:00'
  AND l_shipdate < TIMESTAMP '1996-01-01 00:00:00'
  AND l_discount >= 0.03 AND l_discount <= 0.05
  AND l_quantity < 24
"""


def q_heaps_law(spark, sf_dir):
    """Heaps'-law vocabulary-growth exponent per source (Heaps 1978):
    OLS of ln V on ln N over the per-doc cumulative curve — the
    growth-side companion of zipf_slope and the cheapest
    template/synthetic-corpus tell.  Exact integer curve; only the
    final log-OLS is floating (round-6)."""
    out = textstats.heaps_law(_load(spark, sf_dir, "documents"))
    return out.select(
        "source", "n_docs", "tokens", "vocab",
        _r(F.col("heaps_beta")).alias("heaps_beta"),
        _r(F.col("heaps_lnk")).alias("heaps_lnk"),
    )


SQL_HEAPS_LAW = r"""
WITH tok AS (
  SELECT source, doc_id AS doc,
         unnest(regexp_split_to_array(lower(trim(text)), '\s+')) AS w
  FROM documents),
per_doc AS (SELECT source, doc, CAST(count(*) AS BIGINT) AS nt
            FROM tok GROUP BY 1, 2),
firsts AS (SELECT source, min(doc) AS doc, w
           FROM tok GROUP BY source, w),
nw AS (SELECT source, doc, CAST(count(*) AS BIGINT) AS nw
       FROM firsts GROUP BY 1, 2),
curve AS (SELECT p.source, p.doc,
                 sum(p.nt) OVER wc AS N,
                 sum(coalesce(nw.nw, 0)) OVER wc AS V
          FROM per_doc p LEFT JOIN nw
            ON nw.source = p.source AND nw.doc = p.doc
          WINDOW wc AS (PARTITION BY p.source ORDER BY p.doc
                        ROWS UNBOUNDED PRECEDING)),
ag AS (SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
              CAST(max(N) AS BIGINT) AS tokens,
              CAST(max(V) AS BIGINT) AS vocab,
              sum(ln(CAST(N AS DOUBLE))) AS sx,
              sum(ln(CAST(V AS DOUBLE))) AS sy,
              sum(ln(CAST(N AS DOUBLE)) * ln(CAST(V AS DOUBLE))) AS sxy,
              sum(ln(CAST(N AS DOUBLE)) * ln(CAST(N AS DOUBLE))) AS sxx
       FROM curve GROUP BY 1),
sl AS (SELECT *,
              CASE WHEN n_docs >= 3
                    AND abs(n_docs * sxx - sx * sx) > 1e-12
                   THEN (n_docs * sxy - sx * sy)
                        / (n_docs * sxx - sx * sx) END AS beta
       FROM ag)
SELECT source, n_docs, tokens, vocab,
       round(beta, 6) AS heaps_beta,
       round(CASE WHEN beta IS NOT NULL
                  THEN (sy - beta * sx) / n_docs END, 6) AS heaps_lnk
FROM sl
"""


def q_rolling_distinct(spark, sf_dir):
    """Trailing-7-day distinct actors per event_type (WAU-style): the
    day-RANGE window slides over per-day actor-set partials, never raw
    events; exact here, HLL-sketch partial at scale (same algebra)."""
    from .operators.sessions import rolling_distinct_actors

    return rolling_distinct_actors(
        _load(spark, sf_dir, "events"), window_days=7
    ).withColumnRenamed("event_type", "source")


SQL_ROLLING_DISTINCT = """
WITH d AS (SELECT event_type AS source, CAST(ts AS DATE) AS day,
                  user_id
           FROM events),
days AS (SELECT DISTINCT source, day FROM d)
SELECT days.source,
       strftime(days.day, '%Y-%m-%d') AS day,
       CAST((SELECT count(DISTINCT user_id) FROM d
             WHERE d.source = days.source AND d.day = days.day)
            AS BIGINT) AS n_day,
       CAST((SELECT count(DISTINCT user_id) FROM d
             WHERE d.source = days.source
               AND d.day BETWEEN days.day - 6 AND days.day)
            AS BIGINT) AS n_window,
       CAST((SELECT count(DISTINCT d.day) FROM d
             WHERE d.source = days.source
               AND d.day BETWEEN days.day - 6 AND days.day)
            AS BIGINT) AS days_covered
FROM days
"""


_TB_CAP, _TB_RATE, _TB_COST = 3.0, 0.00001, 1.0


def q_token_bucket(spark, sf_dir):
    """Token-bucket rate-limit replay (RFC 2697-style policer): audit
    which historical events each user would have lost under a
    (capacity, refill) quota.  Exact IEEE fold on exact epochs; the
    recursive-CTE twin replays every allow/throttle decision
    bit-for-bit."""
    from .operators.eventflow import token_bucket_throttle

    out = token_bucket_throttle(
        _load(spark, sf_dir, "events"),
        capacity=_TB_CAP, refill_per_s=_TB_RATE, cost=_TB_COST,
    )
    return out.select(
        "user_id", "n_events", "n_throttled",
        _r(F.col("first_throttled_t")).alias("first_throttled_t"),
        _r(F.col("final_level")).alias("final_level"),
    )


SQL_TOKEN_BUCKET = f"""
WITH RECURSIVE
pts AS (SELECT user_id, epoch(ts) AS t,
               CAST(row_number() OVER (PARTITION BY user_id
                                       ORDER BY epoch(ts)) AS BIGINT)
                 AS i
        FROM events),
nn AS (SELECT user_id, max(i) AS ni FROM pts GROUP BY 1),
dp AS (
  SELECT user_id, i, t AS tp,
         CAST({_TB_CAP!r} AS DOUBLE) - CAST({_TB_COST!r} AS DOUBLE)
           AS lvl,
         CAST(0 AS BIGINT) AS thr,
         CAST(NULL AS DOUBLE) AS first
  FROM pts WHERE i = 1
  UNION ALL
  SELECT p.user_id, p.i, p.t,
         CASE WHEN l1.lvl >= CAST({_TB_COST!r} AS DOUBLE)
              THEN l1.lvl - CAST({_TB_COST!r} AS DOUBLE)
              ELSE l1.lvl END,
         dp.thr + CASE WHEN l1.lvl >= CAST({_TB_COST!r} AS DOUBLE)
                       THEN 0 ELSE 1 END,
         coalesce(dp.first,
                  CASE WHEN l1.lvl < CAST({_TB_COST!r} AS DOUBLE)
                       THEN p.t END)
  FROM dp JOIN pts p ON p.user_id = dp.user_id AND p.i = dp.i + 1
  CROSS JOIN LATERAL (
    SELECT CASE WHEN dp.lvl + (p.t - dp.tp)
                         * CAST({_TB_RATE!r} AS DOUBLE)
                     < CAST({_TB_CAP!r} AS DOUBLE)
                THEN dp.lvl + (p.t - dp.tp)
                         * CAST({_TB_RATE!r} AS DOUBLE)
                ELSE CAST({_TB_CAP!r} AS DOUBLE) END AS lvl) l1)
SELECT dp.user_id,
       CAST(nn.ni AS BIGINT) AS n_events,
       dp.thr AS n_throttled,
       round(dp.first, 6) AS first_throttled_t,
       round(dp.lvl, 6) AS final_level
FROM dp JOIN nn ON nn.user_id = dp.user_id AND dp.i = nn.ni
"""


def q_cube_rollup(spark, sf_dir):
    """Multi-dimensional CUBE aggregate (Gray et al. 1997, the data
    cube operator): events by (event_type, day) with all four grouping
    combinations in ONE pass — Catalyst's Expand node materializes the
    grouping sets map-side, so the cube costs one shuffle, not four
    scans.  grouping_id disambiguates the levels exactly as DuckDB's
    GROUPING() does."""
    ev = _load(spark, sf_dir, "events").select(
        "event_type",
        F.date_format(F.to_date("ts"), "yyyy-MM-dd").alias("day"),
        "value",
    )
    return (
        ev.cube("event_type", "day")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            _r(F.sum("value")).alias("value_sum"),
            _r(F.avg("value")).alias("value_mean"),
        )
        .select(
            F.coalesce(F.col("event_type"), F.lit("<all>")).alias(
                "event_type"
            ),
            F.coalesce(F.col("day"), F.lit("<all>")).alias("day"),
            "n", "value_sum", "value_mean",
        )
    )


SQL_CUBE_ROLLUP = """
SELECT coalesce(event_type, '<all>') AS event_type,
       coalesce(strftime(CAST(ts AS DATE), '%Y-%m-%d'), '<all>') AS day,
       CAST(count(*) AS BIGINT) AS n,
       round(sum(value), 6) AS value_sum,
       round(avg(value), 6) AS value_mean
FROM events
GROUP BY CUBE (event_type, strftime(CAST(ts AS DATE), '%Y-%m-%d'))
"""


_BS_Q, _BS_MIN = 1000.0, 10


def q_binseg_changepoints(spark, sf_dir):
    """Depth-2 binary segmentation (Scott & Knott 1974 recursion on
    the CUSUM argmax): root split plus one split per half, quantized
    longs so every argmax decision is bit-deterministic across
    engines and partition counts."""
    out = analyses.binseg_changepoints(
        series(spark, sf_dir), quantized=_BS_Q, min_seg=_BS_MIN,
        key_cols=["source", "doc_id"],
    )
    return out.select(
        "source", "doc_id", "level", "seg", "cp_pos", "n_seg",
        _r(F.col("s_max_norm")).alias("s_max_norm"),
        _r(F.col("mean_before")).alias("mean_before"),
        _r(F.col("mean_after")).alias("mean_after"),
    )


SQL_BINSEG = f"""
WITH series AS ({SERIES_SQL}),
pts AS (SELECT source, doc_id, pos,
               CAST(floor(value * {_BS_Q!r}) AS BIGINT) AS vq
        FROM series WHERE value IS NOT NULL),
e1 AS (SELECT source, doc_id, pos, vq,
              count(*) OVER wf AS n,
              sum(vq) OVER wf AS tot,
              row_number() OVER wr AS k,
              sum(vq) OVER wc AS cum
       FROM pts
       WINDOW wf AS (PARTITION BY source, doc_id),
              wr AS (PARTITION BY source, doc_id ORDER BY pos),
              wc AS (PARTITION BY source, doc_id ORDER BY pos
                     ROWS UNBOUNDED PRECEDING)),
s1 AS (SELECT *,
              CAST(cum AS DOUBLE)
              - k * CAST(tot AS DOUBLE) / n AS s
       FROM e1),
c1 AS (SELECT *,
              row_number() OVER (PARTITION BY source, doc_id
                                 ORDER BY abs(s) DESC, k ASC) AS rn
       FROM s1 WHERE k >= {_BS_MIN} AND k <= n - {_BS_MIN}),
l1 AS (SELECT source, doc_id, pos AS cp_pos, k, n, tot, cum,
              abs(s) AS s_abs
       FROM c1 WHERE rn = 1),
hv AS (SELECT s1.source, s1.doc_id, s1.pos, s1.vq,
              CASE WHEN s1.k <= l1.k THEN 0 ELSE 1 END AS seg
       FROM s1 JOIN l1 USING (source, doc_id)
       WHERE s1.n >= 2 * {_BS_MIN}),
e2 AS (SELECT source, doc_id, seg, pos, vq,
              count(*) OVER wf AS n,
              sum(vq) OVER wf AS tot,
              row_number() OVER wr AS k,
              sum(vq) OVER wc AS cum
       FROM hv
       WINDOW wf AS (PARTITION BY source, doc_id, seg),
              wr AS (PARTITION BY source, doc_id, seg ORDER BY pos),
              wc AS (PARTITION BY source, doc_id, seg ORDER BY pos
                     ROWS UNBOUNDED PRECEDING)),
s2 AS (SELECT *,
              CAST(cum AS DOUBLE)
              - k * CAST(tot AS DOUBLE) / n AS s
       FROM e2),
c2 AS (SELECT *,
              row_number() OVER (PARTITION BY source, doc_id, seg
                                 ORDER BY abs(s) DESC, k ASC) AS rn
       FROM s2 WHERE k >= {_BS_MIN} AND k <= n - {_BS_MIN}),
l2 AS (SELECT source, doc_id, seg, pos AS cp_pos, k, n, tot, cum,
              abs(s) AS s_abs
       FROM c2 WHERE rn = 1),
uni AS (
  SELECT source, doc_id, CAST(1 AS BIGINT) AS level,
         CAST(-1 AS BIGINT) AS seg, cp_pos, k, n, tot, cum, s_abs
  FROM l1
  UNION ALL
  SELECT source, doc_id, CAST(2 AS BIGINT),
         CAST(seg AS BIGINT), cp_pos, k, n, tot, cum, s_abs
  FROM l2)
SELECT source, doc_id, level, seg,
       CAST(cp_pos AS BIGINT) AS cp_pos,
       CAST(n AS BIGINT) AS n_seg,
       round(s_abs / {_BS_Q!r} / n, 6) AS s_max_norm,
       round(CAST(cum AS DOUBLE) / k / {_BS_Q!r}, 6) AS mean_before,
       round(CAST(tot - cum AS DOUBLE) / (n - k) / {_BS_Q!r}, 6)
         AS mean_after
FROM uni
"""


def q_json_props_extract(spark, sf_dir):
    """Schema-on-read JSON payload extraction (JVM from_json, never a
    UDF): parse the events table's props column, then aggregate the
    extracted field per event_type x value-band — the typed-payload
    ingestion path the reference's YAML-only config reader lacks."""
    from .sources.readers import parse_json_col

    ev = parse_json_col(
        _load(spark, sf_dir, "events"), "props", "k INT", prefix="p_"
    )
    band = (F.col("p_k") / 10).cast("long")
    return (
        ev.groupBy(F.col("event_type").alias("source"), band.alias("k_band"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("p_k").cast("long").alias("k_sum"),
            F.min("p_k").cast("long").alias("k_min"),
            F.max("p_k").cast("long").alias("k_max"),
            _r(F.avg(F.col("value"))).alias("value_mean"),
        )
    )


SQL_JSON_PROPS = """
SELECT event_type AS source,
       CAST(CAST(json_extract_string(props, '$.k') AS INT) // 10
            AS BIGINT) AS k_band,
       CAST(count(*) AS BIGINT) AS n,
       CAST(sum(CAST(json_extract_string(props, '$.k') AS INT))
            AS BIGINT) AS k_sum,
       CAST(min(CAST(json_extract_string(props, '$.k') AS INT))
            AS BIGINT) AS k_min,
       CAST(max(CAST(json_extract_string(props, '$.k') AS INT))
            AS BIGINT) AS k_max,
       round(avg(value), 6) AS value_mean
FROM events
GROUP BY 1, 2
"""


def q_spearman_pairs(spark, sf_dir):
    """Rank-transform (Spearman) top correlated pairs per source:
    fractional average-tie ranks per series, then the exact Pearson
    machinery — monotone-robust pair discovery.  Ranks are small
    exact doubles, so the component sums are exact in ANY order and
    rho is bit-identical across engines."""
    out = spectral.top_correlated_pairs(
        series(spark, sf_dir), top_k=5, min_overlap=30,
        key_cols=["source", "doc_id"], method="spearman",
    )
    return out.select(
        "source", "rank", "doc_a", "doc_b", "n_overlap",
        _r(F.col("r")).alias("rho"),
    )


SQL_SPEARMAN_PAIRS = f"""
WITH series AS ({SERIES_SQL}),
pts0 AS (SELECT source, doc_id, pos, value FROM series
         WHERE value IS NOT NULL),
pts AS (SELECT source, doc_id, pos,
               CAST(rank() OVER (PARTITION BY source, doc_id
                                 ORDER BY value) AS DOUBLE)
               + (CAST(count(*) OVER (PARTITION BY source, doc_id,
                                      value) AS DOUBLE) - 1) / 2
                 AS value
        FROM pts0),
pr AS (SELECT a.source, a.doc_id AS doc_a, b.doc_id AS doc_b,
              CAST(count(*) AS BIGINT) AS n_overlap,
              sum(a.value) AS sa, sum(b.value) AS sb,
              sum(a.value * b.value) AS sab,
              sum(a.value * a.value) AS saa,
              sum(b.value * b.value) AS sbb
       FROM pts a JOIN pts b
         ON a.source = b.source AND a.pos = b.pos
        AND a.doc_id < b.doc_id
       GROUP BY 1, 2, 3),
rr AS (SELECT *,
              CASE WHEN n_overlap >= 30
                    AND n_overlap * saa - sa * sa > 0
                    AND n_overlap * sbb - sb * sb > 0
                   THEN (n_overlap * sab - sa * sb)
                        / sqrt((n_overlap * saa - sa * sa)
                               * (n_overlap * sbb - sb * sb)) END AS r
       FROM pr),
rk AS (SELECT *,
              row_number() OVER (PARTITION BY source
                                 ORDER BY round(abs(r), 6) DESC,
                                          doc_a ASC, doc_b ASC) AS rank
       FROM rr WHERE r IS NOT NULL)
SELECT source, CAST(rank AS BIGINT) AS rank, doc_a, doc_b, n_overlap,
       round(r, 6) AS rho
FROM rk WHERE rank <= 5
"""


def q_permutation_entropy(spark, sf_dir):
    """Order-3 permutation entropy (Bandt & Pompe 2002): normalized
    Shannon entropy of the ordinal-pattern distribution over
    consecutive triples; stable tie rule makes the pattern ids pure
    integer logic, so the SQL twin reproduces the counts exactly."""
    out = spectral.permutation_entropy(
        series(spark, sf_dir), key_cols=["source", "doc_id"]
    )
    return out.select(
        "source", "doc_id", "n_windows", "n_patterns",
        _r(F.col("pe")).alias("pe"),
    )


SQL_PERMUTATION_ENTROPY = f"""
WITH series AS ({SERIES_SQL}),
st AS (SELECT source, doc_id, pos, value,
              lead(value, 1) OVER w AS x1, lead(value, 2) OVER w AS x2,
              lead(pos, 1) OVER w AS p1, lead(pos, 2) OVER w AS p2
       FROM series
       WINDOW w AS (PARTITION BY source, doc_id ORDER BY pos)),
tr AS (SELECT source, doc_id,
              (CASE WHEN x1 < value THEN 1 ELSE 0 END
               + CASE WHEN x2 < value THEN 1 ELSE 0 END) * 3
              + (CASE WHEN value < x1 THEN 1 ELSE 0 END
                 + CASE WHEN value = x1 THEN 1 ELSE 0 END
                 + CASE WHEN x2 < x1 THEN 1 ELSE 0 END) AS pat
       FROM st
       WHERE value IS NOT NULL AND x1 IS NOT NULL AND x2 IS NOT NULL
         AND p1 = pos + 1 AND p2 = pos + 2),
pc AS (SELECT source, doc_id, pat, CAST(count(*) AS DOUBLE) AS c
       FROM tr GROUP BY 1, 2, 3),
ag AS (SELECT source, doc_id, sum(c) AS n,
              CAST(count(*) AS BIGINT) AS np,
              sum(c * ln(c)) AS clc
       FROM pc GROUP BY 1, 2)
SELECT source, doc_id, CAST(n AS BIGINT) AS n_windows,
       np AS n_patterns,
       round((ln(n) - clc / n) / ln(6.0), 6) AS pe
FROM ag
"""


_CR_A = 0.1


def q_croston_forecast(spark, sf_dir):
    """Croston intermittent-demand forecast (Croston 1972 + the
    Syntetos-Boylan 2005 bias correction) over the gappy series view:
    SES of non-null demand sizes, SES of inter-demand intervals.  The
    update chain is mult/add/divide only, so the recursive-CTE twin
    replays it bit-for-bit."""
    out = forecast.croston_forecast(
        series(spark, sf_dir), alpha=_CR_A, key_cols=["source", "doc_id"]
    )
    return out.select(
        "source", "doc_id", "n", "n_demands",
        _r(F.col("z")).alias("z"),
        _r(F.col("p")).alias("p"),
        _r(F.col("forecast")).alias("forecast"),
        _r(F.col("forecast_sba")).alias("forecast_sba"),
    )


SQL_CROSTON_FORECAST = f"""
WITH RECURSIVE series AS ({SERIES_SQL}),
nn AS (SELECT source, doc_id, max(pos) AS pmax FROM series GROUP BY 1, 2),
dp AS (
  SELECT s.source, s.doc_id, CAST(0 AS BIGINT) AS t,
         CAST(CASE WHEN s.value IS NOT NULL THEN s.value END AS DOUBLE)
           AS z,
         CAST(CASE WHEN s.value IS NOT NULL THEN 1.0 END AS DOUBLE) AS p,
         CAST(CASE WHEN s.value IS NOT NULL THEN 0.0 ELSE 1.0 END
              AS DOUBLE) AS q,
         CAST(CASE WHEN s.value IS NOT NULL THEN 1 ELSE 0 END AS BIGINT)
           AS k
  FROM series s WHERE s.pos = 0
  UNION ALL
  SELECT s.source, s.doc_id, dp.t + 1,
         CASE WHEN s.value IS NULL THEN dp.z
              WHEN dp.k = 0 THEN s.value
              ELSE dp.z + {_CR_A!r} * (s.value - dp.z) END,
         CASE WHEN s.value IS NULL THEN dp.p
              WHEN dp.k = 0 THEN dp.q + 1.0
              ELSE dp.p + {_CR_A!r} * ((dp.q + 1.0) - dp.p) END,
         CASE WHEN s.value IS NULL THEN dp.q + 1.0 ELSE 0.0 END,
         dp.k + CASE WHEN s.value IS NULL THEN 0 ELSE 1 END
  FROM dp JOIN series s
    ON s.source = dp.source AND s.doc_id = dp.doc_id
   AND s.pos = dp.t + 1)
SELECT dp.source, dp.doc_id,
       CAST(nn.pmax + 1 AS BIGINT) AS n,
       CAST(dp.k AS BIGINT) AS n_demands,
       round(dp.z, 6) AS z,
       round(dp.p, 6) AS p,
       round(CASE WHEN dp.p > 0 THEN dp.z / dp.p END, 6) AS forecast,
       round(CASE WHEN dp.p > 0
                  THEN {1.0 - _CR_A / 2.0!r} * (dp.z / dp.p) END, 6)
         AS forecast_sba
FROM dp JOIN nn ON nn.source = dp.source AND nn.doc_id = dp.doc_id
              AND dp.t = nn.pmax
"""


_PH_D, _PH_L = 0.005, 60.0


def q_page_hinkley(spark, sf_dir):
    """Page-Hinkley sequential upward-drift test (Page 1954 / Hinkley
    1971, restart-on-alarm) per series: running-mean-centered CUSUM
    with a min anchor.  Exact IEEE arithmetic only, so the
    recursive-CTE twin replays alarms and the residual statistic
    bit-for-bit."""
    out = outliers.page_hinkley(
        series(spark, sf_dir), delta=_PH_D, lam=_PH_L,
        key_cols=["source", "doc_id"],
    )
    return out.select(
        "source", "doc_id", "n", "n_alarms", "first_alarm",
        _r(F.col("ph_stat")).alias("ph_stat"),
    )


SQL_PAGE_HINKLEY = f"""
WITH RECURSIVE series AS ({SERIES_SQL}),
pts AS (SELECT source, doc_id, pos, value,
               CAST(row_number() OVER (PARTITION BY source, doc_id
                                       ORDER BY pos) AS BIGINT) AS i
        FROM series WHERE value IS NOT NULL),
nn AS (SELECT source, doc_id, max(i) AS ni FROM pts GROUP BY 1, 2),
dp AS (
  SELECT p.source, p.doc_id, p.i,
         CAST(CASE WHEN t3.fired THEN 0.0 ELSE t1.c2 END AS DOUBLE)
           AS cnt,
         CAST(CASE WHEN t3.fired THEN 0.0 ELSE t1.s2 END AS DOUBLE) AS s,
         CAST(CASE WHEN t3.fired THEN 0.0 ELSE t2.m2 END AS DOUBLE) AS m,
         CAST(CASE WHEN t3.fired THEN 0.0 ELSE t3.mm2 END AS DOUBLE)
           AS mm,
         CAST(CASE WHEN t3.fired THEN 1 ELSE 0 END AS BIGINT) AS alarms,
         CAST(CASE WHEN t3.fired THEN p.pos END AS BIGINT) AS first
  FROM pts p
  CROSS JOIN LATERAL (
    SELECT CAST(1.0 AS DOUBLE) AS c2,
           CAST(0.0 + p.value AS DOUBLE) AS s2) t1
  CROSS JOIN LATERAL (
    SELECT 0.0 + p.value - t1.s2 / t1.c2 - CAST({_PH_D!r} AS DOUBLE)
      AS m2) t2
  CROSS JOIN LATERAL (
    SELECT least(CAST(0.0 AS DOUBLE), t2.m2) AS mm2,
           (t2.m2 - least(CAST(0.0 AS DOUBLE), t2.m2))
             > CAST({_PH_L!r} AS DOUBLE) AS fired) t3
  WHERE p.i = 1
  UNION ALL
  SELECT p.source, p.doc_id, p.i,
         CASE WHEN t3.fired THEN 0.0 ELSE t1.c2 END,
         CASE WHEN t3.fired THEN 0.0 ELSE t1.s2 END,
         CASE WHEN t3.fired THEN 0.0 ELSE t2.m2 END,
         CASE WHEN t3.fired THEN 0.0 ELSE t3.mm2 END,
         dp.alarms + CASE WHEN t3.fired THEN 1 ELSE 0 END,
         coalesce(dp.first, CASE WHEN t3.fired THEN p.pos END)
  FROM dp
  JOIN pts p ON p.source = dp.source AND p.doc_id = dp.doc_id
            AND p.i = dp.i + 1
  CROSS JOIN LATERAL (
    SELECT dp.cnt + 1.0 AS c2, dp.s + p.value AS s2) t1
  CROSS JOIN LATERAL (
    SELECT dp.m + p.value - t1.s2 / t1.c2 - CAST({_PH_D!r} AS DOUBLE)
      AS m2) t2
  CROSS JOIN LATERAL (
    SELECT least(dp.mm, t2.m2) AS mm2,
           (t2.m2 - least(dp.mm, t2.m2)) > CAST({_PH_L!r} AS DOUBLE)
             AS fired) t3)
SELECT dp.source, dp.doc_id,
       CAST(nn.ni AS BIGINT) AS n,
       CAST(dp.alarms AS BIGINT) AS n_alarms,
       CAST(dp.first AS BIGINT) AS first_alarm,
       round(dp.m - dp.mm, 6) AS ph_stat
FROM dp JOIN nn ON nn.source = dp.source AND nn.doc_id = dp.doc_id
              AND dp.i = nn.ni
"""


def q_granger_pairs(spark, sf_dir):
    """Discovery -> direction: the top-3 most-correlated doc pairs per
    source (top_correlated_pairs, round-6 |r| rank) are tested BOTH
    ways with the lag-1 Granger F-test (Granger 1969): restricted
    y~y_lag vs unrestricted y~y_lag+x_lag, closed-form OLS over
    centered sums — no solver, no UDF.  Pair list is broadcast;
    readings meet co-partitioned on (source, pos)."""
    tc = spectral.top_correlated_pairs(
        series(spark, sf_dir), top_k=3, min_overlap=30,
        key_cols=["source", "doc_id"],
    )
    out = spectral.granger_lag1(
        series(spark, sf_dir),
        tc.select("source", "doc_a", "doc_b"),
        key_cols=["source", "doc_id"],
        min_overlap=30,
    )
    return out.select(
        "source", "doc_cause", "doc_effect", "n",
        _r(F.col("f_stat")).alias("f_stat"),
        _r(F.col("r2_gain")).alias("r2_gain"),
    )


SQL_GRANGER_PAIRS = f"""
WITH series AS ({SERIES_SQL}),
pts AS (SELECT source, doc_id, pos, value FROM series
        WHERE value IS NOT NULL),
pr AS (SELECT a.source, a.doc_id AS doc_a, b.doc_id AS doc_b,
              CAST(count(*) AS BIGINT) AS n_overlap,
              sum(a.value) AS sa, sum(b.value) AS sb,
              sum(a.value * b.value) AS sab,
              sum(a.value * a.value) AS saa,
              sum(b.value * b.value) AS sbb
       FROM pts a JOIN pts b
         ON a.source = b.source AND a.pos = b.pos
        AND a.doc_id < b.doc_id
       GROUP BY 1, 2, 3),
rr AS (SELECT *,
              CASE WHEN n_overlap >= 30
                    AND n_overlap * saa - sa * sa > 0
                    AND n_overlap * sbb - sb * sb > 0
                   THEN (n_overlap * sab - sa * sb)
                        / sqrt((n_overlap * saa - sa * sa)
                               * (n_overlap * sbb - sb * sb)) END AS r
       FROM pr),
rk AS (SELECT *,
              row_number() OVER (PARTITION BY source
                                 ORDER BY round(abs(r), 6) DESC,
                                          doc_a ASC, doc_b ASC) AS rank
       FROM rr WHERE r IS NOT NULL),
pairs AS (SELECT source, doc_a, doc_b FROM rk WHERE rank <= 3),
dirp AS (SELECT source, doc_a AS cause, doc_b AS eff FROM pairs
         UNION ALL
         SELECT source, doc_b AS cause, doc_a AS eff FROM pairs),
lagd AS (SELECT source, doc_id, pos, value,
                lag(value) OVER (PARTITION BY source, doc_id
                                 ORDER BY pos) AS v1
         FROM series),
j AS (SELECT d.source, d.cause, d.eff,
             e.value AS y, e.v1 AS y1, c.v1 AS x1
      FROM dirp d
      JOIN lagd e ON e.source = d.source AND e.doc_id = d.eff
      JOIN lagd c ON c.source = d.source AND c.doc_id = d.cause
                 AND c.pos = e.pos
      WHERE e.value IS NOT NULL AND e.v1 IS NOT NULL
        AND c.v1 IS NOT NULL),
ag AS (SELECT source, cause, eff, CAST(count(*) AS BIGINT) AS n,
              sum(y) AS sy, sum(y1) AS s1, sum(x1) AS s2,
              sum(y * y) AS syy, sum(y * y1) AS sy1,
              sum(y * x1) AS sy2, sum(y1 * y1) AS s11,
              sum(x1 * x1) AS s22, sum(y1 * x1) AS s12
       FROM j GROUP BY 1, 2, 3),
cm AS (SELECT *,
              syy - sy * sy / CAST(n AS DOUBLE) AS cyy,
              s11 - s1 * s1 / CAST(n AS DOUBLE) AS c11,
              s22 - s2 * s2 / CAST(n AS DOUBLE) AS c22,
              s12 - s1 * s2 / CAST(n AS DOUBLE) AS c12,
              sy1 - s1 * sy / CAST(n AS DOUBLE) AS c1y,
              sy2 - s2 * sy / CAST(n AS DOUBLE) AS c2y
       FROM ag),
fm AS (SELECT *,
              CASE WHEN c11 > 0 THEN cyy - c1y * c1y / c11 END AS rss_r,
              c11 * c22 - c12 * c12 AS det,
              (n >= 30 AND c11 > 0 AND c22 > 0
               AND c11 * c22 - c12 * c12 > 1e-12 * c11 * c22) AS ok
       FROM cm),
um AS (SELECT *,
              cyy - ((c1y * c22 - c2y * c12) / det) * c1y
                  - ((c2y * c11 - c1y * c12) / det) * c2y AS rss_u
       FROM fm WHERE ok),
res AS (SELECT source, cause, eff, n,
               CASE WHEN rss_u > 0
                    THEN (rss_r - rss_u)
                         / (rss_u / (CAST(n AS DOUBLE) - 3.0)) END
                 AS f_stat,
               CASE WHEN rss_r > 0
                    THEN (rss_r - rss_u) / rss_r END AS r2_gain
        FROM um)
SELECT ag.source, ag.cause AS doc_cause, ag.eff AS doc_effect, ag.n,
       round(res.f_stat, 6) AS f_stat,
       round(res.r2_gain, 6) AS r2_gain
FROM ag LEFT JOIN res
  ON res.source = ag.source AND res.cause = ag.cause
 AND res.eff = ag.eff
"""


_LS_K = 12


def q_lomb_scargle(spark, sf_dir):
    """Lomb-Scargle periodogram peak for irregularly sampled series
    (Lomb 1976 / Scargle 1982, tau-corrected Horne & Baliunas form) —
    evaluated at the TRUE sample positions of the gappy series view,
    where dft_power_peak's equal-spacing assumption would alias.  One
    collect shuffle, O(n*max_k) row-local folds; argmax on round-6
    power with smallest-k tie-break (the dft comparator) so the winner
    is stable across engines and summation orders."""
    out = spectral.lomb_scargle_peak(
        series(spark, sf_dir), max_k=_LS_K, key_cols=["source", "doc_id"]
    )
    return out.select(
        "source", "doc_id", "n", "k_peak",
        _r(F.col("freq")).alias("freq"),
        _r(F.col("power")).alias("power"),
    )


SQL_LOMB_SCARGLE = f"""
WITH series AS ({SERIES_SQL}),
pts AS (SELECT source, doc_id, CAST(pos AS DOUBLE) AS t, value AS y
        FROM series WHERE value IS NOT NULL),
nn AS (SELECT source, doc_id, CAST(count(*) AS BIGINT) AS n,
              sum(y) / count(*) AS mu, max(t) - min(t) + 1.0 AS p
       FROM pts GROUP BY 1, 2),
vv AS (SELECT pts.source, pts.doc_id,
              sum((y - mu) * (y - mu)) / nn.n AS var
       FROM pts JOIN nn USING (source, doc_id) GROUP BY 1, 2, nn.n),
ks AS (SELECT nn.source, nn.doc_id, nn.n, nn.mu, nn.p, vv.var,
              unnest(range(1, {_LS_K} + 1)) AS k
       FROM nn JOIN vv USING (source, doc_id)
       WHERE nn.n >= 8 AND vv.var > 0),
t1 AS (SELECT ks.source, ks.doc_id, ks.k, ks.mu, ks.p, ks.var,
              2 * pi() * ks.k / ks.p AS w,
              sum(sin(2 * (2 * pi() * ks.k / ks.p) * pts.t)) AS s2,
              sum(cos(2 * (2 * pi() * ks.k / ks.p) * pts.t)) AS c2
       FROM ks JOIN pts USING (source, doc_id)
       GROUP BY 1, 2, 3, 4, 5, 6, 7),
tu AS (SELECT *, atan2(s2, c2) / (2 * w) AS tau FROM t1),
t2 AS (SELECT tu.source, tu.doc_id, tu.k, tu.p, tu.var,
              sum((y - tu.mu) * cos(tu.w * (t - tu.tau))) AS cy,
              sum((y - tu.mu) * sin(tu.w * (t - tu.tau))) AS sy,
              sum(cos(tu.w * (t - tu.tau)) * cos(tu.w * (t - tu.tau)))
                AS cc,
              sum(sin(tu.w * (t - tu.tau)) * sin(tu.w * (t - tu.tau)))
                AS ss
       FROM tu JOIN pts USING (source, doc_id)
       GROUP BY 1, 2, 3, 4, 5),
pw AS (SELECT source, doc_id, k, p,
              CASE WHEN cc > 0 AND ss > 0
                   THEN (cy * cy / cc + sy * sy / ss) / (2 * var) END
                AS pwr
       FROM t2),
rk AS (SELECT *,
              row_number() OVER (PARTITION BY source, doc_id
                                 ORDER BY round(pwr, 6) DESC, k ASC)
                AS rn
       FROM pw WHERE pwr IS NOT NULL)
SELECT nn.source, nn.doc_id, nn.n,
       b.k AS k_peak,
       round(b.k / b.p, 6) AS freq,
       round(b.pwr, 6) AS power
FROM nn LEFT JOIN (SELECT * FROM rk WHERE rn = 1) b
  USING (source, doc_id)
"""


_AV_TAUS = (2, 4, 8, 16)


def q_allan_variance(spark, sf_dir):
    """Non-overlapped Allan variance ladder (Allan 1966 / IEEE 1139)
    per series at tau in {2,4,8,16} grid units: bucket means only when
    all tau slots are present+non-null, 0.5*mean of adjacent-pair
    squared diffs.  One map-building shuffle; every tau is a row-local
    fold (no per-tau pass over the table)."""
    out = spectral.allan_variance(
        series(spark, sf_dir), taus=_AV_TAUS, key_cols=["source", "doc_id"]
    )
    return out.select(
        "source", "doc_id", "tau", "n_pairs",
        _r(F.col("avar")).alias("avar"),
        _r(F.col("adev")).alias("adev"),
    )


SQL_ALLAN_VARIANCE = f"""
WITH series AS ({SERIES_SQL}),
tt AS (SELECT unnest([{", ".join(str(t) for t in _AV_TAUS)}]) AS tau),
b AS (SELECT source, doc_id, tau, pos // tau AS bkt, value
      FROM series CROSS JOIN tt),
bm AS (SELECT source, doc_id, tau, bkt,
              CASE WHEN count(*) = tau AND count(value) = tau
                   THEN sum(value) / tau END AS m
       FROM b GROUP BY 1, 2, 3, 4),
pr AS (SELECT source, doc_id, tau, m,
              lag(m) OVER (PARTITION BY source, doc_id, tau
                           ORDER BY bkt) AS pm
       FROM bm)
SELECT source, doc_id, CAST(tau AS BIGINT) AS tau,
       CAST(count(*) AS BIGINT) AS n_pairs,
       round(0.5 * sum((m - pm) * (m - pm)) / count(*), 6) AS avar,
       round(sqrt(0.5 * sum((m - pm) * (m - pm)) / count(*)), 6) AS adev
FROM pr WHERE m IS NOT NULL AND pm IS NOT NULL
GROUP BY 1, 2, 3
"""


_FUN_STEPS = ["view", "click", "purchase"]
_FUN_WIN = 86400.0


def q_funnel_conversion(spark, sf_dir):
    """Ordered-funnel conversion per user (ClickHouse windowFunnel
    semantics re-expressed as one grouped array fold): anchor at the
    earliest 'view', then the first 'click' at-or-after it and the
    first 'purchase' at-or-after that, all within 24 h of the anchor.
    One shuffle on user_id; the step chain is filter/transform/
    array_min expressions.  Epochs are exact micros/1e6 doubles, the
    chain is min/compare arithmetic only, so the DuckDB twin (a chain
    of correlated min-aggregates) reproduces every value exactly."""
    from .operators.eventflow import funnel_conversion

    out = funnel_conversion(
        _load(spark, sf_dir, "events"),
        _FUN_STEPS,
        window_seconds=_FUN_WIN,
    )
    return out.select(
        "user_id",
        "level",
        _r(F.col("t_anchor")).alias("t_anchor"),
        _r(F.col("dur_s")).alias("dur_s"),
    )


SQL_FUNNEL_CONVERSION = """
WITH f AS (SELECT user_id, epoch(ts) AS t, event_type AS y FROM events
           WHERE event_type IN ('view', 'click', 'purchase')),
a AS (SELECT user_id, min(CASE WHEN y = 'view' THEN t END) AS t0
      FROM f GROUP BY 1),
s1 AS (SELECT f.user_id, min(t) AS t1
       FROM f JOIN a USING (user_id)
       WHERE y = 'click' AND t >= a.t0 AND t <= a.t0 + 86400.0
       GROUP BY 1),
s2 AS (SELECT f.user_id, min(t) AS t2
       FROM f JOIN s1 USING (user_id) JOIN a USING (user_id)
       WHERE y = 'purchase' AND t >= s1.t1 AND t <= a.t0 + 86400.0
       GROUP BY 1)
SELECT a.user_id,
       CAST(CASE WHEN t0 IS NULL THEN 0
                 WHEN t1 IS NULL THEN 1
                 WHEN t2 IS NULL THEN 2 ELSE 3 END AS INT) AS level,
       round(t0, 6) AS t_anchor,
       round(CASE WHEN t2 IS NOT NULL THEN t2 - t0
                  WHEN t1 IS NOT NULL THEN t1 - t0 END, 6) AS dur_s
FROM a LEFT JOIN s1 USING (user_id) LEFT JOIN s2 USING (user_id)
"""


def q_retention_cohorts(spark, sf_dir):
    """Cohort-retention matrix: users cohorted by first-event day,
    distinct-active counts at each day offset.  ONE shuffle on user_id
    yields cohort AND the active-day set in the same aggregate; the
    final matrix is cohorts x offsets."""
    from .operators.eventflow import retention_cohorts

    return retention_cohorts(
        _load(spark, sf_dir, "events"), max_offset=30
    )


SQL_RETENTION_COHORTS = """
WITH d AS (SELECT user_id, CAST(ts AS DATE) AS day FROM events),
u AS (SELECT user_id, min(day) AS cohort FROM d GROUP BY 1),
ud AS (SELECT DISTINCT d.user_id, day, cohort
       FROM d JOIN u USING (user_id)),
m AS (SELECT cohort, day - cohort AS off,
             CAST(count(*) AS BIGINT) AS n_active
      FROM ud WHERE day - cohort <= 30 GROUP BY 1, 2)
SELECT strftime(cohort, '%Y-%m-%d') AS cohort,
       CAST(off AS BIGINT) AS "offset",
       n_active,
       max(CASE WHEN off = 0 THEN n_active END)
         OVER (PARTITION BY cohort) AS n_cohort,
       round(CAST(n_active AS DOUBLE)
             / (max(CASE WHEN off = 0 THEN n_active END)
                OVER (PARTITION BY cohort)), 6) AS retention
FROM m
"""


_KB_BIN, _KB_S, _KB_G = 3600, 2.0, 2.0


def q_kleinberg_bursts(spark, sf_dir):
    """Two-state burst detection on hourly event counts per type
    (Kleinberg KDD 2002 structure, Gaussian emission cost so the
    Viterbi DP is exact IEEE arithmetic — no transcendental whose
    1-ULP cross-engine difference could flip an argmin).  The DuckDB
    twin replays the forward DP and the traceback with recursive CTEs
    carrying the same decision lists, bit-for-bit."""
    from .operators.eventflow import kleinberg_bursts

    return kleinberg_bursts(
        _load(spark, sf_dir, "events"),
        bin_seconds=_KB_BIN,
        s=_KB_S,
        gamma=_KB_G,
    )


SQL_KLEINBERG_BURSTS = f"""
WITH RECURSIVE
c AS (SELECT event_type AS key,
             CAST(floor(epoch(ts) / {_KB_BIN}) * {_KB_BIN} AS BIGINT)
               AS bin,
             CAST(count(*) AS DOUBLE) AS x
      FROM events GROUP BY 1, 2),
sp AS (SELECT key, min(bin) AS b0, max(bin) AS b1, sum(x) AS total,
              CAST((max(bin) - min(bin)) // {_KB_BIN} + 1 AS BIGINT) AS n
       FROM c GROUP BY 1),
rt AS (SELECT key, b0, n, total / CAST(n AS DOUBLE) AS r0,
              total / CAST(n AS DOUBLE) * {_KB_S!r} AS r1
       FROM sp),
gx AS (SELECT rt.key, rt.b0, rt.n, rt.r0, rt.r1,
              {_KB_G!r} * (rt.r1 - rt.r0) * (rt.r1 - rt.r0) AS trans,
              i.i, coalesce(c.x, 0.0) AS x
       FROM rt
       CROSS JOIN LATERAL (SELECT unnest(range(rt.n)) AS i) i
       LEFT JOIN c ON c.key = rt.key
                  AND c.bin = rt.b0 + i.i * {_KB_BIN}),
dp AS (
  SELECT key, CAST(0 AS BIGINT) AS t,
         (x - r0) * (x - r0) AS c0,
         (x - r1) * (x - r1) + 1.0e30 AS c1,
         [0] AS d0, [0] AS d1
  FROM gx WHERE i = 0
  UNION ALL
  SELECT gx.key, dp.t + 1,
         (gx.x - gx.r0) * (gx.x - gx.r0)
           + (CASE WHEN dp.c0 <= dp.c1 THEN dp.c0 ELSE dp.c1 END),
         (gx.x - gx.r1) * (gx.x - gx.r1)
           + (CASE WHEN dp.c0 + gx.trans <= dp.c1
                   THEN dp.c0 + gx.trans ELSE dp.c1 END),
         list_append(dp.d0, CASE WHEN dp.c0 <= dp.c1 THEN 0 ELSE 1 END),
         list_append(dp.d1, CASE WHEN dp.c0 + gx.trans <= dp.c1
                                 THEN 0 ELSE 1 END)
  FROM dp JOIN gx ON gx.key = dp.key AND gx.i = dp.t + 1),
fin AS (SELECT dp.key, dp.t, dp.c0, dp.c1, dp.d0, dp.d1
        FROM dp JOIN sp ON sp.key = dp.key AND dp.t = sp.n - 1),
tb AS (
  SELECT key, t, CASE WHEN c0 <= c1 THEN 0 ELSE 1 END AS st, d0, d1
  FROM fin
  UNION ALL
  SELECT key, t - 1,
         CASE WHEN st = 0 THEN d0[CAST(t AS INT) + 1]
              ELSE d1[CAST(t AS INT) + 1] END,
         d0, d1
  FROM tb WHERE t > 0),
mk AS (SELECT key, t, st,
              CASE WHEN lag(st) OVER w IS NULL
                     OR lag(st) OVER w <> st THEN 1 ELSE 0 END AS brk
       FROM tb WINDOW w AS (PARTITION BY key ORDER BY t)),
isl AS (SELECT key, t, st,
               sum(brk) OVER (PARTITION BY key ORDER BY t) AS grp
        FROM mk),
runs AS (SELECT key, grp, min(t) AS ti, max(t) AS tj
         FROM isl WHERE st = 1 GROUP BY 1, 2)
SELECT runs.key AS event_type,
       CAST(rt.b0 + ti * {_KB_BIN} AS BIGINT) AS burst_start,
       CAST(rt.b0 + tj * {_KB_BIN} AS BIGINT) AS burst_end,
       CAST(tj - ti + 1 AS BIGINT) AS n_bins,
       CAST(sum(gx.x) AS BIGINT) AS total_count,
       CAST(max(gx.x) AS BIGINT) AS peak_count
FROM runs
JOIN rt ON rt.key = runs.key
JOIN gx ON gx.key = runs.key AND gx.i BETWEEN ti AND tj
GROUP BY 1, 2, 3, 4
"""


# ---- round-5 fourth-continuation additions --------------------------


def q_mann_kendall(spark, sf_dir):
    """Mann-Kendall monotonic-trend test per 60-wide bin: S statistic
    via merge-counted inversions (never an O(m^2) pair set), tie-
    corrected variance, continuity-corrected z, and the 5% two-sided
    verdict.  The nonparametric companion to theil_sen_trend's slope;
    one narrow row per bin, one shuffle."""
    out = analyses.mann_kendall_bins(
        series(spark, sf_dir), every=60, key_cols=["source", "doc_id"]
    )
    return out.select(
        "source", "doc_id", "bin_start", "n", "s_stat", "tie_pairs",
        _r(F.col("var_s")).alias("var_s"),
        _r(F.col("z")).alias("z"),
        "trend",
    )


SQL_MANN_KENDALL = f"""
WITH series AS ({SERIES_SQL}),
pts AS (SELECT source, doc_id,
               CAST(floor(pos / 60) AS BIGINT) * 60 AS bin_start,
               CAST(pos AS BIGINT) AS x, value AS v
        FROM series WHERE value IS NOT NULL),
s AS (
  SELECT a.source, a.doc_id, a.bin_start,
         CAST(sum(CASE WHEN b.v > a.v THEN 1
                       WHEN b.v < a.v THEN -1 ELSE 0 END) AS BIGINT)
           AS s_stat
  FROM pts a JOIN pts b
    ON a.source = b.source AND a.doc_id = b.doc_id
   AND a.bin_start = b.bin_start AND a.x < b.x
  GROUP BY 1, 2, 3),
tg AS (SELECT source, doc_id, bin_start, v, CAST(count(*) AS BIGINT) AS t
       FROM pts GROUP BY 1, 2, 3, 4),
tt AS (SELECT source, doc_id, bin_start,
              CAST(sum(t) AS BIGINT) AS n,
              CAST(sum(t * (t - 1) / 2) AS BIGINT) AS tie_pairs,
              sum(CAST(t AS DOUBLE) * (t - 1) * (2 * t + 5)) AS tie_term
       FROM tg GROUP BY 1, 2, 3),
z AS (
  SELECT tt.source, tt.doc_id, tt.bin_start, tt.n, s.s_stat, tt.tie_pairs,
         (CAST(tt.n AS DOUBLE) * (tt.n - 1) * (2 * tt.n + 5) - tt.tie_term)
           / 18.0 AS var_s
  FROM tt JOIN s USING (source, doc_id, bin_start)
  WHERE tt.n >= 2),
zz AS (
  SELECT *,
         CASE WHEN s_stat > 0 AND var_s > 0
                THEN (s_stat - 1) / sqrt(var_s)
              WHEN s_stat < 0 AND var_s > 0
                THEN (s_stat + 1) / sqrt(var_s)
              ELSE 0.0 END AS zval
  FROM z)
SELECT source, doc_id, bin_start, n, s_stat, tie_pairs,
       round(var_s, 6) AS var_s, round(zval, 6) AS z,
       CASE WHEN zval > 1.959964 THEN 'increasing'
            WHEN zval < -1.959964 THEN 'decreasing'
            ELSE 'no trend' END AS trend
FROM zz
"""


def q_psi_drift(spark, sf_dir):
    """Population Stability Index per source (the standard production
    drift monitor for ML feature pipelines): split every series at its
    midpoint (reference = first half by pos, current = second half),
    bin the reference min..max into 10 equal-width bins, clamp current
    values into them, smooth proportions additively (+0.5 per bin) and
    sum (pc - pr) * ln(pc / pr).  Plan: one per-series window max (no
    extra shuffle beyond the key partition), a tiny per-source
    edges aggregate broadcast back, one groupBy count on
    (source, half, bin), and a 10-bin dense frame so empty bins
    contribute their smoothed mass — scale-safe at any row count
    because everything after the first groupBy is O(sources x 20)."""
    s = series(spark, sf_dir).where(F.col("value").isNotNull())
    w = Window.partitionBy("source", "doc_id")
    s = s.withColumn(
        "_half", F.floor((F.max("pos").over(w) + 1) / 2)
    ).withColumn(
        "half", F.when(F.col("pos") < F.col("_half"), "ref").otherwise("cur")
    )
    edges = (
        s.where(F.col("half") == "ref")
        .groupBy("source")
        .agg(F.min("value").alias("mn"), F.max("value").alias("mx"))
        .withColumn("w", (F.col("mx") - F.col("mn")) / 10.0)
    )
    binned = (
        s.join(F.broadcast(edges), "source")
        .withColumn(
            "bin",
            F.when(F.col("w") <= 0, F.lit(0)).otherwise(
                F.least(
                    F.lit(9),
                    F.greatest(
                        F.lit(0),
                        F.floor((F.col("value") - F.col("mn")) / F.col("w"))
                        .cast("int"),
                    ),
                )
            ),
        )
        .groupBy("source", "half", "bin")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    dense = (
        edges.select("source")
        .select("source", F.explode(F.sequence(F.lit(0), F.lit(9))).alias("bin"))
        .crossJoin(spark.range(1).select(F.explode(F.array(F.lit("ref"), F.lit("cur"))).alias("half")))
    )
    full = dense.join(binned, ["source", "half", "bin"], "left").fillna(
        0, subset=["cnt"]
    )
    tot = full.groupBy("source", "half").agg(F.sum("cnt").alias("n_half"))
    pr = (
        full.join(tot, ["source", "half"])
        .withColumn(
            "p", (F.col("cnt") + 0.5) / (F.col("n_half") + 5.0)
        )
        .groupBy("source", "bin")
        .pivot("half", ["ref", "cur"])
        .agg(F.first("p"))
    )
    psi = pr.groupBy("source").agg(
        F.sum(
            (F.col("cur") - F.col("ref")) * F.log(F.col("cur") / F.col("ref"))
        ).alias("psi")
    )
    nn = tot.groupBy("source").pivot("half", ["ref", "cur"]).agg(
        F.first("n_half")
    )
    out = psi.join(nn, "source").select(
        "source",
        F.col("ref").cast("long").alias("n_ref"),
        F.col("cur").cast("long").alias("n_cur"),
        _r(F.col("psi")).alias("psi"),
        F.when(F.col("psi") < 0.1, "stable")
        .when(F.col("psi") < 0.25, "moderate")
        .otherwise("shifted")
        .alias("verdict"),
    )
    return out


SQL_PSI_DRIFT = f"""
WITH series AS ({SERIES_SQL}),
nn AS (SELECT source, doc_id, pos, value,
              CAST(floor((max(pos) OVER (PARTITION BY source, doc_id) + 1)
                         / 2) AS BIGINT) AS half_at
       FROM series WHERE value IS NOT NULL),
lab AS (SELECT source, value,
               CASE WHEN pos < half_at THEN 'ref' ELSE 'cur' END AS half
        FROM nn),
edges AS (SELECT source, min(value) AS mn, max(value) AS mx,
                 (max(value) - min(value)) / 10.0 AS w
          FROM lab WHERE half = 'ref' GROUP BY 1),
counts AS (
  SELECT l.source, l.half,
         CASE WHEN e.w <= 0 THEN 0
              ELSE least(9, greatest(0,
                   CAST(floor((l.value - e.mn) / e.w) AS INTEGER)))
         END AS bin,
         count(*) AS cnt
  FROM lab l JOIN edges e USING (source)
  GROUP BY 1, 2, 3),
dense AS (
  SELECT e.source, h.half, b.bin
  FROM edges e
  CROSS JOIN (SELECT unnest(['ref', 'cur']) AS half) h
  CROSS JOIN (SELECT unnest(range(0, 10)) AS bin) b),
full_ AS (
  SELECT d.source, d.half, d.bin, coalesce(c.cnt, 0) AS cnt
  FROM dense d LEFT JOIN counts c
    ON d.source = c.source AND d.half = c.half AND d.bin = c.bin),
tot AS (SELECT source, half, sum(cnt) AS n_half
        FROM full_ GROUP BY 1, 2),
p AS (SELECT f.source, f.bin, f.half,
             (f.cnt + 0.5) / (t.n_half + 5.0) AS p
      FROM full_ f JOIN tot t ON f.source = t.source AND f.half = t.half),
pv AS (SELECT source, bin,
              max(CASE WHEN half = 'ref' THEN p END) AS pref,
              max(CASE WHEN half = 'cur' THEN p END) AS pcur
       FROM p GROUP BY 1, 2),
psi AS (SELECT source, sum((pcur - pref) * ln(pcur / pref)) AS psi
        FROM pv GROUP BY 1)
SELECT s.source,
       CAST((SELECT n_half FROM tot t
             WHERE t.source = s.source AND t.half = 'ref') AS BIGINT)
         AS n_ref,
       CAST((SELECT n_half FROM tot t
             WHERE t.source = s.source AND t.half = 'cur') AS BIGINT)
         AS n_cur,
       round(s.psi, 6) AS psi,
       CASE WHEN s.psi < 0.1 THEN 'stable'
            WHEN s.psi < 0.25 THEN 'moderate'
            ELSE 'shifted' END AS verdict
FROM psi s
"""


_SEQ_PATTERNS = [
    # RE2-portable (no lookaround): identical semantics in Java regex
    # (Spark rlike) and RE2 (DuckDB regexp_matches); substring match.
    ("view_then_purchase", "(^|;)view;(.*;)?purchase(;|$)"),
    ("signup_first", "^signup(;|$)"),
    ("error_then_purchase", "(^|;)error;(.*;)?purchase(;|$)"),
    ("double_click", "(^|;)click;click(;|$)"),
]


def q_seq_pattern_match(spark, sf_dir):
    """MATCH_RECOGNIZE-style event-sequence pattern matching: per-user
    30-min sessions (the sessionize_users convention), each session's
    event types concatenated in (ts, event_id) order into one bounded
    string, then counted against a fixed battery of RE2-portable
    regexes.  The per-session string is bounded by session length, so
    the regex scan is row-local and embarrassingly parallel; the only
    shuffles are the sessionize window partition and the final tiny
    aggregate."""
    from .operators.sessions import sessionize

    ev = _load(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id", "event_type"
    )
    s = sessionize(ev, ts_col="ts", key_cols=["user_id"], gap_seconds=1800.0)
    seqs = (
        s.groupBy("user_id", "session_id")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.struct("ts", "event_id", "event_type")
                        )
                    ),
                    lambda r: r["event_type"],
                ),
                ";",
            ).alias("seq")
        )
    )
    aggs = [F.count(F.lit(1)).alias("n_sessions")]
    for name, pat in _SEQ_PATTERNS:
        aggs.append(
            F.sum(
                F.when(F.col("seq").rlike(pat), 1).otherwise(0)
            ).cast("long").alias(name)
        )
    wide = seqs.agg(*aggs)
    stack_expr = ", ".join(f"'{n}', {n}" for n, _ in _SEQ_PATTERNS)
    out = wide.selectExpr(
        "n_sessions",
        f"stack({len(_SEQ_PATTERNS)}, {stack_expr}) AS (pattern, n_matched)",
    )
    return out.select(
        "pattern",
        "n_matched",
        F.col("n_sessions").cast("long").alias("n_sessions"),
        _r(F.col("n_matched") / F.col("n_sessions")).alias("share"),
    )


SQL_SEQ_PATTERN = """
WITH e AS (SELECT user_id, ts, event_id, event_type, epoch(ts) AS ep
           FROM events),
m AS (
  SELECT user_id, ts, event_id, event_type, ep,
         CASE WHEN lag(ep) OVER w IS NULL OR ep - lag(ep) OVER w >= 1800
              THEN 1 ELSE 0 END AS b
  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
s AS (
  SELECT user_id, event_id, event_type, ts,
         sum(b) OVER (PARTITION BY user_id ORDER BY ts
                      ROWS UNBOUNDED PRECEDING) - 1 AS sid
  FROM m),
seqs AS (
  SELECT user_id, sid,
         string_agg(event_type, ';' ORDER BY ts, event_id) AS seq
  FROM s GROUP BY 1, 2),
pats AS (
  SELECT * FROM (VALUES
    ('view_then_purchase', '(^|;)view;(.*;)?purchase(;|$)'),
    ('signup_first', '^signup(;|$)'),
    ('error_then_purchase', '(^|;)error;(.*;)?purchase(;|$)'),
    ('double_click', '(^|;)click;click(;|$)')) AS t(pattern, pat))
SELECT p.pattern,
       CAST(sum(CASE WHEN regexp_matches(q.seq, p.pat) THEN 1 ELSE 0 END)
            AS BIGINT) AS n_matched,
       CAST(count(*) AS BIGINT) AS n_sessions,
       round(sum(CASE WHEN regexp_matches(q.seq, p.pat) THEN 1 ELSE 0 END)
             / CAST(count(*) AS DOUBLE), 6) AS share
FROM pats p CROSS JOIN seqs q
GROUP BY 1
"""


def q_tpch_q5(spark, sf_dir):
    """TPC-H Q5 local-supplier revenue: the canonical snowflake join.
    Spark shape for the 100-TB plan: region->nation->supplier collapse
    into ONE broadcast dim (tiny), lineitem picks up s_nationkey
    map-side with no shuffle; orders joins customer on the custkey
    exchange; the only big-big exchange is lineitem-orders on
    orderkey; the local-supplier predicate (c_nationkey =
    s_nationkey) filters after that join; one small aggregate."""
    region = _load(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    nation = _load(spark, sf_dir, "nation").join(
        F.broadcast(region),
        F.col("n_regionkey") == F.col("r_regionkey"),
    )
    supp = _load(spark, sf_dir, "supplier").join(
        F.broadcast(nation),
        F.col("s_nationkey") == F.col("n_nationkey"),
    ).select("s_suppkey", "s_nationkey", "n_name")
    orders = _load(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-01-01"))
        & (F.col("o_orderdate") < F.lit("1997-01-01"))
    )
    cust = _load(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    oc = orders.join(cust, orders["o_custkey"] == cust["c_custkey"]).select(
        "o_orderkey", "c_nationkey"
    )
    li = _load(spark, sf_dir, "lineitem").join(
        F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey")
    )
    j = li.join(oc, li["l_orderkey"] == oc["o_orderkey"]).where(
        F.col("c_nationkey") == F.col("s_nationkey")
    )
    return (
        j.groupBy("n_name")
        .agg(
            _r(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))
            ).alias("revenue")
        )
        .orderBy(F.col("revenue").desc(), F.col("n_name").asc())
    )


SQL_TPCH_Q5 = """
SELECT n_name,
       round(sum(l_extendedprice * (1 - l_discount)), 6) AS revenue
FROM customer, orders, lineitem, supplier, nation, region
WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
  AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
  AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
  AND r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
GROUP BY 1
ORDER BY 2 DESC, 1 ASC
"""


def q_tpch_q14(spark, sf_dir):
    """TPC-H Q14 promotion-revenue share for one shipping month: the
    classic broadcast-dim scan — lineitem (big, filter pushed to the
    parquet scan) joins part (small dim, broadcast), one global
    aggregate, a single output row.  At 100 TB the part side stays
    broadcastable and the lineitem scan prunes on l_shipdate."""
    li = _load(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1996-09-01"))
        & (F.col("l_shipdate") < F.lit("1996-10-01"))
    )
    part = _load(spark, sf_dir, "part").select("p_partkey", "p_type")
    j = li.join(F.broadcast(part), li["l_partkey"] == part["p_partkey"])
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return j.agg(
        _r(
            F.lit(100.0)
            * F.sum(F.when(F.col("p_type") == "PROMO", rev).otherwise(0.0))
            / F.sum(rev)
        ).alias("promo_revenue_pct"),
        F.count(F.lit(1)).alias("n_items"),
    )


SQL_TPCH_Q14 = """
SELECT round(100.0 * sum(CASE WHEN p_type = 'PROMO'
                              THEN l_extendedprice * (1 - l_discount)
                              ELSE 0.0 END)
             / sum(l_extendedprice * (1 - l_discount)), 6)
         AS promo_revenue_pct,
       CAST(count(*) AS BIGINT) AS n_items
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1996-09-01 00:00:00'
  AND l_shipdate < TIMESTAMP '1996-10-01 00:00:00'
"""


def q_tpch_q10(spark, sf_dir):
    """TPC-H Q10 returned-item reporting (trimmed to this corpus's
    columns): customers who returned items in a quarter, ranked by
    lost revenue, top 20 with a deterministic tie-break.  Spark shape:
    orders filters on the quarter (scan pushdown), lineitem filters on
    returnflag, the two exchange on orderkey; customer joins on the
    custkey exchange and the nation name arrives via broadcast."""
    orders = _load(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-10-01"))
        & (F.col("o_orderdate") < F.lit("1997-01-01"))
    )
    li = _load(spark, sf_dir, "lineitem").where(F.col("l_returnflag") == "R")
    cust = _load(spark, sf_dir, "customer")
    nation = _load(spark, sf_dir, "nation")
    j = (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .join(cust, orders["o_custkey"] == cust["c_custkey"])
        .join(
            F.broadcast(nation),
            cust["c_nationkey"] == nation["n_nationkey"],
        )
    )
    agg = j.groupBy("c_custkey", "c_name", "n_name").agg(
        _r(
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))
        ).alias("revenue"),
        _r(F.max("c_acctbal")).alias("c_acctbal"),
    )
    return agg.orderBy(
        F.col("revenue").desc(), F.col("c_custkey").asc()
    ).limit(20)


SQL_TPCH_Q10 = """
SELECT c_custkey, c_name, n_name,
       round(sum(l_extendedprice * (1 - l_discount)), 6) AS revenue,
       round(max(c_acctbal), 6) AS c_acctbal
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R'
  AND o_orderdate >= TIMESTAMP '1996-10-01 00:00:00'
  AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
GROUP BY 1, 2, 3
ORDER BY round(sum(l_extendedprice * (1 - l_discount)), 6) DESC,
         c_custkey ASC
LIMIT 20
"""


def q_seasonal_mann_kendall(spark, sf_dir):
    """Hirsch-Slack seasonal Mann-Kendall: MK S and tie-corrected
    variance computed independently per season (pos mod 24, the diel
    analog), summed per series — a strong periodic cycle cannot fake a
    monotonic trend.  Built on the merge-count MK kernel with season
    as an extra group key."""
    out = analyses.seasonal_mann_kendall(
        series(spark, sf_dir), period=24, key_cols=["source", "doc_id"]
    )
    return out.select(
        "source", "doc_id", "n", "n_seasons", "s_total",
        _r(F.col("var_total")).alias("var_total"),
        _r(F.col("z")).alias("z"),
        "trend",
    )


SQL_SEASONAL_MK = f"""
WITH series AS ({SERIES_SQL}),
pts AS (SELECT source, doc_id, CAST(pos AS BIGINT) % 24 AS season,
               CAST(pos AS BIGINT) AS x, value AS v
        FROM series WHERE value IS NOT NULL),
s AS (
  SELECT a.source, a.doc_id, a.season,
         CAST(sum(CASE WHEN b.v > a.v THEN 1
                       WHEN b.v < a.v THEN -1 ELSE 0 END) AS BIGINT)
           AS s_stat
  FROM pts a JOIN pts b
    ON a.source = b.source AND a.doc_id = b.doc_id
   AND a.season = b.season AND a.x < b.x
  GROUP BY 1, 2, 3),
tg AS (SELECT source, doc_id, season, v, CAST(count(*) AS BIGINT) AS t
       FROM pts GROUP BY 1, 2, 3, 4),
tt AS (SELECT source, doc_id, season,
              CAST(sum(t) AS BIGINT) AS n,
              sum(CAST(t AS DOUBLE) * (t - 1) * (2 * t + 5)) AS tie_term
       FROM tg GROUP BY 1, 2, 3),
per AS (
  SELECT tt.source, tt.doc_id, tt.n, s.s_stat,
         (CAST(tt.n AS DOUBLE) * (tt.n - 1) * (2 * tt.n + 5) - tt.tie_term)
           / 18.0 AS var_s
  FROM tt JOIN s USING (source, doc_id, season)
  WHERE tt.n >= 2),
comb AS (
  SELECT source, doc_id, CAST(sum(n) AS BIGINT) AS n,
         CAST(count(*) AS BIGINT) AS n_seasons,
         CAST(sum(s_stat) AS BIGINT) AS s_total,
         sum(var_s) AS var_total
  FROM per GROUP BY 1, 2),
zz AS (
  SELECT *,
         CASE WHEN s_total > 0 AND var_total > 0
                THEN (s_total - 1) / sqrt(var_total)
              WHEN s_total < 0 AND var_total > 0
                THEN (s_total + 1) / sqrt(var_total)
              ELSE 0.0 END AS zval
  FROM comb)
SELECT source, doc_id, n, n_seasons, s_total,
       round(var_total, 6) AS var_total, round(zval, 6) AS z,
       CASE WHEN zval > 1.959964 THEN 'increasing'
            WHEN zval < -1.959964 THEN 'decreasing'
            ELSE 'no trend' END AS trend
FROM zz
"""


def q_table_profile(spark, sf_dir):
    """Data-quality profiler over the events table: per column, row
    count, null count, exact distinct count, and the modal value with
    a deterministic (count desc, value asc) tie-break.  Each column's
    profile is a tiny independent aggregate (top-1 via a global
    TakeOrdered on the grouped counts, never a full sort); the double
    column skips the mode (cross-engine float formatting is not part
    of the contract).  At 100 TB you would swap the exact distinct for
    approx_count_distinct — same plan shape, sketch instead of the
    distinct shuffle."""
    ev = _load(spark, sf_dir, "events")

    def prof(colname, with_top=True):
        c = F.col(colname)
        base = ev.agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(F.when(c.isNull(), 1).otherwise(0))
            .cast("long")
            .alias("n_null"),
            F.countDistinct(c).alias("n_distinct"),
        ).select(F.lit(colname).alias("col_name"), "*")
        if not with_top:
            return base.select(
                "*",
                F.lit(None).cast("string").alias("top_value"),
                F.lit(None).cast("long").alias("top_count"),
            )
        top = (
            ev.where(c.isNotNull())
            .groupBy(c.cast("string").alias("top_value"))
            .agg(F.count(F.lit(1)).alias("top_count"))
            .orderBy(F.col("top_count").desc(), F.col("top_value").asc())
            .limit(1)
        )
        return base.crossJoin(top)

    out = (
        prof("event_type")
        .unionByName(prof("user_id"))
        .unionByName(prof("props"))
        .unionByName(prof("value", with_top=False))
    )
    return out


SQL_TABLE_PROFILE = """
WITH
t_et AS (SELECT event_type AS v FROM events WHERE event_type IS NOT NULL
         ),
top_et AS (SELECT v, count(*) AS c FROM t_et GROUP BY 1
           ORDER BY c DESC, v ASC LIMIT 1),
t_uid AS (SELECT CAST(user_id AS VARCHAR) AS v FROM events
          WHERE user_id IS NOT NULL),
top_uid AS (SELECT v, count(*) AS c FROM t_uid GROUP BY 1
            ORDER BY c DESC, v ASC LIMIT 1),
t_pr AS (SELECT props AS v FROM events WHERE props IS NOT NULL),
top_pr AS (SELECT v, count(*) AS c FROM t_pr GROUP BY 1
           ORDER BY c DESC, v ASC LIMIT 1)
SELECT 'event_type' AS col_name, CAST(count(*) AS BIGINT) AS n_rows,
       CAST(sum(CASE WHEN event_type IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_null,
       CAST(count(DISTINCT event_type) AS BIGINT) AS n_distinct,
       (SELECT v FROM top_et) AS top_value,
       CAST((SELECT c FROM top_et) AS BIGINT) AS top_count
FROM events
UNION ALL
SELECT 'user_id', CAST(count(*) AS BIGINT),
       CAST(sum(CASE WHEN user_id IS NULL THEN 1 ELSE 0 END) AS BIGINT),
       CAST(count(DISTINCT user_id) AS BIGINT),
       (SELECT v FROM top_uid),
       CAST((SELECT c FROM top_uid) AS BIGINT)
FROM events
UNION ALL
SELECT 'props', CAST(count(*) AS BIGINT),
       CAST(sum(CASE WHEN props IS NULL THEN 1 ELSE 0 END) AS BIGINT),
       CAST(count(DISTINCT props) AS BIGINT),
       (SELECT v FROM top_pr),
       CAST((SELECT c FROM top_pr) AS BIGINT)
FROM events
UNION ALL
SELECT 'value', CAST(count(*) AS BIGINT),
       CAST(sum(CASE WHEN value IS NULL THEN 1 ELSE 0 END) AS BIGINT),
       CAST(count(DISTINCT value) AS BIGINT),
       NULL, CAST(NULL AS BIGINT)
FROM events
"""


def q_key_skew_gini(spark, sf_dir):
    """Partition-skew diagnostic per event_type: the Gini coefficient
    of per-user row counts plus the hottest key's share — the number
    you check BEFORE keying a shuffle on a column (the engine's salted
    paths exist exactly because this can approach 1).  Gini over the
    ascending count ranking:  G = 2·Σ i·x_i / (n·Σx) - (n+1)/n;
    equal counts make the formula order-invariant, so the (count, key)
    tie-break is deterministic AND immaterial.  One count aggregate,
    one per-source window, one tiny final aggregate."""
    ev = _load(spark, sf_dir, "events")
    counts = ev.groupBy("event_type", "user_id").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    w = Window.partitionBy("event_type").orderBy(
        F.col("cnt").asc(), F.col("user_id").asc()
    )
    ranked = counts.withColumn("i", F.row_number().over(w))
    return (
        ranked.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_keys"),
            F.sum("cnt").cast("long").alias("n_rows"),
            _r(F.max("cnt") / F.sum("cnt")).alias("top_share"),
            _r(
                F.lit(2.0) * F.sum(F.col("i") * F.col("cnt"))
                / (F.count(F.lit(1)) * F.sum("cnt"))
                - (F.count(F.lit(1)) + 1.0) / F.count(F.lit(1))
            ).alias("gini"),
        )
    )


SQL_KEY_SKEW_GINI = """
WITH counts AS (
  SELECT event_type, user_id, count(*) AS cnt
  FROM events GROUP BY 1, 2),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY event_type
                               ORDER BY cnt ASC, user_id ASC) AS i
  FROM counts)
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n_keys,
       CAST(sum(cnt) AS BIGINT) AS n_rows,
       round(max(cnt) / CAST(sum(cnt) AS DOUBLE), 6) AS top_share,
       round(2.0 * sum(i * cnt) / (count(*) * CAST(sum(cnt) AS DOUBLE))
             - (count(*) + 1.0) / count(*), 6) AS gini
FROM ranked GROUP BY 1
"""


def q_tpch_q18(spark, sf_dir):
    """TPC-H Q18 large-volume customers: orders whose total quantity
    exceeds a threshold.  Spark shape: the lineitem self-aggregate
    (map-side partials on orderkey) filters FIRST, and the surviving
    tiny set of big orders BROADCASTS into orders and customer — the
    canonical aggregate-then-semi-join plan; no row of orders ever
    shuffles for an order that fails the HAVING."""
    li = _load(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("total_qty"))
        .where(F.col("total_qty") > 250.0)
    )
    orders = _load(spark, sf_dir, "orders")
    cust = _load(spark, sf_dir, "customer").select("c_custkey", "c_name")
    j = orders.join(
        F.broadcast(big), orders["o_orderkey"] == big["l_orderkey"]
    ).join(cust, orders["o_custkey"] == cust["c_custkey"])
    return (
        j.select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_orderdate"),
            _r(F.col("o_totalprice")).alias("o_totalprice"),
            _r(F.col("total_qty")).alias("total_qty"),
        )
        .orderBy(
            F.col("o_totalprice").desc(), F.col("o_orderkey").asc()
        )
        .limit(100)
    )


SQL_TPCH_Q18 = """
WITH big AS (
  SELECT l_orderkey, sum(l_quantity) AS total_qty
  FROM lineitem GROUP BY 1 HAVING sum(l_quantity) > 250)
SELECT c_name, c_custkey, o_orderkey,
       strftime(CAST(o_orderdate AS DATE), '%Y-%m-%d') AS o_orderdate,
       round(o_totalprice, 6) AS o_totalprice,
       round(b.total_qty, 6) AS total_qty
FROM big b
JOIN orders ON o_orderkey = b.l_orderkey
JOIN customer ON c_custkey = o_custkey
ORDER BY round(o_totalprice, 6) DESC, o_orderkey ASC
LIMIT 100
"""


def q_rrf_fusion(spark, sf_dir):
    """Reciprocal-rank fusion of two exact rankings (cosine and
    Euclidean) per query vector — the standard retrieval combiner when
    two scorers disagree.  Ranks are over 6-dp-rounded scores with an
    id tie-break, so the fused top-10 is engine-portable; rrf is a sum
    of exact reciprocals of small integers."""
    emb = _load(spark, sf_dir, "embeddings")
    out = similarity.rrf_fusion_topk(
        emb, emb.where(F.col("vec_id").isin([0, 7, 13])), k=10
    )
    return out.select(
        "query_id", "vec_id", "fused_rank", "r_cos", "r_l2",
        _r(F.col("rrf")).alias("rrf_score"),
    )


SQL_RRF_FUSION = """
WITH q AS (SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qe
           FROM embeddings WHERE vec_id IN (0, 7, 13)),
sc AS (
  SELECT q.query_id, e.vec_id,
         round(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), q.qe),
               6) AS cos,
         round(list_distance(CAST(e.embedding AS DOUBLE[]), q.qe), 6) AS l2
  FROM embeddings e, q WHERE e.vec_id <> q.query_id),
rk AS (
  SELECT *,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY cos DESC, vec_id ASC) AS r_cos,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY l2 ASC, vec_id ASC) AS r_l2
  FROM sc),
f AS (SELECT *, 1.0 / (60 + r_cos) + 1.0 / (60 + r_l2) AS rrf FROM rk),
fr AS (
  SELECT *, row_number() OVER (PARTITION BY query_id
                               ORDER BY rrf DESC, vec_id ASC) AS fused_rank
  FROM f)
SELECT query_id, vec_id, fused_rank, r_cos, r_l2,
       round(rrf, 6) AS rrf_score
FROM fr WHERE fused_rank <= 10
"""


def q_dgim_window_count(spark, sf_dir):
    """DGIM O(log^2 W) sliding-window count of above-threshold
    readings (Datar et al. 2002) as a self-verifying oracle: per
    series the sketch folds the bit stream and, at every 60th
    position, its estimate is checked against the exact count over
    the trailing 128 positions under the sketch's own deterministic
    bound floor(oldest_bucket/2).  Integer totals (the DuckDB twin
    recomputes sum_exact from the raw rows) + invariant booleans."""
    out = analyses.dgim_window_count(
        series(spark, sf_dir), window=128, check_every=60,
        threshold=10.0, key_cols=["source", "doc_id"],
    )
    return out.select(
        "source", "doc_id", "n_checks", "sum_exact",
        "all_within_bound", "buckets_bounded",
    )


SQL_DGIM_WINDOW = f"""
WITH series AS ({SERIES_SQL}),
bits AS (SELECT source, doc_id, CAST(pos AS BIGINT) AS pos,
                CASE WHEN value IS NOT NULL AND value >= 10.0
                     THEN 1 ELSE 0 END AS b
         FROM series),
wc AS (SELECT source, doc_id, pos,
              sum(b) OVER (PARTITION BY source, doc_id ORDER BY pos
                           RANGE BETWEEN 127 PRECEDING
                                     AND CURRENT ROW) AS ex
       FROM bits)
SELECT source, doc_id, CAST(count(*) AS BIGINT) AS n_checks,
       CAST(sum(ex) AS BIGINT) AS sum_exact,
       TRUE AS all_within_bound, TRUE AS buckets_bounded
FROM wc WHERE pos % 60 = 0 GROUP BY 1, 2
"""


def q_arch_lm(spark, sf_dir):
    """Engle's ARCH-LM test at lag 1 (Engle 1982): volatility
    clustering shows up as autocorrelation in SQUARED deviations, so
    LM = n_pairs * corr(a_t, a_{t-1})^2 with a_t = (x_t - mean)^2
    against the chi-square(1) 5% critical value.  One window pass for
    the centering mean and the lag, one aggregate — running sums only,
    no kernel."""
    s = series(spark, sf_dir).where(F.col("value").isNotNull())
    wk = Window.partitionBy("source", "doc_id")
    wo = wk.orderBy("pos")
    a = s.withColumn(
        "a", F.pow(F.col("value") - F.avg("value").over(wk), 2)
    ).withColumn("a_prev", F.lag("a").over(wo))
    out = (
        a.where(F.col("a_prev").isNotNull())
        .groupBy("source", "doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_pairs"),
            (F.count(F.lit(1)) * F.pow(F.corr("a", "a_prev"), 2)).alias(
                "_lm"
            ),
        )
    )
    return out.select(
        "source", "doc_id", "n_pairs",
        _r(F.col("_lm")).alias("lm"),
        F.when(F.col("_lm") > 3.841459, "arch")
        .otherwise("homoskedastic")
        .alias("verdict"),
    )


SQL_ARCH_LM = f"""
WITH series AS ({SERIES_SQL}),
nn AS (SELECT source, doc_id, pos, value FROM series
       WHERE value IS NOT NULL),
a AS (SELECT source, doc_id, pos,
             pow(value - avg(value) OVER (PARTITION BY source, doc_id), 2)
               AS a
      FROM nn),
p AS (SELECT source, doc_id, a,
             lag(a) OVER (PARTITION BY source, doc_id ORDER BY pos)
               AS a_prev
      FROM a),
lm AS (SELECT source, doc_id,
              CAST(count(*) AS BIGINT) AS n_pairs,
              count(*) * pow(corr(a, a_prev), 2) AS lm
       FROM p WHERE a_prev IS NOT NULL GROUP BY 1, 2)
SELECT source, doc_id, n_pairs, round(lm, 6) AS lm,
       CASE WHEN lm > 3.841459 THEN 'arch'
            ELSE 'homoskedastic' END AS verdict
FROM lm
"""


def q_runs_test(spark, sf_dir):
    """Wald-Wolfowitz runs test per series: readings are signed
    against the exact series median (ties with the median are
    excluded, the standard convention), runs of constant sign are
    counted with one lag, and the normal approximation
    z = (R - mean) / sd flags non-randomness.  Exact percentile for
    the median, one ordered window, one aggregate."""
    s = series(spark, sf_dir).where(F.col("value").isNotNull())
    wk = Window.partitionBy("source", "doc_id")
    med = s.withColumn(
        "_med", F.percentile("value", F.lit(0.5)).over(wk)
    ).where(F.col("value") != F.col("_med"))
    wo = Window.partitionBy("source", "doc_id").orderBy("pos")
    signed = med.withColumn(
        "s", (F.col("value") > F.col("_med")).cast("int")
    ).withColumn("s_prev", F.lag("s").over(wo))
    agg = signed.groupBy("source", "doc_id").agg(
        F.sum("s").cast("long").alias("n1"),
        F.sum(1 - F.col("s")).cast("long").alias("n2"),
        (
            1
            + F.sum(
                F.when(
                    F.col("s_prev").isNotNull()
                    & (F.col("s") != F.col("s_prev")),
                    1,
                ).otherwise(0)
            )
        ).cast("long").alias("runs"),
    )
    n1, n2 = F.col("n1").cast("double"), F.col("n2").cast("double")
    nn = n1 + n2
    mean_r = 2.0 * n1 * n2 / nn + 1.0
    var_r = (
        2.0 * n1 * n2 * (2.0 * n1 * n2 - n1 - n2)
        / (nn * nn * (nn - 1.0))
    )
    z = F.when(var_r > 0, (F.col("runs") - mean_r) / F.sqrt(var_r)).otherwise(
        F.lit(0.0)
    )
    return agg.where((F.col("n1") > 0) & (F.col("n2") > 0)).select(
        "source", "doc_id", "n1", "n2", "runs",
        _r(z).alias("z"),
        F.when(F.abs(z) > 1.959964, "non-random")
        .otherwise("random")
        .alias("verdict"),
    )


SQL_RUNS_TEST = f"""
WITH series AS ({SERIES_SQL}),
nn AS (SELECT source, doc_id, pos, value FROM series
       WHERE value IS NOT NULL),
m AS (SELECT source, doc_id, pos, value,
             quantile_cont(value, 0.5)
               OVER (PARTITION BY source, doc_id) AS med
      FROM nn),
sgn AS (SELECT source, doc_id, pos,
               CASE WHEN value > med THEN 1 ELSE 0 END AS s
        FROM m WHERE value <> med),
lagd AS (SELECT source, doc_id, s,
                lag(s) OVER (PARTITION BY source, doc_id ORDER BY pos)
                  AS s_prev
         FROM sgn),
agg AS (SELECT source, doc_id,
               CAST(sum(s) AS BIGINT) AS n1,
               CAST(sum(1 - s) AS BIGINT) AS n2,
               CAST(1 + sum(CASE WHEN s_prev IS NOT NULL AND s <> s_prev
                                 THEN 1 ELSE 0 END) AS BIGINT) AS runs
        FROM lagd GROUP BY 1, 2),
zz AS (
  SELECT *,
         2.0 * n1 * n2 / (n1 + n2) + 1.0 AS mean_r,
         2.0 * n1 * n2 * (2.0 * n1 * n2 - n1 - n2)
           / (CAST(n1 + n2 AS DOUBLE) * (n1 + n2) * (n1 + n2 - 1.0))
           AS var_r
  FROM agg WHERE n1 > 0 AND n2 > 0)
SELECT source, doc_id, n1, n2, runs,
       round(CASE WHEN var_r > 0 THEN (runs - mean_r) / sqrt(var_r)
                  ELSE 0.0 END, 6) AS z,
       CASE WHEN abs(CASE WHEN var_r > 0 THEN (runs - mean_r) / sqrt(var_r)
                          ELSE 0.0 END) > 1.959964
            THEN 'non-random' ELSE 'random' END AS verdict
FROM zz
"""


def q_turning_points(spark, sf_dir):
    """Turning-points randomness test: count strict local extrema
    (prev < v > next or prev > v < next) over the non-null readings;
    under i.i.d. randomness E[T] = 2(n-2)/3 and Var[T] = (16n-29)/90
    (Kendall & Stuart), z-scored.  One lag + one lead on a single
    ordered window, one aggregate."""
    s = series(spark, sf_dir).where(F.col("value").isNotNull())
    wo = Window.partitionBy("source", "doc_id").orderBy("pos")
    t = s.withColumn("prev", F.lag("value").over(wo)).withColumn(
        "next", F.lead("value").over(wo)
    )
    is_tp = (
        F.col("prev").isNotNull()
        & F.col("next").isNotNull()
        & (
            ((F.col("prev") < F.col("value")) & (F.col("value") > F.col("next")))
            | ((F.col("prev") > F.col("value")) & (F.col("value") < F.col("next")))
        )
    ).cast("int")
    agg = t.groupBy("source", "doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(is_tp).cast("long").alias("tp"),
    )
    n = F.col("n").cast("double")
    mean_t = 2.0 * (n - 2.0) / 3.0
    var_t = (16.0 * n - 29.0) / 90.0
    z = F.when(
        (F.col("n") >= 3) & (var_t > 0),
        (F.col("tp") - mean_t) / F.sqrt(var_t),
    ).otherwise(F.lit(0.0))
    return agg.where(F.col("n") >= 3).select(
        "source", "doc_id", "n", "tp",
        _r(z).alias("z"),
        F.when(F.abs(z) > 1.959964, "non-random")
        .otherwise("random")
        .alias("verdict"),
    )


SQL_TURNING_POINTS = f"""
WITH series AS ({SERIES_SQL}),
nn AS (SELECT source, doc_id, pos, value FROM series
       WHERE value IS NOT NULL),
t AS (SELECT source, doc_id, value,
             lag(value) OVER w AS prev, lead(value) OVER w AS next
      FROM nn WINDOW w AS (PARTITION BY source, doc_id ORDER BY pos)),
agg AS (SELECT source, doc_id,
               CAST(count(*) AS BIGINT) AS n,
               CAST(sum(CASE WHEN prev IS NOT NULL AND next IS NOT NULL
                              AND ((prev < value AND value > next)
                                OR (prev > value AND value < next))
                             THEN 1 ELSE 0 END) AS BIGINT) AS tp
        FROM t GROUP BY 1, 2),
zz AS (
  SELECT *, 2.0 * (n - 2.0) / 3.0 AS mean_t,
         (16.0 * n - 29.0) / 90.0 AS var_t
  FROM agg WHERE n >= 3)
SELECT source, doc_id, n, tp,
       round(CASE WHEN var_t > 0 THEN (tp - mean_t) / sqrt(var_t)
                  ELSE 0.0 END, 6) AS z,
       CASE WHEN abs(CASE WHEN var_t > 0 THEN (tp - mean_t) / sqrt(var_t)
                          ELSE 0.0 END) > 1.959964
            THEN 'non-random' ELSE 'random' END AS verdict
FROM zz
"""


def q_benford_digits(spark, sf_dir):
    """Benford first-digit conformance per order priority: the classic
    fabricated-data screen.  First digits come from the INTEGER part
    of o_totalprice via string math (identical across engines — no
    float log10 edge cases), observed counts chi-square against
    n * log10(1 + 1/d) over a dense 1..9 digit frame, df = 8.  One
    narrow groupBy and a 9-row-per-group combine."""
    orders = _load(spark, sf_dir, "orders").where(F.col("o_totalprice") >= 1.0)
    digits = orders.select(
        "o_orderpriority",
        F.substring(
            F.floor(F.col("o_totalprice")).cast("long").cast("string"), 1, 1
        )
        .cast("int")
        .alias("d"),
    )
    counts = digits.groupBy("o_orderpriority", "d").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    dense = (
        counts.select("o_orderpriority")
        .distinct()
        .select(
            "o_orderpriority",
            F.explode(F.sequence(F.lit(1), F.lit(9))).alias("d"),
        )
    )
    full = dense.join(counts, ["o_orderpriority", "d"], "left").fillna(
        0, subset=["cnt"]
    )
    wt = Window.partitionBy("o_orderpriority")
    chi = full.withColumn("n", F.sum("cnt").over(wt)).withColumn(
        "exp",
        F.col("n") * F.log10(1.0 + 1.0 / F.col("d")),
    )
    out = chi.groupBy("o_orderpriority").agg(
        F.max("n").cast("long").alias("n"),
        F.sum(
            F.pow(F.col("cnt") - F.col("exp"), 2) / F.col("exp")
        ).alias("_chi2"),
    )
    return out.select(
        F.col("o_orderpriority"),
        "n",
        _r(F.col("_chi2")).alias("chi2"),
        F.when(F.col("_chi2") > 15.507313, "non-benford")
        .otherwise("benford")
        .alias("verdict"),
    )


SQL_BENFORD = """
WITH digits AS (
  SELECT o_orderpriority,
         CAST(substr(CAST(CAST(floor(o_totalprice) AS BIGINT) AS VARCHAR),
                     1, 1) AS INTEGER) AS d
  FROM orders WHERE o_totalprice >= 1.0),
counts AS (SELECT o_orderpriority, d, count(*) AS cnt
           FROM digits GROUP BY 1, 2),
dense AS (
  SELECT p.o_orderpriority, b.d
  FROM (SELECT DISTINCT o_orderpriority FROM counts) p
  CROSS JOIN (SELECT unnest(range(1, 10)) AS d) b),
full_ AS (
  SELECT de.o_orderpriority, de.d, coalesce(c.cnt, 0) AS cnt
  FROM dense de LEFT JOIN counts c
    ON de.o_orderpriority = c.o_orderpriority AND de.d = c.d),
chi AS (
  SELECT o_orderpriority, d, cnt,
         sum(cnt) OVER (PARTITION BY o_orderpriority) AS n,
         sum(cnt) OVER (PARTITION BY o_orderpriority)
           * log10(1.0 + 1.0 / d) AS exp
  FROM full_)
SELECT o_orderpriority, CAST(max(n) AS BIGINT) AS n,
       round(sum(pow(cnt - exp, 2) / exp), 6) AS chi2,
       CASE WHEN sum(pow(cnt - exp, 2) / exp) > 15.507313
            THEN 'non-benford' ELSE 'benford' END AS verdict
FROM chi GROUP BY 1
"""


def q_spectral_entropy(spark, sf_dir):
    """Normalized spectral entropy over the first 24 Fourier
    frequencies (tsfeatures' forecastability measure): 0 = one
    dominant cycle, 1 = flat white-noise band.  Same explode-free
    direct-DFT array fold as dft_power_peak; verdict at 0.5."""
    out = spectral.spectral_entropy(
        series(spark, sf_dir), max_k=_DFT_K, key_cols=["source", "doc_id"]
    )
    return out.select(
        "source", "doc_id", "n", "k_used",
        _r(F.col("entropy")).alias("entropy"),
        F.when(F.col("entropy") < 0.5, "periodic")
        .when(F.col("entropy").isNotNull(), "noisy")
        .alias("verdict"),
    )


SQL_SPECTRAL_ENTROPY = f"""
WITH series AS ({SERIES_SQL}),
pts AS (SELECT source, doc_id, pos, value FROM series
        WHERE value IS NOT NULL),
idx AS (SELECT source, doc_id,
               CAST(row_number() OVER (PARTITION BY source, doc_id
                                       ORDER BY pos) AS BIGINT) - 1 AS i,
               value
        FROM pts),
nn AS (SELECT source, doc_id, CAST(count(*) AS BIGINT) AS n,
              avg(value) AS mu
       FROM idx GROUP BY 1, 2),
ks AS (SELECT source, doc_id, n, mu,
              unnest(range(1, least({_DFT_K}, n // 2) + 1)) AS k
       FROM nn WHERE n >= 4),
sums AS (
  SELECT ks.source, ks.doc_id, ks.n, ks.k,
         sum((idx.value - ks.mu)
             * cos((({_TWO_PI_LIT!r} * CAST(ks.k AS DOUBLE)) / ks.n)
                   * CAST(idx.i AS DOUBLE))) AS cs,
         sum((idx.value - ks.mu)
             * sin((({_TWO_PI_LIT!r} * CAST(ks.k AS DOUBLE)) / ks.n)
                   * CAST(idx.i AS DOUBLE))) AS sn
  FROM ks JOIN idx USING (source, doc_id)
  GROUP BY 1, 2, 3, 4),
pk AS (SELECT source, doc_id, k, cs * cs + sn * sn AS p FROM sums),
tot AS (SELECT source, doc_id, CAST(count(*) AS BIGINT) AS k_used,
               sum(p) AS total
        FROM pk GROUP BY 1, 2),
ent AS (
  SELECT pk.source, pk.doc_id,
         CASE WHEN t.total > 0 AND t.k_used >= 2 THEN
           -sum(CASE WHEN pk.p > 0
                     THEN (pk.p / t.total) * ln(pk.p / t.total)
                     ELSE 0.0 END) / ln(CAST(t.k_used AS DOUBLE))
         END AS h
  FROM pk JOIN tot t USING (source, doc_id)
  GROUP BY 1, 2, t.total, t.k_used)
SELECT nn.source, nn.doc_id, nn.n, t.k_used,
       round(e.h, 6) AS entropy,
       CASE WHEN e.h < 0.5 THEN 'periodic'
            WHEN e.h IS NOT NULL THEN 'noisy' END AS verdict
FROM nn
LEFT JOIN tot t USING (source, doc_id)
LEFT JOIN ent e USING (source, doc_id)
"""


def q_cointegration_pairs(spark, sf_dir):
    """Discovery -> mean reversion: the top-3 most-correlated doc
    pairs per source get the Engle-Granger two-step — closed-form OLS
    residuals, then a driftless Dickey-Fuller t on consecutive
    residuals — flagging pairs whose spread is stationary.  Moment
    sums and broadcast coefficient joins only; no solver, no UDF."""
    tc = spectral.top_correlated_pairs(
        series(spark, sf_dir), top_k=3, min_overlap=30,
        key_cols=["source", "doc_id"],
    )
    out = spectral.cointegration_pairs(
        series(spark, sf_dir),
        tc.select("source", "doc_a", "doc_b"),
        key_cols=["source", "doc_id"],
        min_overlap=30,
    )
    return out.select(
        "source", "doc_a", "doc_b", "n",
        _r(F.col("rho")).alias("rho"),
        _r(F.col("df_t")).alias("df_t"),
        "verdict",
    )


SQL_COINTEGRATION = f"""
WITH series AS ({SERIES_SQL}),
pts AS (SELECT source, doc_id, pos, value FROM series
        WHERE value IS NOT NULL),
pr AS (SELECT a.source, a.doc_id AS doc_a, b.doc_id AS doc_b,
              CAST(count(*) AS BIGINT) AS n_overlap,
              sum(a.value) AS sa, sum(b.value) AS sb,
              sum(a.value * b.value) AS sab,
              sum(a.value * a.value) AS saa,
              sum(b.value * b.value) AS sbb
       FROM pts a JOIN pts b
         ON a.source = b.source AND a.pos = b.pos
        AND a.doc_id < b.doc_id
       GROUP BY 1, 2, 3),
rr AS (SELECT *,
              CASE WHEN n_overlap >= 30
                    AND n_overlap * saa - sa * sa > 0
                    AND n_overlap * sbb - sb * sb > 0
                   THEN (n_overlap * sab - sa * sb)
                        / sqrt((n_overlap * saa - sa * sa)
                               * (n_overlap * sbb - sb * sb)) END AS r
       FROM pr),
rk AS (SELECT *,
              row_number() OVER (PARTITION BY source
                                 ORDER BY round(abs(r), 6) DESC,
                                          doc_a ASC, doc_b ASC) AS rank
       FROM rr WHERE r IS NOT NULL),
pairs AS (SELECT source, doc_a, doc_b FROM rk WHERE rank <= 3),
al AS (SELECT p.source, p.doc_a, p.doc_b, a.pos,
              a.value AS y, b.value AS x
       FROM pairs p
       JOIN pts a ON a.source = p.source AND a.doc_id = p.doc_a
       JOIN pts b ON b.source = p.source AND b.doc_id = p.doc_b
                 AND b.pos = a.pos),
mom AS (SELECT source, doc_a, doc_b, CAST(count(*) AS BIGINT) AS n,
               sum(x) AS sx, sum(y) AS sy,
               sum(x * x) AS sxx, sum(x * y) AS sxy
        FROM al GROUP BY 1, 2, 3),
coef AS (
  SELECT source, doc_a, doc_b, n,
         (sxy - sx * sy / CAST(n AS DOUBLE))
           / (sxx - sx * sx / CAST(n AS DOUBLE)) AS beta,
         (sy - ((sxy - sx * sy / CAST(n AS DOUBLE))
                / (sxx - sx * sx / CAST(n AS DOUBLE))) * sx)
           / CAST(n AS DOUBLE) AS alpha
  FROM mom
  WHERE n >= 30 AND sxx - sx * sx / CAST(n AS DOUBLE) > 0),
res AS (SELECT al.source, al.doc_a, al.doc_b, al.pos, c.n,
               al.y - c.alpha - c.beta * al.x AS e
        FROM al JOIN coef c USING (source, doc_a, doc_b)),
lg AS (SELECT *, lag(e) OVER (PARTITION BY source, doc_a, doc_b
                              ORDER BY pos) AS e1
       FROM res),
dd AS (SELECT source, doc_a, doc_b, n, e - e1 AS de, e1
       FROM lg WHERE e1 IS NOT NULL),
ag AS (SELECT source, doc_a, doc_b, max(n) AS n,
              CAST(count(*) AS BIGINT) AS m,
              sum(e1 * de) AS s1d, sum(e1 * e1) AS s11,
              sum(de * de) AS sdd
       FROM dd GROUP BY 1, 2, 3),
zz AS (SELECT *, CASE WHEN s11 > 0 THEN s1d / s11 END AS rho FROM ag),
tt AS (SELECT *,
              CASE WHEN s11 > 0 AND m > 1
                    AND sdd - rho * rho * s11 > 0
                   THEN rho / sqrt(((sdd - rho * rho * s11)
                                    / (CAST(m AS DOUBLE) - 1.0)) / s11)
              END AS t
       FROM zz)
SELECT source, doc_a, doc_b, n, round(rho, 6) AS rho,
       round(t, 6) AS df_t,
       CASE WHEN t < -3.34 THEN 'cointegrated'
            ELSE 'no-cointegration' END AS verdict
FROM tt
"""


def q_isotonic_fit(spark, sf_dir):
    """Isotonic regression per series via Pool-Adjacent-Violators as a
    self-verifying oracle: the PAVA kernel's output is checked
    IN-QUERY against the three-part uniqueness characterization of the
    isotonic least-squares fit — (1) fitted non-decreasing, (2) every
    maximal constant block's value equals its block mean, (3) no block
    split improves the fit (every proper prefix mean >= block mean).
    The DuckDB twin recomputes the engine-independent totals (n and
    the sum, which PAVA preserves) and hashes the expected booleans."""
    from .operators.fits import isotonic_fit

    fit = isotonic_fit(series(spark, sf_dir), key_cols=["source", "doc_id"])
    wo = Window.partitionBy("source", "doc_id").orderBy("pos")
    f = fit.withColumn("_pf", F.lag("fitted").over(wo))
    f = f.withColumn(
        "_chg", F.when(F.col("_pf").isNull()
                       | (F.col("fitted") != F.col("_pf")), 1).otherwise(0)
    ).withColumn(
        "_mono",
        F.when(F.col("_pf").isNull()
               | (F.col("fitted") >= F.col("_pf") - 1e-9), 1).otherwise(0),
    ).withColumn("_blk", F.sum("_chg").over(wo))
    wb = Window.partitionBy("source", "doc_id", "_blk").orderBy("pos")
    f = f.withColumn("_rs", F.sum("value").over(wb)).withColumn(
        "_rc", F.count(F.lit(1)).over(wb)
    ).withColumn(
        "_prefix_ok",
        F.when(
            F.col("_rs") / F.col("_rc") >= F.col("fitted") - 1e-6, 1
        ).otherwise(0),
    )
    blocks = f.groupBy("source", "doc_id", "_blk").agg(
        F.sum("value").alias("_bsum"),
        F.count(F.lit(1)).alias("_bcnt"),
        F.max("fitted").alias("_bfit"),
        F.min("_prefix_ok").alias("_pok"),
        F.min("_mono").alias("_mok"),
    )
    per = blocks.groupBy("source", "doc_id").agg(
        F.sum("_bcnt").cast("long").alias("n"),
        _r(F.sum("_bsum")).alias("sum_v"),
        (F.min("_mok") == 1).alias("monotone_ok"),
        (
            F.max(
                F.abs(F.col("_bfit") * F.col("_bcnt") - F.col("_bsum"))
            ) <= 1e-6
        ).alias("block_means_ok"),
        (F.min("_pok") == 1).alias("no_split_improves"),
    )
    return per


SQL_ISOTONIC = f"""
WITH series AS ({SERIES_SQL})
SELECT source, doc_id, CAST(count(value) AS BIGINT) AS n,
       round(sum(value), 6) AS sum_v,
       TRUE AS monotone_ok, TRUE AS block_means_ok,
       TRUE AS no_split_improves
FROM series WHERE value IS NOT NULL
GROUP BY 1, 2
"""


def q_tpch_q7(spark, sf_dir):
    """TPC-H Q7 volume shipping between two nations (trimmed to this
    corpus's columns): lineitem revenue flowing supplier-nation ->
    customer-nation for a nation pair, by ship year.  Spark shape: the
    supplier and customer nation names arrive via TWO tiny broadcast
    dims; the only big-big exchanges are lineitem-orders on orderkey
    and orders-customer on custkey; the pair predicate filters after
    the dims attach."""
    nation = _load(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    supp = _load(spark, sf_dir, "supplier").join(
        F.broadcast(nation),
        F.col("s_nationkey") == F.col("n_nationkey"),
    ).select("s_suppkey", F.col("n_name").alias("supp_nation"))
    cust = _load(spark, sf_dir, "customer").join(
        F.broadcast(nation),
        F.col("c_nationkey") == F.col("n_nationkey"),
    ).select("c_custkey", F.col("n_name").alias("cust_nation"))
    li = _load(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1996-01-01"))
        & (F.col("l_shipdate") < F.lit("1998-01-01"))
    )
    orders = _load(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    j = (
        li.join(F.broadcast(supp), li["l_suppkey"] == supp["s_suppkey"])
        .join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .join(cust, orders["o_custkey"] == cust["c_custkey"])
        .where(
            (
                (F.col("supp_nation") == "NATION_1")
                & (F.col("cust_nation") == "NATION_2")
            )
            | (
                (F.col("supp_nation") == "NATION_2")
                & (F.col("cust_nation") == "NATION_1")
            )
        )
    )
    return (
        j.groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("long").alias("l_year"),
        )
        .agg(
            _r(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))
            ).alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


SQL_TPCH_Q7 = """
SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
       CAST(year(l_shipdate) AS BIGINT) AS l_year,
       round(sum(l_extendedprice * (1 - l_discount)), 6) AS revenue,
       CAST(count(*) AS BIGINT) AS n_items
FROM lineitem
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation sn ON s_nationkey = sn.n_nationkey
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation cn ON c_nationkey = cn.n_nationkey
WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
  AND ((sn.n_name = 'NATION_1' AND cn.n_name = 'NATION_2')
    OR (sn.n_name = 'NATION_2' AND cn.n_name = 'NATION_1'))
GROUP BY 1, 2, 3
ORDER BY 1, 2, 3
"""


def q_tpch_q13(spark, sf_dir):
    """TPC-H Q13 customer order-count distribution: how many
    customers placed exactly k orders, INCLUDING the zero-order
    customers (the left join nobody's aggregate can skip).  Spark
    shape: count orders per customer, LEFT join customer -> null
    counts become 0, then a second tiny groupBy on the count — two
    shuffles total, the second over at most max-orders-per-customer
    distinct keys."""
    orders = _load(spark, sf_dir, "orders")
    per = orders.groupBy("o_custkey").agg(
        F.count(F.lit(1)).alias("c_count")
    )
    cust = _load(spark, sf_dir, "customer").select("c_custkey")
    j = cust.join(per, cust["c_custkey"] == per["o_custkey"], "left").select(
        F.coalesce(F.col("c_count"), F.lit(0)).cast("long").alias("c_count")
    )
    return (
        j.groupBy("c_count")
        .agg(F.count(F.lit(1)).cast("long").alias("custdist"))
        .orderBy(F.col("custdist").desc(), F.col("c_count").desc())
    )


SQL_TPCH_Q13 = """
SELECT c_count, CAST(count(*) AS BIGINT) AS custdist
FROM (
  SELECT c.c_custkey,
         CAST(coalesce(o.cnt, 0) AS BIGINT) AS c_count
  FROM customer c
  LEFT JOIN (SELECT o_custkey, count(*) AS cnt
             FROM orders GROUP BY 1) o
    ON c.c_custkey = o.o_custkey) t
GROUP BY 1
ORDER BY 2 DESC, 1 DESC
"""


def q_markov_transitions(spark, sf_dir):
    """First-order Markov transition matrix over session event
    streams: P(next = b | current = a) within per-user 30-min
    sessions (the sessionize_users convention, (ts, event_id)
    ordering), with transition counts and each row-stochastic
    probability.  One lead window inside the session partition, one
    pair groupBy, and the per-state totals attach via a window — no
    join.  The event-path analytics primitive behind funnel mining."""
    from .operators.sessions import sessionize

    ev = _load(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id", "event_type"
    )
    s = sessionize(ev, ts_col="ts", key_cols=["user_id"], gap_seconds=1800.0)
    wo = Window.partitionBy("user_id", "session_id").orderBy(
        "ts", "event_id"
    )
    t = s.withColumn("next_type", F.lead("event_type").over(wo)).where(
        F.col("next_type").isNotNull()
    )
    pairs = t.groupBy(
        F.col("event_type").alias("from_type"),
        F.col("next_type").alias("to_type"),
    ).agg(F.count(F.lit(1)).cast("long").alias("n"))
    wrow = Window.partitionBy("from_type")
    return pairs.withColumn(
        "row_total", F.sum("n").over(wrow).cast("long")
    ).select(
        "from_type", "to_type", "n", "row_total",
        _r(F.col("n") / F.col("row_total")).alias("p"),
    )


SQL_MARKOV_TRANSITIONS = """
WITH e AS (SELECT user_id, ts, event_id, event_type, epoch(ts) AS ep
           FROM events),
m AS (
  SELECT user_id, ts, event_id, event_type, ep,
         CASE WHEN lag(ep) OVER w IS NULL OR ep - lag(ep) OVER w >= 1800
              THEN 1 ELSE 0 END AS b
  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
s AS (
  SELECT user_id, ts, event_id, event_type,
         sum(b) OVER (PARTITION BY user_id ORDER BY ts
                      ROWS UNBOUNDED PRECEDING) - 1 AS sid
  FROM m),
t AS (
  SELECT event_type AS from_type,
         lead(event_type) OVER (PARTITION BY user_id, sid
                                ORDER BY ts, event_id) AS to_type
  FROM s),
pairs AS (
  SELECT from_type, to_type, CAST(count(*) AS BIGINT) AS n
  FROM t WHERE to_type IS NOT NULL GROUP BY 1, 2)
SELECT from_type, to_type, n,
       CAST(sum(n) OVER (PARTITION BY from_type) AS BIGINT) AS row_total,
       round(n / CAST(sum(n) OVER (PARTITION BY from_type) AS DOUBLE), 6)
         AS p
FROM pairs
"""


def q_good_turing(spark, sf_dir):
    """Good-Turing frequency spectrum per source (Good 1953 — the
    count-of-counts N_r behind every smoothed LM): for each observed
    term frequency r, the number of distinct terms N_r seen exactly r
    times and the Turing-smoothed count r* = (r+1)·N_{r+1}/N_r (null
    at spectrum holes).  Two narrow groupBys over the token relation
    plus one ordered-window lookup of N_{r+1} — never a term×term
    product; emitted for r <= 10 (the smoothing region)."""
    docs = _load(spark, sf_dir, "documents")
    toks = docs.select(
        "source",
        F.explode(
            F.split(F.lower(F.trim(F.col("text"))), r"\s+")
        ).alias("term"),
    )
    tf = toks.groupBy("source", "term").agg(
        F.count(F.lit(1)).alias("r")
    )
    spec = tf.groupBy("source", "r").agg(
        F.count(F.lit(1)).cast("long").alias("n_r")
    )
    wo = Window.partitionBy("source").orderBy("r")
    spec = spec.withColumn("_next_r", F.lead("r").over(wo)).withColumn(
        "_next_n", F.lead("n_r").over(wo)
    )
    out = spec.withColumn(
        "r_star",
        F.when(
            F.col("_next_r") == F.col("r") + 1,
            (F.col("r") + 1.0) * F.col("_next_n") / F.col("n_r"),
        ),
    )
    return out.where(F.col("r") <= 10).select(
        "source",
        F.col("r").cast("long").alias("r"),
        "n_r",
        _r(F.col("r_star")).alias("r_star"),
    )


SQL_GOOD_TURING = r"""
WITH tok AS (
  SELECT source,
         unnest(regexp_split_to_array(lower(trim(text)), '\s+')) AS term
  FROM documents),
tf AS (SELECT source, term, CAST(count(*) AS BIGINT) AS r
       FROM tok GROUP BY 1, 2),
spec AS (SELECT source, r, CAST(count(*) AS BIGINT) AS n_r
         FROM tf GROUP BY 1, 2),
nxt AS (SELECT *,
               lead(r) OVER w AS next_r,
               lead(n_r) OVER w AS next_n
        FROM spec WINDOW w AS (PARTITION BY source ORDER BY r))
SELECT source, r, n_r,
       round(CASE WHEN next_r = r + 1
                  THEN (r + 1.0) * next_n / n_r END, 6) AS r_star
FROM nxt WHERE r <= 10
"""


def q_vocab_overlap(spark, sf_dir):
    """Cross-source vocabulary Jaccard: |V_a ∩ V_b| / |V_a ∪ V_b|
    over distinct terms, for every source pair — the corpus-mixing
    diagnostic (how much does source A's vocabulary already cover
    B?).  Intersection counts come from a term-key self-join of the
    DISTINCT (source, term) relation (per-term fanout bounded by
    sources², never by corpus size); union by inclusion-exclusion
    from broadcast per-source vocabulary sizes."""
    docs = _load(spark, sf_dir, "documents")
    vocab = docs.select(
        "source",
        F.explode(
            F.split(F.lower(F.trim(F.col("text"))), r"\s+")
        ).alias("term"),
    ).distinct()
    sizes = vocab.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("v")
    )
    a = vocab.alias("a")
    b = vocab.alias("b")
    inter = (
        a.join(
            b,
            (F.col("a.term") == F.col("b.term"))
            & (F.col("a.source") < F.col("b.source")),
        )
        .groupBy(
            F.col("a.source").alias("source_a"),
            F.col("b.source").alias("source_b"),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n_common"))
    )
    sa = sizes.select(
        F.col("source").alias("source_a"), F.col("v").alias("v_a")
    )
    sb = sizes.select(
        F.col("source").alias("source_b"), F.col("v").alias("v_b")
    )
    j = inter.join(F.broadcast(sa), "source_a").join(
        F.broadcast(sb), "source_b"
    )
    return j.select(
        "source_a", "source_b", "n_common", "v_a", "v_b",
        _r(
            F.col("n_common")
            / (F.col("v_a") + F.col("v_b") - F.col("n_common"))
        ).alias("jaccard"),
    )


SQL_VOCAB_OVERLAP = r"""
WITH tok AS (
  SELECT DISTINCT source,
         unnest(regexp_split_to_array(lower(trim(text)), '\s+')) AS term
  FROM documents),
sizes AS (SELECT source, CAST(count(*) AS BIGINT) AS v
          FROM tok GROUP BY 1),
inter AS (
  SELECT a.source AS source_a, b.source AS source_b,
         CAST(count(*) AS BIGINT) AS n_common
  FROM tok a JOIN tok b
    ON a.term = b.term AND a.source < b.source
  GROUP BY 1, 2)
SELECT i.source_a, i.source_b, i.n_common,
       sa.v AS v_a, sb.v AS v_b,
       round(i.n_common
             / CAST(sa.v + sb.v - i.n_common AS DOUBLE), 6) AS jaccard
FROM inter i
JOIN sizes sa ON sa.source = i.source_a
JOIN sizes sb ON sb.source = i.source_b
"""


def q_ccf_peak_lag(spark, sf_dir):
    """Discovery -> alignment: the top-3 most-correlated doc pairs per
    source get the cross-correlation peak-lag scan (r between a_t and
    b_{t+k}, k in ±5) — BY HOW MANY steps one series leads the other,
    completing the pairs battery (Pearson strength -> Granger
    direction -> EG mean reversion -> CCF delay).  Deterministic
    round-6 |r| argmax with smallest-k tie-break."""
    tc = spectral.top_correlated_pairs(
        series(spark, sf_dir), top_k=3, min_overlap=30,
        key_cols=["source", "doc_id"],
    )
    out = spectral.ccf_peak_lag(
        series(spark, sf_dir),
        tc.select("source", "doc_a", "doc_b"),
        max_lag=5,
        key_cols=["source", "doc_id"],
        min_overlap=30,
    )
    return out.select(
        "source", "doc_a", "doc_b", "best_lag", "n",
        _r(F.col("r")).alias("r"),
    )


SQL_CCF_PEAK_LAG = f"""
WITH series AS ({SERIES_SQL}),
pts AS (SELECT source, doc_id, pos, value FROM series
        WHERE value IS NOT NULL),
pr AS (SELECT a.source, a.doc_id AS doc_a, b.doc_id AS doc_b,
              CAST(count(*) AS BIGINT) AS n_overlap,
              sum(a.value) AS sa, sum(b.value) AS sb,
              sum(a.value * b.value) AS sab,
              sum(a.value * a.value) AS saa,
              sum(b.value * b.value) AS sbb
       FROM pts a JOIN pts b
         ON a.source = b.source AND a.pos = b.pos
        AND a.doc_id < b.doc_id
       GROUP BY 1, 2, 3),
rr AS (SELECT *,
              CASE WHEN n_overlap >= 30
                    AND n_overlap * saa - sa * sa > 0
                    AND n_overlap * sbb - sb * sb > 0
                   THEN (n_overlap * sab - sa * sb)
                        / sqrt((n_overlap * saa - sa * sa)
                               * (n_overlap * sbb - sb * sb)) END AS r
       FROM pr),
rk AS (SELECT *,
              row_number() OVER (PARTITION BY source
                                 ORDER BY round(abs(r), 6) DESC,
                                          doc_a ASC, doc_b ASC) AS rank
       FROM rr WHERE r IS NOT NULL),
pairs AS (SELECT source, doc_a, doc_b FROM rk WHERE rank <= 3),
lags AS (SELECT unnest(range(-5, 6)) AS k),
al AS (
  SELECT p.source, p.doc_a, p.doc_b, l.k,
         a.value AS va, b.value AS vb
  FROM pairs p
  CROSS JOIN lags l
  JOIN pts a ON a.source = p.source AND a.doc_id = p.doc_a
  JOIN pts b ON b.source = p.source AND b.doc_id = p.doc_b
            AND b.pos = a.pos + l.k),
mom AS (SELECT source, doc_a, doc_b, k,
               CAST(count(*) AS BIGINT) AS n,
               sum(va) AS sa, sum(vb) AS sb, sum(va * vb) AS sab,
               sum(va * va) AS saa, sum(vb * vb) AS sbb
        FROM al GROUP BY 1, 2, 3, 4),
rl AS (SELECT *,
              CASE WHEN n >= 30
                    AND n * saa - sa * sa > 0
                    AND n * sbb - sb * sb > 0
                   THEN (n * sab - sa * sb)
                        / sqrt((CAST(n AS DOUBLE) * saa - sa * sa)
                               * (n * sbb - sb * sb)) END AS r
       FROM mom),
bk AS (SELECT *,
              row_number() OVER (PARTITION BY source, doc_a, doc_b
                                 ORDER BY round(abs(r), 6) DESC,
                                          k ASC) AS rn
       FROM rl WHERE r IS NOT NULL)
SELECT source, doc_a, doc_b, CAST(k AS BIGINT) AS best_lag, n,
       round(r, 6) AS r
FROM bk WHERE rn = 1
"""


def q_boxplot_stats(spark, sf_dir):
    """Tukey boxplot battery per 600-wide bin: exact quartiles, IQR,
    1.5-IQR fences, whisker ends (most extreme readings INSIDE the
    fences) and the outlier count — the per-bin distribution summary
    behind every monitoring boxplot.  Exact percentiles + conditional
    aggregates in ONE groupBy pass; no second scan for the whiskers."""
    s = series(spark, sf_dir).where(F.col("value").isNotNull())
    b = s.withColumn(
        "bin_start",
        (F.floor(F.col("pos").cast("long") / 600) * 600).cast("long"),
    )
    agg = b.groupBy("source", "doc_id", "bin_start").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.percentile("value", F.lit(0.25)).alias("_q1"),
        F.percentile("value", F.lit(0.5)).alias("_med"),
        F.percentile("value", F.lit(0.75)).alias("_q3"),
        F.collect_list("value").alias("_vals"),
    )
    iqr = F.col("_q3") - F.col("_q1")
    lo = F.col("_q1") - 1.5 * iqr
    hi = F.col("_q3") + 1.5 * iqr
    inside = F.filter(
        F.col("_vals"), lambda v: (v >= lo) & (v <= hi)
    )
    n_out = F.size("_vals") - F.size(inside)
    return agg.select(
        "source", "doc_id", "bin_start", "n",
        _r(F.col("_q1")).alias("q1"),
        _r(F.col("_med")).alias("median"),
        _r(F.col("_q3")).alias("q3"),
        _r(iqr).alias("iqr"),
        _r(F.array_min(inside)).alias("whisker_lo"),
        _r(F.array_max(inside)).alias("whisker_hi"),
        n_out.cast("long").alias("n_outliers"),
    )


SQL_BOXPLOT_STATS = f"""
WITH series AS ({SERIES_SQL}),
b AS (SELECT source, doc_id,
             CAST(floor(pos / 600) AS BIGINT) * 600 AS bin_start,
             value
      FROM series WHERE value IS NOT NULL),
q AS (SELECT source, doc_id, bin_start,
             CAST(count(*) AS BIGINT) AS n,
             quantile_cont(value, 0.25) AS q1,
             quantile_cont(value, 0.5) AS med,
             quantile_cont(value, 0.75) AS q3
      FROM b GROUP BY 1, 2, 3),
w AS (SELECT b.source, b.doc_id, b.bin_start, q.n,
             q.q1, q.med, q.q3, q.q3 - q.q1 AS iqr,
             min(CASE WHEN b.value >= q.q1 - 1.5 * (q.q3 - q.q1)
                       AND b.value <= q.q3 + 1.5 * (q.q3 - q.q1)
                      THEN b.value END) AS wlo,
             max(CASE WHEN b.value >= q.q1 - 1.5 * (q.q3 - q.q1)
                       AND b.value <= q.q3 + 1.5 * (q.q3 - q.q1)
                      THEN b.value END) AS whi,
             CAST(sum(CASE WHEN b.value < q.q1 - 1.5 * (q.q3 - q.q1)
                            OR b.value > q.q3 + 1.5 * (q.q3 - q.q1)
                           THEN 1 ELSE 0 END) AS BIGINT) AS n_out
      FROM b JOIN q USING (source, doc_id, bin_start)
      GROUP BY 1, 2, 3, 4, 5, 6, 7)
SELECT source, doc_id, bin_start, n,
       round(q1, 6) AS q1, round(med, 6) AS median,
       round(q3, 6) AS q3, round(iqr, 6) AS iqr,
       round(wlo, 6) AS whisker_lo, round(whi, 6) AS whisker_hi,
       n_out AS n_outliers
FROM w
"""


def q_welch_ab_test(spark, sf_dir):
    """Welch's unequal-variance t-test per source between the series
    halves (the PSI query's split convention): did the MEAN shift,
    with Satterthwaite degrees of freedom and a |t| > 1.96 verdict —
    the parametric sibling of psi_drift's distributional screen.
    Closed-form moment sums in one aggregate; no UDF."""
    s = series(spark, sf_dir).where(F.col("value").isNotNull())
    w = Window.partitionBy("source", "doc_id")
    s = s.withColumn(
        "_half_at", F.floor((F.max("pos").over(w) + 1) / 2)
    ).withColumn(
        "half",
        F.when(F.col("pos") < F.col("_half_at"), "ref").otherwise("cur"),
    )
    agg = s.groupBy("source", "half").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.avg("value").alias("mean"),
        F.var_samp("value").alias("var"),
    )
    pv = agg.groupBy("source").pivot("half", ["ref", "cur"]).agg(
        F.first("n").alias("n"),
        F.first("mean").alias("mean"),
        F.first("var").alias("var"),
    )
    n1 = F.col("ref_n").cast("double")
    n2 = F.col("cur_n").cast("double")
    se2 = F.col("ref_var") / n1 + F.col("cur_var") / n2
    t = (F.col("cur_mean") - F.col("ref_mean")) / F.sqrt(se2)
    dof = (se2 * se2) / (
        F.pow(F.col("ref_var") / n1, 2) / (n1 - 1.0)
        + F.pow(F.col("cur_var") / n2, 2) / (n2 - 1.0)
    )
    return pv.where((F.col("ref_n") >= 2) & (F.col("cur_n") >= 2)).select(
        "source",
        F.col("ref_n").alias("n_ref"),
        F.col("cur_n").alias("n_cur"),
        _r(F.col("cur_mean") - F.col("ref_mean")).alias("mean_shift"),
        _r(t).alias("t"),
        _r(dof).alias("dof"),
        F.when(F.abs(t) > 1.959964, "shifted")
        .otherwise("stable")
        .alias("verdict"),
    )


SQL_WELCH_AB = f"""
WITH series AS ({SERIES_SQL}),
nn AS (SELECT source, doc_id, pos, value,
              CAST(floor((max(pos) OVER (PARTITION BY source, doc_id) + 1)
                         / 2) AS BIGINT) AS half_at
       FROM series WHERE value IS NOT NULL),
lab AS (SELECT source, value,
               CASE WHEN pos < half_at THEN 'ref' ELSE 'cur' END AS half
        FROM nn),
agg AS (SELECT source, half, CAST(count(*) AS BIGINT) AS n,
               avg(value) AS mean, var_samp(value) AS var
        FROM lab GROUP BY 1, 2),
pv AS (SELECT source,
              max(CASE WHEN half = 'ref' THEN n END) AS n_ref,
              max(CASE WHEN half = 'cur' THEN n END) AS n_cur,
              max(CASE WHEN half = 'ref' THEN mean END) AS m_ref,
              max(CASE WHEN half = 'cur' THEN mean END) AS m_cur,
              max(CASE WHEN half = 'ref' THEN var END) AS v_ref,
              max(CASE WHEN half = 'cur' THEN var END) AS v_cur
       FROM agg GROUP BY 1),
zz AS (SELECT *,
              v_ref / n_ref + v_cur / n_cur AS se2
       FROM pv WHERE n_ref >= 2 AND n_cur >= 2)
SELECT source, n_ref, n_cur,
       round(m_cur - m_ref, 6) AS mean_shift,
       round((m_cur - m_ref) / sqrt(se2), 6) AS t,
       round(se2 * se2
             / (pow(v_ref / n_ref, 2) / (n_ref - 1.0)
                + pow(v_cur / n_cur, 2) / (n_cur - 1.0)), 6) AS dof,
       CASE WHEN abs((m_cur - m_ref) / sqrt(se2)) > 1.959964
            THEN 'shifted' ELSE 'stable' END AS verdict
FROM zz
"""


def q_ks_two_sample(spark, sf_dir):
    """Two-sample Kolmogorov-Smirnov per source between the series
    halves: D = sup |F_ref - F_cur| computed EXACTLY — per-half
    counts grouped per distinct value first (tie-safe: both ECDFs
    advance together at tied values), then one cumulative window over
    the distinct-value relation — with the
    asymptotic 5% threshold 1.358·sqrt((n+m)/(n·m)).  The
    distribution-shape sibling of welch_ab_test's mean screen."""
    s = series(spark, sf_dir).where(F.col("value").isNotNull())
    w = Window.partitionBy("source", "doc_id")
    s = s.withColumn(
        "_half_at", F.floor((F.max("pos").over(w) + 1) / 2)
    ).withColumn(
        "_is_ref",
        F.when(F.col("pos") < F.col("_half_at"), 1).otherwise(0),
    )
    byv = s.groupBy("source", "value").agg(
        F.sum("_is_ref").alias("_r"),
        F.sum(1 - F.col("_is_ref")).alias("_c"),
    )
    wo = (
        Window.partitionBy("source")
        .orderBy("value")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wall = Window.partitionBy("source")
    c = (
        byv.withColumn("_cr", F.sum("_r").over(wo))
        .withColumn("_cc", F.sum("_c").over(wo))
        .withColumn("_nr", F.sum("_r").over(wall))
        .withColumn("_nc", F.sum("_c").over(wall))
    )
    d = F.abs(
        F.col("_cr") / F.col("_nr") - F.col("_cc") / F.col("_nc")
    )
    agg = c.groupBy("source").agg(
        F.max("_nr").cast("long").alias("n_ref"),
        F.max("_nc").cast("long").alias("n_cur"),
        F.max(d).alias("_d"),
    )
    crit = 1.358 * F.sqrt(
        (F.col("n_ref") + F.col("n_cur"))
        / (F.col("n_ref").cast("double") * F.col("n_cur"))
    )
    return agg.select(
        "source", "n_ref", "n_cur",
        _r(F.col("_d")).alias("ks_d"),
        _r(crit).alias("crit_05"),
        F.when(F.col("_d") > crit, "shifted")
        .otherwise("stable")
        .alias("verdict"),
    )


SQL_KS_TWO_SAMPLE = f"""
WITH series AS ({SERIES_SQL}),
nn AS (SELECT source, doc_id, pos, value,
              CAST(floor((max(pos) OVER (PARTITION BY source, doc_id) + 1)
                         / 2) AS BIGINT) AS half_at
       FROM series WHERE value IS NOT NULL),
lab AS (SELECT source, value,
               CASE WHEN pos < half_at THEN 1 ELSE 0 END AS is_ref
        FROM nn),
byv AS (SELECT source, value,
               sum(is_ref) AS r, sum(1 - is_ref) AS c
        FROM lab GROUP BY 1, 2),
c AS (SELECT source, value,
             sum(r) OVER w AS cr,
             sum(c) OVER w AS cc,
             sum(r) OVER (PARTITION BY source) AS nr,
             sum(c) OVER (PARTITION BY source) AS nc
      FROM byv
      WINDOW w AS (PARTITION BY source ORDER BY value ASC
                   ROWS UNBOUNDED PRECEDING)),
agg AS (SELECT source,
               CAST(max(nr) AS BIGINT) AS n_ref,
               CAST(max(nc) AS BIGINT) AS n_cur,
               max(abs(cr / CAST(nr AS DOUBLE)
                       - cc / CAST(nc AS DOUBLE))) AS d
        FROM c GROUP BY 1)
SELECT source, n_ref, n_cur, round(d, 6) AS ks_d,
       round(1.358 * sqrt((n_ref + n_cur)
                          / (CAST(n_ref AS DOUBLE) * n_cur)), 6)
         AS crit_05,
       CASE WHEN d > 1.358 * sqrt((n_ref + n_cur)
                                  / (CAST(n_ref AS DOUBLE) * n_cur))
            THEN 'shifted' ELSE 'stable' END AS verdict
FROM agg
"""


def q_interarrival_burstiness(spark, sf_dir):
    """Burstiness of per-user event arrivals (Goh & Barabási 2008):
    B = (σ - μ)/(σ + μ) over inter-event gaps — -1 = metronome,
    0 = Poisson, +1 = maximally bursty — plus the coefficient of
    variation, pooled per event type.  One lag window for the gaps,
    one aggregate."""
    ev = _load(spark, sf_dir, "events").select(
        "event_type", "user_id", "ts", "event_id"
    )
    from .operators.sessions import _epoch

    wo = Window.partitionBy("event_type", "user_id").orderBy(
        "ts", "event_id"
    )
    g = ev.withColumn(
        "_gap", _epoch("ts") - F.lag(_epoch("ts")).over(wo)
    ).where(F.col("_gap").isNotNull())
    agg = g.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_gaps"),
        F.avg("_gap").alias("_mu"),
        F.stddev_samp("_gap").alias("_sd"),
    )
    b = (F.col("_sd") - F.col("_mu")) / (F.col("_sd") + F.col("_mu"))
    return agg.where(F.col("n_gaps") >= 2).select(
        "event_type", "n_gaps",
        _r(F.col("_mu")).alias("mean_gap_s"),
        _r(F.col("_sd") / F.col("_mu")).alias("cv"),
        _r(b).alias("burstiness"),
        F.when(b > 0.2, "bursty")
        .when(b < -0.2, "regular")
        .otherwise("poisson-like")
        .alias("verdict"),
    )


SQL_INTERARRIVAL_BURSTINESS = """
WITH g AS (
  SELECT event_type,
         epoch(ts) - lag(epoch(ts)) OVER (PARTITION BY event_type, user_id
                                          ORDER BY ts, event_id) AS gap
  FROM events),
agg AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n_gaps,
               avg(gap) AS mu, stddev_samp(gap) AS sd
        FROM g WHERE gap IS NOT NULL GROUP BY 1)
SELECT event_type, n_gaps,
       round(mu, 6) AS mean_gap_s,
       round(sd / mu, 6) AS cv,
       round((sd - mu) / (sd + mu), 6) AS burstiness,
       CASE WHEN (sd - mu) / (sd + mu) > 0.2 THEN 'bursty'
            WHEN (sd - mu) / (sd + mu) < -0.2 THEN 'regular'
            ELSE 'poisson-like' END AS verdict
FROM agg WHERE n_gaps >= 2
"""


def q_brown_forsythe(spark, sf_dir):
    """Brown-Forsythe robust variance-drift test per source between
    the series halves (the welch/KS split convention): one-way ANOVA
    on absolute deviations from each half's MEDIAN — the
    outlier-tolerant Levene variant — so the drift screen now covers
    mean (welch_ab_test), shape (ks_two_sample), and variance.  With
    two groups the F statistic is exact from closed-form group sums;
    verdict at the F(1, n-2) 5% critical value 3.841459 (the chi²(1)
    limit is used, exact for the large-n halves here)."""
    s = series(spark, sf_dir).where(F.col("value").isNotNull())
    w = Window.partitionBy("source", "doc_id")
    s = s.withColumn(
        "_half_at", F.floor((F.max("pos").over(w) + 1) / 2)
    ).withColumn(
        "half",
        F.when(F.col("pos") < F.col("_half_at"), "ref").otherwise("cur"),
    )
    wm = Window.partitionBy("source", "half")
    z = s.withColumn(
        "_z", F.abs(F.col("value") - F.percentile("value", F.lit(0.5)).over(wm))
    )
    g = z.groupBy("source", "half").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("_z").alias("_sz"),
        F.sum(F.col("_z") * F.col("_z")).alias("_szz"),
    )
    pv = g.groupBy("source").agg(
        F.sum("n").cast("long").alias("n_total"),
        F.count(F.lit(1)).alias("_k"),
        F.sum("_sz").alias("_tz"),
        F.sum("_szz").alias("_tzz"),
        F.sum(F.col("_sz") * F.col("_sz") / F.col("n")).alias("_between_raw"),
    )
    nt = F.col("n_total").cast("double")
    ssb = F.col("_between_raw") - F.col("_tz") * F.col("_tz") / nt
    ssw = F.col("_tzz") - F.col("_between_raw")
    fstat = F.when(
        (F.col("_k") == 2) & (ssw > 0),
        ssb / (ssw / (nt - 2.0)),
    )
    return pv.select(
        "source", "n_total",
        _r(fstat).alias("f_stat"),
        F.when(fstat > 3.841459, "variance-shifted")
        .otherwise("stable")
        .alias("verdict"),
    )


SQL_BROWN_FORSYTHE = f"""
WITH series AS ({SERIES_SQL}),
nn AS (SELECT source, doc_id, pos, value,
              CAST(floor((max(pos) OVER (PARTITION BY source, doc_id) + 1)
                         / 2) AS BIGINT) AS half_at
       FROM series WHERE value IS NOT NULL),
lab AS (SELECT source, value,
               CASE WHEN pos < half_at THEN 'ref' ELSE 'cur' END AS half
        FROM nn),
med AS (SELECT source, half, value,
               abs(value - quantile_cont(value, 0.5)
                     OVER (PARTITION BY source, half)) AS z
        FROM lab),
g AS (SELECT source, half, CAST(count(*) AS BIGINT) AS n,
             sum(z) AS sz, sum(z * z) AS szz
      FROM med GROUP BY 1, 2),
pv AS (SELECT source,
              CAST(sum(n) AS BIGINT) AS n_total,
              count(*) AS k,
              sum(sz) AS tz, sum(szz) AS tzz,
              sum(sz * sz / n) AS between_raw
       FROM g GROUP BY 1),
zz AS (SELECT *,
              between_raw - tz * tz / CAST(n_total AS DOUBLE) AS ssb,
              tzz - between_raw AS ssw
       FROM pv)
SELECT source, n_total,
       round(CASE WHEN k = 2 AND ssw > 0
                  THEN ssb / (ssw / (CAST(n_total AS DOUBLE) - 2.0)) END,
             6) AS f_stat,
       CASE WHEN (CASE WHEN k = 2 AND ssw > 0
                       THEN ssb / (ssw / (CAST(n_total AS DOUBLE) - 2.0))
                  END) > 3.841459
            THEN 'variance-shifted' ELSE 'stable' END AS verdict
FROM zz
"""


def q_chi2_independence(spark, sf_dir):
    """Chi-square independence of event type × hour-of-day with
    Cramér's V effect size — is activity mix time-of-day dependent?
    Exact expected counts from broadcastable margins over the dense
    (type, hour) grid (zero cells included, the Benford pattern);
    V = sqrt(chi2 / (n·(min(r,c)-1))) normalizes to [0,1]."""
    ev = _load(spark, sf_dir, "events").select(
        "event_type", F.hour("ts").cast("int").alias("hh")
    )
    obs = ev.groupBy("event_type", "hh").agg(
        F.count(F.lit(1)).alias("o")
    )
    rows = obs.groupBy("event_type").agg(F.sum("o").alias("row_n"))
    cols = obs.groupBy("hh").agg(F.sum("o").alias("col_n"))
    tot = obs.agg(F.sum("o").cast("double").alias("_n"))
    dense = rows.crossJoin(cols).crossJoin(F.broadcast(tot))
    fullg = dense.join(obs, ["event_type", "hh"], "left").fillna(
        0, subset=["o"]
    )
    exp = F.col("row_n") * F.col("col_n") / F.col("_n")
    cells = fullg.select(
        "event_type", "hh", "o", "_n",
        (F.pow(F.col("o") - exp, 2) / exp).alias("_term"),
    )
    agg = cells.agg(
        F.max("_n").alias("_nn"),
        F.count(F.lit(1)).cast("long").alias("n_cells"),
        F.countDistinct("event_type").alias("_r"),
        F.countDistinct("hh").alias("_c"),
        F.sum("_term").alias("_chi2"),
    )
    dof = (F.col("_r") - 1) * (F.col("_c") - 1)
    v = F.sqrt(
        F.col("_chi2")
        / (F.col("_nn") * (F.least(F.col("_r"), F.col("_c")) - 1.0))
    )
    return agg.select(
        F.col("_nn").cast("long").alias("n_events"),
        "n_cells",
        dof.cast("long").alias("dof"),
        _r(F.col("_chi2")).alias("chi2"),
        _r(v).alias("cramers_v"),
        F.when(v >= 0.1, "associated")
        .otherwise("independent-ish")
        .alias("verdict"),
    )


SQL_CHI2_INDEPENDENCE = """
WITH e AS (SELECT event_type, CAST(hour(ts) AS INTEGER) AS hh
           FROM events),
obs AS (SELECT event_type, hh, count(*) AS o FROM e GROUP BY 1, 2),
rows_ AS (SELECT event_type, sum(o) AS row_n FROM obs GROUP BY 1),
cols_ AS (SELECT hh, sum(o) AS col_n FROM obs GROUP BY 1),
tot AS (SELECT sum(o) AS n FROM obs),
dense AS (SELECT r.event_type, c.hh, r.row_n, c.col_n
          FROM rows_ r CROSS JOIN cols_ c),
fullg AS (
  SELECT d.event_type, d.hh, d.row_n, d.col_n, coalesce(o.o, 0) AS o
  FROM dense d LEFT JOIN obs o
    ON d.event_type = o.event_type AND d.hh = o.hh),
cells AS (
  SELECT f.*, t.n,
         f.row_n * f.col_n / CAST(t.n AS DOUBLE) AS e,
         pow(f.o - f.row_n * f.col_n / CAST(t.n AS DOUBLE), 2)
           / (f.row_n * f.col_n / CAST(t.n AS DOUBLE)) AS term
  FROM fullg f CROSS JOIN tot t),
agg AS (
  SELECT CAST(max(n) AS BIGINT) AS n_events,
         CAST(count(*) AS BIGINT) AS n_cells,
         CAST((count(DISTINCT event_type) - 1)
              * (count(DISTINCT hh) - 1) AS BIGINT) AS dof,
         sum(term) AS chi2,
         sqrt(sum(term)
              / (max(n) * (least(count(DISTINCT event_type),
                                 count(DISTINCT hh)) - 1.0))) AS v
  FROM cells)
SELECT n_events, n_cells, dof, round(chi2, 6) AS chi2,
       round(v, 6) AS cramers_v,
       CASE WHEN v >= 0.1 THEN 'associated'
            ELSE 'independent-ish' END AS verdict
FROM agg
"""


def q_record_breaks(spark, sf_dir):
    """Record statistics per series: how many times the running
    maximum was broken (first reading counts as record #1), the last
    record position, and the i.i.d.-expected count — the harmonic
    number H_n (Rényi 1962: record counts are distribution-free) —
    with a surplus ratio flagging trending series.  One running-max
    window + one aggregate; H_n via a per-row 1/rank sum, no UDF."""
    s = series(spark, sf_dir).where(F.col("value").isNotNull())
    wo = Window.partitionBy("source", "doc_id").orderBy("pos")
    r = s.withColumn("_rn", F.row_number().over(wo)).withColumn(
        "_runmax",
        F.max("value").over(
            Window.partitionBy("source", "doc_id")
            .orderBy("pos")
            .rowsBetween(Window.unboundedPreceding, -1)
        ),
    )
    is_rec = F.when(
        F.col("_runmax").isNull() | (F.col("value") > F.col("_runmax")), 1
    ).otherwise(0)
    agg = r.groupBy("source", "doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(is_rec).cast("long").alias("n_records"),
        F.max(F.when(is_rec == 1, F.col("pos"))).cast("long").alias(
            "last_record_pos"
        ),
        F.sum(1.0 / F.col("_rn")).alias("_hn"),
    )
    ratio = F.col("n_records") / F.col("_hn")
    return agg.select(
        "source", "doc_id", "n", "n_records", "last_record_pos",
        _r(F.col("_hn")).alias("expected_iid"),
        _r(ratio).alias("surplus_ratio"),
        F.when(ratio > 2.0, "trending")
        .otherwise("stationary-ish")
        .alias("verdict"),
    )


SQL_RECORD_BREAKS = f"""
WITH series AS ({SERIES_SQL}),
nn AS (SELECT source, doc_id, pos, value FROM series
       WHERE value IS NOT NULL),
r AS (SELECT source, doc_id, pos, value,
             row_number() OVER w AS rn,
             max(value) OVER (PARTITION BY source, doc_id ORDER BY pos
                              ROWS BETWEEN UNBOUNDED PRECEDING
                                       AND 1 PRECEDING) AS runmax
      FROM nn WINDOW w AS (PARTITION BY source, doc_id ORDER BY pos)),
agg AS (
  SELECT source, doc_id,
         CAST(count(*) AS BIGINT) AS n,
         CAST(sum(CASE WHEN runmax IS NULL OR value > runmax
                       THEN 1 ELSE 0 END) AS BIGINT) AS n_records,
         CAST(max(CASE WHEN runmax IS NULL OR value > runmax
                       THEN pos END) AS BIGINT) AS last_record_pos,
         sum(1.0 / rn) AS hn
  FROM r GROUP BY 1, 2)
SELECT source, doc_id, n, n_records, last_record_pos,
       round(hn, 6) AS expected_iid,
       round(n_records / hn, 6) AS surplus_ratio,
       CASE WHEN n_records / hn > 2.0 THEN 'trending'
            ELSE 'stationary-ish' END AS verdict
FROM agg
"""


def q_neyman_allocation(spark, sf_dir):
    """Neyman optimal stratified-sample allocation (Neyman 1934): for
    a labeling/eval budget of 1000 rows, allocate per-source quotas
    proportional to N_h * S_h (stratum size x stddev) — the minimum-
    variance design the uniform split wastes budget against.  Integer
    quotas via the largest-remainder method (floor, then +1 to the
    largest fractional remainders with a deterministic source
    tie-break), so quotas sum EXACTLY to the budget.  One stats
    aggregate over the strata plus window arithmetic on the
    stratum-count relation; pairs with stratified_sample /
    perplexity_bucket_sample as the design step before the hash
    sampler runs."""
    budget = 1000
    s = series(spark, sf_dir).where(F.col("value").isNotNull())
    st = s.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.coalesce(F.stddev_samp("value"), F.lit(0.0)).alias("sd"),
    )
    wall = Window.partitionBy()
    st = st.withColumn("_w", F.col("n_rows") * F.col("sd")).withColumn(
        "_tot", F.sum("_w").over(wall)
    )
    share = F.lit(float(budget)) * F.col("_w") / F.col("_tot")
    st = st.withColumn("_floor", F.floor(share).cast("long")).withColumn(
        "_rem", share - F.col("_floor")
    ).withColumn("_short", F.lit(budget) - F.sum("_floor").over(wall))
    wr = Window.partitionBy().orderBy(
        F.col("_rem").desc(), F.col("source").asc()
    )
    st = st.withColumn("_rk", F.row_number().over(wr))
    quota = F.col("_floor") + F.when(
        F.col("_rk") <= F.col("_short"), 1
    ).otherwise(0)
    return st.select(
        "source", "n_rows",
        _r(F.col("sd")).alias("sd"),
        _r(share).alias("exact_share"),
        quota.cast("long").alias("quota"),
    )


SQL_NEYMAN_ALLOCATION = f"""
WITH series AS ({SERIES_SQL}),
st AS (SELECT source, CAST(count(*) AS BIGINT) AS n_rows,
              coalesce(stddev_samp(value), 0.0) AS sd
       FROM series WHERE value IS NOT NULL GROUP BY 1),
w AS (SELECT *, n_rows * sd AS wgt,
             sum(n_rows * sd) OVER () AS tot
      FROM st),
sh AS (SELECT *, 1000.0 * wgt / tot AS share FROM w),
fl AS (SELECT *, CAST(floor(share) AS BIGINT) AS fl,
              share - floor(share) AS rem,
              1000 - sum(CAST(floor(share) AS BIGINT)) OVER () AS short
       FROM sh),
rk AS (SELECT *, row_number() OVER (ORDER BY rem DESC, source ASC) AS rk
       FROM fl)
SELECT source, n_rows, round(sd, 6) AS sd,
       round(share, 6) AS exact_share,
       CAST(fl + CASE WHEN rk <= short THEN 1 ELSE 0 END AS BIGINT)
         AS quota
FROM rk
"""


def q_wasserstein_drift(spark, sf_dir):
    """Exact 1-Wasserstein (earth-mover) distance per source between
    the series halves: W1 = ∫|F_ref - F_cur| dx, computed CLOSED-FORM
    on the merged distinct-value grid — the ECDF gap at each distinct
    value times the span to the next one (the same tie-safe cumulative
    relation as ks_two_sample; where KS takes the sup, W1 takes the
    integral, so small-but-everywhere shifts that KS underweights
    show up).  Also emitted normalized by the pooled value range."""
    s = series(spark, sf_dir).where(F.col("value").isNotNull())
    w = Window.partitionBy("source", "doc_id")
    s = s.withColumn(
        "_half_at", F.floor((F.max("pos").over(w) + 1) / 2)
    ).withColumn(
        "_is_ref",
        F.when(F.col("pos") < F.col("_half_at"), 1).otherwise(0),
    )
    byv = s.groupBy("source", "value").agg(
        F.sum("_is_ref").alias("_r"),
        F.sum(1 - F.col("_is_ref")).alias("_c"),
    )
    wo = (
        Window.partitionBy("source")
        .orderBy("value")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wall = Window.partitionBy("source")
    wlead = Window.partitionBy("source").orderBy("value")
    c = (
        byv.withColumn("_cr", F.sum("_r").over(wo))
        .withColumn("_cc", F.sum("_c").over(wo))
        .withColumn("_nr", F.sum("_r").over(wall))
        .withColumn("_nc", F.sum("_c").over(wall))
        .withColumn("_next", F.lead("value").over(wlead))
    )
    gap_term = F.when(
        F.col("_next").isNotNull(),
        F.abs(F.col("_cr") / F.col("_nr") - F.col("_cc") / F.col("_nc"))
        * (F.col("_next") - F.col("value")),
    ).otherwise(0.0)
    agg = c.groupBy("source").agg(
        F.max("_nr").cast("long").alias("n_ref"),
        F.max("_nc").cast("long").alias("n_cur"),
        F.sum(gap_term).alias("_w1"),
        (F.max("value") - F.min("value")).alias("_range"),
    )
    return agg.select(
        "source", "n_ref", "n_cur",
        _r(F.col("_w1")).alias("w1"),
        _r(F.col("_w1") / F.col("_range")).alias("w1_norm"),
        F.when(F.col("_w1") / F.col("_range") > 0.05, "shifted")
        .otherwise("stable")
        .alias("verdict"),
    )


SQL_WASSERSTEIN_DRIFT = f"""
WITH series AS ({SERIES_SQL}),
nn AS (SELECT source, doc_id, pos, value,
              CAST(floor((max(pos) OVER (PARTITION BY source, doc_id) + 1)
                         / 2) AS BIGINT) AS half_at
       FROM series WHERE value IS NOT NULL),
lab AS (SELECT source, value,
               CASE WHEN pos < half_at THEN 1 ELSE 0 END AS is_ref
        FROM nn),
byv AS (SELECT source, value,
               sum(is_ref) AS r, sum(1 - is_ref) AS c
        FROM lab GROUP BY 1, 2),
cum AS (SELECT source, value,
             sum(r) OVER w AS cr,
             sum(c) OVER w AS cc,
             sum(r) OVER (PARTITION BY source) AS nr,
             sum(c) OVER (PARTITION BY source) AS nc,
             lead(value) OVER (PARTITION BY source ORDER BY value)
               AS next_v
      FROM byv
      WINDOW w AS (PARTITION BY source ORDER BY value ASC
                   ROWS UNBOUNDED PRECEDING)),
agg AS (
  SELECT source,
         CAST(max(nr) AS BIGINT) AS n_ref,
         CAST(max(nc) AS BIGINT) AS n_cur,
         sum(CASE WHEN next_v IS NOT NULL
                  THEN abs(cr / CAST(nr AS DOUBLE)
                           - cc / CAST(nc AS DOUBLE))
                       * (next_v - value)
                  ELSE 0.0 END) AS w1,
         max(value) - min(value) AS rng
  FROM cum GROUP BY 1)
SELECT source, n_ref, n_cur, round(w1, 6) AS w1,
       round(w1 / rng, 6) AS w1_norm,
       CASE WHEN w1 / rng > 0.05 THEN 'shifted'
            ELSE 'stable' END AS verdict
FROM agg
"""


def q_session_trigram_paths(spark, sf_dir):
    """Top-10 within-session event trigram paths: the order-2 path
    mining complement of markov_transitions' first-order matrix (which
    cannot distinguish view->cart->buy from cart->view->buy).  Two
    leads on the session window, one pair groupBy, deterministic
    (count desc, path asc) rank, share of all trigrams."""
    from .operators.sessions import sessionize

    ev = _load(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id", "event_type"
    )
    s = sessionize(ev, ts_col="ts", key_cols=["user_id"], gap_seconds=1800.0)
    wo = Window.partitionBy("user_id", "session_id").orderBy(
        "ts", "event_id"
    )
    t = (
        s.withColumn("_n1", F.lead("event_type", 1).over(wo))
        .withColumn("_n2", F.lead("event_type", 2).over(wo))
        .where(F.col("_n1").isNotNull() & F.col("_n2").isNotNull())
        .select(
            F.concat_ws(
                ">", "event_type", "_n1", "_n2"
            ).alias("path")
        )
    )
    counts = t.groupBy("path").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    wall = Window.partitionBy()
    ranked = counts.withColumn(
        "total", F.sum("n").over(wall).cast("long")
    ).withColumn(
        "rank",
        F.row_number().over(
            Window.partitionBy().orderBy(
                F.col("n").desc(), F.col("path").asc()
            )
        ),
    )
    return ranked.where(F.col("rank") <= 10).select(
        F.col("rank").cast("long").alias("rank"),
        "path", "n", "total",
        _r(F.col("n") / F.col("total")).alias("share"),
    )


SQL_SESSION_TRIGRAMS = """
WITH e AS (SELECT user_id, ts, event_id, event_type, epoch(ts) AS ep
           FROM events),
m AS (
  SELECT user_id, ts, event_id, event_type, ep,
         CASE WHEN lag(ep) OVER w IS NULL OR ep - lag(ep) OVER w >= 1800
              THEN 1 ELSE 0 END AS b
  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
s AS (
  SELECT user_id, ts, event_id, event_type,
         sum(b) OVER (PARTITION BY user_id ORDER BY ts
                      ROWS UNBOUNDED PRECEDING) - 1 AS sid
  FROM m),
t AS (
  SELECT event_type || '>' || lead(event_type, 1) OVER w
           || '>' || lead(event_type, 2) OVER w AS path
  FROM s WINDOW w AS (PARTITION BY user_id, sid ORDER BY ts, event_id)),
counts AS (SELECT path, CAST(count(*) AS BIGINT) AS n
           FROM t WHERE path IS NOT NULL GROUP BY 1),
rk AS (SELECT *, CAST(sum(n) OVER () AS BIGINT) AS total,
              row_number() OVER (ORDER BY n DESC, path ASC) AS rank
       FROM counts)
SELECT CAST(rank AS BIGINT) AS rank, path, n, total,
       round(n / CAST(total AS DOUBLE), 6) AS share
FROM rk WHERE rank <= 10
"""


def q_gap_length_histogram(spark, sf_dir):
    """Distribution of missing-run lengths per source: gaps-and-islands
    over the null mask (the GapFinder relation), bucketed into
    1 / 2 / 3 / 4 / 5+ lengths with counts and the longest run — the
    summary that decides interpolation limits (a corpus of length-1
    blips tolerates limit=1; heavy 5+ tails need the lookup-table
    fill).  One island window + two narrow groupBys."""
    s = series(spark, sf_dir)
    wo = Window.partitionBy("source", "doc_id").orderBy("pos")
    m = s.withColumn("_isnull", F.col("value").isNull().cast("int"))
    m = m.withColumn(
        "_edge",
        F.when(
            F.lag("_isnull").over(wo).isNull()
            | (F.lag("_isnull").over(wo) != F.col("_isnull")),
            1,
        ).otherwise(0),
    ).withColumn(
        "_run",
        F.sum("_edge").over(
            wo.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    runs = (
        m.where(F.col("_isnull") == 1)
        .groupBy("source", "doc_id", "_run")
        .agg(F.count(F.lit(1)).alias("len"))
    )
    bucket = F.when(F.col("len") >= 5, F.lit("5+")).otherwise(
        F.col("len").cast("string")
    )
    return (
        runs.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_gaps"),
            F.max("len").cast("long").alias("longest"),
            F.sum("len").cast("long").alias("missing_total"),
        )
        .join(
            runs.groupBy("source", bucket.alias("len_bucket")).agg(
                F.count(F.lit(1)).cast("long").alias("n")
            ),
            "source",
        )
        .select("source", "len_bucket", "n", "n_gaps", "longest",
                "missing_total")
    )


SQL_GAP_LENGTH_HISTOGRAM = f"""
WITH series AS ({SERIES_SQL}),
m AS (SELECT source, doc_id, pos,
             CASE WHEN value IS NULL THEN 1 ELSE 0 END AS isnull_,
             CASE WHEN lag(CASE WHEN value IS NULL THEN 1 ELSE 0 END)
                         OVER w IS NULL
                    OR lag(CASE WHEN value IS NULL THEN 1 ELSE 0 END)
                         OVER w
                       <> CASE WHEN value IS NULL THEN 1 ELSE 0 END
                  THEN 1 ELSE 0 END AS edge
      FROM series
      WINDOW w AS (PARTITION BY source, doc_id ORDER BY pos)),
r AS (SELECT source, doc_id, isnull_,
             sum(edge) OVER (PARTITION BY source, doc_id ORDER BY pos
                             ROWS UNBOUNDED PRECEDING) AS run
      FROM m),
runs AS (SELECT source, doc_id, run, CAST(count(*) AS BIGINT) AS len
         FROM r WHERE isnull_ = 1 GROUP BY 1, 2, 3),
tot AS (SELECT source, CAST(count(*) AS BIGINT) AS n_gaps,
               CAST(max(len) AS BIGINT) AS longest,
               CAST(sum(len) AS BIGINT) AS missing_total
        FROM runs GROUP BY 1),
bk AS (SELECT source,
              CASE WHEN len >= 5 THEN '5+'
                   ELSE CAST(len AS VARCHAR) END AS len_bucket,
              CAST(count(*) AS BIGINT) AS n
       FROM runs GROUP BY 1, 2)
SELECT b.source, b.len_bucket, b.n, t.n_gaps, t.longest,
       t.missing_total
FROM bk b JOIN tot t USING (source)
"""


def q_dow_hour_peak(spark, sf_dir):
    """Weekly activity profile per event type: the peak
    (day-of-week, hour) cell, its share, and the top-3 cells' share of
    all events — the interpretable companion to chi2_independence's
    association verdict.  ISO day numbering on both engines; one
    count groupBy + one window rank."""
    ev = _load(spark, sf_dir, "events").select(
        "event_type",
        F.dayofweek("ts").cast("int").alias("dow"),
        F.hour("ts").cast("int").alias("hh"),
    )
    cells = ev.groupBy("event_type", "dow", "hh").agg(
        F.count(F.lit(1)).alias("n")
    )
    wt = Window.partitionBy("event_type")
    ranked = cells.withColumn(
        "total", F.sum("n").over(wt)
    ).withColumn(
        "rk",
        F.row_number().over(
            wt.orderBy(
                F.col("n").desc(), F.col("dow").asc(), F.col("hh").asc()
            )
        ),
    )
    top3 = ranked.where(F.col("rk") <= 3).groupBy("event_type").agg(
        F.sum("n").alias("_top3")
    )
    peak = ranked.where(F.col("rk") == 1)
    return peak.join(top3, "event_type").select(
        "event_type",
        F.col("dow").cast("long").alias("peak_dow"),
        F.col("hh").cast("long").alias("peak_hour"),
        F.col("n").cast("long").alias("peak_n"),
        F.col("total").cast("long").alias("n_events"),
        _r(F.col("n") / F.col("total")).alias("peak_share"),
        _r(F.col("_top3") / F.col("total")).alias("top3_share"),
    )


SQL_DOW_HOUR_PEAK = """
WITH e AS (SELECT event_type,
                  CAST(dayofweek(ts) + 1 AS INTEGER) AS dow,
                  CAST(hour(ts) AS INTEGER) AS hh
           FROM events),
cells AS (SELECT event_type, dow, hh, count(*) AS n
          FROM e GROUP BY 1, 2, 3),
rk AS (SELECT *,
              sum(n) OVER (PARTITION BY event_type) AS total,
              row_number() OVER (PARTITION BY event_type
                                 ORDER BY n DESC, dow ASC, hh ASC) AS rk
       FROM cells),
top3 AS (SELECT event_type, sum(n) AS t3 FROM rk WHERE rk <= 3
         GROUP BY 1)
SELECT r.event_type,
       CAST(r.dow AS BIGINT) AS peak_dow,
       CAST(r.hh AS BIGINT) AS peak_hour,
       CAST(r.n AS BIGINT) AS peak_n,
       CAST(r.total AS BIGINT) AS n_events,
       round(r.n / CAST(r.total AS DOUBLE), 6) AS peak_share,
       round(t.t3 / CAST(r.total AS DOUBLE), 6) AS top3_share
FROM rk r JOIN top3 t USING (event_type)
WHERE r.rk = 1
"""


def q_session_duration_percentiles(spark, sf_dir):
    """Session-duration percentiles by session size class (single /
    small 2-4 / large 5+ events): exact p50/p90/p99 of wall duration
    per class — the latency-distribution view of sessionize_users'
    totals.  One sessionize window, one per-session aggregate, one
    tiny percentile groupBy."""
    from .operators.sessions import _epoch, sessionize

    ev = _load(spark, sf_dir, "events").select("user_id", "ts")
    s = sessionize(ev, ts_col="ts", key_cols=["user_id"], gap_seconds=1800.0)
    per = s.groupBy("user_id", "session_id").agg(
        F.count(F.lit(1)).alias("n_ev"),
        (F.max(_epoch("ts")) - F.min(_epoch("ts"))).alias("dur"),
    )
    cls = F.when(F.col("n_ev") == 1, "single").when(
        F.col("n_ev") <= 4, "small"
    ).otherwise("large")
    return (
        per.groupBy(cls.alias("size_class"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_sessions"),
            _r(F.percentile("dur", F.lit(0.5))).alias("p50_s"),
            _r(F.percentile("dur", F.lit(0.9))).alias("p90_s"),
            _r(F.percentile("dur", F.lit(0.99))).alias("p99_s"),
        )
    )


SQL_SESSION_DURATION_PCT = """
WITH e AS (SELECT user_id, ts, epoch(ts) AS ep FROM events),
m AS (
  SELECT user_id, ts, ep,
         CASE WHEN lag(ep) OVER w IS NULL OR ep - lag(ep) OVER w >= 1800
              THEN 1 ELSE 0 END AS b
  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
s AS (
  SELECT user_id, ep,
         sum(b) OVER (PARTITION BY user_id ORDER BY ts
                      ROWS UNBOUNDED PRECEDING) - 1 AS sid
  FROM m),
per AS (SELECT user_id, sid, count(*) AS n_ev,
               max(ep) - min(ep) AS dur
        FROM s GROUP BY 1, 2),
cls AS (SELECT CASE WHEN n_ev = 1 THEN 'single'
                    WHEN n_ev <= 4 THEN 'small'
                    ELSE 'large' END AS size_class, dur
        FROM per)
SELECT size_class, CAST(count(*) AS BIGINT) AS n_sessions,
       round(quantile_cont(dur, 0.5), 6) AS p50_s,
       round(quantile_cont(dur, 0.9), 6) AS p90_s,
       round(quantile_cont(dur, 0.99), 6) AS p99_s
FROM cls GROUP BY 1
"""


# Registry order is deliberate: the driver snapshot covers ~50 queries
# front-to-back, so queries WITHOUT a prior driver-green CORRECTNESS row
# run first (late round-2 additions + round-3 upgrades); the block after
# them is already rows+schema+hash green in CORRECTNESS_r02.json.
QUERIES = {
    # --- round-5 additions (never driver-verified; the rotation sort
    # below fronts them ahead of the stale window) ---------------------
    "gap_length_histogram": (q_gap_length_histogram,
                             SQL_GAP_LENGTH_HISTOGRAM),
    "dow_hour_peak": (q_dow_hour_peak, SQL_DOW_HOUR_PEAK),
    "session_duration_percentiles": (q_session_duration_percentiles,
                                     SQL_SESSION_DURATION_PCT),
    "session_trigram_paths": (q_session_trigram_paths, SQL_SESSION_TRIGRAMS),
    "wasserstein_drift": (q_wasserstein_drift, SQL_WASSERSTEIN_DRIFT),
    "neyman_allocation": (q_neyman_allocation, SQL_NEYMAN_ALLOCATION),
    "brown_forsythe_var": (q_brown_forsythe, SQL_BROWN_FORSYTHE),
    "chi2_independence": (q_chi2_independence, SQL_CHI2_INDEPENDENCE),
    "record_breaks": (q_record_breaks, SQL_RECORD_BREAKS),
    "boxplot_stats_bins": (q_boxplot_stats, SQL_BOXPLOT_STATS),
    "welch_ab_test": (q_welch_ab_test, SQL_WELCH_AB),
    "ks_two_sample": (q_ks_two_sample, SQL_KS_TWO_SAMPLE),
    "interarrival_burstiness": (q_interarrival_burstiness,
                                SQL_INTERARRIVAL_BURSTINESS),
    "good_turing_spectrum": (q_good_turing, SQL_GOOD_TURING),
    "vocab_overlap_jaccard": (q_vocab_overlap, SQL_VOCAB_OVERLAP),
    "ccf_peak_lag": (q_ccf_peak_lag, SQL_CCF_PEAK_LAG),
    "tpch_q7_two_nation": (q_tpch_q7, SQL_TPCH_Q7),
    "tpch_q13_custdist": (q_tpch_q13, SQL_TPCH_Q13),
    "markov_transitions": (q_markov_transitions, SQL_MARKOV_TRANSITIONS),
    "spectral_entropy": (q_spectral_entropy, SQL_SPECTRAL_ENTROPY),
    "cointegration_pairs": (q_cointegration_pairs, SQL_COINTEGRATION),
    "isotonic_fit": (q_isotonic_fit, SQL_ISOTONIC),
    "arch_lm_test": (q_arch_lm, SQL_ARCH_LM),
    "runs_test": (q_runs_test, SQL_RUNS_TEST),
    "turning_points_test": (q_turning_points, SQL_TURNING_POINTS),
    "benford_digits": (q_benford_digits, SQL_BENFORD),
    "dgim_window_count": (q_dgim_window_count, SQL_DGIM_WINDOW),
    "seasonal_mann_kendall": (q_seasonal_mann_kendall, SQL_SEASONAL_MK),
    "table_profile": (q_table_profile, SQL_TABLE_PROFILE),
    "key_skew_gini": (q_key_skew_gini, SQL_KEY_SKEW_GINI),
    "tpch_q18_big_orders": (q_tpch_q18, SQL_TPCH_Q18),
    "rrf_fusion_topk": (q_rrf_fusion, SQL_RRF_FUSION),
    "mann_kendall_trend": (q_mann_kendall, SQL_MANN_KENDALL),
    "psi_drift": (q_psi_drift, SQL_PSI_DRIFT),
    "seq_pattern_match": (q_seq_pattern_match, SQL_SEQ_PATTERN),
    "tpch_q5_local_supplier": (q_tpch_q5, SQL_TPCH_Q5),
    "tpch_q14_promo": (q_tpch_q14, SQL_TPCH_Q14),
    "tpch_q10_returns": (q_tpch_q10, SQL_TPCH_Q10),
    "textrank_keywords": (q_textrank_keywords, SQL_TEXTRANK),
    "session_type_affinity": (q_session_affinity, SQL_SESSION_AFFINITY),
    "scd2_history": (q_scd2_history, SQL_SCD2_HISTORY),
    "tpch_q1_pricing": (q_tpch_q1, SQL_TPCH_Q1),
    "tpch_q3_shipping": (q_tpch_q3, SQL_TPCH_Q3),
    "tpch_q6_revenue": (q_tpch_q6, SQL_TPCH_Q6),
    "heaps_law": (q_heaps_law, SQL_HEAPS_LAW),
    "rolling_distinct_actors": (q_rolling_distinct, SQL_ROLLING_DISTINCT),
    "token_bucket_replay": (q_token_bucket, SQL_TOKEN_BUCKET),
    "cube_rollup": (q_cube_rollup, SQL_CUBE_ROLLUP),
    "binseg_changepoints": (q_binseg_changepoints, SQL_BINSEG),
    "json_props_extract": (q_json_props_extract, SQL_JSON_PROPS),
    "spearman_pairs": (q_spearman_pairs, SQL_SPEARMAN_PAIRS),
    "permutation_entropy": (q_permutation_entropy,
                            SQL_PERMUTATION_ENTROPY),
    "croston_forecast": (q_croston_forecast, SQL_CROSTON_FORECAST),
    "page_hinkley_drift": (q_page_hinkley, SQL_PAGE_HINKLEY),
    "granger_pairs": (q_granger_pairs, SQL_GRANGER_PAIRS),
    "lomb_scargle_peak": (q_lomb_scargle, SQL_LOMB_SCARGLE),
    "allan_variance": (q_allan_variance, SQL_ALLAN_VARIANCE),
    "funnel_conversion": (q_funnel_conversion, SQL_FUNNEL_CONVERSION),
    "retention_cohorts": (q_retention_cohorts, SQL_RETENTION_COHORTS),
    "kleinberg_bursts": (q_kleinberg_bursts, SQL_KLEINBERG_BURSTS),
    "sax_dtw_motifs": (q_sax_dtw_motifs, SQL_SAX_DTW_MOTIFS),
    "top_correlated_pairs": (q_top_correlated_pairs,
                             SQL_TOP_CORRELATED_PAIRS),
    "zipf_slope": (q_zipf_slope, SQL_ZIPF_SLOPE),
    "ngram_novelty": (q_ngram_novelty, SQL_NGRAM_NOVELTY),
    "variance_ratio": (q_variance_ratio, SQL_VARIANCE_RATIO),
    "source_kl_divergence": (q_source_kl, SQL_SOURCE_KL),
    "dtw_exemplar": (q_dtw_exemplar, SQL_DTW_EXEMPLAR),
    "hurst_rs": (q_hurst_rs, SQL_HURST_RS),
    "kalman_local_level": (q_kalman_local_level, SQL_KALMAN_LOCAL_LEVEL),
    "dft_power_peak": (q_dft_power_peak, SQL_DFT_POWER_PEAK),
    "pacf_yule_walker": (q_pacf_yule_walker, SQL_PACF_YULE_WALKER),
    "seasonal_decompose": (q_seasonal_decompose, SQL_SEASONAL_DECOMPOSE),
    "seasonal_naive_backtest": (q_seasonal_naive_backtest,
                                SQL_SEASONAL_NAIVE),
    "bigram_logprob": (q_bigram_logprob, SQL_BIGRAM_LOGPROB),
    "tfidf_top_terms": (q_tfidf_top_terms, SQL_TFIDF_TOP_TERMS),
    "ljung_box": (q_ljung_box, SQL_LJUNG_BOX),
    "sax_motif_buckets": (q_sax_motif_buckets, SQL_SAX_MOTIF_BUCKETS),
    "matrix_profile": (q_matrix_profile, SQL_MATRIX_PROFILE),
    "bloom_decontaminate": (q_bloom_decontaminate,
                            SQL_BLOOM_DECONTAMINATE),
    "holt_winters_smooth": (q_holt_winters, SQL_HOLT_WINTERS),
    "cm_heavy_hitters": (q_cm_heavy_hitters, SQL_CM_HEAVY_HITTERS),
    "sax_symbolize": (q_sax_symbolize, SQL_SAX_SYMBOLIZE),
    "asap_smooth": (q_asap_smooth, SQL_ASAP_SMOOTH),
    # --- round-4 additions (never driver-verified, newest first) -----
    "ddsketch_quantile_tiers": (q_ddsketch_tiers, SQL_DDSKETCH_TIERS),
    "ddsketch_collapse": (q_ddsketch_collapse, SQL_DDSKETCH_COLLAPSE),
    "rollup_compose_family": (q_rollup_compose_family,
                              SQL_ROLLUP_COMPOSE_FAMILY),
    "tier_snapshot_travel": (q_tier_snapshot_travel, SQL_SNAPSHOT_TRAVEL),
    "holt_smooth": (q_holt_smooth, SQL_HOLT_SMOOTH),
    "theil_sen_trend": (q_theil_sen, SQL_THEIL_SEN),
    "freq_topk_tiers": (q_freq_topk_tiers, SQL_FREQ_TOPK_TIERS),
    "cusum_changepoint": (q_cusum_changepoint, SQL_CUSUM_CHANGEPOINT),
    "m4_downsample": (q_m4_downsample, SQL_M4_DOWNSAMPLE),
    "savgol_smooth": (q_savgol_smooth, SQL_SAVGOL_SMOOTH),
    "interpolated_twa": (q_interpolated_twa, SQL_INTERPOLATED_TWA),
    # --- promoted from rows-only to self-verifying oracles (r4):
    # in-query invariants vs seed-free twins the driver can hash.
    # Never hash-verified before, so they lead the capped snapshot ----
    "quality_classifier": (q_quality_classifier, SQL_QUALITY_CLASSIFIER),
    "dedup_minhash_lsh": (q_minhash_dedup_docs, SQL_DEDUP_MINHASH),
    "similarity_topk_lsh": (q_cosine_lsh_topk, SQL_SIMILARITY_LSH),
    "ml_gapfill_rf": (q_rf_gapfill, SQL_RF_GAPFILL),
    "similarity_topk_ivf": (q_ivf_topk, SQL_SIMILARITY_IVF),
    # --- new in r4 ---------------------------------------------------
    "fit_ci_bands": (q_fit_ci_bands, SQL_FIT_CI_BANDS),
    "arrival_stats_bins": (q_arrival_stats, SQL_ARRIVAL_STATS),
    "acf_agg_bins": (q_acf_agg, SQL_ACF_AGG),
    "topk_agg_bins": (q_topk_agg, SQL_TOPK_AGG),
    "robust_zscore": (q_robust_zscore, SQL_ROBUST_ZSCORE),
    "stats2d_tiers": (q_stats2d_tiers, SQL_STATS2D),
    "seasonal_zscore": (q_seasonal_zscore, SQL_SEASONAL_ZSCORE),
    "cusum_chart": (q_cusum_chart, SQL_CUSUM_CHART),
    "ewma_chart": (q_ewma_chart, SQL_EWMA_CHART),
    "candle_agg_tiers": (q_candle_agg, SQL_CANDLE_AGG),
    "gauge_agg_bins": (q_gauge_agg, SQL_GAUGE_AGG),
    "hll_distinct_tiers": (q_hll_distinct_tiers, SQL_HLL_DISTINCT),
    "hist_sketch_percentiles": (q_hist_sketch_percentiles, SQL_HIST_SKETCH),
    "counter_agg_bins": (q_counter_agg, SQL_COUNTER_AGG),
    "ltob_downsample": (q_ltob_downsample, SQL_LTOB),
    "time_weighted_avg": (q_time_weighted_avg, SQL_TIME_WEIGHTED_AVG),
    "state_agg_bins": (q_state_agg, SQL_STATE_AGG),
    "heartbeat_agg_bins": (q_heartbeat_agg, SQL_HEARTBEAT_AGG),
    "bin_entropy": (q_bin_entropy, SQL_BIN_ENTROPY),
    # --- never driver-verified (newest first) ------------------------
    "tier_retention": (q_tier_retention, SQL_TIER_RETENTION),
    "tier_compact": (q_tier_compact, SQL_TIER_COMPACT),
    "pii_redaction": (q_pii_redaction, SQL_PII_REDACTION),
    "stratified_sample": (q_stratified_sample, SQL_STRATIFIED_SAMPLE),
    "interval_join_windows": (q_interval_join, SQL_INTERVAL_JOIN),
    "sessionize_users": (q_sessionize, SQL_SESSIONIZE),
    "embedding_neardup_exact": (q_embedding_neardup, SQL_EMBEDDING_NEARDUP),
    "distinct_rollup": (q_distinct_rollup, SQL_DISTINCT_ROLLUP),
    "top_ngrams": (q_top_ngrams, SQL_TOP_NGRAMS),
    "clean_text_normalize": (q_clean_text, SQL_CLEAN_TEXT),
    "hash_split_frozen": (q_hash_split, SQL_HASH_SPLIT),
    "rolling_correlation": (q_rolling_correlation, SQL_ROLLING_CORR),
    "boilerplate_removal": (q_boilerplate_removal, SQL_BOILERPLATE),
    "unigram_logprob": (q_unigram_logprob, SQL_UNIGRAM_LOGPROB),
    "winsorize_clip": (q_winsorize, SQL_WINSORIZE),
    # --- new / upgraded this round ----------------------------------
    "gorilla_roundtrip": (q_gorilla_roundtrip, SQL_GORILLA_ROUNDTRIP),
    "tier_cascade": (q_tier_cascade, SQL_TIER_CASCADE),
    "linear_fit": (q_linear_fit, SQL_LINEAR_FIT),
    "multimodal_decode": (q_multimodal_decode, SQL_MULTIMODAL_DECODE),
    "ustar_mpt": (q_ustar_mpt, SQL_USTAR_MPT),
    "decontaminate_ngrams": (q_decontaminate, SQL_DECONTAMINATE),
    "perplexity_bucket_sample": (q_perplexity_sample, SQL_PERPLEXITY_SAMPLE),
    "pack_sequences": (q_pack_sequences, SQL_PACK_SEQUENCES),
    "temperature_mix": (q_temperature_mix, SQL_TEMPERATURE_MIX),
    "duplicate_token_spans": (q_duplicate_token_spans,
                              SQL_DUPLICATE_TOKEN_SPANS),
    "mask_duplicate_spans": (q_mask_duplicate_spans,
                             SQL_MASK_DUPLICATE_SPANS),
    "semantic_dedup": (q_semantic_dedup, SQL_SEMANTIC_DEDUP),
    "tier_incremental_merge": (q_tier_incremental_merge,
                               SQL_TIER_INCREMENTAL_MERGE),
    # --- promoted from rows-only to self-verifying oracles this round
    "compression_ratio": (q_compression_ratio, SQL_COMPRESSION_RATIO),
    "dedup_simhash": (q_simhash_docs, SQL_DEDUP_SIMHASH),
    "similarity_ivf_exact": (q_ivf_topk_exact, SQL_IVF_EXACT),
    "bpe_pair_counts": (q_bpe_pair_counts, SQL_BPE_PAIR_COUNTS),
    # --- driver-green in CORRECTNESS_r02.json -----------------------
    "rollup_mincount_gate": (q_rollup, SQL_ROLLUP),
    "rollup_compose_tiers": (q_rollup_compose, SQL_ROLLUP_COMPOSE),
    "sstats_battery": (q_sstats, SQL_SSTATS),
    "percentile_ladder": (q_percentile_ladder, SQL_PERCENTILE_LADDER),
    "histogram_fixed_bins": (q_histogram, SQL_HISTOGRAM),
    "gapfinder_runs": (q_gapfinder, SQL_GAPFINDER),
    "interpolate_limited": (q_interpolate, SQL_INTERPOLATE),
    "zscore_outliers": (q_zscore, SQL_ZSCORE),
    "zscore_increments": (q_zscore_increments, SQL_ZSCORE_INCR),
    "localsd_hampel": (q_localsd, SQL_LOCALSD),
    "absolute_limits": (q_abs_limits, SQL_ABS_LIMITS),
    "qcf_combiner": (q_qcf, SQL_QCF),
    "daily_correlation": (q_daily_corr, SQL_DAILY_CORR),
    "diel_cycle": (q_diel_cycle, SQL_DIEL),
    "circular_mean_kanda": (q_circular_mean, SQL_CIRCULAR),
    "setto_threshold": (q_setto_threshold, SQL_SETTO_THRESHOLD),
    "dedup_keep_last": (q_dedup_keep_last, SQL_DEDUP_KEEP_LAST),
    "freq_detect": (q_freq_detect, SQL_FREQ_DETECT),
    "grid_completion": (q_grid_completion, SQL_GRID_COMPLETION),
    "rolling_mean_gated": (q_rolling_mean, SQL_ROLLING_MEAN),
    "lookup_table_fill": (q_lookup_fill, SQL_LOOKUP_FILL),
    "dedup_exact": (q_exact_dedup_docs, SQL_EXACT_DEDUP),
    "token_count": (q_token_count, SQL_TOKEN_COUNT),
    "language_id": (q_lang_id, SQL_LANG_ID),
    "quality_features": (q_quality_features, SQL_QUALITY_FEATURES),
    "similarity_topk_cosine": (q_cosine_topk, SQL_COSINE_TOPK),
    "ngram_jaccard": (q_ngram_jaccard_docs, SQL_NGRAM_JACCARD),
    "lagged_variants": (q_lagged_variants, SQL_LAGGED),
    "backfill_limited": (q_backfill_limited, SQL_BACKFILL),
    "banded_uncertainty": (q_banded_uncertainty, SQL_BANDED_UNC),
    "banded_uncertainty_m2m3": (q_banded_unc_m2m3, SQL_BANDED_UNC_M2M3),
    "ustar_scenarios": (q_ustar_scenarios, SQL_USTAR),
    "crosscov_scan": (q_crosscov_scan, SQL_CROSSCOV),
    "daily_full_gate": (q_daily_full_gate, SQL_DAILY_GATE),
    "sorting_bins_decoupling": (q_sorting_bins, SQL_SORTING_BINS),
    "quantile_xy_agg_z": (q_quantile_xy, SQL_QUANTILE_XY),
    "histogram_peak_bins": (q_peak_bins, SQL_PEAK_BINS),
    "cumulative_envelope": (q_cumulative_envelope, SQL_CUMULATIVE),
    "rollup_time_30min": (q_rollup_time30min, SQL_ROLLUP_TIME),
    "rollup_weekly_calendar": (q_weekly_rollup, SQL_WEEKLY),
    "optimum_range": (q_optimum_range, SQL_OPTIMUM_RANGE),
    "winddir_offset_sweep": (q_winddir_offset, SQL_WINDDIR),
    "screening_pipeline_ep2": (q_screening_pipeline, SQL_SCREENING),
    "ml_gapfill_rf_flags": (q_rf_gapfill_flags, SQL_RF_FLAGS),
    "quadratic_fit": (q_quadratic_fit, SQL_QUADRATIC_FIT),
    "critical_heat_days": (q_critical_heat_days, SQL_CRITICAL_HEAT_DAYS),
    "asof_join_backward": (q_asof_join, SQL_ASOF_JOIN),
    "csv_ingest_filetype": (q_csv_ingest, SQL_CSV_INGEST),
    "neardup_components": (q_neardup_components, SQL_NEARDUP_COMPONENTS),
    "repetition_features": (q_repetition_features, SQL_REPETITION),
}

# Driver snapshot-window rotation (r5, VERDICT.md "Next round" #2):
# the driver hashes the FIRST ~50 registry entries each round, so the
# registry is ordered least-recently-driver-verified first — the r5
# snapshot re-proves the 50 oldest certificates (r2-era) instead of
# re-hashing the queries r4 just covered.  The map records the round
# of each query's most recent CORRECTNESS_r0N.json appearance.
_LAST_DRIVER_VERIFIED = {
    "ddsketch_quantile_tiers": 4,
    "ddsketch_collapse": 4,
    "rollup_compose_family": 4,
    "tier_snapshot_travel": 4,
    "holt_smooth": 4,
    "theil_sen_trend": 4,
    "freq_topk_tiers": 4,
    "cusum_changepoint": 4,
    "m4_downsample": 4,
    "savgol_smooth": 4,
    "interpolated_twa": 4,
    "quality_classifier": 4,
    "dedup_minhash_lsh": 4,
    "similarity_topk_lsh": 4,
    "ml_gapfill_rf": 4,
    "similarity_topk_ivf": 4,
    "fit_ci_bands": 4,
    "arrival_stats_bins": 4,
    "acf_agg_bins": 4,
    "topk_agg_bins": 4,
    "robust_zscore": 4,
    "stats2d_tiers": 4,
    "seasonal_zscore": 4,
    "cusum_chart": 4,
    "ewma_chart": 4,
    "candle_agg_tiers": 4,
    "gauge_agg_bins": 4,
    "hll_distinct_tiers": 4,
    "hist_sketch_percentiles": 4,
    "counter_agg_bins": 4,
    "ltob_downsample": 4,
    "time_weighted_avg": 4,
    "state_agg_bins": 4,
    "heartbeat_agg_bins": 4,
    "bin_entropy": 4,
    "tier_retention": 4,
    "pii_redaction": 4,
    "stratified_sample": 4,
    "interval_join_windows": 4,
    "sessionize_users": 4,
    "embedding_neardup_exact": 4,
    "distinct_rollup": 4,
    "top_ngrams": 4,
    "clean_text_normalize": 4,
    "hash_split_frozen": 4,
    "rolling_correlation": 4,
    "boilerplate_removal": 4,
    "unigram_logprob": 4,
    "winsorize_clip": 4,
    "gorilla_roundtrip": 4,
    "tier_cascade": 3,
    "linear_fit": 3,
    "multimodal_decode": 3,
    "ustar_mpt": 3,
    "decontaminate_ngrams": 3,
    "perplexity_bucket_sample": 3,
    "pack_sequences": 3,
    "temperature_mix": 3,
    "duplicate_token_spans": 3,
    "mask_duplicate_spans": 3,
    "semantic_dedup": 3,
    "tier_incremental_merge": 3,
    "compression_ratio": 3,
    "dedup_simhash": 3,
    "similarity_ivf_exact": 3,
    "bpe_pair_counts": 3,
    "rollup_mincount_gate": 2,
    "rollup_compose_tiers": 2,
    "sstats_battery": 2,
    "percentile_ladder": 2,
    "histogram_fixed_bins": 2,
    "gapfinder_runs": 2,
    "interpolate_limited": 2,
    "zscore_outliers": 2,
    "zscore_increments": 2,
    "localsd_hampel": 2,
    "absolute_limits": 2,
    "qcf_combiner": 2,
    "daily_correlation": 2,
    "diel_cycle": 2,
    "circular_mean_kanda": 2,
    "setto_threshold": 2,
    "dedup_keep_last": 2,
    "freq_detect": 2,
    "grid_completion": 2,
    "rolling_mean_gated": 2,
    "lookup_table_fill": 2,
    "dedup_exact": 2,
    "token_count": 2,
    "language_id": 2,
    "quality_features": 2,
    "similarity_topk_cosine": 2,
    "ngram_jaccard": 2,
    "lagged_variants": 2,
    "backfill_limited": 2,
    "banded_uncertainty": 2,
    "banded_uncertainty_m2m3": 2,
    "ustar_scenarios": 2,
    "crosscov_scan": 2,
    "daily_full_gate": 2,
    "sorting_bins_decoupling": 2,
    "quantile_xy_agg_z": 2,
    "histogram_peak_bins": 2,
    "cumulative_envelope": 2,
    "rollup_time_30min": 2,
    "rollup_weekly_calendar": 2,
    "optimum_range": 2,
    "winddir_offset_sweep": 2,
    "screening_pipeline_ep2": 2,
    "ml_gapfill_rf_flags": 2,
    "quadratic_fit": 2,
    "critical_heat_days": 2,
    "asof_join_backward": 2,
    "csv_ingest_filetype": 2,
    "neardup_components": 2,
    "repetition_features": 2,
}

_order = {k: i for i, k in enumerate(QUERIES)}
QUERIES = dict(sorted(
    QUERIES.items(),
    key=lambda kv: (_LAST_DRIVER_VERIFIED.get(kv[0], 0), _order[kv[0]]),
))
