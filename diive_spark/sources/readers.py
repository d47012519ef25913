"""Sources & sinks: config-driven CSV ingest, multi-file merge, parquet
round trip, FLUXNET-style export.

Reference semantics:
- filetype configs (YAML: skiprows, header rows, NA values, timestamp
  column/format, declared frequency) — diive/core/io/filereader.py:41-129
  validate; :276-536 parse.  Spark: ``spark.read.csv`` options derived
  from the same dict; numeric coercion == the reference's
  ``pd.to_numeric(errors='coerce')`` (:465-474) via try_cast.
- MultiDataFileReader merge: many files, first non-null wins per
  timestamp (``combine_first``, filereader.py:263-273) -> union +
  groupBy(t).agg(first(col, ignorenulls=True)) ordered by file priority.
- duplicate column names deduped with .1/.2 suffixes
  (ColumnNamesSanitizer, filereader.py:157-212).
- FLUXNET export (diive/pkgs/formats/fluxnet.py:31-322): fillna(-9999),
  TIMESTAMP_START/END columns formatted %Y%m%d%H%M (times.py:12-19),
  one partition per year.
"""

from __future__ import annotations

from typing import Sequence

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ..conventions import NA_SENTINEL


def read_csv_filetype(
    spark: SparkSession,
    path: str,
    config: dict,
) -> DataFrame:
    """Config-driven CSV reader.  ``config`` keys (YAML filetype analog):
    ``skiprows`` (int), ``header`` (bool), ``na_values`` (list),
    ``sep`` (str), ``timestamp_col``/``timestamp_format`` (str),
    ``numeric_cols`` ('all' or list).
    """
    reader = (
        spark.read.option("header", str(config.get("header", True)).lower())
        .option("sep", config.get("sep", ","))
        .option("skipRows", int(config.get("skiprows", 0)))
        .option("nullValue", str(config.get("na_values", [NA_SENTINEL])[0]))
    )
    df = reader.csv(path)
    for nv in config.get("na_values", [NA_SENTINEL])[1:]:
        for c in df.columns:
            df = df.withColumn(c, F.when(F.col(c) == str(nv), None).otherwise(F.col(c)))
    ts_col = config.get("timestamp_col")
    if ts_col:
        fmt = config.get("timestamp_format", "yyyy-MM-dd HH:mm:ss")
        df = df.withColumn(ts_col, F.to_timestamp(F.col(ts_col), fmt))
    numeric = config.get("numeric_cols", "all")
    cols = [c for c in df.columns if c != ts_col]
    targets = cols if numeric == "all" else [c for c in cols if c in numeric]
    for c in targets:
        # pd.to_numeric(errors='coerce') parity: unparseable -> NULL
        df = df.withColumn(c, F.col(c).try_cast("double"))
    return df


def dedup_column_names(columns: Sequence[str]) -> list[str]:
    """.1/.2 suffixes for duplicate names (filereader.py:157-212)."""
    seen: dict[str, int] = {}
    out = []
    for c in columns:
        if c in seen:
            seen[c] += 1
            out.append(f"{c}.{seen[c]}")
        else:
            seen[c] = 0
            out.append(c)
    return out


def merge_files_combine_first(
    dfs: Sequence[DataFrame],
    ts_col: str,
    value_cols: Sequence[str],
) -> DataFrame:
    """combine_first merge (filereader.py:263-273): earlier files win;
    later files only fill timestamps/values the earlier ones lack.
    Implemented as union + per-timestamp first(ignorenulls) ordered by
    file priority — one shuffle regardless of file count."""
    tagged = [
        df.select(ts_col, *value_cols).withColumn("_prio", F.lit(i))
        for i, df in enumerate(dfs)
    ]
    allrows = tagged[0]
    for t in tagged[1:]:
        allrows = allrows.unionByName(t)
    # first non-null in priority order: min_by over rows where col not null
    aggs = [
        F.min_by(F.col(c), F.when(F.col(c).isNotNull(), F.col("_prio"))).alias(c)
        for c in value_cols
    ]
    return allrows.groupBy(ts_col).agg(*aggs)


def export_fluxnet(
    df: DataFrame,
    out_dir: str,
    ts_col: str = "ts",
    freq_minutes: int = 30,
) -> None:
    """FLUXNET-style export (fluxnet.py:31-322): -9999 for missing,
    TIMESTAMP_START/END as yyyyMMddHHmm strings, partitioned by year."""
    start = F.col(ts_col)
    end = F.col(ts_col) + F.expr(f"INTERVAL {freq_minutes} MINUTES")
    out = (
        df.withColumn("TIMESTAMP_START", F.date_format(start, "yyyyMMddHHmm"))
        .withColumn("TIMESTAMP_END", F.date_format(end, "yyyyMMddHHmm"))
        .withColumn("_year", F.year(start))
        .drop(ts_col)
        .na.fill(NA_SENTINEL)
    )
    out.write.mode("overwrite").partitionBy("_year").option("header", "true").csv(out_dir)


def save_parquet(df: DataFrame, path: str, partition_cols: Sequence[str] = ()) -> None:
    """Parquet sink (files.py:22-63 analog); partitioning explicit."""
    w = df.write.mode("overwrite")
    if partition_cols:
        w = w.partitionBy(*partition_cols)
    w.parquet(path)


def load_parquet(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)


def save_pickle(obj, path: str) -> str:
    """Checkpoint analog of the reference's ``save_as_pickle``
    (diive core/io/files.py:66-76), split by artifact kind — a pickled
    JVM-backed DataFrame would be meaningless, so:

    - a Spark ``DataFrame`` is persisted as parquet plus a ``.schema``
      sidecar holding the exact DDL (types survive bit-for-bit,
      readable by any engine — the distributed-safe equivalent of
      pickling a pandas frame);
    - anything else (fitted params, config dicts, thresholds — the
      small driver-side objects the reference actually pickles) goes
      through ``pickle`` unchanged.

    Returns the written path.  ``load_pickle`` dispatches on the
    sidecar's presence, so call sites keep the reference's
    save/load symmetry."""
    import pickle

    if isinstance(obj, DataFrame):
        obj.write.mode("overwrite").parquet(path)
        with open(path + ".schema", "w") as f:
            f.write(obj.schema.json())
        return path
    with open(path, "wb") as f:
        pickle.dump(obj, f)
    return path


def load_pickle(spark: SparkSession, path: str):
    """Counterpart of :func:`save_pickle` (reference
    core/io/files.py:78-85): DataFrames come back with the EXACT saved
    schema enforced (the sidecar DDL is applied to the scan, so a
    checkpoint round trip never silently widens or reorders types);
    other objects unpickle."""
    import os as _os
    import pickle

    from pyspark.sql.types import StructType

    if _os.path.exists(path + ".schema"):
        with open(path + ".schema") as f:
            schema = StructType.fromJson(__import__("json").loads(f.read()))
        return spark.read.schema(schema).parquet(path)
    with open(path, "rb") as f:
        return pickle.load(f)


def parse_json_col(
    df: DataFrame,
    json_col: str,
    schema: str,
    prefix: str = "",
    keep: bool = False,
) -> DataFrame:
    """Schema-on-read JSON extraction: parse a string column of JSON
    objects into typed top-level columns via the JVM ``from_json``
    (vectorized Jackson parse — never a Python UDF).  ``schema`` is a
    DDL fragment (``"k INT, tag STRING"``); malformed rows yield null
    fields (PERMISSIVE), keeping ingestion total.  The reference's
    config pipeline is YAML-side only (diive core/io/filereader.py);
    event payloads like the events table's ``props`` need this
    in-plan parse.  Columns come out as ``prefix + field``; the raw
    JSON column is dropped unless ``keep``.

    Scale: a per-row JVM projection — no shuffle, pushdown-neutral
    (the parse happens after the scan; filters on extracted fields
    still prune partitions/row-groups on the RAW columns feeding it).
    """
    import pyspark.sql.functions as F

    parsed = F.from_json(F.col(json_col), schema)
    out = df.withColumn("_j", parsed)
    names = [f.strip().split()[0] for f in schema.split(",")]
    for n in names:
        out = out.withColumn(prefix + n, F.col("_j")[n])
    out = out.drop("_j")
    return out if keep else out.drop(json_col)
