"""Filetype-config CSV ingest with reference parity.

Reference semantics (diive/core/io/filereader.py):
- YAML filetype configs (GENERAL/FILE/TIMESTAMP/DATA sections) declare
  skip rows, header rows, NA values, delimiter, timestamp column(s) +
  strptime format + START/MIDDLE/END convention, declared frequency
  (ConfigFileReader, filereader.py:41-129; configs/filetypes/*.yml).
- 2-row header: row 1 = variable names, row 2 = units; a single-row
  header gets a synthetic '-no-units-' units row
  (filereader.py:422-428, 497-536).
- Header/data column-count reconciliation: when the first data row has
  more fields than the header, auto-generate ('unknown-N', '[-unknown-]')
  columns (filereader.py:430-463).
- Duplicate column names deduped with .1/.2 suffixes
  (ColumnNamesSanitizer, filereader.py:157-212).
- All data columns coerced to numeric, unparseable -> NULL
  (filereader.py:465-474); rows whose timestamp fails to parse are
  dropped (TimestampSanitizer drops NaT rows).
- Timestamp shifted to MIDDLE convention when requested
  (core/times/times.py:958-1042).
- Variable metadata frame: one row per variable with UNITS / TAGS /
  ADDED / VARINDEX (filereader.py:385-400).

Spark-first design notes:
- Header rows are read with ``sc.textFile(path).take(n)`` — reads only
  the first split of the first file, works on any Hadoop-compatible FS,
  no driver-side ``open()`` needed for remote storage.
- The preamble (skip + header rows) is dropped DISTRIBUTEDLY by the
  timestamp-parse filter: any row whose timestamp expression fails
  ``try_to_timestamp`` is not data.  This avoids a non-distributable
  "first k lines of the file" filter and matches the reference's
  drop-NaT sanitizer.
- Numeric coercion is ``try_cast`` (JVM-side), never a Python UDF.
"""

from __future__ import annotations

import csv
import io
import os
import tempfile
import zipfile
from typing import Sequence

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StringType, StructField, StructType

from .readers import dedup_column_names

NO_UNITS = "-no-units-"
UNKNOWN_UNITS = "[-unknown-]"

# pandas offset alias -> seconds (the subset the filetype configs use)
_FREQ_UNIT_SECONDS = {
    "S": 1,
    "s": 1,
    "T": 60,
    "MIN": 60,
    "min": 60,
    "H": 3600,
    "h": 3600,
    "D": 86400,
    "d": 86400,
}


def parse_freq_seconds(freq: str) -> int:
    """'30T' / '1MIN' / '30min' / 'H' -> seconds (pandas offset aliases)."""
    s = str(freq).strip()
    num = ""
    while s and (s[0].isdigit()):
        num, s = num + s[0], s[1:]
    unit = s.strip()
    if unit not in _FREQ_UNIT_SECONDS:
        raise ValueError(f"unsupported frequency alias: {freq!r}")
    return int(num or "1") * _FREQ_UNIT_SECONDS[unit]


_STRPTIME_TO_SPARK = [
    ("%Y", "yyyy"),
    ("%y", "yy"),
    ("%m", "MM"),
    ("%d", "dd"),
    ("%H", "HH"),
    ("%M", "mm"),
    ("%S", "ss"),
    ("%j", "DDD"),
    ("%f", "SSSSSS"),
]


def strptime_to_spark(fmt: str) -> str:
    """Convert a strptime format ('%Y-%m-%d %H:%M:%S') to a Spark
    datetime pattern ('yyyy-MM-dd HH:mm:ss')."""
    out = fmt
    for py, sp in _STRPTIME_TO_SPARK:
        out = out.replace(py, sp)
    if "%" in out:
        raise ValueError(f"unsupported strptime directive in {fmt!r}")
    return out


def load_filetype_config(yaml_path: str) -> dict:
    """Load a reference-style filetype YAML (ConfigFileReader analog,
    filereader.py:41-129)."""
    import yaml

    with open(yaml_path) as fh:
        cfg = yaml.safe_load(fh)
    for section in ("FILE", "TIMESTAMP", "DATA"):
        if section not in cfg:
            raise ValueError(f"filetype config missing section {section}")
    return cfg


def available_filetypes(configs_dir: str) -> dict:
    """Map filetype NAME -> yaml path for every *.yml in a directory
    (get_filetypes analog, filereader.py:119-129)."""
    out = {}
    for fn in sorted(os.listdir(configs_dir)):
        if fn.endswith((".yml", ".yaml")):
            path = os.path.join(configs_dir, fn)
            cfg = load_filetype_config(path)
            out[cfg.get("GENERAL", {}).get("NAME", fn)] = path
    return out


def _qcol(name: str):
    "F.col with backtick quoting — raw CSV names may contain dots."
    return F.col("`" + name + "`")


def _maybe_unzip(path: str, compression: str) -> str:
    """Zip archives are not splittable or Spark-readable; extract the
    single member driver-side (reference unzips too, filereader.py via
    unzip_file).  gzip needs nothing — Spark reads .gz natively.  At
    100 TB, zips should be pre-converted; this path is per-small-file."""
    if str(compression).lower() != "zip":
        return path
    out_dir = tempfile.mkdtemp(prefix="diive_unzip_")
    with zipfile.ZipFile(path) as zf:
        members = [m for m in zf.namelist() if not m.endswith("/")]
        extracted = [zf.extract(m, out_dir) for m in members]
    if len(extracted) != 1:
        raise ValueError(f"expected 1 member in {path}, found {len(extracted)}")
    return extracted[0]


def _peek_lines(spark: SparkSession, path: str, n: int) -> list[str]:
    """First ``n`` physical lines of ``path`` — reads only the first
    split (RDD take), FS-agnostic."""
    return spark.sparkContext.textFile(path, 1).take(n)


def _split_csv_line(line: str, sep: str) -> list[str]:
    return next(csv.reader(io.StringIO(line), delimiter=sep))


def parse_header(
    spark: SparkSession,
    path: str,
    skiprows: Sequence[int],
    headerrows: Sequence[int],
    sep: str = ",",
) -> tuple[list[tuple[str, str]], int]:
    """Build the (name, units) header list with column-count
    reconciliation (filereader.py:422-463).

    Returns ``(headercols, n_preamble)`` where ``headercols`` has one
    (name, units) tuple per DATA column (auto-generated 'unknown-N'
    names appended when the first data row is wider than the header)
    and ``n_preamble`` is the number of non-data lines at file head.
    """
    skiprows = list(skiprows or [])
    headerrows = list(headerrows or [])
    n_preamble = len(skiprows) + len(headerrows)
    lines = _peek_lines(spark, path, n_preamble + 1)
    if len(lines) <= n_preamble:
        raise ValueError(f"{path}: no data rows after {n_preamble} preamble lines")
    # header rows are indexed AFTER dropping skiprows (pandas skiprows+header)
    kept = [ln for i, ln in enumerate(lines) if i not in set(skiprows)]
    header_lines = [_split_csv_line(kept[i], sep) for i in headerrows]
    first_data = _split_csv_line(lines[n_preamble], sep)

    names = header_lines[0] if header_lines else []
    units = header_lines[1] if len(header_lines) > 1 else [NO_UNITS] * len(names)
    units = units + [NO_UNITS] * (len(names) - len(units))
    headercols = list(zip(names, units))
    # reconciliation: more data cols than header cols -> generated names
    # (deterministic suffix instead of the reference's time-microseconds)
    for m in range(1, len(first_data) - len(headercols) + 1):
        headercols.append((f"unknown-{m}", UNKNOWN_UNITS))
    return headercols, n_preamble


def _timestamp_expr(
    index_column,
    names: list[str],
    units: list[str],
    fmt_spark: str,
):
    """Column expression for the raw timestamp per INDEX_COLUMN spec:
    ``[0]`` -> positional; ``[[name, units], ...]`` -> the named columns
    concatenated with a space (filereader.py:404-420)."""
    if not index_column:
        return None, []
    if isinstance(index_column[0], int):
        src = [names[i] for i in index_column]
    else:
        src = []
        for pair in index_column:
            want = (pair[0], pair[1])
            hits = [n for n, u in zip(names, units) if (n, u) == want or n == pair[0]]
            if not hits:
                raise ValueError(f"timestamp column {want} not in header")
            src.append(hits[0])
    expr = F.concat_ws(" ", *[F.col("`" + c + "`") for c in src])
    return F.try_to_timestamp(expr, F.lit(fmt_spark)), src


def read_filetype(
    spark: SparkSession,
    path: str,
    config: dict | None = None,
    yaml_path: str | None = None,
    output_middle_timestamp: bool = True,
    ts_out_col: str = "TIMESTAMP",
) -> tuple[DataFrame, DataFrame]:
    """ReadFileType/DataFileReader analog (filereader.py:276-536).

    Returns ``(data_df, metadata_df)``: data with one parsed timestamp
    column + all variables cast to double, and a variable-metadata frame
    (VARIABLE, UNITS, TAGS, ADDED, VARINDEX — filereader.py:385-400).
    """
    if config is None:
        config = load_filetype_config(yaml_path)
    data_cfg = config["DATA"]
    ts_cfg = config["TIMESTAMP"]
    sep = data_cfg.get("DELIMITER", ",")
    na_vals = [str(v) for v in data_cfg.get("NA_VALUES", [])]
    path = _maybe_unzip(path, config.get("FILE", {}).get("COMPRESSION", "None"))

    headercols, _ = parse_header(
        spark, path, data_cfg.get("SKIP_ROWS", []), data_cfg.get("HEADER_ROWS", []), sep
    )
    raw_names = [n for n, _ in headercols]
    units = [u for _, u in headercols]
    names = dedup_column_names(raw_names)

    fmt_spark = strptime_to_spark(ts_cfg["DATETIME_FORMAT"])
    schema = StructType([StructField(c, StringType()) for c in names])
    reader = (
        spark.read.schema(schema)
        .option("header", "false")
        .option("sep", sep)
        .option("mode", "PERMISSIVE")
    )
    if na_vals:
        reader = reader.option("nullValue", na_vals[0])
    df = reader.csv(path)
    for nv in na_vals[1:]:
        df = df.select(
            *[F.when(_qcol(c) == nv, None).otherwise(_qcol(c)).alias(c) for c in names]
        )

    ts_expr, ts_src = _timestamp_expr(ts_cfg.get("INDEX_COLUMN"), names, units, fmt_spark)
    if ts_expr is None:
        raise ValueError("filetype config has no TIMESTAMP.INDEX_COLUMN")
    # distributed preamble/garbage drop: non-data rows can't parse as ts
    df = df.withColumn(ts_out_col, ts_expr).where(F.col(ts_out_col).isNotNull())

    value_cols = [c for c in names if c not in ts_src]
    # numeric coercion parity: everything -> double, strings -> NULL
    df = df.select(
        F.col(ts_out_col), *[_qcol(c).try_cast("double").alias(c) for c in value_cols]
    )

    convention = str(ts_cfg.get("SHOWS_START_MIDDLE_OR_END_OF_RECORD", "end")).lower()
    if output_middle_timestamp and convention != "middle":
        half = parse_freq_seconds(data_cfg["FREQUENCY"]) // 2
        shift = -half if convention == "end" else half
        df = df.withColumn(
            ts_out_col,
            F.timestamp_seconds(F.unix_timestamp(F.col(ts_out_col)) + F.lit(shift)),
        )

    meta_rows = [
        (name, unit, "#orig", None, idx)
        for idx, (name, unit) in enumerate(zip(names, units))
        if name not in ts_src
    ]
    metadata = spark.createDataFrame(
        meta_rows, "VARIABLE string, UNITS string, TAGS string, ADDED string, VARINDEX int"
    )
    return df, metadata


def read_filetype_many(
    spark: SparkSession,
    paths: Sequence[str],
    config: dict | None = None,
    yaml_path: str | None = None,
    output_middle_timestamp: bool = True,
    ts_out_col: str = "TIMESTAMP",
) -> tuple[DataFrame, DataFrame]:
    """MultiDataFileReader analog (filereader.py:216-273): read every
    file with the same filetype and merge with combine_first semantics
    (earlier file wins per timestamp).  One union + one shuffle."""
    from .readers import merge_files_combine_first

    if config is None:
        config = load_filetype_config(yaml_path)
    frames, metas = [], []
    all_cols: list[str] = []
    for p in paths:
        d, m = read_filetype(
            spark, p, config=config,
            output_middle_timestamp=output_middle_timestamp, ts_out_col=ts_out_col,
        )
        frames.append(d)
        metas.append(m)
        for c in d.columns:
            if c != ts_out_col and c not in all_cols:
                all_cols.append(c)
    aligned = [
        f.select(
            ts_out_col,
            *[
                (F.col(c) if c in f.columns else F.lit(None).cast("double")).alias(c)
                for c in all_cols
            ],
        )
        for f in frames
    ]
    data = merge_files_combine_first(aligned, ts_out_col, all_cols)
    meta = metas[0]
    for m in metas[1:]:
        meta = meta.unionByName(m)
    meta = meta.dropDuplicates(["VARIABLE"])
    return data, meta
