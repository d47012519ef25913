"""Reference-fixture ingest parity: golden loads of the reference's
shipped example data through the filetype-config reader.

Mirrors reference tests/test_loaddata.py:10-21 (DIIVE_CSV_30MIN:
101 variables x 1488 rows) and tests/test_timestamps.py:9-13
(DetectFrequency -> 30 min) — same fixtures, Spark engine.
"""

import os

import pytest
import pyspark.sql.functions as F

from diive_spark.sources.filetypes import (
    available_filetypes,
    load_filetype_config,
    parse_freq_seconds,
    parse_header,
    read_filetype,
    read_filetype_many,
    strptime_to_spark,
)

REF = "/root/reference/diive/configs"
EXAMPLE_CSV = (
    f"{REF}/exampledata/"
    "exampledata_CH-DAV_FP2022.5_2022.07_ID20230206154316_30MIN.diive.csv"
)
needs_ref = pytest.mark.skipif(
    not os.path.exists(EXAMPLE_CSV), reason="reference example data absent"
)


def test_parse_freq_seconds():
    assert parse_freq_seconds("30T") == 1800
    assert parse_freq_seconds("1MIN") == 60
    assert parse_freq_seconds("10S") == 10
    assert parse_freq_seconds("H") == 3600
    with pytest.raises(ValueError):
        parse_freq_seconds("3QQ")


def test_strptime_to_spark():
    assert strptime_to_spark("%Y-%m-%d %H:%M:%S") == "yyyy-MM-dd HH:mm:ss"
    assert strptime_to_spark("%Y%m%d%H%M%S") == "yyyyMMddHHmmss"
    with pytest.raises(ValueError):
        strptime_to_spark("%Q")


@needs_ref
def test_available_filetypes_lists_reference_configs():
    types = available_filetypes(f"{REF}/filetypes")
    assert "DIIVE_CSV_30MIN" in types
    cfg = load_filetype_config(types["DIIVE_CSV_30MIN"])
    assert cfg["DATA"]["HEADER_ROWS"] == [0, 1]
    assert cfg["TIMESTAMP"]["INDEX_COLUMN"] == [0]


@needs_ref
def test_golden_diive_csv_30min(spark):
    """Golden shape from reference tests/test_loaddata.py:10-21."""
    cfg = load_filetype_config(f"{REF}/filetypes/DIIVE_CSV_30MIN.yml")
    data, meta = read_filetype(spark, EXAMPLE_CSV, config=cfg)
    value_cols = [c for c in data.columns if c != "TIMESTAMP"]
    assert len(value_cols) == 101
    assert data.count() == 1488
    # metadata: one row per variable, UNITS/TAGS/ADDED/VARINDEX fields
    assert meta.count() == 101
    assert set(meta.columns) == {"VARIABLE", "UNITS", "TAGS", "ADDED", "VARINDEX"}
    # all value columns numeric
    assert all(f.dataType.typeName() == "double"
               for f in data.schema.fields if f.name != "TIMESTAMP")


@needs_ref
def test_golden_diive_freq_detect_30min(spark):
    """DetectFrequency parity (reference tests/test_timestamps.py:9-13):
    the example file's timestamp grid is exactly 30 min."""
    from diive_spark.operators.timegrid import detect_freq

    cfg = load_filetype_config(f"{REF}/filetypes/DIIVE_CSV_30MIN.yml")
    data, _ = read_filetype(spark, EXAMPLE_CSV, config=cfg)
    axes = data.select(
        F.lit("x").alias("k"),
        F.unix_timestamp("TIMESTAMP").alias("axis"),
    )
    row = detect_freq(axes, axis_col="axis", key_cols=["k"]).collect()[0]
    assert row["freq"] == 1800


@needs_ref
def test_header_reconciliation_generates_unknown_cols(spark, tmp_path):
    """filereader.py:430-463: first data row wider than header ->
    auto-generated unknown-N columns."""
    p = tmp_path / "ragged.csv"
    p.write_text(
        "ts,a\n-,-\n"
        "2022-01-01 00:15:00,1.0,9.9\n"
        "2022-01-01 00:45:00,2.0,8.8\n"
    )
    cols, n_pre = parse_header(spark, str(p), [], [0, 1])
    assert n_pre == 2
    assert cols == [("ts", "-"), ("a", "-"), ("unknown-1", "[-unknown-]")]
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
            "FREQUENCY": "30T",
            "DELIMITER": ",",
        },
    }
    data, meta = read_filetype(spark, str(p), config=cfg)
    assert sorted(c for c in data.columns if c != "TIMESTAMP") == ["a", "unknown-1"]
    rows = {r["a"]: r["unknown-1"] for r in data.collect()}
    assert rows == {1.0: 9.9, 2.0: 8.8}


@needs_ref
def test_skiprows_and_end_convention(spark, tmp_path):
    """EddyPro-style layout: SKIP_ROWS [0] + 2 header rows + END
    timestamps in (date, time) columns shifted to MIDDLE."""
    p = tmp_path / "ep.csv"
    p.write_text(
        "garbage preamble line\n"
        "date,time,co2\n"
        "[yyyy-mm-dd],[HH:MM],[umol]\n"
        "2022-01-01,00:30,4.5\n"
        "2022-01-01,01:00,-9999\n"
    )
    cfg = {
        "FILE": {"COMPRESSION": "None"},
        "TIMESTAMP": {
            "INDEX_COLUMN": [["date", "[yyyy-mm-dd]"], ["time", "[HH:MM]"]],
            "DATETIME_FORMAT": "%Y-%m-%d %H:%M",
            "SHOWS_START_MIDDLE_OR_END_OF_RECORD": "end",
        },
        "DATA": {
            "HEADER_ROWS": [0, 1],
            "SKIP_ROWS": [0],
            "NA_VALUES": [-9999],
            "FREQUENCY": "30T",
            "DELIMITER": ",",
        },
    }
    data, _ = read_filetype(spark, str(p), config=cfg)
    rows = sorted(data.collect(), key=lambda r: r["TIMESTAMP"])
    assert [str(r["TIMESTAMP"]) for r in rows] == [
        "2022-01-01 00:15:00", "2022-01-01 00:45:00",
    ]
    assert rows[0]["co2"] == 4.5 and rows[1]["co2"] is None


@needs_ref
def test_multifile_combine_first(spark, tmp_path):
    """MultiDataFileReader merge (filereader.py:263-273): earlier file
    wins; later files fill missing timestamps."""
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
            "NA_VALUES": [],
            "FREQUENCY": "30T",
            "DELIMITER": ",",
        },
    }
    a = tmp_path / "a.csv"
    a.write_text("ts,v\n-,-\n2022-01-01 00:15:00,1.0\n2022-01-01 00:45:00,2.0\n")
    b = tmp_path / "b.csv"
    b.write_text("ts,v\n-,-\n2022-01-01 00:45:00,99.0\n2022-01-01 01:15:00,3.0\n")
    data, meta = read_filetype_many(spark, [str(a), str(b)], config=cfg)
    got = {str(r["TIMESTAMP"]): r["v"] for r in data.collect()}
    assert got == {
        "2022-01-01 00:15:00": 1.0,
        "2022-01-01 00:45:00": 2.0,   # file a wins
        "2022-01-01 01:15:00": 3.0,   # filled from b
    }


@needs_ref
def test_golden_icos_zip_10s(spark):
    """The reference's OTHER shipped example: the zipped ICOS 10-second
    file (filereader.py:566-569, ICOS_H2R_CSVZIP_10S.yml).  Exercises
    the zip extraction path, compact %Y%m%d%H%M%S timestamps, 2-row
    header with pandas 'Unnamed:' unit artifacts, and END->MIDDLE
    shift at a 10 s grid."""
    from diive_spark.operators.timegrid import detect_freq

    cfg = load_filetype_config(f"{REF}/filetypes/ICOS_H2R_CSVZIP_10S.yml")
    zip_path = (
        "/root/reference/diive/configs/exampledata/"
        "CH-Dav_BM_20230328_L02_F03.zip"
    )
    data, meta = read_filetype(spark, zip_path, config=cfg)
    value_cols = [c for c in data.columns if c != "TIMESTAMP"]
    assert len(value_cols) == 26            # 27 csv cols - timestamp
    assert data.count() == 8640             # 24 h at 10 s
    assert meta.count() == 26
    row = detect_freq(
        data.select(F.lit("x").alias("k"),
                    F.unix_timestamp("TIMESTAMP").alias("axis")),
        axis_col="axis", key_cols=["k"],
    ).collect()[0]
    assert row["freq"] == 10
    # END -> MIDDLE: first stamp 00:00:10 shifts back 5 s
    first = data.agg(F.min("TIMESTAMP")).first()[0]
    assert (first.hour, first.minute, first.second) == (0, 0, 5)


def test_save_load_pickle_roundtrip(spark, tmp_path):
    """save/load_pickle analog (reference core/io/files.py:66-85):
    DataFrames round-trip through parquet + exact-schema sidecar
    (types preserved bit-for-bit); plain driver-side objects round-trip
    through real pickle; load dispatches automatically."""
    from diive_spark.sources.readers import load_pickle, save_pickle

    df = spark.createDataFrame(
        [("a", 1, 1.5, True)], "s string, i int, f double, b boolean"
    )
    p = str(tmp_path / "ckpt")
    save_pickle(df, p)
    back = load_pickle(spark, p)
    assert back.schema == df.schema
    assert back.collect() == df.collect()

    obj = {"ustar_threshold": 0.325, "seasons": [1, 2, 3]}
    p2 = str(tmp_path / "params.pkl")
    save_pickle(obj, p2)
    assert load_pickle(spark, p2) == obj


def test_parse_json_col_typed_and_permissive(spark):
    from diive_spark.sources.readers import parse_json_col

    rows = [
        (1, '{"k": 7, "tag": "a"}'),
        (2, '{"k": 12}'),
        (3, 'not json at all'),
        (4, None),
    ]
    df = spark.createDataFrame(rows, "id long, props string")
    out = parse_json_col(df, "props", "k INT, tag STRING", prefix="p_")
    got = {r["id"]: (r["p_k"], r["p_tag"]) for r in out.collect()}
    assert got[1] == (7, "a")
    assert got[2] == (12, None)
    assert got[3] == (None, None)  # malformed -> null fields, row kept
    assert got[4] == (None, None)
    assert "props" not in out.columns
    kept = parse_json_col(df, "props", "k INT", keep=True)
    assert "props" in kept.columns
