#!/usr/bin/env python
"""Gorilla codec throughput table (VERDICT r4 "Next round" item 7).

Round 1 recorded the raw-tier compression ratio (payload bytes /
logical int32 bytes ~ 0.58x) but never the encode/decode *speed* or
the read-path cost of the compressed raw tier vs just storing the
token arrays as parquet.  This script measures both and appends a
BENCH.md section with a stated recommendation:

1. KERNEL throughput (no Spark): ``encode_batch``/``decode_batch`` on
   the same deterministic doc population the tiers ingest
   (datagen._gen_doc — lognormal lengths, NA-sentinel runs, outlier
   spikes), min-of-R walls, MB/s over the logical int32 payload.
2. STORAGE + read path (Spark, local[8]): the same tokens written
   three ways — plain ``array<int>`` parquet-zstd, parquet-snappy
   (tier default), and Gorilla payloads inside parquet-zstd — then
   fully materialized back (``F.aggregate`` token sum for the plain
   variants; ``gorilla_decode_values`` -> same sum for the payload
   variant, so the delta between reads IS the decode cost).

Usage: python scripts/bench_gorilla.py [--docs 50000] [--rounds 3]
"""

from __future__ import annotations

import argparse
import datetime
import json
import os
import shutil
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import numpy as np  # noqa: E402


def _du(path: str) -> int:
    out = subprocess.run(["du", "-sb", path], capture_output=True, text=True)
    return int(out.stdout.split()[0])


def kernel_bench(n_docs: int, rounds: int) -> dict:
    """encode/decode MB/s on the deterministic doc population."""
    from diive_spark.datagen import _gen_doc
    from diive_spark.functions.gorilla import decode_batch, encode_batch

    arrays = [_gen_doc(42, i, True, True)[1] for i in range(n_docs)]
    logical = float(sum(a.size for a in arrays)) * 4.0
    # one warm pass (page-in, numpy ufunc dispatch caches)
    payloads = encode_batch(arrays)
    enc_walls, dec_walls = [], []
    for _ in range(rounds):
        t0 = time.monotonic()
        payloads = encode_batch(arrays)
        enc_walls.append(time.monotonic() - t0)
        t0 = time.monotonic()
        back = decode_batch(payloads)
        dec_walls.append(time.monotonic() - t0)
    assert all(np.array_equal(a, b) for a, b in zip(arrays, back))
    packed = float(sum(len(p) for p in payloads))
    mb = 1024.0 * 1024.0
    return {
        "n_docs": n_docs,
        "logical_mb": round(logical / mb, 1),
        "ratio": round(packed / logical, 3),
        "encode_mb_s": round(logical / mb / min(enc_walls), 1),
        "decode_mb_s": round(logical / mb / min(dec_walls), 1),
        "enc_walls": [round(w, 2) for w in enc_walls],
        "dec_walls": [round(w, 2) for w in dec_walls],
    }


def storage_bench(n_docs: int, rounds: int) -> dict:
    """Disk bytes + full-materialization read walls for the 3 layouts."""
    import pyspark.sql.functions as F

    from diive_spark.datagen import tokens_table
    from diive_spark.functions.gorilla import (gorilla_decode_values,
                                               gorilla_encode_values)
    from diive_spark.session import get_spark

    spark = get_spark(parallelism=8)
    spark.sparkContext.setLogLevel("ERROR")
    toks = tokens_table(spark, n_docs=n_docs, seed=42, partitions=32)
    logical = float(
        toks.agg(F.sum("n_tok").alias("s")).collect()[0]["s"]) * 4.0
    base = "/tmp/diive_gorilla_bench"
    shutil.rmtree(base, ignore_errors=True)
    paths = {k: f"{base}/{k}" for k in ("zstd", "snappy", "gorilla_zstd")}

    writes: dict[str, float] = {}
    for name, codec, df in (
        ("zstd", "zstd", toks),
        ("snappy", "snappy", toks),
        ("gorilla_zstd", "zstd",
         toks.select("doc_id", "n_tok", "source",
                     gorilla_encode_values("tokens").alias("payload"))),
    ):
        t0 = time.monotonic()
        df.write.mode("overwrite").option("compression", codec).parquet(
            paths[name])
        writes[name] = time.monotonic() - t0

    # read path: full materialization (token sum over every element).
    # int64 overflow-safe: tokens < 2^31, ~13M of them -> < 2^55.
    def read_plain(path: str) -> float:
        t0 = time.monotonic()
        (spark.read.parquet(path)
         .select(F.aggregate("tokens", F.lit(0).cast("long"),
                             lambda acc, x: acc + x).alias("s"))
         .agg(F.sum("s")).collect())
        return time.monotonic() - t0

    def read_gorilla(path: str) -> float:
        t0 = time.monotonic()
        (spark.read.parquet(path)
         .select(gorilla_decode_values("payload").alias("tokens"))
         .select(F.aggregate("tokens", F.lit(0).cast("long"),
                             lambda acc, x: acc + x).alias("s"))
         .agg(F.sum("s")).collect())
        return time.monotonic() - t0

    reads: dict[str, list[float]] = {k: [] for k in paths}
    for _ in range(rounds):
        reads["zstd"].append(read_plain(paths["zstd"]))
        reads["snappy"].append(read_plain(paths["snappy"]))
        reads["gorilla_zstd"].append(read_gorilla(paths["gorilla_zstd"]))

    mb = 1024.0 * 1024.0
    out = {"n_docs": n_docs, "logical_mb": round(logical / mb, 1)}
    for k in paths:
        out[k] = {
            "disk_mb": round(_du(paths[k]) / mb, 1),
            "ratio_vs_logical": round(_du(paths[k]) / logical, 3),
            "write_s": round(writes[k], 2),
            "read_s": round(min(reads[k]), 2),
            "read_mb_s": round(logical / mb / min(reads[k]), 1),
            "read_walls": [round(w, 2) for w in reads[k]],
        }
    spark.stop()
    shutil.rmtree(base, ignore_errors=True)
    return out


def append_bench_md(kern: dict, stor: dict) -> None:
    stamp = datetime.datetime.now().strftime("%Y-%m-%d %H:%M:%S")
    g, z, s = stor["gorilla_zstd"], stor["zstd"], stor["snappy"]
    decode_tax = round(g["read_s"] / max(z["read_s"], 1e-9), 2)
    disk_win = round(g["disk_mb"] / max(z["disk_mb"], 1e-9), 2)
    lines = [
        "",
        f"## Gorilla codec throughput ({stamp}) — "
        "scripts/bench_gorilla.py",
        "",
        f"Kernel (single process, numpy batch codec, {kern['n_docs']:,} "
        f"docs = {kern['logical_mb']} MB logical int32): encode "
        f"**{kern['encode_mb_s']} MB/s**, decode "
        f"**{kern['decode_mb_s']} MB/s**, packed/logical ratio "
        f"{kern['ratio']}. Min of {len(kern['enc_walls'])} "
        f"(walls enc {kern['enc_walls']}, dec {kern['dec_walls']}).",
        "",
        f"Storage + full-materialization read path (Spark local[8], "
        f"{stor['n_docs']:,} docs = {stor['logical_mb']} MB logical, "
        "read = decode + aggregate every token, min-of-"
        f"{len(g['read_walls'])}):",
        "",
        "| layout | disk MB | vs logical | write s | read s | "
        "read MB/s |",
        "|---|---|---|---|---|---|",
        f"| parquet-zstd `array<int>` | {z['disk_mb']} | "
        f"{z['ratio_vs_logical']} | {z['write_s']} | {z['read_s']} | "
        f"{z['read_mb_s']} |",
        f"| parquet-snappy `array<int>` (tier default) | "
        f"{s['disk_mb']} | {s['ratio_vs_logical']} | {s['write_s']} | "
        f"{s['read_s']} | {s['read_mb_s']} |",
        f"| Gorilla payload in parquet-zstd | {g['disk_mb']} | "
        f"{g['ratio_vs_logical']} | {g['write_s']} | {g['read_s']} | "
        f"{g['read_mb_s']} |",
        "",
        f"**Recommendation**: the Gorilla raw tier costs {decode_tax}x "
        f"the plain-zstd read wall and stores {disk_win}x the bytes of "
        "plain parquet-zstd on THIS token distribution (near-uniform "
        "random token ids — XOR chains stay wide, while parquet's own "
        "zstd already eats the redundancy). Prefer plain parquet-zstd "
        "for cold raw storage of high-entropy token streams; the "
        "Gorilla payload path wins when values are smooth/slowly-"
        "varying (classic metrics gauges, dod timestamps — the regime "
        "the VLDB 2015 paper targets) or when single-doc point reads "
        "must avoid parquet row-group decode. The tier seam keeps both: "
        "write_raw() is the codec path, plain tiers are the default.",
    ]
    with open(os.path.join(REPO, "BENCH.md"), "a") as fh:
        fh.write("\n".join(lines) + "\n")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=50000)
    ap.add_argument("--rounds", type=int, default=3)
    ap.add_argument("--kernel-docs", type=int, default=20000)
    args = ap.parse_args()
    kern = kernel_bench(args.kernel_docs, args.rounds)
    print("KERNEL", json.dumps(kern), flush=True)
    stor = storage_bench(args.docs, args.rounds)
    print("STORAGE", json.dumps(stor), flush=True)
    append_bench_md(kern, stor)
    print("appended BENCH.md section")


if __name__ == "__main__":
    main()
