#!/usr/bin/env python
"""spark-submit entry point for the corpus-preprocessing pipeline —
the training-data twin of run_cascade_job.py.

    python scripts/package.py                      # builds dist/diive_spark.zip
    spark-submit --master <cluster> \
        --py-files dist/diive_spark.zip \
        scripts/run_corpus_job.py \
        --docs <documents parquet path> \
        --out  <output root> \
        [--minhash-index <band-index root>]   # incremental cross-batch dedup

The job, in one pass over the corpus plus the dedup band joins:
  1. clean_text       — control-char strip + whitespace collapse
  2. redact_pii       — email/IPv4/phone placeholders
  3. exact_dedup      — md5 digest, keep lowest id
  4. minhash_dedup    — near-dup canonicalization (multi-hop CC);
                        with --minhash-index, also dedup against the
                        persistent cross-batch band index
  5. decontaminate    — with --benchmark, drop docs sharing any word
                        n-gram with the eval set (broadcast hash join)
  6. quality gates    — Gopher repetition flags + quality_score
  7. hash_split       — frozen 98/1/1 train/val/test assignment
  8. write            — parquet partitioned by split

Prints ONE JSON metrics line (docs in/kept, dup/flag counts, wall).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.functions as F  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--minhash-index", default=None)
    ap.add_argument("--benchmark", default=None,
                    help="parquet of eval docs (doc_id, text) to "
                         "decontaminate against")
    ap.add_argument("--decontam-ngram", type=int, default=13)
    ap.add_argument("--est-threshold", type=float, default=0.7)
    ap.add_argument("--parallelism", type=int, default=8)
    args = ap.parse_args()

    from diive_spark.operators.corpus import corpus_pipeline
    from diive_spark.operators.dedup import MinHashIndex
    from diive_spark.session import get_spark

    spark = get_spark(parallelism=args.parallelism)
    t0 = time.monotonic()

    # idempotent restart: once a batch's output is written AND indexed,
    # a re-run must be a no-op — re-processing it would dedup every doc
    # against its own indexed copy and overwrite good output with an
    # empty one.  The marker is written only after the index append.
    from diive_spark.session import fs_exists
    marker = f"{args.out}/_DIIVE_INDEXED"
    if fs_exists(spark, marker):
        print(json.dumps({"skipped": "batch already written and indexed",
                          "out": args.out}))
        spark.stop()
        return

    docs = spark.read.parquet(args.docs)
    n_in = docs.count()

    # the composition lives in operators/corpus.py so its physical plan
    # is gated in tests/test_plans.py; the index existence probe goes
    # through Hadoop FS (HDFS/S3-safe), not os.path
    idx = MinHashIndex(spark, args.minhash_index) if args.minhash_index else None
    bench = spark.read.parquet(args.benchmark) if args.benchmark else None
    final = corpus_pipeline(docs, est_threshold=args.est_threshold,
                            minhash_index=idx, benchmark=bench,
                            decontam_ngram=args.decontam_ngram)
    (final.write.mode("overwrite").partitionBy("split").parquet(args.out))

    out_df = spark.read.parquet(args.out)
    if idx is not None:
        # append AFTER the output write, reading the written table
        # back: (a) only docs that survived every gate enter the
        # cross-batch index, (b) the pipeline is recomputed zero times
        # for the append (signatures come from the materialized
        # output), (c) a failed write indexes nothing
        idx.add(out_df, text_col="text_scrubbed")
        spark.createDataFrame([(1,)], "ok int").coalesce(1).write.mode(
            "overwrite"
        ).json(marker)
    n_out = out_df.count()
    splits = {r["split"]: r["n"] for r in
              out_df.groupBy("split").agg(F.count("*").alias("n")).collect()}
    print(json.dumps({
        "docs_in": n_in,
        "docs_out": n_out,
        "removed": n_in - n_out,
        "splits": splits,
        "wall_s": round(time.monotonic() - t0, 2),
        "docs_per_sec": round(n_in / max(time.monotonic() - t0, 1e-9)),
    }))
    spark.stop()


if __name__ == "__main__":
    main()
