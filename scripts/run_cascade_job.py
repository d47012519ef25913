#!/usr/bin/env python
"""spark-submit entry point for the flagship retention-cascade job.

Cluster launch (north rule: "launched via spark-submit --py-files"):

    python scripts/package.py                      # builds dist/diive_spark.zip
    spark-submit --master <cluster> \
        --py-files dist/diive_spark.zip \
        scripts/run_cascade_job.py \
        --tokens <tokens parquet/Iceberg path> \
        --store  <tier-store root> \
        [--resume]

Local smoke (what the sandbox verifies):

    spark-submit --master 'local[8]' --py-files dist/diive_spark.zip \
        scripts/run_cascade_job.py --tokens /tmp/toks.parquet --store /tmp/tiers

The job: read tokens -> write Gorilla raw tier -> explode to series ->
materialize the 1m/1h/1d cascade incrementally (per-partition lineage;
``--resume`` skips unchanged partitions) -> print a JSON metrics line.
"""

from __future__ import annotations

import argparse
import json
import sys


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--tokens", required=True)
    ap.add_argument("--store", required=True)
    ap.add_argument("--resume", action="store_true", default=True)
    ap.add_argument("--no-raw", action="store_true")
    args = ap.parse_args()

    # Under spark-submit the session already exists; reuse its conf.
    from pyspark.sql import SparkSession

    spark = SparkSession.builder.getOrCreate()

    from diive_spark.datagen import series_view
    from diive_spark.operators.tiers import TierStore

    toks = spark.read.parquet(args.tokens)
    store = TierStore(spark, args.store)
    if not args.no_raw:
        store.write_raw(toks)
    report = store.materialize_cascade(series_view(toks), resume=args.resume)
    print("CASCADE_METRICS " + json.dumps(report))
    spark.stop()


if __name__ == "__main__":
    sys.exit(main())
