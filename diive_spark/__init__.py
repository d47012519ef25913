"""diive_spark — a PySpark-native time-series rollup + downsample + retention engine.

A from-scratch rebuild of the *semantics* of rbngz/diive (reference at
/root/reference, v0.70.1) on idiomatic PySpark: resampled aggregates with
min-count gating, gap finding/interpolation/lookup-table fills,
z-score / rolling-SD (Hampel-style) outlier flagging, QCF overall flags,
multi-resolution downsampling, and a raw->1m->1h->1d continuous-aggregate
retention cascade over tables of pre-tokenized training sequences
``(doc_id string, tokens array<int>, n_tok int, source string)``.

Design stance (SURVEY.md section 7.0):

- Long-format fact view ``series(source, doc_id, pos, value)`` where the
  "time" axis is the integer sequence position; per-series math is a
  ``Window.partitionBy(source, doc_id).orderBy(pos)``.
- All rollups are bucket groupBys with diive's mincount gate and bin-label
  conventions (reference diive/core/times/resampling.py:13-132,
  diive/core/dfun/frames.py:323-393).
- Heavy kernels (Gorilla-style compression) are Arrow-backed pandas UDFs
  with batch-vectorized numpy — no per-row Python.
- Tier N+1 is composed from tier N partial aggregates (count/sum/sumsq/
  min/max) so the raw data is scanned once per cascade.
"""

__version__ = "0.1.0"
