from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from diive_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark(parallelism=8, app_name="diive_spark_tests", shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def tiny_tokens(spark):
    from diive_spark.datagen import tokens_table

    df = tokens_table(spark, n_docs=60, seed=42).cache()
    df.count()
    return df


@pytest.fixture(scope="session")
def tiny_series(spark, tiny_tokens):
    from diive_spark.datagen import series_view

    df = series_view(tiny_tokens).cache()
    df.count()
    return df


@pytest.fixture(scope="session")
def tiny_series_pd(tiny_series) -> pd.DataFrame:
    pdf = tiny_series.toPandas()
    return pdf.sort_values(["source", "doc_id", "pos"]).reset_index(drop=True)


def assert_frame_close(actual: pd.DataFrame, expected: pd.DataFrame, sort_cols, **kw):
    a = actual.sort_values(sort_cols).reset_index(drop=True)
    e = expected.sort_values(sort_cols).reset_index(drop=True)
    a = a[sorted(a.columns)]
    e = e[sorted(e.columns)]
    pd.testing.assert_frame_equal(a, e, check_dtype=False, **kw)


def seeded_series(n=500, seed=7, gap_frac=0.1) -> pd.DataFrame:
    """Single synthetic series with gaps for oracle tests."""
    rng = np.random.default_rng(seed)
    v = rng.normal(50, 10, n)
    v[rng.random(n) < gap_frac] = np.nan
    return pd.DataFrame(
        {"source": "s", "doc_id": "d0", "pos": np.arange(n), "value": v}
    )
