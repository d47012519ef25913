"""Strict driver-style harness: exact order-insensitive value equality
(no atol) for the named queries, at a given parallelism. Usage:
python scripts/strict_check.py <cores> [name ...]"""
import os
import sys

# sys.path[0] is scripts/ when launched as a file — register the repo
# root so __spark_entry__ imports without PYTHONPATH
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import pandas as pd
from pyspark.sql import SparkSession

import __spark_entry__ as entry_mod

par = sys.argv[1]
names = sys.argv[2:] or sorted(entry_mod.oracle_sql())
SF_DIR = "/root/testdata/sf0.01"
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

spark = (
    SparkSession.builder.master(f"local[{par}]")
    .config("spark.sql.shuffle.partitions", par)
    .config("spark.driver.memory", "8g")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")
con = duckdb.connect()
for t in TABLES:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == "float32":
            df[c] = df[c].astype("float64")
        if pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].round(6)
        if pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
    return df.sort_values(list(df.columns)).reset_index(drop=True)


fails = 0
for name in names:
    try:
        got = entry_mod.queries()[name](spark, SF_DIR).toPandas()
        exp = con.execute(entry_mod.oracle_sql()[name]).df()
        g, e = canon(got), canon(exp)
        ok = g.equals(e)
        if not ok:
            fails += 1
            print(f"FAIL {name}")
            print("spark:", g.head(10).to_string())
            print("duck :", e.head(10).to_string())
            print("dtypes:", dict(g.dtypes), dict(e.dtypes))
        else:
            print(f"ok   {name} rows={len(g)}")
    except Exception as ex:
        fails += 1
        print(f"ERR  {name}: {ex}")
print("FAILS:", fails)
spark.stop()
sys.exit(1 if fails else 0)
