"""Regenerate QUERIES.md — an index of every registered driver query:
name, one-line purpose (first docstring line), and oracle kind.  Run
after adding queries: python scripts/gen_query_index.py"""
import sys

sys.path.insert(0, "/root/repo")
from diive_spark.queries import QUERIES  # noqa: E402

rows = []
for name, (fn, sql) in QUERIES.items():
    doc = (fn.__doc__ or "").strip().splitlines()
    head = doc[0].strip() if doc else ""
    while doc and len(head) < 70 and len(doc) > 1:
        nxt = doc[1].strip()
        if not nxt:
            break
        head = f"{head} {nxt}"
        doc = doc[1:]
    kind = "self-verifying" if (sql and "TRUE AS" in sql) else "full-value"
    rows.append((name, head, kind))

with open("/root/repo/QUERIES.md", "w") as f:
    f.write(
        "# Query index — every `queries()` entry and its oracle\n\n"
        f"{len(rows)} registered queries, all with DuckDB oracle twins.\n"
        "**full-value** = the twin recomputes every output value; "
        "**self-verifying** = the query computes exactness/recall "
        "invariants IN-QUERY (composed-vs-direct table compares, "
        "error-bound booleans, roundtrip equalities) and the twin "
        "hashes the expected integers+booleans — used where raw "
        "outputs are trained-model floats, seeded-probabilistic, or "
        "require comparing two Spark plans.  Registry order = driver "
        "snapshot order (never-verified first).\n\n"
        "| # | query | oracle | purpose |\n|---|---|---|---|\n"
    )
    for i, (name, head, kind) in enumerate(rows, 1):
        head = head.replace("|", "\\|")
        f.write(f"| {i} | `{name}` | {kind} | {head} |\n")
print(f"wrote QUERIES.md ({len(rows)} rows)")
