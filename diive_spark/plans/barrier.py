"""Predicate-pushdown barrier for gates over expensive computed columns.

Catalyst's ``PushDownPredicates`` has no cost model: a filter over
computed columns is inlined through every deterministic ``Project`` it
crosses, substituting the full defining expression tree into the
predicate.  ``FilterExec`` also does not get the whole-stage-codegen
common-subexpression elimination that ``ProjectExec`` gets, so a gate
over text features (split/regexp chains) re-evaluates the entire
feature battery — once per referencing sub-expression — on every input
row, below whatever join the optimizer pushed it under.  Measured on
the corpus_pipeline quality gate at sf0.1: the pushed-down Filter held
22 inlined ``split()`` copies (each wrapping the 12-regex clean+scrub
chain) and cost 4.8x the un-pushed plan (BENCH.md round-5 notes).

``no_pushdown_filter`` keeps the gate where it was written: the
condition is evaluated as a projected boolean (CSE applies, each
feature computed once) wrapped in a non-deterministic no-op —
``spark_partition_id() >= 0``, always true — which ``PushDownPredicates``
refuses to move or substitute.  Values are unchanged; only the plan is.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

_GATE = "__gate__"


def no_pushdown_filter(df: DataFrame, cond: Column) -> DataFrame:
    """``df.where(cond)`` with predicate pushdown disabled.

    Use when ``cond`` references computed columns whose defining
    expressions are expensive (regex/split/array batteries): the plain
    ``where`` would inline those expressions into the pushed-down
    predicate and re-evaluate them per input row.  For cheap predicates
    (column comparisons, constants) prefer plain ``where`` — pushdown
    is the optimization there.
    """
    gate = F.when(F.spark_partition_id() >= 0, cond).otherwise(F.lit(False))
    return df.withColumn(_GATE, gate).where(F.col(_GATE)).drop(_GATE)
