"""Skew mitigation: deterministic salting for hot join/agg keys.

AQE's skew-join splitting handles sort-merge joins automatically; this
module covers the shapes AQE does not: shuffled joins you need to
pre-balance (streaming joins, bucketed layouts) and exact
count-distincts whose single hot group overwhelms one reducer.

Salting is deterministic (hash-derived, never rand()) so retried tasks
and resumed jobs produce identical partitioning — a nondeterministic
salt breaks Spark's task-retry contract (a recomputed partition must
reproduce the same rows).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def with_salt(df: DataFrame, n: int, cols: list[str] | None = None) -> DataFrame:
    """Add a deterministic __salt in [0, n) from a hash of ``cols``
    (default: all columns). Rows of a hot key spread across n salts as
    long as they differ anywhere outside the key."""
    basis = [F.col(c) for c in (cols or df.columns)]
    return df.withColumn("__salt", F.pmod(F.xxhash64(*basis), F.lit(n)).cast("int"))


def salted_join(
    skewed: DataFrame,
    dim: DataFrame,
    on: list[str],
    n: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join where ``skewed`` has hot keys and ``dim`` is too big to
    broadcast: salt the skewed side, replicate the dim side n ways, join
    on (keys + salt). Shuffle volume for the dim side grows n-fold — use
    only when a hot key genuinely dominates a reducer.
    """
    salted = with_salt(skewed, n)
    replicated = dim.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(n - 1)))
    )
    return salted.join(replicated, [*on, "__salt"], how).drop("__salt")


def salted_count_distinct(
    df: DataFrame, group_cols: list[str], distinct_col: str, n: int = 16
) -> DataFrame:
    """Exact per-group countDistinct in two phases: per-(group, salt)
    partial distinct, then merge. The hot group's distinct set splits
    across n reducers instead of one.

    Salt derives from the DISTINCT column itself, so equal values land
    on the same salt and the partial distincts stay disjoint — that is
    what makes summing them exact.
    """
    salted = df.withColumn(
        "__salt", F.pmod(F.xxhash64(F.col(distinct_col)), F.lit(n)).cast("int")
    )
    partial = salted.groupBy(*group_cols, "__salt").agg(
        F.countDistinct(distinct_col).alias("__partial")
    )
    return partial.groupBy(*group_cols).agg(
        F.sum("__partial").cast("long").alias(f"n_distinct_{distinct_col}")
    )
