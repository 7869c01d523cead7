"""Table profiling: the data-quality audit a pipeline runs before
training on (or publishing) a table.

One declarative aggregation computes, for every column, the null
fraction, exact distinct count, and (numeric columns) min/max; the
single wide row is then unpivoted with ``stack`` into the long-format
report humans and expectation-checkers consume. Single pass over the
data; the multiple DISTINCT aggregates plan as one Expand +
aggregation, so cost is one scan regardless of column count. At 100 TB
swap ``exact_distinct=False`` to ride HLL sketches
(approx_count_distinct) instead of exact distinct expansion.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_NUMERIC = {"tinyint", "smallint", "int", "bigint", "float", "double"}


def profile_table(df: DataFrame, exact_distinct: bool = True) -> DataFrame:
    """-> (column, null_frac, n_distinct, min_val, max_val) per column.

    min_val/max_val are DOUBLE and only populated for numeric columns
    (string extrema don't compose cross-type into one report column;
    decimal columns are excluded for the same reason).
    """
    total = F.count(F.lit(1))
    aggs, stacks = [], []
    for name, dtype in df.dtypes:
        distinct = (
            F.countDistinct(F.col(name))
            if exact_distinct
            else F.approx_count_distinct(F.col(name))
        )
        aggs.append(
            F.round(
                F.sum(F.col(name).isNull().cast("long")) / total, 6
            ).alias(f"__nf_{name}")
        )
        aggs.append(distinct.alias(f"__nd_{name}"))
        if dtype in _NUMERIC:
            aggs.append(F.min(F.col(name)).cast("double").alias(f"__mn_{name}"))
            aggs.append(F.max(F.col(name)).cast("double").alias(f"__mx_{name}"))
            mn, mx = f"__mn_{name}", f"__mx_{name}"
        else:
            mn, mx = "CAST(NULL AS DOUBLE)", "CAST(NULL AS DOUBLE)"
        stacks.append(f"'{name}', __nf_{name}, __nd_{name}, {mn}, {mx}")
    wide = df.agg(*aggs)
    expr = "stack({}, {}) as (column, null_frac, n_distinct, min_val, max_val)".format(
        len(stacks), ", ".join(stacks)
    )
    return wide.selectExpr(expr)


def heavy_hitters(
    df: DataFrame, key_col: str, shard_col: str, denom: int
) -> DataFrame:
    """Exact frequent items: every key whose global count is at least
    total/denom, found without a corpus-wide shuffle on the raw key.

    The space-saving/lossy-counting result made exact by a pruning
    lemma (Manku & Motwani 2002 use it the same way): if a key's
    global count >= N/denom, then in at least one shard its local
    count >= n_shard/denom (otherwise summing the strict inequalities
    over shards contradicts the global bound). So shard-local heavy
    keys are a SUPERSET of the global ones, and an exact recount of
    only those candidates closes the gap — approximate plan, exact
    answer.

    100 TB shape: the one corpus-sized aggregation is
    groupBy(shard, key) — the shard splits every globally-hot key
    across reducers, and map-side combine collapses each partition's
    repeats first. Everything after runs on the (shard, key) cell
    table: shard totals, candidate selection, and the exact recount
    (cells semi-joined to the broadcast candidate set, then summed).
    The corpus is scanned once and never shuffled on the bare key.
    All thresholds are integer arithmetic (count * denom >= total), so
    replay engines agree bit-for-bit.

    Key nullability: NULL is a key like any other (groupBy buckets it,
    SQL GROUP BY/HAVING reports it), so the candidate join is
    null-safe — a null-keyed heavy hitter is returned, matching the
    GROUP BY oracle, instead of silently vanishing in an equi-join
    that can never match null (round-4 advice).
    """
    cells = df.groupBy(shard_col, key_col).agg(F.count(F.lit(1)).alias("__c"))
    shard_n = cells.groupBy(shard_col).agg(F.sum("__c").alias("__n"))
    cand = (
        cells.join(shard_n, shard_col)
        .where(F.col("__c") * denom >= F.col("__n"))
        .select(F.col(key_col).alias("__cand_key"))
        .distinct()
    )
    total = cells.agg(F.sum("__c").alias("__total"))
    return (
        cells.join(
            F.broadcast(cand),
            F.col(key_col).eqNullSafe(F.col("__cand_key")),
            "inner",
        )
        .groupBy(key_col)
        .agg(F.sum("__c").alias("n"))
        .crossJoin(F.broadcast(total))
        .where(F.col("n") * denom >= F.col("__total"))
        .select(key_col, "n")
    )


def distinct_sketches(
    df: DataFrame,
    key_col: str,
    group_col: str,
    sub_col: str,
    lg_k: int = 12,
) -> DataFrame:
    """Mergeable cardinality sketches (Apache DataSketches HLL, the
    engine-native hll_sketch_agg): per-(group, sub) sketches built in
    one scan, then MERGED per group with hll_union_agg — the pattern
    that lets a 100 TB pipeline keep per-partition/per-day sketch
    state and answer "distinct across any subset" without ever
    rescanning: new data appends new sketches, roll-ups union them.
    dq01's exact countDistinct is the small-scale path; this is the
    sketch path it documents.

    -> (group, n_rows, distinct_est) — distinct_est is the HLL
    estimate (deterministic for a fixed input multiset: the sketch is
    hash-based and merge-order-independent). Standard error at lg_k=12
    is ~1.6%%/sqrt(1) — bounded-memory per sketch regardless of
    cardinality.
    """
    per_sub = df.groupBy(group_col, sub_col).agg(
        F.hll_sketch_agg(F.col(key_col), F.lit(lg_k)).alias("__sk"),
        F.count(F.lit(1)).alias("__n"),
    )
    return (
        per_sub.groupBy(group_col)
        .agg(
            F.sum("__n").alias("n_rows"),
            F.hll_union_agg(F.col("__sk"), F.lit(False)).alias("__merged"),
        )
        .select(
            group_col,
            "n_rows",
            F.hll_sketch_estimate(F.col("__merged")).alias("distinct_est"),
        )
    )
