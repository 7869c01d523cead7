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
