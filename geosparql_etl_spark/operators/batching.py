"""W1: fixed-size batch windowing — the reference chunks each analysis's
mark stream into 1,000-mark output files (mongo-etl/mongodb_to_rdf.py:31,
540-580; rationale docs/Turtle File Summary.md:42-52).

Spark shape: row_number over (partition keys, deterministic order key),
then batch_id = floor((rn-1)/batch_size). One shuffle on the partition
keys; the same shuffle is reused by the downstream per-batch groupBy
(Catalyst sees compatible partitioning), so doc assembly adds no second
exchange on the big side.

Skew note for 100 TB: a single (execution_id, imageid) with billions of
marks serializes into one task at the window stage. AQE skew-join
handling does not split windows, so extreme skew should pre-aggregate
with salted sub-partitions; the default path assumes the reference's
~1k-3k marks per analysis cardinality (FIXTURES.md §4).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def with_batch_id(
    df: DataFrame,
    partition_cols: Sequence[str],
    order_col: str | Sequence[str],
    batch_size: int = 1000,
    rn_col: str = "seq_in_group",
    batch_col: str = "batch_id",
) -> DataFrame:
    """Assign a deterministic 0-based batch id within each partition group.

    ``order_col`` must be a total order within each group (pass several
    columns if one isn't unique), or batch membership is nondeterministic.
    """
    order_cols = [order_col] if isinstance(order_col, str) else list(order_col)
    w = Window.partitionBy(*partition_cols).orderBy(*[F.col(c) for c in order_cols])
    rn = F.row_number().over(w)
    return df.withColumn(rn_col, rn).withColumn(
        batch_col, F.floor((F.col(rn_col) - 1) / batch_size).cast("int")
    )
