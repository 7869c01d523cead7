"""P9/J6/K6: checkpoint-ledger incremental processing.

The reference keeps append-only completed/failed id files and skips ids
already present (mongo-etl/mongodb_to_rdf.py:114-192, 632;
utils/checkpoint.py). The Spark-native shape is a small ledger table +
``left_anti`` join: work = all - done. The ledger is tiny relative to the
work set, so Catalyst broadcasts it — the anti-join costs one scan of the
work table and no shuffle of the big side.

Durability: the reference fsyncs each append (at-least-once, idempotent
re-run). Here the ledger is parquet written with Spark's atomic commit
protocol — a batch job is exactly-once per run, strictly stronger
(SURVEY.md §7 step 5).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from geosparql_etl_spark.schemas import LEDGER


def filter_pending(
    work: DataFrame, ledger: DataFrame, work_key: str, ledger_key: str = "id"
) -> DataFrame:
    """Rows of ``work`` whose key is not in the ledger (any status):
    the reference skips both completed and failed ids
    (mongodb_to_rdf.py:149-152)."""
    done = ledger.select(F.col(ledger_key).alias(work_key)).dropDuplicates()
    return work.join(F.broadcast(done), on=work_key, how="left_anti")


def read_ledger(spark: SparkSession, path: str) -> DataFrame:
    try:
        return spark.read.schema(LEDGER).parquet(path)
    except Exception:
        return spark.createDataFrame([], LEDGER)


def append_ledger(df: DataFrame, path: str) -> None:
    """Append (id, status, error, ts) rows; atomic per job."""
    df.select("id", "status", "error", "ts").write.mode("append").parquet(path)


def skip_existing_outputs(
    work: DataFrame, existing_names: DataFrame, name_col: str
) -> DataFrame:
    """P10: incremental skip-if-output-exists
    (segmentation-etl:299-307) as an anti-join against a sink listing."""
    return work.join(
        F.broadcast(existing_names.select(name_col).dropDuplicates()),
        on=name_col,
        how="left_anti",
    )
