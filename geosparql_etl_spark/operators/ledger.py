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

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from geosparql_etl_spark.schemas import LEDGER
from geosparql_etl_spark.util import local_frame


def _latest(ledger: DataFrame, ledger_key: str = "id") -> DataFrame:
    """One row per id: the most recent status. Ties on ts resolve to
    'completed' (alphabetically first) — a retry that completed in the
    same instant its failure was recorded counts as done."""
    w = Window.partitionBy(ledger_key).orderBy(F.desc("ts"), F.asc("status"))
    return (
        ledger.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .drop("__rn")
    )


def filter_pending(
    work: DataFrame,
    ledger: DataFrame,
    work_key: str,
    ledger_key: str = "id",
    retry_failed: bool = False,
    in_progress_timeout_min: float | None = None,
    now=None,
) -> DataFrame:
    """Rows of ``work`` whose LATEST ledger status doesn't exclude
    them: completed ids always skip; failed ids skip unless
    ``retry_failed`` (the reference's retry mode re-queues its
    failed-ids file, utils/checkpoint.py:158-234); in_progress ids
    skip while OWNED — with ``in_progress_timeout_min`` set, a claim
    older than that is a crashed worker (the reference's in-progress
    file distinguishes crashed from never-started the same way,
    utils/checkpoint.py:158-234) and the id is reclaimed as pending.
    ``now`` accepts an injected timestamp literal for deterministic
    tests; defaults to current_timestamp.

    The decision runs on the one-row-per-id latest view of the tiny
    ledger, then broadcast-anti-joins against the work table — one
    scan of the big side, no shuffle."""
    skip = F.col("status") == "completed"
    if not retry_failed:
        skip = skip | (F.col("status") == "failed")
    if in_progress_timeout_min is None:
        # no staleness contract: an in_progress claim holds forever
        skip = skip | (F.col("status") == "in_progress")
    else:
        now_col = (
            F.lit(now).cast("timestamp") if now is not None
            else F.current_timestamp()
        )
        secs = int(in_progress_timeout_min * 60)
        fresh = F.col("ts") >= now_col - F.expr(f"INTERVAL {secs} SECONDS")
        skip = skip | ((F.col("status") == "in_progress") & fresh)
    done = (
        _latest(ledger, ledger_key)
        .where(skip)
        .select(F.col(ledger_key).alias(work_key))
        .dropDuplicates()
    )
    return work.join(F.broadcast(done), on=work_key, how="left_anti")


def mark_in_progress(
    ids: DataFrame, path: str, id_col: str = "id", ts=None
) -> None:
    """Claim ids before processing: append in_progress rows so a
    crashed worker is distinguishable from a never-started id
    (the reference tracks in-progress IDs for exactly this,
    utils/checkpoint.py:158-234). A later completed/failed row for the
    same id supersedes the claim (_latest picks it); a claim with NO
    later row is either a live worker (fresh) or a crash (stale) —
    filter_pending's ``in_progress_timeout_min`` arbitrates. ``ts``
    accepts an injected literal timestamp for deterministic tests."""
    append_ledger(
        ids.select(
            F.col(id_col).cast("string").alias("id"),
            F.lit("in_progress").alias("status"),
            F.lit(None).cast("string").alias("error"),
            (
                F.lit(ts).cast("timestamp") if ts is not None
                else F.current_timestamp()
            ).alias("ts"),
        ).dropDuplicates(["id"]),
        path,
    )


def read_ledger(spark: SparkSession, path: str) -> DataFrame:
    try:
        return spark.read.schema(LEDGER).parquet(path)
    except Exception:
        return local_frame(spark, [], LEDGER)


def append_ledger(df: DataFrame, path: str) -> None:
    """Append (id, status, error, ts) rows; atomic per job."""
    df.select("id", "status", "error", "ts").write.mode("append").parquet(path)


def record_failures(
    ids_with_errors: DataFrame,
    path: str,
    id_col: str = "id",
    error_col: str = "error",
    ts=None,
) -> None:
    """Append failed ids WITH their error strings — the triage artifact
    the reference keeps (utils/checkpoint.py:158-234 records failed ids
    + error text; mongodb_to_rdf.py:165-174 feeds it per analysis).
    ``ts`` accepts an injected literal timestamp for deterministic
    tests; defaults to current_timestamp."""
    append_ledger(
        ids_with_errors.select(
            F.col(id_col).cast("string").alias("id"),
            F.lit("failed").alias("status"),
            F.col(error_col).cast("string").alias("error"),
            (F.lit(ts).cast("timestamp") if ts is not None else F.current_timestamp()).alias("ts"),
        ).dropDuplicates(["id"]),
        path,
    )


def failed_report(ledger: DataFrame) -> DataFrame:
    """(id, error, ts) for every id whose LATEST status is failed —
    'which analyses failed and why' without grepping task logs. Ids that
    later completed (retry succeeded) drop out."""
    return _latest(ledger).where(F.col("status") == "failed").select(
        "id", "error", "ts"
    )


def clear_failed(spark: SparkSession, path: str) -> None:
    """Retry-after-clear: compact the ledger down to completed rows so
    failed ids become pending on the next run (the reference clears its
    failed-ids file before a retry pass). The ledger is tiny relative
    to the work set by construction; localCheckpoint materializes it so
    the same path can be overwritten."""
    kept = (
        read_ledger(spark, path)
        .where(F.col("status") == "completed")
        .localCheckpoint()
    )
    kept.write.mode("overwrite").parquet(path)


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
