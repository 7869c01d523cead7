"""Shared cross-operator helpers."""

from __future__ import annotations

from pyspark.sql import DataFrame


def cut_lineage(df: DataFrame) -> DataFrame:
    """Materialize + truncate lineage for iterative loops.

    Reliable ``checkpoint`` when a checkpoint dir is configured
    (HDFS/S3 on a cluster — survives executor loss, which
    ``localCheckpoint`` blocks do not); ``localCheckpoint`` otherwise
    (executor storage, fine for local mode). One definition for every
    iterative operator (connected components, pagerank, triangles,
    BPE, the streaming IVM) so the recovery semantics cannot drift.
    """
    if df.sparkSession.sparkContext.getCheckpointDir() is not None:
        return df.checkpoint(eager=True)
    return df.localCheckpoint()
