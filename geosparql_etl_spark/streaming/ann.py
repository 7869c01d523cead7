"""Streaming maintenance of the persisted IVF index: new embedding
drops land continuously and must become PROBE-VISIBLE exactly once —
the index-freshness half of the ANN story (sim16/sim18 build; this
module maintains).

Design:
  - discovery/exactly-once rides the parquet file source (checkpointed:
    a restarted stream never re-ingests a drop);
  - each micro-batch assigns cells with the SAME trained quantizer the
    index was built with (``with_ivf_cell(centroids=...)`` — quantizer
    drift between build and maintenance would corrupt probe recall
    silently, so the centroids are a required argument, not a default);
  - the batch writes ``index_path/epoch=<id>/ivf_cell=K/`` in OVERWRITE
    mode: a replayed epoch (failure/restart) rewrites ITS OWN directory
    idempotently — the run_incremental_curation discipline applied to
    an index. The initial batch build is ``epoch=base``
    (write_ivf_index(..., epoch="base")).
  - probes are unchanged: ``ivf_index_topk`` reads the root, Spark
    discovers (epoch, ivf_cell) partition columns, and the probed-cell
    partition filter prunes ivf_cell directories ACROSS all epochs —
    per-probe scan cost regardless of how many maintenance epochs have
    accumulated. (Many tiny epochs = the small-files problem; compact
    by rewriting to a fresh base exactly like compact_quad_lake.)
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from geosparql_etl_spark.operators.similarity import (
    _apply_ann_tombstones,
    l2_norm,
    read_index_tombstones,
    with_ivf_cell,
)

EMBEDDINGS_SCHEMA = (
    "vec_id long, embedding array<float>, label string, norm double"
)


def _stream_id(checkpoint_dir: str) -> str:
    """Stable 8-hex stream id from the checkpoint path — epoch tags
    are the replay identity (lakes.commit.stream_id)."""
    from geosparql_etl_spark.lakes.commit import stream_id

    return stream_id(checkpoint_dir)


def run_index_maintenance(
    spark: SparkSession,
    landing_dir: str,
    index_path: str,
    checkpoint_dir: str,
    centroids: list[list[float]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    n_cells: int = 16,
):
    """Landing dir -> the persisted IVF index, exactly once per drop.
    Epochs tag as <stream id>-<batch id> so independent maintenance
    streams never collide. Returns the started StreamingQuery
    (availableNow)."""
    sid = _stream_id(checkpoint_dir)

    def write_batch(batch_df: DataFrame, epoch_id: int) -> None:
        from geosparql_etl_spark.operators.similarity import (
            _commit_ann_epoch,
            _persist_quantizer,
            _quantizer_meta,
        )

        # ledger seq + drift guard, same as write_ivf_index's epoch
        # path (the ledger makes maintenance epochs time-travelable;
        # the guard fails loudly on a quantizer mismatch)
        _commit_ann_epoch(index_path, f"{sid}-{epoch_id}")
        _persist_quantizer(
            index_path,
            _quantizer_meta(dim, n_cells, centroids),
            replace=False,
        )
        rows = with_ivf_cell(
            batch_df, vec_col, dim, n_cells, centroids=centroids
        ).select(
            F.col(id_col).alias("neighbor_id"),
            F.col(vec_col).alias("__cv"),
            l2_norm(F.col(vec_col), dim).alias("__cn"),
            "ivf_cell",
        )
        rows.repartition(
            # clustered write (round 14, guide §6): one file per cell
            # per epoch instead of tasks x cells
            F.col("ivf_cell")
        ).write.mode("overwrite").partitionBy("ivf_cell").parquet(
            os.path.join(index_path, f"epoch={sid}-{epoch_id}")
        )

    from geosparql_etl_spark.lakes.commit import (
        run_availablenow_file_stream,
    )

    return run_availablenow_file_stream(
        spark, landing_dir, checkpoint_dir, write_batch,
        EMBEDDINGS_SCHEMA,
    )


def run_ann_upserts(
    spark: SparkSession,
    landing_dir: str,
    index_path: str,
    checkpoint_dir: str,
    centroids: list[list[float]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    n_cells: int = 16,
):
    """CDC into the vector lake: embedding drops in ``landing_dir``
    are UPSERTS (re-embeddings of known ids replace their indexed
    version; unseen ids insert) — each micro-batch runs
    update_ivf_index under its epoch id, so the batch's epoch-scoped
    tombstones + replacement epoch are both keyed by the epoch.
    Replay-safe: a replayed batch finds its own tombstones (keyed by
    ``src_epoch``) already on disk and reuses them as the persisted
    scope instead of recomputing the epoch set — so epochs committed
    by another stream (or a manual append) between crash and replay
    are never tombstoned for this batch's ids. Epochs tag as
    u<stream id>-<batch id> so independent streams never collide.
    Returns the started availableNow StreamingQuery — the upsert twin
    of run_index_maintenance."""
    from geosparql_etl_spark.operators.similarity import update_ivf_index

    sid = _stream_id(checkpoint_dir)

    def write_batch(batch_df: DataFrame, epoch_id: int) -> None:
        update_ivf_index(
            spark, batch_df, index_path, epoch=f"u{sid}-{epoch_id}",
            id_col=id_col, vec_col=vec_col, dim=dim, n_cells=n_cells,
            centroids=centroids,
        )

    from geosparql_etl_spark.lakes.commit import (
        run_availablenow_file_stream,
    )

    return run_availablenow_file_stream(
        spark, landing_dir, checkpoint_dir, write_batch,
        EMBEDDINGS_SCHEMA,
    )


def compact_ivf_index(spark: SparkSession, index_path: str) -> None:
    """Rewrite an epoch-accumulated IVF index so ``epoch=base`` holds
    everything and the maintenance epochs disappear — the
    compact_quad_lake pattern for the ANN lake: long-lived maintenance
    accumulates one small parquet file per cell per epoch, and probe
    scans fan one task per file.

    Two-phase with a recoverable swap: the compacted generation is
    written COMPLETELY to a sibling temp directory while the live
    index keeps serving probes; the swap then renames the live index
    ASIDE (``.old``) before renaming the temp into place, and only
    deletes ``.old`` last — so at every crash point a full copy of
    the data exists on disk (write failure: live index untouched;
    crash between the two renames: ``.old`` holds everything and the
    next call's recovery preamble restores it; crash before the final
    cleanup: the live index is already the new generation). Same
    old-generation-deleted-only-at-commit discipline as the ntriples
    two-phase-commit writer behind compact_quad_lake. Cell
    assignments are NOT recomputed (rows keep the ivf_cell they were
    ingested with — compaction must never move a vector between
    cells, or the index would disagree with a probe that already saw
    it). The triple (neighbor_id, __cv, __cn) set is unchanged;
    probes behave identically after (pinned by test)."""
    import shutil

    from geosparql_etl_spark.lakes import commit as lc

    tmp_path, old_path = lc.swap_paths(index_path, "compact")
    lc.recover_swap(index_path, old_path)
    shutil.rmtree(tmp_path, ignore_errors=True)
    scan = spark.read.parquet(index_path)
    if "epoch" in scan.columns:
        # committed epochs only (round-13 fix): a crashed writer's
        # torn epoch must not be baked into the compacted base — and
        # since the swap replaces the whole root, the orphan directory
        # is garbage-collected by the same stroke
        from geosparql_etl_spark.operators.similarity import (
            _committed_epochs,
        )

        scan = scan.where(
            F.col("epoch").cast("string").isin(
                _committed_epochs(index_path)
            )
        )
    # keep EVERY data column — a PQ layout carries __pq and arbitrary
    # carry_cols beside the vectors, and dropping them at compaction
    # would silently break the codes-only ADC probe (round-12 fix:
    # the old explicit keep-list lost __pq)
    df = scan
    tomb = read_index_tombstones(spark, index_path)
    if tomb is not None:
        # apply pending deletes physically (epoch-scoped update
        # tombstones spare the re-inserted version — the compacted
        # base keeps exactly the live rows); the tombstone directory
        # is NOT copied into the new generation, so the swap clears
        # it atomically with the rewrite (crash before the swap
        # leaves both the rows and their tombstones in place —
        # probes stay correct either way)
        df = _apply_ann_tombstones(df, tomb)
    df = df.drop("epoch")
    if df.limit(1).count() == 0:
        # fully-tombstoned index: a partitionBy write of zero rows
        # emits only _SUCCESS — a footer-less generation that no
        # later probe or compaction could infer a schema from. Write
        # a footer-bearing empty file into one explicit cell dir
        # instead (same directory depth as a real generation, so a
        # later append's partition discovery stays consistent).
        df.drop("ivf_cell").coalesce(1).write.mode("overwrite").parquet(
            os.path.join(tmp_path, "epoch=base", "ivf_cell=0")
        )
        # the explicit-cell write leaves Spark's _SUCCESS one level
        # too deep — touch the epoch-level marker so the commit gate
        # (_committed_epochs) classifies the compacted base as
        # committed, not torn (round-13 review finding)
        open(
            os.path.join(tmp_path, "epoch=base", "_SUCCESS"), "w"
        ).close()
    else:
        df.repartition("ivf_cell").write.mode("overwrite").partitionBy(
            "ivf_cell"
        ).parquet(os.path.join(tmp_path, "epoch=base"))
    # the quantizer sidecar survives compaction (rows keep their
    # cells, so the quantizer is unchanged); the epoch ledger
    # collapses to ONE entry — base at seq 0, written explicitly
    # (round-13 fix: relying on the un-ledgered fallback let the
    # first post-compaction append push base's inferred seq ABOVE
    # its own, so as_of_seq probes pinned at the append excluded the
    # entire compacted corpus and issue stamps drifted per append)
    qfile = os.path.join(index_path, "_quantizer.json")
    if os.path.exists(qfile):
        shutil.copyfile(
            qfile, os.path.join(tmp_path, "_quantizer.json")
        )
    lc.commit_ledger_entry(tmp_path, "base", {"seq": 0})
    # commit point: the replacement generation is fully on disk
    lc.commit_swap(index_path, tmp_path, old_path)
