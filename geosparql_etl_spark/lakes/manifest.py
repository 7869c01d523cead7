"""Object-store-safe MANIFEST commit protocol for the index lakes.

The rename-based substrate (``lakes/commit.py``) assumes atomic
``os.replace`` — true on POSIX filesystems and HDFS, absent on raw
object stores (S3 has no rename at all; "rename" is copy+delete and a
directory listing can observe the torn middle). This module is the
documented S3 deployment path turned into code (round 14): a
file-granular manifest protocol in the Iceberg/Delta family, needing
only two primitives every object store provides:

- PUT of a NEW key is atomic (readers see the whole object or nothing);
- LIST of a prefix is consistent (S3 is strongly consistent since 2020).

Protocol:

- Data files land under attempt-unique prefixes
  (``epoch=<tag>/attempt=<uuid>/ivf_cell=<k>/part-*.parquet``) — an
  attempt that dies mid-write leaves garbage that NO manifest
  references, so it is invisible by construction and reclaimed by
  ``manifest_vacuum``. A replayed epoch writes a fresh attempt prefix;
  readers keep only each epoch's LATEST manifest, so a torn first
  attempt can never mix rows into its replacement (the failure mode
  that makes epoch-granularity commit markers unsound on object
  stores: Spark part-file names are attempt-scoped uuids, so a retry
  into the same prefix doubles rows).
- The COMMIT POINT is one manifest object
  (``_manifests/m-<seq>-<epoch>-<n>.json``) listing the attempt's
  files with their partition metadata (ivf_cell), written AFTER every
  data file is durable. Locally the write is a plain create — readers
  skip unparsable manifests, which models a (never-observed-torn)
  object-store PUT conservatively.
- Readers never LIST data prefixes: the visible file set, per-file
  cell metadata, epoch→seq map and tombstone set all come from the
  manifests — one LIST of ``_manifests/`` serves metadata-level
  partition pruning (the probe's cell filter selects FILES before
  Spark ever opens one), which is exactly the Iceberg data-skipping
  shape and the read path you want at 100 TB.
- Tombstones are parquet files under ``_tombstones/`` referenced by
  ``kind="tombstone"`` manifests (same issue-seq / epoch scoping as
  the rename lake: a delete kills ids in epochs committed at issue
  time; later epochs survive).
- Compaction publishes a ``kind="reset"`` manifest at generation+1:
  manifests of lower generations stop being visible atomically with
  that single PUT. ``as_of_seq`` time travel is served within the
  current generation; a pin below the generation floor raises (the
  rename lake keeps pre-compaction history via its seq ledger — the
  manifest lake trades that for bounded metadata, documented).
- Two concurrent writers can race seq allocation and commit the same
  seq under different manifest keys: NEITHER commit is lost (distinct
  PUTs), both become visible, and ``manifest_fsck`` reports the
  duplicate seq as the same benign ``duplicate_seq`` finding the
  rename lake's fsck emits.

The ANN integration below reuses the exact probe machinery of
``operators/similarity.py`` (probe frame, top-k, tombstone
application), so a manifest-committed index answers probes
identically to a rename-committed one — pinned by the sim39 oracle.
"""

from __future__ import annotations

import json
import os
import uuid

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MANIFEST_DIR = "_manifests"
TOMBSTONE_DIR = "_tombstones"


# --- manifest read/write --------------------------------------------------


def _manifest_dir(path: str) -> str:
    return os.path.join(path, MANIFEST_DIR)


def read_manifests(path: str) -> list[dict]:
    """Every parseable manifest, sorted by file name (seq-ordered by
    construction). Unparsable files — a torn local write; an
    object-store PUT is never torn — are skipped: the commit they
    would have published simply has not happened."""
    d = _manifest_dir(path)
    if not os.path.isdir(d):
        return []
    out = []
    for f in sorted(os.listdir(d)):
        if not f.endswith(".json"):
            continue
        try:
            with open(os.path.join(d, f)) as fh:
                m = json.load(fh)
        except (OSError, json.JSONDecodeError):
            continue
        m["_name"] = f
        out.append(m)
    return out


def publish_manifest(path: str, entry: dict) -> str:
    """The commit point: PUT one NEW manifest object. The key embeds
    (seq, epoch, per-epoch attempt ordinal) so concurrent writers
    and replays always mint distinct keys and readers can order a
    replayed epoch's attempts."""
    d = _manifest_dir(path)
    os.makedirs(d, exist_ok=True)
    n = sum(
        1
        for m in read_manifests(path)
        if m.get("epoch") == entry.get("epoch")
        and m.get("kind") == entry.get("kind")
    )
    name = (
        f"m-{int(entry['seq']):08d}-{entry.get('epoch', 'none')}"
        f"-{n:04d}.json"
    )
    with open(os.path.join(d, name), "w") as fh:
        json.dump(entry, fh)
    return name


def current_generation(manifests: list[dict]) -> int:
    return max(
        (int(m["generation"]) for m in manifests if m.get("kind") == "reset"),
        default=0,
    )


def visible_manifests(path: str) -> list[dict]:
    """Manifests of the CURRENT generation, one per (kind, epoch) —
    a replayed epoch's latest attempt wins (file-name order: same
    seq, higher attempt ordinal)."""
    ms = read_manifests(path)
    gen = current_generation(ms)
    latest: dict[tuple, dict] = {}
    for m in ms:
        if int(m.get("generation", 0)) != gen:
            continue
        latest[(m.get("kind"), m.get("epoch"))] = m  # name-sorted: last wins
    return sorted(latest.values(), key=lambda m: m["_name"])


def next_seq(manifests: list[dict]) -> int:
    return max((int(m["seq"]) for m in manifests), default=-1) + 1


def epoch_seqs(path: str) -> dict[str, int]:
    """epoch -> seq for the current generation's data manifests (the
    tombstone-scoping / time-travel map the rename lake keeps in its
    ``_ledger`` sidecars)."""
    return {
        m["epoch"]: int(m["seq"])
        for m in visible_manifests(path)
        if m.get("kind") in ("append", "reset")
    }


def generation_floor(path: str) -> int:
    """The lowest seq still servable: the reset manifest's seq (0 when
    the lake has never compacted)."""
    ms = visible_manifests(path)
    return max(
        (int(m["seq"]) for m in ms if m.get("kind") == "reset"),
        default=0,
    )


def visible_files(
    path: str,
    cells: list[int] | None = None,
    as_of_seq: int | None = None,
) -> list[str]:
    """Absolute data-file paths visible at the pin, pruned to the
    probed cells from MANIFEST metadata alone — file-level data
    skipping without listing a single data prefix."""
    if as_of_seq is not None and as_of_seq < generation_floor(path):
        raise ValueError(
            f"as_of_seq={as_of_seq} predates the current generation "
            f"(floor {generation_floor(path)}): compaction collapsed "
            "that history in the manifest lake"
        )
    cs = set(cells) if cells is not None else None
    out = []
    for m in visible_manifests(path):
        if m.get("kind") not in ("append", "reset"):
            continue
        if as_of_seq is not None and int(m["seq"]) > as_of_seq:
            continue
        for f in m["files"]:
            if cs is not None and f.get("ivf_cell") is not None and (
                int(f["ivf_cell"]) not in cs
            ):
                continue
            out.append(os.path.join(path, f["path"]))
    return out


# --- ANN lake on the manifest substrate -----------------------------------


def _list_attempt_files(root: str, rel_prefix: str) -> list[dict]:
    """The attempt prefix's parquet files with ivf_cell parsed from
    the path — the ONE place the writer (who owns the prefix
    exclusively) lists a data directory."""
    out = []
    base = os.path.join(root, rel_prefix)
    for dirpath, _, files in os.walk(base):
        for f in files:
            if not f.endswith(".parquet"):
                continue
            rel = os.path.relpath(os.path.join(dirpath, f), root)
            cell = None
            for part in rel.split(os.sep):
                if part.startswith("ivf_cell="):
                    cell = int(part.split("=", 1)[1])
            out.append(
                {
                    "path": rel,
                    "size": os.path.getsize(os.path.join(dirpath, f)),
                    "ivf_cell": cell,
                }
            )
    return sorted(out, key=lambda f: f["path"])


def manifest_write_ivf_index(
    corpus: DataFrame,
    path: str,
    dim: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_cells: int | None = None,
    centroids: list[list[float]] | None = None,
    epoch: str = "base",
) -> None:
    """``write_ivf_index`` on the manifest substrate: cell-partitioned
    parquet into an attempt-unique prefix, then ONE manifest PUT as
    the commit. A replay (same epoch tag) keeps the epoch's existing
    seq, exactly like the rename lake's ledger replay rule."""
    from geosparql_etl_spark.operators.partitioning import spread
    from geosparql_etl_spark.operators.similarity import (
        _persist_quantizer,
        _quantizer_meta,
        auto_n_cells,
        l2_norm,
        with_ivf_cell,
    )

    if n_cells is None:
        n_cells = (
            len(centroids)
            if centroids is not None
            else auto_n_cells(corpus.count())
        )
    os.makedirs(path, exist_ok=True)
    _persist_quantizer(
        path, _quantizer_meta(dim, n_cells, centroids), replace=False
    )
    attempt = uuid.uuid4().hex[:8]
    rel = os.path.join(f"epoch={epoch}", f"attempt={attempt}")
    with_ivf_cell(
        spread(corpus), vec_col, dim, n_cells, centroids=centroids
    ).select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("__cv"),
        l2_norm(F.col(vec_col), dim).alias("__cn"),
        "ivf_cell",
    ).write.mode("overwrite").partitionBy("ivf_cell").parquet(
        os.path.join(path, rel)
    )
    ms = read_manifests(path)
    seqs = epoch_seqs(path)
    publish_manifest(
        path,
        {
            "kind": "append",
            "generation": current_generation(ms),
            "epoch": str(epoch),
            "seq": seqs.get(str(epoch), next_seq(ms)),
            "attempt": attempt,
            "files": _list_attempt_files(path, rel),
        },
    )


def manifest_delete_from_ivf_index(spark, path: str, ids) -> None:
    """Logical delete: ONE tombstone parquet PUT + ONE manifest PUT.
    Same scoping as the rename lake: the tombstone kills the ids in
    epochs committed at issue time (fanned per epoch), so an epoch
    that lands later re-introduces the id."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from geosparql_etl_spark.lakes.commit import collect_id_list

    id_list = sorted(collect_id_list(ids))
    ms = read_manifests(path)
    seqs = epoch_seqs(path)
    # unlike the rename lake (where deletes advance no ledger seq and
    # are stamped with the max COMMITTED seq), a manifest delete IS a
    # sequenced commit — stamping it with its own seq makes the pin
    # "as_of = last data seq" read the pre-delete state exactly
    issued = next_seq(ms)
    epochs = sorted(seqs)
    nid, ep = [], []
    for e in epochs:
        nid.extend(id_list)
        ep.extend([e] * len(id_list))
    table = pa.table(
        {
            "neighbor_id": pa.array(nid, pa.int64()),
            "epoch": pa.array(ep, pa.string()),
            "issued": pa.array([issued] * len(nid), pa.int32()),
        }
    )
    td = os.path.join(path, TOMBSTONE_DIR)
    os.makedirs(td, exist_ok=True)
    fname = f"t-{uuid.uuid4().hex[:12]}.parquet"
    pq.write_table(table, os.path.join(td, fname))
    publish_manifest(
        path,
        {
            "kind": "tombstone",
            "generation": current_generation(ms),
            "epoch": f"tomb-{uuid.uuid4().hex[:8]}",
            "seq": issued,
            "issued": issued,
            "files": [{"path": os.path.join(TOMBSTONE_DIR, fname)}],
        },
    )


def _manifest_tombstones(
    spark, path: str, as_of_seq: int | None
) -> DataFrame | None:
    """The visible tombstone frame (manifest-listed files only — a
    torn deleter's unreferenced parquet never serves), issue-scoped
    like ``read_index_tombstones``."""
    files = [
        os.path.join(path, f["path"])
        for m in visible_manifests(path)
        if m.get("kind") == "tombstone"
        and (as_of_seq is None or int(m.get("issued", 0)) <= as_of_seq)
        for f in m["files"]
    ]
    if not files:
        return None
    t = spark.read.parquet(*files)
    if as_of_seq is not None:
        t = t.where(F.coalesce(F.col("issued"), F.lit(0)) <= as_of_seq)
    return t.select(
        "neighbor_id", F.col("epoch").cast("string").alias("epoch")
    ).dropDuplicates()


def manifest_ivf_topk(
    spark,
    path: str,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
    dim: int = 64,
    n_cells: int = 16,
    n_probe: int = 1,
    centroids: list[list[float]] | None = None,
    as_of_seq: int | None = None,
) -> DataFrame:
    """``ivf_index_topk`` against a manifest-committed index: the
    probed cell set selects FILES from manifest metadata (no data
    LIST, no directory-marker reads), the scan gets exactly those
    files with ``basePath`` so partition columns still materialize,
    and the shared probe machinery does the rest — identical answers
    to the rename lake by construction (sim39 oracle)."""
    from geosparql_etl_spark.operators.similarity import (
        _apply_ann_tombstones,
        _ivf_centroids,
        _probe_frame,
        _probe_topk,
        read_index_quantizer,
    )

    if centroids is None:
        q = read_index_quantizer(path)
        if q is not None:
            dim, n_cells = int(q["dim"]), int(q["n_cells"])
            cents = q["centroids"]
        else:
            cents = _ivf_centroids(dim, n_cells)
    else:
        cents = centroids
    qb = _probe_frame(queries, id_col, vec_col, dim, cents, n_probe)
    cells = sorted(
        r["__cell"] for r in qb.select("__cell").distinct().collect()
    )
    files = visible_files(path, cells=cells, as_of_seq=as_of_seq)
    if not files:
        schema = (
            "query_id long, neighbor_id long, cosine_sim double, rank int"
        )
        return spark.createDataFrame([], schema)
    cb = (
        spark.read.option("basePath", path)
        .parquet(*files)
        .select(
            "neighbor_id",
            "__cv",
            "__cn",
            F.col("epoch").cast("string").alias("epoch"),
            F.col("ivf_cell").alias("__cell"),
        )
    )
    tomb = _manifest_tombstones(spark, path, as_of_seq)
    if tomb is not None:
        cb = _apply_ann_tombstones(cb, tomb)
    return _probe_topk(cb.drop("epoch"), qb, k=k, dim=dim)


def manifest_compact_ivf_index(spark, path: str) -> None:
    """Compaction: rewrite the visible rows (tombstones applied) as a
    fresh ``base`` epoch, then publish ONE ``reset`` manifest at
    generation+1 — the single PUT that atomically retires every older
    manifest. Old data files stay on disk (still described by the old
    generation's manifests) until ``manifest_vacuum``."""
    files = visible_files(path)
    attempt = uuid.uuid4().hex[:8]
    rel = os.path.join("epoch=base", f"attempt={attempt}")
    if files:
        cb = (
            spark.read.option("basePath", path)
            .parquet(*files)
            .select(
                "neighbor_id",
                "__cv",
                "__cn",
                F.col("epoch").cast("string").alias("epoch"),
                "ivf_cell",
            )
        )
        tomb = _manifest_tombstones(spark, path, None)
        if tomb is not None:
            from geosparql_etl_spark.operators.similarity import (
                _apply_ann_tombstones,
            )

            cb = _apply_ann_tombstones(cb, tomb)
        cb.drop("epoch").write.mode("overwrite").partitionBy(
            "ivf_cell"
        ).parquet(os.path.join(path, rel))
    ms = read_manifests(path)
    publish_manifest(
        path,
        {
            "kind": "reset",
            "generation": current_generation(ms) + 1,
            "epoch": "base",
            "seq": next_seq(ms),
            "attempt": attempt,
            "files": _list_attempt_files(path, rel) if files else [],
        },
    )


def manifest_vacuum(path: str) -> list[str]:
    """Garbage collection: delete data/tombstone files referenced by
    NO current-generation manifest (torn attempts, replaced replays,
    compacted-away epochs) and retire older-generation manifests.
    Run it only when no reader can hold a pre-reset snapshot —
    the object-store grace-period discipline, left to the operator
    (no wall clock in here). Returns the deleted paths."""
    ms = read_manifests(path)
    gen = current_generation(ms)
    live = {
        f["path"]
        for m in visible_manifests(path)
        for f in m.get("files", [])
    }
    removed = []
    for sub in ("epoch=", TOMBSTONE_DIR):
        for dirpath, _, files in os.walk(path):
            rel_dir = os.path.relpath(dirpath, path)
            if not rel_dir.startswith(sub):
                continue
            for f in files:
                rel = os.path.join(rel_dir, f)
                if f.endswith(".parquet") and rel not in live:
                    os.remove(os.path.join(dirpath, f))
                    removed.append(rel)
    for m in ms:
        if int(m.get("generation", 0)) < gen:
            os.remove(os.path.join(_manifest_dir(path), m["_name"]))
            removed.append(os.path.join(MANIFEST_DIR, m["_name"]))
    # sweep now-empty attempt/epoch dirs (cosmetic on a real object
    # store — prefixes have no existence apart from their keys)
    for dirpath, dirs, files in sorted(
        os.walk(path), key=lambda w: -len(w[0])
    ):
        if not dirs and not files and dirpath != path:
            os.rmdir(dirpath)
    return removed


def manifest_fsck(path: str) -> list[dict]:
    """Read-only invariant checks, in the lakes' finding shape:
    manifests referencing missing files (error — data loss or a
    mis-run vacuum), orphan data files (info — torn attempts awaiting
    vacuum), duplicate seqs (info — concurrent writers, both commits
    visible, order undefined)."""
    from geosparql_etl_spark.lakes.commit import duplicate_seq_findings

    out = []
    vis = visible_manifests(path)
    live = set()
    for m in vis:
        for f in m.get("files", []):
            live.add(f["path"])
            if not os.path.exists(os.path.join(path, f["path"])):
                out.append(
                    {
                        "check": "missing_file",
                        "severity": "error",
                        "detail": (
                            f"manifest {m['_name']} references "
                            f"{f['path']} which does not exist"
                        ),
                    }
                )
    on_disk = set()
    for dirpath, _, files in os.walk(path):
        rel_dir = os.path.relpath(dirpath, path)
        if rel_dir.startswith(MANIFEST_DIR):
            continue
        for f in files:
            if f.endswith(".parquet"):
                on_disk.add(os.path.join(rel_dir, f))
    for rel in sorted(on_disk - live):
        out.append(
            {
                "check": "orphan_file",
                "severity": "info",
                "detail": (
                    f"{rel} is referenced by no current-generation "
                    "manifest (torn attempt or pre-compaction file) — "
                    "invisible to readers, reclaimable by vacuum"
                ),
            }
        )
    out.extend(
        duplicate_seq_findings(
            {
                m["epoch"]: int(m["seq"])
                for m in vis
                if m.get("kind") in ("append", "reset")
            }
        )
    )
    return out
