"""Hybrid retrieval: BM25 lexical scoring + reciprocal rank fusion.

The standard RAG / training-data retrieval pattern: a lexical arm
(BM25, Robertson et al.) and a vector arm (cosine ANN) each produce a
ranked candidate list, and reciprocal rank fusion (Cormack et al. 2009,
``1/(k + rank)`` summed across arms) merges them — rank-space fusion
needs no score calibration between arms, which is why it is the
industry default for hybrid search.

Scale design:

* **BM25 is three bounded aggregations, zero UDFs.** Tokens explode
  once; document length and the corpus stats reduce map-side; the
  term-frequency table is pre-filtered to the QUERY terms (a handful),
  so the per-term join traffic is |matching docs|, not |corpus
  tokens|. The document-frequency and corpus-stats frames are 1-to-
  few rows and broadcast.
* **Deterministic across engines.** Per-term contributions are
  computed in double then rounded to 9 decimals and summed as
  DECIMAL(18,9) — the rounding absorbs last-ulp differences between
  ln() implementations, and the decimal sum is order-independent, so
  ranks (score desc, doc_id) are bit-stable in Spark and any ANSI
  replay engine.
* **Global top-k without a global window.** Candidate cut is
  ``orderBy().limit(k)`` (TakeOrdered — distributed partial top-k per
  partition, merged on the driver-side heap), and row_number ranks
  are assigned on the ALREADY-CUT k-row frame, so no corpus-sized
  single-partition window exists anywhere.

The reference has no retrieval surface; this is a charter scale
operator alongside sim01-sim11.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from geosparql_etl_spark.util import local_frame


def bm25_scores(
    docs: DataFrame,
    terms: list[str],
    k1: float = 1.2,
    b: float = 0.75,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Okapi BM25 scores for a constant query-term list ->
    (id_col, score DECIMAL(18,9)), docs matching no term absent.

    idf = ln(1 + (N - df + 0.5) / (df + 0.5))  (the non-negative
    variant), tf part = tf*(k1+1) / (tf + k1*(1 - b + b*dl/avgdl)).
    """
    toks = docs.select(
        F.col(id_col),
        F.explode(F.split(F.lower(F.col(text_col)), r"\s+")).alias("tok"),
    ).where(F.col("tok") != "")
    dl = toks.groupBy(id_col).agg(F.count("*").alias("dl"))
    stats = dl.agg(
        F.count("*").alias("n_docs"), F.avg("dl").alias("avgdl")
    )
    tf = (
        toks.where(F.col("tok").isin(list(terms)))
        .groupBy(id_col, "tok")
        .agg(F.count("*").alias("tf"))
    )
    dft = tf.groupBy("tok").agg(F.count("*").alias("df"))
    idf = F.log(
        1
        + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)
    )
    tf_part = (F.col("tf") * (k1 + 1)) / (
        F.col("tf")
        + k1 * (1 - b + b * F.col("dl") / F.col("avgdl"))
    )
    contrib = (
        tf.join(dl, id_col)
        .join(F.broadcast(dft), "tok")
        .crossJoin(F.broadcast(stats))
        .select(
            F.col(id_col),
            F.round(idf * tf_part, 9).cast("decimal(18,9)").alias("c"),
        )
    )
    return contrib.groupBy(id_col).agg(F.sum("c").alias("score"))


def ranked_cut(
    scored: DataFrame,
    score_col: str,
    k: int,
    id_col: str = "doc_id",
    rank_col: str = "rank",
) -> DataFrame:
    """Top-k by (score desc, id asc) with 1-based ranks ->
    (id_col, rank_col). TakeOrdered cut first, ranks windowed over
    the k surviving rows only."""
    cut = scored.orderBy(F.col(score_col).desc(), F.col(id_col)).limit(k)
    w = Window.orderBy(F.col(score_col).desc(), F.col(id_col))
    return cut.select(
        F.col(id_col), F.row_number().over(w).alias(rank_col)
    )


def rrf_fuse(
    arms: list[DataFrame],
    k: int = 60,
    id_col: str = "doc_id",
    out_col: str = "rrf",
) -> DataFrame:
    """Reciprocal rank fusion: full-outer-join the arms' (id, rank)
    frames and sum 1/(k + rank), absent arms contributing 0. Each
    arm's rank column must be unique across arms (they survive into
    the output for auditability)."""
    fused: DataFrame | None = None
    for arm in arms:
        fused = (
            arm
            if fused is None
            else fused.join(arm, on=id_col, how="full")
        )
    assert fused is not None
    score: Column = F.lit(0.0)
    for arm in arms:
        rank_col = [c for c in arm.columns if c != id_col][0]
        score = score + F.coalesce(
            F.lit(1.0) / (k + F.col(rank_col)), F.lit(0.0)
        )
    return fused.withColumn(out_col, score)


def mmr_rerank(
    qsims: DataFrame,
    pairsims: DataFrame,
    k: int = 5,
    lam: float = 0.7,
    id_col: str = "doc_id",
) -> DataFrame:
    """Maximal Marginal Relevance (Carbonell & Goldstein 1998)
    diversified selection over a BOUNDED candidate pool.

    ``qsims``: (id_col, qsim) — query relevance of each pool member.
    ``pairsims``: (id_a, id_b, psim) — pool-internal similarities,
    both directions. Selects k rounds of
    ``argmax lam*qsim - (1-lam)*max(psim to selected)`` ->
    (id_col, mmr_rank, mmr_score).

    Scale design: candidate GENERATION is the corpus-scale stage
    (TakeOrdered / ANN top-N); this re-ranker is O(k * N^2) on the
    already-cut pool by construction, expressed as k rounds of tiny
    anti-join + max-penalty aggregation — no driver-side collect, so
    the pool bound can grow without touching driver memory. Scores
    round to 9 decimals before the argmax, so selection order is
    stable across engines (cosine ulp differences absorbed); ties
    break on the id.
    """
    sel: DataFrame | None = None
    for r in range(1, k + 1):
        if sel is None:
            scored = qsims.select(
                F.col(id_col),
                F.round(lam * F.col("qsim"), 9).alias("score"),
            )
        else:
            cand = qsims.join(sel.select(id_col), id_col, "left_anti")
            pen = (
                pairsims.join(
                    sel.select(F.col(id_col).alias("id_b")), "id_b"
                )
                .groupBy("id_a")
                .agg(F.max("psim").alias("pen"))
            )
            scored = cand.join(
                pen, cand[id_col] == pen.id_a, "left"
            ).select(
                F.col(id_col),
                F.round(
                    lam * F.col("qsim")
                    - (1 - lam) * F.coalesce(F.col("pen"), F.lit(0.0)),
                    9,
                ).alias("score"),
            )
        pick = (
            scored.orderBy(F.col("score").desc(), F.col(id_col))
            .limit(1)
            .select(
                F.col(id_col),
                F.lit(r).alias("mmr_rank"),
                F.col("score").alias("mmr_score"),
            )
        )
        sel = pick if sel is None else sel.unionByName(pick)
    assert sel is not None
    return sel


# --- persisted inverted text index (the lexical twin of the ANN lake) --------
#
# write_ivf_index gives vectors a partition-pruned serving layout; this
# gives TERMS one. Postings are parquet partitioned by a PORTABLE term
# bucket (md5-prefix % n_buckets — computable identically in Python,
# Spark SQL, and any replay engine), so a query reads ONLY its terms'
# bucket directories: per-term cost, never a corpus scan. Document
# length is DENORMALIZED into each posting row (the forward-index
# trick), so scoring needs no corpus-sized doclen join; corpus stats
# are metadata-sized per-epoch ledger entries. Incremental epochs
# mirror streaming/ann.py: epoch=base at build, epoch=<tag> appends of
# NEW documents, bucket pruning works across epochs.
#
# Concurrency model (round 12): appends/upserts/deletes are
# MULTI-WRITER safe — every commit is one atomic rename of a file the
# writer alone names (epoch data dirs are stream-id-namespaced, ledger
# entries are per-epoch sidecar files in _ledger/, tombstones are
# uniquely-named driver-written parquet files via
# util.atomic_parquet_append — never a Spark append job's shared
# _temporary staging, never a read-modify-write of a shared file).
# Two concurrent NEW epochs may draw the same seq; that is benign for
# tombstone scoping (both sit strictly after every tombstone issued
# before either committed) — seq ORDER between concurrent writers is
# not defined, which is the same statement. COMPACTION is the one
# single-actor op: it swaps the whole index root, so epochs committed
# while a compaction is writing would be discarded by the swap — run
# it from one maintenance owner with writers quiesced (the usual LSM
# major-compaction rule).

TEXT_INDEX_BUCKETS = 64


def term_bucket_py(tok: str, n_buckets: int = TEXT_INDEX_BUCKETS) -> int:
    import hashlib

    return int(hashlib.md5(tok.encode("utf-8")).hexdigest()[:8], 16) % n_buckets


def _term_bucket_col(tok: Column, n_buckets: int) -> Column:
    return (
        F.conv(F.substring(F.md5(tok), 1, 8), 16, 10).cast("long")
        % n_buckets
    ).alias("bucket")


def doc_bucket_py(doc_id: int, n_buckets: int = TEXT_INDEX_BUCKETS) -> int:
    """Portable doc-id bucket for the forward (doclen) sidecar — md5
    of the decimal id string, same recipe as the term bucket so any
    replay engine can compute it."""
    import hashlib

    return (
        int(hashlib.md5(str(int(doc_id)).encode()).hexdigest()[:8], 16)
        % n_buckets
    )


def _doc_bucket_col(doc_id: Column, n_buckets: int) -> Column:
    return (
        F.conv(F.substring(F.md5(doc_id.cast("string")), 1, 8), 16, 10)
        .cast("long")
        % n_buckets
    ).alias("dbucket")


def _index_postings(
    docs: DataFrame, id_col: str, text_col: str, n_buckets: int
) -> DataFrame:
    """Positional postings: (tok, doc_id, tf, dl, pos) where ``pos``
    is the sorted 1-based occurrence list within the doc's cleaned
    token sequence — what phrase/proximity queries consume
    (``phrase_topk``); tf/dl are derived from the same sequence so
    BM25 scoring is unchanged by the position payload."""
    arr = F.filter(
        F.split(F.lower(F.col(text_col)), r"\s+"), lambda x: x != ""
    )
    base = docs.select(F.col(id_col).alias("doc_id"), arr.alias("__t"))
    toks = base.select(
        "doc_id", F.size("__t").alias("dl"),
        F.posexplode("__t").alias("__p", "tok"),
    )
    grouped = toks.groupBy("doc_id", "dl", "tok").agg(
        F.count("*").alias("tf"),
        F.sort_array(F.collect_list(F.col("__p") + 1)).alias("pos"),
    )
    return grouped.select(
        "tok", "doc_id", "tf", "dl", "pos",
        _term_bucket_col(F.col("tok"), n_buckets),
    )


def _read_stats(path: str) -> dict:
    """The index's ledger: ``_stats.json`` (n_buckets + the epochs
    present at build/compaction time) merged with one sidecar entry
    file per appended epoch (``_ledger/<epoch>.json``). The sidecar
    form is what makes the lake MULTI-WRITER: an epoch commit is one
    atomic rename of its own file — no read-modify-write of a shared
    ledger, so two concurrent upsert streams can never lose each
    other's commit (round-12; previously an interleaved stats rewrite
    could orphan a just-committed epoch). Entries sort by filename
    for the legacy positional-seq fallback."""
    import json
    import os

    from geosparql_etl_spark.lakes import commit as lc

    with open(os.path.join(path, "_stats.json")) as fh:
        stats = json.load(fh)
    stats["epochs"].update(lc.read_ledger_entries(path))
    return stats


def _write_stats(path: str, stats: dict) -> None:
    import json
    import os

    tmp = os.path.join(path, "_stats.json.tmp")
    with open(tmp, "w") as fh:
        json.dump(stats, fh)
    os.replace(tmp, os.path.join(path, "_stats.json"))


def _commit_epoch_entry(path: str, epoch: str, entry: dict) -> None:
    """Atomically commit ONE epoch's ledger entry as its own sidecar
    file — the multi-writer commit point (see ``_read_stats``;
    lakes.commit.commit_ledger_entry). A replayed epoch overwrites
    its own file idempotently."""
    from geosparql_etl_spark.lakes import commit as lc

    lc.commit_ledger_entry(path, epoch, entry)


def _epoch_contribution(spark, epoch_path: str) -> dict:
    """Doc count + length total of ONE epoch, read back from its
    just-written parquet (tiny and already materialized — recomputing
    the tokenize/aggregate pipeline here would run the whole DAG a
    second time per build/append, review finding round 11)."""
    agg = (
        spark.read.parquet(epoch_path)
        .select("doc_id", "dl")
        .dropDuplicates(["doc_id"])
        .agg(F.count("*").alias("n"), F.sum("dl").alias("s"))
        .collect()[0]
    )
    return {"n_docs": int(agg["n"] or 0), "sum_dl": int(agg["s"] or 0)}


def _write_doclens_epoch(
    spark, path: str, epoch: str, postings_epoch_path: str, n_buckets: int
) -> None:
    """Forward-index sidecar: ``_doclens/epoch=<tag>/dbucket=K/`` rows
    (doc_id, dl), derived from the epoch's just-written postings.
    Underscore dir — invisible to plain postings scans. Bucketed by
    the PORTABLE doc-id bucket so delete-time stats adjustment reads
    only the tombstoned docs' buckets (per-delete cost, never a
    corpus-wide forward scan)."""
    import os

    (
        spark.read.parquet(postings_epoch_path)
        .select("doc_id", "dl")
        .dropDuplicates(["doc_id"])
        .select("doc_id", "dl", _doc_bucket_col(F.col("doc_id"), n_buckets))
        .repartition(F.col("dbucket"))  # clustered write (guide §6)
        .write.mode("overwrite")
        .partitionBy("dbucket")
        .parquet(os.path.join(path, "_doclens", f"epoch={epoch}"))
    )


def write_text_index(
    docs: DataFrame,
    path: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = TEXT_INDEX_BUCKETS,
) -> None:
    """Build the persisted index: ``path/postings/epoch=base/bucket=K/``
    rows (tok, doc_id, tf, dl) + the per-epoch stats LEDGER sidecar
    (totals are derived by summing epoch entries, so a replayed epoch
    can never double-count — exactly-once stats on top of
    at-least-once epoch delivery)."""
    import os
    import shutil

    # a REBUILD must reset the whole layout: overwriting only
    # epoch=base would leave stale append epochs on disk while the
    # fresh ledger no longer lists them (review finding round 11 —
    # ghost postings, silently wrong df/avgdl)
    shutil.rmtree(os.path.join(path, "postings"), ignore_errors=True)
    shutil.rmtree(os.path.join(path, "_doclens"), ignore_errors=True)
    shutil.rmtree(os.path.join(path, "_tombstones"), ignore_errors=True)
    # the per-epoch ledger sidecars too (round 12): stale entries
    # would resurrect the previous generation's epochs in _read_stats
    shutil.rmtree(os.path.join(path, "_ledger"), ignore_errors=True)
    epoch_path = os.path.join(path, "postings", "epoch=base")
    post = _index_postings(docs, id_col, text_col, n_buckets)
    post.repartition(
        # clustered write (round 14, guide §6): unclustered partitionBy
        # emits tasks x buckets small files; one exchange bounds it to
        # one file per term bucket
        F.col("bucket")
    ).write.mode("overwrite").partitionBy("bucket").parquet(epoch_path)
    _write_doclens_epoch(
        docs.sparkSession, path, "base", epoch_path, n_buckets
    )
    base = _epoch_contribution(docs.sparkSession, epoch_path)
    base["seq"] = 0
    _write_stats(path, {"n_buckets": n_buckets, "epochs": {"base": base}})


def append_to_text_index(
    docs: DataFrame,
    path: str,
    epoch: str,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> None:
    """Incremental maintenance: NEW documents land as
    ``postings/epoch=<tag>/bucket=K/`` and the stats ledger records
    the epoch's contribution UNDER ITS TAG. Both writes are keyed by
    the epoch, so a replayed epoch (streaming restart, retried batch)
    overwrites its own directory and its own ledger entry — idempotent
    end to end, the streaming/ann.py discipline extended to the
    derived statistics."""
    import os

    stats = _read_stats(path)
    epoch_path = os.path.join(path, "postings", f"epoch={epoch}")
    if docs.limit(1).count() == 0:
        # an EMPTY epoch (streams deliver empty micro-batches): a
        # zero-row parquet write leaves no readable footer, so skip
        # the data writes and commit a zero ledger entry — the epoch
        # stays replay-keyed, probes' isin filter matches no dir
        from geosparql_etl_spark.lakes.commit import assign_seq

        entry = {"n_docs": 0, "sum_dl": 0}
        entry["seq"] = assign_seq(_epoch_seqs(stats), str(epoch))
        _commit_epoch_entry(path, str(epoch), entry)
        return
    post = _index_postings(docs, id_col, text_col, stats["n_buckets"])
    post.repartition(
        # clustered write (round 14, guide §6): unclustered partitionBy
        # emits tasks x buckets small files; one exchange bounds it to
        # one file per term bucket
        F.col("bucket")
    ).write.mode("overwrite").partitionBy("bucket").parquet(epoch_path)
    _write_doclens_epoch(
        docs.sparkSession, path, str(epoch), epoch_path, stats["n_buckets"]
    )
    # postings first, ledger second: the ledger entry is the COMMIT
    # point — readers scan only ledger-listed epochs, so a crash
    # between the two writes leaves an invisible orphan epoch, never
    # a half-counted one (the next replay of the same epoch overwrites
    # both keys idempotently)
    entry = _epoch_contribution(docs.sparkSession, epoch_path)
    # a REPLAYED epoch keeps its original seq (its postings overwrite
    # in place, so its position relative to existing tombstones must
    # not move); a new epoch sequences after everything committed
    from geosparql_etl_spark.lakes.commit import assign_seq

    entry["seq"] = assign_seq(_epoch_seqs(stats), str(epoch))
    _commit_epoch_entry(path, str(epoch), entry)


def _stats_totals(stats: dict) -> tuple[int, int]:
    n = sum(e["n_docs"] for e in stats["epochs"].values())
    s = sum(e["sum_dl"] for e in stats["epochs"].values())
    return n, s


def _epoch_seqs(stats: dict) -> dict[str, int]:
    """Monotonic sequence number per committed epoch (recorded in the
    ledger entry at commit; entries predating the seq field fall back
    to ledger insertion order, which json preserves). Tombstones are
    SCOPED by seq — a delete kills a doc's rows only in epochs that
    were already committed when the delete was issued, so a
    re-inserted (updated) version in a LATER epoch survives. This is
    the segment-local delete rule every LSM/segment index uses; it is
    what makes update = delete + append correct without a rebuild.
    Replayed epochs keep their original seq, so a replayed update's
    tombstone/epoch pair lands in the same relative order."""
    seqs = {}
    for i, (name, entry) in enumerate(stats["epochs"].items()):
        seqs[str(name)] = int(entry.get("seq", i))
    return seqs


def delete_from_text_index(
    spark,
    path: str,
    ids,
    at_seq: int | None = None,
    issued_seq: int | None = None,
) -> None:
    """DELETE support for the text lake (takedowns / re-crawl
    replacements): dropped doc ids append as TOMBSTONES under
    ``<index>/_tombstones/`` — an O(|deletes|) metadata write, never a
    postings rewrite (a doc's postings are scattered across term
    buckets; rewriting them per delete would be a full-index op).
    Serving anti-joins the tombstone set before df/score (so deleted
    docs neither rank nor inflate document frequency) and adjusts
    n_docs/avgdl from the ``_doclens`` forward sidecar, pruned to the
    tombstoned docs' buckets; ``compact_text_index`` applies deletes
    physically and clears tombstones atomically. Duplicate tombstones
    and ids absent from the index are harmless (dedup + semi-join
    against doclens).

    Tombstones are SEQ-SCOPED: each records the highest committed
    epoch seq at delete time and kills the doc's rows only in epochs
    up to that seq — so ``update_text_index`` can re-insert the doc
    in a later epoch and the new version serves (the segment-local
    delete rule of LSM/segment indexes). ``at_seq`` overrides the
    scope (used by ``update_text_index`` so a REPLAYED update's
    tombstone does not outrank the epoch it re-inserts).

    Each tombstone also records WHEN it was issued (``issued`` = the
    ledger seq current at issue time; an update's tombstone is issued
    AT its epoch though scoped below it) — that is what lets
    ``text_index_topk(as_of_seq=k)`` serve a historical snapshot:
    tombstones issued after k simply don't exist yet at k."""
    import os

    import pyarrow as pa

    from geosparql_etl_spark.util import atomic_parquet_append

    stats = _read_stats(path)
    max_now = max(_epoch_seqs(stats).values(), default=0)
    seq_now = at_seq if at_seq is not None else max_now
    issued = issued_seq if issued_seq is not None else max_now
    from geosparql_etl_spark.lakes.commit import collect_id_list

    id_list = collect_id_list(ids)
    if not id_list:
        # empty delete set (e.g. an upsert batch of only-new docs
        # routed through update): nothing to kill
        return
    # driver-side atomic single-file append (util.atomic_parquet_append):
    # concurrent upsert streams tombstone into ONE _tombstones dir, and
    # a Spark append job's shared _temporary staging is not safe under
    # two writers. The set is bounded by deletes-since-compaction —
    # serving collects it to the driver anyway.
    atomic_parquet_append(
        os.path.join(path, "_tombstones"),
        pa.table(
            {
                "doc_id": pa.array(id_list, pa.int64()),
                "seq": pa.array([seq_now] * len(id_list), pa.int32()),
                "issued": pa.array([issued] * len(id_list), pa.int32()),
            }
        ),
    )


def read_text_tombstones(
    spark, path: str, as_of_seq: int | None = None
) -> DataFrame | None:
    """Pending tombstones as (doc_id, seq) — one row per doc with the
    HIGHEST seq it was deleted at (a later re-delete supersedes an
    earlier one; keeping one row per doc also keeps the stats-
    adjustment join duplicate-free). None when no delete has been
    issued since the last compaction. ``as_of_seq`` restricts to
    tombstones ISSUED at or before that ledger seq — the time-travel
    view in which later deletes/updates have not happened yet.
    Tombstone files predating the seq columns count as
    delete-everything issued at seq 0."""
    from geosparql_etl_spark.lakes.commit import read_tombstone_frame

    t = read_tombstone_frame(spark, path)
    if t is None:
        return None
    # per-ROW coalescing, not per-directory: a mixed dir (legacy files
    # + seq'd files) merges schemas and the legacy rows read as NULL —
    # which would NULL out the anti-join residual and silently
    # resurrect the deleted doc (review finding, round 11). Legacy
    # rows mean delete-everything, issued-at-the-beginning.
    seq = (
        F.coalesce(F.col("seq"), F.lit(2**31 - 1))
        if "seq" in t.columns
        else F.lit(2**31 - 1)
    )
    issued = (
        F.coalesce(
            F.col("issued") if "issued" in t.columns else F.lit(None),
            F.col("seq") if "seq" in t.columns else F.lit(None),
            F.lit(0),
        )
    )
    t = t.select(
        "doc_id",
        seq.cast("int").alias("seq"),
        issued.cast("int").alias("issued"),
    )
    if as_of_seq is not None:
        # the ACTIVATION gate, doing double duty: (a) time travel —
        # tombstones issued after the pin don't exist yet at the pin;
        # (b) crash atomicity — an update's tombstone is issued AT its
        # epoch's seq, so until that epoch's ledger entry commits
        # (max committed seq < issued) the tombstone is dormant and
        # the superseded version keeps serving: a crash between the
        # tombstone write and the epoch commit can never make a doc
        # vanish (review finding, round 11)
        t = t.where(F.col("issued") <= as_of_seq)
    return t.groupBy("doc_id").agg(F.max("seq").alias("seq"))


def update_text_index(
    docs: DataFrame,
    path: str,
    epoch: str,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> None:
    """UPSERT for the text lake (re-crawl replacements / CDC): the
    incoming docs' CURRENT rows are tombstoned (seq-scoped to the
    epochs committed so far) and the new versions land as a fresh
    epoch that sequences AFTER the tombstone — delete + append, no
    index rebuild, per-batch cost. Docs not previously indexed insert
    cleanly (their tombstone is a phantom no-op).

    Replay-safe: the tombstone is scoped to the seq JUST BELOW the
    update's own epoch — on a replay (streaming restart, retried
    batch) the epoch keeps its original seq, so the re-issued
    tombstone still ranks below the re-inserted rows instead of
    killing them (naively re-deleting at the current max seq
    would)."""
    stats = _read_stats(path)
    seqs = _epoch_seqs(stats)
    before = (
        seqs[str(epoch)] - 1
        if str(epoch) in seqs
        else max(seqs.values(), default=0)
    )
    delete_from_text_index(
        docs.sparkSession,
        path,
        docs.select(F.col(id_col).alias("doc_id")),
        at_seq=before,
        # issued AT the update's epoch: a time-travel read pinned
        # before it must still see the superseded version
        issued_seq=before + 1,
    )
    append_to_text_index(
        docs, path, epoch, id_col=id_col, text_col=text_col
    )


def _epoch_seq_col(stats: dict) -> Column:
    """Literal epoch-name -> seq map applied to the partition column
    (ledger-sized, folds into the plan as a constant map)."""
    pairs = []
    for name, seq in _epoch_seqs(stats).items():
        pairs.extend([F.lit(name), F.lit(seq)])
    return F.element_at(
        F.create_map(*pairs), F.col("epoch").cast("string")
    ).alias("__eseq")


def _anti_join_tombstones(rows: DataFrame, tomb: DataFrame) -> DataFrame:
    """Drop index rows killed by a tombstone: same doc AND the row's
    epoch seq at-or-before the delete's seq (rows the doc re-inserted
    LATER survive). Equi key + residual condition — stays a broadcast
    hash anti-join."""
    t = tomb.select(
        F.col("doc_id").alias("__td"), F.col("seq").alias("__ts")
    )
    return rows.join(
        F.broadcast(t),
        (F.col("doc_id") == F.col("__td"))
        & (F.col("__eseq") <= F.col("__ts")),
        "left_anti",
    )


def _tombstone_fingerprint(path: str) -> tuple | None:
    """Content fingerprint of the tombstone directory (file names +
    sizes — append-only writes, so this changes iff a delete lands).
    None when no tombstones exist."""
    import os

    from geosparql_etl_spark.lakes.commit import dir_fingerprint

    return dir_fingerprint(os.path.join(path, "_tombstones"))


def _ensure_doclens(spark, path: str, stats: dict) -> None:
    """One-time migration: a ledger epoch written before the doclens
    sidecar existed (pre-delete-support index) gets its forward index
    BACKFILLED from its own postings — without this, deleting a doc
    from such an epoch would silently miss the stats adjustment
    (n_docs/avgdl stay inflated) and compaction would crash on the
    absent directory (review finding, round 11)."""
    import os

    for name, entry in stats["epochs"].items():
        if entry.get("n_docs", 0) == 0:
            # a committed EMPTY epoch has no postings dir at all —
            # nothing to backfill
            continue
        dl = os.path.join(path, "_doclens", f"epoch={name}")
        if not os.path.exists(dl):
            _write_doclens_epoch(
                spark,
                path,
                str(name),
                os.path.join(path, "postings", f"epoch={name}"),
                stats["n_buckets"],
            )


# Serving-path memo: (index path, tombstone fingerprint, visible-epoch
# set, as_of pin) -> (collected tombstone rows, n_deleted, dl_deleted).
# Tombstones change only when a delete lands, but a query pays the
# read+collect+adjustment as THREE extra driver jobs — ~1.4 s of fixed
# scheduling latency per probe measured at sf0.1 regardless of delete
# count. The realistic serving pattern is thousands of probes between
# deletes, so the state is computed once per (mutation, snapshot) and
# replayed as literals; a cache miss (fresh process, new delete, new
# pin) recomputes from disk, so correctness never depends on the memo.
# Bounded: at most _TOMB_MEMO_CAP entries per index path (a serving
# process pinning many distinct as_of snapshots between deletes would
# otherwise retain every tombstone list forever).
_TOMB_MEMO: dict = {}
_TOMB_MEMO_CAP = 8

# Per-(path, epoch set) positional-payload attestation. Keyed by the
# live epoch set, so an append/compaction re-checks; bounded the same
# way as the tombstone memo.
_POS_MEMO: dict = {}


def _assert_positional(spark, path: str, live_epochs: list) -> None:
    """Fail LOUDLY when any live epoch predates the positional
    payload: doclens got a silent backfill (``_ensure_doclens``), but
    positions cannot be reconstructed from the index — the postings
    no longer know token order. Without this check a legacy epoch
    either breaks the hard ``pos`` select or (when Spark merges a
    pos-bearing footer into the schema) reads NULL positions and
    silently DROPS the epoch's docs from phrase/proximity results
    (round-11 advisor finding). A footer-per-epoch schema sniff,
    memoized per (path, epoch set) so steady-state probes pay
    nothing."""
    import os

    per_path = _POS_MEMO.setdefault(path, {})
    key = tuple(str(e) for e in live_epochs)
    if key in per_path:
        return
    if len(per_path) >= _TOMB_MEMO_CAP:
        per_path.clear()
    legacy = []
    for e in live_epochs:
        ep = os.path.join(path, "postings", f"epoch={e}")
        if not os.path.exists(ep):
            # a zero-doc epoch commits a ledger entry with no
            # postings dir — nothing to be positional about
            continue
        cols = spark.read.parquet(ep).columns
        if "pos" not in cols:
            legacy.append(str(e))
    if legacy:
        raise ValueError(
            "phrase/proximity search needs positional postings, but "
            f"epoch(s) {legacy} of index {path} were written before "
            "the positional payload existed — rebuild the index (or "
            "re-append those epochs' docs) to enable phrase search; "
            "BM25 term scoring (text_index_topk) remains available"
        )
    per_path[key] = True


def _tombstone_state(
    spark, path: str, stats: dict, as_of_seq: int | None
) -> tuple[list, int, int] | None:
    fp = _tombstone_fingerprint(path)
    if fp is None:
        return None
    per_path = _TOMB_MEMO.setdefault(path, {})
    key = (fp, tuple(sorted(stats["epochs"])), as_of_seq)
    if key not in per_path:
        tomb = read_text_tombstones(spark, path, as_of_seq=as_of_seq)
        rows = [
            (int(r["doc_id"]), int(r["seq"])) for r in tomb.collect()
        ]
        if not rows:
            val = ([], 0, 0)
        else:
            n_del, dl_del = _tombstone_adjustment(spark, path, stats, rows)
            val = (rows, n_del, dl_del)
        if len(per_path) >= _TOMB_MEMO_CAP:
            per_path.pop(next(iter(per_path)))
        per_path[key] = val
    return per_path[key]


def _tombstone_adjustment(
    spark, path: str, stats: dict, rows: list
) -> tuple[int, int]:
    """(n_deleted, dl_deleted) of the index rows actually killed by
    the given tombstone rows [(doc_id, seq)] (bounded by deletes-
    since-compaction — same collect discipline as the probed-cell
    sets): the ids prune the ``_doclens`` sidecar to their doc
    buckets, and the seq-scoped join counts each killed (doc, epoch)
    version exactly once — an updated doc's superseded versions all
    leave the stats, its live re-insert stays. Phantom/duplicate
    tombstones contribute zero. Ledger-gated like the postings scan:
    an uncommitted epoch's doclens must not enter the adjustment."""
    import os

    nb = stats["n_buckets"]
    if not rows:
        return 0, 0
    _ensure_doclens(spark, path, stats)
    ids = sorted(r[0] for r in rows)
    dbuckets = sorted({doc_bucket_py(i, nb) for i in ids})
    tdf = local_frame(
        spark, [(int(i), int(s)) for i, s in rows], "__td long, __ts int"
    )
    agg = (
        spark.read.parquet(os.path.join(path, "_doclens"))
        .where(F.col("epoch").cast("string").isin(sorted(stats["epochs"])))
        .where(F.col("dbucket").isin(dbuckets))
        .where(F.col("doc_id").isin(ids))
        .select("doc_id", "dl", _epoch_seq_col(stats))
        .join(
            F.broadcast(tdf),
            (F.col("doc_id") == F.col("__td"))
            & (F.col("__eseq") <= F.col("__ts")),
        )
        .agg(F.count("*").alias("n"), F.sum("dl").alias("s"))
        .collect()[0]
    )
    return int(agg["n"] or 0), int(agg["s"] or 0)


def compact_text_index(spark, path: str) -> None:
    """Apply pending tombstones physically and collapse maintenance
    epochs to a fresh ``epoch=base`` generation — the
    compact_ivf_index two-phase swap applied to the text lake's WHOLE
    root (postings + _doclens + _stats.json move together, so a probe
    never sees postings of one generation with the stats of another).
    The replacement generation is fully written to a sibling temp dir
    while the live index keeps serving; the swap renames live aside
    (``.old``), temp into place, and deletes ``.old`` last, with the
    same crash-recovery preamble as the ANN lake. Stats are
    recomputed from the compacted doclens — the ledger collapses to
    one exact base entry and the tombstone dir is simply not copied,
    so the deletes clear atomically with the rewrite."""
    import os
    import shutil

    from geosparql_etl_spark.lakes import commit as lc

    tmp_path, old_path = lc.swap_paths(path, "compact")
    lc.recover_swap(path, old_path)
    shutil.rmtree(tmp_path, ignore_errors=True)

    stats = _read_stats(path)
    live_epochs = sorted(stats["epochs"])
    _ensure_doclens(spark, path, stats)
    # only ACTIVE tombstones apply: a dormant one (its update epoch
    # never committed) must neither delete the surviving old version
    # nor be carried forward — the orphan epoch is not copied either,
    # so dropping the dormant tombstone restores the pre-update state
    # and a replay re-runs the whole upsert cleanly
    tomb = read_text_tombstones(
        spark, path,
        as_of_seq=max(_epoch_seqs(stats).values(), default=0),
    )
    pscan = spark.read.parquet(os.path.join(path, "postings"))
    # carry positions only when EVERY live epoch has them: a mixed
    # index (legacy pre-positional epochs + positional ones) would
    # otherwise compact NULL positions into the base generation,
    # where the per-epoch footer sniff (_assert_positional) can no
    # longer see the gap and phrase queries would silently drop the
    # legacy docs. Dropping pos keeps the compacted index honestly
    # non-positional — phrase_topk fails loudly with the rebuild hint.
    keep_pos = "pos" in pscan.columns and not any(
        "pos"
        not in spark.read.parquet(
            os.path.join(path, "postings", f"epoch={e}")
        ).columns
        for e in live_epochs
        # zero-doc epochs commit a ledger entry with no postings dir
        if os.path.exists(os.path.join(path, "postings", f"epoch={e}"))
    )
    pcols = ["tok", "doc_id", "tf", "dl", "bucket"] + (
        ["pos"] if keep_pos else []
    )
    post = pscan.where(
        F.col("epoch").cast("string").isin(live_epochs)
    ).select(*pcols, _epoch_seq_col(stats))
    dlens = (
        spark.read.parquet(os.path.join(path, "_doclens"))
        .where(F.col("epoch").cast("string").isin(live_epochs))
        .select("doc_id", "dl", "dbucket", _epoch_seq_col(stats))
    )
    if tomb is not None:
        post = _anti_join_tombstones(post, tomb)
        dlens = _anti_join_tombstones(dlens, tomb)
    post = post.select(*pcols)
    dlens = dlens.select("doc_id", "dl", "dbucket").dropDuplicates(
        ["doc_id"]
    )
    if dlens.limit(1).count() == 0:
        # fully-tombstoned index: a partitionBy write of zero rows
        # emits only _SUCCESS, leaving a footer-less generation no
        # later read can infer a schema from — compaction could then
        # never complete. Write footer-bearing empty files into one
        # explicit bucket dir instead (same directory depth as a real
        # generation, so a later append's partition discovery stays
        # consistent) and seed the zero ledger entry directly.
        post.drop("bucket").coalesce(1).write.mode("overwrite").parquet(
            os.path.join(tmp_path, "postings", "epoch=base", "bucket=0")
        )
        dlens.drop("dbucket").coalesce(1).write.mode(
            "overwrite"
        ).parquet(
            os.path.join(tmp_path, "_doclens", "epoch=base", "dbucket=0")
        )
        base = {"n_docs": 0, "sum_dl": 0, "seq": 0}
    else:
        post.repartition("bucket").write.mode("overwrite").partitionBy(
            "bucket"
        ).parquet(os.path.join(tmp_path, "postings", "epoch=base"))
        dlens.repartition("dbucket").write.mode("overwrite").partitionBy(
            "dbucket"
        ).parquet(os.path.join(tmp_path, "_doclens", "epoch=base"))
        base = _epoch_contribution(
            spark, os.path.join(tmp_path, "_doclens", "epoch=base")
        )
        base["seq"] = 0
    _write_stats(
        tmp_path,
        {"n_buckets": stats["n_buckets"], "epochs": {"base": base}},
    )
    # commit point: the replacement generation is fully on disk
    lc.commit_swap(path, tmp_path, old_path)


def stream_id(checkpoint_dir: str) -> str:
    """Stable 8-hex id of one logical stream, derived from its
    checkpoint location. Epoch tags are the replay identity — two
    streams maintaining the SAME index from different checkpoints
    would otherwise both mint epoch '0' and silently overwrite each
    other's batches (review finding, round 11); the checkpoint path
    is the one name that is already unique per stream."""
    from geosparql_etl_spark.lakes import commit as lc

    return lc.stream_id(checkpoint_dir)


def _run_doc_batch_stream(
    spark,
    landing_dir: str,
    checkpoint_dir: str,
    per_batch,
    id_col: str,
    text_col: str,
):
    """Shared scaffold for the text-lake streaming runners: schema
    sniff with fallback, file-source discovery, checkpointed
    availableNow foreachBatch."""
    from geosparql_etl_spark.lakes.commit import (
        run_availablenow_file_stream,
    )

    return run_availablenow_file_stream(
        spark, landing_dir, checkpoint_dir, per_batch,
        f"{id_col} long, {text_col} string",
    )


def run_text_index_maintenance(
    spark,
    landing_dir: str,
    index_path: str,
    checkpoint_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
):
    """Streaming maintenance of the text index: document parquet drops
    in ``landing_dir`` flow in exactly once (file-source checkpoint)
    and each micro-batch lands as its own idempotent epoch (tagged by
    stream id + batch id, so independent streams never collide).
    Returns the started availableNow StreamingQuery — the lexical
    twin of streaming/ann.py:run_index_maintenance."""
    sid = stream_id(checkpoint_dir)

    def write_batch(batch_df: DataFrame, epoch_id: int) -> None:
        append_to_text_index(
            batch_df, index_path, epoch=f"{sid}-{epoch_id}",
            id_col=id_col, text_col=text_col,
        )

    return _run_doc_batch_stream(
        spark, landing_dir, checkpoint_dir, write_batch, id_col, text_col
    )


def run_text_index_upserts(
    spark,
    landing_dir: str,
    index_path: str,
    checkpoint_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
):
    """CDC into the text lake: document drops in ``landing_dir`` are
    UPSERTS (re-crawls of known docs replace their indexed version;
    unseen docs insert) — each micro-batch runs update_text_index
    under its stream-scoped epoch tag, so the batch's seq-scoped
    tombstone + fresh epoch + ledger entry are all keyed by the epoch
    and an at-least-once replay converges to the same index state.
    Returns the started availableNow StreamingQuery — the upsert twin
    of run_text_index_maintenance."""
    sid = stream_id(checkpoint_dir)

    def write_batch(batch_df: DataFrame, epoch_id: int) -> None:
        update_text_index(
            batch_df, index_path, epoch=f"u{sid}-{epoch_id}",
            id_col=id_col, text_col=text_col,
        )

    return _run_doc_batch_stream(
        spark, landing_dir, checkpoint_dir, write_batch, id_col, text_col
    )


def text_index_topk(
    spark,
    path: str,
    terms: list[str],
    k: int = 20,
    k1: float = 1.2,
    b: float = 0.75,
    as_of_seq: int | None = None,
) -> DataFrame:
    """BM25 top-k against the persisted index. The scan reads ONLY the
    query terms' bucket directories (PartitionFilters on ``bucket``,
    across all epochs — plan-pinned) and only the posting columns; df
    comes from the pruned postings themselves (exact: every posting of
    a term lives in its one bucket), dl rides the row, and the corpus
    stats are two numbers from the sidecar. Per-query cost is
    |postings of the query terms|, independent of corpus size — the
    inverted-file property that makes lexical retrieval work at
    100 TB. Scoring matches ``bm25_scores`` bit-for-bit: per-term
    contributions round to 9 decimals and sum as DECIMAL(18,9).

    ``as_of_seq`` pins the read to a historical snapshot: only epochs
    committed at seq <= as_of_seq and tombstones ISSUED by then
    participate — time travel falls out of the write-once epoch
    layout + the ledger + issue-stamped tombstones, with zero extra
    storage (the exact mechanism every snapshot-isolated lakehouse
    table format uses)."""
    import os

    stats = _read_stats(path)
    # the effective pin: an explicit as_of, else the max COMMITTED
    # seq — always passed to the tombstone reader so a dormant update
    # tombstone (its epoch's ledger entry not yet committed) stays
    # invisible to latest reads too
    pin = (
        as_of_seq
        if as_of_seq is not None
        else max(_epoch_seqs(stats).values(), default=0)
    )
    if as_of_seq is not None:
        seqs = _epoch_seqs(stats)
        stats = {
            "n_buckets": stats["n_buckets"],
            "epochs": {
                n: e
                for n, e in stats["epochs"].items()
                if seqs[str(n)] <= as_of_seq
            },
        }
    nb = stats["n_buckets"]
    total_docs, total_dl = _stats_totals(stats)
    terms = sorted({t.lower() for t in terms})
    buckets = sorted({term_bucket_py(t, nb) for t in terms})
    post = (
        spark.read.parquet(os.path.join(path, "postings"))
        # only LEDGER-LISTED epochs are visible: an epoch whose
        # postings landed but whose stats entry did not commit (crash
        # window) must not leak into df/tf while being absent from
        # n_docs/avgdl; an as_of pin restricts the listing further
        .where(F.col("epoch").cast("string").isin(sorted(stats["epochs"])))
        .where(F.col("bucket").isin(buckets))
        .where(F.col("tok").isin(terms))
        .select("tok", "doc_id", "tf", "dl", "epoch")
    )
    state = _tombstone_state(spark, path, stats, pin)
    if state is not None and state[0]:
        # logical deletes: drop tombstoned rows BEFORE df so a deleted
        # doc neither ranks nor inflates document frequency, and take
        # the killed versions' (count, length) contribution out of the
        # corpus stats — scoring is then bit-identical to an index
        # never containing them. Seq-scoped: an updated doc's live
        # re-insert (later epoch) survives its own tombstone. The
        # whole state is memoized on the tombstone-dir fingerprint, so
        # repeated probes pay ZERO extra jobs between deletes.
        rows, n_del, dl_del = state
        tomb = local_frame(spark, rows, "doc_id long, seq int")
        post = _anti_join_tombstones(
            post.select("tok", "doc_id", "tf", "dl", _epoch_seq_col(stats))
        , tomb)
        total_docs -= n_del
        total_dl -= dl_del
    post = post.select("tok", "doc_id", "tf", "dl")
    return bm25_rank_postings(post, total_docs, total_dl, k, k1, b)


def bm25_rank_postings(
    post: DataFrame,
    total_docs: int,
    total_dl: int,
    k: int,
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """The shared BM25 scoring tail over a pruned postings frame
    (tok, doc_id, tf, dl): df from the postings themselves, per-term
    contributions rounded to 9 decimals summed as DECIMAL(18,9), dense
    top-k. Factored (round 14) so the manifest-committed text lake
    scores BIT-IDENTICALLY to this one — both substrates call this."""
    dft = post.groupBy("tok").agg(F.count("*").alias("df"))
    n_docs = float(total_docs)
    avgdl = total_dl / total_docs if total_docs else 1.0
    idf = F.log(1 + (F.lit(n_docs) - F.col("df") + 0.5) / (F.col("df") + 0.5))
    tf_part = (F.col("tf") * (k1 + 1)) / (
        F.col("tf") + k1 * (1 - b + b * F.col("dl") / F.lit(avgdl))
    )
    scored = (
        post.join(F.broadcast(dft), "tok")
        .select(
            "doc_id",
            F.round(idf * tf_part, 9).cast("decimal(18,9)").alias("c"),
        )
        .groupBy("doc_id")
        .agg(F.sum("c").alias("score"))
    )
    cut = scored.orderBy(F.col("score").desc(), F.col("doc_id")).limit(k)
    w = Window.orderBy(F.col("score").desc(), F.col("doc_id"))
    return cut.select("doc_id", F.row_number().over(w).alias("rank"), "score")


def _positional_frame(
    spark, path: str, terms: list[str], as_of_seq: int | None
) -> DataFrame:
    """One row per doc containing ALL ``terms``, columns ``__pos0..N``
    holding each term's position array. Bucket-pruned scan, ledger
    gate, tombstone anti-join and as-of pin exactly as
    ``text_index_topk`` (minus the stats adjustment — position
    queries need no corpus statistics); a doc missing any term exits
    at the doc_id inner join before any position work."""
    import os

    stats = _read_stats(path)
    pin = (
        as_of_seq
        if as_of_seq is not None
        else max(_epoch_seqs(stats).values(), default=0)
    )
    if as_of_seq is not None:
        seqs = _epoch_seqs(stats)
        stats = {
            "n_buckets": stats["n_buckets"],
            "epochs": {
                n: e
                for n, e in stats["epochs"].items()
                if seqs[str(n)] <= as_of_seq
            },
        }
    nb = stats["n_buckets"]
    buckets = sorted({term_bucket_py(t, nb) for t in terms})
    _assert_positional(spark, path, sorted(stats["epochs"]))
    post = (
        spark.read.parquet(os.path.join(path, "postings"))
        .where(F.col("epoch").cast("string").isin(sorted(stats["epochs"])))
        .where(F.col("bucket").isin(buckets))
        .where(F.col("tok").isin(sorted(set(terms))))
        .select("tok", "doc_id", "pos", "epoch")
    )
    state = _tombstone_state(spark, path, stats, pin)
    if state is not None and state[0]:
        tomb = local_frame(spark, state[0], "doc_id long, seq int")
        post = _anti_join_tombstones(
            post.select("tok", "doc_id", "pos", _epoch_seq_col(stats)),
            tomb,
        )
    post = post.select("tok", "doc_id", "pos")
    joined = None
    for i, t in enumerate(terms):
        fi = post.where(F.col("tok") == t).select(
            "doc_id", F.col("pos").alias(f"__pos{i}")
        )
        joined = fi if joined is None else joined.join(fi, "doc_id")
    assert joined is not None
    return joined


def _ranked_hits(hits: DataFrame, k: int, n_col: str) -> DataFrame:
    cut = hits.orderBy(F.col(n_col).desc(), F.col("doc_id")).limit(k)
    w = Window.orderBy(F.col(n_col).desc(), F.col("doc_id"))
    return cut.select(
        "doc_id", F.row_number().over(w).alias("rank"), n_col
    )


def phrase_topk(
    spark,
    path: str,
    phrase: list[str],
    k: int = 20,
    as_of_seq: int | None = None,
) -> DataFrame:
    """PHRASE search against the positional postings: docs containing
    the exact token sequence ``phrase``, ranked by occurrence count
    (ties to the lowest doc_id) -> (doc_id, rank, n_phrase).

    The inverted-file cost model is unchanged: the scan reads ONLY
    the phrase terms' bucket partitions, each term contributes its
    position list as ONE array column, and adjacency is a native
    array fold — ``filter(pos_0, x -> array_contains(pos_1, x+1) AND
    ...)`` — evaluated per candidate doc after the per-term frames
    inner-join on doc_id. No corpus scan, no position explode, no
    Python."""
    terms = [t.lower() for t in phrase]
    joined = _positional_frame(spark, path, terms, as_of_seq)

    # adjacency fold over the FIRST term's occurrence list: an
    # occurrence at x is a phrase hit iff term i sits at x+i for all i
    def _adj(x):
        c = None
        for i in range(1, len(terms)):
            step = F.array_contains(F.col(f"__pos{i}"), x + i)
            c = step if c is None else c & step
        return c if c is not None else F.lit(True)

    n_phrase = F.size(F.filter(F.col("__pos0"), _adj))
    hits = joined.select("doc_id", n_phrase.alias("n_phrase")).where(
        F.col("n_phrase") > 0
    )
    return _ranked_hits(hits, k, "n_phrase")


def proximity_topk(
    spark,
    path: str,
    terms: list[str],
    window: int = 5,
    k: int = 20,
    as_of_seq: int | None = None,
) -> DataFrame:
    """PROXIMITY (windowed co-occurrence) search: docs where some
    occurrence of ``terms[0]`` has EVERY other term within ±``window``
    positions, ranked by qualifying-anchor count -> (doc_id, rank,
    n_prox). The unordered relaxation of ``phrase_topk`` — "these
    words near each other" — expressed as a NESTED array fold:
    ``filter(pos_0, x -> forall i: exists(pos_i, y -> |y-x| <= W))``,
    all native HOFs over the same bucket-pruned positional frame."""
    terms = [t.lower() for t in terms]
    joined = _positional_frame(spark, path, terms, as_of_seq)

    def _near(x):
        # the inner lambda takes exactly ONE parameter (PySpark reads
        # the signature to pick the HOF arity); x and the array column
        # are captured by closure, materialized per loop iteration
        c = None
        for i in range(1, len(terms)):
            arr_i = F.col(f"__pos{i}")
            step = F.exists(
                arr_i, lambda y: (y >= x - window) & (y <= x + window)
            )
            c = step if c is None else c & step
        return c if c is not None else F.lit(True)

    n_prox = F.size(F.filter(F.col("__pos0"), _near))
    hits = joined.select("doc_id", n_prox.alias("n_prox")).where(
        F.col("n_prox") > 0
    )
    return _ranked_hits(hits, k, "n_prox")


def fsck_text_index(spark, path: str) -> list[dict]:
    """Invariant check (fsck) for a text-lake index — the ops tool a
    production lake needs after a crash, a partial copy, or a suspect
    replication: returns a list of findings ({check, severity,
    detail}), empty when healthy. Read-only; driver-side metadata
    work plus one footer sniff per epoch (never a corpus scan).

    Checks: ledger entries vs postings/doclens dirs both ways (an
    orphan DATA dir is benign — an uncommitted epoch, invisible to
    probes; a ledger entry with n_docs > 0 but NO data dir is serving
    loss), duplicate seqs (benign, concurrent writers — reported
    info), tombstone readability/schema, positional coverage
    (pre-positional epochs break phrase search), and stats totals
    matching the per-epoch doclens contributions."""
    import os

    findings: list[dict] = []

    def add(check, severity, detail):
        findings.append(
            {"check": check, "severity": severity, "detail": detail}
        )

    try:
        stats = _read_stats(path)
    except Exception as exc:
        add("stats", "error", f"unreadable ledger: {exc}")
        return findings
    seqs = _epoch_seqs(stats)
    post_dirs = {
        d.split("=", 1)[1]
        for d in os.listdir(os.path.join(path, "postings"))
        if d.startswith("epoch=")
    } if os.path.exists(os.path.join(path, "postings")) else set()
    for name, entry in stats["epochs"].items():
        if entry.get("n_docs", 0) > 0 and str(name) not in post_dirs:
            add(
                "ledger_dangling", "error",
                f"epoch {name} committed with n_docs="
                f"{entry['n_docs']} but has no postings dir — its "
                "docs cannot serve",
            )
    for name in post_dirs - set(str(e) for e in stats["epochs"]):
        add(
            "orphan_epoch", "info",
            f"postings/epoch={name} has no ledger entry — an "
            "uncommitted (crashed or in-flight) epoch, invisible to "
            "probes; a replay will overwrite it",
        )
    from geosparql_etl_spark.lakes.commit import duplicate_seq_findings

    findings.extend(duplicate_seq_findings(seqs))
    try:
        tomb = read_text_tombstones(spark, path)
        if tomb is not None:
            tomb.limit(1).collect()
    except Exception as exc:
        add("tombstones", "error", f"unreadable tombstones: {exc}")
    legacy = []
    for name in stats["epochs"]:
        ep = os.path.join(path, "postings", f"epoch={name}")
        if os.path.exists(ep):
            if "pos" not in spark.read.parquet(ep).columns:
                legacy.append(str(name))
    if legacy:
        add(
            "pre_positional", "warn",
            f"epoch(s) {legacy} lack the positional payload — BM25 "
            "serves, phrase/proximity refuse until rebuild",
        )
    dl_root = os.path.join(path, "_doclens")
    for name, entry in stats["epochs"].items():
        dp = os.path.join(dl_root, f"epoch={name}")
        if entry.get("n_docs", 0) > 0 and os.path.exists(dp):
            got = _epoch_contribution(spark, dp)
            want = {
                "n_docs": entry["n_docs"], "sum_dl": entry["sum_dl"]
            }
            if got != want:
                add(
                    "stats_mismatch", "error",
                    f"epoch {name}: ledger says {want}, doclens say "
                    f"{got} — scores computed from wrong corpus stats",
                )
    return findings
