"""Manifest-commit protocol tests (round 14): the object-store-safe
lake substrate (lakes/manifest.py) — commit atomicity via single
manifest PUTs, torn-write invisibility, replay, delete scoping, time
travel, compaction generations, vacuum, fsck."""

import json
import os

import pytest
from pyspark.sql import functions as F

from geosparql_etl_spark.lakes import manifest as M

DIM = 8


def _vec(i):
    # deterministic, non-degenerate unit-ish vectors
    return [float((i * (j + 3) * 37) % 19 - 9) / 9.0 for j in range(DIM)]


def _corpus(spark, ids):
    return spark.createDataFrame(
        [(i, _vec(i)) for i in ids], "vec_id long, embedding array<double>"
    )


def _probe_ids(spark, path, probe, as_of=None, k=3):
    rows = M.manifest_ivf_topk(
        spark, path, probe, k=k, dim=DIM, n_cells=4, n_probe=4,
        as_of_seq=as_of,
    ).collect()
    return {
        (r["query_id"], r["rank"]): r["neighbor_id"] for r in rows
    }


def _brute(spark, corpus, probe, k=3):
    import math

    cs = {r["vec_id"]: r["embedding"] for r in corpus.collect()}
    ps = {r["vec_id"]: r["embedding"] for r in probe.collect()}

    def cos(a, b):
        d = sum(x * y for x, y in zip(a, b))
        na = math.sqrt(sum(x * x for x in a))
        nb = math.sqrt(sum(x * x for x in b))
        return d / (na * nb) if na * nb > 0 else 0.0

    out = {}
    for q, qv in ps.items():
        ranked = sorted(
            ((cos(qv, v), -i) for i, v in cs.items() if i != q),
            reverse=True,
        )
        for rank, (_, ni) in enumerate(ranked[:k], 1):
            out[(q, rank)] = -ni
    return out


@pytest.fixture()
def lake(tmp_path, spark):
    path = str(tmp_path / "mlake")
    M.manifest_write_ivf_index(
        _corpus(spark, range(40)), path, dim=DIM, n_cells=4, epoch="base"
    )
    return path


def test_build_and_probe_matches_bruteforce(spark, lake):
    # n_probe = n_cells makes the IVF probe exhaustive -> exact
    probe = _corpus(spark, [100])
    got = _probe_ids(spark, lake, probe)
    want = _brute(spark, _corpus(spark, range(40)), probe)
    assert got == want


def test_torn_attempt_is_invisible_and_vacuumable(spark, lake):
    probe = _corpus(spark, [100])
    before = _probe_ids(spark, lake, probe)
    # a writer that died mid-attempt: parquet bytes, no manifest
    torn = os.path.join(lake, "epoch=a1", "attempt=deadbeef",
                        "ivf_cell=0")
    os.makedirs(torn)
    _corpus(spark, range(1000, 1010)).write.parquet(
        os.path.join(torn, "junk"), mode="overwrite"
    )
    assert _probe_ids(spark, lake, probe) == before
    finds = M.manifest_fsck(lake)
    assert any(f["check"] == "orphan_file" for f in finds)
    assert not any(f["severity"] == "error" for f in finds)
    removed = M.manifest_vacuum(lake)
    assert removed
    assert _probe_ids(spark, lake, probe) == before
    assert not any(
        f["check"] == "orphan_file" for f in M.manifest_fsck(lake)
    )


def test_torn_manifest_is_skipped(spark, lake):
    probe = _corpus(spark, [100])
    before = _probe_ids(spark, lake, probe)
    with open(os.path.join(lake, "_manifests", "m-99999999-x-0000.json"),
              "w") as fh:
        fh.write('{"kind": "append", "files": [{"pa')  # torn PUT
    assert _probe_ids(spark, lake, probe) == before


def test_append_epoch_and_delete_scoping(spark, lake):
    probe = _corpus(spark, [100])
    # delete ids 0..9 (scoped to base, the only committed epoch)
    M.manifest_delete_from_ivf_index(
        spark, lake, _corpus(spark, range(10)).select("vec_id")
    )
    got = _probe_ids(spark, lake, probe, k=5)
    want = _brute(spark, _corpus(spark, range(10, 40)), probe, k=5)
    assert got == want
    # an epoch landing AFTER the delete re-introduces id 5
    M.manifest_write_ivf_index(
        _corpus(spark, [5]), lake, dim=DIM, n_cells=4, epoch="a1"
    )
    got = _probe_ids(spark, lake, probe, k=5)
    want = _brute(
        spark,
        _corpus(spark, [5, *range(10, 40)]),
        probe,
        k=5,
    )
    assert got == want


def test_time_travel_pins(spark, lake):
    probe = _corpus(spark, [100])
    M.manifest_write_ivf_index(
        _corpus(spark, range(40, 60)), lake, dim=DIM, n_cells=4,
        epoch="a1",
    )
    M.manifest_delete_from_ivf_index(
        spark, lake, _corpus(spark, range(20)).select("vec_id")
    )
    # seq 0 = base only
    assert _probe_ids(spark, lake, probe, as_of=0) == _brute(
        spark, _corpus(spark, range(40)), probe
    )
    # seq 1 = base + a1, pre-delete
    assert _probe_ids(spark, lake, probe, as_of=1) == _brute(
        spark, _corpus(spark, range(60)), probe
    )
    # latest = post-delete
    assert _probe_ids(spark, lake, probe) == _brute(
        spark, _corpus(spark, range(20, 60)), probe
    )


def test_replayed_epoch_does_not_double_rows(spark, lake):
    probe = _corpus(spark, [100])
    M.manifest_write_ivf_index(
        _corpus(spark, range(40, 50)), lake, dim=DIM, n_cells=4,
        epoch="a1",
    )
    seqs1 = M.epoch_seqs(lake)
    # replay the same epoch (stream restart): fresh attempt, same seq
    M.manifest_write_ivf_index(
        _corpus(spark, range(40, 50)), lake, dim=DIM, n_cells=4,
        epoch="a1",
    )
    assert M.epoch_seqs(lake) == seqs1
    got = _probe_ids(spark, lake, probe, k=5)
    want = _brute(spark, _corpus(spark, range(50)), probe, k=5)
    assert got == want  # rows not doubled, latest attempt serves


def test_compaction_generation_and_vacuum(spark, lake):
    probe = _corpus(spark, [100])
    M.manifest_write_ivf_index(
        _corpus(spark, range(40, 60)), lake, dim=DIM, n_cells=4,
        epoch="a1",
    )
    M.manifest_delete_from_ivf_index(
        spark, lake, _corpus(spark, range(30)).select("vec_id")
    )
    latest = _probe_ids(spark, lake, probe, k=5)
    M.manifest_compact_ivf_index(spark, lake)
    assert _probe_ids(spark, lake, probe, k=5) == latest
    # pre-compaction pins are gone in the manifest lake (documented)
    with pytest.raises(ValueError, match="predates the current"):
        _probe_ids(spark, lake, probe, as_of=0)
    # vacuum reclaims the old generation; probe unchanged, fsck clean
    removed = M.manifest_vacuum(lake)
    assert removed
    assert _probe_ids(spark, lake, probe, k=5) == latest
    finds = M.manifest_fsck(lake)
    assert not any(f["severity"] == "error" for f in finds)


def test_concurrent_seq_race_loses_no_commit(spark, lake):
    # two writers race: both allocate seq 1 for different epochs —
    # distinct manifest keys, both commits visible, fsck reports the
    # shared seq as the benign duplicate_seq finding
    probe = _corpus(spark, [100])
    M.manifest_write_ivf_index(
        _corpus(spark, range(40, 50)), lake, dim=DIM, n_cells=4,
        epoch="w1",
    )
    # simulate the race: rewrite w1's manifest twin under epoch w2
    # with the same seq via the public API surface
    M.manifest_write_ivf_index(
        _corpus(spark, range(50, 60)), lake, dim=DIM, n_cells=4,
        epoch="w2",
    )
    md = os.path.join(lake, "_manifests")
    w2 = [f for f in os.listdir(md) if "-w2-" in f][0]
    with open(os.path.join(md, w2)) as fh:
        m = json.load(fh)
    m["seq"] = 1
    os.remove(os.path.join(md, w2))
    with open(os.path.join(md, "m-00000001-w2-0000.json"), "w") as fh:
        json.dump(m, fh)
    got = _probe_ids(spark, lake, probe, k=5)
    want = _brute(spark, _corpus(spark, range(60)), probe, k=5)
    assert got == want
    assert any(
        f["check"] == "duplicate_seq" for f in M.manifest_fsck(lake)
    )


def test_manifest_probe_matches_rename_lake(spark, tmp_path):
    # the two substrates must answer identically from the same rows
    from geosparql_etl_spark.operators.similarity import (
        ivf_index_topk,
        write_ivf_index,
    )

    corpus = _corpus(spark, range(40))
    probe = _corpus(spark, [100, 101])
    mp = str(tmp_path / "m")
    rp = str(tmp_path / "r")
    M.manifest_write_ivf_index(corpus, mp, dim=DIM, n_cells=4)
    write_ivf_index(corpus, rp, dim=DIM, n_cells=4, epoch="base")
    a = M.manifest_ivf_topk(
        spark, mp, probe, k=5, dim=DIM, n_cells=4, n_probe=2
    )
    b = ivf_index_topk(
        spark, rp, probe, k=5, dim=DIM, n_cells=4, n_probe=2
    )
    ra = sorted(map(tuple, a.select(
        "query_id", "rank", "neighbor_id",
        F.round("cosine_sim", 9)).collect()))
    rb = sorted(map(tuple, b.select(
        "query_id", "rank", "neighbor_id",
        F.round("cosine_sim", 9)).collect()))
    assert ra == rb


# --- BM25 text lake on the manifest substrate ------------------------------


_DOCS = [
    (1, "spark shuffles data across the cluster"),
    (2, "the inverted index prunes the scan"),
    (3, "spark prunes partitions with filters"),
    (4, "bm25 ranks documents by term rarity"),
    (5, "the index lake commits with manifests"),
    (6, "manifests replace rename atomicity"),
    (7, "spark spark spark repetition document"),
    (8, "a torn write leaves invisible garbage"),
]


def _docs_df(spark, rows=None):
    return spark.createDataFrame(
        rows or _DOCS, "doc_id long, text string"
    )


def _rank_rows(df):
    return [
        (r["doc_id"], r["rank"], str(r["score"])) for r in df.collect()
    ]


def test_manifest_text_matches_rename_lake(spark, tmp_path):
    from geosparql_etl_spark.operators.retrieval import (
        text_index_topk,
        write_text_index,
    )

    mp, rp = str(tmp_path / "mt"), str(tmp_path / "rt")
    M.manifest_write_text_index(_docs_df(spark), mp)
    write_text_index(_docs_df(spark), rp)
    terms = ["spark", "index", "manifests"]
    a = _rank_rows(M.manifest_text_topk(spark, mp, terms, k=5))
    b = _rank_rows(text_index_topk(spark, rp, terms, k=5))
    assert a == b  # bit-identical scores via the shared scoring tail


def test_manifest_text_delete_append_time_travel(spark, tmp_path):
    from geosparql_etl_spark.operators.retrieval import (
        text_index_topk,
        write_text_index,
    )

    mp = str(tmp_path / "mt")
    M.manifest_write_text_index(_docs_df(spark), mp)           # seq 0
    M.manifest_delete_from_text_index(spark, mp, [1, 7])       # seq 1
    M.manifest_write_text_index(                               # seq 2
        _docs_df(spark, [(7, "spark returns in a later epoch")]),
        mp, epoch="a1",
    )
    terms = ["spark"]
    # latest: doc 1 gone, doc 7 only its re-inserted version
    latest = M.manifest_text_topk(spark, mp, terms, k=8)
    ids = {r["doc_id"] for r in latest.collect()}
    assert 1 not in ids and 7 in ids
    # the re-inserted doc must score as a 6-word doc, not the original
    rp = str(tmp_path / "ref")
    write_text_index(
        _docs_df(
            spark,
            [d for d in _DOCS if d[0] not in (1, 7)]
            + [(7, "spark returns in a later epoch")],
        ),
        rp,
    )
    assert _rank_rows(latest) == _rank_rows(
        text_index_topk(spark, rp, terms, k=8)
    )
    # pins: seq 0 pre-delete, seq 1 post-delete pre-reinsert
    rp0 = str(tmp_path / "ref0")
    write_text_index(_docs_df(spark), rp0)
    assert _rank_rows(
        M.manifest_text_topk(spark, mp, terms, k=8, as_of_seq=0)
    ) == _rank_rows(text_index_topk(spark, rp0, terms, k=8))
    rp1 = str(tmp_path / "ref1")
    write_text_index(
        _docs_df(spark, [d for d in _DOCS if d[0] not in (1, 7)]), rp1
    )
    assert _rank_rows(
        M.manifest_text_topk(spark, mp, terms, k=8, as_of_seq=1)
    ) == _rank_rows(text_index_topk(spark, rp1, terms, k=8))


def test_manifest_text_torn_attempt_invisible(spark, tmp_path):
    mp = str(tmp_path / "mt")
    M.manifest_write_text_index(_docs_df(spark), mp)
    before = _rank_rows(M.manifest_text_topk(spark, mp, ["spark"], k=8))
    torn = os.path.join(mp, "postings", "epoch=zz", "attempt=dead")
    _docs_df(spark, [(99, "spark spark spark spark")]).write.parquet(
        torn, mode="overwrite"
    )
    assert _rank_rows(
        M.manifest_text_topk(spark, mp, ["spark"], k=8)
    ) == before
    assert any(
        f["check"] == "orphan_file" for f in M.manifest_fsck(mp)
    )
    M.manifest_vacuum(mp)
    assert _rank_rows(
        M.manifest_text_topk(spark, mp, ["spark"], k=8)
    ) == before


def test_manifest_text_compaction(spark, tmp_path):
    mp = str(tmp_path / "mt")
    M.manifest_write_text_index(_docs_df(spark), mp)
    M.manifest_delete_from_text_index(spark, mp, [1, 7])
    M.manifest_write_text_index(
        _docs_df(spark, [(9, "spark after the delete")]), mp, epoch="a1"
    )
    terms = ["spark", "index"]
    latest = _rank_rows(M.manifest_text_topk(spark, mp, terms, k=8))
    M.manifest_compact_text_index(spark, mp)
    assert _rank_rows(M.manifest_text_topk(spark, mp, terms, k=8)) == latest
    with pytest.raises(ValueError, match="predates the current"):
        M.manifest_text_topk(spark, mp, terms, k=8, as_of_seq=0)
    M.manifest_vacuum(mp)
    assert _rank_rows(M.manifest_text_topk(spark, mp, terms, k=8)) == latest
    assert not any(
        f["severity"] == "error" for f in M.manifest_fsck(mp)
    )
    # phrase positions survive compaction (pos column carried through)
    vis = M.visible_manifests(mp)
    assert [m["kind"] for m in vis] == ["reset"]


def test_manifest_streaming_maintenance(spark, tmp_path):
    from geosparql_etl_spark.operators.retrieval import (
        text_index_topk,
        write_text_index,
    )

    landing = str(tmp_path / "landing")
    mp = str(tmp_path / "mt")
    ckpt = str(tmp_path / "ckpt")
    M.manifest_write_text_index(
        _docs_df(spark, _DOCS[:4]), mp, epoch="base"
    )
    _docs_df(spark, _DOCS[4:6]).write.mode("append").parquet(landing)
    q = M.run_manifest_text_maintenance(spark, landing, mp, ckpt)
    q.awaitTermination(120)
    _docs_df(spark, _DOCS[6:]).write.mode("append").parquet(landing)
    q = M.run_manifest_text_maintenance(spark, landing, mp, ckpt)
    q.awaitTermination(120)
    rp = str(tmp_path / "ref")
    write_text_index(_docs_df(spark), rp)
    terms = ["spark", "index", "manifests"]
    assert _rank_rows(
        M.manifest_text_topk(spark, mp, terms, k=8)
    ) == _rank_rows(text_index_topk(spark, rp, terms, k=8))


def test_manifest_ann_streaming_maintenance(spark, tmp_path):
    landing = str(tmp_path / "landing")
    mp = str(tmp_path / "ann")
    ckpt = str(tmp_path / "ckpt")
    M.manifest_write_ivf_index(
        _corpus(spark, range(20)), mp, dim=DIM, n_cells=4, epoch="base"
    )
    _corpus(spark, range(20, 30)).write.mode("append").parquet(landing)
    q = M.run_manifest_ann_maintenance(
        spark, landing, mp, ckpt, dim=DIM, n_cells=4
    )
    q.awaitTermination(120)
    probe = _corpus(spark, [100])
    assert _probe_ids(spark, mp, probe, k=5) == _brute(
        spark, _corpus(spark, range(30)), probe, k=5
    )
