"""Direct operator tests: enrichment join shape, multimodal plumbing."""

from __future__ import annotations

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from geosparql_etl_spark.operators.enrich import (
    enrich_with_lookup,
    enrich_with_table,
)
from geosparql_etl_spark.operators.multimodal import (
    extract_features,
    resize_images,
    sample_frames,
)


def _media(spark, rows):
    from geosparql_etl_spark.operators.multimodal import MEDIA_SCHEMA

    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def test_enrich_with_lookup_fetches_once_per_key_and_flags_missing(spark):
    facts = spark.createDataFrame(
        [Row(slide_id="s1"), Row(slide_id="s1"), Row(slide_id="s2"),
         Row(slide_id="s3"), Row(slide_id=None)]
    )

    def fetch(k):
        if k == "s3":
            raise RuntimeError("404")  # negative cache path
        return f"hash-of-{k}"

    out = enrich_with_lookup(facts, "slide_id", fetch).collect()
    by_key = {}
    for r in out:
        by_key.setdefault(r["slide_id"], []).append((r["hash"], r["hash_missing"]))
    assert by_key["s1"] == [("hash-of-s1", False)] * 2
    assert by_key["s2"] == [("hash-of-s2", False)]
    assert by_key["s3"] == [(None, True)]
    # null keys never fetch and are not flagged missing
    assert by_key[None] == [(None, False)]


def test_enrich_with_table_missing_flag(spark):
    facts = spark.createDataFrame([Row(k="a"), Row(k="b")])
    lookup = spark.createDataFrame([Row(k="a", hash="ha")])
    out = {r["k"]: (r["hash"], r["hash_missing"])
           for r in enrich_with_table(facts, lookup, "k").collect()}
    assert out == {"a": ("ha", False), "b": (None, True)}


def test_extract_features_and_error_channel(spark):
    import numpy as np

    from geosparql_etl_spark.functions.codecs import (
        encode_bmp,
        encode_wav,
        image_features,
    )

    px = np.arange(4 * 8 * 3, dtype=np.uint8).reshape(4, 8, 3)
    wav = encode_wav(np.array([0, 1000, -1000, 0], dtype=np.int16), 8000)
    rows = [
        ("m1", "image", encode_bmp(px), (8, 4, None, "image/bmp")),
        ("m2", "image", None, (64, 64, None, "image/fake")),
        ("m3", "image", b"payload-1", (64, 64, None, "image/fake")),
        ("m4", "audio", wav, (None, None, None, "audio/wav")),
    ]
    out = {r["media_id"]: r for r in extract_features(_media(spark, rows)).collect()}
    # m1: REAL decode — distributed features equal the local golden ones
    assert out["m1"]["decode_error"] is None
    assert out["m1"]["features"] == pytest.approx(image_features(px).tolist())
    # m2/m3: error channel (null payload; non-BMP bytes)
    assert out["m2"]["features"] is None and "decode" in out["m2"]["decode_error"]
    assert out["m3"]["features"] is None and "BMP" in out["m3"]["decode_error"]
    # m4: real WAV decode (stdlib wave): rate + sample count land in features
    assert out["m4"]["decode_error"] is None
    assert out["m4"]["features"][1] == 8000.0 and out["m4"]["features"][2] == 4.0
    # deterministic: same payload -> same features
    again = extract_features(_media(spark, rows[:1])).first()["features"]
    assert again == out["m1"]["features"]


def test_resize_images_real_nearest_neighbor(spark):
    import numpy as np

    from geosparql_etl_spark.functions.codecs import decode_bmp, encode_bmp

    # 2x2 quadrant image: nearest-neighbor upscale to 8x4 must tile the
    # quadrants as 4x2 blocks
    px = np.array(
        [[[255, 0, 0], [0, 255, 0]], [[0, 0, 255], [255, 255, 255]]],
        dtype=np.uint8,
    )
    rows = [
        ("m1", "image", encode_bmp(px), (2, 2, None, "image/bmp")),
        ("m2", "video", b"zzz", (None, None, 5000, "video/fake")),
    ]
    out = {r["media_id"]: r for r in resize_images(_media(spark, rows), 8, 4).collect()}
    resized = decode_bmp(bytes(out["m1"]["resized"]))
    assert resized.shape == (4, 8, 3)
    assert (resized[0, 0] == [255, 0, 0]).all()   # top-left quadrant
    assert (resized[0, 7] == [0, 255, 0]).all()   # top-right
    assert (resized[3, 0] == [0, 0, 255]).all()   # bottom-left
    assert (resized[3, 7] == [255, 255, 255]).all()
    assert out["m1"]["out_width"] == 8 and out["m1"]["out_height"] == 4
    assert out["m2"]["resized"] is None and "resize" in out["m2"]["decode_error"]


def test_sample_frames_offsets(spark):
    rows = [
        ("v1", "video", b"x", (None, None, 3500, "video/fake")),
        ("v2", "video", b"x", (None, None, 20000, "video/fake")),
        ("i1", "image", b"x", (64, 64, None, "image/fake")),
    ]
    out = sample_frames(_media(spark, rows), every_ms=1000, max_frames=8).collect()
    offs = {}
    for r in out:
        offs.setdefault(r["media_id"], []).append(r["frame_offset_ms"])
    assert sorted(offs["v1"]) == [0, 1000, 2000, 3000]
    assert sorted(offs["v2"]) == [0, 1000, 2000, 3000, 4000, 5000, 6000, 7000]  # capped at 8
    assert "i1" not in offs


def test_salted_join_matches_plain_join(spark):
    from geosparql_etl_spark.operators.skew import salted_join

    skewed = spark.createDataFrame(
        [Row(k="hot", v=i) for i in range(50)] + [Row(k="cold", v=99)]
    )
    dim = spark.createDataFrame([Row(k="hot", label="H"), Row(k="cold", label="C")])
    got = sorted(
        (r["k"], r["v"], r["label"])
        for r in salted_join(skewed, dim, ["k"], n=4).collect()
    )
    want = sorted(
        (r["k"], r["v"], r["label"]) for r in skewed.join(dim, "k").collect()
    )
    assert got == want


def test_salted_count_distinct_exact(spark):
    from geosparql_etl_spark.operators.skew import salted_count_distinct

    rows = [Row(g="a", u=i % 7) for i in range(100)] + [Row(g="b", u=i) for i in range(13)]
    df = spark.createDataFrame(rows)
    got = {
        r["g"]: r["n_distinct_u"]
        for r in salted_count_distinct(df, ["g"], "u", n=4).collect()
    }
    assert got == {"a": 7, "b": 13}


def test_ivf_topk_structure_and_determinism(spark):
    import random

    from geosparql_etl_spark.operators.similarity import ivf_topk, with_ivf_cell

    rng = random.Random(3)
    rows = [
        Row(vec_id=i, embedding=[rng.uniform(-1, 1) for _ in range(8)])
        for i in range(60)
    ]
    e = spark.createDataFrame(rows)
    q = e.where(F.col("vec_id") < 3)

    out = ivf_topk(e, q, k=4, dim=8, n_cells=4, n_probe=2).collect()
    by_q = {}
    for r in out:
        by_q.setdefault(r["query_id"], []).append((r["rank"], r["neighbor_id"]))
    assert set(by_q) == {0, 1, 2}
    for ranks in by_q.values():
        assert [r for r, _ in sorted(ranks)] == list(range(1, len(ranks) + 1))
        assert len(ranks) <= 4

    # deterministic cell assignment across invocations
    a = {r["vec_id"]: r["ivf_cell"] for r in with_ivf_cell(e, dim=8, n_cells=4).collect()}
    b = {r["vec_id"]: r["ivf_cell"] for r in with_ivf_cell(e, dim=8, n_cells=4).collect()}
    assert a == b and set(a.values()) <= set(range(4))


def test_ivf_custom_centroids_override_quantizer(spark):
    """Trained centroids (sim15's path) replace the seeded quantizer:
    with axis-aligned custom centroids the cell is the argmax
    coordinate, and ivf_topk candidates stay inside the probed cells."""
    from geosparql_etl_spark.operators.similarity import (
        ivf_topk,
        with_ivf_cell,
    )

    # vectors whose dominant axis is known -> cell == dominant axis
    rows = [
        Row(vec_id=0, embedding=[5.0, 0.1, 0.0]),
        Row(vec_id=1, embedding=[4.0, 0.2, 0.0]),
        Row(vec_id=2, embedding=[0.0, 3.0, 0.1]),
        Row(vec_id=3, embedding=[0.1, 2.0, 0.0]),
        Row(vec_id=4, embedding=[0.0, 0.1, 9.0]),
    ]
    e = spark.createDataFrame(rows)
    axes = [[1.0, 0.0, 0.0], [0.0, 1.0, 0.0], [0.0, 0.0, 1.0]]
    cells = {
        r["vec_id"]: r["ivf_cell"]
        for r in with_ivf_cell(e, dim=3, n_cells=3, centroids=axes).collect()
    }
    assert cells == {0: 0, 1: 0, 2: 1, 3: 1, 4: 2}

    # n_probe=1 from vec 0: only the cell-0 co-resident is a candidate
    q = e.where(F.col("vec_id") == 0)
    got = ivf_topk(
        e, q, k=5, dim=3, n_cells=3, n_probe=1, centroids=axes
    ).collect()
    assert [(r["query_id"], r["neighbor_id"]) for r in got] == [(0, 1)]


def test_ivf_persisted_index_prunes_partitions(spark, tmp_path):
    """write_ivf_index -> ivf_index_topk: the probe scan must carry a
    PartitionFilters entry on ivf_cell (reads only probed directories)
    and return exactly what the in-flight ivf_topk path returns."""
    import random

    from geosparql_etl_spark.operators.similarity import (
        ivf_index_topk,
        ivf_topk,
        write_ivf_index,
    )

    rng = random.Random(7)
    rows = [
        Row(vec_id=i, embedding=[rng.uniform(-1, 1) for _ in range(8)])
        for i in range(80)
    ]
    e = spark.createDataFrame(rows)
    path = str(tmp_path / "ivf_idx")
    write_ivf_index(e, path, dim=8, n_cells=4)

    # the partition layout is one directory per cell
    import os

    dirs = sorted(
        d for d in os.listdir(path) if d.startswith("ivf_cell=")
    )
    assert dirs and all(d.split("=")[1].isdigit() for d in dirs)

    q = e.where(F.col("vec_id") < 3)
    idx = ivf_index_topk(
        spark, path, q, k=4, dim=8, n_cells=4, n_probe=2
    )
    plan = idx._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "ivf_cell" in plan

    flight = ivf_topk(e, q, k=4, dim=8, n_cells=4, n_probe=2)
    got = sorted(
        (r["query_id"], r["neighbor_id"], r["rank"]) for r in idx.collect()
    )
    want = sorted(
        (r["query_id"], r["neighbor_id"], r["rank"])
        for r in flight.collect()
    )
    assert got == want and len(got) > 0


def test_approx_count_distinct_within_tolerance(spark, sf_dir):
    """SCALE.md claims approx_count_distinct as the scale path for A4;
    pin its error band (default rsd=5%) against the exact count."""
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    row = o.agg(
        F.countDistinct("o_custkey").alias("exact"),
        F.approx_count_distinct("o_custkey").alias("approx"),
    ).first()
    assert abs(row["approx"] - row["exact"]) <= 0.1 * row["exact"]


# --- dedup skew guard --------------------------------------------------------


def test_ngram_jaccard_df_cap_bounds_boilerplate_skew(spark):
    """A stop-shingle shared by every document must not self-join
    quadratically when max_df binds; when it doesn't bind, the capped
    result equals the uncapped one exactly; true dups still surface
    through their non-boilerplate shingles."""
    from pyspark.sql import Observation

    from geosparql_etl_spark.operators.dedup import ngram_jaccard_pairs

    rows = [(i, f"the quick brown u{i}a u{i}b u{i}c u{i}d") for i in range(10)]
    # docs 10/11: a genuine near-dup pair sharing unique (uncapped) text
    rows += [
        (10, "the quick brown alpha beta gamma delta epsilon"),
        (11, "the quick brown alpha beta gamma delta zeta"),
    ]
    docs = spark.createDataFrame(rows, "doc_id int, text string")

    uncapped = ngram_jaccard_pairs(
        docs, "doc_id", "text", k=3, min_jaccard=0.05, max_df=None
    )
    # cap above the top document frequency (12) -> exact equality
    loose = ngram_jaccard_pairs(
        docs, "doc_id", "text", k=3, min_jaccard=0.05, max_df=100
    )
    assert sorted(map(tuple, loose.collect())) == sorted(
        map(tuple, uncapped.collect())
    )

    # cap below it -> the hot shingle ("the quick brown", df=12) is
    # dropped before the join: boilerplate-only pairs disappear, the
    # true dup pair (10, 11) survives via its unique shingles, and the
    # observation reports the dropped postings
    obs = Observation("d04_cap")
    capped = ngram_jaccard_pairs(
        docs, "doc_id", "text", k=3, min_jaccard=0.05, max_df=5, observation=obs
    )
    got = {(r.id_a, r.id_b) for r in capped.collect()}
    assert got == {(10, 11)}
    m = obs.get
    assert m["capped_postings"] == 12  # one hot shingle x 12 docs
    assert m["total_postings"] == sum(
        len(t.split()) - 2 for _, t in rows
    )

    # the plan kills the hot key with a broadcast join (no shuffle of
    # the exploded posting list against itself on the hot key)
    plan = capped._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


# --- S10: real HTTP enrichment fetch ----------------------------------------


def test_http_json_fetch_against_local_server(spark):
    """enrich_with_lookup with a REAL http fetch (stdlib urllib) against
    an in-process HTTP server: per-key success, JSON field extraction,
    and 404 -> negative cache."""
    import http.server
    import json
    import threading

    from geosparql_etl_spark.operators.enrich import (
        enrich_with_lookup,
        http_json_fetch,
    )

    hits = []

    class Handler(http.server.BaseHTTPRequestHandler):
        def do_GET(self):
            hits.append(self.path)
            key = self.path.split("/")[-1].split("?")[0]
            if key == "s404":
                self.send_response(404)
                self.end_headers()
                return
            body = json.dumps(
                {"field_iip_path": [{"value": f"/images/{key}.svs"}]}
            ).encode()
            self.send_response(200)
            self.send_header("Content-Type", "application/json")
            self.end_headers()
            self.wfile.write(body)

        def log_message(self, *a):  # quiet
            pass

    srv = http.server.ThreadingHTTPServer(("127.0.0.1", 0), Handler)
    port = srv.server_address[1]
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        facts = spark.createDataFrame(
            [Row(slide_id="s1"), Row(slide_id="s1"), Row(slide_id="s404")]
        )
        fetch = http_json_fetch(
            f"http://127.0.0.1:{port}/node/{{key}}?_format=json",
            ("field_iip_path", 0, "value"),
            retries=0,
        )
        out = {}
        for r in enrich_with_lookup(facts, "slide_id", fetch).collect():
            out.setdefault(r["slide_id"], []).append(
                (r["hash"], r["hash_missing"])
            )
        assert out["s1"] == [("/images/s1.svs", False)] * 2
        assert out["s404"] == [(None, True)]
        # distinct-key memoization: one request per key, not per row
        assert len(hits) == 2
    finally:
        srv.shutdown()


# --- connected components / transitive dedup clusters ------------------------


def _cc_bruteforce(edges):
    """Union-find ground truth for tiny graphs."""
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {n: find(n) for n in parent}


def test_connected_components_matches_union_find(spark):
    from geosparql_etl_spark.operators.dedup import connected_components

    # chain (propagation must traverse, not just look one hop),
    # triangle, isolated pair, and a star
    edges = [
        (10, 11), (11, 12), (12, 13), (13, 14),   # chain -> all label 10
        (20, 21), (21, 22), (20, 22),             # triangle
        (30, 31),                                 # pair
        (40, 41), (40, 42), (40, 43),             # star
    ]
    pairs = spark.createDataFrame(edges, ["id_a", "id_b"])
    got = {
        r["node"]: r["cluster_id"]
        for r in connected_components(pairs).collect()
    }
    assert got == _cc_bruteforce(edges)


def test_connected_components_long_path_converges_logarithmically(spark):
    from geosparql_etl_spark.operators.dedup import connected_components

    # path of 30 nodes: plain neighbor propagation needs 29 rounds for
    # the min to walk the chain; pointer jumping doubles resolved path
    # length per round, so it must finish in O(log2(29)) + slack
    edges = [(i, i + 1) for i in range(100, 129)]
    stats = {}
    got = {
        r["node"]: r["cluster_id"]
        for r in connected_components(
            pairs=spark.createDataFrame(edges, ["id_a", "id_b"]),
            max_iter=40,
            stats=stats,
        ).collect()
    }
    assert set(got.values()) == {100}
    assert len(got) == 30
    assert stats["rounds"] <= 8, stats


def test_dedup_clusters_sizes(spark):
    from geosparql_etl_spark.operators.dedup import dedup_clusters

    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (7, 8)], ["id_a", "id_b"]
    )
    rows = {
        r["doc_id"]: (r["cluster_id"], r["cluster_size"])
        for r in dedup_clusters(pairs).collect()
    }
    assert rows == {
        1: (1, 3), 2: (1, 3), 3: (1, 3),
        7: (7, 2), 8: (7, 2),
    }


def test_extract_features_png_matches_bmp(spark):
    """Same pixels through the PNG and BMP payload paths -> identical
    features (decode_image sniffs the format inside the Spark stage)."""
    import numpy as np

    from geosparql_etl_spark.functions import codecs
    from geosparql_etl_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        extract_features,
        resize_images,
    )

    rng = np.random.RandomState(3)
    img = rng.randint(0, 256, (8, 6, 3), dtype=np.uint8)
    rows = [
        ("png1", "image", bytearray(codecs.encode_png(img)), (6, 8, None, "image/png")),
        ("bmp1", "image", bytearray(codecs.encode_bmp(img)), (6, 8, None, "image/bmp")),
        ("bad1", "image", bytearray(b"\x89PNG\r\n\x1a\njunk"), (None, None, None, None)),
    ]
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    got = {
        r["media_id"]: (r["features"], r["decode_error"])
        for r in extract_features(media).collect()
    }
    assert got["png1"][1] is None and got["bmp1"][1] is None
    assert got["png1"][0] == got["bmp1"][0]
    assert got["bad1"][0] is None and got["bad1"][1]

    resized = {
        r["media_id"]: r["resized"]
        for r in resize_images(media, 3, 4).collect()
    }
    assert resized["png1"] == resized["bmp1"] and resized["png1"] is not None


def test_quantize_embeddings_bounds_and_error(spark):
    """int8 range respected; quantized cosine within the analytic error
    bound of exact cosine (|err| <~ 2*sqrt(d)/127 for unit-ish vectors,
    loose check: 0.05 for d=8)."""
    import math
    import random

    from geosparql_etl_spark.operators.similarity import (
        quantize_embeddings,
        quantized_cosine_topk,
    )

    rng = random.Random(5)
    rows = [
        (i, [rng.uniform(-1, 1) for _ in range(8)]) for i in range(40)
    ]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    qz = quantize_embeddings(df).collect()
    for r in qz:
        assert all(-127 <= v <= 127 for v in r["q8"])
        maxabs = max(abs(x) for x in r["embedding"])
        assert math.isclose(r["q8_scale"], maxabs / 127.0, rel_tol=1e-9)
        # dequantized values within half a step of the originals
        for x, qv in zip(r["embedding"], r["q8"]):
            assert abs(qv * r["q8_scale"] - x) <= r["q8_scale"] / 2 + 1e-12

    top = quantized_cosine_topk(df, df.where(F.col("vec_id") < 3), k=5).collect()
    assert len(top) == 15
    assert all(r["abs_err"] <= 0.05 for r in top)


def test_simhash_pairs_matches_bruteforce(spark):
    """Banded candidates + popcount verify == quadratic hamming check
    (pigeonhole guarantee: hamming <= 3 with 4 bands loses nothing)."""
    from geosparql_etl_spark.operators.dedup import simhash, simhash_pairs

    base = "the quick brown fox jumps over the lazy dog again and again"
    rows = [
        (1, base),
        (2, base + " tail"),                      # near-dup of 1
        (3, base.replace("quick", "rapid")),      # near-dup of 1
        (4, "completely different content about spark shuffles and joins"),
        (5, "yet another unrelated document mentioning parquet row groups"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in simhash_pairs(df, "doc_id", "text", max_hamming=3).collect()
    }
    hashes = {
        r["doc_id"]: r["simhash"] for r in simhash(df, "doc_id", "text").collect()
    }
    want = {}
    ids = sorted(hashes)
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            d = bin(hashes[a] ^ hashes[b]).count("1")
            if d <= 3:
                want[(a, b)] = d
    assert got == want and len(want) > 0

    import pytest as _pytest

    with _pytest.raises(ValueError):
        simhash_pairs(df, "doc_id", "text", max_hamming=4, bands=4)


def test_connected_components_with_reliable_checkpoint_dir(spark, tmp_path):
    """With a checkpoint dir configured, lineage cuts use fault-tolerant
    checkpoint() instead of localCheckpoint; results are identical."""
    from geosparql_etl_spark.operators.dedup import connected_components

    sc = spark.sparkContext
    edges = [(1, 2), (2, 3), (10, 11)]
    pairs = spark.createDataFrame(edges, ["id_a", "id_b"])
    try:
        sc.setCheckpointDir(str(tmp_path / "ckpt"))
        got = {
            r["node"]: r["cluster_id"]
            for r in connected_components(pairs).collect()
        }
    finally:
        # reset so later tests go back to localCheckpoint ($-name via getattr)
        getattr(sc._jsc.sc(), "checkpointDir_$eq")(sc._jvm.scala.Option.empty())
    assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10}


# --- product quantization ----------------------------------------------------


def test_pq_code_shape_and_determinism(spark):
    import random

    from geosparql_etl_spark.operators.similarity import with_pq_code

    rng = random.Random(5)
    rows = [
        Row(vec_id=i, embedding=[rng.uniform(-1, 1) for _ in range(16)])
        for i in range(50)
    ]
    e = spark.createDataFrame(rows)
    a = {r["vec_id"]: r["pq_code"] for r in with_pq_code(e, dim=16, m=4, k=8).collect()}
    b = {r["vec_id"]: r["pq_code"] for r in with_pq_code(e, dim=16, m=4, k=8).collect()}
    assert a == b
    for code in a.values():
        assert len(code) == 4 and all(0 <= c < 8 for c in code)


def test_pq_reconstruction_is_codebook_lookup(spark):
    from geosparql_etl_spark.operators.similarity import (
        _pq_codebooks,
        pq_reconstruct,
        with_pq_code,
    )

    books = _pq_codebooks(16, 4, 8)
    e = spark.createDataFrame(
        [Row(vec_id=0, embedding=[0.25 * i for i in range(16)])]
    )
    row = (
        with_pq_code(e, dim=16, m=4, k=8)
        .select(
            "pq_code",
            pq_reconstruct(F.col("pq_code"), dim=16, m=4, k=8).alias("rv"),
        )
        .first()
    )
    want = [v for j, c in enumerate(row["pq_code"]) for v in books[j][c]]
    assert row["rv"] == pytest.approx(want)


def test_pq_topk_beats_random_on_clustered_data(spark):
    """PQ approximate ranking must surface true near neighbors: build
    two tight clusters; every query's top neighbors must come from its
    own cluster."""
    import random

    from geosparql_etl_spark.operators.similarity import pq_topk

    rng = random.Random(11)

    def around(center, n, start_id):
        return [
            Row(
                vec_id=start_id + i,
                embedding=[c + rng.uniform(-0.05, 0.05) for c in center],
            )
            for i in range(n)
        ]

    c1 = [1.0] * 8 + [-1.0] * 8
    c2 = [-1.0] * 8 + [1.0] * 8
    e = spark.createDataFrame(around(c1, 10, 0) + around(c2, 10, 100))
    q = e.where(F.col("vec_id").isin(0, 100))
    out = pq_topk(e, q, kq=5, dim=16, m=4, k=16).collect()
    for r in out:
        same_cluster = (r["query_id"] < 100) == (r["neighbor_id"] < 100)
        assert same_cluster, (r["query_id"], r["neighbor_id"])


def test_failure_ledger_lifecycle(spark, tmp_path):
    """fail -> record -> resume skips failed -> retry-after-clear
    (reference: utils/checkpoint.py:158-234 failed-ids file with error
    strings; mongodb_to_rdf.py:149-152 skips completed AND failed)."""
    from geosparql_etl_spark.operators.ledger import (
        append_ledger,
        clear_failed,
        failed_report,
        filter_pending,
        read_ledger,
        record_failures,
    )

    path = str(tmp_path / "ledger")
    work = spark.createDataFrame(
        [("w1",), ("w2",), ("w3",)], "wid string"
    )

    # w1 completed at t0; w2 failed at t0
    append_ledger(
        spark.createDataFrame(
            [("w1", "completed", None, "2026-01-01 00:00:00")],
            "id string, status string, error string, ts string",
        ).withColumn("ts", F.col("ts").cast("timestamp")),
        path,
    )
    record_failures(
        spark.createDataFrame([("w2", "boom: bad geometry")], "id string, error string"),
        path,
        ts="2026-01-01 00:00:00",
    )

    led = read_ledger(spark, path)
    # default resume skips BOTH completed and failed -> only w3 pending
    assert [r["wid"] for r in filter_pending(work, led, "wid").collect()] == ["w3"]
    # retry mode re-queues the failed id
    assert sorted(
        r["wid"] for r in filter_pending(work, led, "wid", retry_failed=True).collect()
    ) == ["w2", "w3"]
    # triage artifact: id + error string
    rep = failed_report(led).collect()
    assert [(r["id"], r["error"]) for r in rep] == [("w2", "boom: bad geometry")]

    # w2 retried and completed LATER -> drops out of the failed report
    append_ledger(
        spark.createDataFrame(
            [("w2", "completed", None, "2026-01-02 00:00:00")],
            "id string, status string, error string, ts string",
        ).withColumn("ts", F.col("ts").cast("timestamp")),
        path,
    )
    led = read_ledger(spark, path)
    assert failed_report(led).count() == 0
    assert [r["wid"] for r in filter_pending(work, led, "wid", retry_failed=True).collect()] == ["w3"]

    # clear_failed compacts failures away: a still-failed id becomes
    # pending again even under the DEFAULT (non-retry) resume
    record_failures(
        spark.createDataFrame([("w3", "transient")], "id string, error string"),
        path,
        ts="2026-01-03 00:00:00",
    )
    led = read_ledger(spark, path)
    assert filter_pending(work, led, "wid").count() == 0  # all skipped
    clear_failed(spark, path)
    led = read_ledger(spark, path)
    assert sorted(r["status"] for r in led.collect()) == ["completed", "completed"]
    assert [r["wid"] for r in filter_pending(work, led, "wid").collect()] == ["w3"]


def test_in_progress_claims_and_stale_reclaim(spark, tmp_path):
    """In-progress ledger state (reference utils/checkpoint.py:158-234):
    a fresh claim is owned (skipped), a stale claim is a crashed worker
    and reclaims as pending, a claim superseded by completed stays
    done, and without a timeout a claim holds forever."""
    from geosparql_etl_spark.operators.ledger import (
        append_ledger,
        filter_pending,
        mark_in_progress,
        read_ledger,
    )

    path = str(tmp_path / "ledger")
    work = spark.createDataFrame(
        [("w1",), ("w2",), ("w3",), ("w4",)], "wid string"
    )

    # w1 claimed long ago (crash); w2 claimed just now (live worker);
    # w3 claimed long ago but completed afterwards
    mark_in_progress(
        spark.createDataFrame([("w1",), ("w3",)], "id string"),
        path,
        ts="2026-01-01 00:00:00",
    )
    mark_in_progress(
        spark.createDataFrame([("w2",)], "id string"),
        path,
        ts="2026-01-01 01:55:00",
    )
    append_ledger(
        spark.createDataFrame(
            [("w3", "completed", None, "2026-01-01 00:30:00")],
            "id string, status string, error string, ts string",
        ).withColumn("ts", F.col("ts").cast("timestamp")),
        path,
    )

    led = read_ledger(spark, path)
    now = "2026-01-01 02:00:00"
    # 30-min staleness: w1's 2h-old claim is a crash -> reclaimed;
    # w2's 5-min-old claim is owned; w3 is done; w4 never started
    got = sorted(
        r["wid"]
        for r in filter_pending(
            work, led, "wid", in_progress_timeout_min=30, now=now
        ).collect()
    )
    assert got == ["w1", "w4"]
    # no timeout contract -> every claim holds, only w4 pending
    assert sorted(
        r["wid"] for r in filter_pending(work, led, "wid").collect()
    ) == ["w4"]


def test_containment_catches_subset_dup_jaccard_misses(spark):
    """A short doc embedded verbatim in a much larger one: containment
    ~1.0 on the short side while symmetric Jaccard stays low — the
    quote/partial-copy pattern d10 exists to catch (Broder '97)."""
    from geosparql_etl_spark.operators.dedup import (
        ngram_containment_pairs,
        ngram_jaccard_pairs,
    )

    quote = "the quick brown fox jumps over the lazy dog"
    filler = " ".join(f"filler{i} token{i} word{i}" for i in range(40))
    docs = spark.createDataFrame(
        [
            (1, quote),
            (2, filler + " " + quote + " " + filler.upper()),
            (3, "completely unrelated content with no shared shingles at all"),
        ],
        "doc_id long, text string",
    )

    cont = {
        (r["id_a"], r["id_b"]): (r["containment_a"], r["containment_b"])
        for r in ngram_containment_pairs(
            docs, "doc_id", "text", k=3, min_containment=0.9
        ).collect()
    }
    assert (1, 2) in cont
    ca, cb = cont[(1, 2)]
    assert ca == pytest.approx(1.0)  # every shingle of the quote is in doc 2
    assert cb < 0.2  # doc 2 is mostly NOT the quote
    assert all(3 not in pair for pair in cont)

    jac = ngram_jaccard_pairs(
        docs, "doc_id", "text", k=3, min_jaccard=0.5
    ).collect()
    assert jac == []  # symmetric jaccard misses the subset dup


def test_mixture_keep_sets_nested_and_capped(spark, sf_dir):
    """llm09 selection properties: (a) kept sets are NESTED in the
    keep-rate (hash-threshold membership — rate changes adjust at the
    margin, never resample); (b) an over-subscribed language caps at
    10000 bp = take everything."""
    import __spark_entry__ as entry
    from pyspark.sql import functions as F

    out = {
        r["lang"]: r
        for r in entry.llm09_data_mixture(spark, sf_dir).collect()
    }
    # zh weight 40% of a half-corpus budget exceeds zh's token mass on
    # the synthetic distribution -> cap fires, everything kept
    capped = [lang for lang, r in out.items() if r["keep_bp"] == 10000]
    assert capped, out
    for lang in capped:
        assert out[lang]["tokens_kept"] == out[lang]["tok_lang"]

    # nesting: membership at a lower threshold is a subset of membership
    # at any higher one (pure hash property, independent of the data)
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    from geosparql_etl_spark.functions.hashing import md5_long

    bp = (md5_long(F.col("doc_id").cast("string")) % 10000).alias("bp")
    ids = lambda t: {
        r["doc_id"] for r in d.select("doc_id", bp).where(F.col("bp") < t).collect()
    }
    low, high = ids(1500), ids(6000)
    assert low <= high and len(low) < len(high)


def test_filtered_ann_neighbors_respect_predicate(spark, sf_dir):
    """sim09: every returned neighbor satisfies the metadata predicate
    (pre-filter semi-join), and each query still fills its top-5."""
    import __spark_entry__ as entry

    en = {
        r["doc_id"]
        for r in spark.read.parquet(f"{sf_dir}/documents.parquet")
        .where("lang = 'en'")
        .select("doc_id")
        .collect()
    }
    out = entry.sim09_filtered_ann(spark, sf_dir).collect()
    assert len(out) == 25  # 5 queries x full top-5
    assert all(r["neighbor_id"] in en for r in out)


# --- k-NN classify / semantic clusters / quality signals ---------------------


def test_knn_classify_votes_modal_label(spark):
    """Two tight clusters with distinct labels: every query must get
    its own cluster's label with a unanimous vote."""
    import random

    from geosparql_etl_spark.operators.similarity import knn_classify

    rng = random.Random(7)

    def jitter(base):
        return [b + rng.uniform(-0.01, 0.01) for b in base]

    a = [1.0] * 4 + [0.0] * 4
    b = [0.0] * 4 + [1.0] * 4
    rows = [
        Row(vec_id=i, embedding=jitter(a), label=0) for i in range(10)
    ] + [
        Row(vec_id=10 + i, embedding=jitter(b), label=1) for i in range(10)
    ]
    e = spark.createDataFrame(rows)
    q = e.where(F.col("vec_id").isin(0, 10))
    got = {
        r["query_id"]: (r["pred_label"], r["votes"])
        for r in knn_classify(e, q, k=3, dim=8, n_cells=2, n_probe=1).collect()
    }
    assert got == {0: (0, 3), 10: (1, 3)}


def test_knn_classify_tie_breaks_to_smaller_label(spark):
    """k=2 with one neighbor of each label -> 1-1 tie -> label 0 wins."""
    from geosparql_etl_spark.operators.similarity import knn_classify

    rows = [
        Row(vec_id=0, embedding=[1.0, 0.0], label=9),
        Row(vec_id=1, embedding=[1.0, 0.02], label=5),
        Row(vec_id=2, embedding=[1.0, -0.02], label=3),
    ]
    e = spark.createDataFrame(rows)
    q = e.where(F.col("vec_id") == 0)
    (r,) = knn_classify(e, q, k=2, dim=2, n_cells=1, n_probe=1).collect()
    assert (r["pred_label"], r["votes"]) == (3, 1)


def test_semantic_clusters_transitive(spark):
    """a~b and b~c but a!~c still land in ONE cluster (transitivity via
    connected components), with cluster_id = min member id."""
    from geosparql_etl_spark.operators.similarity import semantic_clusters

    rows = [
        Row(vec_id=1, embedding=[1.0, 0.0]),
        Row(vec_id=2, embedding=[0.9239, 0.3827]),   # 22.5deg from a
        Row(vec_id=3, embedding=[0.7071, 0.7071]),   # 45deg from a
        Row(vec_id=9, embedding=[-1.0, 0.0]),        # isolated
    ]
    e = spark.createDataFrame(rows)
    # threshold 0.8: cos(22.5deg)=0.924 links 1-2 and 2-3; cos(45deg)=0.707
    # does NOT link 1-3 directly
    out = semantic_clusters(e, threshold=0.8, dim=2, bands=8, bits_per_band=2)
    got = {r["vec_id"]: (r["cluster_id"], r["cluster_size"]) for r in out.collect()}
    assert got == {1: (1, 3), 2: (1, 3), 3: (1, 3)}


def test_char_entropy_known_values(spark):
    """H('aaaa')=0, H('ab')=1 bit, empty/null -> 0.0 with the doc kept."""
    from geosparql_etl_spark.operators.textrank import char_entropy

    rows = [
        Row(doc_id=1, text="aaaa"),
        Row(doc_id=2, text="ab"),
        Row(doc_id=3, text=""),
        Row(doc_id=4, text=None),
        Row(doc_id=5, text="abcd"),
    ]
    d = spark.createDataFrame(rows)
    got = {r["doc_id"]: r["entropy"] for r in char_entropy(d).collect()}
    assert got[1] == 0.0 and got[3] == 0.0 and got[4] == 0.0
    assert abs(got[2] - 1.0) < 1e-9
    assert abs(got[5] - 2.0) < 1e-9


def test_gopher_metrics_rules(spark):
    """Each rule flips keep: a good doc passes, then single-rule
    violations fail (too short; no stopwords; mean word length)."""
    from geosparql_etl_spark.functions.textstats import gopher_metrics

    good = ("the quick brown fox jumped over the lazy dog and ran on " * 5).strip()
    short = "the and of it"
    nostops = ("walrus pelican marmot badger weasel ferret otter stoat " * 8).strip()
    longwords = (
        "pneumonoultramicroscopic silicovolcanoconiosis antidisestablishment " * 20
    ).strip()
    rows = [
        Row(doc_id=1, text=good),
        Row(doc_id=2, text=short),
        Row(doc_id=3, text=nostops),
        Row(doc_id=4, text=longwords),
    ]
    d = spark.createDataFrame(rows)
    m = gopher_metrics(F.col("text"))
    out = {
        r["doc_id"]: r
        for r in d.select(
            "doc_id", m["keep"].alias("keep"), m["n_words"].alias("n"),
            m["stop_hits"].alias("s"), m["mean_word_len"].alias("mwl"),
        ).collect()
    }
    assert out[1]["keep"] is True
    assert out[2]["keep"] is False and out[2]["n"] < 50
    assert out[3]["keep"] is False and out[3]["s"] == 0
    assert out[4]["keep"] is False and out[4]["mwl"] > 10


def test_aqe_splits_skewed_join_partitions(spark):
    """The 100 TB skew story has two layers: salting (tested above)
    for the shapes AQE can't fix, and AQE's runtime skew-join split
    for sort-merge joins. Demonstrate the second actually fires: a
    1-hot-key fact joined to a dim under thresholds scaled to the toy
    data shows the skew=true marker on the SMJ in the adaptive plan."""
    import random

    from pyspark.sql import Row

    rng = random.Random(11)
    fact = spark.createDataFrame(
        [Row(k=(0 if i < 20000 else rng.randint(1, 50)),
             v=rng.random()) for i in range(24000)]
    )
    dim = spark.createDataFrame([Row(k=i, label=f"l{i}") for i in range(51)])
    confs = {
        "spark.sql.adaptive.enabled": "true",
        "spark.sql.adaptive.skewJoin.enabled": "true",
        # scale the skew thresholds down to toy data: a partition is
        # "skewed" past 16KB / 2x median instead of 256MB
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "16KB",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "8KB",
        "spark.sql.adaptive.coalescePartitions.enabled": "false",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.join.preferSortMergeJoin": "true",
    }
    prev = {k: spark.conf.get(k, None) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        j = fact.join(dim, "k")
        # materialize THIS DataFrame's query execution: count() builds
        # a separate plan, leaving j's AQE plan isFinalPlan=false
        assert len(j.collect()) == 24000
        plan = j._jdf.queryExecution().executedPlan().toString()
    finally:
        for k, v in prev.items():
            if v is not None:
                spark.conf.set(k, v)
    assert "skew=true" in plan, plan[:2000]


def test_approx_percentile_within_tolerance(spark, sf_dir):
    """a09 documents approx_percentile as the sketch path for exact
    percentiles at scale — pin its error against the exact value (the
    same guard approx_count_distinct already has)."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    row = li.agg(
        F.expr("percentile(l_extendedprice, 0.5)").alias("exact"),
        F.expr("approx_percentile(l_extendedprice, 0.5, 1000)").alias("approx"),
    ).first()
    assert abs(row["approx"] - row["exact"]) <= 0.02 * row["exact"]


def test_extract_frames_real_video_decode(spark):
    """GSV1 container: sampled offsets seek to the right frames and the
    per-frame features equal the local golden values; corrupt payloads
    land in the error channel."""
    import numpy as np

    from geosparql_etl_spark.functions.codecs import (
        encode_video,
        image_features,
    )
    from geosparql_etl_spark.operators.multimodal import extract_frames

    # 6 frames at 2 fps -> 3000ms; distinct solid colors per frame
    frames = [
        np.full((4, 6, 3), 40 * i, dtype=np.uint8) for i in range(6)
    ]
    vid = encode_video(frames, fps=2)
    rows = [
        ("v1", "video", vid, (None, None, 3000, "video/gsv1")),
        ("v2", "video", b"not-a-video", (None, None, 500, "video/gsv1")),
        ("i1", "image", b"x", (4, 4, None, "image/fake")),
    ]
    out = extract_frames(_media(spark, rows), every_ms=1000, max_frames=8).collect()
    by_id = {}
    for r in out:
        by_id.setdefault(r["media_id"], []).append(r)
    assert "i1" not in by_id  # images never enter the frame path

    v1 = sorted(by_id["v1"], key=lambda r: r["frame_offset_ms"])
    # offsets 0/1000/2000 at 2fps -> frames 0, 2, 4
    assert [r["frame_index"] for r in v1] == [0, 2, 4]
    for r, fi in zip(v1, (0, 2, 4)):
        assert r["decode_error"] is None
        assert r["features"] == pytest.approx(image_features(frames[fi]).tolist())

    (v2,) = by_id["v2"]
    assert v2["features"] is None and v2["decode_error"] is not None


def test_extract_frames_partial_decode_and_empty_video(spark):
    """A corrupt FRAME yields an error row for that frame while intact
    frames still emit; a valid zero-frame container emits nothing."""
    import struct

    import numpy as np

    from geosparql_etl_spark.functions.codecs import encode_video
    from geosparql_etl_spark.operators.multimodal import extract_frames

    frames = [np.full((2, 2, 3), 60 * i, dtype=np.uint8) for i in range(3)]
    vid = bytearray(encode_video(frames, fps=1))  # 1fps -> 3000ms
    # corrupt frame 1's BMP magic: header = 8B, index = 3*4B
    lengths = struct.unpack_from("<3I", bytes(vid), 8)
    f1_start = 8 + 12 + lengths[0]
    vid[f1_start:f1_start + 2] = b"XX"
    empty = encode_video([], fps=1)
    rows = [
        ("v1", "video", bytes(vid), (None, None, 3000, "video/gsv1")),
        ("v0", "video", empty, (None, None, 0, "video/gsv1")),
    ]
    out = extract_frames(_media(spark, rows), every_ms=1000, max_frames=8).collect()
    by = {}
    for r in out:
        by.setdefault(r["media_id"], []).append(r)
    assert "v0" not in by  # empty container: nothing to sample, no error
    v1 = sorted(by["v1"], key=lambda r: r["frame_offset_ms"])
    assert [r["frame_index"] for r in v1] == [0, 1, 2]
    assert v1[0]["decode_error"] is None and v1[2]["decode_error"] is None
    assert v1[1]["features"] is None and v1[1]["decode_error"] is not None


def test_line_dedup_keeps_first_occurrence_and_reassembles(spark):
    from geosparql_etl_spark.operators.dedup import line_dedup

    # 3-word "lines"; doc 1 repeats doc 0's first line (cross-doc dup),
    # doc 2 repeats its own line twice (within-doc dup).
    rows = [
        (0, "a b c d e f"),          # lines: "a b c", "d e f"
        (1, "a b c x y z"),          # "a b c" dups doc 0's line 0
        (2, "p q r p q r"),          # second "p q r" dups the first
        (3, None),                   # null text: no rows
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = line_dedup(df, "text", "doc_id", line_words=3)
    got = {
        (r.doc_id, r.line_idx): (r.line_text, r.kept)
        for r in out.collect()
    }
    assert got == {
        (0, 0): ("a b c", True),
        (0, 1): ("d e f", True),
        (1, 0): ("a b c", False),
        (1, 1): ("x y z", True),
        (2, 0): ("p q r", True),
        (2, 1): ("p q r", False),
    }


def test_line_dedup_short_tail_line(spark):
    from geosparql_etl_spark.operators.dedup import line_dedup

    # 4 words with 3-word lines: tail line is the 1-word remainder and
    # dedups independently of the full line it suffixes.
    df = spark.createDataFrame([(0, "a b c a"), (1, "a")], ["doc_id", "text"])
    got = {
        (r.doc_id, r.line_idx): (r.line_text, r.kept)
        for r in line_dedup(df, "text", "doc_id", line_words=3).collect()
    }
    assert got == {
        (0, 0): ("a b c", True),
        (0, 1): ("a", True),
        (1, 0): ("a", False),
    }


def test_heavy_hitters_matches_naive_and_prunes_local_only_keys(spark):
    from pyspark.sql import functions as F

    from geosparql_etl_spark.operators.profile import heavy_hitters

    # 3 shards x skewed keys. N=40, denom=4 -> global threshold 10.
    # "hot" (12 copies) is a global heavy hitter; "burst" (6 copies,
    # all in shard 0 of size 14 -> locally heavy at 14/4=3.5) is a
    # candidate the exact recount must PRUNE; "cold" never qualifies.
    rows = (
        [("hot", s) for s in (0, 1, 2, 0, 1, 2, 0, 1, 2, 0, 1, 2)]
        + [("burst", 0)] * 6
        + [("cold", s % 3) for s in range(22)]
    )
    df = spark.createDataFrame(rows, ["k", "shard"])
    got = {
        (r.k, r.n)
        for r in heavy_hitters(df, "k", "shard", denom=4).collect()
    }
    naive = {
        (r.k, r.n)
        for r in df.groupBy("k")
        .agg(F.count(F.lit(1)).alias("n"))
        .where(F.col("n") * 4 >= df.count())
        .collect()
    }
    assert got == naive == {("hot", 12), ("cold", 22)}


def test_heavy_hitters_null_key_is_a_key(spark):
    """NULL buckets like any other key (GROUP BY semantics): a
    null-keyed heavy hitter must survive the candidate join — the
    null-safe join contract from round-4 advice."""
    from pyspark.sql import functions as F
    from pyspark.sql.types import (
        IntegerType,
        StringType,
        StructField,
        StructType,
    )

    from geosparql_etl_spark.operators.profile import heavy_hitters

    schema = StructType(
        [StructField("k", StringType()), StructField("shard", IntegerType())]
    )
    # N=20, denom=2 -> threshold 10: NULL (12 copies) qualifies,
    # "x" (8) does not
    rows = [(None, s % 3) for s in range(12)] + [("x", s % 3) for s in range(8)]
    df = spark.createDataFrame(rows, schema)
    got = {
        (r.k, r.n)
        for r in heavy_hitters(df, "k", "shard", denom=2).collect()
    }
    assert got == {(None, 12)}


def test_lloyd_refine_recovers_cluster_means(spark):
    import numpy as np

    from geosparql_etl_spark.operators.similarity import (
        _ivf_centroids,
        lloyd_refine,
    )

    # Vectors placed exactly ON two seeded centroids (scaled): each
    # assigns to its own cell by max dot product, and the refined
    # centroid must equal the member mean under 1e-6 fixed point.
    dim, k = 8, 4
    cents = np.array(_ivf_centroids(dim, k))
    rows = []
    for c, mults in [(0, (1.0, 3.0)), (2, (2.0, 2.0))]:
        for i, m in enumerate(mults):
            rows.append((c * 100 + i, (cents[c] * m).astype("float32").tolist()))
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    out = lloyd_refine(df, "embedding", dim=dim, n_cells=k).collect()
    got = {(r.cluster, r.pos): (r.c_new, r.n) for r in out}
    assert {c for c, _ in got} == {0, 2}  # empty clusters emit nothing
    for c, mean_mult in [(0, 2.0), (2, 2.0)]:
        member_mean = cents[c] * mean_mult
        for pos in range(dim):
            c_new, n = got[(c, pos)]
            assert n == 2
            # fixed-point floor then /1e6: within one quantum of the
            # true float mean
            fixed = (
                np.floor(np.float64(np.float32(cents[c][pos])) * 1e6 * 1.0)
                + np.floor(np.float64(np.float32(cents[c][pos] * (2 * mean_mult - 1))) * 1e6)
            ) / 2 / 1e6
            assert abs(c_new - round(fixed, 6)) < 1.5e-6
            assert abs(c_new - member_mean[pos]) < 2e-6


def test_distinct_sketches_merge_and_tolerance(spark):
    from pyspark.sql import functions as F

    from geosparql_etl_spark.operators.profile import distinct_sketches

    # group "a": 3000 distinct keys split across 3 subgroups with
    # overlap (the union must dedup ACROSS sketches, not sum them);
    # group "b": 10 distinct keys repeated 50x (heavy multiplicity).
    df = spark.range(4500).select(
        F.lit("a").alias("g"),
        (F.col("id") % 3).cast("string").alias("sub"),
        # ids 0..4499 -> key id%3000: subgroup overlap by construction
        (F.col("id") % 3000).cast("string").alias("k"),
    ).union(
        spark.range(500).select(
            F.lit("b").alias("g"),
            F.lit("x").alias("sub"),
            (F.col("id") % 10).cast("string").alias("k"),
        )
    )
    got = {
        r.g: (r.n_rows, r.distinct_est)
        for r in distinct_sketches(df, "k", "g", "sub").collect()
    }
    assert got["b"][0] == 500 and got["b"][1] == 10  # exact at tiny card
    n_rows, est = got["a"]
    assert n_rows == 4500
    # lg_k=12 standard error ~1.6%; 5% is a generous CI bound
    assert abs(est - 3000) <= 0.05 * 3000


def test_image_dhash_golden_and_hamming_pairs_pigeonhole(spark):
    import numpy as np
    import pandas as pd

    from geosparql_etl_spark.functions.codecs import encode_bmp
    from geosparql_etl_spark.operators.dedup import hamming_pairs
    from geosparql_etl_spark.operators.multimodal import image_dhash

    # golden: 1x3 image, grays 10, 30, 20 -> bits [0, 1] -> hash 0b10
    px = np.array([[[10, 10, 10], [30, 30, 30], [20, 20, 20]]], dtype=np.uint8)
    media = spark.createDataFrame(
        pd.DataFrame({"media_id": ["m0"], "content": [encode_bmp(px)]})
    )
    row = image_dhash(media).collect()[0]
    assert (row.dhash, row.hash_bits, row.decode_error) == (2, 2, None)

    # pigeonhole: 28-bit hashes, 4 bands of 7. b differs from a in 3
    # bits spread over 3 bands (band 3 agrees -> candidate, kept at
    # hamming 3); c differs in 4 bits across all 4 bands (no shared
    # band AND over max_hamming -> absent); d is identical (hamming 0).
    hashes = [
        (1, 0),
        (2, (1 << 0) | (1 << 7) | (1 << 14)),
        (3, (1 << 0) | (1 << 7) | (1 << 14) | (1 << 21)),
        (4, 0),
    ]
    df = spark.createDataFrame(hashes, ["id", "h"])
    got = {
        (r.id_a, r.id_b): r.hamming
        for r in hamming_pairs(df, "id", "h", 28, max_hamming=3, bands=4).collect()
    }
    assert got[(1, 2)] == 3 and got[(1, 4)] == 0 and got[(2, 4)] == 3
    assert (1, 3) not in got and (3, 4) not in got
    assert got[(2, 3)] == 1  # differ only in band 3's bit


def test_approx_variants_within_pinned_tolerance(spark, sf_dir):
    """The approx bench rows' accuracy contract, pinned as a test: the
    HLL profile and approx_percentile variants must land within the
    same tolerances bench.py gates at sf0.1 — an approx path that
    drifted is a correctness bug, not a fast query."""
    import __spark_entry__ as entry
    from bench import (
        APPROX_DISTINCT_RTOL,
        APPROX_PCT_RTOL,
        _approx_tolerance_violation,
    )

    assert APPROX_DISTINCT_RTOL <= 0.10 and APPROX_PCT_RTOL <= 0.02
    assert (
        _approx_tolerance_violation(
            "dq01a_profile_hll",
            entry.dq01a_profile_hll(spark, sf_dir),
            entry.dq01_profile(spark, sf_dir),
        )
        is None
    )
    assert (
        _approx_tolerance_violation(
            "a09a_percentiles_approx",
            entry.a09a_percentiles_approx(spark, sf_dir),
            entry.a09_percentiles(spark, sf_dir),
        )
        is None
    )


def test_audio_fingerprint_golden_and_error_channel(spark):
    """Chromaprint-style fingerprint: golden bit math on a hand-built
    WAV, sample count not divisible by the frame width (tail samples
    dropped), and the decode-error channel on garbage bytes."""
    import numpy as np
    import pandas as pd

    from geosparql_etl_spark.functions.codecs import encode_wav
    from geosparql_etl_spark.operators.multimodal import audio_fingerprint

    # frames of 2: energies |10|+|‑20|=30, |5|+|5|=10, |0|+|40|=40,
    # |1|+|1|=2 -> bits: e0>e1 (set), e1>e2 (unset), e2>e3 (set)
    # -> hash 0b101 = 5, 3 bits
    samples = np.array([10, -20, 5, 5, 0, 40, 1, 1], dtype=np.int16)
    # 9 samples: the 9th is a dropped tail (4 full frames)
    samples9 = np.append(samples, np.int16(30000))
    media = spark.createDataFrame(
        pd.DataFrame(
            {
                "media_id": ["a", "b", "bad"],
                "content": [
                    encode_wav(samples, 16000),
                    encode_wav(samples9, 16000),
                    b"not a wav at all",
                ],
            }
        )
    )
    got = {r.media_id: r for r in audio_fingerprint(media, frame=2).collect()}
    assert (got["a"].afp, got["a"].hash_bits, got["a"].decode_error) == (5, 3, None)
    assert (got["b"].afp, got["b"].hash_bits) == (5, 3)  # tail ignored
    assert got["bad"].afp is None and got["bad"].decode_error


def test_global_prefix_sum_matches_single_window(spark):
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from geosparql_etl_spark.operators.partitioning import global_prefix_sum

    # values chosen so bucket sums differ and zeros appear
    rows = [(i, (i * 7) % 5) for i in range(100)]
    df = spark.createDataFrame(rows, ["id", "v"])
    got = {
        r.id: r.offset
        for r in global_prefix_sum(
            df,
            order_cols=[F.asc("id")],
            bucket=(F.col("id") / 9).cast("bigint"),
            value_col="v",
        ).collect()
    }
    w = Window.orderBy("id").rowsBetween(Window.unboundedPreceding, -1)
    want = {
        r.id: r.off
        for r in df.select(
            "id", F.coalesce(F.sum("v").over(w), F.lit(0)).alias("off")
        ).collect()
    }
    assert got == want and got[0] == 0 and len(got) == 100


def test_image_dhash_64bit_wrap_and_oversize_error_channel(spark):
    import numpy as np
    import pandas as pd

    from geosparql_etl_spark.functions.codecs import encode_bmp
    from geosparql_etl_spark.operators.multimodal import image_dhash

    # 9x8: exactly (9-1)*8 = 64 bits — production dHash shape. Gray
    # strictly decreasing along each row -> ALL bits set -> hash is
    # all-ones = -1 in two's complement (would OverflowError as an
    # unsigned int in an Int64 column).
    row = np.repeat(np.arange(80, 8, -8, dtype=np.uint8), 3).reshape(9, 3)
    px64 = np.tile(row, (8, 1, 1))  # 8 rows x 9 cols x 3
    # 10x8 -> 72 bits: over the long's capacity -> error channel
    row10 = np.repeat(np.arange(90, 10, -8, dtype=np.uint8), 3).reshape(10, 3)
    px72 = np.tile(row10, (8, 1, 1))
    media = spark.createDataFrame(
        pd.DataFrame(
            {
                "media_id": ["full64", "over72"],
                "content": [encode_bmp(px64), encode_bmp(px72)],
            }
        )
    )
    got = {r.media_id: r for r in image_dhash(media).collect()}
    assert got["full64"].dhash == -1 and got["full64"].hash_bits == 64
    assert got["full64"].decode_error is None
    assert got["over72"].dhash is None
    assert "64 bits" in got["over72"].decode_error


def test_pagerank_fixed_point_matches_reference(spark):
    from geosparql_etl_spark.operators.graph import SCALE, pagerank

    # star (0-1,0-2,0-3) + isolated node 9: the hub must outrank the
    # leaves, the isolated node sits at teleport mass, and every value
    # must equal the integer-arithmetic reference EXACTLY.
    pairs = [(0, 1), (0, 2), (0, 3)]
    nodes = [0, 1, 2, 3, 9]
    ndf = spark.createDataFrame([(n,) for n in nodes], ["doc_id"])
    pdf = spark.createDataFrame(pairs, ["id_a", "id_b"])
    got = {
        r.doc_id: (r.rank_scaled, r.degree)
        for r in pagerank(ndf, pdf, num_iters=3).collect()
    }

    # reference: same rule in plain Python ints
    edges = pairs + [(b, a) for a, b in pairs]
    deg = {}
    for s, _ in edges:
        deg[s] = deg.get(s, 0) + 1
    rank = {n: SCALE for n in nodes}
    for _ in range(3):
        nxt = {n: (100 - 85) * SCALE // 100 for n in nodes}
        for s, d in edges:
            nxt[d] += rank[s] * 85 // (100 * deg[s])
        rank = nxt
    assert got == {n: (rank[n], deg.get(n, 0)) for n in nodes}
    assert got[0][0] > got[1][0] > got[9][0] == 150000


def test_profile_drift_flags_zero_distinct_and_schema_changes(spark):
    """dq03's drift flag must not NULL out: old side 0-distinct with
    new values is drift (0 -> N explosion), and a column present in
    only one profile (schema change) is drift — three-valued logic
    would silently swallow both under the naive inner-join/ratio
    form."""
    from pyspark.sql import functions as F

    from geosparql_etl_spark.operators.profile import profile_table

    old = spark.createDataFrame(
        [(1, None), (2, None)], "id int, v string"
    )  # v: 0 distinct
    new = spark.createDataFrame(
        [(1, "x"), (2, None)], ["id", "v"]
    ).withColumn("added", F.lit(5))
    po = profile_table(old).select(
        "column",
        F.col("null_frac").alias("null_frac_old"),
        F.col("n_distinct").alias("n_distinct_old"),
    )
    pn = profile_table(new).select(
        "column",
        F.col("null_frac").alias("null_frac_new"),
        F.col("n_distinct").alias("n_distinct_new"),
    )
    ratio = F.col("n_distinct_new") / F.col("n_distinct_old")
    ratio_drift = F.when(
        F.col("n_distinct_old") == 0, F.col("n_distinct_new") > 0
    ).otherwise((ratio < 0.5) | (ratio > 2.0))
    out = po.join(pn, "column", "full_outer").select(
        "column",
        F.when(
            F.col("n_distinct_old").isNull()
            | F.col("n_distinct_new").isNull(),
            F.lit(True),
        )
        .otherwise(
            (F.abs(F.col("null_frac_new") - F.col("null_frac_old")) > 0.05)
            | ratio_drift
        )
        .alias("drift"),
    )
    got = {r.column: r.drift for r in out.collect()}
    assert got["v"] is True       # 0 -> 1 distinct: flagged, not NULL
    assert got["added"] is True   # one-sided column: schema drift
    assert got["id"] is False     # unchanged


class TestTriangleCounts:
    def test_clique_plus_path(self, spark):
        """K5 clique: every node sits in C(4,2)=6 triangles; a pendant
        path and an isolated edge contribute none."""
        from geosparql_etl_spark.operators.graph import triangle_counts

        clique = [(a, b) for a in range(5) for b in range(a + 1, 5)]
        extra = [(4, 10), (10, 11), (20, 21)]  # path off the clique + island
        pairs = spark.createDataFrame(
            [(int(a), int(b)) for a, b in clique + extra],
            "id_a long, id_b long",
        )
        got = {
            r.node: r.n_triangles for r in triangle_counts(pairs).collect()
        }
        assert got == {0: 6, 1: 6, 2: 6, 3: 6, 4: 6}

    def test_hub_star_has_no_triangles(self, spark):
        """A pure star (hub + leaves, no leaf-leaf edges): zero
        triangles — and the degree orientation points every edge AWAY
        from the hub, so the wedge join fans out over leaves (degree
        1), never over the hub."""
        from geosparql_etl_spark.operators.graph import triangle_counts

        pairs = spark.createDataFrame(
            [(0, i) for i in range(1, 30)], "id_a long, id_b long"
        )
        assert triangle_counts(pairs).count() == 0

    def test_two_overlapping_triangles(self, spark):
        from geosparql_etl_spark.operators.graph import triangle_counts

        pairs = spark.createDataFrame(
            [(1, 2), (2, 3), (1, 3), (3, 4), (2, 4)], "id_a long, id_b long"
        )
        got = {
            r.node: r.n_triangles for r in triangle_counts(pairs).collect()
        }
        assert got == {1: 1, 2: 2, 3: 2, 4: 1}


class TestBpeMerges:
    def test_sennrich_example_merge_order(self, spark):
        """Hand-computed merges on the classic BPE example vocabulary:
        e-s and s-t tie at 9 (tie-break picks 'e' < 's'), then es-t,
        then the l-o / o-w tie at 7, then lo-w."""
        from geosparql_etl_spark.operators.bpe import learn_bpe_merges

        words = spark.createDataFrame(
            [("low", 5), ("lower", 2), ("newest", 6), ("widest", 3)],
            "word string, freq long",
        )
        got = [tuple(r) for r in learn_bpe_merges(words, num_merges=4).collect()]
        assert got == [
            (1, "e", "s", 9),
            (2, "es", "t", 9),
            (3, "l", "o", 7),
            (4, "lo", "w", 7),
        ]

    def test_back_to_back_merge_both_applied(self, spark):
        """'aaaa' x1: round 1 counts (a,a)=3 overlapping pairs; the
        greedy fold leaves 'aa aa' (both non-overlapping occurrences
        merged), so round 2 learns (aa,aa)."""
        from geosparql_etl_spark.operators.bpe import learn_bpe_merges

        words = spark.createDataFrame([("aaaa", 1)], "word string, freq long")
        got = [tuple(r) for r in learn_bpe_merges(words, num_merges=2).collect()]
        assert got == [(1, "a", "a", 3), (2, "aa", "aa", 1)]

    def test_odd_run_merges_canonically(self, spark):
        """Round 8 (the ADVICE replace-twice finding): an ODD run
        'aaaaa' under merge (a,a) must tokenize eager-left as
        'aa aa a' — the canonical greedy fold — never the left-biased
        'aa a aa' the old string replace-twice rewrite produced."""
        from geosparql_etl_spark.operators.bpe import apply_bpe_merges

        words = spark.createDataFrame([("aaaaa",)], "word string")
        got = apply_bpe_merges(words, [("a", "a")]).collect()[0]
        assert (got.toks, got.k) == ("aa aa a", 3)

    def test_apply_matches_python_reference(self, spark):
        """Property pin: the Catalyst fold equals a plain-Python
        canonical greedy BPE on an awkward mixed vocabulary."""
        from geosparql_etl_spark.operators.bpe import apply_bpe_merges

        def ref(word, merges):
            syms = list(word)
            for a, b in merges:
                out = []
                for s in syms:
                    if out and out[-1] == a and s == b:
                        out[-1] = a + b
                    else:
                        out.append(s)
                syms = out
            return " ".join(syms)

        merges = [("a", "a"), ("aa", "b"), ("b", "a")]
        vocab = ["aaab", "aaaab", "ababa", "baaa", "b", "aabaab"]
        words = spark.createDataFrame(
            [(w,) for w in vocab], "word string"
        )
        got = {
            r.word: r.toks
            for r in apply_bpe_merges(words, merges).collect()
        }
        assert got == {w: ref(w, merges) for w in vocab}

    def test_stops_when_no_pairs(self, spark):
        from geosparql_etl_spark.operators.bpe import learn_bpe_merges

        words = spark.createDataFrame([("ab", 2)], "word string, freq long")
        got = learn_bpe_merges(words, num_merges=5).collect()
        assert len(got) == 1  # after merging (a,b) nothing is adjacent

    def test_apply_round_trips_sennrich_example(self, spark):
        """Round 6: tokenizing with the learned table must reproduce
        the trainer's own final word states — hand-checked on the
        classic vocabulary after 4 merges (es, es-t, lo, lo-w)."""
        from geosparql_etl_spark.operators.bpe import (
            apply_bpe_merges,
            learn_bpe_merges,
        )

        words = spark.createDataFrame(
            [("low", 5), ("lower", 2), ("newest", 6), ("widest", 3)],
            "word string, freq long",
        )
        merges = [
            (r["lhs"], r["rhs"])
            for r in learn_bpe_merges(words, num_merges=4)
            .orderBy("merge_rank")
            .collect()
        ]
        got = {
            r.word: (r.toks, r.k)
            for r in apply_bpe_merges(words.select("word"), merges).collect()
        }
        assert got == {
            "low": ("low", 1),
            "lower": ("low e r", 3),
            "newest": ("n e w est", 4),
            "widest": ("w i d est", 4),
        }

    def test_apply_unseen_word_falls_back_to_chars(self, spark):
        """A word sharing no learned merge decomposes to characters —
        the open-vocabulary property application must preserve."""
        from geosparql_etl_spark.operators.bpe import apply_bpe_merges

        words = spark.createDataFrame([("zq",)], "word string")
        (row,) = apply_bpe_merges(words, [("e", "s")]).collect()
        assert (row.toks, row.k) == ("z q", 2)


class TestHybridRetrieval:
    """operators/retrieval.py: BM25 pinned on a hand-computed corpus,
    RRF fusion edges (one-arm docs, determinism of the cut)."""

    def test_bm25_hand_computed(self, spark):
        import math

        docs = spark.createDataFrame(
            [
                (1, "join join filter scan"),
                (2, "join scan scan scan"),
                (3, "table value row line"),
            ],
            "doc_id bigint, text string",
        )
        from geosparql_etl_spark.operators.retrieval import bm25_scores

        got = {
            r.doc_id: float(r.score)
            for r in bm25_scores(docs, ["join", "filter"]).collect()
        }
        # N=3, avgdl=4; join: df=2, filter: df=1
        def part(tf, dl, df):
            idf = math.log(1 + (3 - df + 0.5) / (df + 0.5))
            return round(idf * tf * 2.2 / (tf + 1.2 * (0.25 + 0.75 * dl / 4)), 9)

        assert got[1] == pytest.approx(part(2, 4, 2) + part(1, 4, 1), abs=1e-9)
        assert got[2] == pytest.approx(part(1, 4, 2), abs=1e-9)
        assert 3 not in got  # matches no query term -> absent

    def test_rrf_fuse_single_arm_docs(self, spark):
        from geosparql_etl_spark.operators.retrieval import rrf_fuse

        lex = spark.createDataFrame(
            [(10, 1), (20, 2)], "doc_id bigint, lex_rank int"
        )
        vec = spark.createDataFrame(
            [(20, 1), (30, 2)], "doc_id bigint, vec_rank int"
        )
        got = {
            r.doc_id: (r.lex_rank, r.vec_rank, round(r.rrf, 6))
            for r in rrf_fuse([lex, vec], k=60).collect()
        }
        assert got[20] == (2, 1, round(1 / 62 + 1 / 61, 6))
        assert got[10] == (1, None, round(1 / 61, 6))
        assert got[30] == (None, 2, round(1 / 62, 6))

    def test_ranked_cut_is_topk_with_dense_ranks(self, spark):
        from geosparql_etl_spark.operators.retrieval import ranked_cut

        scored = spark.createDataFrame(
            [(i, float(100 - i)) for i in range(50)],
            "doc_id bigint, score double",
        )
        got = ranked_cut(scored, "score", 10).collect()
        assert [(r.doc_id, r.rank) for r in got] == [
            (i, i + 1) for i in range(10)
        ]


class TestBpeBatchedParity:
    """batch_size > 1 must learn the IDENTICAL merge table as the
    sequential trainer (the _batch_prefix acceptance rule's whole
    point) — only the Spark job count may differ."""

    def test_sennrich_parity_all_batch_sizes(self, spark):
        from geosparql_etl_spark.operators.bpe import learn_bpe_merges

        words = spark.createDataFrame(
            [("low", 5), ("lower", 2), ("newest", 6), ("widest", 3)],
            "word string, freq long",
        )
        seq = [tuple(r) for r in learn_bpe_merges(words, num_merges=6).collect()]
        for bs in (2, 4, 8):
            got = [
                tuple(r)
                for r in learn_bpe_merges(
                    words, num_merges=6, batch_size=bs
                ).collect()
            ]
            assert got == seq, f"batch_size={bs} diverged"

    def test_corpus_parity_64_merges(self, spark, sf_dir):
        """Real word-frequency distribution (documents corpus), deep
        enough that batched rounds accept several merges."""
        from geosparql_etl_spark.operators.bpe import learn_bpe_merges

        words = (
            spark.read.parquet(f"{sf_dir}/documents.parquet")
            .select(F.explode(F.split(F.trim("text"), r"\s+")).alias("word"))
            .where(F.col("word") != "")
            .groupBy("word")
            .agg(F.count(F.lit(1)).alias("freq"))
        )
        seq = [
            tuple(r)
            for r in learn_bpe_merges(words, num_merges=64).collect()
        ]
        bat = [
            tuple(r)
            for r in learn_bpe_merges(
                words, num_merges=64, batch_size=16
            ).collect()
        ]
        assert bat == seq

    def test_back_to_back_pairs_never_batch(self, spark):
        """'aaaa': (a,a) fuses to 'aa' whose follow-up merge (aa,aa)
        depends on round-1 counts — the disjointness rule must force
        it into the NEXT round, preserving (a,a)=3 then (aa,aa)=1."""
        from geosparql_etl_spark.operators.bpe import learn_bpe_merges

        words = spark.createDataFrame([("aaaa", 1)], "word string, freq long")
        got = [
            tuple(r)
            for r in learn_bpe_merges(
                words, num_merges=2, batch_size=8
            ).collect()
        ]
        assert got == [(1, "a", "a", 3), (2, "aa", "aa", 1)]


def test_auto_n_cells_sqrt_sizing():
    """auto_n_cells: power of two nearest sqrt(N), clamped [4, 65536];
    rows_per_cell overrides with an occupancy target. The power-of-two
    rounding makes the retrain trigger fire on ~2x growth only."""
    from geosparql_etl_spark.operators.similarity import auto_n_cells

    assert auto_n_cells(0) == 4
    assert auto_n_cells(16) == 4
    assert auto_n_cells(125) == 8
    assert auto_n_cells(500) == 16
    assert auto_n_cells(2000) == 32
    assert auto_n_cells(20000) == 128
    assert auto_n_cells(10**12) == 65536  # clamp
    # small drift does not move the size (away from the rounding
    # boundary); ~2x growth does
    assert auto_n_cells(420) == auto_n_cells(400)
    assert auto_n_cells(2 * 500) > auto_n_cells(500)
    # occupancy target override
    assert auto_n_cells(20000, rows_per_cell=1250) == 16


def test_write_ivf_index_auto_sizes_from_corpus(spark, sf_dir, tmp_path):
    """n_cells=None auto-sizes: lloyd_train picks auto_n_cells(N) and
    write_ivf_index inherits len(centroids); the persisted layout has
    exactly that many cell directories and probes answer identically
    to the explicit-n_cells build."""
    import os

    from geosparql_etl_spark.operators.similarity import (
        auto_n_cells,
        ivf_index_topk,
        lloyd_train,
        write_ivf_index,
    )

    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    n = e.count()
    want = auto_n_cells(n)
    t_auto = lloyd_train(e, "embedding", dim=64, n_cells=None, rounds=3)
    t_expl = lloyd_train(e, "embedding", dim=64, n_cells=want, rounds=3)
    assert t_auto == t_expl and len(t_auto) == want
    idx = str(tmp_path / "ivf_auto")
    write_ivf_index(e, idx, dim=64, n_cells=None, centroids=t_auto)
    cells = {d for d in os.listdir(idx) if d.startswith("ivf_cell=")}
    assert len(cells) == want
    probe = e.where(F.col("vec_id") < 3)
    got = ivf_index_topk(
        spark, idx, probe, k=5, dim=64, n_cells=want, n_probe=4,
        centroids=t_auto,
    ).collect()
    assert len(got) > 0


def test_lloyd_memo_invalidates_when_corpus_path_changes(spark, tmp_path):
    """_LLOYD_MEMO keys on (memo_key, metadata fingerprint): rewriting
    the data under the same path must retrain, not serve stale
    centroids (a long-lived process over regenerated testdata)."""
    import os
    import time

    from geosparql_etl_spark.operators.similarity import (
        _LLOYD_MEMO,
        _memo_fingerprint,
        lloyd_train,
    )

    d = str(tmp_path / "corpus")
    src = spark.range(0, 40).select(
        F.col("id").alias("vec_id"),
        F.transform(
            F.sequence(F.lit(0), F.lit(7)),
            lambda i: ((F.col("id") + i) % 5).cast("float"),
        ).alias("embedding"),
    )
    src.write.mode("overwrite").parquet(d)
    fp1 = _memo_fingerprint(d)
    c1 = lloyd_train(src, "embedding", dim=8, n_cells=2, rounds=1,
                     memo_key=d)
    n_keys = len(_LLOYD_MEMO)
    # same path, same bytes: memo hit, no new key
    assert lloyd_train(src, "embedding", dim=8, n_cells=2, rounds=1,
                       memo_key=d) == c1
    assert len(_LLOYD_MEMO) == n_keys
    # rewrite the corpus under the SAME path -> fingerprint moves
    time.sleep(0.01)
    src2 = src.withColumn(
        "embedding",
        F.transform(F.col("embedding"), lambda x: x + F.lit(3.0)),
    )
    src2.write.mode("overwrite").parquet(d)
    assert _memo_fingerprint(d) != fp1
    c2 = lloyd_train(src2, "embedding", dim=8, n_cells=2, rounds=1,
                     memo_key=d)
    assert len(_LLOYD_MEMO) == n_keys + 1  # retrained, new entry
    assert c2 != c1


def test_er_blocking_reduction_scales_with_domain_size(spark):
    """er03's reduction 0.778 at sf0.01 is the ceiling of its 8x8 name
    domain; the docstring claims reduction CLIMBS with domain size
    while completeness stays 1.0. Measured here on a 220-name domain
    drawn from 650 distinct tokens per slot: every token pair from the
    generator differs by >= 2 edits and any two names sharing NO token
    differ by >= 4, so the lev<=3 truth set is exactly the shared-
    token typo pairs — completeness provably 1.0 — while block sizes
    stay O(names/tokens), so reduction >= 0.95."""
    import string

    letters = string.ascii_lowercase
    toks = [c1 * 3 + c2 * 2 for c1 in letters for c2 in letters if c1 != c2]
    names = []
    for i in range(200):
        names.append(f"{toks[(i * 37) % 650]} {toks[(i * 61 + 13) % 650]}")
    # typo variants: same first token, second token edited by 2 chars
    # (lev 2 <= 3 -> a TRUE match the blocking must capture via t1)
    for i in range(0, 200, 10):
        t1, t2 = names[i].split()
        names.append(f"{t1} {t2[:3]}xy")
    names = sorted(set(names))
    assert len(names) >= 200

    df = spark.createDataFrame([(n,) for n in names], "n string")
    toks_col = F.split(F.col("n"), " ")
    blocked = df.select(
        "n",
        toks_col.getItem(0).alias("t1"),
        toks_col.getItem(1).alias("t2"),
        F.lit(1).alias("one"),
    )
    a = blocked.select(
        "one", F.col("n").alias("na"),
        F.col("t1").alias("a1"), F.col("t2").alias("a2"),
    )
    b = blocked.select(
        "one", F.col("n").alias("nb"),
        F.col("t1").alias("b1"), F.col("t2").alias("b2"),
    )
    pairs = (
        a.join(F.broadcast(b), "one")
        .where(F.col("na") < F.col("nb"))
        .select(
            (F.levenshtein("na", "nb") <= 3).cast("long").alias("is_true"),
            ((F.col("a1") == F.col("b1")) | (F.col("a2") == F.col("b2")))
            .cast("long")
            .alias("is_cand"),
        )
    )
    row = pairs.agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.sum("is_true").alias("n_true"),
        F.sum("is_cand").alias("n_cand"),
        F.sum(F.col("is_true") * F.col("is_cand")).alias("n_captured"),
    ).first()
    assert row["n_true"] >= 20  # the typo pairs are really in the truth set
    completeness = row["n_captured"] / row["n_true"]
    reduction = 1.0 - row["n_cand"] / row["n_pairs"]
    assert completeness == 1.0
    assert reduction >= 0.95, f"reduction {reduction:.4f} on 220-name domain"


def test_persisted_ivfpq_index_prunes_columns_and_partitions(
    spark, sf_dir, tmp_path
):
    """The serving layout's two physical claims, plan-pinned: the ADC
    stage scans (neighbor_id, __pq) ONLY (the float vectors stay
    unread until the shortlist fetch), both scans carry ivf_cell
    PartitionFilters, and the persisted answer equals the in-memory
    composed pipeline exactly."""
    from geosparql_etl_spark.operators.similarity import (
        ivf_index_pq_topk,
        ivf_pq_topk,
        lloyd_train,
        pq_train,
        write_ivf_pq_index,
    )

    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    cents = lloyd_train(e, "embedding", dim=64, n_cells=16, rounds=2,
                        memo_key=None)
    books = pq_train(e, "embedding", dim=64, m=16, k=16, rounds=2,
                     memo_key=None)
    idx = str(tmp_path / "ivfpq")
    write_ivf_pq_index(e, idx, dim=64, n_cells=16, m=16, k=16,
                       centroids=cents, codebooks=books)
    q = e.where(F.col("vec_id") < 3)
    got = ivf_index_pq_topk(
        spark, idx, q, kq=5, shortlist=40, dim=64, n_cells=16,
        n_probe=4, m=16, k=16, centroids=cents, codebooks=books,
    )
    plan = got._jdf.queryExecution().executedPlan().toString()
    schemas = [ln for ln in plan.splitlines() if "ReadSchema" in ln]
    code_scans = [s for s in schemas if "__pq" in s]
    assert code_scans, "no codes-only scan in the plan"
    assert all("__cv" not in s for s in code_scans), (
        "ADC scan reads the float vectors — column pruning lost"
    )
    assert plan.count("PartitionFilters: [ivf_cell") >= 2 or (
        "ivf_cell" in plan and "PartitionFilters" in plan
    )
    g = [(r.query_id, r.neighbor_id, r.rank, r.cosine_sim)
         for r in got.orderBy("query_id", "rank").collect()]
    want = ivf_pq_topk(
        e, q, kq=5, shortlist=40, dim=64, n_cells=16, n_probe=4,
        m=16, k=16, centroids=cents, codebooks=books,
    )
    w = [(r.query_id, r.neighbor_id, r.rank, round(r.cosine_sim, 6))
         for r in want.select("query_id", "neighbor_id", "rank",
                              "cosine_sim")
         .orderBy("query_id", "rank").collect()]
    assert g == w and len(g) == 15


def test_pack_unpack_pq_code_roundtrip_full_64_bits(spark):
    from geosparql_etl_spark.operators.similarity import (
        pack_pq_code,
        unpack_pq_code,
    )

    codes = [15, 0, 7, 8, 1, 2, 14, 9, 5, 11, 4, 6, 13, 10, 12, 3]
    df = spark.createDataFrame([(codes,)], "c array<int>")
    packed = df.select(pack_pq_code(F.col("c"), 16, 16).alias("p"))
    row = packed.select(
        "p",
        *[unpack_pq_code(F.col("p"), j, 16, 16).alias(f"u{j}")
          for j in range(16)],
    ).first()
    # leading code 15 sets the SIGN bit: the pack is negative and the
    # unsigned-shift + mask unpack must still recover every subspace
    assert row["p"] < 0
    assert [row[f"u{j}"] for j in range(16)] == codes


def test_filtered_persisted_ann_pushes_predicate_into_codes_scan(
    spark, sf_dir, tmp_path
):
    """sim24's physical claim: the candidate_filter lands in the codes
    scan as a parquet PushedFilters entry (ineligible rows die at the
    reader, before ADC), every returned neighbor is eligible, and the
    shortlist fills with eligible rows (k results per query, not a
    post-filtered remnant)."""
    from geosparql_etl_spark.operators.similarity import (
        ivf_index_pq_topk,
        lloyd_train,
        pq_train,
        write_ivf_pq_index,
    )

    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    cents = lloyd_train(e, "embedding", dim=64, n_cells=16, rounds=1,
                        memo_key=None)
    books = pq_train(e, "embedding", dim=64, m=16, k=16, rounds=1,
                     memo_key=None)
    idx = str(tmp_path / "ivfpq")
    write_ivf_pq_index(e, idx, dim=64, n_cells=16, m=16, k=16,
                       centroids=cents, codebooks=books,
                       carry_cols=("label",))
    q = e.where(F.col("vec_id") < 3)
    got = ivf_index_pq_topk(
        spark, idx, q, kq=5, shortlist=40, dim=64, n_cells=16,
        n_probe=8, m=16, k=16, centroids=cents, codebooks=books,
        candidate_filter=F.col("label") == 3,
    )
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [IsNotNull(label), EqualTo(label,3)]" in plan or (
        "EqualTo(label,3)" in plan
    ), "label predicate not pushed to the parquet reader"
    rows = got.collect()
    labels = {
        r["label"]
        for r in e.join(
            spark.createDataFrame(
                [(r.neighbor_id,) for r in rows], "vec_id long"
            ),
            "vec_id",
        ).select("label").collect()
    }
    assert labels == {3}
    by_q = {}
    for r in rows:
        by_q.setdefault(r.query_id, []).append(r.rank)
    assert all(sorted(v) == [1, 2, 3, 4, 5] for v in by_q.values())


def test_lsh_max_bucket_bounds_hot_band_skew(spark):
    """max_bucket is lsh_candidate_pairs' bounded-work dial (the LSH
    twin of ngram_jaccard_pairs' max_df): a band bucket shared by f
    documents self-joins to f^2/2 candidates, so one boilerplate
    signature class must not explode the join. Identical signatures
    land in every band's same bucket; the cap drops the hot buckets
    while pairs in small buckets survive."""
    from geosparql_etl_spark.operators.dedup import lsh_candidate_pairs

    # 40 docs share ONE signature (the boilerplate class); two pairs
    # of docs share their own distinct signatures (true near-dups)
    rows = [(i, [7, 7, 7, 7]) for i in range(40)]
    rows += [(100, [1, 2, 3, 4]), (101, [1, 2, 3, 4])]
    rows += [(200, [9, 8, 5, 6]), (201, [9, 8, 5, 6])]
    df = spark.createDataFrame(rows, "doc_id int, minhash array<int>")

    uncapped = lsh_candidate_pairs(
        df, "doc_id", "minhash", bands=4, max_bucket=10_000
    )
    # the hot class alone contributes 40*39/2 = 780 pairs
    assert uncapped.count() == 780 + 2

    capped = lsh_candidate_pairs(
        df, "doc_id", "minhash", bands=4, max_bucket=10
    )
    got = {(r.id_a, r.id_b) for r in capped.collect()}
    assert got == {(100, 101), (200, 201)}

    # the kept-bucket filter joins AGGREGATED bucket sizes (band,
    # bucket, count), never the posting list against itself on a hot
    # key — the candidate join's inputs are already cap-bounded
    plan = capped._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan


# --- persisted text index ------------------------------------------------------


def test_text_index_build_append_prune_and_score_parity(spark, sf_dir, tmp_path):
    """The persisted BM25 index must (a) score exactly like the
    on-the-fly bm25_scores over the same corpus, (b) compose build +
    incremental append to full-corpus scoring, and (c) read only the
    query terms' bucket partitions (PartitionFilters, across epochs)."""
    from geosparql_etl_spark.operators.retrieval import (
        append_to_text_index,
        bm25_scores,
        term_bucket_py,
        text_index_topk,
        write_text_index,
    )

    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    idx = str(tmp_path / "bm25")
    write_text_index(d.where(F.col("doc_id") % 2 == 0), idx)
    append_to_text_index(d.where(F.col("doc_id") % 2 == 1), idx, epoch="a1")

    terms = ["query", "join", "filter"]
    got = text_index_topk(spark, idx, terms, k=15)
    want = (
        bm25_scores(d, terms)
        .orderBy(F.col("score").desc(), F.col("doc_id"))
        .limit(15)
        .collect()
    )
    got_rows = got.collect()
    assert [(r.doc_id, float(r.score)) for r in got_rows] == [
        (r.doc_id, float(r.score)) for r in want
    ]
    assert [r.rank for r in got_rows] == list(range(1, 16))

    # bucket pruning: the scan's partition filters name the bucket
    # column and the executed plan touches only the terms' buckets
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "bucket" in plan
    # the probed bucket set appears verbatim in the partition filter
    want_buckets = sorted({term_bucket_py(t) for t in terms})
    assert str(want_buckets[0]) in plan

    # idempotent epoch replay: a replayed epoch overwrites its own
    # postings directory AND its own stats-ledger entry, so the
    # totals (and therefore every score) are unchanged
    import json
    import os

    append_to_text_index(d.where(F.col("doc_id") % 2 == 1), idx, epoch="a1")
    from geosparql_etl_spark.operators.retrieval import _read_stats

    stats = _read_stats(idx)
    assert sum(e["n_docs"] for e in stats["epochs"].values()) == d.count()
    assert set(stats["epochs"]) == {"base", "a1"}
    replayed = text_index_topk(spark, idx, terms, k=15).collect()
    assert [(r.doc_id, float(r.score)) for r in replayed] == [
        (r.doc_id, float(r.score)) for r in want
    ]


def test_text_index_rebuild_resets_layout_and_orphans_stay_invisible(
    spark, sf_dir, tmp_path
):
    """Review-fix pins: (a) write_text_index on a path holding an
    appended index must reset the WHOLE layout (stale append epochs
    must not ghost into df/avgdl); (b) an epoch whose postings landed
    but whose ledger entry never committed (crash window) is invisible
    to probes until the replay commits both."""
    import json
    import os
    import shutil

    from geosparql_etl_spark.operators.retrieval import (
        append_to_text_index,
        bm25_scores,
        text_index_topk,
        write_text_index,
    )

    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    idx = str(tmp_path / "bm25")
    half = d.where(F.col("doc_id") % 2 == 0)
    write_text_index(half, idx)
    append_to_text_index(d.where(F.col("doc_id") % 2 == 1), idx, epoch="a1")

    # (a) REBUILD from scratch over the half corpus: the a1 epoch must
    # be gone from disk and from scores
    write_text_index(half, idx)
    assert not os.path.exists(os.path.join(idx, "postings", "epoch=a1"))
    terms = ["query", "join", "filter"]
    got = text_index_topk(spark, idx, terms, k=10).collect()
    want = (
        bm25_scores(half, terms)
        .orderBy(F.col("score").desc(), F.col("doc_id"))
        .limit(10)
        .collect()
    )
    assert [(r.doc_id, float(r.score)) for r in got] == [
        (r.doc_id, float(r.score)) for r in want
    ]

    # (b) simulate the crash window: postings of a new epoch exist,
    # ledger entry does not -> probes must not see the orphan
    append_to_text_index(d.where(F.col("doc_id") % 2 == 1), idx, epoch="a2")
    # the epoch's commit is its _ledger sidecar file now (round 12
    # multi-writer ledger) — deleting it simulates the crash window
    os.remove(os.path.join(idx, "_ledger", "a2.json"))
    orphaned = text_index_topk(spark, idx, terms, k=10).collect()
    assert [(r.doc_id, float(r.score)) for r in orphaned] == [
        (r.doc_id, float(r.score)) for r in want
    ]
    shutil.rmtree(idx)


def test_text_index_delete_compact_lifecycle(spark, sf_dir, tmp_path):
    """Text-lake deletes (the BM25 twin of the ANN tombstone
    lifecycle): (a) a tombstoned index scores bit-identically to an
    index BUILT WITHOUT the deleted docs (df, n_docs and avgdl all
    adjust, not just the ranked ids); (b) compaction applies deletes
    physically, collapses the epoch ledger to one exact base entry
    and clears the tombstones atomically, leaving scores unchanged;
    (c) duplicate and phantom tombstones are harmless."""
    import json
    import os

    from geosparql_etl_spark.operators.retrieval import (
        append_to_text_index,
        compact_text_index,
        delete_from_text_index,
        text_index_topk,
        write_text_index,
    )

    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    terms = ["query", "join", "filter"]
    idx = str(tmp_path / "bm25")
    write_text_index(d.where(F.col("doc_id") % 2 == 0), idx)
    append_to_text_index(d.where(F.col("doc_id") % 2 == 1), idx, epoch="a1")
    delete_from_text_index(
        spark, idx, d.where(F.col("doc_id") % 7 == 3).select("doc_id")
    )
    # duplicate + phantom tombstones: dedup/semi-join make them no-ops
    delete_from_text_index(spark, idx, [3, 10**9])

    fresh = str(tmp_path / "bm25_fresh")
    write_text_index(d.where(F.col("doc_id") % 7 != 3), fresh)
    want = [
        (r.doc_id, float(r.score))
        for r in text_index_topk(spark, fresh, terms, k=15).collect()
    ]
    got = [
        (r.doc_id, float(r.score))
        for r in text_index_topk(spark, idx, terms, k=15).collect()
    ]
    assert got == want

    compact_text_index(spark, idx)
    assert not os.path.exists(os.path.join(idx, "_tombstones"))
    # compaction collapses the whole ledger (sidecar files included —
    # the swap drops the _ledger dir) to one exact base entry
    from geosparql_etl_spark.operators.retrieval import _read_stats

    assert not os.path.exists(os.path.join(idx, "_ledger"))
    stats = _read_stats(idx)
    assert list(stats["epochs"]) == ["base"]
    fresh_stats = _read_stats(fresh)
    assert stats["epochs"]["base"] == fresh_stats["epochs"]["base"]
    after = [
        (r.doc_id, float(r.score))
        for r in text_index_topk(spark, idx, terms, k=15).collect()
    ]
    assert after == want


def test_text_index_updates_seq_scoped_tombstones(spark, sf_dir, tmp_path):
    """UPDATE = seq-scoped tombstone + fresh epoch: (a) the updated
    version serves and df/avgdl/n_docs reflect the REPLACEMENT (not
    doc-count growth); (b) a delete issued AFTER an update kills the
    updated version too (supersede); (c) a REPLAYED update epoch is a
    no-op — its tombstone must not outrank the rows it re-inserts;
    (d) post-compaction deletes still work (seq resets to base)."""
    from geosparql_etl_spark.operators.retrieval import (
        bm25_scores,
        compact_text_index,
        delete_from_text_index,
        text_index_topk,
        update_text_index,
        write_text_index,
    )

    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    terms = ["query", "join", "filter"]
    idx = str(tmp_path / "bm25")
    write_text_index(d, idx)
    upd = d.where(F.col("doc_id") % 13 == 4).select(
        "doc_id",
        F.concat(F.col("text"), F.lit(" query revision")).alias("text"),
    )
    update_text_index(upd, idx, epoch="u1")
    update_text_index(upd, idx, epoch="u1")  # (c) replay

    live = d.select(
        "doc_id",
        F.when(
            F.col("doc_id") % 13 == 4,
            F.concat(F.col("text"), F.lit(" query revision")),
        ).otherwise(F.col("text")).alias("text"),
    )

    def topk(frame=None):
        if frame is not None:
            return [
                (r.doc_id, float(r.score))
                for r in bm25_scores(frame, terms)
                .orderBy(F.col("score").desc(), "doc_id")
                .limit(15)
                .collect()
            ]
        return [
            (r.doc_id, float(r.score))
            for r in text_index_topk(spark, idx, terms, k=15).collect()
        ]

    assert topk() == topk(live)  # (a) + (c)

    # (b) delete AFTER update supersedes the updated version
    delete_from_text_index(
        spark, idx, d.where(F.col("doc_id") % 11 == 5).select("doc_id")
    )
    live2 = live.where(F.col("doc_id") % 11 != 5)
    assert topk() == topk(live2)

    # (d) compaction then a further delete of an updated doc
    compact_text_index(spark, idx)
    victim = [r.doc_id for r in upd.limit(1).collect()]
    delete_from_text_index(spark, idx, victim)
    assert topk() == topk(live2.where(~F.col("doc_id").isin(victim)))


def test_text_index_time_travel_snapshots(spark, sf_dir, tmp_path):
    """as_of_seq pins the read to a historical snapshot: each pinned
    view must score bit-identically to a fresh index over that
    moment's corpus — epochs committed later and tombstones issued
    later (including an update's, though its SCOPE is below the pin)
    do not exist yet at the pin."""
    from geosparql_etl_spark.operators.retrieval import (
        append_to_text_index,
        bm25_scores,
        delete_from_text_index,
        text_index_topk,
        update_text_index,
        write_text_index,
    )

    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    terms = ["query", "join", "filter"]
    idx = str(tmp_path / "bm25")
    write_text_index(d.where(F.col("doc_id") < 250), idx)      # seq 0
    append_to_text_index(
        d.where(F.col("doc_id") >= 250), idx, epoch="a1"
    )                                                          # seq 1
    update_text_index(
        d.where(F.col("doc_id") % 13 == 4).select(
            "doc_id",
            F.concat(F.col("text"), F.lit(" query revision")).alias("text"),
        ),
        idx,
        epoch="u1",
    )                                                          # seq 2
    delete_from_text_index(
        spark, idx, d.where(F.col("doc_id") % 11 == 5).select("doc_id")
    )

    def fresh(corpus):
        return [
            (r.doc_id, float(r.score))
            for r in bm25_scores(corpus, terms)
            .orderBy(F.col("score").desc(), "doc_id")
            .limit(15)
            .collect()
        ]

    def served(**kw):
        return [
            (r.doc_id, float(r.score))
            for r in text_index_topk(spark, idx, terms, k=15, **kw).collect()
        ]

    latest = d.where(F.col("doc_id") % 11 != 5).select(
        "doc_id",
        F.when(
            F.col("doc_id") % 13 == 4,
            F.concat(F.col("text"), F.lit(" query revision")),
        ).otherwise(F.col("text")).alias("text"),
    )
    assert served(as_of_seq=0) == fresh(d.where(F.col("doc_id") < 250))
    assert served(as_of_seq=1) == fresh(d)
    assert served(as_of_seq=2) == served() == fresh(latest)


def test_text_index_random_op_sequence_matches_model(spark, sf_dir, tmp_path):
    """Stateful lifecycle fuzz (seeded): a random interleaving of
    append / update / delete / compact ops applied to the index must
    keep serving bit-identical to index-free BM25 over a plain model
    of the corpus state after every op."""
    import random

    from geosparql_etl_spark.operators.retrieval import (
        append_to_text_index,
        bm25_scores,
        compact_text_index,
        delete_from_text_index,
        text_index_topk,
        update_text_index,
        write_text_index,
    )

    d = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    rows = {r.doc_id: r.text for r in d.collect()}
    ids = sorted(rows)
    half = ids[: len(ids) // 2]
    rest = ids[len(ids) // 2:]
    terms = ["query", "join", "filter"]
    idx = str(tmp_path / "bm25")

    model = {i: rows[i] for i in half}
    write_text_index(d.where(F.col("doc_id").isin(half)), idx)

    def check():
        live = spark.createDataFrame(
            list(model.items()), "doc_id long, text string"
        )
        want = [
            (r.doc_id, float(r.score))
            for r in bm25_scores(live, terms)
            .orderBy(F.col("score").desc(), "doc_id")
            .limit(10)
            .collect()
        ]
        got = [
            (r.doc_id, float(r.score))
            for r in text_index_topk(spark, idx, terms, k=10).collect()
        ]
        assert got == want

    rng = random.Random(20260816)
    epoch_n = 0
    deleted: set = set()
    for step in range(6):
        op = rng.choice(["append", "update", "delete", "compact"])
        if op == "append" and rest:
            # re-append previously deleted docs alongside the fresh
            # batch: seq-scoped tombstones must let the later epoch's
            # re-insert serve (delete-then-reinsert)
            reins = sorted(deleted)[:4]
            batch = rest[: 40] + reins
            rest = rest[40:]
            for i in batch:
                model[i] = rows[i]
            deleted.difference_update(reins)
            epoch_n += 1
            append_to_text_index(
                d.where(F.col("doc_id").isin(batch)), idx, epoch=f"a{epoch_n}"
            )
        elif op == "update":
            victims = rng.sample(sorted(model), min(25, len(model)))
            reins = sorted(deleted)[:4]
            deleted.difference_update(reins)
            for i in reins:
                model[i] = rows[i]
            victims = sorted(set(victims) | set(reins))
            upd = spark.createDataFrame(
                [(i, model[i] + " revised query text") for i in victims],
                "doc_id long, text string",
            )
            for i in victims:
                model[i] = model[i] + " revised query text"
            epoch_n += 1
            update_text_index(upd, idx, epoch=f"u{epoch_n}")
        elif op == "delete":
            victims = rng.sample(sorted(model), min(15, len(model)))
            for i in victims:
                del model[i]
            deleted.update(victims)
            delete_from_text_index(spark, idx, victims)
        else:
            compact_text_index(spark, idx)
        check()


def test_text_index_compact_fully_tombstoned(spark, sf_dir, tmp_path):
    """Compacting an index whose every doc is tombstoned must complete
    and leave a VALID empty generation: a partitionBy write of zero
    rows emits only _SUCCESS (no parquet footer), which used to make
    the post-write stats read fail with 'unable to infer schema' —
    compaction of a fully-deleted index could never finish (round-11
    advisor finding). The compacted index must serve empty results,
    accept a fresh append, and compact again cleanly."""
    from geosparql_etl_spark.operators.retrieval import (
        append_to_text_index,
        compact_text_index,
        delete_from_text_index,
        text_index_topk,
        write_text_index,
    )

    d = spark.read.parquet(f"{sf_dir}/documents.parquet").where(
        F.col("doc_id") < 40
    )
    idx = str(tmp_path / "bm25")
    write_text_index(d, idx)
    delete_from_text_index(
        spark, idx, [r.doc_id for r in d.select("doc_id").collect()]
    )
    compact_text_index(spark, idx)
    assert text_index_topk(spark, idx, ["query"], k=5).count() == 0
    # the empty generation is a real index: appends + a second
    # compaction behave normally
    append_to_text_index(
        d.where(F.col("doc_id") < 10), idx, epoch="a1"
    )
    assert text_index_topk(spark, idx, ["query"], k=5).count() > 0
    compact_text_index(spark, idx)
    assert text_index_topk(spark, idx, ["query"], k=5).count() > 0


def test_text_index_torn_update_never_vanishes_doc(spark, sf_dir, tmp_path):
    """Crash atomicity: an update's tombstone is DORMANT until its
    epoch's ledger entry commits — simulate the crash window (delete
    issued at the not-yet-committed seq, no epoch append) and the old
    version must keep serving; committing the epoch then activates
    the tombstone atomically."""
    import json
    import os

    from geosparql_etl_spark.operators.retrieval import (
        append_to_text_index,
        bm25_scores,
        delete_from_text_index,
        text_index_topk,
        write_text_index,
    )

    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    terms = ["query", "join", "filter"]
    idx = str(tmp_path / "bm25")
    write_text_index(d, idx)

    def served():
        return [
            (r.doc_id, float(r.score))
            for r in text_index_topk(spark, idx, terms, k=10).collect()
        ]

    def fresh(corpus):
        return [
            (r.doc_id, float(r.score))
            for r in bm25_scores(corpus, terms)
            .orderBy(F.col("score").desc(), "doc_id")
            .limit(10)
            .collect()
        ]

    before = served()
    # the torn half of update_text_index: tombstone written with
    # issued = the (never-committed) update epoch's seq
    upd_ids = d.where(F.col("doc_id") % 13 == 4).select("doc_id")
    delete_from_text_index(spark, idx, upd_ids, at_seq=0, issued_seq=1)
    assert served() == before  # dormant — nothing vanished

    # the replayed update commits the epoch: tombstone activates with it
    upd = d.where(F.col("doc_id") % 13 == 4).select(
        "doc_id",
        F.concat(F.col("text"), F.lit(" query revision")).alias("text"),
    )
    append_to_text_index(upd, idx, epoch="u1")
    live = d.select(
        "doc_id",
        F.when(
            F.col("doc_id") % 13 == 4,
            F.concat(F.col("text"), F.lit(" query revision")),
        ).otherwise(F.col("text")).alias("text"),
    )
    assert served() == fresh(live)

    # compaction with a dormant tombstone must DROP it, not apply it
    idx2 = str(tmp_path / "bm25b")
    write_text_index(d, idx2)
    delete_from_text_index(
        spark, idx2, upd_ids, at_seq=0, issued_seq=1
    )
    from geosparql_etl_spark.operators.retrieval import compact_text_index

    compact_text_index(spark, idx2)
    stats = json.load(open(os.path.join(idx2, "_stats.json")))
    assert stats["epochs"]["base"]["n_docs"] == d.count()


def test_text_index_compaction_recovers_from_crashed_swap(
    spark, sf_dir, tmp_path
):
    """The text-lake compaction swap's crash windows: (a) index moved
    aside, replacement not yet renamed in -> the next call restores
    the moved-aside generation instead of deleting the only copy;
    (b) a stale .old from a crash after commit is swept, not served."""
    import os
    import shutil

    from geosparql_etl_spark.operators.retrieval import (
        compact_text_index,
        text_index_topk,
        write_text_index,
    )

    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    terms = ["query", "join", "filter"]
    idx = str(tmp_path / "bm25")
    write_text_index(d, idx)
    want = [
        (r.doc_id, float(r.score))
        for r in text_index_topk(spark, idx, terms, k=10).collect()
    ]

    # (a) crash between the two renames: live dir gone
    os.replace(idx, idx + ".compact.old")
    assert not os.path.exists(idx)
    compact_text_index(spark, idx)
    got = [
        (r.doc_id, float(r.score))
        for r in text_index_topk(spark, idx, terms, k=10).collect()
    ]
    assert got == want
    assert not os.path.exists(idx + ".compact.old")
    assert not os.path.exists(idx + ".compact.tmp")

    # (b) crash after commit, before cleanup: stale .old copy on disk
    shutil.copytree(idx, idx + ".compact.old")
    compact_text_index(spark, idx)
    assert not os.path.exists(idx + ".compact.old")
    assert [
        (r.doc_id, float(r.score))
        for r in text_index_topk(spark, idx, terms, k=10).collect()
    ] == want


def test_phrase_topk_matches_brute_force_and_prunes(spark, sf_dir, tmp_path):
    """Positional postings serve exact-sequence queries: phrase hits
    and counts must equal a brute-force scan over the raw token
    arrays, the scan must stay term-bucket-pruned, and the position
    payload must leave BM25 scoring untouched."""
    from geosparql_etl_spark.operators.retrieval import (
        append_to_text_index,
        phrase_topk,
        write_text_index,
    )

    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    idx = str(tmp_path / "bm25")
    write_text_index(d.where(F.col("doc_id") % 2 == 0), idx)
    append_to_text_index(d.where(F.col("doc_id") % 2 == 1), idx, epoch="a1")

    got = [
        (r.doc_id, r.n_phrase)
        for r in phrase_topk(spark, idx, ["query", "join"], k=20).collect()
    ]
    arr = F.filter(F.split(F.lower(F.col("text")), r"\s+"), lambda x: x != "")
    brute = [
        (r.doc_id, r.n)
        for r in d.select("doc_id", arr.alias("t"))
        .select(
            "doc_id",
            F.size(
                F.filter(
                    F.expr(
                        "transform(t, (x, i) -> CASE WHEN x = 'query' "
                        "AND i + 1 < size(t) AND t[i+1] = 'join' "
                        "THEN 1 ELSE 0 END)"
                    ),
                    lambda v: v == 1,
                )
            ).alias("n"),
        )
        .where(F.col("n") > 0)
        .orderBy(F.col("n").desc(), "doc_id")
        .limit(20)
        .collect()
    ]
    assert got == brute and got

    plan = (
        phrase_topk(spark, idx, ["query", "join"], k=20)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "PartitionFilters" in plan and "bucket" in plan


def test_proximity_topk_matches_brute_force(spark, sf_dir, tmp_path):
    """Windowed co-occurrence: qualifying-anchor counts must equal a
    brute-force scan over the raw token arrays."""
    from geosparql_etl_spark.operators.retrieval import (
        proximity_topk,
        write_text_index,
    )

    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    idx = str(tmp_path / "bm25")
    write_text_index(d, idx)
    got = [
        (r.doc_id, r.n_prox)
        for r in proximity_topk(
            spark, idx, ["query", "join"], window=3, k=20
        ).collect()
    ]
    arr = F.filter(F.split(F.lower(F.col("text")), r"\s+"), lambda x: x != "")
    brute = [
        (r.doc_id, r.n)
        for r in d.select("doc_id", arr.alias("t"))
        .select(
            "doc_id",
            F.size(
                F.filter(
                    F.expr(
                        "transform(t, (x, i) -> CASE WHEN x = 'query' AND "
                        "exists(sequence(greatest(0, i - 3), "
                        "least(size(t) - 1, i + 3)), "
                        "j -> t[j] = 'join') THEN 1 ELSE 0 END)"
                    ),
                    lambda v: v == 1,
                )
            ).alias("n"),
        )
        .where(F.col("n") > 0)
        .orderBy(F.col("n").desc(), "doc_id")
        .limit(20)
        .collect()
    ]
    assert got == brute and got


def test_phrase_search_rejects_pre_positional_epochs(
    spark, sf_dir, tmp_path
):
    """A legacy epoch written before the positional payload cannot
    answer phrase queries — the probe must fail LOUDLY with a rebuild
    hint, never silently drop the legacy docs (NULL positions) or die
    on a missing column. Compacting the mixed index drops positions
    entirely (they are unknowable for the legacy docs), after which
    phrase search still refuses while BM25 keeps serving; a rebuild
    restores phrase search."""
    import os
    import shutil

    import pytest

    from geosparql_etl_spark.operators.retrieval import (
        append_to_text_index,
        compact_text_index,
        phrase_topk,
        text_index_topk,
        write_text_index,
    )

    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    idx = str(tmp_path / "bm25")
    write_text_index(d.where(F.col("doc_id") < 30), idx)
    # simulate a legacy pre-positional epoch: strip pos from base
    base = os.path.join(idx, "postings", "epoch=base")
    legacy = spark.read.parquet(base).drop("pos")
    tmp = str(tmp_path / "legacy")
    legacy.write.mode("overwrite").partitionBy("bucket").parquet(tmp)
    shutil.rmtree(base)
    os.replace(tmp, base)
    append_to_text_index(d.where(F.col("doc_id") >= 30), idx, epoch="a1")

    with pytest.raises(ValueError, match="positional"):
        phrase_topk(spark, idx, ["query", "join"], k=5)
    # BM25 scoring is untouched by the missing payload
    assert text_index_topk(spark, idx, ["query"], k=5).count() > 0

    compact_text_index(spark, idx)
    with pytest.raises(ValueError, match="positional"):
        phrase_topk(spark, idx, ["query", "join"], k=5)
    assert text_index_topk(spark, idx, ["query"], k=5).count() > 0

    # rebuild restores phrase search (count() forces execution)
    shutil.rmtree(idx)
    write_text_index(d, idx)
    assert phrase_topk(spark, idx, ["query", "join"], k=5).count() >= 0


def test_phrase_search_respects_tombstones_and_as_of(spark, sf_dir, tmp_path):
    """The positional frame applies the same tombstone anti-join and
    as-of pin as BM25 serving: deleting a phrase-hit doc removes it
    from results, and a read pinned before the delete still sees it."""
    from geosparql_etl_spark.operators.retrieval import (
        delete_from_text_index,
        phrase_topk,
        write_text_index,
    )

    from geosparql_etl_spark.operators.retrieval import (
        append_to_text_index,
    )

    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    idx = str(tmp_path / "bm25")
    write_text_index(d, idx)                                   # seq 0
    base_view = [
        (r.doc_id, r.n_phrase)
        for r in phrase_topk(spark, idx, ["query", "join"], k=10).collect()
    ]
    assert base_view
    victim = base_view[0][0]
    append_to_text_index(
        d.limit(0), idx, epoch="a1"
    )                                                          # seq 1
    # delete issued while seq 1 is current (issued = 1)
    delete_from_text_index(spark, idx, [victim])
    latest = [
        (r.doc_id, r.n_phrase)
        for r in phrase_topk(spark, idx, ["query", "join"], k=10).collect()
    ]
    assert victim not in [i for i, _ in latest]
    # time travel: pinned at seq 0 (before the delete was issued),
    # the victim still serves
    pinned = [
        (r.doc_id, r.n_phrase)
        for r in phrase_topk(
            spark, idx, ["query", "join"], k=10, as_of_seq=0
        ).collect()
    ]
    assert pinned == base_view


def test_fsck_text_index_detects_each_corruption(spark, sf_dir, tmp_path):
    """fsck_text_index: clean index -> no findings; each staged
    corruption surfaces as its named check with the right severity."""
    import json
    import os
    import shutil

    from geosparql_etl_spark.operators.retrieval import (
        append_to_text_index,
        delete_from_text_index,
        fsck_text_index,
        write_text_index,
    )

    d = spark.read.parquet(f"{sf_dir}/documents.parquet").where(
        F.col("doc_id") < 60
    )
    idx = str(tmp_path / "bm25")
    write_text_index(d.where(F.col("doc_id") < 30), idx)
    append_to_text_index(d.where(F.col("doc_id") >= 30), idx, epoch="a1")
    delete_from_text_index(spark, idx, [3, 5])
    assert fsck_text_index(spark, idx) == []

    # orphan data dir (uncommitted epoch) -> info
    shutil.copytree(
        os.path.join(idx, "postings", "epoch=a1"),
        os.path.join(idx, "postings", "epoch=crash"),
    )
    checks = {f["check"]: f["severity"] for f in fsck_text_index(spark, idx)}
    assert checks == {"orphan_epoch": "info"}
    shutil.rmtree(os.path.join(idx, "postings", "epoch=crash"))

    # dangling ledger entry -> error
    with open(os.path.join(idx, "_ledger", "ghost.json"), "w") as fh:
        json.dump({"n_docs": 7, "sum_dl": 70, "seq": 9}, fh)
    checks = {f["check"]: f["severity"] for f in fsck_text_index(spark, idx)}
    assert checks.get("ledger_dangling") == "error"
    os.remove(os.path.join(idx, "_ledger", "ghost.json"))

    # stats mismatch -> error
    led = os.path.join(idx, "_ledger", "a1.json")
    entry = json.load(open(led))
    entry["n_docs"] += 1
    with open(led, "w") as fh:
        json.dump(entry, fh)
    checks = {f["check"]: f["severity"] for f in fsck_text_index(spark, idx)}
    assert checks.get("stats_mismatch") == "error"
    entry["n_docs"] -= 1
    with open(led, "w") as fh:
        json.dump(entry, fh)
    assert fsck_text_index(spark, idx) == []


def test_fsck_ivf_index_detects_each_corruption(spark, sf_dir, tmp_path):
    """fsck_ivf_index: clean index -> no findings; staged corruptions
    surface (uncommitted epoch, dangling ledger, out-of-range cell)."""
    import json
    import os
    import shutil

    from geosparql_etl_spark.operators.similarity import (
        delete_from_ivf_index,
        fsck_ivf_index,
        lloyd_train,
        write_ivf_index,
    )

    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet").where(
        F.col("vec_id") < 100
    )
    trained = lloyd_train(e, "embedding", dim=64, n_cells=4, rounds=2)
    idx = str(tmp_path / "ivf")
    write_ivf_index(e.where(F.col("vec_id") < 50), idx, dim=64,
                    n_cells=4, centroids=trained, epoch="base")
    write_ivf_index(e.where(F.col("vec_id") >= 50), idx, dim=64,
                    n_cells=4, centroids=trained, epoch="a1")
    delete_from_ivf_index(spark, idx, [1])
    assert fsck_ivf_index(spark, idx) == []

    # uncommitted epoch (no _SUCCESS) -> info
    shutil.copytree(
        os.path.join(idx, "epoch=a1"), os.path.join(idx, "epoch=crash")
    )
    os.remove(os.path.join(idx, "epoch=crash", "_SUCCESS"))
    checks = {f["check"]: f["severity"] for f in fsck_ivf_index(spark, idx)}
    assert checks == {"uncommitted_epoch": "info"}
    shutil.rmtree(os.path.join(idx, "epoch=crash"))

    # dangling ledger -> error
    with open(os.path.join(idx, "_ledger", "ghost.json"), "w") as fh:
        json.dump({"seq": 9}, fh)
    checks = {f["check"]: f["severity"] for f in fsck_ivf_index(spark, idx)}
    assert checks.get("ledger_dangling") == "error"
    os.remove(os.path.join(idx, "_ledger", "ghost.json"))

    # out-of-range cell vs quantizer -> error
    shutil.copytree(
        os.path.join(idx, "epoch=a1", "ivf_cell=0"),
        os.path.join(idx, "epoch=a1", "ivf_cell=9"),
    )
    checks = {f["check"]: f["severity"] for f in fsck_ivf_index(spark, idx)}
    assert checks.get("cell_out_of_range") == "error"
    shutil.rmtree(os.path.join(idx, "epoch=a1", "ivf_cell=9"))
    assert fsck_ivf_index(spark, idx) == []
