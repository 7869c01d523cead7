"""Round-14 optimization internals: pure-Column-tree memoization
(`memo_tree`), narrow-input spreading (`spread`), and the memoized IVF
probe / PQ-LUT builders in operators/similarity.

These are results-preserving plan-build optimizations; the tests pin
the two properties the optimizations rely on:

  1. memoization keys uniquely determine the tree — two DIFFERENT
     quantizers / codebooks must never alias to one memo entry (the
     numpy-repr elision trap: `repr(ndarray)` abbreviates long arrays
     with '...', so keys must be built from tolist());
  2. the memoized tree is context-free — reusing one tree across two
     different DataFrames computes exactly what a fresh build would.
"""

import numpy as np
from pyspark.sql import functions as F

from geosparql_etl_spark.functions.geometry import _TREE_MEMO, memo_tree
from geosparql_etl_spark.operators.partitioning import spread
from geosparql_etl_spark.operators.similarity import (
    _probe_frame,
    pq_reconstruct,
)


def test_memo_tree_hit_and_miss(spark):
    calls = []

    def build():
        calls.append(1)
        return F.col("x") + F.lit(1)

    key = ("test_memo_tree_hit_and_miss", "x")
    _TREE_MEMO.pop(key, None)
    c1 = memo_tree(key, build)
    c2 = memo_tree(key, build)
    assert c1 is c2, "same key must return the identical Column object"
    assert len(calls) == 1, "build() must run once per key"
    key2 = ("test_memo_tree_hit_and_miss", "y")
    _TREE_MEMO.pop(key2, None)
    memo_tree(key2, lambda: F.col("y") + F.lit(1))
    assert len(calls) == 1


def test_memo_tree_is_context_free(spark):
    """One memoized tree evaluates correctly in two different frames."""
    key = ("test_memo_tree_ctx_free", "v")
    _TREE_MEMO.pop(key, None)
    tree = memo_tree(key, lambda: (F.col("v") * 2).alias("w"))
    df1 = spark.createDataFrame([(1,), (2,)], "v int")
    df2 = spark.createDataFrame([(10,), (20,)], "v int")
    assert sorted(r.w for r in df1.select(tree).collect()) == [2, 4]
    assert sorted(r.w for r in df2.select(tree).collect()) == [20, 40]


def test_spread_preserves_rows_and_widens(spark, tmp_path):
    p = str(tmp_path / "one_file")
    spark.range(100).coalesce(1).write.mode("overwrite").parquet(p)
    df = spark.read.parquet(p)
    out = spread(df, target=4)
    assert sorted(r.id for r in out.collect()) == list(range(100))
    assert out.rdd.getNumPartitions() == 4


def test_spread_noop_on_wide_input(spark, tmp_path):
    p = str(tmp_path / "wide")
    spark.range(100).repartition(8).write.mode("overwrite").parquet(p)
    df = spark.read.parquet(p)
    out = spread(df, target=4)
    # >= target/2 files: spread must not inject a shuffle
    assert out is df


def test_probe_frame_memo_distinguishes_quantizers(spark):
    """Two different centroid sets must probe different cells — the
    memo key is built from the full tolist() of the centroids, so
    near-identical quantizers never collide."""
    q = spark.createDataFrame([("q1", [1.0, 0.0])], "vec_id string, embedding array<double>")
    cents_a = np.array([[1.0, 0.0], [0.0, 1.0]])
    cents_b = np.array([[0.0, 1.0], [1.0, 0.0]])  # swapped order
    fa = _probe_frame(q, "vec_id", "embedding", 2, cents_a, 1)
    fb = _probe_frame(q, "vec_id", "embedding", 2, cents_b, 1)
    cell_a = fa.collect()[0]["__cell"]
    cell_b = fb.collect()[0]["__cell"]
    assert cell_a == 0 and cell_b == 1

    # repeated build with the SAME quantizer is a memo hit (same plan)
    fa2 = _probe_frame(q, "vec_id", "embedding", 2, cents_a, 1)
    assert fa2.collect()[0]["__cell"] == 0


def test_pq_reconstruct_memo_distinguishes_codebooks(spark):
    """LUT memo keyed on the codebook VALUES (tolist, not numpy repr):
    two long codebooks differing only in elided middle entries must
    reconstruct differently."""
    k, sub = 64, 2
    books_a = np.zeros((1, k, sub))
    books_b = np.zeros((1, k, sub))
    # differ only at entry 32 — inside numpy repr's '...' elision zone
    books_a[0, 32] = [1.0, 2.0]
    books_b[0, 32] = [3.0, 4.0]
    df = spark.createDataFrame([([32],)], "code array<int>")
    ra = df.select(
        pq_reconstruct(F.col("code"), dim=sub, m=1, k=k, codebooks=books_a).alias("v")
    ).collect()[0]["v"]
    rb = df.select(
        pq_reconstruct(F.col("code"), dim=sub, m=1, k=k, codebooks=books_b).alias("v")
    ).collect()[0]["v"]
    assert list(ra) == [1.0, 2.0]
    assert list(rb) == [3.0, 4.0]


def test_cosine_topk_candidate_scan_matches_legacy_plan(spark):
    """The round-14 cosine_topk candidate scan (numpy per-batch top-k
    prefilter + exact fold on survivors) must reproduce the legacy
    cross-join plan exactly — including duplicate corpus ids (each ROW
    scored once), a null corpus vector (legacy scores it 0.0), exact
    score ties (value-threshold cut keeps all), and multi-batch cuts
    (tiny Arrow batches force per-batch thresholds)."""
    from pyspark.sql import Window

    from geosparql_etl_spark.operators.similarity import (
        cosine_topk,
        pairwise_cosine,
    )

    rows = []
    for i in range(40):
        rows.append((i, [float((i % 7) - 3), float(i % 5), 1.0]))
    rows.append((7, [4.0, 0.0, 1.0]))      # duplicate id, different vector
    rows.append((41, None))                 # null vector -> legacy 0.0
    rows.append((42, [1.0, 1.0, 1.0]))      # exact tie pair...
    rows.append((43, [1.0, 1.0, 1.0]))      # ...same vector, both rank
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    q = df.where(F.col("vec_id") < 3)

    prev = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch")
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "8")
    try:
        got = cosine_topk(df, q, k=5, dim=3).collect()
    finally:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", prev)

    scored = pairwise_cosine(q, df, dim=3)
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine_sim"), F.asc("neighbor_id")
    )
    want = (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= 5)
        .collect()
    )
    key = lambda r: (r.query_id, r.rank)  # noqa: E731
    got_m = {key(r): (r.neighbor_id, round(r.cosine_sim, 12)) for r in got}
    want_m = {key(r): (r.neighbor_id, round(r.cosine_sim, 12)) for r in want}
    assert got_m == want_m and len(got_m) == 15


def test_cosine_topk_scan_nan_and_invalid_rows(spark):
    """Round-15 edge semantics (the round-14 advice findings): a
    NaN-component corpus vector ranks FIRST (Spark desc treats NaN as
    greatest), a wrong-length vector scores NULL and ranks last, and a
    flood of invalid rows must never lift the per-batch cut above true
    top-k rows with NEGATIVE cosines."""
    from pyspark.sql import Window

    from geosparql_etl_spark.operators.similarity import (
        cosine_topk,
        pairwise_cosine,
    )

    rows = [(1, [float("nan"), 1.0])]
    rows += [(10 + i, [2.0, 3.0, 4.0]) for i in range(8)]  # wrong length
    # all real cosines NEGATIVE vs the query
    rows += [(30 + i, [-1.0, -float(i + 1)]) for i in range(6)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    q = spark.createDataFrame(
        [(100, [1.0, 1.0])], "vec_id long, embedding array<float>"
    )

    prev = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch")
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "64")
    try:
        got = cosine_topk(df, q, k=4, dim=2).collect()
    finally:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", prev)

    scored = pairwise_cosine(q, df, dim=2)
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine_sim"), F.asc("neighbor_id")
    )
    want = (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= 4)
        .collect()
    )
    import math

    def canon(r):
        v = r.cosine_sim
        v = "nan" if (v is not None and math.isnan(v)) else v
        return (r.query_id, r.rank, r.neighbor_id, v)

    assert sorted(map(canon, got)) == sorted(map(canon, want))
    # the NaN row must be rank 1 (legacy semantics)
    assert [r.neighbor_id for r in want if r.rank == 1] == [1]
    assert any(r.neighbor_id == 1 and r.rank == 1 for r in got)


def test_cosine_topk_duplicate_query_ids_fall_back(spark):
    """Two query ROWS sharing an id must take the legacy cross-join
    plan (the scan would mix their candidate sets per window
    partition) — pinned by plan shape AND by values."""
    from geosparql_etl_spark.operators.similarity import cosine_topk

    df = spark.createDataFrame(
        [(i, [float(i), 1.0]) for i in range(10)],
        "vec_id long, embedding array<float>",
    )
    q = spark.createDataFrame(
        [(1, [1.0, 0.0]), (1, [0.0, 1.0])],
        "vec_id long, embedding array<float>",
    )
    plan = cosine_topk(df, q, k=3, dim=2)
    assert "mapInPandas" not in plan._jdf.queryExecution().analyzed().toString()
    # legacy cross-join semantics: both query rows share one window
    # partition (same id), so exactly k rows come back for id 1
    assert plan.count() == 3


def test_pq_and_ivfpq_scan_match_legacy_plan(spark, sf_dir):
    """The round-15 ADC codes scan (LUT prefilter + bit-exact seq-fold
    distances) must reproduce the legacy reconstruct-and-fold plans
    exactly, including the rounded approx_d2 OUTPUT values (pq_topk)
    and the composed shortlist -> exact re-score (ivf_pq_topk)."""
    import geosparql_etl_spark.operators.similarity as sim

    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    q = e.where(F.col("vec_id") < 6)
    new_pq = sorted(tuple(r) for r in sim.pq_topk(e, q, kq=5).collect())
    new_ivf = sorted(
        tuple(r)
        for r in sim.ivf_pq_topk(
            e, q, kq=4, shortlist=15, n_probe=3, m=8, k=16
        ).collect()
    )
    orig = sim._adc_queries
    sim._adc_queries = lambda *a, **kw: None
    try:
        old_pq = sorted(tuple(r) for r in sim.pq_topk(e, q, kq=5).collect())
        old_ivf = sorted(
            tuple(r)
            for r in sim.ivf_pq_topk(
                e, q, kq=4, shortlist=15, n_probe=3, m=8, k=16
            ).collect()
        )
    finally:
        sim._adc_queries = orig
    assert new_pq == old_pq and len(new_pq) > 0
    assert new_ivf == old_ivf and len(new_ivf) > 0


def test_lsh_scorer_nan_pair_kept(spark):
    """A co-bucketed NaN-component pair must survive the scorer with a
    NaN cosine (Spark's `cosine >= t` is TRUE for NaN — NaN compares
    greatest; the legacy re-score join kept such pairs). Unit-level:
    the banded hash puts a NaN vector in the all-zero-bits bucket, so
    the pair is staged into one group directly."""
    import math

    import pandas as pd

    from geosparql_etl_spark.operators.similarity import (
        _SCAN_NAN,
        _bucket_pair_scorer,
        lsh_threshold_pairs,
    )

    pdf = pd.DataFrame(
        {
            "__id": [1, 2, 3],
            "__vec": [
                np.ones(4),
                np.array([np.nan, 1.0, 1.0, 1.0]),
                np.ones(4),
            ],
            "__ch": [0, 0, 0],
            "__bk": [5, 5, 5],
            "__ci": [0, 0, 0],
            "__cj": [0, 0, 0],
        }
    )
    out = _bucket_pair_scorer(0.9, "long")(pdf)
    got = {
        (a, b): f
        for a, b, f in zip(out["id_a"], out["id_b"], out["__flag"])
    }
    assert got[(1, 3)] == 0          # exact value, passes threshold
    assert got[(1, 2)] == _SCAN_NAN  # NaN pair kept, flagged
    assert got[(2, 3)] == _SCAN_NAN
    # end-to-end: a NaN vector in the corpus neither crashes the
    # banded path nor perturbs the clean pairs
    rows = [
        (1, [1.0] * 64),
        (2, [float("nan")] + [1.0] * 63),
        (3, [1.0] * 64),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    pairs = {
        (r.id_a, r.id_b): r.cosine_sim
        for r in lsh_threshold_pairs(
            df, threshold=0.9, dim=64, bands=8, bits_per_band=2
        ).collect()
    }
    assert (1, 3) in pairs and pairs[(1, 3)] >= 0.9
    for v in pairs.values():
        assert v is not None and (v >= 0.9 or math.isnan(v))


def test_cell_max_lower_cosine_matches_legacy_join(spark, sf_dir):
    """The SemDeDup within-cell max-lower-cosine scorer (d18/llm25)
    must equal the legacy cell self-join + per-pair rounded fold +
    max aggregate bit for bit, including under forced multi-chunking."""
    import geosparql_etl_spark.operators.similarity as sim

    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet").limit(300)
    c = sim.with_ivf_cell(e, "embedding", 64, 8).select(
        "vec_id", "embedding", "ivf_cell"
    )
    a = c.select(
        F.col("vec_id").alias("ia"), F.col("embedding").alias("va"), "ivf_cell"
    )
    b = c.select(
        F.col("vec_id").alias("ib"), F.col("embedding").alias("vb"), "ivf_cell"
    )
    denom = sim.l2_norm(F.col("va"), 64) * sim.l2_norm(F.col("vb"), 64)
    rc = F.round(
        F.when(denom > 0, sim.dot(F.col("va"), F.col("vb"), 64) / denom)
        .otherwise(F.lit(0.0)),
        6,
    )
    want = sorted(
        tuple(r)
        for r in (
            a.join(b, "ivf_cell")
            .where(F.col("ib") < F.col("ia"))
            .select(F.col("ia").alias("vec_id"), rc.alias("rc"))
            .groupBy("vec_id")
            .agg(F.max("rc").alias("max_lower_cos"))
        ).collect()
    )
    got = sorted(
        tuple(r)
        for r in sim.cell_max_lower_cosine(
            c, "vec_id", "embedding", "ivf_cell", 64
        ).collect()
    )
    assert got == want and len(got) > 0
    import pytest as _pytest

    mp = _pytest.MonkeyPatch()
    try:
        mp.setattr(sim, "_LSH_SCORE_CHUNK", 5)
        multi = sorted(
            tuple(r)
            for r in sim.cell_max_lower_cosine(
                c, "vec_id", "embedding", "ivf_cell", 64
            ).collect()
        )
    finally:
        mp.undo()
    assert multi == want


def _nan_safe(rows):
    import math

    def norm(v):
        return "NaN" if isinstance(v, float) and math.isnan(v) else v

    return sorted(tuple(norm(v) for v in r) for r in rows)


def test_probe_topk_scan_matches_legacy_join(spark, sf_dir, tmp_path):
    """The round-15 probe cell-cosine scan (exact seq-order cosine
    emitted inside a MapInPandas pass over the celled corpus) must
    reproduce the legacy broadcast cell-join plan exactly: carry_cols,
    persisted STORED norms used verbatim, NaN-component corpus vectors
    (Spark NaN-greatest: denom NaN > 0 is true, cosine NaN ranks
    first), and duplicate query ids falling back to the legacy join."""
    import pytest as _pytest

    import geosparql_etl_spark.operators.similarity as sim

    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    el = e.withColumn("label", (F.col("vec_id") % 3).cast("string"))
    q = e.where(F.col("vec_id") < 8)

    def ab(fn):
        new = _nan_safe(fn().collect())
        mp = _pytest.MonkeyPatch()
        try:
            mp.setattr(sim, "_cell_cosine_scan", lambda *a, **kw: None)
            old = _nan_safe(fn().collect())
        finally:
            mp.undo()
        return new, old

    n1, o1 = ab(
        lambda: sim.ivf_topk(
            el, q, k=6, dim=64, n_cells=16, n_probe=2, carry_cols=("label",)
        )
    )
    assert n1 == o1 and len(n1) > 0

    idx = str(tmp_path / "probe_scan_idx")
    sim.write_ivf_index(e, idx, dim=64, n_cells=16)
    n2, o2 = ab(
        lambda: sim.ivf_index_topk(
            spark, idx, q, k=7, dim=64, n_cells=16, n_probe=3
        )
    )
    assert n2 == o2 and len(n2) > 0

    # NaN corpus vector: scan must carry the NaN pair exactly like the
    # legacy join (NaN cosine sorts FIRST under desc — dropping it
    # would promote a different neighbor)
    rows = [(i, [float(i % 7 + 1)] * 64) for i in range(1, 30)]
    rows.append((30, [float("nan")] + [1.0] * 63))
    nf = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    n3, o3 = ab(
        lambda: sim.ivf_topk(
            nf, nf.where(F.col("vec_id") <= 3), k=5, dim=64, n_cells=4,
            n_probe=4,
        )
    )
    assert n3 == o3 and len(n3) > 0
    assert any("NaN" in r for r in n3), "NaN pair must survive the scan"

    # duplicate query ids with different vectors: the scan must refuse
    # (legacy join scores against BOTH rows; the scan cannot)
    dq = q.union(q.withColumn("embedding", F.reverse(F.col("embedding"))))
    n4, o4 = ab(
        lambda: sim.ivf_topk(e, dq, k=4, dim=64, n_cells=16, n_probe=2)
    )
    assert n4 == o4 and len(n4) > 0
