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
