"""Bucketed-layout co-located join (charter: "bucketing for co-located
joins").

Writing both fact tables bucketed by the join key lets Spark join them
with NO shuffle exchange on either side — at 100 TB this converts the
flagship J1 join's two full-table shuffles into local sort-merge per
bucket. The test asserts the plan property (no ShuffleExchange above
the scans), not just the row counts.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def warehouse(spark, sf_dir, tmp_path_factory):
    # explicit per-table paths: warehouse.dir is a static conf that
    # cannot change on a live session
    wh = str(tmp_path_factory.mktemp("warehouse"))
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    for name, df, key in [("li_b", li, "l_orderkey"), ("o_b", o, "o_orderkey")]:
        spark.sql(f"DROP TABLE IF EXISTS {name}")
        (
            df.write.bucketBy(8, key)
            .sortBy(key)
            .option("path", f"{wh}/{name}")
            .mode("overwrite")
            .saveAsTable(name)
        )
    return wh


def test_bucketed_join_has_no_shuffle(spark, warehouse):
    li = spark.table("li_b")
    o = spark.table("o_b")
    # force a shuffle-family join: at test scale AQE would broadcast,
    # which hides the property under test (bucket co-location)
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = li.join(o, li.l_orderkey == o.o_orderkey).groupBy(
            "o_orderpriority"
        ).agg(F.count("*").alias("n"))

        joined.collect()
        plan = joined._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    # the JOIN itself must not shuffle either bucketed side; the later
    # groupBy aggregation legitimately exchanges on its own key
    join_part = plan.split("HashAggregate")[-1]
    assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan
    assert "Exchange hashpartitioning(l_orderkey" not in plan
    assert "Exchange hashpartitioning(o_orderkey" not in plan

    # counts equal the unbucketed join
    want = (
        spark.read.parquet(f"{spark.conf.get('gsel.test.sf_dir', '/root/testdata/sf0.001')}/lineitem.parquet")
        .join(
            spark.read.parquet(
                f"{spark.conf.get('gsel.test.sf_dir', '/root/testdata/sf0.001')}/orders.parquet"
            ),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .count()
    )
    got = li.join(o, li.l_orderkey == o.o_orderkey).count()
    assert got == want


# --- bucketed embedding near-dup (charter: dedup must be bucketed) ----------


def test_lsh_threshold_pairs_matches_exact_and_has_no_cross_join(spark, sf_dir):
    """The banded candidate join + exact re-score must equal the
    all-pairs brute force on the test embeddings (deterministic seeded
    planes), and its plan must contain no cross-join operator."""
    from geosparql_etl_spark.operators.similarity import (
        lsh_threshold_pairs,
        pairwise_cosine,
    )

    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    banded = lsh_threshold_pairs(e, threshold=0.4, dim=64, bands=48, bits_per_band=4)
    brute = pairwise_cosine(e, e, left_alias="id_a", right_alias="id_b", dim=64).where(
        (F.col("id_a") < F.col("id_b")) & (F.col("cosine_sim") >= 0.4)
    )
    got = sorted((r.id_a, r.id_b, round(r.cosine_sim, 9)) for r in banded.collect())
    want = sorted((r.id_a, r.id_b, round(r.cosine_sim, 9)) for r in brute.collect())
    assert got == want and len(got) > 0

    plan = banded._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_lsh_scorer_multi_chunk_matches_single_chunk(spark, sf_dir, monkeypatch):
    """The round-14 within-bucket vectorized scorer splits big buckets
    into chunk PAIRS so one grouped-map task never holds a whole
    bucket. Bench-scale buckets fit one chunk, so force multi-chunk
    grouping with a tiny cap and require the pair set to be unchanged
    (every within-bucket pair must still be scored exactly once per
    band, whatever the chunking)."""
    from geosparql_etl_spark.operators import similarity as sim

    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet").limit(300)
    single = sorted(
        (r.id_a, r.id_b, round(r.cosine_sim, 9))
        for r in sim.lsh_threshold_pairs(
            e, threshold=0.4, dim=64, bands=8, bits_per_band=4
        ).collect()
    )
    monkeypatch.setattr(sim, "_LSH_SCORE_CHUNK", 7)
    multi = sorted(
        (r.id_a, r.id_b, round(r.cosine_sim, 9))
        for r in sim.lsh_threshold_pairs(
            e, threshold=0.4, dim=64, bands=8, bits_per_band=4
        ).collect()
    )
    assert multi == single and len(single) > 0


def test_embedding_neardup_lsh_equals_exact(spark, sf_dir):
    from geosparql_etl_spark.operators.similarity import embedding_neardup

    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    lsh = embedding_neardup(e, threshold=0.4, dim=64, mode="lsh",
                            bands=48, bits_per_band=4)
    exact = embedding_neardup(e, threshold=0.4, dim=64, mode="exact")
    assert sorted(map(tuple, lsh.collect())) == sorted(map(tuple, exact.collect()))


def test_ivf_partitioned_layout_prunes_cells(spark, tmp_path):
    """SCALE.md claims the IVF scale path is 'corpus written partitioned
    by cell, probes read only matching partitions'. Demonstrate it:
    write embeddings partitionBy(ivf_cell), read with a cell filter,
    and assert the scan plan prunes to the probed partitions."""
    import random

    from pyspark.sql import Row
    from pyspark.sql import functions as F

    from geosparql_etl_spark.operators.similarity import with_ivf_cell

    rng = random.Random(9)
    rows = [
        Row(vec_id=i, embedding=[rng.uniform(-1, 1) for _ in range(8)])
        for i in range(200)
    ]
    e = spark.createDataFrame(rows)
    out = str(tmp_path / "ivf_layout")
    with_ivf_cell(e, "embedding", dim=8, n_cells=4).write.partitionBy(
        "ivf_cell"
    ).parquet(out)

    probed = spark.read.parquet(out).where(F.col("ivf_cell").isin(0, 1))
    plan = probed._jdf.queryExecution().executedPlan().toString()
    # partition pruning shows up as PartitionFilters on the scan, and
    # the count only covers the probed cells
    assert "PartitionFilters" in plan and "ivf_cell" in plan.split(
        "PartitionFilters"
    )[1][:200], plan
    full = spark.read.parquet(out)
    n_probed = probed.count()
    n_full = full.count()
    n_expected = full.where(F.col("ivf_cell").isin(0, 1)).count()
    assert n_probed == n_expected and n_full == 200 and 0 < n_probed < n_full


def test_bucketed_fingerprint_corpus_joins_batch_without_corpus_shuffle(
    spark, sf_dir, tmp_path_factory
):
    """SCALE.md's llm06 claim: 'at 100 TB the corpus fingerprint set is
    a bucketed table the batch join co-locates with'. Demonstrate it:
    corpus fingerprints stored bucketBy(fp); an incoming batch
    anti-joins against them with NO exchange on the corpus side (the
    batch side legitimately shuffles — it is batch-sized)."""
    from geosparql_etl_spark.functions.textstats import fingerprint64

    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    corpus_fp = d.where(F.col("doc_id") >= 50).select(
        fingerprint64(F.col("text")).alias("corpus_fp")
    ).dropDuplicates()
    wh = str(tmp_path_factory.mktemp("fp_warehouse"))
    spark.sql("DROP TABLE IF EXISTS corpus_fp_b")
    (
        corpus_fp.write.bucketBy(8, "corpus_fp")
        .sortBy("corpus_fp")
        .option("path", f"{wh}/corpus_fp_b")
        .mode("overwrite")
        .saveAsTable("corpus_fp_b")
    )

    batch = d.where(F.col("doc_id") < 50).select(
        "doc_id", fingerprint64(F.col("text")).alias("fp")
    )
    corpus = spark.table("corpus_fp_b")
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        fresh = batch.join(
            corpus, batch.fp == corpus.corpus_fp, "left_anti"
        )
        fresh.collect()
        plan = fresh._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    assert "Exchange hashpartitioning(corpus_fp" not in plan
    assert "Exchange hashpartitioning(fp" in plan  # the batch side only

    # semantics: anti-join equals the unbucketed computation
    want = batch.join(
        corpus_fp.select(F.col("corpus_fp").alias("fp")), "fp", "left_anti"
    ).count()
    assert fresh.count() == want
