"""Unit tests for corpus term stats (textrank), text normalization,
and the scale-safe global ranking operator."""

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from geosparql_etl_spark.functions.textstats import normalize_text
from geosparql_etl_spark.operators.partitioning import global_rank
from geosparql_etl_spark.operators.textrank import (
    boilerplate_ratio,
    tfidf_top_terms,
)


def test_normalize_text(spark):
    df = spark.createDataFrame(
        [(1, "  Hello\t\tWorld \n"), (2, "a\x01b   c"), (3, "")],
        ["id", "text"],
    )
    got = {
        r.id: r.norm
        for r in df.select("id", normalize_text(F.col("text")).alias("norm")).collect()
    }
    assert got == {1: "hello world", 2: "a b c", 3: ""}


def test_tfidf_top_terms_hand_computed(spark):
    import math

    docs = spark.createDataFrame(
        [
            (1, "apple apple banana"),
            (2, "banana cherry"),
            (3, "cherry cherry cherry date"),
        ],
        ["doc_id", "text"],
    )
    out = {
        (r.doc_id, r.term): (r.score, r.rank)
        for r in tfidf_top_terms(docs, "doc_id", "text", k=3).collect()
    }

    def score(tf, df, n=3):
        return round(tf * (math.log((n + 1) / (df + 1)) + 1.0), 6)

    # doc 1: apple tf=2 df=1, banana tf=1 df=2
    assert out[(1, "apple")] == (score(2, 1), 1)
    assert out[(1, "banana")] == (score(1, 2), 2)
    # doc 3: cherry tf=3 df=2 outranks date tf=1 df=1
    assert out[(3, "cherry")] == (score(3, 2), 1)
    assert out[(3, "date")] == (score(1, 1), 2)


def test_tfidf_k_limits_rows_per_doc(spark):
    docs = spark.createDataFrame(
        [(1, "a b c d e f g h"), (2, "a b")], ["doc_id", "text"]
    )
    counts = (
        tfidf_top_terms(docs, "doc_id", "text", k=3)
        .groupBy("doc_id")
        .count()
        .collect()
    )
    assert {r.doc_id: r["count"] for r in counts} == {1: 3, 2: 2}


def test_boilerplate_ratio(spark):
    # docs 1 and 2 share the shingle "the quick fox"; doc 3 is unique
    docs = spark.createDataFrame(
        [
            (1, "the quick fox jumps"),
            (2, "see the quick fox"),
            (3, "entirely different words here"),
        ],
        ["doc_id", "text"],
    )
    got = {
        r.doc_id: (r.n_shingles, r.boilerplate_ratio)
        for r in boilerplate_ratio(docs, "doc_id", "text", k=3).collect()
    }
    # doc 1 shingles: {the quick fox, quick fox jumps} -> 1 of 2 shared
    assert got[1] == (2, 0.5)
    assert got[2] == (2, 0.5)
    assert got[3] == (2, 0.0)


def test_global_rank_matches_global_window(spark):
    import random

    rng = random.Random(7)
    rows = [(i, rng.randrange(0, 1000)) for i in range(2000)]
    df = spark.createDataFrame(rows, ["id", "v"]).repartition(8)
    bucket = F.floor(F.col("v") / F.lit(100.0)).cast("bigint")
    got = global_rank(df, [F.asc("v"), F.asc("id")], bucket)
    want = df.withColumn(
        "rank", F.row_number().over(Window.orderBy("v", "id"))
    )
    assert (
        got.select("id", "rank")
        .subtract(want.select("id", "rank"))
        .count()
        == 0
    )
    assert got.count() == 2000


def test_global_rank_plan_has_no_global_corpus_window(spark):
    """The corpus-sized window must be partitioned by bucket; only the
    tiny offsets aggregate may sort on a single partition."""
    df = spark.range(100).select(
        F.col("id"), (F.col("id") % 17).alias("v")
    )
    bucket = F.floor(F.col("v") / F.lit(4.0)).cast("bigint")
    plan = (
        global_rank(df, [F.asc("v"), F.asc("id")], bucket)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # every Window over the full input must carry a partition spec;
    # the unpartitioned one exists only above the bucket-count agg
    windows = [ln for ln in plan.split("\n") if "Window" in ln and "windowspecdefinition" in ln]
    assert windows, plan
    unpartitioned = [w for w in windows if "windowspecdefinition(__bucket" not in w]
    for w in unpartitioned:
        # the offsets window sorts __bucket rows (post-aggregate), so
        # its ordering key must be the bucket itself
        assert "__bucket" in w, w


def test_degenerate_text_inputs(spark):
    """Null/empty text: null normalizes to null and drops out of term
    stats (no tokens); empty text keeps the whole-text fallback shingle
    (matching d04's shingler) but contributes no terms."""
    docs = spark.createDataFrame(
        [(1, None), (2, ""), (3, "hello world hello")],
        "doc_id long, text string",
    )
    norm = {
        r.doc_id: r.n
        for r in docs.select(
            "doc_id", normalize_text(F.col("text")).alias("n")
        ).collect()
    }
    assert norm == {1: None, 2: "", 3: "hello world hello"}

    tf = tfidf_top_terms(docs)
    assert {r.doc_id for r in tf.collect()} == {3}

    br = {r.doc_id for r in boilerplate_ratio(docs).collect()}
    assert br == {2, 3}


def test_bigram_surprisal_known_values(spark):
    """Corpus 'a b a b' + 'x': c(a,b)=2, c(b,a)=1, c1(a)=2, c1(b)=1,
    V=3, alpha=0.5 -> p(a->b)=2.5/3.5, p(b->a)=1.5/2.5; the
    single-token doc has no bigrams and drops out."""
    import math

    from pyspark.sql import Row

    from geosparql_etl_spark.operators.textrank import bigram_surprisal

    d = spark.createDataFrame(
        [Row(doc_id=1, text="a b a b"), Row(doc_id=2, text="x")]
    )
    rows = {r["doc_id"]: r for r in bigram_surprisal(d).collect()}
    assert set(rows) == {1}
    expected = -(2 * math.log(2.5 / 3.5) + math.log(1.5 / 2.5)) / 3
    assert rows[1]["n_bigrams"] == 3
    assert abs(rows[1]["mean_bg_surprisal"] - round(expected, 4)) < 1e-9
