"""Argmax (A1), hashing (H1), text (T1-T9), textstats unit tests."""

import hashlib

from pyspark.sql import Row
from pyspark.sql import functions as F
from pyspark.sql import types as T

from geosparql_etl_spark.functions import hashing as H
from geosparql_etl_spark.functions import text as TX
from geosparql_etl_spark.functions import textstats as TS
from geosparql_etl_spark.operators.argmax import dominant_entry

MEAS_SCHEMA = T.StructType(
    [T.StructField("m", T.MapType(T.StringType(), T.DoubleType()))]
)


def _dom(spark, m):
    df = spark.createDataFrame([(m,)], MEAS_SCHEMA)
    return df.select(dominant_entry(F.col("m")).alias("d")).first()["d"]


def test_argmax_basic(spark):
    d = _dom(spark, {"prob_a": 0.2, "prob_b": 0.7, "prob_c": 0.1})
    assert (d["class"], d["prob"]) == ("b", 0.7)


def test_argmax_ignores_non_prefixed(spark):
    d = _dom(spark, {"nr_of_cells": 99.0, "prob_a": 0.1})
    assert (d["class"], d["prob"]) == ("a", 0.1)


def test_argmax_first_max_wins_on_tie(spark):
    # strict '>' keeps the earlier entry (json-etl:56-58). Entry order is
    # the map's stored order — JSON scans and map literals preserve the
    # document/argument order (Python dicts via createDataFrame do NOT,
    # they round-trip through a JVM hash map, so we pin order with SQL).
    df = spark.sql(
        "SELECT map('prob_x', 0.5d, 'prob_y', 0.5d) AS m"
    )
    d = df.select(dominant_entry(F.col("m")).alias("d")).first()["d"]
    assert d["class"] == "x"


def test_argmax_empty_and_null(spark):
    d = _dom(spark, {})
    assert d["class"] is None and d["prob"] == 0.0
    d = _dom(spark, None)
    assert d["class"] is None and d["prob"] == 0.0


def test_argmax_zero_probs_yield_null(spark):
    # values must exceed 0.0 to win (max_prob starts at 0.0, strict >)
    d = _dom(spark, {"prob_a": 0.0})
    assert d["class"] is None


def test_sha256_parity_with_hashlib(spark):
    ids = ["TCGA-AB-1234", "x", ""]
    df = spark.createDataFrame([(i,) for i in ids], "id string")
    got = {r["id"]: r["h"] for r in df.select("id", H.sha256_id(F.col("id")).alias("h")).collect()}
    for i in ids:
        assert got[i] == hashlib.sha256(i.encode()).hexdigest()


def test_md5_long_range(spark):
    df = spark.createDataFrame([("abc",)], "s string")
    v = df.select(H.md5_long(F.col("s")).alias("v")).first()["v"]
    assert 0 <= v < 2**60


def test_extract_image_id(spark):
    df = spark.createDataFrame(
        [Row(f="TCGA-AB-1234-01Z.someuuid.geojson"), Row(f="plain.geojson")]
    )
    out = [r["i"] for r in df.select(TX.extract_image_id(F.col("f")).alias("i")).collect()]
    assert out == ["TCGA-AB-1234-01Z", "plain"]


def test_patch_metadata_parse_and_fallback(spark):
    df = spark.createDataFrame(
        [Row(f="24001_72001_4000_4000_0.2325_1-features.csv"), Row(f="weird-name.csv")]
    )
    rows = df.select(TX.patch_metadata(F.col("f")).alias("p")).collect()
    good, bad = rows[0]["p"], rows[1]["p"]
    assert (good["x"], good["y"], good["width"], good["height"]) == (
        24001,
        72001,
        4000,
        4000,
    )
    assert (bad["x"], bad["y"], bad["width"], bad["height"]) == (0, 0, 40000, 40000)
    assert bad["base_name"] == "weird-name"


def test_iso_utc_seconds_precision(spark):
    df = spark.createDataFrame([("2024-05-01 12:34:56",)], "s string")
    out = df.select(
        TX.iso_utc(F.col("s").cast("timestamp")).alias("t")
    ).first()["t"]
    assert out == "2024-05-01T12:34:56Z"


def test_urn_replacement_and_missing_tag(spark):
    ttl = '<urn:md5:abcd1234> a so:ImageObject ;'
    df = spark.createDataFrame([Row(t=ttl, h="f" * 64), Row(t=ttl, h=None)])
    out = df.select(
        TX.mark_missing_hash(F.col("t"), F.col("h")).alias("r")
    ).collect()
    assert out[0]["r"] == f'<urn:sha256:{"f" * 64}> a so:ImageObject ;'
    assert 'hal:missing "true"^^xsd:boolean' in out[1]["r"]


def test_batch_file_name(spark):
    df = spark.createDataFrame([(7,)], "b int")
    assert (
        df.select(TX.batch_file_name(F.col("b")).alias("n")).first()["n"]
        == "batch_000007.ttl.gz"
    )


def test_word_count_and_quality(spark):
    df = spark.createDataFrame([Row(t="the quick brown fox jumps"), Row(t=""), Row(t=None)])
    out = df.select(
        TS.word_count(F.col("t")).alias("wc"),
        TS.quality_score(F.col("t")).alias("q"),
    ).collect()
    assert out[0]["wc"] == 5
    assert out[1]["wc"] == 0 and out[2]["wc"] == 0
    assert 0.0 <= out[0]["q"] <= 1.0


def test_lang_id_markers(spark):
    df = spark.createDataFrame(
        [
            Row(t="the cat and the dog is here"),
            Row(t="der hund und die katze ist das"),
            Row(t="xyzzy qwerty"),
        ]
    )
    out = [r["l"] for r in df.select(TS.lang_id(F.col("t")).alias("l")).collect()]
    assert out == ["en", "de", "und"]


def test_shingles(spark):
    df = spark.createDataFrame([Row(t="a b c d")])
    sh = df.select(TS.shingles(F.col("t"), 3).alias("s")).first()["s"]
    assert sorted(sh) == ["a b c", "b c d"]
    df2 = spark.createDataFrame([Row(t="a b")])
    sh2 = df2.select(TS.shingles(F.col("t"), 3).alias("s")).first()["s"]
    assert sh2 == ["a b"]


def test_binaryfile_sha256_parity_with_hashlib(spark):
    """H2: sha2 over binaryFile content matches hashlib byte-for-byte
    (the DuckDB oracle cannot check this — blob->VARCHAR mangles bytes)."""
    import hashlib

    path = "/root/testdata/sf0.001/region.parquet"
    row = (
        spark.read.format("binaryFile")
        .load(path)
        .select(F.sha2(F.col("content"), 256).alias("h"))
        .first()
    )
    expected = hashlib.sha256(open(path, "rb").read()).hexdigest()
    assert row["h"] == expected


def test_winnow_fingerprints_shared_substring_guarantee(spark):
    """Winnowing guarantee: docs sharing a substring of length
    >= k + w - 1 (= 8 chars at k=5, w=4) share >= 1 fingerprint;
    selection keeps well under half of all k-gram hashes."""
    from pyspark.sql import functions as F

    from geosparql_etl_spark.functions.textstats import winnow_fingerprints

    shared = "identical boilerplate sentence present in both documents"
    rows = [
        (1, "first unique prefix aaa " + shared + " first unique tail"),
        (2, "second doc starts differently " + shared + " and ends its own way"),
        (3, "completely unrelated content with no overlap whatsoever zz"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {
        r["doc_id"]: set(r["fp"])
        for r in df.select(
            "doc_id", winnow_fingerprints(F.col("text")).alias("fp")
        ).collect()
    }
    assert got[1] & got[2], "shared substring must share a fingerprint"
    # density: far fewer fingerprints than k-gram positions
    n_positions = len(rows[0][1]) - 4
    assert len(got[1]) < n_positions / 2


def test_text_functions_null_and_degenerate_inputs(spark):
    """Null / empty / whitespace-only text: no crashes, SQL-standard
    null propagation for counts/hashes, 'und' language, empty winnowing
    set for null."""
    from pyspark.sql import functions as F

    from geosparql_etl_spark.functions.textstats import (
        bpe_ish_token_count,
        fingerprint64,
        lang_id,
        quality_score,
        stopword_ratio,
        winnow_fingerprints,
    )

    df = spark.createDataFrame([(1, None), (2, ""), (3, "   ")], ["id", "text"])
    rows = {
        r["id"]: r
        for r in df.select(
            "id",
            lang_id(F.col("text")).alias("lang"),
            quality_score(F.col("text")).alias("q"),
            bpe_ish_token_count(F.col("text")).alias("tok"),
            stopword_ratio(F.col("text")).alias("sw"),
            fingerprint64(F.col("text")).alias("fp"),
            winnow_fingerprints(F.col("text")).alias("wfp"),
        ).collect()
    }
    assert rows[1]["lang"] == "und" and rows[1]["tok"] is None
    assert rows[1]["fp"] is None and rows[1]["wfp"] == []
    assert rows[2]["tok"] == 0 and len(rows[2]["wfp"]) == 1
    assert all(r["sw"] == 0.0 for r in rows.values())


def test_wordpiece_tokens_greedy_fallback_and_cap(spark):
    import pytest as _pytest
    from pyspark.sql import functions as F

    from geosparql_etl_spark.functions.textstats import wordpiece_tokens

    vocab = ["cust", "omer", "custom", "c", "u", "s", "t", "o", "m", "e", "r"]
    rows = [
        ("customer",),  # greedy: "custom" (6) beats "cust" (4) -> custom e r
        ("cust",),
        ("zz",),        # fallback single chars not in vocab
        ("",),
    ]
    df = spark.createDataFrame(rows, ["w"])
    got = {
        r.w: r.t
        for r in df.select(
            "w", wordpiece_tokens(F.col("w"), vocab).alias("t")
        ).collect()
    }
    assert got == {
        "customer": "custom e r",
        "cust": "cust",
        "zz": "z z",
        "": "",
    }

    # cap: word longer than max_word_len emits the leftover suffix as
    # one trailing token instead of silently truncating
    long_df = spark.createDataFrame([("custcustcust",)], ["w"])
    (r,) = long_df.select(
        wordpiece_tokens(F.col("w"), vocab, max_word_len=2).alias("t")
    ).collect()
    assert r.t == "cust cust cust"  # 2 matched steps + leftover suffix

    with _pytest.raises(ValueError):
        wordpiece_tokens(F.col("w"), ["a", "a"])
    with _pytest.raises(ValueError):
        wordpiece_tokens(F.col("w"), ["a", ""])


def test_repeat_removal_crafted_cases(spark):
    """txt16's semantics on crafted stutters: a trigram immediately
    repeating the previous trigram drops its 3 words; runs collapse to
    one copy; period-2 stutters and non-adjacent repeats survive the
    single pass (documented spec, not a fixpoint)."""
    import __spark_entry__ as entrymod

    rows = [
        (0, "x y z x y z x y z"),      # run: keep one copy
        (1, "a b a b a b"),            # period-2: no full-trigram repeat
        (2, "p q r s p q r s"),        # period-4: trigram at lag 3 differs
        (3, "m n o m n o tail"),       # one repeat + suffix survives
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])

    # route the registry query through a temp dir shim
    import os
    import tempfile

    with tempfile.TemporaryDirectory() as td:
        df.write.parquet(os.path.join(td, "documents.parquet"))
        out = {
            r.doc_id: (r.n_words, r.n_removed, r.clean_md5)
            for r in entrymod.txt16_repeat_removal(spark, td).collect()
        }
    import hashlib

    def md5(s):
        return hashlib.md5(s.encode()).hexdigest()

    assert out[0] == (9, 6, md5("x y z"))
    assert out[1] == (6, 0, md5("a b a b a b"))
    assert out[2] == (8, 0, md5("p q r s p q r s"))
    assert out[3] == (7, 3, md5("m n o tail"))


class TestHtmlToText:
    """html_to_text: the crawl-payload extraction chain (round 9)."""

    def _one(self, spark, html):
        from geosparql_etl_spark.functions.textstats import html_to_text

        return (
            spark.createDataFrame([(html,)], "h string")
            .select(html_to_text(F.col("h")).alias("t"))
            .collect()[0]
            .t
        )

    def test_script_style_drop_whole_even_with_tags_inside(self, spark):
        got = self._one(
            spark,
            '<style>p{a:1}</style><script>if(1<2){x("</p>fake")}</script>'
            "<p>real</p>",
        )
        assert got == "real"

    def test_tags_separate_words(self, spark):
        assert self._one(spark, "<p>a</p><p>b</p>") == "a b"

    def test_entities_decode_single_pass(self, spark):
        # &amp;lt; must yield the LITERAL string "&lt;", never "<"
        got = self._one(spark, "<p>x &amp;lt; y &lt;tag&gt; &#39;q&#39;</p>")
        assert got == "x &lt; y <tag> 'q'"

    def test_comments_and_whitespace_collapse(self, spark):
        got = self._one(spark, "  <p>a\n\n b</p><!-- <p>no</p> -->  c ")
        assert got == "a b c"

    def test_plain_text_is_identity_modulo_collapse(self, spark):
        assert self._one(spark, "no  markup\there") == "no markup here"
