"""Corpus term statistics: TF-IDF term ranking and cross-document
boilerplate detection.

Charter text-analysis family (training-data pipelines): surface the
terms that characterize each document and flag documents dominated by
shingles shared with other documents (boilerplate / template text).

Scale notes (100 TB):
- The token explode shuffles (id, term) pairs — unavoidable and linear
  in corpus token count; partial aggregation (map-side combine) reduces
  the tf shuffle to distinct (doc, term) pairs.
- The document-frequency table is vocabulary-sized, NOT corpus-sized.
  It is joined back on `term` with a plain equi-join: Zipf vocabularies
  can exceed broadcast limits, so the join strategy is left to
  Catalyst/AQE (which will broadcast when stats allow). No all-pairs
  stage anywhere.
- Top-k per document is a window partitioned BY DOCUMENT — parallel in
  the number of docs, never a global sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from geosparql_etl_spark.functions.textstats import shingles

TOKEN_RE = "[a-z0-9]+"


def tfidf_top_terms(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
) -> DataFrame:
    """Top-k characteristic terms per document by smoothed TF-IDF.

    score = tf * (ln((N + 1) / (df + 1)) + 1), the sklearn-style
    smoothed idf (never zero or negative, defined for unseen terms).
    Ranking uses the ROUNDED score with the term string as tie-break,
    so the result is deterministic and engine-independent (double math
    up to the rounding point is bit-identical between Spark and the
    DuckDB oracle).

    The corpus size N enters as a broadcast 1-row aggregate, keeping
    the whole computation one declarative plan (no driver-side count).
    """
    toks = docs.select(
        F.col(id_col),
        F.explode(
            F.regexp_extract_all(F.lower(F.col(text_col)), F.lit(TOKEN_RE), 0)
        ).alias("term"),
    )
    tf = toks.groupBy(id_col, "term").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = toks.groupBy("term").agg(
        F.count_distinct(id_col).alias("df")
    )
    n = docs.agg(F.count(F.lit(1)).alias("n"))
    scored = (
        tf.join(dfreq, "term")
        .join(F.broadcast(n))
        .select(
            F.col(id_col),
            "term",
            F.round(
                F.col("tf")
                * (
                    F.log((F.col("n") + F.lit(1.0)) / (F.col("df") + F.lit(1.0)))
                    + F.lit(1.0)
                ),
                6,
            ).alias("score"),
        )
    )
    w = Window.partitionBy(id_col).orderBy(F.desc("score"), F.asc("term"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= k)
        .select(id_col, "term", "score", F.col("rn").alias("rank"))
    )


def boilerplate_ratio(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
) -> DataFrame:
    """Fraction of each document's distinct word-k-shingles that also
    occur in at least one OTHER document — high values flag template /
    boilerplate text that repeats across the corpus (a standard
    pretraining-quality signal, distinct from pairwise dedup: it scores
    every document without materializing pairs).

    Plan: shingle explode -> shingle document-frequency (map-side
    combined groupBy; shingles are distinct within a doc so count(*) is
    the df) -> equi-join back -> per-doc mean of (df > 1). Linear in
    total shingle count; the df table is shingle-vocabulary-sized and
    its join strategy is left to AQE.
    """
    sh = docs.select(
        F.col(id_col), F.explode(shingles(F.col(text_col), k)).alias("s")
    )
    dfreq = sh.groupBy("s").agg(F.count(F.lit(1)).alias("df"))
    return (
        sh.join(dfreq, "s")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_shingles"),
            F.round(
                F.avg((F.col("df") > 1).cast("double")), 6
            ).alias("boilerplate_ratio"),
        )
    )


def unigram_surprisal(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document mean unigram surprisal, -avg ln p(term): the
    self-supervised analog of the LM-perplexity quality filter used on
    pretraining corpora (Wenzek et al., "CCNet", LREC 2020) with the
    corpus's OWN unigram distribution as the model — no external LM.
    Low scores flag common/templated vocabulary, high scores flag
    rare-token noise; both tails are standard cut candidates.

    Plan shape mirrors tfidf_top_terms: token explode -> vocabulary
    aggregate (map-side combined; Zipf-bounded vocab size, never
    corpus-sized) -> equi-join back (strategy left to AQE) -> per-doc
    avg. The corpus token total enters as a broadcast 1-row aggregate —
    one declarative plan, no driver-side count.
    """
    toks = docs.select(
        F.col(id_col),
        F.explode(
            F.regexp_extract_all(F.lower(F.col(text_col)), F.lit(TOKEN_RE), 0)
        ).alias("term"),
    )
    vocab = toks.groupBy("term").agg(F.count(F.lit(1)).alias("n_term"))
    total = vocab.agg(F.sum("n_term").cast("double").alias("n_total"))
    return (
        toks.join(vocab, "term")
        .join(F.broadcast(total))
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.round(
                F.avg(-F.log(F.col("n_term") / F.col("n_total"))), 4
            ).alias("mean_surprisal"),
        )
    )


def char_entropy(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    out_col: str = "entropy",
) -> DataFrame:
    """Per-document character-level Shannon entropy (bits/char) — the
    classic cheap randomness/quality signal (low entropy = repeated
    boilerplate, high = encoded junk).

    Plan: explode chars -> groupBy (id, char) -> groupBy id, using
    H = log2(n) - sum(c*log2 c)/n so one aggregation pass suffices.
    Scale: the explode is corpus-linear but map-side combine collapses
    the shuffle to ~(docs x alphabet) rows — the per-doc alphabet is
    bounded (<=256 for byte-ish text), so shuffle volume is ~100 rows
    per document, not per character. Docs with null/empty text get
    entropy 0.0 (left join back against the doc spine).
    """
    chars = docs.select(
        F.col(id_col), F.explode(F.split(F.col(text_col), "")).alias("__ch")
    ).where(F.col("__ch") != "")
    counts = chars.groupBy(id_col, "__ch").agg(F.count(F.lit(1)).alias("__c"))
    ent = counts.groupBy(id_col).agg(
        (
            F.log2(F.sum("__c"))
            - F.sum(F.col("__c") * F.log2("__c")) / F.sum("__c")
        ).alias(out_col)
    )
    return (
        docs.select(id_col)
        .join(ent, id_col, "left")
        .select(id_col, F.coalesce(F.col(out_col), F.lit(0.0)).alias(out_col))
    )


def bigram_surprisal(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    alpha: float = 0.5,
) -> DataFrame:
    """Per-document mean bigram surprisal, -avg ln p(w_i | w_{i-1}),
    under the corpus's own add-alpha-smoothed bigram model — the
    conditional upgrade of unigram_surprisal and a closer stand-in for
    the CCNet LM-perplexity filter (word-order anomalies now score
    high, which a unigram model cannot see).

    p(w | prev) = (c(prev, w) + alpha) / (c(prev) + alpha * V), V the
    corpus unigram vocabulary size. Plan shape: one bigram explode ->
    bigram-vocabulary aggregate (Zipf-bounded, far below the corpus
    token count after map-side combine) -> two vocab-sized equi-joins
    back (strategy left to AQE) + a broadcast 1-row V -> per-doc avg.
    Documents with fewer than two tokens have no bigrams and drop out
    (same contract as the SQL oracle).
    """
    # tokenize ONCE into a materialized column — referencing the
    # regexp_extract_all expression inside the transform lambda would
    # re-run the regex per element_at (the interpreter-lambda trap d05
    # documents), turning an O(n) explode into O(n^2) regex passes
    tokenized = docs.select(
        F.col(id_col),
        F.regexp_extract_all(
            F.lower(F.col(text_col)), F.lit(TOKEN_RE), 0
        ).alias("__toks"),
    )
    toks = F.col("__toks")
    # sequence(1, n-1) DESCENDS when n < 2 (Spark gotcha) — guard to
    # an empty bigram list
    grams = F.when(
        F.size(toks) >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - 1),
            lambda i: F.struct(
                F.element_at(toks, i).alias("prev"),
                F.element_at(toks, i + 1).alias("w"),
            ),
        ),
    ).otherwise(F.array().cast("array<struct<prev:string,w:string>>"))
    pairs = tokenized.select(
        F.col(id_col), F.explode(grams).alias("bg")
    ).select(id_col, F.col("bg.prev").alias("prev"), F.col("bg.w").alias("w"))
    bc = pairs.groupBy("prev", "w").agg(F.count(F.lit(1)).alias("c2"))
    pc = bc.groupBy("prev").agg(F.sum("c2").alias("c1"))
    # V reuses the tokenized arrays — a fresh regexp_extract_all over
    # docs here would re-tokenize the whole corpus a second time
    vocab = tokenized.select(
        F.explode(toks).alias("term")
    ).agg(F.countDistinct("term").cast("double").alias("v"))
    p = (F.col("c2") + F.lit(alpha)) / (F.col("c1") + F.lit(alpha) * F.col("v"))
    return (
        pairs.join(bc, ["prev", "w"])
        .join(pc, "prev")
        .join(F.broadcast(vocab))
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.round(F.avg(-F.log(p)), 4).alias("mean_bg_surprisal"),
        )
    )
