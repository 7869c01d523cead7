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
