"""BPE tokenizer-vocabulary induction (Sennrich et al. 2016) — the
TRAINING side of llm14's WordPiece matcher, as a distributed iterative
operator.

Classic fast-BPE structure: merges are learned over the DISTINCT-WORD
frequency table (vocab-sized), not over corpus token positions — a
100 TB corpus collapses to a few million (word, freq) rows before the
first iteration, and each round is one pair-count aggregate over that
table plus one column rewrite. The driver holds only the merge table
itself (num_merges rows), collecting exactly ONE argmax row per round
— the same driver-footprint argument as pagerank/connected components.

Representation: each word's symbol sequence is a single-space-joined
string with sentinel spaces (" h e l l o "). Applying a merge (a, b)
is then ``replace`` of " a b " -> " ab " run TWICE: one replace pass
consumes the shared delimiter between back-to-back occurrences and
skips every other one; the second pass picks those up, and no third
occurrence class exists (replacement never creates a new " a b "
context, since symbols contain no spaces). Two passes == the greedy
left-to-right non-overlapping merge BPE defines — and ``replace`` has
identical semantics in Spark and ANSI replay engines, which is what
lets the oracle unroll the whole training loop in SQL.

Determinism: argmax ties break (freq DESC, left ASC, right ASC), so
the learned merge table is bit-identical across partitionings, resumes
and engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from geosparql_etl_spark.util import cut_lineage


def learn_bpe_merges(
    words: DataFrame,
    word_col: str = "word",
    freq_col: str = "freq",
    num_merges: int = 4,
) -> DataFrame:
    """words: (word, freq) distinct-word frequency table.

    -> (merge_rank, lhs, rhs, pair_freq): the learned merge table, one
    row per round in learning order.
    """
    spark = words.sparkSession
    state = words.select(
        F.concat(
            F.lit(" "),
            F.array_join(F.split(F.col(word_col), ""), " "),
            F.lit(" "),
        ).alias("s"),
        F.col(freq_col).alias("freq"),
    )
    state = cut_lineage(state)
    merges: list[tuple[int, str, str, int]] = []
    for rank in range(1, num_merges + 1):
        pairs = state.select(
            F.split(F.trim(F.col("s")), " ").alias("w"), "freq"
        ).select(
            # sequence(1, n) DESCENDS when n < 1 (ANSI): guard the
            # single-symbol words instead of exploding a bogus range
            F.explode(
                F.expr(
                    "CASE WHEN size(w) >= 2 THEN "
                    "transform(sequence(1, size(w) - 1), "
                    "          i -> struct(w[i-1] AS a, w[i] AS b)) "
                    "ELSE array() END"
                )
            ).alias("p"),
            "freq",
        )
        top = (
            pairs.groupBy("p.a", "p.b")
            .agg(F.sum("freq").alias("f"))
            .orderBy(F.desc("f"), F.asc("a"), F.asc("b"))
            .limit(1)
            .collect()
        )
        if not top:  # no adjacent pairs left anywhere
            break
        a, b, f = top[0]["a"], top[0]["b"], top[0]["f"]
        merges.append((rank, a, b, int(f)))
        pat, rep = F.lit(f" {a} {b} "), F.lit(f" {a}{b} ")
        state = state.select(
            F.replace(F.replace(F.col("s"), pat, rep), pat, rep).alias("s"),
            "freq",
        )
        state = cut_lineage(state)  # round k must not replay 1..k-1
    return spark.createDataFrame(
        merges, "merge_rank int, lhs string, rhs string, pair_freq bigint"
    )


def apply_bpe_merges(
    words: DataFrame,
    merges: list[tuple[str, str]],
    word_col: str = "word",
) -> DataFrame:
    """The APPLY side of ``learn_bpe_merges``: tokenize each distinct
    word with an already-learned merge list, in rank order — training
    and application round-trip on the same replace-twice rewrite, so
    the trainer's own final word state IS this function's output for
    the training corpus.

    -> (word, toks, k): space-joined subword tokens and their count.

    Scale notes: the input is the DISTINCT word domain (vocab-sized —
    Heaps-sublinear in corpus size), and the merge list lives in the
    plan as literals, so application is ONE stage of chained
    ``replace`` columns — no join, no shuffle, no Python. For
    production-sized merge tables (10k+), chunk the chain with
    ``cut_lineage`` every few hundred merges to bound codegen size;
    the semantics (rank-ordered rewrites) are unchanged.
    """
    s = F.concat(
        F.lit(" "),
        F.array_join(F.split(F.col(word_col), ""), " "),
        F.lit(" "),
    )
    for a, b in merges:
        pat, rep = F.lit(f" {a} {b} "), F.lit(f" {a}{b} ")
        s = F.replace(F.replace(s, pat, rep), pat, rep)
    toks = F.trim(s)
    return words.select(
        F.col(word_col).alias("word"),
        toks.alias("toks"),
        F.size(F.split(toks, " ")).alias("k"),
    )
