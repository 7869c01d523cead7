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

Representation: each word's symbol sequence is an ``array<string>``
column. Applying a merge (a, b) is one ``aggregate`` (Catalyst HOF)
left fold over the array: if the accumulator's last symbol is ``a``
and the next is ``b``, they fuse to ``ab``; otherwise the symbol
appends. That IS the canonical greedy left-to-right merge BPE defines
— eager, so an odd run like ``a a a a a`` under merge (a, a) becomes
``aa aa a`` (the earlier string replace-twice rewrite left the
left-biased ``aa a aa`` on odd runs — the round-7 ADVICE finding).
The fold stays whole-stage-codegen JVM work, and DuckDB's
``list_reduce`` replays it exactly, which is what lets the oracle
unroll the whole training loop in SQL.

Determinism: argmax ties break (freq DESC, left ASC, right ASC), so
the learned merge table is bit-identical across partitionings, resumes
and engines.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from geosparql_etl_spark.util import cut_lineage, local_frame


def merge_pair(arr: Column, a: str, b: str) -> Column:
    """Canonical greedy left-to-right merge of one (a, b) rule over a
    symbol array — a single Catalyst ``aggregate`` fold, no Python.
    Eager semantics: a freshly fused ``ab`` is the accumulator's new
    last symbol, so it only extends further if the NEXT rule-matching
    pair starts with ``ab`` itself (exactly the reference tokenizers'
    behavior)."""
    fused = F.lit(a + b)
    return F.aggregate(
        arr,
        F.array().cast("array<string>"),
        lambda acc, x: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == F.lit(a))
            & (x == F.lit(b)),
            F.concat(F.slice(acc, 1, F.size(acc) - 1), F.array(fused)),
        ).otherwise(F.concat(acc, F.array(x))),
    )


def _symbols(word: Column) -> Column:
    # split("", …) can emit empty strings at the edges; drop them so a
    # phantom symbol never participates in pair counts or merges
    return F.filter(F.split(word, ""), lambda x: x != F.lit(""))


def _batch_prefix(rows, batch_size: int, complete: bool = False):
    """Select the prefix of one round's sorted pair list that is SAFE
    to merge in a single pass with sequential-BPE parity:

      - pairs must be mutually symbol-disjoint (a merge never changes
        the count of a pair it shares no symbol with, so their stale
        counts stay exact);
      - the walk STOPS at the first conflicting pair (never
        skip-and-continue: a skipped conflict could, after the earlier
        merges, still be the true sequential argmax);
      - accepted pairs (beyond the guaranteed first) must have freq
        STRICTLY above the stop-position freq: merging (a, b) can
        mint new pairs like (x, ab) whose count is bounded by the
        stale count of the conflicting (x, a) — which sorts at/after
        the stop — so strict dominance over f_stop rules out any new
        or affected pair overtaking an accepted one (ties could flip
        on the lexicographic tie-break otherwise).

    The FIRST pair is always the sequential choice by definition, so a
    round always progresses even when batching admits nothing else.
    """
    accepted: list = []
    used: set[str] = set()
    f_stop = None
    for r in rows[:batch_size]:
        if r["a"] in used or r["b"] in used or r["a"] + r["b"] in used:
            f_stop = r["f"]
            break
        accepted.append(r)
        used.update((r["a"], r["b"], r["a"] + r["b"]))
    else:
        # window exhausted without conflict: pairs past the window are
        # unseen — treat the boundary like a conflict at the last freq.
        # ``complete`` says the window holds the ENTIRE pair universe
        # (the count query returned fewer rows than asked): nothing is
        # unseen, no boundary guard needed.
        if not complete and rows:
            f_stop = rows[min(batch_size, len(rows)) - 1]["f"]
    if f_stop is not None:
        accepted = [accepted[0]] + [r for r in accepted[1:] if r["f"] > f_stop]
    return accepted


def learn_bpe_merges(
    words: DataFrame,
    word_col: str = "word",
    freq_col: str = "freq",
    num_merges: int = 4,
    batch_size: int = 1,
) -> DataFrame:
    """words: (word, freq) distinct-word frequency table.

    -> (merge_rank, lhs, rhs, pair_freq): the learned merge table, one
    row per round in learning order.

    ``batch_size`` (round-9, the round-8 verdict's wall-clock finding):
    1 = one Spark job per merge — exact but 32k sequential jobs for a
    real vocab. > 1 counts pairs ONCE per round and merges the top-k
    mutually symbol-disjoint pairs in a single pass (classic fast-BPE
    batching), with the conservative acceptance rule in
    ``_batch_prefix`` that preserves SEQUENTIAL PARITY — the learned
    table is identical to batch_size=1 (pinned by test on the Sennrich
    vocabulary and a 64-merge documents-corpus run); only the job
    count changes (~num_merges/accepted-per-round jobs). The default
    stays 1 so llm18/llm20's unrolled SQL oracles replay unchanged
    semantics; bench_curation exercises 256 merges at batch_size=32.
    """
    spark = words.sparkSession
    state = words.select(
        _symbols(F.col(word_col)).alias("w"),
        F.col(freq_col).alias("freq"),
    )
    state = cut_lineage(state)
    merges: list[tuple[int, str, str, int]] = []
    while len(merges) < num_merges:
        pairs = state.select(
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
        want = min(batch_size, num_merges - len(merges))
        top = (
            pairs.groupBy("p.a", "p.b")
            .agg(F.sum("freq").alias("f"))
            .orderBy(F.desc("f"), F.asc("a"), F.asc("b"))
            .limit(want)
            .collect()
        )
        if not top:  # no adjacent pairs left anywhere
            break
        batch = _batch_prefix(top, want, complete=len(top) < want)
        arr = F.col("w")
        for r in batch:
            merges.append((len(merges) + 1, r["a"], r["b"], int(r["f"])))
            arr = merge_pair(arr, r["a"], r["b"])
        state = state.select(arr.alias("w"), "freq")
        state = cut_lineage(state)  # round k must not replay 1..k-1
    return local_frame(
        spark,
        merges,
        "merge_rank int, lhs string, rhs string, pair_freq bigint",
    )


def apply_bpe_merges(
    words: DataFrame,
    merges: list[tuple[str, str]],
    word_col: str = "word",
) -> DataFrame:
    """The APPLY side of ``learn_bpe_merges``: tokenize each distinct
    word with an already-learned merge list, in rank order — training
    and application round-trip on the same greedy fold, so the
    trainer's own final word state IS this function's output for the
    training corpus.

    -> (word, toks, k): space-joined subword tokens and their count.

    Scale notes: the input is the DISTINCT word domain (vocab-sized —
    Heaps-sublinear in corpus size), and the merge list lives in the
    plan as literals, so application is ONE stage of chained
    ``aggregate`` folds — no join, no shuffle, no Python. For
    production-sized merge tables (10k+), chunk the chain with
    ``cut_lineage`` every few hundred merges to bound codegen size;
    the semantics (rank-ordered rewrites) are unchanged.
    """
    arr = _symbols(F.col(word_col))
    for a, b in merges:
        arr = merge_pair(arr, a, b)
    return words.select(
        F.col(word_col).alias("word"),
        F.array_join(arr, " ").alias("toks"),
        F.size(arr).alias("k"),
    )
