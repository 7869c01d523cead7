"""Charter-pipeline throughput: corpus curation and MinHash-LSH dedup
on a synthesized corpus scaled well past the test fixtures.

Usage: python tools/bench_curation.py [replicas] [sf_dir]

Replicates the sf documents table ``replicas``x (ids offset, a per-copy
suffix token so copies are near-dups, not exact dups — exercising the
whole LSH path, not the exact-digest shortcut), then times:

  - curation: lang gate -> quality gate -> exact dedup -> per-source
    token/quality stats (the llm01 plan)
  - lsh_dedup: minhash signatures -> banded candidates -> exact
    jaccard verify -> anti-join survivors (the d06 plan)

Prints one JSON line with docs/sec for each. Numbers land in SCALE.md.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import Window
from pyspark.sql import functions as F

from geosparql_etl_spark.functions.textstats import (
    bpe_ish_token_count,
    lang_id,
    quality_score,
)
from geosparql_etl_spark.operators.dedup import minhash_dedup
from geosparql_etl_spark.session import get_spark


def synth_corpus(spark, sf_dir: str, replicas: int):
    base = spark.read.parquet(f"{sf_dir}/documents.parquet")
    n = base.count()
    reps = spark.range(replicas).select(F.col("id").alias("rep"))
    return (
        base.crossJoin(reps)
        .select(
            (F.col("doc_id") + F.col("rep") * n).alias("doc_id"),
            F.concat(
                F.col("text"), F.lit(" copyvariant"), F.col("rep").cast("string")
            ).alias("text"),
            "lang",
            "source",
        )
        .repartition(32)
        .localCheckpoint()  # time the pipelines, not the synthesis
    )


def curation_plan(docs):
    norm = F.regexp_replace(F.lower(F.trim(F.col("text"))), r"\s+", " ")
    kept = (
        docs.where(lang_id(F.col("text")) == "en")
        .withColumn("__q", quality_score(F.col("text")))
        .where(F.col("__q") >= 0.5)
        .withColumn("__digest", F.md5(norm))
    )
    w = Window.partitionBy("__digest").orderBy("doc_id")
    uniq = kept.withColumn("__rn", F.row_number().over(w)).where(F.col("__rn") == 1)
    return uniq.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(bpe_ish_token_count(F.col("text"))).alias("n_tokens"),
        F.round(F.avg("__q"), 4).alias("avg_quality"),
    )


def quality_signals_plan(docs):
    """The per-row quality battery (llm10 gopher rules + txt13 entropy
    joined back): measures whether 'quality filters run at scan speed'
    holds as the corpus grows — the only shuffle is txt13's
    (docs x alphabet)-bounded aggregation."""
    from geosparql_etl_spark.functions.textstats import gopher_metrics
    from geosparql_etl_spark.operators.textrank import char_entropy

    m = gopher_metrics(F.col("text"))
    flags = docs.select(
        "doc_id",
        m["n_words"].alias("n_words"),
        m["keep"].alias("keep"),
    )
    ent = char_entropy(docs)
    return flags.join(ent, "doc_id").groupBy("keep").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.avg("entropy"), 4).alias("avg_entropy"),
        F.sum("n_words").alias("n_words"),
    )


def tokenize_plan(docs):
    """llm14's EXACT plan at corpus scale (shared via
    wordpiece_doc_tokens, so the bench cannot drift from the op it
    measures); the metric is corpus tokens/sec, the number every
    ingest pipeline is sized by."""
    import __spark_entry__ as entrymod
    from geosparql_etl_spark.functions.textstats import wordpiece_doc_tokens

    return wordpiece_doc_tokens(docs, entrymod._WP_VOCAB).groupBy(
        "doc_id"
    ).agg(F.sum("k").alias("n_tokens"))


def line_dedup_plan(docs):
    """txt15's shape at corpus scale: C4-rule line dedup (groupBy-min
    first occurrence + join back + per-doc reassembly)."""
    from geosparql_etl_spark.operators.dedup import line_dedup

    lines = line_dedup(docs, "text", "doc_id", line_words=10)
    return lines.groupBy("doc_id").agg(
        F.sum(F.col("kept").cast("bigint")).alias("n_kept")
    )


def main():
    replicas = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    spark = get_spark("bench-curation")
    docs = synth_corpus(spark, sf_dir, replicas)
    n_docs = docs.count()

    t0 = time.time()
    curation_plan(docs).write.format("noop").mode("overwrite").save()
    t_cur = time.time() - t0

    t0 = time.time()
    minhash_dedup(docs, "doc_id", "text", threshold=0.8).write.format(
        "noop"
    ).mode("overwrite").save()
    t_lsh = time.time() - t0

    t0 = time.time()
    quality_signals_plan(docs).write.format("noop").mode("overwrite").save()
    t_q = time.time() - t0

    t0 = time.time()
    tok = tokenize_plan(docs)
    n_tokens = tok.agg(F.sum("n_tokens")).collect()[0][0]
    t_tok = time.time() - t0

    t0 = time.time()
    line_dedup_plan(docs).write.format("noop").mode("overwrite").save()
    t_ld = time.time() - t0

    # BPE vocabulary induction at production merge depth: 256 merges
    # over the corpus's distinct-word table, batched 32 pairs/round
    # (parity with sequential is test-pinned; the batching exists
    # exactly so a deep-vocab run is tens of jobs, not 256)
    from geosparql_etl_spark.operators.bpe import learn_bpe_merges

    words = (
        docs.select(F.explode(F.split(F.trim("text"), r"\s+")).alias("word"))
        .where(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
        .localCheckpoint()
    )
    t0 = time.time()
    n_merges = learn_bpe_merges(words, num_merges=256, batch_size=32).count()
    t_bpe = time.time() - t0

    print(
        json.dumps(
            {
                "docs": n_docs,
                "curation_sec": round(t_cur, 2),
                "curation_docs_per_sec": round(n_docs / t_cur),
                "lsh_dedup_sec": round(t_lsh, 2),
                "lsh_dedup_docs_per_sec": round(n_docs / t_lsh),
                "quality_signals_sec": round(t_q, 2),
                "quality_signals_docs_per_sec": round(n_docs / t_q),
                "tokenize_sec": round(t_tok, 2),
                "tokenize_tokens_per_sec": round(n_tokens / t_tok),
                "line_dedup_sec": round(t_ld, 2),
                "line_dedup_docs_per_sec": round(n_docs / t_ld),
                "bpe_merges": n_merges,
                "bpe_256merge_sec": round(t_bpe, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
