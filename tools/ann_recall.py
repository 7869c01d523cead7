"""Measure recall@k of the approximate similarity paths against exact
brute force, on the real test embeddings.

    python tools/ann_recall.py [sf_dir] [n_queries] [k]

For each configuration, recall@k = |approx top-k ∩ exact top-k| / k
averaged over queries, plus the candidate volume relative to brute
force (candidates / (n_queries * corpus)) — the cost side of the dial.
Measured numbers for sf0.01/sf0.1 are recorded in SCALE.md.
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from pyspark.sql import functions as F  # noqa: E402

from geosparql_etl_spark.operators.similarity import (  # noqa: E402
    ann_topk,
    cosine_topk,
    ivf_pq_topk,
    ivf_topk,
    with_ivf_cell,
    with_lsh_buckets,
)
from geosparql_etl_spark.session import get_spark  # noqa: E402


def recall_of(approx_df, exact, k, hi_threshold=0.4):
    """(overall recall@k, high-sim recall) — the second restricts to
    exact neighbors with cosine >= hi_threshold, the regime LSH/IVF are
    actually built for (near-dup candidates). Collected sets are tiny
    (queries x k pairs)."""
    a = {(r["query_id"], r["neighbor_id"]) for r in approx_df.collect()}
    by_q: dict = {}
    hi_pairs = set()
    for q, n, s in exact:
        by_q.setdefault(q, set()).add(n)
        if s >= hi_threshold:
            hi_pairs.add((q, n))
    overall = sum(
        len({(q, n) for n in ns} & a) / min(k, len(ns)) for q, ns in by_q.items()
    ) / len(by_q)
    hi = len(hi_pairs & a) / len(hi_pairs) if hi_pairs else float("nan")
    return overall, hi


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    n_queries = int(sys.argv[2]) if len(sys.argv) > 2 else 25
    k = int(sys.argv[3]) if len(sys.argv) > 3 else 10

    spark = get_spark("ann-recall")
    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    n_corpus = e.count()
    q = e.where(F.col("vec_id") < n_queries)

    t0 = time.time()
    exact = [
        (r["query_id"], r["neighbor_id"], r["cosine_sim"])
        for r in cosine_topk(e, q, k=k, dim=64).collect()
    ]
    t_exact = time.time() - t0
    n_hi = sum(1 for _, _, s in exact if s >= 0.4)
    print(
        f"corpus={n_corpus} queries={n_queries} k={k}  "
        f"exact brute force: {t_exact:.1f}s  "
        f"(high-sim neighbors >= 0.4: {n_hi})"
    )
    print(f"{'config':<34} {'recall@'+str(k):>9} {'hi-recall':>9} {'cand/brute':>11} {'sec':>6}")

    for bands, bits in [(4, 8), (8, 8), (16, 8), (8, 6), (16, 6), (32, 6)]:
        t0 = time.time()
        approx = ann_topk(e, q, k=k, dim=64, bands=bands, bits_per_band=bits)
        r, hi = recall_of(approx, exact, k)
        dt = time.time() - t0
        # candidate volume: pairs sharing >= 1 bucket (pre-dedup cost)
        cb = with_lsh_buckets(e, "embedding", 64, bands, bits).select(
            F.col("vec_id").alias("nid"), F.explode("lsh_buckets").alias("b")
        )
        qb = with_lsh_buckets(q, "embedding", 64, bands, bits).select(
            F.col("vec_id").alias("qid"), F.explode("lsh_buckets").alias("b")
        )
        n_cand = cb.join(qb, "b").where(F.col("nid") != F.col("qid")).count()
        frac = n_cand / (n_queries * (n_corpus - 1))
        print(
            f"{'sign-LSH b=' + str(bands) + ' bits=' + str(bits):<34} "
            f"{r:>9.3f} {hi:>9.3f} {frac:>11.3f} {dt:>6.1f}"
        )

    for n_cells, n_probe in [(16, 1), (16, 2), (16, 4), (64, 4), (64, 8)]:
        t0 = time.time()
        approx = ivf_topk(
            e, q, k=k, dim=64, n_cells=n_cells, n_probe=n_probe
        )
        r, hi = recall_of(approx, exact, k)
        dt = time.time() - t0
        cells = with_ivf_cell(e, "embedding", 64, n_cells)
        sizes = {
            row["ivf_cell"]: row["c"]
            for row in cells.groupBy("ivf_cell").agg(F.count("*").alias("c")).collect()
        }
        avg_cell = sum(sizes.values()) / max(1, len(sizes))
        frac = n_probe * avg_cell / n_corpus
        print(
            f"{'IVF cells=' + str(n_cells) + ' probe=' + str(n_probe):<34} "
            f"{r:>9.3f} {hi:>9.3f} {frac:>11.3f} {dt:>6.1f}"
        )

    # trained quantizers (round 9): the shipped configs
    from geosparql_etl_spark.operators.similarity import (  # noqa: E402
        lloyd_train,
        pq_topk,
        pq_train,
    )

    trained = lloyd_train(
        e, "embedding", dim=64, n_cells=16, rounds=10, memo_key=sf_dir
    )
    tcells = with_ivf_cell(e, "embedding", 64, 16, centroids=trained)
    tsizes = {
        row["ivf_cell"]: row["c"]
        for row in tcells.groupBy("ivf_cell").agg(F.count("*").alias("c")).collect()
    }
    avg_tcell = sum(tsizes.values()) / max(1, len(tsizes))
    for n_probe in [2, 4, 6, 8]:
        t0 = time.time()
        approx = ivf_topk(
            e, q, k=k, dim=64, n_cells=16, n_probe=n_probe,
            centroids=trained,
        )
        r, hi = recall_of(approx, exact, k)
        dt = time.time() - t0
        frac = n_probe * avg_tcell / n_corpus
        print(
            f"{'IVF(trained x10) probe=' + str(n_probe):<34} "
            f"{r:>9.3f} {hi:>9.3f} {frac:>11.3f} {dt:>6.1f}"
        )

    books = pq_train(e, "embedding", rounds=10, memo_key=sf_dir)
    for name, bk in [("seeded", None), ("trained", books)]:
        t0 = time.time()
        approx = pq_topk(e, q, kq=k, dim=64, m=8, k=16, codebooks=bk)
        r, hi = recall_of(approx, exact, k)
        dt = time.time() - t0
        print(
            f"{'PQ ADC (' + name + ')':<34} "
            f"{r:>9.3f} {hi:>9.3f} {1.0:>11.3f} {dt:>6.1f}"
        )

    for n_probe, shortlist in [(2, 20), (4, 40), (8, 40)]:
        t0 = time.time()
        approx = ivf_pq_topk(
            e, q, kq=k, shortlist=shortlist, dim=64,
            n_cells=16, n_probe=n_probe,
        )
        r, hi = recall_of(approx, exact, k)
        dt = time.time() - t0
        # exact re-scores per query = the shortlist, the only stage
        # touching raw vectors
        frac = shortlist / (n_corpus - 1)
        print(
            f"{'IVF+PQ probe=' + str(n_probe) + ' short=' + str(shortlist):<34} "
            f"{r:>9.3f} {hi:>9.3f} {frac:>11.3f} {dt:>6.1f}"
        )

    # the SHIPPABLE composed config (round 10, sim22): trained IVF +
    # trained m=16 PQ -> shortlist 80 -> exact re-score
    books16 = pq_train(
        e, "embedding", dim=64, m=16, k=16, rounds=10, memo_key=sf_dir
    )
    for n_probe, shortlist in [(6, 80), (8, 80), (8, 120)]:
        t0 = time.time()
        approx = ivf_pq_topk(
            e, q, kq=k, shortlist=shortlist, dim=64, n_cells=16,
            n_probe=n_probe, m=16, k=16,
            centroids=trained, codebooks=books16,
        )
        r, hi = recall_of(approx, exact, k)
        dt = time.time() - t0
        frac = shortlist / (n_corpus - 1)
        print(
            f"{'IVF+PQ(tr m=16) p=' + str(n_probe) + ' s=' + str(shortlist):<34} "
            f"{r:>9.3f} {hi:>9.3f} {frac:>11.3f} {dt:>6.1f}"
        )


if __name__ == "__main__":
    main()
