"""ANN recall frontier at an EXPANDED corpus — the 10x scale check
(round 11, VERDICT item 6): the largest driver-generated embeddings
table is sf0.1's 2,000 vectors, so this harness grows the corpus with
deterministic CONVEX MIXTURES of DISTINCT real vector pairs (seeded
rng; normalize(u + lam * (w - u)) with u != w guaranteed by an offset
permutation, lam in 0.3..0.7) — new points on the same data manifold,
never replicas (a replica lands in its source's cell and flatters the
quantizer).

    python tools/ann_scale_sweep.py [sf_dir] [factor] [n_queries] [k]

MEASUREMENT HARNESS ONLY: the expanded corpus never backs a registry
query or oracle; results are recorded in SCALE.md.
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import numpy as np  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from geosparql_etl_spark.operators.similarity import (  # noqa: E402
    auto_n_cells,
    cosine_topk,
    ivf_pq_topk,
    ivf_topk,
    lloyd_train,
    pq_train,
    with_ivf_cell,
)
from geosparql_etl_spark.session import get_spark  # noqa: E402


def recall_of(approx_df, exact, k, hi_threshold=0.4):
    a = {(r["query_id"], r["neighbor_id"]) for r in approx_df.collect()}
    by_q: dict = {}
    hi_pairs = set()
    for q, n, s in exact:
        by_q.setdefault(q, set()).add(n)
        if s >= hi_threshold:
            hi_pairs.add((q, n))
    overall = sum(
        len({(q, n) for n in ns} & a) / min(k, len(ns))
        for q, ns in by_q.items()
    ) / len(by_q)
    hi = len(hi_pairs & a) / len(hi_pairs) if hi_pairs else float("nan")
    return overall, hi


def expanded_corpus(spark, sf_dir: str, factor: int):
    base = (
        spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        .select("vec_id", "embedding")
        .orderBy("vec_id")
        .toPandas()
    )
    n = len(base)
    vecs = np.array([list(v) for v in base["embedding"]], dtype=np.float64)
    rng = np.random.default_rng(42)
    rows = list(zip(base["vec_id"].tolist(), [list(map(float, v)) for v in vecs]))
    for r in range(1, factor):
        # mixtures of two DISTINCT vectors: p2 = p1 rotated by a
        # nonzero offset, so p1[i] != p2[i] for every row — two
        # independent permutations collide with P = 1/n per row
        # (~one exact replica per round), which is exactly the
        # recall-flattering artifact this harness excludes
        p1 = rng.permutation(n)
        off = int(rng.integers(1, n))
        p2 = np.roll(p1, off)
        lam = 0.3 + 0.4 * (r - 1) / max(1, factor - 2)
        mixed = vecs[p1] + lam * (vecs[p2] - vecs[p1])
        norms = np.linalg.norm(mixed, axis=1, keepdims=True)
        norms[norms == 0] = 1.0
        mixed = mixed / norms
        rows += [
            (int(r * 1_000_000 + i), [float(x) for x in mixed[i]])
            for i in range(n)
        ]
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<float>"
    ).repartition(32)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    factor = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    n_queries = int(sys.argv[3]) if len(sys.argv) > 3 else 25
    k = int(sys.argv[4]) if len(sys.argv) > 4 else 10

    spark = get_spark("ann-scale-sweep")
    e = expanded_corpus(spark, sf_dir, factor).cache()
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
        f"corpus={n_corpus} (factor {factor}) queries={n_queries} k={k}  "
        f"exact brute force: {t_exact:.1f}s  (hi-sim >= 0.4: {n_hi})"
    )
    hdr = f"{'config':<40} {'recall@' + str(k):>9} {'hi-recall':>9} {'scan-frac':>9} {'sec':>6}"
    print(hdr)

    auto = auto_n_cells(n_corpus)
    for n_cells in dict.fromkeys((16, 64, auto)):
        trained = lloyd_train(
            e, "embedding", dim=64, n_cells=n_cells, rounds=10, memo_key=None
        )
        cells = with_ivf_cell(e, "embedding", 64, n_cells, centroids=trained)
        sizes = [
            r["c"]
            for r in cells.groupBy("ivf_cell").agg(F.count("*").alias("c")).collect()
        ]
        avg_cell = sum(sizes) / max(1, len(sizes))
        label = " (auto)" if n_cells == auto else ""
        if n_cells == auto:
            # auto-sized row (round 12): probe proportional to cells
            # (probe/cells = the scan-fraction dial), so the SAME
            # fractions are comparable across any corpus size without
            # hand-tuning — the sim34 scan-fraction-parity claim
            probes = tuple(
                sorted({max(1, auto // 8), max(1, auto // 4), max(2, auto // 2)})
            )
        else:
            probes = (2, 4, 6, 8) if n_cells == 16 else (8, 16, 24)
        for n_probe in probes:
            t0 = time.time()
            approx = ivf_topk(
                e, q, k=k, dim=64, n_cells=n_cells, n_probe=n_probe,
                centroids=trained,
            )
            r, hi = recall_of(approx, exact, k)
            dt = time.time() - t0
            frac = n_probe * avg_cell / n_corpus
            print(
                f"{'trained IVF cells=' + str(n_cells) + ' probe=' + str(n_probe) + label:<40} "
                f"{r:>9.3f} {hi:>9.3f} {frac:>9.3f} {dt:>6.1f}"
            )
        if n_cells == 16:
            books = pq_train(
                e, "embedding", dim=64, m=16, k=16, rounds=10, memo_key=None
            )
            for n_probe, shortlist in ((6, 80), (8, 120)):
                t0 = time.time()
                approx = ivf_pq_topk(
                    e, q, kq=k, shortlist=shortlist, dim=64, n_cells=16,
                    n_probe=n_probe, m=16, k=16,
                    centroids=trained, codebooks=books,
                )
                r, hi = recall_of(approx, exact, k)
                dt = time.time() - t0
                frac = n_probe * avg_cell / n_corpus
                print(
                    f"{'IVF+PQ m=16 probe=' + str(n_probe) + ' short=' + str(shortlist):<40} "
                    f"{r:>9.3f} {hi:>9.3f} {frac:>9.3f} {dt:>6.1f}"
                )


if __name__ == "__main__":
    main()
