"""Round-15 measurement scratch: decompose sim22's warm cost into its
three component plans (exact recall baseline, seeded ADC arm, trained
ADC arm), with per-stage executor time. Not part of the bench contract.

Usage: python tools/probe_sim22.py /root/testdata/sf0.1
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from geosparql_etl_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1]
    spark = get_spark("gsel-probe22", extra_conf={"spark.ui.enabled": "true"})
    ui = spark.sparkContext.uiWebUrl
    app = spark.sparkContext.applicationId

    def stages():
        data = json.load(
            urllib.request.urlopen(
                f"{ui}/api/v1/applications/{app}/stages?status=COMPLETE"
            )
        )
        return {s["stageId"]: (s["executorRunTime"], s["numCompleteTasks"]) for s in data}

    from geosparql_etl_spark.operators.similarity import (
        _pq_codebooks,
        cosine_topk,
        ivf_pq_topk,
        lloyd_train,
        pq_train,
    )

    e = entrymod._t(spark, sf_dir, "embeddings")
    trained_ivf = lloyd_train(e, "embedding", dim=64, n_cells=16, rounds=10, memo_key=sf_dir)
    m, k = entrymod._SIM22_M, entrymod._SIM22_K
    books_s = _pq_codebooks(64, m, k)
    books_t = pq_train(e, "embedding", dim=64, m=m, k=k, rounds=10, memo_key=sf_dir)
    q = e.where(F.col("vec_id") < 50)

    def mk_exact():
        return cosine_topk(e, q, k=5, dim=64).select("query_id", "neighbor_id")

    def mk_arm(books):
        return ivf_pq_topk(
            e, q, kq=5, shortlist=entrymod._SIM22_SHORTLIST, dim=64, n_cells=16,
            n_probe=entrymod._SIM22_PROBE, m=m, k=k,
            centroids=trained_ivf, codebooks=books,
        )

    parts = [
        ("exact", mk_exact),
        ("arm_seeded", lambda: mk_arm(books_s)),
        ("arm_trained", lambda: mk_arm(books_t)),
    ]
    for name, mk in parts:
        for rep in range(2):
            before = stages()
            t0 = time.time()
            mk().write.format("noop").mode("overwrite").save()
            wall = time.time() - t0
            after = stages()
            new = {
                sid: v for sid, v in after.items() if sid not in before
            }
            tot = sum(v[0] for v in new.values())
            top = sorted(new.items(), key=lambda kv: -kv[1][0])[:4]
            print(
                f"{name} rep{rep}: wall={wall:.2f}s execMs={tot} "
                + " ".join(f"s{sid}:{v[0]}ms/{v[1]}t" for sid, v in top)
            )
    # plan dump for the deliverable
    outdir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r15")
    os.makedirs(outdir, exist_ok=True)
    import io
    from contextlib import redirect_stdout

    buf = io.StringIO()
    with redirect_stdout(buf):
        entrymod.queries()["sim22_shippable_ann"](spark, sf_dir).explain("formatted")
    tag = sys.argv[2] if len(sys.argv) > 2 else "before"
    with open(os.path.join(outdir, f"sim22_shippable_ann_{tag}.txt"), "w") as f:
        f.write(buf.getvalue())
    print("plan dumped")


if __name__ == "__main__":
    main()
