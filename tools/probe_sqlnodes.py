"""Round-15 measurement scratch: per-operator (SQL node) metrics for a
query or expression, via the UI REST /sql endpoint. Not part of the
bench contract.

Usage: python tools/probe_sqlnodes.py <sf_dir> <what>
  what: exact | arm_seeded | arm_trained | a query name from queries()
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
    sf_dir, what = sys.argv[1], sys.argv[2]
    spark = get_spark("gsel-sqlnodes", extra_conf={"spark.ui.enabled": "true"})
    ui = spark.sparkContext.uiWebUrl
    app = spark.sparkContext.applicationId

    from geosparql_etl_spark.operators.similarity import (
        _pq_codebooks,
        cosine_topk,
        ivf_pq_topk,
        lloyd_train,
        pq_train,
    )

    e = entrymod._t(spark, sf_dir, "embeddings")

    def build():
        if what == "exact":
            q = e.where(F.col("vec_id") < 50)
            return cosine_topk(e, q, k=5, dim=64).select("query_id", "neighbor_id")
        if what.startswith("arm_"):
            trained_ivf = lloyd_train(e, "embedding", dim=64, n_cells=16, rounds=10, memo_key=sf_dir)
            m, k = entrymod._SIM22_M, entrymod._SIM22_K
            books = (
                _pq_codebooks(64, m, k)
                if what == "arm_seeded"
                else pq_train(e, "embedding", dim=64, m=m, k=k, rounds=10, memo_key=sf_dir)
            )
            q = e.where(F.col("vec_id") < 50)
            return ivf_pq_topk(
                e, q, kq=5, shortlist=entrymod._SIM22_SHORTLIST, dim=64, n_cells=16,
                n_probe=entrymod._SIM22_PROBE, m=m, k=k,
                centroids=trained_ivf, codebooks=books,
            )
        return entrymod.queries()[what](spark, sf_dir)

    def show_last():
        execs = json.load(
            urllib.request.urlopen(f"{ui}/api/v1/applications/{app}/sql?length=300")
        )
        last = max(execs, key=lambda x: x["id"])
        detail = json.load(
            urllib.request.urlopen(
                f"{ui}/api/v1/applications/{app}/sql/{last['id']}?details=true&planDescription=false"
            )
        )
        for node in detail.get("nodes", []):
            mets = {m["name"]: m["value"] for m in node.get("metrics", [])}
            parts = []
            for k, v in mets.items():
                if not any(s in k for s in ("time", "rows")):
                    continue
                v = " ".join(str(v).split("\n")[-1:])
                parts.append(f"{k}={v}")
            print(" ", node["nodeId"], node["nodeName"], " | ".join(parts)[:300])

    for rep in range(2):
        t0 = time.time()
        build().write.format("noop").mode("overwrite").save()
        print(f"rep{rep} wall={time.time()-t0:.2f}s")
        show_last()


if __name__ == "__main__":
    main()
