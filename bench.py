"""Benchmark harness: runs the engine's headline queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:

    {"metric": "...", "value": <total sec>, "unit": "sec",
     "queries": {"q01_...": sec, ...}, "sf": "<dir>"}

Each query is fully materialized via the noop sink (all columns compute,
nothing crosses to Python), so timings measure the whole plan, not a
pruned count.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import __spark_entry__ as entrymod
from geosparql_etl_spark.session import get_spark

# Headline set: one per operator family, weighted toward the shapes that
# dominate real workloads (join, window, doc render, dedup, similarity).
HEADLINE = [
    "q01_pricing_summary",
    "j01_multikey_equijoin",
    "j02_broadcast_lookup",
    "j08_range_join",
    "a08_rollup",
    "a01_argmax_window",
    "a02_map_argmax",
    "w01_batch_window",
    "a06_group_concat",
    "g03_denormalized_wkt",
    "h01_sha256",
    "s01_tumbling_window",
    "s03_sessionization",
    "d01_dedup_exact",
    "d03_minhash_signature",
    "d04_ngram_jaccard",
    "d05_simhash",
    "sim01_cosine_topk",
    "sim02_threshold_pairs",
    "txt01_stats",
    "txt04_token_count",
]


def materialize(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("gsel-bench")

    qs = entrymod.queries()
    timings: dict[str, float] = {}

    # one warmup to amortize JVM/codegen startup out of the first query
    materialize(qs[HEADLINE[0]](spark, sf_dir))

    total = 0.0
    for name in HEADLINE:
        t0 = time.time()
        materialize(qs[name](spark, sf_dir))
        dt = round(time.time() - t0, 3)
        timings[name] = dt
        total += dt

    print(
        json.dumps(
            {
                "metric": "headline_suite_seconds",
                "value": round(total, 3),
                "unit": "sec",
                "queries": timings,
                "sf": sf_dir,
            }
        )
    )


if __name__ == "__main__":
    main()
