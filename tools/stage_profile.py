"""Per-stage executor-time breakdown for one or more queries.

Usage: python tools/stage_profile.py <sf_dir> <query> [<query> ...]

Runs each query twice through the noop sink (rep0 warms codegen/JIT,
rep1 is the measured pass), then prints the completed stages sorted by
executor run time, with task counts — the fastest way to see which
stage serializes (1 task) or dominates. Round-14 measurement harness
(guide §1); not part of the bench contract.
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

import __spark_entry__ as entrymod  # noqa: E402

from geosparql_etl_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1]
    names = sys.argv[2:]
    spark = get_spark(
        "gsel-stageprof", extra_conf={"spark.ui.enabled": "true"}
    )
    from pyspark.sql import functions as F

    spark.range(1_000_000).groupBy((F.col("id") % 7).alias("k")).count(
    ).write.format("noop").mode("overwrite").save()
    qs = entrymod.queries()
    ui = spark.sparkContext.uiWebUrl
    app = spark.sparkContext.applicationId

    def stage_rows():
        data = json.load(
            urllib.request.urlopen(
                f"{ui}/api/v1/applications/{app}/stages?status=COMPLETE"
            )
        )
        return {
            s["stageId"]: (
                s["executorRunTime"],
                s["numCompleteTasks"],
                s["name"].split("\n")[0][:90],
            )
            for s in data
        }

    for name in names:
        before = stage_rows()
        spark.sparkContext.setJobDescription(f"stageprof:{name}")
        qs[name](spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()  # rep0: codegen/JIT warm
        mid = stage_rows()
        t0 = time.time()
        qs[name](spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()
        wall = time.time() - t0
        after = stage_rows()
        fresh0 = {k: v for k, v in mid.items() if k not in before}
        fresh1 = {k: v for k, v in after.items() if k not in mid}
        print(f"== {name}: rep1 wall={wall:.2f}s "
              f"(rep0 stages={len(fresh0)}, rep1 stages={len(fresh1)})")
        for sid, (ms, ntask, sname) in sorted(
            fresh1.items(), key=lambda kv: -kv[1][0]
        )[:12]:
            print(f"  {ms:8d}ms  tasks={ntask:4d}  s{sid}  {sname}")
        sys.stdout.flush()


if __name__ == "__main__":
    main()
