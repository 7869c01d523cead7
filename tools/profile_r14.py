"""Per-query time split: plan-build (driver) vs execution (noop sink).

Usage: python tools/profile_r14.py <sf_dir> <query> [<query> ...]

For each query: builds the DataFrame (Python construction + analysis),
forces the physical plan (optimization + physical planning, driver
side), then materializes via the noop sink twice (first = execution
incl. codegen, second = warm execution). Prints one line per query:

    <name> build=<s> plan=<s> exec1=<s> exec2=<s>

This is a measurement harness for the round-14 optimization work (guide
section 1) — not part of the bench contract.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

import __spark_entry__ as entrymod  # noqa: E402

from geosparql_etl_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1]
    names = sys.argv[2:]
    spark = get_spark("gsel-profile")
    qs = entrymod.queries()
    # JVM/codegen warmup so the first profiled query is not charged
    # session spin-up
    from pyspark.sql import functions as F

    spark.range(1_000_000).groupBy((F.col("id") % 7).alias("k")).count(
    ).write.format("noop").mode("overwrite").save()

    for name in names:
        spark.sparkContext.setJobDescription(f"profile:{name}")
        t0 = time.time()
        df = qs[name](spark, sf_dir)
        t1 = time.time()
        # force optimization + physical planning (driver-side)
        _ = df._jdf.queryExecution().executedPlan()
        t2 = time.time()
        df.write.format("noop").mode("overwrite").save()
        t3 = time.time()
        df2 = qs[name](spark, sf_dir)
        df2.write.format("noop").mode("overwrite").save()
        t4 = time.time()
        print(
            f"{name} build={t1 - t0:.3f} plan={t2 - t1:.3f} "
            f"exec1={t3 - t2:.3f} exec2={t4 - t3:.3f}",
            flush=True,
        )


if __name__ == "__main__":
    main()
