"""Cross-configuration determinism audit: run every registry query
TWICE — once on the session's normal config, once with a deliberately
hostile layout (different shuffle-partition count + different input
split sizes, i.e. different partition boundaries and reduce-side
arrival orders) — and compare order-insensitive value multisets.

A query that differs between the two runs has nondeterminism a single
oracle comparison can never see (the classic cluster failure:
`round(sum(double))` landing on a half-cent boundary, a window
tie-broken by arrival order, an aggregate picking "first" of an
unordered group). Every such construct in this engine is supposed to
be engineered out — exact-long money sums, deterministic tie-break
keys, min-based SAMPLE — and this audit is the regression gate for
that claim at the whole-registry level.

Usage: python tools/determinism_audit.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import __spark_entry__ as entrymod  # noqa: E402
from check_oracle import rows_to_multiset  # noqa: E402

from geosparql_etl_spark.session import get_spark  # noqa: E402

# Streaming/stateful queries drain real micro-batch streams into temp
# sinks; re-running them under a mutated session config re-executes
# the whole stream pipeline, which is covered by their own
# stream-vs-batch tests. Everything else must pass.
HOSTILE = {
    # prime, small: different reduce key -> partition mapping AND
    # heavy multi-key-per-partition packing vs the default 32
    "spark.sql.shuffle.partitions": "7",
    # tiny split targets: every scan fractures into many more input
    # partitions, so per-partition fold orders all change
    "spark.sql.files.maxPartitionBytes": "1m",
    "spark.sql.files.openCostInBytes": "0",
    # disable AQE coalescing so the hostile partitioning sticks
    "spark.sql.adaptive.coalescePartitions.enabled": "false",
}


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    names = sys.argv[2:] or list(entrymod.queries())
    qs = entrymod.queries()

    spark = get_spark("determinism-audit")
    saved = {k: spark.conf.get(k, None) for k in HOSTILE}

    def run_once(name):
        df = qs[name](spark, sf_dir)
        return rows_to_multiset(df.collect(), df.columns)

    n_ok = n_diff = n_err = 0
    for name in names:
        t0 = time.time()
        try:
            base = run_once(name)
            for k, v in HOSTILE.items():
                spark.conf.set(k, v)
            try:
                hostile = run_once(name)
            finally:
                for k, v in saved.items():
                    if v is None:
                        spark.conf.unset(k)
                    else:
                        spark.conf.set(k, v)
        except Exception as exc:  # noqa: BLE001
            n_err += 1
            print(f"ERROR {name}: {type(exc).__name__}: {exc}"[:300])
            continue
        dt = time.time() - t0
        if base == hostile:
            n_ok += 1
            print(f"ok    {name}: {len(base)} rows ({dt:.1f}s)")
        else:
            n_diff += 1
            extra = [r for r in hostile if r not in base][:3]
            missing = [r for r in base if r not in hostile][:3]
            print(
                f"DIFF  {name}: {len(base)} vs {len(hostile)} rows; "
                f"missing={missing} extra={extra}"
            )
    print(f"\n{n_ok} ok, {n_diff} DIFF, {n_err} ERROR")
    return 1 if (n_diff or n_err) else 0


if __name__ == "__main__":
    sys.exit(main())
