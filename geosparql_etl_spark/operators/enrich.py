"""J4/S10: memoized enrichment join with negative cache.

The reference fetches a per-slide SHA-256 from a Drupal REST endpoint,
caching successes in a shared dict and failures in a negative cache so
each slide is fetched at most once across 20 workers
(mongo-etl/mongodb_to_rdf.py:205-235, 712-714; sha256_pipeline.py:30-58).

The Spark-native shape makes the cache structural instead of mutable
state:

    distinct keys -> (mapInPandas fetch, one call per key) -> broadcast
    left-join back -> null hash == negative cache -> hash_missing flag

At 100 TB the fact table streams through untouched; only the (tiny)
distinct key set crosses the Python boundary, and the join back is a
broadcast — no shuffle of the big side.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def enrich_with_lookup(
    facts: DataFrame,
    key_col: str,
    fetch: Callable[[str], str | None],
    value_col: str = "hash",
    missing_flag_col: str = "hash_missing",
) -> DataFrame:
    """Enrich ``facts`` with fetch(key); fetch runs once per distinct key.

    ``fetch`` must be picklable and side-effect free per key (it is the
    REST call in the reference; tests inject a deterministic fake).
    Failed/None fetches surface as a true ``missing_flag_col``, matching
    the reference's hashMissing semantics (mongodb_to_rdf.py:290-296).
    """
    keys = facts.select(key_col).where(F.col(key_col).isNotNull()).dropDuplicates()

    out_schema = f"{key_col} string, {value_col} string"

    def fetch_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            vals = []
            for k in pdf[key_col]:
                try:
                    vals.append(fetch(k))
                except Exception:
                    vals.append(None)  # negative cache: remembered as missing
            yield pd.DataFrame({key_col: pdf[key_col], value_col: vals})

    lookup = keys.mapInPandas(fetch_batches, schema=out_schema)
    enriched = facts.join(F.broadcast(lookup), on=key_col, how="left")
    return enriched.withColumn(
        missing_flag_col,
        F.col(key_col).isNotNull() & F.col(value_col).isNull(),
    )


def enrich_with_table(
    facts: DataFrame,
    lookup: DataFrame,
    key_col: str,
    value_col: str = "hash",
    missing_flag_col: str = "hash_missing",
) -> DataFrame:
    """J3/J5 static variant: broadcast left-join a pre-materialized sidecar
    (slide_hashes.json); unmatched keys -> missing flag
    (sha256-hash/update_ttl_gz_from_json.py:115-118, sha256-json-paad.py:64-71).
    """
    enriched = facts.join(
        F.broadcast(lookup.select(key_col, value_col).dropDuplicates([key_col])),
        on=key_col,
        how="left",
    )
    return enriched.withColumn(missing_flag_col, F.col(value_col).isNull())
