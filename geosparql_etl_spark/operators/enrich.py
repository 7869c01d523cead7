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
def http_json_fetch(
    url_template: str,
    field_path: tuple = (),
    timeout: float = 10.0,
    retries: int = 2,
    headers: dict[str, str] | None = None,
    basic_auth: tuple[str, str] | None = None,
) -> Callable[[str], str | None]:
    """Build a real REST ``fetch`` for enrich_with_lookup (S10) on the
    stdlib only — the reference GETs {base}/{id}?_format=json with
    basic auth and digs field_iip_path[0].value out of the JSON
    (sha256_pipeline.py:30-58); here that is
    ``http_json_fetch("https://host/node/{key}?_format=json",
    ("field_iip_path", 0, "value"), basic_auth=(user, pw))``.

    HTTP errors raise (enrich_with_lookup's per-key try/except turns
    them into the negative cache); transient failures retry with a
    deterministic linear backoff. The callable closes over plain
    values, so it pickles to executors.
    """
    import base64
    import json as _json
    import time as _time
    import urllib.request

    hdrs = dict(headers or {})
    if basic_auth is not None:
        token = base64.b64encode(
            f"{basic_auth[0]}:{basic_auth[1]}".encode()
        ).decode("ascii")
        hdrs["Authorization"] = f"Basic {token}"

    def fetch(key: str) -> str | None:
        url = url_template.format(key=key)
        last: Exception | None = None
        for attempt in range(retries + 1):
            try:
                req = urllib.request.Request(url, headers=hdrs)
                with urllib.request.urlopen(req, timeout=timeout) as resp:
                    doc = _json.loads(resp.read().decode("utf-8"))
                for step in field_path:
                    doc = doc[step]
                return None if doc is None else str(doc)
            except Exception as e:  # noqa: BLE001 - retried, then re-raised
                last = e
                if attempt < retries:
                    _time.sleep(0.1 * (attempt + 1))
        raise last  # -> negative cache in enrich_with_lookup
    return fetch
