"""A1: per-row argmax over a map column (dominant-class selection).

The reference iterates measurements.items() keeping the first strictly
greater probability (json-etl/geojson_to_geosparql_etl.py:45-60), i.e.:
  - only keys with the given prefix participate,
  - ties keep the EARLIER entry (strict '>'),
  - values must exceed 0.0 to win at all,
  - empty/no-matching map -> (null, 0.0).

Implemented as a single ``aggregate`` fold over ``map_entries`` — map
iteration order is the stored entry order, matching dict insertion order
semantics. Pure column expression: codegen'd, no shuffle, no UDF.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dominant_entry(
    measurements: Column, prefix: str = "prob_", strip: bool = True
) -> Column:
    """struct(class: string, prob: double) of the first-max prefixed entry."""
    entries = F.map_entries(measurements)
    zero = F.struct(
        F.lit(None).cast("string").alias("class"),
        F.lit(0.0).alias("prob"),
    )
    folded = F.aggregate(
        entries,
        zero,
        lambda acc, e: F.when(
            e["key"].startswith(prefix) & (e["value"] > acc["prob"]),
            F.struct(
                (
                    F.replace(e["key"], F.lit(prefix), F.lit(""))
                    if strip
                    else e["key"]
                ).alias("class"),
                e["value"].alias("prob"),
            ),
        ).otherwise(acc),
    )
    return F.when(measurements.isNotNull(), folded).otherwise(zero)
