"""Explicit StructType schemas for every input shape the engine reads.

The reference is fully dynamic (dicts + defensive ``.get``); the engine
uses explicit schemas so Catalyst can prune columns and push filters into
the scan, and reproduces the reference's "missing field -> default"
semantics with ``coalesce`` at projection time (SURVEY.md §1.3).

Shapes follow FIXTURES.md and the reference readers:
  - GeoJSON FeatureCollection: json-etl/geojson_to_geosparql_etl.py:127-133
  - segmentation patch CSV:    segmentation-etl/nuclear_segmentation_etl.py:232-238
  - analysis document:         mongo-etl/mongodb_to_rdf.py:268-301
  - mark document:             mongo-etl/mongodb_to_rdf.py:360-412
  - slide_hashes sidecar:      sha256-hash/update_ttl_gz_from_json.py:25-40
"""

from __future__ import annotations

from pyspark.sql import types as T

# --- GeoJSON -----------------------------------------------------------

# coordinates: ring list -> ring -> point [x, y]
COORDINATES = T.ArrayType(T.ArrayType(T.ArrayType(T.DoubleType())))

GEOMETRY = T.StructType(
    [
        T.StructField("type", T.StringType()),
        T.StructField("coordinates", COORDINATES),
    ]
)

GEOJSON_FEATURE = T.StructType(
    [
        T.StructField("type", T.StringType()),
        T.StructField("geometry", GEOMETRY),
        T.StructField(
            "properties",
            T.StructType(
                [
                    T.StructField(
                        "measurements", T.MapType(T.StringType(), T.DoubleType())
                    ),
                ]
            ),
        ),
    ]
)

GEOJSON_FEATURE_COLLECTION = T.StructType(
    [
        T.StructField("type", T.StringType()),
        T.StructField("features", T.ArrayType(GEOJSON_FEATURE)),
    ]
)

# Exploded row form used by the engine (one row per feature).
GEOJSON_FEATURES_ROWS = T.StructType(
    [
        T.StructField("source_file", T.StringType(), False),
        T.StructField("feature_idx", T.IntegerType(), False),
        T.StructField("geometry_type", T.StringType()),
        T.StructField("coordinates", COORDINATES),
        T.StructField("measurements", T.MapType(T.StringType(), T.DoubleType())),
    ]
)

# --- Segmentation patch CSV ---------------------------------------------

SEGMENTATION_CSV = T.StructType(
    [
        # kept as strings at scan time: the reference reads csv.DictReader
        # strings and the engine reproduces empty-string-is-missing via
        # try_cast + coalesce (nuclear_segmentation_etl.py:261-267).
        T.StructField("AreaInPixels", T.StringType()),
        T.StructField("PhysicalSize", T.StringType()),
        T.StructField("Polygon", T.StringType()),
    ]
)

# --- Mongo documents -----------------------------------------------------

ANALYSIS_DOC = T.StructType(
    [
        T.StructField("_id", T.StringType(), False),
        T.StructField(
            "analysis",
            T.StructType(
                [
                    T.StructField("execution_id", T.StringType()),
                    T.StructField(
                        "algorithm_params",
                        T.StructType(
                            [
                                T.StructField("image_width", T.StringType()),
                                T.StructField("image_height", T.StringType()),
                                T.StructField("case_id", T.StringType()),
                            ]
                        ),
                    ),
                ]
            ),
        ),
        T.StructField(
            "image",
            T.StructType(
                [
                    T.StructField("imageid", T.StringType()),
                    T.StructField("subject", T.StringType()),
                    T.StructField("study", T.StringType()),
                    T.StructField("slide", T.StringType()),
                ]
            ),
        ),
    ]
)

MARK_DOC = T.StructType(
    [
        T.StructField("_id", T.StringType(), False),
        T.StructField(
            "provenance",
            T.StructType(
                [
                    T.StructField(
                        "analysis",
                        T.StructType([T.StructField("execution_id", T.StringType())]),
                    ),
                    T.StructField(
                        "image",
                        T.StructType(
                            [
                                T.StructField("imageid", T.StringType()),
                                T.StructField("slide", T.StringType()),
                            ]
                        ),
                    ),
                ]
            ),
        ),
        T.StructField(
            "geometries",
            T.StructType(
                [
                    T.StructField(
                        "features",
                        T.ArrayType(
                            T.StructType(
                                [
                                    T.StructField("geometry", GEOMETRY),
                                    T.StructField(
                                        "properties",
                                        T.StructType(
                                            [
                                                T.StructField(
                                                    "footprint", T.DoubleType()
                                                ),
                                                T.StructField(
                                                    "nucleustype", T.StringType()
                                                ),
                                            ]
                                        ),
                                    ),
                                ]
                            )
                        ),
                    ),
                ]
            ),
        ),
        T.StructField(
            "userUpdate",
            T.StructType(
                [
                    T.StructField(
                        "mark",
                        T.StructType(
                            [
                                T.StructField(
                                    "annotation",
                                    T.ArrayType(
                                        T.StructType(
                                            [
                                                T.StructField(
                                                    "annotationID", T.StringType()
                                                )
                                            ]
                                        )
                                    ),
                                ),
                            ]
                        ),
                    ),
                ]
            ),
        ),
    ]
)

# --- Sidecars / ledgers ---------------------------------------------------

SLIDE_HASHES = T.StructType(
    [
        T.StructField("slide", T.StringType(), False),
        T.StructField("hash", T.StringType(), False),
    ]
)

LEDGER = T.StructType(
    [
        T.StructField("id", T.StringType(), False),
        T.StructField("status", T.StringType(), False),  # completed | failed
        T.StructField("error", T.StringType()),
        T.StructField("ts", T.TimestampType()),
    ]
)

TTL_DOCUMENTS = T.StructType(
    [
        T.StructField("path", T.StringType(), False),
        T.StructField("text", T.StringType(), False),
    ]
)

# --- Driver test tables (TESTDATA.md) -------------------------------------

TESTDATA_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load_table(spark, sf_dir: str, name: str):
    """Read one driver-generated parquet table (column-pruned, pushdown-able)."""
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")
