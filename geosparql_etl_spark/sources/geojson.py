"""S1: GeoJSON FeatureCollection directory scan -> one row per feature.

Replaces the reference's glob + json.load + Pool(20) per-file loop
(json-etl/geojson_to_geosparql_etl.py:185-236) with a schema'd multiline
JSON scan; per-file identity comes from input_file_name(), feature order
from posexplode — both are what the renderer keys on.

Scale: spark.read.json splits across files (one task per file for
multiline documents); thousands of GeoJSON files parallelize to cluster
width with no driver involvement.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from geosparql_etl_spark.schemas import GEOJSON_FEATURE_COLLECTION


def read_geojson_features(spark: SparkSession, path: str) -> DataFrame:
    """Rows: source_file, feature_idx, geometry_type, coordinates,
    measurements (GEOJSON_FEATURES_ROWS shape)."""
    raw = (
        spark.read.schema(GEOJSON_FEATURE_COLLECTION)
        .option("multiLine", "true")
        .json(path)
        .withColumn(
            "source_file", F.element_at(F.split(F.input_file_name(), "/"), -1)
        )
    )
    return raw.select(
        "source_file",
        F.posexplode_outer("features").alias("feature_idx", "feature"),
    ).select(
        "source_file",
        "feature_idx",
        F.col("feature.geometry.type").alias("geometry_type"),
        F.col("feature.geometry.coordinates").alias("coordinates"),
        F.col("feature.properties.measurements").alias("measurements"),
    )
