"""S2/S3: segmentation patch CSVs under the 4-level directory hierarchy
  <base>/<cancer>_polygon/<slide>.svs.tar.gz/<cancer>_polygon/<slide>.svs/<patch>-features.csv

The reference walks this tree in Python and threads (cancer_type,
image_name) down to each worker (nuclear_segmentation_etl.py:363-446).
Spark shape: ONE glob CSV scan + regexp_extract over input_file_name()
— path-derived columns are computed scan-side and the whole tree reads
as a single distributed job (no driver traversal; a million patch files
list in parallel on the cluster).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from geosparql_etl_spark.functions.text import cancer_type_from_dir, patch_metadata
from geosparql_etl_spark.schemas import SEGMENTATION_CSV

# .../<cancer>_polygon/<archive>/<inner>/<image>.svs/<file>-features.csv
_PATH_RE = r"^.*/([^/]+)_polygon/[^/]+/[^/]+/([^/]+)\.svs/([^/]+)$"


def read_patch_csvs(spark: SparkSession, base: str, glob: str | None = None) -> DataFrame:
    """Rows: AreaInPixels, PhysicalSize, Polygon (raw strings, S2) +
    cancer_type, image_name, csv_name, patch (x/y/width/height/base_name)."""
    path = glob or f"{base}/*_polygon/*/*/*.svs/*-features.csv"
    df = (
        spark.read.schema(SEGMENTATION_CSV)
        .option("header", "true")
        .csv(path)
        .withColumn("__path", F.input_file_name())
    )
    return (
        df.withColumn("cancer_type", F.regexp_extract(F.col("__path"), _PATH_RE, 1))
        .withColumn(
            "image_name",
            F.concat(F.regexp_extract(F.col("__path"), _PATH_RE, 2), F.lit(".svs")),
        )
        .withColumn("csv_name", F.url_decode(F.regexp_extract(F.col("__path"), _PATH_RE, 3)))
        .withColumn("patch", patch_metadata(F.col("csv_name")))
        .withColumn("row_seq", F.monotonically_increasing_id())
        .drop("__path")
    )
