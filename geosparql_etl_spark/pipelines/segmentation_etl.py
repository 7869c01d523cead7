"""segmentation-etl pipeline: nuclear segmentation patch CSVs -> TTL(.gz).

Reference: segmentation-etl/nuclear_segmentation_etl.py. The 4-level
directory traversal + nested Pool becomes ONE distributed CSV scan with
path-derived columns (sources/segmentation.py), and the per-file render
is a groupBy over (cancer_type, image_name, csv_name):

    read.csv(glob) + input_file_name regexes -> G2 WKT parse ->
    conditional property render -> A6 ordered group render -> K2 sink

Scale: a million patch CSVs become one job; no driver traversal, no
per-image Pool. The doc-assembly shuffle carries rendered strings only.

Parity: byte-identical to the reference renderer given the same
timestamp. NOTE the reference's timestamp here keeps '+00:00' (no 'Z'
normalization — segmentation-etl:178 differs from json-etl:83).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from geosparql_etl_spark.functions.geometry import parse_polygon_string_wkt
from geosparql_etl_spark.functions.hashing import sha256_id
from geosparql_etl_spark.operators.render import ordered_concat

# SNOMED nucleoplasm concept id (segmentation-etl:44)
NUCLEAR_MATERIAL_SNOMED_ID = "68841002"

_PREFIX_HEADER = (
    "@prefix dc:   <http://purl.org/dc/terms/> .\n"
    "@prefix exif: <http://www.w3.org/2003/12/exif/ns#> .\n"
    "@prefix geo:  <http://www.opengis.net/ont/geosparql#> .\n"
    "@prefix hal:  <https://halcyon.is/ns/> .\n"
    "@prefix prov: <http://www.w3.org/ns/prov#> .\n"
    "@prefix rdfs: <http://www.w3.org/2000/01/rdf-schema#> .\n"
    "@prefix sno:  <http://snomed.info/id/> .\n"
    "@prefix so:   <https://schema.org/> .\n"
    "@prefix xsd:  <http://www.w3.org/2001/XMLSchema#> .\n"
    "\n"
)


def _feature_block(wkt: Column, area: Column, physical: Column) -> Column:
    """One rdfs:member block (segmentation-etl:253-271): fixed 1.0
    probability, optional area/physicalSize when the CSV strings are
    non-empty."""
    base = F.concat(
        F.lit(
            "        rdfs:member          [ a                   geo:Feature;\n"
            "                               geo:hasGeometry     [ geo:asWKT  \""
        ),
        wkt,
        F.lit(
            "\"^^geo:wktLiteral ];\n"
            "                               hal:classification  sno:"
            + NUCLEAR_MATERIAL_SNOMED_ID
            + ";\n"
            "                               hal:measurement     "
            "[ hal:hasProbability  \"1.0\"^^xsd:float ]"
        ),
    )
    with_area = F.when(
        area.isNotNull() & (area != ""),
        F.concat(
            F.lit(
                ";\n                               hal:areaInPixels    \""
            ),
            area,
            F.lit("\"^^xsd:int"),
        ),
    ).otherwise(F.lit(""))
    with_phys = F.when(
        physical.isNotNull() & (physical != ""),
        F.concat(
            F.lit(
                ";\n                               hal:physicalSize    \""
            ),
            physical,
            F.lit("\"^^xsd:float"),
        ),
    ).otherwise(F.lit(""))
    return F.concat(base, with_area, with_phys, F.lit("\n                             ]"))


def render_ttl_documents(patches: DataFrame, timestamp: str) -> DataFrame:
    """patches (sources.segmentation.read_patch_csvs shape) ->
    (image_name, file_name, body): one TTL document per patch CSV.

    ``timestamp`` must be the '+00:00'-suffixed ISO string (the
    reference's isoformat here has no 'Z' normalization).
    """
    qualified = (
        patches.withColumn("wkt", parse_polygon_string_wkt(F.col("Polygon")))
        .where(F.col("wkt").isNotNull())
        .withColumn(
            "block",
            _feature_block(F.col("wkt"), F.col("AreaInPixels"), F.col("PhysicalSize")),
        )
    )
    bodies = qualified.groupBy("cancer_type", "image_name", "csv_name").agg(
        ordered_concat(F.col("row_seq"), F.col("block"), ";\n").alias("members")
    )

    files = patches.select(
        "cancer_type", "image_name", "csv_name", "patch"
    ).dropDuplicates(["cancer_type", "image_name", "csv_name"])
    docs = files.join(bodies, ["cancer_type", "image_name", "csv_name"], "left").withColumn(
        "members", F.coalesce(F.col("members"), F.lit(""))
    )

    image_hash = sha256_id(F.col("image_name"))
    p = F.col("patch")
    body = F.concat(
        F.lit(_PREFIX_HEADER),
        F.lit("<urn:sha256:"),
        image_hash,
        F.lit(
            ">\n        a            so:ImageObject;\n        dc:identifier \""
        ),
        F.col("image_name"),
        F.lit("\" .\n\n"),
        F.lit(
            "<>      a                    geo:FeatureCollection;\n"
            "        dc:creator           \"http://orcid.org/0000-0003-4165-4062\";\n"
            "        dc:date              \""
        ),
        F.lit(timestamp),
        F.lit(
            "\"^^xsd:dateTime;\n"
            "        dc:description       \"Nuclear segmentation predictions for "
        ),
        F.col("image_name"),
        F.lit(" - patch "),
        p["x"].cast("string"),
        F.lit("_"),
        p["y"].cast("string"),
        F.lit(" ("),
        p["width"].cast("string"),
        F.lit("x"),
        p["height"].cast("string"),
        F.lit(
            ")\";\n"
            "        dc:publisher         <https://ror.org/01882y777> , <https://ror.org/05qghxh33>;\n"
            "        dc:references        \"https://doi.org/10.1038/s41597-020-0528-1\";\n"
            "        dc:title             \"nuclear-segmentation-predictions\";"
        ),
        F.when(
            F.col("cancer_type").isNotNull() & (F.col("cancer_type") != ""),
            F.concat(
                F.lit("\n        hal:cancerType       \""),
                F.col("cancer_type"),
                F.lit("\";"),
            ),
        ).otherwise(F.lit("")),
        F.lit("\n        hal:patchX           \""),
        p["x"].cast("string"),
        F.lit("\"^^xsd:int;\n        hal:patchY           \""),
        p["y"].cast("string"),
        F.lit("\"^^xsd:int;\n        hal:patchWidth       \""),
        p["width"].cast("string"),
        F.lit("\"^^xsd:int;\n        hal:patchHeight      \""),
        p["height"].cast("string"),
        F.lit(
            "\"^^xsd:int;\n"
            "        prov:wasGeneratedBy  [ a                       prov:Activity;\n"
            "                               prov:used               <urn:sha256:"
        ),
        image_hash,
        F.lit(">;\n                             ];\n"),
        F.col("members"),
        F.lit(" .\n"),
    )

    # output layout: <image_name>/<cancer>_<csv stem>.ttl.gz
    # (segmentation-etl:299-307)
    stem = F.regexp_replace(F.col("csv_name"), r"\.csv$", "")
    file_name = F.concat(
        F.col("image_name"),
        F.lit("/"),
        F.col("cancer_type"),
        F.lit("_"),
        stem,
        F.lit(".ttl.gz"),
    )
    return docs.select(
        "cancer_type",
        "image_name",
        "csv_name",
        file_name.alias("file_name"),
        body.alias("body"),
    )


def run(
    spark,
    input_base: str,
    output_dir: str,
    timestamp: str,
    compress: bool = True,
    existing: DataFrame | None = None,
    config=None,
) -> DataFrame:
    """Full pipeline with optional incremental skip (P10: anti-join
    against existing output names instead of per-file exists checks).
    ``config`` (EngineConfig) supplies the sink gzip level."""
    from geosparql_etl_spark.config import EngineConfig
    from geosparql_etl_spark.operators.ledger import skip_existing_outputs
    from geosparql_etl_spark.sinks.ttl import write_documents_exact
    from geosparql_etl_spark.sources.segmentation import read_patch_csvs

    cfg = config or EngineConfig()
    patches = read_patch_csvs(spark, input_base)
    docs = render_ttl_documents(patches, timestamp)
    if existing is not None:
        docs = skip_existing_outputs(docs, existing, "file_name")
    write_documents_exact(
        docs, output_dir, compress=compress, gzip_level=cfg.gzip_level
    )
    return docs
