"""mongo-etl pipeline: analysis x mark documents -> batched TTL.gz docs.

Reference: mongo-etl/mongodb_to_rdf.py (the flagship pipeline: J1 join +
W1 batching + checkpoint ledger + hash enrichment). The per-analysis
worker loop becomes one declarative plan:

    analyses -> P9 ledger anti-join -> P2 projection w/ defaults ->
    J4 slide-hash enrichment (dedup -> lookup -> broadcast join) ->
    J1 equi-join marks on (execution_id, imageid [, slide]) ->
    P3/P7/P8/G3 mark render -> W1 batch window (1000 marks) ->
    A6 per-(analysis, batch) ordered doc assembly -> K2 gzip sink

The reference pushes J1 into MongoDB's index per analysis (one query per
analysis, 20 workers); Spark instead shuffles both sides once on the
join key — at 4B marks that is the difference between 4M index scans
and one partitioned hash join. Batch docs then group WITHOUT a second
shuffle of mark blocks (window and groupBy share partitioning).

Determinism: the reference emits marks in Mongo cursor order; the engine
orders by mark _id (monotone ObjectIds ≈ insertion order) — documented
deviation that makes output reproducible (SURVEY.md §7 "What's hard").

Parity note: the header has NO timestamp field (unlike json/segmentation
pipelines), so rendered bytes are fully deterministic given inputs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from geosparql_etl_spark.functions.geometry import denormalized_polygon_wkt, image_bbox_wkt
from geosparql_etl_spark.functions.hashing import sha256_id
from geosparql_etl_spark.operators.batching import with_batch_id
from geosparql_etl_spark.operators.enrich import enrich_with_table
from geosparql_etl_spark.operators.ledger import filter_pending
from geosparql_etl_spark.operators.render import ordered_concat

BATCH_SIZE = 1000  # marks per output file (mongodb_to_rdf.py:31)

_PREFIXES = (
    "@prefix geo: <http://www.opengis.net/ont/geosparql#> .\n"
    "@prefix rdf: <http://www.w3.org/1999/02/22-rdf-syntax-ns#> .\n"
    "@prefix rdfs: <http://www.w3.org/2000/01/rdf-schema#> .\n"
    "@prefix xsd: <http://www.w3.org/2001/XMLSchema#> .\n"
    "@prefix snomed: <http://snomed.info/id/> .\n"
    "@prefix so:   <https://schema.org/> .\n"
    "@prefix loinc: <http://loinc.org/rdf/> .\n"
    "@prefix hal: <https://halcyon.is/ns/> .\n"
)


def _nonempty(c: Column) -> Column:
    return c.isNotNull() & (c != "")


def project_analyses(analyses: DataFrame) -> DataFrame:
    """P2: deep nested projection with the reference's fallback defaults
    (mongodb_to_rdf.py:268-301). Missing/invalid dims -> 40000; empty
    case_id -> imageid."""
    params = F.col("analysis.algorithm_params")
    return analyses.select(
        F.col("_id").alias("analysis_id"),
        F.coalesce(F.col("analysis.execution_id"), F.lit("unknown")).alias("exec_id"),
        F.col("image.imageid").alias("image_id"),
        F.coalesce(F.col("image.subject"), F.lit("")).alias("subject_id"),
        F.coalesce(F.col("image.study"), F.lit("")).alias("study"),
        F.coalesce(F.col("image.slide"), F.lit("")).alias("slide"),
        F.coalesce(params["image_width"].try_cast("int"), F.lit(40000)).alias(
            "image_width"
        ),
        F.coalesce(params["image_height"].try_cast("int"), F.lit(40000)).alias(
            "image_height"
        ),
        F.coalesce(F.nullif(params["case_id"], F.lit("")), F.col("image.imageid")).alias(
            "case_id"
        ),
    )


def _mark_block(
    mark_id: Column,
    exec_id: Column,
    nucleustype: Column,
    is_nuclear: Column,
    annotation: Column,
    footprint: Column,
    wkt: Column,
) -> Column:
    """One geo:hasMember block (mongodb_to_rdf.py:415-455); conditional
    lines render only when their source field is present/valid."""
    return F.concat(
        F.lit(
            " ;\n        geo:hasMember [\n            a geo:Feature ;\n"
            "            hal:markId \""
        ),
        mark_id,
        F.lit("\" ;\n            hal:executionId \""),
        exec_id,
        F.lit("\" ;"),
        F.when(
            _nonempty(nucleustype),
            F.concat(
                F.lit("\n            hal:nucleusType \""), nucleustype, F.lit("\" ;")
            ),
        ).otherwise(F.lit("")),
        F.when(
            is_nuclear,
            F.lit(
                "\n            hal:hasMaterialType snomed:68841002 ;  # Nuclear material"
            ),
        ).otherwise(F.lit("")),
        F.when(
            annotation.isNotNull(),
            F.concat(
                F.lit("\n            hal:hasAnnotation <"),
                annotation,
                F.lit("> ;  # Human-verified SNOMED code"),
            ),
        ).otherwise(F.lit("")),
        F.lit("\n            hal:footprint "),
        F.when(footprint.isNull(), F.lit("0")).otherwise(footprint.cast("string")),
        F.lit(
            " ;\n            geo:hasGeometry [\n                geo:asWKT \""
        ),
        wkt,
        F.lit(
            "\"^^geo:wktLiteral\n            ]\n        ]"
        ),
    )


def render_marks(marks_joined: DataFrame) -> DataFrame:
    """marks already joined to their analysis (needs image_width/height):
    project P3 first-feature, apply P7/P8 predicates, G3 WKT, render.
    Rows whose geometry is empty/invalid are dropped (the reference's
    '(\"\", False)' skip channel)."""
    feature = F.get(F.col("geometries.features"), 0)
    nucleustype = F.coalesce(feature["properties"]["nucleustype"], F.lit(""))
    # P8: >= 3 dot-separated parts -> nuclear material
    is_nuclear = _nonempty(nucleustype) & (
        F.size(F.split(nucleustype, r"\.")) >= 3
    )
    # P7: first annotation must be a SNOMED URI
    ann0 = F.get(F.col("userUpdate.mark.annotation"), 0)["annotationID"]
    annotation = F.when(
        ann0.isNotNull() & ann0.startswith("http://snomed.info/id/"), ann0
    )
    wkt = denormalized_polygon_wkt(
        feature["geometry"]["type"],
        feature["geometry"]["coordinates"],
        F.col("image_width").cast("double"),
        F.col("image_height").cast("double"),
    )
    return (
        marks_joined.withColumn("wkt", wkt)
        .where(F.col("wkt").isNotNull())
        .withColumn(
            "block",
            _mark_block(
                F.col("_id"),
                F.coalesce(F.col("provenance.analysis.execution_id"), F.lit("unknown")),
                nucleustype,
                is_nuclear,
                annotation,
                feature["properties"]["footprint"],
                F.col("wkt"),
            ),
        )
    )


def _header(batch_num: Column) -> Column:
    """TTL header + image object + collection opener
    (mongodb_to_rdf.py:304-357)."""
    w = F.col("image_width").cast("string")
    h = F.col("image_height").cast("string")

    def opt(label: str, col: Column) -> Column:
        return F.when(
            _nonempty(col),
            F.concat(F.lit(f"    {label} \""), col, F.lit("\" ;\n")),
        ).otherwise(F.lit(""))

    return F.concat(
        F.lit("# GeoSPARQL representation of pathology image analysis\n# Analysis ID: "),
        F.col("analysis_id"),
        F.lit("\n# Execution: "),
        F.col("exec_id"),
        F.lit("\n# Image: "),
        F.col("image_id"),
        F.lit("\n# Batch: "),
        F.format_string("%06d", batch_num.cast("int")),
        F.lit("\n\n" + _PREFIXES + "\n<urn:sha256:"),
        F.col("image_hash"),
        F.lit(">\n    a so:ImageObject ;\n    hal:imageId \""),
        F.col("image_id"),
        F.lit("\" ;\n"),
        opt("hal:caseId", F.col("case_id")),
        opt("hal:subjectId", F.col("subject_id")),
        opt("hal:studyId", F.col("study")),
        opt("hal:slideId", F.col("slide")),
        F.when(
            F.col("hash_missing"),
            F.lit("    hal:hashMissing \"true\"^^xsd:boolean ;\n"),
        ).otherwise(F.lit("")),
        F.lit("    hal:imageWidth "),
        w,
        F.lit(" ;\n    hal:imageHeight "),
        h,
        F.lit(" ;\n    hal:analysisId \""),
        F.col("analysis_id"),
        F.lit(
            "\" ;\n    geo:hasGeometry [\n        geo:asWKT \""
        ),
        image_bbox_wkt(F.col("image_width"), F.col("image_height")),
        F.lit(
            "\"^^geo:wktLiteral\n    ] ;\n"
            "    hal:hasFeatureCollection [\n        a geo:FeatureCollection"
        ),
    )


def render_ttl_documents(
    analyses: DataFrame,
    marks: DataFrame,
    slide_hashes: DataFrame | None = None,
    ledger: DataFrame | None = None,
    batch_size: int = BATCH_SIZE,
) -> DataFrame:
    """Full mongo-etl plan -> one row per output batch file:
    (exec_id, image_id, batch_num, mark_count, file_name, body).

    ``slide_hashes``: optional (slide, hash) lookup (J4 enrichment);
    missing entries set hal:hashMissing and fall back to sha256(image_id).
    ``ledger``: optional processed-ids table (P9 anti-join on analysis _id).
    """
    if ledger is not None:
        analyses = filter_pending(analyses, ledger, "_id")

    a = project_analyses(analyses)

    # J4: enrichment with negative-cache semantics
    if slide_hashes is not None:
        a = enrich_with_table(
            a.withColumn("slide_key", F.nullif(F.col("slide"), F.lit(""))),
            slide_hashes.withColumnRenamed("slide", "slide_key"),
            "slide_key",
            value_col="hash",
            missing_flag_col="hash_missing",
        ).drop("slide_key")
    else:
        a = a.withColumn("hash", F.lit(None).cast("string")).withColumn(
            "hash_missing", F.lit(False)
        )
    a = a.withColumn(
        "image_hash", F.coalesce(F.col("hash"), sha256_id(F.col("image_id")))
    ).drop("hash")

    # J1: the flagship multi-key equi-join. Slide participates only when
    # the analysis has one (mongodb_to_rdf.py:503-509).
    joined = marks.alias("m").join(
        a.alias("a"),
        (F.col("m.provenance.analysis.execution_id") == F.col("a.exec_id"))
        & (F.col("m.provenance.image.imageid") == F.col("a.image_id"))
        & (
            (F.col("a.slide") == "")
            | (F.coalesce(F.col("m.provenance.image.slide"), F.lit("")) == F.col("a.slide"))
        ),
        "inner",
    )

    rendered = render_marks(joined)

    # W1: fixed-size batching over successful marks, ordered by mark _id
    batched = with_batch_id(
        rendered, ["analysis_id"], "_id", batch_size=batch_size
    ).withColumn("batch_num", F.col("batch_id") + 1)

    bodies = batched.groupBy(
        "analysis_id",
        "exec_id",
        "image_id",
        "subject_id",
        "study",
        "slide",
        "case_id",
        "image_width",
        "image_height",
        "image_hash",
        "hash_missing",
        "batch_num",
    ).agg(
        ordered_concat(F.col("seq_in_group"), F.col("block"), "").alias("members"),
        F.count("*").alias("mark_count"),
    )

    body = F.concat(_header(F.col("batch_num")), F.col("members"), F.lit("\n    ] .\n"))
    file_name = F.concat(
        F.col("exec_id"),
        F.lit("/"),
        F.col("image_id"),
        F.lit("/"),
        F.format_string("batch_%06d.ttl.gz", F.col("batch_num").cast("int")),
    )
    return bodies.select(
        "analysis_id",
        "exec_id",
        "image_id",
        F.col("batch_num").cast("int").alias("batch_num"),
        "mark_count",
        file_name.alias("file_name"),
        body.alias("body"),
    )


def run(
    spark,
    analyses: DataFrame,
    marks: DataFrame,
    output_dir: str,
    slide_hashes: DataFrame | None = None,
    ledger_path: str | None = None,
    config=None,
) -> DataFrame:
    """Execute the pipeline end-to-end with exact reference file layout
    and ledger append (K6): exactly-once per job via the file commit
    protocol + atomic ledger append after the write. Pending analyses
    that yield NO document (every mark dropped by the empty/invalid-
    geometry skip channel, or no matching marks at all) are recorded as
    FAILED with an error string — the reference's per-analysis failure
    records (mongodb_to_rdf.py:165-174, utils/checkpoint.py:158-234)."""
    from geosparql_etl_spark.config import EngineConfig
    from geosparql_etl_spark.operators.ledger import (
        append_ledger,
        read_ledger,
        record_failures,
    )
    from geosparql_etl_spark.sinks.ttl import write_documents_exact

    cfg = config or EngineConfig()
    if ledger_path is None:
        ledger_path = cfg.ledger_path
    ledger = read_ledger(spark, ledger_path) if ledger_path else None
    docs = render_ttl_documents(
        analyses, marks, slide_hashes, ledger, batch_size=cfg.batch_size
    )
    write_documents_exact(
        docs, output_dir, compress=cfg.compress, gzip_level=cfg.gzip_level
    )
    if ledger_path:
        done = docs.select(
            F.col("analysis_id").alias("id"),
            F.lit("completed").alias("status"),
            F.lit(None).cast("string").alias("error"),
            F.current_timestamp().alias("ts"),
        ).dropDuplicates(["id"])
        append_ledger(done, ledger_path)
        pending = (
            filter_pending(analyses, ledger, "_id")
            if ledger is not None
            else analyses
        )
        failed = pending.select(F.col("_id").alias("id")).join(
            done.select("id"), "id", "left_anti"
        ).withColumn(
            "error",
            F.lit("no renderable marks (empty/invalid geometry or no matching marks)"),
        )
        record_failures(failed, ledger_path)
    return docs


def run_from_config(spark, config) -> DataFrame:
    """Reference ``main()`` analog (mongodb_to_rdf.py:660-700): source
    db.analysis / db.mark through the document-store adapter (live
    connector when config.mongo.uri is set, parquet/JSON stand-ins
    otherwise) and execute with the config's batch/ledger/sink knobs."""
    from geosparql_etl_spark.sources.mongo import read_analyses, read_marks

    return run(
        spark,
        read_analyses(spark, config.mongo),
        read_marks(spark, config.mongo),
        config.output_dir,
        ledger_path=config.ledger_path,
        config=config,
    )
