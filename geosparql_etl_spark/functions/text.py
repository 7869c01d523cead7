"""String / regex / formatting expressions (T1-T10, SURVEY.md §2.7).

Each mirrors a scalar the reference implements imperatively; all are
native Column expressions.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# T1: filename -> image id ---------------------------------------------------


def extract_image_id(filename: Column) -> Column:
    """Text before the first '.' once a trailing '.geojson' is stripped;
    if there is no dot at all, the stripped name itself.

    Ref: json-etl/geojson_to_geosparql_etl.py:63-69.
    """
    stripped = F.regexp_replace(filename, r"\.geojson$", "")
    return F.split(stripped, r"\.")[0]


# T2: patch filename -> {x, y, width, height, base_name} with fallback ------


def patch_metadata(filename: Column) -> Column:
    """Parse 'X_Y_W_H_..." -features.csv' names; non-numeric or short names
    fall back to x=y=0, w=h=40000 (the reference's default assumption).

    Ref: segmentation-etl/nuclear_segmentation_etl.py:79-114.
    """
    name = F.regexp_replace(filename, r"\.csv$", "")
    parts = F.split(name, "_")
    # get() not try_element_at(): TryElementAt breaks codegen under
    # expression splitting (see functions/geometry.py outer_ring note).
    x = F.get(parts, 0).try_cast("int")
    y = F.get(parts, 1).try_cast("int")
    w = F.get(parts, 2).try_cast("int")
    h = F.get(parts, 3).try_cast("int")
    ok = (
        (F.size(parts) >= 4)
        & x.isNotNull()
        & y.isNotNull()
        & w.isNotNull()
        & h.isNotNull()
    )
    return F.struct(
        F.when(ok, x).otherwise(F.lit(0)).alias("x"),
        F.when(ok, y).otherwise(F.lit(0)).alias("y"),
        F.when(ok, w).otherwise(F.lit(40000)).alias("width"),
        F.when(ok, h).otherwise(F.lit(40000)).alias("height"),
        name.alias("base_name"),
    )


# T3: prefix strip / add -----------------------------------------------------


def strip_prefix(col: Column, prefix: str) -> Column:
    """Remove a literal prefix everywhere it occurs (reference uses
    str.replace, which is global: json-etl:55)."""
    return F.replace(col, F.lit(prefix), F.lit(""))


def cancer_type_from_dir(dirname: Column) -> Column:
    """'blca_polygon' -> 'blca' (the TTL cancerType value and the
    'blca_' filename prefix stem). Ref: segmentation-etl:384-385."""
    return F.replace(dirname, F.lit("_polygon"), F.lit(""))


# T4/T5/T6: TTL text extraction / substitution -------------------------------

SLIDE_ID_RE = r'hal:slideId\s+"(\d+)"'
URN_HASH_RE = r"<urn:(?:sha256|md5):([0-9a-fA-F]+)>"


def extract_slide_id(ttl_text: Column) -> Column:
    """T4. Ref: sha256-hash/update_hashes.py:49-58."""
    return F.nullif(F.regexp_extract(ttl_text, SLIDE_ID_RE, 1), F.lit(""))


def extract_urn_hash(ttl_text: Column) -> Column:
    """T4. Ref: sha256-hash/update_hashes.py:60-68."""
    return F.nullif(F.regexp_extract(ttl_text, URN_HASH_RE, 1), F.lit(""))


def replace_urn_hash(ttl_text: Column, new_hash: Column) -> Column:
    """T5: substitute every sha256/md5 URN with the new sha256 URN
    (also migrates legacy md5 URNs).

    Ref: update_ttl_gz_from_json.py:61-74, sha256-json-paad.py:54-62.
    """
    return F.regexp_replace(
        ttl_text,
        r"<urn:(?:sha256|md5):[0-9a-fA-F]+>",
        F.concat(F.lit("<urn:sha256:"), new_hash, F.lit(">")),
    )


def mark_missing_hash(ttl_text: Column, hash_col: Column) -> Column:
    """T6: when no hash is available, tag the image object with
    'hal:missing true' instead of rewriting the URN.

    Ref: sha256-json-paad.py:64-71.
    """
    tagged = F.regexp_replace(
        ttl_text,
        r"a\s+so:ImageObject\s*;",
        'a so:ImageObject ;\\n    hal:missing "true"^^xsd:boolean ;',
    )
    return F.when(hash_col.isNull(), tagged).otherwise(
        replace_urn_hash(ttl_text, hash_col)
    )


# T7: fixed-width numeric formats --------------------------------------------


def batch_file_name(batch_id: Column) -> Column:
    """'batch_%06d.ttl.gz'. Ref: mongo-etl/mongodb_to_rdf.py:553."""
    return F.format_string("batch_%06d.ttl.gz", batch_id.cast("int"))


def prob_6f(value: Column) -> Column:
    """'%.6f' probability rendering. Ref: json-etl:171."""
    return F.format_string("%.6f", value)


# T8: ISO-8601 UTC timestamp with Z ------------------------------------------


def iso_utc(ts: Column) -> Column:
    """ISO-8601 with 'Z' suffix; microseconds kept when present, matching
    datetime.isoformat() (no microseconds -> seconds precision).

    Ref: json-etl:83, segmentation-etl:178. Engine policy: the timestamp
    is always an injected parameter so runs are deterministic (tests pin it).
    """
    base = F.date_format(ts, "yyyy-MM-dd'T'HH:mm:ss")
    micros = F.date_format(ts, "SSSSSS")
    return F.when(
        micros == "000000", F.concat(base, F.lit("Z"))
    ).otherwise(F.concat(base, F.lit("."), micros, F.lit("Z")))


# T9: archive-extension stripping ---------------------------------------------


def strip_tar_gz(name: Column) -> Column:
    """Ref: sha256-csv-2019.py:14-30."""
    return F.regexp_replace(name, r"\.(tar\.gz|svs|tgz)$", "")


# T10: JSON encoding -----------------------------------------------------------


def doc_to_json(struct_col: Column) -> Column:
    """Serialize a struct to JSON; explicit schema already coerced
    ObjectId/Decimal/datetime equivalents to string/double/timestamp,
    which subsumes the reference's recursive coercion
    (utils/serialization.py:11-91)."""
    return F.to_json(struct_col)
