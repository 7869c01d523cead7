"""K5: RDF serialization formats over a distributed triples DataFrame.

The reference serializes an in-memory rdflib Graph to turtle / xml / n3 /
nt / json-ld (mongo-etl/utils/rdf_utils.py:258-282 — a single-process
``graph.serialize``). The engine's unit of scale is a TRIPLES DataFrame
(one row per statement), so every format here renders as a per-row or
per-subject-group expression — no driver-side graph object, no Python
UDFs; a 100 TB graph serializes with the same plan as a 100-row one.

Formats:
  - ``nt`` (N-Triples): one line per triple — the natural distributed
    interchange format (line-oriented, order-free, cat-able).
  - ``turtle`` / ``n3``: one block per subject, full-URI form (valid
    turtle is valid N3; like rdflib, the n3 writer emits turtle syntax
    when no N3-only constructs are present).
  - ``json-ld``: one expanded-form node object per subject per line
    (concatenating lines with commas inside ``[...]`` yields a single
    valid JSON-LD document; each line alone is also valid JSON-LD).
  - ``xml`` (RDF/XML): one ``rdf:Description`` element per subject;
    ``rdfxml_document`` wraps the parts in the rdf:RDF envelope.

Triple rows use TRIPLE_SCHEMA: ``subject``/``predicate`` are absolute
URIs, ``object`` is a URI or a literal lexical form depending on
``is_literal``; ``datatype`` (URI) and ``lang`` are optional literal
qualifiers (at most one set, matching RDF 1.1).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

TRIPLE_SCHEMA = (
    "subject string, predicate string, object string, "
    "is_literal boolean, datatype string, lang string"
)

_FORMATS = ("nt", "ntriples", "turtle", "ttl", "n3", "json-ld", "xml")


def _escape_nt(col: Column) -> Column:
    """N-Triples literal escaping (shared by turtle: same quoted form)."""
    out = F.replace(col, F.lit("\\"), F.lit("\\\\"))
    out = F.replace(out, F.lit('"'), F.lit('\\"'))
    out = F.replace(out, F.lit("\n"), F.lit("\\n"))
    out = F.replace(out, F.lit("\r"), F.lit("\\r"))
    return F.replace(out, F.lit("\t"), F.lit("\\t"))


def _object_term(df: DataFrame) -> Column:
    """Render the object position: <uri>, "lit", "lit"@lang or
    "lit"^^<dt>."""
    lit = F.concat(F.lit('"'), _escape_nt(F.col("object")), F.lit('"'))
    lit = F.when(
        F.col("lang").isNotNull(), F.concat(lit, F.lit("@"), F.col("lang"))
    ).when(
        F.col("datatype").isNotNull(),
        F.concat(lit, F.lit("^^<"), F.col("datatype"), F.lit(">")),
    ).otherwise(lit)
    return F.when(F.col("is_literal"), lit).otherwise(
        F.concat(F.lit("<"), F.col("object"), F.lit(">"))
    )


def render_ntriples(triples: DataFrame, out_col: str = "line") -> DataFrame:
    """One N-Triples statement per row."""
    return triples.select(
        F.concat(
            F.lit("<"), F.col("subject"), F.lit("> <"), F.col("predicate"),
            F.lit("> "), _object_term(triples), F.lit(" ."),
        ).alias(out_col)
    )


def render_turtle(triples: DataFrame, out_col: str = "block") -> DataFrame:
    """One turtle block per subject: predicates ';'-chained, object
    lists ','-chained, deterministic (predicate, object) order."""
    po = triples.select(
        "subject",
        F.concat(
            F.lit("<"), F.col("predicate"), F.lit("> "), _object_term(triples)
        ).alias("__po"),
    )
    return (
        po.groupBy("subject")
        .agg(F.array_sort(F.collect_list("__po")).alias("__pos"))
        .select(
            F.concat(
                F.lit("<"), F.col("subject"), F.lit("> "),
                F.concat_ws(" ;\n    ", F.col("__pos")),
                F.lit(" ."),
            ).alias(out_col)
        )
    )


def render_jsonld(triples: DataFrame, out_col: str = "line") -> DataFrame:
    """One expanded-form JSON-LD node object per subject per row.

    Expanded form (no @context) keys each predicate URI to an array of
    {"@id": uri} / {"@value": ..., "@language"/"@type": ...} objects.
    All string escaping is delegated to to_json over map/struct values
    (predicate URIs become map keys, so they get JSON escaping too);
    the single-key objects are then brace-stripped and stitched into
    the node object. Values sort deterministically.
    """
    val = F.struct(
        F.when(~F.col("is_literal"), F.col("object")).alias("@id"),
        F.when(F.col("is_literal"), F.col("object")).alias("@value"),
        F.when(F.col("is_literal"), F.col("lang")).alias("@language"),
        F.when(F.col("is_literal"), F.col("datatype")).alias("@type"),
    )
    per_pred = (
        triples.select("subject", "predicate", val.alias("__v"))
        .groupBy("subject", "predicate")
        .agg(F.sort_array(F.collect_list("__v")).alias("__vs"))
        .withColumn(
            "__obj",
            F.to_json(
                F.create_map(F.col("predicate"), F.col("__vs")),
                {"ignoreNullFields": "true"},
            ),
        )
        .select(
            "subject",
            F.expr(
                "substring(__obj, 2, length(__obj) - 2)"
            ).alias("__entry"),
        )
    )
    return (
        per_pred.groupBy("subject")
        .agg(F.array_sort(F.collect_list("__entry")).alias("__entries"))
        .withColumn(
            "__idobj", F.to_json(F.create_map(F.lit("@id"), F.col("subject")))
        )
        .select(
            F.concat(
                F.lit("{"),
                F.expr("substring(__idobj, 2, length(__idobj) - 2)"),
                F.lit(","),
                F.concat_ws(",", F.col("__entries")),
                F.lit("}"),
            ).alias(out_col)
        )
    )


_XML_HEADER = (
    '<?xml version="1.0" encoding="utf-8"?>\n'
    '<rdf:RDF xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#">'
)
_XML_FOOTER = "</rdf:RDF>"


def _escape_xml(col: Column) -> Column:
    out = F.replace(col, F.lit("&"), F.lit("&amp;"))
    out = F.replace(out, F.lit("<"), F.lit("&lt;"))
    out = F.replace(out, F.lit(">"), F.lit("&gt;"))
    return F.replace(out, F.lit('"'), F.lit("&quot;"))


def render_rdfxml(triples: DataFrame, out_col: str = "block") -> DataFrame:
    """One rdf:Description element per subject (property elements use
    the rdf:li-free expanded form with full property URIs via
    xmlns="..." per element — the namespace-splitting trick rdflib uses,
    valid for any absolute predicate URI)."""
    # split predicate into (namespace, localname) at the last / or #
    local = F.regexp_extract(F.col("predicate"), r"([A-Za-z_][\w.-]*)$", 1)
    ns = F.expr(
        "substring(predicate, 1, length(predicate) - "
        "length(regexp_extract(predicate, '([A-Za-z_][\\\\w.-]*)$', 1)))"
    )
    obj_attr = F.when(
        F.col("is_literal"),
        F.concat(
            F.when(
                F.col("lang").isNotNull(),
                F.concat(F.lit(' xml:lang="'), F.col("lang"), F.lit('"')),
            ).when(
                F.col("datatype").isNotNull(),
                F.concat(
                    F.lit(' rdf:datatype="'),
                    _escape_xml(F.col("datatype")), F.lit('"'),
                ),
            ).otherwise(F.lit("")),
            F.lit(">"), _escape_xml(F.col("object")),
            F.lit("</"), local, F.lit(">"),
        ),
    ).otherwise(
        F.concat(
            F.lit(' rdf:resource="'), _escape_xml(F.col("object")),
            F.lit('"/>'),
        )
    )
    prop = F.concat(
        F.lit("    <"), local, F.lit(' xmlns="'), _escape_xml(ns), F.lit('"'),
        obj_attr,
    )
    po = triples.select("subject", prop.alias("__el"))
    return (
        po.groupBy("subject")
        .agg(F.array_sort(F.collect_list("__el")).alias("__els"))
        .select(
            F.concat(
                F.lit('  <rdf:Description rdf:about="'),
                _escape_xml(F.col("subject")), F.lit('">\n'),
                F.concat_ws("\n", F.col("__els")),
                F.lit("\n  </rdf:Description>"),
            ).alias(out_col)
        )
    )


def rdfxml_document(blocks: list[str]) -> str:
    """Assemble collected rdf:Description blocks into one RDF/XML doc."""
    return "\n".join([_XML_HEADER, *blocks, _XML_FOOTER])


def jsonld_document(lines: list[str]) -> str:
    """Assemble collected node-object lines into one JSON-LD array doc."""
    return "[" + ",\n".join(lines) + "]"


def serialize(triples: DataFrame, format: str = "turtle") -> DataFrame:
    """Render a triples DataFrame in the requested format; one output
    row per statement (nt) or per subject (others), column ``body``.

    Matches the reference surface (turtle, xml, n3, nt, json-ld);
    unknown formats raise ValueError like rdflib's plugin lookup.
    """
    fmt = format.lower()
    if fmt in ("nt", "ntriples"):
        return render_ntriples(triples, out_col="body")
    if fmt in ("turtle", "ttl", "n3"):
        return render_turtle(triples, out_col="body")
    if fmt == "json-ld":
        return render_jsonld(triples, out_col="body")
    if fmt == "xml":
        return render_rdfxml(triples, out_col="body")
    raise ValueError(f"unknown RDF format {format!r}; supported: {_FORMATS}")
