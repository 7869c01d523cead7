"""K5: RDF serialization formats (reference mongo-etl/utils/
rdf_utils.py:258-282 serializes turtle/xml/n3/nt/json-ld via rdflib).

rdflib isn't installed in this environment, so instead of byte-golden
comparisons each format is PARSED back with the stdlib (a 20-line
N-Triples reader, json, xml.etree) and reduced to the same
(s, p, o, literal?, datatype, lang) set — the property rdflib's own
round-trip tests check.
"""

from __future__ import annotations

import json
import re
import xml.etree.ElementTree as ET

import pytest
from pyspark.sql import functions as F

from geosparql_etl_spark.sinks.rdf import (
    TRIPLE_SCHEMA,
    jsonld_document,
    rdfxml_document,
    serialize,
)

TRIPLES = [
    # (subject, predicate, object, is_literal, datatype, lang)
    ("http://ex.org/mark/1", "http://www.w3.org/1999/02/22-rdf-syntax-ns#type",
     "http://ex.org/Mark", False, None, None),
    ("http://ex.org/mark/1", "http://www.opengis.net/ont/geosparql#asWKT",
     "POLYGON ((0 0, 1 0, 1 1, 0 0))", True,
     "http://www.opengis.net/ont/geosparql#wktLiteral", None),
    ("http://ex.org/mark/1", "http://www.w3.org/2000/01/rdf-schema#label",
     'tricky "quoted" label\nwith newline\tand\\slash', True, None, None),
    ("http://ex.org/mark/1", "http://www.w3.org/2000/01/rdf-schema#comment",
     "ein Kommentar", True, None, "de"),
    ("http://ex.org/mark/2", "http://www.w3.org/1999/02/22-rdf-syntax-ns#type",
     "http://ex.org/Mark", False, None, None),
    ("http://ex.org/mark/2", "http://purl.org/dc/terms/creator",
     "http://ex.org/agent/7", False, None, None),
]


@pytest.fixture(scope="module")
def triples_df(spark):
    return spark.createDataFrame(TRIPLES, TRIPLE_SCHEMA)


def expected_set():
    return {tuple(t) for t in TRIPLES}


_NT_UNESC = {"\\\\": "\\", '\\"': '"', "\\n": "\n", "\\r": "\r", "\\t": "\t"}


def _unescape_nt(s: str) -> str:
    out, i = [], 0
    while i < len(s):
        if s[i] == "\\" and i + 1 < len(s):
            out.append(_NT_UNESC[s[i : i + 2]])
            i += 2
        else:
            out.append(s[i])
            i += 1
    return "".join(out)


_NT_RE = re.compile(
    r"^<([^>]*)> <([^>]*)> "
    r'(?:<([^>]*)>|"((?:[^"\\]|\\.)*)"(?:@([A-Za-z-]+)|\^\^<([^>]*)>)?)'
    r" \.$"
)


def parse_nt_line(line: str):
    m = _NT_RE.match(line)
    assert m, f"unparseable N-Triples line: {line!r}"
    s, p, ouri, olit, lang, dt = m.groups()
    if ouri is not None:
        return (s, p, ouri, False, None, None)
    return (s, p, _unescape_nt(olit), True, dt, lang)


def test_ntriples_roundtrip(triples_df):
    lines = [r.body for r in serialize(triples_df, "nt").collect()]
    assert len(lines) == len(TRIPLES)
    assert {parse_nt_line(ln) for ln in lines} == expected_set()


def test_turtle_and_n3_blocks_cover_all_statements(triples_df):
    for fmt in ("turtle", "n3"):
        blocks = [r.body for r in serialize(triples_df, fmt).collect()]
        assert len(blocks) == 2  # one per subject
        # flatten each block back to statement lines and reuse the
        # N-Triples reader (full-URI turtle objects share the grammar)
        got = set()
        for block in blocks:
            m = re.match(r"^<([^>]*)> (.*) \.$", block, re.DOTALL)
            assert m, block
            subj, body = m.groups()
            for po in body.split(" ;\n    "):
                got.add(parse_nt_line(f"<{subj}> {po} ."))
        assert got == expected_set()


def test_jsonld_expanded_form(triples_df):
    lines = [r.body for r in serialize(triples_df, "json-ld").collect()]
    doc = json.loads(jsonld_document(lines))
    assert isinstance(doc, list) and len(doc) == 2
    got = set()
    for node in doc:
        s = node["@id"]
        for pred, vals in node.items():
            if pred == "@id":
                continue
            for v in vals:
                if "@id" in v:
                    got.add((s, pred, v["@id"], False, None, None))
                else:
                    got.add(
                        (s, pred, v["@value"], True,
                         v.get("@type"), v.get("@language"))
                    )
    assert got == expected_set()


def test_rdfxml_document(triples_df):
    blocks = [r.body for r in serialize(triples_df, "xml").collect()]
    root = ET.fromstring(rdfxml_document(blocks))
    RDF = "{http://www.w3.org/1999/02/22-rdf-syntax-ns#}"
    XML_LANG = "{http://www.w3.org/XML/1998/namespace}lang"
    got = set()
    for desc in root:
        assert desc.tag == f"{RDF}Description"
        s = desc.attrib[f"{RDF}about"]
        for prop in desc:
            # ElementTree gives {namespace}local; recombine to the URI
            pred = prop.tag[1:].replace("}", "")
            res = prop.attrib.get(f"{RDF}resource")
            if res is not None:
                got.add((s, pred, res, False, None, None))
            else:
                got.add(
                    (s, pred, prop.text or "", True,
                     prop.attrib.get(f"{RDF}datatype"),
                     prop.attrib.get(XML_LANG))
                )
    assert got == expected_set()


def test_unknown_format_raises(triples_df):
    with pytest.raises(ValueError, match="unknown RDF format"):
        serialize(triples_df, "trig")


def test_ntriples_datasource_roundtrip_and_per_file_partitions(
    spark, triples_df, tmp_path
):
    """The Spark-4 Python DataSource reads back EXACTLY what
    render_ntriples wrote — plain and gzip files, tricky escapes,
    lang/datatype forms — with one scan partition per input file and
    comments/blank lines skipped."""
    import gzip as _gzip

    from geosparql_etl_spark.sources.ntriples import register

    lines = [r.body for r in serialize(triples_df, "nt").collect()]
    d = tmp_path / "nt"
    d.mkdir()
    (d / "a.nt").write_text(
        "# comment line\n" + "\n".join(lines[:3]) + "\n\n", encoding="utf-8"
    )
    with _gzip.open(d / "b.nt.gz", "wt", encoding="utf-8") as fh:
        fh.write("\n".join(lines[3:]) + "\n")

    register(spark)
    got = spark.read.format("ntriples").load(str(d))
    rows = got.collect()
    assert {
        (r.subject, r.predicate, r.object, r.is_literal, r.datatype, r.lang)
        for r in rows
    } == expected_set()
    assert {r.path.rsplit("/", 1)[-1] for r in rows} == {"a.nt", "b.nt.gz"}
    assert got.rdd.getNumPartitions() == 2  # one partition per file


def test_ntriples_datasource_strict_on_malformed(spark, tmp_path):
    import pytest as _pytest

    from geosparql_etl_spark.sources.ntriples import register

    d = tmp_path / "bad"
    d.mkdir()
    (d / "x.nt").write_text("<a> <b> not-a-term .\n", encoding="utf-8")
    register(spark)
    with _pytest.raises(Exception, match="unparseable"):
        spark.read.format("ntriples").load(str(d)).collect()


def test_ntriples_datasource_write_roundtrip_and_overwrite(
    spark, triples_df, tmp_path
):
    """Write side of the format: per-task part files, byte parity with
    render_ntriples, read-back equality, and overwrite replacing prior
    parts (two-phase commit publishes _SUCCESS)."""
    import os

    from geosparql_etl_spark.sources.ntriples import register

    register(spark)
    out = str(tmp_path / "out")
    triples_df.repartition(2).write.format("ntriples").option(
        "path", out
    ).mode("append").save()
    parts = sorted(p for p in os.listdir(out) if p.startswith("part-"))
    assert len(parts) == 2 and os.path.exists(os.path.join(out, "_SUCCESS"))

    # byte parity with the column-expression renderer
    written = []
    for p in parts:
        written += open(os.path.join(out, p), encoding="utf-8").read().splitlines()
    expect = sorted(r.body for r in serialize(triples_df, "nt").collect())
    assert sorted(written) == expect

    # read back through the reader half
    got = spark.read.format("ntriples").load(out)
    assert {
        (r.subject, r.predicate, r.object, r.is_literal, r.datatype, r.lang)
        for r in got.collect()
    } == expected_set()

    # overwrite with a smaller frame replaces the old parts
    triples_df.limit(1).repartition(1).write.format("ntriples").option(
        "path", out
    ).mode("overwrite").save()
    parts2 = sorted(p for p in os.listdir(out) if p.startswith("part-"))
    assert len(parts2) == 1
    assert spark.read.format("ntriples").load(out).count() == 1


def test_ntriples_pushdown_filters_at_source(spark, triples_df, tmp_path):
    """Pushed equality on predicate filters rows DURING the parse and
    the result matches the unpushed plan exactly (pushdown changes
    cost, never semantics); a non-equality filter is declined and
    Spark re-applies it."""
    from geosparql_etl_spark.sources.ntriples import (
        NTriplesReader,
        register,
    )
    from pyspark.sql.datasource import EqualTo, GreaterThan

    d = tmp_path / "nt"
    d.mkdir()
    lines = [r.body for r in serialize(triples_df, "nt").collect()]
    (d / "a.nt").write_text("\n".join(lines) + "\n", encoding="utf-8")

    register(spark)
    pred = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"
    got = (
        spark.read.format("ntriples")
        .load(str(d))
        .where(F.col("predicate") == pred)
        .select("subject", "object")
    )
    assert {(r.subject, r.object) for r in got.collect()} == {
        (s, o) for s, p, o, lit, dt, lg in TRIPLES if p == pred
    }

    # unit-level: the reader accepts the equality and declines the rest
    r = NTriplesReader({"path": str(d)})
    rest = r.pushFilters(
        [EqualTo(("predicate",), pred), GreaterThan(("object",), "a")]
    )
    assert [type(f).__name__ for f in rest] == ["GreaterThan"]
    rows = list(r.read(r.partitions()[0]))
    assert rows and all(row[1] == pred for row in rows)


def test_ntriples_contradictory_pushdown_returns_empty(
    spark, triples_df, tmp_path
):
    """Two pushed equalities on the same column with different values
    are a contradiction: the scan must return EMPTY, not last-filter-
    wins rows (round-4 advice). Covers both the e2e plan and the
    reader unit contract."""
    from geosparql_etl_spark.sources.ntriples import (
        NTriplesReader,
        register,
    )
    from pyspark.sql.datasource import EqualTo

    d = tmp_path / "nt"
    d.mkdir()
    lines = [r.body for r in serialize(triples_df, "nt").collect()]
    (d / "a.nt").write_text("\n".join(lines) + "\n", encoding="utf-8")

    register(spark)
    got = (
        spark.read.format("ntriples")
        .load(str(d))
        .where(F.col("subject") == "http://ex.org/mark/1")
        .where(F.col("subject") == "http://ex.org/mark/2")
    )
    assert got.count() == 0

    r = NTriplesReader({"path": str(d)})
    rest = r.pushFilters(
        [EqualTo(("subject",), "a"), EqualTo(("subject",), "b")]
    )
    assert rest == []  # both accepted -- semantics preserved by the
    parts = r.partitions()  # impossible-scan sentinel partition
    assert len(parts) == 1 and list(r.read(parts[0])) == []

    # same value twice is NOT a contradiction
    r2 = NTriplesReader({"path": str(d)})
    r2.pushFilters([EqualTo(("subject",), "http://ex.org/mark/1"),
                    EqualTo(("subject",), "http://ex.org/mark/1")])
    assert any(row for p in r2.partitions() for row in r2.read(p))


def test_ntriples_writer_attempt_isolation(spark, triples_df, tmp_path,
                                           monkeypatch):
    """Two attempts of the SAME partition (speculative execution /
    zombie task replay) write attempt-unique temp files; commit()
    publishes only the winning attempt's rows, and no temp survives.
    This is the protocol the docstring claims — verified, not
    asserted."""
    import os
    import types

    import pyspark

    from geosparql_etl_spark.sources.ntriples import NTriplesWriter

    out = str(tmp_path / "out")
    w = NTriplesWriter({"path": out}, overwrite=False)
    rows = triples_df.collect()

    def fake_ctx(attempt):
        return types.SimpleNamespace(
            partitionId=lambda: 0, taskAttemptId=lambda: attempt
        )

    # attempt 7 (the eventual winner) writes rows[:2]; zombie attempt 9
    # replays the same partition with rows[2:] concurrently
    monkeypatch.setattr(
        pyspark.TaskContext, "get", staticmethod(lambda: fake_ctx(7))
    )
    msg_win = w.write(iter(rows[:2]))
    monkeypatch.setattr(
        pyspark.TaskContext, "get", staticmethod(lambda: fake_ctx(9))
    )
    w.write(iter(rows[2:]))  # zombie: Spark never reports its message

    tmps = [p for p in os.listdir(out) if p.endswith(".tmp")]
    assert len(tmps) == 2  # distinct paths -- no interleaving possible

    w.commit([msg_win])
    files = sorted(os.listdir(out))
    assert files == ["_SUCCESS", "part-00000.nt"]  # zombie temp swept
    body = open(os.path.join(out, "part-00000.nt"), encoding="utf-8").read()
    assert len(body.splitlines()) == 2  # only the winner's rows

    # abort path: temp written, abort sweeps it, nothing final appears
    out2 = str(tmp_path / "out2")
    w2 = NTriplesWriter({"path": out2}, overwrite=False)
    m = w2.write(iter(rows[:1]))
    w2.write(iter(rows[1:2]))  # unreported attempt
    w2.abort([m])
    assert [p for p in os.listdir(out2) if not p.startswith(".")] == []
    assert [p for p in os.listdir(out2) if p.endswith(".tmp")] == []


def test_ntriples_gzip_write_roundtrip(spark, triples_df, tmp_path):
    """option('compression','gzip') emits part-*.nt.gz (parity with the
    read side and the reference's gzip sinks), round-trips through the
    reader, and overwrite clears a prior gzip generation."""
    import os

    from geosparql_etl_spark.sources.ntriples import register

    register(spark)
    out = str(tmp_path / "gz")
    triples_df.repartition(2).write.format("ntriples").option(
        "path", out
    ).option("compression", "gzip").mode("append").save()
    parts = sorted(p for p in os.listdir(out) if p.startswith("part-"))
    assert parts and all(p.endswith(".nt.gz") for p in parts)

    got = spark.read.format("ntriples").load(out)
    assert {
        (r.subject, r.predicate, r.object, r.is_literal, r.datatype, r.lang)
        for r in got.collect()
    } == expected_set()

    # overwrite with PLAIN output must also remove the gzip generation
    # (reader scans both extensions -- round-4 advice)
    triples_df.limit(1).repartition(1).write.format("ntriples").option(
        "path", out
    ).mode("overwrite").save()
    parts2 = sorted(p for p in os.listdir(out) if p.startswith("part-"))
    assert parts2 == ["part-00000.nt"]
    assert spark.read.format("ntriples").load(out).count() == 1


def test_ntriples_multi_dir_and_glob_listing(spark, triples_df, tmp_path):
    """A partitioned triple lake reads as ONE table: comma-separated
    dirs and ** globs both expand; the pushed `path` equality still
    prunes to a single file on top."""
    import gzip as _gzip

    from geosparql_etl_spark.sources.ntriples import register

    lines = [r.body for r in serialize(triples_df, "nt").collect()]
    root = tmp_path / "lake"
    (root / "img").mkdir(parents=True)
    (root / "rad").mkdir()
    (root / "img" / "a.nt").write_text(
        "\n".join(lines[:3]) + "\n", encoding="utf-8"
    )
    with _gzip.open(root / "rad" / "b.nt.gz", "wt", encoding="utf-8") as fh:
        fh.write("\n".join(lines[3:]) + "\n")

    register(spark)
    for path in (
        f"{root}/img,{root}/rad",  # comma-separated dirs
        f"{root}/**",              # recursive glob over the lake
    ):
        got = spark.read.format("ntriples").load(path)
        assert {
            (r.subject, r.predicate, r.object, r.is_literal, r.datatype,
             r.lang) for r in got.collect()
        } == expected_set(), path
        assert got.rdd.getNumPartitions() == 2

    # partition pruning via the pushed path filter on the lake view
    one = (
        spark.read.format("ntriples")
        .load(f"{root}/**")
        .where(F.col("path") == str(root / "img" / "a.nt"))
    )
    assert one.count() == 3


def test_ntriples_commit_refuses_missing_winner_temp(tmp_path):
    """A reported winner whose temp file vanished (concurrent job
    sweeping the directory) must abort the commit loudly — publishing
    _SUCCESS with a partition silently missing is the one outcome a
    two-phase protocol exists to prevent."""
    import pytest as _pytest

    from geosparql_etl_spark.sources.ntriples import NTriplesWriter, _Committed

    w = NTriplesWriter({"path": str(tmp_path)}, overwrite=False)
    gone = str(tmp_path / ".part-00000-42.nt.tmp")  # never created
    with _pytest.raises(IOError, match="missing"):
        w.commit([_Committed(gone, "part-00000.nt", 3)])
    assert not (tmp_path / "_SUCCESS").exists()


class TestTurtleSource:
    """sources/turtle.py: the engine's own TTL output parsed back into
    the queryable triple schema — pipeline -> TTL -> SPARQL, the loop
    the ntriples format closes for .nt, closed for Turtle."""

    @pytest.fixture(scope="class")
    def ttl_out(self, spark, tmp_path_factory):
        import json

        from geosparql_etl_spark.pipelines import json_etl

        d = tmp_path_factory.mktemp("ttlsrc")
        src = d / "in"
        src.mkdir()
        fc = {
            "features": [
                {
                    "geometry": {
                        "type": "Polygon",
                        "coordinates": [[[0, 0], [10, 0], [10, 10]]],
                    },
                    "properties": {
                        "measurements": {
                            "prob_tumor": 0.75,
                            "prob_stroma": 0.25,
                        }
                    },
                }
            ]
        }
        (src / "slideA.geojson").write_text(json.dumps(fc))
        out = str(d / "out")
        json_etl.run(spark, str(src), out, "2026-01-01T00:00:00+00:00")
        return out

    def test_pipeline_ttl_parses_and_queries(self, spark, ttl_out):
        from geosparql_etl_spark.sources.ttl import read_ttl_documents
        from geosparql_etl_spark.sources.turtle import turtle_to_triples
        from geosparql_etl_spark.sparql import TripleStore, sparql_select

        tri = turtle_to_triples(
            read_ttl_documents(spark, ttl_out + "/*.ttl")
        ).cache()
        # typed literals carry their datatype; bnodes minted per doc
        assert (
            tri.where(
                F.col("datatype")
                == "http://www.w3.org/2001/XMLSchema#dateTime"
            ).count()
            == 1
        )
        assert tri.where(F.col("subject").startswith("_:b")).count() >= 2
        store = TripleStore.from_ntriples(tri)
        rows = sparql_select(
            store,
            "PREFIX exif: <http://www.w3.org/2003/12/exif/ns#> "
            "PREFIX dc: <http://purl.org/dc/terms/> "
            "SELECT ?slide ?w WHERE { ?img dc:identifier ?slide . "
            "?img exif:width ?w }",
        ).collect()
        assert [(r.slide, r.w) for r in rows] == [("slideA", "40000")]

    def test_wholetext_regression(self, spark, ttl_out):
        """The option-form wholetext silently reads LINES (PySpark's
        text() kwarg overrides it) — pin the fixed kwarg form: one row
        per document."""
        from geosparql_etl_spark.sources.ttl import read_ttl_documents

        docs = read_ttl_documents(spark, ttl_out + "/*.ttl")
        assert docs.count() == 1
        assert docs.first().text.count("@prefix") >= 5

    def test_strict_parse_raises_with_context(self):
        from geosparql_etl_spark.sources.turtle import parse_turtle_document

        with pytest.raises(ValueError, match="doc.ttl"):
            parse_turtle_document("<urn:a> <urn:p> @@nonsense .", "doc.ttl")

    def test_mongo_etl_gzip_ttl_parses(self, spark, tmp_path):
        """The richer mongo-etl batches (gzipped, annotation bnodes,
        WKT literals) parse through the same subset — and the gzip
        path rides Spark's transparent text decompression."""
        import json as _json

        from test_pipelines import ANALYSIS, ANALYSIS_DOC, MARK_DOC, _mark

        from geosparql_etl_spark.pipelines import mongo_etl
        from geosparql_etl_spark.sources.ttl import read_ttl_documents
        from geosparql_etl_spark.sources.turtle import turtle_to_triples

        analyses = spark.createDataFrame(
            [_json.loads(_json.dumps(ANALYSIS))], ANALYSIS_DOC
        )
        marks = spark.createDataFrame(
            [_json.loads(_json.dumps(_mark(i))) for i in (1, 2)], MARK_DOC
        )
        out = str(tmp_path / "out")
        mongo_etl.run(spark, analyses, marks, out)
        tri = turtle_to_triples(
            read_ttl_documents(spark, out + "/*/*/*.ttl.gz")
        )
        assert tri.count() == 31
        # the WKT geometry literals survive with their datatype
        assert (
            tri.where(
                F.col("datatype")
                == "http://www.opengis.net/ont/geosparql#wktLiteral"
            ).count()
            > 0
        )
