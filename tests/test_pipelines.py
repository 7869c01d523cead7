"""Golden end-to-end pipeline tests: engine output must be byte-identical
to the reference implementation on the same inputs (timestamp injected).
Skipped when the read-only reference checkout is unavailable."""

import gzip
import json
import re
from pathlib import Path

import pytest
from pyspark.sql import functions as F

import ref_oracle
from geosparql_etl_spark.pipelines import hash_update, json_etl, mongo_etl, segmentation_etl
from geosparql_etl_spark.schemas import ANALYSIS_DOC, MARK_DOC, SLIDE_HASHES, TTL_DOCUMENTS

needs_ref = pytest.mark.skipif(
    not ref_oracle.available(), reason="reference checkout not available"
)

TS_Z = "2026-01-01T00:00:00Z"
TS_OFFSET = "2026-01-01T00:00:00+00:00"


def _norm_ts(ttl: str, ts: str) -> str:
    return re.sub(r'(dc:date\s+")[^"]+(")', r"\g<1>" + ts + r"\g<2>", ttl)


# --- json-etl ---------------------------------------------------------------


@needs_ref
def test_json_etl_matches_reference(spark, tmp_path):
    data = {
        "type": "FeatureCollection",
        "features": [
            {
                "type": "Feature",
                "geometry": {
                    "type": "Polygon",
                    "coordinates": [[[10.0, 20.0], [30.5, 20.0], [30.5, 45.25]]],
                },
                "properties": {
                    "measurements": {
                        "prob_400p-Tumor": 0.75,
                        "prob_400p-Stroma": 0.2,
                        "nr_of_cells": 17.0,
                    }
                },
            },
            {  # non-SNOMED dominant class -> dropped
                "type": "Feature",
                "geometry": {"type": "Polygon", "coordinates": [[[1.0, 1.0], [2.0, 2.0]]]},
                "properties": {"measurements": {"prob_other": 0.9}},
            },
        ],
    }
    name = "TCGA-ZZ-9999-01Z.uuid-1.geojson"
    (tmp_path / "in").mkdir()
    (tmp_path / "in" / name).write_text(json.dumps(data))

    ref = ref_oracle.json_etl()
    expected = _norm_ts(ref.create_geosparql_ttl(data, name, None), TS_Z)

    docs = json_etl.run(spark, str(tmp_path / "in"), str(tmp_path / "out"), TS_Z)
    got = (tmp_path / "out" / name.replace(".geojson", ".ttl")).read_text()
    assert got == expected


# --- segmentation-etl --------------------------------------------------------


@needs_ref
def test_segmentation_etl_matches_reference(spark, tmp_path):
    csv_name = "24001_72001_4000_4000_0.2325_1-features.csv"
    csv_text = (
        "AreaInPixels,PhysicalSize,Polygon\n"
        "250,60.5,[2080:1342:2085:1340:2090:1345]\n"
        ",,[1:2:3:4]\n"  # empty optional props
        "99,1.5,\n"  # empty polygon -> skipped
    )
    base = tmp_path / "base"
    svs_dir = base / "blca_polygon" / "TCGA-XX.svs.tar.gz" / "blca_polygon" / "TCGA-XX.svs"
    svs_dir.mkdir(parents=True)
    (svs_dir / csv_name).write_text(csv_text)

    ref = ref_oracle.segmentation_etl()
    expected = _norm_ts(
        ref.create_geosparql_ttl(svs_dir / csv_name, "TCGA-XX.svs", None, "blca"),
        TS_OFFSET,
    )

    docs = segmentation_etl.run(
        spark, str(base), str(tmp_path / "out"), TS_OFFSET, compress=True
    )
    out = tmp_path / "out" / "TCGA-XX.svs" / ("blca_" + csv_name.replace(".csv", "") + ".ttl.gz")
    assert out.exists(), list((tmp_path / "out").rglob("*"))
    got = gzip.open(out, "rt", encoding="utf-8").read()
    assert got == expected


# --- mongo-etl ----------------------------------------------------------------

ANALYSIS = {
    "_id": "a1b2c3d4e5f6a1b2c3d4e5f6",
    "analysis": {
        "execution_id": "exec-7",
        "algorithm_params": {
            "image_width": "2000",
            "image_height": "1000",
            "case_id": "CASE-1",
        },
    },
    "image": {
        "imageid": "IMG-1",
        "subject": "SUBJ-1",
        "study": "STUDY-1",
        "slide": "12345",
    },
}


def _mark(i: int, nucleustype="tumor.ep.1", ann=None, coords=None):
    features = [
        {
            "geometry": {
                "type": "Polygon",
                "coordinates": coords
                if coords is not None
                else [[[0.1, 0.2], [0.3, 0.2], [0.3, 0.4]]],
            },
            "properties": {"footprint": 512.0, "nucleustype": nucleustype},
        }
    ]
    doc = {
        "_id": f"mark{i:04d}",
        "provenance": {
            "analysis": {"execution_id": "exec-7"},
            "image": {"imageid": "IMG-1", "slide": "12345"},
        },
        "geometries": {"features": features},
    }
    # NOTE: when there is no annotation the key must be ABSENT, not null —
    # the reference's mark.get("userUpdate", {}) turns an explicit null
    # into `"mark" in None` -> TypeError -> silent mark skip
    # (mongodb_to_rdf.py:456-459). Spark's schema can't distinguish
    # absent from null; the engine follows the absent-key semantics.
    if ann:
        doc["userUpdate"] = {"mark": {"annotation": ann}}
    return doc


@needs_ref
def test_mongo_etl_matches_reference(spark, tmp_path):
    ref = ref_oracle.mongo_etl(str(tmp_path))

    marks = [
        _mark(1),
        _mark(2, nucleustype="xx", ann=[{"annotationID": "http://snomed.info/id/999"}]),
        _mark(3, nucleustype="", ann=[{"annotationID": "http://example.org/nope"}]),
        _mark(4, coords=[]),  # invalid geometry -> skipped
    ]

    # reference assembly: header + blocks (cursor order) + close
    header, w, h = ref.create_ttl_header(ANALYSIS, 1, None, None, None)
    expected = header
    ok_marks = 0
    for m in marks:
        block, ok = ref.add_mark_to_ttl(m, w, h, ok_marks == 0)
        if ok:
            expected += block
            ok_marks += 1
    if expected.rstrip().endswith(";"):
        expected = expected.rstrip()[:-1]
    expected += "\n    ] .\n"

    analyses_df = spark.createDataFrame(
        [json.loads(json.dumps(ANALYSIS))], ANALYSIS_DOC
    )
    marks_df = spark.createDataFrame([json.loads(json.dumps(m)) for m in marks], MARK_DOC)
    docs = mongo_etl.render_ttl_documents(analyses_df, marks_df).collect()
    assert len(docs) == 1
    d = docs[0]
    assert d["file_name"] == "exec-7/IMG-1/batch_000001.ttl.gz"
    assert d["mark_count"] == 3
    assert d["body"] == expected


@needs_ref
def test_mongo_etl_batching_and_hash_enrichment(spark, tmp_path):
    ref = ref_oracle.mongo_etl(str(tmp_path))
    marks = [_mark(i) for i in range(1, 8)]  # 7 marks, batch_size=3 -> 3 files
    analyses_df = spark.createDataFrame([json.loads(json.dumps(ANALYSIS))], ANALYSIS_DOC)
    marks_df = spark.createDataFrame([json.loads(json.dumps(m)) for m in marks], MARK_DOC)
    hashes_df = spark.createDataFrame([("12345", "e" * 64)], SLIDE_HASHES)

    docs = mongo_etl.render_ttl_documents(
        analyses_df, marks_df, slide_hashes=hashes_df, batch_size=3
    ).collect()
    assert sorted(d["batch_num"] for d in docs) == [1, 2, 3]
    assert [d["mark_count"] for d in sorted(docs, key=lambda d: d["batch_num"])] == [3, 3, 1]
    for d in docs:
        assert f"<urn:sha256:{'e' * 64}>" in d["body"]
        assert "hal:hashMissing" not in d["body"]

    # missing hash -> fallback to sha256(image_id) + hashMissing flag
    empty_hashes = spark.createDataFrame([("other-slide", "f" * 64)], SLIDE_HASHES)
    docs2 = mongo_etl.render_ttl_documents(
        analyses_df, marks_df, slide_hashes=empty_hashes, batch_size=100
    ).collect()
    assert len(docs2) == 1
    assert 'hal:hashMissing "true"^^xsd:boolean' in docs2[0]["body"]


def test_mongo_etl_ledger_skips_processed(spark):
    analyses_df = spark.createDataFrame([json.loads(json.dumps(ANALYSIS))], ANALYSIS_DOC)
    marks_df = spark.createDataFrame([json.loads(json.dumps(_mark(1)))], MARK_DOC)
    ledger = spark.createDataFrame(
        [("a1b2c3d4e5f6a1b2c3d4e5f6", "completed", None, None)],
        "id string, status string, error string, ts timestamp",
    )
    docs = mongo_etl.render_ttl_documents(analyses_df, marks_df, ledger=ledger)
    assert docs.count() == 0


# --- hash-update ---------------------------------------------------------------


def _ttl_doc(slide: str, h: str) -> str:
    return (
        f'<urn:sha256:{h}>\n    a so:ImageObject ;\n'
        f'    hal:slideId "{slide}" ;\n    hal:imageWidth 10 ;\n'
    )


def test_update_hashes_by_slide_id_statuses(spark):
    docs = spark.createDataFrame(
        [
            ("p/1.ttl", _ttl_doc("100", "a" * 64)),  # stale -> updated
            ("p/2.ttl", _ttl_doc("200", "b" * 64)),  # no hash -> hash_missing
            ("p/3.ttl", _ttl_doc("300", "c" * 64)),  # same hash -> already_correct
            ("p/4.ttl", "no ids here"),  # no slideId
        ],
        TTL_DOCUMENTS,
    )
    hashes = spark.createDataFrame(
        [("100", "d" * 64), ("300", "c" * 64)], SLIDE_HASHES
    )
    out = {r["path"]: r for r in hash_update.update_hashes_by_slide_id(docs, hashes).collect()}
    assert out["p/1.ttl"]["status"] == "updated"
    assert f'<urn:sha256:{"d" * 64}>' in out["p/1.ttl"]["text"]
    assert out["p/2.ttl"]["status"] == "hash_missing"
    assert out["p/2.ttl"]["text"] == _ttl_doc("200", "b" * 64)  # unchanged
    assert out["p/3.ttl"]["status"] == "already_correct"
    assert out["p/4.ttl"]["status"] == "no_slide_id"


def test_update_hashes_idempotent(spark):
    docs = spark.createDataFrame([("p/1.ttl", _ttl_doc("100", "a" * 64))], TTL_DOCUMENTS)
    hashes = spark.createDataFrame([("100", "d" * 64)], SLIDE_HASHES)
    once = hash_update.update_hashes_by_slide_id(docs, hashes).select("path", "text")
    twice = hash_update.update_hashes_by_slide_id(once, hashes).select("path", "text")
    assert once.collect() == twice.collect()


def test_update_by_folder_mark_missing(spark):
    docs = spark.createDataFrame(
        [(f"base/SLIDE-A.svs/doc.ttl", f'<urn:md5:{"9" * 32}> a so:ImageObject ;')],
        TTL_DOCUMENTS,
    )
    hashes = spark.createDataFrame([("OTHER.svs", "f" * 64)], SLIDE_HASHES)
    out = hash_update.update_hashes_by_folder(docs, hashes, mark_missing=True).collect()[0]
    assert out["status"] == "hash_missing"
    assert 'hal:missing "true"^^xsd:boolean' in out["text"]


def test_json_etl_observe_metrics(spark, tmp_path):
    """A2 runtime metrics via Observation: one pass, no recount."""
    import json as _json

    data = {
        "type": "FeatureCollection",
        "features": [
            {
                "type": "Feature",
                "geometry": {
                    "type": "Polygon",
                    "coordinates": [[[1.0, 2.0], [3.0, 2.0], [3.0, 4.0]]],
                },
                "properties": {"measurements": {"prob_400p-Tumor": 0.9}},
            }
        ],
    }
    (tmp_path / "in").mkdir()
    for i in range(3):
        (tmp_path / "in" / f"img-{i}.geojson").write_text(_json.dumps(data))

    docs, metrics = json_etl.run(
        spark, str(tmp_path / "in"), str(tmp_path / "out"), TS_Z,
        collect_metrics=True,
    )
    assert metrics["n_documents"] == 3
    assert metrics["total_bytes"] > 3 * len(json_etl._PREFIX_HEADER)


def test_segmentation_path_regex_dotted_tcga_ids(spark, tmp_path):
    """S3 trip wire (SURVEY §7): TCGA image names contain dots and the
    archive dir embeds .svs.tar.gz — the path regex must keep the full
    dotted stem for image_name and not split on the first dot."""
    from geosparql_etl_spark.sources.segmentation import read_patch_csvs

    dotted = "TCGA-2F-A9KO-01Z.195576CF-B739-4BD9.svs"
    base = tmp_path / "base"
    d = base / "paad_polygon" / (dotted.replace(".svs", "") + ".svs.tar.gz") / "paad_polygon" / dotted
    d.mkdir(parents=True)
    (d / "100_200_4000_4000_0.25_1-features.csv").write_text(
        "AreaInPixels,PhysicalSize,Polygon\n10,1.0,[1:2:3:4]\n"
    )
    row = read_patch_csvs(spark, str(base)).first()
    assert row["image_name"] == dotted
    assert row["cancer_type"] == "paad"
    assert row["patch"]["x"] == 100 and row["patch"]["height"] == 4000


def test_geojson_malformed_file_yields_empty_document(spark, tmp_path):
    """Permissive-parse deviation (documented, SURVEY §1.3): a malformed
    .geojson produces a header-only document instead of the reference's
    per-file error tuple — the file is never silently lost."""
    (tmp_path / "in").mkdir()
    (tmp_path / "in" / "broken.geojson").write_text("{not valid json")
    docs = json_etl.run(spark, str(tmp_path / "in"), str(tmp_path / "out"), TS_Z)
    out = (tmp_path / "out" / "broken.ttl").read_text()
    assert out.startswith("@prefix")
    assert "rdfs:member" not in out


def test_mongo_etl_run_records_failures_and_retries(spark, tmp_path):
    """Pipeline failure channel: an analysis whose marks all fall in the
    skip channel (or that has no marks) is recorded FAILED with an error
    string; resume skips it; clear_failed + a fixed input retries it to
    completed (mongodb_to_rdf.py:165-174 per-analysis failure records)."""
    from geosparql_etl_spark.operators.ledger import (
        clear_failed,
        failed_report,
        read_ledger,
    )

    a2 = json.loads(json.dumps(ANALYSIS))
    a2["_id"] = "ffffffffffffffffffffffff"
    a2["analysis"]["execution_id"] = "exec-8"
    a2["image"]["imageid"] = "IMG-2"
    a2["image"]["slide"] = "67890"

    analyses_df = spark.createDataFrame(
        [json.loads(json.dumps(ANALYSIS)), a2], ANALYSIS_DOC
    )
    marks_df = spark.createDataFrame(
        [json.loads(json.dumps(_mark(1)))], MARK_DOC  # exec-7 only
    )
    out, ledger_path = str(tmp_path / "out"), str(tmp_path / "ledger")

    docs = mongo_etl.run(spark, analyses_df, marks_df, out, ledger_path=ledger_path)
    assert docs.count() == 1  # exec-7 rendered; exec-8 had nothing
    led = read_ledger(spark, ledger_path)
    statuses = {r["id"]: r["status"] for r in led.collect()}
    assert statuses == {
        "a1b2c3d4e5f6a1b2c3d4e5f6": "completed",
        "ffffffffffffffffffffffff": "failed",
    }
    rep = failed_report(led).collect()
    assert len(rep) == 1 and "no renderable marks" in rep[0]["error"]

    # resume: both ids skipped, nothing new lands in the ledger
    docs2 = mongo_etl.run(spark, analyses_df, marks_df, out, ledger_path=ledger_path)
    assert docs2.count() == 0
    assert read_ledger(spark, ledger_path).count() == 2

    # retry-after-clear with the input fixed: exec-8 now has a mark
    clear_failed(spark, ledger_path)
    m2 = json.loads(json.dumps(_mark(2)))
    m2["provenance"]["analysis"]["execution_id"] = "exec-8"
    m2["provenance"]["image"] = {"imageid": "IMG-2", "slide": "67890"}
    marks_fixed = spark.createDataFrame(
        [json.loads(json.dumps(_mark(1))), m2], MARK_DOC
    )
    docs3 = mongo_etl.run(spark, analyses_df, marks_fixed, out, ledger_path=ledger_path)
    assert docs3.count() == 1  # only the retried analysis runs
    led = read_ledger(spark, ledger_path)
    assert failed_report(led).count() == 0
    assert {r["status"] for r in led.collect()} == {"completed"}


def test_json_etl_corrupt_file_error_channel(spark, tmp_path):
    """PERMISSIVE JSON turns a malformed file into an all-null row
    (silent loss); the error-channel scan surfaces it: bad files land in
    the failure ledger with an error class, good files complete, and a
    re-run skips both (reference: per-file try/except + result tuples,
    json-etl:195-245)."""
    from geosparql_etl_spark.operators.ledger import failed_report, read_ledger

    good = {
        "type": "FeatureCollection",
        "features": [
            {
                "type": "Feature",
                "geometry": {
                    "type": "Polygon",
                    "coordinates": [[[1.0, 2.0], [3.0, 2.0], [3.0, 4.0]]],
                },
                "properties": {
                    "measurements": {"prob_400p-Tumor": 0.9, "nr_of_cells": 5.0}
                },
            }
        ],
    }
    in_dir = tmp_path / "in"
    in_dir.mkdir()
    (in_dir / "TCGA-AA-0001-01Z.u1.geojson").write_text(json.dumps(good))
    (in_dir / "TCGA-BB-0002-01Z.u2.geojson").write_text('{"type": "FeatureColl')  # truncated
    (in_dir / "TCGA-CC-0003-01Z.u3.geojson").write_text('{"hello": "world"}')  # no features

    out, ledger_path = str(tmp_path / "out"), str(tmp_path / "ledger")
    docs = json_etl.run(spark, str(in_dir), out, TS_Z, ledger_path=ledger_path)
    assert docs.count() == 1  # only the good file renders
    assert (tmp_path / "out" / "TCGA-AA-0001-01Z.u1.ttl").exists()

    led = read_ledger(spark, ledger_path)
    rep = {r["id"]: r["error"] for r in failed_report(led).collect()}
    assert rep == {
        "TCGA-BB-0002-01Z.u2.geojson": "malformed JSON",
        "TCGA-CC-0003-01Z.u3.geojson": "no features array",
    }
    assert led.where(F.col("status") == "completed").count() == 1

    # resume: everything (completed + failed) is skipped
    docs2 = json_etl.run(spark, str(in_dir), out, TS_Z, ledger_path=ledger_path)
    assert docs2.count() == 0
    assert read_ledger(spark, ledger_path).count() == 3
