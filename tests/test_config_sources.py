"""EngineConfig (utils/config.py parity) and the document-store source
adapter (sources/mongo.py). The connector path needs a live deployment
and the connector jar — untestable in this sandbox — so it is covered by
option-construction only; the fallback path is contract-tested end to
end through run_from_config."""

from __future__ import annotations

import gzip
import json
import os

import pytest

from geosparql_etl_spark.config import EngineConfig, MongoSourceConfig
from geosparql_etl_spark.pipelines import mongo_etl
from geosparql_etl_spark.sources.mongo import (
    connector_options,
    read_analyses,
    read_marks,
)

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

MARK = {
    "_id": "mark0001",
    "provenance": {
        "analysis": {"execution_id": "exec-7"},
        "image": {"imageid": "IMG-1", "slide": "12345"},
    },
    "geometries": {
        "features": [
            {
                "geometry": {
                    "type": "Polygon",
                    "coordinates": [[[0.1, 0.2], [0.3, 0.2], [0.3, 0.4]]],
                },
                "properties": {"footprint": 512.0, "nucleustype": "tumor.ep.1"},
            }
        ]
    },
}


def test_engine_config_pins_reference_constants():
    """mongodb_to_rdf.py:31 (1000 marks/file), :515 (cursor batch 5000),
    :37 (gzip level 6), utils/config.py defaults."""
    cfg = EngineConfig()
    assert cfg.batch_size == 1000
    assert cfg.cursor_batch_size == 5000
    assert cfg.gzip_level == 6
    assert cfg.compress is True
    assert cfg.output_dir == "ttl_output"
    assert cfg.ledger_path is None
    assert cfg.mongo.db_name == "camic"
    assert cfg.mongo.uri is None


def test_engine_config_from_env_and_dict(monkeypatch):
    monkeypatch.setenv("ETL_BATCH_SIZE", "250")
    monkeypatch.setenv("ETL_OUTPUT_DIR", "/tmp/out")
    monkeypatch.setenv("ETL_CHECKPOINT_FILE", "/tmp/ledger")
    monkeypatch.setenv("MONGO_URI", "mongodb://example:27018/")
    monkeypatch.setenv("MONGO_DB_NAME", "other")
    cfg = EngineConfig.from_env()
    assert cfg.batch_size == 250
    assert cfg.output_dir == "/tmp/out"
    assert cfg.ledger_path == "/tmp/ledger"
    assert cfg.mongo.uri == "mongodb://example:27018/"
    assert cfg.mongo.db_name == "other"

    d = EngineConfig.from_dict(
        {"batch_size": 7, "mongo": {"db_name": "camic2", "fallback_dir": "/x"}}
    )
    assert d.batch_size == 7 and d.mongo.db_name == "camic2"
    assert d.with_overrides(gzip_level=1).gzip_level == 1


def test_connector_options_shape():
    cfg = MongoSourceConfig(uri="mongodb://h:27018/", db_name="camic")
    opts = connector_options(cfg, "mark")
    assert opts["connection.uri"] == "mongodb://h:27018/"
    assert opts["database"] == "camic"
    assert opts["collection"] == "mark"
    assert opts["partitioner"].endswith("SamplePartitioner")
    assert opts["partitioner.options.partition.size"] == "64MB"


def _write_standins(dirpath: str) -> None:
    os.makedirs(dirpath, exist_ok=True)
    with open(os.path.join(dirpath, "analysis.json"), "w") as f:
        f.write(json.dumps(ANALYSIS) + "\n")
    with open(os.path.join(dirpath, "mark.json"), "w") as f:
        f.write(json.dumps(MARK) + "\n")


def test_fallback_source_reads_standins(spark, tmp_path):
    _write_standins(str(tmp_path / "db"))
    cfg = MongoSourceConfig(fallback_dir=str(tmp_path / "db"))
    a = read_analyses(spark, cfg)
    m = read_marks(spark, cfg)
    assert a.count() == 1 and m.count() == 1
    assert a.select("analysis.execution_id").first()[0] == "exec-7"
    assert m.select("provenance.image.imageid").first()[0] == "IMG-1"


def test_fallback_source_errors():
    cfg = MongoSourceConfig()  # neither uri nor fallback_dir
    with pytest.raises(ValueError):
        from geosparql_etl_spark.sources.mongo import _read_fallback
        from geosparql_etl_spark.schemas import ANALYSIS_DOC

        _read_fallback(None, cfg, "analysis", ANALYSIS_DOC)


def test_run_from_config_end_to_end(spark, tmp_path):
    """Config-only bootstrap: stand-in source -> pipeline -> gzip sink
    (at the config's gzip level) + ledger, no DataFrames passed in."""
    _write_standins(str(tmp_path / "db"))
    cfg = EngineConfig(
        output_dir=str(tmp_path / "out"),
        ledger_path=str(tmp_path / "ledger"),
        gzip_level=1,
        mongo=MongoSourceConfig(fallback_dir=str(tmp_path / "db")),
    )
    docs = mongo_etl.run_from_config(spark, cfg)
    assert docs.count() == 1

    out = tmp_path / "out" / "exec-7" / "IMG-1" / "batch_000001.ttl.gz"
    assert out.exists()
    body = gzip.open(out, "rt", encoding="utf-8").read()
    assert "geo:asWKT" in body

    from geosparql_etl_spark.operators.ledger import read_ledger

    led = read_ledger(spark, str(tmp_path / "ledger")).collect()
    assert [(r["id"], r["status"]) for r in led] == [
        ("a1b2c3d4e5f6a1b2c3d4e5f6", "completed")
    ]


def test_engine_config_from_file(tmp_path):
    p = tmp_path / "etl.json"
    p.write_text(
        json.dumps(
            {
                "batch_size": 500,
                "gzip_level": 9,
                "mongo": {"uri": "mongodb://h:27018/", "db_name": "camic"},
            }
        )
    )
    cfg = EngineConfig.from_file(str(p))
    assert cfg.batch_size == 500 and cfg.gzip_level == 9
    assert cfg.mongo.uri == "mongodb://h:27018/"
    assert cfg.cursor_batch_size == 5000  # untouched default
