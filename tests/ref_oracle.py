"""Load reference modules (read-only, /root/reference) as byte-level
oracles for pipeline parity tests. Never imported by engine code; tests
skip when the reference checkout is absent."""

import importlib.util
import os
import sys
import types
from pathlib import Path

REF = Path("/root/reference/src/geosparql-etl")


def available() -> bool:
    return REF.exists()


def _load(path: Path, name: str, cwd: str | None = None):
    old = os.getcwd()
    if cwd:
        os.chdir(cwd)
    try:
        spec = importlib.util.spec_from_file_location(name, path)
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        return mod
    finally:
        os.chdir(old)


def json_etl():
    return _load(REF / "json-etl/geojson_to_geosparql_etl.py", "ref_json_etl")


def segmentation_etl():
    return _load(
        REF / "segmentation-etl/nuclear_segmentation_etl.py", "ref_seg_etl"
    )


def mongo_etl(tmpdir: str):
    """mongodb_to_rdf imports pymongo-backed helpers and creates dirs in
    cwd at import time; stub the externals and sandbox the cwd."""
    fake_pipeline = types.ModuleType("sha256_pipeline")
    fake_pipeline.get_auth = lambda *a, **k: None
    fake_pipeline.get_real_hash_from_node = lambda *a, **k: None
    fake_utils = types.ModuleType("utils")
    fake_utils.mongo_connection = lambda *a, **k: None
    sys.modules["sha256_pipeline"] = fake_pipeline
    sys.modules["utils"] = fake_utils
    try:
        return _load(REF / "mongo-etl/mongodb_to_rdf.py", "ref_mongo_etl", cwd=tmpdir)
    finally:
        sys.modules.pop("sha256_pipeline", None)
        sys.modules.pop("utils", None)
