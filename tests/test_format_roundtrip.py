"""Source/sink format breadth: the engine's tables survive roundtrips
through every bundled columnar/text format (parquet is the native
path; ORC is the alternate columnar; CSV/JSON are the interchange
formats the reference's ETL surface speaks)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .limit(50)
        .select("doc_id", "text", "lang", "source", "n_chars")
        .cache()
    )


def _assert_same(a, b, key="doc_id"):
    ra = sorted(map(tuple, a.collect()))
    rb = sorted(map(tuple, b.collect()))
    assert ra == rb and len(ra) > 0


@pytest.mark.parametrize("fmt", ["parquet", "orc"])
def test_columnar_roundtrip(spark, docs, tmp_path, fmt):
    out = str(tmp_path / fmt)
    docs.write.format(fmt).save(out)
    _assert_same(docs, spark.read.format(fmt).load(out))


def test_json_roundtrip_with_schema(spark, docs, tmp_path):
    out = str(tmp_path / "json")
    docs.write.json(out)
    _assert_same(docs, spark.read.schema(docs.schema).json(out))


def test_csv_roundtrip_with_schema(spark, docs, tmp_path):
    """CSV needs quoting/escaping for embedded newlines + multiLine on
    read — document text is exactly the column that exercises it."""
    out = str(tmp_path / "csv")
    docs.write.options(header=True, escape='"').csv(out)
    back = spark.read.options(
        header=True, multiLine=True, escape='"'
    ).schema(docs.schema).csv(out)
    _assert_same(docs, back)
