"""Idempotent partitioned parquet writes + compaction (sinks/parquet)."""

from __future__ import annotations

import glob

from pyspark.sql import Row
from pyspark.sql import functions as F

from geosparql_etl_spark.sinks.parquet import (
    compact_partitions,
    write_partitioned,
)


def _read(spark, path):
    return {
        (r["lang"], r["doc_id"]): r["v"]
        for r in spark.read.parquet(path).collect()
    }


def test_dynamic_overwrite_replaces_only_incoming_partitions(spark, tmp_path):
    out = str(tmp_path / "tbl")
    full = spark.createDataFrame(
        [Row(doc_id=i, lang=("en" if i % 2 else "fr"), v=i) for i in range(10)]
    )
    write_partitioned(full, out, ["lang"])
    before = _read(spark, out)
    assert len(before) == 10

    # backfill rewrites ONLY lang=en with new values; fr must survive
    en_fix = spark.createDataFrame(
        [Row(doc_id=i, lang="en", v=i + 100) for i in range(1, 10, 2)]
    )
    write_partitioned(en_fix, out, ["lang"])
    after = _read(spark, out)
    assert after[("en", 1)] == 101 and after[("en", 9)] == 109
    assert all(after[("fr", i)] == i for i in range(0, 10, 2))
    assert len(after) == 10


def test_dynamic_overwrite_restores_session_mode(spark, tmp_path):
    key = "spark.sql.sources.partitionOverwriteMode"
    spark.conf.set(key, "STATIC")
    df = spark.createDataFrame([Row(doc_id=1, lang="en", v=1)])
    write_partitioned(df, str(tmp_path / "t2"), ["lang"])
    assert spark.conf.get(key) == "STATIC"


def test_max_records_per_file_bounds_files(spark, tmp_path):
    out = str(tmp_path / "t3")
    df = spark.createDataFrame(
        [Row(doc_id=i, lang="en", v=i) for i in range(100)]
    ).coalesce(1)
    write_partitioned(df, out, ["lang"], max_records_per_file=10)
    files = glob.glob(f"{out}/lang=en/*.parquet")
    assert len(files) >= 10


def test_compact_reduces_file_count_and_preserves_rows(spark, tmp_path):
    out = str(tmp_path / "t4")
    df = spark.createDataFrame(
        [Row(doc_id=i, lang=("en" if i % 2 else "fr"), v=i) for i in range(200)]
    ).repartition(20)
    df.write.mode("overwrite").partitionBy("lang").parquet(out)
    n_small = len(glob.glob(f"{out}/*/*.parquet"))
    assert n_small >= 20
    before = _read(spark, out)

    compact_partitions(spark, out, ["lang"], max_records_per_file=1000)
    n_compact = len(glob.glob(f"{out}/*/*.parquet"))
    assert n_compact < n_small
    assert _read(spark, out) == before


def test_compacted_table_still_partition_prunes(spark, tmp_path):
    """The layout contract survives compaction: a lang= filter reads
    only that partition's directory."""
    out = str(tmp_path / "t5")
    df = spark.createDataFrame(
        [Row(doc_id=i, lang=("en" if i % 2 else "fr"), v=i) for i in range(40)]
    )
    write_partitioned(df, out, ["lang"])
    compact_partitions(spark, out, ["lang"], max_records_per_file=1000)
    plan = (
        spark.read.parquet(out)
        .where(F.col("lang") == "en")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "PartitionFilters: [isnotnull(lang" in plan


def test_jsonl_shards_roundtrip_and_manifest(spark, tmp_path):
    out = str(tmp_path / "shards")
    df = spark.createDataFrame(
        [Row(doc_id=i, text=f"doc {i}") for i in range(100)]
    ).coalesce(1)
    from geosparql_etl_spark.sinks.parquet import write_jsonl_shards

    manifest = write_jsonl_shards(df, out, max_records_per_file=25)
    rows = manifest.collect()
    # >= 4 shards of <= 25 records covering all 100 docs
    assert sum(r["n_records"] for r in rows) == 100
    assert all(r["n_records"] <= 25 for r in rows)
    assert len(rows) >= 4
    assert all(r["bytes"] > 0 and r["shard"].endswith(".gz") for r in rows)

    back = spark.read.json(out)
    assert back.count() == 100
    assert {r["doc_id"] for r in back.collect()} == set(range(100))


def test_schema_evolution_mergeschema_with_defaults(spark, tmp_path):
    """Operational reality of a long-lived lake: a later drop adds a
    column. mergeSchema unions the schemas, earlier partitions surface
    NULL for the new column, and the P2 coalesce-default rule turns
    that into the documented fallback — schema-on-read evolution
    without rewriting history."""
    from pyspark.sql import functions as F

    out = str(tmp_path / "lake")
    spark.createDataFrame(
        [(1, "a")], "id long, name string"
    ).write.mode("append").parquet(out + "/drop=1")
    spark.createDataFrame(
        [(2, "b", 0.9)], "id long, name string, quality double"
    ).write.mode("append").parquet(out + "/drop=2")

    merged = spark.read.option("mergeSchema", "true").parquet(out)
    assert set(merged.columns) == {"id", "name", "quality", "drop"}
    got = {
        r.id: r.q
        for r in merged.select(
            "id", F.coalesce("quality", F.lit(0.5)).alias("q")
        ).collect()
    }
    assert got == {1: 0.5, 2: 0.9}
