"""Structured Streaming tests (SURVEY.md §2.9).

Strategy: split the events table into several parquet files in a tmp
source dir (files = micro-batches), run each streaming query with
trigger(availableNow=True) into a memory/file sink, and compare against
the identical batch computation. Checkpoint-resume is tested by adding
files and re-running with the same checkpointLocation: only the new
files are processed.
"""

from __future__ import annotations

import glob
import gzip
import os

import pytest
from pyspark.sql import functions as F

from geosparql_etl_spark.streaming import (
    events_file_stream,
    run_batched_doc_stream,
    session_windows,
    sliding_counts,
    tumbling_counts,
)


@pytest.fixture(scope="module")
def events_src(spark, sf_dir, tmp_path_factory):
    """Events table split into 4 parquet files (4 stream batches max)."""
    src = str(tmp_path_factory.mktemp("events_src"))
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read.parquet(f"{sf_dir}/events.parquet").repartition(4).write.mode(
        "overwrite"
    ).parquet(src)
    return src


def _batch_events(spark, src):
    from geosparql_etl_spark.streaming.events import normalize_event_ts

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    return normalize_event_ts(spark.read.parquet(src))


def _run_to_memory(stream_df, name, timeout=120):
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(timeout)
    return q


def _rows(df, cols):
    return sorted(tuple(r[c] for c in cols) for r in df.collect())


def test_tumbling_window_stream_matches_batch(spark, events_src):
    stream = tumbling_counts(events_file_stream(spark, events_src))
    _run_to_memory(stream, "tumbling_out")
    got = _rows(spark.table("tumbling_out"), ["window_start", "event_type", "n", "total"])

    batch = (
        _batch_events(spark, events_src)
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 4).alias("total"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n", "total")
    )
    want = _rows(batch, ["window_start", "event_type", "n", "total"])
    assert got == want and len(got) > 0


def test_sliding_window_stream_matches_batch(spark, events_src):
    stream = sliding_counts(events_file_stream(spark, events_src))
    _run_to_memory(stream, "sliding_out")
    got = _rows(spark.table("sliding_out"), ["window_start", "n"])

    batch = (
        _batch_events(spark, events_src)
        .groupBy(F.window("ts", "2 hours", "1 hour").alias("w"))
        .agg(F.count("*").alias("n"))
        .select(F.col("w.start").alias("window_start"), "n")
    )
    want = _rows(batch, ["window_start", "n"])
    assert got == want and len(got) > 0


def test_session_window_stream_matches_batch_sessionization(spark, events_src):
    """session_window in streaming == native session_window in batch."""
    stream = session_windows(events_file_stream(spark, events_src))
    _run_to_memory(stream, "session_out")
    got = _rows(spark.table("session_out"), ["user_id", "session_start", "n_events"])

    batch = (
        _batch_events(spark, events_src)
        .groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
        .agg(F.count("*").alias("n_events"))
        .select(
            F.col("w.start").alias("session_start"), "user_id", "n_events"
        )
    )
    want = _rows(batch, ["user_id", "session_start", "n_events"])
    assert got == want and len(got) > 0


def test_foreachbatch_ttl_sink_and_checkpoint_resume(spark, sf_dir, tmp_path):
    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(src)

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    full = spark.read.parquet(f"{sf_dir}/events.parquet").limit(400).cache()
    first, second = full.randomSplit([0.5, 0.5], seed=7)
    n_first, n_second = first.count(), second.count()

    first.coalesce(1).write.mode("append").parquet(src)
    stats1 = run_batched_doc_stream(
        events_file_stream(spark, src), out, ckpt, batch_size=50
    )
    assert stats1["rows"] == n_first

    # documents landed, gzip-compressed, under epoch/event_type dirs
    files = glob.glob(f"{out}/epoch=*/event_type=*/*.txt.gz")
    assert files
    body = gzip.open(files[0], "rt").read()
    assert body.startswith("event ")

    # resume: add the second half; the checkpoint skips the first files
    second.coalesce(1).write.mode("append").parquet(src)
    stats2 = run_batched_doc_stream(
        events_file_stream(spark, src), out, ckpt, batch_size=50
    )
    assert stats2["rows"] == n_second


def test_stateful_running_totals_across_batches(spark, sf_dir, tmp_path):
    """applyInPandasWithState: per-user totals accumulate across
    micro-batches; the final emitted row per user equals the batch
    groupBy over all input."""
    from geosparql_etl_spark.streaming.stateful import running_user_totals

    src = str(tmp_path / "src")
    os.makedirs(src)
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    full = spark.read.parquet(f"{sf_dir}/events.parquet").limit(300).cache()
    # two files -> two micro-batches (maxFilesPerTrigger=4 caps, fine)
    a, b = full.randomSplit([0.5, 0.5], seed=11)
    a.coalesce(1).write.mode("append").parquet(src)
    b.coalesce(1).write.mode("append").parquet(src)

    stream = running_user_totals(
        events_file_stream(spark, src).select("user_id", "value")
    )
    q = (
        stream.writeStream.format("memory")
        .queryName("running_totals")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    # last emitted row per user = cumulative totals
    out = spark.table("running_totals")
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy(F.desc("n_events"))
    final = (
        out.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("user_id", "n_events", "total_value")
    )
    got = {
        r["user_id"]: (r["n_events"], round(r["total_value"], 4))
        for r in final.collect()
    }
    want = {
        r["user_id"]: (r["n"], round(r["t"], 4))
        for r in full.groupBy("user_id")
        .agg(F.count("*").alias("n"), F.sum("value").alias("t"))
        .collect()
    }
    assert got == want and len(got) > 0


def test_stream_dedup_within_watermark_matches_batch_distinct(spark, events_src):
    from geosparql_etl_spark.streaming.events import stream_dedup

    stream = stream_dedup(events_file_stream(spark, events_src))
    q = (
        stream.writeStream.format("memory")
        .queryName("dedup_out")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = _rows(
        spark.table("dedup_out").select("user_id", "event_type"),
        ["user_id", "event_type"],
    )
    want = _rows(
        _batch_events(spark, events_src).select("user_id", "event_type").distinct(),
        ["user_id", "event_type"],
    )
    assert got == want and len(got) > 0


def test_attribution_join_stream_matches_batch(spark, events_src):
    from geosparql_etl_spark.streaming.events import attribution_join

    def split(df):
        return (
            df.where(F.col("event_type") == "click"),
            df.where(F.col("event_type") == "purchase"),
        )

    s = events_file_stream(spark, events_src)
    stream = attribution_join(*split(s))
    q = (
        stream.writeStream.format("memory")
        .queryName("attr_out")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    cols = ["click_id", "purchase_id", "user_id", "click_us", "purchase_us"]
    got = _rows(spark.table("attr_out"), cols)
    want = _rows(attribution_join(*split(_batch_events(spark, events_src))), cols)
    assert got == want and len(got) > 0


def test_stream_dedup_batch_mode_degrades_to_drop_duplicates(spark, events_src):
    from geosparql_etl_spark.streaming.events import stream_dedup

    batch = _batch_events(spark, events_src)
    out = stream_dedup(batch)
    assert not out.isStreaming
    got = _rows(out.select("user_id", "event_type"), ["user_id", "event_type"])
    want = _rows(
        batch.select("user_id", "event_type").distinct(), ["user_id", "event_type"]
    )
    assert got == want


def test_stream_static_broadcast_enrichment(spark, events_src, sf_dir):
    """Stream-static join: the event stream enriched against a static
    dimension (nation codes) via broadcast — no watermark needed on the
    static side; per-batch the dim is re-read, so slowly-changing dims
    pick up updates between micro-batches."""
    static_dim = spark.createDataFrame(
        [(t, t.upper()) for t in ["click", "view", "purchase", "signup", "error"]],
        ["event_type", "type_label"],
    )
    stream = events_file_stream(spark, events_src).join(
        F.broadcast(static_dim), "event_type"
    )
    q = (
        stream.writeStream.format("memory")
        .queryName("enriched_out")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    out = spark.table("enriched_out")
    n_stream = out.count()
    n_batch = _batch_events(spark, events_src).count()
    assert n_stream == n_batch
    assert out.where(F.col("type_label") != F.upper("event_type")).count() == 0


def test_transform_with_state_minmax_across_batches(spark, sf_dir, tmp_path):
    """transformWithStateInPandas (Spark 4 processor API): per-user
    min/max/count accumulate across micro-batches; the final emitted
    row per user equals the batch aggregate over all input."""
    from geosparql_etl_spark.streaming.stateful import (
        _twsp_available,
        running_user_minmax,
    )

    if not _twsp_available():
        pytest.skip(
            "transformWithStateInPandas needs protobuf (state-server "
            "protocol); not installed in this environment"
        )

    # transformWithState requires the RocksDB state store; scope the
    # provider switch to this query (it binds at query start)
    provider_key = "spark.sql.streaming.stateStore.providerClass"
    old_provider = spark.conf.get(provider_key, None)
    spark.conf.set(
        provider_key,
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )

    src = str(tmp_path / "src")
    os.makedirs(src)
    full = _batch_events(
        spark, f"{sf_dir}/events.parquet"
    ).limit(300).cache()
    a, b = full.randomSplit([0.5, 0.5], seed=13)
    a.coalesce(1).write.mode("append").parquet(src)
    b.coalesce(1).write.mode("append").parquet(src)

    stream = running_user_minmax(
        events_file_stream(spark, src).select("user_id", "value")
    )
    q = (
        stream.writeStream.format("memory")
        .queryName("running_minmax")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    try:
        q.awaitTermination(120)
    finally:
        if old_provider is None:
            spark.conf.unset(provider_key)
        else:
            spark.conf.set(provider_key, old_provider)

    out = spark.table("running_minmax")
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy(F.desc("n_events"))
    final = (
        out.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("user_id", "vmin", "vmax", "n_events")
    )
    got = {
        r["user_id"]: (round(r["vmin"], 6), round(r["vmax"], 6), r["n_events"])
        for r in final.collect()
    }
    want = {
        r["user_id"]: (round(r["lo"], 6), round(r["hi"], 6), r["n"])
        for r in full.groupBy("user_id")
        .agg(
            F.min("value").alias("lo"),
            F.max("value").alias("hi"),
            F.count(F.lit(1)).alias("n"),
        )
        .collect()
    }
    assert got == want and len(got) > 0


def test_events_stream_bootstraps_on_empty_dir(spark, tmp_path):
    """Normal file-source bootstrap: start the stream on an EMPTY dir
    (schema sniff has nothing to read -> EVENTS_RAW_SCHEMA fallback),
    THEN land files; the availableNow run picks them up."""
    from geosparql_etl_spark.streaming.events import EVENTS_RAW_SCHEMA

    src = str(tmp_path / "empty_events")
    os.makedirs(src)
    stream = tumbling_counts(events_file_stream(spark, src))  # must not raise

    base = 1_700_000_000_000_000_000  # nanos, the round-1/2 raw encoding
    rows = [
        (i, i % 5, "view", base + i * 60_000_000_000, float(i)) for i in range(20)
    ]
    spark.createDataFrame(rows, EVENTS_RAW_SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(src)

    _run_to_memory(stream, "bootstrap_out")
    out = spark.table("bootstrap_out").collect()
    assert sum(r["n"] for r in out) == 20


def test_json_props_stream_matches_batch(spark, events_src):
    """In-stream JSON field extraction + windowed agg == the same
    expression over a batch read (the p14 family, streamed)."""
    from geosparql_etl_spark.streaming.events import (
        events_file_stream,
        json_props_metrics,
    )

    stream = json_props_metrics(events_file_stream(spark, events_src))
    _run_to_memory(stream, "json_props_out")
    got = _rows(
        spark.table("json_props_out"),
        ["window_start", "event_type", "n", "avg_k"],
    )

    b = _batch_events(spark, events_src).withColumn(
        "k", F.get_json_object(F.col("props"), "$.k").cast("int")
    )
    batch = (
        b.where(F.col("k").isNotNull())
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count("*").alias("n"), F.round(F.avg("k"), 4).alias("avg_k"))
        .select(
            F.col("w.start").alias("window_start"), "event_type", "n", "avg_k"
        )
    )
    want = _rows(batch, ["window_start", "event_type", "n", "avg_k"])
    assert got == want and len(got) > 0


def test_stream_upsert_parquet_exactly_once_and_replay_idempotent(
    spark, events_src, tmp_path
):
    """Streaming MERGE sink: after the stream drains, the table holds
    every source event exactly once; replaying the whole stream with a
    fresh checkpoint (worst-case reprocessing) changes nothing."""
    from geosparql_etl_spark.streaming.events import events_file_stream
    from geosparql_etl_spark.streaming.sink import stream_upsert_parquet

    table = str(tmp_path / "events_table")
    src_n = _batch_events(spark, events_src).count()
    src_ids = _batch_events(spark, events_src).select("event_id").distinct().count()

    stream_upsert_parquet(
        events_file_stream(spark, events_src), table, str(tmp_path / "cp1")
    )
    got = spark.read.parquet(table)
    assert got.count() == src_ids
    assert got.select("event_id").distinct().count() == src_ids

    # full replay: fresh checkpoint reprocesses every file; the merge
    # must keep the table identical
    stream_upsert_parquet(
        events_file_stream(spark, events_src), table, str(tmp_path / "cp2")
    )
    again = spark.read.parquet(table)
    assert again.count() == src_ids
    assert again.select("event_id").distinct().count() == src_ids
    assert src_n == src_ids  # sanity: synthetic event ids are unique


def test_stream_upsert_partition_guard_rejects_wide_date_batch(
    spark, events_src, tmp_path
):
    """The MERGE sink's partition-count guard: a batch spanning more
    event_date partitions than the cap fails loudly BEFORE collecting
    the date list or rewriting anything — a mis-partitioned backfill
    must not silently rewrite thousands of partitions in one commit."""
    import pytest as _pytest

    from geosparql_etl_spark.streaming.events import events_file_stream
    from geosparql_etl_spark.streaming.sink import stream_upsert_parquet

    table = str(tmp_path / "events_table")
    n_dates = (
        _batch_events(spark, events_src)
        .select(F.to_date("ts"))
        .distinct()
        .count()
    )
    assert n_dates > 2  # the fixture must actually exercise the guard
    with _pytest.raises(Exception, match="event_date partitions"):
        stream_upsert_parquet(
            events_file_stream(spark, events_src),
            table,
            str(tmp_path / "cp_guard"),
            max_partitions_per_batch=2,
        )
    import os

    assert not os.path.isdir(table)  # nothing was written

    # at the cap boundary (cap == domain) the merge proceeds normally
    stream_upsert_parquet(
        events_file_stream(spark, events_src),
        table,
        str(tmp_path / "cp_ok"),
        max_partitions_per_batch=n_dates,
    )
    assert spark.read.parquet(table).count() > 0


def test_attribution_outer_stream_subset_and_cutoff_complete(spark, events_src):
    """right_outer attribution: a single availableNow pass can lawfully
    WITHHOLD null-side rows whose no-match proof needs a watermark
    beyond the final batch, so stream output is (a) a subset of the
    batch result and (b) COMPLETE for purchases older than
    max_ts - (watermark + horizon): their join window is fully closed,
    so inner and outer rows alike must have emitted."""
    from geosparql_etl_spark.streaming.events import attribution_join

    def split(df):
        return (
            df.where(F.col("event_type") == "click"),
            df.where(F.col("event_type") == "purchase"),
        )

    s = events_file_stream(spark, events_src)
    stream = attribution_join(*split(s), how="right_outer")
    q = (
        stream.writeStream.format("memory")
        .queryName("attr_outer_out")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    cols = ["click_id", "purchase_id", "user_id", "click_us", "purchase_us"]

    def rowset(df):  # _rows sorts, which chokes on outer-null click_ids
        return {tuple(r[c] for c in cols) for r in df.collect()}

    got = rowset(spark.table("attr_outer_out"))
    batch = attribution_join(
        *split(_batch_events(spark, events_src)), how="right_outer"
    )
    want = rowset(batch)
    assert got <= want and len(got) > 0
    max_us = max(r[4] for r in want)
    # eviction needs watermark (2h) + horizon (1h) and Spark pads the
    # state-cleanup threshold; 2x margin keeps the completeness claim
    # robust to that slack without weakening it for the bulk of rows
    cutoff = max_us - 2 * (2 + 1) * 3600 * 1_000_000
    want_old = {r for r in want if r[4] <= cutoff}
    assert want_old and want_old <= got
    # outer rows (no click) genuinely flow through the stream
    assert any(r[0] is None for r in got & want_old) or all(
        r[0] is not None for r in want_old
    )


def test_incremental_curation_stream_matches_batch_and_resumes(spark, sf_dir, tmp_path):
    """Two document drops land in sequence; the curated table after
    both availableNow runs must equal batch curation of the union
    (cross-batch fingerprint dedup included — a doc re-landed in drop
    2 must NOT reappear), and the checkpoint makes run 2 process only
    the new files."""
    import shutil

    from geosparql_etl_spark.streaming.corpus import (
        curate,
        run_incremental_curation,
    )

    land = tmp_path / "land"
    out = tmp_path / "out"
    ck = tmp_path / "ck"

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    first = docs.where(F.col("doc_id") < 300)
    second = docs.where(
        (F.col("doc_id") >= 250) & (F.col("doc_id") < 500)
    )  # 250-299 re-land: must dedup across batches
    first.write.mode("append").parquet(str(land))

    q = run_incremental_curation(spark, str(land), str(out), str(ck))
    assert q.awaitTermination(120)  # False = still running: starting a
    second.write.mode("append").parquet(str(land))  # 2nd query on this
    q2 = run_incremental_curation(spark, str(land), str(out), str(ck))
    assert q2.awaitTermination(120)  # checkpoint would then conflict

    got = spark.read.parquet(str(out)).select("doc_id", "fp", "n_tokens")
    want = curate(docs.where(F.col("doc_id") < 500)).select(
        "doc_id", "fp", "n_tokens"
    )
    g = {(r.fp, r.n_tokens) for r in got.collect()}
    w = {(r.fp, r.n_tokens) for r in want.collect()}
    # fingerprint sets must match exactly (doc_id of a dup's keeper may
    # differ: batch dropDuplicates picks arbitrarily within a frame,
    # the stream keeps the FIRST batch's copy — both lawful keepers)
    assert g == w and len(g) > 0
    # exactly one row per fingerprint in the curated table
    fps = [r.fp for r in got.collect()]
    assert len(fps) == len(set(fps))
    shutil.rmtree(str(out))


def test_streaming_quad_lake_ingest(spark, tmp_path):
    """Round 6: micro-batches of quads append into the partitionBy(g)
    ntriples lake via foreachBatch — append-safe filenames mean
    batches accumulate (never clobber) — and the result is GRAPH-
    queryable through NTriplesLakeStore with directory pruning."""
    from geosparql_etl_spark.sources.ntriples import register
    from geosparql_etl_spark.sparql import NTriplesLakeStore, sparql_select

    register(spark)
    land = str(tmp_path / "land")
    lake = str(tmp_path / "lake")
    ck = str(tmp_path / "ck")
    rows1 = [("urn:p:1", "urn:ex:name", "ada", "urn:g:hr")]
    rows2 = [
        ("urn:p:2", "urn:ex:name", "grace", "urn:g:eng"),
        ("urn:p:3", "urn:ex:name", "alan", "urn:g:hr"),
    ]
    schema = "s string, p string, o string, g string"
    spark.createDataFrame(rows1, schema).coalesce(1).write.mode(
        "append"
    ).parquet(land)
    spark.createDataFrame(rows2, schema).coalesce(1).write.mode(
        "append"
    ).parquet(land)

    def write_batch(batch_df, epoch_id):
        batch_df.selectExpr(
            "s AS subject", "p AS predicate", "o AS object",
            "TRUE AS is_literal", "CAST(NULL AS STRING) AS datatype",
            "CAST(NULL AS STRING) AS lang", "g",
        ).repartition(1, "g").write.format("ntriples").option(
            "partitionBy", "g"
        ).option("path", lake).mode("append").save()

    q = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(land)
        .writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", ck)
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(120)

    store = NTriplesLakeStore(spark, lake, quad_lake=True)
    rows = sparql_select(
        store,
        "SELECT ?n WHERE { GRAPH <urn:g:hr> { ?p <urn:ex:name> ?n } } "
        "ORDER BY ?n",
    ).collect()
    assert [r.n for r in rows] == ["ada", "alan"]
    rows = sparql_select(
        store,
        "SELECT ?g (COUNT(?p) AS ?n) WHERE { GRAPH ?g "
        "{ ?p <urn:ex:name> ?o } } GROUP BY ?g ORDER BY ?g",
    ).collect()
    assert [(r.g, r.n) for r in rows] == [("urn:g:eng", 1), ("urn:g:hr", 2)]


def test_quality_router_stream_matches_batch_split(spark, sf_dir, tmp_path):
    """The streaming dead-letter router: every non-null doc lands in
    exactly ONE of accept/review/reject, the three destination tables
    partition the input, and the split equals the batch
    route_by_quality answer."""
    from geosparql_etl_spark.streaming.corpus import (
        route_by_quality,
        run_quality_router,
    )

    land = tmp_path / "land"
    out = tmp_path / "out"
    ck = tmp_path / "ck"

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").where(
        F.col("doc_id") < 400
    )
    docs.write.mode("append").parquet(str(land))

    q = run_quality_router(spark, str(land), str(out), str(ck))
    assert q.awaitTermination(120)

    batch = route_by_quality(docs.where(F.col("text").isNotNull()))
    want = {
        dest: {r.doc_id for r in batch.where(
            F.col("destination") == dest).collect()}
        for dest in ("accept", "review", "reject")
    }
    got = {}
    for dest in ("accept", "review", "reject"):
        try:
            got[dest] = {
                r.doc_id
                for r in spark.read.parquet(f"{out}/{dest}").collect()
            }
        except Exception:
            got[dest] = set()
    assert got == want
    # the three destinations PARTITION the input: disjoint, complete
    all_ids = got["accept"] | got["review"] | got["reject"]
    assert len(all_ids) == sum(len(v) for v in got.values())
    n_in = docs.where(F.col("text").isNotNull()).count()
    assert len(all_ids) == n_in and len(got["accept"]) > 0


def test_ivf_index_maintenance_exactly_once_and_probe_parity(
    spark, sf_dir, tmp_path
):
    """Two embedding drops land in sequence; after both availableNow
    runs the maintained index must answer probes EXACTLY like an index
    built from everything at once, the checkpoint must make run 2
    ingest only the new drop (one epoch directory per micro-batch),
    and the probe scan must still prune on ivf_cell across epochs."""
    import os

    from geosparql_etl_spark.operators.similarity import (
        ivf_index_topk,
        lloyd_train,
        write_ivf_index,
    )
    from geosparql_etl_spark.streaming.ann import run_index_maintenance

    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    trained = lloyd_train(
        e, "embedding", dim=64, n_cells=16, rounds=2, memo_key=None
    )
    landing = str(tmp_path / "landing")
    index = str(tmp_path / "index")
    ck = str(tmp_path / "ck")
    write_ivf_index(
        e.where(F.col("vec_id") < 200), index, dim=64, n_cells=16,
        centroids=trained, epoch="base",
    )
    e.where((F.col("vec_id") >= 200) & (F.col("vec_id") < 350)).write.mode(
        "append"
    ).parquet(landing)
    q = run_index_maintenance(spark, landing, index, ck, centroids=trained)
    assert q.awaitTermination(120)
    e.where(F.col("vec_id") >= 350).write.mode("append").parquet(landing)
    q2 = run_index_maintenance(spark, landing, index, ck, centroids=trained)
    assert q2.awaitTermination(120)

    # every vector present exactly once across epochs
    idx = spark.read.parquet(index)
    ids = [r.neighbor_id for r in idx.select("neighbor_id").collect()]
    assert sorted(ids) == sorted(
        r.vec_id for r in e.select("vec_id").collect()
    )

    probe = e.where(F.col("vec_id") < 5)
    got = ivf_index_topk(
        spark, index, probe, k=5, dim=64, n_cells=16, n_probe=4,
        centroids=trained,
    )
    # partition pruning must survive the extra epoch partition column
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "ivf_cell" in plan

    # the as-of pin must ALSO land in PartitionFilters (epoch
    # equality/isin folds into partition pruning — historical probes
    # scan fewer directories, never more; round-12 plan pin)
    pinned = ivf_index_topk(
        spark, index, probe, k=5, dim=64, n_cells=16, n_probe=4,
        centroids=trained, as_of_seq=0,
    )
    pplan = pinned._jdf.queryExecution().executedPlan().toString()
    import re

    pf = "".join(re.findall(r"PartitionFilters: \[[^\]]*\]", pplan))
    assert "epoch" in pf and "ivf_cell" in pf

    full = str(tmp_path / "full_index")
    write_ivf_index(e, full, dim=64, n_cells=16, centroids=trained)
    want = ivf_index_topk(
        spark, full, probe, k=5, dim=64, n_cells=16, n_probe=4,
        centroids=trained,
    )
    g = [(r.query_id, r.neighbor_id, r.rank) for r in
         got.orderBy("query_id", "rank").collect()]
    w = [(r.query_id, r.neighbor_id, r.rank) for r in
         want.orderBy("query_id", "rank").collect()]
    assert g == w and len(g) == 25


def test_ivf_index_compaction_preserves_probe_answers(spark, sf_dir, tmp_path):
    """After compaction: one epoch (base), at most one file per cell,
    same vector set, identical probe answers."""
    import glob
    import os

    from geosparql_etl_spark.operators.similarity import (
        ivf_index_topk,
        lloyd_train,
        write_ivf_index,
    )
    from geosparql_etl_spark.streaming.ann import (
        compact_ivf_index,
        run_index_maintenance,
    )

    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    trained = lloyd_train(
        e, "embedding", dim=64, n_cells=16, rounds=2, memo_key=None
    )
    landing = str(tmp_path / "landing")
    index = str(tmp_path / "index")
    write_ivf_index(
        e.where(F.col("vec_id") < 200), index, dim=64, n_cells=16,
        centroids=trained, epoch="base",
    )
    e.where(F.col("vec_id") >= 200).write.mode("append").parquet(landing)
    q = run_index_maintenance(
        spark, landing, index, str(tmp_path / "ck"), centroids=trained
    )
    assert q.awaitTermination(120)

    probe = e.where(F.col("vec_id") < 5)

    def answers():
        return [
            (r.query_id, r.neighbor_id, r.rank)
            for r in ivf_index_topk(
                spark, index, probe, k=5, dim=64, n_cells=16, n_probe=4,
                centroids=trained,
            ).orderBy("query_id", "rank").collect()
        ]

    before = answers()
    n_before = spark.read.parquet(index).count()
    compact_ivf_index(spark, index)
    epochs = glob.glob(os.path.join(index, "epoch=*"))
    assert [os.path.basename(p) for p in epochs] == ["epoch=base"]
    for cell_dir in glob.glob(os.path.join(index, "epoch=base", "ivf_cell=*")):
        files = [f for f in os.listdir(cell_dir) if f.endswith(".parquet")]
        assert len(files) <= 1, cell_dir
    assert spark.read.parquet(index).count() == n_before
    assert answers() == before and len(before) == 25
    # two-phase: no temp generation left behind after the commit
    assert not os.path.exists(index.rstrip("/") + ".compact.tmp")
    assert not os.path.exists(index.rstrip("/") + ".compact.old")

    # crash AFTER commit but before cleanup leaves a stale .old copy;
    # the next compaction's recovery preamble must sweep it (the live
    # index is already the newer generation — restoring it would
    # roll the index back)
    import shutil

    old = index.rstrip("/") + ".compact.old"
    shutil.copytree(index, old)
    compact_ivf_index(spark, index)
    assert not os.path.exists(old)
    assert answers() == before


def test_ivf_compaction_failure_leaves_index_intact(
    spark, sf_dir, tmp_path, monkeypatch
):
    """A write failure mid-compaction must NOT destroy the live index:
    the compacted generation goes to a sibling temp dir first, and the
    old tree is removed only after the replacement is fully on disk."""
    import os

    from pyspark.sql.readwriter import DataFrameWriter

    from geosparql_etl_spark.operators.similarity import (
        lloyd_train,
        write_ivf_index,
    )
    from geosparql_etl_spark.streaming.ann import compact_ivf_index

    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    trained = lloyd_train(
        e, "embedding", dim=64, n_cells=16, rounds=1, memo_key=None
    )
    index = str(tmp_path / "index")
    write_ivf_index(
        e.where(F.col("vec_id") < 100), index, dim=64, n_cells=16,
        centroids=trained, epoch="base",
    )
    n_before = spark.read.parquet(index).count()

    def boom(self, path):
        raise IOError("injected: executor lost during compaction write")

    monkeypatch.setattr(DataFrameWriter, "parquet", boom)
    with pytest.raises(IOError, match="injected"):
        compact_ivf_index(spark, index)
    monkeypatch.undo()
    # the live index is untouched and still fully readable
    assert spark.read.parquet(index).count() == n_before


def test_ivf_compaction_recovers_from_crashed_swap(spark, sf_dir, tmp_path):
    """The swap's crash window (index moved aside, replacement not yet
    renamed in): the next compaction call must RESTORE the moved-aside
    generation instead of deleting the only surviving copy."""
    import os
    import shutil

    from geosparql_etl_spark.operators.similarity import (
        lloyd_train,
        write_ivf_index,
    )
    from geosparql_etl_spark.streaming.ann import compact_ivf_index

    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    trained = lloyd_train(
        e, "embedding", dim=64, n_cells=16, rounds=1, memo_key=None
    )
    index = str(tmp_path / "index")
    write_ivf_index(
        e.where(F.col("vec_id") < 100), index, dim=64, n_cells=16,
        centroids=trained, epoch="base",
    )
    n = spark.read.parquet(index).count()
    # simulate a crash between the two swap renames: the live index
    # directory is gone, everything survives only in .compact.old
    os.replace(index, index + ".compact.old")
    assert not os.path.exists(index)
    compact_ivf_index(spark, index)
    assert spark.read.parquet(index).count() == n
    assert not os.path.exists(index + ".compact.old")
    assert not os.path.exists(index + ".compact.tmp")


def test_ivf_index_tombstone_delete_lifecycle(spark, sf_dir, tmp_path):
    """delete_from_ivf_index is an O(|deletes|) tombstone append: the
    probe must exclude deleted ids immediately (logical delete),
    answer EXACTLY like an index built without them, and compaction
    must apply the deletes physically while clearing the tombstones
    atomically with the generation swap."""
    import os

    from geosparql_etl_spark.operators.similarity import (
        delete_from_ivf_index,
        ivf_index_topk,
        lloyd_train,
        read_index_tombstones,
        write_ivf_index,
    )
    from geosparql_etl_spark.streaming.ann import compact_ivf_index

    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    trained = lloyd_train(
        e, "embedding", dim=64, n_cells=16, rounds=2, memo_key=None
    )
    index = str(tmp_path / "index")
    ref = str(tmp_path / "ref")
    write_ivf_index(e, index, dim=64, n_cells=16, centroids=trained)
    write_ivf_index(
        e.where(F.col("vec_id") % 7 != 0), ref, dim=64, n_cells=16,
        centroids=trained,
    )
    probe = e.where(F.col("vec_id") < 5)

    def answers(path):
        return [
            (r.query_id, r.neighbor_id, r.rank)
            for r in ivf_index_topk(
                spark, path, probe, k=5, dim=64, n_cells=16, n_probe=4,
                centroids=trained,
            ).orderBy("query_id", "rank").collect()
        ]

    before = answers(index)
    assert any(n % 7 == 0 for _, n, _ in before), "fixture must bite"

    # two delete batches accumulate (dedup across files)
    delete_from_ivf_index(
        spark, index, e.where(F.col("vec_id") % 14 == 0).select("vec_id")
    )
    delete_from_ivf_index(
        spark, index, e.where(F.col("vec_id") % 7 == 0).select("vec_id")
    )
    logical = answers(index)
    assert not any(n % 7 == 0 for _, n, _ in logical)
    # the logical view answers exactly like an index built without them
    assert logical == answers(ref)

    # compaction applies tombstones physically and clears them
    n_live = e.where(F.col("vec_id") % 7 != 0).count()
    compact_ivf_index(spark, index)
    assert not os.path.exists(os.path.join(index, "_tombstones"))
    assert read_index_tombstones(spark, index) is None
    assert spark.read.parquet(index).count() == n_live
    assert answers(index) == logical


def test_text_index_cdc_upserts_converge_and_restart_noop(
    spark, sf_dir, tmp_path
):
    """CDC into the text lake: streamed upsert batches (re-crawled
    versions of known docs) must leave serving equal to index-free
    scoring of the UPDATED corpus, and a checkpoint restart over the
    same landing dir must change nothing (exactly-once discovery on
    top of idempotent per-epoch upserts)."""
    import os

    from geosparql_etl_spark.operators.retrieval import (
        bm25_scores,
        run_text_index_upserts,
        text_index_topk,
        write_text_index,
    )

    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    terms = ["query", "join", "filter"]
    root = str(tmp_path)
    idx = os.path.join(root, "index")
    landing = os.path.join(root, "landing")
    write_text_index(d, idx)
    d.where(F.col("doc_id") % 3 == 1).select(
        "doc_id",
        F.concat(F.col("text"), F.lit(" fresh crawl query")).alias("text"),
    ).repartition(8).write.mode("overwrite").parquet(landing)

    q = run_text_index_upserts(spark, landing, idx, os.path.join(root, "ck"))
    assert q.awaitTermination(300)

    live = d.select(
        "doc_id",
        F.when(
            F.col("doc_id") % 3 == 1,
            F.concat(F.col("text"), F.lit(" fresh crawl query")),
        ).otherwise(F.col("text")).alias("text"),
    )
    want = [
        (r.doc_id, float(r.score))
        for r in bm25_scores(live, terms)
        .orderBy(F.col("score").desc(), "doc_id")
        .limit(15)
        .collect()
    ]
    got = [
        (r.doc_id, float(r.score))
        for r in text_index_topk(spark, idx, terms, k=15).collect()
    ]
    assert got == want

    # restart against the same checkpoint: nothing new to ingest
    q2 = run_text_index_upserts(
        spark, landing, idx, os.path.join(root, "ck")
    )
    assert q2.awaitTermination(300)
    again = [
        (r.doc_id, float(r.score))
        for r in text_index_topk(spark, idx, terms, k=15).collect()
    ]
    assert again == want


def test_text_index_two_upsert_streams_interleaved_restarts(
    spark, sf_dir, tmp_path
):
    """TWO independent CDC streams upsert into ONE text index with
    interleaved waves and checkpoint restarts (round-12, verdict item
    7): stream A re-crawls even docs, stream B odd docs, each in two
    waves, each wave a fresh availableNow run against the stream's
    own checkpoint (a restart that must ingest only the new files).
    Epoch tags are stream-id-namespaced and ledger commits are
    per-epoch sidecar files, so the four runs' eight-ish epochs all
    survive and serving converges to the merged corpus — bit-equal to
    index-free BM25 over the final doc versions."""
    import os

    from geosparql_etl_spark.operators.retrieval import (
        bm25_scores,
        run_text_index_upserts,
        text_index_topk,
        write_text_index,
    )

    d = spark.read.parquet(f"{sf_dir}/documents.parquet").where(
        F.col("doc_id") < 80
    )
    terms = ["query", "join", "filter"]
    root = str(tmp_path)
    idx = os.path.join(root, "index")
    write_text_index(d, idx)
    land_a, land_b = os.path.join(root, "la"), os.path.join(root, "lb")
    ck_a, ck_b = os.path.join(root, "cka"), os.path.join(root, "ckb")

    def land(dirname, pred, suffix):
        d.where(pred).select(
            "doc_id",
            F.concat(F.col("text"), F.lit(suffix)).alias("text"),
        ).coalesce(2).write.mode("append").parquet(dirname)

    def run(landing, ck):
        q = run_text_index_upserts(spark, landing, idx, ck)
        assert q.awaitTermination(300)

    even, odd = F.col("doc_id") % 2 == 0, F.col("doc_id") % 2 == 1
    # wave 1, interleaved
    land(land_a, even, " rev-a1 query")
    run(land_a, ck_a)
    land(land_b, odd, " rev-b1 join")
    run(land_b, ck_b)
    # wave 2: each stream RESTARTS from its checkpoint and must pick
    # up only its new files; B restarts before A's second wave lands
    land(land_b, odd & (F.col("doc_id") % 3 == 0), " rev-b2 filter")
    run(land_b, ck_b)
    land(land_a, even & (F.col("doc_id") % 3 == 0), " rev-a2 query")
    run(land_a, ck_a)

    # upserts REPLACE (each landed file was built from the original
    # text), so a doc's final version carries only its latest suffix
    final = d.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.when(
                even & (F.col("doc_id") % 3 == 0), F.lit(" rev-a2 query")
            )
            .when(even, F.lit(" rev-a1 query"))
            .when(odd & (F.col("doc_id") % 3 == 0), F.lit(" rev-b2 filter"))
            .otherwise(F.lit(" rev-b1 join")),
        ).alias("text"),
    )
    want = [
        (r.doc_id, float(r.score))
        for r in bm25_scores(final, terms)
        .orderBy(F.col("score").desc(), "doc_id")
        .limit(15)
        .collect()
    ]
    got = [
        (r.doc_id, float(r.score))
        for r in text_index_topk(spark, idx, terms, k=15).collect()
    ]
    assert got == want


def test_text_index_truly_concurrent_commits_both_survive(
    spark, sf_dir, tmp_path
):
    """Two writer THREADS upsert disjoint doc sets into one index at
    the same time (round-12): the per-epoch sidecar ledger makes each
    commit one atomic rename, so no interleaving can lose an epoch —
    the old read-modify-write _stats.json could drop a just-committed
    epoch under exactly this race. All six epochs must be present and
    serving must equal index-free scoring of the merged final corpus."""
    import os
    import threading

    from geosparql_etl_spark.operators.retrieval import (
        _epoch_seqs,
        _read_stats,
        bm25_scores,
        text_index_topk,
        update_text_index,
        write_text_index,
    )

    d = spark.read.parquet(f"{sf_dir}/documents.parquet").where(
        F.col("doc_id") < 60
    )
    idx = str(tmp_path / "bm25")
    terms = ["query", "join", "filter"]
    write_text_index(d, idx)

    errs = []

    def writer(tag, pred):
        try:
            for i in range(3):
                update_text_index(
                    d.where(pred).select(
                        "doc_id",
                        F.concat(
                            F.col("text"), F.lit(f" {tag}{i} query")
                        ).alias("text"),
                    ),
                    idx,
                    epoch=f"{tag}{i}",
                )
        except Exception as exc:  # pragma: no cover - surfaced below
            errs.append(exc)

    t1 = threading.Thread(
        target=writer, args=("wa", F.col("doc_id") % 2 == 0)
    )
    t2 = threading.Thread(
        target=writer, args=("wb", F.col("doc_id") % 2 == 1)
    )
    t1.start(); t2.start(); t1.join(); t2.join()
    assert not errs, errs

    seqs = _epoch_seqs(_read_stats(idx))
    for tag in ("wa0", "wa1", "wa2", "wb0", "wb1", "wb2"):
        assert tag in seqs, f"lost commit {tag} — ledger race"

    # each update REPLACES the doc (delete + append), so the final
    # version carries only the last wave's suffix
    final = d.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.when(
                F.col("doc_id") % 2 == 0, F.lit(" wa2 query")
            ).otherwise(F.lit(" wb2 query")),
        ).alias("text"),
    )
    want = [
        (r.doc_id, float(r.score))
        for r in bm25_scores(final, terms)
        .orderBy(F.col("score").desc(), "doc_id")
        .limit(15)
        .collect()
    ]
    got = [
        (r.doc_id, float(r.score))
        for r in text_index_topk(spark, idx, terms, k=15).collect()
    ]
    assert got == want


def test_ivf_index_update_lifecycle(spark, sf_dir, tmp_path):
    """Vector updates via epoch-scoped tombstones: (a) after
    update + plain delete, probes answer exactly like an index built
    FRESH over the live corpus (re-embedded vectors serve from their
    new cells, superseded versions invisible); (b) a replayed update
    epoch is a no-op; (c) compaction applies everything physically,
    clears tombstones and preserves answers; (d) a plain delete of an
    updated id kills the re-insert too."""
    import os

    from geosparql_etl_spark.operators.similarity import (
        delete_from_ivf_index,
        ivf_index_topk,
        lloyd_train,
        update_ivf_index,
        write_ivf_index,
    )
    from geosparql_etl_spark.streaming.ann import compact_ivf_index

    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    trained = lloyd_train(e, "embedding", dim=64, n_cells=16, rounds=10)
    idx = str(tmp_path / "ivf")
    write_ivf_index(
        e, idx, dim=64, n_cells=16, centroids=trained, epoch="base"
    )
    nxt = e.select(
        (F.col("vec_id") - 1).alias("vec_id"),
        F.col("embedding").alias("nemb"),
    )
    upd = (
        e.where(F.col("vec_id") % 10 == 2)
        .join(nxt, "vec_id")
        .select("vec_id", F.col("nemb").alias("embedding"))
    )
    update_ivf_index(
        spark, upd, idx, epoch="u1", dim=64, n_cells=16, centroids=trained
    )
    # (b) replay re-issues the identical tombstone scope + epoch
    update_ivf_index(
        spark, upd, idx, epoch="u1", dim=64, n_cells=16, centroids=trained
    )
    delete_from_ivf_index(
        spark, idx, e.where(F.col("vec_id") % 9 == 4).select("vec_id")
    )

    live = (
        e.join(
            upd.select("vec_id", F.col("embedding").alias("ne")),
            "vec_id",
            "left",
        )
        .select("vec_id", F.coalesce("ne", "embedding").alias("embedding"))
        .where(F.col("vec_id") % 9 != 4)
    )
    ref = str(tmp_path / "ref")
    write_ivf_index(
        live, ref, dim=64, n_cells=16, centroids=trained, epoch="base"
    )
    probe = e.where(F.col("vec_id") < 5)

    def answers(p):
        return [
            (r.query_id, r.neighbor_id, round(r.cosine_sim, 6))
            for r in ivf_index_topk(
                spark, p, probe, k=5, dim=64, n_cells=16, n_probe=6,
                centroids=trained,
            ).collect()
        ]

    got = answers(idx)
    assert got == answers(ref)  # (a) + (b)
    # (d) a plain delete of an updated id removes its live re-insert
    assert not any(n % 9 == 4 for _, n, _ in got)

    compact_ivf_index(spark, idx)
    assert not os.path.exists(os.path.join(idx, "_tombstones"))
    assert answers(idx) == got  # (c)


def test_ann_cdc_upserts_converge_and_restart_noop(spark, sf_dir, tmp_path):
    """Streamed vector upserts must leave probes equal to an index
    built fresh over the updated corpus, and a checkpoint restart
    over the same landing dir must change nothing."""
    import os

    from geosparql_etl_spark.operators.similarity import (
        ivf_index_topk,
        lloyd_train,
        write_ivf_index,
    )
    from geosparql_etl_spark.streaming.ann import run_ann_upserts

    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    trained = lloyd_train(e, "embedding", dim=64, n_cells=16, rounds=10)
    root = str(tmp_path)
    index = os.path.join(root, "index")
    landing = os.path.join(root, "landing")
    write_ivf_index(
        e, index, dim=64, n_cells=16, centroids=trained, epoch="base"
    )
    nxt = e.select(
        (F.col("vec_id") - 1).alias("vec_id"),
        F.col("embedding").alias("nemb"),
    )
    upd = (
        e.where(F.col("vec_id") % 4 == 3)
        .join(nxt, "vec_id")
        .select("vec_id", F.col("nemb").alias("embedding"))
    )
    upd.repartition(8).write.mode("overwrite").parquet(landing)
    q = run_ann_upserts(
        spark, landing, index, os.path.join(root, "ck"), centroids=trained
    )
    assert q.awaitTermination(300)

    live = (
        e.join(
            upd.select("vec_id", F.col("embedding").alias("ne")),
            "vec_id",
            "left",
        ).select("vec_id", F.coalesce("ne", "embedding").alias("embedding"))
    )
    ref = os.path.join(root, "ref")
    write_ivf_index(
        live, ref, dim=64, n_cells=16, centroids=trained, epoch="base"
    )
    probe = e.where(F.col("vec_id") < 5)

    def answers(p):
        return [
            (r.query_id, r.neighbor_id, round(r.cosine_sim, 6))
            for r in ivf_index_topk(
                spark, p, probe, k=5, dim=64, n_cells=16, n_probe=6,
                centroids=trained,
            ).collect()
        ]

    want = answers(ref)
    assert answers(index) == want
    q2 = run_ann_upserts(
        spark, landing, index, os.path.join(root, "ck"), centroids=trained
    )
    assert q2.awaitTermination(300)
    assert answers(index) == want


def test_ivf_torn_update_tombstones_dormant_until_epoch_commits(
    spark, sf_dir, tmp_path
):
    """ANN crash atomicity: update tombstones are stamped with their
    src_epoch and stay dormant until that epoch's _SUCCESS marker
    exists — simulate the crash (tombstones on disk, epoch dir
    removed) and probes must serve the OLD versions; re-landing the
    epoch activates the tombstones with its commit."""
    import os
    import shutil

    from geosparql_etl_spark.operators.similarity import (
        ivf_index_topk,
        lloyd_train,
        update_ivf_index,
        write_ivf_index,
    )

    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    trained = lloyd_train(e, "embedding", dim=64, n_cells=16, rounds=10)
    idx = str(tmp_path / "ivf")
    write_ivf_index(
        e, idx, dim=64, n_cells=16, centroids=trained, epoch="base"
    )
    probe = e.where(F.col("vec_id") < 5)

    def answers():
        return [
            (r.query_id, r.neighbor_id, round(r.cosine_sim, 6))
            for r in ivf_index_topk(
                spark, idx, probe, k=5, dim=64, n_cells=16, n_probe=6,
                centroids=trained,
            ).collect()
        ]

    before = answers()
    nxt = e.select(
        (F.col("vec_id") - 1).alias("vec_id"),
        F.col("embedding").alias("nemb"),
    )
    upd = (
        e.where(F.col("vec_id") % 10 == 2)
        .join(nxt, "vec_id")
        .select("vec_id", F.col("nemb").alias("embedding"))
    )
    update_ivf_index(
        spark, upd, idx, epoch="u1", dim=64, n_cells=16, centroids=trained
    )
    after = answers()
    # simulate the crash window: replacement epoch gone, tombstones left
    shutil.rmtree(os.path.join(idx, "epoch=u1"))
    assert answers() == before  # dormant — old versions serve

    # replayed update re-lands the epoch; its commit activates them
    update_ivf_index(
        spark, upd, idx, epoch="u1", dim=64, n_cells=16, centroids=trained
    )
    assert answers() == after


def test_pq_index_full_lifecycle(spark, sf_dir, tmp_path):
    """The PQ lake gains the full CRUD lifecycle (round 12 — the
    codebooks persist in _quantizer.json, so the old 'updates need
    build-time codebooks' refusal is lifted): epoch'd build + append,
    UPDATE (the new epoch encodes __pq with the sidecar quantizer),
    DELETE, and compaction that KEEPS the codes and carry columns
    (the old keep-list silently dropped __pq). After every mutation
    the persisted probe must equal a fresh PQ index built over the
    live corpus; a filtered probe must read real carry values for
    updated rows."""
    from geosparql_etl_spark.operators.similarity import (
        delete_from_ivf_index,
        ivf_index_pq_topk,
        lloyd_train,
        pq_train,
        update_ivf_index,
        write_ivf_pq_index,
    )
    from geosparql_etl_spark.streaming.ann import compact_ivf_index

    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id", "embedding", "label"
    )
    vecs = {r.vec_id: (r.embedding, r.label) for r in e.collect()}
    n = len(vecs)
    trained = lloyd_train(e, "embedding", dim=64, n_cells=8, rounds=3)
    books = pq_train(e, "embedding", dim=64, m=16, k=16, rounds=3)
    idx = str(tmp_path / "ivfpq")
    write_ivf_pq_index(
        e.where(F.col("vec_id") < n // 2), idx, dim=64, n_cells=8,
        centroids=trained, codebooks=books, carry_cols=("label",),
        epoch="base",
    )
    write_ivf_pq_index(
        e.where(F.col("vec_id") >= n // 2), idx, dim=64, n_cells=8,
        centroids=trained, codebooks=books, carry_cols=("label",),
        epoch="a1",
    )
    probe = e.where(F.col("vec_id") < 3).select("vec_id", "embedding")

    def answers(p):
        return [
            (r.query_id, r.neighbor_id, round(r.cosine_sim, 6))
            for r in ivf_index_pq_topk(
                spark, p, probe, kq=5, shortlist=40, dim=64, n_cells=8,
                n_probe=8, centroids=trained, codebooks=books,
            ).collect()
        ]

    def fresh(tag, df):
        p = str(tmp_path / tag)
        write_ivf_pq_index(
            df, p, dim=64, n_cells=8, centroids=trained,
            codebooks=books, carry_cols=("label",), epoch="base",
        )
        return answers(p)

    assert answers(idx) == fresh("ref0", e)

    # UPDATE: re-embed %10==2 to its successor's vector, same label
    upd_ids = [i for i in sorted(vecs) if i % 10 == 2]
    upd = spark.createDataFrame(
        [(i, vecs[(i + 1) % n][0], vecs[i][1]) for i in upd_ids],
        "vec_id long, embedding array<float>, label int",
    )
    update_ivf_index(
        spark, upd, idx, epoch="u1", dim=64, n_cells=8,
        centroids=trained,
    )
    live = e.where(~F.col("vec_id").isin(upd_ids)).unionByName(upd)
    assert answers(idx) == fresh("ref1", live)

    # filtered probe reads REAL carry values for the updated rows
    lbl = int(sorted({vecs[i][1] for i in upd_ids})[0])
    filt = ivf_index_pq_topk(
        spark, idx, probe, kq=5, shortlist=40, dim=64, n_cells=8,
        n_probe=8, centroids=trained, codebooks=books,
        candidate_filter=F.col("label") == lbl,
    ).collect()
    assert len(filt) > 0

    # DELETE + compaction keeps codes/carry and serves identically
    del_ids = [i for i in sorted(vecs) if i % 9 == 4]
    delete_from_ivf_index(spark, idx, del_ids)
    live2 = live.where(~F.col("vec_id").isin(del_ids))
    assert answers(idx) == fresh("ref2", live2)
    compact_ivf_index(spark, idx)
    cols = set(spark.read.parquet(idx).columns)
    assert "__pq" in cols and "label" in cols
    assert answers(idx) == fresh("ref3", live2)


def test_ivf_index_self_describing_quantizer(spark, sf_dir, tmp_path):
    """Indexes persist their quantizer (_quantizer.json, round 12):
    probes called WITHOUT centroids resolve dim/n_cells/centroids
    from the sidecar and must answer exactly like an explicit-arg
    probe; after a retrain swap the sidecar-resolved probe follows
    the NEW quantizer automatically; an epoch append with a different
    quantizer fails loudly (drift guard); the PQ layout resolves its
    codebooks the same way."""
    import pytest

    from geosparql_etl_spark.operators.similarity import (
        ivf_index_pq_topk,
        ivf_index_topk,
        lloyd_train,
        maybe_retrain_ivf_index,
        pq_train,
        write_ivf_index,
        write_ivf_pq_index,
    )

    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    trained = lloyd_train(e, "embedding", dim=64, n_cells=8, rounds=3)
    idx = str(tmp_path / "ivf")
    quarter = e.where(F.col("vec_id") < 125)
    write_ivf_index(quarter, idx, dim=64, n_cells=8, centroids=trained,
                    epoch="base")
    probe = e.where(F.col("vec_id") < 3)

    def ans(**kw):
        return [
            (r.query_id, r.neighbor_id, round(r.cosine_sim, 6))
            for r in ivf_index_topk(
                spark, idx, probe, k=5, n_probe=8, **kw
            ).collect()
        ]

    explicit = ans(dim=64, n_cells=8, centroids=trained)
    assert ans() == explicit  # sidecar-resolved

    # appending with a DIFFERENT quantizer fails loudly
    other = lloyd_train(e, "embedding", dim=64, n_cells=8, rounds=1)
    assert other != trained
    with pytest.raises(ValueError, match="drift"):
        write_ivf_index(
            e.where(F.col("vec_id") >= 125), idx, dim=64, n_cells=8,
            centroids=other, epoch="a1",
        )

    # a retrain swap re-points sidecar-resolved probes automatically
    write_ivf_index(
        e.where(F.col("vec_id") >= 125), idx, dim=64, n_cells=8,
        centroids=trained, epoch="a1",
    )
    got_cells, got_cents = maybe_retrain_ivf_index(
        spark, idx, current_n_cells=8, rounds=3
    )
    assert got_cents is not None
    assert ans() == ans(
        dim=64, n_cells=got_cells, centroids=got_cents
    )

    # PQ layout: codebooks resolve from the sidecar too
    books = pq_train(e, "embedding", dim=64, m=16, k=16, rounds=3)
    pq_idx = str(tmp_path / "ivfpq")
    write_ivf_pq_index(e, pq_idx, dim=64, n_cells=8, centroids=trained,
                       codebooks=books)
    exp = [
        (r.query_id, r.neighbor_id, round(r.cosine_sim, 6))
        for r in ivf_index_pq_topk(
            spark, pq_idx, probe, kq=5, n_probe=8, dim=64, n_cells=8,
            centroids=trained, codebooks=books,
        ).collect()
    ]
    got = [
        (r.query_id, r.neighbor_id, round(r.cosine_sim, 6))
        for r in ivf_index_pq_topk(
            spark, pq_idx, probe, kq=5, n_probe=8
        ).collect()
    ]
    assert got == exp


def test_ivf_index_time_travel(spark, sf_dir, tmp_path):
    """as_of_seq pins a probe to a historical snapshot of the vector
    lake (round 12 — sim31's time travel brought to the ANN side):
    epochs committed after the pin and tombstones issued after it
    don't exist yet at the pin. Each arm must equal a FRESH index
    built over that moment's corpus; the historical arms must be
    unaffected by later updates/deletes."""
    from geosparql_etl_spark.operators.similarity import (
        delete_from_ivf_index,
        ivf_index_topk,
        lloyd_train,
        update_ivf_index,
        write_ivf_index,
    )

    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    vecs = {r.vec_id: r.embedding for r in e.collect()}
    n = len(vecs)
    trained = lloyd_train(e, "embedding", dim=64, n_cells=8, rounds=3)
    idx = str(tmp_path / "ivf")
    half = e.where(F.col("vec_id") < n // 2)
    rest = e.where(F.col("vec_id") >= n // 2)
    write_ivf_index(half, idx, dim=64, n_cells=8, centroids=trained,
                    epoch="base")                                  # seq 0
    write_ivf_index(rest, idx, dim=64, n_cells=8, centroids=trained,
                    epoch="a1", mode="overwrite")                  # seq 1
    upd_ids = [5, 6]
    upd = spark.createDataFrame(
        [(i, vecs[(i + 31) % n]) for i in upd_ids],
        "vec_id long, embedding array<float>",
    )
    update_ivf_index(spark, upd, idx, epoch="u2", dim=64, n_cells=8,
                     centroids=trained)                            # seq 2
    del_ids = [7, 8]
    delete_from_ivf_index(spark, idx, del_ids)                     # issued 2

    probe = e.where(F.col("vec_id") < 3)

    def answers(path, as_of=None):
        return [
            (r.query_id, r.neighbor_id, round(r.cosine_sim, 6))
            for r in ivf_index_topk(
                spark, path, probe, k=5, dim=64, n_cells=8, n_probe=8,
                centroids=trained, as_of_seq=as_of,
            ).collect()
        ]

    def fresh(tag, df):
        p = str(tmp_path / tag)
        write_ivf_index(df, p, dim=64, n_cells=8, centroids=trained,
                        epoch="base")
        return answers(p)

    assert answers(idx, as_of=0) == fresh("ref0", half)
    assert answers(idx, as_of=1) == fresh("ref1", e)
    latest_live = (
        e.select("vec_id", "embedding")
        .where(~F.col("vec_id").isin(del_ids + upd_ids))
        .unionByName(
            spark.createDataFrame(
                [(i, vecs[(i + 31) % n]) for i in upd_ids],
                "vec_id long, embedding array<float>",
            )
        )
    )
    assert answers(idx, as_of=2) == fresh("ref2", latest_live)
    assert answers(idx) == answers(idx, as_of=2)


def test_maybe_retrain_fires_on_step_change_only(spark, sf_dir, tmp_path):
    """The auto-retrain trigger: no-op while auto_n_cells(live) equals
    the built size; after a 4x corpus step-change it re-trains at the
    new auto size, swaps the re-partitioned base generation in
    (applying pending tombstones), and probes answer identically to a
    fresh build over the live corpus with the returned centroids."""
    import os

    from geosparql_etl_spark.operators.similarity import (
        auto_n_cells,
        delete_from_ivf_index,
        ivf_index_topk,
        lloyd_train,
        maybe_retrain_ivf_index,
        write_ivf_index,
    )

    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    n = e.count()
    quarter = e.where(F.col("vec_id") < n // 4)
    c1 = auto_n_cells(n // 4)
    t1 = lloyd_train(quarter, "embedding", dim=64, n_cells=c1, rounds=3)
    idx = str(tmp_path / "ivf")
    write_ivf_index(quarter, idx, dim=64, n_cells=c1, centroids=t1,
                    epoch="base")

    # steady state: no retrain
    got_cells, got_cents = maybe_retrain_ivf_index(
        spark, idx, current_n_cells=c1, rounds=3
    )
    assert (got_cells, got_cents) == (c1, None)

    # step-change: append the rest, delete a few, then trigger
    write_ivf_index(
        e.where(F.col("vec_id") >= n // 4), idx, dim=64, n_cells=c1,
        centroids=t1, epoch="a1",
    )
    victims = [0, 1]
    delete_from_ivf_index(spark, idx, victims)
    c2 = auto_n_cells(n - len(victims))
    assert c2 > c1
    got_cells, got_cents = maybe_retrain_ivf_index(
        spark, idx, current_n_cells=c1, rounds=3
    )
    assert got_cells == c2 and got_cents is not None
    # tombstones were applied physically by the swap
    assert not os.path.exists(os.path.join(idx, "_tombstones"))

    live = e.where(~F.col("vec_id").isin(victims))
    ref = str(tmp_path / "ref")
    write_ivf_index(live, ref, dim=64, n_cells=c2, centroids=got_cents,
                    epoch="base")
    probe = e.where(F.col("vec_id") < 3)

    def answers(p):
        return [
            (r.query_id, r.neighbor_id, round(r.cosine_sim, 6))
            for r in ivf_index_topk(
                spark, p, probe, k=5, dim=64, n_cells=c2, n_probe=c2,
                centroids=got_cents,
            ).collect()
        ]

    assert answers(idx) == answers(ref)


def test_ivf_index_replayed_update_spares_interleaved_epoch(
    spark, sf_dir, tmp_path
):
    """A REPLAYED update must re-issue its ORIGINAL tombstone scope,
    not recompute it: if another writer commits an epoch between the
    crash and the replay, a recomputed scope would tombstone that
    newer epoch's version of any shared id (round-11 advisor
    finding). The persisted scope is the batch's own src_epoch-keyed
    tombstone rows — the replay detects and reuses them."""
    from geosparql_etl_spark.operators.similarity import (
        ivf_index_topk,
        lloyd_train,
        update_ivf_index,
        write_ivf_index,
    )

    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet").where(
        F.col("vec_id") < 200
    )
    vecs = {r.vec_id: r.embedding for r in e.collect()}
    trained = lloyd_train(e, "embedding", dim=64, n_cells=4, rounds=3)
    idx = str(tmp_path / "ivf")
    write_ivf_index(e, idx, dim=64, n_cells=4, centroids=trained,
                    epoch="base")

    shared = 7
    donor_a = vecs[(shared + 13) % 200]
    donor_b = vecs[(shared + 29) % 200]

    def upd(vid, emb, epoch):
        df = spark.createDataFrame(
            [(vid, emb)], "vec_id long, embedding array<float>"
        )
        update_ivf_index(spark, df, idx, epoch=epoch, dim=64,
                         n_cells=4, centroids=trained)

    # batch u1 updates the shared id...
    upd(shared, donor_a, "u1")
    # ...then a SECOND writer's epoch u2 updates it again (newer wins)
    upd(shared, donor_b, "u2")

    def served_vec():
        probe = spark.createDataFrame(
            [(9999, donor_b)], "vec_id long, embedding array<float>"
        )
        top = ivf_index_topk(
            spark, idx, probe, k=1, dim=64, n_cells=4, n_probe=4,
            centroids=trained,
        ).collect()
        return top[0].neighbor_id, round(top[0].cosine_sim, 6)

    want = served_vec()
    assert want[0] == shared and want[1] == 1.0  # u2's version serves

    # replay u1 (crash/restart re-runs the batch): the recomputed
    # scope would now include u2 and kill donor_b; the persisted
    # scope must spare it
    upd(shared, donor_a, "u1")
    assert served_vec() == want


def test_ivf_index_compact_fully_tombstoned(spark, sf_dir, tmp_path):
    """Compacting an ANN index whose every vector is tombstoned must
    complete and leave a valid (empty but schema-bearing) base
    generation that still probes, accepts appends and compacts again
    — the vector-lake twin of the fully-deleted text compaction
    hazard (zero-row partitionBy writes no parquet footer)."""
    from geosparql_etl_spark.operators.similarity import (
        delete_from_ivf_index,
        ivf_index_topk,
        lloyd_train,
        write_ivf_index,
    )
    from geosparql_etl_spark.streaming.ann import compact_ivf_index

    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet").where(
        F.col("vec_id") < 50
    )
    trained = lloyd_train(e, "embedding", dim=64, n_cells=4, rounds=3)
    idx = str(tmp_path / "ivf")
    write_ivf_index(e, idx, dim=64, n_cells=4, centroids=trained,
                    epoch="base")
    delete_from_ivf_index(
        spark, idx, [r.vec_id for r in e.select("vec_id").collect()]
    )
    compact_ivf_index(spark, idx)
    probe = e.where(F.col("vec_id") < 3)

    def n_hits():
        return ivf_index_topk(
            spark, idx, probe, k=5, dim=64, n_cells=4, n_probe=4,
            centroids=trained,
        ).count()

    assert n_hits() == 0
    write_ivf_index(
        e.where(F.col("vec_id") >= 10), idx, dim=64, n_cells=4,
        centroids=trained, epoch="a1",
    )
    assert n_hits() > 0
    compact_ivf_index(spark, idx)
    assert n_hits() > 0


def test_ivf_index_delete_then_reinsert_serves(spark, sf_dir, tmp_path):
    """Plain-delete tombstones are scoped to the epochs committed at
    issue time (like the text lake's seq scope), so an UPDATE that
    re-inserts a previously deleted id lands in a later epoch and
    serves — and survives compaction physically. The round-11 advisor
    finding: NULL-scoped deletes killed the id in ALL epochs forever,
    so a deleted-then-reinserted vector was silently suppressed and
    then dropped by compact_ivf_index."""
    from geosparql_etl_spark.operators.similarity import (
        delete_from_ivf_index,
        ivf_index_topk,
        lloyd_train,
        update_ivf_index,
        write_ivf_index,
    )
    from geosparql_etl_spark.streaming.ann import compact_ivf_index

    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    trained = lloyd_train(e, "embedding", dim=64, n_cells=16, rounds=5)
    idx = str(tmp_path / "ivf")
    write_ivf_index(e, idx, dim=64, n_cells=16, centroids=trained,
                    epoch="base")
    probe = e.where(F.col("vec_id") < 3)

    def hits():
        return {
            r.neighbor_id
            for r in ivf_index_topk(
                spark, idx, probe, k=5, dim=64, n_cells=16,
                n_probe=16, centroids=trained,
            ).collect()
        }

    # pick a currently-served neighbor as the victim (self-matches
    # are excluded from top-k, so a probe id won't do)
    victim = min(hits())
    delete_from_ivf_index(spark, idx, [victim])
    assert victim not in hits()

    # re-insert via the CDC upsert path: the new epoch post-dates the
    # delete's tombstone scope, so the vector serves again
    update_ivf_index(
        spark, e.where(F.col("vec_id") == victim), idx, epoch="u-re",
        dim=64, n_cells=16, centroids=trained,
    )
    assert victim in hits()

    # and compaction keeps it physically (old bug: tombstone applied
    # unscoped at compaction dropped the re-insert)
    compact_ivf_index(spark, idx)
    assert victim in hits()


def test_ivf_index_random_op_sequence_matches_fresh_index(
    spark, sf_dir, tmp_path
):
    """Stateful lifecycle fuzz for the vector lake (seeded): a random
    interleaving of append / update / delete / compact must keep
    probes identical to an index built FRESH over the model's live
    vector set after every op. Updates and appends deliberately
    RE-INSERT previously deleted ids: plain-delete tombstones are
    scoped to the epochs committed at issue time, so a later epoch's
    re-insert must serve (the round-11 advisor finding — NULL-scoped
    deletes suppressed re-inserts forever and compaction dropped them
    physically)."""
    import random

    from geosparql_etl_spark.operators.similarity import (
        delete_from_ivf_index,
        ivf_index_topk,
        lloyd_train,
        update_ivf_index,
        write_ivf_index,
    )
    from geosparql_etl_spark.streaming.ann import compact_ivf_index

    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    trained = lloyd_train(e, "embedding", dim=64, n_cells=16, rounds=5)
    vecs = {
        r.vec_id: r.embedding
        for r in e.select("vec_id", "embedding").collect()
    }
    ids = sorted(vecs)
    half = ids[: len(ids) // 2]
    rest = ids[len(ids) // 2:]
    idx = str(tmp_path / "ivf")
    model = {i: vecs[i] for i in half}
    write_ivf_index(
        e.where(F.col("vec_id").isin(half)), idx,
        dim=64, n_cells=16, centroids=trained, epoch="base",
    )
    probe = e.where(F.col("vec_id") < 3)

    def check(step):
        live = spark.createDataFrame(
            [(i, v) for i, v in model.items()],
            "vec_id long, embedding array<float>",
        )
        ref = str(tmp_path / f"ref{step}")
        write_ivf_index(
            live, ref, dim=64, n_cells=16, centroids=trained, epoch="base"
        )

        def answers(p):
            return [
                (r.query_id, r.neighbor_id, round(r.cosine_sim, 6))
                for r in ivf_index_topk(
                    spark, p, probe, k=5, dim=64, n_cells=16,
                    n_probe=6, centroids=trained,
                ).collect()
            ]

        assert answers(idx) == answers(ref)

    rng = random.Random(20260816)
    epoch_n = 0
    deleted: set = set()
    for step in range(7):
        op = rng.choice(["append", "update", "delete", "compact"])
        if op == "append" and rest:
            # re-append up to 4 previously deleted ids alongside the
            # fresh batch — they must come back (delete-then-reinsert)
            reins = sorted(deleted)[:4]
            batch, rest = rest[:60] + reins, rest[60:]
            for i in batch:
                model[i] = vecs[i]
            deleted.difference_update(reins)
            epoch_n += 1
            write_ivf_index(
                e.where(F.col("vec_id").isin(batch)), idx,
                dim=64, n_cells=16, centroids=trained,
                epoch=f"a{epoch_n}",
            )
        elif op == "update":
            victims = rng.sample(sorted(model), min(20, len(model)))
            # re-update up to 4 previously deleted ids — an upsert of
            # a deleted id is an insert and must serve
            reins = sorted(deleted)[:4]
            victims = sorted(set(victims) | set(reins))
            deleted.difference_update(reins)
            donor = {
                v: vecs[(v + 13) % len(ids)] for v in victims
            }
            upd = spark.createDataFrame(
                [(v, donor[v]) for v in victims],
                "vec_id long, embedding array<float>",
            )
            for v in victims:
                model[v] = donor[v]
            epoch_n += 1
            update_ivf_index(
                spark, upd, idx, epoch=f"u{epoch_n}",
                dim=64, n_cells=16, centroids=trained,
            )
        elif op == "delete":
            victims = rng.sample(sorted(model), min(12, len(model)))
            for v in victims:
                del model[v]
            deleted.update(victims)
            delete_from_ivf_index(spark, idx, victims)
        else:
            compact_ivf_index(spark, idx)
        check(step)


def test_compact_then_append_time_travel(spark, sf_dir, tmp_path):
    """Round-13 regression (advisor, high): compaction collapses the
    epoch ledger to ONE seeded entry (base at seq 0) — before the fix
    it dropped the ledger entirely and the un-ledgered fallback
    pushed base's inferred seq ABOVE the first post-compaction
    append, so as_of probes pinned at that append silently excluded
    the entire compacted corpus and delete issue stamps drifted
    upward per append."""
    from geosparql_etl_spark.operators.similarity import (
        _ann_epoch_seqs,
        delete_from_ivf_index,
        ivf_index_topk,
        lloyd_train,
        write_ivf_index,
    )
    from geosparql_etl_spark.streaming.ann import compact_ivf_index

    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    n = e.count()
    trained = lloyd_train(e, "embedding", dim=64, n_cells=8, rounds=3)
    idx = str(tmp_path / "ivf")
    half = e.where(F.col("vec_id") < n // 2)
    rest = e.where(F.col("vec_id") >= n // 2)
    write_ivf_index(half, idx, dim=64, n_cells=8, centroids=trained,
                    epoch="base")
    write_ivf_index(rest.where(F.col("vec_id") % 2 == 0), idx, dim=64,
                    n_cells=8, centroids=trained, epoch="a1")
    compact_ivf_index(spark, idx)
    assert _ann_epoch_seqs(idx) == {"base": 0}
    write_ivf_index(rest.where(F.col("vec_id") % 2 == 1), idx, dim=64,
                    n_cells=8, centroids=trained, epoch="a2")
    # base keeps seq 0 under the new append — the bug inferred base=2
    seqs = _ann_epoch_seqs(idx)
    assert seqs == {"base": 0, "a2": 1}

    probe = e.where(F.col("vec_id") < 3)

    def answers(path, as_of=None):
        return [
            (r.query_id, r.neighbor_id, round(r.cosine_sim, 6))
            for r in ivf_index_topk(
                spark, path, probe, k=5, dim=64, n_cells=8, n_probe=8,
                centroids=trained, as_of_seq=as_of,
            ).collect()
        ]

    # the pin at the compacted generation sees EXACTLY its corpus
    ref0 = str(tmp_path / "ref0")
    write_ivf_index(
        half.unionByName(rest.where(F.col("vec_id") % 2 == 0)), ref0,
        dim=64, n_cells=8, centroids=trained, epoch="base",
    )
    assert answers(idx, as_of=0) == answers(ref0)
    refall = str(tmp_path / "refall")
    write_ivf_index(e, refall, dim=64, n_cells=8, centroids=trained,
                    epoch="base")
    assert answers(idx, as_of=1) == answers(refall)
    # delete issue stamps are stable at the ledgered max (1), so a
    # pin at 0 pre-dates the delete and still serves the victim
    delete_from_ivf_index(spark, idx, [0])
    tomb = spark.read.option("mergeSchema", "true").parquet(
        f"{idx}/_tombstones"
    )
    assert {r.issued for r in tomb.select("issued").collect()} == {1}
    assert answers(idx, as_of=0) == answers(ref0)


def test_quantizer_guard_refuses_codebookless_write_on_pq(
    spark, sf_dir, tmp_path
):
    """Round-13 regression (advisor, medium): a plain-IVF epoch
    append onto a PQ index must fail the drift guard even though its
    (subset) meta keys all match — its rows would land without __pq
    and NULL approx_d2 sorts FIRST in the ADC shortlist."""
    import pytest

    from geosparql_etl_spark.operators.similarity import (
        lloyd_train,
        pq_train,
        write_ivf_index,
        write_ivf_pq_index,
    )

    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    trained = lloyd_train(e, "embedding", dim=64, n_cells=8, rounds=3)
    books = pq_train(e, "embedding", dim=64, m=16, k=16, rounds=3)
    idx = str(tmp_path / "pq")
    write_ivf_pq_index(
        e.where(F.col("vec_id") < 50), idx, dim=64, n_cells=8,
        centroids=trained, codebooks=books, epoch="base",
    )
    with pytest.raises(ValueError, match="PQ index"):
        write_ivf_index(
            e.where(F.col("vec_id") >= 50), idx, dim=64, n_cells=8,
            centroids=trained, epoch="a1",
        )


def test_retrain_swap_crash_recovery(spark, sf_dir, tmp_path):
    """Round-13 regression (advisor, low): maybe_retrain_ivf_index's
    generation swap now carries the compact_ivf_index recovery
    preamble — a crash between its two renames leaves only the
    ``.retrain.old`` copy, and the next call must restore it instead
    of failing on a missing index forever."""
    import os
    import shutil

    from geosparql_etl_spark.operators.similarity import (
        auto_n_cells,
        ivf_index_topk,
        lloyd_train,
        maybe_retrain_ivf_index,
        write_ivf_index,
    )

    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    # build at the auto size so the recovery calls are no-op retrains
    # (this test isolates the swap recovery, not the retrain itself)
    c = auto_n_cells(e.count())
    trained = lloyd_train(e, "embedding", dim=64, n_cells=c, rounds=3)
    idx = str(tmp_path / "ivf")
    write_ivf_index(e, idx, dim=64, n_cells=c, centroids=trained,
                    epoch="base")
    probe = e.where(F.col("vec_id") < 3)

    def answers():
        return [
            (r.query_id, r.neighbor_id, round(r.cosine_sim, 6))
            for r in ivf_index_topk(
                spark, idx, probe, k=5, dim=64, n_cells=c, n_probe=c,
                centroids=trained,
            ).collect()
        ]

    before = answers()
    # simulate the crash window: index moved aside, tmp vanished
    os.replace(idx, idx + ".retrain.old")
    n_cells, cents = maybe_retrain_ivf_index(
        spark, idx, current_n_cells=c, rounds=3
    )
    assert (n_cells, cents) == (c, None)
    assert os.path.exists(idx)
    assert not os.path.exists(idx + ".retrain.old")
    assert answers() == before
    # stale .old beside a live index (crash after commit) is swept
    shutil.copytree(idx, idx + ".retrain.old")
    maybe_retrain_ivf_index(spark, idx, current_n_cells=c, rounds=3)
    assert not os.path.exists(idx + ".retrain.old")


def test_update_tombstones_scope_committed_epochs_only(
    spark, sf_dir, tmp_path
):
    """Round-13 regression (advisor, low): update_ivf_index scopes
    its tombstones over COMMITTED epochs only — a concurrent writer's
    in-flight (no _SUCCESS) epoch that commits after the upsert must
    keep its rows, per the multi-writer 'an epoch that lands later
    survives' rule delete_from_ivf_index already follows."""
    import os

    from geosparql_etl_spark.operators.similarity import (
        lloyd_train,
        update_ivf_index,
        write_ivf_index,
    )

    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    trained = lloyd_train(e, "embedding", dim=64, n_cells=8, rounds=3)
    idx = str(tmp_path / "ivf")
    write_ivf_index(e.where(F.col("vec_id") < 50), idx, dim=64,
                    n_cells=8, centroids=trained, epoch="base")
    # another writer's in-flight epoch: committed dir minus _SUCCESS
    write_ivf_index(
        e.where((F.col("vec_id") >= 50) & (F.col("vec_id") < 80)), idx,
        dim=64, n_cells=8, centroids=trained, epoch="zz",
    )
    os.remove(os.path.join(idx, "epoch=zz", "_SUCCESS"))

    upd = spark.createDataFrame(
        [(60, [float(i % 7) for i in range(64)])],
        "vec_id long, embedding array<float>",
    )
    update_ivf_index(spark, upd, idx, epoch="u1", dim=64, n_cells=8,
                     centroids=trained)
    tomb = spark.read.option("mergeSchema", "true").parquet(
        f"{idx}/_tombstones"
    )
    scoped = {r.epoch for r in tomb.select("epoch").collect()}
    assert scoped == {"base"}


def test_uncommitted_epoch_invisible_everywhere(spark, sf_dir, tmp_path):
    """Round-13 fix: the ANN lake now matches the text lake's rule
    that EVERY read is commit-gated — an epoch directory without its
    _SUCCESS marker (in-flight concurrent writer, or a crashed torn
    write) must not serve in latest probes (plain or PQ), must not be
    counted/trained by maybe_retrain, and must not be baked into a
    compacted base (compaction garbage-collects it instead)."""
    import os
    import shutil

    from geosparql_etl_spark.operators.similarity import (
        ivf_index_topk,
        lloyd_train,
        pq_train,
        write_ivf_index,
        write_ivf_pq_index,
        ivf_index_pq_topk,
    )
    from geosparql_etl_spark.streaming.ann import compact_ivf_index

    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    trained = lloyd_train(e, "embedding", dim=64, n_cells=8, rounds=3)
    probe = e.where(F.col("vec_id") < 3)
    half = e.where(F.col("vec_id") < 200)

    idx = str(tmp_path / "ivf")
    write_ivf_index(half, idx, dim=64, n_cells=8, centroids=trained,
                    epoch="base")
    ref = str(tmp_path / "ref")
    write_ivf_index(half, ref, dim=64, n_cells=8, centroids=trained,
                    epoch="base")

    def answers(path):
        return [
            (r.query_id, r.neighbor_id, round(r.cosine_sim, 6))
            for r in ivf_index_topk(
                spark, path, probe, k=5, dim=64, n_cells=8, n_probe=8,
                centroids=trained,
            ).collect()
        ]

    # torn epoch: full data dir, _SUCCESS removed
    write_ivf_index(e.where(F.col("vec_id") >= 200), idx, dim=64,
                    n_cells=8, centroids=trained, epoch="zz")
    os.remove(os.path.join(idx, "epoch=zz", "_SUCCESS"))

    assert answers(idx) == answers(ref)
    # compaction garbage-collects the torn epoch instead of baking it
    compact_ivf_index(spark, idx)
    assert not os.path.exists(os.path.join(idx, "epoch=zz"))
    assert answers(idx) == answers(ref)

    # PQ probe path: same rule on both its scans
    books = pq_train(e, "embedding", dim=64, m=16, k=16, rounds=3)
    pq = str(tmp_path / "pq")
    pq_ref = str(tmp_path / "pqref")
    for p in (pq, pq_ref):
        write_ivf_pq_index(half, p, dim=64, n_cells=8,
                           centroids=trained, codebooks=books,
                           epoch="base")
    write_ivf_pq_index(
        e.where(F.col("vec_id") >= 200), pq, dim=64, n_cells=8,
        centroids=trained, codebooks=books, epoch="zz",
    )
    os.remove(os.path.join(pq, "epoch=zz", "_SUCCESS"))

    def pq_answers(path):
        return [
            (r.query_id, r.neighbor_id, round(r.cosine_sim, 6))
            for r in ivf_index_pq_topk(
                spark, path, probe, kq=5, n_probe=8,
            ).collect()
        ]

    assert pq_answers(pq) == pq_answers(pq_ref)
    shutil.rmtree(idx, ignore_errors=True)


def test_empty_scope_update_replay_marker(spark, sf_dir, tmp_path):
    """Round-13 review fix: an upsert whose tombstone scope is EMPTY
    (no other epoch committed at run time) still persists its
    src_epoch replay marker — a replay after another writer commits
    must reuse the (empty) persisted scope, never recompute one that
    would tombstone the later-landing epoch."""
    import os

    from geosparql_etl_spark.operators.similarity import (
        ivf_index_topk,
        lloyd_train,
        update_ivf_index,
        write_ivf_index,
    )

    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    trained = lloyd_train(e, "embedding", dim=64, n_cells=8, rounds=3)
    vecs = {r.vec_id: r.embedding for r in e.where(F.col("vec_id") < 5).collect()}
    idx = str(tmp_path / "ivf")
    # writer B's base build is IN FLIGHT: data dir exists, no _SUCCESS
    write_ivf_index(e.where(F.col("vec_id") < 100), idx, dim=64,
                    n_cells=8, centroids=trained, epoch="base")
    os.remove(os.path.join(idx, "epoch=base", "_SUCCESS"))

    upd = spark.createDataFrame(
        [(0, vecs[1])], "vec_id long, embedding array<float>"
    )
    update_ivf_index(spark, upd, idx, epoch="u1", dim=64, n_cells=8,
                     centroids=trained)
    # the empty scope persisted as a no-op marker row
    tomb = spark.read.option("mergeSchema", "true").parquet(
        f"{idx}/_tombstones"
    )
    rows = tomb.collect()
    assert {r.src_epoch for r in rows} == {"u1"}
    assert {r.epoch for r in rows} == {"__none__"}
    # writer B commits AFTER the upsert; the u1 REPLAY must not
    # tombstone it
    open(os.path.join(idx, "epoch=base", "_SUCCESS"), "w").close()
    update_ivf_index(spark, upd, idx, epoch="u1", dim=64, n_cells=8,
                     centroids=trained)
    tomb2 = spark.read.option("mergeSchema", "true").parquet(
        f"{idx}/_tombstones"
    )
    assert {r.epoch for r in tomb2.collect()} == {"__none__"}
    # id 0 serves BOTH versions' reconciliation: base's row survives
    # (it landed after the upsert's scope) alongside u1's re-insert —
    # per the multi-writer rule the later-committed epoch's rows live
    got = {
        r.neighbor_id
        for r in ivf_index_topk(
            spark, idx, e.where(F.col("vec_id") == 3), k=100, dim=64,
            n_cells=8, n_probe=8, centroids=trained,
        ).collect()
    }
    assert 0 in got


def test_fully_tombstoned_compaction_commits_base(spark, sf_dir, tmp_path):
    """Round-13 review fix: the fully-tombstoned compaction's
    explicit-cell write left Spark's _SUCCESS one level too deep, so
    the commit gate classified the (legal, empty) compacted base as a
    torn epoch and fsck flagged a healthy index."""
    import os

    from geosparql_etl_spark.operators.similarity import (
        _ann_epoch_seqs,
        _committed_epochs,
        delete_from_ivf_index,
        fsck_ivf_index,
        ivf_index_topk,
        lloyd_train,
        write_ivf_index,
    )
    from geosparql_etl_spark.streaming.ann import compact_ivf_index

    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    trained = lloyd_train(e, "embedding", dim=64, n_cells=8, rounds=3)
    idx = str(tmp_path / "ivf")
    sub = e.where(F.col("vec_id") < 40)
    write_ivf_index(sub, idx, dim=64, n_cells=8, centroids=trained,
                    epoch="base")
    delete_from_ivf_index(spark, idx, sub.select("vec_id"))
    compact_ivf_index(spark, idx)
    assert _committed_epochs(idx) == ["base"]
    assert _ann_epoch_seqs(idx) == {"base": 0}
    assert os.path.exists(os.path.join(idx, "epoch=base", "_SUCCESS"))
    findings = [
        f for f in fsck_ivf_index(spark, idx)
        if f["check"] in ("uncommitted_epoch", "ledger_dangling")
    ]
    assert findings == []
    # the empty committed index serves empty (not an error)
    got = ivf_index_topk(
        spark, idx, e.where(F.col("vec_id") < 2), k=5, dim=64,
        n_cells=8, n_probe=8, centroids=trained,
    ).collect()
    assert got == []
