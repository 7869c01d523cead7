"""Incremental SPARQL view maintenance (streaming/sparql_ivm.py):
semi-naive deltas must equal full recomputation after every batch,
re-sent triples must not re-derive, cross-batch derivations must
appear, the non-monotone fragment must be rejected, and the streaming
wire-up must survive a checkpointed restart."""

import pytest
from pyspark.sql import functions as F

from geosparql_etl_spark.sparql import TripleStore, sparql_select
from geosparql_etl_spark.streaming.sparql_ivm import (
    IncrementalConstructView,
    run_incremental_construct,
)

PFX = "PREFIX ex: <urn:ex:> "
Q_LOCATED = (
    PFX + "CONSTRUCT { ?p ex:locatedIn ?cn } WHERE { "
    "?p ex:city ?c . ?c ex:name ?cn }"
)

T = [
    ("urn:p:1", "urn:ex:city", "urn:c:1"),
    ("urn:c:1", "urn:ex:name", "london"),
    ("urn:p:2", "urn:ex:city", "urn:c:2"),
    ("urn:p:3", "urn:ex:city", "urn:c:1"),
    ("urn:c:2", "urn:ex:name", "york"),
    ("urn:p:4", "urn:ex:city", "urn:c:2"),
]


def _df(spark, rows):
    return spark.createDataFrame(rows, "s string, p string, o string")


def _set(df):
    return sorted((r.s, r.p, r.o) for r in df.collect())


class TestSemiNaive:
    def test_matches_full_recompute_after_every_batch(self, spark):
        # batches chosen so derivations NEED cross-batch joins: p:1's
        # city link lands a batch before london's name; p:3 joins a
        # name from two batches earlier
        batches = [T[0:1], T[1:3], T[3:5], T[5:6]]
        view = IncrementalConstructView(Q_LOCATED)
        seen: list = []
        for batch in batches:
            seen += batch
            view.update(_df(spark, batch))
            want = sparql_select(TripleStore(_df(spark, seen)), Q_LOCATED)
            assert _set(view.snapshot()) == _set(want)

    def test_resent_triples_do_not_rederive(self, spark):
        view = IncrementalConstructView(Q_LOCATED)
        first = view.update(_df(spark, T))
        assert len(_set(first)) == 4
        again = view.update(_df(spark, T))  # full replay
        assert _set(again) == []
        assert len(_set(view.snapshot())) == 4

    def test_delta_is_only_the_new_derivations(self, spark):
        view = IncrementalConstructView(Q_LOCATED)
        view.update(_df(spark, T[:2]))  # p:1 -> london derivable
        delta = view.update(_df(spark, T[2:]))
        # new derivations: p:3->london, p:2->york, p:4->york (NOT p:1)
        assert _set(delta) == [
            ("urn:p:2", "urn:ex:locatedIn", "york"),
            ("urn:p:3", "urn:ex:locatedIn", "london"),
            ("urn:p:4", "urn:ex:locatedIn", "york"),
        ]

    def test_static_store_seeds_state(self, spark):
        # city names are STATIC reference data; only links stream
        static = TripleStore(_df(spark, [T[1], T[4]]))
        view = IncrementalConstructView(Q_LOCATED, static_store=static)
        delta = view.update(_df(spark, [T[0]]))
        assert _set(delta) == [("urn:p:1", "urn:ex:locatedIn", "london")]

    def test_filter_applies(self, spark):
        q = (
            PFX + "CONSTRUCT { ?p ex:locatedIn ?cn } WHERE { "
            '?p ex:city ?c . ?c ex:name ?cn FILTER(?cn != "york") }'
        )
        view = IncrementalConstructView(q)
        view.update(_df(spark, T))
        assert all(o == "london" for _, _, o in _set(view.snapshot()))

    def test_non_monotone_rejected(self):
        with pytest.raises(ValueError, match="monotone"):
            IncrementalConstructView(
                PFX + "CONSTRUCT { ?p ex:x ?c } WHERE { ?p ex:city ?c "
                "OPTIONAL { ?c ex:name ?n } }"
            )


class TestStreamed:
    def test_stream_then_checkpointed_restart(self, spark, tmp_path):
        land = str(tmp_path / "land")
        out = str(tmp_path / "view")
        ck = str(tmp_path / "ck")

        _df(spark, T[:3]).coalesce(1).write.mode("append").parquet(land)
        stream = (
            spark.readStream.schema("s string, p string, o string")
            .option("maxFilesPerTrigger", 1)
            .parquet(land)
        )
        q = run_incremental_construct(spark, stream, Q_LOCATED, out, ck)
        assert q.awaitTermination(120)

        # restart with new files: checkpoint skips the consumed ones,
        # bootstrap re-derives state from them
        _df(spark, T[3:]).coalesce(1).write.mode("append").parquet(land)
        stream2 = (
            spark.readStream.schema("s string, p string, o string")
            .option("maxFilesPerTrigger", 1)
            .parquet(land)
        )
        q2 = run_incremental_construct(
            spark,
            stream2,
            Q_LOCATED,
            out,
            ck,
            bootstrap_triples=_df(spark, T[:3]),
        )
        assert q2.awaitTermination(120)

        got = spark.read.parquet(out)
        want = sparql_select(TripleStore(_df(spark, T)), Q_LOCATED)
        assert _set(got) == _set(want)
        # append-only materialization stayed duplicate-free
        assert got.count() == got.dropDuplicates().count()


def test_property_path_rejected(spark):
    """Path predicates delta within one batch only — cross-batch hops
    would be silently lost, so the constructor must refuse them."""
    with pytest.raises(ValueError, match="path"):
        IncrementalConstructView(
            PFX + "CONSTRUCT { ?p ex:loc ?cn } WHERE { ?p ex:city/ex:name ?cn }"
        )


from hypothesis import HealthCheck, given, settings, strategies as st


@given(cuts=st.lists(st.integers(min_value=1, max_value=5), min_size=0, max_size=3))
@settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_ivm_invariant_under_any_batching(spark, cuts):
    """Semi-naive maintenance must be independent of HOW the triple
    stream is batched: for any cut points, the final view equals the
    full recomputation (the property the fixed-batch tests sample)."""
    bounds = sorted({0, len(T), *[min(c, len(T)) for c in cuts]})
    batches = [
        T[a:b] for a, b in zip(bounds, bounds[1:]) if T[a:b]
    ] or [T]
    view = IncrementalConstructView(Q_LOCATED)
    for batch in batches:
        view.update(_df(spark, batch))
    want = sparql_select(TripleStore(_df(spark, T)), Q_LOCATED)
    assert _set(view.snapshot()) == _set(want)


def test_restart_with_committed_append_unacked_epoch_no_duplicates(
    spark, tmp_path
):
    """Round-6 advice: crash AFTER a batch's parquet append committed
    but BEFORE its epoch checkpoint advanced. On restart the replayed
    epoch's input is missing from bootstrap_triples (only acknowledged
    epochs are), so the rebuilt view lacks its derivations — the
    first-post-restart dedup against out_dir must keep the append
    idempotent anyway."""
    land = str(tmp_path / "land")
    out = str(tmp_path / "out")
    ck = str(tmp_path / "ck")

    # run 1: consume T[:3] (acknowledged) then T[3:5] whose append
    # committed but whose checkpoint ack we simulate as LOST by
    # restarting from a checkpoint that only covers the first file
    _df(spark, T[:3]).coalesce(1).write.mode("append").parquet(land)
    stream = (
        spark.readStream.schema("s string, p string, o string")
        .option("maxFilesPerTrigger", 1)
        .parquet(land)
    )
    q = run_incremental_construct(spark, stream, Q_LOCATED, out, ck)
    assert q.awaitTermination(120)

    # simulate the crashed epoch: its OUTPUT is already in out_dir …
    view = IncrementalConstructView(Q_LOCATED)
    view.update(_df(spark, T[:3]))
    inflight = view.update(_df(spark, T[3:5]))
    assert inflight.count() > 0
    inflight.write.mode("append").parquet(out)
    # … and its INPUT lands again for the restarted stream to replay
    _df(spark, T[3:5]).coalesce(1).write.mode("append").parquet(land)

    stream2 = (
        spark.readStream.schema("s string, p string, o string")
        .option("maxFilesPerTrigger", 1)
        .parquet(land)
    )
    q2 = run_incremental_construct(
        spark,
        stream2,
        Q_LOCATED,
        out,
        ck,
        bootstrap_triples=_df(spark, T[:3]),  # acknowledged epochs ONLY
    )
    assert q2.awaitTermination(120)

    got = spark.read.parquet(out)
    rows = [(r.s, r.p, r.o) for r in got.collect()]
    assert len(rows) == len(set(rows)), "restart re-appended duplicates"
    want = sparql_select(TripleStore(_df(spark, T[:5])), Q_LOCATED)
    assert sorted(set(rows)) == _set(want)


def test_bind_in_incremental_view_matches_recompute(spark):
    """Round 6: BIND joins the monotone fragment — a computed binding
    feeds the CONSTRUCT template and the incremental view still equals
    the full recompute after every batch."""
    q = (
        PFX + "CONSTRUCT { ?p ex:tag ?t } WHERE { "
        "?p ex:city ?c . ?c ex:name ?cn "
        'BIND(CONCAT("in-", UCASE(?cn)) AS ?t) }'
    )
    batches = [T[0:1], T[1:3], T[3:5], T[5:6]]
    view = IncrementalConstructView(q)
    seen: list = []
    for batch in batches:
        seen += batch
        view.update(_df(spark, batch))
        want = sparql_select(TripleStore(_df(spark, seen)), q)
        assert _set(view.snapshot()) == _set(want)
    assert ("urn:p:1", "urn:ex:tag", "in-LONDON") in _set(view.snapshot())


def test_nonmonotone_bind_free_fragment_still_rejected(spark):
    import pytest as _pytest

    with _pytest.raises(ValueError, match="monotone"):
        IncrementalConstructView(
            PFX + "CONSTRUCT { ?p ex:x ?c } WHERE { "
            "?p ex:city ?c OPTIONAL { ?c ex:name ?n } }"
        )


class TestRestartProbe:
    """_existing_view_output: only path-not-found maps to 'no prior
    output'; any other read failure must RAISE (round-6 ADVICE — a
    swallowed corrupt-read would silently reopen the restart-duplicate
    window)."""

    def test_missing_dir_is_none(self, spark, tmp_path):
        from geosparql_etl_spark.streaming.sparql_ivm import (
            _existing_view_output,
        )

        assert _existing_view_output(spark, str(tmp_path / "never")) is None

    def test_prior_output_is_returned(self, spark, tmp_path):
        from geosparql_etl_spark.streaming.sparql_ivm import (
            _existing_view_output,
        )

        out = str(tmp_path / "view")
        spark.createDataFrame(
            [("a", "b", "c")], "s string, p string, o string"
        ).write.parquet(out)
        got = _existing_view_output(spark, out)
        assert got is not None and got.count() == 1

    def test_corrupt_output_raises(self, spark, tmp_path):
        import pytest as _pytest

        from geosparql_etl_spark.streaming.sparql_ivm import (
            _existing_view_output,
        )

        out = tmp_path / "view"
        out.mkdir()
        (out / "part-00000.parquet").write_bytes(b"this is not parquet")
        with _pytest.raises(Exception):
            df = _existing_view_output(spark, str(out))
            # schema inference may be lazy; force the read if it got here
            if df is not None:
                df.collect()
