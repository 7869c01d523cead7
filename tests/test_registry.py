"""Registry contract guards: the driver's correctness gate reads the
FIRST 50 entries of queries() each round, so registry ORDER is part of
the round plan — a query added above the window silently evicts a row
the rotation promised to the driver. These tests make that mistake loud.
"""

from __future__ import annotations

import __spark_entry__ as entry


def test_every_query_has_an_oracle_and_vice_versa():
    qs, oracles = entry.queries(), entry.oracle_sql()
    assert set(oracles) <= set(qs), set(oracles) - set(qs)
    missing = set(qs) - set(oracles)
    # h02 degrades to rows-only when its hash-literal oracle cannot be
    # built (foreign env); nothing else may ship oracle-less
    assert missing <= {"h02_file_hash"}, missing


def test_round13_correctness_window_is_stable():
    keys = list(entry.queries())
    # the r13 window is the explicit _WINDOW_R13 list: the five
    # never-driver-stamped round-12 additions lead, then the round-13
    # additions, then the 27 r6-stamped queries (oldest surviving
    # attestations), then the r8-stamped head fills to 50. queries()
    # moves the list to the front; everything else keeps registry
    # order behind it.
    assert len(entry._WINDOW_R13) == 50
    assert keys[:50] == entry._WINDOW_R13
    assert keys[:5] == [
        "sp44_erroring_bind",
        "sim34_autosized_retrain",
        "sim35_ann_time_travel",
        "s20_concurrent_upsert_streams",
        "sim36_pq_updates",
    ]
    r6_block = {
        "llm18_bpe_merges", "llm19_leakage_free_split",
        "d13_triangle_count", "d14_clustering_coeff",
        "g17_distance_join", "dq04_fk_audit", "txt17_readability",
        "sim07_vector_stats", "llm05_decontaminate",
        "s01_tumbling_window", "s02_sliding_window",
        "s03_sessionization", "s08_gap_fill_resample",
        "mm01_media_features", "mm02_frame_sampling",
        "mm03_audio_features", "h02_file_hash",
        "llm06_incremental_dedup", "llm07_stratified_topk_sample",
        "llm08_chunking", "w05_window_frames", "a13_grouping_sets",
        "g16_point_in_polygon", "d01_dedup_exact", "d02_fingerprint",
        "d03_minhash_signature", "d04_ngram_jaccard",
    }
    assert r6_block <= set(keys[:50])
    assert keys[49] == "txt18_lexical_diversity"
    assert len(keys) == len(set(keys))
    assert len(keys) == len(entry._QUERIES)


def test_module_imports_and_registry_resolves():
    # the round-7 failure class: a registry key naming an undefined
    # function voids the whole round (NameError at import). Importing
    # `entry` above already proves the module loads; this pins that
    # every registry value is a real callable and every oracle key
    # resolves, so a dangling name can never be committed silently.
    qs = entry.queries()
    assert all(callable(v) for v in qs.values())
    assert set(entry.oracle_sql()) <= set(qs)


def test_queries_are_callable_with_two_args():
    import inspect

    for name, fn in entry.queries().items():
        params = [
            p for p in inspect.signature(fn).parameters.values()
            if p.default is inspect.Parameter.empty
        ]
        assert len(params) == 2, f"{name} must take (spark, sf_dir)"


def test_events_reads_are_ts_normalized():
    # events.parquet's ts physical encoding varies by testdata
    # generation (TIMESTAMP(NANOS) / NTZ-micros / TIMESTAMP). Every
    # registry query must read it through _events(), which normalizes
    # all three; a raw _t(spark, sf_dir, "events") read breaks the
    # moment the driver regenerates testdata with a different encoding.
    # The single allowed raw read is the one inside _events() itself.
    src = open(entry.__file__).read()
    raw_reads = src.count('_t(spark, sf_dir, "events")')
    assert raw_reads == 1, (
        f"{raw_reads} raw events reads; route them through _events()"
    )
