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


def test_round11_correctness_window_is_stable():
    keys = list(entry.queries())
    # the r11 window: the nine never-stamped round-10 additions lead
    # (sim22..d19 at 1-9), then the four remaining r04-stamped rows
    # (t06/t07/t08/t10 at 10-13), then the r05-stamped block fills
    # 14-50: j13 head, s05_attribution_join at 50. Round-11 additions
    # belong BELOW position 50, contiguously first (see the registry
    # comment for the r12 rotation).
    assert keys[0:9] == [
        "sim22_shippable_ann",
        "warc03_crawl_encodings",
        "llm24_crawl_training_pipeline",
        "sim23_persisted_ivfpq_probe",
        "sp42_values_undef",
        "mm08_shot_keyframes",
        "sim24_filtered_persisted_ann",
        "d18_semantic_dedup",
        "d19_incremental_semantic_dedup",
    ]
    assert keys[9] == "t06_conditional_insert"
    assert keys[13] == "j13_scd2_intervals"
    assert keys[49] == "s05_attribution_join"
    # below the window: the round-11 additions sit contiguously first
    # (first wave then second wave — never stamped, so they lead the
    # r12 rotation), the r05 remainder follows, r10-stamped rows last
    assert keys[50] == "sp43_optional_rejoin"
    r11_adds = {
        "sp43_optional_rejoin", "llm25_semantic_training_funnel",
        "d20_skew_capped_neardup", "g20_dense_cell_cap",
        "sim25_ann_deletes", "j15_bucketed_colocated_join",
        "sim26_persisted_bm25", "s17_streaming_text_index",
        "er04_incremental_resolution", "sim27_hybrid_persisted_serving",
        "sim28_bm25_deletes", "llm26_snapshot_diff",
        "sim29_bm25_updates", "s18_streaming_text_upserts",
        "sim30_ann_updates", "s19_streaming_ann_upserts",
        "sim31_bm25_time_travel", "w06_gap_fill",
        "sim32_phrase_search", "sim33_proximity_search",
    }
    assert set(keys[50:50 + len(r11_adds)]) == r11_adds
    assert keys[50 + len(r11_adds)] == "s06_stream_dedup_batch"
    assert keys[-1] == "t05_urn_rewrite"
    assert len(keys) == len(set(keys))


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
