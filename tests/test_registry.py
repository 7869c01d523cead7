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


def test_round10_correctness_window_is_stable():
    keys = list(entry.queries())
    # the r10 window: the four never-stamped round-9 late adds lead
    # (s16/sim20/sim21/warc02 at 1-4), then the r04-stamped block
    # (oldest attestation, heavily refactored since r04) fills 5-50:
    # j06 head, t05_urn_rewrite at 50. Round-10 additions belong BELOW
    # position 50, contiguously first (see the registry comment for
    # the r11 rotation).
    assert keys[0:4] == [
        "s16_crawl_ingest",
        "sim20_pq_training_gain",
        "sim21_incremental_index_probe",
        "warc02_html_extraction",
    ]
    assert keys[4] == "j06_anti_join"
    assert keys[49] == "t05_urn_rewrite"
    # below the window: new round-10 additions, then the four remaining
    # r04-stamped rows head the post-window order
    assert "t06_conditional_insert" in keys[50:60]
    assert keys[-1] == "sim19_probe_sweep"
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
