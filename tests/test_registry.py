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


def test_round6_correctness_window_is_stable():
    keys = list(entry.queries())
    # the 30 round-5 additions that never had a driver stamp lead, then
    # the 20 oldest r03-stamped rows close the window — round-6
    # additions belong BELOW position 50, contiguously first (see the
    # registry comment for the r07 rotation)
    assert keys[:2] == ["q04_priority_exists", "q07_nation_volume"]
    assert keys[29] == "er01_entity_canonicalize"
    assert keys[30] == "sim07_vector_stats"
    assert keys[49] == "d04_ngram_jaccard"
    assert len(keys) == len(set(keys))


def test_queries_are_callable_with_two_args():
    import inspect

    for name, fn in entry.queries().items():
        params = [
            p for p in inspect.signature(fn).parameters.values()
            if p.default is inspect.Parameter.empty
        ]
        assert len(params) == 2, f"{name} must take (spark, sf_dir)"
