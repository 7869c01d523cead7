"""Shared substrate for the persisted index lakes (round 13).

`commit.py` carries the commit/ledger/tombstone/swap mechanics that the
BM25 text lake (`operators/retrieval.py`) and the IVF vector lake
(`operators/similarity.py` + `streaming/ann.py`) both build on. The two
lakes keep their own data layouts and serving paths; what is shared is
every piece that must behave IDENTICALLY for the multi-writer and
crash-recovery stories to hold on both sides.
"""
