"""Composite plan shapes (SURVEY.md §2): argmax, batching window, ledger
anti-join, enrichment join, deterministic rendering, dedup family,
similarity search, multimodal plumbing. All are DataFrame->DataFrame or
Column-level combinators — no custom Catalyst rules."""
