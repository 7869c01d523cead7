"""Readers (S1-S11, SURVEY.md §2.1): GeoJSON directories, segmentation
CSV trees with path-derived metadata, TTL(.gz) text, JSON sidecars,
binary files. All explicit-schema (no inference in production paths)."""
