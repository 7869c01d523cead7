"""Scalar function library: every reference scalar (SURVEY.md §2.7)
as a native Spark Column expression — zero Python serialization in the
hot path, fully Catalyst-optimizable and whole-stage-codegen'd."""

from geosparql_etl_spark.functions import geometry, hashing, text, textstats

__all__ = ["geometry", "hashing", "text", "textstats"]
