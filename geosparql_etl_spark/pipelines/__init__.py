"""The reference's pipelines as declarative DataFrame chains:
json_etl (GeoJSON -> TTL), segmentation_etl (patch CSV -> TTL.gz),
mongo_etl (analysis x marks -> batched TTL.gz), hash_update (TTL rewrite).
Each is a pure DataFrame -> DataFrame transform plus a thin sink call, so
tests pin inputs/timestamps and compare rendered documents exactly."""
