"""geosparql_etl_spark — a PySpark-native analytics engine with the query
and data-processing capabilities of the reference digital-pathology ETL
toolkit (tdiprima/geosparql-etl), re-expressed Spark-first.

Layout:
    session     SparkSession factory (AQE on, UTC, tuned shuffle partitions)
    schemas     explicit StructTypes for every input shape (no inference)
    functions   scalar column expressions: geometry, hashing, text, textstats
    operators   composite plan shapes: argmax, batching window, ledger
                anti-join, dedup (exact/minhash/simhash), similarity search,
                enrichment join, deterministic document rendering
    sources     readers: GeoJSON, segmentation CSV trees, TTL(.gz), sidecars
    sinks       partitioned gzip text sink, versioned rewrite
    pipelines   the reference's three ETL pipelines + hash-update, as
                declarative DataFrame chains
    streaming   Structured Streaming upgrades of the reference's
                cursor-batching/checkpoint/progress behaviors

Everything is built on the public PySpark 4.x DataFrame API; there are no
custom Catalyst rules — the engine's value is plan shape + expression
library (see SURVEY.md §4).
"""

__version__ = "0.1.0"
