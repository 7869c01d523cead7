from geosparql_etl_spark.streaming.events import (
    events_file_stream,
    session_windows,
    sliding_counts,
    tumbling_counts,
)
from geosparql_etl_spark.streaming.sink import (
    run_batched_doc_stream,
    stream_to_ttl_batches,
)
from geosparql_etl_spark.streaming.sparql_ivm import (
    IncrementalConstructView,
    run_incremental_construct,
)

__all__ = [
    "events_file_stream",
    "tumbling_counts",
    "sliding_counts",
    "session_windows",
    "stream_to_ttl_batches",
    "run_batched_doc_stream",
    "IncrementalConstructView",
    "run_incremental_construct",
]
