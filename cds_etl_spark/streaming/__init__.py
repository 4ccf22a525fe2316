from cds_etl_spark.streaming.ops import (  # noqa: F401
    enrich_stream,
    event_stream,
    foreach_batch_partitioned_sink,
    materialize_event_source,
    running_totals_stateful,
    session_counts,
    stream_dedup,
    windowed_counts,
)
