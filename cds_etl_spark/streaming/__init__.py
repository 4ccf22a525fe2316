from cds_etl_spark.streaming.ops import (  # noqa: F401
    event_stream,
    materialize_event_source,
    running_totals_stateful,
    session_counts,
    stream_dedup,
    windowed_counts,
)
