from distributed_system_mapreduce_spark.streaming.jobs import (  # noqa: F401
    dedup_stream,
    enrich_with_customers,
    props_windowed_stats,
    read_events_stream,
    run_stream_to_memory,
    session_window_counts,
    sessionize_closed_stream,
    sessionize_stream,
    stream_to_filestore,
    topk_per_window,
    windowed_counts,
    windowed_user_counts,
)
