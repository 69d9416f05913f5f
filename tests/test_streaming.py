"""Structured Streaming jobs drained with availableNow and compared
to their batch twins from operators/relational.py."""

from distributed_system_mapreduce_spark.operators.relational import (
    events_daily_rollup,
    events_sessionize,
)
from distributed_system_mapreduce_spark.streaming import (
    read_events_stream,
    run_stream_to_memory,
    sessionize_stream,
    windowed_counts,
)
from tests.conftest import SF_DIR


def test_windowed_counts_match_batch_rollup(spark):
    stream = read_events_stream(spark, SF_DIR)
    assert stream.isStreaming
    q = run_stream_to_memory(windowed_counts(stream), "wc_stream")
    try:
        got = {
            (r["day"].date(), r["event_type"]): (r["n_events"],
                                                 float(r["sum_value"]))
            for r in spark.table("wc_stream").collect()
        }
        want = {
            (r["day"], r["event_type"]): (r["n_events"],
                                          float(r["sum_value"]))
            for r in events_daily_rollup(spark, SF_DIR).collect()
        }
        assert got == want
    finally:
        q.stop()


def test_stateful_sessionizer_matches_batch(spark):
    stream = read_events_stream(spark, SF_DIR)
    q = run_stream_to_memory(
        sessionize_stream(stream), "sess_stream", output_mode="update")
    try:
        got = {
            r["user_id"]: (r["n_sessions"], r["n_events"])
            for r in spark.table("sess_stream").collect()
        }
        want = {
            r["user_id"]: (r["n_sessions"], r["n_events"])
            for r in events_sessionize(spark, SF_DIR).collect()
        }
        assert got == want
    finally:
        q.stop()
