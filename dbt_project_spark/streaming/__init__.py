from dbt_project_spark.streaming.pipeline import (
    join_metric_streams,
    kafka_json_stream,
    run_file_stream_pipeline,
    split_event_streams,
    synthetic_rate_stream,
)

__all__ = [
    "join_metric_streams",
    "kafka_json_stream",
    "run_file_stream_pipeline",
    "split_event_streams",
    "synthetic_rate_stream",
]
