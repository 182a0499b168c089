from .pipeline import (
    hourly_rollup_aggregate,
    incremental_hourly_rollup,
    merge_rollup,
    run_file_stream_pipeline,
)

__all__ = [
    "hourly_rollup_aggregate",
    "incremental_hourly_rollup",
    "merge_rollup",
    "run_file_stream_pipeline",
]
