from .latest import streaming_latest_per_key, streaming_window_counts, stream_parquet_source

__all__ = [
    "streaming_latest_per_key",
    "streaming_window_counts",
    "stream_parquet_source",
]
