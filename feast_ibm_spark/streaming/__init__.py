from .latest import streaming_latest_per_key, streaming_window_counts, stream_parquet_source
from .stateful import streaming_first_seen, streaming_sessionize
from .enrich import enrich_stream
from .pit import streaming_pit_join
from .cdc import merge_batch_into_snapshot, streaming_cdc_merge
from .run import (drain_available_now, drain_available_now_to_files,
                  rocksdb_state_store)

__all__ = [
    "streaming_latest_per_key",
    "streaming_window_counts",
    "stream_parquet_source",
    "streaming_first_seen",
    "streaming_sessionize",
    "enrich_stream",
    "streaming_pit_join",
    "merge_batch_into_snapshot",
    "streaming_cdc_merge",
    "drain_available_now",
    "drain_available_now_to_files",
    "rocksdb_state_store",
]
