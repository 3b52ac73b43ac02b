from .data_source import SparkDataSource
from .reader import read_parquet, load_table
from .catalog import register_tables
from .bucketed import write_bucketed, bucketed_join_ready

__all__ = [
    "SparkDataSource",
    "read_parquet",
    "load_table",
    "register_tables",
    "write_bucketed",
    "bucketed_join_ready",
]
