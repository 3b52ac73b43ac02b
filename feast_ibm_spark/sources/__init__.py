from .data_source import SparkDataSource
from .reader import read_parquet, load_table

__all__ = ["SparkDataSource", "read_parquet", "load_table"]
