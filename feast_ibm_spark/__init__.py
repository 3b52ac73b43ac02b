"""feast_ibm_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of the IBM/feast-ibm offline feature store,
re-expressed Spark-first (DataFrame/SQL plans on an in-process
SparkSession instead of SQL text shipped to a remote serverless service).

Public surface mirrors the reference's five exported names
(reference ``ibm_data_engine/__init__.py:17-23``) with Spark equivalents,
plus the north-star extension operators (dedup, similarity search, text
analysis, multimodal).
"""

from .session import get_spark, configure_runtime
from .types import spark_type_to_feast_value_type, source_datatype_to_feast_value_type
from .sources import SparkDataSource
from .retrieval import SparkRetrievalJob, RetrievalMetadata
from .operators import (
    time_range_scan,
    latest_per_key,
    point_in_time_join,
    FeatureViewSpec,
)
from .store import SparkOfflineStore
from .feast_adapter import SparkFeastOfflineStore

__all__ = [
    "SparkFeastOfflineStore",
    "get_spark",
    "configure_runtime",
    "spark_type_to_feast_value_type",
    "source_datatype_to_feast_value_type",
    "SparkDataSource",
    "SparkRetrievalJob",
    "RetrievalMetadata",
    "time_range_scan",
    "latest_per_key",
    "point_in_time_join",
    "FeatureViewSpec",
    "SparkOfflineStore",
]

__version__ = "0.1.0"
