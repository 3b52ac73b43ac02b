from .pull_all import time_range_scan
from .pull_latest import latest_per_key
from .pit_join import point_in_time_join, FeatureViewSpec

__all__ = [
    "time_range_scan",
    "latest_per_key",
    "point_in_time_join",
    "FeatureViewSpec",
]
