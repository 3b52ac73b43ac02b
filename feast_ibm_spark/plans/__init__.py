from .inspect import explain_str, pushed_filters, has_broadcast_join, scan_columns

__all__ = ["explain_str", "pushed_filters", "has_broadcast_join", "scan_columns"]
