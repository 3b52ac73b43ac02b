"""Type mapping between Spark SQL type names and Feast ValueType names.

Re-implements the reference's regression-locked dictionary
``source_datatype_to_feast_value_type()`` (reference
``ibm_data_engine/data_engine_offline_store.py:253-286``; locked by
``tests/test_ibm_data_engine.py:162-192``). The reference's source type
names are already Spark SQL type names, so this table is the identity on
the Spark side; we keep its two deliberate policies:

- ``decimal`` maps to DOUBLE (lossy downcast, reference ``:277``),
- anything unknown falls back to ``UNKNOWN`` silently (reference ``:286``).

We avoid a hard Feast dependency: ValueType is represented as its string
name; ``to_feast_value_type`` upgrades to the real enum when feast is
importable.
"""

from __future__ import annotations

import re

_PRIMITIVE_MAP: dict[str, str] = {
    "binary": "BYTES",
    "boolean": "BOOL",
    "tinyint": "INT32",
    "smallint": "INT32",
    "int": "INT32",
    "integer": "INT32",
    "bigint": "INT64",
    "long": "INT64",
    "float": "FLOAT",
    "double": "DOUBLE",
    # Deliberate lossy downcast, kept for reference compatibility
    # (reference data_engine_offline_store.py:277).
    "decimal": "DOUBLE",
    "string": "STRING",
    "timestamp": "UNIX_TIMESTAMP",
}

_LIST_SUFFIX = "_LIST"


def _normalize(type_name: str) -> str:
    t = type_name.strip().lower()
    # decimal(10,2) -> decimal ; varchar(20) -> varchar
    t = re.sub(r"\(.*\)$", "", t).strip()
    return t


def spark_type_to_feast_value_type(type_name: str) -> str:
    """Map a Spark SQL type name (e.g. ``bigint``, ``array<string>``) to a
    Feast ValueType name. Unknown types return ``"UNKNOWN"`` (silent
    fallback, reference ``:286``)."""
    t = _normalize(type_name)
    if t.startswith("array<") and t.endswith(">"):
        inner = spark_type_to_feast_value_type(t[len("array<") : -1])
        if inner == "UNKNOWN":
            return "UNKNOWN"
        return inner + _LIST_SUFFIX
    return _PRIMITIVE_MAP.get(t, "UNKNOWN")


# Backwards-compatible alias matching the reference function name
# (reference data_engine_offline_store.py:253).
def source_datatype_to_feast_value_type(type_name: str) -> str:
    return spark_type_to_feast_value_type(type_name)


def to_feast_value_type(type_name: str):
    """Return the actual ``feast.ValueType`` enum member when feast is
    installed; otherwise the string name."""
    name = spark_type_to_feast_value_type(type_name)
    try:  # pragma: no cover - feast not installed in this environment
        from feast import ValueType

        return getattr(ValueType, name)
    except Exception:
        return name
