"""Type-map regression test — every entry of the reference's
``source_datatype_to_feast_value_type`` dictionary
(``ibm_data_engine/data_engine_offline_store.py:253-286``), locked the same
way its test does (``tests/test_ibm_data_engine.py:162-192``), plus the
behaviors the rebuild adds (parameterized decimals, nested-unknown arrays).
"""

import pytest

from feast_ibm_spark.types import (
    source_datatype_to_feast_value_type,
    spark_type_to_feast_value_type,
)

REFERENCE_MAP = {
    # primitive entries (reference :258-271)
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
    "decimal": "DOUBLE",  # deliberate lossy downcast (reference :277)
    "string": "STRING",
    "timestamp": "UNIX_TIMESTAMP",
    # array entries (reference :272-285)
    "array<binary>": "BYTES_LIST",
    "array<boolean>": "BOOL_LIST",
    "array<tinyint>": "INT32_LIST",
    "array<smallint>": "INT32_LIST",
    "array<int>": "INT32_LIST",
    "array<integer>": "INT32_LIST",
    "array<bigint>": "INT64_LIST",
    "array<long>": "INT64_LIST",
    "array<float>": "FLOAT_LIST",
    "array<double>": "DOUBLE_LIST",
    "array<decimal>": "DOUBLE_LIST",
    "array<string>": "STRING_LIST",
    "array<timestamp>": "UNIX_TIMESTAMP_LIST",
}


@pytest.mark.parametrize("src,expected", sorted(REFERENCE_MAP.items()))
def test_reference_type_map_entry(src, expected):
    assert source_datatype_to_feast_value_type(src) == expected


def test_unknown_falls_back_silently():
    # silent UNKNOWN fallback (reference :286)
    assert spark_type_to_feast_value_type("map<string,int>") == "UNKNOWN"
    assert spark_type_to_feast_value_type("struct<a:int>") == "UNKNOWN"
    assert spark_type_to_feast_value_type("interval") == "UNKNOWN"
    assert spark_type_to_feast_value_type("array<map<string,int>>") == "UNKNOWN"


def test_parameterized_and_case_normalization():
    assert spark_type_to_feast_value_type("decimal(10,2)") == "DOUBLE"
    assert spark_type_to_feast_value_type("DECIMAL(38,18)") == "DOUBLE"
    assert spark_type_to_feast_value_type("  BigInt ") == "INT64"
    assert spark_type_to_feast_value_type("array<decimal(10,2)>") == "DOUBLE_LIST"
