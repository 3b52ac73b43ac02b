"""Data sources: the engine's equivalent of ``DataEngineDataSource``.

Reference contract (``ibm_data_engine/data_engine_offline_store.py:103-163``):
a named source is exactly one of (a) a catalog *table*, (b) an inline SQL
*query*, or (c) an object-store *path* with a format in {json, csv, parquet};
it carries ``timestamp_field``, optional ``created_timestamp_column`` (dedup
tiebreak) and ``field_mapping`` (source column -> feature name rename).

Spark-first re-expression: a source is a DataFrame factory —
``spark.table(name)`` / ``spark.sql(query)`` /
``spark.read.format(fmt).load(path)``. Validation (reference ``:202-220``)
and schema introspection (reference ``:228-251``) run against the live
session; unlike the reference we CAN introspect query sources
(the reference refuses at ``:240-248`` — Spark gives us
``spark.sql(q).schema`` for free, so that limitation is lifted).
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

from ..types import spark_type_to_feast_value_type

SUPPORTED_FORMATS = ("parquet", "csv", "json")


class DataSourceValidationError(ValueError):
    pass


@dataclass(frozen=True)
class SparkDataSource:
    """Exactly one of (table, query, path) must be set.

    Mirrors the reference's three-way constructor contract including the
    "table or query or path required" error (reference ``:140-141``), the
    format validation (reference ``:147``) and name defaulting to the table
    name (reference ``:149-153``).
    """

    table: str | None = None
    query: str | None = None
    path: str | None = None
    format: str = "parquet"  # reference default cos_type="parquet" (:115,:134)
    name: str | None = None
    timestamp_field: str | None = None
    created_timestamp_column: str | None = None
    field_mapping: dict[str, str] = field(default_factory=dict)
    # reader options (csv delimiter, json multiline, ...). CSV defaults to
    # header+inferSchema so column names and types survive the round trip —
    # the remote engine the reference delegated to did its own inference.
    options: dict[str, str] = field(default_factory=dict)

    def __post_init__(self):
        n_set = sum(x is not None for x in (self.table, self.query, self.path))
        if n_set != 1:
            raise DataSourceValidationError(
                "exactly one of table, query or path is required"
            )
        if self.path is not None and self.format not in SUPPORTED_FORMATS:
            raise DataSourceValidationError(
                f"format must be one of {SUPPORTED_FORMATS}, got {self.format!r}"
            )
        if self.name is None:
            # name defaults to the table name (reference :149-153)
            object.__setattr__(self, "name", self.table or self.path or "query_source")

    # -- DataFrame factory ---------------------------------------------------
    def load(self, spark: SparkSession) -> DataFrame:
        """Produce the source DataFrame (scan operators S1-S3,
        reference ``:306-310``, ``:222-226``), with field_mapping applied."""
        df = self._load_raw(spark)
        if self.field_mapping:
            df = df.withColumnsRenamed(self.field_mapping)
        return df

    def _load_raw(self, spark: SparkSession) -> DataFrame:
        if self.table is not None:
            df = spark.table(self.table)
        elif self.query is not None:
            df = spark.sql(self.query)
        elif self.format == "parquet":
            # nanos-timestamp-safe parquet path (see sources/reader.py)
            from .reader import read_parquet

            df = read_parquet(spark, self.path)
        else:
            opts = dict(self.options)
            if self.format == "csv":
                opts.setdefault("header", "true")
                opts.setdefault("inferSchema", "true")
            df = spark.read.format(self.format).options(**opts).load(self.path)
        return df

    # -- validation (S4, reference :202-220) ---------------------------------
    def validate(self, spark: SparkSession) -> None:
        try:
            if self.table is not None:
                if not spark.catalog.tableExists(self.table):
                    raise DataSourceValidationError(f"table not found: {self.table}")
            elif self.query is not None:
                # SELECT * FROM (q) LIMIT 1 probe (reference :218)
                spark.sql(self.query).limit(1).collect()
            else:
                # existence + readability probe on the path
                self._load_raw(spark).limit(1).collect()
        except DataSourceValidationError:
            raise
        except Exception as exc:
            raise DataSourceValidationError(str(exc)) from exc

    # -- schema introspection (S5, reference :228-251) -----------------------
    def get_table_column_names_and_types(
        self, spark: SparkSession
    ) -> list[tuple[str, str]]:
        """Column names + Spark SQL type names of the RAW source (before
        field_mapping, matching the reference). Unlike the reference, query
        sources are supported (limitation at reference ``:240-248`` lifted)."""
        schema = self._load_raw(spark).schema
        return [(f.name, f.dataType.simpleString()) for f in schema.fields]

    def feast_schema(self, spark: SparkSession) -> list[tuple[str, str]]:
        """(column, Feast ValueType name) pairs, via the type map in
        :mod:`feast_ibm_spark.types`."""
        return [
            (name, spark_type_to_feast_value_type(t))
            for name, t in self.get_table_column_names_and_types(spark)
        ]

    # -- serialization round-trip (reference :165-200) -----------------------
    def to_json(self) -> str:
        return json.dumps(
            {
                "table": self.table,
                "query": self.query,
                "path": self.path,
                "format": self.format,
                "name": self.name,
                "timestamp_field": self.timestamp_field,
                "created_timestamp_column": self.created_timestamp_column,
                "field_mapping": self.field_mapping,
                "options": self.options,
            },
            sort_keys=True,
        )

    @classmethod
    def from_json(cls, payload: str) -> "SparkDataSource":
        d = json.loads(payload)
        return cls(
            table=d.get("table"),
            query=d.get("query"),
            path=d.get("path"),
            format=d.get("format", "parquet"),
            name=d.get("name"),
            timestamp_field=d.get("timestamp_field"),
            created_timestamp_column=d.get("created_timestamp_column"),
            field_mapping=d.get("field_mapping") or {},
            options=d.get("options") or {},
        )
