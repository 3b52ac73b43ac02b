"""Feast ``OfflineStore`` adapter — the drop-in surface for reference users.

The reference exposes its engine to users exclusively through Feast's
``OfflineStore`` plugin interface (``DataEngineOfflineStore``, reference
``ibm_data_engine/data_engine_offline_store.py:351-513``, pinned to
feast ^0.36, ``pyproject.toml:34``). This module provides the same
three static entry points with feast-0.36-compatible signatures, mapping
them onto the in-process engine (`store.SparkOfflineStore`):

- ``get_historical_features``   (reference ``:355-418``)
- ``pull_latest_from_table_or_query``  (reference ``:421-476``)
- ``pull_all_from_table_or_query``     (reference ``:479-513``)

Feast itself is NOT required to import this module (it is not installed
in the build container): all feast imports are deferred to call time, and
the FeatureView/DataSource mapping helpers are duck-typed — any object
with the right attributes works, which is also how they are unit-tested.

A Feast repo would configure:

    offline_store:
        type: feast_ibm_spark.feast_adapter.SparkFeastOfflineStore
        spark_master: local[*]

replacing the reference's api_key / instance_crn / target_cos_url block
(reference ``:83-93``).
"""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import SparkSession

from .operators.pit_join import FeatureViewSpec
from .retrieval import SparkRetrievalJob
from .session import get_spark
from .sources.data_source import SparkDataSource
from .store import SparkOfflineStore


def _spark_from_config(config) -> SparkSession:
    """Build the session from a RepoConfig-ish object. Recognized offline
    store options (all optional): ``spark_master``, ``spark_conf`` (dict),
    ``shuffle_partitions``."""
    oc = getattr(config, "offline_store", None) or config
    return get_spark(
        app_name="feast-ibm-spark",
        master=getattr(oc, "spark_master", None),
        shuffle_partitions=getattr(oc, "shuffle_partitions", None),
        extra_conf=getattr(oc, "spark_conf", None) or {},
    )


def _source_to_engine(ds) -> SparkDataSource:
    """Map a Feast DataSource (or any duck with the reference's
    ``DataEngineDataSource`` fields, reference ``:103-163``) to the
    engine's source."""
    if isinstance(ds, SparkDataSource):
        return ds
    return SparkDataSource(
        table=getattr(ds, "table", None),
        query=getattr(ds, "query", None),
        path=getattr(ds, "path", None),
        format=getattr(ds, "cos_type", None) or getattr(ds, "format", None) or "parquet",
        name=getattr(ds, "name", None),
        timestamp_field=getattr(ds, "timestamp_field", None),
        created_timestamp_column=getattr(ds, "created_timestamp_column", None) or None,
        field_mapping=dict(getattr(ds, "field_mapping", None) or {}),
    )


def _join_keys_of(view, entities_by_name: dict | None = None) -> list[str]:
    """Join keys of a FeatureView: prefer modern ``entity_columns``; fall
    back to resolving ``entities`` (names) through the registry dict the
    caller passes (the reference resolves via registry at ``:386-392``)."""
    cols = getattr(view, "entity_columns", None)
    if cols:
        return [getattr(c, "name", c) for c in cols]
    keys: list[str] = []
    for ent in getattr(view, "entities", []) or []:
        name = getattr(ent, "name", ent)
        resolved = (entities_by_name or {}).get(name)
        if resolved is not None:
            jk = getattr(resolved, "join_key", None) or getattr(
                resolved, "join_keys", [name]
            )
            keys.extend(jk if isinstance(jk, list) else [jk])
        else:
            keys.append(name)
    return keys


def _view_to_spec(
    spark: SparkSession, view, entities_by_name: dict | None = None
) -> FeatureViewSpec:
    """FeatureView -> engine spec (the same fields the reference extracts
    from each view when rendering its template, reference ``:394-400``)."""
    src = _source_to_engine(getattr(view, "batch_source", None) or view.source)
    ttl = getattr(view, "ttl", None)
    ttl_seconds = int(ttl.total_seconds()) if ttl else 0
    features = [
        getattr(f, "name", f)
        for f in (getattr(view, "features", None) or getattr(view, "schema", []))
    ]
    return FeatureViewSpec(
        name=view.name,
        source=src.load(spark),
        join_keys=_join_keys_of(view, entities_by_name),
        features=features,
        timestamp_field=src.timestamp_field or "event_timestamp",
        created_timestamp_column=src.created_timestamp_column,
        ttl_seconds=ttl_seconds,
        field_mapping={},  # already applied by SparkDataSource.load
    )


class SparkFeastOfflineStore:
    """Feast-0.36-shaped OfflineStore backed by the in-process engine."""

    @staticmethod
    def get_historical_features(
        config,
        feature_views: list,
        feature_refs: list[str],
        entity_df,
        registry=None,
        project: str | None = None,
        full_feature_names: bool = False,
    ) -> SparkRetrievalJob:
        spark = _spark_from_config(config)
        entities_by_name = {}
        if registry is not None and project is not None:
            try:
                entities_by_name = {
                    e.name: e for e in registry.list_entities(project)
                }
            except Exception:
                entities_by_name = {}
        specs = [
            _view_to_spec(spark, v, entities_by_name) for v in feature_views
        ]
        return SparkOfflineStore.get_historical_features(
            spark, entity_df, specs, full_feature_names=full_feature_names
        )

    @staticmethod
    def pull_latest_from_table_or_query(
        config,
        data_source,
        join_key_columns: list[str],
        feature_name_columns: list[str],
        timestamp_field: str,
        created_timestamp_column: str | None,
        start_date: datetime,
        end_date: datetime,
    ) -> SparkRetrievalJob:
        spark = _spark_from_config(config)
        return SparkOfflineStore.pull_latest_from_table_or_query(
            spark,
            _source_to_engine(data_source),
            join_key_columns,
            feature_name_columns,
            timestamp_field,
            created_timestamp_column,
            start_date,
            end_date,
        )

    @staticmethod
    def pull_all_from_table_or_query(
        config,
        data_source,
        join_key_columns: list[str],
        feature_name_columns: list[str],
        timestamp_field: str,
        start_date: datetime,
        end_date: datetime,
    ) -> SparkRetrievalJob:
        spark = _spark_from_config(config)
        return SparkOfflineStore.pull_all_from_table_or_query(
            spark,
            _source_to_engine(data_source),
            join_key_columns,
            feature_name_columns,
            timestamp_field,
            start_date,
            end_date,
        )
