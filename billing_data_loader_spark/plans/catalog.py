"""Imports every operator module so their ``@query`` registrations run.

``__spark_entry__.py`` imports this module and reads the registry.
Add new operator modules to ``_MODULES`` as they come online.
"""

from __future__ import annotations

from importlib import import_module

from .registry import QuerySpec, all_queries

_MODULES = [
    "billing_data_loader_spark.operators.aggregations",
    "billing_data_loader_spark.operators.projections",
    "billing_data_loader_spark.operators.joins",
    "billing_data_loader_spark.operators.windows",
    "billing_data_loader_spark.operators.sortsets",
    "billing_data_loader_spark.functions.scalar_suites",
    "billing_data_loader_spark.functions.udfs",
    "billing_data_loader_spark.operators.llm_pipeline",
    "billing_data_loader_spark.operators.text_analysis",
    "billing_data_loader_spark.operators.corpus_hygiene",
    "billing_data_loader_spark.operators.ann",
    "billing_data_loader_spark.operators.multimodal",
    "billing_data_loader_spark.sources.connectors",
    "billing_data_loader_spark.sources.clickhouse",
    "billing_data_loader_spark.streaming.jobs",
]

for _m in _MODULES:
    import_module(_m)


def catalog() -> dict[str, QuerySpec]:
    return all_queries()
