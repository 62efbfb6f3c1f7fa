"""Declarative query plans + the driver-facing registry."""

from planet_dump_ng_spark.plans.registry import QUERIES, QuerySpec, register  # noqa: F401


def load_all() -> None:
    """Import every plan module so its @register decorators run."""
    from planet_dump_ng_spark.plans import (  # noqa: F401
        advanced_plans,
        analytics_plans,
        breadth_plans,
        dedup_plans,
        drift_plans,
        graph_plans,
        linalg_plans,
        multimodal_plans,
        relational,
        similarity_plans,
        sketch_plans,
        streaming_plans,
        text_plans,
        tpch_plans,
    )
