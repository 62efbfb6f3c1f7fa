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

    # extras_plans MUST import after every other module: its entries are
    # new (never driver-green), and the rotation in __spark_entry__ keeps
    # never-green queries in plans.QUERIES order — importing it last keeps
    # the established never-checked set at the front of the 50-row window.
    from planet_dump_ng_spark.plans import extras_plans  # noqa: F401

    # curation_plans (round 5) imports after extras_plans for the same
    # reason: its entries queue BEHIND the established never-checked set.
    from planet_dump_ng_spark.plans import curation_plans  # noqa: F401

    # dsir_plans (round 7): same last-import rule as above.
    from planet_dump_ng_spark.plans import dsir_plans  # noqa: F401

    # round10_plans: same last-import rule as above.
    from planet_dump_ng_spark.plans import round10_plans  # noqa: F401
