"""Aggregate all query modules into the registry.

Importing this module populates ``QUERIES`` / ``ORACLES`` with every
named query the engine ships. New operator families register by being
imported here.
"""

from __future__ import annotations

from tiki_data_pipeline_spark.plans.registry import ORACLES, QUERIES

# Each import registers its queries via the @query decorator.
import tiki_data_pipeline_spark.plans.relational  # noqa: F401, E402
import tiki_data_pipeline_spark.plans.transform_queries  # noqa: F401, E402
import tiki_data_pipeline_spark.plans.hierarchy_queries  # noqa: F401, E402
import tiki_data_pipeline_spark.plans.cdc_queries  # noqa: F401, E402
import tiki_data_pipeline_spark.plans.llm_queries  # noqa: F401, E402
import tiki_data_pipeline_spark.plans.streaming_queries  # noqa: F401, E402
import tiki_data_pipeline_spark.plans.warehouse_queries  # noqa: F401, E402
import tiki_data_pipeline_spark.plans.extras_queries  # noqa: F401, E402
import tiki_data_pipeline_spark.plans.analytics_queries  # noqa: F401, E402
import tiki_data_pipeline_spark.plans.repair_queries  # noqa: F401, E402
import tiki_data_pipeline_spark.plans.curation_queries  # noqa: F401, E402

__all__ = ["QUERIES", "ORACLES"]
