"""Query plans: the reference's five pipelines + analytics/extension queries.

Importing this package registers every query in ``plans.registry`` — the
driver contract (``__spark_entry__``) reads the registry.
"""

from wikidatabots_spark.plans import (  # noqa: F401
    analytics,
    curation,
    events,
    extensions,
    llmdata,
    mains,
    opencritic,
    operators_micro,
    quality,
    retrieval,
    tokenizer,
    sql_api,
    tmdb,
    tpch,
    tpch2,
)
from wikidatabots_spark.plans.registry import REGISTRY, oracle_sql, queries

__all__ = ["REGISTRY", "queries", "oracle_sql"]
