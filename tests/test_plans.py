"""Plan-level tests: registry integrity, flagship smoke, schema oracles."""

from __future__ import annotations

import pytest
from pyspark.sql.types import StringType, StructField, StructType

from wikidatabots_spark import plans


def test_registry_shape():
    q = plans.queries()
    o = plans.oracle_sql()
    assert len(q) >= 55
    assert set(o) <= set(q)
    # the overwhelming majority must be oracle-checked; rows-only is
    # reserved for genuinely non-SQL ops (seeded/approximate ANN + ML
    # variants, fake media decode)
    assert len(o) >= len(q) - 5


def test_entry_smoke(spark, sf_dir):
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "__spark_entry__", "/root/repo/__spark_entry__.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    df = mod.entry(spark)
    assert df.schema == StructType([StructField("rdf_statement", StringType())])
    rows = df.collect()
    assert len(rows) > 0
    assert all(r.rdf_statement.startswith("wd:Q") for r in rows)


RDF_QUERIES = [
    "tmdb_via_imdb",
    "tmdb_via_tvdb",
    "tmdb_not_found",
    "opencritic_add",
    "opencritic_update",
]


@pytest.mark.parametrize("name", RDF_QUERIES)
def test_rdf_pipelines_schema(spark, sf_dir, name):
    # schema-as-oracle without execution (reference test layer 1, SURVEY §5)
    df = plans.REGISTRY[name].fn(spark, sf_dir)
    assert df.schema == StructType([StructField("rdf_statement", StringType())])


@pytest.mark.parametrize(
    "name", ["q1_pricing_summary", "ev_hourly_rollup", "dedup_exact"]
)
def test_headliners_execute(spark, sf_dir, name):
    assert plans.REGISTRY[name].fn(spark, sf_dir).count() > 0
