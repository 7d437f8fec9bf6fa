"""Python Data Source tests: spark.read.format('sparql')."""

from __future__ import annotations

import pytest
from pyspark.sql.types import LongType, StringType, StructField, StructType

from wikidatabots_spark.sources.sparql_datasource import register_sparql_source

CSV = (
    "item,imdb_id,tmdb_id\n"
    "http://www.wikidata.org/entity/Q1,tt111,\n"
    "http://www.wikidata.org/entity/Q2,tt222,42\n"
)


@pytest.fixture(scope="module")
def fixture_csv(tmp_path_factory):
    p = tmp_path_factory.mktemp("sparql") / "result.csv"
    p.write_text(CSV)
    return str(p)


def test_format_sparql_typed_schema(spark, fixture_csv):
    register_sparql_source(spark)
    df = (
        spark.read.format("sparql")
        .schema("item string, tmdb_id bigint")
        .option("fixture_path", fixture_csv)
        .load()
    )
    assert df.schema == StructType(
        [StructField("item", StringType()), StructField("tmdb_id", LongType())]
    )
    rows = {r.item: r.tmdb_id for r in df.collect()}
    assert rows == {
        "http://www.wikidata.org/entity/Q1": None,
        "http://www.wikidata.org/entity/Q2": 42,
    }


def test_format_sparql_columns_option(spark, fixture_csv):
    register_sparql_source(spark)
    df = (
        spark.read.format("sparql")
        .option("columns", "imdb_id,item")
        .option("fixture_path", fixture_csv)
        .load()
    )
    # columns mode: all-string, caller-chosen order/subset
    assert [f.dataType for f in df.schema.fields] == [StringType(), StringType()]
    assert {r.imdb_id for r in df.collect()} == {"tt111", "tt222"}


def test_format_sparql_joins_distributedly(spark, sf_dir, fixture_csv):
    # the scanned frame participates in a normal distributed plan
    register_sparql_source(spark)
    from pyspark.sql import functions as F

    from wikidatabots_spark.sources.tables import load_table

    wd = (
        spark.read.format("sparql")
        .schema("item string, tmdb_id bigint")
        .option("fixture_path", fixture_csv)
        .load()
        .withColumn("key", F.regexp_extract("item", r"Q(\d+)", 1).cast("long"))
    )
    n = load_table(spark, sf_dir, "nation")
    out = wd.join(n, wd.key == n.n_nationkey).select("item", "n_name").collect()
    assert len(out) == 2
