"""The reference's three TMDB reconciliation pipelines, Spark-first.

Shapes re-expressed from behavior observed in the reference:

- ``find_ids_via_external_key`` — wd_tmdb.py:214-262 (via IMDb) and
  wd_tmdb.py:298-345 (via TVDB): catalog-side project/dedup, wd-side
  union + extract + eligibility filter, left equi-join, RDF render.
- ``deprecated_ids`` — wd_tmdb.py:358-391: statements left-joined to the
  catalog, emit deprecation when the id no longer resolves
  (``success`` false/null), with the movie-or-collection disjunction
  modeled as a boolean OR of two catalog flags.

All plans are pure DataFrame compositions: Catalyst prunes the parquet
scans to the referenced columns, pushes the null/range filters into the
scan, and (with the catalog side typically ≪ the wd side) AQE picks a
broadcast-hash join. The only manual orderings kept, mirroring the
reference's hand-done ones (SURVEY.md §4): dedup/null-filter before the
join, and eligibility filters before any expensive verify hook.

Fixture wiring (`*_q` functions): the synthetic star schema stands in for
SPARQL/catalog frames per FIXTURES.md §6 — orders plays the wd side,
customer/supplier/part play the catalogs.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from wikidatabots_spark.functions.core import (
    pl_format,
    regexp_extract_null,
    unique_first_by,
    where_unique,
)
from wikidatabots_spark.plans.registry import register
from wikidatabots_spark.sources.tables import load_table

BLOCKED_QIDS = ["Q1", "Q7", "Q13"]  # fixture blocklist (wikidata.py:26-61 shape)


def find_ids_via_external_key(
    wd: DataFrame,
    catalog: DataFrame,
    blocked_qids: list[str],
    pid: str,
    ext_pattern: str | None = None,
    verify: Callable[[DataFrame], DataFrame] | None = None,
) -> DataFrame:
    """Generic "add external id via shared key" pipeline.

    wd columns:      item STRING, ext_id STRING, cur_id BIGINT (mostly null)
    catalog columns: id BIGINT, ext_numeric_id BIGINT
    Returns:         rdf_statement STRING

    wd_tmdb.py:214-262 re-expressed: the wd side unions SPARQL frames
    upstream of this function; ``ext_pattern`` (e.g. ``tt(\\d+)``) extracts
    the numeric join key (null-on-miss + lenient cast); eligibility =
    key-is-unique ∧ no current id ∧ not blocklisted; catalog side is
    projected + deduplicated keeping the lowest id per key (deterministic
    stand-in for Polars maintain_order=True, wd_tmdb.py:231).
    """
    cat = (
        catalog.select("id", "ext_numeric_id")
        .na.drop()
        .transform(lambda d: unique_first_by(d, ["ext_numeric_id"], ["id"]))
    )

    if ext_pattern is not None:
        key = regexp_extract_null(F.col("ext_id"), ext_pattern).try_cast("bigint")
    else:
        key = F.col("ext_id").try_cast("bigint")
    wd2 = wd.withColumn("ext_numeric_id", key)
    wd2 = (
        where_unique(
            wd2,
            F.col("cur_id").isNull() & ~F.col("item").isin(blocked_qids),
            keys=["ext_numeric_id"],
        )
        .drop("ext_id", "cur_id")
        .na.drop()
    )

    joined = wd2.join(cat, on="ext_numeric_id", how="left").na.drop()
    if verify is not None:
        joined = verify(joined)
    return joined.select(
        pl_format('wd:{} wdt:%s "{}" .' % pid, F.col("item"), F.col("id")).alias(
            "rdf_statement"
        )
    )


def deprecated_ids(
    statements: DataFrame,
    catalog: DataFrame,
) -> DataFrame:
    """Emit deprecation RDF for ids that no longer resolve.

    statements: statement STRING, id BIGINT   (wd_tmdb.py:373 shape)
    catalog:    id BIGINT, success BOOLEAN, alt_success BOOLEAN

    wd_tmdb.py:358-391: left join statements→catalog on id; keep rows where
    NOT (success OR alt_success) treating null as false (the reference's
    movie-or-collection ``.or_()`` disjunction, wd_tmdb.py:375-380).
    """
    cat = statements.join(
        catalog.select("id", "success", "alt_success"), on="id", how="left"
    )
    resolves = F.coalesce(F.col("success"), F.lit(False)) | F.coalesce(
        F.col("alt_success"), F.lit(False)
    )
    return cat.where(~resolves).select(
        pl_format(
            "wds:{} wikibase:rank wikibase:DeprecatedRank .", F.col("statement")
        ).alias("rdf_statement")
    )


# ---------------------------------------------------------------------------
# Fixture wiring: synthetic tables → pipeline inputs (FIXTURES.md §6)
# ---------------------------------------------------------------------------


def _wd_side_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """orders → the SPARQL-result analog: item/ext_id/cur_id.

    The external key collapses orderkeys ≡9 (mod 10) onto ≡8, giving a
    scale-independent ~10% duplicate rate for the is-unique filter to
    drop. 'F'-status orders already have an id (cur_id non-null); the
    rest are the gap to fill — mirrors tmdb_id-mostly-null, FIXTURES.md §2.
    """
    o = load_table(spark, sf_dir, "orders")
    ext_num = F.when(
        F.col("o_orderkey") % 10 == 9, F.col("o_orderkey") - 1
    ).otherwise(F.col("o_orderkey"))
    return o.select(
        F.concat(F.lit("Q"), F.col("o_orderkey").cast("string")).alias("item"),
        F.concat(F.lit("tt"), ext_num.cast("string")).alias("ext_id"),
        F.when(F.col("o_orderstatus") == "F", F.col("o_custkey")).alias("cur_id"),
    )


_WD_SIDE_ORDERS_SQL = """
    SELECT 'Q' || o_orderkey AS item,
           'tt' || (CASE WHEN o_orderkey % 10 = 9
                         THEN o_orderkey - 1 ELSE o_orderkey END) AS ext_id,
           CASE WHEN o_orderstatus = 'F' THEN o_custkey END AS cur_id
    FROM orders
"""


_TMDB_VIA_IMDB_ORACLE = f"""
WITH wd AS ({_WD_SIDE_ORDERS_SQL}),
wd2 AS (
    SELECT *,
           TRY_CAST(regexp_extract(ext_id, 'tt(\\d+)', 1) AS BIGINT) AS ext_numeric_id
    FROM wd
),
wd3 AS (
    SELECT *, COUNT(*) OVER (PARTITION BY ext_numeric_id) AS cnt FROM wd2
),
wdf AS (
    SELECT item, ext_numeric_id
    FROM wd3
    WHERE cnt = 1 AND cur_id IS NULL
      AND item NOT IN ('Q1', 'Q7', 'Q13')
      AND ext_numeric_id IS NOT NULL AND item IS NOT NULL
),
cat AS (
    SELECT c_custkey + 1000 AS id, c_custkey * 10 AS ext_numeric_id FROM customer
)
SELECT 'wd:' || item || ' wdt:P4947 "' || id || '" .' AS rdf_statement
FROM wdf JOIN cat USING (ext_numeric_id)
"""


@register("tmdb_via_imdb", oracle=_TMDB_VIA_IMDB_ORACLE)
def tmdb_via_imdb_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship: add-ids-via-IMDb pipeline over the synthetic schema.

    The catalog keys (c_custkey*10) land across the whole orderkey domain
    at every scale factor, so the pipeline yields rows at any SF.
    """
    wd = _wd_side_orders(spark, sf_dir)
    catalog = load_table(spark, sf_dir, "customer").select(
        (F.col("c_custkey") + 1000).alias("id"),
        (F.col("c_custkey") * 10).alias("ext_numeric_id"),
    )
    return find_ids_via_external_key(
        wd, catalog, BLOCKED_QIDS, pid="P4947", ext_pattern=r"tt(\d+)"
    )


_TMDB_VIA_TVDB_ORACLE = """
WITH wd AS (
    SELECT 'Q' || o_orderkey AS item,
           CAST(CASE WHEN o_orderkey % 10 = 9
                     THEN o_orderkey - 1 ELSE o_orderkey END AS VARCHAR) AS ext_id,
           CASE WHEN o_orderstatus = 'F' THEN o_custkey END AS cur_id
    FROM orders
),
wd2 AS (
    SELECT *, TRY_CAST(ext_id AS BIGINT) AS ext_numeric_id FROM wd
),
wd3 AS (
    SELECT *, COUNT(*) OVER (PARTITION BY ext_numeric_id) AS cnt FROM wd2
),
wdf AS (
    SELECT item, ext_numeric_id
    FROM wd3
    WHERE cnt = 1 AND cur_id IS NULL
      AND item NOT IN ('Q1', 'Q7', 'Q13')
      AND ext_numeric_id IS NOT NULL AND item IS NOT NULL
),
cat AS (
    SELECT s_suppkey + 5000 AS id, s_suppkey * 150 AS ext_numeric_id
    FROM supplier
)
SELECT 'wd:' || item || ' wdt:P4983 "' || id || '" .' AS rdf_statement
FROM wdf JOIN cat USING (ext_numeric_id)
"""


@register("tmdb_via_tvdb", oracle=_TMDB_VIA_TVDB_ORACLE)
def tmdb_via_tvdb_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TVDB variant (wd_tmdb.py:298-345): numeric key, no regex."""
    wd = _wd_side_orders(spark, sf_dir).withColumn(
        "ext_id", F.regexp_replace(F.col("ext_id"), "^tt", "")
    )
    catalog = load_table(spark, sf_dir, "supplier").select(
        (F.col("s_suppkey") + 5000).alias("id"),
        (F.col("s_suppkey") * 150).alias("ext_numeric_id"),
    )
    return find_ids_via_external_key(
        wd, catalog, BLOCKED_QIDS, pid="P4983", ext_pattern=None
    )


_TMDB_NOT_FOUND_ORACLE = """
WITH stmts AS (
    SELECT 'Q' || o_orderkey || '$S' AS statement, o_custkey AS id FROM orders
),
cat AS (
    SELECT p_partkey AS id,
           p_size > 25 AS success,
           p_brand = 'Brand#13' AS alt_success
    FROM part
),
j AS (
    SELECT s.statement, c.success, c.alt_success
    FROM stmts s LEFT JOIN cat c USING (id)
)
SELECT 'wds:' || statement || ' wikibase:rank wikibase:DeprecatedRank .'
           AS rdf_statement
FROM j
WHERE NOT (COALESCE(success, false) OR COALESCE(alt_success, false))
"""


@register("tmdb_not_found", oracle=_TMDB_NOT_FOUND_ORACLE)
def tmdb_not_found_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deprecation pipeline (wd_tmdb.py:358-391) over the fixtures."""
    o = load_table(spark, sf_dir, "orders")
    statements = o.select(
        F.concat(
            F.lit("Q"), F.col("o_orderkey").cast("string"), F.lit("$S")
        ).alias("statement"),
        F.col("o_custkey").alias("id"),
    )
    catalog = load_table(spark, sf_dir, "part").select(
        F.col("p_partkey").alias("id"),
        (F.col("p_size") > 25).alias("success"),
        (F.col("p_brand") == "Brand#13").alias("alt_success"),
    )
    return deprecated_ids(statements, catalog)
