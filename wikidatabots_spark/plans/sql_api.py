"""Queries expressed as SQL text over registered views — the third API
surface (DataFrame, format("sparql") data source, and spark.sql).

The SQL strings are written in the common Spark/DuckDB dialect subset, so
the ORACLE IS THE QUERY ITSELF — the strongest possible parity statement:
one string, two engines, identical hashes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from wikidatabots_spark.plans.registry import register
from wikidatabots_spark.sources.tables import register_views

_SQL_Q1 = """
SELECT l_returnflag,
       l_linestatus,
       CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
       COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
"""

_SQL_REGION_REVENUE = """
SELECT r_name,
       COUNT(*) AS n_lineitems,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2))))
            AS DOUBLE) AS revenue
FROM lineitem
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY r_name
"""


@register("sql_q1_identical_text", oracle=_SQL_Q1)
def sql_q1(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    return spark.sql(_SQL_Q1)


@register("sql_region_revenue", oracle=_SQL_REGION_REVENUE)
def sql_region_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    return spark.sql(_SQL_REGION_REVENUE)


_SQL_TOP_ORDER = """
WITH ranked AS (
    SELECT o_custkey, o_orderkey, o_totalprice,
           row_number() OVER (PARTITION BY o_custkey
                              ORDER BY o_totalprice DESC, o_orderkey) AS rn
    FROM orders
)
SELECT c_mktsegment,
       COUNT(*) AS n_top_orders,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE)
           AS top_order_value
FROM ranked
JOIN customer ON c_custkey = o_custkey
WHERE rn = 1
GROUP BY c_mktsegment
"""


@register("sql_top_order_cte_window", oracle=_SQL_TOP_ORDER)
def sql_top_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CTE + window function + join + aggregate in ONE string both
    engines parse — extends the identical-text surface beyond plain
    scans/joins to modern analytic SQL (the row_number tie-break keeps
    the per-customer pick engine-identical)."""
    register_views(spark, sf_dir)
    return spark.sql(_SQL_TOP_ORDER)


_SQL_LATERAL_TOPN = """
SELECT n.n_name, t.c_name, t.c_acctbal
FROM nation n,
LATERAL (
    SELECT c_name, c_acctbal
    FROM customer
    WHERE c_nationkey = n.n_nationkey
    ORDER BY c_acctbal DESC, c_name
    LIMIT 2
) t
"""


@register("sql_lateral_topn", oracle=_SQL_LATERAL_TOPN)
def sql_lateral_topn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated LATERAL subquery — per-nation top-2 customers by
    account balance — in ONE identical SQL string on both engines
    (Spark plans it as a rewritten window/join; DuckDB as a lateral
    join): the dependent-join surface of the common dialect, which
    neither plain joins nor uncorrelated subqueries exercise. Ties
    broken in the ORDER BY so the LIMIT is deterministic."""
    register_views(spark, sf_dir)
    return spark.sql(_SQL_LATERAL_TOPN)


_SQL_AGG_FILTER = """
SELECT o_orderpriority,
       COUNT(*) AS n_orders,
       COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS n_finished,
       COUNT(DISTINCT o_custkey) FILTER (WHERE o_orderstatus = 'O')
           AS n_open_customers,
       MIN(o_orderdate) FILTER (WHERE o_orderstatus = 'F')
           AS first_finished,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(14,2)))
                FILTER (WHERE o_orderstatus <> 'P') AS DOUBLE)
           AS nonpending_value
FROM orders
GROUP BY o_orderpriority
"""


@register("sql_agg_filter", oracle=_SQL_AGG_FILTER)
def sql_agg_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aggregate FILTER clauses — per-group conditional counts,
    distinct-counts, min, and a decimal-exact conditional sum — in one
    identical SQL string on both engines: the standard-SQL form of
    "pivot a few predicates into columns" that otherwise hides inside
    CASE-WHEN-inside-SUM idioms."""
    register_views(spark, sf_dir)
    return spark.sql(_SQL_AGG_FILTER)


_SQL_EXISTS = """
SELECT s_suppkey, s_name
FROM supplier
WHERE EXISTS (
    SELECT 1 FROM customer
    WHERE c_nationkey = s_nationkey AND c_acctbal > s_acctbal
)
  AND NOT EXISTS (
    SELECT 1 FROM customer
    WHERE c_nationkey = s_nationkey
      AND CAST(c_acctbal AS DECIMAL(14,2))
          > CAST(s_acctbal AS DECIMAL(14,2)) + 9000
)
"""


@register("sql_exists_correlated", oracle=_SQL_EXISTS)
def sql_exists_correlated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated EXISTS and NOT EXISTS predicates — suppliers whose
    nation has a richer customer but none richer by 9000+ (decimal-exact comparison) — in one
    identical SQL string on both engines (Spark plans them as left-semi
    and left-anti joins; quantified ANY/ALL comparisons are NOT in
    Spark's dialect, so EXISTS is the portable quantification form —
    verified: `> ALL (subquery)` is a parse error in Spark 4)."""
    register_views(spark, sf_dir)
    return spark.sql(_SQL_EXISTS)


_SQL_NOT_IN_NULLS = """
SELECT 'anti' AS leg, o_orderkey, o_custkey FROM orders
WHERE o_custkey NOT IN (SELECT c_custkey FROM customer
                        WHERE c_mktsegment = 'BUILDING')
UNION ALL
SELECT 'anti_null' AS leg, o_orderkey, o_custkey FROM orders
WHERE o_custkey NOT IN (
    SELECT CASE WHEN c_custkey % 11 = 0 THEN NULL ELSE c_custkey END
    FROM customer WHERE c_mktsegment = 'BUILDING')
UNION ALL
SELECT 'in_null' AS leg, o_orderkey, o_custkey FROM orders
WHERE o_custkey IN (
    SELECT CASE WHEN c_custkey % 11 = 0 THEN NULL ELSE c_custkey END
    FROM customer WHERE c_mktsegment = 'BUILDING')
"""


@register("sql_not_in_nulls", oracle=_SQL_NOT_IN_NULLS)
def sql_not_in_nulls(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Three-valued NOT IN / IN subquery semantics in one identical SQL
    string on both engines — the classic silent-wrong-answer family:

    - ``anti``: NOT IN over a null-free subquery — the plain anti-join
      content (Spark: null-aware anti join degenerating to left-anti).
    - ``anti_null``: the SAME predicate with one planted NULL in the
      subquery — ANSI three-valued logic makes every row UNKNOWN, so
      this leg contributes ZERO rows; an engine that rewrites NOT IN
      to a plain anti join (ignoring null-awareness) would emit its
      rows and fail the hash. Spark plans this as a null-aware
      BroadcastHashJoin — the extra null-check is exactly what this
      leg pins.
    - ``in_null``: IN over the nulled subquery — matched keys still
      return TRUE (rows survive), unmatched become UNKNOWN (dropped),
      and keys whose subquery copy was nulled out drop too.

    Scale: all three legs broadcast the (dim-sized) subquery; the
    null-aware variant adds a has-null flag to the broadcast, not a
    shuffle. NOT IN over a FACT-sized subquery is the anti-pattern to
    avoid at 100 TB regardless of engine — rewrite as NOT EXISTS
    (null-insensitive, plans as a plain anti join)."""
    register_views(spark, sf_dir)
    return spark.sql(_SQL_NOT_IN_NULLS)
