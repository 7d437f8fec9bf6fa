"""Third TPC-H wave: the remaining classic shapes adapted to the
available tables (no ``partsupp``, no ``l_commitdate``/``l_receiptdate``
in the synthetic schema — cost terms use ``p_retailprice`` and lateness
uses ``l_shipdate`` vs ``o_orderdate``).

Covered shapes and why they matter at 100 TB:

- q8  ratio-of-conditional-sums over a 6-table join (market share)
- q9  profit expression with a decimal cost term, grouped by dim + year
- q13 outer-join count distribution (two chained aggregations)
- q15 groupwise-max over an aggregated view (view + scalar subquery)
- q17 correlated scalar average (per-group threshold join-back)
- q20 nested IN with an aggregate HAVING threshold (semi-join chain)
- q21 exists + not-exists self-joins on the fact table (semi then anti)

Determinism rules as elsewhere (registry.py docstring): decimal sums
cast back to double, single IEEE division per ratio, total tiebreak
order for any ranked/limited output.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from wikidatabots_spark.plans.registry import register
from wikidatabots_spark.sources.tables import load_table


def _dec(c: str, scale: str = "12,2") -> Column:
    return F.col(c).cast(f"decimal({scale})")


def _disc_price() -> Column:
    one = F.lit(1).cast("decimal(4,2)")
    return _dec("l_extendedprice") * (one - _dec("l_discount", "4,2"))


# --- q8: national market share ---------------------------------------------
@register(
    "q8_market_share",
    oracle="""
SELECT CAST(EXTRACT(year FROM o_orderdate) AS INT) AS o_year,
       CAST(SUM(CASE WHEN sn.n_name = 'NATION_5'
                THEN CAST(l_extendedprice AS DECIMAL(12,2))
                     * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))
                END) AS DOUBLE)
       / CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                  * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2))))
              AS DOUBLE) AS mkt_share
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation cn ON c_nationkey = cn.n_nationkey
JOIN region   ON cn.n_regionkey = r_regionkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation sn ON s_nationkey = sn.n_nationkey
JOIN part     ON l_partkey = p_partkey
WHERE r_name = 'ASIA' AND p_type = 'ECONOMY'
GROUP BY CAST(EXTRACT(year FROM o_orderdate) AS INT)
""",
)
def q8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H q8 shape: NATION_5's share of ECONOMY-part revenue sold to
    ASIA customers, per order year. Numerator and denominator are exact
    decimal sums; the share is the single double division.

    Scale notes: part / supplier / nation / region are broadcast (dims);
    only lineitem⋈orders and the final per-year agg shuffle. The
    customer join stays a shuffle join — at SF100k customer is ~15 B
    rows, far over any broadcast threshold — and AQE picks the side.
    """
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    cu = load_table(spark, sf_dir, "customer")
    cn = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("c_nk"), F.col("n_regionkey").alias("c_rk")
    )
    r = load_table(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    su = load_table(spark, sf_dir, "supplier")
    sn = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation")
    )
    p = load_table(spark, sf_dir, "part").where(F.col("p_type") == "ECONOMY")
    rev = _disc_price()
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(F.broadcast(su), li.l_suppkey == su.s_suppkey)
        .join(F.broadcast(sn), su.s_nationkey == F.col("s_nk"))
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(cu, o.o_custkey == cu.c_custkey)
        .join(F.broadcast(cn), cu.c_nationkey == F.col("c_nk"))
        .join(F.broadcast(r), F.col("c_rk") == r.r_regionkey, "left_semi")
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            (
                F.sum(F.when(F.col("supp_nation") == "NATION_5", rev)).cast("double")
                / F.sum(rev).cast("double")
            ).alias("mkt_share")
        )
    )


# --- q9: product-type profit -----------------------------------------------
@register(
    "q9_product_profit",
    oracle="""
SELECT n_name AS nation,
       CAST(EXTRACT(year FROM o_orderdate) AS INT) AS o_year,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))
                - CAST(l_quantity AS DECIMAL(12,2))
                  * CAST(p_retailprice AS DECIMAL(12,2))
                  * CAST(0.1 AS DECIMAL(2,1))) AS DOUBLE) AS profit
FROM lineitem
JOIN part     ON l_partkey = p_partkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN orders   ON l_orderkey = o_orderkey
WHERE contains(p_name, 'widget')
GROUP BY n_name, CAST(EXTRACT(year FROM o_orderdate) AS INT)
""",
)
def q9(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H q9 shape with ``0.1 * p_retailprice`` standing in for the
    missing ``ps_supplycost``. The profit term is pure decimal
    arithmetic (exact in both engines); only the final cast is double.
    """
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").where(
        F.contains(F.col("p_name"), F.lit("widget"))
    )
    su = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    o = load_table(spark, sf_dir, "orders")
    profit = _disc_price() - _dec("l_quantity") * _dec("p_retailprice") * F.lit(
        "0.1"
    ).cast("decimal(2,1)")
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(F.broadcast(su), li.l_suppkey == su.s_suppkey)
        .join(F.broadcast(n), su.s_nationkey == n.n_nationkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .groupBy(
            F.col("n_name").alias("nation"), F.year("o_orderdate").alias("o_year")
        )
        .agg(F.sum(profit).cast("double").alias("profit"))
    )


# --- q13: customer order-count distribution --------------------------------
@register(
    "q13_customer_distribution",
    oracle="""
SELECT c_count, COUNT(*) AS custdist
FROM (
    SELECT c_custkey, COUNT(o_orderkey) AS c_count
    FROM customer LEFT JOIN orders
      ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
    GROUP BY c_custkey
)
GROUP BY c_count
""",
)
def q13(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two chained aggregations over an outer join; customers with no
    qualifying orders land in the c_count=0 bucket (COUNT of the
    null-extended key is 0, not 1 — the classic q13 trap)."""
    cu = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").where(
        F.col("o_orderpriority") != "1-URGENT"
    )
    per_cust = (
        cu.join(o, cu.c_custkey == o.o_custkey, "left")
        .groupBy(cu.c_custkey)
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


# --- q15: top supplier via aggregated view ---------------------------------
_Q15_REV = """
rev AS (
    SELECT l_suppkey AS supplier_no,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                    * (CAST(1 AS DECIMAL(4,2))
                       - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE)
               AS total_revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l_shipdate < TIMESTAMP '1997-04-01 00:00:00'
    GROUP BY l_suppkey
)
"""


@register(
    "q15_top_supplier",
    oracle=f"""
WITH {_Q15_REV}
SELECT s_suppkey, s_name, total_revenue
FROM supplier JOIN rev ON s_suppkey = supplier_no
WHERE total_revenue = (SELECT MAX(total_revenue) FROM rev)
""",
)
def q15(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Groupwise max over an aggregated view. The max is a comparison
    of doubles both engines computed identically (decimal sum → one
    cast), so equality is exact. The 1-row max rides in as a broadcast
    crossJoin — no driver-side collect, one job."""
    li = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-04-01 00:00:00").cast("timestamp"))
    )
    rev = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        F.sum(_disc_price()).cast("double").alias("total_revenue")
    )
    top = rev.agg(F.max("total_revenue").alias("__max_rev"))
    su = load_table(spark, sf_dir, "supplier")
    return (
        rev.crossJoin(F.broadcast(top))
        .where(F.col("total_revenue") == F.col("__max_rev"))
        .join(F.broadcast(su), F.col("supplier_no") == su.s_suppkey)
        .select("s_suppkey", "s_name", "total_revenue")
    )


# --- q17: small-quantity-order revenue -------------------------------------
@register(
    "q17_small_quantity",
    oracle="""
WITH avg_qty AS (
    SELECT l_partkey AS ap_partkey,
           0.2 * (CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE)
                  / COUNT(*)) AS threshold
    FROM lineitem GROUP BY l_partkey
)
SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / 7.0
           AS avg_yearly
FROM lineitem
JOIN part ON p_partkey = l_partkey
JOIN avg_qty ON ap_partkey = l_partkey
WHERE p_brand = 'Brand#13' AND p_type = 'ECONOMY'
  AND l_quantity < threshold
""",
)
def q17(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated scalar average as a per-part aggregate joined back.
    The threshold is ``0.2 * (decimal_sum_as_double / count)`` — one
    division, one multiply, bit-identical across engines, so the strict
    ``<`` filters the same rows.

    Scale notes: the part filter is pushed INTO the average — a part's
    threshold depends only on that part's own lineitem rows, so
    averaging over the broadcast-filtered join produces bit-identical
    thresholds while shuffling only the filtered parts' rows (the
    oracle computes thresholds for every part, then discards the
    unfiltered ones — same values, so the hash still matches).
    """
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").where(
        (F.col("p_brand") == "Brand#13") & (F.col("p_type") == "ECONOMY")
    )
    lp = li.join(F.broadcast(p), li.l_partkey == p.p_partkey).select(
        "l_partkey", "l_quantity", "l_extendedprice"
    )
    avg_qty = lp.groupBy(F.col("l_partkey").alias("ap_partkey")).agg(
        (
            F.lit(0.2)
            * (F.sum(_dec("l_quantity")).cast("double") / F.count(F.lit(1)))
        ).alias("threshold")
    )
    return (
        lp.join(avg_qty, lp.l_partkey == F.col("ap_partkey"))
        .where(F.col("l_quantity") < F.col("threshold"))
        .agg(
            (F.sum(_dec("l_extendedprice")).cast("double") / F.lit(7.0)).alias(
                "avg_yearly"
            )
        )
    )


# --- q20: suppliers over a shipped-quantity threshold ----------------------
@register(
    "q20_heavy_suppliers",
    oracle="""
SELECT s_suppkey, s_name
FROM supplier JOIN nation ON s_nationkey = n_nationkey
WHERE n_name = 'NATION_3'
  AND s_suppkey IN (
      SELECT l_suppkey
      FROM lineitem JOIN part ON l_partkey = p_partkey
      WHERE p_type = 'PROMO'
        AND l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
        AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
      GROUP BY l_suppkey
      HAVING SUM(CAST(l_quantity AS DECIMAL(12,2))) > 100
  )
""",
)
def q20(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nested IN with an aggregate HAVING threshold: the inner aggregate
    becomes a distinct key set, attached with a left-semi join."""
    p = load_table(spark, sf_dir, "part").where(F.col("p_type") == "PROMO")
    li = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
    )
    heavy = (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy("l_suppkey")
        .agg(F.sum(_dec("l_quantity")).alias("__qty"))
        .where(F.col("__qty") > 100)
        .select("l_suppkey")
    )
    su = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation").where(F.col("n_name") == "NATION_3")
    return (
        su.join(F.broadcast(n), su.s_nationkey == n.n_nationkey, "left_semi")
        .join(heavy, su.s_suppkey == F.col("l_suppkey"), "left_semi")
        .select("s_suppkey", "s_name")
    )


# --- q21: suppliers who kept orders waiting --------------------------------
@register(
    "q21_waiting_supplier",
    oracle="""
WITH late AS (
    SELECT l_orderkey, l_suppkey,
           l_shipdate > o_orderdate + INTERVAL 45 DAY AS is_late
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    WHERE o_orderstatus = 'F'
)
SELECT s_name, CAST(COUNT(*) AS BIGINT) AS numwait
FROM late l1
JOIN supplier ON l1.l_suppkey = s_suppkey
WHERE l1.is_late
  AND EXISTS (SELECT 1 FROM late l2
              WHERE l2.l_orderkey = l1.l_orderkey
                AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (SELECT 1 FROM late l3
                  WHERE l3.l_orderkey = l1.l_orderkey
                    AND l3.l_suppkey <> l1.l_suppkey
                    AND l3.is_late)
GROUP BY s_name
ORDER BY numwait DESC, s_name
LIMIT 10
""",
)
def q21(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H q21 shape with lateness := shipped >45 days after the order
    date (the schema has no commit/receipt dates). Ranked output has a
    total (numwait desc, s_name) order so the LIMIT 10 set is
    deterministic.

    Spark-first re-expression: the literal EXISTS/NOT-EXISTS translation
    (the oracle's form) is two self-joins against ``late`` — three full
    recomputations of lineitem⋈orders, since the differing filters make
    the exchanges non-reusable. Per-order aggregation is equivalent and
    touches the fact join once:

    - supplier s "kept order o waiting" ⇔ s is late in o, o has another
      supplier (EXISTS), and no OTHER supplier is late (NOT EXISTS)
      ⇔ o's distinct-supplier count > 1 and its late-supplier set is
      exactly {s}; numwait counts s's late line items in such orders.

    Two shuffles total — groupBy (orderkey, suppkey), then groupBy
    orderkey — both of 16-byte rows; the text-book anti-join plan is
    strictly worse at any scale.
    """
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").where(F.col("o_orderstatus") == "F")
    late = li.join(o, li.l_orderkey == o.o_orderkey).select(
        "l_orderkey",
        "l_suppkey",
        (
            F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 45 DAYS")
        ).alias("is_late"),
    )
    per_os = late.groupBy("l_orderkey", "l_suppkey").agg(
        F.sum(F.col("is_late").cast("bigint")).alias("late_rows")
    )
    per_o = per_os.groupBy("l_orderkey").agg(
        F.count(F.lit(1)).alias("n_supp"),
        F.sum((F.col("late_rows") > 0).cast("bigint")).alias("n_late_supp"),
    )
    su = load_table(spark, sf_dir, "supplier")
    waiting = (
        per_os.join(per_o, "l_orderkey")
        .where(
            (F.col("late_rows") > 0)
            & (F.col("n_late_supp") == 1)
            & (F.col("n_supp") > 1)
        )
        .join(F.broadcast(su), per_os.l_suppkey == su.s_suppkey)
        .groupBy("s_name")
        .agg(F.sum("late_rows").alias("numwait"))
    )
    return waiting.orderBy(F.col("numwait").desc(), "s_name").limit(10)


# --- q11: important stock identification ------------------------------------
@register(
    "q11_important_stock",
    oracle="""
WITH per_part AS (
    SELECT l_partkey,
           SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS val
    FROM lineitem
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation   ON s_nationkey = n_nationkey
    WHERE n_name = 'NATION_3'
    GROUP BY l_partkey
)
SELECT l_partkey AS partkey, CAST(val AS DOUBLE) AS value
FROM per_part,
     (SELECT SUM(val) AS total, CAST(COUNT(*) AS DECIMAL(9,0)) AS nparts
      FROM per_part) t
WHERE val * nparts > total * CAST(2 AS DECIMAL(1,0))
""",
)
def q11(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H q11 shape adapted to the schema (no ``partsupp``): a part is
    "important stock" for NATION_3 when its suppliers' lineitem revenue
    exceeds twice the average per-part revenue for that nation. The spec
    scales its fixed fraction by 1/SF so the result set stays stable as
    data grows; a relative threshold achieves the same scale-invariance
    without an out-of-band SF constant. The comparison is cross-multiplied
    (``val·nparts > 2·total``) so both sides are exact decimal products —
    no division, no rounding, bit-identical kept set across engines.
    decimal(18,2) sums cap the product at precision 28, inside both
    engines' exact range.

    Scale notes: supplier filtered by a broadcast nation semi-join, then
    broadcast into lineitem (dim-sized), so the only full shuffle is the
    per-part aggregation. The global total re-aggregates the per-part
    result (thousands of rows, not the fact table) and broadcasts back —
    the textbook scalar-subquery plan with one scan of lineitem.
    """
    li = load_table(spark, sf_dir, "lineitem")
    su = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation").where(F.col("n_name") == "NATION_3")
    nat_su = su.join(F.broadcast(n), su.s_nationkey == n.n_nationkey, "left_semi")
    per_part = (
        li.join(F.broadcast(nat_su), li.l_suppkey == nat_su.s_suppkey, "left_semi")
        .groupBy("l_partkey")
        .agg(F.sum(_dec("l_extendedprice", "18,2")).alias("val"))
    )
    total = per_part.agg(
        F.sum("val").alias("total"),
        F.count(F.lit(1)).cast("decimal(9,0)").alias("nparts"),
    )
    return (
        per_part.join(F.broadcast(total))
        .where(
            F.col("val") * F.col("nparts")
            > F.col("total") * F.lit(2).cast("decimal(1,0)")
        )
        .select(
            F.col("l_partkey").alias("partkey"),
            F.col("val").cast("double").alias("value"),
        )
    )
