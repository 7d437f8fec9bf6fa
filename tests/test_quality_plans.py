"""Tests for plans.quality (round-4c pipeline-operations queries).

Planted-defect tests write tiny parquet table dirs to tmp_path and run
the registered query functions against them end-to-end — the same
load_table path the driver exercises, with fixtures the oracle sweep
cannot construct (the synthetic testdata is clean, so e.g. dq
violations are only reachable by planting them).
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import Row
from pyspark.sql import functions as F

from wikidatabots_spark.plans.quality import (
    dq_expectations_q,
    ev_gapfill_hourly_q,
    knn_filtered_topk_q,
    op_union_by_name_q,
    text_pmi_bigrams_q,
)


def _write(spark, tmp_path, name, rows):
    spark.createDataFrame(rows).write.mode("overwrite").parquet(
        str(tmp_path / f"{name}.parquet")
    )


def test_gapfill_marks_planted_gap(spark, tmp_path):
    h = lambda k: dt.datetime(2024, 5, 1, k, 15, 0)  # noqa: E731
    rows = [
        Row(event_id=i, ts=t, user_id=1, event_type="view", value=1.0, props="{}")
        for i, t in enumerate([h(0), h(0), h(1), h(3)])  # hour 2 missing
    ]
    _write(spark, tmp_path, "events", rows)
    out = ev_gapfill_hourly_q(spark, str(tmp_path)).collect()
    assert len(out) == 4  # hours 0..3 densified
    by_hour = {r.hour_start.hour: r for r in out}
    assert by_hour[2].n_events == 0 and by_hour[2].was_gap
    assert by_hour[0].n_events == 2 and not by_hour[0].was_gap
    assert by_hour[3].n_events == 1 and not by_hour[3].was_gap


def test_gapfill_spans_are_per_type(spark, tmp_path):
    h = lambda k: dt.datetime(2024, 5, 1, k, 0, 0)  # noqa: E731
    rows = [
        Row(event_id=1, ts=h(0), user_id=1, event_type="a", value=0.0, props=""),
        Row(event_id=2, ts=h(5), user_id=1, event_type="a", value=0.0, props=""),
        Row(event_id=3, ts=h(10), user_id=1, event_type="b", value=0.0, props=""),
    ]
    _write(spark, tmp_path, "events", rows)
    out = ev_gapfill_hourly_q(spark, str(tmp_path))
    counts = {r.event_type: r.n for r in out.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n")).collect()}
    # type a spans hours 0..5 (6 rows); type b's span is the single hour 10,
    # NOT the global min..max — spans are per type
    assert counts == {"a": 6, "b": 1}


def test_dq_planted_violations(spark, tmp_path):
    _write(spark, tmp_path, "orders", [
        Row(o_orderkey=1, o_custkey=10, o_totalprice=5.0,
            o_orderdate=dt.date(2024, 1, 1)),
        Row(o_orderkey=2, o_custkey=99, o_totalprice=-1.0,  # orphan + nonpos
            o_orderdate=None),                              # + null date
    ])
    _write(spark, tmp_path, "lineitem", [
        Row(l_orderkey=1, l_quantity=5.0, l_discount=0.05,
            l_extendedprice=10.0),
        Row(l_orderkey=7, l_quantity=99.0, l_discount=0.5,  # orphan + both oor
            l_extendedprice=0.0),                           # + nonpos price
    ])
    _write(spark, tmp_path, "customer", [
        Row(c_custkey=10, c_acctbal=100.0),
        Row(c_custkey=10, c_acctbal=50000.0),  # dup pk + balance oor
    ])
    _write(spark, tmp_path, "part", [
        Row(p_partkey=1, p_size=0, p_retailprice=0.0),  # size oor + nonpos
    ])
    out = {r.check_name: r for r in dq_expectations_q(spark, str(tmp_path)).collect()}
    assert len(out) == 11
    assert out["lineitem_orderkey_in_orders"].n_violations == 1
    assert out["lineitem_quantity_1_50"].n_violations == 1
    assert out["lineitem_discount_0_01"].n_violations == 1
    assert out["lineitem_extendedprice_positive"].n_violations == 1
    assert out["orders_custkey_in_customer"].n_violations == 1
    assert out["orders_totalprice_positive"].n_violations == 1
    assert out["orders_orderdate_not_null"].n_violations == 1
    assert out["customer_custkey_unique"].n_violations == 1
    assert out["customer_acctbal_range"].n_violations == 1
    assert out["part_size_1_50"].n_violations == 1
    assert out["part_retailprice_positive"].n_violations == 1
    assert out["lineitem_orderkey_in_orders"].n_checked == 2
    assert out["part_size_1_50"].n_checked == 1


def test_dq_clean_on_real_testdata(spark, sf_dir):
    out = dq_expectations_q(spark, sf_dir).collect()
    assert len(out) == 11
    assert all(r.n_violations == 0 for r in out), [
        (r.check_name, r.n_violations) for r in out if r.n_violations
    ]


def test_union_by_name_nulls_missing_columns(spark, sf_dir):
    out = op_union_by_name_q(spark, sf_dir)
    assert set(out.columns) == {"key", "name", "src", "region_code"}
    rows = out.collect()
    nation_rows = [r for r in rows if r.src == "nation"]
    region_rows = [r for r in rows if r.src is None]
    assert len(nation_rows) == 25 and len(region_rows) == 5
    assert all(r.region_code is None for r in nation_rows)
    assert all(r.region_code == r.key * 10 for r in region_rows)


def test_pmi_surfaces_planted_collocation(spark, tmp_path):
    # "zig zag" always adjacent; every filler word has >=2 distinct
    # successors AND predecessors across the docs, so no filler bigram is
    # a perfect association (PMI's low-count bias would rank a rare
    # perfect pair above a frequent one — by hand: zig-zag lift 5.67e6,
    # best filler 2.83e6). Each pattern repeated 3x to clear PMI_MIN_COUNT.
    docs = (
        ["zig zag a b c a", "b a c zig zag b c", "c b zig zag c a b"] * 3
    )
    _write(spark, tmp_path, "documents", [
        Row(doc_id=i, text=t, lang="en", source="s", n_chars=len(t))
        for i, t in enumerate(docs)
    ])
    out = text_pmi_bigrams_q(spark, str(tmp_path)).collect()
    top = min(out, key=lambda r: r.rank)
    assert (top.w1, top.w2) == ("zig", "zag")
    assert top.n_cooccur == 9
    ranks = sorted(r.rank for r in out)
    assert ranks == list(range(1, len(out) + 1))


def test_knn_filtered_respects_label(spark, sf_dir):
    from wikidatabots_spark.sources.tables import load_table

    out = knn_filtered_topk_q(spark, sf_dir)
    emb = load_table(spark, sf_dir, "embeddings").select(
        F.col("vec_id"), F.col("label").alias("true_label")
    )
    joined = out.join(emb, out["query_id"] == emb["vec_id"]).collect()
    assert len(joined) > 0
    # every neighbor's label equals its query's label, and self is excluded
    assert all(r.label == r.true_label for r in joined)
    assert all(r.query_id != r.neighbor_id for r in joined)
    per_q = {}
    for r in joined:
        per_q.setdefault(r.query_id, []).append(r.rank)
    assert all(sorted(v) == list(range(1, len(v) + 1)) for v in per_q.values())
