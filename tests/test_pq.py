"""Product-quantization operator tests: planted-codebook exactness,
narrow-map plan pins for encode and ADC search, and the ADC distance
identity on a hand-computable example."""

from __future__ import annotations

from pyspark.sql import functions as F

from wikidatabots_spark.operators.pq import (
    pq_adc_topk,
    pq_encode,
    pq_fit,
)


def _toy(spark):
    # 8 vectors of dim 4 -> m=2 subspaces of 2 dims; values chosen so
    # both subspace codebooks are hand-checkable
    rows = [
        (0, [0, 0, 10, 10]),
        (1, [10, 10, 0, 0]),
        (2, [0, 1, 10, 9]),
        (3, [9, 10, 1, 0]),
        (4, [1, 0, 9, 10]),
        (5, [10, 9, 0, 1]),
        (6, [0, 0, 0, 0]),
        (7, [10, 10, 10, 10]),
    ]
    return spark.createDataFrame(rows, "vec_id long, v array<int>")


def test_pq_encode_matches_nearest_centroid(spark):
    df = _toy(spark)
    books = pq_fit(df, m=2, subdim=2, k=2, rounds=2)
    got = {
        r["vec_id"]: (r["code0"], r["code1"])
        for r in pq_encode(df, books, subdim=2).collect()
    }
    # recompute expected codes in python from the driver-held books
    rows = {r["vec_id"]: r["v"] for r in df.collect()}
    for vid, v in rows.items():
        for s, book in enumerate(books):
            sub = v[s * 2 : (s + 1) * 2]
            best = min(
                (sum((a - b) ** 2 for a, b in zip(sub, cv)), c)
                for c, cv in book
            )[1]
            assert got[vid][s] == best, (vid, s)


def test_pq_encode_and_adc_plans_are_narrow_until_topk(spark):
    """Encoding must be a pure narrow map (codebooks are literals); the
    ADC search's ONLY exchange is the final per-query top-k window —
    candidates never join a vector relation."""
    df = _toy(spark)
    books = pq_fit(df, m=2, subdim=2, k=2, rounds=2)
    enc = pq_encode(df, books, subdim=2)
    plan = enc._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan and "Join" not in plan

    queries = [(r["vec_id"], r["v"]) for r in df.where("vec_id < 2").collect()]
    out = pq_adc_topk(enc.drop("v"), queries, books, subdim=2, k_top=3)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan
    # exactly one exchange: the window's hashpartitioning on query_id
    assert plan.count("Exchange") == 1


def test_adc_distance_is_sum_of_codebook_distances(spark):
    df = _toy(spark)
    books = pq_fit(df, m=2, subdim=2, k=2, rounds=2)
    enc = pq_encode(df, books, subdim=2)
    queries = [(r["vec_id"], r["v"]) for r in df.where("vec_id = 0").collect()]
    got = {
        r["neighbor_id"]: r["adc_dist"]
        for r in pq_adc_topk(enc.drop("v"), queries, books, subdim=2, k_top=8).collect()
    }
    codes = {
        r["vec_id"]: (r["code0"], r["code1"]) for r in enc.collect()
    }
    qvec = queries[0][1]
    for nid, adc in got.items():
        expect = 0
        for s, book in enumerate(books):
            cv = dict(book)[codes[nid][s]]
            sub = qvec[s * 2 : (s + 1) * 2]
            expect += sum((a - b) ** 2 for a, b in zip(sub, cv))
        assert adc == expect, nid
    assert 0 not in got  # query excluded from its own candidates


def test_recall_eval_bounds(spark, sf_dir):
    from wikidatabots_spark.plans.retrieval import knn_recall_eval_q

    rows = knn_recall_eval_q(spark, sf_dir).collect()
    assert len(rows) == 20
    for r in rows:
        assert r["n_exact"] == 3
        assert 0 <= r["n_matched"] <= min(r["n_exact"], max(r["n_ivf"], 0))
        assert abs(r["recall"] - r["n_matched"] / 3.0) < 1e-12


def test_adc_with_query_cells_restricts_and_preserves_order(spark):
    """IVF-PQ composition mechanism: with query_cells, ADC must (a)
    return ONLY candidates whose cell is in the query's probed list,
    (b) rank them exactly as the unrestricted search ranks that subset,
    and (c) keep its narrow shape — the cell filter adds no join and no
    extra exchange."""
    from wikidatabots_spark.operators.clustering import with_cluster

    df = _toy(spark)
    books = pq_fit(df, m=2, subdim=2, k=2, rounds=2)
    # two hand-planted coarse cells: near-origin vs near-(10,10,10,10)
    ivf_book = [(0, [0, 0, 0, 0]), (1, [10, 10, 10, 10])]
    enc = with_cluster(
        pq_encode(df, books, subdim=2), ivf_book, "v", out_col="cell"
    )
    cells = {r["vec_id"]: r["cell"] for r in enc.collect()}
    queries = [(r["vec_id"], r["v"]) for r in df.where("vec_id < 2").collect()]
    probes = {0: [0], 1: [1]}  # each query probes ONE cell only
    out = pq_adc_topk(
        enc.drop("v"), queries, books, subdim=2, k_top=8,
        query_cells=probes, cell_col="cell",
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan
    assert plan.count("Exchange") == 1
    restricted = {
        (r["query_id"], r["neighbor_id"]): r["rank"] for r in out.collect()
    }
    assert restricted, "restricted search returned nothing"
    for (qid, nid) in restricted:
        assert cells[nid] in probes[qid]
    # the unrestricted ranking, filtered to the probed cells and
    # re-ranked, must agree pair-for-pair
    full = pq_adc_topk(enc.drop("v"), queries, books, subdim=2, k_top=8)
    expect = {}
    for qid in probes:
        kept = [
            (r["adc_dist"], r["neighbor_id"])
            for r in full.collect()
            if r["query_id"] == qid and cells[r["neighbor_id"]] in probes[qid]
        ]
        for i, (_, nid) in enumerate(sorted(kept)):
            expect[(qid, nid)] = i + 1
    assert restricted == expect
