"""Adversarial hot-bucket skew fixture (VERDICT r10 next #5).

SCALING.md's central dedup claim is that ``BAND_BUCKET_CAP`` bounds
the boilerplate-cluster blowup: a template cluster of f near-identical
documents shares ALL its band buckets, so an uncapped band self-join
emits ~f²/2 rows per bucket (10^5 docs → 5·10^9 pairs), while the
anchor rule emits ≤ cap·f and connected-components transitivity still
recovers the whole cluster through the bucket minimum. These tests
CONSTRUCT that input — 10^4 byte-identical documents plus a handful of
distinct ones — and pin both halves of the claim, plus the r11
contraction property of the streaming maintenance sink (CC edge count
independent of cluster membership).
"""

from __future__ import annotations

from pyspark.sql import functions as F

N_HOT = 10_000
HOT_TEXT = (
    "breaking news the quarterly template boilerplate page generated "
    "for every mirror of the site differs only by an invisible stamp"
)
COLD_TEXTS = {
    100_000: "alpha beta gamma delta epsilon zeta eta theta iota kappa",
    100_001: "one two three four five six seven eight nine ten eleven",
    100_002: "red orange yellow green blue indigo violet umber sepia",
}


def _skew_docs(spark, lo: int = 0, hi: int = N_HOT, cold: bool = True):
    hot = spark.range(lo, hi).select(
        F.col("id").alias("doc_id"), F.lit(HOT_TEXT).alias("text")
    )
    if not cold:
        return hot
    cold_df = spark.createDataFrame(
        list(COLD_TEXTS.items()), "doc_id long, text string"
    )
    return hot.unionByName(cold_df)


def test_hot_bucket_anchor_cap_bounds_pairs_linearly(spark):
    """The quadratic skew bomb defused: on 10^4 identical docs the
    capped band join emits ≤ cap·f candidate rows (f = band-table rows)
    instead of ~f²/2, and min-label CC over the capped pairs still
    labels the ENTIRE cluster with its minimum — component equality
    with the analytically-known full closure."""
    from wikidatabots_spark.operators.dedup import (
        BAND_BUCKET_CAP,
        band_pairs,
        cap_band_buckets,
        connected_components,
        minhash_band_table,
    )
    from wikidatabots_spark.functions.scale import pushdown_fence

    docs = _skew_docs(spark)
    bands = pushdown_fence(minhash_band_table(docs))
    f = bands.count()
    assert f >= 4 * N_HOT  # 4 bands x 10^4 hot docs (+ cold)

    # raw capped join volume (pre-aggregation), the quantity SCALING.md
    # bounds: anchors(cap) x bucket members
    a = cap_band_buckets(bands).select(
        F.col("doc_id").alias("id_a"), "band_idx", "band_hash"
    )
    b = bands.select(F.col("doc_id").alias("id_b"), "band_idx", "band_hash")
    raw = a.join(b, ["band_idx", "band_hash"]).where(
        F.col("id_a") < F.col("id_b")
    )
    n_raw = raw.count()
    assert n_raw <= BAND_BUCKET_CAP * f  # linear, not quadratic
    assert n_raw >= N_HOT  # the cluster really is hot (not a no-op)

    # component equality vs the full closure (known analytically: every
    # hot doc reaches doc 0; the cold docs are singletons -> unlabeled)
    labels = {
        (r.node, r.component)
        for r in connected_components(band_pairs(bands)).collect()
    }
    assert labels == {(i, 0) for i in range(N_HOT)}


def test_streaming_maintenance_contracts_hot_cluster(spark, tmp_path):
    """The r11 contraction property on the adversarial cluster: when a
    second batch touches a 10^4-member prior component, the CC input
    holds the component's HUB, never its membership — edge count stays
    ~cap·f_batch while the r10 star shape would have injected ~10^4
    member edges. Labels still converge to the full-corpus closure."""
    import wikidatabots_spark.operators.dedup as dd
    from wikidatabots_spark.streaming.docs_stream import (
        dedup_graph_maintenance,
        latest_labels,
    )

    index_path = str(tmp_path / "idx")
    labels_path = str(tmp_path / "lbl")

    # instrument the CC calls BEFORE the sink factory binds them, to
    # measure the edge set each insertion step actually builds
    edge_counts = []
    orig_cc = dd.connected_components

    def counting_cc(edges, *a, **k):
        edge_counts.append(edges.count())
        return orig_cc(edges, *a, **k)

    dd.connected_components = counting_cc
    try:
        sink = dedup_graph_maintenance(index_path, labels_path)
        # batch 0: the whole hot cluster + cold singletons
        sink(_skew_docs(spark, 0, N_HOT), 0)
        # batch 1: 50 more copies of the template touch the prior
        # 10^4-member component
        sink(_skew_docs(spark, N_HOT, N_HOT + 50, cold=False), 1)
    finally:
        dd.connected_components = orig_cc

    # contraction bound on batch 1: 50 probing docs x 4 bands x cap
    # anchors, all collapsing to (new_id, hub) + within-batch pairs —
    # far below the 10^4 member edges the star shape required
    assert len(edge_counts) == 2
    n_edges = edge_counts[-1]
    assert 0 < n_edges <= 4 * 50 * dd.BAND_BUCKET_CAP
    assert n_edges < N_HOT // 2

    got = {
        (r.node, r.component)
        for r in latest_labels(spark, labels_path).collect()
    }
    assert got == {(i, 0) for i in range(N_HOT + 50)}
