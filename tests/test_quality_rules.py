"""Planted-document tests for the Gopher rule battery: the synthetic
corpus is single-line jargon (stop-word rule uniformly false there), so
each rule is proven to flip BOTH ways on crafted documents — including
``keep``, which no corpus row exercises."""

from __future__ import annotations

from wikidatabots_spark.operators.textstats import with_gopher_rules

# 60 words, mean length in [3,10], >80% alphabetic, 2+ stop words,
# no symbols, no bullet/ellipsis lines -> passes every rule
_GOOD = ("the quick brown fox jumps over the lazy dog and runs far " * 6).strip()


def _rules(spark, rows):
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = with_gopher_rules(df).collect()
    return {r["doc_id"]: r.asDict() for r in out}


def test_good_document_passes_all_rules(spark):
    got = _rules(spark, [(1, _GOOD)])[1]
    assert got["keep"] is True
    for k, v in got.items():
        if k.startswith("r_"):
            assert v is True, k


def test_each_rule_fails_on_its_planted_document(spark):
    rows = [
        (1, "too short to pass the word count rule"),  # < 50 words
        (2, ("a " * 60 + "the of").strip()),  # mean word len < 3
        (3, _GOOD + " " + "# " * 20),  # symbol ratio >= 0.1
        (4, "\n".join(f"- {w}" for w in _GOOD.split())),  # all bullet lines
        (5, "\n".join(f"{w}..." for w in _GOOD.split())),  # ellipsis ends
        (6, _GOOD + " " + "42 " * 30),  # < 80% alphabetic words
        (7, ("zork quux blarg fizzle wumpus " * 12).strip()),  # no stops
    ]
    got = _rules(spark, rows)
    expect_fail = {
        1: "r_word_count",
        2: "r_mean_word_len",
        3: "r_symbol_ratio",
        4: "r_bullet_lines",
        5: "r_ellipsis_lines",
        6: "r_alpha_words",
        7: "r_stopwords",
    }
    for doc_id, rule in expect_fail.items():
        assert got[doc_id][rule] is False, (doc_id, rule)
        assert got[doc_id]["keep"] is False, doc_id


def test_unicode_ellipsis_and_integer_thresholds(spark):
    # 'word…' lines: the unicode ellipsis counts like '...'
    text = "\n".join(f"{w}…" for w in _GOOD.split())
    got = _rules(spark, [(1, text)])[1]
    assert got["r_ellipsis_lines"] is False
    # exactly at the boundary: 50 words passes the floor
    fifty = ("the of and " + "word " * 47).strip()
    got = _rules(spark, [(2, fifty)])[2]
    assert got["n_words"] == 50 and got["r_word_count"] is True


def test_empty_text_fails_closed(spark):
    got = _rules(spark, [(1, "")])[1]
    assert got["keep"] is False and got["n_words"] == 0


def test_session_window_boundary_merges_touching_windows(spark):
    """Native session_window merges events whose [ts, ts+gap) windows
    touch: an event landing EXACTLY gap after its predecessor still
    joins the session (so the oracle's island rule is diff > gap, same
    as ev_sessionize's lag rule), while gap + 1s starts a new one."""
    import datetime as dt

    from pyspark.sql import functions as F

    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)
    rows = [
        (1, t0),
        (1, t0 + dt.timedelta(minutes=30)),  # exactly the gap -> merges
        (1, t0 + dt.timedelta(minutes=61)),  # > gap after prev -> new
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp")
    got = (
        df.groupBy("user_id", F.session_window("ts", "30 minutes").alias("sw"))
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("sw.start")
        .collect()
    )
    assert [r["n"] for r in got] == [2, 1]
    # session_end is last-event + gap, not the last event
    assert got[0]["sw"]["end"] == t0 + dt.timedelta(minutes=60)


def test_geometric_noise_distribution_shape(spark):
    """The release mechanism's noise must actually BE geometric(1/2):
    over many seeded draws, |noise|=0 lands ~1/2 of the time, each
    further magnitude halving — the distribution claim behind the
    dq_private_release docstring, pinned statistically."""
    from wikidatabots_spark.plans.quality import _private_release_oracle  # noqa: F401

    import hashlib

    mags = []
    for i in range(4096):
        x = int(hashlib.md5(f"noise:v1:s{i}".encode()).hexdigest()[:12], 16)
        mags.append(47 if x == 0 else 47 - x.bit_length() + 1)
    n = len(mags)
    p0 = sum(1 for m in mags if m == 0) / n
    p1 = sum(1 for m in mags if m == 1) / n
    p2 = sum(1 for m in mags if m == 2) / n
    assert abs(p0 - 0.5) < 0.04
    assert abs(p1 - 0.25) < 0.04
    assert abs(p2 - 0.125) < 0.03


def test_frame_dedup_detects_planted_shared_frame(spark):
    """Two media sharing an identical second half must surface as a
    frame-level match even though their whole-media hashes differ."""
    from pyspark.sql import functions as F

    from wikidatabots_spark.operators.dedup import hamming_near_pairs
    from wikidatabots_spark.operators.multimodal import (
        extract_features,
        perceptual_hash,
        sample_frames,
    )

    # the fake chunker samples frame 1 from [n/2, n/2 + n/4) — plant an
    # identical 20-byte window there in two equal-length (n=80) media
    shared = "SHARED-CLIP-BYTES-XY"  # 20 bytes at offset 40
    rows = [
        (1, "a" * 40 + shared + "b" * 20),
        (2, "c" * 40 + shared + "d" * 20),
        (3, "e" * 80),
    ]
    df = spark.createDataFrame(rows, "media_id long, text string").select(
        "media_id", F.encode("text", "utf-8").alias("data")
    )
    frames = sample_frames(df, every=2)
    ph = perceptual_hash(extract_features(frames, data_col="frame")).select(
        (F.col("media_id") * 16 + F.col("frame_idx")).alias("fid"), "phash"
    )
    pairs = hamming_near_pairs(
        ph, id_col="fid", fp_col="phash", n_slices=4, slice_bits=4, max_hamming=0
    )
    media_pairs = {
        (r["id_a"] // 16, r["id_b"] // 16)
        for r in pairs.collect()
        if r["id_a"] // 16 != r["id_b"] // 16
    }
    assert (1, 2) in media_pairs  # the planted shared frame
