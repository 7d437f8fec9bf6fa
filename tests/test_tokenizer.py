"""Planted BPE-training tests: hand-computed merge sequences, the
greedy-overlap rule, and the lexicographic tie-break — the semantics
the oracle equality alone cannot localize when they break."""

from __future__ import annotations

from pyspark.sql import functions as F

from wikidatabots_spark.plans.tokenizer import _bpe_round


def _vocab(spark, word_counts):
    rows = [
        (w, c, " ".join(w))
        for w, c in word_counts.items()
    ]
    return spark.createDataFrame(rows, "word string, cnt long, sym string")


def test_bpe_picks_most_frequent_pair_and_merges(spark):
    # "ab" appears in every word; weighted freq 5+3+2=10 dominates
    v = _vocab(spark, {"abc": 5, "abd": 3, "ab": 2})
    best, nxt = _bpe_round(v)
    b = best.collect()[0]
    assert (b["pair"], b["freq"]) == ("a b", 10)
    syms = {r["word"]: r["sym"] for r in nxt.collect()}
    assert syms == {"abc": "ab c", "abd": "ab d", "ab": "ab"}


def test_bpe_second_round_uses_merged_symbol(spark):
    v = _vocab(spark, {"abc": 5, "abd": 3})
    _, v1 = _bpe_round(v)
    best2, v2 = _bpe_round(v1)
    b = best2.collect()[0]
    assert (b["pair"], b["freq"]) == ("ab c", 5)
    assert {r["sym"] for r in v2.collect()} == {"abc", "ab d"}


def test_bpe_overlap_is_greedy_leftmost(spark):
    # "aaaa" = a a a a; pair "a a" has multiplicity 3, but greedy
    # non-overlapping application yields "aa aa" (not "aa a a")
    v = _vocab(spark, {"aaaa": 1})
    best, nxt = _bpe_round(v)
    b = best.collect()[0]
    assert (b["pair"], b["freq"]) == ("a a", 3)
    assert nxt.collect()[0]["sym"] == "aa aa"


def test_bpe_tie_breaks_lexicographically(spark):
    # "xy" and "ab" both appear once -> "a b" < "x y" wins the tie
    v = _vocab(spark, {"xy": 1, "ab": 1})
    best, _ = _bpe_round(v)
    assert best.collect()[0]["pair"] == "a b"


def test_bpe_single_symbol_words_emit_no_pairs(spark):
    v = _vocab(spark, {"a": 100, "bc": 1})
    best, nxt = _bpe_round(v)
    assert best.collect()[0]["pair"] == "b c"
    syms = {r["word"]: r["sym"] for r in nxt.collect()}
    assert syms["a"] == "a"  # untouched, still present in the vocab
