"""Round-4d tokenizer wave: byte-pair-encoding merge training as an
oracle-hash-checked query.

BPE training (Sennrich et al. 2016, the tokenizer family behind GPT /
Llama vocabularies) is the canonical "looks iterative, is actually
cheap" pipeline step: after ONE corpus-wide word count, every merge
round runs on the word-frequency table (vocabulary-sized, not
corpus-sized), and the selected merge is a 1-row broadcast. The whole
computation here is deterministic — integer frequencies, lexicographic
tie-break, leftmost-non-overlapping merge application — so a DuckDB
oracle reproduces the training run bit-for-bit.

No reference counterpart (north-star extension, BASELINE.json text
family).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from wikidatabots_spark.plans.registry import register
from wikidatabots_spark.sources.tables import load_table

_BPE_ROUNDS = 3


def _pairs_expr(sym: Column) -> Column:
    """Adjacent symbol pairs of a space-separated symbol string, with
    multiplicity ("a a a" yields ["a a", "a a"]). Guarded: Spark's
    ``sequence(1, 0)`` would count DOWN, so single-symbol words map to
    an explicit empty array (DuckDB's generate_series is already
    empty there)."""
    syms = F.split(sym, " ")
    n = F.size(syms)
    return F.when(
        n >= 2,
        F.transform(
            F.sequence(F.lit(1), n - 1),
            lambda i: F.concat_ws(
                " ", F.element_at(syms, i), F.element_at(syms, i + 1)
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))


def _bpe_round(vocab: DataFrame) -> tuple[DataFrame, DataFrame]:
    """One merge round over the word-frequency table: count adjacent
    pairs weighted by word frequency, pick the (freq DESC, pair ASC)
    winner as a 1-row frame, and apply it with leftmost-non-overlapping
    ``replace`` — exactly the greedy application real BPE trainers use.
    Returns (best_pair_frame, next_vocab); the next vocab is FENCED
    (lazy localCheckpoint) because three consumers read each round's
    table — the next round's pair counts, the merge output, and every
    later round's lineage — and unfenced the corpus-sized word count
    replayed once per round (measured in PLANS.md: 7 scans for 3
    rounds)."""
    from wikidatabots_spark.functions.scale import pushdown_fence

    pair_counts = (
        vocab.select(F.explode(_pairs_expr(F.col("sym"))).alias("pair"), "cnt")
        .groupBy("pair")
        .agg(F.sum("cnt").cast("long").alias("freq"))
    )
    best = pair_counts.orderBy(F.col("freq").desc(), F.col("pair").asc()).limit(1)
    nxt = vocab.crossJoin(
        F.broadcast(best.select(F.col("pair").alias("__p")))
    ).select(
        "word",
        "cnt",
        F.replace(
            F.col("sym"), F.col("__p"), F.replace(F.col("__p"), F.lit(" "), F.lit(""))
        ).alias("sym"),
    )
    return best, pushdown_fence(nxt)


def _bpe_oracle(rounds: int = _BPE_ROUNDS) -> str:
    from wikidatabots_spark.plans.extensions import _WORDS_SQL

    parts = [
        f"""wcnt AS (
    SELECT w AS word, CAST(COUNT(*) AS BIGINT) AS cnt
    FROM (SELECT unnest({_WORDS_SQL}) AS w FROM documents)
    GROUP BY w
),
v0 AS (
    SELECT word, cnt,
           rtrim(regexp_replace(word, '(.)', '\\1 ', 'g')) AS sym
    FROM wcnt
)"""
    ]
    for r in range(rounds):
        parts.append(
            f"""p{r} AS (
    SELECT pair, CAST(SUM(cnt) AS BIGINT) AS freq FROM (
        SELECT unnest(list_transform(
                   generate_series(1, len(string_split(sym, ' ')) - 1),
                   i -> string_split(sym, ' ')[i] || ' '
                        || string_split(sym, ' ')[i + 1])) AS pair,
               cnt
        FROM v{r}
    ) GROUP BY pair
),
b{r} AS (SELECT pair, freq FROM p{r} ORDER BY freq DESC, pair LIMIT 1),
v{r + 1} AS (
    SELECT word, cnt,
           replace(sym, (SELECT pair FROM b{r}),
                   replace((SELECT pair FROM b{r}), ' ', '')) AS sym
    FROM v{r}
)"""
        )
    body = ",\n".join(parts)
    selects = " UNION ALL ".join(
        f"SELECT CAST({r + 1} AS INT) AS merge_rank, pair, freq FROM b{r}"
        for r in range(rounds)
    )
    return f"WITH {body}\n{selects}"


@register("corpus_bpe_train", oracle=_bpe_oracle())
def corpus_bpe_train_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train the first {rounds} BPE merges on the corpus: words ->
    per-character symbol strings, then each round counts adjacent
    symbol pairs weighted by word frequency, merges the most frequent
    pair (ties -> lexicographically smallest), and rewrites the
    vocabulary with leftmost-non-overlapping application. Output is the
    merge table itself — (merge_rank, pair, freq) — the artifact a
    tokenizer ships.

    Engine-exact by construction: integer frequencies, a total
    (freq DESC, pair ASC) selection order, and ``replace`` semantics
    (leftmost, non-overlapping) that Spark and DuckDB share — which is
    also exactly how reference BPE trainers apply a merge greedily.

    Scale: ONE corpus-sized stage total (the word explode+count);
    every merge round after that runs on the WORD-FREQUENCY table —
    vocabulary-sized, orders of magnitude smaller than the corpus and
    independent of corpus growth — and the chosen pair joins back as a
    broadcast 1-row scalar (BroadcastNestedLoopJoin over one row, the
    repo's standard scalar-subquery shape; no CartesianProduct). This
    is the same cost structure as production trainers (HF tokenizers
    trains from a word-count table, not raw text). A FIXED merge
    budget keeps the whole run one static DAG (the k-means/peeling
    rationale); real vocab sizes just raise the round count.
    """
    d = load_table(spark, sf_dir, "documents")
    from wikidatabots_spark.functions.scale import pushdown_fence
    from wikidatabots_spark.operators.textstats import words

    # fence the word-count table: round 1 reads it twice (pair counts +
    # merge application) and it is the only corpus-sized stage
    vocab = pushdown_fence(
        d.select(F.explode(words(F.col("text"))).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
        .select(
            "word",
            "cnt",
            F.rtrim(F.regexp_replace(F.col("word"), "(.)", "$1 ")).alias("sym"),
        )
    )
    merges = []
    for r in range(_BPE_ROUNDS):
        best, vocab = _bpe_round(vocab)
        merges.append(
            best.select(
                F.lit(r + 1).cast("int").alias("merge_rank"), "pair", "freq"
            )
        )
    out = merges[0]
    for m in merges[1:]:
        out = out.unionAll(m)
    return out


# ---------------------------------------------------------------------------
# corpus_bpe_segment — apply the trained merges corpus-wide
# ---------------------------------------------------------------------------


def _bpe_segment_oracle(rounds: int = _BPE_ROUNDS) -> str:
    from wikidatabots_spark.plans.extensions import _WORDS_SQL

    # reuse the training CTE chain; v{rounds} is the post-merge vocab
    train = _bpe_oracle(rounds)
    body = train[len("WITH ") : train.rindex("\nSELECT CAST(1")]
    return f"""
WITH {body},
doc_words AS (
    SELECT doc_id, unnest({_WORDS_SQL}) AS word FROM documents
)
SELECT d.doc_id,
       CAST(SUM(length(v.word)) AS BIGINT) AS n_chars,
       CAST(SUM(len(string_split(v.sym, ' '))) AS BIGINT) AS n_tokens
FROM doc_words d JOIN v{rounds} v ON v.word = d.word
GROUP BY d.doc_id
"""


@register("corpus_bpe_segment", oracle=_bpe_segment_oracle())
def corpus_bpe_segment_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Apply the trained BPE merges corpus-wide: every document's words
    are segmented with the post-merge vocabulary and rolled up to a
    per-document token count (with the pre-merge character count as the
    compression baseline) — the trainer-side half
    (``corpus_bpe_train``) produces the merge table, this query is the
    inference-side half every data pipeline actually runs per batch.

    Scale: the segmentation is a broadcast JOIN against the
    word->symbols vocabulary (vocabulary-sized, the
    ``tokenize_to_ids`` pattern) — the corpus explodes to words once,
    joins the tiny vocab, and aggregates back to doc_id; the text
    column itself never shuffles. At real vocab sizes the same join
    holds (a few hundred thousand rows broadcast in MBs).
    """
    d = load_table(spark, sf_dir, "documents")
    from wikidatabots_spark.functions.scale import pushdown_fence
    from wikidatabots_spark.operators.textstats import words

    # fence the word-count table: round 1 reads it twice (pair counts +
    # merge application) and it is the only corpus-sized stage
    vocab = pushdown_fence(
        d.select(F.explode(words(F.col("text"))).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
        .select(
            "word",
            "cnt",
            F.rtrim(F.regexp_replace(F.col("word"), "(.)", "$1 ")).alias("sym"),
        )
    )
    for _ in range(_BPE_ROUNDS):
        _, vocab = _bpe_round(vocab)
    seg = vocab.select(
        "word",
        F.length("word").cast("long").alias("__wchars"),
        F.size(F.split("sym", " ")).cast("long").alias("__wtokens"),
    )
    doc_words = d.select(
        "doc_id", F.explode(words(F.col("text"))).alias("word")
    )
    return (
        doc_words.join(F.broadcast(seg), "word")
        .groupBy("doc_id")
        .agg(
            F.sum("__wchars").cast("long").alias("n_chars"),
            F.sum("__wtokens").cast("long").alias("n_tokens"),
        )
    )


# ---------------------------------------------------------------------------
# corpus_bpe_compression — tokens-per-merge-round compression curve
# ---------------------------------------------------------------------------


def _bpe_compression_oracle(rounds: int = _BPE_ROUNDS) -> str:
    train = _bpe_oracle(rounds)
    body = train[len("WITH ") : train.rindex("\nSELECT CAST(1")]
    selects = " UNION ALL ".join(
        f"SELECT CAST({r} AS INT) AS merge_round, "
        f"CAST((SELECT SUM(cnt * len(string_split(sym, ' '))) FROM v{r}) "
        f"AS BIGINT) AS total_tokens"
        for r in range(rounds + 1)
    )
    return f"WITH {body}\n{selects}"


@register("corpus_bpe_compression", oracle=_bpe_compression_oracle())
def corpus_bpe_compression_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The BPE compression curve: corpus-weighted total token count
    after 0..{rounds} merges — the measurement that justifies (or caps)
    a merge budget, and the tokenizer-family analog of the other
    calibration queries: train is hash-checked, apply is hash-checked,
    and now the BENEFIT per merge is a gated number too (each merge
    must strictly reduce the total by its winning pair's frequency —
    the identity total_r = total_{r-1} - freq_r, which the driver's
    hash implicitly verifies across rows).

    Scale: the same one-corpus-stage/vocab-sized-rounds cost as
    training — the per-round totals are single-row aggregates of the
    (fenced) vocabulary table.
    """
    from wikidatabots_spark.functions.scale import pushdown_fence
    from wikidatabots_spark.operators.textstats import words

    d = load_table(spark, sf_dir, "documents")
    vocab = pushdown_fence(
        d.select(F.explode(words(F.col("text"))).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
        .select(
            "word",
            "cnt",
            F.rtrim(F.regexp_replace(F.col("word"), "(.)", "$1 ")).alias("sym"),
        )
    )
    totals = []
    for r in range(_BPE_ROUNDS + 1):
        totals.append(
            vocab.agg(
                F.sum(
                    F.col("cnt") * F.size(F.split("sym", " "))
                ).cast("long").alias("total_tokens")
            ).select(F.lit(r).cast("int").alias("merge_round"), "total_tokens")
        )
        if r < _BPE_ROUNDS:
            _, vocab = _bpe_round(vocab)
    out = totals[0]
    for t in totals[1:]:
        out = out.unionAll(t)
    return out


# ---------------------------------------------------------------------------
# corpus_vocab_coverage — OOV-rate curve for vocabulary sizing
# ---------------------------------------------------------------------------

_COVERAGE_CUTS = [10, 100, 1000, 10000]


def _vocab_coverage_oracle() -> str:
    from wikidatabots_spark.plans.extensions import _WORDS_SQL

    cuts = ", ".join(str(c) for c in _COVERAGE_CUTS)
    return f"""
WITH wcnt AS (
    SELECT w AS word, CAST(COUNT(*) AS BIGINT) AS cnt
    FROM (SELECT unnest({_WORDS_SQL}) AS w FROM documents)
    GROUP BY w
),
ranked AS (
    SELECT word, cnt,
           row_number() OVER (ORDER BY cnt DESC, word) AS rn,
           SUM(cnt) OVER () AS total
    FROM wcnt
),
cum AS (
    SELECT rn, total,
           SUM(cnt) OVER (ORDER BY rn ROWS UNBOUNDED PRECEDING) AS covered
    FROM ranked
)
SELECT CAST(k AS BIGINT) AS vocab_size,
       CAST(COALESCE(MAX(CASE WHEN rn <= k THEN covered END), 0) AS BIGINT)
           AS covered_tokens,
       CAST(MAX(total) AS BIGINT) AS total_tokens,
       CAST((COALESCE(MAX(CASE WHEN rn <= k THEN covered END), 0) * 1000000)
           // MAX(total) AS BIGINT) AS covered_ppm
FROM cum, (SELECT unnest([{cuts}]) AS k)
GROUP BY k
"""


@register("corpus_vocab_coverage", oracle=_vocab_coverage_oracle())
def corpus_vocab_coverage_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The vocabulary-sizing curve: for each candidate vocab size k,
    the fraction of all corpus tokens covered by the top-k words (by
    frequency, ties lexicographic) in integer parts-per-million — the
    complement of the OOV/UNK rate that ``tokenize_to_ids`` realizes
    at its chosen k, measured BEFORE committing to a vocabulary. A k
    beyond the distinct-word count covers everything (the curve
    saturates — the cut list deliberately overshoots).

    Scale (VERDICT r5 next #1): one corpus word count; the rank AND the
    running coverage ride ``bucketed_global_rank`` bucketed by the
    frequency value itself (monotone along the cnt-desc order; ties on
    cnt share a bucket and order by word within it) — vocabulary-scale
    windows are partitioned by frequency, only the |distinct
    frequencies| ledger (Zipf: ~sqrt of the vocab) serializes; the
    grand total is a broadcast 1-row aggregate and the cut evaluation
    is |cuts| rows.
    """
    from wikidatabots_spark.functions.scale import (
        bucketed_global_rank,
        pushdown_fence,
    )
    from wikidatabots_spark.operators.textstats import words

    d = load_table(spark, sf_dir, "documents")
    # fence: wcnt feeds the frequency ledger, the fact side, and the
    # grand-total aggregate — one corpus tokenize pass, not three
    wcnt = pushdown_fence(
        d.select(F.explode(words(F.col("text"))).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )
    tot = wcnt.agg(F.sum("cnt").cast("long").alias("total"))
    ranked = bucketed_global_rank(
        wcnt,
        bucket=F.col("cnt"),
        order=[F.col("cnt").desc(), F.col("word").asc()],
        descending=True,
        rn="rn",
        running_sum=F.col("cnt"),
        running_sum_out="covered",
    ).crossJoin(F.broadcast(tot))
    cuts = F.explode(
        F.array(*[F.lit(c).cast("long") for c in _COVERAGE_CUTS])
    ).alias("vocab_size")
    return (
        ranked.select("rn", "total", "covered", cuts)
        .groupBy("vocab_size")
        .agg(
            F.coalesce(
                F.max(F.when(F.col("rn") <= F.col("vocab_size"), F.col("covered"))),
                F.lit(0),
            ).cast("long").alias("covered_tokens"),
            F.max("total").cast("long").alias("total_tokens"),
        )
        .withColumn(
            "covered_ppm", F.expr("covered_tokens * 1000000 div total_tokens")
        )
    )
