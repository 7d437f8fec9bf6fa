"""Oracle-checked queries for the north-star extension operators
(dedup / similarity / text analysis — BASELINE.json).

The MinHash design note: hash_i(token) = md5('<i>:' || token) compared as
*strings* — MIN over strings is engine-agnostic, so even the LSH pipeline
is exactly reproducible in DuckDB. No RNG, no JVM-specific hashing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from wikidatabots_spark.operators.dedup import (
    BAND_BUCKET_CAP,
    dedup_exact,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
)
from wikidatabots_spark.operators.similarity import knn_brute
from wikidatabots_spark.operators.textstats import (
    with_fingerprint,
    with_lang_guess,
    with_quality,
    with_token_count,
)
from wikidatabots_spark.plans.registry import register
from wikidatabots_spark.sources.tables import load_table

# 3-word shingles, matching operators.dedup.shingles(n=3)
_TOK_SQL = """
tok AS (
    SELECT DISTINCT doc_id, token FROM (
        SELECT doc_id,
               unnest(list_transform(
                   generate_series(1, greatest(len(wl) - 2, 0)),
                   i -> wl[i] || ' ' || wl[i+1] || ' ' || wl[i+2])) AS token
        FROM (
            SELECT doc_id,
                   list_filter(string_split_regex(lower(text), '\\s+'),
                               x -> x != '') AS wl
            FROM documents
        )
    )
)
"""


@register(
    "dedup_exact",
    oracle="""
SELECT md5(text) AS text_hash,
       MIN(doc_id) AS canonical_id,
       COUNT(*) AS n_copies
FROM documents
GROUP BY md5(text)
""",
)
def dedup_exact_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dedup_exact(load_table(spark, sf_dir, "documents"))


_MINHASH_STACKED_SQL = """
sig AS (
    SELECT doc_id,
           MIN(md5('0:' || token)) AS mh0, MIN(md5('1:' || token)) AS mh1,
           MIN(md5('2:' || token)) AS mh2, MIN(md5('3:' || token)) AS mh3,
           MIN(md5('4:' || token)) AS mh4, MIN(md5('5:' || token)) AS mh5,
           MIN(md5('6:' || token)) AS mh6, MIN(md5('7:' || token)) AS mh7
    FROM tok GROUP BY doc_id
),
banded AS (
    SELECT doc_id,
           md5(mh0 || '|' || mh1) AS band0, md5(mh2 || '|' || mh3) AS band1,
           md5(mh4 || '|' || mh5) AS band2, md5(mh6 || '|' || mh7) AS band3
    FROM sig
),
stacked AS (
    SELECT doc_id, 0 AS band_idx, band0 AS band_hash FROM banded
    UNION ALL SELECT doc_id, 1, band1 FROM banded
    UNION ALL SELECT doc_id, 2, band2 FROM banded
    UNION ALL SELECT doc_id, 3, band3 FROM banded
)
"""

# Anchor cap mirroring operators.dedup.BAND_BUCKET_CAP: only the cap
# lowest-id members of a (band_idx, band_hash) bucket emit pairs as the
# LEFT side — bounds a hot bucket's pair output at cap·f instead of
# f²/2; CC transitivity recovers the full cluster. Composes after
# _MINHASH_STACKED_SQL in any oracle that self-joins the band table.
_MINHASH_ANCHORS_SQL = f"""
anchors AS (
    SELECT doc_id, band_idx, band_hash FROM (
        SELECT doc_id, band_idx, band_hash,
               row_number() OVER (PARTITION BY band_idx, band_hash
                                  ORDER BY doc_id) AS rk
        FROM stacked
    ) WHERE rk <= {BAND_BUCKET_CAP}
)
"""

_MINHASH_ORACLE = f"""
WITH {_TOK_SQL},
sig AS (
    SELECT doc_id,
           MIN(md5('0:' || token)) AS mh0, MIN(md5('1:' || token)) AS mh1,
           MIN(md5('2:' || token)) AS mh2, MIN(md5('3:' || token)) AS mh3,
           MIN(md5('4:' || token)) AS mh4, MIN(md5('5:' || token)) AS mh5,
           MIN(md5('6:' || token)) AS mh6, MIN(md5('7:' || token)) AS mh7
    FROM tok GROUP BY doc_id
),
banded AS (
    SELECT doc_id,
           md5(mh0 || '|' || mh1) AS band0, md5(mh2 || '|' || mh3) AS band1,
           md5(mh4 || '|' || mh5) AS band2, md5(mh6 || '|' || mh7) AS band3
    FROM sig
),
stacked AS (
    SELECT doc_id, 0 AS band_idx, band0 AS band_hash FROM banded
    UNION ALL SELECT doc_id, 1, band1 FROM banded
    UNION ALL SELECT doc_id, 2, band2 FROM banded
    UNION ALL SELECT doc_id, 3, band3 FROM banded
),
anchors AS (
    SELECT doc_id, band_idx, band_hash FROM (
        SELECT doc_id, band_idx, band_hash,
               row_number() OVER (PARTITION BY band_idx, band_hash
                                  ORDER BY doc_id) AS rk
        FROM stacked
    ) WHERE rk <= {BAND_BUCKET_CAP}
)
SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS n_shared_bands
FROM anchors a
JOIN stacked b
  ON a.band_idx = b.band_idx AND a.band_hash = b.band_hash
 AND a.doc_id < b.doc_id
GROUP BY a.doc_id, b.doc_id
"""


@register("dedup_minhash_lsh", oracle=_MINHASH_ORACLE)
def dedup_minhash_lsh_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    return minhash_lsh_pairs(
        load_table(spark, sf_dir, "documents"), num_hashes=8, bands=4
    )


_JACCARD_ORACLE = f"""
WITH {_TOK_SQL},
sizes AS (SELECT doc_id, COUNT(*) AS set_size FROM tok GROUP BY doc_id),
dfreq AS (SELECT token, COUNT(*) AS df FROM tok GROUP BY token),
rare AS (
    SELECT t.doc_id, t.token
    FROM tok t JOIN dfreq USING (token)
    WHERE df <= ceil(0.2 * (SELECT COUNT(*) FROM documents))
),
inter AS (
    SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS inter
    FROM rare a
    JOIN rare b ON a.token = b.token AND a.doc_id < b.doc_id
    GROUP BY a.doc_id, b.doc_id
)
SELECT id_a, id_b,
       CAST(inter AS DOUBLE) / (sa.set_size + sb.set_size - inter) AS jaccard
FROM inter
JOIN sizes sa ON sa.doc_id = id_a
JOIN sizes sb ON sb.doc_id = id_b
WHERE CAST(inter AS DOUBLE) / (sa.set_size + sb.set_size - inter) >= 0.4
"""


@register("dedup_ngram_jaccard", oracle=_JACCARD_ORACLE)
def dedup_ngram_jaccard_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """max_df is relative (0.2 of corpus doc count — ceil(0.2·500)=100 at
    sf0.01, identical to the r1 absolute cut) so the rare-token prefix
    filter scales with the corpus instead of silently tightening."""
    return ngram_jaccard_pairs(
        load_table(spark, sf_dir, "documents"), threshold=0.4, max_df=0.2
    )


_KNN_ORACLE = """
WITH q AS (
    SELECT vec_id AS query_id, embedding AS q_vec FROM embeddings WHERE vec_id < 20
),
c AS (SELECT vec_id AS neighbor_id, embedding AS c_vec FROM embeddings),
norms AS (
    SELECT vec_id, sqrt(SUM(CAST(embedding[i] AS DOUBLE) * CAST(embedding[i] AS DOUBLE)))
               AS nrm
    FROM embeddings, generate_series(1, 64) t(i)
    GROUP BY vec_id
),
dots AS (
    SELECT q.query_id, c.neighbor_id,
           SUM(CAST(q.q_vec[i] AS DOUBLE) * CAST(c.c_vec[i] AS DOUBLE)) AS dot
    FROM q, c, generate_series(1, 64) t(i)
    WHERE q.query_id != c.neighbor_id
    GROUP BY q.query_id, c.neighbor_id
),
scored AS (
    SELECT d.query_id, d.neighbor_id,
           d.dot / (nq.nrm * nc.nrm) AS sim
    FROM dots d
    JOIN norms nq ON nq.vec_id = d.query_id
    JOIN norms nc ON nc.vec_id = d.neighbor_id
),
ranked AS (
    SELECT query_id, neighbor_id,
           row_number() OVER (PARTITION BY query_id
                              ORDER BY sim DESC, neighbor_id) AS rank
    FROM scored
)
SELECT query_id, neighbor_id, CAST(rank AS INT) AS rank
FROM ranked WHERE rank <= 5
"""


@register("knn_cosine_topk", oracle=_KNN_ORACLE)
def knn_cosine_topk_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    out = knn_brute(emb.where(F.col("vec_id") < 20), emb, k=5)
    return out.withColumn("rank", F.col("rank").cast("int"))


def _knn_lsh_oracle(
    dim: int = 64, bits: int = 6, tables: int = 2, k: int = 5
) -> str:
    """DuckDB replication of ``knn_lsh``'s EXACT semantics — approximate
    vs brute force, but fully DETERMINISTIC: the SRP hyperplanes are
    md5-derived driver-side literals, so the oracle embeds the same
    2×6×64 coefficients, rebuilds the buckets, and re-ranks the same
    candidate set (closes the last rows-only kNN gap, VERDICT r9 #9;
    the margin is safe — the smallest |projection| over every vector ×
    plane at sf0.001/0.01/0.1 is ≥ 4.0e-5, ten orders above the
    cross-engine summation-order noise, so no sign can flip)."""
    from wikidatabots_spark.operators.similarity import _srp_plane

    rows = []
    for t in range(tables):
        for b in range(bits):
            coefs = ", ".join(repr(_srp_plane(t, b, d)) for d in range(dim))
            rows.append(f"({t}, {b}, [{coefs}])")
    planes_values = ",\n    ".join(rows)
    return f"""
WITH planes(tbl, bit, coefs) AS (VALUES
    {planes_values}
),
proj AS (
    SELECT e.vec_id, p.tbl, p.bit,
           SUM(CAST(e.embedding[i] AS DOUBLE) * p.coefs[i]) AS proj
    FROM embeddings e, planes p, generate_series(1, {dim}) t(i)
    GROUP BY e.vec_id, p.tbl, p.bit
),
buckets AS (
    SELECT vec_id, tbl,
           CAST(SUM(CASE WHEN proj >= 0 THEN 1 << bit ELSE 0 END) AS BIGINT)
               AS bucket
    FROM proj GROUP BY vec_id, tbl
),
cand AS (
    SELECT DISTINCT q.vec_id AS query_id, c.vec_id AS neighbor_id
    FROM buckets q
    JOIN buckets c ON q.tbl = c.tbl AND q.bucket = c.bucket
    WHERE q.vec_id < 20 AND c.vec_id != q.vec_id
),
norms AS (
    SELECT vec_id,
           sqrt(SUM(CAST(embedding[i] AS DOUBLE) * CAST(embedding[i] AS DOUBLE)))
               AS nrm
    FROM embeddings, generate_series(1, {dim}) t(i)
    GROUP BY vec_id
),
dots AS (
    SELECT cd.query_id, cd.neighbor_id,
           SUM(CAST(eq.embedding[i] AS DOUBLE) * CAST(ec.embedding[i] AS DOUBLE))
               AS dot
    FROM cand cd
    JOIN embeddings eq ON eq.vec_id = cd.query_id
    JOIN embeddings ec ON ec.vec_id = cd.neighbor_id,
    generate_series(1, {dim}) t(i)
    GROUP BY cd.query_id, cd.neighbor_id
),
ranked AS (
    SELECT query_id, neighbor_id,
           row_number() OVER (PARTITION BY query_id
                              ORDER BY dot / (nq.nrm * nc.nrm) DESC,
                                       neighbor_id) AS rank
    FROM dots d
    JOIN norms nq ON nq.vec_id = d.query_id
    JOIN norms nc ON nc.vec_id = d.neighbor_id
)
SELECT query_id, neighbor_id, CAST(rank AS INT) AS rank
FROM ranked WHERE rank <= {k}
"""


@register("knn_lsh_topk", oracle=_knn_lsh_oracle())
def knn_lsh_topk_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SRP-bucketed approximate top-k — approximate RELATIVE TO brute
    force, but deterministic end to end (md5-derived hyperplanes, exact
    re-rank), so since r10 the driver HASH-CHECKS it against a DuckDB
    program that rebuilds the same buckets from the same coefficient
    literals and re-ranks the same candidates (previously rows-only)."""
    from wikidatabots_spark.operators.similarity import knn_lsh

    emb = load_table(spark, sf_dir, "embeddings")
    return knn_lsh(emb.where(F.col("vec_id") < 20), emb, k=5, dim=64)


_WORDS_SQL = "list_filter(string_split_regex(lower(text), '\\s+'), x -> x != '')"

_TOKEN_COUNT_ORACLE = f"""
SELECT doc_id,
       CAST(len({_WORDS_SQL}) AS BIGINT) AS n_words,
       CAST(len(regexp_extract_all(lower(text),
                '[a-z]+|[0-9]+|[^a-z0-9\\s]', 0)) AS BIGINT) AS n_subtokens
FROM documents
"""


@register("text_token_count", oracle=_TOKEN_COUNT_ORACLE)
def text_token_count_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return with_token_count(d).select("doc_id", "n_words", "n_subtokens")


_QUALITY_ORACLE = f"""
WITH feat AS (
    SELECT doc_id,
           {_WORDS_SQL} AS w,
           length(text) AS nc,
           length(regexp_replace(text, '[^.,!?;:]', '', 'g')) AS np
    FROM documents
),
feat2 AS (
    SELECT doc_id,
           len(w) AS nw,
           nc, np,
           len(list_filter(w, x -> x IN ('the','a','an','of','to','and','in','is','on','for')))
               AS ns
    FROM feat
)
SELECT doc_id,
       CAST(nw AS BIGINT) AS n_words,
       CAST(np AS BIGINT) AS n_punct,
       CAST(ns AS BIGINT) AS n_stopwords,
       CASE WHEN nw > 0 THEN CAST(nc - (nw - 1) AS DOUBLE) / nw ELSE 0.0 END
           AS avg_word_len,
       CASE WHEN nw > 0 THEN CAST(ns AS DOUBLE) / nw ELSE 0.0 END AS stopword_ratio,
       CASE WHEN nc > 0 THEN CAST(np AS DOUBLE) / nc ELSE 0.0 END AS punct_ratio,
       least(CAST(nw AS DOUBLE) / 100.0, 1.0) * 0.5
         + (CASE WHEN nw > 0 THEN CAST(ns AS DOUBLE) / nw ELSE 0.0 END) * 0.3
         + (1.0 - (CASE WHEN nc > 0 THEN CAST(np AS DOUBLE) / nc ELSE 0.0 END)) * 0.2
           AS quality
FROM feat2
"""


@register("text_quality", oracle=_QUALITY_ORACLE)
def text_quality_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return with_quality(d).select(
        "doc_id",
        "n_words",
        "n_punct",
        "n_stopwords",
        "avg_word_len",
        "stopword_ratio",
        "punct_ratio",
        "quality",
    )


_LANGID_ORACLE = f"""
WITH feat AS (
    SELECT doc_id, {_WORDS_SQL} AS w FROM documents
),
scores AS (
    SELECT doc_id,
           len(list_filter(w, x -> x IN ('the','and','of','to','is'))) AS s_en,
           len(list_filter(w, x -> x IN ('el','la','de','que','y'))) AS s_es,
           len(list_filter(w, x -> x IN ('le','la','et','les','des'))) AS s_fr,
           len(list_filter(w, x -> x IN ('der','die','und','das','ist'))) AS s_de
    FROM feat
)
SELECT doc_id,
       CASE WHEN greatest(s_en, s_es, s_fr, s_de) = 0 THEN 'und'
            WHEN s_en = greatest(s_en, s_es, s_fr, s_de) THEN 'en'
            WHEN s_es = greatest(s_en, s_es, s_fr, s_de) THEN 'es'
            WHEN s_fr = greatest(s_en, s_es, s_fr, s_de) THEN 'fr'
            ELSE 'de' END AS lang_guess
FROM scores
"""


@register("text_langid", oracle=_LANGID_ORACLE)
def text_langid_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return with_lang_guess(d).select("doc_id", "lang_guess")


_FINGERPRINT_ORACLE = """
SELECT doc_id,
       md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS fingerprint
FROM documents
"""


@register("text_fingerprint", oracle=_FINGERPRINT_ORACLE)
def text_fingerprint_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return with_fingerprint(d).select("doc_id", "fingerprint")


_PROFILE_ORACLE = f"""
WITH tc AS ({_TOKEN_COUNT_ORACLE}),
qual AS ({_QUALITY_ORACLE}),
lng AS ({_LANGID_ORACLE}),
fpr AS ({_FINGERPRINT_ORACLE})
SELECT tc.doc_id, tc.n_words, tc.n_subtokens,
       qual.n_punct, qual.n_stopwords, qual.avg_word_len,
       qual.stopword_ratio, qual.punct_ratio, qual.quality,
       lng.lang_guess, fpr.fingerprint
FROM tc
JOIN qual ON qual.doc_id = tc.doc_id
JOIN lng ON lng.doc_id = tc.doc_id
JOIN fpr ON fpr.doc_id = tc.doc_id
"""


@register("text_profile", oracle=_PROFILE_ORACLE)
def text_profile_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All four text-analysis operators composed into one per-document
    profile (tokens + quality + language + fingerprint) — the shape a real
    corpus-curation pipeline materializes in one pass. One narrow map per
    document, no shuffle; also keeps every textstats operator inside the
    driver's capped correctness window via a single registry slot."""
    d = load_table(spark, sf_dir, "documents")
    out = with_fingerprint(with_lang_guess(with_quality(with_token_count(d))))
    return out.select(
        "doc_id",
        "n_words",
        "n_subtokens",
        "n_punct",
        "n_stopwords",
        "avg_word_len",
        "stopword_ratio",
        "punct_ratio",
        "quality",
        "lang_guess",
        "fingerprint",
    )


# ---------------------------------------------------------------------------
# Embedding near-dup pairs + multimodal plumbing as first-class queries
# ---------------------------------------------------------------------------

_EMB_DUP_ORACLE = """
WITH norms AS (
    SELECT vec_id,
           sqrt(SUM(CAST(embedding[i] AS DOUBLE) * CAST(embedding[i] AS DOUBLE)))
               AS nrm
    FROM embeddings, generate_series(1, 64) t(i)
    GROUP BY vec_id
),
dots AS (
    SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           SUM(CAST(a.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE))
               AS dot
    FROM embeddings a, embeddings b, generate_series(1, 64) t(i)
    WHERE a.vec_id < b.vec_id
    GROUP BY a.vec_id, b.vec_id
)
SELECT id_a, id_b
FROM dots
JOIN norms na ON na.vec_id = id_a
JOIN norms nb ON nb.vec_id = id_b
WHERE dot / (na.nrm * nb.nrm) >= 0.45
"""


@register("dedup_embedding_cosine", oracle=_EMB_DUP_ORACLE)
def dedup_embedding_cosine_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup pairs (threshold tuned to this corpus'
    similarity ceiling of ~0.51 so the operator produces rows).

    Runs the blocked-BLAS execution (block-grid join + vectorized numpy
    matmul per cell), not the row-level triangular join the r1 registry
    used. Why not LSH with this oracle: at threshold 0.45 on 64-dim
    embeddings the requested pairs sit ~3.6σ inside the random-pair noise
    floor (pair cosine std ≈ 1/√dim ≈ 0.125; the corpus' true pairs span
    0.456-0.513) — the SRP collision-probability gap that makes banding
    sublinear vanishes, and any recall-complete banding degenerates to
    all-pairs. A threshold that low is an analytical all-pairs query, so
    the honest plan is the best-constant exact one; the production
    near-dup path (real thresholds ≥0.9) is ``dedup_embedding_cosine_lsh``
    below, which IS a bucket equi-join."""
    from wikidatabots_spark.operators.similarity import embedding_dup_pairs_blocked

    return embedding_dup_pairs_blocked(
        load_table(spark, sf_dir, "embeddings"), threshold=0.45
    )


# Deterministic planted near-duplicates: every vector gets a copy shifted
# by ±s per coordinate (sign = md5 hex-digit parity of "vec_id:block"),
# giving cosine ≈ 1 − 32·s² ≈ 0.9998 to its original — far above the 0.98
# threshold, while unrelated pairs stay ≤ ~0.52. Both engines build the
# corpus bit-identically (float32→float64 cast + double arithmetic), so
# the LSH path must return EXACTLY the planted pairs to hash-match.
_EMB_PERT_SCALE = 0.0018
_EMB_DUP_OFFSET = 1_000_000

_PERT_SQL = f"""
corpus AS (
    SELECT vec_id,
           list_transform(generate_series(1, 64),
                          i -> CAST(embedding[i] AS DOUBLE)) AS v
    FROM embeddings
    UNION ALL
    SELECT vec_id + {_EMB_DUP_OFFSET},
           list_transform(generate_series(1, 64),
               i -> CAST(embedding[i] AS DOUBLE)
                    + CAST({_EMB_PERT_SCALE} AS DOUBLE) *
                      (((strpos('0123456789abcdef',
                                substr(md5(CAST(vec_id AS VARCHAR) || ':' ||
                                           CAST((i - 1) // 32 AS VARCHAR)),
                                       ((i - 1) % 32) + 1, 1)) - 1) % 2) * 2 - 1))
    FROM embeddings
)
"""

_EMB_LSH_ORACLE = f"""
WITH {_PERT_SQL},
norms AS (
    SELECT vec_id, sqrt(SUM(v[i] * v[i])) AS nrm
    FROM corpus, generate_series(1, 64) t(i)
    GROUP BY vec_id
),
dots AS (
    SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           SUM(a.v[i] * b.v[i]) AS dot
    FROM corpus a, corpus b, generate_series(1, 64) t(i)
    WHERE a.vec_id < b.vec_id
    GROUP BY a.vec_id, b.vec_id
)
SELECT id_a, id_b
FROM dots
JOIN norms na ON na.vec_id = id_a
JOIN norms nb ON nb.vec_id = id_b
WHERE dot / (na.nrm * nb.nrm) >= 0.98
"""


def _planted_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """embeddings ∪ perturbed copies — Spark twin of ``_PERT_SQL``."""
    emb = load_table(spark, sf_dir, "embeddings")
    base = emb.select(
        "vec_id",
        F.transform("embedding", lambda x: x.cast("double")).alias("embedding"),
    )

    def parity(md5col, j: int):  # j: literal hex position 1..32
        d = F.conv(F.substring(md5col, j, 1), 16, 10).cast("int")
        return (d % 2) * 2 - 1

    m0 = F.md5(F.concat(F.col("vec_id").cast("string"), F.lit(":0")))
    m1 = F.md5(F.concat(F.col("vec_id").cast("string"), F.lit(":1")))
    signs = F.array(
        *[parity(m0, j) for j in range(1, 33)],
        *[parity(m1, j) for j in range(1, 33)],
    )
    pert = emb.select(
        (F.col("vec_id") + F.lit(_EMB_DUP_OFFSET)).alias("vec_id"),
        F.zip_with(
            F.transform("embedding", lambda x: x.cast("double")),
            signs,
            lambda x, h: x + F.lit(_EMB_PERT_SCALE) * h.cast("double"),
        ).alias("embedding"),
    )
    return base.unionByName(pert)


@register("dedup_embedding_cosine_lsh", oracle=_EMB_LSH_ORACLE)
def dedup_embedding_cosine_lsh_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """THE production embedding-dedup path: SRP-banded candidate
    generation (bucket equi-join on (table, bucket) — no all-pairs stage
    anywhere in the plan) + exact cosine verify, hash-checked against a
    DuckDB brute-force oracle over the identical planted-duplicate corpus.
    Banding: 8 tables × 16 bits ⇒ miss probability ~1e-8 per planted pair
    (cos ≈ 0.9998, per-bit flip prob 0.0064), while random pairs collide
    on a 16-bit band at 8·2⁻¹⁶ ≈ 1e-4 — the candidate set is essentially
    just the true pairs, so the verify stage is O(dups) not O(n²)."""
    from wikidatabots_spark.operators.similarity import embedding_dup_pairs_lsh

    return embedding_dup_pairs_lsh(
        _planted_corpus(spark, sf_dir), threshold=0.98, dim=64, bits=16, tables=8
    )


_EMB_DELETE_ORACLE = f"""
WITH {_PERT_SQL},
kept AS (SELECT * FROM corpus WHERE vec_id % 10 != 3),
norms AS (
    SELECT vec_id, sqrt(SUM(v[i] * v[i])) AS nrm
    FROM kept, generate_series(1, 64) t(i)
    GROUP BY vec_id
),
dots AS (
    SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           SUM(a.v[i] * b.v[i]) AS dot
    FROM kept a, kept b, generate_series(1, 64) t(i)
    WHERE a.vec_id < b.vec_id
    GROUP BY a.vec_id, b.vec_id
)
SELECT id_a, id_b
FROM dots
JOIN norms na ON na.vec_id = id_a
JOIN norms nb ON nb.vec_id = id_b
WHERE dot / (na.nrm * nb.nrm) >= 0.98
"""


@register("dedup_embedding_delete", oracle=_EMB_DELETE_ORACLE)
def dedup_embedding_delete_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-2 DELETION maintenance on the embedding side (the SRP twin of
    ``dedup_components_delete``): the corpus holds a persisted FULL SRP
    band index and yesterday's verified near-dup pairs; a takedown batch
    (vec_id ≡ 3 mod 10 — hitting originals AND planted copies, so both
    pair orientations exercise the tombstone) is anti-joined out and
    ONLY the SRP buckets that contained a deleted vector re-generate
    capped candidates among their survivors; genuinely fresh candidates
    verify with the exact cosine. The oracle is the brute-force
    recompute over the post-deletion corpus: hash-equality is the
    theorem that the bounded bucket-local repair loses nothing
    (anchor ranks only promote under deletion, so every surviving
    pair's generating anchor survives)."""
    from wikidatabots_spark.functions.scale import pushdown_fence
    from wikidatabots_spark.operators.similarity import (
        embedding_dup_pairs_lsh,
        embedding_pairs_after_delete,
        srp_index,
    )

    corpus = _planted_corpus(spark, sf_dir)
    # "persisted" state, fenced: the full index feeds the tombstone
    # anti-join, the affected-bucket semi-join, the re-pair legs, AND
    # yesterday's pair rebuild (passed via index= so the SRP signature
    # UDF stage runs exactly once in the whole plan)
    stacked = pushdown_fence(
        srp_index(corpus, dim=64, bits=16, tables=8)
    )
    pairs = pushdown_fence(
        embedding_dup_pairs_lsh(
            corpus, threshold=0.98, dim=64, bits=16, tables=8,
            index=stacked,
        )
    )
    deletes = corpus.select("vec_id").where(F.col("vec_id") % 10 == 3)
    return embedding_pairs_after_delete(
        corpus, stacked, pairs, deletes, threshold=0.98
    )


_MM_META_ORACLE = """
SELECT doc_id AS media_id,
       CAST(octet_length(CAST(text AS BLOB)) AS BIGINT) AS size_bytes,
       sha256(text) AS sha256
FROM documents
"""


@register("mm_media_meta", oracle=_MM_META_ORACLE)
def mm_media_meta_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal metadata over a binary column (documents' text bytes
    stand in for media blobs — testdata ships no real media). JVM-side
    length + sha256; the hash matches DuckDB's sha256(varchar) because
    both hash the UTF-8 bytes."""
    from wikidatabots_spark.operators.multimodal import with_media_meta

    d = load_table(spark, sf_dir, "documents").select(
        F.col("doc_id").alias("media_id"),
        F.encode(F.col("text"), "UTF-8").alias("data"),
    )
    return with_media_meta(d).select("media_id", "size_bytes", "sha256")


# The frame sampler chunks BYTES; documents.text is ASCII at every SF
# (verified sf0.01 + sf0.1), so DuckDB's character-based substr slices the
# identical bytes and sha256(varchar) hashes them. every=2, chunk=n//4
# exactly mirrors operators.multimodal._fake_frames.
_MM_FRAMES_ORACLE = """
WITH b AS (
    SELECT doc_id AS media_id, text,
           length(text) AS n,
           greatest(length(text) // 4, 1) AS chunk
    FROM documents
),
starts AS (
    SELECT media_id, text, chunk,
           unnest(generate_series(0, n - 1, 2 * chunk)) AS s
    FROM b
)
SELECT media_id,
       CAST(s // (2 * chunk) AS BIGINT) AS frame_idx,
       sha256(substr(text, CAST(s AS BIGINT) + 1, CAST(chunk AS BIGINT)))
           AS frame_sha256,
       CAST(length(substr(text, CAST(s AS BIGINT) + 1, CAST(chunk AS BIGINT)))
           AS BIGINT) AS frame_len
FROM starts
"""


@register("mm_sample_frames", oracle=_MM_FRAMES_ORACLE)
def mm_sample_frames_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """mapInPandas frame fan-out over binary media (deterministic fake
    chunker standing in for the container-absent media decoder).

    The registered projection digests each frame (sha256 + byte length)
    instead of shipping raw binary through the compare: the fake chunker
    is pure substring arithmetic, so DuckDB reproduces every frame byte
    and the digest pins them exactly — this row is hash-checked, not
    rows-only (VERDICT r2 'what's wrong' #1)."""
    from wikidatabots_spark.operators.multimodal import sample_frames

    d = load_table(spark, sf_dir, "documents").select(
        F.col("doc_id").alias("media_id"),
        F.encode(F.col("text"), "UTF-8").alias("data"),
    )
    frames = sample_frames(d, every=2)
    return frames.select(
        "media_id",
        "frame_idx",
        F.sha2("frame", 256).alias("frame_sha256"),
        F.length("frame").cast("bigint").alias("frame_len"),
    )


# The fake resizer stride-samples bytes at positions j*k (k = len//64,
# j < 64) — pure integer arithmetic over ASCII text, so DuckDB rebuilds
# the identical thumbnail bytes with substr + string_agg and the sha256
# digest pins them exactly.
_MM_RESIZE_ORACLE = """
WITH m AS (
    SELECT doc_id AS media_id, text, length(text) AS n,
           greatest(length(text) // 64, 1) AS k
    FROM documents
),
px AS (
    SELECT media_id, j,
           substr(text, CAST(j * k + 1 AS BIGINT), 1) AS ch
    FROM m, generate_series(0, 63) AS g(j)
    WHERE j * k + 1 <= n
),
r AS (
    SELECT media_id, string_agg(ch, '' ORDER BY j) AS resized
    FROM px GROUP BY media_id
)
SELECT media_id,
       CAST(length(resized) AS BIGINT) AS out_len,
       sha256(resized) AS resized_sha256
FROM r
"""


@register("mm_resize", oracle=_MM_RESIZE_ORACLE)
def mm_resize_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Thumbnail resize over binary media: Arrow-batched pandas UDF,
    blob never shuffles, output bounded at 8x8 bytes (deterministic
    stride fake standing in for the container-absent image decoder).
    Digest projection (length + sha256) keeps the row hash-checked."""
    from wikidatabots_spark.operators.multimodal import resize_media

    d = load_table(spark, sf_dir, "documents").select(
        F.col("doc_id").alias("media_id"),
        F.encode(F.col("text"), "UTF-8").alias("data"),
    )
    return resize_media(d, width=8, height=8).select(
        "media_id",
        F.length("resized").cast("bigint").alias("out_len"),
        F.sha2("resized", 256).alias("resized_sha256"),
    )


# The fake embedding is byte i of sha256(data), mapped to h/128-1 — a
# dyadic rational exact in float32. The projection inverts that map back
# to the integer byte (round((x+1)*128), exact in double), so the digest
# is over engine-neutral integer renderings instead of float-to-string
# formatting, which Spark and DuckDB disagree on.
_MM_FEATURES_ORACLE = """
WITH h AS (
    SELECT doc_id AS media_id, sha256(text) AS hx FROM documents
),
ints AS (
    SELECT media_id,
           list_transform(generate_series(0, 15),
               i -> (strpos('0123456789abcdef', substr(hx, 2*i + 1, 1)) - 1) * 16
                  + (strpos('0123456789abcdef', substr(hx, 2*i + 2, 1)) - 1)) AS bs
    FROM h
)
SELECT media_id,
       sha256(array_to_string(list_transform(bs, x -> CAST(x AS VARCHAR)), ','))
           AS feature_sha256,
       CAST(16 AS INT) AS dim
FROM ints
"""


@register("mm_extract_features", oracle=_MM_FEATURES_ORACLE)
def mm_extract_features_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """pandas-UDF feature extraction producing array<float> embeddings
    consumable by the similarity operators.

    The registered projection is scalar-only — (media_id, feature_sha256,
    dim) — because the driver's compare canonicalizes row tuples and
    array columns break it. feature_sha256 digests the features after
    recovering each one's underlying sha256 byte (the float↔byte map is a
    bijection and both steps are exact), so the hash pins the exact
    feature values while staying float-formatting-independent; DuckDB
    recomputes the identical digest chain from sha256(text)."""
    from wikidatabots_spark.operators.multimodal import extract_features

    d = load_table(spark, sf_dir, "documents").select(
        F.col("doc_id").alias("media_id"),
        F.encode(F.col("text"), "UTF-8").alias("data"),
    )
    feats = extract_features(d)
    byte_ints = F.transform(
        "features",
        lambda x: F.round((x.cast("double") + F.lit(1.0)) * F.lit(128.0)).cast("int"),
    )
    return feats.select(
        "media_id",
        F.sha2(
            F.concat_ws(",", F.transform(byte_ints, lambda i: i.cast("string"))),
            256,
        ).alias("feature_sha256"),
        F.size("features").cast("int").alias("dim"),
    )


# ---------------------------------------------------------------------------
# SimHash (engine-agnostic md5-hex bit scheme; see operators.dedup.simhash)
# ---------------------------------------------------------------------------

# unigram tokens CTE (simhash tokenizes words, not shingles)
_UNIGRAM_SQL = """
tok AS (
    SELECT DISTINCT doc_id, token FROM (
        SELECT doc_id,
               unnest(string_split_regex(lower(text), '\\s+')) AS token
        FROM documents
    ) WHERE token != ''
)
"""


def _simhash_oracle() -> str:
    sums = []
    for b in range(32):
        j = b // 4 + 1
        shift = 2 ** (3 - (b % 4))
        d = f"(strpos('0123456789abcdef', substr(md5(token), {j}, 1)) - 1)"
        sums.append(f"SUM((({d} // {shift}) % 2) * 2 - 1) AS s{b}")
    fp = " + ".join(f"CASE WHEN s{b} > 0 THEN {2**b} ELSE 0 END" for b in range(32))
    return f"""
WITH {_UNIGRAM_SQL},
per_doc AS (
    SELECT doc_id, {", ".join(sums)}
    FROM tok GROUP BY doc_id
)
SELECT doc_id, CAST({fp} AS BIGINT) AS simhash FROM per_doc
"""


@register("text_simhash", oracle=_simhash_oracle())
def text_simhash_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from wikidatabots_spark.operators.dedup import simhash

    return simhash(load_table(spark, sf_dir, "documents"))


def _simhash_pairs_oracle() -> str:
    return f"""
WITH fp AS ({_simhash_oracle()})
SELECT a.doc_id AS id_a, b.doc_id AS id_b, a.simhash
FROM fp a JOIN fp b ON a.simhash = b.simhash AND a.doc_id < b.doc_id
"""


@register("dedup_simhash", oracle=_simhash_pairs_oracle())
def dedup_simhash_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from wikidatabots_spark.operators.dedup import simhash_dup_pairs

    return simhash_dup_pairs(load_table(spark, sf_dir, "documents"))


@register("dedup_embedding_cosine_blas", oracle=_EMB_DUP_ORACLE)
def dedup_embedding_cosine_blas_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same operator, vectorized-Pandas-UDF execution: blocked numpy
    matmul inside mapInPandas (the task's 'vectorized Pandas UDF' path) —
    verified against the identical DuckDB oracle as the expression form."""
    from wikidatabots_spark.operators.similarity import embedding_dup_pairs_blocked

    return embedding_dup_pairs_blocked(
        load_table(spark, sf_dir, "embeddings"), threshold=0.45
    )


def _simhash_near_oracle() -> str:
    slices = "\n    UNION ALL ".join(
        f"SELECT doc_id, simhash, {i} AS slice_idx,"
        f" (simhash >> {8 * i}) & 255 AS slice_val FROM fp"
        for i in range(4)
    )
    return f"""
WITH fp AS ({_simhash_oracle()}),
sliced AS (
    {slices}
),
cand AS (
    SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
           a.simhash AS fp_a, b.simhash AS fp_b
    FROM sliced a
    JOIN sliced b ON a.slice_idx = b.slice_idx
                 AND a.slice_val = b.slice_val
                 AND a.doc_id < b.doc_id
)
SELECT id_a, id_b, CAST(bit_count(xor(fp_a, fp_b)) AS INT) AS hamming
FROM cand
WHERE bit_count(xor(fp_a, fp_b)) <= 2
"""


@register("dedup_simhash_near", oracle=_simhash_near_oracle())
def dedup_simhash_near_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from wikidatabots_spark.operators.dedup import simhash_near_pairs

    return simhash_near_pairs(load_table(spark, sf_dir, "documents"), max_hamming=2)


def _simhash_both_oracle() -> str:
    return f"""
SELECT 'exact' AS leg, id_a, id_b, CAST(simhash AS BIGINT) AS metric
FROM ({_simhash_pairs_oracle()})
UNION ALL
SELECT 'near' AS leg, id_a, id_b, CAST(hamming AS BIGINT) AS metric
FROM ({_simhash_near_oracle()})
"""


@register("dedup_simhash_pairs", oracle=_simhash_both_oracle())
def dedup_simhash_pairs_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-window slot carrying BOTH simhash legs (the r5 merged-slot
    pattern, freeing a window seat for the r7-mandated deletion/monitor
    queries): the exact fingerprint-collision pairs and the banded
    Hamming≤2 near-pairs, union-tagged by ``leg`` with the per-leg
    metric (fingerprint / Hamming distance) normalized to BIGINT. The
    individual queries stay registered for the local gate."""
    from wikidatabots_spark.operators.dedup import (
        simhash_dup_pairs,
        simhash_near_pairs,
    )

    d = load_table(spark, sf_dir, "documents")
    exact = simhash_dup_pairs(d).select(
        F.lit("exact").alias("leg"),
        "id_a",
        "id_b",
        F.col("simhash").cast("bigint").alias("metric"),
    )
    near = simhash_near_pairs(d, max_hamming=2).select(
        F.lit("near").alias("leg"),
        "id_a",
        "id_b",
        F.col("hamming").cast("bigint").alias("metric"),
    )
    return exact.unionByName(near)


def _knn_ivf_oracle(n_cells: int = 16, nprobe: int = 4, k: int = 5) -> str:
    """DuckDB replication of the md5-seeded IVF-Flat pipeline: the
    coarse centers are the ``n_cells`` corpus vectors ranked first by
    (md5(vec_id), vec_id) — derivable in SQL, no RNG — so assignment
    (argmin L2, ties to the lowest cell), nprobe probing, and the exact
    cosine re-rank are all rebuilt and hash-compared end to end."""
    return f"""
WITH ordered AS (
    SELECT vec_id, embedding,
           row_number() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id)
               AS rn
    FROM embeddings
),
cents AS (
    SELECT CAST(rn - 1 AS INT) AS cell, embedding AS cvec
    FROM ordered WHERE rn <= {n_cells}
),
d2 AS (
    SELECT e.vec_id, c.cell,
           SUM((CAST(e.embedding[i] AS DOUBLE) - CAST(c.cvec[i] AS DOUBLE))
             * (CAST(e.embedding[i] AS DOUBLE) - CAST(c.cvec[i] AS DOUBLE)))
               AS d2
    FROM embeddings e, cents c, generate_series(1, 64) t(i)
    GROUP BY e.vec_id, c.cell
),
assigned AS (
    SELECT vec_id AS neighbor_id, cell FROM (
        SELECT vec_id, cell,
               row_number() OVER (PARTITION BY vec_id ORDER BY d2, cell) AS rn
        FROM d2) WHERE rn = 1
),
probes AS (
    SELECT vec_id AS query_id, cell FROM (
        SELECT vec_id, cell,
               row_number() OVER (PARTITION BY vec_id ORDER BY d2, cell) AS rn
        FROM d2 WHERE vec_id < 20) WHERE rn <= {nprobe}
),
cand AS (
    SELECT p.query_id, a.neighbor_id
    FROM probes p JOIN assigned a USING (cell)
    WHERE a.neighbor_id != p.query_id
),
norms AS (
    SELECT vec_id,
           sqrt(SUM(CAST(embedding[i] AS DOUBLE) * CAST(embedding[i] AS DOUBLE)))
               AS nrm
    FROM embeddings, generate_series(1, 64) t(i)
    GROUP BY vec_id
),
dots AS (
    SELECT cd.query_id, cd.neighbor_id,
           SUM(CAST(eq.embedding[i] AS DOUBLE) * CAST(ec.embedding[i] AS DOUBLE))
               AS dot
    FROM cand cd
    JOIN embeddings eq ON eq.vec_id = cd.query_id
    JOIN embeddings ec ON ec.vec_id = cd.neighbor_id,
    generate_series(1, 64) t(i)
    GROUP BY cd.query_id, cd.neighbor_id
),
ranked AS (
    SELECT query_id, neighbor_id,
           row_number() OVER (PARTITION BY query_id
                              ORDER BY dot / (nq.nrm * nc.nrm) DESC,
                                       neighbor_id) AS rank
    FROM dots d
    JOIN norms nq ON nq.vec_id = d.query_id
    JOIN norms nc ON nc.vec_id = d.neighbor_id
)
SELECT query_id, neighbor_id, CAST(rank AS INT) AS rank
FROM ranked WHERE rank <= {k}
"""


@register("knn_ivf_topk", oracle=_knn_ivf_oracle())
def knn_ivf_topk_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-Flat ANN (16 cells, nprobe=4, exact cosine re-rank) — the
    scale-path alternative to SRP bucketing, HASH-CHECKED since r11
    (closes the r10 rows-only carryover): the coarse centers are the 16
    corpus vectors ranked first by (md5(vec_id), vec_id) — a
    deterministic, SQL-derivable seeding, the same closure move as
    knn_lsh_topk's embedded SRP planes — so the whole pipeline
    (assignment, probing, re-rank) is rebuilt by the oracle. The
    MLlib-KMeans-quantizer variant stays pytest-covered
    (tests/test_operators.py::test_knn_ivf_overlaps_brute); its RNG
    lives inside the library and cannot be replayed in SQL.

    Scale: the centers are a KB-sized driver literal (the PQ-codebook
    pattern), so assignment AND probing are zero-shuffle narrow maps;
    candidates are one cell-keyed equi-join; the only corpus exchange
    is the final per-query top-k window."""
    from wikidatabots_spark.operators.similarity_ml import knn_ivf

    emb = load_table(spark, sf_dir, "embeddings")
    seeds = (
        emb.select("vec_id", "embedding")
        .orderBy(F.md5(F.col("vec_id").cast("string").cast("binary")), "vec_id")
        .limit(16)
        .collect()
    )
    cents = [[float(x) for x in r.embedding] for r in seeds]
    return knn_ivf(
        emb.where(F.col("vec_id") < 20), emb, k=5, nprobe=4, centroids=cents
    )


_MINHASH_ML_ORACLE = """
WITH w AS (
    SELECT doc_id,
           list_distinct(list_filter(string_split_regex(lower(text), '\\s+'),
                                     x -> x != '')) AS ws
    FROM documents
),
p AS (
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           len(list_intersect(a.ws, b.ws)) AS inter,
           len(list_distinct(list_concat(a.ws, b.ws))) AS uni
    FROM w a JOIN w b ON a.doc_id < b.doc_id
)
SELECT id_a, id_b, CAST(inter AS DOUBLE) / uni AS jaccard
FROM p WHERE inter * 10 >= uni * 9
"""


@register("dedup_minhash_ml", oracle=_MINHASH_ML_ORACLE)
def dedup_minhash_ml_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MLlib HashingTF → MinHashLSH approxSimilarityJoin (the SURVEY §7
    Phase-5 pipeline verbatim) as the CANDIDATE GENERATOR, verified to
    exact unigram-set Jaccard ≥ 0.9 — HASH-CHECKED since r11 (closes
    the r10 rows-only carryover). The contract the oracle checks is
    real: the all-pairs SQL lists every pair with token-Jaccard ≥ 0.9,
    so the Spark result matches iff MLlib's 8-table LSH recalled every
    true near-dup pair (per-pair miss probability ≤ (1-0.9)^8 = 1e-8 —
    a collision in ANY of the 8 minhash tables makes a candidate, and
    the loose 0.5 distance pre-filter cannot drop a 0.9-similar pair).
    A genuine MLlib recall regression therefore surfaces as a driver
    hash MISMATCH instead of hiding behind a rows-only check.

    FLAKE BOUND (ADVICE r11): the gate is PROBABILISTIC, not exact.
    Two effects can produce a hash mismatch with no MLlib regression:
    (a) per-pair LSH miss ~(1-s)^8 — negligible at s ≥ 0.9 but nonzero;
    (b) HashingTF's 2^16 feature buckets can merge distinct tokens, so
    the Jaccard MLlib sees (feature sets) can sit slightly BELOW the
    token-set Jaccard the oracle computes — for a pair right at the
    0.9 boundary this lowers the per-table collision probability and
    inflates the miss rate beyond (1-0.9)^8. MinHashLSH's seed is
    fixed (42), so at a given SF a miss is DETERMINISTIC, not run-to-
    run noise. The local gate (scripts/check_oracle.py) therefore
    diagnoses a mismatch on this entry before treating it as a
    correctness failure: spark-only rows = real bug (false positive /
    Jaccard math drift); duck-only rows whose jaccard column is at the
    0.9 boundary = the documented recall flake.

    Scale: LSH candidates + exact verify is the production dedup shape
    (candidates are hash-bucket joins, never all pairs); the O(n²)
    side lives only in the ORACLE, as ground truth must."""
    from wikidatabots_spark.operators.similarity_ml import minhash_lsh_ml

    d = load_table(spark, sf_dir, "documents")
    cand = minhash_lsh_ml(
        d, jaccard_distance_threshold=0.5, num_hash_tables=8
    ).select("id_a", "id_b")
    words = d.select(
        "doc_id",
        F.array_distinct(
            F.filter(
                F.split(F.lower(F.col("text")), r"\s+"), lambda w: w != ""
            )
        ).alias("ws"),
    )
    return (
        cand.join(
            words.select(F.col("doc_id").alias("id_a"), F.col("ws").alias("wa")),
            "id_a",
        )
        .join(
            words.select(F.col("doc_id").alias("id_b"), F.col("ws").alias("wb")),
            "id_b",
        )
        .withColumn("inter", F.size(F.array_intersect("wa", "wb")))
        .withColumn("uni", F.size(F.array_union("wa", "wb")))
        .where(F.col("inter") * 10 >= F.col("uni") * 9)
        .select(
            "id_a",
            "id_b",
            (F.col("inter").cast("double") / F.col("uni")).alias("jaccard"),
        )
    )


def _cms_oracle(depth: int = 4, width: int = 256) -> str:
    md5_expr = "md5(CAST(j AS VARCHAR) || ':' || w)"
    hash8 = " + ".join(
        f"(strpos('0123456789abcdef', substr({md5_expr}, {k + 1}, 1)) - 1)"
        f" * {16 ** (7 - k)}"
        for k in range(8)
    )
    return f"""
WITH words AS (
    SELECT unnest(list_filter(string_split_regex(lower(text), '\\s+'),
                              x -> x != '')) AS w
    FROM documents
),
pairs AS (
    SELECT j AS row_idx, ({hash8}) % {width} AS col_idx
    FROM words, generate_series(0, {depth - 1}) t(j)
)
SELECT CAST(row_idx AS INT) AS row_idx, CAST(col_idx AS INT) AS col_idx,
       COUNT(*) AS cnt
FROM pairs GROUP BY row_idx, col_idx
"""


@register("sketch_count_min", oracle=_cms_oracle())
def sketch_count_min_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min sketch (4×256, deterministic md5 hashing) over the word
    stream of the documents table — the matrix itself is hash-verified
    against DuckDB, so the estimate path (min over rows) inherits
    correctness. The classic stream summary for frequency queries where a
    full groupBy is too large; shuffle is capped at depth·width rows per
    map task regardless of corpus size."""
    from wikidatabots_spark.operators.dedup import ensure_parallelism
    from wikidatabots_spark.operators.sketch import count_min_sketch

    d = load_table(spark, sf_dir, "documents")
    words = ensure_parallelism(d.select("doc_id", "text"), "doc_id").select(
        F.explode(
            F.filter(
                F.split(F.lower(F.col("text")), r"\s+"), lambda w: w != ""
            )
        ).alias("w")
    )
    return count_min_sketch(words, "w", depth=4, width=256)


# --- Gopher-style repetition filters / BM25 search / stratified sample ----

_REPETITION_ORACLE = f"""
WITH w AS (
    SELECT doc_id, {_WORDS_SQL} AS wl FROM documents
),
g AS (
    SELECT doc_id, wl,
           list_transform(generate_series(1, greatest(len(wl) - 1, 0)),
                          i -> wl[i] || ' ' || wl[i+1]) AS g2,
           list_transform(generate_series(1, greatest(len(wl) - 2, 0)),
                          i -> wl[i] || ' ' || wl[i+1] || ' ' || wl[i+2]) AS g3
    FROM w
)
SELECT doc_id,
       CAST(len(wl) AS BIGINT) AS n_words,
       CAST(len(list_distinct(wl)) AS BIGINT) AS n_distinct_words,
       CASE WHEN len(wl) > 0
            THEN CAST(len(list_distinct(wl)) AS DOUBLE) / len(wl)
            ELSE 0.0 END AS type_token_ratio,
       CASE WHEN len(g2) > 0
            THEN CAST(len(g2) - len(list_distinct(g2)) AS DOUBLE) / len(g2)
            ELSE 0.0 END AS dup_2gram_frac,
       CASE WHEN len(g3) > 0
            THEN CAST(len(g3) - len(list_distinct(g3)) AS DOUBLE) / len(g3)
            ELSE 0.0 END AS dup_3gram_frac
FROM g
"""


@register("text_repetition", oracle=_REPETITION_ORACLE)
def text_repetition_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repetition/diversity quality filters (duplicate-n-gram fractions,
    type-token ratio) — the Gopher/MassiveText repetition gates as narrow
    array expressions; word-soup synthetic text repeats heavily so the
    fractions are far from vacuous."""
    from wikidatabots_spark.operators.textstats import with_repetition

    d = load_table(spark, sf_dir, "documents")
    return with_repetition(d).select(
        "doc_id",
        "n_words",
        "n_distinct_words",
        "type_token_ratio",
        "dup_2gram_frac",
        "dup_3gram_frac",
    )


_BM25_TERMS = ["spark", "join", "window"]


def _bm25_oracle(terms: list[str], k: int = 10) -> str:
    tf_exprs = ",\n           ".join(
        f"len(list_filter(wl, x -> x = '{t}')) AS tf{i}"
        for i, t in enumerate(terms)
    )
    df_exprs = ",\n           ".join(
        f"CAST(SUM(CASE WHEN tf{i} > 0 THEN 1 ELSE 0 END) AS BIGINT) AS df{i}"
        for i in range(len(terms))
    )
    # expression tree mirrors operators.textstats.bm25_topk EXACTLY
    # (same association order) so the doubles are bit-identical
    score = " + ".join(
        f"((n - df{i} + 0.5) / (df{i} + 0.5))"
        f" * ((tf{i} * 2.2) / (tf{i} + 1.2 *"
        f" (0.25 + 0.75 * (dl / (CAST(sumdl AS DOUBLE) / n)))))"
        for i in range(len(terms))
    )
    total_tf = " + ".join(f"tf{i}" for i in range(len(terms)))
    any_tf = " OR ".join(f"tf{i} > 0" for i in range(len(terms)))
    return f"""
WITH w AS (
    SELECT doc_id, {_WORDS_SQL} AS wl FROM documents
),
feat AS (
    SELECT doc_id, len(wl) AS dl,
           {tf_exprs}
    FROM w
),
stats AS (
    SELECT COUNT(*) AS n, CAST(SUM(dl) AS BIGINT) AS sumdl,
           {df_exprs}
    FROM feat
),
scored AS (
    SELECT doc_id, CAST({total_tf} AS BIGINT) AS total_tf,
           {score} AS score
    FROM feat, stats
    WHERE {any_tf}
),
ranked AS (
    SELECT doc_id, total_tf,
           CAST(row_number() OVER (ORDER BY score DESC, doc_id) AS INT) AS rank
    FROM scored
)
SELECT doc_id, rank, total_tf FROM ranked WHERE rank <= {k}
"""


@register("text_bm25_topk", oracle=_bm25_oracle(_BM25_TERMS))
def text_bm25_topk_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyword search over the corpus: BM25-shaped ranking with a
    log-free monotone idf (see operators.textstats.bm25_topk for the
    bit-reproducibility rationale). Shuffle-free until the final top-k."""
    from wikidatabots_spark.operators.textstats import bm25_topk

    return bm25_topk(load_table(spark, sf_dir, "documents"), _BM25_TERMS, k=10)


_STRAT_BUCKET = (
    "(strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) - 1)"
    " * 4096"
    " + (strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 2, 1)) - 1)"
    " * 256"
    " + (strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 3, 1)) - 1)"
    " * 16"
    " + (strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 4, 1)) - 1)"
)

_STRAT_ORACLE = f"""
SELECT doc_id, lang
FROM documents
WHERE {_STRAT_BUCKET} <
      CASE WHEN lang = 'en' THEN {int(0.25 * 65536)}
           WHEN lang = 'zh' THEN {int(0.75 * 65536)}
           ELSE {int(0.5 * 65536)} END
"""


@register("sample_stratified", oracle=_STRAT_ORACLE)
def sample_stratified_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic per-stratum sampling: downsample the dominant
    language, oversample the rarest, default the rest — the corpus
    rebalancing step of a training-data pipeline, reproducible across
    re-runs because membership depends only on (doc_id, own stratum)."""
    from wikidatabots_spark.functions.core import sample_hash_stratified

    d = load_table(spark, sf_dir, "documents")
    return sample_hash_stratified(
        d, "doc_id", "lang", {"en": 0.25, "zh": 0.75}, default=0.5
    ).select("doc_id", "lang")


_MM_DEDUP_ORACLE = f"""
WITH feats AS ({_MM_FEATURES_ORACLE})
SELECT feature_sha256,
       MIN(media_id) AS canonical_media_id,
       COUNT(*) AS n_copies
FROM feats
GROUP BY feature_sha256
"""


@register("mm_dedup_media", oracle=_MM_DEDUP_ORACLE)
def mm_dedup_media_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-modal composition: exact media dedup keyed on the EXTRACTED
    feature digest (multimodal op feeding the dedup op) — media with
    identical features collapse to the lowest id. The blob itself never
    shuffles; only the 64-hex digest does."""
    from wikidatabots_spark.operators.multimodal import extract_features

    d = load_table(spark, sf_dir, "documents").select(
        F.col("doc_id").alias("media_id"),
        F.encode(F.col("text"), "UTF-8").alias("data"),
    )
    feats = extract_features(d)
    byte_ints = F.transform(
        "features",
        lambda x: F.round((x.cast("double") + F.lit(1.0)) * F.lit(128.0)).cast("int"),
    )
    digested = feats.select(
        "media_id",
        F.sha2(
            F.concat_ws(",", F.transform(byte_ints, lambda i: i.cast("string"))),
            256,
        ).alias("feature_sha256"),
    )
    return digested.groupBy("feature_sha256").agg(
        F.min("media_id").alias("canonical_media_id"),
        F.count(F.lit(1)).alias("n_copies"),
    )


_QUANTIZE_ORACLE = """
WITH v AS (
    SELECT vec_id,
           list_transform(embedding, x -> CAST(x AS DOUBLE)) AS dv
    FROM embeddings
),
s AS (
    SELECT vec_id, dv,
           list_max(list_transform(dv, x -> abs(x))) AS scale
    FROM v
),
q AS (
    SELECT vec_id,
           CASE WHEN scale > 0
                THEN list_transform(dv, x -> CAST(round(x / scale * 127.0) AS INT))
                ELSE list_transform(dv, x -> 0) END AS qv
    FROM s
)
SELECT vec_id,
       sha256(array_to_string(list_transform(qv, x -> CAST(x AS VARCHAR)), ','))
           AS q_sha256,
       CAST(list_sum(list_transform(qv, x -> abs(x))) AS BIGINT) AS sum_abs_q
FROM q
"""


@register("emb_quantize", oracle=_QUANTIZE_ORACLE)
def emb_quantize_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Int8 scalar quantization of the embedding column (the 4×
    compression step before a large ANN build); the registered projection
    digests the quantized ints (scalar-only output for the driver
    compare) — the digest pins every quantized value exactly."""
    from wikidatabots_spark.operators.similarity import quantize_vectors

    emb = load_table(spark, sf_dir, "embeddings")
    q = quantize_vectors(emb)
    return q.select(
        "vec_id",
        F.sha2(
            F.concat_ws(",", F.transform("qvec", lambda i: i.cast("string"))), 256
        ).alias("q_sha256"),
        F.aggregate(
            F.transform("qvec", lambda i: F.abs(i).cast("bigint")),
            F.lit(0).cast("bigint"),
            lambda acc, x: acc + x,
        ).alias("sum_abs_q"),
    )


# ---------------------------------------------------------------------------
# emb_jl_distortion — JL sign random projection with MEASURED distortion
# ---------------------------------------------------------------------------

_JL_K = 16  # projected dimensions (64 -> 16, the 4x ANN shrink)
# float -> integer quantization scale. Smaller than emb_standardize's
# 1e6 BY NECESSITY: the ppm ratio's numerator is 1e6 · Σ_k (Σ_64 q)² —
# worst case 8.8e10·S² with |x| ≤ 0.58 in this corpus — and S = 5000
# caps that at 2.2e18, inside BIGINT with 4x headroom (S = 1e4 would
# sit within 5% of overflow). Quantization error ~2e-4 absolute is
# noise next to the ~1/sqrt(k) distortion being measured.
_JL_SCALE = 5_000


def _jl_signs() -> list[list[int]]:
    """The deterministic ±1 projection matrix, k rows × 64 cols: sign =
    parity of the first hex digit of md5('jl:<j>:<i>'). Generated once
    in Python and embedded as LITERALS in both engines' plans, so the
    matrix is identical by construction."""
    import hashlib

    return [
        [
            1
            if int(
                hashlib.md5(f"jl:{j}:{i}".encode()).hexdigest()[0], 16
            )
            % 2
            == 0
            else -1
            for i in range(64)
        ]
        for j in range(_JL_K)
    ]


def _jl_oracle() -> str:
    signs = _jl_signs()
    s_sql = (
        "["
        + ", ".join("[" + ", ".join(str(v) for v in row) + "]" for row in signs)
        + "]"
    )
    return f"""
WITH q AS (
    SELECT vec_id,
           list_transform(embedding,
               x -> CAST(floor(CAST(x AS DOUBLE) * {_JL_SCALE}) AS BIGINT)) AS qv
    FROM embeddings
),
proj AS (
    SELECT vec_id, qv,
           list_transform({s_sql},
               row -> CAST(list_sum(
                   list_transform(generate_series(1, 64),
                                  i -> qv[i] * row[i])) AS BIGINT)) AS yv
    FROM q
),
pairs AS (
    SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           CAST(list_sum(list_transform(generate_series(1, 64),
               i -> (a.qv[i] - b.qv[i]) * (a.qv[i] - b.qv[i]))) AS BIGINT)
               AS dist_sq_orig,
           CAST(list_sum(list_transform(generate_series(1, {_JL_K}),
               j -> (a.yv[j] - b.yv[j]) * (a.yv[j] - b.yv[j]))) AS BIGINT)
               AS dist_sq_proj
    FROM proj a JOIN proj b ON b.vec_id = a.vec_id + 1
)
SELECT id_a, id_b, dist_sq_orig, dist_sq_proj,
       CAST((1000000 * dist_sq_proj) // ({_JL_K} * dist_sq_orig) AS BIGINT)
           AS distortion_ppm
FROM pairs WHERE dist_sq_orig > 0
"""


@register("emb_jl_distortion", oracle=_jl_oracle())
def emb_jl_distortion_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Johnson–Lindenstrauss sign random projection (64 → 16 dims, the
    Achlioptas ±1 variant) with its distortion MEASURED, not assumed —
    the dimensionality-reduction member of the measured-approximation
    family (minhash est-error, HLL/CMS error, PQ recall, quantile
    calibration): for each consecutive-id vector pair, the exact
    squared L2 distance in the original and projected spaces and the
    ratio E[·]≈1e6 in ppm. JL says the ratio concentrates near 1 with
    variance ~2/k; the emitted table is the evidence.

    Engine-exactness: vectors are quantized to integers
    (emb_standardize's floor(x·1e6) trick), the ±1 matrix is a Python-
    generated LITERAL identical in both plans, so projections,
    distances and the ppm ratio are all exact integer arithmetic —
    zero float summation anywhere.

    Scale: the projection is a NARROW per-row map (k·64 integer
    multiply-adds against literal sign rows — whole-stage codegen, no
    shuffle, no UDF); at 100 TB this is the 4× ANN-index shrink pass.
    The distortion probe's only exchange is the id-shifted self-join
    (one hash exchange on vec_id); output is O(n) rows of five longs.
    """
    signs = _jl_signs()
    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.select(
        "vec_id",
        F.transform(
            F.col("embedding"),
            lambda x: F.floor(x.cast("double") * _JL_SCALE).cast("long"),
        ).alias("qv"),
    )

    def project(qv):
        return F.array(
            *[
                F.aggregate(
                    F.zip_with(
                        qv,
                        F.array(*[F.lit(v) for v in row]),
                        lambda a, s: a * s.cast("long"),
                    ),
                    F.lit(0).cast("long"),
                    lambda acc, x: acc + x,
                )
                for row in signs
            ]
        )

    proj = q.select("vec_id", "qv", project(F.col("qv")).alias("yv"))

    def sq_dist(col_a, col_b):
        return F.aggregate(
            F.zip_with(col_a, col_b, lambda a, b: (a - b) * (a - b)),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        )

    a = proj.select(
        F.col("vec_id").alias("id_a"),
        F.col("qv").alias("qa"),
        F.col("yv").alias("ya"),
    )
    b = proj.select(
        (F.col("vec_id") - 1).alias("id_a"),
        F.col("vec_id").alias("id_b"),
        F.col("qv").alias("qb"),
        F.col("yv").alias("yb"),
    )
    pairs = a.join(b, "id_a").select(
        "id_a",
        "id_b",
        sq_dist(F.col("qa"), F.col("qb")).alias("dist_sq_orig"),
        sq_dist(F.col("ya"), F.col("yb")).alias("dist_sq_proj"),
    )
    return pairs.where(F.col("dist_sq_orig") > 0).select(
        "id_a",
        "id_b",
        "dist_sq_orig",
        "dist_sq_proj",
        # integer floor division (Spark `/` would route through DOUBLE
        # and lose exactness past 2^53)
        F.expr(
            f"(1000000L * dist_sq_proj) div ({_JL_K}L * dist_sq_orig)"
        ).alias("distortion_ppm"),
    )


@register(
    "text_vocab_topk",
    oracle="""
SELECT token, df, rank FROM (
    SELECT token,
           CAST(COUNT(*) AS BIGINT) AS df,
           CAST(row_number() OVER (ORDER BY COUNT(*) DESC, token) AS INT)
               AS rank
    FROM (
        SELECT doc_id,
               unnest(list_distinct(list_filter(
                   string_split_regex(lower(text), '\\s+'),
                   x -> x != ''))) AS token
        FROM documents
    )
    GROUP BY token
) WHERE rank <= 100
""",
)
def text_vocab_topk_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus vocabulary: top-100 tokens by document frequency — the
    stopword-mining / tokenizer-seeding step. Global top-k plans as
    TakeOrderedAndProject (per-task k rows), not a full sort."""
    from wikidatabots_spark.operators.textstats import vocab_topk

    return vocab_topk(load_table(spark, sf_dir, "documents"), k=100)


@register(
    "text_contamination",
    oracle="""
WITH w AS (
    SELECT doc_id,
           list_filter(string_split_regex(lower(text), '\\s+'),
                       x -> x != '') AS wl
    FROM documents
),
g AS (
    SELECT doc_id, md5(gr) AS gram_hash FROM (
        SELECT doc_id,
               unnest(list_distinct(list_transform(
                   generate_series(1, greatest(len(wl) - 4, 0)),
                   i -> wl[i] || ' ' || wl[i+1] || ' ' || wl[i+2]
                        || ' ' || wl[i+3] || ' ' || wl[i+4]))) AS gr
        FROM w)
)
SELECT t.doc_id AS train_id,
       CAST(COUNT(DISTINCT t.gram_hash) AS BIGINT) AS n_collided_grams,
       CAST(COUNT(DISTINCT b.doc_id) AS BIGINT) AS n_bench_docs
FROM (SELECT * FROM g WHERE doc_id % 7 <> 0) t
JOIN (SELECT * FROM g WHERE doc_id % 7 = 0) b USING (gram_hash)
GROUP BY t.doc_id
""",
)
def text_contamination_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: training docs sharing any word 5-gram
    with the held-out slice (doc_id % 7 == 0 stands in for the eval
    set). The eval side broadcasts — the training corpus never
    shuffles."""
    from wikidatabots_spark.operators.textstats import ngram_collisions

    docs = load_table(spark, sf_dir, "documents")
    bench = docs.where(F.col("doc_id") % 7 == 0)
    train = docs.where(F.col("doc_id") % 7 != 0)
    return ngram_collisions(train, bench, n=5)


@register(
    "corpus_length_histogram",
    oracle="""
SELECT CAST(length(CAST(n_chars AS VARCHAR)) AS INT) AS n_digits,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       MIN(n_chars) AS min_chars,
       MAX(n_chars) AS max_chars,
       CAST(SUM(n_chars) AS BIGINT) AS total_chars,
       CAST(SUM(n_chars) AS DOUBLE) / COUNT(*) AS avg_chars
FROM documents
GROUP BY CAST(length(CAST(n_chars AS VARCHAR)) AS INT)
""",
)
def corpus_length_histogram_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus profiling: decimal-magnitude length histogram (bucket =
    digit count of n_chars — exact integer math, unlike floor(log2)
    whose libm rounding differs across engines at power boundaries)."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.groupBy(
            F.length(F.col("n_chars").cast("string")).alias("n_digits")
        )
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min("n_chars").alias("min_chars"),
            F.max("n_chars").alias("max_chars"),
            F.sum("n_chars").alias("total_chars"),
            (F.sum("n_chars").cast("double") / F.count(F.lit(1))).alias(
                "avg_chars"
            ),
        )
    )


_WINNOW_ORACLE = """
WITH words AS (
    SELECT doc_id,
           list_filter(string_split_regex(lower(text), '\\s+'),
                       x -> x != '') AS wl
    FROM documents
),
sh AS (
    SELECT doc_id,
           unnest(generate_series(1, greatest(len(wl) - 2, 0))) - 1 AS pos,
           unnest(list_transform(generate_series(1, greatest(len(wl) - 2, 0)),
                  i -> md5(wl[i] || ' ' || wl[i+1] || ' ' || wl[i+2]))) AS h,
           greatest(len(wl) - 2, 0) AS n_sh
    FROM words
),
win AS (
    SELECT doc_id, pos, n_sh,
           MIN(h) OVER (PARTITION BY doc_id ORDER BY pos
                        ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS fp
    FROM sh
)
SELECT DISTINCT doc_id, fp FROM win WHERE pos <= n_sh - 4
"""


@register("text_winnow", oracle=_WINNOW_ORACLE)
def text_winnow_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing fingerprints (k=3-word shingles, window=4) — the
    SIGMOD'03 copy-detection selection: any shared run of ≥ k+window-1
    words yields an identical fingerprint in both documents, at ~2/(w+1)
    the density of full shingling."""
    from wikidatabots_spark.operators.dedup import winnow_fingerprints

    return winnow_fingerprints(
        load_table(spark, sf_dir, "documents"), k=3, window=4
    )


_WINNOW_PAIRS_ORACLE = f"""
WITH fps AS ({_WINNOW_ORACLE}),
nd AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM documents),
rare AS (
    SELECT t.doc_id, t.fp
    FROM (SELECT doc_id, fp, COUNT(*) OVER (PARTITION BY fp) AS df
          FROM fps) t, nd
    WHERE t.df <= CEIL(0.2 * nd.n)
)
SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS n_shared
FROM rare a JOIN rare b ON a.fp = b.fp AND a.doc_id < b.doc_id
GROUP BY a.doc_id, b.doc_id
HAVING COUNT(*) >= 3
"""


_COMPONENTS_ORACLE = f"""
WITH RECURSIVE
pairs AS ({_WINNOW_PAIRS_ORACLE}),
edges AS (
    SELECT id_a AS u, id_b AS v FROM pairs
    UNION ALL
    SELECT id_b, id_a FROM pairs
),
nodes AS (SELECT DISTINCT u AS node FROM edges),
reach(node, r) AS (
    SELECT node, node FROM nodes
    UNION
    SELECT e.u, reach.r FROM reach JOIN edges e ON e.v = reach.node
)
SELECT node, MIN(r) AS component FROM reach GROUP BY node
"""


@register("dedup_components", oracle=_COMPONENTS_ORACLE)
def dedup_components_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup pairs collapsed into dedup GROUPS — the step every real
    dedup pipeline needs between pair generation and 'keep one canonical
    doc per group'. Spark side: iterative min-label propagation over the
    winnowing pair graph (operators.dedup.connected_components); oracle:
    DuckDB recursive-CTE reachability closure. Both converge to the same
    fixed point (component = min reachable id), so the iterative
    algorithm is hash-checked end-to-end."""
    from wikidatabots_spark.operators.dedup import connected_components

    pairs = dedup_winnow_q(spark, sf_dir)
    return connected_components(pairs)


@register("dedup_winnow", oracle=_WINNOW_PAIRS_ORACLE)
def dedup_winnow_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-duplicate candidates by shared winnowing fingerprints — the
    copy-detection use the selection exists for: an equi-join on the
    fingerprint (one shuffle of (fp, id), never text), pair counts with
    map-side partials, threshold on shared fingerprints. A relative
    max_df cut fences hot boilerplate fingerprints before the self-join
    (the f² skew bomb; see ``winnow_pairs``)."""
    from wikidatabots_spark.operators.dedup import (
        winnow_fingerprints,
        winnow_pairs,
    )

    d = load_table(spark, sf_dir, "documents")
    fps = winnow_fingerprints(d, k=3, window=4)
    return winnow_pairs(fps, d, min_shared=3, max_df=0.2)


_SUBSTRING_ORACLE = """
WITH words AS (
    SELECT doc_id,
           list_filter(string_split_regex(lower(text), '\\s+'),
                       x -> x != '') AS wl
    FROM documents
),
base AS (
    SELECT doc_id, CAST(greatest(len(wl) - 7, 0) AS BIGINT) AS n_windows
    FROM words
),
wins AS (
    SELECT doc_id,
           unnest(list_transform(generate_series(1, greatest(len(wl) - 7, 0)),
                  i -> array_to_string(wl[i:i+7], ' '))) AS win
    FROM words
),
dupwin AS (SELECT win FROM wins GROUP BY win HAVING COUNT(*) > 1),
dup AS (
    SELECT doc_id, COUNT(*) AS n_dup
    FROM wins
    WHERE win IN (SELECT win FROM dupwin)
    GROUP BY doc_id
)
SELECT b.doc_id AS doc_id, b.n_windows,
       CAST(COALESCE(d.n_dup, 0) AS BIGINT) AS n_dup_windows
FROM base b LEFT JOIN dup d ON b.doc_id = d.doc_id
"""


@register("dedup_substring", oracle=_SUBSTRING_ORACLE)
def dedup_substring_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact substring duplication (Lee et al. ACL'22): per-document count
    of 8-word windows whose text occurs more than once in the corpus —
    the inputs to span-removal / mostly-duplicated-document gates. The
    oracle rebuilds the windows as strings; Spark ships only xxhash64
    window keys (internal join identity, never output)."""
    from wikidatabots_spark.operators.dedup import substring_duplication

    return substring_duplication(
        load_table(spark, sf_dir, "documents"), k=8
    )


_PII_ORACLE = """
WITH injected AS (
    SELECT doc_id,
           text || ' contact user' || CAST(doc_id AS VARCHAR)
                || '@ex-' || source || '.org or 10.0.'
                || CAST(doc_id % 256 AS VARCHAR) || '.'
                || CAST((doc_id * 7) % 256 AS VARCHAR)
                || ' call +1 555 0'
                || lpad(CAST(doc_id % 1000 AS VARCHAR), 3, '0') AS t
    FROM documents
)
SELECT doc_id,
       CAST(len(regexp_extract_all(t, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}')) AS BIGINT) AS n_emails,
       CAST(len(regexp_extract_all(t, '([0-9]{1,3}\\.){3}[0-9]{1,3}')) AS BIGINT) AS n_ips,
       CAST(len(regexp_extract_all(t, '[0-9][0-9 ()+-]{7,}[0-9]')) AS BIGINT) AS n_phones,
       regexp_replace(
           regexp_replace(
               regexp_replace(t,
                   '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
               '([0-9]{1,3}\\.){3}[0-9]{1,3}', '<IP>', 'g'),
           '[0-9][0-9 ()+-]{7,}[0-9]', '<PHONE>', 'g') AS redacted
FROM injected
"""


@register("text_pii_scrub", oracle=_PII_ORACLE)
def text_pii_scrub_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII redaction over the corpus. The synthetic documents carry no
    real PII, so the query deterministically injects an email, an IPv4
    and a phone-like run derived from (doc_id, source) into every row
    FIRST — the scrub then has real work whose counts and redacted text
    the oracle reproduces byte-for-byte."""
    from wikidatabots_spark.operators.textstats import with_pii_redacted

    d = load_table(spark, sf_dir, "documents")
    injected = d.select(
        "doc_id",
        F.concat_ws(
            "",
            F.col("text"),
            F.lit(" contact user"),
            F.col("doc_id").cast("string"),
            F.lit("@ex-"),
            F.col("source"),
            F.lit(".org or 10.0."),
            (F.col("doc_id") % 256).cast("string"),
            F.lit("."),
            ((F.col("doc_id") * 7) % 256).cast("string"),
            F.lit(" call +1 555 0"),
            F.lpad((F.col("doc_id") % 1000).cast("string"), 3, "0"),
        ).alias("t"),
    )
    return with_pii_redacted(injected, text_col="t").drop("t")


_PACK_ORACLE = """
WITH t AS (
    SELECT doc_id, CAST(doc_id % 32 AS INT) AS shard,
           CAST(len(list_filter(string_split_regex(text, '\\s+'),
                                x -> x != '')) AS BIGINT) AS n_tokens
    FROM documents
),
c AS (
    SELECT doc_id, shard, n_tokens,
           SUM(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id
                               ROWS UNBOUNDED PRECEDING) AS cum
    FROM t
)
SELECT doc_id, shard, n_tokens,
       CAST((cum - n_tokens) // 512 AS BIGINT) AS bin_first,
       CAST(CASE WHEN n_tokens = 0 THEN (cum - n_tokens)
                 ELSE cum - 1 END // 512 AS BIGINT) AS bin_last
FROM c
"""


@register("corpus_pack_sequences", oracle=_PACK_ORACLE)
def corpus_pack_sequences_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy contiguous packing of the corpus into 512-token bins,
    sharded by doc_id % 32 so each shard packs independently (the global
    concatenation order would serialize the corpus through one task)."""
    from wikidatabots_spark.operators.textstats import pack_sequences

    return pack_sequences(
        load_table(spark, sf_dir, "documents"), ctx=512, n_shards=32
    )


_PACK_SPANS_ORACLE = """
WITH t AS (
    SELECT doc_id, CAST(doc_id % 32 AS INT) AS shard,
           CAST(len(list_filter(string_split_regex(text, '\\s+'),
                                x -> x != '')) AS BIGINT) AS n_tokens
    FROM documents
),
c AS (
    SELECT doc_id, shard, n_tokens,
           SUM(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id
                               ROWS UNBOUNDED PRECEDING) AS cum
    FROM t WHERE n_tokens > 0
),
b AS (
    SELECT doc_id, shard, n_tokens,
           CAST(cum - n_tokens AS BIGINT) AS s, CAST(cum AS BIGINT) AS e,
           CAST((cum - n_tokens) // 512 AS BIGINT) AS bin_first,
           CAST((cum - 1) // 512 AS BIGINT) AS bin_last
    FROM c
),
frag AS (
    SELECT doc_id, shard, s, e, bin_first, bin_last,
           unnest(generate_series(bin_first, bin_last)) AS bin
    FROM b
)
SELECT doc_id, shard, CAST(bin AS BIGINT) AS bin,
       CAST(greatest(s, bin * 512) - bin * 512 AS BIGINT) AS bin_offset,
       CAST(least(e, (bin + 1) * 512) - greatest(s, bin * 512) AS BIGINT)
           AS n_in_bin,
       CAST(bin = bin_first AS INT) AS starts_doc,
       CAST(bin = bin_last AS INT) AS ends_doc
FROM frag
"""


@register("corpus_pack_spans", oracle=_PACK_SPANS_ORACLE)
def corpus_pack_spans_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fragment-level view of the 512-token packing: one row per
    (document, bin) with in-bin offset and length — what attention/loss
    masking reads at train time (``corpus_pack_sequences`` is the same
    layout per-document). Shard-partitioned window + narrow explode;
    all integer math."""
    from wikidatabots_spark.operators.textstats import pack_spans

    return pack_spans(
        load_table(spark, sf_dir, "documents"), ctx=512, n_shards=32
    )


# classifier oracle: per-token md5 16-bit bucket mod 1024, Knuth
# multiplicative hash into [-1000,1000]; score = exact integer weight sum
# over 1000*n_tokens (one IEEE division of exact integers — engine-neutral)
_CLS_ORACLE = """
WITH toks AS (
    SELECT doc_id,
           unnest(list_filter(string_split_regex(lower(text), '\\s+'),
                              x -> x != '')) AS w
    FROM documents
),
tw AS (
    SELECT doc_id,
           (((strpos('0123456789abcdef', substr(md5(w), 1, 1)) - 1) * 4096
            + (strpos('0123456789abcdef', substr(md5(w), 2, 1)) - 1) * 256
            + (strpos('0123456789abcdef', substr(md5(w), 3, 1)) - 1) * 16
            + (strpos('0123456789abcdef', substr(md5(w), 4, 1)) - 1)) % 1024)
           * 2654435761 % 2001 - 1000 AS wt
    FROM toks
),
agg AS (
    SELECT doc_id, CAST(SUM(wt) AS BIGINT) AS wsum,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM tw GROUP BY doc_id
)
SELECT d.doc_id,
       CASE WHEN agg.n > 0
            THEN CAST(agg.wsum AS DOUBLE) / CAST(agg.n * 1000 AS DOUBLE)
       END AS cls_score,
       COALESCE(CAST(agg.wsum AS DOUBLE) / CAST(agg.n * 1000 AS DOUBLE) >= 0.0,
                FALSE) AS keep
FROM documents d LEFT JOIN agg ON agg.doc_id = d.doc_id
"""


@register("text_classifier", oracle=_CLS_ORACLE)
def text_classifier_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hashed-feature linear quality classifier (fasttext-shaped): score
    every document in one shuffle-free codegen stage and emit the keep
    gate the CCNet/DCLM-style pipelines filter on."""
    from wikidatabots_spark.operators.textstats import with_classifier_score

    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    return with_classifier_score(d).select(
        "doc_id",
        "cls_score",
        F.coalesce(F.col("cls_score") >= 0.0, F.lit(False)).alias("keep"),
    )


# Trained classifier: the same hashed feature space as _CLS_ORACLE but
# with weights LEARNED in-plan (VERDICT r4 next #6) — per-bucket
# class-conditional token rates under a deterministic synthetic label
# (quality >= 0.5), add-one smoothed, in integer ppm. The bucket hash is
# the md5-nibble unroll shared with _CLS_ORACLE; SUMs go HUGEINT in
# DuckDB but `//` stays integer-exact and the only float op is the one
# final IEEE division, so the learned weights and scores are
# bit-identical across engines.
_CLS_BUCKET_SQL = """(((strpos('0123456789abcdef', substr(md5(w), 1, 1)) - 1) * 4096
            + (strpos('0123456789abcdef', substr(md5(w), 2, 1)) - 1) * 256
            + (strpos('0123456789abcdef', substr(md5(w), 3, 1)) - 1) * 16
            + (strpos('0123456789abcdef', substr(md5(w), 4, 1)) - 1)) % 1024)"""

_CLS_TRAINED_ORACLE = f"""
WITH qual AS ({_QUALITY_ORACLE}),
lab AS (SELECT doc_id, quality >= 0.5 AS y FROM qual),
toks AS (
    SELECT doc_id,
           unnest(list_filter(string_split_regex(lower(text), '\\s+'),
                              x -> x != '')) AS w
    FROM documents
),
occ AS (
    SELECT doc_id, {_CLS_BUCKET_SQL} AS bucket, COUNT(*) AS cnt
    FROM toks GROUP BY doc_id, {_CLS_BUCKET_SQL}
),
bkt AS (
    SELECT o.bucket,
           SUM(CASE WHEN l.y THEN o.cnt ELSE 0 END) AS c_pos,
           SUM(CASE WHEN l.y THEN 0 ELSE o.cnt END) AS c_neg
    FROM occ o JOIN lab l USING (doc_id) GROUP BY o.bucket
),
tot AS (SELECT SUM(c_pos) AS n_pos, SUM(c_neg) AS n_neg FROM bkt),
model AS (
    SELECT bucket,
           (1000000 * (c_pos + 1)) // (n_pos + 1024)
         - (1000000 * (c_neg + 1)) // (n_neg + 1024) AS w_ppm
    FROM bkt, tot
),
sc AS (
    SELECT o.doc_id, SUM(o.cnt * m.w_ppm) AS wsum, SUM(o.cnt) AS n
    FROM occ o JOIN model m USING (bucket) GROUP BY o.doc_id
)
SELECT d.doc_id, l.y AS label,
       CASE WHEN sc.n > 0
            THEN CAST(sc.wsum AS DOUBLE) / CAST(sc.n * 1000000 AS DOUBLE)
       END AS cls_score,
       COALESCE(CAST(sc.wsum AS DOUBLE) / CAST(sc.n * 1000000 AS DOUBLE) >= 0.0,
                FALSE) AS keep
FROM documents d
JOIN lab l USING (doc_id)
LEFT JOIN sc USING (doc_id)
"""


@register("text_classifier_trained", oracle=_CLS_TRAINED_ORACLE)
def text_classifier_trained_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hashed-NB quality classifier with weights TRAINED in-plan on a
    deterministic synthetic label (quality >= 0.5): the scoring path
    exercises real learned weights end-to-end instead of the
    hash-derived stand-in (which ``text_classifier`` retains as the
    inference-shape micro). Train = one explode + bucket groupBy over
    the corpus; the <=1024-row model broadcasts into the scorer — the
    literal "trained weights swap in as a broadcast table" contract
    from the README. The oracle re-derives training AND scoring, so
    the learned model itself is hash-verified, not just the scores.

    Scale: training is one corpus pass shuffling (bucket, two longs);
    scoring shuffles (id, bucket, cnt) then (id, two longs) — text
    never leaves the scan stage. The label gate reuses the narrow
    quality features; a production swap replaces `lab` with curated
    annotations and nothing else moves.
    """
    from wikidatabots_spark.functions.scale import pushdown_fence
    from wikidatabots_spark.operators.dedup import ensure_parallelism
    from wikidatabots_spark.operators.textstats import (
        bucket_occurrences,
        score_hashed_nb,
        train_hashed_nb,
    )

    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    # labels feed training AND the output join: fence the tiny
    # (id, label) frame so quality features compute once
    labeled = pushdown_fence(
        with_quality(ensure_parallelism(d, "doc_id")).select(
            "doc_id", (F.col("quality") >= 0.5).alias("label")
        )
    )
    # ONE text pass: the fenced (id, bucket, cnt) occurrence table
    # feeds training and scoring both (id+longs only past this point)
    occ = pushdown_fence(bucket_occurrences(d))
    model = train_hashed_nb(d, occ=occ, labels=labeled, label_col="label")
    scored = score_hashed_nb(d.select("doc_id"), model, occ=occ)
    return labeled.join(scored, "doc_id").select(
        "doc_id", "label", "cls_score", "keep"
    )


# span-removal oracle: rebuild the k=8 windows as strings, mark corpus-
# duplicated window texts, delete covered token positions per document
# with nested list lambdas, digest the cleaned text. COALESCE guards
# DuckDB's array_to_string([]) -> NULL (Spark array_join -> '').
_SPAN_REMOVAL_ORACLE = """
WITH words AS (
    SELECT doc_id,
           list_filter(string_split_regex(lower(text), '\\s+'),
                       x -> x != '') AS wl
    FROM documents
),
wins AS (
    SELECT doc_id, unnest(generate_series(1, greatest(len(wl) - 7, 0))) AS s,
           wl
    FROM words
),
wtext AS (
    SELECT doc_id, s, array_to_string(wl[s:s+7], ' ') AS win FROM wins
),
dupwin AS (SELECT win FROM wtext GROUP BY win HAVING COUNT(*) > 1),
dstarts AS (
    SELECT doc_id, list(s ORDER BY s) AS dups
    FROM wtext WHERE win IN (SELECT win FROM dupwin)
    GROUP BY doc_id
),
cleaned AS (
    SELECT w.doc_id,
           CAST(len(w.wl) AS BIGINT) AS n_tokens,
           list_transform(
               list_filter(generate_series(1, len(w.wl)),
                           j -> len(list_filter(COALESCE(d.dups, []),
                                                s -> s <= j AND s >= j - 7)) = 0),
               j -> w.wl[j]) AS kept
    FROM words w LEFT JOIN dstarts d ON d.doc_id = w.doc_id
)
SELECT doc_id, n_tokens,
       CAST(n_tokens - len(kept) AS BIGINT) AS n_removed,
       sha256(COALESCE(array_to_string(kept, ' '), '')) AS cleaned_sha256
FROM cleaned
"""


@register("dedup_span_removal", oracle=_SPAN_REMOVAL_ORACLE)
def dedup_span_removal_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Span-level dedup REMOVAL (Lee et al. ACL'22): every token covered
    by a corpus-duplicated 8-word window is deleted and the cleaned text
    re-emitted — doc-level dedup's destructive cousin that keeps the
    unique remainder. Digest projection pins the cleaned bytes."""
    from wikidatabots_spark.operators.dedup import remove_dup_spans

    out = remove_dup_spans(load_table(spark, sf_dir, "documents"), k=8)
    return out.select(
        "doc_id", "n_tokens", "n_removed",
        F.sha2("cleaned", 256).alias("cleaned_sha256"),
    )


def _hex_int_sql(col_expr: str, start: int, n: int) -> str:
    """SQL: integer value of ``n`` hex chars of ``col_expr`` starting at
    1-based ``start`` (the strpos ladder every md5-derived oracle uses)."""
    terms = [
        f"(strpos('0123456789abcdef', substr({col_expr}, {start + i}, 1)) - 1)"
        f" * {16 ** (n - 1 - i)}"
        for i in range(n)
    ]
    return "(" + " + ".join(terms) + ")"


def _hll_oracle() -> str:
    h16 = _hex_int_sql("hx", 1, 4)
    x = _hex_int_sql("hx", 5, 12)
    # alpha_64 * m^2 * 2^50: 0.709 * 64 is a power-of-two scaling of the
    # parsed double literal — exact, order-independent in both engines
    return f"""
WITH hashed AS (
    SELECT md5(CAST(user_id AS VARCHAR)) AS hx
    FROM events WHERE user_id IS NOT NULL
),
rr AS (
    SELECT CAST({h16} % 64 AS INT) AS register,
           CAST(CASE WHEN {x} = 0 THEN 49
                ELSE 49 - length(bin(CAST({x} AS BIGINT))) END AS INT) AS rank
    FROM hashed
),
regs AS (
    SELECT register, MAX(rank) AS max_rank FROM rr GROUP BY register
),
est AS (
    SELECT CAST(COUNT(*) AS BIGINT) AS n_registers,
           CAST(SUM(CAST(1 AS BIGINT) << (50 - max_rank)) AS BIGINT) AS s_hit
    FROM regs
)
SELECT r.register, r.max_rank,
       CAST(64 AS BIGINT) AS m,
       e.s_hit + (64 - e.n_registers) * (CAST(1 AS BIGINT) << 50) AS s_scaled,
       CAST(0.709 AS DOUBLE) * 64 * 64 * CAST(1125899906842624 AS DOUBLE) /
           CAST(e.s_hit + (64 - e.n_registers) * (CAST(1 AS BIGINT) << 50)
                AS DOUBLE) AS estimate
FROM regs r, est e
"""


@register("sketch_hll", oracle=_hll_oracle())
def sketch_hll_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog distinct-user sketch over the event stream: md5-
    deterministic registers (engine-exact, mergeable by element-wise
    max) plus the raw harmonic estimate attached to every row — shuffle
    traffic bounded at m=64 rows per map task regardless of stream
    size."""
    from wikidatabots_spark.operators.sketch import hll_estimate, hll_registers

    ev = load_table(spark, sf_dir, "events")
    regs = hll_registers(ev, "user_id", p=6)
    est = hll_estimate(regs, p=6).select("m", "s_scaled", "estimate")
    return regs.crossJoin(F.broadcast(est))


def _zorder_oracle(bits: int = 8) -> str:
    def interleave(expr: str, j: int) -> str:
        return " | ".join(
            f"((({expr} >> {i}) & 1) << {i * 2 + j})" for i in range(bits)
        )

    x = "(doc_id & 255)"
    y = "(n_chars & 255)"
    return f"""
SELECT doc_id,
       CAST({interleave(x, 0)} | {interleave(y, 1)} AS BIGINT) AS zkey
FROM documents
"""


@register("op_zorder_key", oracle=_zorder_oracle())
def op_zorder_key_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Morton (Z-order) clustering key over two dimensions — the layout
    primitive behind multi-dimensional row-group pruning; pure integer
    bit interleaving, engine-exact."""
    from wikidatabots_spark.functions.scale import zorder_key

    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        zorder_key(F.col("doc_id") % 256, F.col("n_chars") % 256, bits=8)
        .alias("zkey"),
    )


def _kmeans_oracle(k: int = 4, dim: int = 64, top_n: int = 1) -> str:
    # dist as a correlated list lambda; integer math end to end, one
    # Lloyd update between two assignments (mirrors kmeans_int_assign
    # rounds=2). Ties: lowest cluster id (row_number orders dist, cluster).
    # top_n > 1 returns the n nearest round-2 clusters per vector (the
    # IVF nprobe probe set — top_clusters_expr's mirror); default 1 is
    # the plain assignment every existing caller uses.
    return f"""
WITH q AS (
    SELECT vec_id,
           list_transform(embedding,
               x -> CAST(round((CAST(x AS DOUBLE) + 1.0) * 100) AS INT)) AS v
    FROM embeddings
),
c0 AS (SELECT CAST(vec_id AS INT) AS cluster, v AS cv FROM q WHERE vec_id < {k}),
d1 AS (
    SELECT q.vec_id, c.cluster,
           list_sum(list_transform(generate_series(1, {dim}),
               i -> CAST((q.v[i] - c.cv[i]) AS BIGINT)
                    * CAST((q.v[i] - c.cv[i]) AS BIGINT))) AS dist
    FROM q CROSS JOIN c0 c
),
a1 AS (
    SELECT vec_id, cluster FROM (
        SELECT vec_id, cluster,
               row_number() OVER (PARTITION BY vec_id
                                  ORDER BY dist, cluster) AS rn
        FROM d1
    ) WHERE rn = 1
),
cdims AS (
    SELECT a1.cluster, g.i,
           CAST(SUM(q.v[g.i]) // COUNT(*) AS INT) AS m
    FROM a1 JOIN q USING (vec_id), generate_series(1, {dim}) g(i)
    GROUP BY a1.cluster, g.i
),
c1 AS (
    SELECT cluster, list(m ORDER BY i) AS cv FROM cdims GROUP BY cluster
),
d2 AS (
    SELECT q.vec_id, c.cluster,
           list_sum(list_transform(generate_series(1, {dim}),
               i -> CAST((q.v[i] - c.cv[i]) AS BIGINT)
                    * CAST((q.v[i] - c.cv[i]) AS BIGINT))) AS dist
    FROM q CROSS JOIN c1 c
)
SELECT vec_id, cluster FROM (
    SELECT vec_id, cluster,
           row_number() OVER (PARTITION BY vec_id
                              ORDER BY dist, cluster) AS rn
    FROM d2
) WHERE rn <= {top_n}
"""


def _semdedup_oracle(threshold: float = 0.45) -> str:
    # composes the unrolled k-means assignment with within-cluster exact
    # cosine pairs; drop rule = "has a lower-id >= t neighbor in-cluster"
    return f"""
WITH asg AS ({_kmeans_oracle()}),
norms AS (
    SELECT vec_id,
           sqrt(SUM(CAST(embedding[i] AS DOUBLE) * CAST(embedding[i] AS DOUBLE)))
               AS nrm
    FROM embeddings, generate_series(1, 64) t(i)
    GROUP BY vec_id
),
pairs AS (
    SELECT ca.vec_id AS id_a, cb.vec_id AS id_b,
           SUM(CAST(ea.embedding[i] AS DOUBLE) * CAST(eb.embedding[i] AS DOUBLE))
               AS dot
    FROM asg ca
    JOIN asg cb ON ca.cluster = cb.cluster AND ca.vec_id < cb.vec_id
    JOIN embeddings ea ON ea.vec_id = ca.vec_id
    JOIN embeddings eb ON eb.vec_id = cb.vec_id,
    generate_series(1, 64) t(i)
    GROUP BY ca.vec_id, cb.vec_id
),
dropped AS (
    SELECT DISTINCT p.id_b
    FROM pairs p
    JOIN norms na ON na.vec_id = p.id_a
    JOIN norms nb ON nb.vec_id = p.id_b
    WHERE p.dot / (na.nrm * nb.nrm) >= {threshold}
)
SELECT a.vec_id, a.cluster,
       (a.vec_id NOT IN (SELECT id_b FROM dropped)) AS is_kept
FROM asg a
"""


@register("dedup_semantic", oracle=_semdedup_oracle())
def dedup_semantic_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup (Abbas et al. '23): k-means-cluster the embeddings, then
    exact cosine near-dup detection within each cluster only; a vector
    with a lower-id >=0.45 neighbor in its cluster is flagged dropped.
    The oracle unrolls the full composition — Lloyd rounds, cluster-
    fenced pair generation, the keep/drop verdict — so the whole
    sub-quadratic semantic-dedup pipeline is hash-verified end-to-end."""
    from wikidatabots_spark.operators.similarity import semdedup_flags

    return semdedup_flags(
        load_table(spark, sf_dir, "embeddings"), k=4, rounds=2, threshold=0.45
    )


@register("emb_kmeans", oracle=_kmeans_oracle())
def emb_kmeans_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic integer k-means over quantized embeddings (the IVF
    coarse-centroid training step): 2 Lloyd assignment rounds, integer
    distances, k-smallest-id init, ties to the lowest cluster — the
    full iteration is engine-exact and oracle-unrolled."""
    from wikidatabots_spark.operators.clustering import kmeans_int_assign

    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id",
        F.transform(
            "embedding",
            lambda x: F.round((x.cast("double") + F.lit(1.0)) * F.lit(100.0))
            .cast("int"),
        ).alias("v"),
    )
    out = kmeans_int_assign(emb, k=4, rounds=2, id_col="vec_id", vec_col="v")
    return out.select("vec_id", F.col("cluster").cast("int").alias("cluster"))


def _shard_manifest_oracle(n_shards: int = 64) -> str:
    def hex_int(md5_expr: str, ndigits: int) -> str:
        terms = " + ".join(
            f"(strpos('0123456789abcdef', substr({md5_expr}, {i + 1}, 1)) - 1)"
            f" * {16 ** (ndigits - 1 - i)}"
            for i in range(ndigits)
        )
        return f"({terms})"

    shard = hex_int("md5('shard:' || CAST(doc_id AS VARCHAR))", 4)
    rowh = hex_int("md5(CAST(doc_id AS VARCHAR) || ':' || text)", 8)
    return f"""
WITH sharded AS (
    SELECT {shard} % {n_shards} AS shard,
           CAST({rowh} AS BIGINT) AS h,
           n_chars
    FROM documents
)
SELECT CAST(shard AS INT) AS shard,
       COUNT(*) AS n_rows,
       CAST(SUM(n_chars) AS BIGINT) AS total_size,
       bit_xor(h) AS checksum
FROM sharded
GROUP BY shard
"""


@register("corpus_shard_manifest", oracle=_shard_manifest_oracle())
def corpus_shard_manifest_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-shard export manifest (sinks.training_shards): the
    deterministic content-hash shard assignment plus per-shard row
    counts, byte totals, and ORDER-INSENSITIVE XOR checksums — the
    verification artifact a trainer checks before consuming an exported
    corpus. Assignment is a narrow map; the only shuffle is the
    per-shard aggregation (map-side partials), the same exchange the
    shard write itself needs."""
    from wikidatabots_spark.sinks.training_shards import shard_manifest

    return shard_manifest(
        load_table(spark, sf_dir, "documents"), n_shards=64
    )


def _chunk_oracle(chunk: int = 64, stride: int = 48) -> str:
    return f"""
WITH words AS (
    SELECT doc_id,
           list_filter(string_split_regex(lower(text), '\\s+'),
                       x -> x != '') AS wl
    FROM documents
),
ch AS (
    SELECT doc_id, wl,
           unnest(generate_series(0, (len(wl) - 1) // {stride})) AS chunk_idx
    FROM words WHERE len(wl) > 0
)
SELECT doc_id,
       CAST(chunk_idx AS BIGINT) AS chunk_idx,
       array_to_string(
           list_slice(wl, chunk_idx * {stride} + 1,
                      chunk_idx * {stride} + {chunk}), ' ') AS chunk_text,
       CAST(len(list_slice(wl, chunk_idx * {stride} + 1,
                           chunk_idx * {stride} + {chunk})) AS BIGINT)
           AS n_tokens
FROM ch
"""


@register("corpus_chunk_windows", oracle=_chunk_oracle())
def corpus_chunk_windows_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-window chunking with overlap (context-window prep / RAG
    indexing unit): 64-word windows, stride 48 — a zero-shuffle narrow
    map; every window's text and token count hash-checked."""
    from wikidatabots_spark.operators.textstats import chunk_documents

    return chunk_documents(
        load_table(spark, sf_dir, "documents"), chunk=64, stride=48
    )


_QUALITY_TOPFRAC_ORACLE = f"""
WITH qual AS ({_QUALITY_ORACLE}),
ranked AS (
    SELECT d.source, q.doc_id, q.quality,
           row_number() OVER (PARTITION BY d.source
                              ORDER BY q.quality DESC, q.doc_id) AS rn,
           COUNT(*) OVER (PARTITION BY d.source) AS cnt
    FROM qual q JOIN documents d USING (doc_id)
)
SELECT source, doc_id, quality, CAST(rn AS BIGINT) AS rank_in_source
FROM ranked
WHERE rn <= CEIL(0.5 * cnt)
"""


@register("text_quality_topfrac", oracle=_QUALITY_TOPFRAC_ORACLE)
def text_quality_topfrac_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source DYNAMIC quality gate: keep each source's top 50% by
    quality score (rank-based, ties to lowest doc_id) — the per-domain
    adaptive threshold real pipelines use instead of one global cut
    (a fixed threshold over-prunes weak domains and under-prunes strong
    ones). Exact rank math, no percentile interpolation — engine-exact
    by construction. One exchange (the source window partitioning);
    the quality features fuse into the scan stage."""
    from pyspark.sql import Window

    from wikidatabots_spark.operators.textstats import with_quality

    d = load_table(spark, sf_dir, "documents")
    scored = with_quality(d).select("source", "doc_id", "quality")
    w = Window.partitionBy("source").orderBy(
        F.col("quality").desc(), F.col("doc_id")
    )
    wc = Window.partitionBy("source")
    return (
        scored.withColumn("rank_in_source", F.row_number().over(w))
        .withColumn("__cnt", F.count(F.lit(1)).over(wc))
        .where(F.col("rank_in_source") <= F.ceil(F.lit(0.5) * F.col("__cnt")))
        .select(
            "source",
            "doc_id",
            "quality",
            F.col("rank_in_source").cast("bigint").alias("rank_in_source"),
        )
    )


def _pagerank_oracle(iters: int = 2, m: int = 1_000_000_000) -> str:
    # unrolled integer PageRank over the symmetrized winnow pair graph;
    # every intermediate is a non-negative integer so // == Spark div
    ctes = [
        f"pairs AS ({_WINNOW_PAIRS_ORACLE})",
        "sym AS (SELECT id_a AS u, id_b AS v FROM pairs"
        " UNION ALL SELECT id_b, id_a FROM pairs)",
        "deg AS (SELECT u, CAST(COUNT(*) AS BIGINT) AS deg FROM sym GROUP BY u)",
        "nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM deg)",
        f"r0 AS (SELECT u, {m} // nn.n AS rank, deg FROM deg, nn)",
    ]
    prev = "r0"
    for i in range(1, iters + 1):
        ctes.append(
            f"c{i} AS (SELECT s.v AS u,"
            f" CAST(SUM(r.rank // r.deg) AS BIGINT) AS inc"
            f" FROM sym s JOIN {prev} r ON r.u = s.u GROUP BY s.v)"
        )
        ctes.append(
            f"r{i} AS (SELECT d.u,"
            f" (15 * ({m} // nn.n)) // 100"
            f" + (85 * COALESCE(c{i}.inc, 0)) // 100 AS rank, d.deg"
            f" FROM deg d CROSS JOIN nn LEFT JOIN c{i} ON c{i}.u = d.u)"
        )
        prev = f"r{i}"
    body = ",\n".join(ctes)
    return f"""
WITH {body}
SELECT u AS node, CAST(rank AS BIGINT) AS rank FROM {prev}
"""


@register("graph_pagerank_dupgraph", oracle=_pagerank_oracle())
def graph_pagerank_dupgraph_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Integer PageRank (2 unrolled iterations, damping 0.85 as exact
    integer ops) over the winnowing near-dup pair graph: high-rank
    nodes are boilerplate/template hubs — a curation signal the
    connected-component id cannot provide. Per iteration: one
    edges-to-ranks equi-join + one destination-keyed aggregation (the
    classic distributed PageRank step); the oracle unrolls the whole
    fixed-point-free computation CTE by CTE."""
    from wikidatabots_spark.operators.graph import pagerank_int

    pairs = dedup_winnow_q(spark, sf_dir)
    return pagerank_int(pairs, iters=2)


_MM_PHASH_NEAR_ORACLE = """
WITH h AS (
    SELECT doc_id AS media_id, sha256(text) AS hx FROM documents
),
ints AS (
    SELECT media_id,
           list_transform(generate_series(0, 15),
               i -> (strpos('0123456789abcdef', substr(hx, 2*i + 1, 1)) - 1) * 16
                  + (strpos('0123456789abcdef', substr(hx, 2*i + 2, 1)) - 1)) AS bs
    FROM ints_src
),
ph AS (
    SELECT media_id,
           CAST(list_sum(list_transform(generate_series(0, 15),
               i -> CASE WHEN bs[i + 1] >= CAST(list_sum(bs) AS BIGINT) // 16
                         THEN CAST(1 AS BIGINT) << i
                         ELSE CAST(0 AS BIGINT) END)) AS BIGINT) AS phash
    FROM ints
),
sliced AS (
    SELECT media_id, phash, j AS slice_idx,
           (phash >> (4 * j)) & 15 AS slice_val
    FROM ph, generate_series(0, 3) t(j)
),
cand AS (
    SELECT DISTINCT a.media_id AS id_a, b.media_id AS id_b,
           a.phash AS fa, b.phash AS fb
    FROM sliced a
    JOIN sliced b ON a.slice_idx = b.slice_idx
                 AND a.slice_val = b.slice_val
                 AND a.media_id < b.media_id
)
SELECT id_a, id_b, CAST(bit_count(xor(fa, fb)) AS INT) AS hamming
FROM cand
WHERE bit_count(xor(fa, fb)) <= 3
""".replace("FROM ints_src", "FROM h")


@register("mm_phash_near", oracle=_MM_PHASH_NEAR_ORACLE)
def mm_phash_near_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual near-dup media pairs: aHash (mean-thresholded feature
    bytes, engine-exact integer math) + pigeonhole Hamming-LSH (16-bit
    hash, 4 slices of 4 bits, exact recall ≤ 3 flipped bits) — the
    media analog of dedup_simhash_near, reusing the same generic
    hamming_near_pairs machinery. The blob never shuffles; only the
    16-bit hash does. (At production scale use a 64-bit phash — a
    16-bit space birthday-collides quickly; dims here match the
    container's stubbed 16-dim features.)"""
    from wikidatabots_spark.operators.dedup import hamming_near_pairs
    from wikidatabots_spark.operators.multimodal import (
        extract_features,
        perceptual_hash,
    )

    d = load_table(spark, sf_dir, "documents").select(
        F.col("doc_id").alias("media_id"),
        F.encode(F.col("text"), "UTF-8").alias("data"),
    )
    ph = perceptual_hash(extract_features(d)).select("media_id", "phash")
    return hamming_near_pairs(
        ph,
        id_col="media_id",
        fp_col="phash",
        n_slices=4,
        slice_bits=4,
        max_hamming=3,
    )


def _hll_by_type_oracle() -> str:
    h16 = _hex_int_sql("hx", 1, 4)
    x = _hex_int_sql("hx", 5, 12)
    return f"""
WITH hashed AS (
    SELECT event_type, md5(CAST(user_id AS VARCHAR)) AS hx
    FROM events WHERE user_id IS NOT NULL
),
rr AS (
    SELECT event_type,
           CAST({h16} % 64 AS INT) AS register,
           CAST(CASE WHEN {x} = 0 THEN 49
                ELSE 49 - length(bin(CAST({x} AS BIGINT))) END AS INT) AS rank
    FROM hashed
),
regs AS (
    SELECT event_type, register, MAX(rank) AS max_rank
    FROM rr GROUP BY event_type, register
),
est AS (
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_registers,
           CAST(SUM(CAST(1 AS BIGINT) << (50 - max_rank)) AS BIGINT) AS s_hit
    FROM regs GROUP BY event_type
)
SELECT event_type,
       CAST(64 AS BIGINT) AS m,
       n_registers,
       s_hit + (64 - n_registers) * (CAST(1 AS BIGINT) << 50) AS s_scaled,
       CAST(0.709 AS DOUBLE) * 64 * 64 * CAST(1125899906842624 AS DOUBLE) /
           CAST(s_hit + (64 - n_registers) * (CAST(1 AS BIGINT) << 50)
                AS DOUBLE) AS estimate
FROM est
"""


@register("sketch_hll_by_type", oracle=_hll_by_type_oracle())
def sketch_hll_by_type_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPED HyperLogLog: distinct users per event_type as one
    sketch per group — the shape distinct-count dashboards actually
    ship at scale (shuffle bounded at groups x m=64 rows regardless of
    stream size; per-group sketches stay mergeable across days). Same
    engine-exact register/rank math as sketch_hll, grouped."""
    from wikidatabots_spark.operators.sketch import hll_estimate, hll_registers

    ev = load_table(spark, sf_dir, "events")
    regs = hll_registers(ev, "user_id", p=6, group_cols=("event_type",))
    return hll_estimate(regs, p=6, group_cols=("event_type",))


_LENGTH_QUANTILES_ORACLE = """
WITH ranked AS (
    SELECT source, n_chars,
           row_number() OVER (PARTITION BY source
                              ORDER BY n_chars, doc_id) AS rn,
           COUNT(*) OVER (PARTITION BY source) AS cnt
    FROM documents
)
SELECT source,
       CAST(MAX(cnt) AS BIGINT) AS n_docs,
       CAST(MAX(CASE WHEN rn = CEIL(0.5 * cnt) THEN n_chars END) AS BIGINT)
           AS p50_chars,
       CAST(MAX(CASE WHEN rn = CEIL(0.9 * cnt) THEN n_chars END) AS BIGINT)
           AS p90_chars,
       CAST(MAX(n_chars) AS BIGINT) AS max_chars
FROM ranked
GROUP BY source
"""


@register("corpus_length_quantiles", oracle=_LENGTH_QUANTILES_ORACLE)
def corpus_length_quantiles_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source EXACT length quantiles (p50/p90 by rank — element at
    ceil(q*n), no interpolation, so both engines agree bit-for-bit,
    unlike percentile_cont whose interpolation arithmetic differs):
    the corpus profiling table a mixture design starts from. One
    exchange (the source window), aggregation fused."""
    from pyspark.sql import Window

    d = load_table(spark, sf_dir, "documents").select(
        "source", "n_chars", "doc_id"
    )
    w = Window.partitionBy("source").orderBy("n_chars", "doc_id")
    wc = Window.partitionBy("source")
    ranked = d.withColumn("rn", F.row_number().over(w)).withColumn(
        "cnt", F.count(F.lit(1)).over(wc)
    )
    q = lambda frac: F.max(  # noqa: E731
        F.when(
            F.col("rn") == F.ceil(F.lit(frac) * F.col("cnt")), F.col("n_chars")
        )
    ).cast("bigint")
    return ranked.groupBy("source").agg(
        F.max("cnt").cast("bigint").alias("n_docs"),
        q(0.5).alias("p50_chars"),
        q(0.9).alias("p90_chars"),
        F.max("n_chars").cast("bigint").alias("max_chars"),
    )


# ---------------------------------------------------------------------------
# corpus_shard_rendezvous — consistent (HRW) sharding with minimal movement
# ---------------------------------------------------------------------------

_HRW_N_OLD = 8


def _rendezvous_oracle(n_old: int = _HRW_N_OLD) -> str:
    def hex_int(md5_expr: str, ndigits: int = 13) -> str:
        terms = " + ".join(
            f"(strpos('0123456789abcdef', substr({md5_expr}, {i + 1}, 1)) - 1)"
            f" * {16 ** (ndigits - 1 - i)}"
            for i in range(ndigits)
        )
        return f"({terms})"

    h = hex_int(
        "md5('hrw:' || CAST(doc_id AS VARCHAR) || ':' || CAST(s AS VARCHAR))"
    )
    return f"""
WITH shards AS (SELECT unnest(range(0, {n_old + 1})) AS s),
hashes AS (
    SELECT doc_id, s, CAST({h} AS BIGINT) AS h
    FROM documents, shards
),
old AS (
    SELECT doc_id, s AS shard_old FROM (
        SELECT doc_id, s,
               row_number() OVER (PARTITION BY doc_id
                                  ORDER BY h DESC, s DESC) AS rk
        FROM hashes WHERE s < {n_old}) t WHERE rk = 1
),
new AS (
    SELECT doc_id, s AS shard_new FROM (
        SELECT doc_id, s,
               row_number() OVER (PARTITION BY doc_id
                                  ORDER BY h DESC, s DESC) AS rk
        FROM hashes) t WHERE rk = 1
)
SELECT o.doc_id,
       CAST(o.shard_old AS INT) AS shard_old,
       CAST(n.shard_new AS INT) AS shard_new,
       CAST(o.shard_old <> n.shard_new AS INT) AS moved
FROM old o JOIN new n USING (doc_id)
"""


@register("corpus_shard_rendezvous", oracle=_rendezvous_oracle())
def corpus_shard_rendezvous_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rendezvous (highest-random-weight) sharding: doc -> argmax_s
    md5('hrw:' || doc_id || ':' || s) — the CONSISTENT assignment whose
    defining property is minimal movement under resharding: growing
    8 -> 9 shards moves only docs whose new shard WINS the argmax, i.e.
    every moved doc lands on the NEW shard and the expected moved
    fraction is exactly 1/9 (a modulo reshard would move ~8/9 of the
    corpus). The per-doc (shard_old, shard_new, moved) output makes the
    property hash-checkable; tests/test_operators.py pins it.

    Complements ``corpus_shard_manifest`` (static content-hash shards):
    this is the primitive for GROWING a 100 TB sharded corpus in place
    — recompute assignment, copy only `moved` rows.

    Scale: ZERO shuffles — both argmaxes evaluate per row over a
    9-element literal array (array_max over (hash, shard) structs,
    whole-stage codegen, no explode, no join); the plan is a bare
    Project over the scan. At any shard count N the cost is O(N) per
    row map-side; for N in the thousands the same argmax rides
    ``F.aggregate`` over a broadcast shard list unchanged.
    """
    d = load_table(spark, sf_dir, "documents").select("doc_id")

    def hrw(s):
        return F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.lit("hrw:"),
                        F.col("doc_id").cast("string"),
                        F.lit(":"),
                        s.cast("string"),
                    )
                ),
                1,
                13,
            ),
            16,
            10,
        ).cast("long")

    def pick(n: int):
        arr = F.transform(
            F.sequence(F.lit(0), F.lit(n - 1)),
            lambda s: F.struct(hrw(s).alias("h"), s.alias("s")),
        )
        return F.array_max(arr)["s"].cast("int")

    return (
        d.withColumn("shard_old", pick(_HRW_N_OLD))
        .withColumn("shard_new", pick(_HRW_N_OLD + 1))
        .withColumn(
            "moved", (F.col("shard_old") != F.col("shard_new")).cast("int")
        )
    )


# ---------------------------------------------------------------------------
# dedup_skew_hotbucket — the adversarial hot-bucket cluster, PRICED
# ---------------------------------------------------------------------------

_SKEW_N_HOT = 10_000

_SKEW_ORACLE = f"""
WITH hot AS (
    SELECT text FROM documents WHERE length(text) > 0
    ORDER BY n_chars DESC, doc_id LIMIT 1
)
SELECT CAST(t.i AS BIGINT) AS node, CAST(0 AS BIGINT) AS component
FROM generate_series(0, {_SKEW_N_HOT - 1}) t(i), hot
"""


@register("dedup_skew_hotbucket", oracle=_SKEW_ORACLE)
def dedup_skew_hotbucket_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The adversarial boilerplate-cluster input as a PRICED headliner
    (VERDICT r11 next #5): 10^4 byte-identical documents — every band
    bucket maximally hot — pushed through the capped MinHash band join
    plus min-label CC. The row bound is correctness-pinned by
    tests/test_dedup_skew.py (capped join emits ≤ cap·f rows, not
    ~f²/2); this entry records the capped join's COST as a bench
    number, so a regression that re-introduces the quadratic blowup
    shows up as a wall-clock cliff (~5·10^7 pair rows at f = 4·10^4),
    not just a failed row-count assertion.

    The hot text derives from the corpus (the longest document —
    deterministic ORDER BY n_chars DESC, doc_id), replicated via a
    zero-shuffle ``spark.range`` crossJoin against the broadcast 1-row
    text (the scalar-subquery pattern). All replicas share identical
    signatures BY DEFINITION, so the closure is analytic: every node
    labels to component 0 — which is exactly what the oracle states;
    an engine-side bug (empty band table, broken cap transitivity,
    CC miss) surfaces as missing/mislabeled rows.

    Scale: this is the worst-case input for LSH dedup at corpus scale
    — a template page mirrored f times. The capped join keeps the
    pair volume linear in f, AQE splits the still-hot buckets, and CC
    transitivity through the bucket minimum recovers the cluster."""
    from wikidatabots_spark.operators.dedup import (
        band_pairs,
        connected_components,
        minhash_band_table,
    )
    from wikidatabots_spark.functions.scale import pushdown_fence

    d = load_table(spark, sf_dir, "documents")
    hot = (
        d.where(F.length("text") > 0)
        .orderBy(F.desc("n_chars"), "doc_id")
        .limit(1)
        .select("text")
    )
    docs = spark.range(_SKEW_N_HOT).select(
        F.col("id").alias("doc_id")
    ).crossJoin(F.broadcast(hot))
    bands = pushdown_fence(minhash_band_table(docs))
    return connected_components(band_pairs(bands)).select(
        "node", "component"
    )


# ---------------------------------------------------------------------------
# op_higher_order_arrays — the array HOF surface in one narrow projection
# ---------------------------------------------------------------------------

_HOF_ARRAYS_ORACLE = r"""
WITH w AS (
    SELECT doc_id,
           list_filter(string_split_regex(lower(text), '\s+'),
                       x -> x != '') AS wl
    FROM documents
)
SELECT doc_id,
       CAST(len(wl) AS BIGINT) AS n_words,
       CAST(len(list_filter(wl, x -> length(x) >= 5)) AS BIGINT) AS n_long,
       CAST(COALESCE(list_aggregate(list_transform(wl, x -> length(x)),
                                    'sum'), 0) AS BIGINT) AS sum_len,
       CAST(COALESCE(list_aggregate(list_transform(wl, x -> length(x)),
                                    'max'), 0) AS BIGINT) AS max_len,
       len(list_filter(wl, x -> x = 'the')) > 0 AS has_the,
       len(list_filter(wl, x -> length(x) >= 20)) = 0 AS all_short
FROM w
"""


@register("op_higher_order_arrays", oracle=_HOF_ARRAYS_ORACLE)
def op_higher_order_arrays(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The whole array higher-order-function surface — ``filter``,
    ``transform``, ``aggregate`` (explicit fold with a typed zero),
    ``exists``, ``forall``, plus ``array_max`` — in one narrow per-doc
    projection over the tokenized text, each pinned by a scalar the
    driver hashes (the oracle re-expresses every lambda as a DuckDB
    list lambda). ``aggregate`` seeds a BIGINT zero so the fold is
    overflow-proof; empty token lists hit the ``aggregate`` zero /
    ``array_max`` null → COALESCE 0 edge on both sides.

    Scale: HOFs run inside whole-stage codegen on the JVM — this is the
    designed alternative to a Python UDF for per-row array logic: zero
    shuffle, zero Python, the array never leaves the scan's stage. One
    caveat pinned elsewhere (``functions.scale.pushdown_fence``): no
    CSE through lambdas, so the shared ``words()`` array is built once
    per consuming expression — fine here where the split is the cheap
    part, a fence when it isn't.
    """
    from wikidatabots_spark.operators.textstats import words

    d = load_table(spark, sf_dir, "documents")
    wl = words(F.col("text"))
    return d.select(
        "doc_id",
        F.size(wl).cast("bigint").alias("n_words"),
        F.size(F.filter(wl, lambda x: F.length(x) >= 5))
        .cast("bigint")
        .alias("n_long"),
        F.aggregate(
            wl, F.lit(0).cast("bigint"), lambda acc, x: acc + F.length(x)
        ).alias("sum_len"),
        F.coalesce(
            F.array_max(F.transform(wl, lambda x: F.length(x).cast("bigint"))),
            F.lit(0).cast("bigint"),
        ).alias("max_len"),
        F.exists(wl, lambda x: x == F.lit("the")).alias("has_the"),
        F.forall(wl, lambda x: F.length(x) < F.lit(20)).alias("all_short"),
    )
