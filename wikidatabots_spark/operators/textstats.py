"""Text analysis operators over a document corpus.

All pure Column expressions (JVM codegen, zero Python in the hot path):

- ``with_token_count``  whitespace tokenization + a BPE-ish sub-token
  estimate (regex word/number/punct split)
- ``with_quality``      length / punctuation / stopword-ratio features and
  a composite quality score
- ``with_lang_guess``   marker-word n-gram heuristic language ID
- ``with_fingerprint``  normalized-content digest (whitespace-collapsed
  md5) — the cheap "same modulo formatting" key

Scale: every operator is a narrow map over the text column — no shuffle,
pipeline-able with the parquet scan; fingerprints/dedup keys are the only
things later stages aggregate on, so the wide text column never shuffles.
North-star extension (BASELINE.json) — no reference counterpart.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

STOPWORDS = ["the", "a", "an", "of", "to", "and", "in", "is", "on", "for"]

# tiny marker lexicons for the language-ID heuristic
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "is"],
    "es": ["el", "la", "de", "que", "y"],
    "fr": ["le", "la", "et", "les", "des"],
    "de": ["der", "die", "und", "das", "ist"],
}

_PUNCT_RE = r"[^.,!?;:]"
_SUBTOKEN_RE = r"[a-z]+|[0-9]+|[^a-z0-9\s]"


def words(text: Column) -> Column:
    """Lowercased whitespace tokens, empties removed."""
    return F.filter(F.split(F.lower(text), r"\s+"), lambda w: w != "")


def with_token_count(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Word count + BPE-ish sub-token count (letters / digits / symbol runs)."""
    t = F.col(text_col)
    return df.withColumns(
        {
            "n_words": F.size(words(t)).cast("bigint"),
            "n_subtokens": F.size(
                F.regexp_extract_all(F.lower(t), F.lit(_SUBTOKEN_RE), F.lit(0))
            ).cast("bigint"),
        }
    )


def with_quality(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Length/punct/stopword features + composite quality score.

    The score formula is a fixed arithmetic tree (no reassociated sums) so
    it is bit-reproducible across engines. The word array is materialized
    once (``__w``) — expression trees referenced from several features
    would re-split the text per reference (no CSE through lambdas).
    """
    df = df.withColumn("__w", words(F.col(text_col)))
    t = F.col(text_col)
    w = F.col("__w")
    n_words = F.size(w)
    n_chars = F.length(t)
    n_punct = F.length(F.regexp_replace(t, _PUNCT_RE, ""))
    n_stop = F.size(F.filter(w, lambda x: x.isin(STOPWORDS)))
    avg_word_len = F.when(
        n_words > 0,
        (n_chars - (n_words - F.lit(1))).cast("double") / n_words,
    ).otherwise(F.lit(0.0))
    stop_ratio = F.when(n_words > 0, n_stop.cast("double") / n_words).otherwise(
        F.lit(0.0)
    )
    punct_ratio = F.when(n_chars > 0, n_punct.cast("double") / n_chars).otherwise(
        F.lit(0.0)
    )
    quality = (
        F.least(n_words.cast("double") / F.lit(100.0), F.lit(1.0)) * F.lit(0.5)
        + stop_ratio * F.lit(0.3)
        + (F.lit(1.0) - punct_ratio) * F.lit(0.2)
    )
    return df.withColumns(
        {
            "n_words": n_words.cast("bigint"),
            "n_punct": n_punct.cast("bigint"),
            "n_stopwords": n_stop.cast("bigint"),
            "avg_word_len": avg_word_len,
            "stopword_ratio": stop_ratio,
            "punct_ratio": punct_ratio,
            "quality": quality,
        }
    ).drop("__w")


def with_lang_guess(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Marker-word language ID: argmax of per-language marker counts.

    Ties resolve in fixed language order (en, es, fr, de); zero markers →
    'und'. Counts occurrences (not distinct words) so longer texts vote
    proportionally.
    """
    df = df.withColumn("__w", words(F.col(text_col)))
    w = F.col("__w")

    def marker_count(markers: list[str]) -> Column:
        # bind via a real function scope: a 2-param lambda would be called
        # by F.filter as (element, index)
        return F.size(F.filter(w, lambda x: x.isin(markers)))

    scores = {lang: marker_count(markers) for lang, markers in LANG_MARKERS.items()}
    langs = list(LANG_MARKERS)
    # argmax with fixed tie order: first language reaching the max wins
    max_score = scores[langs[0]]
    for lang in langs[1:]:
        max_score = F.greatest(max_score, scores[lang])
    guess = F.lit("und")
    for lang in reversed(langs):
        guess = F.when(
            (scores[lang] == max_score) & (max_score > 0), F.lit(lang)
        ).otherwise(guess)
    return df.withColumn("lang_guess", guess).drop("__w")


def with_fingerprint(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Whitespace-normalized content digest (formatting-insensitive key)."""
    return df.withColumn(
        "fingerprint",
        F.md5(F.trim(F.regexp_replace(F.lower(F.col(text_col)), r"\s+", " "))),
    )
