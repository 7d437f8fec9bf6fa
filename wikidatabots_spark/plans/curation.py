"""End-to-end corpus curation: the composed production pipeline a
training-data run actually executes, as one oracle-checked query.

Stages (all existing operators, composed):

1. exact dedup      — keep the lowest doc_id per md5(text)
2. near-dup removal — SimHash fingerprint equality; drop the higher id of
                      every duplicate pair (survivor = lowest id in group)
3. quality gate     — composite quality score ≥ 0.5 (textstats)
4. language gate    — marker-word language ID == 'en'
5. split assignment — deterministic md5-hash split (train/holdout 90/10),
                      the same content-hash Bernoulli as ``sample_hash``:
                      membership depends only on doc_id, so re-runs and
                      backfills select identical rows

Scale shape: stages 1-2 shuffle only (hash, id) pairs — never text; 3-5
are narrow maps fused into one stage by codegen. The oracle reproduces
every stage in DuckDB (md5 fingerprints, integer SimHash, fixed
arithmetic quality score), so the full pipeline is hash-verified
end-to-end, not just per-operator.

No reference counterpart (north-star extension; the reference's closest
shape is its dedupe-then-filter-then-emit pipelines, wd_tmdb.py:214-262).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from wikidatabots_spark.operators.dedup import simhash
from wikidatabots_spark.operators.textstats import with_lang_guess, with_quality
from wikidatabots_spark.plans.extensions import (
    _LANGID_ORACLE,
    _QUALITY_ORACLE,
    _simhash_oracle,
)
from wikidatabots_spark.plans.registry import register
from wikidatabots_spark.sources.tables import load_table

# split threshold: first 4 md5 hex digits of 'split:'||doc_id, 90% train
_SPLIT_FRAC = 0.9
_SPLIT_CUT = int(_SPLIT_FRAC * 65536)

_CURATE_ORACLE = f"""
WITH qual AS ({_QUALITY_ORACLE}),
lng AS ({_LANGID_ORACLE}),
fp AS ({_simhash_oracle()}),
exact_canon AS (
    SELECT MIN(doc_id) AS doc_id
    FROM documents
    GROUP BY md5(text)
),
near_canon AS (
    SELECT MIN(doc_id) AS doc_id
    FROM fp
    GROUP BY simhash
),
survivors AS (
    SELECT e.doc_id FROM exact_canon e JOIN near_canon n USING (doc_id)
),
bucket AS (
    SELECT doc_id,
           (strpos('0123456789abcdef', substr(md5('split:' || CAST(doc_id AS VARCHAR)), 1, 1)) - 1) * 4096
         + (strpos('0123456789abcdef', substr(md5('split:' || CAST(doc_id AS VARCHAR)), 2, 1)) - 1) * 256
         + (strpos('0123456789abcdef', substr(md5('split:' || CAST(doc_id AS VARCHAR)), 3, 1)) - 1) * 16
         + (strpos('0123456789abcdef', substr(md5('split:' || CAST(doc_id AS VARCHAR)), 4, 1)) - 1) AS b
    FROM documents
)
SELECT s.doc_id,
       lng.lang_guess,
       qual.quality,
       CASE WHEN bucket.b < {_SPLIT_CUT} THEN 'train' ELSE 'holdout' END AS split
FROM survivors s
JOIN qual ON qual.doc_id = s.doc_id
JOIN lng ON lng.doc_id = s.doc_id
JOIN bucket ON bucket.doc_id = s.doc_id
WHERE qual.quality >= 0.5 AND lng.lang_guess = 'en'
"""


@register("curate_corpus", oracle=_CURATE_ORACLE)
def curate_corpus_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    # 1. exact-dup survivors: lowest id per content hash — only (hash, id)
    #    pairs shuffle, the text column stays in the scan stage
    exact = (
        d.select(F.md5("text").alias("h"), "doc_id")
        .groupBy("h")
        .agg(F.min("doc_id").alias("doc_id"))
        .select("doc_id")
    )
    # 2. near-dup survivors: lowest id per SimHash fingerprint
    near = (
        simhash(d)
        .groupBy("simhash")
        .agg(F.min("doc_id").alias("doc_id"))
        .select("doc_id")
    )
    survivors = exact.join(near, "doc_id")
    # 3-5. narrow maps: quality + language + deterministic split, then the
    #      gates; one codegen stage over the surviving documents. The
    #      parallelism guard spreads the single-file local scan across the
    #      cluster width (no-op on real multi-split inputs).
    from wikidatabots_spark.operators.dedup import ensure_parallelism

    scored = with_lang_guess(with_quality(ensure_parallelism(d, "doc_id"))).select(
        "doc_id", "lang_guess", "quality"
    )
    split_bucket = F.conv(
        F.substring(
            F.md5(F.concat(F.lit("split:"), F.col("doc_id").cast("string"))), 1, 4
        ),
        16,
        10,
    ).cast("long")
    return (
        survivors.join(scored, "doc_id")
        .where((F.col("quality") >= 0.5) & (F.col("lang_guess") == "en"))
        .withColumn(
            "split",
            F.when(split_bucket < _SPLIT_CUT, F.lit("train")).otherwise(
                F.lit("holdout")
            ),
        )
    )
