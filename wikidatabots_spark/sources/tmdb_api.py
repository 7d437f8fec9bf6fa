"""TMDB API column helpers — the reference's most distinctive call sites
(wd_tmdb.py:19-86), re-expressed over the generic HTTP column operator.

- ``tmdb_find``: IMDb/TVDB external id → TMDB id via ``/find`` (
  wd_tmdb.py:58-86): build the request URL per row, GET, decode the JSON
  with the declared find-result dtype (:49-55), take the first result id
  (:80-82 ``.list.first()``).
- ``tmdb_exists``: id → does ``/{type}/{id}`` resolve (wd_tmdb.py:19-46),
  used by the deprecation pipeline's or_() disjunction (:375-380).

``base_url`` is injectable so tests hit a local fixture server with the
pinned answers from FIXTURES.md §5 — no live network.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from wikidatabots_spark.functions.core import pl_format
from wikidatabots_spark.functions.structs import prepare_request, tmdb_find_result_type
from wikidatabots_spark.sources.http import http_get, response_text

TMDB_BASE = "https://api.themoviedb.org/3"
RETRY_COUNT = 3  # wd_tmdb.py:39,76


def tmdb_find(
    df: DataFrame,
    ext_id_col: str,
    media_type: str,
    api_key: str = "",
    external_source: str = "imdb_id",
    base_url: str = TMDB_BASE,
    out_col: str = "tmdb_id",
) -> DataFrame:
    """Append ``out_col``: the first ``{media_type}_results[].id`` for the
    row's external id, null when the lookup misses (list.first on empty
    → null, wd_tmdb.py:80-82)."""
    url = pl_format(
        "%s/find/{}?api_key=%s&external_source=%s"
        % (base_url, api_key, external_source),
        F.col(ext_id_col),
    )
    req = df.withColumn("__req", prepare_request(url))
    resp = http_get(req, request_col="__req", response_col="__resp",
                    retry_count=RETRY_COUNT)
    parsed = F.from_json(
        response_text("__resp"), tmdb_find_result_type(media_type)
    ).getField(f"{media_type}_results")
    # try_element_at: empty result array → null even under ANSI mode
    return resp.withColumn(
        out_col, F.try_element_at(parsed, F.lit(1)).getField("id")
    ).drop("__req", "__resp")


def tmdb_exists(
    df: DataFrame,
    id_col: str,
    media_type: str,
    api_key: str = "",
    base_url: str = TMDB_BASE,
    out_col: str = "exists",
) -> DataFrame:
    """Append ``out_col`` boolean: the TMDB id resolves (HTTP 200 with an
    ``id`` field — wd_tmdb.py:19-46 checks the decoded body)."""
    url = pl_format(
        "%s/%s/{}?api_key=%s" % (base_url, media_type, api_key),
        F.col(id_col),
    )
    req = df.withColumn("__req", prepare_request(url))
    # 404 is an EXPECTED outcome (id gone) — listing it ok avoids the
    # unknown-status retry/warn churn (reference accepts not-found too)
    resp = http_get(req, request_col="__req", response_col="__resp",
                    retry_count=RETRY_COUNT, ok_statuses=(200, 404))
    ok = F.col("__resp").getField("status") == 200
    body_id = F.from_json(response_text("__resp"), "id BIGINT").getField("id")
    return resp.withColumn(
        out_col, ok & body_id.isNotNull()
    ).drop("__req", "__resp")
