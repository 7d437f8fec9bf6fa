"""MediaWiki blocklist source (reference S6/F8, wikidata.py:26-71).

The reference fetches one wiki page's extract via the MediaWiki API,
regexes out the QIDs, memoizes the result per process (``@cache``,
wikidata.py:26), and uses membership against it as a filter predicate.

Spark-first: fetch once on the **driver**, cache with ``functools.cache``,
embed the (small) list as an ``isin`` literal — Catalyst turns that into
an ``In`` predicate it can push into scans; no join, no shuffle, and at
cluster scale the list ships inside the serialized plan, not as a
shuffle side. (If a blocklist ever outgrew literal size, the upgrade is
a broadcast left-anti join — same call site.)
"""

from __future__ import annotations

import functools
import json
import re
from collections.abc import Callable

from pyspark.sql import Column
from pyspark.sql import functions as F

BLOCKLIST_URL = (
    "https://www.wikidata.org/w/api.php"
    "?action=query&format=json&prop=extracts&explaintext=1&pageids=103442925"
)
PAGE_ID = "103442925"
QID_RE = re.compile(r"(Q[0-9]+)")  # wikidata.py:55

Transport = Callable[[], bytes]


def _default_transport() -> bytes:
    import requests

    # 60 s min-time applies between repeated calls (wikidata.py:47) — the
    # process-level memoization below means we make exactly one call.
    resp = requests.get(
        BLOCKLIST_URL,
        headers={"User-Agent": "wikidatabots-spark/0.1"},
        timeout=10,
    )
    resp.raise_for_status()
    return resp.content


@functools.cache
def _blocked_qids_cached() -> tuple[str, ...]:
    return _parse_blocked_qids(_default_transport())


def _parse_blocked_qids(body: bytes) -> tuple[str, ...]:
    """Extract page text → sorted unique QIDs (wikidata.py:50-59)."""
    doc = json.loads(body)
    extract = doc["query"]["pages"][PAGE_ID]["extract"]
    return tuple(sorted(set(QID_RE.findall(extract))))


def blocked_qids(transport: Transport | None = None) -> tuple[str, ...]:
    """The blocklist, fetched once per process (memoized for the default
    transport; injected transports are for tests and are not cached)."""
    if transport is None:
        return _blocked_qids_cached()
    return _parse_blocked_qids(transport())


def is_blocked_item(item: Column | str, blocked: tuple[str, ...]) -> Column:
    """Predicate: entity-URI/QID column is on the blocklist.

    wikidata.py:64-71: extract the QID from the value, test membership.
    Used negated in every pipeline (wd_tmdb.py:242,325).
    """
    c = F.col(item) if isinstance(item, str) else item
    qid = F.regexp_extract(c, QID_RE.pattern, 1)
    return qid.isin(list(blocked))
