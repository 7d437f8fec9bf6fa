"""End-to-end main tests: combined plans → guarded RDF sink (§3.1)."""

from __future__ import annotations

import io
import warnings

from wikidatabots_spark.plans.mains import run_opencritic_main, run_tmdb_main


def test_tmdb_main_sinks_capped(spark, sf_dir):
    buf = io.StringIO()
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        n = run_tmdb_main(spark, sf_dir, limit=50, file=buf)
    # sf0.001 yields ~900 statements → the 50-cap warns and samples
    assert n == 50
    assert any("rows" in str(x.message) for x in w)
    lines = buf.getvalue().strip().split("\n")
    assert len(lines) == 50
    assert all(l.startswith(("wd:", "wds:")) for l in lines)


def test_opencritic_main_sinks(spark, sf_dir):
    buf = io.StringIO()
    n = run_opencritic_main(spark, sf_dir, limit=10_000, file=buf)
    assert n > 0
    assert buf.getvalue().count("P8865") >= n  # every line carries the prop
