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


def test_cli_list_and_run(spark, capsys):
    """python -m wikidatabots_spark: list prints the registry; run
    executes a query as TSV; unknown query exits 2."""
    from wikidatabots_spark.__main__ import main

    assert main(["list"]) == 0
    out = capsys.readouterr().out.splitlines()
    assert "tmdb_via_imdb" in out and len(out) >= 150
    assert main(["run", "q6_revenue_forecast"]) == 0
    out = capsys.readouterr().out.splitlines()
    assert out[0] == "revenue" and len(out) == 2
    assert main(["run", "no_such_query"]) == 2
