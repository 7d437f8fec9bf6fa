"""Fingerprint the output of the hot expression builders: schema + an
order-insensitive content hash, at a given SF. Used to prove the
SQL-string rewrites are value-identical to the Column-API originals.

Usage: python scripts/builder_fingerprint.py [sf_dir] [out.json]
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from wikidatabots_spark.session import get_spark  # noqa: E402
from wikidatabots_spark.sources.tables import load_table  # noqa: E402


def fingerprint(df):
    cols = df.columns
    schema = str(df.schema)
    h = (
        df.select(
            F.md5(
                F.concat_ws(
                    "\x1f", *[F.col(c).cast("string") for c in cols]
                )
            ).alias("h")
        )
        .agg(
            F.count("*").alias("n"),
            F.sum(F.conv(F.substring("h", 1, 8), 16, 10).cast("long")).alias(
                "s"
            ),
        )
        .first()
    )
    return {"schema": schema, "n": h["n"], "s": int(h["s"] or 0)}


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/builder_fp.json"
    spark = get_spark(app_name="builder-fp")
    spark.sparkContext.setLogLevel("ERROR")
    d = load_table(spark, sf_dir, "documents")

    from wikidatabots_spark.operators import dedup as D
    from wikidatabots_spark.operators import textstats as T
    from wikidatabots_spark.operators.lm import with_lm_score
    from wikidatabots_spark.operators.textstats import (
        with_lang_guess,
        with_quality,
    )

    builders = {
        "minhash_band_table": lambda: D.minhash_band_table(d),
        "minhash_signature_cols": lambda: D.minhash_signature_cols(d),
        "winnow_fingerprints": lambda: D.winnow_fingerprints(
            d, k=3, window=4
        ),
        "with_quality": lambda: with_quality(d),
        "with_lang_guess": lambda: with_lang_guess(d),
        "with_repetition": lambda: T.with_repetition(d),
        "with_classifier_score": lambda: T.with_classifier_score(d),
        "with_token_count": lambda: T.with_token_count(d),
        "with_lm_score": lambda: with_lm_score(d),
        "gate_chain": lambda: T.with_classifier_score(
            T.with_repetition(with_lang_guess(with_quality(d)))
        ),
    }
    res = {}
    for name, fn in builders.items():
        res[name] = fingerprint(fn())
        print(name, res[name], flush=True)
    with open(out, "w") as f:
        json.dump(res, f, indent=1)
    print("wrote", out)


if __name__ == "__main__":
    main()
