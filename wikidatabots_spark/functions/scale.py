"""Cluster-scale join strategies: bucketed co-location and skew salting.

These are the two manual levers left once Catalyst/AQE have done their
part (SURVEY.md §4 / the 100 TB design rules):

- **Bucketing** pre-shuffles a table *once at write time*. Two tables
  bucketed by the same key into the same bucket count join with ZERO
  exchange at read time — the big win for fact⋈fact joins repeated
  across many queries (amortize one shuffle over every future join).
- **Salting** splits a pathologically hot key across ``salt`` synthetic
  sub-keys: the small side is replicated ×salt (cheap), the skewed side
  scatters uniformly. AQE's skew-join splitting handles *moderately*
  skewed sort-merge joins automatically; salting is for the extreme case
  (one key ≫ a single executor's memory) or broadcast-infeasible dims.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_bucketed(
    df: DataFrame,
    table: str,
    keys: Sequence[str],
    num_buckets: int = 32,
    sort: bool = True,
    mode: str = "overwrite",
) -> None:
    """Persist as a bucketed (+ sorted) managed table.

    Sorting within buckets additionally removes the per-task sort from
    future sort-merge joins — the read-side plan is scan→join, nothing
    else.
    """
    w = df.write.format("parquet").mode(mode).bucketBy(num_buckets, *keys)
    if sort:
        w = w.sortBy(*keys)
    w.saveAsTable(table)


def bucketed(spark: SparkSession, table: str) -> DataFrame:
    return spark.table(table)


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    salt: int = 8,
    how: str = "inner",
    seed: int | None = None,
) -> DataFrame:
    """Equi-join with the left (skewed) side salted across ``salt`` keys.

    left rows get a uniform random salt; right rows are replicated once
    per salt value, so every (key, salt) pair finds its match. Result is
    row-identical to the plain join **for left-preserving joins only**
    (inner/left/semi/anti): with ``right`` or ``full_outer`` the salt
    replication would emit each unmatched right row ``salt`` times, so
    those modes are rejected. Flip the inputs for a right-skewed join.
    The shuffle for any single hot key is spread over ``salt`` reducers.
    """
    allowed = {"inner", "left", "left_outer", "leftouter", "left_semi",
               "leftsemi", "semi", "left_anti", "leftanti", "anti", "cross"}
    if how not in allowed:
        raise ValueError(
            f"salted_join(how={how!r}) would duplicate unmatched right rows; "
            f"use one of {sorted(allowed)} (flip sides for right-skew)"
        )
    on = list(on)
    rand = F.rand(seed) if seed is not None else F.rand()
    l2 = left.withColumn("__salt", (rand * salt).cast("int"))
    r2 = right.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(salt)]))
    )
    return l2.join(r2, on=[*on, "__salt"], how=how).drop("__salt")


def pushdown_fence(df: DataFrame) -> DataFrame:
    """Predicate-pushdown barrier for expensive projections.

    Catalyst pushes filters below projections by SUBSTITUTING the
    projected expressions into the predicate. For cheap expressions
    that's free row pruning; for projections built on higher-order
    functions it is catastrophic: Spark performs no common-subexpression
    elimination through HOF lambdas, so a predicate over, say, a
    language-ID score re-inlines the tokenize/split array once per
    lambda reference — measured 1.2 s -> 23 s on the corpus-curation
    gates (a ~20x blowup, the same trap as referencing an un-projected
    array from ``F.transform``).

    A LAZY ``localCheckpoint`` pins the projection output as a row
    barrier: nothing materializes until the first action (no extra job
    at plan-build time), after which filters evaluate against the
    computed scalar columns. Use it between a heavy narrow projection
    and the gates that consume it.

    At cluster scale the checkpointed table is the projection OUTPUT
    (ids + scalar scores, not the text), stored executor-local; the
    lineage truncation also keeps iterative consumers (connected
    components) from re-executing the scoring pipeline per round.
    """
    return df.localCheckpoint(eager=False)
