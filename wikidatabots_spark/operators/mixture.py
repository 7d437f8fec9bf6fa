"""Domain-mixture resampling with epochs.

The data-mixing step of a training run: given integer weights per source
(the target mixture) and a total document budget, re-sample the corpus so
each source contributes ``weight_s / sum(weights)`` of the output —
DOWN-sampling over-represented sources (keep a deterministic hash subset)
and UP-sampling under-represented ones by *repeating* documents (epochs),
the standard Pile/Gopher-style mixture mechanics.

No reference counterpart (north-star training-pipeline component; the
reference's closest shape is its hash-split sampling, polars_utils.py
``sample`` family).

Determinism: every quantity is integer arithmetic — the per-source rate is
kept in 65536ths (``k = (w * T * 65536) div (W * cnt)``) and a document's
copy count is ``k div 65536`` plus one more iff its 16-bit md5 bucket
falls below ``k mod 65536``. No float division anywhere, so the result is
bit-identical across engines and re-runs, and a document's membership
moves only when its OWN source's rate moves.

Scale shape: the per-source count is a tiny aggregate (one row per
source), re-attached with a broadcast join; the copy expansion is a
narrow ``explode(sequence(...))``. The full corpus is never shuffled —
at 100 TB the only exchange is the |sources|-row count table.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def mix_epochs(
    df: DataFrame,
    key: str,
    strata: str,
    weights: dict[str, int],
    default_weight: int = 1,
    budget: int | None = None,
    epoch_col: str = "epoch",
) -> DataFrame:
    """Resample ``df`` to the integer-weight mixture over ``strata``.

    Each stratum ``s`` targets ``weight_s / W`` of the output budget
    (``W`` = sum of weights over strata actually present; ``budget``
    defaults to the input row count, i.e. a same-size remix). Rows gain
    an ``epoch_col`` (1..n copies); rows hash-dropped from down-sampled
    strata disappear. Output size per stratum is within one hash-bucket
    granule (1/65536) of the target.
    """
    for val, w in weights.items():
        if w < 0:
            raise ValueError(f"weight for {val!r} must be >= 0")

    wt: Column = F.lit(int(default_weight))
    for val, w in weights.items():
        wt = F.when(F.col(strata) == F.lit(val), F.lit(int(w))).otherwise(wt)

    counts = df.groupBy(strata).agg(F.count(F.lit(1)).alias("__cnt"))
    counts = counts.withColumn("__wt", wt)
    totals = counts.agg(
        F.sum("__cnt").alias("__t"),
        F.sum("__wt").alias("__w"),
    )
    if budget is not None:
        totals = totals.withColumn("__t", F.lit(int(budget)).cast("long"))
    # k = per-doc emission rate of stratum s, in 65536ths (integer div;
    # overflows long only past ~10^14 budget x weight — cast to decimal
    # there). Both totals and counts are |strata|-row frames: broadcast.
    rates = (
        counts.crossJoin(F.broadcast(totals))
        .withColumn(
            "__k",
            F.expr("(__wt * __t * 65536) div (__w * __cnt)"),
        )
        .select(strata, "__k")
    )
    bucket = F.conv(
        F.substring(
            F.md5(F.concat(F.lit("mix:"), F.col(key).cast("string"))), 1, 4
        ),
        16,
        10,
    ).cast("long")
    n_copies = (F.expr("__k div 65536") + F.when(bucket < F.col("__k") % 65536, 1).otherwise(0)).cast(
        "long"
    )
    out = (
        df.join(F.broadcast(rates), on=strata)
        .withColumn("__n", n_copies)
        .where(F.col("__n") >= 1)  # sequence(1, 0) would count DOWN
        .withColumn(epoch_col, F.explode(F.sequence(F.lit(1).cast("long"), F.col("__n"))))
        .drop("__k", "__n")
    )
    return out


def mix_temperature(
    df: DataFrame,
    key: str,
    strata: str,
    budget: int | None = None,
    epoch_col: str = "epoch",
) -> DataFrame:
    """Temperature-scaled mixture: stratum weights are DERIVED FROM THE
    DATA as ``isqrt(count_s)`` — sampling shares proportional to the
    square root of natural frequency, the T5/mT5 multilingual balancing
    rule (tau = 2 in the p^(1/tau) convention) that up-weights small
    strata without flattening the distribution entirely. The weight
    table stays in-plan (a |strata|-row aggregate), so the query is one
    static DAG: no driver round-trip between counting and resampling.

    Engine-exact: ``floor(sqrt(cast(n as double)))`` is identical in
    both engines for any count below 2^52 (IEEE sqrt is correctly
    rounded; the nearest half-ulp cannot cross an integer there), and
    everything downstream is the same integer 65536ths rate math as
    :func:`mix_epochs`.

    Scale: identical to ``mix_epochs`` — only the |strata|-row count
    table shuffles; rates broadcast back; the fact table never
    exchanges.
    """
    counts = df.groupBy(strata).agg(F.count(F.lit(1)).alias("__cnt"))
    counts = counts.withColumn(
        "__wt",
        F.expr("CAST(floor(sqrt(CAST(__cnt AS DOUBLE))) AS BIGINT)"),
    )
    totals = counts.agg(
        F.sum("__cnt").alias("__t"),
        F.sum("__wt").alias("__w"),
    )
    if budget is not None:
        totals = totals.withColumn("__t", F.lit(int(budget)).cast("long"))
    rates = (
        counts.crossJoin(F.broadcast(totals))
        .withColumn("__k", F.expr("(__wt * __t * 65536) div (__w * __cnt)"))
        .select(strata, "__k")
    )
    bucket = F.conv(
        F.substring(
            F.md5(F.concat(F.lit("mix:"), F.col(key).cast("string"))), 1, 4
        ),
        16,
        10,
    ).cast("long")
    n_copies = (
        F.expr("__k div 65536")
        + F.when(bucket < F.col("__k") % 65536, 1).otherwise(0)
    ).cast("long")
    return (
        df.join(F.broadcast(rates), on=strata)
        .withColumn("__n", n_copies)
        .where(F.col("__n") >= 1)
        .withColumn(
            epoch_col, F.explode(F.sequence(F.lit(1).cast("long"), F.col("__n")))
        )
        .drop("__k", "__n")
    )
