"""Count-min sketch as a distributed DataFrame aggregation.

A CMS summarizes an unbounded token stream in ``depth × width`` counters:
counter (j, h_j(t)) accumulates every occurrence of token t, and the
point estimate min_j counter[j][h_j(t)] upper-bounds the true count with
error ≤ stream_size·e/width at confidence 1−e^−depth. The classic sketch
for heavy-hitter / frequency queries over streams too large to groupBy.

Spark-first shape: ONE narrow map (token → depth (row, col) pairs via
explode) + ONE groupBy (row, col) with map-side partial counts — the
shuffle carries at most depth·width rows per map task regardless of
stream size, which is the entire point at 100 TB. The sketch matrix is
tiny (depth·width rows) and broadcast-joinable for estimate lookups.

Determinism: h_j(t) = first 8 hex digits of md5('j:'||t) mod width — no
RNG, reproducible in any engine, so the DuckDB oracle rebuilds the
identical matrix (same rationale as the string-MinHash design).

No reference counterpart (north-star extension).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _cms_bucket(col: Column, row: int, width: int) -> Column:
    h = F.conv(
        F.substring(F.md5(F.concat(F.lit(f"{row}:"), col)), 1, 8), 16, 10
    ).cast("long")
    return h % width


def count_min_sketch(
    df: DataFrame, col: str, depth: int = 4, width: int = 256
) -> DataFrame:
    """Build the sketch → (row_idx INT, col_idx INT, cnt BIGINT).

    Counts every input row (multiset semantics — do NOT pre-distinct the
    stream unless you want a presence sketch).
    """
    c = F.col(col)
    pairs = df.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(j).alias("row_idx"),
                        _cms_bucket(c, j, width).cast("int").alias("col_idx"),
                    )
                    for j in range(depth)
                ]
            )
        ).alias("rc")
    ).select("rc.row_idx", "rc.col_idx")
    return pairs.groupBy("row_idx", "col_idx").agg(F.count(F.lit(1)).alias("cnt"))


def cms_estimate(
    sketch: DataFrame, tokens: DataFrame, col: str, depth: int = 4, width: int = 256
) -> DataFrame:
    """Point estimates for a token frame: (token, est BIGINT).

    est = min over rows of the token's counter; absent counters are 0.
    The sketch side is tiny — broadcast join, no shuffle of the tokens.
    """
    c = F.col(col)
    probes = tokens.select(
        c.alias("token"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(j).alias("row_idx"),
                        _cms_bucket(c, j, width).cast("int").alias("col_idx"),
                    )
                    for j in range(depth)
                ]
            )
        ).alias("rc"),
    ).select("token", "rc.row_idx", "rc.col_idx")
    return (
        probes.join(F.broadcast(sketch), ["row_idx", "col_idx"], "left")
        .fillna(0, subset=["cnt"])
        .groupBy("token")
        .agg(F.min("cnt").alias("est"))
    )


def bloom_bits(
    df: DataFrame, col: str, m: int = 1 << 15, k: int = 4
) -> DataFrame:
    """Bloom filter of a key column as a table of set bit indices.

    Each key sets ``k`` md5-derived bits in an ``m``-bit space; the
    result (≤ m rows of ``bit_idx INT``) is the broadcastable sketch. No
    false negatives by construction — the basis for semi-join reduction:
    prefilter a huge probe side down to definite-non-members + a small
    "might contain" set before an exact join. Deterministic md5 hashing,
    same family as the count-min sketch.
    """
    c = F.col(col)
    return (
        df.select(
            F.explode(
                F.array(
                    *[
                        _cms_bucket(c, j, m).cast("int").alias(f"b{j}")
                        for j in range(k)
                    ]
                )
            ).alias("bit_idx")
        )
        .distinct()
    )


def with_bloom_might_contain(
    probe: DataFrame,
    col: str,
    bits: DataFrame,
    m: int = 1 << 15,
    k: int = 4,
    out_col: str = "might_contain",
) -> DataFrame:
    """Append a boolean: could ``col`` be in the set the bloom was built
    from? False is definitive (no false negatives); True needs an exact
    check at ~(1-e^{-kn/m})^k false-positive rate.

    Plan shape: ``k`` BROADCAST left joins against the tiny bit table —
    the probe side never shuffles, which is the whole point when the
    probe is the 100 TB fact table.
    """
    c = F.col(col)
    out = probe
    cond = F.lit(True)
    for j in range(k):
        bj = bits.select(F.col("bit_idx").alias(f"__bloom{j}"))
        out = out.join(
            F.broadcast(bj),
            _cms_bucket(c, j, m).cast("int") == F.col(f"__bloom{j}"),
            "left",
        )
        cond = cond & F.col(f"__bloom{j}").isNotNull()
    return out.withColumn(out_col, cond).drop(
        *[f"__bloom{j}" for j in range(k)]
    )


def hll_registers(
    df: DataFrame, col: str, p: int = 6, group_cols: tuple[str, ...] = ()
) -> DataFrame:
    """HyperLogLog registers → (register INT, max_rank INT), m = 2^p.

    The distinct-count companion to the count-min sketch: each value's
    md5 picks a register (first ``p`` bits) and contributes the position
    of the first 1-bit in the next 48 bits (its "rank"); the register
    keeps the max. Two HLLs merge by element-wise max — the property
    that makes distinct-counting mergeable across partitions, days, and
    datasets at 100 TB where exact distinct needs a full shuffle of
    every key.

    Spark-first shape: one narrow map + one groupBy over at most m=2^p
    groups with map-side partial max — shuffle traffic is bounded by
    m rows per map task regardless of input size.

    Determinism: md5-derived register and rank (no RNG); rank uses
    ``bin()`` bit-length (identical '0' edge case in Spark and DuckDB),
    so the register table is engine-exact and oracle-checkable.
    """
    c = F.col(col)
    hx = F.md5(c.cast("string"))
    # first 16 bits (4 hex chars) -> register = top p bits
    h16 = F.conv(F.substring(hx, 1, 4), 16, 10).cast("long")
    register = (h16 % (1 << p)).cast("int")
    # next 48 bits (hex chars 5..16) -> rank = leading zeros + 1
    x = F.conv(F.substring(hx, 5, 12), 16, 10).cast("long")
    rank = F.when(x == 0, F.lit(49)).otherwise(
        F.lit(49) - F.length(F.bin(x))
    ).cast("int")
    return (
        df.where(c.isNotNull())
        .select(*group_cols, register.alias("register"), rank.alias("rank"))
        .groupBy(*group_cols, "register")
        .agg(F.max("rank").alias("max_rank"))
    )


def hll_estimate(
    registers: DataFrame, p: int = 6, group_cols: tuple[str, ...] = ()
) -> DataFrame:
    """Cardinality estimate from a register table → one row per group
    (one row total without ``group_cols``):
    ``(*group_cols, m, n_registers, s_scaled, estimate)``.

    ``s_scaled = sum(2^(50 - max_rank))`` is the harmonic denominator
    kept as an EXACT BIGINT (max_rank <= 49, so the exponent stays >= 1);
    the only float op is one literal-constant multiply and one IEEE
    division of exact integers — bit-identical across engines. Registers
    never hit by any value contribute rank 0 (2^50 each), folded in via
    the (m - n_registers) correction instead of materializing empty
    registers. Raw HLL estimate only (no small/large-range corrections)
    — this is the mergeable building block, not a DataSketches clone.
    """
    m = 1 << p
    alpha = {4: 0.673, 5: 0.697, 6: 0.709}.get(p, 0.7213 / (1 + 1.079 / m))
    agg = registers.groupBy(*group_cols).agg(
        F.count(F.lit(1)).cast("long").alias("n_registers"),
        F.sum(F.expr("shiftleft(CAST(1 AS BIGINT), 50 - max_rank)"))
        .cast("long")
        .alias("s_hit"),
    )
    return agg.select(
        *group_cols,
        F.lit(m).cast("long").alias("m"),
        "n_registers",
        (
            F.col("s_hit")
            + (F.lit(m) - F.col("n_registers")) * F.lit(1 << 50).cast("long")
        ).alias("s_scaled"),
        (
            F.lit(alpha * m * m * float(1 << 50))
            / (
                F.col("s_hit")
                + (F.lit(m) - F.col("n_registers")) * F.lit(1 << 50).cast("long")
            ).cast("double")
        ).alias("estimate"),
    )


def kmv_sketch(
    df: DataFrame, col: str, k: int = 32, group_cols: tuple[str, ...] = ()
) -> DataFrame:
    """K-minimum-values sketch per group: the ``k`` smallest 48-bit
    md5-derived hashes of the column's DISTINCT values, as
    ``(*group_cols, h, kmv_rank)`` rows (``kmv_rank`` 1..k by h).

    The distinct-count sketch that — unlike HLL — supports set
    INTERSECTION estimation: for two sets, the k smallest hashes of
    their union plus membership flags yield both |A∪B| ((k-1)/θ with
    θ = the kth smallest hash as a fraction of the hash space) and
    |A∩B| (the Jaccard fraction of the union sketch present in both,
    times the union estimate) — Beyer et al., SIGMOD 2007. Two KMV
    sketches merge by "union rows, keep k smallest": mergeable across
    partitions and days, state bounded at k rows per group.

    Determinism: md5-derived hashes (no RNG), ties impossible below the
    2^-48 collision scale and irrelevant above it (equal hashes fold —
    part of the documented approximation); the sketch table is
    engine-exact and oracle-checkable like the HLL register table.

    Scale: one distinct-shuffle bounded by (groups x distinct values)
    then a per-group top-k window over at most that; downstream overlap
    math touches only groups x k rows.
    """
    c = F.col(col)
    hx = F.md5(c.cast("string"))
    h = F.conv(F.substring(hx, 1, 12), 16, 10).cast("long")
    from pyspark.sql import Window

    w = Window.partitionBy(*[F.col(g) for g in group_cols]).orderBy("h")
    return (
        df.where(c.isNotNull())
        .select(*group_cols, h.alias("h"))
        .distinct()
        .withColumn("kmv_rank", F.row_number().over(w))
        .where(F.col("kmv_rank") <= k)
    )
