"""Z-order (Morton-curve) data layout — multi-dimensional clustering so a
parquet scan filtered on ANY of the clustered columns prunes row groups,
not just the one column a linear sort favors (the `OPTIMIZE ZORDER BY`
capability of lakehouse table formats, expressed as plain DataFrame ops).

How: min-max normalize each dimension to a ``bits``-wide integer rank,
interleave the bits into one Morton code, sort by it, write. Points close
in the multi-dim space land in the same file/row group, so min/max
footer stats become tight boxes for every clustered column at once.

Scale notes: normalization bounds come from ONE aggregate (broadcast as a
1-row cross join, never collected per-row); the z-value itself is a pure
per-row expression (HOF bit-interleave, codegen'd); the final sort is the
same repartition-by-range shuffle any `ORDER BY` write pays — the one-time
cost that buys every subsequent scan its pruning. At 100 TB, run it
per-partition (e.g. per day) so the sort never becomes a global bottleneck.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def zorder_value(cols: list[Column], bounds: list[tuple[Column, Column]], bits: int = 16) -> Column:
    """Morton code for ``cols`` given per-column (min, max) bound columns.

    Each value is min-max scaled to an integer in [0, 2^bits) and the bits
    are interleaved round-robin (bit b of column i lands at position
    ``b * n_cols + i``). Pure column arithmetic — no UDF, no shuffle.
    """
    n = len(cols)
    ranks = []
    for c, (lo, hi) in zip(cols, bounds):
        span = (hi - lo).cast("double")
        # floor, not cast: Spark's double->long cast truncates but DuckDB's
        # rounds, and the oracle must reproduce this bit-for-bit
        scaled = F.when(
            span > 0,
            F.floor(
                (c.cast("double") - lo.cast("double")) / span * ((1 << bits) - 1)
            ).cast("long"),
        ).otherwise(F.lit(0).cast("long"))
        ranks.append(scaled)
    z = F.lit(0).cast("long")
    for b in range(bits):
        for i, r in enumerate(ranks):
            z = z + F.shiftleft(F.shiftright(r, b).bitwiseAND(F.lit(1)), b * n + i)
    return z


def zorder_dataframe(df: DataFrame, col_names: list[str], bits: int = 16) -> DataFrame:
    """Append a ``zval`` Morton column using dataset-wide min/max bounds.

    Bounds ride in as a broadcast 1-row cross join — the standard
    scalar-aggregate pattern, no driver round-trip in the plan.
    """
    aggs = []
    for c in col_names:
        aggs += [F.min(c).alias(f"_lo_{c}"), F.max(c).alias(f"_hi_{c}")]
    b = df.agg(*aggs)
    joined = df.crossJoin(F.broadcast(b))
    cols = [F.col(c).cast("long") for c in col_names]
    bounds = [
        (F.col(f"_lo_{c}").cast("long"), F.col(f"_hi_{c}").cast("long"))
        for c in col_names
    ]
    out = joined.withColumn("zval", zorder_value(cols, bounds, bits=bits))
    return out.drop(*[f"_lo_{c}" for c in col_names], *[f"_hi_{c}" for c in col_names])


def write_zordered(
    df: DataFrame, path: str, col_names: list[str], bits: int = 16, num_files: int | None = None
) -> None:
    """Write ``df`` clustered by the Morton curve over ``col_names``.

    ``repartitionByRange`` on the z-value splits the curve into contiguous
    segments (one per output file) and sorts within each, so every file's
    min/max footer stats form a tight box in all clustered dimensions.
    """
    z = zorder_dataframe(df, col_names, bits=bits)
    n = num_files or df.sparkSession.sparkContext.defaultParallelism
    (
        z.repartitionByRange(n, "zval")
        .sortWithinPartitions("zval")
        .drop("zval")
        .write.mode("overwrite")
        .parquet(path)
    )
