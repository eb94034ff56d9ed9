"""Multi-dimensional data clustering for scan pruning (Z-order).

Parquet readers prune row groups / files whose min-max statistics exclude
the predicate. A table sorted on one column prunes only on that column;
interleaving the bits of TWO columns (Morton / Z-order curve) gives every
file a narrow range in BOTH dimensions, so either predicate prunes.
This is the portable core of Delta/Iceberg ``OPTIMIZE ZORDER BY``
(reference capability: none — the reference never lays out storage; our
ZoneStore + this module make layout a first-class operator).

The z-value is a pure JVM Column expression (shift/mask/or, codegen'd) —
computing it over 100 TB is scan-speed work, and the only shuffle is the
range partition that the rewrite needs anyway.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["z_value", "write_zordered"]


def z_value(c1: Column | str, c2: Column | str, bits: int = 16) -> Column:
    """Morton interleave of the low ``bits`` bits of two non-negative int
    columns: c1 occupies even bit positions, c2 odd. Adjacent z-values are
    adjacent in both source dimensions (locality), which is exactly what
    min-max pruning needs."""
    x = (F.col(c1) if isinstance(c1, str) else c1).cast("long")
    y = (F.col(c2) if isinstance(c2, str) else c2).cast("long")
    z = F.lit(0).cast("long")
    for b in range(bits):
        z = z.bitwiseOR(
            F.shiftleft(F.shiftright(x, b).bitwiseAND(F.lit(1)), 2 * b)
        ).bitwiseOR(
            F.shiftleft(F.shiftright(y, b).bitwiseAND(F.lit(1)), 2 * b + 1)
        )
    return z


def write_zordered(
    df: DataFrame,
    path: str,
    c1: str,
    c2: str,
    n_files: int = 8,
    bits: int = 16,
) -> None:
    """Rewrite ``df`` as ``n_files`` parquet files clustered along the
    (c1, c2) Z-curve: range-partition on the z-value, sort within each
    partition, drop the helper column. Readers filtering on EITHER column
    now skip most files on min-max stats alone."""
    (
        df.withColumn("_z", z_value(c1, c2, bits))
        .repartitionByRange(n_files, "_z")
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.mode("overwrite")
        .parquet(path)
    )
