"""Z-order (Morton) key construction for multi-column data clustering.

Writing a table sorted by a single key gives parquet footer stats file-
level selectivity on that key only; interleaving the bits of TWO keys
into one Morton code and sorting by it gives *both* columns locality —
each output file covers a small axis-aligned rectangle of the key plane,
so min/max stats prune scans for predicates on either column (or both).
This is the layout strategy behind Delta Lake's OPTIMIZE ZORDER and
Iceberg's z-ordered sort orders; here it is plain column arithmetic +
`repartitionByRange`, nothing engine-specific.

The interleave is pure codegen'd bit math (shift/and/or unrolled per
bit), no UDF. Inputs must already be non-negative and < 2**bits; callers
reduce raw keys into that domain (modulo for integer ids, day-offset for
dates — or, in a production pipeline with a stats pass available,
min/max rank normalization, which spreads skewed domains evenly).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def zorder_key(x: Column, y: Column, bits: int = 16) -> Column:
    """Morton-interleave two non-negative integer columns (< 2**bits each)
    into one long: bit i of x lands at position 2i, bit i of y at 2i+1.
    Unrolls to `2*bits` shift/mask terms — all whole-stage-codegen'd JVM
    arithmetic, evaluated map-side with zero extra passes."""
    if not 1 <= bits <= 31:
        raise ValueError(f"bits must be in [1, 31], got {bits}")
    x = x.cast("long")
    y = y.cast("long")
    z = F.lit(0).cast("long")
    for i in range(bits):
        z = z.bitwiseOR(
            F.shiftleft(F.shiftright(x, i).bitwiseAND(F.lit(1)), 2 * i)
        ).bitwiseOR(
            F.shiftleft(F.shiftright(y, i).bitwiseAND(F.lit(1)), 2 * i + 1)
        )
    return z
