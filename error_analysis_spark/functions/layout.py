"""Data-layout functions: Z-order (Morton) clustering keys.

At 100 TB the dominant cost of a spatial/temporal scan is how much of
the table the reader can SKIP. Parquet row-group min/max stats prune
well only when values are clustered on disk; sorting by a single
column clusters one dimension and scatters the other. A Z-order key
bit-interleaves two (or more) dimensions so that sorting by the key
places rows that are close in BOTH dimensions into the same row
groups — the same layout trick Delta/Iceberg expose as `ZORDER BY` /
`sort_order(z)`. Writing `df.repartitionByRange(k).sortWithinPartitions
(zorder_key(...))` before a parquet sink gives bbox queries row-group
pruning in both axes.

The key is a pure JVM expression (a fixed unrolled sum of shift/mask
terms — whole-stage-codegen friendly, no UDF), deterministic, and
restated verbatim by the DuckDB oracle (`ZORDER_SQL_EXPR`).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def zorder_key(x: Column | str, y: Column | str, bits: int = 16) -> Column:
    """Morton interleave of two non-negative ints (each < 2^bits):
    bit i of x lands at position 2i, bit i of y at 2i+1. bits<=31
    keeps every term and the sum inside a BIGINT."""
    if not 1 <= bits <= 31:
        raise ValueError(f"bits must be in [1, 31], got {bits}")
    xc = F.col(x) if isinstance(x, str) else x
    yc = F.col(y) if isinstance(y, str) else y
    xc, yc = xc.cast("long"), yc.cast("long")
    out = F.lit(0).cast("long")
    for i in range(bits):
        out = (out
               + F.shiftleft(F.shiftright(xc, i).bitwiseAND(1), 2 * i)
               + F.shiftleft(F.shiftright(yc, i).bitwiseAND(1), 2 * i + 1))
    return out


def zorder_sql_expr(x: str, y: str, bits: int = 16) -> str:
    """The identical Morton key as portable SQL (DuckDB oracle side)."""
    terms = []
    for i in range(bits):
        terms.append(f"((({x} >> {i}) & 1) << {2 * i})")
        terms.append(f"((({y} >> {i}) & 1) << {2 * i + 1})")
    return "(" + " + ".join(terms) + ")"
