"""Z-order (Morton) clustering keys — multi-dimensional data layout.

At 100 TB, sorting a table by ONE column gives parquet row-group min/max
skipping on that column only; queries filtering the other dimension scan
everything.  Interleaving the bits of two key columns into one Morton code
and range-sorting the write by it keeps row groups tight in BOTH
dimensions at once (each z-contiguous run spans a bounded rectangle of the
key space) — the layout trick behind Delta/Iceberg ``OPTIMIZE ZORDER BY``,
here as a plain column expression any ``repartitionByRange`` +
``sortWithinPartitions`` write can use:

    df.repartitionByRange(n_files, zorder_key("a", "b"))
      .sortWithinPartitions(zorder_key("a", "b"))
      .write.parquet(...)

The bit-spreading is the classic magic-number ladder (public domain,
"Interleaving bits by Binary Magic Numbers", Stanford bit-twiddling
pages); everything is integer arithmetic on JVM longs — whole-stage
codegen, no UDF — and the identical arithmetic is expressible in ANSI SQL
for the DuckDB differential oracle (``zorder_sql``).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: (shift, mask) ladder spreading a 16-bit int to 32 bits with zero gaps.
_SPREAD_STEPS: tuple[tuple[int, int], ...] = (
    (8, 0x00FF00FF),
    (4, 0x0F0F0F0F),
    (2, 0x33333333),
    (1, 0x55555555),
)

BITS = 16  #: bits kept per dimension; the z-key occupies 2*BITS bits


def _spread(col: Column) -> Column:
    """Spread the low 16 bits of ``col`` so bit i lands at position 2i."""
    out = col.bitwiseAND(F.lit((1 << BITS) - 1))
    for shift, mask in _SPREAD_STEPS:
        out = out.bitwiseOR(F.shiftleft(out, shift)).bitwiseAND(F.lit(mask))
    return out


def zorder_key(x, y) -> Column:
    """Morton code of (x, y): x's bits on even positions, y's on odd."""
    xs = _spread(F.col(x) if isinstance(x, str) else x)
    ys = _spread(F.col(y) if isinstance(y, str) else y)
    return xs.bitwiseOR(F.shiftleft(ys, 1))


def _spread_sql(expr: str) -> str:
    """The same ladder as ``_spread`` in ANSI SQL text (oracle side)."""
    out = f"({expr} & {(1 << BITS) - 1})"
    for shift, mask in _SPREAD_STEPS:
        out = f"(({out} | ({out} << {shift})) & {mask})"
    return out


def zorder_sql(x_expr: str, y_expr: str) -> str:
    """SQL text computing the identical Morton code (DuckDB oracle)."""
    return f"({_spread_sql(x_expr)} | ({_spread_sql(y_expr)} << 1))"
